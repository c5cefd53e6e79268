package graft

import graft.engine.{DataSourceDef, SessionManager}
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** SURVEY §7.4#5: the reference allows concurrent queries on one
  * session (RwLock read side, session.rs:663). `newSession()` objects
  * must behave the same for parallel reads.
  */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("parallel queries on one session all succeed and agree") {
    val mgr = new SessionManager(spark)
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val h = mgr.create(Some("conc"))
      mgr.registerTable(h,
        Readers.lineitem(h.spark), DataSourceDef("lineitem", "parquet", None, None))
      val futures = (1 to 12).map { i =>
        Future {
          mgr.sql(h, s"SELECT count(*) AS n FROM lineitem WHERE l_suppkey % 12 = ${i % 12}")
            .collect().head.getLong(0)
        }
      }
      val counts = Await.result(Future.sequence(futures), 120.seconds)
      // i%12 for i in 1..12 covers each bucket 0..11 exactly once
      assert(counts.sum == Readers.lineitem(spark).count())
    } finally { pool.shutdownNow(); mgr.shutdown() }
  }

  private object Readers {
    def lineitem(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"${SparkFixture.sfDir}/lineitem.parquet")
  }
}
