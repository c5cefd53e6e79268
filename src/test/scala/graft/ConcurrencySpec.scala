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

  test("parallel searches on one shared ANN index handle agree with serial") {
    // the serving shape the registry exists for: build once, then many
    // concurrent probes against the same immutable Handle
    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_conc").toString
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val h = graft.pipeline.AnnIndex.build(emb, "embedding", "vec_id", dir,
        numCells = 8, m = 8, ksub = 8)
      def search(qid: Long) = graft.pipeline.AnnIndex
        .searchTopK(emb, h, qid, k = 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val serial = (0L until 8L).map(q => q -> search(q)).toMap
      val parallel = Await.result(
        Future.sequence((0L until 8L).map(q => Future(q -> search(q)))),
        120.seconds).toMap
      assert(parallel == serial)
    } finally {
      pool.shutdownNow()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  private object Readers {
    def lineitem(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"${SparkFixture.sfDir}/lineitem.parquet")
  }
}
