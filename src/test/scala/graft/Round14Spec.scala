package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Round-14 hardening: the CDC chunk-digest kernel's bit-identity
  * with its composable twin, and the capped-postings default
  * invariant over every pair-emitting Dedup API.
  */
class Round14Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---------------- d26 kernel ≡ composable chain ----------------

  test("cdcChunkDedup kernel == composable HOF chain, bit-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    val base = (1 to 40).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString(" ", " ", "")
    val docs = (
      (1L to 30L).map { i =>
        // varied lengths/content, some exact dups, one insertion-shift
        val t = i % 5 match {
          case 0 => base
          case 1 => base + s" tail$i extra content ${i * 7}"
          case 2 => "X" + base // one-char insertion: CDC must re-sync
          case 3 => (1 to (16 + rnd.nextInt(200)))
            .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
          case _ => s"doc $i " * (3 + rnd.nextInt(20))
        }
        (i, t)
      } :+ (98L, "exactly sixteen!") // boundary: length == window
        :+ (99L, "ünïcode ‡est — multibyte çhars beyond ascii padding")
    ).toDF("doc_id", "text")
      // through a repartition so the kernel evaluates EXECUTOR-side
      // (a LocalRelation would evaluate on the driver and mask
      // serialization bugs — verify-skill gotcha)
      .repartition(4)

    val kernel = Dedup.cdcChunkDedup(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val chain = Dedup.cdcChunkDedupComposable(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(kernel.length == chain.length && kernel.nonEmpty)
    kernel.zip(chain).foreach { case (k, c) =>
      assert(k == c, s"kernel row $k != chain row $c")
    }
    // the dup rows actually exercise the dup accounting
    assert(kernel.exists(_.getLong(2) > 0L), "fixture must contain dup chunks")
  }

  test("CdcChunkDigests: sub-window and empty inputs stay total") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "short"), (3L, "exactly sixteen!"))
      .toDF("doc_id", "text").repartition(2)
      .select(col("doc_id"),
        graft.functions.CdcExpressions.cdcChunkDigests(col("text"), 16, 16)
          .as("chunks"))
      .orderBy("doc_id").collect()
    assert(df(0).getSeq[Any](1).isEmpty) // empty text: no chunks
    val short = df(1).getSeq[org.apache.spark.sql.Row](1)
    assert(short.length == 1 && short.head.getLong(1) == 5L) // one whole-text chunk
    val exact = df(2).getSeq[org.apache.spark.sql.Row](1)
    assert(exact.map(_.getLong(1)).sum == 16L)
  }

  // ---------------- capped-postings default invariant ----------------

  test("every pair-emitting Dedup API defaults maxPostings = Some(10000)") {
    // The round-10 smoke proved an uncapped posting list inside a
    // cached pair plan is an 8 GiB-broadcast hard-fail at scale (AQE
    // does not re-plan cached subtrees). This pins the capped default
    // on EVERY public API with a defaulted maxPostings parameter, so
    // the containmentCurve inconsistency cannot recur. (The one
    // documented uncapped path, lshRecallReport's exact leg, passes
    // None explicitly inside the method — it has no default to check.)
    import scala.reflect.runtime.{universe => ru}
    val mirror = ru.runtimeMirror(getClass.getClassLoader)
    val tpe = mirror.moduleSymbol(Dedup.getClass).moduleClass.asClass.toType
    val checked = for {
      m <- tpe.decls.toSeq.collect {
        case s: ru.MethodSymbol if s.isPublic && !s.isSynthetic => s
      }
      (p, i) <- m.paramLists.flatten.zipWithIndex
      // maxPostings and its renamed siblings (maxCorpusPostings)
      if p.name.toString.matches("max\\w*Postings") &&
        p.asTerm.isParamWithDefault
    } yield {
      val getter = Dedup.getClass.getMethods
        .find(_.getName == m.name.toString + "$default$" + (i + 1))
      assert(getter.isDefined, s"${m.name}: default getter missing")
      val v = getter.get.invoke(Dedup)
      assert(v == Some(10000),
        s"${m.name} defaults maxPostings=$v — every pair-emitting API " +
          "must default capped (Some(10000))")
      m.name.toString
    }
    // the invariant is vacuous if reflection finds nothing — pin the
    // known population so a rename doesn't silently skip the check
    val expected = Set("softDedupWeights", "dedupedCorpus",
      "ngramJaccardPairs", "incrementalNearDupPairs", "containmentPairs",
      "containmentCurve", "jaccardThresholdCurve", "dedupImpactReport",
      "hybridNearDups")
    assert(expected.subsetOf(checked.toSet),
      s"missing from reflection sweep: ${expected -- checked.toSet}")
  }
}
