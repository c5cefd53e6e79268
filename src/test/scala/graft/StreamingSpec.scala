package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("windowed stats over a memory stream with watermark") {
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long, String, Double)](implicitly[org.apache.spark.sql.Encoder[(Timestamp, Long, String, Double)]], spark.sqlContext)
    val events = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStreams.windowedStats(events, "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0, 10), 1L, "click", 1.0), (ts(0, 40), 2L, "click", 2.0),
        (ts(1, 10), 1L, "view", 5.0))
      q.processAllAvailable()
      // advance watermark past window [10:00,10:01) end + lateness
      in.addData((ts(5, 0), 3L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_stats").collect()
      val first = rows.find(r => r.getAs[Timestamp]("window_start") == ts(0))
      assert(first.isDefined, s"closed window missing: ${rows.mkString(";")}")
      assert(first.get.getAs[Long]("n_events") == 2)
      assert(first.get.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("sessionization with flatMapGroupsWithState closes on gap") {
    // fMGWS executes on static Datasets too (NoTimeout) — same handler
    // code path as the stream, deterministic in a single-JVM test.
    import spark.implicits._
    val events = Seq(
      EventStreams.Event(ts(0, 0), 1L, "click", 1.0),
      EventStreams.Event(ts(0, 10), 1L, "click", 2.0),
      EventStreams.Event(ts(5, 0), 1L, "click", 4.0), // >1min gap: new session
      EventStreams.Event(ts(0, 5), 2L, "view", 7.0)).toDS()
    val sessions = EventStreams.sessionize(events, gapMs = 60_000L,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    // batch mode emits closed sessions; the still-open trailing session
    // per user stays in (discarded) state — user 1's first session is
    // the only closed one
    assert(sessions.length == 1, sessions.mkString(";"))
    assert(sessions.head.user_id == 1L)
    assert(sessions.head.n_events == 2)
    assert(sessions.head.sum_value == 3.0)
    assert(sessions.head.session_start == ts(0, 0))
    assert(sessions.head.session_end == ts(0, 10))
  }

  test("streaming dedup drops same-fingerprint docs") {
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long, String)](implicitly[org.apache.spark.sql.Encoder[(Timestamp, Long, String)]], spark.sqlContext)
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = EventStreams.streamingDedup(docs, "text", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0), 1L, "hello world"), (ts(0, 30), 2L, "HELLO   world"),
        (ts(1), 3L, "unique doc"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.length == 2, out.mkString(";"))
      assert(out.map(_.getAs[Long]("doc_id")).toSet.intersect(Set(1L, 2L)).size == 1)
    } finally q.stop()
  }

  test("streaming sessionizer agrees with the batch (q62) sessionization on closed sessions") {
    // the fMGWS handler in batch mode emits every CLOSED session and
    // keeps each user's trailing session in (discarded) state; the
    // window-based batch formulation emits ALL sessions — so batch
    // minus each user's LAST session must equal the handler's output
    // exactly (same gap, same aggregates) on the real events table
    import spark.implicits._
    val gapMs = 30 * 60 * 1000L
    val ev = graft.Tables.events(spark, SparkFixture.sfDir)
    val typed = ev.select(
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
      .as[EventStreams.Event]
    val streamed = EventStreams.sessionize(typed, gapMs = gapMs,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .collect()
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
        s.n_events, math.round(s.sum_value * 100)))
      .toSet
    val batchAll = graft.SparkEntry.queries("q62_sessionize_batch")(
        spark, SparkFixture.sfDir)
      .collect()
      .map { r =>
        def ms(c: String) = r.getAs[java.time.LocalDateTime](c)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        (r.getAs[Long]("user_id"), ms("session_start"), ms("session_end"),
          r.getAs[Long]("n_events"),
          math.round(r.getAs[Double]("sum_value") * 100))
      }
    // drop each user's last (still-open) session
    val lastPerUser = batchAll.groupBy(_._1).view
      .mapValues(_.maxBy(_._2)).values.toSet
    val batchClosed = batchAll.toSet -- lastPerUser
    assert(streamed == batchClosed,
      s"streamed=${streamed.size} batchClosed=${batchClosed.size}; " +
        s"onlyStreamed=${(streamed -- batchClosed).take(3)}; " +
        s"onlyBatch=${(batchClosed -- streamed).take(3)}")
    assert(streamed.nonEmpty, "fixture should close at least one session")
  }

  test("event-time sessionization closes replayed sessions by watermark, matching batch") {
    // a REPLAYED stream: days of event time in one processAllAvailable
    // of wall clock. Processing-time eviction would close sessions on
    // wall clock (wrong under backfill); event-time eviction must
    // close exactly the sessions whose idle gap the watermark passed,
    // with the same aggregates the batch sessionizer computes.
    import spark.implicits._
    val in = MemoryStream[EventStreams.Event](
      implicitly[org.apache.spark.sql.Encoder[EventStreams.Event]],
      spark.sqlContext)
    val gapMs = 60_000L // 1 min gap
    val sessions = EventStreams.sessionizeEventTime(in.toDS(), gapMs = gapMs,
      lateness = "10 seconds")
    val q = sessions.writeStream.format("memory").queryName("et_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two users, in-order
      in.addData(
        EventStreams.Event(ts(0, 0), 1L, "click", 1.0),
        EventStreams.Event(ts(0, 10), 1L, "click", 2.0),
        EventStreams.Event(ts(0, 5), 2L, "view", 7.0))
      q.processAllAvailable()
      // batch 2: an OUT-OF-ORDER event for user 1 (0:05, within the
      // open session and above the watermark) must merge, plus a far-
      // future event that advances the watermark past every deadline
      in.addData(
        EventStreams.Event(ts(0, 5), 1L, "click", 4.0),
        EventStreams.Event(ts(50, 0), 3L, "click", 9.0))
      q.processAllAvailable()
      val streamed = spark.table("et_sessions").as[EventStreams.SessionOut]
        .collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events,
          math.round(s.sum_value * 100)))
        .toSet
      // batch twin on the same events: q62's window formulation,
      // restricted to sessions CLOSED at the final watermark (user 3's
      // trailing session is still open — deadline 50:00+1m > wm)
      val all = Seq(
        (ts(0, 0), 1L, 1.0), (ts(0, 10), 1L, 2.0), (ts(0, 5), 1L, 4.0),
        (ts(0, 5), 2L, 7.0), (ts(50, 0), 3L, 9.0))
        .toDF("ts", "user_id", "value")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts")
      val batch = all
        .withColumn("brk", org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.unix_micros($"ts") -
            org.apache.spark.sql.functions.lag(
              org.apache.spark.sql.functions.unix_micros($"ts"), 1).over(w)
            > gapMs * 1000L, 1L).otherwise(0L))
        .withColumn("session_idx",
          org.apache.spark.sql.functions.sum($"brk").over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
        .groupBy($"user_id", $"session_idx")
        .agg(
          org.apache.spark.sql.functions.min($"ts").as("session_start"),
          org.apache.spark.sql.functions.max($"ts").as("session_end"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_events"),
          org.apache.spark.sql.functions.sum($"value").as("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3),
          r.getLong(4), math.round(r.getDouble(5) * 100)))
        .toSet
      val finalWatermarkMs = ts(50, 0).getTime - 10_000L
      val batchClosed = batch.filter { case (_, _, end, _, _) =>
        end.getTime + gapMs < finalWatermarkMs
      }
      assert(streamed == batchClosed,
        s"streamed=$streamed\nbatchClosed=$batchClosed")
      // the merged out-of-order event is IN the closed session
      assert(streamed.exists { case (u, _, _, n, cents) =>
        u == 1L && n == 3 && cents == 700
      }, s"user 1's session must contain the replayed 0:05 event: $streamed")
    } finally q.stop()
  }

  test("streaming CMS cells equal the batch sketch over the same corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode, split, lit, sum}
    val in = MemoryStream[(Long, String)](implicitly[org.apache.spark.sql.Encoder[(Long, String)]], spark.sqlContext)
    val docs = in.toDF().toDF("doc_id", "text")
    val q = EventStreams.cmsCellsStream(docs, "text", depth = 3, width = 64)
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode(OutputMode.Complete()).start()
    try {
      // two micro-batches: the cells must fold associatively
      in.addData((1L, "a a b c spark"), (2L, "spark spark stream"))
      q.processAllAvailable()
      in.addData((3L, "a stream stream table"))
      q.processAllAvailable()
      val streamCells = spark.table("cms_cells").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batchDocs = Seq((1L, "a a b c spark"), (2L, "spark spark stream"),
        (3L, "a stream stream table")).toDF("doc_id", "text")
      val batchCells = graft.pipeline.TextAnalysis.cmsEntries(
          batchDocs.select(explode(split(col("text"), " ")).as("tok"))
            .withColumn("w", lit(1L)),
          "tok", "w", depth = 3, width = 64)
        .groupBy(col("j"), col("b")).agg(sum(col("w")).as("cell"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamCells == batchCells,
        s"stream cells diverge: $streamCells vs $batchCells")
      // depth rows' totals each equal the token count (5 + 3 + 4)
      (0 until 3).foreach { j =>
        val tot = streamCells.collect { case ((`j`, _), c) => c }.sum
        assert(tot == 12L, s"row $j total $tot")
      }
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dim and keeps unmatched rows") {
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long, Double)](implicitly[org.apache.spark.sql.Encoder[(Timestamp, Long, Double)]], spark.sqlContext)
    val stream = in.toDF().toDF("ts", "user_id", "value")
    val dim = Seq((1L, "pro"), (2L, "free")).toDF("user_id", "tier")
    val q = EventStreams.enrichWithDim(stream, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0), 1L, 1.0), (ts(1), 9L, 2.0))
      q.processAllAvailable()
      val out = spark.table("enriched").collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("tier")).toMap
      assert(out == Map(1L -> "pro", 9L -> null), out.toString)
    } finally q.stop()
  }

  test("stateless doc-stream curation: signals + split, no state store") {
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long, String)](implicitly[org.apache.spark.sql.Encoder[(Timestamp, Long, String)]], spark.sqlContext)
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val longText = ("the quick brown fox and some of it " * 4).trim
    val q = EventStreams.curateDocStream(docs, "text", "doc_id", minTokens = 5L)
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0), 1L, longText), (ts(0, 30), 2L, "too short"))
      q.processAllAvailable()
      val out = spark.table("curated").collect()
      assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L), out.mkString(";"))
      val r = out.head
      assert(r.getAs[Long]("n_tokens") == 32L)
      assert(Set("train", "val", "test").contains(r.getAs[String]("split")))
      // split assignment must equal the BATCH operator's for the same id
      val batch = graft.pipeline.Sampling.hashSplit(
          Seq((1L, "x")).toDF("doc_id", "text"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .collect().head.getAs[String]("split")
      assert(r.getAs[String]("split") == batch,
        "stream and batch split must agree on the same id")
    } finally q.stop()
  }

  test("windowed heavy hitters: closed windows + finisher equal the batch rank") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode, split, lit, count, window}
    val in = MemoryStream[(Timestamp, Long, String)](implicitly[org.apache.spark.sql.Encoder[(Timestamp, Long, String)]], spark.sqlContext)
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = EventStreams.windowedTokenCounts(docs, "ts", "text",
        windowDur = "10 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(1), 1L, "spark spark stream batch"),
        (ts(4), 2L, "spark table scan"))
      q.processAllAvailable()
      // a LATE-but-admissible doc for window 0 (watermark still at ~0)
      in.addData((ts(2), 3L, "stream stream merge"))
      q.processAllAvailable()
      // advance event time far past window 0 + lateness -> closes it
      in.addData((ts(40), 4L, "later window content"))
      q.processAllAvailable()
      in.addData((ts(90), 5L, "push watermark again"))
      q.processAllAvailable()
      val closed = spark.table("win_counts")
      assert(closed.count() > 0, "no windows closed")
      // every CLOSED window's counts must equal the batch aggregation
      // over exactly the docs that fell in it (the on-time ones plus
      // the late-but-admissible one)
      val batchAll = Seq((ts(1), 1L, "spark spark stream batch"),
          (ts(4), 2L, "spark table scan"), (ts(2), 3L, "stream stream merge"),
          (ts(40), 4L, "later window content"), (ts(90), 5L, "push watermark again"))
        .toDF("ts", "doc_id", "text")
        .select(col("ts"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(window(col("ts"), "10 minutes"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("win_start"), col("tok"), col("cnt"))
        .collect()
        .map(r => (r.getAs[Any]("win_start").toString, r.getAs[String]("tok"),
          r.getAs[Long]("cnt"))).toSet
      val streamRows = closed.collect()
        .map(r => (r.getAs[Any]("win_start").toString, r.getAs[String]("tok"),
          r.getAs[Long]("cnt")))
      assert(streamRows.nonEmpty)
      streamRows.foreach { row =>
        assert(batchAll.contains(row), s"stream row $row not in batch computation")
      }
      // the first window (the late doc's target) emitted with the late
      // tokens included: "stream" counts 1 (on-time) + 2 (late) = 3
      assert(streamRows.contains((ts(0).toString, "stream", 3L)),
        streamRows.mkString("; "))
      // finisher: top-2 per window over the closed counts equals the
      // batch rank over the same rows
      val fin = EventStreams.topKPerWindow(
          spark.table("win_counts"), k = 2)
        .collect().map(r => (r.getAs[String]("tok"), r.getAs[Long]("cnt"), r.getAs[Long]("rank")))
      assert(fin.nonEmpty && fin.forall(_._3 <= 2))
      val top1 = fin.filter(_._3 == 1L).map(_._1).toSet
      assert(top1.contains("spark") || top1.contains("stream"), top1.toString)
    } finally q.stop()
  }

  test("streaming bloom decontamination equals the batch probe, statelessly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (benchRows, candRows) = docs.partition(_._1 % 10 == 0)
    val bench = benchRows.toSeq.toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)](implicitly[org.apache.spark.sql.Encoder[(Long, String)]], spark.sqlContext)
    val stream = in.toDF().toDF("doc_id", "text")
    val q = EventStreams.decontaminateDocStream(stream, bench,
        "text", "doc_id", n = 3, mBits = 2048, kHash = 3)
      .writeStream.format("memory").queryName("decontam")
      .outputMode(OutputMode.Append()).start()
    try {
      // three micro-batches; per-row results must not depend on batching
      val cand = candRows.toSeq
      cand.grouped(math.max(1, cand.size / 3)).foreach { g =>
        in.addData(g: _*); q.processAllAvailable()
      }
      val streamOut = spark.table("decontam")
        .where(col("n_shingles") > 0).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // the batch operator emits only docs with >= 1 shingle and adds
      // the exact-hit leg; (n_shingles, bloom_hits) must be identical
      val batch = graft.pipeline.Decontaminate.bloomContamination(
          cand.toDF("doc_id", "text"), bench, "text", "doc_id",
          n = 3, mBits = 2048, kHash = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(streamOut.keySet == batch.keySet)
      streamOut.foreach { case (id, (ns, bh)) =>
        val (bns, bbh, beh) = batch(id)
        assert(ns == bns && bh == bbh, s"doc $id: stream ($ns,$bh) batch ($bns,$bbh)")
        assert(bh >= beh, s"doc $id: bloom must never undercount exact")
      }
      assert(streamOut.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join on closed pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val enc = implicitly[org.apache.spark.sql.Encoder[(Timestamp, Long, String, Double)]]
    val lIn = MemoryStream[(Timestamp, Long, String, Double)](enc, spark.sqlContext)
    val rIn = MemoryStream[(Timestamp, Long, String, Double)](enc, spark.sqlContext)
    val cols = Seq("ts", "user_id", "event_type", "value")
    val joined = EventStreams.streamIntervalJoin(
      lIn.toDF().toDF(cols: _*), rIn.toDF().toDF(cols: _*),
      key = "user_id", horizon = "2 minutes", lateness = "1 minute")
    val q = joined.writeStream.format("memory").queryName("sij")
      .outputMode(OutputMode.Append()).start()
    // left: "deploy" markers; right: "error" events, OUT OF ORDER
    // within lateness, split across micro-batches
    val lefts: Seq[(Timestamp, Long, String, Double)] = Seq(
      (ts(0, 0), 1L, "deploy", 0.0), (ts(1, 0), 2L, "deploy", 0.0),
      (ts(3, 0), 1L, "deploy", 0.0))
    val rights: Seq[(Timestamp, Long, String, Double)] = Seq(
      (ts(0, 30), 1L, "error", 1.0),  // within u1's first horizon
      (ts(2, 30), 1L, "error", 2.0),  // in a gap: after 0:00+2m, before the 3:00 deploy -> no match
      (ts(3, 30), 1L, "error", 3.0),  // within u1's second horizon
      (ts(1, 30), 2L, "error", 4.0),  // within u2's horizon
      (ts(0, 45), 2L, "error", 5.0))  // BEFORE u2's deploy: no match
    try {
      lIn.addData(lefts.take(2): _*)
      rIn.addData(rights(0), rights(4))
      q.processAllAvailable()
      lIn.addData(lefts(2))
      rIn.addData(rights(3), rights(1)) // out of order arrival
      q.processAllAvailable()
      rIn.addData(rights(2))
      q.processAllAvailable()
      // watermark-advancing flush on both sides closes all pairs
      lIn.addData((ts(30, 0), 9L, "deploy", 0.0))
      rIn.addData((ts(30, 0), 9L, "error", 0.0))
      q.processAllAvailable()
      val got = spark.table("sij")
        .where(col("user_id") =!= 9L)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts_left"),
          r.getAs[Timestamp]("ts_right"), r.getAs[Double]("value_right"))).toSet
      // batch reference: identical predicate on static frames
      val lb = lefts.toDF(cols: _*).alias("l")
      val rb = rights.toDF(cols: _*).alias("r")
      val ref = lb.join(rb,
          col("l.user_id") === col("r.user_id") &&
            col("r.ts") >= col("l.ts") &&
            col("r.ts") <= col("l.ts") + org.apache.spark.sql.functions.expr("INTERVAL 2 minutes"))
        .select(col("l.user_id"), col("l.ts"), col("r.ts"), col("r.value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3))).toSet
      assert(got == ref, s"stream pairs $got != batch pairs $ref")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join leftOuter emits unmatched lefts with null rights") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val enc = implicitly[org.apache.spark.sql.Encoder[(Timestamp, Long, String, Double)]]
    val lIn = MemoryStream[(Timestamp, Long, String, Double)](enc, spark.sqlContext)
    val rIn = MemoryStream[(Timestamp, Long, String, Double)](enc, spark.sqlContext)
    val cols = Seq("ts", "user_id", "event_type", "value")
    val q = EventStreams.streamIntervalJoin(
        lIn.toDF().toDF(cols: _*), rIn.toDF().toDF(cols: _*),
        key = "user_id", horizon = "2 minutes", lateness = "1 minute",
        leftOuter = true)
      .writeStream.format("memory").queryName("sij_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData((ts(0, 0), 1L, "deploy", 0.0), (ts(0, 0), 2L, "deploy", 0.0))
      rIn.addData((ts(0, 30), 1L, "error", 1.0)) // user 1 matches; user 2 never does
      q.processAllAvailable()
      // watermark far past user 2's horizon on BOTH sides: the null
      // row may only emit once the watermark CLOSES the horizon
      lIn.addData((ts(30, 0), 9L, "deploy", 0.0))
      rIn.addData((ts(30, 0), 9L, "noise", 0.0))
      q.processAllAvailable()
      val rows = spark.table("sij_outer").where(col("user_id") =!= 9L).collect()
      val byUser = rows.groupBy(_.getAs[Long]("user_id"))
      assert(byUser(1L).exists(r => r.getAs[Timestamp]("ts_right") == ts(0, 30)))
      assert(byUser(2L).forall(r => r.getAs[Timestamp]("ts_right") == null &&
        r.getAs[String]("type_right") == null),
        s"user 2 must emit only the null-right row: ${byUser(2L).mkString(";")}")
      assert(byUser.contains(2L), "unmatched left must still emit")
    } finally q.stop()
  }
}
