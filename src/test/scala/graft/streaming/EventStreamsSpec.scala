package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: gap split, watermark close, timeout close") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0),
      EventStreams.Event(2, 10, "click", ts("2026-01-01 10:05:00"), 2.0),
      EventStreams.Event(3, 10, "click", ts("2026-01-01 12:00:00"), 4.0),
      EventStreams.Event(4, 11, "view", ts("2026-01-01 10:20:00"), 8.0))
    val sq = EventStreams.sessionize(ms.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_spec").outputMode("append").start()
    try {
      sq.processAllAvailable()
      // advance watermark far enough to time out the open sessions
      ms.addData(EventStreams.Event(5, 10, "click", ts("2026-01-01 15:00:00"), 16.0))
      sq.processAllAvailable()
      val out = spark.sql(
        "SELECT user_id, event_count, session_value FROM sess_spec ORDER BY user_id, session_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(out.contains((10L, 2L, 3.0)))  // first session: events 1+2
      assert(out.contains((10L, 1L, 4.0)))  // second session closed by event 5's watermark
      assert(out.contains((11L, 1L, 8.0)))  // user 11 closed by event-time timeout
    } finally sq.stop()
  }

  test("dedupByContent drops streamed duplicate texts, keeps distinct ones") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    ms.addData(
      (1L, "the same document", ts("2026-01-01 10:00:00")),
      (2L, "the same document", ts("2026-01-01 10:01:00")),
      (3L, "a different document", ts("2026-01-01 10:02:00")))
    val sq = EventStreams.dedupByContent(
        ms.toDF().toDF("doc_id", "text", "ts"), "text", "ts")
      .writeStream.format("memory").queryName("cdedup_spec").outputMode("append").start()
    try {
      sq.processAllAvailable()
      val out = spark.sql("SELECT doc_id FROM cdedup_spec ORDER BY doc_id")
        .collect().map(_.getLong(0))
      assert(out.toSeq == Seq(1L, 3L), "second copy of identical text must be dropped")
    } finally sq.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0),
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:30"), 1.0),
      EventStreams.Event(9, 12, "view", ts("2026-01-01 10:01:00"), 3.0))
    val sq = EventStreams.dedup(ms.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dd_spec").outputMode("append").start()
    try {
      sq.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dd_spec").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 9L))
    } finally sq.stop()
  }

  test("decontaminateSink agrees with batch decontaminate; replayed batch is idempotent") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an entirely different document about spark engines"),
      (3L, "sources say the quick brown fox was seen again"),
      (4L, "clean text with no overlap at all here"))
    val bench = Seq((100L, "watch the quick brown fox run"))
      .toDF("doc_id", "text")
    // unpersisted in the tail: a leaked cache makes a LATER suite's plan
    // assertion see an InMemoryRelation substituted into its own subtree
    val benchShingles = Dedup.benchmarkShingles(bench, "text", k = 3).cache()
    try {
    val base = java.nio.file.Files.createTempDirectory("decon_stream").toString
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")

    // two micro-batches through the sink
    val ms = MemoryStream[(Long, String)]
    ms.addData(corpus.take(2): _*)
    EventStreams.decontaminateSink(ms.toDF().toDF("doc_id", "text"), benchShingles,
      "doc_id", "text", out, ckpt, k = 3)
    ms.addData(corpus.drop(2): _*)
    EventStreams.decontaminateSink(ms.toDF().toDF("doc_id", "text"), benchShingles,
      "doc_id", "text", out, ckpt, k = 3)

    val streamed = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val batch = Dedup.decontaminate(corpus.toDF("doc_id", "text"), bench,
        "doc_id", "text", k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch, "stream ∪ micro-batches must equal batch decontamination")
    assert(streamed == Set(2L, 4L))

    // at-least-once replay: re-running a committed batch id overwrites its
    // own partition instead of appending duplicates
    val beforeReplay = spark.read.parquet(out).count()
    val replay = corpus.take(2).toDF("doc_id", "text")
    Dedup.decontaminateAgainst(replay, benchShingles, "doc_id", "text", k = 3)
      .write.mode("overwrite").parquet(s"$out/batch=0")
    assert(spark.read.parquet(out).count() == beforeReplay,
      "replaying batch 0 must not duplicate rows")
    } finally benchShingles.unpersist()
  }

  test("removeSpansSink agrees with batch removeDuplicateSpans given the same hash set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "x y alpha beta gamma z"),          // shares "alpha beta gamma" with 1
      (3L, "p q r s"),                         // unique
      (4L, "m n alpha beta gamma o"))          // shares the run too
    val corpusDf = corpus.toDF("doc_id", "text")
    // the persistable corpus artifact: built ONCE over landed history;
    // cached here to mirror the deployment shape, released in the tail
    val dup = Dedup.duplicatedWindowHashes(corpusDf, "doc_id", "text", width = 3).cache()
    try {
      val base = java.nio.file.Files.createTempDirectory("spans_stream").toString
      val (out, ckpt) = (s"$base/out", s"$base/ckpt")
      val ms = MemoryStream[(Long, String)]
      ms.addData(corpus.take(2): _*)
      EventStreams.removeSpansSink(ms.toDF().toDF("doc_id", "text"), dup,
        "doc_id", "text", out, ckpt, width = 3)
      ms.addData(corpus.drop(2): _*)
      EventStreams.removeSpansSink(ms.toDF().toDF("doc_id", "text"), dup,
        "doc_id", "text", out, ckpt, width = 3)
      val streamed = spark.read.parquet(out)
        .select("doc_id", "clean_text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // per-doc output depends only on the doc's own windows + the hash
      // set, so micro-batched output == the batch operator's
      val (batchOut, rel) = Dedup.removeDuplicateSpansReleasable(
        corpusDf, "doc_id", "text", width = 3)
      val batch = try batchOut.select("doc_id", "clean_text")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        finally rel()
      assert(streamed == batch, "stream ∪ micro-batches must equal batch span dedup")
      assert(streamed(1L) == "delta epsilon" && streamed(3L) == "p q r s")
      // a NEW doc carrying known boilerplate is cut on arrival, even
      // though it was never part of the detection corpus
      val fresh = Seq((9L, "h i alpha beta gamma j")).toDF("doc_id", "text")
      val freshOut = Dedup.removeKnownSpans(fresh, dup, "doc_id", "text", width = 3)
        .select("clean_text").head().getString(0)
      assert(freshOut == "h i j")
    } finally dup.unpersist()
  }

  test("qualityGateSink agrees with batch keepTopQuantile given the same threshold") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.operators.{Curation, TextAnalysis}
    val weights = Array.tabulate(256)(b => (b * 2654435761L % 1000).toDouble / 1000 - 0.5)
    def score(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.linearClassifierScore(df, "text", weights, bias = 0.1, seed = "qg")
    val corpus = (1L to 40L).map(i =>
      (i, s"document number $i with deterministic token salad ${"w" * (i % 7).toInt}"))
    val corpusDf = corpus.toDF("doc_id", "text")

    // threshold fit ONCE on (batch) history — the contract the sink documents
    val thr = Curation.topQuantileThreshold(
      score(corpusDf), "clf_score", keepFraction = 0.5, exact = true).get
    val batchKept = score(corpusDf).filter(col("clf_score") >= thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // sanity: the scalar-threshold set IS the keepTopQuantile set
    // (releasable form so the shared test session keeps no gate cache)
    val (gate, releaseGate) = Curation.keepTopQuantileReleasable(
      score(corpusDf), "clf_score", 0.5, exact = true)
    val gateKept = gate.select("doc_id").collect().map(_.getLong(0)).toSet
    releaseGate()
    assert(batchKept == gateKept)

    val base = java.nio.file.Files.createTempDirectory("qgate_stream").toString
    val ms = MemoryStream[(Long, String)]
    ms.addData(corpus.take(15): _*)
    EventStreams.qualityGateSink(ms.toDF().toDF("doc_id", "text"),
      score, "clf_score", thr, s"$base/out", s"$base/ckpt")
    ms.addData(corpus.drop(15): _*)
    EventStreams.qualityGateSink(ms.toDF().toDF("doc_id", "text"),
      score, "clf_score", thr, s"$base/out", s"$base/ckpt")

    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batchKept,
      "stream ∪ micro-batches must equal the batch quality gate")
  }

  test("nearDedupSink agrees with batch dedupNearAgainstCorpus given the same index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (2L, "one two three four five six seven eight nine ten"))
    val arriving = Seq(
      (10L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"), // exact
      (11L, "one two three four five six seven eight nine eleven"),            // near
      (12L, "completely unrelated text about mountains and rivers flowing"))
    // the persistable corpus artifact, built once over landed history
    val idx = Dedup.minhashIndex(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .cache()
    try {
      val base = java.nio.file.Files.createTempDirectory("neardedup_stream").toString
      val (out, ckpt) = (s"$base/out", s"$base/ckpt")
      val ms = MemoryStream[(Long, String)]
      ms.addData(arriving.take(2): _*)
      EventStreams.nearDedupSink(ms.toDF().toDF("doc_id", "text"), idx,
        "doc_id", "text", out, ckpt, threshold = 0.5)
      ms.addData(arriving.drop(2): _*)
      EventStreams.nearDedupSink(ms.toDF().toDF("doc_id", "text"), idx,
        "doc_id", "text", out, ckpt, threshold = 0.5)
      val streamed = spark.read.parquet(out)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // per-row keep/drop depends only on the row and the fixed index, so
      // micro-batched output == the batch filter regardless of batching
      val batch = Dedup.dedupNearAgainstCorpus(
        arriving.toDF("doc_id", "text"), idx, "doc_id", "text", threshold = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch, "stream ∪ micro-batches must equal the batch filter")
      assert(streamed == Set(12L), "only the fresh doc survives near-dedup")
    } finally idx.unpersist()
  }

  test("decontaminateSink with a continuous trigger returns the live handle, not blocks") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Dedup
    val bench = Seq((100L, "watch the quick brown fox run")).toDF("doc_id", "text")
    val benchShingles = Dedup.benchmarkShingles(bench, "text", k = 3).cache()
    val base = java.nio.file.Files.createTempDirectory("decon_cont").toString
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, "some clean document text here"))
    // with awaitTermination this call would hang forever on a
    // ProcessingTime trigger; it must hand back the running query
    val q = EventStreams.decontaminateSink(ms.toDF().toDF("doc_id", "text"),
      benchShingles, "doc_id", "text", s"$base/out", s"$base/ckpt", k = 3,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"))
    try {
      assert(q.isActive, "continuous query must still be running when the call returns")
      q.processAllAvailable()
      assert(spark.read.parquet(s"$base/out").count() == 1)
    } finally { q.stop(); benchShingles.unpersist() }
  }

  test("ingestAvailableNow processes only files new since the last checkpoint") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("ingest").toFile.getAbsolutePath
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$src/batch1")

    EventStreams.ingestAvailableNow(spark, s"$src/*", schema, sink, ckpt)
    assert(spark.read.parquet(sink).count() == 2)

    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$src/batch2")
    EventStreams.ingestAvailableNow(spark, s"$src/*", schema, sink, ckpt)
    val all = spark.read.parquet(sink)
    assert(all.count() == 3) // batch1 NOT reprocessed: exactly-once append
    assert(all.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("streaming sessionize agrees with the batch sessionize on identical input") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0),
      EventStreams.Event(2, 10, "click", ts("2026-01-01 10:20:00"), 2.0),
      EventStreams.Event(3, 10, "buy", ts("2026-01-01 11:30:00"), 4.0),
      EventStreams.Event(4, 11, "view", ts("2026-01-01 09:00:00"), 8.0),
      EventStreams.Event(5, 11, "view", ts("2026-01-01 09:10:00"), 16.0))

    val batch = graft.operators.Analytics.sessionize(events.toDF(), 30)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start"), r.getAs[java.sql.Timestamp]("session_end"),
        r.getAs[Long]("event_count"), r.getAs[Double]("session_value"))).toSet

    val ms = MemoryStream[EventStreams.Event]
    ms.addData(events: _*)
    val sq = EventStreams.sessionize(ms.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("equiv_sess").outputMode("append").start()
    try {
      sq.processAllAvailable()
      // a far-future event per user flushes every open session via watermark
      ms.addData(EventStreams.Event(98, 10, "x", ts("2026-01-02 00:00:00"), 0.0),
        EventStreams.Event(99, 11, "x", ts("2026-01-02 00:00:00"), 0.0))
      sq.processAllAvailable()
      val stream = spark.sql(
        "SELECT user_id, session_start, session_end, event_count, session_value FROM equiv_sess")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(stream == batch,
        s"stream=$stream\nbatch=$batch") // same sessions from both engines
    } finally sq.stop()
  }

  test("streaming windowedCounts agrees with batch eventWindowAgg on counts and sums") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = (0 until 30).map(i => EventStreams.Event(
      i.toLong, (i % 5).toLong, if (i % 2 == 0) "click" else "view",
      ts(f"2026-01-01 ${10 + i / 15}%02d:${(i * 3) % 60}%02d:00"), i.toDouble))

    val batch = graft.operators.Analytics.eventWindowAgg(events.toDF())
      .select("window_start", "event_type", "event_count", "total_value")
      .collect().map(r => (r.getAs[Any](0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val ms = MemoryStream[EventStreams.Event]
    ms.addData(events: _*)
    val sq = EventStreams.windowedCounts(ms.toDF())
      .writeStream.format("memory").queryName("equiv_wc").outputMode("append").start()
    try {
      sq.processAllAvailable()
      ms.addData(EventStreams.Event(99, 0, "x", ts("2026-01-02 00:00:00"), 0.0)) // flush watermark
      sq.processAllAvailable()
      val stream = spark.sql(
        "SELECT window_start, event_type, event_count, total_value FROM equiv_wc WHERE event_type <> 'x'")
        .collect().map(r => (r.getAs[Any](0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(stream == batch, s"stream=$stream\nbatch=$batch")
    } finally sq.stop()
  }

  test("driftMonitorSink scores each batch like the batch psiReport; replay idempotent") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift").toFile.getAbsolutePath
    val baseline = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x").cache()
    // batch1 sits entirely above the baseline range → hard drift;
    // batch2 (odd values 1..99) matches the baseline's uniform deciles
    val batch1 = (1 to 50).map(i => (i.toLong, i.toDouble + 100))
    val batch2 = (1 to 50).map(i => (i.toLong, i.toDouble * 2 - 1))
    val ms = MemoryStream[(Long, Double)]
    ms.addData(batch1: _*)
    EventStreams.driftMonitorSink(ms.toDF().toDF("id", "x"), baseline,
      Seq("x"), s"$dir/out", s"$dir/ckpt", alertAt = 0.1)
    ms.addData(batch2: _*)
    EventStreams.driftMonitorSink(ms.toDF().toDF("id", "x"), baseline,
      Seq("x"), s"$dir/out", s"$dir/ckpt", alertAt = 0.1)
    def read(b: Int) = spark.read.parquet(s"$dir/out/batch=$b")
      .select("column", "psi", "drift_alert")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2))).toSeq
    val expect1 = graft.operators.Validation.psiReport(
        baseline, batch1.toDF("id", "x"), Seq("x"), alertAt = 0.1)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2))).toSeq
    val expect2 = graft.operators.Validation.psiReport(
        baseline, batch2.toDF("id", "x"), Seq("x"), alertAt = 0.1)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(read(0) == expect1 && read(0).head._3, s"b0=${read(0)}")
    assert(read(1) == expect2 && !read(1).head._3, s"b1=${read(1)}")
    baseline.unpersist()
  }

  test("cohortSnapshotSink: final triangle equals batch cohortRetention") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cohort").toFile.getAbsolutePath
    // 5 users across 3 weeks; user activity deliberately spans batches
    // (u1's week-2 return arrives in batch 2) and repeats within a week
    // (the distinct-user rule must dedup across batches, not per batch)
    val all = Seq(
      (1L, ts("2026-01-05 10:00:00")), (2L, ts("2026-01-06 10:00:00")),
      (3L, ts("2026-01-12 10:00:00")), (1L, ts("2026-01-07 09:00:00")),
      (1L, ts("2026-01-13 10:00:00")), (2L, ts("2026-01-19 10:00:00")),
      (4L, ts("2026-01-20 10:00:00")), (1L, ts("2026-01-14 11:00:00")),
      (5L, ts("2026-01-26 10:00:00")), (3L, ts("2026-01-27 10:00:00")))
    val (batch1, batch2) = all.splitAt(6)
    val evDf = all.toDF("user_id", "ts")
    val firsts = graft.operators.Analytics
      .cohortAssignments(evDf, "user_id", "ts").cache()
    firsts.count()
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    def run(): Unit = EventStreams.cohortSnapshotSink(
      ms.toDF().toDF("user_id", "ts"), firsts, "user_id", "ts",
      s"$dir/state", s"$dir/out", s"$dir/ckpt")
    ms.addData(batch1: _*); run()
    ms.addData(batch2: _*); run()
    def tri(df: org.apache.spark.sql.DataFrame) =
      df.select("cohort_week", "week_offset", "active_users").collect()
        .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    val streamed = tri(spark.read.parquet(s"$dir/out/batch=1"))
    val batch = tri(graft.operators.Analytics.cohortRetention(evDf, "user_id", "ts"))
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    firsts.unpersist()
  }

  test("cohortSnapshotSink sketch mode: O(cells) state, final triangle equals batch sketch mode") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cohortsk").toFile.getAbsolutePath
    // same shape as the exact test, incl. cross-batch repeat activity:
    // the sketch union must dedup u1's week-1 activity split over batches
    val all = Seq(
      (1L, ts("2026-01-05 10:00:00")), (2L, ts("2026-01-06 10:00:00")),
      (3L, ts("2026-01-12 10:00:00")), (1L, ts("2026-01-07 09:00:00")),
      (1L, ts("2026-01-13 10:00:00")), (2L, ts("2026-01-19 10:00:00")),
      (4L, ts("2026-01-20 10:00:00")), (1L, ts("2026-01-14 11:00:00")),
      (5L, ts("2026-01-26 10:00:00")), (3L, ts("2026-01-27 10:00:00")))
    val (batch1, batch2) = all.splitAt(6)
    val evDf = all.toDF("user_id", "ts")
    val firsts = graft.operators.Analytics
      .cohortAssignments(evDf, "user_id", "ts").cache()
    firsts.count()
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    def run(): Unit = EventStreams.cohortSnapshotSink(
      ms.toDF().toDF("user_id", "ts"), firsts, "user_id", "ts",
      s"$dir/state", s"$dir/out", s"$dir/ckpt", mode = "sketch")
    ms.addData(batch1: _*); run()
    ms.addData(batch2: _*); run()
    def tri(df: org.apache.spark.sql.DataFrame) =
      df.select("cohort_week", "week_offset", "active_users").collect()
        .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    val streamed = tri(spark.read.parquet(s"$dir/out/batch=1"))
    val batch = tri(graft.operators.Analytics.cohortRetention(
      evDf, "user_id", "ts", mode = "sketch"))
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    // state really is one row per (cohort, offset) cell, not per user
    val state = EventStreams.readUpserted(spark, s"$dir/state").get
    assert(state.columns.toSet == Set("cohort_week", "week_offset", "_sk"))
    val cells = state.count()
    assert(cells == batch.size.toLong, s"state rows $cells != cells ${batch.size}")
    firsts.unpersist()
  }

  test("rfmSnapshotSink: final snapshot equals batch rfmSegments") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rfm").toFile.getAbsolutePath
    // 8 customers; c1's orders split across batches so frequency/monetary
    // must merge additively and recency must take the max across batches
    val all = (1 to 8).flatMap { c =>
      (0 until c).map(k =>
        (c.toLong, ts(f"2026-01-${k + 1}%02d 00:00:00"), 100.0 * c + k))
    }
    val (batch1, batch2) = all.partition { case (c, t, _) =>
      (c + t.getTime) % 2 == 0 }
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    def run(): Unit = EventStreams.rfmSnapshotSink(
      ms.toDF().toDF("o_custkey", "o_orderdate", "o_totalprice"),
      s"$dir/state", s"$dir/out", s"$dir/ckpt")
    ms.addData(batch1: _*); run()
    ms.addData(batch2: _*); run()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("o_custkey", "recency_days", "frequency", "monetary",
          "r_score", "f_score", "m_score", "segment")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
        .sortBy(_._1).toSeq
    val streamed = canon(spark.read.parquet(s"$dir/out/batch=1"))
    val batch = canon(graft.operators.Analytics.rfmSegments(
      all.toDF("o_custkey", "o_orderdate", "o_totalprice")))
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
  }

  test("profileSink: final report equals batch profile over concatenated batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prof").toFile.getAbsolutePath
    // numeric + string columns, nulls in both, duplicate values across
    // batches (the HLL union must not double-count them), exact decimals
    // so the merged decimal-sum mean equals batch avg at round(4); z is
    // ALL-null in every batch — its sketch never materializes and the
    // report must still say 0 distinct, like the batch profile
    val b1 = Seq((1L, Some(10.5), Some("a"), Option.empty[Double]),
      (2L, None, Some("b"), None), (3L, Some(20.0), None, None))
    val b2 = Seq((4L, Some(10.5), Some("a"), Option.empty[Double]),
      (5L, Some(9.0), Some("c"), None), (6L, None, Some("b"), None))
    val ms = MemoryStream[(Long, Option[Double], Option[String], Option[Double])]
    def run(): Unit = EventStreams.profileSink(
      ms.toDF().toDF("id", "x", "s", "z"),
      s"$dir/state", s"$dir/out", s"$dir/ckpt")
    ms.addData(b1: _*); run()
    ms.addData(b2: _*); run()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("column", "dtype", "row_count", "null_count", "null_pct",
          "distinct_count", "min", "max", "mean")
        .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val streamed = canon(spark.read.parquet(s"$dir/out/batch=1"))
    val batch = canon(graft.operators.Cleaning.profile(
      (b1 ++ b2).toDF("id", "x", "s", "z"), exactDistinct = true))
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    // spot-pin the interesting cells: x has 2 nulls, 3 distinct non-null
    // values (10.5 dedups across batches), mean (10.5+20+10.5+9)/4 = 12.5
    val x = streamed("x")
    assert(x(1) == 6L && x(2) == 2L && x(4) == 3L && x(7) == 12.5, s"x=$x")
  }

  test("activeUsersSink: final snapshot equals batch sketch mode; cross-batch same-day users dedup") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("au").toFile.getAbsolutePath
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    // u1 on Jan 1 appears in BOTH batches: the sketch union must count
    // it once (an additive count-merge would read 3 users on Jan 1)
    val b1 = Seq((1L, t("2026-01-01")), (2L, t("2026-01-01")))
    val b2 = Seq((1L, t("2026-01-01")), (3L, t("2026-01-02")), (4L, t("2026-01-10")))
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    def run(): Unit = EventStreams.activeUsersSink(
      ms.toDF().toDF("user_id", "ts"), "user_id", "ts",
      s"$dir/state", s"$dir/out", s"$dir/ckpt", windowDays = 3)
    ms.addData(b1: _*); run()
    ms.addData(b2: _*); run()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("day", "active_users").collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val streamed = canon(spark.read.parquet(s"$dir/out/batch=1"))
    val batch = canon(graft.operators.Analytics.activeUsers(
      (b1 ++ b2).toDF("user_id", "ts"), "user_id", "ts",
      windowDays = 3, mode = "sketch"))
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // HLL is exact at this cardinality — pin the absolute values too
    // (incl. the gap: Jan 10's 3-day window must not see Jan 1-2)
    assert(streamed == Map("2026-01-01" -> 2L, "2026-01-02" -> 3L,
      "2026-01-10" -> 1L), s"got $streamed")
  }

  test("changelogSink: final view equals batch applyChangelog; tombstone blocks late older update") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc").toFile.getAbsolutePath
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    // batch 2 is deliberately OUT OF ORDER: k2's U@3 arrives after its
    // D@7 (must stay deleted — the tombstone outranks it in state) and
    // k4's U@2 after its I@1
    val b1 = Seq((1L, "a2", "U", 10L), (2L, "x", "D", 7L), (4L, "d", "I", 1L))
    val b2 = Seq((2L, "zombie", "U", 3L), (4L, "d2", "U", 2L))
    val ms = MemoryStream[(Long, String, String, Long)]
    def run(): Unit = EventStreams.changelogSink(
      ms.toDF().toDF("k", "v", "op", "version"),
      s"$dir/state", s"$dir/ckpt", Seq("k"))
    ms.addData(b1: _*); run()
    ms.addData(b2: _*); run()
    val streamed = EventStreams.readChangelogApplied(spark, snap, s"$dir/state", Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = graft.sinks.DataSink.applyChangelog(
        snap, (b1 ++ b2).toDF("k", "v", "op", "version"), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed == Set((1L, "a2"), (3L, "c"), (4L, "d2")),
      s"k2 must stay deleted, k4 must carry the later update, got $streamed")
  }

  test("changelogSink replay: a re-delivered committed batch is a no-op; an uncommitted one re-merges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdcrp").toFile.getAbsolutePath
    val snap = Seq((1L, "a")).toDF("k", "v")
    val b0 = Seq((1L, "a1", "U", 5L), (2L, "b", "I", 1L)).toDF("k", "v", "op", "version")
    def merge(cur: Option[org.apache.spark.sql.DataFrame],
              b: org.apache.spark.sql.DataFrame) =
      graft.sinks.DataSink.compactChangelog(
        cur.fold(b)(_.unionByName(b)), Seq("k"))
    // commit batch 0, then REPLAY it (foreachBatch redelivers after a
    // crash between the pointer swap and the checkpoint commit): the
    // pointer already names v_0, so the guard must skip the merge —
    // otherwise the merge would read v_0 while overwriting it
    EventStreams.applyMergeBatch(spark, b0, 0L, s"$dir/state")(merge)
    val v1 = EventStreams.currentSnapshotName(spark, s"$dir/state")
    EventStreams.applyMergeBatch(spark, b0, 0L, s"$dir/state")(merge)
    assert(EventStreams.currentSnapshotName(spark, s"$dir/state") == v1,
      "replaying a committed batch must not write a new snapshot")
    val view = EventStreams.readChangelogApplied(spark, snap, s"$dir/state", Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(view == Set((1L, "a1"), (2L, "b")), s"got $view")
    // a LATER batch (new id) merges normally on top
    val b1 = Seq((2L, "x", "D", 9L)).toDF("k", "v", "op", "version")
    EventStreams.applyMergeBatch(spark, b1, 1L, s"$dir/state")(merge)
    val after = EventStreams.readChangelogApplied(spark, snap, s"$dir/state", Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == Set((1L, "a1")), s"got $after")
  }

  test("tableLogChangelogSink: CDC state with time travel — final view == batch, per-batch versions audit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.sinks.TableLog
    val dir = java.nio.file.Files.createTempDirectory("cdctl").toFile.getAbsolutePath
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val b1 = Seq((1L, "a2", "U", 10L), (2L, "x", "D", 7L), (4L, "d", "I", 1L))
    val b2 = Seq((2L, "zombie", "U", 3L), (4L, "d2", "U", 2L))
    val ms = MemoryStream[(Long, String, String, Long)]
    def run(): Unit = EventStreams.tableLogChangelogSink(
      ms.toDF().toDF("k", "v", "op", "version"),
      s"$dir/t", s"$dir/ckpt", Seq("k"), appId = "cdcA")
    ms.addData(b1: _*); run()
    ms.addData(b2: _*); run()
    def applied(state: org.apache.spark.sql.DataFrame) =
      graft.sinks.DataSink.applyChangelog(snap, state, Seq("k"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = EventStreams.readChangelogAppliedLog(spark, snap, s"$dir/t", Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == Set((1L, "a2"), (3L, "c"), (4L, "d2")),
      s"k2 must stay deleted, k4 must carry the later update, got $streamed")
    // every micro-batch is a first-class version: the view AS OF batch 1
    // (before the out-of-order batch 2) is auditable forever
    assert(TableLog.currentVersion(spark, s"$dir/t") == 2L)
    assert(applied(TableLog.readAt(spark, s"$dir/t", 1L)) ==
      Set((1L, "a2"), (3L, "c"), (4L, "d")))
    assert(TableLog.history(spark, s"$dir/t").flatMap(_.txn) ==
      Seq(("cdcA", 0L), ("cdcA", 1L)))
    // crash-replay of batch 1 through the raw entry point: no new version
    assert(TableLog.mergeOnce(spark, s"$dir/t",
      b2.toDF("k", "v", "op", "version"), "cdcA", 1L) { (cur, b) =>
        graft.sinks.DataSink.compactChangelog(cur.fold(b)(_.unionByName(b)), Seq("k"))
      }.isEmpty)
    assert(TableLog.currentVersion(spark, s"$dir/t") == 2L)
    // an empty log passes the snapshot through
    val fresh = java.nio.file.Files.createTempDirectory("cdctl2").toFile.getAbsolutePath
    assert(EventStreams.readChangelogAppliedLog(spark, snap, fresh, Seq("k"))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("scd2Sink: in-order batches equal one batch scd2Merge") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd2s").toFile.getAbsolutePath
    val d = (s: String) => java.sql.Date.valueOf(s)
    // key 1 changes twice (second batch closes the first version), key 2
    // repeats its value (no-op suppressed ACROSS the batch boundary)
    val b1 = Seq((1L, "p1", d("2026-01-01")), (2L, "q1", d("2026-01-02")))
    val b2 = Seq((1L, "p2", d("2026-02-01")), (2L, "q1", d("2026-02-02")))
    val dimInit = Seq.empty[(Long, String, java.sql.Date)]
      .toDF("k", "attr", "effective_from")
      .withColumn("effective_to",
        org.apache.spark.sql.functions.lit(null).cast("date"))
    val ms = MemoryStream[(Long, String, java.sql.Date)]
    def run(): Unit = EventStreams.scd2Sink(
      ms.toDF().toDF("k", "attr", "effective_from"),
      dimInit, s"$dir/state", s"$dir/ckpt", Seq("k"))
    ms.addData(b1: _*); run()
    ms.addData(b2: _*); run()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString))).toSet
    val streamed = canon(EventStreams.readUpserted(spark, s"$dir/state").get
      .select("k", "attr", "effective_from", "effective_to"))
    val batch = canon(graft.sinks.DataSink.scd2Merge(
        dimInit, (b1 ++ b2).toDF("k", "attr", "effective_from"), Seq("k"))
      .select("k", "attr", "effective_from", "effective_to"))
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    assert(streamed == Set(
      (1L, "p1", "2026-01-01", Some("2026-02-01")),
      (1L, "p2", "2026-02-01", None),
      (2L, "q1", "2026-01-02", None)), s"got $streamed")
  }

  test("funnelStream agrees with batch funnel; progression survives batch splits") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the AnalyticsSpec funnel fixture: u1 completes all, u2 stops at
    // view (purchase precedes it), u3 same-instant chain, u4 no click
    val batch1 = Seq(
      EventStreams.Event(1, 1, "click", ts("2026-01-01 10:00:00"), 0),
      EventStreams.Event(2, 1, "view", ts("2026-01-01 10:05:00"), 0),
      EventStreams.Event(4, 2, "click", ts("2026-01-01 09:00:00"), 0),
      EventStreams.Event(5, 2, "purchase", ts("2026-01-01 09:10:00"), 0),
      EventStreams.Event(10, 4, "view", ts("2026-01-01 07:00:00"), 0),
      EventStreams.Event(11, 4, "purchase", ts("2026-01-01 07:30:00"), 0))
    val batch2 = Seq(
      EventStreams.Event(3, 1, "purchase", ts("2026-01-01 10:10:00"), 0),
      EventStreams.Event(6, 2, "view", ts("2026-01-01 09:20:00"), 0),
      EventStreams.Event(7, 3, "click", ts("2026-01-01 08:00:00"), 0),
      EventStreams.Event(8, 3, "view", ts("2026-01-01 08:00:00"), 0),
      EventStreams.Event(9, 3, "purchase", ts("2026-01-01 08:00:00"), 0))
    val stages = Seq("click", "view", "purchase")

    val batchCounts = graft.operators.Analytics.funnel(
        (batch1 ++ batch2).toDF(), "user_id", "event_type", "ts", stages)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

    val ms = MemoryStream[EventStreams.Event]
    val sq = EventStreams.funnelStream(ms.toDS(), stages)
      .writeStream.format("memory").queryName("equiv_funnel")
      .outputMode("append").start()
    try {
      ms.addData(batch1: _*); sq.processAllAvailable()
      ms.addData(batch2: _*); sq.processAllAvailable()
      val hits = spark.sql("SELECT user_id, stage, event_type FROM equiv_funnel")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      // exact completions: u1 all three (purchase arrived in batch 2),
      // u2 click+view only, u3 same-instant chain, u4 nothing
      assert(hits == Set(
        (1L, 1, "click"), (1L, 2, "view"), (1L, 3, "purchase"),
        (2L, 1, "click"), (2L, 2, "view"),
        (3L, 1, "click"), (3L, 2, "view"), (3L, 3, "purchase")))
      // per-stage user counts equal the batch operator's
      val streamCounts = hits.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
      assert(streamCounts == batchCounts, s"stream=$streamCounts batch=$batchCounts")
    } finally sq.stop()
    intercept[IllegalArgumentException] {
      EventStreams.funnelStream(ms.toDS(), Seq("click"))
    }
  }

  test("transitionsStream counts equal the batch transition matrix across batch splits") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val batch1 = Seq(
      EventStreams.Event(1, 1, "A", ts("2026-01-01 10:00:00"), 0),
      EventStreams.Event(2, 1, "B", ts("2026-01-01 10:01:00"), 0),
      EventStreams.Event(5, 2, "B", ts("2026-01-01 09:00:00"), 0))
    val batch2 = Seq(
      EventStreams.Event(3, 1, "A", ts("2026-01-01 10:02:00"), 0),
      EventStreams.Event(4, 1, "C", ts("2026-01-01 10:03:00"), 0),
      EventStreams.Event(6, 2, "A", ts("2026-01-01 09:30:00"), 0))
    val batchMatrix = graft.operators.Analytics.eventTransitions(
        (batch1 ++ batch2).toDF())
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val ms = MemoryStream[EventStreams.Event]
    val sq = EventStreams.transitionsStream(ms.toDS())
      .writeStream.format("memory").queryName("equiv_trans")
      .outputMode("append").start()
    try {
      ms.addData(batch1: _*); sq.processAllAvailable()
      ms.addData(batch2: _*); sq.processAllAvailable()
      val stream = spark.sql(
        "SELECT from_type, to_type, count(*) c FROM equiv_trans GROUP BY 1, 2")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // cross-batch adjacency: user 1's B (batch 1) pairs with A (batch 2)
      assert(stream == batchMatrix, s"stream=$stream batch=$batchMatrix")
      assert(stream(("B", "A")) == 2L)
    } finally sq.stop()
  }

  test("intervalJoinStream agrees with batch attributeWithin; closed bounds both ends") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // clicks/purchases per user; boundary cases: purchase AT click_ts
    // (lag 0) and AT click_ts + exactly 30 min are both inside (closed)
    val clicks = Seq(
      (10L, 1L, ts("2026-01-01 10:00:00")),
      (10L, 2L, ts("2026-01-01 10:20:00")),
      (11L, 3L, ts("2026-01-01 09:00:00")))
    val purchases = Seq(
      (10L, 101L, ts("2026-01-01 10:15:00")), // ← click 1 only (before click 2)
      (10L, 102L, ts("2026-01-01 10:45:00")), // ← click 2 only (45m after click 1)
      (10L, 103L, ts("2026-01-01 10:20:00")), // ← clicks 1 and 2 (lag 20m and 0)
      (10L, 104L, ts("2026-01-01 10:30:00")), // ← clicks 1 (exactly 30m) and 2
      (11L, 105L, ts("2026-01-01 09:45:00")), // ← nothing (45m after click 3)
      (12L, 106L, ts("2026-01-01 10:15:00"))) // ← nothing (no user-12 click)
    val expectPairs = Set((1L, 101L), (2L, 102L), (1L, 103L), (2L, 103L),
      (1L, 104L), (2L, 104L))

    val batch = graft.operators.Temporal.attributeWithin(
        clicks.toDF("user_id", "click_id", "click_ts"),
        purchases.toDF("user_id", "purchase_id", "purchase_ts")
          .withColumnRenamed("user_id", "p_user"),
        Seq("user_id"), Seq("p_user"), "click_ts", "purchase_ts", 1800L)
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == expectPairs, s"batch=$batch")

    val mc = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val mp = MemoryStream[(Long, Long, java.sql.Timestamp)]
    mc.addData(clicks: _*)
    mp.addData(purchases: _*)
    val joined = EventStreams.intervalJoinStream(
      mc.toDF().toDF("user_id", "click_id", "click_ts"),
      mp.toDF().toDF("user_id", "purchase_id", "purchase_ts"),
      "user_id", "click_ts", "purchase_ts", maxLagSec = 1800L)
    val sq = joined.select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("equiv_ij").outputMode("append").start()
    try {
      sq.processAllAvailable()
      val stream = spark.sql("SELECT click_id, purchase_id FROM equiv_ij")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stream == batch, s"stream=$stream\nbatch=$batch")
    } finally sq.stop()
  }

  test("intervalJoinStream leftOuter: unmatched clicks emit with nulls once the watermark closes them") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val clicks = Seq(
      (10L, 1L, ts("2026-01-01 10:00:00")),  // converts (purchase 101)
      (10L, 2L, ts("2026-01-01 11:00:00")),  // never converts
      (13L, 4L, ts("2026-01-01 10:00:00"))) // no purchases for this user
    val purchases = Seq(
      (10L, 101L, ts("2026-01-01 10:15:00")))
    val mc = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val mp = MemoryStream[(Long, Long, java.sql.Timestamp)]
    mc.addData(clicks: _*)
    mp.addData(purchases: _*)
    val joined = EventStreams.intervalJoinStream(
      mc.toDF().toDF("user_id", "click_id", "click_ts"),
      mp.toDF().toDF("user_id", "purchase_id", "purchase_ts"),
      "user_id", "click_ts", "purchase_ts", maxLagSec = 1800L,
      watermark = "0 seconds", joinType = "leftOuter")
    val sq = joined.select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("oij").outputMode("append").start()
    try {
      sq.processAllAvailable()
      // push BOTH watermarks past every click's window so unmatched
      // clicks are provably final and must emit with nulls
      mc.addData((99L, 999L, ts("2026-01-02 00:00:00")))
      mp.addData((99L, 998L, ts("2026-01-02 00:00:00")))
      sq.processAllAvailable()
      mc.addData((99L, 997L, ts("2026-01-03 00:00:00")))
      mp.addData((99L, 996L, ts("2026-01-03 00:00:00")))
      sq.processAllAvailable()
      val got = spark.sql("SELECT click_id, purchase_id FROM oij WHERE click_id < 900")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(got == Set((1L, Some(101L)), (2L, None), (4L, None)), s"got $got")
      // batch twin agrees
      val batch = graft.operators.Temporal.attributeWithinOuter(
          clicks.toDF("user_id", "click_id", "click_ts"),
          purchases.toDF("user_id", "purchase_id", "purchase_ts")
            .withColumnRenamed("user_id", "p_user"),
          Seq("user_id"), Seq("p_user"), "click_ts", "purchase_ts", 1800L,
          leftIdCols = Seq("click_id"))
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(got == batch, s"stream=$got batch=$batch")
    } finally sq.stop()
    intercept[IllegalArgumentException] {
      EventStreams.intervalJoinStream(
        mc.toDF().toDF("user_id", "click_id", "click_ts"),
        mp.toDF().toDF("user_id", "purchase_id", "purchase_ts"),
        "user_id", "click_ts", "purchase_ts", 1800L, joinType = "full")
    }
  }

  test("intervalJoinStream rejects colliding non-key columns and bad lag") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val df = ms.toDF().toDF("user_id", "id", "t")
    intercept[IllegalArgumentException] {
      EventStreams.intervalJoinStream(df, df, "user_id", "t", "t", 60L)
    }
    intercept[IllegalArgumentException] {
      EventStreams.intervalJoinStream(
        df, ms.toDF().toDF("user_id", "id2", "t2"), "user_id", "t", "t2", 0L)
    }
  }

  test("trendingWindowed: MG summary per window matches batch; heavy item guaranteed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, lit, window}
    // hour 10: "hot" dominates; hour 11: "warm" does — plus singleton noise
    val events = (0 until 40).map { i =>
      val hour = if (i < 20) 10 else 11
      val item = if (i < 20) { if (i % 4 != 3) "hot" else s"noise$i" }
                 else { if (i % 4 != 3) "warm" else s"noise$i" }
      EventStreams.Event(i.toLong, (i % 5).toLong, item,
        ts(f"2026-01-01 $hour%02d:${(i * 2) % 60}%02d:00"), i.toDouble)
    }
    // budget big enough that the per-window summary is EXACT (no
    // evictions) — streamed output must then equal the batch aggregate
    val batch = events.toDF()
      .groupBy(window(col("ts"), "1 hour"))
      .agg(call_function("heavy_hitters",
        col("event_type").cast("string"), lit(64)).as("top_items"))
      .select(col("window.start").cast("string"), col("top_items"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e =>
          (e.getString(0), e.getLong(1)))).toMap
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(events.take(25): _*)
    val sq = EventStreams.trendingWindowed(ms.toDF(), "event_type", budget = 64)
      .writeStream.format("memory").queryName("equiv_trend")
      .outputMode("append").start()
    try {
      sq.processAllAvailable()
      ms.addData(events.drop(25): _*)
      sq.processAllAvailable()
      ms.addData(EventStreams.Event(99, 0, "x", ts("2026-01-02 00:00:00"), 0.0))
      sq.processAllAvailable() // flush watermark
      val stream = spark.sql("SELECT * FROM equiv_trend")
        .select(col("window_start").cast("string"), col("top_items"))
        .collect().map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(e =>
            (e.getString(0), e.getLong(1)))).toMap
      val closed = stream.view.filterKeys(_.startsWith("2026-01-01")).toMap
      assert(closed == batch.view.filterKeys(closed.keySet).toMap,
        s"stream=$closed\nbatch=$batch")
      // the hour-10 summary leads with the guaranteed heavy hitter
      val h10 = closed.find(_._1.contains("10:00")).get._2
      assert(h10.head._1 == "hot" && h10.head._2 == 15L, s"got $h10")
    } finally sq.stop()
  }

  test("enrich joins a stream against a static dimension without shuffling the stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dim = Seq((10L, "gold"), (12L, "silver")).toDF("user_id", "tier")
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0),
      EventStreams.Event(2, 11, "view", ts("2026-01-01 10:01:00"), 2.0))
    val sq = EventStreams.enrich(ms.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enr_spec").outputMode("append").start()
    try {
      sq.processAllAvailable()
      val out = spark.sql("SELECT user_id, tier FROM enr_spec ORDER BY user_id")
        .collect().map(r => (r.getLong(0), Option(r.getString(1))))
      assert(out.toSeq == Seq((10L, Some("gold")), (11L, None)))
    } finally sq.stop()
  }

  test("upsertSink merges micro-batches last-wins into the parquet target") {
    import java.nio.file.Files
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("upsert_sink").toFile.getAbsolutePath
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0),
      EventStreams.Event(2, 10, "view", ts("2026-01-01 10:01:00"), 2.0))
    EventStreams.upsertSink(ms.toDF(), s"$base/t", s"$base/ckpt",
      keys = Seq("user_id", "event_type"), versionCol = "event_id")
    ms.addData( // same key, higher version: must replace
      EventStreams.Event(7, 10, "click", ts("2026-01-01 11:00:00"), 9.0))
    EventStreams.upsertSink(ms.toDF(), s"$base/t", s"$base/ckpt",
      keys = Seq("user_id", "event_type"), versionCol = "event_id")
    val out = EventStreams.readUpserted(spark, s"$base/t").get
      .select("user_id", "event_type", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set((10L, "click", 7L, 9.0), (10L, "view", 2L, 2.0)))
    // snapshot-pointer protocol: _LATEST names a complete snapshot dir and
    // at most the current + previous snapshots are retained
    val files = new java.io.File(s"$base/t").list().toSeq
    assert(files.contains("_LATEST"))
    val snaps = files.filter(_.startsWith("v_"))
    assert(snaps.nonEmpty && snaps.size <= 2, s"snapshot GC: $snaps")
    assert(snaps.contains(EventStreams.currentSnapshotName(spark, s"$base/t").get))
  }

  test("aggViewMaintainStream: the view follows the table's commits, exactly-once") {
    import java.nio.file.Files
    import graft.sinks.{AggView, TableLog}
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("aggv_stream").toFile.getAbsolutePath
    val (t, v) = (s"$base/t", s"$base/v")
    def drain(): Unit = {
      val q = EventStreams.aggViewMaintainStream(spark, t, v, s"$base/ckpt",
        Seq("g"), Seq(AggView.Measure("x", "sum"), AggView.Measure("x", "max")))
      assert(q.awaitTermination(120000), "AvailableNow must self-stop")
    }
    TableLog.append(spark, t,
      Seq((1L, "a", 1.5), (2L, "a", 2.5), (3L, "b", 10.0)).toDF("id", "g", "x"),
      statsCols = Seq("id"))
    drain()
    def viewMap(): Map[String, (Double, Double, Long)] =
      AggView.read(spark, v).collect().map(r =>
        r.getString(0) -> (r.getDecimal(1).doubleValue(),
          r.getDouble(2), r.getLong(3))).toMap
    assert(viewMap() == Map("a" -> (4.0, 2.5, 2L), "b" -> (10.0, 10.0, 1L)))
    // two more table commits: an append and a max-retiring delete
    TableLog.append(spark, t, Seq((4L, "b", 3.0)).toDF("id", "g", "x"))
    TableLog.deleteWhere(spark, t, col("x") === 10.0)
    drain()
    assert(viewMap() == Map("a" -> (4.0, 2.5, 2L), "b" -> (3.0, 3.0, 1L)),
      "the retired max must recompute, the append must fold")
    // replay with the same checkpoint and no new commits: the view's
    // version must not move (refreshMulti's marker short-circuits)
    val vv = TableLog.currentVersion(spark, v)
    drain()
    assert(TableLog.currentVersion(spark, v) == vv)
    // equal to a from-scratch view of the same table state
    val v2 = s"$base/v2"
    AggView.refreshMulti(spark, v2, t, Seq("g"),
      Seq(AggView.Measure("x", "sum"), AggView.Measure("x", "max")))
    val m2 = AggView.read(spark, v2).collect().map(r =>
      r.getString(0) -> (r.getDecimal(1).doubleValue(),
        r.getDouble(2), r.getLong(3))).toMap
    assert(viewMap() == m2)
  }

  test("tableLogUpsertSink: one TableLog commit per micro-batch, replay skips, history time-travels") {
    import java.nio.file.Files
    import graft.sinks.TableLog
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("tlog_sink").toFile.getAbsolutePath
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0),
      EventStreams.Event(2, 10, "view", ts("2026-01-01 10:01:00"), 2.0))
    def run(): Unit = EventStreams.tableLogUpsertSink(ms.toDF(), s"$base/t", s"$base/ckpt",
      keys = Seq("user_id", "event_type"), versionCol = "event_id", appId = "sinkA")
    run()
    ms.addData( // same key, higher version: must replace
      EventStreams.Event(7, 10, "click", ts("2026-01-01 11:00:00"), 9.0))
    run()
    def live = TableLog.readAt(spark, s"$base/t")
      .select("user_id", "event_type", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(live == Set((10L, "click", 7L, 9.0), (10L, "view", 2L, 2.0)))
    // one commit per micro-batch, each stamped with its txn marker
    assert(TableLog.currentVersion(spark, s"$base/t") == 2L)
    assert(TableLog.history(spark, s"$base/t").flatMap(_.txn) ==
      Seq(("sinkA", 0L), ("sinkA", 1L)))
    // the table's history IS the batch history: v1 = before batch 1
    assert(TableLog.readAt(spark, s"$base/t", 1L)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // a crash-replay of batch 1 (same data, same batchId) must not
    // double-commit: replay through the raw idempotent entry point
    val b1 = Seq((7L, 10L, "click", ts("2026-01-01 11:00:00"), 9.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    assert(TableLog.upsertIntoOnce(spark, s"$base/t", b1,
      Seq("user_id", "event_type"), "event_id", "sinkA", 1L).isEmpty)
    assert(TableLog.currentVersion(spark, s"$base/t") == 2L)
    assert(live == Set((10L, "click", 7L, 9.0), (10L, "view", 2L, 2.0)))
  }

  test("tableLogMergeSink: CoW merge per micro-batch — exactly-once, merge commits, dup keys loud") {
    import java.nio.file.Files
    import graft.sinks.TableLog
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("tlog_merge_sink").toFile.getAbsolutePath
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0),
      EventStreams.Event(2, 10, "view", ts("2026-01-01 10:01:00"), 2.0))
    def run(): Unit = EventStreams.tableLogMergeSink(ms.toDF(), s"$base/t", s"$base/ckpt",
      keys = Seq("user_id", "event_type"), appId = "mergeA")
    run()
    ms.addData( // same key: the merge replaces the row
      EventStreams.Event(7, 10, "click", ts("2026-01-01 11:00:00"), 9.0))
    run()
    def live = TableLog.readAt(spark, s"$base/t")
      .select("user_id", "event_type", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(live == Set((10L, "click", 7L, 9.0), (10L, "view", 2L, 2.0)))
    // batch 1 bootstraps as append; batch 2 lands as a CoW merge commit
    assert(TableLog.history(spark, s"$base/t").map(c => (c.op, c.txn)) ==
      Seq(("append", Some(("mergeA", 0L))), ("merge", Some(("mergeA", 1L)))))
    // crash-replay of batch 1 skips on the marker
    val b1 = Seq((7L, 10L, "click", ts("2026-01-01 11:00:00"), 9.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    assert(TableLog.mergeIntoOnce(spark, s"$base/t", b1,
      Seq("user_id", "event_type"), "mergeA", 1L).isEmpty)
    assert(TableLog.currentVersion(spark, s"$base/t") == 2L)
    // duplicate keys within one batch are an ambiguous merge — loud
    val dup = Seq(
      (8L, 10L, "click", ts("2026-01-01 12:00:00"), 1.0),
      (9L, 10L, "click", ts("2026-01-01 12:01:00"), 2.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val e = intercept[IllegalArgumentException] {
      TableLog.mergeIntoOnce(spark, s"$base/t", dup,
        Seq("user_id", "event_type"), "mergeA", 2L)
    }
    assert(e.getMessage.contains("unique"))
    // and the time-travel audit still works batch-by-batch
    assert(TableLog.readAt(spark, s"$base/t", 1L)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("applyUpsertBatch replay of a committed batch is a no-op (at-least-once safety)") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("upsert_replay").toFile.getAbsolutePath
    val b0 = Seq((1L, 10L, "click", ts("2026-01-01 10:00:00"), 1.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    EventStreams.applyUpsertBatch(spark, b0, 0L, s"$base/t",
      keys = Seq("user_id", "event_type"), versionCol = "event_id")
    val afterFirst = EventStreams.readUpserted(spark, s"$base/t").get.collect().toSeq
    // crash between pointer swap and checkpoint commit → foreachBatch
    // replays batchId 0: must not merge v_0 into itself (self-read
    // overwrite) nor change the snapshot
    EventStreams.applyUpsertBatch(spark, b0, 0L, s"$base/t",
      keys = Seq("user_id", "event_type"), versionCol = "event_id")
    assert(EventStreams.currentSnapshotName(spark, s"$base/t").get.endsWith("0"))
    assert(EventStreams.readUpserted(spark, s"$base/t").get.collect().toSeq == afterFirst)
    // and a NEW batch still merges on top, three rounds deep (non-prefix
    // keys: the column-order fix in DataSink.upsert)
    val b1 = Seq((7L, 10L, "click", ts("2026-01-01 11:00:00"), 9.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    EventStreams.applyUpsertBatch(spark, b1, 1L, s"$base/t", Seq("user_id", "event_type"), "event_id")
    val b2 = Seq((9L, 11L, "view", ts("2026-01-01 12:00:00"), 4.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    EventStreams.applyUpsertBatch(spark, b2, 2L, s"$base/t", Seq("user_id", "event_type"), "event_id")
    val out = EventStreams.readUpserted(spark, s"$base/t").get
      .select("user_id", "event_type", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((10L, "click", 7L), (11L, "view", 9L)))
  }

  test("applyUpsertBatch re-runs batch 0 over a partial crash-orphan snapshot") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("upsert_orphan").toFile.getAbsolutePath
    // crash mid-write of the very first batch: v_0 exists but is partial
    // (no _SUCCESS) and _LATEST was never created — the replay guard must
    // NOT bless it as committed, or batch 0's rows are lost forever
    val orphan = new java.io.File(s"$base/t/v_0000000000000000000")
    assert(orphan.mkdirs())
    Files.write(orphan.toPath.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    val b0 = Seq((1L, 10L, "click", ts("2026-01-01 10:00:00"), 1.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    EventStreams.applyUpsertBatch(spark, b0, 0L, s"$base/t",
      keys = Seq("user_id"), versionCol = "event_id")
    assert(new java.io.File(s"$base/t/_LATEST").exists())
    val out = EventStreams.readUpserted(spark, s"$base/t").get.collect()
    assert(out.length == 1 && out.head.getAs[Long]("event_id") == 1L)
    // and a partial dir alone (no pointer) is never surfaced to readers
    assert(new java.io.File(s"$base/t/_LATEST").delete())
    val orphan2 = new java.io.File(s"$base/t/v_0000000000000000009")
    assert(orphan2.mkdirs()) // sorts above v_0, but has no _SUCCESS
    assert(EventStreams.currentSnapshotName(spark, s"$base/t")
      .contains("v_0000000000000000000"))
  }

  test("sessionize widens session_start for a cross-batch late event") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventStreams.Event]
    val sq = EventStreams.sessionize(ms.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_late").outputMode("append").start()
    try {
      ms.addData(EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0))
      sq.processAllAvailable()
      // late but within watermark (10:00 − 30 min = 09:30): merges into
      // the open session and must LOWER its start, as the batch twin does
      ms.addData(EventStreams.Event(2, 10, "click", ts("2026-01-01 09:50:00"), 2.0))
      sq.processAllAvailable()
      ms.addData(EventStreams.Event(3, 10, "click", ts("2026-01-01 15:00:00"), 4.0))
      sq.processAllAvailable()
      val out = spark.sql(
        "SELECT session_start, session_end, event_count FROM sess_late WHERE event_count = 2")
        .collect()
      assert(out.length == 1)
      assert(out.head.getTimestamp(0) == ts("2026-01-01 09:50:00"))
      assert(out.head.getTimestamp(1) == ts("2026-01-01 10:00:00"))
    } finally sq.stop()
  }

  test("readUpserted falls back to the newest snapshot when the pointer is lost") {
    import java.nio.file.Files
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("upsert_crash").toFile.getAbsolutePath
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0))
    EventStreams.upsertSink(ms.toDF(), s"$base/t", s"$base/ckpt",
      keys = Seq("user_id"), versionCol = "event_id")
    assert(new java.io.File(s"$base/t/_LATEST").delete()) // simulate crash window
    val recovered = EventStreams.readUpserted(spark, s"$base/t").get
    assert(recovered.count() == 1)
  }

  test("changeFeedStream: manifests are the stream — per-version slices, exactly-once across restarts, continuous AggView") {
    import java.nio.file.Files
    import graft.sinks.{AggView, TableLog}
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("cfs").toFile.getAbsolutePath
    val t = s"$base/t"; val ckpt = s"$base/ckpt"; val view = s"$base/view"
    // a real mixed history: append, merge-on-read delete, CoW update
    TableLog.append(spark, t,
      (1L to 100L).map(k => (k, s"g${k % 3}", k * 1.0)).toDF("k", "g", "x")
        .repartitionByRange(2, col("k")), statsCols = Seq("k"))
    TableLog.deleteWhere(spark, t, col("k") === 42L, mode = "dv")
    TableLog.updateWhere(spark, t, col("k") === 7L,
      set = Map("x" -> org.apache.spark.sql.functions.lit(999.0)))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[(Long, Double, String)])]
    def consume(changes: org.apache.spark.sql.DataFrame, v: Long): Unit = {
      seen += v -> changes.collect().map(r => (r.getLong(0), r.getDouble(2),
        r.getString(r.fieldIndex("_change_type")))).toSet
      AggView.refresh(spark, view, t, Seq("g"), "x") // idempotent via txn markers
      ()
    }
    EventStreams.changeFeedStream(spark, t, ckpt, consume)
    assert(seen.map(_._1).toSeq == Seq(1L, 2L, 3L),
      s"every commit must arrive once, in order: ${seen.map(_._1)}")
    // each streamed slice equals the one-shot readChanges of that version
    (1L to 3L).foreach { v =>
      val oneShot = TableLog.readChanges(spark, t, v - 1, v).collect()
        .map(r => (r.getLong(0), r.getDouble(2),
          r.getString(r.fieldIndex("_change_type")))).toSet
      assert(seen.find(_._1 == v).get._2 == oneShot, s"version $v slice diverged")
    }
    // restart with the SAME checkpoint after new commits: only the new
    // versions are delivered (the file source's tracking, not ours)
    TableLog.append(spark, t, Seq((200L, "g0", 5.0)).toDF("k", "g", "x"),
      statsCols = Seq("k"))
    TableLog.deleteWhere(spark, t, col("k") === 200L, mode = "dv")
    EventStreams.changeFeedStream(spark, t, ckpt, consume)
    assert(seen.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      s"restart must deliver only the new commits: ${seen.map(_._1)}")
    // the continuously-maintained view == a one-shot refresh over the
    // same commit range (exact decimal equality)
    val viewOnce = s"$base/view_once"
    AggView.refresh(spark, viewOnce, t, Seq("g"), "x")
    def m(dir: String) = AggView.read(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    assert(m(view) == m(viewOnce),
      "streamed per-version refreshes must equal the one-shot refresh")
  }

  test("changeFeedStream backpressure: maxFilesPerTrigger bounds batches, startingVersion skips history") {
    import java.nio.file.Files
    import graft.sinks.TableLog
    val base = Files.createTempDirectory("cfs_bp").toFile.getAbsolutePath
    val t = s"$base/t"
    (1 to 5).foreach { i =>
      TableLog.append(spark, t, Seq((i.toLong, s"v$i")).toDF("k", "s"))
    }
    // maxFilesPerTrigger=1: five commits arrive as five bounded
    // micro-batches (one manifest each), not one giant history replay
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = EventStreams.changeFeedStream(spark, t, s"$base/ckpt1",
      (_, v) => { seen += v; () }, maxFilesPerTrigger = Some(1))
    assert(seen.toSeq == Seq(1L, 2L, 3L, 4L, 5L), s"got $seen")
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0L)
    assert(batches.length == 5 && batches.forall(_ == 1L),
      s"each micro-batch must admit at most one manifest: ${batches.toSeq}")
    // a NEW consumer with startingVersion skips everything below it
    val seen2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    EventStreams.changeFeedStream(spark, t, s"$base/ckpt2",
      (_, v) => { seen2 += v; () }, startingVersion = 4L)
    assert(seen2.toSeq == Seq(4L, 5L), s"got $seen2")
    // restart with the same checkpoint resumes past the skipped history
    TableLog.append(spark, t, Seq((6L, "v6")).toDF("k", "s"))
    EventStreams.changeFeedStream(spark, t, s"$base/ckpt2",
      (_, v) => { seen2 += v; () }, startingVersion = 4L)
    assert(seen2.toSeq == Seq(4L, 5L, 6L), s"got $seen2")
  }

  test("erasureSink: streamed delete requests land as exactly-once dv commits, zero data rewritten") {
    import java.nio.file.Files
    import graft.sinks.TableLog
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("erasure").toFile.getAbsolutePath
    val t = s"$base/t"
    TableLog.append(spark, t,
      (1L to 500L).map(k => (k, s"user$k")).toDF("user_id", "payload")
        .repartition(4, col("user_id")), statsCols = Seq("user_id"))
    def dataFiles: Int = {
      val fs = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(t, "data"), true)
      var n = 0; while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }; n
    }
    val before = dataFiles
    val ms = MemoryStream[Long]
    ms.addData(7L, 99L, 7L) // duplicate requests collapse
    def run(): Unit = EventStreams.erasureSink(ms.toDF().toDF("user_id"),
      t, s"$base/ckpt", "user_id", appId = "gdpr")
    run()
    ms.addData(250L, 9999L) // 9999 matches nothing — still marker-committed
    run()
    assert(dataFiles == before, "erasure must write no data files")
    val live = TableLog.readAt(spark, t).select("user_id")
      .collect().map(_.getLong(0)).toSet
    assert(live == (1L to 500L).toSet -- Set(7L, 99L, 250L))
    // one txn-stamped commit per batch; replaying a batch is a no-op
    assert(TableLog.history(spark, t).flatMap(_.txn) ==
      Seq(("gdpr", 0L), ("gdpr", 1L)))
    val vBefore = TableLog.currentVersion(spark, t)
    TableLog.deleteWhere(spark, t, col("user_id").isin(7L, 99L), mode = "dv",
      txn = Some("gdpr" -> 1L)) // direct replay through the same marker path…
    assert(TableLog.currentVersion(spark, t) == vBefore + 1,
      "a raw deleteWhere has no marker check — the sink's guard is the gate")
    // …but the SINK's guard skips it: re-running the stream with a fresh
    // checkpoint over the same data must not add commits for batch ≤ 1
    val ms2 = MemoryStream[Long]
    ms2.addData(7L)
    EventStreams.erasureSink(ms2.toDF().toDF("user_id"), t, s"$base/ckpt2",
      "user_id", appId = "gdpr") // batchId 0 ≤ committed 1 → skipped
    assert(TableLog.currentVersion(spark, t) == vBefore + 1)
    // compaction later materializes the vectors away
    assert(TableLog.compactSmallFiles(spark, t, minFileMB = 1024,
      targetFileMB = 1024).nonEmpty)
    assert(TableLog.readAt(spark, t).count() == 497L)
    // the key cap is loud
    val ms3 = MemoryStream[Long]
    ms3.addData((1L to 20L): _*)
    val e = intercept[Exception] {
      EventStreams.erasureSink(ms3.toDF().toDF("user_id"), t, s"$base/ckpt3",
        "user_id", appId = "gdpr2", maxKeysPerBatch = 10)
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ msgs(y.getCause))
    assert(msgs(e).exists(_.contains("maxKeysPerBatch")) ||
      msgs(e).exists(_.contains("distinct keys")), s"got $e")
  }

  test("erasureSink: a batch whose keys collapse to empty still commits its marker") {
    import java.nio.file.Files
    import graft.sinks.TableLog
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("erasure_empty").toFile.getAbsolutePath
    val t = s"$base/t"
    TableLog.append(spark, t,
      (1L to 10L).map(k => (k, s"u$k")).toDF("user_id", "payload"))
    val ms = MemoryStream[Long]
    ms.addData(1L, 2L, 3L)
    EventStreams.erasureSink(
      ms.toDF().selectExpr("CAST(NULL AS BIGINT) AS user_id"),
      t, s"$base/ckpt", "user_id", appId = "gdpr")
    assert(TableLog.lastCommittedBatch(spark, t, "gdpr") == Some(0L),
      "an all-null batch must record its marker so a replay skips")
    assert(TableLog.readAt(spark, t).count() == 10L, "a marker changes no rows")
    assert(TableLog.history(spark, t).last.op == "txn")
  }

  test("windowedCounts aggregates into hourly tumbling windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:05:00"), 1.0),
      EventStreams.Event(2, 11, "click", ts("2026-01-01 10:55:00"), 2.0),
      EventStreams.Event(3, 10, "view", ts("2026-01-01 11:05:00"), 4.0))
    val sq = EventStreams.windowedCounts(ms.toDF())
      .writeStream.format("memory").queryName("wc_spec").outputMode("append").start()
    try {
      sq.processAllAvailable()
      ms.addData(EventStreams.Event(9, 10, "click", ts("2026-01-01 14:00:00"), 0.0))
      sq.processAllAvailable()
      val out = spark.sql(
        "SELECT window_start, event_type, event_count, total_value FROM wc_spec ORDER BY window_start")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(out.contains((ts("2026-01-01 10:00:00"), "click", 2L, 3.0)))
      assert(out.contains((ts("2026-01-01 11:00:00"), "view", 1L, 4.0)))
    } finally sq.stop()
  }
}
