package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sinks.TableLog

/** `spark.readStream.format("graft")` — commit versions as offsets:
  * bounded micro-batches, exactly-once across restarts via the
  * checkpointed offset, loud refusal of row-changing commits in
  * append-only mode, full CDC via readChangeFeed, startingVersion
  * bootstrap.
  */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("streaming source: appends arrive as per-version micro-batches, restart resumes exactly-once") {
    val base = tmpDir("gss")
    val dir = s"$base/t"
    (1 to 3).foreach { i =>
      TableLog.append(spark, dir,
        ((i * 10L) until (i * 10L + 10L)).map(k => (k, s"b$i")).toDF("k", "tag"))
    }
    val seen = scala.collection.mutable.LinkedHashMap.empty[Long, Seq[Long]]
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(dir)
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (b: DataFrame, id: Long) =>
          seen(id) = b.collect().map(_.getLong(0)).toSeq.sorted
          ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(seen.size == 3, s"one version per micro-batch (rate limit): ${seen.keys}")
    assert(seen.values.flatten.toSeq.sorted == (10L until 40L),
      "every appended row exactly once")
    // restart with the same checkpoint: only the new commit arrives
    TableLog.append(spark, dir, Seq((99L, "late")).toDF("k", "tag"))
    val before = seen.values.flatten.size
    run()
    assert(seen.values.flatten.toSeq.sorted == ((10L until 40L) :+ 99L).sorted,
      "restart must deliver only the new commit")
    assert(seen.values.flatten.size == before + 1)
  }

  test("streaming source startingTimestamp: subscribe from an instant, future instants wait") {
    val base = tmpDir("gss_ts")
    val dir = s"$base/t"
    (1 to 3).foreach { i =>
      TableLog.append(spark, dir,
        ((i * 10L) until (i * 10L + 10L)).map(k => (k, s"b$i")).toDF("k", "tag"))
    }
    val hist = TableLog.history(spark, dir)
    val ts2 = hist.find(_.version == 2L).get.ts
    def drain(ts: Long, ckpt: String): Seq[Long] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("graft")
        .option("startingTimestamp", ts.toString).load(dir)
        .writeStream.option("checkpointLocation", s"$base/$ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          seen ++= b.collect().map(_.getLong(0)); ()
        }
        .start()
      assert(q.awaitTermination(120000))
      seen.toSeq.sorted
    }
    // from v2's instant → v2 and v3 rows only
    assert(drain(ts2, "c1") == (20L until 40L))
    // an instant past the head: the stream WAITS (delivers nothing now,
    // picks up the next commit) — tailing a quiet table is legitimate
    val futureTs = hist.map(_.ts).max + 1L
    assert(drain(futureTs, "c2").isEmpty)
    TableLog.append(spark, dir, Seq((99L, "late")).toDF("k", "tag"))
    assert(drain(futureTs, "c2") == Seq(99L),
      "the same checkpoint resumes and sees only the new commit")
    // mutually exclusive with startingVersion
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft").option("startingVersion", "2")
        .option("startingTimestamp", ts2.toString).load(dir)
    }
  }

  test("streaming source: Trigger.AvailableNow drains the backlog, stops, resumes later") {
    val base = tmpDir("gss_an")
    val dir = s"$base/t"
    (1 to 3).foreach { i =>
      TableLog.append(spark, dir,
        ((i * 10L) until (i * 10L + 10L)).map(k => (k, s"b$i")).toDF("k", "tag"))
    }
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(dir)
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          seen ++= b.collect().map(_.getLong(0)); ()
        }
        .start()
      // AvailableNow must TERMINATE by itself once the backlog drains —
      // the batch-job-on-a-stream contract (a cron catch-up consumer)
      assert(q.awaitTermination(120000), "AvailableNow query must self-stop")
    }
    drain()
    assert(seen.sorted.toSeq == (10L until 40L),
      s"the whole backlog drains in one run: ${seen.size} rows")
    // nothing new → an immediate re-run sees zero rows and still stops
    val before = seen.size
    drain()
    assert(seen.size == before, "an up-to-date AvailableNow run delivers nothing")
    // later commits arrive on the NEXT scheduled run, exactly once
    TableLog.append(spark, dir, Seq((99L, "late")).toDF("k", "tag"))
    drain()
    assert(seen.sorted.toSeq == ((10L until 40L) :+ 99L).sorted)
  }

  test("streaming source: append-only mode refuses row-changing commits; CDF mode streams them") {
    val base = tmpDir("gss_cdf")
    val dir = s"$base/t"
    TableLog.append(spark, dir, (1L to 20L).map(k => (k, k * 1.0)).toDF("k", "v"))
    TableLog.deleteWhere(spark, dir, col("k") === 5L, mode = "dv")   // v2: row-changing
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft").load(dir)
        .writeStream.option("checkpointLocation", s"$base/ckpt_ap")
        .foreachBatch { (_: DataFrame, _: Long) => () }
        .start()
      q.processAllAvailable(); q.stop()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ msgs(y.getCause))
    assert(msgs(e).exists(_.contains("append-only")), s"got $e")
    // CDF mode represents the delete honestly
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q2 = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.option("checkpointLocation", s"$base/ckpt_cdf")
      .foreachBatch { (b: DataFrame, _: Long) =>
        rows ++= b.collect().map(r => (r.getLong(0),
          r.getString(r.fieldIndex("_change_type")),
          r.getLong(r.fieldIndex("_commit_version"))))
        ()
      }
      .start()
    q2.processAllAvailable(); q2.stop()
    assert(rows.count(_._2 == "insert") == 20 && rows.toSeq.contains((5L, "delete", 2L)),
      s"CDF must carry the delete: $rows")
    // ignoreChanges: the caller accepts insert-arm-only semantics
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q3 = spark.readStream.format("graft")
      .option("ignoreChanges", "true").load(dir)
      .writeStream.option("checkpointLocation", s"$base/ckpt_ic")
      .foreachBatch { (b: DataFrame, _: Long) =>
        kept ++= b.collect().map(_.getLong(0)); ()
      }
      .start()
    q3.processAllAvailable(); q3.stop()
    assert(kept.sorted == (1L to 20L), s"ignoreChanges keeps the insert arms: $kept")
  }

  test("streaming source: keyed CDF pairs updates into pre/post images per micro-batch") {
    val base = tmpDir("gss_keys")
    val dir = s"$base/t"
    TableLog.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "s")) // v1
    TableLog.mergeInto(spark, dir, Seq((2L, "B"), (3L, "c")).toDF("k", "s"),
      Seq("k"))                                                            // v2
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("keys", "k").load(dir)
      .writeStream.option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        rows ++= b.collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2), r.getLong(3)))
        ()
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(rows.filter(_._4 == 2L).toSet == Set(
      (2L, "b", "update_preimage", 2L), (2L, "B", "update_postimage", 2L),
      (3L, "c", "insert", 2L)),
      s"the streaming keyed feed must pair like the batch one: $rows")
    // keys without readChangeFeed is a loud contract error
    val e = intercept[Exception] {
      spark.readStream.format("graft").option("keys", "k").load(dir)
        .writeStream.option("checkpointLocation", s"$base/ckpt2")
        .foreachBatch { (_: DataFrame, _: Long) => () }.start()
        .processAllAvailable()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ msgs(y.getCause))
    assert(msgs(e).exists(_.contains("readChangeFeed")), s"got $e")
  }

  test("streaming source: startingVersion bootstrap; compaction passes the append-only check") {
    val base = tmpDir("gss_sv")
    val dir = s"$base/t"
    TableLog.append(spark, dir, (1L to 50L).map(k => (k, s"p$k")).toDF("k", "s")) // v1
    TableLog.append(spark, dir, Seq((100L, "x")).toDF("k", "s"))                  // v2
    TableLog.compactSmallFiles(spark, dir, minFileMB = 1024, targetFileMB = 1024) // v3: rows-preserving
    TableLog.append(spark, dir, Seq((200L, "y")).toDF("k", "s"))                  // v4
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    // INCLUSIVE (the batch CDF / changeFeedStream / Delta convention):
    // a consumer bootstrapped from the v1 snapshot starts AT v2
    val q = spark.readStream.format("graft")
      .option("startingVersion", "2").load(dir)
      .writeStream.option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= b.collect().map(_.getLong(0)); ()
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(got.sorted == Seq(100L, 200L),
      s"startingVersion=2 skips v1's snapshot; compaction emits nothing: $got")
    // compactTable (a full rows-preserving OPTIMIZE) must also pass the
    // append-only guard — it commits as `compact`, not `overwrite`
    TableLog.compactTable(spark, dir)                                          // v5
    TableLog.append(spark, dir, Seq((300L, "z")).toDF("k", "s"))               // v6
    val q2 = spark.readStream.format("graft")
      .option("startingVersion", "2").load(dir)
      .writeStream.option("checkpointLocation", s"$base/ckpt2")
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= b.collect().map(_.getLong(0)); ()
      }
      .start()
    q2.processAllAvailable(); q2.stop()
    assert(got.sorted == Seq(100L, 100L, 200L, 200L, 300L),
      s"full-table OPTIMIZE passes the append-only stream: $got")
  }

  test("streaming sink: micro-batches land as exactly-once commits; keys upsert; source→sink composes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmpDir("gsk")
    val dir = s"$base/t"
    val ms = MemoryStream[Long]
    ms.addData(1L, 2L, 3L)
    val q = ms.toDF().toDF("k")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$base/ckpt")
      .option("statsCols", "k")
      .start(dir)
    q.processAllAvailable()
    ms.addData(4L, 5L)
    q.processAllAvailable(); q.stop()
    assert(TableLog.readAt(spark, dir).collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 5L), "both micro-batches must land")
    assert(TableLog.history(spark, dir).flatMap(_.txn).map(_._2).sorted == Seq(0L, 1L),
      "each batch carries its marker")
    // replaying an already-committed batchId is a no-op (the Once contract)
    val vBefore = TableLog.currentVersion(spark, dir)
    new GraftStreamSink(spark.sqlContext, dir, Nil, "graft-sink", Seq("k"))
      .addBatch(1L, Seq(99L).toDF("k"))
    assert(TableLog.currentVersion(spark, dir) == vBefore,
      "a replayed batch must find its marker and skip")
    // keyed mode: overlapping batches upsert last-wins via mergeIntoOnce
    val dir2 = s"$base/t2"
    val ms2 = MemoryStream[(Long, String)]
    ms2.addData((1L, "a"), (2L, "b"))
    val q2 = ms2.toDF().toDF("k", "s")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$base/ckpt2")
      .option("keys", "k").option("statsCols", "k")
      .start(dir2)
    q2.processAllAvailable()
    ms2.addData((2L, "B"), (3L, "c"))
    q2.processAllAvailable(); q2.stop()
    assert(TableLog.readAt(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")), "keyed batches must merge last-wins")
    // the full loop: graft source → graft sink mirrors a table continuously
    val mirror = s"$base/mirror"
    val q3 = spark.readStream.format("graft").load(dir)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$base/ckpt3")
      .option("statsCols", "k")
      .start(mirror)
    q3.processAllAvailable(); q3.stop()
    assert(TableLog.readAt(spark, mirror).collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 5L), "source→sink must mirror the table exactly")
  }

  test("streaming CDF over a hive-adopted table carries real partition values") {
    val base = tmpDir("gss_part")
    val dir = s"$base/lake"
    spark.range(0, 90)
      .select(col("id").as("k"), (col("id") % 3).cast("int").as("p"))
      .repartition(1).write.partitionBy("p").parquet(dir)
    TableLog.convertToGraft(spark, dir, statsCols = Seq("k"))
    TableLog.deleteWhere(spark, dir, col("p") === 1 && col("k") < 10, mode = "dv")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(dir)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        rows.synchronized {
          rows ++= b.select("k", "p", "_change_type").collect().map(r =>
            (r.getLong(0), if (r.isNullAt(1)) -999 else r.getInt(1),
              r.getString(2)))
        }
        ()
      }
      .start()
    q.awaitTermination()
    val dels = rows.filter(_._3 == "delete")
    assert(dels.map(_._1).sorted == Seq(1L, 4L, 7L),
      s"exactly the dv-deleted keys stream as deletes: $dels")
    assert(dels.forall(_._2 == 1),
      "delete pre-images must carry the REAL partition value, never null")
    val ins = rows.filter(_._3 == "insert")
    assert(ins.size == 90 && !ins.exists(_._2 == -999),
      "the adoption commit streams every row with its real partition value")
  }

  test("mid-stream widen fails instructively; restart adopts the wide schema exactly-once") {
    val base = tmpDir("gssw")
    val dir = s"$base/t"
    TableLog.append(spark, dir,
      (1 to 5).map(i => (i, s"a$i")).toDF("k", "tag"), statsCols = Seq("k"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def start() = spark.readStream.format("graft").load(dir)
      .writeStream.option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= b.collect().map(_.getAs[Number]("k").longValue) }
        ()
      }
      .start()
    val q = start()
    q.processAllAvailable()
    assert(seen.sorted.toSeq == (1L to 5L), seen.toString)
    // the table widens and grows WHILE the stream runs: the running
    // query must die with the restart instruction, not the opaque
    // MicroBatchExecution assertion — and must NOT emit the batch
    TableLog.alterColumnType(spark, dir, "k",
      org.apache.spark.sql.types.LongType)
    TableLog.append(spark, dir,
      Seq((5000000000L, "wide")).toDF("k", "tag"), statsCols = Seq("k"))
    val deadline = System.currentTimeMillis() + 30000
    try q.processAllAvailable() catch { case _: Throwable => () }
    while (q.exception.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    val err = q.exception.getOrElse(fail("query must fail on the widen"))
    assert(err.getMessage.contains("restart the streaming query"),
      err.getMessage.take(500))
    assert(seen.size == 5, "the widening batch must not half-deliver")
    q.stop()
    // restart on the SAME checkpoint: the re-opened source declares the
    // WIDE schema, re-runs the failed range, and delivers exactly once
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(seen.sorted.toSeq == (1L to 5L) :+ 5000000000L, seen.toString)
  }
}
