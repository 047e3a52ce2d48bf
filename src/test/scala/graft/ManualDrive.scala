package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.sources.{CsvSource, JsonSource}
import graft.sinks.DataSink
import graft.streaming.EventStreams

/** Manual end-to-end driver for the ingest/sink/streaming surface — run
  * with `sbt "Test/runMain graft.ManualDrive"`. Exercises the paths the
  * DuckDB-oracle gate can't reach (file ingestion, sinks, streams).
  */
object ManualDrive {

  /** Write the ingest fixtures if absent — /tmp is wiped between
    * sessions, and the driver must be runnable from a cold checkout.
    */
  private def ensureFixtures(): Unit = {
    val dir = new java.io.File("/tmp/drive")
    dir.mkdirs()
    val csv = new java.io.File(dir, "orders.csv")
    if (!csv.isFile) {
      java.nio.file.Files.writeString(csv.toPath,
        """order_id,status,ordered_at,total
          |1,delivered,2026-08-01 10:00:00,99.50
          |2,pending,2026-08-02 11:30:00,15.00
          |not-a-number,delivered,2026-08-03 09:00:00,20.00
          |4,canceled,also-not-a-timestamp,7.25
          |5,delivered,2026-08-04 16:45:00,120.10
          |""".stripMargin)
    }
    val json = new java.io.File(dir, "carts.json")
    if (!json.isFile) {
      java.nio.file.Files.writeString(json.toPath,
        """{"cart_id":1,"user":{"id":10,"name":"ada"},"items":[{"product_id":100,"qty":2},{"product_id":101,"qty":1}]}
          |{"cart_id":2,"user":{"id":11,"name":"lin"},"items":[{"product_id":102,"qty":5}]}
          |""".stripMargin)
    }
  }

  def main(args: Array[String]): Unit = {
    ensureFixtures()
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("=== CSV source: corrupt-row tolerance + ingest metadata")
    val schema = StructType(Seq(StructField("order_id", LongType), StructField("status", StringType),
      StructField("ordered_at", TimestampType), StructField("total", DoubleType)))
    val raw = CsvSource.read(spark, "/tmp/drive/orders.csv", schema)
    val stamped = CsvSource.withIngestMetadata(raw, java.sql.Timestamp.valueOf("2026-08-12 00:00:00"))
    val (good, bad) = CsvSource.quarantine(stamped)
    good.show(false)
    println("quarantined:"); bad.show(false)

    println("=== JSON source: flatten + explode")
    val jschema = StructType(Seq(StructField("cart_id", LongType),
      StructField("user", StructType(Seq(StructField("id", LongType), StructField("name", StringType)))),
      StructField("items", ArrayType(StructType(Seq(StructField("product_id", LongType), StructField("qty", LongType)))))))
    val carts = JsonSource.read(spark, "/tmp/drive/carts.json", jschema)
    JsonSource.flattenStructs(carts.drop("items")).show(false)
    JsonSource.explodeItems(carts, "items", Seq("cart_id")).show(false)

    println("=== DataSink: partitioned write + upsert + run log")
    val cur = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "version")
    val upd = Seq((2L, "b2", 2L), (3L, "c", 1L), (1L, "a-tie", 1L)).toDF("k", "v", "version")
    val merged = DataSink.upsert(cur, upd, Seq("k"), "version").orderBy("k")
    merged.show(false)
    DataSink.writeParquet(merged, "/tmp/drive/out_parquet", partitionBy = Seq("version"))
    println("partitions: " + new java.io.File("/tmp/drive/out_parquet").list().filter(_.startsWith("version=")).sorted.mkString(","))
    DataSink.logEtlRun(spark, "/tmp/drive/etl_log", "run-1", "load", "success", 3L, java.sql.Timestamp.valueOf("2026-08-12 01:00:00"))
    spark.read.parquet("/tmp/drive/etl_log").show(false)

    println("=== Streaming: sessionize / dedup / windowed agg via MemoryStream")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ts = (m: String) => java.sql.Timestamp.valueOf(m)

    val ms = MemoryStream[EventStreams.Event]
    ms.addData(
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0),
      EventStreams.Event(2, 10, "click", ts("2026-01-01 10:05:00"), 2.0),
      EventStreams.Event(3, 10, "click", ts("2026-01-01 12:00:00"), 4.0),
      EventStreams.Event(4, 11, "view",  ts("2026-01-01 10:20:00"), 8.0))
    val sessions = EventStreams.sessionize(ms.toDS(), gapMinutes = 30)
    val sq = sessions.writeStream.format("memory").queryName("sess").outputMode("append").start()
    sq.processAllAvailable()
    ms.addData(EventStreams.Event(5, 10, "click", ts("2026-01-01 15:00:00"), 16.0))
    sq.processAllAvailable()
    spark.sql("select * from sess order by user_id, session_start").show(false)
    sq.stop()

    val ms2 = MemoryStream[EventStreams.Event]
    ms2.addData(
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:00"), 1.0),
      EventStreams.Event(1, 10, "click", ts("2026-01-01 10:00:30"), 1.0),
      EventStreams.Event(9, 12, "view",  ts("2026-01-01 10:01:00"), 3.0))
    val dd = EventStreams.dedup(ms2.toDF(), Seq("event_id"))
    val sq2 = dd.writeStream.format("memory").queryName("dd").outputMode("append").start()
    sq2.processAllAvailable()
    spark.sql("select event_id, user_id from dd order by event_id").show(false)
    sq2.stop()

    val ms3 = MemoryStream[EventStreams.Event]
    ms3.addData((0 until 10).map(i => EventStreams.Event(i, i % 3, if (i % 2 == 0) "click" else "view", ts(f"2026-01-01 10:${i * 5}%02d:00"), i.toDouble)): _*)
    val wc = EventStreams.windowedCounts(ms3.toDF())
    val sq3 = wc.writeStream.format("memory").queryName("wc").outputMode("append").start()
    sq3.processAllAvailable()
    ms3.addData(EventStreams.Event(99, 1, "click", ts("2026-01-01 14:00:00"), 0.0))
    sq3.processAllAvailable()
    spark.sql("select * from wc order by window_start, event_type").show(false)
    sq3.stop()
    println("=== Skew: salted distinct + histogram; bucketed co-located join")
    val skewed = ((0 until 500).map(i => ("hot", s"v${i % 100}")) ++ Seq(("cold", "x")))
      .toDF("k", "v")
    graft.operators.Skew.countDistinctSalted(skewed, Seq("k"), "v", "ndv").orderBy("k").show()
    graft.operators.Skew.keyHistogram(skewed, Seq("k")).show()
    val t1 = (1L to 100L).map(i => (i, i * 2)).toDF("k", "a")
    graft.sinks.DataSink.writeBucketed(t1, "drive_bkt", Seq("k"), 4)
    println("bucketed join plan Exchange count: " +
      "Exchange".r.findAllIn(spark.table("drive_bkt")
        .groupBy("k").count().queryExecution.executedPlan.toString).length)
    spark.sql("DROP TABLE IF EXISTS drive_bkt")

    println("=== Multimodal stubs: resize + frame sampling")
    val media = graft.operators.Multimodal.withBinaryPayload(
      Seq((1L, "hello world of binary payloads")).toDF("doc_id", "text"), "doc_id", "text")
    graft.operators.Multimodal.resizeStub(media, 8)
      .select(col("doc_id"), length(col("payload")).as("resized_len"), col("media_type")).show(false)
    graft.operators.Multimodal.frameSampleStub(media, frames = 3, frameBytes = 4).show(false)

    println("=== Incremental file ingest (AvailableNow)")
    val base = java.nio.file.Files.createTempDirectory("drive_ingest").toFile.getAbsolutePath
    val ingSchema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$base/src/b1")
    EventStreams.ingestAvailableNow(spark, s"$base/src/*", ingSchema, s"$base/sink", s"$base/ckpt")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$base/src/b2")
    EventStreams.ingestAvailableNow(spark, s"$base/src/*", ingSchema, s"$base/sink", s"$base/ckpt")
    println("ingested rows after two incremental runs: " + spark.read.parquet(s"$base/sink").count())

    println("DRIVE COMPLETE")
    spark.stop()
  }
}
