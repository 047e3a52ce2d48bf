package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  test("CsvSource: schema read, corrupt-row quarantine, ingest metadata") {
    val dir = Files.createTempDirectory("csv_src").toFile
    val f = new java.io.File(dir, "orders.csv")
    Files.writeString(f.toPath,
      """order_id,status,total
        |1,delivered,120.50
        |NOT A NUMBER AT ALL,,,,,extra
        |2,shipped,80.00
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("order_id", LongType), StructField("status", StringType),
      StructField("total", DoubleType)))
    val raw = CsvSource.read(spark, f.getAbsolutePath, schema)
    val stamped = CsvSource.withIngestMetadata(raw, java.sql.Timestamp.valueOf("2026-08-12 00:00:00"))
    val (good, bad) = CsvSource.quarantine(stamped)
    assert(good.count() == 2)
    assert(bad.count() == 1)
    val badRows = bad.collect()
    assert(good.columns.toSeq.contains("source_file") && !good.columns.contains("_corrupt_record"))
    assert(good.select("source_file").distinct().head().getString(0).endsWith("orders.csv"))
    assert(badRows(0).getAs[String](CsvSource.CorruptCol).startsWith("NOT A NUMBER"))

    // a blank separator line must not fabricate a phantom all-null row
    // (from_csv parses "" into clean nulls — only whitespace gets flagged)
    val f2 = new java.io.File(dir, "blanky.csv")
    Files.writeString(f2.toPath,
      "order_id,status,total\n1,delivered,120.50\n\n2,shipped,80.00\n")
    val (good2, bad2) = CsvSource.quarantine(
      CsvSource.read(spark, f2.getAbsolutePath, schema))
    assert(good2.count() == 2 && bad2.count() == 0)
  }

  test("CsvSource drops quoted/padded/case-variant header lines") {
    val dir = Files.createTempDirectory("csv_hdr").toFile
    val f = new java.io.File(dir, "export.csv")
    Files.writeString(f.toPath,
      """"ID", Status ,TOTAL
        |1,delivered,120.50
        |2,shipped,80.00
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("status", StringType),
      StructField("total", DoubleType)))
    val (good, bad) = CsvSource.quarantine(CsvSource.read(spark, f.getAbsolutePath, schema))
    assert(good.count() == 2, "variant header must be dropped, not null-parsed")
    assert(bad.count() == 0)
  }

  test("JsonSource: struct flatten and item explode") {
    val dir = Files.createTempDirectory("json_src").toFile
    val f = new java.io.File(dir, "carts.json")
    Files.writeString(f.toPath,
      """{"cart_id": 1, "user": {"id": 10, "name": "ana"}, "items": [{"pid": 100, "qty": 2}, {"pid": 101, "qty": 1}]}
        |{"cart_id": 2, "user": {"id": 11, "name": "bo"}, "items": [{"pid": 102, "qty": 5}]}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("cart_id", LongType),
      StructField("user", StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))),
      StructField("items", ArrayType(StructType(Seq(
        StructField("pid", LongType), StructField("qty", LongType)))))))
    val carts = JsonSource.read(spark, f.getAbsolutePath, schema)

    val flat = JsonSource.flattenStructs(carts.drop("items"))
    assert(flat.columns.toSeq == Seq("cart_id", "user_id", "user_name"))
    assert(flat.filter(col("user_name") === "ana").head().getAs[Long]("user_id") == 10L)

    val items = JsonSource.explodeItems(carts, "items", Seq("cart_id"))
    assert(items.columns.toSeq == Seq("cart_id", "pid", "qty"))
    assert(items.count() == 3)
    assert(items.filter(col("cart_id") === 1L).count() == 2)
  }

  test("JsonSource flatten/explode disambiguate colliding names instead of emitting duplicates") {
    import spark.implicits._
    // ids at BOTH levels (the common API-payload shape): a duplicate
    // output column would throw AMBIGUOUS_REFERENCE downstream
    val carts = Seq((1L, 100L, Seq((7L, 2L)))).toDF("id", "total", "items")
      .withColumn("items", col("items").cast("array<struct<id: bigint, qty: bigint>>"))
    val items = JsonSource.explodeItems(carts, "items", Seq("id"))
    assert(items.columns.toSeq == Seq("id", "id_2", "qty"))
    assert(items.select("id", "id_2").head() == org.apache.spark.sql.Row(1L, 7L))

    // top-level rating_rate next to struct rating{rate}: flatten must not
    // produce two rating_rate columns
    val prods = Seq((1L, 9.9, (4.5, 10L))).toDF("pid", "rating_rate", "rating")
      .withColumn("rating", col("rating").cast("struct<rate: double, count: bigint>"))
    val flat = JsonSource.flattenStructs(prods)
    assert(flat.columns.toSeq == Seq("pid", "rating_rate", "rating_rate_2", "rating_count"))
    assert(flat.select("rating_rate", "rating_rate_2").head() ==
      org.apache.spark.sql.Row(9.9, 4.5))
  }

  test("JsonSource.parseColumn parses embedded JSON strings") {
    import spark.implicits._
    val df = Seq((1L, """{"k": 7}"""), (2L, "not json")).toDF("id", "props")
    val parsed = JsonSource.parseColumn(df, "props",
      StructType(Seq(StructField("k", IntegerType))))
    val rows = parsed.orderBy("id").select(col("props.k")).collect()
    assert(rows(0).getInt(0) == 7)
    assert(rows(1).isNullAt(0)) // coerced, not failed
  }

  test("registerAll exposes every table to spark.sql (the reference's query() surface)") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val out = spark.sql(
      """SELECT n_name, count(*) AS customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY customers DESC LIMIT 3""".stripMargin)
    assert(out.count() == 3)
    assert(spark.sql("SELECT count(*) FROM documents").head().getLong(0) > 0)
    // the events VIEW must carry the same ts normalization as the typed
    // accessor — raw long nanos here would make SQL over the view diverge
    val tsType = spark.sql("SELECT ts FROM events").schema.head.dataType.typeName
    assert(tsType.startsWith("timestamp"), s"events view ts must be a timestamp, got $tsType")
  }

  test("Tables.events converts nano timestamps to a usable timestamp column") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType.typeName.startsWith("timestamp"))
    assert(ev.select(min(col("ts"))).head().get(0) != null)
  }
}
