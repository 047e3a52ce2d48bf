package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, Validation}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def source = Seq(
    (1L, Some("a"), 10.0), (2L, None, -5.0), (3L, Some("c"), 30.0)
  ).toDF("id", "tag", "amount")

  test("pipeline runs extract → clean → gate → load and logs the run") {
    val dir = Files.createTempDirectory("pipe").toFile.getAbsolutePath
    val report = Pipeline.run(spark, "run-ok",
      extract = source,
      stages = Seq(
        Pipeline.Stage("fill_tags", df => Cleaning.fillUnknown(df, Seq("tag"))),
        Pipeline.Stage("drop_negative", _.filter(col("amount") >= 0))),
      gate = Some(Pipeline.Gate(Seq(Validation.nullCheck("tag", 0.0, "critical")))),
      load = df => graft.sinks.DataSink.writeParquet(df, s"$dir/out"),
      logPath = Some(s"$dir/log"),
      now = () => java.sql.Timestamp.valueOf("2026-08-12 00:00:00"))
    assert(!report.aborted)
    assert(report.loaded == 2)
    assert(spark.read.parquet(s"$dir/out").count() == 2)
    val log = spark.read.parquet(s"$dir/log").head()
    assert(log.getAs[String]("status") == "success")
    assert(log.getAs[Long]("rows_processed") == 2L)
  }

  test("failed critical gate aborts before load") {
    val dir = Files.createTempDirectory("pipe2").toFile.getAbsolutePath
    var loadCalled = false
    val report = Pipeline.run(spark, "run-bad",
      extract = source,
      stages = Nil, // tag nulls NOT fixed
      gate = Some(Pipeline.Gate(Seq(Validation.nullCheck("tag", 0.0, "critical")))),
      load = _ => loadCalled = true,
      logPath = Some(s"$dir/log"),
      now = () => java.sql.Timestamp.valueOf("2026-08-12 00:00:00"))
    assert(report.aborted)
    assert(!loadCalled)
    assert(report.stages.find(_.stage == "validate").get.failures == Seq("null_check_tag"))
    assert(spark.read.parquet(s"$dir/log").head().getAs[String]("status") == "aborted")
  }

  test("end-to-end on the real star schema: clean, derive, validate, load") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("pipe_e2e").toFile.getAbsolutePath
    val sf = "/root/testdata/sf0.001"
    val report = Pipeline.run(spark, "e2e",
      extract = graft.sources.Tables.lineitem(spark, sf)
        .join(graft.sources.Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey")),
      stages = Seq(
        Pipeline.Stage("derive", df => Cleaning.withDerived(df, Map(
          "ship_delay_hours" -> Cleaning.durationHours(col("l_shipdate"), col("o_orderdate")),
          "net_price" -> (col("l_extendedprice") * (lit(1d) - col("l_discount")))))),
        Pipeline.Stage("normalize", df =>
          Cleaning.normalizeCategorical(df, Seq("l_returnflag"), "upper"))),
      gate = Some(Pipeline.Gate(Seq(
        Validation.nullCheck("l_orderkey", 0.0, "critical"),
        Validation.rangeCheck("l_quantity", Some(0d), Some(100d), "critical")))),
      load = df => graft.sinks.DataSink.writeParquet(df, s"$dir/fact",
        partitionBy = Seq("l_returnflag")),
      logPath = Some(s"$dir/log"),
      now = () => java.sql.Timestamp.valueOf("2026-08-12 00:00:00"))
    assert(!report.aborted)
    val back = spark.read.parquet(s"$dir/fact")
    assert(back.count() == report.loaded && report.loaded > 1000)
    assert(back.columns.contains("ship_delay_hours"))
    // partition pruning works on the loaded layout
    val pruned = back.filter(col("l_returnflag") === "R")
    assert(pruned.count() > 0)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || scan.contains("l_returnflag"))
  }

  test("pipeline loads into the JDBC warehouse with a DB-side run log (main.py parity)") {
    import graft.sinks.JdbcWarehouse
    val dbDir = Files.createTempDirectory("pipe-derby").toFile.getAbsolutePath
    val url = s"jdbc:derby:$dbDir/wh;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val ts = java.sql.Timestamp.valueOf("2026-08-12 00:00:00")

    val report = Pipeline.run(spark, "run-jdbc",
      extract = source,
      stages = Seq(Pipeline.Stage("clean", df => Cleaning.dropMissing(df, Seq("tag")))),
      gate = Some(Pipeline.Gate(Seq(Validation.nullCheck("id", 0.0, "critical")))),
      load = df => JdbcWarehouse.load(df,
        url, "fact", org.apache.spark.sql.SaveMode.Overwrite, props = props))
    assert(!report.aborted && report.loaded == 2)
    assert(JdbcWarehouse.read(spark, url, "fact", props).count() == 2)
    JdbcWarehouse.logEtlRun(spark, url, "etl_runs", report.runId,
      "pipeline", "success", report.loaded, ts, props)
    assert(JdbcWarehouse.read(spark, url, "etl_runs", props).count() == 1)
  }

  test("non-abort severities don't gate the load") {
    var loadCalled = false
    val report = Pipeline.run(spark, "run-warn",
      extract = source,
      stages = Nil,
      gate = Some(Pipeline.Gate(Seq(Validation.nullCheck("tag", 0.0, "warning")))),
      load = _ => loadCalled = true)
    assert(!report.aborted && loadCalled)
  }
}
