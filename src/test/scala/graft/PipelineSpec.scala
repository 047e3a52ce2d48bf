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
