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

  test("success path executes the transformed plan exactly once (observed count)") {
    val dir = Files.createTempDirectory("pipe_once").toFile.getAbsolutePath
    val obsLog = ObsLog.attach(spark)
    try {
      val report = Pipeline.run(spark, "run-once",
        extract = source,
        stages = Seq(Pipeline.Stage("fill", df => Cleaning.fillUnknown(df, Seq("tag")))),
        gate = Some(Pipeline.Gate(Seq(Validation.nullCheck("id", 0.0, "critical")))),
        load = df => graft.sinks.DataSink.writeParquet(df, s"$dir/out"))
      assert(!report.aborted && report.loaded == 3)
      // exactly two actions: the gate's validation collect + the load
      // write (which carries the observed count) — no separate count() job
      val eventually = (1 to 100).iterator
        .map { _ => Thread.sleep(25); obsLog.toDF(spark).count() }
        .find(_ >= 2)
      assert(eventually.contains(2L),
        s"expected 2 actions (gate + load), saw ${obsLog.toDF(spark).count()}")
    } finally ObsLog.detach(spark, obsLog)
  }

  test("runAll drives multiple tables through gates into one warehouse (run_full_pipeline parity)") {
    import graft.sinks.JdbcWarehouse
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("pipe_all").toFile.getAbsolutePath
    val dbDir = s"$dir/wh"
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val ts = java.sql.Timestamp.valueOf("2026-08-12 00:00:00")

    // three extract arms of different shapes: CSV (with a corrupt row),
    // JSON, and parquet — the reference's _extract dict of tables
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/orders.csv"),
      "order_id,amount\n1,10.5\n2,oops\n3,7.25\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/carts.json"),
      """{"cart_id": 1, "user": "a"}
        |{"cart_id": 2, "user": "b"}""".stripMargin.getBytes)

    val ordersSchema = StructType(Seq(
      StructField("order_id", LongType), StructField("amount", DoubleType)))
    val jobs = Seq(
      Pipeline.TableJob("orders",
        extract = s => graft.sources.CsvSource.quarantine(
          graft.sources.CsvSource.read(s, s"$dir/orders.csv", ordersSchema))._1,
        gate = Some(Pipeline.Gate(Seq(Validation.nullCheck("order_id", 0.0, "critical"))))),
      Pipeline.TableJob("carts",
        extract = s => graft.sources.JsonSource.read(s, s"$dir/carts.json",
          StructType(Seq(StructField("cart_id", LongType), StructField("user", StringType))))),
      Pipeline.TableJob("fact",
        extract = s => graft.sources.Tables.nation(s, "/root/testdata/sf0.001"),
        stages = Seq(Pipeline.Stage("norm",
          df => Cleaning.normalizeCategorical(df, Seq("n_name"), "lower")))))

    val full = Pipeline.runAll(spark, "full-1", jobs,
      load = (table, df) => JdbcWarehouse.load(df, url, table,
        org.apache.spark.sql.SaveMode.Overwrite, props = props),
      logPath = Some(s"$dir/log"),
      now = () => ts)

    assert(!full.anyAborted && full.tables.keySet == Set("orders", "carts", "fact"))
    assert(full.tables("orders").loaded == 2) // corrupt row quarantined
    assert(full.tables("carts").loaded == 2)
    assert(full.tables("fact").loaded == 25)
    // everything queryable in the one warehouse
    assert(JdbcWarehouse.read(spark, url, "orders", props).count() == 2)
    assert(JdbcWarehouse.read(spark, url, "carts", props).count() == 2)
    assert(JdbcWarehouse.read(spark, url, "fact", props).count() == 25)
    // one consolidated run log: a row per table, keyed by the shared run id
    val log = spark.read.parquet(s"$dir/log")
    assert(log.count() == 3)
    assert(log.select("stage").collect().map(_.getString(0)).toSet ==
      Set("orders", "carts", "fact"))
    // and the warehouse-side etl_runs rows (db_loader.py:443 parity)
    full.tables.foreach { case (table, r) =>
      JdbcWarehouse.logEtlRun(spark, url, "etl_runs", r.runId, table,
        if (r.aborted) "aborted" else "success", r.loaded, ts, props)
    }
    assert(JdbcWarehouse.read(spark, url, "etl_runs", props).count() == 3)
  }

  test("loaded count is the FULL row count even when the loader probes first") {
    // a guard action (isEmpty = limit(1) job) must not be recorded as the
    // loaded count — the max over the loader's actions is the full pass
    val dir = Files.createTempDirectory("pipe_guard").toFile.getAbsolutePath
    val report = Pipeline.run(spark, "run-guard",
      extract = source,
      stages = Nil,
      gate = None,
      load = df => { if (!df.isEmpty) graft.sinks.DataSink.writeParquet(df, s"$dir/out") })
    assert(report.loaded == 3, s"guard probe leaked into loaded=${report.loaded}")
    assert(spark.read.parquet(s"$dir/out").count() == 3)
  }

  test("runAll isolates a crashing arm: other arms load and all rows logged") {
    val dir = Files.createTempDirectory("pipe_crash").toFile.getAbsolutePath
    val full = Pipeline.runAll(spark, "crash-run", Seq(
        Pipeline.TableJob("ok1", extract = _ => source),
        Pipeline.TableJob("boom", extract = _ => source),
        Pipeline.TableJob("badsrc",
          extract = _ => throw new RuntimeException("missing source path")),
        Pipeline.TableJob("ok2", extract = _ => source)),
      load = (table, df) => {
        if (table == "boom") throw new RuntimeException("transient sink failure")
        graft.sinks.DataSink.writeParquet(df, s"$dir/$table")
      },
      logPath = Some(s"$dir/log"),
      now = () => java.sql.Timestamp.valueOf("2026-08-12 00:00:00"))
    assert(full.anyAborted)
    assert(!full.tables("ok1").aborted && !full.tables("ok2").aborted)
    assert(full.tables("boom").aborted &&
      full.tables("boom").stages.exists(s => s.failures.exists(_.contains("transient"))))
    // crash ATTRIBUTION: a broken source is an extract failure, a sink
    // crash reports on the neutral run stage — not on "load" for both
    assert(full.tables("badsrc").stages.map(_.stage) == Seq("extract"))
    assert(full.tables("badsrc").stages.head.failures.exists(_.contains("missing source")))
    assert(full.tables("boom").stages.map(_.stage) == Seq("run"))
    assert(spark.read.parquet(s"$dir/ok1").count() == 3)
    assert(spark.read.parquet(s"$dir/ok2").count() == 3)
    val log = spark.read.parquet(s"$dir/log")
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[String]("status")).toMap
    assert(log == Map("ok1" -> "success", "boom" -> "failed",
      "badsrc" -> "failed", "ok2" -> "success"))
    // misconfigured duplicate arm names are rejected up front
    intercept[IllegalArgumentException] {
      Pipeline.runAll(spark, "dup", Seq(
        Pipeline.TableJob("t", extract = _ => source),
        Pipeline.TableJob("t", extract = _ => source)), (_, _) => ())
    }
  }

  test("runAll parallel arms produce the same reports as sequential") {
    val dir = Files.createTempDirectory("pipe_par").toFile.getAbsolutePath
    val jobs = Seq(
      Pipeline.TableJob("t1", extract = _ => source,
        stages = Seq(Pipeline.Stage("fill", df => Cleaning.fillUnknown(df, Seq("tag"))))),
      Pipeline.TableJob("t2", extract = _ => source.filter(col("amount") > 0)),
      Pipeline.TableJob("t3", extract = _ => source,
        gate = Some(Pipeline.Gate(Seq(Validation.nullCheck("tag", 0.0, "critical"))))))
    def sink(sub: String) = (table: String, df: org.apache.spark.sql.DataFrame) =>
      graft.sinks.DataSink.writeParquet(df, s"$dir/$sub/$table")
    val seq = Pipeline.runAll(spark, "par-run", jobs, sink("seq"),
      logPath = Some(s"$dir/log_seq"))
    val par = Pipeline.runAll(spark, "par-run", jobs, sink("par"),
      logPath = Some(s"$dir/log_par"), parallelism = 3)
    assert(par.tables.view.mapValues(r => (r.loaded, r.aborted)).toMap ==
      seq.tables.view.mapValues(r => (r.loaded, r.aborted)).toMap)
    assert(par.anyAborted && par.tables("t3").aborted)
    assert(spark.read.parquet(s"$dir/par/t1").count() == 3)
    assert(spark.read.parquet(s"$dir/log_par").count() == 3)
  }

  test("runAll: a failed gate aborts only that table's load") {
    val dir = Files.createTempDirectory("pipe_part").toFile.getAbsolutePath
    var loadedTables = List.empty[String]
    val full = Pipeline.runAll(spark, "full-2", Seq(
        Pipeline.TableJob("bad",
          extract = _ => source, // tag nulls unfixed
          gate = Some(Pipeline.Gate(Seq(Validation.nullCheck("tag", 0.0, "critical"))))),
        Pipeline.TableJob("good", extract = _ => source)),
      load = (table, df) => {
        loadedTables ::= table
        graft.sinks.DataSink.writeParquet(df, s"$dir/$table")
      })
    assert(full.anyAborted)
    assert(full.tables("bad").aborted && !full.tables("good").aborted)
    assert(loadedTables == List("good"))
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
