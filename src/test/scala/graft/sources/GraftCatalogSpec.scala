package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The persistent catalog (V2 CatalogPlugin): graft tables as NAMED SQL
  * objects that survive sessions — CREATE/CTAS/INSERT/SELECT/DELETE/
  * SHOW/ALTER/RENAME/DROP by name, time travel through `VERSION AS OF`,
  * external LOCATION adoption, and the same pruning/broadcast behavior
  * as the path-based connector (one buildScan implementation under all
  * three SQL surfaces). Persistence is the filesystem: a SECOND catalog
  * instance over the same root (the cross-session simulation) sees
  * every table.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val root =
    java.nio.file.Files.createTempDirectory("gcat_root").toFile.getAbsolutePath

  spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gcat.root", root)
  // the second catalog over the SAME root — "another session"
  spark.conf.set("spark.sql.catalog.gcat2", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gcat2.root", root)

  test("create / insert / select / delete / overwrite by name; DDL round-trips") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.sales")
    spark.sql("CREATE TABLE gcat.sales.orders (k BIGINT, s STRING) USING graft")
    spark.sql("INSERT INTO gcat.sales.orders VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(spark.sql("SELECT * FROM gcat.sales.orders").count() == 3L)
    // SHOW discovers by name
    assert(spark.sql("SHOW TABLES IN gcat.sales").collect()
      .map(_.getString(1)).toSeq == Seq("orders"))
    assert(spark.sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)).contains("sales"))
    // DELETE is the stats-pruned CoW behind SupportsDelete
    spark.sql("DELETE FROM gcat.sales.orders WHERE k = 2")
    assert(spark.sql("SELECT k FROM gcat.sales.orders ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // INSERT OVERWRITE is one atomic overwrite commit
    spark.sql("INSERT OVERWRITE gcat.sales.orders VALUES (9, 'z')")
    assert(spark.sql("SELECT s FROM gcat.sales.orders").head().getString(0) == "z")
    // time travel by name: the pre-delete snapshot still reads
    assert(spark.sql("SELECT * FROM gcat.sales.orders VERSION AS OF 2").count() == 3L)
    // ALTER: properties + column rename/add ride the manifest (all
    // manifest-only — zero data rewritten)
    spark.sql("ALTER TABLE gcat.sales.orders SET TBLPROPERTIES ('graft.stats.cols'='k')")
    spark.sql("ALTER TABLE gcat.sales.orders RENAME COLUMN s TO label")
    assert(spark.sql("SELECT label FROM gcat.sales.orders").head().getString(0) == "z")
    spark.sql("ALTER TABLE gcat.sales.orders ADD COLUMN note STRING")
    // pre-evolution files null-fill the added column on read
    assert(spark.sql("SELECT note FROM gcat.sales.orders").head().isNullAt(0))
    spark.sql("INSERT INTO gcat.sales.orders VALUES (10, 'y', 'hello')")
    assert(spark.sql("SELECT note FROM gcat.sales.orders WHERE k = 10")
      .head().getString(0) == "hello")
    // a dropped column's name cannot come back (stale-byte resurrection)
    spark.sql("ALTER TABLE gcat.sales.orders DROP COLUMN note")
    val eAdd = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.sales.orders ADD COLUMN note STRING")
    }
    assert(eAdd.getMessage.contains("resurrect"), eAdd.getMessage)
    // the OTHER catalog instance over the same root sees everything —
    // tables are filesystem objects, not session state
    assert(spark.sql("SELECT label FROM gcat2.sales.orders WHERE k = 9")
      .head().getString(0) == "z")
    assert(spark.sql("SHOW TABLES IN gcat2.sales").count() == 1L)
    // NESTED rename/drop through SQL (round 18): the dotted path rides
    // the column mapping — Spark's parser hands multipart fieldNames
    spark.sql("CREATE TABLE gcat.sales.ev (id BIGINT, " +
      "payload STRUCT<kind: STRING, qty: DOUBLE>) USING graft")
    spark.sql("INSERT INTO gcat.sales.ev VALUES (1, named_struct('kind', 'a', 'qty', 2.0))")
    spark.sql("ALTER TABLE gcat.sales.ev RENAME COLUMN payload.kind TO category")
    assert(spark.sql("SELECT payload.category FROM gcat.sales.ev")
      .head().getString(0) == "a")
    spark.sql("ALTER TABLE gcat.sales.ev DROP COLUMN payload.qty")
    assert(spark.sql("SELECT payload FROM gcat.sales.ev").schema("payload")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("category"))
  }

  test("CTAS, managed vs external drop semantics, rename, adoption by LOCATION") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ext")
    // CTAS: create + one append commit
    spark.sql("CREATE TABLE gcat.ext.squares USING graft AS " +
      "SELECT id AS k, id * id AS sq FROM range(10)")
    assert(spark.sql("SELECT sum(sq) FROM gcat.ext.squares").head().getLong(0) == 285L)
    // rename by name
    spark.sql("ALTER TABLE gcat.ext.squares RENAME TO gcat.ext.sq2")
    assert(spark.sql("SELECT count(*) FROM gcat.ext.sq2").head().getLong(0) == 10L)
    // external: adopt an existing table-log dir by LOCATION
    val extDir = java.nio.file.Files.createTempDirectory("gcat_ext").toFile.getAbsolutePath + "/t"
    graft.sinks.TableLog.append(spark, extDir,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"))
    spark.sql(s"CREATE TABLE gcat.ext.adopted USING graft LOCATION '$extDir'")
    assert(spark.sql("SELECT sum(v) FROM gcat.ext.adopted").head().getDouble(0) == 30.0)
    // a column list that disagrees with the adopted table refuses
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE gcat.ext.bad (x INT) USING graft LOCATION '$extDir'")
    }
    assert(e.getMessage.contains("differs"), e.getMessage)
    // DROP external: the entry goes, the DATA stays
    spark.sql("DROP TABLE gcat.ext.adopted")
    assert(graft.sinks.TableLog.readAt(spark, extDir).count() == 2L,
      "dropping an external table must not delete its data")
    // DROP managed: the table directory goes
    val managedDir = s"$root/ext/sq2"
    spark.sql("DROP TABLE gcat.ext.sq2")
    assert(!new java.io.File(managedDir).exists(),
      "dropping a managed table removes its directory")
  }

  test("readStream.table streams a catalog table through the V1 fallback") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.stream")
    spark.sql("CREATE TABLE gcat.stream.ev (k BIGINT, v DOUBLE) USING graft")
    spark.sql("INSERT INTO gcat.stream.ev VALUES (1, 1.0), (2, 2.0)")
    spark.sql("INSERT INTO gcat.stream.ev VALUES (3, 3.0)")
    val ck = java.nio.file.Files.createTempDirectory("gcat_stream_ck")
      .toFile.getAbsolutePath
    val seen = scala.collection.mutable.Set.empty[Long]
    val q = spark.readStream.table("gcat.stream.ev")
      .writeStream
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= b.collect().map(_.getLong(0)) }
        ()
      }
      .start()
    q.awaitTermination()
    assert(seen == Set(1L, 2L, 3L),
      s"the named stream must drain every appended row: $seen")
  }

  test("UPDATE / MERGE / maintenance statements resolve catalog names") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dml")
    spark.sql("CREATE TABLE gcat.dml.acct (k BIGINT, bal DOUBLE) USING graft")
    spark.sql("INSERT INTO gcat.dml.acct VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    // UPDATE by catalog name through the DML front
    GraftSql.exec(spark, "UPDATE gcat.dml.acct SET bal = bal + 5.0 WHERE k = 2")
    assert(spark.sql("SELECT bal FROM gcat.dml.acct WHERE k = 2").head().getDouble(0) == 25.0)
    // MERGE by catalog name
    Seq((2L, 99.0), (4L, 40.0)).toDF("k", "bal").createOrReplaceTempView("acct_src")
    GraftSql.exec(spark,
      """MERGE INTO gcat.dml.acct t USING acct_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val after = spark.sql("SELECT k, bal FROM gcat.dml.acct ORDER BY k").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(after == Seq(1L -> 10.0, 2L -> 99.0, 3L -> 30.0, 4L -> 40.0), s"got $after")
    // maintenance statements take catalog names too
    val hist = spark.sql("DESCRIBE HISTORY gcat.dml.acct").collect()
    assert(hist.length >= 4, s"create+insert+update+merge commits: ${hist.length}")
    assert(spark.sql("VACUUM gcat.dml.acct DRY RUN").head().getBoolean(4))
    // SHOW TBLPROPERTIES reads the manifest's property set by name
    spark.sql("ALTER TABLE gcat.dml.acct SET TBLPROPERTIES ('graft.stats.cols'='k')")
    val props = spark.sql("SHOW TBLPROPERTIES gcat.dml.acct").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.stats.cols").contains("k"), s"got $props")
  }

  test("persistent views: the reference's schema.sql objects by name, data-live, nested, cycle-safe") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.views")
    spark.sql("CREATE TABLE gcat.views.orders " +
      "(o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING) USING graft")
    spark.sql("INSERT INTO gcat.views.orders VALUES " +
      "(1, 100.0, 'F'), (2, 50.0, 'O'), (3, 25.0, 'F')")
    // the reference's v_order_summary shape, as a PERSISTENT named view
    spark.sql("CREATE VIEW gcat.views.v_order_summary AS " +
      "SELECT o_orderstatus, sum(o_totalprice) AS total " +
      "FROM gcat.views.orders GROUP BY o_orderstatus")
    def totals = spark.sql(
      "SELECT o_orderstatus, total FROM gcat.views.v_order_summary ORDER BY 1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    assert(totals == Seq("F" -> 125.0, "O" -> 50.0))
    // DATA-LIVE: new rows show through the stored definition
    spark.sql("INSERT INTO gcat.views.orders VALUES (4, 75.0, 'O')")
    assert(totals == Seq("F" -> 125.0, "O" -> 125.0))
    // nested view over the view
    spark.sql("CREATE VIEW gcat.views.v_big AS " +
      "SELECT * FROM gcat.views.v_order_summary WHERE total > 100.0")
    assert(spark.sql("SELECT count(*) FROM gcat.views.v_big").head().getLong(0) == 2L)
    // discovery + cross-"session" visibility (second catalog, same root)
    assert(spark.sql("SHOW GRAFT VIEWS IN gcat.views").collect()
      .map(_.getString(1)).toSeq == Seq("v_big", "v_order_summary"))
    assert(spark.sql("SELECT count(*) FROM gcat2.views.v_order_summary")
      .head().getLong(0) == 2L)
    // duplicate create refuses; OR REPLACE redefines
    assert(intercept[Exception] {
      spark.sql("CREATE VIEW gcat.views.v_big AS SELECT 1 AS one")
    }.getMessage.contains("already exists"))
    spark.sql("CREATE OR REPLACE VIEW gcat.views.v_big AS " +
      "SELECT * FROM gcat.views.v_order_summary WHERE total > 1000.0")
    assert(spark.sql("SELECT count(*) FROM gcat.views.v_big").head().getLong(0) == 0L)
    // an unresolvable definition refuses at CREATE, not first read
    assert(intercept[Exception] {
      spark.sql("CREATE VIEW gcat.views.v_bad AS SELECT * FROM gcat.views.nope")
    }.getMessage.toLowerCase.contains("table or view"))
    // a definition CYCLE is a named error at read, not an analyzer loop
    spark.sql("CREATE VIEW gcat.views.v_a AS SELECT * FROM gcat.views.orders")
    spark.sql("CREATE VIEW gcat.views.v_b AS SELECT * FROM gcat.views.v_a")
    spark.sql("CREATE OR REPLACE VIEW gcat.views.v_a AS SELECT * FROM gcat.views.v_b")
    assert(intercept[Exception] {
      spark.sql("SELECT * FROM gcat.views.v_a").collect()
    }.getMessage.contains("recursive view"))
    // DROP + IF EXISTS; a view never shadows a table
    spark.sql("DROP VIEW gcat.views.v_big")
    spark.sql("DROP VIEW IF EXISTS gcat.views.v_big")
    assert(intercept[Exception] {
      spark.sql("DROP VIEW gcat.views.v_big")
    }.getMessage.contains("does not exist"))
    assert(intercept[Exception] {
      spark.sql("CREATE VIEW gcat.views.orders AS SELECT 1 AS one")
    }.getMessage.contains("TABLE"))
    // vanilla 3-part session view statements still belong to Spark
    spark.sql("CREATE VIEW spark_catalog.default.gcat_vanilla AS SELECT 7 AS seven")
    assert(spark.sql("SELECT seven FROM default.gcat_vanilla").head().getInt(0) == 7)
    spark.sql("DROP VIEW spark_catalog.default.gcat_vanilla")
  }

  test("named reads prune files and auto-broadcast like the path form") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.perf")
    val factDir = java.nio.file.Files.createTempDirectory("gcat_fact")
      .toFile.getAbsolutePath + "/fact"
    val clustered = (1L to 4000L).map(k => (k, k % 7, s"p$k")).toDF("k", "g", "s")
      .repartitionByRange(8, col("k"))
    graft.sinks.TableLog.append(spark, factDir, clustered, statsCols = Seq("k"))
    spark.sql(s"CREATE TABLE gcat.perf.fact USING graft LOCATION '$factDir'")
    GraftTableSource.lastPrune = None
    val n = spark.sql("SELECT count(*) FROM gcat.perf.fact WHERE k BETWEEN 100 AND 200")
      .head().getLong(0)
    assert(n == 101L)
    val (read, total) = GraftTableSource.lastPrune.get
    assert(read < total,
      s"the named read must prune via manifest stats: $read/$total")
    // manifest byte stats flow through SupportsReportStatistics → the
    // small named table broadcasts in a join without a hint
    val big = spark.range(100000).select(col("id").as("k"), (col("id") % 7).as("gg"))
    val joined = big.join(spark.table("gcat.perf.fact"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a small named graft table must auto-broadcast:\n$plan")
    assert(joined.count() == 4000L)
  }

  test("CTAS onto a non-empty LOCATION refuses; plain CREATE adopts; empty LOCATION works") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ctas")
    val extDir = java.nio.file.Files.createTempDirectory("gcat_ctas")
      .toFile.getAbsolutePath + "/t"
    graft.sinks.TableLog.append(spark, extDir,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"))
    // CTAS would APPEND the query result into the adopted table —
    // old-union-new is never what AS SELECT means; it must refuse
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE gcat.ctas.bad USING graft LOCATION '$extDir' " +
        "AS SELECT CAST(5 AS BIGINT) AS k, 9.0 AS v")
    }
    assert(e.getMessage.contains("AS SELECT"), e.getMessage)
    // the refusal happened BEFORE registration — no entry left behind
    assert(spark.sql("SHOW TABLES IN gcat.ctas").count() == 0L)
    // and the existing table is untouched
    assert(graft.sinks.TableLog.readAt(spark, extDir).count() == 2L)
    // plain CREATE (no AS SELECT) still adopts — registration only
    spark.sql(s"CREATE TABLE gcat.ctas.ok USING graft LOCATION '$extDir'")
    assert(spark.sql("SELECT count(*) FROM gcat.ctas.ok").head().getLong(0) == 2L)
    // CTAS onto an EMPTY location is the legitimate create-with-data
    val freshDir = java.nio.file.Files.createTempDirectory("gcat_ctas_f")
      .toFile.getAbsolutePath + "/t"
    spark.sql(s"CREATE TABLE gcat.ctas.fresh USING graft LOCATION '$freshDir' " +
      "AS SELECT CAST(7 AS BIGINT) AS k, 2.0 AS v")
    assert(spark.sql("SELECT k FROM gcat.ctas.fresh").head().getLong(0) == 7L)
  }

  test("REPLACE TABLE AS SELECT: success replaces; a FAILED replace restores the original") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.rtas")
    spark.sql("CREATE TABLE gcat.rtas.t USING graft AS " +
      "SELECT CAST(1 AS BIGINT) AS k, 'orig' AS s")
    // success path: the new table fully replaces the old
    spark.sql("REPLACE TABLE gcat.rtas.t USING graft AS " +
      "SELECT CAST(2 AS BIGINT) AS k, 'next' AS s")
    assert(spark.sql("SELECT k, s FROM gcat.rtas.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "next")))
    // failure path: the AS SELECT dies at execution — the original
    // table must come back intact, not be destroyed (the staging seam's
    // whole point); the failing write aborts the staged create
    intercept[Exception] {
      spark.sql("REPLACE TABLE gcat.rtas.t USING graft AS " +
        "SELECT CAST(3 AS BIGINT) AS k, " +
        "CASE WHEN assert_true(false) IS NULL THEN 'boom' END AS s")
    }
    assert(spark.sql("SELECT k, s FROM gcat.rtas.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "next")),
      "a failed REPLACE must restore the original table")
    // refusal path (pre-rename): an UNSUPPORTED transform refuses and
    // the original is untouched (bucket/days are accepted since r18)
    intercept[Exception] {
      spark.sql("REPLACE TABLE gcat.rtas.t USING graft " +
        "PARTITIONED BY (zorder(k)) AS SELECT CAST(4 AS BIGINT) AS k, 'x' AS s")
    }
    assert(spark.sql("SELECT count(*) FROM gcat.rtas.t").head().getLong(0) == 1L)
    // no _replacing_ backup litter survives either outcome
    assert(spark.sql("SHOW TABLES IN gcat.rtas").count() == 1L)
  }

  test("RTAS crash recovery: an aged orphan backup restores the vanished table; committed litter sweeps") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.connector.expressions.Transform
    import org.apache.spark.sql.types._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.crash")
    spark.sql("CREATE TABLE gcat.crash.t USING graft AS " +
      "SELECT CAST(1 AS BIGINT) AS k, 'orig' AS s")
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array("crash"), "t")
    val schema = new StructType().add("k", LongType).add("s", StringType)
    // CRASH MID-WRITE: stage the replace (rename-aside + staged
    // create), then abandon it — no commit, no abort. The staged entry
    // sits at the table path with the staged marker; the real bytes
    // are in the _replacing_* backup.
    cat.stageReplace(ident, schema, Array.empty[Transform],
      new java.util.HashMap[String, String]())
    val f = cat.fs(new Path(root))
    def backups() = f.listStatus(new Path(s"$root/crash"))
      .map(_.getPath.getName).filter(_.startsWith("_replacing_")).toSeq
    assert(backups().nonEmpty, "the backup must exist after staging")
    // inside the grace window NOTHING recovers — an in-flight RTAS
    // must never be rolled back by a concurrent listing
    assert(spark.sql("SHOW TABLES IN gcat.crash").count() == 1L)
    assert(backups().nonEmpty, "young backups are untouchable")
    // age past the grace: the next listing rolls the crash back —
    // staged entry dropped, original restored, no litter
    val saved = graft.sinks.TableLog.clockMs
    var offset = GraftCatalog.replacingGraceMs + 1000L
    try {
      graft.sinks.TableLog.clockMs = () => System.currentTimeMillis() + offset
      assert(spark.sql("SHOW TABLES IN gcat.crash").collect()
        .map(_.getString(1)).toSeq == Seq("t"))
      assert(spark.sql("SELECT k, s FROM gcat.crash.t").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "orig")),
        "the vanished table must reappear with its original rows")
      assert(backups().isEmpty, "recovery must leave no backup litter")
      // COMMITTED-BUT-UNCLEANED: simulate a crash after the commit
      // point (marker deleted) but before backup cleanup — recovery
      // must SWEEP the backup and keep the new table
      val staged2 = cat.stageReplace(ident, schema, Array.empty[Transform],
        new java.util.HashMap[String, String]())
      spark.sql("INSERT INTO gcat.crash.t VALUES (9, 'next')")
      f.delete(new Path(s"$root/crash/t/_gcat_staged"), false) // commit point
      assert(backups().nonEmpty)
      offset += GraftCatalog.replacingGraceMs + 1000L // age the 2nd backup
      assert(spark.sql("SHOW TABLES IN gcat.crash").count() == 1L)
      assert(backups().isEmpty, "a committed replace's backup is litter — swept")
      assert(spark.sql("SELECT k, s FROM gcat.crash.t").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((9L, "next")),
        "a committed replace must never be rolled back")
      staged2 // keep the reference alive; never committed nor aborted
    } finally graft.sinks.TableLog.clockMs = saved
    // SUCCESS PATH leaves no litter and no stray markers
    spark.sql("REPLACE TABLE gcat.crash.t USING graft AS " +
      "SELECT CAST(5 AS BIGINT) AS k, 'clean' AS s")
    assert(backups().isEmpty)
    assert(!f.exists(new Path(s"$root/crash/t/_gcat_staged")))
    assert(!f.exists(new Path(s"$root/crash/t/_replacing_since")))
    assert(spark.sql("SELECT s FROM gcat.crash.t").head().getString(0) == "clean")
  }

  test("RTAS crash litter: a bare entry dir without the marker RESTORES the backup") {
    // round 18 (ADVICE-high): pre-fix, createTable's mkdirs + empty-v1
    // commit ran BEFORE the staged marker landed, so a crash in that
    // window left the entry present WITHOUT the marker — the exact
    // shape recovery read as "committed replace", and it deleted the
    // backup: permanent silent loss of the original rows. The marker
    // now lands first, and the one remaining instant (dir made, marker
    // not yet) is classified on the recovery side: entry-without-marker
    // counts as committed ONLY when the entry is a real table dir.
    // This test plants that exact crash state by hand.
    import org.apache.hadoop.fs.Path
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.crash2")
    spark.sql("CREATE TABLE gcat.crash2.t USING graft AS " +
      "SELECT CAST(1 AS BIGINT) AS k, 'orig' AS s")
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[GraftCatalog]
    val f = cat.fs(new Path(root))
    val entry = new Path(s"$root/crash2/t")
    val backup = new Path(s"$root/crash2/_replacing_t_deadbeef")
    // exactly stageReplace's on-disk prologue: stamp into the live
    // entry, rename it aside, then the crash instant — a bare mkdirs
    // with NO marker and NO table content
    val out = f.create(new Path(entry, "_replacing_since"), true)
    try out.write(graft.sinks.TableLog.clockMs().toString.getBytes("UTF-8"))
    finally out.close()
    assert(f.rename(entry, backup))
    f.mkdirs(entry)
    def backups() = f.listStatus(new Path(s"$root/crash2"))
      .map(_.getPath.getName).filter(_.startsWith("_replacing_")).toSeq
    val saved = graft.sinks.TableLog.clockMs
    try {
      graft.sinks.TableLog.clockMs =
        () => System.currentTimeMillis() + GraftCatalog.replacingGraceMs + 1000L
      // the aged listing must treat the bare dir as crash litter and
      // RESTORE — sweeping here is the data-loss direction
      assert(spark.sql("SHOW TABLES IN gcat.crash2").collect()
        .map(_.getString(1)).toSeq == Seq("t"))
      assert(spark.sql("SELECT k, s FROM gcat.crash2.t").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "orig")),
        "the original rows must survive the pre-marker crash window")
      assert(backups().isEmpty, "the restored backup leaves no litter")
    } finally graft.sinks.TableLog.clockMs = saved
  }

  test("GENERATED ALWAYS AS: NULL computes, wrong value refuses, composes with PARTITIONED BY") {
    // round 18 (verdict What's-missing #2, Delta's public generated-
    // column rules): a NULL arriving in the generated column means
    // "not provided" and is computed from the expression on every
    // write path; a non-NULL explicit value must MATCH or the write
    // refuses through the auto-declared `_gen_<col>` CHECK; the column
    // is a real stored column (stats harvested, identity-partitionable)
    // — the derive-a-date-for-pruning pattern end to end.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.gen")
    spark.sql("CREATE TABLE gcat.gen.ev (id BIGINT, ts TIMESTAMP_NTZ, " +
      "d DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) USING graft " +
      "PARTITIONED BY (d)")
    val dir = s"$root/gen/ev"
    val props = graft.sinks.TableLog.tablePropertiesAt(spark, dir)
    assert(props.contains("graft.generated.cols"))
    assert(props.get("graft.stats.cols").exists(_.split(",").contains("d")))
    // NULL → computed
    spark.sql("INSERT INTO gcat.gen.ev VALUES " +
      "(1, TIMESTAMP_NTZ'2026-02-03 10:30:00', NULL), " +
      "(2, TIMESTAMP_NTZ'2026-02-04 23:59:00', NULL)")
    // explicit CORRECT value passes untouched
    spark.sql("INSERT INTO gcat.gen.ev VALUES " +
      "(3, TIMESTAMP_NTZ'2026-02-05 01:00:00', DATE'2026-02-05')")
    assert(spark.sql("SELECT d FROM gcat.gen.ev ORDER BY id").collect()
      .map(_.getDate(0).toString).toSeq ==
      Seq("2026-02-03", "2026-02-04", "2026-02-05"))
    // explicit WRONG value refuses, naming the generated-column check
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcat.gen.ev VALUES " +
        "(4, TIMESTAMP_NTZ'2026-02-06 12:00:00', DATE'1999-01-01')")
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("_gen_d"), s"refusal must name the check: ${e.getMessage}")
    assert(spark.sql("SELECT count(*) FROM gcat.gen.ev").head().getLong(0) == 3L,
      "a refused insert must commit nothing")
    // the generated column prunes like any stored column: per-insert
    // files carry tight d stats (PARTITIONED BY d clusters on it)
    val pr = graft.sinks.TableLog.scanWhere(spark, dir,
      col("d") === lit("2026-02-04").cast("date"))
    assert(pr.filesRead < pr.filesTotal,
      s"generated-column predicate must prune (${pr.filesRead}/${pr.filesTotal})")
    assert(pr.df.count() == 1L)
    // direct-path writers (no catalog in sight) hit the same contract:
    // the commit-time fill computes, the check refuses divergence
    import spark.implicits._
    graft.sinks.TableLog.append(spark, dir,
      Seq((9L, java.time.LocalDateTime.of(2026, 3, 1, 8, 0), null))
        .toDF("id", "ts", "d").select(col("id"), col("ts"),
          col("d").cast("date")))
    assert(spark.sql("SELECT d FROM gcat.gen.ev WHERE id = 9").head()
      .getDate(0).toString == "2026-03-01")
  }

  test("CLUSTER BY: liquid-clustering DDL maps to the layout, ALTER re-points it") {
    // round 18: Spark 4's CLUSTER BY (Delta liquid clustering syntax)
    // is the native fit — this catalog's "partitioning" IS clustering.
    // CREATE lands cluster+stats cols; inserts cluster on write; ALTER
    // CLUSTER BY re-points the declared layout; DESCRIBE round-trips.
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.liq")
    spark.sql("CREATE TABLE gcat.liq.t (k BIGINT, v DOUBLE, s STRING) " +
      "USING graft CLUSTER BY (k, v)")
    val dir = s"$root/liq/t"
    val props = graft.sinks.TableLog.tablePropertiesAt(spark, dir)
    assert(props.get("graft.cluster.cols").contains("k,v"))
    assert(props.get("graft.stats.cols").exists { s =>
      val cs = s.split(","); cs.contains("k") && cs.contains("v") })
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[GraftCatalog]
    val parts = cat.loadTable(Identifier.of(Array("liq"), "t"))
      .partitioning().map(_.describe()).toSeq
    assert(parts.length == 1 && parts.head.contains("k") &&
      parts.head.contains("v"), parts.toString)
    // inserts cluster on the declared columns (tight per-file stats)
    val savedSp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      (0 until 1024).map(i => (i.toLong, i / 10.0, s"s$i"))
        .toDF("k", "v", "s").createOrReplaceTempView("liq_src")
      spark.sql("INSERT INTO gcat.liq.t SELECT * FROM liq_src")
    } finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", savedSp)
    }
    val pr = graft.sinks.TableLog.scanWhere(spark, dir,
      col("k") >= 100L && col("k") < 200L)
    assert(pr.filesRead < pr.filesTotal,
      s"CLUSTER BY layout must prune (${pr.filesRead}/${pr.filesTotal})")
    // ALTER re-points; NONE clears
    spark.sql("ALTER TABLE gcat.liq.t CLUSTER BY (s)")
    assert(graft.sinks.TableLog.tablePropertiesAt(spark, dir)
      .get("graft.cluster.cols").contains("s"))
    spark.sql("ALTER TABLE gcat.liq.t CLUSTER BY NONE")
    assert(!graft.sinks.TableLog.tablePropertiesAt(spark, dir)
      .contains("graft.cluster.cols"))
    // combining CLUSTER BY with PARTITIONED BY refuses
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.liq.bad (k BIGINT, r STRING) USING graft " +
        "PARTITIONED BY (r) CLUSTER BY (k)")
    }
    assert(e.getMessage != null)
  }

  test("IDENTITY columns: unique ascending fill, high-water mark persists, ALWAYS refuses explicit") {
    // round 18 (Delta's documented identity semantics): NULLs mint
    // `next + step × monotonically_increasing_id()` — unique and
    // ascending, SPARSE by contract (uniqueness + direction, never
    // contiguity); the high-water mark advances from the commit's own
    // harvested footer max (zero extra passes) and survives sessions
    // as a property; GENERATED ALWAYS refuses explicit values through
    // the codegen'd raise channel; BY DEFAULT accepts them and a high
    // explicit value RAISES the mark so later fills stay above it.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ident")
    spark.sql("CREATE TABLE gcat.ident.t (id BIGINT GENERATED ALWAYS AS " +
      "IDENTITY, s STRING) USING graft")
    val dir = s"$root/ident/t"
    assert(graft.sinks.TableLog.tablePropertiesAt(spark, dir)
      .get("graft.identity.cols").contains("id:1:1:false"))
    spark.sql("INSERT INTO gcat.ident.t (s) VALUES ('a'), ('b'), ('c')")
    val batch1 = spark.sql("SELECT id FROM gcat.ident.t")
      .collect().map(_.getLong(0)).toSeq
    assert(batch1.distinct.length == 3 && batch1.min >= 1L,
      s"identities must be unique and >= start: $batch1")
    // the next batch's values sit strictly ABOVE the first batch's
    spark.sql("INSERT INTO gcat.ident.t (s) VALUES ('d'), ('e')")
    val batch2 = spark.sql("SELECT id FROM gcat.ident.t").collect()
      .map(_.getLong(0)).toSeq.diff(batch1)
    assert(batch2.length == 2 && batch2.min > batch1.max,
      s"later batches must mint above the mark: $batch1 then $batch2")
    assert(graft.sinks.TableLog.tablePropertiesAt(spark, dir)
      .get("graft.identity.high.id").exists(_.toLong == batch2.max))
    // ALWAYS refuses an explicit value, loudly, committing nothing
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcat.ident.t VALUES (999, 'x')")
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("GENERATED ALWAYS"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM gcat.ident.t").head().getLong(0) == 5L)
    // MERGE: inserted rows mint identities, matched rows keep theirs
    // (merge's batch mixes carried and new rows, so the fill applies
    // and ALWAYS-refusal does not — the documented merge contract)
    val pre = spark.sql("SELECT id, s FROM gcat.ident.t").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    import spark.implicits._
    graft.sinks.TableLog.mergeInto(spark, dir,
      Seq(("a", "A2"), ("zz", "Z1")).toDF("s", "s2")
        .select(lit(null).cast("bigint").as("id"), col("s2").as("s"),
          col("s").as("_match")).drop("_match"),
      keys = Seq("s"))
    // (merge keyed on s: 'A2'/'Z1' are new keys → inserts minting ids)
    val post = spark.sql("SELECT id, s FROM gcat.ident.t").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    pre.foreach { case (s, id) => assert(post(s) == id,
      s"merge must carry existing identities verbatim ($s)") }
    assert(post.contains("A2") && post.contains("Z1"))
    assert(Seq(post("A2"), post("Z1")).forall(_ > pre.values.max),
      s"merge-inserted rows must mint above the mark: $post")
    assert(post.values.toSeq.distinct.length == post.size,
      "identities stay unique through merge")
    // BY DEFAULT accepts explicit values; a high one raises the mark
    spark.sql("CREATE TABLE gcat.ident.d (id BIGINT GENERATED BY DEFAULT " +
      "AS IDENTITY (START WITH 100 INCREMENT BY 10), s STRING) USING graft")
    spark.sql("INSERT INTO gcat.ident.d VALUES (5000, 'big')")
    spark.sql("INSERT INTO gcat.ident.d (s) VALUES ('auto')")
    val dRows = spark.sql("SELECT id, s FROM gcat.ident.d").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap.map(_.swap)
    assert(dRows("big") == 5000L)
    assert(dRows("auto") > 5000L,
      s"fill after a high explicit value must mint above it: $dRows")
    // SYNC IDENTITY re-derives the mark from the manifest (the
    // recovery statement after RESTORE/CONVERT/hand-edited properties):
    // sabotage the mark low, sync, and the next fill still mints above
    // every live value
    val dDir = s"$root/ident/d"
    graft.sinks.TableLog.setTableProperties(spark, dDir,
      Map("graft.identity.high.id" -> "1"))
    val synced = spark.sql("ALTER TABLE gcat.ident.d SYNC IDENTITY").collect()
    assert(synced.length == 1 && !synced.head.isNullAt(0),
      "sync must commit a corrected mark")
    assert(graft.sinks.TableLog.tablePropertiesAt(spark, dDir)
      .get("graft.identity.high.id").exists(_.toLong >= 5000L))
    spark.sql("INSERT INTO gcat.ident.d (s) VALUES ('post-sync')")
    val postSync = spark.sql("SELECT id FROM gcat.ident.d WHERE s = 'post-sync'")
      .head().getLong(0)
    assert(postSync > 5000L,
      s"post-sync fill must mint above the re-derived mark, got $postSync")
    // a second sync with nothing to fix is a no-op (NULL version)
    assert(spark.sql("ALTER TABLE gcat.ident.d SYNC IDENTITY")
      .head().isNullAt(0))
  }

  test("column DEFAULTs: missing INSERT columns and the DEFAULT keyword fill; values materialize") {
    // round 18: the default's SQL text rides Spark's own field-metadata
    // keys, so the analyzer pads missing columns / DEFAULT keywords
    // itself and the values land MATERIALIZED in the files — no
    // read-side machinery, time travel sees exactly what was written.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dflt")
    spark.sql("CREATE TABLE gcat.dflt.t (id BIGINT, " +
      "status STRING DEFAULT 'open', score DOUBLE DEFAULT 1.5) USING graft")
    spark.sql("INSERT INTO gcat.dflt.t (id) VALUES (1)")
    spark.sql("INSERT INTO gcat.dflt.t VALUES (2, DEFAULT, 9.0)")
    spark.sql("INSERT INTO gcat.dflt.t VALUES (3, 'closed', DEFAULT)")
    val got = spark.sql("SELECT id, status, score FROM gcat.dflt.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "open", 1.5), (2L, "open", 9.0), (3L, "closed", 1.5)),
      got.toString)
    // the values are IN the files (materialized), not conjured at read
    val dir = s"$root/dflt/t"
    val raw = spark.read.parquet(
      graft.sinks.TableLog.readAt(spark, dir).select(input_file_name())
        .distinct().collect().map(_.getString(0).stripPrefix("file:")).toSeq: _*)
    assert(raw.filter(col("status") === "open").count() == 2L)
  }

  test("recovery fast path: a clean namespace sweeps once per memo window, not per listing") {
    // round 18 (verdict watch-only): recovery used to re-list the
    // namespace and read a stamp per backup on EVERY listing; a clean
    // namespace now memoizes for a window, and this instance's own
    // stageReplace invalidates it
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.fast")
    spark.sql("CREATE TABLE gcat.fast.t USING graft AS SELECT CAST(1 AS BIGINT) AS k")
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[GraftCatalog]
    spark.sql("SHOW TABLES IN gcat.fast").collect()
    val memoized = cat.recoverySweeps.get()
    spark.sql("SHOW TABLES IN gcat.fast").collect()
    spark.sql("SHOW TABLES IN gcat.fast").collect()
    assert(cat.recoverySweeps.get() == memoized,
      "a memoized clean namespace must not re-list on every SHOW TABLES")
    // a replace stages real litter (the backup) — the memo must fall
    spark.sql("REPLACE TABLE gcat.fast.t USING graft AS SELECT CAST(2 AS BIGINT) AS k")
    val afterReplace = cat.recoverySweeps.get()
    spark.sql("SHOW TABLES IN gcat.fast").collect()
    assert(cat.recoverySweeps.get() > afterReplace,
      "stageReplace must invalidate the no-litter memo")
    assert(spark.sql("SELECT k FROM gcat.fast.t").head().getLong(0) == 2L)
  }

  test("PARTITIONED BY identity maps to the clustering layout; transforms refuse") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.part")
    spark.sql("CREATE TABLE gcat.part.t (k BIGINT, region STRING) USING graft " +
      "PARTITIONED BY (region)")
    val props = graft.sinks.TableLog.tablePropertiesAt(spark, s"$root/part/t")
    assert(props.get("graft.cluster.cols").contains("region"))
    assert(props.get("graft.stats.cols").exists(_.split(",").contains("region")))
    spark.sql("INSERT INTO gcat.part.t VALUES (1, 'eu'), (2, 'us'), (3, 'eu')")
    assert(spark.sql("SELECT count(*) FROM gcat.part.t WHERE region = 'eu'")
      .head().getLong(0) == 2L)
    // an UNKNOWN transform still refuses loudly (the supported set is
    // identity + years/months/days/hours + truncate + bucket)
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.part.b (k BIGINT) USING graft " +
        "PARTITIONED BY (zorder(k))")
    }
    assert(e.getMessage.contains("not supported"), e.getMessage)
    // a conflicting explicit clustering declaration refuses too
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.part.c (k BIGINT, r STRING) USING graft " +
        "PARTITIONED BY (r) TBLPROPERTIES ('graft.cluster.cols'='k')")
    }
    assert(e2.getMessage.contains("conflicts"), e2.getMessage)
  }

  test("PARTITIONED BY transforms: hidden partitioning clusters on write and prunes raw-column predicates") {
    // round 18: days(ts) + bucket(n, id) — the Iceberg hidden-
    // partitioning DDL shapes — map onto the clustering layout: the
    // SOURCE columns become cluster+stats cols (monotone transforms
    // prune through raw min/max), bucket adds a bloom, the declared
    // spec round-trips through partitioning(), and every INSERT
    // range-clusters its batch so files are tight boxes from commit 1.
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.hp")
    spark.sql("CREATE TABLE gcat.hp.ev (id BIGINT, ts TIMESTAMP_NTZ, v DOUBLE) " +
      "USING graft PARTITIONED BY (days(ts), bucket(16, id))")
    val dir = s"$root/hp/ev"
    val props = graft.sinks.TableLog.tablePropertiesAt(spark, dir)
    assert(props.get("graft.cluster.cols").contains("ts,id"))
    assert(props.get("graft.stats.cols").exists { s =>
      val cs = s.split(","); cs.contains("ts") && cs.contains("id") })
    assert(props.get("graft.bloom.cols").exists(_.split(",").contains("id")),
      "bucket(n, id) must declare a bloom on id for point-lookup pruning")
    assert(props.get("graft.partition.transforms")
      .contains("days(ts),bucket(16, id)"))
    // the DDL intent survives to DESCRIBE: partitioning() round-trips
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[GraftCatalog]
    val parts = cat.loadTable(Identifier.of(Array("hp"), "ev"))
      .partitioning().map(_.describe()).toSeq
    assert(parts == Seq("days(ts)", "bucket(16, ts)") ||
      parts == Seq("days(ts)", "bucket(16, id)"), parts.toString)
    // ONE shuffled 32-day INSERT: cluster-on-write must land day-tight
    // files (AQE coalescing off so the range exchange keeps fan-out —
    // at test scale everything fits one partition otherwise)
    (0 until 2048).map { i =>
      (i.toLong, java.time.LocalDateTime.of(2026, 1, 1 + (i * 131 % 31), i % 24, 0),
        i / 100.0)
    }.toDF("id", "ts", "v").createOrReplaceTempView("hp_src")
    val savedSp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try spark.sql("INSERT INTO gcat.hp.ev SELECT id, ts, v FROM hp_src")
    finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", savedSp)
    }
    val pr = graft.sinks.TableLog.scanWhere(spark, dir,
      col("ts") >= lit("2026-01-10 00:00:00").cast("timestamp_ntz") &&
        col("ts") < lit("2026-01-12 00:00:00").cast("timestamp_ntz"))
    assert(pr.filesTotal >= 8,
      s"the clustered INSERT must fan out to many files, got ${pr.filesTotal}")
    assert(pr.filesRead * 4 <= pr.filesTotal,
      s"a 2-of-31-day box must prune most files (${pr.filesRead}/${pr.filesTotal})")
    // correctness on the raw column — the whole point of hidden
    // partitioning is that queries never mention the transform
    assert(spark.sql("SELECT count(*) FROM gcat.hp.ev " +
      "WHERE ts >= TIMESTAMP_NTZ'2026-01-10 00:00:00' " +
      "AND ts < TIMESTAMP_NTZ'2026-01-12 00:00:00'").head().getLong(0) ==
      (0 until 2048).count(i => { val d = 1 + (i * 131 % 31); d == 10 || d == 11 }))
    // bucket's point-lookup contract: equality on id is exact
    assert(spark.sql("SELECT v FROM gcat.hp.ev WHERE id = 777").head()
      .getDouble(0) == 7.77)
  }

  test("repeated named-table reads resolve the snapshot ONCE (cache, not re-parse)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.cache")
    spark.sql("CREATE TABLE gcat.cache.t (k BIGINT, v DOUBLE) USING graft")
    spark.sql("INSERT INTO gcat.cache.t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    graft.sinks.TableLog.snapshotCacheClear()
    assert(spark.sql("SELECT sum(v) FROM gcat.cache.t").head().getDouble(0) == 6.0)
    val folds = graft.sinks.TableLog.snapshotFolds.get()
    assert(folds >= 1L)
    // the dashboard shape: N more queries against the same version —
    // the manifest state must come from the (dir, version) memo, never
    // a re-fold; only the names-only currentVersion listing repeats
    (1 to 5).foreach { _ =>
      assert(spark.sql("SELECT count(*) FROM gcat.cache.t").head().getLong(0) == 3L)
    }
    assert(graft.sinks.TableLog.snapshotFolds.get() == folds,
      "repeated reads of one table version must not re-fold the manifest")
    // a write moves the head: exactly the next read folds, then memoizes
    spark.sql("INSERT INTO gcat.cache.t VALUES (4, 4.0)")
    val f2 = graft.sinks.TableLog.snapshotFolds.get()
    assert(spark.sql("SELECT count(*) FROM gcat.cache.t").head().getLong(0) == 4L)
    assert(spark.sql("SELECT count(*) FROM gcat.cache.t").head().getLong(0) == 4L)
    assert(graft.sinks.TableLog.snapshotFolds.get() > f2,
      "a new version folds once")
  }

  test("view names resolve case-insensitively (identifier semantics)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ci")
    spark.sql("CREATE TABLE gcat.ci.base (k BIGINT) USING graft")
    spark.sql("INSERT INTO gcat.ci.base VALUES (1), (2)")
    spark.sql("CREATE VIEW gcat.ci.V_Mixed AS SELECT k FROM gcat.ci.base")
    // every case form of catalog and view name reads the one view
    assert(spark.sql("SELECT count(*) FROM gcat.ci.v_mixed").head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM gcat.ci.V_MIXED").head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM GCAT.ci.V_Mixed").head().getLong(0) == 2L)
    // CREATE under one case, DROP under another — one object
    spark.sql("DROP VIEW gcat.ci.v_MIXED")
    intercept[Exception] {
      spark.sql("DROP VIEW gcat.ci.v_mixed")
    }
  }
}
