package graft.sinks

import java.nio.file.Files
import java.sql.Timestamp
import java.util.Properties

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-trips the JDBC warehouse layer against embedded Derby (the JDBC
  * engine shipped with Spark) — the moral equivalent of the reference's
  * SQLite tests (`db_loader.py` defaults to sqlite).
  */
class JdbcWarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val dbDir = Files.createTempDirectory("graft-derby").toFile.getAbsolutePath
  private val url = s"jdbc:derby:$dbDir/wh;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("load append/replace round-trips through JDBC") {
    val df = Seq((1L, "alice", 10.0), (2L, "bob", 20.0)).toDF("id", "name", "bal")
    JdbcWarehouse.load(df, url, "customers", SaveMode.Overwrite, batchSize = 1, props = props)
    assert(JdbcWarehouse.read(spark, url, "customers", props).count() == 2)

    JdbcWarehouse.load(Seq((3L, "carol", 30.0)).toDF("id", "name", "bal"),
      url, "customers", SaveMode.Append, props = props)
    val back = JdbcWarehouse.read(spark, url, "customers", props)
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "alice"), (2L, "bob"), (3L, "carol")))

    // replace drops the old contents
    JdbcWarehouse.load(Seq((9L, "zed", 0.0)).toDF("id", "name", "bal"),
      url, "customers", SaveMode.Overwrite, props = props)
    assert(JdbcWarehouse.read(spark, url, "customers", props).count() == 1)
  }

  test("partitioned read-back splits the key range") {
    val df = (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
    JdbcWarehouse.load(df, url, "dim_big", SaveMode.Overwrite, props = props)
    val back = JdbcWarehouse.readPartitioned(spark, url, "dim_big", "id", 1L, 100L, 4, props)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
  }

  test("upsert: updates win by version, new keys insert, swap leaves one table") {
    val t0 = new Timestamp(1700000000000L)
    val cur = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "version")
    JdbcWarehouse.upsert(spark, url, "state", cur, Seq("k"), "version", props = props)

    val upd = Seq((2L, "b2", 2L), (3L, "c", 1L)).toDF("k", "v", "version")
    JdbcWarehouse.upsert(spark, url, "state", upd, Seq("k"), "version", props = props)

    val out = JdbcWarehouse.read(spark, url, "state", props)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    assert(!JdbcWarehouse.tableExists(url, "state_staging", props),
      "staging table must not survive the swap")
    assert(t0.getTime > 0) // silence unused warning paranoia
  }

  test("withLoadMetadata stamps updated_at always, created_at only if absent") {
    val ts = new Timestamp(1700000000000L)
    val fresh = JdbcWarehouse.withLoadMetadata(Seq((1L, "x")).toDF("id", "v"), ts)
    assert(fresh.columns.toSet == Set("id", "v", "updated_at", "created_at"))

    val older = new Timestamp(1600000000000L)
    val seeded = Seq((1L, "x", older)).toDF("id", "v", "created_at")
    val restamped = JdbcWarehouse.withLoadMetadata(seeded, ts)
    val row = restamped.select(col("created_at"), col("updated_at")).head()
    assert(row.getTimestamp(0) == older, "existing created_at preserved")
    assert(row.getTimestamp(1) == ts)
  }

  test("projectToTable filters to the target's columns, case-insensitively") {
    JdbcWarehouse.load(Seq((1L, "a")).toDF("id", "name"), url, "narrow",
      SaveMode.Overwrite, props = props)
    val wide = Seq((2L, "b", 99.9)).toDF("ID", "name", "extra_col")
    val projected = JdbcWarehouse.projectToTable(spark, wide, url, "narrow", props)
    assert(projected.columns.toSet == Set("ID", "name"))
  }

  test("initializeSchema bootstraps DDL (tables, PK, indexes) before any load") {
    import org.apache.spark.sql.types._
    val freshDir = Files.createTempDirectory("graft-derby-boot").toFile.getAbsolutePath
    val freshUrl = s"jdbc:derby:$freshDir/wh;create=true"
    val dim = JdbcWarehouse.TableDef("dim_customer",
      StructType(Seq(
        StructField("c_id", LongType, nullable = false),
        StructField("c_name", StringType),
        StructField("c_bal", DecimalType(12, 2)),
        StructField("c_since", TimestampType))),
      primaryKey = Seq("c_id"),
      indexes = Seq(Seq("c_name")))

    // empty warehouse → both tables created, once
    val created = JdbcWarehouse.initializeSchema(freshUrl,
      Seq(dim, JdbcWarehouse.EtlRunsDef), props)
    assert(created == Seq("dim_customer", "etl_runs"))
    assert(JdbcWarehouse.tableExists(freshUrl, "dim_customer", props))
    assert(JdbcWarehouse.tableExists(freshUrl, "etl_runs", props))
    // idempotent: second call touches nothing
    assert(JdbcWarehouse.initializeSchema(freshUrl,
      Seq(dim, JdbcWarehouse.EtlRunsDef), props).isEmpty)

    // loads APPEND into the bootstrapped DDL (no implicit CREATE), and the
    // declared types round-trip
    val rows = Seq((1L, "alice", BigDecimal("10.50"), new Timestamp(1700000000000L)))
      .toDF("c_id", "c_name", "c_bal", "c_since")
    JdbcWarehouse.load(rows, freshUrl, "dim_customer", SaveMode.Append, props = props)
    val back = JdbcWarehouse.read(spark, freshUrl, "dim_customer", props).head()
    assert(back.getLong(0) == 1L && back.getString(1) == "alice")
    assert(back.getDecimal(2) == new java.math.BigDecimal("10.50"))
    // the PK the DDL declared actually constrains: duplicate key rejected
    intercept[Exception] {
      JdbcWarehouse.load(rows, freshUrl, "dim_customer", SaveMode.Append, props = props)
    }
    // etl_runs initialized with the shape logEtlRun appends
    JdbcWarehouse.logEtlRun(spark, freshUrl, "etl_runs", "boot-1", "load",
      "success", 1L, new Timestamp(1700000000000L), props)
    assert(JdbcWarehouse.read(spark, freshUrl, "etl_runs", props).count() == 1)
  }

  test("upsert preserves bootstrapped DDL: VARCHAR stays comparable, PK enforced") {
    import org.apache.spark.sql.types._
    val freshDir = Files.createTempDirectory("graft-derby-upddl").toFile.getAbsolutePath
    val freshUrl = s"jdbc:derby:$freshDir/wh;create=true"
    val t = JdbcWarehouse.TableDef("accounts",
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType),
        StructField("version", LongType))),
      primaryKey = Seq("id"))
    JdbcWarehouse.initializeSchema(freshUrl, Seq(t), props)
    JdbcWarehouse.load(Seq((1L, "alice", 1L), (2L, "bob", 1L)).toDF("id", "name", "version"),
      freshUrl, "accounts", SaveMode.Append, props = props)

    JdbcWarehouse.upsert(spark, freshUrl, "accounts",
      Seq((2L, "bob2", 2L), (3L, "carol", 1L)).toDF("id", "name", "version"),
      Seq("id"), "version", props = props,
      readPartitioning = Some(("id", 1L, 2L, 2)))

    // a pushed-down string '=' predicate: works on VARCHAR, throws on the
    // CLOB column a DROP+RENAME publish would have left behind
    val hit = JdbcWarehouse.read(spark, freshUrl, "accounts", props)
      .filter(col("name") === "bob2").collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(2L))
    assert(JdbcWarehouse.read(spark, freshUrl, "accounts", props).count() == 3)
    // the PK declared at bootstrap still constrains after the publish
    intercept[Exception] {
      JdbcWarehouse.load(Seq((3L, "dup", 9L)).toDF("id", "name", "version"),
        freshUrl, "accounts", SaveMode.Append, props = props)
    }
    assert(!JdbcWarehouse.tableExists(freshUrl, "accounts_staging", props))
  }

  test("applyChanges: change-feed slices apply incrementally by key, idempotent under replay") {
    import graft.streaming.EventStreams
    val base = Files.createTempDirectory("cdcwh").toFile.getAbsolutePath
    val t = s"$base/t"
    // history: append → dv point delete → CoW update → plain append
    TableLog.append(spark, t,
      (1L to 50L).map(k => (k, s"n$k", k * 1.0)).toDF("id", "name", "bal")
        .repartitionByRange(2, col("id")), statsCols = Seq("id"))
    TableLog.deleteWhere(spark, t, col("id") === 17L, mode = "dv")
    TableLog.updateWhere(spark, t, col("id") === 3L,
      set = Map("bal" -> lit(999.0)))
    TableLog.append(spark, t, Seq((100L, "new", 7.0)).toDF("id", "name", "bal"))
    // stream the feed into Derby: one keyed transaction per commit
    EventStreams.changeFeedWarehouseSink(spark, t, s"$base/ckpt", url,
      "wh_mirror", Seq("id"), props = props)
    def mirror: Map[Long, (String, Double)] =
      JdbcWarehouse.read(spark, url, "wh_mirror", props).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    def tableNow: Map[Long, (String, Double)] =
      TableLog.readAt(spark, t).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(mirror == tableNow, "the warehouse mirror must equal the table-log state")
    assert(!mirror.contains(17L) && mirror(3L)._2 == 999.0 && mirror(100L)._1 == "new")
    // replaying a slice (the streaming at-least-once tail) converges
    val v = TableLog.currentVersion(spark, t)
    JdbcWarehouse.applyChanges(spark, url, "wh_mirror",
      TableLog.readChanges(spark, t, v - 1, v), Seq("id"), props = props)
    assert(mirror == tableNow, "re-applying the last slice must be a no-op")
    // new commits stream incrementally on restart with the same checkpoint
    TableLog.deleteWhere(spark, t, col("id") === 100L, mode = "dv")
    EventStreams.changeFeedWarehouseSink(spark, t, s"$base/ckpt", url,
      "wh_mirror", Seq("id"), props = props)
    assert(mirror == tableNow && !mirror.contains(100L))
    // the KEYED feed (update_preimage/update_postimage pairs) applies as
    // a key-transactional replace — same converged state, still idempotent
    TableLog.updateWhere(spark, t, col("id") === 5L, set = Map("bal" -> lit(555.0)))
    val v2 = TableLog.currentVersion(spark, t)
    val keyedSlice = TableLog.readChanges(spark, t, v2 - 1, v2, keys = Seq("id"))
    assert(keyedSlice.filter(col("_change_type").startsWith("update_")).count() == 2L,
      "the CoW update must attribute as one pre+post pair")
    JdbcWarehouse.applyChanges(spark, url, "wh_mirror", keyedSlice, Seq("id"), props = props)
    assert(mirror == tableNow && mirror(5L)._2 == 555.0,
      "a keyed update slice must land the postimage")
    JdbcWarehouse.applyChanges(spark, url, "wh_mirror", keyedSlice, Seq("id"), props = props)
    assert(mirror == tableNow, "re-applying the keyed slice must converge")
  }

  test("logEtlRun appends run records to the warehouse") {
    val ts = new Timestamp(1700000000000L)
    JdbcWarehouse.logEtlRun(spark, url, "etl_runs", "run-1", "load", "success", 42L, ts, props)
    JdbcWarehouse.logEtlRun(spark, url, "etl_runs", "run-2", "load", "failed", 0L, ts, props)
    // Derby maps StringType -> CLOB, which rejects pushed-down '=' predicates;
    // filter after collect so the comparison happens Spark-side
    val log = JdbcWarehouse.read(spark, url, "etl_runs", props)
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(log.length == 2)
    assert(log.collect { case (runId, "failed") => runId }.toSeq == Seq("run-2"))
  }
}
