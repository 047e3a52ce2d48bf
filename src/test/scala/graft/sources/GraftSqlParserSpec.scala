package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.TableLog

/** The SQL maintenance statements (delegating parser): VACUUM /
  * OPTIMIZE [ZORDER BY] / DESCRIBE HISTORY / CONVERT TO GRAFT execute
  * the method API; everything else parses exactly as before.
  */
class GraftSqlParserSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("OPTIMIZE / DESCRIBE HISTORY / VACUUM over a view run the method API") {
    val dir = tmpDir("gsp") + "/t"
    (1 to 4).foreach(i =>
      TableLog.append(spark, dir, Seq((i.toLong, s"v$i")).toDF("k", "s"),
        statsCols = Seq("k")))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gsp_t USING graft OPTIONS (path '$dir')")

    val opt = spark.sql("OPTIMIZE gsp_t").collect()
    assert(opt.length == 1 && opt.head.getLong(0) == 5L &&
      opt.head.getString(1) == "compact")
    assert(TableLog.liveFilesAt(spark, dir).length < 4,
      "four tiny files must compact through the SQL statement")

    val hist = spark.sql("DESCRIBE HISTORY gsp_t").collect()
    assert(hist.length == 5)
    assert(hist.map(_.getString(2)).count(_ == "append") == 4)
    assert(hist.map(_.getString(2)).contains("compact"))

    // dry run reports, deletes nothing; the real run then deletes
    val dry = spark.sql("VACUUM gsp_t RETAIN 1 VERSIONS DRY RUN").head()
    assert(dry.getBoolean(4) && dry.getInt(0) > 0)
    val before = TableLog.history(spark, dir).length
    assert(TableLog.history(spark, dir).length == before)
    val real = spark.sql("VACUUM gsp_t RETAIN 1 VERSIONS").head()
    assert(!real.getBoolean(4) && real.getInt(0) == dry.getInt(0),
      "the dry run must have reported exactly the real run's deletions")
    assert(TableLog.readAt(spark, dir).count() == 4L, "head still reads")
    spark.sql("DROP VIEW gsp_t")
  }

  test("OPTIMIZE ZORDER BY and the graft.`path` target form") {
    val dir = tmpDir("gsp_z") + "/t"
    TableLog.append(spark, dir,
      (1L to 4000L).map(k => (k, k % 64, (k / 64) % 64)).toDF("id", "x", "y")
        .repartition(16), statsCols = Seq("x", "y"))
    val r = spark.sql(s"OPTIMIZE graft.`$dir` ZORDER BY (x, y)").head()
    assert(r.getLong(0) == 2L && r.getString(1) == "zorder(x,y)")
    // one transactional layout commit: rows identical, op recorded
    // (the z-curve pruning itself is pinned in the TableLog specs)
    assert(TableLog.history(spark, dir).last.op == "compact")
    assert(TableLog.readAt(spark, dir).count() == 4000L)
    assert(TableLog.liveFilesAt(spark, dir).length < 16,
      "the 16-file layout must have been rewritten")
  }

  test("DESCRIBE DETAIL and RESTORE TABLE as SQL") {
    val dir = tmpDir("gsp_dr") + "/t"
    TableLog.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    TableLog.deleteWhere(spark, dir, col("k") === 2L, mode = "dv")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gsp_dr USING graft OPTIONS (path '$dir')")
    val d = spark.sql("DESCRIBE DETAIL gsp_dr").head()
    assert(d.getLong(0) == 2L && d.getLong(4) == 1L && d.getLong(5) == 1L,
      s"v2, one live row, one dv row: $d")
    // zero-copy rollback through SQL: v3 re-points at v1's files
    val r = spark.sql(s"RESTORE TABLE graft.`$dir` TO VERSION AS OF 1").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(TableLog.readAt(spark, dir).count() == 2L, "the deleted row is back")
    // TIMESTAMP AS OF resolves at-or-before, then restores zero-copy:
    // v2's commit instant names the dv-deleted state
    val ts2 = TableLog.history(spark, dir).find(_.version == 2L).get.ts
    val rt = spark.sql(s"RESTORE TABLE graft.`$dir` TO TIMESTAMP AS OF '$ts2'").head()
    assert(rt.getLong(1) == 2L, rt.toString)
    assert(TableLog.readAt(spark, dir).count() == 1L, "back to the post-delete state")
    spark.sql("DROP VIEW gsp_dr")
  }

  test("VACUUM RETAIN n HOURS keeps young versions by age") {
    val dir = tmpDir("gsp_vh") + "/t"
    TableLog.append(spark, dir, Seq((1L, "a")).toDF("k", "s"))
    TableLog.overwrite(spark, dir, Seq((2L, "b")).toDF("k", "s"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gsp_vh USING graft OPTIONS (path '$dir')")
    // grammar: VERSIONS and HOURS are alternates of one RETAIN — the
    // combined form must NOT parse (falls through to Spark's parser,
    // which errors)
    intercept[Exception] {
      spark.sql("VACUUM gsp_vh RETAIN 1 VERSIONS RETAIN 1 HOURS DRY RUN")
    }
    // everything is seconds old: a 1-hour age floor retains all history
    // even though keepVersions alone would allow reclaiming v1
    val dry = spark.sql("VACUUM gsp_vh RETAIN 1 HOURS DRY RUN").head()
    assert(dry.getInt(0) == 0,
      s"age floor must keep the seconds-old v1 file: $dry")
    assert(TableLog.readAt(spark, dir, 1L).count() == 1L)
    spark.sql("DROP VIEW gsp_vh")
  }

  test("COPY INTO is idempotent from SQL; SHOW GRAFT TABLES discovers the warehouse") {
    val root = tmpDir("gsp_ci")
    val src = s"$root/landing"
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1).write.parquet(src)
    val t = s"$root/wh/t"
    val first = spark.sql(s"COPY INTO graft.`$t` FROM '$src/*.parquet'").head()
    assert(first.getLong(0) == 1L && first.getInt(1) == 1 && first.getInt(2) == 0 &&
      first.getLong(3) == 2L)
    // re-running loads nothing — the ledger skips every known file
    val again = spark.sql(s"COPY INTO graft.`$t` FROM '$src/*.parquet'").head()
    assert(again.isNullAt(0) && again.getInt(1) == 0 && again.getInt(2) == 1)
    // a new landing file loads exactly once
    Seq((3L, "c")).toDF("k", "s").coalesce(1).write.mode("append").parquet(src)
    val inc = spark.sql(s"COPY INTO graft.`$t` FROM '$src/*.parquet'").head()
    assert(inc.getInt(1) == 1 && inc.getLong(3) == 1L)
    assert(TableLog.readAt(spark, t).count() == 3L)
    // discovery sees the one table under the warehouse root
    val shown = spark.sql(s"SHOW GRAFT TABLES IN '$root/wh'").collect()
    assert(shown.length == 1 && shown.head.getString(0).endsWith("/t") &&
      shown.head.getLong(1) == 2L)
  }

  test("CONVERT TO GRAFT as SQL; delegation leaves normal SQL untouched") {
    val lake = tmpDir("gsp_cv") + "/lake"
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").repartition(2).write.parquet(lake)
    val v = spark.sql(s"CONVERT TO GRAFT parquet.`$lake`").head().getLong(0)
    assert(v == 1L)
    assert(TableLog.readAt(spark, lake).count() == 2L)
    // normal SQL still parses and runs through the delegate
    assert(spark.sql("SELECT 1 + 1 AS x").head().getInt(0) == 2)
    // garbage still fails with a parse error, not a silent no-op
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("VACUUM")
    }
    // a non-graft view refuses loudly
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("gsp_plain")
    val e = intercept[IllegalArgumentException] {
      spark.sql("DESCRIBE HISTORY gsp_plain").collect()
    }
    assert(e.getMessage.contains("does not resolve to a graft table"))
    spark.sql("DROP VIEW gsp_plain")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT as SQL: full lifecycle") {
    val dir = tmpDir("gsp_ck") + "/t"
    TableLog.append(spark, dir,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amount"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gsp_ck USING graft OPTIONS (path '$dir')")
    // declare through SQL (nested parens must survive the grab)
    val r = spark.sql(
      "ALTER TABLE gsp_ck ADD CONSTRAINT amount_pos CHECK ((amount) > 0)").head()
    assert(r.getLong(0) == 2L && r.getString(1) == "amount_pos")
    // the SQL-added constraint refuses a violating SQL INSERT…
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gsp_ck VALUES (3, -5.0)")
    }
    assert(e.getMessage != null && e.getMessage.contains("amount_pos"),
      s"violating insert must name the constraint: ${e.getMessage}")
    assert(TableLog.readAt(spark, dir).count() == 2L)
    // …and a passing one commits
    spark.sql("INSERT INTO gsp_ck VALUES (3, 5.0)")
    assert(TableLog.readAt(spark, dir).count() == 3L)
    // adding over violating EXISTING data refuses with a witness
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gsp_ck ADD CONSTRAINT k_big CHECK (k > 100)")
    }
    assert(e2.getMessage.contains("existing data violates"), e2.getMessage)
    // drop through SQL re-opens the gate; the path form works too
    spark.sql("ALTER TABLE gsp_ck DROP CONSTRAINT amount_pos")
    spark.sql("INSERT INTO gsp_ck VALUES (4, -1.0)")
    assert(TableLog.readAt(spark, dir).count() == 4L)
    val r2 = spark.sql(
      s"ALTER TABLE graft.`$dir` ADD CONSTRAINT k_pos CHECK (k > 0)").head()
    assert(r2.getString(1) == "k_pos")
    // every OTHER ALTER TABLE form delegates verbatim to Spark's parser
    assert(GraftSqlParser.maintenancePlan(
      "ALTER TABLE t SET TBLPROPERTIES ('a'='b')").isEmpty)
    assert(GraftSqlParser.maintenancePlan(
      "ALTER TABLE t RENAME TO t2").isEmpty)
    assert(GraftSqlParser.maintenancePlan(
      "ALTER TABLE t ADD COLUMNS (x INT)").isEmpty)
    spark.sql("DROP VIEW gsp_ck")
  }
}
