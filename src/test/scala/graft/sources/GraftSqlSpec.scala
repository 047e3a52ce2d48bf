package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sinks.TableLog

/** SQL DML over graft tables: DELETE/UPDATE/MERGE statements parse
  * with Spark's own parser, resolve their target through USING graft
  * views (or graft.`/path`), route through the table log's row-level
  * transactions with every pruning path intact, and refuse semantics
  * the method API does not have.
  */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def stage(view: String): String = {
    val dir = tmpDir(s"gsql_$view")
    (1L to 1000L).map(k => (k, k * 1.0, s"s$k")).toDF("k", "v", "s")
      .repartitionByRange(8, col("k"))
      .write.format("graft").option("statsCols", "k").save(dir)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $view USING graft OPTIONS (path '$dir')")
    dir
  }

  test("DELETE FROM: rows gone, touch set stats-pruned, commit transactional") {
    val dir = stage("tdel")
    val v = GraftSql.exec(spark, "DELETE FROM tdel WHERE k BETWEEN 100 AND 120")
    assert(v == 2L)
    assert(spark.table("tdel").count() == 1000L - 21L)
    assert(spark.table("tdel").filter(col("k") === 110L).isEmpty)
    val del = TableLog.history(spark, dir).last
    assert(del.op == "delete" && del.remove.size < 8,
      s"the range predicate must prune the touch set: ${del.remove.size}/8")
    assert(TableLog.readAt(spark, dir, 1L).count() == 1000L,
      "DML is a commit — history stays readable")
    spark.sql("DROP VIEW tdel")
  }

  test("UPDATE SET: expression assignments, WHERE pruning, types held") {
    val dir = stage("tupd")
    GraftSql.exec(spark,
      "UPDATE tupd SET v = v + 1000.0, s = concat(s, '!') WHERE k <= 50")
    val got = spark.table("tupd").filter(col("k") === 10L).head()
    assert(got.getDouble(1) == 1010.0 && got.getString(2) == "s10!")
    assert(spark.table("tupd").filter(col("k") === 500L).head().getDouble(1) == 500.0)
    assert(TableLog.history(spark, dir).last.remove.size < 8,
      "the k-range WHERE must prune the rewrite")
    // unconditioned UPDATE touches everything — still one transaction
    GraftSql.exec(spark, "UPDATE tupd SET v = 0.0")
    assert(spark.table("tupd").agg(sum("v")).head().getDouble(0) == 0.0)
    spark.sql("DROP VIEW tupd")
  }

  test("MERGE INTO: update + insert + not-matched-by-source delete from plain SQL") {
    stage("tmrg")
    Seq((2L, -2.0, "upd"), (5000L, 5.0, "new")).toDF("k", "v", "s")
      .createOrReplaceTempView("tmrg_src")
    GraftSql.exec(spark,
      """MERGE INTO tmrg t USING tmrg_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.k > 990 THEN DELETE""".stripMargin)
    val t = spark.table("tmrg")
    assert(t.filter(col("k") === 2L).head().getString(2) == "upd")
    assert(t.filter(col("k") === 5000L).count() == 1L)
    assert(t.filter(col("k") > 990L && col("k") < 5000L).isEmpty,
      "unmatched rows inside the NMBS window delete")
    assert(t.count() == 1000L - 10L + 1L)
    // a subquery source works too (the plan materializes through the shim)
    GraftSql.exec(spark,
      """MERGE INTO tmrg t
        |USING (SELECT k, v, 'q' AS s FROM tmrg WHERE k < 3) s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.table("tmrg").filter(col("k") < 3L)
      .select("s").collect().forall(_.getString(0) == "q"))
    spark.sql("DROP VIEW tmrg"); spark.sql("DROP VIEW tmrg_src")
  }

  test("MERGE INTO ... WITH SCHEMA EVOLUTION: source-only columns append from SQL") {
    val dir = stage("tmev")
    Seq((2L, -2.0, "upd", "extra2"), (5000L, 5.0, "new", "extra5"))
      .toDF("k", "v", "s", "tag").createOrReplaceTempView("tmev_src")
    // without the flag, the extra column drops (the documented default)
    GraftSql.exec(spark,
      """MERGE INTO tmev t USING tmev_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(!spark.table("tmev").columns.contains("tag"))
    // with it, the column lands and untouched rows null-fill
    GraftSql.exec(spark,
      """MERGE WITH SCHEMA EVOLUTION INTO tmev t USING tmev_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // a TEMP VIEW freezes its relation's schema at creation (Spark V1
    // semantics) — re-create it to see the evolved shape; the table
    // itself carries the new column immediately
    assert(TableLog.readAt(spark, dir).columns.contains("tag"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tmev USING graft OPTIONS (path '$dir')")
    val t = spark.table("tmev")
    assert(t.columns.contains("tag"))
    assert(t.filter(col("k") === 2L).select("tag").head().getString(0) == "extra2")
    assert(t.filter(col("k") === 5000L).select("tag").head().getString(0) == "extra5")
    assert(t.filter(col("tag").isNotNull).count() == 2L)
    assert(t.count() == 1001L)
    spark.sql("DROP VIEW tmev"); spark.sql("DROP VIEW tmev_src")
  }

  test("graft.`/path` identifier form targets a table without a view") {
    val dir = stage("tpath")
    GraftSql.exec(spark, s"DELETE FROM graft.`$dir` WHERE k = 7")
    assert(TableLog.readAt(spark, dir).filter(col("k") === 7L).isEmpty)
    spark.sql("DROP VIEW tpath")
  }

  test("refusal matrix: pinned views, unsupported merge shapes, non-DML, non-graft") {
    val dir = stage("tref")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tref_pin USING graft " +
      s"OPTIONS (path '$dir', versionAsOf '1')")
    val pinned = intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "DELETE FROM tref_pin WHERE k = 1")
    }
    assert(pinned.getMessage.contains("pinned"))
    Seq((1L, 1.0, "x")).toDF("k", "v", "s").createOrReplaceTempView("tref_src")
    def refuse(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] { GraftSql.exec(spark, sql) }
      assert(e.getMessage.toLowerCase.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    refuse("""MERGE INTO tref t USING tref_src s ON t.k = s.k
             |WHEN MATCHED AND t.v > 0 THEN UPDATE SET *""".stripMargin,
      "when matched")
    refuse("""MERGE INTO tref t USING tref_src s ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin,
      "when matched")
    refuse("""MERGE INTO tref t USING tref_src s ON t.k < s.k
             |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
      "equalities")
    refuse("""MERGE INTO tref t USING tref_src s ON t.k = s.v
             |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
      "same top-level column")
    // struct-field references must refuse, never silently collapse to
    // the last name part (which could alias a real top-level column)
    refuse("""MERGE INTO tref t USING tref_src s ON t.meta.k = s.meta.k
             |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
      "same top-level column")
    // nested SET is supported as of r17 — a path whose HEAD is not a
    // table column still refuses loudly (never silently collapses to
    // the last name part)
    refuse("UPDATE tref SET meta.field = 5 WHERE k = 1",
      "set columns not in the table: meta")
    refuse("SELECT * FROM tref", "delete from / update / merge")
    // a plain (non-graft) temp view is not a DML target
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "DELETE FROM tref_src WHERE k = 1")
    }
    assert(e2.getMessage.contains("does not resolve to a graft table"))
    spark.sql("DROP VIEW tref"); spark.sql("DROP VIEW tref_pin")
    spark.sql("DROP VIEW tref_src")
  }
}
