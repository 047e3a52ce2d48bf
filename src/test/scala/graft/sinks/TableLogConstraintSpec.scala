package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Table-level CHECK constraints: added with full existing-data
  * validation, carried in every manifest, enforced INLINE in each
  * data-bearing commit's write pass, NULL passes (SQL CHECK), and
  * never rebase-hidden.
  */
class TableLogConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("add/enforce/drop lifecycle: violating commits refuse whole, passing rows are untouched") {
    val dir = tmpDir("ck")
    TableLog.append(spark, dir, Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price"))
    TableLog.addCheckConstraint(spark, dir, "price_pos", "price > 0")
    assert(TableLog.constraintsAt(spark, dir) == Map("price_pos" -> "price > 0"))
    assert(TableLog.history(spark, dir).last.op == "constraint")
    // a passing append lands bit-identically (no rows filtered away)
    TableLog.append(spark, dir, Seq((3L, 30.0)).toDF("k", "price"))
    assert(TableLog.readAt(spark, dir).count() == 3L)
    // a violating append refuses the WHOLE commit with the name + row
    val before = TableLog.currentVersion(spark, dir)
    val e = intercept[Exception] {
      TableLog.append(spark, dir, Seq((4L, 40.0), (5L, -1.0)).toDF("k", "price"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("price_pos")),
      s"error must name the constraint, got: ${msgs(e).mkString(" | ")}")
    assert(TableLog.currentVersion(spark, dir) == before,
      "a refused commit must not advance the table")
    assert(TableLog.readAt(spark, dir).count() == 3L)
    // dropped → the same batch lands
    TableLog.dropCheckConstraint(spark, dir, "price_pos")
    TableLog.append(spark, dir, Seq((4L, 40.0), (5L, -1.0)).toDF("k", "price"))
    assert(TableLog.readAt(spark, dir).count() == 5L)
    assert(TableLog.constraintsAt(spark, dir).isEmpty)
  }

  test("NULL passes (SQL CHECK); add refuses when existing data violates; duplicate name refuses") {
    val dir = tmpDir("ck_null")
    TableLog.append(spark, dir,
      Seq((1L, Some(10.0)), (2L, None)).toDF("k", "price"))
    // existing NULL passes the check → add succeeds
    TableLog.addCheckConstraint(spark, dir, "price_pos", "price > 0")
    // NULL rows keep flowing (CHECK semantics)
    TableLog.append(spark, dir, Seq((3L, Option.empty[Double])).toDF("k", "price"))
    assert(TableLog.readAt(spark, dir).count() == 3L)
    // a second constraint the data violates refuses at ADD time
    val ve = intercept[IllegalArgumentException] {
      TableLog.addCheckConstraint(spark, dir, "k_small", "k < 2")
    }
    assert(ve.getMessage.contains("k_small"))
    assert(TableLog.constraintsAt(spark, dir).keySet == Set("price_pos"))
    intercept[IllegalArgumentException] {
      TableLog.addCheckConstraint(spark, dir, "price_pos", "price > 1")
    }
    // NOT NULL is just a constraint: k must stay present
    TableLog.addCheckConstraint(spark, dir, "k_notnull", "k IS NOT NULL")
    val e2 = intercept[Exception] {
      TableLog.append(spark, dir, Seq((Option.empty[Long], Some(1.0))).toDF("k", "price"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e2).exists(_.contains("k_notnull")))
  }

  test("constraints version-travel, apply to CoW rewrites, and survive clone") {
    val dir = tmpDir("ck_hist")
    TableLog.append(spark, dir, Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price"))
    val vAdd = TableLog.addCheckConstraint(spark, dir, "price_cap", "price <= 1000")
    assert(TableLog.constraintsAt(spark, dir, vAdd - 1).isEmpty,
      "the pre-constraint version keeps its empty set")
    // an UPDATE that would push rows past the cap refuses — enforcement
    // covers rewritten rows, not just fresh appends
    val e = intercept[Exception] {
      TableLog.updateWhere(spark, dir, col("k") === 1L,
        set = Map("price" -> (col("price") + 100000.0)))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("price_cap")))
    assert(TableLog.readAt(spark, dir).filter(col("price") > 1000).count() == 0L)
    // a compliant update passes
    TableLog.updateWhere(spark, dir, col("k") === 1L,
      set = Map("price" -> lit(999.0)))
    // a shallow clone inherits the set and enforces it on day one
    val dst = tmpDir("ck_clone")
    TableLog.cloneShallow(spark, dir, dst)
    assert(TableLog.constraintsAt(spark, dst) == Map("price_cap" -> "price <= 1000"))
    val e2 = intercept[Exception] {
      TableLog.append(spark, dst, Seq((9L, 5000.0)).toDF("k", "price"))
    }
    assert(msgs(e2).exists(_.contains("price_cap")))
    // and dropping it on the clone does not touch the source
    TableLog.dropCheckConstraint(spark, dst, "price_cap")
    assert(TableLog.constraintsAt(spark, dir).keySet == Set("price_cap"))
  }

  test("a schema overwrite that orphans a constrained column refuses, naming the constraint") {
    val dir = tmpDir("ck_orphan")
    TableLog.append(spark, dir, Seq((1L, 10.0)).toDF("k", "price"))
    TableLog.addCheckConstraint(spark, dir, "price_pos", "price > 0")
    val e = intercept[IllegalArgumentException] {
      TableLog.overwrite(spark, dir, Seq((1L, "a")).toDF("k", "name"))
    }
    assert(e.getMessage.contains("price_pos") &&
      e.getMessage.contains("drop or redefine"))
    // the table is unchanged and still constrained
    assert(TableLog.readAt(spark, dir).columns.toSeq == Seq("k", "price"))
    assert(TableLog.constraintsAt(spark, dir).keySet == Set("price_pos"))
  }

  test("an append cannot auto-rebase over a concurrent ADD CONSTRAINT") {
    val dir = tmpDir("ck_race")
    TableLog.append(spark, dir, Seq((1L, 10.0)).toDF("k", "price"))
    val base = TableLog.currentVersion(spark, dir)
    // the constraint lands between the append's read and its CAS
    TableLog.addCheckConstraint(spark, dir, "price_pos", "price > 0")
    val e = intercept[TableLog.TableLogConflictException] {
      TableLog.append(spark, dir, Seq((2L, -5.0)).toDF("k", "price"),
        expectedParent = Some(base))
    }
    assert(e.getMessage.contains("lost the commit race"))
    assert(TableLog.readAt(spark, dir).filter(col("price") <= 0).count() == 0L)
  }

  test("invariants hold through checkpoint + maintenance carry-forward") {
    val dir = tmpDir("ck_ckpt")
    TableLog.append(spark, dir, (1L to 20L).map(k => (k, k * 1.0)).toDF("k", "price")
      .repartition(4))
    TableLog.addCheckConstraint(spark, dir, "price_pos", "price > 0")
    TableLog.append(spark, dir, Seq((21L, 21.0)).toDF("k", "price"))
    TableLog.checkpoint(spark, dir)
    TableLog.compactTable(spark, dir)
    // the compaction commit carried the set forward
    assert(TableLog.constraintsAt(spark, dir) == Map("price_pos" -> "price > 0"))
    val e = intercept[Exception] {
      TableLog.append(spark, dir, Seq((22L, -1.0)).toDF("k", "price"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("price_pos")))
  }
}
