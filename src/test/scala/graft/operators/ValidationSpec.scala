package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("validate computes all rules in one pass with thresholds") {
    val df = Seq(
      (Some(5.0), Some("x")), (Some(-1.0), None), (Some(200.0), Some("y")), (None, Some("z"))
    ).toDF("amount", "tag")
    val report = Validation.validate(df, Seq(
        Validation.nullCheck("tag", 0.0, "critical"),
        Validation.rangeCheck("amount", Some(0.0), Some(100.0), "error"),
        Validation.businessRule("amount_present", col("amount").isNotNull)),
      thresholds = Map("null_check_tag" -> 0.5))
      .collect().map(r => r.getAs[String]("rule") -> r).toMap

    val nulls = report("null_check_tag")
    assert(nulls.getAs[Long]("violations") == 1L)
    assert(nulls.getAs[Boolean]("passed")) // 25% ≤ 50% threshold
    val range = report("range_check_amount")
    assert(range.getAs[Long]("violations") == 2L) // -1 and 200; null NOT a range violation
    assert(!range.getAs[Boolean]("passed"))
    val rule = report("business_rule_amount_present")
    assert(rule.getAs[Long]("violations") == 1L)
    assert(rule.getAs[Double]("violation_pct") == 0.25)
  }

  test("validate is safe for rule names with quotes, backticks, and column collisions") {
    val df = Seq((1.0, "x"), (-5.0, "y")).toDF("amount", "rule")
    val report = Validation.validate(df, Seq(
        Validation.businessRule("o'brien's `check`, stage 'two'", col("amount") >= 0),
        // rule named identically to a real column must not collide
        Validation.nullCheck("rule", 0.0, "error")))
      .collect().map(r => r.getAs[String]("rule") -> r.getAs[Long]("violations")).toMap
    assert(report("business_rule_o'brien's `check`, stage 'two'") == 1L)
    assert(report("null_check_rule") == 0L)
  }

  test("an exactly-at-threshold rule passes (decimal boundary, no float error)") {
    // 29 violations of 100 rows at threshold 0.29: in double,
    // 0.29 * 100 = 28.999…96 and the rule would spuriously FAIL
    val df = (1 to 100).map(i => Some(if (i <= 29) -1.0 else 5.0)).toSeq.toDF("amount")
    val row = Validation.validate(df, Seq(
        Validation.rangeCheck("amount", Some(0.0), None, "error")),
        thresholds = Map("range_check_amount" -> 0.29))
      .head()
    assert(row.getAs[Long]("violations") == 29L)
    assert(row.getAs[Boolean]("passed"), "29/100 at threshold 0.29 must pass")
  }

  test("uniqueCheck counts duplicate keys and rows") {
    val df = Seq(1, 1, 1, 2, 3, 3).toDF("k")
    val r = Validation.uniqueCheck(df, Seq("k")).head()
    assert(r.getAs[Long]("duplicate_keys") == 2L)  // 1 and 3
    assert(r.getAs[Long]("duplicate_rows") == 3L)  // two extra 1s + one extra 3
    assert(!r.getAs[Boolean]("passed"))
    assert(Validation.uniqueCheck(df.distinct(), Seq("k")).head().getAs[Boolean]("passed"))
  }

  test("empty input passes all checks (a legal empty incremental run must not trip gates)") {
    val empty = Seq.empty[(Long, Option[String])].toDF("id", "tag")
    val report = Validation.validate(empty, Seq(
      Validation.nullCheck("tag", 0.0, "critical"),
      Validation.rangeCheck("id", Some(0d), None, "error"))).collect()
    report.foreach { r =>
      assert(r.getAs[Long]("violations") == 0L, r.toString)
      assert(r.getAs[Boolean]("passed"), r.toString)
    }
    assert(Validation.uniqueCheck(empty, Seq("id")).head().getAs[Boolean]("passed"))
  }

  test("nullCheck's own maxNullPct is honored without a separate thresholds map") {
    // 1 null in 4 rows = 25% nulls: allowed at 30%, failed at 20%
    val df = Seq(Some("a"), Some("b"), Some("c"), None).toDF("tag")
    val loose = Validation.validate(df, Seq(Validation.nullCheck("tag", 0.3))).head()
    assert(loose.getAs[Boolean]("passed"))
    val strict = Validation.validate(df, Seq(Validation.nullCheck("tag", 0.2))).head()
    assert(!strict.getAs[Boolean]("passed"))
    // an explicit thresholds-map entry still overrides the rule's own
    val overridden = Validation.validate(df, Seq(Validation.nullCheck("tag", 0.2)),
      thresholds = Map("null_check_tag" -> 0.3)).head()
    assert(overridden.getAs[Boolean]("passed"))
  }


  test("psiReport: zero for identical snapshots, alerts on a planted shift, smoothing") {
    import spark.implicits._
    val base = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    // identical distributions → every (p - q) term is exactly 0
    val same = Validation.psiReport(base, base, Seq("x"), buckets = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(same.toSeq == Seq(("x", 0.0, false)))
    // hand case, buckets=2: base 1..10 → cut at 5.5 (5/5 split);
    // current all 10s → (0, 10) split; Laplace (c+.5)/(n+1)
    val b10 = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val cur = (1 to 10).map(i => (i.toLong, 10.0)).toDF("id", "x")
    val p0 = 5.5 / 11; val q0 = 0.5 / 11; val p1 = 5.5 / 11; val q1 = 10.5 / 11
    val expected = BigDecimal(
      BigDecimal((p0 - q0) * StrictMath.log(p0 / q0))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      + BigDecimal((p1 - q1) * StrictMath.log(p1 / q1))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Validation.psiReport(b10, cur, Seq("x"), buckets = 2)
      .collect().head
    assert(out.getDouble(1) == expected && out.getBoolean(2))
    // a null-heavy column still reports (nulls excluded both sides)
    val withNulls = base.withColumn("x",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("id") % 2 === 0,
        org.apache.spark.sql.functions.col("x")))
    val n = Validation.psiReport(withNulls, withNulls, Seq("x")).collect().head
    assert(n.getDouble(1) == 0.0)
    intercept[IllegalArgumentException] {
      Validation.psiReport(base, base, Nil)
    }
    intercept[IllegalArgumentException] {
      Validation.psiReport(base, base, Seq("x"), buckets = 1)
    }
  }


  test("psiReportCategorical: zero when identical, alerts on remap, union frame, guards") {
    import spark.implicits._
    val base = (1 to 100).map(i =>
      (i.toLong, if (i % 2 == 0) "A" else if (i % 5 == 0) "B" else "C"))
      .toDF("id", "seg")
    // identical frames → every (p - q) term exactly 0
    val same = Validation.psiReportCategorical(base, base, Seq("seg"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(same.toSeq == Seq(("seg", 0.0, false)))
    // planted remap: half of C becomes A → must alert at 0.1
    val cur = base.withColumn("seg",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("id") % 4 === 1,
        org.apache.spark.sql.functions.lit("A"))
        .otherwise(org.apache.spark.sql.functions.col("seg")))
    val drift = Validation.psiReportCategorical(base, cur, Seq("seg"),
      alertAt = 0.1).collect().head
    assert(drift.getDouble(1) > 0.1 && drift.getBoolean(2),
      s"remap must alert: $drift")
    // hand case: base {A:2}, cur {B:2} — union frame k=2, Laplace
    // p_A=2.5/3, q_A=0.5/3 and symmetric for B
    val bA = Seq((1L, "A"), (2L, "A")).toDF("id", "seg")
    val cB = Seq((1L, "B"), (2L, "B")).toDF("id", "seg")
    val pa = 2.5 / 3; val qa = 0.5 / 3
    val expected = BigDecimal(
      BigDecimal((pa - qa) * StrictMath.log(pa / qa))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      + BigDecimal((qa - pa) * StrictMath.log(qa / pa))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val swap = Validation.psiReportCategorical(bA, cB, Seq("seg")).collect().head
    assert(swap.getDouble(1) == expected, s"got ${swap.getDouble(1)}, want $expected")
    // high-NDV refusal is loud
    val ids = (1 to 50).map(i => (i.toLong, s"cat_$i")).toDF("id", "seg")
    intercept[IllegalArgumentException] {
      Validation.psiReportCategorical(ids, ids, Seq("seg"), maxCategories = 10)
    }
    intercept[IllegalArgumentException] {
      Validation.psiReportCategorical(base, base, Nil)
    }
  }

  test("schemaCheck reports missing and mistyped columns") {
    val df = Seq((1L, "a")).toDF("id", "name")
    assert(Validation.schemaCheck(df, Map("id" -> "bigint", "name" -> "string")).isEmpty)
    val bad = Validation.schemaCheck(df, Map("id" -> "int", "missing_col" -> "string"))
    assert(bad.exists(_.contains("id: expected int, got bigint")))
    assert(bad.exists(_.contains("Missing column: missing_col")))
  }
}
