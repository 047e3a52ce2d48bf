package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeepFirst keeps the row with the smallest tiebreak per key") {
    val df = Seq(
      ("u1", "click", 3L, 30.0), ("u1", "click", 1L, 10.0),
      ("u1", "click", 2L, 20.0), ("u2", "view", 5L, 50.0)
    ).toDF("user", "etype", "seq", "v")
    val out = Cleaning.dedupKeepFirst(df, Seq("user", "etype"), "seq")
      .orderBy("user").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("seq") == 1L && out(0).getAs[Double]("v") == 10.0)
    assert(out(1).getAs[Long]("seq") == 5L)
  }

  test("dropMissing / fillConstants / fillUnknown") {
    val df = Seq((1, Some("a"), Some(1.5)), (2, None, None), (3, Some("c"), None))
      .toDF("id", "s", "x")
    assert(Cleaning.dropMissing(df, Seq("s")).count() == 2)
    assert(Cleaning.dropMissing(df, Seq("s", "x")).count() == 1)
    val filled = Cleaning.fillConstants(Cleaning.fillUnknown(df, Seq("s")), Map("x" -> 9.9))
      .orderBy("id").collect()
    assert(filled(1).getAs[String]("s") == "UNKNOWN")
    assert(filled(1).getAs[Double]("x") == 9.9 && filled(2).getAs[Double]("x") == 9.9)
  }

  test("fillMedian exact uses the true median") {
    val df = Seq(Some(1.0), Some(100.0), Some(3.0), None, Some(2.0))
      .toDF("x") // median of {1,2,3,100} = 2.5
    val out = Cleaning.fillMedian(df, Seq("x"), exact = true)
      .filter(col("x") === 2.5)
    assert(out.count() == 1)
  }

  test("fillMedian treats NaN as missing (fill AND median) like na.fill/pandas") {
    // NaN from a 0/0 upstream ratio must not survive the clean stage, and
    // must not pollute the median (NaN sorts greatest in Spark ordering)
    val df = Seq(1.0, Double.NaN, 3.0, 2.0, Double.NaN).toDF("x")
    val out = Cleaning.fillMedian(df, Seq("x"), exact = true)
      .collect().map(_.getDouble(0)).sorted
    assert(!out.exists(_.isNaN))
    assert(out.toSeq == Seq(1.0, 2.0, 2.0, 2.0, 3.0)) // median of {1,2,3} = 2
    // and the whole fill stays one lazy plan (no mid-build action): the
    // analyzed plan of the output still contains the aggregate subtree
    val lazyOut = Cleaning.fillMedian(df, Seq("x"))
    assert(lazyOut.queryExecution.analyzed.toString.contains("approx_percentile"))
  }

  test("fillMedian handles a column name containing dots") {
    // col("a.b") parses as a nested-field path — the staging reads must
    // backtick-quote or the fill dies on a perfectly legal column name
    val df = Seq(Some(1.0), Some(3.0), None).toDF("price.usd")
    val out = Cleaning.fillMedian(df, Seq("price.usd"), exact = true)
      .collect().map(_.getDouble(0)).sorted
    assert(out.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("fillForward / fillBackward respect partition and order") {
    val df = Seq(
      ("u1", 1L, Some(10.0)), ("u1", 2L, None), ("u1", 3L, None), ("u1", 4L, Some(40.0)),
      ("u2", 1L, None), ("u2", 2L, Some(5.0))
    ).toDF("u", "seq", "x")
    val ff = Cleaning.fillForward(df, Seq("x"), Seq("seq"), Seq("u"))
      .orderBy("u", "seq").select("x").collect().map(r => Option(r.get(0)))
    assert(ff.toSeq == Seq(Some(10.0), Some(10.0), Some(10.0), Some(40.0), None, Some(5.0)))
    val bf = Cleaning.fillBackward(df, Seq("x"), Seq("seq"), Seq("u"))
      .orderBy("u", "seq").select("x").collect().map(r => Option(r.get(0)))
    assert(bf.toSeq == Seq(Some(10.0), Some(40.0), Some(40.0), Some(40.0), Some(5.0), Some(5.0)))
  }

  test("interpolateLinear matches pandas edge semantics") {
    // pandas: [nan, 1, nan, nan, 4, nan].interpolate() = [nan, 1, 2, 3, 4, 4]
    val df = Seq(
      ("u", 1L, None), ("u", 2L, Some(1.0)), ("u", 3L, None),
      ("u", 4L, None), ("u", 5L, Some(4.0)), ("u", 6L, None)
    ).toDF("u", "seq", "x")
    val out = Cleaning.interpolateLinear(df, "x", Seq("seq"), Seq("u"))
      .orderBy("seq").select("x").collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, Some(1.0), Some(2.0), Some(3.0), Some(4.0), Some(4.0)))
  }

  test("standardizeTimestamps coerces bad strings to null") {
    val df = Seq("2026-01-05 10:00:00", "not a time").toDF("ts")
    val out = Cleaning.standardizeTimestamps(df, Seq("ts"), Some("yyyy-MM-dd HH:mm:ss"))
    assert(out.filter(col("ts").isNull).count() == 1)
    assert(out.filter(col("ts").isNotNull).count() == 1)
  }

  test("normalizeCategorical trims and folds case") {
    val df = Seq("  FuRniTure ", "auto").toDF("cat")
    val lower = Cleaning.normalizeCategorical(df, Seq("cat"), "lower")
      .as[String].collect().sorted
    assert(lower.toSeq == Seq("auto", "furniture"))
    val title = Cleaning.normalizeCategorical(df, Seq("cat"), "title")
      .as[String].collect().sorted
    assert(title.toSeq == Seq("Auto", "Furniture"))
    intercept[IllegalArgumentException] {
      Cleaning.normalizeCategorical(df, Seq("cat"), "shout")
    }
  }

  test("durationHours and costRatio") {
    val df = Seq(("2026-01-01 00:00:00", "2026-01-02 06:00:00", 5.0, 0.0))
      .toDF("start", "end", "cost", "price")
      .select(to_timestamp(col("start")).as("start"), to_timestamp(col("end")).as("end"),
        col("cost"), col("price"))
    val out = df.select(
      Cleaning.durationHours(col("end"), col("start")).as("h"),
      Cleaning.costRatio(col("cost"), col("price")).as("r")).head()
    assert(out.getDouble(0) == 30.0)
    assert(out.isNullAt(1)) // zero price → null, not div-by-zero
  }

  test("profile reports nulls, ndv and numeric stats in one pass") {
    val df = Seq((1, Some(10.0), "a"), (2, None, "b"), (3, Some(30.0), "b"))
      .toDF("id", "x", "s")
    val p = Cleaning.profile(df, exactDistinct = true).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p("x").getAs[Long]("null_count") == 1L)
    assert(p("x").getAs[Long]("row_count") == 3L)
    assert(p("x").getAs[Double]("min") == 10.0 && p("x").getAs[Double]("max") == 30.0)
    assert(p("x").getAs[Double]("mean") == 20.0)
    assert(p("s").getAs[Long]("distinct_count") == 2L)
    assert(p("s").isNullAt(p("s").fieldIndex("min"))) // non-numeric → null stats
  }

  test("flagOutliersIqr: hand-computed fences, null value, per-group isolation") {
    // group a: values 1..9 plus a 100 spike → interpolated q1=3.25,
    // q3=7.75, IQR=4.5, fences [-3.5, 14.5] at k=1.5: only the spike flags
    val a = (1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 100.0)
    // group b: tight cluster, no outliers — fences computed per group,
    // so a's spike cannot widen b's fences (and vice versa)
    val b = Seq(("b", 50.0), ("b", 51.0), ("b", 52.0), ("b", 53.0))
    val df = (a ++ b).toDF("g", "v")
      .unionByName(Seq(("a", Option.empty[Double])).toDF("g", "v"))
    val out = Cleaning.flagOutliersIqr(df, "g", "v")
      .collect().map(r => (r.getString(0), Option(r.get(1))) ->
        (r.getAs[Double]("v_lo"), r.getAs[Double]("v_hi"),
          Option(r.get(r.fieldIndex("v_outlier"))))).toMap
    assert(out(("a", Some(100.0)))._3.contains(true), "spike must flag")
    assert(out(("a", Some(9.0))) == (-3.5, 14.5, Some(false)),
      s"hand-computed fences wrong: ${out(("a", Some(9.0)))}")
    assert(out(("b", Some(50.0)))._3.contains(false) &&
      out(("b", Some(53.0)))._3.contains(false), "b's cluster is clean")
    assert(out(("a", None))._3.isEmpty, "null value flags null, not false")
    intercept[IllegalArgumentException] {
      Cleaning.flagOutliersIqr(df, "g", "v", k = -1)
    }
  }

  test("profileDrift: null surge, mean shift, range widening, schema change") {
    val base = Seq((1L, 10.0, "a"), (2L, 11.0, "b"), (3L, 12.0, "c"), (4L, 13.0, "d"))
      .toDF("id", "v", "s")
    // current: nulls appeared in s, v's mean doubled and range widened,
    // column s2 is NEW (and nothing was removed)
    val cur = Seq(
      (1L, 20.0, Option.empty[String], "x"), (2L, 22.0, Some("b"), "y"),
      (3L, 24.0, Some("c"), "z"), (4L, 26.0, Some("d"), "w"))
      .toDF("id", "v", "s", "s2")
    val out = Cleaning.profileDrift(base, cur)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out("v").getAs[Boolean]("ok_mean"), "doubled mean must fail ok_mean")
    assert(out("v").getAs[Boolean]("range_widened"), "20..26 leaves 10..13")
    assert(!out("s").getAs[Boolean]("ok_nulls"), "null surge must flag")
    assert(out("id").getAs[Boolean]("ok_nulls") &&
      !out("id").getAs[Boolean]("range_widened"), "id unchanged")
    // added column: present only on the current side, checks null
    assert(!out("s2").getAs[Boolean]("present_both"))
    assert(out("s2").isNullAt(out("s2").fieldIndex("dtype_changed")))
    // non-numeric column: no fabricated mean check
    assert(out("s").isNullAt(out("s").fieldIndex("ok_mean")))
  }

  test("histogram: equi-width grid with max clamp, equi-depth balance, constant column, guards") {
    import spark.implicits._
    // 0..99 plus nulls: equi-width 10 cells of exactly 10 values; the
    // max value (99) clamps INTO the last cell, not a phantom 11th
    val df = ((0 until 100).map(i => Some(i.toDouble)) ++ Seq(None, None))
      .toDF("v")
    val ew = Cleaning.histogram(df, "v", buckets = 10)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ew.length == 10)
    ew.zipWithIndex.foreach { case ((b, lo, hi, n), i) =>
      assert(b == i && n == 10L && lo == i * 10.0 && hi == i * 10.0 + 9.0,
        s"bucket $i: ($b, $lo, $hi, $n)")
    }
    // equi-depth over a SKEWED distribution still balances counts
    val skew = ((1 to 96).map(_ => 1.0) ++ (1 to 32).map(i => 100.0 + i))
      .toDF("v")
    val ed = Cleaning.histogram(skew, "v", buckets = 4, mode = "equi_depth")
      .collect().map(r => (r.getInt(0), r.getLong(3))).toMap
    assert(ed.values.sum == 128L)
    assert(ed(0) == 96L, s"ties pool in the first cell: $ed") // all the 1.0s
    // constant column: one cell, no 0/0 NaN bucket
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val c = Cleaning.histogram(const, "v", buckets = 10).collect()
    assert(c.length == 1 && c.head.getInt(0) == 0 && c.head.getLong(3) == 3L)
    intercept[IllegalArgumentException] { Cleaning.histogram(df, "v", 0) }
    intercept[IllegalArgumentException] {
      Cleaning.histogram(df, "v", 4, mode = "log")
    }
  }
}
