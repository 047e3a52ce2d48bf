package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Dedup, Similarity}

/** The native Catalyst expressions are differentially tested against their
  * pure-Column formulations (same math, independent implementations), and
  * checked in BOTH evaluation modes — codegen and interpreted — since
  * `doGenCode` and `nullSafeEval` are separate code paths.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.Column

  private def texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "sphinx of black quartz judge my vow")
  ).toDF("id", "text")

  // ---- independent pure-Column reference formulations (the operators
  //      delegate to the native expressions; these pin their semantics) ----

  private def refCosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0d), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0d), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  private def refSimhash(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    val bits = (0 until 64).map { b =>
      val ones = size(filter(toks, t => shiftright(xxhash64(t), b).bitwiseAND(lit(1L)) === 1L))
      when(ones * 2 > n, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  private def refShingles(text: Column, k: Int): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
      .otherwise(array(concat_ws(" ", toks))))
  }

  private def refMinhash(text: Column, k: Int, numHashes: Int): Column = {
    val sh = refShingles(text, k)
    val hashes = (0 until numHashes).map { j =>
      array_min(transform(sh, s =>
        xxhash64(s) * lit(MinHashSigExpr.laneA(j)) + lit(MinHashSigExpr.laneB(j))))
    }
    array(hashes: _*)
  }

  test("cosine_sim SQL function matches the Column formulation") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -1.5f), Array(2.5f, 0.25f))
    ).toDF("a", "b")
    val out = df.select(
      round(expr("cosine_sim(a, b)"), 10).as("native"),
      round(refCosine(col("a"), col("b")), 10).as("column"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("minhash_sig matches the Column formulation (incl. short texts)") {
    val df = texts.union(Seq((4L, "ab"), (5L, "one two")).toDF("id", "text"))
    val out = df.select(
      graft.operators.Dedup.minhashSignature(col("text"), 3, 16).as("native"),
      refMinhash(col("text"), 3, 16).as("column"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("cosine_sim and hyperplane_sig implicitly cast array<double> inputs") {
    // before inputTypes were declared, a double array was read as garbage
    // floats; now analysis inserts a cast and values come out right
    val viaDouble = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c").head().getDouble(0)
    assert(math.abs(viaDouble - 1.0) < 1e-9)
    val sigs = spark.sql(
      "SELECT hyperplane_sig(array(1.0d, 2.0d), 2, 8, 42L) AS d, " +
      "hyperplane_sig(array(cast(1.0 as float), cast(2.0 as float)), 2, 8, 42L) AS f").head()
    assert(sigs.getLong(0) == sigs.getLong(1))
    // non-numeric arrays must fail ANALYSIS, not read garbage at runtime
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array('a'), array('b'))").head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hyperplane_sig(array('a'), 1, 8, 42L)").head()
    }
  }

  test("cosine_sim handles zero vectors (NaN) and nulls") {
    val r = spark.sql(
      "SELECT cosine_sim(array(cast(0.0 as float)), array(cast(0.0 as float))) AS z, " +
      "cosine_sim(cast(null as array<float>), array(cast(1.0 as float))) AS n").head()
    assert(r.getDouble(0).isNaN)
    assert(r.isNullAt(1))
  }

  test("simhash64 expression matches the pure-Column simhash") {
    val out = texts.select(
      Dedup.simhash64(col("text")).as("native"),
      refSimhash(col("text")).as("column"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native=${r.getLong(0)} column=${r.getLong(1)}"))
  }

  test("hyperplane_sig matches the Column formulation") {
    val df = Seq(
      Array(1.0f, 0.0f, 0.5f), Array(-0.3f, 2.0f, -1.0f), Array(0.0f, 0.0f, 0.0f)
    ).toDF("v")
    val planes = HyperplaneSigExpr.planesFor(3, 8, 42L)
    val refBits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit).toIndexedSeq: _*)
      val dot = aggregate(zip_with(col("v"), planeLit, (x, w) => x.cast("double") * w),
        lit(0d), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val out = df.select(
      graft.operators.Similarity.hyperplaneSignature(col("v"), 3, 8).as("native"),
      refBits.as("column")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("shingles_of matches the Column formulation (distinct, order, short texts)") {
    val df = texts.union(Seq(
      (4L, "ab"), (5L, "one two"), (6L, "a b a b a b")).toDF("id", "text"))
    val out = df.select(
      graft.operators.Dedup.shingles(col("text"), 3).as("native"),
      refShingles(col("text"), 3).as("column"))
      .collect()
    out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("top_k_by: ranking, ties to smaller id, null-safe, merges across partitions") {
    val df = spark.range(0, 1000).repartition(8) // force multi-partition partial merges
      .select(col("id"),
        (lit(1000) - pmod(col("id"), lit(500))).cast("double").as("score"))
    // scores repeat twice (id and id+500 share a score) → tie goes to smaller id
    val out = df.groupBy(lit(1).as("g"))
      .agg(expr("top_k_by(score, id, 3)").as("tk"))
      .selectExpr("inline(tk)")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq == Seq((1000.0, 0L), (1000.0, 500L), (999.0, 1L)))

    val withNulls = Seq((Some(5.0), 1L), (None, 2L), (Some(7.0), 3L))
      .toDF("score", "id")
    val o2 = withNulls.agg(expr("top_k_by(score, id, 2)").as("tk"))
      .selectExpr("inline(tk)").collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(o2.toSeq == Seq((7.0, 3L), (5.0, 1L))) // null score skipped
  }

  test("top_k_any carries struct payloads and matches the window formulation") {
    // "top 2 customers per nation by spend, with names" — whole rows on the heap
    val df = Seq(
      ("FR", 100.0, 1L, "alice"), ("FR", 300.0, 2L, "bob"), ("FR", 200.0, 3L, "eve"),
      ("PE", 50.0, 4L, "kim"), ("PE", 50.0, 5L, "lou")
    ).toDF("nation", "spend", "ck", "name").repartition(4)
    val got = df
      .groupBy("nation")
      .agg(expr("top_k_any(spend, struct(ck, name), 2)").as("tk"))
      .selectExpr("nation", "inline(tk)")
      .selectExpr("nation", "score AS spend", "payload.ck", "payload.name")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getString(3))).toSet
    assert(got == Set(
      ("FR", 300.0, 2L, "bob"), ("FR", 200.0, 3L, "eve"),
      ("PE", 50.0, 4L, "kim"), ("PE", 50.0, 5L, "lou"))) // tie → both, ordered by payload
    // tie determinism: rank order within the array is payload-ascending
    val peArr = df.groupBy("nation").agg(expr("top_k_any(spend, struct(ck, name), 2)").as("tk"))
      .filter(col("nation") === "PE").selectExpr("inline(tk)")
      .collect().map(_.getStruct(1).getLong(0)).toSeq
    assert(peArr == Seq(4L, 5L))
  }

  test("marker_count matches the higher-order filter formulation") {
    import graft.operators.TextAnalysis
    val df = texts.union(Seq(
      (4L, "el que la y the of"), (5L, "xx yy zz"), (6L, "")).toDF("id", "text"))
    val markerSets = Seq(TextAnalysis.EnStop, TextAnalysis.EsStop,
      TextAnalysis.FrStop, TextAnalysis.DeStop)
    markerSets.foreach { words =>
      val toks = split(trim(col("text")), "\\s+")
      val ref = size(filter(toks, w => w.isin(words.map(_.asInstanceOf[Any]): _*)))
      val out = df.select(
        TextAnalysis.markerCount(col("text"), words).as("native"),
        ref.as("column")).collect()
      out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    }
    // null input → null out; wrong type fails analysis
    val n = spark.sql("SELECT marker_count(cast(null as array<string>), 'a,b')").head()
    assert(n.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT marker_count(array(1, 2), 'a,b')").head()
    }
  }

  test("hilbert_index: bijective walk with unit-step adjacency (2D and 3D), codegen parity") {
    // the DEFINING Hilbert property: sorting all cells by index yields a
    // walk where consecutive cells differ by EXACTLY 1 in EXACTLY one
    // coordinate — Morton fails this (diagonal jumps); passing it on the
    // full enumeration essentially proves the Skilling transform
    def walk(dims: Int, bits: Int): Unit = {
      val side = 1 << bits
      val cells = (0 until math.pow(side, dims).toInt).map { i =>
        (0 until dims).map(d => (i / math.pow(side, d).toInt) % side)
      }
      val df = cells.map(c => (c.mkString(","), c)).toDF("label", "coords")
        .select(col("label"),
          expr(s"hilbert_index(transform(coords, x -> cast(x as int)), $bits)").as("h"))
      val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
      val n = cells.length
      assert(rows.map(_._2).distinct.length == n, "index must be a bijection")
      assert(rows.map(_._2).min == 0L && rows.map(_._2).max == n - 1L)
      val byIndex = rows.sortBy(_._2).map(_._1.split(",").map(_.toInt))
      byIndex.sliding(2).foreach { case Array(a, b) =>
        val diffs = a.zip(b).map { case (p, q) => math.abs(p - q) }
        assert(diffs.sum == 1,
          s"consecutive cells ${a.toSeq} → ${b.toSeq} must be unit-adjacent")
      }
    }
    walk(dims = 2, bits = 4) // 256-cell full enumeration
    walk(dims = 3, bits = 2) // 64 cells in 3D
    // codegen == interpreted
    val conf = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(conf)
    def eval() = (0 until 64).map(i => (i % 8, i / 8)).toDF("x", "y")
      .select(expr("hilbert_index(array(x, y), 3)"))
      .collect().toIndexedSeq.map(_.getLong(0))
    try {
      spark.conf.set(conf, "true");  val gen = eval()
      spark.conf.set(conf, "false"); val interp = eval()
      assert(gen == interp)
    } finally spark.conf.set(conf, before)
    // type + literal guards
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hilbert_index(array('a'), 3)").head()
    }
    intercept[Exception] {
      spark.sql("SELECT hilbert_index(array(1, 2), 0)").head()
    }
  }

  test("morton_index and quantile_buckets match the Column formulations; NaN and null handling") {
    // morton_index == the shiftleft/shiftright interleave Column form
    val df = (0 until 512).map(i => (i % 64, (i * 7) % 64)).toDF("a", "b")
    val colForm = (0 until 6).flatMap { j => Seq(
      shiftleft(shiftright(col("a"), j).bitwiseAND(lit(1)).cast("long"), j * 2),
      shiftleft(shiftright(col("b"), j).bitwiseAND(lit(1)).cast("long"), j * 2 + 1))
    }.reduce(_ + _)
    df.select(expr("morton_index(array(a, b), 6)").as("native"),
        colForm.as("column")).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))

    // quantile_buckets == Σ when(v >= bound, 1), INCLUDING the SQL NaN
    // ordering (NaN lands in the top bucket, not bucket 0)
    val vals = Seq(0.0, 1.0, 2.0, 3.5, 5.0, 7.25, 100.0, Double.NaN).toDF("v")
    val chain = Seq(1.0, 3.5, 7.25)
      .map(b => when(col("v") >= lit(b), 1).otherwise(0)).reduce(_ + _)
    vals.select(
        element_at(expr("quantile_buckets(array(v), '1.0,3.5,7.25')"), 1)
          .as("native"),
        chain.as("column")).collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1), s"$r"))

    // null element buckets to 0; unsorted bounds refused
    val n = spark.sql(
      "SELECT quantile_buckets(array(cast(null as double)), '1.0,2.0')").head()
    assert(n.getSeq[Int](0) == Seq(0))
    intercept[IllegalArgumentException] {
      spark.sql("SELECT quantile_buckets(array(1.0), '2.0,1.0')").head()
    }
    // codegen == interpreted through the composed zval expression
    val conf = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(conf)
    def eval() = df.select(expr(
        "hilbert_index(quantile_buckets(array(cast(a as double), cast(b as double)), " +
        "'8.0,16.0,24.0|10.0,20.0,30.0'), 2)"))
      .collect().toIndexedSeq.map(_.getLong(0))
    try {
      spark.conf.set(conf, "true");  val gen = eval()
      spark.conf.set(conf, "false"); val interp = eval()
      assert(gen == interp)
    } finally spark.conf.set(conf, before)
  }

  test("curve kernels: empty-array origin, >63-total-bit loud refusal, quantile_buckets canonicalization") {
    // empty coordinate array = origin for BOTH curves (hilbert used to AIOOBE)
    val empty = "cast(array() as array<int>)"
    assert(spark.sql(s"SELECT hilbert_index($empty, 3)").head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT morton_index($empty, 3)").head().getLong(0) == 0L)
    // n*bits > 63 would silently wrap shift amounts mod 64 → colliding
    // indices; both kernels must refuse loudly instead
    val wide = (1 to 8).map(i => s"cast($i as int)").mkString("array(", ",", ")")
    intercept[Exception] {
      spark.sql(s"SELECT morton_index($wide, 8)").head() // 64 total bits
    }
    intercept[Exception] {
      spark.sql(s"SELECT hilbert_index($wide, 8)").head()
    }
    // 63 total bits is still fine
    spark.sql(s"SELECT morton_index($wide, 7), hilbert_index($wide, 7)").head()

    // two semantically identical quantile_buckets instances must compare
    // equal (spec-String field, not reference-compared double[][]) so
    // CSE/exchange-reuse canonicalization can deduplicate them
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit0 = Literal.create(Seq(1.5), ArrayType(DoubleType))
    val e1 = QuantileBucketsExpr(lit0, "1.0,2.0")
    val e2 = QuantileBucketsExpr(lit0, "1.0,2.0")
    assert(e1 == e2, "case-class equality must hold for identical specs")
    assert(e1.semanticEquals(e2), "semanticEquals must hold for identical specs")
    assert(!e1.semanticEquals(QuantileBucketsExpr(lit0, "1.0,3.0")))
  }

  test("token_entropy: golden values, explode-aggregate differential, codegen parity") {
    import graft.operators.TextAnalysis
    // golden: uniform 2-token split → 1 bit; constant → 0; empty → 0
    val g = Seq((1L, "a a b b"), (2L, "a a a a"), (3L, ""), (4L, "a b c d"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.tokenEntropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(g(1L) - 1.0) < 1e-12)
    assert(g(2L) == 0.0 && g(3L) == 0.0)
    assert(math.abs(g(4L) - 2.0) < 1e-12)

    // differential vs the explode→count→Σ formulation on varied docs
    val df = texts.union(Seq((4L, "x x y z z z"), (5L, "solo")).toDF("id", "text"))
    val ref = df.select(col("id"),
        explode(split(trim(col("text")), "\\s+")).as("tk"))
      .groupBy("id", "tk").count()
      .groupBy("id").agg(
        (log2(sum("count")) -
          sum(col("count") * log2(col("count"))) / sum("count")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = df.select(col("id"),
        graft.operators.TextAnalysis.tokenEntropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ref.foreach { case (id, h) =>
      assert(math.abs(got(id) - h) < 1e-9, s"doc $id: native ${got(id)} vs ref $h")
    }

    // null → null; wrong type fails analysis; codegen == interpreted
    assert(spark.sql("SELECT token_entropy(cast(null as array<string>))").head().isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT token_entropy(array(1, 2))").head()
    }
    val conf = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(conf)
    def eval() = df.select(expr("token_entropy(split(text, ' '))"))
      .collect().toIndexedSeq.map(_.getDouble(0))
    try {
      spark.conf.set(conf, "true");  val gen = eval()
      spark.conf.set(conf, "false"); val interp = eval()
      assert(gen == interp)
    } finally spark.conf.set(conf, before)
  }

  test("fingerprint64 matches the higher-order aggregate formulation") {
    val df = texts.union(Seq((4L, "one"), (5L, "")).toDF("id", "text"))
    val toks = split(trim(col("text")), "\\s+")
    val ref = aggregate(toks, lit(0L), (acc, t) => acc * lit(1000003L) + xxhash64(t))
    val out = df.select(
      graft.operators.TextAnalysis.fingerprint(col("text")).as("native"),
      ref.as("column")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native=${r.getLong(0)} column=${r.getLong(1)}"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT fingerprint64(array(1, 2))").head()
    }
  }

  test("fingerprint64 md5_52 mode matches the hashRank52 Column fold, differs from xx") {
    import graft.operators.Curation
    val df = texts.union(Seq((4L, "one"), (5L, "")).toDF("id", "text"))
    val toks = split(trim(col("text")), "\\s+")
    // independent reference: the engine-validated 13-nibble md5 fold
    // (hashRank52 with an empty seed IS Md5Hash.hash52) inside the same
    // rolling-polynomial aggregate
    val ref = aggregate(toks, lit(0L),
      (acc, t) => acc * lit(1000003L) + Curation.hashRank52(t, ""))
    val out = df.select(
      graft.operators.TextAnalysis.fingerprint(col("text"), "md5_52").as("native"),
      ref.as("column"),
      graft.operators.TextAnalysis.fingerprint(col("text")).as("xx")).collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"native=${r.getLong(0)} column=${r.getLong(1)}")
      assert(r.getLong(0) != r.getLong(2), "md5_52 and xx modes must be distinct hashes")
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT fingerprint64(split('a b', ' '), 'nope')").head()
    }
  }

  test("minhash_sig md5_52 mode matches the hashRank52 Column formulation") {
    import graft.operators.Curation
    val df = texts.union(Seq((4L, "ab"), (5L, "one two")).toDF("id", "text"))
    val refMd5 = {
      val sh = refShingles(col("text"), 3)
      array((0 until 16).map { j =>
        array_min(transform(sh, s =>
          Curation.hashRank52(s, "") * lit(MinHashSigExpr.laneA(j))
            + lit(MinHashSigExpr.laneB(j))))
      }: _*)
    }
    val out = df.select(
      graft.operators.Dedup.minhashSignature(col("text"), 3, 16, "md5_52").as("native"),
      refMd5.as("column")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("simhash64 md5_64 mode matches the md5-nibble Column fold, differs from xx") {
    val df = texts.union(Seq((4L, "one"), (5L, "")).toDF("id", "text"))
    val toks = split(trim(col("text")), "\\s+")
    // 16-nibble md5 fold with Long wraparound == Md5Hash.hash64's bits
    def h64(t: Column): Column = (1 to 16).foldLeft(lit(0L)) { (acc, i) =>
      acc * 16 + (instr(lit("0123456789abcdef"), substring(md5(t), i, 1)) - 1)
    }
    val n = size(toks)
    val ref = (0 until 64).map { b =>
      val ones = size(filter(toks, t => shiftright(h64(t), b).bitwiseAND(lit(1L)) === 1L))
      when(ones * 2 > n, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val out = df.select(
      graft.operators.Dedup.simhash64(col("text"), "md5_64").as("native"),
      ref.as("column"),
      graft.operators.Dedup.simhash64(col("text")).as("xx")).collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"native=${r.getLong(0)} column=${r.getLong(1)}")
      assert(r.getLong(0) != r.getLong(2), "md5_64 and xx modes must be distinct hashes")
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(split('a b', ' '), 'nope')").head()
    }
  }

  test("clf_score matches the aggregate-HOF formulation (md5 mode)") {
    import graft.operators.Curation
    val weights = Array.tabulate(256)(b => (b * 2654435761L % 1000).toDouble / 1000 - 0.5)
    val wlit = array(weights.map(lit).toIndexedSeq: _*)
    val df = texts.union(Seq((4L, ""), (5L, "one")).toDF("id", "text"))
    val toks = split(trim(col("text")), "\\s+")
    // the round-7 interpreted formulation, kept as the reference: fold
    // w[md5-bucket(seed‖token)] over tokens, mean-pool, add bias
    val ref = lit(0.1) + aggregate(toks, lit(0.0),
      (acc, t) => acc + element_at(wlit, Curation.hashBucket256(t, "qw1") + 1)
    ) / size(toks)
    val out = df.select(
      call_function("clf_score", toks, lit(weights.mkString(",")),
        lit(0.1), lit("qw1"), lit("md5")).as("native"),
      ref.as("column")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native=${r.getDouble(0)} column=${r.getDouble(1)}"))
    // null tokens array → null margin, matching the HOF's null fold
    val n = spark.sql(
      "SELECT clf_score(cast(null as array<string>), '" +
        weights.mkString(",") + "', 0.1, 'qw1', 'md5')").head()
    assert(n.isNullAt(0))
  }

  test("clf_score xxhash64 mode: any model width, deterministic, seed-sensitive") {
    val w17 = Array.tabulate(17)(i => i * 0.1 - 0.5)
    def margins(seed: String): Seq[Double] = texts.select(
      call_function("clf_score", split(trim(col("text")), "\\s+"),
        lit(w17.mkString(",")), lit(0.0), lit(seed), lit("xxhash64")).as("m"))
      .collect().toIndexedSeq.map(_.getDouble(0))
    val a = margins("s1")
    assert(a == margins("s1"), "same seed must reproduce identical scores")
    assert(a != margins("s2"), "changing the seed must change bucket assignment")
    // a mean of weights stays within the weight range
    a.foreach(v => assert(v >= w17.min - 1e-12 && v <= w17.max + 1e-12))
    // md5 mode is pinned to 256 buckets; unknown modes fail analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT clf_score(split('a', ' '), '1.0,2.0', 0.0, 's', 'md5')").head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT clf_score(split('a', ' '), '1.0', 0.0, 's', 'nope')").head()
    }
  }

  test("langIdFrame agrees with the Column-form langId") {
    import graft.operators.TextAnalysis
    val df = texts.union(Seq(
      (4L, "el que la y que en"), (5L, "le et les des une"),
      (6L, "der und ist ein nicht"), (7L, "xx yy zz")).toDF("id", "text"))
    val frame = TextAnalysis.langIdFrame(df, "text")
      .select(col("id"), col("pred_lang")).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val column = df.select(col("id"), TextAnalysis.langId(col("text")).as("p"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(frame == column)
    assert(frame(4L) == "es" && frame(5L) == "fr" && frame(6L) == "de" && frame(7L) == "und")
  }

  test("l2_normalize matches the Column formulation; zero vector passes through") {
    val df = Seq(
      Array(3.0f, 4.0f), Array(-1.5f, 2.5f, 0.5f), Array(0.0f, 0.0f)
    ).toDF("v")
    val norm = sqrt(aggregate(col("v"), lit(0d), (a, x) => a + x.cast("double") * x.cast("double")))
    val ref = transform(col("v"), x =>
      when(norm === 0d, lit(0.0f)).otherwise((x.cast("double") / norm).cast("float")))
    val out = df.select(expr("l2_normalize(v)").as("native"), ref.as("column")).collect()
    out.foreach(r => assert(r.getSeq[Float](0) == r.getSeq[Float](1)))
    // unit length (within float rounding) for non-zero inputs
    val n2 = df.filter(aggregate(col("v"), lit(0d), (a, x) => a + x.cast("double")) =!= 0d)
      .select(sqrt(aggregate(expr("l2_normalize(v)"), lit(0d),
        (a, x) => a + x.cast("double") * x.cast("double"))).as("n")).collect()
    n2.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-6))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT l2_normalize(array('a'))").head()
    }
    // a null LANE is an invalid embedding → whole result null (reading
    // the slot as 0.0 would fabricate a direction), in both eval modes
    val conf = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(conf)
    try Seq("true", "false").foreach { m =>
      spark.conf.set(conf, m)
      val r = spark.sql(
        "SELECT l2_normalize(array(cast(1.0 as float), cast(null as float))) AS a, " +
        "quantize_i8(array(cast(1.0 as float), cast(null as float))) AS b").head()
      assert(r.isNullAt(0) && r.isNullAt(1), s"mode=$m")
    } finally spark.conf.set(conf, before)
  }

  test("mat_project matches the zip_with/aggregate Column formulation; codegen parity") {
    import graft.functions.MatCodec
    val mean = Array(1.0f, -2.0f, 0.5f)
    val basis = Array(Array(0.5f, 0.25f, -1.0f), Array(2.0f, 0.0f, 3.0f))
    val model = MatCodec.serialize(mean, basis)
    val df = Seq(
      Array(3.0f, 4.0f, -1.0f), Array(0.0f, 0.0f, 0.0f), Array(-2.5f, 7.0f, 0.125f)
    ).toDF("v")
    // reference: y_j = Σ_i basis_j_i · (x_i − μ_i) via higher-order fns
    def dot(row: Array[Float]): org.apache.spark.sql.Column =
      aggregate(
        zip_with(col("v"),
          typedLit(mean.zip(row)), // (μ_i, b_i) pairs
          (x, mb) => (x.cast("double") - mb.getField("_1").cast("double")) *
            mb.getField("_2").cast("double")),
        lit(0d), (a, x) => a + x)
    val ref = array(basis.map(r => dot(r).cast("float")).toIndexedSeq: _*)
    val out = df.select(
      call_function("mat_project", lit(model), col("v")).as("native"),
      ref.as("column")).collect()
    out.foreach { r =>
      r.getSeq[Float](0).zip(r.getSeq[Float](1)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-5f, s"$a vs $b") }
    }
    // null lane → null result, in BOTH eval modes; wrong width is loud
    val conf = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(conf)
    try Seq("true", "false").foreach { m =>
      spark.conf.set(conf, m)
      val r = spark.sql(
        "SELECT mat_project(X'" + model.map("%02x".format(_)).mkString + "', " +
          "array(cast(1.0 as float), cast(null as float), cast(0.0 as float))) AS p").head()
      assert(r.isNullAt(0), s"mode=$m")
    } finally spark.conf.set(conf, before)
    val e = intercept[Exception] {
      Seq(Array(1.0f)).toDF("v")
        .select(call_function("mat_project", lit(model), col("v"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("quantize_i8: scale, truncation, clamp, zero vector, dequantization error") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),   // maxAbs 1.0 → scale 127
      (2L, Array(0.0f, 0.0f)),           // zero vector → scale 0, q all 0
      (3L, Array(2.0f))                  // single lane → exactly ±127
    ).toDF("id", "v")
    val out = df.select(col("id"), expr("quantize_i8(v)").as("qz"))
      .select(col("id"), col("qz.scale"), col("qz.q"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Byte](2)))).toMap
    assert(out(1L)._1 == 127.0)
    assert(out(1L)._2 == Seq[Byte](63, -127, 31)) // trunc(0.5*127)=63, trunc(0.25*127)=31
    assert(out(2L) == ((0.0, Seq[Byte](0, 0))))
    assert(out(3L)._2 == Seq[Byte](127))
    // dequantization x̂ = q/scale reconstructs within one quantization step
    val err = df.filter(col("id") === 1L)
      .select(expr("quantize_i8(v)").as("qz"), col("v"))
      .select(max(abs(expr("zip_with(v, qz.q, (x, q) -> abs(cast(x as double) - q / qz.scale))")
        .getItem(0))).as("e")).head().getDouble(0)
    assert(err <= 1.0 / 127 + 1e-9)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT quantize_i8(array('a'))").head()
    }
  }

  test("l2_normalize and quantize_i8 null out NaN/Inf lanes (no fabricated values)") {
    val df = Seq(
      (1L, Array(1.0f, Float.NaN)),
      (2L, Array(1.0f, Float.PositiveInfinity)),
      (3L, Array(1.0f, 2.0f))
    ).toDF("id", "v")
    val out = df.select(col("id"),
        expr("l2_normalize(v)").as("n"), expr("quantize_i8(v)").as("qz"))
      .collect().map(r => r.getLong(0) -> ((r.isNullAt(1), r.isNullAt(2)))).toMap
    assert(out(1L) == ((true, true)), "NaN lane must null the result")
    assert(out(2L) == ((true, true)), "Inf lane must null the result")
    assert(out(3L) == ((false, false)))
  }

  test("bloom_might_contain: no false negatives, literal-only, codegen agrees") {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(1000, 0.01)
    (1L to 500L).foreach(i => bf.putLong(i * 7))
    val bytes = { val o = new java.io.ByteArrayOutputStream(); bf.writeTo(o); o.toByteArray }
    val df = spark.range(1, 1001).select((col("id") * 7).as("h"))
    def hits(): Long = df.filter(
      call_function("bloom_might_contain", lit(bytes), col("h"))).count()
    // every inserted value must hit (no false negatives); false positives
    // bounded loosely by fpp on the 500 non-inserted values
    val n = hits()
    assert(n >= 500 && n <= 560, s"got $n")
    val conf = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      assert(hits() == n, "interpreted mode must agree with codegen")
    } finally spark.conf.set(conf, before)
    // a non-literal bloom would deserialize per row — rejected at analysis
    // (the probe must be a genuine ATTRIBUTE of binary type: analysis-time
    // foldability is what the expression checks)
    intercept[org.apache.spark.sql.AnalysisException] {
      df.withColumn("bloom_col", lit(bytes))
        .select(call_function("bloom_might_contain", col("bloom_col"), col("h"))).head()
    }
  }

  test("fold_text: nfc composes, strip drops marks, fold lowers + collapses ws") {
    // golden values, escapes only — NFC vs NFD must be byte-exact
    val rows = Seq(
      (1L, "Café"),                            // NFD é
      (2L, "Café"),                             // NFC é
      (3L, "NAÏVE über STRAßE"),      // Ï ü ß (ß has no decomposition)
      (4L, "  Café\t\tDu  MONDE  "),      // ws runs incl. vertical tab
      (5L, "")
    ).toDF("id", "s")
    val out = rows.select(col("id"),
        expr("fold_text(s, 'nfc')").as("nfc"),
        expr("fold_text(s, 'strip')").as("strip"),
        expr("fold_text(s, 'fold')").as("fold"))
      .orderBy(col("id")).collect()
    assert(out(0).getString(1) == "Café")        // NFD composed
    assert(out(0).getString(2) == "Cafe")
    assert(out(0).getString(3) == "cafe")
    assert(out(1).getString(2) == "Cafe")             // NFC stripped the same
    assert(out(2).getString(2) == "NAIVE uber STRAßE")
    assert(out(2).getString(3) == "naive uber straße") // lower(ß)=ß, no ss expansion
    assert(out(3).getString(3) == "cafe du monde") // stripped, lowered, ws-collapsed, trimmed
    assert(out(4).getString(3) == "")
    // null in → null out
    val n = rows.select(expr("fold_text(cast(null as string), 'fold')")).head()
    assert(n.isNullAt(0))
  }

  test("fold_text strip mode matches an independent \\p{M}-regex formulation") {
    val refStrip = udf((s: String) => if (s == null) null else
      java.text.Normalizer.normalize(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
          .replaceAll("\\p{M}+", ""),
        java.text.Normalizer.Form.NFC))
    val df = texts.union(Seq(
      (4L, "Café NAÏVE"), (5L, "ÉéÏüß"),
      (6L, "plain ascii stays put")).toDF("id", "text"))
    val out = df.select(
      expr("fold_text(text, 'strip')").as("native"),
      refStrip(col("text")).as("ref")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"native=${r.getString(0)} ref=${r.getString(1)}"))
  }

  test("fold_text rejects bad modes and non-string inputs at analysis") {
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT fold_text('x', 'nfkc')").head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT fold_text(array('x'), 'nfc')").head()
    }
  }

  test("pq_encode/pq_score: nearest-centroid codes, reconstruction dot, codegen parity") {
    // hand codebook: m=2 subvectors of dim 2, k=2 centroids each
    val cb = Array(
      Array(Array(0f, 0f), Array(1f, 1f)),
      Array(Array(0f, 1f), Array(2f, 2f)))
    val bytes = PqCodec.serialize(cb)
    assert(PqCodec.deserialize(bytes).map(_.map(_.toSeq).toSeq).toSeq ==
      cb.map(_.map(_.toSeq).toSeq).toSeq)
    val df = Seq(
      (1L, Array(0.9f, 0.9f, 1.9f, 2.1f)),   // → codes [1, 1]
      (2L, Array(0.1f, -0.1f, 0.2f, 0.9f)),  // → codes [0, 0]
      (3L, Array(0.5f, 0.5f, 1.0f, 1.5f))    // sub0 equidistant → tie to index 0
    ).toDF("id", "v")
    def run(): Seq[(Long, Seq[Byte], Double)] = df.select(col("id"),
        call_function("pq_encode", lit(bytes), col("v")).as("code"))
      .select(col("id"), col("code"),
        call_function("pq_score", lit(bytes), col("code"),
          array(lit(1.0f), lit(1.0f), lit(1.0f), lit(1.0f))).as("s"))
      .orderBy(col("id")).collect().toIndexedSeq
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2)))
    val out = run()
    assert(out(0)._2 == Seq[Byte](1, 1))
    assert(out(0)._3 == (1.0 + 1.0) + (2.0 + 2.0))   // recon [1,1,2,2] · 1⃗
    assert(out(1)._2 == Seq[Byte](0, 0))
    assert(out(1)._3 == (0.0 + 0.0) + (0.0 + 1.0))
    assert(out(2)._2.head == 0.toByte, "equidistant subvector ties to the smaller index")
    // codegen and interpreted agree
    val conf = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "true");  val gen = run()
      spark.conf.set(conf, "false"); assert(run() == gen)
    } finally spark.conf.set(conf, before)
    // non-literal codebooks and wrong types fail ANALYSIS
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("pq_encode", col("v").cast("binary"), col("v"))).head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("pq_encode", lit(bytes), lit("nope"))).head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("pq_score", lit(bytes), col("v"), col("v"))).head()
    }
  }

  test("clf_score expressions with equal weights are semantically equal (CSE-able)") {
    // weights ride a Seq, not an Array: two structurally identical calls
    // must canonicalize equal or Catalyst CSE would score the corpus twice
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal => CLit}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val child = BoundReference(0, ArrayType(StringType), nullable = true)
    val a = ClfScoreExpr(child, IndexedSeq(0.1, 0.2), 0.5, "s", "xxhash64")
    val b = ClfScoreExpr(child, IndexedSeq(0.1, 0.2), 0.5, "s", "xxhash64")
    assert(a == b && a.semanticEquals(b) && a.hashCode == b.hashCode)
    assert(a != ClfScoreExpr(child, IndexedSeq(0.1, 0.3), 0.5, "s", "xxhash64"))
  }

  test("clf_score malformed weight strings fail with a descriptive error") {
    val e = intercept[Exception] {
      spark.sql("SELECT clf_score(array('a'), '0.1,zap,0.3', 0.5, 's', 'xxhash64')").head()
    }
    assert(e.getMessage.contains("comma-separated list of doubles"))
  }

  test("heavy_hitters: MG guarantee, undercount bound, layout independence of top-k") {
    import spark.implicits._
    // planted Zipf-ish stream: "hot" 400×, "warm" 120×, tail 1× each
    val stream = Seq.fill(400)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 600).map(i => s"tail$i")
    val n = stream.size
    val budget = 64
    def summary(parts: Int): Map[String, Long] =
      stream.toDF("item").repartition(parts)
        .agg(org.apache.spark.sql.functions.call_function("heavy_hitters",
          col("item"), org.apache.spark.sql.functions.lit(budget)).as("hh"))
        .select(org.apache.spark.sql.functions.explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(1, 7, 32).foreach { parts =>
      val s = summary(parts)
      assert(s.size <= budget)
      // every item with true freq > n/budget is present, undercounted ≤ n/budget
      assert(s.contains("hot") && s.contains("warm"),
        s"guaranteed heavy hitters missing at $parts partitions: ${s.keySet.take(5)}")
      assert(s("hot") <= 400 && s("hot") >= 400 - n / budget)
      assert(s("warm") <= 120 && s("warm") >= 120 - n / budget)
    }
    // the two-pass operator output is layout-INDEPENDENT (exact recount)
    def topk(parts: Int) = graft.operators.TextAnalysis.approxTopK(
        stream.toDF("item").repartition(parts), topK = 2, budget = budget)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = Seq(("hot", 400L), ("warm", 120L))
    Seq(1, 7, 32).foreach(p => assert(topk(p) == expected, s"at $p partitions"))
    // analysis-time checks: non-string item (type check), non-literal
    // budget (registration-time literal match), bad approxTopK budget
    intercept[org.apache.spark.sql.AnalysisException] {
      stream.toDF("item").agg(org.apache.spark.sql.functions.call_function(
        "heavy_hitters", org.apache.spark.sql.functions.lit(1),
        org.apache.spark.sql.functions.lit(8))).collect()
    }
    intercept[IllegalArgumentException] {
      stream.toDF("item").agg(org.apache.spark.sql.functions.call_function(
        "heavy_hitters", col("item"), col("item"))).collect()
    }
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.approxTopK(stream.toDF("item"), 10, 5)
    }
  }

  test("expressions agree between codegen and interpreted modes") {
    val conf = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(conf)
    def eval(): Seq[(Long, Double, Int, Long, Long, Double, Double, String)] = texts.select(
        expr("simhash64(split(text, ' '))").as("h"),
        expr("cosine_sim(array(cast(1.0 as float), cast(2.0 as float)), " +
             "array(cast(3.0 as float), cast(4.0 as float)))").as("c"),
        expr("marker_count(split(text, ' '), 'the,of,my')").as("m"),
        expr("fingerprint64(split(text, ' '))").as("f"),
        expr("fingerprint64(split(text, ' '), 'md5_52')").as("f5"),
        expr("clf_score(split(text, ' '), '" +
          Array.tabulate(256)(_ * 0.01 - 1.0).mkString(",") +
          "', 0.5, 'cg', 'md5')").as("s"),
        expr("clf_score(split(text, ' '), '0.1,0.2,0.3', 0.5, 'cg', 'xxhash64')").as("sx"),
        expr("fold_text(upper(text) || ' Cafe' || chr(769), 'fold')").as("ft"))
      .collect().toIndexedSeq
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getString(7)))
    try {
      spark.conf.set(conf, "true");  val gen = eval()
      spark.conf.set(conf, "false"); val interp = eval()
      assert(gen == interp)
    } finally spark.conf.set(conf, before)
  }
}
