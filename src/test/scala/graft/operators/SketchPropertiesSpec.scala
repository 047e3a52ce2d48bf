package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-style pins for the sketch/ranking operators: invariants that
  * must hold on ARBITRARY inputs, not just handpicked fixtures. Uses raw
  * ScalaCheck generators with fixed seeds (no scalatestplus bridge in the
  * offline dependency set) — deterministic, reproducible cases.
  */
class SketchPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word = Gen.oneOf("alpha", "beta", "gamma", "δelta", "x", "the", "42", "a-b")
  private val textGen: Gen[String] =
    Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("property: identical texts always produce identical minhash/simhash/fingerprint") {
    samples(textGen, 8).foreach { t =>
      val df = Seq((1L, t), (2L, t)).toDF("id", "text")
      val r = df.select(
        Dedup.minhashSignature(col("text"), 3, 16).as("mh"),
        Dedup.simhash64(col("text")).as("sh"),
        TextAnalysis.fingerprint(col("text")).as("fp")).collect()
      assert(r(0).getSeq[Long](0) == r(1).getSeq[Long](0), s"minhash diverged for: $t")
      assert(r(0).getLong(1) == r(1).getLong(1))
      assert(r(0).getLong(2) == r(1).getLong(2))
    }
  }

  test("property: jaccard pairs canonical, bounded in [0,1], exact 1.0 on planted dup") {
    samples(Gen.listOfN(3, textGen), 6).foreach { texts =>
      val withDup = texts :+ texts.head // plant an exact duplicate of doc 0
      val docs = withDup.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 2,
        threshold = 0.0, maxDf = 100).collect()
      pairs.foreach { r =>
        val j = r.getAs[Double]("jaccard")
        assert(j >= 0.0 && j <= 1.0)
        assert(r.getLong(0) < r.getLong(1)) // canonical order, no dupes
      }
      val dupPair = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == texts.length.toLong)
      assert(dupPair.exists(_.getAs[Double]("jaccard") == 1.0),
        s"planted dup not found at jaccard 1.0 in ${pairs.mkString(",")}")
    }
  }

  test("property: top_k_by equals sort-then-take on random scored rows") {
    val rowsGen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(-100, 100), Gen.chooseNum(0L, 20L))))
    samples(rowsGen, 8).foreach { rows =>
      val df = rows.map { case (s, i) => (s.toDouble, i) }.toDF("score", "id")
        .repartition(4)
      val got = df.agg(expr("top_k_by(score, id, 5)").as("tk"))
        .selectExpr("inline(tk)").collect()
        .map(r => (r.getDouble(0), r.getLong(1))).toSeq
      val ref = rows.map { case (s, i) => (s.toDouble, i) }
        .sortBy { case (s, i) => (-s, i) }.take(5)
      assert(got == ref, s"got=$got want=$ref rows=$rows")
    }
  }

  test("property: cosine_sim symmetric, self-similarity 1.0 for non-zero vectors") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-5, 5)).map(_.map(_.toFloat).toArray)
      .suchThat(v => v.exists(_ != 0f))
    val vs = samples(vecGen, 8)
    vs.zip(vs.reverse).foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        round(expr("cosine_sim(a, b)"), 9).as("ab"),
        round(expr("cosine_sim(b, a)"), 9).as("ba"),
        round(expr("cosine_sim(a, a)"), 6).as("aa")).head()
      assert(r.getDouble(0) == r.getDouble(1))
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-5)
    }
  }

  test("property: changelog compaction is associative across arbitrary batch splits") {
    // THE property the streaming CDC sink's convergence rests on:
    // compact(compact(A) ∪ B) == compact(A ∪ B) for any split, any
    // arrival order — state ∪ batch re-compaction per micro-batch then
    // equals one global compaction. Versions are drawn from a SMALL
    // range so cross-batch collisions on (key, version) happen; ops
    // weighted to mix inserts/updates/deletes.
    import graft.sinks.DataSink
    val changeGen = for {
      k <- Gen.chooseNum(1L, 5L)
      v <- Gen.chooseNum(1L, 8L)
      op <- Gen.frequency((2, Gen.const("I")), (3, Gen.const("U")),
        (2, Gen.const("D")))
      payload <- Gen.oneOf("p", "q", "r")
    } yield (k, s"$payload$v$op", op, v) // payload keyed by (v, op) so
                                         // equal-rank ties carry EQUAL
                                         // payloads (the documented contract)
    samples(Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, changeGen)), 10)
      .zipWithIndex.foreach { case (changes, i) =>
        val split = (i % (changes.size - 1)) + 1
        val (a, b) = changes.splitAt(split)
        def df(rows: Seq[(Long, String, String, Long)]) =
          rows.toDF("k", "v", "op", "version")
        def canon(x: org.apache.spark.sql.DataFrame) =
          x.collect().map(r => (r.getLong(0), r.getString(1),
            r.getString(2), r.getLong(3))).toSet
        val incremental = canon(DataSink.compactChangelog(
          DataSink.compactChangelog(df(a), Seq("k")).unionByName(df(b)), Seq("k")))
        val global = canon(DataSink.compactChangelog(df(changes), Seq("k")))
        assert(incremental == global,
          s"case $i: split=$split\nincr=$incremental\nglobal=$global\nchanges=$changes")
      }
  }

  test("property: winnow fingerprints are a subset of the gram hashes and every doc with a gram has one") {
    samples(textGen, 8).foreach { t =>
      val df = Seq((1L, t)).toDF("doc_id", "text")
      val fps = Dedup.winnowFingerprints(df, "doc_id", "text", k = 2, w = 3)
        .collect().map(_.getLong(1)).toSet
      val toks = t.trim.split("\\s+").toSeq
      if (toks.length < 2) assert(fps.isEmpty, s"sub-k doc must not fingerprint: '$t'")
      else {
        val grams = (0 to toks.length - 2).map(i => toks.slice(i, i + 2).mkString(" "))
        val hashes = grams.toDF("g").select(xxhash64(col("g")))
          .collect().map(_.getLong(0)).toSet
        assert(fps.nonEmpty, s"doc with a gram must fingerprint: '$t'")
        assert(fps.subsetOf(hashes),
          s"fingerprints must come from the doc's own gram hashes: '$t'")
      }
    }
  }
}
