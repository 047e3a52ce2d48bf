package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs3 = Seq(
    (1L, "a b b"),
    (2L, "a c"),
    (3L, "b d")).toDF("doc_id", "text")

  test("tfidfWeights: tf·ln(N/df) by hand; maxDf prunes stop terms") {
    val w = Retrieval.tfidfWeights(docs3, "doc_id", "text", maxDf = 10L)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("doc_freq"), r.getAs[Double]("w"))).toMap
    // N=3; df: a=2, b=2, c=1, d=1
    // Spark math exprs evaluate via StrictMath (JVM-reproducible)
    assert(w(("a", 1L)) == ((1L, 2L, StrictMath.log(3.0 / 2))))
    assert(w(("b", 1L)) == ((2L, 2L, 2 * StrictMath.log(3.0 / 2))))
    assert(w(("c", 2L)) == ((1L, 1L, StrictMath.log(3.0))))
    assert(w.size == 6)
    // maxDf=1 drops both 2-doc terms, keeping only the singletons
    val pruned = Retrieval.tfidfWeights(docs3, "doc_id", "text", maxDf = 1L)
      .select("term").as[String].collect().toSet
    assert(pruned == Set("c", "d"))
    intercept[IllegalArgumentException] {
      Retrieval.tfidfWeights(docs3, "doc_id", "text", maxDf = 0L)
    }
  }

  test("tfidfCosinePairs: identical docs hit 1.0, disjoint docs absent, bound enforced") {
    val df = Seq(
      (1L, "x x y z"), (2L, "x x y z"),   // identical → cosine 1.0
      (3L, "p q"), (4L, "r s"),           // disjoint from everything
      (5L, "x y"))                        // shares terms with 1,2
      .toDF("doc_id", "text")
    val out = Retrieval.tfidfCosinePairs(df, "doc_id", "text",
        minCosine = 0.0, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L || a == 4L || b == 4L })
    assert(out.contains((1L, 5L)) && out((1L, 5L)) > 0 && out((1L, 5L)) < 1.0)
    assert(out.keySet.forall { case (a, b) => a < b })
    // threshold cuts on the ROUNDED cosine
    val hi = Retrieval.tfidfCosinePairs(df, "doc_id", "text", 0.9999, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hi == Set((1L, 2L)))
    intercept[IllegalArgumentException] {
      Retrieval.tfidfCosinePairs(df, "doc_id", "text", 0.5, 10L, maxDocs = 3L)
    }
  }

  test("bm25TopK: exact hand score, tf saturation, length normalization, guards") {
    // one query term "t"; doc 1 has tf=2 in 4 tokens, doc 2 tf=1 in 2
    // tokens, doc 3 no hit; doc 4 pads avgdl
    val df = Seq(
      (1L, "t t u v"), (2L, "t w"), (3L, "u v"), (4L, "u v w x"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(df, "doc_id", "text", Seq("t"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val n = 4.0; val dfq = 2.0; val avgdl = (4 + 2 + 2 + 4) / 4.0
    val idf = StrictMath.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
    // mirror the operator's float path exactly: (k1+1) as the folded
    // double sum, decimal(30,12) partial, then round(…,4)
    val k1p1 = 1.2 + 1.0
    def s(tf: Double, dl: Double) =
      BigDecimal(idf * tf * k1p1 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc1: tf=2, dl=4 → 2·2.2/(2+1.2·(0.25+0.75·4/3)) = 4.4/3.5 ≈ 1.257·idf
    // doc2: tf=1, dl=2 → 1·2.2/(1+1.2·(0.25+0.75·2/3)) = 2.2/1.9 ≈ 1.158·idf
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out.toMap == Map(1L -> s(2, 4), 2L -> s(1, 2)))
    // tf SATURATES: doubling tf (even in a doc only twice as long)
    // gains well under 2× the score
    assert(s(2, 4) < 2 * s(1, 2))
    // k cuts deterministically
    assert(Retrieval.bm25TopK(df, "doc_id", "text", Seq("t"), 1)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // multi-term queries sum per-term contributions; unseen terms add 0
    val multi = Retrieval.bm25TopK(df, "doc_id", "text", Seq("t", "zzz"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(multi == Map(1L -> s(2, 4), 2L -> s(1, 2)))
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(df, "doc_id", "text", Nil, 5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(df, "doc_id", "text", Seq("t"), 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(df, "doc_id", "text", Seq("t"), 5, b = 1.5)
    }
  }

  test("tfidfQueryTopK: hand cosine, full-vocab norms, query-absent docs dropped") {
    val out = Retrieval.tfidfQueryTopK(docs3, "doc_id", "text", Seq("b"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val idfB = StrictMath.log(3.0 / 2); val idfD = StrictMath.log(3.0)
    def r4(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc1 (a b b): dot = 2·idfB·idfB, norm² = idfB²+( 2idfB)² = 5idfB²
    //   → cosine = 2/√5; doc3 (b d): idfB/√(idfB²+idfD²); doc2 has no b
    val s1 = r4(2 * idfB * idfB /
      (math.sqrt(idfB * idfB + 4 * idfB * idfB) * math.sqrt(idfB * idfB)))
    val s3 = r4(idfB * idfB /
      (math.sqrt(idfB * idfB + idfD * idfD) * math.sqrt(idfB * idfB)))
    assert(out.map(_._1).toSeq == Seq(1L, 3L))
    assert(out.toMap == Map(1L -> s1, 3L -> s3))
    assert(s1 == 0.8944) // 2/√5
    intercept[IllegalArgumentException] {
      Retrieval.tfidfQueryTopK(docs3, "doc_id", "text", Nil, 5)
    }
  }

  test("rrfFuse: hand fusion, rank ties by id, missing-from-one-ranking handled") {
    val a = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("doc_id", "score")
    val b = Seq((2L, 0.95), (3L, 0.6)).toDF("doc_id", "score")
    val out = Retrieval.rrfFuse(Seq(("a", a), ("b", b)), "doc_id", "score",
        topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def term(r: Int) = BigDecimal(1.0 / (60 + r))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // ranks: a → 1:1, 2:2, 3:3; b → 2:1, 3:2
    val exp = Map(
      1L -> r6(term(1)),            // only ranking a
      2L -> r6(term(2) + term(1)),
      3L -> r6(term(3) + term(2)))
    assert(out.toMap == exp)
    assert(out.map(_._1).toSeq == Seq(2L, 3L, 1L)) // fused order
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(("a", a)), "doc_id", "score", 5)
    }
  }

  test("dirichletQlTopK: hand-computed scores, duplicate query term weights, unmatched docs rank by length") {
    // corpus: d1 has the term twice in 4 tokens, d2 once in 4, d3 none
    // in 2, d4 none in 10. |C| = 20, cf(hit) = 3.
    val df = Seq(
      (1L, "hit hit x y"), (2L, "hit a b c"), (3L, "p q"),
      (4L, "r s t u v w m n o z")
    ).toDF("doc_id", "text")
    val mu = 10.0
    val out = Retrieval.dirichletQlTopK(df, "doc_id", "text",
        Seq("hit", "hit"), k = 4, mu = mu)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def score(tf: Int, dl: Int): Double = {
      val boost = if (tf > 0) 2.0 * math.log(1.0 + tf * 20.0 / (mu * 3.0)) else 0.0
      BigDecimal(boost + 2.0 * math.log(mu / (dl + mu)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out == Map(1L -> score(2, 4), 2L -> score(1, 4),
      3L -> score(0, 2), 4L -> score(0, 10)), s"got $out")
    // model shape: more matches rank higher at equal length; among
    // unmatched docs the SHORTER ranks higher (less smoothing penalty)
    assert(out(1L) > out(2L) && out(3L) > out(4L))
    intercept[IllegalArgumentException] {
      Retrieval.dirichletQlTopK(df, "doc_id", "text", Seq(), 5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.dirichletQlTopK(df, "doc_id", "text", Seq("hit"), 5, mu = 0.0)
    }
  }

  test("bm25BulkTopK: one-query bulk equals the single-query ranker; queries isolate; group-limited plan") {
    val df = Seq(
      (1L, "spark shuffle join big"), (2L, "join join vector tiny"),
      (3L, "vector scan"), (4L, "unrelated words entirely here"),
      (5L, "join")
    ).toDF("doc_id", "text")
    val qs = Seq((10L, "join vector"), (20L, "scan")).toDF("query_id", "qtext")
    val bulk = Retrieval.bm25BulkTopK(df, "doc_id", "text", qs,
        "query_id", "qtext", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // the single-query ranker on the same terms must agree doc-for-doc
    val single = Retrieval.bm25TopK(df, "doc_id", "text",
        Seq("join", "vector"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val q10 = bulk.filter(_._1 == 10L).sortBy(_._4).map(t => (t._2, t._3))
    assert(q10.toSeq == single.toSeq, s"bulk=$q10 single=${single.toSeq}")
    // disjoint query sees ONLY its matching docs
    val q20 = bulk.filter(_._1 == 20L).map(_._2).toSet
    assert(q20 == Set(3L), s"query 'scan' must match doc 3 alone, got $q20")
    // the per-query top-k is group-limited, not a full per-query sort
    val plan = Retrieval.bm25BulkTopK(df, "doc_id", "text", qs,
      "query_id", "qtext", k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("bm25TopK plan: postings filter before exchange, stats sides broadcast") {
    val df = (1L to 200L).map(i => (i, s"w$i t common")).toDF("doc_id", "text")
    val q = Retrieval.bm25TopK(df, "doc_id", "text", Seq("t"), 5)
    val plan = q.queryExecution.executedPlan.toString
    // df/stats arrive via broadcast, and the top-k is TakeOrdered — no
    // global sort node
    assert(plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
