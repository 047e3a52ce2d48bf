package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse LEXICAL retrieval over the documents corpus — the classic
  * inverted-index pair to the dense-embedding ANN in [[Similarity]]:
  * TF-IDF document vectors (Spärck Jones 1972) and Okapi BM25 scoring
  * (Robertson et al., TREC-3) re-expressed as Spark aggregates and
  * broadcast joins. A training-data pipeline uses these for
  * query-driven corpus audits ("which documents answer X") and as the
  * lexical side of hybrid dedup/retrieval.
  *
  * Token convention matches the rest of the corpus layer (whitespace
  * split of trimmed text — `TextAnalysis.tokens`), so every operator
  * here is DuckDB-oracle-expressible with `string_split(trim(text))`.
  *
  * Float parity with the oracle: per-pair/per-doc partial sums go
  * through DECIMAL(30,12) so partial-agg ORDER cannot move the result
  * (double addition is not associative; decimal addition is), and final
  * scores are `round(…, 4)` BEFORE any threshold/top-k cut — the
  * cut is then deterministic on both engines.
  */
object Retrieval {

  private def toks(text: Column): Column = split(trim(text), "\\s+")

  /** Exact-sum of a double expression: decimal partials, double out. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(30,12)")).cast("double")

  /** Per-(doc, term) TF-IDF weights over the `maxDf`-pruned vocabulary:
    * `w = tf · ln(N / df)`. Terms with `df > maxDf` are DROPPED — they
    * carry near-zero idf AND quadratic postings-join cost (Σ df² pairs),
    * so the prune is both the relevance and the scale lever (same role
    * as `ngramJaccardPairs`' maxDf guard). N is computed lazily in-plan
    * (1-row aggregate, broadcast) — no driver-side count.
    *
    * Output: (term, doc_id, tf, doc_freq, w).
    */
  def tfidfWeights(df: DataFrame, idCol: String, textCol: String,
                   maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"tfidfWeights: maxDf must be ≥1, got $maxDf")
    val postings = Spread.compute(df, Cols.qcol(idCol))
      .select(Cols.qcol(idCol).as("doc_id"),
        explode(toks(Cols.qcol(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") <= maxDf)
    val nDocs = df.agg(countDistinct(Cols.qcol(idCol)).as("n_docs"))
    postings
      .join(dfreq, Seq("term")) // inner: pruned terms vanish
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", log(col("n_docs").cast("double") / col("doc_freq")))
      .withColumn("w", col("tf") * col("idf"))
      .select(col("term"), col("doc_id"), col("tf"), col("doc_freq"),
        col("idf"), col("w"))
  }

  /** All document pairs with TF-IDF cosine ≥ `minCosine` (over the
    * pruned vocabulary — norms use kept terms only, consistently with
    * the dot product). EXACT baseline, quadratic in posting-list
    * lengths: the inverted-index self-join meets each pair once per
    * shared term (Σ df² candidate rows), so the input is BOUNDED —
    * refuses corpora beyond `maxDocs` rather than melting an executor.
    * The scale paths for near-dup discovery are the banded/bucketed
    * generators (`minhashPairs`, `lshNearDupPairs`); this is the
    * lexical ground truth to audit them against, and `maxDf` keeps the
    * join off stop-term posting lists.
    *
    * Output: (id_a, id_b, cosine), cosine rounded to 4 before the
    * threshold cut.
    */
  def tfidfCosinePairs(df: DataFrame, idCol: String, textCol: String,
                       minCosine: Double, maxDf: Long,
                       maxDocs: Long = 10000L): DataFrame = {
    require(minCosine >= 0 && minCosine <= 1,
      s"tfidfCosinePairs: minCosine must be in [0,1], got $minCosine")
    val n = df.count()
    require(n <= maxDocs,
      s"tfidfCosinePairs: $n docs exceeds maxDocs=$maxDocs — the inverted-index " +
        "self-join is quadratic in posting lengths; use minhashPairs/lshNearDupPairs " +
        "at corpus scale, or raise maxDocs deliberately")
    val w = tfidfWeights(df, idCol, textCol, maxDf)
    val norms = w.groupBy(col("doc_id")).agg(dsum(col("w") * col("w")).as("norm2"))
    val a = w.select(col("term"), col("doc_id").as("id_a"), col("w").as("wa"))
    val b = w.select(col("term"), col("doc_id").as("id_b"), col("w").as("wb"))
    a.join(b, Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(dsum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("doc_id").as("id_a"), col("norm2").as("na")), Seq("id_a"))
      .join(norms.select(col("doc_id").as("id_b"), col("norm2").as("nb")), Seq("id_b"))
      .withColumn("cosine",
        round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 4))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** TF-IDF query-to-document cosine top-k: the vector-space twin of
    * [[bm25TopK]] (same postings/broadcast shape — the only corpus-wide
    * passes are the posting aggregate and the norm aggregate; query-term
    * filtering happens before the scoring exchange). The query vector
    * weights each distinct term by its idf (tf=1), doc norms run over
    * the FULL maxDf-pruned vocabulary, so the score is a true cosine.
    * Scores round to 4 before the (score desc, id) top-k cut.
    */
  def tfidfQueryTopK(df: DataFrame, idCol: String, textCol: String,
                     queryTerms: Seq[String], k: Int,
                     maxDf: Long = Long.MaxValue): DataFrame = {
    require(queryTerms.nonEmpty, "tfidfQueryTopK: queryTerms must be non-empty")
    require(k >= 1, s"tfidfQueryTopK: k must be ≥1, got $k")
    val w = tfidfWeights(df, idCol, textCol, maxDf)
    val norms = w.groupBy(col("doc_id")).agg(dsum(col("w") * col("w")).as("norm2"))
    val qw = w.filter(col("term").isin(queryTerms.distinct: _*))
    val qnorm = qw.select(col("term"), col("idf")).distinct()
      .agg(dsum(col("idf") * col("idf")).as("qnorm2"))
    qw.groupBy(col("doc_id"))
      .agg(dsum(col("w") * col("idf")).as("dot"))
      .join(norms, Seq("doc_id"))
      .crossJoin(broadcast(qnorm))
      .select(col("doc_id"),
        round(col("dot") / (sqrt(col("norm2")) * sqrt(col("qnorm2"))), 4)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * combine N rankings into one — `rrf(d) = Σ_i 1/(k0 + rank_i(d))`,
    * summing only over rankings that contain d. Robust to incomparable
    * score scales (BM25 vs cosine vs recency), which is why it is the
    * standard hybrid lexical+dense fusion.
    *
    * Inputs are (tag, ranking) pairs each exposing (`idCol`, `scoreCol`);
    * ranks derive from (score desc, id asc) — rankings are TOP-K RESULTS
    * (bounded), so the per-ranking window is k rows, never corpus-scale.
    * The fused score goes through decimal partials and rounds to 6
    * before the final (rrf desc, id) top-k cut.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
              scoreCol: String, topK: Int, k0: Int = 60): DataFrame = {
    require(rankings.size >= 2, "rrfFuse: need at least 2 rankings to fuse")
    require(k0 >= 1 && topK >= 1,
      s"rrfFuse: k0 and topK must be ≥1, got k0=$k0 topK=$topK")
    val tagged = rankings.map { case (tag, df) =>
      df.select(lit(tag).as("_src"), Cols.qcol(idCol).as("_id"),
        Cols.qcol(scoreCol).cast("double").as("_score"))
    }.reduce(_ unionByName _)
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_src")).orderBy(col("_score").desc, col("_id"))
    tagged
      .withColumn("_rank", row_number().over(wnd))
      .groupBy(col("_id").as(idCol))
      .agg(round(dsum(lit(1.0) / (lit(k0) + col("_rank"))), 6).as("rrf"))
      .orderBy(col("rrf").desc, Cols.qcol(idCol))
      .limit(topK)
  }

  /** Okapi BM25 top-k retrieval for one bag-of-terms query. The 100 TB
    * shape: postings are FILTERED to the query's terms before any
    * shuffle (the exchange carries ≤ Σ df(q_t) rows — never the
    * corpus vocabulary), per-term df and the corpus (N, avgdl) stats
    * are 1-row/tiny broadcast sides, and the final top-k is a
    * TakeOrdered, not a global sort. Scores are `round(…, 4)` before
    * ordering so the k cut is engine-deterministic (ties break on
    * doc_id).
    *
    * `idf = ln(1 + (N − df + ½)/(df + ½))` (the non-negative BM25+
    * form), `score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
    *
    * Output: (doc_id, score), top `k` by (score desc, doc_id).
    */
  /** BULK BM25 — [[bm25TopK]] for a query TABLE, the serving shape: N
    * queries rank in ONE pass instead of N jobs. The postings explode
    * once and semi-join the distinct query-term set (broadcast — the
    * scan filter is a term-set membership, same pruning as the literal
    * `isin`), each surviving posting then joins the (query, term) pairs
    * (broadcast) so a posting fans out only to the queries that contain
    * its term; per-(query, doc) scores aggregate through decimal
    * partials and the per-query top-k is a rank-≤-k window —
    * `WindowGroupLimit` inserts partial+final group limits, so ≤k rows
    * per query survive each side of the exchange (the q_top_n_per_group
    * plan shape). Query terms are DISTINCT per query (set semantics,
    * matching the single-query form). Output: (query_id, doc_id, score,
    * rank).
    */
  def bm25BulkTopK(df: DataFrame, idCol: String, textCol: String,
                   queries: DataFrame, queryIdCol: String, queryTextCol: String,
                   k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"bm25BulkTopK: k must be ≥1, got $k")
    require(k1 > 0 && b >= 0 && b <= 1,
      s"bm25BulkTopK: need k1>0 and b∈[0,1], got k1=$k1 b=$b")
    val qterms = queries.select(Cols.qcol(queryIdCol).as("query_id"),
        explode(toks(Cols.qcol(queryTextCol))).as("term"))
      .distinct()
    val docs = Spread.compute(df, Cols.qcol(idCol))
      .select(Cols.qcol(idCol).as("doc_id"), toks(Cols.qcol(textCol)).as("_t"))
    val lens = docs.select(col("doc_id"), size(col("_t")).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val post = docs
      .select(col("doc_id"), size(col("_t")).as("dl"), explode(col("_t")).as("term"))
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = post.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val scored = post
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(dsum(col("contrib")), 4).as("score"))
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(byQuery).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Query-likelihood ranking with DIRICHLET smoothing (Zhai & Lafferty,
    * SIGIR 2001 — "A study of smoothing methods for language models
    * applied to ad hoc information retrieval"): the language-model third
    * member of the lexical family beside TF-IDF and BM25. Uses the
    * paper's rank-equivalent decomposition (§2.2)
    *
    *   score(q, d) = Σ_{t ∈ q∩d} c(t,q)·ln(1 + tf(t,d)·|C| / (µ·cf(t)))
    *               + |q|·ln(µ / (|d| + µ))
    *
    * so only MATCHED postings join (filtered to query terms before any
    * exchange, the BM25 shape) while the per-doc length normalization is
    * a scalar over the doc-length table — docs with no query term rank
    * by the length term alone, exactly the model's smoothed tail.
    * Collection stats (cf per query term, |C|) broadcast; per-doc sums
    * go through decimal partials and scores round(6) before the cut, so
    * the top-k boundary is engine-deterministic. Duplicate query terms
    * weight by their query count c(t,q), per the model.
    */
  def dirichletQlTopK(df: DataFrame, idCol: String, textCol: String,
                      queryTerms: Seq[String], k: Int,
                      mu: Double = 2000.0): DataFrame = {
    require(queryTerms.nonEmpty, "dirichletQlTopK: queryTerms must be non-empty")
    require(k >= 1, s"dirichletQlTopK: k must be ≥1, got $k")
    require(mu > 0, s"dirichletQlTopK: mu must be positive, got $mu")
    val spark = df.sparkSession
    import spark.implicits._
    val qtf = queryTerms.groupBy(identity).view.mapValues(_.size).toSeq
      .toDF("term", "qtf")
    val qLen = queryTerms.size
    val docs = Spread.compute(df, Cols.qcol(idCol))
      .select(Cols.qcol(idCol).as("doc_id"), toks(Cols.qcol(textCol)).as("_t"))
    val lens = docs.select(col("doc_id"), size(col("_t")).as("dl"))
    val totC = lens.agg(sum(col("dl")).as("c_len"))
    val post = docs
      .select(col("doc_id"), explode(col("_t")).as("term"))
      .filter(col("term").isin(queryTerms.distinct: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // cf(t) = Σ tf over the whole corpus — the postings are already
    // corpus-wide (only query terms survive the scan filter)
    val cf = post.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val matched = post
      .join(broadcast(cf), Seq("term"))
      .join(broadcast(qtf), Seq("term"))
      .crossJoin(broadcast(totC))
      .withColumn("_contrib", col("qtf") *
        log(lit(1.0) + col("tf") * col("c_len") / (lit(mu) * col("cf"))))
      .groupBy(col("doc_id"))
      .agg(dsum(col("_contrib")).as("_m"))
    lens.join(matched, Seq("doc_id"), "left")
      .withColumn("score", round(coalesce(col("_m"), lit(0.0)) +
        lit(qLen.toDouble) * log(lit(mu) / (col("dl") + lit(mu))), 6))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: queryTerms must be non-empty")
    require(k >= 1, s"bm25TopK: k must be ≥1, got $k")
    require(k1 > 0 && b >= 0 && b <= 1,
      s"bm25TopK: need k1>0 and b∈[0,1], got k1=$k1 b=$b")
    val docs = Spread.compute(df, Cols.qcol(idCol))
      .select(Cols.qcol(idCol).as("doc_id"), toks(Cols.qcol(textCol)).as("_t"))
    val lens = docs.select(col("doc_id"), size(col("_t")).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val post = docs
      .select(col("doc_id"), size(col("_t")).as("dl"), explode(col("_t")).as("term"))
      .filter(col("term").isin(queryTerms.distinct: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = post.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    post
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(dsum(col("contrib")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
