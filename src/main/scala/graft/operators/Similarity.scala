package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over an `Array[Float]` embedding column.
  *
  * Two paths:
  *  - brute-force top-k: broadcast the (small) QUERY set against the corpus
  *    — the corpus is scanned once, never self-joined. Correct baseline.
  *  - LSH (random hyperplane) buckets: candidates shuffle on the bucket
  *    signature → per-bucket scoring only. The 100 TB path.
  *
  * Dot products use the higher-order `aggregate`/`zip_with` built-ins in
  * double precision — codegen'd, no UDF, and bit-stable across engines.
  */
object Similarity {

  /** Cosine similarity between two float-array columns (computed in
    * double). Delegates to the native `cosine_sim` expression
    * (`functions/CosineSim.scala`): one fused codegen'd loop versus three
    * interpreted array traversals — this sits inside every O(pairs)
    * similarity join, so it is THE hot spot of the similarity family.
    * (The aggregate/zip_with formulation lives in `FunctionsSpec` as the
    * differential reference.)
    */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Explode a `top_k_by` result array into (rank, neighbor_id, sim) rows. */
  private def explodeTopK(grouped: DataFrame): DataFrame =
    grouped
      .select(col("query_id"), posexplode(col("tk")).as(Seq("_pos", "item")))
      .select(col("query_id"), (col("_pos") + 1).cast("int").as("rank"),
        col("item.id").as("neighbor_id"), col("item.score").as("sim"))
      .orderBy(col("query_id"), col("rank"))

  /** Brute-force cosine top-k: every corpus row scored against every QUERY
    * row (queries broadcast — the big side streams). Ranking uses the
    * native `top_k_by` bounded-heap aggregate, NOT a row_number window: a
    * window would shuffle and per-group sort all |corpus|×|queries|
    * scored rows, while the aggregate partial-combines map-side so the
    * shuffle carries at most k rows per query per mapper.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    requireUsableCompression(corpus, vecCol, "bruteForceTopK")
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    // corpus side carries |queries| cosines per row — spread an
    // unsplittable small corpus so the scoring stage parallelizes
    val grouped = Spread.compute(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
        col("neighbor_id"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"),
        round(cosine(col("q_vec"), col("c_vec")), 4).as("sim"), col("neighbor_id"))
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by", col("sim"), col("neighbor_id"), lit(k)).as("tk"))
    explodeTopK(grouped)
  }

  /** Sign-bit signature of `vec` against `numPlanes` seeded Gaussian
    * hyperplanes. Delegates to the native `hyperplane_sig` expression —
    * planes ship once as a plan reference object and each row is
    * `numPlanes` fused dot products (the zip_with/aggregate formulation
    * lives in `FunctionsSpec` as the differential reference).
    */
  def hyperplaneSignature(vec: Column, dim: Int, numPlanes: Int, seed: Long = 42L): Column =
    call_function("hyperplane_sig", vec, lit(dim), lit(numPlanes), lit(seed))

  /** LSH-bucketed near-dup pairs: signature equality (all bits of a table's
    * `numPlanes` sign bits) as bucket key, exact cosine verification inside
    * buckets. Shuffles on the fixed-width (table, signature) key only.
    *
    * `numTables` is the OR-amplification recall knob (E2LSH-style): with
    * per-plane collision probability p = 1 − θ_angle/π, a qualifying pair is
    * found with probability 1 − (1 − p^numPlanes)^numTables — raise tables
    * for recall, raise planes for precision/bucket-size. Candidate work is
    * Σ bucket² per table, never n².
    */
  /** Drop (t, sig) groups with more than `maxBucket` members — the
    * hot-bucket guard for the LSH pair/probe joins (the embedding twin of
    * `Dedup.dropHotBuckets`): mass-duplicated embeddings land in ONE
    * bucket and turn the Σ bucket² join quadratic; capped members are
    * near-identical en masse, which exact/content dedup catches cheaper.
    */
  def dropHotSigBuckets(index: DataFrame, maxBucket: Int): DataFrame = {
    require(maxBucket >= 1, s"dropHotSigBuckets: maxBucket must be ≥1, got $maxBucket")
    val ok = index.groupBy(col("t"), col("sig"))
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") <= maxBucket)
      .select(col("t"), col("sig"))
    index.join(ok, Seq("t", "sig"), "left_semi")
  }

  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                      numPlanes: Int, threshold: Double,
                      numTables: Int = 1, seed: Long = 42L,
                      maxBucket: Option[Int] = None): DataFrame = {
    val raw = lshSignatureIndex(df, idCol, vecCol, dim, numPlanes, numTables, seed)
    val e = maxBucket.fold(raw)(dropHotSigBuckets(raw, _))
    val l = e.select(col("t"), col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val r = e.select(col("t"), col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    val pairs = l.join(r, Seq("t", "sig"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("v_a"), col("v_b")), 4))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
    // >1 table can surface the same pair from several tables; dedup on the
    // small (id_a, id_b, sim) triple AFTER the threshold filter.
    if (numTables > 1) pairs.distinct() else pairs
  }

  /** The `(table, signature, id, vector)` LSH index rows for a corpus —
    * the persistable half of the LSH family. Write it out partitioned (or
    * bucketed) by `(t, sig)` once; every arriving batch then probes it
    * ([[lshNearDupAgainst]]) without re-hashing the corpus.
    */
  def lshSignatureIndex(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                        numPlanes: Int, numTables: Int = 1,
                        seed: Long = 42L): DataFrame = {
    // the narrow waist of every LSH path (pairs, search, semanticDedup)
    requireUsableCompression(df, vecCol, "lshSignatureIndex")
    val sigs = array((0 until numTables).map { t =>
      struct(lit(t).as("t"),
        hyperplaneSignature(col(vecCol), dim, numPlanes, seed + t).as("sig"))
    }: _*)
    // numTables × numPlanes fused dot products per row: spread a
    // single-split input before the signature stage
    Spread.compute(df, col(idCol))
      .select(col(idCol).as("id"), col(vecCol).as("v"), explode(sigs).as("ts"))
      .select(col("ts.t").as("t"), col("ts.sig").as("sig"), col("id"), col("v"))
  }

  /** Incremental near-dup probe: NEW batch vectors against an EXISTING
    * corpus index ([[lshSignatureIndex]] rows, typically reloaded from
    * its persisted form) — the live-ingest sibling of
    * [[lshNearDupPairs]]. The join touches only buckets the batch's own
    * signatures hit, so per-batch cost scales with the batch and its
    * bucket sizes, independent of corpus row count. Same OR-amplification
    * recall semantics; `(batch_id, corpus_id, sim)` pairs at `sim >=
    * threshold`, exact-cosine verified.
    *
    * The batch index must be built with the SAME dim/planes/tables/seed
    * as the corpus index — different planes never collide.
    */
  def lshNearDupAgainst(batch: DataFrame, corpusIndex: DataFrame,
                        idCol: String, vecCol: String, dim: Int,
                        numPlanes: Int, threshold: Double,
                        numTables: Int = 1, seed: Long = 42L,
                        maxBucket: Option[Int] = None): DataFrame = {
    val b = lshSignatureIndex(batch, idCol, vecCol, dim, numPlanes, numTables, seed)
      .select(col("t"), col("sig"), col("id").as("batch_id"), col("v").as("v_b"))
    val guarded = maxBucket.fold(corpusIndex)(dropHotSigBuckets(corpusIndex, _))
    val c = guarded
      .select(col("t"), col("sig"), col("id").as("corpus_id"), col("v").as("v_c"))
    val pairs = b.join(c, Seq("t", "sig"))
      .withColumn("sim", round(cosine(col("v_b"), col("v_c")), 4))
      .filter(col("sim") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("sim"))
    if (numTables > 1) pairs.distinct() else pairs
  }

  /** LSH top-k SEARCH: rank only the corpus rows whose signature collides
    * with the query's in at least one table — the approximate sibling of
    * [[bruteForceTopK]] over a persisted [[lshSignatureIndex]]. Exact
    * cosine re-scores every candidate, so precision is exact; RECALL is
    * the knob: a neighbor at angle θ collides per table with probability
    * (1 − θ/π)^numPlanes, amplified to 1 − (1 − p^planes)^tables. For
    * top-k at MID similarities (θ near 70°) that means FEW planes and
    * MANY tables — the opposite corner of the (planes, tables) space
    * from near-dup detection at 0.9+. Measured recall@k vs brute force
    * is recorded per bench round ([[recallAtK]]) and floored by spec.
    *
    * Scale shape: one shuffle on the fixed-width (t, sig) key; candidate
    * work is Σ (bucket × queries-in-bucket) per table, never n × queries.
    * Duplicate collisions across tables dedup BEFORE the bounded-heap
    * top-k (a duplicate entry would occupy two heap slots and evict a
    * genuine neighbor).
    */
  def lshSearch(corpusIndex: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, dim: Int, numPlanes: Int, k: Int,
                numTables: Int = 1, seed: Long = 42L,
                broadcastQueries: Boolean = true): DataFrame = {
    val q = lshSignatureIndex(queries, idCol, vecCol, dim, numPlanes, numTables, seed)
      .select(col("t"), col("sig"), col("id").as("query_id"), col("v").as("q_vec"))
    val qq = if (broadcastQueries) broadcast(q) else q
    val cand = corpusIndex.join(qq, Seq("t", "sig"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("q_vec"), col("v")), 4).as("sim"))
      .distinct()
    val grouped = cand.groupBy(col("query_id"))
      .agg(call_function("top_k_by", col("sim"), col("neighbor_id"), lit(k)).as("tk"))
    explodeTopK(grouped)
  }

  /** recall@k of an approximate neighbor set against the exact one —
    * |approx ∩ exact| / |exact| over (query_id, neighbor_id) pairs. The
    * quantitative check behind the ANN scale paths: `bruteForceTopK` is
    * ground truth, [[lshSearch]]/[[ivfSearch]] are graded against it
    * (bench records the number per round; specs pin a floor). Ties at
    * the rank-k boundary make the theoretical max slightly below 1.0 —
    * floors should sit at 0.9, not 0.99.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val a = approx.select(col("query_id"), col("neighbor_id"))
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val total = e.count()
    if (total == 0L) 1.0
    else e.join(a, Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / total
  }

  /** IVF (inverted-file) ANN index: a k-means coarse quantizer partitions
    * the corpus into `numCentroids` cells; a query searches only the
    * `nProbe` cells whose centroids are nearest. Complements the
    * hyperplane-LSH path: IVF adapts to the data distribution (learned
    * cells) where LSH is data-oblivious.
    *
    * The assigned corpus is the durable index — at 100 TB you persist it
    * partitioned by `cell` so a probe is a partition-pruned read, not a
    * scan.
    */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  /** Fit the coarse quantizer (MLlib k-means, seeded) and return the
    * centroid matrix — the durable, broadcast-sized training artifact.
    * Deterministic given (data, seed), so a deployment trains once and
    * every index build / oracle replay reuses the same floats.
    */
  def ivfFitCentroids(df: DataFrame, vecCol: String, numCentroids: Int,
                      seed: Long = 42L): Array[Array[Float]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val prepared = df.select(array_to_vector(col(vecCol)).as("features"))
    new KMeans().setK(numCentroids).setSeed(seed).fit(prepared)
      .clusterCenters.map(_.toArray.map(_.toFloat))
  }

  /** Nearest-centroid cell for a vector, as a COLUMN: a left fold over
    * the literal centroid array keeping the first strict squared-L2
    * minimum — ties break to the LOWEST cell, and every addition is the
    * left-associated double sum an oracle can replay bit-for-bit
    * (unlike MLlib's `transform`, whose norm-shortcut distance isn't a
    * contract). Zero-shuffle: pure per-row expression work.
    */
  def nearestCell(vec: Column, cents: Array[Array[Float]]): Column = {
    require(cents.nonEmpty, "nearestCell: empty centroid matrix")
    val lits = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cell"), typedLit(c).as("c"))
    }: _*)
    val best = aggregate(lits,
      struct(lit(-1).as("cell"), lit(Double.MaxValue).as("d")),
      (acc, s) => {
        val d = aggregate(zip_with(vec, s.getField("c"), (a, b) =>
          (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
          lit(0d), (x, y) => x + y)
        when(d < acc.getField("d"),
          struct(s.getField("cell").as("cell"), d.as("d"))).otherwise(acc)
      })
    best.getField("cell")
  }

  /** Tag every row with its cell given an already-trained centroid
    * matrix — the per-session half of an index build (the fit is the
    * once-per-deployment half).
    */
  def ivfBuildFromCentroids(df: DataFrame, idCol: String, vecCol: String,
                            cents: Array[Array[Float]]): IvfIndex = {
    requireUsableCompression(df, vecCol, "ivfBuildFromCentroids")
    val assigned = Spread.compute(df, col(idCol))
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        nearestCell(col(vecCol), cents).as("cell"))
    val spark = df.sparkSession
    import spark.implicits._
    val centroids = cents.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid")
    IvfIndex(assigned, centroids)
  }

  /** Build: fit k-means (MLlib, seeded) and tag every row with its cell. */
  def ivfBuild(df: DataFrame, idCol: String, vecCol: String,
               numCentroids: Int, seed: Long = 42L): IvfIndex =
    ivfBuildFromCentroids(df, idCol, vecCol,
      ivfFitCentroids(df, vecCol, numCentroids, seed))

  /** Persist the IVF index as its durable on-disk form: the assigned
    * corpus PARTITIONED BY CELL (so a probe of `nProbe` cells is a
    * partition-PRUNED read — `nProbe/numCentroids` of the data touches
    * disk, not a full scan) plus the tiny centroid table beside it.
    * This is the difference between an index you rebuild per session and
    * one a 100 TB deployment shares across jobs.
    */
  def ivfSave(index: IvfIndex, dir: String): Unit = {
    index.assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/assigned")
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Reload a persisted index. Scans prune on `cell` (partition column);
    * pinned by a spec that checks the probe plan's partition filters.
    */
  def ivfLoad(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$dir/assigned")
        .select(col("id"), col("v"), col("cell").cast("int").as("cell")),
      spark.read.parquet(s"$dir/centroids"))

  /** Search: rank cells per query by centroid cosine (tiny broadcast
    * cross-score), probe the top `nProbe` cells, exact-score only rows in
    * probed cells, return top-k per query.
    *
    * `broadcastQueries = true` (default) ships the probe set to every
    * executor — right when the query set is small (ad-hoc lookups).
    * For BULK query sets (batch re-embedding, join-with-corpus jobs) set
    * it false: probes then shuffle-join the assigned corpus on `cell`
    * (both sides hash-partitioned on a small int key; AQE splits skewed
    * cells), so nothing is materialized per-executor regardless of query
    * count.
    */
  def ivfSearch(index: IvfIndex, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nProbe: Int,
                broadcastQueries: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("c_sim").desc, col("cell"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("c_sim", cosine(col("q_vec"), col("centroid")))
      .withColumn("c_rank", row_number().over(wCell))
      .filter(col("c_rank") <= nProbe)
      .select(col("query_id"), col("q_vec"), col("cell"))
    val grouped = index.assigned
      .join(if (broadcastQueries) broadcast(probes) else probes, Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"),
        round(cosine(col("q_vec"), col("v")), 4).as("sim"), col("id").as("neighbor_id"))
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by", col("sim"), col("neighbor_id"), lit(k)).as("tk"))
    explodeTopK(grouped)
  }

  /** Exact cosine near-dup pairs (oracle-checkable baseline). The
    * non-equi self-join is a BroadcastNestedLoopJoin — O(n²), a
    * cartesian-class plan that CANNOT run on a full corpus (at 100× data
    * it is 10,000× work), so the input size is BOUNDED by construction:
    * the operator counts its input and refuses anything over
    * `maxExactRows`. Past the bound, use [[lshNearDupPairs]] — the
    * bucketed scale path with the same output contract (oracle-matched by
    * `q_ann_lsh_pairs`).
    *
    * The count is one extra (cheap, columns-pruned) pass — the price of
    * making the quadratic plan unreachable rather than merely documented.
    */
  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): drop documents whose embedding near-duplicates an
    * earlier (lower-id) document — paraphrases, re-crawls and templated
    * rewrites that exact-hash and shingle dedup cannot see. Candidate
    * pairs come from [[lshNearDupPairs]] (hyperplane-bucketed — Σ bucket²
    * work per table, never n²; `numTables` is the recall knob), so unlike
    * the paper's k-means cells the blocking is data-oblivious and
    * seed-deterministic.
    *
    * Keep rule: a row is dropped iff SOME lower-id row within cosine
    * `threshold` shares a bucket — the one-pass dominance rule (a dropped
    * row still shadows later rows). It is parallel and engine-portable,
    * unlike the sequential greedy scan, and the two only differ on
    * chains of borderline pairs (a~b, b~c, a!~c). For a quality-aware
    * survivor (keep the best copy, not the first) run
    * [[Dedup.assignCanonical]] over the same pairs and
    * [[Dedup.keepBestPerCluster]] — the same decision pipeline the
    * minhash family uses.
    *
    * Scale shape: bucketed candidate generation, one distinct on dropped
    * ids, one hash anti-join on the id key. Nothing is O(n²).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                    numPlanes: Int, threshold: Double,
                    numTables: Int = 1, seed: Long = 42L): DataFrame = {
    val pairs = lshNearDupPairs(df, idCol, vecCol, dim, numPlanes, threshold,
      numTables, seed)
    val dropped = pairs.select(col("id_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** Per-group mean embedding — the class prototype. Fully relational:
    * posexplode to (group, dim, component), partial-aggregated mean per
    * (group, dim), reassembled in dim order. The exchange carries
    * |groups| × dim running sums regardless of corpus size (partial agg
    * compresses each map task to one row per (group, dim)) — the same
    * shape as any grouped aggregate, no vector-sized shuffle.
    *
    * Components average in DOUBLE (summation-order noise stays ~1 ulp,
    * engine-portable at the compare's rounding) and null vectors are
    * skipped, not zero-filled.
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    Spread.compute(df.filter(col(vecCol).isNotNull), col(groupCol))
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("_gc_d", "_gc_x")))
      .groupBy(col(groupCol), col("_gc_d"))
      .agg(avg(col("_gc_x").cast("double")).as("_gc_m"))
      .groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct(col("_gc_d"), col("_gc_m"))))
        .as("_gc_s"))
      .select(col(groupCol),
        transform(col("_gc_s"), s => s.getField("_gc_m")).as("centroid"))

  /** Prototypicality score (the ranking signal of prototype-based pruning
    * — SemDeDup §5 / D4, Tirumala et al. 2023, arXiv:2308.12284): cosine
    * of each row's embedding to its group's centroid. High scorers are
    * prototypical (cluster-typical, often redundant); low scorers are
    * outliers (often noise). Curation keeps the middle.
    *
    * One grouped aggregate builds the |groups|-row centroid table
    * ([[groupCentroids]]); it broadcast-joins back and the score is one
    * native fused `cosine_sim` per row — the corpus is scanned twice but
    * never shuffled.
    */
  def prototypicality(df: DataFrame, idCol: String, groupCol: String,
                      vecCol: String): DataFrame = {
    val cents = groupCentroids(df, groupCol, vecCol)
    df.join(broadcast(cents), Seq(groupCol), "left")
      .select(col(idCol), col(groupCol),
        round(cosine(col(vecCol), col("centroid")), 4).as("proto_score"))
  }

  /** Product-quantization model (Jégou et al., TPAMI 2011): `m`
    * sub-codebooks of `k` centroids over `subDim`-component subvectors.
    * `bytes` is the literal every `pq_encode`/`pq_score` call ships —
    * m·k·subDim floats, deserialized once per task (the
    * `bloom_might_contain` convention).
    */
  final case class PqModel(m: Int, k: Int, subDim: Int,
                           codebooks: Array[Array[Array[Float]]]) {
    lazy val bytes: Array[Byte] = graft.functions.PqCodec.serialize(codebooks)
    /** Driver-side reconstruction of one code — spec/debug helper. */
    def reconstruct(codes: Array[Byte]): Array[Float] =
      Array.tabulate(m * subDim)(i => codebooks(i / subDim)(codes(i / subDim) & 0xFF)(i % subDim))
  }

  /** Train: one seeded MLlib k-means per subvector (m small fits over
    * subDim-component slices — each fit sees |corpus| rows of subDim
    * floats, so training cost is the k-means, not data movement; at
    * 100 TB fit on a sample, the estimator needs nothing more). The
    * returned model is a plan literal from then on.
    */
  def pqTrain(df: DataFrame, vecCol: String, dim: Int, m: Int,
              k: Int = 256, seed: Long = 42L): PqModel = {
    require(m >= 1 && dim % m == 0,
      s"pqTrain: m must divide dim (got dim=$dim, m=$m)")
    require(k >= 1 && k <= 256, s"pqTrain: k must be in [1,256], got $k")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val subDim = dim / m
    val codebooks = Array.tabulate(m) { j =>
      val sub = df.select(array_to_vector(
        slice(col(vecCol), j * subDim + 1, subDim)).as("features"))
      new KMeans().setK(k).setSeed(seed + j).fit(sub)
        .clusterCenters.map(_.toArray.map(_.toFloat))
    }
    PqModel(m, k, subDim, codebooks)
  }

  /** Encode a corpus to m-byte PQ codes — `dim×4 / m`-fold smaller scan
    * and shuffle footprint for every downstream search. One fused
    * codegen'd pass (`pq_encode`).
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String, model: PqModel,
               codeCol: String = "pq_code"): DataFrame = {
    requireUsableCompression(df, vecCol, "pqEncode")
    Spread.compute(df, col(idCol)).select(col(idCol).as("id"),
      call_function("pq_encode", lit(model.bytes), col(vecCol)).as(codeCol))
  }

  /** Approximate top-k over PQ codes: queries broadcast against the
    * encoded corpus, each (query, code) scored by the asymmetric
    * reconstruction inner product (`pq_score` — pass l2-normalized
    * vectors for cosine semantics), bounded-heap top-k. The corpus-side
    * scan reads m bytes per row instead of dim×4 — the compression IS
    * the speedup at 100 TB; recall is graded vs brute force like the
    * LSH/IVF paths ([[recallAtK]]).
    */
  def pqSearch(encoded: DataFrame, queries: DataFrame, idCol: String,
               vecCol: String, model: PqModel, k: Int,
               codeCol: String = "pq_code"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val grouped = encoded.select(col("id").as("neighbor_id"), col(codeCol))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"),
        round(call_function("pq_score", lit(model.bytes), col(codeCol), col("q_vec")), 4)
          .as("sim"),
        col("neighbor_id"))
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by", col("sim"), col("neighbor_id"), lit(k)).as("tk"))
    explodeTopK(grouped)
  }

  /** IVF-PQ index (the FAISS IVFADC composition, Jégou et al. §V): the
    * coarse quantizer assigns cells ([[ivfBuild]]), and each row stores
    * the PQ code of its RESIDUAL (vector − cell centroid) — residuals
    * concentrate near zero, so the same codebook budget quantizes them
    * much more accurately than raw vectors. `assignedCodes` is the
    * durable on-disk form: `(id, cell, code, v)` partitioned by cell —
    * a probe is a partition-pruned read of m-byte codes.
    */
  final case class IvfPqIndex(assignedCodes: DataFrame, centroids: DataFrame,
                              model: PqModel)

  /** The residual frame `(id, cell, v, _residual)` for trained coarse
    * centroids: each row joined (broadcast) to its cell centroid, residual
    * = elementwise FLOAT subtraction (the array is float-typed, so the
    * oracle mirrors it as round-to-float of the double difference).
    */
  private def ivfPqResiduals(df: DataFrame, idCol: String, vecCol: String,
                             cents: Array[Array[Float]]): (IvfIndex, DataFrame) = {
    val coarse = ivfBuildFromCentroids(df, idCol, vecCol, cents)
    val withResidual = coarse.assigned
      .join(broadcast(coarse.centroids), Seq("cell"))
      .withColumn("_residual", zip_with(col("v"), col("centroid"),
        (x, c) => x - c))
    (coarse, withResidual)
  }

  /** Train the residual PQ codebooks for given coarse centroids — the
    * second trained artifact of an IVF-PQ deployment (both are persisted
    * once and ride every search as plan literals).
    */
  def ivfPqTrainResiduals(df: DataFrame, idCol: String, vecCol: String,
                          cents: Array[Array[Float]], dim: Int, m: Int,
                          k: Int = 256, seed: Long = 42L): PqModel =
    pqTrain(ivfPqResiduals(df, idCol, vecCol, cents)._2, "_residual", dim, m, k, seed)

  /** Assemble the IVF-PQ index from already-trained artifacts (coarse
    * centroids + residual codebooks) — the per-session half of the build,
    * pure plan work: assign cells, encode residuals, no fitting.
    */
  def ivfPqFromArtifacts(df: DataFrame, idCol: String, vecCol: String,
                         cents: Array[Array[Float]], model: PqModel): IvfPqIndex = {
    val (coarse, withResidual) = ivfPqResiduals(df, idCol, vecCol, cents)
    val assignedCodes = withResidual.select(col("id"), col("cell"), col("v"),
      call_function("pq_encode", lit(model.bytes), col("_residual")).as("code"))
    IvfPqIndex(assignedCodes, coarse.centroids, model)
  }

  def ivfPqBuild(df: DataFrame, idCol: String, vecCol: String,
                 numCentroids: Int, m: Int, dim: Int, k: Int = 256,
                 seed: Long = 42L): IvfPqIndex = {
    val cents = ivfFitCentroids(df, vecCol, numCentroids, seed)
    val model = ivfPqTrainResiduals(df, idCol, vecCol, cents, dim, m, k, seed)
    ivfPqFromArtifacts(df, idCol, vecCol, cents, model)
  }

  /** IVF-ADC search with exact re-ranking: probe the `nProbe` nearest
    * cells (partition-pruned at deployment), ADC-score only rows in
    * probed cells — `⟨q, v⟩ ≈ ⟨q, c_cell⟩ + ⟨q, residual̂⟩`, the first
    * term one dot per (query, cell), the second the native `pq_score`
    * over m-byte codes — shortlist per query, then exact re-rank.
    * Combines every pruning axis this family has: IVF cuts WHICH rows
    * are scanned (nProbe/numCentroids of the corpus), PQ cuts the BYTES
    * per scanned row (m vs dim×4), re-ranking restores exact scores.
    */
  def ivfPqSearch(index: IvfPqIndex, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, nProbe: Int,
                  shortlist: Int): DataFrame = {
    require(shortlist >= k,
      s"ivfPqSearch: shortlist ($shortlist) must be ≥ k ($k)")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("c_sim").desc, col("cell"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("c_sim", cosine(col("q_vec"), col("centroid")))
      .withColumn("c_rank", row_number().over(wCell))
      .filter(col("c_rank") <= nProbe)
      // ⟨q, c_cell⟩ — the coarse term of the ADC decomposition, one
      // scalar per (query, probed cell)
      .withColumn("_qc", aggregate(zip_with(col("q_vec"), col("centroid"),
        (x, c) => x.cast("double") * c.cast("double")), lit(0d), (a, x) => a + x))
      .select(col("query_id"), col("q_vec"), col("cell"), col("_qc"))
    val short = index.assignedCodes
      .join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("q_vec"),
        (col("_qc") + call_function("pq_score", lit(index.model.bytes),
          col("code"), col("q_vec"))).as("adc"),
        col("id").as("neighbor_id"))
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by", col("adc"), col("neighbor_id"), lit(shortlist)).as("tk"))
    val cand = explodeTopK(short).select(col("query_id"), col("neighbor_id"))
    // exact re-rank against the true vectors carried in the index
    val grouped = cand
      .join(index.assignedCodes.select(col("id").as("neighbor_id"), col("v")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"),
        round(cosine(col("q_vec"), col("v")), 4).as("sim"), col("neighbor_id"))
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by", col("sim"), col("neighbor_id"), lit(k)).as("tk"))
    explodeTopK(grouped)
  }

  /** PQ search with exact RE-RANKING (the ADC+R pattern, Jégou et al.
    * §VI): the compressed scan produces a `shortlist`-sized candidate
    * set per query, then ONLY those candidates are re-scored against
    * their true vectors and the top k of the exact scores win. The
    * expensive corpus pass reads m-byte codes; the exact pass touches
    * `shortlist × |queries|` rows fetched by an id hash-join — the
    * published recipe for recall at compression (measured here:
    * m=16, k=64, L=100 → recall@10 0.975 on embeddings whose top-10
    * sit at cosine 0.25–0.36, vs 0.51 for PQ scores alone; floored
    * ≥0.9 by spec).
    */
  def pqSearchRefined(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, model: PqModel, k: Int,
                      shortlist: Int, codeCol: String = "pq_code"): DataFrame = {
    require(shortlist >= k,
      s"pqSearchRefined: shortlist ($shortlist) must be ≥ k ($k)")
    val short = pqSearch(encoded, queries, idCol, vecCol, model, shortlist, codeCol)
    val grouped = short.select(col("query_id"), col("neighbor_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))),
        Seq("query_id"))
      .select(col("query_id"),
        round(cosine(col("q_vec"), col("c_vec")), 4).as("sim"), col("neighbor_id"))
      .groupBy(col("query_id"))
      .agg(call_function("top_k_by", col("sim"), col("neighbor_id"), lit(k)).as("tk"))
    explodeTopK(grouped)
  }

  // ------------------------------------------------ PCA compression

  /** PCA model for embedding-store compression: the top-k principal
    * directions of the corpus (`basis`, k×d), its mean (`mean`), and
    * each kept direction's explained-variance share. `bytes` is the
    * packed literal every `mat_project` call ships (the PQ-codebook
    * discipline — deserialized once per task, never per row).
    */
  final case class PcaModel(dim: Int, k: Int, mean: Array[Float],
                            basis: Array[Array[Float]],
                            explainedVariance: Array[Double]) {
    def bytes: Array[Byte] = graft.functions.MatCodec.serialize(mean, basis)
    def explainedTotal: Double = explainedVariance.sum
  }

  /** Fit PCA over an embedding column in ONE distributed pass: each
    * partition accumulates Σx and the upper-triangular Gramian Σxxᵀ
    * (O(d²) per task, merged in a treeAggregate), the d×d covariance
    * `Σxxᵀ/n − μμᵀ` is eigendecomposed ON THE DRIVER (breeze `eigSym` —
    * the symmetric solver Spark itself ships for MLlib), and the top-k
    * eigenvectors become the projection basis. At 100 TB the data pass
    * is the only data-sized cost; the driver work is O(d³) on a d ≤
    * ~2000 guard — past that, random projection is the honest tool and
    * this refuses rather than melting the driver. Deliberately NOT
    * MLlib's `ml.feature.PCA`: its `transform` skips mean-centering
    * (a long-documented quirk), which biases every projected cosine
    * toward the corpus mean direction.
    *
    * Eigenvector signs are canonicalized (largest-|lane| positive), so
    * refits on reshuffled data produce comparable bases. Null vectors
    * are skipped by the fit; a wrong-length vector refuses loudly.
    */
  def pcaFit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"pcaFit: need 1 <= k <= dim, got k=$k dim=$dim")
    require(dim <= 2048,
      s"pcaFit: dim=$dim means a ${dim.toLong * dim}-double covariance per task " +
        "and an O(dim³) driver eig — past ~2048 dims use a random projection")
    // INVALID vectors (null, or carrying a null/NaN/±Inf lane) are
    // SKIPPED by the fit — the same rows mat_project later nulls out;
    // letting one through would NPE the aggregate or poison the whole
    // covariance with NaN after a full data pass
    val validVec = {
      val xd = (x: Column) => x.cast("double")
      col(vecCol).isNotNull && !exists(col(vecCol), x =>
        x.isNull || isnan(xd(x)) ||
          xd(x) === lit(Double.PositiveInfinity) ||
          xd(x) === lit(Double.NegativeInfinity))
    }
    val zero = (0L, new Array[Double](dim), new Array[Double](dim * dim))
    val (n, sum, gram) = df.select(col(vecCol)).where(validVec).rdd
      .treeAggregate(zero)(
        seqOp = { case ((c, s, g), row) =>
          val v = row.getSeq[Any](0)
          require(v.length == dim,
            s"pcaFit: vector has ${v.length} lanes, expected $dim")
          var i = 0
          while (i < dim) {
            val xi = v(i).asInstanceOf[Number].doubleValue()
            s(i) += xi
            var j = i
            while (j < dim) {
              g(i * dim + j) += xi * v(j).asInstanceOf[Number].doubleValue()
              j += 1
            }
            i += 1
          }
          (c + 1, s, g)
        },
        combOp = { case ((c1, s1, g1), (c2, s2, g2)) =>
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < g1.length) { g1(i) += g2(i); i += 1 }
          (c1 + c2, s1, g1)
        })
    require(n > k,
      s"pcaFit: $n usable vectors cannot support a rank-$k basis")
    val mu = sum.map(_ / n)
    val cov = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = gram(i * dim + j) / n - mu(i) * mu(j)
        cov(i * dim + j) = c
        cov(j * dim + i) = c // mirror: eigSym wants the full symmetric matrix
        j += 1
      }
      i += 1
    }
    val es = breeze.linalg.eigSym(new breeze.linalg.DenseMatrix(dim, dim, cov))
    val order = (0 until dim).sortBy(c => -es.eigenvalues(c))
    val top = order.take(k)
    val totalVar = (0 until dim).map(c => math.max(es.eigenvalues(c), 0.0)).sum
    val basis = top.map { c =>
      val v = Array.tabulate(dim)(r => es.eigenvectors(r, c))
      val pivot = v.indices.maxBy(l => math.abs(v(l)))
      val sgn = if (v(pivot) < 0) -1.0 else 1.0
      v.map(x => (x * sgn).toFloat)
    }.toArray
    val explained = top.map(c =>
      math.max(es.eigenvalues(c), 0.0) / math.max(totalVar, 1e-300)).toArray
    PcaModel(dim, k, mu.map(_.toFloat), basis, explained)
  }

  /** Project the corpus into the PCA basis — one codegen'd
    * `mat_project` pass (`y = B(x − μ)`), a dim/k-fold cut of every
    * downstream scan/shuffle that touches the vectors. Cosine ranking
    * over projections approximates full-space ranking exactly as well
    * as the kept variance share — measure with [[recallAtK]] before
    * trusting a (dim, k) pair, same discipline as LSH/IVF/PQ.
    *
    * The projected column CARRIES ITS OWN TELEMETRY: the model's total
    * explained-variance share is stamped into the column metadata
    * (`graft.pca.explained`), and every ANN entry point checks it
    * against [[MinExplainedVarianceForAnn]] — the engine already knows
    * when a compressed store cannot support usable recall (the r15
    * pca48 fixture measured .539), so composing it with ANN refuses
    * LOUDLY instead of silently serving wrong neighbors. JL models
    * (empty `explainedVariance`) stamp nothing — theirs is a distance
    * guarantee, not a variance share; measure with [[recallAtK]].
    */
  def pcaProject(df: DataFrame, vecCol: String, model: PcaModel,
                 outCol: String = "pca_vec"): DataFrame = {
    val projected = call_function("mat_project", lit(model.bytes), col(vecCol))
    if (model.explainedVariance.isEmpty) df.withColumn(outCol, projected)
    else {
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .putDouble("graft.pca.explained", model.explainedTotal)
        .putLong("graft.pca.k", model.k.toLong)
        .putLong("graft.pca.dim", model.dim.toLong)
        .build()
      df.withColumn(outCol, projected.as(outCol, md))
    }
  }

  /** The explained-variance floor below which ANN over a PCA-compressed
    * store REFUSES: under ~0.75 kept variance, projected-cosine ranking
    * diverges enough from full-space ranking that "approximate nearest
    * neighbors" stops meaning anything (the near-isotropic bench
    * fixture at 48/256 dims keeps .34 and measures recall .539 — a
    * coin-flip neighbor list served at full confidence). Deployments
    * that have MEASURED acceptable recall for their corpus route
    * around the guard explicitly with [[acceptCompressedStore]] — the
    * override is a visible act, never a default.
    */
  val MinExplainedVarianceForAnn: Double = 0.75

  /** Strip the compression telemetry from `vecCol` — the DELIBERATE
    * override for a store whose measured [[recallAtK]] is acceptable
    * despite a low explained-variance share.
    */
  def acceptCompressedStore(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn(vecCol, col(vecCol).as(vecCol,
      org.apache.spark.sql.types.Metadata.empty))

  private def requireUsableCompression(df: DataFrame, vecCol: String,
                                       caller: String): Unit =
    df.schema.fields.find(_.name == vecCol).map(_.metadata)
      .filter(_.contains("graft.pca.explained")).foreach { m =>
        val ev = m.getDouble("graft.pca.explained")
        require(ev >= MinExplainedVarianceForAnn,
          f"$caller: embedding column '$vecCol' is a PCA-compressed store " +
            f"keeping only $ev%.3f of the corpus variance (floor: " +
            f"$MinExplainedVarianceForAnn%.2f) — neighbor ranking over it is " +
            "not trustworthy. Keep more components, use the uncompressed " +
            "store (or a JL projection sized via recallAtK), or — if recall " +
            "was MEASURED acceptable for this corpus — route around the " +
            "guard explicitly with acceptCompressedStore")
      }

  /** Seeded Gaussian RANDOM PROJECTION (Johnson–Lindenstrauss) — the
    * dimensionality-reduction path for stores too wide for [[pcaFit]]'s
    * d² covariance (its refusal message points here): no fit pass at
    * all — the basis derives from the seed alone (entries N(0, 1/k), so
    * squared distances are preserved in expectation), projection is the
    * same codegen'd `mat_project` kernel, and two sites with the same
    * (dim, k, seed) project IDENTICALLY without exchanging a model.
    * `explainedVariance` is empty: JL gives a distance-distortion
    * guarantee (ε ~ √(log n / k)), not a variance decomposition —
    * measure ranking fidelity with [[recallAtK]] like every other
    * approximate path.
    */
  def randomProjectionModel(dim: Int, k: Int, seed: Long = 42L): PcaModel = {
    require(k >= 1 && k < dim,
      s"randomProjectionModel: need 1 <= k < dim, got k=$k dim=$dim")
    val rnd = new scala.util.Random(seed)
    val scale = 1.0 / math.sqrt(k)
    val basis = Array.fill(k)(Array.fill(dim)((rnd.nextGaussian() * scale).toFloat))
    PcaModel(dim, k, Array.fill(dim)(0.0f), basis, Array.empty)
  }

  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, maxExactRows: Long = 10000L): DataFrame = {
    val n = df.count()
    require(n <= maxExactRows,
      s"cosineNearDupPairs: input has $n rows > maxExactRows=$maxExactRows — " +
        s"the exact all-pairs plan is O(n²) and reserved for validation " +
        s"scale; use lshNearDupPairs for the full corpus")
    // the stream side of the nested-loop join does ALL the cosine work —
    // spread it so the n² evaluation uses every core, not split 0's one
    // (r19 opt: 4.9 s → sub-second at sf0.1, single-partition input)
    val l = Spread.compute(
      df.select(col(idCol).as("id_a"), col(vecCol).as("v_a")), col("id_a"))
    val r = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("v_a"), col("v_b")), 4))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
