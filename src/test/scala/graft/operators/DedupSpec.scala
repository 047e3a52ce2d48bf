package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The sketch operators are seeded-deterministic but not SQL-expressible;
  * their semantics are pinned here with planted near-duplicates instead of
  * a DuckDB oracle (SURVEY.md §4).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then naps in the warm sun"
  private val nearDup = base.replace("naps", "rests") // one-token edit
  private val unrelated = "completely different content about databases shuffles partitions and columnar storage formats"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base) // 4 = exact dup of 1
  ).toDF("doc_id", "text")

  test("exactByContent groups exact duplicates only") {
    val out = Dedup.exactByContent(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    val dup = out.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("exactByNormalizedContent catches NFC-vs-NFD and whitespace variants exact dedup misses") {
    val variants = Seq(
      (1L, "Café du Monde"),         // NFC é
      (2L, "Café  du\tMonde"),  // NFD e+U+0301 + ws runs
      (3L, "CAFE DU MONDE"),          // accentless uppercase
      (4L, unrelated)
    ).toDF("doc_id", "text")
    // byte-exact dedup sees four distinct contents…
    assert(Dedup.exactByContent(variants, "doc_id", "text").count() == 4)
    // …normalized dedup folds the three spellings into one group
    val out = Dedup.exactByNormalizedContent(variants, "doc_id", "text").collect()
    assert(out.length == 2)
    val merged = out.find(_.getAs[Long]("dup_count") == 3L).get
    assert(merged.getAs[Long]("keep_id") == 1L)
  }

  test("minhash over foldText: NFC/NFD spellings produce identical signatures") {
    // the shingle path composes the same way as exact dedup: normalize
    // FIRST, then hash — byte-variant spellings collide in every lane
    val variants = Seq(
      (1L, "Café du Monde serves the best beignets in the quarter"),
      (2L, "café  du\tMonde serves THE best beignets in the quarter"), // NFD e+U+0301
      (3L, unrelated)
    ).toDF("doc_id", "text")
    val sigs = variants.select(col("doc_id"),
        Dedup.minhashSignature(
          graft.operators.TextAnalysis.foldText(col("text")), k = 3, numHashes = 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "normalized variants must share every minhash lane")
    assert(sigs(1L) != sigs(3L))
  }

  test("minhashCandidates finds planted near-dup, not unrelated pair") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact dup must always collide")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "one-token-edit near-dup should share a band bucket")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("minhashBandBuckets rejects band counts that would drop signature lanes") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashBandBuckets(df, "doc_id", "text", numHashes = 16, bands = 5)
    }
  }

  test("minhashBandBuckets md5_52 mode: same banding semantics, portable buckets") {
    val df = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "q w e r t y u i")).toDF("doc_id", "text")
    def buckets(mode: String) =
      Dedup.minhashBandBuckets(df, "doc_id", "text", hashMode = mode)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val md5 = buckets("md5_52")
    // identical texts collide in EVERY band; the unrelated doc in none
    (0 until 4).foreach { b =>
      assert(md5((1L, b)) == md5((2L, b)), s"exact dup must share band $b")
      assert(md5((1L, b)) != md5((3L, b)), s"unrelated doc must not share band $b")
    }
    // deterministic and a genuinely different hash family from xx
    assert(md5 == buckets("md5_52"))
    assert(md5 != buckets("xx"))
  }

  test("removeDuplicateSpans cuts cross-doc token runs, ignores within-doc repeats") {
    val df = Seq[(Long, String)](
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "x y alpha beta gamma z"),        // shares "alpha beta gamma" with 1
      (3L, "p q r s"),                       // unique
      (4L, "rep rep rep rep rep"),           // self-repetition only — 1 doc
      (5L, null),
      (6L, ""),
      (7L, "aa bb")                          // shorter than width
    ).toDF("doc_id", "text")
    val (spansDf, relSpans) = Dedup.duplicatedSpansReleasable(df, "doc_id", "text", width = 3)
    val spans = try spansDf.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      finally relSpans()
    assert(spans == Set((1L, 1, 3), (2L, 3, 5)), s"got $spans")
    def cleaned(mode: String) = {
      val (cl, rel) = Dedup.removeDuplicateSpansReleasable(df, "doc_id", "text",
        width = 3, hashMode = mode)
      try cl.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
      finally rel()
    }
    val out = cleaned("xx")
    assert(out(1L) == "delta epsilon")
    assert(out(2L) == "x y z")
    assert(out(3L) == "p q r s")
    assert(out(4L) == "rep rep rep rep rep")
    assert(out(5L) == null)
    assert(out(6L) == "")
    assert(out(7L) == "aa bb")
    // hash family must not change semantics (md5_52 is the oracle form)
    assert(cleaned("md5_52") == out)
  }

  test("duplicatedSpans hashes the window table ONCE; release drops the cache") {
    // the round-8 verdict's item 2: the window table feeds both sides of
    // the detection semi-join (frequency count + probe) — without the
    // internal persist, the tokenize→window→hash subtree runs twice per
    // corpus scan. Count source evaluations with an accumulator-bearing
    // text producer.
    val evals = spark.sparkContext.longAccumulator("span_evals")
    val texts = Seq("a b c d e", "p q a b c d e", "x y z w v")
    // asNondeterministic: a deterministic UDF gets DUPLICATED by filter
    // pushdown (the size(tokens)>=width filter re-evaluates it below the
    // projection), which would double-count scans and mask what we pin
    val costly = udf((i: Int) => { evals.add(1); texts(i % 3) }).asNondeterministic()
    val df = spark.range(0, 30).select(col("id").as("doc_id"),
      costly(col("id").cast("int")).as("text"))
    val (spans, release) = Dedup.duplicatedSpansReleasable(df, "doc_id", "text", width = 3)
    assert(spans.count() > 0)
    assert(evals.value == 30,
      s"window hashing must run once per row (cache-backed), got ${evals.value}")
    release()
    // after release the window subtree is uncached again: a re-run pays
    // BOTH semi-join branches (2 × 30 evaluations) — proves the cache is
    // actually dropped, not merely dereferenced (test-order hazard: a
    // leaked cache can be sameResult-substituted into a later suite's
    // plan and break its Exchange-count assertions)
    evals.reset()
    assert(spans.count() > 0)
    // ≥30, not ==60: the r19 Spread repartition gives both semi-join
    // branches an identical Exchange subtree, so Spark's ReusedExchange
    // dedups the second branch's scan WITHIN one action — a re-run then
    // pays one full evaluation (30), two when reuse doesn't fire. Either
    // way a LIVE cache would pay ZERO; any recompute proves the release.
    assert(evals.value >= 30,
      s"released plan must re-evaluate the window subtree, got ${evals.value}")
  }

  test("mergeSpans collapses overlapping, adjacent and contained spans per doc") {
    val spans = Seq(
      (1L, 1, 3), (1L, 2, 4), (1L, 5, 7),    // overlap then adjacency → one [1,7]
      (1L, 9, 12), (1L, 10, 11),             // contained interval can't split [9,12]
      (1L, 20, 22),                          // isolated
      (2L, 1, 3)                             // other doc untouched
    ).toDF("doc_id", "start", "end")
    val out = Dedup.mergeSpans(spans, "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set((1L, 1, 7), (1L, 9, 12), (1L, 20, 22), (2L, 1, 3)), s"got $out")
    // end-to-end: the stride-1 covering windows of a shared run merge back
    // to one maximal region
    val df = Seq(
      (1L, "a b c d e zz"), (2L, "p q a b c d e")   // shared 5-token run "a b c d e"
    ).toDF("doc_id", "text")
    val (sp, rel) = Dedup.duplicatedSpansReleasable(df, "doc_id", "text", width = 3)
    val merged = try Dedup.mergeSpans(sp, "doc_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      finally rel()
    assert(merged == Set((1L, 1, 5), (2L, 3, 7)), s"got $merged")
  }

  test("minhash signature is deterministic and component-wise minimal") {
    val sigs = docs.select(col("doc_id"),
        Dedup.minhashSignature(col("text"), k = 3, numHashes = 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1) == sigs(4)) // identical text → identical signature
    assert(sigs(1).length == 16)
    assert(sigs(1) != sigs(3))
    // near-dup shares most signature components (minhash property)
    val shared = sigs(1).zip(sigs(2)).count { case (a, b) => a == b }
    assert(shared >= 8, s"near-dup shared only $shared/16 minhash components")
  }

  test("dedupAgainstCorpus: corpus dups dropped, within-batch keeps first, fresh survive") {
    val corpus = Seq((1L, base), (2L, unrelated)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),      // already in corpus -> dropped
      (11L, nearDup),   // fresh (one-token edit is a DIFFERENT exact content)
      (12L, "brand new arrival text"),
      (13L, "brand new arrival text") // within-batch dup -> keep 12
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstCorpus(batch,
        Dedup.contentFingerprints(corpus, "text"), "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(11L, 12L))
  }

  test("dedupAgainstCorpusBloom agrees with the plain anti-join exactly") {
    val corpus = Seq((1L, base), (2L, unrelated)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base), (11L, nearDup), (12L, "fresh one"), (13L, "fresh one"),
      (14L, unrelated), (15L, "another fresh")
    ).toDF("doc_id", "text")
    val fps = Dedup.contentFingerprints(corpus, "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[Long]("doc_id")).toSet
    val plain = ids(Dedup.dedupAgainstCorpus(batch, fps, "doc_id", "text"))
    val bloomed = ids(Dedup.dedupAgainstCorpusBloom(batch, fps, "doc_id", "text"))
    assert(bloomed == plain && plain == Set(11L, 12L, 15L))
  }

  test("dedupAgainstCorpus on an empty corpus keeps the whole deduped batch") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, base), (2L, base), (3L, unrelated)).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstCorpus(batch,
        Dedup.contentFingerprints(corpus, "text"), "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(1L, 3L))
  }

  test("dedupClusters: chains merge transitively, min id labels the cluster") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (6L, 5L)).toDF("id_a", "id_b")
    val labels = Dedup.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("dedupClusters: pointer jumping converges a 64-node chain in few rounds") {
    // worst-case topology for plain propagation (diameter 63); pointer
    // jumping must finish within ~log2(64)+slack rounds, not 63
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.dedupClusters(chain, maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 64 && labels.forall(_._2 == 1L))
  }

  test("assignCanonical: cluster members map to min id, singletons to self") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (9L, "lonely")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.assignCanonical(docs, "doc_id", pairs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("simhashCandidates: exact dup at hamming 0; near-dup within 3 bits") {
    val out = Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming")).toMap
    assert(out((1L, 4L)) == 0)
    assert(out.get((1L, 2L)).forall(_ <= 3))
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash64 column matches between identical texts and differs across corpus") {
    val hashes = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1) == hashes(4))
    assert(hashes(1) != hashes(3))
    val hamming12 = java.lang.Long.bitCount(hashes(1) ^ hashes(2))
    assert(hamming12 <= 8, s"near-dup simhash hamming was $hamming12")
  }

  test("ngramJaccardPairs computes exact shingle jaccard") {
    val tiny = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(tiny, "doc_id", "text", k = 3, threshold = 0.0)
      .collect()
    // shingles(1)={abc,bcd}, shingles(2)={abc,bce}: inter 1, union 3
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1)) == (1L, 2L))
    assert(out(0).getAs[Double]("jaccard") == 0.3333)
  }

  test("ngramJaccardVerify filters candidates below threshold") {
    val tiny = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w")).toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccardVerify(tiny, "doc_id", "text", cands, k = 3, threshold = 0.3)
      .collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
  }

  test("dedupClusters: empty pairs frame → empty labels, no crash") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.dedupClustersWithRounds(empty)
    assert(labels.count() == 0 && rounds == 0)
    // a corpus with zero near-dups: every doc is its own canonical
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val out = Dedup.assignCanonical(docs, "doc_id", empty)
      .select("doc_id", "canonical")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("benchmarkOverlap counts shared shingles; decontaminate drops hits, keeps columns") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "an entirely different document about spark engines", "book"),
      (3L, "sources say the quick brown fox was seen again", "news"),
      (4L, "hi", "short")).toDF("doc_id", "text", "domain")
    // bench shares "the quick brown" + "quick brown fox" with docs 1,3
    // and the whole-text fallback shingle with short doc 4
    val bench = Seq((100L, "watch the quick brown fox run"), (101L, "hi"))
      .toDF("doc_id", "text")
    val ov = Dedup.benchmarkOverlap(corpus, bench, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ov(1L) == 2L, s"doc 1 shares exactly two shingles, got ${ov(1L)}")
    assert(ov(2L) == 0L)
    assert(ov(3L) == 2L)
    assert(ov(4L) == 1L, "short doc collapses to a whole-text shingle matching bench 101")
    val kept = Dedup.decontaminate(corpus, bench, "doc_id", "text", k = 3)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "domain"),
      "decontaminate must pass upstream columns through untouched")
    assert(rows(kept.select("doc_id")) == Seq(Seq(2L)))
    // minOverlap above the max observed count keeps everything
    val lax = Dedup.decontaminate(corpus, bench, "doc_id", "text", k = 3, minOverlap = 100L)
    assert(lax.count() == 4)
    // broadcastContaminated=false (the corpus-is-mostly-eval-text escape
    // hatch) keeps the identical set without the broadcast hint
    val shuffled = Dedup.decontaminateAgainst(corpus,
      Dedup.benchmarkShingles(bench, "text", 3), "doc_id", "text", k = 3,
      broadcastContaminated = false)
    assert(rows(shuffled.select("doc_id")) == Seq(Seq(2L)),
      "shuffle-anti fallback must keep the identical clean set")
  }

  test("keepBestPerCluster: best quality wins, min-id tie-break, singletons survive") {
    val docs = Seq(
      (1L, "a", 5L), (2L, "a", 9L), (3L, "a", 9L), // cluster 1: q9 tie → id 2
      (4L, "b", 1L),                               // cluster of one
      (9L, "z", 0L))                               // absent from clusters → own singleton
      .toDF("doc_id", "text", "quality")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster")
    val kept = Dedup.keepBestPerCluster(docs, clusters, "doc_id", "cluster", "quality")
    assert(kept.columns.toSeq == Seq("doc_id", "text", "quality"),
      "output schema must be the input row, not the cluster key")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 4L, 9L))
    // scale promise: one max_by aggregate, never a per-cluster window sort
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"retention must aggregate, not window:\n$plan")
  }

  test("benchmarkOverlap on an empty benchmark reports zero for every doc") {
    val corpus = Seq((1L, "a b c d"), (2L, "x y z")).toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") < 0)
    val ov = Dedup.benchmarkOverlap(corpus, bench, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ov == Map(1L -> 0L, 2L -> 0L))
  }

  test("decontaminate/benchmarkOverlap plans: corpus side stays Exchange-free") {
    // The decontamination filter must be a BROADCAST anti join against the
    // tiny contaminated set — at 100 TB the corpus never shuffles for it.
    // The only Exchanges allowed anywhere are benchmark-sized: the distinct
    // over benchmark shingles (shh) and the per-doc pre-aggregation of
    // MATCHED (id, count) rows inside overlapCounts; a semi-join against
    // the clean (≈ whole-corpus) side would add corpus-scale exchanges
    // (and plan as SortMergeJoin).
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an entirely different document about spark engines"),
      (3L, "sources say the quick brown fox was seen again")).toDF("doc_id", "text")
    val bench = Seq((100L, "watch the quick brown fox run")).toDF("doc_id", "text")

    val anti = Dedup.decontaminate(corpus, bench, "doc_id", "text", k = 3)
    val antiPlan = anti.queryExecution.executedPlan.toString
    assert(antiPlan.contains("BroadcastHashJoin") && antiPlan.contains("LeftAnti"),
      s"decontaminate must plan a broadcast LEFT ANTI join:\n$antiPlan")
    assert(!antiPlan.contains("SortMergeJoin"),
      s"no sort-merge join anywhere in decontaminate:\n$antiPlan")
    val antiEx = "Exchange hashpartitioning".r.findAllIn(antiPlan).length
    assert(antiEx <= 2,
      s"decontaminate may shuffle only benchmark shingles + matched (id,count) rows, saw $antiEx exchanges:\n$antiPlan")

    val ov = Dedup.benchmarkOverlap(corpus, bench, "doc_id", "text", k = 3)
    val ovPlan = ov.queryExecution.executedPlan.toString
    assert(ovPlan.contains("BroadcastHashJoin"),
      s"benchmarkOverlap zero-fill must be a broadcast join:\n$ovPlan")
    assert(!ovPlan.contains("SortMergeJoin"),
      s"no sort-merge join anywhere in benchmarkOverlap:\n$ovPlan")
    val ovEx = "Exchange hashpartitioning".r.findAllIn(ovPlan).length
    assert(ovEx <= 2,
      s"benchmarkOverlap may shuffle only benchmark shingles + matched (id,count) rows, saw $ovEx exchanges:\n$ovPlan")
  }

  test("dedupClusters: 1,024-node chain converges in O(log n) rounds") {
    // worst-case diameter: one chain 0-1-2-…-1023. Min-label propagation
    // alone needs ~n rounds; pointer jumping must finish in ≈log2(n).
    val n = 1024
    val chain = spark.range(0, n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val (labels, rounds) = Dedup.dedupClustersWithRounds(chain, maxIter = 25)
    assert(rounds <= 2 * 10 + 2, s"expected ≤22 rounds for a $n-chain, took $rounds")
    val out = labels.collect()
    assert(out.length == n)
    assert(out.forall(_.getLong(1) == 0L), "every chain node must label to min id 0")
  }

  test("nearDupAgainstCorpus: flags near/exact dups via lane agreement, spares fresh") {
    val corpus = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // exact copy of corpus doc 1 under a new id → estimator must say 1.0
      (10L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      // near-dup of corpus doc 2: one word swapped at the tail
      (11L, "one two three four five six seven eight nine eleven"),
      (12L, "completely unrelated text about mountains and rivers flowing")
    ).toDF("doc_id", "text")
    val idx = Dedup.minhashIndex(corpus, "doc_id", "text")
    val pairs = Dedup.nearDupAgainstCorpus(batch, idx, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = pairs.find(p => p._1 == 10L && p._2 == 1L)
    assert(exact.exists(_._3 == 1.0),
      s"exact copy must estimate jaccard 1.0, got $exact in ${pairs.toSeq}")
    assert(pairs.exists(p => p._1 == 11L && p._2 == 2L && p._3 >= 0.5),
      s"near-dup must collide and clear threshold: ${pairs.toSeq}")
    assert(!pairs.exists(_._1 == 12L), s"fresh doc must not flag: ${pairs.toSeq}")
    // the ingest filter drops flagged rows, keeps columns untouched
    val kept = Dedup.dedupNearAgainstCorpus(batch, idx, "doc_id", "text",
      threshold = 0.5)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(12L))
    // a batch doc re-ingested under its OWN id reports only others
    val self = Dedup.nearDupAgainstCorpus(corpus, idx, "doc_id", "text",
      threshold = 0.1).collect()
    assert(!self.exists(r => r.getLong(0) == r.getLong(1)))
    intercept[IllegalArgumentException] {
      Dedup.nearDupAgainstCorpus(batch, idx, "doc_id", "text", threshold = 0.0)
    }
  }

  test("dropHotBuckets: degenerate bucket capped, normal near-dups survive") {
    // 40 byte-identical boilerplate docs → ONE bucket with 40 members in
    // every band (1560 self-join pairs from boilerplate alone); plus one
    // genuine near-dup pair in its own small buckets
    val boiler = (1L to 40L).map(i =>
      (i, "identical boilerplate footer text repeated across the crawl"))
    val pair = Seq(
      (100L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (101L, "alpha bravo charlie delta echo foxtrot golf hotel india kilo"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val unguarded = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded.count(p => p._1 <= 40L && p._2 <= 40L) == 40 * 39 / 2,
      "unguarded: the hot bucket contributes all boilerplate pairs")
    val guarded = Dedup.minhashCandidates(docs, "doc_id", "text",
        maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!guarded.exists(p => p._1 <= 40L && p._2 <= 40L),
      s"capped bucket must contribute no pairs: $guarded")
    assert(guarded.contains((100L, 101L)),
      "near-dup in a small bucket survives the guard")
    // same guard on the incremental probe's index side
    val idx = Dedup.minhashIndex(docs, "doc_id", "text")
    val probed = Dedup.nearDupAgainstCorpus(docs, idx, "doc_id", "text",
        threshold = 0.5, maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!probed.exists(p => p._1 <= 40L && p._2 <= 40L))
    assert(probed.contains((100L, 101L)) && probed.contains((101L, 100L)))
    intercept[IllegalArgumentException] {
      Dedup.dropHotBuckets(idx, 0)
    }
  }

  test("minhashIndex: banding rows match minhashBandBuckets, sig matches signature") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val idx = Dedup.minhashIndex(docs, "doc_id", "text").collect()
    assert(idx.length == 4, "one row per band")
    val sig = docs.select(
      Dedup.minhashSignature(col("text"), 3, 16).as("s")).collect().head.getSeq[Long](0)
    idx.foreach { r =>
      assert(r.getSeq[Long](1) == sig, "index carries the full signature per band row")
    }
    val bb = Dedup.minhashBandBuckets(docs, "doc_id", "text")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(idx.map(r => (r.getInt(2), r.getLong(3))).toSet == bb,
      "banding buckets identical to the sig-less table")
  }

  test("corpusOverlap: exact identities, symmetry, subset containment") {
    val a = (1 to 60).map(i => (i.toLong, s"alpha bravo charlie delta $i echo foxtrot"))
      .toDF("doc_id", "text")
    val b = a.filter(col("doc_id") % 2 === 0)
    def one(df: org.apache.spark.sql.DataFrame) = df.collect().head
    // identical corpora: everything overlaps
    val self = one(Dedup.corpusOverlap(a, a, "text", k = 3, mode = "exact"))
    assert(self.getAs[Double]("jaccard") == 1.0 &&
      self.getAs[Double]("containment_a") == 1.0 &&
      self.getAs[Double]("containment_b") == 1.0)
    // subset: B's shingles are all in A
    val sub = one(Dedup.corpusOverlap(a, b, "text", k = 3, mode = "exact"))
    assert(sub.getAs[Double]("containment_b") == 1.0)
    assert(sub.getAs[Long]("n_intersect") == sub.getAs[Long]("n_b"))
    // symmetry: swapping sides swaps the containments, jaccard invariant
    val swapped = one(Dedup.corpusOverlap(b, a, "text", k = 3, mode = "exact"))
    assert(swapped.getAs[Double]("jaccard") == sub.getAs[Double]("jaccard"))
    assert(swapped.getAs[Double]("containment_a") == sub.getAs[Double]("containment_b"))
    assert(swapped.getAs[Double]("containment_b") == sub.getAs[Double]("containment_a"))
    // disjoint corpora: zero overlap
    val c = (1 to 40).map(i => (i.toLong, s"zulu yankee xray whiskey $i victor uniform"))
      .toDF("doc_id", "text")
    val dis = one(Dedup.corpusOverlap(a, c, "text", k = 3, mode = "exact"))
    assert(dis.getAs[Long]("n_intersect") == 0L && dis.getAs[Double]("jaccard") == 0.0)
    intercept[IllegalArgumentException] {
      Dedup.corpusOverlap(a, b, "text", mode = "bogus")
    }
    intercept[IllegalArgumentException] {
      Dedup.corpusOverlap(a, b, "text", hashMode = "bogus")
    }
  }

  test("corpusOverlap: sketch mode tracks exact within HLL error, zero exchanges") {
    val a = (1 to 400).map(i => (i.toLong,
      s"token$i word${i % 37} item${i % 11} common ground shared tail"))
      .toDF("doc_id", "text")
    val b = a.filter(col("doc_id") % 3 === 0)
    val ex = Dedup.corpusOverlap(a, b, "text", k = 3, mode = "exact").collect().head
    val sk = Dedup.corpusOverlap(a, b, "text", k = 3, mode = "sketch", rsd = 0.01)
      .collect().head
    // inclusion–exclusion compounds per-sketch error: bound the
    // intersection estimate against the UNION size (the standard caveat)
    val tol = 0.05 * ex.getAs[Long]("n_union")
    assert(math.abs(sk.getAs[Long]("n_a") - ex.getAs[Long]("n_a")) <= tol)
    assert(math.abs(sk.getAs[Long]("n_b") - ex.getAs[Long]("n_b")) <= tol)
    assert(math.abs(sk.getAs[Long]("n_intersect") - ex.getAs[Long]("n_intersect")) <= tol)
    // the sketch path never shuffles: HLL partials merge through the
    // driver-side single-row aggregate, no hashpartitioning exchange
    val plan = Dedup.corpusOverlap(a, b, "text", k = 3, mode = "sketch")
      .queryExecution.executedPlan.toString
    // no REQUIRED hash exchange (a key shuffle the agg would need);
    // the r19 Spread's explicit REPARTITION_BY_NUM is allowed — it moves
    // input rows once for parallelism, never distinct keys, and is a
    // size-guarded no-op at corpus scale
    val keyShuffles = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") && l.contains("ENSURE_REQUIREMENTS"))
    assert(keyShuffles.isEmpty,
      s"sketch overlap must not shuffle distinct keys:\n$plan")
  }

  // ---- winnowing (Schleimer/Wilkerson/Aiken SIGMOD'03) ----

  /** Driver-side reference: tokenize like TextAnalysis.tokens, hash every
    * stride-1 k-gram with Spark's own xxhash64, take per-w-window minima
    * (the selected HASH is tie-invariant, so the set equals robust
    * winnowing's), distinct. Returns empty for docs under k tokens —
    * matching the span family's windowTable.
    */
  private def winnowRef(text: String, k: Int, w: Int): Set[Long] = {
    val toks = text.trim.split("\\s+").toSeq
    if (toks.length < k) return Set.empty
    val grams = (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" "))
    val hashes = grams.toDF("g").select(xxhash64(col("g")))
      .collect().map(_.getLong(0)).toSeq
    val np = hashes.length
    (1 to math.max(1, np - w + 1)).map { j =>
      hashes.slice(j - 1, math.min(j - 1 + w, np)).min
    }.toSet
  }

  test("winnowFingerprints equals the per-window-minima reference on varied docs") {
    val rnd = new scala.util.Random(42)
    // small vocab forces repeated grams and hash ties; lengths straddle
    // the short-doc (np < w) and no-gram (< k tokens) edges
    val texts = Seq(
      base, nearDup, unrelated,
      "a b c d e f",                 // 6 tokens, np=2 < w → one truncated window
      "one two three four",          // 4 tokens < k=5 → no fingerprints
      "x x x x x x x x x x"          // all-identical grams → single fingerprint
    ) ++ (1 to 6).map(_ =>
      (1 to (8 + rnd.nextInt(30))).map(_ => s"t${rnd.nextInt(5)}").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(df, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = winnowRef(t, 5, 4)
      assert(got.getOrElse(i.toLong, Set.empty) == want,
        s"doc $i ('${t.take(40)}…'): got ${got.get(i.toLong)}, want $want")
    }
    // the guarantee shape: selected density well under the full gram count
    assert(got(5L).size == 1, "identical grams must collapse to one fingerprint")
  }

  test("winnowOverlap reports docs sharing a long run; hot fingerprints drop at maxDf") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens ≥ w+k−1
    val d = Seq(
      (1L, s"$shared and some unique tail for doc one"),
      (2L, s"prefix text then $shared closing words here"),
      (3L, unrelated)
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlap(d, "doc_id", "text", k = 5, w = 4,
        minShared = 1, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"the ≥ w+k−1 shared run must surface exactly the planted pair, got $pairs")

    // a fingerprint present in EVERY doc is boilerplate: with maxDf below
    // the doc count it must not generate candidates
    val boiler = (1L to 5L).map(i => (i, s"$shared totally distinct rest $i " +
      (1 to 6).map(j => s"u${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val guarded = Dedup.winnowOverlap(boiler, "doc_id", "text", k = 5, w = 4,
        minShared = 1, maxDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded.isEmpty,
      s"fingerprints hotter than maxDf must be excluded, got $guarded")
  }

  test("winnowAgainstCorpus: batch probes the persisted index; fresh docs pass; corpus text untouched") {
    val corpus = Seq(
      (1L, base), (2L, unrelated),
      (3L, "some third document with enough tokens to fingerprint nicely here")
    ).toDF("doc_id", "text")
    val idx = Dedup.winnowFingerprints(corpus, "doc_id", "text", k = 5, w = 4)
    val batch = Seq(
      (101L, base + " with a short appended tail"), // near-copy of corpus doc 1
      (102L, "a completely fresh batch document about streaming watermarks and state stores")
    ).toDF("doc_id", "text")
    val out = Dedup.winnowAgainstCorpus(batch, idx, "doc_id", "text",
        k = 5, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((101L, 1L)), s"the near-copy must hit its corpus source, got $out")
    assert(!out.exists(_._1 == 102L), s"the fresh doc must not match, got $out")
    // a malformed index fails loudly
    intercept[IllegalArgumentException] {
      Dedup.winnowAgainstCorpus(batch, idx.withColumnRenamed("fp", "hash"),
        "doc_id", "text")
    }
  }

  test("winnowFingerprints guards: bad modes and colliding id column fail loudly") {
    val d = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.winnowFingerprints(d, "doc_id", "text", hashMode = "bogus")
    }
    intercept[IllegalArgumentException] {
      Dedup.winnowFingerprints(d.withColumnRenamed("doc_id", "wh"), "wh", "text")
    }
  }
}
