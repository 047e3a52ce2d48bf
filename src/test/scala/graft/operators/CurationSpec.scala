package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionSignals: known ratios incl. one-token and fully-repetitive docs") {
    val docs = Seq(
      (1L, "a b c d"),        // all distinct: 0, 0
      (2L, "a a a a"),        // 1 distinct word of 4; 1 distinct bigram of 3
      (3L, "x"),              // one token: both 0 by convention
      (4L, "a b a b a")       // 2 distinct of 5; bigrams ab,ba,ab,ba → 2 of 4
    ).toDF("doc_id", "text")
    val out = Curation.repetitionSignals(docs, "text")
      .select("doc_id", "dup_word_ratio", "dup_2gram_ratio")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((0.0, 0.0)))
    assert(out(2L) == ((0.75, 0.6667)))
    assert(out(3L) == ((0.0, 0.0)))
    assert(out(4L) == ((0.6, 0.5)))
  }

  test("redactPII replaces emails and phones; counts match; prose untouched") {
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.org today"),
      (2L, "call +1 (555) 010-7788 or 555-010-9999 now"),
      (3L, "no pii here, just words and the number seven")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        Curation.redactPII(col("text")).as("clean"),
        Curation.piiMatchCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("reach me at <EMAIL> today", 1)))
    assert(out(2L) == (("call <PHONE> or <PHONE> now", 2)))
    assert(out(3L) == (("no pii here, just words and the number seven", 0)))
  }

  test("piiMatchCount does not double-count a digit run inside an email") {
    val docs = Seq((1L, "reach 5550107788@carrier.com")).toDF("doc_id", "text")
    val out = docs.select(Curation.redactPII(col("text")).as("clean"),
      Curation.piiMatchCount(col("text")).as("n")).head()
    assert(out.getString(0) == "reach <EMAIL>")
    assert(out.getInt(1) == 1, "one redaction emitted -> count must be 1")
  }

  test("piiMatchCount honors a custom digit-bearing email token") {
    // counting must mask with the SAME token redactPII emits: a
    // digit-bearing token is itself phone-matchable, so the phone pass
    // sees (and replaces) it — the count tracks the replacements actually
    // performed only if both functions share the token
    val docs = Seq((1L, "reach 5550107788@carrier.com or 555-010-9999"))
      .toDF("doc_id", "text")
    val tok = "<pii:00000001>"
    val out = docs.select(
      Curation.redactPII(col("text"), emailToken = tok).as("clean"),
      Curation.piiMatchCount(col("text"), emailToken = tok).as("n")).head()
    // 3 replacements: 1 email, 1 real phone, 1 digit run inside the token
    assert(out.getString(0) == "reach <pii:<PHONE>> or <PHONE>")
    assert(out.getInt(1) == 3, "count must equal the replacements performed")
  }

  test("hashSplit: deterministic, content-based, dups co-assigned, ratio sane") {
    val docs = spark.range(0, 2000)
      .select(col("id"), concat(lit("document number "), col("id")).as("text"))
    val labeled = docs.select(col("id"), col("text"),
      Curation.hashSplit(col("text")).as("s"))
    // deterministic: same content → same side, regardless of row identity
    val twice = labeled.unionByName(labeled)
      .groupBy(col("text")).agg(count_distinct(col("s")).as("sides"))
    assert(twice.agg(max(col("sides"))).head().getLong(0) == 1L)
    // only the two labels, with roughly the 14/16 proportion
    val byLabel = labeled.groupBy(col("s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val"))
    val trainFrac = byLabel("train").toDouble / 2000
    assert(trainFrac > 0.8 && trainFrac < 0.95, s"train fraction $trainFrac")
    // bounds check on the knob
    intercept[IllegalArgumentException] {
      Curation.hashSplit(col("text"), trainSixteenths = 0)
    }
  }

  test("removeBoilerplateLines strips frequent lines, keeps order, empties all-boiler docs") {
    val docs = Seq(
      (1L, "unique alpha\nSHARED FOOTER\nunique beta"),
      (2L, "SHARED FOOTER\nanother body line"),
      (3L, "third doc text\nSHARED FOOTER"),
      (4L, "SHARED FOOTER")).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateLines(docs, "doc_id", "text", maxDocFreq = 3)
      .select("doc_id", "clean_text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique alpha\nunique beta", "order must survive removal")
    assert(out(2L) == "another body line")
    assert(out(3L) == "third doc text")
    assert(out(4L) == "", "all-boilerplate doc collapses to empty string")
    // within-doc repetition of a RARE line is not boilerplate (df counts
    // distinct docs, not occurrences)
    val rep = Seq((1L, "x\nx\nx"), (2L, "y")).toDF("doc_id", "text")
    val repOut = Curation.removeBoilerplateLines(rep, "doc_id", "text", maxDocFreq = 1)
      .select("doc_id", "clean_text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(repOut(1L) == "x\nx\nx")
  }

  test("removeBoilerplateLines: shuffle fallback above the broadcast cap is identical") {
    // maxBroadcastEntries = 0 forces the plain shuffle anti-join branch;
    // output must be byte-identical to the broadcast fast path
    val docs = Seq(
      (1L, "unique alpha\nSHARED FOOTER\nunique beta"),
      (2L, "SHARED FOOTER\nanother body line"),
      (3L, "third doc text\nSHARED FOOTER")).toDF("doc_id", "text")
    def run(cap: Long) =
      Curation.removeBoilerplateLines(docs, "doc_id", "text", maxDocFreq = 2,
          maxBroadcastEntries = cap)
        .select("doc_id", "clean_text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fallback = run(0L)
    assert(fallback == run(Long.MaxValue))
    assert(fallback(1L) == "unique alpha\nunique beta")
    // The fallback drops the broadcast HINT (the optimizer may still
    // auto-broadcast a provably small set — fine). With auto-broadcast
    // off, cap=0 must plan a shuffle anti-join where the hinted path
    // would still force a broadcast — that's the branch distinction.
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val fallbackPlan = Curation.removeBoilerplateLines(docs, "doc_id", "text",
          maxDocFreq = 2, maxBroadcastEntries = 0L)
        .queryExecution.executedPlan.toString
      assert(!fallbackPlan.contains("BroadcastHashJoin [_lh"),
        s"cap=0 must not force a broadcast anti-join:\n$fallbackPlan")
      val hintedPlan = Curation.removeBoilerplateLines(docs, "doc_id", "text",
          maxDocFreq = 2, maxBroadcastEntries = Long.MaxValue)
        .queryExecution.executedPlan.toString
      assert(hintedPlan.contains("BroadcastHashJoin [_lh"),
        s"under the cap the anti-join must be broadcast-hinted:\n$hintedPlan")
    } finally spark.conf.set(thresholdKey, saved)
  }

  test("lineDocFrequency counts distinct docs per exact line") {
    val docs = Seq(
      (1L, "a\nb"), (2L, "a\na\nc"), (3L, "a")).toDF("doc_id", "text")
    val freq = Curation.lineDocFrequency(docs, "doc_id", "text")
      .collect().map(r => r.getAs[String]("line") -> r.getAs[Long]("doc_freq")).toMap
    assert(freq == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("sampleByWeight: rate 1 keeps all, 0 drops all, draws nest and are deterministic") {
    val docs = spark.range(0, 1000)
      .select(col("id"), concat(lit("doc "), col("id")).as("text"),
        when(pmod(col("id"), lit(2)) === 0, "en").otherwise("zh").as("lang"))
    def ids(rates: Map[String, Double]) =
      Curation.sampleByWeight(docs, "lang", "text", rates, seed = "s1")
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(Map("en" -> 1.0, "zh" -> 1.0)).size == 1000)
    val enOnly = ids(Map("en" -> 1.0, "zh" -> 0.0))
    assert(enOnly.size == 500 && enOnly.forall(_ % 2 == 0))
    // smaller rate draws a SUBSET of the larger (bucket thresholds nest)
    val quarter = ids(Map("en" -> 0.25, "zh" -> 0.25))
    val half = ids(Map("en" -> 0.5, "zh" -> 0.5))
    assert(quarter.subsetOf(half))
    assert(quarter.size > 150 && quarter.size < 350, s"got ${quarter.size}")
    // deterministic: identical call, identical draw
    assert(half == ids(Map("en" -> 0.5, "zh" -> 0.5)))
    // defaultRate covers unmapped strata; bad rates rejected loudly
    assert(ids(Map.empty) == (0L until 1000L).toSet)
    intercept[IllegalArgumentException] {
      Curation.sampleByWeight(docs, "lang", "text", Map("en" -> 1.5))
    }
  }

  test("ratesForTargetMixture: shares hit target, bounded by the scarcest stratum") {
    // a = 100 tokens, b = 50; target 50/50 → total* = min(100/.5, 50/.5) = 100
    // → rate_a = .5·100/100 = 0.5, rate_b = .5·100/50 = 1.0 (never upsamples)
    val docs = Seq(
      ("a", Seq.fill(60)("x").mkString(" ")), ("a", Seq.fill(40)("x").mkString(" ")),
      ("b", Seq.fill(50)("y").mkString(" ")),
      ("c", "ignored stratum")).toDF("lang", "text")
    val rates = Curation.ratesForTargetMixture(docs, "lang", "text",
      Map("a" -> 0.5, "b" -> 0.5))
    assert(math.abs(rates("a") - 0.5) < 1e-12 && math.abs(rates("b") - 1.0) < 1e-12)
    assert(!rates.contains("c"), "strata outside the target get no rate")
    intercept[IllegalArgumentException] { // shares must sum to 1
      Curation.ratesForTargetMixture(docs, "lang", "text", Map("a" -> 0.5, "b" -> 0.6))
    }
    intercept[IllegalArgumentException] { // a target stratum must exist
      Curation.ratesForTargetMixture(docs, "lang", "text", Map("a" -> 0.5, "zz" -> 0.5))
    }
  }

  test("keepTopQuantile: exact gate, approx within rank error, nulls never pass") {
    val df = spark.range(0, 100).select(
      col("id"), col("id").cast("double").as("score"))
    // exact: threshold = interpolated 80th pct of 0..99 = 79.2 → ids 80..99
    val exact = Curation.keepTopQuantile(df, "score", 0.2, exact = true)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(exact == (80L to 99L).toSet)
    // approx threshold is a REAL sample value (no interpolation): the gate
    // may admit at most the rank-error neighbors, never lose a top row
    val approx = Curation.keepTopQuantile(df, "score", 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(approx) && (approx -- exact).size <= 1,
      s"approx gate must cover the exact top set within rank error, got ${approx -- exact}")
    // null scores are dropped even at keepFraction = 1.0
    val withNulls = df.withColumn("score",
      when(col("id") < 10, lit(null).cast("double")).otherwise(col("score")))
    val kept = Curation.keepTopQuantile(withNulls, "score", 1.0, exact = true)
    assert(kept.count() == 90, "unscored rows must never pass the gate")
    intercept[IllegalArgumentException] {
      Curation.keepTopQuantile(df, "score", 0.0)
    }
  }

  test("keepTopQuantile evaluates the scored input ONCE; release drops the cache") {
    // the round-7 verdict's item 2: the threshold aggregate and the gate
    // filter both consume the scored subtree — without the internal
    // cache, an expensive scoring pipeline would run twice. Count actual
    // evaluations with an accumulator-bearing scorer.
    val evals = spark.sparkContext.longAccumulator("qg_evals")
    val costly = udf((x: Long) => { evals.add(1); x.toDouble })
    val df = spark.range(0, 200).select(col("id"), costly(col("id")).as("score"))
    val (gated, release) = Curation.keepTopQuantileReleasable(df, "score", 0.5, exact = true)
    assert(gated.count() == 100)
    assert(evals.value == 200,
      s"scoring must run once per row (cache-backed), got ${evals.value} evaluations")
    release()
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "release() must unpersist the internal cache")
    // a caller-cached input is respected: not re-persisted, not unpersisted
    val pre = spark.range(0, 10).select(col("id"), col("id").cast("double").as("score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      val (g2, r2) = Curation.keepTopQuantileReleasable(pre, "score", 0.5, exact = true)
      assert(g2.count() == 5)
      r2()
      assert(pre.storageLevel == org.apache.spark.storage.StorageLevel.MEMORY_ONLY,
        "release() must not drop a cache the caller owns")
    } finally pre.unpersist()
  }

  test("topQuantileThreshold: scalar matches the gate; empty/null scores → None") {
    val df = spark.range(0, 100).select(col("id"), col("id").cast("double").as("score"))
    val thr = Curation.topQuantileThreshold(df, "score", 0.2, exact = true).get
    val viaScalar = df.filter(col("score") >= thr).collect().map(_.getLong(0)).toSet
    val viaGate = Curation.keepTopQuantile(df, "score", 0.2, exact = true)
      .collect().map(_.getLong(0)).toSet
    assert(viaScalar == viaGate, "the eager scalar must reproduce the lazy gate's set")
    val empty = df.filter(lit(false))
    assert(Curation.topQuantileThreshold(empty, "score", 0.5).isEmpty)
  }

  test("ratesForTargetMixture: zero-token stratum fails loudly; null text counts 0") {
    val zero = Seq(("a", "x y"), ("b", null: String)).toDF("lang", "text")
    val e = intercept[IllegalArgumentException] {
      Curation.ratesForTargetMixture(zero, "lang", "text", Map("a" -> 0.5, "b" -> 0.5))
    }
    assert(e.getMessage.contains("zero total tokens"))
    // a null text next to real rows contributes 0 tokens (not -1, not a
    // nulled sum): a = 2 tokens, b = 1 → rates as if the null were absent
    val mixed = Seq(("a", "x y"), ("a", null: String), ("b", "z")).toDF("lang", "text")
    val rates = Curation.ratesForTargetMixture(mixed, "lang", "text",
      Map("a" -> 0.5, "b" -> 0.5))
    assert(math.abs(rates("a") - 0.5) < 1e-12 && math.abs(rates("b") - 1.0) < 1e-12)
  }

  test("duplicate ids in a caller-supplied cluster map never fan out rows") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val dupMap = Seq((1L, 100L), (1L, 50L), (2L, 200L)).toDF("doc_id", "cluster")
    val split = Curation.splitByCluster(docs, dupMap, "doc_id", "cluster")
    assert(split.count() == 2, "splitByCluster must emit one row per corpus row")
    val audited = Curation.auditSplitLeakage(
      docs.withColumn("split_label", lit("train")), dupMap,
      "doc_id", "cluster", "split_label")
    assert(audited.count() == 0, "a single-label corpus cannot leak")
    val best = Dedup.keepBestPerCluster(
      docs.withColumn("q", col("doc_id")), dupMap, "doc_id", "cluster", "q")
    assert(best.count() == 2,
      "keepBestPerCluster must not duplicate a doc across its duplicate map rows")
  }

  test("splitByCluster: whole clusters co-assign; singletons fall back to id") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (7L, "other text"), (9L, "lonely")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("doc_id", "cluster")
    val out = Curation.splitByCluster(docs, clusters, "doc_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(Set(out(1L), out(2L), out(3L)).size == 1,
      "every member of a cluster must land on the same side")
    // unclustered row splits by its own id — same label as a cluster
    // whose canonical IS that id
    val single = Curation.splitByCluster(
      docs.filter(col("doc_id") === 9L),
      Seq((9L, 9L)).toDF("doc_id", "cluster"), "doc_id", "cluster")
      .collect().head.getString(2)
    assert(out(9L) == single, "singleton fallback must hash the id identically")
    // a cluster key hashes like hashSplit over its string form
    val expect = docs.sparkSession.range(1).select(
      Curation.hashSplit(lit("1"), 14)).collect().head.getString(0)
    assert(out(1L) == expect)
  }

  test("auditSplitLeakage flags straddling clusters; splitByCluster audits clean") {
    val docs = Seq(
      (1L, "near dup one"), (2L, "near dup one v2"), (3L, "near dup one v3"),
      (7L, "standalone")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("doc_id", "cluster")
    // force a leak: per-document labels disagree inside cluster 1
    val leaky = docs.withColumn("split_label",
      when(col("doc_id") === 2L, "val").otherwise("train"))
    val found = Curation.auditSplitLeakage(leaky, clusters,
      "doc_id", "cluster", "split_label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(found.toSeq == Seq((1L, 2L, 3L)),
      s"exactly cluster 1 leaks with 2 labels over 3 rows, got ${found.toSeq}")
    // a cluster-keyed split can never leak — the audit must come back empty
    val safe = Curation.splitByCluster(docs, clusters, "doc_id", "cluster")
    assert(Curation.auditSplitLeakage(safe, clusters,
      "doc_id", "cluster", "split_label").isEmpty,
      "splitByCluster output must audit clean")
  }

  test("packSequences doc_spans: attribution spans in sequence order") {
    // budget 4: seq0 = "a b c" + "d" of doc 2 → spans 1:0:3,2:0:1
    //           seq1 = "e" (doc 2 tail) + "f g h" → spans 2:1:2,3:0:3
    val docs = Seq(
      (1L, 0L, "a b c"), (2L, 0L, "d e"), (3L, 0L, "f g h"))
      .toDF("doc_id", "shard", "text")
    val spans = Curation.packSequences(docs, "doc_id", "text", budget = 4L, "shard")
      .collect().map(r => r.getLong(1) -> r.getString(4)).toMap
    assert(spans(0L) == "1:0:3,2:0:1", s"seq 0 spans, got ${spans(0L)}")
    assert(spans(1L) == "2:1:2,3:0:3", s"seq 1 spans, got ${spans(1L)}")
  }

  test("shuffleForTraining: reproducible global pseudorandom order on any layout") {
    val docs = spark.range(0, 500).select(
      col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"))
    def order(d: org.apache.spark.sql.DataFrame, seed: String) =
      Curation.shuffleForTraining(d, "text", numShards = 4, seed = seed)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val base = order(docs, "e0")
    assert(base != base.sorted, "shuffled order must not be the input order")
    assert(base.toSet == (0L until 500L).toSet, "permutation: every row exactly once")
    assert(order(docs.repartition(13), "e0") == base,
      "order must be layout-independent (same on a 13-partition input)")
    assert(order(docs, "e1") != base, "a new seed must draw a new permutation")
    // shard i holds ranks strictly below shard i+1, each shard sorted —
    // file order IS global order
    val parts = Curation.shuffleForTraining(docs, "text", 4, "e0")
      .select(spark_partition_id().as("p"), col("shuffle_rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).toSeq)
    assert(parts.length == 4, s"range partitioner must produce 4 shards, got ${parts.length}")
    parts.foreach(p => assert(p == p.sorted, "each shard must be sorted by rank"))
    parts.sliding(2).foreach { case Seq(a, b) =>
      assert(a.last <= b.head, "shard boundaries must respect global rank order")
    case _ => }
    intercept[IllegalArgumentException] {
      Curation.shuffleForTraining(docs, "text", 0, "e0")
    }
  }

  test("capTokensPerGroup admits priority order until budget, always first row") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 80L), (3L, "a", 50L),
      (4L, "b", 500L), (5L, "b", 10L)).toDF("doc_id", "grp", "n_tokens")
    val kept = Curation.capTokensPerGroup(docs, "grp", "n_tokens", budget = 150L,
        priorityCol = "n_tokens", idCol = "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // group a: cum-before 0,100,180 → doc 3 over budget; group b: the
    // oversized first row is admitted (budget not yet full when it starts)
    assert(kept == Set(1L, 2L, 4L))
    val exact = Curation.capTokensPerGroupExact(docs, "grp", "n_tokens", budget = 150L,
        col("n_tokens").desc, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact == kept, "exact-window variant must keep the identical set")
    intercept[IllegalArgumentException] {
      Curation.capTokensPerGroup(docs, "grp", "n_tokens", budget = 0L,
        priorityCol = "n_tokens", idCol = "doc_id")
    }
    intercept[IllegalArgumentException] {
      Curation.capTokensPerGroupExact(docs, "grp", "n_tokens", budget = 150L)
    }
  }

  test("capTokensPerGroup ≡ exact window on adversarial data; nulls survive") {
    // 400 rows, 3 strata (incl. a NULL stratum), heavy priority ties so
    // bucket boundaries and in-bucket tie-breaks are both exercised; a few
    // NULL priorities must sort last, not vanish
    val docs = spark.range(0, 400).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(3)) === 0, "en")
        .when(pmod(col("id"), lit(3)) === 1, "zh").as("grp"),
      when(pmod(col("id"), lit(40)) === 7, lit(null).cast("long"))
        .otherwise(pmod(col("id"), lit(11))).as("prio"),
      (pmod(col("id"), lit(9)) + 1).as("n_tokens"))
    def keptSet(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    for (buckets <- Seq(1, 7, 1024); budget <- Seq(1L, 57L, 200L, 100000L)) {
      val scalable = Curation.capTokensPerGroup(docs, "grp", "n_tokens", budget,
        priorityCol = "prio", idCol = "doc_id", numBuckets = buckets)
      val exact = Curation.capTokensPerGroupExact(docs, "grp", "n_tokens", budget,
        col("prio").desc_nulls_last, col("doc_id"))
      assert(keptSet(scalable) == keptSet(exact),
        s"hierarchical/exact mismatch at buckets=$buckets budget=$budget")
    }
    // ascending direction too
    val asc = Curation.capTokensPerGroup(docs, "grp", "n_tokens", 57L,
      priorityCol = "prio", idCol = "doc_id", descending = false, numBuckets = 16)
    val ascExact = Curation.capTokensPerGroupExact(docs, "grp", "n_tokens", 57L,
      col("prio").asc_nulls_last, col("doc_id"))
    assert(keptSet(asc) == keptSet(ascExact))
  }

  test("capTokensPerGroup plan: the heavy window partitions by (group, bucket)") {
    // The scale promise: no single-task stratum sort. The corpus-scale
    // running sum must window over (group, _cap_bkt) — parallelism is
    // groups × buckets — and only the bucket-totals window (≤ groups ×
    // buckets rows) may partition by group alone.
    val docs = Seq((1L, "a", 10L, 5L), (2L, "a", 20L, 5L)).toDF("doc_id", "grp", "prio", "n_tokens")
    val plan = Curation.capTokensPerGroup(docs, "grp", "n_tokens", 100L,
      priorityCol = "prio", idCol = "doc_id").queryExecution.executedPlan.toString
    assert("""windowspecdefinition\(grp#\d+, _cap_bkt#\d+""".r.findFirstIn(plan).isDefined,
      s"big running sum must be partitioned by (grp, _cap_bkt):\n$plan")
  }

  test("chunkByTokens: overlap windows, suffix-chunk suppression, short docs") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "s1 s2 s3")).toDF("doc_id", "text")
    val out = Curation.chunkByTokens(docs, "doc_id", "text", maxTokens = 8, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getInt(3)))).toMap
    // step 4: starts 0,4 — start 8 would be a pure suffix of chunk@4, not emitted
    assert(out.keySet == Set((1L, 0), (1L, 1), (2L, 0)))
    assert(out((1L, 0)) == (("t1 t2 t3 t4 t5 t6 t7 t8", 8)))
    assert(out((1L, 1)) == (("t5 t6 t7 t8 t9 t10", 6)))
    assert(out((2L, 0)) == (("s1 s2 s3", 3)))
    // zero overlap tiles exactly
    val tiled = Curation.chunkByTokens(docs, "doc_id", "text", maxTokens = 8)
      .filter(col("doc_id") === 1L)
      .orderBy(col("chunk_id")).collect().map(_.getString(2))
    assert(tiled.toSeq == Seq("t1 t2 t3 t4 t5 t6 t7 t8", "t9 t10"))
    intercept[IllegalArgumentException] {
      Curation.chunkByTokens(docs, "doc_id", "text", maxTokens = 4, overlap = 4)
    }
  }

  test("packSequences: exact budget-token sequences, straddles split, doc order kept") {
    // shard 0: docs (a b c)(d e)(f g h i), budget 4 →
    //   seq0 = "a b c d", seq1 = "e f g h", seq2 = "i"
    val docs = Seq(
      (1L, 0L, "a b c"), (2L, 0L, "d e"), (3L, 0L, "f g h i"),
      (4L, 1L, "x y")).toDF("doc_id", "shard", "text")
    val out = Curation.packSequences(docs, "doc_id", "text", budget = 4L, "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(out((0L, 0L)) == (("a b c d", 4L)))
    assert(out((0L, 1L)) == (("e f g h", 4L)))
    assert(out((0L, 2L)) == (("i", 1L)))
    assert(out((1L, 0L)) == (("x y", 2L)), "each shard packs independently")
    // every sequence except each shard's last is exactly budget tokens
    val lens = Curation.packSequences(docs, "doc_id", "text", 4L, "shard")
      .groupBy(col("shard")).agg(
        max(col("seq_id")).as("last"),
        collect_list(struct(col("seq_id"), col("n_seq_tokens"))).as("seqs"))
      .collect()
    lens.foreach { r =>
      val last = r.getLong(1)
      r.getSeq[org.apache.spark.sql.Row](2).foreach { s =>
        if (s.getLong(0) != last)
          assert(s.getLong(1) == 4L, s"non-final sequence must hold budget tokens: $s")
      }
    }
    intercept[IllegalArgumentException] {
      Curation.packSequences(docs, "doc_id", "text", 0L, "shard")
    }
  }

  test("packSequences: null text mid-shard does not shift later boundaries") {
    // doc 2's null text tokenizes to null (size = -1); folded into the
    // running sum it would shift every later doc's sequence assignment.
    // The packing must be identical to the same corpus without the row.
    // (An EMPTY string is NOT zero tokens: split("") = [""] — one empty
    // token — by the whitespace-token contract tokenCount and the DuckDB
    // oracle share, so only null is the vanishing case.)
    val withNull = Seq(
      (1L, 0L, Option("a b c")), (2L, 0L, Option.empty[String]),
      (4L, 0L, Option("d e f g h")))
      .toDF("doc_id", "shard", "text")
    val without = Seq((1L, 0L, "a b c"), (4L, 0L, "d e f g h"))
      .toDF("doc_id", "shard", "text")
    def packed(d: org.apache.spark.sql.DataFrame) =
      Curation.packSequences(d, "doc_id", "text", budget = 4L, "shard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(packed(withNull) == packed(without),
      "null-text docs must be invisible to the packing layout")
    assert(packed(withNull) == Set(
      (0L, 0L, "a b c d", 4L), (0L, 1L, "e f g h", 4L)))
  }

  test("capTokensPerGroup: NULL token counts are admitted as 0, not dropped") {
    // an unguarded null n nulls the admission predicate and silently
    // drops the row — inconsistent with null priorities (bucketed last)
    // and null strata (null-safe joins), which are both kept
    val docs = Seq(
      (1L, "a", Option(100L)), (2L, "a", Option.empty[Long]),
      (3L, "a", Option(40L)), (4L, "a", Option(200L)))
      .toDF("doc_id", "grp", "n_tokens")
    // priority = doc_id ascending: 1(100), 2(null→0), 3(40), 4(200)
    // cum-before: 0, 100, 100, 140 → all admitted under budget 150
    val kept = Curation.capTokensPerGroup(docs, "grp", "n_tokens", budget = 150L,
        priorityCol = "doc_id", idCol = "doc_id", descending = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L),
      "null-count row must be admitted and contribute 0 to the running sum")
    val exact = Curation.capTokensPerGroupExact(docs, "grp", "n_tokens", 150L,
        col("doc_id").asc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact == kept, "exact variant must treat null counts identically")
  }

  test("sampleExactPerGroup: exactly n per stratum, deterministic, seed-sensitive, no window") {
    val docs = spark.range(0, 300).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0, "en").otherwise("zh").as("lang"),
      concat(lit("document "), col("id")).as("text"))
    def draw(seed: String) =
      Curation.sampleExactPerGroup(docs, "lang", "text", n = 10, seed = seed)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val d1 = draw("s1")
    assert(d1.size == 20, "10 per stratum × 2 strata")
    assert(d1 == draw("s1"), "content-derived rank must be run-stable")
    assert(d1 != draw("s2"), "a different seed draws an independent sample")
    // n ≥ stratum size keeps the whole stratum
    val all = Curation.sampleExactPerGroup(docs, "lang", "text", n = 1000)
    assert(all.count() == 300)
    // scale shape: bounded heap, never a per-stratum window sort
    val plan = Curation.sampleExactPerGroup(docs, "lang", "text", n = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"exact-N sample must not plan a window:\n$plan")
    assert(plan.contains("top_k_any"), s"must rank through the bounded heap:\n$plan")
  }

  test("sampleByTemperature: largest-remainder quotas, exact total, flattening, guards") {
    // sizes 90/9/1 — α=0.5 weights √90/3/1 ≈ 9.487/3/1
    val df = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 99).map(i => (i.toLong, "mid")) ++ Seq((100L, "tiny")))
      .toDF("id", "seg")
    // N=10: exact 7.03/2.22/0.74 → base 7/2/0, leftover 1 → tiny's 0.74
    // is the largest remainder → quotas 7/2/1
    val out = Curation.sampleByTemperature(df, "seg", "id", totalN = 10)
    val bySeg = out.groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySeg == Map("big" -> 7L, "mid" -> 2L, "tiny" -> 1L))
    assert(out.count() == 10)
    // N=5: exact 3.52/1.11/0.37 → base 3/1/0, leftover 1 → big's 0.52
    // wins the +1; tiny draws NOTHING (quota 0, slice length 0)
    val small = Curation.sampleByTemperature(df, "seg", "id", totalN = 5)
      .groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(small == Map("big" -> 4L, "mid" -> 1L))
    // α=1 keeps natural proportions exactly (10·90/100 = 9 on the floor
    // boundary — integer weights make it exact in double)
    val nat = Curation.sampleByTemperature(
        df.filter(col("seg") =!= "tiny"), "seg", "id", totalN = 11, alpha = 1.0)
      .groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nat == Map("big" -> 10L, "mid" -> 1L))
    // α=0 flattens to uniform
    val flat = Curation.sampleByTemperature(df, "seg", "id", totalN = 3, alpha = 0.0)
      .groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat == Map("big" -> 1L, "mid" -> 1L, "tiny" -> 1L))
    // the per-group draw IS sampleExactPerGroup's deterministic pick
    val mine = Curation.sampleByTemperature(df, "seg", "id", totalN = 10)
      .filter(col("seg") === "mid").select("id").as[Long].collect().toSet
    val ref = Curation.sampleExactPerGroup(
        df.filter(col("seg") === "mid"), "seg", "id", n = 2)
      .select("id").as[Long].collect().toSet
    assert(mine == ref)
    intercept[IllegalArgumentException] {
      Curation.sampleByTemperature(df, "seg", "id", totalN = 0)
    }
    intercept[IllegalArgumentException] {
      Curation.sampleByTemperature(df, "seg", "id", totalN = 10, alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      Curation.sampleByTemperature(df, "seg", "id", totalN = 100, maxTotalN = 50)
    }
  }

  test("sampleByTemperature: quotas cap at group size, freed seats cascade") {
    // sizes 1/50/50, α=0 → uniform weights, exact 10/10/10 for N=30;
    // group a can only seat 1, so its 9 freed seats cascade in
    // (remainder desc, seg) order — all remainders are 0, so 'b' (first
    // alphabetically after a) absorbs all 9: quotas 1/19/10, Σ = 30
    val df = (Seq((1L, "a")) ++ (2 to 51).map(i => (i.toLong, "b")) ++
      (52 to 101).map(i => (i.toLong, "c"))).toDF("id", "seg")
    val out = Curation.sampleByTemperature(df, "seg", "id", totalN = 30, alpha = 0.0)
    val bySeg = out.groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySeg == Map("a" -> 1L, "b" -> 19L, "c" -> 10L))
    assert(out.count() == 30)
    // totalN beyond the corpus: the draw is everything — Σ min(quota, n)
    // = Σ n, never silently short of the population
    val everything = Curation.sampleByTemperature(df, "seg", "id",
      totalN = 150, alpha = 0.0)
    assert(everything.count() == 101)
  }

  test("packPlan: hand-computed layout, boundary straddle, shard independence") {
    val docs = Seq(
      (1L, 0L, 5L), (2L, 0L, 3L), (3L, 0L, 10L), // shard 0: cum 5, 8, 18
      (4L, 1L, 7L)                                // shard 1 restarts at 0
    ).toDF("doc_id", "shard", "n_tokens")
    val out = Curation.packPlan(docs, "doc_id", "n_tokens", budget = 6L, shardCol = "shard")
      .select("doc_id", "seq_first", "seq_offset", "n_seqs")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((0L, 0L, 1L)), "fits inside sequence 0")
    assert(out(2L) == ((0L, 5L, 2L)), "starts at offset 5, straddles into seq 1")
    assert(out(3L) == ((1L, 2L, 2L)), "starts in seq 1, spans through seq 2")
    assert(out(4L) == ((0L, 0L, 2L)), "each shard numbers its own sequences from 0")
    intercept[IllegalArgumentException] {
      Curation.packPlan(docs, "doc_id", "n_tokens", budget = 0L, shardCol = "shard")
    }
  }

  test("dsirWeights/dsirScore: target-like documents score higher, deterministic") {
    // two disjoint vocabularies; the target sample speaks only vocab A,
    // so the LLR weights must rank pure-A docs above pure-B docs
    val vocabA = "alpha beta gamma delta epsilon zeta"
    val vocabB = "uno dos tres cuatro cinco seis"
    val source = Seq(
      (1L, vocabA), (2L, vocabA), (3L, vocabB), (4L, vocabB),
      (5L, "alpha beta uno dos")  // mixed
    ).toDF("doc_id", "text")
    val target = Seq((100L, vocabA), (101L, "alpha gamma epsilon")).toDF("doc_id", "text")
    val w = Curation.dsirWeights(source, target, "text")
    assert(w.length == 256)
    val scores = Curation.dsirScore(source, "text", w)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_score")).toMap
    assert(scores(1L) == scores(2L), "identical docs score identically")
    assert(scores(1L) > scores(5L) && scores(5L) > scores(3L),
      s"ranking must be pure-target > mixed > off-target, got $scores")
    // refitting is deterministic (md5 buckets, exact counts, no RNG)
    assert(Curation.dsirWeights(source, target, "text").toSeq == w.toSeq)
    intercept[IllegalArgumentException] {
      Curation.dsirScore(source, "text", Array(1.0, 2.0))
    }
  }

  test("perplexityBuckets: per-group terciles, head = best score, null score → null bucket") {
    val df = Seq(
      ("en", 1L, -1.0), ("en", 2L, -2.0), ("en", 3L, -3.0),
      ("en", 4L, -4.0), ("en", 5L, -5.0), ("en", 6L, -6.0),
      ("de", 7L, -1.5), ("de", 8L, -2.5), ("de", 9L, -3.5)
    ).toDF("lang", "doc_id", "score")
      .unionByName(Seq(("en", 10L)).toDF("lang", "doc_id")
        .withColumn("score", lit(null).cast("double")))
    val out = Curation.perplexityBuckets(df, "lang", "score")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("ppl_bucket")).toMap
    // en terciles over {-1..-6}: hi=-2.67, lo=-4.33 (null score excluded
    // from percentile) → best scores land in head
    assert(out(1L) == "head" && out(2L) == "head")
    assert(out(3L) == "middle" && out(4L) == "middle")
    assert(out(5L) == "tail" && out(6L) == "tail")
    // groups bucket independently
    assert(out(7L) == "head" && out(8L) == "middle" && out(9L) == "tail")
    assert(out(10L) == null, "unscored rows are not classifiable")
  }

  test("gopherRules: each rule flags its own violation; keep is the conjunction") {
    val good = ("the quick brown fox jumps over a lazy dog and " * 5).trim // 50 words, stopwords, varied
    val docs = Seq(
      (1L, good),
      (2L, "too short to pass"),                                  // < minWords
      (3L, ("ab " * 60).trim),                                    // mean word len 2 < 3
      (4L, ("the !!! of ??? and ### to " * 10).trim),             // punct-heavy
      (5L, ("lorem ipsum dolor sit amet consectetur adipiscing elit sed " * 7).trim), // no stopwords
      (6L, ("the cat " * 30).trim)                                // one repeated 2-gram
    ).toDF("doc_id", "text")
    val out = Curation.gopherRules(docs, "text", minWords = 20, maxWords = 1000,
        minMeanWordLen = 3.0, maxMeanWordLen = 10.0, maxPunctRatio = 0.2,
        minStopwords = 2, maxDup2gramRatio = 0.8)
      .select("doc_id", "ok_words", "ok_word_len", "ok_punct", "ok_stopwords",
        "ok_repetition", "gopher_keep")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6))).toMap
    assert(out(1L) == ((true, true, true, true, true, true)), s"got ${out(1L)}")
    assert(!out(2L)._1 && !out(2L)._6, "short doc fails word count")
    assert(!out(3L)._2, "2-char words fail mean word length")
    assert(!out(4L)._3, "symbol-heavy doc fails punct ratio")
    assert(!out(5L)._4, "stopword-free doc fails stopword presence")
    assert(!out(6L)._5, s"repeated 2-gram doc fails repetition, got ${out(6L)}")
    // every failing doc fails the conjunction
    Seq(2L, 3L, 4L, 5L, 6L).foreach(id => assert(!out(id)._6))
  }

  test("curateCorpus: each stage bites — dedup, gopher gate, quota, split") {
    // a long fluent base that passes every gopher rule
    def fluent(i: Long) =
      s"the quick brown fox $i jumps over the lazy dog and then runs to " +
        "the river bank where it rests in the shade of an old tree while " +
        "birds sing in the branches above and the water flows past stones"
    val docs = Seq(
      (1L, fluent(1), "en"),
      // case + whitespace variant of doc 1 → normalized dedup drops it
      (2L, fluent(1).toUpperCase.replace(" JUMPS", "   JUMPS") + "  ", "en"),
      (3L, "short text only", "en"),                 // gopher: too few words
      (4L, fluent(4), "en"),
      (5L, fluent(5), "de")
    ).toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")))
    val out = Curation.curateCorpus(docs, "doc_id", "text",
        groupCol = "lang", priorityCol = "n_chars",
        tokenBudgetPerGroup = 10000L, minWords = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getString(3))).toMap
    assert(!out.contains(2L), "whitespace variant must dedup away")
    assert(!out.contains(3L), "short doc must fail the gopher gate")
    assert(Set(1L, 4L, 5L).subsetOf(out.keySet), s"survivors wrong: ${out.keySet}")
    assert(out(5L)._1 == "de" && out(1L)._2 > 0)
    assert(out.values.forall(v => v._3 == "train" || v._3 == "val"))
    // a tight budget caps the en stratum to its highest-priority doc
    val capped = Curation.curateCorpus(docs, "doc_id", "text",
        groupCol = "lang", priorityCol = "n_chars",
        tokenBudgetPerGroup = 5L, minWords = 10)
      .collect().map(_.getLong(0)).toSet
    assert(capped.intersect(Set(1L, 4L)).size == 1,
      s"budget 5 admits exactly one en doc (started before overflow): $capped")
    assert(capped.contains(5L), "de stratum has its own budget")
  }

  test("curateCorpus stages survivors once: raw corpus read exactly twice") {
    def fluent(i: Long) =
      s"the quick brown fox $i jumps over the lazy dog and then runs to " +
        "the river bank where it rests in the shade of an old tree"
    val acc = spark.sparkContext.longAccumulator("raw_reads")
    val n = 40
    val rdd = spark.sparkContext
      .parallelize((1 to n).map(i =>
        (i.toLong, fluent(i), if (i % 2 == 0) "en" else "de")), 4)
      .map { r => acc.add(1); r }
    val docs = rdd.toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")))
    val (out, release) = Curation.curateCorpusReleasable(docs, "doc_id", "text",
      groupCol = "lang", priorityCol = "n_chars",
      tokenBudgetPerGroup = 100000L, minWords = 10)
    assert(out.count() == n)
    // dedup hash + semi-join probe read the raw corpus; the quota's
    // three scans (group stats, running sum, bucket totals) must hit
    // the skinny cache, never re-run the quality gate over raw text
    assert(acc.value == 2L * n,
      s"raw corpus must be scanned exactly twice, got ${acc.value} row-reads for $n rows")
    release()
  }
}
