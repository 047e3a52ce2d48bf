package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Scale probe: replicate the sf0.1 tables ~16× with key remapping (so
  * group/join cardinalities scale too, not just row counts) and time the
  * headline operators. A plan that survives 100 TB should scale roughly
  * linearly here; anything super-linear is a design smell to fix NOW.
  *
  * Run: `sbt "Test/runMain graft.ScaleProbe"`.
  */
object ScaleProbe {
  private val Mult = 16

  private def amplify(df: DataFrame, keyCols: Seq[String], offset: Long): DataFrame = {
    // cross with range(Mult), shifting each replica's keys into its own id
    // space so joins/groups see Mult× distinct keys, not Mult× duplicates
    val withRep = df.crossJoin(spark.range(Mult).select(col("id").as("_rep")))
    keyCols.foldLeft(withRep)((d, k) =>
        d.withColumn(k, col(k) + col("_rep") * offset)).drop("_rep")
      // the sf0.1 files are single-split; a 100 TB source arrives in
      // thousands of splits — spread replicas or everything runs 1-core
      .repartition(Runtime.getRuntime.availableProcessors())
  }

  private var spark: SparkSession = _

  def main(args: Array[String]): Unit = {
    spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def time(name: String, sf01Secs: Double)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name%-22s ${Mult}x=${t}%6.2f s   1x=${sf01Secs}%5.2f s   ratio=${t / sf01Secs}%5.1f (linear=$Mult)")
    }

    val li = amplify(Tables.lineitem(spark, d), Seq("l_orderkey"), 10_000_000L)
    val ord = amplify(Tables.orders(spark, d), Seq("o_orderkey", "o_custkey"), 10_000_000L)
    val ev = amplify(Tables.events(spark, d), Seq("event_id", "user_id"), 10_000_000L)
    val docs = amplify(Tables.documents(spark, d), Seq("doc_id"), 10_000_000L)

    time("pricing_summary", 2.11) { Analytics.pricingSummary(li) }
    time("star_join", 1.14) {
      Analytics.starJoin(Tables.lineitem(spark, d).crossJoin(
          spark.range(Mult).select((col("id") * 0).as("_z"))).drop("_z"),
        Tables.part(spark, d), Tables.supplier(spark, d), Tables.nation(spark, d))
    }
    time("sessionize", 1.0) { Analytics.sessionize(ev, 30) }
    time("minhash_buckets", 0.38) { Dedup.minhashBandBuckets(docs, "doc_id", "text") }
    time("dedup_keepfirst", 0.51) {
      Cleaning.dedupKeepFirst(ev, Seq("user_id", "event_type"), "event_id")
    }
    time("validate_rules", 0.22) {
      Validation.validate(li, Seq(
        Validation.rangeCheck("l_quantity", Some(1d), Some(50d), "error"),
        Validation.rangeCheck("l_discount", Some(0d), Some(0.05), "warning"),
        Validation.businessRule("tax_le_discount", col("l_tax") <= col("l_discount"))))
    }
    // LSH pair extraction must scale with Σ bucket², not (16n)²: replicas
    // get a SMALL per-component deterministic perturbation (sin of
    // component×replica) so directions stay as diverse as the originals —
    // a constant shift would make every high-replica vector near-parallel
    // and plant a genuinely quadratic answer
    val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      .crossJoin(spark.range(Mult).select(col("id").as("_rep")))
      .select((col("vec_id") + col("_rep") * 10_000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + (sin((i + 1).cast("double") * (col("_rep") + 1) * 0.7) * 0.2).cast("float"))
          .as("embedding"))
      .repartition(Runtime.getRuntime.availableProcessors())
    time("lsh_neardup_pairs", 0.39) {
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding", dim = 64,
        numPlanes = 12, threshold = 0.9, numTables = 4)
    }
    // text/curation scans: the per-row constant IS the cost model here —
    // if these are linear, the 100 TB scan is too (1× figures: TimeOne
    // on the registry query shapes, quiet JVM)
    time("lang_id", 0.45) { TextAnalysis.langIdFrame(docs, "text") }
    time("text_repetition", 0.40) { Curation.repetitionSignals(docs, "text") }
    time("redact_pii", 0.65) {
      docs.select(col("doc_id"), Curation.redactPII(col("text")).as("t"))
    }
    time("embed_quantize", 0.25) {
      emb.select(col("vec_id"), call_function("quantize_i8", col("embedding")).as("qz"))
    }
    // temporal joins: one shuffle each — the as-of window and the
    // (key, bin) hash join must both scale with rows, not pairs
    val ordDedup = ord.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    time("asof_join", 0.80) {
      Temporal.asofJoin(ev.select(col("event_id"), col("user_id"), col("ts")),
        ordDedup, Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
    }
    time("range_join", 0.44) {
      val wins = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          (col("ts") - expr("INTERVAL 1 HOUR")).as("win_lo"), col("ts").as("win_hi"))
      Temporal.rangeJoin(ev.select(col("user_id"), col("event_id"), col("ts")), wins,
        Seq("user_id"), Seq("p_user"), "ts", "win_lo", "win_hi", binWidthSec = 3600L)
    }
    // incremental dedup: per-batch cost must track the BATCH, with the
    // corpus entering only through the fingerprint/signature join
    time("dedup_incremental", 0.54) {
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)
      Dedup.dedupAgainstCorpus(batch, Dedup.contentFingerprints(corpus, "text"),
        "doc_id", "text")
    }
    // token quota: the hierarchical running sum must scale with rows even
    // though there are only 5 language strata — the (group, bucket) window
    // is the whole point (a per-stratum window would be single-task here)
    time("cap_tokens", 0.35) {
      val counted = docs.withColumn("n_tokens",
        TextAnalysis.tokenCount(col("text")).cast("long"))
      Curation.capTokensPerGroup(counted, "lang", "n_tokens",
        budget = 30000L, priorityCol = "n_chars", idCol = "doc_id")
    }
    // decontamination: broadcast shingle probe + broadcast anti join — the
    // corpus side must stay exchange-free, so cost tracks the scan
    time("decontaminate", 0.40) {
      val bench = Tables.documents(spark, d).filter(pmod(col("doc_id"), lit(10)) === 0)
      Dedup.decontaminate(docs, bench, "doc_id", "text", k = 3)
    }
    // SCD2: one keyed window pass over the change stream
    time("scd2_merge", 0.89) {
      val changes = ord.groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("priority"))
        .select(col("o_custkey").as("custkey"), col("priority"),
          col("o_orderdate").as("effective_from"))
      val dim = changes.withColumn("effective_to",
        lit(null).cast(changes.schema("effective_from").dataType))
      graft.sinks.DataSink.scd2Merge(dim.filter(lit(false)), changes, Seq("custkey"))
    }
    spark.stop()
  }
}
