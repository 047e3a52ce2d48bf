package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input spreading (optimization guide §2.5, "input skew":
  * one huge unsplittable file → "repartition immediately after the read").
  *
  * A compute-heavy operator fed by an unsplittable or single-split source —
  * one gzip file, a single-row-group parquet, a small bounded validation
  * slice — runs its entire per-row stage on ONE core no matter how many the
  * session has: Spark's scan splits are byte ranges, and a row group lands
  * whole in whichever split holds its midpoint. Every base table in the
  * bench corpus is exactly this shape (one row group per file), so minhash
  * signatures, shingling, tokenization, decimal aggregates and curve
  * kernels all serialize on task 0 while 31 cores idle.
  *
  * [[Spread.compute]] hash-repartitions such inputs to the session's
  * default parallelism — but ONLY when the optimizer's size estimate says
  * the input is small (default ≤ 16 MB per core, `graft.spread.*` confs)
  * AND the plan has no upstream Aggregate/Window/Repartition (mid-pipeline
  * rows already arrived via a shuffle; re-spreading them is pure overhead).
  * A large input already scans as many splits as it has row groups, and
  * shuffling it to "help" would move terabytes for nothing — the guards
  * make this a NO-OP at cluster scale, so operators call it
  * unconditionally and stay safe at 100 TB. This is deliberately not a
  * fixed `repartition(32)`: parallelism comes from the session
  * (`SPARK_GRAFT_CPUS` contract) and the byte threshold is a conf.
  *
  * Correctness: prefer the KEYED form (hash partitioning on a natural
  * high-cardinality key is deterministic per row, retry-safe, and skips
  * round-robin's `sortBeforeRepartition` local sort); every caller is
  * row-order-independent — aggregates, keyed joins, windows with explicit
  * partitioning, decimal (exact) sums — so results are identical.
  * Streaming plans pass through untouched (no stats, and micro-batches are
  * already split by the source).
  */
object Spread {
  val EnabledKey = "graft.spread.enabled"
  val MaxBytesPerCoreKey = "graft.spread.maxBytesPerCore"
  private val DefaultMaxBytesPerCore = 16L * 1024 * 1024

  /** Keyless form: round-robin. Prefer [[compute(df,by*)]] with a natural
    * key — round-robin pays a per-partition local sort of its input
    * (`sortBeforeRepartition`, kept ON for retry determinism) that a
    * deterministic hash key avoids entirely.
    */
  def compute(df: DataFrame): DataFrame =
    ifSmall(df)(_.repartition(parallelism(df)))

  /** Keyed form: hash-repartition on `by` — deterministic per row (no
    * sort needed, safe under retry by construction) and cheaper than
    * round-robin. `by` should be high-cardinality (a row id, a content
    * hash) so the hash spreads evenly.
    */
  def compute(df: DataFrame, by: org.apache.spark.sql.Column*): DataFrame =
    ifSmall(df)(_.repartition(parallelism(df), by: _*))

  private def parallelism(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  private def ifSmall(df: DataFrame)(f: DataFrame => DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    if (!spark.conf.get(EnabledKey, "true").toBoolean) return df
    if (parallelism(df) <= 1) return df
    val perCore = spark.conf.get(MaxBytesPerCoreKey,
      DefaultMaxBytesPerCore.toString).toLong
    // optimizedPlan.stats is a driver-side estimate (file sizes × filter
    // selectivity) — no job runs here
    val plan = df.queryExecution.optimizedPlan
    // MID-PIPELINE inputs are already distributed: an upstream aggregate,
    // window or explicit repartition means the rows arrive via a shuffle
    // whose AQE-coalesced width matches their size — another exchange
    // here is pure overhead (measured +0.4 s on the e2e curation chain,
    // where every stage's operator would otherwise re-spread). The
    // single-task hazard this helper exists for is raw unsplittable
    // SCANS (optionally filtered/projected/unioned), which contain none
    // of these nodes.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, RepartitionOperation, Window => WindowOp}
    val redistributed = plan.exists {
      case _: Aggregate | _: WindowOp | _: RepartitionOperation => true
      case _ => false
    }
    if (redistributed) return df
    val est = plan.stats.sizeInBytes
    if (est > BigInt(parallelism(df)) * perCore) df else f(df)
  }
}
