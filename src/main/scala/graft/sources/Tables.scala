package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the star-schema tables (one parquet file per table).
  *
  * Mirrors the reference's table registry (`src/extract/csv_loader.py:44`
  * OLIST_FILES) but over columnar parquet: every reader goes through
  * `spark.read.parquet` so Catalyst gets pushdown + pruning for free.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `ts` is TIMESTAMP(NANOS) in the parquet; with nanosAsLong the scan
    * yields long nanos, converted here to a µs timestamp (floor division —
    * matching DuckDB's ns→µs truncation on the oracle side).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` works on the dir.
    * Goes through the typed accessors, not raw `load`, so views carry the
    * same normalizations — in particular `events.ts` is a timestamp, not
    * the raw long nanos the nanosAsLong scan yields.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach { n =>
      val df = n match {
        case "events" => events(spark, dir)
        case other    => load(spark, dir, other)
      }
      df.createOrReplaceTempView(n)
    }
}
