package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV ingestion — Spark-native rethink of the reference's chunked pandas
  * loader (`/root/reference/src/extract/csv_loader.py:64` load_csv).
  *
  * The reference streams a file in 10k-row chunks on one machine; here the
  * file (or directory of files) is split by Spark into `maxPartitionBytes`
  * tasks, so "chunking" is the execution model itself and scales with the
  * cluster. Extraction metadata (`csv_loader.py:100`: extracted_at,
  * source_file) becomes two metadata columns derived from
  * `input_file_name()` — per-partition constants, no extra pass.
  *
  * Malformed rows follow pandas' errors="coerce" spirit: PERMISSIVE mode
  * nulls out bad fields and captures the raw line in `_corrupt_record`
  * instead of failing the job (a 100 TB ingest WILL contain garbage rows;
  * dying on row 3 billion is not an option).
  */
object CsvSource {

  /** Read CSV with an explicit schema (never infer at scale — inference is
    * a full extra pass over the data), tolerant of corrupt rows.
    *
    * Implemented as `text` scan + `from_csv` rather than `spark.read.csv`
    * with a corrupt-record column: Spark refuses raw-CSV scans whose
    * pruned column set is ONLY `_corrupt_record`, which breaks innocent
    * queries like `quarantine(df)._1.count()`. Parsing in a projection
    * makes the corrupt column an ordinary computed column — prunable,
    * filterable, aggregatable. Line-delimited records assumed (embedded
    * newlines in quoted fields need the builder reader + persist).
    *
    * @param schema   explicit column types; a `_corrupt_record` string
    *                 column is appended automatically for bad-row capture.
    * @param tsFormat timestamp parse pattern for timestamp-typed columns.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true,
           tsFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else schema.add(CorruptCol, "string", nullable = true)
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol,
      "timestampFormat" -> tsFormat,
      "timestampNTZFormat" -> tsFormat)
    val lines = spark.read.text(path)
    // header detection tolerates per-field quoting, padding, and case —
    // real exports disagree on all three (exact string equality would pass
    // `"id", Name` through as a data row and null-parse it into noise).
    // CAVEAT: the filter strips EVERY matching line anywhere in the input
    // (the right call for multi-part exports, which repeat the header per
    // chunk) — so a data row whose field values coincide, case-insensitively,
    // with the column names is silently dropped. All-string schemas whose
    // data can echo the header need a stricter reader (header=false + an
    // explicit per-file first-line skip).
    val headerRegex = schema.fieldNames
      .map(n => "\\s*\"?" + java.util.regex.Pattern.quote(n) + "\"?\\s*")
      .mkString("(?i)^", ",", "$")
    // truly empty lines parse to clean all-null rows under from_csv
    // (corrupt stays NULL — verified: only whitespace-only lines get
    // flagged), so a blank separator line in a hand-edited or multi-part
    // export would fabricate a phantom null-keyed row; drop them the way
    // spark.read.csv does
    val nonEmpty = lines.filter(length(col("value")) > 0)
    val body = if (header) nonEmpty.filter(!col("value").rlike(headerRegex)) else nonEmpty
    body.select(from_csv(col("value"), withCorrupt, opts).as("_r"))
      .select(withCorrupt.fieldNames.map(n => col(s"_r.`$n`").as(n)): _*)
  }

  val CorruptCol = "_corrupt_record"

  /** Attach the reference's extraction metadata (`csv_loader.py:100`):
    * which physical file each row came from and when it was extracted.
    * `extractedAt` is caller-supplied so runs are reproducible/idempotent
    * (the reference stamps wall-clock time, which breaks re-runs).
    */
  def withIngestMetadata(df: DataFrame, extractedAt: java.sql.Timestamp): DataFrame =
    df.withColumn("source_file", input_file_name())
      .withColumn("extracted_at", lit(extractedAt))

  /** Split a tolerant read into (clean rows, quarantined rows) — the
    * scale-friendly version of the reference's skip-and-log. Both sides
    * come from the SAME scan (Spark caches nothing; two filters over one
    * cheap source). The bad side keeps ALL columns (parsed-null fields +
    * the raw line) — that context is what a quarantine table needs.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val bad = df.filter(col(CorruptCol).isNotNull)
    val good = df.filter(col(CorruptCol).isNull).drop(CorruptCol)
    (good, bad)
  }
}
