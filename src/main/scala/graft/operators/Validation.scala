package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation — Spark-native rethink of the reference's
  * `DataValidator` (`/root/reference/src/transform/validators.py`).
  *
  * The reference runs each check as its own pandas pass; here ALL row-level
  * rules for a table compile into ONE aggregate (single scan, partial aggs
  * map-side), and the report is itself a DataFrame so it can be persisted,
  * joined, or alerted on downstream. At 100 TB one scan vs. k scans is the
  * whole ballgame.
  */
object Validation {

  /** severity mirrors validators.py:27 ValidationSeverity; `threshold` is
    * the rule's own max allowed violation fraction (a `thresholds` map
    * entry in [[validate]] still overrides it).
    */
  final case class Rule(name: String, severity: String, violation: Column,
                        threshold: Double = 0.0)

  /** Null-fraction threshold check (validators.py:116 add_null_check).
    * `maxNullPct` rides ON the rule — callers are not required to
    * duplicate it into `validate`'s thresholds map.
    */
  def nullCheck(column: String, maxNullPct: Double, severity: String = "error"): Rule =
    Rule(s"null_check_$column", severity, col(column).isNull, maxNullPct)

  /** Range check (validators.py:233 add_range_check). */
  def rangeCheck(column: String, min: Option[Double], max: Option[Double],
                 severity: String = "warning"): Rule = {
    val c = col(column)
    val lo = min.map(c < _).getOrElse(lit(false))
    val hi = max.map(c > _).getOrElse(lit(false))
    Rule(s"range_check_$column", severity, lo || hi)
  }

  /** Custom business rule; `valid` is the row-level validity predicate
    * (validators.py:296 add_business_rule).
    */
  def businessRule(name: String, valid: Column, severity: String = "warning"): Rule =
    Rule(s"business_rule_$name", severity, !coalesce(valid, lit(false)))

  /** One-pass report: (rule, severity, row_count, violations, violation_pct,
    * passed). Thresholded rules pass `passed` expressions via `thresholds`
    * (rule name → max allowed violation fraction, default 0).
    */
  def validate(df: DataFrame, rules: Seq[Rule],
               thresholds: Map[String, Double] = Map.empty): DataFrame = {
    // aggregates carry positional aliases and rule names travel as lit()s —
    // never spliced into SQL text — so a rule named `x', 'y` (or one that
    // collides with a column) cannot inject into or break the plan
    val aggs = count(lit(1)).as("row_count") +:
      rules.zipWithIndex.map { case (r, i) =>
        // coalesce: sum over an EMPTY frame is null, and a null violation
        // count would read as passed=false — an empty extract (a legal
        // incremental run) must not trip every gate
        coalesce(sum(when(r.violation, 1L).otherwise(0L)), lit(0L)).as(s"_v$i")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), lit(r.severity).as("severity"),
        col(s"_v$i").as("violations"),
        lit(thresholds.getOrElse(r.name, r.threshold)).as("threshold"))
    }: _*)
    wide.select(col("row_count"), explode(entries).as("e"))
      .select(col("e.rule").as("rule"), col("e.severity").as("severity"),
        col("row_count"), col("e.violations").as("violations"),
        round(col("e.violations") / greatest(col("row_count"), lit(1L)), 4).as("violation_pct"),
        // decimal, not double, for the pass boundary: 0.29 * 100 in double
        // is 28.999…96, so exactly-at-threshold rules would spuriously
        // FAIL (and gate-abort a pipeline); double→decimal cast goes via
        // the shortest decimal rendering, making the product exact
        (col("e.violations") <=
          col("e.threshold").cast("decimal(18,10)") * col("row_count")).as("passed"))
  }

  /** Uniqueness check (validators.py:180 add_unique_check) — needs its own
    * shuffle on the key, so it is not folded into the single-pass report.
    * Returns (rule, duplicate_keys, duplicate_rows, passed).
    */
  def uniqueCheck(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*).agg(count(lit(1)).as("cnt"))
      .agg( // coalesce: empty input has zero groups → null sums → a
            // legitimately-empty table would read as FAILING uniqueness
        coalesce(sum(when(col("cnt") > 1, 1L).otherwise(0L)), lit(0L)).as("duplicate_keys"),
        coalesce(sum(when(col("cnt") > 1, col("cnt") - 1).otherwise(0L)), lit(0L)).as("duplicate_rows"))
      .select(
        lit(s"unique_check_${keys.mkString(",")}").as("rule"),
        col("duplicate_keys"), col("duplicate_rows"),
        (col("duplicate_rows") === 0L).as("passed"))

  /** Schema check (validators.py:160) — schema is driver-side metadata in
    * Spark, no job needed. Returns mismatch descriptions, empty = pass.
    */
  def schemaCheck(df: DataFrame, expected: Map[String, String]): Seq[String] = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    expected.flatMap { case (name, dt) =>
      actual.get(name) match {
        case None          => Some(s"Missing column: $name")
        case Some(`dt`)    => None
        case Some(other)   => Some(s"$name: expected $dt, got $other")
      }
    }.toSeq
  }
}
