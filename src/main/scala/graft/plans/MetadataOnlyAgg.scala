package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

import graft.sinks.TableLog
import graft.sources.GraftTableRelation

/** Metadata-only aggregates over `USING graft` tables: a global
  * `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` whose answer the
  * transaction log already knows is rewritten into a [[LocalRelation]]
  * holding the precomputed row — ZERO scan tasks, zero data-file reads.
  * On a 100 TB table, `SELECT count(*) FROM t` becomes one manifest
  * parse (milliseconds) instead of a full-table scan; this is the
  * lakehouse answer to the reference's `SELECT COUNT(*)` run-log checks
  * (`db_loader.py` verification counts), kept exact by the commit
  * protocol: every manifest entry carries the file's footer-exact row
  * count, deletion-vector cardinality, per-column null counts and
  * min/max, so the aggregate folds over numbers the write already paid
  * for.
  *
  * The rule is EXACT-OR-SILENT — it only fires when the manifest can
  * reproduce the scan's answer bit-for-bit, otherwise the plan is left
  * alone and the ordinary scan runs:
  *
  *  - `COUNT(*)` / `COUNT(lit)`: Σ (rows − |dv|) — exact always, even
  *    with deletion vectors (the dv IS the manifest's own row set).
  *  - `COUNT(col)`: live rows − Σ nullCounts(col); needs a null count
  *    on EVERY live file and a dv-free table (whether a dv'd row was
  *    null is unknowable from metadata).
  *  - `MIN/MAX(col)`: fold of the per-file footer stats; needs a
  *    dv-free table (a deleted row may have carried the extreme), a
  *    range stat on every live file (a file with none qualifies only
  *    if its null count proves it all-NULL in the column), and a type
  *    whose manifest double is LOSSLESS: int/short/byte/date/float/
  *    double always; long/timestamp only while |v| < 2^53 (beyond the
  *    mantissa the widened stat stops round-tripping — 2^53+1 widens
  *    to 2^53, so the gate is strict). Decimals (value-space doubles)
  *    and strings (parquet writers may truncate binary stats into
  *    BOUNDS, `parquet.statistics.truncate.length`) never rewrite.
  *
  * All-or-nothing: every aggregate in the projection must be
  * metadata-answerable or none is rewritten (partial rewrites would
  * split one scan into two plans). DISTINCT, FILTER clauses, grouped
  * aggregates, and any Filter between the Aggregate and the relation
  * block the rewrite by construction — the pattern only matches a
  * global Aggregate sitting directly on the relation (or on a
  * column-pruning Project of it).
  *
  * Registered through `graft.GraftExtensions` (injectOptimizerRule), so
  * it fires for plain `spark.read.format("graft").load(dir).count()`
  * and for SQL over a `USING graft` view alike. Same pin semantics as
  * the relation: a `versionAsOf` table folds that version's manifest,
  * an unpinned one the latest at optimization time.
  */
object MetadataOnlyAgg extends Rule[LogicalPlan] {

  /** Strict exactness horizon for long-backed stats: doubles represent
    * every integer with |v| < 2^53; at exactly 2^53 the widened stat of
    * 2^53+1 collides with it, so the gate excludes the boundary.
    */
  private val ExactLongHorizon = (1L << 53).toDouble

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(groupingExprs, _, GraftChild(rel), _) if groupingExprs.isEmpty =>
      // a manifest that cannot be read here would fail the scan too —
      // fall back to the plan that surfaces the real error
      scala.util.Try(rewrite(agg, rel)).toOption.flatten.getOrElse(agg)
  }

  private object GraftChild {
    def unapply(p: LogicalPlan): Option[GraftTableRelation] = p match {
      case l: LogicalRelation => l.relation match {
        case r: GraftTableRelation => Some(r)
        case _ => None
      }
      // column pruning inserts an attribute-only Project; anything
      // computed in between disqualifies (the aggregate would no longer
      // be over raw table columns)
      case Project(ps, l: LogicalRelation)
          if ps.forall(_.isInstanceOf[AttributeReference]) =>
        l.relation match {
          case r: GraftTableRelation => Some(r)
          case _ => None
        }
      case _ => None
    }
  }

  private def rewrite(agg: Aggregate, rel: GraftTableRelation): Option[LogicalPlan] = {
    val spark = rel.sqlContext.sparkSession
    val entries = TableLog.liveFilesAt(spark, rel.dir, rel.version)
    val cm = TableLog.columnMappingAt(spark, rel.dir, rel.version)
    def phys(c: String): String = cm.getOrElse(c, c)
    val liveRows = entries.map(e => e.rows - e.dv.length).sum
    val dvFree = entries.forall(_.dv.isEmpty)

    def longExact(d: Double): Option[Any] =
      if (math.abs(d) < ExactLongHorizon) Some(d.toLong) else None

    // Some(Some(range)) = stat present; Some(None) = file provably
    // contributes no value (all-NULL in the column); None = unknown
    def fileRange(e: TableLog.AddFile, pc: String): Option[Option[(Double, Double)]] =
      e.stats.get(pc) match {
        case Some(TableLog.NumStat(mn, mx)) => Some(Some((mn, mx)))
        case Some(_) => None // string stats may be truncated bounds
        case None => e.nullCounts.get(pc) match {
          case Some(n) if n == e.rows => Some(None)
          case _ => None
        }
      }

    def extreme(name: String, isMin: Boolean): Option[Any] = {
      if (!dvFree) return None
      val dt = rel.schema.fields.find(_.name == name).map(_.dataType)
        .getOrElse(return None)
      val pc = phys(name)
      val ranges = entries.map(fileRange(_, pc))
      if (ranges.contains(None)) return None
      val vals = ranges.flatten.flatten.map(r => if (isMin) r._1 else r._2)
      if (vals.isEmpty) return Some(null) // zero non-null values ⇒ SQL NULL
      val v = if (isMin) vals.min else vals.max
      dt match {
        case IntegerType => Some(v.toInt)
        case DateType => Some(v.toInt)
        case ShortType => Some(v.toShort)
        case ByteType => Some(v.toByte)
        case FloatType => Some(v.toFloat)
        case DoubleType => Some(v)
        case LongType => longExact(v)
        case TimestampType | TimestampNTZType => longExact(v)
        case _ => None
      }
    }

    def evalOne(e: Expression): Option[Any] = e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(null, _))) => Some(0L)
          case Count(Seq(_: Literal)) => Some(liveRows)
          case Count(Seq(a: AttributeReference)) if dvFree =>
            val pc = phys(a.name)
            val counts = entries.map(_.nullCounts.get(pc))
            if (counts.contains(None)) None
            else Some(liveRows - counts.flatten.sum)
          case Min(a: AttributeReference) => extreme(a.name, isMin = true)
          case Max(a: AttributeReference) => extreme(a.name, isMin = false)
          case _ => None
        }
      case _ => None
    }

    val values = agg.aggregateExpressions.map {
      case Alias(child, _) => evalOne(child)
      case other => evalOne(other)
    }
    if (values.contains(None)) None
    else Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values.map(_.get)))))
  }
}
