package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

import graft.sinks.TableLog
import graft.sources.{GraftSql, GraftTableRelation}

/** Resolves `` graft.`/path` `` table references in plain SQL — and
  * SQL time travel over graft targets — as one analyzer rule:
  *
  * {{{
  *   SELECT * FROM graft.`/warehouse/orders`
  *   SELECT * FROM t VERSION AS OF 3
  *   SELECT * FROM graft.`/warehouse/orders` TIMESTAMP AS OF '2026-01-01 12:00:00'
  *   INSERT INTO graft.`/warehouse/orders` SELECT …
  * }}}
  *
  * Spark's parser already produces both shapes ([[UnresolvedRelation]]
  * with a two-part `graft.`-qualified identifier; [[RelationTimeTravel]]
  * for the temporal clause) but implements neither for a V1 source:
  * `ResolveSQLOnFile` only handles `FileFormat` providers, and time
  * travel only v2 catalogs. This rule substitutes the graft relation —
  * unpinned for a plain reference, pinned for `VERSION AS OF`, and
  * resolved through [[TableLog.versionAtTimestamp]] (the same
  * at-or-before rule as the reader option, O(log history)) for
  * `TIMESTAMP AS OF`. Time travel also works on `USING graft` temp-view
  * names. Injected into the HINT-resolution batch, which runs BEFORE
  * the main resolution batch — `ResolveSQLOnFile` would otherwise grab
  * the identifier first and refuse it.
  *
  * The `` graft.`x` `` form claims only identifiers whose second part
  * LOOKS like a path (contains `/`) — `graft.orders` stays a catalog
  * reference for Spark to resolve. Non-graft targets pass through
  * untouched and fail with Spark's own errors. The timestamp operand
  * must FOLD at analysis — time travel to a per-row timestamp is not a
  * meaning this syntax has anywhere.
  */
case class GraftSqlResolution(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
      graftDir(u, viaCatalog = true) match {
        case None => tt
        case Some(dir) =>
          val v = ver match {
            case Some(s) => s.toLongOption.getOrElse(throw new IllegalArgumentException(
              s"graft time travel: VERSION AS OF needs an integer version, got '$s'"))
            case None =>
              TableLog.versionAtTimestamp(session, dir, millisOf(ts.get))
          }
          relation(dir, v)
      }
    case u: UnresolvedRelation if !u.isStreaming &&
        u.multipartIdentifier.length >= 3 =>
      // PERSISTENT VIEW expansion: a `cat.ns.v` reference whose catalog
      // is a GraftCatalog and whose name is a stored view substitutes
      // its defining SQL (parsed fresh — definition fixed, data live;
      // nested views expand recursively with cycle detection). A
      // matching TABLE name keeps Spark's own V2 resolution (we never
      // intercept real tables), and non-graft catalogs pass through.
      expandView(u.multipartIdentifier, Set.empty).getOrElse(u)
    case u: UnresolvedRelation if !u.isStreaming =>
      // plain path reference: only the explicit graft.`/path` form —
      // view names resolve through the catalog as before. A STREAMING
      // reference stays untouched: silently substituting a batch
      // relation into a stream would be wrong twice over (use
      // spark.readStream.format("graft") for that)
      graftDir(u, viaCatalog = false).map(relation(_, -1L)).getOrElse(u)
  }

  private def expandView(parts: Seq[String],
                         expanding: Set[Seq[String]]): Option[LogicalPlan] = {
    if (parts.length < 3) return None
    require(!expanding.contains(parts),
      s"graft views: recursive view definition through ${parts.mkString(".")}")
    val sqlOpt = org.apache.spark.sql.graftshim.GraftPlanShim
      .catalogPlugin(session, parts.head) match {
      case Some(g: graft.sources.GraftCatalog) =>
        g.viewSql(parts.tail.init, parts.last)
      case _ => None
    }
    sqlOpt.map { sql =>
      val parsed = session.sessionState.sqlParser.parsePlan(sql)
      // nested view references expand eagerly under the cycle guard —
      // leaving them for the analyzer's next fixed-point pass would
      // turn a definition cycle into a max-iterations failure instead
      // of this named error
      val expanded = parsed.transformUp {
        case n: UnresolvedRelation if !n.isStreaming &&
            n.multipartIdentifier.length >= 3 =>
          expandView(n.multipartIdentifier, expanding + parts).getOrElse(n)
      }
      org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(
        parts.last, expanded)
    }
  }

  private def relation(dir: String, version: Long): LogicalPlan =
    session.baseRelationToDataFrame(
      new GraftTableRelation(session.sqlContext, dir, version))
      .queryExecution.logical

  /** The table directory IF the target is a graft table: the
    * `` graft.`/path` `` form directly (second part must look like a
    * path); a single-part name through the catalog when asked
    * (`viaCatalog` — used for time travel over views) and it resolves
    * to an unpinned graft view. Anything else is None.
    */
  private def graftDir(u: UnresolvedRelation, viaCatalog: Boolean): Option[String] =
    u.multipartIdentifier match {
      case Seq(g, path) if g.equalsIgnoreCase("graft") && path.contains("/") =>
        Some(path)
      case Seq(name) if viaCatalog =>
        scala.util.Try(GraftSql.resolveViewDir(session, name)).toOption
      case _ => None
    }

  private def millisOf(e: Expression): Long = {
    val cast = Cast(e, TimestampType,
      Some(session.sessionState.conf.sessionLocalTimeZone))
    require(cast.foldable,
      s"graft time travel: TIMESTAMP AS OF must be a constant, got ${e.sql}")
    val micros = cast.eval(null)
    require(micros != null,
      s"graft time travel: TIMESTAMP AS OF '${e.sql}' did not parse as a timestamp")
    // floorDiv, not truncating `/`: a pre-1970 instant's micros are
    // negative and truncation rounds TOWARD zero — shifting the
    // AS OF boundary 1ms late; floor keeps at-or-before semantics
    // exact on both sides of the epoch
    Math.floorDiv(micros.asInstanceOf[Long], 1000L)
  }
}
