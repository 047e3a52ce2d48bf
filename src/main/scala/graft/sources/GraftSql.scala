package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.{expr, lit}

import graft.sinks.TableLog

/** SQL DML over graft tables — `DELETE FROM`, `UPDATE … SET`, and
  * `MERGE INTO` as the SQL text a warehouse user already writes,
  * routed through the table log's transactional row-level operators:
  *
  * {{{
  *   GraftSql.exec(spark, "DELETE FROM events WHERE user_id = 42")
  *   GraftSql.exec(spark, "UPDATE events SET score = score + 1 WHERE day = '2026-01-01'")
  *   GraftSql.exec(spark, """MERGE INTO tgt t USING src s ON t.k = s.k
  *                           WHEN MATCHED THEN UPDATE SET *
  *                           WHEN NOT MATCHED THEN INSERT *
  *                           WHEN NOT MATCHED BY SOURCE THEN DELETE""")
  * }}}
  *
  * Architecture: Spark's OWN parser produces the statement plan
  * (`DeleteFromTable` / `UpdateTable` / `MergeIntoTable` — `spark.sql`
  * itself cannot execute them against a V1 relation, which is exactly
  * the gap this closes without a full DSv2 catalog), the target
  * resolves to its table directory through the `USING graft` temp view
  * (or the Delta-style `` graft.`/path` `` identifier), and the
  * condition/assignment expressions re-materialize as Columns from
  * their own SQL text — so every pruning path the method API has
  * (predicate-derived touch sets, null-count skips, bloom-pruned dv
  * deletes, key-box merges) fires identically from SQL. Semantics
  * beyond the method API's are REFUSED loudly rather than approximated
  * (conditional matched clauses, partial-column merge updates, schema
  * evolution): a DML statement that silently did something narrower
  * than it said would be worse than none.
  *
  * Targets pinned to a version (`versionAsOf`/`timestampAsOf` views)
  * refuse — DML applies to the live table only.
  */
object GraftSql {

  /** Execute one DML statement; returns the committed version. */
  def exec(spark: SparkSession, sql: String): Long =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case d: DeleteFromTable =>
        val dir = targetDir(spark, d.table)
        TableLog.deleteWhere(spark, dir,
          toColumn(d.condition, aliasesOf(d.table)))
      case u: UpdateTable =>
        val dir = targetDir(spark, u.table)
        val as = aliasesOf(u.table)
        val cond = u.condition.map(c => toColumn(c, as)).getOrElse(lit(true))
        val set = u.assignments.map(a =>
          setKeyName(a.key, as) -> toColumn(a.value, as)).toMap
        TableLog.updateWhere(spark, dir, cond, set)
      case m: MergeIntoTable =>
        execMerge(spark, m)
      case other => throw new IllegalArgumentException(
        s"GraftSql: only DELETE FROM / UPDATE / MERGE INTO are DML here — " +
          s"run '${other.nodeName}' through spark.sql (reads and INSERT " +
          "already work against USING graft views)")
    }

  private def execMerge(spark: SparkSession, m: MergeIntoTable): Long = {
    // `MERGE INTO … WITH SCHEMA EVOLUTION` (Spark's own grammar flag)
    // routes to the method API's evolveSchema: source-only columns
    // append to the table schema in the merge's commit
    val dir = targetDir(spark, m.targetTable)
    val source = GraftSqlShimAccess.ofRows(spark, m.sourceTable)
    val keys = equiKeys(m.mergeCondition,
      aliasesOf(m.targetTable) ++ aliasesOf(m.sourceTable))
    // matched arm: whole-row UPDATE SET * or DELETE, unconditioned —
    // the method API's semantics, refused beyond them
    val whenMatched = m.matchedActions match {
      case Seq(UpdateStarAction(None)) => "update"
      case Seq(DeleteAction(None)) => "delete"
      case Seq() => throw new IllegalArgumentException(
        "GraftSql MERGE: a WHEN MATCHED clause is required (UPDATE SET * or DELETE)")
      case other => throw new IllegalArgumentException(
        s"GraftSql MERGE: unsupported WHEN MATCHED shape $other — only an " +
          "unconditioned UPDATE SET * or DELETE maps onto the transactional merge")
    }
    val insertUnmatched = m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => true
      case Seq() => false
      case other => throw new IllegalArgumentException(
        s"GraftSql MERGE: unsupported WHEN NOT MATCHED shape $other — only an " +
          "unconditioned INSERT * maps onto the transactional merge")
    }
    val (nmbs, nmbsCond) = m.notMatchedBySourceActions match {
      case Seq(DeleteAction(cond)) =>
        ("delete", cond.map(c => toColumn(c, aliasesOf(m.targetTable))))
      case Seq() => ("none", None)
      case other => throw new IllegalArgumentException(
        s"GraftSql MERGE: unsupported WHEN NOT MATCHED BY SOURCE shape $other — " +
          "only DELETE (optionally conditioned) is supported")
    }
    TableLog.mergeInto(spark, dir, source.select(keys.map(k => source(k)) ++
        source.columns.filterNot(keys.contains).map(source(_)): _*),
      keys, whenMatched = whenMatched, insertUnmatched = insertUnmatched,
      whenNotMatchedBySource = nmbs, notMatchedBySourceCondition = nmbsCond,
      evolveSchema = m.withSchemaEvolution)
  }

  /** The merge keys: the ON clause must be a conjunction of
    * `t.col = s.col` equalities on the SAME column name — the shape
    * [[TableLog.mergeInto]]'s stats-pruned key-box plan exists for.
    * Anything else refuses (an inequality ON clause is a different
    * operator — the interval join family).
    */
  private def equiKeys(cond: Expression, aliases: Set[String]): Seq[String] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val keys = split(cond).map {
      case EqualTo(l, r) =>
        val (a, b) = (plainName(l, aliases), plainName(r, aliases))
        require(a.nonEmpty && a == b,
          s"GraftSql MERGE: ON equality must join the SAME top-level column " +
            s"on both sides (got ${l.sql} = ${r.sql}) — rename the source " +
            "column first; struct fields cannot be merge keys")
        a.get
      case other => throw new IllegalArgumentException(
        s"GraftSql MERGE: ON clause must be a conjunction of equalities, " +
          s"got '${other.sql}' — non-equi matching belongs to the interval-join family")
    }
    require(keys.nonEmpty, "GraftSql MERGE: empty ON clause")
    keys.distinct
  }

  /** Re-materialize a parsed condition/assignment expression as a
    * Column applicable to the TARGET frame: target-alias qualifiers
    * strip (the frame has no alias to resolve `t.k` against), then the
    * expression round-trips through its own SQL text — everything
    * stays public API, and the re-parse resolves against the actual
    * table schema like any user-written `expr(...)`.
    */
  private def toColumn(e: Expression, aliases: Set[String]): Column = {
    val stripped = e.transform {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        if a.nameParts.length > 1 &&
          aliases.contains(a.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(a.nameParts.tail)
    }
    expr(stripped.sql)
  }

  /** The names a condition may qualify target columns with: the view/
    * table identifier's parts plus any `AS alias`.
    */
  private def aliasesOf(table: LogicalPlan): Set[String] = {
    def walk(p: LogicalPlan): Seq[String] = p match {
      case SubqueryAlias(id, child) => id.name +: walk(child)
      case u: UnresolvedRelation => u.multipartIdentifier.lastOption.toSeq
      case _ => Nil
    }
    walk(table).map(_.toLowerCase(java.util.Locale.ROOT)).toSet
  }

  /** The reference's name as a TOP-LEVEL column: an optional leading
    * target/source alias strips, and exactly one part must remain. A
    * multi-part residue (`meta.field`) is a struct-field reference —
    * REFUSED rather than silently collapsed to its last part, which
    * would misapply the statement to a same-named top-level column.
    */
  private def plainName(e: Expression, aliases: Set[String]): Option[String] =
    e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        val parts =
          if (a.nameParts.length > 1 &&
              aliases.contains(a.nameParts.head.toLowerCase(java.util.Locale.ROOT)))
            a.nameParts.tail
          else a.nameParts
        if (parts.length == 1) Some(parts.head) else None
      case _ => None
    }

  private def attrName(e: Expression, what: String, aliases: Set[String]): String =
    plainName(e, aliases).getOrElse(throw new IllegalArgumentException(
      s"GraftSql: $what must be a plain top-level column reference, got " +
        s"${e.sql} — struct-field assignment is not supported"))

  /** An UPDATE SET target: a top-level column OR a struct-field path
    * (`payload.kind` → the dotted key [[TableLog.updateWhere]] rebuilds
    * through withField). After the leading target alias strips, any
    * remaining multi-part name IS a struct path — exactly one relation
    * is in scope in UPDATE.
    */
  private def setKeyName(e: Expression, aliases: Set[String]): String =
    e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        val parts =
          if (a.nameParts.length > 1 &&
              aliases.contains(a.nameParts.head.toLowerCase(java.util.Locale.ROOT)))
            a.nameParts.tail
          else a.nameParts
        parts.mkString(".")
      case other => throw new IllegalArgumentException(
        s"GraftSql: UPDATE SET column must be a column or struct-field " +
          s"reference, got ${other.sql}")
    }

  /** Resolve a DML target to its table directory: a temp view created
    * with `USING graft` (looked up through the session catalog, so any
    * view wrapper unwraps), or the path-identifier form
    * `` graft.`/path/to/table` ``.
    */
  private def targetDir(spark: SparkSession, table: LogicalPlan): String =
    table match {
      case SubqueryAlias(_, child) => targetDir(spark, child)
      case u: UnresolvedRelation =>
        val parts = u.multipartIdentifier
        if (parts.length == 2 && parts.head.equalsIgnoreCase("graft")) parts(1)
        else if (parts.length == 1) relationOf(spark, parts.head)
        else {
          // catalog-qualified target (`gcat.ns.t`) — the persistent
          // catalog's tables take UPDATE/MERGE through this front too
          org.apache.spark.sql.graftshim.GraftPlanShim
            .catalogPlugin(spark, parts.head) match {
            case Some(g: GraftCatalog) =>
              val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
                parts.tail.init.toArray, parts.last)
              require(g.tableExists(ident),
                s"GraftSql: table ${parts.mkString(".")} does not exist")
              g.tableDirOf(ident)
            case _ => throw new IllegalArgumentException(
              s"GraftSql: cannot resolve target ${parts.mkString(".")} — use a " +
                "USING graft temp view name, graft.`/path`, or a graft-catalog name")
          }
        }
      case other => throw new IllegalArgumentException(
        s"GraftSql: DML target must be a table reference, got ${other.nodeName}")
    }

  /** Resolve a temp-view name to its unpinned graft table directory —
    * shared by the DML front and the SQL maintenance commands
    * ([[GraftSqlParser]]).
    */
  private[graft] def resolveViewDir(spark: SparkSession, name: String): String =
    relationOf(spark, name)

  private def relationOf(spark: SparkSession, name: String): String = {
    // catalog-qualified names (`gcat.ns.t`) resolve through the V2
    // catalog directly — UPDATE/MERGE by name without any view plumbing
    val parts = scala.util.Try(
      spark.sessionState.sqlParser.parseMultipartIdentifier(name))
      .getOrElse(Seq(name))
    if (parts.length >= 2) {
      org.apache.spark.sql.graftshim.GraftPlanShim
        .catalogPlugin(spark, parts.head) match {
        case Some(g: GraftCatalog) =>
          val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.tail.init.toArray, parts.last)
          require(g.tableExists(ident),
            s"GraftSql: table $name does not exist in catalog ${parts.head}")
          return g.tableDirOf(ident)
        case _ =>
      }
    }
    val analyzed = spark.table(name).queryExecution.analyzed
    val rel = analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
        if lr.relation.isInstanceOf[GraftTableRelation] =>
        lr.relation.asInstanceOf[GraftTableRelation]
    }
    require(rel.nonEmpty,
      s"GraftSql: '$name' does not resolve to a graft table " +
        "(CREATE TEMPORARY VIEW name USING graft OPTIONS (path '…'))")
    require(rel.head.version == -1L,
      s"GraftSql: '$name' is pinned to version ${rel.head.version} — DML " +
        "applies to the live table; use an unpinned view")
    rel.head.dir
  }
}

/** Indirection so GraftSql (in graft.sources) reaches the
  * `org.apache.spark.sql`-private `Dataset.ofRows` through the
  * documented shim package.
  */
private[sources] object GraftSqlShimAccess {
  def ofRows(spark: SparkSession,
             plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.graftshim.GraftPlanShim.ofRows(spark, plan)
}
