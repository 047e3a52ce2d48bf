package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.sinks.TableLog

/** SQL MAINTENANCE STATEMENTS — the Delta-shaped upkeep surface as real
  * `spark.sql` text, via a delegating parser (`injectParser`, the same
  * out-of-tree mechanism Delta's own SQL uses):
  *
  * {{{
  *   VACUUM t [RETAIN 5 VERSIONS] [DRY RUN]
  *   OPTIMIZE t [WHERE <predicate>] [ZORDER BY (x, y)]
  *   DESCRIBE HISTORY t
  *   DESCRIBE DETAIL t
  *   RESTORE [TABLE] t [TO] VERSION AS OF n
  *   CONVERT TO GRAFT parquet.`/path/to/lake`
  *   COPY INTO t FROM '/staged' FILEFORMAT = PARQUET
  *   SHOW GRAFT TABLES IN '/warehouse/root'
  *   CREATE [OR REPLACE] VIEW cat.ns.v AS SELECT …   -- graft-catalog views
  *   DROP VIEW [IF EXISTS] cat.ns.v
  *   SHOW GRAFT VIEWS IN cat[.ns]
  *   ALTER TABLE t ADD CONSTRAINT nn CHECK (expr)
  *   ALTER TABLE t DROP CONSTRAINT nn
  * }}}
  *
  * where `t` is a `USING graft` temp-view name, the path form
  * `` graft.`/path` ``, or a graft-catalog name. Anything that does not
  * match one of these THIRTEEN statements delegates VERBATIM to Spark's
  * parser — this class adds grammar, it never changes any. The view
  * statements intercept only ≥3-part dotted names and fall back to
  * Spark's own parser at run time when the leading part is not a graft
  * catalog (`spark_catalog.default.v` stays Spark's). Each statement plans as a
  * `LeafRunnableCommand` whose `run` calls the method API, so the SQL
  * path and the method path are one implementation: VACUUM honors the
  * same retention floor and dry-run report, OPTIMIZE commits pinned and
  * loses races loudly, CONVERT adopts in place with the same refusals.
  *
  * Two deliberate grabs: `DESCRIBE HISTORY <name>` is claimed as the
  * audit statement (Delta's), and `DESCRIBE DETAIL <name>` as the
  * summary statement — vanilla Spark would read each as "describe
  * column history/detail of table <name>", a collision only for
  * columns literally named `history` or `detail`, which this trade
  * accepts (Delta makes the identical ones).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  // last-wins fallback for parsers constructed OUTSIDE injectParser
  // (tests wiring the interceptor directly); the per-session registry
  // in the companion is the primary lookup
  GraftSqlParser.vanillaDelegate = new java.lang.ref.WeakReference(delegate)
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenancePlan(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
}

object GraftSqlParser {

  /** PER-SESSION delegate registry (weak keys — a retired session must
    * not pin its parser chain): the view commands' vanilla fallback
    * re-parses through the EXECUTING session's own chain, so two
    * concurrent sessions with different extension sets never cross
    * wires. `vanillaDelegate` is the last-constructed fallback for
    * parsers wired outside injectParser (tests); a bare SparkSqlParser
    * is the never-taken final fallback.
    */
  // VALUES are WeakReferences too: the delegate chain strongly
  // references its session (sessionState), so a strong value would
  // defeat the weak KEY and pin every retired session forever — the
  // live session's own sessionState holds the only strong ref, and
  // when it dies both key and value clear together. Same for the
  // last-wins fallback: a strong `vanillaDelegate` would pin the
  // last session for the driver's lifetime.
  private val delegates = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.lang.ref.WeakReference[ParserInterface]]())
  def registerDelegate(s: SparkSession, d: ParserInterface): Unit = {
    delegates.put(s, new java.lang.ref.WeakReference(d))
    vanillaDelegate = new java.lang.ref.WeakReference(d)
    ()
  }
  private[sources] def delegateFor(s: SparkSession): Option[ParserInterface] =
    Option(delegates.get(s)).flatMap(r => Option(r.get()))
      .orElse(Option(vanillaDelegate).flatMap(r => Option(r.get())))
  @volatile private[sources] var vanillaDelegate
      : java.lang.ref.WeakReference[ParserInterface] = _

  // a target is graft.`/path`, a bare view identifier, or a dotted
  // catalog name (`gcat.ns.t` — resolved through GraftCatalog)
  private val T = """(?:graft\.`([^`]+)`|([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*))"""
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + T +
      """(?:\s+RETAIN\s+(?:(\d+)\s+VERSIONS|(\d+(?:\.\d+)?)\s+HOURS))?(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + T +
      """(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?\s*;?\s*$""").r
  private val HistoryRe =
    ("""(?is)^\s*DESCRIBE\s+HISTORY\s+""" + T + """\s*;?\s*$""").r
  private val DetailRe =
    ("""(?is)^\s*DESCRIBE\s+DETAIL\s+""" + T + """\s*;?\s*$""").r
  // clustering-quality report (round 18): columns optional — defaults
  // to the declared graft.cluster.cols
  private val LayoutRe =
    ("""(?is)^\s*DESCRIBE\s+LAYOUT\s+""" + T +
      """(?:\s*\(([^)]+)\))?\s*;?\s*$""").r
  // Delta's deletion-vector materialization statement (round 19):
  // REORG TABLE t [WHERE band] APPLY (PURGE)
  private val ReorgRe =
    ("""(?is)^\s*REORG\s+TABLE\s+""" + T +
      """(?:\s+WHERE\s+(.+?))?\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""").r
  private val RestoreRe =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + T +
      """\s+TO\s+(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')\s*;?\s*$""").r
  private val ConvertRe =
    """(?is)^\s*CONVERT\s+TO\s+GRAFT\s+(?:parquet\.|graft\.)?`([^`]+)`(?:\s+STATS\s+\(([^)]+)\))?\s*;?\s*$""".r
  private val CopyIntoRe =
    ("""(?is)^\s*COPY\s+INTO\s+""" + T +
      """\s+FROM\s+'([^']+)'(?:\s+FILEFORMAT\s*=\s*(\w+))?(?:\s+STATS\s+\(([^)]+)\))?\s*;?\s*$""").r
  private val ShowTablesRe =
    """(?is)^\s*SHOW\s+GRAFT\s+TABLES\s+IN\s+'([^']+)'\s*;?\s*$""".r
  // CHECK constraints as SQL (round 17; Delta's own grammar) — the
  // reference's validators.py enforce-at-load rule, declarable without
  // leaving SQL. The trailing (.+) is greedy through the LAST `)` so
  // nested parens inside the CHECK expression survive the grab.
  private val AddConstraintRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + T +
      """\s+ADD\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_-]*)\s+CHECK\s*\((.+)\)\s*;?\s*$""").r
  private val DropConstraintRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + T +
      """\s+DROP\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_-]*)\s*;?\s*$""").r
  // SET NOT NULL must be OUR statement (round 19): Spark's analyzer
  // refuses nullable→non-nullable ALTERs against every v2 catalog, so
  // the only route to the validated declaration is the delegating
  // parser. DROP NOT NULL flows through Spark natively.
  private val SetNotNullRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + T +
      """\s+ALTER\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+SET\s+NOT\s+NULL\s*;?\s*$""").r
  // Delta's identity-mark recovery statement (round 18)
  private val SyncIdentityRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + T + """\s+SYNC\s+IDENTITY\s*;?\s*$""").r
  // PERSISTENT VIEWS over the graft catalog: intercept only names with
  // ≥3 dotted parts (cat.ns.v) — a form vanilla Spark REFUSES for the
  // session catalog and every upstream V2 catalog (no V2 view support),
  // so the grab collides with nothing runnable. The run-time command
  // still verifies the first part names a GraftCatalog. Names resolve
  // CASE-INSENSITIVELY (the catalog stores lower-cased view files and
  // the catalog-name lookup falls back to lower case). LIMITATION:
  // BACKQUOTED multi-part view names (`cat`.`ns`.`v`) are not matched
  // by this grab — such statements delegate to Spark's parser, which
  // refuses multi-part views; use unquoted identifier-safe names.
  private val Dotted3 = """((?:[A-Za-z_][A-Za-z0-9_]*\.){2,}[A-Za-z_][A-Za-z0-9_]*)"""
  private val CreateViewRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+""" + Dotted3 +
      """\s+AS\s+(.+?)\s*;?\s*$""").r
  private val DropViewRe =
    ("""(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?""" + Dotted3 + """\s*;?\s*$""").r
  private val ShowViewsRe =
    """(?is)^\s*SHOW\s+GRAFT\s+VIEWS\s+IN\s+([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)\s*;?\s*$""".r

  private def cols(s: String): Seq[String] =
    s.split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty).toSeq

  private[sources] def maintenancePlan(sql: String): Option[LogicalPlan] = sql match {
    case VacuumRe(p, v, retain, hours, dry) =>
      Some(GraftVacuumCommand(Option(p), Option(v),
        Option(retain).map(_.toInt),
        Option(hours).map(h => (h.toDouble * 3600 * 1000).toLong),
        dry != null))
    case OptimizeRe(p, v, where, z) =>
      Some(GraftOptimizeCommand(Option(p), Option(v),
        Option(z).map(cols).getOrElse(Nil), Option(where)))
    case HistoryRe(p, v) =>
      Some(GraftHistoryCommand(Option(p), Option(v)))
    case DetailRe(p, v) =>
      Some(GraftDetailCommand(Option(p), Option(v)))
    case LayoutRe(p, v, cs) =>
      Some(GraftLayoutCommand(Option(p), Option(v),
        Option(cs).map(cols).getOrElse(Nil)))
    case ReorgRe(p, v, where) =>
      Some(GraftReorgCommand(Option(p), Option(v), Option(where)))
    case RestoreRe(p, v, ver, ts) =>
      Some(GraftRestoreCommand(Option(p), Option(v),
        Option(ver).map(_.toLong).getOrElse(-1L),
        Option(ts).map(GraftTableSource.parseTsMillis)))
    case ConvertRe(path, st) =>
      Some(GraftConvertCommand(path, Option(st).map(cols).getOrElse(Nil)))
    case CopyIntoRe(p, v, glob, fmt, st) =>
      Some(GraftCopyIntoCommand(Option(p), Option(v), glob,
        Option(fmt).map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("parquet"),
        Option(st).map(cols).getOrElse(Nil)))
    case ShowTablesRe(root) =>
      Some(GraftShowTablesCommand(root))
    case AddConstraintRe(p, v, name, check) =>
      Some(GraftAddConstraintCommand(Option(p), Option(v), name, check.trim))
    case DropConstraintRe(p, v, name) =>
      Some(GraftDropConstraintCommand(Option(p), Option(v), name))
    case SetNotNullRe(p, v, c) =>
      Some(GraftSetNotNullCommand(Option(p), Option(v), c))
    case SyncIdentityRe(p, v) =>
      Some(GraftSyncIdentityCommand(Option(p), Option(v)))
    case CreateViewRe(orReplace, name, body) =>
      Some(GraftCreateViewCommand(name.split('.').toSeq, body,
        orReplace != null, originalSql = sql))
    case DropViewRe(ifExists, name) =>
      Some(GraftDropViewCommand(name.split('.').toSeq, ifExists != null,
        originalSql = sql))
    case ShowViewsRe(ns) =>
      Some(GraftShowViewsCommand(ns.split('.').toSeq))
    case _ => None
  }

  /** Resolve the command target to its table directory: the path form
    * stands alone; a view name resolves through the session catalog to
    * its unpinned graft relation (same rule as [[GraftSql]] DML).
    */
  private[sources] def dirOf(spark: SparkSession, path: Option[String],
                             view: Option[String]): String =
    path.getOrElse(GraftSql.resolveViewDir(spark, view.get))

  private[sources] def attrsOf(schema: StructType): Seq[Attribute] =
    schema.fields.toSeq.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
}

private[sources] case class GraftVacuumCommand(path: Option[String],
                                               view: Option[String],
                                               retain: Option[Int],
                                               retainMs: Option[Long],
                                               dry: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("deleted_data_files", IntegerType, nullable = false)
    .add("deleted_tmp", IntegerType, nullable = false)
    .add("retained_from", LongType, nullable = false)
    .add("skipped_young", IntegerType, nullable = false)
    .add("dry_run", BooleanType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] = {
    // RETAIN n HOURS (Delta's grammar) maps onto the age floor; RETAIN
    // n VERSIONS stays the version floor — both are "keep at least"
    val r = TableLog.vacuum(spark, GraftSqlParser.dirOf(spark, path, view),
      keepVersions = retain.getOrElse(2), retainMs = retainMs, dryRun = dry)
    Seq(Row(r.deletedDataFiles, r.deletedTmp, r.retainedFrom, r.skippedYoung, dry))
  }
}

private[sources] case class GraftOptimizeCommand(path: Option[String],
                                                 view: Option[String],
                                                 zorder: Seq[String],
                                                 where: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("version", LongType, nullable = false)
    .add("operation", StringType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(spark, path, view)
    // Bare WHERE routes through the SIZE-SELECTED compaction — repeated
    // scoped OPTIMIZE converges (the band's own compacted output skips
    // by size); bare OPTIMIZE stays the full bin-pack; ZORDER is the
    // layout rewrite, and WHERE + ZORDER is the BAND-LOCAL re-layout
    // (Delta's partition-scoped z-order): the band's files re-lay on
    // the curve over the band's own quantiles, out-of-scope files carry
    // verbatim. Unlike bare WHERE, the scoped z-order rewrites its band
    // on every run — a re-layout statement, not a converging loop.
    val v = (zorder, where) match {
      case (z, w) if z.nonEmpty =>
        TableLog.optimizeZOrdered(spark, dir, z,
          where = w.map(org.apache.spark.sql.functions.expr))
      case (_, Some(w)) =>
        TableLog.compactSmallFiles(spark, dir,
          where = Some(org.apache.spark.sql.functions.expr(w)))
          .getOrElse(TableLog.currentVersion(spark, dir))
      case _ => TableLog.compactTable(spark, dir)
    }
    val op = ((if (zorder.nonEmpty) Seq(s"zorder(${zorder.mkString(",")})")
               else Seq("compact")) ++
      where.map(w => s"where $w")).mkString(" ")
    Seq(Row(v, op))
  }
}

private[sources] case class GraftSetNotNullCommand(path: Option[String],
                                                   view: Option[String],
                                                   column: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("version", LongType, nullable = false)
    .add("operation", StringType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(spark, path, view)
    val v = TableLog.setColumnNullability(spark, dir, column, nullable = false)
    Seq(Row(v, s"set not null $column"))
  }
}

private[sources] case class GraftReorgCommand(path: Option[String],
                                              view: Option[String],
                                              where: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("version", LongType, nullable = false)
    .add("operation", StringType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(spark, path, view)
    val v = TableLog.reorgPurge(spark, dir,
      where = where.map(org.apache.spark.sql.functions.expr))
    Seq(Row(v, ("purge" +: where.map(w => s"where $w").toSeq).mkString(" ")))
  }
}

private[sources] case class GraftHistoryCommand(path: Option[String],
                                                view: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("version", LongType, nullable = false)
    .add("committed_at", TimestampType, nullable = false)
    .add("op", StringType, nullable = false)
    .add("files_added", IntegerType, nullable = false)
    .add("files_removed", IntegerType, nullable = false)
    .add("rows_added_live", LongType, nullable = false)
    .add("dv_rows_deleted", LongType, nullable = false)
    .add("txn_app", StringType, nullable = true)
    .add("txn_batch", LongType, nullable = true))
  override def run(spark: SparkSession): Seq[Row] =
    TableLog.describeHistory(spark,
      GraftSqlParser.dirOf(spark, path, view)).collect().toSeq
}

private[sources] case class GraftDetailCommand(path: Option[String],
                                               view: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("version", LongType)
    .add("committed_at", TimestampType)
    .add("num_files", IntegerType)
    .add("size_bytes", LongType)
    .add("live_rows", LongType)
    .add("dv_rows", LongType)
    .add("constraints", StringType)
    .add("properties", StringType)
    .add("ingested_files", IntegerType)
    .add("checkpoint_version", LongType)
    .add("earliest_readable_version", LongType))
  override def run(spark: SparkSession): Seq[Row] =
    TableLog.describeDetail(spark,
      GraftSqlParser.dirOf(spark, path, view)).collect().toSeq
}

/** `DESCRIBE LAYOUT t [(c1, c2)]` — the clustering-quality report:
  * per-column normalized file extents and the expected files a point
  * predicate reads, straight from the manifest (see
  * [[graft.sinks.TableLog.describeLayout]]) — the observable the
  * OPTIMIZE maintenance loop watches.
  */
private[sources] case class GraftLayoutCommand(path: Option[String],
                                               view: Option[String],
                                               columns: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("column", StringType)
    .add("files", IntegerType)
    .add("files_with_stats", IntegerType)
    .add("avg_extent", DoubleType)
    .add("p95_extent", DoubleType)
    .add("est_files_point", DoubleType))
  override def run(spark: SparkSession): Seq[Row] =
    TableLog.describeLayout(spark,
      GraftSqlParser.dirOf(spark, path, view), columns).collect().toSeq
}

/** `ALTER TABLE t SYNC IDENTITY` — re-derive identity high-water marks
  * from the live files' harvested maxes (one manifest pass, zero data
  * read); the recovery statement after RESTORE/CONVERT.
  */
private[sources] case class GraftSyncIdentityCommand(path: Option[String],
                                                     view: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("synced_version", LongType, nullable = true))
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TableLog.syncIdentity(spark,
      GraftSqlParser.dirOf(spark, path, view)).map(java.lang.Long.valueOf).orNull))
}

/** `RESTORE TABLE t TO VERSION AS OF n` — the zero-copy rollback:
  * one commit re-points the table at the target version's immutable
  * files; the rolled-back history stays readable until vacuum.
  */
private[sources] case class GraftRestoreCommand(path: Option[String],
                                                view: Option[String],
                                                toVersion: Long,
                                                toTsMillis: Option[Long] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("version", LongType, nullable = false)
    .add("restored_to", LongType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(spark, path, view)
    // TIMESTAMP AS OF resolves through the same at-or-before rule as
    // snapshot reads, then restores that version zero-copy
    val target = toTsMillis.fold(toVersion)(
      TableLog.versionAtTimestamp(spark, dir, _))
    val v = TableLog.restore(spark, dir, target)
    Seq(Row(v, target))
  }
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` — the method API's
  * [[TableLog.addCheckConstraint]] as SQL: existing data is verified
  * first (refuses with a witness row), then every future commit
  * enforces the expression and a rebase across a constraint change
  * stays blocked (all inherited from the one implementation).
  */
private[sources] case class GraftAddConstraintCommand(path: Option[String],
                                                      view: Option[String],
                                                      constraint: String,
                                                      check: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("version", LongType, nullable = false)
    .add("constraint", StringType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] = {
    val v = TableLog.addCheckConstraint(spark,
      GraftSqlParser.dirOf(spark, path, view), constraint, check)
    Seq(Row(v, constraint))
  }
}

private[sources] case class GraftDropConstraintCommand(path: Option[String],
                                                       view: Option[String],
                                                       constraint: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("version", LongType, nullable = false)
    .add("constraint", StringType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] = {
    val v = TableLog.dropCheckConstraint(spark,
      GraftSqlParser.dirOf(spark, path, view), constraint)
    Seq(Row(v, constraint))
  }
}

private[sources] case class GraftConvertCommand(dir: String,
                                                statsCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("version", LongType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TableLog.convertToGraft(spark, dir, statsCols)))
}

/** `COPY INTO t FROM '<glob>' [FILEFORMAT = fmt] [STATS (cols)]` — the
  * idempotent ingest: files already in the table's ingest ledger skip,
  * new ones land as one transactional commit, however often the
  * statement re-runs (the cron/crash-replay ingest loop as SQL).
  */
private[sources] case class GraftCopyIntoCommand(path: Option[String],
                                                 view: Option[String],
                                                 glob: String, format: String,
                                                 statsCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("version", LongType, nullable = true)
    .add("loaded_files", IntegerType, nullable = false)
    .add("skipped_files", IntegerType, nullable = false)
    .add("loaded_rows", LongType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] = {
    val r = TableLog.copyInto(spark, GraftSqlParser.dirOf(spark, path, view),
      glob, format, statsCols = statsCols)
    Seq(Row(r.version.map(java.lang.Long.valueOf).orNull,
      r.loadedFiles, r.skippedFiles, r.loadedRows))
  }
}

/** `SHOW GRAFT TABLES IN '<root>'` — warehouse discovery: one row per
  * table-log table under the root (the `_log`-boundary walk,
  * O(directories)), with its head version and live file count from one
  * manifest parse each.
  */
private[sources] case class GraftShowTablesCommand(root: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("table", StringType, nullable = false)
    .add("version", LongType, nullable = false)
    .add("num_files", IntegerType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] =
    TableLog.discoverTables(spark, root).map { t =>
      val files = TableLog.liveFilesAt(spark, t)
      Row(t, TableLog.currentVersion(spark, t), files.length)
    }
}

private[sources] object GraftViewCommands {
  /** The catalog behind a multi-part view name, when it is a
    * [[GraftCatalog]] — None otherwise (e.g. the fully-qualified
    * session form `spark_catalog.default.v`, which stays Spark's).
    */
  def graftCatalogOf(spark: SparkSession,
                     name: String): Option[GraftCatalog] =
    org.apache.spark.sql.graftshim.GraftPlanShim
      .catalogPlugin(spark, name) match {
      case Some(g: GraftCatalog) => Some(g)
      case _ => None
    }

  /** Re-run the USER'S ORIGINAL statement text through the parser chain
    * UNDER the graft interceptor (which would just re-grab it) — the
    * fallback for a multi-part view statement whose catalog is NOT
    * graft: e.g. `CREATE VIEW spark_catalog.default.v AS …` is a
    * legitimate session-catalog statement this parser must not break.
    * The stored delegate keeps any OTHER injected parser extensions in
    * the loop and the original text (quoting, comments, hints) intact;
    * a bare SparkSqlParser is only the never-taken null fallback.
    */
  def runVanilla(spark: SparkSession, sql: String): Seq[Row] = {
    val parser = GraftSqlParser.delegateFor(spark).getOrElse(
      new org.apache.spark.sql.execution.SparkSqlParser())
    GraftSqlShimAccess.ofRows(spark, parser.parsePlan(sql)).collect().toSeq
  }
}

/** `CREATE [OR REPLACE] VIEW cat.ns.v AS <query>` — a PERSISTENT named
  * view in the graft catalog (the reference's schema.sql objects are
  * views; this is their lakehouse twin). The defining SQL is validated
  * by ANALYZING it now (unresolvable references fail at create, the
  * standard DDL contract) and stored as text; reads expand it in
  * [[graft.plans.GraftSqlResolution]] — definition fixed, data live.
  */
private[sources] case class GraftCreateViewCommand(parts: Seq[String],
                                                   sql: String,
                                                   orReplace: Boolean,
                                                   originalSql: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftViewCommands.graftCatalogOf(spark, parts.head) match {
      case Some(g) =>
        // analysis (not execution) — the definition must resolve TODAY;
        // schema drift in referenced tables surfaces at read, like any
        // view
        spark.sql(sql).queryExecution.assertAnalyzed()
        g.createView(parts.tail.init, parts.last, sql, orReplace)
        Nil
      case None => GraftViewCommands.runVanilla(spark, originalSql)
    }
}

private[sources] case class GraftDropViewCommand(parts: Seq[String],
                                                 ifExists: Boolean,
                                                 originalSql: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftViewCommands.graftCatalogOf(spark, parts.head) match {
      case Some(g) =>
        val dropped = g.dropView(parts.tail.init, parts.last)
        require(dropped || ifExists,
          s"DROP VIEW: ${parts.mkString(".")} does not exist (IF EXISTS to ignore)")
        Nil
      case None => GraftViewCommands.runVanilla(spark, originalSql)
    }
}

/** `SHOW GRAFT VIEWS IN cat[.ns]` — explicit GRAFT keyword (like SHOW
  * GRAFT TABLES) so vanilla `SHOW VIEWS` delegation is untouched.
  */
private[sources] case class GraftShowViewsCommand(nsParts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.attrsOf(new StructType()
    .add("namespace", StringType, nullable = false)
    .add("viewName", StringType, nullable = false))
  override def run(spark: SparkSession): Seq[Row] = {
    val g = GraftViewCommands.graftCatalogOf(spark, nsParts.head).getOrElse(
      throw new IllegalArgumentException(
        s"SHOW GRAFT VIEWS: '${nsParts.head}' is not a graft catalog"))
    val ns = nsParts.tail
    g.listViews(ns).map(v => Row(ns.mkString("."), v))
  }
}
