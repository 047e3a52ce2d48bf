package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.sinks.TableLog

/** SQL surface for the transactional table log — `spark.read
  * .format("graft").load(dir)`, with `versionAsOf` / `timestampAsOf`
  * time travel, and `CREATE TEMPORARY VIEW t USING graft OPTIONS
  * (path '…')` for plain-SQL users. Mirrors the reference's SQL-view
  * layer (schema.sql) over the lakehouse block, which until now was
  * method-only.
  *
  * Architecture: a Spark `RelationProvider` + `PrunedFilteredScan` —
  * the thin public-API seam whose `buildScan(requiredColumns, filters)`
  * hands the WHOLE read to the table log's existing machinery:
  * pushed-down filters re-materialize as a `Column` predicate routed
  * through [[TableLog.scanWhere]] (`boundsFromPredicate` →
  * `scanPruned`), so manifest stats prune FILES before any scan task
  * plans, deletion vectors anti-apply on the survivors, and the same
  * predicate lands on the inner parquet scan for row-group/page
  * pushdown. Column pruning projects before execution, so the parquet
  * ReadSchema carries only the requested columns. `unhandledFilters`
  * returns every filter — Spark re-applies them above, which keeps the
  * connector's pushdown a pure PRUNING optimization that can never
  * change results (the same conservative contract as scanPruned
  * itself). At 100 TB the interesting work — which files to read at
  * all — happens in the manifest layer this delegates to.
  *
  * The snapshot version is pinned at RELATION CREATION (each
  * `spark.read.…load(…)` resolves "latest" once), so a single query
  * never straddles a concurrent commit.
  */
class GraftTableSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister {
  override def shortName(): String = "graft"

  /** Write path — `df.write.format("graft").mode(…).save(dir)` lands as
    * a TRANSACTIONAL table-log commit (CAS + manifest + footer stats),
    * not a bare parquet dump: Append → [[TableLog.append]] (schema
    * checked against the head), Overwrite → [[TableLog.overwrite]]
    * (remove-all + add, still one atomic commit the old readers never
    * half-see), ErrorIfExists / Ignore honor their SaveMode contracts
    * against `currentVersion`. Options: `statsCols` (comma-separated —
    * harvest manifest min/max for file skipping), `bloomCols` +
    * `bloomNdv` (parquet bloom filters for point-lookup pruning, the
    * [[TableLog.bloomOptions]] shape).
    */
  override def createRelation(sqlContext: SQLContext,
                              mode: org.apache.spark.sql.SaveMode,
                              parameters: Map[String, String],
                              data: org.apache.spark.sql.DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft: the 'path' option is required (df.write.format(\"graft\").save(dir))"))
    val spark = sqlContext.sparkSession
    def csv(k: String): Seq[String] =
      parameters.get(k).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val statsCols = csv("statsCols")
    val writeOpts = {
      val bc = csv("bloomCols")
      if (bc.isEmpty) Map.empty[String, String]
      else TableLog.bloomOptions(bc,
        parameters.get("bloomNdv").map(_.toLong).getOrElse(1000000L))
    }
    val exists = TableLog.currentVersion(spark, dir) > 0L
    mode match {
      case SaveMode.Append =>
        TableLog.append(spark, dir, data, statsCols, writeOptions = writeOpts)
      case SaveMode.Overwrite =>
        TableLog.overwrite(spark, dir, data, statsCols, writeOptions = writeOpts)
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graft: $dir already has committed versions (SaveMode.ErrorIfExists)")
      case SaveMode.ErrorIfExists =>
        TableLog.append(spark, dir, data, statsCols, writeOptions = writeOpts)
      case SaveMode.Ignore =>
        if (!exists)
          TableLog.append(spark, dir, data, statsCols, writeOptions = writeOpts)
    }
    createRelation(sqlContext, parameters)
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft: the 'path' option is required (spark.read.format(\"graft\").load(dir))"))
    val spark = sqlContext.sparkSession
    val version = (parameters.get("versionAsOf"), parameters.get("timestampAsOf")) match {
      case (Some(_), Some(_)) =>
        throw new IllegalArgumentException(
          "graft: versionAsOf and timestampAsOf are mutually exclusive")
      case (Some(v), None) => v.toLong
      case (None, Some(ts)) =>
        TableLog.versionAtTimestamp(spark, dir, GraftTableSource.parseTsMillis(ts))
      case (None, None) => TableLog.currentVersion(spark, dir)
    }
    new GraftTableRelation(sqlContext, dir, version)
  }
}

object GraftTableSource {
  /** `timestampAsOf` accepts epoch millis or `yyyy-MM-dd HH:mm:ss[.f…]`
    * (the Delta option's shape).
    */
  private[sources] def parseTsMillis(s: String): Long =
    s.toLongOption.getOrElse(java.sql.Timestamp.valueOf(s).getTime)

  /** Observability seam for plan specs: the (filesRead, filesTotal) of
    * the LAST buildScan on this JVM — how many files the manifest layer
    * actually planned vs the snapshot's total. Test-only, same spirit
    * as TableLog.clockMs.
    */
  @volatile var lastPrune: Option[(Int, Int)] = None
}

private[sources] class GraftTableRelation(override val sqlContext: SQLContext,
                                          dir: String, version: Long)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  private def spark = sqlContext.sparkSession

  override val schema: StructType = TableLog.schemaAt(spark, dir, version)

  /** `INSERT INTO t SELECT …` / `INSERT OVERWRITE` against a
    * `USING graft` view — lands as a transactional table-log commit
    * (append schema-checks against the head; overwrite replaces in one
    * atomic commit). Spark resolves the inserted columns positionally
    * against [[schema]] before calling this, so the frame arrives
    * aligned.
    */
  override def insert(data: org.apache.spark.sql.DataFrame,
                      overwrite: Boolean): Unit = {
    if (overwrite) TableLog.overwrite(spark, dir, data)
    else TableLog.append(spark, dir, data)
    ()
  }

  // rows come back as the inner plan's InternalRows — no Row conversion
  override def needConversion: Boolean = false

  // every filter is re-applied by Spark above the scan: pushdown here is
  // a pruning hint, never load-bearing for correctness
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val preds = filters.flatMap(GraftTableRelation.toColumn)
    val scan =
      if (preds.isEmpty) {
        val pr = TableLog.scanPruned(spark, dir, Nil, version)
        GraftTableSource.lastPrune = Some((pr.filesRead, pr.filesTotal))
        pr.df
      } else {
        val pr = TableLog.scanWhere(spark, dir, preds.reduce(_ && _), version)
        GraftTableSource.lastPrune = Some((pr.filesRead, pr.filesTotal))
        pr.df
      }
    val projected = scan.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

private[sources] object GraftTableRelation {
  /** Re-materialize a pushed-down source Filter as the equivalent
    * Column. Exact (not a superset), so applying it inside the inner
    * scan drops only rows Spark's re-applied copy would drop anyway;
    * an untranslatable node skips quietly — the file-level prune just
    * sees fewer bounds.
    */
  private[sources] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case _ => None
  }
}
