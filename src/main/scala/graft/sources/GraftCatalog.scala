package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{AlwaysTrue, BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.TableLog

/** PERSISTENT CATALOG — the V2 `CatalogPlugin` that makes graft tables
  * first-class NAMED objects instead of per-session `TEMPORARY VIEW`
  * plumbing (the reference's schema.sql views are persistent named
  * objects; this is their lakehouse twin):
  *
  * {{{
  *   spark.sql.catalog.gcat      = graft.sources.GraftCatalog
  *   spark.sql.catalog.gcat.root = /warehouse
  *
  *   CREATE NAMESPACE gcat.sales
  *   CREATE TABLE gcat.sales.orders (k BIGINT, s STRING) USING graft
  *   INSERT INTO gcat.sales.orders SELECT …
  *   SELECT * FROM gcat.sales.orders [VERSION AS OF 3 | TIMESTAMP AS OF …]
  *   DELETE FROM gcat.sales.orders WHERE k = 7
  *   SHOW TABLES IN gcat.sales
  * }}}
  *
  * PERSISTENCE IS THE FILESYSTEM, NOT A SERVICE: the catalog owns a
  * `root` directory; a namespace is a directory under it, a table is a
  * directory carrying a `_log` (managed) or a `_gcat_external` pointer
  * file naming the real location (`CREATE TABLE … LOCATION`). Any
  * session configured with the same root sees the same tables — no
  * metastore process, the same durability model as the table log
  * itself (the manifests ARE the metadata). Discovery never walks into
  * table data: listing stops at the `_log`/pointer boundary, so a
  * 10⁵-table warehouse lists in O(directories).
  *
  * READS ride the V1 fallback seam (`V1Scan`): the scan builder takes
  * Spark's pushed filters + pruned columns and hands them VERBATIM to
  * [[GraftTableRelation.buildScan]] — one implementation of
  * stats-pruning / bloom point-lookup routing / dv anti-apply for the
  * path form, the view form, and the catalog form. The scan reports
  * manifest byte/row statistics ([[SupportsReportStatistics]]), so a
  * small named dimension table still auto-broadcasts. WRITES ride
  * `V1Write` → [[TableLog.append]]/[[TableLog.overwrite]] (INSERT
  * INTO / INSERT OVERWRITE / CTAS are all one transactional commit);
  * `DELETE FROM … WHERE` is [[SupportsDelete]] over
  * [[TableLog.deleteWhere]]'s stats-pruned CoW (untranslatable
  * predicates refuse at analysis — `canDeleteWhere` — rather than
  * degrade). UPDATE/MERGE stay on the graft SQL front (GraftSql),
  * which resolves catalog names through [[GraftCatalog.tableDirOf]].
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog {

  private var catName: String = _
  private var rootDir: String = _

  private def spark = SparkSession.active
  private[sources] def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    rootDir = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"graft catalog '$name': set spark.sql.catalog.$name.root to the warehouse directory"))
    val root = new Path(rootDir)
    fs(root).mkdirs(root)
    ()
  }

  override def name(): String = catName

  // path-component hygiene: identifiers become directory names
  private def checkPart(s: String): String = {
    require(s.nonEmpty && !s.contains("/") && !s.contains("\\") &&
        s != "." && s != ".." && !s.startsWith("_"),
      s"graft catalog: illegal identifier part '$s' (no path separators, " +
        "no dot-dirs, no leading underscore — that namespace is the catalog's)")
    s
  }

  private def entryPath(ident: Identifier): Path =
    new Path((rootDir +: (ident.namespace().toSeq :+ ident.name())
      .map(checkPart)).mkString("/"))

  private def nsPath(ns: Array[String]): Path =
    new Path((rootDir +: ns.toSeq.map(checkPart)).mkString("/"))

  private def pointer(entry: Path) = new Path(entry, "_gcat_external")

  private def isTableDir(p: Path): Boolean = {
    val f = fs(p)
    f.exists(new Path(p, "_log")) || f.exists(pointer(p))
  }

  /** The table-log directory behind `ident` — the entry itself
    * (managed) or the external pointer's target.
    */
  def tableDirOf(ident: Identifier): String = {
    val entry = entryPath(ident)
    val f = fs(entry)
    if (f.exists(pointer(entry))) {
      val in = f.open(pointer(entry))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    } else entry.toString
  }

  override def tableExists(ident: Identifier): Boolean = {
    val entry = entryPath(ident)
    fs(entry).exists(entry) && isTableDir(entry)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    val f = fs(p)
    if (!f.exists(p)) throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    recoverReplacing(p, None) // aged RTAS crash orphans restore or sweep
    f.listStatus(p).filter(_.isDirectory)
      .map(_.getPath)
      .filterNot(_.getName.startsWith("_"))
      .filter(isTableDir)
      .map(d => Identifier.of(namespace, d.getName))
  }

  /** The not-found path doubles as the RTAS crash-recovery point: a
    * table that vanished mid-replace reappears on its first lookup
    * once the backup ages past the grace window.
    */
  private def requireTable(ident: Identifier): Unit =
    if (!tableExists(ident)) {
      recoverReplacing(entryPath(ident).getParent, Some(ident.name()))
      if (!tableExists(ident)) throw new NoSuchTableException(ident)
    }

  override def loadTable(ident: Identifier): Table = {
    requireTable(ident)
    new GraftV2Table(ident, tableDirOf(ident), -1L)
  }

  /** `VERSION AS OF` through the catalog — Spark hands the version text. */
  override def loadTable(ident: Identifier, version: String): Table = {
    requireTable(ident)
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"graft catalog: VERSION AS OF must be a commit version number, got '$version'"))
    new GraftV2Table(ident, tableDirOf(ident), v)
  }

  /** `TIMESTAMP AS OF` through the catalog — Spark hands epoch MICROS. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    requireTable(ident)
    val dir = tableDirOf(ident)
    val ms = Math.floorDiv(timestampMicros, 1000L)
    new GraftV2Table(ident, dir, TableLog.versionAtTimestamp(spark, dir, ms))
  }

  /** `PARTITIONED BY (col, …)` maps to the CLUSTERING layout (Delta's
    * liquid-clustering direction): identity partition columns become
    * `graft.cluster.cols` (every catalog INSERT range-clusters the
    * batch on them, and maintenance keeps files clustered) plus
    * `graft.stats.cols` (commit-time min/max harvest — what makes
    * partition predicates prune). Physical dir-per-value layouts come
    * in via CONVERT TO GRAFT over an existing hive lake; a NEW table
    * gets the clustered form, which prunes the same and never hits the
    * small-files-per-partition wall.
    *
    * HIDDEN-PARTITIONING transforms (round 18; the Iceberg public-spec
    * shapes — the most common date-partitioned DDL a user ports) map
    * onto the same clustering machinery instead of refusing:
    *
    *  - `years/months/days/hours(ts)` and `truncate(w, col)` are
    *    MONOTONE in their source column, so range-clustering on the
    *    RAW column produces file boundaries at least as tight as the
    *    transform's own — a query predicate on the raw timestamp
    *    prunes through ordinary manifest min/max with no derived
    *    column materialized and nothing to translate at read time.
    *  - `bucket(n, col)` declares point-lookup intent on a high-
    *    cardinality key. The clustering realization is range
    *    clustering on the column (min/max then prunes point AND range
    *    predicates — strictly wider coverage than hash buckets) plus a
    *    parquet BLOOM on it for sub-file point pruning; `n` is
    *    advisory (file count is byte-budgeted, not fixed at n).
    *
    * The declared spec round-trips verbatim through the
    * `graft.partition.transforms` property and [[GraftV2Table]]'s
    * `partitioning()` (DESCRIBE shows it), so the user's DDL intent is
    * never silently flattened away.
    */
  private[sources] case class PartField(fn: String, col: String,
                                        arg: Option[Int]) {
    def render: String = fn match {
      case "identity" => col
      case "bucket" | "truncate" => s"$fn(${arg.get}, $col)"
      case _ => s"$fn($col)"
    }
  }

  /** Split Spark 4's `CLUSTER BY (c1, c2)` DDL transform out of the
    * partition list (round 18; Delta liquid clustering's syntax — the
    * native fit for this catalog, whose "partitioning" IS clustering):
    * its columns land directly in `graft.cluster.cols`/stats, marked by
    * `graft.cluster.ddl` so [[GraftV2Table.partitioning]] re-emits the
    * ClusterByTransform for DESCRIBE.
    */
  private[sources] def splitClusterBy(partitions: Array[Transform])
      : (Seq[String], Array[Transform]) = {
    val (cb, rest) = partitions.partition(
      _.isInstanceOf[org.apache.spark.sql.connector.expressions.ClusterByTransform])
    val cols = cb.toSeq
      .flatMap(_.asInstanceOf[org.apache.spark.sql.connector.expressions.ClusterByTransform]
        .columnNames.map { r =>
          require(r.fieldNames().length == 1,
            s"graft catalog: CLUSTER BY ${r.describe()} must be a top-level column")
          r.fieldNames().head
        })
    require(cols.isEmpty || rest.isEmpty,
      "graft catalog: CLUSTER BY and PARTITIONED BY cannot combine — " +
        "both map to the clustering layout; declare one")
    (cols, rest)
  }

  private[sources] def partitionFields(partitions: Array[Transform]): Seq[PartField] =
    partitions.toSeq.map { t =>
      val fn = t.name().toLowerCase(java.util.Locale.ROOT)
      def col1: String = {
        require(t.references().length == 1 &&
            t.references().head.fieldNames().length == 1,
          s"graft catalog: PARTITIONED BY ${t.describe()} must reference " +
            "exactly one top-level column")
        t.references().head.fieldNames().head
      }
      def intArg: Int = {
        val ints = t.arguments().toSeq.collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }
        require(ints.length == 1 && ints.head > 0,
          s"graft catalog: PARTITIONED BY ${t.describe()} needs one positive " +
            "integer argument")
        ints.head
      }
      fn match {
        case "identity" => PartField("identity", col1, None)
        case "years" | "months" | "days" | "hours" =>
          PartField(fn, col1, None)
        case "bucket" | "truncate" => PartField(fn, col1, Some(intArg))
        case other => throw new UnsupportedOperationException(
          s"graft catalog: PARTITIONED BY ${t.describe()} is not supported — " +
            "use identity columns, years/months/days/hours(ts), " +
            "truncate(w, col), or bucket(n, col)")
      }
    }

  /** Generated columns are the one capability beyond the default set:
    * Spark validates `GENERATED ALWAYS AS (expr)` DDL (deterministic,
    * no subquery/self-reference, type match) and hands the expression
    * through the column metadata — [[createTable]] turns it into the
    * `graft.generated.cols` property (write-time NULL fill in the
    * table log's commit) plus a `_gen_<col>` CHECK constraint (every
    * write path refuses a mismatched explicit value).
    */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** `GENERATED ALWAYS AS` expressions arrive ONLY on the `Column[]`
    * DDL overloads — `CatalogV2Util.v2ColumnToStructField` does not
    * fold `generationExpression()` into field metadata, so the default
    * delegation would silently drop them. Each Column[] route (CREATE,
    * CTAS staging, RTAS staging) captures the expressions here for the
    * StructType implementation it funnels into; same-thread by
    * construction (the capture wraps the delegation call).
    */
  private val pendingGenerated =
    new ThreadLocal[Seq[(String, String)]] {
      override def initialValue: Seq[(String, String)] = Nil
    }

  /** The `Column[]` → `StructType` collapse (CatalogV2Util's is
    * `private[sql]`): name/type/nullable/metadata/comment carry over;
    * generation expressions travel through [[captureGenerated]] and
    * column DEFAULTs are not supported by this catalog.
    */
  private def columnsToStructType(columns: Array[Column]): StructType = {
    val raw = StructType(columns.map { c =>
      val meta0 = Option(c.metadataInJSON())
        .map(org.apache.spark.sql.types.Metadata.fromJson)
        .getOrElse(org.apache.spark.sql.types.Metadata.empty)
      // column DEFAULTs (round 18): the default's SQL text rides the
      // field metadata under Spark's OWN keys — the analyzer's
      // ResolveDefaultColumns then pads missing INSERT columns and the
      // DEFAULT keyword from it; values land MATERIALIZED in the files,
      // so reads need nothing. The metadata persists through the commit
      // schemaJson like any other field metadata (DESCRIBE shows it).
      val meta = Option(c.defaultValue()).fold(meta0) { dv =>
        new org.apache.spark.sql.types.MetadataBuilder().withMetadata(meta0)
          .putString(org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
            .CURRENT_DEFAULT_COLUMN_METADATA_KEY, dv.getSql)
          .build()
      }
      val f = org.apache.spark.sql.types.StructField(
        c.name(), c.dataType(), c.nullable(), meta)
      Option(c.comment()).map(f.withComment).getOrElse(f)
    })
    // fold CURRENT → EXISTS (Delta does the same at DDL time): rows
    // that predate a default read it from here if a later feature adds
    // post-hoc defaults; for CREATE-time defaults the two coincide
    org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      .constantFoldCurrentDefaultsToExistDefaults(raw, "CREATE TABLE")
  }

  private val pendingIdentity =
    new ThreadLocal[Seq[TableLog.IdentitySpec]] {
      override def initialValue: Seq[TableLog.IdentitySpec] = Nil
    }

  private def captureGenerated[A](columns: Array[Column])(body: => A): A = {
    pendingGenerated.set(columns.toSeq.flatMap(c =>
      Option(c.generationExpression()).map(e => c.name() -> e)))
    pendingIdentity.set(columns.toSeq.flatMap(c =>
      Option(c.identityColumnSpec()).map { s =>
        require(s.getStep > 0,
          s"graft catalog: identity column '${c.name()}' declares step " +
            s"${s.getStep} — only ascending identities are supported (the " +
            "high-water mark rides the harvested footer MAX)")
        require(!c.name().contains(":") && !c.name().contains(";"),
          s"graft catalog: identity column name '${c.name()}' cannot " +
            "contain ':' or ';'")
        TableLog.IdentitySpec(c.name(), s.getStart, s.getStep,
          s.isAllowExplicitInsert)
      }))
    try body finally { pendingGenerated.remove(); pendingIdentity.remove() }
  }

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    captureGenerated(columns)(createTable(ident,
      columnsToStructType(columns), partitions, properties))

  override def stageCreate(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): StagedTable =
    captureGenerated(columns)(stageCreate(ident,
      columnsToStructType(columns), partitions, properties))

  override def stageReplace(ident: Identifier, columns: Array[Column],
                            partitions: Array[Transform],
                            properties: util.Map[String, String]): StagedTable =
    captureGenerated(columns)(stageReplace(ident,
      columnsToStructType(columns), partitions, properties))

  override def stageCreateOrReplace(ident: Identifier, columns: Array[Column],
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String]): StagedTable =
    captureGenerated(columns)(stageCreateOrReplace(ident,
      columnsToStructType(columns), partitions, properties))

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    // Spark identifiers are case-insensitive: resolve each PARTITIONED
    // BY name to the column list's OWN spelling before it lands in
    // properties (a property naming "id" against a field "ID" would
    // silently cluster nothing)
    val (clusterByCols0, partOnly) = splitClusterBy(partitions)
    def resolveCase(c: String): String =
      if (schema.fieldNames.isEmpty) c
      else schema.fieldNames.find(_.equalsIgnoreCase(c))
        .getOrElse(throw new IllegalArgumentException(
          s"graft catalog: PARTITIONED BY / CLUSTER BY column '$c' is not " +
            "in the column list"))
    val clusterByCols = clusterByCols0.map(resolveCase)
    val pfields = partitionFields(partOnly).map(pf =>
      pf.copy(col = resolveCase(pf.col)))
    // the SOURCE columns carry the layout: monotone transforms prune
    // through them directly; bucket() adds a bloom on top; CLUSTER BY
    // columns are the layout verbatim
    val pcols = (pfields.map(_.col) ++ clusterByCols).distinct
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val entry = entryPath(ident)
    val f = fs(entry)
    val parent = entry.getParent
    if (!f.exists(parent))
      throw new NoSuchNamespaceException(catName +: ident.namespace().toSeq)
    f.mkdirs(entry)
    val external = Option(properties.get(TableCatalog.PROP_LOCATION))
    external.foreach { loc =>
      val out = f.create(pointer(entry), false)
      try out.write(loc.getBytes("UTF-8")) finally out.close()
    }
    val dir = external.getOrElse(entry.toString)
    val existing = TableLog.currentVersion(spark, dir) > 0L
    if (!existing) {
      require(schema.fields.nonEmpty,
        s"graft catalog: CREATE TABLE ${ident} needs a column list (or a " +
          "LOCATION holding an existing graft table to adopt)")
      // anchor the schema as an empty version 1 — one transactional
      // commit, same as every other write path
      TableLog.overwrite(spark, dir, spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema))
      ()
    } else if (schema.fields.nonEmpty) {
      val have = TableLog.schemaAt(spark, dir)
      require(have.fields.map(fd => (fd.name, fd.dataType)).toSeq ==
          schema.fields.map(fd => (fd.name, fd.dataType)).toSeq,
        s"graft catalog: LOCATION $dir already holds a table with schema " +
          s"${have.simpleString}, which differs from the declared " +
          s"${schema.simpleString} — omit the column list to adopt it")
    }
    // user TBLPROPERTIES (graft.* knobs and anything else non-reserved)
    // land as ONE table-properties commit
    val reserved = Set(TableCatalog.PROP_LOCATION, TableCatalog.PROP_PROVIDER,
      TableCatalog.PROP_COMMENT, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_IS_MANAGED_LOCATION,
      TableCatalog.PROP_TABLE_TYPE, TableCatalog.PROP_COLLATION)
    val user = properties.asScala.filterNot { case (k, _) =>
      reserved.contains(k) || k.startsWith(TableCatalog.OPTION_PREFIX) }.toMap
    val withParts =
      if (pfields.isEmpty && clusterByCols.isEmpty) user
      else {
        user.get("graft.cluster.cols").foreach(c => require(
          c.split(",").map(_.trim).toSeq.map(_.toLowerCase(java.util.Locale.ROOT)) ==
            pcols.map(_.toLowerCase(java.util.Locale.ROOT)),
          s"graft catalog: PARTITIONED BY/CLUSTER BY (${pcols.mkString(", ")}) " +
            s"conflicts with TBLPROPERTIES graft.cluster.cols='$c' — declare one"))
        val stats = (pcols ++ user.get("graft.stats.cols").toSeq
          .flatMap(_.split(",").map(_.trim))).distinct
        // bucket(n, col) → bloom on col: range min/max cannot prune a
        // point lookup on a high-cardinality key whose range spans
        // files after OTHER cluster columns dominate the sort; the
        // bloom is the per-file membership answer bucketing promises
        val bucketCols = pfields.filter(_.fn == "bucket").map(_.col)
        val blooms = (user.get("graft.bloom.cols").toSeq
          .flatMap(_.split(",").map(_.trim)) ++ bucketCols).distinct
        user + ("graft.cluster.cols" -> pcols.mkString(",")) +
          ("graft.stats.cols" -> stats.mkString(",")) ++
          (if (pfields.isEmpty) Map("graft.cluster.ddl" -> "true")
           else Map("graft.partition.transforms" ->
             pfields.map(_.render).mkString(","))) ++
          (if (blooms.isEmpty) Map.empty[String, String]
           else Map("graft.bloom.cols" -> blooms.mkString(",")))
      }
    // GENERATED ALWAYS AS (expr) — Spark validated the expression at
    // analysis (capability-gated); it arrives in the field metadata.
    // Stored as a property (commit-time NULL fill) + stats on the
    // generated column (it exists to be pruned on) + a CHECK constraint
    // so EVERY write path — SQL or direct TableLog — refuses a
    // mismatched explicit value instead of silently diverging from the
    // derivation.
    val genCols: Seq[(String, String)] = {
      // direct-API callers may carry the expression in field metadata
      // (GeneratedColumn's key); SQL DDL arrives via the Column[]
      // capture above
      val fromMeta = schema.fields.toSeq.flatMap { f =>
        org.apache.spark.sql.catalyst.util.GeneratedColumn
          .getGenerationExpression(f).map(e => f.name -> e)
      }
      if (fromMeta.nonEmpty) fromMeta else pendingGenerated.get()
    }
    val withGen =
      if (genCols.isEmpty) withParts
      else {
        val stats = (withParts.getOrElse("graft.stats.cols", "")
          .split(",").map(_.trim).filter(_.nonEmpty) ++ genCols.map(_._1)).distinct
        withParts +
          ("graft.generated.cols" -> TableLog.encodeGeneratedCols(genCols)) +
          ("graft.stats.cols" -> stats.mkString(","))
      }
    // GENERATED … AS IDENTITY — assignment happens inside the table
    // log's commit (NULL → high-water-mark fill; ALWAYS refuses
    // explicit values); the column always carries stats because the
    // footer max IS the mark's source
    val idSpecs = pendingIdentity.get()
    val withIdent =
      if (idSpecs.isEmpty) withGen
      else {
        val stats = (withGen.getOrElse("graft.stats.cols", "")
          .split(",").map(_.trim).filter(_.nonEmpty) ++ idSpecs.map(_.col)).distinct
        withGen +
          ("graft.identity.cols" -> TableLog.encodeIdentityCols(idSpecs)) +
          ("graft.stats.cols" -> stats.mkString(","))
      }
    // `k BIGINT NOT NULL` in the column list is an EXPLICIT declaration
    // (unlike an encoder's nullable flag) — record it so every write
    // path enforces it; identity columns own their own fill channel
    val nnCols = schema.fields.toSeq
      .filterNot(_.nullable).map(_.name)
      .filterNot(idSpecs.map(_.col).toSet)
    val withNotNull =
      if (nnCols.isEmpty) withIdent
      else withIdent + ("graft.notnull.cols" ->
        (TableLog.notNullColsOf(withIdent) ++ nnCols).distinct.mkString(","))
    if (withNotNull.nonEmpty) TableLog.setTableProperties(spark, dir, withNotNull)
    genCols.foreach { case (c, e) =>
      TableLog.addCheckConstraint(spark, dir, s"_gen_$c", s"`$c` <=> ($e)")
    }
    loadTable(ident)
  }

  // ------------------------------------------------------- CTAS / RTAS

  /** CTAS routes here (not [[createTable]]) because the catalog is a
    * [[StagingTableCatalog]] — which is what lets CREATE TABLE … AS
    * SELECT be DISTINGUISHED from plain CREATE TABLE. The distinction
    * matters for LOCATION adoption: plain CREATE over an existing
    * graft table ADOPTS it (registration, no data change), but CTAS
    * onto a location that already holds data would APPEND the query
    * result into it — the resulting table silently becomes
    * old-union-new instead of the query result. Delta refuses exactly
    * this; so do we. The staged table itself is best-effort (the
    * create is visible immediately — same durability seam as the
    * non-atomic path): commit is a no-op, abort drops the entry so a
    * failed CTAS write does not leave a half-registered table.
    */
  private def refuseCtasOntoData(ident: Identifier, what: String,
                                 properties: util.Map[String, String]): Unit =
    Option(properties.get(TableCatalog.PROP_LOCATION)).foreach { loc =>
      val nonEmpty = TableLog.currentVersion(spark, loc) > 0L &&
        TableLog.liveFilesAt(spark, loc).nonEmpty
      require(!nonEmpty,
        s"graft catalog: $what $ident onto LOCATION '$loc' " +
          "refuses — the location already holds a table WITH DATA, and the " +
          "AS SELECT result would append into it (old-union-new is never " +
          "what AS SELECT means; the catalog entry cannot clear an " +
          "external location either). Plain CREATE TABLE (no AS SELECT) " +
          "adopts the existing table; INSERT INTO appends explicitly.")
    }

  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): StagedTable = {
    refuseCtasOntoData(ident, "CREATE TABLE ... AS SELECT", properties)
    new GraftStagedTable(this, ident,
      createTable(ident, schema, partitions, properties), backup = None)
  }

  /** RTAS: the existing entry is RENAMED ASIDE (an `_replacing_*`
    * sibling, invisible to listings), the new table is created and
    * written, and only a successful commit deletes the backup — a
    * failed REPLACE TABLE AS SELECT restores the original instead of
    * destroying it (the whole point of the staging seam). Every refusal
    * (transform partitioning, AS-SELECT onto an external location with
    * data) runs BEFORE the rename, so a refused statement touches
    * nothing.
    */
  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String]): StagedTable = {
    requireTable(ident)
    refuseCtasOntoData(ident, "REPLACE TABLE ... AS SELECT", properties)
    partitionFields(splitClusterBy(partitions)._2) // transform refusal, pre-rename
    val entry = entryPath(ident)
    val f = fs(entry)
    val backup = new Path(entry.getParent,
      s"_replacing_${ident.name()}_${java.util.UUID.randomUUID().toString.take(8)}")
    // stamp BEFORE the rename-aside: the stamp's age (not the dir's —
    // a rename preserves the original table's old mtime) is what
    // gates crash recovery, so a fresh in-flight RTAS can never look
    // aged to a concurrent [[recoverReplacing]]. A crash between stamp
    // and rename leaves a harmless marker in a live entry (swept by
    // the next stageReplace's overwrite).
    val stampOut = f.create(new Path(entry, ReplacingStamp), true)
    try stampOut.write(
      graft.sinks.TableLog.clockMs().toString.getBytes("UTF-8"))
    finally stampOut.close()
    require(f.rename(entry, backup),
      s"graft catalog: could not stage REPLACE of $ident (rename failed)")
    noLitterUntil.remove(entry.getParent.toString) // backup exists now
    try {
      // the STAGED marker makes crash states unambiguous to recovery:
      // while it exists, the entry at this path is an uncommitted
      // replace (roll back to the backup); its deletion is the commit
      // point (backup becomes litter). It is planted BEFORE
      // createTable (round 18): createTable's own mkdirs + empty-v1
      // commit used to run first, opening a window where a crash left
      // the entry present WITHOUT the marker — the exact shape
      // recovery reads as "committed replace", so it swept the backup
      // and the original rows were gone for good. With the marker
      // first, every crash state from here to commitStagedChanges
      // carries it (createTable tolerates the pre-made dir and never
      // touches the marker); the one residual instant — entry dir
      // created, marker not yet — is closed on the recovery side,
      // which only reads entry-without-marker as committed when the
      // entry is a REAL table dir (a committed replace always is; a
      // bare crash-litter dir is not).
      f.mkdirs(entry)
      f.create(new Path(entry, StagedMarker), true).close()
      val staged = createTable(ident, schema, partitions, properties)
      new GraftStagedTable(this, ident, staged,
        backup = Some((backup, entry)))
    } catch {
      case e: Throwable =>
        f.delete(entry, true)
        f.rename(backup, entry)
        f.delete(new Path(entry, ReplacingStamp), false)
        throw e
    }
  }

  /** Crash recovery for RTAS backups (round 17; mirrors the table
    * log's vacuum-grace discipline): a driver crash between
    * [[stageReplace]]'s rename-aside and the staged commit leaves the
    * table VANISHED from listings (or visible only as an uncommitted
    * staged entry) with its real bytes stranded in an `_replacing_*`
    * sibling forever. On catalog listing (and on a failed named
    * lookup) every AGED backup resolves by the crash state:
    *
    *  - target entry ABSENT (crash before the staged create) →
    *    RESTORE the backup; the table reappears, original rows intact.
    *  - target entry present WITH the [[StagedMarker]] (crash mid-
    *    write, before the commit point) → the replace never happened:
    *    drop the staged entry, RESTORE the backup.
    *  - target entry present WITHOUT the marker (crash after the
    *    commit point, before backup cleanup) → the replace committed;
    *    the backup is litter, SWEEP it.
    *
    * Age gates on the PRE-RENAME stamp (the dir's own mtime is the old
    * table's, not the stage instant), so an in-flight RTAS is never
    * touched inside the grace window; a write that outlives the window
    * is the same residual every age-gated crash protocol carries
    * (vacuum's in-flight-commit grace included) — size
    * [[GraftCatalog.replacingGraceMs]] above the longest expected
    * AS-SELECT. Stacked backups (repeated crashes) restore the NEWEST
    * stamp; older ones become sweep-litter on the next pass.
    */
  /** Per-namespace no-litter memo (round 18): recovery runs on EVERY
    * listing and failed lookup, and each run re-lists the namespace dir
    * plus a stamp read per backup — fine at catalog scale, but a busy
    * namespace pays it per listing. A sweep that finds ZERO
    * `_replacing_*` entries memoizes the namespace clean for a window
    * (grace/4, capped at 5 min) and later sweeps return immediately;
    * this instance's own [[stageReplace]] invalidates the memo for its
    * namespace, and a CONCURRENT writer's crash litter is still found
    * once the window lapses — harmless, since recovery is age-gated
    * far beyond it. Nothing is memoized while litter exists (ages must
    * keep being re-checked).
    */
  private val noLitterUntil =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def litterMemoMs: Long =
    math.min(GraftCatalog.replacingGraceMs / 4, 5L * 60L * 1000L)
  /** Counts REAL sweeps (namespace listings) — the fast-path spec pins
    * that memoized calls don't list.
    */
  private[sources] val recoverySweeps =
    new java.util.concurrent.atomic.AtomicLong

  private[sources] def recoverReplacing(parent: Path,
                                        target: Option[String]): Unit = {
    val memoKey = parent.toString
    val now0 = graft.sinks.TableLog.clockMs()
    val until = noLitterUntil.get(memoKey)
    if (until != null && until > now0) return
    recoverySweeps.incrementAndGet()
    val f = fs(parent)
    val kids = try f.listStatus(parent)
      catch { case scala.util.control.NonFatal(_) => return }
    val now = graft.sinks.TableLog.clockMs()
    if (!kids.exists(s => s.isDirectory &&
        s.getPath.getName.startsWith("_replacing_"))) {
      noLitterUntil.put(memoKey, now + litterMemoMs)
      return
    }
    def sinceOf(b: Path, fallback: Long): Long =
      try {
        val in = f.open(new Path(b, ReplacingStamp))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
        finally in.close()
      } catch { case scala.util.control.NonFatal(_) => fallback }
    val backups = kids.filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("_replacing_")).flatMap { s =>
      val core = s.getPath.getName.stripPrefix("_replacing_")
      val cut = core.lastIndexOf('_')
      if (cut <= 0) None
      else {
        val name = core.take(cut)
        if (target.forall(_ == name))
          Some((name, s.getPath, sinceOf(s.getPath, s.getModificationTime)))
        else None
      }
    }
    backups.groupBy(_._1).foreach { case (name, bs) =>
      // newest stamp is the latest pre-crash state; it decides
      val (_, b, since) = bs.maxBy(_._3)
      if (now - since >= GraftCatalog.replacingGraceMs) {
        val entry = new Path(parent, name)
        val staged = f.exists(new Path(entry, StagedMarker))
        // committed = entry present, marker gone, AND the entry is a
        // real table dir (_log or external pointer). A bare dir with
        // neither is the mkdirs-before-marker crash instant — NOT a
        // committed replace (commit only ever deletes the marker from
        // a fully created table), so the backup restores instead of
        // being swept (round 18; pre-fix this branch silently
        // destroyed the original rows).
        if (f.exists(entry) && !staged && isTableDir(entry)) {
          f.delete(b, true); ()
        } else {
          // uncommitted staged entry, or bare crash-litter dir
          if (f.exists(entry)) f.delete(entry, true)
          if (f.rename(b, entry)) {
            f.delete(new Path(entry, ReplacingStamp), false); ()
          }
        }
      }
    }
  }

  private val ReplacingStamp = "_replacing_since"
  private val StagedMarker = "_gcat_staged"

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String]): StagedTable =
    if (tableExists(ident)) stageReplace(ident, schema, partitions, properties)
    else stageCreate(ident, schema, partitions, properties)

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDirOf(ident)
    changes.foreach {
      case s: TableChange.SetProperty =>
        TableLog.setTableProperties(spark, dir, Map(s.property() -> s.value()))
      case r: TableChange.RemoveProperty =>
        TableLog.unsetTableProperties(spark, dir, Seq(r.property()))
      case c: TableChange.RenameColumn =>
        // nested renames (round 18): the dotted path rides the column
        // mapping — manifest-only, zero data rewritten
        TableLog.renameColumn(spark, dir, c.fieldNames().mkString("."),
          c.newName())
      case d: TableChange.DeleteColumn =>
        TableLog.dropColumn(spark, dir, d.fieldNames().mkString("."))
      case cb: TableChange.ClusterBy =>
        // ALTER TABLE … CLUSTER BY (c1, c2) / CLUSTER BY NONE — re-point
        // the declared layout; maintenance re-clusters the tail, data
        // already written keeps its old (still stats-pruned) layout
        val cols = cb.clusteringColumns().toSeq.map { r =>
          require(r.fieldNames().length == 1,
            s"graft catalog: CLUSTER BY ${r.describe()} must be a top-level column")
          r.fieldNames().head
        }
        if (cols.isEmpty)
          TableLog.unsetTableProperties(spark, dir,
            Seq("graft.cluster.cols", "graft.cluster.ddl"))
        else {
          val stats = (TableLog.tablePropertiesAt(spark, dir)
            .get("graft.stats.cols").toSeq
            .flatMap(_.split(",").map(_.trim)) ++ cols).distinct
          TableLog.setTableProperties(spark, dir, Map(
            "graft.cluster.cols" -> cols.mkString(","),
            "graft.stats.cols" -> stats.mkString(","),
            "graft.cluster.ddl" -> "true"))
        }
      case a: TableChange.AddColumn =>
        require(a.isNullable,
          "graft catalog: added columns must be nullable — existing files " +
            "null-fill them on read")
        // nested adds (round 18): the dotted path appends a field to
        // its parent struct, manifest-only. A DEFAULT (round 19) rides
        // both metadata keys: future INSERTs pad, old files read it
        TableLog.addColumn(spark, dir, a.fieldNames().mkString("."),
          a.dataType(), Option(a.defaultValue()).map(_.getSql))
      case u: TableChange.UpdateColumnType =>
        // ALTER TABLE … ALTER COLUMN c TYPE t — type WIDENING only,
        // manifest-only; old files promote at scan (round 19)
        TableLog.alterColumnType(spark, dir, u.fieldNames().mkString("."),
          u.newDataType())
      case c: TableChange.UpdateColumnComment =>
        TableLog.setColumnComment(spark, dir, c.fieldNames().mkString("."),
          Option(c.newComment()).filter(_.nonEmpty))
      case n: TableChange.UpdateColumnNullability =>
        // SET NOT NULL validates the backlog from manifest null counts
        // (zero data read when stats cover); DROP NOT NULL relaxes
        TableLog.setColumnNullability(spark, dir,
          n.fieldNames().mkString("."), n.nullable())
      case d: TableChange.UpdateColumnDefaultValue =>
        // SET DEFAULT expr / DROP DEFAULT (empty string = drop — what
        // Spark's AlterColumn sends for DROP DEFAULT)
        TableLog.setColumnDefault(spark, dir, d.fieldNames().mkString("."),
          Option(d.newDefaultValue()).map(_.trim).filter(_.nonEmpty))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: ALTER TABLE change $other is not supported — " +
          "schema changes beyond rename/drop/properties go through the " +
          "TableLog API (overwrite / mergeSchema append)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val entry = entryPath(ident)
    // managed: the entry IS the table — dropping removes data. External:
    // the entry holds only the pointer — the data stays where it lives
    // (the SQL-standard external-table contract).
    fs(entry).delete(entry, true)
  }

  override def renameTable(oldIdent: Identifier, newTarget: Identifier): Unit = {
    // `ALTER TABLE cat.ns.t RENAME TO cat.ns.u` hands the target through
    // UNRESOLVED (catalog prefix still in the namespace) — strip our own
    // name when it leads, the same normalization Delta's catalog applies
    val newIdent =
      if (newTarget.namespace().headOption.contains(catName))
        Identifier.of(newTarget.namespace().drop(1), newTarget.name())
      else newTarget
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val from = entryPath(oldIdent)
    val to = entryPath(newIdent)
    val f = fs(from)
    require(f.exists(to.getParent),
      s"graft catalog: target namespace ${newIdent.namespace().mkString(".")} does not exist")
    require(f.rename(from, to),
      s"graft catalog: rename $from -> $to failed")
  }

  // ------------------------------------------------------------------ views

  /** PERSISTENT NAMED VIEWS — the reference's schema.sql objects
    * (v_order_summary, v_delivery_performance) are views, so the
    * catalog stores them too: a view is a `(name)._gcatview` file under
    * its namespace directory holding the defining SQL text. Spark's
    * analyzer has no upstream V2 view resolution, so the graft SQL
    * surface carries it: `CREATE [OR REPLACE] VIEW cat.ns.v AS …` /
    * `DROP VIEW` intercept in [[GraftSqlParser]], and reads expand in
    * [[graft.plans.GraftSqlResolution]] (definition fixed at create,
    * data live at read — standard view semantics; nested views expand
    * with cycle detection). Same durability model as tables: any
    * session over the same root sees the same views.
    */
  /** View names are CASE-INSENSITIVE like every Spark identifier: the
    * stored filename is the lower-cased name, so `gcat.ns.V_X` and
    * `gcat.ns.v_x` are one view. Namespace segments are real
    * directories (shared with tables, created with the user's case) —
    * lookups try the exact segments first, then the all-lower-cased
    * path, which covers the unquoted-identifier convention without a
    * per-segment directory listing.
    */
  private def viewFile(ns: Seq[String], name: String): Path =
    new Path((rootDir +: ns.map(checkPart)).mkString("/") +
      s"/${checkPart(name).toLowerCase(java.util.Locale.ROOT)}._gcatview")

  private def viewFileResolved(ns: Seq[String], name: String): Path = {
    val exact = viewFile(ns, name)
    if (fs(exact).exists(exact)) exact
    else {
      val lower = viewFile(ns.map(_.toLowerCase(java.util.Locale.ROOT)), name)
      if (fs(lower).exists(lower)) lower else exact
    }
  }

  def viewSql(ns: Seq[String], name: String): Option[String] = {
    val p = viewFileResolved(ns, name)
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  def createView(ns: Seq[String], name: String, sql: String,
                 orReplace: Boolean): Unit = {
    val ident = Identifier.of(ns.toArray, name)
    require(!tableExists(ident),
      s"graft catalog: ${(ns :+ name).mkString(".")} is a TABLE — a view " +
        "cannot shadow it")
    val p = viewFile(ns, name)
    val f = fs(p)
    require(f.exists(p.getParent),
      s"graft catalog: namespace ${ns.mkString(".")} does not exist")
    require(orReplace || !f.exists(p),
      s"graft catalog: view ${(ns :+ name).mkString(".")} already exists " +
        "(CREATE OR REPLACE VIEW to redefine)")
    val out = f.create(p, orReplace)
    try out.write(sql.getBytes("UTF-8")) finally out.close()
  }

  def dropView(ns: Seq[String], name: String): Boolean = {
    val p = viewFileResolved(ns, name)
    fs(p).delete(p, false)
  }

  def listViews(ns: Seq[String]): Seq[String] = {
    val p = nsPath(ns.toArray)
    val f = fs(p)
    if (!f.exists(p)) throw new NoSuchNamespaceException(catName +: ns)
    f.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filter(_.endsWith("._gcatview"))
      .map(_.stripSuffix("._gcatview")).sorted.toSeq
  }

  // ------------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val p = nsPath(namespace)
    val f = fs(p)
    if (!f.exists(p)) throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    recoverReplacing(p, None) // aged RTAS crash orphans restore or sweep
    f.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filterNot(_.getName.startsWith("_"))
      .filterNot(isTableDir)
      .map(d => namespace :+ d.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    if (namespace.isEmpty) return true
    val p = nsPath(namespace)
    fs(p).exists(p) && !isTableDir(p)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    Map(SupportsNamespaces.PROP_LOCATION -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val p = nsPath(namespace)
    fs(p).mkdirs(p)
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val p = nsPath(namespace)
    val f = fs(p)
    require(cascade || f.listStatus(p).isEmpty,
      s"graft catalog: namespace ${namespace.mkString(".")} is not empty " +
        "(DROP … CASCADE to remove its tables)")
    f.delete(p, true)
  }
}

/** The best-effort staged table behind CTAS/RTAS: the underlying table
  * is already live (filesystem catalogs have no invisible staging), so
  * commit is cleanup-only and abort unregisters the entry. For RTAS,
  * `backup` holds the original entry renamed aside: commit deletes it,
  * abort restores it — a failed replace never loses the original.
  */
private[sources] class GraftStagedTable(cat: GraftCatalog, ident: Identifier,
                                        underlying: Table,
                                        backup: Option[(Path, Path)])
    extends StagedTable with SupportsRead with SupportsWrite {
  override def commitStagedChanges(): Unit =
    backup.foreach { case (b, orig) =>
      // marker deletion IS the commit point: from here on, crash
      // recovery reads this entry as a committed replace and treats
      // the backup as litter
      cat.fs(b).delete(new Path(orig, "_gcat_staged"), false)
      cat.fs(b).delete(b, true)
      ()
    }
  override def abortStagedChanges(): Unit = {
    cat.dropTable(ident)
    backup.foreach { case (b, orig) =>
      cat.fs(b).rename(b, orig)
      cat.fs(b).delete(new Path(orig, "_replacing_since"), false)
      ()
    }
  }
  override def name(): String = underlying.name()
  override def schema(): StructType = underlying.schema()
  override def capabilities(): util.Set[TableCapability] =
    underlying.capabilities()
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    underlying.asInstanceOf[SupportsRead].newScanBuilder(options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    underlying.asInstanceOf[SupportsWrite].newWriteBuilder(info)
}

/** A named graft table through the V2 seam — reads/writes delegate to
  * the same TableLog machinery as the path and view forms.
  */
private[sources] class GraftV2Table(ident: Identifier, val dir: String,
                                    version: Long)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with org.apache.spark.sql.graftshim.GraftV1FallbackTable {

  private def spark = SparkSession.active

  override def name(): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  /** STREAMING BY NAME — `spark.readStream.table("gcat.ns.t")`: this
    * table does not implement the V2 MicroBatchStream surface; instead
    * it hands Spark the V1 fallback descriptor (the Delta pattern), so
    * streaming resolution re-enters the `graft` DataSource's existing
    * commit-version-offset Source with the table's path — one streaming
    * implementation under the path form and the catalog form. Reader
    * options (`readChangeFeed`, `startingVersion`, `keys`, …) merge in
    * from the DataStreamReader as usual.
    */
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable =
    org.apache.spark.sql.catalyst.catalog.CatalogTable(
      identifier = org.apache.spark.sql.catalyst.TableIdentifier(
        ident.name(), ident.namespace().lastOption),
      tableType = org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL,
      storage = org.apache.spark.sql.catalyst.catalog.CatalogStorageFormat(
        locationUri = Some(new org.apache.hadoop.fs.Path(dir).toUri),
        inputFormat = None, outputFormat = None, serde = None,
        compressed = false, properties = Map("path" -> dir)),
      schema = schema,
      provider = Some("graft"))

  override lazy val schema: StructType = TableLog.schemaAt(spark, dir, version)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER)

  override def properties(): util.Map[String, String] = {
    val p = TableLog.tablePropertiesAt(spark, dir, version)
    (p + (TableCatalog.PROP_LOCATION -> dir)).asJava
  }

  /** The declared `PARTITIONED BY` spec, round-tripped from the
    * `graft.partition.transforms` property — DESCRIBE/SHOW surfaces the
    * user's DDL intent even though the physical realization is the
    * clustering layout, not dir-per-value trees.
    */
  override def partitioning(): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    val props = TableLog.tablePropertiesAt(spark, dir, version)
    // CLUSTER BY DDL round-trips as the ClusterByTransform (DESCRIBE
    // shows Clustering Information, Spark's own rendering)
    if (props.get("graft.cluster.ddl").contains("true")) {
      val cols = props.get("graft.cluster.cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      if (cols.isEmpty) return Array.empty
      return Array(org.apache.spark.sql.connector.expressions.ClusterByTransform(
        cols.map(c => Expressions.column(c)
          .asInstanceOf[org.apache.spark.sql.connector.expressions.NamedReference])))
    }
    val spec = props.get("graft.partition.transforms")
    val withArg = """(\w+)\((\d+)\s*,\s*([^)]+)\)""".r
    val plain = """(\w+)\(([^)]+)\)""".r
    spec.toSeq.flatMap(_.split(",(?![^(]*\\))")).map(_.trim).filter(_.nonEmpty)
      .map {
        case withArg(fn, n, c) => Expressions.apply(fn,
          Expressions.literal(n.toInt), Expressions.column(c.trim))
        case plain(fn, c) => Expressions.apply(fn, Expressions.column(c.trim))
        case c => Expressions.identity(c)
      }.toArray
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(spark, dir, version, schema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(version == -1L,
      "graft catalog: cannot write to a time-travel snapshot")
    new GraftCatalogWriteBuilder(dir)
  }

  /** `DELETE FROM cat.ns.t WHERE …` — the stats-pruned CoW delete.
    * Untranslatable predicates refuse at ANALYSIS (canDeleteWhere)
    * rather than silently deleting more or less than asked.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftTableRelation.toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val pred = filters.flatMap(GraftTableRelation.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    TableLog.deleteWhere(spark, dir, pred)
    ()
  }
}

private[sources] class GraftScanBuilder(spark: SparkSession, dir: String,
                                        version: Long, full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var filters: Array[Filter] = Array.empty
  private var required: StructType = full

  // every filter re-applies above the scan (returned in full): pushdown
  // is the same pure pruning hint as the V1 connector's
  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs
  }
  override def pushedFilters(): Array[Filter] = filters

  override def pruneColumns(requiredSchema: StructType): Unit =
    // an empty projection (COUNT(*)) still needs one column to scan
    required =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(full.fields.take(1))

  override def build(): Scan =
    new GraftV1ScanAdapter(spark, dir, version, required, filters)
}

/** The V1 fallback scan: `toV1TableScan` hands Spark a TableScan whose
  * buildScan IS [[GraftTableRelation.buildScan]] with the pushed
  * filters and pruned columns — manifest stats pruning, bloom
  * point-lookup routing and dv anti-apply, one implementation across
  * all three SQL surfaces. Reports manifest statistics so joins
  * against small named tables auto-broadcast.
  */
private[sources] class GraftV1ScanAdapter(spark: SparkSession, dir: String,
                                          version: Long, required: StructType,
                                          filters: Array[Filter])
    extends V1Scan with SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def estimateStatistics(): Statistics = new Statistics {
    private val files = TableLog.liveFilesAt(spark, dir, version)
    override def sizeInBytes(): util.OptionalLong =
      if (files.nonEmpty && files.forall(_.bytes > 0L))
        util.OptionalLong.of(files.map(_.bytes).sum)
      else util.OptionalLong.empty()
    override def numRows(): util.OptionalLong =
      util.OptionalLong.of(files.map(f => f.rows - f.dv.length).sum)
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val inner = new GraftTableRelation(context, dir, version)
    val cols = required.fieldNames
    val fs = filters
    new BaseRelation with TableScan {
      override val sqlContext: SQLContext = context
      override val schema: StructType = required
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] = inner.buildScan(cols, fs)
    }.asInstanceOf[T]
  }
}

/** INSERT INTO (append) / INSERT OVERWRITE (truncate) / DataFrameWriterV2
  * `overwrite(cond)` (replaceWhere) — each one transactional commit.
  */
private[sources] class GraftCatalogWriteBuilder(dir: String)
    extends WriteBuilder with SupportsOverwrite {

  // append | truncate | replaceWhere(cond)
  private var mode: Either[Option[org.apache.spark.sql.Column], Unit] =
    Left(None) // Left(None)=append, Left(Some(c))=replaceWhere, Right(())=truncate

  override def truncate(): WriteBuilder = { mode = Right(()); this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    if (filters.forall(_.isInstanceOf[AlwaysTrue])) mode = Right(())
    else {
      val cols = filters.map(f => GraftTableRelation.toColumn(f).getOrElse(
        throw new UnsupportedOperationException(
          s"graft catalog: overwrite condition $f is not translatable — " +
            "use TableLog.replaceWhere for arbitrary predicates")))
      mode = Left(Some(cols.reduce(_ && _)))
    }
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
        val spark = data.sparkSession
        // declared clustering (PARTITIONED BY / graft.cluster.cols)
        // applies ON WRITE (round 18): each INSERT range-clusters its
        // batch so every landed file is a tight min/max box on the
        // layout columns and predicates prune from the FIRST commit,
        // not the first maintenance pass. No explicit partition count —
        // AQE sizes the exchange to the batch, so a small INSERT lands
        // one file, a 10 TB backfill fans out.
        val props = TableLog.tablePropertiesAt(spark, dir)
        // generated columns fill BEFORE the clustering exchange — a
        // generated PARTITION column (the days-from-timestamp pattern)
        // must hold its values when the layout shuffles on it; commit's
        // own fill then no-ops on this batch
        val filled = TableLog.generatedFill(data, props)
        val ccols = props.get("graft.cluster.cols").toSeq
          .flatMap(_.split(",")).map(_.trim)
          .filter(c => c.nonEmpty && filled.columns.contains(c))
        val laid =
          if (ccols.isEmpty) filled
          else filled
            .repartitionByRange(ccols.map(org.apache.spark.sql.functions.col): _*)
            .sortWithinPartitions(ccols.map(org.apache.spark.sql.functions.col): _*)
        mode match {
          case Right(()) => TableLog.overwrite(spark, dir, laid)
          case Left(Some(cond)) => TableLog.replaceWhere(spark, dir, laid, cond)
          case Left(None) => TableLog.append(spark, dir, laid)
        }
        ()
      }
  }
}

object GraftCatalog {
  /** Grace window before an `_replacing_*` RTAS backup is eligible for
    * crash recovery (restore-or-sweep) — long enough that no live
    * staged write is ever mistaken for a crash. Var for test clocks
    * only, like [[graft.sinks.TableLog.clockMs]].
    */
  @volatile var replacingGraceMs: Long = 6L * 3600L * 1000L
}
