package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Round 19: type widening (`ALTER COLUMN … TYPE`, manifest-only) and
  * deletion-vector materialization (`REORG TABLE … APPLY (PURGE)`).
  */
class TableLogWidenPurgeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  /** Live (path → AddFile) at the current version, folded from history
    * — what a reader would scan, dv included.
    */
  private def liveEntries(dir: String): Map[String, TableLog.AddFile] =
    TableLog.history(spark, dir).foldLeft(Map.empty[String, TableLog.AddFile]) {
      (live, c) => live -- c.remove ++ c.add.map(a => a.path -> a)
    }

  test("int→long widen is manifest-only; old files promote, wide rows land") {
    val dir = tmpDir("tlw")
    TableLog.append(spark, dir,
      Seq((1, 10.0), (2, 20.0)).toDF("id", "v"), statsCols = Seq("id"))
    val before = liveEntries(dir)
    val v = TableLog.alterColumnType(spark, dir, "id", LongType)
    val widenCommit = TableLog.history(spark, dir).find(_.version == v).get
    assert(widenCommit.op == "widen" && widenCommit.add.isEmpty &&
      widenCommit.remove.isEmpty, "widen must move zero files")
    assert(liveEntries(dir) == before, "live file set unchanged")
    val read = TableLog.readAt(spark, dir)
    assert(read.schema("id").dataType == LongType)
    assert(read.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // a value no int can hold lands and reads back
    TableLog.append(spark, dir,
      Seq((5000000000L, 30.0)).toDF("id", "v"), statsCols = Seq("id"))
    assert(TableLog.readAt(spark, dir)
      .filter(col("id") === 5000000000L).count() == 1L)
    // stats pruning still answers across mixed narrow/wide files: the
    // wide-value point lookup skips the pre-widen file
    val scan = TableLog.scanWhere(spark, dir, col("id") === 5000000000L)
    assert(scan.filesRead < scan.filesTotal,
      s"prune must skip the narrow file: ${scan.filesRead}/${scan.filesTotal}")
    assert(scan.df.count() == 1L)
    // appends still arrive in the TABLE's (wide) type, loudly
    intercept[Exception] {
      TableLog.append(spark, dir, Seq((7, 70.0)).toDF("id", "v"))
    }
    // CoW update reads narrow files through the promotion and re-lands
    // them wide
    TableLog.updateWhere(spark, dir, col("id") === 1L,
      Map("v" -> lit(11.0)), statsCols = Seq("id"))
    assert(TableLog.readAt(spark, dir).filter(col("id") === 1L)
      .select("v").as[Double].head() == 11.0)
    // the change feed ACROSS the widen coerces the narrow commits up —
    // one wide-typed feed, no loud failure, no double-emits
    val ch = TableLog.readChanges(spark, dir, 0L)
    assert(ch.schema("id").dataType == LongType, ch.schema.simpleString)
    assert(ch.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq
      .containsSlice(Seq(1L, 2L, 5000000000L)))
  }

  test("nested field widen: payload.qty int→long through the struct chain") {
    val dir = tmpDir("tlwn")
    TableLog.append(spark, dir,
      Seq((1L, (5, "a")), (2L, (7, "b"))).toDF("id", "p")
        .select(col("id"),
          struct(col("p._1").as("qty"), col("p._2").as("tag")).as("payload")),
      statsCols = Seq("id"))
    TableLog.alterColumnType(spark, dir, "payload.qty", LongType)
    val read = TableLog.readAt(spark, dir)
    assert(read.schema("payload").dataType.asInstanceOf[StructType]("qty")
      .dataType == LongType)
    assert(read.select("payload.qty").as[Long].collect().sorted.toSeq ==
      Seq(5L, 7L))
    // nested UPDATE through the widened field still rebuilds in place
    TableLog.updateWhere(spark, dir, col("id") === 2L,
      Map("payload.qty" -> lit(5000000000L)), statsCols = Seq("id"))
    assert(read.sparkSession != null) // (read is immutable; re-read below)
    assert(TableLog.readAt(spark, dir).filter(col("id") === 2L)
      .select("payload.qty").as[Long].head() == 5000000000L)
  }

  test("widen composes with column mapping: renamed struct, widened leaf") {
    val dir = tmpDir("tlwcm")
    TableLog.append(spark, dir,
      Seq((1L, (5, "a"))).toDF("id", "p")
        .select(col("id"),
          struct(col("p._1").as("qty"), col("p._2").as("tag")).as("payload")),
      statsCols = Seq("payload.qty"))
    // rename first (colmap pins the physical name), then widen the
    // renamed leaf — the scan must promote the OLD physical int pages
    // through the mapping's positional cast
    TableLog.renameColumn(spark, dir, "payload", "body")
    TableLog.alterColumnType(spark, dir, "body.qty", LongType)
    TableLog.append(spark, dir,
      Seq((2L, (6000000000L, "b"))).toDF("id", "p")
        .select(col("id"),
          struct(col("p._1").as("qty"), col("p._2").as("tag")).as("body")),
      statsCols = Seq("body.qty"))
    val out = TableLog.readAt(spark, dir).select("id", "body.qty")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 5L, 2L -> 6000000000L), out.toString)
  }

  test("column comments set, survive appends, and clear") {
    val dir = tmpDir("tlcmt")
    TableLog.append(spark, dir, Seq((1L, "a")).toDF("k", "s"),
      statsCols = Seq("k"))
    TableLog.setColumnComment(spark, dir, "k", Some("the key"))
    def commentOf(c: String): Option[String] =
      org.apache.spark.sql.types.DataType
        .fromJson(TableLog.history(spark, dir).last.schemaJson)
        .asInstanceOf[StructType](c).getComment()
    assert(commentOf("k").contains("the key"))
    // schema continuity: a later append must not strip it
    TableLog.append(spark, dir, Seq((2L, "b")).toDF("k", "s"),
      statsCols = Seq("k"))
    assert(commentOf("k").contains("the key"), "append stripped the comment")
    TableLog.setColumnComment(spark, dir, "k", None)
    assert(commentOf("k").isEmpty)
    // SQL route through the catalog
    val root = tmpDir("tlcmtcat")
    spark.conf.set("spark.sql.catalog.cmtcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cmtcat.root", root)
    try {
      spark.sql("CREATE NAMESPACE cmtcat.ns")
      spark.sql("CREATE TABLE cmtcat.ns.t (k BIGINT, s STRING) USING graft")
      spark.sql("ALTER TABLE cmtcat.ns.t ALTER COLUMN s COMMENT 'freeform'")
      val desc = spark.sql("DESCRIBE TABLE cmtcat.ns.t").collect()
        .map(r => (r.getString(0), r.getString(2))).toMap
      assert(desc.get("s").contains("freeform"), desc.toString)
    } finally {
      spark.conf.unset("spark.sql.catalog.cmtcat")
      spark.conf.unset("spark.sql.catalog.cmtcat.root")
    }
  }

  test("decimal widen rescales: (10,2) → (20,4) keeps values exact") {
    val dir = tmpDir("tlwd")
    TableLog.append(spark, dir,
      Seq("12.34", "56.78").toDF("s")
        .select(col("s").cast(DecimalType(10, 2)).as("m")),
      statsCols = Seq("m"))
    TableLog.alterColumnType(spark, dir, "m", DecimalType(20, 4))
    val out = TableLog.readAt(spark, dir)
    assert(out.schema("m").dataType == DecimalType(20, 4))
    assert(out.select(sum("m")).as[java.math.BigDecimal].head()
      .compareTo(new java.math.BigDecimal("69.12")) == 0)
  }

  test("widen refusals: narrowing, lossy, identity, generated, transform, constraint") {
    val dir = tmpDir("tlwr")
    TableLog.append(spark, dir,
      Seq((1L, 2, "x")).toDF("big", "small", "s"), statsCols = Seq("big"))
    def refuse(name: String, t: DataType, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        TableLog.alterColumnType(spark, dir, name, t)
      }
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    refuse("big", IntegerType, "not a safe widening")   // narrowing
    refuse("big", DoubleType, "not a safe widening")    // 2^53 truncation
    refuse("s", LongType, "not a safe widening")        // cross-family
    refuse("big", LongType, "already")                  // no-op
    TableLog.setTableProperties(spark, dir,
      Map("graft.identity.cols" -> "small:1:1:true"))
    refuse("small", LongType, "IDENTITY")
    TableLog.unsetTableProperties(spark, dir, Seq("graft.identity.cols"))
    TableLog.setTableProperties(spark, dir, Map("graft.generated.cols" ->
      TableLog.encodeGeneratedCols(Seq("s" -> "cast(small as string)"))))
    refuse("small", LongType, "GENERATED")
    TableLog.unsetTableProperties(spark, dir, Seq("graft.generated.cols"))
    TableLog.setTableProperties(spark, dir,
      Map("graft.partition.transforms" -> "bucket(8, small)"))
    refuse("small", LongType, "bucket")
    TableLog.unsetTableProperties(spark, dir, Seq("graft.partition.transforms"))
    TableLog.addCheckConstraint(spark, dir, "small_pos", "small >= 0")
    refuse("small", LongType, "small_pos")
    TableLog.dropCheckConstraint(spark, dir, "small_pos")
    TableLog.alterColumnType(spark, dir, "small", LongType) // now clean
    assert(TableLog.readAt(spark, dir).schema("small").dataType == LongType)
  }

  test("reorgPurge rewrites only dv carriers; multiset unchanged; CDF empty") {
    val dir = tmpDir("tlpg")
    TableLog.append(spark, dir,
      (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "s").repartition(1),
      statsCols = Seq("k"))
    TableLog.append(spark, dir,
      (101 to 200).map(i => (i.toLong, s"r$i")).toDF("k", "s").repartition(1),
      statsCols = Seq("k"))
    TableLog.deleteWhere(spark, dir, col("k").isin(150L, 160L), mode = "dv")
    val pre = liveEntries(dir)
    val (dvPaths, cleanPaths) =
      (pre.filter(_._2.dv.nonEmpty).keySet, pre.filter(_._2.dv.isEmpty).keySet)
    assert(dvPaths.nonEmpty && cleanPaths.nonEmpty, pre.keys.toString)
    val vBefore = TableLog.currentVersion(spark, dir)
    val v = TableLog.reorgPurge(spark, dir, statsCols = Seq("k"))
    assert(v > vBefore)
    val post = liveEntries(dir)
    assert(post.values.forall(_.dv.isEmpty), "no live dv after purge")
    assert(cleanPaths.subsetOf(post.keySet), "clean files carried verbatim")
    assert(dvPaths.forall(p => !post.contains(p)), "dv files retired")
    val ks = TableLog.readAt(spark, dir).select("k").as[Long].collect().toSet
    assert(ks == (1L to 200L).toSet -- Set(150L, 160L))
    // the purge commit's change feed is EMPTY (maintenance, not data)
    assert(TableLog.readChanges(spark, dir, vBefore, v).count() == 0L)
    // idempotent: nothing left to purge → same version, no empty commit
    assert(TableLog.reorgPurge(spark, dir) == v)
  }

  test("reorgPurge WHERE scopes to the band's dv files only") {
    val dir = tmpDir("tlpgw")
    TableLog.append(spark, dir,
      (1 to 50).map(i => (i.toLong, s"a$i")).toDF("k", "s").repartition(1),
      statsCols = Seq("k"))
    TableLog.append(spark, dir,
      (1001 to 1050).map(i => (i.toLong, s"b$i")).toDF("k", "s").repartition(1),
      statsCols = Seq("k"))
    TableLog.deleteWhere(spark, dir, col("k").isin(10L, 1010L), mode = "dv")
    val dvBefore = liveEntries(dir).filter(_._2.dv.nonEmpty)
    assert(dvBefore.size == 2, dvBefore.keys.toString)
    TableLog.reorgPurge(spark, dir, where = Some(col("k") < 100L),
      statsCols = Seq("k"))
    val post = liveEntries(dir)
    val stillDv = post.filter(_._2.dv.nonEmpty)
    // the high band's dv file is untouched; the low band's is gone
    assert(stillDv.keySet == dvBefore.filter(_._2.stats.exists {
      case (_, TableLog.NumStat(lo, _)) => lo >= 1000.0
      case _ => false
    }).keySet, stillDv.keys.toString)
    assert(TableLog.readAt(spark, dir).count() == 98L)
  }

  test("SQL surface: REORG TABLE APPLY (PURGE) and ALTER COLUMN TYPE") {
    val dir = tmpDir("tlsql")
    TableLog.append(spark, dir,
      (1 to 40).map(i => (i, s"r$i")).toDF("k", "s").repartition(1),
      statsCols = Seq("k"))
    TableLog.deleteWhere(spark, dir, col("k") === 7, mode = "dv")
    val out = spark.sql(s"REORG TABLE graft.`$dir` APPLY (PURGE)").collect()
    assert(out.head.getString(1) == "purge", out.toSeq.toString)
    assert(liveEntries(dir).values.forall(_.dv.isEmpty))
    assert(TableLog.readAt(spark, dir).count() == 39L)
    // catalog route: ALTER COLUMN TYPE through Spark's own DDL
    val root = tmpDir("tlsqlcat")
    spark.conf.set("spark.sql.catalog.wpcat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wpcat.root", root)
    try {
      spark.sql("CREATE NAMESPACE wpcat.ns")
      spark.sql("CREATE TABLE wpcat.ns.t (k INT, s STRING) USING graft")
      spark.sql("INSERT INTO wpcat.ns.t VALUES (1, 'a'), (2, 'b')")
      spark.sql("ALTER TABLE wpcat.ns.t ALTER COLUMN k TYPE BIGINT")
      val df = spark.sql("SELECT * FROM wpcat.ns.t")
      assert(df.schema("k").dataType == LongType)
      spark.sql("INSERT INTO wpcat.ns.t VALUES (5000000000, 'c')")
      assert(spark.sql(
        "SELECT s FROM wpcat.ns.t WHERE k = 5000000000").collect()
        .map(_.getString(0)).toSeq == Seq("c"))
    } finally {
      spark.conf.unset("spark.sql.catalog.wpcat")
      spark.conf.unset("spark.sql.catalog.wpcat.root")
    }
  }
}
