package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sinks.TableLog

/** The SQL surface over the table log: format("graft") must read the
  * same snapshot as readAt, time-travel through both options, route
  * filter pushdown into the MANIFEST file prune (not just parquet
  * row groups), anti-apply deletion vectors, and work from plain SQL
  * via CREATE TEMPORARY VIEW … USING graft.
  */
class GraftTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def fixture(): String = {
    val dir = tmpDir("gts")
    val df = (1L to 1000L).map(k => (k, k * 1.0, s"p$k")).toDF("k", "price", "s")
      .repartitionByRange(8, col("k"))
    TableLog.append(spark, dir, df, statsCols = Seq("k"))             // v1
    TableLog.deleteWhere(spark, dir, col("k") === 500L, mode = "dv")  // v2
    TableLog.append(spark, dir,
      Seq((2000L, 2.0, "late")).toDF("k", "price", "s"), statsCols = Seq("k")) // v3
    dir
  }

  test("format(graft): latest snapshot == readAt, dv rows anti-applied") {
    val dir = fixture()
    val viaSql = spark.read.format("graft").load(dir)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    val viaApi = TableLog.readAt(spark, dir)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaApi)
    assert(!viaSql.contains(500L), "the dv'd row must not resurrect through SQL")
    assert(viaSql.contains(2000L))
  }

  test("format(graft): versionAsOf and timestampAsOf time-travel") {
    val dir = fixture()
    val v1 = spark.read.format("graft").option("versionAsOf", "1").load(dir)
    assert(v1.count() == 1000L, "v1 predates the dv delete and the late append")
    // the instant just after v2's commit resolves to v2
    val t2 = TableLog.history(spark, dir).apply(1).ts
    val atT2 = spark.read.format("graft")
      .option("timestampAsOf", t2.toString).load(dir)
    assert(atT2.count() == 999L)
    assert(atT2.filter(col("k") === 2000L).isEmpty)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "1")
        .option("timestampAsOf", t2.toString).load(dir).collect()
    }
  }

  test("format(graft): pushed filters prune MANIFEST files, results exact") {
    val dir = fixture()
    val q = spark.read.format("graft").load(dir)
      .filter(col("k").between(10L, 20L)).select("k", "s")
    val rows = q.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == (10L to 20L).map(k => (k, s"p$k")))
    val (read, total) = GraftTableSource.lastPrune.get
    assert(read < total, s"the k-range filter must prune files: $read/$total")
    // the connector's prune must equal the method API's on the same predicate
    val direct = TableLog.scanWhere(spark, dir, col("k").between(10L, 20L))
    assert((read, total) == ((direct.filesRead, direct.filesTotal)))
  }

  test("format(graft): column pruning reaches the parquet scan; count(*) works") {
    val dir = fixture()
    val one = spark.read.format("graft").load(dir).select("s")
    assert(one.columns.toSeq == Seq("s"))
    assert(one.count() == 1000L)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("price"),
      s"only the requested column may reach the scan:\n$plan")
    assert(spark.read.format("graft").load(dir).count() == 1000L,
      "an empty required-column set (count star) must plan")
  }

  test("write path: df.write.format(graft) lands transactional commits, SaveModes honored") {
    val dir = tmpDir("gts_write")
    val df1 = (1L to 100L).map(k => (k, s"p$k")).toDF("k", "s")
    df1.write.format("graft").option("statsCols", "k").save(dir)  // ErrorIfExists default
    assert(TableLog.currentVersion(spark, dir) == 1L)
    intercept[IllegalStateException] {
      df1.write.format("graft").save(dir)                          // exists → loud
    }
    df1.write.format("graft").mode("ignore").save(dir)             // exists → no-op
    assert(TableLog.currentVersion(spark, dir) == 1L)
    Seq((200L, "late")).toDF("k", "s").write.format("graft")
      .mode("append").option("statsCols", "k").save(dir)           // v2
    assert(TableLog.currentVersion(spark, dir) == 2L)
    assert(spark.read.format("graft").load(dir).count() == 101L)
    Seq((1L, "only")).toDF("k", "s").write.format("graft")
      .mode("overwrite").save(dir)                                 // v3
    assert(TableLog.readAt(spark, dir).count() == 1L)
    assert(TableLog.readAt(spark, dir, 2L).count() == 101L,
      "overwrite is a commit — old versions stay readable")
    // schema mismatch on append surfaces the table log's loud check
    intercept[IllegalArgumentException] {
      Seq((1, 2.0)).toDF("a", "b").write.format("graft").mode("append").save(dir)
    }
    // bloomCols ride into the parquet writer: point lookups can prune
    val dir2 = tmpDir("gts_write_bloom")
    (1L to 4000L).map(k => (k, s"p$k")).toDF("k", "s")
      .repartition(8, col("k")).write.format("graft")
      .mode("append").option("statsCols", "k")
      .option("bloomCols", "k").option("bloomNdv", "1000").save(dir2)
    val pl = TableLog.scanPointLookup(spark, dir2, "k", Seq(37L))
    assert(pl.filesRead < pl.filesTotal, s"blooms must prune: $pl")
  }

  test("CREATE TEMPORARY VIEW … USING graft: plain SQL over the table log") {
    val dir = fixture()
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tlog_sql USING graft " +
      s"OPTIONS (path '$dir', versionAsOf '2')")
    val viaView = spark.sql(
      "SELECT k, s FROM tlog_sql WHERE k BETWEEN 490 AND 510 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val viaApi = TableLog.readAt(spark, dir, 2L)
      .filter(col("k").between(490L, 510L)).select("k", "s").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaView == viaApi)
    assert(!viaView.exists(_._1 == 500L), "SQL must see the dv applied at v2")
    spark.sql("DROP VIEW tlog_sql")
  }

  test("unpinned view reads LATEST at query time; pinned stays pinned; mergeSchema evolves") {
    val dir = tmpDir("gts_latest")
    Seq((1L, "a")).toDF("k", "s").write.format("graft").save(dir)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tlive USING graft OPTIONS (path '$dir')")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tpin USING graft " +
      s"OPTIONS (path '$dir', versionAsOf '1')")
    assert(spark.table("tlive").count() == 1L)
    Seq((2L, "b")).toDF("k", "s").write.format("graft").mode("append").save(dir)
    assert(spark.table("tlive").count() == 2L,
      "an unpinned view must see new commits (Delta behavior)")
    assert(spark.table("tpin").count() == 1L, "a pinned view stays pinned")
    // mergeSchema: the write path reaches the append evolution arm
    Seq((3L, "c", 9.9)).toDF("k", "s", "score").write.format("graft")
      .mode("append").option("mergeSchema", "true").save(dir)
    val cols = spark.read.format("graft").load(dir).columns.toSeq
    assert(cols == Seq("k", "s", "score"))
    assert(spark.table("tlive").columns.toSeq == Seq("k", "s"),
      "a view created before the evolution keeps its declared schema")
    spark.sql("DROP VIEW tlive"); spark.sql("DROP VIEW tpin")
  }

  test("declared bloom columns route SQL equality/IN through the footer-bloom phase") {
    val dir = tmpDir("gts_bloom")
    // hash layout: every file spans ~the full key range, so min/max
    // stats prune NOTHING — only the bloom phase can cut the file list
    (1L to 4000L).map(k => (k, k % 13)).toDF("k", "grp")
      .repartition(8, col("grp"))
      .write.format("graft")
      .option("statsCols", "k").option("bloomCols", "k")
      .option("bloomNdv", "10000").save(dir)
    assert(TableLog.tablePropertiesAt(spark, dir)("graft.bloom.cols") == "k",
      "the write path must declare its bloom columns as a property")
    GraftTableSource.lastPrune = None
    val hit = spark.read.format("graft").load(dir).filter(col("k") === 42L)
    assert(hit.count() == 1L)
    val (read, total) = GraftTableSource.lastPrune.get
    assert(read < total,
      s"SQL equality on a declared bloom column must prune files ($read/$total)")
    // IN-list shape routes too; extra predicates still apply on top
    GraftTableSource.lastPrune = None
    val in2 = spark.read.format("graft").load(dir)
      .filter(col("k").isin(7L, 99L) && col("grp") >= 0L)
    assert(in2.count() == 2L)
    assert(GraftTableSource.lastPrune.exists(p => p._1 < p._2))
    // a table WITHOUT the property takes the stats-only path (no
    // speculative footer opens) and stays exact
    val plain = tmpDir("gts_plain")
    (1L to 100L).map(k => (k, s"v$k")).toDF("k", "s")
      .write.format("graft").option("statsCols", "k").save(plain)
    assert(spark.read.format("graft").load(plain)
      .filter(col("k") === 5L).count() == 1L)
    assert(TableLog.tablePropertiesAt(spark, plain).isEmpty)
    // steady-state writes do not spam property commits
    (4001L to 4002L).map(k => (k, k % 13)).toDF("k", "grp")
      .write.format("graft").mode("append")
      .option("statsCols", "k").option("bloomCols", "k").save(dir)
    assert(TableLog.history(spark, dir).count(_.op == "properties") == 1,
      "an unchanged bloom declaration must not re-commit")
  }

  test("clusterBy write option: range-clustered files carry tight stats and prune") {
    val dir = tmpDir("gts_cluster")
    (1L to 4000L).map(k => (k, s"v$k")).toDF("k", "s")
      .orderBy(rand(7))  // arrive unclustered
      .write.format("graft")
      .option("clusterBy", "k").option("clusterFiles", "8").save(dir)
    GraftTableSource.lastPrune = None
    val slice = spark.read.format("graft").load(dir)
      .filter(col("k").between(100L, 200L))
    assert(slice.count() == 101L)
    val (read, total) = GraftTableSource.lastPrune.get
    assert(total == 8 && read <= 2,
      s"range-clustered write must prune a bounded scan ($read/$total)")
  }

  test("sizeInBytes: manifest Σbytes reaches Catalyst; small graft tables auto-broadcast") {
    val dir = tmpDir("gts_size")
    (1L to 100L).map(k => (k, s"p$k")).toDF("k", "s")
      .write.format("graft").option("statsCols", "k").save(dir)
    val rel = spark.read.format("graft").load(dir)
    val manifestSum = TableLog.liveFilesAt(spark, dir).map(_.bytes).sum
    assert(manifestSum > 0L, "commits must record file sizes in the manifest")
    assert(rel.queryExecution.optimizedPlan.stats.sizeInBytes == BigInt(manifestSum),
      "the relation must report the manifest's byte sum to Catalyst")
    // a join against a big side: the statically-planned join must
    // BROADCAST the graft side on stats alone (no hint, no AQE rescue)
    val big = spark.range(10000000L).withColumnRenamed("id", "k")
    val plan = big.join(rel, "k").queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a KB-sized graft table must auto-broadcast:\n$plan")
    // CONSERVATIVE fallback: a legacy manifest without byte counts must
    // report the assume-the-worst default, never 0 (which would
    // broadcast a table of unknown — possibly 100 TB — size)
    val legacy = tmpDir("gts_size_legacy")
    Seq((1L, "a")).toDF("k", "s").write.format("graft").save(legacy)
    val mf = new java.io.File(legacy, "_log").listFiles()
      .filter(_.getName.endsWith(".json")).head
    val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
    java.nio.file.Files.write(mf.toPath,
      txt.replaceAll(""","bytes":\d+""", "").getBytes("UTF-8"))
    // the local FS keeps a checksum sidecar; the hand-edit invalidates it
    new java.io.File(mf.getParentFile, s".${mf.getName}.crc").delete()
    val legacyRel = spark.read.format("graft").load(legacy)
    assert(legacyRel.queryExecution.optimizedPlan.stats.sizeInBytes ==
      BigInt(spark.sessionState.conf.defaultSizeInBytes))
    val legacyPlan = big.join(legacyRel, "k").queryExecution.sparkPlan.toString
    assert(!legacyPlan.contains("BroadcastHashJoin"),
      s"unknown size must never auto-broadcast:\n$legacyPlan")
    // and DESCRIBE DETAIL still reports exact sizes via the stat sweep
    val detail = TableLog.describeDetail(spark, legacy).head()
    assert(detail.getAs[Long]("size_bytes") > 0L)
  }

  test("sizeInBytes carries through rewrites: CoW, compaction, clone") {
    val dir = tmpDir("gts_size_rw")
    (1L to 1000L).map(k => (k, k * 1.0)).toDF("k", "v")
      .repartitionByRange(4, col("k"))
      .write.format("graft").option("statsCols", "k").save(dir)
    TableLog.deleteWhere(spark, dir, col("k") <= 10L)          // CoW rewrite
    TableLog.compactSmallFiles(spark, dir, minFileMB = 1)      // compaction
    val files = TableLog.liveFilesAt(spark, dir)
    assert(files.nonEmpty && files.forall(_.bytes > 0L),
      "every rewrite path must keep recording sizes")
    val clone = tmpDir("gts_size_clone")
    TableLog.cloneShallow(spark, dir, clone)
    assert(TableLog.liveFilesAt(spark, clone).map(_.bytes).sum ==
      files.map(_.bytes).sum, "a shallow clone inherits the sizes verbatim")
  }

  test("batch readChangeFeed: connector CDF == readChanges, version bounds inclusive") {
    val dir = fixture() // v1 append 1000 rows, v2 dv-delete k=500, v3 append k=2000
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("k", "price", "s", "_change_type", "_commit_version")
        .collect().map(_.toString).sorted.toSeq
    val all = spark.read.format("graft")
      .option("readChangeFeed", "true").load(dir)
    assert(canon(all) == canon(TableLog.readChanges(spark, dir, 0L)))
    assert(all.count() == 1000L + 1L + 1L,
      "1000 v1 inserts + 1 v2 delete + 1 v3 insert")
    // startingVersion is INCLUSIVE (the streaming source's convention)
    val fromV2 = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "2").load(dir)
    assert(canon(fromV2) == canon(TableLog.readChanges(spark, dir, 1L)))
    assert(fromV2.count() == 2L)
    // endingVersion bounds the range; SQL predicates apply above
    val onlyV2 = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "2").option("endingVersion", "2").load(dir)
    assert(onlyV2.count() == 1L)
    assert(onlyV2.head().getAs[String]("_change_type") == "delete")
    assert(onlyV2.filter(col("k") === 500L).count() == 1L)
    // time-travel options are mutually exclusive with the feed
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("versionAsOf", "1").load(dir).collect()
    }
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF resolve graft targets") {
    val dir = fixture() // v1 1000 rows, v2 dv-deletes one, v3 appends one
    def cnt(sql: String): Long = spark.sql(sql).head().getLong(0)
    assert(cnt(s"SELECT count(*) AS c FROM graft.`$dir` VERSION AS OF 1") == 1000L)
    assert(cnt(s"SELECT count(*) AS c FROM graft.`$dir` VERSION AS OF 2") == 999L)
    assert(cnt(s"SELECT count(*) AS c FROM graft.`$dir`") == 1000L)
    // TIMESTAMP AS OF at v2's commit instant (UTC session)
    val ts2 = TableLog.history(spark, dir).find(_.version == 2L).get.ts
    val lit2 = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ts2), java.time.ZoneOffset.UTC)
      .toString.replace('T', ' ')
    assert(cnt(s"SELECT count(*) AS c FROM graft.`$dir` TIMESTAMP AS OF '$lit2'") == 999L)
    // the view form travels too, and stays unpinned for plain reads
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ttv USING graft OPTIONS (path '$dir')")
    assert(cnt("SELECT count(*) AS c FROM ttv VERSION AS OF 1") == 1000L)
    assert(cnt("SELECT count(*) AS c FROM ttv") == 1000L)
    // rows, not just counts: the pinned snapshot carries the deleted row
    assert(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1")
      .filter(col("k") === 500L).count() == 1L)
    assert(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 2")
      .filter(col("k") === 500L).isEmpty)
    // non-graft targets keep Spark's own rejection
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("tt_plain")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM tt_plain VERSION AS OF 1").collect()
    }
    spark.sql("DROP VIEW ttv"); spark.sql("DROP VIEW tt_plain")
  }

  test("batch readChangeFeed: _commit_version predicates prune the commits actually read") {
    val dir = fixture() // v1 append, v2 dv-delete, v3 append
    val feed = spark.read.format("graft").option("readChangeFeed", "true").load(dir)
    def readRange(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      GraftTableSource.lastFeedRange = None
      df.collect()
      GraftTableSource.lastFeedRange.get
    }
    // equality: exactly one commit's manifests/touch set read
    val one = feed.filter(col("_commit_version") === 2L)
    assert(readRange(one) == (1L, 2L), "v2 only")
    assert(one.count() == 1L && one.head().getAs[String]("_change_type") == "delete")
    // range: the suffix only
    val tail2 = feed.filter(col("_commit_version") >= 3L)
    assert(readRange(tail2) == (2L, 3L))
    // IN: min..max of the list
    assert(readRange(feed.filter(col("_commit_version").isin(2L, 3L))) == (1L, 3L))
    // bounds that exclude everything: zero commits read, empty result
    // (fresh frames per check — a Dataset plans once, and buildScan
    // runs at planning time)
    assert(feed.filter(col("_commit_version") > 99L).count() == 0L)
    val noneR = readRange(feed.filter(col("_commit_version") > 99L))
    assert(noneR._2 <= noneR._1)
    // data-column filters don't narrow the range (they apply above)
    assert(readRange(feed.filter(col("k") === 500L)) == (0L, 3L))
    // results identical to the unpruned feed + filter
    assert(one.collect().map(_.toString).sorted.toSeq ==
      feed.collect().filter(_.getAs[Long]("_commit_version") == 2L)
        .map(_.toString).sorted.toSeq)
  }

  test("batch readChangeFeed startingTimestamp: earliest commit at-or-after the instant") {
    val dir = fixture() // v1, v2, v3 — commit instants strictly increasing
    val hist = TableLog.history(spark, dir)
    val ts2 = hist.find(_.version == 2L).get.ts
    def feedFrom(ts: Long) = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingTimestamp", ts.toString)
      .load(dir)
    // exactly v2's instant → v2 inclusive (== startingVersion 2)
    assert(feedFrom(ts2).count() == 2L)
    // one ms past v2 → v3 only
    assert(feedFrom(ts2 + 1L).count() == 1L)
    // before everything → whole history
    assert(feedFrom(hist.map(_.ts).min - 1L).count() == 1002L)
    // past the last commit: a batch feed refuses loudly (an empty
    // answer would read as "nothing ever changed")
    val late = intercept[IllegalArgumentException] {
      feedFrom(hist.map(_.ts).max + 1L).collect()
    }
    assert(late.getMessage.contains("after the table's last commit"))
    // startingVersion + startingTimestamp are mutually exclusive
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("startingVersion", "2").option("startingTimestamp", ts2.toString)
        .load(dir).collect()
    }
  }

  test("batch readChangeFeed with keys: update pre/post pairs through SQL") {
    val dir = tmpDir("gts_cdf_keys")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      .write.format("graft").option("statsCols", "k").save(dir)     // v1
    TableLog.mergeInto(spark, dir, Seq((2L, "B"), (3L, "c")).toDF("k", "s"),
      keys = Seq("k"))                                              // v2
    val keyed = spark.read.format("graft")
      .option("readChangeFeed", "true").option("keys", "k").load(dir)
    val v2 = keyed.filter(col("_commit_version") === 2L)
      .select("k", "s", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(v2 == Set((2L, "b", "update_preimage"), (2L, "B", "update_postimage"),
      (3L, "c", "insert")))
    // plain SQL reaches the same feed through a view
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tcdf USING graft " +
      s"OPTIONS (path '$dir', readChangeFeed 'true', keys 'k')")
    assert(spark.sql("SELECT count(*) FROM tcdf WHERE _change_type LIKE 'update%'")
      .head().getLong(0) == 2L)
    spark.sql("DROP VIEW tcdf")
  }

  test("replaceWhere write carries bloomCols into the replacement files") {
    val dir = tmpDir("gts_rw_bloom")
    // v1: NO blooms declared anywhere (the property does not exist yet)
    (1L to 2000L).map(k => (k, 0.0)).toDF("k", "v").repartition(4, col("k"))
      .write.format("graft").option("statsCols", "k").save(dir)
    // v2: replace the whole table WITH bloomCols — the replacement
    // files themselves must carry the blooms (dropping writeOpts here
    // would leave the declared property pointing at bloom-less files)
    (1L to 2000L).map(k => (k, 1.0)).toDF("k", "v").repartition(4, col("k"))
      .write.format("graft").mode("overwrite")
      .option("replaceWhere", "k >= 1")
      .option("statsCols", "k")
      .option("bloomCols", "k").option("bloomNdv", "4000").save(dir)
    assert(TableLog.readAt(spark, dir).agg(sum("v")).head().getDouble(0) == 2000.0)
    val pr = TableLog.scanPointLookup(spark, dir, "k", Seq(37L))
    assert(pr.filesRead < pr.filesTotal,
      s"the replacement files must carry blooms: ${pr.filesRead}/${pr.filesTotal}")
  }

  test("INSERT INTO … USING graft view lands transactional commits") {
    val dir = tmpDir("gts_insert")
    Seq((1L, "a")).toDF("k", "s").write.format("graft").save(dir)   // v1
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tins USING graft OPTIONS (path '$dir')")
    spark.sql("INSERT INTO tins VALUES (2, 'b'), (3, 'c')")          // v2
    assert(TableLog.currentVersion(spark, dir) == 2L)
    assert(TableLog.readAt(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    spark.sql("INSERT OVERWRITE tins VALUES (9, 'z')")               // v3
    assert(TableLog.readAt(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((9L, "z")))
    assert(TableLog.readAt(spark, dir, 2L).count() == 3L,
      "INSERT OVERWRITE is a commit — history stays readable")
    spark.sql("DROP VIEW tins")
  }
}
