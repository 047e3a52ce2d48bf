package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.GraftTableSource

/** The change feed's PLAN shape — the two r15 scale fixes pinned:
  * (1) the KEYED feed emits pre/post/insert/delete in ONE pass over the
  * pairing join (an inline array+explode), where the old four-union
  * form re-evaluated the join per branch; (2) a batch read over a LONG
  * commit range folds per-chunk and re-roots each chunk as a leaf, so
  * the driver plan is O(range / 64) wide instead of one union branch
  * per commit — a 10⁵-commit replay plans flat. Short ranges keep the
  * fully-transparent direct union.
  */
class TableLogCdfPlanSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("keyed feed builds exactly ONE pairing join per commit (single-pass emission)") {
    val dir = tmpDir("cdfplan_onejoin")
    TableLog.append(spark, dir,
      (1L to 20L).map(k => (k, s"v$k")).toDF("k", "s"))                           // v1
    TableLog.updateWhere(spark, dir, col("k") <= 5L, set = Map("s" -> lit("U"))) // v2
    val keyed = TableLog.readChanges(spark, dir, 1L, 2L, keys = Seq("k"))
    val joins = keyed.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.length == 1,
      s"one commit's keyed feed must plan exactly one join, got ${joins.length}")
    // and the single pass emits the same multiset the four-union form did
    val got = keyed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == (1L to 5L).flatMap(k =>
      Seq((k, s"v$k", "update_preimage"), (k, "U", "update_postimage"))).toSet,
      s"got $got")
  }

  test("long commit ranges plan flat: chunked fold caps plan width; rows and evolution exact") {
    val dir = tmpDir("cdfplan_chunks")
    TableLog.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))  // v1
    // 70 marker-only commits: the cheap way to a >CdfChunkCommits range
    (1 to 70).foreach(i => TableLog.commitTxnMarker(spark, dir, "chunker", i.toLong))
    // schema evolution INSIDE the range: the last commit adds a column,
    // so cross-chunk alignment must null-fill the earlier chunk
    TableLog.append(spark, dir,
      Seq((9L, "z", 1.5)).toDF("k", "s", "w"), mergeSchema = true)         // v72
    val feed = TableLog.readChanges(spark, dir, 0L)
    val leaves = feed.queryExecution.analyzed.collectLeaves().length
    assert(leaves <= 4,
      s"a 72-commit range must fold to O(range/64) leaves, got $leaves")
    val rows = feed.collect().map(r =>
      (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("s")),
        Option(r.get(r.fieldIndex("w"))),
        r.getString(r.fieldIndex("_change_type")),
        r.getLong(r.fieldIndex("_commit_version")))).toSet
    assert(rows == Set(
      (1L, "a", None, "insert", 1L),
      (2L, "b", None, "insert", 1L),
      (9L, "z", Some(1.5), "insert", 72L)), s"got $rows")
    // the short-range path is untouched: a 2-commit slice unions directly
    val short = TableLog.readChanges(spark, dir, 70L)
    assert(short.collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("the connector's batch CDF read rides the chunked fold on long ranges") {
    val dir = tmpDir("cdfplan_conn")
    TableLog.append(spark, dir, Seq((1L, "a")).toDF("k", "s"))
    (1 to 70).foreach(i => TableLog.commitTxnMarker(spark, dir, "connchunk", i.toLong))
    TableLog.append(spark, dir, Seq((2L, "b")).toDF("k", "s"))
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
    val rows = feed.collect().map(r =>
      (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(rows == Set((1L, "insert", 1L), (2L, "insert", 72L)), s"got $rows")
    // and a `_commit_version` predicate still narrows BELOW the chunk
    // threshold — version pruning beats plan folding when it applies
    GraftTableSource.lastFeedRange = None
    val one = feed.filter(col("_commit_version") === 72L).collect()
    assert(one.length == 1 && one.head.getLong(0) == 2L)
    assert(GraftTableSource.lastFeedRange.contains((71L, 72L)),
      s"version pushdown must precede chunking: ${GraftTableSource.lastFeedRange}")
  }

  test("streamed keyed feed equals the batch readChanges(keys=…) union") {
    val dir = tmpDir("cdfplan_stream")
    TableLog.append(spark, dir,
      (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v"),
      statsCols = Seq("k"))                                                   // v1
    TableLog.updateWhere(spark, dir, col("k") === 3L, set = Map("v" -> lit(99.0))) // v2
    TableLog.deleteWhere(spark, dir, col("k") === 7L, mode = "dv")            // v3
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    graft.streaming.EventStreams.changeFeedStream(spark, dir,
      tmpDir("cdfplan_ckpt"),
      (changes, _) => seen.synchronized {
        seen ++= changes.collect().map(_.toSeq)
      },
      keys = Seq("k"))
    val batch = TableLog.readChanges(spark, dir, 0L, keys = Seq("k"))
      .collect().map(_.toSeq)
    assert(seen.toSet == batch.toSet,
      s"streamed keyed slices must union to the batch keyed feed:\n${seen.toSet}\nvs\n${batch.toSet}")
    assert(seen.exists(_.contains("update_preimage")) &&
      seen.exists(_.contains("update_postimage")),
      "the stream must carry paired update images")
  }
}
