package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataSinkSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: last version wins, updates beat current on ties, new keys insert") {
    val cur = Seq((1L, "a", 1L), (2L, "b", 1L), (4L, "d", 9L)).toDF("k", "v", "version")
    val upd = Seq((2L, "b2", 2L), (3L, "c", 1L), (1L, "a-tie", 1L), (4L, "d-old", 3L))
      .toDF("k", "v", "version")
    val out = DataSink.upsert(cur, upd, Seq("k"), "version")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a-tie", 2L -> "b2", 3L -> "c", 4L -> "d"))
  }

  test("applyChangelog: winner per key, D deletes, I/U upsert, untouched keys pass") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a1", "I", 1L), (1L, "a2", "U", 3L),        // k1 → a2 (U@3 wins)
      (2L, "zombie", "U", 2L), (2L, "x", "D", 5L),      // k2 → deleted (D@5 wins)
      (4L, "d", "I", 1L),                               // k4 → inserted
      (5L, "e", "U", 2L), (5L, "gone", "D", 2L)         // k5: tie → D outranks U
    ).toDF("k", "v", "op", "version")
    val out = DataSink.applyChangelog(snap, changes, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a2", 3L -> "c", 4L -> "d"))
  }

  test("applyChangelog drops null-keyed/null-versioned changes; rejects unknown ops and bad schemas") {
    val snap = Seq((1L, "a")).toDF("k", "v")
    val nulls = Seq(
      (Option.empty[Long], Some("x"), "U", Some(9L)),
      (Some(1L), Some("y"), "U", Option.empty[Long])
    ).toDF("k", "v", "op", "version")
    val out = DataSink.applyChangelog(snap, nulls, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a")) // both changes dropped, snapshot intact

    val badOp = Seq((1L, "x", "Z", 1L)).toDF("k", "v", "op", "version")
    val e = intercept[Exception] {
      DataSink.applyChangelog(snap, badOp, Seq("k")).collect()
    }
    assert(e.getMessage.contains("unknown op"))

    val badCols = Seq((1L, "x", 1L)).toDF("k", "v", "version") // missing op
    intercept[IllegalArgumentException] {
      DataSink.applyChangelog(snap, badCols, Seq("k"))
    }
  }

  test("compactChangelog keeps D tombstones and is idempotent") {
    val changes = Seq(
      (1L, "a1", "U", 1L), (1L, "a2", "U", 7L),
      (2L, "x", "D", 5L), (2L, "old", "U", 3L)
    ).toDF("k", "v", "op", "version")
    val once = DataSink.compactChangelog(changes, Seq("k"))
    val got = once.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set((1L, "a2", "U", 7L), (2L, "x", "D", 5L)))
    // compacting a compacted log is a no-op (the streaming state merge
    // relies on this: state ∪ batch re-compacts every micro-batch)
    val twice = DataSink.compactChangelog(once, Seq("k")).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(twice == got)
  }

  test("upsert rejects mismatched schemas") {
    val cur = Seq((1L, "a")).toDF("k", "v")
    val upd = Seq((1L, "a", 2L)).toDF("k", "v", "version")
    intercept[IllegalArgumentException] { DataSink.upsert(cur, upd, Seq("k"), "version") }
  }

  test("upsert preserves column order and chains: upsert(upsert(...)) with non-prefix keys") {
    // the output used to come back keys-first, so feeding one upsert's
    // output (a written snapshot) into the next with the ORIGINAL column
    // order failed on round 3 of any streaming merge whose keys are not
    // the schema prefix
    val cur = Seq((10L, 1L, "a", 1L), (11L, 2L, "b", 1L)).toDF("id", "k", "v", "version")
    val upd1 = Seq((12L, 2L, "b2", 2L)).toDF("id", "k", "v", "version")
    val r1 = DataSink.upsert(cur, upd1, Seq("k"), "version")
    assert(r1.columns.toSeq == Seq("id", "k", "v", "version"))
    val upd2 = Seq((13L, 3L, "c", 1L)).toDF("id", "k", "v", "version")
    val r2 = DataSink.upsert(r1, upd2, Seq("k"), "version") // must not throw
    assert(r2.collect().map(r => r.getLong(1) -> r.getString(2)).toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // and differently-ORDERED (same-set) updates are accepted by name
    val reordered = Seq(("d", 4L, 1L, 14L)).toDF("v", "k", "version", "id")
    assert(DataSink.upsert(cur, reordered, Seq("k"), "version").count() == 3)
  }

  test("partitioned parquet write round-trips with pruning-friendly layout") {
    val dir = Files.createTempDirectory("sink").toFile.getAbsolutePath
    val df = Seq((1L, "2026-01-01", 5.0), (2L, "2026-01-02", 6.0), (3L, "2026-01-01", 7.0))
      .toDF("id", "day", "x")
    DataSink.writeParquet(df, s"$dir/t", partitionBy = Seq("day"))
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 3)
    assert(new java.io.File(s"$dir/t").list().count(_.startsWith("day=")) == 2)
    // append mode adds rows instead of replacing
    DataSink.writeParquet(df.filter(col("id") === 1L), s"$dir/t",
      partitionBy = Seq("day"), mode = org.apache.spark.sql.SaveMode.Append)
    assert(spark.read.parquet(s"$dir/t").count() == 4)
  }

  test("ORC write round-trips typed data; scan gets pushdown + pruned read schema") {
    val dir = Files.createTempDirectory("sink").toFile.getAbsolutePath
    val df = (1L to 100L).map(i => (i, i.toInt % 7, s"s$i", i * 1.5))
      .toDF("id", "grp", "name", "x")
    DataSink.writeOrc(df, s"$dir/t")
    val back = spark.read.orc(s"$dir/t")
    // type + value fidelity (ORC carries its own schema — no parse step)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy(col("id")).collect().toSeq ==
      df.orderBy(col("id")).collect().toSeq)
    // the scan must push the predicate into the ORC reader and prune the
    // read schema to the projected columns — same machinery parquet gets
    val q = back.filter(col("id") === 42L).select(col("id"), col("x"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"expected pushed ORC filter in:\n$plan")
    assert(!plan.contains("name"), s"read schema not pruned:\n$plan")
    assert(q.collect().map(_.getDouble(1)).toSeq == Seq(63.0))
    // partitioned ORC lays out directory keys for pruning, like parquet
    DataSink.writeOrc(df, s"$dir/p", partitionBy = Seq("grp"))
    assert(new java.io.File(s"$dir/p").list().count(_.startsWith("grp=")) == 7)
    assert(spark.read.orc(s"$dir/p").count() == 100)
  }

  test("writeZOrdered: y-only predicate overlaps far fewer files than a lexicographic sort") {
    val dir = Files.createTempDirectory("sink").toFile.getAbsolutePath
    // 64×64 grid — every (x, y) cell once, plus a null-y row (bucket 0)
    val grid = (0 until 4096).map(i => (i.toLong, (i % 64).toDouble, (i / 64).toDouble))
      .toDF("id", "x", "y")
      .union(Seq((9999L, 1.0, Double.NaN)).toDF("id", "x", "y")
        .withColumn("y", lit(null).cast("double")))
    // lexicographic (x, y) sort: the single-sort-prefix layout
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y").write.parquet(s"$dir/lex")
    DataSink.writeZOrdered(grid, s"$dir/z", Seq("x", "y"), bitsPerCol = 6,
      targetFiles = 16)

    // footer min-max stats are what row-group pruning consults — count
    // files whose y-range overlaps a y-only box on each layout
    def overlapping(path: String, lo: Double, hi: Double): (Int, Int) = {
      val parts = new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val hit = parts.count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("y")), max(col("y"))).head()
        !r.isNullAt(0) && r.getDouble(0) <= hi && r.getDouble(1) >= lo
      }
      (hit, parts.length)
    }
    val (lexHit, lexAll) = overlapping(s"$dir/lex", 8.0, 15.0)
    val (zHit, zAll) = overlapping(s"$dir/z", 8.0, 15.0)
    assert(lexAll == 16 && zAll == 16)
    assert(lexHit == 16, s"lexicographic files all span full y, got $lexHit")
    assert(zHit <= 6, s"z-order should confine the y-box to few files, got $zHit")
    // data intact and filters still correct on the clustered layout
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == 4097)
    assert(back.filter(col("y") >= 8.0 && col("y") <= 15.0 && col("x") === 3.0)
      .count() == 8)
    // guards: 1 column, colliding internal name, too many bits
    intercept[IllegalArgumentException] {
      DataSink.writeZOrdered(grid, s"$dir/bad", Seq("x"))
    }
    intercept[IllegalArgumentException] {
      DataSink.writeZOrdered(grid.withColumnRenamed("id", "_zval"),
        s"$dir/bad", Seq("x", "y"))
    }
    intercept[IllegalArgumentException] {
      DataSink.writeZOrdered(grid, s"$dir/bad", Seq("x", "y"), bitsPerCol = 32)
    }
  }

  test("writeZOrdered on STRING columns: monotone prefix bucketing, string boxes prune") {
    // a tenant×day grid of string keys — the layout shape date-string
    // partitioned event tables want; before r17, approxQuantile refused
    // StringType outright
    val dir = Files.createTempDirectory("sink").toFile.getAbsolutePath
    val grid = (0 until 4096).map { i =>
      (i.toLong, f"tenant_${i % 64}%02d", f"2026-d${i / 64}%02d")
    }.toDF("id", "tenant", "day")
    DataSink.writeZOrdered(grid, s"$dir/zs", Seq("tenant", "day"),
      bitsPerCol = 6, targetFiles = 16)
    // a day-only box overlaps few files (the y-box discipline, strings)
    val parts = new java.io.File(s"$dir/zs").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val hit = parts.count { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("day")), max(col("day"))).head()
      !r.isNullAt(0) && r.getString(0) <= "2026-d15" && r.getString(1) >= "2026-d08"
    }
    assert(parts.length == 16)
    assert(hit <= 6, s"string z-order must confine the day box to few files, got $hit")
    // rows intact, filters exact on the clustered layout
    val back = spark.read.parquet(s"$dir/zs")
    assert(back.count() == 4096)
    assert(back.filter(col("day") === "2026-d05" && col("tenant") === "tenant_03")
      .count() == grid.filter(col("day") === "2026-d05" &&
        col("tenant") === "tenant_03").count())
    // mixed string+numeric interleave works too
    DataSink.writeZOrdered(grid.withColumn("n", col("id") % 64),
      s"$dir/zm", Seq("tenant", "n"), bitsPerCol = 5, targetFiles = 8)
    assert(spark.read.parquet(s"$dir/zm").count() == 4096)
  }

  test("writeZOrdered on MIXED-LENGTH strings: bucket order follows lexicographic order") {
    // round 18 (ADVICE-medium): conv() left-parses, so the unpadded hex
    // window numerically INVERTED mixed-length keys ("b" → 0x62 = 98
    // undercut "abc" → 0x616263 = 6,382,179 despite "abc" < "b") —
    // quantile bounds and bucket assignment scrambled and the layout
    // silently degraded toward random whenever short and long values
    // mixed (ordinary ID/code/name shapes). The hex is now right-padded
    // to its full 13 digits (fixed-width 52-bit key), restoring the
    // advertised monotone view. Fixture: a 64-word vocabulary of
    // lengths 1–3 INCLUDING strict-prefix pairs ("a" < "aa") and the
    // short-beats-long inversion shape ("azz" < "b") — every r17
    // fixture was fixed-width past the prefix, which is why the bug
    // survived a green suite.
    val dir = Files.createTempDirectory("sink").toFile.getAbsolutePath
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val vocab = (letters.map(_.toString) ++
      letters.flatMap(a => Seq(s"${a}a", s"${a}zz", s"${a}m${a}")))
      .distinct.sorted.take(64)
    assert(vocab.map(_.length).distinct.size > 1, "fixture must mix lengths")
    val grid = (0 until 4096).map(i => (i.toLong, vocab(i % 64), (i / 64).toDouble))
      .toDF("id", "s", "y")
    DataSink.writeZOrdered(grid, s"$dir/zmix", Seq("s", "y"),
      bitsPerCol = 6, targetFiles = 16)
    // a lexicographically CONTIGUOUS s-range must confine to few files;
    // under the unpadded parse the range scatters across buckets and
    // nearly every file's (min, max) straddles it
    val lo = vocab(8); val hi = vocab(15)
    val parts = new java.io.File(s"$dir/zmix").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val hit = parts.count { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("s")), max(col("s"))).head()
      !r.isNullAt(0) && r.getString(0) <= hi && r.getString(1) >= lo
    }
    assert(parts.length == 16)
    // 8/16 is the observed clustered ceiling (mixed-length quantile
    // boundaries are coarser than fixed-width); the pre-fix scrambled
    // assignment scatters the contiguous range across nearly all 16
    assert(hit <= 8,
      s"mixed-length string box [$lo, $hi] must stay clustered, got $hit/16 files")
    // rows and filters exact on the clustered layout
    val back = spark.read.parquet(s"$dir/zmix")
    assert(back.count() == 4096)
    assert(back.filter(col("s") >= lo && col("s") <= hi).count() ==
      8L * 64L, "range filter on the real column stays exact")
  }

  test("writeZOrdered hilbert: same pruning discipline as morton on the box query; bad curve refused") {
    val dir = Files.createTempDirectory("sink").toFile.getAbsolutePath
    val grid = (0 until 4096).map(i => (i.toLong, (i % 64).toDouble, (i / 64).toDouble))
      .toDF("id", "x", "y")
    DataSink.writeZOrdered(grid, s"$dir/h", Seq("x", "y"), bitsPerCol = 6,
      targetFiles = 16, curve = "hilbert")
    def overlapping(path: String, lo: Double, hi: Double): (Int, Int) = {
      val parts = new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val hit = parts.count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("y")), max(col("y"))).head()
        !r.isNullAt(0) && r.getDouble(0) <= hi && r.getDouble(1) >= lo
      }
      (hit, parts.length)
    }
    val (hHit, hAll) = overlapping(s"$dir/h", 8.0, 15.0)
    assert(hAll == 16)
    assert(hHit <= 6, s"hilbert must confine the y-box to few files, got $hHit")
    // data intact, filters correct on the hilbert layout
    val back = spark.read.parquet(s"$dir/h")
    assert(back.count() == 4096)
    assert(back.filter(col("y") >= 8.0 && col("y") <= 15.0 && col("x") === 3.0)
      .count() == 8)
    intercept[IllegalArgumentException] {
      DataSink.writeZOrdered(grid, s"$dir/bad", Seq("x", "y"), curve = "peano")
    }
  }

  test("optimizeZOrdered: in-place re-cluster restores pruning, heals a crashed swap") {
    val dir = Files.createTempDirectory("sink").toFile.getAbsolutePath
    val grid = (0 until 4096).map(i => (i.toLong, (i % 64).toDouble, (i / 64).toDouble))
      .toDF("id", "x", "y")
    // arrival-order layout: 16 files, each spanning the full y range
    grid.repartition(16).write.parquet(s"$dir/t")
    def yOverlaps(lo: Double, hi: Double): Int =
      new java.io.File(s"$dir/t").listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .count { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("y")), max(col("y"))).head()
          !r.isNullAt(0) && r.getDouble(0) <= hi && r.getDouble(1) >= lo
        }
    assert(yOverlaps(8.0, 15.0) >= 14) // arrival order: ~every file hit
    val (before, after) = DataSink.optimizeZOrdered(spark, s"$dir/t",
      Seq("x", "y"), targetFileMB = 1)
    assert(before == 16 && after >= 1)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 4096) // data intact after the swap
    val files = new java.io.File(s"$dir/t").listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    if (files >= 8) assert(yOverlaps(8.0, 15.0) <= files / 2)
    // crash window self-heal: dir moved aside, replacement never landed
    val fs = new org.apache.hadoop.fs.Path(s"$dir/t")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/t"),
      new org.apache.hadoop.fs.Path(s"$dir/t.zorder.old")))
    val (b2, _) = DataSink.optimizeZOrdered(spark, s"$dir/t", Seq("x", "y"),
      targetFileMB = 1)
    assert(b2 >= 1 && spark.read.parquet(s"$dir/t").count() == 4096)
    // partitioned layouts are refused
    grid.write.partitionBy("x").parquet(s"$dir/p")
    intercept[IllegalArgumentException] {
      DataSink.optimizeZOrdered(spark, s"$dir/p", Seq("x", "y"))
    }
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val df1 = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val df2 = (1L to 1000L).map(i => (i, s"b$i")).toDF("k", "vb")
    DataSink.writeBucketed(df1, "bkt_a", Seq("k"), 4, sortCols = Seq("k"))
    DataSink.writeBucketed(df2, "bkt_b", Seq("k"), 4, sortCols = Seq("k"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("orderRevenueBucketed: the registered query's join and agg have zero Exchange") {
    val orders = (1L to 200L).map(i => (i, if (i % 2 == 0) "F" else "O"))
      .toDF("o_orderkey", "o_orderstatus")
    val lineitem = (1L to 1000L).map(i => (1 + i % 200, 100.0 + i, 0.05))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    try {
      val result = graft.operators.Analytics.orderRevenueBucketed(spark, orders, lineitem, 4)
      assert(result.count() == 200)
      val plan = result.queryExecution.executedPlan.toString
      // the final orderBy legitimately range-shuffles the small result; the
      // JOIN and per-order AGG must not hash-shuffle any fact rows
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join/agg should not hash-shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over bucketed scans:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }

  test("logEtlRun appends run records") {
    val dir = Files.createTempDirectory("etl_log").toFile.getAbsolutePath + "/log"
    val ts = java.sql.Timestamp.valueOf("2026-08-12 01:00:00")
    DataSink.logEtlRun(spark, dir, "r1", "extract", "success", 100L, ts)
    DataSink.logEtlRun(spark, dir, "r1", "load", "success", 90L, ts)
    val log = spark.read.parquet(dir)
    assert(log.count() == 2)
    assert(log.select("stage").as[String].collect().toSet == Set("extract", "load"))
  }

  test("compact rewrites a many-small-files directory to the sized target, data intact") {
    val dir = Files.createTempDirectory("compact").toFile.getAbsolutePath + "/t"
    val df = spark.range(10000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.parquet(dir) // 40 tiny files
    val before = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    val (nBefore, nAfter) = DataSink.compact(spark, dir, targetFileMB = 128)
    assert(nBefore == 40 && nAfter == 1, s"got $nBefore -> $nAfter")
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1)
    val after = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    assert(after.toSeq == before.toSeq)
    assert(!new java.io.File(s"$dir.compact.tmp").exists())
    assert(!new java.io.File(s"$dir.compact.old").exists())
  }

  test("compact refuses partitioned layouts, heals a crashed swap, tolerates trailing slash") {
    val base = Files.createTempDirectory("compact_edge").toFile.getAbsolutePath
    // partitioned layout must be refused, not flattened
    val part = s"$base/part_t"
    spark.range(100).selectExpr("id", "id % 3 AS day").write.partitionBy("day").parquet(part)
    val e = intercept[IllegalArgumentException] { DataSink.compact(spark, part) }
    assert(e.getMessage.contains("partitioned layout"))
    assert(spark.read.parquet(part).columns.contains("day"), "layout untouched after refusal")

    // trailing slash: internals must stay SIBLINGS of the dataset dir
    val flat = s"$base/flat_t"
    spark.range(100).toDF("id").repartition(5).write.parquet(flat)
    val (b5, a1) = DataSink.compact(spark, flat + "/", targetFileMB = 64)
    assert(b5 == 5 && a1 == 1)
    assert(spark.read.parquet(flat).count() == 100)
    assert(!new java.io.File(s"$flat/.compact.tmp").exists() &&
      !new java.io.File(s"$flat/.compact.old").exists(), "no litter inside the dataset")

    // crash window between the two swap renames: dir gone, .old survives
    assert(new java.io.File(flat).renameTo(new java.io.File(s"$flat.compact.old")))
    val (b1, _) = DataSink.compact(spark, flat)
    assert(b1 == 1, "self-heal must restore the survivor before compacting")
    assert(spark.read.parquet(flat).count() == 100)

    // suffixless data files (e.g. a foreign writer) still size correctly:
    // bytes must come from every non-hidden file spark.read will read
    val bare = s"$base/bare_t"
    spark.range(100).toDF("id").repartition(2).write.parquet(bare)
    new java.io.File(bare).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        assert(f.renameTo(new java.io.File(
          f.getParent, f.getName.stripSuffix(".parquet"))))
      }
    val (b2, _) = DataSink.compact(spark, bare, targetFileMB = 64)
    assert(b2 == 2, "suffixless files must be counted and sized")
    assert(spark.read.parquet(bare).count() == 100)

    // an empty directory fails loudly, not with a schema-inference error
    val empty = s"$base/empty_t"
    assert(new java.io.File(empty).mkdirs())
    val e2 = intercept[IllegalArgumentException] { DataSink.compact(spark, empty) }
    assert(e2.getMessage.contains("no data files"))

    // but a LEGITIMATELY-written empty dataset (only _SUCCESS) is a no-op,
    // not a pipeline failure
    val legitEmpty = s"$base/legit_empty_t"
    spark.range(0).filter(col("id") < 0).repartition(1).write.parquet(legitEmpty)
    // zero-partition writes may leave a data file or not depending on the
    // committer; force the only-_SUCCESS shape explicitly
    new java.io.File(legitEmpty).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")).foreach(_.delete())
    assert(DataSink.compact(spark, legitEmpty) == ((0, 0)))
    assert(new java.io.File(legitEmpty).exists(), "no-op must leave the dir in place")
  }

  test("asofJoin over an SCD2 dimension equals the interval lookup (cross-operator)") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val current = Seq(
      (1L, "bronze", t("2026-01-01 00:00:00"), Option(t("2026-02-01 00:00:00"))),
      (1L, "silver", t("2026-02-01 00:00:00"), Option.empty[java.sql.Timestamp]),
      (2L, "gold", t("2026-01-15 00:00:00"), Option.empty[java.sql.Timestamp])
    ).toDF("k", "tier", "effective_from", "effective_to")
    val dim = DataSink.scd2Merge(current,
      Seq((1L, "gold", t("2026-03-01 00:00:00"))).toDF("k", "tier", "effective_from"),
      Seq("k"))
    val facts = Seq(
      (1L, t("2026-01-20 00:00:00"), 100L), (1L, t("2026-02-15 00:00:00"), 101L),
      (1L, t("2026-03-15 00:00:00"), 102L), (2L, t("2026-01-01 00:00:00"), 103L)
    ).toDF("k", "at", "fact_id")
    // backward as-of on effective_from picks the version in force — the
    // same row a from <= t < to interval filter selects
    val viaAsof = graft.operators.Temporal.asofJoin(facts, dim, Seq("k"), Seq("k"),
        "at", "effective_from", Seq("tier"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getString(3)))).toMap
    val viaInterval = facts.join(dim, Seq("k"), "left")
      .filter(col("effective_from") <= col("at") &&
        (col("effective_to").isNull || col("effective_to") > col("at")))
      .collect().map(r => r.getAs[Long]("fact_id") -> Some(r.getAs[String]("tier"))).toMap
    assert(viaAsof == Map(100L -> Some("bronze"), 101L -> Some("silver"),
      102L -> Some("gold"), 103L -> None))
    // fact 103 predates key 2's first version: interval lookup drops the
    // row entirely, as-of keeps it with a null — same in-force answers
    assert(viaInterval == viaAsof.filter(_._2.isDefined))
  }

  test("scd2Merge: late historical updates fail loudly; null instants/keys never merge") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val current = Seq(
      (1L, "bronze", t("2026-01-01 00:00:00"), Option(t("2026-02-01 00:00:00"))),
      (1L, "silver", t("2026-02-01 00:00:00"), Option.empty[java.sql.Timestamp])
    ).toDF("k", "tier", "effective_from", "effective_to")
    // an instant inside closed history would create overlapping intervals
    val late = Seq((1L, "silver", Option(t("2026-01-10 00:00:00"))))
      .toDF("k", "tier", "effective_from")
    val e = intercept[Exception] {
      DataSink.scd2Merge(current, late, Seq("k")).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ msgs(y.getCause))
    assert(msgs(e).exists(_.contains("predates closed history")), s"got: $e")
    // null instants and null keys are dropped, not phantom-chained
    val dirty = Seq(
      (Option(1L), "gold", Option(t("2026-03-01 00:00:00"))),
      (Option(1L), "pink", Option.empty[java.sql.Timestamp]),
      (Option.empty[Long], "teal", Option(t("2026-03-02 00:00:00"))))
      .toDF("k", "tier", "effective_from")
    val out = DataSink.scd2Merge(current, dirty, Seq("k"))
      .collect().map(r => (r.get(0), r.getString(1))).toSet
    assert(out.map(_._2) == Set("bronze", "silver", "gold"))
  }

  test("scd2Merge: closes on change, suppresses no-ops, chains a batch, keeps history") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val current = Seq(
      // key 1: one closed version + one open
      (1L, "bronze", t("2026-01-01 00:00:00"), Option(t("2026-02-01 00:00:00"))),
      (1L, "silver", t("2026-02-01 00:00:00"), Option.empty[java.sql.Timestamp]),
      // key 2: open only
      (2L, "gold", t("2026-01-15 00:00:00"), Option.empty[java.sql.Timestamp])
    ).toDF("k", "tier", "effective_from", "effective_to")
    val updates = Seq(
      (1L, "gold", t("2026-03-01 00:00:00")),   // real change -> close silver
      (1L, "gold", t("2026-03-10 00:00:00")),   // no-op vs the 03-01 version
      (2L, "gold", t("2026-02-20 00:00:00")),   // no-op vs current open
      (3L, "bronze", t("2026-03-05 00:00:00")), // brand-new key
      (3L, "silver", t("2026-03-06 00:00:00"))  // same-batch second change chains
    ).toDF("k", "tier", "effective_from")

    val out = DataSink.scd2Merge(current, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)))).toSet
    assert(out == Set(
      (1L, "bronze", t("2026-01-01 00:00:00"), Some(t("2026-02-01 00:00:00"))),
      (1L, "silver", t("2026-02-01 00:00:00"), Some(t("2026-03-01 00:00:00"))),
      (1L, "gold",   t("2026-03-01 00:00:00"), None),
      (2L, "gold",   t("2026-01-15 00:00:00"), None),
      (3L, "bronze", t("2026-03-05 00:00:00"), Some(t("2026-03-06 00:00:00"))),
      (3L, "silver", t("2026-03-06 00:00:00"), None)))
    // the history reads back as-of any instant via a from <= t < to scan
    val asOfFeb15 = DataSink.scd2Merge(current, updates, Seq("k"))
      .filter(col("effective_from") <= lit(t("2026-02-15 00:00:00")) &&
        (col("effective_to").isNull || col("effective_to") > lit(t("2026-02-15 00:00:00"))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(asOfFeb15 == Map(1L -> "silver", 2L -> "gold"))
  }
}
