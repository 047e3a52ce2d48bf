package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DDL-edge interactions (round 19, the r18 advisory worklist): the
  * resurrect guard compares PHYSICAL paths, identity specs follow
  * RENAME/DROP, partition transforms follow a rename and pin against a
  * drop, the constraint refusal matches full dotted paths (no
  * leaf-name false positives in either direction), identity marks
  * survive the Double round-trip above 2^53, and generated-column
  * names refuse the property-codec metacharacters.
  */
class TableLogDdlEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("resurrect guard holds through a parent rename: add resolves physically") {
    val dir = tmpDir("tlres")
    TableLog.append(spark, dir,
      Seq((1L, ("k1", 10L)), (2L, ("k2", 20L)))
        .toDF("id", "payload")
        .select(col("id"), col("payload._1").as("kind"),
          col("payload._2").as("qty"))
        .select(col("id"), struct(col("kind"), col("qty")).as("payload")),
      statsCols = Seq("id"))
    TableLog.dropColumn(spark, dir, "payload.qty")
    TableLog.renameColumn(spark, dir, "payload", "body")
    // 'body.qty' resolves physically to the tombstoned 'payload.qty' —
    // old files still carry those bytes; adding it back must refuse
    val e = intercept[IllegalArgumentException] {
      TableLog.addColumn(spark, dir, "body.qty",
        org.apache.spark.sql.types.LongType)
    }
    assert(e.getMessage.contains("payload.qty"), e.getMessage)
    // an unrelated nested add under the renamed parent still lands
    TableLog.addColumn(spark, dir, "body.note",
      org.apache.spark.sql.types.StringType)
    val out = TableLog.readAt(spark, dir).select("body.note").collect()
    assert(out.forall(_.isNullAt(0)), "new nested field null-fills")
    // the SIBLING guard is physical too: rename body.kind away, then
    // re-adding a column that LANDS on 'payload.kind' must refuse
    TableLog.renameColumn(spark, dir, "body.kind", "body.kategorie")
    val e2 = intercept[IllegalArgumentException] {
      TableLog.addColumn(spark, dir, "body.kind",
        org.apache.spark.sql.types.StringType)
    }
    assert(e2.getMessage.contains("payload.kind"), e2.getMessage)
  }

  test("identity spec + high-water mark REKEY on rename; next fill stays above") {
    val dir = tmpDir("tlidr")
    TableLog.append(spark, dir, Seq((10L, "a")).toDF("id", "s"),
      statsCols = Seq("id"))
    TableLog.setTableProperties(spark, dir,
      Map("graft.identity.cols" -> "id:1:1:true"))
    TableLog.syncIdentity(spark, dir)
    TableLog.renameColumn(spark, dir, "id", "ident_id")
    val props = TableLog.tablePropertiesAt(spark, dir)
    assert(props.get("graft.identity.cols").contains("ident_id:1:1:true"),
      props.toString)
    assert(props.get("graft.identity.high.ident_id").contains("10"),
      props.toString)
    assert(!props.contains("graft.identity.high.id"), props.toString)
    // minting still works under the NEW name — the silent-NULL failure
    // this rekey exists to prevent
    TableLog.append(spark, dir,
      Seq("b", "c").toDF("s")
        .select(lit(null).cast("bigint").as("ident_id"), col("s")),
      statsCols = Seq("ident_id"))
    val ids = TableLog.readAt(spark, dir).select("ident_id")
      .as[java.lang.Long].collect().toSeq
    assert(ids.forall(_ != null), s"identity fill must mint, got $ids")
    assert(ids.map(_.longValue).distinct.length == 3)
    assert(ids.map(_.longValue).filter(_ != 10L).forall(_ > 10L),
      s"post-rename mints must stay above the carried mark: $ids")
    // an identity column cannot be renamed INTO the codec's
    // metacharacters
    val e = intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "ident_id", "a:b")
    }
    assert(e.getMessage.contains("':'"), e.getMessage)
  }

  test("dropping an identity column sheds its spec and mark") {
    val dir = tmpDir("tlidd")
    TableLog.append(spark, dir, Seq((10L, "a")).toDF("id", "s"),
      statsCols = Seq("id"))
    TableLog.setTableProperties(spark, dir,
      Map("graft.identity.cols" -> "id:1:1:true",
        "graft.identity.high.id" -> "10"))
    TableLog.dropColumn(spark, dir, "id")
    val props = TableLog.tablePropertiesAt(spark, dir)
    assert(!props.contains("graft.identity.cols"), props.toString)
    assert(!props.contains("graft.identity.high.id"), props.toString)
    // a column RE-ADDED under the dead name must not resume minting
    TableLog.addColumn(spark, dir, "id2",
      org.apache.spark.sql.types.LongType)
    TableLog.append(spark, dir,
      Seq(("b", 7L)).toDF("s", "id2"), statsCols = Nil)
    assert(TableLog.readAt(spark, dir).filter(col("id2") === 7L).count() == 1L)
  }

  test("partition transforms follow a rename; a drop under one refuses") {
    val dir = tmpDir("tlpt")
    TableLog.append(spark, dir,
      Seq((java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1L, "a"))
        .toDF("ts", "k", "s"),
      statsCols = Seq("ts", "k"))
    TableLog.setTableProperties(spark, dir,
      Map("graft.partition.transforms" -> "days(ts),bucket(8, k)"))
    TableLog.renameColumn(spark, dir, "ts", "event_ts")
    val props = TableLog.tablePropertiesAt(spark, dir)
    assert(props.get("graft.partition.transforms")
      .contains("days(event_ts),bucket(8, k)"), props.toString)
    val e = intercept[IllegalArgumentException] {
      TableLog.dropColumn(spark, dir, "k")
    }
    assert(e.getMessage.contains("bucket(8, k)"), e.getMessage)
    // a column OUTSIDE the declared transforms still drops, and the
    // transforms survive untouched
    TableLog.dropColumn(spark, dir, "s")
    assert(TableLog.tablePropertiesAt(spark, dir)
      .get("graft.partition.transforms")
      .contains("days(event_ts),bucket(8, k)"))
  }

  test("constraint refusal matches the FULL dotted path, both directions") {
    val dir = tmpDir("tlck")
    TableLog.append(spark, dir,
      Seq((1L, "x", ("k1", 5L)))
        .toDF("kind", "x", "p")
        .select(col("kind"), col("x"),
          struct(col("p._1").as("kind"), col("p._2").as("qty")).as("payload")),
      statsCols = Nil)
    // constraint on the TOP-LEVEL `kind` (backquoted, exercising the
    // normalization) must not block renaming the NESTED payload.kind …
    TableLog.addCheckConstraint(spark, dir, "kind_pos", "`kind` >= 0")
    TableLog.renameColumn(spark, dir, "payload.kind", "payload.kategorie")
    assert(TableLog.readAt(spark, dir).select("payload.kategorie")
      .as[String].head() == "k1")
    // … and still blocks renaming/dropping the top-level one
    val e1 = intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "kind", "kind2")
    }
    assert(e1.getMessage.contains("kind_pos"), e1.getMessage)
    // the inverse: a constraint on the NESTED path blocks the nested
    // rename but not the same-leaf top-level one
    TableLog.addCheckConstraint(spark, dir, "qty_pos", "payload.qty >= 0")
    val e2 = intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "payload.qty", "payload.amount")
    }
    assert(e2.getMessage.contains("qty_pos"), e2.getMessage)
    TableLog.addColumn(spark, dir, "qty", org.apache.spark.sql.types.LongType)
    TableLog.renameColumn(spark, dir, "qty", "qty_renamed") // no false refusal
    // renaming the PARENT struct refuses over a descendant's constraint
    val e3 = intercept[IllegalArgumentException] {
      TableLog.renameColumn(spark, dir, "payload", "body")
    }
    assert(e3.getMessage.contains("qty_pos"), e3.getMessage)
  }

  test("identity mark survives the Double round-trip above 2^53") {
    // unit: the conservative ceiling never lands UNDER its preimage,
    // and stays EXACT inside the representable window
    val probes = Seq(0L, 1L, -1L, (1L << 53) - 1L, 1L << 53,
      (1L << 53) + 1L, (1L << 53) + 3L, Long.MaxValue - 1024L,
      Long.MaxValue, -(1L << 53) - 1L, Long.MinValue + 1024L)
    probes.foreach { l =>
      val back = TableLog.conservativeLongMax(l.toDouble)
      assert(back >= l || l.toDouble >= 9.223372036854776E18,
        s"ceiling $back fell under preimage $l")
      if (math.abs(l) < (1L << 53))
        assert(back == l, s"exact window must stay exact: $l → $back")
    }
    // end-to-end: an explicit BY-DEFAULT value just past 2^53 rounds
    // DOWN through the footer Double; the synced mark must still sit
    // at-or-above it so the next fill cannot collide
    val dir = tmpDir("tlbig")
    val big = (1L << 53) + 1L
    TableLog.append(spark, dir, Seq((big, "big")).toDF("id", "s"),
      statsCols = Seq("id"))
    TableLog.setTableProperties(spark, dir,
      Map("graft.identity.cols" -> "id:1:1:true"))
    TableLog.syncIdentity(spark, dir)
    val mark = TableLog.tablePropertiesAt(spark, dir)("graft.identity.high.id").toLong
    assert(mark >= big, s"mark $mark fell under the live max $big")
    TableLog.append(spark, dir,
      Seq("x", "y").toDF("s")
        .select(lit(null).cast("bigint").as("id"), col("s")),
      statsCols = Seq("id"))
    val ids = TableLog.readAt(spark, dir).select("id").as[Long].collect().toSeq
    assert(ids.distinct.length == 3,
      s"a fill collided with the pre-existing value: $ids")
    assert(ids.filter(_ != big).forall(_ > big), ids.toString)
  }

  test("post-hoc SET DEFAULT fills future INSERTs only; DROP DEFAULT clears") {
    val root = tmpDir("tldef")
    spark.conf.set("spark.sql.catalog.defcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.defcat.root", root)
    try {
      spark.sql("CREATE NAMESPACE defcat.ns")
      spark.sql("CREATE TABLE defcat.ns.t (k INT, s STRING) USING graft")
      spark.sql("INSERT INTO defcat.ns.t VALUES (1, 'a')")
      spark.sql("ALTER TABLE defcat.ns.t ALTER COLUMN s SET DEFAULT 'dflt'")
      // padded when omitted, resolved for the DEFAULT keyword
      spark.sql("INSERT INTO defcat.ns.t (k) VALUES (2)")
      spark.sql("INSERT INTO defcat.ns.t VALUES (3, DEFAULT)")
      spark.sql("ALTER TABLE defcat.ns.t ALTER COLUMN s DROP DEFAULT")
      spark.sql("INSERT INTO defcat.ns.t (k) VALUES (4)")
      val out = spark.sql("SELECT k, s FROM defcat.ns.t ORDER BY k")
        .collect().map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toSeq
      assert(out == Seq(1 -> "a", 2 -> "dflt", 3 -> "dflt", 4 -> null), out)
      // a bad default refuses at DDL time, not at first INSERT
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE defcat.ns.t ALTER COLUMN k SET DEFAULT rand()")
      }
      assert(e.getMessage.toLowerCase.contains("default"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.defcat")
      spark.conf.unset("spark.sql.catalog.defcat.root")
    }
    // identity / generated columns refuse the channel (direct API)
    val dir = tmpDir("tldefid")
    TableLog.append(spark, dir, Seq((1L, "a")).toDF("id", "s"),
      statsCols = Seq("id"))
    TableLog.setTableProperties(spark, dir,
      Map("graft.identity.cols" -> "id:1:1:true"))
    val e1 = intercept[IllegalArgumentException] {
      TableLog.setColumnDefault(spark, dir, "id", Some("7"))
    }
    assert(e1.getMessage.contains("IDENTITY"), e1.getMessage)
    TableLog.setTableProperties(spark, dir, Map("graft.generated.cols" ->
      TableLog.encodeGeneratedCols(Seq("s" -> "cast(id as string)"))))
    val e2 = intercept[IllegalArgumentException] {
      TableLog.setColumnDefault(spark, dir, "s", Some("'x'"))
    }
    assert(e2.getMessage.contains("GENERATED"), e2.getMessage)
  }

  test("SET NOT NULL validates from manifest null counts; writes enforce; DROP relaxes") {
    val dir = tmpDir("tlnn")
    TableLog.append(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), statsCols = Seq("k"))
    // fast path: every live file carries nullCounts(k)=0 — zero data read
    TableLog.setColumnNullability(spark, dir, "k", nullable = false)
    assert(TableLog.tablePropertiesAt(spark, dir)
      .get("graft.notnull.cols").contains("k"))
    // from now on a NULL refuses through the codegen'd raise channel
    val e = intercept[Exception] {
      TableLog.append(spark, dir,
        Seq("c").toDF("s").select(lit(null).cast("bigint").as("k"), col("s")),
        statsCols = Seq("k"))
    }
    assert(e.getMessage.contains("NOT NULL") ||
      Option(e.getCause).exists(_.getMessage.contains("NOT NULL")),
      e.toString)
    assert(TableLog.readAt(spark, dir).count() == 2L,
      "the refused batch must commit nothing")
    // DROP NOT NULL re-opens the channel
    TableLog.setColumnNullability(spark, dir, "k", nullable = true)
    TableLog.append(spark, dir,
      Seq("c").toDF("s").select(lit(null).cast("bigint").as("k"), col("s")),
      statsCols = Seq("k"))
    assert(TableLog.readAt(spark, dir).filter(col("k").isNull).count() == 1L)
    // and SET NOT NULL now refuses loudly from the RECORDED null count
    val e2 = intercept[IllegalArgumentException] {
      TableLog.setColumnNullability(spark, dir, "k", nullable = false)
    }
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
  }

  test("SET NOT NULL scan fallback covers files without the stat") {
    val dir = tmpDir("tlnns")
    // 's' is OUTSIDE statsCols: no nullCounts harvested → the targeted
    // dv-aware scan is the only sound answer
    TableLog.append(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), statsCols = Seq("k"))
    TableLog.setColumnNullability(spark, dir, "s", nullable = false) // scans, clean
    TableLog.setColumnNullability(spark, dir, "s", nullable = true)
    TableLog.append(spark, dir,
      Seq(3L).toDF("k").select(col("k"), lit(null).cast("string").as("s")),
      statsCols = Seq("k"))
    val e = intercept[IllegalArgumentException] {
      TableLog.setColumnNullability(spark, dir, "s", nullable = false)
    }
    assert(e.getMessage.contains("without null stats"), e.getMessage)
    // a column added AFTER files landed null-fills at read — the scan
    // fallback must catch that too (the files lack the column)
    TableLog.addColumn(spark, dir, "note", org.apache.spark.sql.types.StringType)
    val e2 = intercept[IllegalArgumentException] {
      TableLog.setColumnNullability(spark, dir, "note", nullable = false)
    }
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
  }

  test("nullability DDL through Spark SQL: SET NOT NULL then a null INSERT refuses") {
    val root = tmpDir("tlnncat")
    spark.conf.set("spark.sql.catalog.nncat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.nncat.root", root)
    try {
      spark.sql("CREATE NAMESPACE nncat.ns")
      spark.sql("CREATE TABLE nncat.ns.t (k BIGINT, s STRING) USING graft")
      spark.sql("INSERT INTO nncat.ns.t VALUES (1, 'a')")
      // SET NOT NULL is OUR statement (Spark's analyzer refuses
      // nullable→non-nullable against every v2 catalog)
      spark.sql("ALTER TABLE nncat.ns.t ALTER COLUMN k SET NOT NULL")
      // Spark's v2 write resolver sees the non-nullable schema field
      // and refuses with its own NOT_NULL_ASSERT_VIOLATION before our
      // raise channel even runs — either way the null never lands
      val e = intercept[Exception] {
        spark.sql("INSERT INTO nncat.ns.t VALUES (CAST(NULL AS BIGINT), 'x')")
      }
      assert(e.getMessage.replace('_', ' ').contains("NOT NULL") ||
        Option(e.getCause).exists(
          _.getMessage.replace('_', ' ').contains("NOT NULL")), e.toString)
      // DROP NOT NULL flows through Spark's own DDL natively
      spark.sql("ALTER TABLE nncat.ns.t ALTER COLUMN k DROP NOT NULL")
      spark.sql("INSERT INTO nncat.ns.t VALUES (CAST(NULL AS BIGINT), 'y')")
      assert(spark.sql("SELECT count(*) FROM nncat.ns.t WHERE k IS NULL")
        .head().getLong(0) == 1L)
      // a NOT NULL in the CREATE column list is an explicit declaration
      // — enforced from the first INSERT
      spark.sql("CREATE TABLE nncat.ns.u (k BIGINT NOT NULL, s STRING) USING graft")
      spark.sql("INSERT INTO nncat.ns.u VALUES (1, 'ok')")
      val e2 = intercept[Exception] {
        spark.sql("INSERT INTO nncat.ns.u VALUES (CAST(NULL AS BIGINT), 'x')")
      }
      assert(e2.toString.toLowerCase.contains("null"), e2.toString)
    } finally {
      spark.conf.unset("spark.sql.catalog.nncat")
      spark.conf.unset("spark.sql.catalog.nncat.root")
    }
  }

  test("ADD COLUMN DEFAULT: the backlog reads the default, inserts pad") {
    val root = tmpDir("tladcat")
    spark.conf.set("spark.sql.catalog.adcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.adcat.root", root)
    try {
      spark.sql("CREATE NAMESPACE adcat.ns")
      spark.sql("CREATE TABLE adcat.ns.t (k BIGINT, s STRING) USING graft")
      spark.sql("INSERT INTO adcat.ns.t VALUES (1, 'a'), (2, 'b')")
      spark.sql("ALTER TABLE adcat.ns.t ADD COLUMN extra INT DEFAULT 40 + 2")
      // files that PREDATE the column read the folded default — zero
      // files rewritten (exists-default, honored by the parquet reader)
      assert(spark.sql("SELECT extra FROM adcat.ns.t").collect()
        .map(_.getInt(0)).toSeq == Seq(42, 42))
      // future INSERTs pad from the same declaration; an explicit NULL
      // is STORED, so it stays null (exists-defaults apply only to
      // physically missing columns)
      spark.sql("INSERT INTO adcat.ns.t (k, s) VALUES (3, 'c')")
      spark.sql("INSERT INTO adcat.ns.t VALUES (4, 'd', NULL)")
      val out = spark.sql("SELECT k, extra FROM adcat.ns.t ORDER BY k")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getInt(1))).toSeq
      assert(out == Seq(1L -> 42, 2L -> 42, 3L -> 42, 4L -> null), out)
      // a non-constant default refuses at DDL time
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE adcat.ns.t ADD COLUMN bad INT DEFAULT rand()")
      }
      assert(e.getMessage.toLowerCase.contains("default"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.adcat")
      spark.conf.unset("spark.sql.catalog.adcat.root")
    }
    // defaults are top-level only (direct API, nested path)
    val dir = tmpDir("tladn")
    TableLog.append(spark, dir,
      Seq((1L, ("x", 2L))).toDF("id", "p")
        .select(col("id"), struct(col("p._1").as("a"), col("p._2").as("b"))
          .as("payload")), statsCols = Nil)
    val e2 = intercept[IllegalArgumentException] {
      TableLog.addColumn(spark, dir, "payload.c",
        org.apache.spark.sql.types.LongType, Some("7"))
    }
    assert(e2.getMessage.contains("top-level"), e2.getMessage)
  }

  test("generated-column names refuse the property codec's metacharacters") {
    val e = intercept[IllegalArgumentException] {
      TableLog.encodeGeneratedCols(Seq("a:b" -> "x + 1"))
    }
    assert(e.getMessage.contains("':'"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TableLog.encodeGeneratedCols(Seq("a;b" -> "x + 1"))
    }
    assert(e2.getMessage.contains("';'"), e2.getMessage)
    // round-trip stays exact for legal names with gnarly expressions
    val enc = TableLog.encodeGeneratedCols(
      Seq("d" -> "date_trunc('DAY', ts)", "r" -> "concat(a, ';', b)"))
    assert(TableLog.decodeGeneratedCols(enc) ==
      Seq("d" -> "date_trunc('DAY', ts)", "r" -> "concat(a, ';', b)"))
  }
}
