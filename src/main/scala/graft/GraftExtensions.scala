package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import org.apache.spark.sql.types.LongType

import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.types.DoubleType

import graft.functions.{BloomMightContainExpr, ClfScoreExpr, CosineSim, Fingerprint64Expr, FoldTextExpr, HeavyHittersAgg, HyperplaneSigExpr, L2NormalizeExpr, MarkerCountExpr, HilbertIndexExpr, MortonIndexExpr, MinHashSigExpr, PqEncodeExpr, PqScoreExpr, QuantileBucketsExpr, QuantizeI8Expr, ShinglesExpr, SimHash64Expr, TokenEntropyExpr, TopKAnyAgg, TopKByAgg}

/** Session extensions registering graft's native Catalyst expressions so
  * they are callable from SQL and `call_function` (SURVEY.md §2.H).
  * Installed via `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // metadata-only COUNT/MIN/MAX over graft tables — a global aggregate
    // the transaction log can answer exactly plans as a LocalRelation,
    // zero scan tasks (see graft.plans.MetadataOnlyAgg for the gates)
    ext.injectOptimizerRule(_ => graft.plans.MetadataOnlyAgg)

    // graft.`/path` references + VERSION AS OF / TIMESTAMP AS OF time
    // travel in plain SQL (see graft.plans.GraftSqlResolution). Hint
    // batch: it runs BEFORE the main resolution batch, where
    // ResolveSQLOnFile would otherwise grab the path identifier first
    // and refuse it as a direct file query
    ext.injectHintResolutionRule(session => graft.plans.GraftSqlResolution(session))

    // SQL maintenance statements — a delegating parser that intercepts
    // eleven statements (VACUUM [DRY RUN], OPTIMIZE [WHERE] [ZORDER BY],
    // DESCRIBE HISTORY, DESCRIBE DETAIL, RESTORE, CONVERT TO GRAFT,
    // COPY INTO, SHOW GRAFT TABLES, CREATE/DROP VIEW over graft
    // catalogs, SHOW GRAFT VIEWS) and passes everything else through
    // verbatim. Note DESCRIBE HISTORY **and** DESCRIBE DETAIL shadow
    // vanilla `DESCRIBE <tbl> history|detail` column-describes — the
    // documented trade for not forking the grammar; the view statements
    // grab only ≥3-part names and fall back to Spark's parser when the
    // catalog is not graft (see graft.sources.GraftSqlParser)
    ext.injectParser((session, delegate) => {
      // the delegate chain registers PER SESSION — the view commands'
      // vanilla fallback must re-parse through THIS session's chain,
      // not whichever session constructed its parser last
      graft.sources.GraftSqlParser.registerDelegate(session, delegate)
      new graft.sources.GraftSqlParser(delegate)
    })

    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(array<float>, array<float>)")
        CosineSim(args.head, args(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 3 || args.length == 4,
          "minhash_sig(array<string>, k, numHashes[, 'xx'|'md5_52'])")
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig: $what must be an integer literal, got $other")
        }
        val mode = if (args.length == 4) args(3) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"minhash_sig: mode must be a string literal, got $other")
        } else "xx"
        MinHashSigExpr(args.head, intLit(args(1), "k"), intLit(args(2), "numHashes"), mode)
      }))

    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSigExpr].getName, "hyperplane_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "hyperplane_sig(array<float>, dim, numPlanes, seed)")
        def intOf(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"hyperplane_sig: $what must be an integer literal, got $other")
        }
        val seed = args(3) match {
          case Literal(v: Long, LongType) => v
          case Literal(v: Int, IntegerType) => v.toLong
          case other => throw new IllegalArgumentException(
            s"hyperplane_sig: seed must be a numeric literal, got $other")
        }
        HyperplaneSigExpr(args.head, intOf(args(1), "dim"), intOf(args(2), "numPlanes"), seed)
      }))

    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainExpr].getName, "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bloom_might_contain(bloomBytes, bigintHash)")
        BloomMightContainExpr(args.head, args(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("shingles_of"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles_of"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingles_of(array<string>, k)")
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"shingles_of: k must be an integer literal, got $other")
        }
        ShinglesExpr(args.head, k)
      }))

    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndexExpr].getName, "hilbert_index"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hilbert_index(array<int>, bitsPerCoord)")
        val bits = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"hilbert_index: bitsPerCoord must be an integer literal, got $other")
        }
        require(bits >= 1 && bits <= 31,
          s"hilbert_index: bitsPerCoord must be in [1, 31], got $bits")
        HilbertIndexExpr(args.head, bits)
      }))

    ext.injectFunction((
      new FunctionIdentifier("morton_index"),
      new ExpressionInfo(classOf[MortonIndexExpr].getName, "morton_index"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "morton_index(array<int>, bitsPerCoord)")
        val bits = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"morton_index: bitsPerCoord must be an integer literal, got $other")
        }
        require(bits >= 1 && bits <= 31,
          s"morton_index: bitsPerCoord must be in [1, 31], got $bits")
        MortonIndexExpr(args.head, bits)
      }))

    ext.injectFunction((
      new FunctionIdentifier("quantile_buckets"),
      new ExpressionInfo(classOf[QuantileBucketsExpr].getName, "quantile_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "quantile_buckets(array<double>, 'b1,b2|c1,c2,…')")
        val spec = args(1) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"quantile_buckets: bounds must be a string literal, got $other")
        }
        QuantileBucketsExpr.parseBounds(spec) // validate at registration, fail loudly
        QuantileBucketsExpr(args.head, spec)
      }))

    ext.injectFunction((
      new FunctionIdentifier("token_entropy"),
      new ExpressionInfo(classOf[TokenEntropyExpr].getName, "token_entropy"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "token_entropy(array<string>)")
        TokenEntropyExpr(args.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[TopKByAgg].getName, "top_k_by"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "top_k_by(score double, id bigint, k)")
        TopKByAgg(args(0), args(1), args(2))
      }))

    ext.injectFunction((
      new FunctionIdentifier("top_k_any"),
      new ExpressionInfo(classOf[TopKAnyAgg].getName, "top_k_any"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "top_k_any(score double, payload, k)")
        TopKAnyAgg(args(0), args(1), args(2))
      }))

    ext.injectFunction((
      new FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHittersAgg].getName, "heavy_hitters"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "heavy_hitters(item string, budget)")
        args(1) match {
          case Literal(b: Int, IntegerType) if b >= 1 =>
          case other => throw new IllegalArgumentException(
            s"heavy_hitters: budget must be a positive integer literal, got $other")
        }
        HeavyHittersAgg(args(0), args(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "simhash64(array<string>[, 'xx'|'md5_64'])")
        val mode = if (args.length == 2) args(1) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"simhash64: mode must be a string literal, got $other")
        } else "xx"
        SimHash64Expr(args.head, mode)
      }))

    ext.injectFunction((
      new FunctionIdentifier("marker_count"),
      new ExpressionInfo(classOf[MarkerCountExpr].getName, "marker_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "marker_count(array<string>, 'w1,w2,…')")
        val words = args(1) match {
          case Literal(s: UTF8String, StringType) => s.toString.split(",").toSeq
          case other => throw new IllegalArgumentException(
            s"marker_count: marker set must be a string literal, got $other")
        }
        MarkerCountExpr(args.head, words)
      }))

    ext.injectFunction((
      new FunctionIdentifier("fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64Expr].getName, "fingerprint64"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "fingerprint64(array<string>[, 'xx'|'md5_52'])")
        val mode = if (args.length == 2) args(1) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"fingerprint64: mode must be a string literal, got $other")
        } else "xx"
        Fingerprint64Expr(args.head, mode)
      }))

    ext.injectFunction((
      new FunctionIdentifier("clf_score"),
      new ExpressionInfo(classOf[ClfScoreExpr].getName, "clf_score"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "clf_score(tokens, 'w0,w1,…', bias, seed, 'md5'|'xxhash64')")
        def strLit(e: Expression, what: String): String = e match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"clf_score: $what must be a string literal, got $other")
        }
        val weightsStr = strLit(args(1), "weights")
        val weights =
          try weightsStr.split(",").map(_.trim.toDouble).toIndexedSeq
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              "clf_score: weights must be a comma-separated list of doubles, " +
                s"got '${weightsStr.take(80)}'")
          }
        val bias = args(2) match {
          case Literal(d: Double, DoubleType) => d
          case Literal(i: Int, IntegerType) => i.toDouble
          // SQL text like `0.1` parses as a DecimalType literal
          case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
          case other => throw new IllegalArgumentException(
            s"clf_score: bias must be a numeric literal, got $other")
        }
        ClfScoreExpr(args.head, weights, bias,
          strLit(args(3), "seed"), strLit(args(4), "bucket mode"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "pq_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "pq_encode(codebookBytes, vec)")
        PqEncodeExpr(args.head, args(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("pq_score"),
      new ExpressionInfo(classOf[PqScoreExpr].getName, "pq_score"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "pq_score(codebookBytes, codes, qvec)")
        PqScoreExpr(args.head, args(1), args(2))
      }))

    ext.injectFunction((
      new FunctionIdentifier("mat_project"),
      new ExpressionInfo(classOf[graft.functions.MatProjectExpr].getName, "mat_project"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "mat_project(modelBytes, vec)")
        graft.functions.MatProjectExpr(args.head, args(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("fold_text"),
      new ExpressionInfo(classOf[FoldTextExpr].getName, "fold_text"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "fold_text(string, 'nfc'|'strip'|'fold')")
        val mode = args(1) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"fold_text: mode must be a string literal, got $other")
        }
        FoldTextExpr(args.head, mode)
      }))

    ext.injectFunction((
      new FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(classOf[L2NormalizeExpr].getName, "l2_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "l2_normalize(array<float|double>)")
        L2NormalizeExpr(args.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("quantize_i8"),
      new ExpressionInfo(classOf[QuantizeI8Expr].getName, "quantize_i8"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "quantize_i8(array<float|double>)")
        QuantizeI8Expr(args.head)
      }))
  }
}
