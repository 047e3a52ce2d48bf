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
    val qs = results.map { case (k, (b, _)) => "\"" + k + "\":" + sec(b) }
      .mkString("{", ",", "}")
    val med = results.map { case (k, (_, m)) => "\"" + k + "\":" + sec(m) }
      .mkString("{", ",", "}")
    val total = sec(results.map(_._2._1).filter(_ >= 0).sum)
    val totalMed = sec(results.map(_._2._2).filter(_ >= 0).sum)
    // medians go to STDERR: the archiver keeps only a ~2000-char tail of
    // stdout, and a second 72-entry map would push the attributable
    // best-of-5 numbers out of the window. The one stdout JSON line puts
    // scalars first and "queries" LAST so front-truncation costs headline
    // fields (recoverable from total_median/SURVEY §6), never the map.
    System.err.println(
      s"""{"metric":"total_median","value":$totalMed,"unit":"sec","queries_median":$med}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","total_median":$totalMed,"sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}
