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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
    val qs = results.map { case (k, (b, _)) => "\"" + k + "\":" + b }
      .mkString("{", ",", "}")
    val med = results.map { case (k, (_, m)) => "\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_median":$med,"sf":"$sfDir"}""")
    spark.stop()
  }
}
