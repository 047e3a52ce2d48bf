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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warmup: plan + codegen + JIT
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => name -> -1.0 }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
