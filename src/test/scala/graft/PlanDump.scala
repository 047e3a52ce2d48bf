package graft
import org.apache.spark.sql.execution.ExplainMode
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val defaults = Seq(
      "q1_pricing_summary", "q_star_join", "q_ann_topk", "q_dedup_minhash", "q_sessionize",
      "q_bucketed_join", "q_ann_lsh_pairs", "q_lang_id", "q_text_repetition",
      "q_asof_join", "q_range_join", "q_dedup_incremental", "q_ann_lsh_incr",
      "q_dedup_spans", "q_semantic_dedup",
      "q_bm25_topk", "q_click_attribution", "q_temperature_sample",
      "q_basket_affinity", "q_funnel")
    (if (args.nonEmpty) args.toSeq else defaults)
      .foreach { n =>
        println(s"##### $n")
        println(SparkEntry.queries(n)(spark, d).queryExecution
          .explainString(ExplainMode.fromString("simple")))
      }
    spark.stop()
  }
}
