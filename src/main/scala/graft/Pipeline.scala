package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Validation
import graft.sinks.DataSink

/** End-to-end ETL orchestration — the Spark rethink of the reference's
  * `ETLPipeline` (`/root/reference/src/main.py:30`) and its Airflow DAG
  * (`dags/etl_pipeline_dag.py`): extract → transform → validate → load,
  * with validation acting as a gate and every stage logged.
  *
  * Differences by design:
  *  - Stages compose lazily: a "stage" contributes plan nodes, not a
  *    materialized intermediate — the whole pipeline executes as ONE Spark
  *    job per sink instead of pandas' table-at-a-time rewrites.
  *  - Validation reports are DataFrames; a failed critical rule aborts
  *    before any write (the reference loads first and logs after).
  *  - The run log is itself a partitioned table (`DataSink.logEtlRun`).
  */
object Pipeline {

  final case class StageResult(stage: String, rows: Long, ok: Boolean,
                               failures: Seq[String] = Nil)

  /** One named transform step. */
  final case class Stage(name: String, transform: DataFrame => DataFrame)

  /** Validation gate: rules evaluated in one pass; any failed rule at
    * `abortSeverity` aborts the pipeline.
    */
  final case class Gate(rules: Seq[Validation.Rule],
                        thresholds: Map[String, Double] = Map.empty,
                        abortSeverity: String = "critical")

  final case class RunReport(runId: String, stages: Seq[StageResult],
                             loaded: Long, aborted: Boolean)

  /** Run extract → stages → gate → load. `load` is only invoked when the
    * gate passes (or no gate is given). Row counts are taken from the ONE
    * post-transform plan — counting after each stage would re-execute the
    * prefix repeatedly.
    */
  def run(spark: SparkSession, runId: String,
          extract: => DataFrame,
          stages: Seq[Stage],
          gate: Option[Gate],
          load: DataFrame => Unit,
          logPath: Option[String] = None,
          now: () => java.sql.Timestamp =
            () => new java.sql.Timestamp(System.currentTimeMillis())): RunReport = {

    val transformed = stages.foldLeft(extract)((df, s) => s.transform(df))

    val gateFailures: Seq[String] = gate.toSeq.flatMap { g =>
      Validation.validate(transformed, g.rules, g.thresholds)
        .collect().toIndexedSeq
        .filter(r => !r.getAs[Boolean]("passed") &&
          r.getAs[String]("severity") == g.abortSeverity)
        .map(_.getAs[String]("rule"))
    }
    val aborted = gateFailures.nonEmpty

    var loaded = 0L
    if (!aborted) {
      loaded = transformed.count()
      load(transformed)
    }

    val results = Seq(
      StageResult("transform", loaded, ok = true),
      StageResult("validate", loaded, ok = !aborted, failures = gateFailures),
      StageResult("load", loaded, ok = !aborted))
    logPath.foreach { p =>
      val status = if (aborted) "aborted" else "success"
      DataSink.logEtlRun(spark, p, runId, "pipeline", status, loaded, now())
    }
    RunReport(runId, results, loaded, aborted)
  }
}
