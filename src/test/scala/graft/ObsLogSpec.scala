package graft

import org.apache.spark.sql.functions._

class ObsLogSpec extends SparkSpec {
  import spark.implicits._

  test("ObsLog records completed actions with durations and flushes as a DataFrame") {
    val log = ObsLog.attach(spark)
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").groupBy(col("v")).count().collect()
      // listener callbacks are async — wait for the record to land
      var tries = 0
      while (log.toDF(spark).isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val rows = log.toDF(spark).collect()
      assert(rows.nonEmpty, "an action should have been recorded")
      val r = rows.last
      assert(r.getAs[String]("action").nonEmpty)
      assert(r.getAs[Long]("duration_ms") >= 0L)
      assert(r.getAs[String]("root_operator").nonEmpty)
      assert(r.getAs[String]("error").isEmpty)
      log.clear()
      assert(log.toDF(spark).isEmpty)
    } finally ObsLog.detach(spark, log)
  }
}
