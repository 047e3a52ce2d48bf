package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession shared by every suite in the forked test JVM —
  * session startup is ~5 s, so per-suite sessions would dominate runtime.
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark

  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toIndexedSeq.map(_.toSeq)
}
