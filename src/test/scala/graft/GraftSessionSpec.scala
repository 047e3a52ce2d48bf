package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("overrides load a properties file and win over defaults in the builder") {
    val f = Files.createTempFile("graft", ".conf")
    Files.writeString(f,
      """spark.sql.shuffle.partitions=7
        |spark.graft.custom.flag=on
        |""".stripMargin)
    val ov = GraftSession.overrides(Some(f.toString))
    assert(ov == Map(
      "spark.sql.shuffle.partitions" -> "7",
      "spark.graft.custom.flag" -> "on"))
    // builder applies them after the defaults (last-set wins in Spark)
    GraftSession.builder("local[1]", 4, Some(f.toString)) // must not throw
  }

  test("overrides are empty when no conf file exists") {
    assert(GraftSession.overrides(Some("/nonexistent/graft.conf")).isEmpty)
  }
}
