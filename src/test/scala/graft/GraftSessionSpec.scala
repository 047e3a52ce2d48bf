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

  test("${VAR} substitution resolves JDBC credentials; unset vars fail loudly") {
    val env = Map("DB_USERNAME" -> "etl_user", "DB_PASSWORD" -> "s3cr$t\\pw").get _
    assert(GraftSession.substituteEnvVars("spark.graft.jdbc.user",
      "${DB_USERNAME}", env) == "etl_user")
    // multiple placeholders in one value; $ and \ in the resolved value
    // must land literally (no regex-replacement mangling)
    assert(GraftSession.substituteEnvVars("spark.graft.jdbc.url",
      "jdbc:postgresql://wh/db?user=${DB_USERNAME}&password=${DB_PASSWORD}", env)
      == "jdbc:postgresql://wh/db?user=etl_user&password=s3cr$t\\pw")
    // no placeholder → value untouched (a bare $ is not a reference)
    assert(GraftSession.substituteEnvVars("k", "cost$percent", env) == "cost$percent")
    val e = intercept[IllegalArgumentException] {
      GraftSession.substituteEnvVars("spark.graft.jdbc.password",
        "${DB_MISSING_SECRET}", env)
    }
    assert(e.getMessage.contains("spark.graft.jdbc.password") &&
      e.getMessage.contains("DB_MISSING_SECRET"))
    // end-to-end through a conf file, via a variable every environment has
    val f = Files.createTempFile("graft_env", ".conf")
    Files.writeString(f, "spark.graft.home.dir=${HOME}/wh\n")
    val home = sys.env("HOME")
    assert(GraftSession.overrides(Some(f.toString)) ==
      Map("spark.graft.home.dir" -> s"$home/wh"))
  }
}
