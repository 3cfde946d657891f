package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions wires the custom expressions into any session built
  * with spark.sql.extensions=graft.GraftExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  test("extension-injected functions resolve in SQL") {
    // force a fresh session so withExtensions applies (getOrCreate would
    // return the shared test session otherwise)
    val prior = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = s.sql(
        "SELECT graft_gcd(12, 18) AS g, graft_lcm(4, 6) AS l").head()
      assert(row.getLong(0) == 6L && row.getLong(1) == 12L)
      // null propagation through the custom expressions
      assert(s.sql("SELECT graft_gcd(NULL, 18)").head().isNullAt(0))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }
}
