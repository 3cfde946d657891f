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
      // sketch/pipeline primitives resolve too
      val r2 = s.sql("""SELECT
        graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        graft_shingles('a b c', 2) AS sh,
        graft_inset_counts(array('the', 'x'), array(array('the'))) AS ic,
        graft_rolling_fp_portable(array('ab')) AS fp""").head()
      assert(r2.getDouble(0) == 1.0)
      assert(r2.getSeq[String](1) == Seq("a b", "b c"))
      assert(r2.getSeq[Long](2) == Seq(1L))
      assert(r2.getLong(3) == (97L * 131 + 98) % 1000000007L)
      // the sketch-aggregate tier is injected too (count-min/bloom/theta)
      val r3 = s.sql("""SELECT
        graft_theta_estimate(graft_theta_sketch(id, 64)) AS t,
        graft_count_min_estimate(graft_count_min(id, 4, 64), 3L) AS cm,
        graft_bloom_contains(graft_bloom(id, 6400, 5), 3L) AS b
        FROM range(10)""").head()
      assert(r3.getLong(0) == 10L)
      assert(r3.getLong(1) == 1L)
      assert(r3.getBoolean(2))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }
}
