package graft

import graft.pipeline.Quality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.spark

  test("observe-d metrics equal standalone aggregates, no extra scan") {
    val li = Engine.table(spark, sf, "lineitem")
    val (instrumented, obs) = Quality.observed(
      li.filter(col("l_quantity") > 10), "li_gate",
      Seq(count(lit(1)).as("n"),
        sum(col("l_quantity").isNull.cast("long")).as("n_null_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price")))
    // the carrier action is the pipeline's own write/count — here a count
    val carried = instrumented.count()
    val m = obs.get
    assert(m("n") == carried)
    val expect = li.filter(col("l_quantity") > 10)
      .agg(min(col("l_extendedprice")), max(col("l_extendedprice"))).head()
    assert(m("n_null_qty") == 0L)
    assert(m("min_price") == expect.getDouble(0))
    assert(m("max_price") == expect.getDouble(1))
  }

  test("profile covers every requested column and metric") {
    val prof = Quality.profile(Engine.table(spark, sf, "documents"),
      Seq("doc_id", "lang"), approxDistinct = false).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(prof(("doc_id", "n_nulls")) == 0.0)
    assert(prof(("doc_id", "n_distinct")) == 500.0)
    assert(prof(("lang", "len_min")) >= 2.0)
    // numeric columns get min/max/avg, strings get len_*
    assert(prof.contains(("doc_id", "avg")) && prof.contains(("lang", "len_avg")))
  }

  test("approx profile tracks exact within HLL tolerance") {
    val exact = Quality.profile(Engine.table(spark, sf, "documents"),
      Seq("doc_id"), approxDistinct = false).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    val approx = Quality.profile(Engine.table(spark, sf, "documents"),
      Seq("doc_id"), approxDistinct = true).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    val (e, a) = (exact("n_distinct"), approx("n_distinct"))
    assert(math.abs(a - e) / e < 0.05, s"exact=$e approx=$a")
  }
}
