package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The binned range join must equal the naive theta join for every bin
  * width (the bin is an execution detail, not a semantic), must dedupe
  * overlap pairs without a distinct, and must plan as an equi join — the
  * whole point of the operator is avoiding the nested-loop probe.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // deterministic synthetic intervals/points with nulls and empties mixed in
  private def points = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 400).map { i =>
      (i.toLong, if (i % 19 == 0) None else Some(rnd.between(-50L, 450L)))
    }.toDF("pid", "p")
  }

  private def intervals(seed: Int, pfx: String) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (1 to 120).map { i =>
      val lo = rnd.between(-60L, 420L)
      val w = rnd.between(-3L, 40L) // negative width → empty interval
      (i.toLong,
        if (i % 23 == 0) None else Some(lo),
        if (i % 31 == 0) None else Some(lo + w))
    }
    rows.toDF(s"${pfx}id", s"${pfx}lo", s"${pfx}hi")
  }

  test("pointInInterval == naive BETWEEN join at several bin widths") {
    val pt = points
    val iv = intervals(11, "w")
    val naive = pt.join(iv, col("p") >= col("wlo") && col("p") <= col("whi"))
      .select(col("pid"), col("wid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (w <- Seq(0.7, 3, 17, 1000)) {
      val binned = RangeJoin.pointInInterval(pt, iv, Nil, "p", "wlo", "whi", w)
        .select(col("pid"), col("wid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive, s"binWidth=$w")
    }
  }

  test("intervalOverlap == naive overlap join, exactly-once per pair") {
    val a = intervals(13, "a")
    val b = intervals(29, "b")
    // closed-interval semantics: an empty interval (lo > hi) matches nothing
    val naive = a.filter(col("alo") <= col("ahi"))
      .join(b.filter(col("blo") <= col("bhi")),
        col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (w <- Seq(0.7, 5, 64, 1000)) {
      val rows = RangeJoin.intervalOverlap(a, b, Nil,
          "alo", "ahi", "blo", "bhi", w)
        .select(col("aid"), col("bid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(rows.toSet == naive, s"binWidth=$w")
    }
  }

  test("equi keys restrict matches to the same key group") {
    import spark.implicits._
    val pt = Seq((1L, "x", 10L), (2L, "y", 10L)).toDF("pid", "k", "p")
    val iv = Seq((7L, "x", 0L, 20L), (8L, "y", 15L, 30L))
      .toDF("wid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(pt, iv, Seq("k"), "p", "lo", "hi", 5)
      .select(col("pid"), col("wid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 7L))) // pid=2 is inside wid=7's range but key differs
  }

  test("binned plan is an equi join, not a nested loop") {
    val df = RangeJoin.pointInInterval(points, intervals(11, "w"), Nil,
      "p", "wlo", "whi", 17)
    df.collect() // let AQE finalize the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }
}
