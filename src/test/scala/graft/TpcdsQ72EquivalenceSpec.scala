package graft

import org.scalatest.funsuite.AnyFunSuite

/** The q72 scale patch (TpcdsQueries.patches) claims pure inner-join
  * reassociation — same semantics, different join tree. This spec PROVES
  * it per run: the ORIGINAL spec text and the rewritten text execute on
  * the same generated TPC-DS tables and must return identical rows.
  * (The oracle gate already value-checks the rewritten text against
  * DuckDB; this closes the remaining gap — that the rewrite equals the
  * spec text itself, not just some DuckDB-agreeable query.)
  */
class TpcdsQ72EquivalenceSpec extends AnyFunSuite {

  test("rewritten q72 returns exactly the spec text's rows") {
    val parent = SparkTestSession.spark
    val s = parent.newSession()
    s.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    val dir = graft.tpcds.TpcdsData.ensure(s)
    graft.tpcds.TpcdsData.tables.foreach(t =>
      s.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t))

    val raw = {
      val in = getClass.getResourceAsStream("/tpcds/q72.sql")
      require(in != null)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }.split(";").map(_.trim).filter(_.nonEmpty).head

    val specRows = s.sql(raw).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val rewritten = SparkEntry.queries("tpcds_q72")(parent, dir)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(specRows.length == rewritten.length,
      s"row count: spec=${specRows.length} rewritten=${rewritten.length}")
    // both texts end in the same deterministic ORDER BY ... LIMIT; after
    // the defensive sort above the row multisets must be identical
    specRows.zip(rewritten).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs: spec=$a rewritten=$b")
    }
  }
}
