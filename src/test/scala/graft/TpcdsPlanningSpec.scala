package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** TPC-DS planning parity (reference: core/tests/tpcds_planning.rs — all
  * 99 queries must produce a physical plan against the TPC-DS schema;
  * no data is needed). Query texts and the sf=0 schema live in
  * src/test/resources/tpcds/ (extracted from DuckDB's tpcds extension —
  * the TPC-DS spec's query set in portable ANSI form, same corpus the
  * reference's harness uses).
  *
  * Planning exercises the whole Catalyst front half: parsing (CTEs,
  * rollup/grouping, window functions, correlated + scalar subqueries,
  * intersect/except), analysis over 24 wide tables, decorrelation,
  * and physical strategy selection.
  */
class TpcdsPlanningSpec extends AnyFunSuite {
  // own catalog: TPC-DS names (customer, ...) must not clobber the
  // shared session's testdata temp views
  private lazy val spark = {
    val s = SparkTestSession.spark.newSession()
    // the corpus is ANSI SQL: "quoted" identifiers, not string literals
    s.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    s
  }

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/tpcds/$name")
    require(in != null, s"missing resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private lazy val catalogReady: Unit =
    resource("schema.txt").linesIterator.filter(_.nonEmpty).foreach { line =>
      val Array(table, ddl) = line.split("\t", 2)
      spark.createDataFrame(
          new java.util.ArrayList[Row](), StructType.fromDDL(ddl))
        .createOrReplaceTempView(table)
    }

  (1 to 99).foreach { n =>
    test(f"tpcds q$n%02d plans") {
      catalogReady
      // q14/23/24/39 are two-statement queries — every statement must plan
      resource(f"q$n%02d.sql").split(";").map(_.trim).filter(_.nonEmpty)
        .foreach { stmt =>
          val plan = spark.sql(stmt).queryExecution.executedPlan
          assert(plan != null)
        }
    }
  }

  // Totalizer regression net: the EXECUTED texts (shared-text patches +
  // appended ordinal tie-breaks) must also plan, and totalization must
  // not have changed the analyzed output schema the oracle wrapper was
  // derived from — a malformed append (ordinal past the select list, a
  // tie-break landing inside a subquery) fails here, not at gate time.
  test("all executed tpcds texts plan with unchanged schemas") {
    catalogReady
    graft.tpcds.TpcdsQueries.executedTexts.foreach { case (name, text) =>
      val qe = spark.sql(text).queryExecution
      assert(qe.executedPlan != null, name)
      assert(qe.analyzed.schema.fields.map(_.dataType).toSeq ==
        graft.tpcds.TpcdsQueries.analyzedSchema(name).fields
          .map(_.dataType).toSeq,
        s"$name: totalization changed the analyzed schema")
    }
  }

  // Totalizer COVERAGE net (r8 ADVICE): totalize detects "ends in a
  // top-level ORDER BY" by paren counting, which could silently skip a
  // statement (no tie-break appended → undetectable until a
  // nondeterministic order divergence at gate time). Ask the ANALYZER
  // instead: a statement whose analyzed plan is a global Sort (possibly
  // under LIMIT / output projection) has a final ORDER BY, and its
  // executed text must carry the appended ordinal tie-breaks.
  test("totalizer fired on every top-level-sorted statement") {
    catalogReady
    import org.apache.spark.sql.catalyst.plans.logical._
    def topSorted(p: LogicalPlan): Boolean = p match {
      case s: Sort           => s.global
      case g: GlobalLimit    => topSorted(g.child)
      case l: LocalLimit     => topSorted(l.child)
      case pr: Project       => topSorted(pr.child)
      case w: WithCTE        => topSorted(w.plan)
      case a: SubqueryAlias  => topSorted(a.child)
      case _                 => false
    }
    val executed = graft.tpcds.TpcdsQueries.executedTexts.toMap
    var sorted = 0
    graft.tpcds.TpcdsQueries.texts.foreach { case (name, raw) =>
      if (topSorted(spark.sql(raw).queryExecution.analyzed)) {
        sorted += 1
        val exec = executed(name)
        assert(exec != raw && exec.contains("NULLS FIRST"),
          s"$name: analyzer sees a top-level ORDER BY but totalize " +
            "left the text unmodified (silent skip)")
      }
    }
    // the corpus is overwhelmingly ORDER BY-terminated; a collapse here
    // means the detection itself broke
    assert(sorted > 90, s"only $sorted statements detected as sorted")
  }

  // CTE-materialization parser net (r9): parseWith must decompose every
  // WITH statement such that re-wrapping the defs verbatim analyzes to
  // the SAME schema as the original text — a parser that mis-splits a
  // body (paren slip, swallowed comma) fails here, not at gate time.
  // (The materialize() execution path itself is gate-covered for the
  // allowlisted entries at ×1/×10/×100.)
  test("parseWith round-trips every WITH statement's schema") {
    catalogReady
    var withCount = 0
    graft.tpcds.TpcdsQueries.executedTexts.foreach { case (name, text) =>
      graft.tpcds.TpcdsQueries.parseWith(text).foreach { case (defs, rest) =>
        withCount += 1
        assert(defs.nonEmpty, s"$name: WITH parsed to zero defs")
        val rebuilt = "WITH " +
          defs.map { case (n, b) => s"$n AS ($b)" }.mkString(", ") + " " + rest
        assert(spark.sql(rebuilt).schema == spark.sql(text).schema,
          s"$name: parseWith round-trip changed the analyzed schema")
      }
    }
    assert(withCount >= 30, s"only $withCount WITH statements found")
  }
}
