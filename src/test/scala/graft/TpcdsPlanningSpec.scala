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
}
