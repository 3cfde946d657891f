package graft

import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

/** Error semantics (reference: sqllogictest/test_files/errors.slt — the
  * engine must fail LOUDLY and typed, not return wrong answers): under
  * Spark 4's default ANSI mode, arithmetic/cast/access violations raise
  * classed errors, and each has a documented `try_` escape hatch that
  * degrades to NULL instead. Both halves are the contract a pipeline
  * author relies on. */
class ErrorSemanticsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark.newSession()
    assert(s.conf.get("spark.sql.ansi.enabled") == "true")
    s
  }

  private def failsWith(clazz: String)(sql: String): Unit = {
    val e = intercept[Exception](spark.sql(sql).collect())
    // runtime errors can surface the condition on a wrapped cause
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains(clazz), s"expected $clazz from: $sql\ngot: $msgs")
  }

  private def nullOf(sql: String): Unit = {
    val r = spark.sql(sql).head()
    assert(r.isNullAt(0), s"expected NULL from: $sql, got ${r.get(0)}")
  }

  test("division by zero errors; try_divide returns NULL") {
    failsWith("DIVIDE_BY_ZERO")("SELECT 1 / 0")
    nullOf("SELECT try_divide(1, 0)")
  }

  test("integer overflow errors; try_add/try_multiply return NULL") {
    failsWith("ARITHMETIC_OVERFLOW")(
      "SELECT 9223372036854775807 + CAST(1 AS BIGINT)")
    nullOf("SELECT try_add(9223372036854775807, CAST(1 AS BIGINT))")
    nullOf("SELECT try_multiply(9223372036854775807, CAST(2 AS BIGINT))")
  }

  test("invalid cast errors; try_cast returns NULL") {
    failsWith("CAST_INVALID_INPUT")("SELECT CAST('abc' AS INT)")
    nullOf("SELECT try_cast('abc' AS INT)")
    failsWith("CAST_OVERFLOW")("SELECT CAST(300 AS TINYINT)")
    nullOf("SELECT try_cast(300 AS TINYINT)")
  }

  test("array index out of bounds errors; try_element_at returns NULL") {
    failsWith("INVALID_ARRAY_INDEX")("SELECT array(1, 2)[5]")
    nullOf("SELECT try_element_at(array(1, 2), 5)")
    // elt shares the error class; get() is the tolerant spelling
    failsWith("INVALID_ARRAY_INDEX")("SELECT elt(9, 'a', 'b')")
    nullOf("SELECT get(array(1, 2), 5)")
  }

  test("aggregate sum overflow errors; try_sum returns NULL") {
    failsWith("ARITHMETIC_OVERFLOW")(
      "SELECT sum(v) FROM VALUES (9223372036854775807), (1) t(v)")
    nullOf("SELECT try_sum(v) FROM VALUES (9223372036854775807), (1) t(v)")
  }

  test("scalar subquery with more than one row errors at runtime") {
    failsWith("SCALAR_SUBQUERY_TOO_MANY_ROWS")(
      "SELECT (SELECT v FROM VALUES (1), (2) t(v))")
    // exactly-one-row and zero-row (→ NULL) forms are fine
    assert(spark.sql(
      "SELECT (SELECT v FROM VALUES (1), (2) t(v) WHERE v = 2)")
      .head().getInt(0) == 2)
    nullOf("SELECT (SELECT v FROM VALUES (1), (2) t(v) WHERE v < 0)")
  }

  test("window functions reject FILTER and DISTINCT modifiers") {
    // both parse in DuckDB — Spark refuses loudly rather than ignoring
    intercept[Exception](spark.sql(
      "SELECT count(*) FILTER (WHERE true) OVER () FROM range(3)").collect())
    intercept[Exception](spark.sql(
      "SELECT count(DISTINCT id) OVER () FROM range(3)").collect())
  }

  test("Decimal256 gap: >38-digit values refuse with classed errors") {
    // SURVEY §1: the reference's Decimal256 (common/src/scalar/mod.rs:
    // 204-206) has no Spark runtime representation — precision caps at
    // 38. The documented REFUSAL surface (r8 verdict #7), one classed
    // error per entry path, all SQLSTATE 22003, never a wrapped or
    // silently-rounded value:
    val nines38 = "9" * 38
    // arithmetic past p=38 (multiply, aggregate sum, division whose
    // result scale pushes the integral part out of range)
    failsWith("NUMERIC_VALUE_OUT_OF_RANGE")(
      s"SELECT CAST('$nines38' AS DECIMAL(38,0)) * 10")
    failsWith("NUMERIC_VALUE_OUT_OF_RANGE")(
      s"SELECT sum(v) FROM VALUES (CAST('$nines38' AS DECIMAL(38,0))), " +
        s"(CAST('$nines38' AS DECIMAL(38,0))) t(v)")
    failsWith("NUMERIC_VALUE_OUT_OF_RANGE")(
      s"SELECT CAST('$nines38' AS DECIMAL(38,0)) / 0.0000001")
    // a 39-digit literal (and a DECIMAL(39,0) type ask) fail at ANALYSIS
    failsWith("DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION")(
      "SELECT " + "9" * 39)
    failsWith("DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION")(
      "SELECT CAST(1 AS DECIMAL(39,0))")
    // a 39-digit STRING cast fails at runtime with its own class
    failsWith("NUMERIC_OUT_OF_SUPPORTED_RANGE")(
      "SELECT CAST('" + "9" * 39 + "' AS DECIMAL(38,0))")
    // try_ escape hatches degrade to NULL (matching unsigned_widening's
    // SLT pins); the in-range twin keeps the exact 38-digit value
    nullOf("SELECT try_multiply(CAST('" + nines38 + "' AS DECIMAL(38,0)), 10)")
    nullOf("SELECT TRY_CAST('" + "9" * 39 + "' AS DECIMAL(38,0))")
    assert(spark.sql(
      s"SELECT CAST(try_multiply(CAST('${"9" * 37}' AS DECIMAL(37,0)), 10) " +
        "AS STRING)").head().getString(0) == "9" * 37 + "0")
  }

  test("malformed query fails at analysis with a typed error") {
    val e = intercept[Exception](spark.sql("SELECT no_such_col FROM range(1)"))
    assert(e.getMessage.contains("UNRESOLVED_COLUMN"))
    val p = intercept[Exception](spark.sql("SELEC 1"))
    assert(p.getMessage.contains("PARSE_SYNTAX_ERROR"))
  }
}
