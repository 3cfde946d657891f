package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

import org.scalatest.funsuite.AnyFunSuite

/** The CLI loop (reference: datafusion-cli) over piped input: statement
  * execution, multi-line statements, catalog commands, graceful errors,
  * and clean \q exit. */
class ReplSpec extends AnyFunSuite {
  test("repl executes statements, commands, and errors gracefully") {
    val ctx = GraftContext(SparkTestSession.spark.newSession())
    ctx.registerTestdata("/root/testdata/sf0.001")
    val script =
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey;
        |\d
        |\d region
        |SELECT count(*) AS n
        |FROM nation;
        |SELECT bogus FROM nowhere;
        |\explain SELECT count(*) FROM region
        |\timing
        |SET spark.graft.repl_probe=77;
        |\settings graft.repl_probe
        |SELECT 1 AS one;
        |SELECT count(*)
        |\d
        |WHERE s_suppkey = 1;
        |\q
        |SELECT 'after-quit';
        |""".stripMargin
    val bytes = new ByteArrayOutputStream()
    Repl.run(ctx, new BufferedReader(new StringReader(script)),
      new PrintStream(bytes, true, "UTF-8"))
    val out = bytes.toString("UTF-8")
    assert(out.contains("AFRICA"), s"region rows missing:\n$out")
    assert(out.contains("(5 rows)"))
    assert(out.contains("region"), "\\d must list tables")
    assert(out.contains("r_regionkey"), "\\d region must describe columns")
    assert(out.contains("| 25"), "multi-line statement must execute")
    assert(out.contains("Error:"), "bad SQL must not kill the loop")
    assert(out.contains("Physical Plan"), "\\explain must print a plan")
    assert(out.contains("timing on") && out.contains("Time:"),
      "\\timing must toggle and print elapsed time")
    assert(out.contains("(discarded incomplete statement)"),
      "a command mid-statement must discard the stale buffer")
    // two distinct errors: the bad statement AND the orphaned FROM after
    // the discard (a single Error: would mean the stale prefix survived)
    assert("Error:".r.findAllIn(out).size == 2,
      s"expected exactly 2 errors in:\n$out")
    assert(!out.contains("after-quit"), "\\q must stop the loop")
    assert(out.contains("spark.graft.repl_probe") && out.contains("| 77"),
      "\\settings must show the conf a SET statement just wrote")
  }
}
