package graft

import scala.util.control.NonFatal

/** SQL REPL — the datafusion-cli entry point (reference: E3 in SURVEY §3,
  * datafusion-cli/src/exec.rs): statements end with `;`, results print as
  * a table, backslash commands cover the common catalog asks. Runs over
  * stdin/stdout so it pipes as easily as it drives interactively:
  *
  *   echo "SELECT 1;" | sbt "runMain graft.Repl [sfDir]"
  *
  * Commands: \d (list tables), \d <table> (describe), \q (quit),
  * \explain <sql> (formatted plan), \settings [substr] (session conf —
  * the information_schema.df_settings surface; `SET k=v;` works as a
  * plain statement). Testdata tables register at startup when a sfDir
  * argument is given.
  */
object Repl {
  def main(args: Array[String]): Unit = {
    val ctx = GraftContext(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    args.headOption.foreach(ctx.registerTestdata)
    run(ctx, Console.in, Console.out)
    ctx.spark.stop()
  }

  /** Drive the loop over explicit streams (unit-testable). */
  def run(ctx: GraftContext, in: java.io.BufferedReader,
      out: java.io.PrintStream): Unit = {
    val buf = new StringBuilder
    var line: String = null
    timing = false
    out.println("graft SQL — \\d tables, \\timing, \\q quit, statements end with ;")
    while ({ line = in.readLine(); line != null }) {
      val trimmed = line.trim
      if (trimmed.startsWith("\\")) {
        // a command aborts any half-typed statement — otherwise the
        // stale prefix would silently corrupt the next statement
        if (buf.nonEmpty) {
          out.println("(discarded incomplete statement)")
          buf.clear()
        }
        if (!command(ctx, trimmed, out)) return
      } else {
        buf.append(line).append('\n')
        if (trimmed.endsWith(";")) {
          val sql = buf.toString.trim.stripSuffix(";")
          buf.clear()
          if (sql.nonEmpty) execute(ctx, sql, out)
        }
      }
    }
  }

  private var timing = false

  /** @return false to quit */
  private def command(ctx: GraftContext, cmd: String,
      out: java.io.PrintStream): Boolean = cmd.split("\\s+", 2) match {
    case Array("\\q") => false
    case Array("\\d") =>
      ctx.tableNames().foreach(out.println)
      true
    case Array("\\timing") =>
      timing = !timing
      out.println(s"timing ${if (timing) "on" else "off"}")
      true
    case Array("\\d", table) =>
      execute(ctx, s"DESCRIBE $table", out)
      true
    case Array("\\explain", sql) =>
      try out.println(ctx.sql(sql).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case NonFatal(e) => out.println(s"Error: ${e.getMessage}") }
      true
    // \settings [substring] — the df_settings surface (SHOW over the
    // session conf; plain `SET k=v;` statements work as SQL already)
    case Array("\\settings") =>
      ctx.registerSettingsView()
      execute(ctx,
        "SELECT name, value FROM graft_settings ORDER BY name", out)
      true
    case Array("\\settings", pat) =>
      ctx.registerSettingsView()
      execute(ctx, "SELECT name, value FROM graft_settings " +
        s"WHERE name LIKE '%${pat.replace("'", "''")}%' ORDER BY name", out)
      true
    case _ =>
      out.println(s"unknown command: $cmd")
      true
  }

  private def execute(ctx: GraftContext, sql: String,
      out: java.io.PrintStream): Unit =
    try {
      val t0 = System.nanoTime()
      val df = ctx.sql(sql)
      val rows = df.limit(51).collect()
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      val shown = rows.take(50)
      val cells = df.columns +:
        shown.map(r => (0 until r.length).map(i =>
          if (r.isNullAt(i)) "NULL" else String.valueOf(r.get(i))).toArray)
      val widths = cells.transpose.map(_.map(_.length).max)
      def rule = widths.map("-" * _).mkString("+-", "-+-", "-+")
      def fmt(r: Array[String]) = r.zip(widths)
        .map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
      out.println(rule)
      out.println(fmt(cells.head))
      out.println(rule)
      cells.tail.foreach(r => out.println(fmt(r)))
      out.println(rule)
      out.println(
        if (rows.length > 50) "(first 50 rows)" else s"(${shown.length} rows)")
      if (timing) out.println(f"Time: $elapsedMs%.1f ms")
    } catch {
      case NonFatal(e) => out.println(s"Error: ${e.getMessage}")
    }
}
