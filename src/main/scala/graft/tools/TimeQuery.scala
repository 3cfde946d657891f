package graft.tools

/** Single-query timing probe: runs the named SparkEntry queries N times
  * each in ONE JVM (no per-query spin-up, unlike a filtered Verify) and
  * prints every iteration — the quiet-box A/B tool for adjudicating a
  * full-bench outlier without re-running the whole suite.
  *
  * Usage: tools/run_jvm.sh graft.tools.TimeQuery <sfDir> <q1> [q2 ...]
  * Env:   SPARK_GRAFT_ITERS (default 4), SPARK_GRAFT_CPUS (default 32)
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    // arity check BEFORE args.head (r11 ADVICE: bare NoSuchElementException
    // on a no-arg invocation instead of the usage line)
    require(args.length >= 2, "usage: TimeQuery <sfDir> <query> [query ...]")
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "4").toInt
    val spark = graft.Engine.session(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-timequery")
    names.foreach { n =>
      val q = graft.SparkEntry.all(n)
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        q.build(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val s = times.sorted
      val median = if (iters % 2 == 1) s(iters / 2)
        else (s(iters / 2 - 1) + s(iters / 2)) / 2
      println(f"[timequery] $n%-28s " +
        times.map(t => f"$t%.3f").mkString(" ") +
        f"  median=$median%.3f")
    }
    spark.stop()
  }
}
