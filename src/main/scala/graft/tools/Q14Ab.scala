package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch A/B harness for the q14 shared-CTE lead (r8 verdict #3):
  * `cross_items` / `avg_sales` feed three channels (q14a) / two scans
  * (q14b) and are re-planned per reference — is an explicit
  * materialization (localCheckpoint or cache) faster than trusting
  * exchange/subquery reuse? Run:
  *   SPARK_GRAFT_TPCDS_SCALE=1|10 sbt "runMain graft.tools.Q14Ab"
  * Prints per-variant medians + plan reuse counts. Not part of any gate.
  */
object Q14Ab {
  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/tpcds/$name")
    require(in != null, s"missing $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark.newSession()
    s.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    val dir = graft.tpcds.TpcdsData.ensure(s)
    graft.tpcds.TpcdsData.tables.foreach(t =>
      s.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t))

    val stmts = resource("q14.sql").split(";").map(_.trim).filter(_.nonEmpty)

    /** Split a q14 statement into (cross_items body, avg_sales body,
      * main SELECT). Anchored on the spec's structure: the avg_sales
      * subquery alias `sq2)` closes the second CTE. */
    def split(text: String): (String, String, String) = {
      val ciStart = text.indexOf("(SELECT")
      val avMark = text.indexOf("avg_sales AS")
      val sq2 = text.indexOf("sq2)", avMark)
      require(ciStart >= 0 && avMark > ciStart && sq2 > avMark, "split fail")
      val ciBody = text.substring(ciStart, text.lastIndexOf("),", avMark) + 1)
      val avBody = text.substring(text.indexOf("(SELECT", avMark), sq2 + 4)
      val rest = text.substring(sq2 + 4).trim
      require(rest.toUpperCase.startsWith("SELECT"), "rest not a SELECT")
      (stripOuter(ciBody), stripOuter(avBody), rest)
    }
    def stripOuter(b: String): String = {
      val t = b.trim
      require(t.head == '(' && t.last == ')', "not parenthesized")
      t.substring(1, t.length - 1)
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def planCounts(df: DataFrame): String = {
      val e = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      def c(p: String) = p.r.findAllIn(e).length
      s"exch=${c("Exchange")} reusedExch=${c("ReusedExchange")} " +
        s"reusedSubq=${c("ReusedSubquery")} subq=${c("Subquery")}"
    }

    def time(tag: String, thunk: () => Unit): Unit = {
      thunk() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); thunk(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[q14ab] $tag median=${ts.sorted.apply(1)}%.3f " +
        f"min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    stmts.zipWithIndex.foreach { case (text, i) =>
      val name = if (i == 0) "q14a" else "q14b"
      val (ci, av, rest) = split(text)
      println(s"[q14ab] $name plain:  ${planCounts(s.sql(text))}")
      time(s"$name plain", () => noop(s.sql(text)))

      time(s"$name ckpt ", () => {
        val ciDf = s.sql(ci).localCheckpoint(true)
        val avDf = s.sql(av).localCheckpoint(true)
        ciDf.createOrReplaceTempView("cross_items")
        avDf.createOrReplaceTempView("avg_sales")
        try noop(s.sql(rest))
        finally {
          s.catalog.dropTempView("cross_items")
          s.catalog.dropTempView("avg_sales")
          ciDf.unpersist(false); avDf.unpersist(false)
        }
      })

      time(s"$name cache", () => {
        val ciDf = s.sql(ci).cache()
        val avDf = s.sql(av).cache()
        ciDf.createOrReplaceTempView("cross_items")
        avDf.createOrReplaceTempView("avg_sales")
        try noop(s.sql(rest))
        finally {
          s.catalog.dropTempView("cross_items")
          s.catalog.dropTempView("avg_sales")
          ciDf.unpersist(true); avDf.unpersist(true)
        }
      })
    }
    spark.stop()
  }
}
