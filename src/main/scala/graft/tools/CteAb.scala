package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B harness for shared-CTE materialization (r8 verdict #3, r9
  * generalization): for each candidate statement, times the plain text
  * against TpcdsQueries.materialize (localCheckpoint of every top-level
  * CTE referenced ≥2×). Adoption into TpcdsQueries.cteMaterialized is
  * manual, per reproducible win. Run:
  *   SPARK_GRAFT_TPCDS_SCALE=1|10 SPARK_GRAFT_AB=tpcds_q04,tpcds_q11 \
  *     sbt "runMain graft.tools.CteAb"
  * Not part of any gate.
  */
object CteAb {
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

    val names = sys.env.getOrElse("SPARK_GRAFT_AB",
      "tpcds_q04,tpcds_q11,tpcds_q74,tpcds_q23a,tpcds_q23b")
      .split(",").map(_.trim).filter(_.nonEmpty)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String, thunk: () => Unit): Double = {
      thunk() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); thunk(); (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(1)
      println(f"[cteab] $tag median=$med%.3f min=${ts.min}%.3f " +
        f"all=${ts.map(t => f"$t%.3f").mkString(",")}")
      med
    }

    names.foreach { name =>
      val exec = graft.tpcds.TpcdsQueries.execText(name)
      val plain = time(f"$name%-11s plain", () => noop(s.sql(exec)))
      val mat = time(f"$name%-11s mat  ",
        () => noop(graft.tpcds.TpcdsQueries.materialize(s, exec)))
      println(f"[cteab] $name%-11s ratio mat/plain = ${mat / plain}%.2f")
    }
    spark.stop()
  }
}
