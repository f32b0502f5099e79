package graft.tools

import org.apache.spark.sql.SparkSession

/** Local perf-iteration harness: time named SparkEntry ops (count() action)
  * at a given sfDir, N runs each, reporting per-run and min seconds. The
  * same measurement the Bench per-op phase takes, without the build ladder.
  *
  * usage: runMain graft.tools.OpTime <sfDir> <entry,entry,...> [runs]
  */
object OpTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OpTime <sfDir> <entry,...> [runs]")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-optime")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown entry $name"))
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[optime] $name%-28s min ${times.min}%.3f s  " +
        s"runs ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
