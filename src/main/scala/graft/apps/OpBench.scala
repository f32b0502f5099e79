package graft.apps

import org.apache.spark.sql.SparkSession

/** Isolated per-entry timing (VERDICT r4 next-3): run a comma-list of
  * SparkEntry queries in a fresh JVM — outside the 241-entry sweep whose
  * shared-session cache pressure confounds per-entry numbers — and report
  * cold + warm-min seconds per entry. args: <sfDir> <name,name,...> [reps]
  */
object OpBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OpBench <sfDir> <entries> [reps]")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-opbench")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = names.map { n =>
      val cold = once(n)
      val warm = (1 to reps).map(_ => once(n)).min
      println(f"[opbench] $n%-28s cold=$cold%7.3f s  warm_min=$warm%7.3f s")
      (n, cold, warm)
    }
    println("[opbench] " + rows.map { case (n, c, w) =>
      s""""$n":{"cold":${f"$c%.3f"},"warm":${f"$w%.3f"}}"""
    }.mkString("{", ",", "}"))
    spark.stop()
  }
}
