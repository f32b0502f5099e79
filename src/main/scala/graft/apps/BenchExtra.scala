package graft.apps

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Guide §1 instrumentation (isolated, NOT the frozen driver bench): run
  * SparkEntry queries with a job listener that prints per-Spark-job wall
  * times + descriptions, so an entry's seconds decompose into its actual
  * jobs. Optionally dumps `.explain("formatted")` per entry.
  *
  * args: <sfDir> <entry,entry,...> [reps] [explainDir]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchExtra <sfDir> <entries> [reps] [explainDir]")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val explainDir = if (args.length > 3) Some(args(3)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchextra")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.maxConcurrentOutputFileWriters", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var collecting = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (collecting) {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobStarts.put(js.jobId, (System.nanoTime(), desc))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = jobStarts.remove(je.jobId)
        if (st != null) {
          val secs = (System.nanoTime() - st._1) / 1e9
          lines.add(f"    job ${je.jobId}%4d ${secs}%7.3f s  ${st._2}")
        }
      }
    })

    def once(name: String, print: Boolean): Double = {
      lines.clear(); collecting = print
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      collecting = false
      if (print) {
        Thread.sleep(120) // let listener events drain
        lines.forEach(l => println(l))
      }
      t
    }
    val printCold = sys.env.contains("BENCHEXTRA_COLD_JOBS")
    names.foreach { n =>
      val cold = once(n, print = printCold)
      println(f"[benchextra] $n%-28s cold=$cold%7.3f s")
      val warms = (1 to reps).map { i =>
        val t = once(n, print = i == reps)
        println(f"[benchextra] $n%-28s warm#$i=$t%7.3f s")
        t
      }
      explainDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        val txt = graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(d, s"$n.txt"), txt)
      }
      println(f"[benchextra] $n%-28s cold=$cold%7.3f warm_min=${warms.min}%7.3f s")
    }
    spark.stop()
  }
}
