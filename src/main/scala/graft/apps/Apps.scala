package graft.apps

import graft._
import graft.corpus.CorpusGen
import graft.index.{Index, IndexConfig}
import graft.search.{QueryEngine, ReferenceQueries}
import org.apache.spark.sql.SparkSession

/** spark-submit entry points (SURVEY.md §7.1 app/ module). In the sandbox
  * they run via `sbt runMain` on local[N]; on a real cluster the same mains
  * run unchanged under spark-submit (BASELINE.json north_rule).
  */
object SparkEnv {
  def session(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder().appName(appName)
      // 2 waves of reduce tasks + ~4 waves of scan tasks per core: stragglers
      // and first-wave JIT warmup stop defining stage wall time (profiled:
      // single-wave stages left most cores idle-waiting at stage tails)
      .config("spark.sql.shuffle.partitions", (2 * cpus.toInt).toString)
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // segments write partitions by kind (2 values): concurrent writers
      // skip the per-task sort-by-partition-key that buffered whole task
      // outputs (GC-heavy) before the write
      .config("spark.sql.maxConcurrentOutputFileWriters", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // master only when not provided by spark-submit
    val withMaster =
      if (sys.props.contains("spark.master")) b else b.master(s"local[$cpus]")
    val s = withMaster.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_PHASE_LOG")) {
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = e.stageInfo
            val m = i.taskMetrics
            println(f"[graft-stage] id=${i.stageId}%3d tasks=${i.numTasks}%4d " +
              f"run=${m.executorRunTime}%6dms cpu=${m.executorCpuTime / 1000000}%6dms " +
              f"gc=${m.jvmGCTime}%5dms ser=${m.resultSerializationTime}%4dms " +
              f"shW=${m.shuffleWriteMetrics.writeTime / 1000000}%5dms " +
              f"name=${i.name.takeWhile(_ != '(').take(44)}")
          }
        })
    }
    s
  }
}

/** Generate the deterministic corpus + build (or resume) the index.
  * args: <corpusDir> <indexDir> [numDocs] [increments]
  */
object BuildIndexApp {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val indexDir = args(1)
    val numDocs = if (args.length > 2) args(2).toLong else 5000L
    val increments = if (args.length > 3) args(3).toInt else 1
    // optional flag args (any order after increments):
    //   "positions" — index positional postings too
    //   "warm"      — run a small untimed build first so the timed build
    //                 doesn't pay one-time JIT/codegen a long-lived cluster
    //                 never sees (the Bench ladder's warm-up, for
    //                 spark-submit scaling runs where every invocation is
    //                 a fresh JVM)
    val flags = args.drop(4).toSet
    val positions = flags("positions")
    val spark = SparkEnv.session("graft-build")
    import spark.implicits._
    CorpusGen.ensure(spark, corpusDir, numDocs,
      numPartitions = sys.env.getOrElse("SPARK_GRAFT_CORPUS_PARTS", "32").toInt)
    val corpus = spark.read.parquet(s"$corpusDir/corpus.parquet").as[SourceDoc]
    if (flags("warm")) {
      val wdir = s"$indexDir.warmup"
      CorpusGen.ensure(spark, s"$wdir.corpus", 500, numPartitions = 4)
      Index.build(spark.read.parquet(s"$wdir.corpus/corpus.parquet")
        .as[SourceDoc], wdir, IndexConfig(indexPositions = positions))
    }
    // steal share measured DURING the build (same approximation as
    // graft.Bench: stolen jiffies over machine-wide non-idle jiffies) so a
    // spark-submit scaling ladder can gate samples on hypervisor noise
    def cpuSnap(): (Long, Long, Long) = {
      val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .split("\\s+").drop(1).map(_.toLong)
      (f.take(8).sum, f(3) + f(4), if (f.length > 7) f(7) else 0L)
    }
    val (tot0, idle0, st0) = cpuSnap()
    val t0 = System.nanoTime()
    val snaps = Index.build(corpus, indexDir,
      IndexConfig(indexPositions = positions), increments)
    val secs = (System.nanoTime() - t0) / 1e9
    val (tot1, idle1, st1) = cpuSnap()
    val runnable = math.max(1L, (tot1 - tot0) - (idle1 - idle0))
    val steal = (st1 - st0).toDouble / runnable
    val docs = snaps.map(_.docCount).sum
    println(f"[graft] built ${snaps.size} snapshot(s), $docs docs in $secs%.2f s " +
      f"(${docs / secs}%.0f files/sec, steal share $steal%.4f) -> $indexDir")
    spark.stop()
  }
}

/** Time one named SparkEntry operator at a scale factor (repeatedly).
  * args: <opName> [sfDir] [runs]
  */
object TimeOpApp {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkEnv.session("graft-timeop")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[graft] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}

/** Run queries against a built index.
  * args: <indexDir> [qid or 'all' or free terms...]
  */
object QueryApp {
  def main(args: Array[String]): Unit = {
    val indexDir = args(0)
    val spark = SparkEnv.session("graft-query")
    val reader = Index.reader(spark, indexDir)
    // "lat" mode: Bench's latency protocol against an EXISTING index —
    // warm-up, then sequential single-query jobs, 2 passes, per-query min,
    // p50/p95 printed. For A/B-ing layout changes without a full Bench run.
    if (args.length > 1 && args(1) == "lat") {
      QueryEngine.search(reader, ReferenceQueries.all.take(3)).count()
      val lats = ReferenceQueries.all.map { q =>
        val runs = (1 to 2).map { _ =>
          val t = System.nanoTime()
          QueryEngine.search(reader, Seq(q)).count()
          (System.nanoTime() - t) / 1e9
        }
        q.qid -> runs.min
      }
      val sorted = lats.map(_._2).sorted
      val p50 = sorted(sorted.size / 2)
      val p95 = sorted(math.min(sorted.size - 1, (sorted.size * 95) / 100))
      println(f"[graft-lat] {" + s""""docs":${reader.stats.docCount},""" +
        f""""p50":$p50%.3f,"p95":$p95%.3f,""" +
        lats.map { case (q, s) => f""""$q":$s%.3f""" }.mkString(",") + "}")
      spark.stop()
      return
    }
    val queries: Seq[QuerySpec] = args.drop(1) match {
      case Array() | Array("all") => ReferenceQueries.all
      case Array(qid) if qid.matches("q\\d\\d") =>
        ReferenceQueries.all.filter(_.qid == qid)
      case terms => Seq(QuerySpec("adhoc", should = terms.toSeq))
    }
    val t0 = System.nanoTime()
    val out = QueryEngine.searchWithMeta(reader, queries)
      .orderBy(org.apache.spark.sql.functions.asc("qid"),
        org.apache.spark.sql.functions.desc("score"),
        org.apache.spark.sql.functions.asc("docId"))
    out.show(100, truncate = false)
    println(f"[graft] ${queries.size} queries in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"over ${reader.stats.docCount} docs (avgdl=${reader.stats.avgdl}%.1f)")
    spark.stop()
  }
}
