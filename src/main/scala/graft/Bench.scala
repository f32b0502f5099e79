package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.index.{Index, IndexConfig}
import graft.search.{QueryEngine, ReferenceQueries}
import java.nio.file.Files

/** Benchmark main (driver-run -> BENCH_r{N}.json; BASELINE.md targets).
  *
  * Measures, in one JVM:
  *  1. index-build throughput (files/sec) over the deterministic synthetic
  *     corpus at TWO parallelism levels — local[hi/4] vs local[hi] — the
  *     sandbox stand-in for N vs 4N executors (BASELINE.json north_rule);
  *     reports scaling efficiency = (thr_hi / thr_lo) / 4.
  *  2. top-k BM25 query latency (p50/p95 over the 20-query reference set,
  *     sequential single-query runs) + QPS.
  *  3. per-operator wall time for every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Prints ONE JSON line: {"metric","value","unit","queries",...,"sf"}.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lo = math.max(1, hi / 4)
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS",
      if (sfDir.contains("0.1")) "60000" else "6000").toLong
    val work = Files.createTempDirectory("graft_bench").toString

    // corpus once (generation excluded from build timing)
    {
      val s = session(hi)
      CorpusGen.ensure(s, s"$work/corpus", benchDocs, numPartitions = 4 * hi)
      s.stop()
    }

    def buildAt(cpus: Int, tag: String): Double = {
      val s = session(cpus)
      import s.implicits._
      // JIT/codegen warm-up: a small untimed build so the first timed run
      // doesn't pay one-time compilation that a long-lived cluster never sees
      CorpusGen.ensure(s, s"$work/warm", 500, numPartitions = cpus)
      Index.build(s.read.parquet(s"$work/warm/corpus.parquet").as[SourceDoc],
        s"$work/index_warm_$tag", IndexConfig())
      val corpus = s.read.parquet(s"$work/corpus/corpus.parquet").as[SourceDoc]
      val (_, secs) = time {
        Index.build(corpus, s"$work/index_$tag",
          IndexConfig(hotTermDf = benchDocs / 8, targetPostingsPerSlice = benchDocs / 8))
      }
      s.stop()
      secs
    }

    val tLo = buildAt(lo, s"lo$lo")
    val tHi = buildAt(hi, s"hi$hi")
    val thrLo = benchDocs / tLo
    val thrHi = benchDocs / tHi
    val eff = (thrHi / thrLo) / (hi.toDouble / lo)

    // query latency on the hi-parallelism session
    val s = session(hi)
    val reader = Index.reader(s, s"$work/index_hi$hi")
    // warm-up (JIT + parquet footer caches)
    QueryEngine.search(reader, ReferenceQueries.all.take(3)).count()
    val latencies = ReferenceQueries.all.map { q =>
      val (_, secs) = time(QueryEngine.search(reader, Seq(q)).count())
      q.qid -> secs
    }
    val sorted = latencies.map(_._2).sorted
    val p50 = sorted(sorted.size / 2)
    val p95 = sorted(math.min(sorted.size - 1, (sorted.size * 95) / 100))
    val (_, batchSecs) = time(QueryEngine.search(reader, ReferenceQueries.all).count())

    // per-operator timings at sfDir (each op includes its full plan;
    // DocSearchOps builds its index once, on the first search op)
    val opTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, secs) = try time(fn(s, sfDir).count())
      catch { case _: Throwable => ((), -1.0) }
      name -> secs
    }
    s.stop()

    def j(d: Double): String = f"$d%.4f"
    val qs = (opTimes ++ latencies.map { case (q, t) => s"latency_$q" -> t })
      .map { case (k, v) => "\"" + k + "\":" + j(v) }.mkString("{", ",", "}")
    val total = opTimes.map(_._2).filter(_ >= 0).sum + tLo + tHi
    println(
      s"""{"metric":"total","value":${j(total)},"unit":"sec","queries":$qs,""" +
        s""""index_build":{"docs":$benchDocs,"cores_lo":$lo,"cores_hi":$hi,""" +
        s""""secs_lo":${j(tLo)},"secs_hi":${j(tHi)},""" +
        s""""files_per_sec_lo":${j(thrLo)},"files_per_sec_hi":${j(thrHi)},""" +
        s""""scaling_efficiency":${j(eff)}},""" +
        s""""query_latency":{"p50":${j(p50)},"p95":${j(p95)},""" +
        s""""qps_sequential":${j(1.0 / math.max(1e-9, p50))},""" +
        s""""batch20_secs":${j(batchSecs)}},""" +
        s""""sf":"$sfDir"}""")
  }
}
