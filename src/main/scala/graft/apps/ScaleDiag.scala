package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.corpus.CorpusGen
import graft.index.{Index, IndexConfig}
import graft.SourceDoc
import scala.jdk.CollectionConverters._

/** Build-scaling diagnostic: one timed index build at a given core count
  * over an N-doc corpus, with the signals a wall-clock-only bench hides —
  * JVM GC time, per-stage task-time totals, shuffle/spill bytes. Used to
  * chase the sf1 (12M-doc) finding that local[32] builds slower than
  * local[8] while local[32] wins at 1.2M docs.
  *
  * args: <workDir> <numDocs> <cores> [shufflePartitions] [flushRamMB]
  */
object ScaleDiag {
  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(): Unit
  }

  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val work = args(0)
    val numDocs = args(1).toLong
    val cores = args(2).toInt
    val shufParts = if (args.length > 3) args(3).toInt else 2 * cores
    val flushRamMB = if (args.length > 4) args(4).toInt else 64

    {
      val s = SparkSession.builder().master("local[32]")
        .appName("scalediag-gen").config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      CorpusGen.ensure(s, s"$work/corpus", numDocs, numPartitions = 128)
      s.stop()
    }

    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"scalediag-$cores")
      .config("spark.sql.shuffle.partitions", shufParts.toString)
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.maxConcurrentOutputFileWriters", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    // per-stage totals from the listener: where the task time actually goes
    case class StageAgg(name: String, taskSecs: Double, gcSecs: Double,
        spillBytes: Long, shuffleWrite: Long, records: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageAgg]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        stages.add(StageAgg(
          e.stageInfo.name.takeWhile(_ != '\n').take(90),
          m.executorRunTime / 1e3, m.jvmGCTime / 1e3,
          m.diskBytesSpilled + m.memoryBytesSpilled,
          m.shuffleWriteMetrics.bytesWritten,
          m.outputMetrics.recordsWritten))
      }
    })

    import s.implicits._
    val corpus = s.read.parquet(s"$work/corpus/corpus.parquet").as[SourceDoc]
    val dir = s"$work/index_diag_$cores"
    deleteRec(new java.io.File(dir))
    val gc0 = gcMillis()
    val t0 = System.nanoTime()
    Index.build(corpus, dir,
      IndexConfig(hotTermDf = numDocs / 8, targetPostingsPerSlice = numDocs / 8,
        flushRamBytes = flushRamMB.toLong << 20))
    val wall = (System.nanoTime() - t0) / 1e9
    val gcSec = (gcMillis() - gc0) / 1e3
    val heapMax = java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getMax / (1L << 20)
    s.stop()
    deleteRec(new java.io.File(dir))

    println(f"[scalediag] cores=$cores docs=$numDocs shufParts=$shufParts " +
      f"wall=$wall%.1f s  driverGC=$gcSec%.1f s  heapMax=${heapMax}MB")
    val agg = stages.asScala.toSeq.groupBy(_.name).map { case (n, ss) =>
      (n, ss.map(_.taskSecs).sum, ss.map(_.gcSecs).sum,
        ss.map(_.spillBytes).sum, ss.map(_.shuffleWrite).sum)
    }.toSeq.sortBy(-_._2)
    println(f"[scalediag] ${"stage"}%-90s ${"taskS"}%8s ${"gcS"}%7s ${"spillMB"}%8s ${"shufMB"}%7s")
    agg.take(12).foreach { case (n, t, g, sp, sw) =>
      println(f"[scalediag] $n%-90s $t%8.1f $g%7.1f ${sp / (1L << 20)}%8d ${sw / (1L << 20)}%7d")
    }
  }
}
