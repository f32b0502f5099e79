package graft.streaming

import graft._
import graft.corpus.CorpusGen
import graft.index.{Index, IndexConfig}
import graft.search.QueryEngine
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Structured Streaming: NRT incremental indexing (micro-batch ->
  * snapshot append -> immediately searchable) and exactly-once replay.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("NRT: streamed corpus -> incremental snapshots -> searchable index") {
    val work = Files.createTempDirectory("graft_nrt").toString
    CorpusGen.ensure(spark, s"$work/corpus", 400L, numPartitions = 4)

    val snaps = StreamingOps.nrtIndex(spark, s"$work/corpus/corpus.parquet",
      s"$work/index", s"$work/ckpt",
      IndexConfig(hotTermDf = 1000, targetPostingsPerSlice = 1000),
      maxFilesPerTrigger = 2)

    assert(snaps.size >= 2, s"expected >=2 micro-batch snapshots, got ${snaps.size}")
    val reader = Index.reader(spark, s"$work/index")
    assert(reader.stats.docCount == 400L)

    // the needle is searchable across increments
    val hits = QueryEngine.search(reader,
      Seq(QuerySpec("nrt", should = Seq("qzx_handler_77")))).collect()
    assert(hits.length == 1) // 400 docs -> rowId 7 only

    // replay idempotence: running the same stream again adds nothing
    val again = StreamingOps.nrtIndex(spark, s"$work/corpus/corpus.parquet",
      s"$work/index", s"$work/ckpt",
      IndexConfig(hotTermDf = 1000, targetPostingsPerSlice = 1000),
      maxFilesPerTrigger = 2)
    assert(again.size == snaps.size)
    assert(Index.reader(spark, s"$work/index").stats.docCount == 400L)
  }

  test("windowed streaming agg equals its batch equivalent") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamingOps.windowedCounts(spark, sf).collect()
    val batch = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(asc("hour"), asc("event_type"))
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("stream-stream interval join equals the batch range self-join") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamingOps.streamStreamJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e = spark.read.parquet(s"$sf/events.parquet")
    val c = e.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("cu")).agg(count(lit(1)).as("n"))
      .orderBy(asc("cu")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }
}
