package graft.streaming

import graft._
import graft.index.{Index, IndexConfig, SnapshotMeta}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.util.concurrent.atomic.AtomicInteger

/** Structured Streaming surface (SURVEY.md §2.9): NRT index refresh as
  * foreachBatch snapshot appends, and windowed/deduplicated event streams.
  * Solr's UpdateLog/tlog replay maps onto the streaming checkpoint dir;
  * soft-commit visibility maps onto per-micro-batch snapshot commits.
  */
object StreamingOps {

  private val sinkId = new AtomicInteger(0)

  /** Checkpoint root for the memory-sink demo queries: prefer tmpfs — the
    * sandbox's virtio disk serializes concurrent writers and state-store
    * commits are per-partition small files (BENCH/BASELINE.md).
    */
  private def checkpointRoot(): String = {
    val base =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
        "/dev/shm" else sys.props("java.io.tmpdir")
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(base), "graft_ckpt").toString
  }

  /** State-store partition count for the stateful demo queries. A
    * streaming query freezes spark.sql.shuffle.partitions into its
    * checkpoint as the state-store count — it is a DEPLOYMENT knob sized
    * to stateful-key cardinality and cluster width (Solr sizes tlog/replay
    * concurrency the same way), not something to inherit from whatever the
    * surrounding batch-analytics session happens to use. Every state
    * partition pays a per-micro-batch commit (delta file + snapshot
    * bookkeeping), so 64 inherited batch partitions cost ~8x the commit
    * overhead of 8 for the same few-hundred-key state. Scale UP with the
    * keyspace on a real cluster.
    */
  private val StatePartitions = "8"

  /** Run `f` with the session's shuffle partitions pinned to the streaming
    * state size, restoring the batch setting after — stateful queries each
    * create a fresh checkpoint here, so the pinned value never conflicts
    * with a resumed stream.
    */
  private def withStatePartitions[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, StatePartitions)
    try f finally spark.conf.set(key, prev)
  }

  /** NRT indexing: stream a corpus parquet directory (file-arrival order,
    * maxFilesPerTrigger per micro-batch) into incremental index snapshots
    * [B solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java
    * soft-commit semantics]. Batch replay after restart is a no-op
    * (Index.appendBatch is idempotent on batchId), so index contents are
    * exactly-once.
    */
  def nrtIndex(spark: SparkSession, corpusParquetDir: String, indexDir: String,
      checkpointDir: String, cfg: IndexConfig = IndexConfig(),
      maxFilesPerTrigger: Int = 1): Seq[SnapshotMeta] = {
    import spark.implicits._
    val schema = spark.read.parquet(corpusParquetDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(corpusParquetDir)
      .as[SourceDoc]
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[SourceDoc], batchId: Long) =>
        Index.appendBatch(batch, indexDir, batchId, cfg): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.index.SnapshotStore.read(indexDir)
  }

  /** Tumbling-window event counts via a real streaming query (memory sink,
    * complete mode), returned as a batch DataFrame. Watermark bounds state;
    * AvailableNow drains the source deterministically.
    */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark) {
    val src = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val name = s"graft_windowed_${sinkId.incrementAndGet()}"
    // the streaming parquet source wants a directory: stream the sf dir
    // with a glob filter for the events table file
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> LTZ for event time
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointRoot())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table(name)
      .select(col("window.start").as("hour"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy(asc("hour"), asc("event_type"))
    out
  }

  /** Streaming dedup by key with last-writer-wins versioning (Solr's
    * uniqueKey + _version_ optimistic concurrency, SURVEY.md §2.9):
    * watermark + dropDuplicatesWithinWatermark on the key, so dedup state
    * is BOUNDED by the watermark horizon instead of growing with every
    * event_id ever seen — the difference between a day of state and an
    * unbounded map on a long-running 100 TB stream (VERDICT r1 perf table).
    */
  def streamDedupEvents(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark) {
    val src = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val name = s"graft_dedup_${sinkId.incrementAndGet()}"
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> LTZ for event time
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .option("checkpointLocation", checkpointRoot())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).orderBy(asc("event_type"))
  }

  /** Session-window aggregation on a real streaming query: per-user
    * sessions closed by a 30-minute inactivity gap (`session_window` —
    * state-store-merged sessions, the streaming twin of the batch
    * `sessionize` entry, whose gap-SQL is this entry's oracle: streaming
    * and batch agree row-for-row). Spark closes a session when the gap is
    * >= the duration (next window start not strictly inside the previous
    * window), so the oracle's boundary is `>=`, not `>`. Complete mode:
    * AvailableNow drains the source and every merged session emits
    * regardless of the final watermark position.
    */
  def sessionWindows(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark) {
    val src = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val name = s"graft_sessions_${sinkId.incrementAndGet()}"
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> LTZ for event time
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointRoot())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(asc("user_id"), asc("session_start"))
  }

  /** Stream-STREAM interval join — click→purchase attribution: each
    * purchase joins the same user's clicks from the preceding 30 minutes,
    * two independently watermarked event streams inner-joined on a range
    * condition. The event-time bound is what makes this run forever: the
    * range + 1-hour watermarks let the state store EVICT clicks older
    * than the join horizon, so state is bounded by the horizon's event
    * rate, never the stream's lifetime (the batch twin of this query is
    * the oracle — streaming and batch agree row-for-row once the
    * AvailableNow drain completes). Output: per-user attributed-pair
    * counts, aggregated as a batch query over the append-mode sink.
    */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark) {
    val src = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val name = s"graft_ssjoin_${sinkId.incrementAndGet()}"
    def side(t: String, alias: String) = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> LTZ for event time
      .where(col("event_type") === t)
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as(s"${alias}_user"), col("ts").as(s"${alias}_ts"),
        col("event_id").as(s"${alias}_id"))
    val q = side("click", "c").join(side("purchase", "p"),
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", checkpointRoot())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
      .groupBy(col("c_user").as("user_id")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(asc("user_id"))
  }
}
