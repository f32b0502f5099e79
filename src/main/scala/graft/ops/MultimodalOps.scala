package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * processed in batch-shaped partition passes. The container has no
  * image/audio codecs, so the DECODE step is a clearly-marked deterministic
  * stub (parses our own synthetic header); everything Spark-side — schema,
  * batch iteration, partitioning, metadata extraction — is real. On a
  * cluster the stub body is where libjpeg/ffmpeg-style work plugs in,
  * batch-at-a-time (the Scala-typed equivalent of mapInPandas batches).
  */
object MultimodalOps {

  /** Synthesize a binary "media blob" column from text — deterministic
    * 16-byte header (magic, fake width/height/channels derived from
    * content) + utf8 payload. Stands in for real image bytes.
    */
  def synthesizeBlobs(docs: DataFrame): DataFrame = {
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("blob", concat(
        encode(lit("GRFT"), "UTF-8"),
        encode(format_string("%06d", col("n_bytes") % 1000000), "UTF-8"),
        col("payload")))
  }

  /** STUBBED media decode (would be libjpeg/PIL/ffmpeg in production):
    * parses the synthetic header and derives deterministic fake
    * width/height/duration from the payload size. Runs as a typed
    * mapPartitions so real decoders drop in batch-at-a-time with zero
    * plan changes.
    */
  def decodeMeta(spark: SparkSession, blobs: DataFrame): DataFrame = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          // --- STUB DECODE: replace with a real codec on a real cluster ---
          val magic = new String(bytes.take(4), "UTF-8")
          val payloadLen = bytes.length - 10
          val fakeWidth = 64 + (payloadLen % 577)
          val fakeHeight = 64 + (payloadLen % 433)
          val fakeChannels = 1 + (payloadLen % 3)
          (id, magic, payloadLen, fakeWidth, fakeHeight, fakeChannels)
        }
      }
      .toDF("doc_id", "magic", "n_bytes", "width", "height", "channels")
  }

  /** End-to-end multimodal metadata pass over documents-as-blobs. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    decodeMeta(spark, synthesizeBlobs(docs))
      .orderBy(asc("doc_id"))
  }

  /** Frame-sampling shape: split each payload into fixed-size "frames" and
    * emit every Nth — the partitioning/row-explosion pattern of video
    * pipelines, with the decode stubbed to a frame digest (md5, so the
    * whole pipeline is exactly reproducible in the DuckDB oracle).
    */
  def frameSample(spark: SparkSession, sfDir: String, frameBytes: Int = 256,
      every: Int = 4): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    synthesizeBlobs(docs).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        // STUB decode: a real pipeline computes per-frame features here,
        // batch-at-a-time; the md5 stands in for the decoded content
        val md = java.security.MessageDigest.getInstance("MD5")
        val nFrames = (payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames by every).iterator.map { f =>
          val start = f * frameBytes
          val end = math.min(payload.length, start + frameBytes)
          md.reset()
          md.update(payload, start, end - start)
          val hex = md.digest().map(b => f"$b%02x").mkString
          (id, f, end - start, hex)
        }
      }
      .toDF("doc_id", "frame", "frame_bytes", "frame_md5")
      .orderBy(asc("doc_id"), asc("frame"))
  }
}
