package graft.corpus

import graft.SourceDoc
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic source-code corpus in exactly the Iceberg-table
  * shape of BASELINE.json:15 — (repo, path, commit, lang, content) — with
  * Zipf(s=1.1) identifier skew, planted rare "needle" identifiers, and a
  * sha256 manifest for the per-row ingest invariant (FIXTURES.md §1).
  *
  * Fully seed-fixed and splittable: every value is a pure function of
  * (seed, rowId) via a splitmix64-style mixer, so generation distributes as
  * `spark.range(n).mapPartitions` with no driver state and regenerates
  * byte-identically for the resume test.
  */
object CorpusGen {

  val Seed = 42L
  val FilesPerRepo = 200
  val VocabSize = 5000
  val ZipfS = 1.1

  val Keywords: Array[String] = Array(
    "def", "val", "var", "class", "object", "trait", "return", "if", "else",
    "for", "while", "import", "match", "case", "new", "extends", "with",
    "type", "lazy", "implicit", "override", "private", "public", "protected",
    "final", "sealed", "abstract", "package", "throw", "try", "catch",
    "finally", "yield", "true", "false", "null", "this", "super", "function",
    "let", "const", "static", "void", "int", "long", "float", "double",
    "string", "bool", "struct", "interface", "enum", "switch", "break",
    "continue", "defer", "func", "chan", "map", "range")

  val Langs: Array[String] = Array("scala", "java", "py", "go", "md")
  private val LangCum: Array[Double] = Array(0.3, 0.6, 0.8, 0.9, 1.0)
  private val Exts = Map("scala" -> "scala", "java" -> "java", "py" -> "py",
    "go" -> "go", "md" -> "md")

  /** Rare needle identifiers planted in known rows (precision@k oracles). */
  val Needles: Array[(String, Long)] = Array( // (token, rowId stride)
    ("qzx_handler_77", 499L),
    ("vqk_sentinel_13", 1231L))

  // splitmix64 finalizer — the per-row splittable RNG
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private def u01(h: Long): Double =
    ((h >>> 11).toDouble) / (1L << 53).toDouble

  /** Identifier vocabulary: ident_0000 .. ident_4999, Zipf-ranked. */
  def identifier(rank: Int): String = f"ident_$rank%04d"

  /** Cumulative Zipf(s) weights over ranks 1..VocabSize. */
  lazy val zipfCum: Array[Double] = {
    val w = Array.tabulate(VocabSize)(i => 1.0 / math.pow(i + 1.0, ZipfS))
    val total = w.sum
    val cum = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cum(i) = acc; i += 1 }
    cum(VocabSize - 1) = 1.0
    cum
  }

  private def sampleZipf(h: Long): Int = {
    val u = u01(h)
    var lo = 0
    var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCum(mid) >= u) hi = mid else lo = mid + 1
    }
    lo
  }

  def lang(rowId: Long): String = {
    val u = u01(mix(Seed ^ mix(rowId) ^ 0x1a2bL))
    var i = 0
    while (LangCum(i) < u) i += 1
    Langs(i)
  }

  /** Synthetic content: `keyword ident(ident, lit)` lines, 20..400 of them
    * (log-normal-ish), plus any planted needles for this row.
    */
  def content(rowId: Long): String = {
    val base = mix(Seed ^ mix(rowId))
    // log-normal-ish line count via exp of a CLT-approx gaussian
    val g = (u01(mix(base ^ 1)) + u01(mix(base ^ 2)) + u01(mix(base ^ 3)) +
      u01(mix(base ^ 4)) - 2.0) * math.sqrt(3.0) // ~N(0,1)
    val nLines = math.max(20, math.min(400, (60.0 * math.exp(0.9 * g)).toInt))
    val sb = new java.lang.StringBuilder(nLines * 40)
    var i = 0
    while (i < nLines) {
      val h = mix(base ^ (i.toLong << 8))
      val kw = Keywords(((h >>> 17) % Keywords.length).toInt.abs)
      val id1 = identifier(sampleZipf(mix(h ^ 0x51L)))
      val id2 = identifier(sampleZipf(mix(h ^ 0x52L)))
      val lit = (mix(h ^ 0x53L) >>> 40) % 1000
      sb.append(kw).append(' ').append(id1).append('(').append(id2)
        .append(", ").append(lit).append(")\n")
      i += 1
    }
    for ((needle, stride) <- Needles if rowId % stride == 7L % stride)
      sb.append("val ").append(needle).append(" = 1\n")
    sb.toString
  }

  def doc(rowId: Long): SourceDoc = {
    val repoId = rowId / FilesPerRepo
    val fileInRepo = rowId % FilesPerRepo
    val lg = lang(rowId)
    val commitHash = {
      val h1 = mix(Seed ^ mix(repoId) ^ 0xc0117L)
      val h2 = mix(h1 ^ fileInRepo)
      f"$h1%016x$h2%016x${(h1 ^ h2) & 0xff}%02x" + "0" * 6
    }
    SourceDoc(
      repo = f"repo$repoId%04d",
      path = f"src/pkg${fileInRepo % 10}/Name$fileInRepo%03d.${Exts(lg)}",
      commit = commitHash.take(40),
      lang = lg,
      content = content(rowId))
  }

  // MessageDigest.getInstance contends on the JCA provider lock under many
  // executor threads — reuse one digest per thread (hot path: every doc in
  // every flush task hashes its content for the ingest invariant)
  private val tlDigest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-256"))
  private val HexChars = "0123456789abcdef".toCharArray

  def sha256Hex(s: String): String = {
    val md = tlDigest.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Distributed generation as a typed Dataset. */
  def generate(spark: SparkSession, numDocs: Long,
      numPartitions: Int = 0): Dataset[SourceDoc] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, numDocs, 1, parts).map(i => doc(i))
  }

  /** Write corpus + sha256 manifest parquet; no-op if already present. */
  def ensure(spark: SparkSession, dir: String, numDocs: Long,
      numPartitions: Int = 0): Unit = {
    import spark.implicits._
    val done = new java.io.File(dir, "_corpus_done")
    if (done.exists()) return
    generate(spark, numDocs, numPartitions)
      .write.mode("overwrite").parquet(s"$dir/corpus.parquet")
    // manifest from the written table (single generation pass); sha2() is
    // the same lowercase-hex SHA-256 the index's DocMeta computes via
    // MessageDigest — equality is the ingest invariant (BASELINE.json:15)
    spark.read.parquet(s"$dir/corpus.parquet")
      .select(org.apache.spark.sql.functions.col("repo"),
        org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.col("content"), 256).as("sha256"))
      .write.mode("overwrite").parquet(s"$dir/manifest.parquet")
    done.getParentFile.mkdirs()
    java.nio.file.Files.write(done.toPath, Array.emptyByteArray)
  }
}
