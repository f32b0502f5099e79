package graft.ops

import graft._
import graft.index.{Index, IndexConfig}
import graft.search.QueryEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The full inverted-index + BM25 engine exercised over the driver's
  * `documents` table (doc_id, text, lang, ...), which is mapped into the
  * corpus shape and indexed once per scale factor (cached on disk under the
  * system temp dir, keyed by sfDir). Every query here runs the REAL read
  * path — postings scan, bucket WAND, top-k merge — and has a full
  * BM25-in-SQL DuckDB oracle in SparkEntry.
  */
object DocSearchOps {

  private val Version = "v1" // bump to invalidate cached indexes on format change
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Index.Reader]()

  def reader(spark: SparkSession, sfDir: String): Index.Reader =
    cache.computeIfAbsent(sfDir, _ => {
      import spark.implicits._
      val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
      val dir = s"${sys.props("java.io.tmpdir")}/graft_docindex_${Version}_$safe"
      if (index.SnapshotStore.read(dir).isEmpty) {
        val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(
            col("source").as("repo"),
            col("doc_id").cast("string").as("path"),
            lit("").as("commit"),
            col("lang"),
            col("text").as("content"))
          .as[SourceDoc]
        Index.build(corpus, dir,
          IndexConfig(hotTermDf = 20000, targetPostingsPerSlice = 20000))
      }
      Index.reader(spark, dir)
    })

  /** Run one query through the engine; output (rank, doc_id, score). */
  def searchDf(spark: SparkSession, sfDir: String, q: QuerySpec): DataFrame = {
    val r = reader(spark, sfDir)
    val hits = QueryEngine.search(r, Seq(q))
    val w = Window.orderBy(desc("score"), asc("doc_id"))
    hits.join(r.docMeta.select(col("docId"), col("path")), "docId")
      .withColumn("doc_id", col("path").cast("long"))
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy(asc("rank"))
  }

  /** Single-term BM25 top-10 (TermQuery == degenerate WAND). */
  def searchTerm(spark: SparkSession, sfDir: String): DataFrame =
    searchDf(spark, sfDir, QuerySpec("term", should = Seq("merge")))

  /** Disjunctive BM25 top-10 (BooleanQuery SHOULD via block-max WAND). */
  def searchOr(spark: SparkSession, sfDir: String): DataFrame =
    searchDf(spark, sfDir, QuerySpec("or", should = Seq("merge", "sort", "window")))

  /** Conjunctive BM25 top-10 (BooleanQuery MUST via leapfrog). */
  def searchAnd(spark: SparkSession, sfDir: String): DataFrame =
    searchDf(spark, sfDir, QuerySpec("and", must = Seq("stream", "batch")))

  /** MUST + MUST_NOT (ReqExclScorer semantics). */
  def searchNot(spark: SparkSession, sfDir: String): DataFrame =
    searchDf(spark, sfDir, QuerySpec("not", must = Seq("join"), mustNot = Seq("error")))

  /** Metadata-filtered search (Lucene FILTER clause == pushed-down lang filter). */
  def searchFiltered(spark: SparkSession, sfDir: String): DataFrame =
    searchDf(spark, sfDir,
      QuerySpec("filt", should = Seq("scan", "table"), langFilter = Some("en")))

  /** PrefixQuery (MultiTermQuery rewrite): dictionary scan -> matching docs,
    * constant-score semantics [B lucene/core/src/java/org/apache/lucene/search/PrefixQuery.java].
    * The dictionary scan is a postings-parquet scan with a startsWith filter
    * pushed to row-group stats (terms are sorted within partitions).
    */
  def searchPrefix(spark: SparkSession, sfDir: String, prefix: String = "wind"): DataFrame = {
    import spark.implicits._
    val r = reader(spark, sfDir)
    val matching = r.postings.where(col("term").startsWith(prefix))
    val docIds = matching.flatMap(tp =>
      tp.blocks.flatMap(b => graft.core.PostingBlocks.decode(b)._1))
      .distinct().toDF("docId")
    docIds.join(r.docMeta.select(col("docId"), col("path")), "docId")
      .select(col("path").cast("long").as("doc_id"))
      .orderBy(asc("doc_id"))
      .limit(100)
  }

  /** Term dictionary stats straight from the index (df, ttf per term) —
    * cross-checked against retokenizing SQL in the oracle.
    */
  def indexTermStats(spark: SparkSession, sfDir: String): DataFrame = {
    val r = reader(spark, sfDir)
    r.postings.where(col("term").isin(TextOps.ProbeTerms: _*))
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df"), sum(col("totalTf")).as("ttf"))
      .orderBy(asc("term"))
  }
}
