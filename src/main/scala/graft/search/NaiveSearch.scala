package graft.search

import graft._
import graft.core.{Analyzer, Bm25, SmallFloatUtil}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Independent exhaustive BM25 oracle (the SearchEquivalenceTestBase
  * stand-in, SURVEY.md §5.2-4): tokenize -> exact term/doc aggregates ->
  * score EVERY matching doc with plain Catalyst expressions -> full sort.
  * Shares only the Analyzer/SmallFloat pure functions with the engine —
  * postings, compression, WAND and the scorer are not involved, so a
  * rank-identical result is real evidence.
  *
  * All arithmetic is plain Catalyst double expressions, which also
  * makes every step expressible in ANSI SQL for the DuckDB oracle. Doc keys
  * are Longs and ties break (score desc, docId asc) exactly like the engine.
  */
object NaiveSearch {

  /** (docId, term, tf, tokenCount) rows from any (longKey, text) table. */
  def tokenTable(docs: DataFrame, keyCol: String, textCol: String,
      stopWords: Set[String] = Analyzer.EnglishStopWords): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stop = stopWords
    docs.select(col(keyCol).cast("long").as("docId"), col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (key, text) =>
        val (terms, tfs, total) = Analyzer.termFreqs(text, stop)
        terms.indices.iterator.map(i => (key, terms(i), tfs(i), total))
      }
      .toDF("docId", "term", "tf", "tokenCount")
  }

  /** Collection stats (docCount, avgdl) from the token table. Docs whose
    * analyzed token count is zero carry no rows and thus don't count —
    * matching the engine, whose postings also never see them... except that
    * DocMeta DOES count them; pass explicit stats for exactness there.
    */
  def collectionStats(tokens: DataFrame): IndexStats = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val docStats = tokens.groupBy($"docId")
      .agg(first($"tokenCount").as("tokenCount"))
    val row = docStats.agg(count(lit(1)), coalesce(sum($"tokenCount"), lit(0L)))
      .as[(Long, Long)].head()
    IndexStats(row._1, row._2)
  }

  /** Score one query over the token table. Returns (docId, score) ordered
    * (score desc, docId asc), limit k. `stats` must be the SAME collection
    * stats the engine uses (docCount incl. token-less docs).
    */
  def scoreQuery(tokens: DataFrame, q: QuerySpec, stats: IndexStats,
      bm25: Bm25 = Bm25(),
      stopWords: Set[String] = Analyzer.EnglishStopWords): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val aq = QueryEngine.analyzeQuery(q, stopWords)
    val scoredTerms = (aq.must ++ aq.should).distinct
    if (scoredTerms.isEmpty)
      return spark.emptyDataset[(Long, Double)].toDF("docId", "score")

    val n = stats.docCount
    val avgdl = stats.avgdl

    val dfTable = tokens.where($"term".isin(scoredTerms: _*))
      .groupBy($"term").agg(countDistinct($"docId").as("df"))

    // quantized doc length via the SmallFloat table as a broadcast join —
    // keeps the whole scoring plan in Catalyst expressions (SQL-parity);
    // the norm code comes from the codegen'd custom expression, not a UDF
    val quant = spark.createDataset(
      (0 until 256).map(i => (i, SmallFloatUtil.LengthTable(i))))
      .toDF("normCode", "qdl")
    val normCode = (c: org.apache.spark.sql.Column) =>
      graft.functions.GraftFunctions.graft_norm_code(c)

    val k1 = bm25.k1
    val b = bm25.b
    val boostFor = typedLit(aq.boosts)
    val matches = tokens.where($"term".isin(scoredTerms: _*))
      .join(broadcast(dfTable), "term")
      .withColumn("normCode", normCode($"tokenCount"))
      .join(broadcast(quant), "normCode")
      .withColumn("idf", log(lit(1.0) +
        (lit(n.toDouble) - $"df" + lit(0.5)) / ($"df" + lit(0.5))))
      .withColumn("boost", coalesce(element_at(boostFor, $"term"), lit(1.0)))
      .withColumn("termScore", $"boost" * $"idf" * $"tf" /
        ($"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"qdl" / lit(avgdl))))

    val mustCount =
      if (aq.must.isEmpty) lit(0L)
      else count(when($"term".isin(aq.must.distinct: _*), 1))
    val shouldCount =
      if (aq.should.isEmpty) lit(0L)
      else count(when($"term".isin(aq.should.distinct: _*), 1))
    val scoreAgg = aq.dismaxTiebreak match {
      case None => sum($"termScore")
      case Some(tb) => // DisjunctionMaxQuery combine
        max($"termScore") + lit(tb) * (sum($"termScore") - max($"termScore"))
    }
    var perDoc = matches.groupBy($"docId").agg(
      scoreAgg.as("score"),
      mustCount.as("mustHits"),
      shouldCount.as("shouldHits"))
    if (aq.must.nonEmpty)
      perDoc = perDoc.where($"mustHits" === aq.must.distinct.size)
    if (aq.minShouldMatch > 0)
      perDoc = perDoc.where($"shouldHits" >= aq.minShouldMatch)

    if (aq.mustNot.nonEmpty) {
      val excluded = tokens.where($"term".isin(aq.mustNot: _*))
        .select($"docId").distinct()
      perDoc = perDoc.join(excluded, Seq("docId"), "left_anti")
    }

    perDoc.select($"docId", $"score")
      .orderBy(desc("score"), asc("docId"))
      .limit(q.k)
  }
}
