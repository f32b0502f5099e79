package graft.ops

import graft.core.Analyzer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines over the
  * `documents` table: token counting, quality scoring, fingerprinting,
  * language-ID. All single-pass narrow transforms (no shuffle except the
  * final presentation sort) — at 100 TB these run as pure map stages with
  * full column pruning (only doc_id/text are read).
  */
object TextOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Analyzer-equivalent tokens as a Catalyst expression chain (identical to
    * graft.core.Analyzer in the ASCII/<255-char token domain — the engine's
    * documented fidelity boundary): split on non-[a-z0-9_] after lowercase.
    */
  def tokensCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(lower(text), "[^a-z0-9_]+"), t => t =!= "")

  /** Token counts per document: raw tokens and post-stopword tokens. */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Analyzer.EnglishStopWords.toSeq.sorted
    docs(spark, sfDir)
      .withColumn("toks", tokensCol(col("text")))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(filter(col("toks"), t => !t.isin(stop: _*))).as("n_tokens_nostop"))
      .orderBy(asc("doc_id"))
  }

  /** Dictionary/term statistics (df, total tf) for a fixed probe set — the
    * SQL-visible face of the term dictionary (SURVEY.md §1.1 D5).
    */
  val ProbeTerms: Seq[String] = Seq("merge", "sort", "scan", "join", "window",
    "stream", "spark", "hash", "batch", "key")

  def termStats(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("term"))
      .where(col("term").isin(ProbeTerms: _*))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("ttf"))
      .orderBy(asc("term"))

  /** Quality scoring: length/stopword/uniqueness ratios (the usual cheap
    * pretraining-corpus filters), all in codegen'd expressions.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Analyzer.EnglishStopWords.toSeq.sorted
    docs(spark, sfDir)
      .withColumn("toks", tokensCol(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop", size(filter(col("toks"), t => t.isin(stop: _*))))
      .withColumn("n_uniq", size(array_distinct(col("toks"))))
      .select(col("doc_id"),
        col("n_tokens"),
        round(length(col("text")).cast("double") /
          greatest(col("n_tokens"), lit(1)), 4).as("avg_token_len"),
        round(col("n_stop").cast("double") /
          greatest(col("n_tokens"), lit(1)), 4).as("stop_ratio"),
        round(col("n_uniq").cast("double") /
          greatest(col("n_tokens"), lit(1)), 4).as("uniq_ratio"))
      .orderBy(asc("doc_id"))
  }

  /** Canonical document fingerprint (Solr-style dedup signature): md5 of the
    * sorted distinct token set — whitespace/word-order/duplication invariant.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(tokensCol(col("text"))))))
          .as("fingerprint"))
      .orderBy(asc("doc_id"))

  /** Language-ID heuristic: stopword-hit ratio per language marker set,
    * argmax wins ('und' when nothing matches). Marker lists are tiny
    * n-gram/stopword proxies — the Spark-side shape (broadcast sets +
    * one pass) is what matters at scale.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "que", "es", "para", "con", "una", "por", "del"))

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val base = docs(spark, sfDir).withColumn("toks", tokensCol(col("text")))
    val scored = LangMarkers.toSeq.sortBy(_._1).foldLeft(base) {
      case (df, (lang, markers)) =>
        df.withColumn(s"hits_$lang",
          size(filter(col("toks"), t => t.isin(markers: _*))))
    }
    val hitCols = LangMarkers.keys.toSeq.sorted.map(l => col(s"hits_$l"))
    val best = greatest(hitCols: _*)
    // argmax with deterministic lang-alphabetical tie-break
    val pred = LangMarkers.keys.toSeq.sorted.foldRight(lit("und")) {
      case (lang, elseCol) =>
        when(col(s"hits_$lang") === best && best > 0, lit(lang)).otherwise(elseCol)
    }
    scored.select(col("doc_id"), pred.as("pred_lang"))
      .orderBy(asc("doc_id"))
  }
}
