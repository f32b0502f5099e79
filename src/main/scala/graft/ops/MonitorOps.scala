package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reverse search — the Lucene Monitor / Solr percolator capability
  * [B lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java]:
  * a registered set of standing queries is matched against a STREAM of
  * documents, emitting (document, query) hits. The scale inversion is the
  * point: queries are the small indexed side (Monitor's presearcher indexes
  * each query's terms), documents flow through once. Spark shape: the
  * query-term table is a broadcast join against the per-doc distinct-term
  * set, so the 100-TB corpus is scanned once, map-side, with no shuffle on
  * the corpus at all — candidate generation and verification fuse into one
  * aggregation keyed by (doc, query).
  */
object MonitorOps {

  /** The registered query set: (query_id, MUST terms, MUST_NOT terms).
    * One source of truth — the SQL oracle is generated from this value.
    */
  val RegisteredQueries: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("q_merge_sort", Seq("merge", "sort"), Nil),
    ("q_key_value", Seq("key", "value"), Seq("error")),
    ("q_window_table", Seq("window", "table"), Nil),
    ("q_stream_batch", Seq("stream", "batch"), Seq("slow")),
    ("q_hash_join", Seq("hash", "join"), Nil),
    ("q_spark_clean", Seq("spark"), Seq("slow", "error")),
    ("q_scan_filter_row", Seq("scan", "filter", "row"), Nil),
    ("q_agg_group", Seq("agg", "group"), Seq("window")))

  /** Match every document against every registered query. Returns
    * (doc_id, query_id) for each hit — a doc matches when ALL of the
    * query's MUST terms occur in it and NONE of its MUST_NOT terms do.
    */
  def percolate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val qrows: Seq[(String, String, Boolean)] = RegisteredQueries.flatMap {
      case (qid, musts, nots) =>
        musts.map(t => (qid, t, false)) ++ nots.map(t => (qid, t, true))
    }
    val qterms = broadcast(qrows.toDF("qid", "term", "is_not"))
    val nMust = broadcast(RegisteredQueries
      .map { case (qid, musts, _) => (qid, musts.distinct.size) }
      .toDF("qid", "n_must"))

    val docTerms = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        graft.core.Analyzer.analyze(text).distinct.iterator.map(t => (id, t))
      }.toDF("doc_id", "term")

    // rows are unique per (doc, qid, term): docTerms is per-doc distinct
    // and the query table has one row per (qid, term) — plain conditional
    // sums, no countDistinct (which would add a second aggregate pass on
    // the same key)
    docTerms.join(qterms, "term")
      .groupBy(col("doc_id"), col("qid"))
      .agg(
        sum(when(!col("is_not"), 1).otherwise(0)).as("got"),
        sum(when(col("is_not"), 1).otherwise(0)).as("bad"))
      .join(nMust, "qid")
      .where(col("got") === col("n_must") && col("bad") === 0)
      .select(col("doc_id"), col("qid").as("query_id"))
      .orderBy(asc("query_id"), asc("doc_id"))
  }

  /** The oracle SQL, generated from the same RegisteredQueries value. */
  def oracleSql(tokCte: String): String = {
    val vals = RegisteredQueries.flatMap { case (qid, musts, nots) =>
      musts.map(t => s"('$qid', '$t', false)") ++
        nots.map(t => s"('$qid', '$t', true)")
    }.mkString(",\n         ")
    s"""WITH $tokCte,
       |vals AS (SELECT * FROM (VALUES
       |         $vals) v(qid, term, is_not)),
       |nm AS (SELECT qid, count(DISTINCT term) FILTER (WHERE NOT is_not) AS n_must
       |       FROM vals GROUP BY qid),
       |dt AS (SELECT DISTINCT doc_id, term FROM tok),
       |hit AS (SELECT d.doc_id, v.qid,
       |          count(DISTINCT CASE WHEN NOT v.is_not THEN v.term END) AS got,
       |          count(CASE WHEN v.is_not THEN 1 END) AS bad
       |        FROM dt d JOIN vals v ON v.term = d.term
       |        GROUP BY d.doc_id, v.qid)
       |SELECT h.doc_id, h.qid AS query_id FROM hit h JOIN nm ON nm.qid = h.qid
       |WHERE h.got = nm.n_must AND h.bad = 0
       |ORDER BY query_id, doc_id""".stripMargin
  }
}
