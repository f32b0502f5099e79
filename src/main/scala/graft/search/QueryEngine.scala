package graft.search

import graft._
import graft.core.{Analyzer, Bm25, BmwScorer, PostingBlocks}
import graft.index.Index
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** One term's blocks within one docId bucket (== corpus partition). The
  * query path re-keys the term-partitioned postings by bucket so WAND runs
  * doc-at-a-time inside a task without ever gathering a whole hot-term list
  * (SURVEY.md §3.2: leaf == postings bucket).
  */
case class BucketTermBlocks(bucket: Int, term: String, blocks: Seq[PostingBlock])

/** Per-bucket allowed docIds for metadata-filtered queries (lang pushdown). */
case class BucketFilter(bucket: Int, lang: String, docIds: Array[Long])

/** Search read path (SURVEY.md §3.2):
  *
  *   postings.filter(term isin queryTerms)      <- Parquet row-group skip
  *   -> per-term global df (tiny agg, broadcast)    == CollectionStatistics
  *   -> flatMap blocks to docId buckets             (narrow; query terms only)
  *   -> groupByKey(bucket) [cogroup lang filter]
  *   -> BmwScorer per bucket: block-max WAND, local k-heap
  *   -> per-query exact top-k merge                 == TopDocs.merge
  *
  * Tie-break is (score desc, docId asc) end-to-end — mandatory for
  * rank-identity (BASELINE.json north_rule).
  */
object QueryEngine {

  /** Analyze raw query terms the same way documents are analyzed (Lucene
    * query parsing runs the field analyzer over each clause).
    */
  def analyzeQuery(q: QuerySpec, stopWords: Set[String]): QuerySpec = q.copy(
    should = q.should.flatMap(Analyzer.analyze(_, stopWords)),
    must = q.must.flatMap(Analyzer.analyze(_, stopWords)),
    mustNot = q.mustNot.flatMap(Analyzer.analyze(_, stopWords)))

  def search(reader: Index.Reader, rawQueries: Seq[QuerySpec],
      bm25: Bm25 = Bm25(),
      stopWords: Set[String] = Analyzer.EnglishStopWords): Dataset[ScoredDoc] = {
    val spark = reader.spark
    import spark.implicits._

    val queries = rawQueries.map(analyzeQuery(_, stopWords))
    val allTerms: Seq[String] =
      queries.flatMap(q => q.should ++ q.must ++ q.mustNot).distinct
    if (allTerms.isEmpty || queries.forall(q => q.should.isEmpty && q.must.isEmpty))
      return spark.emptyDataset[ScoredDoc]

    // Catalyst/Parquet pushdown: only row groups containing query terms are
    // read (postings are term-sorted within partitions at merge time).
    val p = reader.postings.where($"term".isin(allTerms: _*))

    // global per-term stats across salt slices + snapshots == Lucene's
    // TermStatistics gathering at createWeight time
    val termDf: Map[String, Long] =
      p.groupBy($"term").agg(sum($"df")).as[(String, Long)].collect().toMap
    val stats = reader.stats
    val statsB = spark.sparkContext.broadcast((termDf, stats, queries, bm25))

    val buckets: Dataset[BucketTermBlocks] = p.as[TermPostings].flatMap { tp =>
      tp.blocks.groupBy(b => CorpusIds.partitionOf(b.firstDocId)).iterator
        .map { case (bucket, bs) =>
          BucketTermBlocks(bucket, tp.term, bs.sortBy(_.firstDocId))
        }
    }

    // metadata filters: only filtered queries' langs shuffle any docmeta,
    // and only (bucket, docId) pairs of docs that PASS the filter
    val filterLangs = queries.flatMap(_.langFilter).distinct
    val filters: Dataset[BucketFilter] =
      if (filterLangs.isEmpty) spark.emptyDataset[BucketFilter]
      else reader.docMeta
        .where($"lang".isin(filterLangs: _*))
        .map(m => (CorpusIds.partitionOf(m.docId), m.lang, m.docId))
        .toDF("bucket", "lang", "docId")
        .groupBy($"bucket", $"lang")
        .agg(sort_array(collect_list($"docId")).as("docIds"))
        .as[BucketFilter]

    val perBucket: Dataset[ScoredDoc] = buckets
      .groupByKey(_.bucket)
      .cogroup(filters.groupByKey(_.bucket)) { (bucket, blockRows, filterRows) =>
        val (dfMap, st, qs, sim) = statsB.value
        val cache = sim.normCache(st.avgdl)
        val byTerm = mutable.HashMap.empty[String, mutable.ArrayBuffer[PostingBlock]]
        blockRows.foreach { r =>
          byTerm.getOrElseUpdate(r.term, mutable.ArrayBuffer.empty) ++= r.blocks
        }
        if (byTerm.isEmpty) Iterator.empty
        else {
          val allowedByLang: Map[String, Array[Long]] =
            filterRows.map(f => f.lang -> f.docIds).toMap

          def iter(term: String, tag: Int): Option[BmwScorer.TermIterator] =
            byTerm.get(term).map { bs =>
              val blocks = bs.sortBy(_.firstDocId).toArray
              val w = sim.idf(dfMap.getOrElse(term, 0L), st.docCount)
              new BmwScorer.TermIterator(w, cache, blocks, tag)
            }

          qs.iterator.flatMap { q =>
            val musts = q.must.zipWithIndex.flatMap { case (t, i) => iter(t, i) }
            if (musts.length < q.must.distinct.length && q.must.nonEmpty) {
              // a required term is absent from this bucket: no hits here
              Iterator.empty
            } else {
              val shoulds = q.should.zipWithIndex
                .flatMap { case (t, i) => iter(t, i) }.toArray
              if (q.must.isEmpty && shoulds.isEmpty) Iterator.empty
              else {
                val nots = q.mustNot.zipWithIndex
                  .flatMap { case (t, i) => iter(t, i) }.toArray
                val notEx = BmwScorer.notExcluded(nots)
                val accept: Long => Boolean = q.langFilter match {
                  case None => notEx
                  case Some(lang) =>
                    val allowed = allowedByLang.getOrElse(lang, Array.emptyLongArray)
                    d => java.util.Arrays.binarySearch(allowed, d) >= 0 && notEx(d)
                }
                val heap = new BmwScorer.TopKHeap(q.k)
                if (q.must.nonEmpty)
                  BmwScorer.conjunctionTopK(
                    musts.sortBy(_.maxScore).toArray, shoulds, q.k, accept, heap)
                else
                  BmwScorer.wandTopK(shoulds, q.k, accept, heap)
                heap.drain().iterator.map { case (d, s) => ScoredDoc(q.qid, d, s) }
              }
            }
          }
        }
      }

    // exact global top-k per query == TopDocs.merge; candidate set is tiny
    // (<= k per bucket per query), so a per-key sort-take is enough
    val kByQid = queries.map(q => q.qid -> q.k).toMap
    val kB = spark.sparkContext.broadcast(kByQid)
    perBucket.groupByKey(_.qid).flatMapGroups { (qid, it) =>
      it.toArray.sortBy(s => (-s.score, s.docId)).iterator.take(kB.value(qid))
    }
  }

  /** Top-k hits joined back to document identity (the two-phase
    * ids-then-fields trick, SURVEY.md §3.3): only the winning ids' metadata
    * is fetched, via a broadcast hash join on the tiny result side.
    */
  def searchWithMeta(reader: Index.Reader, queries: Seq[QuerySpec],
      bm25: Bm25 = Bm25()): DataFrame = {
    val spark = reader.spark
    val hits = search(reader, queries, bm25)
    reader.docMeta.join(broadcast(hits.toDF()), "docId")
      .select("qid", "docId", "score", "repo", "path", "commit", "lang",
        "tokenCount")
  }
}
