package graft

/** Engine-internal row types (FIXTURES.md §2). All are plain case classes so
  * Spark's `Encoders.product` maps them to Catalyst StructTypes — the whole
  * engine stays on typed Datasets (BASELINE.json input_hint).
  */

/** One row of the Iceberg-shaped corpus table (BASELINE.json:15). */
case class SourceDoc(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Per-document metadata ("norms" + "stored fields" pointer side of the
  * index). `normByte` is the Lucene-style lossy doc-length byte
  * (SmallFloat.intToByte4 of the post-analysis token count) — BM25
  * rank-identity depends on this quantization (SURVEY.md §1.1 D6).
  */
case class DocMeta(
    docId: Long,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    sha256: String,
    tokenCount: Int,
    normByte: Byte)

/** Map-side partial posting list: one term's postings within ONE corpus
  * partition (the Spark analogue of a Lucene DWPT flush segment,
  * SURVEY.md §2.3). docIds ascending, disjoint across partitions by
  * construction (docId = pid<<40 | row).
  */
case class PartialPostings(
    term: String,
    docPartition: Int,
    count: Int,
    totalTf: Long,
    firstDocId: Long,
    docIdBytes: Array[Byte], // delta gaps from firstDocId, FOR/VByte
    tfBytes: Array[Byte], // FOR/VByte
    normBytes: Array[Byte], // FOR/VByte over normByte&0xFF per posting
    /** Optional positional postings (IndexConfig.indexPositions, Lucene
      * IndexOptions.DOCS_AND_FREQS_AND_POSITIONS): per posting, `tf` raw
      * token positions (stop words leave holes, like StopFilter posInc),
      * delta-encoded within each doc and concatenated in docId order.
      * Empty (1-byte codec header) when positions are off.
      */
    posBytes: Array[Byte] = Array(0.toByte),
    /** Optional character offsets (IndexConfig.indexOffsets, Lucene
      * IndexOptions ..._AND_OFFSETS): per occurrence a (startDelta, len)
      * int pair — 2*sum(tf) ints — start deltas within each doc,
      * concatenated in docId order. Empty when offsets are off.
      */
    offBytes: Array[Byte] = Array(0.toByte))

/** One compressed 128-doc posting block (SURVEY.md §2.4). Blocks never span
  * corpus partitions, so `firstDocId >> CorpusIds.PartitionShift` identifies
  * the doc-range bucket a block belongs to — the query path re-keys blocks
  * by that bucket to run doc-at-a-time WAND without gathering whole hot-term
  * lists anywhere.
  */
/** `impact*` hold the block's COMPETITIVE (tf, normByte) skyline — pairs not
  * dominated by any other posting in the block (higher tf and shorter doc) —
  * Lucene's CompetitiveImpactAccumulator idea
  * [B lucene/core/src/java/org/apache/lucene/codecs/CompetitiveImpactAccumulator.java].
  * The block-max WAND bound is computed from these at query time with the
  * CURRENT global stats, so incremental snapshots never bake stale
  * avgdl/df into the index.
  */
case class PostingBlock(
    firstDocId: Long,
    lastDocId: Long,
    count: Int,
    impactCount: Int,
    impactTfBytes: Array[Byte],
    impactNormBytes: Array[Byte],
    docIdBytes: Array[Byte],
    tfBytes: Array[Byte],
    normBytes: Array[Byte],
    /** Positional postings for this block (see PartialPostings.posBytes):
      * sum(tf) ints, per-doc delta-encoded, empty when positions are off.
      */
    posBytes: Array[Byte] = Array(0.toByte),
    /** Character offsets for this block (see PartialPostings.offBytes):
      * 2*sum(tf) ints of (startDelta, len), empty when offsets are off.
      */
    offBytes: Array[Byte] = Array(0.toByte))

/** Final merged postings row: one (term, salt) slice of the inverted index.
  * Hot terms are split across `salt` slices with docId-disjoint contiguous
  * ranges (salt = docPartition / span), so concatenating slices in salt
  * order is a valid single posting list (SURVEY.md §2.3 skew defusal).
  * `df`/`totalTf` cover THIS row's postings only; the query engine sums
  * them across slices/snapshots of the same term for the global idf.
  */
case class TermPostings(
    term: String,
    salt: Int,
    df: Long,
    totalTf: Long,
    blocks: Seq[PostingBlock])

/** Per-reduce-partition build lineage/metrics row (BASELINE.json north_star). */
case class PartitionLineage(
    snapshotId: Long,
    stage: String,
    partitionId: Int,
    termLo: String,
    termHi: String,
    postingsBytes: Long,
    docCount: Long,
    termCount: Long,
    wallMillis: Long)

/** Scored search hit. Score is an exact double (see Bm25 scaladoc on the
  * float→double deviation from Lucene).
  */
case class ScoredDoc(qid: String, docId: Long, score: Double)

/** A parsed query: positive/negative/required clauses over analyzed terms.
  * `boosts` keys are analyzed (lowercased) terms; `dismaxTiebreak` switches
  * the SHOULD combine from sum to Lucene's DisjunctionMaxQuery
  * max + tb * (sum - max) [B .../search/DisjunctionMaxQuery.java]
  * (valid for 0 <= tb <= 1, where the WAND sum-bound still dominates).
  */
case class QuerySpec(
    qid: String,
    should: Seq[String] = Nil, // OR clauses (scored)
    must: Seq[String] = Nil, // AND clauses (scored)
    mustNot: Seq[String] = Nil, // exclusions (not scored)
    k: Int = 10,
    langFilter: Option[String] = None,
    boosts: Map[String, Double] = Map.empty,
    dismaxTiebreak: Option[Double] = None,
    /** BooleanQuery.setMinimumNumberShouldMatch (edismax mm): docs matching
      * fewer SHOULD clauses are rejected.
      */
    minShouldMatch: Int = 0,
    /** Score-cursor deep paging (IndexSearcher.searchAfter): only hits
      * strictly after (score, docId) in ranking order are returned, so
      * page N+1 re-runs the query with page N's last hit here and pages
      * concatenate into the full ranking without rescanning.
      */
    searchAfter: Option[(Double, Long)] = None)

/** One clause-TREE query in a batched searchTrees call (the tree analogue
  * of QuerySpec): an executable ClauseNode root plus the per-query top-k /
  * searchAfter-cursor parameters. Declared here (not in graft.search) so
  * batches serialize with the same Encoder machinery as QuerySpec.
  */
case class TreeQuery(
    qid: String,
    root: graft.search.ClauseNode,
    k: Int = 10,
    searchAfter: Option[(Double, Long)] = None)

/** Global collection statistics needed by BM25 (broadcast at query time). */
case class IndexStats(docCount: Long, sumTotalTermFreq: Long) {
  def avgdl: Double =
    if (docCount == 0) 0.0 else sumTotalTermFreq.toDouble / docCount.toDouble
}

object CorpusIds {
  /** docId = (corpusPartition << PartitionShift) | rowInPartition.
    * 40 bits of row => ~10^12 rows per partition headroom is not needed;
    * what matters is ~2^23 partitions x 2^40 rows total headroom at
    * 10^12-file scale, stable across resume (SURVEY.md §2.3 docID row).
    */
  val PartitionShift: Int = 40
  val RowMask: Long = (1L << PartitionShift) - 1L
  def docId(partition: Int, row: Long): Long = {
    require(row <= RowMask, s"partition row overflow: $row")
    (partition.toLong << PartitionShift) | row
  }
  def partitionOf(docId: Long): Int = (docId >>> PartitionShift).toInt
  def rowOf(docId: Long): Long = docId & RowMask
}
