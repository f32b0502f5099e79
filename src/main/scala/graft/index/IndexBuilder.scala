package graft.index

import graft._
import graft.core.{Analyzer, IntCodec, PostingBlocks, SmallFloatUtil}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator
import scala.collection.mutable

/** Build configuration (SURVEY.md §7.3 decision table). */
case class IndexConfig(
    blockSize: Int = PostingBlocks.BlockSize,
    /** df above which a term's merge group is salted across slices. */
    hotTermDf: Long = 100000L,
    /** target postings per salted slice of a hot term. */
    targetPostingsPerSlice: Long = 100000L,
    /** reduce-side parallelism of the segment-merge shuffle; 0 = session default. */
    mergePartitions: Int = 0,
    /** hot-term sets up to this size ride a driver map + broadcast; above
      * it the salting switches to a broadcast JOIN on the hot-term frame,
      * so the driver never materializes a 10^7-term Zipf head (VERDICT r2
      * what's-wrong #6).
      */
    hotMapMax: Int = 1000000,
    stopWords: Set[String] = Analyzer.EnglishStopWords,
    /** Index token positions (Lucene IndexOptions ..._AND_POSITIONS) —
      * enables index-only PhraseQuery/sloppy phrase; off keeps builds lean.
      */
    indexPositions: Boolean = false,
    /** Index character offsets per occurrence (Lucene IndexOptions
      * ..._AND_OFFSETS) — enables offsets-from-postings highlighting
      * without re-analysis; off keeps builds lean.
      */
    indexOffsets: Boolean = false,
    /** Additional analyzed fields (multi-field indexing, the edismax `qf`
      * substrate): each named SourceDoc metadata field gets its own
      * postings under `field<NUL>term` keys with per-field norms, sharing
      * the merge/salt machinery. Valid names: repo, path, commit, lang.
      */
    extraFields: Seq[String] = Nil,
    /** Per-task flush RAM budget in bytes, the IndexWriterConfig
      * setRAMBufferSizeMB analogue [B lucene/core/src/java/org/apache/lucene/index/IndexWriterConfig.java]:
      * once a flush task's in-memory postings reach this budget it drains
      * them as partials and starts a fresh TermsHash, so per-task live
      * memory is bounded by THIS — not by however many docs the input
      * layout packs into one scan split. Without it, a 110 MB single-row-
      * group parquet file means ~100k docs (~500 MB of postings + copies)
      * live per task; at 32 concurrent tasks that is a >15 GB churning live
      * set — measured as a 2.2x build slowdown at 12M docs from old-gen GC
      * storms + cache thrash (BENCH/BASELINE.md sf1 notes).
      */
    flushRamBytes: Long = 64L << 20)

object FieldOf {
  /** Terms of field `f` are stored as f + Sep + term; content is bare. */
  val Sep = '\u0000'
  def prefixed(field: String, term: String): String = s"$field$Sep$term"
  def extract(field: String): SourceDoc => String = field match {
    case "repo" => _.repo
    case "path" => _.path
    case "commit" => _.commit
    case "lang" => _.lang
    case other => throw new IllegalArgumentException(
      s"unknown extra field '$other' (repo|path|commit|lang)")
  }
}

/** Union row of the flush ("segment") output: one tokenize pass emits both
  * per-doc metadata (kind=0) and per-(term, partition) partial postings
  * (kind=1), exactly like a Lucene DWPT flush writes .nvd + .doc together
  * [B lucene/core/src/java/org/apache/lucene/index/DocumentsWriterPerThread.java].
  */
case class SegRow(kind: Int, meta: Option[DocMeta], partial: Option[PartialPostings])

/** The index write path (SURVEY.md §3.1):
  *
  *   corpus --mapPartitions--> SegRow segments        (flush; shared-nothing,
  *                                                     DWPT == Spark task)
  *   partials --repartition(term,salt)
  *            --sortWithinPartitions(term,salt,docPartition,firstDocId)
  *            --mapPartitions streaming merge-->      (the segment-merge
  *              TermPostings + lineage                 shuffle, BASELINE.json)
  *
  * Skew: terms whose corpus-wide df exceeds `hotTermDf` are salted across
  * docId-disjoint CONTIGUOUS docPartition ranges (salt = docPartition/span),
  * so no reduce task ever materializes a full hot-term posting list and the
  * slices concatenate in salt order into a valid single list. This is the
  * Spark-native answer to `the`/`if`/`return` at 10^12-file scale — Lucene
  * never faces it because its merges are single-node (SURVEY.md §2.3).
  */
object IndexBuilder {

  /** One tokenize pass over a corpus partition; docIds are
    * ((basePartition + partitionId) << 40 | row), stable across resume
    * because the parquet scan's partition ids are deterministic for a fixed
    * file set. `basePartition` keeps docIds disjoint across streaming
    * micro-batches, whose scans restart partition ids at 0.
    */
  def flushSegments(corpus: Dataset[SourceDoc], cfg: IndexConfig,
      basePartition: Int = 0, partitionCap: Int = Int.MaxValue,
      /** terms whose LOCAL df reaches this land in `hotCandidates` — a
        * byproduct of the flush pass (global df > H implies local df >
        * H/partitions somewhere, so the candidate set provably covers every
        * hot term; an exact filtered second pass confirms). Accumulator
        * duplicates/overcounts from task retries are harmless: candidacy is
        * set-semantics and the confirm pass recomputes exact dfs.
        */
      hotLocalThreshold: Long = Long.MaxValue,
      hotCandidates: Option[CollectionAccumulator[String]] = None): Dataset[SegRow] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val stop = cfg.stopWords
    corpus.mapPartitions { docs =>
      val localPid = TaskContext.get().partitionId()
      // streaming micro-batches space their docId ranges BatchPartitionSpan
      // partitions apart (Index.appendBatch) — a wider scan would silently
      // collide with the next batch's id space, so fail the batch instead
      require(localPid < partitionCap,
        s"micro-batch scan has >=${localPid + 1} partitions; max " +
          s"$partitionCap per batch (docId space collision)")
      val pid = basePartition + localPid
      val budgetBytes = math.max(1L, cfg.flushRamBytes)
      // Candidate completeness under chunking: a hot term's occurrences may
      // split across chunks with every chunk-local df below the threshold,
      // so candidacy is judged on the df accumulated ACROSS this task's
      // chunks — a counts-only term map (string + 8B), the same trade as a
      // Lucene DWPT keeping its term dict for the whole segment while
      // postings flush by RAM. Global df > H still implies task df > H /
      // scanParts somewhere, so the superset proof is unchanged.
      val trackCands = hotCandidates.isDefined && hotLocalThreshold != Long.MaxValue
      val cumDf: java.util.HashMap[String, java.lang.Long] =
        if (trackCands) new java.util.HashMap[String, java.lang.Long]() else null

      new Iterator[SegRow] {
        // DWPT-style in-memory inverted index for the CURRENT chunk; extra
        // analyzed fields get their own hash (per-field tf + norms)
        private var th: graft.core.TermsHash = null
        private var fieldTh: Seq[(String, SourceDoc => String, graft.core.TermsHash)] = null
        private var row = 0L // monotonic across chunks — docIds stay ascending
        private var draining: Iterator[SegRow] = Iterator.empty
        newChunk()

        private def newChunk(): Unit = {
          th = new graft.core.TermsHash(stop, cfg.indexPositions,
            cfg.indexOffsets)
          fieldTh = cfg.extraFields.map(f =>
            (f, FieldOf.extract(f), new graft.core.TermsHash(stop)))
        }

        private def partialRows(prefixField: String,
            hash: graft.core.TermsHash): Iterator[SegRow] =
          hash.termEntryIterator.map { e =>
            import e.{ids, tfs, norms, n, ttf, posDeltas, offDeltas}
            val term = if (prefixField == null) e.term
                       else FieldOf.prefixed(prefixField, e.term)
            if (trackCands) {
              val prev: Long = {
                val v = cumDf.get(term); if (v == null) 0L else v.longValue()
              }
              cumDf.put(term, prev + n)
              if (prev < hotLocalThreshold && prev + n >= hotLocalThreshold)
                hotCandidates.foreach(_.add(term))
            }
            val gaps = new Array[Int](n) // ids ascending (ingest order)
            val normArr = new Array[Int](n)
            var i = 1
            while (i < n) { gaps(i) = (ids(i) - ids(i - 1)).toInt; i += 1 }
            i = 0
            while (i < n) { normArr(i) = norms(i) & 0xff; i += 1 }
            SegRow(1, None, Some(PartialPostings(
              term = term,
              docPartition = pid,
              count = n,
              totalTf = ttf,
              firstDocId = if (n == 0) 0L else ids(0),
              docIdBytes = IntCodec.encode(gaps),
              tfBytes = IntCodec.encode(
                if (tfs.length == n) tfs else java.util.Arrays.copyOf(tfs, n)),
              normBytes = IntCodec.encode(normArr),
              posBytes = IntCodec.encode(
                if (posDeltas == null) Array.empty[Int] else posDeltas),
              offBytes = IntCodec.encode(
                if (offDeltas == null) Array.empty[Int] else offDeltas))))
          }

        /** Hand the chunk's hashes to a lazy drain and drop our references,
          * so the drained postings become garbage as the writer consumes
          * them — never a second materialized copy.
          */
        private def startDrain(): Unit = {
          val h = th
          val fh = fieldTh
          th = null
          fieldTh = null
          draining = partialRows(null, h) ++
            fh.iterator.flatMap { case (f, _, x) => partialRows(f, x) }
        }

        private def heldBytes: Long =
          th.approxBytes + fieldTh.iterator.map(_._3.approxBytes).sum

        def hasNext: Boolean = draining.hasNext || docs.hasNext

        def next(): SegRow = {
          if (draining.hasNext) return draining.next()
          if (th == null) newChunk()
          val d = docs.next()
          val docId = CorpusIds.docId(pid, row)
          row += 1
          val total = th.addDoc(d.content)
          val normByte = SmallFloatUtil.intToByte4(total)
          th.finishDoc(docId, normByte)
          fieldTh.foreach { case (_, get, fth) =>
            val ftotal = fth.addDoc(get(d))
            fth.finishDoc(docId, SmallFloatUtil.intToByte4(ftotal))
          }
          val meta = SegRow(0, Some(DocMeta(docId, d.repo, d.path, d.commit,
            d.lang, graft.corpus.CorpusGen.sha256Hex(d.content), total,
            normByte)), None)
          if (!docs.hasNext || heldBytes >= budgetBytes) startDrain()
          meta
        }
      }
    }
  }

  def decodePartial(p: PartialPostings): (Array[Long], Array[Int], Array[Byte]) = {
    val gaps = IntCodec.decode(p.docIdBytes, p.count)
    val docIds = new Array[Long](p.count)
    var acc = p.firstDocId
    var i = 0
    while (i < p.count) { acc += gaps(i); docIds(i) = acc; i += 1 }
    (docIds, IntCodec.decode(p.tfBytes, p.count),
      IntCodec.decode(p.normBytes, p.count).map(_.toByte))
  }

  /** The partial's flat positional delta stream (sum(tfs) ints), or null. */
  def decodePartialPositions(p: PartialPostings, tfs: Array[Int]): Array[Int] = {
    if (!PostingBlocks.hasPositions(p.posBytes)) return null
    var total = 0
    var i = 0
    while (i < tfs.length) { total += tfs(i); i += 1 }
    IntCodec.decode(p.posBytes, total)
  }

  /** The partial's flat offsets stream (2*sum(tfs) ints), or null. */
  def decodePartialOffsets(p: PartialPostings, tfs: Array[Int]): Array[Int] = {
    if (!PostingBlocks.hasOffsets(p.offBytes)) return null
    var total = 0
    var i = 0
    while (i < tfs.length) { total += 2 * tfs(i); i += 1 }
    IntCodec.decode(p.offBytes, total)
  }

  /** Number of salted slices for a term with corpus-wide doc frequency df. */
  def slicesFor(df: Long, cfg: IndexConfig): Int =
    if (df <= cfg.hotTermDf) 1
    else math.min(4096L, (df + cfg.targetPostingsPerSlice - 1) / cfg.targetPostingsPerSlice).toInt

  /** The segment-merge shuffle. `snapshotId` tags lineage rows.
    * `numPartitionsHint`: upper bound on docPartition+1, when the caller
    * knows it from the scan metadata — saves a whole small job; <= 0 falls
    * back to computing the max from the data (compact path).
    * `hotProvided`: the hot-term set (df > cfg.hotTermDf), either already
    * collected (Left) or as a (term, df) frame too big to collect (Right —
    * broadcast-join salting); None computes it here with its own stats job
    * (the commit path derives it from the termdict write instead, sharing
    * one vocabulary shuffle).
    */
  def mergePostings(partials: Dataset[PartialPostings], cfg: IndexConfig,
      snapshotId: Long,
      lineage: CollectionAccumulator[PartitionLineage],
      numPartitionsHint: Int = -1,
      hotProvided: Option[Either[Map[String, Long],
        org.apache.spark.sql.DataFrame]] = None): Dataset[TermPostings] = {
    val spark = partials.sparkSession
    import spark.implicits._

    // Pass 1 (small-row shuffle): corpus-wide df per term -> hot-term set.
    // Rows here are (term, count) pairs, NOT postings — cheap even for a
    // billion-term vocabulary; only the Zipf head survives the filter.
    val tStats = System.nanoTime()
    val hot: Either[Map[String, Long], org.apache.spark.sql.DataFrame] =
      hotProvided.getOrElse(Left(partials
        .groupBy($"term").agg(sum($"count").as("df"))
        .where($"df" > cfg.hotTermDf)
        .as[(String, Long)].collect().toMap))
    // any value >= max(docPartition)+1 yields a correct contiguous-range
    // salting (slices just fill unevenly), so the metadata hint is safe
    val numPartitions =
      if (numPartitionsHint > 0) numPartitionsHint
      else partials.select(max($"docPartition")).as[Option[Int]].head().getOrElse(-1) + 1
    if (sys.env.contains("GRAFT_PHASE_LOG"))
      println(f"[graft-phase] merge-stats ${(System.nanoTime() - tStats) / 1e9}%.2f s " +
        s"(hot=${hot.left.map(_.size).left.getOrElse(-1)}, parts=$numPartitions)")
    val mergeParts =
      if (cfg.mergePartitions > 0) cfg.mergePartitions
      else spark.sessionState.conf.numShufflePartitions

    val salted = hot match {
      case Left(hotTerms) =>
        // column-level salt over a broadcast map: a typed .map here would
        // deserialize + reserialize every partial (posting byte arrays
        // included) just to compute one small int — measured as a large
        // share of merge map-side CPU at 12M docs. The udf touches only
        // (term, docPartition); the row rides through in Tungsten form.
        val hotB = spark.sparkContext.broadcast(hotTerms)
        val saltOf = udf { (term: String, docPartition: Int) =>
          val slices = hotB.value.get(term).map(slicesFor(_, cfg)).getOrElse(1)
          val span = math.max(1, (numPartitions + slices - 1) / slices)
          docPartition / span
        }
        val pdf = partials.toDF()
        pdf.select($"term", saltOf($"term", $"docPartition").as("salt"),
          struct(pdf.columns.map(col).toIndexedSeq: _*).as("p"))
      case Right(hotDf) =>
        // Zipf head too large for the driver: salt via a broadcast left
        // join on the hot frame (null df -> cold -> 1 slice). Identical
        // arithmetic to the map path, asserted by the equivalence test.
        val saltOf = udf { (df: java.lang.Long, docPartition: Int) =>
          val slices = if (df == null) 1 else slicesFor(df.longValue(), cfg)
          val span = math.max(1, (numPartitions + slices - 1) / slices)
          docPartition / span
        }
        val pdf = partials.toDF()
        pdf.join(broadcast(hotDf.select($"term", $"df".as("_hot_df"))),
            Seq("term"), "left")
          .select($"term", saltOf($"_hot_df", $"docPartition").as("salt"),
            struct(pdf.columns.map(col).toIndexedSeq: _*).as("p"))
    }

    // Sort-based shuffle does the k-way merge: within each reduce partition,
    // partials of a (term, salt) group arrive contiguous and in
    // (docPartition, firstDocId) order (== docId order — the firstDocId
    // tiebreak orders the RAM-budget flush chunks of one scan partition),
    // so the merge is a single streaming pass.
    if (sys.env.contains("GRAFT_PHASE_LOG"))
      println(f"[graft-phase] merge-plan +${(System.nanoTime() - tStats) / 1e9}%.2f s")
    val blockSize = cfg.blockSize
    salted
      .repartition(mergeParts, $"term", $"salt")
      .sortWithinPartitions($"term", $"salt", $"p.docPartition", $"p.firstDocId")
      .as[(String, Int, PartialPostings)]
      .mapPartitions { it =>
        val t0 = System.nanoTime()
        val pid = TaskContext.get().partitionId()
        var termLo: String = null
        var termHi: String = null
        var bytes = 0L
        var docCount = 0L
        var termCount = 0L

        val mergedIt = new Iterator[TermPostings] {
          private var cur: (String, Int, PartialPostings) = null
          private def emit(key: (String, Int),
              buf: mutable.ArrayBuffer[PartialPostings]): TermPostings = {
            val blocks = buf.iterator.flatMap { p =>
              val (ids, tfs, norms) = decodePartial(p)
              PostingBlocks.build(ids, tfs, norms, blockSize,
                decodePartialPositions(p, tfs),
                decodePartialOffsets(p, tfs))
            }.toVector
            val df = buf.iterator.map(_.count.toLong).sum
            val ttf = buf.iterator.map(_.totalTf).sum
            if (termLo == null || key._1 < termLo) termLo = key._1
            if (termHi == null || key._1 > termHi) termHi = key._1
            bytes += blocks.iterator.map(b => b.docIdBytes.length.toLong +
              b.tfBytes.length + b.normBytes.length + b.impactTfBytes.length +
              b.impactNormBytes.length).sum
            docCount += df
            termCount += 1
            TermPostings(key._1, key._2, df, ttf, blocks)
          }
          def hasNext: Boolean = cur != null || it.hasNext
          def next(): TermPostings = {
            if (cur == null) cur = it.next()
            val key = (cur._1, cur._2)
            val buf = mutable.ArrayBuffer(cur._3)
            cur = null
            var done = false
            while (!done && it.hasNext) {
              val n = it.next()
              if ((n._1, n._2) == key) buf += n._3
              else { cur = n; done = true }
            }
            emit(key, buf)
          }
        }

        // wrap to add the lineage row after the partition drains
        new Iterator[TermPostings] {
          private var finished = false
          def hasNext: Boolean = {
            val h = mergedIt.hasNext
            if (!h && !finished) {
              finished = true
              lineage.add(PartitionLineage(snapshotId, "merge", pid,
                if (termLo == null) "" else termLo,
                if (termHi == null) "" else termHi,
                bytes, docCount, termCount,
                (System.nanoTime() - t0) / 1000000L))
            }
            h
          }
          def next(): TermPostings = mergedIt.next()
        }
      }
  }
}
