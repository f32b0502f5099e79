package graft.core

import graft.PostingBlock

/** Builds/decodes 128-doc compressed posting blocks (SURVEY.md §2.4).
  *
  * Layout per block (vs Lucene's Lucene84 .doc format
  * [B lucene/core/src/java/org/apache/lucene/codecs/lucene84/Lucene84PostingsFormat.java]):
  * docIds as delta gaps (FOR/VByte), tfs, and — a deliberate Spark-native
  * addition — the posting's norm byte, so the scorer is self-contained and
  * the query path needs no per-doc norms join (Lucene keeps norms in a
  * separate .nvd file; at 10^12 docs the extra packed ~byte/posting is
  * cheaper than a docId-range shuffle of norms at query time).
  * `firstDocId`/`lastDocId` per block form the flattened 1-level skip list;
  * the competitive (tf, norm) skyline feeds the block-max WAND bound.
  *
  * Blocks never span corpus partitions: the builder is called once per
  * (term, docPartition) partial, so every block's docs share one docId
  * bucket (docId >> CorpusIds.PartitionShift).
  */
object PostingBlocks {

  val BlockSize = 128

  /** Competitive-impact skyline: pairs (tf, normByte) such that no other
    * posting in the block has both tf' >= tf and unsigned(norm') <=
    * unsigned(norm). BM25 score rises with tf and falls with doc length (the
    * norm byte encoding is monotone in length), so the max score over the
    * block for ANY (k1, b, idf, avgdl) is attained on this skyline.
    * Returned sorted by tf ascending / norm ascending.
    */
  def competitiveSkyline(tfs: Array[Int], norms: Array[Int]): (Array[Int], Array[Int]) = {
    val n = tfs.length
    // pack (tf, norm) into sortable longs: tf desc would need reversal, so
    // sort ascending by (tf, norm) and scan from the end (no hash/tree maps
    // — this runs once per posting block across the whole merge shuffle)
    val packed = new Array[Long](n)
    var i = 0
    while (i < n) {
      packed(i) = (tfs(i).toLong << 16) | norms(i).toLong
      i += 1
    }
    java.util.Arrays.sort(packed)
    val outTf = new Array[Int](n)
    val outNorm = new Array[Int](n)
    var k = 0
    var best = Int.MaxValue
    i = n - 1
    while (i >= 0) {
      val tf = (packed(i) >>> 16).toInt
      val norm = (packed(i) & 0xffffL).toInt
      // first (== smallest-norm) entry of each tf group survives if it
      // strictly improves the best norm seen among higher tfs
      if ((i == 0 || (packed(i - 1) >>> 16) != packed(i) >>> 16) && norm < best) {
        outTf(k) = tf
        outNorm(k) = norm
        best = norm
        k += 1
      }
      i -= 1
    }
    // reverse into tf-ascending order
    val rTf = new Array[Int](k)
    val rNorm = new Array[Int](k)
    i = 0
    while (i < k) { rTf(i) = outTf(k - 1 - i); rNorm(i) = outNorm(k - 1 - i); i += 1 }
    (rTf, rNorm)
  }

  /** Encode one partial posting list (docIds ascending, same partition).
    * `posDeltas` is the optional flat positional stream (per-doc deltas,
    * concatenated in docId order, sum(tfs) ints) — sliced per block at doc
    * boundaries, so the per-doc delta groups survive re-blocking intact.
    */
  def build(docIds: Array[Long], tfs: Array[Int], norms: Array[Byte],
      blockSize: Int = BlockSize,
      posDeltas: Array[Int] = null,
      offDeltas: Array[Int] = null): Seq[PostingBlock] = {
    require(docIds.length == tfs.length && tfs.length == norms.length)
    val out = Vector.newBuilder[PostingBlock]
    var start = 0
    var posOff = 0
    var offOff = 0
    while (start < docIds.length) {
      val n = math.min(blockSize, docIds.length - start)
      val gaps = new Array[Int](n)
      val btf = new Array[Int](n)
      val bnorm = new Array[Int](n)
      val bnormBytes = new Array[Byte](n)
      var i = 0
      var prev = docIds(start)
      while (i < n) {
        val d = docIds(start + i)
        val gap = d - prev
        require(gap >= 0 && gap <= Int.MaxValue, s"docId gap overflow: $gap")
        require(i == 0 || gap > 0, "docIds must be strictly increasing")
        gaps(i) = gap.toInt
        btf(i) = tfs(start + i)
        bnorm(i) = norms(start + i) & 0xff
        bnormBytes(i) = norms(start + i)
        prev = d
        i += 1
      }
      val (skyTf, skyNorm) = competitiveSkyline(btf, bnorm)
      val posBytes =
        if (posDeltas == null) IntCodec.encode(Array.empty[Int])
        else {
          var nPos = 0
          var j = 0
          while (j < n) { nPos += btf(j); j += 1 }
          val slice = java.util.Arrays.copyOfRange(posDeltas, posOff, posOff + nPos)
          posOff += nPos
          IntCodec.encode(slice)
        }
      val offBytes =
        if (offDeltas == null) IntCodec.encode(Array.empty[Int])
        else {
          var nOff = 0
          var j = 0
          while (j < n) { nOff += 2 * btf(j); j += 1 }
          val slice = java.util.Arrays.copyOfRange(offDeltas, offOff, offOff + nOff)
          offOff += nOff
          IntCodec.encode(slice)
        }
      out += PostingBlock(
        firstDocId = docIds(start),
        lastDocId = docIds(start + n - 1),
        count = n,
        impactCount = skyTf.length,
        impactTfBytes = IntCodec.encode(skyTf),
        impactNormBytes = IntCodec.encode(skyNorm),
        docIdBytes = IntCodec.encode(gaps),
        tfBytes = IntCodec.encode(btf),
        normBytes = IntCodec.encode(bnorm),
        posBytes = posBytes,
        offBytes = offBytes)
      start += n
    }
    out.result()
  }

  /** True when a block (or partial) carries positional postings: the codec
    * header alone (1 byte) means "positions off".
    */
  @inline def hasPositions(posBytes: Array[Byte]): Boolean =
    posBytes != null && posBytes.length > 1

  /** Decode a block's flat positional delta stream to ABSOLUTE positions per
    * posting: positions(i) has tfs(i) ascending raw token positions.
    * Returns null when the block has no positions.
    */
  def decodePositions(b: PostingBlock, tfs: Array[Int]): Array[Array[Int]] = {
    if (!hasPositions(b.posBytes)) return null
    var total = 0
    var i = 0
    while (i < tfs.length) { total += tfs(i); i += 1 }
    val flat = IntCodec.decode(b.posBytes, total)
    val out = new Array[Array[Int]](tfs.length)
    var o = 0
    i = 0
    while (i < tfs.length) {
      val ps = new Array[Int](tfs(i))
      var t = 0
      var acc = 0
      while (t < tfs(i)) {
        acc += flat(o + t)
        ps(t) = acc
        t += 1
      }
      out(i) = ps
      o += tfs(i)
      i += 1
    }
    out
  }

  /** True when a block (or partial) carries character offsets. */
  @inline def hasOffsets(offBytes: Array[Byte]): Boolean =
    offBytes != null && offBytes.length > 1

  /** Decode a block's offsets stream to ABSOLUTE (start, end) pairs per
    * posting: offsets(i) has tfs(i) pairs in occurrence order. Returns
    * null when the block has no offsets.
    */
  def decodeOffsets(b: PostingBlock, tfs: Array[Int]): Array[Array[(Int, Int)]] = {
    if (!hasOffsets(b.offBytes)) return null
    var total = 0
    var i = 0
    while (i < tfs.length) { total += 2 * tfs(i); i += 1 }
    val flat = IntCodec.decode(b.offBytes, total)
    val out = new Array[Array[(Int, Int)]](tfs.length)
    var o = 0
    i = 0
    while (i < tfs.length) {
      val ps = new Array[(Int, Int)](tfs(i))
      var t = 0
      var acc = 0
      while (t < tfs(i)) {
        acc += flat(o + 2 * t)
        ps(t) = (acc, acc + flat(o + 2 * t + 1))
        t += 1
      }
      out(i) = ps
      o += 2 * tfs(i)
      i += 1
    }
    out
  }

  /** Decode a block to (docIds, tfs, normBytes). */
  def decode(b: PostingBlock): (Array[Long], Array[Int], Array[Byte]) = {
    val gaps = IntCodec.decode(b.docIdBytes, b.count)
    val tfs = IntCodec.decode(b.tfBytes, b.count)
    val normsI = IntCodec.decode(b.normBytes, b.count)
    val docIds = new Array[Long](b.count)
    var acc = b.firstDocId
    var i = 0
    while (i < b.count) {
      acc += gaps(i)
      docIds(i) = acc
      i += 1
    }
    (docIds, tfs, normsI.map(_.toByte))
  }

  /** Block-max bound: max score over the block's competitive skyline with
    * the CURRENT weight and norm table, under ANY Similarity whose score is
    * increasing in tf and decreasing in doc length (the skyline covers
    * exactly the non-dominated (tf, norm) pairs, so the max is exact).
    */
  def blockBound(b: PostingBlock, sim: Similarity, weight: Double,
      table: Array[Double]): Double = {
    val tfs = IntCodec.decode(b.impactTfBytes, b.impactCount)
    val norms = IntCodec.decode(b.impactNormBytes, b.impactCount)
    var best = 0.0
    var i = 0
    while (i < b.impactCount) {
      val s = sim.score(weight, tfs(i), table(norms(i)))
      if (s > best) best = s
      i += 1
    }
    best
  }
}
