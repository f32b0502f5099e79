package graft.core

/** Per-task in-memory inverted index — the DWPT TermsHashPerField analogue
  * [B lucene/core/src/java/org/apache/lucene/index/TermsHashPerField.java].
  *
  * Hot-path properties (this is where 100 TB of text gets tokenized):
  *  - tokens are probed as (content, start, end) char ranges with on-the-fly
  *    ASCII case folding — a String is allocated only ONCE per distinct term
  *    per task, not per occurrence;
  *  - per-doc tf counting is generation-stamped arrays, no per-doc maps;
  *  - postings accumulate into unboxed growable parallel arrays.
  *
  * The token definition matches Analyzer.tokenize exactly (runs of
  * [A-Za-z0-9_], 255-char cap, ASCII lowercase) — property-tested
  * equivalence in CoreCodecSpec.
  */
final class TermsHash(stopWords: Set[String],
    /** Record raw token positions per posting (IndexOptions-style opt-in,
      * SURVEY.md §2.2 positions row): stop words advance the position
      * counter but emit nothing — StopFilter position-increment holes.
      */
    trackPositions: Boolean = false,
    /** Record character offsets per occurrence (Lucene IndexOptions
      * ..._AND_OFFSETS, [B lucene/core/.../analysis/tokenattributes/
      * OffsetAttribute.java]): per occurrence a (startDelta, length) pair
      * — startDelta from the previous occurrence's start within the doc
      * (first is absolute), exactly the .pay-file shape Lucene's
      * offsets-from-postings highlighter reads.
      */
    trackOffsets: Boolean = false) {

  private var capacity = 1 << 14 // power of two
  private var table: Array[Int] = Array.fill(capacity)(-1)

  private var termArr = new Array[String](1 << 12)
  private var hashArr = new Array[Int](1 << 12)
  private var stopArr = new Array[Boolean](1 << 12)
  private var lastDocSeen = new Array[Int](1 << 12)
  private var docTf = new Array[Int](1 << 12)
  private var lastPosInDoc = new Array[Int](1 << 12)
  private var postIds = new Array[Array[Long]](1 << 12)
  private var postTfs = new Array[Array[Int]](1 << 12)
  private var postNorms = new Array[Array[Byte]](1 << 12)
  private var postN = new Array[Int](1 << 12)
  private var postTtf = new Array[Long](1 << 12)
  // per-term flat positional stream (per-doc deltas) + its length
  private var postPos = new Array[Array[Int]](1 << 12)
  private var postPosN = new Array[Int](1 << 12)
  // per-term flat offsets stream: (startDelta, len) per occurrence
  private var postOff = new Array[Array[Int]](1 << 12)
  private var postOffN = new Array[Int](1 << 12)
  private var lastOffInDoc = new Array[Int](1 << 12)
  var numTerms = 0

  private var docSerial = 0
  private var touched = new Array[Int](1 << 12)
  private var numTouched = 0

  /** Approximate live bytes held by accumulated postings — the flush
    * RAM-budget signal (IndexConfig.flushRamBytes). Counts posting slots
    * (docId 8 + tf 4 + norm 1), tracked positions (4 each), and term-string
    * overhead; ignores growth slack, so budget checks should leave
    * headroom.
    */
  private var bytesHeld: Long = 0L
  def approxBytes: Long = bytesHeld

  @inline private def fold(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def hashRange(s: String, a: Int, b: Int): Int = {
    var h = 0x811c9dc5
    var i = a
    while (i < b) {
      h ^= fold(s.charAt(i))
      h *= 0x01000193
      i += 1
    }
    h & 0x7fffffff
  }

  private def equalsRange(term: String, s: String, a: Int, b: Int): Boolean = {
    if (term.length != b - a) return false
    var i = 0
    while (i < term.length) {
      if (term.charAt(i) != fold(s.charAt(a + i))) return false
      i += 1
    }
    true
  }

  private def growTerms(): Unit = {
    val cap = termArr.length * 2
    termArr = java.util.Arrays.copyOf(termArr, cap)
    hashArr = java.util.Arrays.copyOf(hashArr, cap)
    stopArr = java.util.Arrays.copyOf(stopArr, cap)
    lastDocSeen = java.util.Arrays.copyOf(lastDocSeen, cap)
    docTf = java.util.Arrays.copyOf(docTf, cap)
    lastPosInDoc = java.util.Arrays.copyOf(lastPosInDoc, cap)
    postIds = java.util.Arrays.copyOf(postIds, cap)
    postTfs = java.util.Arrays.copyOf(postTfs, cap)
    postNorms = java.util.Arrays.copyOf(postNorms, cap)
    postN = java.util.Arrays.copyOf(postN, cap)
    postTtf = java.util.Arrays.copyOf(postTtf, cap)
    postPos = java.util.Arrays.copyOf(postPos, cap)
    postPosN = java.util.Arrays.copyOf(postPosN, cap)
    postOff = java.util.Arrays.copyOf(postOff, cap)
    postOffN = java.util.Arrays.copyOf(postOffN, cap)
    lastOffInDoc = java.util.Arrays.copyOf(lastOffInDoc, cap)
  }

  private def rehash(): Unit = {
    capacity *= 2
    val t = Array.fill(capacity)(-1)
    var id = 0
    while (id < numTerms) {
      var slot = hashArr(id) & (capacity - 1)
      while (t(slot) != -1) slot = (slot + 1) & (capacity - 1)
      t(slot) = id
      id += 1
    }
    table = t
  }

  private def lookupOrAdd(s: String, a: Int, b: Int): Int = {
    val h = hashRange(s, a, b)
    var slot = h & (capacity - 1)
    while (true) {
      val id = table(slot)
      if (id == -1) {
        // new term: materialize the folded string exactly once
        if (numTerms == termArr.length) growTerms()
        val chars = new Array[Char](b - a)
        var i = 0
        while (i < chars.length) { chars(i) = fold(s.charAt(a + i)); i += 1 }
        val term = new String(chars)
        val nid = numTerms
        numTerms += 1
        bytesHeld += 48L + 2L * term.length
        termArr(nid) = term
        hashArr(nid) = h
        stopArr(nid) = stopWords.contains(term)
        lastDocSeen(nid) = -1
        table(slot) = nid
        if (numTerms * 2 > capacity) rehash()
        return nid
      }
      if (hashArr(id) == h && equalsRange(termArr(id), s, a, b)) return id
      slot = (slot + 1) & (capacity - 1)
    }
    -1 // unreachable
  }

  /** Tokenize + count one document. Returns the post-stop token count;
    * call finishDoc afterwards with the norm byte derived from it.
    */
  def addDoc(content: String): Int = {
    docSerial += 1
    numTouched = 0
    var count = 0
    var rawPos = 0 // raw token index; stop words advance it (posInc holes)
    if (content == null) return 0
    val n = content.length
    var i = 0
    while (i < n) {
      while (i < n && !isTokenChar(content.charAt(i))) i += 1
      val start = i
      while (i < n && isTokenChar(content.charAt(i)) &&
        i - start < Analyzer.MaxTokenLength) i += 1
      if (i > start) {
        val id = lookupOrAdd(content, start, i)
        if (!stopArr(id)) {
          if (lastDocSeen(id) != docSerial) {
            lastDocSeen(id) = docSerial
            docTf(id) = 0
            if (numTouched == touched.length)
              touched = java.util.Arrays.copyOf(touched, touched.length * 2)
            touched(numTouched) = id
            numTouched += 1
          }
          if (trackPositions) {
            // per-doc delta: first occurrence stores the absolute position
            val delta =
              if (docTf(id) == 0) rawPos else rawPos - lastPosInDoc(id)
            lastPosInDoc(id) = rawPos
            var ps = postPos(id)
            if (ps == null) { ps = new Array[Int](4); postPos(id) = ps }
            else if (postPosN(id) == ps.length) {
              ps = java.util.Arrays.copyOf(ps, ps.length * 2)
              postPos(id) = ps
            }
            ps(postPosN(id)) = delta
            postPosN(id) += 1
            bytesHeld += 4L
          }
          if (trackOffsets) {
            // (startDelta, len) per occurrence, start deltas per doc
            val sDelta =
              if (docTf(id) == 0) start else start - lastOffInDoc(id)
            lastOffInDoc(id) = start
            var os = postOff(id)
            if (os == null) { os = new Array[Int](8); postOff(id) = os }
            else if (postOffN(id) + 2 > os.length) {
              os = java.util.Arrays.copyOf(os, os.length * 2)
              postOff(id) = os
            }
            os(postOffN(id)) = sDelta
            os(postOffN(id) + 1) = i - start
            postOffN(id) += 2
            bytesHeld += 8L
          }
          docTf(id) += 1
          count += 1
        }
        rawPos += 1
      }
    }
    count
  }

  /** Append this doc's postings (after addDoc). */
  def finishDoc(docId: Long, normByte: Byte): Unit = {
    var t = 0
    while (t < numTouched) {
      val id = touched(t)
      var ids = postIds(id)
      if (ids == null) {
        ids = new Array[Long](4)
        postIds(id) = ids
        postTfs(id) = new Array[Int](4)
        postNorms(id) = new Array[Byte](4)
      } else if (postN(id) == ids.length) {
        val cap = ids.length * 2
        ids = java.util.Arrays.copyOf(ids, cap)
        postIds(id) = ids
        postTfs(id) = java.util.Arrays.copyOf(postTfs(id), cap)
        postNorms(id) = java.util.Arrays.copyOf(postNorms(id), cap)
      }
      val k = postN(id)
      ids(k) = docId
      postTfs(id)(k) = docTf(id)
      postNorms(id)(k) = normByte
      postN(id) = k + 1
      postTtf(id) += docTf(id)
      t += 1
    }
    bytesHeld += 13L * numTouched
  }

  /** Iterate accumulated per-term postings (term, docIds, tfs, norms, n, ttf).
    * Stop terms have n == 0 and are skipped.
    */
  def foreachTerm(f: (String, Array[Long], Array[Int], Array[Byte], Int, Long) => Unit): Unit = {
    var id = 0
    while (id < numTerms) {
      if (postN(id) > 0)
        f(termArr(id), postIds(id), postTfs(id), postNorms(id), postN(id), postTtf(id))
      id += 1
    }
  }

  import TermsHash.TermEntry

  /** Iterator form of foreachTermWithPositions: lets the flush path drain
    * a chunk's postings lazily into the parquet writer instead of
    * materializing a second full copy of the partition's inverted data
    * (the sf1 32-thread GC-cliff fix). Mutating the hash while an iterator
    * is live is undefined; drain fully, then discard the hash.
    */
  def termEntryIterator: Iterator[TermEntry] = new Iterator[TermEntry] {
    private var id = 0
    private def skip(): Unit = { while (id < numTerms && postN(id) == 0) id += 1 }
    skip()
    def hasNext: Boolean = id < numTerms
    def next(): TermEntry = {
      val ps =
        if (!trackPositions || postPos(id) == null) null
        else java.util.Arrays.copyOf(postPos(id), postPosN(id))
      val os =
        if (!trackOffsets || postOff(id) == null) null
        else java.util.Arrays.copyOf(postOff(id), postOffN(id))
      val e = TermEntry(termArr(id), postIds(id), postTfs(id), postNorms(id),
        postN(id), postTtf(id), ps, os)
      id += 1
      skip()
      e
    }
  }

  /** foreachTerm variant that also hands over the sized positional stream
    * (posting i owns the next tfs(i) deltas).
    */
  def foreachTermWithPositions(
      f: (String, Array[Long], Array[Int], Array[Byte], Int, Long, Array[Int]) => Unit): Unit = {
    var id = 0
    while (id < numTerms) {
      if (postN(id) > 0) {
        val ps =
          if (!trackPositions || postPos(id) == null) null
          else java.util.Arrays.copyOf(postPos(id), postPosN(id))
        f(termArr(id), postIds(id), postTfs(id), postNorms(id), postN(id),
          postTtf(id), ps)
      }
      id += 1
    }
  }
}

object TermsHash {
  /** One accumulated term's postings, handed over by termEntryIterator.
    * `ids`/`tfs`/`norms` may carry growth slack beyond `n`.
    */
  final case class TermEntry(term: String, ids: Array[Long], tfs: Array[Int],
      norms: Array[Byte], n: Int, ttf: Long, posDeltas: Array[Int],
      /** (startDelta, len) pairs, 2 ints per occurrence; null if offsets off. */
      offDeltas: Array[Int] = null)
}
