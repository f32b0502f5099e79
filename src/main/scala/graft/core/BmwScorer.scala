package graft.core

import graft.PostingBlock

/** Partition-local block-max WAND top-k evaluation
  * [B lucene/core/src/java/org/apache/lucene/search/WANDScorer.java]
  * [B lucene/core/src/java/org/apache/lucene/search/MaxScoreCache.java].
  *
  * Runs inside one Spark task over the posting blocks of one docId bucket
  * (all blocks of a bucket share a corpus partition, so doc-at-a-time
  * evaluation never crosses tasks). Spark contributes the bucket
  * parallelism and the final exact top-k merge (`orderBy(score desc,
  * docId asc).limit(k)` == Lucene's TopDocs.merge, SURVEY.md §3.2).
  *
  * Rank-correctness of the pruning: docs are visited in ascending docId
  * order, so any new candidate loses a score tie against every doc already
  * in the heap (tie-break is docId asc) — pruning candidates with upper
  * bound <= theta is therefore exact, same argument as Lucene's
  * TopScoreDocCollector.setMinCompetitiveScore feedback loop.
  */
object BmwScorer {

  val NoMoreDocs: Long = Long.MaxValue

  /** Cross-leaf min-competitive score sharing — the MaxScoreAccumulator
    * role [B lucene/core/src/java/org/apache/lucene/search/
    * MaxScoreAccumulator.java, TopScoreDocCollector.java]: concurrent
    * bucket tasks collecting the SAME query publish their kth-best score
    * into a shared JVM slot, so a task whose local heap is still filling
    * prunes with the best theta any sibling has reached instead of 0.
    * Spark scoping: tasks of one executor share the JVM (local[n] = all of
    * them), so sharing is per-executor — best-effort, like Lucene's, and
    * exactly the part of the work a cluster can share without an RPC.
    *
    * Tie soundness: a remote theta is applied via nextDown (strictly-less
    * pruning), so a doc scoring EXACTLY theta in another partition — which
    * could still win the global (score desc, docId asc) tie-break — is
    * never pruned remotely. Slots are score-bit CAS-max AtomicLongs in a
    * bounded FIFO-evicted map (stale query keys age out; eviction only
    * loses the optimization, never correctness).
    */
  object ThetaBoard {
    private val MaxEntries = 4096
    private val NegInfBits = java.lang.Double.doubleToLongBits(Double.NegativeInfinity)
    private val map =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    private val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    def slot(key: String): java.util.concurrent.atomic.AtomicLong = {
      // eviction runs AFTER computeIfAbsent returns: ConcurrentHashMap
      // forbids mutating other mappings inside the mapping function — two
      // tasks at the cap each holding one bin lock while removing a key in
      // the other's bin would deadlock the query hot path (ADVICE r5).
      var created = false
      val s = map.computeIfAbsent(key, _ => {
        created = true
        new java.util.concurrent.atomic.AtomicLong(NegInfBits)
      })
      if (created) {
        order.add(key)
        while (map.size > MaxEntries) {
          val old = order.poll()
          if (old != null) map.remove(old)
        }
      }
      s
    }

    def publish(s: java.util.concurrent.atomic.AtomicLong, v: Double): Unit = {
      var cur = s.get
      while (java.lang.Double.longBitsToDouble(cur) < v &&
        !s.compareAndSet(cur, java.lang.Double.doubleToLongBits(v))) cur = s.get
    }

    def read(s: java.util.concurrent.atomic.AtomicLong): Double =
      java.lang.Double.longBitsToDouble(s.get)
  }

  /** Bounded min-heap of (score, docId), worst = (lowest score, highest
    * docId). Capacity grows lazily toward k, so an "unbounded" collector
    * (k = Int.MaxValue, e.g. phrase-candidate gathering) costs only what it
    * actually holds.
    */
  final class TopKHeap(k: Int,
      /** searchAfter cursor [B .../search/IndexSearcher.java#searchAfter]:
        * only hits STRICTLY after (afterScore, afterDoc) in ranking order
        * (score desc, docId asc) are admitted — deep pages re-run the query
        * with the previous page's last hit as the cursor and never see
        * earlier hits. Defaults admit everything.
        */
      afterScore: Double = Double.PositiveInfinity,
      afterDoc: Long = -1L) {
    require(k > 0)
    private var scores = new Array[Double](math.min(k, 1024))
    private var docs = new Array[Long](math.min(k, 1024))
    private var n = 0

    /** true when (score, docId) ranks at-or-before the cursor. */
    @inline private def beforeCursor(score: Double, docId: Long): Boolean =
      score > afterScore || (score == afterScore && docId <= afterDoc)

    private def ensureCapacity(): Unit = {
      if (n == scores.length && n < k) {
        val cap = math.min(k.toLong, scores.length.toLong * 2).toInt
        scores = java.util.Arrays.copyOf(scores, cap)
        docs = java.util.Arrays.copyOf(docs, cap)
      }
    }

    def size: Int = n
    def full: Boolean = n == k

    /** Optional ThetaBoard slot for cross-task sharing (set via
      * shareTheta): read into theta strictly-down, published on every
      * kth-score improvement.
      */
    private var sharedSlot: java.util.concurrent.atomic.AtomicLong = null

    /** Attach this heap to a shared theta slot keyed by (searchEpoch, qid). */
    def shareTheta(key: String): this.type = {
      sharedSlot = ThetaBoard.slot(key)
      this
    }

    @inline private def publishTheta(): Unit =
      if (sharedSlot != null && full) ThetaBoard.publish(sharedSlot, scores(0))

    /** Current threshold: kth best score, or -inf while not full. (-inf,
      * not 0: LM Dirichlet's clamped model scores exactly 0, and a
      * 0-threshold would prune zero-score docs the collector must still
      * admit while filling — Lucene sets minCompetitiveScore only once
      * the queue is full for the same reason.) With a shared slot, a
      * sibling task's kth score raises the floor STRICTLY (nextDown): an
      * exact-theta doc here may still win the global docId tie-break.
      */
    def theta: Double = {
      val local = if (full) scores(0) else Double.NegativeInfinity
      if (sharedSlot == null) local
      else {
        val remote = ThetaBoard.read(sharedSlot)
        if (remote == Double.NegativeInfinity) local
        else math.max(local, Math.nextDown(remote))
      }
    }

    @inline private def worse(i: Int, j: Int): Boolean =
      scores(i) < scores(j) || (scores(i) == scores(j) && docs(i) > docs(j))

    private def siftDown(start: Int): Unit = {
      var i = start
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && worse(l, m)) m = l
        if (r < n && worse(r, m)) m = r
        if (m == i) return
        val ts = scores(i); scores(i) = scores(m); scores(m) = ts
        val td = docs(i); docs(i) = docs(m); docs(m) = td
        i = m
      }
    }

    /** Insert; docIds arrive ascending so equal scores never displace. */
    def offer(score: Double, docId: Long): Unit = {
      if (beforeCursor(score, docId)) return
      ensureCapacity()
      if (!full) {
        scores(n) = score; docs(n) = docId; n += 1
        var i = n - 1
        while (i > 0 && worse(i, (i - 1) / 2)) {
          val p = (i - 1) / 2
          val ts = scores(i); scores(i) = scores(p); scores(p) = ts
          val td = docs(i); docs(i) = docs(p); docs(p) = td
          i = p
        }
        publishTheta() // just became full -> first shared floor
      } else if (score > scores(0)) {
        scores(0) = score; docs(0) = docId
        siftDown(0)
        publishTheta()
      }
    }

    /** Insert when docIds arrive in ARBITRARY order (distributed merge):
      * an equal-score, lower-docId candidate must displace the current
      * worst — the ascending-docId shortcut in `offer` would drop it.
      */
    def offerUnordered(score: Double, docId: Long): Unit = {
      if (beforeCursor(score, docId)) return
      if (!full) offer(score, docId)
      else if (score > scores(0) ||
        (score == scores(0) && docId < docs(0))) {
        scores(0) = score; docs(0) = docId
        siftDown(0)
        publishTheta()
      }
    }

    /** Results ordered score desc, docId asc. */
    def drain(): Array[(Long, Double)] = {
      val out = new Array[(Long, Double)](n)
      var i = 0
      while (i < n) { out(i) = (docs(i), scores(i)); i += 1 }
      out.sortBy { case (d, s) => (-s, d) }
    }
  }

  /** Streaming iterator over one term's blocks within a bucket.
    * `weight` = boost * idf(globalDf, docCount); `cache` =
    * Bm25.normCache(avgdl). Block bounds come from the stored competitive
    * impact skylines evaluated against the current weight/cache (memoized
    * per block), so bounds are always consistent with current global stats.
    */
  final class TermIterator(
      val weight: Double,
      cache: Array[Double],
      blocks: Array[PostingBlock],
      /** stable clause index within the query — fixes summation order */
      val tag: Int = 0,
      /** scoring model; block bounds stay admissible for any monotone one */
      sim: Similarity = Bm25()) {

    private val boundsMemo = Array.fill(blocks.length)(Double.NaN)

    @inline private def boundOf(idx: Int): Double = {
      var b = boundsMemo(idx)
      if (b.isNaN) {
        b = PostingBlocks.blockBound(blocks(idx), sim, weight, cache)
        boundsMemo(idx) = b
      }
      b
    }

    /** Term-level score upper bound (max over block bounds). */
    lazy val maxScore: Double = {
      var m = 0.0
      var i = 0
      while (i < blocks.length) {
        val b = boundOf(i)
        if (b > m) m = b
        i += 1
      }
      m
    }

    private var blockIdx = 0
    private var pos = -1
    private var docIds: Array[Long] = null
    private var tfs: Array[Int] = null
    private var norms: Array[Byte] = null
    private var posPerPosting: Array[Array[Int]] = null
    var docId: Long = -1L

    private def loadBlock(): Unit = {
      val (d, t, nb) = PostingBlocks.decode(blocks(blockIdx))
      docIds = d; tfs = t; norms = nb
      posPerPosting = null // positional stream decoded lazily on demand
    }

    /** Absolute token positions of the CURRENT posting (ascending), or null
      * when the index was built without positions. Decoded once per block,
      * only when a positional query asks.
      */
    def positions(): Array[Int] = {
      if (posPerPosting == null)
        posPerPosting = PostingBlocks.decodePositions(blocks(blockIdx), tfs)
      if (posPerPosting == null) null else posPerPosting(pos)
    }

    def nextDoc(): Long = {
      if (docId == NoMoreDocs) return NoMoreDocs
      pos += 1
      if (docIds == null || pos >= docIds.length) {
        if (docIds != null) blockIdx += 1
        if (blockIdx >= blocks.length) { docId = NoMoreDocs; return NoMoreDocs }
        loadBlock()
        pos = 0
      }
      docId = docIds(pos)
      docId
    }

    /** Leapfrog to the first doc >= target (block skip via lastDocId). */
    def advance(target: Long): Long = {
      if (docId >= target) return docId
      if (docId == NoMoreDocs) return NoMoreDocs
      // skip whole undecoded blocks
      if (docIds == null || blocks(blockIdx).lastDocId < target) {
        var lo = blockIdx
        var hi = blocks.length - 1
        if (docIds != null) lo = blockIdx + 1
        var found = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (blocks(mid).lastDocId >= target) { found = mid; hi = mid - 1 }
          else lo = mid + 1
        }
        if (found < 0) { docId = NoMoreDocs; return NoMoreDocs }
        blockIdx = found
        loadBlock()
        pos = 0
      } else if (pos < 0) {
        pos = 0
      }
      // binary search within decoded block
      var lo = pos
      var hi = docIds.length - 1
      var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (docIds(mid) >= target) { found = mid; hi = mid - 1 }
        else lo = mid + 1
      }
      if (found < 0) {
        // target beyond this block: recurse into block search
        blockIdx += 1
        if (blockIdx >= blocks.length) { docId = NoMoreDocs; return NoMoreDocs }
        loadBlock()
        pos = 0
        docId = docIds(0)
        if (docId >= target) docId else advance(target)
      } else {
        pos = found
        docId = docIds(pos)
        docId
      }
    }

    /** Block-max bound for the block containing the first doc >= target,
      * WITHOUT decoding postings or moving the iterator. 0 if exhausted.
      */
    def blockUpperBound(target: Long): Double = {
      var lo = blockIdx
      var hi = blocks.length - 1
      var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (blocks(mid).lastDocId >= target) { found = mid; hi = mid - 1 }
        else lo = mid + 1
      }
      if (found < 0) 0.0 else boundOf(found)
    }

    /** lastDocId of the block containing first doc >= target (skip target). */
    def blockLastDoc(target: Long): Long = {
      var lo = blockIdx
      var hi = blocks.length - 1
      var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (blocks(mid).lastDocId >= target) { found = mid; hi = mid - 1 }
        else lo = mid + 1
      }
      if (found < 0) NoMoreDocs else blocks(found).lastDocId
    }

    def score(): Double = sim.score(weight, tfs(pos), cache(norms(pos) & 0xff))

    /** Doc-length norm value (decoded cache entry) of the CURRENT posting —
      * norms are per-doc, so any aligned term's entry is the doc's norm;
      * phrase scoring reads it here (PhraseWeight scores phraseFreq against
      * the field norm, [B .../search/PhraseWeight.java]).
      */
    def normValue: Double = cache(norms(pos) & 0xff)
    /** Term frequency of the CURRENT posting. */
    def termFreq: Int = tfs(pos)
  }

  /** Top-k pure disjunction via block-max WAND; `accept` folds in metadata
    * filters and MUST_NOT exclusions (both evaluated only on candidates that
    * survive the score-bound pruning — cheap-first, like Lucene's
    * two-phase iteration).
    */
  def wandTopK(terms: Array[TermIterator], k: Int,
      accept: Long => Boolean, heap: TopKHeap,
      /** < 0: sum combine; in [0,1]: DisMax max + tb*(sum-max). The WAND
        * bound remains valid because dismax(scores) <= sum(scores).
        */
      dismaxTb: Double = -1.0,
      /** BooleanQuery.setMinimumNumberShouldMatch: docs matching fewer
        * SHOULD clauses are rejected at evaluation time (the sum bound
        * stays admissible — rejection only removes candidates).
        */
      minShouldMatch: Int = 0): TopKHeap = {
    val iters = terms.filter(_.nextDoc() != NoMoreDocs)
    val n = iters.length
    if (n == 0) return heap
    // insertion-sorted by current docId
    val order = iters.sortBy(_.docId)
    val arr = new Array[TermIterator](n)
    order.copyToArray(arr)

    def resort(): Unit = {
      // insertion sort: nearly sorted after each advance
      var i = 1
      while (i < n) {
        val x = arr(i)
        var j = i - 1
        while (j >= 0 && arr(j).docId > x.docId) { arr(j + 1) = arr(j); j -= 1 }
        arr(j + 1) = x
        i += 1
      }
    }

    while (true) {
      resort()
      val theta = heap.theta
      // pivot: smallest p with cumulative term-level UB > theta
      var cum = 0.0
      var p = -1
      var i = 0
      while (i < n && p < 0) {
        cum += arr(i).maxScore
        if (cum > theta) p = i
        i += 1
      }
      if (p < 0) return heap
      val pivotDoc = arr(p).docId
      if (pivotDoc == NoMoreDocs) return heap
      // extend the pivot over every iterator parked on the same doc, so the
      // block bound below covers pivotDoc's full potential score and the
      // skip target stays strictly past it (progress guarantee)
      while (p + 1 < n && arr(p + 1).docId == pivotDoc) p += 1

      // block-max refinement over the lead iterators
      var blockSum = 0.0
      var minBlockEnd = NoMoreDocs
      i = 0
      while (i <= p) {
        blockSum += arr(i).blockUpperBound(pivotDoc)
        val e = arr(i).blockLastDoc(pivotDoc)
        if (e < minBlockEnd) minBlockEnd = e
        i += 1
      }
      if (blockSum <= theta) {
        // whole block range non-competitive: jump past it (capped at the
        // next iterator's doc so no lead-set change is skipped over)
        var target = minBlockEnd + 1
        if (target <= pivotDoc) target = pivotDoc + 1
        if (p + 1 < n && arr(p + 1).docId < target) target = arr(p + 1).docId
        i = 0
        while (i <= p) {
          if (arr(i).docId < target) arr(i).advance(target)
          i += 1
        }
      } else if (arr(0).docId == pivotDoc) {
        // all leads aligned on pivot: evaluate. Clause scores are summed in
        // the iterator's stable `tag` (query clause) order so double
        // accumulation is reproducible across runs and partitionings
        // (SURVEY.md §7.4-1)
        var nMatch = 0
        i = 0
        while (i < n && arr(i).docId == pivotDoc) { nMatch += 1; i += 1 }
        if (nMatch >= minShouldMatch && accept(pivotDoc)) {
          val matched = java.util.Arrays.copyOfRange(
            arr.asInstanceOf[Array[AnyRef]], 0, nMatch)
            .asInstanceOf[Array[TermIterator]]
          java.util.Arrays.sort(matched, (a: TermIterator, b: TermIterator) =>
            Integer.compare(a.tag, b.tag))
          var s = 0.0
          var mx = 0.0
          i = 0
          while (i < nMatch) {
            val cs = matched(i).score()
            s += cs
            if (cs > mx) mx = cs
            i += 1
          }
          if (dismaxTb >= 0) s = mx + dismaxTb * (s - mx)
          heap.offer(s, pivotDoc)
        }
        i = 0
        while (i < n && arr(i).docId == pivotDoc) {
          arr(i).nextDoc()
          i += 1
        }
      } else {
        // advance the lead with the largest UB among those STRICTLY before
        // the pivot doc (an iterator already at pivotDoc would be a no-op
        // advance and stall the loop); arr(0) qualifies in this branch
        var best = -1
        i = 0
        while (i <= p) {
          if (arr(i).docId < pivotDoc &&
            (best < 0 || arr(i).maxScore > arr(best).maxScore)) best = i
          i += 1
        }
        arr(best).advance(pivotDoc)
      }
    }
    heap
  }

  /** Conjunction (MUST) leapfrog with optional scored SHOULD clauses.
    * Iterators ordered most-selective-first by the caller (df ascending),
    * mirroring Lucene's ConjunctionDISI cost ordering.
    */
  def conjunctionTopK(musts: Array[TermIterator], shoulds: Array[TermIterator],
      k: Int, accept: Long => Boolean, heap: TopKHeap,
      /** < 0: sum combine; in [0,1]: DisMax over ALL matched clauses. */
      dismaxTb: Double = -1.0,
      /** minimum number of SHOULD clauses that must also match. */
      minShouldMatch: Int = 0): TopKHeap = {
    if (musts.isEmpty)
      return wandTopK(shoulds, k, accept, heap, dismaxTb, minShouldMatch)
    var i = 0
    while (i < musts.length) {
      if (musts(i).nextDoc() == NoMoreDocs) return heap
      i += 1
    }
    shoulds.foreach(_.nextDoc())
    var doc = musts(0).docId
    while (doc != NoMoreDocs) {
      // leapfrog all musts to a common doc
      var aligned = true
      i = 1
      while (i < musts.length) {
        val d = musts(i).advance(doc)
        if (d != doc) { doc = d; aligned = false; i = musts.length }
        else i += 1
      }
      if (aligned) {
        if (doc != NoMoreDocs && accept(doc)) {
          var s = 0.0
          var mx = 0.0
          var nShould = 0
          i = 0
          while (i < musts.length) {
            val cs = musts(i).score()
            s += cs
            if (cs > mx) mx = cs
            i += 1
          }
          i = 0
          while (i < shoulds.length) {
            if (shoulds(i).advance(doc) == doc) {
              val cs = shoulds(i).score()
              s += cs
              if (cs > mx) mx = cs
              nShould += 1
            }
            i += 1
          }
          if (nShould >= minShouldMatch) {
            if (dismaxTb >= 0) s = mx + dismaxTb * (s - mx)
            heap.offer(s, doc)
          }
        }
        doc = musts(0).advance(doc + 1)
      } else {
        doc = musts(0).advance(doc)
      }
    }
    heap
  }

  /** Unscored conjunction as a LAZY docId iterator (no heap, no k): the
    * distributed phrase/filter primitive — each bucket task streams matched
    * docIds straight into the downstream Dataset, so hot conjunctions never
    * buffer, collect, or truncate (VERDICT r1 what's-wrong #3).
    * `accept` runs only at fully-aligned docs (positional verify plugs in
    * here, two-phase style).
    */
  def conjunctionIterator(musts: Array[TermIterator],
      accept: Long => Boolean): Iterator[Long] = {
    if (musts.isEmpty) return Iterator.empty
    var i = 0
    while (i < musts.length) {
      if (musts(i).nextDoc() == NoMoreDocs) return Iterator.empty
      i += 1
    }

    new Iterator[Long] {
      /** leapfrog from `start` to the next accepted aligned doc */
      private def findFrom(start: Long): Long = {
        var doc = start
        while (doc != NoMoreDocs) {
          var aligned = true
          var i = 1
          while (i < musts.length) {
            val d = musts(i).advance(doc)
            if (d != doc) { doc = d; aligned = false; i = musts.length }
            else i += 1
          }
          if (aligned) {
            if (accept(doc)) return doc
            doc = musts(0).advance(doc + 1)
          } else if (doc != NoMoreDocs) {
            doc = musts(0).advance(doc)
          }
        }
        NoMoreDocs
      }

      private var cur: Long = findFrom(musts(0).docId)
      def hasNext: Boolean = cur != NoMoreDocs
      def next(): Long = {
        val d = cur
        cur = findFrom(musts(0).advance(d + 1))
        d
      }
    }
  }

  /** Exclusion predicate from MUST_NOT iterators. */
  def notExcluded(nots: Array[TermIterator]): Long => Boolean = {
    if (nots.isEmpty) (_: Long) => true
    else { doc: Long =>
      var i = 0
      var ok = true
      while (i < nots.length && ok) {
        if (nots(i).docId < doc || nots(i).docId == -1L) nots(i).advance(doc)
        if (nots(i).docId == doc) ok = false
        i += 1
      }
      ok
    }
  }
}
