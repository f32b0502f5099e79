package graft.search

import scala.collection.mutable

/** The Intervals query API — Lucene's successor to spans
  * [B lucene/core/src/java/org/apache/lucene/queries/intervals/Intervals.java],
  * built on MINIMAL-interval semantics (Clarke/Cormack/Burkowski's GCL
  * algebra, "An algebra for structured text search", 1995): every source
  * yields only intervals that contain no other interval of the same source.
  * That minimality is the semantic difference from SpanAlgebra — a span
  * source enumerates ALL occurrence windows, an interval source only the
  * tight ones — and it is what makes the filter combinators (CONTAINING /
  * CONTAINED_BY / BEFORE / AFTER
  * [B .../intervals/FilteredIntervalsSource.java]) well-defined.
  *
  * Intervals are packed like spans: (start << 32) | end, end exclusive;
  * a source's interval list is sorted and — once minimal — has STRICTLY
  * increasing starts and ends (no equal starts survive minimisation), the
  * invariant the linear combination algorithms below rely on.
  */
sealed trait IntervalNode extends Serializable

object IntervalNode {
  /** Intervals.term: [p, p+1) at every position of `t`. */
  final case class ITerm(t: String) extends IntervalNode

  /** Intervals.phrase: the adjacent block, width = terms.length
    * [B .../intervals/BlockIntervalsSource.java]. */
  final case class IPhrase(terms: Seq[String]) extends IntervalNode {
    require(terms.nonEmpty)
  }

  /** Intervals.ordered (+ an optional Intervals.maxgaps wrapper): one
    * interval per child, in order, NON-overlapping (next.start >= prev.end),
    * emitting the minimal enclosing windows
    * [B .../intervals/OrderedIntervalsSource.java, MinimizingConjunctionIntervalsSource.java].
    * `maxGaps` filters the minimal iterates by total gap between the picked
    * children (Lucene applies the gap filter AFTER minimisation).
    */
  final case class IOrdered(children: Seq[IntervalNode],
      maxGaps: Int = Int.MaxValue) extends IntervalNode {
    require(children.nonEmpty)
  }

  /** Intervals.unordered: one interval per child anywhere (overlap allowed),
    * minimal covering windows [B .../intervals/UnorderedIntervalsSource.java]. */
  final case class IUnordered(children: Seq[IntervalNode]) extends IntervalNode {
    require(children.nonEmpty)
  }

  /** Intervals.or: union of the children's intervals, re-minimised
    * [B .../intervals/DisjunctionIntervalsSource.java]. */
  final case class IOr(children: Seq[IntervalNode]) extends IntervalNode

  /** Intervals.containing / notContaining: `big` intervals that do (don't)
    * contain a `small` interval. */
  final case class IContaining(big: IntervalNode, small: IntervalNode,
      negate: Boolean = false) extends IntervalNode

  /** Intervals.containedBy / notContainedBy: `small` intervals inside
    * (outside every) `big` interval. */
  final case class IContainedBy(small: IntervalNode, big: IntervalNode,
      negate: Boolean = false) extends IntervalNode

  /** Intervals.before: source intervals that end at or before the start of
    * some reference interval. */
  final case class IBefore(source: IntervalNode,
      reference: IntervalNode) extends IntervalNode

  /** Intervals.after: source intervals that start at or after the end of
    * some reference interval. */
  final case class IAfter(source: IntervalNode,
      reference: IntervalNode) extends IntervalNode

  /** Intervals.overlapping: source intervals that overlap (share at least
    * one position with) some reference interval
    * [B lucene/core/src/java/org/apache/lucene/queries/intervals/OverlappingIntervalsSource.java]. */
  final case class IOverlapping(source: IntervalNode,
      reference: IntervalNode) extends IntervalNode

  /** Every posting-list term the tree touches (drives the pushed-down scan). */
  def allTerms(n: IntervalNode): Seq[String] = n match {
    case ITerm(t) => Seq(t)
    case IPhrase(ts) => ts
    case IOrdered(cs, _) => cs.flatMap(allTerms)
    case IUnordered(cs) => cs.flatMap(allTerms)
    case IOr(cs) => cs.flatMap(allTerms)
    case IContaining(b, s, _) => allTerms(b) ++ allTerms(s)
    case IContainedBy(s, b, _) => allTerms(s) ++ allTerms(b)
    case IBefore(s, r) => allTerms(s) ++ allTerms(r)
    case IAfter(s, r) => allTerms(s) ++ allTerms(r)
    case IOverlapping(s, r) => allTerms(s) ++ allTerms(r)
  }

  /** Terms a matching doc MUST contain — the conjunction driver for the
    * cheap phase. Negated filters require only their source side; a
    * positive CONTAINING/BEFORE filter requires both sides (no small /
    * reference interval means no match).
    */
  def requiredTerms(n: IntervalNode): Seq[String] = n match {
    case ITerm(t) => Seq(t)
    case IPhrase(ts) => ts
    case IOrdered(cs, _) => cs.flatMap(requiredTerms)
    case IUnordered(cs) => cs.flatMap(requiredTerms)
    case IOr(_) => Nil
    case IContaining(b, s, neg) =>
      if (neg) requiredTerms(b) else requiredTerms(b) ++ requiredTerms(s)
    case IContainedBy(s, b, neg) =>
      if (neg) requiredTerms(s) else requiredTerms(s) ++ requiredTerms(b)
    case IBefore(s, r) => requiredTerms(s) ++ requiredTerms(r)
    case IAfter(s, r) => requiredTerms(s) ++ requiredTerms(r)
    case IOverlapping(s, r) => requiredTerms(s) ++ requiredTerms(r)
  }
}

object IntervalAlgebra {
  import IntervalNode._
  import SpanAlgebra.{pack, startOf, endOf}

  private val Empty = Array.emptyLongArray

  /** Reduce a candidate set to its minimal intervals: sort, keep one (the
    * smallest) end per start, then a right-to-left sweep keeping intervals
    * whose end is strictly below every later start's end. The survivors
    * have strictly increasing starts AND ends.
    */
  def minimize(cand: Array[Long]): Array[Long] = {
    if (cand.length <= 1) return cand
    java.util.Arrays.sort(cand)
    // one candidate per start (packed order => first of equal starts has
    // the smallest end)
    var w = 1
    var i = 1
    while (i < cand.length) {
      if (startOf(cand(i)) != startOf(cand(w - 1))) { cand(w) = cand(i); w += 1 }
      i += 1
    }
    // right-to-left: drop intervals containing a later (larger-start) one
    val keep = new Array[Boolean](w)
    var minEnd = Int.MaxValue
    i = w - 1
    var kept = 0
    while (i >= 0) {
      val e = endOf(cand(i))
      if (e < minEnd) { keep(i) = true; kept += 1; minEnd = e }
      i -= 1
    }
    if (kept == cand.length) return cand
    val out = new Array[Long](kept)
    var o = 0
    i = 0
    while (i < w) {
      if (keep(i)) { out(o) = cand(i); o += 1 }
      i += 1
    }
    out
  }

  /** Minimal intervals of `node` in the current document. `pos` maps a term
    * to its sorted position list (empty when absent). Sorted, strictly
    * increasing in both start and end.
    */
  def eval(node: IntervalNode, pos: String => Array[Int]): Array[Long] = node match {
    case ITerm(t) =>
      val ps = pos(t)
      if (ps.isEmpty) Empty
      else {
        val out = new Array[Long](ps.length)
        var i = 0
        while (i < ps.length) { out(i) = pack(ps(i), ps(i) + 1); i += 1 }
        out
      }

    case IPhrase(ts) =>
      val lists = ts.map(pos).toArray
      if (lists.exists(_.isEmpty)) Empty
      else {
        val offs = ts.indices.toArray
        val starts = graft.core.PhraseMatcher.spanStartsExact(lists, offs)
        val w = ts.length
        val out = new Array[Long](starts.length)
        var i = 0
        while (i < starts.length) { out(i) = pack(starts(i), starts(i) + w); i += 1 }
        out
      }

    case IOr(cs) =>
      val parts = cs.map(eval(_, pos)).filter(_.nonEmpty)
      if (parts.isEmpty) Empty
      else if (parts.length == 1) parts.head
      else minimize(Array.concat(parts: _*))

    case IOrdered(cs, maxGaps) =>
      val kids = cs.map(eval(_, pos)).toArray
      if (kids.exists(_.isEmpty)) Empty
      else {
        // greedy chain per first-child interval: in a minimal list starts
        // and ends co-ascend, so the first child interval with
        // start >= prevEnd also has the smallest feasible end — the chain
        // end is minimal for this window start. Gap accounting rides along.
        val cand = new mutable.ArrayBuilder.ofLong
        val gaps = new mutable.ArrayBuilder.ofInt
        val first = kids(0)
        var i = 0
        var dead = false
        while (i < first.length && !dead) {
          val s0 = startOf(first(i))
          var prevEnd = endOf(first(i))
          var gap = 0
          var ok = true
          var j = 1
          while (j < kids.length && ok) {
            val l = kids(j)
            var idx = java.util.Arrays.binarySearch(l, pack(prevEnd, 0))
            if (idx < 0) idx = -idx - 1
            if (idx >= l.length) {
              ok = false
              // later first-child starts only move prevEnd right: no
              // continuation exists for them either once THIS child list
              // is exhausted at the first hop
              if (j == 1) dead = true
            } else {
              gap += startOf(l(idx)) - prevEnd
              prevEnd = endOf(l(idx))
              j += 1
            }
          }
          if (ok) { cand += pack(s0, prevEnd); gaps += gap }
          i += 1
        }
        val mini = minimize(cand.result())
        if (maxGaps == Int.MaxValue) mini
        else {
          // gap filter AFTER minimisation (Lucene's maxgaps wraps the
          // minimal iterator). Candidates have unique starts, so the gap
          // of a surviving interval is looked up by its packed value.
          val cs0 = cand.result(); val gs = gaps.result()
          val byPacked = new mutable.LongMap[Int](cs0.length)
          var k = 0
          while (k < cs0.length) { byPacked(cs0(k)) = gs(k); k += 1 }
          mini.filter(p => byPacked.getOrElse(p, Int.MaxValue) <= maxGaps)
        }
      }

    case IUnordered(cs) =>
      val kids = cs.map(eval(_, pos)).toArray
      if (kids.exists(_.isEmpty)) Empty
      else {
        // k-pointer sweep (Lucene's unordered source / minimal-window
        // merge): emit the window of the current fronts, then advance the
        // front with the minimal start to try to shrink it.
        val n = kids.length
        val ptr = new Array[Int](n)
        val cand = new mutable.ArrayBuilder.ofLong
        var exhausted = false
        while (!exhausted) {
          var minS = Int.MaxValue; var maxE = Int.MinValue; var argMin = -1
          var j = 0
          while (j < n) {
            val iv = kids(j)(ptr(j))
            if (startOf(iv) < minS) { minS = startOf(iv); argMin = j }
            if (endOf(iv) > maxE) maxE = endOf(iv)
            j += 1
          }
          cand += pack(minS, maxE)
          ptr(argMin) += 1
          if (ptr(argMin) >= kids(argMin).length) exhausted = true
        }
        minimize(cand.result())
      }

    case IContaining(big, small, neg) =>
      val bs = eval(big, pos)
      if (bs.isEmpty) Empty
      else {
        val ss = eval(small, pos)
        bs.filter { b =>
          val has = ss.exists(s => startOf(s) >= startOf(b) && endOf(s) <= endOf(b))
          has != neg
        }
      }

    case IContainedBy(small, big, neg) =>
      val ss = eval(small, pos)
      if (ss.isEmpty) Empty
      else {
        val bs = eval(big, pos)
        ss.filter { s =>
          val in = bs.exists(b => startOf(b) <= startOf(s) && endOf(b) >= endOf(s))
          in != neg
        }
      }

    case IBefore(src, ref) =>
      val sv = eval(src, pos)
      if (sv.isEmpty) Empty
      else {
        val rv = eval(ref, pos)
        if (rv.isEmpty) Empty
        else {
          val maxRefStart = startOf(rv(rv.length - 1))
          sv.filter(endOf(_) <= maxRefStart)
        }
      }

    case IAfter(src, ref) =>
      val sv = eval(src, pos)
      if (sv.isEmpty) Empty
      else {
        val rv = eval(ref, pos)
        if (rv.isEmpty) Empty
        else {
          val minRefEnd = endOf(rv(0))
          sv.filter(startOf(_) >= minRefEnd)
        }
      }

    case IOverlapping(src, ref) =>
      val sv = eval(src, pos)
      if (sv.isEmpty) Empty
      else {
        val rv = eval(ref, pos)
        if (rv.isEmpty) Empty
        else sv.filter { s =>
          rv.exists(r => startOf(r) < endOf(s) && startOf(s) < endOf(r))
        }
      }
  }

  /** Number of minimal intervals in the doc (0 = no match). */
  def count(node: IntervalNode, pos: String => Array[Int]): Int =
    eval(node, pos).length
}
