package graft.core

/** Positional phrase verification over per-term position lists
  * [B lucene/core/src/java/org/apache/lucene/search/ExactPhraseMatcher.java]
  * [B lucene/core/src/java/org/apache/lucene/search/SloppyPhraseMatcher.java].
  *
  * Positions are the engine's raw token indexes (stop words leave holes,
  * mirroring StopFilter position increments), each list sorted ascending.
  * Runs inside a bucket task at docs where the unscored conjunction has
  * already aligned all phrase terms — the classic two-phase split with the
  * expensive check gated behind the cheap one, except both phases now run
  * off the index alone (no document re-analysis, VERDICT r1 next-3).
  */
object PhraseMatcher {

  /** Exact phrase with explicit QUERY positions (Lucene PhraseQuery
    * add(term, position)): exists p with posLists(i) containing
    * p + offsets(i) - offsets(0) for all i. Stop words removed from the
    * query leave holes in `offsets` exactly like StopFilter position
    * increments leave holes in the indexed positions, so "state of art"
    * matches with offsets (0, 2). `offsets == null` means consecutive.
    */
  def exactMatch(posLists: Array[Array[Int]],
      offsets: Array[Int] = null): Boolean = {
    val n = posLists.length
    if (n == 0) return false
    if (n == 1) return posLists(0).length > 0
    var c = 0
    while (c < posLists(0).length) {
      val p0 = posLists(0)(c)
      var all = true
      var i = 1
      while (i < n && all) {
        val gap = if (offsets == null) i else offsets(i) - offsets(0)
        if (java.util.Arrays.binarySearch(posLists(i), p0 + gap) < 0) all = false
        i += 1
      }
      if (all) return true
      c += 1
    }
    false
  }

  /** Two-term sloppy phrase: exists (pa, pb) with |pb - pa - gap| <= slop,
    * where `gap` is the query-position distance (1 for adjacent terms;
    * larger when stop words were removed between them) — the move-count
    * distance ("b a" needs slop 2, "a x b" needs slop 1), matching
    * Lucene's documented slop behavior.
    */
  def sloppyMatch2(a: Array[Int], b: Array[Int], slop: Int,
      gap: Int = 1): Boolean = {
    var i = 0
    while (i < a.length) {
      val lo = a(i) + gap - slop
      val hi = a(i) + gap + slop
      var idx = java.util.Arrays.binarySearch(b, lo)
      if (idx < 0) idx = -idx - 1
      if (idx < b.length && b(idx) <= hi) return true
      i += 1
    }
    false
  }
}
