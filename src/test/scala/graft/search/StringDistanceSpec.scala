package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Unrestricted Damerau-Levenshtein (the transpositions=true fuzzy
  * distance). Pinned cases include the classic counterexample separating
  * the unrestricted algorithm from optimal-string-alignment — OSA gives
  * dl("ca","abc") = 3, unrestricted gives 2 (delete c, then the
  * transposed pair is edited again) — the variant DuckDB's
  * damerau_levenshtein implements, which the search_fuzzy_transpose
  * oracle relies on.
  */
class StringDistanceSpec extends AnyFunSuite {
  private def dl(a: String, b: String) = QueryLowering.damerauLevenshtein(a, b)

  test("pinned distances") {
    assert(dl("", "") == 0)
    assert(dl("", "abc") == 3)
    assert(dl("abc", "") == 3)
    assert(dl("abc", "abc") == 0)
    assert(dl("ab", "ba") == 1) // one transposition
    assert(dl("abdc", "abcd") == 1)
    assert(dl("mereg", "merge") == 1) // the search_fuzzy_transpose query
    assert(dl("teh", "the") == 1)
    assert(dl("kitten", "sitting") == 3)
    assert(dl("ca", "abc") == 2) // unrestricted, NOT the OSA value 3
  }

  private def classicLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }

  test("randomized bounds vs classic Levenshtein") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val a = Seq.fill(rnd.nextInt(8))(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Seq.fill(rnd.nextInt(8))(('a' + rnd.nextInt(3)).toChar).mkString
      val d = dl(a, b)
      val lev = classicLev(a, b)
      assert(d <= lev, s"dl > lev for ($a, $b)") // a transposition never hurts
      assert(d >= (a.length - b.length).abs, s"dl below length bound for ($a, $b)")
      assert(d >= lev / 2, s"dl < lev/2 for ($a, $b)") // each swap saves at most 1
      assert(d == dl(b, a), s"asymmetric for ($a, $b)")
      if (d == 0) assert(a == b)
    }
  }
}
