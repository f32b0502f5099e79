package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.search.SpanNode._
import graft.search.SpanAlgebra.{eval, pack, startOf, endOf}

/** Span-algebra closure verification: the optimized evaluator (sorted packed
  * spans, DFS composition with budget pruning) against an independent
  * brute-force reference that enumerates the FULL cartesian product of
  * child-span picks straight off the token array. Extends the 300-case
  * kernel duel (CoreCodecSpec) to arbitrary nested trees — SpanOr under
  * SpanNear, SpanNot/SpanFirst as subspans (VERDICT r3 next-5).
  */
class SpanAlgebraSpec extends AnyFunSuite {

  private val Alphabet = Vector("a", "b", "c", "d")

  /** positions of `t` in the doc — the test-side stand-in for the index's
    * per-term position lists. */
  private def posOf(tokens: Vector[String])(t: String): Array[Int] =
    tokens.zipWithIndex.collect { case (tok, i) if tok == t => i }.toArray

  // ---- brute-force reference (structurally independent: sets + product) ----

  private def cartesian[A](ls: List[List[A]]): List[List[A]] =
    ls.foldRight(List(List.empty[A])) { (l, acc) =>
      l.flatMap(a => acc.map(a :: _))
    }

  private def refSpans(n: SpanNode, tokens: Vector[String]): Set[(Int, Int)] = n match {
    case STerm(ts, offs) =>
      val w = offs.last - offs.head + 1
      (0 until tokens.length).flatMap { p =>
        val ok = ts.indices.forall { i =>
          val q = p + offs(i) - offs(0)
          q >= 0 && q < tokens.length && tokens(q) == ts(i)
        }
        if (ok) Some((p, p + w)) else None
      }.toSet
    case SOr(cs) => cs.flatMap(refSpans(_, tokens)).toSet
    case SNear(cs, slop, ordered) =>
      val sets = cs.map(refSpans(_, tokens).toList).toList
      if (sets.exists(_.isEmpty)) Set.empty
      else cartesian(sets).flatMap { pick =>
        val wsum = pick.map { case (s, e) => e - s }.sum
        if (ordered) {
          val chained = pick.sliding(2).forall {
            case List((_, e1), (s2, _)) => s2 >= e1
            case _ => true
          }
          val slack = pick.last._2 - pick.head._1 - wsum
          if (chained && slack <= slop) Some((pick.head._1, pick.last._2)) else None
        } else {
          val minS = pick.map(_._1).min
          val maxE = pick.map(_._2).max
          if (maxE - minS - wsum <= slop) Some((minS, maxE)) else None
        }
      }.toSet
    case SNot(i, e, d) =>
      val ex = refSpans(e, tokens)
      refSpans(i, tokens).filter { case (s, en) =>
        !ex.exists { case (s2, e2) => s2 < en + d && e2 > s - d }
      }
    case SFirst(c, end) => refSpans(c, tokens).filter(_._2 <= end)
    case SPosRange(c, lo, hi) =>
      refSpans(c, tokens).filter { case (st, en) => st >= lo && en <= hi }
    case SContaining(b, l) =>
      val ls = refSpans(l, tokens)
      refSpans(b, tokens).filter { case (s, e) =>
        ls.exists { case (s2, e2) => s <= s2 && e2 <= e }
      }
    case SWithin(l, b) =>
      val bs = refSpans(b, tokens)
      refSpans(l, tokens).filter { case (s, e) =>
        bs.exists { case (s2, e2) => s2 <= s && e <= e2 }
      }
  }

  private def evalSet(n: SpanNode, tokens: Vector[String]): Set[(Int, Int)] =
    eval(n, posOf(tokens)).map(s => (startOf(s), endOf(s))).toSet

  // ---- generators ----

  private val genTermLeaf: Gen[SpanNode] = for {
    shape <- Gen.chooseNum(0, 2)
    t1 <- Gen.oneOf(Alphabet)
    t2 <- Gen.oneOf(Alphabet)
  } yield shape match {
    case 0 => term(t1)
    case 1 => STerm(Seq(t1, t2), Seq(0, 1)) // adjacent phrase
    case _ => STerm(Seq(t1, t2), Seq(0, 2)) // stop-hole phrase
  }

  private def genTree(depth: Int): Gen[SpanNode] =
    if (depth <= 0) genTermLeaf
    else Gen.chooseNum(0, 7).flatMap {
      case 0 => genTermLeaf
      case 1 => for {
        a <- genTree(depth - 1); b <- genTree(depth - 1)
      } yield SOr(Seq(a, b))
      case 2 => for {
        nc <- Gen.chooseNum(2, 3)
        cs <- Gen.listOfN(nc, genTree(depth - 1))
        slop <- Gen.chooseNum(0, 6)
        ordered <- Gen.oneOf(true, false)
      } yield SNear(cs, slop, ordered)
      case 3 => for {
        i <- genTree(depth - 1); e <- genTermLeaf
        d <- Gen.chooseNum(0, 3)
      } yield SNot(i, e, d)
      case 4 => for {
        c <- genTree(depth - 1); end <- Gen.chooseNum(0, 14)
      } yield SFirst(c, end)
      case 5 => for {
        b <- genTree(depth - 1); l <- genTree(depth - 1)
      } yield SContaining(b, l)
      case 6 => for {
        l <- genTree(depth - 1); b <- genTree(depth - 1)
      } yield SWithin(l, b)
      case _ => for {
        c <- genTree(depth - 1)
        lo <- Gen.chooseNum(0, 6); w <- Gen.chooseNum(1, 12)
      } yield SPosRange(c, lo, lo + w)
    }

  private val genCase: Gen[(SpanNode, Vector[String])] = for {
    tree <- genTree(2)
    len <- Gen.chooseNum(0, 18)
    toks <- Gen.listOfN(len, Gen.oneOf(Alphabet))
  } yield (tree, toks.toVector)

  // ---- tests ----

  test("span tree evaluator == brute-force reference (400 random trees)") {
    graft.Props.forAll(genCase, n = 400) { case (tree, tokens) =>
      val got = evalSet(tree, tokens)
      val want = refSpans(tree, tokens)
      assert(got == want, s"tree=$tree tokens=${tokens.mkString(" ")}")
    }
  }

  test("span tree evaluator: hand cases for each composition") {
    val doc = Vector("a", "b", "c", "a", "d", "b")
    // SOr union of two terms
    assert(evalSet(SOr(Seq(term("a"), term("b"))), doc) ==
      Set((0, 1), (3, 4), (1, 2), (5, 6)))
    // Or-as-subspan: [a|bc] then d within slop 1: picks a@3 (gap 1 to d@4)
    // and phrase bc@1 [1,3) (gap 1 to d@4)
    val orNear = SNear(Seq(
      SOr(Seq(term("a"), STerm(Seq("b", "c"), Seq(0, 1)))), term("d")),
      slop = 1, ordered = true)
    assert(evalSet(orNear, doc) == Set((3, 5), (1, 5)))
    // SNot as subspan: a's not within 1 of c -> a@0 killed (c@2 at dist 2?
    // |2-0|=2 > 1 -> a@0 SURVIVES; span overlap form: c-span [2,3) vs
    // window [0-1, 1+1)=[-1,2) -> no overlap -> survives), a@3 killed
    // (c@2 overlaps [2,5))
    assert(evalSet(SNot(term("a"), term("c"), 1), doc) == Set((0, 1)))
    // SFirst over a composite
    assert(evalSet(SFirst(SNear(Seq(term("a"), term("b")), 0, true), 2), doc) ==
      Set((0, 2)))
    // ordered near rejects overlap
    assert(evalSet(SNear(Seq(STerm(Seq("a", "b"), Seq(0, 1)), term("b")),
      slop = 6, ordered = true), doc) == Set((0, 6)))
  }

  test("packed span helpers round-trip") {
    val s = pack(123456, 123460)
    assert(startOf(s) == 123456 && endOf(s) == 123460)
    assert(pack(0, 1) < pack(0, 2) && pack(0, 9) < pack(1, 0))
  }
}
