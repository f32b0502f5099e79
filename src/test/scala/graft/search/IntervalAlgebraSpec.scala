package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.search.IntervalNode._
import graft.search.SpanAlgebra.{startOf, endOf}

/** Minimal-interval algebra verification: the optimized evaluator (greedy
  * ordered chains, k-pointer unordered sweep, right-to-left minimisation)
  * against an independent brute-force reference that enumerates the FULL
  * cartesian candidate space straight off the token array and minimises by
  * definition (drop any interval strictly containing another).
  */
class IntervalAlgebraSpec extends AnyFunSuite {

  private val Alphabet = Vector("a", "b", "c", "d")

  private def posOf(tokens: Vector[String])(t: String): Array[Int] =
    tokens.zipWithIndex.collect { case (tok, i) if tok == t => i }.toArray

  // ---- brute-force reference ----

  private def cartesian[A](ls: List[List[A]]): List[List[A]] =
    ls.foldRight(List(List.empty[A])) { (l, acc) =>
      l.flatMap(a => acc.map(a :: _))
    }

  private def minimizeRef(s: Set[(Int, Int)]): Set[(Int, Int)] =
    s.filter { case (s1, e1) =>
      !s.exists { case (s2, e2) =>
        s2 >= s1 && e2 <= e1 && (s2 > s1 || e2 < e1)
      }
    }

  /** (interval, gaps) pairs pre-minimisation for ordered (gap filter applies
    * after minimisation, so the reference needs both).
    */
  private def refIntervals(n: IntervalNode, tokens: Vector[String]): Set[(Int, Int)] = n match {
    case ITerm(t) =>
      tokens.zipWithIndex.collect { case (tok, i) if tok == t => (i, i + 1) }.toSet
    case IPhrase(ts) =>
      (0 to tokens.length - ts.length).collect {
        case p if ts.indices.forall(i => tokens(p + i) == ts(i)) =>
          (p, p + ts.length)
      }.toSet
    case IOr(cs) => minimizeRef(cs.flatMap(refIntervals(_, tokens)).toSet)
    case IOrdered(cs, maxGaps) =>
      val sets = cs.map(refIntervals(_, tokens).toList).toList
      if (sets.exists(_.isEmpty)) Set.empty
      else {
        val cands: Set[((Int, Int), Int)] = cartesian(sets).flatMap { pick =>
          val chained = pick.sliding(2).forall {
            case List((_, e1), (s2, _)) => s2 >= e1
            case _ => true
          }
          if (!chained) None
          else {
            val gaps = pick.sliding(2).collect {
              case List((_, e1), (s2, _)) => s2 - e1
            }.sum
            Some(((pick.head._1, pick.last._2), gaps))
          }
        }.toSet
        // per window keep the SMALLEST gap derivation (the greedy pick's),
        // minimise the window set, then gap-filter
        val best = cands.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
        minimizeRef(best.keySet).filter(w => best(w) <= maxGaps)
      }
    case IUnordered(cs) =>
      val sets = cs.map(refIntervals(_, tokens).toList).toList
      if (sets.exists(_.isEmpty)) Set.empty
      else minimizeRef(cartesian(sets).map { pick =>
        (pick.map(_._1).min, pick.map(_._2).max)
      }.toSet)
    case IContaining(b, s, neg) =>
      val ss = refIntervals(s, tokens)
      refIntervals(b, tokens).filter { case (bs, be) =>
        ss.exists { case (s1, e1) => s1 >= bs && e1 <= be } != neg
      }
    case IContainedBy(s, b, neg) =>
      val bs = refIntervals(b, tokens)
      refIntervals(s, tokens).filter { case (s1, e1) =>
        bs.exists { case (b1, b2) => b1 <= s1 && b2 >= e1 } != neg
      }
    case IBefore(s, r) =>
      val rs = refIntervals(r, tokens)
      refIntervals(s, tokens).filter { case (_, e1) => rs.exists(_._1 >= e1) }
    case IAfter(s, r) =>
      val rs = refIntervals(r, tokens)
      refIntervals(s, tokens).filter { case (s1, _) => rs.exists(_._2 <= s1) }
    case IOverlapping(s, r) =>
      val rs = refIntervals(r, tokens)
      refIntervals(s, tokens).filter { case (s1, e1) =>
        rs.exists { case (r1, r2) => r1 < e1 && s1 < r2 }
      }
  }

  private def evalSet(n: IntervalNode, tokens: Vector[String]): Set[(Int, Int)] =
    IntervalAlgebra.eval(n, posOf(tokens)).map(p => (startOf(p), endOf(p))).toSet

  // ---- generators ----

  private val genLeaf: Gen[IntervalNode] = for {
    shape <- Gen.chooseNum(0, 1)
    t1 <- Gen.oneOf(Alphabet)
    t2 <- Gen.oneOf(Alphabet)
  } yield shape match {
    case 0 => ITerm(t1)
    case _ => IPhrase(Seq(t1, t2))
  }

  private def genTree(depth: Int): Gen[IntervalNode] =
    if (depth <= 0) genLeaf
    else Gen.chooseNum(0, 8).flatMap {
      case 0 => genLeaf
      case 1 => for {
        a <- genTree(depth - 1); b <- genTree(depth - 1)
      } yield IOr(Seq(a, b))
      case 2 => for {
        a <- genTree(depth - 1); b <- genTree(depth - 1)
        g <- Gen.oneOf(Int.MaxValue, 2, 5)
      } yield {
        // finite maxgaps only over fixed-width children, where the gap of
        // a window is derivation-independent (e - s - sum of child widths)
        val fixedW = Seq(a, b).forall {
          case _: ITerm | _: IPhrase => true
          case _ => false
        }
        IOrdered(Seq(a, b), if (fixedW) g else Int.MaxValue)
      }
      case 3 => for {
        a <- genTree(depth - 1); b <- genTree(depth - 1)
      } yield IUnordered(Seq(a, b))
      case 4 => for {
        a <- genTree(depth - 1); b <- genTree(depth - 1)
        neg <- Gen.oneOf(false, true)
      } yield IContaining(a, b, neg)
      case 5 => for {
        a <- genTree(depth - 1); b <- genTree(depth - 1)
        neg <- Gen.oneOf(false, true)
      } yield IContainedBy(a, b, neg)
      case 6 => for {
        a <- genTree(depth - 1); b <- genTree(depth - 1)
      } yield IBefore(a, b)
      case 7 => for {
        a <- genTree(depth - 1); b <- genTree(depth - 1)
      } yield IAfter(a, b)
      case _ => for {
        a <- genTree(depth - 1); b <- genTree(depth - 1)
      } yield IOverlapping(a, b)
    }

  private val genDoc: Gen[Vector[String]] = for {
    n <- Gen.chooseNum(1, 24)
    ts <- Gen.listOfN(n, Gen.oneOf(Alphabet))
  } yield ts.toVector

  test("minimize drops exactly the non-minimal intervals") {
    val cand = Array((0, 5), (1, 3), (2, 3), (2, 6), (4, 7), (2, 3))
      .map { case (s, e) => SpanAlgebra.pack(s, e) }
    val got = IntervalAlgebra.minimize(cand)
      .map(p => (startOf(p), endOf(p))).toSet
    assert(got == Set((2, 3), (4, 7)))
  }

  test("ordered greedy chains == brute-force minimal windows (gap-filtered)") {
    val doc = Vector("a", "b", "a", "c", "b", "a", "b")
    val n = IOrdered(Seq(ITerm("a"), ITerm("b")), maxGaps = 1)
    assert(evalSet(n, doc) == refIntervals(n, doc))
  }

  test("unordered sweep == brute-force minimal covering windows") {
    val doc = Vector("a", "c", "c", "b", "a", "b", "c", "a")
    val n = IUnordered(Seq(ITerm("a"), ITerm("b"), ITerm("c")))
    assert(evalSet(n, doc) == refIntervals(n, doc))
  }

  test("400 random interval trees x docs match the brute-force reference") {
    val seed0 = org.scalacheck.rng.Seed(20260818L)
    var seed = seed0
    var checked = 0
    var nonEmpty = 0
    while (checked < 400) {
      val doc = genDoc.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val tree = genTree(2).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val got = evalSet(tree, doc)
      val want = refIntervals(tree, doc)
      assert(got == want, s"\ntree=$tree\ndoc=${doc.mkString(" ")}\n" +
        s"got=${got.toList.sorted}\nwant=${want.toList.sorted}")
      if (want.nonEmpty) nonEmpty += 1
      checked += 1
    }
    assert(nonEmpty > 100, s"degenerate corpus: only $nonEmpty non-empty cases")
  }

  test("eval output is sorted with strictly increasing starts and ends") {
    val doc = Vector("a", "b", "a", "b", "c", "a", "c", "b", "a")
    for (tree <- Seq(
      IUnordered(Seq(ITerm("a"), ITerm("b"))),
      IOrdered(Seq(ITerm("a"), ITerm("b"), ITerm("c"))),
      IOr(Seq(IPhrase(Seq("a", "b")), ITerm("c"))))) {
      val iv = IntervalAlgebra.eval(tree, posOf(doc))
      val pairs = iv.map(p => (startOf(p), endOf(p))).toList
      assert(pairs == pairs.sorted)
      assert(pairs.map(_._1) == pairs.map(_._1).distinct.sorted)
      assert(pairs.map(_._2) == pairs.map(_._2).distinct.sorted)
    }
  }
}
