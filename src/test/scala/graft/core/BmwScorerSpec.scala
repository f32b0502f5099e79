package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.Props.forAll
import graft.PostingBlock
import scala.collection.mutable

/** Dueling tests (the SearchEquivalenceTestBase analogue, SURVEY.md §5.1):
  * block-max WAND / conjunction results must be RANK-IDENTICAL to a naive
  * exhaustive scorer over the same postings, for random corpora, small block
  * sizes (to force block skipping), filters and exclusions.
  */
class BmwScorerSpec extends AnyFunSuite {

  private val bm25 = Bm25()
  private val docCount = 2000L
  private val avgdl = 60.0
  private lazy val cache = bm25.normCache(avgdl)

  /** term -> sorted map docId -> (tf, normByte) */
  type Corpus = Map[String, Vector[(Long, Int, Byte)]]

  private val corpusGen: Gen[Corpus] = for {
    nTerms <- Gen.chooseNum(2, 6)
    terms = (0 until nTerms).map(i => s"t$i")
    postings <- Gen.sequence[Vector[Vector[(Long, Int, Byte)]], Vector[(Long, Int, Byte)]](
      terms.toVector.map { _ =>
        for {
          n <- Gen.chooseNum(1, 400)
          docs <- Gen.containerOfN[Set, Long](n, Gen.chooseNum(0L, 999L))
          entries <- Gen.sequence[Vector[(Long, Int, Byte)], (Long, Int, Byte)](
            docs.toVector.sorted.map { d =>
              for {
                tf <- Gen.chooseNum(1, 9)
                len <- Gen.chooseNum(1, 500)
              } yield (d, tf, SmallFloatUtil.intToByte4(len))
            })
        } yield entries
      })
  } yield terms.zip(postings).toMap

  private def iterator(c: Corpus, term: String, blockSize: Int,
      boost: Double = 1.0): BmwScorer.TermIterator = {
    val ps = c.getOrElse(term, Vector.empty)
    val df = ps.length.toLong
    val blocks: Array[PostingBlock] =
      if (ps.isEmpty) Array.empty
      else PostingBlocks.build(
        ps.map(_._1).toArray, ps.map(_._2).toArray, ps.map(_._3).toArray,
        blockSize).toArray
    new BmwScorer.TermIterator(boost * bm25.idf(df, docCount), cache, blocks)
  }

  /** Exhaustive reference: score every doc containing >=1 should / all musts. */
  private def naiveTopK(c: Corpus, should: Seq[String], must: Seq[String],
      mustNot: Seq[String], k: Int, accept: Long => Boolean): Seq[(Long, Double)] = {
    val perDoc = mutable.HashMap.empty[Long, Double].withDefaultValue(0.0)
    val docsPerTerm: Map[String, Map[Long, (Int, Byte)]] =
      c.map { case (t, ps) => t -> ps.map(p => p._1 -> (p._2, p._3)).toMap }
    val candidates: Set[Long] =
      if (must.nonEmpty)
        must.map(t => docsPerTerm.getOrElse(t, Map.empty).keySet).reduce(_ intersect _)
      else should.flatMap(t => docsPerTerm.getOrElse(t, Map.empty).keySet).toSet
    val excluded = mustNot.flatMap(t => docsPerTerm.getOrElse(t, Map.empty).keySet).toSet
    val scored = (must ++ should).distinct
    candidates.diff(excluded).filter(accept).foreach { d =>
      var s = 0.0
      scored.foreach { t =>
        docsPerTerm.getOrElse(t, Map.empty).get(d).foreach { case (tf, nb) =>
          val df = c(t).length.toLong
          s += bm25.score(bm25.idf(df, docCount), tf, nb, cache)
        }
      }
      perDoc(d) = s
    }
    perDoc.toSeq.sortBy { case (d, s) => (-s, d) }.take(k)
  }

  private def run(c: Corpus, should: Seq[String], must: Seq[String],
      mustNot: Seq[String], k: Int, blockSize: Int,
      accept: Long => Boolean = _ => true): Seq[(Long, Double)] = {
    val heap = new BmwScorer.TopKHeap(k)
    val nots = mustNot.map(iterator(c, _, blockSize)).toArray
    val acc: Long => Boolean = {
      val ne = BmwScorer.notExcluded(nots)
      d => ne(d) && accept(d)
    }
    if (must.nonEmpty)
      BmwScorer.conjunctionTopK(
        must.map(iterator(c, _, blockSize)).sortBy(_.maxScore).toArray,
        should.map(iterator(c, _, blockSize)).toArray, k, acc, heap)
    else
      BmwScorer.wandTopK(should.map(iterator(c, _, blockSize)).toArray, k, acc, heap)
    heap.drain().toSeq
  }

  private def assertRankIdentical(got: Seq[(Long, Double)],
      want: Seq[(Long, Double)]): Unit = {
    assert(got.map(_._1) == want.map(_._1),
      s"docId ranks differ:\n got=$got\nwant=$want")
    got.zip(want).foreach { case ((_, gs), (_, ws)) =>
      assert(math.abs(gs - ws) < 1e-9, s"score drift: $gs vs $ws")
    }
  }

  test("WAND disjunction rank-identical to naive, all block sizes") {
    for (blockSize <- Seq(3, 7, 128)) {
      forAll(corpusGen, n = 60) { c =>
        val terms = c.keys.toSeq.sorted
        assertRankIdentical(
          run(c, terms, Nil, Nil, 10, blockSize),
          naiveTopK(c, terms, Nil, Nil, 10, _ => true))
      }
    }
  }

  test("WAND with k=1 and k larger than hit count") {
    forAll(corpusGen, n = 40) { c =>
      val terms = c.keys.toSeq.sorted
      for (k <- Seq(1, 5000)) {
        assertRankIdentical(
          run(c, terms, Nil, Nil, k, 4),
          naiveTopK(c, terms, Nil, Nil, k, _ => true))
      }
    }
  }

  test("conjunction (MUST) rank-identical to naive") {
    forAll(corpusGen, n = 60) { c =>
      val terms = c.keys.toSeq.sorted
      val must = terms.take(2)
      val should = terms.drop(2).take(1)
      assertRankIdentical(
        run(c, should, must, Nil, 10, 5),
        naiveTopK(c, should, must, Nil, 10, _ => true))
    }
  }

  test("MUST_NOT exclusion and accept-filter rank-identical to naive") {
    forAll(corpusGen, n = 60) { c =>
      val terms = c.keys.toSeq.sorted
      val mustNot = Seq(terms.last)
      val should = terms.dropRight(1)
      val accept: Long => Boolean = d => d % 3 != 0
      assertRankIdentical(
        run(c, should, Nil, mustNot, 10, 5, accept),
        naiveTopK(c, should, Nil, mustNot, 10, accept))
    }
  }

  test("single term, absent term, empty iterator edge cases") {
    forAll(corpusGen, n = 30) { c =>
      val t = c.keys.head
      assertRankIdentical(
        run(c, Seq(t), Nil, Nil, 10, 4),
        naiveTopK(c, Seq(t), Nil, Nil, 10, _ => true))
      assert(run(c, Seq("absent_term"), Nil, Nil, 10, 4).isEmpty)
      assert(run(c, Nil, Nil, Nil, 10, 4).isEmpty)
      // conjunction with an absent term matches nothing
      assert(run(c, Nil, Seq(t, "absent_term"), Nil, 10, 4).isEmpty)
    }
  }

  test("all Similarity impls run the WAND engine rank-identical to naive") {
    // LM Dirichlet / DFR / IB consume full (df, ttf, sumTtf) stats via
    // weightFull; their non-linear score shapes must still satisfy the
    // impact-skyline bound contract, which this dueling pass verifies
    val sims: Seq[Similarity] =
      Seq(Bm25(), ClassicSimilarity(), LmDirichlet(), LmJelinekMercer(),
        DfrInB2(), DfiChiSquared(), IbLlDfH2(), AxiomaticF2Exp())
    forAll(corpusGen, n = 30) { c =>
      val sumTtf = c.values.map(_.map(_._2.toLong).sum).sum
      val terms = c.keys.toSeq.sorted
      for (sim <- sims; blockSize <- Seq(4, 128)) {
        val table = sim.normTable(avgdl)
        def wOf(t: String): Double = {
          val ps = c(t)
          sim.weightFull(ps.length.toLong, ps.map(_._2.toLong).sum,
            docCount, sumTtf, 1.0)
        }
        def it(t: String): BmwScorer.TermIterator = {
          val ps = c(t)
          val blocks: Array[PostingBlock] =
            if (ps.isEmpty) Array.empty
            else PostingBlocks.build(ps.map(_._1).toArray,
              ps.map(_._2).toArray, ps.map(_._3).toArray, blockSize).toArray
          new BmwScorer.TermIterator(wOf(t), table, blocks, 0, sim)
        }
        val heap = new BmwScorer.TopKHeap(10)
        BmwScorer.wandTopK(terms.map(it).toArray, 10, _ => true, heap)
        val got = heap.drain().toSeq
        val perDoc = mutable.HashMap.empty[Long, Double].withDefaultValue(0.0)
        for (t <- terms; (d, tf, nb) <- c(t))
          perDoc(d) += sim.score(wOf(t), tf, table(nb & 0xff))
        val want = perDoc.toSeq.sortBy { case (d, sc) => (-sc, d) }.take(10)
        assertRankIdentical(got, want)
      }
    }
  }

  test("ThetaBoard sharing: sibling floor raises theta strictly, ties survive") {
    val key = "spec-epoch/q1"
    val a = new BmwScorer.TopKHeap(2).shareTheta(key)
    val b = new BmwScorer.TopKHeap(2).shareTheta(key)
    assert(b.theta == Double.NegativeInfinity)
    a.offer(5.0, 10L)
    assert(b.theta == Double.NegativeInfinity, "floor published before full")
    a.offer(7.0, 11L) // a full: kth best = 5.0
    // sibling reads the shared floor STRICTLY below 5.0: a doc scoring
    // exactly 5.0 elsewhere may still win the global docId tie-break
    assert(b.theta < 5.0 && b.theta > 4.999999)
    // ... and exact-theta docs are admissible to b's own heap
    b.offer(5.0, 3L)
    b.offer(5.0, 4L)
    assert(b.drain().toSeq == Seq((3L, 5.0), (4L, 5.0)))
    // a's improvement propagates
    a.offer(9.0, 12L) // a = {7, 9}: floor 7
    val c = new BmwScorer.TopKHeap(2).shareTheta(key)
    assert(c.theta < 7.0 && c.theta > 6.999999)
    // unshared heap unaffected
    assert(new BmwScorer.TopKHeap(2).theta == Double.NegativeInfinity)
  }

  test("boost scales scores linearly, preserves ranks") {
    forAll(corpusGen, n = 20) { c =>
      val terms = c.keys.toSeq.sorted
      val base = run(c, terms, Nil, Nil, 10, 4)
      val heap = new BmwScorer.TopKHeap(10)
      BmwScorer.wandTopK(terms.map(iterator(c, _, 4, boost = 2.5)).toArray,
        10, _ => true, heap)
      val boosted = heap.drain().toSeq
      assert(boosted.map(_._1) == base.map(_._1))
      base.zip(boosted).foreach { case ((_, s), (_, bs)) =>
        assert(math.abs(bs - 2.5 * s) < 1e-9)
      }
    }
  }
}
