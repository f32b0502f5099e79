package graft.core

/** Similarity SPI [B lucene/core/src/java/org/apache/lucene/search/similarities/Similarity.java]:
  * a scoring model the WAND engine can run unchanged. The contract that
  * keeps the stored impact skylines admissible for ANY implementation:
  * `score` must be non-decreasing in tf and non-increasing in decoded doc
  * length (normTable value ordering is up to the model; the bound is taken
  * over the block's competitive (tf, norm) skyline with the model's own
  * score function, so admissibility needs exactly those monotonicities).
  */
trait Similarity extends Serializable {
  /** Per-term query weight from collection stats (idf and boost folded). */
  def weight(df: Long, docCount: Long, boost: Double): Double
  /** Per-term query weight from FULL term statistics — language-model
    * similarities need the term's total frequency and the collection's
    * (Lucene's TermStatistics/CollectionStatistics pair, which
    * createWeight always receives). Default: the df-only weight.
    */
  def weightFull(df: Long, ttf: Long, docCount: Long, sumTtf: Long,
      boost: Double): Double = weight(df, docCount, boost)
  /** Per-norm-byte doc-length component, indexed by normByte & 0xFF. */
  def normTable(avgdl: Double): Array[Double]
  /** Hot-path score: weight x tf x table(normByte). */
  def score(weight: Double, tf: Int, normVal: Double): Double
  /** Fractional-frequency score — phrase queries feed a possibly
    * fractional freq (sloppy matches weigh 1/(distance+1), Lucene
    * SloppyPhraseMatcher.sloppyWeight). Must agree with `score` at
    * integer freq, and stay monotone in freq for bound admissibility.
    */
  def scoreFreq(weight: Double, freq: Double, normVal: Double): Double
}

/** Lucene 8.11 ClassicSimilarity (pre-BM25 TF-IDF)
  * [B lucene/core/src/java/org/apache/lucene/search/similarities/ClassicSimilarity.java,
  * TFIDFSimilarity.java#TFIDFScorer]:
  * idf = 1 + ln((docCount+1)/(df+1)) applied ONCE — queryWeight =
  * boost * idf, score = queryWeight * sqrt(freq) * lengthNorm. (The
  * pre-Lucene-7 idf^2 query-weight x field-weight composition died with
  * queryNorm in LUCENE-7347; round-2 shipped the squared form, flagged by
  * ADVICE r2 and fixed here with the oracle in lockstep.) tf = sqrt(freq);
  * lengthNorm = 1/sqrt(dl) over the SAME SmallFloat-quantized doc length
  * the index stores. Increasing in tf, decreasing in dl, so the impact
  * skylines stay admissible.
  */
final case class ClassicSimilarity() extends Similarity {
  def idf(df: Long, docCount: Long): Double =
    1.0 + math.log((docCount + 1.0) / (df + 1.0))
  override def weight(df: Long, docCount: Long, boost: Double): Double =
    boost * idf(df, docCount)
  override def normTable(avgdl: Double): Array[Double] =
    Array.tabulate(256) { i =>
      val dl = SmallFloatUtil.LengthTable(i).toDouble
      if (dl <= 0) 0.0 else 1.0 / math.sqrt(dl)
    }
  override def score(weight: Double, tf: Int, normVal: Double): Double =
    weight * math.sqrt(tf.toDouble) * normVal
  override def scoreFreq(weight: Double, freq: Double, normVal: Double): Double =
    weight * math.sqrt(freq) * normVal
}

/** BM25 with Lucene 8.11 semantics
  * [B lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java]:
  *
  *   idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   score    = boost * idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))
  *
  * Lucene >= 8.0 dropped the classic (k1+1) numerator (rank-preserving,
  * LUCENE-8563 line of work), and dl is the LOSSY SmallFloat-quantized
  * doc length decoded from the norm byte; the k1*(1-b+b*dl/avgdl) factor is
  * precomputed per possible norm byte (the 256-entry cache below), exactly
  * as Lucene's BM25Scorer does. avgdl = sumTotalTermFreq / docCount.
  *
  * Deliberate deviation, documented for the rank-identity contract
  * (SURVEY.md §7.4-1): arithmetic is IEEE double end-to-end rather than
  * Lucene's float. Double is strictly more precise and keeps the engine,
  * the independent naive oracle, and the DuckDB SQL oracle bit-comparable;
  * ranks can differ from float-Lucene only on last-ulp near-ties, and all
  * exact ties break deterministically (score desc, docId asc).
  */
final case class Bm25(k1: Double = 1.2, b: Double = 0.75) extends Similarity {
  require(k1 >= 0 && b >= 0 && b <= 1, s"invalid BM25 params k1=$k1 b=$b")

  def idf(df: Long, docCount: Long): Double =
    math.log(1.0 + (docCount - df + 0.5) / (df + 0.5))

  // ---- Similarity SPI: table value = the k1*(1-b+b*dl/avgdl) denominator
  override def weight(df: Long, docCount: Long, boost: Double): Double =
    boost * idf(df, docCount)
  override def normTable(avgdl: Double): Array[Double] = normCache(avgdl)
  override def score(weight: Double, tf: Int, normVal: Double): Double =
    weight * tf / (tf + normVal)
  override def scoreFreq(weight: Double, freq: Double, normVal: Double): Double =
    weight * freq / (freq + normVal)

  /** Per-norm-byte denominator cache: k1 * (1 - b + b * dl / avgdl). */
  def normCache(avgdl: Double): Array[Double] =
    Array.tabulate(256) { i =>
      val dl = SmallFloatUtil.LengthTable(i).toDouble
      k1 * (1.0 - b + b * dl / avgdl)
    }

  /** Direct (uncached) score — cache path must equal this exactly. */
  def scoreDirect(tf: Int, normByte: Byte, df: Long, docCount: Long,
      avgdl: Double, boost: Double = 1.0): Double = {
    val dl = SmallFloatUtil.byte4ToInt(normByte).toDouble
    val norm = k1 * (1.0 - b + b * dl / avgdl)
    boost * idf(df, docCount) * tf / (tf + norm)
  }

  /** Hot-path score given a prebuilt weight = boost*idf and norm cache. */
  @inline def score(weight: Double, tf: Int, normByte: Byte,
      cache: Array[Double]): Double =
    weight * tf / (tf + cache(normByte & 0xff))

  /** Upper bound of score over a posting block, for block-max WAND: score is
    * increasing in tf and decreasing in the cache term, so max over the
    * block's actual (tf, norm) pairs is exact (we store the bound itself;
    * simpler than Lucene's similarity-agnostic impact pairs — SURVEY.md §2.4).
    */
  def blockMaxImpact(tfs: Array[Int], norms: Array[Byte], df: Long,
      docCount: Long, avgdl: Double): Double = {
    val cache = normCache(avgdl)
    val w = idf(df, docCount)
    var best = 0.0
    var i = 0
    while (i < tfs.length) {
      val s = score(w, tfs(i), norms(i), cache)
      if (s > best) best = s
      i += 1
    }
    best
  }
}

/** LM Dirichlet similarity (Zhai & Lafferty 2001, "A study of smoothing
  * methods for language models applied to ad hoc information retrieval";
  * [B lucene/core/src/java/org/apache/lucene/search/similarities/LMDirichletSimilarity.java,
  * LMSimilarity.java#DefaultCollectionModel]):
  *
  *   p(t|C)  = (ttf + 1) / (sumTotalTermFreq + 2)   (collection model,
  *             add-one smoothed so unseen terms keep a finite score)
  *   score   = ln(1 + tf / (mu * p(t|C))) + ln(mu / (dl + mu)),
  *             clamped at 0 (negative LM scores would break top-k
  *             accounting; same clamp the reference applies)
  *
  * dl is the SmallFloat-quantized doc length the index stores. The score is
  * non-decreasing in tf and non-increasing in dl, so the stored (tf, norm)
  * impact skylines stay admissible and the UNMODIFIED block-max WAND engine
  * runs this model — the third Similarity implementation through the SPI.
  *
  * The additive shape is folded into the SPI as: weightFull returns
  * mu * p(t|C) (the per-term smoothing mass), normTable holds the
  * ln(mu / (dl + mu)) doc-length component, and score combines them.
  * Query boosts are not separable in this encoding — require boost == 1
  * (Lucene multiplies the whole sum by boost; reject loudly rather than
  * silently misrank).
  */
final case class LmDirichlet(mu: Double = 2000.0) extends Similarity {
  require(mu > 0, s"invalid LM Dirichlet mu=$mu")

  override def weight(df: Long, docCount: Long, boost: Double): Double =
    throw new UnsupportedOperationException(
      "LmDirichlet needs full term stats — engine must call weightFull")
  override def weightFull(df: Long, ttf: Long, docCount: Long, sumTtf: Long,
      boost: Double): Double = {
    require(boost == 1.0,
      s"LmDirichlet supports boost == 1 only (got $boost)")
    mu * (ttf + 1.0) / (sumTtf + 2.0)
  }
  override def normTable(avgdl: Double): Array[Double] =
    Array.tabulate(256) { i =>
      val dl = SmallFloatUtil.LengthTable(i).toDouble
      math.log(mu / (dl + mu))
    }
  override def score(weight: Double, tf: Int, normVal: Double): Double =
    scoreFreq(weight, tf.toDouble, normVal)
  override def scoreFreq(weight: Double, freq: Double, normVal: Double): Double = {
    val s = math.log(1.0 + freq / weight) + normVal
    if (s > 0.0) s else 0.0
  }
}

/** LM Jelinek-Mercer similarity (Zhai & Lafferty 2001, same smoothing
  * study as Dirichlet; [B lucene/core/src/java/org/apache/lucene/search/similarities/LMJelinekMercerSimilarity.java,
  * LMSimilarity.java#DefaultCollectionModel]):
  *
  *   p(t|C) = (ttf + 1) / (sumTotalTermFreq + 2)    (collection model,
  *            add-one smoothed — shared with LmDirichlet)
  *   score  = ln(1 + ((1 - lambda) * tf / dl) / (lambda * p(t|C)))
  *
  * dl is the SmallFloat-quantized doc length the index stores; the score
  * is always > 0 for tf > 0 (no clamp needed, unlike Dirichlet). SPI
  * folding: weightFull carries lambda * p(t|C) / (1 - lambda) (the
  * smoothing-mass ratio), normTable carries 1/dl, and scoreFreq is
  * ln(1 + freq * normVal / weight). Monotone: increasing in tf,
  * decreasing in dl — the (tf, norm) impact skylines stay admissible and
  * the UNMODIFIED block-max WAND engine runs the model (the second
  * language-model family member). Boost is not separable in the additive
  * log shape — require boost == 1, same contract as LmDirichlet.
  */
final case class LmJelinekMercer(lambda: Double = 0.7) extends Similarity {
  require(lambda > 0 && lambda < 1, s"invalid LM JM lambda=$lambda")

  override def weight(df: Long, docCount: Long, boost: Double): Double =
    throw new UnsupportedOperationException(
      "LmJelinekMercer needs full term stats — engine must call weightFull")
  override def weightFull(df: Long, ttf: Long, docCount: Long, sumTtf: Long,
      boost: Double): Double = {
    require(boost == 1.0,
      s"LmJelinekMercer supports boost == 1 only (got $boost)")
    lambda * ((ttf + 1.0) / (sumTtf + 2.0)) / (1.0 - lambda)
  }
  override def normTable(avgdl: Double): Array[Double] =
    Array.tabulate(256) { i =>
      val dl = SmallFloatUtil.LengthTable(i).toDouble
      if (dl <= 0) 0.0 else 1.0 / dl
    }
  override def score(weight: Double, tf: Int, normVal: Double): Double =
    scoreFreq(weight, tf.toDouble, normVal)
  override def scoreFreq(weight: Double, freq: Double, normVal: Double): Double =
    math.log(1.0 + freq * normVal / weight)
}

/** DFR I(n)B2 similarity (Amati & van Rijsbergen 2002, "Probabilistic
  * models of information retrieval based on measuring the divergence from
  * randomness"; [B lucene/core/src/java/org/apache/lucene/search/similarities/DFRSimilarity.java,
  * BasicModelIn.java, AfterEffectB.java, NormalizationH2.java]):
  *
  *   tfn   = tf * log2(1 + c * avgdl / dl)          (normalization H2, c=1)
  *   inf   = tfn * log2((N + 1) / (df + 0.5))       (basic model I(n))
  *   gain  = (ttf + 1) / (df * (tfn + 1))           (after-effect B)
  *   score = boost * gain * inf
  *
  * The product factors as [boost * (ttf+1)/df * log2((N+1)/(df+0.5))] *
  * tfn/(tfn+1) — so weightFull carries the bracket (per-term), normTable
  * carries the per-doc-length log2(1 + c*avgdl/dl), and score combines
  * them. tfn/(tfn+1) is increasing in tfn; tfn is increasing in tf and
  * decreasing in dl — the impact-skyline monotonicity contract holds and
  * the UNMODIFIED WAND engine runs the model (fourth Similarity impl).
  */
final case class DfrInB2(c: Double = 1.0) extends Similarity {
  require(c > 0, s"invalid DFR H2 c=$c")
  private val Ln2 = math.log(2.0)

  override def weight(df: Long, docCount: Long, boost: Double): Double =
    throw new UnsupportedOperationException(
      "DfrInB2 needs full term stats — engine must call weightFull")
  override def weightFull(df: Long, ttf: Long, docCount: Long, sumTtf: Long,
      boost: Double): Double =
    if (df <= 0) 0.0
    else boost * ((ttf + 1.0) / df) *
      (math.log((docCount + 1.0) / (df + 0.5)) / Ln2)
  override def normTable(avgdl: Double): Array[Double] =
    Array.tabulate(256) { i =>
      val dl = SmallFloatUtil.LengthTable(i).toDouble
      if (dl <= 0) 0.0 else math.log(1.0 + c * avgdl / dl) / Ln2
    }
  override def score(weight: Double, tf: Int, normVal: Double): Double =
    scoreFreq(weight, tf.toDouble, normVal)
  override def scoreFreq(weight: Double, freq: Double, normVal: Double): Double = {
    val tfn = freq * normVal
    weight * tfn / (tfn + 1.0)
  }
}

/** DFI chi-squared similarity (Kocabaş & Dinçer 2014, "A nonparametric
  * term weighting method for information retrieval based on measuring the
  * divergence from independence";
  * [B lucene/core/src/java/org/apache/lucene/search/similarities/DFISimilarity.java,
  * IndependenceChiSquared.java]):
  *
  *   expected = ttf * dl / sumTtf     (term mass expected in a dl-token doc
  *                                     under term/doc independence)
  *   score    = 0                                        when tf <= expected
  *            = log2((tf - expected)^2 / expected + 1)   otherwise
  *
  * SPI folding: weightFull carries ttf/sumTtf (boost == 1 required, same
  * contract as LmDirichlet — DFI multiplies the whole term score by boost
  * and this encoding has no slot for it), normTable carries the DECODED
  * quantized doc length itself, and scoreFreq computes expected =
  * weight * norm. Monotone: increasing in tf past the clamp; decreasing in
  * dl (d(measure)/d(expected) = -(tf-e)(tf+e)/e^2 < 0) — so the
  * similarity-agnostic (tf, norm) impact skylines stay admissible and the
  * UNMODIFIED WAND engine runs the model (fifth Similarity impl).
  */
final case class DfiChiSquared() extends Similarity {
  private val Ln2 = math.log(2.0)

  override def weight(df: Long, docCount: Long, boost: Double): Double =
    throw new UnsupportedOperationException(
      "DfiChiSquared needs full term stats — engine must call weightFull")
  override def weightFull(df: Long, ttf: Long, docCount: Long, sumTtf: Long,
      boost: Double): Double = {
    require(boost == 1.0,
      s"DfiChiSquared supports boost == 1 only (got $boost)")
    if (sumTtf <= 0) 0.0 else ttf.toDouble / sumTtf
  }
  override def normTable(avgdl: Double): Array[Double] =
    Array.tabulate(256)(i => SmallFloatUtil.LengthTable(i).toDouble)
  override def score(weight: Double, tf: Int, normVal: Double): Double =
    scoreFreq(weight, tf.toDouble, normVal)
  override def scoreFreq(weight: Double, freq: Double, normVal: Double): Double = {
    val e = weight * normVal
    if (e <= 0.0 || freq <= e) 0.0
    else math.log((freq - e) * (freq - e) / e + 1.0) / Ln2
  }
}

/** IB LL-DF-H2 similarity (Clinchant & Gaussier 2010, "Information-based
  * models for ad hoc information retrieval";
  * [B lucene/core/src/java/org/apache/lucene/search/similarities/IBSimilarity.java,
  * DistributionLL.java, LambdaDF.java, NormalizationH2.java]):
  *
  *   lambda = (df + 1) / (N + 1)                    (lambda-DF)
  *   tfn    = tf * log2(1 + c * avgdl / dl)         (normalization H2, c=1)
  *   score  = ln(1 + tfn / lambda)                  (log-logistic
  *            distribution: -ln(lambda / (tfn + lambda)), natural log as in
  *            the reference's DistributionLL)
  *
  * SPI folding: weightFull carries lambda (boost == 1 required — IB
  * multiplies the whole term score by boost and this encoding has no slot
  * for it, same contract as LmDirichlet), normTable carries the per-dl H2
  * factor log2(1 + c*avgdl/dl), and scoreFreq combines them. Monotone:
  * increasing in tf, decreasing in dl (the H2 factor shrinks as dl grows) —
  * the (tf, norm) impact skylines stay admissible and the UNMODIFIED
  * block-max WAND engine runs the model (seventh Similarity impl, the
  * information-based family).
  */
final case class IbLlDfH2(c: Double = 1.0) extends Similarity {
  require(c > 0, s"invalid IB H2 c=$c")
  private val Ln2 = math.log(2.0)

  override def weight(df: Long, docCount: Long, boost: Double): Double =
    throw new UnsupportedOperationException(
      "IbLlDfH2 needs full term stats — engine must call weightFull")
  override def weightFull(df: Long, ttf: Long, docCount: Long, sumTtf: Long,
      boost: Double): Double = {
    require(boost == 1.0, s"IbLlDfH2 supports boost == 1 only (got $boost)")
    (df + 1.0) / (docCount + 1.0)
  }
  override def normTable(avgdl: Double): Array[Double] =
    Array.tabulate(256) { i =>
      val dl = SmallFloatUtil.LengthTable(i).toDouble
      if (dl <= 0) 0.0 else math.log(1.0 + c * avgdl / dl) / Ln2
    }
  override def score(weight: Double, tf: Int, normVal: Double): Double =
    scoreFreq(weight, tf.toDouble, normVal)
  override def scoreFreq(weight: Double, freq: Double, normVal: Double): Double =
    math.log(1.0 + freq * normVal / weight)
}

/** Axiomatic F2EXP similarity (Fang & Zhai 2005, "An exploration of
  * axiomatic approaches to information retrieval";
  * [B lucene/core/src/java/org/apache/lucene/search/similarities/AxiomaticF2EXP.java,
  * Axiomatic.java]):
  *
  *   idf   = ((N + 1) / df)^k                 (k = 0.35)
  *   score = boost * idf * tf / (tf + s + s * dl / avgdl)   (s = 0.5)
  *
  * The F2 variants fold tf entirely into the length-normalized fraction,
  * so the model factors EXACTLY like BM25 on this SPI: weight carries
  * boost * idf (df-only — no weightFull needed, boosts compose), normTable
  * carries s + s*dl/avgdl, and score is weight * tf / (tf + normVal).
  * Increasing in tf, decreasing in dl — skylines admissible, unmodified
  * WAND engine (eighth Similarity impl, the axiomatic family).
  */
final case class AxiomaticF2Exp(s: Double = 0.5, k: Double = 0.35)
    extends Similarity {
  require(s >= 0 && k > 0 && k <= 1, s"invalid F2EXP params s=$s k=$k")

  override def weight(df: Long, docCount: Long, boost: Double): Double =
    if (df <= 0) 0.0 else boost * math.pow((docCount + 1.0) / df, k)
  override def normTable(avgdl: Double): Array[Double] =
    Array.tabulate(256) { i =>
      val dl = SmallFloatUtil.LengthTable(i).toDouble
      s + s * dl / avgdl
    }
  override def score(weight: Double, tf: Int, normVal: Double): Double =
    scoreFreq(weight, tf.toDouble, normVal)
  override def scoreFreq(weight: Double, freq: Double, normVal: Double): Double =
    weight * freq / (freq + normVal)
}

/** BooleanSimilarity
  * [B lucene/core/src/java/org/apache/lucene/search/similarities/BooleanSimilarity.java]:
  * every matching term contributes exactly its query boost — tf, doc
  * length, and collection stats are all ignored, so a disjunction scores
  * each doc by the SUM of matched clauses' boosts (Lucene composes the
  * per-clause constant scores through the normal BooleanQuery sum). The
  * constant per-term score is trivially non-decreasing in tf and
  * non-increasing in doc length, so the (tf, norm) impact skylines stay
  * admissible and the unmodified WAND engine runs it (sixth Similarity
  * impl); WAND's block bound for a term is just its boost, which makes
  * theta-pruning exact once the heap fills with k docs matching the
  * heaviest clause sets.
  */
final case class BooleanSimilarity() extends Similarity {
  override def weight(df: Long, docCount: Long, boost: Double): Double = boost
  override def normTable(avgdl: Double): Array[Double] =
    Array.fill(256)(1.0)
  override def score(weight: Double, tf: Int, normVal: Double): Double = weight
  override def scoreFreq(weight: Double, freq: Double, normVal: Double): Double =
    weight
}
