package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators beyond the reference's own surface:
  * deterministic corpus splitting, benchmark decontamination, and exact
  * duplicate-span detection. All three are standard pretraining-corpus
  * hygiene steps (the decontamination / substring-dedup shapes follow the
  * published "Deduplicating Training Data Makes Language Models Better"
  * n-gram-overlap formulation), re-expressed as declarative Spark plans:
  *
  *  - shingles are built with codegen'd array expressions (no UDFs),
  *  - every shuffle key is a fixed-width md5 digest, never the raw text,
  *  - the benchmark side of decontamination is DISTINCT + broadcast-able
  *    (a benchmark suite is KBs–MBs even when the corpus is 100 TB).
  */
object PipelineOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** `documents` spread over the session's cores before token/shingle-heavy
    * projections: the raw table is a single file split at bench scale
    * (4 MB splits >> file size), so md5-shingle explodes would otherwise
    * run in ONE task while every other core idles (guide §2.5 input skew —
    * repartition right after the read). The shuffle moves only the raw
    * rows; hashing on doc_id keeps the placement deterministic.
    */
  private def docsSpread(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))

  /** Deterministic hash split (train/holdout): the sample is a pure
    * function of doc_id via md5, so it is stable across runs, machines,
    * and re-partitionings — the property that makes held-out splits
    * reproducible on a 1000-executor cluster. First-hex-digit bucketing
    * gives 1/16 granularity; `hexDigits` picks the held-out buckets.
    * Map-only: no shuffle except the presentation sort.
    */
  def sampleHash(spark: SparkSession, sfDir: String,
      hexDigits: Seq[String] = Seq("0", "1")): DataFrame =
    docs(spark, sfDir)
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 1))
      .where(col("bucket").isin(hexDigits: _*))
      .select(col("doc_id"), col("bucket"))
      .orderBy(asc("doc_id"))

  /** Stratified deterministic sample: an EXACT per-stratum quota (here:
    * `per` docs per lang), selection ranked by a salted md5 of doc_id —
    * a pure function of the row, so the sample is identical under any
    * partitioning, cluster size, or rerun (no RNG, no `sample()`, whose
    * output is partitioning-dependent). The rank is one window per
    * stratum; at 100 TB the per-stratum sort is bounded by the stratum's
    * row count spread over its hash partitions, and WindowGroupLimit
    * pushes the quota below the sort.
    */
  def sampleStratified(spark: SparkSession, sfDir: String,
      per: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(asc("h"), asc("doc_id"))
    docs(spark, sfDir)
      .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":strat"))))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= per)
      .select(col("lang"), col("doc_id"), col("rn"))
      .orderBy(asc("lang"), asc("rn"))
  }

  /** Per-host document cap + host blocklist — the C4/CCNet-style URL-level
    * hygiene pass (a handful of hosts dominate any web crawl; pretraining
    * pipelines cap documents per registered domain and drop known-bad
    * hosts outright). `source` plays the host role here. Selection within
    * a host is ranked by an md5 of doc_id — a pure row function, so the
    * kept set is identical under any partitioning or cluster size. One
    * window per host (WindowGroupLimit pushes the cap below the sort); the
    * blocklist is a pushed-down NOT IN scan predicate, never a join.
    * Output is host-cardinality-sized: kept count + an order-insensitive
    * digest of the kept ids, which pins the exact kept SET in the oracle.
    */
  def hostCap(spark: SparkSession, sfDir: String, cap: Int = 15,
      block: Seq[String] = Seq("src7")): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(asc("h"), asc("doc_id"))
    docs(spark, sfDir)
      .where(!col("source").isin(block: _*))
      .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":host"))))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= cap)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(sort_array(collect_list(col("doc_id"))).cast("array<string>"), ",")
          .cast("binary")).as("kept_md5"))
      .orderBy(asc("source"))
  }

  /** Domain-mix weighting: given a per-stratum token budget, compute each
    * stratum's sampling rate (or epoch count when the budget exceeds the
    * stratum) — the planning step of training-mix construction (how many
    * epochs of each domain fit a token budget). One aggregate per stratum;
    * output is domain-cardinality-sized.
    */
  def mixWeights(spark: SparkSession, sfDir: String,
      budgetPerStratum: Long = 200000L): DataFrame =
    docs(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("weight",
        round(lit(budgetPerStratum.toDouble) / col("sum_chars"), 6))
      .withColumn("epochs",
        when(col("weight") > 1.0, floor(col("weight"))).otherwise(lit(0L)))
      .orderBy(asc("lang"))

  /** n-token shingle digests for one document's token array: md5 of the
    * space-joined window at every start offset. Fixed-width keys keep the
    * downstream shuffle rows small and schema-stable regardless of text.
    */
  private def shingleDigests(toks: Column, n: Int): Column =
    // sequence() flips direction when start > stop, so short docs need an
    // explicit empty-array branch rather than a negative upper bound
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => md5(concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Benchmark decontamination: flag training documents sharing any
    * `n`-token shingle with the benchmark set. The benchmark here is the
    * deterministic doc_id % benchMod == 0 slice of the corpus (no external data
    * in this sandbox); in production it is the actual eval suites. Shape:
    * benchmark shingles are DISTINCT and tiny -> broadcast semi-ish join;
    * training side streams. Returns (doc_id, n_hits) per contaminated doc,
    * n_hits = number of distinct contaminated shingles in that doc.
    * (This demo derives the bench side from the corpus, which re-scans
    * `documents` for it; `decontaminateAgainst` below is the production
    * entry point taking the benchmark as its own table.)
    */
  def decontaminate(spark: SparkSession, sfDir: String, n: Int = 8,
      benchMod: Int = 7): DataFrame = {
    val d = docs(spark, sfDir)
    decontaminateAgainst(
      d.where(col("doc_id") % benchMod =!= 0),
      d.where(col("doc_id") % benchMod === 0), n)
  }

  /** Production decontamination shape: the benchmark is its OWN table
    * (doc_id, text) — eval suites ARE a separate, tiny corpus — so the
    * training corpus is scanned exactly once: shingles explode straight
    * into the broadcast join, no pre-join shuffle, and per-doc dedupe
    * happens inside the final doc_id-keyed aggregate (count(DISTINCT sh)
    * — same result as a pre-join distinct without shuffling the full
    * training shingle set). Only the tiny bench side pays a distinct.
    */
  def decontaminateAgainst(train: DataFrame, bench: DataFrame,
      n: Int = 8): DataFrame = {
    // materialize the token array in its own projection BEFORE the shingle
    // transform: an inlined tokensCol would re-evaluate the whole
    // split/filter chain for EVERY lambda element (measured 10x at sf0.1)
    // spread first: the train scan is one file split at bench scale and the
    // shingle explode would run single-task (see docsSpread)
    val tr = train
      .repartition(train.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .select(col("doc_id"), TextOps.tokensCol(col("text")).as("toks"))
      .select(col("doc_id"), explode(shingleDigests(col("toks"), n)).as("sh"))
    val be = bench
      .select(TextOps.tokensCol(col("text")).as("toks"))
      .select(explode(shingleDigests(col("toks"), n)).as("sh"))
      .distinct()
    tr.join(broadcast(be), "sh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sh")).as("n_hits"))
      .orderBy(asc("doc_id"))
  }

  /** Duplicate-span COVERAGE — the quantified form of dedupSpans (the
    * ExactSubstr measure from "Deduplicating Training Data Makes Language
    * Models Better": how much of each doc is covered by text that also
    * occurs elsewhere): per doc, the count of token positions lying inside
    * at least one `n`-token shingle shared with ANOTHER document, and
    * keep_ratio = 1 - covered/len — the signal a span-rewrite policy cuts
    * on. Shape: offset-keyed shingles, sharer counts via a window over the
    * digest (same single-scan trick as dedupSpans), then coverage as a
    * bounded ×n positional explode de-duplicated per (doc, pos). Every
    * shuffle is digest- or doc-keyed; no pair join.
    */
  def dedupSpanCoverage(spark: SparkSession, sfDir: String,
      n: Int = 16): DataFrame = {
    val shingled = docsSpread(spark, sfDir)
      .select(col("doc_id"), TextOps.tokensCol(col("text")).as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
        explode(expr(
          s"transform(sequence(0, size(toks) - $n), i -> struct(i AS off, " +
            s"md5(array_join(slice(toks, i + 1, $n), ' ')) AS sh))"))
          .as("s"))
      .select(col("doc_id"), col("len"), col("s.off").as("off"),
        col("s.sh").as("sh"))
    // distinct-doc sharers per digest as WINDOW AGGREGATES over ONE
    // digest-keyed shuffle (never a collected id set, and never a second
    // scan: the r5 shape re-derived the whole scan+shingle subtree for a
    // dupDigests self-join — Spark does not share common subplans, so the
    // corpus was tokenized twice). first_in_doc marks one row per
    // (digest, doc); summing it over the digest partition IS the
    // distinct-doc sharer count.
    val wDoc = Window.partitionBy(col("sh"), col("doc_id"))
      .orderBy(asc("off"))
    val wSh = Window.partitionBy(col("sh"))
    val covered = shingled
      .withColumn("first_in_doc",
        when(row_number().over(wDoc) === 1, 1L).otherwise(0L))
      .withColumn("n_docs", sum(col("first_in_doc")).over(wSh))
      .where(col("n_docs") >= 2)
      .select(col("doc_id"), col("len"),
        explode(expr(s"sequence(off, off + ${n - 1})")).as("pos"))
      .distinct() // overlapping shared shingles cover a position once
      .groupBy(col("doc_id"), col("len"))
      .agg(count(lit(1)).as("covered"))
    covered
      .select(col("doc_id"), col("len"), col("covered"),
        round(lit(1.0) - col("covered") / col("len"), 4).as("keep_ratio"))
      .orderBy(asc("doc_id"))
  }

  /** Contamination FRACTION + drop policy (the thresholded form of
    * decontaminate): per training doc, the share of its distinct `n`-token
    * shingles that also occur in the benchmark set, and the drop verdict
    * at `threshold` — the policy knob real pipelines tune (a doc quoting
    * one bench sentence survives; a near-copy is dropped). The per-doc
    * denominator is a map-only array_distinct size (no extra shuffle over
    * the training shingle set — the distinct array rides the same row as
    * the explode), the bench side stays a tiny broadcast.
    */
  def decontaminateFraction(spark: SparkSession, sfDir: String, n: Int = 8,
      benchMod: Int = 7, threshold: Double = 0.05): DataFrame = {
    val d = docs(spark, sfDir)
    // toks materialized in its own projection first — see decontaminateAgainst
    // the per-doc denominator rides INSIDE the exploded struct: exploding a
    // bare attribute makes InferFiltersFromGenerate add a pushable
    // size(shs) > 0 filter whose pushdown re-inlines the whole tokenize +
    // shingle chain below the alias boundary and re-evaluates it per row
    // (measured 10x at sf0.1); exploding this transform() expression is
    // not inferred on, and size(shs) inside the lambda is an O(1) lookup
    // on the materialized array
    val tr = d.where(col("doc_id") % benchMod =!= 0)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), TextOps.tokensCol(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(shingleDigests(col("toks"), n)).as("shs"))
      .select(col("doc_id"), explode(transform(col("shs"),
        x => struct(size(col("shs")).cast("long").as("n_sh"),
          x.as("sh")))).as("e"))
      .select(col("doc_id"), col("e.n_sh").as("n_sh"), col("e.sh").as("sh"))
    val be = d.where(col("doc_id") % benchMod === 0)
      .select(TextOps.tokensCol(col("text")).as("toks"))
      .select(explode(shingleDigests(col("toks"), n)).as("sh"))
      .distinct()
    tr.join(broadcast(be), "sh")
      .groupBy(col("doc_id"), col("n_sh"))
      .agg(count(lit(1)).as("n_hits")) // shs pre-distinct, so count == countDistinct
      .withColumn("frac", round(col("n_hits") / col("n_sh"), 4))
      .withColumn("dropped", col("n_hits") / col("n_sh") > threshold)
      .select(col("doc_id"), col("n_sh"), col("n_hits"), col("frac"), col("dropped"))
      .orderBy(asc("doc_id"))
  }

  /** GPT-style sequence packing: concatenate documents in doc_id order and
    * chunk the token stream into fixed `budget`-token training sequences;
    * each doc reports its start offset, owning sequence, and whether it
    * straddles a boundary. The global prefix sum is TWO-LEVEL: per-block
    * (doc_id div 1000) token totals get a cumulative offset (a window over
    * the tiny block-totals frame), then each block's docs cumsum locally
    * under a window PARTITIONED by block — no stage ever puts the corpus
    * in one partition. At 10^12 docs the block-offset frame is 10^9 rows:
    * swap the broadcast join for a shuffle join and add a third level;
    * the shape is otherwise unchanged.
    */
  def packSequences(spark: SparkSession, sfDir: String,
      budget: Int = 512, blockSize: Int = 1000): DataFrame = {
    val base = docs(spark, sfDir)
      .select(col("doc_id"),
        size(TextOps.tokensCol(col("text"))).cast("long").as("n_tokens"),
        (col("doc_id") / blockSize).cast("long").as("blk"))
    val wb = Window.orderBy(asc("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkOff = base.groupBy(col("blk"))
      .agg(sum(col("n_tokens")).as("blk_tokens"))
      .withColumn("blk_off", coalesce(sum(col("blk_tokens")).over(wb), lit(0L)))
      .select(col("blk"), col("blk_off"))
    val wd = Window.partitionBy(col("blk")).orderBy(asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(blkOff), "blk")
      .withColumn("start_off",
        col("blk_off") + coalesce(sum(col("n_tokens")).over(wd), lit(0L)))
      .withColumn("seq_id", floor(col("start_off") / budget))
      .withColumn("spans_boundary",
        floor((col("start_off") + col("n_tokens") - 1) / budget) > col("seq_id"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"), col("seq_id"),
        col("spans_boundary"))
      .orderBy(asc("doc_id"))
  }

  /** Exact duplicate-span detection: documents containing an `n`-token
    * span whose exact text also occurs in ANOTHER document. The
    * n-gram-granular form of suffix-array substring dedup: emit each
    * doc's distinct shingle digests, count sharers per digest with a
    * WINDOW over the digest (Spark does not share common subplans, so a
    * shared-digests self-join would scan + explode the corpus twice —
    * the dominant cost at 100 TB), keep rows whose digest is held by
    * >= 2 docs, report (doc_id, dup_spans). Single corpus scan, three
    * digest-keyed shuffles; no pair materialization anywhere — a shingle
    * shared by a million docs costs a count, not 10^12 pairs.
    */
  def dedupSpans(spark: SparkSession, sfDir: String, n: Int = 16): DataFrame = {
    val shingled = docsSpread(spark, sfDir)
      .select(col("doc_id"), TextOps.tokensCol(col("text")).as("toks"))
      .select(col("doc_id"), explode(shingleDigests(col("toks"), n)).as("sh"))
      .distinct()
    val perDigest = org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))
    shingled
      .withColumn("ndocs", count(lit(1)).over(perDigest))
      .where(col("ndocs") >= 2)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_spans"))
      .orderBy(asc("doc_id"))
  }

  /** Fixed-size token-window chunking with overlap — the RAG / pretraining
    * document splitter (context-window packing's sibling: pack_sequences
    * concatenates short docs, this SPLITS long ones). Chunk i covers
    * tokens [i*stride, i*stride + chunkSize); every token lands in a
    * chunk, consecutive chunks overlap by chunkSize - stride tokens, the
    * tail chunk may be short. Emits a content digest per chunk rather
    * than the token payload. Pure map-side higher-order array functions
    * (sequence/transform/slice) inside WholeStageCodegen — zero shuffles
    * at ANY corpus size; the per-task row-group bound caps memory.
    */
  def chunkDocuments(spark: SparkSession, sfDir: String,
      chunkSize: Int = 64, stride: Int = 48, maxDoc: Long = 300): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize (got stride=$stride size=$chunkSize)")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < maxDoc)
      .select(col("doc_id"), TextOps.tokensCol(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          floor((size(col("toks")) - 1) / stride).cast("int"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .cast("long").as("n_tokens"),
        md5(concat_ws(" ",
          slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkSize))))
          .as("chunk_md5"))
      .orderBy(asc("doc_id"), asc("chunk_idx"))
  }

  /** Boilerplate-line removal (the CCNet / C4 per-domain frequent-paragraph
    * strip): a line occurring in >= `threshold` of its source's documents
    * is boilerplate (nav bars, footers, subscribe prompts) and is dropped
    * from every document of that source. Deterministic demo augmentation
    * (reproduced verbatim in the oracle): every doc gains its source's
    * footer line (frequency 1.0 -> stripped) and every even doc a promo
    * line (~0.5 -> kept at threshold 0.9).
    *
    * 100-TB shape: line frequencies aggregate on (source, line) — one
    * shuffle of line TEXT per distinct line, not per occurrence (the agg
    * is partial-aggregated map-side); the boilerplate SET that survives
    * the threshold is tiny (per-domain headers/footers) and joins back
    * BROADCAST, after which the strip is a map-only array filter on each
    * doc's own lines. The corpus is never shuffled.
    */
  def boilerplateStrip(spark: SparkSession, sfDir: String,
      threshold: Double = 0.9): DataFrame = {
    val aug = docs(spark, sfDir).select(
      col("doc_id"), col("source"),
      concat(col("text"), lit("\n"),
        concat(lit("subscribe to "), col("source"), lit(" updates")),
        when(col("doc_id") % 2 === 0, lit("\npromo: click here"))
          .otherwise(lit(""))).as("t"))
      .withColumn("lines", split(col("t"), "\n"))
    // array_distinct first (map-only): c counts DOCUMENTS containing the
    // line, so an in-doc repeat can't inflate a line past the threshold
    val freq = aug
      .select(col("source"), explode(array_distinct(col("lines"))).as("line"))
      .groupBy(col("source"), col("line"))
      .agg(count(lit(1)).as("c"))
    val tot = docs(spark, sfDir).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val bp = freq.join(broadcast(tot), "source")
      .where(col("c") * lit(1.0) / col("n_docs") >= threshold)
      .groupBy(col("source"))
      .agg(collect_list(col("line")).as("bp"))
    aug.join(broadcast(bp), Seq("source"), "left")
      .withColumn("kept",
        filter(col("lines"), l => !array_contains(
          coalesce(col("bp"), array().cast("array<string>")), l)))
      .select(col("doc_id"),
        size(col("kept")).cast("long").as("n_kept"),
        md5(array_join(col("kept"), "\n").cast("binary")).as("kept_md5"))
      .orderBy(asc("doc_id"))
  }
}
