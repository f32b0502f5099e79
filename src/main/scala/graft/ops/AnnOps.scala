package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.mutable

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label). Brute-force cosine top-k as the exactness baseline;
  * an IVF (inverted-file) variant as the scale path — cluster the vectors,
  * search only the closest `nprobe` clusters. With nprobe == nlist the IVF
  * path degenerates to exact brute force (used to share the SQL oracle);
  * recall@k for nprobe < nlist is asserted in tests.
  */
object AnnOps {

  /** Members dropped by dedupEmbedding's per-cell cap in the most recent
    * action (no-silent-caps observability; 0 == exhaustive within cells).
    */
  @volatile var lastCellCapDrops: Option[org.apache.spark.util.LongAccumulator] = None

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Cosine similarity as a Catalyst expression over two double arrays —
    * left-to-right summation, bit-stable across engines.
    */
  def cosineExpr(a: String, b: String): org.apache.spark.sql.Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), 0d, (s, v) -> s + v)") /
      (sqrt(expr(s"aggregate($a, 0d, (s, v) -> s + cast(v as double) * cast(v as double))")) *
        sqrt(expr(s"aggregate($b, 0d, (s, v) -> s + cast(v as double) * cast(v as double))")))

  val QueryVecIds: Seq[Int] = Seq(0, 1, 2)

  /** Brute-force cosine top-k neighbors for a fixed probe set of query
    * vectors. The query side is broadcast (k rows), the corpus side streams
    * — one narrow pass + a per-query top-k, no all-pairs shuffle.
    */
  def annBruteForce(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val e = emb(spark, sfDir)
    val queries = e.where(col("vec_id").isin(QueryVecIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("vec_id"))
    e.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineExpr("embedding", "qvec"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(asc("query_id"), asc("rank"))
  }

  /** Pre-filtered vector search
    * [B lucene/core/src/java/org/apache/lucene/search/KnnFloatVectorQuery.java
    * `filter` ctor arg]: top-k cosine neighbors among ONLY the vectors
    * whose metadata passes an acceptance filter — Lucene applies the
    * filter to build the accepted-docs bitset BEFORE the k selection
    * (pre-filtering), so the result always holds k accepted docs rather
    * than post-filtering a generic top-k down to fewer. Spark-first the
    * filter is a plain pushed-down predicate on the corpus scan (here
    * `label = 1`, standing in for any metadata fq); the query side stays a
    * broadcast and the corpus streams once — the same no-all-pairs shape
    * as annBruteForce. On the IVF layout the identical predicate rides the
    * cell-partitioned scan unchanged (partition pruning composes with it).
    */
  def annFiltered(spark: SparkSession, sfDir: String, k: Int = 10,
      acceptLabel: Int = 1): DataFrame = {
    val e = emb(spark, sfDir)
    val queries = e.where(col("vec_id").isin(QueryVecIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("vec_id"))
    e.where(col("label") === acceptLabel)
      .crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineExpr("embedding", "qvec"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(asc("query_id"), asc("rank"))
  }

  /** Deterministic random-hyperplane matrix for the cosine LSH sketch
    * (Charikar 2002, "Similarity estimation techniques from rounding
    * algorithms"): component (i, j) = ((LCG(i*dim+j) mod 2001) - 1000)
    * / 1000.0 — plain integer arithmetic so the DuckDB oracle regenerates
    * the exact same doubles from the same formula.
    */
  def lshPlanes(nbits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nbits, dim) { (i, j) =>
      val k = i.toLong * dim + j
      val h = (1103515245L * k + 12345L) % 2147483648L
      ((h % 2001L) - 1000L) / 1000.0
    }

  /** LSH-bucketed ANN — the second scale path beside IVF: 16 sign-of-dot
    * sketch bits per vector, banded 4 x 4 (same banding idea as MinHash
    * LSH) with MULTIPROBE on the query side (Lv et al. 2007, "Multi-probe
    * LSH"): the query additionally probes every band bucket within Hamming
    * distance `probes` of its own, so candidates = vectors whose band code
    * differs by <= probes bits in at least one band; exact cosine then
    * ranks candidates only. The corpus is touched twice map-side (sketch
    * pass + candidate rank) and emits exactly `bands` rows per vector —
    * probe expansion multiplies only the tiny query side, and the bucket
    * join is a broadcast (a handful of query probe rows). Sketch dots are
    * summed left-to-right so the DuckDB oracle's left-associative sum
    * reproduces every sign bit-for-bit. Production sizing note: recall
    * and selectivity trade off via (nbits, bands, probes) — wider bands
    * (more bits each) keep bucket occupancy, and thus the candidate
    * fraction, small as the corpus grows.
    */
  def annLsh(spark: SparkSession, sfDir: String, k: Int = 10,
      nbits: Int = 16, bands: Int = 4, probes: Int = 1): DataFrame = {
    import spark.implicits._
    require(nbits % bands == 0)
    val e = emb(spark, sfDir)
    val perBand = nbits / bands
    val pB = spark.sparkContext.broadcast(lshPlanes(nbits, 64))
    def sketch(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
        .flatMap { case (id, v) =>
          val ps = pB.value
          val bits = new Array[Int](ps.length)
          var i = 0
          while (i < ps.length) {
            val h = ps(i)
            var s = 0.0
            var d = 0
            while (d < h.length && d < v.length) { s += v(d).toDouble * h(d); d += 1 }
            bits(i) = if (s >= 0) 1 else 0
            i += 1
          }
          (0 until bands).iterator.map { b =>
            var code = 0
            var j = 0
            while (j < perBand) { code = (code << 1) | bits(b * perBand + j); j += 1 }
            (id, b, code)
          }
        }.toDF("vec_id", "band", "bucket")
    val sigs = sketch(e)
    // query-side probe expansion: every bucket within Hamming <= probes.
    // Sketched from the 3 query rows directly — a vec_id filter cannot push
    // through the corpus sketch's flatMap, so deriving it from `sigs` ran
    // the WHOLE corpus sketch twice (measured: half the entry's job time).
    val probesLocal = probes
    val perBandLocal = perBand
    val qsigs = sketch(e.where(col("vec_id").isin(QueryVecIds: _*)))
      .as[(Long, Int, Int)]
      .flatMap { case (qid, band, code) =>
        def expand(c: Int, fromBit: Int, left: Int): Iterator[Int] =
          Iterator.single(c) ++ (if (left == 0) Iterator.empty
          else (fromBit until perBandLocal).iterator.flatMap(bit =>
            expand(c ^ (1 << bit), bit + 1, left - 1)))
        expand(code, 0, probesLocal).map(pc => (qid, band, pc))
      }.toDF("query_id", "band", "bucket")
    val cands = sigs.join(broadcast(qsigs), Seq("band", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val queries = e.where(col("vec_id").isin(QueryVecIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("vec_id"))
    cands.join(e, "vec_id").join(broadcast(queries), "query_id")
      .withColumn("cos", cosineExpr("embedding", "qvec"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(asc("query_id"), asc("rank"))
  }

  /** Assign every vector to its nearest centroid by cosine: the centroid
    * matrix is tiny (nlist x dim), so it rides a broadcast into a NARROW
    * typed map — no crossJoin, no shuffle of the embedding column (the
    * windowed-crossJoin formulation moved gigabytes per Lloyd iteration).
    * Ties break toward the lowest cent_id, scanning in cent_id order.
    */
  private def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cArr: Array[(Int, Array[Double])] = cents
      .select(col("cent_id"), col("cvec")).as[(Int, Seq[Double])]
      .collect().map { case (i, v) => (i, v.toArray) }.sortBy(_._1)
    val cNorm = cArr.map { case (_, v) =>
      math.sqrt(v.map(x => x * x).sum)
    }
    val cB = spark.sparkContext.broadcast((cArr, cNorm))
    e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .map { case (id, emb) =>
        val (cs, norms) = cB.value
        val v = new Array[Double](emb.length)
        var i = 0
        var vn = 0.0
        while (i < v.length) {
          v(i) = emb(i).toDouble; vn += v(i) * v(i); i += 1
        }
        vn = math.sqrt(vn)
        var best = -1
        var bestCos = Double.NegativeInfinity
        var c = 0
        while (c < cs.length) {
          val cv = cs(c)._2
          var dot = 0.0
          var j = 0
          while (j < cv.length && j < v.length) { dot += v(j) * cv(j); j += 1 }
          val denom = vn * norms(c)
          val cos = if (denom == 0) 0.0 else dot / denom
          if (cos > bestCos) { bestCos = cos; best = cs(c)._1 }
          c += 1
        }
        (id, emb, best)
      }
      .toDF("vec_id", "embedding", "cent_id")
  }

  /** Deterministic seeded k-means (Lloyd): init = the first `nlist`
    * vectors, `iters` assign/average rounds, empty cells keep their
    * previous centroid. Each round is one broadcast-assign pass plus a
    * (cell, dim)-keyed average — the standard Spark k-means shape that
    * scales to 10^12 vectors (no driver-side math beyond the nlist x dim
    * centroid table itself).
    */
  def kmeansCentroids(e: DataFrame, nlist: Int, iters: Int = 3): DataFrame = {
    var cents = e.where(col("vec_id") < nlist)
      .select(col("vec_id").cast("int").as("cent_id"),
        expr("transform(embedding, x -> cast(x as double))").as("cvec"))
    for (_ <- 1 to iters) {
      val updated = assign(e, cents)
        .select(col("cent_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cent_id"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cent_id"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
          .as("cvec"))
      cents = cents.select(col("cent_id"), col("cvec").as("old"))
        .join(updated, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("cvec"), col("old")).as("cvec"))
    }
    cents
  }

  private val IvfVersion = "v2" // v2: scalar-map assignment (no crossJoin)
  private val ivfCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once, cached on disk) the IVF layout for (sfDir, nlist):
    * k-means centroids + the corpus written PARTITIONED BY cell — the
    * materialized analogue of the postings skip list for vectors. Queries
    * then touch only their probed cells' files (Spark's dynamic partition
    * pruning on the broadcast probe join).
    */
  def ivfDir(spark: SparkSession, sfDir: String, nlist: Int): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val key = s"${sys.props("java.io.tmpdir")}/graft_ivf_${IvfVersion}_${safe}_$nlist"
    ivfCache.computeIfAbsent(key, dir => {
      if (!new java.io.File(s"$dir/_DONE").exists()) {
        val e = emb(spark, sfDir)
        val cents = kmeansCentroids(e, nlist)
        cents.write.mode("overwrite").parquet(s"$dir/centroids")
        assign(e, spark.read.parquet(s"$dir/centroids"))
          .write.mode("overwrite").partitionBy("cent_id")
          .parquet(s"$dir/vectors")
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_DONE"),
          Array.emptyByteArray)
      }
      dir
    })
  }

  /** Embedding-cosine near-duplicate pairs (the vector-space member of the
    * dedup family): vectors 0..4 are planted as exact copies at
    * vec_id+1,000,000 (the corpus has no natural embedding dupes), and the
    * op returns pairs with cosine >= `threshold`.
    *
    * Size switch, like Lucene's MultiTermQuery rewrite methods: up to
    * `exactPairLimit` vectors the pair scan is EXHAUSTIVE (exactly what the
    * DuckDB oracle computes); above it, candidates are blocked by shared
    * k-means cell before the exact cosine verify — same-cell blocking finds
    * every exact-copy pair by construction (identical vectors assign
    * identically) and trades bounded recall for never running an all-pairs
    * join at 10^12-vector scale.
    */
  def dedupEmbedding(spark: SparkSession, sfDir: String,
      threshold: Double = 0.99, exactPairLimit: Long = 10000L): DataFrame = {
    val e0 = emb(spark, sfDir).select(col("vec_id"), col("embedding"))
    val planted = e0.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val e = e0.unionByName(planted)

    import spark.implicits._
    val n = e.count()
    // blocking key: one global cell in exact mode (exhaustive pair scan ==
    // the DuckDB oracle); k-means cells above the limit. Either way the
    // pair scan runs as tight primitive loops inside mapPartitions — a
    // Catalyst zip_with/aggregate cosine costs ~25us and an array alloc
    // PER PAIR, which made even a 2M-pair exact scan take ~50 s.
    val (blocked, cellCap) =
      if (n <= exactPairLimit) {
        (e.select(lit(0).as("cent_id"), col("vec_id"), col("embedding")),
          Int.MaxValue)
      } else {
        // Heavily clustered corpora concentrate members into few effective
        // cells (k-means cannot split a tight natural cluster), so the hard
        // per-cell cap is what bounds the quadratic work: cap^2/2 pairs per
        // cell, trading recall on members beyond the cap — the standard
        // LSH/blocking compromise.
        val nlist = math.max(8L, n / 1000L).toInt
        val cents = spark.read
          .parquet(s"${ivfDir(spark, sfDir, nlist)}/centroids")
        (assign(e.select(col("vec_id"), col("embedding")), cents)
          .select(col("cent_id"), col("vec_id"), col("embedding")), 1500)
      }
    val thr = threshold
    // No-silent-caps: count members dropped past cellCap (the recall the
    // blocking compromise trades away) into an accumulator, mirroring
    // DedupOps.lastBucketCapDrops — 0 after the action witnesses that the
    // cap never bit and the result is exhaustive within cells.
    val dropAcc = spark.sparkContext.longAccumulator("embdedup-cell-cap-drops")
    lastCellCapDrops = Some(dropAcc)
    // quadratic in the cell size, which AQE's size-based coalescing cannot
    // see (groupByKey alone got coalesced to 2 tasks). The within-partition
    // sort makes each cell a contiguous run, so the task streams ONE cell's
    // first `cellCap` members at a time (excess run rows are drained, not
    // buffered) instead of buffering its whole input (round-2 `it.toArray`).
    val parts = e.sparkSession.sessionState.conf.numShufflePartitions
    blocked
      .repartition(parts, col("cent_id"))
      .sortWithinPartitions(col("cent_id"), col("vec_id"))
      .as[(Int, Long, Seq[Float])]
      .mapPartitions { it =>
        val rows = it.buffered
        val cellRuns = new Iterator[Array[(Int, Long, Seq[Float])]] {
          def hasNext: Boolean = rows.hasNext
          def next(): Array[(Int, Long, Seq[Float])] = {
            val cell = rows.head._1
            val buf = mutable.ArrayBuffer.empty[(Int, Long, Seq[Float])]
            while (rows.hasNext && rows.head._1 == cell) {
              val r = rows.next()
              if (buf.length < cellCap) buf += r
              else dropAcc.add(1L)
            }
            buf.toArray
          }
        }
        cellRuns.flatMap { rows =>
          val members = rows.map { case (_, id, emb) =>
            val v = emb.toArray.map(_.toDouble)
            var s = 0.0
            var i = 0
            while (i < v.length) { s += v(i) * v(i); i += 1 }
            (id, v, math.sqrt(s))
          }
          for {
            i <- members.indices.iterator
            j <- (i + 1) until members.length
            (ia, va, na) = members(i)
            (ib, vb, nb) = members(j)
            cos = {
              var dot = 0.0
              var k = 0
              while (k < va.length && k < vb.length) { dot += va(k) * vb(k); k += 1 }
              if (na * nb == 0) 0.0 else dot / (na * nb)
            }
            if cos >= thr
            // HALF_UP at 4 decimals, like Spark round()/the DuckDB oracle
          } yield (ia, ib, math.floor(cos * 10000 + 0.5) / 10000)
        }
      }
      .toDF("vec_a", "vec_b", "cos")
      .orderBy(asc("vec_a"), asc("vec_b"))
  }

  /** IVF ANN over the k-means cell layout: queries rank the centroids,
    * probe only the `nprobe` nearest cells (partition-pruned scan of the
    * cell-partitioned table), brute-force within. nprobe == nlist is exact
    * (oracle-shared with brute force); recall at nprobe < nlist is asserted
    * in OpsSpec.
    */
  def annIvf(spark: SparkSession, sfDir: String, k: Int = 10,
      nlist: Int = 8, nprobe: Int = 8): DataFrame = {
    val dir = ivfDir(spark, sfDir, nlist)
    val cents = spark.read.parquet(s"$dir/centroids")
    val e = emb(spark, sfDir)

    val queries = e.where(col("vec_id").isin(QueryVecIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(desc("qcos"), asc("cent_id"))
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("qcos", cosineExpr("qvec", "cvec"))
      .withColumn("prank", row_number().over(wProbe))
      .where(col("prank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cent_id"))

    val vectors = spark.read.parquet(s"$dir/vectors")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("vec_id"))
    vectors.join(broadcast(probed), Seq("cent_id"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineExpr("embedding", "qvec"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(asc("query_id"), asc("rank"))
  }
}
