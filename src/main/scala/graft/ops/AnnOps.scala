package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label). Brute-force cosine top-k as the exactness baseline;
  * an IVF (inverted-file) variant as the scale path — cluster the vectors,
  * search only the closest `nprobe` clusters. With nprobe == nlist the IVF
  * path degenerates to exact brute force (used to share the SQL oracle);
  * recall@k for nprobe < nlist is asserted in tests.
  */
object AnnOps {

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

  /** Assign every vector to its nearest centroid by cosine (centroids
    * broadcast; one narrow pass over the corpus).
    */
  private def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(desc("ccos"), asc("cent_id"))
    e.crossJoin(broadcast(cents))
      .withColumn("ccos", cosineExpr("embedding", "cvec"))
      .withColumn("crank", row_number().over(wAssign))
      .where(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
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

  private val IvfVersion = "v1"
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

    val n = e.count()
    val pairs =
      if (n <= exactPairLimit) {
        e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      } else {
        // cell-blocked: join within k-means cells only, cell granularity
        // scaled so a cell holds ~1k vectors (quadratic-per-cell stays
        // ~500k pairs), plus a hard per-cell cap for skewed clusterings
        val nlist = math.max(8L, n / 1000L).toInt
        val cellCap = 10000
        val cents = spark.read
          .parquet(s"${ivfDir(spark, sfDir, nlist)}/centroids")
        val assigned = assign(e.select(col("vec_id"), col("embedding")), cents)
          .withColumn("rn", row_number().over(Window
            .partitionBy(col("cent_id")).orderBy(col("vec_id"))))
          .where(col("rn") <= cellCap)
          .drop("rn")
        assigned.as("a").join(assigned.as("b"),
          col("a.cent_id") === col("b.cent_id") &&
            col("a.vec_id") < col("b.vec_id"))
      }
    pairs
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineExpr("a.embedding", "b.embedding").as("cos"))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
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
