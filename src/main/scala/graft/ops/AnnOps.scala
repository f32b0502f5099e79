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

  /** IVF-style ANN: deterministic centroids = first `nlist` vectors (a
    * stand-in for a k-means fit, which would just refine the same layout);
    * every vector is assigned to its nearest centroid (one broadcast pass),
    * queries search the `nprobe` nearest cells only. At 10^12 vectors the
    * corpus is hash-partitioned by cell, so a query touches nprobe/nlist of
    * the data — the same pruning idea as the postings skip list, applied to
    * vectors. nprobe == nlist => exact (oracle-shared with brute force).
    */
  def annIvf(spark: SparkSession, sfDir: String, k: Int = 10,
      nlist: Int = 8, nprobe: Int = 8): DataFrame = {
    val e = emb(spark, sfDir)
    val cents = e.where(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))

    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(desc("ccos"), asc("cent_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("ccos", cosineExpr("embedding", "cvec"))
      .withColumn("crank", row_number().over(wAssign))
      .where(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))

    val queries = e.where(col("vec_id").isin(QueryVecIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(desc("qcos"), asc("cent_id"))
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("qcos", cosineExpr("qvec", "cvec"))
      .withColumn("prank", row_number().over(wProbe))
      .where(col("prank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cent_id"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("vec_id"))
    assigned.join(broadcast(probed), Seq("cent_id"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineExpr("embedding", "qvec"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(asc("query_id"), asc("rank"))
  }
}
