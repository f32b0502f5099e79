package graft.apps

/** One-off divergence probe for dedup_simhash at scale (r5): print the
  * engine simhash of two docs and whether the pair survives the banded
  * path. args: <sfDir> <docA> <docB>
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.session("graft-simhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val (a, b) = (args(1).toLong, args(2).toLong)
    val t = spark.read.parquet(s"${args(0)}/documents.parquet")
      .where(col("doc_id").isin(a, b))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (ha, hb) = (graft.ops.DedupOps.simhash64(t(a)), graft.ops.DedupOps.simhash64(t(b)))
    println(f"[probe] a=$ha%016x b=$hb%016x ham=${java.lang.Long.bitCount(ha ^ hb)}")
    val pairs = graft.ops.DedupOps.dedupSimhash(spark, args(0))
      .where(col("doc_a") === a && col("doc_b") === b).count()
    println(s"[probe] pair emitted by dedupSimhash: $pairs")
    spark.stop()
  }
}
