package graft.apps

/** One-off cap observability probe: run a dedup entry at a given sfDir and
  * print the bucket-cap drop accumulator — evidence for whether a scale
  * divergence is the documented cap biting (no-silent-caps audit trail).
  * args: <sfDir> <entry>
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.session("graft-capprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.queries(args(1))(spark, args(0)).count()
    val drops = graft.ops.DedupOps.lastBucketCapDrops.map(_.value).getOrElse(-1L)
    println(s"[graft-capprobe] entry=${args(1)} rows=$n bucket_cap_drops=$drops")
    spark.stop()
  }
}
