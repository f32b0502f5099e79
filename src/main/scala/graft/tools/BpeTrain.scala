package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** One-time BPE merge-table trainer (VERDICT r3 next-10).
  *
  * Classic byte-pair-encoding training [Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"] over the analyzer
  * token vocabulary of the sf0.01 `documents` table: start from characters,
  * repeatedly merge the most frequent adjacent symbol pair (frequency
  * weighted by word count, ties broken lexicographically so the table is
  * DETERMINISTIC), for `nMerges` rounds. The result is committed at
  * src/main/resources/graft/bpe_merges.txt and never retrained at runtime —
  * a fixed model vocabulary, exactly like a production pipeline pins its
  * tokenizer.
  *
  * usage: runMain graft.tools.BpeTrain <sfDir> <outFile> [nMerges]
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BpeTrain <sfDir> <outFile> [nMerges]")
    val sfDir = args(0)
    val outFile = args(1)
    val nMerges = if (args.length > 2) args(2).toInt else 128

    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-bpe-train")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // analyzer-domain word frequencies (same tokenization as tokensCol)
    val vocab: Array[(String, Long)] = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.ops.TextOps.tokensCol(col("text"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    spark.stop()

    // each word as a mutable symbol sequence, starting at characters
    val words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.toCharArray.map(_.toString), c) }

    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max frequency, lexicographic tie-break -> deterministic table
        val ((a, b), _) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        merges += ((a, b))
        var wi = 0
        while (wi < words.length) {
          val (syms, c) = words(wi)
          // left-to-right non-overlapping merge — identical semantics to the
          // replace-chain application in TextOps.bpeMergedCol / the oracle SQL
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          words(wi) = (out.result(), c)
          wi += 1
        }
        round += 1
      }
    }

    val lines = merges.result().map { case (a, b) => s"$a $b" }
    val p = Paths.get(outFile)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, lines.mkString("", "\n", "\n"))
    println(s"[bpe-train] wrote ${lines.size} merges to $outFile " +
      s"(vocab ${vocab.length} words)")
  }
}
