package graft.apps

import graft.core.{Analyzer, SmallFloatUtil, TermsHash}
import graft.corpus.CorpusGen

/** No-Spark microbenchmark of the flush hot path (tokenize + terms-hash +
  * sha256 + norm) — separates raw pipeline thread-scaling from Spark
  * machinery when diagnosing build scaling. args: [numDocs]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val numDocs = if (args.nonEmpty) args(0).toInt else 60000
    val docs = (0 until numDocs).map(i => CorpusGen.content(i.toLong)).toArray
    for (round <- 1 to 2; n <- Seq(1, 8, 32)) {
      val slice = (numDocs + n - 1) / n
      val counts = new Array[Long](n)
      val t0 = System.nanoTime()
      val threads = (0 until n).map { t =>
        val th = new Thread(() => {
          val hash = new TermsHash(Analyzer.EnglishStopWords)
          var i = t * slice
          val end = math.min(numDocs, i + slice)
          var c = 0L
          while (i < end) {
            val total = hash.addDoc(docs(i))
            hash.finishDoc(i.toLong, SmallFloatUtil.intToByte4(total))
            c += CorpusGen.sha256Hex(docs(i)).length
            i += 1
          }
          counts(t) = c
        })
        th.start()
        th
      }
      threads.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      if (round == 2)
        println(f"threads=$n%2d  ${numDocs / secs}%8.0f docs/s  (${secs}%.2f s)")
    }
  }
}
