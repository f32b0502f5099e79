package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** PorterStemmer pinned against the worked examples published in the paper
  * itself (Porter 1980, Program 14(3) — the step-rule example columns),
  * plus the corpus vocabulary mapping the DuckDB oracle inlines.
  */
class PorterStemmerSpec extends AnyFunSuite {

  private val paperPairs = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b (+cleanup; the paper's column shows step output "agree" —
    // step 5a then drops the e: m("agre")=1 and not *o)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
    "digitizer" -> "digit", "conformabli" -> "conform",
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt", "homologou" -> "homolog",
    "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("published example pairs stem exactly") {
    val bad = paperPairs.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in -> ${PorterStemmer.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("chained steps: inflected forms conflate with their bases") {
    assert(PorterStemmer.stem("merged") == PorterStemmer.stem("merge"))
    assert(PorterStemmer.stem("merging") == PorterStemmer.stem("merges"))
    assert(PorterStemmer.stem("queries") == PorterStemmer.stem("query"))
    assert(PorterStemmer.stem("tables") == PorterStemmer.stem("table"))
    assert(PorterStemmer.stem("generalizations") ==
      PorterStemmer.stem("generalization"))
  }

  test("short words and identity cases pass through") {
    for (w <- Seq("a", "is", "io", "agg", "big", "part", "scan", "hash"))
      assert(PorterStemmer.stem(w) == w)
  }

  /** The full documents-table vocabulary mapping that the DuckDB oracle for
    * search_porter_bm25 inlines as a CASE expression — if this test moves,
    * the oracle SQL in SparkEntry must move in lockstep.
    */
  test("corpus vocabulary mapping matches the oracle CASE") {
    val expected = Map(
      "customer" -> "custom", "merge" -> "merg", "query" -> "queri",
      "table" -> "tabl", "value" -> "valu", "key" -> "kei")
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line",
      "merge", "order", "part", "query", "row", "scan", "slow", "small",
      "sort", "spark", "stream", "table", "the", "value", "vector", "window")
    val actual = vocab.map(w => w -> PorterStemmer.stem(w))
      .filter { case (w, s) => s != w }.toMap
    assert(actual == expected, s"vocab mapping drifted: $actual")
  }
}
