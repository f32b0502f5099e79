package graft.search

/** Solr's dismax/edismax `mm` specification grammar
  * [B solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java
  * #calculateMinShouldMatch]:
  *
  *   - positive integer "3": that many optional clauses must match
  *   - negative integer "-2": all but that many
  *   - percentage "75%": that percentage (of the optional clause count)
  *     rounded DOWN
  *   - negative percentage "-25%": all but that percentage (rounded down)
  *   - conditionals "n<spec", whitespace-separated and evaluated in order:
  *     if the optional clause count is <= n the PREVIOUS result stands
  *     (initially "all required"); otherwise the result becomes this
  *     spec's value and evaluation continues — so "2<-25% 9<-3" means
  *     "<=2: all; 3..9: 75%; >9: all but 3"
  *
  * The final value clamps into [0, optionalClauseCount] exactly as the
  * reference does, then feeds BooleanQuery.setMinimumNumberShouldMatch.
  */
object MinShouldMatch {

  def calculate(optionalClauseCount: Int, spec0: String): Int = {
    var result = optionalClauseCount
    val spec = spec0.trim
    if (spec.contains("<")) {
      for (s <- spec.split("\\s+")) {
        val parts = s.split("<", 2)
        require(parts.length == 2 && parts(0).nonEmpty,
          s"Invalid 'mm' conditional clause: '$s'")
        val upperBound = parts(0).toInt
        if (optionalClauseCount <= upperBound) return clamp(optionalClauseCount, result)
        result = calculate(optionalClauseCount, parts(1))
      }
      return clamp(optionalClauseCount, result)
    }
    if (spec.contains("%")) {
      val percent = spec.substring(0, spec.length - 1).toInt
      // the reference computes in FLOAT ((result * percent) * (1/100f))
      // and casts; mirror that exactly (float32's half-ulp margin keeps it
      // equal to integer truncation at any realistic clause count, but the
      // formula is the contract)
      val calc = (result * percent) * (1 / 100f)
      result = if (calc < 0) result + calc.toInt else calc.toInt
    } else {
      val calc = spec.toInt
      result = if (calc < 0) result + calc else calc
    }
    clamp(optionalClauseCount, result)
  }

  private def clamp(optionalClauseCount: Int, result: Int): Int =
    if (optionalClauseCount < result) optionalClauseCount
    else if (result < 0) 0
    else result
}
