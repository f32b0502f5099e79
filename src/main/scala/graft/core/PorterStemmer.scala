package graft.core

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980), implemented from the published paper —
  * the same algorithm Lucene's PorterStemFilter applies
  * [B lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemFilter.java].
  *
  * Definitions (paper §2): with the word written as [C](VC){m}[V],
  *   m    = the measure (number of VC sequences)
  *   *v*  = the stem contains a vowel
  *   *d   = the stem ends with a double consonant
  *   *o   = the stem ends cvc where the final c is not w, x or y
  * a, e, i, o, u are vowels; y is a vowel iff preceded by a consonant.
  *
  * Within a step, the rule with the LONGEST matching suffix is selected;
  * if its condition fails, no other rule of that step fires (paper §2).
  * This follows the paper as published (step 2 keeps ABLI -> ABLE and has
  * no LOGI -> LOG — two later Snowball-era departures deliberately not
  * taken, because the reference filter documents the original algorithm).
  */
object PorterStemmer {

  @inline private def isVowel(s: CharSequence, i: Int): Boolean =
    s.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => true
      case 'y' => i > 0 && !isVowel(s, i - 1)
      case _ => false
    }

  /** m of s[0, len) */
  private def measure(s: CharSequence, len: Int): Int = {
    var m = 0
    var i = 0
    while (i < len && !isVowel(s, i)) i += 1
    while (i < len) {
      while (i < len && isVowel(s, i)) i += 1
      if (i < len) {
        m += 1
        while (i < len && !isVowel(s, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(s: CharSequence, len: Int): Boolean = {
    var i = 0
    while (i < len) {
      if (isVowel(s, i)) return true
      i += 1
    }
    false
  }

  /** *d of s[0, len) */
  private def doubleConsonant(s: CharSequence, len: Int): Boolean =
    len >= 2 && s.charAt(len - 1) == s.charAt(len - 2) && !isVowel(s, len - 1)

  /** *o of s[0, len) */
  private def cvc(s: CharSequence, len: Int): Boolean =
    len >= 3 && !isVowel(s, len - 3) && isVowel(s, len - 2) &&
      !isVowel(s, len - 1) && {
        val c = s.charAt(len - 1)
        c != 'w' && c != 'x' && c != 'y'
      }

  private def endsWith(s: StringBuilder, suf: String): Boolean = {
    val n = s.length - suf.length
    if (n < 0) return false
    var i = 0
    while (i < suf.length) {
      if (s.charAt(n + i) != suf.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Longest-match rule application for steps 2-4: find the longest
    * matching suffix among `rules`; if found AND the stem passes `cond`,
    * replace. Returns true if a suffix MATCHED (whether or not replaced) —
    * per the paper, a failed condition on the longest match ends the step.
    */
  private def applyRules(w: StringBuilder, rules: Seq[(String, String)],
      cond: Int => Boolean): Unit = {
    var best: (String, String) = null
    rules.foreach { r =>
      if ((best == null || r._1.length > best._1.length) && endsWith(w, r._1))
        best = r
    }
    if (best != null) {
      val stemLen = w.length - best._1.length
      if (cond(stemLen)) {
        w.setLength(stemLen)
        w.append(best._2)
      }
    }
  }

  def stem(word: String): String = {
    if (word.length <= 2) return word // paper §2: 1- and 2-letter words pass
    val w = new StringBuilder(word)

    // Step 1a: SSES->SS, IES->I, SS->SS, S->
    if (endsWith(w, "sses")) w.setLength(w.length - 2)
    else if (endsWith(w, "ies")) w.setLength(w.length - 2)
    else if (endsWith(w, "ss")) ()
    else if (endsWith(w, "s")) w.setLength(w.length - 1)

    // Step 1b: (m>0) EED->EE | (*v*) ED-> | (*v*) ING->  [+ cleanup]
    var edOrIng = false
    if (endsWith(w, "eed")) {
      if (measure(w, w.length - 3) > 0) w.setLength(w.length - 1)
    } else if (endsWith(w, "ed") && containsVowel(w, w.length - 2)) {
      w.setLength(w.length - 2)
      edOrIng = true
    } else if (endsWith(w, "ing") && containsVowel(w, w.length - 3)) {
      w.setLength(w.length - 3)
      edOrIng = true
    }
    if (edOrIng) {
      // AT->ATE, BL->BLE, IZ->IZE | (*d and not(*L or *S or *Z)) -> single
      // letter | (m=1 and *o) -> E
      if (endsWith(w, "at") || endsWith(w, "bl") || endsWith(w, "iz"))
        w.append('e')
      else if (doubleConsonant(w, w.length) && {
        val c = w.charAt(w.length - 1)
        c != 'l' && c != 's' && c != 'z'
      }) w.setLength(w.length - 1)
      else if (measure(w, w.length) == 1 && cvc(w, w.length)) w.append('e')
    }

    // Step 1c: (*v*) Y->I
    if (endsWith(w, "y") && containsVowel(w, w.length - 1))
      w.setCharAt(w.length - 1, 'i')

    // Step 2 (m>0)
    applyRules(w, Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
      "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
      "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"),
      stemLen => measure(w, stemLen) > 0)

    // Step 3 (m>0)
    applyRules(w, Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""),
      stemLen => measure(w, stemLen) > 0)

    // Step 4 (m>1); ION additionally requires the stem to end in s or t
    applyRules(w, Seq(
      "al" -> "", "ance" -> "", "ence" -> "", "er" -> "", "ic" -> "",
      "able" -> "", "ible" -> "", "ant" -> "", "ement" -> "", "ment" -> "",
      "ent" -> "", "ion" -> "", "ou" -> "", "ism" -> "", "ate" -> "",
      "iti" -> "", "ous" -> "", "ive" -> "", "ize" -> ""),
      stemLen => measure(w, stemLen) > 1 &&
        (!endsWith(w, "ion") || stemLen != w.length - 3 || {
          val c = w.charAt(stemLen - 1); c == 's' || c == 't'
        }))

    // Step 5a: (m>1) E-> | (m=1 and not *o) E->
    if (endsWith(w, "e")) {
      val m = measure(w, w.length - 1)
      if (m > 1 || (m == 1 && !cvc(w, w.length - 1)))
        w.setLength(w.length - 1)
    }

    // Step 5b: (m>1 and *d and *L) -> single letter
    if (measure(w, w.length) > 1 && doubleConsonant(w, w.length) &&
      w.charAt(w.length - 1) == 'l')
      w.setLength(w.length - 1)

    w.toString
  }
}
