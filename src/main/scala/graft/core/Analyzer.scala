package graft.core

import scala.collection.mutable

/** Lucene-StandardAnalyzer-equivalent analysis chain for the ASCII
  * identifier domain: tokenize -> lowercase -> (optional) stop filter
  * [B lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java].
  *
  * Tokens are maximal runs of [A-Za-z0-9_]. Within that domain this matches
  * StandardTokenizer's UAX#29 segmentation (letters/digits form words,
  * underscore is WordBreak=ExtendNumLet and joins), which is the documented
  * fidelity boundary for the source-code corpus (SURVEY.md §7.4-4).
  * maxTokenLength=255 mirrors StandardTokenizer's default: longer runs are
  * split at 255 chars, exactly like the JFlex scanner's buffer cap.
  *
  * Implemented as one fused pure function applied via typed flatMap /
  * mapPartitions — "Lucene-style analysis as a Catalyst-friendly flatMap"
  * (BASELINE.json north_star). No UDF-registry indirection in the hot path.
  */
object Analyzer {

  val MaxTokenLength = 255

  /** Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (33 words)
    * [B lucene/analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java].
    */
  val EnglishStopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with")

  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Tokenize + lowercase (no stop filtering). */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && !isTokenChar(text.charAt(i))) i += 1
      val start = i
      while (i < n && isTokenChar(text.charAt(i)) && i - start < MaxTokenLength) i += 1
      if (i > start) out += text.substring(start, i).toLowerCase(java.util.Locale.ROOT)
    }
    out.toArray
  }

  /** Full chain: tokenize -> lowercase -> stop filter. */
  def analyze(text: String, stopWords: Set[String] = EnglishStopWords): Array[String] =
    tokenize(text).filterNot(stopWords.contains)

  /** Lucene's EnglishMinimalStemFilter rule (S-stemmer: plural stripping)
    * [B lucene/analysis/common/src/java/org/apache/lucene/analysis/en/EnglishMinimalStemmer.java],
    * reimplemented from the published algorithm: words shorter than 3 or
    * not ending in 's' pass through; '-us'/'-ss' endings are kept;
    * '-ies' becomes '-y' (when preceded by a non-a/e letter and long
    * enough); vowel+'es' endings are kept; anything else drops the 's'.
    * Chosen over Porter for the stemming slot because it is exactly
    * reproducible in the DuckDB oracle SQL (pure suffix CASE logic).
    */
  def minimalStem(t: String): String = {
    val len = t.length
    if (len < 3 || t.charAt(len - 1) != 's') return t
    t.charAt(len - 2) match {
      case 'u' | 's' => t
      case 'e' =>
        if (len > 3 && t.charAt(len - 3) == 'i' &&
          t.charAt(len - 4) != 'a' && t.charAt(len - 4) != 'e')
          t.substring(0, len - 3) + "y"
        else if (t.charAt(len - 3) == 'i' || t.charAt(len - 3) == 'a' ||
          t.charAt(len - 3) == 'o' || t.charAt(len - 3) == 'e') t
        else t.substring(0, len - 1)
      case _ => t.substring(0, len - 1)
    }
  }

  /** analyze + minimal stemming (the EnglishAnalyzer-with-stemmer shape). */
  def analyzeStemmed(text: String,
      stopWords: Set[String] = EnglishStopWords): Array[String] =
    analyze(text, stopWords).map(minimalStem)

  /** analyze + full Porter stemming (the PorterStemFilter chain
    * [B lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemFilter.java]):
    * tokenize -> lowercase -> stop -> Porter.
    */
  def analyzePorter(text: String,
      stopWords: Set[String] = EnglishStopWords): Array[String] =
    analyze(text, stopWords).map(PorterStemmer.stem)

  /** French minimal stemmer (plural/gender stripping)
    * [B lucene/analysis/common/src/java/org/apache/lucene/analysis/fr/FrenchMinimalStemFilter.java],
    * reimplemented from the published rule family (Savoy, "Light Stemming
    * Approaches for the French, Portuguese, German and Hungarian
    * Languages", SAC 2006). Words shorter than 6 pass through; a final
    * 'x' is handled first ('-aux' becomes '-al' unless preceded by 'e',
    * otherwise the 'x' drops) and ends the chain; otherwise final 's',
    * then 'r', then 'e', then 'é' strip in sequence, and a resulting
    * doubled final letter collapses. Pure suffix logic — exactly
    * reproducible in the DuckDB oracle SQL (like [[minimalStem]]).
    */
  def frenchMinimalStem(t: String): String = {
    if (t.length < 6) return t
    var len = t.length
    if (t.charAt(len - 1) == 'x') {
      if (t.charAt(len - 3) == 'a' && t.charAt(len - 2) == 'u' &&
        t.charAt(len - 4) != 'e')
        return t.substring(0, len - 2) + "l" // chevaux -> cheval
      return t.substring(0, len - 1) // châteaux -> château
    }
    if (t.charAt(len - 1) == 's') len -= 1
    if (t.charAt(len - 1) == 'r') len -= 1
    if (t.charAt(len - 1) == 'e') len -= 1
    if (t.charAt(len - 1) == 'é') len -= 1
    if (len > 1 && t.charAt(len - 1) == t.charAt(len - 2)) len -= 1
    t.substring(0, len)
  }

  /** German minimal stemmer (plural endings, umlaut fold)
    * [B lucene/analysis/common/src/java/org/apache/lucene/analysis/de/GermanMinimalStemFilter.java],
    * same Savoy minimal-stemmer family: words shorter than 5 pass
    * through; ä/ö/ü fold to a/o/u; then the longest matching plural
    * ending strips — '-nen' (length > 6), '-en' (length > 5), or a final
    * 'e'/'s'/'n'. Suffix-only, oracle-reproducible.
    */
  def germanMinimalStem(t0: String): String = {
    if (t0.length < 5) return t0
    val t = t0.map {
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'; case c => c
    }
    val len = t.length
    if (len > 6 && t.endsWith("nen")) t.substring(0, len - 3) // Läuferinnen-style
    else if (len > 5 && t.endsWith("en")) t.substring(0, len - 2) // häusen/tagen
    else t.charAt(len - 1) match {
      case 'e' | 's' | 'n' => t.substring(0, len - 1)
      case _ => t
    }
  }

  /** Spanish plural stemmer (plural -> singular only)
    * [B lucene/analysis/common/src/java/org/apache/lucene/analysis/es/SpanishPluralStemFilter.java]
    * semantics: words shorter than 4 pass through; '-ces' becomes '-z'
    * (luces -> luz); '-es' after one of r/l/n/d/j/s/x strips (colores ->
    * color); a final 's' after a vowel strips (casas -> casa). Gender and
    * derivational suffixes are intentionally untouched (the plural-only
    * contract of the published filter). Suffix-only, oracle-reproducible.
    */
  def spanishPluralStem(t: String): String = {
    val len = t.length
    if (len < 4 || t.charAt(len - 1) != 's') return t
    if (len >= 5 && t.endsWith("ces")) return t.substring(0, len - 3) + "z"
    if (t.charAt(len - 2) == 'e') {
      val p = t.charAt(len - 3)
      if (p == 'r' || p == 'l' || p == 'n' || p == 'd' || p == 'j' ||
        p == 's' || p == 'x') return t.substring(0, len - 2)
      return t // vowel+es and consonants outside the set: keep unchanged
    }
    val v = t.charAt(len - 2)
    if (v == 'a' || v == 'e' || v == 'i' || v == 'o' || v == 'u')
      t.substring(0, len - 1)
    else t
  }

  /** HTMLStripCharFilter (documented subset)
    * [B lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/HTMLStripCharFilter.java]:
    * the char-filter stage that runs BEFORE tokenization. Strips, in
    * order: comments, bare script/style elements WITH their content,
    * every remaining tag, then decodes the common entity set (lt gt quot
    * nbsp, amp last so double-encoded text decodes one level) — so
    * entity-encoded angle brackets survive as literal text, exactly the
    * reason the ordering is part of the contract. The oracle reproduces
    * the same chain with RE2 regexp_replace calls in the same order; the
    * digest equality in analysis_html_strip pins the two byte-for-byte.
    */
  def htmlStrip(s: String): String =
    s.replaceAll("(?s)<!--.*?-->", "")
      .replaceAll("(?s)<script>.*?</script>", "")
      .replaceAll("(?s)<style>.*?</style>", "")
      .replaceAll("<[^>]*>", "")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&nbsp;", " ").replace("&amp;", "&")

  /** CJKBigramFilter (han script, default flags)
    * [B lucene/analysis/common/src/java/org/apache/lucene/analysis/cjk/CJKBigramFilter.java]:
    * consecutive CJK ideographs (U+4E00–U+9FFF here) emit overlapping
    * bigrams; an ISOLATED ideograph emits itself as a unigram (the
    * filter's outputUnigrams=false default still emits singles where no
    * bigram exists); non-CJK text passes to the standard chain and is
    * not this function's concern.
    */
  def cjkBigrams(text: String): Array[String] = {
    @inline def isHan(c: Char) = c >= 0x4E00 && c <= 0x9FFF
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      if (isHan(text.charAt(i))) {
        var j = i + 1
        while (j < n && isHan(text.charAt(j))) j += 1
        if (j - i == 1) out += text.substring(i, i + 1)
        else {
          var k = i
          while (k + 1 < j) { out += text.substring(k, k + 2); k += 1 }
        }
        i = j
      } else i += 1
    }
    out.toArray
  }

  /** UAX#29 word segmentation over the JDK BreakIterator — the
    * StandardTokenizer beyond the ASCII-identifier fast path
    * [B lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizerImpl.java
    * (generated from UAX#29 word-break rules); …/analysis/th/ThaiTokenizer.java
    * (BreakIterator dictionary segmentation)]. Segments with no
    * letter/digit codepoint (punctuation, emoji, whitespace) are dropped —
    * classic StandardTokenizer behavior — and pure-Han segments are split
    * to one token per ideograph, Lucene's IDEOGRAPHIC unigram emission
    * (the CJK bigram filter composes on top, as in Lucene). A `th` locale
    * dictionary-segments unspaced Thai the way ThaiTokenizer does; every
    * other script follows the locale-independent UAX#29 default rules.
    * Tokens are lowercased (ROOT casing, like LowerCaseFilter).
    */
  def uax29Tokenize(text: String,
      locale: java.util.Locale = java.util.Locale.ROOT): Array[String] = {
    val bi = java.text.BreakIterator.getWordInstance(locale)
    bi.setText(text)
    val out = mutable.ArrayBuffer.empty[String]
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      val seg = text.substring(start, end)
      val cps = seg.codePoints().toArray
      if (cps.exists(Character.isLetterOrDigit)) {
        if (cps.forall(cp =>
          Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN))
          cps.foreach(cp => out += new String(Character.toChars(cp)))
        else out += seg.toLowerCase(java.util.Locale.ROOT)
      }
      start = end
      end = bi.next()
    }
    out.toArray
  }

  /** Per-language minimal stemmer dispatch — the Solr language-specific
    * field-type composition (one analyzer chain per `lang` value): en uses
    * the S-stemmer, fr/de/es their minimal stemmers above, anything else
    * (zh here — no CJK segmentation claimed) passes through unstemmed.
    */
  def stemForLang(lang: String, t: String): String = lang match {
    case "en" => minimalStem(t)
    case "fr" => frenchMinimalStem(t)
    case "de" => germanMinimalStem(t)
    case "es" => spanishPluralStem(t)
    case _ => t
  }

  /** WordDelimiterGraphFilter-style subword split of one token
    * [B lucene/analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/WordDelimiterGraphFilter.java]:
    * parts break at delimiters (_ -), lower->upper case transitions,
    * letter<->digit transitions, and the acronym boundary (SQLParser ->
    * SQL|Parser). Default GENERATE_WORD_PARTS+GENERATE_NUMBER_PARTS shape
    * (no catenation); callers lowercase downstream, as in the chain.
    * Exactly reproducible by the oracle's boundary-insertion regexes —
    * that equivalence is what the analysis_word_delimiter entry pins.
    */
  def wordDelimiterParts(token: String): Array[String] = {
    if (token == null || token.isEmpty) return Array.empty
    @inline def up(c: Char) = c >= 'A' && c <= 'Z'
    @inline def low(c: Char) = c >= 'a' && c <= 'z'
    @inline def dig(c: Char) = c >= '0' && c <= '9'
    @inline def delim(c: Char) = !up(c) && !low(c) && !dig(c)
    val out = mutable.ArrayBuffer.empty[String]
    val n = token.length
    var i = 0
    while (i < n) {
      while (i < n && delim(token.charAt(i))) i += 1
      val start = i
      if (i < n) {
        i += 1
        var break = false
        while (i < n && !break) {
          val p = token.charAt(i - 1); val c = token.charAt(i)
          if (delim(c)) break = true
          else if (low(p) && up(c)) break = true // camelCase
          else if ((up(p) || low(p)) && dig(c)) break = true // letter->digit
          else if (dig(p) && (up(c) || low(c))) break = true // digit->letter
          else if (up(p) && up(c) && i + 1 < n && low(token.charAt(i + 1)))
            break = true // acronym run before a Word
          else i += 1
        }
        out += token.substring(start, i)
      }
    }
    out.toArray
  }

  /** ASCII-folding map, the Latin-1/Latin-Extended subset the corpus
    * augmentation exercises [B lucene/analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/ASCIIFoldingFilter.java
    * — Lucene's table covers all of Unicode Latin; ours is the documented
    * subset, applied as an ordered replace chain shared verbatim with the
    * oracle SQL].
    */
  val AsciiFoldMap: Seq[(String, String)] = Seq(
    "á" -> "a", "à" -> "a", "â" -> "a", "ä" -> "a", "ã" -> "a",
    "é" -> "e", "è" -> "e", "ê" -> "e", "ë" -> "e",
    "í" -> "i", "ì" -> "i", "î" -> "i", "ï" -> "i",
    "ó" -> "o", "ò" -> "o", "ô" -> "o", "ö" -> "o", "õ" -> "o",
    "ú" -> "u", "ù" -> "u", "û" -> "u", "ü" -> "u",
    "ñ" -> "n", "ç" -> "c", "ß" -> "ss", "æ" -> "ae", "œ" -> "oe")

  def asciiFold(s: String): String =
    AsciiFoldMap.foldLeft(s) { case (acc, (from, to)) => acc.replace(from, to) }

  /** American Soundex, simplified database variant (the National Archives
    * coding with h/w treated as vowels — the rule set SQL soundex()
    * implementations use), the phonetic-module capability
    * [B lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/PhoneticFilter.java].
    * Pipeline (mirrored step-for-step by the SQL oracle): code every
    * letter, collapse adjacent equal codes, drop the first code, strip
    * zeros, first letter + first 3 digits zero-padded. Only defined for
    * all-alphabetic lowercase tokens; others pass through unchanged.
    */
  def soundex(t: String): String = {
    if (t.isEmpty || !t.forall(c => c >= 'a' && c <= 'z')) return t
    @inline def code(c: Char): Char = c match {
      case 'b' | 'f' | 'p' | 'v' => '1'
      case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => '2'
      case 'd' | 't' => '3'
      case 'l' => '4'
      case 'm' | 'n' => '5'
      case 'r' => '6'
      case _ => '0'
    }
    val collapsed = new StringBuilder
    var i = 0
    while (i < t.length) {
      val c = code(t.charAt(i))
      if (collapsed.isEmpty || collapsed.charAt(collapsed.length - 1) != c)
        collapsed.append(c)
      i += 1
    }
    val digits = collapsed.substring(1).filter(_ != '0').take(3)
    t.charAt(0).toUpper +: digits.padTo(3, '0')
  }

  /** Analyzed per-doc term frequencies, terms in sorted order (the per-doc
    * slice of the DWPT-style in-memory inverted index, SURVEY.md §2.3).
    * Returns (sortedTerms, tfs, totalTokenCount-after-stop).
    * Allocation-lean by design (sort + run-length count, no hash map):
    * this is the hottest loop of the whole index build.
    */
  def termFreqs(text: String, stopWords: Set[String] = EnglishStopWords)
      : (Array[String], Array[Int], Int) = {
    val terms = analyze(text, stopWords)
    if (terms.isEmpty) return (Array.empty, Array.empty, 0)
    java.util.Arrays.sort(terms.asInstanceOf[Array[AnyRef]])
    // count distinct runs
    var distinct = 1
    var i = 1
    while (i < terms.length) {
      if (terms(i) != terms(i - 1)) distinct += 1
      i += 1
    }
    val outTerms = new Array[String](distinct)
    val outTfs = new Array[Int](distinct)
    var d = 0
    var runStart = 0
    i = 1
    while (i <= terms.length) {
      if (i == terms.length || terms(i) != terms(i - 1)) {
        outTerms(d) = terms(runStart)
        outTfs(d) = i - runStart
        d += 1
        runStart = i
      }
      i += 1
    }
    (outTerms, outTfs, terms.length)
  }
}
