package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Soundex known-value checks (National Archives coding, simplified
  * database variant: h/w code as vowels rather than vanishing — so
  * 'ashcraft' is A226 here, not the h-rule A261).
  */
class SoundexSpec extends AnyFunSuite {

  test("classic known values") {
    assert(Analyzer.soundex("robert") == "R163")
    assert(Analyzer.soundex("rupert") == "R163")
    assert(Analyzer.soundex("tymczak") == "T522")
    assert(Analyzer.soundex("pfister") == "P236") // NARA: pf collapses
    assert(Analyzer.soundex("ashcraft") == "A226") // simplified variant
  }

  test("short and vowel-only tokens pad with zeros") {
    assert(Analyzer.soundex("a") == "A000")
    assert(Analyzer.soundex("ae") == "A000")
    assert(Analyzer.soundex("ab") == "A100")
  }

  test("adjacent equal codes collapse across the first letter") {
    // 'pb' both code 1, adjacent: collapse leaves nothing after the first
    assert(Analyzer.soundex("pb") == "P000")
    assert(Analyzer.soundex("ssort") == "S630")
  }

  test("non-alphabetic tokens pass through") {
    assert(Analyzer.soundex("x86_64") == "x86_64")
    assert(Analyzer.soundex("") == "")
  }
}
