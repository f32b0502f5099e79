package graft.search

import org.scalatest.funsuite.AnyFunSuite
import QueryParser._

/** SimpleQueryParser grammar pinning (the fault-tolerant end-user parser)
  * plus the Solr mm-spec calculator's reference-guide cases.
  */
class SimpleQueryParserSpec extends AnyFunSuite {

  private def p(q: String): QNode = SimpleQueryParser.parse(q)

  test("linear left-associative fold: a + b | c == ((a AND b) OR c)") {
    assert(p("a + b | c") ==
      QOr(Seq(QAnd(Seq(QTerm(None, "a"), QTerm(None, "b"))), QTerm(None, "c"))))
  }

  test("juxtaposition applies the default operator (OR)") {
    assert(p("a b c") ==
      QOr(Seq(QTerm(None, "a"), QTerm(None, "b"), QTerm(None, "c"))))
  }

  test("same-op chains flatten the way repeated combine() calls do") {
    assert(p("a + b + c") ==
      QAnd(Seq(QTerm(None, "a"), QTerm(None, "b"), QTerm(None, "c"))))
  }

  test("- negates the single next clause") {
    assert(p("-a b") == QOr(Seq(QNot(QTerm(None, "a")), QTerm(None, "b"))))
    assert(p("a + -(b | c)") ==
      QAnd(Seq(QTerm(None, "a"),
        QNot(QOr(Seq(QTerm(None, "b"), QTerm(None, "c")))))))
  }

  test("a-b stays one token: '-' only negates at clause start") {
    assert(p("a-b") == QTerm(None, "a-b"))
  }

  test("phrase with ~N slop") {
    assert(p("\"key order\"~2") == QPhrase(None, "key order", proximity = Some(2)))
    assert(p("\"key order\"") == QPhrase(None, "key order"))
  }

  test("trailing * is a prefix query; ~N on a word is fuzzy") {
    assert(p("win*") == QTerm(None, "win*", wildcard = true))
    assert(p("merge~2") == QTerm(None, "merge", fuzzy = Some(2.0)))
  }

  test("groups set precedence") {
    assert(p("(a | b) + c") ==
      QAnd(Seq(QOr(Seq(QTerm(None, "a"), QTerm(None, "b"))), QTerm(None, "c"))))
  }

  test("never throws: degenerate inputs degrade to text or nothing") {
    assert(p("") == QOr(Nil)) // matches nothing
    assert(p("+ | +") == QOr(Nil))
    assert(p("*") == QOr(Nil)) // bare wildcard dropped
    assert(p(") a") == QTerm(None, "a")) // stray ')' skipped
    assert(p("\"unterminated phrase") ==
      QPhrase(None, "unterminated phrase")) // quote runs to EOF
    assert(p("a ~ b") == // '~' with no digits is dropped from the token
      QOr(Seq(QTerm(None, "a"), QTerm(None, "~"), QTerm(None, "b"))))
  }

  test("doubled operators consume as one (++, ||)") {
    assert(p("a ++ b") == QAnd(Seq(QTerm(None, "a"), QTerm(None, "b"))))
    assert(p("a || b") == QOr(Seq(QTerm(None, "a"), QTerm(None, "b"))))
  }

  // ---- Solr mm spec (SolrPluginUtils.calculateMinShouldMatch) ----

  import MinShouldMatch.calculate

  test("mm: plain integers, negatives, percentages") {
    assert(calculate(4, "3") == 3)
    assert(calculate(4, "-1") == 3)
    assert(calculate(4, "75%") == 3)
    assert(calculate(4, "-25%") == 3)
    assert(calculate(10, "90%") == 9)
    assert(calculate(3, "90%") == 2) // rounds DOWN
  }

  test("mm: clamps into [0, optionalClauseCount]") {
    assert(calculate(3, "5") == 3)
    assert(calculate(3, "-5") == 0)
  }

  test("mm: conditional specs (the reference-guide examples)") {
    // "3<90%": <=3 optional clauses -> all required; more -> 90%
    assert(calculate(3, "3<90%") == 3)
    assert(calculate(10, "3<90%") == 9)
    // "2<-25% 9<-3": <=2 all; 3..9 all-but-25%; >9 all-but-3
    assert(calculate(2, "2<-25% 9<-3") == 2)
    assert(calculate(4, "2<-25% 9<-3") == 3)
    assert(calculate(8, "2<-25% 9<-3") == 6)
    assert(calculate(16, "2<-25% 9<-3") == 13)
  }
}
