package graft.search

import org.scalatest.funsuite.AnyFunSuite
import SurroundParser._
import SpanNode.{term, SNear}

class SurroundParserSpec extends AnyFunSuite {

  test("infix distance chain: a 3W b == SpanNear(slop 2, ordered)") {
    assert(parse("merge 3W window") ==
      SSpan(SNear(Seq(term("merge"), term("window")), slop = 2, ordered = true)))
  }

  test("bare W/N mean 1W/1N; N is unordered") {
    assert(parse("key W order") ==
      SSpan(SNear(Seq(term("key"), term("order")), slop = 0, ordered = true)))
    assert(parse("key 2N order") ==
      SSpan(SNear(Seq(term("key"), term("order")), slop = 1, ordered = false)))
  }

  test("prefix operator form: 3W(a, b, c) and OR(a, b)") {
    assert(parse("3W(a, b, c)") ==
      SSpan(SNear(Seq(term("a"), term("b"), term("c")), slop = 2, ordered = true)))
    assert(parse("OR(a, b)") == SOrB(Seq(SSpan(term("a")), SSpan(term("b")))))
  }

  test("precedence: W binds tighter than NOT, NOT than AND, AND than OR") {
    val q = parse("a W b AND c OR d")
    assert(q == SOrB(Seq(
      SAnd(Seq(
        SSpan(SNear(Seq(term("a"), term("b")), slop = 0, ordered = true)),
        SSpan(term("c")))),
      SSpan(term("d")))))
    assert(parse("a NOT b AND c") ==
      SAnd(Seq(SNotB(SSpan(term("a")), SSpan(term("b"))), SSpan(term("c")))))
  }

  test("parentheses group; keywords are case-insensitive") {
    assert(parse("(a or b) AND c") ==
      SAnd(Seq(SOrB(Seq(SSpan(term("a")), SSpan(term("b")))), SSpan(term("c")))))
  }

  test("W binds tighter than N: a 2W b 3N c == 3N(2W(a,b), c)") {
    assert(parse("a 2W b 3N c") ==
      SSpan(SNear(Seq(
        SNear(Seq(term("a"), term("b")), slop = 1, ordered = true),
        term("c")), slop = 2, ordered = false)))
  }

  test("mixed distances in one chain reject; booleans can't nest in spans") {
    intercept[SurroundParseException] { parse("a 2W b 3W c") }
    intercept[SurroundParseException] { parse("a W (b AND c)") }
  }

  test("terms lowercase on parse") {
    assert(parse("MeRgE 3W WiNdOw") ==
      SSpan(SNear(Seq(term("merge"), term("window")), slop = 2, ordered = true)))
  }
}
