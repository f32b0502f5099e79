package graft.search

import QueryParser._

/** Lucene's SimpleQueryParser — the fault-tolerant end-user grammar
  * [B lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/SimpleQueryParser.java]:
  *
  *   - `+` is the infix AND operator, `|` the infix OR operator (both also
  *     accept doubled forms `++`/`||`, which the reference consumes as one)
  *   - juxtaposition applies the DEFAULT operator (SHOULD, i.e. OR — the
  *     reference's `defaultOperator` initial value)
  *   - `-` prefixed to a token/group negates it
  *   - `"..."` is a phrase; a trailing `~N` sets phrase slop
  *   - a trailing `*` on a word makes it a prefix query
  *   - a trailing `~N` on a word makes it fuzzy with N edits
  *   - `(` `)` group for precedence
  *   - the parser NEVER throws: malformed syntax degrades to literal text
  *     (the class contract — "this parser will never throw an exception")
  *
  * Operators combine linearly and left-associatively, exactly the way the
  * reference's single-pass state machine folds each finished clause into
  * the running buffer with the operator in effect at that point — so
  * `a + b | c` parses as ((a AND b) OR c), not (a AND (b OR c)).
  *
  * Output is the same QNode AST as the classic parser; execution reuses
  * QueryLowering (analysis, synonym expansion, dictionary-bounded prefix
  * expansion) and the clause-tree engine unchanged.
  */
object SimpleQueryParser {

  def parse(input: String): QNode = {
    val p = new P(input)
    val n = p.parseExpr(insideGroup = false)
    n.getOrElse(QOr(Nil)) // empty / all-operators input: matches nothing
  }

  private final class P(s: String) {
    private var pos = 0

    private def eof = pos >= s.length
    private def peek = s.charAt(pos)
    private def skipWs(): Unit =
      while (!eof && Character.isWhitespace(peek)) pos += 1

    /** Characters that end a bare word. `-` stays a word char INSIDE a
      * token (a-b), mirroring the reference, which only treats it as
      * negation at clause start.
      */
    private def isWordEnd(c: Char): Boolean =
      Character.isWhitespace(c) || c == '+' || c == '|' || c == '(' ||
        c == ')' || c == '"'

    private sealed trait Op
    private case object OpAnd extends Op
    private case object OpOr extends Op

    private def fold(acc: Option[QNode], op: Op, next: QNode): Option[QNode] =
      acc match {
        case None => Some(next)
        case Some(a) => Some(op match {
          // flatten same-shape chains the way repeated combine() calls do
          case OpAnd => a match {
            case QAnd(cs) => QAnd(cs :+ next)
            case _ => QAnd(Seq(a, next))
          }
          case OpOr => a match {
            case QOr(cs) => QOr(cs :+ next)
            case _ => QOr(Seq(a, next))
          }
        })
      }

    /** Linear left-associative clause folding; `insideGroup` stops at ')'. */
    def parseExpr(insideGroup: Boolean): Option[QNode] = {
      var acc: Option[QNode] = None
      var op: Op = OpOr // default operator: SHOULD
      var done = false
      while (!done) {
        skipWs()
        if (eof) done = true
        else peek match {
          case '+' => pos += 1; op = OpAnd
          case '|' => pos += 1; op = OpOr
          case ')' =>
            if (insideGroup) { done = true }
            else pos += 1 // stray ')': the reference skips it silently
          case _ =>
            parseClause() match {
              case Some(n) => acc = fold(acc, op, n); op = OpOr
              case None => if (eof) done = true
            }
        }
      }
      acc
    }

    /** One clause: negation, group, phrase, or word (+ suffix modifiers).
      * Returns None when nothing consumable is here (degenerate input);
      * always advances or signals eof to the caller.
      */
    private def parseClause(): Option[QNode] = {
      skipWs()
      if (eof) return None
      peek match {
        case '-' =>
          pos += 1
          // negation applies to the single next clause; a bare trailing
          // '-' degrades to nothing (never an error)
          parseClause().map(QNot(_))
        case '(' =>
          val save = pos
          pos += 1
          val inner = parseExpr(insideGroup = true)
          if (!eof && peek == ')') {
            pos += 1
            inner // empty group "( )" degrades to nothing
          } else {
            // unbalanced '(': re-read it as literal text from the paren
            pos = save + 1
            inner // reference consumes the content; the paren is dropped
          }
        case '"' =>
          pos += 1
          val start = pos
          while (!eof && peek != '"') pos += 1
          val body = s.substring(start, pos)
          if (!eof) pos += 1 // closing quote
          val slop = parseTildeInt()
          if (body.trim.isEmpty) None
          else Some(QPhrase(None, body, proximity = slop))
        case _ =>
          val start = pos
          while (!eof && !isWordEnd(peek)) pos += 1
          if (pos == start) { pos += 1; return None } // lone special char
          var w = s.substring(start, pos)
          // trailing fuzzy ~N was consumed into the word (~ is a word char
          // here, as in the reference's token scan); split it back out
          val m = FuzzyTail.findFirstMatchIn(w)
          val fuzzy = m.map(_.group(1).toInt)
          if (m.isDefined) w = w.substring(0, m.get.start)
          if (w.isEmpty) None
          else if (fuzzy.isDefined)
            Some(QTerm(None, w, fuzzy = fuzzy.map(_.toDouble)))
          else if (w.endsWith("*") && w.length > 1)
            Some(QTerm(None, w, wildcard = true))
          else if (w == "*") None // bare wildcard degrades to nothing
          else Some(QTerm(None, w))
      }
    }

    /** `~N` immediately following a phrase (slop). */
    private def parseTildeInt(): Option[Int] = {
      if (eof || peek != '~') return None
      val save = pos
      pos += 1
      val start = pos
      while (!eof && Character.isDigit(peek)) pos += 1
      if (pos == start) { pos = save + 1; None } // "~" with no digits: dropped
      else Some(s.substring(start, pos).toInt)
    }
  }

  private val FuzzyTail = "~(\\d+)$".r
}
