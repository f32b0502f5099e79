package graft.search

import graft.QuerySpec

/** Lucene query-language parser
  * [B lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/QueryParser.jj],
  * grammar-conformant to the locally witnessed public grammar
  * [G /usr/lib/google-cloud-sdk/platform/gsutil/third_party/pyparsing/examples/lucene_grammar.py 21-69]:
  *
  *   expr     := or
  *   or       := and ((OR | '||' | implicit-juxtaposition) and)*
  *   and      := not ((AND | '&&') not)*
  *   not      := (NOT | '!') not | mod
  *   mod      := ('+' | '-') mod | term
  *   term     := ~keyword [field ':'] (word [~fuzzy] | "phrase" [~prox]
  *               | range | '(' expr ')') ['^' boost]
  *   range    := ('[' term TO term ']') | ('{' term TO term '}')
  *   word     := start-char subsequent-char*   (escapes: \\ \special \|| \&&;
  *               '*' / '?' are wildcards, forbidden in start position)
  *
  * Scannerless recursive descent with pyparsing-equivalent try-order: the
  * unary '+'/'-' operators are attempted BEFORE word lexing, so "-term" is a
  * prohibit modifier while "a-b" stays one word — exactly the packrat
  * grammar's behavior. Keywords (AND OR NOT TO) are case-insensitive with
  * identifier-boundary checks and can never begin a term.
  */
object QueryParser {

  // ---- AST -----------------------------------------------------------------

  sealed trait QNode
  final case class QTerm(field: Option[String], text: String,
      fuzzy: Option[Double] = None, wildcard: Boolean = false,
      boost: Option[Double] = None) extends QNode
  final case class QPhrase(field: Option[String], phrase: String,
      proximity: Option[Int] = None, boost: Option[Double] = None) extends QNode
  final case class QRange(field: Option[String], lower: String, upper: String,
      inclusive: Boolean, boost: Option[Double] = None) extends QNode
  final case class QGroup(field: Option[String], expr: QNode,
      boost: Option[Double] = None) extends QNode
  final case class QRequired(child: QNode) extends QNode
  final case class QProhibited(child: QNode) extends QNode
  final case class QNot(child: QNode) extends QNode
  final case class QAnd(children: Seq[QNode]) extends QNode
  final case class QOr(children: Seq[QNode]) extends QNode

  final case class ParseException(msg: String, pos: Int)
    extends IllegalArgumentException(s"$msg at offset $pos")

  def parse(input: String): QNode = {
    val p = new P(input)
    p.skipWs()
    val e = p.parseOr()
    p.skipWs()
    if (!p.eof) throw ParseException("unconsumed input", p.pos)
    e
  }

  /** Parse; Left(error) instead of throwing. */
  def tryParse(input: String): Either[String, QNode] =
    try Right(parse(input))
    catch { case e: ParseException => Left(e.getMessage) }

  // ---- parser --------------------------------------------------------------

  private val Keywords = Seq("AND", "OR", "NOT", "TO")
  private val Special = "+-!(){}[]^\"~*?:"

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def peek: Char = s.charAt(pos)
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1

    private def fail(msg: String): Nothing = throw ParseException(msg, pos)

    // -- lexical helpers --

    private def isIdentChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_' || c == '$'

    /** Case-insensitive keyword at pos with an identifier boundary after. */
    def keywordHere: Option[String] = Keywords.find { kw =>
      s.regionMatches(true, pos, kw, 0, kw.length) &&
        (pos + kw.length >= s.length || !isIdentChar(s.charAt(pos + kw.length)))
    }

    def tryKw(kw: String): Boolean = {
      val save = pos
      skipWs()
      if (keywordHere.contains(kw)) { pos += kw.length; true }
      else { pos = save; false }
    }

    def tryOp(op: String): Boolean = {
      val save = pos
      skipWs()
      if (s.regionMatches(pos, op, 0, op.length)) { pos += op.length; true }
      else { pos = save; false }
    }

    private def isWordStartChar(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '-'

    private def isWordSubChar(c: Char): Boolean =
      isWordStartChar(c) || c == '+' || c == '*' || c == '?'

    /** Lex a word (with escape handling); (unescapedText, sawWildcard). */
    def lexWord(): Option[(String, Boolean)] = {
      val sb = new StringBuilder
      var wildcard = false
      var first = true
      var p = pos
      var stop = false
      while (p < s.length && !stop) {
        val c = s.charAt(p)
        if (c == '\\') {
          // escape: \\ or \<special> or \|| or \&&
          if (p + 1 < s.length && s.charAt(p + 1) == '\\') { sb += '\\'; p += 2 }
          else if (p + 1 < s.length && Special.indexOf(s.charAt(p + 1)) >= 0) {
            sb += s.charAt(p + 1); p += 2
          } else if (p + 2 < s.length && s.charAt(p + 1) == '|' && s.charAt(p + 2) == '|') {
            sb ++= "||"; p += 3
          } else if (p + 2 < s.length && s.charAt(p + 1) == '&' && s.charAt(p + 2) == '&') {
            sb ++= "&&"; p += 3
          } else if (first) return None
          else stop = true
          if (!stop) first = false
        } else if (first) {
          if (isWordStartChar(c)) { sb += c; p += 1; first = false }
          else return None
        } else if (isWordSubChar(c)) {
          if (c == '*' || c == '?') wildcard = true
          sb += c; p += 1
        } else stop = true
      }
      if (first) None
      else { pos = p; Some((sb.toString, wildcard)) }
    }

    /** Lex a floating-point number (used after '^' and '~'). */
    def lexNumber(): Option[Double] = {
      val save = pos
      skipWs()
      val start = pos
      while (!eof && peek >= '0' && peek <= '9') pos += 1
      if (pos == start) { pos = save; return None }
      if (!eof && peek == '.') {
        pos += 1
        while (!eof && peek >= '0' && peek <= '9') pos += 1
      }
      Some(s.substring(start, pos).toDouble)
    }

    /** Lex an integer (phrase proximity); rejects a trailing '.'. */
    def lexInt(): Option[Int] = {
      val save = pos
      skipWs()
      val start = pos
      while (!eof && peek >= '0' && peek <= '9') pos += 1
      if (pos == start || (!eof && peek == '.')) { pos = save; None }
      else Some(s.substring(start, pos).toInt)
    }

    // -- grammar levels --

    def parseOr(): QNode = {
      val items = scala.collection.mutable.ListBuffer(parseAnd())
      var done = false
      while (!done) {
        val save = pos
        if (tryKw("OR") || tryOp("||")) items += parseAnd()
        else {
          skipWs()
          if (eof || peek == ')') { pos = save; done = true }
          else {
            // implicit OR (juxtaposition): backtrack if no operand parses
            try items += parseAnd()
            catch { case _: ParseException => pos = save; done = true }
          }
        }
      }
      if (items.size == 1) items.head else QOr(items.toSeq)
    }

    def parseAnd(): QNode = {
      val items = scala.collection.mutable.ListBuffer(parseNot())
      while (tryKw("AND") || tryOp("&&")) items += parseNot()
      if (items.size == 1) items.head else QAnd(items.toSeq)
    }

    def parseNot(): QNode = {
      if (tryKw("NOT") || tryOp("!")) QNot(parseNot())
      else parseMod()
    }

    def parseMod(): QNode = {
      skipWs()
      if (!eof && peek == '+') { pos += 1; QRequired(parseMod()) }
      else if (!eof && peek == '-') { pos += 1; QProhibited(parseMod()) }
      else parseTerm()
    }

    def parseTerm(): QNode = {
      skipWs()
      if (eof) fail("expected term")
      if (keywordHere.isDefined) fail(s"keyword cannot start a term")
      // optional field prefix
      val save = pos
      lexWord() match {
        case Some((w, false)) if { val s2 = pos; skipWs()
            if (!eof && peek == ':') { pos += 1; true } else { pos = s2; false } } =>
          parseValue(Some(w))
        case _ =>
          pos = save
          parseValue(None)
      }
    }

    private def parseBoost(): Option[Double] = {
      val save = pos
      skipWs()
      if (!eof && peek == '^') {
        pos += 1
        Some(lexNumber().getOrElse(fail("expected boost number after ^")))
      } else { pos = save; None }
    }

    def parseValue(field: Option[String]): QNode = {
      skipWs()
      if (eof) fail("expected term value")
      peek match {
        case '"' =>
          pos += 1
          val start = pos
          while (!eof && peek != '"') pos += 1
          if (eof) fail("unterminated phrase")
          val phrase = s.substring(start, pos)
          pos += 1
          val prox = {
            val save = pos
            skipWs()
            if (!eof && peek == '~') {
              pos += 1
              lexInt() match {
                case Some(n) => Some(n)
                case None => pos = save; None // bare ~ after phrase: not prox
              }
            } else { pos = save; None }
          }
          QPhrase(field, phrase, prox, parseBoost())
        case '(' =>
          pos += 1
          val e = parseOr()
          skipWs()
          if (eof || peek != ')') fail("expected )")
          pos += 1
          QGroup(field, e, parseBoost())
        case c @ ('[' | '{') =>
          val inclusive = c == '['
          pos += 1
          val lower = parseRangeBound()
          if (!tryKw("TO")) fail("expected TO in range")
          val upper = parseRangeBound()
          skipWs()
          val closer = if (inclusive) ']' else '}'
          if (eof || peek != closer) fail(s"expected $closer")
          pos += 1
          QRange(field, lower, upper, inclusive, parseBoost())
        case _ =>
          lexWord() match {
            case Some((w, wild)) =>
              val fuzzy = {
                val save = pos
                skipWs()
                if (!eof && peek == '~' &&
                  // '~' then digit => fuzzy value; bare '~' => default 0.5
                  { pos += 1; true }) {
                  Some(lexNumber().getOrElse(0.5))
                } else { pos = save; None }
              }
              QTerm(field, w, fuzzy, wild, parseBoost())
            case None => fail("expected term value")
          }
      }
    }

    /** Range bound: a word (escapes allowed), guarded against keywords. */
    private def parseRangeBound(): String = {
      skipWs()
      if (keywordHere.isDefined) fail("keyword cannot be a range bound")
      lexWord() match {
        case Some((w, _)) => w
        case None => fail("expected range bound")
      }
    }
  }

  // ---- lowering to the execution QuerySpec ----------------------------------

  /** Lower a parsed query to the engine's flat QuerySpec. Supports the
    * executable subset: one boolean level of terms over the analyzed
    * `content` field (field absent or "content"), '+'/'-'/NOT/AND/OR
    * modifiers, per-term '^' boosts, and `lang:x` equality as the pushed
    * metadata filter when required. Everything else (wildcards, fuzzy,
    * ranges, phrases, nested groups) parses but must be executed through
    * its dedicated operator — Left(reason) says why.
    */
  def lower(node: QNode, qid: String, k: Int = 10): Either[String, QuerySpec] = {
    var should = Vector.empty[String]
    var must = Vector.empty[String]
    var mustNot = Vector.empty[String]
    var boosts = Map.empty[String, Double]
    var langFilter: Option[String] = None

    sealed trait Mode
    case object Should extends Mode
    case object Must extends Mode
    case object Not extends Mode

    def addTerm(t: QTerm, mode: Mode): Either[String, Unit] = {
      if (t.wildcard) return Left(s"wildcard term '${t.text}' needs searchWildcard")
      if (t.fuzzy.isDefined) return Left(s"fuzzy term '${t.text}' needs searchFuzzy")
      t.field match {
        case Some("lang") =>
          if (mode == Not) Left("negated lang filter unsupported")
          else { langFilter = Some(t.text); Right(()) }
        case None | Some("content") | Some("repo") =>
          val lowered = t.text.toLowerCase(java.util.Locale.ROOT)
          val term =
            if (t.field.contains("repo"))
              graft.index.FieldOf.prefixed("repo", lowered)
            else lowered
          t.boost.foreach(b => boosts += term -> b)
          mode match {
            case Should => should :+= term
            case Must => must :+= term
            case Not => mustNot :+= term
          }
          Right(())
        case Some(f) => Left(s"unknown field '$f'")
      }
    }

    // `root`: AND may promote its children to MUST only at the top level
    // ("a AND b" == +a +b); a nested AND under an OR ("c OR (a AND b)")
    // cannot be expressed in the flat QuerySpec and must be rejected —
    // flattening it would silently invert semantics. Nested ORs under the
    // SHOULD default are safe to flatten: the match set is identical and
    // BM25 clause scores add associatively.
    def walk(n: QNode, mode: Mode, root: Boolean): Either[String, Unit] = n match {
      case t: QTerm => addTerm(t, mode)
      case QRequired(c) => walk(c, if (mode == Not) Not else Must, root = false)
      case QProhibited(c) =>
        if (mode == Not) Left("double negation unsupported")
        else walk(c, Not, root = false)
      case QNot(c) =>
        if (mode == Not) Left("double negation unsupported")
        else walk(c, Not, root = false)
      case QAnd(cs) =>
        if (mode != Should || !root)
          Left("nested conjunction unsupported in the flat QuerySpec")
        else cs.foldLeft[Either[String, Unit]](Right(())) {
          (acc, c) => acc.flatMap(_ => walk(c, Must, root = false))
        }
      case QOr(cs) =>
        if (mode != Should)
          Left("disjunction under a required/negated clause unsupported")
        else cs.foldLeft[Either[String, Unit]](Right(())) {
          // children of an OR are not root: an AND inside an OR branch
          // ("c OR (a AND b)") is not expressible flat
          (acc, c) => acc.flatMap(_ => walk(c, Should, root = false))
        }
      case QGroup(None, e, None) => walk(e, mode, root)
      case _: QGroup => Left("field-scoped or boosted groups unsupported")
      case _: QPhrase => Left("phrase needs searchPhrase")
      case _: QRange => Left("range needs the range operator")
    }

    walk(node, Should, root = true).map { _ =>
      QuerySpec(qid, should = should, must = must, mustNot = mustNot, k = k,
        langFilter = langFilter, boosts = boosts)
    }
  }

  /** parse + lower in one step (throws on parse error or unsupported shape). */
  def parseToSpec(query: String, qid: String, k: Int = 10): QuerySpec =
    lower(parse(query), qid, k).fold(
      err => throw new IllegalArgumentException(s"cannot execute '$query': $err"),
      identity)
}
