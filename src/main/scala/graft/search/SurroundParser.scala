package graft.search

/** The surround query language — Lucene's span-oriented end-user syntax
  * [B lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/parser/QueryParser.jj,
  * .../surround/query/DistanceQuery.java]:
  *
  *   - `a AND b`, `a OR b`, `a NOT b` boolean combinations (case-
  *     insensitive keywords, left-associative)
  *   - `a nW b` — ordered proximity: b within n positions AFTER a
  *     (SpanNearQuery slop = n-1, inOrder=true); bare `W` means 1W
  *     (adjacency)
  *   - `a nN b` — unordered proximity (inOrder=false); bare `N` = 1N
  *   - prefix form `nW(a, b, c)` / `OR(a, b)` / `AND(a, b)` with the
  *     same meanings (the reference grammar accepts both fixes)
  *   - parentheses group
  *
  * Precedence (tightest first): W/N chains, NOT, AND, OR — the
  * reference's production nesting. Output is a small ADT: span nodes
  * (lowered onto the existing SpanAlgebra) combined by boolean set
  * operations over matching documents, exactly how surround queries
  * execute (SpanQuery trees under a BooleanQuery).
  */
object SurroundParser {

  sealed trait SNode
  final case class SSpan(node: SpanNode) extends SNode
  final case class SAnd(children: Seq[SNode]) extends SNode
  final case class SOrB(children: Seq[SNode]) extends SNode
  final case class SNotB(include: SNode, exclude: SNode) extends SNode

  final case class SurroundParseException(msg: String, pos: Int)
    extends IllegalArgumentException(s"$msg at offset $pos")

  def parse(input: String): SNode = {
    val p = new P(input)
    val n = p.parseOr()
    p.skipWs()
    if (!p.eof) throw SurroundParseException("trailing input", p.pos)
    n
  }

  private val DistOp = "(?i)^(\\d*)([wn])$".r

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def peek: Char = s.charAt(pos)
    def skipWs(): Unit = while (!eof && Character.isWhitespace(peek)) pos += 1

    private def isWordChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_'

    /** Next bare word without consuming (for keyword lookahead). */
    private def peekWord(): Option[String] = {
      skipWs()
      if (eof || !isWordChar(peek)) return None
      var e = pos
      while (e < s.length && isWordChar(s.charAt(e))) e += 1
      Some(s.substring(pos, e))
    }

    private def eatWord(): String = {
      val w = peekWord().getOrElse(
        throw SurroundParseException("expected a term", pos))
      pos += w.length
      w
    }

    private def kw(w: String, k: String): Boolean =
      w.equalsIgnoreCase(k)

    def parseOr(): SNode = {
      var acc = parseAnd()
      var more = true
      while (more) {
        peekWord() match {
          case Some(w) if kw(w, "OR") =>
            pos += w.length
            val rhs = parseAnd()
            acc = acc match {
              case SOrB(cs) => SOrB(cs :+ rhs)
              case a => SOrB(Seq(a, rhs))
            }
          case _ => more = false
        }
      }
      acc
    }

    def parseAnd(): SNode = {
      var acc = parseNot()
      var more = true
      while (more) {
        peekWord() match {
          case Some(w) if kw(w, "AND") =>
            pos += w.length
            val rhs = parseNot()
            acc = acc match {
              case SAnd(cs) => SAnd(cs :+ rhs)
              case a => SAnd(Seq(a, rhs))
            }
          case _ => more = false
        }
      }
      acc
    }

    def parseNot(): SNode = {
      var acc = parseNear()
      var more = true
      while (more) {
        peekWord() match {
          case Some(w) if kw(w, "NOT") =>
            pos += w.length
            acc = SNotB(acc, parseNear())
          case _ => more = false
        }
      }
      acc
    }

    /** Distance chains bind tighter than the boolean keywords, and W binds
      * tighter than N (the reference's NQuery/WQuery production nesting:
      * `a 2W b 3N c` == 3N(2W(a, b), c)). A chain of SAME-op links becomes
      * ONE n-ary SpanNear (DistanceQuery's list form — the reference also
      * requires one operator per infix list); mixing distances within one
      * level is rejected, like the reference's "all operators the same"
      * check.
      */
    def parseNear(): SNode = parseDist(ordered = false,
      () => parseDist(ordered = true, () => parsePrimary()))

    private def parseDist(ordered: Boolean, sub: () => SNode): SNode = {
      val first = sub()
      var members = Vector(first)
      var opDist = -1
      var more = true
      while (more) {
        peekWord() match {
          case Some(DistOp(d, o)) if o.equalsIgnoreCase(if (ordered) "w" else "n") =>
            pos += (d + o).length
            val dist = if (d.isEmpty) 1 else d.toInt
            if (opDist >= 0 && dist != opDist) {
              throw SurroundParseException(
                "mixed distances in one chain", pos)
            }
            opDist = dist
            members :+= sub()
          case _ => more = false
        }
      }
      if (members.length == 1) first
      else {
        val spans = members.map {
          case SSpan(n) => n
          case _ => throw SurroundParseException(
            "boolean subquery inside a distance operator", pos)
        }
        SSpan(SpanNode.SNear(spans, slop = opDist - 1, ordered = ordered))
      }
    }

    def parsePrimary(): SNode = {
      skipWs()
      if (eof) throw SurroundParseException("unexpected end of query", pos)
      if (peek == '(') { pos += 1; val e = parseOr(); expect(')'); return e }
      val w = eatWord()
      skipWs()
      // prefix operator form: OR(a, b) / AND(a, b) / 3W(a, b) / N(a, b)
      if (!eof && peek == '(') {
        pos += 1
        val args = Seq.newBuilder[SNode]
        args += parseOr()
        skipWs()
        while (!eof && peek == ',') { pos += 1; args += parseOr(); skipWs() }
        expect(')')
        val as = args.result()
        w match {
          case _ if kw(w, "OR") => return SOrB(as)
          case _ if kw(w, "AND") => return SAnd(as)
          case DistOp(d, o) =>
            val dist = if (d.isEmpty) 1 else d.toInt
            val spans = as.map {
              case SSpan(n) => n
              case _ => throw SurroundParseException(
                "boolean subquery inside a distance operator", pos)
            }
            return SSpan(SpanNode.SNear(spans, slop = dist - 1,
              ordered = o.equalsIgnoreCase("w")))
          case _ => throw SurroundParseException(s"unknown operator $w", pos)
        }
      }
      SSpan(SpanNode.term(w.toLowerCase(java.util.Locale.ROOT)))
    }

    private def expect(c: Char): Unit = {
      skipWs()
      if (eof || peek != c) throw SurroundParseException(s"expected '$c'", pos)
      pos += 1
    }
  }
}
