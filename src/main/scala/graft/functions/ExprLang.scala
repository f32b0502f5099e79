package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lucene expressions module re-expressed on Catalyst
  * [B lucene/expressions/src/java/org/apache/lucene/expressions/js/JavascriptCompiler.java,
  * lucene/expressions/src/java/org/apache/lucene/expressions/Expression.java,
  * SimpleBindings.java]:
  * Lucene compiles a JS-like scoring expression string to JVM bytecode
  * over DoubleValuesSource bindings. Spark already HAS a compiling
  * expression engine — Catalyst + whole-stage codegen — so the module
  * reduces to a FRONT-END: parse the same grammar subset and lower each
  * node to a `Column`; Tungsten does the bytecode. Supported, matching
  * the reference grammar's arithmetic core: `+ - * / %`, unary minus,
  * parentheses, numeric literals, comparisons (`< <= > >= == !=`), the
  * ternary `?:`, and the function library
  * sqrt/ln/log10/log2/exp/abs/min/max/pow/floor/ceil. As in the
  * reference, every value is a double — comparisons yield 1.0/0.0 and
  * the ternary treats nonzero as true. Variables resolve through
  * caller-supplied bindings (e.g. `_score`, numeric doc-value columns) —
  * Lucene's SimpleBindings contract.
  */
object ExprLang {

  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"$msg at offset $pos")

  // ---- tokenizer -----------------------------------------------------
  private sealed trait Tok { def pos: Int }
  private case class TNum(v: Double, pos: Int) extends Tok
  private case class TIdent(s: String, pos: Int) extends Tok
  private case class TOp(s: String, pos: Int) extends Tok
  private case class TEnd(pos: Int) extends Tok

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && src(i + 1).isDigit)) {
        val start = i
        while (i < n && (src(i).isDigit || src(i) == '.')) i += 1
        // exponent part (1e-3)
        if (i < n && (src(i) == 'e' || src(i) == 'E')) {
          i += 1
          if (i < n && (src(i) == '+' || src(i) == '-')) i += 1
          while (i < n && src(i).isDigit) i += 1
        }
        out += TNum(src.substring(start, i).toDouble, start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        out += TIdent(src.substring(start, i), start)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (Set("<=", ">=", "==", "!=").contains(two)) {
          out += TOp(two, i); i += 2
        } else if ("+-*/%()<>?:,".indexOf(c) >= 0) {
          out += TOp(c.toString, i); i += 1
        } else throw ParseError(s"unexpected character '$c'", i)
      }
    }
    out += TEnd(n)
    out.result()
  }

  private val Fns1: Map[String, Column => Column] = Map(
    "sqrt" -> sqrt, "ln" -> log, "log10" -> log10, "log2" -> log2,
    "exp" -> exp, "abs" -> abs, "floor" -> floor, "ceil" -> ceil)
  private val Fns2: Map[String, (Column, Column) => Column] = Map(
    "min" -> ((a: Column, b: Column) => least(a, b)),
    "max" -> ((a: Column, b: Column) => greatest(a, b)),
    "pow" -> ((a: Column, b: Column) => pow(a, b)))

  /** Compile `src` against variable `bindings` (each cast to double). */
  def compile(src: String, bindings: Map[String, Column]): Column = {
    val toks = lex(src)
    var p = 0
    def peek: Tok = toks(p)
    def next(): Tok = { val t = toks(p); p += 1; t }
    def expectOp(s: String): Unit = next() match {
      case TOp(`s`, _) => ()
      case t => throw ParseError(s"expected '$s'", t.pos)
    }
    def boolToD(c: Column): Column = when(c, lit(1.0)).otherwise(lit(0.0))

    // ternary (lowest) > comparison > additive > multiplicative > unary > atom
    def ternary(): Column = {
      val cond = comparison()
      peek match {
        case TOp("?", _) =>
          next()
          val a = ternary()
          expectOp(":")
          val b = ternary()
          when(cond =!= 0.0, a).otherwise(b)
        case _ => cond
      }
    }
    def comparison(): Column = {
      var l = additive()
      var done = false
      while (!done) peek match {
        case TOp(op @ ("<" | "<=" | ">" | ">=" | "==" | "!="), _) =>
          next()
          val r = additive()
          l = boolToD(op match {
            case "<" => l < r
            case "<=" => l <= r
            case ">" => l > r
            case ">=" => l >= r
            case "==" => l === r
            case "!=" => l =!= r
          })
        case _ => done = true
      }
      l
    }
    def additive(): Column = {
      var l = multiplicative()
      var done = false
      while (!done) peek match {
        case TOp("+", _) => next(); l = l + multiplicative()
        case TOp("-", _) => next(); l = l - multiplicative()
        case _ => done = true
      }
      l
    }
    def multiplicative(): Column = {
      var l = unary()
      var done = false
      while (!done) peek match {
        case TOp("*", _) => next(); l = l * unary()
        case TOp("/", _) => next(); l = l / unary()
        case TOp("%", _) => next(); l = l % unary()
        case _ => done = true
      }
      l
    }
    def unary(): Column = peek match {
      case TOp("-", _) => next(); -unary()
      case _ => atom()
    }
    def atom(): Column = next() match {
      case TNum(v, _) => lit(v)
      case TOp("(", _) =>
        val e = ternary(); expectOp(")"); e
      case TIdent(name, pos) =>
        peek match {
          case TOp("(", _) =>
            next()
            val args = Vector.newBuilder[Column]
            peek match {
              case TOp(")", _) => ()
              case _ =>
                args += ternary()
                var more = true
                while (more) peek match {
                  case TOp(",", _) => next(); args += ternary()
                  case _ => more = false
                }
            }
            expectOp(")")
            val as = args.result()
            (Fns1.get(name), Fns2.get(name)) match {
              case (Some(f), _) if as.length == 1 => f(as(0))
              case (_, Some(f)) if as.length == 2 => f(as(0), as(1))
              case _ => throw ParseError(
                s"unknown function '$name'/${as.length}", pos)
            }
          case _ =>
            bindings.getOrElse(name,
              throw ParseError(s"unbound variable '$name'", pos))
              .cast("double")
        }
      case t => throw ParseError("expected a value", t.pos)
    }

    val result = ternary()
    peek match {
      case TEnd(_) => result
      case t => throw ParseError("trailing input", t.pos)
    }
  }
}
