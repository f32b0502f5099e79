package graft.functions

import graft.core.{Analyzer, Bm25, SmallFloatUtil}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §7.2 M6 / §2.10): the engine's
  * scalar surface promoted into the optimizer so SQL users get the same
  * analysis + scoring primitives, and the hot arithmetic stays inside
  * whole-stage codegen.
  *
  *   graft_tokenize(text)            -> array<string>  (analysis chain)
  *   graft_norm_code(token_count)    -> int            (SmallFloat byte4, 0..255)
  *   graft_quantized_dl(token_count) -> int            (decode(encode(dl)))
  *   graft_bm25(tf, norm_code, df, doc_count, avgdl)  -> double
  *
  * graft_bm25 and the SmallFloat pair generate straight-line Java
  * (doGenCode); tokenization is a CodegenFallback (string scanning gains
  * nothing from codegen and the fallback keeps the surrounding stage
  * compiled).
  */
object GraftFunctions {

  /** Full analysis chain as an expression: tokenize + lowercase + stop. */
  case class GraftTokenize(child: Expression)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val terms = Analyzer.analyze(input.asInstanceOf[UTF8String].toString)
      new GenericArrayData(terms.map(UTF8String.fromString(_)))
    }
    override protected def withNewChildInternal(c: Expression): GraftTokenize = copy(c)
    override def prettyName: String = "graft_tokenize"
  }

  /** SmallFloat byte4 norm code of a doc length (0..255), codegen'd. */
  case class GraftNormCode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any =
      java.lang.Byte.toUnsignedInt(SmallFloatUtil.intToByte4(input.asInstanceOf[Int]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"java.lang.Byte.toUnsignedInt(graft.core.SmallFloatUtil$$.MODULE$$.intToByte4($c))")
    override protected def withNewChildInternal(c: Expression): GraftNormCode = copy(c)
    override def prettyName: String = "graft_norm_code"
  }

  /** Quantized doc length: byte4ToInt(intToByte4(dl)), codegen'd. */
  case class GraftQuantizedDl(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any =
      SmallFloatUtil.quantize(input.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.core.SmallFloatUtil$$.MODULE$$.quantize($c)")
    override protected def withNewChildInternal(c: Expression): GraftQuantizedDl = copy(c)
    override def prettyName: String = "graft_quantized_dl"
  }

  /** BM25 term score with the full Lucene-8 semantics
    * (idf(df, n) * tf / (tf + k1*(1-b+b*quantizedDl/avgdl))), generated as
    * straight-line Java with the 256-entry norm cache attached as a codegen
    * reference object — the whole scoring stays inside WholeStageCodegen.
    * df/docCount/avgdl are query constants (fold into literals upstream);
    * children are (tf: int, normCode: int).
    */
  case class GraftBm25(left: Expression, right: Expression,
      df: Long, docCount: Long, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75) extends BinaryExpression {
    private lazy val bm25 = Bm25(k1, b)
    private lazy val weight: Double = bm25.idf(df, docCount)
    private lazy val cache: Array[Double] = bm25.normCache(avgdl)

    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(tf: Any, normCode: Any): Any =
      bm25.score(weight, tf.asInstanceOf[Int],
        normCode.asInstanceOf[Int].toByte, cache)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cacheRef = ctx.addReferenceObj("graftNormCache", cache, "double[]")
      val w = weight
      nullSafeCodeGen(ctx, ev, (tf, nc) =>
        s"${ev.value} = $w * $tf / ($tf + $cacheRef[$nc & 0xFF]);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "graft_bm25"
  }

  // ---- Column API ----------------------------------------------------------

  def graft_tokenize(c: Column): Column =
    ExpressionUtils.column(GraftTokenize(ExpressionUtils.expression(c)))
  def graft_norm_code(c: Column): Column =
    ExpressionUtils.column(GraftNormCode(ExpressionUtils.expression(c)))
  def graft_quantized_dl(c: Column): Column =
    ExpressionUtils.column(GraftQuantizedDl(ExpressionUtils.expression(c)))
  def graft_bm25(tf: Column, normCode: Column, df: Long, docCount: Long,
      avgdl: Double): Column =
    ExpressionUtils.column(GraftBm25(ExpressionUtils.expression(tf),
      ExpressionUtils.expression(normCode), df, docCount, avgdl))

  // ---- SQL registration ----------------------------------------------------

  /** Register the functions for spark.sql text queries. graft_bm25 in SQL
    * takes literal df/doc_count/avgdl arguments (folded at parse time).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_tokenize",
      es => GraftTokenize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_norm_code",
      es => GraftNormCode(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_quantized_dl",
      es => GraftQuantizedDl(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bm25", {
      case Seq(tf, nc, df, n, avgdl) =>
        GraftBm25(tf, nc,
          foldLong(df, "df"), foldLong(n, "doc_count"), foldDouble(avgdl, "avgdl"))
      case other =>
        throw new IllegalArgumentException(
          s"graft_bm25(tf, norm_code, df, doc_count, avgdl): got ${other.size} args")
    }, "scala_udf")
  }

  private def foldLong(e: Expression, name: String): Long = e.eval(null) match {
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }
  private def foldDouble(e: Expression, name: String): Double = e.eval(null) match {
    case d: Double => d
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(s"$name must be a numeric literal, got $other")
  }
}
