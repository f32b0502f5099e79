package graft.functions

import graft.core.SmallFloatUtil
import graft.ops.DocSearchOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom Catalyst expression tests: interpreted vs codegen'd equality,
  * SQL registration, and the SQL-text BM25 path vs the Dataset engine path.
  */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-functions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("graft_norm_code / graft_quantized_dl match SmallFloatUtil, with codegen") {
    val df = spark.range(0, 3000).select(col("id").cast("int").as("n"))
    val got = df.select(col("n"),
      GraftFunctions.graft_norm_code(col("n")).as("code"),
      GraftFunctions.graft_quantized_dl(col("n")).as("q"))
      .collect()
    got.foreach { r =>
      val n = r.getInt(0)
      assert(r.getInt(1) == java.lang.Byte.toUnsignedInt(SmallFloatUtil.intToByte4(n)))
      assert(r.getInt(2) == SmallFloatUtil.quantize(n))
    }
    // whole-stage codegen actually applies to the projection ("*(" marker)
    val plan = df.select(GraftFunctions.graft_norm_code(col("n")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("graft_bm25 expression equals Bm25 core math") {
    import spark.implicits._
    val bm = graft.core.Bm25()
    val avgdl = 83.5
    val cache = bm.normCache(avgdl)
    val rows = for (tf <- 1 to 20; len <- Seq(1, 7, 8, 100, 5000)) yield
      (tf, java.lang.Byte.toUnsignedInt(SmallFloatUtil.intToByte4(len)))
    val df = rows.toDF("tf", "nc")
    val got = df.select(col("tf"), col("nc"),
      GraftFunctions.graft_bm25(col("tf"), col("nc"), 25L, 1000L, avgdl).as("s"))
      .collect()
    got.foreach { r =>
      val expected = bm.score(bm.idf(25L, 1000L), r.getInt(0), r.getInt(1).toByte, cache)
      assert(r.getDouble(2) == expected)
    }
  }

  test("SQL registration: graft_* usable from spark.sql text") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_tokenize('The Quick if brown_fox 42') AS toks,
        |graft_norm_code(300) AS nc,
        |graft_bm25(3, graft_norm_code(300), 10L, 100L, 50.0D) AS s""".stripMargin)
      .head()
    assert(row.getSeq[String](0) == Seq("quick", "brown_fox", "42"))
    assert(row.getInt(1) == java.lang.Byte.toUnsignedInt(SmallFloatUtil.intToByte4(300)))
    val bm = graft.core.Bm25()
    assert(row.getDouble(2) ==
      bm.score(bm.idf(10, 100), 3, SmallFloatUtil.intToByte4(300), bm.normCache(50.0)))
  }

  test("SQL-text BM25 path equals the Dataset engine path") {
    val sf = "/root/testdata/sf0.001"
    val viaSql = DocSearchOps.searchSqlExpr(spark, sf).collect()
    val viaEngine = DocSearchOps.searchTerm(spark, sf).collect()
    assert(viaSql.length == viaEngine.length && viaSql.nonEmpty)
    viaSql.zip(viaEngine).foreach { case (a, b) => assert(a == b) }
  }

  test("SQL table-valued graft_search via SparkSessionExtensions") {
    val sf = "/root/testdata/sf0.001"
    val reader = DocSearchOps.reader(spark, sf) // ensure index exists
    val ext = GraftExtensions.sessionFor(spark.sparkContext)
    val hits = ext.sql(
      s"SELECT path, score FROM graft_search('${reader.indexDir}', 'merge sort', 5) ORDER BY score DESC")
      .collect()
    assert(hits.length == 5)
    // equals the Dataset-path top-5 for the same disjunction
    val expected = DocSearchOps.searchDf(spark, sf,
      graft.QuerySpec("x", should = Seq("merge", "sort"), k = 5)).collect()
    assert(hits.map(_.getString(0).toLong).toSeq == expected.map(_.getLong(1)).toSeq)
    // MUST/MUST_NOT syntax parses and runs
    val andHits = ext.sql(
      s"SELECT count(*) FROM graft_search('${reader.indexDir}', '+stream +batch', 10)").head().getLong(0)
    assert(andHits > 0)
    // full query-language features through the TVF: boost + NOT + filter
    val parsed = ext.sql(
      s"""SELECT count(*) FROM graft_search('${reader.indexDir}',
         |  '+merge sort^2.5 -error lang:en', 10)""".stripMargin)
      .head().getLong(0)
    assert(parsed > 0)
    val boosted = ext.sql(
      s"SELECT docId FROM graft_search('${reader.indexDir}', 'merge sort^2.5', 10)")
      .collect().map(_.getLong(0)).toSeq
    val boostedExpected = DocSearchOps.searchDf(spark, sf,
      graft.QuerySpec("b", should = Seq("merge", "sort"),
        boosts = Map("sort" -> 2.5), k = 10)).collect().map(_.getLong(1)).toSeq
    assert(boosted.sorted == boostedExpected.sorted)
  }

  test("ExprLang: arithmetic, precedence, ternary, functions vs scala math") {
    import spark.implicits._
    val df = Seq((2.0, 5.0), (3.5, 0.0), (-1.0, 120.0)).toDF("x", "y")
    def eval(src: String): Seq[Double] =
      df.select(ExprLang.compile(src,
        Map("x" -> col("x"), "y" -> col("y"))).as("v"))
        .collect().map(_.getDouble(0)).toSeq
    val rows = Seq((2.0, 5.0), (3.5, 0.0), (-1.0, 120.0))
    // precedence: * binds over +, unary minus, parens
    assert(eval("x + 2 * y - 1") == rows.map { case (x, y) => x + 2 * y - 1 })
    assert(eval("-x * (y + 1)") == rows.map { case (x, y) => -x * (y + 1) })
    assert(eval("10 % 3 + x") == rows.map { case (x, _) => 10 % 3 + x })
    // functions (1- and 2-arg)
    assert(eval("sqrt(abs(x)) + max(x, y)") == rows.map { case (x, y) =>
      math.sqrt(math.abs(x)) + math.max(x, y) })
    assert(eval("pow(2, 3) + ln(1 + abs(y))") == rows.map { case (_, y) =>
      8.0 + math.log(1 + math.abs(y)) })
    // comparisons are 1.0/0.0 doubles; ternary takes nonzero as true —
    // the reference's all-doubles semantics
    assert(eval("x > 0") == rows.map { case (x, _) => if (x > 0) 1.0 else 0.0 })
    assert(eval("x > 0 ? y : -y") ==
      rows.map { case (x, y) => if (x > 0) y else -y })
    assert(eval("(x >= 2) + (y == 0)") == rows.map { case (x, y) =>
      (if (x >= 2) 1.0 else 0.0) + (if (y == 0) 1.0 else 0.0) })
    // scientific literals
    assert(eval("1e2 + x") == rows.map { case (x, _) => 100.0 + x })
    // parse errors: unbound variable, unknown function, trailing input
    intercept[ExprLang.ParseError](ExprLang.compile("z + 1", Map.empty))
    intercept[ExprLang.ParseError](
      ExprLang.compile("frob(1)", Map.empty))
    intercept[ExprLang.ParseError](
      ExprLang.compile("1 + 2 )", Map.empty))
  }

  test("functionExpression: expression re-rank equals hand-computed order") {
    val sf = "/root/testdata/sf0.001"
    val rows = DocSearchOps.functionExpression(spark, sf).collect()
    assert(rows.length == 10)
    // final_score must equal _score + 0.2*ln(1+tc) + (tc>120 ? 0.5 : 0)
    // recomputed from the engine's own pieces
    val meta = DocSearchOps.reader(spark, sf).docMeta
      .select(col("path").cast("long").as("doc_id"), col("tokenCount"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val tc = meta(r.getLong(1)).toDouble
      val want = r.getDouble(2) + 0.2 * math.log(1 + tc) +
        (if (tc > 120) 0.5 else 0.0)
      assert(math.abs(r.getDouble(3) - want) < 1e-3,
        s"doc ${r.getLong(1)}: ${r.getDouble(3)} vs $want")
    }
    // ranks strictly ordered by final_score desc
    val fins = rows.sortBy(_.getInt(0)).map(_.getDouble(3)).toSeq
    assert(fins == fins.sorted.reverse)
  }
}
