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
}
