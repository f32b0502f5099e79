package graft.functions

import graft.QuerySpec
import graft.index.Index
import graft.search.QueryEngine
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions surface (SURVEY.md §7.2 M6 / §4 "custom Catalyst
  * needed?" row): a SQL-visible table-valued search relation so SQL users
  * query the inverted index directly —
  *
  *   SELECT * FROM graft_search('<indexDir>', 'merge sort', 10)
  *
  * (columns: qid, docId, score, repo, path, commit, lang, tokenCount).
  * Registered via `.withExtensions(new GraftExtensions)`, the
  * `spark.sql.extensions` conf, or attached to a live SparkContext with
  * `GraftExtensions.sessionFor(sc)`. Also registers the scalar graft_*
  * functions on session init.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectTableFunction((
      FunctionIdentifier("graft_search"),
      new ExpressionInfo("graft.functions.GraftExtensions", "graft_search"),
      (args: Seq[Expression]) => GraftExtensions.searchPlan(args)))
  }
}

object GraftExtensions {
  /** New session sharing the live SparkContext with the graft SQL surface
    * installed. The public builder only honors withExtensions when it
    * CREATES a session, so the default/active slots are cleared for the
    * call and restored right after — other sessions are untouched.
    */
  def sessionFor(sc: org.apache.spark.SparkContext): SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    GraftFunctions.register(s)
    s
  }

  /** graft_search(indexDir, queryText, k) -> the engine's scored plan.
    * The analysis-time expansion plays the role Lucene's Query.rewrite
    * plays — the unresolved relation becomes the concrete scored plan.
    * `queryText` is the full classic query language (QueryParser): fields,
    * '+'/'-'/AND/OR/NOT, '^'boosts, lang:x filters — lowered onto the
    * executable QuerySpec subset.
    */
  private[functions] def searchPlan(argExprs: Seq[Expression]): LogicalPlan = {
    require(argExprs.length == 3,
      "graft_search(indexDir string, query string, k int)")
    val args = argExprs.map(_.eval(null))
    val dir = args(0).asInstanceOf[UTF8String].toString
    val text = args(1).asInstanceOf[UTF8String].toString
    val k = args(2) match {
      case i: Int => i
      case l: Long => l.toInt
      case o => throw new IllegalArgumentException(s"k must be an int literal, got $o")
    }
    val spec = graft.search.QueryParser.parseToSpec(text, "sql", k)
    val spark = SparkSession.active
    val reader = Index.reader(spark, dir)
    QueryEngine.searchWithMeta(reader, Seq(spec)).queryExecution.analyzed
  }
}


