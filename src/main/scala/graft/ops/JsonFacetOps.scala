package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Solr JSON Facet API front-end
  * [B solr/core/src/java/org/apache/solr/search/facet/FacetRequest.java],
  * [B solr/core/src/java/org/apache/solr/search/facet/FacetParser.java]:
  * parse the `json.facet` request shape — terms facets with `field`,
  * `limit`, `sort` ("count desc" / "index asc" / "<stat> desc"), stat
  * facets ("avg(f)", "sum(f)", "min(f)", "max(f)", "unique(f)"), and
  * arbitrarily nested sub-facets — and lower it to ONE Catalyst
  * aggregation tree per facet level.
  *
  * Spark-first lowering, not a bucket-at-a-time evaluator:
  *   - a facet level = one hash aggregate grouped by the full bucket path
  *     (parent fields + this field) — map-side combined, one shuffle;
  *   - parent `limit` pruning = a left-semi join of the domain against the
  *     surviving parent buckets (broadcastable: bucket lists are
  *     limit-sized by contract);
  *   - nested limits = one window (row_number per parent bucket), never a
  *     per-bucket re-query — Solr's distributed facet refinement phase
  *     disappears because the shuffle is exact.
  * Output is the relational flattening of Solr's response tree: one row
  * per bucket, deeper bucket fields NULL on ancestor rows, stat columns
  * NULL where a level doesn't compute them.
  */
object JsonFacetOps {

  private val mapper = new ObjectMapper()

  /** One stat facet: Solr's AggValueSource strings
    * [B solr/core/src/java/org/apache/solr/search/facet/… (AggValueSource impls)].
    * Everything lands as DOUBLE so sibling levels union cleanly.
    */
  final case class StatAgg(name: String, fn: String, field: String) {
    def toCol: Column = (fn match {
      case "avg" => round(avg(col(field)), 4)
      case "sum" => round(sum(col(field)), 4)
      case "min" => min(col(field))
      case "max" => max(col(field))
      case "unique" => countDistinct(col(field))
      case other => throw new IllegalArgumentException(s"unsupported stat: $other")
    }).cast("double").as(name)
  }

  final case class TermsFacet(name: String, field: String, limit: Int,
      sortBy: String, sortAsc: Boolean, stats: Seq[StatAgg],
      sub: Seq[TermsFacet])

  private val StatRe = """(\w+)\((\w+)\)""".r

  /** Parse a json.facet request body: `{ "<name>": "<stat(field)>" | {terms...}, ... }`. */
  def parseFacets(json: String): (Seq[StatAgg], Seq[TermsFacet]) =
    parseLevel(mapper.readTree(json))

  private def parseLevel(node: JsonNode): (Seq[StatAgg], Seq[TermsFacet]) = {
    val stats = Seq.newBuilder[StatAgg]
    val subs = Seq.newBuilder[TermsFacet]
    node.properties().asScala.foreach { e =>
      val (name, v) = (e.getKey, e.getValue)
      if (v.isTextual) v.asText() match {
        case StatRe(fn, f) => stats += StatAgg(name, fn, f)
        case other => throw new IllegalArgumentException(s"bad stat facet: $other")
      } else {
        require(v.path("type").asText() == "terms",
          s"unsupported facet type: ${v.path("type").asText()}")
        val sortSpec = if (v.has("sort")) v.get("sort").asText() else "count desc"
        val parts = sortSpec.trim.split("\\s+")
        val (nStats, nSubs) =
          if (v.has("facet")) parseLevel(v.get("facet")) else (Nil, Nil)
        subs += TermsFacet(
          name = name,
          field = v.get("field").asText(),
          limit = if (v.has("limit")) v.get("limit").asInt() else 10,
          sortBy = parts(0),
          sortAsc = parts.length > 1 && parts(1) == "asc",
          stats = nStats, sub = nSubs)
      }
    }
    (stats.result(), subs.result())
  }

  /** Execute one top-level terms facet over `df`, flattened. */
  def executeFlat(df: DataFrame, top: TermsFacet): DataFrame = {
    val fieldsOrder = collectFields(top)
    val statNames = collectStats(top)

    def buckets(domain: DataFrame, f: TermsFacet,
        parentFields: Seq[String]): DataFrame = {
      val keys = (parentFields :+ f.field).map(col)
      val aggs = count(lit(1)).as("cnt") +: f.stats.map(_.toCol)
      val g = domain.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      val ord: Column = f.sortBy match {
        case "count" => if (f.sortAsc) asc("cnt") else desc("cnt")
        case "index" => if (f.sortAsc) asc(f.field) else desc(f.field)
        case stat => if (f.sortAsc) asc(stat) else desc(stat)
      }
      if (parentFields.isEmpty) g.orderBy(ord, asc(f.field)).limit(f.limit)
      else {
        val w = Window.partitionBy(parentFields.map(col): _*)
          .orderBy(ord, asc(f.field))
        g.withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= f.limit).drop("__rn")
      }
    }

    def rec(f: TermsFacet, parentFields: Seq[String],
        domain: DataFrame): DataFrame = {
      val b = buckets(domain, f, parentFields)
      val selfCols = parentFields :+ f.field
      val out = b.select(
        fieldsOrder.map(fl =>
          (if (selfCols.contains(fl)) col(fl)
           else lit(null).cast("string")).as(fl)) ++
          Seq(col("cnt")) ++
          statNames.map(sn =>
            (if (f.stats.exists(_.name == sn)) col(sn)
             else lit(null).cast("double")).as(sn)): _*)
      val children = f.sub.map { sf =>
        val dom = domain.join(b.select(selfCols.map(col): _*),
          selfCols, "left_semi")
        rec(sf, selfCols, dom)
      }
      children.foldLeft(out)(_ unionByName _)
    }

    rec(top, Nil, df).orderBy(
      fieldsOrder.map(f => asc_nulls_first(f)) :+ asc("cnt"): _*)
  }

  private def collectFields(f: TermsFacet): Seq[String] =
    f.field +: f.sub.flatMap(collectFields)

  private def collectStats(f: TermsFacet): Seq[String] =
    (f.stats.map(_.name) ++ f.sub.flatMap(collectStats)).distinct
}
