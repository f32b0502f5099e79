package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Solr's ML streaming expressions — the train() / features() surface
  * [B solr/core/src/java/org/apache/solr/client/solrj/io/stream/TextLogitStream.java;
  * solr/core/src/java/org/apache/solr/handler/sql — the parallel-ML side of
  * the streaming API]: iterative model fitting WHERE THE DATA LIVES, with
  * only the O(features) model crossing the wire per iteration. Solr runs
  * one scoring pass per shard per iteration and folds the partial
  * gradients on the coordinator; the Spark-native shape is identical —
  * each iteration is ONE distributed aggregate (map-side partial sums) and
  * the weight vector is driver-resident, which is exactly the bounded
  * driver state the reference design prescribes. Nothing here collects
  * rows; at 100 TB each iteration is a full scan + a 4-double reduce.
  */
object MlOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Batch-gradient-descent logistic regression, the train() stream's
    * algorithm (TextLogitStream runs parallel iterative BGD over the
    * collection): label y = (lang = 'en'), features x = (1, n_chars/1000,
    * len(source)/10), learning rate 0.5, `iters` full-batch steps from a
    * zero weight vector (deterministic — no sampling, no shuffling of
    * example order; FP sum order across partitions is absorbed by the
    * 6-digit presentation rounding). Emits one row per iteration with the
    * post-step weights and the training mean squared residual, like the
    * reference's per-iteration model tuples. The oracle unrolls the same
    * three steps as chained SQL aggregates over identical arithmetic.
    */
  def trainLogReg(spark: SparkSession, sfDir: String,
      iters: Int = 3, lr: Double = 0.5): DataFrame = {
    import spark.implicits._
    val f = docs(spark, sfDir).select(
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      lit(1.0).as("x0"),
      (col("n_chars") / 1000.0).as("x1"),
      (length(col("source")) / 10.0).as("x2"))
    var w = Array(0.0, 0.0, 0.0)
    val rows = (1 to iters).map { it =>
      val p = lit(1.0) / (lit(1.0) +
        exp(-(lit(w(0)) * col("x0") + lit(w(1)) * col("x1") + lit(w(2)) * col("x2"))))
      val r = f.agg(
        avg((col("y") - p) * col("x0")),
        avg((col("y") - p) * col("x1")),
        avg((col("y") - p) * col("x2")),
        avg((col("y") - p) * (col("y") - p))).head()
      w = Array(w(0) + lr * r.getDouble(0), w(1) + lr * r.getDouble(1),
        w(2) + lr * r.getDouble(2))
      (it, w(0), w(1), w(2), r.getDouble(3))
    }
    rows.toDF("iter", "w0", "w1", "w2", "mse")
      .select(col("iter"),
        round(col("w0"), 6).as("w0"), round(col("w1"), 6).as("w1"),
        round(col("w2"), 6).as("w2"), round(col("mse"), 6).as("mse"))
      .orderBy(asc("iter"))
  }

  /** The single-iteration gradient aggregate, unexecuted — what every
    * train() step runs; exposed for the plan audit (the driver loop in
    * [[trainLogReg]] collects each step eagerly, so its returned frame is
    * a LocalTableScan of the weight rows, not this).
    */
  def trainIterationPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val f = docs(spark, sfDir).select(
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      lit(1.0).as("x0"),
      (col("n_chars") / 1000.0).as("x1"),
      (length(col("source")) / 10.0).as("x2"))
    val p = lit(1.0) / (lit(1.0) + exp(-(lit(0.1) * col("x0") +
      lit(0.1) * col("x1") + lit(0.1) * col("x2"))))
    f.agg(
      avg((col("y") - p) * col("x0")),
      avg((col("y") - p) * col("x1")),
      avg((col("y") - p) * col("x2")),
      avg((col("y") - p) * (col("y") - p)))
  }

  /** featuresSelection() — Solr's information-gain term selection
    * [B solr/core/src/java/org/apache/solr/client/solrj/io/stream/FeaturesSelectionStream.java;
    * solr/core/src/java/org/apache/solr/handler/IGainTermsQParserPlugin.java]:
    * rank every term by the information gain its presence/absence carries
    * about the label (lang = 'en'), the feature-selection pass that feeds
    * train(). IG(t) = H(y) − P(t)·H(y|t) − P(¬t)·H(y|¬t), natural-log
    * entropies. One distinct (doc, term) aggregate gives per-term
    * present/positive counts; the label prior is a scalar broadcast — the
    * corpus shuffles term-cardinality rows once, nothing else.
    */
  def featuresIg(spark: SparkSession, sfDir: String, topN: Int = 8): DataFrame = {
    val d = docs(spark, sfDir).select(col("doc_id"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      col("text"))
    val perTerm = d
      .select(col("doc_id"), col("y"),
        explode(array_distinct(TextOps.tokensCol(col("text")))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_t"), sum(col("y")).as("pos_t"))
    val totals = d.agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    // H(p) with the 0·ln0 = 0 convention
    def h(p: org.apache.spark.sql.Column) = {
      val q = lit(1.0) - p
      -(when(p > 0, p * log(p)).otherwise(0.0) +
        when(q > 0, q * log(q)).otherwise(0.0))
    }
    perTerm.crossJoin(broadcast(totals))
      .withColumn("p_t", col("n_t").cast("double") / col("n"))
      .withColumn("ig", round(
        h(col("pos").cast("double") / col("n")) -
          col("p_t") * h(col("pos_t") / col("n_t")) -
          // a term present in EVERY doc has no absent side (guards 0/0)
          when(col("n_t") < col("n"), (lit(1.0) - col("p_t")) *
            h((col("pos") - col("pos_t")) / (col("n") - col("n_t"))))
            .otherwise(0.0), 6))
      .select(col("term"), col("n_t"), col("ig"))
      .orderBy(desc("ig"), asc("term"))
      .limit(topN)
  }

  /** Oracle for [[featuresIg]] — identical IG arithmetic over the same
    * distinct (doc, term) relation. The guarded-entropy macro keeps the
    * 0·ln0 = 0 convention in both engines.
    */
  def featuresIgOracleSql(topN: Int = 8): String = {
    def h(p: String) =
      s"""(-(CASE WHEN ($p) > 0 THEN ($p) * ln($p) ELSE 0 END
         |   + CASE WHEN (1 - ($p)) > 0 THEN (1 - ($p)) * ln(1 - ($p)) ELSE 0 END))""".stripMargin
    s"""WITH dt AS (SELECT DISTINCT d.doc_id,
       |  CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y, t.term
       |  FROM documents d,
       |  unnest(list_filter(string_split_regex(lower(d.text), '[^a-z0-9_]+'),
       |         x -> x <> '')) AS t(term)),
       |pt AS (SELECT term, count(*) AS n_t, sum(y) AS pos_t FROM dt GROUP BY term),
       |tot AS (SELECT count(*) AS n,
       |        sum(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) AS pos
       |        FROM documents)
       |SELECT term, n_t, round(
       |  ${h("pos * 1.0 / n")}
       |  - (n_t * 1.0 / n) * ${h("pos_t * 1.0 / n_t")}
       |  - CASE WHEN n_t < n THEN
       |      (1 - n_t * 1.0 / n) * ${h("(pos - pos_t) / (n - n_t)")}
       |    ELSE 0 END, 6) AS ig
       |FROM pt, tot ORDER BY ig DESC, term LIMIT $topN""".stripMargin
  }

  /** predict() / update(model) — score documents with the train()ed model
    * [B solr/core/src/java/org/apache/solr/client/solrj/io/eval/... the
    * streaming-expression model-application side of TextLogitStream]:
    * the 3-iteration BGD weights (driver-resident, O(features)) applied as
    * a pure map over the corpus — probability = sigmoid(w·x) — then top-N
    * by probability. No shuffle except the final top-k; at 100 TB this is
    * scan + codegen'd arithmetic + TakeOrdered.
    */
  def predictLogReg(spark: SparkSession, sfDir: String,
      iters: Int = 3, lr: Double = 0.5, topN: Int = 10): DataFrame = {
    import spark.implicits._
    val f = docs(spark, sfDir).select(col("doc_id").as("did"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      lit(1.0).as("x0"),
      (col("n_chars") / 1000.0).as("x1"),
      (length(col("source")) / 10.0).as("x2"))
    var w = Array(0.0, 0.0, 0.0)
    (1 to iters).foreach { _ =>
      val p = lit(1.0) / (lit(1.0) +
        exp(-(lit(w(0)) * col("x0") + lit(w(1)) * col("x1") + lit(w(2)) * col("x2"))))
      val r = f.agg(
        avg((col("y") - p) * col("x0")),
        avg((col("y") - p) * col("x1")),
        avg((col("y") - p) * col("x2"))).head()
      w = Array(w(0) + lr * r.getDouble(0), w(1) + lr * r.getDouble(1),
        w(2) + lr * r.getDouble(2))
    }
    val p = lit(1.0) / (lit(1.0) +
      exp(-(lit(w(0)) * col("x0") + lit(w(1)) * col("x1") + lit(w(2)) * col("x2"))))
    f.select(col("did").as("doc_id"), round(p, 6).as("prob"))
      .orderBy(desc("prob"), asc("doc_id"))
      .limit(topN)
  }

  /** Oracle for [[predictLogReg]]: the w3 weights from the train() oracle
    * applied per doc.
    */
  def predictLogRegOracleSql(lr: Double = 0.5, topN: Int = 10): String = {
    def sig(w0: String, w1: String, w2: String) =
      s"1.0 / (1.0 + exp(-($w0 * x0 + $w1 * x1 + $w2 * x2)))"
    val s1 = sig("0.0", "0.0", "0.0")
    val s2 = sig("w1.w0", "w1.w1", "w1.w2")
    val s3 = sig("w2.w0", "w2.w1", "w2.w2")
    s"""WITH f AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |  1.0 AS x0, n_chars / 1000.0 AS x1, length(source) / 10.0 AS x2
       |  FROM documents),
       |w1 AS (SELECT $lr * avg((y - $s1) * x0) AS w0,
       |              $lr * avg((y - $s1) * x1) AS w1,
       |              $lr * avg((y - $s1) * x2) AS w2 FROM f),
       |w2 AS (SELECT max(w1.w0) + $lr * avg((y - $s2) * x0) AS w0,
       |              max(w1.w1) + $lr * avg((y - $s2) * x1) AS w1,
       |              max(w1.w2) + $lr * avg((y - $s2) * x2) AS w2 FROM f, w1),
       |w3 AS (SELECT max(w2.w0) + $lr * avg((y - $s3) * x0) AS w0,
       |              max(w2.w1) + $lr * avg((y - $s3) * x1) AS w1,
       |              max(w2.w2) + $lr * avg((y - $s3) * x2) AS w2 FROM f, w2)
       |SELECT doc_id, round(1.0 / (1.0 + exp(-(w3.w0 * x0 + w3.w1 * x1 + w3.w2 * x2))), 6) AS prob
       |FROM f, w3 ORDER BY prob DESC, doc_id LIMIT $topN""".stripMargin
  }

  /** Oracle for [[trainLogReg]]: the three BGD steps unrolled as chained
    * scalar-aggregate CTEs (w_k folds the k-th gradient into w_{k-1});
    * the MSE reported for step k is the residual under the PRE-step
    * weights, exactly like the engine's loop.
    */
  def trainLogRegOracleSql(iters: Int = 3, lr: Double = 0.5): String = {
    require(iters == 3, "oracle is unrolled for 3 iterations")
    def sig(w0: String, w1: String, w2: String) =
      s"1.0 / (1.0 + exp(-($w0 * x0 + $w1 * x1 + $w2 * x2)))"
    val s1 = sig("0.0", "0.0", "0.0")
    val s2 = sig("w1.w0", "w1.w1", "w1.w2")
    val s3 = sig("w2.w0", "w2.w1", "w2.w2")
    s"""WITH f AS (SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |  1.0 AS x0, n_chars / 1000.0 AS x1, length(source) / 10.0 AS x2
       |  FROM documents),
       |w1 AS (SELECT $lr * avg((y - $s1) * x0) AS w0,
       |              $lr * avg((y - $s1) * x1) AS w1,
       |              $lr * avg((y - $s1) * x2) AS w2,
       |              avg((y - $s1) * (y - $s1)) AS mse FROM f),
       |w2 AS (SELECT max(w1.w0) + $lr * avg((y - $s2) * x0) AS w0,
       |              max(w1.w1) + $lr * avg((y - $s2) * x1) AS w1,
       |              max(w1.w2) + $lr * avg((y - $s2) * x2) AS w2,
       |              avg((y - $s2) * (y - $s2)) AS mse FROM f, w1),
       |w3 AS (SELECT max(w2.w0) + $lr * avg((y - $s3) * x0) AS w0,
       |              max(w2.w1) + $lr * avg((y - $s3) * x1) AS w1,
       |              max(w2.w2) + $lr * avg((y - $s3) * x2) AS w2,
       |              avg((y - $s3) * (y - $s3)) AS mse FROM f, w2)
       |SELECT iter, round(w0, 6) AS w0, round(w1, 6) AS w1,
       |       round(w2, 6) AS w2, round(mse, 6) AS mse FROM (
       |  SELECT 1 AS iter, w0, w1, w2, mse FROM w1
       |  UNION ALL SELECT 2, w0, w1, w2, mse FROM w2
       |  UNION ALL SELECT 3, w0, w1, w2, mse FROM w3)
       |ORDER BY iter""".stripMargin
  }
}
