package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{array_cosine_similarity, array_distance, array_inner_product, max_by_k, min_by_k}

/**
 * Brute-force k-NN similarity join/match — the Spark re-expression of the
 * reference's `vss_join` / `vss_match` table macros
 * (/root/reference/src/hnsw/hnsw_index_macros.cpp:9-74).
 *
 * Scale design: the cross product is aggregated per left row with the
 * bounded-heap [[graft.aggregates.MinMaxByK]] aggregate, so map-side partial
 * aggregation ships at most k candidates per (left row, partition) — no
 * global sort, no full-window shuffle. Catalyst/AQE picks broadcast
 * nested-loop automatically when one side is small; callers can hint with
 * `broadcast(right)`.
 */
object Vss {

  private case class Metric(score: (Column, Column) => Column, smallestIsBest: Boolean)

  private def metricOf(name: String): Metric = name match {
    case "l2sq" | "l2" => Metric(array_distance, smallestIsBest = true)
    case "cosine" | "cos" => Metric(array_cosine_similarity, smallestIsBest = false)
    case "ip" => Metric(array_inner_product, smallestIsBest = false)
    case other => throw new IllegalArgumentException(s"Unknown metric: $other")
  }

  private def topK(value: Column, order: Column, k: Int, smallestIsBest: Boolean): Column =
    if (smallestIsBest) min_by_k(value, order, k) else max_by_k(value, order, k)

  /**
   * For every row of `left`, the k best rows of `right` by vector score.
   * Output: (score DOUBLE, left_tbl STRUCT<left.*>, right_tbl STRUCT<right.*>),
   * best score first within each left row — mirroring `vss_join`.
   *
   * `leftKey` names a unique left column used to group the cross product;
   * when None a synthetic id is attached (deterministic for deterministic
   * inputs, but task retries can reassign ids mid-job — callers with a
   * stable key should pass it, mirroring the reference's rowid grouping).
   */
  def vssJoin(left: DataFrame, right: DataFrame, leftCol: String, rightCol: String,
      k: Int, metric: String = "l2sq", leftKey: Option[String] = None): DataFrame = {
    val m = metricOf(metric)
    val scored = left
      .select(struct(col("*")).as("left_tbl"))
      .withColumn("_lid", leftKey.map(kc => col("left_tbl").getField(kc))
        .getOrElse(monotonically_increasing_id()))
      .crossJoin(right.select(struct(col("*")).as("right_tbl")))
      .withColumn("_score", m.score(col("left_tbl").getField(leftCol), col("right_tbl").getField(rightCol)))
    scored
      .groupBy(col("_lid"))
      .agg(
        first(col("left_tbl")).as("left_tbl"),
        topK(struct(col("_score"), col("right_tbl")), col("_score"), k, m.smallestIsBest).as("_matches"))
      .select(col("left_tbl"), explode(col("_matches")).as("_m"))
      .select(col("_m._score").as("score"), col("left_tbl"), col("_m.right_tbl").as("right_tbl"))
  }

  /**
   * Lateral top-k join: for every `outer` row, the k nearest `inner` rows —
   * the Spark surface of `FROM outer, LATERAL (SELECT ... FROM inner ORDER
   * BY dist LIMIT k)` (/root/reference/src/hnsw/hnsw_optimize_join.cpp:
   * 352-363). Output: outer.*, inner.*, `dist` DOUBLE, `rn` INT (1-indexed,
   * best first), like the reference join's row_number output.
   *
   * `outerKey` must uniquely identify outer rows (lateral semantics). The
   * plan is the canonical Filter(rn<=k, Window(row_number over dist)) shape,
   * so when an HNSW index exists on `inner`'s vector column the
   * LateralTopKToIndexJoin rule swaps in the index join automatically;
   * without one it runs as a brute-force cross product + window.
   */
  def lateralTopK(outer: DataFrame, inner: DataFrame, outerCol: String, innerCol: String,
      outerKey: String, k: Int, metric: String = "l2sq"): DataFrame = {
    val dist = metric match {
      case "l2sq" | "l2" => array_distance(outer(outerCol), inner(innerCol))
      case "cosine" | "cos" => graft.functions.array_cosine_distance(outer(outerCol), inner(innerCol))
      case "ip" => graft.functions.array_negative_inner_product(outer(outerCol), inner(innerCol))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(outer(outerKey)).orderBy(col("dist").asc)
    val df = outer.crossJoin(inner)
      .withColumn("dist", dist)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
    // Tag the row_number Window so LateralTopKToIndexJoin may fire: the
    // rewrite is only sound when window groups are exactly outer rows, which
    // this API's outerKey-uniqueness contract guarantees but no plan shape
    // can prove (see the rule's scaladoc). First Window in pre-order is the
    // one built above — outer/inner sub-plans sit below it.
    var tagged = false
    df.queryExecution.analyzed.foreach {
      case win: org.apache.spark.sql.catalyst.plans.logical.Window if !tagged =>
        win.setTagValue(graft.rules.LateralTopKToIndexJoin.PerRowWindowTag, true)
        tagged = true
      case _ => ()
    }
    df
  }

  /**
   * Index-backed per-row ANN enrichment: `df.*` plus
   * `(neighbor_id, distance, rn)` for the k nearest index entries to each
   * row's `queryCol` vector — [[graft.plans.HnswIndexJoinCore]] planted
   * directly, no window shape needed. Because the exec is a stateless
   * per-partition map over executor-cached segments, this works on
   * STREAMING DataFrames too (stream-static ANN join — `lateralTopK`'s
   * row_number window cannot exist on a stream), micro-batch rows enriched
   * as they arrive. NULL query vectors produce no output rows.
   */
  def annTopK(df: DataFrame, indexName: String, queryCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{DoubleType, LongType}
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = df.sparkSession
    val base = graft.Hnsw.baseDir(spark)
    val meta = graft.index.IndexCatalog.load(base, indexName)
    val queryExpr = Bridge.expression(df(queryCol))
    val extra = Seq(
      AttributeReference("neighbor_id", LongType, nullable = false)(),
      AttributeReference("distance", DoubleType, nullable = false)(),
      AttributeReference("rn", LongType, nullable = false)())
    val core = graft.plans.HnswIndexJoinCore(
      df.queryExecution.analyzed, base, meta, queryExpr, k,
      graft.Hnsw.efSearch(spark, meta), extra)
    Bridge.ofRows(spark, core)
  }

  /**
   * Correlated variant: `left.*` plus a `matches` column of
   * LIST<STRUCT<score DOUBLE, row STRUCT<right.*>>> (best first) —
   * mirroring `FROM left, vss_match(right, left_col, right_col, k)`.
   */
  def vssMatch(left: DataFrame, right: DataFrame, leftCol: String, rightCol: String,
      k: Int, metric: String = "l2sq", leftKey: Option[String] = None): DataFrame = {
    val m = metricOf(metric)
    val leftCols = left.columns
    val scored = left
      .select(struct(col("*")).as("_left"))
      .withColumn("_lid", leftKey.map(kc => col("_left").getField(kc))
        .getOrElse(monotonically_increasing_id()))
      .crossJoin(right.select(struct(col("*")).as("row")))
      .withColumn("score", m.score(col("_left").getField(leftCol), col("row").getField(rightCol)))
    val agged = scored
      .groupBy(col("_lid"))
      .agg(
        first(col("_left")).as("_left"),
        topK(struct(col("score"), col("row")), col("score"), k, m.smallestIsBest).as("matches"))
    agged.select(leftCols.map(c => col(s"_left.$c")) :+ col("matches"): _*)
  }
}
