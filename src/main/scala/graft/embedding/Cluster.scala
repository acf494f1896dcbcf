package graft.embedding

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * Deterministic embedding clustering for corpus curation — the cluster
 * stage of SemDeDup-style semantic dedup and cluster-balanced sampling
 * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
 * through semantic deduplication"; the reference engine has no clustering
 * surface — this is part of the LLM-pipeline layer, like Mix/Dedup).
 *
 * == Why integer Lloyd ==
 *
 * Float k-means is not reproducible across engines or partitionings: the
 * centroid update is a distributed sum whose rounding depends on
 * accumulation order, and a last-ulp difference can flip a near-tie
 * assignment. Every selection operator in this library is a pure function
 * of its inputs (the Mix/Dedup determinism contract), so the clustering
 * is too: vectors are quantized to integers once (`round(x · 64)` clamped
 * to [−127, 127] — ·64 is a power of two, exact in float and double, and
 * `round` half-away-from-zero agrees across engines), distances are exact
 * int64 sums, the centroid update divides exact integer sums with
 * TRUNCATING division (Java `/`, DuckDB `//` — verified to agree on
 * negatives), argmin ties break to the smallest cluster id, and empty
 * clusters keep their previous centroid (the PqIndex convention). Every
 * step is order-free integer math → byte-identical results everywhere,
 * provable against a SQL oracle.
 *
 * == Scale shape ==
 *
 * Per iteration: one scan of the vectors (assignment is a per-row
 * expression against broadcast literal centroids) + one partial-aggregated
 * shuffle of k × dim per-partition sums — no row-level shuffle at all.
 * Driver state is k × dim longs. Iterations are fixed (curation wants a
 * budgeted pass, not convergence chasing). k is bounded by the literal
 * broadcast (guarded at 65536, same ceiling as Mix buckets).
 */
object Cluster {

  /** round-half-away-from-zero(x·scale) clamped to [−127, 127] — the
    * quantization both engines compute identically (·scale with a
    * power-of-two default is exact in double; DuckDB round() matches).
    * Non-finite input fails LOUDLY like every other contract violation
    * in this file: JVM rint(NaN) = 0 while SQL engines order/propagate
    * NaN differently, so a silent 0 would let the same corpus cluster
    * differently per engine — the exact divergence the all-integer
    * design exists to prevent. */
  private def quantizeValue(x: Double, scale: Int): Long = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new IllegalArgumentException(
        s"non-finite embedding component $x — clean or drop the vector " +
          "before clustering")
    val r = math.rint(x * scale) match {
      // rint is half-to-EVEN; engines round half AWAY — fix the halves.
      case v if math.abs(x * scale - math.floor(x * scale)) == 0.5 =>
        if (x > 0) math.floor(x * scale) + 1 else math.ceil(x * scale) - 1
      case v => v
    }
    math.max(-127L, math.min(127L, r.toLong))
  }

  /** Eval-only quantizer: float vector → long vector (one tight loop per
    * row; the HOF spelling — transform + round + clamp — paid interpreted
    * lambda machinery per ELEMENT and was measured 3 orders slower).
    * ExpectsInputTypes like every vector expression here: an
    * ARRAY<DOUBLE> input must fail analysis, not reinterpret bytes. */
  private[embedding] case class QuantizeVec(child: Expression, scale: Int)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val vec = v.asInstanceOf[ArrayData].toFloatArray()
      val out = new Array[Long](vec.length)
      var i = 0
      while (i < vec.length) { out(i) = quantizeValue(vec(i), scale); i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Eval-only fused quantize + nearest-centroid: float vector →
    * struct(cluster, dist2, q) — q is the quantized vector, emitted so the
    * iteration pass explodes it WITHOUT quantizing a second time (the
    * Generate sits above the projection that evaluates this expression
    * once per row). Exact integer math, first-minimum tiebreak. Centroids
    * ride in the expression (closure-serialized to executors — the
    * broadcast), not as a k × dim literal tree. */
  private[embedding] case class AssignCluster(child: Expression,
      centroids: Array[Array[Long]], scale: Int)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = StructType(Seq(
      StructField("cluster", IntegerType, nullable = false),
      StructField("dist2", LongType, nullable = false),
      StructField("q", ArrayType(LongType, containsNull = false), nullable = false)))
    override def nullSafeEval(v: Any): Any = {
      val vec = v.asInstanceOf[ArrayData].toFloatArray()
      val q = new Array[Long](vec.length)
      var i = 0
      while (i < vec.length) { q(i) = quantizeValue(vec(i), scale); i += 1 }
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        // The one-dimension contract is enforced, not assumed: a silent
        // min() here would turn a mixed-dim corpus into wrong clusters.
        if (q.length != cent.length) throw new IllegalArgumentException(
          s"kmeansAssign: vector dimension ${q.length} != centroid " +
            s"dimension ${cent.length} — all vectors must share one dimension")
        var d = 0L
        var j = 0
        while (j < q.length) { val t = q(j) - cent(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c } // strict < : ties → smallest c
        c += 1
      }
      InternalRow(best, bestD, new GenericArrayData(q))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Eval-only exact integer squared-L2 between two quantized vectors —
    * the pairwise predicate of [[semDedupDrop]] (one tight loop per pair;
    * the zip_with/aggregate HOF spelling pays interpreted lambda machinery
    * per element, same measurement as [[QuantizeVec]]'s note). Dimension
    * mismatch fails loudly like [[AssignCluster]]. */
  private[embedding] case class QuantDist2(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with ExpectsInputTypes with CodegenFallback {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val va = a.asInstanceOf[ArrayData].toLongArray()
      val vb = b.asInstanceOf[ArrayData].toLongArray()
      if (va.length != vb.length) throw new IllegalArgumentException(
        s"semDedupDrop: vector dimension ${va.length} != ${vb.length} — " +
          "all vectors must share one dimension")
      var d = 0L
      var i = 0
      while (i < va.length) { val t = va(i) - vb(i); d += t * t; i += 1 }
      d
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  private def quantCol(vecCol: String, scale: Int): Column =
    Bridge.column(QuantizeVec(Bridge.expression(col(vecCol)), scale))

  private def assignStruct(vecCol: String, cents: Array[Array[Long]],
      scale: Int): Column =
    Bridge.column(AssignCluster(Bridge.expression(col(vecCol)), cents, scale))

  /**
   * Deterministic integer-Lloyd k-means: `df` plus `cluster` (0-based) and
   * `dist2` — the exact squared integer distance to the assigned centroid.
   *
   * Initial centroids are the quantized vectors of the `k` smallest ids
   * (deterministic; if the input has fewer than `k` rows, k shrinks to
   * the row count). Rows with NULL vectors are excluded (they have no
   * position in any cluster). All vectors must share one dimension — the
   * contract every vss_* operator already has.
   */
  def kmeansAssign(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int = 3, quantScale: Int = 64): DataFrame = {
    require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(quantScale >= 1, s"quantScale must be >= 1, got $quantScale")
    val clash = df.columns.filter(c => c == "cluster" || c == "dist2" || c.startsWith("_km_"))
    require(clash.isEmpty,
      s"input columns [${clash.mkString(", ")}] collide with kmeansAssign " +
        "output ('cluster', 'dist2', '_km_*') — rename them first")
    assignClusters(df,
      fitCentroids(df, vecCol, idCol, k, iters, quantScale),
      vecCol, quantScale)
  }

  /**
   * The fit half of [[kmeansAssign]]: run the deterministic integer Lloyd
   * and return the final centroids (k × dim longs — a model small enough
   * to hold anywhere). Split out so the assignment can be applied where
   * the iterative fit cannot run — a Structured Streaming query assigns
   * clusters with [[assignClusters]] as a stateless per-row projection
   * over centroids fitted on a batch corpus.
   */
  def fitCentroids(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int = 3, quantScale: Int = 64): Array[Array[Long]] = {
    require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(quantScale >= 1, s"quantScale must be >= 1, got $quantScale")
    val base = df.where(col(vecCol).isNotNull)

    // The k x dim ceiling must be checked BEFORE any k-row collect — the
    // init collect below materializes k x dim boxed longs on the driver,
    // i.e. exactly the allocation the guard exists to refuse. Probe ONE
    // row for the dimension first. k-means REQUIRES uniform vector
    // dimensionality (centroid arithmetic is undefined otherwise), so on
    // VALID input any row's size IS the dimension; the init collect below
    // re-validates that assumption on the k rows it materializes, so a
    // heterogeneous input fails loud post-collect. The guard is therefore
    // best-effort against invalid input: a corpus whose probed row is
    // low-dim while the k smallest ids are huge can still oversize the
    // collect before the check fires — the exact pre-collect check would
    // cost a full agg(max(size)) scan per fit, which uniform-dim (the
    // operator's contract) does not justify.
    val dimProbe = base.select(size(col(vecCol)).as("_km_dim")).limit(1).collect()
    require(dimProbe.nonEmpty, "fitCentroids needs at least one non-null vector")
    val dim = dimProbe.head.getInt(0).toLong
    // The per-iteration collect is k x dim (cluster, dim, sum, count) Rows
    // — "driver state is k x dim longs" is only true if that product is
    // actually bounded. 2^24 (16.7M cells ≈ a few hundred MB of boxed
    // Rows transiently) is the ceiling: it admits 65536x256 or 16384x1024
    // but refuses the 65536x1024 shape that would collect ~67M Rows per
    // iteration and take the driver down.
    require(k * dim <= (1L << 24),
      s"k x dim must be <= ${1L << 24} (driver holds k x dim centroid " +
        s"sums per iteration); got $k x $dim")

    // Deterministic init: the k smallest ids' quantized vectors.
    val init: Array[Array[Long]] = base
      .orderBy(col(idCol))
      .select(quantCol(vecCol, quantScale).as("_km_q"))
      .limit(k)
      .collect()
      .map(_.getSeq[Long](0).toArray)
    require(init.nonEmpty, "fitCentroids needs at least one non-null vector")
    // Uniform-dimensionality check over the rows already in hand: catches
    // heterogeneous inputs deterministically (the one-row guard probe
    // above would otherwise pass or fail by scan order).
    init.find(_.length != dim).foreach { bad =>
      throw new IllegalArgumentException(
        s"fitCentroids requires uniform vector dimensionality: probed " +
          s"dim=$dim but an init vector has ${bad.length} elements")
    }
    var cents = init

    var it = 0
    while (it < iters) {
      // One pass: assignment + per-(cluster, dim) exact integer sums.
      // posexplode keeps the shuffle k x dim x partitions (partial agg),
      // never row-scaled.
      val sums = base
        .select(assignStruct(vecCol, cents, quantScale).as("_km_a"))
        .select(col("_km_a.cluster").as("_km_c"),
          posexplode(col("_km_a.q")).as(Seq("_km_d", "_km_v")))
        .groupBy(col("_km_c"), col("_km_d"))
        .agg(sum(col("_km_v")).as("_km_s"), count(lit(1)).as("_km_n"))
        .collect()
      val next = cents.map(_.clone()) // empty cluster keeps its centroid
      sums.foreach { r =>
        val c = r.getInt(0); val d = r.getInt(1)
        // Truncating division — matches DuckDB's `//` on negatives too.
        next(c)(d) = r.getLong(2) / r.getLong(3)
      }
      cents = next
      it += 1
    }
    cents
  }

  /** The apply half of [[kmeansAssign]]: `cluster` + `dist2` from given
    * centroids — a stateless per-row projection (streaming-safe; NULL
    * vectors are dropped, as in the fit). */
  def assignClusters(df: DataFrame, centroids: Array[Array[Long]],
      vecCol: String, quantScale: Int = 64): DataFrame = {
    require(centroids.nonEmpty, "assignClusters needs at least one centroid")
    val clash = df.columns.filter(c => c == "cluster" || c == "dist2" || c.startsWith("_km_"))
    require(clash.isEmpty,
      s"input columns [${clash.mkString(", ")}] collide with assignClusters " +
        "output ('cluster', 'dist2', '_km_*') — rename them first")
    df.where(col(vecCol).isNotNull)
      .withColumn("_km_a", assignStruct(vecCol, centroids, quantScale))
      .withColumn("cluster", col("_km_a.cluster"))
      .withColumn("dist2", col("_km_a.dist2"))
      .drop("_km_a")
  }

  /**
   * Cluster-balanced deterministic sample — the selection stage of
   * SemDeDup-style curation: cluster, then keep the first `perCluster`
   * rows of each cluster in md5(id) order (the library-wide deterministic
   * fill order). One bounded-heap aggregate per cluster
   * ([[graft.aggregates.MinMaxByK]]): the shuffle carries
   * O(k × perCluster) partials, never the corpus.
   */
  def clusterSample(df: DataFrame, vecCol: String, idCol: String, k: Int,
      perCluster: Int, iters: Int = 3, quantScale: Int = 64): DataFrame = {
    require(perCluster >= 1 && perCluster <= (1 << 20),
      s"perCluster must be in [1, ${1 << 20}], got $perCluster")
    val assigned = kmeansAssign(df, vecCol, idCol, k, iters, quantScale)
    val h = graft.text.TextFunctions.md5Hex(col(idCol).cast("string"))
    val kept = assigned
      .select(col("cluster"), col(idCol), h.as("_km_h"))
      .groupBy(col("cluster"))
      .agg(graft.functions.min_by_k(col(idCol),
        struct(col("_km_h"), col(idCol)), perCluster).as("_km_ids"))
      .select(explode(col("_km_ids")).as(idCol))
    assigned.join(kept, Seq(idCol))
      .select(df.columns.toIndexedSeq.map(col) :+ col("cluster"): _*)
  }

  /**
   * The SemDeDup PRUNE stage (Abbas et al. 2023 §3): cluster, then drop
   * every document whose embedding sits within `tau2` (exact integer
   * squared-L2 over the quantized vectors) of a LOWER-ID document in the
   * same cluster — the order-free "predecessor rule", the same
   * keep-first-by-id convention as [[graft.text.Dedup]]'s exact dedup.
   * (The paper keeps one random exemplar per ε-group via a greedy sweep;
   * the predecessor rule is its deterministic, join-expressible
   * counterpart: no sequential chain, every verdict is a pure function of
   * the pair set, so the DuckDB oracle replays it exactly. On a chain
   * a–b–c where only adjacent pairs are within τ it drops c where the
   * greedy sweep keeps it — strictly more conservative pruning.)
   *
   * Returns `df`'s KEPT rows (original columns). Rows with NULL vectors
   * have no cluster and are always kept.
   *
   * Scale shape: candidate pairs are confined to clusters — the published
   * SemDeDup recipe sizes k so clusters stay bounded (k ≈ n / target
   * cluster size), making the per-cluster quadratic a constant-sized
   * task; the cluster equi-join is one shuffle of (id, cluster, quantized
   * vector), and the verdict set is one distinct + anti-join.
   */
  def semDedupDrop(df: DataFrame, vecCol: String, idCol: String, k: Int,
      tau2: Long, iters: Int = 3, quantScale: Int = 64): DataFrame = {
    require(tau2 >= 0, s"tau2 must be non-negative, got $tau2")
    val clash = df.columns.filter(c => c == "cluster" || c.startsWith("_km_"))
    require(clash.isEmpty,
      s"input columns [${clash.mkString(", ")}] collide with semDedupDrop " +
        "internals ('cluster', '_km_*') — rename them first")
    // One fused AssignCluster evaluation per side: the struct's q field
    // IS the quantized vector (emitted for exactly this reuse), so the
    // pairwise stage never quantizes a second time.
    val cents = fitCentroids(df, vecCol, idCol, k, iters, quantScale)
    val a = df.where(col(vecCol).isNotNull)
      .select(col(idCol), assignStruct(vecCol, cents, quantScale).as("_km_a"))
      .select(col(idCol), col("_km_a.cluster").as("cluster"),
        col("_km_a.q").as("_km_q"))
    val x = a.select(col(idCol).as("_km_ida"), col("cluster"),
      col("_km_q").as("_km_qa"))
    val y = a.select(col(idCol).as("_km_idb"), col("cluster"),
      col("_km_q").as("_km_qb"))
    val dropped = x.join(y, "cluster")
      .where(col("_km_ida") < col("_km_idb") &&
        Bridge.column(QuantDist2(Bridge.expression(col("_km_qa")),
          Bridge.expression(col("_km_qb")))) <= tau2)
      .select(col("_km_idb").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }
}
