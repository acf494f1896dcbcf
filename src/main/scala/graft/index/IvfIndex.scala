package graft.index

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

import graft.expressions.VectorMath

/**
 * IVF-flat — the partition-pruned alternative ANN scale path (the classic
 * inverted-file layout, re-expressed in Spark's storage model):
 *
 *  - **build**: k-means centroids (MLlib, fitted on a sample), then one
 *    pass assigning every row its nearest cell, written as parquet
 *    `PARTITIONED BY (ivf_cell)`. The "inverted lists" are parquet
 *    partitions — no custom storage.
 *  - **search**: nprobe nearest centroids are picked driver-side, and the
 *    query brute-forces only those cells. The `ivf_cell IN (…)` filter is a
 *    partition filter, so Spark never opens the other cells' files —
 *    inverted-list selection IS partition pruning, which is what survives a
 *    100 TB corpus (each cell is scanned distributed, TopN per cell,
 *    global merge via TakeOrderedAndProject).
 *
 * Complements the HNSW index: HNSW gives low-latency point queries over
 * executor-loadable segments; IVF gives fully-distributed search where the
 * corpus (not the index) is the thing that scales.
 */
object Ivf {

  private[graft] val CentroidFile = "_ivf_centroids.bin"

  /** Nearest-centroid cell id (argmin L2). Eval-only: runs once per row in
    * the build pass, not in a query hot loop. */
  private[graft] case class NearestCell(child: Expression, centroids: Array[Array[Float]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any = {
      val vec = v.asInstanceOf[ArrayData].toFloatArray()
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val d = VectorMath.l2Squared(vec, centroids(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  private[graft] def nearestCells(q: Array[Float], centroids: Array[Array[Float]], nprobe: Int): Seq[Int] =
    centroids.indices
      .map(c => (c, VectorMath.l2Squared(q, centroids(c))))
      .sortBy(_._2).take(nprobe).map(_._1)

  /** Per-row nprobe nearest cell ids, distance-ascending (index-ascending on
    * ties) — the query-side cell assignment of [[topKJoin]]. Eval-only: runs
    * once per query row, never over the corpus. */
  private[graft] case class NearestCells(child: Expression,
      centroids: Array[Array[Float]], nprobe: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val vec = v.asInstanceOf[ArrayData].toFloatArray()
      val cells = nearestCells(vec, centroids, nprobe)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(cells.toArray)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /**
   * Build the IVF layout at `outPath`: fit nCells k-means centroids on a
   * sample, assign cells, write parquet partitioned by `ivf_cell`, persist
   * the centroids alongside. Returns the centroids.
   */
  def build(df: DataFrame, vecCol: String, outPath: String, nCells: Int,
      sampleFraction: Double = 1.0, seed: Long = 42L): Array[Array[Float]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // NULL vectors have no cell and never enter an index — dropped here
    // like the HNSW and PQ builders (array_to_vector NPEs on null, and
    // the scan gates' oracles exclude null distances from every top-n).
    val nonNull = df.where(col(vecCol).isNotNull)
    val sample = (if (sampleFraction < 1.0) nonNull.sample(sampleFraction, seed)
      else nonNull)
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .fit(sample)
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    val cellExpr = Bridge.column(NearestCell(Bridge.expression(
      col(vecCol).cast("array<float>")), centroids))
    nonNull.withColumn("ivf_cell", cellExpr)
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(outPath)
    writeCentroids(new File(outPath, CentroidFile), centroids)
    centroids
  }

  /** Probe the nprobe nearest cells and return the layout's rows restricted
    * to them (partition-pruned scan); compose with orderBy(dist).limit(k). */
  def probe(spark: SparkSession, path: String, q: Array[Float], nprobe: Int): DataFrame = {
    val centroids = readCentroids(new File(path, CentroidFile))
    val cells = nearestCells(q, centroids, nprobe)
    spark.read.parquet(path).where(col("ivf_cell").isin(cells: _*))
  }

  /** Brute-force top-k over the probed cells: (row columns…, distance). */
  def topK(spark: SparkSession, path: String, vecCol: String, q: Array[Float],
      k: Int, nprobe: Int): DataFrame = {
    val qCol = graft.functions.lit_vector(q)
    probe(spark, path, q, nprobe)
      .withColumn("distance", graft.functions.array_distance(col(vecCol), qCol))
      .orderBy(col("distance"))
      .limit(k)
  }

  /**
   * Batch multi-query ANN over the IVF layout — the training-pipeline shape
   * ("enrich every example with its k nearest corpus rows"). For each query
   * row: the k nearest layout rows among its `nprobe` nearest cells
   * (exact when nprobe = nCells).
   *
   * 100 TB design: the QUERY side (small) is broadcast and exploded to
   * (query, cell) pairs; the equi-join on the parquet partition column
   * `ivf_cell` lets Spark's dynamic partition pruning skip every cell no
   * query probes — the corpus is never shuffled and unprobed files are
   * never opened. Per-query top-k runs through the bounded-heap
   * `min_by(v, d, k)` aggregate, whose map-side partial aggregation ships
   * at most k rows per (query, partition) into the shuffle — candidate
   * rows (|probed cells| × their sizes) never leave their scan tasks.
   *
   * Returns layout rows with `q_id`, `distance`, `rn` (1..k per query).
   */
  def topKJoin(spark: SparkSession, path: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nprobe: Int, tieCol: Option[String] = None): DataFrame = {
    val centroids = readCentroids(new File(path, CentroidFile))
    val np = math.min(nprobe, centroids.length)
    val cellsCol = Bridge.column(NearestCells(
      Bridge.expression(col("q_vec")), centroids, np))
    val q = queries
      .select(col(queryIdCol).as("q_id"), col(queryVecCol).cast("array<float>").as("q_vec"))
      .withColumn("ivf_cell", explode(cellsCol))
    val layout = spark.read.parquet(path)
    val layoutCols = layout.columns.toSeq
    // The internal names this plan introduces must not already exist on the
    // layout: withColumn("distance") would silently REPLACE a layout column
    // of that name (then the packed struct carries two 'distance' fields
    // and the fetch-back is ambiguous), and q_id/q_vec would collide with
    // the broadcast query side. Fail at call time with a clear message.
    val reserved = Seq("distance", "q_id", "q_vec") intersect layoutCols
    require(reserved.isEmpty,
      s"IVF layout column(s) ${reserved.mkString(", ")} collide with topKJoin's " +
        "internal names (distance, q_id, q_vec); rename them in the layout")
    // Value struct leads with (distance, tieCol…): the aggregate's
    // equal-distance tie-break compares the value lexicographically, so
    // results are deterministic and oracle-reproducible (ORDER BY d, tie).
    val ordered = tieCol.map(t => t +: layoutCols.filterNot(_ == t)).getOrElse(layoutCols)
    val packed = struct(col("distance") +: ordered.map(col): _*)
    layout.join(broadcast(q), "ivf_cell")
      .withColumn("distance",
        graft.functions.array_distance(col(vecCol), col("q_vec")).cast("double"))
      .groupBy(col("q_id"))
      .agg(graft.functions.min_by_k(packed, col("distance"), k).as("_top"))
      .select(col("q_id"), posexplode(col("_top")).as(Seq("_pos", "_v")))
      .select(col("q_id") +:
        layoutCols.map(c => col("_v").getField(c).as(c)) :+
        col("_v").getField("distance").as("distance") :+
        (col("_pos") + 1).cast("int").as("rn"): _*)
  }

  private[graft] def writeCentroids(f: File, cs: Array[Array[Float]]): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f)))
    try {
      out.writeInt(cs.length)
      out.writeInt(if (cs.isEmpty) 0 else cs(0).length)
      cs.foreach(_.foreach(out.writeFloat))
    } finally out.close()
  }

  private[graft] def readCentroids(f: File): Array[Array[Float]] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f)))
    try {
      val n = in.readInt()
      val dim = in.readInt()
      Array.fill(n)(Array.fill(dim)(in.readFloat()))
    } finally in.close()
  }
}
