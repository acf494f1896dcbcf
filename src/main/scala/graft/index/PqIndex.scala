package graft.index

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

import graft.expressions.VectorMath

/**
 * Product quantization (Jégou, Douze, Schmid: "Product Quantization for
 * Nearest Neighbor Search", TPAMI 2011) over the IVF layout — the
 * memory-scale ANN path for when even one cell's RAW vectors are too big
 * to scan comfortably: a D-dim float vector (4·D bytes) becomes `m` byte
 * codes (one per D/m-dim subspace, each quantized to its own `ksub`-entry
 * codebook), a 4·D/m compression (32x at D=64, m=8).
 *
 * Spark-first shape:
 *  - **train**: codebooks fit driver-side on a bounded sample (the
 *    standard practice — faiss trains on ~10^5-10^6 samples regardless of
 *    corpus size) with seeded Lloyd iterations; a few KB of state.
 *  - **encode**: one build-pass expression per corpus row (argmin per
 *    subspace), exactly like the IVF cell assignment.
 *  - **search (ADC)**: per query, an m×ksub lookup table of exact
 *    sub-distances is computed driver-side; the corpus-side approximate
 *    distance is `m` table lookups per row through a whole-stage-codegen
 *    expression over the CODE column only — column pruning means the scan
 *    never reads the raw vectors. The exact re-rank step fetches raw
 *    vectors for the ≤ refine·k ADC survivors via a broadcast semi-join.
 *
 * 100 TB posture: inverted lists are parquet partitions (partition-pruned
 * by nprobe, as in [[Ivf]]), the hot scan touches 1/32nd of the bytes, and
 * nothing corpus-sized ever reaches the driver or a shuffle — the ADC
 * top-(refine·k) runs through TakeOrderedAndProject, the re-rank over a
 * broadcast id set.
 */
object Pq {

  private val CodebookFile = "_pq_codebooks.bin"

  /** Bounded-batch contract for [[topKJoin]]: 64k queries × ~2 KB ADC
    * table ≈ 128 MB of broadcast state — the executor-memory ceiling the
    * scaladoc promises. Larger query sets shard and union. */
  private[graft] val MaxQueryBatch = 65536

  /** centroids(mi)(c) is the `dsub`-dim centroid c of subspace mi. */
  case class Codebooks(m: Int, ksub: Int, dsub: Int,
      centroids: Array[Array[Array[Float]]]) {
    def dim: Int = m * dsub
  }

  // ---- training (driver-side, bounded sample) ----

  /** Seeded Lloyd k-means on `points` (all `dsub`-dim); k clamped to the
    * number of distinct points available. */
  private def lloyd(points: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val n = points.length
    val kk = math.min(k, n)
    // seeded distinct-index init
    val init = rnd.shuffle((0 until n).toVector).take(kk)
    val cents = init.map(i => points(i).clone).toArray
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          val d = VectorMath.l2Squared(points(i), cents(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](points(0).length))
      val counts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val s = sums(assign(i))
        val p = points(i)
        var j = 0
        while (j < p.length) { s(j) += p(j); j += 1 }
        counts(assign(i)) += 1
        i += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var j = 0
          while (j < cents(c).length) {
            cents(c)(j) = (sums(c)(j) / counts(c)).toFloat
            j += 1
          }
        } // empty cluster keeps its previous centroid
        c += 1
      }
      it += 1
    }
    cents
  }

  /**
   * Uniform, layout-independent training sample: the `sampleRows` smallest
   * rows by xxhash64 of the vector values. `.limit(n)` alone takes the
   * FIRST partitions in encounter order — on a clustered/sorted layout the
   * codebooks would fit a biased slice (round-7 verdict). Hash order is a
   * pseudo-random permutation of the corpus independent of file layout, so
   * top-n-by-hash IS a uniform sample over DISTINCT VALUES (faiss trains
   * on a random subset for the same reason). Physically a
   * TakeOrderedAndProject: a bounded n-row heap per partition, one merge
   * of the partials — no full sort, nothing corpus-sized collected.
   */
  private[graft] def trainingSample(df: DataFrame, vecCol: String,
      sampleRows: Int, idCol: Option[String] = None): Array[Array[Float]] = {
    // Hash of the VALUE alone ranks all copies of a duplicated vector as
    // one block — a heavily-duplicated vector whose hash lands low floods
    // the whole sample (codebooks collapse toward it). With a row-unique
    // id the hash salts per ROW, giving the proportional representation a
    // true row sample has, still deterministic and layout-independent.
    // Without one, value-hash order is the best layout-independent device
    // available — callers with known heavy duplication should pass idCol.
    val order = idCol match {
      case Some(id) => xxhash64(col(id), col("_v"))
      case None => xxhash64(col("_v"))
    }
    df.select(idCol.map(col).toSeq :+ col(vecCol).cast("array<float>").as("_v"): _*)
      .where(col("_v").isNotNull)
      .orderBy(order)
      .limit(sampleRows)
      .select(col("_v"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
  }

  /**
   * Fit per-subspace codebooks on a driver-collected hash-uniform sample of
   * up to `sampleRows` vectors. `dim % m == 0` required (equal subspaces).
   */
  def train(df: DataFrame, vecCol: String, m: Int, ksub: Int = 256,
      sampleRows: Int = 50000, iters: Int = 15, seed: Long = 42L,
      idCol: Option[String] = None): Codebooks = {
    val sample = trainingSample(df, vecCol, sampleRows, idCol)
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample(0).length
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m")
    val dsub = dim / m
    val centroids = Array.tabulate(m) { mi =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, mi * dsub, (mi + 1) * dsub))
      lloyd(sub, ksub, iters, seed + mi)
    }
    Codebooks(m, centroids(0).length, dsub, centroids)
  }

  // ---- encode (build pass) ----

  /** Per-row PQ code: argmin centroid per subspace. Build-time only
    * (CodegenFallback like the IVF cell assignment). */
  private[graft] case class PqEncode(child: Expression, cb: Codebooks)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val vec = v.asInstanceOf[ArrayData].toFloatArray()
      require(vec.length == cb.dim,
        s"vector dim ${vec.length} != codebook dim ${cb.dim}")
      val codes = new Array[Byte](cb.m)
      var mi = 0
      while (mi < cb.m) {
        val off = mi * cb.dsub
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cb.ksub) {
          val cent = cb.centroids(mi)(c)
          var d = 0.0
          var j = 0
          while (j < cb.dsub) {
            val diff = vec(off + j).toDouble - cent(j)
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(mi) = best.toByte
        mi += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def encodeCol(vec: Column, cb: Codebooks): Column =
    Bridge.column(PqEncode(Bridge.expression(vec.cast("array<float>")), cb))

  // ---- search (ADC) ----

  /** ADC lookup table for query `q`: flat m×ksub floats,
    * T(mi·ksub + c) = ||q_sub(mi) − centroid(mi)(c)||². */
  def lookupTable(q: Array[Float], cb: Codebooks): Array[Float] = {
    require(q.length == cb.dim, s"query dim ${q.length} != codebook dim ${cb.dim}")
    val t = new Array[Float](cb.m * cb.ksub)
    var mi = 0
    while (mi < cb.m) {
      val off = mi * cb.dsub
      var c = 0
      while (c < cb.ksub) {
        val cent = cb.centroids(mi)(c)
        var d = 0.0
        var j = 0
        while (j < cb.dsub) {
          val diff = q(off + j).toDouble - cent(j)
          d += diff * diff
          j += 1
        }
        t(mi * cb.ksub + c) = d.toFloat
        c += 1
      }
      mi += 1
    }
    t
  }

  /** Hot-path kernel: Σ_mi T(mi·ksub + code_mi) — m array lookups/row. */
  def adc(codes: ArrayData, table: Array[Float], ksub: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var mi = 0
    while (mi < m) {
      s += table(mi * ksub + (codes.getByte(mi) & 0xff))
      mi += 1
    }
    s
  }

  /** array_pq_adc(codes ARRAY<TINYINT>) -> DOUBLE with the query's table
    * bound as a codegen reference object (whole-stage-codegen hot path). */
  private[graft] case class PqAdcDistance(child: Expression, table: Array[Float], ksub: Int)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any =
      adc(v.asInstanceOf[ArrayData], table, ksub)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqTable", table, "float[]")
      defineCodeGen(ctx, ev, c => s"graft.index.Pq.adc($c, $ref, $ksub)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def adcCol(codes: Column, table: Array[Float], ksub: Int): Column =
    Bridge.column(PqAdcDistance(Bridge.expression(codes), table, ksub))

  // ---- IVF-PQ layout ----

  /**
   * [[Ivf.build]] plus a `pq_code` column: parquet partitioned by
   * `ivf_cell`, centroids + codebooks persisted alongside. One extra
   * build-pass expression; same single corpus pass.
   *
   * Sizing `m` (measured at 1M×64-dim clustered, FIXTURES.md F10): on
   * clustered embedding corpora most inter-vector variance is BETWEEN
   * clusters, so the sub-block codebooks spend their codes separating
   * clusters and top-k ranking quality rides on code granularity —
   * m=8 (8 B/vector) capped recall@10 at ~0.46 there while m=16 (16 B)
   * reached 0.94 with refine=64. Size m by intra-cluster variance, not
   * corpus size, and lean on the exact `refine` re-rank (refine·k ≪ cell
   * size) for the last mile; `nprobe` saturates early on clustered data
   * (≈2 in the F10 sweep), mirroring the HNSW routing result.
   */
  def buildIvfPq(df: DataFrame, vecCol: String, outPath: String, nCells: Int,
      m: Int, ksub: Int = 256, sampleFraction: Double = 1.0,
      seed: Long = 42L, idCol: Option[String] = None): Codebooks = {
    val cb = train(df, vecCol, m, ksub, seed = seed, idCol = idCol)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // NULL vectors never enter an index (the IvfIndex/Hnsw posture;
    // array_to_vector NPEs on null).
    val nonNull = df.where(col(vecCol).isNotNull)
    val sample = (if (sampleFraction < 1.0) nonNull.sample(sampleFraction, seed)
      else nonNull)
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .fit(sample)
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    val cellExpr = Bridge.column(Ivf.NearestCell(Bridge.expression(
      col(vecCol).cast("array<float>")), centroids))
    nonNull.withColumn("ivf_cell", cellExpr)
      .withColumn("pq_code", encodeCol(col(vecCol), cb))
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(outPath)
    Ivf.writeCentroids(new File(outPath, Ivf.CentroidFile), centroids)
    writeCodebooks(new File(outPath, CodebookFile), cb)
    cb
  }

  /**
   * IVF-PQ top-k: partition-pruned nprobe cells → ADC ordering over the
   * byte codes (vectors not read) → exact re-rank of the `refine`·k ADC
   * survivors (raw vectors fetched by a broadcast id semi-join).
   * Returns (idCol, distance), exact distances, ascending.
   */
  def topK(spark: SparkSession, path: String, vecCol: String, idCol: String,
      q: Array[Float], k: Int, nprobe: Int, refine: Int = 4): DataFrame = {
    val cb = readCodebooks(new File(path, CodebookFile))
    val table = lookupTable(q, cb)
    val probed = Ivf.probe(spark, path, q, nprobe)
    val candidates = probed
      .select(col(idCol), adcCol(col("pq_code"), table, cb.ksub).as("_adc"))
      .orderBy(col("_adc"), col(idCol))
      .limit(math.max(k, refine * k))
      .select(col(idCol))
    val qCol = graft.functions.lit_vector(q)
    probed.join(broadcast(candidates), Seq(idCol))
      .select(col(idCol),
        graft.functions.array_distance(col(vecCol), qCol).as("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }

  /** [[adc]] against the row's own query: table picked by `qIdx` from the
    * batch's table array (one codegen reference object for the batch). */
  private[graft] case class PqAdcIndexed(left: Expression, right: Expression,
      tables: Array[Array[Float]], ksub: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(codes: Any, qIdx: Any): Any =
      adc(codes.asInstanceOf[ArrayData], tables(qIdx.asInstanceOf[Int]), ksub)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqTables", tables, "float[][]")
      defineCodeGen(ctx, ev, (c, i) => s"graft.index.Pq.adc($c, $ref[$i], $ksub)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /**
   * Batch IVF-PQ ANN join — the training-pipeline shape over the
   * compressed codes: for each query row, the k nearest layout rows by
   * EXACT distance among the `refine`·k best ADC candidates of its
   * `nprobe` cells. Returns (q_id, idCol, distance, rn 1..k).
   *
   * The query batch is bounded by the same contract as [[Ivf.topKJoin]]'s
   * broadcast side (it must fit an executor); its vectors are collected
   * once to build the ADC tables (m·ksub floats ≈ 2 KB per query), which
   * ride into codegen as one reference object. The corpus side is never
   * shuffled: the `ivf_cell` equi-join partition-prunes, the ADC pass
   * reads only the code column, and per-query bounded heaps
   * (`min_by(k)`) ship at most refine·k candidate ids per partition.
   */
  def topKJoin(spark: SparkSession, path: String, vecCol: String, idCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nprobe: Int, refine: Int = 4): DataFrame = {
    val cb = readCodebooks(new File(path, CodebookFile))
    val ivfCents = Ivf.readCentroids(new File(path, Ivf.CentroidFile))
    val np = math.min(nprobe, ivfCents.length)
    // Enforce the bounded-batch contract instead of discovering it as a
    // driver OOM: each query costs an m·ksub-float ADC table (~2 KB at the
    // defaults) that must broadcast, so the cap is a product of the
    // contract, not a tuning knob. Same adaptive-limit device as
    // Dedup.ngramJaccardPairs' hot-gram cap: the limit returns cap+1 rows
    // only when the batch is over.
    val qRows = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol).cast("array<float>"))
      .limit(MaxQueryBatch + 1)
      .collect()
    require(qRows.length <= MaxQueryBatch,
      s"Pq.topKJoin query batch exceeds the bounded-batch contract " +
        s"($MaxQueryBatch rows): each query's ADC table rides to every " +
        s"executor, so an unbounded batch is a broadcast/driver blow-up. " +
        s"Shard the query table and union the per-shard results.")
    val tables = qRows.map(r => lookupTable(r.getSeq[Float](1).toArray, cb))
    import spark.implicits._
    val qCells = qRows.iterator.zipWithIndex.flatMap { case (r, qi) =>
      val vec = r.getSeq[Float](1).toArray
      Ivf.nearestCells(vec, ivfCents, np).map(c => (qi, r.getLong(0), c))
    }.toSeq.toDF("_qi", "q_id", "ivf_cell")
    val layout = spark.read.parquet(path)
    val adcExpr = Bridge.column(PqAdcIndexed(
      Bridge.expression(col("pq_code")), Bridge.expression(col("_qi")),
      tables, cb.ksub))
    val candidates = layout.join(broadcast(qCells), "ivf_cell")
      .withColumn("_adc", adcExpr)
      .groupBy(col("_qi"), col("q_id"))
      .agg(graft.functions.min_by_k(struct(col("_adc"), col(idCol).as("_cid")),
        col("_adc"), math.max(k, refine * k)).as("_top"))
      .select(col("_qi"), col("q_id"), explode(col("_top")).as("_v"))
      .select(col("_qi"), col("q_id"), col("_v._cid").as(idCol))
    // Exact re-rank: candidate ids (≤ |q|·refine·k) broadcast back against
    // the layout's raw vectors; distance via the per-query vector array.
    val qVecs = qRows.map(r => r.getSeq[Float](1).toArray)
    val distExpr = Bridge.column(PqExactDistance(
      Bridge.expression(col(vecCol).cast("array<float>")),
      Bridge.expression(col("_qi")), qVecs))
    layout.join(broadcast(candidates), Seq(idCol))
      .withColumn("_d", distExpr)
      .groupBy(col("q_id"))
      .agg(graft.functions.min_by_k(struct(col("_d"), col(idCol).as("_cid")),
        col("_d"), k).as("_top"))
      .select(col("q_id"), posexplode(col("_top")).as(Seq("_pos", "_v")))
      .select(col("q_id"), col("_v._cid").as(idCol),
        col("_v._d").as("distance"), (col("_pos") + 1).cast("int").as("rn"))
  }

  /** Exact distance to the row's own query vector (batch analogue of the
    * `array_distance(vec, lit_vector(q))` single-query spelling). */
  private[graft] case class PqExactDistance(left: Expression, right: Expression,
      qVecs: Array[Array[Float]])
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(vec: Any, qIdx: Any): Any = {
      val v = vec.asInstanceOf[ArrayData].toFloatArray()
      math.sqrt(VectorMath.l2Squared(v, qVecs(qIdx.asInstanceOf[Int])))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqQVecs", qVecs, "float[][]")
      defineCodeGen(ctx, ev, (c, i) =>
        s"java.lang.Math.sqrt(graft.expressions.VectorMath.l2Squared($c.toFloatArray(), $ref[$i]))")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ---- persistence ----

  private def writeCodebooks(f: File, cb: Codebooks): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f)))
    try {
      out.writeInt(cb.m); out.writeInt(cb.ksub); out.writeInt(cb.dsub)
      cb.centroids.foreach(_.foreach(_.foreach(out.writeFloat)))
    } finally out.close()
  }

  private[graft] def readCodebooks(f: File): Codebooks = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f)))
    try {
      val m = in.readInt(); val ksub = in.readInt(); val dsub = in.readInt()
      Codebooks(m, ksub, dsub,
        Array.fill(m)(Array.fill(ksub)(Array.fill(dsub)(in.readFloat()))))
    } finally in.close()
  }
}
