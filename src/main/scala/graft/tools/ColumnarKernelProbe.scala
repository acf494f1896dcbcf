package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.vectorized.ColumnarBatch

/**
 * Timeboxed columnar-kernel spike for the decimal-scan family (r14 verdict
 * item 1): measure whether consuming the Parquet VECTORIZED reader's
 * ColumnarBatches directly — skipping ColumnarToRow + row-at-a-time
 * whole-stage codegen — closes the q7_ship_volume gap to DuckDB's SIMD
 * decimal scan.
 *
 * The q7 inner loop per surviving row is: timestamp range test, suppkey →
 * nationkey probe (broadcast dim), two double→cents conversions, one
 * 64-bit multiply-accumulate into a 50-slot (nation × year) grid. This
 * probe times
 *   A. the production gate (RelationalQueries "q7_ship_volume") as-is, and
 *   B. a hand-rolled kernel over `FileSourceScanExec.executeColumnar()`:
 *      same pushed range filter at the parquet level, then one tight loop
 *      per batch reading the four ColumnVectors positionally, probing an
 *      open-addressed long→int suppkey map, accumulating into per-partition
 *      long grids that reduce driver-side (50 rows).
 * and cross-checks B's sums/counts against A's output exactly.
 *
 * Usage: sbt "runMain graft.tools.ColumnarKernelProbe [sfDir] [reps]"
 */
object ColumnarKernelProbe {

  /** Minimal open-addressed long→int map (power-of-two, linear probe) —
    * suppkeys are non-dense (scale replicas multiply the key space), and
    * boxing a java.util.HashMap probe into the per-row loop would measure
    * the map, not the scan. */
  final class LongIntMap(capacityPow2: Int) extends Serializable {
    private val mask = capacityPow2 - 1
    private val keys = new Array[Long](capacityPow2)
    private val vals = new Array[Int](capacityPow2)
    private val used = new Array[Boolean](capacityPow2)
    def put(k: Long, v: Int): Unit = {
      var i = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      keys(i) = k; vals(i) = v; used(i) = true
    }
    def get(k: Long): Int = {
      var i = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
      while (used(i)) {
        if (keys(i) == k) return vals(i)
        i = (i + 1) & mask
      }
      -1
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize",
        sys.env.getOrElse("PROBE_BATCH", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- A: the production gate --------------------------------------
    def gateOnce(): (Double, Array[org.apache.spark.sql.Row]) = {
      val t0 = System.nanoTime()
      val rows = graft.queries.RelationalQueries
        .queries("q7_ship_volume")(spark, sfDir).collect()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    var gateBest = Double.MaxValue
    var gateRows: Array[org.apache.spark.sql.Row] = null
    for (_ <- 1 to reps) {
      val (s, r) = gateOnce()
      if (s < gateBest) { gateBest = s; gateRows = r }
      println(f"[gate] q7_ship_volume: $s%.3f s")
    }

    // --- B: the columnar kernel ---------------------------------------
    // suppkey -> nationkey (bounded dim, like the gate's broadcast).
    val supRows = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey")).collect()
    var cap = 64
    while (cap < supRows.length * 2) cap <<= 1
    val supMap = new LongIntMap(cap)
    supRows.foreach(r => supMap.put(r.getAs[Number](0).longValue(),
      r.getAs[Number](1).intValue()))
    val nations = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getAs[Number](0).intValue() -> r.getString(1)).toMap

    val lo = 788918400000000L  // 1995-01-01T00:00:00Z micros
    val mid = 820454400000000L // 1996-01-01
    val hi = 852076800000000L  // 1997-01-01

    // AQE off for this probe frame: executeColumnar on the materialized
    // scan leaf directly (AQE would wrap the plan in query stages).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val probeDf = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"),
        col("l_shipdate"))
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val scan = probeDf.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(sys.error("no FileSourceScanExec leaf"))
    require(scan.supportsColumnar, "vectorized reader not in effect")
    println(s"[kernel] scan: ${scan.metadata.getOrElse("PushedFilters", "?")}")
    val names = scan.output.map(_.name)
    val (iSup, iPrice, iDisc, iDate) = (names.indexOf("l_suppkey"),
      names.indexOf("l_extendedprice"), names.indexOf("l_discount"),
      names.indexOf("l_shipdate"))
    require(Seq(iSup, iPrice, iDisc, iDate).forall(_ >= 0), names.toString)

    val bcMap = spark.sparkContext.broadcast(supMap)
    val slots = 25 * 2
    def kernelOnce(): (Double, Array[Long], Array[Long]) = {
      val t0 = System.nanoTime()
      val (sums, counts) = scan.executeColumnar().mapPartitions { it =>
        val m = bcMap.value
        val sums = new Array[Long](slots)
        val counts = new Array[Long](slots)
        it.foreach { batch: ColumnarBatch =>
          val cSup = batch.column(iSup)
          val cPrice = batch.column(iPrice)
          val cDisc = batch.column(iDisc)
          val cDate = batch.column(iDate)
          val n = batch.numRows()
          var i = 0
          while (i < n) {
            if (!cDate.isNullAt(i)) {
              val ts = cDate.getLong(i)
              if (ts >= lo && ts < hi) {
                val nk = m.get(cSup.getLong(i))
                val pu = java.lang.Math.round(cPrice.getDouble(i) * 100.0)
                val du = java.lang.Math.round(cDisc.getDouble(i) * 100.0)
                val idx = nk * 2 + (if (ts < mid) 0 else 1)
                sums(idx) += pu * (100L - du)
                counts(idx) += 1L
              }
            }
            i += 1
          }
        }
        Iterator.single((sums, counts))
      }.reduce { (a, b) =>
        var i = 0
        while (i < slots) { a._1(i) += b._1(i); a._2(i) += b._2(i); i += 1 }
        a
      }
      ((System.nanoTime() - t0) / 1e9, sums, counts)
    }
    var kernelBest = Double.MaxValue
    var kSums: Array[Long] = null
    var kCounts: Array[Long] = null
    for (_ <- 1 to reps) {
      val (s, sm, ct) = kernelOnce()
      if (s < kernelBest) { kernelBest = s; kSums = sm; kCounts = ct }
      println(f"[kernel] columnar q7: $s%.3f s")
    }

    // --- cross-check ----------------------------------------------------
    val fromKernel = (0 until slots).flatMap { idx =>
      if (kCounts(idx) == 0) None
      else Some((nations(idx / 2), 1995 + idx % 2,
        BigDecimal(kSums(idx)) / 10000, kCounts(idx)))
    }.toSet
    val fromGate = gateRows.map(r => (r.getString(0), r.getInt(1),
      BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP),
      r.getLong(3))).toSet
    val matches = fromKernel.map { case (n, y, v, c) =>
      (n, y, v.setScale(4, BigDecimal.RoundingMode.HALF_UP), c)
    } == fromGate
    println(s"[check] kernel == gate rows: $matches " +
      s"(${fromKernel.size} groups)")
    val surv = kCounts.sum
    println(f"[result] gate=$gateBest%.3f s kernel=$kernelBest%.3f s " +
      f"ratio=${gateBest / kernelBest}%.2fx; surviving rows=$surv " +
      f"(${surv / kernelBest / 1e6}%.0f M rows/s through the kernel)")
    spark.stop()
  }
}
