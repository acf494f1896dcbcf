package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.index.Ivf

/**
 * IVF envelope test: 1M × FLOAT[8] clustered corpus — build (k-means on a
 * 5% sample + partitioned layout write), then a 1000-query batch ANN join.
 * Proves the batch path at the same 1M scale the HNSW slow test uses:
 * layout build stays distributed, the query side broadcasts, and every
 * query's own vector comes back at rank 1 (the self cell is always probed).
 */
class IvfSlowSpec extends SparkSuite {

  test("1M x FLOAT[8]: build layout, 1000-query batch topKJoin, self-hit at rank 1") {
    // 64 well-separated centers; deterministic sub-cluster jitter per id.
    // Jitter modulus is a prime > corpus size so every vector is unique
    // (ids share a vector only if congruent mod 1000003 AND mod 64).
    val corpus = spark.range(1000000L).select(col("id"),
      array((0 until 8).map { d =>
        ((col("id") % 64) * lit(if (d % 2 == 0) 3.0 else -3.0) +
          pmod(col("id") * 2654435761L + d, lit(1000003L)).cast("double") / 1000003.0)
          .cast("float")
      }: _*).as("vec"))
    val dir = Files.createTempDirectory("graft-ivf-slow").toFile.getAbsolutePath
    corpus.write.mode("overwrite").parquet(dir + "/src")
    val table = spark.read.parquet(dir + "/src")

    val t0 = System.nanoTime()
    Ivf.build(table, "vec", dir + "/layout", nCells = 64, sampleFraction = 0.05)
    info(f"IVF build over 1M rows: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val queries = table.where(col("id") % 1000 === 7) // 1000 spread queries
    val t1 = System.nanoTime()
    val top = Ivf.topKJoin(spark, dir + "/layout", "vec", queries, "id", "vec",
        k = 3, nprobe = 4, tieCol = Some("id"))
      .select(col("q_id").cast("long"), col("id"), col("rn"), col("distance"))
      .collect()
    info(f"batch topKJoin (1000 queries, nprobe 4/64): ${(System.nanoTime() - t1) / 1e9}%.1f s")

    assert(top.count(_.getInt(2) == 1) == 1000)
    // rank-1 is the query's own vector: distance exactly 0 and id == q_id
    // (jitter makes every vector unique).
    val rank1 = top.filter(_.getInt(2) == 1)
    assert(rank1.forall(r => r.getDouble(3) == 0.0 && r.getLong(1) == r.getLong(0)))
    // every query got a full k
    assert(top.length == 3000)
  }

  test("IVF-PQ envelope: 500k x FLOAT[16], batched ADC join, code-only scan") {
    import graft.index.Pq
    // Same planted-cluster construction at dim 16 (m=8 -> dsub=2).
    val corpus = spark.range(500000L).select(col("id"),
      array((0 until 16).map { d =>
        ((col("id") % 64) * lit(if (d % 2 == 0) 3.0 else -3.0) +
          pmod(col("id") * 2654435761L + d, lit(1000003L)).cast("double") / 1000003.0)
          .cast("float")
      }: _*).as("vec"))
    val dir = Files.createTempDirectory("graft-ivfpq-slow").toFile.getAbsolutePath
    corpus.write.mode("overwrite").parquet(dir + "/src")
    val table = spark.read.parquet(dir + "/src")

    val t0 = System.nanoTime()
    Pq.buildIvfPq(table, "vec", dir + "/layout", nCells = 64, m = 8, ksub = 64,
      sampleFraction = 0.05)
    info(f"IVF-PQ build over 500k rows: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val queries = table.where(col("id") % 1000 === 7)
      .select(col("id").as("q_id"), col("vec").as("q_vec"))
    val t1 = System.nanoTime()
    val batched = Pq.topKJoin(spark, dir + "/layout", "vec", "id",
      queries, "q_id", "q_vec", k = 3, nprobe = 4, refine = 8)
    val top = batched
      .select(col("q_id"), col("id"), col("rn"), col("distance")).collect()
    info(f"PQ batch topKJoin (500 queries, nprobe 4/64): ${(System.nanoTime() - t1) / 1e9}%.1f s")

    assert(top.length == 500 * 3)
    // ~7800 same-cluster vectors share (almost) one PQ code, so ADC cannot
    // rank WITHIN a cluster — what PQ promises here is routing: every
    // result must come from the query's own cluster (within-cluster
    // distance < 3; the nearest foreign cluster is >= 12 away), with the
    // exact re-rank distances ascending per query.
    top.foreach { r =>
      assert(r.getDouble(3) < 3.0,
        s"rank ${r.getInt(2)} for q=${r.getLong(0)} came from a foreign cluster " +
          s"(d=${r.getDouble(3)})")
    }
    top.groupBy(_.getLong(0)).values.foreach { rs =>
      val ds = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
    // The 32x-compression claim is real only if the ADC pass scans the CODE
    // column, not the raw vectors: the plan must contain a layout scan
    // whose read schema has pq_code and NOT vec.
    val scans = batched.queryExecution.executedPlan.toString
      .split("ReadSchema: ").drop(1).map(_.takeWhile(_ != '\n'))
    assert(scans.exists(s => s.contains("pq_code") && !s.contains("vec")),
      s"no code-only scan found in:\n${scans.mkString("\n")}")
  }
}
