package graft

import org.apache.spark.sql.functions._

import graft.embedding.Cluster

/**
 * Scale-envelope test for [[graft.embedding.Cluster.kmeansAssign]]: 100k
 * 64-dim vectors planted on k=32 well-separated centers — group g puts
 * ~1.0 in dims g and (g+1) % 64, zero elsewhere, with a ±0.05 per-row
 * jitter that stays INSIDE the int8 quantization range (1.0·64 = 64 ± 3
 * after rounding, nowhere near the ±127 clamp), so in-group vectors are
 * genuinely distinct after quantization and the centroid averaging,
 * truncating division and tiebreak all do real work. Groups use disjoint
 * active dimensions, so recovery must still be exact: every vector lands
 * on its planted center, populations are exactly n/k, and the assignment
 * is identical under a different partitioning — the determinism contract
 * at 100k rows.
 */
class ClusterSlowSpec extends SparkSuite {
  import spark.implicits._

  test("100k planted vectors, k=32: exact recovery, deterministic") {
    val n = 100000
    val k = 32
    val dim = 64
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      org.apache.spark.sql.functions.expr(
        s"""transform(sequence(0, ${dim - 1}), d ->
              CAST(CASE WHEN d = CAST(id % $k AS INT) THEN 1.0 + (id % 11 - 5) * 0.01
                        WHEN d = CAST((id % $k + 1) % $dim AS INT) THEN 1.0 - (id % 7 - 3) * 0.01
                        ELSE 0.0 END AS FLOAT))""").as("embedding"))
    val assigned = Cluster.kmeansAssign(vecs, "embedding", "vec_id", k = k,
      iters = 2)
    // Planted center recovery: all rows sharing id % k must share a
    // cluster, and distinct planted groups must map to distinct clusters.
    val m = assigned
      .groupBy((col("vec_id") % k).as("planted"))
      .agg(countDistinct(col("cluster")).as("nc"), count(lit(1)).as("n"),
        min(col("cluster")).as("c"))
      .collect()
    assert(m.length == k)
    assert(m.forall(_.getLong(1) == 1L), "each planted group -> one cluster")
    assert(m.forall(_.getLong(2) == n.toLong / k))
    assert(m.map(_.getInt(3)).distinct.length == k, "clusters distinct")
    // Determinism under partitioning: per-cluster id checksums match.
    def sums(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      Cluster.kmeansAssign(df, "embedding", "vec_id", k = k, iters = 2)
        .groupBy(col("cluster")).agg(sum(col("vec_id")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sums(vecs.repartition(13)) == sums(vecs.repartition(3)))
  }
}
