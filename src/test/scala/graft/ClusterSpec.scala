package graft

import org.apache.spark.sql.functions._

import graft.embedding.Cluster

/** Deterministic integer-Lloyd clustering + cluster-balanced sampling. */
class ClusterSpec extends SparkSuite {

  import spark.implicits._

  // Two well-separated blobs on a 4-dim grid: ids 1-10 near (1,1,0,0),
  // ids 11-20 near (-1,-1,0,0). Offsets are small enough that the blobs
  // never overlap after x64 quantization.
  private lazy val blobs = (1 to 20).map { i =>
    val s = if (i <= 10) 1.0f else -1.0f
    val eps = (i % 5) * 0.01f
    (i.toLong, Array(s + eps, s - eps, eps, -eps))
  }.toDF("vec_id", "embedding")

  test("kmeansAssign separates well-separated blobs deterministically") {
    val got = Cluster.kmeansAssign(blobs, "embedding", "vec_id", k = 2, iters = 3)
      .select($"vec_id", $"cluster", $"dist2").as[(Long, Int, Long)].collect()
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.size == 2)
    assert(byCluster.values.toSet == Set((1L to 10L).toSet, (11L to 20L).toSet))
    // pure function: identical on a rerun and under different partitioning
    val again = Cluster.kmeansAssign(blobs.repartition(7), "embedding", "vec_id",
      k = 2, iters = 3).select($"vec_id", $"cluster", $"dist2")
      .as[(Long, Int, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // dist2 is the exact integer distance to the assigned centroid (>= 0)
    assert(got.forall(_._3 >= 0L))
  }

  test("kmeansAssign: null vectors excluded, column clash rejected, k > n shrinks") {
    val withNull = blobs.union(Seq((99L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding"))
    val got = Cluster.kmeansAssign(withNull, "embedding", "vec_id", k = 2)
    assert(got.count() == 20 && !got.select("vec_id").as[Long].collect().contains(99L))
    intercept[IllegalArgumentException] {
      Cluster.kmeansAssign(blobs.withColumn("cluster", lit(1)), "embedding",
        "vec_id", k = 2)
    }
    // fewer rows than k: every row its own cluster seed, nothing lost
    val tiny = Cluster.kmeansAssign(blobs.limit(3), "embedding", "vec_id", k = 8)
    assert(tiny.count() == 3)
  }

  test("SQL surface: kmeans_assign / cluster_sample TVFs") {
    blobs.createOrReplaceTempView("blob_vecs")
    val viaSql = spark.sql(
      "SELECT vec_id, cluster, dist2 FROM kmeans_assign(TABLE(blob_vecs), " +
        "'embedding', 'vec_id', 2)").as[(Long, Int, Long)].collect().toSet
    val viaApi = Cluster.kmeansAssign(blobs, "embedding", "vec_id", k = 2)
      .select($"vec_id", $"cluster", $"dist2").as[(Long, Int, Long)].collect().toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)
    val sampled = spark.sql(
      "SELECT vec_id FROM cluster_sample(TABLE(blob_vecs), 'embedding', " +
        "'vec_id', 2, 3)").as[Long].collect().toSet
    val apiSampled = Cluster.clusterSample(blobs, "embedding", "vec_id", 2, 3)
      .select($"vec_id").as[Long].collect().toSet
    assert(sampled == apiSampled && sampled.size == 6)
  }

  test("randomized cross-check vs an in-memory reference Lloyd (with ties)") {
    // Plain-Scala reference of the same deterministic integer Lloyd; random
    // datasets with DELIBERATE duplicate vectors stress the tiebreaks and
    // the distributed partial aggregation in ways one fixture cannot.
    def refKmeans(vecs: Seq[(Long, Array[Float])], k: Int, iters: Int,
        scale: Int): Map[Long, (Int, Long)] = {
      def quant(v: Array[Float]): Array[Long] = v.map { x =>
        val d = x.toDouble * scale
        val r = if (math.abs(d - math.floor(d)) == 0.5)
          (if (x > 0) math.floor(d) + 1 else math.ceil(d) - 1)
        else math.rint(d)
        math.max(-127L, math.min(127L, r.toLong))
      }
      val q = vecs.sortBy(_._1).map { case (id, v) => (id, quant(v)) }
      var cents = q.take(k).map(_._2.map(identity)).toArray
      def assign(v: Array[Long]): (Int, Long) = {
        var best = 0; var bestD = Long.MaxValue
        for (c <- cents.indices) {
          var d = 0L
          for (j <- v.indices) { val t = v(j) - cents(c)(j); d += t * t }
          if (d < bestD) { bestD = d; best = c }
        }
        (best, bestD)
      }
      for (_ <- 0 until iters) {
        val byC = q.groupBy { case (_, v) => assign(v)._1 }
        cents = cents.zipWithIndex.map { case (old, c) =>
          byC.get(c) match {
            case Some(members) =>
              Array.tabulate(old.length)(j =>
                members.map(_._2(j)).sum / members.length)
            case None => old
          }
        }
      }
      q.map { case (id, v) => id -> assign(v) }.toMap
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 40 + rnd.nextInt(120)
      val dim = 2 + rnd.nextInt(6)
      val k = 2 + rnd.nextInt(4)
      val base = (1 to n).map(i =>
        (i.toLong, Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f)))
      // duplicate ~25% of vectors under fresh ids: exact distance ties
      val dups = base.filter(_._1 % 4 == 0)
        .map { case (id, v) => (id + 100000L, v.clone()) }
      val all = base ++ dups
      val expected = refKmeans(all, k, iters = 3, scale = 64)
      val got = Cluster.kmeansAssign(
          all.toDF("vec_id", "embedding").repartition(1 + rnd.nextInt(7)),
          "embedding", "vec_id", k = k, iters = 3)
        .select($"vec_id", $"cluster", $"dist2")
        .as[(Long, Int, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected, s"trial $trial n=$n dim=$dim k=$k")
    }
  }

  test("fit on batch, assign on a stream: stateless streaming projection") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // Fit once on the batch corpus; the model is k x dim longs.
    val cents = Cluster.fitCentroids(blobs, "embedding", "vec_id", k = 2)
    val batchAssign = Cluster.kmeansAssign(blobs, "embedding", "vec_id", k = 2)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    val mem = MemoryStream[(Long, Array[Float])]
    val assigned = Cluster.assignClusters(
      mem.toDF().toDF("vec_id", "embedding"), cents, "embedding")
    val query = assigned.writeStream.format("memory").queryName("stream_clusters")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt-km").toString)
      .start()
    try {
      val rows = blobs.select($"vec_id", $"embedding")
        .as[(Long, Array[Float])].collect()
      mem.addData(rows.take(10): _*)
      query.processAllAvailable()
      mem.addData(rows.drop(10): _*)
      query.processAllAvailable()
      val streamed = spark.table("stream_clusters")
        .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
      // per-row streaming assignment == the batch assignment, exactly
      assert(streamed == batchAssign && streamed.size == 20)
    } finally query.stop()
  }

  test("semDedupDrop: predecessor rule within clusters — drop iff a lower-id " +
      "vector is within tau2; null vectors always kept; chains prune conservatively") {
    // One tight blob (ids 1-4) and one far blob (ids 11-12), k=2. Within
    // the tight blob: 1-2 close, 2-3 close, 1-3 NOT close (a chain), 4
    // close to nothing. Quantized coords (x64): steps of 0.25 -> 16 units
    // -> adjacent d2 = 256, skip-one d2 = 1024.
    val rows = Seq(
      (1L, Array(1.00f, 1f, 0f, 0f)),
      (2L, Array(1.25f, 1f, 0f, 0f)),  // d2(1,2) = 256  <= tau2
      (3L, Array(1.50f, 1f, 0f, 0f)),  // d2(2,3) = 256, d2(1,3) = 1024 > tau2
      (4L, Array(3.00f, 3f, 0f, 0f)),  // far from everything in-cluster
      (11L, Array(-1.00f, -1f, 0f, 0f)),
      (12L, Array(-1.25f, -1f, 0f, 0f)), // d2 = 256 but to a LOWER id -> dropped
      (99L, null: Array[Float]))         // no vector -> always kept
      .toDF("vec_id", "embedding")
    val kept = Cluster.semDedupDrop(rows, "embedding", "vec_id",
        k = 2, tau2 = 600L, iters = 3)
      .select($"vec_id").as[Long].collect().sorted
    // 2 drops (pred 1); 3 drops (pred 2 — even though 2 itself dropped:
    // the predecessor rule is over ALL lower ids, not kept ones); 12
    // drops (pred 11); 1, 4, 11, 99 stay.
    assert(kept.sameElements(Array(1L, 4L, 11L, 99L)))
    // tau2 below the pair distance keeps everything.
    val all = Cluster.semDedupDrop(rows, "embedding", "vec_id",
        k = 2, tau2 = 100L, iters = 3)
      .select($"vec_id").as[Long].collect().sorted
    assert(all.sameElements(Array(1L, 2L, 3L, 4L, 11L, 12L, 99L)))
  }

  test("non-finite embedding components fail loudly (cross-engine NaN " +
      "divergence is the exact thing the integer design prevents)") {
    val bad = Seq((1L, Array(1.0f, Float.NaN)), (2L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception](
      Cluster.kmeansAssign(bad, "embedding", "vec_id", k = 1).collect())
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(8).map(x => Option(x.getMessage).getOrElse(""))
    assert(chain(e).exists(_.contains("non-finite embedding component")))
  }

  test("clusterSample keeps perCluster rows per cluster in md5(id) order") {
    val kept = Cluster.clusterSample(blobs, "embedding", "vec_id", k = 2,
      perCluster = 3).select($"vec_id").as[Long].collect().toSet
    assert(kept.size == 6)
    // the kept ids of each blob are its first 3 in md5-hash order — the
    // same deterministic fill order as Mix/deterministicSample
    val expect = (1 to 20).groupBy(_ <= 10).values.flatMap { ids =>
      ids.sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString).take(3)
    }.map(_.toLong).toSet
    assert(kept == expect)
    // pass-through contract: input columns + cluster
    val cols = Cluster.clusterSample(blobs, "embedding", "vec_id", 2, 3).columns
    assert(cols.toSeq == Seq("vec_id", "embedding", "cluster"))
  }
}
