package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.index.Ivf

/** IVF-flat layout: k-means cells as parquet partitions, search as a
  * partition-pruned brute-force TopN. */
class IvfSpec extends SparkSuite {

  private lazy val layout: String = {
    val out = Files.createTempDirectory("graft-ivf").toFile.getAbsolutePath + "/emb"
    val emb = spark.read.parquet(sf("0.01") + "/embeddings.parquet")
    val centroids = Ivf.build(emb, "embedding", out, nCells = 8)
    assert(centroids.length == 8 && centroids.head.length == 64)
    out
  }

  test("build writes one parquet partition per cell + centroid sidecar") {
    val dirs = new java.io.File(layout).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("ivf_cell=")).sorted
    assert(dirs.nonEmpty && dirs.length <= 8)
    assert(new java.io.File(layout, "_ivf_centroids.bin").isFile)
    val roundTrip = Ivf.readCentroids(new java.io.File(layout, "_ivf_centroids.bin"))
    assert(roundTrip.length == 8 && roundTrip.head.length == 64)
  }

  test("probe prunes partitions (PartitionFilters in the scan)") {
    val q = graft.queries.HnswQueries.QueryVec
    val probed = Ivf.probe(spark, layout, q, nprobe = 2)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_cell"), plan)
    // probing fewer cells reads fewer rows
    val all = spark.read.parquet(layout).count()
    assert(probed.count() < all)
  }

  test("topKJoin: batch ANN equals per-query brute force at nprobe=nCells; DPP prunes cells") {
    import spark.implicits._
    val emb = spark.read.parquet(sf("0.01") + "/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
    val got = Ivf.topKJoin(spark, layout, "embedding", queries, "vec_id", "embedding",
        k = 3, nprobe = 8, tieCol = Some("vec_id"))
      .select(col("q_id").cast("long"), col("vec_id"), col("rn"))
      .as[(Long, Long, Int)].collect().toSet
    // Brute force: window top-3 per query over the full corpus.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("d"), col("vec_id"))
    val brute = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .crossJoin(emb.select(col("vec_id"), col("embedding")))
      .withColumn("d", graft.functions.array_distance(col("embedding"), col("q_vec")).cast("double"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("q_id"), col("vec_id"), col("rn"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute)
    // Selective probing triggers dynamic partition pruning on the layout scan.
    val pruned = Ivf.topKJoin(spark, layout, "embedding", queries, "vec_id", "embedding",
      k = 3, nprobe = 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(2000))
  }

  test("topK recall vs exact brute force >= 0.9 at nprobe=6/8") {
    import spark.implicits._
    val emb = spark.read.parquet(sf("0.01") + "/embeddings.parquet")
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    var recallSum = 0.0
    val queries = vecs.take(10)
    queries.foreach { case (_, q) =>
      val exact = vecs.map { case (id, v) =>
        (id, graft.expressions.VectorMath.l2Squared(q, v))
      }.sortBy(_._2).take(10).map(_._1).toSet
      // 64-dim synthetic embeddings spread nearly uniformly, so cells carry
      // little signal (recall@nprobe=4 measures ~0.86); 6/8 cells clears 0.9
      val approx = Ivf.topK(spark, layout, "embedding", q, 10, nprobe = 6)
        .select("vec_id").as[Long].collect().toSet
      recallSum += (exact & approx).size / 10.0
    }
    val recall = recallSum / queries.length
    assert(recall >= 0.9, s"IVF recall@10 = $recall")
    // nprobe = nCells → exhaustive → exact
    val (qid, q) = queries.head
    val exhaustive = Ivf.topK(spark, layout, "embedding", q, 1, nprobe = 8)
      .select("vec_id").as[Long].collect()
    assert(exhaustive.head == qid)
  }

  // ---- IVF-PQ (product quantization over the same layout family) ----

  private lazy val pqLayout: (String, graft.index.Pq.Codebooks) = {
    val out = Files.createTempDirectory("graft-ivfpq").toFile.getAbsolutePath + "/emb"
    val emb = spark.read.parquet(sf("0.01") + "/embeddings.parquet")
    val cb = graft.index.Pq.buildIvfPq(emb, "embedding", out, nCells = 8, m = 8, ksub = 64)
    (out, cb)
  }

  test("pq codebooks: shape, persistence roundtrip, deterministic encode") {
    import graft.index.Pq
    val (out, cb) = pqLayout
    assert(cb.m == 8 && cb.dsub == 8 && cb.ksub == 64)
    val rt = Pq.readCodebooks(new java.io.File(out, "_pq_codebooks.bin"))
    assert(rt.m == cb.m && rt.ksub == cb.ksub && rt.dsub == cb.dsub)
    assert(rt.centroids.flatten.flatten.toSeq == cb.centroids.flatten.flatten.toSeq)
    // codes persisted in the layout: 8 bytes per row (32x under 64 floats)
    val codes = spark.read.parquet(out).select("pq_code").head().getSeq[Byte](0)
    assert(codes.length == 8)
  }

  test("pq ADC distance approximates the true distance (rank correlation)") {
    import graft.index.Pq
    val (out, cb) = pqLayout
    val q = graft.queries.HnswQueries.QueryVec
    val table = Pq.lookupTable(q, cb)
    val rows = spark.read.parquet(out)
      .select(col("vec_id"),
        Pq.adcCol(col("pq_code"), table, cb.ksub).as("adc"),
        graft.functions.array_distance(col("embedding"),
          graft.functions.lit_vector(q)).as("d"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // ADC approximates squared L2; compare against d² ordering: the top-10%
    // by ADC must sit well inside the true lower half.
    val byAdc = rows.sortBy(_._1).map(_._2)
    val trueSorted = rows.map(_._2).sorted
    val medianTrue = trueSorted(rows.length / 2)
    val head = byAdc.take(math.max(10, rows.length / 10))
    assert(head.count(_ <= medianTrue).toDouble / head.length >= 0.9,
      s"ADC head not concentrated below the true median")
  }

  test("pq topK: recall vs brute force, exact distances, bounded candidates") {
    import spark.implicits._
    import graft.index.Pq
    val (out, _) = pqLayout
    val emb = spark.read.parquet(sf("0.01") + "/embeddings.parquet")
    val qids = (0L until 10L)
    var hit = 0
    var total = 0
    qids.foreach { qid =>
      val q = emb.where(col("vec_id") === qid).select("embedding")
        .head().getSeq[Float](0).toArray
      val got = Pq.topK(spark, out, "embedding", "vec_id", q, k = 10,
          nprobe = 8, refine = 8)
        .select("vec_id").as[Long].collect().toSet
      val truth = emb
        .select(col("vec_id"), graft.functions.array_distance(col("embedding"),
          graft.functions.lit_vector(q)).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSet
      hit += got.intersect(truth).size
      total += truth.size
      assert(got.contains(qid), s"self not found for q=$qid")
    }
    assert(hit.toDouble / total >= 0.9, s"recall@10 = ${hit.toDouble / total}")
  }

  test("pq topKJoin: batched ADC equals the per-query loop; corpus never shuffles wide") {
    import spark.implicits._
    import graft.index.Pq
    val (out, _) = pqLayout
    val emb = spark.read.parquet(sf("0.01") + "/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val batched = Pq.topKJoin(spark, out, "embedding", "vec_id",
        queries, "q_id", "q_vec", k = 5, nprobe = 8, refine = 8)
    val got = batched.select("q_id", "vec_id", "rn").as[(Long, Long, Int)]
      .collect().toSet
    assert(got.size == 6 * 5)
    (0L until 6L).foreach { qid =>
      val q = emb.where(col("vec_id") === qid).select("embedding")
        .head().getSeq[Float](0).toArray
      val loop = Pq.topK(spark, out, "embedding", "vec_id", q, k = 5,
          nprobe = 8, refine = 8)
        .select("vec_id").as[Long].collect().toSeq
      val fromBatch = got.filter(_._1 == qid).toSeq.sortBy(_._3).map(_._2)
      assert(fromBatch == loop, s"q=$qid batched=$fromBatch loop=$loop")
    }
    // distances are the EXACT re-ranked ones, ascending per query
    val ds = batched.select("q_id", "rn", "distance").as[(Long, Int, Double)]
      .collect().groupBy(_._1)
    ds.values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
    val plan = batched.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
    // SQL TVF surface over the same layout
    queries.createOrReplaceTempView("pq_queries")
    val viaSql = spark.sql(
      s"""SELECT q_id, vec_id, rn
          FROM ivfpq_topk(TABLE(pq_queries), '$out', 'embedding', 'vec_id',
                          'q_id', 'q_vec', 5, 8, 8)
          ORDER BY q_id, rn""").as[(Long, Long, Int)].collect().toSet
    assert(viaSql == got)
  }

  test("pq trainingSample is hash-selected, not encounter-order") {
    import spark.implicits._
    import graft.index.Pq
    // A clustered layout: rows range-partitioned and sorted by the value
    // the vectors encode, so encounter order is ascending — `.limit(n)`
    // would return only the smallest slice. The hash-ordered sample must
    // instead span the whole range.
    val n = 10000
    val df = (0 until n).map { i =>
      (i.toLong, Array.fill(4)(i.toFloat / n))
    }.toDF("id", "vec")
      .repartitionByRange(8, col("id"))
      .sortWithinPartitions("id")
    val sample = Pq.trainingSample(df, "vec", 500)
    assert(sample.length == 500)
    val firsts = sample.map(_(0))
    // Encounter-order would cap every sampled value at 500/10000 = 0.05.
    assert(firsts.max > 0.5f, s"sample biased low: max=${firsts.max}")
    assert(firsts.min < 0.5f, s"sample biased high: min=${firsts.min}")
    // Uniform: each decile of the value range gets roughly 50 of 500.
    val byDecile = firsts.groupBy(f => (f * 10).toInt.min(9)).view.mapValues(_.length)
    assert((0 to 9).forall(d => byDecile.getOrElse(d, 0) > 20), byDecile.toMap.toString)
    // Deterministic, and layout-independent: a different partitioning of
    // the same rows yields the same sample.
    val again = Pq.trainingSample(df.repartition(3), "vec", 500)
    assert(sample.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("trainingSample with idCol: a flooded duplicate vector stays proportional") {
    import spark.implicits._
    import graft.index.Pq
    // 5000 copies of one vector + 1000 distinct rows. Value-hash order
    // ranks the duplicate block as ONE unit: if its hash lands low, every
    // sampled row is the same vector. Row-salted order (idCol) gives the
    // duplicate ~5/6 of the sample — proportional, like a true row sample.
    val dup = (0 until 5000).map(i => (i.toLong, Array(9f, 9f, 9f, 9f)))
    val uniq = (0 until 1000).map(i => (100000L + i, Array.fill(4)(i / 1000f)))
    val df = (dup ++ uniq).toSeq.toDF("id", "vec").repartition(7)
    val salted = Pq.trainingSample(df, "vec", 600, idCol = Some("id"))
    val nDup = salted.count(_.sameElements(Array(9f, 9f, 9f, 9f)))
    // expectation 500 of 600; distinct values must be well represented
    assert(nDup > 400 && nDup < 580, s"nDup=$nDup")
    assert(salted.map(_.toSeq).distinct.length > 50)
    // still deterministic and layout-independent
    val again = Pq.trainingSample(df.repartition(3), "vec", 600, idCol = Some("id"))
    assert(salted.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("pq topKJoin rejects an over-contract query batch fast") {
    import graft.index.Pq
    val (out, _) = pqLayout
    val big = spark.range(Pq.MaxQueryBatch + 1)
      .select(col("id").as("q_id"),
        array_repeat(col("id").cast("float"), 64).as("q_vec"))
    val e = intercept[IllegalArgumentException] {
      Pq.topKJoin(spark, out, "embedding", "vec_id", big, "q_id", "q_vec",
        k = 5, nprobe = 2)
    }
    assert(e.getMessage.contains("bounded-batch contract"), e.getMessage)
  }
}
