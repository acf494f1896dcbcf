package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the classifier gates' Spark ML fits — where do
  * doc_langid_classifier's ~3 s of build time go? Test scope: measurement
  * apparatus. */
object FitProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[fitprof] $label ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    }
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.HashingTF

    val markers = array(lit("qlangzero"), lit("qlangone"), lit("qlangtwo"))
    val d = graft.Tables.load(spark, dir, "documents")
      .where(col("text").isNotNull)
      .withColumn("_lbl", (col("doc_id") % 3).cast("int"))
      .withColumn("_t2", concat(
        element_at(markers, (col("doc_id") % 3 + 1).cast("int")),
        lit(" "), col("text")))

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val labels = time("labels distinct") {
        d.select(col("_lbl").cast("string").as("_tc_l"))
          .where(col("_tc_l").isNotNull)
          .distinct().orderBy(col("_tc_l")).limit(4097)
          .collect().map(_.getString(0))
      }
      val idxExpr = labels.zipWithIndex.tail
        .foldLeft(when(col("_tc_l") === labels(0), lit(0.0))) {
          case (acc, (l, i)) => acc.when(col("_tc_l") === l, lit(i.toDouble))
        }
      val prepared = d
        .select(split(coalesce(col("_t2"), lit("")), " ").as("_tc_tokens"),
          col("_lbl").cast("string").as("_tc_l"))
        .where(col("_tc_l").isNotNull)
        .withColumn("_tc_label", idxExpr)
      val tf = new HashingTF().setInputCol("_tc_tokens").setOutputCol("_tc_features")
        .setNumFeatures(1 << 16)
      val feats = time("tf.transform (lazy)") { tf.transform(prepared) }
      time("feats count (featurize pass)") { feats.count() }
      val lr = new LogisticRegression().setFeaturesCol("_tc_features")
        .setLabelCol("_tc_label").setMaxIter(8).setRegParam(0.01)
        .setFamily("multinomial")
      val model = time("lr.fit") { lr.fit(feats) }
      val mat = model.coefficientMatrix
      time("coefficient extraction") {
        Array.tabulate(labels.length)(c =>
          Array.tabulate(1 << 16)(i => mat(c, i)))
      }
      time("lr.fit coalesce(1)") { lr.fit(feats.coalesce(1)) }
      time("lr.fit repartition(8)") { lr.fit(feats.repartition(8)) }
      time("lr.fit blockSize 8MB") {
        new LogisticRegression().setFeaturesCol("_tc_features")
          .setLabelCol("_tc_label").setMaxIter(8).setRegParam(0.01)
          .setFamily("multinomial").setMaxBlockSizeInMB(8.0).fit(feats)
      }
      time("lr.fit maxIter colocate probe (iter=1)") {
        new LogisticRegression().setFeaturesCol("_tc_features")
          .setLabelCol("_tc_label").setMaxIter(1).setRegParam(0.01)
          .setFamily("multinomial").fit(feats)
      }
    }
    spark.stop()
  }
}
