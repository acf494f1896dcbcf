package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage probe for the Jaccard join at a given SF. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.{TextFunctions => TF}
    val docs = spark.read.parquet(dir + "/documents.parquet")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = docs.select(col("doc_id").cast("long").as("id"),
      TF.wordShingles(col("text"), 3).as("sh")).where(size(col("sh")) > 0).persist()
    println("PROBE docs=" + timed("shingle+persist")(sh.count()))
    val posting = sh.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("g"))
    println("PROBE postings=" + timed("posting count")(posting.count()))
    val gramDf = posting.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
    println("PROBE grams=" + timed("gramDf")(gramDf.count()))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("gdf"), col("g"))
    val t = 0.5
    val prefix = posting.join(gramDf, "g")
      .withColumn("rn", row_number().over(byRarity))
      .where(col("rn") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
      .select(col("id"), col("sz"), col("g"), col("rn")).persist()
    println("PROBE prefix=" + timed("prefix build")(prefix.count()))
    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.g") === col("y.g") && col("x.id") < col("y.id") &&
          least(col("x.sz"), col("y.sz")) >= lit(t) * greatest(col("x.sz"), col("y.sz")) &&
          lit(1) + least(col("x.sz") - col("x.rn"), col("y.sz") - col("y.rn")) >=
            ceil(lit(t / (1 + t)) * (col("x.sz") + col("y.sz"))))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    println("PROBE collisions=" + timed("collision rows")(cands.count()))
    println("PROBE cands=" + timed("distinct cands")(cands.distinct().count()))
    spark.stop()
  }
}
