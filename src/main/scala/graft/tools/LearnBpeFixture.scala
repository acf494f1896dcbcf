package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * One-off provenance tool: (re)learn the committed fixture BPE vocabulary
 * (`src/main/resources/graft/bpe_merges_fixture.txt`) from the driver's
 * documents fixture — the published-merges-table role GPT-2's merges.txt
 * plays for real deployments (this sandbox has no egress, so the
 * "published" table is learned from the fixture corpus and committed).
 *
 * Usage: sbt "runMain graft.tools.LearnBpeFixture [sfDir] [outPath] [n]"
 */
object LearnBpeFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse(
      "/root/repo/src/main/resources/graft/bpe_merges_fixture.txt")
    val n = args.lift(2).map(_.toInt).getOrElse(160)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = graft.text.Bpe.learnMerges(docs, "text", numMerges = n)
    new java.io.File(out).getParentFile.mkdirs()
    graft.text.Bpe.saveMerges(merges, out)
    println(s"wrote ${merges.size} merges to $out")
    spark.stop()
  }
}
