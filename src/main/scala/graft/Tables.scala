package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Loaders for the driver-generated parquet test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema cache per (session, path): without it `spark.read.parquet`
  // re-reads the footer for schema inference on every call, charging each
  // gate query fixed metadata cost per table touched (round-4 verdict:
  // fixed per-query overhead). Only the SCHEMA is cached — each call still
  // returns a fresh relation with fresh attribute ids, so self-joins of
  // the same table stay unambiguous. The test tables are immutable.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent((spark, path),
      k => k._1.read.parquet(k._2).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Collision-resistant artifact-name key for an sf dir: readable
    * basename + 64 bits of md5 of the full path. Gate artifacts (indexes,
    * bucketed layouts) keyed by `dir.hashCode` could collide two dirs
    * onto one artifact (Int hash; abs(Int.MinValue) is even negative) and
    * silently serve one scale's data to the other's gate — the mtime
    * staleness checks can't catch it because both artifacts are "current"
    * for their own source. */
  def dirKey(dir: String): String = {
    val base = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = java.nio.ByteBuffer.wrap(md).getLong(0)
    f"${base}_$h%016x"
  }
}
