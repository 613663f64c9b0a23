package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.functions._

import graft.connector.GraftTable
import graft.format.GraftFormat
import graft.operators.VectorOps

/** Persisted secondary vector index: sign-LSH bucket assignments stored
  * as a parquet sidecar under the table's `_indices/` directory — the
  * Spark-native analog of the reference's Lance vector indexes
  * (`_indices/` in test/resources/example_db/test_table4.lance;
  * docs/src/performance.md "Index Usage"). ANN queries join the index
  * instead of re-bucketing the corpus per run.
  *
  * Layout: `_indices/<col>.lsh/v=<tableVersion>/part-*.parquet` holding
  * (<idCol>, bucket). The index names the table version it was built
  * at; [[readCurrent]] only serves an index that matches the latest
  * version, so stale indexes (table appended/updated since build) are
  * invisible rather than wrong. Index files are written by Spark's
  * distributed writer — at 100 TB the index build is one linear scan +
  * one narrow write, and the bucket join co-partitions on the id key.
  */
object VectorIndex {

  def indexRoot(table: Path, col: String): Path =
    new Path(GraftFormat.indicesDir(table), s"$col.lsh")

  private def versionDir(table: Path, col: String, v: Long): Path =
    new Path(indexRoot(table, col), s"v=$v")

  /** Build (or rebuild) the LSH index for `embCol` at the table's latest
    * version. Returns the indexed version. */
  def build(spark: SparkSession, table: Path, idCol: String,
      embCol: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val manifest = GraftFormat.readLatest(fs, qual).getOrElse(
      throw new IllegalArgumentException(s"not a graft table: $table"))
    // deletion-aware snapshot scan through the normal connector reader
    val df = GraftShim.tableDF(spark,
      new GraftTable(s"index:$qual", qual, manifest, conf))
    val bucketed = VectorOps.withLshBucket(df.select(idCol, embCol), embCol)
      .select(col(idCol), col("bucket"))
    val dest = versionDir(qual, embCol, manifest.version)
    bucketed.write.mode("overwrite").parquet(dest.toString)
    manifest.version
  }

  /** The (idCol, bucket) index for the table's LATEST version, if one
    * was built; None means build (or fall back to scan-time bucketing). */
  def readCurrent(spark: SparkSession, table: Path, embCol: String): Option[DataFrame] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val current = GraftFormat.latestVersion(fs, qual).getOrElse(return None)
    val dir = versionDir(qual, embCol, current)
    if (!fs.exists(dir)) None
    else Some(spark.read.parquet(dir.toString))
  }

  /** Versions with a persisted index for `embCol`. */
  def indexedVersions(spark: SparkSession, table: Path, embCol: String): Seq[Long] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val root = indexRoot(fs.makeQualified(table), embCol)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }
}
