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

  // ---------------------------------------------------------------- IVF

  /** IVF (inverted-file) coarse-quantizer index — the Spark-native
    * analog of Lance's IVF vector indexes (reference
    * docs/src/performance.md "Index Usage"): k-means centroids plus a
    * (row id → list id) inverted assignment, persisted under
    * `_indices/<col>.ivf/v=<tableVersion>/{centroids,assign}`.
    *
    * Scale shape (100 TB): centroids are trained on a driver-bounded
    * SAMPLE (`trainCap` rows — k-means quality needs a sample, not the
    * corpus), each Lloyd iteration is one linear pass with the k×dim
    * centroid matrix broadcast (a few hundred KB), and the only
    * full-corpus work is the final assignment pass — one narrow
    * (id, cid) write. Queries probe `nprobe` of `nLists` lists, so the
    * scanned fraction is nprobe/nLists of the corpus regardless of
    * total size.
    */
  object Ivf {
    def root(table: Path, col: String): Path =
      new Path(GraftFormat.indicesDir(table), s"$col.ivf")
    private def versionDir(table: Path, col: String, v: Long): Path =
      new Path(root(table, col), s"v=$v")

    /** Train + persist the IVF index at the table's latest version.
      * Returns the indexed version. */
    def build(spark: SparkSession, table: Path, idCol: String,
        embCol: String, nLists: Int = 16, iters: Int = 4,
        trainCap: Long = 100000L): Long = {
      val conf = spark.sessionState.newHadoopConf()
      val fs = table.getFileSystem(conf)
      val qual = fs.makeQualified(table)
      val manifest = GraftFormat.readLatest(fs, qual).getOrElse(
        throw new IllegalArgumentException(s"not a graft table: $table"))
      val df = GraftShim.tableDF(spark,
        new GraftTable(s"index:$qual", qual, manifest, conf))
        .select(col(idCol).cast("long").as("__id"), col(embCol).as("__e"))
      import spark.implicits._

      val liveRows = manifest.fragments.map(_.liveRows).sum
      // the training sample is driver-bounded BY DESIGN (k-means quality
      // needs a sample, not the corpus — same contract as IVF training
      // in native vector stores), so Lloyd runs as in-memory math on the
      // collected sample: one cluster job to sample, zero jobs per
      // iteration, and the cluster's only O(N) work is the final
      // assignment pass below
      val sample: Array[Array[Float]] =
        (if (liveRows <= trainCap) df
         else df.sample(withReplacement = false,
           trainCap.toDouble / liveRows, seed = 42L))
          .orderBy("__id").select("__e").as[Seq[Float]]
          .collect().map(_.toArray)
      require(sample.nonEmpty, "cannot build an IVF index over an empty table")

      // deterministic seeding: the nLists lowest-id vectors
      var centroids: Array[Array[Double]] =
        sample.take(nLists).map(_.map(_.toDouble))
      val k = centroids.length
      val dim = sample.head.length
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Long](k)
        sample.foreach { e =>
          val c = Ivf.nearest(centroids, e)
          val s = sums(c); var i = 0
          val n = math.min(dim, e.length)
          while (i < n) { s(i) += e(i); i += 1 }
          counts(c) += 1
        }
        // empty lists keep their previous centroid
        centroids = Array.tabulate(k)(c =>
          if (counts(c) == 0) centroids(c)
          else sums(c).map(_ / counts(c)))
      }

      def assign(ds: org.apache.spark.sql.Dataset[(Long, Seq[Float])],
          cents: Array[Array[Double]]) = {
        val bc = spark.sparkContext.broadcast(cents)
        ds.map { case (id, e) =>
          (id, Ivf.nearest(bc.value, e), e)
        }.toDF("__id", "cid", "__e")
      }

      val dest = versionDir(qual, embCol, manifest.version)
      spark.createDataset(centroids.toSeq.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) })
        .toDF("cid", "centroid")
        .coalesce(1).write.mode("overwrite")
        .parquet(new Path(dest, "centroids").toString)
      // full-corpus pass: the one O(N) job of the build
      assign(df.as[(Long, Seq[Float])], centroids)
        .select(col("__id").as(idCol), col("cid"))
        .write.mode("overwrite").parquet(new Path(dest, "assign").toString)
      manifest.version
    }

    /** (centroids, assignments) for the table's LATEST version, if an
      * index was built at it; None = stale or absent. */
    def readCurrent(spark: SparkSession, table: Path,
        embCol: String): Option[(DataFrame, DataFrame)] = {
      val conf = spark.sessionState.newHadoopConf()
      val fs = table.getFileSystem(conf)
      val qual = fs.makeQualified(table)
      val current = GraftFormat.latestVersion(fs, qual).getOrElse(return None)
      val dir = versionDir(qual, embCol, current)
      if (!fs.exists(dir)) None
      else Some((
        spark.read.parquet(new Path(dir, "centroids").toString),
        spark.read.parquet(new Path(dir, "assign").toString)))
    }

    private[graft] def nearest(cents: Array[Array[Double]],
        e: Seq[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cents.length) {
        val cent = cents(c); var d = 0.0; var i = 0
        val n = math.min(cent.length, e.length)
        while (i < n) {
          val diff = e(i) - cent(i); d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
  }
}
