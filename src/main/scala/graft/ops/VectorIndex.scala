package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
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

  /** Publish a frozen trained structure (centroids/codebooks parquet
    * dir) under a new version by FILE copy, not a Spark read+rewrite:
    * the structure is immutable by the refresh contract, and a Spark
    * rewrite costs a full extra read of it per refresh — for PQ that is
    * m x 256 codebook rows on every append. */
  private def copyFrozen(fs: org.apache.hadoop.fs.FileSystem,
      src: Path, dst: Path,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    fs.delete(dst, true)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
  }

  /** Stamp a fresh `_build_id` (UUID) into an index version dir — the
    * collision-proof build identity AnnTopKIndexRewrite fingerprints its
    * centroid/survivor-count caches on. A listing fingerprint
    * (name:len:mtime) can collide when an in-place rebuild lands within
    * the filesystem's mtime granularity with byte-identical part names,
    * serving the OLD build's centroids to the new index (r13 ADVICE).
    * Written LAST, after every index artifact, so a crashed build never
    * leaves a fresh id over stale files. */
  private[ops] def stampBuildId(fs: org.apache.hadoop.fs.FileSystem,
      dest: Path): Unit = {
    val out = fs.create(new Path(dest, "_build_id"), true)
    try out.write(java.util.UUID.randomUUID().toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Long-array accumulator keyed by list id: collects per-list row
    * counts DURING the assignment/encode write job itself (r14 VERDICT
    * #6 — the separate read-back job over the just-written parquet cost
    * +0.3–0.5 s per build). Safe against retries/speculation: the
    * assignment pipeline is one narrow result stage (scan → map →
    * write), and Spark applies result-task accumulator updates exactly
    * once per successful task. */
  private[ops] final class ListSizeAccumulator(nLists: Int)
      extends org.apache.spark.util.AccumulatorV2[Int, Array[Long]] {
    private val counts = new Array[Long](nLists)
    override def isZero: Boolean = counts.forall(_ == 0L)
    override def copy(): ListSizeAccumulator = {
      val c = new ListSizeAccumulator(nLists)
      System.arraycopy(counts, 0, c.counts, 0, nLists)
      c
    }
    override def reset(): Unit = java.util.Arrays.fill(counts, 0L)
    override def add(v: Int): Unit = counts(v) += 1
    override def merge(
        other: org.apache.spark.util.AccumulatorV2[Int, Array[Long]]): Unit = {
      val o = other.value
      var i = 0
      while (i < nLists) { counts(i) += o(i); i += 1 }
    }
    override def value: Array[Long] = counts
  }

  /** Persist per-list row counts (`list_sizes`: cid, count) into an
    * index version dir, from counts the assignment/encode job already
    * accumulated — zero extra passes over the data. The adaptive ANN
    * guard's UNFILTERED path serves from this file instead of running a
    * plan-time count job over the whole assignment table — at 100 TB
    * that job is a full pass over the (id, cid) codes before the first
    * query runs. Filtered queries still count through their predicate
    * (the file cannot know it). Valid for the pinned version by the
    * same argument as the assignments themselves: any commit (append,
    * DELETE) stales the index and probes stop firing. */
  private[ops] def writeListSizes(spark: SparkSession,
      counts: Array[Long], dest: Path): Unit =
    countsDf(spark, counts)
      .coalesce(1).write.mode("overwrite")
      .parquet(new Path(dest, "list_sizes").toString)

  /** The accumulator array as a (cid, count) frame — the one place the
    * list_sizes schema (and its drop-empty-lists rule) is encoded, so
    * build- and refresh-time files can never silently diverge. */
  private def countsDf(spark: SparkSession, counts: Array[Long]) = {
    import spark.implicits._
    spark.createDataset(counts.toSeq.zipWithIndex.collect {
      case (n, cid) if n > 0 => (cid, n)
    }).toDF("cid", "count")
  }

  /** O(delta) refresh of the persisted list sizes: prior sizes (a few
    * K tiny rows) merged with the counts the delta-segment write just
    * accumulated — never a re-read of anything (that would break the
    * refresh probe's O(delta) records contract). An index without the
    * file (built before it existed) skips; the guard falls back to its
    * count job. `deltaCounts = None` (carry-forward refresh with no new
    * rows) copies the prior file. */
  private[ops] def refreshListSizes(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, priorDir: Path, dest: Path,
      deltaCounts: Option[Array[Long]],
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val prior = new Path(priorDir, "list_sizes")
    if (!fs.exists(prior)) return
    deltaCounts match {
      case None =>
        copyFrozen(fs, prior, new Path(dest, "list_sizes"), conf)
      case Some(cnts) =>
        spark.read.parquet(prior.toString)
          .unionByName(countsDf(spark, cnts))
          .groupBy(col("cid")).agg(sum(col("count")).as("count"))
          .coalesce(1).write.mode("overwrite")
          .parquet(new Path(dest, "list_sizes").toString)
    }
  }

  /** Embedding-drift guard for refresh-on-append (r17 VERDICT #3).
    * The IVF/PQ trained structures are frozen by the refresh contract,
    * so an append stream whose embedding distribution shifts (new
    * model, new modality, new domain) decays recall invisibly — the
    * new vectors coarse-assign to far-away centroids and probes miss
    * them. The detector is one cheap statistic that rides INSIDE the
    * refresh's existing delta pass (zero extra jobs): the delta's mean
    * L2 distance to its nearest frozen centroid, compared to the same
    * statistic the BUILD stored over its full corpus (`_drift.json`).
    * A delta whose mean exceeds build-mean × maxRatio escalates to a
    * full retraining [[Ivf.build]]/[[Pq.build]]; the anchor is always
    * the last TRAIN's value (copied across refreshes), so slow drift
    * accumulates against a fixed reference instead of creeping past a
    * per-day comparison. maxRatio <= 0 disables. */
  val DriftMaxRatioKey = "spark.graft.index.drift.maxRatio"
  val DefaultDriftMaxRatio = 1.5

  /** Last refresh's drift decision on this JVM (specs + RecallBench). */
  final case class DriftDecision(deltaMean: Double,
      anchorMean: Option[Double], escalated: Boolean)
  val lastDriftDecision =
    new java.util.concurrent.atomic.AtomicReference[DriftDecision](null)

  private[ops] def writeDriftStat(fs: org.apache.hadoop.fs.FileSystem,
      dest: Path, sumDist: Double, n: Long): Unit = {
    val out = fs.create(new Path(dest, "_drift.json"), true)
    try out.write(s"""{"sum_dist":$sumDist,"n":$n}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The build-time anchor mean, if this index version recorded one
    * (pre-drift-guard indexes have no file → detection skips). */
  private[graft] def readDriftMean(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Option[Double] =
    try {
      val p = new Path(dir, "_drift.json")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val bytes = try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var r = in.read(buf)
          while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
          out.toByteArray
        } finally in.close()
        val node = new ObjectMapper().readTree(bytes)
        val n = node.get("n").asLong()
        if (n <= 0) None else Some(node.get("sum_dist").asDouble() / n)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private[ops] def copyDriftStat(fs: org.apache.hadoop.fs.FileSystem,
      priorDir: Path, dest: Path,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val src = new Path(priorDir, "_drift.json")
    if (fs.exists(src))
      org.apache.hadoop.fs.FileUtil.copy(fs, src,
        fs, new Path(dest, "_drift.json"), false, true, conf)
  }

  /** Escalate iff an anchor exists, the guard is enabled, and the
    * delta's mean distance exceeds anchor × maxRatio. Records the
    * decision for observability either way. */
  private[ops] def driftEscalates(spark: SparkSession, deltaMean: Double,
      anchorMean: Option[Double]): Boolean = {
    val ratio = spark.conf.get(DriftMaxRatioKey,
      DefaultDriftMaxRatio.toString).toDouble
    val esc = ratio > 0 && anchorMean.exists(a => a > 0 &&
      deltaMean > a * ratio)
    lastDriftDecision.set(DriftDecision(deltaMean, anchorMean, esc))
    esc
  }

  /** Remove a stale `_build_id` BEFORE a (re)build writes any artifact:
    * a rebuild that dies mid-way must leave the version dir with NO id —
    * the rewrite then falls back to the listing fingerprint of the new
    * partial files (a cache miss) instead of serving the OLD build's
    * cached centroids/survivor-counts over the new files (r14 review:
    * the old id surviving a crashed rebuild was exactly the staleness
    * class the listing fingerprint used to self-heal). */
  private[ops] def clearBuildId(fs: org.apache.hadoop.fs.FileSystem,
      dest: Path): Unit = {
    fs.delete(new Path(dest, "_build_id"), false)
    // list_sizes carries the same staleness risk (r14 review): a
    // rebuild dying between the new assignments and writeListSizes
    // must leave NO sizes file, so the unfiltered guard falls back to
    // counting the live assignments instead of reading the old build's
    // counts over the new files
    fs.delete(new Path(dest, "list_sizes"), true)
    ()
  }

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
    val dest = versionDir(qual, embCol, manifest.version)
    fs.delete(IndexSegments.manifestPath(dest), false)
    IndexSegments.invalidateDir(fs, dest) // rebuild replaces the chain
    writeSegment(spark, qual, manifest, idCol, embCol, dest)
    manifest.version
  }

  private def writeSegment(spark: SparkSession, qual: Path,
      manifest: GraftFormat.Manifest, idCol: String, embCol: String,
      dest: Path): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    // deletion-aware snapshot scan through the normal connector reader
    val df = GraftShim.tableDF(spark,
      new GraftTable(s"index:$qual", qual, manifest, conf))
    val bucketed = VectorOps.withLshBucket(df.select(idCol, embCol), embCol)
      .select(col(idCol), col("bucket"))
    bucketed.write.mode("overwrite").parquet(dest.toString)
  }

  /** Incremental refresh-on-append ([[IndexSegments]]): sign-LSH
    * bucketing is a stateless per-row function of fixed hyperplanes, so
    * the delta segment's assignments are bit-identical to what a full
    * rebuild would produce — the segment union IS the rebuild. Falls
    * back to [[build]] when the fast path doesn't apply (no prior
    * index, vacuumed prior manifest, mutated old fragments). */
  def refresh(spark: SparkSession, table: Path, idCol: String,
      embCol: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val manifest = GraftFormat.readLatest(fs, qual).getOrElse(
      throw new IllegalArgumentException(s"not a graft table: $table"))
    val prior = indexedVersions(spark, table, embCol).filter(_ <= manifest.version)
    if (prior.isEmpty) return build(spark, table, idCol, embCol)
    val v1 = prior.max
    if (v1 == manifest.version) return v1
    val oldManifest =
      try GraftFormat.readManifest(fs, qual, v1)
      catch { case _: java.io.FileNotFoundException =>
        return build(spark, table, idCol, embCol) }
    GraftFormat.appendedDelta(oldManifest, manifest) match {
      case None => build(spark, table, idCol, embCol)
      case Some(delta) =>
        val root = indexRoot(qual, embCol)
        val priorSegs =
          IndexSegments.expandPrior(fs, root, versionDir(qual, embCol, v1))
        val dest = versionDir(qual, embCol, manifest.version)
        val segs =
          if (delta.isEmpty) priorSegs
          else {
            val segName = IndexSegments.newSegmentName()
            writeSegment(spark, qual,
              manifest.copy(fragments = delta,
                properties = manifest.properties -- GraftFormat.ClusteringProps),
              idCol, embCol, new Path(root, segName))
            priorSegs :+ segName
          }
        IndexSegments.write(fs, dest, IndexSegments.SegManifest(segs, Map.empty))
        manifest.version
    }
  }

  /** The (idCol, bucket) index for the table's LATEST version, if one
    * was built; None means build (or fall back to scan-time bucketing).
    * A refreshed index reads as the union of its segments. */
  def readCurrent(spark: SparkSession, table: Path, embCol: String): Option[DataFrame] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val current = GraftFormat.latestVersion(fs, qual).getOrElse(return None)
    val dirs = IndexSegments.dataDirs(fs, indexRoot(qual, embCol),
      versionDir(qual, embCol, current))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_.toString): _*))
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
      val centroids = Ivf.lloyd(sample.map(_.map(_.toDouble)), nLists, iters)

      // per-list sizes AND the drift anchor (sum of L2 distances to
      // the winning centroid) accumulate inside the same O(N)
      // assignment job — zero extra passes
      val sizes = new VectorIndex.ListSizeAccumulator(centroids.length)
      spark.sparkContext.register(sizes, s"graft.ivf.listSizes:$embCol")
      val distSum = spark.sparkContext.doubleAccumulator(
        s"graft.ivf.driftDist:$embCol")
      def assign(ds: org.apache.spark.sql.Dataset[(Long, Seq[Float])],
          cents: Array[Array[Double]]) = {
        val bc = spark.sparkContext.broadcast(cents)
        ds.map { case (id, e) =>
          val (cid, d2) = Ivf.nearestWithD(bc.value, e)
          sizes.add(cid)
          distSum.add(math.sqrt(d2))
          (id, cid, e)
        }.toDF("__id", "cid", "__e")
      }

      val dest = versionDir(qual, embCol, manifest.version)
      fs.delete(IndexSegments.manifestPath(dest), false)
      IndexSegments.invalidateDir(fs, dest) // rebuild replaces the chain
      VectorIndex.clearBuildId(fs, dest) // before ANY new artifact lands
      spark.createDataset(centroids.toSeq.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) })
        .toDF("cid", "centroid")
        .coalesce(1).write.mode("overwrite")
        .parquet(new Path(dest, "centroids").toString)
      // full-corpus pass: the one O(N) job of the build
      assign(df.as[(Long, Seq[Float])], centroids)
        .select(col("__id").as(idCol), col("cid"))
        .write.mode("overwrite").parquet(new Path(dest, "assign").toString)
      VectorIndex.writeListSizes(spark, sizes.value, dest)
      // drift anchor: the TRAIN-time mean distance to nearest centroid
      // over the full corpus, the fixed reference every later refresh's
      // delta is compared against
      VectorIndex.writeDriftStat(fs, dest, distSum.value, sizes.value.sum)
      VectorIndex.stampBuildId(fs, dest)
      manifest.version
    }

    /** (centroids, assignments) for the table's LATEST version, if an
      * index was built at it; None = stale or absent. A refreshed
      * version serves the union of its assignment segments; its
      * centroids live in the version dir itself (copied at refresh —
      * they are nLists×dim, a few KB). */
    def readCurrent(spark: SparkSession, table: Path,
        embCol: String): Option[(DataFrame, DataFrame)] = {
      val conf = spark.sessionState.newHadoopConf()
      val fs = table.getFileSystem(conf)
      val qual = fs.makeQualified(table)
      val current = GraftFormat.latestVersion(fs, qual).getOrElse(return None)
      val dir = versionDir(qual, embCol, current)
      val dirs = IndexSegments.dataDirs(fs, root(qual, embCol), dir)
      if (dirs.isEmpty) None
      else Some((
        spark.read.parquet(new Path(dir, "centroids").toString),
        spark.read.parquet(dirs.map(d => new Path(d, "assign").toString): _*)))
    }

    /** Versions with a persisted IVF index for `embCol`. */
    def indexedVersions(spark: SparkSession, table: Path,
        embCol: String): Seq[Long] = {
      val conf = spark.sessionState.newHadoopConf()
      val fs = table.getFileSystem(conf)
      val r = root(fs.makeQualified(table), embCol)
      if (!fs.exists(r)) Seq.empty
      else fs.listStatus(r).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
        .map(_.getPath.getName.stripPrefix("v=").toLong)
        .sorted
    }

    /** Incremental refresh-on-append ([[IndexSegments]]): the trained
      * coarse quantizer is FROZEN — appended vectors are assigned to
      * the EXISTING centroids (the same contract as Lance's index
      * updates over new fragments: cover the delta, retrain only on
      * explicit rebuild) and written as one new assignment segment;
      * centroids are copied into the new version dir (a few KB).
      * Because assignment is a pure function of the frozen centroids,
      * probe results over the refreshed index equal a probe over
      * "rebuild with these centroids" exactly. Falls back to a full
      * [[build]] (which RETRAINS) when the fast path doesn't apply. */
    def refresh(spark: SparkSession, table: Path, idCol: String,
        embCol: String, nLists: Int = 16, iters: Int = 4,
        trainCap: Long = 100000L): Long = {
      val conf = spark.sessionState.newHadoopConf()
      val fs = table.getFileSystem(conf)
      val qual = fs.makeQualified(table)
      val manifest = GraftFormat.readLatest(fs, qual).getOrElse(
        throw new IllegalArgumentException(s"not a graft table: $table"))
      val prior = indexedVersions(spark, table, embCol)
        .filter(_ <= manifest.version)
      if (prior.isEmpty)
        return build(spark, table, idCol, embCol, nLists, iters, trainCap)
      val v1 = prior.max
      if (v1 == manifest.version) return v1
      val oldManifest =
        try GraftFormat.readManifest(fs, qual, v1)
        catch { case _: java.io.FileNotFoundException =>
          return build(spark, table, idCol, embCol, nLists, iters, trainCap) }
      GraftFormat.appendedDelta(oldManifest, manifest) match {
        case None => build(spark, table, idCol, embCol, nLists, iters, trainCap)
        case Some(delta) =>
          val r = root(qual, embCol)
          val priorDir = versionDir(qual, embCol, v1)
          val priorSegs = IndexSegments.expandPrior(fs, r, priorDir)
          val dest = versionDir(qual, embCol, manifest.version)
          VectorIndex.clearBuildId(fs, dest) // before ANY new artifact lands
          val centDF = spark.read
            .parquet(new Path(priorDir, "centroids").toString)
          var escalate = false
          var segDir: Option[Path] = None
          val (segs, deltaCounts) =
            if (delta.isEmpty) (priorSegs, Option.empty[Array[Long]])
            else {
              val cents = centDF.collect()
                .map(row => row.getInt(0) -> row.getSeq[Double](1).toArray)
                .sortBy(_._1).map(_._2)
              val df = GraftShim.tableDF(spark,
                new GraftTable(s"index:$qual#delta", qual,
                  manifest.copy(fragments = delta,
                    properties = manifest.properties -- GraftFormat.ClusteringProps),
                  conf))
                .select(col(idCol).cast("long").as("__id"), col(embCol).as("__e"))
              import spark.implicits._
              val bc = spark.sparkContext.broadcast(cents)
              // delta-list sizes + drift distances accumulate inside
              // the segment write job (zero extra passes)
              val sizes = new VectorIndex.ListSizeAccumulator(cents.length)
              spark.sparkContext.register(sizes,
                s"graft.ivf.deltaListSizes:$embCol")
              val distSum = spark.sparkContext.doubleAccumulator(
                s"graft.ivf.deltaDriftDist:$embCol")
              val segName = IndexSegments.newSegmentName()
              val segAssign = new Path(new Path(r, segName), "assign")
              df.as[(Long, Seq[Float])]
                .map { case (id, e) =>
                  val (cid, d2) = Ivf.nearestWithD(bc.value, e)
                  sizes.add(cid)
                  distSum.add(math.sqrt(d2))
                  (id, cid)
                }
                .toDF("__id", "cid")
                .select(col("__id").as(idCol), col("cid"))
                .write.mode("overwrite").parquet(segAssign.toString)
              // drift check (r17 VERDICT #3): the delta's mean distance
              // to its nearest FROZEN centroid vs the build's anchor —
              // a distribution-shifting append must retrain, not decay
              // recall invisibly
              val n = sizes.value.sum
              val deltaMean = if (n == 0) 0.0 else distSum.value / n
              escalate = VectorIndex.driftEscalates(spark, deltaMean,
                VectorIndex.readDriftMean(fs, priorDir))
              segDir = Some(new Path(r, segName))
              (priorSegs :+ segName, Some(sizes.value))
            }
          if (escalate) {
            // the drifted segment is discarded (it was never published
            // in any manifest) and the index retrains from scratch
            segDir.foreach(fs.delete(_, true))
            return build(spark, table, idCol, embCol, nLists, iters,
              trainCap)
          }
          copyFrozen(fs, new Path(priorDir, "centroids"),
            new Path(dest, "centroids"), conf)
          VectorIndex.refreshListSizes(spark, fs, priorDir, dest,
            deltaCounts, conf)
          // the anchor travels: refreshes compare against the last
          // TRAIN's distribution, never yesterday's delta
          VectorIndex.copyDriftStat(fs, priorDir, dest, conf)
          IndexSegments.write(fs, dest,
            IndexSegments.SegManifest(segs, Map.empty))
          VectorIndex.stampBuildId(fs, dest)
          manifest.version
      }
    }

    /** Lloyd's k-means on a driver-bounded sample: deterministic
      * seeding from the first k points, empty clusters keep their
      * previous centroid. Shared by the IVF coarse quantizer and the
      * per-subspace PQ codebooks. */
    private[graft] def lloyd(points: Array[Array[Double]], k0: Int,
        iters: Int): Array[Array[Double]] =
      lloydSeeded(points, k0, iters, farthestSeed = false)

    /** Deterministic farthest-point ("k-means++ without the dice")
      * seeds: start from the first point, then repeatedly take the
      * sample point farthest from its nearest chosen seed (ties ->
      * lowest index). O(sample × k × dim) driver work. Used by
      * semanticDedup, where first-k seeding on replicated/skewed data
      * produced mega-clusters that blow up the intra-cluster quadratic
      * term (measured on the 4x scale probe: sum|c|² 12.0M -> 1.12M,
      * candidate edges 5.0M -> 0.51M). The IVF/PQ index builds keep
      * first-k seeding: their probe cost is top-k per bucket, not
      * |c|², and their goldens pin the first-k clustering. */
    private[graft] def lloydSeeded(points: Array[Array[Double]], k0: Int,
        iters: Int, farthestSeed: Boolean): Array[Array[Double]] = {
      var centroids: Array[Array[Double]] =
        if (!farthestSeed || points.length <= k0) points.take(k0).map(_.clone())
        else {
          val n = points.length
          val chosen = new Array[Int](k0); chosen(0) = 0
          val d2 = Array.fill(n)(Double.MaxValue)
          var c = 0
          while (c < k0 - 1) {
            var best = 0; var bestD = -1.0; var i = 0
            while (i < n) {
              val p = points(i); val q = points(chosen(c))
              var d = 0.0; var j = 0; val m = math.min(p.length, q.length)
              while (j < m) { val t = p(j) - q(j); d += t * t; j += 1 }
              if (d < d2(i)) d2(i) = d
              if (d2(i) > bestD) { bestD = d2(i); best = i }
              i += 1
            }
            c += 1; chosen(c) = best
          }
          chosen.map(points(_).clone())
        }
      val k = centroids.length
      val dim = points.head.length
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Long](k)
        points.foreach { e =>
          val c = nearestD(centroids, e)
          val s = sums(c); var i = 0
          val n = math.min(dim, e.length)
          while (i < n) { s(i) += e(i); i += 1 }
          counts(c) += 1
        }
        centroids = Array.tabulate(k)(c =>
          if (counts(c) == 0) centroids(c)
          else sums(c).map(_ / counts(c)))
      }
      centroids
    }

    private[graft] def nearestD(cents: Array[Array[Double]],
        e: Array[Double]): Int = {
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

    /** [[nearest]] plus the winning L2² — the drift guard accumulates
      * sqrt of this inside the same assignment loop, zero extra math
      * beyond what the argmin already computed. */
    private[graft] def nearestWithD(cents: Array[Array[Double]],
        e: Seq[Float]): (Int, Double) = {
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
      (best, bestD)
    }
  }

  // --------------------------------------------------------------- IVF_PQ

  /** IVF + product quantization — the Spark-native analog of Lance's
    * flagship IVF_PQ vector index (reference docs/src/performance.md
    * "Index Usage"; the Rust side quantizes behind JNI). On top of the
    * IVF coarse quantizer, each vector's RESIDUAL (vector − its list
    * centroid) is split into `m` subvectors and each subvector replaced
    * by the id of its nearest entry in a per-subspace 256-entry
    * codebook: the corpus compresses to one byte per subspace
    * (64-dim float32 → 16 bytes at m=16, a 16× reduction), and query
    * scans rank candidates with asymmetric distance (ADC) — an m-step
    * lookup-table walk per candidate (`pq_adc`, codegen'd) instead of a
    * dim-step float loop.
    *
    * Layout: `_indices/<col>.ivfpq/v=<tableVersion>/
    * {centroids,codebooks,codes}` — `codes` holds (id, cid,
    * code: BINARY(m)).
    *
    * Scale shape (100 TB): training (coarse centroids + codebooks) runs
    * on a driver-bounded sample; the single O(N) pass encodes each row
    * to m bytes with the centroid matrix + codebooks broadcast
    * (≤ a few MB). Queries broadcast per-(query, probed-list) lookup
    * tables (m×256 floats each) and never move the corpus; the scan
    * reads 16-byte codes instead of 256-byte vectors — the I/O
    * reduction IS the index. */
  object Pq {
    def root(table: Path, col: String): Path =
      new Path(GraftFormat.indicesDir(table), s"$col.ivfpq")
    private def versionDir(table: Path, col: String, v: Long): Path =
      new Path(root(table, col), s"v=$v")

    /** Train + persist at the table's latest version; returns it. */
    def build(spark: SparkSession, table: Path, idCol: String,
        embCol: String, nLists: Int = 16, m: Int = 16, iters: Int = 4,
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
      val sample: Array[Array[Double]] =
        (if (liveRows <= trainCap) df
         else df.sample(withReplacement = false,
           trainCap.toDouble / liveRows, seed = 42L))
          .orderBy("__id").select("__e").as[Seq[Float]]
          .collect().map(_.toArray.map(_.toDouble))
      require(sample.nonEmpty, "cannot build an IVF_PQ index over an empty table")
      val dim = sample.head.length
      require(dim % m == 0, s"dim $dim must be divisible by m=$m")
      val sub = dim / m

      val cents = Ivf.lloyd(sample, nLists, iters)
      // per-subspace codebooks trained on the sample's residuals
      val residuals = sample.map { e =>
        val c = cents(Ivf.nearestD(cents, e))
        Array.tabulate(dim)(i => e(i) - c(i))
      }
      val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
        val pts = residuals.map(r => java.util.Arrays.copyOfRange(r, j * sub, (j + 1) * sub))
        Ivf.lloyd(pts, math.min(256, pts.length), iters)
      }

      // the one O(N) pass: coarse-assign + encode every row to m bytes;
      // per-list sizes accumulate inside the same job
      val bcC = spark.sparkContext.broadcast(cents)
      val bcB = spark.sparkContext.broadcast(codebooks)
      val sizes = new VectorIndex.ListSizeAccumulator(cents.length)
      spark.sparkContext.register(sizes, s"graft.ivfpq.listSizes:$embCol")
      val distSum = spark.sparkContext.doubleAccumulator(
        s"graft.ivfpq.driftDist:$embCol")
      val codes = df.as[(Long, Seq[Float])].map { case (id, e) =>
        val cs = bcC.value; val bks = bcB.value
        val (cid, d2) = Ivf.nearestWithD(cs, e)
        sizes.add(cid)
        distSum.add(math.sqrt(d2))
        val cent = cs(cid)
        val code = new Array[Byte](m)
        var j = 0
        while (j < m) {
          val p = new Array[Double](sub)
          var i = 0
          while (i < sub) { p(i) = e(j * sub + i) - cent(j * sub + i); i += 1 }
          code(j) = Ivf.nearestD(bks(j), p).toByte
          j += 1
        }
        (id, cid, code)
      }.toDF("__id", "cid", "code")

      val dest = versionDir(qual, embCol, manifest.version)
      fs.delete(IndexSegments.manifestPath(dest), false)
      IndexSegments.invalidateDir(fs, dest) // rebuild replaces the chain
      VectorIndex.clearBuildId(fs, dest) // before ANY new artifact lands
      spark.createDataset(cents.toSeq.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) })
        .toDF("cid", "centroid")
        .coalesce(1).write.mode("overwrite")
        .parquet(new Path(dest, "centroids").toString)
      spark.createDataset(for {
          (bk, j) <- codebooks.toSeq.zipWithIndex
          (entry, c) <- bk.toSeq.zipWithIndex
        } yield (j, c, entry.toSeq))
        .toDF("sub", "code", "entry")
        .coalesce(1).write.mode("overwrite")
        .parquet(new Path(dest, "codebooks").toString)
      codes.select(col("__id").as(idCol), col("cid"), col("code"))
        .write.mode("overwrite").parquet(new Path(dest, "codes").toString)
      VectorIndex.writeListSizes(spark, sizes.value, dest)
      VectorIndex.writeDriftStat(fs, dest, distSum.value, sizes.value.sum)
      VectorIndex.stampBuildId(fs, dest)
      manifest.version
    }

    /** (centroids, codebooks, codes) at the table's LATEST version;
      * None = stale or absent. A refreshed version serves the union of
      * its code segments; centroids/codebooks live in the version dir
      * itself (copied at refresh — a few hundred KB at most). */
    def readCurrent(spark: SparkSession, table: Path, embCol: String)
        : Option[(DataFrame, DataFrame, DataFrame)] = {
      val conf = spark.sessionState.newHadoopConf()
      val fs = table.getFileSystem(conf)
      val qual = fs.makeQualified(table)
      val current = GraftFormat.latestVersion(fs, qual).getOrElse(return None)
      val dir = versionDir(qual, embCol, current)
      val dirs = IndexSegments.dataDirs(fs, root(qual, embCol), dir)
      if (dirs.isEmpty) None
      else Some((
        spark.read.parquet(new Path(dir, "centroids").toString),
        spark.read.parquet(new Path(dir, "codebooks").toString),
        spark.read.parquet(dirs.map(d => new Path(d, "codes").toString): _*)))
    }

    /** Versions with a persisted IVF_PQ index for `embCol`. */
    def indexedVersions(spark: SparkSession, table: Path,
        embCol: String): Seq[Long] = {
      val conf = spark.sessionState.newHadoopConf()
      val fs = table.getFileSystem(conf)
      val r = root(fs.makeQualified(table), embCol)
      if (!fs.exists(r)) Seq.empty
      else fs.listStatus(r).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
        .map(_.getPath.getName.stripPrefix("v=").toLong)
        .sorted
    }

    /** Incremental refresh-on-append ([[IndexSegments]]): coarse
      * centroids AND per-subspace codebooks are FROZEN — appended
      * vectors are coarse-assigned and PQ-encoded against the existing
      * trained structures and written as one new code segment;
      * centroids/codebooks are copied into the new version dir. Falls
      * back to a full retraining [[build]] when the fast path doesn't
      * apply. */
    def refresh(spark: SparkSession, table: Path, idCol: String,
        embCol: String, nLists: Int = 16, m: Int = 16, iters: Int = 4,
        trainCap: Long = 100000L): Long = {
      val conf = spark.sessionState.newHadoopConf()
      val fs = table.getFileSystem(conf)
      val qual = fs.makeQualified(table)
      val manifest = GraftFormat.readLatest(fs, qual).getOrElse(
        throw new IllegalArgumentException(s"not a graft table: $table"))
      val prior = indexedVersions(spark, table, embCol)
        .filter(_ <= manifest.version)
      if (prior.isEmpty)
        return build(spark, table, idCol, embCol, nLists, m, iters, trainCap)
      val v1 = prior.max
      if (v1 == manifest.version) return v1
      val oldManifest =
        try GraftFormat.readManifest(fs, qual, v1)
        catch { case _: java.io.FileNotFoundException =>
          return build(spark, table, idCol, embCol, nLists, m, iters, trainCap) }
      GraftFormat.appendedDelta(oldManifest, manifest) match {
        case None => build(spark, table, idCol, embCol, nLists, m, iters, trainCap)
        case Some(delta) =>
          val r = root(qual, embCol)
          val priorDir = versionDir(qual, embCol, v1)
          val priorSegs = IndexSegments.expandPrior(fs, r, priorDir)
          val dest = versionDir(qual, embCol, manifest.version)
          VectorIndex.clearBuildId(fs, dest) // before ANY new artifact lands
          val centDF = spark.read
            .parquet(new Path(priorDir, "centroids").toString)
          val bookDF = spark.read
            .parquet(new Path(priorDir, "codebooks").toString)
          var escalate = false
          var segDir: Option[Path] = None
          val (segs, deltaCodes) =
            if (delta.isEmpty) (priorSegs, Option.empty[Array[Long]])
            else {
              val cents = centDF.collect()
                .map(row => row.getInt(0) -> row.getSeq[Double](1).toArray)
                .sortBy(_._1).map(_._2)
              val books: Array[Array[Array[Double]]] = bookDF.collect()
                .map(row => (row.getInt(0), row.getInt(1),
                  row.getSeq[Double](2).toArray))
                .groupBy(_._1).toSeq.sortBy(_._1)
                .map(_._2.sortBy(_._2).map(_._3).toArray).toArray
              val mm = books.length
              val sub = cents.head.length / mm
              val df = GraftShim.tableDF(spark,
                new GraftTable(s"index:$qual#delta", qual,
                  manifest.copy(fragments = delta,
                    properties = manifest.properties -- GraftFormat.ClusteringProps),
                  conf))
                .select(col(idCol).cast("long").as("__id"), col(embCol).as("__e"))
              import spark.implicits._
              val bcC = spark.sparkContext.broadcast(cents)
              val bcB = spark.sparkContext.broadcast(books)
              // delta-list sizes + drift distances accumulate inside
              // the segment write job
              val sizes = new VectorIndex.ListSizeAccumulator(cents.length)
              spark.sparkContext.register(sizes,
                s"graft.ivfpq.deltaListSizes:$embCol")
              val distSum = spark.sparkContext.doubleAccumulator(
                s"graft.ivfpq.deltaDriftDist:$embCol")
              val segName = IndexSegments.newSegmentName()
              val segCodes = new Path(new Path(r, segName), "codes")
              df.as[(Long, Seq[Float])].map { case (id, e) =>
                val cs = bcC.value; val bks = bcB.value
                val (cid, d2) = Ivf.nearestWithD(cs, e)
                sizes.add(cid)
                distSum.add(math.sqrt(d2))
                val cent = cs(cid)
                val code = new Array[Byte](mm)
                var j = 0
                while (j < mm) {
                  val p = new Array[Double](sub)
                  var i = 0
                  while (i < sub) { p(i) = e(j * sub + i) - cent(j * sub + i); i += 1 }
                  code(j) = Ivf.nearestD(bks(j), p).toByte
                  j += 1
                }
                (id, cid, code)
              }.toDF("__id", "cid", "code")
                .select(col("__id").as(idCol), col("cid"), col("code"))
                .write.mode("overwrite").parquet(segCodes.toString)
              // drift check (r17 VERDICT #3) — see Ivf.refresh
              val n = sizes.value.sum
              val deltaMean = if (n == 0) 0.0 else distSum.value / n
              escalate = VectorIndex.driftEscalates(spark, deltaMean,
                VectorIndex.readDriftMean(fs, priorDir))
              segDir = Some(new Path(r, segName))
              (priorSegs :+ segName, Some(sizes.value))
            }
          if (escalate) {
            segDir.foreach(fs.delete(_, true))
            return build(spark, table, idCol, embCol, nLists, m, iters,
              trainCap)
          }
          copyFrozen(fs, new Path(priorDir, "centroids"),
            new Path(dest, "centroids"), conf)
          copyFrozen(fs, new Path(priorDir, "codebooks"),
            new Path(dest, "codebooks"), conf)
          VectorIndex.refreshListSizes(spark, fs, priorDir, dest,
            deltaCodes, conf)
          VectorIndex.copyDriftStat(fs, priorDir, dest, conf)
          IndexSegments.write(fs, dest,
            IndexSegments.SegManifest(segs, Map.empty))
          VectorIndex.stampBuildId(fs, dest)
          manifest.version
      }
    }

    /** Flattened m×256 ADC lookup table for one (query, list) pair:
      * entry (j*256 + c) = ||(q − centroid)_j − codebook[j][c]||².
      * Codes beyond a subspace's trained codebook size keep
      * Double.MaxValue (never produced by the encoder). */
    private[graft] def adcTable(q: Array[Double], cent: Array[Double],
        codebooks: Array[Array[Array[Double]]]): Array[Double] = {
      val m = codebooks.length
      val sub = q.length / m
      val t = Array.fill(m * 256)(Double.MaxValue)
      var j = 0
      while (j < m) {
        val bk = codebooks(j)
        var c = 0
        while (c < bk.length) {
          val e = bk(c); var d = 0.0; var i = 0
          while (i < sub) {
            val diff = (q(j * sub + i) - cent(j * sub + i)) - e(i)
            d += diff * diff; i += 1
          }
          t((j << 8) | c) = d
          c += 1
        }
        j += 1
      }
      t
    }
  }
}
