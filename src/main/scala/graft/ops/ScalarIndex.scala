package graft.ops

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.connector.GraftTable
import graft.format.GraftFormat

/** Persisted scalar (value-exact) secondary index: the Spark-native
  * analog of the reference's btree/bitmap scalar indexes — Lance "
  * automatically selects appropriate indexes (btree, bitmap, zonemap)
  * during query execution based on the pushed-down predicates"
  * (reference docs/src/performance.md "Index Usage"; scans opt in via
  * `useScalarIndex(true)`, LanceFragmentPageSource.java:126). Zone maps
  * (`graft.format.ZoneMaps`) are the zonemap leg; this is the
  * btree/bitmap leg: an inverted (value-hash -> fragment ids) posting
  * table that prunes fragments for `=` / `IN` predicates even when
  * every fragment spans the full value range and min/max stats cannot
  * exclude anything.
  *
  * Layout: `_indices/<col>.btree/v=<tableVersion>/` holding
  *   - `_meta.json` — `{"buckets": B}`
  *   - `bucket=<b>/part-*.json` — JSON lines `{"vh": <xxhash64 of the
  *     value>, "frags": [fragmentId, ...]}`, one file per hash bucket.
  *
  * Scale shape (100 TB): the build is one linear scan projecting two
  * narrow longs, one distinct shuffle of (valueHash, fragmentId) pairs
  * — output is bounded by sum over fragments of per-fragment distinct
  * counts, NOT row count — and a bucketed write. Lookups read ONE
  * bucket file per queried value (a few KB; B is sized so buckets stay
  * ~8k entries), so planning stays O(values) metadata I/O regardless of
  * table size. Hash collisions can only RETAIN an extra fragment, never
  * drop one that contains the value — pruning stays sound, and row
  * results are protected anyway because every pushed filter remains a
  * residual above the scan.
  *
  * Version discipline matches the vector indexes ([[VectorIndex]]): the
  * index names the exact table version it was built at; any commit
  * creates a new version and makes the index invisible (stale-proof),
  * and a time-travel read of the built version still sees it. Vacuum
  * GCs `v=<n>` dirs of dropped versions (Maintenance.vacuum).
  */
object ScalarIndex {

  private val Kind = "btree"
  private val TargetBucketEntries = 8192L
  private val MaxBuckets = 65536L
  /** Lookups with huge IN lists fall back to zone maps: reading one
    * bucket per value would cost more than it prunes. */
  val MaxLookupValues = 256

  def indexRoot(table: Path, col: String): Path =
    new Path(GraftFormat.indicesDir(table), s"$col.$Kind")

  private def versionDir(table: Path, col: String, v: Long): Path =
    new Path(indexRoot(table, col), s"v=$v")

  // ------------------------------------------------------------- build

  /** Build (or rebuild) the scalar index for `c` at the table's latest
    * version. Returns the indexed version. */
  def build(spark: SparkSession, table: Path, c: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val manifest = GraftFormat.readLatest(fs, qual).getOrElse(
      throw new IllegalArgumentException(s"not a graft table: $table"))
    require(manifest.schema.fieldNames.contains(c),
      s"no such column: $c")
    val dest = versionDir(qual, c, manifest.version)
    // a rebuild at a version that previously held a refreshed (manifest-
    // bearing) index must drop the manifest, or readers would resolve
    // the stale segment list instead of the fresh monolithic payload
    fs.delete(IndexSegments.manifestPath(dest), false)
    IndexSegments.invalidateDir(fs, dest) // rebuild replaces the chain
    writeSegment(spark, fs, qual, manifest, c, dest)
    manifest.version
  }

  /** One bucketed posting segment over `manifest`'s fragments, written
    * at `dest`. Returns the segment's ndv. */
  private def writeSegment(spark: SparkSession, fs: FileSystem, qual: Path,
      manifest: GraftFormat.Manifest, c: String, dest: Path): Long = {
    val conf = spark.sessionState.newHadoopConf()
    // deletion-aware snapshot scan through the normal connector reader;
    // the fragment id comes from the row address (frag << 32 | idx)
    val df = GraftShim.tableDF(spark,
      new GraftTable(s"index:$qual", qual, manifest, conf))
      .select(xxhash64(col(c)).as("vh"),
        expr(s"CAST(shiftright(${GraftTable.RowAddressName}, 32) AS INT)")
          .as("frag"))
      .distinct()
    df.persist()
    try {
      val nd = df.agg(approx_count_distinct(col("vh"))).head().getLong(0)
      val buckets =
        math.max(1L, math.min(MaxBuckets, nd / TargetBucketEntries + 1)).toInt
      df.withColumn("bucket", pmod(col("vh"), lit(buckets.toLong)).cast("int"))
        .groupBy(col("bucket"), col("vh"))
        .agg(sort_array(collect_set(col("frag"))).as("frags"))
        .repartition(buckets, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .json(dest.toString)
      // ndv rides along for the CBO stats feed (GraftScan.columnStats):
      // approximate (HyperLogLog++), the same fidelity ANALYZE TABLE
      // reports, and free — the build already computed it for sizing
      val out = fs.create(new Path(dest, "_meta.json"), true)
      try out.write(s"""{"buckets": $buckets, "ndv": $nd}""".getBytes("UTF-8"))
      finally out.close()
      // the build's own scan probes this very dir for the stats feed
      // (estimateStatistics -> ndvAt) before the meta exists, negative-
      // caching it — drop that entry or the fresh index stays invisible
      // to this driver until a cache sweep
      metaCache.remove(dest.toString)
      segCache.remove(dest.toString)
      nd
    } finally df.unpersist()
  }

  // ----------------------------------------------------------- refresh

  /** Incremental refresh-on-append: index ONLY the fragments committed
    * since the newest indexed version and publish the result as a
    * merge-on-read segment list at the current version (see
    * [[IndexSegments]]). Falls back to a full [[build]] when there is
    * no prior index, the prior manifest was vacuumed, or old fragments
    * were mutated (deletes/compaction) — stale postings may only ever
    * RETAIN a fragment, never serve one, and mutation breaks even that.
    * Cost on the append-only fast path: one scan of the appended
    * fragments plus O(index metadata); the existing corpus is never
    * re-read. Returns the indexed version. */
  def refresh(spark: SparkSession, table: Path, c: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val manifest = GraftFormat.readLatest(fs, qual).getOrElse(
      throw new IllegalArgumentException(s"not a graft table: $table"))
    val prior = indexedVersions(spark, table, c).filter(_ <= manifest.version)
    if (prior.isEmpty) return build(spark, table, c)
    val v1 = prior.max
    if (v1 == manifest.version) return v1
    val oldManifest =
      try GraftFormat.readManifest(fs, qual, v1)
      catch { case _: java.io.FileNotFoundException => return build(spark, table, c) }
    GraftFormat.appendedDelta(oldManifest, manifest) match {
      case None => build(spark, table, c)
      case Some(delta) =>
        val root = indexRoot(qual, c)
        val priorDir = versionDir(qual, c, v1)
        val priorSegs = IndexSegments.expandPrior(fs, root, priorDir)
        val dest = versionDir(qual, c, manifest.version)
        val segs =
          if (delta.isEmpty) priorSegs
          else {
            val segName = IndexSegments.newSegmentName()
            // clustering claims talk about fragments the delta manifest
            // does not carry — strip them so the subset scan plans plain
            writeSegment(spark, fs, qual,
              manifest.copy(fragments = delta,
                properties = manifest.properties -- GraftFormat.ClusteringProps),
              c, new Path(root, segName))
            priorSegs :+ segName
          }
        // merged ndv for the CBO feed: values recur across segments, so
        // re-estimate over the UNION of posting keys — an index-sized
        // read (distinct values), never a corpus re-scan
        val vhSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vh",
            org.apache.spark.sql.types.LongType)))
        val ndv = segs.map(s => spark.read.schema(vhSchema)
            .json(new Path(root, s).toString).select("vh"))
          .reduce(_ unionAll _)
          .agg(approx_count_distinct(col("vh"))).head().getLong(0)
        IndexSegments.write(fs, dest,
          IndexSegments.SegManifest(segs, Map("ndv" -> ndv.toString)))
        segCache.remove(dest.toString)
        metaCache.remove(dest.toString)
        manifest.version
    }
  }

  // ------------------------------------------------------------ lookup

  // Driver-side caches keyed by the (already version-specific) dir
  // string, so staleness is impossible by construction. Meta cache
  // holds MetaEntry (bucket count + optional ndv) or NoMeta; bucket
  // cache holds the parsed posting map.
  private final case class MetaEntry(buckets: Int, ndv: Long) // ndv -1 = absent
  private val NoMeta = MetaEntry(-1, -1)
  private val metaCache = new ConcurrentHashMap[String, MetaEntry]()
  private val bucketCache =
    new ConcurrentHashMap[String, Map[Long, Array[Int]]]()
  private val segCache =
    new ConcurrentHashMap[String, Option[IndexSegments.SegManifest]]()
  private val mapper = new ObjectMapper()

  private[graft] def clearCaches(): Unit =
    { metaCache.clear(); bucketCache.clear(); segCache.clear() }

  private def segManifest(fs: FileSystem,
      dir: Path): Option[IndexSegments.SegManifest] = {
    val key = dir.toString
    val cached = segCache.get(key)
    if (cached != null) return cached
    val res = IndexSegments.read(fs, dir)
    if (segCache.size > 4096) segCache.clear()
    segCache.put(key, res)
    res
  }

  private def readMetaEntry(fs: FileSystem, dir: Path): Option[MetaEntry] = {
    val key = dir.toString
    val cached = metaCache.get(key)
    if (cached != null) return if (cached == NoMeta) None else Some(cached)
    val metaPath = new Path(dir, "_meta.json")
    val res =
      if (!fs.exists(metaPath)) None
      else {
        val in = fs.open(metaPath)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val node = mapper.readTree(txt)
        Some(MetaEntry(node.get("buckets").asInt(),
          // pre-round-8 indexes have no ndv field
          Option(node.get("ndv")).map(_.asLong()).getOrElse(-1L)))
      }
    if (metaCache.size > 4096) metaCache.clear()
    metaCache.put(key, res.getOrElse(NoMeta))
    res
  }

  private def readMeta(fs: FileSystem, dir: Path): Option[Int] =
    readMetaEntry(fs, dir).map(_.buckets)

  /** Build-time distinct-value count (HLL-approximate) of the index at
    * exactly `version`, for the CBO stats feed. None = no index at this
    * version or a pre-ndv index layout. One cached _meta.json read —
    * never touches postings. */
  def ndvAt(fs: FileSystem, table: Path, version: Long, c: String): Option[Long] = {
    val dir = versionDir(fs.makeQualified(table), c, version)
    segManifest(fs, dir) match {
      // refreshed (segmented) index: the merged estimate lives in the
      // version's segment manifest
      case Some(m) => m.extra.get("ndv").flatMap(_.toLongOption).filter(_ >= 0)
      case None => readMetaEntry(fs, dir).map(_.ndv).filter(_ >= 0)
    }
  }

  private def readBucket(fs: FileSystem, dir: Path,
      b: Int): Map[Long, Array[Int]] = {
    val bucketDir = new Path(dir, s"bucket=$b")
    val key = bucketDir.toString
    val cached = bucketCache.get(key)
    if (cached != null) return cached
    val out = mutable.HashMap.empty[Long, Array[Int]]
    if (fs.exists(bucketDir)) {
      fs.listStatus(bucketDir).filter(st =>
          st.isFile && st.getPath.getName.endsWith(".json")).foreach { st =>
        val in = fs.open(st.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).foreach { line =>
            val node = mapper.readTree(line)
            val frags = node.get("frags")
            val arr = new Array[Int](frags.size())
            var i = 0
            while (i < arr.length) { arr(i) = frags.get(i).asInt(); i += 1 }
            out.put(node.get("vh").asLong(), arr)
          }
        finally in.close()
      }
    }
    val m = out.toMap
    if (bucketCache.size > 4096) bucketCache.clear()
    bucketCache.put(key, m)
    m
  }

  /** xxhash64 of a plan-time literal, computed with the SAME Catalyst
    * expression the build used on the column — bit-identical by
    * construction. */
  private[graft] def hashValue(value: Any, dt: DataType): Long =
    XxHash64(Seq(Literal.create(value, dt)), 42L)
      .eval(InternalRow.empty).asInstanceOf[Long]

  /** Fragment ids that may contain ANY of `values` for column `c`,
    * according to the index built at exactly `version`. None = no index
    * at this version (caller must not prune). */
  def fragmentsForValues(fs: FileSystem, table: Path, version: Long,
      c: String, dt: DataType, values: Seq[Any]): Option[Set[Int]] = {
    if (values.isEmpty || values.length > MaxLookupValues) return None
    val qual = fs.makeQualified(table)
    val dir = versionDir(qual, c, version)
    // merge-on-read: a refreshed index is a list of posting segments
    // (each with its own bucket count); a lookup probes ONE bucket per
    // (value, segment) and unions — fragment count stays O(values ×
    // segments) metadata I/O
    val dirs = IndexSegments.dataDirs(fs, indexRoot(qual, c), dir)
    if (dirs.isEmpty) return None
    val withBuckets = dirs.map(d => d -> readMeta(fs, d))
    // any segment without readable meta makes pruning unsound — serve
    // "no index" rather than a partial answer
    if (withBuckets.exists(_._2.isEmpty)) return None
    val allowed = mutable.HashSet.empty[Int]
    withBuckets.foreach { case (d, bucketsOpt) =>
      val buckets = bucketsOpt.get
      values.foreach { v =>
        val vh = hashValue(v, dt)
        val b = java.lang.Math.floorMod(vh, buckets.toLong).toInt
        readBucket(fs, d, b).get(vh).foreach(allowed ++= _)
      }
    }
    Some(allowed.toSet)
  }

  /** Versions with a persisted scalar index for `c`. */
  def indexedVersions(spark: SparkSession, table: Path, c: String): Seq[Long] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val root = indexRoot(fs.makeQualified(table), c)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }
}
