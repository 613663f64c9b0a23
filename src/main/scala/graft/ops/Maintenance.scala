package graft.ops

import java.nio.file.{Files, Path}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.format.{BlobStore, GraftFormat}
import graft.format.GraftFormat.{FragmentMeta, Manifest}

/** Table-maintenance operations the reference does not ship but a
  * 100 TB lakehouse cannot live without:
  *
  *  - [[compact]]: rewrite fragments below a size threshold into full
  *    fragments, folding deletion vectors in (physical delete). Reads
  *    and the rewrite are distributed; the commit is one manifest CAS.
  *    Untouched fragments keep their ids, so time travel and streaming
  *    offsets stay valid for them.
  *  - [[vacuum]]: delete data/deletion files not referenced by any
  *    retained manifest version (after dropping history older than
  *    `keepVersions`). Time travel works within the retained window.
  */
object Maintenance {

  /** Compact fragments with fewer than `minRows` live rows (or with any
    * deletions when `foldDeletes`). Returns number of fragments
    * compacted. */
  def compact(
      spark: SparkSession,
      dir: Path,
      minRows: Long = 1000000L,
      foldDeletes: Boolean = true): Int = {
    val manifest = GraftFormat.readLatest(dir).getOrElse(
      throw new IllegalArgumentException(s"not a graft table: $dir"))
    val (small, keep) = manifest.fragments.partition(f =>
      f.liveRows < minRows || (foldDeletes && f.deletedCount > 0))
    if (small.size <= 1 && !small.exists(_.deletedCount > 0)) return 0

    // distributed rewrite of the small fragments' LIVE rows
    val physSchema = BlobStore.physicalSchema(
      manifest.schema, manifest.blobColumns)
    val paths = small.map(f => dir.resolve(f.path).toUri.getPath)
    val deleted = small.filter(_.deletionPath.isDefined).map(f =>
      dir.resolve(f.path).toUri.getPath ->
        GraftFormat.readDeletionFile(dir, f.deletionPath.get).toSet)
    import org.apache.spark.sql.functions.col
    val live = deleted.foldLeft(
      spark.read.schema(physSchema).parquet(paths: _*)
        .withColumn("__p", col("_metadata.file_path"))
        .withColumn("__i", col("_metadata.row_index"))) {
      case (df, (p, dels)) =>
        df.filter(!(col("__p").endsWith(p) && col("__i").isin(dels.toSeq: _*)))
    }.drop("__p", "__i")

    val staging = dir.resolve(s".staging-${UUID.randomUUID()}")
    // coalesce toward target-size fragments: one output file per
    // minRows-worth of rows (>= 1)
    val total = small.map(_.liveRows).sum
    val nOut = math.max(1, (total / math.max(1L, minRows)).toInt)
    live.coalesce(nOut).write.parquet(staging.toUri.toString)
    val conf = spark.sessionState.newHadoopConf()
    val moved = Files.list(staging).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
      .map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toUri), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val n = try r.getRecordCount finally r.close()
        val name = s"${UUID.randomUUID()}.parquet"
        Files.move(p, GraftFormat.dataDir(dir).resolve(name))
        (s"data/$name", n)
      }.filter(_._2 > 0)
    Files.list(staging).iterator().asScala.foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(staging)

    val smallIds = small.map(_.id).toSet
    GraftFormat.commitWithRetry(dir) { latestOpt =>
      val latest = latestOpt.getOrElse(
        throw new IllegalStateException(s"table vanished during compact: $dir"))
      // conflict safety: if a concurrent commit touched any compacted
      // fragment, abort rather than resurrect stale data
      val changed = latest.fragments.filter(f => smallIds.contains(f.id))
      if (changed.map(f => (f.id, f.deletionPath, f.deletedCount)).toSet !=
          small.map(f => (f.id, f.deletionPath, f.deletedCount)).toSet)
        throw new GraftFormat.CommitConflictException(
          "concurrent modification of fragments being compacted")
      var nextId = latest.maxFragmentId
      val newFrags = moved.map { case (rel, n) =>
        nextId += 1
        FragmentMeta(nextId, rel, n, None, 0L)
      }
      latest.copy(
        version = latest.version + 1,
        fragments = latest.fragments.filterNot(f => smallIds.contains(f.id))
          ++ newFrags,
        maxFragmentId = nextId,
        createdAtMs = System.currentTimeMillis(),
        operation = "Compact")
    }
    small.size
  }

  /** Drop manifest history beyond the latest `keepVersions` versions,
    * then delete any data/deletion/blob file not referenced by a
    * retained manifest. Returns (versionsDropped, filesDeleted). */
  def vacuum(dir: Path, keepVersions: Int = 10): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val versions = GraftFormat.listVersions(dir)
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepVersions))
    val retained = keep.map(GraftFormat.readManifest(dir, _))
    val referenced: Set[String] = retained.flatMap { m =>
      m.fragments.flatMap(f => f.path +: f.deletionPath.toSeq)
    }.toSet
    // blob sidecars stay referenced through fragment descriptors, which
    // we cannot see from the manifest alone — conservatively retain the
    // whole blobs dir (a full blob GC needs a descriptor scan).
    drop.foreach(v => Files.deleteIfExists(
      dir.resolve("_versions").resolve(s"$v.manifest.json")))
    var deleted = 0
    for (sub <- Seq("data", "_deletions")) {
      val d = dir.resolve(sub)
      if (Files.isDirectory(d)) {
        Files.list(d).iterator().asScala.toSeq.foreach { p =>
          if (Files.isRegularFile(p)) {
            val rel = s"$sub/${p.getFileName}"
            if (!referenced.contains(rel)) {
              Files.delete(p)
              deleted += 1
            }
          }
        }
      }
    }
    (drop.size, deleted)
  }
}
