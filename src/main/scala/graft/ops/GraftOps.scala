package graft.ops

import java.nio.file.{Files, Path}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.format.GraftFormat
import graft.format.GraftFormat.{FragmentMeta, Manifest}

/** Row-level UPDATE and MERGE over graft tables — the reference's
  * merge-on-read `DELETE_ROW_AND_INSERT_ROW` paradigm (SURVEY.md
  * section 3.3; LanceMetadata.java:1116-1271) implemented Spark-first:
  *
  *   1. scan the pinned snapshot WITH physical row positions
  *      (parquet `_metadata.row_index`, fragment identity from file path)
  *   2. the touched rows' replacement images are written as NEW
  *      fragments by Spark's distributed parquet writer
  *   3. the old row positions become per-fragment deletion vectors,
  *      merged with any existing vectors PER FRAGMENT (the reference
  *      guards exactly this last-writer-wins trap,
  *      LanceMetadata.java:1199-1235)
  *   4. ONE manifest version commits deletions + new fragments together
  *      (atomic CAS; concurrent appends retry, conflicting row-level ops
  *      fail typed rather than corrupting)
  *
  * Scale: the predicate scan and the replacement write are fully
  * distributed; only per-fragment deletion index lists and O(files)
  * fragment metadata pass through the driver. At 100 TB the collected
  * deletion indexes per commit are bounded by the touched-row count of
  * the statement — the same contract as the reference's coordinator
  * merge — and would move to distributed deletion-vector writes with a
  * metadata-only commit.
  */
object GraftOps {

  /** UPDATE table SET assignments WHERE cond. Returns updated row count. */
  def update(
      spark: SparkSession,
      dir: Path,
      cond: Column,
      assignments: Map[String, Column]): Long = {
    val manifest = GraftFormat.readLatest(dir).getOrElse(
      throw new IllegalArgumentException(s"not a graft table: $dir"))
    val schema = manifest.schema
    val bad = assignments.keySet.diff(schema.fieldNames.toSet)
    require(bad.isEmpty, s"unknown columns in SET: $bad")

    val (hits, touched) = scanMatching(spark, dir, manifest, cond)
    if (touched == 0) return 0L

    // replacement images: matched rows with assignments applied
    val updatedRows = fragmentScan(spark, dir, manifest).where(cond)
      .select(schema.fieldNames.map(f =>
        assignments.getOrElse(f, col(f)).as(f)).toIndexedSeq: _*)

    commitDeltaAndInserts(spark, dir, updatedRows, hits)
    touched
  }

  /** MERGE INTO target USING source ON <cond>:
    *  - matched rows are replaced with `whenMatched` images
    *    (None = delete matched)
    *  - unmatched source rows are inserted via `whenNotMatched`
    *    (None = ignore)
    * Column maps produce the full target schema. Returns (updated,
    * inserted) counts. */
  def merge(
      spark: SparkSession,
      dir: Path,
      source: DataFrame,
      on: Column,
      whenMatched: Option[Map[String, Column]],
      whenNotMatched: Option[Map[String, Column]]): (Long, Long) = {
    val manifest = GraftFormat.readLatest(dir).getOrElse(
      throw new IllegalArgumentException(s"not a graft table: $dir"))
    val schema = manifest.schema
    val target = fragmentScan(spark, dir, manifest)

    val src = source.alias("s")
    val tgt = target.alias("t")

    // matched target rows carry their physical position for deletion
    val matched = tgt.join(src, on, "inner")
    val matchedPositions = matched
      .select(col("__frag_path").as("file_path"), col("__row_index").as("row_index"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nMatched = matchedPositions.length.toLong

    val replacementRows = whenMatched match {
      case Some(setMap) =>
        matched.select(schema.fieldNames.map(f =>
          setMap.getOrElse(f, col(s"t.$f")).as(f)).toIndexedSeq: _*)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

    val insertRows = whenNotMatched match {
      case Some(insMap) =>
        src.join(tgt, on, "left_anti")
          .select(schema.fieldNames.map(f =>
            insMap.getOrElse(f, lit(null).cast(
              schema(f).dataType)).as(f)).toIndexedSeq: _*)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val nInserted = insertRows.count()

    val hits = matchedPositions.groupBy(_._1)
      .map { case (p, arr) => p -> arr.map(_._2) }
    commitDeltaAndInserts(spark, dir, replacementRows.unionAll(insertRows), hits)
    (nMatched, nInserted)
  }

  // ------------------------------------------------------------------

  /** Snapshot scan of the fragments with physical position columns
    * (__frag_path, __row_index) for delete/update bookkeeping. */
  private def fragmentScan(
      spark: SparkSession, dir: Path, manifest: Manifest): DataFrame = {
    val paths = manifest.fragments.map(f => dir.resolve(f.path).toUri.getPath)
    if (paths.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], manifest.schema)
    val deletedByPath = manifest.fragments
      .filter(_.deletionPath.isDefined)
      .map(f => dir.resolve(f.path).toUri.getPath ->
        GraftFormat.readDeletionFile(dir, f.deletionPath.get).toSet)
    val raw = spark.read.schema(graft.format.BlobStore.physicalSchema(
        manifest.schema, manifest.blobColumns)).parquet(paths: _*)
      .withColumn("__frag_path", col("_metadata.file_path"))
      .withColumn("__row_index", col("_metadata.row_index"))
    // apply deletion vectors so updates never resurrect deleted rows
    deletedByPath.foldLeft(raw) { case (df, (p, dels)) =>
      df.filter(!(col("__frag_path").endsWith(p) &&
        col("__row_index").isin(dels.toSeq: _*)))
    }
  }

  private def scanMatching(
      spark: SparkSession, dir: Path, manifest: Manifest, cond: Column)
      : (Map[String, Array[Long]], Long) = {
    val rows = fragmentScan(spark, dir, manifest).where(cond)
      .select(col("__frag_path"), col("__row_index"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    (rows.groupBy(_._1).map { case (p, arr) => p -> arr.map(_._2) },
      rows.length.toLong)
  }

  /** One atomic commit: deletion vectors for `hits` + new fragments from
    * `newRows` (positions keyed by fragment file path). */
  private def commitDeltaAndInserts(
      spark: SparkSession,
      dir: Path,
      newRows: DataFrame,
      hits: Map[String, Array[Long]]): Unit = {
    // write replacement/insert fragments to data/ (invisible until commit)
    val staging = dir.resolve(s".staging-${UUID.randomUUID()}")
    val dataRows = newRows.drop("__frag_path", "__row_index")
    dataRows.write.parquet(staging.toUri.toString)
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

    GraftFormat.commitWithRetry(dir) { latestOpt =>
      val latest = latestOpt.getOrElse(
        throw new IllegalStateException(s"table vanished during update: $dir"))
      val v = latest.version + 1
      val withDeletes = latest.fragments.flatMap { f =>
        val abs = dir.resolve(f.path).toUri.getPath
        val newDels = hits.collectFirst {
          case (p, idxs) if p.endsWith(abs) || abs.endsWith(p) => idxs
        }.getOrElse(Array.empty[Long])
        if (newDels.isEmpty) Some(f)
        else {
          val existing = f.deletionPath
            .map(GraftFormat.readDeletionFile(dir, _))
            .getOrElse(Array.empty[Long])
          val merged = (existing ++ newDels).distinct.sorted
          if (merged.length >= f.rowCount) None
          else {
            val delPath = GraftFormat.writeDeletionFile(dir, f.id, v, merged)
            Some(f.copy(deletionPath = Some(delPath),
              deletedCount = merged.length.toLong))
          }
        }
      }
      var nextId = latest.maxFragmentId
      val newFrags = moved.map { case (rel, n) =>
        nextId += 1
        FragmentMeta(nextId, rel, n, None, 0L)
      }
      latest.copy(version = v, fragments = withDeletes ++ newFrags,
        maxFragmentId = nextId,
        createdAtMs = System.currentTimeMillis(), operation = "Update")
    }
  }
}
