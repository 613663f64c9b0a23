package graft.connector

import java.nio.file.{Path, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{AlwaysTrue, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.format.GraftFormat
import graft.format.GraftFormat.{FragmentMeta, Manifest}

/** DSv2 Table over a graft-format directory, pinned to one manifest
  * version (snapshot isolation — the reference pins the dataset version
  * in the table handle the same way, LanceTableHandle.java:48,246-254).
  *
  * Capabilities mirror SURVEY.md section 2: batch read with
  * filter/projection/limit/count(*) pushdown (P1/P3/O1/A1), batch
  * append/truncate writes (D2-D4), merge-on-read DELETE via deletion
  * vectors (D5), `_row_address` metadata column, and statistics for the
  * CBO (D9).
  */
class GraftTable(
    tableName: String,
    val dir: Path,
    val manifest: Manifest)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete
  with SupportsMetadataColumns {

  val dataSchema: StructType = manifest.schema

  override def name(): String = tableName
  override def schema(): StructType = dataSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.V1_BATCH_WRITE)

  override def properties(): JMap[String, String] =
    Map(
      "format" -> "graft",
      "version" -> manifest.version.toString,
      "operation" -> manifest.operation,
      "fragments" -> manifest.fragments.size.toString).asJava

  /** Hidden columns: `_row_address` always; per blob column the
    * `<col>__blob_pos` / `<col>__blob_size` descriptor pair
    * (reference: BlobUtils.java:26-27,70-78 — selectable by name,
    * hidden from DESCRIBE). */
  override def metadataColumns(): Array[MetadataColumn] =
    GraftTable.RowAddressColumn +: manifest.blobColumns.flatMap { c =>
      Seq(
        GraftTable.blobMetaColumn(graft.format.BlobStore.posColumn(c),
          s"byte offset of $c content in its blob sidecar file"),
        GraftTable.blobMetaColumn(graft.format.BlobStore.sizeColumn(c),
          s"byte length of $c content"))
    }.toArray

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(this, info)

  // ---------------------------------------------------------------- DELETE
  // Merge-on-read row-level delete (reference: LanceMergeSink +
  // finishMerge, LanceMetadata.java:1116-1271): evaluate the predicate
  // distributed with parquet row indexes, merge new deletions with
  // existing ones PER FRAGMENT (the reference guards exactly this
  // last-writer-wins trap at LanceMetadata.java:1199-1235), drop
  // fully-deleted fragments, commit one Update version.

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => FilterToColumn.convert(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = SparkSession.active
    val cond = filters.map(f => FilterToColumn.convert(f).getOrElse(
      throw new UnsupportedOperationException(s"unsupported delete filter $f")))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))

    val byPath: Map[String, FragmentMeta] =
      manifest.fragments.map(f => dir.resolve(f.path).toUri.getPath -> f).toMap
    if (byPath.isEmpty) return

    // distributed predicate evaluation over all fragments at once
    // (blob columns read as descriptor structs; predicates on them are
    // rejected by canDeleteWhere's converter anyway)
    val physSchema = graft.format.BlobStore.physicalSchema(
      dataSchema, manifest.blobColumns)
    val hits = spark.read.schema(physSchema)
      .parquet(byPath.keys.toSeq: _*)
      .where(cond)
      .select(col("_metadata.file_path"), col("_metadata.row_index"))
      .collect()
      .groupBy(r => r.getString(0))
      .map { case (p, rows) => p -> rows.map(_.getLong(1)) }

    GraftFormat.commitWithRetry(dir) { latestOpt =>
      val latest = latestOpt.getOrElse(
        throw new IllegalStateException(s"table vanished under delete: $dir"))
      val v = latest.version + 1
      val newFrags = latest.fragments.flatMap { f =>
        val abs = "file://" + dir.resolve(f.path).toUri.getPath
        val abs2 = dir.resolve(f.path).toUri.getPath
        val newDels = hits.collectFirst {
          case (p, idxs) if p == abs || p == abs2 || p.endsWith("/" + f.path) => idxs
        }.getOrElse(Array.empty[Long])
        if (newDels.isEmpty) Some(f)
        else {
          val existing = f.deletionPath
            .map(GraftFormat.readDeletionFile(dir, _)).getOrElse(Array.empty[Long])
          val merged = (existing ++ newDels).distinct.sorted
          if (merged.length >= f.rowCount) None // fragment fully deleted
          else {
            val delPath = GraftFormat.writeDeletionFile(dir, f.id, v, merged)
            Some(f.copy(deletionPath = Some(delPath),
              deletedCount = merged.length.toLong))
          }
        }
      }
      latest.copy(version = v, fragments = newFrags,
        createdAtMs = System.currentTimeMillis(), operation = "Update")
    }
  }
}

object GraftTable {
  /** Hidden 64-bit row identity (fragmentId << 32) | rowIndex —
    * reference: RowAddress.java:24-42. */
  val RowAddressName = "_row_address"

  object RowAddressColumn extends MetadataColumn {
    override def name(): String = RowAddressName
    override def dataType(): DataType = LongType
    override def isNullable: Boolean = false
    override def comment(): String =
      "row address: (fragment_id << 32) | row_index"
  }

  def blobMetaColumn(colName: String, doc: String): MetadataColumn =
    new MetadataColumn {
      override def name(): String = colName
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = true
      override def comment(): String = doc
    }
}

/** V1 sources.Filter -> Column translation for deleteWhere. */
object FilterToColumn {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.sources._

  def convert(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) => for (lc <- convert(l); rc <- convert(r)) yield lc && rc
    case Or(l, r) => for (lc <- convert(l); rc <- convert(r)) yield lc || rc
    case Not(c) => convert(c).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
