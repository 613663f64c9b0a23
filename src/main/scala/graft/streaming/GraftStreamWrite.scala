package graft.streaming

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.util.SerializableConfiguration

import graft.connector.{GraftTable, NewFileInfo}
import graft.format.{FragmentStats, GraftFormat}
import graft.format.GraftFormat.{FragmentMeta, Manifest}

/** Structured Streaming SINK for graft tables (SURVEY.md 2.8 — the
  * write half of the streaming extension; the reference has no
  * streaming surface at all). Each task streams its rows into one new
  * parquet fragment via Spark's parquet writer; each epoch commits ONE
  * manifest version (Append).
  *
  * Exactly-once: the committed manifest records
  * `stream_epoch.<queryId> = epochId` in its properties; a replayed
  * epoch (task retry after driver recovery) sees its id already
  * committed and skips — fragments written by the losing attempt stay
  * unreferenced (vacuum collects them). This is the same
  * idempotent-commit pattern Delta/Iceberg sinks use, expressed over the
  * graft CAS commit.
  *
  * Scale: data never touches the driver; the per-epoch commit is
  * O(new fragments) metadata.
  */
class GraftStreamingWrite(table: GraftTable, info: LogicalWriteInfo)
  extends StreamingWrite {

  private val qualDir: Path = table.fs.makeQualified(table.dir)
  private val queryId: String = info.queryId()
  private val sconf = new SerializableConfiguration(
    org.apache.spark.sql.GraftShim.parquetWriteConf(
      org.apache.spark.sql.SparkSession.active, info.schema()))

  private def epochKey = s"stream_epoch.$queryId"

  override def createStreamingWriterFactory(
      pinfo: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(qualDir.toString, sconf)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case m: GraftStreamCommit => m.files
    }.flatten.toSeq
    val fs = qualDir.getFileSystem(sconf.value)
    try {
      GraftFormat.commitWithRetry(fs, qualDir) { latestOpt =>
        val latest = latestOpt.getOrElse(throw new IllegalStateException(
          s"streaming sink target vanished: $qualDir"))
        if (latest.properties.get(epochKey).exists(_.toLong >= epochId))
          // epoch replay after recovery: already committed, idempotent skip
          throw new AlreadyCommittedEpoch
        var nextId = latest.maxFragmentId
        val newFrags = files.map { fi =>
          nextId += 1
          FragmentMeta(nextId, fi.relPath, fi.rows, None, 0L, fi.sizeBytes, fi.stats)
        }
        latest.copy(
          version = latest.version + 1,
          fragments = latest.fragments ++ newFrags,
          maxFragmentId = nextId,
          createdAtMs = System.currentTimeMillis(),
          operation = "Append",
          properties = latest.properties -- GraftFormat.ClusteringProps
            + (epochKey -> epochId.toString))
      }
    } catch {
      case _: AlreadyCommittedEpoch => // replayed epoch: drop duplicates
        abort(epochId, messages)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = qualDir.getFileSystem(sconf.value)
    messages.collect { case m: GraftStreamCommit => m }.foreach { m =>
      m.files.foreach { fi =>
        try fs.delete(new Path(qualDir, fi.relPath), false)
        catch { case _: Exception => () }
      }
    }
  }

  private class AlreadyCommittedEpoch extends RuntimeException
}

final case class GraftStreamCommit(files: Seq[NewFileInfo])
  extends WriterCommitMessage

class GraftStreamingWriterFactory(
    tableDirStr: String,
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftStreamingDataWriter(tableDirStr, conf)
}

class GraftStreamingDataWriter(
    tableDirStr: String,
    conf: SerializableConfiguration)
  extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val tableDir = new Path(tableDirStr)
  private lazy val fs = tableDir.getFileSystem(conf.value)
  private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = null
  private var fileRel: String = null
  private var fileAbs: Path = null

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      val name = s"${UUID.randomUUID()}.parquet"
      fileRel = s"data/$name"
      fileAbs = new Path(GraftFormat.dataDir(tableDir), name)
      writer = org.apache.spark.sql.GraftShim.newParquetRowWriter(
        fileAbs.toString, conf.value)
    }
    writer.write(row)
  }

  override def commit(): WriterCommitMessage = {
    if (writer == null) return GraftStreamCommit(Seq.empty)
    writer.close(); writer = null
    val (rows, size, stats) = FragmentStats.readFooter(fs, conf.value, fileAbs)
    if (rows == 0) { fs.delete(fileAbs, false); GraftStreamCommit(Seq.empty) }
    else GraftStreamCommit(Seq(NewFileInfo(fileRel, rows, size, stats)))
  }

  override def abort(): Unit = {
    if (writer != null) { try writer.close() catch { case _: Exception => () } }
    if (fileAbs != null) {
      try fs.delete(fileAbs, false) catch { case _: Exception => () }
    }
  }

  override def close(): Unit = ()
}
