package graft.format

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.types.{DataType, StructType}

/** The graft table format: a Lance-semantics versioned columnar layout
  * implemented natively on parquet fragments.
  *
  * Layout of a table directory `<name>.graft/` (mirrors the reference's
  * observable layout, reference: test/resources/example_db/<table>.lance
  * and LanceRuntime.java:361-388):
  *
  *   _versions/<n>.manifest.json   one immutable manifest per committed
  *                                 version (MVCC; time travel resolves here)
  *   data/<uuid>.parquet           immutable fragment data files
  *   _deletions/<frag>-<v>-<uuid>.json
  *                                 merge-on-read deletion vectors
  *
  * Concurrency: commits are optimistic-CAS — a manifest file is created
  * with CREATE_NEW (atomic on POSIX); losing a race throws
  * [[CommitConflictException]] and the caller re-reads + retries. This is
  * deliberately stronger than the reference, which detects conflicts by
  * matching exception message strings (LanceMetadata.java:1492-1513).
  *
  * Scale notes: the manifest holds O(fragments) metadata only; deletion
  * vectors are per-fragment sidecars (at 100 TB they'd be roaring
  * bitmaps — the JSON encoding here is an encoding detail behind
  * [[DeletionVector]], not a design constraint). Fragment data files are
  * the unit of parallelism: one Spark InputPartition each.
  */
object GraftFormat {

  /** One immutable data fragment + its (optional) deletion vector. */
  final case class FragmentMeta(
      id: Int,
      path: String,           // relative to table dir
      rowCount: Long,         // physical rows in the parquet file
      deletionPath: Option[String],
      deletedCount: Long) {
    def liveRows: Long = rowCount - deletedCount
  }

  /** One committed table version. */
  final case class Manifest(
      version: Long,
      schemaJson: String,
      fragments: Seq[FragmentMeta],
      maxFragmentId: Int,
      createdAtMs: Long,
      operation: String,      // Append | Overwrite | Update | Create
      properties: Map[String, String] = Map.empty) {
    def schema: StructType =
      DataType.fromJson(schemaJson).asInstanceOf[StructType]
    def liveRows: Long = fragments.map(_.liveRows).sum
    /** Columns declared blob (out-of-line binary) via table property
      * `blob_columns` — reference: LanceTableProperties.java:32,44-48. */
    def blobColumns: Seq[String] = properties.get("blob_columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
  }

  final class CommitConflictException(msg: String)
      extends RuntimeException(msg)

  private def versionsDir(table: Path): Path = table.resolve("_versions")
  def dataDir(table: Path): Path = table.resolve("data")
  def deletionsDir(table: Path): Path = table.resolve("_deletions")

  private def manifestPath(table: Path, v: Long): Path =
    versionsDir(table).resolve(s"$v.manifest.json")

  def exists(table: Path): Boolean = Files.isDirectory(versionsDir(table))

  def init(table: Path): Unit = {
    Files.createDirectories(versionsDir(table))
    Files.createDirectories(dataDir(table))
    Files.createDirectories(deletionsDir(table))
  }

  def listVersions(table: Path): Seq[Long] = {
    val dir = versionsDir(table)
    if (!Files.isDirectory(dir)) return Seq.empty
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".manifest.json"))
      .map(_.stripSuffix(".manifest.json").toLong)
      .toSeq.sorted
  }

  def latestVersion(table: Path): Option[Long] = listVersions(table).lastOption

  /** Latest version whose commit time is <= tsMs (reference semantics:
    * getVersionAtTimestamp walks listVersions, LanceRuntime.java:361-388). */
  def versionAtTimestamp(table: Path, tsMs: Long): Option[Long] = {
    val at = listVersions(table)
      .map(v => v -> readManifest(table, v).createdAtMs)
      .filter(_._2 <= tsMs)
    at.lastOption.map(_._1)
  }

  // ---------------------------------------------------------------- JSON
  // Hand-rolled, dependency-free codec for the manifest envelope; the
  // schema payload uses Spark's own StructType JSON form.

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def fragJson(f: FragmentMeta): String = {
    val del = f.deletionPath.map(p => s""""${esc(p)}"""").getOrElse("null")
    s"""{"id":${f.id},"path":"${esc(f.path)}","rowCount":${f.rowCount},""" +
      s""""deletionPath":$del,"deletedCount":${f.deletedCount}}"""
  }

  def toJson(m: Manifest): String = {
    val props = m.properties.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    s"""{"version":${m.version},"operation":"${esc(m.operation)}",""" +
      s""""createdAtMs":${m.createdAtMs},"maxFragmentId":${m.maxFragmentId},""" +
      s""""schemaJson":"${esc(m.schemaJson)}","properties":{$props},""" +
      s""""fragments":[${m.fragments.map(fragJson).mkString(",")}]}"""
  }

  def fromJson(s: String): Manifest = {
    // minimal recursive-descent JSON parser (objects/arrays/strings/
    // numbers/null only — exactly the manifest grammar)
    val p = new JsonParser(s)
    val root = p.parseValue().asInstanceOf[Map[String, Any]]
    val frags = root("fragments").asInstanceOf[Seq[Any]].map { fAny =>
      val f = fAny.asInstanceOf[Map[String, Any]]
      FragmentMeta(
        id = f("id").asInstanceOf[Double].toInt,
        path = f("path").asInstanceOf[String],
        rowCount = f("rowCount").asInstanceOf[Double].toLong,
        deletionPath = Option(f("deletionPath")).collect { case s: String => s },
        deletedCount = f("deletedCount").asInstanceOf[Double].toLong)
    }
    Manifest(
      version = root("version").asInstanceOf[Double].toLong,
      schemaJson = root("schemaJson").asInstanceOf[String],
      fragments = frags,
      maxFragmentId = root("maxFragmentId").asInstanceOf[Double].toInt,
      createdAtMs = root("createdAtMs").asInstanceOf[Double].toLong,
      operation = root("operation").asInstanceOf[String],
      properties = root.get("properties")
        .map(_.asInstanceOf[Map[String, Any]].map {
          case (k, v) => k -> v.asInstanceOf[String]
        }).getOrElse(Map.empty))
  }

  def readManifest(table: Path, version: Long): Manifest =
    fromJson(new String(Files.readAllBytes(manifestPath(table, version)), UTF_8))

  def readLatest(table: Path): Option[Manifest] =
    latestVersion(table).map(readManifest(table, _))

  /** Atomic CAS commit of version m.version; throws on lost race. */
  def commit(table: Path, m: Manifest): Unit = {
    init(table)
    val target = manifestPath(table, m.version)
    try {
      Files.write(target, toJson(m).getBytes(UTF_8),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"version ${m.version} already committed at $table")
    }
  }

  /** Retry loop for append-style commits: rebuild the manifest from the
    * freshest base on each conflict. */
  def commitWithRetry(table: Path, maxAttempts: Int = 10)(
      build: Option[Manifest] => Manifest): Manifest = {
    var attempt = 0
    while (true) {
      attempt += 1
      val m = build(readLatest(table))
      try { commit(table, m); return m }
      catch {
        case e: CommitConflictException if attempt < maxAttempts => // retry
        case NonFatal(e) => throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ------------------------------------------------------- deletion files

  /** Write a deletion vector (sorted distinct row indexes) for fragment
    * fragId at table version v. */
  def writeDeletionFile(table: Path, fragId: Int, v: Long,
      rowIndexes: Array[Long]): String = {
    val name = s"$fragId-$v-${java.util.UUID.randomUUID()}.json"
    val path = deletionsDir(table).resolve(name)
    val sorted = rowIndexes.distinct.sorted
    Files.write(path,
      sorted.mkString("[", ",", "]").getBytes(UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    s"_deletions/$name"
  }

  def readDeletionFile(table: Path, relPath: String): Array[Long] = {
    val s = new String(Files.readAllBytes(table.resolve(relPath)), UTF_8).trim
    if (s == "[]") Array.empty[Long]
    else s.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.toLong)
  }

  /** Row address: (fragmentId << 32) | rowIndex — the reference's 64-bit
    * row identity (RowAddress.java:29-42). */
  def rowAddress(fragId: Int, rowIndex: Long): Long =
    (fragId.toLong << 32) | rowIndex
}

/** Tiny JSON parser for the manifest grammar (numbers parsed as Double;
  * manifest values stay under 2^53 so this is lossless). */
private[format] final class JsonParser(s: String) {
  private var i = 0
  private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
  def parseValue(): Any = {
    ws()
    s.charAt(i) match {
      case '{' => parseObj()
      case '[' => parseArr()
      case '"' => parseStr()
      case 'n' => i += 4; null
      case 't' => i += 4; true
      case 'f' => i += 5; false
      case _ => parseNum()
    }
  }
  private def parseObj(): Map[String, Any] = {
    i += 1; ws()
    val b = Map.newBuilder[String, Any]
    if (s.charAt(i) == '}') { i += 1; return b.result() }
    while (true) {
      ws()
      val k = parseStr()
      ws(); require(s.charAt(i) == ':'); i += 1
      b += k -> parseValue()
      ws()
      s.charAt(i) match {
        case ',' => i += 1
        case '}' => i += 1; return b.result()
        case c => throw new IllegalArgumentException(s"bad json at $i: $c")
      }
    }
    b.result()
  }
  private def parseArr(): Seq[Any] = {
    i += 1; ws()
    val b = Seq.newBuilder[Any]
    if (s.charAt(i) == ']') { i += 1; return b.result() }
    while (true) {
      b += parseValue()
      ws()
      s.charAt(i) match {
        case ',' => i += 1
        case ']' => i += 1; return b.result()
        case c => throw new IllegalArgumentException(s"bad json at $i: $c")
      }
    }
    b.result()
  }
  private def parseStr(): String = {
    require(s.charAt(i) == '"'); i += 1
    val sb = new StringBuilder
    while (s.charAt(i) != '"') {
      val c = s.charAt(i)
      if (c == '\\') {
        i += 1
        s.charAt(i) match {
          case '"' => sb += '"'
          case '\\' => sb += '\\'
          case 'n' => sb += '\n'
          case 'r' => sb += '\r'
          case 't' => sb += '\t'
          case 'u' =>
            sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
            i += 4
          case o => sb += o
        }
      } else sb += c
      i += 1
    }
    i += 1
    sb.toString
  }
  private def parseNum(): Double = {
    val start = i
    while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
    s.substring(start, i).toDouble
  }
}
