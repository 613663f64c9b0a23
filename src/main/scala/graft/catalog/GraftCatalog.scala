package graft.catalog

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.connector.GraftTable
import graft.format.GraftFormat
import graft.format.GraftFormat.Manifest

/** Spark catalog plugin for graft-format tables (SURVEY.md section 2.7:
  * D1/D2/D6/D7/D8). Register with
  *
  *   spark.sql.catalog.graft           = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *
  * Namespaces are directories under the warehouse; a table named
  * `ns.t` lives at `<warehouse>/ns/t.graft/`. The warehouse is any
  * Hadoop-FS URI (file://, hdfs://, s3a://, ...) — the directory
  * namespace backend of the reference's namespace matrix
  * (LanceConfig.java:43-65); REST/Glue backends slot in behind the same
  * TableCatalog seam.
  *
  * Time travel (D7): `VERSION AS OF n` resolves an exact manifest
  * version; `TIMESTAMP AS OF ts` resolves the latest version committed
  * at-or-before ts (reference: getVersionAtTimestamp walking
  * listVersions, LanceRuntime.java:361-388). Every loadTable pins the
  * resolved manifest into the returned Table — snapshot isolation for
  * the whole query (D8, LanceTableHandle.java:48,246-254).
  *
  * Parity notes: RENAME TABLE is unsupported like the reference
  * (BaseLanceConnectorTest.java:89-96). ALTER TABLE ADD/DROP COLUMN and
  * SET/UNSET TBLPROPERTIES EXCEED the reference (whose only schema
  * change is CREATE OR REPLACE): an Evolve commit rewrites the manifest
  * schema only — zero data files touched; fragments written before an
  * ADD COLUMN null-fill the new column at read time (Spark's parquet
  * reader clips the requested schema against each file). RENAME COLUMN
  * stays unsupported by design: fragments bind columns BY NAME (no
  * field ids), so a rename would silently orphan existing data.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
  with StagingTableCatalog
  with org.apache.spark.sql.connector.catalog.FunctionCatalog
  with ProcedureCatalog {

  // SQL maintenance surface: CALL <cat>.system.compact(...) etc.
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident, { dotted =>
      val parts = dotted.split('.')
      require(parts.length >= 2, s"expected <namespace>.<table>, got '$dotted'")
      val dir = tableDir(Identifier.of(parts.init, parts.last))
      if (!GraftFormat.exists(fs, dir))
        throw new NoSuchTableException(Identifier.of(parts.init, parts.last))
      (dir, conf)
    })

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  /** FunctionCatalog: exposes the graft `bucket` function so Spark can
    * resolve the `bucket(n, col)` transform reported by bucketized
    * scans (storage-partitioned joins). */
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] = Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  private var catalogName: String = _
  private var warehouse: Path = _
  private var storageOptions: Map[String, String] = Map.empty
  @transient private var hadoopConf: Configuration = _

  private def conf: Configuration = {
    if (hadoopConf == null) {
      hadoopConf = SparkSession.active.sessionState.newHadoopConf()
      storageOptions.foreach { case (k, v) => hadoopConf.set(k, v) }
    }
    hadoopConf
  }
  private def fs: FileSystem = warehouse.getFileSystem(conf)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = new Path(Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option 'warehouse'")))
    // storage-options vending (reference: LanceMetadata.java:1319-1354):
    // catalog options prefixed `hadoop.` become Hadoop configuration for
    // every FileSystem this catalog resolves, e.g.
    //   spark.sql.catalog.g.hadoop.fs.s3a.access.key = ...
    storageOptions = GraftCatalog.hadoopOptions(options)
    fs.mkdirs(warehouse)
  }

  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)(new Path(_, _))

  private def tableDir(ident: Identifier): Path =
    new Path(nsDir(ident.namespace()), ident.name() + ".graft")

  private def isDir(p: Path): Boolean =
    try fs.getFileStatus(p).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!isDir(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir)
      .filter(st => st.isDirectory && st.getPath.getName.endsWith(".graft") &&
        GraftFormat.exists(fs, st.getPath))
      .map(st => Identifier.of(namespace,
        st.getPath.getName.stripSuffix(".graft")))
  }

  private def load(ident: Identifier, pick: Path => Option[Manifest]): Table = {
    val dir = tableDir(ident)
    if (!GraftFormat.exists(fs, dir)) throw new NoSuchTableException(ident)
    val manifest = pick(dir).getOrElse(throw new NoSuchTableException(ident))
    new GraftTable(ident.toString, dir, manifest, conf)
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, graft.format.ManifestCache.latest(fs, _))

  /** SQL `VERSION AS OF <n>`. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, { dir =>
      val v = try version.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"invalid version '$version' for table $ident (expected integer)")
      }
      if (!GraftFormat.listVersions(fs, dir).contains(v))
        throw new IllegalArgumentException(
          s"version $v does not exist for table $ident")
      Some(graft.format.ManifestCache.readPinned(fs, dir, v))
    })

  /** SQL `TIMESTAMP AS OF <ts>` (micros from Spark). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident, { dir =>
      GraftFormat.versionAtTimestamp(fs, dir, timestampMicros / 1000L)
        .map(graft.format.ManifestCache.readPinned(fs, dir, _))
        .orElse(throw new IllegalArgumentException(
          s"no version of $ident exists at or before timestamp " +
            s"${timestampMicros}us"))
    })

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "graft tables are fragment-partitioned; explicit PARTITIONED BY is not supported")
    val dir = tableDir(ident)
    if (GraftFormat.exists(fs, dir)) throw new TableAlreadyExistsException(ident)
    if (!isDir(dir.getParent)) throw new NoSuchNamespaceException(ident.namespace())
    val userProps = GraftCatalog.userProperties(properties)
    GraftCatalog.validateColumnNames(schema)
    graft.format.VectorColumns.validate(schema,
      graft.format.VectorColumns.fromProperties(userProps))
    GraftFormat.init(fs, dir)
    val m = Manifest(1L, schema.json, Seq.empty, -1,
      System.currentTimeMillis(), "Create", GraftFormat.withTableId(userProps))
    GraftFormat.commit(fs, dir, m)
    new GraftTable(ident.toString, dir, m, conf)
  }

  // ---------------------------------------------- atomic CTAS/RTAS (D3)

  override def stageCreate(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable = {
    if (GraftFormat.exists(fs, tableDir(ident)))
      throw new TableAlreadyExistsException(ident)
    // CTAS into a namespace that does not exist is SCHEMA_NOT_FOUND,
    // same as plain CREATE TABLE (reference: testCreateTableAsSelect-
    // SchemaNotFound) — without this the staged commit would silently
    // materialize the namespace
    if (!isDir(tableDir(ident).getParent))
      throw new NoSuchNamespaceException(ident.namespace())
    new StagedGraftTable(ident.toString, tableDir(ident), schema,
      replace = false, GraftCatalog.userProperties(properties), conf)
  }

  override def stageReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable = {
    if (!GraftFormat.exists(fs, tableDir(ident)))
      throw new NoSuchTableException(ident)
    new StagedGraftTable(ident.toString, tableDir(ident), schema,
      replace = true, GraftCatalog.userProperties(properties), conf)
  }

  override def stageCreateOrReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable = {
    if (!isDir(tableDir(ident).getParent))
      throw new NoSuchNamespaceException(ident.namespace())
    new StagedGraftTable(ident.toString, tableDir(ident), schema,
      replace = true, GraftCatalog.userProperties(properties), conf)
  }

  /** Schema evolution as a metadata-only Evolve commit (extension —
    * the reference's only schema change is CREATE OR REPLACE):
    * ADD COLUMN (top-level, nullable), DROP COLUMN, SET/UNSET
    * properties. Concurrency-safe via the same CAS retry as every
    * other commit; data files are never touched. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    GraftCatalog.evolveCommit(fs, tableDir(ident), ident, changes)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!GraftFormat.exists(fs, dir)) return false
    graft.format.ManifestCache.purge(fs, dir)
    val ok = fs.delete(dir, true)
    // purge AGAIN after the delete: a read that started between the
    // first purge and the delete saw the old files and may have
    // re-cached the dying generation (its generation snapshot is now
    // stale, so this second bump invalidates it)
    graft.format.ManifestCache.purge(fs, dir)
    ok
  }

  override def renameTable(old: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft (like the reference) does not support RENAME TABLE")

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    // a brand-new warehouse root may not exist yet (object stores have
    // no empty directories): zero namespaces, not an error
    (try fs.listStatus(warehouse)
     catch { case _: java.io.FileNotFoundException => Array.empty[FileStatus] })
      .filter(st => st.isDirectory && !st.getPath.getName.endsWith(".graft"))
      .map(st => Array(st.getPath.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsDir(namespace)
    if (!isDir(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir)
      .filter(st => st.isDirectory && !st.getPath.getName.endsWith(".graft"))
      .map(st => namespace :+ st.getPath.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    isDir(nsDir(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(
      namespace: Array[String], metadata: JMap[String, String]): Unit =
    fs.mkdirs(nsDir(namespace))

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    if (!isDir(dir)) return false
    val empty = fs.listStatus(dir).isEmpty
    if (!empty && !cascade) throw new IllegalStateException(
      s"namespace ${namespace.mkString(".")} is not empty")
    // Purge every table under the namespace from the manifest cache
    // BEFORE deleting, exactly as dropTable does: within the TTL a
    // dropped table would otherwise still appear to exist, and a table
    // re-created at the same path could serve the previous generation's
    // pinned time-travel manifests. Capture the table dirs now — the
    // post-delete listing can no longer find them.
    val tables = tablesUnder(dir)
    tables.foreach(t => graft.format.ManifestCache.purge(fs, t))
    val ok = fs.delete(dir, true)
    // purge AGAIN per table after the delete, mirroring dropTable's
    // second purge: a latest()/readPinned/dataDirs that started between
    // the first purge and the delete saw the old files and may re-cache
    // the dying generation. Each per-table purge bumps that table's OWN
    // manifest and IndexSegments generations — a namespace-path bump
    // alone would not invalidate a segment resolution that snapshotted
    // the TABLE-path generation (it guards against tableKeyOf, not the
    // namespace key).
    tables.foreach(t => graft.format.ManifestCache.purge(fs, t))
    // belt over the braces: a table CREATED between the capture above
    // and the delete is in neither purge loop — sweep BOTH caches under
    // the namespace prefix (manifest latest+pinned tiers with per-table
    // generation bumps, and segment resolutions) so its entries die
    // with the namespace too
    graft.format.ManifestCache.purgeUnder(fs, dir)
    ok
  }

  private def tablesUnder(dir: Path): Seq[Path] =
    fs.listStatus(dir).toSeq.flatMap { st =>
      if (!st.isDirectory) Nil
      else if (st.getPath.getName.endsWith(".graft")) Seq(st.getPath)
      else tablesUnder(st.getPath)
    }
}

object GraftCatalog {
  /** Keep user-declared table properties, dropping Spark's bookkeeping. */
  private val internalProps = Set(
    TableCatalog.PROP_OWNER, TableCatalog.PROP_PROVIDER,
    TableCatalog.PROP_LOCATION, TableCatalog.PROP_EXTERNAL,
    TableCatalog.PROP_COMMENT, TableCatalog.PROP_IS_MANAGED_LOCATION,
    TableCatalog.PROP_TABLE_TYPE, TableCatalog.PROP_COLLATION,
    // reserved generation id: a user-supplied value (e.g. a replayed
    // SHOW CREATE TABLE DDL) is stripped so the new table mints its
    // own — it IS a new generation; forging a dead one would defeat
    // drop+re-create detection (ALTER rejects it typed for the same
    // reason, evolveCommit)
    GraftFormat.TableIdProp)

  def userProperties(props: JMap[String, String]): Map[String, String] =
    props.asScala.toMap.view.filterKeys(k => !internalProps.contains(k)).toMap

  /** Catalog options prefixed `hadoop.` -> Hadoop configuration pairs. */
  def hadoopOptions(options: CaseInsensitiveStringMap): Map[String, String] =
    options.asScala.toMap.collect {
      case (k, v) if k.startsWith("hadoop.") => k.stripPrefix("hadoop.") -> v
    }

  /** Schema evolution as a metadata-only Evolve commit, shared by the
    * directory and REST catalogs: ADD COLUMN (top-level, nullable),
    * DROP COLUMN, SET/UNSET properties. Concurrency-safe via the same
    * CAS retry as every other commit; data files are never touched. */
  def evolveCommit(fs: FileSystem, dir: Path, ident: Identifier,
      changes: Seq[TableChange]): Unit = {
    if (!GraftFormat.exists(fs, dir)) throw new NoSuchTableException(ident)
    GraftFormat.commitWithRetry(fs, dir) { latestOpt =>
      val latest = latestOpt.getOrElse(throw new NoSuchTableException(ident))
      var schema = latest.schema
      var props = latest.properties
      changes.foreach {
        case add: TableChange.AddColumn =>
          require(add.fieldNames.length == 1,
            "ADD COLUMN supports top-level columns only")
          val name = add.fieldNames.head
          require(!name.contains("."), s"invalid column name: $name")
          require(add.isNullable,
            "added columns must be nullable (existing rows null-fill)")
          require(!schema.fieldNames.contains(name),
            s"column already exists: $name")
          schema = schema.add(name, add.dataType, nullable = true,
            Option(add.comment).getOrElse(""))
        case del: TableChange.DeleteColumn =>
          require(del.fieldNames.length == 1,
            "DROP COLUMN supports top-level columns only")
          val name = del.fieldNames.head
          require(schema.fieldNames.contains(name),
            s"no such column: $name")
          require(schema.fields.length > 1, "cannot drop the last column")
          schema = StructType(schema.fields.filterNot(_.name == name))
          // properties referring to the dropped column can no longer
          // hold: clustering claims drop entirely; blob list shrinks
          if (props.get(GraftFormat.SortByProp)
              .exists(_.split(',').contains(name)) ||
            props.get(GraftFormat.BucketByProp)
              .exists(_.split(':').head == name)) {
            props = props -- GraftFormat.ClusteringProps
          }
          props.get("blob_columns").foreach { csv =>
            val rest = csv.split(',').map(_.trim).filterNot(_ == name)
            props =
              if (rest.isEmpty) props - "blob_columns"
              else props + ("blob_columns" -> rest.mkString(","))
          }
        case set: TableChange.SetProperty =>
          // the generation id is reserved: overwriting it forges a dead
          // history's identity, unsetting it disables drop+re-create
          // detection for strict streams and bookmarked syncs
          // (Delta/Iceberg reserve their table uuid the same way)
          require(set.property != GraftFormat.TableIdProp,
            s"${GraftFormat.TableIdProp} is reserved (the history's " +
              "generation identity) and cannot be set")
          props = props + (set.property -> set.value)
        case rm: TableChange.RemoveProperty =>
          require(rm.property != GraftFormat.TableIdProp,
            s"${GraftFormat.TableIdProp} is reserved (the history's " +
              "generation identity) and cannot be unset")
          props = props - rm.property
        case other =>
          throw new UnsupportedOperationException(
            s"unsupported table change: $other (RENAME COLUMN is " +
              "unsupported by design: fragments bind columns by name)")
      }
      latest.copy(
        version = latest.version + 1,
        schemaJson = schema.json,
        createdAtMs = System.currentTimeMillis(),
        operation = "Evolve",
        properties = props)
    }
  }

  /** Reference parity: column names containing dots are rejected
    * (BaseLanceConnectorTest.java:174-180 — "Lance does not support
    * column names with special characters like dots"); a dot would also
    * be ambiguous with nested-field access in SQL. */
  def validateColumnNames(schema: StructType): Unit = {
    schema.fieldNames.filter(_.contains(".")).foreach { n =>
      throw new IllegalArgumentException(
        s"graft (like the reference) does not support column names " +
          s"containing dots: '$n'")
    }
    // typed unsupported-type errors at CREATE time (reference analog:
    // BaseLanceConnectorTest.java:148-164 type gates): parquet cannot
    // represent a void column, and letting one through produces
    // confusing failures on later scans/DML instead of here
    def checkType(path: String, dt: org.apache.spark.sql.types.DataType): Unit =
      dt match {
        case org.apache.spark.sql.types.NullType =>
          throw new IllegalArgumentException(
            s"column '$path' has unsupported type VOID (all-NULL, no " +
              "declared type); CAST the value to a concrete type, e.g. " +
              s"CAST(NULL AS STRING) AS $path")
        case _: org.apache.spark.sql.types.CalendarIntervalType =>
          throw new IllegalArgumentException(
            s"column '$path' has unsupported type INTERVAL; store the " +
              "two ANSI interval types (YEAR TO MONTH / DAY TO SECOND) " +
              "or a BIGINT of micros instead")
        case s: StructType =>
          s.fields.foreach(f => checkType(s"$path.${f.name}", f.dataType))
        case a: org.apache.spark.sql.types.ArrayType =>
          checkType(s"$path.element", a.elementType)
        case m: org.apache.spark.sql.types.MapType =>
          checkType(s"$path.key", m.keyType)
          checkType(s"$path.value", m.valueType)
        case _ => ()
      }
    schema.fields.foreach(f => checkType(f.name, f.dataType))
  }
}
