package graft.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.connector.GraftTable
import graft.format.{GraftFormat, JsonParser}
import graft.format.GraftFormat.Manifest

/** REST namespace backend (SURVEY.md S8): table NAMES and LOCATIONS are
  * resolved by an external namespace service; table DATA stays on any
  * Hadoop-FS store. Mirrors the reference's `lance.impl=rest` deployment
  * (LanceConfig.java:43-65, BaseLanceRestConnectorTest) where the
  * connector speaks the lance-namespace REST protocol and reads data
  * directly from the returned locations.
  *
  *   spark.sql.catalog.graft            = graft.catalog.GraftRestCatalog
  *   spark.sql.catalog.graft.uri        = http://namespace-service
  *   spark.sql.catalog.graft.warehouse  = s3a://bucket/warehouse  (new-table data)
  *
  * Protocol (modeled on the public lance-namespace REST surface):
  *   GET    /v1/namespaces                     -> {"namespaces":[...]}
  *   POST   /v1/namespaces        {"name":ns}  -> 200 | 409
  *   DELETE /v1/namespaces/<ns>                -> 200 | 404 | 409(not empty)
  *   GET    /v1/namespaces/<ns>/tables         -> {"tables":[...]}
  *   GET    /v1/namespaces/<ns>/tables/<t>     -> {"location": uri} | 404
  *   POST   /v1/namespaces/<ns>/tables/<t> {"location":uri} -> 200 | 409
  *   DELETE /v1/namespaces/<ns>/tables/<t>     -> 200 | 404   (deregister)
  *
  * Scale/HA notes: the service holds only O(tables) name->location rows;
  * every data and manifest byte moves through Hadoop FS, so the REST
  * hop is one metadata round-trip per table resolution, never on the
  * per-task path (executors get absolute file paths in their splits).
  * Namespaces may be multi-level: levels are joined with the
  * reference's `$` delimiter on the wire (LanceConfig.java:79
  * "hive$catalog" with-parent modes), and the hierarchy is a
  * client-side view over the service's flat name set.
  */
class GraftRestCatalog extends TableCatalog with SupportsNamespaces
  with StagingTableCatalog with ProcedureCatalog {

  // SQL maintenance surface: table names resolve via DescribeTable
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident, { dotted =>
      val parts = dotted.split('.')
      require(parts.length >= 2, s"expected <namespace>.<table>, got '$dotted'")
      val id = Identifier.of(parts.init, parts.last)
      // DescribeTable vends the table's location AND its scoped storage
      // credentials — maintenance must run under the same identity as
      // scans/writes, not the bare session conf
      val (dir, vended) = describeTable(id)
        .getOrElse(throw new NoSuchTableException(id))
      (dir, tableConf(vended))
    })

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  private var catalogName: String = _
  private var baseUri: String = _
  private var warehouse: Path = _
  private var storageOptions: Map[String, String] = Map.empty
  @transient private var http: HttpClient = _
  @transient private var hadoopConf: Configuration = _

  private def conf: Configuration = {
    if (hadoopConf == null) {
      hadoopConf = SparkSession.active.sessionState.newHadoopConf()
      storageOptions.foreach { case (k, v) => hadoopConf.set(k, v) }
    }
    hadoopConf
  }

  /** Per-table configuration: catalog conf + the storage options the
    * namespace service vended for this table (credential vending,
    * reference: LanceMetadata.java:1319-1354 getStorageOptionsForTable —
    * table-scoped options win over namespace-level ones). The reserved
    * `expires_at` key (epoch millis) is consumed by the refresh logic,
    * not forwarded to Hadoop. */
  private def tableConf(vended: Map[String, String]): Configuration =
    if (vended.isEmpty) conf
    else {
      val c = new Configuration(conf)
      (vended - ExpiresAtKey).foreach { case (k, v) => c.set(k, v) }
      c
    }

  private val ExpiresAtKey = "expires_at"
  /** Re-resolve vended credentials once within 5 minutes of expiry —
    * the reference's refresh window (LanceTableHandle.java:36,154-173:
    * REFRESH_WINDOW_MINUTES ahead of expiration, re-DescribeTable). */
  private val RefreshWindowMs = 5 * 60 * 1000L

  private def expiring(opts: Map[String, String]): Boolean =
    opts.get(ExpiresAtKey).flatMap(_.toLongOption).exists(t =>
      System.currentTimeMillis() >= t - RefreshWindowMs)

  /** Conf source for one resolved table: hands out the vended-credential
    * conf, re-resolving via DescribeTable when the cached credentials
    * are inside the refresh window. Called at every scan/write PLANNING
    * (GraftTable.conf is a def), so a multi-query job over an STS-style
    * token keeps working as long as the service keeps vending; a single
    * task only ever needs the token it was planned with (executors get
    * a SerializableConfiguration snapshot per query, like the
    * reference's per-split storage options). */
  private final class CredentialSource(ident: Identifier,
      initial: Map[String, String]) {
    @volatile private var cached = initial
    // A token whose TTL never leaves the refresh window (expires_at -
    // now <= RefreshWindowMs for its whole life) would otherwise turn
    // EVERY conf access into a blocking DescribeTable round trip; bound
    // re-resolution like the reference caches until near expiry.
    @volatile private var lastAttemptMs = 0L
    private def minRetryMs: Long =
      SparkSession.getActiveSession
        .orElse(SparkSession.getDefaultSession)
        .flatMap(_.conf.getOption("spark.graft.credential.refresh.retry.ms"))
        .map(_.toLong).getOrElse(30 * 1000L)
    def current(): Configuration = {
      if (expiring(cached)) {
        val now = System.currentTimeMillis()
        if (now - lastAttemptMs >= minRetryMs) {
          lastAttemptMs = now
          describeTable(ident).foreach { case (_, vended) => cached = vended }
        }
      }
      tableConf(cached)
    }
  }

  private def fs: FileSystem = warehouse.getFileSystem(conf)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    baseUri = Option(options.get("uri")).map(_.stripSuffix("/")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name requires option 'uri'"))
    warehouse = new Path(Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option 'warehouse' for new table data")))
    storageOptions = GraftCatalog.hadoopOptions(options)
    http = HttpClient.newHttpClient()
  }

  override def name(): String = catalogName

  // ------------------------------------------------------------ REST I/O

  private def request(method: String, path: String, body: Option[String])
      : (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"$baseUri$path"))
    val req = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case "POST" => b.header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body.getOrElse("{}"), UTF_8))
    }).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def jsonStrings(body: String, field: String): Seq[String] =
    new JsonParser(body).parseValue().asInstanceOf[Map[String, Any]]
      .get(field).map(_.asInstanceOf[Seq[Any]].map(_.asInstanceOf[String]))
      .getOrElse(Seq.empty)

  private def jsonField(body: String, field: String): Option[String] =
    new JsonParser(body).parseValue().asInstanceOf[Map[String, Any]]
      .get(field).collect { case s: String => s }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  /** Multi-level namespaces travel to the service as ONE name with the
    * reference's `$` level delimiter (LanceConfig.java:79 "hive$catalog"
    * with-parent modes): Array("a","b") <-> "a$b". The service stays a
    * flat name->tables store; nesting is a client-side view. */
  private def nsKey(namespace: Array[String]): String = {
    if (namespace.isEmpty) throw new NoSuchNamespaceException(namespace)
    java.net.URLEncoder.encode(namespace.mkString("$"), UTF_8)
  }

  /** DescribeTable: the table's data location + any storage options the
    * service vends for it (e.g. scoped credentials), or None. */
  private def describeTable(ident: Identifier): Option[(Path, Map[String, String])] = {
    val (code, body) = request("GET",
      s"/v1/namespaces/${nsKey(ident.namespace())}/tables/" +
        java.net.URLEncoder.encode(ident.name(), UTF_8), None)
    if (code == 404) None
    else if (code == 200) jsonField(body, "location").map { loc =>
      val storage = new JsonParser(body).parseValue()
        .asInstanceOf[Map[String, Any]].get("storage")
        .map(_.asInstanceOf[Map[String, Any]].collect {
          case (k, v: String) => k -> v
        }).getOrElse(Map.empty[String, String])
      (new Path(loc), storage)
    }
    else throw new IllegalStateException(
      s"namespace service error $code for $ident: $body")
  }

  private def lookupLocation(ident: Identifier): Option[Path] =
    describeTable(ident).map(_._1)

  private def register(ident: Identifier, location: Path): Unit = {
    val (code, body) = request("POST",
      s"/v1/namespaces/${nsKey(ident.namespace())}/tables/" +
        java.net.URLEncoder.encode(ident.name(), UTF_8),
      Some(s"""{"location":"${esc(location.toString)}"}"""))
    if (code == 409) throw new TableAlreadyExistsException(ident)
    if (code == 404) throw new NoSuchNamespaceException(ident.namespace())
    if (code != 200) throw new IllegalStateException(
      s"namespace service error $code registering $ident: $body")
  }

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val (code, body) = request("GET",
      s"/v1/namespaces/${nsKey(namespace)}/tables", None)
    if (code == 404) {
      // implicit ancestor (proper prefix of a stored name): no tables of
      // its own, but it IS a namespace — don't throw
      if (namespaceExists(namespace)) return Array.empty
      throw new NoSuchNamespaceException(namespace)
    }
    jsonStrings(body, "tables").map(Identifier.of(namespace, _)).toArray
  }

  private def load(ident: Identifier,
      pick: (Path, Configuration) => Option[Manifest]): Table = {
    val (dir, vended) = describeTable(ident)
      .getOrElse(throw new NoSuchTableException(ident))
    val creds = new CredentialSource(ident, vended)
    val tc = creds.current()
    if (!GraftFormat.exists(dir.getFileSystem(tc), dir))
      throw new NoSuchTableException(ident)
    val manifest = pick(dir, tc).getOrElse(throw new NoSuchTableException(ident))
    new GraftTable(ident.toString, dir, manifest, tc) {
      override def conf: Configuration = creds.current()
    }
  }

  override def loadTable(ident: Identifier): Table =
    load(ident,
      (d, tc) => graft.format.ManifestCache.latest(d.getFileSystem(tc), d))

  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, { (dir, tc) =>
      val dfs = dir.getFileSystem(tc)
      val v = try version.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"invalid version '$version' for table $ident (expected integer)")
      }
      if (!GraftFormat.listVersions(dfs, dir).contains(v))
        throw new IllegalArgumentException(
          s"version $v does not exist for table $ident")
      Some(graft.format.ManifestCache.readPinned(dfs, dir, v))
    })

  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident, { (dir, tc) =>
      val dfs = dir.getFileSystem(tc)
      GraftFormat.versionAtTimestamp(dfs, dir, timestampMicros / 1000L)
        .map(graft.format.ManifestCache.readPinned(dfs, dir, _))
        .orElse(throw new IllegalArgumentException(
          s"no version of $ident exists at or before timestamp ${timestampMicros}us"))
    })

  private def newTableDir(ident: Identifier): Path =
    new Path(new Path(warehouse, ident.namespace().mkString("/")),
      ident.name() + ".graft")

  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "graft tables are fragment-partitioned; explicit PARTITIONED BY is not supported")
    if (lookupLocation(ident).isDefined) throw new TableAlreadyExistsException(ident)
    val userProps = GraftCatalog.userProperties(properties)
    GraftCatalog.validateColumnNames(schema)
    graft.format.VectorColumns.validate(schema,
      graft.format.VectorColumns.fromProperties(userProps))
    val dir = newTableDir(ident)
    GraftFormat.init(fs, dir)
    val m = Manifest(1L, schema.json, Seq.empty, -1,
      System.currentTimeMillis(), "Create", userProps)
    GraftFormat.commit(fs, dir, m)
    try register(ident, fs.makeQualified(dir))
    catch { case e: Throwable => fs.delete(dir, true); throw e }
    new GraftTable(ident.toString, dir, m, conf)
  }

  // ------------------------------------------- atomic CTAS/RTAS (D3)
  // Fragments stage invisibly under the new location; ONE manifest
  // commit + ONE RegisterTable call publish the table.

  override def stageCreate(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable = {
    if (lookupLocation(ident).isDefined) throw new TableAlreadyExistsException(ident)
    val dir = newTableDir(ident)
    new StagedGraftTable(ident.toString, dir, schema, replace = false,
      GraftCatalog.userProperties(properties), conf) {
      override def commitStagedChanges(): Unit = {
        super.commitStagedChanges()
        register(ident, fs.makeQualified(dir))
      }
    }
  }

  override def stageReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable = {
    val dir = lookupLocation(ident).getOrElse(throw new NoSuchTableException(ident))
    new StagedGraftTable(ident.toString, dir, schema, replace = true,
      GraftCatalog.userProperties(properties), conf)
  }

  override def stageCreateOrReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable =
    lookupLocation(ident) match {
      case Some(dir) =>
        new StagedGraftTable(ident.toString, dir, schema, replace = true,
          GraftCatalog.userProperties(properties), conf)
      case None => stageCreate(ident, schema, partitions, properties)
    }

  /** Same Evolve-commit schema evolution as the directory catalog —
    * the manifest lives in the table directory, so the namespace
    * service needs no schema round-trip. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    lookupLocation(ident) match {
      case Some(dir) =>
        GraftCatalog.evolveCommit(fs, dir, ident, changes)
        loadTable(ident)
      case None => throw new NoSuchTableException(ident)
    }

  override def dropTable(ident: Identifier): Boolean =
    lookupLocation(ident) match {
      case None => false
      case Some(dir) =>
        val (code, body) = request("DELETE",
          s"/v1/namespaces/${nsKey(ident.namespace())}/tables/" +
            java.net.URLEncoder.encode(ident.name(), UTF_8), None)
        if (code != 200 && code != 404) throw new IllegalStateException(
          s"namespace service error $code dropping $ident: $body")
        graft.format.ManifestCache.purge(dir.getFileSystem(conf), dir)
        dir.getFileSystem(conf).delete(dir, true)
        code == 200
    }

  override def renameTable(old: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft (like the reference) does not support RENAME TABLE")

  // --------------------------------------------------------- namespaces

  /** Every namespace known to the service, as level arrays (the service
    * stores `$`-joined names; see [[nsKey]]). */
  private def allNamespaces(): Seq[Array[String]] = {
    val (_, body) = request("GET", "/v1/namespaces", None)
    jsonStrings(body, "namespaces").map(_.split('$'))
  }

  override def listNamespaces(): Array[Array[String]] =
    // top level of the hierarchy only, deduplicated: "a" and "a$b"
    // both contribute Array("a")
    allNamespaces().map(ns => Seq(ns.head)).distinct
      .map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    // direct children of the parent, including IMPLICIT ones: a stored
    // "a$b$c" contributes child ["a","b"] under parent ["a"] even when
    // "a$b" itself was never stored
    allNamespaces()
      .filter(ns => ns.length > namespace.length && ns.startsWith(namespace))
      .map(ns => ns.take(namespace.length + 1).toSeq)
      .distinct
      .map(_.toArray).toArray
  }

  /** A namespace exists if it is stored exactly OR is a proper prefix of
    * a stored `$`-joined name — the hierarchy the catalog itself surfaces
    * via [[listNamespaces]] must be navigable (`SHOW TABLES IN a` cannot
    * throw for an `a` that `SHOW NAMESPACES` just listed). */
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.nonEmpty && allNamespaces().exists(ns =>
      ns.length >= namespace.length && ns.startsWith(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(
      namespace: Array[String], metadata: JMap[String, String]): Unit = {
    val (code, body) = request("POST", "/v1/namespaces",
      Some(s"""{"name":"${esc(namespace.mkString("$"))}"}"""))
    if (code != 200 && code != 409) throw new IllegalStateException(
      s"namespace service error $code creating namespace: $body")
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val children = listNamespaces(namespace)
    // capture BEFORE any cascade: an implicit ancestor ceases to exist
    // the moment its last stored descendant is dropped
    val tables = listTables(namespace)
    if (cascade) {
      children.foreach(dropNamespace(_, cascade = true))
      tables.foreach(dropTable)
    } else if (tables.nonEmpty || children.nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    // an implicit ancestor has no stored entry to DELETE — once its
    // stored descendants are gone (cascade above) it ceases to exist
    if (!allNamespaces().exists(_.sameElements(namespace))) return true
    val (code, _) = request("DELETE", s"/v1/namespaces/${nsKey(namespace)}", None)
    code == 200
  }
}
