package graft.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import graft.format.JsonParser

/** Wire-protocol seam between [[GraftRestCatalog]]'s catalog logic and a
  * concrete namespace service. The catalog logic (implicit namespace
  * ancestors, atomic CTAS registration, credential refresh, cache
  * purges) is protocol-independent; implementations translate seven
  * primitive operations (reference analog: the pluggable
  * `lance.impl` = dir | rest | glue | hive backends,
  * LanceConfig.java:43-65).
  *
  * Namespace `key`s are the `$`-joined multi-level names
  * (LanceConfig.java:79); services that are naturally single-level
  * (Glue databases) translate the join to whatever their name rules
  * allow and translate back on listing.
  */
trait NamespaceClient {

  /** All namespace keys known to the service. */
  def listNamespaceKeys(): Seq[String]

  /** Create `key`; existing namespaces are tolerated (idempotent). */
  def createNamespace(key: String): Unit

  /** Delete `key`; false when it did not exist. */
  def dropNamespace(key: String): Boolean

  /** Table names under `key`; None when the namespace is unknown to the
    * service (the caller decides whether an implicit ancestor exists). */
  def listTables(key: String): Option[Seq[String]]

  /** The table's data location + any storage options the service vends
    * for it (scoped credentials etc.), or None. */
  def describeTable(key: String, table: String): Option[(String, Map[String, String])]

  /** Register name -> location. */
  def registerTable(key: String, table: String, location: String): NamespaceClient.RegisterResult

  /** Deregister; false when the table was not registered. */
  def deregisterTable(key: String, table: String): Boolean
}

object NamespaceClient {
  sealed trait RegisterResult
  case object Registered extends RegisterResult
  case object TableExists extends RegisterResult
  case object NoSuchNamespace extends RegisterResult

  private[catalog] def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private[catalog] def strings(body: String, field: String): Seq[String] =
    new JsonParser(body).parseValue().asInstanceOf[Map[String, Any]]
      .get(field).map(_.asInstanceOf[Seq[Any]].map(_.asInstanceOf[String]))
      .getOrElse(Seq.empty)
}

/** The lance-namespace-style REST protocol (GraftRestCatalog's wire
  * format since round 3; see that class's scaladoc for the routes). */
final class RestNamespaceClient(baseUri: String) extends NamespaceClient {
  import NamespaceClient._

  @transient private lazy val http: HttpClient = HttpClient.newHttpClient()

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

  private def enc(s: String): String = java.net.URLEncoder.encode(s, UTF_8)

  override def listNamespaceKeys(): Seq[String] =
    strings(request("GET", "/v1/namespaces", None)._2, "namespaces")

  override def createNamespace(key: String): Unit = {
    val (code, body) = request("POST", "/v1/namespaces",
      Some(s"""{"name":"${esc(key)}"}"""))
    if (code != 200 && code != 409) throw new IllegalStateException(
      s"namespace service error $code creating namespace: $body")
  }

  override def dropNamespace(key: String): Boolean =
    request("DELETE", s"/v1/namespaces/${enc(key)}", None)._1 == 200

  override def listTables(key: String): Option[Seq[String]] = {
    val (code, body) = request("GET", s"/v1/namespaces/${enc(key)}/tables", None)
    if (code == 404) None else Some(strings(body, "tables"))
  }

  override def describeTable(key: String, table: String)
      : Option[(String, Map[String, String])] = {
    val (code, body) =
      request("GET", s"/v1/namespaces/${enc(key)}/tables/${enc(table)}", None)
    if (code == 404) None
    else if (code == 200) {
      val root = new JsonParser(body).parseValue().asInstanceOf[Map[String, Any]]
      root.get("location").collect { case loc: String =>
        val storage = root.get("storage")
          .map(_.asInstanceOf[Map[String, Any]].collect {
            case (k, v: String) => k -> v
          }).getOrElse(Map.empty[String, String])
        (loc, storage)
      }
    }
    else throw new IllegalStateException(
      s"namespace service error $code for $key.$table: $body")
  }

  override def registerTable(key: String, table: String,
      location: String): RegisterResult = {
    val (code, body) = request("POST",
      s"/v1/namespaces/${enc(key)}/tables/${enc(table)}",
      Some(s"""{"location":"${esc(location)}"}"""))
    code match {
      case 200 => Registered
      case 409 => TableExists
      case 404 => NoSuchNamespace
      case _ => throw new IllegalStateException(
        s"namespace service error $code registering $key.$table: $body")
    }
  }

  override def deregisterTable(key: String, table: String): Boolean = {
    val (code, body) =
      request("DELETE", s"/v1/namespaces/${enc(key)}/tables/${enc(table)}", None)
    if (code != 200 && code != 404) throw new IllegalStateException(
      s"namespace service error $code dropping $key.$table: $body")
    code == 200
  }
}

/** AWS-Glue-Data-Catalog-shaped client (reference: `lance.impl=glue`,
  * LanceConfig.java:60): databases are namespaces, table locations live
  * in StorageDescriptor.Location, vended storage options in the table
  * Parameters map. Speaks the Glue JSON protocol (POST / with
  * `X-Amz-Target: AWSGlue.<Op>`, errors as `{"__type": ...}`), so it
  * runs against any Glue-compatible endpoint — in-process stub,
  * LocalStack, or the real service behind a signing proxy.
  *
  * Multi-level namespaces: graft's internal keys join levels with `$`,
  * which is NOT a legal character in Glue database names (lowercase
  * letters, digits, underscore only) — so levels are stored in Glue
  * joined by `__` (a legal delimiter) and translated back on listing.
  * Consequence: a SINGLE-level namespace whose own name contains `__`
  * is indistinguishable from a nested one and will round-trip as
  * multi-level; avoid `__` in Glue-backed namespace names. */
final class GlueNamespaceClient(endpoint: String) extends NamespaceClient {
  import NamespaceClient._

  /** graft key ('$'-joined) -> Glue-legal database name ('__'-joined). */
  private def glueDb(key: String): String = key.replace("$", "__")
  /** Glue database name -> graft key. */
  private def graftKey(db: String): String = db.replace("__", "$")

  @transient private lazy val http: HttpClient = HttpClient.newHttpClient()

  private def call(op: String, body: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .header("Content-Type", "application/x-amz-json-1.1")
      .header("X-Amz-Target", s"AWSGlue.$op")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def errType(body: String): String =
    try new JsonParser(body).parseValue().asInstanceOf[Map[String, Any]]
      .get("__type").collect { case s: String => s }.getOrElse("")
    catch { case _: Throwable => "" }

  private def parse(body: String): Map[String, Any] =
    new JsonParser(body).parseValue().asInstanceOf[Map[String, Any]]

  override def listNamespaceKeys(): Seq[String] = {
    val (code, body) = call("GetDatabases", "{}")
    if (code != 200) throw new IllegalStateException(
      s"glue error $code listing databases: $body")
    parse(body).get("DatabaseList").map(_.asInstanceOf[Seq[Any]].map(
      _.asInstanceOf[Map[String, Any]]("Name").asInstanceOf[String]))
      .getOrElse(Seq.empty).map(graftKey)
  }

  override def createNamespace(key: String): Unit = {
    val (code, body) =
      call("CreateDatabase", s"""{"DatabaseInput":{"Name":"${esc(glueDb(key))}"}}""")
    if (code != 200 && !errType(body).contains("AlreadyExistsException"))
      throw new IllegalStateException(s"glue error $code creating $key: $body")
  }

  override def dropNamespace(key: String): Boolean = {
    val (code, body) = call("DeleteDatabase", s"""{"Name":"${esc(glueDb(key))}"}""")
    if (code == 200) true
    else if (errType(body).contains("EntityNotFoundException")) false
    else throw new IllegalStateException(s"glue error $code dropping $key: $body")
  }

  override def listTables(key: String): Option[Seq[String]] = {
    val (code, body) = call("GetTables", s"""{"DatabaseName":"${esc(glueDb(key))}"}""")
    if (code == 200)
      Some(parse(body).get("TableList").map(_.asInstanceOf[Seq[Any]].map(
        _.asInstanceOf[Map[String, Any]]("Name").asInstanceOf[String]))
        .getOrElse(Seq.empty))
    else if (errType(body).contains("EntityNotFoundException")) None
    else throw new IllegalStateException(s"glue error $code listing $key: $body")
  }

  override def describeTable(key: String, table: String)
      : Option[(String, Map[String, String])] = {
    val (code, body) = call("GetTable",
      s"""{"DatabaseName":"${esc(glueDb(key))}","Name":"${esc(table)}"}""")
    if (code == 200) {
      val t = parse(body)("Table").asInstanceOf[Map[String, Any]]
      val loc = t.get("StorageDescriptor")
        .map(_.asInstanceOf[Map[String, Any]])
        .flatMap(_.get("Location")).collect { case s: String => s }
      val params = t.get("Parameters")
        .map(_.asInstanceOf[Map[String, Any]].collect {
          case (k, v: String) => k -> v
        }).getOrElse(Map.empty[String, String])
      loc.map((_, params))
    }
    else if (errType(body).contains("EntityNotFoundException")) None
    else throw new IllegalStateException(
      s"glue error $code describing $key.$table: $body")
  }

  override def registerTable(key: String, table: String,
      location: String): RegisterResult = {
    val (code, body) = call("CreateTable",
      s"""{"DatabaseName":"${esc(glueDb(key))}","TableInput":{"Name":"${esc(table)}",""" +
        s""""StorageDescriptor":{"Location":"${esc(location)}"}}}""")
    if (code == 200) Registered
    else if (errType(body).contains("AlreadyExistsException")) TableExists
    else if (errType(body).contains("EntityNotFoundException")) NoSuchNamespace
    else throw new IllegalStateException(
      s"glue error $code registering $key.$table: $body")
  }

  override def deregisterTable(key: String, table: String): Boolean = {
    val (code, body) = call("DeleteTable",
      s"""{"DatabaseName":"${esc(glueDb(key))}","Name":"${esc(table)}"}""")
    if (code == 200) true
    else if (errType(body).contains("EntityNotFoundException")) false
    else throw new IllegalStateException(
      s"glue error $code dropping $key.$table: $body")
  }
}
