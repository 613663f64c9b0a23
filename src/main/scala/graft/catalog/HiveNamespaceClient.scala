package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.metastore.api.{AlreadyExistsException, Database, InvalidObjectException, NoSuchObjectException, SerDeInfo, StorageDescriptor, Table, ThriftHiveMetastore}
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.transport.{TSocket, TTransportException}

/** Hive-Metastore-backed namespace client (reference: `lance.impl=hive2`
  * / `hive3`, LanceConfig.java:60): databases are namespaces, table
  * locations live in `StorageDescriptor.location`, vended storage
  * options in the table parameters map. Speaks the REAL HMS Thrift
  * binary protocol with the `ThriftHiveMetastore` client Spark already
  * ships, so it runs against any metastore endpoint — the in-process
  * stub in HiveCatalogSpec, or a production HMS at `thrift://host:port`.
  *
  * hive2 vs hive3: the eight operations used here (`get_all_databases`,
  * `create/get/drop_database`, `get_all_tables`, `get/create/drop_table`)
  * have identical Thrift signatures in HMS 2.x and 3.x (3.x additions
  * such as catalogs are orthogonal, and Thrift dispatches by method
  * name), so one client serves both `lance.impl` spellings.
  *
  * Multi-level namespaces: like Glue, HMS database names allow only
  * `[a-zA-Z0-9_]`, so graft's `$`-joined keys are stored `__`-joined and
  * translated back on listing — with the same documented ambiguity for
  * single-level names that themselves contain `__`.
  *
  * The Thrift client is not thread-safe: calls are serialized on this
  * object, and a broken transport is reconnected once per call. */
final class HiveNamespaceClient(host: String, port: Int) extends NamespaceClient {
  import NamespaceClient._

  private def hiveDb(key: String): String = key.replace("$", "__")
  private def graftKey(db: String): String = db.replace("__", "$")

  private var transport: TSocket = _
  private var client: ThriftHiveMetastore.Client = _

  private def connect(): Unit = {
    transport = new TSocket(host, port)
    transport.open()
    client = new ThriftHiveMetastore.Client(new TBinaryProtocol(transport))
  }

  /** Read-only calls: reconnect-and-retry on a broken transport is
    * always safe (get/list have no server-side effects). */
  private def withClient[A](f: ThriftHiveMetastore.Client => A): A =
    synchronized {
      if (client == null) connect()
      try f(client)
      catch {
        case _: TTransportException =>
          try transport.close() catch { case _: Throwable => () }
          connect()
          f(client)
      }
    }

  /** Mutations: if the transport died the FIRST attempt may have
    * committed server-side before the failure, so the retry can observe
    * its own success as AlreadyExists (creates) or NoSuchObject (drops).
    * `ambiguous` maps those retry-only outcomes back to success instead
    * of misreporting them to the caller (end-of-r8 ADVICE). A first-
    * attempt AlreadyExists/NoSuchObject still propagates: with a healthy
    * transport it is a genuine conflict, not an echo.
    *
    * The transport can also die on SEND (stale idle socket) with the
    * first request never delivered, making a retry-side conflict
    * genuinely another writer's object. For drops and createNamespace
    * the end state is identical either way, so mapping to success is
    * safe; registerTable — the one caller where the distinction changes
    * the answer — disambiguates by probing whether the surviving table
    * carries OUR location before claiming success. */
  private def withClientMutation[A](f: ThriftHiveMetastore.Client => A)(
      ambiguous: PartialFunction[Throwable, A]): A =
    synchronized {
      if (client == null) connect()
      try f(client)
      catch {
        case _: TTransportException =>
          try transport.close() catch { case _: Throwable => () }
          connect()
          try f(client) catch ambiguous
      }
    }

  override def listNamespaceKeys(): Seq[String] =
    withClient(_.get_all_databases().asScala.toSeq).map(graftKey)

  override def createNamespace(key: String): Unit =
    try withClientMutation(_.create_database(
      new Database(hiveDb(key), "graft namespace", null, null))) {
      case _: AlreadyExistsException => () // first attempt landed
    }
    catch { case _: AlreadyExistsException => () }

  override def dropNamespace(key: String): Boolean =
    try {
      withClientMutation(_.drop_database(hiveDb(key), /*deleteData=*/ false,
        /*cascade=*/ false)) {
        case _: NoSuchObjectException => () // first attempt landed
      }
      true
    } catch { case _: NoSuchObjectException => false }

  override def listTables(key: String): Option[Seq[String]] =
    try {
      // get_all_tables returns an empty list for an unknown database, so
      // existence is probed explicitly — the caller distinguishes "empty
      // namespace" from "no such namespace" (implicit ancestors)
      withClient { c =>
        c.get_database(hiveDb(key))
        Some(c.get_all_tables(hiveDb(key)).asScala.toSeq)
      }
    } catch { case _: NoSuchObjectException => None }

  override def describeTable(key: String, table: String)
      : Option[(String, Map[String, String])] =
    try {
      val t = withClient(_.get_table(hiveDb(key), table))
      val loc = Option(t.getSd).flatMap(sd => Option(sd.getLocation))
      val params = Option(t.getParameters)
        .map(_.asScala.toMap).getOrElse(Map.empty[String, String])
      loc.map((_, params))
    } catch { case _: NoSuchObjectException => None }

  override def registerTable(key: String, table: String,
      location: String): RegisterResult =
    try {
      val sd = new StorageDescriptor()
      sd.setCols(java.util.Collections.emptyList())
      sd.setLocation(location)
      sd.setSerdeInfo(new SerDeInfo(table, null,
        java.util.Collections.emptyMap()))
      val t = new Table()
      t.setDbName(hiveDb(key))
      t.setTableName(table)
      t.setTableType("EXTERNAL_TABLE")
      t.setSd(sd)
      t.setParameters(java.util.Collections.emptyMap())
      withClientMutation(_.create_table(t)) {
        // retry-side AlreadyExists is ambiguous: our first attempt may
        // have landed (transport died on the response), or another
        // writer may own the name (transport died on send). Only claim
        // success when the surviving table carries OUR location; the
        // guard failing lets the exception fall through to TableExists.
        case _: AlreadyExistsException
            if describeTable(key, table).exists(_._1 == location) => ()
      }
      Registered
    } catch {
      case _: AlreadyExistsException => TableExists
      // HMS signals a missing database as InvalidObjectException (or
      // NoSuchObjectException on some versions)
      case _: InvalidObjectException | _: NoSuchObjectException => NoSuchNamespace
    }

  override def deregisterTable(key: String, table: String): Boolean =
    try {
      withClientMutation(_.drop_table(hiveDb(key), table,
        /*deleteData=*/ false)) {
        case _: NoSuchObjectException => () // first attempt landed
      }
      true
    } catch { case _: NoSuchObjectException => false }
}
