package graft.sources

import java.io.ByteArrayOutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import S3LiteFileSystem.{xmlEsc, xmlUnesc}

/** In-process S3-compatible object store speaking the REST protocol over
  * real HTTP: path-style PUT/GET/HEAD/DELETE, conditional put
  * (`If-None-Match: *` -> 412, enforced atomically via putIfAbsent),
  * ranged GET (206 + Content-Range), ListObjectsV2 (prefix, delimiter,
  * max-keys, continuation-token), server-side COPY (x-amz-copy-source)
  * and multi-object delete (POST ?delete). The test-side stand-in for
  * the reference's LocalStack leg (TestLanceS3DefaultConnectorTest.java);
  * LocalStack itself is unavailable offline.
  *
  * Wire counters ([[conditionalPuts]], [[lostRaces]], [[rangeGets]],
  * [[copies]], [[multiDeletes]]) let specs assert the protocol features
  * were actually exercised over HTTP, not short-circuited in-process.
  */
class S3LiteServer {

  private case class Obj(bytes: Array[Byte], mtimeMs: Long)

  // "bucket/key" -> object; ConcurrentHashMap.putIfAbsent IS the
  // store-enforced conditional put
  private val store = new ConcurrentHashMap[String, Obj]()

  /** Conformance-probe knob: when true, GET pretends to be an
    * S3-compatible endpoint that IGNORES the Range header and answers
    * 200 with the whole object (such endpoints exist; RFC 7233 allows
    * it). Lets specs prove the client stays correct — a client that
    * buffers a 200 body as if it started at the requested offset serves
    * shifted bytes on every later read. */
  @volatile var ignoreRange = false

  /** Fault-injection window (r13 VERDICT #5, the LocalStack-style
    * error-path shakeout): the next `count` requests whose method is in
    * `methods` fail BEFORE touching the store — "503" answers SlowDown
    * (S3's throttle signal), "500" answers InternalError, "reset"
    * promises a 1 MB body and closes after 4 bytes (the wire shape of a
    * dropped connection: the client observes premature EOF mid-body).
    * Exhausted windows go inert; clearFaults() disarms early. */
  def injectFaults(kind: String, methods: Set[String], count: Int): Unit = {
    require(Set("503", "500", "reset").contains(kind), kind)
    faultKind = kind
    faultMethods = methods
    faultRemaining.set(count)
  }
  /** Disarm EVERY armed fault, including commit-response loss — a
    * leftover commit-loss unit on a shared server would fire during a
    * later leg or co-resident test and skew its fault/retry counters. */
  def clearFaults(): Unit = {
    faultRemaining.set(0)
    commitLossRemaining.set(0)
  }
  val faultsInjected = new AtomicLong()
  @volatile private var faultKind: String = "503"
  @volatile private var faultMethods: Set[String] = Set.empty
  private val faultRemaining = new java.util.concurrent.atomic.AtomicInteger(0)

  /** True (and consumes one budget unit) if this request must fail. */
  private def faultFires(method: String): Boolean =
    faultMethods.contains(method) &&
      faultRemaining.getAndUpdate(n => math.max(0, n - 1)) > 0

  /** Fail-AFTER-effect for conditional puts: the next `count` WINNING
    * conditional puts are APPLIED to the store but answered 503 — the
    * success reply is lost on the wire, the worst-case commit ambiguity
    * (the client cannot distinguish it from a throttle that preceded
    * the apply). Exercises the commit layer's content read-back
    * disambiguation end-to-end. */
  def injectCommitResponseLoss(count: Int): Unit =
    commitLossRemaining.set(count)
  private val commitLossRemaining =
    new java.util.concurrent.atomic.AtomicInteger(0)
  /** Lost commit replies that actually FIRED (a winning conditional put
    * was applied and answered 503) — storms report it so a run where no
    * armed unit ever met a winning put is visible in the artifact
    * instead of silently certifying an unexercised path. */
  val commitLossesFired = new AtomicLong()

  val conditionalPuts = new AtomicLong()
  val lostRaces = new AtomicLong()
  val rangeGets = new AtomicLong()
  val copies = new AtomicLong()
  val multiDeletes = new AtomicLong()
  val lists = new AtomicLong()
  val puts = new AtomicLong()
  val gets = new AtomicLong()
  val heads = new AtomicLong()
  val requests = new AtomicLong()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 64)
  // daemon threads: the embedded store must never pin the JVM open after
  // main() returns (the gate runner launches queries from a plain main)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16,
    (r: Runnable) => {
      val t = new Thread(r, "s3lite-worker")
      t.setDaemon(true)
      t
    }))
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  // the JDK dispatcher thread inherits daemon status from its creator;
  // start from a daemon thread so it can never pin the JVM open either
  locally {
    val starter = new Thread(() => server.start(), "s3lite-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
  }

  val endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)

  def objectCount(bucket: String): Int = {
    val p = bucket + "/"
    store.keySet().stream().filter(_.startsWith(p)).count().toInt
  }

  // ------------------------------------------------------------ protocol

  private val httpDate = DateTimeFormatter.RFC_1123_DATE_TIME.withZone(ZoneOffset.UTC)
  private val isoDate = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    .withZone(ZoneOffset.UTC)

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case t: Throwable =>
        respond(ex, 500, t.toString.getBytes(UTF_8))
    } finally ex.close()

  private def route(ex: HttpExchange): Unit = {
    val raw = ex.getRequestURI.getRawPath.stripPrefix("/")
    val slash = raw.indexOf('/')
    val bucket = if (slash < 0) raw else raw.take(slash)
    val key = if (slash < 0) "" else S3LiteServer.decodeKey(raw.drop(slash + 1))
    val query = parseQuery(ex.getRequestURI.getRawQuery)
    val id = s"$bucket/$key"
    requests.incrementAndGet()
    ex.getRequestMethod match {
      case "PUT" => puts.incrementAndGet()
      case "GET" => gets.incrementAndGet()
      case "HEAD" => heads.incrementAndGet()
      case _ => ()
    }
    if (faultFires(ex.getRequestMethod)) {
      faultsInjected.incrementAndGet()
      faultKind match {
        // HEAD responses carry no body — the JDK server logs a warning
        // and the client can stall waiting for promised bytes
        case _ if ex.getRequestMethod == "HEAD" =>
          ex.sendResponseHeaders(if (faultKind == "500") 500 else 503, -1)
        case "500" => respond(ex, 500, errXml("InternalError"))
        case "reset" =>
          // fixed-length promise, torn body: handle()'s finally closes
          // the exchange and the client gets premature EOF mid-read
          ex.sendResponseHeaders(200, 1L << 20)
          ex.getResponseBody.write("torn".getBytes(UTF_8))
          ex.getResponseBody.flush()
        case _ => respond(ex, 503, errXml("SlowDown"))
      }
      return
    }
    ex.getRequestMethod match {
      case "PUT" =>
        val copySource = ex.getRequestHeaders.getFirst("x-amz-copy-source")
        if (copySource != null) {
          copies.incrementAndGet()
          // copy-source arrives percent-encoded (same as object paths)
          val srcId = S3LiteServer.decodeKey(copySource.stripPrefix("/"))
          Option(store.get(srcId)) match {
            case Some(src) =>
              store.put(id, Obj(src.bytes, System.currentTimeMillis()))
              respond(ex, 200, copyResultXml())
            case None => respond(ex, 404, errXml("NoSuchKey"))
          }
        } else {
          val body = drain(ex)
          val obj = Obj(body, System.currentTimeMillis())
          if ("*" == ex.getRequestHeaders.getFirst("If-None-Match")) {
            conditionalPuts.incrementAndGet()
            if (store.putIfAbsent(id, obj) != null) {
              lostRaces.incrementAndGet()
              respond(ex, 412, errXml("PreconditionFailed"))
            } else if (commitLossRemaining
                .getAndUpdate(n => math.max(0, n - 1)) > 0) {
              // fail-after-effect: the put LANDED; the success reply is
              // lost (see injectCommitResponseLoss)
              faultsInjected.incrementAndGet()
              commitLossesFired.incrementAndGet()
              respond(ex, 503, errXml("SlowDown"))
            } else respond(ex, 200, Array.empty)
          } else { store.put(id, obj); respond(ex, 200, Array.empty) }
        }

      case "GET" if query.contains("list-type") =>
        lists.incrementAndGet()
        respond(ex, 200, listV2(bucket, query))

      case "GET" =>
        Option(store.get(id)) match {
          case None => respond(ex, 404, errXml("NoSuchKey"))
          case Some(obj) =>
            Option(ex.getRequestHeaders.getFirst("Range"))
              .filterNot(_ => ignoreRange) match {
              case Some(r) =>
                rangeGets.incrementAndGet()
                // all three RFC 7233 byte-range forms standard S3 clients
                // use: bytes=a-b, open-ended bytes=a-, suffix bytes=-n
                val ClosedRe = "bytes=(\\d+)-(\\d+)".r
                val OpenRe = "bytes=(\\d+)-".r
                val SuffixRe = "bytes=-(\\d+)".r
                val len = obj.bytes.length.toLong
                val parsed: Option[(Long, Long)] = r match {
                  case ClosedRe(a, b) => Some((a.toLong, math.min(b.toLong, len - 1)))
                  case OpenRe(a) => Some((a.toLong, len - 1))
                  case SuffixRe(n) => Some((math.max(0L, len - n.toLong), len - 1))
                  case _ => None
                }
                parsed match {
                  case Some((start, end)) if start <= end && start < len =>
                    val slice = java.util.Arrays.copyOfRange(
                      obj.bytes, start.toInt, end.toInt + 1)
                    ex.getResponseHeaders.set("Content-Range",
                      s"bytes $start-$end/$len")
                    respond(ex, 206, slice)
                  case _ => respond(ex, 416, errXml("InvalidRange"))
                }
              case None => respond(ex, 200, obj.bytes)
            }
        }

      case "HEAD" =>
        Option(store.get(id)) match {
          case None => respond(ex, 404, Array.empty)
          case Some(obj) =>
            // JDK HttpServer drops a sendResponseHeaders length on HEAD;
            // set the header explicitly (tested: the client sees it)
            ex.getResponseHeaders.set("Content-Length", obj.bytes.length.toString)
            ex.getResponseHeaders.set("Last-Modified",
              httpDate.format(Instant.ofEpochMilli(obj.mtimeMs)))
            ex.sendResponseHeaders(200, -1)
        }

      case "DELETE" =>
        store.remove(id)
        ex.sendResponseHeaders(204, -1)

      case "POST" if query.contains("delete") =>
        multiDeletes.incrementAndGet()
        val body = new String(drain(ex), UTF_8)
        val keys = "<Key>(.*?)</Key>".r.findAllMatchIn(body)
          .map(m => xmlUnesc(m.group(1))).toSeq
        keys.foreach(k => store.remove(s"$bucket/$k"))
        val xml = new StringBuilder("<DeleteResult>")
        keys.foreach(k => xml.append("<Deleted><Key>").append(xmlEsc(k))
          .append("</Key></Deleted>"))
        xml.append("</DeleteResult>")
        respond(ex, 200, xml.toString.getBytes(UTF_8))

      case other => respond(ex, 405, errXml(s"MethodNotAllowed:$other"))
    }
  }

  private def listV2(bucket: String, query: Map[String, String]): Array[Byte] = {
    val prefix = query.getOrElse("prefix", "")
    val delimiter = query.get("delimiter").filter(_.nonEmpty)
    // clamp to >= 1: max-keys=0 would truncate before the first item
    // with an empty resume token, spinning the client forever
    val maxKeys = math.max(1, query.get("max-keys").map(_.toInt).getOrElse(1000))
    // Tokens are typed so resume semantics can differ per producer:
    //  gt:<key>    resume strictly after a content key
    //  ge:<bound>  resume at-or-after a CommonPrefix group's upper bound
    //              (bound = prefix with its last char + 1; `>` here
    //              would skip a REAL object whose key equals the bound)
    val token = query.getOrElse("continuation-token", "")
    val (inclusive, startAfter) =
      if (token.startsWith("ge:")) (true, token.drop(3))
      else if (token.startsWith("gt:")) (false, token.drop(3))
      else (false, token) // no/legacy token
    val bucketPrefix = bucket + "/"

    import scala.jdk.CollectionConverters._
    val matching = store.entrySet().asScala.toSeq
      .filter(_.getKey.startsWith(bucketPrefix))
      .map(e => (e.getKey.drop(bucketPrefix.length), e.getValue))
      .filter { case (k, _) => k.startsWith(prefix) &&
        (if (inclusive) k >= startAfter else k > startAfter) }
      .sortBy(_._1)

    val contents = scala.collection.mutable.ArrayBuffer[(String, Obj)]()
    val prefixes = scala.collection.mutable.LinkedHashSet[String]()
    var taken = 0
    var lastToken = ""
    var truncatedAt: Option[String] = None
    val it = matching.iterator
    while (it.hasNext && truncatedAt.isEmpty) {
      val (k, obj) = it.next()
      if (taken >= maxKeys) truncatedAt = Some(lastToken)
      else {
        delimiter.flatMap { d =>
          val rest = k.drop(prefix.length)
          val idx = rest.indexOf(d)
          if (idx >= 0) Some(prefix + rest.take(idx + d.length)) else None
        } match {
          case Some(common) =>
            if (!prefixes.contains(common)) { prefixes += common; taken += 1 }
            // skip the WHOLE group on resume (else the next page
            // re-emits the same CommonPrefix), but inclusively: a real
            // key may equal the computed bound
            lastToken = "ge:" + common.init + (common.last + 1).toChar
          case None =>
            contents += ((k, obj)); taken += 1; lastToken = "gt:" + k
        }
      }
    }

    val xml = new StringBuilder("<?xml version=\"1.0\"?><ListBucketResult>")
    xml.append("<IsTruncated>").append(truncatedAt.isDefined).append("</IsTruncated>")
    contents.foreach { case (k, obj) =>
      xml.append("<Contents><Key>").append(xmlEsc(k)).append("</Key>")
        .append("<Size>").append(obj.bytes.length).append("</Size>")
        .append("<LastModified>")
        .append(isoDate.format(Instant.ofEpochMilli(obj.mtimeMs)))
        .append("</LastModified></Contents>")
    }
    prefixes.foreach(p => xml.append("<CommonPrefixes><Prefix>")
      .append(xmlEsc(p)).append("</Prefix></CommonPrefixes>"))
    truncatedAt.foreach(t => xml.append("<NextContinuationToken>")
      .append(xmlEsc(t)).append("</NextContinuationToken>"))
    xml.append("</ListBucketResult>")
    xml.toString.getBytes(UTF_8)
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    if (body.isEmpty) ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, body.length.toLong)
      val out = ex.getResponseBody
      out.write(body)
      out.close()
    }
  }

  private def copyResultXml(): Array[Byte] =
    "<CopyObjectResult><ETag>\"0\"</ETag></CopyObjectResult>".getBytes(UTF_8)

  private def errXml(code: String): Array[Byte] =
    s"<Error><Code>${xmlEsc(code)}</Code></Error>".getBytes(UTF_8)

  private def parseQuery(raw: String): Map[String, String] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split('&').map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => URLDecoder.decode(k, UTF_8.name) -> URLDecoder.decode(v, UTF_8.name)
        case Array(k) => URLDecoder.decode(k, UTF_8.name) -> ""
      }
    }.toMap

  private def drain(ex: HttpExchange): Array[Byte] = {
    val in = ex.getRequestBody
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
}

object S3LiteServer {
  /** One JVM-wide endpoint for gate queries and specs that exercise the
    * s3a:// path — started on first touch, lives for the JVM (the gate
    * runner invokes many queries against one session; per-query server
    * churn would invalidate the FileSystem cache's endpoint). */
  lazy val shared: S3LiteServer = new S3LiteServer

  /** Inverse of [[S3LiteFileSystem.encodeKey]]: per-segment percent
    * decode, preserving empty segments (directory markers). */
  private[sources] def decodeKey(raw: String): String =
    raw.split("/", -1).map(URLDecoder.decode(_, UTF_8.name)).mkString("/")
}
