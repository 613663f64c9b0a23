package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.format.GraftFormat
import graft.format.GraftFormat.Manifest
import graft.sources.{S3LiteFileSystem, S3LiteServer}

/** S3 deployment conformance over REAL s3a:// URIs and real HTTP
  * (reference matrix: TestLanceS3DefaultConnectorTest.java,
  * TestLanceS3SingleLevelConnectorSmokeTest.java, runner wiring at
  * LanceQueryRunner.java:82-94 — LocalStack replaced by the in-process
  * [[S3LiteServer]], hadoop-aws by the wire-compatible
  * [[S3LiteFileSystem]], since neither ships offline).
  *
  * Wire counters prove the protocol features actually crossed HTTP:
  * conditional puts carry If-None-Match and losers get 412; parquet
  * scans issue ranged GETs; recursive deletes use multi-object DELETE.
  */
class S3IntegrationSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val srv = S3LiteServer.shared

  private def newConf(pageSize: Int = 1000): Configuration = {
    val conf = new Configuration()
    conf.set("fs.s3a.impl", classOf[S3LiteFileSystem].getName)
    conf.set(S3LiteFileSystem.EndpointKey, srv.endpoint)
    conf.setInt(S3LiteFileSystem.ListPageSizeKey, pageSize)
    conf.setBoolean("fs.s3a.impl.disable.cache", true)
    conf
  }

  private def fsFor(bucket: String, pageSize: Int = 1000): FileSystem =
    new Path(s"s3a://$bucket/").getFileSystem(newConf(pageSize))

  private def writeObj(fs: FileSystem, p: Path, content: String,
      overwrite: Boolean = true): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def readObj(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
  }

  test("fs contract: put/get/ranged read/list/rename/delete over HTTP") {
    val fs = fsFor("contract")
    val base = new Path("s3a://contract/a")
    writeObj(fs, new Path(base, "x.txt"), "hello s3 world")
    writeObj(fs, new Path(base, "sub/y.txt"), "nested")

    // status + read-back
    val st = fs.getFileStatus(new Path(base, "x.txt"))
    assert(!st.isDirectory && st.getLen == 14)
    assert(st.getModificationTime > 0, "LastModified must round-trip")
    assert(readObj(fs, new Path(base, "x.txt")) == "hello s3 world")

    // ranged read: seek + positioned read hit the Range path
    val before = srv.rangeGets.get()
    val in = fs.open(new Path(base, "x.txt"))
    try {
      in.seek(6)
      val buf = new Array[Byte](2)
      in.readFully(buf)
      assert(new String(buf, "UTF-8") == "s3")
      val buf2 = new Array[Byte](5)
      in.readFully(0L, buf2)
      assert(new String(buf2, "UTF-8") == "hello")
    } finally in.close()
    assert(srv.rangeGets.get() > before, "reads must use ranged GETs")

    // directory emulation: virtual dirs, delimiter listing
    assert(fs.getFileStatus(base).isDirectory)
    val names = fs.listStatus(base).map(_.getPath.getName).sorted
    assert(names.sameElements(Array("sub", "x.txt")), names.mkString(","))

    // rename = COPY + DELETE on the wire
    val copiesBefore = srv.copies.get()
    assert(fs.rename(new Path(base, "x.txt"), new Path(base, "z.txt")))
    assert(srv.copies.get() > copiesBefore)
    assert(!fs.exists(new Path(base, "x.txt")))
    assert(readObj(fs, new Path(base, "z.txt")) == "hello s3 world")
    // rename onto an existing directory moves the source UNDER it
    assert(fs.rename(new Path(base, "z.txt"), new Path(base, "sub")))
    assert(readObj(fs, new Path(base, "sub/z.txt")) == "hello s3 world")

    // recursive delete goes through multi-object DELETE
    val mdBefore = srv.multiDeletes.get()
    assert(fs.delete(base, true))
    assert(srv.multiDeletes.get() > mdBefore)
    assert(!fs.exists(base))
  }

  test("list pagination: continuation tokens traverse >1 page") {
    val fs = fsFor("paging", pageSize = 25)
    val dir = new Path("s3a://paging/many")
    (0 until 90).foreach(i => writeObj(fs, new Path(dir, f"k$i%04d"), i.toString))
    val listsBefore = srv.lists.get()
    val listed = fs.listStatus(dir)
    assert(listed.length == 90)
    assert(srv.lists.get() - listsBefore >= 4,
      "90 keys at page size 25 must take >= 4 LIST round-trips")
    fs.delete(dir, true)
  }

  test("wire edge cases: range forms, encoded copy, zero-len read, double close") {
    val fs = fsFor("edge")
    val p = new Path("s3a://edge/base.bin")
    writeObj(fs, p, "0123456789")

    // open-ended (bytes=a-) and suffix (bytes=-n) ranges, straight HTTP —
    // standard S3 clients/hadoop-aws use these; a LocalStack stand-in must too
    def rawRange(range: String): (Int, String) = {
      val c = new java.net.URL(s"${srv.endpoint}/edge/base.bin")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      c.setRequestProperty("Range", range)
      val code = c.getResponseCode
      val body = if (code < 400) {
        val in = c.getInputStream
        val bytes = in.readAllBytes(); in.close(); new String(bytes, "UTF-8")
      } else { Option(c.getErrorStream).foreach(_.close()); "" }
      (code, body)
    }
    assert(rawRange("bytes=3-6") == ((206, "3456")))
    assert(rawRange("bytes=7-") == ((206, "789")))
    assert(rawRange("bytes=-4") == ((206, "6789")))
    assert(rawRange("bytes=99-")._1 == 416)

    // copy of keys with spaces/specials: rename percent-encodes copy-source
    val odd = new Path("s3a://edge/dir/a b+c%.txt")
    writeObj(fs, odd, "odd name")
    assert(fs.rename(odd, new Path("s3a://edge/dir/d e.txt")))
    assert(readObj(fs, new Path("s3a://edge/dir/d e.txt")) == "odd name")

    // sequential readahead: a burst of tiny reads costs ONE ranged GET
    val rg0 = srv.rangeGets.get()
    val seqIn = fs.open(p)
    try {
      (0 until 10).foreach { i =>
        val one = new Array[Byte](1)
        assert(seqIn.read(one, 0, 1) == 1 && one(0) == ('0' + i).toByte)
      }
    } finally seqIn.close()
    assert(srv.rangeGets.get() == rg0 + 1,
      s"10 sequential 1-byte reads took ${srv.rangeGets.get() - rg0} GETs " +
        "— readahead buffer not engaged")

    // zero-length read returns 0 even at EOF (InputStream contract)
    val in = fs.open(p)
    try {
      in.seek(10)
      assert(in.read(new Array[Byte](4), 0, 0) == 0)
      assert(in.read(10L, new Array[Byte](4), 0, 0) == 0)
      assert(in.read(new Array[Byte](4), 0, 4) == -1)
    } finally in.close()

    // double close must not re-PUT (nor re-send If-None-Match -> spurious 412)
    val exc = new Path("s3a://edge/once")
    val out = fs.create(exc, false)
    out.write("one".getBytes("UTF-8"))
    out.close()
    out.close() // second close: must be a no-op
    assert(readObj(fs, exc) == "one")

    fs.delete(new Path("s3a://edge/"), true)
  }

  test("paged delimiter listing never duplicates a CommonPrefix") {
    val fs = fsFor("prefpage", pageSize = 3)
    val root = new Path("s3a://prefpage/r")
    // 6 subdirs x 4 keys: groups straddle the 3-item page boundary
    for (d <- 0 until 6; i <- 0 until 4)
      writeObj(fs, new Path(root, f"d$d%02d/k$i"), "x")
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
    assert(dirs.length == dirs.distinct.length, s"duplicate prefixes: ${dirs.mkString(",")}")
    assert(dirs.sorted.sameElements((0 until 6).map(d => f"d$d%02d")))
    fs.delete(new Path("s3a://prefpage/"), true)

    // adversarial: an object whose key EQUALS a group's resume bound
    // ('a' + '/'+1 = "a0") must still be listed after a mid-group
    // truncation — a strictly-greater resume filter would skip it
    val fs2 = fsFor("prefbound", pageSize = 2)
    val r2 = new Path("s3a://prefbound/r")
    for (i <- 0 until 4) writeObj(fs2, new Path(r2, s"a/k$i"), "x")
    writeObj(fs2, new Path(r2, "a0"), "bound-key")
    val names = fs2.listStatus(r2).map(_.getPath.getName).sorted
    assert(names.sameElements(Array("a", "a0")), names.mkString(","))
    assert(readObj(fs2, new Path(r2, "a0")) == "bound-key")
    fs2.delete(new Path("s3a://prefbound/"), true)
    assert(!fs2.exists(new Path(r2, "a0")), "recursive delete must reach the bound key")
  }

  test("conditional put: If-None-Match crosses the wire, loser gets 412") {
    val fs = fsFor("cas")
    val p = new Path("s3a://cas/obj")
    val condBefore = srv.conditionalPuts.get()
    val lostBefore = srv.lostRaces.get()
    writeObj(fs, p, "first", overwrite = false)
    intercept[FileAlreadyExistsException] {
      writeObj(fs, p, "second", overwrite = false)
    }
    assert(readObj(fs, p) == "first", "losing put must not overwrite")
    assert(srv.conditionalPuts.get() >= condBefore + 1)
    assert(srv.lostRaces.get() == lostBefore + 1,
      "the loss must be store-enforced (HTTP 412), not a client pre-check")
    assert(fs.hasPathCapability(p, "fs.capability.conditional.create"))
    fs.delete(p, false)
  }

  test("8-writer commit storm over s3a: gapless CAS chain, typed losers") {
    val fs = fsFor("storm")
    val dir = new Path("s3a://storm/t.graft")
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))).json
    val writers = 8
    val commitsEach = 5
    val pool = Executors.newFixedThreadPool(writers)
    try {
      val futures = (1 to writers).map { w =>
        pool.submit(new Callable[Unit] {
          override def call(): Unit =
            (1 to commitsEach).foreach { i =>
              // 8 contenders x 5 commits: a scheduler-starved writer can
              // legitimately lose up to 39 consecutive CAS rounds under
              // a parallel-suite-loaded box; the production default (20)
              // bounds commit latency, the storm needs the full budget
              GraftFormat.commitWithRetry(fs, dir, maxAttempts = 120) { base =>
                Manifest(
                  version = base.map(_.version + 1).getOrElse(1L),
                  schemaJson = schemaJson,
                  fragments = Seq.empty,
                  maxFragmentId = 0,
                  createdAtMs = System.currentTimeMillis(),
                  operation = if (base.isEmpty) "Create" else "Append",
                  properties = Map("writer" -> w.toString, "seq" -> i.toString))
              }
            }
        })
      }
      futures.foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdown()

    val total = writers * commitsEach
    val versions = GraftFormat.listVersions(fs, dir)
    assert(versions == (1L to total.toLong),
      s"version chain has gaps or extras: $versions")
    val identities = versions.map { v =>
      val m = GraftFormat.readManifest(fs, dir, v)
      assert(m.version == v)
      (m.properties("writer"), m.properties("seq"))
    }
    assert(identities.distinct.size == total,
      "a commit landed at two versions (overwrite/duplication)")
    fs.delete(new Path("s3a://storm/"), true)
  }

  test("spark lifecycle over s3a: ctas, append, dv delete, time travel") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[S3LiteFileSystem].getName)
    hc.set(S3LiteFileSystem.EndpointKey, srv.endpoint)
    spark.conf.set("spark.sql.catalog.s3it", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.s3it.warehouse", "s3a://sparkit/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS s3it.db")
    spark.sql("DROP TABLE IF EXISTS s3it.db.nat")

    val nation = Tables.load(spark, sf, "nation")
    nation.createOrReplaceTempView("s3_nat_src")

    val condBefore = srv.conditionalPuts.get()
    spark.sql("CREATE TABLE s3it.db.nat AS SELECT * FROM s3_nat_src")
    assert(srv.conditionalPuts.get() > condBefore,
      "manifest commit must use a wire-level conditional put")

    // scan back over HTTP — parquet footers read via ranged GETs
    val rangeBefore = srv.rangeGets.get()
    assert(spark.table("s3it.db.nat").count() == 25)
    assert(srv.rangeGets.get() > rangeBefore,
      "parquet scan must issue ranged GETs, not whole-object downloads")

    // append -> v2; DV delete -> v3; verify merge-on-read + time travel
    spark.sql("INSERT INTO s3it.db.nat SELECT * FROM s3_nat_src")
    assert(spark.table("s3it.db.nat").count() == 50)
    spark.sql("DELETE FROM s3it.db.nat WHERE n_regionkey = 0")
    val afterDelete = spark.table("s3it.db.nat").count()
    val expectDeleted = 2 * nation.filter(col("n_regionkey") === 0).count()
    assert(afterDelete == 50 - expectDeleted)
    assert(spark.sql("SELECT * FROM s3it.db.nat VERSION AS OF 1").count() == 25)
    assert(spark.sql("SELECT * FROM s3it.db.nat VERSION AS OF 2").count() == 50)

    // predicate pushdown still reaches the scan over s3a
    val pruned = spark.table("s3it.db.nat").filter(col("n_nationkey") === 7)
    assert(pruned.count() == (50 - expectDeleted) / 25 ||
      pruned.count() <= 2) // nation 7 not in region 0 -> 2 copies
    spark.sql("DROP TABLE s3it.db.nat")
    assert(srv.objectCount("sparkit") < 5,
      "drop must leave no orphan objects behind")
  }

  test("concurrent row-level DML over s3a: typed conflicts, clean retry, " +
      "no lost or doubled effects") {
    // the reference ABORTS its concurrent row-level tests
    // (TestLanceConnectorTest.java:393-410: "Lance does not support
    // concurrent updates reliably") and detects conflicts by string
    // match (LanceMetadata.java:1492-1513). graft makes both typed and
    // deterministic — here over real-HTTP object storage.
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[S3LiteFileSystem].getName)
    hc.set(S3LiteFileSystem.EndpointKey, srv.endpoint)
    spark.conf.set("spark.sql.catalog.s3cc", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.s3cc.warehouse", "s3a://s3ccwh/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS s3cc.db")
    spark.sql("DROP TABLE IF EXISTS s3cc.db.t")
    // ONE fragment of 200 rows: every row-level op below overlaps it
    spark.sql("CREATE TABLE s3cc.db.t AS SELECT id AS k, 0L AS v " +
      "FROM range(0, 200, 1, 1)")

    // deterministic typed conflict: an op pinned at v1 loses to a
    // committed DELETE on the same fragment — same assertion as the
    // local GraftDmlSpec case, but the manifest CAS and DV files cross
    // HTTP here
    val dir = new Path("s3a://s3ccwh/wh/db/t.graft")
    val fs = dir.getFileSystem(hc)
    val qual = fs.makeQualified(dir)
    val pinnedManifest = GraftFormat.readLatest(fs, qual).get
    val pinned = new graft.connector.GraftTable("s3cc.db.t", qual,
      pinnedManifest, hc)
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "s3-conflict"
      override def schema(): org.apache.spark.sql.types.StructType =
        pinnedManifest.schema
      override def options(): org.apache.spark.sql.util.CaseInsensitiveStringMap =
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
    }
    val write = new graft.connector.GraftDeltaWrite(pinned, info)
    spark.sql("DELETE FROM s3cc.db.t WHERE k = 199")
    val fragId = pinnedManifest.fragments.head.id
    val partial = GraftFormat.writeDeletionFile(fs, qual, fragId, 0L, Array(3L))
    intercept[GraftFormat.ConcurrentModificationException] {
      write.commit(Array(graft.connector.GraftDeltaCommit(
        Seq.empty, Seq((fragId, partial)))))
    }
    assert(spark.table("s3cc.db.t").count() == 199,
      "the conflicting op must not commit")

    // storm: 6 threads x (DELETE own keys | UPDATE own keys), all on the
    // one shared fragment; losers retry the STATEMENT (re-reading the
    // new version) — the reference's unreliable case, made reliable
    val conflicts = new java.util.concurrent.atomic.AtomicInteger()
    def retrying(sql: String): Unit = {
      var attempts = 0
      while (attempts < 25) {
        attempts += 1
        try { spark.sql(sql); return }
        catch {
          case t: Throwable =>
            def isTyped(x: Throwable): Boolean =
              x != null && (x.isInstanceOf[
                GraftFormat.ConcurrentModificationException] ||
                isTyped(x.getCause))
            if (!isTyped(t)) throw t
            conflicts.incrementAndGet()
        }
      }
      fail(s"statement never committed after 25 attempts: $sql")
    }
    val pool = Executors.newFixedThreadPool(6)
    try {
      val futures = (0 until 6).map { w =>
        pool.submit(new Callable[Unit] {
          override def call(): Unit =
            if (w % 2 == 0) retrying(s"DELETE FROM s3cc.db.t WHERE k % 6 = $w")
            else retrying(s"UPDATE s3cc.db.t SET v = ${w + 100} WHERE k % 6 = $w")
        })
      }
      futures.foreach(_.get(180, TimeUnit.SECONDS))
    } finally pool.shutdown()

    // every op applied exactly once: k%6 in {0,2,4} = all 100 evens
    // deleted; the 99 surviving odds (100 minus the pre-storm k=199)
    // carry their writer's value
    val rows = spark.table("s3cc.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (k, _) => k % 2 == 1 }, "evens survived delete")
    assert(rows.length == 99, s"expected 99 odd rows, got ${rows.length}")
    rows.foreach { case (k, v) =>
      assert(v == (k % 6) + 100, s"k=$k has v=$v, writer effect lost")
    }
    System.err.println(s"[s3cc] typed conflicts retried: ${conflicts.get()}")
    spark.sql("DROP TABLE s3cc.db.t")
  }

  test("vacuum orphan grace works over s3a: object Last-Modified dates " +
      "the in-flight file, grace protects it, opt-out GCs it") {
    // the grace check rests on file mtimes; on the object store those
    // come from the Last-Modified header — prove the whole chain
    val conf = newConf()
    spark.sparkContext.hadoopConfiguration.set("fs.s3a.impl",
      classOf[S3LiteFileSystem].getName)
    spark.sparkContext.hadoopConfiguration.set(
      S3LiteFileSystem.EndpointKey, srv.endpoint)
    spark.conf.set("spark.sql.catalog.s3og", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.s3og.warehouse", "s3a://s3ogwh/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS s3og.db")
    spark.sql("DROP TABLE IF EXISTS s3og.db.t")
    spark.sql("CREATE TABLE s3og.db.t AS SELECT 1L AS k")
    val dir = new Path("s3a://s3ogwh/wh/db/t.graft")
    val fs = dir.getFileSystem(conf)
    val orphan = new Path(dir, "data/in-flight.parquet")
    writeObj(fs, orphan, "pending-commit-bytes")
    graft.ops.Maintenance.vacuum(spark, fs.makeQualified(dir),
      keepVersions = 1, minVersionsRetained = 1)
    assert(fs.exists(orphan),
      "s3a orphan younger than the grace window was deleted — " +
        "Last-Modified not reaching the grace check")
    graft.ops.Maintenance.vacuum(spark, fs.makeQualified(dir),
      keepVersions = 1, minVersionsRetained = 1, orphanGraceMs = 0)
    assert(!fs.exists(orphan), "aged-out s3a orphan must be GC'd")
    assert(spark.table("s3og.db.t").count() == 1)
    spark.sql("DROP TABLE s3og.db.t")
  }

  test("Range-ignoring endpoint (200 full body): reads stay byte-correct") {
    // RFC 7233 lets a server ignore Range and answer 200 with the whole
    // object; some S3-compatible endpoints do. The client must treat
    // that body as starting at offset 0 — buffering it as if it began
    // at the requested offset would serve every later read shifted.
    // Dedicated server instance: the knob is global per server, and
    // suites may run concurrently against the shared one.
    val local = new S3LiteServer
    local.ignoreRange = true
    try {
      val conf = new Configuration()
      conf.set("fs.s3a.impl", classOf[S3LiteFileSystem].getName)
      conf.set(S3LiteFileSystem.EndpointKey, local.endpoint)
      conf.setBoolean("fs.s3a.impl.disable.cache", true)
      val fs = new Path("s3a://norange/").getFileSystem(conf)
      val p = new Path("s3a://norange/blob.bin")
      // > 64 KB readahead so a honored range would be a strict subset
      val content = Array.tabulate(300000)(i => (i % 251).toByte)
      val out = fs.create(p, true)
      try out.write(content) finally out.close()

      val in = fs.open(p)
      try {
        // buffered sequential path from a mid-object seek
        in.seek(100003)
        val b = new Array[Byte](1024)
        in.readFully(b)
        assert(b.toSeq == content.slice(100003, 101027).toSeq,
          "buffered read served shifted bytes after a 200 full-body GET")
        // positioned (pread) path
        val b2 = new Array[Byte](512)
        in.readFully(200001L, b2)
        assert(b2.toSeq == content.slice(200001, 200513).toSeq,
          "positioned read served shifted bytes after a 200 full-body GET")
        // re-read through the persisted buffer
        in.seek(5)
        val b3 = new Array[Byte](16)
        in.readFully(b3)
        assert(b3.toSeq == content.slice(5, 21).toSeq)
      } finally in.close()
    } finally local.stop()
  }

  test("g17 gate query answers correctly over s3a") {
    val df = SparkEntry.queries("g17_s3_object_store")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n")).sum
    val expected = Tables.load(spark, sf, "customer")
      .filter(col("c_custkey") % 3 =!= 0).count()
    assert(n == expected, s"s3a read-back row count $n != $expected")
  }
}
