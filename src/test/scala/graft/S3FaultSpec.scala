package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

import graft.format.GraftFormat
import graft.sources.{S3LiteFileSystem, S3LiteServer}

/** Throttling / fault conformance over s3a (r13 VERDICT #5 — the
  * LocalStack-style error-path shakeout the reference gets from real
  * stores): [[S3LiteServer]] injects 503 SlowDown / 500 / torn-
  * connection windows, and the client must (a) transparently retry
  * IDEMPOTENT requests — reads, HEADs, listings, deletes, full-object
  * puts — and (b) never blind-retry the non-idempotent conditional put:
  * an ambiguous commit failure is disambiguated by content read-back
  * (own bytes landed = success; different bytes = lost race; absent =
  * safe re-attempt) or surfaced typed once bounded retries exhaust.
  * The fail-AFTER-effect case (commit applied, success reply lost) is
  * injected separately — the worst-case ambiguity, where a blind retry
  * would read its own landed write as a lost race and duplicate rows.
  */
class S3FaultSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val srv = S3LiteServer.shared

  private def newConf(): Configuration = {
    val conf = new Configuration()
    conf.set("fs.s3a.impl", classOf[S3LiteFileSystem].getName)
    conf.set(S3LiteFileSystem.EndpointKey, srv.endpoint)
    conf.setBoolean("fs.s3a.impl.disable.cache", true)
    conf.setLong(S3LiteFileSystem.RetryBaseMsKey, 5L) // keep tests fast
    conf
  }

  /** Spark's write path resolves s3a through the SESSION hadoop conf —
    * register the lite fs there too (same wiring as the storm bench). */
  private lazy val sessionS3: Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[S3LiteFileSystem].getName)
    hc.set(S3LiteFileSystem.EndpointKey, srv.endpoint)
    hc.setBoolean("fs.s3a.impl.disable.cache", true)
    hc.setLong(S3LiteFileSystem.RetryBaseMsKey, 5L)
  }

  private def fsFor(bucket: String): FileSystem = {
    sessionS3
    new Path(s"s3a://$bucket/").getFileSystem(newConf())
  }

  private def graftCount(fs: FileSystem, dir: Path): Long = {
    val m = GraftFormat.readLatest(fs, dir).get
    org.apache.spark.sql.GraftShim.tableDF(spark,
      new graft.connector.GraftTable(s"s3fault:$dir", dir, m, fs.getConf))
      .count()
  }

  private def seeded(bucket: String): (FileSystem, Path) = {
    import spark.implicits._
    val fs = fsFor(bucket)
    val dir = new Path(s"s3a://$bucket/db/t.graft")
    graft.connector.GraftWriter.write(fs, dir,
      (0L until 50L).toDF("k"), overwrite = true)
    (fs, dir)
  }

  test("idempotent reads retry through 503 / 500 / torn-connection " +
      "windows: HEAD, ranged GET, LIST all heal") {
    val (fs, dir) = seeded("fault-read")
    try {
      for (kind <- Seq("503", "500", "reset")) {
        val retried0 = S3LiteFileSystem.retriedRequests.get()
        val injected0 = srv.faultsInjected.get()
        srv.injectFaults(kind, Set("GET", "HEAD"), count = 3)
        assert(graftCount(fs, dir) == 50L,
          s"read through a $kind window must heal by retry")
        assert(srv.faultsInjected.get() > injected0,
          s"the $kind window never fired — the probe proved nothing")
        assert(S3LiteFileSystem.retriedRequests.get() > retried0,
          s"no retry recorded under the $kind window")
        srv.clearFaults()
      }
      // LIST is a GET with a query — fault it specifically via listStatus
      srv.injectFaults("503", Set("GET"), count = 2)
      assert(fs.listStatus(new Path(s"s3a://fault-read/db/t.graft/_versions"))
        .nonEmpty)
      srv.clearFaults()
    } finally srv.clearFaults()
  }

  test("a 503 on HEAD must surface as retry-then-answer, never as " +
      "FileNotFound (exists() under throttle)") {
    val (fs, dir) = seeded("fault-head")
    try {
      srv.injectFaults("503", Set("HEAD"), count = 2)
      assert(fs.exists(GraftFormat.manifestPath(dir, 1L)),
        "a throttled HEAD must not read a live manifest as missing")
    } finally srv.clearFaults()
  }

  test("idempotent deletes retry through a 503 window (single and " +
      "multi-object)") {
    val (fs, dir) = seeded("fault-del")
    try {
      srv.injectFaults("503", Set("DELETE", "POST"), count = 2)
      assert(fs.delete(new Path(dir, "data"), true),
        "recursive delete must heal through the window")
      srv.clearFaults()
    } finally srv.clearFaults()
  }

  test("a commit through a fail-BEFORE-effect fault window heals: the " +
      "conditional put never applied, read-back sees absent, re-attempt " +
      "commits exactly once") {
    import spark.implicits._
    val (fs, dir) = seeded("fault-commit")
    try {
      val v0 = GraftFormat.listVersions(fs, dir).max
      srv.injectFaults("503", Set("PUT"), count = 2)
      graft.connector.GraftWriter.write(fs, dir,
        Seq(100L).toDF("k"), overwrite = false)
      srv.clearFaults()
      assert(GraftFormat.listVersions(fs, dir) == (1L to (v0 + 1)),
        "exactly one new version")
      assert(graftCount(fs, dir) == 51L, "rows exactly once")
    } finally srv.clearFaults()
  }

  test("fail-AFTER-effect (commit applied, success reply lost): the " +
      "content read-back recognizes the own landed write — exactly one " +
      "version, zero duplicate rows") {
    import spark.implicits._
    val (fs, dir) = seeded("fault-commitloss")
    try {
      val v0 = GraftFormat.listVersions(fs, dir).max
      srv.injectCommitResponseLoss(1)
      graft.connector.GraftWriter.write(fs, dir,
        Seq(200L).toDF("k"), overwrite = false)
      assert(GraftFormat.listVersions(fs, dir) == (1L to (v0 + 1)),
        "the lost-reply commit must land exactly once, not rebuild at +2")
      assert(graftCount(fs, dir) == 51L,
        "a blind re-PUT after the lost reply would duplicate the append")
    } finally srv.clearFaults()
  }

  test("an unhealable fault window surfaces TYPED from the commit path " +
      "(bounded retries, then the 5xx), and the version is still free " +
      "afterwards") {
    val (fs, dir) = seeded("fault-typed")
    try {
      val v0 = GraftFormat.listVersions(fs, dir).max
      val m = GraftFormat.readLatest(fs, dir).get
      srv.injectFaults("503", Set("PUT"), count = 1000)
      val next = m.copy(version = v0 + 1,
        createdAtMs = System.currentTimeMillis(), operation = "Append")
      val e = intercept[java.io.IOException](GraftFormat.commit(fs, dir, next))
      def has503(t: Throwable): Boolean = t != null && (t.isInstanceOf[
        S3LiteFileSystem.S3HttpException] || has503(t.getCause))
      assert(has503(e), s"commit failure must carry the typed 5xx: $e")
      srv.clearFaults()
      // nothing half-landed: the same version commits cleanly now
      GraftFormat.commit(fs, dir, next)
      assert(GraftFormat.listVersions(fs, dir).max == v0 + 1)
    } finally srv.clearFaults()
  }
}
