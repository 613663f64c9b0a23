package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Two-process storm probe (r12 VERDICT ask #2's artifact row): this
  * JVM and a [[StormAgent]] child JVM interleave CAS appends (the
  * child also compacts + vacuums after every append) on one table,
  * over file://, over s3a:// (real HTTP to this JVM's S3LiteServer),
  * over a FAULTED s3a window, and — r15 VERDICT #4 — over a faulted
  * s3a window with checkpoint cadence 4 and an aggressively vacuuming
  * child, so vacuum's boundary materialization races live delta
  * committers and chain walkers across cadence rollovers. Writes
  * BENCH_STORM.json: wall time, per-process commit counts, final-state
  * integrity (lost/duplicated rows, version-chain contiguity), the
  * typed cross-process CAS conflict, and the s3a wire evidence
  * (conditional puts, lost races). `exactly_once` is strictly the
  * data-integrity verdict; `lost_reply_coverage` separately reports
  * whether the loss-unit/vacuum paths actually fired this run (r15
  * ADVICE: a coverage shortfall must not read as data loss);
  * `certified` is their conjunction.
  *
  * The correctness contract lives in TwoProcessStormSpec; this main
  * exists so the round artifact carries a committed measurement of the
  * same storm (`sbt "runMain graft.StormBench"`, quiet box).
  */
object StormBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val appendsEach = 30
    // liveness bound, not a perf metric: the default must tolerate a
    // slower machine (round-15 lesson — a 1.45x slower box pushed the
    // s3a leg's child past the old 300 s and the kill read as lost rows
    // in the artifact, which the storm exists to DISPROVE). Parsed ONCE
    // before any leg launches so a malformed value fails fast, not
    // minutes in with a live agent to tear down.
    val awaitSec = sys.env.get("GRAFT_STORM_AWAIT_SEC").map { s =>
      try s.toLong
      catch { case _: NumberFormatException =>
        sys.error(s"GRAFT_STORM_AWAIT_SEC must be a number of seconds, got '$s'")
      }
    }.getOrElse(900L)
    def storm(dir: Path, fs: org.apache.hadoop.fs.FileSystem,
        childBase: Long,
        extraEnv: Map[String, String] = Map.empty): Map[String, Any] = {
      graft.connector.GraftWriter.write(fs, dir, Seq(-1L).toDF("k"),
        overwrite = true)
      val t0 = System.nanoTime()
      val agent = StormHarness.launchAgent(Map(
        "GRAFT_STORM_DIR" -> dir.toUri.toString,
        "GRAFT_STORM_KEYS" -> s"$childBase:$appendsEach",
        "GRAFT_STORM_MAINT" -> "true",
        "GRAFT_STORM_SLEEP_MS" -> "15") ++
        (if (dir.toUri.getScheme == "s3a")
          Map("GRAFT_STORM_ENDPOINT" ->
            graft.sources.S3LiteServer.shared.endpoint)
        else Map.empty) ++ extraEnv)
      // a parent-side failure past this point must not leave an orphan
      // agent storming the box (the closing bench sweep runs later on
      // the same machine and must see a quiet JVM landscape)
      val (exit, out, conflictType) = try {
        // typed CROSS-process conflict via the shared protocol
        // (StormHarness.forceCrossProcessConflict): the parent stays
        // QUIET until the head moves, so the colliding version can only
        // be the child's
        val conflict = StormHarness
          .forceCrossProcessConflict(fs, dir, waitSec = 120)
          .getOrElse("none")
        (0L until appendsEach).foreach { k =>
          graft.connector.GraftWriter.write(fs, dir, Seq(k).toDF("k"),
            overwrite = false)
          Thread.sleep(15)
        }
        val (e, o) = StormHarness.await(agent, awaitSec)
        (e, o, conflict)
      } finally {
        agent.proc.destroyForcibly()
        ()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val manifest = graft.format.GraftFormat.readLatest(fs, dir).get
      val table = org.apache.spark.sql.GraftShim.tableDF(spark,
        new graft.connector.GraftTable(s"stormbench:$dir", dir, manifest,
          fs.getConf))
      val got = table.groupBy("k").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = (Seq(-1L) ++ (0L until appendsEach) ++
        (childBase until childBase + appendsEach)).toSet
      val versions = graft.format.GraftFormat.listVersions(fs, dir)
      Map(
        "wall_sec" -> math.round(wall * 100) / 100.0,
        "parent_appends" -> appendsEach,
        "child_appends" -> StormHarness.agentAppends(out),
        "child_exit" -> exit,
        "commits_total" -> versions.max,
        "lost_rows" -> (expected -- got.keySet).size,
        "dup_rows" -> got.count(_._2 > 1),
        "versions_contiguous" -> (versions == (versions.min to versions.max)),
        "typed_conflict" -> conflictType)
    }

    // file://
    val fileDir = new Path(java.nio.file.Files
      .createTempDirectory("graft-stormbench").resolve("t.graft").toUri)
    val fileFs = fileDir.getFileSystem(spark.sessionState.newHadoopConf())
    val fileRes = storm(fileDir, fileFs, 5000L)

    // s3a:// via real HTTP
    val srv = graft.sources.S3LiteServer.shared
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[graft.sources.S3LiteFileSystem].getName)
    hc.set(graft.sources.S3LiteFileSystem.EndpointKey, srv.endpoint)
    hc.setBoolean("fs.s3a.impl.disable.cache", true)
    val s3Dir = new Path("s3a://stormbench/t.graft")
    val s3Fs = s3Dir.getFileSystem(hc)
    val condBefore = srv.conditionalPuts.get()
    val racesBefore = srv.lostRaces.get()
    val s3Res = storm(s3Dir, s3Fs, 7000L) ++ Map(
      "conditional_puts" -> (srv.conditionalPuts.get() - condBefore),
      "cas_lost_races" -> (srv.lostRaces.get() - racesBefore))
    s3Fs.delete(new Path("s3a://stormbench/"), true)

    // s3a through a LOSSY window (r13 VERDICT #5): a background injector
    // arms short fault bursts — 503 / 500 / torn connections across
    // read AND write methods, plus lost commit replies (applied, 503
    // answered) — for the storm's whole duration; both processes'
    // requests hit the same windows. Exactly-once must hold anyway:
    // idempotent requests heal by retry, ambiguous commits by content
    // read-back.
    // runs `body` under the lossy-window injector, returning its result
    // plus the fault/loss/retry accounting for the window
    def underFaults(body: => Map[String, Any]): Map[String, Any] = {
      val faultsBefore = srv.faultsInjected.get()
      val lossesBefore = srv.commitLossesFired.get()
      val retriedBefore = graft.sources.S3LiteFileSystem.retriedRequests.get()
      val stopInjector = new java.util.concurrent.atomic.AtomicBoolean(false)
      val injector = new Thread(() => {
        val kinds = Array("503", "500", "reset")
        var n = 0
        while (!stopInjector.get()) {
          // burst: re-arm every 400 ms for ~1.2 s...
          var b = 0
          while (b < 3 && !stopInjector.get()) {
            srv.injectFaults(kinds(n % 3),
              Set("GET", "HEAD", "PUT", "POST", "DELETE"), count = 2)
            // one lost-commit-reply unit armed EVERY burst (an n-keyed
            // stride aliased against the 3-step burst and could arm none
            // for whole cycles); the relief-phase clearFaults discards
            // unconsumed units, so commit_losses_fired in the artifact is
            // the ground truth of how often the read-back path ran
            if (b == 0) srv.injectCommitResponseLoss(1)
            n += 1; b += 1
            Thread.sleep(400)
          }
          // ...then RELENT. Without fault-free air the leg is unwinnable
          // by construction, not by any client's fault: armed units
          // persist until consumed, so once one process goes quiet the
          // lone remaining requester (whose backoff sleeps exceed the
          // 400 ms re-arm cadence) meets a fresh fault on EVERY retry —
          // a permanently-down store, which no bounded-retry client
          // (ours, s3a's, or the AWS SDK's) survives. Real throttle
          // windows relent; this models that: burst ≈ 1.2 s, relief
          // 1.2 s, so a 9-attempt exponential retry always straddles
          // some relief. (r14's run passed only because its shorter
          // backoff happened to out-race the arming cadence.)
          srv.clearFaults()
          Thread.sleep(1200)
        }
        srv.clearFaults()
      }, "storm-fault-injector")
      injector.setDaemon(true)
      injector.start()
      val res = try body finally {
        stopInjector.set(true); injector.join(2000); srv.clearFaults()
      }
      res ++ Map(
        "faults_injected" -> (srv.faultsInjected.get() - faultsBefore),
        "commit_losses_fired" ->
          (srv.commitLossesFired.get() - lossesBefore),
        "requests_retried" ->
          (graft.sources.S3LiteFileSystem.retriedRequests.get() - retriedBefore))
    }

    val s3fDir = new Path("s3a://stormfault/t.graft")
    val s3fFs = s3fDir.getFileSystem(hc)
    val s3fRes = underFaults(storm(s3fDir, s3fFs, 9000L))
    s3fFs.delete(new Path("s3a://stormfault/"), true)

    // s3a, faulted, VACUUM CONCURRENT WITH DELTA COMMITS ACROSS
    // CHECKPOINT BOUNDARIES (r15 VERDICT #4): cadence is dropped to 4 so
    // both processes' CAS appends cross a cadence rollover every few
    // commits, while the child vacuums aggressively (keep 6 versions,
    // no age floor) after every append — so the vacuum's
    // boundary-materialization (delta rewritten as a checkpoint) races
    // live delta committers and chain-walking readers, two-process,
    // under the same lossy window. The race was previously covered
    // single-process only (GraftDeltaCommitSpec "racing vacuum").
    val s3vDir = new Path("s3a://stormvacuum/t.graft")
    hc.setInt(graft.format.GraftFormat.CheckpointEveryKey, 4)
    val s3vRes = try {
      val s3vFs = s3vDir.getFileSystem(hc)
      underFaults(storm(s3vDir, s3vFs, 11000L, Map(
        "GRAFT_STORM_CHECKPOINT_EVERY" -> "4",
        "GRAFT_STORM_VACUUM_KEEP" -> "6",
        "GRAFT_STORM_VACUUM_AGE_MS" -> "0"))) ++ {
        // the leg must actually have dropped history (else the vacuum
        // raced nothing): surviving versions start well above 1
        val vs = graft.format.GraftFormat.listVersions(s3vFs, s3vDir)
        s3vFs.delete(new Path("s3a://stormvacuum/"), true)
        Map("oldest_retained_version" -> vs.min)
      }
    } finally hc.unset(graft.format.GraftFormat.CheckpointEveryKey)

    def jval(v: Any): String = v match {
      case s: String => "\"" + s + "\""
      case other => other.toString
    }
    def jobj(m: Map[String, Any]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + jval(v) }
        .mkString("{", ",", "}")
    // typed_conflict is part of the verdict (r13 ADVICE): COMMIT_WON is
    // a CAS protocol violation even when the clobbered child commit was
    // row-neutral (e.g. a compaction) and the row-level checks all pass —
    // a silent manifest overwrite must never publish exactly_once=true
    val exact = Seq(fileRes, s3Res, s3fRes, s3vRes).forall { r =>
      r("lost_rows") == 0 && r("dup_rows") == 0 &&
        r("versions_contiguous") == true && r("child_exit") == 0 &&
        Set("none", "CommitConflictException").contains(
          r("typed_conflict").asInstanceOf[String]) }
    // COVERAGE, reported separately from the data verdict (r15 ADVICE:
    // folding it into exactly_once conflated "no loss unit met a
    // winning conditional put this run" with data loss): the faulted
    // legs must actually have EXERCISED the lost-reply read-back, and
    // the vacuum leg must actually have dropped history. `certified` is
    // the combined gate the round artifact stands on.
    val coverage =
      s3fRes("commit_losses_fired").asInstanceOf[Long] > 0L &&
        s3vRes("commit_losses_fired").asInstanceOf[Long] > 0L &&
        s3vRes("oldest_retained_version").asInstanceOf[Long] > 1L
    val line = s"""{"metric":"two_process_storm","exactly_once":$exact,""" +
      s""""lost_reply_coverage":$coverage,""" +
      s""""certified":${exact && coverage},""" +
      s""""file":${jobj(fileRes)},"s3a":${jobj(s3Res)},""" +
      s""""s3a_faulted":${jobj(s3fRes)},"s3a_vacuum":${jobj(s3vRes)}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_STORM.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
