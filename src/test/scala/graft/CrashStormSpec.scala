package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.format.GraftFormat

/** Crash-fault injection in the two-process storm (r13 VERDICT #3):
  * the graceful storm proved interleaving; this proves CRASH ATOMICITY.
  * A [[StormAgent]] child JVM dies by `Runtime.halt(137)` — kill -9
  * equivalent: no shutdown hooks, no finally blocks — at a seeded,
  * randomized append index, at each of the three mid-commit protocol
  * points (staged fragments written / fragments adopted into data/ but
  * manifest CAS not done / deletion vector written but not committed;
  * the reference's beginInsert-finishInsert crash window,
  * LanceMetadata.java:1031-1112). After the real process death:
  * the table reads at exactly the pre-crash version, the next writer
  * commits cleanly, the crash debris survives a default-grace vacuum
  * (it is indistinguishable from an in-flight write) and is GC'd by an
  * orphanGraceMs=0 vacuum — without touching live data.
  */
class CrashStormSpec extends AnyFunSuite {
  import TestSpark._

  /** Seeded so a failure reproduces exactly; vary the seed to roam the
    * kill-point space across rounds. */
  private val seed = 20260815L
  private val rng = new scala.util.Random(seed)

  private def tableCount(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Long = {
    val m = GraftFormat.readLatest(fs, dir).get
    org.apache.spark.sql.GraftShim.tableDF(spark,
      new graft.connector.GraftTable(s"crash:$dir", dir, m, fs.getConf))
      .count()
  }

  private def stagingDirs(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Seq[String] =
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(".staging-"))

  private def unreferencedData(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Seq[String] = {
    val referenced = GraftFormat.listVersions(fs, dir)
      .flatMap(v => GraftFormat.readManifest(fs, dir, v).fragments)
      .flatMap(f => f.path +: f.deletionPath.toSeq).toSet
    val data = new Path(dir, "data")
    val d = if (fs.exists(data))
      fs.listStatus(data).toSeq.map(s => s"data/${s.getPath.getName}")
    else Seq.empty
    val dels = new Path(dir, "_deletions")
    val dl = if (fs.exists(dels))
      fs.listStatus(dels).toSeq.map(s => s"_deletions/${s.getPath.getName}")
    else Seq.empty
    (d ++ dl).filterNot(referenced.contains)
  }

  private def crashCase(point: String, s3a: Boolean = false): Unit = {
    import spark.implicits._
    val (dir, fs, endpointEnv) =
      if (s3a) {
        val srv = graft.sources.S3LiteServer.shared
        val hc = spark.sparkContext.hadoopConfiguration
        hc.set("fs.s3a.impl",
          classOf[graft.sources.S3LiteFileSystem].getName)
        hc.set(graft.sources.S3LiteFileSystem.EndpointKey, srv.endpoint)
        hc.setBoolean("fs.s3a.impl.disable.cache", true)
        val d = new Path("s3a://crashstorm/db/t.graft")
        (d, d.getFileSystem(hc),
          Map("GRAFT_STORM_ENDPOINT" -> srv.endpoint))
      } else {
        val d = new Path(Files.createTempDirectory("graft-crash")
          .resolve("db").resolve("t.graft").toUri)
        (d, d.getFileSystem(spark.sessionState.newHadoopConf()),
          Map.empty[String, String])
      }
    graft.connector.GraftWriter.write(fs, dir, Seq(-1L).toDF("k"),
      overwrite = true)
    val crashAt = 1 + rng.nextInt(4)
    val clue = s"point=$point s3a=$s3a crashAt=$crashAt seed=$seed: "
    val agent = StormHarness.launchAgent(Map(
      "GRAFT_STORM_DIR" -> dir.toUri.toString,
      "GRAFT_STORM_KEYS" -> "100:10",
      "GRAFT_STORM_SLEEP_MS" -> "10",
      "GRAFT_STORM_CRASH" -> point,
      "GRAFT_STORM_CRASH_AT" -> crashAt.toString) ++ endpointEnv)
    val (exit, out) = try StormHarness.await(agent, 240)
    finally { agent.proc.destroyForcibly(); () }
    assert(exit == 137, clue +
      s"agent must die by halt(137), got $exit\n$out")

    // 1. the table stays readable at exactly the pre-crash version:
    // the seed row + the crashAt appends that committed before death
    val expected = 1L + crashAt
    val versions = GraftFormat.listVersions(fs, dir)
    assert(versions == (1L to (1L + crashAt)), clue +
      s"version chain must be contiguous pre-crash history: $versions")
    assert(tableCount(fs, dir) == expected, clue + "pre-crash read")

    // the crash left the expected debris class behind
    point match {
      case "staged" =>
        assert(stagingDirs(fs, dir).nonEmpty, clue + "staging debris")
      case "adopted" =>
        assert(unreferencedData(fs, dir).exists(_.startsWith("data/")),
          clue + "adopted-but-uncommitted data debris")
      case "dv" =>
        assert(unreferencedData(fs, dir)
          .exists(_.startsWith("_deletions/")), clue + "orphan DV debris")
    }

    // 2. the next writer commits cleanly over the debris
    graft.connector.GraftWriter.write(fs, dir, Seq(999L).toDF("k"),
      overwrite = false)
    assert(tableCount(fs, dir) == expected + 1, clue + "post-crash write")

    // 3a. default grace: the debris is indistinguishable from an
    // in-flight two-phase write — a routine vacuum must NOT touch it
    graft.ops.Maintenance.vacuum(spark, dir, keepVersions = 100)
    point match {
      case "staged" => assert(stagingDirs(fs, dir).nonEmpty,
        clue + "default-grace vacuum must keep young staging debris")
      case _ => assert(unreferencedData(fs, dir).nonEmpty,
        clue + "default-grace vacuum must keep young orphans")
    }

    // 3b. grace 0: the dead process's debris is GC'd — and live data
    // is untouched (the uncommitted DV must never be applied)
    val (_, deleted) = graft.ops.Maintenance.vacuum(spark, dir,
      keepVersions = 100, orphanGraceMs = 0L)
    assert(deleted >= 1, clue + "grace-0 vacuum must GC the debris")
    assert(stagingDirs(fs, dir).isEmpty, clue + "staging debris GC'd")
    assert(unreferencedData(fs, dir).isEmpty, clue + "orphans GC'd")
    assert(tableCount(fs, dir) == expected + 1,
      clue + "vacuum must not change what readers see")
    fs.delete(dir.getParent, true)
  }

  test("kill -9 after staging, before adoptStaged: atomic, debris GC'd") {
    crashCase("staged")
  }

  test("kill -9 after adoptStaged, before the manifest CAS (the " +
      "beginInsert/finishInsert window): atomic, debris GC'd") {
    crashCase("adopted")
  }

  test("kill -9 after the deletion-vector write, before its commit: " +
      "the DV is never applied, then GC'd") {
    crashCase("dv")
  }

  test("kill -9 after adoptStaged over s3a (real HTTP to an object " +
      "store): atomic through virtual directories, debris GC'd") {
    // the distinct surface: staging 'dirs' are key prefixes, mtimes
    // come from objects not directory inodes (newestMtimeUnder), and
    // adoption is COPY+DELETE instead of rename — the same crash
    // window must hold
    crashCase("adopted", s3a = true)
  }
}
