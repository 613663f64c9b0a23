package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.format.{GraftFormat, ZoneMaps}
import graft.format.GraftFormat.ColStats

/** Metadata-scale guard (r13 VERDICT #1, the in-gate companion of
  * `graft.MetaBench` / BENCH_META.json): a 100 TB table is ~10⁵
  * fragments of zone-mapped metadata in ONE manifest; this spec pins
  * the planning path's metadata costs at 10⁴ fragments with generous
  * (~5×) headroom over measured walls so a regression in manifest
  * encoding, parsing, or fragment pruning fails `sbt test` instead of
  * waiting for the next bench round. Byte budgets are exact-ish
  * (encoding is deterministic); time budgets are loose by design. */
class MetaScaleSpec extends AnyFunSuite {
  import TestSpark._

  private val Fragments = 10000

  private lazy val built: (Path, org.apache.hadoop.fs.FileSystem,
      GraftFormat.Manifest, Long) = {
    // the SAME synthetic-manifest builder the bench artifact uses, so
    // this guard measures exactly the shape BENCH_META.json certifies
    val (dir, fs, m2) =
      MetaBench.syntheticTable(spark, sf, Fragments, seedRows = 2000)
    GraftFormat.commit(fs, dir, m2)
    val len = fs.getFileStatus(GraftFormat.manifestPath(dir, m2.version)).getLen
    (dir, fs, m2, len)
  }

  test(s"manifest bytes at $Fragments fragments stay bounded " +
      "(gzip encoding + truncated zone maps)") {
    val (_, _, _, len) = built
    // measured 0.26 MB; plain JSON was 7.2 MB. 1 MB of headroom still
    // catches an encoding regression (plain JSON would be 7×over)
    assert(len < (1L << 20),
      s"manifest is ${len / 1024} KB at $Fragments fragments — " +
        "metadata no longer fits the 100 TB budget (100 MB at 10⁵)")
  }

  test(s"cold manifest load at $Fragments fragments stays fast") {
    val (dir, fs, m2, _) = built
    val t0 = System.nanoTime()
    val loaded = GraftFormat.readManifest(fs, dir, m2.version)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(loaded.fragments.size == Fragments)
    assert(ms < 2000, f"cold load took $ms%.0f ms (measured ~240 ms; " +
      "2 s here implies ~20 s at 10⁵ fragments)")
  }

  test(s"zone-map prune walks $Fragments fragments fast and exactly") {
    val (dir, fs, m2, _) = built
    val loaded = GraftFormat.readManifest(fs, dir, m2.version)
    val keyMax = m2.fragments.head.stats("l_orderkey").max.get.toLong
    val pred = org.apache.spark.sql.sources.LessThanOrEqual(
      "l_orderkey", keyMax)
    val schema = loaded.schema
    val t0 = System.nanoTime()
    val kept = loaded.fragments.count(f => ZoneMaps.mayMatch(pred, schema, f))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(kept == 1, s"prune kept $kept, expected 1")
    assert(ms < 500, f"prune walk took $ms%.0f ms over $Fragments fragments")
  }

  test(s"full-scan task count tracks spark.graft.scan.maxPartitions " +
      "(r14 VERDICT #4): the effective split widens with table bytes") {
    val (dir, fs, m2, _) = built
    val loaded = GraftFormat.readManifest(fs, dir, m2.version)
    def tableDF = org.apache.spark.sql.GraftShim.tableDF(spark,
      new graft.connector.GraftTable(s"metacap:$dir", dir, loaded,
        fs.getConf))
    // 10⁴ synthetic 1-GiB fragments: a fixed 128 MB split would plan
    // ~8×10⁴ tasks; cap 512 widens the split to ~19.5 GiB so whole
    // fragments bin-pack ~19 per task. Packing is re-enabled locally —
    // TestSpark pins it off for the specs that count partitions 1:1.
    spark.conf.set(graft.connector.GraftScan.MaxPartitionsConf, "512")
    spark.conf.set(graft.connector.GraftScan.PackSmallFragmentsConf, "true")
    val parts =
      try tableDF.rdd.getNumPartitions
      finally {
        spark.conf.unset(graft.connector.GraftScan.MaxPartitionsConf)
        spark.conf.set(graft.connector.GraftScan.PackSmallFragmentsConf, "false")
      }
    // fragment alignment can overshoot the cap slightly, never 2x
    assert(parts > 1 && parts <= 1024,
      s"capped full scan planned $parts partitions (cap 512)")
  }

  test(s"steady-state churn at $Fragments fragments stays O(delta) " +
      "amortized across the checkpoint cadence") {
    val (dir, fs, m2, _) = built
    var cur = GraftFormat.readManifest(fs, dir, m2.version)
    val churnN = 20 // rides through at least one checkpoint rollover
    val perCommitNs = new Array[Long](churnN)
    (0 until churnN).foreach { i =>
      val base = cur
      cur = cur.copy(version = cur.version + 1,
        fragments = cur.fragments :+ cur.fragments.head.copy(
          id = cur.maxFragmentId + 1, path = s"data/churn-$i.parquet",
          deletionPath = None, deletedCount = 0L),
        maxFragmentId = cur.maxFragmentId + 1,
        createdAtMs = System.currentTimeMillis(), operation = "Append")
      val t0 = System.nanoTime()
      GraftFormat.commit(fs, dir, cur, base = Some(base))
      perCommitNs(i) = System.nanoTime() - t0
    }
    val amortizedMs = perCommitNs.sum / churnN / 1e6
    // measured ~18 ms at 10⁴ (median delta 3 ms + one ~300 ms
    // checkpoint / cadence); 500 ms of headroom catches a computeDelta
    // regression to O(fragments²) on any plausible machine
    assert(amortizedMs < 500,
      f"churn commit amortized $amortizedMs%.0f ms at $Fragments " +
        "fragments — the O(delta) commit path regressed")
    // the TIME bound alone cannot catch a silently lost delta path
    // (full rewrites at 10⁴ cost ~300 ms < 500): assert the stored
    // RECORDS — a 20-commit churn from a checkpointed base must write
    // mostly deltas (exactly one cadence-16 rollover from depth 0)
    val deltaRecords = (cur.version - churnN + 1 to cur.version)
      .count(v => !GraftFormat.isCheckpoint(fs, dir, v))
    assert(deltaRecords >= churnN - 2,
      s"only $deltaRecords of $churnN churn commits stored deltas — " +
        "the O(delta) path silently fell back to full manifests")
    val head = GraftFormat.readManifest(fs, dir, cur.version)
    assert(head.fragments.size == Fragments + churnN,
      "churned head must resolve exactly")
  }

  test(s"cold head resolution at FULL chain depth stays within the " +
      "cold-load budget (r15 VERDICT #1: the depth-15 walk was " +
      "unasserted and at the 2 s edge at 10⁵; hops now prefetch " +
      "concurrently)") {
    val (dir, fs, _, _) = built
    var cur = GraftFormat.readLatest(fs, dir).get
    def append(tag: String): Unit = {
      val base = cur
      cur = cur.copy(version = cur.version + 1,
        fragments = cur.fragments :+ cur.fragments.head.copy(
          id = cur.maxFragmentId + 1, path = s"data/$tag.parquet",
          deletionPath = None, deletedCount = 0L),
        maxFragmentId = cur.maxFragmentId + 1,
        createdAtMs = System.currentTimeMillis(), operation = "Append")
      GraftFormat.commit(fs, dir, cur, base = Some(base))
    }
    // roll to a fresh checkpoint, then stack cadence-1 deltas on it —
    // the deepest chain the default cadence (16) can produce
    var guard = 0
    def atCheckpoint: Boolean = {
      // rollover checkpoints materialize OUT-OF-BAND (r16 VERDICT #1):
      // quiesce before sniffing the record kind
      assert(GraftFormat.awaitMaterializations(), "materialization stalled")
      GraftFormat.isCheckpoint(fs, dir, cur.version)
    }
    while (!atCheckpoint && guard < 20) {
      append(s"depth-roll-$guard"); guard += 1
    }
    assert(GraftFormat.isCheckpoint(fs, dir, cur.version),
      "never reached a checkpoint within a full cadence of appends")
    (1 until 16).foreach(i => append(s"depth-chain-$i"))
    assert(!GraftFormat.isCheckpoint(fs, dir, cur.version),
      "head must sit at full chain depth for this test")
    // cold: nothing cached, the walk pays checkpoint + 15 delta reads
    graft.format.ManifestCache.clearAll()
    val t0 = System.nanoTime()
    val resolved = GraftFormat.readManifest(fs, dir, cur.version)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(resolved.fragments.size == cur.fragments.size,
      "full-depth resolve lost fragments")
    assert(ms < 2000, f"cold full-depth resolve took $ms%.0f ms at " +
      s"$Fragments fragments — the chain walk budget regressed")
  }

  test("steady CDC sync reads O(delta) version-record bytes per synced " +
      "version, including across a cadence rollover (r15 VERDICT #6)") {
    val (dir, fs, _, _) = built
    var cur = GraftFormat.readLatest(fs, dir).get
    // reader warm start: resolve the current head once (its own pins)
    GraftFormat.readManifest(fs, dir, cur.version)
    val syncs = 20 // crosses at least one checkpoint boundary
    var readerBytes = 0L
    var rollovers = 0
    (0 until syncs).foreach { i =>
      val base = cur
      cur = cur.copy(version = cur.version + 1,
        fragments = cur.fragments :+ cur.fragments.head.copy(
          id = cur.maxFragmentId + 1, path = s"data/cdc-spec-$i.parquet",
          deletionPath = None, deletedCount = 0L),
        maxFragmentId = cur.maxFragmentId + 1,
        createdAtMs = System.currentTimeMillis(), operation = "Append")
      GraftFormat.commit(fs, dir, cur, base = Some(base))
      // quiesce the out-of-band checkpoint swap so the rollover counter
      // (and the sidecar-prediction path the sync then exercises) is
      // deterministic
      assert(GraftFormat.awaitMaterializations(), "materialization stalled")
      if (GraftFormat.isCheckpoint(fs, dir, cur.version)) rollovers += 1
      // drop the committer's own pin of the new head: the reader must
      // pay what a SEPARATE process pays (its prior pins + depth hints)
      graft.format.ManifestCache.unpin(fs, dir, cur.version)
      val b0 = GraftFormat.versionBytesRead.get()
      val head = GraftFormat.readManifest(fs, dir, cur.version)
      val excluded = GraftFormat.excludedAsOf(fs, dir, cur.version - 1,
        head, knownVersions = Seq(cur.version - 1))
      readerBytes += GraftFormat.versionBytesRead.get() - b0
      assert((head.fragments.map(_.id).toSet -- excluded).size == 1,
        "each sync must surface exactly the one new fragment")
    }
    assert(rollovers >= 1,
      "the sync window never crossed a checkpoint boundary — the test " +
        "no longer exercises the sidecar path")
    val perSync = readerBytes / syncs
    // a single full checkpoint read at 10⁴ fragments is ~260 KB; a
    // delta/sidecar record is ~600 B — 16 KB of headroom per sync
    // proves NO sync (including the rollover) read O(table) metadata
    assert(perSync < 16384,
      s"CDC reader paid $perSync B/sync — a checkpoint-boundary sync " +
        "is reading O(table) metadata instead of the O(delta) sidecar")
  }

  test(s"filter-to-planned-partitions at $Fragments fragments: pruned " +
      "plan is O(match), not O(fragments) tasks") {
    val (dir, fs, m2, _) = built
    val loaded = GraftFormat.readManifest(fs, dir, m2.version)
    val keyMax = m2.fragments.head.stats("l_orderkey").max.get.toLong
    def tableDF = org.apache.spark.sql.GraftShim.tableDF(spark,
      new graft.connector.GraftTable(s"metascale:$dir", dir, loaded,
        fs.getConf))
    val t0 = System.nanoTime()
    val parts = tableDF.where(col("l_orderkey") <= keyMax)
      .rdd.getNumPartitions
    val ms = (System.nanoTime() - t0) / 1e6
    assert(parts == 1, s"zone prune must plan 1 partition, got $parts")
    assert(ms < 3000, f"plan took $ms%.0f ms")
    // and the pruned query actually answers from the one real fragment
    val rows = tableDF.where(col("l_orderkey") <= keyMax)
      .select("l_orderkey").collect()
    assert(rows.nonEmpty)
  }
}
