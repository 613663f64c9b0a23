package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.ops.MinhashStore

/** Bloom + bucket-partitioned persisted minhash index (r17 VERDICT
  * #2): the t26 daily probe must be O(delta) — a mostly-novel delta
  * reads (almost) none of the index — while returning EXACTLY what
  * the full-signature-scan path returns. */
class MinhashStoreSpec extends AnyFunSuite {
  import TestSpark._

  private def docsAt(d: String): DataFrame =
    spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))

  private def rows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-mhstore").toString + "/idx"

  test("indexed probe returns EXACTLY the full-scan path's rows " +
      "(the t26 gate shape: base = 3/4 corpus, delta = 1/4)") {
    val base = docsAt(sf).filter(expr("pmod(doc_id, 4) != 0"))
    val delta = docsAt(sf).filter(expr("pmod(doc_id, 4) = 0"))
    val root = tmpRoot()
    MinhashStore.build(TextOps.minhashIndex(base), root)
    val viaStore = rows(TextOps.incrementalNearDupsIndexed(delta, root))
    val viaScan = rows(TextOps.incrementalNearDups(delta,
      TextOps.minhashIndex(base)))
    assert(viaStore == viaScan,
      "indexed probe must be row-identical to the signature-scan path")
    assert(viaStore.nonEmpty, "gate-shape probe found no dups at sf0.001 " +
      "— the equality check would be vacuous")
  }

  test("mostly-novel delta: bloom kills the probes before any bucket " +
      "read — records read is a small fraction of the index") {
    // 16x-replicated corpus: big enough that the cost-based planner
    // picks the pruned path (at raw sf0.001 one partition's estimated
    // rows already exceed a full sig scan, so fallback would always
    // win — correctly, but then this test would prove nothing)
    val base = spark.range(16).crossJoin(docsAt(sf))
      .select((col("doc_id") + col("id") * 1000L).as("doc_id"), col("text"))
    val root = tmpRoot()
    MinhashStore.build(TextOps.minhashIndex(base), root)
    // novel text: reversed words + a per-doc salt — (almost) no
    // shingle overlap with the corpus
    val novel = docsAt(sf).limit(25)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", reverse(split(col("text"), " ")),
          col("doc_id").cast("string"), lit("zq9x")).as("text"))
    val out = rows(TextOps.incrementalNearDupsIndexed(novel, root))
    // within-delta pairs may exist (near-identical base docs stay
    // near-identical reversed) — but nothing may match the INDEX
    assert(out.forall(_._2 >= 1000000L),
      s"novel delta must have no index dups, got $out")
    val st = MinhashStore.lastProbeStats.get()
    assert(st != null && st.fullScanSegments == 0)
    // the bloom must kill (essentially) every novel probe: a handful
    // may legitimately survive (degenerate short docs reverse to
    // themselves) but ~800 probe keys must not flood through
    assert(st.survivors <= 8,
      s"bloom let ${st.survivors} of ${st.probeKeys} novel probes through")
    // the partitions those survivors prune to are a small fraction of
    // the segment — the O(delta) claim at structure level. (Absolute
    // records-read is only meaningful at bench scale where partition
    // granularity stops dominating: RefreshProbe measures it at sf0.1
    // and BENCH_REFRESH budget-gates the ratio.)
    assert(st.partsTouched <= math.max(4, st.partsTotal / 5),
      s"${st.partsTouched}/${st.partsTotal} bucket partitions touched")
  }

  test("dup-heavy delta falls back to a full segment scan and still " +
      "matches the full-scan path row for row") {
    val base = docsAt(sf)
    val root = tmpRoot()
    MinhashStore.build(TextOps.minhashIndex(base), root)
    // every delta doc is a verbatim copy of an indexed doc: every
    // probe key exists in the index, survivors flood the partitions
    val copies = base.select((col("doc_id") + 500000L).as("doc_id"),
      col("text"))
    val viaStore = rows(TextOps.incrementalNearDupsIndexed(copies, root))
    assert(MinhashStore.lastProbeStats.get().fullScanSegments == 1,
      "a full-copy delta must trigger the pruning fallback")
    val viaScan = rows(TextOps.incrementalNearDups(copies,
      TextOps.minhashIndex(base)))
    assert(viaStore == viaScan)
    assert(viaStore.size == copies.count(),
      "every verbatim copy must be flagged as a dup")
  }

  test("merge-on-read append: a second segment is probed exactly like " +
      "a rebuilt index, and sigsAll unions both") {
    val all = docsAt(sf)
    val base = all.filter(col("doc_id") % 3 === 0)
    val extra = all.filter(col("doc_id") % 3 === 1)
    val delta = all.filter(col("doc_id") % 3 === 2)
    val root = tmpRoot()
    MinhashStore.build(TextOps.minhashIndex(base), root)
    MinhashStore.append(TextOps.minhashIndex(extra), root)
    assert(MinhashStore.meta(spark, root).segments.size == 2)
    assert(MinhashStore.sigsAll(spark, root).count() ==
      base.count() + extra.count())
    val viaSegs = rows(TextOps.incrementalNearDupsIndexed(delta, root))
    val rebuilt = tmpRoot()
    MinhashStore.build(TextOps.minhashIndex(base.unionByName(extra)),
      rebuilt)
    val viaRebuild = rows(TextOps.incrementalNearDupsIndexed(delta, rebuilt))
    assert(viaSegs == viaRebuild,
      "segmented probe must equal the compacted rebuild's")
    // the scan path over the unioned signatures agrees too
    val viaScan = rows(TextOps.incrementalNearDups(delta,
      TextOps.minhashIndex(base.unionByName(extra))))
    assert(viaSegs == viaScan)
  }

  test("indexed round: dups/survivors/updatedIndex match the scan " +
      "round; survivors fold forward as a new segment") {
    val base = docsAt(sf).filter(expr("pmod(doc_id, 4) != 0"))
    val delta = docsAt(sf).filter(expr("pmod(doc_id, 4) = 0"))
    val root = tmpRoot()
    MinhashStore.build(TextOps.minhashIndex(base), root)
    val idx = TextOps.minhashIndex(base)
    val scanRound = TextOps.incrementalDedupRound(delta, idx)
    val storeRound = TextOps.incrementalDedupRoundIndexed(delta, root)
    assert(rows(storeRound.dups) == rows(scanRound.dups))
    assert(storeRound.survivors.orderBy("doc_id").collect().map(_.getLong(0))
      .toSeq == scanRound.survivors.orderBy("doc_id").collect()
      .map(_.getLong(0)).toSeq)
    assert(storeRound.updatedIndex.count() == scanRound.updatedIndex.count())
    // fold forward: tomorrow's index = today's + survivors, one new seg
    MinhashStore.append(
      TextOps.minhashIndex(storeRound.survivors), root)
    assert(MinhashStore.meta(spark, root).segments.size == 2)
    assert(MinhashStore.sigsAll(spark, root).count() ==
      scanRound.updatedIndex.count())
  }
}
