package graft

import org.scalatest.funsuite.AnyFunSuite

/** In-gate ANN recall floors (r13 VERDICT #4; the artifact companion is
  * `graft.RecallBench` -> BENCH_RECALL.json, which certifies the same
  * floors at sf0.1 and 4×): recall@10 of the PRODUCTION rewrite path —
  * optimizer rule over a persisted index, adaptive nprobe + selectivity
  * scaling on — vs the exact top-k, for both index kinds and both the
  * unfiltered and the mild-filtered path. Pinned here so a recall
  * regression (a probe-selection bug, a broken scaling heuristic, a
  * stale-cache leak) fails `sbt test` rather than waiting for a bench
  * round. The sharp-filter arm degenerates to the exact scan by design
  * and is asserted as exactly that in AnnRewriteSpec. */
class RecallSpec extends AnyFunSuite {
  import TestSpark._

  private val Floor = 0.8

  test("committed BENCH_RECALL.json certifies the 16x decade above the " +
      "floor (r14 VERDICT #3: the base->4x downtrend, measured one " +
      "decade further, must not cross 0.8)") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_RECALL.json")), "UTF-8")
    val root = new graft.format.JsonParser(txt).parseValue()
      .asInstanceOf[Map[String, Any]]
    assert(root("floor").asInstanceOf[Double] == Floor,
      "artifact floor drifted from the spec-pinned floor")
    val rows = root("rows").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    val r16 = rows.filter(_("scale") == "16x")
    assert(r16.size == 6,
      s"BENCH_RECALL.json must carry the full 16x leg (2 kinds x 3 " +
        s"paths), found ${r16.size} rows — re-run graft.RecallBench")
    r16.foreach { r =>
      assert(r("recall").asInstanceOf[Double] >= Floor,
        s"16x recall below the floor: $r")
    }
    // r15 VERDICT #5: the default nprobe now scales with list occupancy;
    // the certified trajectory extends one more 4x step
    val r64 = rows.filter(_("scale") == "64x")
    assert(r64.size == 6,
      s"BENCH_RECALL.json must carry the full 64x leg (2 kinds x 3 " +
        s"paths), found ${r64.size} rows — re-run graft.RecallBench")
    r64.foreach { r =>
      assert(r("recall").asInstanceOf[Double] >= Floor,
        s"64x recall below the floor: $r")
    }
  }

  for (kind <- Seq("ivf", "ivfpq")) {
    test(s"$kind unfiltered probe recall@10 >= $Floor at the test SF") {
      val r = RecallBench.measure(spark, sf, kind, None, nQueries = 10)
      assert(r.probed == 10, s"probes must fire: $r")
      assert(r.recall >= Floor, s"$kind unfiltered recall ${r.recall}")
    }

    test(s"$kind mild-filtered (selectivity-scaled) recall@10 >= $Floor " +
        "at the test SF") {
      val r = RecallBench.measure(spark, sf, kind, Some(2), nQueries = 10)
      assert(r.probed == 10, s"probes must fire: $r")
      assert(r.recall >= Floor, s"$kind filtered recall ${r.recall}")
    }
  }
}
