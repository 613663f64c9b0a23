package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Balanced-corpus linearity probe for semanticDedup's composed skew
  * guard (r14 VERDICT #1): every cluster sits at its fair share N/k with
  * fair share ≫ absCap — the regime the occupancy-only threshold never
  * split (balanced clusters are by definition under 4× fair share), so
  * pre-r15 pair work grew Θ(N²/k). With the absolute cap composed in
  * (threshold = min(absCap, 4 × fair share)), plus size-widened LSH
  * planes and forced id-hash chunking, every self-joined group is
  * bounded and total pair work is ≤ N × absCap — wall must grow
  * LINEARLY with N.
  *
  * Setup: k = 16 (emulating the capped-kEff regime that makes fair
  * share grow with the corpus — auto-k caps at 1024, where fair share
  * exceeds the default 4096 cap only past N ≈ 4·10⁶, too heavy for a
  * per-round probe), absCap scaled to 512 via [[VectorOps.AbsCapKey]]
  * so fairShare/absCap spans 8×–132× across the probed sizes while the
  * corpus stays tractable. Embeddings are a pure per-row function of
  * vec_id (splitmix64 → uniform [-1,1)⁶⁴), so generation is
  * deterministic under any partitioning and k-means cells on the
  * isotropic cube stay balanced.
  *
  * Emits one JSON line (BALANCED_PROBE prefix); tools/balanced_probe.py
  * merges it into BENCH_SCALE.json's "balanced" section.
  */
object BalancedSemBench {

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform [-1, 1) from the row id and dimension — partitioning-free. */
  private def cell(id: Long, dim: Int): Float = {
    val h = splitmix64(id * 64L + dim)
    ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val baseN = sys.env.getOrElse("GRAFT_BAL_BASE_N", "67584").toLong
    val factors = sys.env.getOrElse("GRAFT_BAL_FACTORS", "1,4,16")
      .split(",").map(_.trim.toInt).toSeq.sorted
    val k = 16
    val absCap = 512
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-balanced-sem-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(VectorOps.AbsCapKey, absCap.toString)
    import spark.implicits._

    def corpusDir(n: Long) = s"/tmp/graft_balanced/n$n"
    def ensureCorpus(n: Long): Unit = {
      val dir = corpusDir(n)
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS")))
        return
      spark.range(n)
        .map(id => (id, Array.tabulate(64)(d => cell(id, d))))
        .toDF("vec_id", "embedding")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(dir)
    }

    val walls = scala.collection.mutable.LinkedHashMap.empty[Int, Double]
    val ns = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
    for (f <- factors) {
      val n = baseN * f
      ensureCorpus(n)
      val e = spark.read.parquet(corpusDir(n))
      // median-of-3 at probe-cheap sizes, single pass at the largest
      // (its wall dominates the probe; noted in the artifact's method)
      val reps = if (f >= 16) 1 else 3
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val survivors = VectorOps.semanticDedup(e, k = k, tau = 0.9)
          .filter(col("vec_id") === col("rep")).count()
        require(survivors > 0L)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      walls(f) = math.round(times(times.size / 2) * 10000).toDouble / 10000
      ns(f) = n
      println(s"balanced probe: factor $f (n=$n) wall=${walls(f)}s")
    }
    val base = walls(factors.head)
    val ratios = factors.tail.map { f =>
      f -> math.round(walls(f) / math.max(base, 0.2) * 100).toDouble / 100
    }
    val allLinear = ratios.forall { case (f, r) => r <= f * 1.5 }
    def jmap[V](m: Seq[(Int, V)]): String =
      m.map { case (k2, v) => s""""$k2":$v""" }.mkString("{", ",", "}")
    val line = s"""BALANCED_PROBE {"metric":"balanced_sem_probe",""" +
      s""""base_n":$baseN,"k":$k,"abs_cap":$absCap,""" +
      s""""fair_share_over_cap":${jmap(factors.map(f =>
        f -> (baseN * f / k / absCap)))},""" +
      s""""wall_sec":${jmap(walls.toSeq)},""" +
      s""""ratio":${jmap(ratios)},""" +
      s""""bound":"factor x 1.5","all_linear":$allLinear}"""
    println(line)
    spark.stop()
  }
}
