package graft

import org.apache.spark.sql.SparkSession

/** Adjudication probe for r15 VERDICT #2 (plan_packed_ms 1684 vs
  * plan_full_ms 982 at 10⁵ fragments): interleaved repeats of the two
  * plan shapes separate algorithmic cost from single-shot noise.
  *
  * Measured on the r16 box (4 interleaved rounds at 10⁵ fragments):
  * full 1747/996/1435/1115 ms vs packed 1389/1140/1011/994 ms — the
  * bin-pack pass is NOT a regression; steady-state packed planning is
  * at or below full planning (both are dominated by building 10⁵
  * fragment split units + Catalyst wrap, and packing then REDUCES the
  * InputPartition array it hands Spark 12×). The r15 artifact's
  * inversion was single-shot measurement order (packed ran last, cold
  * JIT + accumulated GC pressure); BENCH_META.json now reports the
  * median of interleaved repeats for the plan_* metrics. */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val fragments = 100000
    val (dir, fs, m2) = MetaBench.syntheticTable(spark, sfDir, fragments)
    graft.format.GraftFormat.commit(fs, dir, m2)
    val loaded = graft.format.GraftFormat.readManifest(fs, dir, m2.version)
    def tableDF = org.apache.spark.sql.GraftShim.tableDF(spark,
      new graft.connector.GraftTable(s"packprobe:$dir", dir, loaded,
        fs.getConf))
    def time(tag: String)(body: => Int): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e6}%.1f ms, $n parts")
    }
    (1 to 4).foreach { i =>
      time(s"full-$i")(tableDF.rdd.getNumPartitions)
      time(s"packed-$i") {
        spark.conf.set(graft.connector.GraftScan.MaxPartitionsConf, "8192")
        try tableDF.rdd.getNumPartitions
        finally spark.conf.unset(graft.connector.GraftScan.MaxPartitionsConf)
      }
    }
    fs.delete(dir.getParent, true)
    spark.stop()
  }
}
