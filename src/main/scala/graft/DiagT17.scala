package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic for the r19 scaling probe — NOT part of any
  * gate. Times t17's internal stages separately at an arbitrary SF. */
object DiagT17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stage-level accounting: task counts + max/sum task time per stage
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = e.taskInfo.duration
          stages.merge(e.stageId, (1, d, d),
            (a, b) => (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val s = stages.getOrDefault(e.stageInfo.stageId, (0, 0L, 0L))
          if (s._2 > 500)
            println(f"[stage] id=${e.stageInfo.stageId} tasks=${s._1} " +
              f"sumMs=${s._2} maxMs=${s._3} name=${e.stageInfo.name.take(60)}")
        }
      })
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val w = t("wordSets+count") {
      val w0 = graft.operators.TextOps.wordSetsOf(corpus)
      w0.write.format("noop").mode("overwrite").save(); w0
    }
    val pairs = graft.operators.TextOps.jaccardPairs(w)
      .filter(col("jaccard_raw") >= 0.8)
    t("pairs noop") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    val pairs2 = graft.operators.TextOps.jaccardPairs(w)
      .filter(col("jaccard_raw") >= 0.8)
    val keep = t("dedupClusters (eager)") {
      graft.operators.TextOps.dedupClusters(w.select("doc_id"), pairs2)
        .filter(col("doc_id") === col("cluster_rep")).select("doc_id")
    }
    t("final semi-join count") {
      println("rows=" + corpus.join(keep, Seq("doc_id"), "left_semi").count())
    }
    spark.stop()
  }
}
