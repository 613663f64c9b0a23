package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-capture harness for the optimization rounds: writes
  * `.explain("formatted")` for each named gate query to
  * `<outDir>/<name>_<tag>.txt` so plan-shape claims in
  * OPTIMIZATION_rNN.md are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> [q1,q2,...]
  * (no query list = all declared queries). Queries run with the same
  * session shape as [[Bench]] so the captured plan is the benched one.
  * Queries with eager side effects (index/table builds) execute them;
  * the captured plan is the final returned DataFrame's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(',').map(_.trim).toSet)
      else None
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
    Files.createDirectories(Paths.get(outDir))
    // exact-name match (r18 ADVICE: startsWith let 't2' silently
    // re-capture — and overwrite — t21/t24/t26's plan files)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      names.forall(_.contains(n)) }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), txt)
        println(s"[plandump] wrote $name ($tag)")
      } catch { case t: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
