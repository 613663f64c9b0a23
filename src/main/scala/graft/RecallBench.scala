package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** ANN recall certification (r13 VERDICT #4): recall was measured once,
  * at one scale, on the unfiltered path — nothing certified the
  * filtered/adaptive path (whose guard guarantees ≥k ROWS, not WHICH
  * rows) or recall under data growth. This main measures recall@k of
  * the PRODUCTION path — the AnnTopKIndexRewrite optimizer rule over a
  * persisted IVF or IVF_PQ index, adaptive nprobe on — against the
  * exact (rule-off) top-k, for {IVF, IVF_PQ} × {unfiltered, filtered}
  * × {base SF, 4× (ScaleGen, jittered replicas)}. Writes
  * BENCH_RECALL.json with a pass/fail floor; RecallSpec pins the same
  * floor in-gate at the test scale factor.
  */
object RecallBench {

  final case class Result(recall: Double, probed: Int, fellBack: Int,
      escalated: Long, countJobs: Long)

  /** Recall@k of the rewrite-probed top-k vs the exact top-k, averaged
    * over the `nQueries` lowest vec_ids. `fellBack` counts queries the
    * adaptive guard legitimately sent to the exact scan (recall 1 by
    * construction — reported so the probe rate is honest). */
  def measure(spark: SparkSession, sfDir: String, kind: String,
      filterMod: Option[Int], k: Int = 10, nQueries: Int = 20,
      nLists: Int = 16): Result = {
    require(Set("ivf", "ivfpq").contains(kind), kind)
    val dir = new Path(java.nio.file.Files
      .createTempDirectory(s"graft-recall-$kind").resolve("e.graft").toUri)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    graft.connector.GraftWriter.write(fs, dir, emb, overwrite = true)
    if (kind == "ivf")
      graft.ops.VectorIndex.Ivf.build(spark, dir, "vec_id", "embedding",
        nLists = nLists)
    else
      graft.ops.VectorIndex.Pq.build(spark, dir, "vec_id", "embedding",
        nLists = nLists)

    def tableDF: DataFrame = {
      val m = graft.format.GraftFormat.readLatest(fs, dir).get
      org.apache.spark.sql.GraftShim.tableDF(spark,
        new graft.connector.GraftTable(s"recall:$dir", dir, m, fs.getConf))
    }
    val queries = emb.orderBy("vec_id").limit(nQueries).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))

    def topK(qv: Seq[Float]): DataFrame = {
      val base = filterMod.map(m => tableDF.where(col("vec_id") % m === 0))
        .getOrElse(tableDF)
      base.orderBy(graft.functions.VectorFunctions.cosine_sim(
          col("embedding"), typedlit(qv)).desc)
        .limit(k).select("vec_id")
    }
    def semiJoins(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftSemi => j
      }.size

    val rule = graft.plans.AnnTopKIndexRewrite(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    val m = graft.plans.AnnTopKIndexRewrite.metrics
    val (esc0, jobs0) = (m.escalations.get(), m.countJobs.get())
    try {
      var recallSum = 0.0
      var probed = 0
      var fellBack = 0
      queries.foreach { case (_, qv) =>
        spark.conf.set("spark.graft.ann.indexRewrite", "false")
        val exact = topK(qv).collect().map(_.getLong(0)).toSet
        spark.conf.set("spark.graft.ann.indexRewrite", "true")
        val q = topK(qv)
        if (semiJoins(q) == 1) probed += 1 else fellBack += 1
        val ann = q.collect().map(_.getLong(0)).toSet
        recallSum += (exact intersect ann).size.toDouble / exact.size
      }
      Result(recallSum / queries.length, probed, fellBack,
        m.escalations.get() - esc0, m.countJobs.get() - jobs0)
    } finally {
      spark.conf.unset("spark.graft.ann.indexRewrite")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
      fs.delete(dir.getParent, true)
    }
  }

  /** Drift leg (r17 VERDICT #3): build over the base embeddings, append
    * a deliberately SHIFTED 4× volume (each replica offset +10 along a
    * different dimension — four new clusters the frozen centroids never
    * saw), refresh, and measure the production rewrite path's recall
    * over queries drawn from BOTH regions. With the drift guard live
    * the refresh escalates to a retrain and the row must hold the
    * floor; `frozen = true` re-runs with the guard disabled
    * (maxRatio=0) as the informational control. Returns (result,
    * retrained). */
  def measureDrift(spark: SparkSession, sfDir: String, kind: String,
      frozen: Boolean, k: Int = 10, nLists: Int = 16): (Result, Boolean) = {
    require(Set("ivf", "ivfpq").contains(kind), kind)
    val dir = new Path(java.nio.file.Files
      .createTempDirectory(s"graft-drift-$kind").resolve("e.graft").toUri)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    graft.connector.GraftWriter.write(fs, dir, emb, overwrite = true)
    def buildOrRefresh(refresh: Boolean): Unit =
      (kind, refresh) match {
        case ("ivf", false) => graft.ops.VectorIndex.Ivf
          .build(spark, dir, "vec_id", "embedding", nLists = nLists)
        case ("ivf", true) => graft.ops.VectorIndex.Ivf
          .refresh(spark, dir, "vec_id", "embedding", nLists = nLists)
        case (_, false) => graft.ops.VectorIndex.Pq
          .build(spark, dir, "vec_id", "embedding", nLists = nLists)
        case (_, true) => graft.ops.VectorIndex.Pq
          .refresh(spark, dir, "vec_id", "embedding", nLists = nLists)
      }
    buildOrRefresh(refresh = false)
    // 4× shifted append: replica r moves +10 along dimension r
    val shifted = (0 until 4).map { r =>
      emb.select((col("vec_id") + (r + 1) * 10000000L).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> x + IF(i = $r, 10.0F, 0.0F))")
          .as("embedding"))
    }.reduce(_ unionByName _)
    graft.connector.GraftWriter.write(fs, dir, shifted, overwrite = false)
    if (frozen)
      spark.conf.set(graft.ops.VectorIndex.DriftMaxRatioKey, "0")
    try buildOrRefresh(refresh = true)
    finally if (frozen)
      spark.conf.unset(graft.ops.VectorIndex.DriftMaxRatioKey)
    val retrained = Option(graft.ops.VectorIndex.lastDriftDecision.get())
      .exists(_.escalated)

    def tableDF: DataFrame = {
      val m = graft.format.GraftFormat.readLatest(fs, dir).get
      org.apache.spark.sql.GraftShim.tableDF(spark,
        new graft.connector.GraftTable(s"drift:$dir", dir, m, fs.getConf))
    }
    // queries from both regions: 10 base + 10 shifted (replica 1)
    val queries =
      emb.orderBy("vec_id").limit(10).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)) ++
      shifted.filter(col("vec_id") >= 10000000L)
        .orderBy("vec_id").limit(10).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1))
    def topK(qv: Seq[Float]): DataFrame =
      tableDF.orderBy(graft.functions.VectorFunctions.cosine_sim(
          col("embedding"), typedlit(qv)).desc)
        .limit(k).select("vec_id")
    def semiJoins(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftSemi => j
      }.size
    val rule = graft.plans.AnnTopKIndexRewrite(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      var recallSum = 0.0
      var probed = 0
      var fellBack = 0
      queries.foreach { case (_, qv) =>
        spark.conf.set("spark.graft.ann.indexRewrite", "false")
        val exact = topK(qv).collect().map(_.getLong(0)).toSet
        spark.conf.set("spark.graft.ann.indexRewrite", "true")
        val q = topK(qv)
        if (semiJoins(q) == 1) probed += 1 else fellBack += 1
        val ann = q.collect().map(_.getLong(0)).toSet
        recallSum += (exact intersect ann).size.toDouble / exact.size
      }
      (Result(recallSum / queries.length, probed, fellBack, 0L, 0L),
        retrained)
    } finally {
      spark.conf.unset("spark.graft.ann.indexRewrite")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
      fs.delete(dir.getParent, true)
    }
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir4 = sys.env.getOrElse("GRAFT_RECALL_4X_DIR",
      "/tmp/graft_recall/sf4x")
    // _SUCCESS gate: a directory left by an interrupted ScaleGen must
    // not silently certify recall against a truncated "4x" corpus.
    // Generation runs BEFORE this main's session exists — ScaleGen.main
    // stops whatever session it used, and stopping a shared one strands
    // every later measure() on a dead SparkContext (r14 review,
    // reproduced on a cold /tmp).
    if (!new java.io.File(s"$dir4/embeddings.parquet/_SUCCESS").exists())
      ScaleGen.main(Array(src, dir4, "4"))
    // 16x leg (r14 VERDICT #3): unfiltered recall fell 0.91 -> 0.83 from
    // base -> 4x; one more decade on that trajectory plausibly breaches
    // the 0.8 floor, so the trajectory is MEASURED one decade further
    // instead of extrapolated. GRAFT_RECALL_16X=false skips (quick runs).
    val dir16 = sys.env.getOrElse("GRAFT_RECALL_16X_DIR",
      "/tmp/graft_recall/sf16x")
    val want16 = sys.env.getOrElse("GRAFT_RECALL_16X", "true") != "false"
    if (want16 &&
        !new java.io.File(s"$dir16/embeddings.parquet/_SUCCESS").exists())
      ScaleGen.main(Array(src, dir16, "16"))
    // 64x leg (r15 VERDICT #5): the default nprobe is now keyed to list
    // occupancy, so the trajectory is certified one more 4x step out —
    // at 64x the occupancy-scaled default probes 7/16 lists where the
    // old fixed default's recall was drifting toward the floor.
    val dir64 = sys.env.getOrElse("GRAFT_RECALL_64X_DIR",
      "/tmp/graft_recall/sf64x")
    val want64 = sys.env.getOrElse("GRAFT_RECALL_64X", "true") != "false"
    if (want64 &&
        !new java.io.File(s"$dir64/embeddings.parquet/_SUCCESS").exists())
      // embeddings only: the recall probe reads nothing else, and the
      // documents letter rotation (the reason ScaleGen caps full
      // generation at 26x) is not involved
      ScaleGen.main(Array(src, dir64, "64", "embeddings"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val floor = 0.8
    // filtered paths: a mild 1/2 predicate exercises the selectivity-
    // scaled PROBE (the certified recall path); a sharp 1/5 predicate
    // scales past every list and degenerates to the exact scan (recall
    // 1 by construction — reported so the fallback arm stays visible)
    val paths = Seq(
      ("unfiltered", Option.empty[Int]),
      ("filtered_mild", Some(2)),
      ("filtered_sharp", Some(5)))
    val rows = for {
      (scale, d) <- Seq("base" -> src, "4x" -> dir4) ++
        (if (want16) Seq("16x" -> dir16) else Nil) ++
        (if (want64) Seq("64x" -> dir64) else Nil)
      kind <- Seq("ivf", "ivfpq")
      (path, mod) <- paths
    } yield {
      val r = measure(spark, d, kind, mod)
      println(f"recall $scale/$kind/$path = ${r.recall}%.3f " +
        s"(probed ${r.probed}, fellBack ${r.fellBack})")
      (scale, kind, path, r)
    }
    // drift rows (r17 VERDICT #3): a shifted 4× append must keep
    // recall at the floor VIA the escalation (retrained=true, gated);
    // the frozen-guard control runs beside it, informational only
    val driftRows = for {
      kind <- Seq("ivf", "ivfpq")
      frozen <- Seq(false, true)
    } yield {
      val (r, retrained) = measureDrift(spark, src, kind, frozen)
      val path = if (frozen) "drift_shifted_4x_frozen_control"
        else "drift_shifted_4x"
      println(f"recall drift/$kind/$path = ${r.recall}%.3f " +
        s"(retrained $retrained, probed ${r.probed}, fellBack ${r.fellBack})")
      (kind, path, r, retrained, !frozen)
    }
    val driftPass = driftRows.filter(_._5)
      .forall(d => d._3.recall >= floor && d._4)
    val pass = rows.forall(_._4.recall >= floor) && driftPass
    val rowsJson = (rows.map { case (scale, kind, path, r) =>
      s"""{"scale":"$scale","kind":"$kind","path":"$path",""" +
        s""""recall":${math.round(r.recall * 1000) / 1000.0},""" +
        s""""probed":${r.probed},"fell_back":${r.fellBack},""" +
        s""""escalations":${r.escalated},"count_jobs":${r.countJobs}}"""
    } ++ driftRows.map { case (kind, path, r, retrained, _) =>
      s"""{"scale":"drift","kind":"$kind","path":"$path",""" +
        s""""recall":${math.round(r.recall * 1000) / 1000.0},""" +
        s""""probed":${r.probed},"fell_back":${r.fellBack},""" +
        s""""retrained":$retrained}"""
    }).mkString("[", ",", "]")
    val line = s"""{"metric":"ann_recall","k":10,"queries":20,""" +
      s""""floor":$floor,"pass":$pass,"rows":$rowsJson}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_RECALL.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
