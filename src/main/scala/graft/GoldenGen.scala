package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit

/** One-shot generator for the committed golden-oracle files under
  * `golden/` (run: `sbt "runMain graft.GoldenGen"`).
  *
  * The listed queries compute SimHash/MinHash signatures and pairs,
  * winnowing fingerprints, LSH ANN top-k, and stub multimodal features —
  * deterministic but not expressible in ANSI SQL, so the driver's DuckDB
  * gate could only row-count them. Instead we pin their expected output:
  * each golden parquet holds the query result at every shipped scale
  * factor, tagged with `sf_key` = count(lineitem) at that sf, and the
  * oracle SQL ([[graft.queries.Q.golden]]) selects the slice matching
  * the gate's sf. At an unknown sf the slice is empty while the Spark
  * side is not, so the gate fails loudly rather than passing vacuously.
  *
  * Eligibility: only queries whose output is bit-stable across
  * partitionings and thread counts. That includes the IVF/PQ queries
  * (v05/v06/v07): their k-means trains DRIVER-SIDE on an id-sorted
  * bounded sample with deterministic seeding (VectorIndex.Ivf.build),
  * so centroids/codebooks are sequential-math-deterministic, and the
  * probes are per-row FP with unique sort tiebreaks (verified
  * empirically: local[8]/8-part vs local[3]/5-part runs bit-identical
  * at sf0.001 and sf0.01).
  *
  * Regenerate ONLY on an intentional algorithm change — these files are
  * the regression pin for the non-SQL operators.
  */
object GoldenGen {
  val GoldenQueries: Seq[String] = Seq(
    "t03_minhash_lsh_pairs", "t04_simhash", "t05_simhash_pairs",
    "t10_fingerprint", "t21_perplexity", "t26_incremental_dedup",
    "m01_multimodal_features", "m04_bmp_decode",
    "m05_wav_decode", "m06_png_decode",
    "v02_ann_lsh", "v03_embedding_near_dup", "v05_ann_ivf",
    "v06_ann_rewrite", "v07_ann_ivfpq", "v08_ann_l2_rewrite",
    "v09_semantic_dedup", "v10_ann_filtered", "v11_ann_adaptive",
    "v12_coreset")

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args.headOption.getOrElse("golden"))
    val dataRoot = sys.env.getOrElse("GRAFT_TESTDATA_ROOT", "/root/testdata")
    // GRAFT_GOLDEN_ONLY=v09_semantic_dedup,... regenerates a subset —
    // also the cheap way to CHECK a golden is unchanged after a code
    // change (generate to a temp dir, diff values against golden/)
    val only = sys.env.get("GRAFT_GOLDEN_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = GoldenQueries.filter(q => only.forall(_.contains(q)))
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- selected) {
      val perSf = Seq("0.001", "0.01", "0.1").map { sf =>
        val d = s"$dataRoot/sf$sf"
        val key = spark.read.parquet(s"$d/lineitem.parquet").count()
        SparkEntry.queries(name)(spark, d).withColumn("sf_key", lit(key))
      }
      val tmp = Files.createTempDirectory(s"golden_$name").toString
      perSf.reduce(_.unionByName(_)).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val listing = Files.list(Paths.get(tmp))
      val part =
        try listing.toArray.map(_.toString).filter(_.endsWith(".parquet")).head
        finally listing.close()
      Files.move(Paths.get(part), outDir.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"golden: wrote ${outDir.resolve(s"$name.parquet")}")
    }
    spark.stop()
  }
}
