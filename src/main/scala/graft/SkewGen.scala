package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives an ADVERSARIALLY SKEWED benchmark corpus from a shipped
  * scale factor — the distributions the dedup guards exist for, which
  * uniform synthetic data never produces:
  *
  *  - a corpus-wide hot token appended to EVERY document (df = corpus
  *    size): without the `dfCap` guard the inverted-index self-join in
  *    t02 would generate C(corpus, 2) candidate pairs from that token
  *    alone (~10^8 at the probe's 17k docs, ~10^19 at 100 TB);
  *  - a 10 000-document sliding-window CHAIN (adjacent word-set jaccard
  *    ~0.91/0.83, three-apart 0.75): one giant near-dup component of
  *    diameter ~5 000 — linear label propagation would need ~5 000
  *    rounds, pointer jumping must close it in O(log d) ~ 13;
  *  - 2 000 documents sharing a 40-token prefix (distinct 40-token
  *    tails, pairwise jaccard ~0.33, below the cluster threshold):
  *    their minhash bands collide into mega-buckets that the 64-member
  *    bucket cap must bound (uncapped: ~200-member buckets in every
  *    band -> ~10^6 extra LSH candidates).
  *
  * All other tables are copied as-is so the bench harness (and its
  * warmup) runs unchanged. The output is a bench INPUT ONLY; the
  * correctness gates stay on driver-generated data.
  *
  * Usage: `sbt "runMain graft.SkewGen <srcSfDir> <outDir>"`, then
  * `tools/skew_probe.py` benches t01/t02/t03/t15 healthy-vs-skewed.
  */
object SkewGen {

  private val Tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (t <- Tables if t != "documents")
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)

    // base corpus with the hot token planted in every document
    val hot = docs.withColumn("text", concat(col("text"),
      lit(" thecorpuswidetoken")))

    // 10k-doc chain: doc i holds tokens w{i}..w{i+20} (+ hot token)
    val chain = spark.range(0, 10000).select(
      (col("id") + maxId + 1).as("doc_id"),
      concat_ws(" ",
        (0 to 20).map(k => concat(lit("w"), col("id") + k)) :+
          lit("thecorpuswidetoken"): _*).as("text"),
      lit("en").as("lang"),
      lit("chain").as("source"))
      .withColumn("n_chars", length(col("text")))

    // 2k shared-prefix docs: 40 common tokens + 40 unique tokens each
    val prefix = (0 until 40).map(k => s"s$k").mkString(" ")
    val bucketed = spark.range(0, 2000).select(
      (col("id") + maxId + 10001).as("doc_id"),
      concat(lit(prefix + " "),
        concat_ws(" ", (0 until 40).map(k =>
          concat(lit(s"u${k}x"), col("id"))): _*),
        lit(" thecorpuswidetoken")).as("text"),
      lit("en").as("lang"),
      lit("prefix").as("source"))
      .withColumn("n_chars", length(col("text")))

    hot.select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(chain).unionByName(bucketed)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val n = spark.read.parquet(s"$outDir/documents.parquet").count()
    println(s"skewgen: wrote $outDir (documents: $n rows)")
    spark.stop()
  }
}
