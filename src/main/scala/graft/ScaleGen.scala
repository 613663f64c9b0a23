package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a larger benchmark dataset from the largest shipped scale
  * factor for the BENCH_SCALE probe: `factor` key-shifted replicas of
  * every table, so row counts and join work grow linearly while join
  * selectivity per replica is EXACTLY the original's (each replica's
  * keys live in a disjoint band; cross-replica joins match nothing).
  *
  * Two columns need more than a key shift to keep scaling honest:
  *  - `documents.text` gets a per-replica letter rotation — otherwise
  *    every doc has factor-1 exact twins and the near-dup operators'
  *    candidate work (sum over tokens of df^2) grows QUADRATICALLY in
  *    the factor instead of linearly, which would make the probe
  *    measure an artifact of naive replication, not engine scaling.
  *  - `embeddings.embedding` gets deterministic per-replica jitter for
  *    the same reason (identical vectors collapse into the same LSH
  *    buckets and blow up pair generation).
  *
  * Usage: `sbt "runMain graft.ScaleGen <srcDir> <outDir> <factor>
  * [tables]"` — the optional comma-separated table subset lets probes
  * that need one table at an extreme factor (the 64× ANN recall leg
  * reads only `embeddings`) skip the rest. CAVEAT: key-shift offset
  * bases are computed over the GENERATED subset only, so tables that
  * share a key domain (customer/orders share `custkey`, …) must be
  * generated in ONE invocation — two single-table invocations can
  * shift a shared domain by different bases and silently mis-join
  * across replicas. The output is a bench INPUT ONLY — correctness
  * gates stay on the driver-generated data.
  */
object ScaleGen {

  private val Tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Key-domain of a column, if it is a key: TPC-H foreign keys share
    * the suffix after '_' (c_custkey/o_custkey -> "custkey"), id
    * columns use their full name. */
  private def keyDomain(col: String): Option[String] = col match {
    case c if c.endsWith("key") => Some(c.substring(c.indexOf('_') + 1))
    case "doc_id" | "vec_id" | "event_id" | "user_id" => Some(col)
    case _ => None
  }

  def main(args: Array[String]): Unit = {
    val (srcDir, outDir, factorStr) = (args(0), args(1), args(2))
    val tables =
      if (args.length > 3) {
        val want = args(3).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val unknown = want.filterNot(Tables.contains)
        require(unknown.isEmpty, s"unknown tables: ${unknown.mkString(",")}")
        want
      } else Tables
    val factor = factorStr.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    // > 26 would wrap the letter rotation: replica 26's text becomes
    // byte-identical to replica 0's and near-dup work goes quadratic —
    // exactly the replication artifact the rotation exists to prevent.
    // Only `documents` carries rotated text, so the cap binds only when
    // it is generated; key shifts and embedding jitter scale to any
    // factor (the jitter phase term is per-replica, never periodic)
    require(factor <= 26 || !tables.contains("documents"),
      s"factor must be in [1, 26] when generating `documents` " +
        s"(letter rotation wraps at 26), got $factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src: Map[String, DataFrame] =
      tables.map(t => t -> spark.read.parquet(s"$srcDir/$t.parquet")).toMap

    // one offset base per key DOMAIN, global across tables, so foreign
    // keys stay consistent (c_custkey and o_custkey shift identically)
    val maxima: Map[String, Long] = {
      val pairs = for {
        (_, df) <- src.toSeq
        c <- df.columns
        dom <- keyDomain(c)
      } yield dom -> df.agg(max(col(c).cast("long"))).head().getLong(0)
      pairs.groupBy(_._1).map { case (d, vs) => d -> (vs.map(_._2).max + 1L) }
    }

    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    def rotated(i: Int): String = {
      val r = i % 26
      alphabet.drop(r) + alphabet.take(r)
    }

    for (t <- tables) {
      val df = src(t)
      val replicas = (0 until factor).map { i =>
        var rep = df
        for (c <- df.columns; dom <- keyDomain(c))
          rep = rep.withColumn(c,
            (col(c) + lit(i.toLong * maxima(dom))).cast(df.schema(c).dataType))
        if (t == "documents" && i > 0)
          rep = rep.withColumn("text",
            translate(col("text"), alphabet + alphabet.toUpperCase,
              rotated(i) + rotated(i).toUpperCase))
        if (t == "embeddings" && i > 0)
          rep = rep.withColumn("embedding", expr(
            s"transform(embedding, (x, j) -> " +
              s"CAST(x + 0.8 * sin(vec_id * 31 + j * 7 + $i * 997) AS FLOAT))"))
        rep
      }
      replicas.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"scale: wrote $t x$factor")
    }
    spark.stop()
  }
}
