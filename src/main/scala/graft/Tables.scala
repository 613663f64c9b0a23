package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables
  * (`/root/testdata/sfN/{name}.parquet`, schemas in FIXTURES.md A).
  *
  * All queries receive the sf directory at call time so the same code runs
  * at sf0.001 (smoke), sf0.01 (correctness), sf0.1 (bench) — and, by design,
  * unchanged on a real cluster at 100 TB: nothing below hardcodes row counts
  * or collects to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so SQL-surface queries (CTEs,
    * correlated subqueries, set ops) can run as plain `spark.sql`. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
