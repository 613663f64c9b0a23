package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark DataFrame program plus (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names are aliased identically on both sides; every
  * query ends in a deterministic ORDER BY so row order cannot differ.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  def apply(name: String, oracle: String, doc: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle), doc)

  def noOracle(name: String, doc: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None, doc)
}
