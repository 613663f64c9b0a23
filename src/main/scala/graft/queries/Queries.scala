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

  /** Directory holding the committed golden-oracle parquet files
    * (generated once by [[graft.GoldenGen]], pinned in git). The gate's
    * oracle SQL embeds this path, so a checkout elsewhere sets
    * GRAFT_REPO_ROOT before running Verify. */
  val GoldenDir: String =
    sys.env.getOrElse("GRAFT_REPO_ROOT", "/root/repo") + "/golden"

  /** A query whose semantics are deterministic but not ANSI-SQL-
    * expressible: the oracle reads the committed golden parquet slice
    * for the gate's scale factor (`sf_key` = count(lineitem) at that
    * sf). At an unknown sf the slice is empty while the Spark side is
    * not, so the gate fails loudly rather than passing vacuously.
    * Only queries whose output is bit-stable across partitionings may
    * use this (integer hashing / per-row FP with unique sort keys);
    * anything with cross-row FP accumulation (e.g. k-means training)
    * must stay [[noOracle]]. */
  def golden(name: String, cols: Seq[String], orderBy: String, doc: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(
      s"SELECT ${cols.mkString(", ")} " +
        s"FROM read_parquet('$GoldenDir/$name.parquet') " +
        "WHERE sf_key = (SELECT count(*) FROM lineitem) " +
        s"ORDER BY $orderBy"), doc)
}
