package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MultimodalOps, TextOps, VectorOps}
import graft.queries.{FormatQueries, Q, Relational, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md section 7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md section 2 is exposed as a named
  * entry in [[queries]]; where the semantics are ANSI-SQL-expressible the
  * matching DuckDB oracle lives in [[oracleSql]] (column names aliased
  * identically on both sides — the driver's compare hashes values under
  * name-sorted columns).
  */
object SparkEntry {

  /** All registered query groups. Extended as operators land. */
  private def allQueries: Seq[Q] =
    Relational.all ++ TextOps.all ++ VectorOps.all ++ MultimodalOps.all ++
      FormatQueries.all ++ StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-style pricing summary — aggregation + filter pushdown in one. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md section 2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
