package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.functions._

import graft.connector.GraftTable
import graft.format.GraftFormat

/** Persisted inverted text (full-text search) index — the third leg of
  * the index family next to [[ScalarIndex]] (btree/bitmap) and
  * [[VectorIndex]] (LSH/IVF/PQ), mirroring the Lance format's FTS
  * inverted index (reference docs/src/performance.md "Index Usage" —
  * index-accelerated scans — applied to BM25 ranking; the Trino plugin
  * exposes no FTS SQL surface, so this exceeds it).
  *
  * Layout: `_indices/<col>.text/v=<tableVersion>/`
  *   - `postings/` — parquet (tok, doc_id, tf, dl), written SORTED by
  *     `tok` so a term lookup prunes to the row groups containing the
  *     queried tokens (parquet min/max + optional bloom), and the
  *     per-doc length rides denormalized on each posting — scoring
  *     never joins a second table.
  *   - `meta/` — one-row parquet (n, avgdl): the corpus-level BM25
  *     constants, read driver-side.
  *
  * Versioned like every other index: the directory embeds the manifest
  * version it was built at, and [[searchCurrent]] only serves an index
  * matching the latest version — stale indexes are invisible, never
  * wrong.
  *
  * Scale shape (100 TB): the build is one linear scan + one
  * (doc_id, tok) aggregation + a range-partitioned sorted write;
  * postings size is the corpus' token-type mass, not its byte size. A
  * query touches ONLY the postings of its terms (pushed `tok IN (...)`
  * prunes row groups on the sort order), so search cost scales with
  * term document-frequency — independent of corpus size for selective
  * terms. Exact BM25, not an approximation: scores equal the full-scan
  * formulation (t11) term-for-term.
  */
object TextIndex {

  def indexRoot(table: Path, col: String): Path =
    new Path(GraftFormat.indicesDir(table), s"$col.text")

  private def versionDir(table: Path, col: String, v: Long): Path =
    new Path(indexRoot(table, col), s"v=$v")

  private val toksOf = "filter(split(lower(%s), '\\\\s+'), x -> x != '')"

  /** Build (or rebuild) the inverted index for `textCol` at the table's
    * latest version. Returns the indexed version. */
  def build(spark: SparkSession, table: Path, idCol: String,
      textCol: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val manifest = GraftFormat.readLatest(fs, qual).getOrElse(
      throw new IllegalArgumentException(s"not a graft table: $table"))
    // deletion-aware snapshot scan through the normal connector reader
    val df = GraftShim.tableDF(spark,
      new GraftTable(s"index:$qual", qual, manifest, conf))
    val tok = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(expr(toksOf.format(textCol))).as("tok"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val postings = tok.groupBy("tok", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .join(dl, Seq("doc_id"))
      .select("tok", "doc_id", "tf", "dl")
    val dest = versionDir(qual, textCol, manifest.version)
    postings
      .repartitionByRange(col("tok"))
      .sortWithinPartitions("tok", "doc_id")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#tok", "true")
      .parquet(new Path(dest, "postings").toString)
    dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
      .write.mode("overwrite").parquet(new Path(dest, "meta").toString)
    manifest.version
  }

  /** Exact BM25 top-`k` over the persisted index of the table's LATEST
    * version; None when no current index exists (callers fall back to
    * the full-scan formulation). Only the query terms' postings are
    * read. Ties break on doc_id for determinism. */
  def searchCurrent(spark: SparkSession, table: Path, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75)
      : Option[DataFrame] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val current = GraftFormat.latestVersion(fs, qual).getOrElse(return None)
    val dir = versionDir(qual, textCol, current)
    if (!fs.exists(dir)) return None
    val meta = spark.read.parquet(new Path(dir, "meta").toString).head()
    val (n, avgdl) = (meta.getAs[Long]("n"), meta.getAs[Double]("avgdl"))
    val hits = spark.read.parquet(new Path(dir, "postings").toString)
      .filter(col("tok").isin(terms.map(_.toLowerCase): _*))
    val df = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    Some(hits
      .join(broadcast(df), Seq("tok"))
      .groupBy("doc_id")
      .agg(sum(
        log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
        .as("score"))
      .select(col("doc_id"), round(col("score"), 4).as("bm25"))
      .orderBy(round(col("score"), 4).desc, col("doc_id"))
      .limit(k))
  }
}
