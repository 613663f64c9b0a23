package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
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
  *   - `meta/` — one-row parquet (n, avgdl, sumdl): the corpus-level
  *     BM25 constants, read driver-side.
  *
  * A REFRESHED version ([[refresh]]) is instead a segment list
  * ([[IndexSegments]]): the prior version's posting directories plus
  * one new segment covering only the appended fragments, with the
  * merged BM25 constants (n, sumdl — exact long sums, so merged
  * avgdl is bit-identical to a full rebuild's) in the segment
  * manifest. Lucene-style merge-on-read: a query unions the term's
  * postings across segments; df/tf/dl are per-(token, doc) facts, so
  * over disjoint doc sets the union IS the full rebuild, score for
  * score.
  *
  * Versioned like every other index: the directory embeds the manifest
  * version it was built at, and [[searchCurrent]] only serves an index
  * matching the latest version — stale indexes are invisible, never
  * wrong.
  *
  * Scale shape (100 TB): the build is one linear scan + one
  * (doc_id, tok) aggregation + a range-partitioned sorted write;
  * postings size is the corpus' token-type mass, not its byte size. A
  * refresh re-reads ONLY the appended fragments (plus, by default, a
  * doc_id-column sanity scan of existing postings — disable with
  * `spark.graft.index.refresh.verifyDisjoint=false` when ids are a
  * trusted key). A query touches ONLY the postings of its terms
  * (pushed `tok IN (...)` prunes row groups on the sort order), so
  * search cost scales with term document-frequency — independent of
  * corpus size for selective terms. Exact BM25, not an approximation:
  * scores equal the full-scan formulation (t11) term-for-term.
  */
object TextIndex {

  def indexRoot(table: Path, col: String): Path =
    new Path(GraftFormat.indicesDir(table), s"$col.text")

  private def versionDir(table: Path, col: String, v: Long): Path =
    new Path(indexRoot(table, col), s"v=$v")

  private val toksOf = "filter(split(lower(%s), '\\\\s+'), x -> x != '')"

  val VerifyDisjointKey = "spark.graft.index.refresh.verifyDisjoint"

  /** Build (or rebuild) the inverted index for `textCol` at the table's
    * latest version. Returns the indexed version. */
  def build(spark: SparkSession, table: Path, idCol: String,
      textCol: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val manifest = GraftFormat.readLatest(fs, qual).getOrElse(
      throw new IllegalArgumentException(s"not a graft table: $table"))
    val dest = versionDir(qual, textCol, manifest.version)
    // a rebuild over a previously-refreshed version must drop the
    // segment manifest or readers would resolve the stale segment list
    fs.delete(IndexSegments.manifestPath(dest), false)
    IndexSegments.invalidateDir(fs, dest) // rebuild replaces the chain
    writeSegment(spark, fs, qual, manifest, idCol, textCol, dest)
    manifest.version
  }

  /** Per-segment totals + doc_id range, as written to the segment's
    * meta parquet. Ranges are None for an empty segment. */
  private final case class SegTotals(n: Long, sumdl: Long,
      range: Option[(Long, Long)])

  /** One posting segment over `manifest`'s fragments at `dest`
    * (postings/ + meta/). Returns totals for merge accounting. */
  private def writeSegment(spark: SparkSession, fs: FileSystem, qual: Path,
      manifest: GraftFormat.Manifest, idCol: String, textCol: String,
      dest: Path): SegTotals = {
    val conf = spark.sessionState.newHadoopConf()
    // deletion-aware snapshot scan through the normal connector reader
    val df = GraftShim.tableDF(spark,
      new GraftTable(s"index:$qual", qual, manifest, conf))
    // one tokenize + explode pass, cached (r18 optimization): the token
    // stream feeds the doc-length aggregate, both sides of the postings
    // aggregate + join, the range-exchange sample AND the meta
    // aggregate — uncached, each re-ran the corpus tokenize. Two
    // consuming actions (postings write, meta write) then release it.
    val tok = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(expr(toksOf.format(textCol))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CacheHygiene.unpersistAfterNextAction(tok,
      releaseAfterConsumers = 2)
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val postings = tok.groupBy("tok", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .join(dl, Seq("doc_id"))
      .select("tok", "doc_id", "tf", "dl")
    postings
      .repartitionByRange(col("tok"))
      .sortWithinPartitions("tok", "doc_id")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#tok", "true")
      .parquet(new Path(dest, "postings").toString)
    // doc_min/doc_max let refresh prove delta-vs-index doc_id
    // disjointness from ONE metadata row per segment instead of a
    // postings scan (O(segments), not O(index))
    val meta = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"),
      sum(col("dl")).as("sumdl"),
      min(col("doc_id")).as("doc_min"), max(col("doc_id")).as("doc_max"))
    meta.write.mode("overwrite").parquet(new Path(dest, "meta").toString)
    val row = spark.read.parquet(new Path(dest, "meta").toString).head()
    val range =
      if (row.isNullAt(row.fieldIndex("doc_min"))) None
      else Some((row.getAs[Long]("doc_min"), row.getAs[Long]("doc_max")))
    SegTotals(row.getAs[Long]("n"), row.getAs[Long]("sumdl"), range)
  }

  /** A segment's doc_id coverage, as carried in the version manifest:
    * a known [lo, hi] range, provably empty (zero docs — vacuously
    * disjoint from any delta), or unknown (pre-range layout —
    * conservatively treated as overlapping). All three serialize into
    * the manifest so legacy segments pay their meta-read fallback at
    * most ONCE per chain. */
  private sealed trait SegRange
  private final case class KnownRange(lo: Long, hi: Long) extends SegRange
  private case object EmptyRange extends SegRange
  private case object UnknownRange extends SegRange

  private def fmtRange(r: SegRange): String = r match {
    case KnownRange(lo, hi) => s"$lo,$hi"
    case EmptyRange => "none"
    case UnknownRange => "unknown"
  }

  private def parseRange(v: String): SegRange = v match {
    case "none" => EmptyRange
    case "unknown" => UnknownRange
    case s =>
      // malformed entries degrade to "unknown" (conservative), never
      // crash the refresh
      scala.util.Try {
        val Array(lo, hi) = s.split(',')
        KnownRange(lo.toLong, hi.toLong): SegRange
      }.getOrElse(UnknownRange)
  }

  /** doc_id coverage per segment name, preferring the (already-read)
    * version manifest's carried `range:<seg>` entries — zero extra I/O;
    * segments not covered there fall back to one meta-parquet read each
    * (legacy/monolithic — once per chain, since the next manifest
    * carries the answer forward whatever it was). */
  private def segRangesOf(spark: SparkSession, root: Path,
      priorManifest: Option[IndexSegments.SegManifest],
      segs: Seq[String]): Map[String, SegRange] = {
    val carried: Map[String, SegRange] =
      priorManifest.map(_.extra).getOrElse(Map.empty)
        .collect { case (k, v) if k.startsWith("range:") =>
          k.stripPrefix("range:") -> parseRange(v)
        }
    segs.map { s =>
      s -> carried.getOrElse(s, {
        val metaPath = new Path(new Path(root, s), "meta")
        try {
          val row = spark.read.parquet(metaPath.toString).head()
          if (row.schema.fieldNames.contains("n") && row.getAs[Long]("n") == 0L)
            EmptyRange
          else if (!row.schema.fieldNames.contains("doc_min") ||
              row.isNullAt(row.fieldIndex("doc_min"))) UnknownRange
          else KnownRange(row.getAs[Long]("doc_min"), row.getAs[Long]("doc_max"))
        } catch { case _: Exception => UnknownRange }
      })
    }.toMap
  }

  /** (docs, sumdl) totals of the index at `dir` — from the (pre-read)
    * segment manifest when present, else the legacy/monolithic meta
    * parquet (pre-sumdl layouts recover the sum from n × avgdl, exact
    * for integer document lengths within double precision). Callers
    * pass the manifest they already hold so a refresh reads
    * _segments.json exactly once. */
  private def totalsOf(spark: SparkSession, dir: Path,
      manifest: Option[IndexSegments.SegManifest]): (Long, Long) =
    manifest match {
      case Some(m) =>
        (m.extra("n").toLong, m.extra("sumdl").toLong)
      case None =>
        val row = spark.read.parquet(new Path(dir, "meta").toString).head()
        val n = row.getAs[Long]("n")
        val sumdl =
          if (row.schema.fieldNames.contains("sumdl")) row.getAs[Long]("sumdl")
          else math.round(n * row.getAs[Double]("avgdl"))
        (n, sumdl)
    }

  /** Incremental refresh-on-append (see [[IndexSegments]]): tokenize
    * ONLY the fragments appended since the newest indexed version and
    * publish prior segments + the delta under the current version.
    * Falls back to a full [[build]] when no prior index exists, the
    * prior manifest was vacuumed, old fragments were mutated (a deleted
    * doc's postings would keep scoring), or — unless
    * `spark.graft.index.refresh.verifyDisjoint=false` — an appended
    * doc_id already exists in the index (its tf/dl facts would
    * double-count instead of merging). Returns the indexed version. */
  def refresh(spark: SparkSession, table: Path, idCol: String,
      textCol: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val manifest = GraftFormat.readLatest(fs, qual).getOrElse(
      throw new IllegalArgumentException(s"not a graft table: $table"))
    val root = indexRoot(qual, textCol)
    val prior = indexedVersions(spark, table, textCol)
      .filter(_ <= manifest.version)
    if (prior.isEmpty) return build(spark, table, idCol, textCol)
    val v1 = prior.max
    if (v1 == manifest.version) return v1
    val oldManifest =
      try GraftFormat.readManifest(fs, qual, v1)
      catch { case _: java.io.FileNotFoundException =>
        return build(spark, table, idCol, textCol) }
    GraftFormat.appendedDelta(oldManifest, manifest) match {
      case None => build(spark, table, idCol, textCol)
      case Some(delta) =>
        val priorDir = versionDir(qual, textCol, v1)
        // the prior version's segment manifest is read ONCE and shared
        // by segment expansion, totals, and range resolution below
        val priorManifest = IndexSegments.read(fs, priorDir)
        val priorSegs = priorManifest.map(_.segments)
          .getOrElse(Seq(priorDir.getName))
        val (n0, sum0) = totalsOf(spark, priorDir, priorManifest)
        val priorRanges = segRangesOf(spark, root, priorManifest, priorSegs)
        def rangeEntries(rs: Map[String, SegRange]): Map[String, String] =
          rs.map { case (s, r) => s"range:$s" -> fmtRange(r) }
        val dest = versionDir(qual, textCol, manifest.version)
        if (delta.isEmpty) {
          IndexSegments.write(fs, dest, IndexSegments.SegManifest(priorSegs,
            Map("n" -> n0.toString, "sumdl" -> sum0.toString) ++
              rangeEntries(priorRanges)))
          return manifest.version
        }
        val deltaManifest = manifest.copy(fragments = delta,
          properties = manifest.properties -- GraftFormat.ClusteringProps)
        if (spark.conf.get(VerifyDisjointKey, "true").toBoolean) {
          // fast path: the prior manifest carries every segment's doc_id
          // coverage (legacy segments read their meta row once, then the
          // answer rides forward) — when the delta's id range is
          // disjoint from every segment's, disjointness is proven from
          // O(segments) metadata with zero extra Spark jobs (the
          // steady-state monotone-id ingest shape). An all-null delta
          // range means an empty delta: vacuously disjoint. Only on
          // range overlap or an unknown legacy range does the exact
          // column-pruned postings doc_id check run.
          val deltaRange = GraftShim.tableDF(spark,
              new GraftTable(s"index:$qual#delta", qual, deltaManifest, conf))
            .agg(min(col(idCol).cast("long")).as("lo"),
              max(col(idCol).cast("long")).as("hi")).head()
          val disjointByRange = deltaRange.isNullAt(0) || {
            val (dLo, dHi) = (deltaRange.getLong(0), deltaRange.getLong(1))
            priorSegs.forall(s => priorRanges(s) match {
              case KnownRange(lo, hi) => dLo > hi || dHi < lo
              case EmptyRange => true
              case UnknownRange => false
            })
          }
          if (!disjointByRange) {
            val oldIds = priorSegs.map(s => spark.read
                .parquet(new Path(new Path(root, s), "postings").toString)
                .select("doc_id"))
              .reduce(_ unionAll _).distinct()
            val deltaIds = GraftShim.tableDF(spark,
                new GraftTable(s"index:$qual#delta", qual, deltaManifest, conf))
              .select(col(idCol).cast("long").as("doc_id")).distinct()
            if (deltaIds.join(oldIds, Seq("doc_id"), "left_semi").limit(1)
                .count() > 0)
              return build(spark, table, idCol, textCol)
          }
        }
        val segName = IndexSegments.newSegmentName()
        val st = writeSegment(spark, fs, qual, deltaManifest,
          idCol, textCol, new Path(root, segName))
        val newRange: SegRange =
          st.range.map { case (lo, hi) => KnownRange(lo, hi) }
            .getOrElse(EmptyRange)
        IndexSegments.write(fs, dest,
          IndexSegments.SegManifest(priorSegs :+ segName,
            Map("n" -> (n0 + st.n).toString,
              "sumdl" -> (sum0 + st.sumdl).toString) ++
              rangeEntries(priorRanges ++ Map(segName -> newRange))))
        manifest.version
    }
  }

  /** Versions with a persisted text index for `col`. */
  def indexedVersions(spark: SparkSession, table: Path, col: String): Seq[Long] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val root = indexRoot(fs.makeQualified(table), col)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** Exact BM25 top-`k` over the persisted index of the table's LATEST
    * version; None when no current index exists (callers fall back to
    * the full-scan formulation). Only the query terms' postings are
    * read — across every segment of a refreshed index. Ties break on
    * doc_id for determinism. */
  def searchCurrent(spark: SparkSession, table: Path, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75)
      : Option[DataFrame] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val qual = fs.makeQualified(table)
    val current = GraftFormat.latestVersion(fs, qual).getOrElse(return None)
    val dir = versionDir(qual, textCol, current)
    val root = indexRoot(qual, textCol)
    val dataDirs = IndexSegments.dataDirs(fs, root, dir)
    if (dataDirs.isEmpty) return None
    val (n, sumdl) = totalsOf(spark, dir, IndexSegments.read(fs, dir))
    val avgdl = sumdl.toDouble / n
    val hits = spark.read
      .parquet(dataDirs.map(d => new Path(d, "postings").toString): _*)
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
