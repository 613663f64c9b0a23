package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Persisted, probe-prunable MinHash near-dup index (r17 VERDICT #2).
  *
  * The t26 daily-dedup loop used to persist the signature table as
  * plain parquet and SCAN ALL OF IT once per delta batch — O(index)
  * I/O per day at 100 TB (tens of GB re-read when only the delta's
  * band-buckets matter). This store gives the minhash index the same
  * treatment the other five persisted indexes get (reference analog:
  * Lance scalar-index postings, docs/src/performance.md "Index
  * Usage"): a probe reads metadata + only the buckets its delta can
  * possibly match.
  *
  * Layout (`root/`):
  *   - `_store.json` — `{bands, r, segments:[...]}` (merge-on-read
  *     segment list, newest last — the [[IndexSegments]] pattern,
  *     standalone because this index lives at a caller path, not
  *     under a table's `_indices/`).
  *   - `seg-<uuid>/sigs/sp=<s>/…parquet` — (doc_id, minhash),
  *     hash-partitioned by doc_id so a bounded candidate set fetches
  *     signatures from only its partitions.
  *   - `seg-<uuid>/buckets/p=<b>/…parquet` — (band, band_hash,
  *     doc_id), hash-partitioned by kh = xxhash64(band, band_hash).
  *   - `seg-<uuid>/bloom.bin` — Spark sketch [[BloomFilter]] over the
  *     segment's kh set (fpp [[BloomFpp]]).
  *
  * Probe shape: a daily crawl delta is MOSTLY NOVEL text, so most of
  * its |delta|×bands probe keys do not exist in the index at all. The
  * bloom (no false negatives — candidate recall is exact) kills those
  * before any data I/O; the few survivors prune the bucket partitions
  * they hash to; the surviving candidates' signatures come from the
  * sig partitions they hash to. A dup-HEAVY delta falls back
  * COST-BASED: when the touched partitions would read more bucket
  * records than one scan of the segment's signatures, the probe bands
  * the sig scan on the fly instead — the pre-store probe's exact
  * shape, so the store is never worse than what it replaced (the
  * [[ScalarIndex]] MaxLookupValues principle).
  *
  * 100 TB notes: partition counts scale with segment size up to
  * [[MaxParts]] (object stores are fine with thousands of keys per
  * index). The bloom is ~19 bits/key at the default fpp — ~5% of the
  * signature payload it guards; beyond driver-loadable sizes the
  * scale path is per-segment blooms over COMPACTED shards (daily
  * appends keep segments bounded; `append` + periodic `build` from
  * [[sigsAll]] is the compaction loop), each tested independently
  * exactly as multiple segments already are here. Nothing driver-side
  * scales with the corpus: collected sets are partition IDS, bounded
  * by [[MaxParts]].
  */
object MinhashStore {

  private val mapper = new ObjectMapper()

  /** Bloom false-positive rate: sized so a FULLY novel delta's
    * expected false-positive count stays below one even at 100k-probe
    * batches — each fp costs a whole bucket partition read, so fp≈0
    * is what keeps the novel path's records at metadata scale. ~24
    * bits/key: still ~6% of the signature payload it guards. */
  val BloomFpp = 1e-5
  /** Target rows per bucket partition. Coarser partitions cost more
    * per surviving probe but linearly fewer output dirs/files at
    * build (dir-commit overhead dominated the gate's build phase at
    * 512); the cost-based fallback keeps dup-heavy probes off the
    * partitions entirely, and with fp≈0 a novel probe touches ~true
    * matches only. */
  val TargetRowsPerPart = 2048L
  /** No minimum floor beyond 1 (r19 — VERDICT r18 #1): partition count
    * is purely row-scaled, so an sf0.1-sized segment no longer pays 8
    * dir commits for 6 partitions' worth of rows; production segments
    * land the same counts as before (they sit far above any floor). */
  val MinParts = 1
  val MaxParts = 4096
  /** Sig partitions row-scaled like the buckets (r19): the build now
    * materializes the signature cache with one count job BEFORE any
    * write (that job carries the corpus shingling the sigs write used
    * to), so n is known when the sigs layout is chosen. 32 remains the
    * cap — production segments get exactly the pre-r19 layout — while
    * small segments stop paying 32 dir commits for a handful of rows. */
  val MaxSigParts = 32
  /** sigsFor: a candidate set touching more than this fraction of a
    * segment's sig partitions reads the segment outright (pruning
    * would read most of it anyway, plus per-partition overhead). */
  val FallbackPartFraction = 0.25

  final case class Meta(bands: Int, r: Int, segments: Seq[String])

  /** Per-probe observability for specs and the refresh probe. */
  final case class ProbeStats(segments: Int, probeKeys: Long,
      survivors: Long, partsTouched: Int, partsTotal: Int,
      fullScanSegments: Int)
  val lastProbeStats =
    new java.util.concurrent.atomic.AtomicReference[ProbeStats](null)

  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def metaPath(root: Path) = new Path(root, "_store.json")

  def meta(spark: SparkSession, root: String): Meta = {
    val (fs, rp) = fsOf(spark, root)
    val node = mapper.readTree(readAll(fs, metaPath(rp)))
    val segs = Seq.newBuilder[String]
    val it = node.get("segments").elements()
    while (it.hasNext) segs += it.next().asText()
    Meta(node.get("bands").asInt(), node.get("r").asInt(), segs.result())
  }

  // small local read helper (keeps graft.format.GraftFormat's
  // accounting out of a non-table path)
  private def readAll(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private def writeMeta(fs: FileSystem, root: Path, m: Meta): Unit = {
    val segs = m.segments.map(s => "\"" + s + "\"").mkString("[", ",", "]")
    val out = fs.create(metaPath(root), true)
    try out.write(
      s"""{"bands":${m.bands},"r":${m.r},"segments":$segs}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def parts(rows: Long): Int =
    math.max(MinParts,
      math.min(MaxParts, rows / TargetRowsPerPart + 1)).toInt

  private def sigParts(rows: Long): Int =
    math.max(1,
      math.min(MaxSigParts, rows / TargetRowsPerPart + 1)).toInt

  /** kh — the single probe key a (band, band_hash) pair buckets and
    * blooms under. Folding the band in keeps one bloom/bucket space
    * across all bands; the data rows still carry (band, band_hash) so
    * a kh collision can never fabricate a candidate. */
  private[graft] def khCol: org.apache.spark.sql.Column =
    xxhash64(col("band"), col("band_hash"))

  /** One segment's payload from a signature frame. Returns the
    * segment name. */
  private def writeSegment(sigs: DataFrame, root: Path, bands: Int,
      r: Int): String = {
    val spark = sigs.sparkSession
    val (fs, _) = fsOf(spark, root.toString)
    val seg = IndexSegments.newSegmentName()
    val segDir = new Path(root, seg)
    val cached = sigs.select(col("doc_id").cast("long").as("doc_id"),
      col("minhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // r19 build shape (VERDICT r18 #1): ONE materialization job up
      // front (the count carries the corpus shingling that the sigs
      // write used to pay, and makes n available to size BOTH layouts),
      // then the three payload jobs — sigs write, buckets write, bloom
      // — all read the populated cache and run CONCURRENTLY from a
      // small driver pool (guide §2.6, overlap independent jobs): at
      // gate segment sizes each is fixed-overhead-dominated, so wall
      // clock is their max, not their sum; at production sizes the
      // scheduler back-fills each job's straggler tail with the others'
      // tasks. Writes go to disjoint paths; the bloom is a treeAggregate
      // — no shared mutable state crosses the threads.
      val n = graft.BenchPhases.timed("mhstore.materialize") {
        cached.count()
      }
      val sp = sigParts(n)
      val p = parts(n * bands)
      val banded = cached.select(col("doc_id"),
        posexplode(graft.operators.TextOps.bandHashArray(bands, r))
          .as(Seq("band", "band_hash")))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      val bloom = try {
        def task[T](body: => T): java.util.concurrent.Future[T] =
          pool.submit(new java.util.concurrent.Callable[T] {
            override def call(): T = body
          })
        // explicit shuffle partition counts (= dir counts) keep the
        // exchanges scale-adaptive instead of riding the session's
        // spark.sql.shuffle.partitions (guide §2: no constant tuned to
        // either local mode or one cluster size)
        val sigsF = task {
          graft.BenchPhases.timed("mhstore.sigs_write") {
            cached
              .withColumn("sp", pmod(xxhash64(col("doc_id")), lit(sp.toLong))
                .cast("int"))
              .repartition(sp, col("sp"))
              .write.partitionBy("sp").mode("overwrite")
              .parquet(new Path(segDir, "sigs").toString)
          }
        }
        val bucketsF = task {
          graft.BenchPhases.timed("mhstore.buckets_write") {
            banded
              .withColumn("p", pmod(khCol, lit(p.toLong)).cast("int"))
              .repartition(p, col("p"))
              .write.partitionBy("p").mode("overwrite")
              .parquet(new Path(segDir, "buckets").toString)
          }
        }
        // bloom over the segment's kh set — one distributed agg, result
        // ~24 bits/key on the driver then persisted beside the payload
        val bloomF = task {
          graft.BenchPhases.timed("mhstore.bloom") {
            banded.select(khCol.as("kh"))
              .stat.bloomFilter("kh", math.max(1L, n * bands), BloomFpp)
          }
        }
        // first failure cancels the siblings and waits them out, so no
        // write outlives the build call
        try {
          sigsF.get(); bucketsF.get(); bloomF.get()
        } catch {
          case e: java.util.concurrent.ExecutionException =>
            pool.shutdownNow()
            pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
            throw e.getCause
        }
      } finally { pool.shutdown(); () }
      val out = fs.create(new Path(segDir, "bloom.bin"), true)
      try bloom.writeTo(out) finally out.close()
      val mo = fs.create(new Path(segDir, "_seg.json"), true)
      try mo.write(s"""{"n":$n,"sp":$sp,"p":$p}""".getBytes("UTF-8"))
      finally mo.close()
      seg
    } finally { cached.unpersist(false); () }
  }

  private def segParts(fs: FileSystem, root: Path,
      seg: String): (Long, Int, Int) = {
    val node = mapper.readTree(
      readAll(fs, new Path(new Path(root, seg), "_seg.json")))
    (node.get("n").asLong(), node.get("sp").asInt(), node.get("p").asInt())
  }

  // per-(root, seg) bloom cache: a daily probe loop re-probes the same
  // segments; the blobs are small and immutable once written
  private val bloomCache =
    scala.collection.concurrent.TrieMap.empty[String, BloomFilter]
  private def loadBloom(fs: FileSystem, root: Path, seg: String): BloomFilter =
    bloomCache.getOrElseUpdate(new Path(root, seg).toString, {
      val in = fs.open(new Path(new Path(root, seg), "bloom.bin"))
      try BloomFilter.readFrom(in) finally in.close()
    })
  private[graft] def clearCaches(): Unit = bloomCache.clear()

  /** Build (or REPLACE) the store from a full signature frame —
    * one segment. Also the compaction target for a long append
    * chain: `build(sigsAll(spark, root), root)`. */
  def build(sigs: DataFrame, root: String, bands: Int = 32,
      r: Int = 2): Unit = {
    val spark = sigs.sparkSession
    val (fs, rp) = fsOf(spark, root)
    fs.delete(rp, true)
    fs.mkdirs(rp)
    val seg = writeSegment(sigs, rp, bands, r)
    writeMeta(fs, rp, Meta(bands, r, Seq(seg)))
    clearCaches()
  }

  /** Merge-on-read append: index `newSigs` (disjoint doc_ids — the
    * survivors of today's dedup round) as a new segment. O(delta):
    * existing segments are untouched. */
  def append(newSigs: DataFrame, root: String): Unit = {
    val spark = newSigs.sparkSession
    val (fs, rp) = fsOf(spark, root)
    val m = meta(spark, root)
    val seg = writeSegment(newSigs, rp, m.bands, m.r)
    writeMeta(fs, rp, m.copy(segments = m.segments :+ seg))
  }

  /** Union of every segment's signatures — the logical (doc_id,
    * minhash) index content, for compaction and full-scan consumers. */
  def sigsAll(spark: SparkSession, root: String): DataFrame =
    meta(spark, root).segments
      .map(seg => spark.read.parquet(s"$root/$seg/sigs")
        .select("doc_id", "minhash"))
      .reduce(_ unionByName _)

  /** Index postings matching `probes` (new_id, band, band_hash):
    * returns (band, band_hash, new_id, doc_id) — doc_id the INDEX
    * side — for every index doc
    * sharing a (band, band_hash) bucket with a probe. Candidate
    * recall is EXACT (bloom has no false negatives; kh collisions are
    * resolved by the real (band, band_hash) join keys) while I/O is
    * O(matching buckets): per segment, bloom-surviving probes decide
    * the partitions read — none survive, nothing is read. `probes`
    * must be cheap to recompute (derived from a cached signature
    * frame): this runs small collect-jobs over it per segment. */
  def matchedPostings(spark: SparkSession, root: String,
      probes: DataFrame): DataFrame = {
    val (fs, rp) = fsOf(spark, root)
    val m = meta(spark, root)
    val keyed = probes.withColumn("kh", khCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var survivorsTotal = 0L
      var touched = 0
      var totalParts = 0
      var fullScans = 0
      val segInfos = m.segments.map { seg =>
        (seg, segParts(fs, rp, seg), loadBloom(fs, rp, seg))
      }
      // ONE decision job across every segment (r19 — VERDICT r18 #3):
      // each segment's bloom-filter + partition-group branch unions
      // into a single collected frame tagged by segment ordinal, so a
      // multi-segment store (the daily append chain) pays one driver
      // round-trip for all its partition decisions instead of one per
      // segment. Branch 0 additionally carries the probe-key count as
      // an observation — the observed frame stays out of the returned
      // lazy plans (an Observation is one-shot; re-executing its node
      // is undefined).
      val kObs = org.apache.spark.sql.Observation()
      val decided = segInfos.zipWithIndex.map {
        case ((_, (_, _, p), bloom), i) =>
          val might = udf((kh: Long) => bloom.mightContainLong(kh))
          val src =
            if (i == 0) keyed.observe(kObs, count(lit(1)).as("k"))
            else keyed
          src.filter(might(col("kh")))
            .groupBy(pmod(col("kh"), lit(p.toLong)).cast("int").as("p"))
            .agg(count(lit(1)).as("cnt"))
            .select(lit(i).as("si"), col("p"), col("cnt"))
      }.reduce(_ unionByName _)
      val decidedRows = graft.BenchPhases.timed("mhstore.probe_decision") {
        decided.collect()
      }
      // observability-only: a missed metric degrades to -1, never
      // fails the probe or buys a dedicated count job
      val probeKeys =
        scala.util.Try(kObs.get("k").asInstanceOf[Long]).getOrElse(-1L)
      val bySeg = decidedRows.groupBy(_.getInt(0))
      val perSeg = segInfos.zipWithIndex.map {
        case ((seg, (segRows, _, p), bloom), i) =>
        totalParts += p
        val byPart = bySeg.getOrElse(i, Array.empty)
        val partIds = byPart.map(_.getInt(1)).sorted
        survivorsTotal += byPart.map(_.getLong(2)).sum
        touched += partIds.length
        if (partIds.isEmpty) None
        else if (partIds.length.toLong * TargetRowsPerPart > segRows) {
          // COST-BASED fallback: each touched partition costs
          // ~TargetRowsPerPart bucket records, so once the survivors
          // spread past segRows/TargetRowsPerPart partitions, one scan
          // of the segment's SIGNATURES (banded on the fly — exactly
          // the pre-store probe's shape and cost, 32× narrower in
          // records than the bucket table) is strictly cheaper. A
          // dup-heavy delta therefore pays the old O(index) cost at
          // worst, never 32× it.
          fullScans += 1
          Some(spark.read.parquet(s"$root/$seg/sigs")
            .select(col("doc_id"), posexplode(
              graft.operators.TextOps.bandHashArray(m.bands, m.r))
              .as(Seq("band", "band_hash")))
            .join(broadcast(keyed.select("new_id", "band", "band_hash")),
              Seq("band", "band_hash")))
        } else {
          // this segment's bloom survivors, re-derived lazily from the
          // cached probe frame for the returned plan (same rows the
          // decision job grouped)
          val might = udf((kh: Long) => bloom.mightContainLong(kh))
          Some(
            spark.read.parquet(s"$root/$seg/buckets")
              .filter(col("p").isin(partIds.toIndexedSeq.map(Integer.valueOf): _*))
              .join(broadcast(keyed.filter(might(col("kh")))
                .select("new_id", "band", "band_hash")),
                Seq("band", "band_hash")))
        }
      }
      lastProbeStats.set(ProbeStats(m.segments.size, probeKeys,
        survivorsTotal, touched, totalParts, fullScans))
      val matched = perSeg.flatten
      if (matched.isEmpty)
        // empty frame with the contract's schema
        spark.read.parquet(s"$root/${m.segments.head}/buckets").limit(0)
          .select(col("band"), col("band_hash"),
            lit(0L).as("new_id"), col("doc_id"))
      else matched.reduce(_ unionByName _)
        .select("band", "band_hash", "new_id", "doc_id")
    } finally { keyed.unpersist(false); () }
  }

  /** Signatures for a bounded candidate id frame (`old_id` column),
    * read from only the sig partitions those ids hash to. */
  def sigsFor(spark: SparkSession, root: String,
      ids: DataFrame): DataFrame = {
    val (fs, rp) = fsOf(spark, root)
    val m = meta(spark, root)
    val wanted = ids.select(col("old_id").cast("long").as("doc_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val segInfos = m.segments.map(seg => (seg, segParts(fs, rp, seg)._2))
      // ONE partition-decision job across every segment (r19 — VERDICT
      // r18 #3): union the per-segment distinct-sp branches, tagged by
      // segment ordinal, instead of one collect per segment
      val decided = graft.BenchPhases.timed("mhstore.sig_decision") {
        segInfos.zipWithIndex.map { case ((_, sp), i) =>
          wanted.select(lit(i).as("si"),
            pmod(xxhash64(col("doc_id")), lit(sp.toLong))
              .cast("int").as("sp"))
            .distinct()
        }.reduce(_ unionByName _).collect()
      }
      val bySeg = decided.groupBy(_.getInt(0))
      segInfos.zipWithIndex.map { case ((seg, sp), i) =>
        val partIds = bySeg.getOrElse(i, Array.empty).map(_.getInt(1)).sorted
        val path = s"$root/$seg/sigs"
        val base =
          if (partIds.isEmpty) spark.read.parquet(path).limit(0)
          else if (partIds.length > sp * FallbackPartFraction)
            spark.read.parquet(path)
          else spark.read.parquet(path)
            .filter(col("sp").isin(partIds.toIndexedSeq.map(Integer.valueOf): _*))
        base.join(broadcast(wanted), Seq("doc_id"))
          .select("doc_id", "minhash")
      }.reduce(_ unionByName _)
    } finally { wanted.unpersist(false); () }
  }
}
