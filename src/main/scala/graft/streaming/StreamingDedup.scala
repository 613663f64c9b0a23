package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental corpus deduplication over a stream — the streaming half
  * of the batch exact-dedup operator (t01): as new crawl snapshots land
  * in a graft table, emit only documents whose content hash has never
  * been seen in any earlier micro-batch.
  *
  * Built on `KeyValueGroupedDataset.flatMapGroupsWithState` (the
  * Structured Streaming custom-state primitive): state is keyed by the
  * 128-bit content hash and holds ONE boolean per distinct document —
  * at 100 TB that is O(distinct docs) entries of ~40 bytes spread
  * across the state store's shuffle partitions (RocksDB-backed on a
  * real cluster), not O(corpus bytes); each micro-batch shuffles only
  * its own rows, grouped by hash, against partition-local state.
  *
  * `GroupStateTimeout.NoTimeout` is deliberate: dedup state must never
  * expire — a document seen a month ago is still a duplicate today.
  * Pipelines that only need near-term dedup can bound state with the
  * same operator keyed on (hash, crawl window) upstream.
  *
  * Within one micro-batch the winner among same-hash rows is the
  * smallest `idCol` (deterministic, matching t01's min-id survivor
  * rule), so replaying a batch emits identical rows.
  */
object StreamingDedup {

  /** First-seen filter on `md5(textCol)` content identity. Emits the
    * surviving rows with their ORIGINAL schema — every input column
    * passes through untouched (the full row rides the state function
    * as a struct) — plus a trailing `content_hash` column. `idCol`
    * must cast to long; it only orders the within-batch winner.
    * Append-mode only — a row, once emitted, is never retracted. */
  def firstSeen(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val schema = docs.schema
    require(!schema.fieldNames.contains("content_hash"),
      "input already has a content_hash column")
    val rowEnc = Encoders.row(schema)
    val keyed = docs
      .select(md5(col(textCol)).as("__hash"),
        col(idCol).cast("long").as("__ord"),
        struct(schema.fieldNames.toSeq.map(col): _*).as("__row"))
      .as[(String, Long, Row)](
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong, rowEnc))
    keyed
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (hash: String, rows: Iterator[(String, Long, Row)],
            state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // deterministic within-batch winner: smallest id
            val first = rows.minBy(_._2)
            Iterator((hash, first._3))
          }
        })(Encoders.scalaBoolean, Encoders.tuple(Encoders.STRING, rowEnc))
      .select(col("_2.*"), col("_1").as("content_hash"))
  }

  /** Per-LSH-bucket state: members seen so far, ids parallel to sigs,
    * in arrival order (first `cap` occupants hold the bucket). */
  case class Bucket(ids: Seq[Long], sigs: Seq[Seq[Long]])

  /** Streaming NEAR-dup candidates — the streaming half of the batch
    * MinHash-LSH operator (t03): as documents stream in, emit
    * `(a_id, b_id, est_jaccard)` whenever a new document lands in an
    * LSH band bucket already holding earlier documents (`a_id` earlier,
    * `b_id` new, est >= `threshold`). Banding is IDENTICAL to the batch
    * path ([[graft.operators.TextOps.bandHashArray]] over the same
    * 64-permutation xxhash64 minhash), so batch-calibrated thresholds
    * carry over; recall differs from batch only in the full-bucket
    * regime described below.
    *
    * State shape at 100 TB: one entry per occupied (band, band_hash)
    * bucket holding at most `bucketCap` (id, signature) members —
    * ~0.5 KB per member at 64 permutations, the same order as the
    * persisted batch minhash index, hash-partitioned across the state
    * store's shuffle partitions (RocksDB-backed on a real cluster).
    * The cap bounds a degenerate mega-bucket (boilerplate shingles) to
    * `bucketCap` members like the batch bucket cap, with a streaming
    * twist: the FIRST `bucketCap` arrivals hold the bucket forever
    * (batch keeps the smallest ids). Docs arriving after a bucket
    * fills still compare against its members but no longer occupy it,
    * so two post-cap docs pair only through a shared band whose bucket
    * is NOT yet full — a pair is silently missed only when every
    * shared band is in the mega-bucket regime, where the batch cap is
    * also dropping candidates (just by id order instead of arrival).
    *
    * A pair sharing several bands emits once per shared band (the
    * signature-agreement estimate is identical on each); consumers
    * dedup with `dropDuplicates("a_id", "b_id")` on the sink side.
    * Within a micro-batch, bucket rows process in ascending doc id, so
    * replay emits identical rows. Append-mode only. */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 32, r: Int = 2, threshold: Double = 0.5,
      bucketCap: Int = 64): DataFrame = {
    import graft.operators.TextOps
    val s = docs.sparkSession
    import s.implicits._
    val perms = bands * r
    val sigs = TextOps.minhashIndex(
      docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text")), perms)
    val banded = sigs
      .select(col("doc_id"), col("minhash"),
        posexplode(TextOps.bandHashArray(bands, r))
          .as(Seq("band", "band_hash")))
      .as[(Long, Seq[Long], Int, Long)]
    banded
      .groupByKey(t => (t._3, t._4))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[(Long, Seq[Long], Int, Long)],
            state: GroupState[Bucket]) => {
          var bucket = state.getOption.getOrElse(Bucket(Nil, Nil))
          val out = Seq.newBuilder[(Long, Long, Double)]
          // Bounded batch window (r9 ADVICE: `rows.toSeq` buffered the
          // whole per-bucket batch group, so ONE degenerate mega-bucket
          // batch — boilerplate shingles — could hold unbounded
          // (id, sig) tuples on a task): keep only the 2*bucketCap
          // smallest ids via a max-at-head priority queue, which is
          // deterministic regardless of arrival order. Rows beyond the
          // window in such a batch lose candidate emission — the same
          // recall-for-boundedness trade the cap family (batch
          // 64-member bucket cap, dfCap) already makes, and only in
          // buckets where near-everything is already a mutual
          // candidate. 2x leaves emission room for rows that compare
          // against a full bucket without entering state.
          val window = 2 * bucketCap
          val pq = scala.collection.mutable.PriorityQueue
            .empty[(Long, Seq[Long])](Ordering.by[(Long, Seq[Long]), Long](_._1))
          rows.foreach { case (id, sig, _, _) =>
            if (pq.size < window) pq.enqueue((id, sig))
            else if (id < pq.head._1) { pq.dequeue(); pq.enqueue((id, sig)) }
          }
          val drained: Seq[(Long, Seq[Long])] = pq.dequeueAll
          drained.reverse.foreach { case (id, sig) =>
            if (!bucket.ids.contains(id)) {
              bucket.ids.iterator.zip(bucket.sigs.iterator).foreach {
                case (oid, osig) =>
                  val est = osig.iterator.zip(sig.iterator)
                    .count { case (x, y) => x == y }.toDouble / sig.size
                  // HALF_UP to match the batch path's round(est, 4) —
                  // 1/64-step estimates tie at .5 often, and rint's
                  // HALF_EVEN would diverge from t03 on those
                  if (est >= threshold)
                    out += ((oid, id, BigDecimal(est)
                      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
                      .toDouble))
              }
              if (bucket.ids.size < bucketCap)
                bucket = Bucket(bucket.ids :+ id, bucket.sigs :+ sig)
            }
          }
          state.update(bucket)
          out.result().iterator
        })
      .toDF("a_id", "b_id", "est_jaccard")
  }
}
