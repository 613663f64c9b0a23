package graft.streaming

import org.apache.spark.sql.DataFrame
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
  * smallest `doc_id` (deterministic, matching t01's min-id survivor
  * rule), so replaying a batch emits identical rows.
  */
object StreamingDedup {

  /** First-seen filter on `hashCol` (any string column; pair it with
    * `md5(text)` for content identity). Emits the surviving rows with
    * their original schema plus the hash. Append-mode only — a row,
    * once emitted, is never retracted. */
  def firstSeen(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val hashed = docs
      .withColumn("content_hash", md5(col(textCol)))
      .select(col("content_hash"), col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
    hashed
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (hash: String, rows: Iterator[(String, Long, String)],
            state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // deterministic within-batch winner: smallest doc id
            val first = rows.minBy(_._2)
            Iterator((hash, first._2, first._3))
          }
        })
      .toDF("content_hash", "doc_id", "text")
  }
}
