package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

class CacheHygieneSpec extends AnyFunSuite {
  import TestSpark._

  private def cachedLevel(df: org.apache.spark.sql.DataFrame): StorageLevel =
    df.storageLevel

  private def pollUntilReleased(df: org.apache.spark.sql.DataFrame): Boolean = {
    // unpersist rides the async listener bus; poll briefly
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (cachedLevel(df) != StorageLevel.NONE && System.nanoTime() < deadline)
      Thread.sleep(100)
    cachedLevel(df) == StorageLevel.NONE
  }

  test("release waits for the CONSUMING query, not just any action " +
      "(end-of-r8 ADVICE)") {
    import spark.implicits._
    val cached = Seq(1, 2, 3).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    cached.count() // materialize the cache
    CacheHygiene.unpersistAfterNextAction(cached)
    // interleaved UNRELATED actions — the sharp edge the old listener had:
    // it fired on the very next session action, dropping the cache before
    // the one real consumer ran
    spark.range(100).selectExpr("sum(id)").collect()
    Seq(("other", 1L)).toDF("s", "n").count()
    Thread.sleep(500) // let the listener bus drain the unrelated events
    assert(cachedLevel(cached) != StorageLevel.NONE,
      "cache was released by a query that never read it")
    // the consuming query (its plan contains the cached subtree) releases
    assert(cached.groupBy("x").count().count() == 3)
    assert(pollUntilReleased(cached),
      "cache not released after the consuming query completed")
  }

  test("one-shot: a second consuming query recomputes without error") {
    import spark.implicits._
    val cached = Seq(10, 20).toDF("y").persist(StorageLevel.MEMORY_AND_DISK)
    CacheHygiene.unpersistAfterNextAction(cached)
    assert(cached.count() == 2)
    assert(pollUntilReleased(cached))
    // persisted plans recompute transparently after release
    assert(cached.agg(org.apache.spark.sql.functions.sum("y"))
      .head().getLong(0) == 30L)
  }
}
