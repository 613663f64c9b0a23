package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.format.GraftFormat

/** The COMMITTER side of the two-process CDC certification
  * (BENCH_META.json `cdc2p_*`, r15 VERDICT #6): a standalone JVM that
  * performs one-fragment metadata appends against an existing graft
  * table while the launching process plays the long-lived incremental
  * reader. No SparkSession — the commit path is pure
  * [[graft.format.GraftFormat]] over the Hadoop FileSystem, which is
  * exactly what the certification needs: the reader's pinned caches and
  * depth hints live in the OTHER process, so every byte it reads per
  * synced version is what a real cross-process deployment pays.
  *
  * Env contract (set by [[StormHarness.launchJvm]]):
  *  - GRAFT_CDC_DIR       table directory URI
  *  - GRAFT_CDC_COMMITS   number of one-fragment appends (default 200)
  *  - GRAFT_CDC_SLEEP_MS  pacing between commits (default 25)
  *
  * Prints `CDC_AGENT_DONE commits=<n>` on success; exits nonzero with
  * the stack on stderr otherwise.
  */
object CdcChurnAgent {
  def main(args: Array[String]): Unit = {
    val dir = new Path(sys.env("GRAFT_CDC_DIR"))
    val n = sys.env.getOrElse("GRAFT_CDC_COMMITS", "200").toInt
    val sleepMs = sys.env.getOrElse("GRAFT_CDC_SLEEP_MS", "25").toLong
    val fs = dir.getFileSystem(new Configuration())
    val seed = GraftFormat.readLatest(fs, dir)
      .getOrElse(sys.error(s"no committed table at $dir"))
      .fragments.head
    (0 until n).foreach { i =>
      // the normal CAS-retry loop, like any real committer: if another
      // process does touch the table, this agent re-reads and retries
      // instead of dying mid-certification
      GraftFormat.commitWithRetry(fs, dir) { base =>
        val b = base.getOrElse(sys.error(s"table vanished at $dir"))
        b.copy(version = b.version + 1,
          fragments = b.fragments :+ seed.copy(
            id = b.maxFragmentId + 1,
            path = s"data/agent-cdc-$i.parquet",
            deletionPath = None, deletedCount = 0L),
          maxFragmentId = b.maxFragmentId + 1,
          createdAtMs = System.currentTimeMillis(), operation = "Append")
      }
      Thread.sleep(sleepMs)
    }
    println(s"CDC_AGENT_DONE commits=$n")
  }
}
