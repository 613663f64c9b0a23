package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for the golden-oracle mechanism: every `Q.golden` query
  * must have a committed pin whose schema matches the live query, and
  * the GoldenGen list must cover exactly the golden-oracled queries —
  * so forgetting to run GoldenGen after adding/changing a golden query
  * fails HERE, not in the driver's correctness gate. */
class GoldenPinSpec extends AnyFunSuite {
  import TestSpark._

  private val goldenOracled: Set[String] = SparkEntry.oracleSql.collect {
    case (name, sql) if sql.contains(graft.queries.Q.GoldenDir) => name
  }.toSet

  test("GoldenGen's query list is exactly the golden-oracled set") {
    assert(GoldenGen.GoldenQueries.toSet == goldenOracled,
      s"GoldenGen list and Q.golden usage drifted: " +
        s"only-in-gen=${GoldenGen.GoldenQueries.toSet -- goldenOracled}, " +
        s"only-in-oracles=${goldenOracled -- GoldenGen.GoldenQueries.toSet}")
  }

  test("every golden-oracled query has a committed, schema-matching pin") {
    for (name <- goldenOracled.toSeq.sorted) {
      val pin = Paths.get(graft.queries.Q.GoldenDir, s"$name.parquet")
      assert(Files.exists(pin),
        s"missing golden pin $pin — run `sbt \"runMain graft.GoldenGen\"`")
      val pinned = spark.read.parquet(pin.toString)
      // same root fallback as GoldenGen, so the drift guard works on any
      // checkout where the test data lives elsewhere
      val dataRoot = sys.env.getOrElse("GRAFT_TESTDATA_ROOT", "/root/testdata")
      val live = SparkEntry.queries(name)(spark, s"$dataRoot/sf0.001")
      assert(pinned.columns.toSet == live.columns.toSet + "sf_key",
        s"$name: pin schema ${pinned.columns.sorted.mkString(",")} does not " +
          s"match live query + sf_key — regenerate the goldens")
      // the oracle's sf_key slicing must be able to select a slice
      assert(pinned.select("sf_key").distinct().count() == 3,
        s"$name: pin must carry all 3 shipped scale factors")
    }
  }
}
