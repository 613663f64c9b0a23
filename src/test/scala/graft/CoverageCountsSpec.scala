package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.scalatest.Suite
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Q

/** Ends the COVERAGE.md count-drift class of bug permanently: the
  * documented gate/test counts are recomputed here from ground truth —
  * [[SparkEntry.queries]] for the gate, ScalaTest discovery over the
  * compiled test classes for the suite/test totals — and `sbt test`
  * fails if COVERAGE.md's header says anything else. The failure
  * message contains the exact replacement lines, so fixing drift is a
  * paste.
  */
class CoverageCountsSpec extends AnyFunSuite {

  private def computedQueryCounts: (Int, Int, Int) = {
    val total = SparkEntry.queries.size
    val golden = SparkEntry.oracleSql.values.count(_.contains(Q.GoldenDir))
    val sql = SparkEntry.oracleSql.size - golden
    // every query must carry an oracle of one kind or the other — the
    // gate has zero weaker rows-only checks and this keeps it that way
    assert(SparkEntry.oracleSql.size == total,
      s"rows-only queries crept in: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}")
    (total, sql, golden)
  }

  /** Discover every concrete Suite under target/.../test-classes/graft
    * and sum registered test names — the same totals `sbt test` prints. */
  private def computedTestCounts: (Int, Int) = {
    val dir = new File("target/scala-2.13/test-classes/graft")
    assert(dir.isDirectory, s"compiled test classes missing at $dir")
    val names = dir.listFiles()
      .map(_.getName)
      .filter(n => n.endsWith(".class") && !n.contains("$"))
      .map(n => "graft." + n.stripSuffix(".class"))
      .sorted
    val suites = names.flatMap { cn =>
      val cls = Class.forName(cn)
      if (classOf[Suite].isAssignableFrom(cls) &&
          !java.lang.reflect.Modifier.isAbstract(cls.getModifiers))
        Some(cls.getDeclaredConstructor().newInstance().asInstanceOf[Suite])
      else None
    }
    (suites.map(_.testNames.size).sum, suites.length)
  }

  /** r13 VERDICT #7: the header counts were spec-enforced but the
    * per-row oracle-TYPE claims were not, and v03's row said
    * "rows-only" for a round after it was upgraded to golden-pinned.
    * Recompute each gate query's oracle type from its declaration
    * (SQL oracle vs golden slice vs none) and fail on any COVERAGE.md
    * line whose claim contradicts it. */
  test("COVERAGE.md oracle-type claims match the Q declarations") {
    val goldenShort = SparkEntry.oracleSql
      .filter(_._2.contains(Q.GoldenDir)).keySet.map(_.take(3))
    val sqlShort = SparkEntry.oracleSql
      .filterNot(_._2.contains(Q.GoldenDir)).keySet.map(_.take(3))
    val idRe = raw"\b([gmqstv]\d{2})\b".r
    val lines = Files.readAllLines(Paths.get("COVERAGE.md"))
    val bad = new scala.collection.mutable.ListBuffer[String]
    lines.forEach { line =>
      val ids = idRe.findAllMatchIn(line).map(_.group(1)).toSet
      // the gate carries zero rows-only queries (asserted above), so
      // the claim may only appear in the header's "Zero rows-only"
      // sentence — any table row claiming it is drift
      if (line.contains("rows-only") && !line.contains("Zero rows-only"))
        bad += s"claims rows-only (no such query exists): $line"
      if (line.contains("golden-pinned"))
        (ids & sqlShort).foreach(id =>
          bad += s"claims golden-pinned but $id has a SQL oracle: $line")
      if (line.contains("DuckDB-exact") || line.contains("oracle-exact"))
        (ids & goldenShort).foreach(id =>
          bad += s"claims a DuckDB SQL oracle but $id is golden-pinned: $line")
    }
    assert(bad.isEmpty, bad.mkString(
      "COVERAGE.md oracle-type claims drifted from the Q declarations:\n  ",
      "\n  ", ""))
  }

  test("COVERAGE.md header counts match ground truth") {
    val (total, sql, golden) = computedQueryCounts
    val (tests, suiteCount) = computedTestCounts
    val doc = new String(
      Files.readAllBytes(Paths.get("COVERAGE.md")), "UTF-8")

    val wantGate = s"**$total/$total queries oracle-backed** — $sql SQL-oracle + $golden"
    val wantTests = s"$tests ScalaTest tests across $suiteCount suites"

    val gateRe = raw"\*\*(\d+)/(\d+) queries oracle-backed\*\* — (\d+)\s+SQL-oracle \+ (\d+)".r
    val testsRe = raw"(\d+) ScalaTest tests across (\d+) suites".r

    val gateDoc = gateRe.findFirstIn(doc.replace('\n', ' '))
    val testsDoc = testsRe.findFirstIn(doc)

    assert(gateDoc.contains(wantGate) && testsDoc.contains(wantTests),
      s"""COVERAGE.md counts drifted from ground truth.
         |  documented gate line : ${gateDoc.getOrElse("<missing>")}
         |  actual gate line     : $wantGate
         |  documented test line : ${testsDoc.getOrElse("<missing>")}
         |  actual test line     : $wantTests
         |Paste the actual lines into COVERAGE.md's header.""".stripMargin)
  }
}
