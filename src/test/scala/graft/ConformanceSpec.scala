package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conformance edge cases ported from the reference's connector test
  * suite (TestLanceConnectorTest / BaseLanceConnectorTest) — behaviors a
  * user switching engines would notice. */
class ConformanceSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-conf-wh").toString
    spark.conf.set("spark.sql.catalog.cf", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cf.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cf.db")
    dir
  }

  private def mkRegion(): Unit = {
    spark.sql("DROP TABLE IF EXISTS cf.db.region")
    spark.sql(
      """CREATE TABLE cf.db.region AS
        |SELECT * FROM VALUES
        |  (0, 'AFRICA'), (1, 'AMERICA'), (2, 'ASIA'),
        |  (3, 'EUROPE'), (4, 'MIDDLE EAST')
        |AS t(regionkey, name)""".stripMargin)
  }

  // reference: TestLanceConnectorTest.java:289-299 testFilteredLimitQueries
  test("filtered LIMIT queries return correct rows") {
    wh; mkRegion()
    assert(spark.sql(
      "SELECT name FROM cf.db.region WHERE regionkey = 2 LIMIT 10")
      .head.getString(0) == "ASIA")
    assert(spark.sql(
      "SELECT name FROM cf.db.region WHERE regionkey >= 0 LIMIT 1").count() == 1)
    assert(spark.sql(
      "SELECT name FROM cf.db.region WHERE regionkey >= 0 LIMIT 10").count() == 5)
    assert(spark.sql(
      "SELECT name FROM cf.db.region WHERE regionkey >= 0 LIMIT 100").count() == 5)
  }

  // reference: TestLanceConnectorTest.java:301-306 — a LIMIT above an
  // aggregate with a filter must not short-circuit the scan
  test("count with filter and LIMIT is not limit-short-circuited") {
    wh; mkRegion()
    val limited = spark.sql(
      "SELECT count(name) FROM cf.db.region WHERE name > '' LIMIT 1")
      .head.getLong(0)
    val full = spark.sql(
      "SELECT count(name) FROM cf.db.region WHERE name > ''")
      .head.getLong(0)
    assert(limited == full && full == 5L)
  }

  // reference: TestLanceConnectorTest.java:495-576 large-utf8 roundtrip
  test("huge string values roundtrip exactly") {
    wh
    spark.sql("DROP TABLE IF EXISTS cf.db.big")
    spark.sql(
      """CREATE TABLE cf.db.big AS
        |SELECT id, repeat(concat('payload-', CAST(id AS STRING), '-'),
        |  200000) AS big_text
        |FROM range(0, 5, 1, 1)""".stripMargin)
    val rows = spark.table("cf.db.big").orderBy("id")
      .select(col("id"), length(col("big_text")).as("len"),
        substring(col("big_text"), 1, 20).as("head"))
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == s"payload-$id-".length * 200000, s"id=$id")
      assert(r.getString(2).startsWith(s"payload-$id-"))
    }
  }

  // reference: BaseLanceConnectorTest.java:174-180 — dotted column names
  // are rejected, in CREATE TABLE and CTAS alike
  test("column names containing dots are rejected") {
    wh
    def rootMsgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + rootMsgs(t.getCause)
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE cf.db.dotted (`a.b` BIGINT)")
    }
    assert(rootMsgs(e1).contains("dots"))
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE cf.db.dotted2 AS SELECT 1 AS `x.y`")
    }
    assert(rootMsgs(e2).contains("dots"))
  }
}
