package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraftOps

class GraftOpsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-ops-wh").toString
    spark.conf.set("spark.sql.catalog.go", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.go.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS go.db")
    dir
  }

  test("UPDATE rewrites matched rows in one commit; history preserved") {
    wh
    spark.sql("DROP TABLE IF EXISTS go.db.u")
    spark.sql("CREATE TABLE go.db.u (k BIGINT, v STRING, amt DOUBLE)")
    spark.sql(
      "INSERT INTO go.db.u VALUES (1,'a',10.0), (2,'b',20.0), (3,'a',30.0)")
    val dir = Paths.get(wh, "db", "u.graft")

    val n = GraftOps.update(spark, dir,
      col("v") === "a", Map("amt" -> (col("amt") * 2)))
    assert(n == 2)

    val rows = spark.table("go.db.u").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.sameElements(Array((1L, "a", 20.0), (2L, "b", 20.0), (3L, "a", 60.0))))
    // count stays stable (delete+insert balanced)
    assert(spark.table("go.db.u").count() == 3)
    // prior version still shows original values
    val old = spark.sql("SELECT * FROM go.db.u VERSION AS OF 2")
      .orderBy("k").collect().map(_.getDouble(2))
    assert(old.sameElements(Array(10.0, 20.0, 30.0)))
  }

  test("UPDATE on already-updated rows uses latest values (no lost update)") {
    wh
    val dir = Paths.get(wh, "db", "u.graft")
    GraftOps.update(spark, dir, col("k") === 1, Map("amt" -> lit(100.0)))
    GraftOps.update(spark, dir, col("k") === 1, Map("amt" -> (col("amt") + 1)))
    val amt = spark.table("go.db.u").filter(col("k") === 1)
      .head.getDouble(2)
    assert(amt == 101.0)
  }

  test("MERGE: matched update + not-matched insert, atomically") {
    wh
    spark.sql("DROP TABLE IF EXISTS go.db.m")
    spark.sql("CREATE TABLE go.db.m (k BIGINT, v STRING)")
    spark.sql("INSERT INTO go.db.m VALUES (1,'old1'), (2,'old2')")
    val dir = Paths.get(wh, "db", "m.graft")

    import spark.implicits._
    val source = Seq((2L, "new2"), (3L, "new3")).toDF("sk", "sv")

    val (updated, inserted) = GraftOps.merge(spark, dir,
      source,
      on = col("t.k") === col("s.sk"),
      whenMatched = Some(Map("v" -> col("s.sv"))),
      whenNotMatched = Some(Map("k" -> col("s.sk"), "v" -> col("s.sv"))))
    assert(updated == 1 && inserted == 1)

    val rows = spark.table("go.db.m").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sameElements(Array((1L, "old1"), (2L, "new2"), (3L, "new3"))))
  }

  test("MERGE with delete-when-matched removes rows") {
    wh
    val dir = Paths.get(wh, "db", "m.graft")
    import spark.implicits._
    val source = Seq(Tuple1(1L)).toDF("sk")
    val (updated, inserted) = GraftOps.merge(spark, dir,
      source,
      on = col("t.k") === col("s.sk"),
      whenMatched = None, // delete matched
      whenNotMatched = None)
    assert(updated == 1 && inserted == 0)
    assert(spark.table("go.db.m").orderBy("k").collect()
      .map(_.getLong(0)).sameElements(Array(2L, 3L)))
  }
}
