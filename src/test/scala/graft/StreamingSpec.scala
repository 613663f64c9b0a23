package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("graft table streams: versions are micro-batch offsets") {
    val wh = Files.createTempDirectory("graft-stream-wh").toString
    spark.conf.set("spark.sql.catalog.gs", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs.db")
    spark.sql("CREATE TABLE gs.db.ev (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gs.db.ev VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gs.db.ev VALUES (3, 'c')")

    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    def runOnce(): Unit = {
      val q = spark.readStream.table("gs.db.ev")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    val first = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(first.sameElements(Array(1L, 2L, 3L)),
      s"first run should stream existing rows, got ${first.mkString(",")}")

    // append more rows; a new AvailableNow run from the same checkpoint
    // must see ONLY the new fragments (offset = manifest version) — no
    // re-delivery of already-streamed fragments
    spark.sql("INSERT INTO gs.db.ev VALUES (4, 'd'), (5, 'd')")
    runOnce()
    val all = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(all.sameElements(Array(1L, 2L, 3L, 4L, 5L)),
      s"expected exactly-once delivery of all rows, got ${all.mkString(",")}")
  }

  test("graft streaming SINK: stream graft->graft with per-epoch commits") {
    val wh = Files.createTempDirectory("graft-sink-wh").toString
    spark.conf.set("spark.sql.catalog.gk", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gk.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gk.db")
    spark.sql("CREATE TABLE gk.db.src (k BIGINT, v STRING)")
    spark.sql("CREATE TABLE gk.db.dst (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gk.db.src VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gk.db.src VALUES (3, 'c')")

    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.table("gk.db.src")
        .withColumn("v", upper(col("v")))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("gk.db.dst")
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.table("gk.db.dst").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "A"), (2L, "B"), (3L, "C")))

    // incremental: new source rows flow through; dst versions advance by
    // exactly the committed epochs, stamped with the epoch property
    spark.sql("INSERT INTO gk.db.src VALUES (4, 'd')")
    runOnce()
    assert(spark.table("gk.db.dst").count() == 4)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val dir = new org.apache.hadoop.fs.Path(
      java.nio.file.Paths.get(wh, "db", "dst.graft").toUri)
    val m = graft.format.GraftFormat.readLatest(fs, dir).get
    assert(m.operation == "Append")
    assert(m.properties.keys.exists(_.startsWith("stream_epoch.")),
      "epoch idempotence marker missing from manifest")
    // the sink table is a normal graft table: DML + time travel work on it
    spark.sql("DELETE FROM gk.db.dst WHERE k = 1")
    assert(spark.table("gk.db.dst").count() == 3)
  }

  test("multimodal feature extraction is deterministic and complete") {
    val df = SparkEntry.queries("m01_multimodal_features")(spark, sf)
    val rows = df.collect()
    assert(rows.length == Tables.load(spark, sf, "documents").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("byte_len") > 0)
      assert(r.getAs[Double]("mean_byte") > 0)
      assert(r.getAs[Int]("n_frames") ==
        ((r.getAs[Long]("byte_len") + 15) / 16).toInt)
    }
    // determinism across runs
    val again = SparkEntry.queries("m01_multimodal_features")(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }
}
