package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.Q

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted inside
  * `mapPartitions` (the Scala analog of a Pandas-UDF batch stage).
  *
  * The actual media codecs are NOT in this container: the decode step
  * goes through the pluggable [[MediaDecoder]] ServiceLoader seam, whose
  * default is a clearly-marked deterministic stub
  * ([[StubMediaDecoder]]) — what is real and tested is everything
  * Spark-side: the binary payload schema, the per-partition batch
  * iteration (no row-at-a-time UDF boxing), the typed feature
  * StructType output, and the partition-parallel shape that holds with
  * a real decoder at 100 TB (each partition decodes its own batch;
  * nothing collects to the driver).
  */
object MultimodalOps {

  /** Feature extraction over (doc_id, payload) rows through the decoder
    * selected by `spark.graft.multimodal.decoder` — resolved PER
    * PARTITION executor-side, one instance reused across the batch. */
  def decodeFeatures(s: SparkSession, payloads: DataFrame): DataFrame =
    decodeFeatures(payloads,
      s.conf.get(MediaDecoder.DecoderConf, MediaDecoder.DefaultCodec))

  /** Explicit-codec variant for pipelines that mix decoders (and for
    * queries that must not depend on mutable session conf). */
  def decodeFeatures(payloads: DataFrame, codec: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(MediaDecoder.featureSchema)
    payloads.mapPartitions { rows =>
      val decoder = MediaDecoder.resolve(codec)
      rows.map(r => decoder.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(enc)
  }

  /** Binary payload table: documents' text re-encoded as opaque bytes
    * (the stand-in for an image/audio column with blob semantics). */
  def payloads(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  val all: Seq[Q] = Seq(

    // Batch feature extraction over binary payloads via mapPartitions.
    // Golden-pinned: the default stub decoder is a pure per-row
    // function, so its output is bit-stable regardless of partitioning.
    Q.golden("m01_multimodal_features",
      Seq("doc_id", "byte_len", "width", "height", "mean_byte", "n_frames"),
      "doc_id",
      "pluggable decoder seam -> typed features, partition-parallel") { (s, d) =>
      decodeFeatures(s, payloads(s, d)).orderBy("doc_id")
    },

    // Frame sampling: the 1->N explode shape of video frame extraction.
    // The payload is treated as a sequence of 16-byte "frames"; every
    // 4th frame is sampled (uniform temporal sampling) and emitted with
    // typed per-frame metadata. All slicing/digesting uses codegen'd
    // builtins (sequence + explode + substring + md5) — no UDF, stays
    // inside whole-stage codegen; a real codec would swap the substring
    // for a decoder call at the same batch shape. Oracle-exact: DuckDB
    // computes identical chunks from the same text.
    Q("m03_frame_sample",
      """SELECT doc_id, t.i AS frame_no,
        |  length(substring(text, t.i * 16 + 1, 16)) AS frame_size,
        |  substr(md5(substring(text, t.i * 16 + 1, 16)), 1, 8) AS digest8
        |FROM documents CROSS JOIN range(0, 512) AS t(i)
        |WHERE t.i % 4 = 0
        |  AND t.i < CAST(ceil(length(text) / 16.0) AS INT)
        |ORDER BY doc_id, frame_no""".stripMargin,
      "every 4th 16-byte frame sampled with typed per-frame metadata") { (s, d) =>
      Tables.load(s, d, "documents")
        .withColumn("n_frames", ceil(length(col("text")) / 16.0).cast("int"))
        .filter(col("n_frames") > 0)
        .withColumn("frame_no",
          explode(sequence(lit(0), col("n_frames") - 1, lit(4))))
        .withColumn("frame",
          expr("substring(text, frame_no * 16 + 1, 16)"))
        .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
          length(col("frame")).cast("long").as("frame_size"),
          substring(md5(col("frame")), 1, 8).as("digest8"))
        .orderBy("doc_id", "frame_no")
    },

    // REAL codec through the same seam: documents rendered as actual
    // 24-bit BMP images (dimensions and pixels derived deterministically
    // from doc_id/text), decoded by the ServiceLoader-registered
    // BmpMediaDecoder parsing genuine header + pixel data — the proof
    // that a dropped-in codec jar runs the identical partition-parallel
    // path as the stub. Golden-pinned: encode and decode are pure
    // per-row functions, bit-stable across partitionings.
    Q.golden("m04_bmp_decode",
      Seq("doc_id", "byte_len", "width", "height", "mean_byte", "n_frames"),
      "doc_id",
      "real BMP codec via the decoder seam: encode docs as images, parse pixels") { (s, d) =>
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
        StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("payload", BinaryType, nullable = false))))
      val bmps = Tables.load(s, d, "documents").select("doc_id", "text")
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val txt = r.getString(1).getBytes("UTF-8")
            val w = 4 + (id % 13).toInt
            val h = 3 + (id % 11).toInt
            val rgb = Array.tabulate(w * h * 3)(i =>
              if (txt.isEmpty) 0.toByte else txt(i % txt.length))
            Row(id, BmpCodec.encode24(w, h, rgb))
          }
        }(enc)
      decodeFeatures(bmps, "bmp").orderBy("doc_id")
    },

    // REAL compressed-image codec through the same seam: documents
    // rendered as actual zlib-deflated PNGs — filter type rotates over
    // all five per doc (id % 5), so the gate drives the decoder's full
    // Sub/Up/Average/Paeth unfilter surface, not just a flat byte walk
    // like BMP. Golden-pinned: deflate/inflate and the filter math are
    // bit-stable pure per-row functions.
    Q.golden("m06_png_decode",
      Seq("doc_id", "byte_len", "width", "height", "mean_byte", "n_frames"),
      "doc_id",
      "real PNG codec via the decoder seam: deflated + filtered scanlines") { (s, d) =>
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
        StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("payload", BinaryType, nullable = false))))
      val pngs = Tables.load(s, d, "documents").select("doc_id", "text")
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val txt = r.getString(1).getBytes("UTF-8")
            val w = 4 + (id % 13).toInt
            val h = 3 + (id % 11).toInt
            val rgb = Array.tabulate(w * h * 3)(i =>
              if (txt.isEmpty) 0.toByte else txt(i % txt.length))
            Row(id, PngCodec.encodeRGB(w, h, rgb, (id % 5).toInt))
          }
        }(enc)
      decodeFeatures(pngs, "png").orderBy("doc_id")
    },

    // REAL audio codec through the same seam: documents rendered as
    // actual 16-bit PCM WAV clips (rate/channels/samples derived
    // deterministically from doc_id/text), decoded by the
    // ServiceLoader-registered WavMediaDecoder walking genuine RIFF
    // chunks and sample frames — the audio half of the jar-drop proof
    // (m04 is the image half). Golden-pinned: encode and decode are
    // pure per-row functions, bit-stable across partitionings.
    Q.golden("m05_wav_decode",
      Seq("doc_id", "byte_len", "width", "height", "mean_byte", "n_frames"),
      "doc_id",
      "real WAV codec via the decoder seam: encode docs as PCM audio, parse frames") { (s, d) =>
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
        StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("payload", BinaryType, nullable = false))))
      val wavs = Tables.load(s, d, "documents").select("doc_id", "text")
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val txt = r.getString(1).getBytes("UTF-8")
            val rate = 8000 * (1 + (id % 3).toInt) // 8/16/24 kHz
            val channels = 1 + (id % 2).toInt
            val frames = 64 + (id % 101).toInt
            val samples = Array.tabulate[Short](frames * channels) { i =>
              val b = if (txt.isEmpty) 0 else txt(i % txt.length) & 0xff
              (((b - 128) * (1 + i % 7)) * 16).toShort
            }
            Row(id, WavCodec.encode16(rate, channels, samples))
          }
        }(enc)
      decodeFeatures(wavs, "wav").orderBy("doc_id")
    },

    // Blob-style virtual metadata columns without materializing content:
    // byte length + content digest are computable from the payload
    // column alone (the reference exposes <col>__blob_pos/__blob_size
    // virtual columns the same way, BlobUtils.java:26-27).
    Q("m02_blob_metadata",
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS blob_size,
        |  substr(md5(text), 1, 8) AS digest8
        |FROM documents
        |WHERE octet_length(CAST(text AS BLOB)) > 200
        |ORDER BY doc_id""".stripMargin,
      "blob virtual metadata: size + digest, filtered without decode") { (s, d) =>
      payloads(s, d)
        .withColumn("blob_size", length(col("payload")).cast("long"))
        .filter(col("blob_size") > 200)
        .select(col("doc_id"), col("blob_size"),
          substring(md5(col("payload")), 1, 8).as("digest8"))
        .orderBy("doc_id")
    }
  )
}
