package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pluggable media-decode seam for the multimodal pipeline (m01): the
  * actual codecs (image decode, audio resample, video frame extraction)
  * are deployment-specific and not present in every environment, so
  * they plug in via `ServiceLoader` — drop a jar with a [[MediaDecoder]]
  * implementation and a `META-INF/services/graft.operators.MediaDecoder`
  * entry on the executor classpath, then select it with
  *
  *   spark.graft.multimodal.decoder = <codec name>
  *
  * The operator resolves the decoder PER PARTITION on the executor and
  * reuses one instance across the batch — the shape a real codec needs
  * (native handles, arena allocators) and the reason the seam is an
  * interface rather than a serialized closure.
  *
  * Implementations must be deterministic pure functions of the payload
  * for the correctness gate to pin their output.
  */
trait MediaDecoder extends Serializable {

  /** Codec name this decoder serves (matched against the session conf). */
  def codec: String

  /** Decode one payload into a [[MediaDecoder.featureSchema]] row. */
  def decode(docId: Long, payload: Array[Byte]): Row
}

object MediaDecoder {

  /** Session conf selecting the decoder; default is the built-in stub. */
  val DecoderConf = "spark.graft.multimodal.decoder"
  val DefaultCodec = "stub"

  /** Typed output contract every decoder fills. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Resolve `codec` through ServiceLoader. Called executor-side, once
    * per partition; implementations are listed in
    * `META-INF/services/graft.operators.MediaDecoder`. */
  def resolve(codec: String): MediaDecoder = {
    import scala.jdk.CollectionConverters._
    // context classloader first: it is the one Spark points at the full
    // user classpath on executors (and the test layer under sbt)
    val cl = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(classOf[MediaDecoder].getClassLoader)
    val found = java.util.ServiceLoader
      .load(classOf[MediaDecoder], cl)
      .iterator().asScala.toSeq
    found.find(_.codec == codec).getOrElse(
      throw new IllegalArgumentException(
        s"no MediaDecoder for codec '$codec' on the classpath " +
          s"(available: ${found.map(_.codec).sorted.mkString(", ")})"))
  }
}

/** ======== DECODE STUB ========
  * The default decoder: stands in for image decode / resize / frame
  * sampling with a deterministic pure function of the payload bytes, so
  * results are reproducible and golden-pinnable. A real implementation
  * would call its codec here, per partition, reusing this instance
  * across the batch. */
final class StubMediaDecoder extends MediaDecoder {
  override def codec: String = MediaDecoder.DefaultCodec

  override def decode(docId: Long, bytes: Array[Byte]): Row = {
    val len = bytes.length
    var sum = 0L
    var i = 0
    while (i < len) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (len == 0) 0.0 else sum.toDouble / len
    // "dimensions" derived from content hash; "frames" = 16-byte blocks
    val h = graft.functions.TextHashing.polyHash64(bytes)
    Row(docId, len.toLong,
      (math.abs(h % 1920) + 1).toInt,
      (math.abs((h >> 16) % 1080) + 1).toInt,
      math.rint(mean * 10000) / 10000,
      (len + 15) / 16)
  }
}
