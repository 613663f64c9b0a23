package graft.operators

import org.apache.spark.sql.Row

/** Minimal RIFF/WAVE PCM (16-bit, format tag 1) encode + decode in pure
  * JVM code — the AUDIO codec behind the [[MediaDecoder]] ServiceLoader
  * seam, complementing [[BmpCodec]] on the image side: together they
  * prove the jar-drop story for both media kinds without native
  * libraries. `WavMediaDecoder` is selected with
  * `spark.graft.multimodal.decoder=wav` and parses actual sample data
  * (the m05 gate query pins its output; the decoder-swap spec
  * cross-checks the parse against the JDK's own javax.sound WAV reader).
  *
  * Layout (little-endian): 12-byte RIFF header (`RIFF`, riff size,
  * `WAVE`), then chunks — each an ASCII id + 4-byte size + payload
  * padded to an even boundary. `fmt ` carries (formatTag, channels,
  * sampleRate, byteRate, blockAlign, bitsPerSample); `data` carries
  * interleaved frames. Unknown chunks (LIST, fact, ...) are skipped.
  *
  * Feature mapping into [[MediaDecoder.featureSchema]] (image-flavored
  * field names, documented audio semantics): `width` = sample rate,
  * `height` = channel count, `n_frames` = frames (samples per channel),
  * `mean_byte` = mean absolute amplitude scaled from the 16-bit range
  * to the byte range (sum |s| / n / 256, rounded to 4 decimals).
  */
object WavCodec {

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte
    b(off + 3) = (v >> 24).toByte
  }

  private def putShortLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >> 8).toByte
  }

  private def intLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def shortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode interleaved 16-bit PCM `samples` (length = frames ×
    * channels) as a canonical 44-byte-header WAV. */
  def encode16(sampleRate: Int, channels: Int, samples: Array[Short])
      : Array[Byte] = {
    require(sampleRate > 0 && channels > 0 &&
      samples.length % channels == 0,
      s"bad wav spec: rate=$sampleRate ch=$channels n=${samples.length}")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putIntLE(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putIntLE(out, 16, 16) // fmt chunk size
    putShortLE(out, 20, 1) // PCM
    putShortLE(out, 22, channels)
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * channels * 2) // byte rate
    putShortLE(out, 32, channels * 2) // block align
    putShortLE(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putIntLE(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putShortLE(out, 44 + i * 2, samples(i))
      i += 1
    }
    out
  }

  /** Parsed format + amplitude statistics of a 16-bit PCM WAV:
    * (sampleRate, channels, frames, meanAbsAmplitude/256 rounded to 4
    * decimals). Walks the chunk list, so extra chunks (LIST, fact) and
    * any fmt/data order are accepted. Throws on anything malformed. */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    require(bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E',
      "not a WAV payload (missing RIFF/WAVE magic or truncated header)")
    var fmtOff = -1
    var dataOff = -1
    var dataLen = 0
    var off = 12
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = intLE(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk '$id' overruns the payload")
      if (id == "fmt ") fmtOff = off + 8
      else if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1) // chunks pad to even boundaries
    }
    require(fmtOff >= 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val formatTag = shortLE(bytes, fmtOff)
    val channels = shortLE(bytes, fmtOff + 2)
    val sampleRate = intLE(bytes, fmtOff + 4)
    val bps = shortLE(bytes, fmtOff + 14)
    require(formatTag == 1, s"unsupported format tag $formatTag (PCM only)")
    require(bps == 16, s"unsupported bit depth $bps (16-bit only)")
    require(channels > 0 && sampleRate > 0,
      s"bad format: ch=$channels rate=$sampleRate")
    require(dataLen % (channels * 2) == 0,
      s"data size $dataLen not a whole number of $channels-channel frames")
    val n = dataLen / 2
    var sum = 0L
    var i = 0
    while (i < n) {
      val s = shortLE(bytes, dataOff + i * 2).toShort.toInt
      sum += math.abs(s)
      i += 1
    }
    val meanByte =
      if (n == 0) 0.0
      else math.rint(sum.toDouble / n / 256.0 * 10000) / 10000
    (sampleRate, channels, n / channels, meanByte)
  }
}

/** ServiceLoader-registered real audio decoder: parses actual PCM
  * sample data. Select with `spark.graft.multimodal.decoder=wav`. */
final class WavMediaDecoder extends MediaDecoder {
  override def codec: String = "wav"

  override def decode(docId: Long, bytes: Array[Byte]): Row = {
    val (rate, channels, frames, meanByte) = WavCodec.decode(bytes)
    Row(docId, bytes.length.toLong, rate, channels, meanByte, frames)
  }
}
