package graft.operators

import org.apache.spark.sql.Row

/** Minimal BMP (BITMAPINFOHEADER, uncompressed BI_RGB, 24/32-bit)
  * encode + decode in pure JVM code — the REAL codec behind the
  * [[MediaDecoder]] ServiceLoader seam, proving the jar-drop story end
  * to end without native image libraries: `BmpMediaDecoder` is selected
  * with `spark.graft.multimodal.decoder=bmp` and parses actual pixel
  * data (the m04 gate query pins its output; the decoder-swap spec
  * cross-checks the parse against the JDK's own ImageIO BMP reader).
  *
  * Layout (little-endian): 14-byte file header (`BM`, file size, pixel
  * data offset at byte 10), 40-byte DIB header (width at 18, height at
  * 22 — negative means top-down, bits-per-pixel at 28, compression at
  * 30), then pixel rows bottom-up (unless top-down), BGR(A) order, each
  * 24-bit row padded to a 4-byte boundary. */
object BmpCodec {

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte
    b(off + 3) = (v >> 24).toByte
  }

  private def intLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def shortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode `rgb` (row-major top-down, 3 bytes/pixel R,G,B) as a
    * standard bottom-up 24-bit uncompressed BMP. */
  def encode24(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"need ${width * height * 3} rgb bytes, got ${rgb.length}")
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, out.length)
    putIntLE(out, 10, 54)
    putIntLE(out, 14, 40)
    putIntLE(out, 18, width)
    putIntLE(out, 22, height) // positive: bottom-up
    out(26) = 1 // planes
    out(28) = 24 // bits per pixel
    putIntLE(out, 34, dataSize)
    putIntLE(out, 38, 2835); putIntLE(out, 42, 2835) // 72 dpi
    var y = 0
    while (y < height) {
      val destRow = 54 + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val src = (y * width + x) * 3
        out(destRow + x * 3) = rgb(src + 2) // B
        out(destRow + x * 3 + 1) = rgb(src + 1) // G
        out(destRow + x * 3 + 2) = rgb(src) // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parsed header + channel statistics of an uncompressed 24/32-bit
    * BMP: (width, height, mean over pixel channel bytes — row padding
    * excluded). Throws on anything malformed. */
  def decode(bytes: Array[Byte]): (Int, Int, Double) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload (missing BM magic or truncated header)")
    val dataOffset = intLE(bytes, 10)
    val width = intLE(bytes, 18)
    val heightRaw = intLE(bytes, 22)
    val height = math.abs(heightRaw)
    val bpp = shortLE(bytes, 28)
    val compression = intLE(bytes, 30)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$heightRaw")
    require(bpp == 24 || bpp == 32, s"unsupported bit depth $bpp")
    require(compression == 0, s"unsupported compression $compression (BI_RGB only)")
    val channels = bpp / 8
    val rowSize = (width * channels + 3) / 4 * 4
    require(dataOffset.toLong + rowSize.toLong * height <= bytes.length,
      "pixel data truncated")
    var sum = 0L
    var y = 0
    while (y < height) {
      val row = dataOffset + y * rowSize
      var i = 0
      val rowBytes = width * channels
      while (i < rowBytes) { sum += bytes(row + i) & 0xff; i += 1 }
      y += 1
    }
    val mean = sum.toDouble / (width.toLong * height * channels)
    (width, height, math.rint(mean * 10000) / 10000)
  }
}

/** ServiceLoader-registered real decoder: parses actual BMP pixel data.
  * `n_frames` is 1 — a still image. Select with
  * `spark.graft.multimodal.decoder=bmp`. */
final class BmpMediaDecoder extends MediaDecoder {
  override def codec: String = "bmp"

  override def decode(docId: Long, bytes: Array[Byte]): Row = {
    val (w, h, mean) = BmpCodec.decode(bytes)
    Row(docId, bytes.length.toLong, w, h, mean, 1)
  }
}
