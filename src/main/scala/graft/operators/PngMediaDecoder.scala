package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.Row

/** Minimal PNG (non-interlaced, 8-bit truecolor RGB / RGBA) encode +
  * decode in pure JVM code — the third REAL codec behind the
  * [[MediaDecoder]] ServiceLoader seam (m04 = BMP, m05 = WAV), and the
  * first compressed one: IDAT streams are zlib-deflated and every
  * scanline carries one of the five PNG filter types, so the decoder
  * exercises `java.util.zip.Inflater` plus the full Sub/Up/Average/
  * Paeth unfilter path rather than a flat byte walk. Selected with
  * `spark.graft.multimodal.decoder=png`; the decoder-swap spec
  * cross-checks the parse against the JDK's own ImageIO PNG reader.
  *
  * Layout (big-endian lengths/ints): 8-byte signature, then chunks of
  * `len | type | data | crc32(type+data)`. IHDR carries width, height,
  * bit depth, color type (2 = RGB, 6 = RGBA), compression(0),
  * filter(0), interlace(0). Pixel data = concat of all IDAT payloads,
  * inflated to `height * (1 + width*channels)` bytes: each scanline is
  * one filter-type byte followed by the filtered bytes. */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def putIntBE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte
    b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte
    b(off + 3) = v.toByte
  }

  private def intBE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    putIntBE(out, 0, data.length)
    val t = typ.getBytes("US-ASCII")
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new CRC32()
    crc.update(out, 4, 4 + data.length)
    putIntBE(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  /** The Paeth predictor (PNG spec 9.4): nearest of left/up/up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode row-major top-down RGB (3 bytes/pixel) as a non-interlaced
    * 8-bit truecolor PNG, filtering EVERY scanline with `filterType`
    * (0=None 1=Sub 2=Up 3=Average 4=Paeth) — encoding under a non-zero
    * filter makes a decode roundtrip prove that unfilter branch. */
  def encodeRGB(width: Int, height: Int, rgb: Array[Byte],
      filterType: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"need ${width * height * 3} rgb bytes, got ${rgb.length}")
    require(filterType >= 0 && filterType <= 4, s"bad filter $filterType")
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val rowOut = y * (1 + stride)
      raw(rowOut) = filterType.toByte
      var i = 0
      while (i < stride) {
        val cur = rgb(y * stride + i) & 0xff
        val left = if (i >= bpp) rgb(y * stride + i - bpp) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val upLeft =
          if (y > 0 && i >= bpp) rgb((y - 1) * stride + i - bpp) & 0xff else 0
        val filtered = filterType match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(rowOut + 1 + i) = filtered.toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](math.max(64, raw.length + raw.length / 2 + 64))
    val outBytes = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      outBytes.write(buf, 0, n)
    }
    deflater.end()
    val ihdr = new Array[Byte](13)
    putIntBE(ihdr, 0, width)
    putIntBE(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // compression, filter method, interlace all 0
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", outBytes.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Parsed header + pixel statistics of a non-interlaced 8-bit
    * RGB/RGBA PNG: (width, height, channels, mean over unfiltered pixel
    * bytes). Throws on anything malformed or unsupported. */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    require(bytes.length >= Signature.length + 12 &&
      Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not a PNG payload (missing signature or truncated)")
    var off = Signature.length
    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(off + 12 <= bytes.length, "truncated chunk header")
      val len = intBE(bytes, off)
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"truncated chunk body (len $len at offset $off)")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      // every chunk's stored CRC32(type+data) must verify — a
      // bit-corrupted payload must throw, never silently decode to
      // wrong features (ancillary chunks included: their CRC is part
      // of the container's integrity contract)
      locally {
        val crc = new CRC32()
        crc.update(bytes, off + 4, 4 + len)
        val stored = intBE(bytes, off + 8 + len)
        require(crc.getValue.toInt == stored,
          f"CRC mismatch in $typ chunk at offset $off%d")
      }
      typ match {
        case "IHDR" =>
          require(!seenIhdr && len == 13, "bad IHDR")
          width = intBE(bytes, off + 8)
          height = intBE(bytes, off + 12)
          val bitDepth = bytes(off + 16) & 0xff
          val colorType = bytes(off + 17) & 0xff
          val compression = bytes(off + 18) & 0xff
          val filterMethod = bytes(off + 19) & 0xff
          val interlace = bytes(off + 20) & 0xff
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          // bound the plane size so stride/buffer math cannot overflow
          // Int — a crafted IHDR must throw, never fabricate features
          require(width < (1 << 24) && height < (1 << 24) &&
            width.toLong * height * 4 < Int.MaxValue - (1 << 24),
            s"implausible dimensions ${width}x$height")
          require(bitDepth == 8, s"unsupported bit depth $bitDepth")
          require(colorType == 2 || colorType == 6,
            s"unsupported color type $colorType (8-bit RGB/RGBA only)")
          require(compression == 0, s"unsupported compression $compression")
          require(filterMethod == 0, s"unsupported filter method $filterMethod")
          require(interlace == 0, "interlaced PNG unsupported")
          channels = if (colorType == 2) 3 else 4
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, off + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    require(seenIhdr, "missing IHDR")
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var filled = 0
    while (filled < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, filled, raw.length - filled)
      require(n > 0 || inflater.finished(),
        "bad IDAT stream (dictionary or truncation)")
      filled += n
    }
    inflater.end()
    require(filled == raw.length,
      s"pixel data truncated: $filled of ${raw.length} bytes")
    // unfilter in place (scanline prefix bytes excluded from the mean)
    var sum = 0L
    var y = 0
    while (y < height) {
      val rowOff = y * (1 + stride)
      val filter = raw(rowOff) & 0xff
      require(filter <= 4, s"bad filter type $filter in row $y")
      var i = 0
      while (i < stride) {
        val x = raw(rowOff + 1 + i) & 0xff
        val left =
          if (i >= channels) raw(rowOff + 1 + i - channels) & 0xff else 0
        val up = if (y > 0) raw(rowOff - stride + i) & 0xff else 0
        val upLeft =
          if (y > 0 && i >= channels) raw(rowOff - stride + i - channels) & 0xff
          else 0
        val recon = filter match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => x + paeth(left, up, upLeft)
        }
        // in place: row y-1's data byte i sits at exactly
        // (y-1)*(1+stride) + 1 + i = rowOff - stride + i, which is what
        // the `up`/`upLeft` reads above resolve to — already
        // reconstructed by the time row y runs
        raw(rowOff + 1 + i) = recon.toByte
        sum += recon & 0xff
        i += 1
      }
      y += 1
    }
    val mean = sum.toDouble / (height.toLong * stride)
    (width, height, channels, math.rint(mean * 10000) / 10000)
  }
}

/** ServiceLoader-registered real decoder: inflates and unfilters actual
  * PNG scanlines. `n_frames` is 1 — a still image. Select with
  * `spark.graft.multimodal.decoder=png`. */
final class PngMediaDecoder extends MediaDecoder {
  override def codec: String = "png"

  override def decode(docId: Long, bytes: Array[Byte]): Row = {
    val (w, h, _, mean) = PngCodec.decode(bytes)
    Row(docId, bytes.length.toLong, w, h, mean, 1)
  }
}
