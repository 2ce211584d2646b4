package graft.multimodal

import java.nio.charset.StandardCharsets

/** Pure-JVM encoders/decoders for four public container formats (JPEG,
  * PNG, BMP, WAV), parsed from their published header layouts — no
  * external codec libraries. The *pixel/sample* payload is not
  * decompressed (PNG IDAT and JPEG entropy-coded data stay opaque); what
  * a curation pipeline needs from 100 TB of media is the typed metadata —
  * dimensions, channels, sample rate, duration — and that lives in the
  * fixed-layout headers parsed here.
  *
  * Layouts: JPEG marker segments + SOF0/SOF2 frame header (ITU T.81
  * §B.2.2), PNG signature + IHDR (RFC 2083 §3 / W3C PNG spec),
  * BITMAPINFOHEADER (Windows BMP), RIFF/WAVE `fmt ` + `data` chunks
  * (Multimedia Programming Interface and Data Specifications 1.0). */
object MediaCodec {

  final case class MediaMeta(format: String, width: Int, height: Int,
      channels: Int, sampleRate: Int, durationMs: Double, ok: Boolean)

  private val Unknown = MediaMeta("unknown", 0, 0, 0, 0, 0.0, ok = false)

  // ── big/little-endian readers ─────────────────────────────────────────
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def wbe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
  private def wle32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }
  private def wle16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Sniff the container from magic bytes and parse its header. */
  def decode(blob: Array[Byte]): MediaMeta = {
    if (blob == null || blob.length < 12) Unknown
    else if (blob.take(8).sameElements(PngSig)) decodePng(blob)
    else if ((blob(0) & 0xff) == 0xff && (blob(1) & 0xff) == 0xd8 &&
      (blob(2) & 0xff) == 0xff) decodeJpeg(blob)
    else if (blob(0) == 'B' && blob(1) == 'M') decodeBmp(blob)
    else if (blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' &&
      blob(3) == 'F' && blob(8) == 'W' && blob(9) == 'A' &&
      blob(10) == 'V' && blob(11) == 'E') decodeWav(blob)
    else Unknown
  }

  /** JPEG (ITU T.81): walk the marker-segment stream from SOI to the
    * first frame header (SOF0 baseline / SOF2 progressive / the other
    * SOFn variants, EXCLUDING the non-frame C4=DHT, C8=JPG, CC=DAC) and
    * read precision/height/width/components from its fixed layout
    * (§B.2.2). Segment lengths are u16be and INCLUDE their own two
    * bytes, so a hostile length < 2 would rewind the cursor — that (and
    * any truncation) aborts to Unknown instead of looping. Standalone
    * markers (TEM, RSTn, SOI, EOI) carry no length; fill 0xFF bytes
    * before a marker are skipped per spec. Scan stops at SOS — after it
    * comes entropy-coded data, and a frame header must precede it. */
  def decodeJpeg(b: Array[Byte]): MediaMeta = {
    var pos = 2L // past SOI
    while (pos + 4 <= b.length) {
      val p = pos.toInt
      if ((b(p) & 0xff) != 0xff) return Unknown // marker must start FF
      var mp = p
      while (mp < b.length - 1 && (b(mp + 1) & 0xff) == 0xff) mp += 1 // fill bytes
      // a blob ENDING in a fill-byte run leaves no marker code to read —
      // without this guard b(mp + 1) would throw, failing the whole
      // partition on one hostile blob
      if (mp + 1 >= b.length) return Unknown
      val marker = b(mp + 1) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
        pos = mp + 2L // standalone marker, no length field
      } else {
        if (mp + 4 > b.length) return Unknown
        val len = (((b(mp + 2) & 0xff) << 8) | (b(mp + 3) & 0xff)).toLong
        if (len < 2L) return Unknown // would rewind/stall the cursor
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (mp + 2 + 2 + 6 > b.length || len < 8L) return Unknown
          val height = ((b(mp + 5) & 0xff) << 8) | (b(mp + 6) & 0xff)
          val width = ((b(mp + 7) & 0xff) << 8) | (b(mp + 8) & 0xff)
          val channels = b(mp + 9) & 0xff
          return if (width <= 0 || height <= 0 || channels <= 0) Unknown
          else MediaMeta("jpeg", width, height, channels, 0, 0.0, ok = true)
        }
        if (marker == 0xda) return Unknown // SOS before any SOF: no frame
        pos = mp + 2L + len
      }
    }
    Unknown
  }

  /** PNG: 8-byte signature, then the IHDR chunk (length + "IHDR" + 13
    * bytes: width u32be, height u32be, bit depth, color type, ...). */
  def decodePng(b: Array[Byte]): MediaMeta = {
    if (b.length < 33 ||
      !(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return Unknown
    val width = be32(b, 16)
    val height = be32(b, 20)
    val colorType = b(25) & 0xff
    // channels per PNG color type: 0 gray, 2 rgb, 3 palette, 4 gray+a, 6 rgba
    val channels = colorType match {
      case 0 | 3 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => 0
    }
    if (width <= 0 || height <= 0 || channels == 0) Unknown
    else MediaMeta("png", width, height, channels, 0, 0.0, ok = true)
  }

  /** BMP: "BM", file size, data offset, then BITMAPINFOHEADER at 14
    * (size u32le, width s32le, height s32le, planes, bpp u16le). */
  def decodeBmp(b: Array[Byte]): MediaMeta = {
    if (b.length < 30) return Unknown
    val width = le32(b, 18)
    val height = math.abs(le32(b, 22)) // negative height = top-down rows
    val bpp = le16(b, 28)
    if (width <= 0 || height == 0 || bpp <= 0) Unknown
    else MediaMeta("bmp", width, height, math.max(1, bpp / 8), 0, 0.0,
      ok = true)
  }

  /** WAV: RIFF/WAVE container; walk chunks for `fmt ` (channels u16le at
    * +2, sample rate u32le at +4, byte rate u32le at +8) and `data`
    * (payload size → duration = size / byteRate). */
  def decodeWav(b: Array[Byte]): MediaMeta = {
    // Long cursor: a hostile 32-bit chunk size can neither overflow to a
    // negative Int (which would stall or rewind the cursor — infinite
    // loop) nor index past the array; size is unsigned so pos strictly
    // advances by ≥ 8 per chunk and the loop always terminates, with any
    // truncated/corrupt container falling out as Unknown.
    var pos = 12L
    var channels = 0; var sampleRate = 0; var byteRate = 0
    var dataSize = -1L
    while (pos + 8 <= b.length && (channels == 0 || dataSize < 0)) {
      val p = pos.toInt
      val id = new String(b, p, 4, StandardCharsets.US_ASCII)
      val size = le32(b, p + 4).toLong & 0xffffffffL
      if (id == "fmt " && pos + 8 + 16 <= b.length) {
        channels = le16(b, p + 10)
        sampleRate = le32(b, p + 12)
        byteRate = le32(b, p + 16)
      } else if (id == "data") {
        dataSize = size
      }
      pos += 8L + size + (size & 1L) // chunks are word-aligned
    }
    if (channels <= 0 || sampleRate <= 0 || byteRate <= 0 || dataSize < 0)
      Unknown
    else MediaMeta("wav", 0, 0, channels, sampleRate,
      dataSize * 1000.0 / byteRate, ok = true)
  }

  // ── encoders (for deterministic test/demo media) ──────────────────────

  /** Minimal structurally-valid PNG: signature + IHDR + empty IDAT + IEND
    * (IDAT left empty — dimensions and color type are real). CRCs are
    * zeroed: decode() doesn't verify them, and the demo corpus only needs
    * header-true bytes. */
  def encodePng(width: Int, height: Int, colorType: Int = 6): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    wbe32(out, 13) // IHDR length
    out.write('I'); out.write('H'); out.write('D'); out.write('R')
    wbe32(out, width); wbe32(out, height)
    out.write(8) // bit depth
    out.write(colorType)
    out.write(0); out.write(0); out.write(0) // compression/filter/interlace
    wbe32(out, 0) // IHDR CRC (unverified)
    wbe32(out, 0) // empty IDAT
    out.write('I'); out.write('D'); out.write('A'); out.write('T')
    wbe32(out, 0) // IDAT CRC
    wbe32(out, 0) // IEND length
    out.write('I'); out.write('E'); out.write('N'); out.write('D')
    wbe32(out, 0) // IEND CRC
    out.toByteArray
  }

  /** Minimal structurally-valid JPEG: SOI + APP0/JFIF + SOF0 frame
    * header (real dimensions/components) + EOI. No quantization/Huffman
    * tables or scan data — decode() reads only the frame header, and the
    * demo corpus needs header-true bytes, not a renderable image. */
  def encodeJpeg(width: Int, height: Int, channels: Int = 3): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def wbe16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    wbe16(16) // APP0 length
    out.write('J'); out.write('F'); out.write('I'); out.write('F'); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0) // density units
    wbe16(1); wbe16(1) // x/y density
    out.write(0); out.write(0) // no thumbnail
    out.write(0xff); out.write(0xc0) // SOF0 (baseline)
    wbe16(8 + 3 * channels) // frame header length
    out.write(8) // precision
    wbe16(height); wbe16(width)
    out.write(channels)
    (1 to channels).foreach { c =>
      out.write(c) // component id
      out.write(0x11) // 1x1 sampling
      out.write(0) // quant table id
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** 24-bpp BMP with a real BITMAPINFOHEADER and zeroed pixel rows
    * (4-byte-aligned, as the format requires). */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    val rowBytes = (width * 3 + 3) / 4 * 4
    val dataSize = rowBytes * height
    val out = new java.io.ByteArrayOutputStream()
    out.write('B'); out.write('M')
    wle32(out, 54 + dataSize) // file size
    wle32(out, 0) // reserved
    wle32(out, 54) // pixel data offset
    wle32(out, 40) // BITMAPINFOHEADER size
    wle32(out, width); wle32(out, height)
    wle16(out, 1) // planes
    wle16(out, 24) // bpp
    wle32(out, 0) // BI_RGB
    wle32(out, dataSize)
    wle32(out, 2835); wle32(out, 2835) // 72 dpi
    wle32(out, 0); wle32(out, 0) // palette
    out.write(new Array[Byte](dataSize), 0, dataSize)
    out.toByteArray
  }

  /** PCM16 WAV with real fmt/data chunks and silent samples. */
  def encodeWav(channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = nSamples * blockAlign
    val out = new java.io.ByteArrayOutputStream()
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    wle32(out, 36 + dataSize)
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    wle32(out, 16)
    wle16(out, 1) // PCM
    wle16(out, channels)
    wle32(out, sampleRate)
    wle32(out, sampleRate * blockAlign) // byte rate
    wle16(out, blockAlign)
    wle16(out, 16) // bits/sample
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    wle32(out, dataSize)
    out.write(new Array[Byte](dataSize), 0, dataSize)
    out.toByteArray
  }
}
