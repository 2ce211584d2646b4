package graft.multimodal

import java.nio.charset.StandardCharsets

/** Pure-JVM encoders/decoders for seven public container formats (JPEG,
  * PNG, BMP, WAV, GIF, WebP, MP4), parsed from their published header
  * layouts — no external codec libraries. The *pixel/sample* payload is
  * not decompressed (PNG IDAT, JPEG entropy-coded data and MP4 mdat
  * stay opaque); what a curation pipeline needs from 100 TB of media is
  * the typed metadata — dimensions, channels, sample rate, duration —
  * and that lives in the fixed-layout headers parsed here.
  *
  * Layouts: JPEG marker segments + SOF0/SOF2 frame header (ITU T.81
  * §B.2.2), PNG signature + IHDR (RFC 2083 §3 / W3C PNG spec),
  * BITMAPINFOHEADER (Windows BMP), RIFF/WAVE `fmt ` + `data` chunks
  * (Multimedia Programming Interface and Data Specifications 1.0),
  * GIF87a/89a logical screen descriptor (GIF89a spec §18), WebP
  * RIFF container with VP8 (RFC 6386 §9.1) / VP8L (lossless bitstream
  * spec §3) / VP8X (extended container) chunks, MP4/ISO-BMFF box tree
  * with `mvhd` (timescale + duration) and `tkhd` (16.16 fixed-point
  * canvas) boxes (ISO/IEC 14496-12 §8.2.2 / §8.3.2). */
object MediaCodec {

  final case class MediaMeta(format: String, width: Int, height: Int,
      channels: Int, sampleRate: Int, durationMs: Double, ok: Boolean,
      nFrames: Int = 0)

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
    else if (blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' &&
      blob(3) == 'F' && blob(8) == 'W' && blob(9) == 'E' &&
      blob(10) == 'B' && blob(11) == 'P') decodeWebp(blob)
    else if (blob(0) == 'G' && blob(1) == 'I' && blob(2) == 'F' &&
      blob(3) == '8' && (blob(4) == '7' || blob(4) == '9') &&
      blob(5) == 'a') decodeGif(blob)
    else if (blob(4) == 'f' && blob(5) == 't' && blob(6) == 'y' &&
      blob(7) == 'p') decodeMp4(blob)
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

  /** GIF (87a/89a): 6-byte signature then the logical screen descriptor —
    * canvas width/height u16le at offsets 6/8 (GIF89a spec §18). GIF is
    * palette-indexed (one index per pixel), so channels = 1, matching the
    * PNG color-type-3 convention above.
    *
    * ANIMATION accounting (r12 verdict ask): after the LSD (and global
    * color table, if flagged) the block stream is walked — image
    * descriptors (0x2C, §20) count as frames; Graphic Control Extension
    * sub-blocks (0x21 0xF9, §23) carry the u16le inter-frame delay in
    * centiseconds, summed into duration_ms. A still GIF has no GCE, so
    * its duration stays 0. The walk has the decodeWav hostility
    * contract: a Long cursor that strictly advances (sub-block sizes are
    * unsigned bytes, descriptors fixed-length), any truncated or
    * unrecognized block ENDS the walk with whatever was accumulated
    * (the 13-byte header already validated — partial animation metadata
    * from a damaged tail is data, not an error), and nothing throws. */
  def decodeGif(b: Array[Byte]): MediaMeta = {
    if (b.length < 13) return Unknown
    val width = le16(b, 6)
    val height = le16(b, 8)
    if (width <= 0 || height <= 0) return Unknown
    val gct = if ((b(10) & 0x80) != 0) 3L * (1 << ((b(10) & 7) + 1)) else 0L
    var pos = 13L + gct
    var frames = 0
    var durationCs = 0L
    var stop = false
    // skip a sub-block chain starting at `p` (first length byte),
    // returning the position after its 0 terminator, or -1 if truncated
    def skipSubBlocks(p0: Long): Long = {
      var p = p0
      while (p < b.length && (b(p.toInt) & 0xff) != 0)
        p += 1L + (b(p.toInt) & 0xff)
      if (p < b.length) p + 1 else -1L
    }
    while (!stop && pos < b.length) {
      (b(pos.toInt) & 0xff) match {
        case 0x3b => stop = true // trailer
        case 0x21 if pos + 2 <= b.length => // extension block
          val label = b(pos.toInt + 1) & 0xff
          // GCE: sub-block [size=4][flags][delay u16le][transp] — the
          // delay sits at data offset 1; read it before the generic
          // sub-block skip
          if (label == 0xf9 && pos + 6 <= b.length &&
            (b(pos.toInt + 2) & 0xff) >= 3)
            durationCs += le16(b, pos.toInt + 4)
          val next = skipSubBlocks(pos + 2)
          if (next < 0) stop = true else pos = next
        case 0x2c if pos + 10 <= b.length => // image descriptor = frame
          val flags = b(pos.toInt + 9) & 0xff
          val lct = if ((flags & 0x80) != 0) 3L * (1 << ((flags & 7) + 1))
            else 0L
          frames += 1
          // descriptor(10) + local color table + LZW min-code byte,
          // then the compressed-data sub-block chain
          val next = skipSubBlocks(pos + 10 + lct + 1)
          if (next < 0) stop = true else pos = next
        case _ => stop = true // unknown/truncated block: keep header info
      }
    }
    MediaMeta("gif", width, height, 1, 0, durationCs * 10.0, ok = true,
      nFrames = frames)
  }

  /** WebP: RIFF container, walked with the same hostile-size-proof Long
    * cursor as [[decodeWav]], to the first image chunk:
    *
    *  - `VP8 ` (lossy, RFC 6386 §9.1): 3-byte frame tag, 3-byte start
    *    code 9D 01 2A, then width/height u16le (low 14 bits each);
    *  - `VP8L` (lossless bitstream spec §3): signature byte 0x2F, then a
    *    u32le carrying 14-bit width−1, 14-bit height−1, and the
    *    alpha_is_used bit, LSB first;
    *  - `VP8X` (extended container): flags byte (bit 4 = alpha), 3
    *    reserved bytes, canvas width−1 / height−1 as u24le.
    *
    * Malformed signatures/lengths abort to Unknown, never loop or throw. */
  def decodeWebp(b: Array[Byte]): MediaMeta = {
    var pos = 12L
    // VP8X canvas, if seen: the walk then CONTINUES over the remaining
    // chunks to account animation (ANIM flags it, each ANMF carries a
    // u24le per-frame duration in ms at payload offset 12 — WebP
    // container spec, "Animation"); a still VP8X file simply yields no
    // ANMFs. Simple-format files (bare VP8 /VP8L first) return at the
    // image chunk exactly as before. nFrames counts only frames the
    // container ENUMERATES (ANMF entries here, image descriptors in
    // GIF) — a simple still chunk is not an enumerated frame, keeping
    // the field's meaning uniform across formats.
    var ext: MediaMeta = null
    var animated = false
    var frames = 0
    var durMs = 0L
    while (pos + 8 <= b.length) {
      val p = pos.toInt
      val id = new String(b, p, 4, StandardCharsets.US_ASCII)
      val size = le32(b, p + 4).toLong & 0xffffffffL
      val pl = p + 8
      if (id == "VP8 ") {
        if (size < 10L || pos + 18 > b.length) return Unknown
        if ((b(pl + 3) & 0xff) != 0x9d || (b(pl + 4) & 0xff) != 0x01 ||
          (b(pl + 5) & 0xff) != 0x2a) return Unknown
        val width = le16(b, pl + 6) & 0x3fff
        val height = le16(b, pl + 8) & 0x3fff
        if (width <= 0 || height <= 0) return Unknown
        if (ext == null)
          return MediaMeta("webp", width, height, 3, 0, 0.0, ok = true)
      } else if (id == "VP8L") {
        if (size < 5L || pos + 13 > b.length) return Unknown
        if ((b(pl) & 0xff) != 0x2f) return Unknown
        val bits = le32(b, pl + 1)
        val width = (bits & 0x3fff) + 1
        val height = ((bits >>> 14) & 0x3fff) + 1
        val alpha = (bits >>> 28) & 1
        if (ext == null)
          return MediaMeta("webp", width, height, if (alpha == 1) 4 else 3,
            0, 0.0, ok = true)
      } else if (id == "VP8X") {
        if (size < 10L || pos + 18 > b.length) return Unknown
        val alpha = (b(pl) >> 4) & 1
        animated = (b(pl) & 0x02) != 0
        val width = ((b(pl + 4) & 0xff) | ((b(pl + 5) & 0xff) << 8) |
          ((b(pl + 6) & 0xff) << 16)) + 1
        val height = ((b(pl + 7) & 0xff) | ((b(pl + 8) & 0xff) << 8) |
          ((b(pl + 9) & 0xff) << 16)) + 1
        ext = MediaMeta("webp", width, height, if (alpha == 1) 4 else 3,
          0, 0.0, ok = true)
      } else if (id == "ANMF") {
        // frame header: x,y u24 (6), w-1,h-1 u24 (12), duration u24le
        // (15), flags (16); a truncated header ends the file below
        if (animated && size >= 16L && pos + 24 <= b.length) {
          frames += 1
          durMs += ((b(pl + 12) & 0xff) | ((b(pl + 13) & 0xff) << 8) |
            ((b(pl + 14) & 0xff) << 16)).toLong
        }
      }
      pos += 8L + size + (size & 1L) // chunks are word-aligned
    }
    if (ext == null) Unknown
    else ext.copy(durationMs = durMs.toDouble, nFrames = frames)
  }

  /** MP4/ISO-BMFF (ISO/IEC 14496-12): walk the top-level box tree to
    * `moov`, then its children for `mvhd` (§8.2.2 — movie timescale +
    * duration → duration_ms) and the first `trak` whose `tkhd` (§8.3.2)
    * carries a non-zero 16.16 fixed-point canvas (audio tracks encode a
    * 0×0 canvas; the first VIDEO track defines the presentation dims).
    * Both full-box versions are handled (v0: u32 times, v1: u64). Box
    * sizes are u32be with the two spec escapes — size 0 = "to end of
    * file", size 1 = u64 largesize follows — and a hostile size below
    * the header length would rewind or stall the cursor, so anything
    * < 8 (< 16 for largesize) aborts to Unknown; the Long cursor is the
    * same overflow-proof walk as [[decodeWav]]. Channels = 3: the canvas
    * is a decoded video frame (RGB), matching the image-format
    * convention; the compressed sample data (mdat) stays opaque. */
  def decodeMp4(b: Array[Byte]): MediaMeta = {
    // one box level: [from, until) byte range → iterator of
    // (type, payloadFrom, payloadUntil); hostile sizes end the walk
    def boxes(from: Long, until: Long): Iterator[(String, Long, Long)] =
      new Iterator[(String, Long, Long)] {
        private var pos = from
        private var nxt: (String, Long, Long) = advance()
        private def advance(): (String, Long, Long) = {
          if (pos + 8 > until) return null
          val p = pos.toInt
          val size32 = be32(b, p).toLong & 0xffffffffL
          val typ = new String(b, p + 4, 4, StandardCharsets.US_ASCII)
          val (size, hdr) =
            if (size32 == 0L) (until - pos, 8L) // "to end" escape
            else if (size32 == 1L) { // u64 largesize follows the type
              if (pos + 16 > until) return null
              val hi = be32(b, p + 8).toLong & 0xffffffffL
              val lo = be32(b, p + 12).toLong & 0xffffffffL
              ((hi << 32) | lo, 16L)
            } else (size32, 8L)
          if (size < hdr || pos + size > until) return null // hostile
          val out = (typ, pos + hdr, pos + size)
          pos += size
          out
        }
        def hasNext: Boolean = nxt != null
        def next(): (String, Long, Long) = {
          val out = nxt; nxt = advance(); out
        }
      }
    var timescale = 0L; var duration = -1L
    var width = 0; var height = 0
    boxes(0L, b.length.toLong).foreach { case (typ, from, until) =>
      if (typ == "moov") boxes(from, until).foreach {
        case ("mvhd", f, u) if u - f >= 20 =>
          val v = b(f.toInt) & 0xff
          if (v == 0 && u - f >= 20) {
            timescale = be32(b, f.toInt + 12).toLong & 0xffffffffL
            duration = be32(b, f.toInt + 16).toLong & 0xffffffffL
          } else if (v == 1 && u - f >= 32) {
            timescale = be32(b, f.toInt + 20).toLong & 0xffffffffL
            duration = ((be32(b, f.toInt + 24).toLong & 0xffffffffL) << 32) |
              (be32(b, f.toInt + 28).toLong & 0xffffffffL)
          }
        case ("trak", f, u) => boxes(f, u).foreach {
          case ("tkhd", tf, tu) if width == 0 =>
            val v = b(tf.toInt) & 0xff
            // width/height close the box: v0 at +76/+80 past the
            // version word, v1 at +88/+92 (64-bit times)
            val off = if (v == 0) 76L else 88L
            if (tu - tf >= off + 8) {
              val w = be32(b, (tf + off).toInt) >>> 16 // 16.16 → int
              val h = be32(b, (tf + off + 4).toInt) >>> 16
              if (w > 0 && h > 0) { width = w; height = h }
            }
          case _ => ()
        }
        case _ => ()
      }
    }
    if (timescale <= 0L || duration < 0L || width <= 0 || height <= 0)
      Unknown
    else MediaMeta("mp4", width, height, 3, 0,
      duration * 1000.0 / timescale, ok = true)
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

  /** Minimal GIF89a: signature + logical screen descriptor + trailer (no
    * color table, no image blocks — header-true bytes are all the demo
    * corpus needs). */
  def encodeGif(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('G'); out.write('I'); out.write('F')
    out.write('8'); out.write('9'); out.write('a')
    wle16(out, width); wle16(out, height)
    out.write(0) // no global color table
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Animated GIF89a: LSD + per frame a Graphic Control Extension
    * (delay `delayCs` centiseconds) and an image descriptor with an
    * empty LZW data stream, closed by the trailer. Fixed layout:
    * 13 (header) + 20·frames (GCE 8 + descriptor 10 + min-code byte +
    * block terminator) + 1 (trailer) = 14 + 20·frames bytes — byte
    * length stays pure parameter arithmetic like every other encoder.
    * Total duration decodes as frames · delayCs · 10 ms. */
  def encodeGifAnim(width: Int, height: Int, frames: Int,
      delayCs: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('G'); out.write('I'); out.write('F')
    out.write('8'); out.write('9'); out.write('a')
    wle16(out, width); wle16(out, height)
    out.write(0); out.write(0); out.write(0) // no GCT, bg, aspect
    (1 to frames).foreach { _ =>
      out.write(0x21); out.write(0xf9); out.write(4) // GCE, size 4
      out.write(0) // flags: no disposal, no transparency
      wle16(out, delayCs)
      out.write(0) // transparent color index (unused)
      out.write(0) // sub-block terminator
      out.write(0x2c) // image descriptor
      wle16(out, 0); wle16(out, 0) // left, top
      wle16(out, width); wle16(out, height)
      out.write(0) // no local color table
      out.write(2) // LZW minimum code size
      out.write(0) // empty data sub-block chain
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Minimal WebP: RIFF/WEBP container holding a single VP8L chunk whose
    * bitstream header carries real dimensions + the alpha bit. The chunk
    * payload is padded to 6 bytes (even, so no RIFF pad ambiguity);
    * decode() reads only the 5-byte header. */
  def encodeWebp(width: Int, height: Int, alpha: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    wle32(out, 4 + 8 + 6) // "WEBP" + chunk header + 6-byte payload
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write('L')
    wle32(out, 6)
    out.write(0x2f) // VP8L signature
    wle32(out, ((width - 1) & 0x3fff) | (((height - 1) & 0x3fff) << 14) |
      (if (alpha) 1 << 28 else 0)) // version bits (29–31) = 0
    out.write(0) // payload pad to even length
    out.toByteArray
  }

  /** Animated WebP: RIFF/WEBP with VP8X (animation + canvas), ANIM
    * (background + loop count), and one header-only ANMF per frame
    * carrying `frameMs` as its u24le duration. Fixed layout: 12 (RIFF)
    * + 18 (VP8X) + 14 (ANIM) + 24·frames (ANMF header chunks) =
    * 44 + 24·frames bytes. Total duration decodes as frames · frameMs. */
  def encodeWebpAnim(width: Int, height: Int, frames: Int,
      frameMs: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def wle24(v: Int): Unit = { out.write(v & 0xff)
      out.write((v >>> 8) & 0xff); out.write((v >>> 16) & 0xff) }
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    wle32(out, 4 + 18 + 14 + 24 * frames)
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write('X')
    wle32(out, 10)
    out.write(0x02) // flags: animation
    out.write(0); out.write(0); out.write(0) // reserved
    wle24(width - 1); wle24(height - 1)
    out.write('A'); out.write('N'); out.write('I'); out.write('M')
    wle32(out, 6)
    wle32(out, 0) // background color
    wle16(out, 0) // loop count: infinite
    (1 to frames).foreach { _ =>
      out.write('A'); out.write('N'); out.write('M'); out.write('F')
      wle32(out, 16) // header-only frame payload
      wle24(0); wle24(0) // frame x, y
      wle24(width - 1); wle24(height - 1)
      wle24(frameMs)
      out.write(0) // flags: dispose none, blend
    }
    out.toByteArray
  }

  /** Minimal structurally-valid MP4: `ftyp` (isom) + `moov` holding a
    * v0 `mvhd` (real timescale + duration) and one `trak`/`tkhd` with
    * the real 16.16 canvas, closed by an empty `mdat` — 244 bytes of
    * FIXED layout (20 + 216 + 8), so the container byte length stays
    * pure parameter arithmetic like the other six encoders. No sample
    * tables or codec config: decode() reads only mvhd/tkhd, and the
    * demo corpus needs header-true bytes, not playable video. */
  def encodeMp4(width: Int, height: Int, durationTicks: Int,
      timescale: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    wbe32(out, 20); tag("ftyp") // ftyp: major brand + minor + 1 compat
    tag("isom"); wbe32(out, 512); tag("isom")
    wbe32(out, 216); tag("moov") //   = 8 + mvhd 108 + trak 100
    wbe32(out, 108); tag("mvhd")
    wbe32(out, 0) // version 0 + flags
    wbe32(out, 0); wbe32(out, 0) // creation/modification time
    wbe32(out, timescale); wbe32(out, durationTicks)
    wbe32(out, 0x00010000) // rate 1.0 (16.16)
    wbe32(out, 0x01000000) // volume 1.0 (8.8) + 2 reserved bytes
    wbe32(out, 0); wbe32(out, 0) // reserved
    // unity matrix: 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(wbe32(out, _))
    (1 to 6).foreach(_ => wbe32(out, 0)) // pre_defined
    wbe32(out, 2) // next_track_ID
    wbe32(out, 100); tag("trak") //  = 8 + tkhd 92
    wbe32(out, 92); tag("tkhd")
    wbe32(out, 7) // version 0 + flags: enabled | in_movie | in_preview
    wbe32(out, 0); wbe32(out, 0) // creation/modification time
    wbe32(out, 1) // track_ID
    wbe32(out, 0) // reserved
    wbe32(out, durationTicks)
    wbe32(out, 0); wbe32(out, 0) // reserved
    wbe32(out, 0) // layer + alternate_group
    wbe32(out, 0) // volume (0 for video) + reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(wbe32(out, _))
    wbe32(out, width << 16); wbe32(out, height << 16) // 16.16 canvas
    wbe32(out, 8); tag("mdat") // empty mdat closes the file
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
