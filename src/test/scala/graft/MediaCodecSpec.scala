package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MediaCodec

/** Header-level codec checks — pure JVM, no Spark session needed. */
class MediaCodecSpec extends AnyFunSuite {

  test("png: encode→decode round-trips dimensions and channels") {
    val m = MediaCodec.decode(MediaCodec.encodePng(640, 480, colorType = 6))
    assert(m.ok && m.format == "png")
    assert(m.width == 640 && m.height == 480 && m.channels == 4)
    val gray = MediaCodec.decode(MediaCodec.encodePng(7, 3, colorType = 0))
    assert(gray.channels == 1 && gray.width == 7 && gray.height == 3)
  }

  test("bmp: encode→decode round-trips dimensions; rows are 4-byte aligned") {
    val bytes = MediaCodec.encodeBmp(13, 5) // 13*3=39 → row stride 40
    val m = MediaCodec.decode(bytes)
    assert(m.ok && m.format == "bmp")
    assert(m.width == 13 && m.height == 5 && m.channels == 3)
    assert(bytes.length == 54 + 40 * 5)
  }

  test("wav: duration derives from data size over byte rate") {
    // 8000 Hz mono PCM16 → byte rate 16000; 4000 samples = 8000 bytes = 500ms
    val m = MediaCodec.decode(MediaCodec.encodeWav(1, 8000, 4000))
    assert(m.ok && m.format == "wav")
    assert(m.channels == 1 && m.sampleRate == 8000)
    assert(math.abs(m.durationMs - 500.0) < 1e-9)
    val st = MediaCodec.decode(MediaCodec.encodeWav(2, 16000, 16000))
    assert(st.channels == 2 && st.sampleRate == 16000 &&
      math.abs(st.durationMs - 1000.0) < 1e-9)
  }

  test("jpeg: encode→decode round-trips the SOF0 frame header") {
    val m = MediaCodec.decode(MediaCodec.encodeJpeg(1920, 1080, 3))
    assert(m.ok && m.format == "jpeg")
    assert(m.width == 1920 && m.height == 1080 && m.channels == 3)
    val gray = MediaCodec.decode(MediaCodec.encodeJpeg(7, 3, 1))
    assert(gray.ok && gray.channels == 1 && gray.width == 7 && gray.height == 3)
  }

  test("jpeg: progressive SOF2 and fill bytes parse; DHT is not a frame") {
    val b = MediaCodec.encodeJpeg(64, 32, 3)
    // find the SOF0 marker and rewrite it to SOF2 (progressive)
    val sof = b.indices.dropWhile(i =>
      !((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0)).head
    b(sof + 1) = 0xc2.toByte
    val m = MediaCodec.decode(b)
    assert(m.ok && m.format == "jpeg" && m.width == 64 && m.height == 32)
    // a DHT (FFC4) segment before the SOF must be walked over, not
    // mistaken for a frame header; insert one after APP0 (ends at 20)
    val dht = Array(0xff, 0xc4, 0x00, 0x04, 0x00, 0x01).map(_.toByte)
    val withDht = b.take(20) ++ dht ++ b.drop(20)
    val m2 = MediaCodec.decode(withDht)
    assert(m2.ok && m2.width == 64 && m2.height == 32)
    // fill 0xFF bytes before a marker are legal padding
    val padded = b.take(20) ++ Array(0xff.toByte) ++ b.drop(20)
    assert(MediaCodec.decode(padded).ok)
  }

  test("hostile jpeg segment lengths terminate and decode to unknown") {
    // a segment length < 2 would rewind the cursor under naive
    // arithmetic (pos += 2 + len - 2) — must reject, not loop forever
    val b = MediaCodec.encodeJpeg(8, 8, 3)
    b(4) = 0x00.toByte; b(5) = 0x00.toByte // APP0 length := 0
    assert(!MediaCodec.decode(b).ok)
    val b1 = MediaCodec.encodeJpeg(8, 8, 3)
    b1(4) = 0x00.toByte; b1(5) = 0x01.toByte // APP0 length := 1
    assert(!MediaCodec.decode(b1).ok)
    // truncated mid-frame-header
    assert(!MediaCodec.decode(MediaCodec.encodeJpeg(8, 8, 3).take(24)).ok)
    // SOS with no preceding SOF: no frame header to report
    val noSof = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x00, 0x00)
      .map(_.toByte)
    assert(!MediaCodec.decode(noSof).ok)
    // a non-FF byte where a marker must start
    val junk = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x03, 0x00, 0x41, 0x42)
      .map(_.toByte)
    assert(!MediaCodec.decode(junk).ok)
    // a blob that ENDS in a fill-byte run: the marker scan must not read
    // past the array (regression: threw ArrayIndexOutOfBounds)
    val allFill = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
      0xff, 0xff, 0xff, 0xff, 0xff).map(_.toByte)
    assert(!MediaCodec.decode(allFill).ok)
  }

  test("garbage, truncated, and empty blobs decode to unknown, never throw") {
    assert(!MediaCodec.decode(Array[Byte]()).ok)
    assert(!MediaCodec.decode(null).ok)
    assert(!MediaCodec.decode("plain text, not a container".getBytes).ok)
    // valid signature but truncated header
    assert(!MediaCodec.decode(MediaCodec.encodePng(4, 4).take(20)).ok)
    assert(!MediaCodec.decode(MediaCodec.encodeWav(1, 8000, 10).take(14)).ok)
  }

  test("hostile wav chunk sizes terminate and decode to unknown") {
    // chunk size 0xFFFFFFF8 would stall the cursor (pos += 8 + (-8))
    // under Int arithmetic — must terminate and reject, not hang
    val hostile = MediaCodec.encodeWav(1, 8000, 4)
    hostile(16) = 0xf8.toByte; hostile(17) = 0xff.toByte
    hostile(18) = 0xff.toByte; hostile(19) = 0xff.toByte
    assert(!MediaCodec.decode(hostile).ok)
    // size 0x7FFFFFF9 overflows Int addition → must not throw
    val big = MediaCodec.encodeWav(1, 8000, 4)
    big(16) = 0xf9.toByte; big(17) = 0xff.toByte
    big(18) = 0xff.toByte; big(19) = 0x7f.toByte
    assert(!MediaCodec.decode(big).ok)
  }

  test("gif: encode→decode round-trips the logical screen descriptor") {
    val m = MediaCodec.decode(MediaCodec.encodeGif(320, 200))
    assert(m.ok && m.format == "gif")
    assert(m.width == 320 && m.height == 200 && m.channels == 1)
    // GIF87a variant sniffs identically
    val b = MediaCodec.encodeGif(7, 3)
    b(4) = '7'.toByte
    val m87 = MediaCodec.decode(b)
    assert(m87.ok && m87.width == 7 && m87.height == 3)
  }

  test("gif animation: frame count and summed GCE delays round-trip; stills stay 0") {
    val m = MediaCodec.decode(MediaCodec.encodeGifAnim(64, 32, 4, 7))
    assert(m.ok && m.format == "gif" && m.width == 64 && m.height == 32)
    assert(m.nFrames == 4 && m.durationMs == 4 * 7 * 10.0)
    // still GIF: no enumerated frames, zero duration
    val s = MediaCodec.decode(MediaCodec.encodeGif(64, 32))
    assert(s.ok && s.nFrames == 0 && s.durationMs == 0.0)
    // every truncation prefix returns (never throws, never hangs); a
    // cut inside the block stream keeps the already-validated header
    val full = MediaCodec.encodeGifAnim(64, 32, 3, 9)
    (0 until full.length).foreach(i => MediaCodec.decode(full.take(i)))
    val cut = MediaCodec.decode(full.take(full.length - 5))
    assert(cut.ok && cut.width == 64 && cut.nFrames <= 3)
    // a hostile GCE sub-block size runs the cursor past the end: the
    // walk terminates with the header intact, partial animation data
    val bad = full.clone()
    bad(15) = 0xff.toByte // first GCE's block-size byte
    val bm = MediaCodec.decode(bad)
    assert(bm.ok && bm.width == 64)
  }

  test("webp animation: ANMF count and u24 durations round-trip; vp8x still stays 0") {
    val m = MediaCodec.decode(MediaCodec.encodeWebpAnim(100, 50, 3, 80))
    assert(m.ok && m.format == "webp" && m.width == 100 && m.height == 50)
    assert(m.channels == 3 && m.nFrames == 3 && m.durationMs == 240.0)
    // truncating into the last ANMF drops exactly that frame — the
    // canvas (validated VP8X) survives
    val full = MediaCodec.encodeWebpAnim(100, 50, 3, 80)
    val cut = MediaCodec.decode(full.take(full.length - 10))
    assert(cut.ok && cut.nFrames == 2 && cut.durationMs == 160.0)
    // every truncation prefix returns, never throws
    (0 until full.length).foreach(i => MediaCodec.decode(full.take(i)))
    // a zero-frame animation container decodes as the bare canvas —
    // nFrames counts only ENUMERATED ANMF frames
    val vp8xStill = MediaCodec.encodeWebpAnim(100, 50, 0, 0)
    val sm = MediaCodec.decode(vp8xStill)
    assert(sm.ok && sm.nFrames == 0 && sm.durationMs == 0.0)
  }

  test("hostile gif: truncation and zero dimensions decode to unknown") {
    // a 12-byte GIF passes decode()'s global length gate but is one byte
    // short of a full logical screen descriptor
    val twelve = MediaCodec.encodeGif(4, 4).take(12)
    assert(twelve.length == 12 && !MediaCodec.decode(twelve).ok)
    // zero-width / zero-height canvases are rejected, not emitted
    assert(!MediaCodec.decode(MediaCodec.encodeGif(0, 4)).ok)
    assert(!MediaCodec.decode(MediaCodec.encodeGif(4, 0)).ok)
    // every truncation prefix must return (not throw, not hang)
    val full = MediaCodec.encodeGif(33, 17)
    (0 until full.length).foreach(i =>
      MediaCodec.decode(full.take(i)))
  }

  test("webp vp8l: encode→decode round-trips dims and the alpha bit") {
    val m = MediaCodec.decode(MediaCodec.encodeWebp(100, 50))
    assert(m.ok && m.format == "webp")
    assert(m.width == 100 && m.height == 50 && m.channels == 3)
    val a = MediaCodec.decode(MediaCodec.encodeWebp(100, 50, alpha = true))
    assert(a.ok && a.channels == 4 && a.width == 100 && a.height == 50)
    // 14-bit dimension field boundaries: 1×1 and 16384×16384
    val tiny = MediaCodec.decode(MediaCodec.encodeWebp(1, 1))
    assert(tiny.ok && tiny.width == 1 && tiny.height == 1)
    val max = MediaCodec.decode(MediaCodec.encodeWebp(16384, 16384))
    assert(max.ok && max.width == 16384 && max.height == 16384)
  }

  test("webp vp8 lossy: hand-built frame header parses per RFC 6386") {
    // RIFF/WEBP + one "VP8 " chunk: 3-byte frame tag, start code
    // 9D 01 2A, then width/height u16le (low 14 bits each)
    def vp8(w: Int, h: Int, badStart: Boolean = false): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def wle32(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff)
        out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff) }
      out.write('R'); out.write('I'); out.write('F'); out.write('F')
      wle32(4 + 8 + 10)
      out.write('W'); out.write('E'); out.write('B'); out.write('P')
      out.write('V'); out.write('P'); out.write('8'); out.write(' ')
      wle32(10)
      out.write(0x00); out.write(0x00); out.write(0x00) // frame tag
      out.write(if (badStart) 0x00 else 0x9d); out.write(0x01); out.write(0x2a)
      out.write(w & 0xff); out.write((w >>> 8) & 0x3f)
      out.write(h & 0xff); out.write((h >>> 8) & 0x3f)
      out.toByteArray
    }
    val m = MediaCodec.decode(vp8(640, 360))
    assert(m.ok && m.format == "webp")
    assert(m.width == 640 && m.height == 360 && m.channels == 3)
    // a wrong start code is a malformed bitstream, not a webp row
    assert(!MediaCodec.decode(vp8(640, 360, badStart = true)).ok)
    // truncated mid-frame-header at every byte: return, never throw
    val full = vp8(640, 360)
    (0 until full.length).foreach(i => MediaCodec.decode(full.take(i)))
    assert(!MediaCodec.decode(full.take(full.length - 1)).ok)
  }

  test("webp vp8x: extended canvas dims and alpha flag parse") {
    // RIFF/WEBP + one VP8X chunk: flags byte (bit 4 = alpha), 3 reserved
    // bytes, canvas width−1 / height−1 as u24le
    def vp8x(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def wle32(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff)
        out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff) }
      def wle24(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff)
        out.write((v >>> 16) & 0xff) }
      out.write('R'); out.write('I'); out.write('F'); out.write('F')
      wle32(4 + 8 + 10)
      out.write('W'); out.write('E'); out.write('B'); out.write('P')
      out.write('V'); out.write('P'); out.write('8'); out.write('X')
      wle32(10)
      out.write(if (alpha) 0x10 else 0x00)
      out.write(0); out.write(0); out.write(0)
      wle24(w - 1); wle24(h - 1)
      out.toByteArray
    }
    val m = MediaCodec.decode(vp8x(4000, 3000, alpha = false))
    assert(m.ok && m.format == "webp")
    assert(m.width == 4000 && m.height == 3000 && m.channels == 3)
    val a = MediaCodec.decode(vp8x(4000, 3000, alpha = true))
    assert(a.ok && a.channels == 4)
    // u24 canvas boundary: the full 16,777,216 extent round-trips
    val big = MediaCodec.decode(vp8x(1 << 24, 1, alpha = false))
    assert(big.ok && big.width == (1 << 24) && big.height == 1)
    val full = vp8x(4000, 3000, alpha = true)
    (0 until full.length).foreach(i => MediaCodec.decode(full.take(i)))
  }

  test("webp: unknown chunks are walked over; hostile sizes terminate") {
    // a metadata chunk before the image chunk must be skipped (with the
    // RIFF odd-size pad byte), landing on the VP8L header behind it
    val vp8l = MediaCodec.encodeWebp(64, 32).drop(12) // VP8L chunk only
    def container(chunks: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write('R'); out.write('I'); out.write('F'); out.write('F')
      out.write((4 + chunks.length) & 0xff)
      out.write(((4 + chunks.length) >>> 8) & 0xff); out.write(0); out.write(0)
      out.write('W'); out.write('E'); out.write('B'); out.write('P')
      out.write(chunks, 0, chunks.length)
      out.toByteArray
    }
    val meta = Array[Byte]('X', 'M', 'P', ' ', 3, 0, 0, 0, 'a', 'b', 'c', 0)
    val m = MediaCodec.decode(container(meta ++ vp8l))
    assert(m.ok && m.format == "webp" && m.width == 64 && m.height == 32)
    // chunk size 0xFFFFFFFF jumps the cursor past the end: must
    // terminate as unknown under the Long cursor, not hang or throw
    val hostile = container(
      Array[Byte]('X', 'M', 'P', ' ', -1, -1, -1, -1) ++ vp8l)
    assert(!MediaCodec.decode(hostile).ok)
    // VP8L signature byte must be 0x2F, not whatever is in the stream
    val badSig = MediaCodec.encodeWebp(64, 32)
    badSig(20) = 0x00.toByte
    assert(!MediaCodec.decode(badSig).ok)
    // truncation at every byte boundary: return, never throw
    val full = MediaCodec.encodeWebp(64, 32, alpha = true)
    (0 until full.length).foreach(i => MediaCodec.decode(full.take(i)))
    assert(!MediaCodec.decode(full.take(full.length - 2)).ok)
  }

  test("mp4: encode→decode round-trips canvas and mvhd duration") {
    val b = MediaCodec.encodeMp4(640, 360, 2500, 25000)
    assert(b.length == 244) // fixed layout: ftyp 20 + moov 216 + mdat 8
    val m = MediaCodec.decode(b)
    assert(m.ok && m.format == "mp4")
    assert(m.width == 640 && m.height == 360 && m.channels == 3)
    assert(math.abs(m.durationMs - 100.0) < 1e-9) // 2500/25000 s
    // the empty-mdat "size 0 = to end of file" escape still decodes
    val toEnd = b.clone()
    toEnd(236) = 0; toEnd(237) = 0; toEnd(238) = 0; toEnd(239) = 0
    assert(MediaCodec.decode(toEnd).ok)
  }

  test("mp4: an audio track's 0×0 tkhd canvas is skipped for the video track's") {
    // moov = mvhd + trak(audio: zeroed canvas) + trak(video): dims must
    // come from the first NON-ZERO canvas, per the first-video-track rule
    val base = MediaCodec.encodeMp4(640, 360, 2500, 25000)
    val ftyp = base.slice(0, 20)
    val mvhd = base.slice(28, 136)
    val trak = base.slice(136, 236)
    val mdat = base.slice(236, 244)
    val audio = trak.clone() // zero the 16.16 canvas at trak +92/+96
    (92 until 100).foreach(i => audio(i) = 0)
    val out = new java.io.ByteArrayOutputStream()
    def wbe32(v: Int): Unit = { out.write((v >>> 24) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 8) & 0xff)
      out.write(v & 0xff) }
    out.write(ftyp, 0, 20)
    wbe32(8 + 108 + 100 + 100); out.write('m'); out.write('o')
    out.write('o'); out.write('v')
    out.write(mvhd, 0, 108); out.write(audio, 0, 100)
    out.write(trak, 0, 100); out.write(mdat, 0, 8)
    val m = MediaCodec.decode(out.toByteArray)
    assert(m.ok && m.width == 640 && m.height == 360)
  }

  test("mp4: version-1 boxes (64-bit times) and the u64 largesize escape parse") {
    val base = MediaCodec.encodeMp4(320, 240, 1800, 10000)
    // rebuild moov with a v1 mvhd (120 B) and a v1 tkhd (104 B)
    val out = new java.io.ByteArrayOutputStream()
    def wbe32(v: Int): Unit = { out.write((v >>> 24) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 8) & 0xff)
      out.write(v & 0xff) }
    def wbe64(v: Long): Unit = { wbe32((v >>> 32).toInt); wbe32(v.toInt) }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    out.write(base, 0, 20) // ftyp
    // moov via the size-1 + u64 largesize escape (header 16 B)
    val moovContent = 120 + 8 + 104
    wbe32(1); tag("moov"); wbe64(16L + moovContent)
    wbe32(120); tag("mvhd")
    out.write(1); out.write(0); out.write(0); out.write(0) // version 1
    wbe64(0L); wbe64(0L) // creation/modification (u64)
    wbe32(10000); wbe64(1800L) // timescale, duration (u64)
    wbe32(0x00010000); wbe32(0x01000000); wbe32(0); wbe32(0)
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(wbe32)
    (1 to 6).foreach(_ => wbe32(0)); wbe32(2)
    wbe32(8 + 104); tag("trak")
    wbe32(104); tag("tkhd")
    out.write(1); out.write(0); out.write(0); out.write(7) // version 1
    wbe64(0L); wbe64(0L) // creation/modification (u64)
    wbe32(1); wbe32(0) // track_ID + reserved
    wbe64(1800L) // duration (u64)
    wbe32(0); wbe32(0); wbe32(0); wbe32(0) // reserved/layer/volume
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(wbe32)
    wbe32(320 << 16); wbe32(240 << 16)
    val m = MediaCodec.decode(out.toByteArray)
    assert(m.ok && m.format == "mp4")
    assert(m.width == 320 && m.height == 240)
    assert(math.abs(m.durationMs - 180.0) < 1e-9)
  }

  test("hostile mp4: bad box sizes and truncation terminate as unknown, never throw") {
    val b = MediaCodec.encodeMp4(64, 32, 1000, 10000)
    // a box size below the 8-byte header would rewind/stall the cursor
    val small = b.clone(); small(23) = 4 // moov size := 4
    assert(!MediaCodec.decode(small).ok)
    // a size jumping past the end of the blob ends the walk
    val huge = b.clone(); huge(20) = 0x7f.toByte
    assert(!MediaCodec.decode(huge).ok)
    // largesize escape with no room for the u64 is hostile, not a read
    val noRoom = b.slice(0, 20) ++
      Array[Byte](0, 0, 0, 1, 'm', 'o', 'o', 'v', 0, 0)
    assert(!MediaCodec.decode(noRoom).ok)
    // zero dimensions / zero timescale are rejected, not emitted
    assert(!MediaCodec.decode(MediaCodec.encodeMp4(0, 32, 10, 100)).ok)
    assert(!MediaCodec.decode(MediaCodec.encodeMp4(64, 32, 10, 0)).ok)
    // every truncation prefix at every box boundary and inside each box
    // must return (not throw, not hang); mid-moov truncation is unknown
    (0 until b.length).foreach(i => MediaCodec.decode(b.take(i)))
    assert(!MediaCodec.decode(b.take(100)).ok)
  }

  test("bmp top-down negative height is normalized") {
    val bytes = MediaCodec.encodeBmp(4, 4)
    // patch height (offset 22, s32le) to -4: top-down row order
    bytes(22) = (-4 & 0xff).toByte; bytes(23) = 0xff.toByte
    bytes(24) = 0xff.toByte; bytes(25) = 0xff.toByte
    val m = MediaCodec.decode(bytes)
    assert(m.ok && m.height == 4)
  }
}
