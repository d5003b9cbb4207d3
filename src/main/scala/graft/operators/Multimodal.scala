package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` payloads with typed metadata; decode,
  * feature-extraction, resize and frame-sampling run as partition-local
  * Dataset transforms.
  *
  * The decode step is a clearly marked STUB — this container ships no
  * image/audio codecs — producing a deterministic fake from the payload
  * bytes. Everything AROUND the stub is the real engineering: the
  * schema, the typed Dataset API, the mapPartitions batch shape (decoder
  * state initialized once per partition, streamed row-by-row — exactly
  * how a JNI/FFI codec handle would be scoped), and the partitioning
  * story (payloads hash-partition by media_id; feature vectors are
  * fixed-length `Array[Float]` ready for the ANN operators in
  * [[graft.functions.SimilarityFunctions]]).
  *
  * Scale: payload bytes never shuffle — decode/featurize are narrow;
  * only the small (media_id, features, meta) projection flows into
  * joins/aggregations downstream.
  */
object Multimodal {

  /** Opaque media payload + typed metadata (the lakehouse-standard
    * binary-column layout).
    */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      meta: MediaMeta)

  final case class MediaMeta(
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  /** Decoded representation: a float tensor flattened row-major +
    * its shape (what a real image decode would produce). `sample_rate`
    * is nonzero only for audio decoded from a real container (parsed
    * out of the WAV fmt chunk, NOT copied from the metadata column —
    * that difference is what lets the oracle gate the header parse).
    */
  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      shape: Seq[Int],
      tensor: Seq[Float],
      sample_rate: Int = 0)

  /** `hist` carries the raw integer bin counts (exact, engine-portable —
    * this is what the DuckDB oracle reproduces); `features` is the
    * normalized float32 view the ANN operators consume.
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      hist: Seq[Int],
      features: Seq[Float])

  val FeatureDim = 16

  /** STUB decoder — ??? in spirit: a real implementation would hand
    * `payload` to an image/audio codec. The deterministic fake maps each
    * payload byte to a float in [0,1) so downstream shapes are honest:
    * images decode to (height, width) tensors, audio to (n_samples,).
    * Since round 6 this is only the fallback for payloads that are not
    * a container this engine decodes for real (see [[decodeBmp]] /
    * [[decodeWav]] / [[decodeAvi]]).
    */
  private def decodeStub(r: MediaRecord): DecodedMedia = {
    val floats = r.payload.map(b => ((b & 0xff).toFloat) / 256f).toSeq
    val shape = r.kind match {
      case "image" =>
        val w = math.max(r.meta.width, 1)
        Seq(math.max(floats.size / w, 1), w)
      case _ => Seq(floats.size)
    }
    DecodedMedia(r.media_id, r.kind, shape, floats)
  }

  // ------------------------------------------------------------------
  // Real pure-JVM codecs: uncompressed 24-bpp BI_RGB BMP, non-
  // interlaced 8-bit RGB/RGBA PNG (zlib via java.util.zip.Inflater),
  // PCM-16 WAV, and uncompressed 24-bpp DIB AVI need no native
  // libraries — header math over the byte array, plus the JDK's own
  // zlib for PNG — so all three media kinds decode for REAL; anything
  // else falls back to the clearly labeled stub above.
  // ------------------------------------------------------------------

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Copy one DIB pixel area (stride-padded BGR rows, bottom-up or
    * top-down) into a top-down RGB float tensor slice — the layout
    * transform shared by the BMP and AVI decoders.
    */
  private def dibToRgbFloats(p: Array[Byte], srcBase: Int, w: Int, h: Int,
      stride: Int, bottomUp: Boolean, out: Array[Float], dstBase: Int): Unit = {
    var row = 0
    while (row < h) {
      val fileRow = if (bottomUp) h - 1 - row else row
      val base = srcBase + fileRow * stride
      var x = 0
      while (x < w) {
        val o = base + x * 3 // stored B,G,R
        val d = dstBase + (row * w + x) * 3
        out(d) = (p(o + 2) & 0xff) / 255f
        out(d + 1) = (p(o + 1) & 0xff) / 255f
        out(d + 2) = (p(o) & 0xff) / 255f
        x += 1
      }
      row += 1
    }
  }

  /** Inverse of [[dibToRgbFloats]]: write a top-down RGB byte image as
    * a bottom-up stride-padded BGR DIB pixel area — shared by the BMP
    * and AVI encoders.
    */
  private def rgbToDib(rgbTopDown: Array[Byte], w: Int, h: Int,
      stride: Int, out: Array[Byte], dstBase: Int): Unit = {
    var row = 0
    while (row < h) {
      val base = dstBase + (h - 1 - row) * stride
      var x = 0
      while (x < w) {
        val s = (row * w + x) * 3
        out(base + x * 3) = rgbTopDown(s + 2) // B
        out(base + x * 3 + 1) = rgbTopDown(s + 1) // G
        out(base + x * 3 + 2) = rgbTopDown(s) // R
        x += 1
      }
      row += 1
    }
  }

  /** Parse an uncompressed 24-bpp BI_RGB BMP (the format JDK ImageIO
    * writes) into a canonical top-down, RGB-channel-order float tensor
    * in [0,1], shape (height, width, 3). Handles bottom-up (positive
    * height — the common case, rows stored last-first) and top-down
    * (negative height) files, and the 4-byte row-stride padding.
    * Returns None for any other BMP variant (palette, RLE, 16/32-bpp),
    * which then falls back to the stub.
    */
  private[graft] def decodeBmp(r: MediaRecord): Option[DecodedMedia] = {
    val p = r.payload
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val dataOffset = le32(p, 10)
    val w = le32(p, 18)
    val rawH = le32(p, 22)
    val bpp = le16(p, 28)
    val compression = le32(p, 30)
    if (bpp != 24 || compression != 0 || w <= 0 || rawH == 0) return None
    val h = math.abs(rawH)
    val bottomUp = rawH > 0
    // dimension sanity BEFORE any Int arithmetic: a crafted/garbage
    // header (w ≈ 2^30) would overflow stride and the tensor size into
    // negative values, crashing the task — a non-BMP payload must fall
    // back to the stub, never throw
    if (h <= 0 || // abs(Int.MinValue) is still negative
      w > (1 << 20) || h > (1 << 20) || w.toLong * h * 3 > p.length.toLong)
      return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (dataOffset < 0 || dataOffset.toLong + stride.toLong * h > p.length)
      return None
    val out = new Array[Float](h * w * 3)
    dibToRgbFloats(p, dataOffset, w, h, stride, bottomUp, out, 0)
    Some(DecodedMedia(r.media_id, r.kind, Seq(h, w, 3), out.toSeq))
  }

  // PNG needs no native codec either: zlib IS in the JVM
  // (java.util.zip.Inflater/Deflater), and the rest of the format is
  // chunk walking, CRC32 and per-row filter arithmetic.

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse a non-interlaced 8-bit-depth truecolor PNG (color type 2 =
    * RGB or 6 = RGBA) into a top-down float tensor in [0,1], shape
    * (height, width, channels): chunk walk with CRC32 verification,
    * all-IDAT concatenation, `java.util.zip.Inflater` decompression,
    * and per-row unfiltering of ALL five PNG filter types (None, Sub,
    * Up, Average, Paeth). Returns None — stub fallback — for palette /
    * grayscale / 16-bit / interlaced variants, CRC mismatches, or
    * truncated streams; a garbage payload must never throw.
    */
  private[graft] def decodePng(r: MediaRecord): Option[DecodedMedia] = {
    val p = r.payload
    if (p.length < 8 + 25 || !PngSig.indices.forall(i => p(i) == PngSig(i)))
      return None
    var off = 8
    var w = 0; var h = 0; var channels = 0
    var seenIhdr = false
    var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32
    while (!seenIend && off + 12 <= p.length) {
      val len = be32(p, off)
      if (len < 0 || off.toLong + 12 + len > p.length) return None
      val typ = new String(p, off + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(p, off + 4, 4 + len)
      if (crc.getValue.toInt != be32(p, off + 8 + len)) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(p, off + 8)
          h = be32(p, off + 12)
          val bitDepth = p(off + 16) & 0xff
          val colorType = p(off + 17) & 0xff
          val interlace = p(off + 20) & 0xff
          channels = colorType match {
            case 2 => 3
            case 6 => 4
            case _ => return None // palette/gray → stub fallback
          }
          if (bitDepth != 8 || interlace != 0 || w <= 0 || h <= 0 ||
            w > (1 << 20) || h > (1 << 20) ||
            w.toLong * h * channels > (1 << 28)) return None
          seenIhdr = true
        case "IDAT" => idat.write(p, off + 8, len)
        case "IEND" => seenIend = true
        case _ => // ancillary chunks (tEXt, pHYs, ...) skip
      }
      off += 12 + len
    }
    if (!seenIhdr || !seenIend || idat.size == 0) return None
    val bpp = channels // bytes per pixel at bit depth 8
    val rowLen = w * bpp
    val raw = new Array[Byte](h * (1 + rowLen))
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // n == 0 without finishing means no forward progress is
        // possible: truncated stream (needsInput), or a preset-
        // dictionary header (FDICT — valid zlib, never produced for
        // PNG, and inflate() would return 0 forever). Malformed-input
        // contract is "return None", never hang or throw.
        if (n == 0) return None
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // unfilter in place into `img` (top-down raw scanlines): PNG
    // filters predict each byte from a (left), b (up), c (up-left) of
    // the RECONSTRUCTED image — row order matters, filters don't nest
    val img = new Array[Byte](h * rowLen)
    var row = 0
    while (row < h) {
      val ft = raw(row * (1 + rowLen)) & 0xff
      if (ft > 4) return None
      val src = row * (1 + rowLen) + 1
      val dst = row * rowLen
      var i = 0
      while (i < rowLen) {
        val x = raw(src + i) & 0xff
        val a = if (i >= bpp) img(dst + i - bpp) & 0xff else 0
        val b = if (row > 0) img(dst - rowLen + i) & 0xff else 0
        val c = if (row > 0 && i >= bpp) img(dst - rowLen + i - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => // Paeth predictor
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        img(dst + i) = rec.toByte
        i += 1
      }
      row += 1
    }
    val out = new Array[Float](h * rowLen)
    var i = 0
    while (i < out.length) { out(i) = (img(i) & 0xff) / 255f; i += 1 }
    Some(DecodedMedia(r.media_id, r.kind, Seq(h, w, channels), out.toSeq))
  }

  /** Encode a top-down 8-bit image (`channels` = 3 RGB or 4 RGBA) as a
    * non-interlaced PNG — the inverse of [[decodePng]]. Each scanline
    * uses filter type `row % 5`, so a round-trip (and the oracle gate
    * over payloads this produces) exercises EVERY unfilter path, not
    * just the trivial one; the decoded image is filter-invariant by
    * construction, which is what keeps the oracle construction-only.
    */
  def encodePng(width: Int, height: Int, channels: Int,
      topDown: Array[Byte]): Array[Byte] = {
    require(channels == 3 || channels == 4, s"channels=$channels")
    require(topDown.length == width * height * channels,
      s"need ${width * height * channels} bytes, got ${topDown.length}")
    val bpp = channels
    val rowLen = width * bpp
    // filter (the encode direction): f(x) over RAW bytes of this and
    // the previous RAW row, mod 256
    val raw = new Array[Byte](height * (1 + rowLen))
    var row = 0
    while (row < height) {
      val ft = row % 5
      raw(row * (1 + rowLen)) = ft.toByte
      var i = 0
      while (i < rowLen) {
        val x = topDown(row * rowLen + i) & 0xff
        val a = if (i >= bpp) topDown(row * rowLen + i - bpp) & 0xff else 0
        val b = if (row > 0) topDown((row - 1) * rowLen + i) & 0xff else 0
        val c = if (row > 0 && i >= bpp)
          topDown((row - 1) * rowLen + i - bpp) & 0xff else 0
        val filtered = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(row * (1 + rowLen) + 1 + i) = filtered.toByte
        i += 1
      }
      row += 1
    }
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION)
    val compressed = try {
      deflater.setInput(raw)
      deflater.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
      buf.toByteArray
    } finally deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(tb, 0, 4)
      crc.update(data, 0, data.length)
      val v = crc.getValue.toInt
      out.write(Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    def w32(o: Int, v: Int): Unit = {
      ihdr(o) = (v >>> 24).toByte; ihdr(o + 1) = (v >>> 16).toByte
      ihdr(o + 2) = (v >>> 8).toByte; ihdr(o + 3) = v.toByte
    }
    w32(0, width); w32(4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (channels == 3) 2 else 6).toByte // RGB | RGBA
    // compression 0, filter 0, interlace 0 already zeroed
    chunk("IHDR", ihdr)
    chunk("IDAT", compressed)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** [[encodePng]] for plain RGB — the counterpart of [[encodeBmp24]]. */
  def encodePng24(width: Int, height: Int, rgbTopDown: Array[Byte]): Array[Byte] =
    encodePng(width, height, 3, rgbTopDown)

  /** Parse a RIFF/WAVE container with PCM 16-bit samples: walk the
    * chunk list (tolerating extra chunks in any order, odd-size word
    * padding included), read channels + sample rate from `fmt `, samples
    * from `data`. Output floats in [-1,1) (sample/32768), shape
    * (n_frames, channels) for multi-channel, (n_samples,) for mono; the
    * parsed sample rate rides [[DecodedMedia.sample_rate]]. Returns
    * None for non-PCM or non-16-bit audio → stub fallback.
    */
  private[graft] def decodeWav(r: MediaRecord): Option[DecodedMedia] = {
    val p = r.payload
    if (p.length < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
      p(3) != 'F' || p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E')
      return None
    var off = 12
    var fmtOk = false
    var channels = 0
    var sampleRate = 0
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= p.length) {
      val id = new String(p, off, 4, "US-ASCII")
      val sz = le32(p, off + 4)
      // long arithmetic: a crafted sz near Int.MaxValue would wrap the
      // Int sum negative, pass the bound check, and crash the task
      if (sz < 0 || off.toLong + 8 + sz > p.length) return None
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val audioFormat = le16(p, off + 8)
          channels = le16(p, off + 10)
          sampleRate = le32(p, off + 12)
          val bits = le16(p, off + 22)
          if (audioFormat != 1 || bits != 16 || channels < 1) return None
          fmtOk = true
        case "data" => data = Some((off + 8, sz))
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    (data, fmtOk) match {
      case (Some((dOff, dLen)), true) =>
        val n = dLen / 2
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          out(i) = le16(p, dOff + 2 * i).toShort / 32768f
          i += 1
        }
        val shape =
          if (channels > 1) Seq(n / channels, channels) else Seq(n)
        Some(DecodedMedia(r.media_id, r.kind, shape, out.toSeq, sampleRate))
      case _ => None
    }
  }

  /** Parse an uncompressed 24-bpp DIB AVI (RIFF 'AVI ' container):
    * walk LIST('hdrl') for the stream header (fps = dwRate/dwScale,
    * parsed — not copied from metadata — so the oracle gates the header
    * walk) and the BITMAPINFOHEADER (dimensions, bpp, compression),
    * then LIST('movi') for the stream-0 '00db'/'00dc' frame chunks,
    * each a BGR DIB like a BMP's pixel area (bottom-up for positive
    * biHeight, top-down for negative, exactly as [[decodeBmp]]).
    * Output: top-down RGB floats, shape (n_frames, height, width, 3),
    * fps in [[DecodedMedia.sample_rate]] (frames/sec IS the stream's
    * sample rate). None for compressed, non-24-bpp, or
    * multi-video-stream variants → stub fallback.
    */
  private[graft] def decodeAvi(r: MediaRecord): Option[DecodedMedia] = {
    val p = r.payload
    if (p.length < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
      p(3) != 'F' || p(8) != 'A' || p(9) != 'V' || p(10) != 'I' || p(11) != ' ')
      return None
    var w = 0; var h = 0; var fps = 0
    var bottomUp = true
    var vidStreams = 0
    var ok = true
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (ok && off + 8 <= to) {
        val id = new String(p, off, 4, "US-ASCII")
        val sz = le32(p, off + 4)
        // long arithmetic: a crafted sz near Int.MaxValue would wrap
        // the Int sum negative, pass the bound check, and walk out of
        // the array — garbage must fall back to the stub, never throw
        if (sz < 0 || off.toLong + 8 + sz > to) { ok = false; return }
        id match {
          case "LIST" => walk(off + 12, off + 8 + sz) // skip subtype tag
          case "strh" if sz >= 32 =>
            val fcc = new String(p, off + 8, 4, "US-ASCII")
            if (fcc == "vids") {
              vidStreams += 1
              if (vidStreams > 1) ok = false // only single-video files
              else {
                val scale = le32(p, off + 8 + 20)
                val rate = le32(p, off + 8 + 24)
                if (scale > 0) fps = rate / scale
              }
            }
          case "strf" if sz >= 40 && w == 0 =>
            w = le32(p, off + 8 + 4)
            val rawH = le32(p, off + 8 + 8)
            h = math.abs(rawH) // negative biHeight = top-down rows
            bottomUp = rawH > 0
            val bpp = le16(p, off + 8 + 14)
            val comp = le32(p, off + 8 + 16)
            if (bpp != 24 || comp != 0 || rawH == 0) ok = false
          // stream-number prefix gates collection: '01db' etc. belong
          // to OTHER streams and must not land in this tensor
          case "00db" | "00dc" =>
            frames += ((off + 8, sz))
          case _ => // skip
        }
        off += 8 + sz + (sz & 1) // word alignment
      }
    }
    walk(12, p.length)
    if (!ok || w <= 0 || h <= 0 || // abs(Int.MinValue) is still negative
      w > (1 << 20) || h > (1 << 20) ||
      frames.isEmpty || frames.length > (1 << 16)) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (frames.exists { case (_, sz) => sz < stride.toLong * h }) return None
    if (frames.length.toLong * h * w * 3 > Int.MaxValue) return None
    val out = new Array[Float](frames.length * h * w * 3)
    var fi = 0
    while (fi < frames.length) {
      val (fOff, _) = frames(fi)
      dibToRgbFloats(p, fOff, w, h, stride, bottomUp, out, fi * h * w * 3)
      fi += 1
    }
    Some(DecodedMedia(r.media_id, r.kind, Seq(frames.length, h, w, 3),
      out.toSeq, fps))
  }

  /** Encode frames (each top-down RGB, all `width`×`height`) as an
    * uncompressed 24-bpp DIB AVI — the inverse of [[decodeAvi]].
    */
  def encodeAvi24(width: Int, height: Int, fps: Int,
      framesRgb: Seq[Array[Byte]]): Array[Byte] = {
    require(framesRgb.nonEmpty, "at least one frame")
    framesRgb.foreach(f => require(f.length == width * height * 3,
      s"frame needs ${width * height * 3} bytes, got ${f.length}"))
    val stride = ((width * 3 + 3) / 4) * 4
    val frameLen = stride * height // stride is 4-aligned → no chunk pad
    val moviLen = 4 + framesRgb.size * (8 + frameLen)
    val strlLen = 4 + 8 + 56 + 8 + 40
    val hdrlLen = 4 + 8 + 56 + 8 + strlLen
    val riffLen = 4 + 8 + hdrlLen + 8 + moviLen
    val out = new Array[Byte](8 + riffLen)
    var pos = 0
    def w16(v: Int): Unit = { out(pos) = v.toByte; out(pos + 1) = (v >> 8).toByte; pos += 2 }
    def w32(v: Int): Unit = {
      out(pos) = v.toByte; out(pos + 1) = (v >> 8).toByte
      out(pos + 2) = (v >> 16).toByte; out(pos + 3) = (v >> 24).toByte; pos += 4
    }
    def tag(s: String): Unit = { s.getBytes("US-ASCII").copyToArray(out, pos); pos += 4 }
    tag("RIFF"); w32(riffLen); tag("AVI ")
    tag("LIST"); w32(hdrlLen); tag("hdrl")
    tag("avih"); w32(56)
    w32(if (fps > 0) 1000000 / fps else 0); w32(0); w32(0); w32(0)
    w32(framesRgb.size); w32(0); w32(1); w32(0)
    w32(width); w32(height); w32(0); w32(0); w32(0); w32(0)
    tag("LIST"); w32(strlLen); tag("strl")
    tag("strh"); w32(56)
    tag("vids"); tag("DIB "); w32(0); w32(0) // flags, prio+lang
    w32(0); w32(1); w32(fps) // initialFrames, dwScale=1, dwRate=fps
    w32(0); w32(framesRgb.size); w32(frameLen); w32(0); w32(0)
    w16(0); w16(0); w16(width); w16(height) // rcFrame
    tag("strf"); w32(40)
    w32(40); w32(width); w32(height); w16(1); w16(24)
    w32(0); w32(frameLen); w32(0); w32(0); w32(0); w32(0)
    tag("LIST"); w32(moviLen); tag("movi")
    framesRgb.foreach { rgb =>
      tag("00db"); w32(frameLen)
      rgbToDib(rgb, width, height, stride, out, pos)
      pos += frameLen
    }
    require(pos == out.length, s"layout bug: $pos != ${out.length}")
    out
  }

  /** Encode a canonical (top-down, RGB) byte image as a standard
    * bottom-up 24-bpp BI_RGB BMP — the exact inverse of [[decodeBmp]],
    * used to synthesize real container payloads deterministically (the
    * oracle query) and as the spec's round-trip counterpart.
    * `rgbTopDown.length` must be `width * height * 3`.
    */
  def encodeBmp24(width: Int, height: Int, rgbTopDown: Array[Byte]): Array[Byte] = {
    require(rgbTopDown.length == width * height * 3,
      s"need ${width * height * 3} bytes, got ${rgbTopDown.length}")
    val stride = ((width * 3 + 3) / 4) * 4
    val dataLen = stride * height
    val out = new Array[Byte](54 + dataLen)
    def w16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    w32(2, 54 + dataLen); w32(10, 54)
    w32(14, 40); w32(18, width); w32(22, height) // positive → bottom-up
    w16(26, 1); w16(28, 24); w32(30, 0); w32(34, dataLen)
    rgbToDib(rgbTopDown, width, height, stride, out, 54)
    out
  }

  /** Encode PCM-16 mono samples as a minimal RIFF/WAVE file — the
    * inverse of [[decodeWav]].
    */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def w16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, o)
    tag(0, "RIFF"); w32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, 1)
    w32(24, sampleRate); w32(28, sampleRate * 2); w16(32, 2); w16(34, 16)
    tag(36, "data"); w32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      w16(44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a media Dataset. Partition-local: the codec is instantiated
    * once per partition and streamed — the batch shape a real FFI
    * decoder needs. BMP, PNG, WAV and AVI payloads (by magic bytes)
    * decode for REAL via the pure-JVM parsers above; anything else
    * falls back to the deterministic stub.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec handle would be created HERE, once per partition
      it.map { r =>
        val p = r.payload
        val parsed =
          if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') decodeBmp(r)
          else if (p.length >= 8 && p(0) == PngSig(0) && p(1) == 'P')
            decodePng(r)
          else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' &&
            p(2) == 'F' && p(3) == 'F') {
            // RIFF: the format tag at bytes 8-11 picks the codec
            if (p(8) == 'A' && p(9) == 'V' && p(10) == 'I') decodeAvi(r)
            else decodeWav(r)
          } else None
        parsed.getOrElse(decodeStub(r))
      }
    }
  }

  /** Fixed-length feature extraction straight from payloads (decode
    * fused in — one pass, no tensor materialization): a 16-bin byte
    * histogram normalized to sum 1. Deterministic, codec-free, and the
    * output feeds the cosine/ANN operators unchanged.
    */
  def features(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val hist = new Array[Int](FeatureDim)
        r.payload.foreach(b => hist((b & 0xff) / FeatureDim) += 1)
        val n = math.max(r.payload.length, 1)
        MediaFeatures(r.media_id, r.kind, r.payload.length, hist.toSeq,
          hist.map(_.toFloat / n).toSeq)
      }
    }
  }

  /** Frame sampling: split a (fake) video payload into `n` evenly
    * spaced frame slices — the schema/partitioning shape of real frame
    * extraction (output is `array<binary>`, one element per frame).
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val frames = if (r.payload.isEmpty) Seq.empty[Array[Byte]]
      else (0 until n).map { i =>
        val start = (r.payload.length.toLong * i / n).toInt
        val end = (r.payload.length.toLong * (i + 1) / n).toInt
        java.util.Arrays.copyOfRange(r.payload, start, math.max(end, start))
      }
      (r.media_id, r.kind, frames)
    }.toDF("media_id", "kind", "frames")
  }

  /** "Resize" = metadata-plane transform (a real one would re-encode the
    * payload; the stub scales meta and keeps bytes — schema-honest).
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** Synthesize REAL container payloads from the documents corpus:
    * even doc_ids become images — 24-bpp BMPs for `id % 4 == 0`, RGB
    * PNGs (zlib-deflated, per-row filters cycling through all five
    * types) for `id % 4 == 2` — with the SAME pixel construction (text
    * bytes as top-down RGB, width 5, zero-padded to fill the last
    * row), so the decoded tensor — and therefore the oracle — is
    * container-independent while the Spark side must run two entirely
    * different real decoders to agree. Odd doc_ids become PCM-16 WAVs
    * (consecutive byte pairs as little-endian samples, sample rate
    * varied by doc_id so the oracle gates the fmt header parse).
    * Deterministic byte-for-byte, so the DuckDB oracle reproduces the
    * decoded statistics straight from encode(text) without parsing any
    * container — while the Spark side must parse the real headers
    * (BMP stride padding and bottom-up rows; PNG chunk CRCs, inflate
    * and unfilter; WAV chunk walk and sample signs) to agree.
    */
  def fromDocumentsEncoded(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        if (id % 2 == 0) {
          val w = 5
          val h = math.max((bytes.length + w * 3 - 1) / (w * 3), 1)
          val rgb = java.util.Arrays.copyOf(bytes, w * h * 3)
          val payload =
            if (id % 4 == 0) encodeBmp24(w, h, rgb) else encodePng24(w, h, rgb)
          MediaRecord(id, "image", payload, MediaMeta(w, h, 0, 1))
        } else {
          val sr = 8000 + (id % 3).toInt * 4000
          val n = bytes.length / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) =
              ((bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)).toShort
            i += 1
          }
          MediaRecord(id, "audio", encodeWavPcm16(sr, samples),
            MediaMeta(0, 0, sr, 1))
        }
    }
  }

  /** Synthesize real AVI video payloads from the documents corpus:
    * each document's bytes split into 4 evenly-bounded frame slices
    * (the [[sampleFrames]] boundary formula: frame f = bytes
    * [L·f/4, L·(f+1)/4)), each zero-padded to a width-5 RGB frame, at
    * a per-document frame rate (8 + doc_id % 5, so the oracle gates
    * the strh rate parse). Deterministic byte-for-byte.
    */
  def videoFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    val nf = 4
    val w = 5
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val L = bytes.length
        val maxSlice = (L + nf - 1) / nf
        val h = math.max((maxSlice + w * 3 - 1) / (w * 3), 1)
        val frames = (0 until nf).map { f =>
          val s = (L.toLong * f / nf).toInt
          val e = (L.toLong * (f + 1) / nf).toInt
          val rgb = new Array[Byte](w * h * 3)
          System.arraycopy(bytes, s, rgb, 0, e - s)
          rgb
        }
        MediaRecord(id, "video",
          encodeAvi24(w, h, 8 + (id % 5).toInt, frames),
          MediaMeta(w, h, 0, nf))
    }
  }

  /** Synthesize a media table from the documents corpus: payload =
    * UTF-8 bytes of the text (deterministic, reproducible in the DuckDB
    * oracle via encode()). kind cycles by doc_id.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
        col("text").cast(BinaryType).as("payload"),
        struct(
          lit(32).as("width"), lit(32).as("height"),
          lit(16000).as("sample_rate"), lit(8).as("n_frames")).as("meta"))
      .as[MediaRecord]
  }
}
