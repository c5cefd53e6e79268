package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns plus typed metadata, following the
  * convention of large-scale multimodal dataset formats (one row per
  * sample, media inline or by reference).
  *
  * Three REAL pure-JVM containers cover the family's decode paths:
  * [[WavCodec]] (audio), [[BmpCodec]] (image), [[AviCodec]] (video).
  * Only formats that genuinely need native codec libs
  * (JPEG/MP4/MP3/…, not present in this container) fall back to the
  * clearly-marked deterministic stub [[FakeDecoder]]; everything
  * Spark-side — schema, batch shape, partition-wise execution,
  * feature extraction contract — is real and tested either way. Swap
  * [[FakeDecoder]] for a JNI/javacpp codec in production.
  *
  * Scale notes: decode runs as `mapPartitions` over the sample rows,
  * i.e., embarrassingly parallel, no shuffle; payload bytes never
  * leave the executor that read them. Feature vectors (small) are
  * what flows into downstream joins/aggregations.
  */
object Multimodal {

  /** Standard media-sample schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("sample_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
  ))

  /** Decoded-feature record produced by the decode kernel. */
  case class MediaFeatures(
      sample_id: Long,
      media_type: String,
      n_bytes: Long,
      sha256_hex: String,
      // stubbed "decoded" features — deterministic from the payload
      mean_intensity: Double,
      feature_vec: Array[Float])

  /** Deterministic fake decoder standing in for image/audio codecs
    * (libs not present in this container). Produces stable
    * pseudo-features from the payload bytes so the pipeline shape is
    * fully exercisable and testable.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte], dims: Int = 8): (Double, Array[Float]) = {
      if (payload == null || payload.isEmpty) (0.0, Array.fill(dims)(0f))
      else {
        var sum = 0L
        var i = 0
        while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
        val mean = sum.toDouble / payload.length
        val vec = Array.tabulate(dims) { d =>
          // cheap rolling mix — NOT a real feature, a stand-in
          var h = 1125899906842597L + d
          var j = 0
          while (j < payload.length) { h = 31 * h + (payload(j) & 0xff); j += 1 }
          ((h % 1000003L).toFloat / 1000003f)
        }
        (mean, vec)
      }
    }
  }

  /** Magic-byte-dispatching decoder for the GENERIC feature path:
    * containers this repo can fully parse (RIFF/WAVE, BMP, RIFF-AVI,
    * PNG via the JDK's imageio) decode for REAL — features come from
    * the actual PCM samples / pixel bytes — and only unparseable
    * formats (JPEG/MP4/... — no pure-JVM codec here) fall back to
    * [[FakeDecoder]]. A container
    * that declares a known magic but fails to parse also falls back
    * (the generic path must never throw on one bad sample).
    *
    * Real-branch feature contract, deterministic and oracle-able:
    * the decoded signal is PCM sample values (WAV), unsigned pixel
    * bytes (BMP), or concatenated frame pixel bytes (AVI); mean =
    * left-to-right double mean over the signal; feature s of `dims`
    * is the mean over the contiguous segment
    * [s·n/dims, (s+1)·n/dims) (integer bounds, empty segment → 0),
    * narrowed to float once per segment.
    */
  object MediaDecoder {
    private def magic(p: Array[Byte], at: Int, s: String): Boolean =
      p.length >= at + s.length &&
        s.indices.forall(i => (p(at + i) & 0xff) == s.charAt(i).toInt)

    def decode(payload: Array[Byte], dims: Int = 8): (Double, Array[Float]) = {
      val p = if (payload == null) Array.emptyByteArray else payload
      try {
        if (magic(p, 0, "RIFF") && magic(p, 8, "WAVE"))
          fromSignal(WavCodec.decodeSamples(p)._3.map(_.toDouble), dims)
        else if (magic(p, 0, "BM"))
          fromSignal(BmpCodec.decodePixels(p)._3.map(b => (b & 0xff).toDouble), dims)
        else if (magic(p, 0, "RIFF") && magic(p, 8, "AVI "))
          fromSignal(AviCodec.decodeFrames(p)._2.flatten.map(b => (b & 0xff).toDouble), dims)
        else if (p.length >= 4 && (p(0) & 0xff) == 0x89 && magic(p, 1, "PNG"))
          fromSignal(PngCodec.decodePixels(p)._3.map(b => (b & 0xff).toDouble), dims)
        else FakeDecoder.decode(p, dims)
      } catch {
        case scala.util.control.NonFatal(_) => FakeDecoder.decode(p, dims)
      }
    }

    private[graft] def fromSignal(xs: Array[Double], dims: Int): (Double, Array[Float]) = {
      if (xs.isEmpty) return (0.0, Array.fill(dims)(0f))
      var sum = 0.0
      var i = 0
      while (i < xs.length) { sum += xs(i); i += 1 }
      val vec = Array.tabulate(dims) { s =>
        val lo = s * xs.length / dims
        val hi = (s + 1) * xs.length / dims
        if (hi <= lo) 0f
        else {
          var acc = 0.0
          var j = lo
          while (j < hi) { acc += xs(j); j += 1 }
          (acc / (hi - lo)).toFloat
        }
      }
      (sum / xs.length, vec)
    }
  }

  /** Real pure-JVM audio codec: canonical RIFF/WAVE PCM. Unlike
    * [[FakeDecoder]], this parses an actual interchange format — the
    * one media container fully decodable with zero native libs — so
    * the decode path of the multimodal pipeline exercises a REAL
    * header walk, endianness, and sample extraction (m04's oracle
    * pins the roundtrip: values decoded from the bytes must equal
    * values DuckDB derives from the ground-truth signal).
    * [[FakeDecoder]] remains the stand-in for formats that need
    * native codecs (JPEG/MP4/...).
    */
  object WavCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    /** Canonical 44-byte-header mono/stereo PCM16 WAV writer. */
    def encodePcm16(samples: Array[Short], sampleRate: Int,
        channels: Int = 1): Array[Byte] = {
      require(sampleRate > 0 && channels > 0, "bad wav params")
      require(samples.length % channels == 0, "samples not frame-aligned")
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1) // PCM
      bb.putShort(channels.toShort)
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * channels * 2) // byte rate
      bb.putShort((channels * 2).toShort) // block align
      bb.putShort(16)
      bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    /** Decoded header + signal statistics. `rms`/`mean_abs` are over
      * all channel samples; sums of exactly-representable integer
      * squares, so bit-stable across engines.
      */
    case class WavInfo(
        sampleRate: Int, channels: Int, bitsPerSample: Int,
        nSamples: Long, durationMs: Long, meanAbs: Double, rms: Double)

    /** Shared chunk walk: (channels, rate, bits, dataOff, dataLen). */
    private def parseHeader(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
      require(bytes != null && bytes.length >= 44, "not a wav: too short")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def fourCC(at: Int): String =
        new String(bytes, at, 4, "US-ASCII")
      require(fourCC(0) == "RIFF" && fourCC(8) == "WAVE",
        s"not a wav: magic ${fourCC(0)}/${fourCC(8)}")
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[(Int, Int)] = None // (offset, len)
      while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = fourCC(pos)
        val size = bb.getInt(pos + 4)
        require(size >= 0 && pos + 8 + size <= bytes.length,
          s"truncated chunk $id at $pos (size $size)")
        id match {
          case "fmt " =>
            require(size >= 16, s"fmt chunk too short: $size")
            val audioFormat = bb.getShort(pos + 8) & 0xffff
            require(audioFormat == 1, s"unsupported wav format $audioFormat (PCM only)")
            val channels = bb.getShort(pos + 10) & 0xffff
            val rate = bb.getInt(pos + 12)
            val bits = bb.getShort(pos + 22) & 0xffff
            require(channels > 0 && rate > 0, "bad fmt chunk")
            require(bits == 16, s"unsupported bits/sample $bits (PCM16 only)")
            fmt = Some((channels, rate, bits))
          case "data" => data = Some((pos + 8, size))
          case _ => () // LIST/INFO/fact/... — skip
        }
        pos += 8 + size + (size & 1) // RIFF pads odd chunks to even
      }
      val (channels, rate, bits) = fmt.getOrElse(
        throw new IllegalArgumentException("wav has no fmt chunk"))
      val (off, len) = data.getOrElse(
        throw new IllegalArgumentException("wav has no data chunk"))
      (channels, rate, bits, off, len)
    }

    /** Full sample decode: (rate, channels, interleaved PCM16) — the
      * materializing sibling of [[decode]] for transforms that need
      * the signal itself (resampling). Same validation and chunk
      * handling.
      */
    def decodeSamples(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
      val (channels, rate, _, off, len) = parseHeader(bytes)
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val n = (len / (channels * 2)) * channels
      val out = new Array[Short](n)
      var i = 0
      while (i < n) { out(i) = bb.getShort(off + i * 2); i += 1 }
      (rate, channels, out)
    }

    /** Chunk-walking RIFF parser: validates magic, honors RIFF's
      * even-byte chunk padding, finds `fmt ` and `data` wherever they
      * sit (real encoders emit LIST/INFO chunks between them), and
      * rejects non-PCM or non-16-bit streams loudly instead of
      * misreading them.
      */
    def decode(bytes: Array[Byte]): WavInfo = {
      val (channels, rate, bits, off, len) = parseHeader(bytes)
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val frames = len / (channels * 2)
      val n = frames.toLong * channels
      var sumAbs = 0.0
      var sumSq = 0.0
      var i = 0
      while (i < n) {
        val s = bb.getShort(off + i * 2).toDouble
        sumAbs += math.abs(s)
        sumSq += s * s
        i += 1
      }
      WavInfo(rate, channels, bits, frames.toLong,
        frames.toLong * 1000L / rate,
        if (n == 0) 0.0 else sumAbs / n,
        if (n == 0) 0.0 else math.sqrt(sumSq / n))
    }
  }

  /** Real pure-JVM image codec: uncompressed 24-bit BMP
    * (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB). The second
    * native-lib-free interchange format after [[WavCodec]], and the
    * one with the two classic parser traps: pixel rows are stored
    * BOTTOM-UP (positive biHeight) and every stored row is padded to
    * a 4-byte boundary — a decoder that walks the data section
    * top-down or assumes stride = 3·width reads garbage that still
    * "looks decoded". m05's oracle pins both: the reported top-left
    * pixel lives in the LAST stored row, and the file size embeds the
    * stride.
    */
  object BmpCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    private def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

    /** Canonical 54-byte-header 24bpp bottom-up BMP writer. `pixels`
      * is (b, g, r) triples in IMAGE order (row 0 = top), length
      * width*height.
      */
    def encodeBgr24(pixels: Array[(Byte, Byte, Byte)], width: Int,
        height: Int): Array[Byte] = {
      require(width > 0 && height > 0, "bad bmp dims")
      require(pixels.length == width * height, "pixels != width*height")
      val stride = rowStride(width)
      val dataLen = stride * height
      val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte); bb.put('M'.toByte)
      bb.putInt(54 + dataLen) // file size
      bb.putInt(0) // reserved
      bb.putInt(54) // pixel data offset
      bb.putInt(40) // BITMAPINFOHEADER size
      bb.putInt(width)
      bb.putInt(height) // positive => bottom-up
      bb.putShort(1) // planes
      bb.putShort(24) // bpp
      bb.putInt(0) // BI_RGB
      bb.putInt(dataLen)
      bb.putInt(2835); bb.putInt(2835) // 72 dpi
      bb.putInt(0); bb.putInt(0) // palette
      var sr = 0
      while (sr < height) {
        val imageRow = height - 1 - sr // bottom-up: stored row 0 = last image row
        var c = 0
        while (c < width) {
          val (b, g, r) = pixels(imageRow * width + c)
          bb.put(b); bb.put(g); bb.put(r)
          c += 1
        }
        var pad = stride - width * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        sr += 1
      }
      bb.array()
    }

    /** Decoded header + per-channel means over ALL pixels, plus the
      * top-left pixel in IMAGE coordinates — which a bottom-up file
      * stores in its final row, so a top-down misread flips it.
      * Integer sums of byte values: bit-stable across engines.
      */
    case class BmpInfo(
        width: Int, height: Int, bitsPerPixel: Int, nPixels: Long,
        meanB: Double, meanG: Double, meanR: Double, topLeftB: Int)

    /** Full pixel decode: (width, height, BGR triplets in IMAGE
      * row-major order) — the materializing sibling of [[decode]] for
      * transforms that need the pixel grid (resize). Same validation
      * and row-order/stride handling.
      */
    def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val info = decode(bytes) // validates header/stride/truncation
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dataOff = bb.getInt(10)
      val topDown = bb.getInt(22) < 0
      val (w, h) = (info.width, info.height)
      val stride = rowStride(w)
      val out = new Array[Byte](w * h * 3)
      var imageRow = 0
      while (imageRow < h) {
        val storedRow = if (topDown) imageRow else h - 1 - imageRow
        System.arraycopy(bytes, dataOff + storedRow * stride,
          out, imageRow * w * 3, w * 3)
        imageRow += 1
      }
      (w, h, out)
    }

    /** Header-validating parser: magic, 24bpp BI_RGB only, honors the
      * declared data offset (palettes/extended headers may push it
      * past 54), the row stride, and both row orders (negative
      * biHeight = top-down, per the spec).
      */
    def decode(bytes: Array[Byte]): BmpInfo = {
      require(bytes != null && bytes.length >= 54, "not a bmp: too short")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
        "not a bmp: bad magic")
      val dataOff = bb.getInt(10)
      val hdrSize = bb.getInt(14)
      require(hdrSize >= 40, s"unsupported bmp header size $hdrSize")
      val width = bb.getInt(18)
      val rawHeight = bb.getInt(22)
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      val bpp = bb.getShort(28) & 0xffff
      val compression = bb.getInt(30)
      require(width > 0 && height > 0, "bad bmp dims")
      require(bpp == 24, s"unsupported bpp $bpp (24 only)")
      require(compression == 0, s"unsupported compression $compression (BI_RGB only)")
      val stride = rowStride(width)
      require(dataOff >= 54 && dataOff.toLong + stride.toLong * height <= bytes.length,
        "truncated bmp pixel data")
      var sumB = 0L; var sumG = 0L; var sumR = 0L
      var topLeftB = -1
      var imageRow = 0
      while (imageRow < height) {
        val storedRow = if (topDown) imageRow else height - 1 - imageRow
        val rowOff = dataOff + storedRow * stride
        if (imageRow == 0) topLeftB = bytes(rowOff) & 0xff
        var c = 0
        while (c < width) {
          sumB += bytes(rowOff + c * 3) & 0xff
          sumG += bytes(rowOff + c * 3 + 1) & 0xff
          sumR += bytes(rowOff + c * 3 + 2) & 0xff
          c += 1
        }
        imageRow += 1
      }
      val n = width.toLong * height
      BmpInfo(width, height, bpp, n,
        sumB.toDouble / n, sumG.toDouble / n, sumR.toDouble / n, topLeftB)
    }
  }

  /** Real COMPRESSED image codec: PNG through the JDK's own
    * `javax.imageio` (a genuine zlib/DEFLATE + filter-prediction
    * codec shipped in every JVM — no native lib, no fake). Unlike
    * the canonical-container [[BmpCodec]]/[[WavCodec]]/[[AviCodec]],
    * the encoded BYTES here are not oracle-derivable (DEFLATE output
    * is encoder-dependent), so m13 pins the lossless ROUND-TRIP
    * instead: decoded pixel statistics must equal what SQL derives
    * from the source text directly — any loss, channel swap, or
    * row-order error in the real compression path breaks the match.
    */
  object PngCodec {
    import java.awt.image.BufferedImage

    /** Encode RGB triples (IMAGE row-major, row 0 = top) as PNG —
      * written directly (signature + IHDR + one zlib IDAT of
      * filter-0 scanlines + IEND, CRC32 per chunk) with
      * `Deflater.BEST_SPEED`. A hand-rolled writer instead of
      * `ImageIO.write` for two reasons: the ImageIO writer path
      * (registry lookup + ImageOutputStream + default-level deflate)
      * measured ~2× the whole roundtrip's budget at bench scale, and
      * encoding ourselves makes the m13 roundtrip a genuinely
      * INDEPENDENT pair — our encoder vs the JDK's decoder.
      */
    def encodeRgb(pixels: Array[(Byte, Byte, Byte)], width: Int,
        height: Int): Array[Byte] = {
      require(width > 0 && height > 0, "bad png dims")
      require(pixels.length == width * height, "pixels != width*height")
      // filter-0 scanlines: 1 filter byte + 3 bytes per pixel
      val stride = 1 + width * 3
      val raw = new Array[Byte](height * stride)
      var y = 0
      while (y < height) {
        val off = y * stride // raw(off) = 0: filter None
        var x = 0
        while (x < width) {
          val (r, g, b) = pixels(y * width + x)
          raw(off + 1 + x * 3) = r
          raw(off + 2 + x * 3) = g
          raw(off + 3 + x * 3) = b
          x += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
      deflater.setInput(raw)
      deflater.finish()
      val zBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val chunk = new Array[Byte](8192)
      while (!deflater.finished())
        zBuf.write(chunk, 0, deflater.deflate(chunk))
      deflater.end()
      val idat = zBuf.toByteArray

      val out = java.nio.ByteBuffer.allocate(8 + 25 + 12 + idat.length + 12)
      out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
      def writeChunk(typ: String, data: Array[Byte]): Unit = {
        out.putInt(data.length)
        val tb = typ.getBytes("US-ASCII")
        out.put(tb); out.put(data)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        out.putInt(crc.getValue.toInt): Unit
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
      ihdr.putInt(width).putInt(height)
      ihdr.put(8.toByte)  // bit depth
      ihdr.put(2.toByte)  // color type: truecolor RGB
      ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
      writeChunk("IHDR", ihdr.array())
      writeChunk("IDAT", idat)
      writeChunk("IEND", Array.emptyByteArray)
      java.util.Arrays.copyOf(out.array(), out.position())
    }

    /** Decoded header + per-channel means + top-left pixel — the
      * [[BmpCodec.BmpInfo]] shape for the RGB channel order.
      */
    case class PngInfo(
        width: Int, height: Int, nPixels: Long,
        meanR: Double, meanG: Double, meanB: Double, topLeftR: Int)

    /** Full pixel decode: (width, height, RGB triplets in IMAGE
      * row-major order).
      *
      * Native chunk-walking decoder for the common web shape —
      * 8-bit-per-channel truecolor (color type 2) and truecolor+alpha
      * (type 6, alpha dropped), non-interlaced, all five scanline
      * filters (None/Sub/Up/Average/Paeth per the PNG spec §9).
      * `ImageIO.read` allocates an ImageInputStream + reader from the
      * registry per CALL, which dominated m13 at 5000 tiny images per
      * bench rep; the native path is one Inflater + one unfilter scan.
      * Anything outside that shape (palette, 16-bit, gray, interlaced)
      * falls back to ImageIO — decode coverage is unchanged.
      */
    def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(bytes != null && bytes.length >= 8 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
        bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte,
        "not a png: bad magic")
      val bb = java.nio.ByteBuffer.wrap(bytes) // PNG is big-endian
      bb.position(8)
      var w = 0; var h = 0; var bitDepth = 0; var colorType = -1
      var interlace = 0
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && bb.remaining >= 8) {
        val len = bb.getInt
        val typ = new String(Array(bb.get, bb.get, bb.get, bb.get)
          .map(_.toChar))
        require(len >= 0 && bb.remaining >= len + 4,
          s"truncated png chunk $typ")
        typ match {
          case "IHDR" =>
            w = bb.getInt; h = bb.getInt
            bitDepth = bb.get & 0xff; colorType = bb.get & 0xff
            bb.get // compression (always 0)
            bb.get // filter method (always 0)
            interlace = bb.get & 0xff
          case "IDAT" =>
            idat.write(bytes, bb.position(), len)
            bb.position(bb.position() + len)
          case "IEND" => done = true
          case _ => bb.position(bb.position() + len)
        }
        if (!done) bb.position(bb.position() + 4) // chunk CRC
      }
      if (bitDepth != 8 || (colorType != 2 && colorType != 6) ||
          interlace != 0) return decodePixelsImageIO(bytes)
      require(w > 0 && h > 0, "png decode failed")
      val bpp = if (colorType == 6) 4 else 3
      val stride = w * bpp
      val raw = new Array[Byte](h * (1 + stride))
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var filled = 0
      while (filled < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, filled, raw.length - filled)
        require(n > 0 || inflater.finished(), "png idat underflow")
        filled += n
      }
      inflater.end()
      require(filled == raw.length, s"png idat short: $filled/${raw.length}")
      // unfilter in place over the pixel bytes of each scanline
      val px = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val filter = raw(y * (1 + stride)) & 0xff
        val src = y * (1 + stride) + 1
        val dst = y * stride
        val prev = dst - stride // valid only for y > 0
        var i = 0
        while (i < stride) {
          val x = raw(src + i) & 0xff
          val a = if (i >= bpp) px(dst + i - bpp) & 0xff else 0
          val b = if (y > 0) px(prev + i) & 0xff else 0
          val c = if (y > 0 && i >= bpp) px(prev + i - bpp) & 0xff else 0
          val recon = filter match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b)
              val pc = math.abs(p - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case f => throw new IllegalArgumentException(s"png filter $f")
          }
          px(dst + i) = recon.toByte
          i += 1
        }
        y += 1
      }
      if (bpp == 3) (w, h, px)
      else { // drop alpha
        val rgb = new Array[Byte](w * h * 3)
        var k = 0; var j = 0
        while (j < px.length) {
          rgb(k) = px(j); rgb(k + 1) = px(j + 1); rgb(k + 2) = px(j + 2)
          k += 3; j += 4
        }
        (w, h, rgb)
      }
    }

    /** ImageIO fallback for PNG shapes the native path doesn't cover. */
    private def decodePixelsImageIO(
        bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "png decode failed")
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      var y = 0
      var k = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(k) = ((rgb >> 16) & 0xff).toByte
          out(k + 1) = ((rgb >> 8) & 0xff).toByte
          out(k + 2) = (rgb & 0xff).toByte
          k += 3
          x += 1
        }
        y += 1
      }
      (w, h, out)
    }

    def decode(bytes: Array[Byte]): PngInfo = {
      val (w, h, px) = decodePixels(bytes)
      var sumR = 0L; var sumG = 0L; var sumB = 0L
      var i = 0
      while (i < px.length) {
        sumR += px(i) & 0xff; sumG += px(i + 1) & 0xff; sumB += px(i + 2) & 0xff
        i += 3
      }
      val n = w.toLong * h
      PngInfo(w, h, n, sumR.toDouble / n, sumG.toDouble / n,
        sumB.toDouble / n, px(0) & 0xff)
    }
  }

  /** Real pure-JVM VIDEO codec: uncompressed RIFF-AVI with 24bpp DIB
    * frames — the video sibling of [[WavCodec]]/[[BmpCodec]], and the
    * third REAL container in the family: an actual AVI structure
    * (hdrl LIST with avih/strh/strf headers, movi LIST of 00db frame
    * chunks, idx1 index) that a stock media tool recognizes. Frames
    * are stored exactly as BMP pixel data (bottom-up BGR24 rows,
    * 4-byte stride), so every decoder trap the image path pins —
    * row order, stride padding, channel order — recurs per frame,
    * plus the container traps of its own (chunk walking, declared vs
    * actual frame counts). With this, [[FakeDecoder]] stands in ONLY
    * for formats that genuinely need native codecs (JPEG/MP4/MP3…).
    */
  object AviCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    private def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

    /** Canonical uncompressed AVI writer: `frames` are BGR triples in
      * IMAGE order (row 0 = top), one array per frame, each of length
      * width*height. `usPerFrame` is the frame interval in µs.
      */
    def encodeBgr24(frames: Array[Array[(Byte, Byte, Byte)]], width: Int,
        height: Int, usPerFrame: Int): Array[Byte] = {
      require(width > 0 && height > 0 && usPerFrame > 0, "bad avi params")
      require(frames.nonEmpty, "avi needs at least one frame")
      frames.foreach(f => require(f.length == width * height,
        "frame pixels != width*height"))
      val stride = rowStride(width)
      val frameBytes = stride * height
      require(frameBytes % 2 == 0, "odd frame chunk (would need RIFF pad)")
      val n = frames.length
      val hdrlData = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
      val moviData = 4 + n * (8 + frameBytes)
      val idx1Data = 16 * n
      val riffData = 4 + (8 + hdrlData) + (8 + moviData) + (8 + idx1Data)
      val bb = ByteBuffer.allocate(8 + riffData).order(ByteOrder.LITTLE_ENDIAN)
      def fourCC(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
      fourCC("RIFF"); bb.putInt(riffData); fourCC("AVI ")
      fourCC("LIST"); bb.putInt(hdrlData); fourCC("hdrl")
      fourCC("avih"); bb.putInt(56)
      bb.putInt(usPerFrame)
      bb.putInt(frameBytes * (1000000 / usPerFrame).max(1)) // maxBytesPerSec
      bb.putInt(0) // padding granularity
      bb.putInt(0x10) // AVIF_HASINDEX
      bb.putInt(n) // totalFrames
      bb.putInt(0) // initialFrames
      bb.putInt(1) // streams
      bb.putInt(frameBytes) // suggestedBufferSize
      bb.putInt(width); bb.putInt(height)
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0) // reserved
      fourCC("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); fourCC("strl")
      fourCC("strh"); bb.putInt(56)
      fourCC("vids"); fourCC("DIB ")
      bb.putInt(0); bb.putShort(0); bb.putShort(0) // flags, prio, lang
      bb.putInt(0) // initialFrames
      bb.putInt(usPerFrame) // scale
      bb.putInt(1000000) // rate (rate/scale = fps)
      bb.putInt(0) // start
      bb.putInt(n) // length in frames
      bb.putInt(frameBytes) // suggestedBufferSize
      bb.putInt(-1) // quality
      bb.putInt(0) // sampleSize
      bb.putShort(0); bb.putShort(0); bb.putShort(width.toShort)
      bb.putShort(height.toShort) // rcFrame
      fourCC("strf"); bb.putInt(40)
      bb.putInt(40); bb.putInt(width); bb.putInt(height) // positive => bottom-up
      bb.putShort(1); bb.putShort(24) // planes, bpp
      bb.putInt(0) // BI_RGB
      bb.putInt(frameBytes)
      bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
      fourCC("LIST"); bb.putInt(moviData); fourCC("movi")
      val frameOffsets = new Array[Int](n)
      var f = 0
      while (f < n) {
        frameOffsets(f) = bb.position() - (8 + 4 + (8 + hdrlData) + 8) // offset from 'movi'
        fourCC("00db"); bb.putInt(frameBytes)
        val px = frames(f)
        var sr = 0
        while (sr < height) {
          val imageRow = height - 1 - sr // bottom-up
          var c = 0
          while (c < width) {
            val (b, g, r) = px(imageRow * width + c)
            bb.put(b); bb.put(g); bb.put(r)
            c += 1
          }
          var pad = stride - width * 3
          while (pad > 0) { bb.put(0.toByte); pad -= 1 }
          sr += 1
        }
        f += 1
      }
      fourCC("idx1"); bb.putInt(idx1Data)
      f = 0
      while (f < n) {
        fourCC("00db"); bb.putInt(0x10) // AVIIF_KEYFRAME
        bb.putInt(frameOffsets(f)); bb.putInt(frameBytes)
        f += 1
      }
      bb.array()
    }

    /** Decoded container header. */
    case class AviInfo(width: Int, height: Int, usPerFrame: Int, nFrames: Int)

    /** Header-validating parse + full frame decode: walks the RIFF
      * chunk tree (no fixed offsets — a writer may order or pad
      * differently), validates 'vids'/DIB/24bpp/BI_RGB, and returns
      * each frame's BGR pixels in IMAGE row-major order (honoring
      * bottom-up row storage and the 4-byte stride). The declared
      * avih/strh frame counts must match the actual movi chunks.
      */
    def decodeFrames(bytes: Array[Byte]): (AviInfo, Array[Array[Byte]]) = {
      require(bytes != null && bytes.length >= 12, "not an avi: too short")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def fourCC(at: Int): String =
        new String(bytes, at, 4, "US-ASCII")
      require(fourCC(0) == "RIFF" && fourCC(8) == "AVI ", "not an avi: bad magic")
      val riffEnd = math.min(8L + bb.getInt(4), bytes.length.toLong).toInt
      var usPerFrame = 0; var totalFrames = -1; var width = 0; var height = 0
      var strhFrames = -1; var sawVids = false; var bpp = -1; var compression = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(from: Int, until: Int): Unit = {
        var p = from
        while (p + 8 <= until) {
          val cc = fourCC(p)
          val size = bb.getInt(p + 4)
          require(size >= 0 && p + 8 + size <= until, s"truncated chunk $cc")
          cc match {
            case "LIST" =>
              walk(p + 12, p + 8 + size) // skip the list type fourCC
            case "avih" =>
              usPerFrame = bb.getInt(p + 8)
              totalFrames = bb.getInt(p + 8 + 16)
              width = bb.getInt(p + 8 + 32)
              height = bb.getInt(p + 8 + 36)
            case "strh" =>
              if (fourCC(p + 8) == "vids") {
                sawVids = true
                strhFrames = bb.getInt(p + 8 + 32)
              }
            case "strf" if sawVids && bpp < 0 =>
              bpp = bb.getShort(p + 8 + 14) & 0xffff
              compression = bb.getInt(p + 8 + 16)
            case "00db" | "00dc" =>
              frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size)
            case _ => () // idx1, JUNK, ...
          }
          p += 8 + size + (size & 1) // RIFF chunks are word-aligned
        }
      }
      walk(12, riffEnd)
      require(width > 0 && height > 0, "bad avi dims")
      require(sawVids, "no video stream (strh 'vids') found")
      require(bpp == 24, s"unsupported bpp $bpp (24 only)")
      require(compression == 0, s"unsupported compression $compression (DIB only)")
      require(usPerFrame > 0, "bad frame interval")
      require(frames.length == totalFrames && frames.length == strhFrames,
        s"frame count mismatch: avih=$totalFrames strh=$strhFrames movi=${frames.length}")
      val stride = rowStride(width)
      val out = frames.map { raw =>
        require(raw.length == stride * height, "bad frame chunk size")
        val px = new Array[Byte](width * height * 3)
        var imageRow = 0
        while (imageRow < height) {
          val storedRow = height - 1 - imageRow // bottom-up, as declared
          System.arraycopy(raw, storedRow * stride, px, imageRow * width * 3, width * 3)
          imageRow += 1
        }
        px
      }.toArray
      (AviInfo(width, height, usPerFrame, frames.length), out)
    }
  }

  /** Wrap a text corpus as REAL BMP payloads: byte i of the text
    * becomes image pixel (row i/width, col i%width) with channels
    * (B = byte, G = 255−byte, R = 2·byte mod 256) — three distinct
    * per-channel functions so a decoder that confuses BGR order
    * hash-mismatches. The tail of the last row is zero-pixel padded;
    * `width` defaults to 10 so the stored row stride (30 → 32 bytes)
    * exercises REAL 4-byte padding. Like [[textAsWav]], every decoded
    * field is derivable from the text by the oracle (m05).
    */
  def textAsBmp(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 10): DataFrame = {
    require(width > 0, "width must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = if (text == null) Array.emptyByteArray else text
          require(bytes.nonEmpty, "textAsBmp: empty payload (filter first)")
          val height = (bytes.length + width - 1) / width
          val pixels = Array.tabulate(width * height) { i =>
            if (i < bytes.length) {
              val v = bytes(i) & 0xff
              (v.toByte, (255 - v).toByte, ((v * 2) % 256).toByte)
            } else (0.toByte, 0.toByte, 0.toByte)
          }
          (id, BmpCodec.encodeBgr24(pixels, width, height))
        }
      }
      .toDF("sample_id", "payload")
  }

  /** Decoded BMP features, one row per sample. */
  case class BmpFeatures(
      sample_id: Long, n_bytes: Long, width: Int, height: Int,
      bits_per_pixel: Int, n_pixels: Long,
      mean_b: Double, mean_g: Double, mean_r: Double, top_left_b: Int)

  /** Partition-parallel REAL decode, the image sibling of
    * [[decodeWav]]: same mapPartitions distribution contract, kernel
    * is [[BmpCodec]]'s actual header walk + bottom-up strided pixel
    * scan.
    */
  def decodeBmp(media: DataFrame, idCol: String = "sample_id",
      payloadCol: String = "payload"): Dataset[BmpFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val info = BmpCodec.decode(payload)
          BmpFeatures(id, payload.length.toLong, info.width, info.height,
            info.bitsPerPixel, info.nPixels, info.meanB, info.meanG,
            info.meanR, info.topLeftB)
        }
      }
  }

  /** Wrap a text corpus as REAL PNG payloads (the COMPRESSED sibling
    * of [[textAsBmp]]): byte i becomes image pixel (row i/width, col
    * i%width) with channels (R = byte, G = 255−byte, B = 3·byte mod
    * 256) — a channel map deliberately DIFFERENT from the BMP one so
    * a decoder that confuses the two formats' channel orders
    * hash-mismatches. Tail of the last row is zero-pixel padded. The
    * payload is genuine DEFLATE-compressed PNG from the JDK encoder;
    * m13 pins the lossless decode round-trip against the text.
    */
  def textAsPng(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 10): DataFrame = {
    require(width > 0, "width must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = if (text == null) Array.emptyByteArray else text
          require(bytes.nonEmpty, "textAsPng: empty payload (filter first)")
          val height = (bytes.length + width - 1) / width
          val pixels = Array.tabulate(width * height) { i =>
            if (i < bytes.length) {
              val v = bytes(i) & 0xff
              (v.toByte, (255 - v).toByte, ((v * 3) % 256).toByte)
            } else (0.toByte, 0.toByte, 0.toByte)
          }
          (id, PngCodec.encodeRgb(pixels, width, height))
        }
      }
      .toDF("sample_id", "payload")
  }

  /** Decoded PNG features, one row per sample. `n_bytes` is the
    * compressed payload size — informative but NOT oracle-derivable
    * (DEFLATE), so oracle queries project it away.
    */
  case class PngFeatures(
      sample_id: Long, n_bytes: Long, width: Int, height: Int,
      n_pixels: Long, mean_r: Double, mean_g: Double, mean_b: Double,
      top_left_r: Int)

  /** Partition-parallel REAL PNG decode (inflate + unfilter via the
    * JDK codec): same mapPartitions distribution contract as
    * [[decodeBmp]] — payloads never leave the executor.
    */
  def decodePng(media: DataFrame, idCol: String = "sample_id",
      payloadCol: String = "payload"): Dataset[PngFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val info = PngCodec.decode(payload)
          PngFeatures(id, payload.length.toLong, info.width, info.height,
            info.nPixels, info.meanR, info.meanG, info.meanB, info.topLeftR)
        }
      }
  }

  /** Wrap a text corpus as REAL WAV payloads: each byte of the text
    * becomes one 16-bit mono sample (`byte * 128`), PCM-encoded into
    * a canonical RIFF container. The signal is derived from data the
    * oracle can also see, so [[decodeWav]]'s output is hash-checkable:
    * header fields and sample statistics decoded FROM THE BYTES must
    * equal what SQL derives from the text directly — a full
    * encode→container→parse→extract roundtrip pin (m04).
    */
  def textAsWav(docs: DataFrame, idCol: String, textCol: String,
      sampleRate: Int = 16000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = if (text == null) Array.emptyByteArray else text
          val samples = Array.tabulate(bytes.length)(i =>
            ((bytes(i) & 0xff) * 128).toShort)
          (id, WavCodec.encodePcm16(samples, sampleRate))
        }
      }
      .toDF("sample_id", "payload")
  }

  /** Decoded WAV features, one row per sample. */
  case class WavFeatures(
      sample_id: Long, n_bytes: Long, sample_rate: Int, n_channels: Int,
      bits_per_sample: Int, n_samples: Long, duration_ms: Long,
      mean_abs: Double, rms: Double)

  /** Partition-parallel REAL decode: same distribution contract as
    * [[extractFeatures]] (mapPartitions, payload bytes never leave the
    * executor, small typed output), but the kernel is [[WavCodec]]'s
    * actual container parse, not a stub.
    */
  def decodeWav(media: DataFrame, idCol: String = "sample_id",
      payloadCol: String = "payload"): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val info = WavCodec.decode(payload)
          WavFeatures(id, payload.length.toLong, info.sampleRate,
            info.channels, info.bitsPerSample, info.nSamples,
            info.durationMs, info.meanAbs, info.rms)
        }
      }
  }

  /** Single-bin DFT energy over REAL decoded PCM — the first genuine
    * SIGNAL-PROCESSING feature in the audio family (means/RMS are
    * amplitude statistics; this is frequency content): for each
    * requested bin k, C_k = Σ xₙ·cos(2πkn/N) and S_k = Σ xₙ·sin(2πkn/N)
    * over the decoded samples — the k-th DFT coefficient, the
    * Goertzel/spectral-energy primitive audio dedup and
    * quality-gating build on (a near-silent or single-tone clip shows
    * its energy concentrated in specific bins).
    *
    * The sum formulation keeps it ORACLE-EXACT: both engines fold the
    * weighted terms i-ascending (the s23 list_sum contract) with the
    * same libm cos/sin per index, and the 6-dp edge round absorbs any
    * last-ulp transcendental disagreement (per-term ulp error sums to
    * ~1e-9 at clip length, far under the round grain). `power`
    * (Σ xₙ²) is pure INTEGER arithmetic — exact.
    *
    * Same mapPartitions contract as [[decodeWav]]: decode + fold per
    * partition, payloads never cross an exchange.
    *
    * @return one row per (sample, bin): (sample_id, bin, n_samples,
    *         power, c, s) with c/s rounded 6 dp
    */
  def wavDftEnergy(media: DataFrame, dftBins: Seq[Int],
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame = {
    require(dftBins.nonEmpty && dftBins.forall(_ >= 0), "bins must be >= 0")
    val spark = media.sparkSession
    import spark.implicits._
    val bins = dftBins.toArray
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val samples = WavCodec.decodeSamples(payload)._3
          val n = samples.length
          var power = 0L
          var i = 0
          while (i < n) { power += samples(i).toLong * samples(i); i += 1 }
          bins.iterator.map { k =>
            var c = 0.0
            var s = 0.0
            var j = 0
            while (j < n) {
              val theta = 2.0 * math.Pi * k * j / n
              c += samples(j) * math.cos(theta)
              s += samples(j) * math.sin(theta)
              j += 1
            }
            // + 0.0 folds IEEE −0.0 into +0.0: when k divides n the
            // sin sum is a ±1e-13 residual whose SIGN depends on the
            // engine's last-ulp sin, and ROUND(6) would otherwise
            // emit oppositely-signed zeros cross-engine
            def r6(v: Double): Double =
              BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble + 0.0
            (id, k.toLong, n.toLong, power, r6(c), r6(s))
          }
        }
      }
      .toDF("sample_id", "bin", "n_samples", "power", "c", "s")
  }

  /** Spectral shape features over the [[wavDftEnergy]] bins — the
    * summary numbers audio quality-gating actually thresholds on:
    * spectral CENTROID (energy-weighted mean bin — brightness),
    * BANDWIDTH (energy-weighted std dev around it — tonal vs broad),
    * and FLATNESS (geometric/arithmetic energy-mean ratio — ~1 for
    * noise-like spectra, →0 for single-tone; the Wiener entropy audio
    * fingerprinting keys on). Computed from bins 1..nBins of the real
    * DFT fold.
    *
    * Determinism: each bin energy c²+s² is bit-exact (c/s carry the
    * m14 ROUND(6) contract); the per-doc sums span only nBins rows
    * and every reported feature is an O(1)-magnitude RATIO of them,
    * so the final ROUND(6) absorbs engine sum order (the big absolute
    * sums themselves are never emitted). Flatness uses ln(e+1) so
    * zero-energy bins are defined.
    *
    * Scale shape: [[wavDftEnergy]]'s decode mapPartitions emits
    * (id, bin, c, s) scalars only; this adds one sample_id-keyed
    * partial-agg exchange over nBins rows per clip.
    *
    * @return (sample_id, centroid, bandwidth, flatness), one row per
    *         clip (unsorted — callers order); centroid/bandwidth null
    *         on a zero-energy clip
    */
  def spectralFeatures(media: DataFrame, nBins: Int = 8,
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val e = wavDftEnergy(media, 1 to nBins, idCol, payloadCol)
      .select(col("sample_id"), col("bin"),
        (col("c") * col("c") + col("s") * col("s")).as("e"))
    val agg = e.groupBy(col("sample_id")).agg(
      count(lit(1)).as("nb"),
      sum(col("e")).as("se"),
      sum(col("bin") * col("e")).as("ske"),
      sum(col("bin") * col("bin") * col("e")).as("sk2e"),
      sum(log(col("e") + lit(1.0))).as("sl"),
      sum(col("e") + lit(1.0)).as("sa"))
    val cen = col("ske") / col("se")
    agg.select(col("sample_id"),
      when(col("se") > 0.0, round(cen, 6)).as("centroid"),
      when(col("se") > 0.0, round(sqrt(greatest(
        col("sk2e") / col("se") - cen * cen, lit(0.0))), 6)).as("bandwidth"),
      round(exp(col("sl") / col("nb").cast("double")) /
        (col("sa") / col("nb").cast("double")), 6).as("flatness"))
  }

  /** Octave-band log energies over the [[wavDftEnergy]] bins — the
    * constant-Q banding audio fingerprints and band-pass quality
    * checks use: DFT bins 1..15 grouped into 4 octave bands
    * (1 | 2-3 | 4-7 | 8-15), each reported as ln(1 + Σ energy). The
    * octave mapping is a literal when-chain, not floor(log2(bin)) —
    * log2 of an exact power of two can land a hair under the integer
    * and misbucket the band boundary.
    *
    * Determinism: bin energies are bit-exact (m14's ROUND(6) c/s);
    * each band sums ≤ 8 of them (sum order absorbed by the final
    * ROUND(6) on the O(30) log). Same scale shape as
    * [[spectralFeatures]]: decode-stage energies, one sample-keyed
    * exchange of scalars.
    *
    * @return (sample_id, band, log_energy), 4 rows per clip
    *         (unsorted — callers order)
    */
  def octaveBandEnergies(media: DataFrame,
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame = {
    val e = wavDftEnergy(media, 1 to 15, idCol, payloadCol)
      .select(col("sample_id"), col("bin"),
        (col("c") * col("c") + col("s") * col("s")).as("e"))
    val band = when(col("bin") === 1L, 1L).when(col("bin") <= 3L, 2L)
      .when(col("bin") <= 7L, 3L).otherwise(4L)
    e.select(col("sample_id"), band.as("band"), col("e"))
      .groupBy(col("sample_id"), col("band"))
      .agg(round(log(lit(1.0) + sum(col("e"))), 6).as("log_energy"))
  }

  /** Audio near-dup pairs by LOSSLESS energy-grid blocking — the
    * audio sibling of [[phashDupPairs]] (m11 blocks image hashes by
    * Hamming pigeonhole; this blocks clips by their 4 octave-band
    * log-energy fingerprint, [[octaveBandEnergies]]): clips whose
    * band energies ALL sit within `tau` pair up.
    *
    * Blocking guarantee (the pigeonhole for CONTINUOUS features):
    * per band, grid cells of width 2·tau at offsets {0, tau} — the
    * combined grid boundaries are tau apart, so an interval of length
    * ≤ tau contains at most one, and two values within tau share a
    * cell in at least one of the two grids. Requiring a shared
    * composite cell across all 4 bands in ≥1 of the 2⁴ = 16 offset
    * combinations therefore loses NO qualifying pair; the exact
    * all-band |Δe| ≤ tau check then runs only on bucket-mates.
    * `tau` defaults to an exact binary fraction so the floor
    * arithmetic is bit-identical cross-engine on the 6-dp-rounded
    * energies.
    *
    * Scale shape: energies come out of the decode stage (payloads
    * never cross an exchange); each clip contributes 16 composite
    * keys of 4 longs — the self-join is bucket-local exactly like the
    * m11/d12 banding, and verification needs no second join (both
    * sides' 4 energies ride the banded rows).
    *
    * @return (id_a, id_b, max_band_diff), id_a < id_b, every band
    *         within tau
    */
  def audioFingerprintDupPairs(media: DataFrame, tau: Double = 0.125,
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame =
    fingerprintPairsFromVecs(
      org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
        energyVecs(media, idCol, payloadCol)), tau)

  /** The per-clip 4-band energy fingerprint behind
    * [[audioFingerprintDupPairs]]: (sample_id, e1..e4), one row per
    * clip, computed in the decode stage (payloads never shuffle).
    * Exposed separately so composed runs ([[audioCurationRun]]) can
    * filter the SCALAR fingerprints (e.g. by a quality gate) before
    * the pair pass without ever joining against payloads.
    */
  private[pipeline] def energyVecs(media: DataFrame,
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame = {
    val e = octaveBandEnergies(media, idCol, payloadCol)
    def bandE(b: Int) = max(when(col("band") === b.toLong, col("log_energy")))
      .as(s"e$b")
    e.groupBy(col("sample_id"))
      .agg(bandE(1), bandE(2), bandE(3), bandE(4))
  }

  /** The lossless offset-grid banding + exact verify over a
    * fingerprint frame from [[energyVecs]] — the caller owns the
    * frame's cache lifecycle (the pair pass reads it twice through
    * the self-join).
    */
  private[pipeline] def fingerprintPairsFromVecs(vecs: DataFrame,
      tau: Double): DataFrame = {
    require(tau > 0.0, "tau must be positive")
    val width = 2.0 * tau
    val combos = (0 until 16).map { cid =>
      val keys = (1 to 4).map { b =>
        val off = if (((cid >> (b - 1)) & 1) == 1) tau else 0.0
        floor((col(s"e$b") + lit(off)) / lit(width)).cast("long").as(s"k$b")
      }
      struct(lit(cid).as("cid") +: keys: _*)
    }
    val banded = vecs
      .select(col("sample_id") +: (1 to 4).map(b => col(s"e$b")) :+
        explode(array(combos: _*)).as("bk"): _*)
      .select(col("sample_id"), col("e1"), col("e2"), col("e3"), col("e4"),
        col("bk"))
    val diffs = (1 to 4).map(b => abs(col(s"a.e$b") - col(s"b.e$b")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.bk") === col("b.bk") &&
          col("a.sample_id") < col("b.sample_id"))
      .where(diffs.map(_ <= lit(tau)).reduce(_ && _))
      .select(col("a.sample_id").as("id_a"), col("b.sample_id").as("id_b"),
        greatest(diffs: _*).as("max_band_diff"))
      .distinct()
  }

  /** Image dup CLUSTERS — [[phashDupPairs]] closed transitively (the
    * d06 move for the image family, the sibling of
    * [[audioDupClusters]]): each image's cluster representative
    * (min id) and cluster size, the frame an image dedup consumes
    * directly. Same eager pair materialization discipline: the
    * closure's bounded probe must not release the hash frame's scope
    * mid-build.
    *
    * @return (sample_id, cluster_rep, cluster_size) for every image
    *         in ≥1 qualifying pair
    */
  def phashDupClusters(hashes: DataFrame, maxHamming: Int = 7,
      idCol: String = "sample_id"): DataFrame = {
    val pairs = phashDupPairs(hashes, maxHamming, idCol)
      .select(col("id_a"), col("id_b"))
      .cache()
    val comp =
      try { pairs.count(); graft.pipeline.Dedup.connectedComponents(pairs) }
      finally pairs.unpersist()
    comp
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))).cast("long"))
      .select(col("id").as("sample_id"), col("component").as("cluster_rep"),
        col("cluster_size"))
  }

  /** CROSS-MODAL duplicate disagreement audit — the image-text-pair
    * dedup read (the LAION/DataComp curation problem): an image-text
    * corpus duplicates along EACH modality independently, and the
    * disagreements are the actionable rows. `image_only` pairs (same
    * image, different caption — re-hosted or re-captioned media) are
    * what caption-level dedup MISSES; `caption_only` pairs (same
    * caption, different image — template/boilerplate captions) are
    * what image-level dedup misses; `both` pairs are true duplicates
    * either pass would catch. A pipeline gating on one modality alone
    * silently keeps the other column's duplicates.
    *
    * Scale shape: the image leg is [[phashDupPairs]]' lossless banded
    * blocking over one [[perceptualHash]] decode pass; the caption
    * leg groups md5 fingerprints into posting lists and emits pairs
    * list-local (never a corpus self-join); the classification is one
    * full-outer join of two (id, id) pair frames. Payloads never
    * enter a shuffle — hashes and digests do.
    *
    * `maxCaptionGroup` caps exact-caption groups before pair emission
    * (default 10k, the pair-emitting-API invariant): a TEMPLATE
    * caption shared by m docs would otherwise materialize one
    * m-element reducer row and m²/2 pairs — exactly the boilerplate
    * class this audit flags. Over-cap groups drop from the caption
    * leg (their members can still pair through the image leg); pass
    * None for the exact oracle-comparable baseline.
    *
    * @param samples (id, image-bearing text, caption) — the image is
    *        rendered via [[textAsBmp]] (codec stub; a real decoder
    *        slots into the same plumbing)
    * @return (id_a, id_b, image_dup 0/1, caption_dup 0/1, kind ∈
    *         both|image_only|caption_only) with id_a < id_b — one row
    *         per pair duplicated in ≥1 modality (unsorted — callers
    *         order)
    */
  def crossModalDupAudit(samples: DataFrame, idCol: String,
      imageTextCol: String, captionCol: String,
      maxHamming: Int = 3, width: Int = 10,
      maxCaptionGroup: Option[Int] = Some(10000)): DataFrame = {
    val slim = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      samples.select(col(idCol).cast("long").as("sample_id"),
        col(imageTextCol).as("__img"), col(captionCol).as("__cap")))
    val imgPairs = phashDupPairs(
      perceptualHash(textAsBmp(slim.select(col("sample_id"), col("__img")),
        "sample_id", "__img", width = width)).toDF(), maxHamming)
      .select(col("id_a"), col("id_b"), lit(1L).as("__img_dup"))
    val capFps = slim.select(col("sample_id"), md5(col("__cap")).as("fp"))
    val capGroups = maxCaptionGroup match {
      case Some(m) =>
        // count-first cap (the shingleIntersections discipline): no
        // reducer row materializes more than m ids
        val kept = capFps.groupBy(col("fp"))
          .agg(count(lit(1)).as("n_caps"))
          .where(col("n_caps") >= 2 && col("n_caps") <= lit(m))
          .select(col("fp"))
        capFps.join(kept, Seq("fp"))
          .groupBy(col("fp"))
          .agg(collect_list(col("sample_id")).as("ids"))
      case None =>
        capFps.groupBy(col("fp"))
          .agg(collect_list(col("sample_id")).as("ids"))
          .where(size(col("ids")) >= 2)
    }
    val capPairs = capGroups
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(1L).as("__cap_dup"))
    imgPairs
      .join(capPairs, Seq("id_a", "id_b"), "full_outer")
      .select(col("id_a"), col("id_b"),
        coalesce(col("__img_dup"), lit(0L)).as("image_dup"),
        coalesce(col("__cap_dup"), lit(0L)).as("caption_dup"))
      .withColumn("kind",
        when(col("image_dup") === 1L && col("caption_dup") === 1L, "both")
          .when(col("image_dup") === 1L, "image_only")
          .otherwise("caption_only"))
  }

  /** The COMPOSED paired-corpus release run — [[crossModalDupAudit]]
    * turned into the nightly job an image-text pipeline ships: dedup
    * BOTH modalities with production attribution order (image
    * clusters first — re-hosted media is the dominant dup mass — then
    * exact-caption groups over the remainder), keep min-id
    * representatives, and emit the admitted pair list + per-stage
    * audit counts + the per-source admitted rollup in one result.
    * Attribution order matters and is part of the contract: a pair
    * duplicated in both modalities counts against the image stage,
    * so `dropped_caption` is caption-ONLY dup mass (the audit's
    * caption_only class, actioned).
    *
    * Scale shape: one [[perceptualHash]] decode pass; banded lossless
    * image pairs ([[phashDupPairs]]); the closure input is (id, id)
    * pairs fully materialized before the eager closure (the m22
    * cache-release discipline); caption dedup is one md5-keyed window
    * over the remainder (ids/digests only). Payloads never shuffle.
    *
    * @return (stage, sample_id, source, n): `admitted` rows carry
    *         ids+source; `input`/`image_pairs`/`image_clusters`/
    *         `dropped_image`/`dropped_caption` carry counts;
    *         `admitted_source` carries the rollup (unsorted — callers
    *         order)
    */
  def pairedReleaseRun(samples: DataFrame, idCol: String,
      imgTextCol: String, captionCol: String, srcCol: String,
      maxHamming: Int = 3, width: Int = 10): DataFrame = {
    val spark = samples.sparkSession
    val slim = samples.select(col(idCol).cast("long").as("sample_id"),
      col(imgTextCol).as("__img"), col(captionCol).as("__cap"),
      col(srcCol).cast("string").as("source")).cache()
    val pairs = phashDupPairs(perceptualHash(textAsBmp(
        slim.select(col("sample_id"), col("__img")), "sample_id", "__img",
        width)).toDF(), maxHamming)
      .select(col("id_a"), col("id_b")).cache()
    // materialize pairs FULLY before the eager closure (the m22
    // partial-execution cache-release hazard); slim stays hot through
    // the closure and is scoped only after it
    val (nIn, nPairs, comp) =
      try {
        val ni = slim.count()
        val np = pairs.count()
        (ni, np, graft.pipeline.Dedup.connectedComponents(pairs))
      } finally pairs.unpersist()
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(slim)
    val imgDropped = comp.where(col("id") =!= col("component"))
      .select(col("id").as("sample_id"))
    val remainder = slim.join(imgDropped, Seq("sample_id"), "left_anti")
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val withKeep = remainder
      .select(col("sample_id"), col("source"), md5(col("__cap")).as("fp"))
      .withColumn("__keep", min(col("sample_id")).over(wFp))
    val admitted = withKeep.where(col("sample_id") === col("__keep"))
    def c1(stage: String, n: Column) = spark.range(1).select(
      lit(stage).as("stage"), lit(null).cast("long").as("sample_id"),
      lit(null).cast("string").as("source"), n.cast("long").as("n"))
    def cAgg(stage: String, df: DataFrame, agg: Column) = df.agg(agg.as("c"))
      .select(lit(stage).as("stage"), lit(null).cast("long").as("sample_id"),
        lit(null).cast("string").as("source"), col("c").cast("long").as("n"))
    val admittedRows = admitted.select(lit("admitted").as("stage"),
      col("sample_id"), col("source"), lit(null).cast("long").as("n"))
    val counts = c1("input", lit(nIn))
      .unionAll(c1("image_pairs", lit(nPairs)))
      .unionAll(cAgg("image_clusters", comp, countDistinct(col("component"))))
      .unionAll(cAgg("dropped_image", imgDropped, count(lit(1))))
      .unionAll(cAgg("dropped_caption",
        withKeep.where(col("sample_id") =!= col("__keep")), count(lit(1))))
    val bySource = admitted.groupBy(col("source"))
      .agg(count(lit(1)).as("c"))
      .select(lit("admitted_source").as("stage"),
        lit(null).cast("long").as("sample_id"), col("source"),
        col("c").cast("long").as("n"))
    admittedRows.unionAll(counts).unionAll(bySource)
  }

  /** INCREMENTAL paired-corpus release — the d35/t65 move for
    * [[pairedReleaseRun]]: admit a new image-text BATCH against a
    * standing released corpus (the multimodal daily-ingest job). The
    * corpus already shipped, so it is never deduped again and its
    * rows never pair with each other — its two projections stream
    * ONCE each against the broadcast batch sides:
    *
    *  1. corpus image near-dups: corpus phash bands (one decode pass,
    *     never cached, never self-joined) join the BROADCAST batch
    *     bands — a batch sample within `maxHamming` of ANY released
    *     image drops (`corpus_image_dup`).
    *  2. corpus caption dups: corpus caption digests stream against
    *     the broadcast survivor digests (`corpus_caption_dup`).
    *  3. the remainder dedups WITHIN the batch exactly like the full
    *     run: image clusters first (min-id rep kept,
    *     `dropped_image`), exact captions second (`dropped_caption`)
    *     — m30's attribution order is contract.
    *
    * Stage counts sum exactly to the batch: input = corpus_image_dup
    * + corpus_caption_dup + dropped_image + dropped_caption +
    * admitted (spec-reconciled).
    *
    * Scale shape: the batch (small by definition — a day's ingest) is
    * the only cached side; corpus work is two scan-stage projections
    * (phash decode, caption md5) whose payloads never cross an
    * exchange; the banded cross join is pigeonhole-LOSSLESS at
    * hamming ≤ maxHamming (the [[withHashBands]] contract) and
    * broadcasts the batch bands; the only closure is batch-sized
    * (materialized fully before the eager probe — the m22/d34 cache
    * discipline).
    *
    * @return (stage, sample_id, source, n): `admitted` rows (n null),
    *         audit counts (`input`, `corpus_image_dup`,
    *         `corpus_caption_dup`, `batch_image_pairs`,
    *         `batch_image_clusters`, `dropped_image`,
    *         `dropped_caption`), and per-source `admitted_source`
    *         rows
    */
  def incrementalPairedRelease(corpus: DataFrame, batch: DataFrame,
      idCol: String, imgTextCol: String, captionCol: String,
      srcCol: String, maxHamming: Int = 3, width: Int = 10): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming must be in [0,7], got $maxHamming")
    val spark = batch.sparkSession
    val popcnt = (c: org.apache.spark.sql.Column) =>
      call_function("bit_count", c).cast("long")
    val bslim = batch.select(col(idCol).cast("long").as("sample_id"),
      col(imgTextCol).as("__img"), col(captionCol).as("__cap"),
      col(srcCol).cast("string").as("source")).cache()
    val nBatch = bslim.count()
    // batch phashes: tiny (id + two longs), cached for the cross leg
    // AND the within-batch pair pass
    val bhash = perceptualHash(textAsBmp(
        bslim.select(col("sample_id"), col("__img")), "sample_id", "__img",
        width)).toDF()
      .select(col("sample_id"), col("ahash_hi"), col("ahash_lo")).cache()
    bhash.count(): Unit
    // corpus pass 1 (image leg): decode + band in the scan stage, the
    // batch bands broadcast onto it
    val chash = perceptualHash(textAsBmp(
        corpus.select(col(idCol).cast("long").as("sample_id"),
          col(imgTextCol).as("__img")), "sample_id", "__img", width)).toDF()
      .select(col("ahash_hi"), col("ahash_lo"))
    val imgHit = withHashBands(chash, maxHamming + 1).as("c")
      .join(broadcast(withHashBands(bhash, maxHamming + 1).as("b")),
        col("c.band") === col("b.band") && col("c.key") === col("b.key"))
      .where(popcnt(col("c.ahash_hi").bitwiseXOR(col("b.ahash_hi"))) +
        popcnt(col("c.ahash_lo").bitwiseXOR(col("b.ahash_lo")))
          <= maxHamming)
      .select(col("b.sample_id")).distinct().cache()
    val nImgHit = imgHit.count()
    val surv1 = bslim.join(imgHit, Seq("sample_id"), "left_anti")
    // corpus pass 2 (caption leg): digests stream against the
    // broadcast survivor digests
    val capHit = corpus.select(md5(col(captionCol)).as("fp"))
      .join(broadcast(surv1.select(col("sample_id"),
        md5(col("__cap")).as("fp"))), Seq("fp"))
      .select(col("sample_id")).distinct().cache()
    val nCapHit = capHit.count()
    val surv2 = bslim.join(imgHit, Seq("sample_id"), "left_anti")
      .join(capHit, Seq("sample_id"), "left_anti")
      .select(col("sample_id"), col("__cap"), col("source"))
    // within-batch image dedup over the survivors: pairs materialized
    // FULLY before the eager closure probe (the m22 discipline)
    val pairs = phashDupPairs(
        bhash.join(surv2.select(col("sample_id")), Seq("sample_id")),
        maxHamming)
      .select(col("id_a"), col("id_b")).cache()
    val (nPairs, comp) =
      try { (pairs.count(), graft.pipeline.Dedup.connectedComponents(pairs)) }
      finally pairs.unpersist()
    val imgDropped = comp.where(col("id") =!= col("component"))
      .select(col("id").as("sample_id"))
    val remainder = surv2.join(imgDropped, Seq("sample_id"), "left_anti")
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val withKeep = remainder
      .select(col("sample_id"), col("source"), md5(col("__cap")).as("fp"))
      .withColumn("__keep", min(col("sample_id")).over(wFp))
    val admitted = withKeep.where(col("sample_id") === col("__keep"))
    // ids-only caches released after the caller's single execution
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(bslim)
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(bhash)
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(imgHit)
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(capHit)
    def c1(stage: String, n: Long) = spark.range(1).select(
      lit(stage).as("stage"), lit(null).cast("long").as("sample_id"),
      lit(null).cast("string").as("source"), lit(n).as("n"))
    def cAgg(stage: String, df: DataFrame, agg: Column) = df.agg(agg.as("c"))
      .select(lit(stage).as("stage"), lit(null).cast("long").as("sample_id"),
        lit(null).cast("string").as("source"), col("c").cast("long").as("n"))
    val admittedRows = admitted.select(lit("admitted").as("stage"),
      col("sample_id"), col("source"), lit(null).cast("long").as("n"))
    val counts = c1("input", nBatch)
      .unionAll(c1("corpus_image_dup", nImgHit))
      .unionAll(c1("corpus_caption_dup", nCapHit))
      .unionAll(c1("batch_image_pairs", nPairs))
      .unionAll(cAgg("batch_image_clusters", comp,
        countDistinct(col("component"))))
      .unionAll(cAgg("dropped_image", imgDropped, count(lit(1))))
      .unionAll(cAgg("dropped_caption",
        withKeep.where(col("sample_id") =!= col("__keep")), count(lit(1))))
    val bySource = admitted.groupBy(col("source"))
      .agg(count(lit(1)).as("c"))
      .select(lit("admitted_source").as("stage"),
        lit(null).cast("long").as("sample_id"), col("source"),
        col("c").cast("long").as("n"))
    admittedRows.unionAll(counts).unionAll(bySource)
  }

  /** Audio dup CLUSTERS — [[audioFingerprintDupPairs]] closed
    * transitively (the d06 move for the audio family): each clip's
    * cluster representative (min id) and cluster size, the frame an
    * audio dedup pass consumes directly (drop non-representatives, or
    * weight by 1/cluster_size).
    *
    * Scale shape: the pair pass is m21's (decode-stage energies,
    * bucket-local join); the closure input is (id, id) pairs only —
    * [[graft.pipeline.Dedup.connectedComponents]]'s bounded-probe
    * local/distributed dispatch applies unchanged.
    *
    * @return (sample_id, cluster_rep, cluster_size) for every clip in
    *         ≥1 qualifying pair
    */
  def audioDupClusters(media: DataFrame, tau: Double = 0.125,
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame = {
    // materialize the pair frame FULLY before the closure: the
    // closure's bounded probe is a partial execution, and it would
    // release m21's scoped energy cache with most pair partitions
    // still unbuilt — the rest would then re-run the DFT pipeline
    // uncached (the d34 eager-consumption discipline)
    val pairs = audioFingerprintDupPairs(media, tau, idCol, payloadCol)
      .select(col("id_a"), col("id_b"))
      .cache()
    val comp =
      try { pairs.count(); graft.pipeline.Dedup.connectedComponents(pairs) }
      finally pairs.unpersist()
    comp
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))).cast("long"))
      .select(col("id").as("sample_id"), col("component").as("cluster_rep"),
        col("cluster_size"))
  }

  /** The COMPOSED audio curation run — the m-family's d34: the
    * operator a multimodal training-data pipeline actually schedules
    * nightly. Decode-stage quality gates ([[audioQualityReport]]'s
    * silence-ratio and dynamic-range signals) drop unusable clips,
    * the m21/m22 fingerprint pair pass + transitive closure clusters
    * the survivors, each cluster keeps its min-id representative, and
    * the result carries the curated clip list (with its source) plus
    * the per-stage audit counts and the per-source kept rollup — the
    * numbers a curation job logs beside its output and a data-mixing
    * decision consumes.
    *
    * Scale shape: both decode passes (quality scalars, band
    * energies) run in the scan stage — clip payloads never cross an
    * exchange; the quality gate applies to the id+energy SCALARS via
    * one id-keyed join (never to payloads), so the pair pass is
    * bucket-local over survivors only. The d34 cache discipline
    * applies: the gate, fingerprint, and pair frames are counted
    * eagerly while their plain caches are hot (the closure's eager
    * probe would burn a scoped cache mid-build) and released in
    * try/finally; the survivor-id cache alone outlives the call —
    * scoped AFTER the closure so only the caller's single result
    * execution releases it. Counts ride as literal rows; the closure
    * labelling feeds the kept / clusters / dropped legs of ONE
    * result plan.
    *
    * @param media (idCol, payloadCol) WAV clips
    * @param meta  (metaIdCol, srcCol) clip provenance for the kept
    *              rows and the per-source rollup
    * @return (stage, sample_id, source, n): one `stage='kept'` row
    *         per curated clip (n null), audit rows
    *         `stage ∈ input|quality_fail|pairs|clusters|dup_dropped`
    *         (sample_id/source null, n the count), and one
    *         `stage='kept_source'` row per source (sample_id null)
    */
  def audioCurationRun(media: DataFrame, meta: DataFrame,
      tau: Double = 0.125, maxSilenceRatio: Double = 0.25,
      minDynRange: Long = 3000L,
      idCol: String = "sample_id", payloadCol: String = "payload",
      metaIdCol: String = "sample_id", srcCol: String = "source"): DataFrame = {
    val spark = media.sparkSession
    val q = audioQualityReport(media, idCol = idCol, payloadCol = payloadCol)
      .select(col("sample_id"), col("silence_ratio"), col("dyn_range"))
      .cache()
    val passC = q
      .where(col("silence_ratio") <= lit(maxSilenceRatio) &&
        col("dyn_range") >= lit(minDynRange))
      .select(col("sample_id"))
      .cache()
    val vecs = energyVecs(media, idCol, payloadCol)
      .join(passC, Seq("sample_id"))
      .cache()
    val pairs = fingerprintPairsFromVecs(vecs, tau)
      .select(col("id_a"), col("id_b"))
      .cache()
    val (nIn, nPass, nPairs, comp) =
      try {
        val ni = q.count()
        val np = passC.count() // through the hot quality cache
        val npr = pairs.count() // materializes vecs + pairs
        // closure (eager): reads the pair cache; returns a local
        // labelling at any sane dup rate, or a CacheScope'd
        // distributed frame read once by the result execution below
        (ni, np, npr, graft.pipeline.Dedup.connectedComponents(pairs))
      } finally { pairs.unpersist(); vecs.unpersist(); q.unpersist() }
    // the survivor-id cache feeds the kept leg and the per-source
    // rollup of the RESULT plan, so it must outlive this call —
    // scoped only NOW, after the eager closure, so the closure's
    // internal executions could not release it mid-build
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(passC)
    val dropped = comp.where(col("id") =!= col("component"))
      .select(col("id").as("sample_id"))
    val metaSlim = meta.select(col(metaIdCol).cast("long").as("sample_id"),
      col(srcCol).cast("string").as("source"))
    val keptIds = passC.join(dropped, Seq("sample_id"), "left_anti")
    val kept = keptIds.join(metaSlim, Seq("sample_id"), "left")
      .select(lit("kept").as("stage"), col("sample_id"), col("source"),
        lit(null).cast("long").as("n"))
    def c1(stage: String, n: Column) = spark.range(1).select(
      lit(stage).as("stage"), lit(null).cast("long").as("sample_id"),
      lit(null).cast("string").as("source"), n.cast("long").as("n"))
    val counts = c1("input", lit(nIn))
      .unionAll(c1("quality_fail", lit(nIn - nPass)))
      .unionAll(c1("pairs", lit(nPairs)))
      .unionAll(comp.agg(countDistinct(col("component")).as("c"))
        .select(lit("clusters").as("stage"),
          lit(null).cast("long").as("sample_id"),
          lit(null).cast("string").as("source"), col("c").cast("long").as("n")))
      .unionAll(dropped.agg(count(lit(1)).as("c"))
        .select(lit("dup_dropped").as("stage"),
          lit(null).cast("long").as("sample_id"),
          lit(null).cast("string").as("source"), col("c").cast("long").as("n")))
    val bySource = keptIds.join(metaSlim, Seq("sample_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("c"))
      .select(lit("kept_source").as("stage"),
        lit(null).cast("long").as("sample_id"), col("source"),
        col("c").cast("long").as("n"))
    kept.unionAll(counts).unionAll(bySource)
  }

  /** The COMPOSED image curation run — [[audioCurationRun]]'s image
    * sibling, closing the m-family's composed-run pair: perceptual
    * decode-stage quality gates (contrast via `n_set` set bits,
    * brightness via the lattice `sample_mean`) drop unusable images,
    * the m11/m23 banded pair pass + transitive closure clusters the
    * survivors, min-id representatives are kept, and one result
    * carries the curated image list (with source), the per-stage
    * audit counts, and the per-source kept rollup.
    *
    * Scale shape: ONE decode pass ([[perceptualHash]]) produces the
    * scalar (hash, n_set, mean) frame that feeds BOTH the gate and
    * the pair stage — image bytes never cross an exchange, and the
    * gate is a plain filter on that scalar frame (no id join at
    * all, one better than the audio run's). The d34 cache
    * discipline: the hash and pair frames are counted eagerly while
    * hot and released in try/finally; the survivor-id cache alone
    * outlives the call, scoped after the eager closure.
    *
    * @param media (idCol, payloadCol) BMP images
    * @param meta  (metaIdCol, srcCol) image provenance
    * @return (stage, sample_id, source, n): `stage='kept'` rows per
    *         curated image, audit rows
    *         `stage ∈ input|quality_fail|pairs|clusters|dup_dropped`,
    *         and one `stage='kept_source'` row per source
    */
  def imageCurationRun(media: DataFrame, meta: DataFrame,
      maxHamming: Int = 3, minSetBits: Long = 16L, minMean: Double = 90.0,
      idCol: String = "sample_id", payloadCol: String = "payload",
      metaIdCol: String = "sample_id", srcCol: String = "source"): DataFrame = {
    val spark = media.sparkSession
    val hashes = perceptualHash(media, grid = 8, idCol = idCol,
        payloadCol = payloadCol).toDF()
      .select(col("sample_id"), col("ahash_hi"), col("ahash_lo"),
        col("n_set"), col("sample_mean"))
      .cache()
    val gated = hashes.where(col("n_set") >= lit(minSetBits) &&
      col("sample_mean") >= lit(minMean))
    val passC = gated.select(col("sample_id")).cache()
    val pairs = phashDupPairs(gated, maxHamming)
      .select(col("id_a"), col("id_b"))
      .cache()
    val (nIn, nPass, nPairs, comp) =
      try {
        val ni = hashes.count()
        val np = passC.count() // through the hot hash cache
        val npr = pairs.count() // materializes the banded pair pass
        (ni, np, npr, graft.pipeline.Dedup.connectedComponents(pairs))
      } finally { pairs.unpersist(); hashes.unpersist() }
    // survivor ids feed the result legs — scoped after the eager
    // closure so only the caller's single execution releases them
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(passC)
    val dropped = comp.where(col("id") =!= col("component"))
      .select(col("id").as("sample_id"))
    val metaSlim = meta.select(col(metaIdCol).cast("long").as("sample_id"),
      col(srcCol).cast("string").as("source"))
    val keptIds = passC.join(dropped, Seq("sample_id"), "left_anti")
    val kept = keptIds.join(metaSlim, Seq("sample_id"), "left")
      .select(lit("kept").as("stage"), col("sample_id"), col("source"),
        lit(null).cast("long").as("n"))
    def c1(stage: String, n: Column) = spark.range(1).select(
      lit(stage).as("stage"), lit(null).cast("long").as("sample_id"),
      lit(null).cast("string").as("source"), n.cast("long").as("n"))
    val counts = c1("input", lit(nIn))
      .unionAll(c1("quality_fail", lit(nIn - nPass)))
      .unionAll(c1("pairs", lit(nPairs)))
      .unionAll(comp.agg(countDistinct(col("component")).as("c"))
        .select(lit("clusters").as("stage"),
          lit(null).cast("long").as("sample_id"),
          lit(null).cast("string").as("source"), col("c").cast("long").as("n")))
      .unionAll(dropped.agg(count(lit(1)).as("c"))
        .select(lit("dup_dropped").as("stage"),
          lit(null).cast("long").as("sample_id"),
          lit(null).cast("string").as("source"), col("c").cast("long").as("n")))
    val bySource = keptIds.join(metaSlim, Seq("sample_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("c"))
      .select(lit("kept_source").as("stage"),
        lit(null).cast("long").as("sample_id"), col("source"),
        col("c").cast("long").as("n"))
    kept.unionAll(counts).unionAll(bySource)
  }

  /** Cross-video COPY detection by frame-hash containment — the
    * video-level near-dup operator above [[staticFrameFlags]]'s
    * within-video signal: two videos pair when the smaller one's
    * distinct frame-hash set is ≥ `minContainment` contained in the
    * overlap (the d07 containment move at frame granularity —
    * clipped/extended copies keep high containment where Jaccard
    * dilutes, exactly the quote/subset asymmetry d07 documents for
    * text). Input is [[framePerceptualHash]]'s output, so video bytes
    * were already reduced to (id, frame, 2×32-bit halves) scalars in
    * the decode stage.
    *
    * Scale shape: one distinct pass over (id, hash) scalars, an
    * inverted-index self-join keyed on the exact hash (the only
    * corpus-sized exchange — hashes, never frames), per-pair counts,
    * and a size join. Two guards bound the quadratic term:
    *  - `minFrames` (default 3): shorter clips don't participate — a
    *    1-frame video pairs at containment 1.0 with ANYTHING sharing
    *    that frame, a collision report rather than copy detection;
    *  - `maxPostings` (default 100, deliberately far below the text
    *    shingle cap): a frame hash present in more videos than that
    *    is boilerplate (black frames, title cards, static logos) and
    *    drops from the index — measured on the sf0.1 corpus the
    *    uncapped join fan-out is 186M rows vs 350k at cap 100, the
    *    excess concentrated in 151 boilerplate-class hashes. `None`
    *    is exact (sf-scale oracles).
    *
    * @return (id_a, id_b, n_shared, containment), id_a < id_b,
    *         containment = shared / min(|frames_a|, |frames_b|) ≥
    *         `minContainment`
    */
  def videoDupPairs(frameHashes: DataFrame, minContainment: Double = 0.8,
      minFrames: Int = 3, maxPostings: Option[Int] = Some(100),
      idCol: String = "sample_id"): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0, "bad containment")
    require(minFrames >= 1, "minFrames must be positive")
    val fhAll = frameHashes.select(col(idCol).cast("long").as("id"),
        col("ahash_hi"), col("ahash_lo"))
      .distinct()
    // boilerplate-ness is a corpus-wide property of the FRAME: the cap
    // applies first, over every video's distinct hashes
    val indexed = maxPostings match {
      case Some(cap) =>
        val kept = fhAll.groupBy(col("ahash_hi"), col("ahash_lo"))
          .agg(count(lit(1)).as("__c"))
          .where(col("__c") <= lit(cap))
          .select(col("ahash_hi"), col("ahash_lo"))
        fhAll.join(kept, Seq("ahash_hi", "ahash_lo"))
      case None => fhAll
    }
    // participation and containment denominators both count INDEXED
    // frames only: a video with fewer than `minFrames` non-boilerplate
    // frames doesn't participate (its pairings would be collision
    // reports), and dropped boilerplate contributes to neither the
    // overlap nor the sizes, so black-frame runs can't dilute a true
    // copy below threshold. Under `None` every frame is indexed — the
    // exact oracle path.
    val sizes = indexed.groupBy(col("id")).agg(count(lit(1)).as("nf"))
      .where(col("nf") >= lit(minFrames))
    val guarded = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      indexed.join(sizes.select(col("id")), Seq("id")))
    val shared = guarded.select(col("id").as("id_a"),
        col("ahash_hi"), col("ahash_lo"))
      .join(guarded.select(col("id").as("id_b"),
        col("ahash_hi"), col("ahash_lo")), Seq("ahash_hi", "ahash_lo"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("id").as("id_a"), col("nf").as("__na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("nf").as("__nb")), Seq("id_b"))
      .withColumn("containment",
        col("n_shared").cast("double") /
          least(col("__na"), col("__nb")).cast("double"))
      .where(col("containment") >= lit(minContainment))
      .select(col("id_a"), col("id_b"), col("n_shared"), col("containment"))
  }

  /** Copy-SPAN localization for the pairs [[videoDupPairs]] detects:
    * for each qualifying (id_a, id_b) pair, the consecutive runs of
    * id_a's frames whose hash also occurs in id_b — "WHICH part was
    * copied", the forensics step after copy detection (a 30 s clip
    * lifted into an hour-long video is one island; a re-encode of the
    * whole video is one island spanning everything). Matching counts
    * INDEXED frames only (the m26 boilerplate cap), so black-frame
    * runs don't weld unrelated islands together.
    *
    * Scale shape: the pair frame is qualifying pairs only (tiny,
    * AQE-broadcast onto the frame table); the a-side keeps its frame
    * indexes, the b-side contributes a distinct (id, hash) set, and
    * the islands are one gaps-and-islands window partitioned by pair
    * — frame payloads never enter, per-pair state is its matched
    * frame count.
    *
    * @return (id_a, id_b, start_frame, end_frame, n_frames), one row
    *         per island (unsorted — callers order)
    */
  def videoCopySpans(frameHashes: DataFrame, minContainment: Double = 0.8,
      minFrames: Int = 3, maxPostings: Option[Int] = Some(100),
      idCol: String = "sample_id"): DataFrame = {
    val pairs = videoDupPairs(frameHashes, minContainment, minFrames,
        maxPostings, idCol)
      .select(col("id_a"), col("id_b"))
    val frames = frameHashes.select(col(idCol).cast("long").as("id"),
      col("frame_idx"), col("ahash_hi"), col("ahash_lo"))
    val distinctHashes = frames.select(col("id"), col("ahash_hi"),
      col("ahash_lo")).distinct()
    // the same corpus-wide cap videoDupPairs applied: non-indexed
    // (boilerplate) frames neither match nor extend an island
    val indexedHashes = maxPostings match {
      case Some(cap) =>
        distinctHashes.join(
          distinctHashes.groupBy(col("ahash_hi"), col("ahash_lo"))
            .agg(count(lit(1)).as("__c"))
            .where(col("__c") <= lit(cap))
            .select(col("ahash_hi"), col("ahash_lo")),
          Seq("ahash_hi", "ahash_lo"))
      case None => distinctHashes
    }
    val aFrames = frames
      .join(indexedHashes.select(col("id"), col("ahash_hi"),
        col("ahash_lo")), Seq("id", "ahash_hi", "ahash_lo"), "left_semi")
    val matched = pairs
      .join(aFrames.withColumnRenamed("id", "id_a"), Seq("id_a"))
      .join(indexedHashes.select(col("id").as("id_b"), col("ahash_hi"),
        col("ahash_lo")), Seq("id_b", "ahash_hi", "ahash_lo"), "left_semi")
      .select(col("id_a"), col("id_b"), col("frame_idx"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"), col("id_b")).orderBy(col("frame_idx"))
    matched
      .withColumn("__grp", col("frame_idx") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("__grp"))
      .agg(min(col("frame_idx")).cast("long").as("start_frame"),
        max(col("frame_idx")).cast("long").as("end_frame"),
        count(lit(1)).as("n_frames"))
      .drop("__grp")
  }

  /** The COMPOSED video curation run — the m24/m25 trilogy's closing
    * member, the operator a video training-data pipeline schedules
    * nightly: the m26 boilerplate cap indexes each video's distinct
    * frame hashes, videos with fewer than `minFrames` distinctive
    * frames are dropped as under-indexed (mostly black/boilerplate
    * content — the video-native quality gate), [[videoDupPairs]]'
    * containment pair pass + transitive closure clusters the
    * survivors (clipped/extended copies land in one cluster), min-id
    * representatives are kept, and one result carries the curated
    * video list (with source), the per-stage audit counts, and the
    * per-source kept rollup.
    *
    * Scale shape: frame hashes arrive precomputed (the decode pass is
    * the caller's [[framePerceptualHash]] — payloads never enter this
    * operator), the cap and participation gates are count-rollups on
    * (id, hash) pairs, and the pair pass is the m26 bucket join whose
    * fan-out the cap bounds. The d34 cache discipline: hash, gate,
    * and pair frames are counted eagerly while hot and released in
    * try/finally; the survivor-id cache alone outlives the call,
    * scoped after the eager closure.
    *
    * @param frameHashes (idCol, frame_idx, ahash_hi, ahash_lo) — the
    *        [[framePerceptualHash]] output
    * @param meta (metaIdCol, srcCol) video provenance
    * @return (stage, sample_id, source, n): `stage='kept'` rows per
    *         curated video, audit rows `stage ∈ input|
    *         underindexed_dropped|pairs|clusters|dup_dropped`, and
    *         one `stage='kept_source'` row per source
    */
  def videoCurationRun(frameHashes: DataFrame, meta: DataFrame,
      minContainment: Double = 0.8, minFrames: Int = 3,
      maxPostings: Option[Int] = Some(100),
      idCol: String = "sample_id", metaIdCol: String = "sample_id",
      srcCol: String = "source"): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0, "bad containment")
    require(minFrames >= 1, "minFrames must be positive")
    val spark = frameHashes.sparkSession
    val fhAll = frameHashes.select(col(idCol).cast("long").as("sample_id"),
        col("ahash_hi"), col("ahash_lo"))
      .distinct().cache()
    val indexed = maxPostings match {
      case Some(cap) =>
        val kept = fhAll.groupBy(col("ahash_hi"), col("ahash_lo"))
          .agg(count(lit(1)).as("__c"))
          .where(col("__c") <= lit(cap))
          .select(col("ahash_hi"), col("ahash_lo"))
        fhAll.join(kept, Seq("ahash_hi", "ahash_lo"))
      case None => fhAll
    }
    val sizes = indexed.groupBy(col("sample_id")).agg(count(lit(1)).as("nf"))
      .where(col("nf") >= lit(minFrames))
      .cache()
    val participants = sizes.select(col("sample_id")).cache()
    val guarded = indexed.join(participants, Seq("sample_id")).cache()
    val pairs = guarded.select(col("sample_id").as("id_a"),
        col("ahash_hi"), col("ahash_lo"))
      .join(guarded.select(col("sample_id").as("id_b"),
        col("ahash_hi"), col("ahash_lo")), Seq("ahash_hi", "ahash_lo"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("sample_id").as("id_a"), col("nf").as("__na")),
        Seq("id_a"))
      .join(sizes.select(col("sample_id").as("id_b"), col("nf").as("__nb")),
        Seq("id_b"))
      .where(col("n_shared").cast("double") /
        least(col("__na"), col("__nb")).cast("double") >= lit(minContainment))
      .select(col("id_a"), col("id_b"))
      .cache()
    val (nIn, nPart, nPairs, comp) =
      try {
        val ni = fhAll.select(col("sample_id")).distinct().count()
        val np = participants.count()
        val npr = pairs.count() // materializes guarded + pairs hot
        (ni, np, npr, graft.pipeline.Dedup.connectedComponents(pairs))
      } finally {
        pairs.unpersist(); guarded.unpersist(); sizes.unpersist()
        fhAll.unpersist()
      }
    // survivor ids feed the kept leg and the per-source rollup of the
    // RESULT plan — scoped only now, after the eager closure, so the
    // closure's internal executions could not release it mid-build
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(
      participants)
    val dropped = comp.where(col("id") =!= col("component"))
      .select(col("id").as("sample_id"))
    val metaSlim = meta.select(col(metaIdCol).cast("long").as("sample_id"),
      col(srcCol).cast("string").as("source"))
    val keptIds = participants.join(dropped, Seq("sample_id"), "left_anti")
    val kept = keptIds.join(metaSlim, Seq("sample_id"), "left")
      .select(lit("kept").as("stage"), col("sample_id"), col("source"),
        lit(null).cast("long").as("n"))
    def c1(stage: String, n: Column) = spark.range(1).select(
      lit(stage).as("stage"), lit(null).cast("long").as("sample_id"),
      lit(null).cast("string").as("source"), n.cast("long").as("n"))
    val counts = c1("input", lit(nIn))
      .unionAll(c1("underindexed_dropped", lit(nIn - nPart)))
      .unionAll(c1("pairs", lit(nPairs)))
      .unionAll(comp.agg(countDistinct(col("component")).as("c"))
        .select(lit("clusters").as("stage"),
          lit(null).cast("long").as("sample_id"),
          lit(null).cast("string").as("source"), col("c").cast("long").as("n")))
      .unionAll(dropped.agg(count(lit(1)).as("c"))
        .select(lit("dup_dropped").as("stage"),
          lit(null).cast("long").as("sample_id"),
          lit(null).cast("string").as("source"), col("c").cast("long").as("n")))
    val bySource = keptIds.join(metaSlim, Seq("sample_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("c"))
      .select(lit("kept_source").as("stage"),
        lit(null).cast("long").as("sample_id"), col("source"),
        col("c").cast("long").as("n"))
    kept.unionAll(counts).unionAll(bySource)
  }

  /** Voice-activity segments over REAL decoded PCM — the segmentation
    * primitive audio curation runs before transcription (cut silence,
    * keep speech): fixed-length frames (`frameLen` samples, the last
    * frame partial), a frame is ACTIVE when its mean-square energy
    * exceeds the clip's mean square — cross-multiplied as integers
    * (`energy·n_clip > total·len_frame`), so the threshold is exact
    * on any engine — and runs of ≥ `minFrames` consecutive active
    * frames become segments (gaps-and-islands over the frame index).
    *
    * Scale shape: frame energies are computed inside the decode
    * mapPartitions (payloads never cross an exchange; only the
    * (id, frame, len, energy) quads move — ~24 B per frame); the
    * mean-energy threshold and the island grouping are windows over
    * the SAME sample_id partitioning, so the whole operator costs one
    * keyed exchange. The integer cross-multiply rides HUGEINT-width
    * decimals so hour-long clips (energy ~1e15 × n ~1e8) can't
    * overflow.
    *
    * @return one row per segment: (sample_id, start_frame, end_frame,
    *         n_frames, seg_energy)
    */
  def vadSegments(media: DataFrame, frameLen: Int = 64, minFrames: Int = 2,
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame = {
    require(frameLen > 0 && minFrames >= 1, "bad vad params")
    val spark = media.sparkSession
    import spark.implicits._
    val frames = media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val samples = WavCodec.decodeSamples(payload)._3
          val n = samples.length
          val nf = (n + frameLen - 1) / frameLen
          (0 until nf).iterator.map { f =>
            val from = f * frameLen
            val until = math.min(from + frameLen, n)
            var e = 0L
            var i = from
            while (i < until) { e += samples(i).toLong * samples(i); i += 1 }
            (id, f.toLong, (until - from).toLong, e)
          }
        }
      }
      .toDF("sample_id", "f", "flen", "energy")
    val byId = org.apache.spark.sql.expressions.Window.partitionBy(col("sample_id"))
    val dec = "decimal(38,0)"
    val active = frames
      .withColumn("ns", sum(col("flen")).over(byId))
      .withColumn("te", sum(col("energy")).over(byId))
      .where(col("energy").cast(dec) * col("ns").cast(dec) >
        col("te").cast(dec) * col("flen").cast(dec))
      .withColumn("grp", col("f") -
        row_number().over(byId.orderBy(col("f"))))
    active.groupBy(col("sample_id"), col("grp"))
      .agg(min(col("f")).as("start_frame"), max(col("f")).as("end_frame"),
        count(lit(1)).as("n_frames"), sum(col("energy")).as("seg_energy"))
      .where(col("n_frames") >= minFrames)
      .select(col("sample_id"), col("start_frame"), col("end_frame"),
        col("n_frames"), col("seg_energy"))
  }

  /** Audio quality gate over REAL decoded PCM — the per-clip report a
    * speech-curation pipeline thresholds before transcription:
    * clipping ratio (|s| ≥ clipAt — saturated recordings), DC offset
    * (mean sample — miswired capture), silence ratio (|s| ≤ silentAt),
    * dynamic range and peak. Every field is exact integer arithmetic
    * or one integer division, computed inside the decode
    * mapPartitions — audio bytes never cross an exchange, one ~50-byte
    * row per clip moves.
    *
    * @return (sample_id, n_samples, clip_ratio, dc_offset,
    *         silence_ratio, dyn_range, peak)
    */
  def audioQualityReport(media: DataFrame,
      clipAt: Int = 32000, silentAt: Int = 4096,
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame = {
    require(clipAt > 0 && silentAt >= 0, "bad audio quality params")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val samples = WavCodec.decodeSamples(payload)._3
          val n = samples.length
          if (n == 0) Iterator.empty
          else {
            var clipped = 0L; var silent = 0L; var sum = 0L
            var mx = Int.MinValue; var mn = Int.MaxValue
            var i = 0
            while (i < n) {
              val s = samples(i).toInt
              val a = math.abs(s)
              if (a >= clipAt) clipped += 1
              if (a <= silentAt) silent += 1
              sum += s
              if (s > mx) mx = s
              if (s < mn) mn = s
              i += 1
            }
            Iterator.single((id, n.toLong,
              clipped.toDouble / n, sum.toDouble / n, silent.toDouble / n,
              (mx - mn).toLong, math.max(math.abs(mx), math.abs(mn)).toLong))
          }
        }
      }
      .toDF("sample_id", "n_samples", "clip_ratio", "dc_offset",
        "silence_ratio", "dyn_range", "peak")
  }

  /** ViT-style patch grid over REAL decoded pixels — the
    * patch-embedding prep step of an image-training pipeline: the
    * image splits into patchW×patchH tiles (partial tiles at the
    * bottom keep their real row count) and each tile reports its
    * per-channel means — the downstream signals for blank-tile
    * dropping and patch-level dedup. Decode + tiling run in ONE
    * mapPartitions over the scan (image bytes never shuffle); each
    * emitted row is ~60 bytes per patch.
    *
    * Means are integer sums over the decoded bytes divided once —
    * exact on any engine.
    *
    * @return (sample_id, patch_row, patch_col, n_px, mean_r, mean_g,
    *         mean_b) — channel order matches [[decodeBmp]]'s BGR
    *         storage read back as (r, g, b)
    */
  def imagePatches(media: DataFrame, patchW: Int = 5, patchH: Int = 5,
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame = {
    require(patchW > 0 && patchH > 0, "bad patch dims")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (w, h, px) = BmpCodec.decodePixels(payload) // BGR triplets
          val pCols = (w + patchW - 1) / patchW
          val pRows = (h + patchH - 1) / patchH
          (0 until pRows).iterator.flatMap { pr =>
            (0 until pCols).iterator.map { pc =>
              val rows = math.min((pr + 1) * patchH, h) - pr * patchH
              val cols = math.min((pc + 1) * patchW, w) - pc * patchW
              var sb = 0L; var sg = 0L; var sr = 0L
              var r = 0
              while (r < rows) {
                var c = 0
                while (c < cols) {
                  val o = ((pr * patchH + r) * w + pc * patchW + c) * 3
                  sb += px(o) & 0xff
                  sg += px(o + 1) & 0xff
                  sr += px(o + 2) & 0xff
                  c += 1
                }
                r += 1
              }
              val nPx = (rows * cols).toLong
              (id, pr.toLong, pc.toLong, nPx,
                sr.toDouble / nPx, sg.toDouble / nPx, sb.toDouble / nPx)
            }
          }
        }
      }
      .toDF("sample_id", "patch_row", "patch_col", "n_px",
        "mean_r", "mean_g", "mean_b")
  }

  /** REAL audio resample, the WAV sibling of [[resizeBmp]]:
    * decode the PCM16 signal, nearest-neighbor resample via the
    * integer map src = ⌊i·srcRate/dstRate⌋ (nOut = ⌊n·dst/src⌋),
    * re-encode a canonical container at the target rate. Mono only
    * (the multichannel map needs frame-aligned interpolation a real
    * DSP resampler would do). Same mapPartitions contract; the m07
    * oracle pins decode→resample→encode→decode against byte math.
    */
  def resampleWav(media: DataFrame, targetRate: Int,
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame = {
    require(targetRate > 0, "bad target rate")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (rate, channels, samples) = WavCodec.decodeSamples(payload)
          require(channels == 1, s"resampleWav: mono only, got $channels")
          val nOut = (samples.length.toLong * targetRate / rate).toInt
          val out = Array.tabulate(nOut)(i =>
            samples((i.toLong * rate / targetRate).toInt))
          (id, WavCodec.encodePcm16(out, targetRate))
        }
      }
      .toDF(idCol, payloadCol)
  }

  /** Real media ingest: one row per file via the `binaryFile` source
    * (distributed scan, payload bytes stay executor-side), mapped to
    * [[mediaSchema]]. `media_type` from the filename extension;
    * width/height/duration left null for the decoder to fill.
    */
  /** Wrap a text corpus as REAL AVI payloads: the text is chopped
    * into width×height-byte frames (frame f, image-order pixel i ←
    * text byte f·w·h + i, zero-pixel padded past the end), with the
    * m05 channel functions (B = byte, G = 255−byte, R = 2·byte mod
    * 256) so a BGR mixup is visible per frame. Default 5×2 frames
    * make the stored row stride 16 (15 pixel bytes + 1 REAL pad
    * byte) and 10 text bytes per frame. Every decoded field is
    * derivable from the text by the oracle (m08).
    */
  def textAsAvi(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 5, height: Int = 2, usPerFrame: Int = 100000): DataFrame = {
    require(width > 0 && height > 0, "bad frame dims")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val perFrame = width * height
        it.map { case (id, text) =>
          val bytes = if (text == null) Array.emptyByteArray else text
          require(bytes.nonEmpty, "textAsAvi: empty payload (filter first)")
          val nFrames = (bytes.length + perFrame - 1) / perFrame
          val frames = Array.tabulate(nFrames) { f =>
            Array.tabulate(perFrame) { i =>
              val at = f * perFrame + i
              if (at < bytes.length) {
                val v = bytes(at) & 0xff
                (v.toByte, (255 - v).toByte, ((v * 2) % 256).toByte)
              } else (0.toByte, 0.toByte, 0.toByte)
            }
          }
          (id, AviCodec.encodeBgr24(frames, width, height, usPerFrame))
        }
      }
      .toDF("sample_id", "payload")
  }

  /** Per-FRAME decoded AVI stats, one row per (sample, frame). */
  case class AviFrameStats(
      sample_id: Long, n_bytes: Long, width: Int, height: Int,
      fps: Int, n_frames: Long, frame_idx: Long,
      mean_b: Double, mean_g: Double, mean_r: Double, top_left_b: Int)

  /** Partition-parallel REAL video decode, the frame-level sibling of
    * [[decodeBmp]]: same mapPartitions contract (payload bytes never
    * leave the executor; only the small per-frame stats rows flow
    * on), kernel is [[AviCodec]]'s actual RIFF chunk walk + per-frame
    * bottom-up strided pixel scan. Integer byte sums → exact doubles.
    */
  def decodeAviFrames(media: DataFrame, idCol: String = "sample_id",
      payloadCol: String = "payload"): Dataset[AviFrameStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (info, frames) = AviCodec.decodeFrames(payload)
          val n = info.width * info.height
          frames.iterator.zipWithIndex.map { case (px, f) =>
            var sumB = 0L; var sumG = 0L; var sumR = 0L
            var i = 0
            while (i < n) {
              sumB += px(i * 3) & 0xff
              sumG += px(i * 3 + 1) & 0xff
              sumR += px(i * 3 + 2) & 0xff
              i += 1
            }
            AviFrameStats(id, payload.length.toLong, info.width, info.height,
              1000000 / info.usPerFrame, info.nFrames.toLong, f.toLong,
              sumB.toDouble / n, sumG.toDouble / n, sumR.toDouble / n,
              px(0) & 0xff)
          }
        }
      }
  }

  /** Per-frame perceptual hash of one video sample. */
  case class FramePHash(
      sample_id: Long, frame_idx: Long,
      ahash_hi: Long, ahash_lo: Long, n_set: Long)

  /** Frame-level [[perceptualHash]] over REAL decoded AVI frames —
    * the temporal building block for video scene dedup: a static
    * scene is a run of consecutive frames whose hashes sit within a
    * few bits of each other, and sampling one frame per run is how a
    * multimodal pipeline avoids re-embedding near-identical frames.
    * Same lattice/threshold kernel as the image path applied to each
    * frame's pixel grid; same mapPartitions contract (payload bytes
    * never leave the executor, 4-long rows out).
    */
  def framePerceptualHash(media: DataFrame, grid: Int = 8,
      idCol: String = "sample_id", payloadCol: String = "payload"): Dataset[FramePHash] = {
    require(grid >= 2 && grid * grid <= 64, s"grid²=${grid * grid} must fit 64 bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (info, frames) = AviCodec.decodeFrames(payload)
          val (w, h) = (info.width, info.height)
          val n = grid * grid
          frames.iterator.zipWithIndex.map { case (px, f) =>
            val vals = new Array[Int](n)
            var i = 0
            var sum = 0L
            while (i < n) {
              val sr = ((i / grid).toLong * h / grid).toInt
              val sc = ((i % grid).toLong * w / grid).toInt
              val v = px((sr * w + sc) * 3) & 0xff
              vals(i) = v
              sum += v
              i += 1
            }
            val mean = sum.toDouble / n
            var hi = 0L; var lo = 0L; var nSet = 0L
            i = 0
            while (i < n) {
              if (vals(i) > mean) {
                if (i < 32) hi |= 1L << i else lo |= 1L << (i - 32)
                nSet += 1
              }
              i += 1
            }
            FramePHash(id, f.toLong, hi, lo, nSet)
          }
        }
      }
  }

  /** Flag frames whose hash sits within `maxHamming` bits of the
    * PREVIOUS frame — the static-scene signal: `dup_prev` runs mark
    * frames a curation pipeline can skip (keep the first of each
    * run). One (sample)-keyed window exchange over 4-long rows; the
    * heavy pixel work stayed in the codec scan.
    */
  def staticFrameFlags(frameHashes: DataFrame, maxHamming: Int = 3,
      idCol: String = "sample_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("frame_idx"))
    val popcnt = (c: org.apache.spark.sql.Column) =>
      call_function("bit_count", c).cast("long")
    frameHashes
      .withColumn("prev_hi", lag(col("ahash_hi"), 1).over(w))
      .withColumn("prev_lo", lag(col("ahash_lo"), 1).over(w))
      .withColumn("dup_prev", coalesce(
        popcnt(col("ahash_hi").bitwiseXOR(col("prev_hi"))) +
          popcnt(col("ahash_lo").bitwiseXOR(col("prev_lo"))) <= maxHamming,
        lit(false)))
      .drop("prev_hi", "prev_lo")
  }

  /** Scene segmentation from the frame-hash stream — the shot
    * detector a video-training pipeline samples from (one frame per
    * scene instead of every near-static frame): a CUT happens where a
    * frame's hash differs from its predecessor by more than
    * `maxHamming` bits; consecutive cut-free frames form a scene.
    * scene_idx is the running cut count, so segmentation is one lag
    * window plus one running sum over the SAME sample_id partitioning
    * as the rollup — the whole operator costs the m15 single keyed
    * exchange, and video bytes stayed in the codec scan.
    *
    * @return one row per scene: (sample_id, scene_idx, start_frame,
    *         end_frame, n_frames)
    */
  def sceneSegments(frameHashes: DataFrame, maxHamming: Int = 3,
      idCol: String = "sample_id"): DataFrame = {
    val byId = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("frame_idx"))
    val popcnt = (c: org.apache.spark.sql.Column) =>
      call_function("bit_count", c).cast("long")
    frameHashes
      .withColumn("prev_hi", lag(col("ahash_hi"), 1).over(byId))
      .withColumn("prev_lo", lag(col("ahash_lo"), 1).over(byId))
      .withColumn("cut", when(col("prev_hi").isNull, 1L).otherwise(
        when(popcnt(col("ahash_hi").bitwiseXOR(col("prev_hi"))) +
          popcnt(col("ahash_lo").bitwiseXOR(col("prev_lo"))) > maxHamming, 1L)
          .otherwise(0L)))
      .withColumn("scene_idx", sum(col("cut")).over(
        byId.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("scene_idx"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"))
      .select(col(idCol), col("scene_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"))
  }

  def readMediaDir(spark: SparkSession, dir: String, mediaType: String = ""): DataFrame = {
    val files = spark.read.format("binaryFile").load(dir)
    files.select(
      xxhash64(col("path")).as("sample_id"),
      (if (mediaType.nonEmpty) lit(mediaType)
       else lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))).as("media_type"),
      col("content").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))
  }

  /** Wrap a text corpus as fake media samples (UTF-8 bytes as the
    * payload) — used by tests and the demo queries; real ingest goes
    * through [[readMediaDir]].
    */
  def textAsMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("sample_id"),
      lit("image").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Partition-parallel decode + feature extraction. The per-row
    * kernel is [[MediaDecoder]] — REAL decode for WAV/BMP/AVI
    * payloads, [[FakeDecoder]] only for formats with no pure-JVM
    * codec — under the unchanged distribution contract
    * (mapPartitions, no shuffle, small output schema).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("sample_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, mt, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          digest.reset()
          val sha = digest.digest(bytes).map("%02x".format(_)).mkString
          val (mean, vec) = MediaDecoder.decode(bytes)
          MediaFeatures(id, mt, bytes.length.toLong, sha, mean, vec)
        }
      }
  }

  /** Pure-SQL metadata pass (no decode): byte sizes and digests via
    * codegen'd expressions — the fast path for corpus accounting.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("sample_id"),
      col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"))

  /** Frame sampling over a media payload: the payload is cut into
    * fixed-size byte frames and every `every`-th frame is emitted
    * with its digest — the video keyframe-sampling shape, as pure
    * codegen'd expressions (binary substring), no decode needed. The
    * digest is md5 over the frame's hex rendering so a byte-exact
    * oracle exists in engines that cannot slice blobs directly.
    *
    * Scale: map-side only — frames of a payload never leave the
    * executor holding the sample row; output rows carry (sample,
    * frame) provenance for downstream dedup/indexing.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    require(frameBytes > 0 && every > 0, "frameBytes and every must be positive")
    // floor division via double-cast truncates TOWARD ZERO, so an
    // empty payload would yield nLast = 0 (a phantom zero-byte frame,
    // and sequence(0,-1) would even DESCEND) — emit no frames instead
    val nLast = ((octet_length(col("payload")) - lit(1)) / lit(frameBytes)).cast("int")
    val frameIdxs = when(octet_length(col("payload")) > 0, sequence(lit(0), nLast))
      .otherwise(array().cast("array<int>"))
    graft.ops.ScaleOps.fanOut(media)
      .select(col("sample_id"), col("media_type"), col("payload"),
        explode(frameIdxs).as("frame_idx"))
      .where(col("frame_idx") % every === 0)
      .select(col("sample_id"), col("media_type"), col("frame_idx"),
        md5(hex(expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")))
          .as("frame_md5"),
        least(octet_length(col("payload")) - col("frame_idx") * frameBytes,
          lit(frameBytes)).cast("long").as("frame_bytes"))
  }

  /** REAL image resize: decode the BMP pixel grid, nearest-neighbor
    * resample in image coordinates (source pixel (⌊r·h/H⌋, ⌊c·w/W⌋)
    * — integer arithmetic, so an oracle reproduces every output
    * pixel), re-encode as a canonical BMP. Replaces [[resizeStub]]
    * for the one format this container can decode; same mapPartitions
    * contract (payloads never leave the executor, no shuffle). The
    * m06 oracle pins the full decode→transform→encode→decode chain
    * against byte-level math on the ground-truth text.
    */
  def resizeBmp(media: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "sample_id", payloadCol: String = "payload"): DataFrame = {
    require(targetW > 0 && targetH > 0, "bad target dims")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (w, h, px) = BmpCodec.decodePixels(payload)
          val out = Array.tabulate(targetW * targetH) { i =>
            val r = i / targetW
            val c = i % targetW
            val sr = (r.toLong * h / targetH).toInt
            val sc = (c.toLong * w / targetW).toInt
            val o = (sr * w + sc) * 3
            (px(o), px(o + 1), px(o + 2))
          }
          (id, BmpCodec.encodeBgr24(out, targetW, targetH))
        }
      }
      .toDF(idCol, payloadCol)
  }

  /** Perceptual average-hash of one image, 64 bits in two sign-safe
    * halves (bit 63 in a BIGINT flips the sign; two 32-bit halves
    * keep every value non-negative so the SQL oracle can rebuild them
    * with plain integer arithmetic).
    */
  case class PHash(
      sample_id: Long, width: Int, height: Int,
      ahash_hi: Long, ahash_lo: Long, n_set: Long, sample_mean: Double)

  /** Perceptual average-hash (aHash) over REAL decoded BMP pixels:
    * nearest-neighbor sample the blue channel onto a grid×grid
    * lattice (src = (⌊r·h/grid⌋, ⌊c·w/grid⌋) — the same integer
    * coordinate map as [[resizeBmp]]), threshold each sample against
    * the lattice mean (strict >), pack row-major. Two images whose
    * pixels mostly agree land within a few bits of each other, which
    * is what image-level near-dup detection at corpus scale keys on —
    * the 64-bit hash shuffles instead of the image bytes.
    *
    * Same distribution contract as [[decodeBmp]]: one mapPartitions,
    * payloads never leave the executor, small typed rows out.
    */
  def perceptualHash(media: DataFrame, grid: Int = 8,
      idCol: String = "sample_id", payloadCol: String = "payload"): Dataset[PHash] = {
    require(grid >= 2 && grid * grid <= 64, s"grid²=${grid * grid} must fit 64 bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (w, h, px) = BmpCodec.decodePixels(payload)
          val n = grid * grid
          val vals = new Array[Int](n)
          var i = 0
          var sum = 0L
          while (i < n) {
            val sr = ((i / grid).toLong * h / grid).toInt
            val sc = ((i % grid).toLong * w / grid).toInt
            val v = px((sr * w + sc) * 3) & 0xff // blue channel of BGR
            vals(i) = v
            sum += v
            i += 1
          }
          val mean = sum.toDouble / n
          var hi = 0L
          var lo = 0L
          var nSet = 0L
          i = 0
          while (i < n) {
            if (vals(i) > mean) {
              if (i < 32) hi |= 1L << i else lo |= 1L << (i - 32)
              nSet += 1
            }
            i += 1
          }
          PHash(id, w, h, hi, lo, nSet, mean)
        }
      }
  }

  /** All pairs of images whose aHashes differ by at most `maxHamming`
    * bits, found WITHOUT the O(N²) join: the 64-bit hash splits into
    * `maxHamming + 1` bands, pairs meet through band-equality
    * buckets, and by pigeonhole `maxHamming` flipped bits cannot
    * touch every one of `maxHamming + 1` disjoint bands — the
    * blocking is LOSSLESS, so the result equals the full quadratic
    * join and the m11 oracle verifies it against one.
    *
    * Band count tracks the threshold instead of being fixed at 8
    * because bucket sizes are the whole cost: text/image aHashes are
    * STRUCTURED (mostly-set rows make 0xFF-ish band keys hot — a
    * measured 8-bit band bucket held 27% of a 10k corpus, turning
    * "blocked" into 10M pair evaluations for 10k real pairs). Fewer,
    * wider bands are exponentially more selective — at the m11
    * threshold of 3, four 16-bit bands cut the same corpus's pair
    * work ~20×. Per-bucket work is (|bucket|²)/2 on 3-column rows;
    * hot buckets remain observable in shuffle metrics.
    */
  /** LSH band explosion for 64-bit perceptual hashes: adds (band,
    * key) rows — nBands per input row — keeping every input column.
    * Pigeonhole-lossless for hamming ≤ nBands−1: at least one band
    * must match exactly. Factored from [[phashDupPairs]] so the
    * incremental release's CROSS-frame join (corpus bands vs
    * broadcast batch bands) rides the identical keys.
    */
  private def withHashBands(df: DataFrame, nBands: Int): DataFrame = {
    val w = 64 / nBands
    // bit 63 never carries sign weight here: both halves are 32-bit
    // non-negative, and the band keys come off unsigned shifts
    val full = shiftleft(col("ahash_lo"), 32).bitwiseOR(col("ahash_hi"))
    val bands = (0 until nBands).map { j =>
      val shifted = shiftrightunsigned(full, j * w)
      val key = // top band keeps every remaining bit (64 may not divide evenly)
        if (j == nBands - 1) shifted
        else shifted.bitwiseAND(lit((1L << w) - 1))
      struct(lit(j).as("band"), key.as("key"))
    }
    df.withColumn("__b", explode(array(bands: _*)))
      .withColumn("band", col("__b.band"))
      .withColumn("key", col("__b.key"))
      .drop("__b")
  }

  def phashDupPairs(hashes: DataFrame, maxHamming: Int = 7,
      idCol: String = "sample_id"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming must be in [0,7] (got $maxHamming): beyond 8 bands " +
        "the 8-bit keys stop discriminating structured hashes")
    // Both sides of the self-join read the hash frame; uncached, each
    // side re-runs the whole upstream pipeline — for hashes fresh out
    // of [[perceptualHash]] that is the BMP encode+decode+lattice
    // codec TWICE more. The cached frame is (id, 2×long) — trivially
    // small; scope-released after the first consuming execution.
    val slim = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      hashes.select(col(idCol), col("ahash_hi"), col("ahash_lo")))
    val exploded = withHashBands(slim, maxHamming + 1)
    val popcnt = (c: org.apache.spark.sql.Column) =>
      call_function("bit_count", c).cast("long")
    exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (popcnt(col("a.ahash_hi").bitwiseXOR(col("b.ahash_hi"))) +
          popcnt(col("a.ahash_lo").bitwiseXOR(col("b.ahash_lo")))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Resized media record from the stubbed resize kernel. */
  case class ResizedMedia(
      sample_id: Long,
      media_type: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Deterministic STUB resize (real codecs absent in this
    * container): nearest-neighbor byte downsample to targetW×targetH
    * "pixels". The Spark-side contract — mapPartitions, payload stays
    * executor-side, metadata updated, typed output — is the real
    * plumbing a JNI codec would slot into.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0)
    val spark = media.sparkSession
    import spark.implicits._
    val n = targetW * targetH
    media.select("sample_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, payload0) =>
          val payload = if (payload0 == null) Array.emptyByteArray else payload0
          val out =
            if (payload.isEmpty) Array.emptyByteArray
            else {
              val take = math.min(n, payload.length)
              val stride = payload.length.toDouble / take
              Array.tabulate(take)(i => payload(math.min((i * stride).toInt, payload.length - 1)))
            }
          ResizedMedia(id, mt, out, targetW, targetH)
        }
      }
  }
}
