package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns plus typed metadata, following the
  * convention of large-scale multimodal dataset formats (one row per
  * sample, media inline or by reference).
  *
  * The actual media codecs are NOT available in this environment, so
  * the decode kernel is a clearly-marked deterministic stub
  * ([[FakeDecoder]]); everything Spark-side — schema, batch shape,
  * partition-wise execution, feature extraction contract — is real
  * and tested. Swap [[FakeDecoder]] for a JNI/javacpp codec in
  * production.
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

    /** Chunk-walking RIFF parser: validates magic, honors RIFF's
      * even-byte chunk padding, finds `fmt ` and `data` wherever they
      * sit (real encoders emit LIST/INFO chunks between them), and
      * rejects non-PCM or non-16-bit streams loudly instead of
      * misreading them.
      */
    def decode(bytes: Array[Byte]): WavInfo = {
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

  /** Real media ingest: one row per file via the `binaryFile` source
    * (distributed scan, payload bytes stay executor-side), mapped to
    * [[mediaSchema]]. `media_type` from the filename extension;
    * width/height/duration left null for the decoder to fill.
    */
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
    * kernel is the stub; the distribution contract (mapPartitions,
    * no shuffle, small output schema) is the real design.
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
          val (mean, vec) = FakeDecoder.decode(bytes)
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
