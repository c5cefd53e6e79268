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
