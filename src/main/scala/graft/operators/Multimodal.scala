package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Multimodal-column plumbing: media payloads as opaque binary columns with
  * typed metadata. The Spark side (schema, batching, partitioning) is real;
  * the codec is a clearly-marked deterministic stub — the actual image/audio
  * libraries are not in this container.
  */
object Multimodal {

  /** Declarative metadata extraction over a binary payload column.
    * "Decode" derives fake-but-deterministic dimensions from the content
    * hash (STUB for a real codec; plumbing and types are the real part).
    */
  def binaryMeta(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("hm", Hashing.h60(col("text")))
      .select(
        col("doc_id"),
        expr("octet_length(payload)").as("byte_len"),
        md5(col("payload")).as("content_hash"),
        // integer `div`, not `/` (long / long would widen to double)
        expr("CAST(64 + hm % 512 AS INT)").as("width"),
        expr("CAST(64 + (hm div 512) % 512 AS INT)").as("height"),
        expr("CAST(1 + hm % 8 AS INT)").as("n_frames"))

  /** Keyframe selection: one representative frame per detected scene
    * (the first frame of each [[sceneDetect]] shot) with the shot
    * length — the standard "sample one frame per shot" reduction a
    * video pipeline runs before per-frame embedding, cutting decode /
    * embed cost from O(frames) to O(shots). One aggregate over the
    * per-doc scene stream.
    */
  def keyframes(docs: DataFrame, maxHamming: Int = 25): DataFrame =
    sceneDetect(docs, maxHamming)
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(min(col("frame_idx")).as("keyframe_idx"),
        count(lit(1)).as("scene_len"))

  /** Aspect-ratio bucketing (the SDXL-style batching step: images train
    * in fixed-shape batches, so each image snaps to the nearest
    * aspect-ratio bucket and pays a crop). Each image joins the FIXED
    * 5-bucket ladder (a literal array — the explode is a constant ×5,
    * not a shuffle), picks the bucket minimizing |ratio − target| with
    * an index tie-break, and reports per-bucket counts plus the mean
    * center-crop fraction (1 − min(r/t, t/r)), averaged via an exact
    * 1e-4-grid long sum. Map-only until the final tiny aggregate; the
    * per-image window partitions on doc_id (≤5 rows each).
    */
  def aspectBuckets(docs: DataFrame): DataFrame = {
    val targets = Seq(("square", 1.0, 1.0), ("landscape_4_3", 4.0, 3.0),
      ("portrait_3_4", 3.0, 4.0), ("wide_16_9", 16.0, 9.0), ("tall_9_16", 9.0, 16.0))
    val tArr = array(targets.zipWithIndex.map { case ((n, a, b), i) =>
      struct(lit(i).as("idx"), lit(n).as("bucket"), lit(a / b).as("t"))
    }: _*)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("dist"), col("idx"))
    binaryMeta(docs)
      .withColumn("r", col("width").cast("double") / col("height"))
      .select(col("doc_id"), col("r"), explode(tArr).as("tb"))
      .select(col("doc_id"), col("r"), col("tb.idx").as("idx"),
        col("tb.bucket").as("bucket"), col("tb.t").as("t"))
      .withColumn("dist", abs(col("r") - col("t")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("crop4",
        floor((lit(1.0) - least(col("r") / col("t"), col("t") / col("r")))
          * 10000.0 + 0.5).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_images"),
        graft.functions.Hashing.rd4(
          sum(col("crop4")).cast("double") / 10000.0 / count(lit(1)))
          .as("mean_crop"))
  }

  /** Frame sampling: one row per sampled frame index (every `everyN`th of
    * the decoded n_frames), with a deterministic per-frame content hash.
    * Real plumbing: explode + per-frame derivation; the frame decode
    * itself is the same md5-stub as binaryMeta.
    */
  def frameSample(docs: DataFrame, everyN: Int): DataFrame =
    binaryMeta(docs)
      .select(col("doc_id"), col("content_hash"), col("n_frames"),
        explode(expr(s"sequence(0, n_frames - 1, $everyN)")).as("frame_idx"))
      .withColumn("frame_hash",
        Hashing.h60(concat(col("content_hash"), lit("_f"), col("frame_idx"))))
      .select(col("doc_id"), col("frame_idx"), col("frame_hash"))

  /** Shot-boundary (scene-change) detection over the frame stream: a
    * boundary is a frame whose hash differs from its predecessor by more
    * than `maxHamming` of 60 bits; scene_id is the running boundary
    * count — the clip-segmentation step a video pipeline runs before
    * per-scene sampling. With a real codec the hash becomes a perceptual
    * hash; the window/lag/bit_count shape is unchanged. Per-doc windows
    * only — no global ordering.
    */
  def sceneDetect(docs: DataFrame, maxHamming: Int = 25): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameSample(docs, 1)
      .withColumn("prev_hash", lag(col("frame_hash"), 1).over(w))
      .withColumn("dist",
        when(col("prev_hash").isNull, lit(null).cast("long"))
          .otherwise(bit_count(col("frame_hash").bitwiseXOR(col("prev_hash"))).cast("long")))
      .withColumn("is_boundary", col("prev_hash").isNull || col("dist") > maxHamming)
      .withColumn("scene_id",
        sum(when(col("is_boundary"), 1L).otherwise(0L)).over(w))
      .select(col("doc_id"), col("frame_idx"), col("dist"),
        col("is_boundary"), col("scene_id"))
  }

  /** Resize: recompute target dimensions preserving aspect ratio against a
    * bounding box — metadata-level op; a real codec would transform pixels.
    */
  def resize(meta: DataFrame, maxW: Int, maxH: Int): DataFrame =
    meta.withColumn("scale",
        least(lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height"), lit(1.0)))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** Feature extraction STUB: a deterministic 8-dim pseudo-embedding per
    * payload (hash-derived floats in [-1,1)). Schema/batching is what a
    * real extractor would produce (array<float> column).
    */
  def featureExtract(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr("""transform(sequence(0, 7), i ->
                CAST((CAST(conv(substring(md5(concat(text, '_e', i)), 1, 15), 16, 10) AS BIGINT)
                      % 2000 - 1000) / 1000.0 AS FLOAT))""").as("features"))

  /** Audio metadata + fixed-duration chunking: the audio twin of
    * binaryMeta + frameSample. "Decode" derives sample_rate/duration from
    * the content hash (STUB codec, as above); the chunking — one row per
    * `chunkSecs` window with [start, end) clipped to the clip length and a
    * deterministic per-chunk hash — is the real Spark plumbing an ASR /
    * audio-embedding pipeline feeds from. Explode of ≤ duration/chunkSecs
    * ints per clip; no shuffle.
    */
  def audioChunks(docs: DataFrame, chunkSecs: Int): DataFrame =
    chunksFrom(docs
      .withColumn("hm", Hashing.h60(col("text")))
      .select(
        col("doc_id"),
        md5(col("text")).as("content_hash"),
        expr("CAST(CASE WHEN hm % 3 = 0 THEN 16000 WHEN hm % 3 = 1 THEN 22050 ELSE 44100 END AS INT)")
          .as("sample_rate"),
        expr("CAST(1 + (hm div 8) % 120 AS INT)").as("duration_s")), chunkSecs)

  /** [[audioChunks]] over already-decoded audio metadata
    * (doc_id, content_hash, sample_rate, duration_s) — the entry a
    * real-codec pipeline uses: decode once (e.g. [[decodeAudioBatched]]
    * with [[WavCodec]]), chunk the result. Codec-agnostic, map-only.
    */
  def chunksFrom(meta: DataFrame, chunkSecs: Int): DataFrame =
    meta
      .select(col("doc_id"), col("content_hash"), col("sample_rate"), col("duration_s"),
        explode(expr(s"sequence(0, duration_s - 1, $chunkSecs)")).as("chunk_start_s"))
      .withColumn("chunk_end_s",
        least(col("chunk_start_s") + chunkSecs, col("duration_s")))
      .withColumn("chunk_hash",
        Hashing.h60(concat(col("content_hash"), lit("_c"), col("chunk_start_s"))))
      .select(col("doc_id"), col("sample_rate"), col("duration_s"),
        col("chunk_start_s"), col("chunk_end_s"), col("chunk_hash"))

  /** ViT-style patch tiling: one row per (tile_x, tile_y) cell of a
    * `patch`×`patch` grid over the decoded image, edge tiles clipped to
    * the image bounds — the patch feed an image encoder consumes. Two
    * chained explodes (≤ ceil(w/p)·ceil(h/p) rows per image), no shuffle;
    * the patch-pixel decode is the same md5 stub as binaryMeta.
    */
  def imageTiles(docs: DataFrame, patch: Int): DataFrame =
    tilesFrom(binaryMeta(docs)
      .select(col("doc_id"), col("content_hash"), col("width"), col("height")), patch)

  /** [[imageTiles]] over already-decoded metadata — the entry a real-codec
    * pipeline uses: decode once (e.g. [[decodeBatched]] with [[PngCodec]]),
    * tile the (doc_id, content_hash, width, height) result. The tiling
    * itself is codec-agnostic.
    */
  def tilesFrom(meta: DataFrame, patch: Int): DataFrame =
    meta
      .withColumn("tile_x", explode(expr(s"sequence(0, (width - 1) div $patch)")))
      .withColumn("tile_y", explode(expr(s"sequence(0, (height - 1) div $patch)")))
      .select(col("doc_id"),
        col("tile_x").cast("int").as("tile_x"),
        col("tile_y").cast("int").as("tile_y"),
        (col("tile_x") * patch).cast("int").as("x0"),
        least(col("tile_x") * patch + patch, col("width")).cast("int").as("x1"),
        (col("tile_y") * patch).cast("int").as("y0"),
        least(col("tile_y") * patch + patch, col("height")).cast("int").as("y1"),
        Hashing.h60(concat(col("content_hash"), lit("_t"), col("tile_x"),
          lit("_"), col("tile_y"))).as("tile_hash"))

  /** Tile-level exact dedup across the media corpus: tiles whose content
    * hash repeats in ≥2 documents, with the keep-first survivor — the
    * multimodal twin of Dedup.exact (repeated logos/watermarks/borders
    * and re-encoded copies of the same image surface as shared tiles
    * even when whole-file hashes differ by container metadata). Tile
    * hashes are already content-derived 60-bit ints, so only ints
    * shuffle: one hash aggregation over the map-only tile explode.
    */
  def tileDedup(docs: DataFrame, patch: Int): DataFrame =
    imageTiles(docs, patch)
      .groupBy(col("tile_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper"),
        count(lit(1)).as("n_tiles"))
      .filter(col("n_docs") >= 2)

  final case class MediaBatch(doc_id: Long, payload: Array[Byte])
  final case class DecodedMedia(
      doc_id: Long, byte_len: Int, width: Int, height: Int, n_frames: Int)

  /** A media codec: payload bytes → decoded metadata. Implementations
    * must be Serializable (they ship to executors inside the
    * mapPartitions closure) and cheap to construct — expensive native
    * state belongs in [[Codec.open]], called once per partition.
    */
  trait Codec extends Serializable {
    /** Per-partition initialization hook (native contexts, thread-local
      * decoders); default no-op. Called once before the row iterator.
      */
    def open(): Unit = ()
    def decode(docId: Long, payload: Array[Byte]): DecodedMedia
  }

  /** The declared deterministic STUB codec (hash-derived dimensions) —
    * the oracle contract for every mm_* query, unchanged since round 1.
    */
  object StubCodec extends Codec {
    def decode(docId: Long, payload: Array[Byte]): DecodedMedia = {
      val h = Hashing.h60jvm(new String(payload, java.nio.charset.StandardCharsets.UTF_8))
      DecodedMedia(docId, payload.length,
        (64 + h % 512).toInt, (64 + (h / 512) % 512).toInt, (1 + h % 8).toInt)
    }
  }

  /** A REAL image codec over `javax.imageio` (PNG/JPEG/GIF — whatever
    * ImageIO readers the JVM ships): width/height from the actual pixel
    * raster, n_frames = 1 (still images). This is the codec the
    * [[decodeBatched]] seam was built for; the oracle queries keep the
    * stub so results stay engine-portable, and the real path is proven by
    * spec on generated PNGs.
    */
  object ImageIoCodec extends Codec {
    override def open(): Unit =
      // per-partition init: ImageIO's disk cache is pure overhead for
      // in-memory byte-array decodes
      javax.imageio.ImageIO.setUseCache(false)
    def decode(docId: Long, payload: Array[Byte]): DecodedMedia = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"doc $docId: payload is not a decodable image")
      DecodedMedia(docId, payload.length, img.getWidth, img.getHeight, 1)
    }
  }

  /** Batch decode via mapPartitions — the shape a real codec integration
    * takes (per-partition codec init, row-batch iteration). Defaults to
    * the declared [[StubCodec]]; pass [[ImageIoCodec]] for real PNG/JPEG
    * decoding.
    */
  def decodeBatched(spark: SparkSession, media: Dataset[MediaBatch],
      codec: Codec = StubCodec): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { it =>
      codec.open()
      it.map(m => codec.decode(m.doc_id, m.payload))
    }
  }

  final case class DecodedAudio(
      doc_id: Long, byte_len: Int, sample_rate: Int, n_channels: Int,
      n_samples: Long, duration_s: Int)

  /** An audio codec: payload bytes → decoded clip metadata. Same contract
    * as [[Codec]] (Serializable, cheap construction, per-partition
    * [[AudioCodec.open]]).
    */
  trait AudioCodec extends Serializable {
    def open(): Unit = ()
    def decode(docId: Long, payload: Array[Byte]): DecodedAudio
  }

  /** Deterministic STUB audio codec — the same hash-derived
    * sample_rate/duration the [[audioChunks]] oracle query declares
    * (payload interpreted as UTF-8 text, as in [[StubCodec]]).
    */
  object StubAudioCodec extends AudioCodec {
    def decode(docId: Long, payload: Array[Byte]): DecodedAudio = {
      val h = Hashing.h60jvm(new String(payload, java.nio.charset.StandardCharsets.UTF_8))
      val rate = (h % 3).toInt match { case 0 => 16000; case 1 => 22050; case _ => 44100 }
      val dur = (1 + (h / 8) % 120).toInt
      DecodedAudio(docId, payload.length, rate, 1, rate.toLong * dur, dur)
    }
  }

  /** A REAL audio codec over `javax.sound.sampled` (WAV/AIFF/AU —
    * whatever AudioSystem providers the JVM ships): sample rate, channel
    * count and frame count from the actual container header.
    * `duration_s` is the ceiling of frames/rate so the last partial
    * second still gets a chunk — a chunker that floors would silently
    * drop the clip tail. Oracle queries keep [[StubAudioCodec]]; the
    * real path is proven by spec on generated WAVs.
    */
  object WavCodec extends AudioCodec {
    def decode(docId: Long, payload: Array[Byte]): DecodedAudio = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        require(frames >= 0, s"doc $docId: audio stream has unknown length")
        val rate = math.round(fmt.getSampleRate).toInt
        val dur = math.ceil(frames.toDouble / rate).toInt
        DecodedAudio(docId, payload.length, rate, fmt.getChannels, frames, dur)
      } finally ais.close()
    }
  }

  /** [[decodeBatched]] for audio payloads. Defaults to the declared
    * [[StubAudioCodec]]; pass [[WavCodec]] for real WAV decoding.
    */
  def decodeAudioBatched(spark: SparkSession, media: Dataset[MediaBatch],
      codec: AudioCodec = StubAudioCodec): Dataset[DecodedAudio] = {
    import spark.implicits._
    media.mapPartitions { it =>
      codec.open()
      it.map(m => codec.decode(m.doc_id, m.payload))
    }
  }
}
