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
    keyframesFrom(sceneDetect(docs, maxHamming))

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
  def sceneDetect(docs: DataFrame, maxHamming: Int = 25): DataFrame =
    scenesFrom(frameSample(docs, 1), maxHamming)

  /** [[sceneDetect]] over an already-decoded frame stream
    * (doc_id, frame_idx, frame_hash) — the entry a real-codec pipeline
    * uses: decode once (e.g. [[decodeVideoBatched]] with [[Y4MCodec]] or
    * [[MjpegCodec]], whose per-frame hash is a real perceptual aHash),
    * detect scenes on the result. Codec-agnostic: per-doc window + lag +
    * bit_count, no global ordering.
    */
  def scenesFrom(frames: DataFrame, maxHamming: Int = 25): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
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

  /** [[keyframes]] over an already-detected scene stream — compose
    * `keyframesFrom(scenesFrom(decoded frames))` for the real-codec path.
    */
  def keyframesFrom(scenes: DataFrame): DataFrame =
    scenes
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(min(col("frame_idx")).as("keyframe_idx"),
        count(lit(1)).as("scene_len"))

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
    *
    * ONE md5 of the payload, eight 16-bit hex windows — the previous
    * shape hashed the full text EIGHT times inside an interpreted
    * higher-order lambda (~8× the per-row digest cost plus ~1µs/element
    * lambda overhead); explicit array elements over a hoisted digest
    * stay in whole-stage codegen.
    */
  def featureExtract(docs: DataFrame): DataFrame =
    docs
      .withColumn("__h", md5(col("text")))
      .select(col("doc_id"),
        array((0 until 8).map { i =>
          ((conv(substring(col("__h"), i * 4 + 1, 4), 16, 10).cast("long")
            % 2000L - 1000L) / 1000.0).cast("float")
        }: _*).as("features"))

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

  final case class DecodedFrame(
      doc_id: Long, frame_idx: Int, width: Int, height: Int, frame_hash: Long)

  /** A video codec: payload bytes → one row per decoded frame, with a
    * 60-bit per-frame hash ([[scenesFrom]]'s boundary signal — perceptual
    * for the real codecs, md5-derived for the stub). Same contract as
    * [[Codec]]: Serializable, cheap construction, per-partition
    * [[VideoCodec.open]].
    */
  trait VideoCodec extends Serializable {
    def open(): Unit = ()
    def decodeFrames(docId: Long, payload: Array[Byte]): Iterator[DecodedFrame]
  }

  /** Deterministic STUB video codec — the exact frame stream
    * [[frameSample]](docs, 1) declares (hash-derived frame count and
    * per-frame md5 hashes), so `scenesFrom(stub decode)` equals
    * `sceneDetect(docs)` row-for-row.
    */
  object StubVideoCodec extends VideoCodec {
    def decodeFrames(docId: Long, payload: Array[Byte]): Iterator[DecodedFrame] = {
      val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      val h = Hashing.h60jvm(text)
      val md5Hex = java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map(b => f"$b%02x").mkString
      val (w0, h0) = ((64 + h % 512).toInt, (64 + (h / 512) % 512).toInt)
      (0 until (1 + h % 8).toInt).iterator.map(i =>
        DecodedFrame(docId, i, w0, h0, Hashing.h60jvm(s"${md5Hex}_f$i")))
    }
  }

  /** 60-bit average-hash (aHash) over a luma plane: block-average the
    * frame to an 8×8 grid, threshold each cell at the grid mean, pack the
    * 64 bits and mask to 60 (the repo-wide hash width). The standard
    * perceptual hash for shot-boundary detection: near-identical frames
    * agree on almost every bit, a cut flips about half of them. `luma`
    * returns 0–255 at (x, y).
    */
  private[operators] def aHash60(luma: (Int, Int) => Int, w: Int, h: Int): Long = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val ci = cy * 8 + x * 8 / w
        sums(ci) += luma(x, y)
        counts(ci) += 1
        x += 1
      }
      y += 1
    }
    val avgs = Array.tabulate(64)(i =>
      if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
    val mean = avgs.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) { if (avgs(i) > mean) bits |= (1L << i); i += 1 }
    bits & ((1L << 60) - 1)
  }

  /** A REAL video codec for YUV4MPEG2 (.y4m) — the uncompressed interchange
    * format every ffmpeg/mjpegtools install writes, parseable in pure JVM:
    * ASCII stream header (`YUV4MPEG2 W<w> H<h> ...`), then per frame an
    * ASCII `FRAME` line + raw planar YCbCr bytes. Supports the common
    * chroma taggings (C420*, C422, C444, Cmono); only the luma plane (the
    * first w·h bytes of each frame) feeds [[aHash60]], chroma is skipped.
    */
  object Y4MCodec extends VideoCodec {
    def decodeFrames(docId: Long, payload: Array[Byte]): Iterator[DecodedFrame] = {
      var pos = payload.indexOf('\n'.toByte)
      require(pos > 0, s"doc $docId: no Y4M stream header")
      val header = new String(payload, 0, pos, java.nio.charset.StandardCharsets.US_ASCII)
      require(header.startsWith("YUV4MPEG2"), s"doc $docId: not a YUV4MPEG2 stream")
      val params = header.split(' ').drop(1)
      def param(tag: Char): Option[String] =
        params.collectFirst { case p if p.nonEmpty && p.head == tag => p.tail }
      val w = param('W').map(_.toInt).getOrElse(
        throw new IllegalArgumentException(s"doc $docId: Y4M header missing W"))
      val h = param('H').map(_.toInt).getOrElse(
        throw new IllegalArgumentException(s"doc $docId: Y4M header missing H"))
      val chroma = param('C').getOrElse("420jpeg")
      val lumaBytes = w * h
      // EXACT known 8-bit taggings only: a prefix match would silently
      // size 10/12/16-bit streams (C420p10, C422p12, …) and the
      // 4-plane C444alpha as 8-bit 3-plane, misaligning every frame
      // stride — those must hit the loud unsupported-chroma error.
      val frameBytes = chroma match {
        case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
          lumaBytes + 2 * ((w + 1) / 2) * ((h + 1) / 2)
        case "422" => lumaBytes + 2 * ((w + 1) / 2) * h
        case "444" => lumaBytes * 3
        case "mono" => lumaBytes
        case c => throw new IllegalArgumentException(s"doc $docId: unsupported chroma C$c")
      }
      pos += 1
      var idx = 0
      new Iterator[DecodedFrame] {
        def hasNext: Boolean = pos < payload.length
        def next(): DecodedFrame = {
          val nl = payload.indexOf('\n'.toByte, pos)
          require(nl >= pos + 5 && new String(payload, pos, 5,
            java.nio.charset.StandardCharsets.US_ASCII) == "FRAME",
            s"doc $docId: frame $idx: missing FRAME marker")
          val dataStart = nl + 1
          require(dataStart + frameBytes <= payload.length,
            s"doc $docId: frame $idx truncated")
          val base = dataStart
          val hash = aHash60((x, y) => payload(base + y * w + x) & 0xff, w, h)
          pos = dataStart + frameBytes
          val f = DecodedFrame(docId, idx, w, h, hash)
          idx += 1
          f
        }
      }
    }
  }

  /** A REAL video codec for MJPEG (motion-JPEG: back-to-back baseline
    * JPEGs, the format webcams/AVIs without inter-frame compression
    * carry): scans the byte stream for JPEG SOI markers (FFD8 FF),
    * decodes each frame with `javax.imageio`, hashes the BT.601 luma via
    * [[aHash60]]. Pure JVM — no native decoder.
    */
  object MjpegCodec extends VideoCodec {
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)

    /** End offset (exclusive) of the JPEG frame whose SOI sits at
      * `start`: walks the marker-segment structure — APPn/DQT/DHT/…
      * payloads are skipped by their 2-byte big-endian lengths, and
      * entropy-coded scan data is scanned byte-wise past stuffed FF00
      * and RST markers — to the frame's own EOI. A naive FFD8FF scan
      * would split a frame at an embedded thumbnail JPEG inside an APPn
      * (EXIF) segment; the segment walk never looks inside a segment
      * payload, so embedded JPEGs can't produce phantom frames.
      */
    private[operators] def frameEnd(b: Array[Byte], start: Int,
        docId: Long, idx: Int): Int = {
      var p = start + 2 // past SOI
      var inScan = false
      while (p + 1 < b.length) {
        if (inScan) {
          if (b(p) != 0xff.toByte) p += 1
          else {
            val m = b(p + 1) & 0xff
            if (m == 0xd9) return p + 2 // EOI
            else if (m == 0xff) p += 1 // fill byte, the next FF may lead a marker
            else if (m == 0x00 || (m >= 0xd0 && m <= 0xd7)) p += 2
            else inScan = false // a real marker: resume segment walking at p
          }
        } else {
          require(b(p) == 0xff.toByte,
            s"doc $docId: frame $idx: lost JPEG marker sync at byte $p")
          val m = b(p + 1) & 0xff
          if (m == 0xd9) return p + 2 // EOI
          else if (m == 0xff) p += 1 // fill byte
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2
          else {
            require(p + 3 < b.length, s"doc $docId: frame $idx truncated")
            val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
            require(len >= 2, s"doc $docId: frame $idx: bad segment length")
            if (m == 0xda) inScan = true // SOS: entropy data follows its header
            p += 2 + len
          }
        }
      }
      b.length // truncated tail: the last frame ends at the payload end
    }

    def decodeFrames(docId: Long, payload: Array[Byte]): Iterator[DecodedFrame] = {
      def soiAt(i: Int): Boolean = i + 2 < payload.length &&
        payload(i) == 0xff.toByte && payload(i + 1) == 0xd8.toByte &&
        payload(i + 2) == 0xff.toByte
      val first = (0 until math.max(payload.length - 2, 0)).find(soiAt)
      require(first.isDefined, s"doc $docId: no JPEG SOI marker found")
      var pos = first.get
      var idx = 0
      new Iterator[DecodedFrame] {
        def hasNext: Boolean = pos >= 0
        def next(): DecodedFrame = {
          val start = pos
          val end = frameEnd(payload, start, docId, idx)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload, start, end - start))
          require(img != null, s"doc $docId: frame $idx not decodable")
          val (w, h) = (img.getWidth, img.getHeight)
          val hash = aHash60((x, y) => {
            val rgb = img.getRGB(x, y)
            (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
          }, w, h)
          val f = DecodedFrame(docId, idx, w, h, hash)
          // inter-frame padding (FF fill / zeros) is skipped by seeking
          // the next SOI from the walked end — never from inside a frame
          pos = (end until payload.length - 2).find(soiAt).getOrElse(-1)
          idx += 1
          f
        }
      }
    }
  }

  /** [[decodeBatched]] for video payloads: one output row per frame.
    * Defaults to the declared [[StubVideoCodec]]; pass [[Y4MCodec]] /
    * [[MjpegCodec]] for real decoding. Feed the result to [[scenesFrom]]
    * → [[keyframesFrom]].
    */
  def decodeVideoBatched(spark: SparkSession, media: Dataset[MediaBatch],
      codec: VideoCodec = StubVideoCodec): Dataset[DecodedFrame] = {
    import spark.implicits._
    media.mapPartitions { it =>
      codec.open()
      it.flatMap(m => codec.decodeFrames(m.doc_id, m.payload))
    }
  }
}
