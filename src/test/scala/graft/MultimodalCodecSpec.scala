package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The real-codec path through the decodeBatched seam: javax.imageio PNG
  * decoding must recover the true pixel dimensions, and the downstream
  * resize / tiling plumbing must operate on them unchanged. The oracle
  * queries keep the deterministic stub codec — these specs prove the
  * seam takes a real codec without touching that contract.
  */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff) // deterministic pixels
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private val sizes = Seq(1L -> (320, 200), 2L -> (64, 64), 3L -> (517, 93))

  test("ImageIoCodec decodes generated PNGs to their true dimensions") {
    val media = sizes.map { case (id, (w, h)) => Multimodal.MediaBatch(id, png(w, h)) }
      .toDS().repartition(3)
    val got = Multimodal.decodeBatched(spark, media, Multimodal.ImageIoCodec)
      .collect().map(d => d.doc_id -> ((d.width, d.height, d.n_frames))).toMap
    sizes.foreach { case (id, (w, h)) =>
      assert(got(id) == ((w, h, 1)), s"doc $id decoded to ${got(id)}, want ($w,$h,1)")
    }
    // byte_len is the real payload size, not a hash artifact
    assert(Multimodal.decodeBatched(spark, media, Multimodal.ImageIoCodec)
      .collect().forall(d => d.byte_len > 0))
  }

  test("resize and tiling run unchanged on real-codec metadata") {
    val media = sizes.map { case (id, (w, h)) => Multimodal.MediaBatch(id, png(w, h)) }.toDS()
    val meta = Multimodal.decodeBatched(spark, media, Multimodal.ImageIoCodec)
      .toDF()
      .withColumn("content_hash", md5(col("doc_id").cast("string")))
    val resized = Multimodal.resize(meta, 128, 128)
      .select("doc_id", "out_w", "out_h").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(resized(2L) == ((64, 64))) // already inside the box: untouched
    assert(resized(1L) == ((128, 80))) // 320x200 * 0.4
    // 517x93: scale = 128/517; floor(93 * 128/517) = 23
    assert(resized(3L) == ((128, 23)))

    val tiles = Multimodal.tilesFrom(
      meta.select(col("doc_id"), col("content_hash"), col("width"), col("height")), 64)
    val perDoc = tiles.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(perDoc(1L) == 5 * 4) // ceil(320/64) x ceil(200/64)
    assert(perDoc(2L) == 1)
    assert(perDoc(3L) == 9 * 2) // ceil(517/64) x ceil(93/64)
    // edge tiles clip to the true image bounds
    val edge = tiles.filter(col("doc_id") === 3L && col("tile_x") === 8 && col("tile_y") === 1)
      .select("x1", "y1").as[(Int, Int)].head()
    assert(edge == ((517, 93)))
  }

  private def wav(rate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * channels * 2)
    for (i <- pcm.indices) pcm(i) = ((i * 7 + 13) & 0xff).toByte // deterministic samples
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("WavCodec decodes generated WAVs to their true rate/frames/duration") {
    val clips = Seq(
      (1L, 16000, 1, 24000),  // 1.5 s mono → duration ceils to 2
      (2L, 44100, 2, 44100),  // exactly 1 s stereo
      (3L, 22050, 1, 22051))  // 1 s + 1 frame → ceils to 2
    val media = clips.map { case (id, r, c, n) => Multimodal.MediaBatch(id, wav(r, c, n)) }
      .toDS().repartition(3)
    val got = Multimodal.decodeAudioBatched(spark, media, Multimodal.WavCodec)
      .collect().map(d => d.doc_id -> d).toMap
    clips.foreach { case (id, r, c, n) =>
      val d = got(id)
      assert(d.sample_rate == r && d.n_channels == c && d.n_samples == n.toLong,
        s"doc $id decoded to $d")
      assert(d.duration_s == math.ceil(n.toDouble / r).toInt)
      assert(d.byte_len > n) // container bytes, not a hash artifact
    }
  }

  test("audio chunking runs unchanged on real-codec metadata") {
    val media = Seq(Multimodal.MediaBatch(9L, wav(16000, 1, 24000))).toDS()
    val meta = Multimodal.decodeAudioBatched(spark, media, Multimodal.WavCodec)
      .toDF()
      .withColumn("content_hash", md5(col("doc_id").cast("string")))
    val chunks = Multimodal.chunksFrom(meta, 1)
      .orderBy(col("chunk_start_s"))
      .select("chunk_start_s", "chunk_end_s").as[(Int, Int)].collect()
    // 1.5 s clip, 1 s chunks: [0,1) and the clipped tail [1,2)
    assert(chunks.toSeq == Seq((0, 1), (1, 2)))
  }

  test("stub and real audio codec share the seam: same schema, different truth") {
    val payload = "hello audio".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val stub = Multimodal.decodeAudioBatched(spark,
      Seq(Multimodal.MediaBatch(5L, payload)).toDS()).collect().head
    // the stub replays the audioChunks oracle derivation exactly
    val h = graft.functions.Hashing.h60jvm("hello audio")
    val wantRate = (h % 3).toInt match { case 0 => 16000; case 1 => 22050; case _ => 44100 }
    assert(stub.sample_rate == wantRate)
    assert(stub.duration_s == (1 + (h / 8) % 120).toInt)
    assert(stub.n_samples == stub.sample_rate.toLong * stub.duration_s)
    val real = Multimodal.decodeAudioBatched(spark,
      Seq(Multimodal.MediaBatch(5L, wav(16000, 1, 16000))).toDS(),
      Multimodal.WavCodec).collect().head
    assert(stub.productArity == real.productArity) // one DecodedAudio schema
  }

  test("stub and real codec share the seam: same schema, different truth") {
    val media = Seq(Multimodal.MediaBatch(7L, png(100, 40))).toDS()
    val stub = Multimodal.decodeBatched(spark, media).collect().head
    val real = Multimodal.decodeBatched(spark, media, Multimodal.ImageIoCodec).collect().head
    assert(stub.byte_len == real.byte_len) // both see the true payload
    assert(real.width == 100 && real.height == 40)
    assert(stub.productArity == real.productArity) // one DecodedMedia schema
  }

  /** A tiny YUV4MPEG2 clip: `shots` runs of constant-luma frames (each
    * shot a distinct gray level), C420, 16×16. A cut between shots flips
    * ~half the aHash bits; frames within a shot hash identically.
    */
  private def y4m(w: Int, h: Int, shots: Seq[(Int, Int)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val chroma = new Array[Byte](2 * ((w + 1) / 2) * ((h + 1) / 2))
    java.util.Arrays.fill(chroma, 128.toByte)
    shots.foreach { case (lumaLevel, nFrames) =>
      (0 until nFrames).foreach { _ =>
        out.write("FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val luma = new Array[Byte](w * h)
        // gradient offset by the shot's base level: distinct shots get
        // distinct bit patterns, constant-within-shot
        for (i <- luma.indices)
          luma(i) = (((i % w) * 256 / w + lumaLevel) % 256).toByte
        out.write(luma)
        out.write(chroma)
      }
    }
    out.toByteArray
  }

  test("Y4MCodec decodes a real clip end-to-end: frames -> scenes -> keyframes") {
    // 3 shots of 3/4/2 frames at well-separated luma offsets
    val clip = y4m(16, 16, Seq((0, 3), (128, 4), (64, 2)))
    val media = Seq(Multimodal.MediaBatch(1L, clip)).toDS()
    val frames = Multimodal.decodeVideoBatched(spark, media, Multimodal.Y4MCodec)
    val fr = frames.collect().sortBy(_.frame_idx)
    assert(fr.length == 9, s"decoded ${fr.length} frames, want 9")
    assert(fr.forall(f => f.width == 16 && f.height == 16))
    // within-shot frames hash identically; shots differ
    assert(fr(0).frame_hash == fr(2).frame_hash)
    assert(fr(3).frame_hash == fr(6).frame_hash)
    assert(fr(0).frame_hash != fr(3).frame_hash)
    val scenes = Multimodal.scenesFrom(frames.toDF(), maxHamming = 10)
    val kf = Multimodal.keyframesFrom(scenes)
      .orderBy(col("scene_id"))
      .select("scene_id", "keyframe_idx", "scene_len").as[(Long, Int, Long)]
      .collect().toSeq
    assert(kf == Seq((1L, 0, 3L), (2L, 3, 4L), (3L, 7, 2L)),
      s"scene cut wrong: $kf")
  }

  /** A tiny MJPEG clip: back-to-back JPEG frames, each a constant-plus-
    * gradient image per shot (JPEG is lossy, so shots are separated by
    * large luma offsets the hash is robust to).
    */
  private def mjpeg(w: Int, h: Int, shots: Seq[(Int, Int)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    shots.foreach { case (base, nFrames) =>
      (0 until nFrames).foreach { _ =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        for (x <- 0 until w; y <- 0 until h) {
          val l = ((x * 256 / w) + base) % 256
          img.setRGB(x, y, (l << 16) | (l << 8) | l)
        }
        javax.imageio.ImageIO.write(img, "jpg", out)
      }
    }
    out.toByteArray
  }

  test("MjpegCodec decodes a real clip end-to-end: frames -> scenes -> keyframes") {
    val clip = mjpeg(32, 32, Seq((0, 2), (128, 3)))
    val media = Seq(Multimodal.MediaBatch(2L, clip)).toDS()
    val frames = Multimodal.decodeVideoBatched(spark, media, Multimodal.MjpegCodec)
    val fr = frames.collect().sortBy(_.frame_idx)
    assert(fr.length == 5, s"decoded ${fr.length} frames, want 5")
    assert(fr.forall(f => f.width == 32 && f.height == 32))
    val kf = Multimodal.keyframesFrom(
      Multimodal.scenesFrom(frames.toDF(), maxHamming = 10))
      .orderBy(col("scene_id"))
      .select("scene_id", "keyframe_idx", "scene_len").as[(Long, Int, Long)]
      .collect().toSeq
    assert(kf == Seq((1L, 0, 2L), (2L, 2, 3L)), s"scene cut wrong: $kf")
  }

  test("MjpegCodec: an embedded EXIF-style thumbnail JPEG is NOT a phantom frame") {
    val clip = mjpeg(32, 32, Seq((0, 2), (128, 1)))
    // splice a complete thumbnail JPEG into an APP1 segment right after
    // the FIRST frame's SOI — a raw FFD8FF scan would split here
    val thumb = mjpeg(8, 8, Seq((64, 1)))
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte,
      (((thumb.length + 2) >> 8) & 0xff).toByte, ((thumb.length + 2) & 0xff).toByte) ++ thumb
    val withThumb = clip.take(2) ++ app1 ++ clip.drop(2)
    val media = Seq(Multimodal.MediaBatch(7L, withThumb)).toDS()
    val fr = Multimodal.decodeVideoBatched(spark, media, Multimodal.MjpegCodec)
      .collect().sortBy(_.frame_idx)
    assert(fr.length == 3, s"decoded ${fr.length} frames, want 3 (thumbnail split a frame)")
    assert(fr.forall(f => f.width == 32 && f.height == 32),
      "a phantom 8x8 thumbnail frame leaked into the stream")
  }

  test("Y4MCodec rejects high-bit-depth and extra-plane chroma taggings loudly") {
    for (bad <- Seq("C420p10", "C422p12", "C444alpha")) {
      val payload = (s"YUV4MPEG2 W16 H16 F25:1 Ip A1:1 $bad\nFRAME\n" + "x" * 4096)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val e = intercept[Exception] {
        Multimodal.Y4MCodec.decodeFrames(1L, payload).toList
      }
      assert(e.getMessage.contains("unsupported chroma"),
        s"$bad must hit the loud unsupported-chroma error, got: ${e.getMessage}")
    }
  }

  test("stub video codec replays the sceneDetect oracle derivation exactly") {
    val docs = Seq((1L, "video payload one"), (2L, "another clip")).toDF("doc_id", "text")
    val viaStubCodec = Multimodal.scenesFrom(
      Multimodal.decodeVideoBatched(spark,
        docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[Multimodal.MediaBatch]).toDF())
      .orderBy("doc_id", "frame_idx")
      .select("doc_id", "frame_idx", "scene_id").as[(Long, Int, Long)].collect().toSeq
    val viaQuery = Multimodal.sceneDetect(docs)
      .orderBy("doc_id", "frame_idx")
      .select("doc_id", "frame_idx", "scene_id").as[(Long, Int, Long)].collect().toSeq
    assert(viaStubCodec == viaQuery,
      "stub video codec diverged from the declared frameSample stream")
  }
}
