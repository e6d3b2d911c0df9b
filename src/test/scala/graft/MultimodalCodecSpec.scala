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

  test("stub and real codec share the seam: same schema, different truth") {
    val media = Seq(Multimodal.MediaBatch(7L, png(100, 40))).toDS()
    val stub = Multimodal.decodeBatched(spark, media).collect().head
    val real = Multimodal.decodeBatched(spark, media, Multimodal.ImageIoCodec).collect().head
    assert(stub.byte_len == real.byte_len) // both see the true payload
    assert(real.width == 100 && real.height == 40)
    assert(stub.productArity == real.productArity) // one DecodedMedia schema
  }
}
