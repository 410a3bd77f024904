package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("withMedia: binary payload + typed metadata struct") {
    val m = Multimodal.withMedia(tables.documents)
    val f = m.schema("media")
    assert(f.dataType == org.apache.spark.sql.types.BinaryType)
    val meta = m.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height"))
    val r = m.select("meta.width", "meta.height").head()
    assert(r.getInt(0) >= 1 && r.getInt(0) <= 640)
    assert(r.getInt(1) >= 1 && r.getInt(1) <= 480)
  }

  test("mediaStats: byte length equals text UTF-8 length") {
    val joined = Multimodal.mediaStats(tables.documents)
      .join(tables.documents, "doc_id")
      .filter(col("n_bytes") =!= length(col("text")).cast("long"))
    assert(joined.count() == 0) // ASCII text: bytes == chars
  }

  test("extractFeatures: 8 finite channel stats per doc, distributed") {
    val f = Multimodal.extractFeatures(tables.documents)
    assert(f.count() == tables.documents.count())
    val bad = f.filter(size(col("features")) =!= 8
      || exists(col("features"), x => x.isNaN || x < 0)).count()
    assert(bad == 0)
    // deterministic stub: rerun equals
    val again = Multimodal.extractFeatures(tables.documents)
    assert(f.exceptAll(again).count() == 0)
  }

  test("resize: payload decimated by factor, metadata scaled") {
    val r = Multimodal.resize(tables.documents, 4)
      .join(Multimodal.withMedia(tables.documents)
        .select(col("doc_id"), octet_length(col("media")).as("orig")),
        "doc_id")
    val bad = r.filter(
      octet_length(col("media")) =!= ceil(col("orig") / 4).cast("int")
        || col("width") < 1 || col("height") < 1).count()
    assert(bad == 0)
    assert(r.count() == tables.documents.count())
  }

  test("frameSample: k frames of frameBytes, partial tail kept") {
    val fs = Multimodal.frameSample(tables.documents, 4, 16)
    assert(fs.filter(col("frame_bytes") > 16).count() == 0)
    // every doc with >= 64 bytes yields all 4 full frames
    val longDocs = tables.documents.filter(length(col("text")) >= 64)
    val full = fs.filter(col("frame_bytes") === 16)
      .groupBy("doc_id").count().filter(col("count") === 4)
    assert(full.count() == longDocs.count())
  }

  /** A w×h PNG whose 2-row × 4-column grid cells are constant gray
    * levels `levels(0..7)` (row-major). */
  private def gridPng(w: Int, h: Int, levels: Seq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = levels(math.min(y * 2 / h, 1) * 4 + math.min(x * 4 / w, 3))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("ImageIO kernel: PNG decodes to hand-computed grid luminances") {
    import spark.implicits._
    val levels = Seq(0, 30, 60, 90, 120, 150, 180, 210)
    // cell-aligned 8×4 (each cell constant) and a non-aligned 10×6
    // (cells averaged over uneven pixel counts — still constant here)
    val media = Seq(
      (1L, gridPng(8, 4, levels)),
      (2L, gridPng(10, 6, levels))).toDF("doc_id", "media")
    val feats = Multimodal.extractFeaturesFromMedia(media)
      .collect().map(r =>
        r.getLong(0) -> r.getSeq[Float](1)).toMap
    val expected = levels.map(_ / 255.0f)
    for (id <- Seq(1L, 2L); i <- 0 until 8)
      assert(math.abs(feats(id)(i) - expected(i)) < 1e-6,
        s"doc $id cell $i: got ${feats(id)(i)}, want ${expected(i)}")
  }

  test("null and corrupt payloads never kill the batch") {
    import spark.implicits._
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4,
      5, 6, 7, 8) // PNG magic, undecodable body
    val media = Seq(
      (1L, null.asInstanceOf[Array[Byte]]),
      (2L, corrupt),
      (3L, gridPng(8, 4, Seq.fill(8)(64)))).toDF("doc_id", "media")
    val feats = Multimodal.extractFeaturesFromMedia(media)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.size == 3)
    assert(feats(1L).forall(_ == 0.0f), "null payload -> zero stats")
    assert(feats(2L).forall(v => !v.isNaN), "corrupt -> raw fallback")
    val rs = Multimodal.resizeMedia(
      Seq((1L, null.asInstanceOf[Array[Byte]], 8, 4),
        (2L, corrupt, 8, 4)).toDF("doc_id", "media", "width", "height"),
      2).collect()
    assert(rs.length == 2) // no task death
  }

  test("ImageIO resize halves real dimensions; output is decodable PNG") {
    import spark.implicits._
    val media = Seq((1L, gridPng(8, 4, Seq.fill(8)(128)), 8, 4))
      .toDF("doc_id", "media", "width", "height")
    val out = Multimodal.resizeMedia(media, 2).collect().head
    assert(out.getInt(2) == 4 && out.getInt(3) == 2)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]]("media")))
    assert(img != null && img.getWidth == 4 && img.getHeight == 2)
    // uniform gray input stays uniform gray after scaling
    val rgb = img.getRGB(1, 1)
    assert(((rgb >> 16) & 0xff) == 128 && (rgb & 0xff) == 128)
  }

  test("perceptualNearDups: identical payloads pair at hamming 0, " +
    "probe join misses nothing within the bound") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (3L, "completely different text with other statistics entirely"),
      (4L, "zzz")).toDF("doc_id", "text")
    val pairs = graft.operators.Multimodal.perceptualNearDups(docs, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (i, j, h) => i == 1L && j == 2L && h == 0 })
    // the probe index covers radius 2 and refuses beyond it
    val r2 = graft.operators.Multimodal.perceptualNearDups(docs, 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(r2.contains((1L, 2L)))
    intercept[IllegalArgumentException] {
      graft.operators.Multimodal.perceptualNearDups(docs, 3)
    }
  }

  test("mediaSniff: the sniff reads payload BYTES, not the planting " +
    "key — contradicting content wins") {
    import spark.implicits._
    // doc 3 (%5=3 -> headerless) carries text whose UTF-8 bytes ARE a
    // RIFF/WAVE header: content must sniff audio/wav anyway
    val docs = Seq(
      (3L, "RIFF0000WAVE pretend audio"),
      (8L, "plain prose with no signature")).toDF("doc_id", "text")
    val got = graft.operators.Multimodal.mediaSniff(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(3L) == "audio/wav")
    assert(got(8L) == "application/octet-stream")
  }

  test("mediaSniff: fixture-wide planted signatures sniff to their " +
    "class, match_flag is the declared==sniffed equality") {
    val fx = graft.operators.Multimodal.mediaSniff(tables.documents)
      .collect()
    assert(fx.length == tables.documents.count())
    val types = Seq("image/png", "image/jpeg", "audio/wav",
      "application/octet-stream")
    val hdrLen = Seq(8L, 4L, 12L, 0L, 0L)
    fx.foreach { r =>
      val id = r.getLong(0)
      val sniffWant = if (id % 5 <= 2) types((id % 5).toInt) else types(3)
      val declWant = types((id % 4).toInt)
      assert(r.getString(3) == sniffWant, s"doc $id sniffed")
      assert(r.getString(2) == declWant, s"doc $id declared")
      assert(r.getLong(4) == (if (sniffWant == declWant) 1L else 0L))
      assert(r.getLong(1) > hdrLen((id % 5).toInt))
    }
    // both flag classes populated (the coprime-moduli guarantee)
    assert(fx.exists(_.getLong(4) == 1L) && fx.exists(_.getLong(4) == 0L))
  }
}
