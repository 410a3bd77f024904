package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.10 X4): media payloads as
  * opaque `BinaryType` columns with a typed metadata struct, plus the
  * decode / feature-extract / frame-sample operator shapes a training
  * pipeline runs over them.
  *
  * The actual codecs (image/audio/video decode) are NOT in this
  * container, so the decode kernels are deterministic STUBS — clearly
  * marked below — while everything Spark-side is real and tested: the
  * binary schema, metadata struct, partition-parallel batch processing
  * via mapPartitions, and the pure-Column fast paths.
  *
  * Scale: payload bytes stay columnar (parquet BinaryType) and are
  * column-pruned away unless an operator touches them; per-partition
  * batch processing (mapPartitions) amortizes any per-batch codec
  * setup exactly like an Arrow-batched UDF would.
  */
object Multimodal {

  /** Attach a fake media payload to each document: the UTF-8 bytes of
    * its text standing in for an image blob, with a typed metadata
    * struct (format/width/height) derived deterministically — the
    * schema shape real ingestion would produce. */
  def withMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("fake/raw").as("format"),
        (octet_length(encode(col("text"), "UTF-8")) % 640 + 1)
          .cast("int").as("width"),
        (octet_length(encode(col("text"), "UTF-8")) % 480 + 1)
          .cast("int").as("height")).as("meta"))

  /** q29 — pure-Column media metadata extraction: byte length and
    * content hash without decoding (the cheap scan-side pass; fully
    * Catalyst, binary column pruned for queries that skip it). */
  def mediaStats(documents: DataFrame): DataFrame =
    withMedia(documents)
      .select(
        col("doc_id"),
        octet_length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("content_hash"),
        col("meta.width").as("width"),
        col("meta.height").as("height"))
      .orderBy("doc_id")

  /** ===== STUB decode kernel =====
    * Stands in for an image decoder: deterministic pseudo-pixels from
    * the payload bytes. A real deployment swaps ONLY this function for
    * a codec call; the partition-batched plumbing around it stays. */
  private def stubDecode(payload: Array[Byte], w: Int, h: Int): Array[Float] = {
    val out = new Array[Float](8) // 8 fake channel statistics
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < 8) { out(j) /= math.max(payload.length / 8, 1); j += 1 }
    out
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Feature extraction over media payloads with per-partition batch
    * processing — the Scala analogue of an Arrow-batched decode UDF:
    * one `mapPartitions` pass, codec state initialized once per
    * partition, rows streamed through it. */
  def extractFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val media = withMedia(documents)
      .select("doc_id", "media", "meta.width", "meta.height")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.mapPartitions { rows =>
      // per-partition init happens HERE in a real codec (decoder handle)
      rows.map { r =>
        val feats = stubDecode(
          r.getAs[Array[Byte]]("media"), r.getAs[Int]("width"),
          r.getAs[Int]("height"))
        Row(r.getAs[Long]("doc_id"), feats.toSeq)
      }
    }(enc)
  }

  /** ===== STUB resize kernel =====
    * Stands in for an image resampler: keeps every `factor`-th payload
    * byte (deterministic decimation). Swap for a real scaler; the
    * partition-batched plumbing and metadata arithmetic stay. */
  private def stubResize(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", org.apache.spark.sql.types.BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Resize media payloads by an integer factor: per-partition batch
    * pass (decoder/scaler state initialized once per partition);
    * metadata dimensions scale with the payload. */
  def resize(documents: DataFrame, factor: Int = 2): DataFrame = {
    val media = withMedia(documents)
      .select("doc_id", "media", "meta.width", "meta.height")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(resizedSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val scaled = stubResize(r.getAs[Array[Byte]]("media"), factor)
        Row(r.getAs[Long]("doc_id"), scaled,
          math.max(r.getAs[Int]("width") / factor, 1),
          math.max(r.getAs[Int]("height") / factor, 1))
      }
    }(enc)
  }

  /** Perceptual-hash near-duplicate pairs over the DECODE path — the
    * image-dedup shape (aHash): each media payload decodes to channel
    * statistics ([[extractFeatures]]; a real deployment's 8×8 grayscale
    * averages), bit i of the hash is "statistic i above the mean", and
    * near-dups are found by hash-bucket probing: each doc indexes its
    * hash plus every single-bit flip, so an equi-join on the probe key
    * finds ALL pairs within Hamming distance ≤ 2 without comparing the
    * corpus pairwise; exact `bit_count` verification then applies
    * `maxHamming`. Candidate cost is collision-driven — the join never
    * sees non-colliding pairs, the property that keeps image dedup
    * linear at billions of images. */
  def perceptualNearDups(
      documents: DataFrame, maxHamming: Int = 1): DataFrame = {
    // single-bit probing finds every pair with Hamming ≤ 2 and NOTHING
    // beyond — refuse thresholds the index cannot honor (band the hash
    // like simhashNearDups if a looser radius is ever needed)
    require(maxHamming <= 2,
      s"maxHamming=$maxHamming exceeds the probe index's radius (2)")
    val nBits = 8 // = |stub channel statistics|; 64 for a real 8×8 aHash
    val feats = extractFeatures(documents)
    val mean = aggregate(col("features"), lit(0.0d),
      (acc, x) => acc + x.cast("double")) / nBits
    val bits = (0 until nBits).map(i =>
      when(element_at(col("features"), i + 1).cast("double") > col("m"),
        lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val hashed = feats.withColumn("m", mean)
      .select(col("doc_id"), bits.as("phash"))
    // probe keys: the hash itself + all single-bit flips ⇒ two docs
    // share a key iff their hashes differ in ≤ 2 of the flipped bits
    val probes = hashed.select(col("doc_id"), col("phash"),
      explode(array(
        col("phash") +: (0 until nBits).map(b =>
          col("phash").bitwiseXOR(lit(1L << b))): _*)).as("probe"))
    probes.as("a")
      .join(probes.as("b"),
        col("a.probe") === col("b.probe")
          && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_i", "doc_j")
  }

  /** Frame sampling: slice `k` fixed-width byte windows from the
    * payload (a video frame-sampler's access pattern) — pure Column
    * (`substring` on binary), no decode needed. */
  def frameSample(
      documents: DataFrame, k: Int = 4, frameBytes: Int = 16): DataFrame =
    withMedia(documents)
      .select(
        col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, ${k - 1}), " +
            s"i -> substring(media, i * $frameBytes + 1, $frameBytes))"))
          .as(Seq("frame_no", "frame")))
      .select(
        col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_hash"))
      .filter(col("frame_bytes") > 0)
      .orderBy("doc_id", "frame_no")
}
