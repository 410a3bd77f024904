package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent incremental ANN index — the fifth ledger. The q166
  * composed path ([[graft.operators.Similarity.ivfSq8TopK]]) rebuilds
  * IVF centroids and SQ8 codes on every call; at production cadence a
  * crawl increment would re-pay the full index build while every other
  * derived state here (keys, signatures, sketches, moments) already
  * has a ledger. This one persists the q166 layout:
  *
  *  - `centroids/v_<N>/` — the IVF coarse quantizer: `nlist` rows of
  *    (cell, cv, c2), kilobytes, written by [[init]] and [[refresh]]
  *    only;
  *  - `codes/part_<N>/`  — append-only per-vector state: (vec_id,
  *    cell, qc, d2) with qc the SQ8 int8 codes stored as
  *    `array<tinyint>` (~d bytes per vector + 12 — the FAISS
  *    IVF+SQ8 budget; the float corpus is ~4d);
  *  - `manifests/v_*` + `CURRENT` — the [[DedupLedger]] manifest
  *    format and tmp+rename commit discipline verbatim (data first,
  *    manifest rename last; orphans from crashes are ignored and
  *    reclaimed by the idempotent replay). Extra marker lines carry
  *    the centroid version in force (`cv=N`) and the init-time
  *    distortion baseline (`dist=x`).
  *
  * Contracts:
  *  - [[absorb]] assigns + codes ONLY the batch's new vectors against
  *    the COMMITTED centroids — the corpus embeddings are never
  *    rescanned (IndexLedgerSpec asserts it from `inputFiles`), and
  *    because assignment and coding are per-vector functions of
  *    (vector, committed centroids), any increment composition commits
  *    the same state: two absorbs == one absorb of the union, so
  *    [[topK]] shortlists are identical at any oversample.
  *  - [[topK]] serves from committed state only: broadcast the
  *    kilobyte centroid frame, probe `nprobe` cells, score int8 codes
  *    (`vec_dot` over exact-integer doubles — the q162 discipline),
  *    take the k·oversample shortlist then the final k. The corpus is
  *    not touched; scores are quantized cosines (exact rescore
  *    remains a caller-side join of the k·oversample shortlist
  *    against the float vectors, as in q166 stage 2).
  *  - [[refresh]] re-fits the coarse quantizer FROM COMMITTED CODES
  *    (unit-decoded directions — SQ8 preserves direction to ~1/127)
  *    when [[driftRatio]] says the centroids no longer fit the data;
  *    still no corpus rescan. Reassigns all vectors, writes one
  *    compacted part + new centroids, commits one version.
  *  - [[absorbSink]] gives streaming parity with the [[DedupLedger
  *    .absorbSink]] exactly-once batchId discipline; [[codes]]/
  *    [[centroids]] take an as-of version for time travel; [[compact]]
  *    folds parts; [[vacuum]] (ledger-wide, see Vacuum) reclaims
  *    superseded state beyond a version horizon.
  *
  * 100 TB posture: per-increment work is O(|batch| · nlist) assign +
  * O(|batch| · d) code — a narrow map over the batch with a kilobyte
  * broadcast; queries touch `nprobe/nlist` of the code rows via the
  * cell equi-join; nothing driver-side exceeds the `nlist`-row
  * centroid collect. */
object IndexLedger {

  import graft.operators.Similarity.{asDouble, sq8Codes}
  import graft.functions.VectorFunctions.vec_dot

  private def centroidsDir(statePath: String, version: Long) =
    f"$statePath/centroids/v_$version%08d"
  private def codesDir(statePath: String, part: String) =
    s"$statePath/codes/$part"

  private final case class IxManifest(
      version: Long, codeParts: Seq[String], centroidVersion: Long,
      baseDistortion: Double, lastBatchId: Option[Long])

  private def parse(m: DedupLedger.Manifest): IxManifest = {
    val parts = m.keyParts.filter(_.startsWith("part_"))
    val cv = m.keyParts.find(_.startsWith("cv="))
      .map(_.stripPrefix("cv=").toLong)
      .getOrElse(throw new IllegalStateException(
        "index manifest missing centroid pointer"))
    val dist = m.keyParts.find(_.startsWith("dist="))
      .map(_.stripPrefix("dist=").toDouble).getOrElse(0.0)
    IxManifest(m.version, parts, cv, dist, m.lastBatchId)
  }

  private def manifestOf(ix: IxManifest): DedupLedger.Manifest =
    DedupLedger.Manifest(ix.version,
      ix.codeParts ++ Seq(s"cv=${ix.centroidVersion}",
        s"dist=${ix.baseDistortion}"),
      ix.lastBatchId)

  private def readIx(statePath: String): IxManifest =
    parse(DedupLedger.readManifest(statePath).getOrElse(
      throw new IllegalStateException(
        s"no index ledger at $statePath — call init first")))

  /** Committed centroid frame (cell, cv, c2) — CURRENT or as-of. */
  def centroids(
      spark: SparkSession, statePath: String,
      asOfVersion: Long = -1L): DataFrame = {
    val ix =
      if (asOfVersion < 0) readIx(statePath)
      else parse(DedupLedger.readManifestAt(statePath, asOfVersion))
    spark.read.parquet(centroidsDir(statePath, ix.centroidVersion))
  }

  /** Committed per-vector state (vec_id, cell, qc, d2) — CURRENT or
    * as-of. qc reads back as array<tinyint>; [[topK]] casts for the
    * exact-integer double dot. */
  def codes(
      spark: SparkSession, statePath: String,
      asOfVersion: Long = -1L): DataFrame = {
    val ix =
      if (asOfVersion < 0) readIx(statePath)
      else parse(DedupLedger.readManifestAt(statePath, asOfVersion))
    spark.read.parquet(
      ix.codeParts.map(codesDir(statePath, _)): _*)
  }

  /** (id, v) → (id, cell): nearest committed centroid by Euclidean
    * argmin — rank by (c2 − 2·v·c), the ||v||²-free form, tie-broken
    * by cell id so assignment is deterministic. One narrow map with a
    * kilobyte broadcast; no shuffle beyond the window's id hash. */
  private def assign(vs: DataFrame, cent: DataFrame): DataFrame = {
    val scored = vs.crossJoin(broadcast(cent))
      .withColumn("__ad", col("c2") - lit(2.0) * vec_dot(col("__v"), col("cv")))
    val w = Window.partitionBy("__aid").orderBy(col("__ad"), col("cell"))
    scored.withColumn("__ar", row_number().over(w))
      .filter(col("__ar") === 1)
      .drop("__ad", "__ar", "c2")
  }

  /** Mean angular distortion 1 − cos(v, centroid(v)) of an assigned
    * frame — the drift statistic. */
  private def distortionOf(assigned: DataFrame): Double =
    assigned
      .select((lit(1.0) - vec_dot(col("__v"), col("cv")) /
        (sqrt(vec_dot(col("__v"), col("__v"))) *
          sqrt(vec_dot(col("cv"), col("cv"))))).as("__e"))
      .agg(avg("__e")).head().getDouble(0)

  /** Normalize an embeddings frame to (__aid, __v) with zero vectors
    * dropped (unquantizable, as in q166). */
  private def prep(batch: DataFrame): DataFrame =
    batch.select(col("vec_id").as("__aid"),
        asDouble(col("embedding")).as("__v"))
      .withColumn("__qc", sq8Codes(col("__v")).cast("array<double>"))
      .withColumn("__d2", vec_dot(col("__qc"), col("__qc")))
      .filter(col("__d2") > 0.0)

  private def writeCodes(
      spark: SparkSession, statePath: String, part: String,
      assigned: DataFrame): Unit =
    assigned.select(col("__aid").as("vec_id"), col("cell"),
        col("__qc").cast("array<tinyint>").as("qc"), col("__d2").as("d2"))
      .write.mode("overwrite").parquet(codesDir(statePath, part))

  /** Build the index from the seed corpus — the ONE full embedding
    * scan this state requires (KMeans is seeded, so the build is
    * deterministic). Refuses to overwrite existing state. */
  def init(
      spark: SparkSession, statePath: String, embeddings: DataFrame,
      nlist: Int = 16): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(DedupLedger.readManifest(statePath).isEmpty,
      s"index ledger already initialized at $statePath")
    val vecs = prep(embeddings)
      .withColumn("features", array_to_vector(col("__v")))
      .cache()
    val model = new KMeans().setK(nlist).setSeed(42L)
      .setFeaturesCol("features").setPredictionCol("__cell").fit(vecs)
    val cent = centroidFrame(spark,
      model.clusterCenters.map(_.toArray))
    cent.write.mode("overwrite").parquet(centroidsDir(statePath, 1L))
    val persistedCent = spark.read.parquet(centroidsDir(statePath, 1L))
    // assignment goes through the SAME persisted-centroid expression
    // path absorb uses — model.transform could tie-break differently,
    // and init==absorb assignment parity is the composition contract
    // assign() keeps the matched cv column, so the float-vector
    // distortion baseline (same statistic driftRatio later computes
    // on batches) falls out of the assigned frame directly
    val assigned = assign(vecs.drop("features"), persistedCent)
      .persist()
    writeCodes(spark, statePath, DedupLedger.partName(1L), assigned)
    val base = distortionOf(assigned)
    assigned.unpersist()
    vecs.unpersist()
    DedupLedger.writeManifest(statePath, manifestOf(IxManifest(
      1L, Seq(DedupLedger.partName(1L)), 1L, base, None)))
  }

  private def centroidFrame(
      spark: SparkSession, centers: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cv")
      .withColumn("c2", vec_dot(col("cv"), col("cv")))
  }

  /** Derived-but-uncommitted increment state. */
  private final case class Pending(assigned: DataFrame, ix: IxManifest)

  private def deriveBatch(
      spark: SparkSession, statePath: String,
      batch: DataFrame): Pending = {
    val ix = readIx(statePath)
    val cent = spark.read.parquet(
      centroidsDir(statePath, ix.centroidVersion))
    val known = codes(spark, statePath).select(col("vec_id").as("__aid"))
    val fresh = prep(batch).join(known, Seq("__aid"), "left_anti")
    Pending(assign(fresh, cent).persist(), ix)
  }

  private def commitState(
      spark: SparkSession, statePath: String, p: Pending,
      batchId: Option[Long]): Unit = {
    val next = p.ix.version + 1
    writeCodes(spark, statePath, DedupLedger.partName(next), p.assigned)
    DedupLedger.writeManifest(statePath, manifestOf(p.ix.copy(
      version = next,
      codeParts = p.ix.codeParts :+ DedupLedger.partName(next),
      lastBatchId = batchId)))
  }

  /** Index an increment: assign + SQ8-code the batch's NEW vectors
    * against committed centroids, append one code part, advance one
    * version. Returns the newly indexed (vec_id, cell). The corpus is
    * never rescanned; a vec_id already committed is skipped (replay/
    * overlap safety). */
  def absorb(
      spark: SparkSession, statePath: String,
      batch: DataFrame): DataFrame = {
    val p = deriveBatch(spark, statePath, batch)
    commitState(spark, statePath, p, batchId = None)
    val out = p.assigned.select(col("__aid").as("vec_id"), col("cell"))
      .orderBy("vec_id")
    p.assigned.unpersist()
    out
  }

  /** Streaming ingest with the [[DedupLedger.absorbSink]] exactly-once
    * discipline: per-batch output dir first (deterministic overwrite),
    * batchId-marked manifest commit last, replay of a committed batch
    * is a no-op, checkpoint/state drift fails loudly. */
  def absorbSink(
      spark: SparkSession, statePath: String,
      outDir: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val ix = readIx(statePath)
      ix.lastBatchId.foreach { last =>
        require(batchId == last || batchId == last + 1,
          s"stream/ledger mismatch at $statePath: ledger committed " +
            s"micro-batch $last but foreachBatch delivered $batchId")
      }
      if (!ix.lastBatchId.contains(batchId)) {
        val p = deriveBatch(spark, statePath, batch)
        p.assigned.select(col("__aid").as("vec_id"), col("cell"))
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        commitState(spark, statePath, p, Some(batchId))
        p.assigned.unpersist()
        ()
      }
    }

  /** The k·oversample stage-1 shortlist per query, from committed
    * state only: probe the `nprobe` best cells by centroid dot (the
    * q166 probe rule), score int8 codes. Columns (qid, cid, approx,
    * ar). */
  def shortlist(
      spark: SparkSession, statePath: String, queries: DataFrame,
      k: Int = 5, nprobe: Int = 4, oversample: Int = 4,
      excludeSelf: Boolean = false,
      asOfVersion: Long = -1L): DataFrame = {
    val cent = centroids(spark, statePath, asOfVersion)
    val cs = codes(spark, statePath, asOfVersion)
    val q = queries.select(col("vec_id").as("qid"),
        asDouble(col("embedding")).as("qv"))
      .withColumn("qqc", sq8Codes(col("qv")).cast("array<double>"))
      .withColumn("qd2", vec_dot(col("qqc"), col("qqc")))
      .filter(col("qd2") > 0.0)
    val qCells = q.crossJoin(broadcast(cent))
      .withColumn("__sim", vec_dot(col("qv"), col("cv")))
      .withColumn("__pr", row_number().over(
        Window.partitionBy("qid").orderBy(col("__sim").desc, col("cell"))))
      .filter(col("__pr") <= nprobe)
      .select("qid", "qqc", "qd2", "cell")
    val self = if (excludeSelf) col("vec_id") =!= col("qid") else lit(true)
    val cand = cs.join(broadcast(qCells), Seq("cell"))
      .filter(self)
      .select(col("qid"), col("vec_id").as("cid"),
        (vec_dot(col("qqc"), col("qc").cast("array<double>")) /
          (sqrt(col("qd2")) * sqrt(col("d2")))).as("approx"))
      .distinct() // a (qid,cid) pair reachable via two probed cells
    cand.withColumn("ar", row_number().over(
        Window.partitionBy("qid").orderBy(col("approx").desc, col("cid"))))
      .filter(col("ar") <= k.toLong * oversample)
  }

  /** Final quantized-cosine top-k per query (qid, cid, cos_q, rk) —
    * the serving read. Exact rescore, when wanted, is the caller's
    * join of this shortlist against the float vectors (q166 stage 2):
    * k·oversample·|queries| rows, not the corpus. */
  def topK(
      spark: SparkSession, statePath: String, queries: DataFrame,
      k: Int = 5, nprobe: Int = 4, oversample: Int = 4,
      excludeSelf: Boolean = false,
      asOfVersion: Long = -1L): DataFrame =
    shortlist(spark, statePath, queries, k, nprobe, oversample,
        excludeSelf, asOfVersion)
      .filter(col("ar") <= k)
      .select(col("qid"), col("cid"),
        round(col("approx"), 6).as("cos_q"),
        col("ar").cast("long").as("rk"))
      .orderBy("qid", "rk")

  /** Batch drift statistic: mean angular distortion of the batch under
    * the COMMITTED centroids, relative to the baseline recorded when
    * those centroids were fitted. ~1 ⇒ centroids still fit; call
    * [[refresh]] when it exceeds the caller's threshold (the
    * CorpusIncrement monitor convention: measure, report, let policy
    * decide). */
  def driftRatio(
      spark: SparkSession, statePath: String,
      batch: DataFrame): Double = {
    val ix = readIx(statePath)
    val cent = spark.read.parquet(
      centroidsDir(statePath, ix.centroidVersion))
    val d = distortionOf(assign(prep(batch), cent))
    if (ix.baseDistortion <= 0.0) 1.0 else d / ix.baseDistortion
  }

  /** Re-fit the coarse quantizer FROM COMMITTED CODES: decode each
    * vector's direction (qc/|qc| — SQ8 is symmetric per-vector, so
    * direction survives to ~1/127), seeded KMeans over the unit
    * sphere, reassign every committed vector, write new centroids +
    * ONE compacted code part, commit one version. No corpus rescan —
    * the whole point of persisting codes. Distortion baseline resets
    * to the refreshed fit. */
  def refresh(
      spark: SparkSession, statePath: String, nlist: Int = 16): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val ix = readIx(statePath)
    val decoded = codes(spark, statePath)
      .select(col("vec_id").as("__aid"), col("qc"), col("d2"))
      .withColumn("__v", transform(col("qc").cast("array<double>"),
        x => x / sqrt(col("d2"))))
      .withColumn("__qc", col("qc").cast("array<double>"))
      .withColumn("__d2", col("d2"))
      .drop("qc", "d2")
      .withColumn("features", array_to_vector(col("__v")))
      .cache()
    val model = new KMeans().setK(nlist).setSeed(42L)
      .setFeaturesCol("features").setPredictionCol("__cell")
      .fit(decoded)
    val next = ix.version + 1
    val cent = centroidFrame(spark, model.clusterCenters.map(_.toArray))
    cent.write.mode("overwrite").parquet(centroidsDir(statePath, next))
    val persistedCent = spark.read.parquet(centroidsDir(statePath, next))
    val assigned = assign(decoded.drop("features"), persistedCent)
      .persist()
    writeCodes(spark, statePath, DedupLedger.partName(next), assigned)
    val base = distortionOf(assigned)
    assigned.unpersist()
    decoded.unpersist()
    DedupLedger.writeManifest(statePath, manifestOf(IxManifest(
      next, Seq(DedupLedger.partName(next)), next, base,
      ix.lastBatchId)))
  }

  /** Erasure for the per-vector index state (the [[DedupLedger
    * .purge]] contract lifted to codes): drop the given vec_ids' code
    * rows so the purged vectors can never appear in a shortlist
    * again. Rewrites the retained codes as one part (the compact
    * shape); manifest rename is the commit; as-of reads older than
    * the purge are refused (snapshot truncation). The centroid frame
    * is `nlist` aggregate directions (kilobytes, no per-vector rows)
    * — it may keep statistical influence from purged vectors until
    * the next [[refresh]], which re-fits from SURVIVING codes only.
    * Returns the number of code rows removed. */
  def purge(
      spark: SparkSession, statePath: String,
      vecIds: DataFrame): Long = {
    val ix = readIx(statePath)
    val doomed = vecIds
      .select(col(vecIds.columns.head).cast("long").as("vec_id"))
      .distinct()
    val current = codes(spark, statePath)
    val retained =
      current.join(broadcast(doomed), Seq("vec_id"), "left_anti")
    val removed = current.count() - retained.count()
    if (removed == 0L) return 0L
    val next = ix.version + 1
    retained.write.mode("overwrite")
      .parquet(codesDir(statePath, DedupLedger.partName(next)))
    DedupLedger.writeManifest(statePath, manifestOf(ix.copy(
      version = next,
      codeParts = Seq(DedupLedger.partName(next)))))
    DedupLedger.truncateSnapshots(statePath, next)
    removed
  }

  /** Age-based retention for code parts + centroid versions — see
    * [[DedupLedger.vacuumState]]. A centroid version survives while
    * ANY surviving manifest points at it. */
  def vacuum(statePath: String, keepVersions: Int): Long =
    DedupLedger.vacuumState(statePath, keepVersions,
      m => {
        val ix = parse(m)
        ix.codeParts.map("codes/" + _) :+
          f"centroids/v_${ix.centroidVersion}%08d"
      },
      Seq("codes", "centroids"))

  /** Fold the code parts into one (absorb appends a part per
    * increment); centroids and version semantics follow the
    * [[DedupLedger.compact]] discipline — superseded parts stay on
    * disk for as-of reads. Returns true if compaction ran. */
  def compact(spark: SparkSession, statePath: String): Boolean = {
    val ix = readIx(statePath)
    if (ix.codeParts.lengthCompare(1) <= 0) false
    else {
      val next = ix.version + 1
      codes(spark, statePath).write.mode("overwrite")
        .parquet(codesDir(statePath, DedupLedger.partName(next)))
      DedupLedger.writeManifest(statePath, manifestOf(ix.copy(
        version = next,
        codeParts = Seq(DedupLedger.partName(next)))))
      true
    }
  }
}
