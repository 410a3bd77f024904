package graft.sources

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent state for incremental batch-vs-corpus NEAR-dup detection
  * — [[DedupLedger]]'s exact-key discipline lifted to MinHash: the
  * corpus's k-component signatures (~500 B/doc, independent of text
  * size) are computed ONCE at init; each crawl increment then loads
  * signatures (never corpus TEXT), flags its near-duplicates via the
  * shared [[Dedup.nearDupFlags]] band-collision core, and appends its
  * own signatures. At 100 TB the signature ledger is |docs| × ~150
  * bytes — three orders of magnitude smaller than the corpus — and an
  * increment's cost is O(batch) + one collision-driven join.
  *
  * ALL batch signatures are absorbed (flagged or not): the q170
  * pair-existence contract compares each increment against everything
  * SEEN, not everything KEPT, which is what makes
  * increment-after-increment equal the one-shot replay (keep-first
  * near-dup semantics are not transitive; seen-set semantics are) —
  * proven in MinhashLedgerSpec. Callers drop flagged docs (or route
  * them to review) as policy.
  *
  * State layout and crash safety are [[DedupLedger]]'s verbatim
  * (shared manifest format + tmp/rename commit): `sigs/part_<v>/`
  * append-only signature parts, `CURRENT` manifest listing committed
  * parts; orphan parts from a crash before the rename are ignored and
  * reclaimed by the idempotent replay.
  */
object MinhashLedger {

  import DedupLedger.{Manifest, partName, readManifest, writeManifest}

  private def sigsDir(statePath: String, part: String) =
    s"$statePath/sigs/$part"

  /** Build the signature ledger from the historical corpus — the one
    * full corpus-text scan this state ever requires. */
  def init(
      spark: SparkSession, statePath: String, corpus: DataFrame,
      k: Int = 16): Unit = {
    require(readManifest(statePath).isEmpty,
      s"ledger already initialized at $statePath")
    Dedup.minhashSignatures(corpus, k)
      .write.mode("overwrite")
      .parquet(sigsDir(statePath, partName(1)))
    writeManifest(statePath, Manifest(1, Seq(partName(1))))
  }

  /** All committed signatures: the lazy union of the manifest's parts
    * — fingerprints, never text. */
  def signatures(spark: SparkSession, statePath: String): DataFrame = {
    val m = readManifest(statePath).getOrElse(
      throw new IllegalStateException(s"no ledger at $statePath"))
    spark.read.parquet(m.keyParts.map(sigsDir(statePath, _)): _*)
  }

  /** Flag `batch`'s near-duplicates against everything seen (ledger ∪
    * own batch), absorb the batch's signatures, and return the flag
    * frame — (doc_id, n_partners, first_partner, best_est), the q170
    * contract restricted to this increment. The corpus text is never
    * read; the increment's inputs are the batch and the signature
    * parts (asserted in MinhashLedgerSpec via inputFiles). */
  def absorb(
      spark: SparkSession, statePath: String, batch: DataFrame,
      k: Int = 16, bands: Int = 4,
      minEstJaccard: Double = 0.5): DataFrame = {
    val m = readManifest(statePath).getOrElse(
      throw new IllegalStateException(
        s"no ledger at $statePath — call init(corpus) first"))
    val next = m.version + 1
    // batch signatures land on disk FIRST (they are both the state
    // advance and the flag input — reading them back keeps the flag
    // computation on the exact persisted bytes), manifest rename last
    Dedup.minhashSignatures(batch, k)
      .write.mode("overwrite")
      .parquet(sigsDir(statePath, partName(next)))
    val batchSig = spark.read.parquet(sigsDir(statePath, partName(next)))
    val ledgerSig = signatures(spark, statePath)
    // lazy: the frame is pinned to explicit part PATHS (resolved
    // above), so consuming it after the manifest advances — or after a
    // compact, whose superseded parts become orphans but are never
    // deleted — still reads exactly this increment's state, and
    // lineage survives for the no-corpus-scan inputFiles assertion
    val flags = Dedup.nearDupFlags(
      batchSig, ledgerSig.unionByName(batchSig), k, bands,
      minEstJaccard)
    writeManifest(statePath,
      Manifest(next, m.keyParts :+ partName(next)))
    flags
  }

  /** Compact signature parts into one (the [[DedupLedger.compact]]
    * maintenance step — identical rationale and commit shape). */
  def compact(spark: SparkSession, statePath: String): Boolean = {
    val m = readManifest(statePath).getOrElse(
      throw new IllegalStateException(s"no ledger at $statePath"))
    if (m.keyParts.lengthCompare(1) <= 0) false
    else {
      val next = m.version + 1
      signatures(spark, statePath)
        .write.mode("overwrite")
        .parquet(sigsDir(statePath, partName(next)))
      writeManifest(statePath, Manifest(next, Seq(partName(next))))
      true
    }
  }

  /** Erasure for derived near-dup state (the [[DedupLedger.purge]]
    * counterpart): remove the given doc_ids' signatures so a future
    * occurrence of the purged text is new again. Rewrites the
    * retained set as one part (the compact shape); manifest rename is
    * the commit. Returns the number of signatures removed. */
  def purge(
      spark: SparkSession, statePath: String,
      docIds: DataFrame): Long = {
    val m = readManifest(statePath).getOrElse(
      throw new IllegalStateException(s"no ledger at $statePath"))
    val doomed = docIds
      .select(col(docIds.columns.head).as("doc_id")).distinct()
    val current = signatures(spark, statePath)
    val retained = current
      .join(broadcast(doomed), Seq("doc_id"), "left_anti")
    val removed = current.count() - retained.count()
    if (removed == 0L) return 0L
    val next = m.version + 1
    retained.write.mode("overwrite")
      .parquet(sigsDir(statePath, partName(next)))
    writeManifest(statePath, Manifest(next, Seq(partName(next))))
    removed
  }
}
