package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The per-document CURATION MANIFEST (SURVEY §2.12): the keep/drop
  * decision table a production pipeline actually materializes before
  * training — one row per document with the REASON it survived or
  * fell, under a fixed precedence:
  *
  *   blocklist > exact_dup > near_dup > benchmark > contaminated >
  *   quality > keep
  *
  * Every stage is the engine's own gated operator (q155 blocklist
  * tagging, q17 exact keepers, q42/q85 minhash components + canonical
  * selection, q95 benchmark decontamination, q63 per-language quality
  * gate) — the manifest composes them, it does not re-implement them,
  * so a change to any stage's semantics moves this gate too. Auditors
  * read this table to answer "why is document X missing from the
  * training set?" — the provenance question every data-governance
  * review asks first.
  *
  * Exact duplicates are PLANTED (the stock fixture has none at any
  * sf — the q202 vacuous-bucket lesson): documents with
  * doc_id % dupMod == 0 reappear once under doc_id + idOffset, so the
  * exact_dup class is populated, scale-covariant, and
  * oracle-reproducible; the planted copy always loses to its original
  * (min-doc_id keeper) and the original stays canonical in the
  * resulting 2-member minhash component (equal length, doc_id
  * tie-break).
  *
  * Scale: each stage is its own documented plan (hash-agg keepers,
  * O(log² n) star components, broadcast bench gram index, |langs|-row
  * quantile broadcast); the manifest adds only doc_id-keyed left
  * joins of narrow flag frames — nothing here rescans text beyond
  * the stages themselves. */
object Curation {

  def curationManifest(
      documents: DataFrame,
      blockTerms: Seq[String] = Seq("dup"),
      dupMod: Int = 17,
      idOffset: Long = 100000000L,
      benchMod: Int = 97,
      contamMinShared: Long = 1L): DataFrame = {
    val planted = documents.unionByName(
      documents.filter(pmod(col("doc_id"), lit(dupMod)) === 0)
        .withColumn("doc_id", col("doc_id") + idOffset))
    val bl = Scrub.blocklistTag(planted, blockTerms)
      .filter(col("blocked"))
      .select(col("doc_id"), lit(1L).as("__bl"))
    val keepers = planted
      .groupBy(md5(col("text")).as("__h"))
      .agg(min("doc_id").as("__keeper"))
    val xd = planted.select(col("doc_id"), md5(col("text")).as("__h"))
      .join(keepers, "__h")
      .filter(col("doc_id") =!= col("__keeper"))
      .select(col("doc_id"), lit(1L).as("__xd"))
    // ONE run of the minhash+LSH+star pipeline feeds both the
    // component frame and the canonical selection (the star output is
    // eagerly materialized, so the second consumer is a re-read, not a
    // re-run — before this the manifest paid the whole q42 pipeline
    // twice, once inside canonicalDocs and once for the flags)
    val comps = Dedup.nearDupComponents(planted)
    val canon = Dedup.canonicalFromComponents(comps, planted)
      .select(col("component"), col("canonical_doc"))
    val nd = comps
      .join(canon, "component")
      .filter(col("doc_id") =!= col("canonical_doc"))
      .select(col("doc_id"), lit(1L).as("__nd"))
    val ct = Dedup.decontaminationPairs(planted, benchMod = benchMod)
      .filter(col("shared_ngrams") >= contamMinShared)
      .select("doc_id").distinct()
      .select(col("doc_id"), lit(1L).as("__ct"))
    val qf = TextAnalysis.qualityGate(planted)
      .select(col("doc_id"), lit(1L).as("__qf"))
    val reason = when(col("__bl") === 1L, "blocklist")
      .when(col("__xd") === 1L, "exact_dup")
      .when(col("__nd") === 1L, "near_dup")
      .when(pmod(col("doc_id"), lit(benchMod)) === 0, "benchmark")
      .when(col("__ct") === 1L, "contaminated")
      .when(col("__qf") === 1L, "quality")
      .otherwise("keep")
    planted.select("doc_id", "lang", "source")
      .join(bl, Seq("doc_id"), "left")
      .join(xd, Seq("doc_id"), "left")
      .join(nd, Seq("doc_id"), "left")
      .join(ct, Seq("doc_id"), "left")
      .join(qf, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        reason.as("reason"),
        when(reason === "keep", 1L).otherwise(0L).as("kept"))
      .orderBy("doc_id")
  }
}
