package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the
  * public Sennrich-2016 / GPT-2 / SentencePiece-BPE algorithm, built
  * the way a 100 TB corpus forces: the corpus is touched ONCE (a
  * distributed word-count hash-agg), and every merge round then runs
  * over the DISTINCT-WORD working set — |vocab| rows, orders of
  * magnitude smaller than the corpus — exactly the aggregation trick
  * the public HuggingFace trainer uses. (The reference engine has no
  * counterpart; this extends the LLM-data-pipeline surface, SURVEY
  * §2.12 — "tokenizer training" is the one corpus pass every
  * pretraining pipeline runs that the token-COUNTING operators q22/
  * q86 presuppose.)
  *
  * Per merge round: adjacent symbol pairs explode (weighted by word
  * frequency), one hash-agg finds the argmax pair (count desc, then
  * lexicographic — fully deterministic), and a typed map applies the
  * merge to each word's symbol sequence. The argmax collect is ONE
  * ROW per round; the working set re-materializes via localCheckpoint
  * each round (the q131 PageRank lineage discipline — without it the
  * plan grows by one map per merge and round r replays rounds
  * 0..r-1). The per-word merge application is a typed Dataset.map —
  * adjacent-pair rewriting is inherently sequential per word, and the
  * working set it runs over is the distinct-word table, not the
  * corpus (documented trade, cf. Multimodal's mapPartitions rule).
  */
object Bpe {

  /** One distinct word as its current symbol sequence + corpus
    * frequency. */
  final case class WordSyms(syms: Seq[String], n: Long)

  /** One learned merge: rank = order it was learned, support = the
    * weighted pair count that won the round. */
  final case class Merge(rank: Int, left: String, right: String,
      merged: String, support: Long)

  /** Distinct-word frequency table off ONE corpus scan. Words are
    * whitespace tokens with a terminal end-of-word marker `</w>`
    * symbol appended (the Sennrich convention: `low</w>` and the
    * prefix `low` in `lower</w>` learn separate merges). */
  def wordCounts(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  private def toSyms(word: String): Seq[String] =
    word.map(_.toString) :+ "</w>"

  /** Apply one merge (left, right) -> left+right to a symbol
    * sequence, leftmost-first, non-overlapping. */
  def applyMerge(syms: Seq[String], left: String, right: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Train `numMerges` merges over the corpus. Returns the learned
    * merge table in rank order — the whole artifact a tokenizer
    * needs (vocab = initial characters + merged symbols). */
  def train(
      documents: DataFrame, numMerges: Int,
      minCount: Long = 2, textCol: String = "text"): Seq[Merge] = {
    val spark = documents.sparkSession
    import spark.implicits._
    var words: Dataset[WordSyms] = wordCounts(documents, textCol)
      .as[(String, Long)]
      .map { case (w, n) => WordSyms(toSyms(w), n) }
      .localCheckpoint(eager = true)
    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      // weighted pair counts over the distinct-word working set
      val top = words
        .flatMap(w => w.syms.sliding(2).collect {
          case Seq(a, b) => ((a, b), w.n)
        })
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), c) => (a, b, c) }
        .toDF("l", "r", "c")
        .orderBy(desc("c"), col("l"), col("r"))
        .limit(1).collect() // argmax only: ONE row to the driver
      if (top.isEmpty || top.head.getAs[Long]("c") < minCount) {
        done = true
      } else {
        val (l, r, c) = (top.head.getString(0), top.head.getString(1),
          top.head.getAs[Long]("c"))
        merges += Merge(round, l, r, l + r, c)
        val prev = words
        words = words
          .map(w => WordSyms(applyMerge(w.syms, l, r), w.n))
          .localCheckpoint(eager = true) // cut per-round lineage
        prev.unpersist()
        round += 1
      }
    }
    merges.toSeq
  }

  /** [[train]] memoized per (corpus plan, numMerges, minCount,
    * textCol) — the production contract made literal: merges are a
    * committed artifact trained ONCE per corpus version, while the
    * audit queries that consume them (q204 fertility, q213 roundtrip,
    * q231 utilization, ml_bpe_merges, ml_bpe_encode) are re-runnable
    * reports. Before this, each of those five retrained the identical
    * 40-merge table — 5× the same 40 driver-synchronized argmax rounds
    * per benchmark sweep.
    *
    * The corpus key is `Dataset.semanticHash()` over the canonicalized
    * logical plan: two reads of the same source (any `Tables.documents`
    * call for one sf dir) collide, different dirs/plans don't. Training
    * is deterministic (argmax ties break lexicographically), so a
    * cache hit returns bit-identical merges and every oracle is
    * unchanged. Cache values are ≤`numMerges` rows (KBs) on the
    * driver; entries are only added, bounded by distinct corpora per
    * JVM. Caveat (documented, inherent to plan-keyed memoization): if
    * the files UNDER an identical plan change mid-session, the cache
    * returns the artifact of the first training — exactly the
    * committed-artifact semantics the scaladoc above states. */
  def trainCached(
      documents: DataFrame, numMerges: Int,
      minCount: Long = 2, textCol: String = "text"): Seq[Merge] = {
    val key = (documents.semanticHash(), numMerges, minCount, textCol)
    trainCache.computeIfAbsent(key,
      _ => train(documents, numMerges, minCount, textCol))
  }

  private val trainCache =
    new java.util.concurrent.ConcurrentHashMap[
      (Int, Int, Long, String), Seq[Merge]]()

  /** Encode a word with a trained merge list (merges applied in rank
    * order — the standard BPE encode). */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] =
    merges.foldLeft(toSyms(word)) { (syms, m) =>
      applyMerge(syms, m.left, m.right)
    }

  /** Tokenize a text column with a trained merge list: the merges
    * broadcast as a literal (tokenizers are KBs — the model ships to
    * every executor like any blocklist), the corpus streams through a
    * per-row encode. Output: one row per (input row id, token). */
  def encodeTokens(
      df: DataFrame, merges: Seq[Merge],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split("\\s+").filter(_.nonEmpty).iterator.flatMap { w =>
          encodeWord(w, bc.value).iterator.map(t => (id, t))
        }
      }
      .toDF(idCol, "token")
  }

  /** ml_bpe_encode — the train→apply loop CLOSED at corpus scale: 40
    * merges trained on the corpus, then EVERY document encoded under
    * them, folded to per-doc token accounting plus a per-doc
    * `lossless` verification — BPE is open-vocabulary, so encoding
    * must reconstruct every document exactly; the check is computed
    * distributed, not sampled:
    *  - `n_words` = tokens carrying the terminal `</w>` marker, must
    *    equal the document's whitespace word count;
    *  - `n_chars` = Σ token lengths net of markers, must equal the
    *    document's non-whitespace char count.
    * Deterministic given the deterministic merges, but the trainer is
    * iterative — rows-only gate by the ml_ convention; BpeSpec pins
    * corpus-wide losslessness and reference-encoder equality. Scale
    * shape: the trained merge table broadcasts (KBs), the encode is
    * one embarrassingly-parallel pass, the fold one hash-agg. */
  def mlBpeEncode(
      documents: DataFrame, numMerges: Int = 40): DataFrame =
    encodeAccounting(documents, trainCached(documents, numMerges))

  /** The encode+verify half of [[mlBpeEncode]] under an EXISTING merge
    * list — the production split: merges are a committed artifact
    * trained once per corpus version ([[graft.sources.CorpusIncrement
    * .trainingShards]]), while the encode is re-runnable against any
    * document selection. Same per-doc accounting and distributed
    * losslessness identity as [[mlBpeEncode]]. */
  def encodeAccounting(
      documents: DataFrame, merges: Seq[Merge]): DataFrame = {
    val perDoc = encodeTokens(documents, merges)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bpe_tokens"),
        sum(when(col("token").endsWith("</w>"), 1L).otherwise(0L))
          .as("n_words"),
        sum(length(regexp_replace(col("token"), "</w>$", "")))
          .as("n_chars"))
    val truth = documents.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("__w"),
      length(regexp_replace(col("text"), "\\s+", "")).cast("long")
        .as("__c"))
    perDoc.join(truth, "doc_id")
      .select(col("doc_id"), col("n_bpe_tokens"), col("n_words"),
        col("n_chars"),
        (col("n_words") === col("__w") && col("n_chars") === col("__c"))
          .as("lossless"))
      .orderBy("doc_id")
  }

  /** q204 — tokenizer FERTILITY by language: the per-language
    * tokens-per-word and chars-per-token table every multilingual
    * tokenizer evaluation publishes (fertility ≈ how many BPE tokens
    * a word costs; a tokenizer trained on skewed language mix taxes
    * under-represented languages with high fertility — the metric
    * that decision is audited by). Trains the standard 40 merges on
    * the whole corpus, encodes every document ([[encodeAccounting]]'s
    * broadcast-merge pass), joins the per-doc accounting back to the
    * documents' language tags, and folds to |langs| rows of exact
    * integer sums plus two rounded ratios.
    *
    * Deterministic integer state end-to-end → FULL hash oracle (the
    * round-12 BPE-replay CTEs extended by one join + aggregate).
    * Scale: the encode is one embarrassingly-parallel pass, the fold
    * one |langs|-group hash-agg. */
  def tokenizerFertility(
      documents: DataFrame, numMerges: Int = 40): DataFrame =
    encodeAccounting(documents, trainCached(documents, numMerges))
      .join(documents.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_bpe_tokens").as("n_bpe_tokens"),
        sum("n_chars").as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double")
          / col("n_words").cast("double"), 4).as("fertility"),
        round(col("n_chars").cast("double")
          / col("n_bpe_tokens").cast("double"), 4)
          .as("chars_per_token"))
      .orderBy("lang")

  /** [[encodeTokens]] with an explicit within-document POSITION — the
    * shape a decoder (or any order-sensitive consumer: packing,
    * provenance, attention-mask builders) needs. Same broadcast-merge
    * embarrassingly-parallel pass; the position counter is local to
    * each document's iterator, so no window or shuffle is added. */
  def encodeTokensPos(
      df: DataFrame, merges: Seq[Merge],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        var pos = -1L
        text.split("\\s+").filter(_.nonEmpty).iterator.flatMap { w =>
          encodeWord(w, bc.value).iterator.map { t =>
            pos += 1L; (id, pos, t)
          }
        }
      }
      .toDF(idCol, "pos", "token")
  }

  /** Decode a token frame (doc_id, pos, token) back to text: tokens
    * re-ordered by position within each document, concatenated, and
    * the `</w>` end-of-word markers turned back into spaces. The
    * inverse of [[encodeTokensPos]] — BPE is open-vocabulary, so this
    * must be EXACT on whitespace-normalized input.
    *
    * Scale: one doc-keyed hash-agg whose per-group state is the
    * document's own token list (inherent for decode — the output IS
    * the document); `array_sort` on (pos, token) structs keeps the
    * fold deterministic without a window or a secondary shuffle. */
  def decodeTokens(tokens: DataFrame, idCol: String = "doc_id"): DataFrame =
    tokens
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("token"))))
        .as("__ts"))
      .select(col(idCol),
        regexp_replace(
          concat_ws("", transform(col("__ts"), t => t.getField("token"))),
          "</w>", " ").as("decoded_raw"))
      .select(col(idCol), rtrim(col("decoded_raw")).as("decoded"))

  /** q213 — tokenizer ROUND-TRIP audit: the decode side of the BPE
    * pair, closing the loop q156/q183's committed token artifacts
    * depend on ("can every stored token sequence reconstruct its
    * source document byte-for-byte?"). Trains the standard 40 merges,
    * encodes every document WITH positions, decodes from the encoded
    * frame alone (two independent passes — the decoder never sees the
    * source text), and emits per document the word count, the md5 of
    * the decoded text, and the md5 of the whitespace-normalized
    * original. Because decode∘encode is the identity on normalized
    * text, the DuckDB oracle states the invariant directly from
    * `documents` — a FULL hash oracle over the engine's actual
    * encode→decode path with no BPE replay needed: any encoder drift,
    * dropped token, ordering bug, or marker mishandling lands in
    * `decoded_md5` and fails the gate.
    *
    * Scale: encode is the broadcast-merge parallel pass; decode is
    * one doc-keyed agg whose state is the document itself (inherent);
    * the md5 comparison joins on doc_id — all linear, no driver data
    * path. */
  def bpeRoundtrip(
      documents: DataFrame, numMerges: Int = 40): DataFrame = {
    val merges = trainCached(documents, numMerges)
    val decoded = decodeTokens(encodeTokensPos(documents, merges))
    val truth = documents.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"),
      md5(regexp_replace(trim(col("text")), "\\s+", " ")).as("orig_md5"))
    decoded.join(truth, "doc_id")
      .select(col("doc_id"), col("n_words"),
        md5(col("decoded")).as("decoded_md5"), col("orig_md5"),
        when(md5(col("decoded")) === col("orig_md5"), 1L).otherwise(0L)
          .as("roundtrip_ok"))
      .orderBy("doc_id")
  }

  /** ml_bpe_merges — the declared rows-only artifact: 40 merges
    * trained on the documents corpus, in rank order. Deterministic
    * (argmax ties break lexicographically), but iterative — outside
    * single-statement SQL, so gated by BpeSpec's reference-
    * implementation equality instead of the DuckDB oracle (the ml_*
    * convention). */
  def mlBpeMerges(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    trainCached(documents, numMerges = 40)
      .toDF().select(
        col("rank").cast("long").as("rank"),
        col("left"), col("right"), col("merged"),
        col("support"))
      .orderBy("rank")
  }

  /** q231 — merge-UTILIZATION audit: how often each committed merge
    * actually fires when the tokenizer is applied to a DIFFERENT
    * document slice (`doc_id % subsetMod == 0`) than it was trained
    * on — the tokenizer-drift table ("which merges still pay for
    * themselves on the new crawl?"). On the training corpus itself
    * `applications <= support`, with equality whenever the merge has
    * `left != right` (greedy BPE replays its own state sequence): a
    * self-adjacent merge (left == right) firing on a symbol run of
    * length >= 3 counts support with OVERLAPPING sliding pairs
    * ("aaa" -> 2 support) but applies non-overlapping left-to-right
    * ("aaa" -> 1 application) — the standard Sennrich-BPE asymmetry.
    * The audit is informative OFF the training slice — exactly the
    * production situation: merges are a committed artifact (q183),
    * crawls keep arriving. Applications are exact integers: applying merge k to a
    * word shrinks its symbol sequence by exactly the number of
    * applications, so per-stage length deltas weighted by the
    * slice's word frequencies ARE the utilization — the same
    * distinct-word trick as training (the corpus is never
    * re-tokenized per merge).
    *
    * Scale: one word-count hash-agg over the slice, one broadcast of
    * the KB-sized merge table, one embarrassingly-parallel fold per
    * distinct word emitting `numMerges` (rank, delta) pairs, one
    * rank-keyed hash-agg to 40 rows. */
  def mergeUtilization(
      documents: DataFrame,
      numMerges: Int = 40,
      subsetMod: Int = 3): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val merges = trainCached(documents, numMerges)
    val subset = documents
      .filter(pmod(col("doc_id"), lit(subsetMod)) === 0)
    val bc = spark.sparkContext.broadcast(merges)
    val deltas = wordCounts(subset).as[(String, Long)]
      .flatMap { case (w, k) =>
        var syms = toSyms(w)
        bc.value.iterator.map { m =>
          val before = syms.length
          syms = applyMerge(syms, m.left, m.right)
          (m.rank, (before - syms.length).toLong * k)
        }
      }
      .toDF("rank", "apps")
      .groupBy("rank").agg(sum("apps").as("applications"))
    merges.toDF()
      .join(deltas, Seq("rank"), "left")
      .select(col("rank").cast("long").as("rank"),
        col("left"), col("right"), col("merged"), col("support"),
        coalesce(col("applications"), lit(0L)).as("applications"),
        when(coalesce(col("applications"), lit(0L)) > 0, 1L)
          .otherwise(0L).as("used"))
      .orderBy("rank")
  }
}
