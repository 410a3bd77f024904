package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer (ml_bpe_merges): full merge-sequence equality against
  * an independent single-machine reference, determinism, encode
  * round-trips, and the monotone-support invariant. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference BPE (imperative, driver-only): same
    * contract as Bpe.train — argmax by (count desc, pair asc),
    * leftmost non-overlapping merge application. */
  private def refTrain(
      words: Map[String, Long], k: Int,
      minCount: Long): Seq[(String, String, Long)] = {
    var ws: Map[Seq[String], Long] = words.map { case (w, n) =>
      (w.map(_.toString) :+ "</w>", n)
    }
    val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.size < k && continue) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      ws.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      if (pairs.isEmpty) continue = false
      else {
        val ((l, r), c) = pairs.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        if (c < minCount) continue = false
        else {
          out += ((l, r, c))
          ws = ws.map { case (syms, n) =>
            (Bpe.applyMerge(syms, l, r), n)
          }.groupBy(_._1).map { case (s, g) => (s, g.map(_._2).sum) }
        }
      }
    }
    out.toSeq
  }

  private val tinyCorpus = Seq(
    // the Sennrich-paper-style working example, as documents with
    // repetition giving the word frequencies
    (1L, "low low low low low lower lower newest newest newest " +
      "newest newest newest widest widest widest"))
    .toDF("doc_id", "text")

  test("distributed train reproduces the reference merge sequence " +
    "exactly (pairs, order, and support counts)") {
    val got = Bpe.train(tinyCorpus, numMerges = 10, minCount = 2)
      .map(m => (m.left, m.right, m.support))
    val want = refTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
      10, 2)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // the canonical first merges on this corpus: 'es' then 'est'
    // dominate (9 occurrences via newest+widest)
    assert(got.head._3 == 9L)
  }

  test("training is deterministic: two runs produce identical tables") {
    val docs = tables.documents.limit(100)
    val a = Bpe.train(docs, numMerges = 15)
    val b = Bpe.train(docs, numMerges = 15)
    assert(a == b)
  }

  test("encodeWord round-trips: tokens concatenate back to the word, " +
    "and merge support never increases with rank") {
    val merges = Bpe.train(tinyCorpus, numMerges = 10, minCount = 2)
    Seq("low", "lowest", "newest", "wider", "unseen").foreach { w =>
      val toks = Bpe.encodeWord(w, merges)
      assert(toks.mkString == w + "</w>", s"$w -> $toks")
    }
    merges.sliding(2).foreach {
      case Seq(a, b) => assert(a.support >= b.support, s"$a then $b")
      case _ =>
    }
  }

  test("encodeTokens (distributed) agrees with per-word encodeWord " +
    "and preserves token order within documents") {
    val merges = Bpe.train(tinyCorpus, numMerges = 10, minCount = 2)
    val docs = Seq((7L, "low newest unknown")).toDF("doc_id", "text")
    val got = Bpe.encodeTokens(docs, merges).collect()
      .map(r => r.getString(1))
    val want = Seq("low", "newest", "unknown").flatMap(w =>
      Bpe.encodeWord(w, merges))
    assert(got.toSeq == want)
  }

  test("ml_bpe_encode on the fixture: every document round-trips " +
    "losslessly (word and char accounting exact), compression is " +
    "real, and a sampled doc matches the reference encoder") {
    val docs = tables.documents
    val rows = Bpe.mlBpeEncode(docs, numMerges = 40).collect()
    assert(rows.length == docs.count())
    // corpus-wide OOV-free verification: BPE is open-vocabulary, so
    // EVERY doc must reconstruct exactly — not a sample
    assert(rows.forall(_.getAs[Boolean]("lossless")),
      rows.filterNot(_.getAs[Boolean]("lossless")).take(3).mkString)
    // merges actually fired: fewer BPE tokens than raw characters
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_bpe_tokens") <
        r.getAs[Long]("n_chars") + r.getAs[Long]("n_words"),
        s"doc ${r.getAs[Long]("doc_id")}: no merge compressed anything")
    }
    // reference equality on one sampled doc: the per-doc token count
    // equals a driver-side word-by-word encode under the same merges
    val merges = Bpe.train(docs, numMerges = 40)
    val sample = docs.orderBy("doc_id").limit(1)
      .select("doc_id", "text").head()
    val wantTokens = sample.getString(1).split("\\s+")
      .filter(_.nonEmpty).flatMap(w => Bpe.encodeWord(w, merges))
    val gotRow = rows.find(_.getAs[Long]("doc_id") == sample.getLong(0)).get
    assert(gotRow.getAs[Long]("n_bpe_tokens") == wantTokens.length.toLong)
  }

  test("ml_bpe_merges on the fixture: 40 ranked merges, supports " +
    "positive and non-increasing, merged symbols consistent") {
    val rows = Bpe.mlBpeMerges(tables.documents).collect()
    assert(rows.length == 40)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") == i.toLong)
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left") + r.getAs[String]("right"))
      assert(r.getAs[Long]("support") > 0L)
    }
    val supports = rows.map(_.getAs[Long]("support"))
    supports.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"support rose: $a -> $b")
      case _ =>
    }
  }

  test("tokenizerFertility: per-language sums equal a driver-side " +
    "fold of the per-doc encode accounting, ratios exact at 4 dp, " +
    "fertility >= 1 everywhere") {
    val docs = tables.documents
    val got = Bpe.tokenizerFertility(docs).collect()
    val langOf = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = Bpe.mlBpeEncode(docs).collect()
      .map(r => (langOf(r.getAs[Long]("doc_id")),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"),
        r.getAs[Long]("n_chars")))
    val want = perDoc.groupBy(_._1).map { case (l, rs) =>
      l -> (rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).sum,
        rs.map(_._4).sum)
    }
    assert(got.map(_.getString(0)).toSet == want.keySet)
    got.foreach { r =>
      val (nd, nw, nt, nc) = want(r.getString(0))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_words") == nw)
      assert(r.getAs[Long]("n_bpe_tokens") == nt)
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val fert = r.getAs[Double]("fertility")
      assert(fert == r4(nt.toDouble / nw))
      assert(fert >= 1.0, "a word costs at least one token")
      assert(r.getAs[Double]("chars_per_token") == r4(nc.toDouble / nt))
    }
  }

  test("decodeTokens: reconstructs from a shuffled positional token " +
    "frame — order comes from pos, not input order") {
    val spark2 = spark
    import spark2.implicits._
    // positions deliberately out of input order
    val toks = Seq((1L, 3L, "rld</w>"), (1L, 0L, "he"), (1L, 1L, "llo</w>"),
      (1L, 2L, "wo"), (2L, 0L, "x</w>"))
      .toDF("doc_id", "pos", "token")
    val got = Bpe.decodeTokens(toks).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "hello world")
    assert(got(2L) == "x")
  }

  test("bpeRoundtrip: decode∘encode is the identity corpus-wide — " +
    "every fixture doc reconstructs to its exact md5") {
    val spark2 = spark
    import spark2.implicits._
    // crafted: multi-merge words + singletons
    val docs = Seq((1L, "low lower lowest low"), (2L, "the cat sat"))
      .toDF("doc_id", "text")
    val crafted = Bpe.bpeRoundtrip(docs, numMerges = 10).collect()
    crafted.foreach { r =>
      assert(r.getAs[Long]("roundtrip_ok") == 1L, s"doc ${r.getLong(0)}")
      assert(r.getAs[String]("decoded_md5") == r.getAs[String]("orig_md5"))
    }
    assert(crafted.map(r => r.getLong(0) -> r.getAs[Long]("n_words"))
      .toMap == Map(1L -> 4L, 2L -> 3L))
    // fixture-wide at the declared 40 merges
    val fx = Bpe.bpeRoundtrip(tables.documents).collect()
    assert(fx.length == tables.documents.count())
    fx.foreach(r =>
      assert(r.getAs[Long]("roundtrip_ok") == 1L, s"doc ${r.getLong(0)}"))
  }

  test("mergeUtilization: on the training slice itself utilization " +
    "equals support for left!=right merges (<= for self-adjacent); " +
    "off-slice merges report used=0") {
    import spark.implicits._
    // greedy BPE replays its own state sequence, so subsetMod=1
    // (audit slice == training corpus) reproduces support exactly for
    // every merge with left != right; a self-adjacent merge (left ==
    // right) counts support with overlapping sliding pairs but applies
    // non-overlapping, so a run of length >= 3 makes support exceed
    // applications even on the training corpus — assert the exact
    // contract, not blanket equality
    val self = Bpe.mergeUtilization(tables.documents, numMerges = 10,
      subsetMod = 1).collect()
    assert(self.nonEmpty)
    self.foreach { r =>
      val (app, sup) =
        (r.getAs[Long]("applications"), r.getAs[Long]("support"))
      if (r.getAs[String]("left") == r.getAs[String]("right"))
        assert(app <= sup, s"rank ${r.getLong(0)}")
      else assert(app == sup, s"rank ${r.getLong(0)}")
      assert(r.getAs[Long]("used") == 1L)
    }
    // crafted drift: the subset (doc 0 only) contains 'xy' words but
    // no 'ab' words -> the (a,b) merge exists with support but never
    // fires on the slice
    val docs = Seq(
      (0L, "xy xy"), (1L, "ab ab ab"), (2L, "ab xy"))
      .toDF("doc_id", "text")
    val got = Bpe.mergeUtilization(docs, numMerges = 10, subsetMod = 3)
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        (r.getAs[Long]("support"), r.getAs[Long]("applications"),
          r.getAs[Long]("used"))).toMap
    // (a,b): 4 training occurrences, zero on the slice
    assert(got(("a", "b")) == ((4L, 0L, 0L)))
    // (x,y): fires once per 'xy' occurrence in doc 0 (k = 2)
    assert(got(("x", "y")) == ((3L, 2L, 1L)))
    // every merge's applications are nonnegative and bounded by the
    // slice's total adjacent-pair budget
    Bpe.mergeUtilization(tables.documents).collect().foreach { r =>
      assert(r.getAs[Long]("applications") >= 0L)
      assert(r.getAs[Long]("used") ==
        (if (r.getAs[Long]("applications") > 0) 1L else 0L))
    }
  }
}
