package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Content-defined chunking (q161): boundary rule against a Scala
  * reference, chunk integrity, and the property that justifies CDC
  * over fixed-size windows — shared blocks at DIFFERENT offsets still
  * produce identical chunks. */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  /** Scala reference of the engine's cut rule (pBits=3): a token ends
    * its chunk when md5(token) starts with hex 0 or 1. */
  private def refChunks(text: String): Seq[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def boundary(tok: String): Boolean = {
      val h = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      h.charAt(0) < '2'
    }
    val toks = text.split(" ").toSeq
    val chunks = scala.collection.mutable.ListBuffer.empty[Seq[String]]
    var cur = scala.collection.mutable.ListBuffer.empty[String]
    toks.foreach { t =>
      cur += t
      if (boundary(t)) { chunks += cur.toSeq; cur.clear() }
    }
    if (cur.nonEmpty) chunks += cur.toSeq
    chunks.toSeq.map(_.mkString(" "))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // 'to' and 'quick' are boundary tokens (md5 first nibble 0/1);
  // alpha/beta/delta/kappa/lambda are not — verified by refChunks
  private val block =
    "terms of service apply to all users without notice quick"
  private val docA = s"alpha beta delta $block" // block appended
  private val docB = s"$block kappa lambda" // block prepended

  test("cdcChunks reproduces the reference cut rule exactly " +
    "(chunk md5s, counts, and token sums)") {
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val got = Dedup.cdcChunks(docs)
      .select("doc_id", "chunk_idx", "chunk_md5", "n_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    Seq(1L -> docA, 2L -> docB).foreach { case (id, text) =>
      val want = refChunks(text)
      val mine = got.filter(_._1._1 == id)
      assert(mine.size == want.size, s"doc $id: ${mine.size} vs $want")
      want.zipWithIndex.foreach { case (chunk, i) =>
        val (h, n) = mine((id, i.toLong))
        assert(h == md5hex(chunk), s"doc $id chunk $i")
        assert(n == chunk.split(" ").length.toLong)
      }
    }
  }

  test("shift resistance: a block appended in one doc and prepended " +
    "in another yields an identical interior chunk; fixed-size " +
    "windows at the same granularity find nothing") {
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs)
    val shared = chunks.groupBy("chunk_md5")
      .agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") === 2)
    // the interior chunk 'all users without notice quick' starts
    // after the 'to' boundary in BOTH docs despite a 3-token offset
    val sharedHashes = shared.collect().map(_.getString(0)).toSet
    assert(sharedHashes.contains(md5hex("all users without notice quick")),
      sharedHashes.toString)
    // contrast: fixed 5-token windows are offset by 3 tokens between
    // the docs, so NO window content coincides
    val fixed = docs
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "tok")))
      .withColumn("win", (col("pos") / 5).cast("long"))
      .groupBy("doc_id", "win")
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ")).as("h"))
      .groupBy("h").agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") === 2)
    assert(fixed.isEmpty)
  }

  test("chunk token counts partition each document: per-doc sums " +
    "equal the document's token count (fixture corpus)") {
    val docs = tables.documents.limit(50)
    val sums = Dedup.cdcChunks(docs)
      .groupBy("doc_id").agg(sum("n_tokens").as("chunk_toks"))
    val direct = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("doc_toks"))
    val joined = sums.join(direct, "doc_id")
    assert(joined.filter(col("chunk_toks") =!= col("doc_toks")).isEmpty)
    // mean chunk length is near 2^pBits = 8 on word-soup text
    val mean = Dedup.cdcChunks(docs).agg(avg("n_tokens")).head().getDouble(0)
    assert(mean > 3.0 && mean < 20.0, mean.toString)
  }

  test("q161 on the fixture: the planted shared block surfaces as " +
    "high-occurrence duplicate chunks despite per-doc offsets") {
    val r = Dedup.q161(tables.documents).collect()
    assert(r.nonEmpty)
    // half the corpus carries the block (doc_id%4 in {0,1}); its
    // interior chunks must dominate the dup report
    val top = r.head
    val n = tables.documents.count()
    assert(top.getAs[Long]("n_occ") >= n / 4, top.toString)
    // report is well-formed: occurrences >= docs >= 2
    r.foreach { row =>
      assert(row.getAs[Long]("n_occ") >= row.getAs[Long]("n_docs"))
      assert(row.getAs[Long]("n_docs") >= 2L)
    }
  }
}
