package graft

import graft.functions.{BloomFunctions, BloomKernel}
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: kernel properties (the no-false-negative
  * contract the exactness argument rests on), measured fp rate vs the
  * theoretical bound, plan posture (the probe filter must sit before
  * the join), and q139 exactness vs the unpruned plain join. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: zero false negatives, fp rate within 2x theory") {
    val mBits = 1 << 14 // small filter to make fp measurable
    val k = 7
    val words = new Array[Long](mBits / 64)
    val inserted = (0L until 1000L).map(_ * 7919L + 13L)
    inserted.foreach(BloomKernel.set(words, _, k))
    val bits = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(words)
    // contract: every inserted key answers true
    assert(inserted.forall(BloomKernel.mightContain(_, bits, k)))
    // disjoint probes: fp ≈ (1 − e^{−kn/m})^k ≈ 0.008 at n=1000
    val probes = (1L to 20000L).map(_ * 104729L + 1L)
      .filterNot(inserted.contains)
    val fp = probes.count(BloomKernel.mightContain(_, bits, k))
    val theory = math.pow(
      1 - math.exp(-k.toDouble * inserted.size / mBits), k)
    assert(fp.toDouble / probes.size < 2 * theory + 0.001,
      s"fp=${fp.toDouble / probes.size} theory=$theory")
  }

  test("aggregate is partitioning-invariant (set-bit union commutes)") {
    val keys = (1L to 500L).map(_ * 31L)
    val a = keys.toDF("k").repartition(1)
      .agg(BloomFunctions.bloom_agg(col("k"), 1 << 12).as("b"))
      .head.getSeq[Long](0)
    val b = keys.reverse.toDF("k").repartition(7)
      .agg(BloomFunctions.bloom_agg(col("k"), 1 << 12).as("b"))
      .head.getSeq[Long](0)
    assert(a == b)
  }

  test("probe reads numHashes from the payload header (no k mismatch)") {
    // build with a NON-default k: the probe must still see every key
    // (a k mismatch would manifest as false negatives)
    val keys = (1L to 300L).map(_ * 97L)
    val filt = keys.toDF("k")
      .agg(BloomFunctions.bloom_agg(col("k"), 1 << 12, numHashes = 3)
        .as("b"))
    val missed = keys.toDF("k").crossJoin(filt)
      .filter(!BloomFunctions.bloom_might_contain(col("k"), col("b")))
      .count()
    assert(missed == 0, s"$missed false negatives — header k not honored")
    // header word carries the magic + k
    val payload = filt.head.getSeq[Long](0)
    assert((payload.head >>> 32) == 0x47424631L)
    assert((payload.head & 0xffffffffL) == 3L)
    // a headerless array must be rejected loudly, not silently probed
    val bad = intercept[Exception] {
      Seq(1L).toDF("k")
        .select(BloomFunctions.bloom_might_contain(
          col("k"), typedLit(Array.fill(64)(0L))))
        .collect()
    }
    assert(bad.getMessage != null)
  }

  test("probe filter runs BEFORE the join (map-side prune posture)") {
    // Catalyst fuses the probe Filter into the 1-row broadcast
    // nested-loop join's condition — same posture, zero extra node:
    // the probe node (Filter OR BNLJ-with-condition) must evaluate
    // bloom_might_contain with the fact⋈dim equi-join strictly ABOVE
    // it (flatten steps through AQE stage wrappers)
    val nodes = graft.plans.PlanAudit.flatten(
      Relational.q139(tables).queryExecution.executedPlan)
    def isEqui(n: org.apache.spark.sql.execution.SparkPlan) =
      n.nodeName.contains("HashJoin") || n.nodeName.contains("SortMergeJoin")
    val probeNode = nodes.find(n =>
      !isEqui(n) && n.expressions.exists(
        _.find(_.toString.contains("bloom_might_contain")).isDefined))
    assert(probeNode.isDefined, "bloom probe not found in physical plan")
    assert(!graft.plans.PlanAudit.flatten(probeNode.get).exists(isEqui),
      "fact-dim equi-join found below the bloom probe — prune is too late")
    assert(nodes.exists(isEqui), "fact-dim equi-join missing entirely")
  }

  test("q139 equals the unpruned plain join (false positives removed)") {
    val t = tables
    val pruned = Relational.q139(t)
    val dim = t.orders
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-07-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"))
    val plain = t.lineitem
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 10000).cast("long")).as("rev_e4"))
      .select(col("month"), col("n_items"),
        round(col("rev_e4").cast("double") / 10000, 2).as("revenue"))
    assert(pruned.collect().toSeq == plain.orderBy("month").collect().toSeq)
    assert(pruned.count() > 0)
  }
}
