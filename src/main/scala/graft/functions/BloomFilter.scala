package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom-filter runtime join pruning (the "sideways information
  * passing" pattern every warehouse engine ships: build a compact
  * filter from the small/filtered build side of a join, broadcast it,
  * and drop probe rows BEFORE the shuffle).
  *
  * Why it matters at 100 TB: a selective dim predicate (say 2% of
  * orders) still forces Spark to shuffle the ENTIRE fact table for a
  * sort-merge join — the join is where non-matching rows die, one
  * shuffle too late. A Bloom filter over the build keys is a few
  * hundred KB regardless of fact size; broadcasting it and filtering
  * map-side turns the fact shuffle from O(|fact|) into
  * O(|matching| + fp·|fact|). False positives only waste shuffle
  * bytes — the real join still runs, so results stay EXACT (that is
  * why q139's oracle is a plain join: the filter is invisible in the
  * output).
  *
  * Spark's own `InjectRuntimeFilter` does this automatically only for
  * shuffle-reusable cases and is adaptive-plan-internal; this operator
  * is the explicit, composable form (usable on any Column key, across
  * stages, or persisted between jobs).
  *
  * Determinism: the bit array is a pure function of the key SET —
  * insertion order cannot matter because set-bit union is commutative
  * (`merge` is a word-wise OR), so the aggregate is safe under any
  * partitioning. Hashing is splitmix64 double-hashing (public-domain
  * finalizer; Steele et al., "Fast Splittable Pseudorandom Number
  * Generators", OOPSLA'14) — no cross-engine parity needed since bits
  * never reach the output.
  *
  * The single hash/probe kernel lives in [[BloomKernel]] and is shared
  * by the Aggregator (build) and the codegen Expression (probe): one
  * source of truth, no Scala-vs-Java drift.
  */
object BloomKernel extends Serializable {
  /** Filter payloads are self-describing: word 0 is a header carrying
    * a magic tag (high 32 bits) and the build-side numHashes (low 32),
    * bit words follow. The probe reads k from the header instead of
    * trusting its own default — a probe/build k mismatch would yield
    * FALSE NEGATIVES (dropped join rows), breaking the exactness
    * guarantee, so it is made unrepresentable rather than documented. */
  val HeaderMagic: Long = 0x47424631L << 32 // "GBF1"

  def header(numHashes: Int): Long = HeaderMagic | (numHashes & 0xffffffffL)

  /** splitmix64 finalizer — avalanches a long key. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bit index of probe `i` for `key` in an `mBits`-bit filter
    * (Kirsch–Mitzenmacher double hashing: h1 + i·h2 — two mixes serve
    * any number of probes). `mBits` must be a power of two. */
  def bitIndex(key: Long, i: Int, mBits: Int): Int = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    (((h1 + i.toLong * h2) & Long.MaxValue) & (mBits - 1)).toInt
  }

  def set(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val mBits = words.length * 64
    var i = 0
    while (i < numHashes) {
      val b = bitIndex(key, i, mBits)
      words(b >>> 6) |= 1L << (b & 63)
      i += 1
    }
  }

  /** Raw probe over headerless bit words (kernel-level building block;
    * the SQL surface goes through the header-aware overload below). */
  def mightContain(key: Long, bits: ArrayData, numHashes: Int): Boolean = {
    val mBits = bits.numElements() * 64
    var i = 0
    while (i < numHashes) {
      val b = bitIndex(key, i, mBits)
      if ((bits.getLong(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Header-aware probe — called from both interpreted eval and
    * generated code. Validates the magic tag and the power-of-two
    * word count `bitIndex` requires, then probes with the k the BUILD
    * side recorded. */
  def mightContain(key: Long, payload: ArrayData): Boolean = {
    val h = payload.getLong(0)
    if ((h & 0xffffffff00000000L) != HeaderMagic)
      throw new IllegalArgumentException(
        "bloom_might_contain: payload lacks the GBF1 header — " +
          "was it built by bloom_agg?")
    val numHashes = (h & 0x7fffffffL).toInt
    val mBits = (payload.numElements() - 1) * 64
    if (mBits <= 0 || (mBits & (mBits - 1)) != 0)
      throw new IllegalArgumentException(
        s"bloom_might_contain: bit length $mBits is not a power of two")
    var i = 0
    while (i < numHashes) {
      val b = bitIndex(key, i, mBits)
      if ((payload.getLong(1 + (b >>> 6)) & (1L << (b & 63))) == 0L)
        return false
      i += 1
    }
    true
  }
}

/** Build side: aggregates a LONG key column into the filter's word
  * array. O(mBits/64) state per partial, word-wise-OR merge —
  * map-side combine friendly, deterministic under any partitioning. */
class BloomAggregator(mBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits > 0 && (mBits & (mBits - 1)) == 0,
    s"mBits must be a power of two, got $mBits")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    BloomKernel.set(buf, key, numHashes); buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  /** Prepend the self-describing header (numHashes + magic) so probes
    * can never run with a k the build side didn't use. */
  override def finish(buf: Array[Long]): Array[Long] =
    BloomKernel.header(numHashes) +: buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Probe side: `bloom_might_contain(key, bits)` with whole-stage
  * codegen — the generated code is a direct static call into the
  * shared kernel, so the filter evaluates inside the scan's codegen
  * span (visible as a Filter directly over the parquet scan). */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType &&
      right.dataType.isInstanceOf[ArrayType] &&
      right.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, ARRAY<BIGINT>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(k: Any, b: Any): Any =
    BloomKernel.mightContain(
      k.asInstanceOf[Long], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, b) =>
      s"${ev.value} = graft.functions.BloomKernel.mightContain($k, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface. */
object BloomFunctions {
  import org.apache.spark.sql.functions.udaf

  /** Aggregate a BIGINT key column into an `mBits`-bit Bloom filter
    * (ARRAY<BIGINT> of mBits/64 words). Size for the EXPECTED build
    * NDV: fp ≈ (1 − e^(−kn/m))^k; the default 2²⁰ bits / 7 hashes
    * holds ~100k keys at ≈1% fp in 128 KB. */
  def bloom_agg(key: Column, mBits: Int = 1 << 20,
      numHashes: Int = 7): Column =
    udaf(new BloomAggregator(mBits, numHashes), Encoders.scalaLong)
      .apply(key)

  /** Probe reads numHashes from the payload header — no parameter to
    * get wrong. */
  def bloom_might_contain(key: Column, bits: Column): Column =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expression(key), GraftBridge.expression(bits)))
}
