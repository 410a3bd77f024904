package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * canonicalization step that must run BEFORE any hash-keyed text
  * operator (exact dedup q17, paragraph dedup q152, fingerprints,
  * incremental dedup q153): `café` precomposed (U+00E9) and `cafe` +
  * combining acute (U+0301) are byte-different but canonically equal,
  * so unnormalized corpora silently under-dedup.
  *
  * Spark has no built-in NFC function (DuckDB ships `nfc_normalize`,
  * which the oracle uses — both sides implement the same Unicode
  * normalization standard, so outputs are byte-identical). A Scala UDF
  * would break whole-stage codegen and pay SerDe per row; this
  * expression stays inside the codegen span and fast-paths the
  * already-normalized case (ASCII and most real text) with
  * `Normalizer.isNormalized`, returning the INPUT UTF8String with zero
  * allocation — the scan-speed path for the overwhelmingly common
  * case.
  *
  * Null semantics: null in → null out (nullSafeEval / nullSafeCodeGen).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING input, got ${dt.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(
        str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("nfcStr")
      s"""
         |java.lang.String $tmp = $c.toString();
         |if (java.text.Normalizer.isNormalized(
         |    $tmp, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String
         |    .fromString(java.text.Normalizer.normalize(
         |      $tmp, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

/** Loop body of [[RollingTokenHash]], shared verbatim by eval and the
  * generated code (a plain object with no companion class, so the
  * static forwarder is guaranteed and Janino can call it as
  * `graft.functions.RollingHashImpl.compute`). Value-compatible with
  * the original HOF formulation
  * `aggregate(transform(toks, t -> pmod(xxhash64(t), P)), 0L,
  *            (acc, h) -> pmod(acc*31 + h, P))`:
  * XXH64.hashUTF8String(s, 42) IS Spark's `xxhash64(s)` (default seed
  * 42), and `Math.floorMod` IS `pmod` for positive modulus. P = 1e9+7
  * keeps acc*31 + h < 2^35 — no overflow. A null element hashes to
  * the untouched seed (42), matching xxhash64's skip-null semantics. */
object RollingHashImpl {
  final val P = 1000000007L
  def compute(arr: ArrayData): Long = {
    var acc = 0L
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val h =
        if (arr.isNullAt(j)) 42L
        else Math.floorMod(XXH64.hashUTF8String(arr.getUTF8String(j), 42L), P)
      acc = Math.floorMod(acc * 31L + h, P)
      j += 1
    }
    acc
  }
}

/** Polynomial rolling hash (base 31, mod 1e9+7) over a token array —
  * the whole-document fingerprint [[graft.operators.TextAnalysis
  * .rollingFingerprint]] exposes. Replaces the aggregate+transform
  * HOF form: Spark evaluates HOF lambdas INTERPRETED (xxhash64 inside
  * a lambda was the measured-worst shape of the round-14 profile), so
  * the per-token fold is a native expression whose generated code is
  * one static call into [[RollingHashImpl]] — the row stays inside
  * the WholeStageCodegen span and the loop JITs. */
case class RollingTokenHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING> input, got ${dt.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_token_hash"

  override def nullSafeEval(arr: Any): Any =
    RollingHashImpl.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashImpl.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): RollingTokenHash = copy(child = newChild)
}

/** Loop body of [[GramRepetitionStats]] (plain object — static
  * forwarder guaranteed for Janino). One O(n) pass per document:
  * exact per-doc gram counts in local hash maps over the TRUE gram
  * strings (no fingerprint-collision caveat — strings never leave the
  * row, so exactness is free here). Gram strings are space-joined;
  * tokens come from split(text, " ") so they never contain the
  * separator and the join is injective. tri_tot ≡ n−2 (every trigram
  * occurrence counts), so only the distinct-set needs a map. */
object GramRepImpl {
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    val uni = new java.util.HashMap[String, Integer](n * 2)
    var topTok = 0
    i = 0
    while (i < n) {
      val c: Int = uni.merge(toks(i), 1, (a, b) => a + b)
      if (c > topTok) topTok = c
      i += 1
    }
    val bi = new java.util.HashMap[String, Integer](n * 2)
    var topBi = 0
    i = 0
    while (i < n - 1) {
      val c: Int = bi.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
      if (c > topBi) topBi = c
      i += 1
    }
    val tri = new java.util.HashSet[String](n * 2)
    i = 0
    while (i < n - 2) {
      tri.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      topTok.toLong, topBi.toLong, tri.size.toLong, (n - 2).toLong))
  }
}

/** Per-document Gopher repetition statistics
  * (struct<top_tok,top_bi,tri_dist,tri_tot>, all LONG) for
  * [[graft.operators.TextAnalysis.repetitionStats]] (q94).
  *
  * The 100 TB design point: these statistics are PER-DOCUMENT, so no
  * cross-row aggregation exists in the problem — yet the previous two
  * formulations both paid a corpus-wide shuffle of ~3 rows per token
  * into a high-cardinality (doc, kind, gram) hash aggregate. Measured
  * at sf1: the interpreted transform-lambda form 13.9 s, the codegen
  * explode+inline window-stream form 8.8 s (generation fixed, the
  * gram shuffle remained the floor). This expression computes all
  * three counts in one JIT'd O(n) pass inside the row — the query
  * becomes scan → project, embarrassingly parallel, ZERO exchanges
  * except the final report sort.
  *
  * Memory: per-row state is O(distinct grams of ONE document) — the
  * same order as the row's own token array, and strictly smaller than
  * what any per-doc grouping (collect_list, decode) would hold;
  * upstream chunking bounds document length at corpus scale. Not the
  * per-row NESTED-LOOP HOF form the original scaladoc warned against
  * (that was O(n²) per doc; this is O(n) with local maps). */
case class GramRepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING> input, got ${dt.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("top_tok", LongType, nullable = false),
    StructField("top_bi", LongType, nullable = false),
    StructField("tri_dist", LongType, nullable = false),
    StructField("tri_tot", LongType, nullable = false)))

  override def prettyName: String = "gram_repetition_stats"

  override def nullSafeEval(arr: Any): Any =
    GramRepImpl.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramRepImpl.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): GramRepetitionStats = copy(child = newChild)
}

object TextFunctions {
  /** Column API for [[NfcNormalize]]. */
  def nfc_normalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))

  /** Column API for [[RollingTokenHash]]. */
  def rolling_token_hash(c: Column): Column =
    GraftBridge.column(RollingTokenHash(GraftBridge.expression(c)))

  /** Column API for [[GramRepetitionStats]]. */
  def gram_repetition_stats(c: Column): Column =
    GraftBridge.column(GramRepetitionStats(GraftBridge.expression(c)))
}
