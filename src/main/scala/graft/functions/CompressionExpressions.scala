package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the DEFLATE-compressed byte length
  * of a string — the primitive behind the compression-ratio quality
  * filter (Gopher/RedPajama class): templated or repeated text
  * compresses far better than natural prose, so bytes/deflate_bytes
  * is a cheap, language-agnostic repetitiveness signal that catches
  * what token-level heuristics (q94's n-gram repetition) miss —
  * character-level and structural repetition.
  *
  * Spark has no built-in compression scalar; a Scala UDF would break
  * whole-stage codegen and pay SerDe per row. The expression calls
  * one static JVM helper ([[CompressionFunctions.deflateLen]], raw
  * DEFLATE, fixed level, fixed strategy — deterministic for a given
  * zlib/JVM) on the input's UTF-8 bytes and stays inside the codegen
  * span. No DuckDB twin exists, so the declared query is rows-only by
  * convention; TextSpec pins exact equality against a driver-side
  * java.util.zip reference, determinism, and the
  * repetitive-vs-diverse ordering. Null in → null out. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING input, got ${dt.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "deflate_len"

  override def nullSafeEval(s: Any): Any =
    CompressionFunctions.deflateLen(
      s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CompressionFunctions" +
        s".deflateLen($c.getBytes());")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateLen = copy(child = newChild)
}

object CompressionFunctions {

  // per-row native Deflater construction/teardown would rival the
  // compression work itself on short documents; a thread-local
  // instance reset() per call keeps the hot path allocation-free
  // (bounded native state: one Deflater + 8 KB buffer per executor
  // thread) with identical deterministic output (same level,
  // strategy, and zlib)
  private val localDeflater =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(6, true))
  private val localBuf =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  /** Raw-DEFLATE (nowrap) length at fixed level 6 / default strategy.
    * Deterministic for a given JVM's zlib. */
  def deflateLen(bytes: Array[Byte]): Int = {
    val d = localDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = localBuf.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column API for [[DeflateLen]]. */
  def deflate_len(c: Column): Column =
    GraftBridge.column(DeflateLen(GraftBridge.expression(c)))
}
