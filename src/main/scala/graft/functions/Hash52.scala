package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the repo's portable 52-bit hash: the value of
  * `conv(substring(md5(s), 1, 13), 16, 10)` computed directly from
  * the raw digest bytes — the md5 is the SAME (bit-identical in every
  * engine, which is the whole point of the portability contract), but
  * the hex-string round trip is gone: the declarative chain
  * materializes a 32-char hex string per row, substrings it, then
  * radix-parses it back to a long, which measured ~2 s of
  * profile_lineitem's 3.8 s at sf0.1 (4 hashed columns × 600 K rows).
  * Here the first 6½ digest bytes shift straight into the long.
  *
  * A real `doGenCode` (not CodegenFallback): the call compiles into
  * whole-stage codegen as one static invoke, so hash-heavy pipelines
  * (profiling, KMV sketches, fold/shard assignment, count-min) keep
  * their scan fused. The DuckDB oracle keeps its
  * `CAST('0x' || substr(md5(x), 1, 13) AS BIGINT)` mirror — values
  * are identical (asserted against the declarative reference in
  * PortableSpec over random inputs).
  */
case class Hash52(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash52"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    Hash52.digest52(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash52$$.MODULE$$.digest52($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash52 =
    copy(child = newChild)
}

/** [[Hash52]]'s 64-bit sibling: the first 16 hex digits of md5 as one
  * long (bytes 0-7 big-endian; may be negative as a signed long). Its
  * unsigned high/low 32-bit halves are the classic double-hash pair
  * (h1, h2) — [[graft.operators.BloomJoin]] derives both from ONE
  * digest with two shifts instead of two hex-substring parses. */
case class Hash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    Hash52.digest64(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash52$$.MODULE$$.digest64($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash64 =
    copy(child = newChild)
}

object Hash52 {
  // MessageDigest is stateful; one instance per thread, reset per use
  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 13 hex digits of md5(s) as a long: bytes 0-5 contribute 8
    * bits each, byte 6 its high nibble — 52 bits total. */
  def digest52(s: UTF8String): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 44) | ((d(1) & 0xFFL) << 36) |
      ((d(2) & 0xFFL) << 28) | ((d(3) & 0xFFL) << 20) |
      ((d(4) & 0xFFL) << 12) | ((d(5) & 0xFFL) << 4) |
      ((d(6) & 0xF0L) >>> 4)
  }

  /** First 16 hex digits of md5(s) as one (possibly negative) long. */
  def digest64(s: UTF8String): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
  }
}
