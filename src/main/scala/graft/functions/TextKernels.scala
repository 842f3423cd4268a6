package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row text kernels (same rationale as [[MinHashSig]]:
  * higher-order-function lambdas evaluate interpreted per element;
  * these run one compiled call per document). Values are defined to
  * be bit-identical to the declarative/oracle formulations. */

/** Word 3-gram shingles of a token array — identical strings to
  * `transform(sequence(...), i -> concat_ws(" ", slice(toks,i+1,3)))`.
  * Empty array for docs with fewer than 3 tokens. */
case class ShingleArray(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val words = Array.tabulate(n)(i => toks.getUTF8String(i).toString)
    val out = new Array[Any](n - 2)
    var i = 0
    while (i <= n - 3) {
      out(i) = UTF8String.fromString(
        words(i) + " " + words(i + 1) + " " + words(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShingleArray =
    copy(child = c)
}

/** 16-bit SimHash of a token array — identical bitstring to the
  * explode + 16-conditional-sum aggregation: bit i votes +1 when hex
  * digit i of md5(token) has its top bit set, −1 otherwise; output
  * char i is '1' iff the sum is positive. NULL for empty input. */
case class SimHashBits(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0) return null
    val md = MessageDigest.getInstance("MD5")
    val sums = new Array[Int](16)
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(toks.getUTF8String(i).getBytes)
      var b = 0
      while (b < 16) {
        // hex digit b = high nibble of byte b/2 (even b) or low (odd);
        // top bit of the nibble decides the vote
        val nibble =
          if ((b & 1) == 0) (digest(b / 2) >> 4) & 0xf
          else digest(b / 2) & 0xf
        sums(b) += (if ((nibble & 0x8) != 0) 1 else -1)
        b += 1
      }
      i += 1
    }
    val bits = new Array[Char](16)
    var b = 0
    while (b < 16) {
      bits(b) = if (sums(b) > 0) '1' else '0'
      b += 1
    }
    UTF8String.fromString(new String(bits))
  }

  override protected def withNewChildInternal(c: Expression): SimHashBits =
    copy(child = c)
}
