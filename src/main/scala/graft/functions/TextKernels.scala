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

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  * "Winnowing: local algorithms for document fingerprinting", SIGMOD
  * 2003): hash every k-char gram (first 8 hex of md5), then select
  * the minimum of every w-window of consecutive gram hashes. Returns
  * the SORTED DISTINCT selected hashes; NULL when the text is too
  * short for one full window (n < k + w − 1). One compiled call per
  * document (HOF/explode forms evaluate interpreted per element). */
case class WinnowSelect(child: Expression, k: Int = 8, w: Int = 4)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    val g = text.length - k + 1 // gram count
    if (g < w) return null
    val md = MessageDigest.getInstance("MD5")
    val grams = new Array[String](g)
    var i = 0
    while (i < g) {
      md.reset()
      grams(i) = MinHashSig.toHex(
        md.digest(text.substring(i, i + k).getBytes("UTF-8"))).substring(0, 8)
      i += 1
    }
    val selected = scala.collection.mutable.SortedSet.empty[String]
    var j = 0
    while (j <= g - w) {
      var m = grams(j)
      var t = j + 1
      while (t < j + w) {
        if (grams(t) < m) m = grams(t)
        t += 1
      }
      selected += m
      j += 1
    }
    new GenericArrayData(
      selected.toArray.map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildInternal(c: Expression): WinnowSelect =
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
