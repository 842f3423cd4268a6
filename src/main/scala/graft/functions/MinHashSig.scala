package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a token array in one compiled per-row call:
  * word 3-gram shingles → 2 seeded md5 digests per shingle → minima
  * of 4 disjoint 32-bit hex lanes per digest = 8 signature values.
  *
  * Why an expression and not the declarative HOF chain: Spark
  * evaluates higher-order-function lambdas (transform/aggregate)
  * INTERPRETED, per element — the shingle build + digest + lane
  * slicing chain costs ~2.7 s for 5 K docs that way. This expression
  * is `CodegenFallback` (one interpreted call per ROW, not per
  * element) and runs the whole kernel as compiled Scala; MessageDigest
  * md5 is bit-identical to Spark's and DuckDB's, so the values are
  * unchanged (asserted in tests and by the oracle).
  *
  * Returns NULL for docs with fewer than 3 tokens (no shingles),
  * mirroring the "no signature" semantics.
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import MinHashSig._

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < NGram) return null
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[String](NumSeeds * LanesPerSeed)
    val words = Array.tabulate(n)(i => toks.getUTF8String(i).toString)
    var i = 0
    while (i <= n - NGram) {
      val shingle = new StringBuilder(words(i))
        .append(' ').append(words(i + 1))
        .append(' ').append(words(i + 2)).toString
      var s = 0
      while (s < NumSeeds) {
        md.reset()
        val hex = toHex(md.digest((s.toString + ":" + shingle)
          .getBytes("UTF-8")))
        var j = 0
        while (j < LanesPerSeed) {
          val lane = hex.substring(j * 8, j * 8 + 8)
          val idx = s * LanesPerSeed + j
          if (mins(idx) == null || lane < mins(idx)) mins(idx) = lane
          j += 1
        }
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString))
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  val NGram = 3
  val NumSeeds = 2
  val LanesPerSeed = 4

  private val HexChars = "0123456789abcdef".toCharArray

  def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = HexChars((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
