package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane LSH signature of an `array<float>` embedding in
  * one compiled per-row call — the kernel form of
  * `Knn.rpLshBucketsHof`'s declarative zip_with/aggregate chain,
  * which Spark evaluates interpreted per element (nPlanes × dim
  * lambda invocations per row).
  *
  * Bit p = sign(embedding · plane_p) where the plane weights
  * regenerate the portable md5("p:d") formula and each product is
  * rounded to DECIMAL scale 18 (BigDecimal.valueOf ≡ Spark's
  * double→decimal cast) before an exact decimal accumulation — the
  * same arithmetic as the declarative form, so buckets are
  * bit-identical to it and to the DuckDB oracle's order-independent
  * decimal sum.
  *
  * A row whose vector length differs from `dim` or contains a null
  * element yields null plane sums in the declarative form, whose
  * `s >= 0` test is null → every bit renders '0'; the kernel
  * reproduces that. */
case class RpLshBits(child: Expression, nPlanes: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_rplsh"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  @transient private lazy val planes: Array[Array[Double]] =
    RpLshBits.planeWeights(nPlanes, dim)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Char](nPlanes)
    var degenerate = arr.numElements() != dim
    var d = 0
    while (!degenerate && d < dim) {
      if (arr.isNullAt(d)) degenerate = true
      d += 1
    }
    if (degenerate) {
      java.util.Arrays.fill(out, '0')
    } else {
      var p = 0
      while (p < nPlanes) {
        val w = planes(p)
        var acc = JBigDecimal.ZERO
        var i = 0
        while (i < dim) {
          acc = acc.add(JBigDecimal
            .valueOf(arr.getFloat(i).toDouble * w(i))
            .setScale(18, RoundingMode.HALF_UP))
          i += 1
        }
        out(p) = if (acc.signum() >= 0) '1' else '0'
        p += 1
      }
    }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(c: Expression): RpLshBits =
    copy(child = c)
}

object RpLshBits {

  /** Pseudo-random hyperplane weights from the portable 52-bit md5
    * prefix of "plane:dim" — any engine regenerates them exactly.
    * w ∈ [-1, 1). */
  def planeWeights(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = MinHashSig.toHex(md.digest(s"$p:$d".getBytes("UTF-8")))
      java.lang.Long.parseLong(hex.take(13), 16).toDouble /
        4503599627370496.0 * 2.0 - 1.0
    }
}
