package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * [[Aggregator]] — the bounded-state alternative to
  * `collect_set`-then-count (whose partial state is the full distinct
  * set) and the PORTABLE alternative to `approx_count_distinct`
  * (HLL++, whose registers are engine-specific and unverifiable
  * against another engine).
  *
  * Estimator from the k smallest distinct uniform hashes: with
  * u_k = kth-min / 2^52, the distinct count ≈ (k-1)/u_k (Bar-Yossef
  * et al., "Counting distinct elements in a data stream", RANDOM
  * 2002). Hash = first 13 hex chars of md5 (52 bits: inside the
  * double-exact integer range and bit-identical in every engine), so
  * the estimate is DETERMINISTIC and value-exact reproducible in the
  * DuckDB oracle via a full sort — a sketch whose correctness gate is
  * a hash match, not a tolerance band.
  *
  * Scale posture: buffer = sorted array of at most k longs; partial
  * aggregation applies, so the exchange carries ≤ 8k bytes per
  * (partition, group) regardless of cardinality. The k-smallest set
  * is order- and partitioning-independent, so results are identical
  * at any parallelism (asserted in the spec). Fewer than k distinct
  * hashes means the buffer IS the distinct set — the estimate is then
  * exact by construction.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, "KMV needs k >= 2")

  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(b: Array[Long], h: Long): Array[Long] =
    KmvSketch.insert(b, h, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvSketch.union(a, b, k)

  // The buffer holds DISTINCT sorted non-negative hashes, so
  // b(k-1) >= k-1 >= 1 whenever the full-buffer branch is taken — the
  // denominator cannot be zero for k >= 2 (enforced above). The
  // math.max is a defensive clamp only; it never changes a reachable
  // result, so the DuckDB oracle (plain division) stays value-exact.
  override def finish(b: Array[Long]): Double =
    if (b.length < k) b.length.toDouble
    else (k - 1).toDouble * KmvSketch.TwoPow52 / math.max(b(k - 1), 1L).toDouble

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** The k-min array itself, as a real `array<bigint>` column — the
  * MERGEABLE form of the sketch, for set algebra after aggregation:
  * the k-min arrays of two sets compose into the union's k-min set
  * (`array_union` + sort + slice), and membership overlap estimates
  * Jaccard (Beyer et al., "On synopses for distinct-value estimation
  * under multiset operations", SIGMOD 2007). See SparkEntry
  * `agg_kmv_jaccard` for the composed form with its value-exact
  * oracle. */
class KmvMins(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, "KMV needs k >= 2")
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(b: Array[Long], h: Long): Array[Long] =
    KmvSketch.insert(b, h, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvSketch.union(a, b, k)
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  // real array<bigint> output: downstream plans do array algebra on it
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
  /** Hash domain size: hashes are 52-bit md5 prefixes. */
  val TwoPow52: Double = 4503599627370496.0

  /** Insert `h` into the sorted distinct k-min array `b` (shared by
    * [[KmvSketch]] and [[KmvMins]]). */
  private[graft] def insert(b: Array[Long], h: Long, k: Int): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(b, h)
    if (idx >= 0) b // already tracked
    else {
      val ins = -idx - 1
      if (b.length >= k && ins >= k) b // larger than the current kth min
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  /** Merge two sorted distinct k-min arrays, keeping the k smallest. */
  private[graft] def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }
}
