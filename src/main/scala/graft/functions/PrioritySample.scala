package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Priority sampling as a typed [[Aggregator]] — the AGGREGATE form
  * of [[graft.operators.Sampling.weightedTopK]]: keep the k rows with
  * the highest priorities, where the caller supplies priority = w/u
  * per row (see weightedTopK for why that formula is deterministic
  * and engine-exact). Because it is an aggregate, it composes where
  * the plan-level top-k cannot:
  *
  *  - `groupBy(stratum).agg(...)` — per-group weighted samples in ONE
  *    aggregation pass (no window, no rank filter);
  *  - streaming `groupBy(...).agg(...)` in update/complete mode — a
  *    weighted sample OVER AN UNBOUNDED STREAM with bounded state;
  *  - partial aggregation — the exchange carries ≤ k (id, priority)
  *    pairs per partition, like [[KmvSketch]] and [[MisraGries]].
  *
  * Buffer = descending-sorted array capped at k, ties broken by id
  * ascending, so the kept set is identical under any merge order and
  * any partitioning (asserted in the spec).
  */
class PrioritySample(k: Int)
  extends Aggregator[(String, Double), Seq[(Double, String)],
                     Seq[(String, Double)]] {
  require(k >= 1, "PrioritySample needs k >= 1")

  /** Total order: higher priority first, then smaller id. */
  private def before(a: (Double, String), b: (Double, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, String)] = Vector.empty

  override def reduce(b: Seq[(Double, String)],
                      in: (String, Double)): Seq[(Double, String)] = {
    val e = (in._2, in._1)
    if (b.size >= k && !before(e, b.last)) b
    else {
      val i = b.indexWhere(x => before(e, x)) match {
        case -1 => b.size
        case n  => n
      }
      (b.take(i) :+ e) ++ b.drop(i).take(k - i - 1)
    }
  }

  override def merge(a: Seq[(Double, String)],
                     b: Seq[(Double, String)]): Seq[(Double, String)] = {
    // merge two sorted runs, keep the first k
    val out = Vector.newBuilder[(Double, String)]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && before(a(i), b(j)))
      out += (if (takeA) a(i) else b(j))
      if (takeA) i += 1 else j += 1
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Double, String)]): Seq[(String, Double)] =
    r.map { case (p, id) => (id, p) }

  override def bufferEncoder: Encoder[Seq[(Double, String)]] =
    Encoders.kryo[Seq[(Double, String)]]
  // real array<struct<id,priority>> so callers can explode the sample
  override def outputEncoder: Encoder[Seq[(String, Double)]] =
    ExpressionEncoder[Seq[(String, Double)]]()
}
