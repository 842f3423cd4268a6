package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass heatmap fusion (SURVEY §2.9): per-position counts AND
  * the global intensity ceiling in one typed aggregation, instead of
  * the composed groupBy(x,y).count + second max pass.
  *
  * A `TypedImperativeAggregate`-style mutable buffer via the public
  * `Aggregator` API: buffer = position→count map (kryo-encoded),
  * merge = map union, finish = sorted point list + max. Partial
  * aggregation still applies — executors reduce locally and merge
  * maps at the exchange, so the shuffle carries one map per partition,
  * not raw positions.
  *
  * The composed plan remains the default (it's whole-stage-codegen'd
  * and AQE-planned); this exists for the read path that wants both
  * outputs without two jobs — the reference's heatmap render consumes
  * exactly this pair (functions.js:393-409).
  */
object HeatmapAggregator
    extends Aggregator[(Int, Int), mutable.HashMap[(Int, Int), Long], HeatmapData] {

  override def zero: mutable.HashMap[(Int, Int), Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[(Int, Int), Long],
                      pos: (Int, Int)): mutable.HashMap[(Int, Int), Long] = {
    b.update(pos, b.getOrElse(pos, 0L) + 1L)
    b
  }

  override def merge(b1: mutable.HashMap[(Int, Int), Long],
                     b2: mutable.HashMap[(Int, Int), Long]): mutable.HashMap[(Int, Int), Long] = {
    b2.foreach { case (k, v) => b1.update(k, b1.getOrElse(k, 0L) + v) }
    b1
  }

  override def finish(b: mutable.HashMap[(Int, Int), Long]): HeatmapData = {
    val pts = b.toSeq.map { case ((x, y), v) => HeatPoint(x, y, v) }
      .sortBy(p => (p.x, p.y))
    HeatmapData(pts, if (pts.isEmpty) 0L else pts.map(_.value).max)
  }

  override def bufferEncoder: Encoder[mutable.HashMap[(Int, Int), Long]] =
    Encoders.kryo[mutable.HashMap[(Int, Int), Long]]

  override def outputEncoder: Encoder[HeatmapData] =
    Encoders.product[HeatmapData]
}

case class HeatPoint(x: Int, y: Int, value: Long)

/** The heatmap render payload: point list + intensity ceiling
  * (functions.js:393-409). */
case class HeatmapData(points: Seq[HeatPoint], max: Long)
