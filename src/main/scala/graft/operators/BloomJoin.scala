package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the standard way to cut a big
  * join's shuffle at scale: build a compact membership filter over the
  * dimension keys (distributed partial aggregation, ≤ numBits/8 bytes
  * of state per partition), ship it to every fact-side task as a plan
  * literal, and drop non-matching fact rows BEFORE the exchange. The
  * exact join that follows only sees surviving rows, so the shuffle
  * volume scales with the match rate + false-positive rate instead of
  * the full fact table. Same technique as Bloom runtime filters in
  * modern warehouses and Spark's own `spark.sql.optimizer.
  * runtimeFilter.bloomFilter.enabled` — implemented here explicitly so
  * the pruning composes with any graft operator and stays portable.
  *
  * Hashing is the repo's md5 convention (see functions.Portable):
  * h1/h2 = two 32-bit md5-prefix words, probe i = (h1 + i*h2) mod
  * numBits (Kirsch & Mitzenmacher, "Less hashing, same performance",
  * ESA 2006). The JVM build side and the Catalyst probe side compute
  * the identical function, so the filter has NO false negatives by
  * construction — asserted in the spec, and the final semi-join makes
  * the composition exact regardless of false positives.
  */
object BloomJoin {

  /** Long-words buffer for `numBits` bits. */
  private def numWords(numBits: Int): Int = (numBits + 63) >>> 6

  /** JVM-side probe positions for `key` — must mirror [[probeBit]]. */
  private[graft] def positions(key: String, numBits: Int,
                                   numHashes: Int): Seq[Long] = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(key.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
    (0 until numHashes).map(i => (h1 + i.toLong * h2) % numBits.toLong)
  }

  /** Distributed Bloom build as a typed [[Aggregator]]: partial
    * buffers OR together, so the exchange carries one bit array per
    * partition, never the keys. */
  class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
    require(numBits >= 64, "need numBits >= 64")
    require(numHashes >= 1 && numHashes <= 16, "need 1 <= numHashes <= 16")

    override def zero: Array[Long] = new Array[Long](numWords(numBits))

    override def reduce(b: Array[Long], key: String): Array[Long] = {
      positions(key, numBits, numHashes).foreach { p =>
        b((p >>> 6).toInt) |= 1L << (p & 63)
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    // collected on the driver and re-shipped as a literal — kryo is fine
    override def outputEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  }

  /** Build the filter over `dim`'s `keyCol` (cast to string — probe
    * keys must cast identically). Returns the driver-side bit words:
    * numBits/8 bytes, e.g. 128 KiB for 2^20 bits. */
  def build(dim: DataFrame, keyCol: String, numBits: Int,
            numHashes: Int): Array[Long] = {
    val spark = dim.sparkSession
    import spark.implicits._
    dim.select(col(keyCol).cast("string")).na.drop().as[String]
      .select(new BloomAgg(numBits, numHashes).toColumn)
      .head()
  }

  /** Catalyst-side membership probe — codegen expressions only, so it
    * runs inside whole-stage codegen and pushes no UDF into the hot
    * path. The (h1, h2) double-hash pair is the unsigned high/low
    * half of ONE native `graft_hash64` digest (same value as the two
    * hex-substring parses it replaces; codegen subexpression
    * elimination evaluates the shared digest once). NULL keys probe
    * as NULL and are filtered out (SQL semi-join semantics). */
  def mightContain(bits: Array[Long], key: Column, numBits: Int,
                   numHashes: Int): Column = {
    val bitsCol = typedLit(bits)
    val h64 = call_function("graft_hash64", key.cast("string"))
    val h1 = shiftrightunsigned(h64, 32)
    val h2 = h64.bitwiseAND(lit(0xFFFFFFFFL))
    (0 until numHashes).map { i =>
      val idx = pmod(h1 + lit(i.toLong) * h2, lit(numBits.toLong))
      val word = element_at(bitsCol, (idx / 64).cast("int") + 1)
      // variable-distance shift: the SQL shiftright accepts an
      // expression distance (the Scala wrapper only takes Int)
      call_function("shiftright", word, pmod(idx, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Exact left-semi join with Bloom pre-pruning of the fact side.
    * Result is IDENTICAL to `fact.join(dim, fact(factKey) ===
    * dim(dimKey), "left_semi")` — the filter only removes rows the
    * join would drop anyway (no false negatives); false positives are
    * caught by the exact join. */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bits = build(dim, dimKey, numBits, numHashes)
    fact.filter(mightContain(bits, col(factKey), numBits, numHashes))
      .join(dim, fact(factKey) === dim(dimKey), "left_semi")
  }
}
