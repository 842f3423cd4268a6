package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Int8 embedding quantization — the standard storage/bandwidth
  * reduction for large embedding corpora (float32 → int8 is 4×; at
  * 100 TB of vectors that is the difference between spilling and
  * fitting the working set in executor memory / page cache).
  *
  * Scheme: per-vector symmetric linear quantization, the shape used
  * by FAISS's `ScalarQuantizer` (QT_8bit_direct family) and the
  * int8 paths of public vector stores:
  *
  *   scale = max_i |x_i| / 127
  *   q_i   = clamp(round(x_i / scale), -127, 127)     (q_i = 0 when scale = 0)
  *
  * Properties this module relies on and tests assert:
  *  - reconstruction `q_i * scale` is within `scale/2` of `x_i`
  *    (round-half bound), so mean-abs-error ≤ scale/2;
  *  - cosine over quantized vectors needs NO dequantization — the
  *    per-vector scales cancel: dot(qa,qb)·sa·sb / (‖qa‖sa·‖qb‖sb)
  *    = dot(qa,qb)/(‖qa‖‖qb‖). Search runs on pure int math;
  *  - int products are ≤ 127² and dims are small, so sums of
  *    products are integer-exact in double REGARDLESS of summation
  *    order — the quantized similarity is portable across engines
  *    with no decimal-accumulation tricks.
  *
  * All arithmetic is declarative (transform/aggregate HOFs + the
  * codegen'd graft_dot kernel) — one projection, no shuffle; the
  * only shuffle in [[searchQuantized]] is the final per-query top-k.
  */
object Quantize {

  /** See Dedup.spread — parallelize vector math past a single-file
    * scan. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Per-vector symmetric int8 scale: max|x|/127 as double. */
  private def scaleOf(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double")))) / lit(127.0)

  /** Int8 codes as array<float> (ints ≤127 are float-exact), ready
    * for the graft_dot kernel — the column form other operators
    * (e.g. [[ivfSearchQuantized]]) compose with. */
  def codesF(emb: Column): Column =
    quantize(emb, scaleOf(emb)).cast("array<float>")

  /** Quantized vector as array<int> in [-127, 127]; all-zero when the
    * input vector is all-zero (scale 0 guard). round() is HALF_UP
    * (away from zero) in both Spark and the oracle engine, so the
    * codes are engine-exact. */
  private def quantize(emb: Column, scale: Column): Column =
    transform(emb, x =>
      when(scale === 0.0, lit(0))
        .otherwise(greatest(lit(-127.0),
          least(lit(127.0), round(x.cast("double") / scale, 0))))
        .cast("int"))

  /** Quantization report per vector: the int8 codes plus the numbers
    * a pipeline QA step checks — integer squared norm (exact), the
    * scale, and the mean absolute reconstruction error. The error
    * accumulates in DECIMAL so the sum is summation-order independent
    * (engine-portable); see Portable's exactSum convention. */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val sc = scaleOf(col("embedding"))
    spread(emb)
      .withColumn("scale", sc)
      .withColumn("qvec", quantize(col("embedding"), col("scale")))
      .select(
        col("vec_id"),
        col("qvec"),
        round(col("scale"), 8).as("scale8"),
        aggregate(col("qvec"), lit(0L), (acc, v) => acc + v * v)
          .as("q_norm2"),
        round(
          aggregate(
            zip_with(col("embedding"), col("qvec"),
              (x, q) => abs(x.cast("double") - q * col("scale"))
                .cast("decimal(28,18)")),
            lit(new java.math.BigDecimal(0)).cast("decimal(28,18)"),
            (acc, e) => (acc + e).cast("decimal(28,18)"))
            .cast("double") / size(col("qvec")), 8)
          .as("mae8"))
  }

  /** Matryoshka (MRL) prefix search: top-k cosine over only the FIRST
    * `dims` components (Kusupati et al., "Matryoshka representation
    * learning", NeurIPS 2022 — prefixes of an MRL-trained embedding
    * are themselves valid embeddings). The funnel pattern at scale:
    * a dims/full fraction of the scan bandwidth ranks a candidate
    * pool, the full vector only re-scores survivors. Cosine over a
    * slice needs no re-normalization — the prefix norms ARE the
    * normalizer. Same contract as [[Knn.bruteForce]] (queries =
    * vec_id < nQueries, deterministic tiebreak). */
  def searchPrefix(emb: DataFrame, dims: Int, nQueries: Int = 5,
                   k: Int = 5): DataFrame = {
    require(dims >= 1, "dims must be >= 1")
    val cut = spread(emb)
      .select(col("vec_id"),
        slice(col("embedding"), 1, dims).as("pvec"))
    val q = cut.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("pvec").as("qq"))
    val scored = cut.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Portable.cosine(col("qq"), col("pvec")).as("pcos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("pcos"))
  }

  /** IVF + int8 — the FAISS `IVFSQ8` shape, the standard
    * billion-scale ANN configuration: coarse cells are assigned in
    * FULL precision (training-side work, done once), while the
    * in-cell scan — the part that touches the whole corpus per
    * query — runs on int8 codes. At 100 TB that is 1/nlist of the
    * data per probe × 4× less bandwidth per vector read. Scales
    * cancel in cosine, so the in-cell scoring is pure integer math
    * with no dequantization (see [[searchQuantized]]). */
  def ivfSearchQuantized(emb: DataFrame, nQueries: Int = 5, k: Int = 3,
                         nlist: Int = 16): DataFrame = {
    val q8 = spread(emb).select(col("vec_id"), codesF(col("embedding")).as("qv"))
    val assigned = Knn.ivfAssign(emb, nlist)
      .select(col("vec_id"), col("centroid_id"))
      .join(q8, "vec_id")
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("centroid_id").as("qcell"),
        col("qv").as("qq"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("vec_id"))
    assigned
      .join(broadcast(q), col("centroid_id") === col("qcell") &&
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(Portable.dot(col("qq"), col("qv")) /
          (sqrt(Portable.dot(col("qq"), col("qq"))) *
           sqrt(Portable.dot(col("qv"), col("qv")))), 4).as("qcos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("qcos"))
  }

  /** The MRL funnel composed: [[searchPrefix]] ranks a `pool`-sized
    * candidate set per query on the first `dims` components, then ONLY
    * those candidates are re-scored with the full vector. At scale the
    * full-width data is touched for pool·nQueries rows instead of the
    * corpus — the candidate join is id-keyed, the query set broadcasts.
    * Exactness is per-stage (the funnel is deterministic, so the
    * oracle replays both stages); recall vs brute force is governed by
    * `pool`, spec-checked. */
  def searchFunnel(emb: DataFrame, dims: Int = 16, pool: Int = 50,
                   nQueries: Int = 5, k: Int = 5): DataFrame = {
    require(pool >= k, "pool must be at least k")
    val cand = searchPrefix(emb, dims, nQueries, k = pool)
      .select(col("qid"), col("vec_id"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = cand
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("vec_id"),
        Portable.cosine(col("qvec"), col("embedding")).as("cos_sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("cos_sim"))
  }

  /** Brute-force top-k cosine in the QUANTIZED space: scales cancel,
    * so this is integer dot / integer norms — exact, portable, and
    * 4× lighter on memory bandwidth than the float path. Mirrors
    * [[Knn.bruteForce]]'s contract (queries = vec_id < nQueries,
    * deterministic vec_id tiebreak). An all-zero vector has norm 0
    * and divides to IEEE ±Infinity/NaN — identically in Spark and
    * the oracle engine (both evaluate the same op tree), so even the
    * degenerate case stays hash-stable; filter zero vectors upstream
    * if they can occur. */
  def searchQuantized(emb: DataFrame, nQueries: Int = 5, k: Int = 5)
      : DataFrame = {
    val q8 = spread(emb)
      .select(col("vec_id"),
        quantize(col("embedding"), scaleOf(col("embedding")))
          .cast("array<float>").as("qvec"))
    val q = q8.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("qvec").as("qq"))
    val scored = q8.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(Portable.dot(col("qq"), col("qvec")) /
          (sqrt(Portable.dot(col("qq"), col("qq"))) *
           sqrt(Portable.dot(col("qvec"), col("qvec")))), 4)
          .as("qcos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("qcos"))
  }
}
