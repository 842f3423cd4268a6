package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** PERSISTED IVF index — the production ANN lifecycle the in-memory
  * searches ([[Knn.ivfSearch]] and friends) deliberately skip: at
  * 100 TB an index is built offline ONCE and probed by many later
  * jobs, so the artifact on disk, not the DataFrame lineage, is the
  * interface (FAISS's train/add/search split, re-expressed as
  * parquet + partition pruning).
  *
  *  - **build**: train centroids (deterministic Lloyd,
  *    [[Knn.kmeansCentroids]]), assign every vector once, write
  *    `centroids.parquet` plus the vectors PARTITIONED BY CELL —
  *    cell directories are the inverted lists.
  *  - **probe**: broadcast the (tiny) centroid table, rank `nprobe`
  *    cells per query, then join the query set against the vector
  *    table ON THE PARTITION COLUMN. Spark's dynamic partition
  *    pruning turns that join into "read only the probed cell
  *    directories" — the I/O shape that makes IVF an index instead
  *    of a rename of a full scan (plan-asserted in the spec).
  *
  * Cell selection uses the same L2 metric as the trained assignment
  * (probing must agree with how the lists were formed); candidate
  * scoring uses cosine with the deterministic (cos desc, vec_id)
  * tiebreak, the contract shared by every search in this package.
  */
object IvfIndex {

  /** Train + assign + write. One kmeans run serves both artifacts. */
  def build(emb: DataFrame, dir: String, k: Int = 8, iters: Int = 4): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = Knn.kmeansCentroids(emb, k, iters)
    cents.toDF("centroid_id", "cvec").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    // join the assignment back so EVERY metadata column of the input
    // (label, tenant, …) rides into the index — that's what makes
    // probe-time filters (vecFilter) possible without a second table
    writeCompacted(
      Knn.assignToCentroids(
          emb.select(col("vec_id"), col("embedding")), cents)
        .select(col("vec_id"), col("centroid_id").as("cell"))
        .join(emb, "vec_id"),
      dir)
  }

  /** Write one compacted file per cell directory: `repartition(cell)`
    * puts each cell wholly in one task, so the partitioned writer
    * emits exactly one file per cell — the layout [[cellStats]] and
    * [[shouldRebuild]] treat as "freshly built". Rows are stamped
    * `gen = 0` (base generation); [[append]] stamps `gen = 1`, which
    * is what makes the add-log share measurable without a manifest. */
  private def writeCompacted(assigned: DataFrame, dir: String): Unit =
    assigned
      .withColumn("gen", lit(0))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/vectors.parquet")

  /** FAISS's `add` half — delta ingest into a BUILT index: assign a
    * new batch to the FROZEN trained centroids and append it into the
    * stored cell partitions. Parquet append writes new files only
    * under the cell directories the batch lands in; nothing existing
    * is rewritten, so the index stays probe-able throughout (readers
    * see whole files). Centroids never move on append — probing must
    * agree with how the lists were formed — so centroid drift is
    * handled by a periodic [[build]] rebuild, not here. Works per
    * micro-batch inside `foreachBatch` (the streaming embedding
    * ingest shape; spec-driven). Caller contract: vec_ids disjoint
    * from the stored index (the dedupDelta convention), and append
    * serialized against [[publishRebuild]] (see its writer-writer
    * contract — a racing rebuild aborts rather than lose the rows). */
  def append(spark: SparkSession, dir: String, delta: DataFrame): Unit = {
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)
    Knn.assignToCentroids(
        delta.select(col("vec_id"), col("embedding")), cents)
      .select(col("vec_id"), col("centroid_id").as("cell"))
      .join(delta, "vec_id")
      .withColumn("gen", lit(1)) // add-log generation, vs build's 0
      .write.mode("append").partitionBy("cell")
      .parquet(s"$dir/vectors.parquet")
  }

  /** Per-cell physical report — the observability half of index
    * maintenance: rows, add-log rows (`gen > 0`), and file count per
    * cell directory (via the scan's `_metadata.file_path`, so the
    * report reads footers + one column, not the vectors). Small-file
    * growth and add-log share are the two signals [[shouldRebuild]]
    * triggers on. */
  def cellStats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/vectors.parquet")
      .select(col("cell"), col("gen"),
        col("_metadata.file_path").as("fp"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("gen") > 0, 1L).otherwise(0L)).as("n_delta"),
        countDistinct(col("fp")).as("n_files"))

  /** The FAISS-style maintenance rule ("retrain when the add-log is a
    * given share of the base"): rebuild when appended rows exceed
    * `maxDeltaFrac` of the index, OR any cell has accumulated more
    * than `maxFilesPerCell` files (the small-file signal — each
    * append writes at least one file per touched cell, and a scan's
    * task count grows with files). One tiny aggregate over
    * [[cellStats]]; the decision is a driver Boolean because the
    * caller is an orchestration loop, not a query. */
  def shouldRebuild(spark: SparkSession, dir: String,
                    maxDeltaFrac: Double = 0.2,
                    maxFilesPerCell: Int = 16): Boolean = {
    // coalesce BEFORE the getLongs: an empty index (zero-row
    // cellStats) aggregates to nulls, and the null must become 0
    // before extraction or the guard below never gets to short-circuit
    val r = cellStats(spark, dir)
      .agg(coalesce(sum(col("n_rows")), lit(0L)).as("rows"),
        coalesce(sum(col("n_delta")), lit(0L)).as("delta"),
        coalesce(max(col("n_files")), lit(0L)).as("mf"))
      .head()
    val (rows, delta, mf) = (r.getLong(0), r.getLong(1), r.getLong(2))
    rows > 0 && (delta.toDouble / rows > maxDeltaFrac || mf > maxFilesPerCell)
  }

  /** Compact + retrain — the maintenance step [[append]] defers to:
    * re-run Lloyd over everything stored (base + add-log), reassign,
    * and rewrite one file per cell at `gen = 0`. After it, the index
    * is INDISTINGUISHABLE from a fresh [[build]] over the same
    * vectors ([[Knn.kmeansCentroids]] is deterministic on its input,
    * so same vectors → same init → same centroids → same cells; the
    * spec asserts probe parity). The stored relation is materialized
    * (`localCheckpoint`) before the overwrite so the rewrite never
    * reads the files it is replacing. This in-place form assumes a
    * maintenance window; [[publishRebuild]] is the non-disruptive
    * variant — it writes the retrained index as a NEW snapshot
    * generation and atomically swaps a pointer, so concurrent probes
    * never observe a half-written index. */
  def rebuild(spark: SparkSession, dir: String, k: Int = 8,
              iters: Int = 4): Unit = {
    val stored = spark.read.parquet(s"$dir/vectors.parquet")
      .drop("cell", "gen")
      .localCheckpoint()
    val cents = Knn.kmeansCentroids(stored, k, iters)
    import spark.implicits._
    cents.toDF("centroid_id", "cvec").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    writeCompacted(
      Knn.assignToCentroids(
          stored.select(col("vec_id"), col("embedding")), cents)
        .select(col("vec_id"), col("centroid_id").as("cell"))
        .join(stored, "vec_id"),
      dir)
  }

  // ------------------------------------------------------------------
  // SNAPSHOT-VERSIONED root — rebuild without blocking probes.
  //
  // [[rebuild]] overwrites in place, which assumes a maintenance
  // window. At 100 TB an index keeps serving probes DURING its
  // rebuild, so the versioned form applies the
  // [[graft.sources.Snapshots]] publish pattern to the index root:
  //   dir/_current          -> "snap-000003" (atomically swapped)
  //   dir/snap-000003/      { centroids.parquet, vectors.parquet }
  // BOTH artifacts live inside one immutable snapshot, so a probe can
  // never pair old centroids with new cells; a probe resolves the
  // pointer once and stays pinned to that generation (snapshot
  // isolation); `Snapshots.vacuum(dir, keep)` retires old
  // generations once readers have drained. [[append]] targets the
  // CURRENT snapshot directory — adding whole files to live cell
  // dirs is probe-safe by construction, which is exactly why append
  // does not need a new generation and rebuild does.
  // ------------------------------------------------------------------

  private def snapName(id: Long) = f"snap-$id%06d"

  /** Train + assign + write as the root's next generation, then swap
    * the pointer. Returns the published snapshot id. */
  def publishBuild(emb: DataFrame, dir: String, k: Int = 8,
                   iters: Int = 4): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val next = graft.sources.Snapshots.currentId(dir).getOrElse(0L) + 1L
    build(emb, s"$dir/${snapName(next)}", k, iters)
    graft.sources.Snapshots.swapPointer(dir, snapName(next))
    next
  }

  /** The generation directory probes should resolve (pin it, then
    * pass it to [[probe]]/[[append]]/[[cellStats]]). */
  def currentRoot(dir: String): String =
    graft.sources.Snapshots.currentPath(dir)

  /** Name + size of every data file under a vectors directory — the
    * cheap fingerprint the append-race guard compares (a local/object
    * -store listing, no data read). */
  private def vectorsFingerprint(root: String): Set[(String, Long)] = {
    val base = java.nio.file.Paths.get(root, "vectors.parquet")
    if (!java.nio.file.Files.exists(base)) Set.empty
    else {
      val walk = java.nio.file.Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => (base.relativize(p).toString, java.nio.file.Files.size(p)))
          .toSet
      } finally walk.close()
    }
  }

  /** [[rebuild]] as a non-disruptive publish: retrain over everything
    * stored in the CURRENT generation, write the result as the NEXT
    * generation, swap the pointer. In-flight probes pinned to the old
    * generation keep reading immutable files; new probes resolve the
    * rebuilt index. Returns the published snapshot id.
    *
    * WRITER-WRITER contract: [[append]] and publishRebuild must be
    * serialized by the caller (one maintainer per index root — the
    * same single-writer rule as [[graft.sources.Snapshots]]). An
    * append that lands in the current generation AFTER the rebuild
    * has read it would silently vanish from the new generation, so
    * the pointer swap is GUARDED: the current generation's file
    * listing is fingerprinted before the read and re-checked before
    * the swap, and a detected concurrent append aborts the publish
    * (pointer untouched, the orphan snapshot is [[
    * graft.sources.Snapshots.vacuum]]-collectable) rather than losing
    * rows. The guard detects the race, it cannot prevent one that
    * lands inside the check-to-swap window — serialization remains
    * the contract; the guard turns a silent data loss into a loud
    * retry. */
  def publishRebuild(spark: SparkSession, dir: String, k: Int = 8,
                     iters: Int = 4): Long =
    publishRebuildWithHook(spark, dir, k, iters, () => ())

  /** Test seam: `midHook` runs after the rebuild has snapshotted the
    * current generation but before the guarded pointer swap. */
  private[graft] def publishRebuildWithHook(spark: SparkSession,
                                            dir: String, k: Int, iters: Int,
                                            midHook: () => Unit): Long = {
    val root = currentRoot(dir)
    val before = vectorsFingerprint(root)
    val stored = spark.read.parquet(s"$root/vectors.parquet")
      .drop("cell", "gen")
      .localCheckpoint()
    val next = graft.sources.Snapshots.currentId(dir).getOrElse(0L) + 1L
    build(stored, s"$dir/${snapName(next)}", k, iters)
    midHook()
    val after = vectorsFingerprint(root)
    if (after != before)
      throw new IllegalStateException(
        s"publishRebuild: concurrent append detected under $root while " +
          "rebuilding — pointer NOT swapped (no rows lost); serialize " +
          "append/rebuild on this index root and retry")
    graft.sources.Snapshots.swapPointer(dir, snapName(next))
    next
  }

  /** Probe the root's current generation (resolves the pointer once —
    * the whole probe runs against one consistent snapshot). */
  def probeCurrent(spark: SparkSession, dir: String, queries: DataFrame,
                   k: Int = 5, nprobe: Int = 2,
                   vecFilter: Option[org.apache.spark.sql.Column] = None)
      : DataFrame =
    probe(spark, currentRoot(dir), queries, k, nprobe, vecFilter)

  /** Probe the stored index with an external query set
    * (qid, qvec). Returns top-k per query, excluding a vector whose
    * id equals the qid (self-match convention of [[Knn.bruteForce]]).
    *
    * `vecFilter` composes a metadata gate with the cell pruning
    * ([[Knn.filteredSearch]]'s pre-filter strategy at index scale):
    * the predicate lands in the SAME parquet scan the dynamic
    * partition pruning already narrows, so a probe reads only the
    * probed cells AND pushes the row filter into them. */
  def probe(spark: SparkSession, dir: String, queries: DataFrame,
            k: Int = 5, nprobe: Int = 2,
            vecFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val cents = broadcast(spark.read.parquet(s"$dir/centroids.parquet"))
    val vecs0 = spark.read.parquet(s"$dir/vectors.parquet")
    val vecs = vecFilter.map(vecs0.filter).getOrElse(vecs0)
    val d2 = aggregate(
      zip_with(col("qvec"), col("cvec"),
        (x, y) => { val d = x.cast("double") - y; d * d }),
      lit(0.0), (acc, v) => acc + v)
    val wCell = Window.partitionBy(col("qid"))
      .orderBy(col("d2"), col("cell"))
    val qcells = queries.crossJoin(cents)
      .select(col("qid"), col("qvec"), col("centroid_id").as("cell"),
        d2.as("d2"))
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("qvec"), col("cell"))
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    vecs.join(broadcast(qcells), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Portable.cosine(col("qvec"), col("embedding")).as("cos_sim"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("cos_sim"))
  }
}
