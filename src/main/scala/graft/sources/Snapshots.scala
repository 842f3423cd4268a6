package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A minimal snapshot-pointer table protocol — the write-then-swap
  * half that [[Layout.compact]] and every incremental writer need:
  * data lands FULLY in an immutable snapshot directory, then a tiny
  * `_current` pointer file is atomically replaced. The pointer-swap
  * pattern of the open table formats (Delta/Iceberg publish a new
  * metadata version the same way), cut down to what a single-writer
  * pipeline needs.
  *
  * Layout:
  * {{{
  *   tableDir/
  *     _current          # "snap-000042" — atomically replaced text file
  *     snap-000041/      # immutable parquet snapshot directories
  *     snap-000042/
  * }}}
  *
  * Guarantees (spec-driven):
  *  - **Readers never see partial data**: a snapshot becomes visible
  *    only via the pointer swap, AFTER its parquet write completed;
  *    an interrupted publish leaves a dangling `snap-*` directory the
  *    pointer never references (cleaned by [[vacuum]]).
  *  - **Snapshot isolation**: a DataFrame resolved from the old
  *    pointer keeps reading the old directory — snapshots are
  *    immutable; [[vacuum]] retention is the caller's lever for how
  *    long in-flight readers stay safe.
  *  - **Atomicity** comes from `ATOMIC_MOVE` of the pointer file —
  *    one filesystem primitive, same as the V2 sink's epoch commit.
  *
  * Contract: ONE writer per table (the simulated transport's
  * one-lineage-per-path rule); concurrent publishers would need a
  * lock or CAS this deliberately tiny protocol does not provide.
  * Works on local paths (the test/sim environment); a cluster
  * deployment swaps the pointer primitive for its store's atomic
  * rename or CAS.
  */
object Snapshots {

  private val Pointer = "_current"

  private def snapName(id: Long) = f"snap-$id%06d"

  /** Publish `df` as the next snapshot of `tableDir`; returns the new
    * snapshot id. Write-then-swap: readers resolve either the old or
    * the new snapshot, never a mix, never partial files. */
  def publish(df: DataFrame, tableDir: String,
              partitionCols: Seq[String] = Nil): Long = {
    Files.createDirectories(Paths.get(tableDir))
    val next = currentId(tableDir).getOrElse(0L) + 1L
    val dest = Paths.get(tableDir, snapName(next)).toString
    val w = df.write.mode(SaveMode.ErrorIfExists)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dest)
    swapPointer(tableDir, snapName(next))
    next
  }

  /** Publish the next snapshot REUSING unchanged partition
    * directories from the current one (VERDICT r16 item 8 — a
    * maintained state pack whose batch touched a small slice must not
    * rewrite the verbatim majority every publish). `changed` holds
    * ONLY the rows of partitions the caller knows changed, written
    * partitioned by `partitionCols`; every relative partition
    * directory in `reuseDirs` (e.g. `rel=traj/bkt=3`) is then carried
    * over from the current snapshot by HARDLINKING its data files
    * into the new snapshot directory — byte-identical reuse at zero
    * write cost — before the same atomic pointer swap. Hardlinked
    * files survive [[vacuum]] of the donor snapshot (deleting one
    * link only decrements the count), so retention semantics are
    * unchanged. Falls back to a file COPY where the store refuses
    * links (cross-device). On an object store a deployment would swap
    * the link for manifest-level reuse (the Iceberg/Delta move — a
    * new metadata version referencing unchanged data files); the
    * protocol here (immutable data + pointer swap) is the same shape.
    *
    * The caller OWNS the correctness claim that the reused
    * partitions' rows are exactly the new state's rows for those
    * partitions; a `reuseDirs` entry the write also produced fails
    * loudly (the two sources would union). A reuse directory absent
    * from the current snapshot is skipped — an empty partition wrote
    * no files then and owns none now.
    *
    * Returns (snapshot id, fresh data files written, files linked). */
  def publishReuse(changed: DataFrame, tableDir: String,
                   partitionCols: Seq[String],
                   reuseDirs: Seq[String]): (Long, Int, Int) = {
    require(partitionCols.nonEmpty, "publishReuse needs partitionCols")
    val srcRoot = Paths.get(currentPath(tableDir))
    val next = currentId(tableDir).getOrElse(0L) + 1L
    val destRoot = Paths.get(tableDir, snapName(next))
    changed.write.mode(SaveMode.ErrorIfExists)
      .partitionBy(partitionCols: _*).parquet(destRoot.toString)
    def dataFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val walk = Files.walk(dir)
      try walk.iterator().asScala.filter(p => Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith(".")).toSeq
      finally walk.close()
    }
    val fresh = dataFiles(destRoot).size
    var linked = 0
    reuseDirs.foreach { rel =>
      val src = srcRoot.resolve(rel)
      val dest = destRoot.resolve(rel)
      if (Files.exists(dest))
        throw new IllegalStateException(
          s"publishReuse: $rel was both written and named for reuse — " +
            "the caller's changed/unchanged split is wrong")
      if (Files.exists(src)) {
        Files.createDirectories(dest)
        dataFiles(src).foreach { f =>
          val t = dest.resolve(f.getFileName)
          try Files.createLink(t, f)
          catch {
            case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
              Files.copy(f, t, StandardCopyOption.COPY_ATTRIBUTES)
          }
          linked += 1
        }
      }
    }
    swapPointer(tableDir, snapName(next))
    (next, fresh, linked)
  }

  /** Read the current snapshot. The returned DataFrame is pinned to
    * the snapshot directory current AT RESOLVE TIME — later publishes
    * do not change what it reads (snapshot isolation). */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(currentPath(tableDir))

  /** The data directory the pointer currently names. */
  def currentPath(tableDir: String): String = {
    val p = Paths.get(tableDir, Pointer)
    require(Files.exists(p), s"no $Pointer pointer in $tableDir — never published?")
    Paths.get(tableDir,
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim).toString
  }

  def currentId(tableDir: String): Option[Long] = {
    val p = Paths.get(tableDir, Pointer)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .trim.stripPrefix("snap-").toLong)
  }

  /** Compact the CURRENT snapshot into the next one via
    * [[Layout.compact]] (fewer, right-sized, optionally range-sorted
    * files) and swap the pointer — the maintenance loop of a
    * streaming-written table as one call. Returns
    * (input files, output files, new snapshot id). */
  def compact(spark: SparkSession, tableDir: String,
              targetFileBytes: Long = 128L << 20,
              sortCol: Option[String] = None): (Int, Int, Long) = {
    val next = currentId(tableDir).getOrElse(
      throw new IllegalStateException(s"nothing published at $tableDir")) + 1L
    val dest = Paths.get(tableDir, snapName(next)).toString
    val (in, out) = Layout.compact(spark, currentPath(tableDir), dest,
      targetFileBytes, sortCol)
    swapPointer(tableDir, snapName(next))
    (in, out, next)
  }

  /** Delete snapshots older than the newest `keep`, plus dangling
    * directories from interrupted publishes (ids above the pointer).
    * Returns deleted directory names.
    *
    * TWO retention levers, both must clear for a directory to go:
    *  - **keep-N**: the newest `keep` snapshots are never touched, so
    *    a reader pinned within the last N generations always survives
    *    a vacuum regardless of timing.
    *  - **min-age** (`minAgeMillis`): a snapshot whose newest file is
    *    younger than this is skipped even when outside the keep
    *    window. Sized to the longest-running reader, this is the MVCC
    *    rule made enforceable instead of conventional: a probe pinned
    *    at resolve time T only reads directories written before T, so
    *    `minAgeMillis` ≥ the reader's maximum runtime guarantees the
    *    files outlive it. Min-age also shields a dangling id > cur
    *    directory that is actually an IN-FLIGHT publish about to swap
    *    its pointer.
    * The default (0) keeps the historical eager behavior for
    * single-process maintenance loops that know no reader is live. */
  def vacuum(tableDir: String, keep: Int = 2,
             minAgeMillis: Long = 0L): Seq[String] = {
    require(keep >= 1, "must keep at least the current snapshot")
    currentId(tableDir) match {
      case None => Nil
      case Some(cur) =>
        val listing = Files.list(Paths.get(tableDir))
        val snaps =
          try listing.iterator().asScala
            .filter(p => p.getFileName.toString.startsWith("snap-"))
            .map(p => p.getFileName.toString.stripPrefix("snap-").toLong)
            .toSeq.sorted
          finally listing.close()
        val now = System.currentTimeMillis()
        val doomed = snaps.filter(id => id <= cur - keep || id > cur)
          .filter(id => minAgeMillis <= 0L ||
            now - newestFileMillis(Paths.get(tableDir, snapName(id))) >=
              minAgeMillis)
        doomed.map { id =>
          val dir = Paths.get(tableDir, snapName(id))
          val walk = Files.walk(dir)
          try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
          finally walk.close()
          snapName(id)
        }
    }
  }

  /** Newest mtime under a snapshot directory — the snapshot's age
    * anchor (directory mtimes alone are unreliable across stores; the
    * newest FILE is when the snapshot finished writing). The fold
    * SEEDS with the directory's own mtime, never 0: a directory a
    * publisher just created but has not yet written a file into would
    * otherwise read as infinitely old and lose exactly the in-flight
    * shielding min-age promises. */
  private def newestFileMillis(dir: java.nio.file.Path): Long = {
    val walk = Files.walk(dir)
    try walk.iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(Files.getLastModifiedTime(_).toMillis)
      .foldLeft(Files.getLastModifiedTime(dir).toMillis)(math.max)
    finally walk.close()
  }

  private[graft] def swapPointer(tableDir: String, target: String): Unit = {
    val tmp = Paths.get(tableDir, s".$Pointer.tmp")
    Files.write(tmp, target.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(tableDir, Pointer),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
