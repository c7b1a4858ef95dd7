package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** EXACTLY-ONCE persistent state for incrementally-maintained tables
  * ([[IncrementalAgg]]'s production companion).
  *
  * The failure this closes: an incremental-agg loop that does
  * `state := merge(state, increment)` then persists the state has a
  * crash window between "merge applied" and "snapshot committed" —
  * the merge is associative but NOT idempotent, so a replayed
  * increment (Structured Streaming re-delivers the in-flight batch on
  * restart) would double-count. GStream training has a restart proof
  * (GStreamRestartSpec); this gives the relational state loop the same
  * guarantee.
  *
  * Mechanism — epoch-stamped versioned snapshots with an atomic
  * pointer:
  *
  *  - state versions live under `dir/v=N/` as plain parquet; the
  *    CURRENT version is named by a one-line JSON pointer file
  *    `dir/_latest` = {"version":N,"epoch":E}, where E is the LAST
  *    APPLIED epoch (micro-batch id);
  *  - [[commit]] reads the pointer, SKIPS if `epoch <= E` (the
  *    replayed-delivery case — applying is made idempotent by the
  *    stamp, not by the merge), otherwise writes the stepped state to
  *    `v=N+1` and only then publishes the pointer via write-temp +
  *    ATOMIC_MOVE — readers switch from vN to vN+1 in one rename;
  *  - a crash BEFORE the publish leaves the pointer at (N, E): the
  *    orphaned v=N+1 directory is invisible (nothing points to it) and
  *    the replay overwrites it before publishing — no double-apply, no
  *    torn reads, in either crash half (spec-asserted by driving the
  *    two halves separately: EpochStateSpec).
  *
  * Single-writer discipline: epochs must arrive non-decreasing (the
  * foreachBatch contract — batch N+1 starts only after batch N's
  * foreachBatch returned). Two concurrent writers would race the
  * pointer; that is a coordination problem a table format solves with
  * CAS on the pointer, and the atomic-move publish here is exactly
  * that primitive for a single filesystem.
  *
  * At 100 TB the state table is keyed-aggregate sized (one row per
  * group — dimension-scale, not fact-scale), so rewriting it per epoch
  * is the cheap side of the trade; the fact history is what never
  * re-reads. Old versions are pruned to a small keep-window rather
  * than immediately (a reader that resolved the pointer a moment ago
  * may still be scanning its version).
  */
object EpochState {

  final case class Pointer(version: Long, epoch: Long)

  private def latest(dir: String) = java.nio.file.Paths.get(dir, "_latest")

  private def versionDir(dir: String, v: Long) = java.nio.file.Paths.get(dir, s"v=$v")

  /** The committed pointer, or None for an uninitialized directory. */
  def readPointer(dir: String): Option[Pointer] =
    if (!java.nio.file.Files.exists(latest(dir))) None
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(latest(dir)))
      Some(Pointer(node.get("version").asLong(), node.get("epoch").asLong()))
    }

  /** Publish (version, epoch) atomically: temp write + ATOMIC_MOVE onto
    * `_latest` — the all-or-nothing boundary every commit crosses last. */
  private def publish(dir: String, p: Pointer): Unit = {
    val tmp = java.nio.file.Paths.get(dir, s"_latest.tmp.${p.version}")
    java.nio.file.Files.writeString(tmp, s"""{"version":${p.version},"epoch":${p.epoch}}""")
    java.nio.file.Files.move(tmp, latest(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Initialize the store with a base state (epoch -1: every real
    * epoch ≥ 0 applies on top). No-op if already initialized — a
    * restarted job must NOT reset committed state to the base. */
  def init(spark: SparkSession, dir: String, base: DataFrame): Unit =
    if (readPointer(dir).isEmpty) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      base.write.mode("overwrite").parquet(versionDir(dir, 0L).toString)
      publish(dir, Pointer(0L, -1L))
    }

  /** The current committed state. */
  def state(spark: SparkSession, dir: String): DataFrame = {
    val p = readPointer(dir).getOrElse(
      throw new IllegalStateException(s"EpochState: $dir is not initialized"))
    spark.read.parquet(versionDir(dir, p.version).toString)
  }

  /** Apply `step` to the current state and commit it under `epoch`.
    * Returns false (and does nothing) when `epoch` was already applied
    * — the idempotent-replay path. `step` must be deterministic given
    * the current state (a replay re-runs it against the SAME version:
    * the pointer only advances after the new version is fully
    * written). */
  def commit(spark: SparkSession, dir: String, epoch: Long, keep: Long = 2)
      (step: DataFrame => DataFrame): Boolean = {
    require(epoch >= 0, s"EpochState: epochs must be >= 0, got $epoch")
    val p = readPointer(dir).getOrElse(
      throw new IllegalStateException(s"EpochState: $dir is not initialized"))
    if (epoch <= p.epoch) false
    else {
      writeVersion(spark, dir, p, epoch, step)
      publish(dir, Pointer(p.version + 1, epoch))
      prune(dir, p.version + 1, keep)
      true
    }
  }

  /** TIME TRAVEL: the state AS OF an older retained version — the
    * lakehouse read a reproducibility audit runs ("what did the table
    * say when epoch E trained that model?"). Versions inside the
    * commit-time `keep` window are plain parquet under `v=N/`; outside
    * it they are pruned, and the error says so rather than returning a
    * torn or empty frame. */
  def stateAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val p = readPointer(dir).getOrElse(
      throw new IllegalStateException(s"EpochState: $dir is not initialized"))
    require(version <= p.version,
      s"EpochState: version $version not committed yet (latest ${p.version})")
    val vd = versionDir(dir, version)
    require(java.nio.file.Files.exists(vd),
      s"EpochState: version $version pruned (retained: ${versions(dir).mkString(",")})")
    spark.read.parquet(vd.toString)
  }

  /** Retained version numbers, ascending. */
  def versions(dir: String): Seq[Long] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) Seq.empty
    else {
      // Files.list holds a directory handle until closed — without the
      // finally, every versions() call (stateAt's error path included)
      // leaks one fd.
      val stream = java.nio.file.Files.list(root)
      try {
        val it = stream.iterator()
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.startsWith("v=")) out += n.substring(2).toLong
        }
        out.sorted.toSeq
      } finally stream.close()
    }
  }

  /** The commit's first half — everything EXCEPT the pointer publish.
    * Exposed (package-private) so the restart spec can park a commit
    * exactly inside the crash window; production code uses [[commit]]. */
  private[graft] def writeVersion(spark: SparkSession, dir: String, p: Pointer,
      epoch: Long, step: DataFrame => DataFrame): Unit =
    step(spark.read.parquet(versionDir(dir, p.version).toString))
      .write.mode("overwrite").parquet(versionDir(dir, p.version + 1).toString)

  /** Drop version directories older than `keep` behind the committed
    * one — bounded storage without yanking a version a concurrent
    * reader may still be scanning. */
  private def prune(dir: String, current: Long, keep: Long = 2): Unit = {
    var v = current - keep - 1
    while (v >= 0 && java.nio.file.Files.exists(versionDir(dir, v))) {
      graft.streaming.StreamingRelational.deleteRecursively(versionDir(dir, v))
      v -= 1
    }
  }
}
