package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional streaming MERGE sink: a `foreachBatch` upsert into a
  * parquet-backed state table that survives kill/restart with no
  * duplicated and no lost effects.
  *
  * Layout: `dir/v=<N>/` immutable snapshot directories plus an
  * APPEND-ONLY commit log of zero-byte-ish marker files
  * `_commit_v<N>_e<epoch>`. A snapshot is visible iff its marker
  * exists; readers resolve the table to the max committed N. The write
  * protocol is the atomic-publish dual of the reference's
  * WAL-before-data rule (/root/reference/src/opusdb/storage/
  * buffer.clj:44-54 — there: log before page; here: data fully durable
  * BEFORE the marker that makes it reachable). A crash between
  * snapshot write and marker publish leaves an unreferenced `v=N+1`
  * directory — invisible, overwritten on replay — never a torn table.
  *
  * Idempotence: each marker records the epoch that produced its
  * snapshot. A replayed micro-batch (failure after durable marker,
  * before the checkpoint advanced) sees `epoch <= lastCommitted.epoch`
  * and SKIPS — the exactly-once contract foreachBatch itself does not
  * give you. Single writer assumed (one streaming query per table),
  * exactly the reference's one-log-manager-per-file discipline.
  *
  * Merge semantics: latest-wins per key by a total-ordering sequence
  * column (CDC LSN / event_id), the streaming continuation of
  * ops.Transactional.mergeUpsert. The merge is one hash aggregate over
  * current-state ∪ batch — one shuffle on the key, no windows. At
  * 100 TB the snapshot rewrite becomes a lakehouse-format MERGE
  * (copy-on-write per file, not per table), but the visibility
  * protocol — immutable data published by a commit record — is
  * exactly this one.
  */
object MergeSink {

  final case class Commit(version: Long, epoch: Long)

  private val MarkerRe = "_commit_v(\\d+)_e(\\d+)".r

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Highest committed (version, epoch), from the append-only log. */
  def lastCommit(spark: SparkSession, dir: String): Option[Commit] = {
    val (fs, p) = fsOf(spark, dir)
    if (!fs.exists(p)) None
    else
      fs.listStatus(p)
        .iterator
        .map(_.getPath.getName)
        .collect { case MarkerRe(v, e) => Commit(v.toLong, e.toLong) }
        .reduceOption((a, b) => if (a.version >= b.version) a else b)
  }

  /** The committed table state (empty-schema None before first commit). */
  def currentState(spark: SparkSession, dir: String): Option[DataFrame] =
    lastCommit(spark, dir).map(c => spark.read.parquet(s"$dir/v=${c.version}"))

  /** All committed versions, ascending — the table's retained history
    * (GC keeps the current and previous snapshot).
    */
  def commits(spark: SparkSession, dir: String): Seq[Commit] = {
    val (fs, p) = fsOf(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .iterator
        .map(_.getPath.getName)
        .collect { case MarkerRe(v, e) => Commit(v.toLong, e.toLong) }
        .toSeq
        .sortBy(_.version)
  }

  /** TIME TRAVEL: the table as of a committed version — the storage
    * dual of the reference's versioned `find-version` read
    * (/root/reference/src/opusdb/atomic/stm.clj:55-65): immutable
    * snapshots stay readable as long as their marker survives GC.
    * None if that version is uncommitted or collected.
    */
  def stateAt(spark: SparkSession, dir: String, version: Long): Option[DataFrame] =
    commits(spark, dir)
      .find(_.version == version)
      .map(c => spark.read.parquet(s"$dir/v=${c.version}"))

  /** Collapse to one row per key: the row with the highest seq. */
  private def latestWins(df: DataFrame, key: String, seq: String): DataFrame = {
    val rest = df.columns.filter(_ != key)
    df.groupBy(col(key))
      .agg(max_by(struct(rest.map(col).toIndexedSeq: _*), col(seq)).as("st"))
      .select(col(key) +: rest.map(c => col(s"st.$c").as(c)): _*)
  }

  /** Apply one micro-batch: merge, write snapshot, publish marker.
    * Replayed epochs are skipped. Retains the previous snapshot for
    * crash fallback; older ones are garbage-collected.
    */
  def upsertBatch(
      batch: DataFrame,
      dir: String,
      key: String,
      seq: String,
      epochId: Long): Unit = {
    val spark = batch.sparkSession
    val last = lastCommit(spark, dir)
    if (last.exists(_.epoch >= epochId)) return // idempotent replay skip
    val newV = last.map(_.version + 1).getOrElse(0L)
    val merged = last match {
      case None => latestWins(batch, key, seq)
      case Some(c) =>
        val cur = spark.read.parquet(s"$dir/v=${c.version}")
        latestWins(
          cur.unionByName(batch.select(cur.columns.map(col).toIndexedSeq: _*)),
          key,
          seq)
    }
    // data first (overwrite handles a torn unpublished attempt) ...
    merged.write.mode("overwrite").parquet(s"$dir/v=$newV")
    // ... then the O(1) marker that makes it visible
    val (fs, p) = fsOf(spark, dir)
    fs.create(new Path(p, s"_commit_v${newV}_e$epochId"), true).close()
    // GC: keep current + previous snapshot
    fs.listStatus(p)
      .iterator
      .map(_.getPath)
      .filter { q =>
        val n = q.getName
        (n.startsWith("v=") && n.stripPrefix("v=").toLong < newV - 1) ||
        (MarkerRe.findFirstMatchIn(n).exists(_.group(1).toLong < newV - 1))
      }
      .foreach(fs.delete(_, true))
  }

  /** Wire a streaming DataFrame into the merge table: every micro-batch
    * upserts transactionally; restart from the checkpoint is safe.
    */
  def sink(
      df: DataFrame,
      dir: String,
      checkpoint: String,
      key: String,
      seq: String): org.apache.spark.sql.streaming.DataStreamWriter[
    org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        upsertBatch(batch, dir, key, seq, epochId)
      }
}
