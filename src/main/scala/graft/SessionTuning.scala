package graft

import org.apache.spark.sql.SparkSession

/** Session-level performance settings shared by every main (Bench,
  * Verify, PlanDump, ReadBench, ProfileLane) — optimization-round
  * additions live here so the harness mains stay in lockstep and the
  * settings are parameterised in ONE place.
  *
  * Current contents (round 17):
  *  - fork-free local filesystem ([[sources.NioLocalFileSystem]]):
  *    replaces Hadoop's chmod-subprocess fallback with an NIO syscall.
  *    Scale-independent (it is what libhadoop's JNI chmod does on any
  *    production node); measured via driver stack sampling, where
  *    Shell.runCommand was a top-3 driver-side frame.
  */
object SessionTuning {
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.hadoop.fs.file.impl",
        classOf[sources.NioLocalFileSystem].getName)
}
