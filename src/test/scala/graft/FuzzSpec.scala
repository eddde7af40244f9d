package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.MergeSink

/** Randomized DIFFERENTIAL DML fuzzing: seeded random programs of
  * upsert / delete / intra-batch-duplicate / compact / vacuum /
  * restore / branch+fast-forward, each step checked against a trivial
  * in-memory latest-wins model, and every retained version checked
  * against the model snapshot recorded when it committed. The round-14
  * adversarial review found defect classes (partitioned point-lookup
  * offsets, sum-to-NULL folds) that 270 example-based gates missed —
  * this is that review, institutionalized: a failure prints the
  * program seed so any counterexample replays deterministically.
  */
class FuzzSpec extends SparkSpec {

  private val Programs = 200
  private val Seed0 = 20260816L

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** The whole engine state under test per program:
    * key → x (latest-wins by rv, tombstones removed).
    */
  private type Model = Map[Long, Long]

  private def frame(rows: Seq[(Long, Long, Long, Boolean)],
      withDeleted: Boolean): DataFrame = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "x", "rv", "__deleted")
    if (withDeleted) df else df.drop("__deleted")
  }

  private def engineState(dir: String): Model =
    MergeSink.currentState(spark, dir)
      .map(_.select(col("id"), col("x")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
      .getOrElse(Map.empty)

  private def engineStateAt(dir: String, v: Long): Option[Model] =
    MergeSink.stateAt(spark, dir, v)
      .map(_.select(col("id"), col("x")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)

  // one shared spark; programs are sequential and tiny (≤ 16 keys)
  private def runProgram(p: Int): Unit = {
    val rnd = new Random(Seed0 + p)
    val dir = tmp(f"graft_fuzz_$p%03d_")
    MergeSink.setHistoryKeep(spark, dir, 4)
    if (rnd.nextInt(6) == 0) MergeSink.setPartitionSpec(
      spark, dir, "identity", "part", 2)
    val partitioned = MergeSink.partitionSpec(spark, dir).isDefined
    // partitioned layout needs the partition column in the key; use a
    // derived int column `part` = id % 3 declared as part of the key
    val key = if (partitioned) "id,part" else "id"
    def withPart(df: DataFrame): DataFrame =
      if (partitioned) df.withColumn("part", (col("id") % 3).cast("int"))
      else df
    var rv = 0L
    val model = mutable.Map.empty[Long, Long]
    // recorded (version → model snapshot) at every commit we performed
    val snaps = mutable.ArrayBuffer.empty[(Long, Model)]
    def snap(): Unit =
      MergeSink.lastCommit(spark, dir).foreach(c =>
        if (!snaps.lastOption.exists(_._1 == c.version))
          snaps += c.version -> model.toMap)
    def ctx(op: String): String =
      s"fuzz program $p (seed ${Seed0 + p}) op $op"

    val steps = 4 + rnd.nextInt(5)
    for (_ <- 0 until steps) {
      val opK = rnd.nextInt(12)
      opK match {
        case k if k <= 5 => // upsert (sometimes with intra-batch dups)
          rv += 1
          val n = 1 + rnd.nextInt(5)
          val base = Seq.fill(n)((rnd.nextInt(16).toLong,
            rnd.nextInt(100).toLong, rv, false))
          val dedup = base.groupBy(_._1).map(_._2.last).toSeq
          val rows =
            if (rnd.nextInt(4) == 0 && dedup.nonEmpty) {
              // an intra-batch duplicate at a HIGHER rv must win
              rv += 1
              val (id, _, _, _) = dedup(rnd.nextInt(dedup.size))
              val x2 = rnd.nextInt(100).toLong
              dedup :+ ((id, x2, rv, false))
            } else dedup
          MergeSink.upsertBatch(withPart(frame(rows, withDeleted = false)),
            dir, key, "rv", rv, "fuzz")
          rows.groupBy(_._1).foreach { case (id, vs) =>
            val w = vs.maxBy(_._3); model(id) = w._2
          }
          snap()
        case 6 | 7 => // delete (possibly of absent keys)
          rv += 1
          val ids = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(18).toLong)
            .distinct
          MergeSink.upsertBatch(
            withPart(frame(ids.map(id => (id, 0L, rv, true)),
              withDeleted = true)),
            dir, key, "rv", rv, "fuzz")
          ids.foreach(model.remove)
          snap()
        case 8 => // compact: content-preserving rewrite
          if (MergeSink.lastCommit(spark, dir).isDefined) {
            MergeSink.compact(spark, dir, key, 1 + rnd.nextInt(4))
            snap()
          }
        case 9 => // vacuum: mints nothing, frees aged versions
          MergeSink.vacuum(spark, dir)
        case 10 => // restore to a random RETAINED snapshot we recorded
          val head = MergeSink.lastCommit(spark, dir).map(_.version)
          val retained = MergeSink.commits(spark, dir).map(_.version).toSet
          val candidates = snaps.filter(s =>
            retained.contains(s._1) && !head.contains(s._1))
          if (candidates.nonEmpty) {
            val (v, m) = candidates(rnd.nextInt(candidates.size))
            MergeSink.restore(spark, dir, v)
            model.clear(); model ++= m
            snap()
          }
        case 11 => // branch, write on the branch, fast-forward back
          if (MergeSink.lastCommit(spark, dir).isDefined) {
            val dev = tmp(f"graft_fuzz_br_$p%03d_")
            val refs = rnd.nextBoolean()
            if (refs) spark.conf.set("spark.graft.branchMode", "refs")
            try MergeSink.branchTable(spark, dir, dev)
            finally spark.conf.unset("spark.graft.branchMode")
            MergeSink.setHistoryKeep(spark, dev, 4)
            rv += 1
            val rows = Seq.fill(1 + rnd.nextInt(3))(
              (rnd.nextInt(16).toLong, rnd.nextInt(100).toLong, rv, false))
              .groupBy(_._1).map(_._2.last).toSeq
            MergeSink.upsertBatch(
              withPart(frame(rows, withDeleted = false)),
              dev, key, "rv", rv, "fuzzbr")
            assert(engineState(dir) == model.toMap,
              s"${ctx("branch-isolation")}: main moved under a branch write")
            MergeSink.fastForward(spark, dir, dev)
            rows.foreach { case (id, x, _, _) => model(id) = x }
            snap()
          }
      }
      val got = engineState(dir)
      assert(got == model.toMap,
        s"${ctx(s"step-check k=$opK")}: engine=$got model=$model")
    }
    // every retained version we committed must still read as the model
    // state it captured
    val retained = MergeSink.commits(spark, dir).map(_.version).toSet
    snaps.filter(s => retained.contains(s._1)).foreach { case (v, m) =>
      val got = engineStateAt(dir, v)
      assert(got.contains(m) || (m.isEmpty && got.isEmpty),
        s"${ctx(s"time-travel v$v")}: got=$got want=$m")
    }
  }

  test(s"$Programs seeded random DML programs match the model") {
    for (p <- 0 until Programs) runProgram(p)
  }
}
