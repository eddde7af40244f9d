package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.MergeSink

/** Branches ([[MergeSink.branchTable]] / [[MergeSink.fastForward]]):
  * zero-copy creation (hard links — pinned by inode equality),
  * divergence isolation both ways, the git fast-forward rule on a
  * moved source, retention-GC independence across the link boundary,
  * and resumable publication.
  */
class BranchSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def rows(ids: Range, v: Long): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, i.toLong * 10 + v)).toDF("id", "x")
      .withColumn("rv", lit(v))
  }

  private def state(dir: String): Map[Long, Long] =
    MergeSink.currentState(spark, dir).get
      .select(col("id"), col("x")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def ino(p: java.nio.file.Path): Any =
    Files.getAttribute(p, "unix:ino")

  private def firstParquet(dir: String): java.nio.file.Path = {
    val d = java.nio.file.Paths.get(dir, "data")
    val it = Files.walk(d)
    try it.filter(q => q.toString.endsWith(".parquet")).findFirst().get()
    finally it.close()
  }

  test("branch is zero-copy (linked inodes) and isolates both ways") {
    val main = tmp("graft_br_main")
    val dev = tmp("graft_br_dev_")
    MergeSink.setHistoryKeep(spark, main, 8)
    MergeSink.upsertBatch(rows(0 until 50, 1), main, "id", "rv", 0L, "w")
    MergeSink.upsertBatch(rows(25 until 60, 2), main, "id", "rv", 1L, "w")
    val (base, linked) = MergeSink.branchTable(spark, main, dev)
    assert(base == 1L && linked > 0)
    // zero-copy: the branch's data files ARE the main's files
    val f = firstParquet(dev)
    val twin = java.nio.file.Paths.get(
      main, f.toString.stripPrefix(dev).stripPrefix("/"))
    assert(ino(f) == ino(twin), "branch data must be hard-linked, not copied")
    assert(state(dev) == state(main))
    // diverge the branch: main must not move
    val before = state(main)
    MergeSink.setHistoryKeep(spark, dev, 8)
    MergeSink.upsertBatch(rows(100 until 110, 3), dev, "id", "rv", 2L, "b")
    assert(state(main) == before, "branch writes must not reach main")
    assert(state(dev).size == before.size + 10)
    // publish: main == branch, idempotent
    assert(MergeSink.fastForward(spark, main, dev) == 1L)
    assert(state(main) == state(dev))
    assert(MergeSink.fastForward(spark, main, dev) == 0L)
    assert(MergeSink.lastCommit(spark, main).get.version == 2L)
  }

  test("fast-forward refuses a source that advanced past the branch point") {
    val main = tmp("graft_br_main2")
    val dev = tmp("graft_br_dev2")
    MergeSink.setHistoryKeep(spark, main, 8)
    MergeSink.upsertBatch(rows(0 until 20, 1), main, "id", "rv", 0L, "w")
    MergeSink.branchTable(spark, main, dev)
    MergeSink.setHistoryKeep(spark, dev, 8)
    MergeSink.upsertBatch(rows(50 until 55, 2), dev, "id", "rv", 1L, "b")
    // main moves on its own — the fast-forward rule is violated
    MergeSink.upsertBatch(rows(90 until 95, 2), main, "id", "rv", 1L, "w")
    val e = intercept[Exception] {
      MergeSink.fastForward(spark, main, dev)
    }
    assert(e.getMessage.contains("advanced past the branch point"))
    // and nothing was promoted: main keeps ITS version-1 content
    assert(state(main).contains(90L) && !state(main).contains(50L))
  }

  test("retention GC on the branch never eats main's data (links)") {
    val main = tmp("graft_br_main3")
    val dev = tmp("graft_br_dev3")
    MergeSink.setHistoryKeep(spark, main, 8)
    MergeSink.upsertBatch(rows(0 until 40, 1), main, "id", "rv", 0L, "w")
    val before = state(main)
    MergeSink.branchTable(spark, main, dev)
    // tight retention + repeated full-bucket rewrites on the branch GC
    // the branch's LINKS to the base content
    MergeSink.setHistoryKeep(spark, dev, 1)
    MergeSink.upsertBatch(rows(0 until 40, 2), dev, "id", "rv", 1L, "b")
    MergeSink.upsertBatch(rows(0 until 40, 3), dev, "id", "rv", 2L, "b")
    MergeSink.vacuum(spark, dev)
    // main reads its full state — the filesystem reference count kept
    // its side of every shared file alive
    assert(state(main) == before)
  }

  test("fast-forward resumes over an already-promoted prefix") {
    val main = tmp("graft_br_main4")
    val dev = tmp("graft_br_dev4")
    MergeSink.setHistoryKeep(spark, main, 8)
    MergeSink.upsertBatch(rows(0 until 10, 1), main, "id", "rv", 0L, "w")
    MergeSink.branchTable(spark, main, dev)
    MergeSink.setHistoryKeep(spark, dev, 8)
    MergeSink.upsertBatch(rows(10 until 15, 2), dev, "id", "rv", 1L, "b")
    assert(MergeSink.fastForward(spark, main, dev) == 1L)
    // the branch keeps moving; main is now at a PROMOTED PREFIX of the
    // branch — publication continues from there instead of refusing
    MergeSink.upsertBatch(rows(15 until 20, 3), dev, "id", "rv", 2L, "b")
    assert(MergeSink.fastForward(spark, main, dev) == 1L)
    assert(state(main) == state(dev))
  }
}
