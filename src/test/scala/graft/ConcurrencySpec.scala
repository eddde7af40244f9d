package graft

import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The reference's signature test idiom is invariants under concurrency
  * (/root/reference/test/opusdb/atomic/stm_test.clj:204-237: consistent
  * concurrent readers, contention stress). The Spark dual: a shared
  * SparkSession serving concurrent query builds and actions must give
  * every reader the same snapshot-consistent answer.
  */
class ConcurrencySpec extends SparkSpec {

  test("consistent concurrent readers: N threads, identical results") {
    val futures = (1 to 6).map { _ =>
      Future {
        ops.Relational
          .bankConservation(spark, sf)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          .toSeq
      }
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    assert(results.forall(_ == results.head))
  }

  test("mixed concurrent workload: different queries, all invariants hold") {
    val work: Seq[() => Boolean] = Seq(
      () => ops.Transactional.counterIncrements(spark, sf)
        .agg(sum(col("n_increments"))).first().getLong(0) ==
        Tables.events(spark, sf).count(),
      () => ops.Transactional.snapshotConsistency(spark, sf)
        .first().getAs[Boolean]("snapshot_stable"),
      () => ops.Relational.setOps(spark, sf).count() == 3,
      () => ops.Temporal.walGapcheck(spark, sf)
        .first().getAs[Long]("n_gaps") == 0,
      () => ops.TextPipeline.dedupExact(spark, sf).count() > 0,
      () => ops.Embeddings.embedStats(spark, sf).count() > 0
    )
    val futures = work.map(f => Future(f()))
    val outcomes = Await.result(Future.sequence(futures), 180.seconds)
    assert(outcomes.forall(identity))
  }
}
