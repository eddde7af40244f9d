package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Connected-components contract: the piece the oracle data can't
  * exercise (the sf corpora plant disjoint near-dup PAIRS) is
  * transitivity — A~B and B~C must land in ONE cluster even though A
  * and C share no edge. Crafted edge lists cover chains, cliques,
  * star-merges and singleton isolation.
  */
class GraphSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph
      .connectedComponents(pairs.toDF("u", "v"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("chain A-B-C-D collapses to one cluster labeled by the min id") {
    val labels = cc(Seq((4L, 3L), (3L, 2L), (2L, 1L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep distinct labels") {
    val labels = cc(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L)))
    assert(labels.filterKeys(_ < 10).values.toSet == Set(1L))
    assert(labels.filterKeys(k => k >= 10 && k < 20).values.toSet == Set(10L))
    assert(labels.filterKeys(_ >= 20).values.toSet == Set(20L))
  }

  test("two stars merged by a bridge edge unify under the global min") {
    // star at 5: (5,6),(5,7); star at 1: (1,2),(1,3); bridge 7-3
    val labels = cc(Seq((5L, 6L), (5L, 7L), (1L, 2L), (1L, 3L), (7L, 3L)))
    assert(labels.values.toSet == Set(1L))
    assert(labels.keySet == Set(1L, 2L, 3L, 5L, 6L, 7L))
  }

  private def ccStar(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph
      .connectedComponentsStar(pairs.toDF("u", "v"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("large-star/small-star converges on a 120-hop chain hash-min must abort on") {
    // diameter 120 ≫ hash-min's 25-round cap: the star variant labels
    // all 121 nodes with the component min in O(log² n) rounds, while
    // hash-min fails LOUDLY (wrong-but-silent labels are the bug class
    // the cap exists to prevent).
    val chain = (0L until 120L).map(i => (i, i + 1))
    val labels = ccStar(chain)
    assert(labels.keySet == (0L to 120L).toSet)
    assert(labels.values.toSet == Set(0L))
    val err = intercept[IllegalArgumentException] {
      cc(chain)
    }
    assert(err.getMessage.contains("connectedComponentsStar"))
  }

  test("star CC agrees with hash-min on mixed chains, cliques and singleton pairs") {
    val edges = Seq(
      (4L, 3L), (3L, 2L), (2L, 1L),               // chain
      (10L, 11L), (11L, 12L), (10L, 12L),         // triangle
      (20L, 21L),                                 // pair
      (30L, 31L), (31L, 32L), (30L, 33L), (33L, 34L), // star-ish tree
      (7L, 7L)                                    // self loop: dropped by both? star drops it
    )
    // hash-min keeps self-loop nodes (they appear as bi edges); compare
    // on the common node set with the self loop removed from input
    val clean = edges.filter(p => p._1 != p._2)
    assert(ccStar(clean) == cc(clean))
  }

  test("q_dup_clusters: every cluster has exactly one canonical doc and size >= 2") {
    val out = Graph.dupClusters(spark, sf).cache()
    val perCluster = out
      .groupBy(col("cluster_id"))
      .agg(
        sum(col("is_canonical")).as("n_canon"),
        count(lit(1)).as("n"),
        max(col("cluster_size")).as("sz"),
        min(col("cluster_id")).as("min_cid"),
        min(col("doc_id")).as("min_doc"))
      .collect()
    assert(perCluster.nonEmpty)
    perCluster.foreach { r =>
      assert(r.getAs[Long]("n_canon") == 1L, s"cluster ${r.get(0)}: canonical count")
      assert(r.getAs[Long]("n") >= 2L, s"cluster ${r.get(0)}: singleton leaked")
      assert(r.getAs[Long]("n") == r.getAs[Long]("sz"), s"cluster ${r.get(0)}: size col")
      // cluster id is the min member id
      assert(r.getAs[Long]("min_doc") == r.getAs[Long]("min_cid"))
    }
    out.unpersist()
  }
}
