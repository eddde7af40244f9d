package graft

/** Spill-path correctness: at 100 TB operators WILL spill — window
  * buffers page out, sort-merge buffers hit their row thresholds, and
  * hash aggregates fall back to sort-based mode. Results must be
  * bit-identical either way. Forcing the thresholds to tiny values
  * drives every one of those paths at test scale; the sort-based
  * aggregate fallback is especially load-bearing for the custom
  * TypedImperativeAggregates (KMinDistinct, LogHistogram, TopKAgg,
  * MinHashUnion): their serialize/merge contract is exactly what that
  * mode exercises.
  */
class SpillSpec extends SparkSpec {

  test("results identical when window/join/aggregate operators are forced to spill") {
    val names = Seq(
      "q_pricing_summary", // hash aggregate
      "q_window_running", // window buffers
      "q_multi_join", // sort-merge joins
      "q_approx_distinct", // KMinDistinct imperative aggregate
      "q_approx_quantiles", // LogHistogram imperative aggregate
      "q_minhash_corpus", // MinHashUnion imperative aggregate
      "q_topk_agg") // typed Aggregator
    def run(): Map[String, Seq[String]] =
      names.map { n =>
        n -> SparkEntry
          .queries(n)(spark, sf)
          .collect()
          .map(_.toString)
          .toSeq
      }.toMap
    val confs = Seq(
      "spark.sql.windowExec.buffer.spill.threshold" -> "4",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "4",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    val base = run()
    names.foreach(n => assert(base(n).nonEmpty, s"$n returned no rows"))
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val spilled = run()
      names.foreach { n =>
        assert(spilled(n) == base(n), s"$n differs under forced spilling")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
