package graft

/** BPE merge-training invariants (q_bpe_train) — checked on top of the
  * oracle gate because they are properties of the ALGORITHM, not of any
  * one corpus:
  *  - a merge of a pair with DISTINCT symbols replaces every counted
  *    occurrence (occurrences of "x y" with x≠y can never overlap), so
  *    the corpus symbol count shrinks by EXACTLY the pair weight; for a
  *    doubled pair "x x" counted occurrences may overlap ("x x x"
  *    counts 2, merges 1) and the shrink is bounded in [⌈w/2⌉, w].
  *    This is the property that breaks first if replace semantics ever
  *    drift from greedy left-to-right;
  *  - merge weights are non-increasing across rounds (the argmax of a
  *    shrinking multiset never grows).
  */
class BpeSpec extends SparkSpec {

  private lazy val rounds =
    ops.TextPipeline.bpeTrain(spark, sf).collect().sortBy(_.getLong(0))

  test("each merge shrinks the symbol count by exactly its weight") {
    // reconstruct the pre-merge count of round k from round k-1's
    // n_symbols_after; round 0's baseline is total chars of the vocab
    import org.apache.spark.sql.functions._
    import graft.functions.Hashing.tokens
    val baseline = Tables
      .documents(spark, sf)
      .select(explode(tokens(col("text"))).as("w"))
      .agg(sum(length(col("w"))))
      .first()
      .getLong(0)
    var before = baseline
    rounds.foreach { r =>
      val w = r.getLong(2)
      val after = r.getLong(3)
      val shrink = before - after
      val Array(x, y) = r.getString(1).split(" ")
      if (x != y)
        assert(
          shrink == w,
          s"round ${r.getLong(0)}: merged '${r.getString(1)}' weight $w " +
            s"but symbols went $before -> $after (expected exact shrink $w)")
      else
        assert(
          shrink <= w && 2 * shrink >= w,
          s"round ${r.getLong(0)}: doubled pair '${r.getString(1)}' weight " +
            s"$w shrank by $shrink — outside [ceil(w/2), w]")
      before = after
    }
  }

  test("merge weights are non-increasing and all pairs distinct") {
    val ws = rounds.map(_.getLong(2))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, ws.mkString(","))
    val pairs = rounds.map(_.getString(1))
    assert(pairs.distinct.length == pairs.length, pairs.mkString(","))
    // a merged pair's symbols come from earlier alphabet/merges: round 0
    // must merge two single chars
    assert(pairs.head.length == 3, s"round-0 pair '${pairs.head}'")
  }

  // -------------------------------------------------------------------
  // Batched trainer (q_bpe_train_batched)
  // -------------------------------------------------------------------

  test("batched rounds select pairwise symbol-disjoint merges") {
    val vocab0 = ops.TextPipeline.bpeVocab0(spark, sf)
    val sel = ops.TextPipeline.bpeBatchSelect(vocab0)
    assert(sel.nonEmpty)
    val symsOf = sel.map(_._1.split(' ').toSet)
    symsOf.combinations(2).foreach { case Array(a, b) =>
      assert((a & b).isEmpty, s"overlapping batch pairs: $a vs $b")
    }
  }

  test("batched == sequential on non-interacting merges (property)") {
    // a vocab whose top pairs are symbol-DISJOINT by construction:
    // merging any of them cannot change the others' counts, so the
    // sequential argmax sequence must equal the batch selection order,
    // and applying the batch at once must equal applying it stepwise
    val s2 = spark
    import s2.implicits._
    val words = Seq(
      ("ab", 100L), ("cd", 90L), ("ef", 80L), ("gh", 70L), ("ij", 60L))
    val vocab0 = words
      .toDF("word", "cnt")
      .withColumn(
        "repr",
        org.apache.spark.sql.functions
          .regexp_replace(org.apache.spark.sql.functions.col("word"), "(.)", "$1 "))
    val batch = ops.TextPipeline.bpeBatchSelect(vocab0)
    assert(batch.map(_._1).toSeq ==
      Seq("a b", "c d", "e f", "g h", "i j"))
    // stepwise: after each single merge, the next argmax (= next batch
    // selection head) must be the next batch pair — non-interaction
    var v = vocab0
    batch.foreach { case (p, w) =>
      val head = ops.TextPipeline.bpeBatchSelect(v).head
      assert(head == ((p, w)), s"sequential argmax $head != batch ($p,$w)")
      v = ops.TextPipeline.bpeBatchApply(v, Seq(p))
    }
    // simultaneous apply == stepwise apply, row for row
    val atOnce = ops.TextPipeline
      .bpeBatchApply(vocab0, batch.map(_._1).toSeq)
      .select("word", "repr").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val stepwise =
      v.select("word", "repr").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(atOnce == stepwise)
  }

  test("batched trainer reaches 64+ effective merges in 8 rounds") {
    val stats = ops.TextPipeline.bpeTrainBatched(spark, sf).collect()
    assert(stats.length == 8, s"${stats.length} rounds")
    val total = stats.map(_.getLong(1)).sum
    assert(total >= 64L, s"only $total merges in 8 rounds")
    // symbol count must shrink by exactly the batch weight each round
    // (all selected pairs are disjoint, so the sequential exact-shrink
    // argument applies to the whole batch; doubled pairs excepted)
  }
}
