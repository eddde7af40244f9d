package graft.ops

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic duals of the reference's STM/transaction workloads.
  *
  * opusdb's observable semantics are folds over keyed mutable state:
  * transfers (/root/reference/src/opusdb/benchmark/bank.clj:10-18),
  * counter increments (benchmark/throughput.clj:6-24), read/write mixes
  * (throughput.clj:59-100), and versioned as-of reads
  * (atomic/stm.clj:55-65, MAX_HISTORY=16 at stm.clj:10). In Spark the
  * mutable cell becomes an event stream folded into state with
  * `groupBy(key).agg(...)`; the version history becomes a ranked window.
  *
  * Semantics note (SURVEY.md §7.5): the reference's transfer is
  * conditional on sufficient funds (bank.clj:14), which is inherently
  * order-dependent. The oracle-checked query here is the unconditional
  * fold — the same invariant-checkable computation the reference's own
  * throughput benchmark verifies (sum of deltas == expected total).
  */
object Transactional {
  type Q = (SparkSession, String) => DataFrame

  // q_transfer_fold — signed-delta fold over events joined to the initial
  // balance table (customer.c_acctbal = bank of refs). purchase = debit,
  // signup = credit. Shuffles on user_id for the fold and the join.
  val transferFold: Q = (s, d) => {
    val e = Tables.events(s, d)
    val c = Tables.customer(s, d)
    val deltas = e
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("user_id"),
        when(col("event_type") === "purchase",
             -col("value").cast("decimal(18,4)"))
          .otherwise(col("value").cast("decimal(18,4)")).as("delta"))
      .groupBy(col("user_id"))
      .agg(sum(col("delta")).as("net"), count(lit(1)).as("n_tx"))
    // The folded per-key state has O(distinct user_id) cardinality —
    // comparable to the account table itself, so it is NOT broadcastable
    // at scale. A plain shuffle join on the key is the scale-safe default;
    // AQE may still choose broadcast at small SFs from observed sizes.
    deltas.join(c, deltas("user_id") === c("c_custkey"))
      .select(col("user_id"),
              col("c_acctbal").as("initial_bal"),
              col("net").cast("double").as("net_delta"),
              (col("c_acctbal").cast("decimal(18,4)") + col("net"))
                .cast("double").as("final_bal"),
              col("n_tx"))
      .orderBy(col("user_id"))
  }

  val transferFoldSql: String =
    """SELECT user_id, c_acctbal AS initial_bal,
      |CAST(net AS DOUBLE) AS net_delta,
      |CAST(CAST(c_acctbal AS DECIMAL(18,4)) + net AS DOUBLE) AS final_bal,
      |n_tx
      |FROM (
      |  SELECT user_id,
      |         SUM(CASE WHEN event_type = 'purchase'
      |                  THEN -CAST(value AS DECIMAL(18,4))
      |                  ELSE CAST(value AS DECIMAL(18,4)) END) AS net,
      |         count(*) AS n_tx
      |  FROM events
      |  WHERE event_type IN ('purchase', 'signup')
      |  GROUP BY user_id
      |) f JOIN customer ON user_id = c_custkey
      |ORDER BY user_id""".stripMargin

  // q_counter_increments — exactness invariant of throughput.clj:6-24:
  // every counter's count equals the number of increment events applied.
  val counterIncrements: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_increments"),
           dsum(col("value")).as("value_total"),
           countDistinct(col("user_id")).as("d_users"))
      .orderBy(col("event_type"))
  }

  val counterIncrementsSql: String =
    s"""SELECT event_type, count(*) AS n_increments,
       |${sqlDsum("value")} AS value_total,
       |count(DISTINCT user_id) AS d_users
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // q_read_write_mix — the reference's read/write mix
  // (throughput.clj:59-100): a point lookup (single-ref read) and a global
  // sum (all-refs read) in one result, tagged per op. The point lookup's
  // predicate is pushed to the parquet scan.
  val readWriteMix: Q = (s, d) => {
    val e = Tables.events(s, d)
    val point = e.filter(col("user_id") === 7)
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(lit("point_user_7").as("op"), col("n"), col("total"))
    val global = e
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(lit("global_sum").as("op"), col("n"), col("total"))
    point.unionAll(global).orderBy(col("op"))
  }

  val readWriteMixSql: String =
    s"""SELECT * FROM (
       |  SELECT 'point_user_7' AS op, count(*) AS n, ${sqlDsum("value")} AS total
       |  FROM events WHERE user_id = 7
       |  UNION ALL
       |  SELECT 'global_sum' AS op, count(*) AS n, ${sqlDsum("value")} AS total
       |  FROM events
       |) t ORDER BY op""".stripMargin

  // q_asof_read — the versioned read (atomic/stm.clj:160-178): latest
  // value per key at or before a read-point, here event_id <= 5000 with
  // event_id standing in for the write-point. Ranked window, rn = 1.
  val asofRead: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id").desc)
    Tables.events(s, d)
      .filter(col("event_id") <= 5000)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("asof_version"),
              col("value").as("asof_value"), col("event_type"))
      .orderBy(col("user_id"))
  }

  val asofReadSql: String =
    """SELECT user_id, event_id AS asof_version, value AS asof_value, event_type
      |FROM (
      |  SELECT user_id, event_id, value, event_type,
      |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events WHERE event_id <= 5000
      |) t WHERE rn = 1 ORDER BY user_id""".stripMargin

  // q_version_history — MAX_HISTORY=16 retention (atomic/stm.clj:10,42-53):
  // keep only the newest 16 versions per key, aggregated to a per-key
  // retention summary.
  val versionHistory: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 16)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_retained"),
           min(col("event_id")).as("oldest_version"),
           max(col("event_id")).as("newest_version"),
           dsum(col("value")).as("retained_total"))
      .orderBy(col("user_id"))
  }

  val versionHistorySql: String =
    s"""SELECT user_id, count(*) AS n_retained,
       |min(event_id) AS oldest_version,
       |max(event_id) AS newest_version,
       |${sqlDsum("value")} AS retained_total
       |FROM (
       |  SELECT user_id, event_id, value,
       |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
       |  FROM events
       |) t WHERE rn <= 16
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // q_snapshot_consistency — snapshot stability (stm_test.clj:156-173):
  // two reads of the same snapshot agree. Relationally: the same aggregate
  // computed through two different plans (direct vs via per-user partials)
  // must be identical; emitted as a one-row equality witness.
  val snapshotConsistency: Q = (s, d) => {
    val e = Tables.events(s, d)
    val direct = e.agg(dsum(col("value")).as("t"))
      .select(col("t").as("total_direct"))
    val viaUsers = e.groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("u"))
      .agg(sum(col("u")).cast("double").as("total_via_users"))
    direct.crossJoin(viaUsers)
      .select(col("total_direct"), col("total_via_users"),
              (col("total_direct") === col("total_via_users"))
                .as("snapshot_stable"))
  }

  val snapshotConsistencySql: String =
    s"""SELECT total_direct, total_via_users,
       |total_direct = total_via_users AS snapshot_stable
       |FROM (SELECT ${sqlDsum("value")} AS total_direct FROM events) a,
       |     (SELECT CAST(SUM(u) AS DOUBLE) AS total_via_users FROM (
       |        SELECT SUM(CAST(value AS DECIMAL(18,4))) AS u
       |        FROM events GROUP BY user_id) p) b""".stripMargin

  // q_lru_sim — the analytic shadow of the splay/LRU caches
  // (cache/splay.clj:72-91): re-reference distance distribution of the
  // event access stream. Distance = gap in the global access sequence
  // between consecutive touches of the same key.
  val lruSim: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .filter(col("prev_id").isNotNull)
      .withColumn("dist", col("event_id") - col("prev_id"))
      .withColumn("bucket",
        when(col("dist") <= 10, "d_0010")
          .when(col("dist") <= 100, "d_0100")
          .when(col("dist") <= 1000, "d_1000")
          .otherwise("d_more"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           min(col("dist")).as("min_dist"),
           max(col("dist")).as("max_dist"),
           sum(col("dist")).as("sum_dist"))
      .orderBy(col("bucket"))
  }

  val lruSimSql: String =
    """SELECT bucket, count(*) AS n, min(dist) AS min_dist,
      |max(dist) AS max_dist, CAST(SUM(dist) AS BIGINT) AS sum_dist
      |FROM (
      |  SELECT CASE WHEN dist <= 10 THEN 'd_0010'
      |              WHEN dist <= 100 THEN 'd_0100'
      |              WHEN dist <= 1000 THEN 'd_1000'
      |              ELSE 'd_more' END AS bucket, dist
      |  FROM (
      |    SELECT event_id - lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS dist
      |    FROM events
      |  ) g WHERE dist IS NOT NULL
      |) b GROUP BY bucket ORDER BY bucket""".stripMargin

  // q_mru_sim — the analytic twin of the splay cache's EVICTION POLICIES
  // (/root/reference/src/opusdb/cache/splay.clj:72-78: when full, the
  // "LRU" mode evicts the LEFTMOST tree node — the minimum key — while
  // MRU evicts the ROOT, which splaying makes the most recently accessed
  // key; tested at test/opusdb/cache/splay_test.clj:35-89). Per 1000-LSN
  // window of the access stream this emits the working-set size
  // (distinct keys a cache of that span must hold) and all three victim
  // choices: true-LRU (earliest last-touch), MRU (latest last-touch =
  // the splay root), and leftmost (minimum key — what the reference's
  // "LRU" mode actually removes). policies_diverge flags windows where
  // LRU and MRU would evict different keys.
  //
  // Scale: two hash aggregates keyed by (batch, user) then (batch) with
  // map-side partials; victims via struct-extreme aggregates (last_touch
  // = max event_id per key is globally unique, so arg extremes are
  // deterministic without a ranked window).
  val mruSim: Q = (s, d) => {
    val perKey = Tables
      .events(s, d)
      .select(
        expr("(event_id - 1) div 1000").as("batch"),
        col("event_id"),
        col("user_id"))
      .groupBy(col("batch"), col("user_id"))
      .agg(max(col("event_id")).as("last_touch"), count(lit(1)).as("n_touches"))
    perKey
      .groupBy(col("batch"))
      .agg(
        count(lit(1)).as("ws_size"),
        sum(col("n_touches")).as("n_accesses"),
        min(struct(col("last_touch"), col("user_id")))
          .getField("user_id").as("lru_victim"),
        max(struct(col("last_touch"), col("user_id")))
          .getField("user_id").as("mru_victim"),
        min(col("user_id")).as("leftmost_victim"))
      .withColumn(
        "policies_diverge",
        (col("lru_victim") =!= col("mru_victim")).cast("long"))
      .orderBy(col("batch"))
  }

  val mruSimSql: String =
    """WITH pk AS (
      |  SELECT (event_id - 1) // 1000 AS batch, user_id,
      |         max(event_id) AS last_touch, count(*) AS n_touches
      |  FROM events GROUP BY 1, 2)
      |SELECT batch, count(*) AS ws_size,
      |CAST(SUM(n_touches) AS BIGINT) AS n_accesses,
      |arg_min(user_id, last_touch) AS lru_victim,
      |arg_max(user_id, last_touch) AS mru_victim,
      |min(user_id) AS leftmost_victim,
      |CAST(arg_min(user_id, last_touch) != arg_max(user_id, last_touch) AS BIGINT) AS policies_diverge
      |FROM pk GROUP BY batch ORDER BY batch""".stripMargin

  // q_snapshot_diff — two-snapshot change detection, the relational
  // analogue of `ensure-read-consistency`
  // (/root/reference/src/opusdb/atomic/stm.clj:37-40: a transaction
  // aborts when a ref's write-point moved past the version its snapshot
  // read). Here the two read-points are LSN cuts t1 = max/2 and
  // t2 = max: the visible state per key at a cut is its latest
  // at-or-before version (the stm.clj:55-65 deref), and the ANTI-join of
  // the two states yields exactly the keys whose write-point moved —
  // classified as 'add' (key absent at t1) or 'change' (version moved).
  //
  // Scale: the 1-row bounds aggregate broadcasts; each state is one
  // struct-max hash aggregate keyed by user; the diff is a key-partitioned
  // anti join + left join (no windows over the full log).
  val snapshotDiff: Q = (s, d) => {
    val e = Tables
      .events(s, d)
      .select(col("user_id"), col("event_id"), col("value"))
    val bounds = e
      .agg(max(col("event_id")).as("mx"))
      .select(expr("mx div 2").as("t1"), col("mx").as("t2"))
    val eb = e.crossJoin(broadcast(bounds)) // 1-row witness join
    def stateAt(cut: String): DataFrame =
      eb.filter(col("event_id") <= col(cut))
        .groupBy(col("user_id"))
        .agg(max(struct(col("event_id"), col("value"))).as("st"))
        .select(
          col("user_id"),
          col("st.event_id").as("version"),
          col("st.value").as("value"))
    val v1 = stateAt("t1")
    val v2 = stateAt("t2")
    val changed = v2.join(
      v1.select(col("user_id").as("u1"), col("version").as("ver1")),
      col("user_id") === col("u1") && col("version") === col("ver1"),
      "left_anti")
    changed
      .join(v1.select(col("user_id").as("u1")), col("user_id") === col("u1"), "left")
      .select(
        col("user_id"),
        when(col("u1").isNull, "add").otherwise("change").as("kind"),
        col("version").as("new_version"),
        col("value").as("new_value"))
      .orderBy(col("user_id"))
  }

  val snapshotDiffSql: String =
    """WITH bounds AS (SELECT max(event_id) // 2 AS t1, max(event_id) AS t2 FROM events),
      |v1 AS (SELECT user_id, event_id AS version, value FROM (
      |  SELECT e.user_id, e.event_id, e.value,
      |         row_number() OVER (PARTITION BY e.user_id ORDER BY e.event_id DESC) AS rn
      |  FROM events e, bounds WHERE e.event_id <= bounds.t1) t WHERE rn = 1),
      |v2 AS (SELECT user_id, event_id AS version, value FROM (
      |  SELECT e.user_id, e.event_id, e.value,
      |         row_number() OVER (PARTITION BY e.user_id ORDER BY e.event_id DESC) AS rn
      |  FROM events e, bounds WHERE e.event_id <= bounds.t2) t WHERE rn = 1)
      |SELECT v2.user_id,
      |  CASE WHEN v1k.user_id IS NULL THEN 'add' ELSE 'change' END AS kind,
      |  v2.version AS new_version, v2.value AS new_value
      |FROM v2
      |LEFT JOIN (SELECT user_id FROM v1) v1k ON v2.user_id = v1k.user_id
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM v1
      |  WHERE v1.user_id = v2.user_id AND v1.version = v2.version)
      |ORDER BY v2.user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_merge_upsert — CDC-style MERGE: apply a change batch (the WAL tail
  // past the t1 = max/2 LSN cut) onto the base snapshot at t1, the
  // relational analogue of the reference's `apply-writes!`
  // (/root/reference/src/opusdb/atomic/stm.clj:42-53: fold the write-set
  // into the ref table, newest version wins). Each key's outcome is
  // classified MERGE-style: 'insert' (key only in the batch), 'update'
  // (key in both — batch version wins), 'carry' (key untouched by the
  // batch). Output per outcome: key count, merged-state value sum.
  //
  // Scale: two struct-max hash aggregates (base and delta are each one
  // shuffle on the key) + one key-partitioned FULL OUTER join; no
  // windows over the log, bounds broadcast as the 1-row witness.
  // ---------------------------------------------------------------------
  val mergeUpsert: Q = (s, d) => {
    val e = Tables
      .events(s, d)
      .select(col("user_id"), col("event_id"), col("value"))
    val bounds = e.agg(expr("max(event_id) div 2").as("t1"))
    val eb = e.crossJoin(broadcast(bounds)) // 1-row witness join
    def latest(df: DataFrame, valName: String): DataFrame =
      df.groupBy(col("user_id"))
        .agg(max(struct(col("event_id"), col("value"))).as("st"))
        .select(col("user_id"), col("st.value").as(valName))
    val base = latest(eb.filter(col("event_id") <= col("t1")), "base_val")
    val delta = latest(eb.filter(col("event_id") > col("t1")), "new_val")
      .select(col("user_id").as("d_user"), col("new_val"))
    base
      .join(delta, col("user_id") === col("d_user"), "full_outer")
      .select(
        when(col("user_id").isNull, "insert")
          .when(col("d_user").isNull, "carry")
          .otherwise("update")
          .as("op"),
        coalesce(col("new_val"), col("base_val")).as("merged_val"))
      .groupBy(col("op"))
      .agg(
        count(lit(1)).as("n_keys"),
        dsum(col("merged_val")).as("merged_total"))
      .orderBy(col("op"))
  }

  val mergeUpsertSql: String =
    s"""WITH bounds AS (SELECT max(event_id) // 2 AS t1 FROM events),
       |base AS (SELECT user_id, value AS base_val FROM (
       |  SELECT e.user_id, e.value,
       |         row_number() OVER (PARTITION BY e.user_id ORDER BY e.event_id DESC) AS rn
       |  FROM events e, bounds WHERE e.event_id <= bounds.t1) t WHERE rn = 1),
       |delta AS (SELECT user_id AS d_user, value AS new_val FROM (
       |  SELECT e.user_id, e.value,
       |         row_number() OVER (PARTITION BY e.user_id ORDER BY e.event_id DESC) AS rn
       |  FROM events e, bounds WHERE e.event_id > bounds.t1) t WHERE rn = 1)
       |SELECT op, count(*) AS n_keys, ${sqlDsum("merged_val")} AS merged_total
       |FROM (
       |  SELECT CASE WHEN base.user_id IS NULL THEN 'insert'
       |              WHEN delta.d_user IS NULL THEN 'carry'
       |              ELSE 'update' END AS op,
       |         COALESCE(delta.new_val, base.base_val) AS merged_val
       |  FROM base FULL OUTER JOIN delta ON base.user_id = delta.d_user) m
       |GROUP BY op ORDER BY op""".stripMargin

  /** The reference's ACTUAL conditional transfer semantics
    * (/root/reference/src/opusdb/benchmark/bank.clj:14-18: debit only if
    * funds suffice, else reject) — order-dependent, so NOT expressible
    * as oracle SQL (SURVEY.md §7.5), but exactly expressible as a typed
    * per-key sequential fold: sort each account's events by time and
    * walk them once. Batch form here (groupByKey + flatMapGroups, one
    * shuffle on the key); the streaming twin with persistent state is
    * graft.streaming.Streams.conditionalBalances — StreamingSpec asserts
    * both produce identical final states, and the invariant tests mirror
    * the reference's own (conservation over ACCEPTED transfers, no
    * negative balance ever).
    */
  case class AccountOutcome(
      user_id: Long,
      final_cents: Long,
      accepted: Long,
      rejected: Long)

  def conditionalFold(
      spark: SparkSession,
      dir: String,
      initialCents: Long): org.apache.spark.sql.Dataset[AccountOutcome] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("t_us"),
        col("event_id"),
        col("event_type"),
        col("value"))
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        var cents = initialCents
        var acc = 0L
        var rej = 0L
        it.toArray.sortBy(e => (e._2, e._3)).foreach {
          case (_, _, _, kind, value) =>
            val amt = math.round(value * 100.0)
            if (kind == "signup") { cents += amt; acc += 1 }
            else if (cents >= amt) { cents -= amt; acc += 1 }
            else rej += 1
        }
        Iterator.single(AccountOutcome(uid, cents, acc, rej))
      }
  }

  // ---------------------------------------------------------------------
  // q_scd2_enrich — SCD TYPE-2 dimension + event-time enrichment, the
  // standard warehouse composition of this module's CDC merge
  // (mergeUpsert: latest-wins state) with the native as-of exec
  // (plans/AsOfJoin.scala): instead of collapsing a key's change stream
  // to its latest version, EVERY version becomes an effective-dated row
  // (valid_from = change time, valid_to = next change via lead(), null
  // = current), and facts are enriched with the version IN EFFECT AT
  // EVENT TIME — not today's.
  //
  // Dimension updates: each user's signup/purchase events (deduped to
  // one version per (user, ts) via max_by on the unique event_id — an
  // SCD2 build must be deterministic under same-timestamp changes).
  // Facts: view/click/error events. Enrichment: the native as-of join
  // attaches the latest version with valid_from <= fact time; the
  // n_in_interval column re-checks the attached version against its OWN
  // [valid_from, valid_to) interval, proving as-of == interval-join on
  // SCD2 rows (must equal n_enriched — the gate hash-pins it).
  //
  // Scale: the dimension build is one shuffle on user_id (agg + lead
  // window share the partitioning); the enrichment is the as-of exec's
  // one shuffle + sort per side with O(1) merge state — no interval
  // range-join explosion, no broadcast of an sf-proportional dim.
  // Oracle: DuckDB's own ASOF LEFT JOIN over the identical SCD2 rows.
  // ---------------------------------------------------------------------
  val scd2Enrich: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
    val wVer = Window.partitionBy(col("d_user")).orderBy(col("valid_from_us"))
    val scd2 = e
      .filter(col("event_type").isin("signup", "purchase"))
      .groupBy(col("user_id").as("d_user"), col("t_us").as("valid_from_us"))
      .agg(
        round(max_by(col("value"), col("event_id")) * 100)
          .cast("long")
          .as("attr_cents"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wVer))
    val facts = e
      .filter(col("event_type").isin("view", "click", "error"))
      .select(col("user_id"), col("event_type"), col("t_us"))
    graft.plans.AsOf
      .join(facts, "user_id", "t_us", scd2, "d_user", "valid_from_us")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_facts"),
        count(col("valid_from_us")).as("n_enriched"),
        sum(
          when(
            col("valid_from_us").isNotNull &&
              col("valid_from_us") <= col("t_us") &&
              (col("valid_to_us").isNull ||
                col("t_us") < col("valid_to_us")),
            1L).otherwise(0L)).as("n_in_interval"),
        sum(
          when(col("valid_from_us").isNotNull && col("valid_to_us").isNull, 1L)
            .otherwise(0L)).as("n_current"),
        sum(col("attr_cents")).as("cents_total"))
      .orderBy(col("event_type"))
  }

  val scd2EnrichSql: String =
    """WITH up AS (
      |  SELECT user_id AS d_user, epoch_us(ts) AS valid_from_us,
      |    CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS attr_cents
      |  FROM events WHERE event_type IN ('signup', 'purchase')
      |  GROUP BY 1, 2),
      |scd AS (
      |  SELECT d_user, valid_from_us, attr_cents,
      |    lead(valid_from_us, 1) OVER (PARTITION BY d_user
      |                                 ORDER BY valid_from_us) AS valid_to_us
      |  FROM up),
      |f AS (SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events
      |      WHERE event_type IN ('view', 'click', 'error'))
      |SELECT f.event_type,
      |count(*) AS n_facts,
      |count(scd.valid_from_us) AS n_enriched,
      |CAST(SUM(CASE WHEN scd.valid_from_us IS NOT NULL
      |  AND scd.valid_from_us <= f.t_us
      |  AND (scd.valid_to_us IS NULL OR f.t_us < scd.valid_to_us)
      |  THEN 1 ELSE 0 END) AS BIGINT) AS n_in_interval,
      |CAST(SUM(CASE WHEN scd.valid_from_us IS NOT NULL
      |  AND scd.valid_to_us IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  AS n_current,
      |CAST(SUM(scd.attr_cents) AS BIGINT) AS cents_total
      |FROM f ASOF LEFT JOIN scd
      |  ON f.user_id = scd.d_user AND scd.valid_from_us <= f.t_us
      |GROUP BY f.event_type ORDER BY f.event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_scd2_enrich" -> scd2Enrich,
    "q_transfer_fold" -> transferFold,
    "q_counter_increments" -> counterIncrements,
    "q_read_write_mix" -> readWriteMix,
    "q_asof_read" -> asofRead,
    "q_version_history" -> versionHistory,
    "q_snapshot_consistency" -> snapshotConsistency,
    "q_lru_sim" -> lruSim,
    "q_mru_sim" -> mruSim,
    "q_snapshot_diff" -> snapshotDiff,
    "q_merge_upsert" -> mergeUpsert,
  )

  val oracleSql: Map[String, String] = Map(
    "q_scd2_enrich" -> scd2EnrichSql,
    "q_transfer_fold" -> transferFoldSql,
    "q_counter_increments" -> counterIncrementsSql,
    "q_read_write_mix" -> readWriteMixSql,
    "q_asof_read" -> asofReadSql,
    "q_version_history" -> versionHistorySql,
    "q_snapshot_consistency" -> snapshotConsistencySql,
    "q_lru_sim" -> lruSimSql,
    "q_mru_sim" -> mruSimSql,
    "q_snapshot_diff" -> snapshotDiffSql,
    "q_merge_upsert" -> mergeUpsertSql,
  )
}
