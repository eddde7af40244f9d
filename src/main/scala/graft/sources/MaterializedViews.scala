package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.MergeSink

/** MATERIALIZED VIEWS with INCREMENTAL REFRESH over merge tables.
  *
  * A view is a grouped aggregate of ONE source table, materialized as
  * an ordinary merge table keyed by the grouping columns — readable,
  * time-travelable, and streamable like any other table. `refresh`
  * advances it to the source's head snapshot:
  *
  *  - `algebraic` mode (sum/count): folds the source's retraction
  *    delta ([[MergeSink.changeDelta]]) into the stored aggregates —
  *    `SUM(x * __mult)` per group IS the change to `SUM(x)` — so a
  *    refresh reads ONLY the source buckets the range touched and the
  *    view rows of the changed groups. ZERO source re-aggregation: at
  *    100 TB, day-2 maintenance costs O(changed keys), not O(table).
  *  - `rescan` mode (any aggregate incl. min/max, which are not
  *    self-maintainable under deletes): recomputes ONLY the touched
  *    groups with a semi-join-pruned source pass; untouched groups are
  *    never read or written.
  *
  * EXACTLY-ONCE refresh rides the engine's own idempotence contract:
  * the view commit is an upsert under a stable per-view `runId` with
  * `epoch = source head version`. The applied source version is thus
  * recorded IN the commit log itself — a crashed refresh replays as a
  * no-op, and there is no out-of-band watermark to desynchronize. The
  * analytic dual of the reference's derived-ref pattern (a `ref`
  * holding a fold of others, recomputed inside the same `dosync` —
  * /root/reference/src/opusdb/examples/bank.clj:41-44 keeps the
  * balance invariant as a readable aggregate).
  *
  * If the last-applied source version has fallen out of the source's
  * retention window the delta is unreadable; refresh detects this and
  * falls back to a FULL rebuild (an overwrite commit) — correct at any
  * staleness, incremental whenever history allows.
  */
object MaterializedViews {

  /** One aggregate column of the view: `alias = kind(input)` where
    * kind ∈ sum|count|min|max|avg (input `*` for count). Parsed from
    * the spec string `"total=sum:cents,n=count:*"`. `avg` is a DERIVED
    * measure: the view maintains hidden `__<alias>_s` / `__<alias>_c`
    * columns (self-maintainable sum/count) and recomputes the visible
    * quotient for changed groups only — derived measures cost a
    * projection, never a scan.
    */
  final case class Agg(alias: String, kind: String, input: String)

  /** Expand derived kinds into their self-maintainable parts; all
    * storage and folding operates on the expanded list.
    */
  private def expand(aggs: Seq[Agg]): Seq[Agg] = {
    val base = aggs.flatMap {
      case Agg(a, "avg", c) =>
        Seq(Agg(s"__${a}_s", "sum", c), Agg(s"__${a}_c", "count", c))
      case x => Seq(x)
    }
    // Every stored SUM carries a non-NULL-input count companion
    // (reusing any count over the same column already stored): SQL SUM
    // over an all-NULL input set is NULL, and the additive fold alone
    // cannot RETURN to NULL once a retraction removes a group's last
    // non-NULL contributor (stored 5 + delta -5 folds to 0, the true
    // aggregate is NULL) — `when(companion == 0, NULL)` can.
    var have = base.collect {
      case Agg(_, "count", c) if c != "*" => c
    }.toSet
    val companions = base.flatMap {
      case Agg(a, "sum", c) if !have.contains(c) =>
        have += c; Seq(Agg(s"__${a}_nn", "count", c))
      case _ => Seq.empty
    }
    base ++ companions
  }

  /** The stored count-over-the-same-column companion of a SUM alias
    * (guaranteed to exist post-[[expand]]).
    */
  private def sumCompanion(ex: Seq[Agg], a: Agg): Option[String] =
    ex.collectFirst {
      case Agg(al, "count", c) if c == a.input => al
    }

  /** Visible derived columns recomputed from the expanded parts:
    * avg = sum / count (NULL on the empty/all-NULL group). ONE
    * division — bit-identical to the oracle's SUM/COUNT quotient.
    */
  private def derived(aggs: Seq[Agg]): Seq[Column] = aggs.collect {
    case Agg(a, "avg", _) =>
      when(col(s"__${a}_c") === 0L, lit(null))
        .otherwise(col(s"__${a}_s").cast(DoubleType) / col(s"__${a}_c"))
        .cast(DoubleType).as(a)
  }

  /** Hidden maintenance columns: `__n` (live rows per group — the
    * group-liveness counter that decides tombstoning) and `__rv` (the
    * refresh's source version, the view table's seq column).
    */
  val RowCountCol = "__n"
  val RefreshCol = "__rv"

  def parseAggs(spec: String): Seq[Agg] = {
    val out = spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { s =>
      val eq = s.indexOf('=')
      val co = s.indexOf(':')
      require(eq > 0 && co > eq + 1 && co < s.length - 1,
        s"materialized view: bad aggregate spec '$s' " +
          "(want alias=kind:input, e.g. total=sum:cents or n=count:*)")
      val agg = Agg(s.substring(0, eq).trim,
        s.substring(eq + 1, co).trim.toLowerCase(java.util.Locale.ROOT),
        s.substring(co + 1).trim)
      require(Set("sum", "count", "min", "max", "avg")(agg.kind),
        s"materialized view: unsupported aggregate '${agg.kind}' " +
          "(have sum, count, min, max, avg)")
      require(agg.kind != "avg" || agg.input != "*",
        s"materialized view: avg needs a column input (${agg.alias})")
      require(agg.input != "*" || agg.kind == "count",
        s"materialized view: '*' input is only valid for count (${agg.alias})")
      agg
    }
    require(out.nonEmpty, "materialized view: empty aggregate spec")
    require(out.map(_.alias).distinct.size == out.size,
      s"materialized view: duplicate aggregate aliases in '$spec'")
    require(out.forall(!_.alias.startsWith("__")),
      s"materialized view: '__' aliases are reserved (hidden columns)")
    out
  }

  /** The full (non-incremental) aggregate — definition of the view's
    * content; `refresh` must converge to exactly this at every head.
    * Emits the expanded (stored) columns AND the derived quotients.
    */
  private def fullAggregate(
      src: DataFrame,
      groupCols: Seq[String],
      aggs: Seq[Agg]): DataFrame = {
    val ex = expand(aggs)
    val agged = src
      .groupBy(groupCols.map(col): _*)
      .agg(aggExpr(ex.head),
        (ex.tail.map(aggExpr) :+
          count(lit(1)).as(RowCountCol)): _*)
    agged.select(
      (groupCols.map(col) ++ ex.map(a => col(a.alias)) ++
        derived(aggs) :+ col(RowCountCol)): _*)
  }

  private def aggExpr(a: Agg): Column = a.kind match {
    case "sum" => sum(col(a.input)).as(a.alias)
    case "count" if a.input == "*" => count(lit(1)).as(a.alias)
    case "count" => count(col(a.input)).as(a.alias)
    case "min" => min(col(a.input)).as(a.alias)
    case "max" => max(col(a.input)).as(a.alias)
  }

  /** The aggregate's CHANGE over a retraction-encoded delta. sum/count
    * are self-maintainable under any delta; min/max are valid ONLY
    * over an insert-only delta (no `__mult < 0` rows) — the caller
    * checks retractions per range and falls back to the rescan path
    * when a delete could have removed the current extremum.
    */
  private def deltaExpr(a: Agg): Column = a.kind match {
    case "sum" => sum(col(a.input) * col("__mult")).as(a.alias)
    case "count" if a.input == "*" =>
      sum(col("__mult")).cast(LongType).as(a.alias)
    case "count" =>
      sum(when(col(a.input).isNotNull, col("__mult")).otherwise(0))
        .cast(LongType).as(a.alias)
    case "min" => min(col(a.input)).as(a.alias)
    case "max" => max(col(a.input)).as(a.alias)
  }

  private def hasMinMax(aggs: Seq[Agg]): Boolean =
    aggs.exists(a => a.kind == "min" || a.kind == "max")

  /** Observability counters for the min/max algebraic fast path:
    * insert-only ranges fold, delete-bearing ranges rescan.
    */
  val minmaxFoldCount = new java.util.concurrent.atomic.AtomicLong()
  val minmaxRescanCount = new java.util.concurrent.atomic.AtomicLong()

  // ------------------------------------------------------------------
  // AUTO-REFRESH INSIDE COMMITS + STALENESS. Every refresh self-
  // registers in the SOURCE table's `_dependents` sidecar (and records
  // its sources in its own `_mv_sources`), so (1) with
  // `spark.graft.autoRefreshMv=true` any commit to a source runs
  // refresh for every dependent view as part of the publish — the
  // autoAnalyze pattern: the cost is O(changed groups) of exactly the
  // buckets the commit already has hot — and (2) the view's `.detail`
  // reports its lag (source head versions minus applied) so a stale
  // view is observable, never silent. Off by default: streaming sinks
  // with strict latency budgets schedule refresh themselves.
  // ------------------------------------------------------------------

  private def sidecarLines(
      spark: SparkSession, dir: String, name: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  private def writeSidecar(
      spark: SparkSession, dir: String, name: String,
      lines: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def aggsSpecOf(aggs: Seq[Agg]): String =
    aggs.map(a => s"${a.alias}=${a.kind}:${a.input}").mkString(",")

  /** Idempotent registration, keyed by view dir (a re-definition
    * replaces its line). One small sidecar read per refresh; rewritten
    * only when the definition actually changed.
    */
  /** Serializes the _dependents read-filter-write within one JVM —
    * two views' first refreshes racing would otherwise lose one
    * registration. Cross-driver races remain possible but SELF-HEAL:
    * every refresh re-registers its own line, so a clobbered view
    * re-appears at its next refresh (and refresh_dependents /
    * autoRefreshMv pick it up from then on).
    */
  private val dependentsLock = new Object

  private def registerDependent(
      spark: SparkSession, srcDir: String, mvDir: String,
      line: String): Unit = dependentsLock.synchronized {
    val cur = sidecarLines(spark, srcDir, "_dependents")
    val kept = cur.filterNot(_.split('\t').lift(1).contains(mvDir))
    if (!cur.contains(line))
      writeSidecar(spark, srcDir, "_dependents", kept :+ line)
  }

  // shared sidecar surface for OTHER maintained dependents (the ANN
  // index rides the same `_dependents` registration + staleness
  // discipline — [[AnnCatalog]]); lines are tab-joined, field 1 is
  // always the dependent's dir (the dedup key)
  private[graft] def dependentLines(
      spark: SparkSession, srcDir: String): Seq[String] =
    sidecarLines(spark, srcDir, "_dependents")

  private[graft] def registerDependentLine(
      spark: SparkSession, srcDir: String, depDir: String,
      line: Seq[String]): Unit =
    registerDependent(spark, srcDir, depDir, line.mkString("\t"))

  /** Remove a dependent's registration (DROP TABLE of a view/index):
    * a ghost line would make every later source commit under
    * autoRefreshMv/autoRefreshAnn re-materialize — or fail against —
    * a table that no longer exists.
    */
  private[graft] def unregisterDependent(
      spark: SparkSession, srcDir: String,
      depDir: String): Unit = dependentsLock.synchronized {
    val cur = sidecarLines(spark, srcDir, "_dependents")
    val kept = cur.filterNot(_.split('\t').lift(1).contains(depDir))
    if (kept != cur) writeSidecar(spark, srcDir, "_dependents", kept)
  }

  private[graft] def sidecarOf(
      spark: SparkSession, dir: String, name: String): Seq[String] =
    sidecarLines(spark, dir, name)

  private[graft] def recordSidecar(
      spark: SparkSession, dir: String, name: String,
      lines: Seq[String]): Unit =
    if (sidecarLines(spark, dir, name) != lines)
      writeSidecar(spark, dir, name, lines)

  /** First line records the view's writer runId verbatim — `.detail`
    * may see the view under a QUALIFIED path (file:/…), so the id must
    * not be re-derived from the path string there.
    */
  private def recordSources(
      spark: SparkSession, mvDir: String, dirs: Seq[String],
      star: Boolean = false): Unit = {
    val kind = if (star) "runstar" else "run"
    val lines = s"$kind\t${mvRunId(mvDir)}" +: dirs
    if (sidecarLines(spark, mvDir, "_mv_sources") != lines)
      writeSidecar(spark, mvDir, "_mv_sources", lines)
  }

  /** Re-entrancy guard: a refresh commits to the VIEW table, whose own
    * publish would auto-refresh views-of-views — wanted — but a cycle
    * of definitions must not recurse forever.
    */
  private val inAutoRefresh =
    new ThreadLocal[java.util.HashSet[String]] {
      override def initialValue() = new java.util.HashSet[String]()
    }

  /** Spec observability: (view dir, groups written) of the most recent
    * auto-refresh sweep on this JVM.
    */
  val lastAutoRefresh =
    new java.util.concurrent.atomic.AtomicReference[Seq[(String, Long)]](Nil)

  /** Called from the commit publish path when
    * `spark.graft.autoRefreshMv` is set: refresh every registered
    * dependent of `srcDir`. Each refresh is independently exactly-once;
    * a failure propagates (the DATA commit is already published — the
    * view stays stale and observable via lag, never half-applied).
    */
  def autoRefresh(spark: SparkSession, srcDir: String): Unit = {
    val lines = sidecarLines(spark, srcDir, "_dependents")
    if (lines.isEmpty) return
    val set = inAutoRefresh.get()
    if (!set.add(srcDir)) return
    try {
      val results = lines.flatMap { l =>
        l.split('\t') match {
          case Array("single", mvDir, srcKey, group, aggsSpec, mode) =>
            Some(mvDir -> refreshDir(spark, srcDir, srcKey, mvDir,
              group.split(',').toSeq.map(_.trim), parseAggs(aggsSpec), mode))
          case Array("join", mvDir, fDir, fKey, dDir, dKey, fk, pk,
              group, aggsSpec, mode) =>
            Some(mvDir -> refreshJoinDir(spark, fDir, fKey, dDir, dKey,
              fk, pk, mvDir, group.split(',').toSeq.map(_.trim),
              parseAggs(aggsSpec), mode))
          case Array("star", mvDir, fDir, fKey, dimsSpec, group,
              aggsSpec, mode) =>
            Some(mvDir -> refreshStarDir(spark, fDir, fKey,
              parseStarDims(dimsSpec), mvDir,
              group.split(',').toSeq.map(_.trim),
              parseAggs(aggsSpec), mode))
          case _ => None
        }
      }
      lastAutoRefresh.set(results)
    } finally set.remove(srcDir)
  }

  /** The view's staleness: (its source dirs, lag in source versions not
    * yet applied). None when the dir is not a refreshed view (or never
    * refreshed — nothing applied to measure against). Surfaces in the
    * `.detail` metadata table as mv_sources / mv_lag_versions.
    */
  def viewLag(spark: SparkSession, mvDir: String): Option[(String, Long)] = {
    val lines = sidecarLines(spark, mvDir, "_mv_sources")
    if (lines.isEmpty) return None
    // star views: the applied-version VECTOR rides the newest commit's
    // manifest note; lag = total unapplied versions across all sources
    if (lines.head.startsWith("runstar\t")) {
      val srcs = lines.tail
      val runId = lines.head.split('\t') match {
        case Array("runstar", id) => id
        case _ => mvRunId(mvDir)
      }
      val vec = starVector(spark, mvDir, runId) match {
        case Some(v) if v.size == srcs.size => v
        case _ => return None // never refreshed (or torn sidecar)
      }
      val lag = srcs.zip(vec).map { case (s, a) =>
        MergeSink.lastCommit(spark, s).map(h => math.max(h.version - a, 0L))
          .getOrElse(0L)
      }.sum
      return Some((srcs.mkString(","), lag))
    }
    val runId = lines.head.split('\t') match {
      case Array("run", id) => id
      case _ => mvRunId(mvDir) // legacy sidecar without the id line
    }
    val srcs =
      if (lines.head.startsWith("run\t")) lines.tail else lines
    if (srcs.isEmpty) return None
    val applied = MergeSink.commits(spark, mvDir)
      .filter(_.runId == runId).map(_.epoch).maxOption
    applied.map { a =>
      val lag = srcs match {
        case Seq(s) =>
          MergeSink.lastCommit(spark, s).map(_.version - a).getOrElse(0L)
        case Seq(f, dm) =>
          val (f0, d0) = unpackVersions(a)
          val fh = MergeSink.lastCommit(spark, f)
            .map(_.version).getOrElse(f0)
          val dh = MergeSink.lastCommit(spark, dm)
            .map(_.version).getOrElse(d0)
          (fh - f0) + (dh - d0)
        case _ => 0L
      }
      (srcs.mkString(","), math.max(lag, 0L))
    }
  }

  /** Stable per-view writer identity: commits under it carry the
    * applied source version as their epoch. Digest of the view path —
    * runIds ride marker FILENAMES, so no separators allowed.
    */
  private def mvRunId(mvDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    "mv-" + md.digest(mvDir.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }

  /** Advance the view at `mvDir` to the source's current head.
    * Returns the number of groups written (0 = already current).
    * The FIRST refresh materializes the full aggregate; later ones go
    * through the incremental path of `mode` unless the last-applied
    * version fell out of source retention (full rebuild fallback).
    */
  def refreshDir(
      spark: SparkSession,
      srcDir: String,
      srcKey: String,
      mvDir: String,
      groupCols: Seq[String],
      aggs: Seq[Agg],
      mode: String): Long = {
    require(mode == "algebraic" || mode == "rescan",
      s"materialized view: unknown mode '$mode' (algebraic | rescan)")
    val groupCsv = groupCols.mkString(",")
    registerDependent(spark, srcDir, mvDir,
      Seq("single", mvDir, srcKey, groupCsv, aggsSpecOf(aggs), mode)
        .mkString("\t"))
    recordSources(spark, mvDir, Seq(srcDir))
    val runId = mvRunId(mvDir)
    val srcHead = MergeSink.lastCommit(spark, srcDir) match {
      case Some(c) => c.version
      case None => return 0L // unborn source: nothing to materialize
    }
    val applied = MergeSink.commits(spark, mvDir)
      .filter(_.runId == runId).map(_.epoch).maxOption
    if (applied.contains(srcHead)) return 0L

    def srcState: DataFrame =
      MergeSink.currentState(spark, srcDir).getOrElse(
        spark.emptyDataFrame)

    def fullRebuild(): Long = {
      val full = fullAggregate(srcState, groupCols, aggs)
        .withColumn(RefreshCol, lit(srcHead))
      MergeSink.overwriteBatch(
        full, mvDir, groupCsv, RefreshCol, epochId = srcHead, runId = runId)
      MergeSink.currentState(spark, mvDir).map(_.count()).getOrElse(0L)
    }

    applied match {
      case Some(fromV)
          if MergeSink.commits(spark, srcDir).exists(_.version == fromV) =>
        MergeSink.changeDelta(spark, srcDir, srcKey, fromV, srcHead) match {
          case None =>
            // data unchanged across the range (metadata-only commits):
            // record the applied head with an empty idempotent commit
            MergeSink.currentState(spark, mvDir).foreach(st =>
              MergeSink.upsertBatch(
                st.limit(0), mvDir, groupCsv, RefreshCol,
                epochId = srcHead, runId = runId))
            0L
          case Some(delta0) =>
            // the retraction probe is a SECOND consumer of the delta —
            // materialize once so probe + refresh share the blocks
            val delta =
              if (mode == "algebraic" && hasMinMax(aggs))
                delta0.localCheckpoint()
              else delta0
            mode match {
            case "algebraic"
                // min/max fold only over an insert-only range: a
                // retraction could remove the stored extremum, which
                // no fold can undo — those ranges rescan instead
                // (touched groups only; the common append-only case
                // keeps the O(changed keys) fold)
                if hasMinMax(aggs) && {
                  val retracting = delta
                    .filter(col("__mult") < 0).limit(1).count() > 0
                  if (retracting) minmaxRescanCount.incrementAndGet()
                  else minmaxFoldCount.incrementAndGet()
                  retracting
                } =>
              refreshRescan(
                spark, delta, srcState, mvDir, groupCols, aggs, groupCsv,
                srcHead, runId)
            case "algebraic" => refreshAlgebraic(
              spark, delta, mvDir, groupCols, aggs, groupCsv, srcHead, runId)
            case "rescan" => refreshRescan(
              spark, delta, srcState, mvDir, groupCols, aggs, groupCsv,
              srcHead, runId)
          }
        }
      case _ => fullRebuild()
    }
  }

  // ------------------------------------------------------------------
  // MV OVER A JOIN (star-schema IVM): view = GROUP BY over
  // `fact ⋈ dim ON fact.fk = dim.pk`. Delta-join maintenance — the
  // established algebra (F'⋈D' − F⋈D = ΔF⋈D' + F⋈ΔD, bag semantics):
  // the fact's retraction delta joins the dim's NEW state, the dim's
  // retraction delta joins the fact's OLD snapshot (time travel), and
  // the union folds through the same algebraic machinery as the
  // single-table view. A day of fact changes costs O(Δ ⋈ dim) — the
  // dim broadcast the fact commit already paid; a dim change costs one
  // semi-pruned fact pass against Δdim (rare for slowly-changing
  // dims, and inherent to delta-join IVM without an FK index).
  // ------------------------------------------------------------------

  /** Both applied versions ride ONE commit epoch: (factV << 31) | dimV.
    * 2^31 versions per table ≈ 68 years of per-second commits; the
    * pack is monotone in each head, so `maxOption` over commit epochs
    * keeps meaning "latest applied".
    */
  private val VBits = 31
  private def packVersions(f: Long, d: Long): Long = {
    require(f >= 0 && f < (1L << VBits) && d >= 0 && d < (1L << VBits),
      s"join view: versions out of packable range: fact=$f dim=$d")
    (f << VBits) | d
  }
  private def unpackVersions(e: Long): (Long, Long) =
    (e >> VBits, e & ((1L << VBits) - 1))

  /** Advance a JOIN view to both sources' heads. Same exactly-once
    * contract as [[refreshDir]] (runId = view identity, epoch = packed
    * source versions). Returns groups written (0 = already current).
    */
  def refreshJoinDir(
      spark: SparkSession,
      factDir: String,
      factKey: String,
      dimDir: String,
      dimKey: String,
      fk: String,
      pk: String,
      mvDir: String,
      groupCols: Seq[String],
      aggs: Seq[Agg],
      mode: String): Long = {
    require(mode == "algebraic" || mode == "rescan",
      s"materialized view: unknown mode '$mode' (algebraic | rescan)")
    val groupCsv = groupCols.mkString(",")
    val joinLine = Seq("join", mvDir, factDir, factKey, dimDir, dimKey,
      fk, pk, groupCsv, aggsSpecOf(aggs), mode).mkString("\t")
    registerDependent(spark, factDir, mvDir, joinLine)
    registerDependent(spark, dimDir, mvDir, joinLine)
    recordSources(spark, mvDir, Seq(factDir, dimDir))
    val runId = mvRunId(mvDir)
    val (fHead, dHead) = (
      MergeSink.lastCommit(spark, factDir).map(_.version),
      MergeSink.lastCommit(spark, dimDir).map(_.version)) match {
      case (Some(f), Some(dv)) => (f, dv)
      case _ => return 0L // a side unborn: nothing joinable yet
    }
    val packed = packVersions(fHead, dHead)
    val applied = MergeSink.commits(spark, mvDir)
      .filter(_.runId == runId).map(_.epoch).maxOption
    if (applied.contains(packed)) return 0L

    // the needed columns and which side serves each (must be unique)
    val needed = (groupCols ++
      expand(aggs).map(_.input).filter(_ != "*")).distinct
    def joinedCurrentOpt: Option[DataFrame] = for {
      f <- MergeSink.currentState(spark, factDir)
      dm <- MergeSink.currentState(spark, dimDir)
    } yield selectSides(f.as("f").join(dm.as("dm"),
      col(s"f.$fk") === col(s"dm.$pk"), "inner"), f, dm, needed, Nil)
    def fullRebuild(): Long = joinedCurrentOpt match {
      case None => 0L // a side holds no live rows yet: nothing to join
      case Some(j) =>
        val full = fullAggregate(j, groupCols, aggs)
          .withColumn(RefreshCol, lit(packed))
        MergeSink.overwriteBatch(
          full, mvDir, groupCsv, RefreshCol, epochId = packed, runId = runId)
        MergeSink.currentState(spark, mvDir).map(_.count()).getOrElse(0L)
    }

    applied match {
      case Some(prev) =>
        val (f0, d0) = unpackVersions(prev)
        val retainedF = MergeSink.commits(spark, factDir)
          .exists(_.version == f0)
        val retainedD = MergeSink.commits(spark, dimDir)
          .exists(_.version == d0)
        if (!retainedF || !retainedD) return fullRebuild()
        val dF = if (f0 == fHead) None
          else MergeSink.changeDelta(spark, factDir, factKey, f0, fHead)
        val dD = if (d0 == dHead) None
          else MergeSink.changeDelta(spark, dimDir, dimKey, d0, dHead)
        val parts = Seq.newBuilder[DataFrame]
        dF.foreach { df =>
          // ΔF ⋈ D' — mult rides the fact delta. D' is PINNED to the
          // dim head this refresh RECORDS (stateAt, not currentState):
          // a dim commit landing mid-refresh must not be absorbed now
          // and then re-applied by the next refresh's Δdim. An empty
          // dim side makes the inner join empty — contribute nothing.
          MergeSink.stateAt(spark, dimDir, dHead).foreach { dimNew =>
            parts += selectSides(
              df.as("f").join(dimNew.as("dm"),
                col(s"f.$fk") === col(s"dm.$pk"), "inner"),
              df, dimNew, needed, Seq(col("f.__mult").as("__mult")))
          }
        }
        dD.foreach { dd =>
          // F@f0 ⋈ ΔD — mult rides the dim delta; the fact side is the
          // OLD snapshot (time travel), exactly the algebra's F term.
          // An empty old fact makes the inner join empty — skip.
          MergeSink.stateAt(spark, factDir, f0).foreach { factOld =>
            parts += selectSides(
              factOld.as("f").join(dd.as("dm"),
                col(s"f.$fk") === col(s"dm.$pk"), "inner"),
              factOld, dd, needed, Seq(col("dm.__mult").as("__mult")))
          }
        }
        val deltas = parts.result()
        if (deltas.isEmpty) {
          // metadata-only movement on both sides: record the applied
          // heads with an empty idempotent commit
          MergeSink.currentState(spark, mvDir).foreach(st =>
            MergeSink.upsertBatch(
              st.limit(0), mvDir, groupCsv, RefreshCol,
              epochId = packed, runId = runId))
          return 0L
        }
        val delta0 = deltas.reduce(_ unionByName _)
        // for join views the delta IS the delta-join — materialize once
        // when the retraction probe adds a second consumer
        val delta =
          if (mode == "algebraic" && hasMinMax(aggs))
            delta0.localCheckpoint()
          else delta0
        mode match {
          case "algebraic"
              if hasMinMax(aggs) && {
                val retracting = delta
                  .filter(col("__mult") < 0).limit(1).count() > 0
                if (retracting) minmaxRescanCount.incrementAndGet()
                else minmaxFoldCount.incrementAndGet()
                retracting
              } =>
            refreshRescan(
              spark, delta,
              joinedCurrentOpt.getOrElse(delta.drop("__mult").limit(0)),
              mvDir, groupCols, aggs, groupCsv, packed, runId)
          case "algebraic" => refreshAlgebraic(
            spark, delta, mvDir, groupCols, aggs, groupCsv, packed, runId)
          case "rescan" => refreshRescan(
            spark, delta,
            joinedCurrentOpt.getOrElse(delta.drop("__mult").limit(0)),
            mvDir, groupCols, aggs, groupCsv, packed, runId)
        }
      case None => fullRebuild()
    }
  }

  // ------------------------------------------------------------------
  // STAR VIEWS: one fact ⋈ N dims. The delta algebra telescopes —
  // advancing the vector (a0, a1, …, an) to the heads (h0, h1, …, hn)
  // is N+1 SEQUENTIAL single-source passes, each the two-table
  // discipline refreshJoinDir already implements: pass i applies
  // Δsource_i ⋈ (every other source PINNED at its currently-applied
  // version) and commits with a PER-SOURCE writer id whose epoch is
  // source i's new head. Each pass is independently exactly-once (the
  // watermark lives in the commit log, per source — no out-of-band
  // state), a crash between passes leaves a consistent mixed cut that
  // the next refresh completes, and no bit-packing caps how many
  // versions any source may mint.
  // ------------------------------------------------------------------

  /** One dimension of a star view: its table dir, merge key, and the
    * fact-side / dim-side join columns.
    */
  final case class StarDim(dir: String, key: String, fk: String, pk: String)

  /** The star view's applied-version vector rides the commit artifact
    * itself — a `W mvv <v0>,<v1>,…` manifest note under the view's ONE
    * writer id, with `epoch = Σ versions` (strictly monotone: every
    * pass advances one component). The NEWEST commit therefore always
    * carries the whole vector, so no retention setting can age a
    * watermark out from under the view.
    */
  private def starNote(vs: Seq[Long]): String = "mvv " + vs.mkString(",")

  private def starVector(
      spark: SparkSession, mvDir: String, runId: String): Option[Seq[Long]] =
    MergeSink.commits(spark, mvDir).filter(_.runId == runId).lastOption
      .flatMap(c => MergeSink.manifestNote(spark, mvDir, c.version))
      .filter(_.startsWith("mvv "))
      .map(_.stripPrefix("mvv ").split(',').toSeq.map(_.trim.toLong))

  /** `dir,key,fk,pk;dir,key,fk,pk` — the registration-line encoding. */
  private[graft] def parseStarDims(spec: String): Seq[StarDim] =
    spec.split(';').toSeq.map(_.split(',') match {
      case Array(d, k, fk, pk) => StarDim(d, k, fk, pk)
      case other => throw new IllegalArgumentException(
        s"star view: bad dim spec '${other.mkString(",")}'")
    })

  /** Advance a STAR view (fact ⋈ dims) to every source's head. Returns
    * groups written across all passes (0 = already current everywhere).
    */
  def refreshStarDir(
      spark: SparkSession,
      factDir: String,
      factKey: String,
      dims: Seq[StarDim],
      mvDir: String,
      groupCols: Seq[String],
      aggs: Seq[Agg],
      mode: String): Long = {
    require(mode == "algebraic" || mode == "rescan",
      s"materialized view: unknown mode '$mode' (algebraic | rescan)")
    require(dims.nonEmpty, "star view: at least one dimension")
    val groupCsv = groupCols.mkString(",")
    val starLine = Seq("star", mvDir, factDir, factKey,
      dims.map(d => s"${d.dir},${d.key},${d.fk},${d.pk}").mkString(";"),
      groupCsv, aggsSpecOf(aggs), mode).mkString("\t")
    val srcDirs = factDir +: dims.map(_.dir)
    val srcKeys = factKey +: dims.map(_.key)
    srcDirs.foreach(d => registerDependent(spark, d, mvDir, starLine))
    recordSources(spark, mvDir, srcDirs, star = true)
    val heads: Seq[Long] = srcDirs.map(d =>
      MergeSink.lastCommit(spark, d).map(_.version) match {
        case Some(v) => v
        case None => return 0L // a side unborn: nothing joinable yet
      })
    val runId = mvRunId(mvDir)
    val appliedVec: Option[Seq[Long]] =
      starVector(spark, mvDir, runId).filter(_.size == srcDirs.size)
    if (appliedVec.contains(heads)) return 0L

    val needed = (groupCols ++
      expand(aggs).map(_.input).filter(_ != "*")).distinct

    /** Inner-join the given per-source frames in star shape
      * (s0 = fact; si = dim i) and project the needed columns, each
      * resolved on exactly one side; `multFrom` carries the delta
      * side's multiplicity through.
      */
    def joinStar(frames: Seq[DataFrame], multFrom: Option[Int]): DataFrame = {
      val aliased = frames.zipWithIndex.map { case (f, i) => f.as(s"s$i") }
      val joined = dims.zipWithIndex.foldLeft(aliased.head) {
        case (acc, (d, i)) =>
          acc.join(aliased(i + 1),
            col(s"s0.${d.fk}") === col(s"s${i + 1}.${d.pk}"), "inner")
      }
      val colSets = frames.map(_.columns.toSet - "__mult")
      val picks = needed.map { c =>
        colSets.zipWithIndex.filter(_._1.contains(c)) match {
          case Seq((_, i)) => col(s"s$i.$c").as(c)
          case Seq() => throw new IllegalArgumentException(
            s"star view: column '$c' exists on NO side")
          case many => throw new IllegalArgumentException(
            s"star view: column '$c' exists on sides " +
              s"${many.map(_._2).mkString(",")} — rename (view columns " +
              "must be unambiguous)")
        }
      }
      val extra = multFrom.toSeq.map(i => col(s"s$i.__mult").as("__mult"))
      joined.select(picks ++ extra: _*)
    }

    def statesAt(vs: Seq[Long]): Option[Seq[DataFrame]] = {
      val sts = srcDirs.zip(vs).map { case (d, v) =>
        MergeSink.stateAt(spark, d, v)
      }
      if (sts.forall(_.isDefined)) Some(sts.map(_.get)) else None
    }

    def emptyAdvance(target: Seq[Long]): Unit =
      MergeSink.currentState(spark, mvDir).foreach(st =>
        MergeSink.upsertBatch(st.limit(0), mvDir, groupCsv, RefreshCol,
          epochId = target.sum, runId = runId,
          note = Some(starNote(target))))

    def fullRebuild(): Long = {
      val joinedOpt = srcDirs.zipWithIndex
        .map { case (d, _) => MergeSink.currentState(spark, d) } match {
        case sts if sts.forall(_.isDefined) =>
          Some(joinStar(sts.map(_.get), None))
        case _ => None
      }
      joinedOpt match {
        case None => 0L // a side holds no live rows yet
        case Some(j) =>
          val full = fullAggregate(j, groupCols, aggs)
            .withColumn(RefreshCol, lit(heads.sum))
          MergeSink.overwriteBatch(
            full, mvDir, groupCsv, RefreshCol,
            epochId = heads.sum, runId = runId,
            note = Some(starNote(heads)))
          MergeSink.currentState(spark, mvDir).map(_.count()).getOrElse(0L)
      }
    }

    val allRetained = appliedVec.exists(vec =>
      srcDirs.indices.forall(i =>
        MergeSink.commits(spark, srcDirs(i))
          .exists(_.version == vec(i))))
    if (!allRetained) return fullRebuild()

    // sequential single-source passes over the working vector
    var cur = appliedVec.get.toIndexedSeq
    var written = 0L
    srcDirs.indices.foreach { i =>
      if (cur(i) != heads(i)) {
        val h = heads(i)
        val target = cur.updated(i, h)
        MergeSink.changeDelta(spark, srcDirs(i), srcKeys(i), cur(i), h) match {
          case None => emptyAdvance(target) // metadata-only movement
          case Some(delta) =>
            // every OTHER source pinned at its current working version
            // (earlier passes already advanced theirs — the telescoping
            // term Δi ⋈ ⨝_{j<i} Sj@head ⋈ ⨝_{j>i} Sj@applied)
            val others = statesAt(target)
            others match {
              case None =>
                // a pinned side holds no live rows: the inner join is
                // empty — advance the watermark with an empty commit
                emptyAdvance(target)
              case Some(sts) =>
                val delta0 = joinStar(sts.updated(i, delta), Some(i))
                val d =
                  if (mode == "algebraic" && hasMinMax(aggs))
                    delta0.localCheckpoint()
                  else delta0
                val rescan = mode == "rescan" ||
                  (hasMinMax(aggs) && {
                    val retracting =
                      d.filter(col("__mult") < 0).limit(1).count() > 0
                    if (retracting) minmaxRescanCount.incrementAndGet()
                    else minmaxFoldCount.incrementAndGet()
                    retracting
                  })
                written +=
                  (if (rescan)
                    refreshRescan(
                      spark, d,
                      // sts IS the pinned target-vector state (we are
                      // inside its Some) — the full star join at the
                      // versions this pass records
                      joinStar(sts, None),
                      mvDir, groupCols, aggs, groupCsv, target.sum,
                      runId, note = Some(starNote(target)))
                  else
                    refreshAlgebraic(
                      spark, d, mvDir, groupCols, aggs, groupCsv,
                      target.sum, runId, note = Some(starNote(target))))
            }
        }
        cur = target
      }
    }
    written
  }

  /** Qualified projection of the join: each needed column must live on
    * exactly ONE side — ambiguity rejects at refresh time, loudly.
    */
  private def selectSides(
      joined: DataFrame,
      fact: DataFrame,
      dim: DataFrame,
      needed: Seq[String],
      extra: Seq[Column]): DataFrame = {
    val fCols = fact.columns.toSet - "__mult"
    val dCols = dim.columns.toSet - "__mult"
    val picks = needed.map { c =>
      (fCols.contains(c), dCols.contains(c)) match {
        case (true, false) => col(s"f.$c").as(c)
        case (false, true) => col(s"dm.$c").as(c)
        case (true, true) => throw new IllegalArgumentException(
          s"join view: column '$c' exists on BOTH sides — rename one " +
            "(view columns must be unambiguous)")
        case _ => throw new IllegalArgumentException(
          s"join view: column '$c' exists on NEITHER side " +
            s"(fact: ${fCols.mkString(",")}; dim: ${dCols.mkString(",")})")
      }
    }
    joined.select(picks ++ extra: _*)
  }

  /** Fold the retraction delta into the stored aggregates: one grouped
    * pass over the delta, one key join against ONLY the changed view
    * rows, one upsert. A group whose live-row count reaches zero is
    * tombstoned out of the view.
    */
  private def refreshAlgebraic(
      spark: SparkSession,
      delta: DataFrame,
      mvDir: String,
      groupCols: Seq[String],
      aggs0: Seq[Agg],
      groupCsv: String,
      srcHead: Long,
      runId: String,
      reRegister: Boolean = false,
      note: Option[String] = None): Long = {
    val mvStored = MergeSink.currentState(spark, mvDir)
    // fold the stored (self-maintainable) parts. A view MATERIALIZED
    // BEFORE the sum-companion format lacks the hidden __<alias>_nn
    // columns — selecting them would fail the refresh outright; such a
    // legacy view keeps the plain additive fold (its pre-existing
    // all-NULL-sum edge) instead of breaking. Only COMPANIONS may be
    // dropped; a missing BASE column is a real schema error and still
    // fails loudly.
    val aggs = {
      val full = expand(aggs0)
      mvStored match {
        case Some(m) =>
          val have = m.columns.toSet
          val baseAliases = aggs0.flatMap {
            case Agg(a, "avg", c) => Seq(s"__${a}_s", s"__${a}_c")
            case Agg(a, _, _) => Seq(a)
          }.toSet
          full.filter(a => have.contains(a.alias) ||
            baseAliases.contains(a.alias))
        case None => full
      }
    }
    val dAgg = delta
      .groupBy(groupCols.map(col): _*)
      .agg(deltaExpr(aggs.head),
        (aggs.tail.map(deltaExpr) :+
          sum(col("__mult")).cast(LongType).as(RowCountCol)): _*)
    val mv = mvStored
      .getOrElse(dAgg.limit(0)) // view born empty (source was empty at create)
    val mvCols = (aggs.map(_.alias) :+ RowCountCol)
    val joined = dAgg.as("d").join(
      mv.select((groupCols ++ mvCols).map(col): _*).as("m"),
      groupCols, "left")
    // Three-branch fold: SQL aggregates IGNORE NULL inputs, so a delta
    // whose rows for a group are all NULL in the aggregated column
    // yields a NULL change — the stored value must pass through
    // unchanged (stored + NULL would poison it), and symmetrically a
    // stored NULL (group whose live rows are all NULL) takes the delta.
    def folded(c: String, merge: (Column, Column) => Column) = {
      val m = col(s"m.$c"); val d = col(s"d.$c")
      when(m.isNull, d).when(d.isNull, m).otherwise(merge(m, d))
    }
    def foldedAgg(a: Agg): Column = a.kind match {
      case "min" => folded(a.alias, least(_, _))
      case "max" => folded(a.alias, greatest(_, _))
      case "sum" =>
        // a group whose folded non-NULL-input count reaches 0 must
        // store NULL, not the additive residue (SQL SUM of an all-NULL
        // set is NULL) — the companion's fold decides
        sumCompanion(aggs, a) match {
          case Some(nn) =>
            when(folded(nn, _ + _) === 0L, lit(null))
              .otherwise(folded(a.alias, _ + _))
          case None => folded(a.alias, _ + _)
        }
      case _ => folded(a.alias, _ + _)
    }
    val foldedN = folded(RowCountCol, _ + _)
    val out = joined.select(
      (groupCols.map(col) ++
        aggs.map(a => foldedAgg(a).as(a.alias)) :+
        foldedN.cast(LongType).as(RowCountCol) :+
        lit(srcHead).as(RefreshCol) :+
        (foldedN === 0L).as(MergeSink.DeletedCol)): _*)
      // derived quotients recompute from the freshly-folded parts
      .select((col("*") +: derived(aggs0)): _*)
      .localCheckpoint() // computed once: the report count AND the commit
    val written = out.count() // O(changed groups) — the refresh's report
    MergeSink.upsertBatch(
      out, mvDir, groupCsv, RefreshCol, epochId = srcHead, runId = runId,
      reRegister = reRegister, note = note)
    written
  }

  /** Recompute ONLY the groups the delta touched: semi-join-pruned
    * source pass, anti-join for groups that vanished entirely.
    */
  private def refreshRescan(
      spark: SparkSession,
      delta: DataFrame,
      srcState: DataFrame,
      mvDir: String,
      groupCols: Seq[String],
      aggs: Seq[Agg],
      groupCsv: String,
      srcHead: Long,
      runId: String,
      reRegister: Boolean = false,
      note: Option[String] = None): Long = {
    val touched = delta.select(groupCols.map(col): _*).distinct()
    val recomputed = fullAggregate(
      srcState.join(touched, groupCols, "left_semi"), groupCols, aggs)
    val tombAliases = expand(aggs).map(_.alias) ++
      aggs.collect { case Agg(a, "avg", _) => a }
    val vanished = touched
      .join(recomputed, groupCols, "left_anti")
      .select((groupCols.map(col) ++
        tombAliases.map(a => lit(null).as(a)) :+
        lit(0L).as(RowCountCol)): _*)
    val out = recomputed
      .withColumn(MergeSink.DeletedCol, lit(false))
      .unionByName(vanished.withColumn(MergeSink.DeletedCol, lit(true)))
      .withColumn(RefreshCol, lit(srcHead))
      .localCheckpoint() // computed once: the report count AND the commit
    val written = out.count()
    MergeSink.upsertBatch(
      out, mvDir, groupCsv, RefreshCol, epochId = srcHead, runId = runId,
      reRegister = reRegister, note = note)
    written
  }

  // ------------------------------------------------------------------
  // Catalog surface: the view definition persists as table properties
  // of the (ordinary) materialized table — `CALL cat.sys.create_mv
  // ('db.mv', 'db.src', 'grp', 'total=sum:cents,n=count:*',
  // 'algebraic')` then `CALL cat.sys.refresh_mv('db.mv')`.
  // ------------------------------------------------------------------

  private[sources] def mvSchema(
      srcSchema: StructType,
      groupCols: Seq[String],
      aggs: Seq[Agg]): StructType = {
    def srcField(c: String): StructField = srcSchema.fields
      .find(_.name == c)
      .getOrElse(throw new IllegalArgumentException(
        s"materialized view: column '$c' not in source schema " +
          srcSchema.fieldNames.mkString("(", ",", ")")))
    def sumType(t: DataType): DataType = t match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
        LongType
      case d: DecimalType => // Spark's sum widening: +10 integral digits
        DecimalType(math.min(d.precision + 10, DecimalType.MAX_PRECISION),
          d.scale)
      case _ => DoubleType
    }
    StructType(
      groupCols.map(srcField) ++
        expand(aggs).map {
          case Agg(a, "count", _) => StructField(a, LongType)
          case Agg(a, "sum", c) => StructField(a, sumType(srcField(c).dataType))
          case Agg(a, _, c) => StructField(a, srcField(c).dataType)
        } ++
        aggs.collect { case Agg(a, "avg", _) => StructField(a, DoubleType) } ++
        Seq(StructField(RowCountCol, LongType),
          StructField(RefreshCol, LongType)))
  }

  private[sources] def create(
      spark: SparkSession,
      cat: GraftCatalog,
      mvIdent: String,
      srcIdent: String,
      groupCols: Seq[String],
      aggs: Seq[Agg],
      mode: String): Long = {
    require(mode == "algebraic" || mode == "rescan",
      s"create_mv: unknown mode '$mode' (algebraic | rescan)")
    val srcOpts = cat.tableOptions(identOf(srcIdent))
    val srcSchema = DataType.fromJson(srcOpts("schema"))
      .asInstanceOf[StructType]
    val schema = mvSchema(srcSchema, groupCols, aggs)
    val P = org.apache.spark.sql.connector.catalog.TableCatalog.OPTION_PREFIX
    val props = new java.util.HashMap[String, String]()
    props.put("key", groupCols.mkString(","))
    props.put("seq", RefreshCol)
    // OPTION_PREFIX: createTable persists (and tableOptions returns)
    // prefixed options as bare-keyed table properties
    props.put(P + "graft.mv.source", srcIdent)
    props.put(P + "graft.mv.group", groupCols.mkString(","))
    props.put(P + "graft.mv.aggs",
      aggs.map(a => s"${a.alias}=${a.kind}:${a.input}").mkString(","))
    props.put(P + "graft.mv.mode", mode)
    cat.createTable(identOf(mvIdent), schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props)
    refresh(spark, cat, mvIdent)
  }

  /** Define a JOIN view in the catalog: `CALL cat.sys.create_mv_join
    * ('db.mv', 'db.fact', 'db.dim', 'fk=pk', 'grp', 'total=sum:cents',
    * 'algebraic')`. Persists the two-table definition as `graft.mv.*`
    * properties and runs the first (full) refresh.
    */
  private[sources] def createJoin(
      spark: SparkSession,
      cat: GraftCatalog,
      mvIdent: String,
      factIdent: String,
      dimIdent: String,
      on: String,
      groupCols: Seq[String],
      aggs: Seq[Agg],
      mode: String): Long = {
    require(mode == "algebraic" || mode == "rescan",
      s"create_mv_join: unknown mode '$mode' (algebraic | rescan)")
    val (fk, pk) = on.split('=') match {
      case Array(a, b) => (a.trim, b.trim)
      case _ => throw new IllegalArgumentException(
        s"create_mv_join: bad join spec '$on' (want 'fact_fk=dim_pk')")
    }
    val factOpts = cat.tableOptions(identOf(factIdent))
    val dimOpts = cat.tableOptions(identOf(dimIdent))
    val factSchema = DataType.fromJson(factOpts("schema"))
      .asInstanceOf[StructType]
    val dimSchema = DataType.fromJson(dimOpts("schema"))
      .asInstanceOf[StructType]
    // resolve each view column on exactly one side
    val joint = StructType(factSchema.fields ++
      dimSchema.fields.filterNot(f =>
        factSchema.fieldNames.contains(f.name)))
    val schema = mvSchema(joint, groupCols, aggs)
    val P = org.apache.spark.sql.connector.catalog.TableCatalog.OPTION_PREFIX
    val props = new java.util.HashMap[String, String]()
    props.put("key", groupCols.mkString(","))
    props.put("seq", RefreshCol)
    props.put(P + "graft.mv.source", factIdent)
    props.put(P + "graft.mv.dim", dimIdent)
    props.put(P + "graft.mv.on", s"$fk=$pk")
    props.put(P + "graft.mv.group", groupCols.mkString(","))
    props.put(P + "graft.mv.aggs",
      aggs.map(a => s"${a.alias}=${a.kind}:${a.input}").mkString(","))
    props.put(P + "graft.mv.mode", mode)
    cat.createTable(identOf(mvIdent), schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props)
    refresh(spark, cat, mvIdent)
  }

  /** Define a STAR view in the catalog: `CALL cat.sys.create_mv_star
    * ('db.mv', 'db.fact', 'db.d1:fk1=pk1;db.d2:fk2=pk2', 'grp',
    * 'total=sum:cents', 'algebraic')` — one fact ⋈ N dims maintained
    * by per-source delta-join IVM ([[refreshStarDir]]).
    */
  private[sources] def createStar(
      spark: SparkSession,
      cat: GraftCatalog,
      mvIdent: String,
      factIdent: String,
      dimsSpec: String,
      groupCols: Seq[String],
      aggs: Seq[Agg],
      mode: String): Long = {
    require(mode == "algebraic" || mode == "rescan",
      s"create_mv_star: unknown mode '$mode' (algebraic | rescan)")
    val dims = dimsSpec.split(';').toSeq.map(_.trim).filter(_.nonEmpty)
      .map { s =>
        s.split(':') match {
          case Array(ident, on) => on.split('=') match {
            case Array(fk, pk) => (ident.trim, fk.trim, pk.trim)
            case _ => throw new IllegalArgumentException(
              s"create_mv_star: bad join spec '$on' (want 'fk=pk')")
          }
          case _ => throw new IllegalArgumentException(
            s"create_mv_star: bad dim spec '$s' (want 'db.dim:fk=pk')")
        }
      }
    require(dims.nonEmpty, "create_mv_star: at least one dimension")
    val factOpts = cat.tableOptions(identOf(factIdent))
    val factSchema = DataType.fromJson(factOpts("schema"))
      .asInstanceOf[StructType]
    val joint = dims.foldLeft(factSchema) { case (acc, (ident, _, _)) =>
      val ds = DataType.fromJson(
        cat.tableOptions(identOf(ident))("schema"))
        .asInstanceOf[StructType]
      StructType(acc.fields ++
        ds.fields.filterNot(f => acc.fieldNames.contains(f.name)))
    }
    val schema = mvSchema(joint, groupCols, aggs)
    val P = org.apache.spark.sql.connector.catalog.TableCatalog.OPTION_PREFIX
    val props = new java.util.HashMap[String, String]()
    props.put("key", groupCols.mkString(","))
    props.put("seq", RefreshCol)
    props.put(P + "graft.mv.source", factIdent)
    props.put(P + "graft.mv.dims",
      dims.map { case (i, fk, pk) => s"$i:$fk=$pk" }.mkString(";"))
    props.put(P + "graft.mv.group", groupCols.mkString(","))
    props.put(P + "graft.mv.aggs",
      aggs.map(a => s"${a.alias}=${a.kind}:${a.input}").mkString(","))
    props.put(P + "graft.mv.mode", mode)
    cat.createTable(identOf(mvIdent), schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props)
    refresh(spark, cat, mvIdent)
  }

  private[sources] def refresh(
      spark: SparkSession,
      cat: GraftCatalog,
      mvIdent: String): Long = {
    val mvOpts = cat.tableOptions(identOf(mvIdent))
    val srcIdent = mvOpts.getOrElse("graft.mv.source",
      throw new IllegalArgumentException(
        s"refresh_mv: '$mvIdent' is not a materialized view " +
          "(no graft.mv.source property)"))
    val srcOpts = cat.tableOptions(identOf(srcIdent))
    val groupCols = mvOpts("graft.mv.group").split(',').toSeq.map(_.trim)
    val aggs = parseAggs(mvOpts("graft.mv.aggs"))
    val mode = mvOpts.getOrElse("graft.mv.mode", "algebraic")
    mvOpts.get("graft.mv.dims").foreach { dimsSpec =>
      val dims = dimsSpec.split(';').toSeq.map { s =>
        val Array(ident, on) = s.split(':')
        val Array(fk, pk) = on.split('=').map(_.trim)
        val dOpts = cat.tableOptions(identOf(ident.trim))
        StarDim(dOpts("path"), dOpts("key"), fk, pk)
      }
      return refreshStarDir(
        spark,
        factDir = srcOpts("path"), factKey = srcOpts("key"),
        dims = dims,
        mvDir = mvOpts("path"),
        groupCols = groupCols, aggs = aggs, mode = mode)
    }
    mvOpts.get("graft.mv.dim") match {
      case Some(dimIdent) =>
        val dimOpts = cat.tableOptions(identOf(dimIdent))
        val Array(fk, pk) = mvOpts("graft.mv.on").split('=').map(_.trim)
        refreshJoinDir(
          spark,
          factDir = srcOpts("path"), factKey = srcOpts("key"),
          dimDir = dimOpts("path"), dimKey = dimOpts("key"),
          fk = fk, pk = pk,
          mvDir = mvOpts("path"),
          groupCols = groupCols, aggs = aggs, mode = mode)
      case None =>
        refreshDir(
          spark,
          srcDir = srcOpts("path"),
          srcKey = srcOpts("key"),
          mvDir = mvOpts("path"),
          groupCols = groupCols,
          aggs = aggs,
          mode = mode)
    }
  }

  /** CONTINUOUSLY MAINTAINED VIEW: a streaming sink whose every
    * micro-batch (1) upserts into the source table and (2) advances
    * the view to the new head — both exactly-once (the source by the
    * sink's (queryId, epoch) contract, the refresh by its own
    * (runId, source version) contract), so a crash ANYWHERE replays
    * into no-ops and the view is never more than one in-flight
    * micro-batch behind its source. The streaming dual of
    * `refresh_dependents`: the analytic state stays queryable and
    * fresh while data lands.
    */
  def maintainedSink(
      df: DataFrame,
      srcDir: String,
      srcKey: String,
      srcSeq: String,
      checkpoint: String,
      mvDir: String,
      groupCols: Seq[String],
      aggs: Seq[Agg],
      mode: String): org.apache.spark.sql.streaming.DataStreamWriter[
    org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val runId = Option(
          batch.sparkSession.sparkContext
            .getLocalProperty("sql.streaming.queryId"))
          .getOrElse(
            java.util.UUID
              .nameUUIDFromBytes(checkpoint.getBytes("UTF-8"))
              .toString)
        MergeSink.upsertBatch(
          batch, srcDir, srcKey, srcSeq, epochId, runId)
        refreshDir(
          batch.sparkSession, srcDir, srcKey, mvDir, groupCols, aggs, mode)
        ()
      }

  /** Refresh EVERY materialized view whose `graft.mv.source` names
    * `srcIdent` (one catalog listing, then per-view [[refresh]] —
    * each independently exactly-once). Returns (view, groups written).
    * The post-commit maintenance move: land data, then
    * `CALL refresh_dependents('db.src')` brings every derived table
    * to the new head.
    */
  private[sources] def refreshDependents(
      spark: SparkSession,
      cat: GraftCatalog,
      srcIdent: String): Seq[(String, Long)] = {
    val srcNs = identOf(srcIdent).namespace().toSeq
    val want = identKey(srcIdent)
    // arrays compare by identity — dedup namespaces as Seqs
    (cat.listNamespaces().toSeq.map(_.toSeq) :+ srcNs).distinct.flatMap {
      ns =>
        cat.listTables(ns.toArray).toSeq.flatMap { id =>
          val full = (id.namespace() :+ id.name()).mkString(".")
          val opts = cat.tableOptions(id)
          // a JOIN view depends on BOTH its fact and its dim; a STAR
          // view on its fact and EVERY dim
          val sources =
            opts.get("graft.mv.source").toSeq ++
              opts.get("graft.mv.dim") ++
              opts.get("graft.mv.dims").toSeq
                .flatMap(_.split(';').map(_.split(':').head.trim))
          if (sources.exists(s => identKey(s) == want))
            Some(full -> refresh(spark, cat, full))
          else None
        }
    }
  }

  /** Identifier equality for dependency matching: namespace + name,
    * case-insensitively — `DB.Src` and `db.src` name the same table
    * (Spark resolves identifiers case-insensitively), and a raw
    * string compare would silently skip an equivalent spelling.
    */
  private def identKey(s: String): (Seq[String], String) = {
    val id = identOf(s)
    (id.namespace().toSeq.map(_.toLowerCase(java.util.Locale.ROOT)),
      id.name().toLowerCase(java.util.Locale.ROOT))
  }

  private[sources] def identOf(s: String)
      : org.apache.spark.sql.connector.catalog.Identifier = {
    val parts = s.split("\\.")
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"materialized view: bad table identifier '$s'")
    org.apache.spark.sql.connector.catalog.Identifier
      .of(parts.dropRight(1), parts.last)
  }
}
