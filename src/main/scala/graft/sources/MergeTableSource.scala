package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal, XxHash64}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualNullSafe, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.MergeSink

/** `graft-merge` — a DataSourceV2 connector over the [[MergeSink]]
  * transactional merge table, so the table reads like any other Spark
  * source instead of only through library calls:
  *
  * {{{
  *   spark.read.format("graft-merge")
  *     .option("path", dir).option("key", "user_id").load()
  *   spark.readStream.format("graft-merge")
  *     .option("path", dir).option("cdc", "true").load()
  * }}}
  *
  * BATCH: the current committed snapshot (tombstones hidden, exactly
  * [[MergeSink.currentState]]). The ScanBuilder implements
  * `SupportsPushDownFilters` + `SupportsPushDownRequiredColumns`:
  * an `=` / `IN` predicate on the merge KEY prunes the scan to the
  * buckets those keys hash into — the [[MergeSink.pointLookup]] logic
  * moved INTO the source, where Catalyst's own pushdown drives it. At
  * 100 TB a point read plans O(keys) bucket files of O(100 MB–1 GB),
  * never the table; column pruning reaches the parquet projection the
  * same way (`ReadSchema` is the pruned struct).
  *
  * STREAMING (`cdc=true`): a `MicroBatchStream` that REPLAYS THE COMMIT
  * LOG — each offset is a committed version; each micro-batch emits the
  * bucket files that version physically wrote, tagged `_version` /
  * `_bucket`, with tombstones retained. This is the dual of the
  * reference WAL's ordered replay (/root/reference/src/opusdb/logging/
  * log_mgr.clj:16-33 — `seq` walks records oldest-first so a consumer
  * reconstructs state; `:46-66` appends with monotone LSNs): version
  * numbers are the LSNs, marker files the durable log, and a downstream
  * query folds the replayed epochs back into state or a change feed.
  * Replay reaches only versions still inside the retention window
  * (GC keeps current + previous, like any CDF retention contract);
  * asking for a collected version fails loudly rather than silently
  * skipping committed history.
  *
  * The reader is a real parquet `PartitionReader[InternalRow]` (one
  * partition per data file — the natural split unit, since a bucket is
  * the copy-on-write granularity): footer-projected columns, per-file
  * schema reconciliation (a column absent from an older file reads as
  * NULL — the mixed-schema CDC case), no driver-side row movement.
  */
class GraftMergeProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-merge"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val dir = MergeTableUtil.dirOf(options)
    val cdc = options.getBoolean("cdc", false)
    val visible = MergeTableUtil.dataSchema(spark, dir)
    if (cdc)
      StructType(
        visible.fields.toSeq ++
          (if (visible.fieldNames.contains(MergeSink.DeletedCol)) Nil
           else Seq(StructField(MergeSink.DeletedCol, BooleanType))) ++
          Seq(
            StructField(MergeTableUtil.VersionCol, LongType, nullable = false),
            StructField(MergeTableUtil.BucketCol, IntegerType, nullable = false)))
    else
      StructType(visible.fields.filterNot(_.name == MergeSink.DeletedCol))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftMergeTable(schema, properties.asScala.toMap)

  // writes to a not-yet-committed table must not trip schema inference:
  // the incoming DataFrame's schema IS the metadata
  override def supportsExternalMetadata(): Boolean = true
}

private[graft] object MergeTableUtil {
  val VersionCol = "_version"
  val BucketCol = "_bucket"

  def dirOf(options: CaseInsensitiveStringMap): String = {
    val d = options.get("path")
    require(d != null && d.nonEmpty, "graft-merge: option 'path' is required")
    d
  }

  /** Physical data schema of the CURRENT snapshot: union-by-name of the
    * manifest files' footers (mixed schemas arise from CDC batches onto
    * pre-CDC tables). Driver-side O(files) metadata reads — the same
    * listing planning already does.
    */
  def dataSchema(spark: SparkSession, dir: String): StructType = {
    val c = MergeSink
      .lastCommit(spark, dir)
      .getOrElse(throw new IllegalArgumentException(
        s"graft-merge: no committed version at $dir"))
    val files = currentDataFiles(spark, dir, c.version).values.flatMap(_._2).toSeq
    require(files.nonEmpty, s"graft-merge: committed version ${c.version} references no data files")
    val conf = spark.sessionState.newHadoopConf()
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    files.foreach { f =>
      footerOf(conf, f).getFields.asScala.foreach { t =>
        val p = t.asPrimitiveType()
        val sf = sparkFieldOf(p)
        fields.get(sf.name) match {
          case Some(prev) =>
            require(prev.dataType == sf.dataType,
              s"graft-merge: column ${sf.name} has conflicting types " +
                s"${prev.dataType} vs ${sf.dataType} across bucket files")
          case None => fields += sf.name -> sf
        }
      }
    }
    StructType(fields.values.toSeq)
  }

  def footerOf(conf: Configuration, file: String): MessageType = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try r.getFooter.getFileMetaData.getSchema
    finally r.close()
  }

  /** Spark type for one flat parquet primitive (the merge table is flat
    * by construction — Spark wrote its buckets).
    */
  def sparkFieldOf(f: PrimitiveType): StructField = {
    def tsAnn = f.getLogicalTypeAnnotation match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => Some(t)
      case _ => None
    }
    // An annotated INT32/INT64 whose annotation we don't model (decimal,
    // date, unsigned int …) must FAIL, not silently surface the physical
    // value (an unscaled decimal read as a plain long is the same
    // silent-misdecode class the BINARY arm below guards against).
    def requirePlainInt(width: Int): Unit = f.getLogicalTypeAnnotation match {
      case null => ()
      case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
          if i.getBitWidth == width && i.isSigned => ()
      case other =>
        throw new IllegalArgumentException(
          s"graft-merge: INT$width column ${f.getName} carries logical type " +
            s"$other — would silently misdecode as a plain INT$width; " +
            "flat Spark-written primitive buckets only")
    }
    val t: DataType = f.getPrimitiveTypeName match {
      case INT64 =>
        tsAnn match {
          case Some(a) if a.getUnit == TimeUnit.NANOS =>
            throw new IllegalArgumentException(
              s"graft-merge: TIMESTAMP(NANOS) column ${f.getName} unsupported " +
                "(merge buckets are Spark-written MICROS/MILLIS)")
          case Some(a) => if (a.isAdjustedToUTC) TimestampType else TimestampNTZType
          case None => requirePlainInt(64); LongType
        }
      case INT32 => requirePlainInt(32); IntegerType
      case DOUBLE => DoubleType
      case FLOAT => FloatType
      case BOOLEAN => BooleanType
      case BINARY if f.getLogicalTypeAnnotation
            .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        StringType
      case other =>
        throw new IllegalArgumentException(
          s"graft-merge: unsupported parquet primitive $other for ${f.getName}")
    }
    StructField(f.getName, t)
  }

  /** bucket -> (content version, data files) of one committed version.
    * The content version is the manifest entry — the commit that WROTE
    * the bucket's current files, which a CDC batch read surfaces as
    * `_version` (never a placeholder).
    */
  def currentDataFiles(
      spark: SparkSession,
      dir: String,
      version: Long): Map[Int, (Long, Seq[String])] = {
    val conf = spark.sessionState.newHadoopConf()
    MergeSink.manifest(spark, dir, version).map { case (b, v) =>
      val d = new Path(s"$dir/data/b$b/v$v")
      val fs = d.getFileSystem(conf)
      val files =
        if (!fs.exists(d)) Seq.empty[String]
        else fs.listStatus(d).iterator.map(_.getPath.toString)
          .filter(_.endsWith(".parquet")).toSeq.sorted
      b -> (v, files)
    }
  }

  /** The same bucket function the writer used (`pmod(xxhash64(k), nb)`),
    * evaluated driver-side on a literal — metadata, not a job.
    */
  def bucketOf(value: Any, dt: DataType, nb: Int): Int = {
    val h = XxHash64(Seq(Literal.create(value, dt)), 42L)
      .eval(InternalRow.empty).asInstanceOf[Long]
    (((h % nb) + nb) % nb).toInt
  }
}

class GraftMergeTable(tableSchema: StructType, properties: Map[String, String])
    extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft-merge `${properties.getOrElse("path", "?")}`"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftMergeScanBuilder(
      SparkSession.active,
      MergeTableUtil.dirOf(options),
      Option(options.get("key")),
      options.getBoolean("cdc", false),
      Option(options.get("versionAsOf")).map(_.toLong),
      tableSchema)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    def opt(name: String): String =
      Option(info.options.get(name))
        .orElse(properties.get(name))
        .getOrElse(throw new IllegalArgumentException(
          s"graft-merge write: option '$name' is required (merge semantics)"))
    new GraftMergeWriteBuilder(opt("path"), opt("key"), opt("seq"), info)
  }
}

class GraftMergeScanBuilder(
    spark: SparkSession,
    dir: String,
    keyCol: Option[String],
    cdc: Boolean,
    versionAsOf: Option[Long],
    fullSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** Key values extracted from prunable predicates, or None = no pruning. */
  private var keyValues: Option[Seq[Any]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val prunable = keyCol.map { k =>
      filters.collect {
        case f @ EqualTo(`k`, v) => (f, Seq(v))
        case f @ EqualNullSafe(`k`, v) if v != null => (f, Seq(v))
        case f @ In(`k`, vs) if vs.nonEmpty && !vs.contains(null) => (f, vs.toSeq)
      }
    }.getOrElse(Array.empty[(Filter, Seq[Any])])
    if (prunable.nonEmpty) {
      pushed = prunable.map(_._1)
      // conjunctive semantics: each prunable conjunct is a superset bound,
      // so the candidate key set is the smallest conjunct's value set
      keyValues = Some(prunable.map(_._2).minBy(_.size))
    }
    // every filter stays post-scan (Spark re-evaluates): pruning is a
    // FILE-level optimization, rows inside a surviving bucket still need
    // the predicate
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep declared order; empty projection (count(*)) keeps zero fields
    required = StructType(
      fullSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))
  }

  override def build(): Scan =
    new GraftMergeScan(
      spark, dir, keyCol, cdc, versionAsOf, fullSchema, required, keyValues, pushed)
}

/** One data file of one bucket (and, for streaming, the commit version
  * that wrote it).
  */
case class MergeFilePartition(file: String, bucket: Int, version: Long)
    extends InputPartition

object GraftMergeScan {
  /** Observability hook for tests: (planned files, total files,
    * runtime-filtered?) of the most recent batch planning.
    */
  val lastPrune =
    new java.util.concurrent.atomic.AtomicReference[(Int, Int, Boolean)]()
}

class GraftMergeScan(
    spark: SparkSession,
    dir: String,
    keyCol: Option[String],
    cdc: Boolean,
    versionAsOf: Option[Long],
    fullSchema: StructType,
    required: StructType,
    keyValues: Option[Seq[Any]],
    pushed: Array[Filter])
    extends Scan
    with SupportsRuntimeFiltering
    with SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** Size the optimizer plans with = bytes of the files this scan will
    * actually read (post bucket pruning) — without this a V2 relation
    * reports the huge default and a joined merge table can never be
    * broadcast; with it a pruned point read is stats-visible as tiny.
    */
  override def estimateStatistics(): Statistics = {
    val conf = spark.sessionState.newHadoopConf()
    val bytes = plannedFiles(currentFiles()).map { part =>
      val p = new Path(part.file)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  // -------------------------------------------------------------------
  // RUNTIME FILTERING (the DSv2 dual of dynamic partition pruning):
  // when this table joins a selective build side on the merge KEY,
  // Spark hands the build side's key values here at execution time and
  // the scan re-plans to only the buckets those keys hash into — at
  // 100 TB a fact-to-dim join reads O(build-side keys) buckets instead
  // of the table, with no predicate in the query text at all.
  // -------------------------------------------------------------------
  @volatile private var runtimeKeys: Option[Seq[Any]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    keyCol
      .map(k => Array(
        org.apache.spark.sql.connector.expressions.Expressions.column(k)))
      .getOrElse(Array.empty)

  override def filter(filters: Array[Filter]): Unit = {
    runtimeKeys = keyCol.flatMap { k =>
      filters.collectFirst {
        case In(`k`, vs) if vs.nonEmpty => vs.filter(_ != null).toSeq
        case EqualTo(`k`, v) if v != null => Seq(v)
      }
    }
  }

  /** (planned, total) bucket-file counts of the batch scan — the
    * observable pruning contract PlanSpec asserts on.
    */
  lazy val fileCounts: (Int, Int) = {
    val all = currentFiles()
    (plannedFiles(all).size, all.values.map(_._2.size).sum)
  }

  /** TIME TRAVEL: the snapshot version this scan reads — `versionAsOf`
    * when given (must still be committed AND inside the retention
    * window — a collected version fails loudly, never reads partial
    * state), else the current head.
    */
  private def resolvedVersion: Option[Long] = versionAsOf match {
    case Some(v) =>
      require(
        MergeSink.commits(spark, dir).exists(_.version == v) &&
          MergeSink.manifest(spark, dir, v).nonEmpty,
        s"graft-merge: versionAsOf=$v is not a committed, retained " +
          s"version of $dir (retention keeps current + previous)")
      Some(v)
    case None => MergeSink.lastCommit(spark, dir).map(_.version)
  }

  private def currentFiles(): Map[Int, (Long, Seq[String])] =
    resolvedVersion match {
      case None => Map.empty
      case Some(v) => MergeTableUtil.currentDataFiles(spark, dir, v)
    }

  private def plannedFiles(
      all: Map[Int, (Long, Seq[String])]): Seq[MergeFilePartition] = {
    // an empty/never-committed table (reachable with a user-supplied
    // schema via supportsExternalMetadata) is an empty scan, never a
    // resolvedVersion.get throw
    if (all.isEmpty) {
      GraftMergeScan.lastPrune.set((0, 0, runtimeKeys.isDefined))
      return Seq.empty
    }
    // compile-time pushed keys AND runtime (join-driven) keys each bound
    // the bucket set; both present -> intersection
    val keySets = Seq(keyValues, runtimeKeys).flatten
    val buckets =
      if (keySets.isEmpty) all.keySet
      else {
        val dt = keyCol.flatMap(k => fullSchema.fields.find(_.name == k))
          .map(_.dataType)
          .getOrElse(LongType)
        // nb must be the WRITER's bucket count, from the manifest header
        // of the version this scan reads
        val writerNb = MergeSink.bucketCount(spark, dir, resolvedVersion.get)
        keySets
          .map(vs => vs.map(v => MergeTableUtil.bucketOf(v, dt, writerNb)).toSet)
          .reduce(_ intersect _)
      }
    // _version of a batch-read row = the manifest's content version for
    // its bucket (the commit that wrote the file), same meaning as replay
    val planned = all.toSeq.sortBy(_._1)
      .filter { case (b, _) => buckets.contains(b) }
      .flatMap { case (b, (cv, fs)) => fs.map(f => MergeFilePartition(f, b, cv)) }
    GraftMergeScan.lastPrune.set(
      (planned.size, all.values.map(_._2.size).sum, runtimeKeys.isDefined))
    planned
  }

  override def description(): String = {
    val (planned, total) = fileCounts
    val pk = keyValues.map(_.mkString("[", ",", "]")).getOrElse("none")
    val asOf = versionAsOf.map(v => s" versionAsOf=$v").getOrElse("")
    s"GraftMergeScan dir=$dir$asOf files=$planned/$total prunedKeys=$pk " +
      s"pushed=${pushed.mkString("[", ", ", "]")}"
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      plannedFiles(currentFiles()).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new MergeReaderFactory(
        new SerializableHadoopConf(spark.sessionState.newHadoopConf()),
        required,
        hideTombstones = !cdc)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(cdc,
      "graft-merge: streaming read requires option cdc=true (the commit-log replay schema)")
    new GraftMergeMicroBatchStream(spark, dir, required)
  }
}

/** Offset = highest committed version included (the commit log's LSN). */
case class MergeOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

class GraftMergeMicroBatchStream(
    spark: SparkSession,
    dir: String,
    required: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = MergeOffset(-1L)

  override def latestOffset(): Offset =
    MergeOffset(MergeSink.lastCommit(spark, dir).map(_.version).getOrElse(-1L))

  // Trigger.AvailableNow contract: pin the horizon ONCE at query start so
  // the run drains exactly the commits that existed then and stops —
  // versions landing mid-run belong to the next run.
  private var availableNowCap: Option[Offset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(latestOffset())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowCap.getOrElse(latestOffset())

  override def deserializeOffset(json: String): Offset = {
    val m = "\"version\"\\s*:\\s*(-?\\d+)".r
    m.findFirstMatchIn(json) match {
      case Some(g) => MergeOffset(g.group(1).toLong)
      case None => throw new IllegalArgumentException(s"bad graft-merge offset: $json")
    }
  }

  /** Versions in (start, end]: each contributes the bucket files it
    * physically WROTE (manifest entries equal to that version) — the
    * ordered replay of log_mgr.clj:16-33, version numbers as LSNs. A
    * version inside the range whose manifest has been GC'd means the
    * reader fell behind the retention window: fail loudly, exactly as a
    * change-data-feed read past retention must.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[MergeOffset].version
    val e0 = end.asInstanceOf[MergeOffset].version
    val cs = MergeSink.commits(spark, dir)
    // Versions are DENSE (every commit is predecessor + 1, from 0) and
    // GC removes a collected version's marker AND manifest together —
    // so a version that existed but fell out of retention is simply
    // ABSENT from the commit log. The fail-loud check therefore keys on
    // the earliest RETAINED marker: a replay range reaching below it is
    // asking for GC'd history and must throw (the CDF retention
    // contract), never silently skip committed versions.
    if (s0 + 1 <= e0) {
      val earliest = cs.headOption.map(_.version).getOrElse(0L)
      if (s0 + 1 < earliest)
        throw new IllegalStateException(
          s"graft-merge: versions ${s0 + 1}..${earliest - 1} fell out of " +
            s"the retention window (earliest retained is $earliest; " +
            s"requested replay range ${s0 + 1}..$e0); readers must keep " +
            "up within retention")
    }
    val versions = cs.map(_.version).filter(v => v > s0 && v <= e0)
    versions.flatMap { v =>
      val m = MergeSink.manifest(spark, dir, v)
      // a retained marker whose manifest vanished is a torn GC — same
      // contract violation, same loud failure
      if (m.isEmpty && cs.exists(_.version == v))
        throw new IllegalStateException(
          s"graft-merge: version $v fell out of the retention window " +
            s"(requested replay range ${s0 + 1}..$e0); " +
            "readers must keep up within retention")
      val conf = spark.sessionState.newHadoopConf()
      m.toSeq.sorted.collect { case (b, cv) if cv == v =>
        val d = new Path(s"$dir/data/b$b/v$cv")
        val fs = d.getFileSystem(conf)
        if (!fs.exists(d)) Seq.empty[MergeFilePartition]
        else fs.listStatus(d).iterator.map(_.getPath.toString)
          .filter(_.endsWith(".parquet")).toSeq.sorted
          .map(f => MergeFilePartition(f, b, v))
      }.flatten
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MergeReaderFactory(
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()),
      required,
      hideTombstones = false)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Hadoop Configuration is Writable but not Serializable; wrap it. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

class MergeReaderFactory(
    conf: SerializableHadoopConf,
    required: StructType,
    hideTombstones: Boolean)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MergeFilePartition]
    new MergeFileReader(conf.value, p, required, hideTombstones)
  }
}

/** Parquet row reader for one bucket file: footer-projected columns,
  * per-file schema reconciliation (absent column -> NULL), tombstone
  * filtering for batch snapshot reads, `_version`/`_bucket` constants
  * for replay reads.
  */
class MergeFileReader(
    conf: Configuration,
    partition: MergeFilePartition,
    required: StructType,
    hideTombstones: Boolean)
    extends PartitionReader[InternalRow] {

  import MergeTableUtil.{BucketCol, VersionCol}

  private val fileSchema = MergeTableUtil.footerOf(conf, partition.file)

  // data columns to materialize from THIS file: required data fields the
  // file has, plus __deleted (if present) when we must filter on it
  private val requiredData =
    required.fields.filterNot(f => f.name == VersionCol || f.name == BucketCol)
  private val present =
    requiredData.filter(f => fileSchema.containsField(f.name))
  private val needDeleted =
    hideTombstones && fileSchema.containsField(MergeSink.DeletedCol)
  private val projNames: Seq[String] = {
    val base = present.map(_.name).toSeq
    val withDel =
      if (needDeleted && !base.contains(MergeSink.DeletedCol))
        base :+ MergeSink.DeletedCol
      else base
    // empty projection (count(*) over a tombstone-free file): still
    // project ONE column — reading the whole file to count rows is wrong
    if (withDel.nonEmpty) withDel
    else Seq(fileSchema.getFields.asScala.head.getName)
  }

  private val reader: ParquetReader[Group] = {
    val c = new Configuration(conf)
    val projTypes =
      projNames.map(n => fileSchema.getType(fileSchema.getFieldIndex(n)))
    val proj = new MessageType("graft_projection", projTypes: _*)
    c.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
    ParquetReader
      .builder(new GroupReadSupport(), new Path(partition.file))
      .withConf(c)
      .build()
  }

  // extractor per OUTPUT field, bound once per file
  private val extractors: Array[Group => Any] =
    required.fields.map { f =>
      if (f.name == VersionCol) { (_: Group) => partition.version }
      else if (f.name == BucketCol) { (_: Group) => partition.bucket }
      else if (!fileSchema.containsField(f.name)) { (_: Group) => null }
      else groupExtractor(f.name)
    }

  private def groupExtractor(name: String): Group => Any = {
    val p = fileSchema.getType(fileSchema.getFieldIndex(name)).asPrimitiveType()
    val i = projNames.indexOf(name) // groups carry the projection schema
    val isMillis = p.getLogicalTypeAnnotation match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        t.getUnit == TimeUnit.MILLIS
      case _ => false
    }
    (g: Group) => {
      if (g.getFieldRepetitionCount(i) == 0) null
      else p.getPrimitiveTypeName match {
        case INT64 => if (isMillis) g.getLong(i, 0) * 1000L else g.getLong(i, 0)
        case INT32 => g.getInteger(i, 0)
        case DOUBLE => g.getDouble(i, 0)
        case FLOAT => g.getFloat(i, 0)
        case BOOLEAN => g.getBoolean(i, 0)
        case BINARY => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
        case other =>
          throw new IllegalArgumentException(
            s"graft-merge: unsupported primitive $other for $name")
      }
    }
  }

  private val deletedIdx: Int =
    if (needDeleted) projNames.indexOf(MergeSink.DeletedCol) else -1

  private def isTombstone(g: Group): Boolean =
    deletedIdx >= 0 &&
      g.getFieldRepetitionCount(deletedIdx) > 0 && g.getBoolean(deletedIdx, 0)

  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    while (current != null && isTombstone(current)) current = reader.read()
    current != null
  }

  override def get(): InternalRow =
    new GenericInternalRow(extractors.map(_(current)).asInstanceOf[Array[Any]])

  override def close(): Unit = reader.close()
}
