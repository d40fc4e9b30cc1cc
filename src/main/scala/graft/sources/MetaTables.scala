package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** Iceberg-style metadata tables over the snapshot log (S21): the catalog
  * resolves `SELECT * FROM cat.`pages$snapshots`` (and `$files`, `$refs`) to
  * a tiny read-only table computed from the same manifests every maintenance
  * op already reads — the operational introspection surface of a lakehouse
  * (how many snapshots, what files does the live scan plan, which tags pin
  * what), queryable with plain SQL instead of the CLI.
  *
  *   pages$snapshots — one row per committed version: commit time, file
  *                     count, bytes still on disk, and how many referenced
  *                     files no longer exist (the S11 retention caveat made
  *                     visible: a non-zero n_missing marks a snapshot that
  *                     compaction/overwrite has invalidated).
  *   pages$files     — one row per LIVE data file (exactly [[Snapshots
  *                     .walkData]], the set a table scan plans): parsed
  *                     bucket/day partition values, size, and whether the
  *                     latest snapshot references it (false = debris a crash
  *                     left behind; what `Main vacuum` would delete).
  *   pages$refs      — one row per tag: pinned version, its commit time and
  *                     file count (S19).
  *
  * Scale shape: rows materialize DRIVER-side via [[LocalScan]], bounded by
  * the snapshot log / live file count — the same driver-held lists `vacuum`,
  * `history`, and snapshot commits already walk (a manifest-as-text design
  * is driver-bounded by construction; a 100 TB table with millions of files
  * would shard its manifests first, at which point these become parquet
  * scans over the manifest shards). Built fresh at every scan, so a query
  * always sees the current log.
  */
object MetaTables {

  /** Names this module owns: `<base>$<suffix>`. */
  private val SUFFIXES = Set("snapshots", "files", "refs", "partitions")

  /** Split `base$meta` table names; None when `name` is a plain table. */
  def parse(name: String): Option[(String, String)] = {
    val i = name.lastIndexOf('$')
    if (i <= 0) None
    else {
      val base = name.substring(0, i)
      val meta = name.substring(i + 1)
      if (SUFFIXES.contains(meta)) Some((base, meta)) else None
    }
  }

  private val SNAPSHOTS_SCHEMA = new StructType()
    .add("version", IntegerType, nullable = false)
    .add("committed_at", TimestampType, nullable = false)
    .add("n_files", IntegerType, nullable = false)
    .add("n_bytes", LongType, nullable = false)
    .add("n_missing", IntegerType, nullable = false)

  private val FILES_SCHEMA = new StructType()
    .add("path", StringType, nullable = false)
    .add("bucket", IntegerType, nullable = true)
    .add("day", StringType, nullable = true)
    .add("size_bytes", LongType, nullable = false)
    .add("in_snapshot", BooleanType, nullable = false)

  private val REFS_SCHEMA = new StructType()
    .add("name", StringType, nullable = false)
    .add("version", IntegerType, nullable = false)
    .add("committed_at", TimestampType, nullable = true)
    .add("n_files", IntegerType, nullable = true)

  private val PARTITIONS_SCHEMA = new StructType()
    .add("bucket", IntegerType, nullable = true)
    .add("day", StringType, nullable = true)
    .add("n_files", IntegerType, nullable = false)
    .add("n_bytes", LongType, nullable = false)

  private val BUCKET_RE = "(?:^|/)bucket=(\\d+)/".r
  private val DAY_RE = "(?:^|/)day=([^/]+)/".r

  def table(name: String, meta: String, tableDir: String): Table = meta match {
    case "snapshots"  => new MetaTable(name, SNAPSHOTS_SCHEMA, () => snapshotRows(tableDir))
    case "files"      => new MetaTable(name, FILES_SCHEMA, () => fileRows(tableDir))
    case "refs"       => new MetaTable(name, REFS_SCHEMA, () => refRows(tableDir))
    case "partitions" => new MetaTable(name, PARTITIONS_SCHEMA, () => partitionRows(tableDir))
  }

  private def snapshotRows(tableDir: String): Array[InternalRow] = {
    val dataDir = new java.io.File(tableDir, "data")
    Snapshots.allVersions(tableDir).map { v =>
      val (ts, files) = Snapshots.files(tableDir, v).get
      val sizes = files.map(rel => new java.io.File(dataDir, rel))
        .map(f => if (f.isFile) f.length() else -1L)
      new GenericInternalRow(Array[Any](
        v, ts * 1000L, files.size,
        sizes.filter(_ >= 0).sum, sizes.count(_ < 0))): InternalRow
    }.toArray
  }

  private def fileRows(tableDir: String): Array[InternalRow] = {
    val dataDir = new java.io.File(tableDir, "data")
    val inLatest: Set[String] =
      Snapshots.latestVersion(tableDir)
        .flatMap(v => Snapshots.files(tableDir, v)).map(_._2.toSet)
        .getOrElse(Set.empty)
    Snapshots.walkData(dataDir)
      .map(f => (dataDir.toPath.relativize(f.toPath).toString, f.length()))
      .sortBy(_._1)
      .map { case (rel, len) =>
        val bucket = BUCKET_RE.findFirstMatchIn(rel).map(_.group(1).toInt)
        val day = DAY_RE.findFirstMatchIn(rel).map(_.group(1))
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(rel),
          bucket.map(Int.box).orNull,
          day.map(UTF8String.fromString).orNull,
          len, inLatest.contains(rel))): InternalRow
      }.toArray
  }

  /** One row per (bucket, day) partition of the LATEST snapshot — the
    * skew/size profile a maintenance planner reads before compaction or a
    * query planner uses to estimate partition pruning gain. Aggregates the
    * same snapshot file list every scan plans; driver-bounded like the rest.
    */
  private def partitionRows(tableDir: String): Array[InternalRow] = {
    val dataDir = new java.io.File(tableDir, "data")
    val latest = Snapshots.latestVersion(tableDir)
      .flatMap(v => Snapshots.files(tableDir, v)).map(_._2).getOrElse(Seq.empty)
    latest
      .map { rel =>
        val f = new java.io.File(dataDir, rel)
        val bucket = BUCKET_RE.findFirstMatchIn(rel).map(_.group(1).toInt)
        val day = DAY_RE.findFirstMatchIn(rel).map(_.group(1))
        ((bucket, day), if (f.isFile) f.length() else 0L)
      }
      .groupBy(_._1).toSeq
      .map { case ((b, d), xs) => (b, d, xs.size, xs.map(_._2).sum) }
      .sortBy { case (b, d, _, _) => (b.getOrElse(Int.MaxValue), d.getOrElse("")) }
      .map { case (b, d, nf, nb) =>
        new GenericInternalRow(Array[Any](
          b.map(Int.box).orNull,
          d.map(UTF8String.fromString).orNull,
          nf, nb)): InternalRow
      }.toArray
  }

  private def refRows(tableDir: String): Array[InternalRow] =
    Snapshots.tags(tableDir).map { case (name, v) =>
      val snap = Snapshots.files(tableDir, v)
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(name), v,
        snap.map(s => Long.box(s._1 * 1000L)).orNull,
        snap.map(s => Int.box(s._2.size)).orNull)): InternalRow
    }.toArray
}

/** A read-only DSv2 table whose rows are computed driver-side at scan build
  * — metadata-sized by construction (see [[MetaTables]]).
  */
private[sources] class MetaTable(
    tableName: String,
    schemaDef: StructType,
    build: () => Array[InternalRow])
    extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = schemaDef
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] = MetaTable.this.build()
        override def readSchema(): StructType = schemaDef
        override def description(): String = s"GraftMetaTable $tableName"
      }
    }
}
