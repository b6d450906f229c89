package graft.sources.grid

import java.time.{LocalDate, ZoneOffset}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A21: the EXTRACT stage as a first-class Spark DataSource V2
  * connector — the analog of the reference's per-(region, month) grid
  * pulls (/root/reference/dask_jobs/extract_era5.py:49-76 requests
  * one lat×lon×time NetCDF per region-month;
  * flows/download_era5_land.py skips already-materialized months).
  *
  * The container has no NetCDF codec (SURVEY §2 scoped decode out),
  * so the source SYNTHESIZES the grid deterministically: every cell
  * value is a pure integer formula of (region, day, hour, lat, lon)
  * — which makes even the custom connector end-to-end ORACLE-GATABLE
  * (DuckDB rebuilds the identical grid from generate_series; see
  * `q_grid_source`). The codec seam is PROVEN, not just claimed:
  * `format=files` (with a `path` option) swaps in
  * [[FileGridPartitionReader]], which decodes real on-disk tiles
  * ([[GridFiles]] layout) through the SAME planning, pruning, and
  * pushdown machinery — exactly the seam a production NetCDF/Zarr
  * codec would drop into.
  *
  * Scale design: one InputPartition per (region, day) — the natural
  * download/file granularity — so a year × 100 regions plans 36 500
  * independent splits, no driver-side data. The ScanBuilder
  * implements BOTH DSv2 pushdown surfaces:
  *  - SupportsPushDownRequiredColumns: a `select(region, t2m)` reads
  *    2 of 17 columns — the reader never computes the other twelve
  *    weather variables at all (the DSv2 equivalent of parquet
  *    column pruning, and the reason a one-variable mart over the
  *    7-var grid costs one variable, not seven);
  *  - SupportsPushDownFilters: region equality/IN and ts range
  *    bounds prune whole (region, day) partitions at PLAN time (the
  *    hive-partition-pruning analog). Every filter is also returned
  *    as post-scan residual, so pruning can only ever skip
  *    provably-empty splits — over-inclusion is corrected by row
  *    filtering, under-inclusion cannot happen.
  */
object GridSource {
  /** The reference's FULL download variable map — the 7-variable core
    * list (/root/reference/dask_jobs/extract_era5.py:14-16): 2 m air +
    * dew-point temperature [K], total precipitation [m], 10 m wind
    * components [m/s], two soil-water layers [m³/m³] — plus the six
    * extended VAR_MAP entries
    * (/root/reference/flows/download_era5_land.py:17-31): downward /
    * net surface solar radiation [J/m²], vegetation-transpiration and
    * potential evaporation [m of water], and high/low-vegetation leaf
    * area index [m²/m²]. Per var: (salt, modulus, base, step) of the
    * deterministic integer mix — value = (base + m*step) / 1000.0 with
    * m = (lat*31 + lon*17 + hour*13 + day*11 + rIdx*7 + salt) % mod.
    * Integer numerator + ONE double division → bit-identical in any
    * engine (the §5 protocol); each var gets its own salt and a
    * physically plausible range. t2m keeps the round-2 constants so
    * every existing oracle/spec value is unchanged; the extended six
    * are APPENDED so core-var block offsets in existing tiles stay put.
    */
  val varSpecs: Seq[(String, (Int, Int, Long, Long))] = Seq(
    "t2m" -> (0, 400, 253150L, 100L), // [253.15, 293.05) K
    "d2m" -> (101, 400, 248150L, 100L), // dew point, below t2m range
    "tp" -> (59, 8, 0L, 1L), // [0, 0.007] m of precipitation
    "u10" -> (163, 400, -20000L, 100L), // [-20.0, 19.9] m/s
    "v10" -> (211, 400, -20000L, 100L),
    "swvl1" -> (37, 400, 50L, 1L), // [0.05, 0.449] m³/m³
    "swvl2" -> (83, 400, 50L, 1L),
    "ssrd" -> (241, 400, 0L, 2000L), // [0, 798] hourly J/m² (scaled)
    "ssr" -> (283, 400, 0L, 1500L), // net ≲ downward radiation range
    "evavt" -> (311, 8, 0L, 1L), // [0, 0.007] m of transpired water
    "pev" -> (349, 8, 0L, 1L), // [0, 0.007] m potential evaporation
    "lai_hv" -> (397, 400, 0L, 17L), // [0, 6.783] m²/m²
    "lai_lv" -> (431, 400, 0L, 12L)) // [0, 4.788] m²/m²

  // measurement columns are nullable: real ERA5 tiles carry MASKED
  // cells (sea points in a land dataset), surfaced as null — see
  // cellMasked and the nullCells option
  val schema: StructType = StructType(
    Seq(
      StructField("region", StringType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("lat", IntegerType, nullable = false),
      StructField("lon", IntegerType, nullable = false)) ++
      varSpecs.map { case (v, _) => StructField(v, DoubleType, nullable = true) })

  /** Deterministic value of one weather variable at one grid cell. */
  def varValue(name: String, rIdx: Int, dayIdx: Int, hour: Int, lat: Int,
      lon: Int): Double = {
    val (salt, mod, base, step) = varSpecs.find(_._1 == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown grid var $name"))
      ._2
    val m = (lat * 31 + lon * 17 + hour * 13 + dayIdx * 11 + rIdx * 7 + salt) % mod
    (base + m * step).toDouble / 1000.0
  }

  /** Deterministic masked-cell rule (`nullCells=true` grids): a cell
    * is masked for a variable when its integer mix `m` ends in 1 —
    * ~10% of cells, spread over every (region, day, hour, lat, lon)
    * so no spatial-mean group is ever all-null or all-present. Models
    * real ERA5-Land masked sea cells; the reference's spatial mean is
    * `skipna=True` (aggregate_hourly.py:71-76), which is what
    * Exact.avgD's count(x) denominator reproduces.
    */
  def cellMasked(name: String, rIdx: Int, dayIdx: Int, hour: Int, lat: Int,
      lon: Int): Boolean = {
    val (salt, mod, _, _) = varSpecs.find(_._1 == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown grid var $name"))
      ._2
    val m = (lat * 31 + lon * 17 + hour * 13 + dayIdx * 11 + rIdx * 7 + salt) % mod
    m % 10 == 1
  }

  /** Round-2 t2m formula, kept as the named special case the existing
    * oracles and specs pin.
    */
  def cellValue(rIdx: Int, dayIdx: Int, hour: Int, lat: Int, lon: Int): Double =
    varValue("t2m", rIdx, dayIdx, hour, lat, lon)

  val MicrosPerSec = 1000000L
  val SecsPerDay = 86400L
}

class GridSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-grid"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GridTable(new CaseInsensitiveStringMap(properties))
}

class GridTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_grid"
  override def schema(): StructType = GridSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  // per-scan options take precedence (catalog path can hand a scan
  // different options from the table-construction properties)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(if (o.isEmpty) options else o)
}

class GridScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  // Region list, in priority order: a config-file catalog (the
  // reference's config/regions.yaml analog — adding a region is a
  // config edit that plans new splits with NO code change), then the
  // inline `regions` option, then the pinned default.
  private val regionsFile = options.getOrDefault("regionsFile", "")
  private val regions: Seq[String] =
    if (regionsFile.nonEmpty) RegionCatalog.load(regionsFile).map(_.name)
    else options.getOrDefault("regions", "r0,r1,r2")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
  private val nDays = options.getInt("days", 3)
  private val nLat = options.getInt("nlat", 8)
  private val nLon = options.getInt("nlon", 8)
  private val daysPerBatch = options.getInt("daysPerBatch", 1)
  // format=synthetic (default): cell values from the integer formula.
  // format=files: decode real on-disk tiles under `path` (one file per
  // (region, day), see GridFiles) — proves the reader seam the class
  // doc claims: planning/pruning/pushdown are SHARED, only the
  // per-partition decode differs.
  private val format = options.getOrDefault("format", "synthetic")
  private val path = options.getOrDefault("path", "")
  // nullCells=true: the synthetic formula masks ~10% of cells to null
  // (GridSource.cellMasked) — the missing-data shape real tiles have.
  // File-backed tiles carry masking IN the payload (NaN fill value),
  // so the option only drives the synthetic reader.
  private val nullCells = options.getBoolean("nullCells", false)
  // format=files tile reads run under a bounded retry-with-delay
  // (graft.sources.Retry — the reference's @task(retries=2,
  // retry_delay_seconds=30) analog, download_era5_land.py:60): a
  // torn/corrupt tile a concurrent backfill is re-extracting succeeds
  // on re-attempt; one that stays broken surfaces the typed
  // RetryExhaustedException after `retries` extra attempts.
  private val retries = options.getInt("retries", 2)
  private val retryDelayMs = options.getLong("retryDelayMs", 30000L)
  require(format == "synthetic" || format == "files",
    s"graft-grid format must be synthetic|files, got $format")
  require(format != "files" || path.nonEmpty,
    "graft-grid format=files requires a path option")
  private val startEpochSec = LocalDate
    .parse(options.getOrDefault("start", "2024-01-01"))
    .atStartOfDay(ZoneOffset.UTC).toEpochSecond

  private var requiredSchema: StructType = GridSource.schema
  private var accepted: Array[Filter] = Array.empty
  private var keepRegions: Set[String] = regions.toSet
  // inclusive micros bounds a row's ts must satisfy (for pruning only)
  private var tsLo: Long = Long.MinValue
  private var tsHi: Long = Long.MaxValue

  private def toMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(t.getTime * 1000L + t.getNanos / 1000 % 1000)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * GridSource.MicrosPerSec + i.getNano / 1000)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val used = filters.filter {
      case EqualTo("region", v: String) =>
        keepRegions = keepRegions.intersect(Set(v)); true
      case In("region", vs) =>
        keepRegions = keepRegions
          .intersect(vs.collect { case s: String => s }.toSet)
        true
      case GreaterThanOrEqual("ts", v) =>
        toMicros(v).exists { m => tsLo = math.max(tsLo, m); true }
      case GreaterThan("ts", v) =>
        // exclusive > m prunes like >= m+1µs
        toMicros(v).exists { m => tsLo = math.max(tsLo, m + 1); true }
      case LessThanOrEqual("ts", v) =>
        toMicros(v).exists { m => tsHi = math.min(tsHi, m); true }
      case LessThan("ts", v) =>
        toMicros(v).exists { m => tsHi = math.min(tsHi, m - 1); true }
      case EqualTo("ts", v) =>
        toMicros(v).exists { m =>
          tsLo = math.max(tsLo, m); tsHi = math.min(tsHi, m); true
        }
      case _ => false
    }
    accepted = used
    // every filter stays a post-scan residual: pruning is a pure
    // optimization, never the correctness mechanism
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(schema: StructType): Unit =
    requiredSchema = schema

  override def build(): Scan = new GridScan(requiredSchema, regions,
    keepRegions, nDays, nLat, nLon, startEpochSec, tsLo, tsHi,
    daysPerBatch, format, path, nullCells, retries, retryDelayMs)
}

class GridScan(requiredSchema: StructType, allRegions: Seq[String],
    keepRegions: Set[String], nDays: Int, nLat: Int, nLon: Int,
    startEpochSec: Long, tsLo: Long, tsHi: Long, daysPerBatch: Int = 1,
    format: String = "synthetic", path: String = "",
    nullCells: Boolean = false, retries: Int = 2,
    retryDelayMs: Long = 30000L)
    extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String = {
    val kept = allRegions.filter(keepRegions)
    s"graft-grid regions=${kept.mkString(",")} days=$nDays grid=${nLat}x$nLon"
  }

  private def partitionsForDays(fromDay: Int, untilDay: Int): Array[InputPartition] = {
    val parts = for {
      (region, rIdx) <- allRegions.zipWithIndex if keepRegions(region)
      d <- fromDay until untilDay
      dayStart = (startEpochSec + d * GridSource.SecsPerDay) *
        GridSource.MicrosPerSec
      dayEnd = dayStart + GridSource.SecsPerDay * GridSource.MicrosPerSec
      // keep the (region, day) split unless provably outside bounds
      if dayEnd > tsLo && dayStart <= tsHi
    } yield GridInputPartition(rIdx, region, d): InputPartition
    parts.toArray
  }

  override def planInputPartitions(): Array[InputPartition] =
    partitionsForDays(0, nDays)

  override def createReaderFactory(): PartitionReaderFactory =
    GridReaderFactory(requiredSchema.fieldNames, nLat, nLon, startEpochSec,
      format, path, nullCells, retries, retryDelayMs)

  /** D8: the EXTRACT connector as a STREAMING source — offsets are
    * day indices and admission control caps each micro-batch at
    * `daysPerBatch` days (default 1), so EVERY day commits its own
    * checkpoint entry: a backfill that dies mid-run resumes from the
    * last drained day, not from zero — the same granularity the
    * reference's month-skip idempotency works at
    * (flows/download_era5_land.py:81). A rerun against a complete
    * checkpoint drains nothing. Region/day/grid OPTIONS carry into
    * every batch; note pushed FILTERS do not (Spark applies DSv2
    * filter pushdown to batch scans only — streaming filters run as
    * row-level residuals, which stays correct, just unpruned).
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsAdmissionControl
        with SupportsTriggerAvailableNow {
      // without this interface Trigger.AvailableNow freezes the FIRST
      // latestOffset(start, limit) as the terminal target and stops
      // after one daysPerBatch step; with it the engine keeps
      // triggering until latestOffset stops advancing (= nDays).
      // The grid's extent is fixed by options, so there is no
      // end-of-data snapshot to take here.
      override def prepareForTriggerAvailableNow(): Unit = ()
      override def initialOffset(): Offset = GridOffset(0)
      // admission-controlled sources report progress via
      // latestOffset(start, limit); the no-arg form must not be used
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException(
          "latestOffset(Offset, ReadLimit) drives this source")
      override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
      override def latestOffset(start: Offset, limit: ReadLimit): Offset =
        GridOffset(math.min(nDays,
          start.asInstanceOf[GridOffset].day + daysPerBatch))
      override def reportLatestOffset(): Offset = GridOffset(nDays)
      override def deserializeOffset(json: String): Offset =
        GridOffset(json.trim.toInt)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        partitionsForDays(start.asInstanceOf[GridOffset].day,
          end.asInstanceOf[GridOffset].day)
      override def createReaderFactory(): PartitionReaderFactory =
        GridScan.this.createReaderFactory()
    }
}

/** Streaming offset: the next unread day index (checkpoint-serialized). */
case class GridOffset(day: Int) extends Offset {
  override def json(): String = day.toString
}

case class GridInputPartition(rIdx: Int, region: String, dayIdx: Int)
  extends InputPartition

case class GridReaderFactory(fields: Array[String], nLat: Int, nLon: Int,
    startEpochSec: Long, format: String = "synthetic", path: String = "",
    nullCells: Boolean = false, retries: Int = 2,
    retryDelayMs: Long = 30000L)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GridInputPartition]
    if (format == "files")
      new FileGridPartitionReader(gp, fields, nLat, nLon, startEpochSec, path,
        graft.sources.Retry.Policy(retries = retries, delayMs = retryDelayMs))
    else new GridPartitionReader(gp, fields, nLat, nLon, startEpochSec,
      nullCells)
  }
}

class GridPartitionReader(p: GridInputPartition, fields: Array[String],
    nLat: Int, nLon: Int, startEpochSec: Long, nullCells: Boolean = false)
    extends PartitionReader[InternalRow] {

  private val regionU = UTF8String.fromString(p.region)
  private val cellsPerHour = nLat * nLon
  private val total = 24 * cellsPerHour
  private var i = -1

  // one extractor per REQUIRED column (pruned columns never compute)
  private val getters: Array[(Int, Int, Int) => Any] = fields.map {
    case "region" => (_, _, _) => regionU
    case "ts" => (h, _, _) =>
      (startEpochSec + p.dayIdx * GridSource.SecsPerDay + h * 3600L) *
        GridSource.MicrosPerSec
    case "lat" => (_, la, _) => la
    case "lon" => (_, _, lo) => lo
    case v if GridSource.varSpecs.exists(_._1 == v) =>
      // resolve the var's constants ONCE per reader, not per cell —
      // the closure below is the scan's per-row hot path
      val (salt, mod, base, step) = GridSource.varSpecs.find(_._1 == v).get._2
      val dayTerm = p.dayIdx * 11 + p.rIdx * 7 + salt
      if (nullCells)
        (h, la, lo) => {
          val m = (la * 31 + lo * 17 + h * 13 + dayTerm) % mod
          if (m % 10 == 1) null else (base + m * step).toDouble / 1000.0
        }
      else
        (h, la, lo) => {
          val m = (la * 31 + lo * 17 + h * 13 + dayTerm) % mod
          (base + m * step).toDouble / 1000.0
        }
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  override def next(): Boolean = { i += 1; i < total }

  override def get(): InternalRow = {
    val h = i / cellsPerHour
    val rem = i % cellsPerHour
    val la = rem / nLon
    val lo = rem % nLon
    // fresh array per row (the exec may buffer rows), but no per-row
    // collection conversions in the scan hot path
    val values = new Array[Any](getters.length)
    var j = 0
    while (j < getters.length) {
      values(j) = getters(j)(h, la, lo)
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  override def close(): Unit = ()
}

/** The `format=files` reader: same split (one (region, day) tile),
  * same iteration order, same pruning/pushdown machinery — but cell
  * values come from DECODING a real on-disk file (GridFiles layout),
  * the reference's post-download decode step
  * (/root/reference/dask_jobs/aggregate_hourly.py:32-46 unzips and
  * opens the NetCDF before aggregating). This is the codec-swap seam
  * the connector doc promises, proven with genuine file I/O:
  *
  *  - partition pruning == files never opened (a pruned (region, day)
  *    split's tile is never touched);
  *  - column pruning == blocks never read: only REQUIRED variables'
  *    blocks are loaded, one bulk read each, seeking past the rest —
  *    at ERA5 scale (7 vars × hours × 1801 × 3600 cells) reading 1 of
  *    7 blocks is the difference between ~125 MB and ~900 MB per tile;
  *  - coordinates (region/ts/lat/lon) are computed from the split +
  *    layout, as NetCDF dimension axes are, so the payload is
  *    measurements only.
  *
  * Dimension mismatches between the tile header and the scan options
  * fail loudly — silently reindexing a wrong-shaped tile would
  * corrupt every downstream mart.
  */
class FileGridPartitionReader(p: GridInputPartition, fields: Array[String],
    nLat: Int, nLon: Int, startEpochSec: Long, path: String,
    retry: graft.sources.Retry.Policy = graft.sources.Retry.noRetry)
    extends PartitionReader[InternalRow] {

  private val regionU = UTF8String.fromString(p.region)
  private val cellsPerHour = nLat * nLon
  private val total = 24 * cellsPerHour
  private var i = -1

  // open + decode lazily at first get(): an empty split (or a reader
  // the exec plans but never pulls) does no I/O
  private var blocks: Map[String, Array[Double]] = null

  // the whole open-validate-read sequence re-attempts under the scan's
  // retry policy: a torn tile that a concurrent backfill repairs
  // between attempts decodes cleanly on the re-open; one that stays
  // broken throws the typed RetryExhaustedException wrapping the
  // CorruptTileException. A dimension mismatch is a CONFIG bug
  // (IllegalArgumentException) — never retried, fails raw.
  private def decode(): Unit = graft.sources.Retry(retry) {
    val file = GridFiles.tileFile(path, p.region, p.dayIdx)
    // validating overload: a torn/corrupt tile throws the DEFINED
    // CorruptTileException at open time (payload length checked
    // against the header's layout), never a mid-scan EOF
    val header = GridFiles.readHeader(file)
    require(header.nHours == 24 && header.nLat == nLat && header.nLon == nLon,
      s"tile $file is ${header.nHours}x${header.nLat}x${header.nLon}, " +
        s"scan expects 24x${nLat}x$nLon")
    blocks = fields.toSeq
      .filter(f => GridSource.varSpecs.exists(_._1 == f))
      .map(v => v -> GridFiles.readVarBlock(file, header, v))
      .toMap
  }

  override def next(): Boolean = { i += 1; i < total }

  override def get(): InternalRow = {
    if (blocks == null) decode()
    val h = i / cellsPerHour
    val rem = i % cellsPerHour
    val values = new Array[Any](fields.length)
    var j = 0
    while (j < fields.length) {
      values(j) = fields(j) match {
        case "region" => regionU
        case "ts" =>
          (startEpochSec + p.dayIdx * GridSource.SecsPerDay + h * 3600L) *
            GridSource.MicrosPerSec
        case "lat" => rem / nLon
        case "lon" => rem % nLon
        case v =>
          // NaN is the tile fill value: a masked cell (sea point in a
          // land dataset) decodes to null, as a NetCDF _FillValue does
          val d = blocks(v)(i)
          if (java.lang.Double.isNaN(d)) null else d
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  override def close(): Unit = ()
}
