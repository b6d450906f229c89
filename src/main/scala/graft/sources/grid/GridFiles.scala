package graft.sources.grid

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.io.File

/** On-disk tile codec for the `format=files` grid reader — the
  * stand-in for the reference's downloaded NetCDF tiles
  * (/root/reference/dask_jobs/extract_era5.py:49-76 pulls one
  * lat×lon×time file per region-month;
  * dask_jobs/aggregate_hourly.py:32-46 unzips and decodes it before
  * aggregating). The container has no NetCDF codec, so the tile is a
  * minimal self-describing binary layout with the properties that
  * matter for the connector seam:
  *
  *  - one file per (region, day) at `dir/region=<r>/day=<d>.grd` —
  *    the same granularity the connector plans InputPartitions at, so
  *    partition pruning == skipping whole files (never opened);
  *  - VARIABLE-MAJOR blocks: header (magic, dims, var directory) then
  *    one contiguous `hours×lat×lon` float64 block per variable, so
  *    column pruning seeks PAST unrequested variables — a
  *    `select(region, t2m)` does one header read plus one block read,
  *    not seven (the I/O analog of the synthetic reader never
  *    computing pruned vars);
  *  - coordinates (ts/lat/lon) are implicit in the layout, as in a
  *    NetCDF grid's dimension axes — only measurements are payload.
  *
  * Layout (all big-endian, DataOutputStream encoding):
  *   magic:Int = 0x47524431 ("GRD1")
  *   nHours:Int nLat:Int nLon:Int nVars:Int
  *   nVars × varName:UTF
  *   nVars × (nHours*nLat*nLon doubles, hour-major, then lat, then lon)
  *
  * [[write]] materializes tiles from the deterministic formula — it
  * plays the role of the EXTERNAL download step (the reference's CDS
  * API client), which is why it is a plain local writer and not a
  * Spark job: the engine's job starts at reading what the downloader
  * left on disk. Formula-generated content keeps every file-backed
  * read oracle-gatable against the synthetic reader bit-for-bit.
  */
object GridFiles {
  val Magic = 0x47524431
  val Hours = 24

  def tileFile(dir: String, region: String, dayIdx: Int): File =
    new File(new File(dir, s"region=$region"), s"day=$dayIdx.grd")

  /** Write one (region, day) tile with every variable's formula
    * values. `nullCells=true` writes NaN — the tile fill value — for
    * every cell GridSource.cellMasked masks, so the file carries
    * missing data the way real tiles do (in the payload, not as an
    * option).
    */
  def writeTile(dir: String, region: String, rIdx: Int, dayIdx: Int,
      nLat: Int, nLon: Int, nullCells: Boolean = false): Unit = {
    val f = tileFile(dir, region, dayIdx)
    f.getParentFile.mkdirs()
    val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(f)))
    try {
      out.writeInt(Magic)
      out.writeInt(Hours); out.writeInt(nLat); out.writeInt(nLon)
      out.writeInt(GridSource.varSpecs.size)
      GridSource.varSpecs.foreach { case (v, _) => out.writeUTF(v) }
      GridSource.varSpecs.foreach { case (v, _) =>
        var h = 0
        while (h < Hours) {
          var la = 0
          while (la < nLat) {
            var lo = 0
            while (lo < nLon) {
              out.writeDouble(
                if (nullCells && GridSource.cellMasked(v, rIdx, dayIdx, h, la, lo))
                  Double.NaN
                else GridSource.varValue(v, rIdx, dayIdx, h, la, lo))
              lo += 1
            }
            la += 1
          }
          h += 1
        }
      }
    } finally out.close()
  }

  /** Materialize the full extent (the "download everything" backfill).
    * `skipExisting=true` is the reference's month-skip idempotency
    * (/root/reference/flows/download_era5_land.py:81 — a rerun after a
    * partial failure re-pulls only the missing tiles): a tile already
    * on disk is left untouched. Returns the number of tiles written.
    */
  def write(dir: String, regions: Seq[String], nDays: Int, nLat: Int,
      nLon: Int, nullCells: Boolean = false,
      skipExisting: Boolean = false): Int = {
    var written = 0
    for ((r, rIdx) <- regions.zipWithIndex; d <- 0 until nDays)
      if (!(skipExisting && tileFile(dir, r, d).isFile)) {
        writeTile(dir, r, rIdx, d, nLat, nLon, nullCells)
        written += 1
      }
    written
  }

  /** Parsed tile header: variable directory + payload geometry. */
  final case class TileHeader(nHours: Int, nLat: Int, nLon: Int,
      varNames: Seq[String], headerBytes: Long) {
    def blockDoubles: Int = nHours * nLat * nLon
    /** Byte offset of a variable's block from file start. */
    def blockOffset(name: String): Long = {
      val i = varNames.indexOf(name)
      require(i >= 0, s"variable $name not in tile (has ${varNames.mkString(",")})")
      headerBytes + i.toLong * blockDoubles * 8L
    }
  }

  def readHeader(in: DataInputStream): TileHeader = {
    val magic = in.readInt()
    require(magic == Magic, f"bad tile magic 0x$magic%08x")
    val nHours = in.readInt(); val nLat = in.readInt(); val nLon = in.readInt()
    val nVars = in.readInt()
    var bytes = 20L
    val names = (0 until nVars).map { _ =>
      val s = in.readUTF()
      // writeUTF = 2 length bytes + modified-UTF-8 payload (ASCII here)
      bytes += 2L + s.length
      s
    }
    TileHeader(nHours, nLat, nLon, names, bytes)
  }

  /** Read one variable's full block from a tile, decoding nothing else. */
  def readVarBlock(file: File, header: TileHeader, name: String): Array[Double] = {
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(file)))
    try {
      var toSkip = header.blockOffset(name)
      while (toSkip > 0) {
        val s = in.skip(toSkip)
        if (s <= 0) throw new EOFException(s"truncated tile $file")
        toSkip -= s
      }
      val n = header.blockDoubles
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = in.readDouble(); i += 1 }
      out
    } finally in.close()
  }
}
