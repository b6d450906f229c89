package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads
  * with typed metadata, processed batch-at-a-time per partition.
  *
  * The decode step is a STUB — this container has no image/audio
  * codecs — implemented as a deterministic fake (metadata derived from
  * a hash of the payload). Everything around it is real: the binary
  * column, the metadata struct schema, partition-parallel batch
  * processing via `mapPartitions` (the Scala analog of `mapInPandas`
  * batch UDFs), and the downstream relational ops.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      n_frames: Int, format: String)

  /** Build a binary "media" column from document text (stand-in for a
    * real blob column; same schema shape as an image/audio table).
    */
  def toMediaTable(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      col("text").cast("binary").as("payload"))

  /** FAKE DECODE (stub): deterministic pseudo-metadata from the
    * payload hash. A real deployment swaps `decodeOne` for an actual
    * codec call; the batch shape, schema, and parallelism stay as-is.
    */
  private def decodeOne(r: MediaRow): MediaMeta = {
    val h = java.util.Arrays.hashCode(r.payload)
    MediaMeta(
      doc_id = r.doc_id,
      n_bytes = r.payload.length,
      width = 64 + math.floorMod(h, 1024),
      height = 64 + math.floorMod(h >> 10, 1024),
      n_frames = 1 + math.floorMod(h >> 20, 64),
      format = if (math.floorMod(h, 2) == 0) "imgA" else "imgB")
  }

  /** C11: batch feature extraction over the binary column. Runs
    * partition-parallel with no shuffle; the iterator form processes
    * rows streaming-style (no per-partition materialization), which is
    * what keeps memory flat when payloads are MBs each at 100 TB.
    */
  def extractMeta(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    toMediaTable(documents).as[MediaRow]
      .mapPartitions(it => it.map(decodeOne))
      .toDF()
  }

  /** Downstream relational use of the extracted metadata: per-format
    * size/shape stats — shows the decoded struct flows into normal
    * declarative aggregation.
    */
  def mediaStats(spark: SparkSession, documents: DataFrame): DataFrame =
    extractMeta(spark, documents)
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("n_bytes"), 4).as("avg_bytes"),
        round(avg(col("width") * col("height")), 4).as("avg_pixels"),
        sum("n_frames").as("total_frames"))
}
