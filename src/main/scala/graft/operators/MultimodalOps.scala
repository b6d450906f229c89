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

  /** C11b: frame sampling — one row per kept frame (every `everyK`-th
    * of each media item's frames), with a deterministic per-frame
    * fingerprint standing in for decoded frame bytes. The explode is
    * the real plumbing: row-per-frame fan-out with no shuffle, which
    * is how video corpora are processed at scale (frames then flow to
    * batch feature extraction exactly like documents).
    */
  def sampleFrames(spark: SparkSession, documents: DataFrame,
      everyK: Int = 8): DataFrame =
    extractMeta(spark, documents)
      .select(col("doc_id"), col("format"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % everyK === 0)
      .select(col("doc_id"), col("format"), col("frame_idx"),
        xxhash64(col("doc_id"), col("frame_idx")).as("frame_fingerprint"))

  /** C11c: resize stub — recomputes target dimensions preserving
    * aspect ratio (the metadata math is real; the pixel work is the
    * clearly-marked fake, same as decodeOne).
    */
  def resizeMeta(spark: SparkSession, documents: DataFrame,
      maxSide: Int = 256): DataFrame =
    extractMeta(spark, documents)
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .select(col("doc_id"), col("width"), col("height"),
        round(col("width") * col("scale")).cast("int").as("out_width"),
        round(col("height") * col("scale")).cast("int").as("out_height"))

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
