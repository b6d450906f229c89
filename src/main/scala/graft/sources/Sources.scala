package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Format ingest/egress + keyed-merge plumbing — the reference's
  * EXTRACT (raw files → tables) and LOAD (upsert into the mart,
  * flows/load_hourly_parquet_to_postgres.py:21-45 ON CONFLICT DO
  * UPDATE) stages, re-expressed as Spark sources/sinks.
  *
  * Readers take an explicit schema: at 100 TB, schema inference means
  * an extra full scan and nondeterministic typing — never infer in
  * production paths.
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-partitioned parquet writer (generic form of the mart layout
    * region=/year=/month= — aggregate_hourly.py:105-117).
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Zip-archive text ingestion — the reference's raw downloads arrive
    * as ZIPs wrapping the real payload (aggregate_hourly.py
    * `_extract_first_nc`). Spark has no zip codec, and this is the one
    * legitimately imperative per-partition task in the library: each
    * archive is streamed through ZipInputStream inside mapPartitions
    * over binaryFiles (one task per archive; archives parallelize
    * across executors; entries stream without full materialization).
    * Returns (archive, entry, line).
    */
  def readZipLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (archivePath, stream) =>
        val zis = new java.util.zip.ZipInputStream(stream.open())
        // Close on task completion (covers abort mid-iteration from a
        // malformed archive) AND at natural exhaustion — a lazy
        // iterator alone would leak one file handle per archive in
        // long-lived executor JVMs.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try zis.close() catch { case _: java.io.IOException => () }
          })
        Iterator.continually(zis.getNextEntry)
          .takeWhile { e =>
            if (e == null) { try zis.close() catch { case _: java.io.IOException => () }; false }
            else true
          }
          .filterNot(_.isDirectory)
          .flatMap { entry =>
            val name = entry.getName
            val reader = new java.io.BufferedReader(
              new java.io.InputStreamReader(zis,
                java.nio.charset.StandardCharsets.UTF_8))
            Iterator.continually(reader.readLine())
              .takeWhile(_ != null)
              .map(line => (archivePath, name, line))
          }
      }
      .toDF("archive", "entry", "line")
  }

  /** Keyed last-wins merge — the Spark form of `INSERT … ON CONFLICT
    * (keys) DO UPDATE`: rows from `updates` replace same-key rows in
    * `base`; ties inside `updates` resolved by the highest versionCol.
    * One shuffle on the key; no driver-side state.
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    val all = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__src").desc, col(versionCol).desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }
}
