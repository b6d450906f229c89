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

  /** LOAD stage: keyed upsert into a JDBC serving store — the engine
    * side of the reference's `INSERT … ON CONFLICT (keys) DO UPDATE`
    * load (flows/load_hourly_parquet_to_postgres.py:20-35), which every
    * reference deployment runs each pipeline cycle.
    *
    * Pattern: executors bulk-write the batch to a STAGING table through
    * the parallel JDBC sink (no per-row upsert round-trips from tasks),
    * then the driver issues ONE set-based `MERGE INTO target USING
    * staging` the database executes set-wise. This is the scalable
    * Spark→RDBMS upsert shape: parallel load + a single transactional
    * merge, safe to re-run (idempotent on the key).
    *
    * The target table is expected to exist (serving-store DDL is owned
    * by the store, as in the reference's docker/init/01_marts.sql).
    * ANSI MERGE syntax — works on Postgres 15+, Derby, H2, Oracle,
    * SQL Server; the spec exercises it against embedded Derby.
    */
  def writeJdbcUpsert(df: DataFrame, url: String, table: String,
      keys: Seq[String],
      props: java.util.Properties = new java.util.Properties()): Unit = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val staging = table + "_STAGE"
    df.write.mode("overwrite").jdbc(url, staging, props)
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    val on = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
    val merge =
      s"""MERGE INTO $table t USING $staging s ON ($on)
         |WHEN MATCHED THEN UPDATE SET ${nonKeys.map(c => s"$c = s.$c").mkString(", ")}
         |WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
         |VALUES (${cols.map(c => s"s.$c").mkString(", ")})""".stripMargin
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(merge) finally st.close()
    } finally conn.close()
  }

  /** Incremental, idempotent partition backfill — the reference's
    * `if target.exists(): skip` month-skipping idempotency
    * (flows/download_era5_land.py:81) as a set-based operator: append
    * only the input's partitions that are NOT already materialized in
    * the hive layout at `path`.
    *
    * The existing side projects ONLY partition columns, whose values
    * come from the directory listing — no data columns are read; the
    * anti-join keys on partition values; the append writes whole new
    * partitions. Re-running over the same input writes zero new files
    * (spec-asserted), which is what makes retrying a failed backfill
    * safe at any scale.
    */
  def appendMissingPartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty)
    val spark = df.sparkSession
    val existing =
      try Some(spark.read.parquet(path)
        .select(partitionCols.map(col): _*).distinct())
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val missing = existing match {
      case Some(e) => df.join(e, partitionCols, "left_anti")
      case None => df
    }
    missing.write.mode("append")
      .partitionBy(partitionCols: _*).parquet(path)
  }

  /** A20: small-file compaction — the operational counterpart of the
    * incremental writers above: every pipeline cycle appends a few
    * files per hive partition, and after months a 100 TB mart is
    * millions of KB-sized files whose open/footer overhead dominates
    * scans. Rewrites the dataset with each hive partition coalesced
    * toward `targetBytes` files, preserving the partition layout.
    *
    * The repartition is keyed on the partition columns PLUS a bounded
    * random-ish bucket derived from the target count, so one oversized
    * hive partition still splits into multiple files instead of one
    * giant one (repartitioning solely on partition columns would put
    * each hive partition into a single task/file).
    *
    * Writes to a new directory (atomic swap is the caller's move-
    * into-place) — compaction must never destroy the readable copy.
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      partitionCols: Seq[String], targetBytes: Long = 128L << 20): Unit = {
    val df = spark.read.parquet(inPath)
    val totalBytes =
      BigDecimal(df.queryExecution.optimizedPlan.stats.sizeInBytes)
    // PER-HIVE-PARTITION bucket counts, not one global modulus: a
    // global `hash % nFiles` scatters every hive partition across all
    // nFiles reducers, so each reducer writes a sliver into nearly
    // every partition directory — |partitions|×nFiles small files,
    // i.e. the fragmentation this function exists to undo. Sizing
    // each partition by its row share (uniform bytes/row estimate)
    // coalesces it toward its own ceil(size/target) files.
    val counts = df.groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("__rows"))
    val totalRowsRow = counts.agg(sum("__rows")).head
    val totalRows = if (totalRowsRow.isNullAt(0)) 0L else totalRowsRow.getLong(0)
    val bytesPerRow = (totalBytes / math.max(1L, totalRows)).toDouble
    val sized = counts.withColumn("__nf",
      greatest(lit(1L), ceil(col("__rows") * bytesPerRow / targetBytes)))
    // null-safe join on the partition columns: the hive default
    // partition (__HIVE_DEFAULT_PARTITION__ = null values) must survive
    // compaction too — a plain equi-join would silently drop those rows
    // from a rewrite whose contract is lossless. Renamed right-side
    // keys avoid the ambiguous-self-join trap (sized derives from df).
    val sizedR = sized.select(
      (partitionCols.map(c => col(c).as(s"__p_$c")) :+ col("__nf")): _*)
    val joinCond = partitionCols.map(c => col(c) <=> col(s"__p_$c")).reduce(_ && _)
    val dataCols = df.columns.toSeq.map(col)
    // bucket from a CONTENT hash of the row, never from
    // monotonically_increasing_id: a non-deterministic repartition key
    // re-rolls on stage retry and can duplicate or drop rows
    // (SPARK-23207) — the same class eliminated from the salted ops
    df.join(broadcast(sizedR), joinCond)
      .withColumn("__bucket", pmod(xxhash64(dataCols: _*), col("__nf")))
      .repartition((partitionCols.map(col) :+ col("__bucket")): _*)
      .select(dataCols: _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(outPath)
    if (totalRows > 0L) {
      val written = spark.read.parquet(outPath).count()
      require(written == totalRows,
        s"compactParquet row-count mismatch: in=$totalRows out=$written")
    }
  }
}
