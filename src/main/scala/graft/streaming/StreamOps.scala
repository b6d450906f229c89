package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType
import graft.sources.Schemas.Event

/** Structured Streaming twins of the batch marts — the reference's
  * hourly pipeline (download → aggregate per hour) re-expressed as a
  * continuous query: readStream → watermark → windowed agg.
  *
  * Scale notes: windowed aggregation state is bounded by
  * (keys × open windows); the watermark closes windows so state
  * doesn't grow without bound. Sessionization keeps one small state
  * object per active user with an idle-timeout eviction.
  */
object StreamOps {

  /** Continuous file ingestion of the events table: new parquet files
    * appearing under `dir` enter the stream (the deployment shape of
    * the reference's hourly download loop). Handles the nano-precision
    * ts column the same way as the batch loader (read as long,
    * convert to µs) since the streaming parquet source rejects
    * TIMESTAMP(NANOS) too.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props",
        org.apache.spark.sql.types.StringType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** D4: incremental batch ingestion via Trigger.AvailableNow — the
    * streaming twin of [[graft.sources.Sources.appendMissingPartitions]]
    * and the exact engine shape of the reference's "process new months,
    * skip done ones" cycle (flows/download_era5_land.py:81): each run
    * drains ONLY files not yet recorded in the checkpoint, writes them
    * through `transform`, and exits. Restart-safe and exactly-once at
    * the file level — the checkpoint, not directory diffing, is the
    * source of truth, so a crashed run resumes instead of reprocessing.
    */
  def ingestAvailableNow(spark: SparkSession, inDir: String,
      outDir: String, checkpointDir: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    val q = transform(readEventsStream(spark, inDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode(OutputMode.Append)
      .start()
    q.awaitTermination()
  }

  /** D5: streaming exact dedup — drop replayed events by id, with the
    * watermark EVICTING dedup state: ids older than the watermark can
    * never collide with a late arrival (the source's replay window),
    * so state stays bounded — `dropDuplicates` without a watermark
    * grows keys forever, the classic unbounded-state failure.
    * Streaming twin of the batch C1/A5 dedup.
    */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** D6: streaming serving-layer load — the reference's LOAD stage
    * (hourly mart → Postgres ON CONFLICT upsert, run every cycle) as
    * a continuous query: each micro-batch is MERGEd into the JDBC
    * serving table via the same staged upsert the batch path uses
    * ([[graft.sources.Sources.writeJdbcUpsert]]), so batch and
    * streaming loads share one idempotent merge. foreachBatch is the
    * right sink here: the upsert is keyed, so replaying a batch after
    * a failure converges to the same table (effectively-once on PK).
    */
  def streamToJdbcUpsert(updates: DataFrame, url: String, table: String,
      keys: Seq[String]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.Sources.writeJdbcUpsert(batch, url, table, keys)
      }

  /** D11: INCREMENTAL near-dup clustering at ingest time — the
    * streaming twin of C43 and the operation a live 100 TB corpus
    * feed actually runs: each arriving micro-batch of documents is
    * FOLDED into the already-clustered corpus
    * ([[graft.operators.DedupOps.dedupIncremental]] — batch-probe
    * pair-gen, prior components collapsed, full transitive-merge
    * semantics), never re-clustered from scratch. The D6 pattern:
    * foreachBatch + idempotent storage = effectively-once per doc_id.
    *
    * Carried state lives on storage, not in the state store — the
    * corpus and its labels ARE the pipeline's output tables:
    *  - `corpusDir/batch=<id>/` — each micro-batch's documents,
    *    written mode=overwrite into its OWN batch subdir, so a
    *    replayed batch overwrites itself (idempotent);
    *  - `labelsDir` — the full label table (doc_id, component,
    *    n_members, is_canonical), overwritten per batch; the next
    *    batch reads it back as `priorLabels`.
    * A replayed batch recomputes from `batch < id` corpus dirs plus
    * the prior labels and converges to the identical table (the fold
    * is deterministic and absorbing batch docs already present in the
    * prior labels is a no-op collapse), so a crash between the two
    * writes self-heals on restart — the reference's month-skip
    * idempotent backfill (flows/download_era5_land.py:81), carried
    * through the full clustering transform.
    *
    * The spec drains a MemoryStream corpus in three batches and
    * asserts the final labels equal the batch re-cluster bit-for-bit.
    */
  def streamingDedupIncremental(docs: DataFrame, corpusDir: String,
      labelsDir: String, minJaccard: Double = 0.7)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val cols = Seq("doc_id", "source", "text").map(col)
        // snapshot: a foreachBatch frame is only valid inside this
        // call, and the labels written below must not reference the
        // labelsDir files they are about to replace
        val b = batch.select(cols: _*).localCheckpoint(true)
        def release(df: DataFrame): Unit =
          org.apache.spark.sql.graftx.bridge.checkpointRdd(df)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
        try {
          val labels =
            if (!new java.io.File(labelsDir).exists())
              // first batch ever: the fold degenerates to a full
              // cluster of the batch itself
              graft.operators.DedupOps.dedupGroups(b, minJaccard)
            else {
              val prior = spark.read.parquet(labelsDir).localCheckpoint(true)
              val corpus =
                if (new java.io.File(corpusDir).exists())
                  spark.read.parquet(corpusDir)
                    .filter(col("batch") < lit(id)).select(cols: _*)
                else b.filter(lit(false)) // crash-window replay: no corpus yet
              val out = graft.operators.DedupOps
                .dedupIncremental(corpus, prior, b, minJaccard)
                .localCheckpoint(true)
              release(prior)
              out
            }
          labels.write.mode("overwrite").parquet(labelsDir)
          release(labels)
          b.write.mode("overwrite").parquet(s"$corpusDir/batch=$id")
        } finally {
          release(b)
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** Registry gate for D11 (r14, VERDICT r13 #5): the streaming
    * incremental-dedup fold driven END-TO-END from the scale-factor
    * corpus and returned as a DataFrame, so the per-round DuckDB
    * oracle certifies the streaming kernel — not just the spec. The
    * documents table is split into three parquet files (range-split on
    * doc_id — deterministic), drained as a real file stream
    * (`maxFilesPerTrigger=1` under `Trigger.AvailableNow`, the D4
    * ingest shape) through [[streamingDedupIncremental]], and the
    * carried label table is the result. The fold's convergence
    * argument (absorbing transitive merges; StreamOpsSpec "D11" pins
    * it bit-for-bit at both batch groupings) means the final labels
    * equal the one-shot batch re-cluster, so the entry shares C21
    * `dedup_groups`' oracle SQL verbatim — a fully hash-gated
    * streaming entry.
    *
    * Every invocation works in a fresh temp dir (input split, corpus,
    * labels, checkpoint), so repeated bench passes re-do the whole
    * ingest rather than replaying an old checkpoint.
    */
  def streamDedupFoldGate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val base = java.nio.file.Files
      .createTempDirectory("stream_dedup_fold").toString
    val in = s"$base/in"
    docs.repartitionByRange(3, col("doc_id")).write.parquet(in)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = streamingDedupIncremental(stream, s"$base/corpus", s"$base/labels")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$base/labels")
      .select("doc_id", "component", "n_members", "is_canonical")
  }

  /** Registry gate for D1 (r14): the windowed-aggregation streaming
    * kernel under the per-round DuckDB oracle. The events table is
    * range-split into three parquet files and drained as a file
    * stream (`maxFilesPerTrigger=1`, `Trigger.AvailableNow`) through
    * the D1 shape — tumbling 1-hour window groupBy with INCREMENTAL
    * state folding across micro-batches — into a complete-mode memory
    * sink. The aggregation buffers are A1's exact-decimal form
    * ([[graft.operators.Exact.avgD]]'s sum/count pair, carried
    * unreduced): DECIMAL(20,6) addition is associative, so the state
    * folded over any micro-batch split equals the one-shot batch
    * aggregate bit-for-bit and the final single double division
    * matches A1 — the entry shares `q_hourly_mart`'s oracle SQL
    * verbatim. (The D1 production query keeps its watermark for
    * unbounded feeds; the gate's AvailableNow drain is finite and
    * complete-mode, where a watermark would only drop late rows the
    * oracle counts.)
    *
    * Sink state is mart-sized (keys × hours), so complete mode's
    * driver-held result is bounded regardless of input volume — the
    * same argument as the A45 serving marts.
    */
  def streamHourlyGate(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts", "event_type", "value")
    val base = java.nio.file.Files
      .createTempDirectory("stream_hourly_gate").toString
    val in = s"$base/in"
    ev.repartitionByRange(3, col("event_id")).write.parquet(in)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val agg = stream
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(
        sum(col("value").cast(DecimalType(20, 6))).as("value_sum_dec"),
        count(col("value")).as("n_val"),
        count(lit(1)).as("n_obs"))
    val q = agg.writeStream.format("memory")
      .queryName("graft_stream_hourly_gate")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_stream_hourly_gate")
      .select(col("event_type"), col("window.start").as("hour_ts"),
        (col("value_sum_dec").cast("double") / col("n_val")).as("avg_value"),
        col("n_obs"))
  }

  /** D23 (r11, VERDICT r10 #7): streaming SEMANTIC-dedup fold — the
    * embedding-space twin of D11, closing the gap that the semantic
    * family had no ingest path: each arriving micro-batch of vectors
    * folds into the stored semantic components via
    * [[graft.operators.SimilarityOps.dedupSemanticIncremental]] (the
    * SAME collapsed-closure kernel as the lexical fold — batch-probe
    * cosine pairs, prior components collapsed, min-label closure,
    * fan-out). Storage contract, idempotence, and crash-replay
    * self-healing are D11's verbatim: per-batch corpus dirs
    * (overwrite-own-subdir), labels table overwritten per batch and
    * read back as the prior. The spec drains a MemoryStream corpus in
    * three batches and asserts the final labels equal the one-shot
    * [[graft.operators.SimilarityOps.dedupSemantic]] bit-for-bit.
    */
  def streamingDedupSemantic(vecs: DataFrame, corpusDir: String,
      labelsDir: String, minCosine: Double = 0.4)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val cols = Seq("vec_id", "embedding").map(col)
        val b = batch.select(cols: _*).localCheckpoint(true)
        def release(df: DataFrame): Unit =
          org.apache.spark.sql.graftx.bridge.checkpointRdd(df)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
        try {
          val labels =
            if (!new java.io.File(labelsDir).exists())
              // first batch ever: the fold degenerates to a one-shot
              // semantic cluster of the batch itself
              graft.operators.SimilarityOps.dedupSemantic(b, minCosine)
            else {
              val prior = spark.read.parquet(labelsDir).localCheckpoint(true)
              val corpus =
                if (new java.io.File(corpusDir).exists())
                  spark.read.parquet(corpusDir)
                    .filter(col("batch") < lit(id)).select(cols: _*)
                else b.filter(lit(false)) // crash-window replay: no corpus yet
              val out = graft.operators.SimilarityOps
                .dedupSemanticIncremental(corpus, prior, b, minCosine)
                .localCheckpoint(true)
              release(prior)
              out
            }
          labels.write.mode("overwrite").parquet(labelsDir)
          release(labels)
          b.write.mode("overwrite").parquet(s"$corpusDir/batch=$id")
        } finally {
          release(b)
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** D12: streaming CUSUM monitor — the online half of B41: the
    * change-in-mean fold applied at ingest, carrying per-key state on
    * storage (the D11 contract). `stats` is the batch-built co-moment
    * table ([[graft.operators.AnalyticsOps.zscoreStats]] — the same
    * offline-model/online-score split as D7). Because the fold runs
    * in B41's n-scaled INTEGER domain (cusumDevExpr: exact
    * DECIMAL(38,0) addends), folding micro-batches is exactly
    * associative — any batch split of the stream lands on state
    * bit-identical to the batch detector over the union (spec-pinned)
    * — provided batches arrive in (ts, event_id) order per key, the
    * ordered-backfill contract D11's fold also assumes. A double-
    * domain fold could not make this promise (B41's measured 3–9 ulp
    * engine/batch-split drift).
    *
    * State snapshots are written to `stateDir/batch=<id>` and the
    * fold reads back the LATEST snapshot with `batch < id` — a
    * replayed micro-batch recomputes from the prior snapshot and
    * overwrites only its own dir, so crash-replay is idempotent
    * (D11's self-healing shape).
    */
  def streamingCusum(events: DataFrame, stats: DataFrame, stateDir: String,
      retainBatches: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.DecimalType
        val spark = batch.sparkSession
        val I = DecimalType(38, 0)
        val b = batch.select(col("event_id"), col("event_type"), col("ts"),
          col("value")).localCheckpoint(true)
        try {
          val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val scoredB = b.join(broadcast(stats), "event_type")
            .withColumn("dev_s",
              graft.operators.AnalyticsOps.cusumDevExpr(col("value")))
            .withColumn("s_local", sum(col("dev_s")).over(w))
          val prior: Option[DataFrame] =
            if (!new java.io.File(stateDir).exists()) None
            else {
              val all = spark.read.parquet(stateDir)
                .filter(col("batch") < lit(id))
              val latest = all.agg(max("batch")).head()
              if (latest.isNullAt(0)) None
              else Some(all.filter(col("batch") === latest.get(0))
                .drop("batch").localCheckpoint(true))
            }
          val cum0 = prior.map(_.select(col("event_type"),
            col("cum_s").as("cum0")))
          val withCum = cum0 match {
            case Some(c) => scoredB.join(broadcast(c), Seq("event_type"), "left")
              .withColumn("s_scaled",
                coalesce(col("cum0"), lit(0).cast(I)) + col("s_local"))
            case None => scoredB.withColumn("s_scaled", col("s_local"))
          }
          val bAgg = withCum.groupBy("event_type").agg(
            max(struct(abs(col("s_scaled")).as("mag_s"), col("ts"),
              col("s_scaled"), col("event_id"))).as("mb"),
            sum("dev_s").as("dsum"), count(lit(1)).as("cnt"))
          val fresh = bAgg.select(col("event_type"),
            col("dsum").cast(I).as("cum_s"),
            col("mb.mag_s").as("best_mag"), col("mb.ts").as("best_ts"),
            col("mb.s_scaled").as("best_s"),
            col("mb.event_id").as("best_id"), col("cnt").as("n_seen"))
          val newState = prior match {
            case None => fresh
            case Some(p) =>
              // full outer: keys untouched this batch carry through
              val pb = when(col("best_ts").isNotNull,
                struct(col("best_mag").as("mag_s"), col("best_ts").as("ts"),
                  col("best_s").as("s_scaled"), col("best_id").as("event_id")))
              p.join(bAgg, Seq("event_type"), "full_outer")
                .select(col("event_type"),
                  (coalesce(col("cum_s"), lit(0).cast(I))
                    + coalesce(col("dsum").cast(I), lit(0).cast(I))).as("cum_s"),
                  greatest(pb, col("mb")).getField("mag_s").as("best_mag"),
                  greatest(pb, col("mb")).getField("ts").as("best_ts"),
                  greatest(pb, col("mb")).getField("s_scaled").as("best_s"),
                  greatest(pb, col("mb")).getField("event_id").as("best_id"),
                  (coalesce(col("n_seen"), lit(0L))
                    + coalesce(col("cnt"), lit(0L))).as("n_seen"))
          }
          newState.write.mode("overwrite").parquet(s"$stateDir/batch=$id")
          pruneSnapshots(stateDir, id, retainBatches)
          prior.foreach { p =>
            org.apache.spark.sql.graftx.bridge.checkpointRdd(p)
              .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          }
        } finally {
          org.apache.spark.sql.graftx.bridge.checkpointRdd(b)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** Snapshot retention sweep (VERDICT r8 #9): the D12–D16 monitors
    * write one `batch=<id>` directory per micro-batch and previously
    * kept them all FOREVER — harmless in a 3-batch spec, unbounded in
    * a long-lived stream. After committing batch `id`, delete every
    * snapshot with batch ≤ id − `retain`. `retain` ≥ 2 preserves the
    * idempotent crash-replay contract: Structured Streaming replays
    * at most the last uncommitted batch, whose fold reads the latest
    * snapshot < id — i.e. id − 1, always retained. (Snapshots are
    * LATEST-wins full states, not deltas, so older dirs carry no
    * information the newest doesn't.)
    */
  private def pruneSnapshots(stateDir: String, id: Long,
      retain: Int): Unit = {
    // ADVICE r9: the retain ≥ 2 contract was documented, not enforced
    // — retain = 1 deletes the batch id−1 snapshot a replayed batch id
    // needs, retain = 0 deletes batch = id right after writing it
    // (silently zeroing monitor state). Fail fast instead.
    require(retain >= 2,
      s"pruneSnapshots: retainBatches must be >= 2 to preserve the " +
        s"latest-prior crash-replay read (got $retain)")
    val root = new java.io.File(stateDir)
    val dirs = Option(root.listFiles()).getOrElse(Array.empty)
    dirs.filter(_.getName.startsWith("batch=")).foreach { d =>
      val bid = try d.getName.stripPrefix("batch=").toLong
        catch { case _: NumberFormatException => Long.MaxValue }
      if (bid <= id - retain) {
        import java.nio.file.{Files, Path}
        try Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => { Files.deleteIfExists(p); () })
        catch { case _: Throwable => () }
      }
    }
  }

  /** The latest carried D12 state snapshot (raw n-scaled integers;
    * unscale with [[graft.operators.AnalyticsOps.cusumUnscale]]).
    */
  def latestCusumState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = {
    val all = spark.read.parquet(stateDir)
    val latest = all.agg(max("batch")).head().get(0)
    all.filter(col("batch") === latest).drop("batch")
  }

  /** D13: streaming heavy hitters — B47's SpaceSaving sketch as a
    * LIVE monitor. Per micro-batch: sketch the batch (bounded
    * `capacity` counters per key), union the PRIOR state's counters,
    * and fold both through the weighted SpaceSaving merge — possible
    * precisely because the summary is MERGEABLE (est/err bracket
    * survives any merge order), which exact per-item counting at
    * 100 TB item cardinality is not (its state grows with distinct
    * items; this state is fixed at capacity rows per key forever).
    *
    * State snapshots under `stateDir/batch=<id>` with latest-prior
    * reads — D11/D12's idempotent crash-replay shape. The bracket the
    * batch operator proves per run (est ≥ true ≥ est − err, dominant
    * items resident) carries to the folded state; the spec checks it
    * against exact whole-history counts after a multi-batch drain.
    */
  def streamingHeavyHitters(events: DataFrame, stateDir: String,
      capacity: Int = 64, retainBatches: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("event_type"), col("user_id"))
          .localCheckpoint(true)
        try {
          val batchCounters = b
            .groupBy("event_type")
            .agg(graft.functions.VectorFns
              .space_saving(col("user_id").cast("string"), capacity).as("hh"))
            .select(col("event_type"), explode(col("hh")).as("e"))
            .select(col("event_type"), col("e.item").as("item"),
              col("e.est").as("est"), col("e.err").as("err"))
          val prior: Option[DataFrame] =
            if (!new java.io.File(stateDir).exists()) None
            else {
              val all = spark.read.parquet(stateDir)
                .filter(col("batch") < lit(id))
              val latest = all.agg(max("batch")).head()
              if (latest.isNullAt(0)) None
              else Some(all.filter(col("batch") === latest.get(0))
                .drop("batch").localCheckpoint(true))
            }
          val merged = prior match {
            case None => batchCounters
            case Some(p) => p.unionByName(batchCounters)
              .groupBy("event_type")
              .agg(graft.functions.VectorFns.space_saving_merge(
                col("item"), col("est"), col("err"), capacity).as("hh"))
              .select(col("event_type"), explode(col("hh")).as("e"))
              .select(col("event_type"), col("e.item").as("item"),
                col("e.est").as("est"), col("e.err").as("err"))
          }
          merged.write.mode("overwrite").parquet(s"$stateDir/batch=$id")
          pruneSnapshots(stateDir, id, retainBatches)
          prior.foreach { p =>
            org.apache.spark.sql.graftx.bridge.checkpointRdd(p)
              .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          }
        } finally {
          org.apache.spark.sql.graftx.bridge.checkpointRdd(b)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** The latest folded D13 sketch state. */
  def latestHeavyHittersState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = {
    val all = spark.read.parquet(stateDir)
    val latest = all.agg(max("batch")).head().get(0)
    all.filter(col("batch") === latest).drop("batch")
  }

  /** D14: streaming χ² drift monitor — B51 as a LIVE gate. The state
    * is B51's observed-count grid (key, cohort, o): per micro-batch
    * one partial-agg groupBy produces the batch's cells, a full-outer
    * join ADDS them to the prior snapshot — exact integer addition is
    * associative and commutative, so the folded grid equals the
    * whole-history batch grid bit-for-bit on ANY batch split (the D12
    * argument, without even needing a quantization step), and
    * [[graft.operators.AnalyticsOps.chiSquareFromObs]] applied to the
    * state is IDENTICAL math to the batch operator — one statistic,
    * two feeds. State is ≤ R·C rows per snapshot forever (cohorts are
    * a fixed mod; keys are the monitored dimension), written under
    * `stateDir/batch=<id>` with latest-prior reads — D11/D12/D13's
    * idempotent crash-replay shape.
    */
  def streamingChiSquare(events: DataFrame, stateDir: String,
      nCohorts: Int = 4, retainBatches: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("event_type"), col("user_id"))
          .localCheckpoint(true)
        try {
          val bObs = graft.operators.AnalyticsOps.chiSquareObs(b, nCohorts)
          val prior: Option[DataFrame] =
            if (!new java.io.File(stateDir).exists()) None
            else {
              val all = spark.read.parquet(stateDir)
                .filter(col("batch") < lit(id))
              val latest = all.agg(max("batch")).head()
              if (latest.isNullAt(0)) None
              else Some(all.filter(col("batch") === latest.get(0))
                .drop("batch").localCheckpoint(true))
            }
          val merged = prior match {
            case None => bObs
            case Some(p) => p
              .select(col("event_type"), col("cohort"), col("o").as("o0"))
              .join(bObs, Seq("event_type", "cohort"), "full_outer")
              .select(col("event_type"), col("cohort"),
                (coalesce(col("o0"), lit(0L)) + coalesce(col("o"), lit(0L)))
                  .as("o"))
          }
          merged.write.mode("overwrite").parquet(s"$stateDir/batch=$id")
          pruneSnapshots(stateDir, id, retainBatches)
          prior.foreach { p =>
            org.apache.spark.sql.graftx.bridge.checkpointRdd(p)
              .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          }
        } finally {
          org.apache.spark.sql.graftx.bridge.checkpointRdd(b)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** The live D14 statistic: B51's exact math over the latest folded
    * count grid.
    */
  def latestChiSquare(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = {
    val all = spark.read.parquet(stateDir)
    val latest = all.agg(max("batch")).head().get(0)
    graft.operators.AnalyticsOps.chiSquareFromObs(
      all.filter(col("batch") === latest).drop("batch"))
  }

  /** D15: streaming corpus-drift monitor — C69 as a LIVE gate over a
    * document feed (the question it answers online: "has the source
    * mix's token distribution moved since the snapshot the mixture
    * weights were tuned on?"). The state is C69's (source, tok, c_st)
    * count table: per micro-batch one tokenize + partial-agg groupBy,
    * a full-outer ADD into the prior snapshot (exact integer addition
    * — the D14 associativity argument verbatim), and
    * [[graft.operators.TextOps.corpusDivergenceFromCounts]] applied
    * to the folded state IS the batch statistic on the whole history,
    * bit-for-bit. State is |sources × vocab| rows — the corpus
    * datasheet's own scale, not the corpus's; snapshots under
    * `stateDir/batch=<id>` with latest-prior reads (the D11-D14
    * idempotent crash-replay shape).
    */
  def streamingCorpusDivergence(documents: DataFrame, stateDir: String,
      retainBatches: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    documents.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("source"), col("text"))
          .localCheckpoint(true)
        try {
          val bObs = b.select(col("source"),
              explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
            .groupBy("source", "tok").agg(count(lit(1)).as("c_st"))
          val prior: Option[DataFrame] =
            if (!new java.io.File(stateDir).exists()) None
            else {
              val all = spark.read.parquet(stateDir)
                .filter(col("batch") < lit(id))
              val latest = all.agg(max("batch")).head()
              if (latest.isNullAt(0)) None
              else Some(all.filter(col("batch") === latest.get(0))
                .drop("batch").localCheckpoint(true))
            }
          val merged = prior match {
            case None => bObs
            case Some(p) => p
              .select(col("source"), col("tok"), col("c_st").as("c0"))
              .join(bObs, Seq("source", "tok"), "full_outer")
              .select(col("source"), col("tok"),
                (coalesce(col("c0"), lit(0L))
                  + coalesce(col("c_st"), lit(0L))).as("c_st"))
          }
          merged.write.mode("overwrite").parquet(s"$stateDir/batch=$id")
          pruneSnapshots(stateDir, id, retainBatches)
          prior.foreach { p =>
            org.apache.spark.sql.graftx.bridge.checkpointRdd(p)
              .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          }
        } finally {
          org.apache.spark.sql.graftx.bridge.checkpointRdd(b)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** The live D15 statistic: C69's exact math over the latest folded
    * count table.
    */
  def latestCorpusDivergence(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = {
    val all = spark.read.parquet(stateDir)
    val latest = all.agg(max("batch")).head().get(0)
    graft.operators.TextOps.corpusDivergenceFromCounts(
      all.filter(col("batch") === latest).drop("batch"))
  }

  /** D16: streaming Welch mean-drift monitor — B48 as a LIVE gate.
    * The state is B48's (event_type, parity, n, Σx, Σx²) co-moment
    * grid: per micro-batch one partial-agg groupBy, a full-outer ADD
    * into the prior snapshot — the D14 associativity argument
    * verbatim (exact DECIMAL(38,0) integer addition, lossless on any
    * batch split), so the folded grid equals the whole-history batch
    * grid bit-for-bit, and [[graft.operators.AnalyticsOps
    * .welchFromComoments]] applied to it IS the batch statistic (one
    * math object, two feeds — D14's design). State is ≤ 2·|keys| rows
    * per snapshot forever, under `stateDir/batch=<id>` with
    * latest-prior reads and the retention sweep (D11-D15's idempotent
    * crash-replay shape).
    */
  def streamingWelch(events: DataFrame, stateDir: String,
      retainBatches: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("event_type"), col("ts"), col("value"))
          .localCheckpoint(true)
        try {
          val bG = graft.operators.AnalyticsOps.welchComoments(b)
          val prior: Option[DataFrame] =
            if (!new java.io.File(stateDir).exists()) None
            else {
              val all = spark.read.parquet(stateDir)
                .filter(col("batch") < lit(id))
              val latest = all.agg(max("batch")).head()
              if (latest.isNullAt(0)) None
              else Some(all.filter(col("batch") === latest.get(0))
                .drop("batch").localCheckpoint(true))
            }
          val merged = prior match {
            case None => bG
            case Some(p) => p
              .select(col("event_type"), col("p"), col("n").as("n0"),
                col("s1").as("s1_0"), col("s2").as("s2_0"))
              .join(bG, Seq("event_type", "p"), "full_outer")
              .select(col("event_type"), col("p"),
                (coalesce(col("n0"), lit(0L))
                  + coalesce(col("n"), lit(0L))).as("n"),
                (coalesce(col("s1_0"), lit(0).cast(DecimalType(38, 0)))
                  + coalesce(col("s1"), lit(0).cast(DecimalType(38, 0))))
                  .as("s1"),
                (coalesce(col("s2_0"), lit(0).cast(DecimalType(38, 0)))
                  + coalesce(col("s2"), lit(0).cast(DecimalType(38, 0))))
                  .as("s2"))
          }
          merged.write.mode("overwrite").parquet(s"$stateDir/batch=$id")
          pruneSnapshots(stateDir, id, retainBatches)
          prior.foreach { p =>
            org.apache.spark.sql.graftx.bridge.checkpointRdd(p)
              .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          }
        } finally {
          org.apache.spark.sql.graftx.bridge.checkpointRdd(b)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** The live D16 statistic: B48's exact math over the latest folded
    * co-moment grid.
    */
  def latestWelch(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = {
    val all = spark.read.parquet(stateDir)
    val latest = all.agg(max("batch")).head().get(0)
    graft.operators.AnalyticsOps.welchFromComoments(
      all.filter(col("batch") === latest).drop("batch"))
  }

  /** D19: streaming Brown–Forsythe variance-drift monitor — B55 as a
    * LIVE gate, completing the streaming drift family's VARIANCE axis
    * (D16 watches the mean, D17 the omnibus ranks, D18 the CDF shape;
    * a sensor that starts JITTERING drifts in none of those first).
    * The offline-model/online-score split is D7/D12's: deviations are
    * taken from the FIXED per-key medians trained at deployment
    * ([[graft.operators.AnalyticsOps.leveneMedians]]), so the state —
    * B55's (key, n, Σz, Σz²) co-moment grid — is mergeable integer
    * state, folded per micro-batch by a full-outer exact ADD (the D14
    * associativity argument verbatim), and
    * [[graft.operators.AnalyticsOps.leveneFromComoments]] applied to
    * the folded grid IS the whole-history batch statistic bit-for-bit
    * on any batch split. State ≤ |keys| rows per snapshot forever,
    * under `stateDir/batch=<id>` with latest-prior reads + the
    * retention sweep.
    */
  def streamingLevene(events: DataFrame, medians: DataFrame,
      stateDir: String, retainBatches: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("event_type"), col("value"))
          .localCheckpoint(true)
        try {
          val bG = graft.operators.AnalyticsOps.leveneComoments(b, medians)
          val prior: Option[DataFrame] =
            if (!new java.io.File(stateDir).exists()) None
            else {
              val all = spark.read.parquet(stateDir)
                .filter(col("batch") < lit(id))
              val latest = all.agg(max("batch")).head()
              if (latest.isNullAt(0)) None
              else Some(all.filter(col("batch") === latest.get(0))
                .drop("batch").localCheckpoint(true))
            }
          val merged = prior match {
            case None => bG
            case Some(p) => p
              .select(col("event_type"), col("n").as("n0"),
                col("s").as("s_0"), col("q").as("q_0"))
              .join(bG, Seq("event_type"), "full_outer")
              .select(col("event_type"),
                (coalesce(col("n0"), lit(0L))
                  + coalesce(col("n"), lit(0L))).as("n"),
                (coalesce(col("s_0"), lit(0).cast(DecimalType(38, 0)))
                  + coalesce(col("s"), lit(0).cast(DecimalType(38, 0))))
                  .as("s"),
                (coalesce(col("q_0"), lit(0).cast(DecimalType(38, 0)))
                  + coalesce(col("q"), lit(0).cast(DecimalType(38, 0))))
                  .as("q"))
          }
          merged.write.mode("overwrite").parquet(s"$stateDir/batch=$id")
          pruneSnapshots(stateDir, id, retainBatches)
          prior.foreach { p =>
            org.apache.spark.sql.graftx.bridge.checkpointRdd(p)
              .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          }
        } finally {
          org.apache.spark.sql.graftx.bridge.checkpointRdd(b)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** The live D19 statistic: B55's exact math over the latest folded
    * co-moment grid.
    */
  def latestLevene(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = {
    val all = spark.read.parquet(stateDir)
    val latest = all.agg(max("batch")).head().get(0)
    graft.operators.AnalyticsOps.leveneFromComoments(
      all.filter(col("batch") === latest).drop("batch"))
  }

  /** D20: streaming Jarque–Bera normality monitor — B56 LIVE,
    * completing the drift family's parametric-SHAPE axis (D16 mean,
    * D19 variance, D17/D18 nonparametric; this one watches the
    * skewness/kurtosis the z-score thresholds assume). Deviations are
    * taken from the FIXED per-key reference centers trained at
    * deployment ([[graft.operators.AnalyticsOps.jbCenter]] — central
    * moments are shift-invariant, so the frozen center changes
    * nothing), making the state — B56's (key, n, Σz..Σz⁴) grid —
    * mergeable integer state folded by a full-outer exact ADD, and
    * [[graft.operators.AnalyticsOps.jarqueBeraFromComoments]] over
    * the folded grid IS the whole-history batch statistic bit-for-bit
    * on any batch split. State ≤ |keys| rows per snapshot.
    */
  def streamingJarqueBera(events: DataFrame, center: DataFrame,
      stateDir: String, retainBatches: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("event_type"), col("value"))
          .localCheckpoint(true)
        try {
          val bG = graft.operators.AnalyticsOps.jarqueBeraComoments(b, center)
          val prior: Option[DataFrame] =
            if (!new java.io.File(stateDir).exists()) None
            else {
              val all = spark.read.parquet(stateDir)
                .filter(col("batch") < lit(id))
              val latest = all.agg(max("batch")).head()
              if (latest.isNullAt(0)) None
              else Some(all.filter(col("batch") === latest.get(0))
                .drop("batch").localCheckpoint(true))
            }
          val zero = lit(0).cast(DecimalType(38, 0))
          val merged = prior match {
            case None => bG
            case Some(p) => p
              .select(col("event_type"), col("n").as("n0"),
                col("s1").as("s1_0"), col("s2").as("s2_0"),
                col("s3").as("s3_0"), col("s4").as("s4_0"))
              .join(bG, Seq("event_type"), "full_outer")
              .select(col("event_type"),
                (coalesce(col("n0"), lit(0L))
                  + coalesce(col("n"), lit(0L))).as("n"),
                (coalesce(col("s1_0"), zero)
                  + coalesce(col("s1"), zero)).as("s1"),
                (coalesce(col("s2_0"), zero)
                  + coalesce(col("s2"), zero)).as("s2"),
                (coalesce(col("s3_0"), zero)
                  + coalesce(col("s3"), zero)).as("s3"),
                (coalesce(col("s4_0"), zero)
                  + coalesce(col("s4"), zero)).as("s4"))
          }
          merged.write.mode("overwrite").parquet(s"$stateDir/batch=$id")
          pruneSnapshots(stateDir, id, retainBatches)
          prior.foreach { p =>
            org.apache.spark.sql.graftx.bridge.checkpointRdd(p)
              .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          }
        } finally {
          org.apache.spark.sql.graftx.bridge.checkpointRdd(b)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** The live D20 statistic: B56's exact math over the latest folded
    * grid.
    */
  def latestJarqueBera(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = {
    val all = spark.read.parquet(stateDir)
    val latest = all.agg(max("batch")).head().get(0)
    graft.operators.AnalyticsOps.jarqueBeraFromComoments(
      all.filter(col("batch") === latest).drop("batch"))
  }

  /** D17: streaming Kruskal–Wallis — B54's omnibus rank gate LIVE.
    * The state is B54's (event_type, value, c) count grid: per
    * micro-batch one partial-agg groupBy, a full-outer integer ADD
    * into the prior snapshot (the D14 associativity argument
    * verbatim), and [[graft.operators.AnalyticsOps.kruskalFromCounts]]
    * applied to the folded grid IS the whole-history batch statistic
    * bit-for-bit — rank grids are a pure function of the counts, so
    * even a rank-based test streams losslessly once its sufficient
    * statistic is the count table. State is |keys × distinct values|
    * rows (the same bounded domain B54's quarantine guards), under
    * `stateDir/batch=<id>` with latest-prior reads + the retention
    * sweep.
    */
  def streamingKruskal(events: DataFrame, stateDir: String,
      retainBatches: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("event_type"), col("value"))
          .localCheckpoint(true)
        try {
          val bObs = b.groupBy("event_type", "value")
            .agg(count(lit(1)).as("c"))
          val prior: Option[DataFrame] =
            if (!new java.io.File(stateDir).exists()) None
            else {
              val all = spark.read.parquet(stateDir)
                .filter(col("batch") < lit(id))
              val latest = all.agg(max("batch")).head()
              if (latest.isNullAt(0)) None
              else Some(all.filter(col("batch") === latest.get(0))
                .drop("batch").localCheckpoint(true))
            }
          val merged = prior match {
            case None => bObs
            case Some(p) => p
              .select(col("event_type"), col("value"), col("c").as("c0"))
              .join(bObs, Seq("event_type", "value"), "full_outer")
              .select(col("event_type"), col("value"),
                (coalesce(col("c0"), lit(0L)) + coalesce(col("c"), lit(0L)))
                  .as("c"))
          }
          merged.write.mode("overwrite").parquet(s"$stateDir/batch=$id")
          pruneSnapshots(stateDir, id, retainBatches)
          prior.foreach { p =>
            org.apache.spark.sql.graftx.bridge.checkpointRdd(p)
              .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          }
        } finally {
          org.apache.spark.sql.graftx.bridge.checkpointRdd(b)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** The live D17 statistic: B54's exact math over the latest folded
    * count grid.
    */
  def latestKruskal(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = {
    val all = spark.read.parquet(stateDir)
    val latest = all.agg(max("batch")).head().get(0)
    graft.operators.AnalyticsOps.kruskalFromCounts(
      all.filter(col("batch") === latest).drop("batch"))
  }

  /** D18: streaming binned Kolmogorov–Smirnov — B44's production
    * variant as the LIVE distribution-SHAPE gate (the classic online
    * drift monitor: has any key's value distribution diverged from
    * the pooled rest since deployment?). The state is the
    * (event_type, bin, c) half-up-quantized count grid — bounded by
    * CONSTRUCTION (that is exactly why the binned form exists) — and
    * the fold is the D17 full-outer integer ADD, so the folded grid
    * equals the whole-history grid bit-for-bit and
    * [[graft.operators.AnalyticsOps.ksBinnedFromCounts]] applied to
    * it IS the batch statistic: CDFs, like ranks, are a pure function
    * of the counts. Snapshots under `stateDir/batch=<id>`,
    * latest-prior reads, retention sweep.
    */
  def streamingKsBinned(events: DataFrame, stateDir: String,
      decimals: Int = 2, retainBatches: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val scale = math.pow(10.0, decimals)
        val b = batch.select(col("event_type"), col("value"))
          .localCheckpoint(true)
        try {
          val bObs = b.select(col("event_type"),
              floor(col("value") * lit(scale) + lit(0.5)).cast("long")
                .as("bin"))
            .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
          val prior: Option[DataFrame] =
            if (!new java.io.File(stateDir).exists()) None
            else {
              val all = spark.read.parquet(stateDir)
                .filter(col("batch") < lit(id))
              val latest = all.agg(max("batch")).head()
              if (latest.isNullAt(0)) None
              else Some(all.filter(col("batch") === latest.get(0))
                .drop("batch").localCheckpoint(true))
            }
          val merged = prior match {
            case None => bObs
            case Some(p) => p
              .select(col("event_type"), col("bin"), col("c").as("c0"))
              .join(bObs, Seq("event_type", "bin"), "full_outer")
              .select(col("event_type"), col("bin"),
                (coalesce(col("c0"), lit(0L)) + coalesce(col("c"), lit(0L)))
                  .as("c"))
          }
          merged.write.mode("overwrite").parquet(s"$stateDir/batch=$id")
          pruneSnapshots(stateDir, id, retainBatches)
          prior.foreach { p =>
            org.apache.spark.sql.graftx.bridge.checkpointRdd(p)
              .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          }
        } finally {
          org.apache.spark.sql.graftx.bridge.checkpointRdd(b)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** The live D18 statistic: B44-binned's exact math over the latest
    * folded count grid.
    */
  def latestKsBinned(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, decimals: Int = 2): DataFrame = {
    val all = spark.read.parquet(stateDir)
    val latest = all.agg(max("batch")).head().get(0)
    graft.operators.AnalyticsOps.ksBinnedFromCounts(
      all.filter(col("batch") === latest).drop("batch"), decimals)
  }

  /** D1: streaming hourly mart — per (event_type, 1h window) mean,
    * 10-minute watermark. Works on any streaming DataFrame with the
    * events schema (tests feed it from MemoryStream).
    */
  /** D22: streaming RESERVOIR sample — C46's deterministic
    * corpus-global k-draw over an UNBOUNDED stream: the k smallest
    * seeded-md5 priorities are a MERGEABLE summary (top-k of a union
    * is the top-k of per-part top-k's, and the (priority, doc_id)
    * order is total), so the state is ≤ k rows forever and the live
    * sample equals the batch draw over the whole history BIT-FOR-BIT
    * on any batch split — the deterministic form of reservoir
    * sampling, with rerun/replay stability the classical
    * random-replacement reservoir cannot offer (same latest-prior
    * snapshot shape as D11-D20). The prior∪batch merge dedups on
    * doc_id before the limit(k) (the union is ≤ 2k rows, so the
    * dropDuplicates is free), so a RE-DELIVERED doc — an at-least-once
    * upstream — occupies one slot, not two, and the live sample stays
    * equal to the batch draw without assuming D5's exactly-once
    * contract.
    */
  def streamingSample(docs: DataFrame, stateDir: String, k: Int = 100,
      seed: String = "graft", retainBatches: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("doc_id"), col("source"))
          .localCheckpoint(true)
        try {
          val scored = graft.operators.TextOps.sampleTopK(b, k, seed)
          val prior: Option[DataFrame] =
            if (!new java.io.File(stateDir).exists()) None
            else {
              val all = spark.read.parquet(stateDir)
                .filter(col("batch") < lit(id))
              val latest = all.agg(max("batch")).head()
              if (latest.isNullAt(0)) None
              else Some(all.filter(col("batch") === latest.get(0))
                .drop("batch").localCheckpoint(true))
            }
          val merged = prior match {
            case None => scored
            case Some(p) => p.unionByName(scored)
              .dropDuplicates("doc_id")
              .orderBy(col("prio"), col("doc_id")).limit(k)
          }
          merged.write.mode("overwrite").parquet(s"$stateDir/batch=$id")
          pruneSnapshots(stateDir, id, retainBatches)
          prior.foreach { p =>
            org.apache.spark.sql.graftx.bridge.checkpointRdd(p)
              .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          }
        } finally {
          org.apache.spark.sql.graftx.bridge.checkpointRdd(b)
            .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
          graft.CacheRegistry.unpersistAll()
        }
      }

  /** The live D22 sample: the latest carried k-draw. */
  def latestSample(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = {
    val all = spark.read.parquet(stateDir)
    val latest = all.agg(max("batch")).head().get(0)
    all.filter(col("batch") === latest).drop("batch")
  }

  /** D7: stream-STATIC scoring join — the online half of B28: a
    * batch-built stats table (tiny, one row per key) broadcast onto
    * the live stream, each event scored and flagged as it arrives.
    * This is the canonical "model built offline, applied online"
    * deployment shape (the reference scores dashboard series against
    * mart history the same way); stream-static joins are stateless —
    * the static side is just re-broadcast per micro-batch, no
    * watermark, no state store.
    *
    * `stats` must carry (event_type, n, s1, s2) from
    * [[graft.operators.AnalyticsOps]]'s co-moment recipe; the z
    * arithmetic mirrors B28 exactly (same fixed double-op sequence).
    */
  def streamingZscore(events: DataFrame, stats: DataFrame,
      threshold: Double = 2.5): DataFrame =
    events
      .join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"), col("ts"), col("value"),
        // the ONE shared z definition — batch/stream bit-equality is
        // structural, not a convention two copies must uphold
        graft.operators.AnalyticsOps.zscoreExpr(col("value")).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > lit(threshold))

  /** D9: the 7-variable grid hourly mart (A22's first two stages) as
    * a STREAM over the DSv2 connector — readStream on graft-grid,
    * then the IDENTICAL transformation object the batch mart runs
    * ([[graft.operators.AgriOps.hourlyFromGrid]]): spatial decimal
    * means per (region, hour), unit conversions on the means. Batch/
    * stream parity is therefore structural — one plan, two sources —
    * and the spec drains an AvailableNow run into a complete-mode
    * sink and asserts row-set equality with the batch mart. At
    * backfill scale this is D8's day-granular checkpointed resume
    * carrying the full transform, not just the extract.
    */
  def gridHourlyStream(spark: org.apache.spark.sql.SparkSession): DataFrame =
    graft.operators.AgriOps.hourlyFromGrid(
      spark.readStream.format("graft-grid").load())

  def streamingHourlyMart(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(avg("value").as("avg_value"), count(lit(1)).as("n_obs"))
      .select(col("event_type"), col("window.start").as("hour_ts"),
        col("avg_value"), col("n_obs"))

  /** D3: stream-stream join — attribute each purchase to the same
    * user's click within the preceding hour. Both sides carry
    * watermarks and the join condition bounds the event-time range, so
    * Spark can evict join state once the watermark passes (unbounded
    * state otherwise — the failure mode of naive stream joins).
    */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c,
      p("user_id") === c("user_id")
        && col("click_ts") <= col("purchase_ts")
        && col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(p("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"), col("value"))
  }

  case class SessionState(start: Long, last: Long, nEvents: Int, sumValue: Double)
  case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
      n_events: Int, sum_value: Double)

  /** D2: sessionization with explicit state — a session closes after
    * `gapMinutes` of event-time inactivity. Custom state the built-in
    * windows can't express: per-user dynamic-length sessions.
    * Event-time timeout (not processing-time) keeps replays
    * deterministic and doesn't spin empty timeout micro-batches.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.last, s.nEvents, s.sumValue))
          } else {
            // Bounded by design, not unbounded: this materializes ONE
            // user's events from ONE micro-batch (not the whole
            // stream) — the watermark upper-bounds how much late data
            // a batch can carry, and trigger intervals bound batch
            // size. A pathological hot user whose per-batch volume
            // can't fit an executor should be salted upstream
            // (user_id, ts-bucket) before sessionizing.
            val evs = it.toSeq.sortBy(_.ts.getTime)
            if (evs.isEmpty) Iterator.empty
            else {
              val gapMs = gapMinutes * 60000L
              var cur = state.getOption
              val closed = Seq.newBuilder[SessionOut]
              evs.foreach { e =>
                val t = e.ts.getTime
                cur match {
                  case Some(s) if t - s.last <= gapMs =>
                    cur = Some(s.copy(last = t, nEvents = s.nEvents + 1,
                      sumValue = s.sumValue + e.value))
                  case Some(s) =>
                    closed += SessionOut(userId, s.start, s.last, s.nEvents,
                      s.sumValue)
                    cur = Some(SessionState(t, t, 1, e.value))
                  case None =>
                    cur = Some(SessionState(t, t, 1, e.value))
                }
              }
              cur.foreach { s =>
                state.update(s)
                state.setTimeoutTimestamp(s.last + gapMs)
              }
              closed.result().iterator
            }
          }
      }
  }

  /** Batch-mode sessionization with the same gap semantics (for
    * correctness cross-checks and backfills): window lag + cumulative
    * session ids — the declarative twin of [[sessionize]].
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapMs = gapMinutes * 60000L
    events
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        graft.operators.Exact.sumD(col("value")).as("sum_value"))
  }
}
