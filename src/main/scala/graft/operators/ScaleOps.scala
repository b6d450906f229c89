package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew- and shuffle-management patterns for cluster scale: salted
  * two-phase aggregation and bucketed co-located joins. These don't
  * change results — they change the shuffle shape, which is what
  * breaks first at 100 TB.
  */
object ScaleOps {

  /** Two-phase salted aggregation: groupBy(key, salt) partial →
    * groupBy(key) final. When one key holds a disproportionate share
    * of rows, a plain groupBy sends that whole key to one reducer; the
    * salt fans the hot key across `saltBuckets` reducers first. Works
    * for any algebraic aggregate (sum/count/min/max shown).
    *
    * Spark's partial (map-side) aggregation already handles most skew
    * for algebraic aggs; salting matters when per-key state is too big
    * for map-side combine (e.g. collect-heavy aggs) or with AQE off —
    * exposed here as the explicit pattern.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    // partial sums run in exact decimal (graft.operators.Exact
    // rationale): the salted two-phase merge must produce the
    // bit-identical result of a plain groupBy, whatever the salt
    // spread — that equality is oracle-checked
    import org.apache.spark.sql.types.DecimalType
    // salt from ROW CONTENT, not monotonically_increasing_id: mid
    // depends on partition layout, so a stage retry after a fetch
    // failure would re-salt recomputed rows into different reducers
    // (the SPARK-23207 duplicate/drop class). Content-hash salts are
    // stable under any recomputation.
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast(DecimalType(20, 6))).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(round(sum("__psum"), 4).cast("double").as("value_sum"),
        sum("__pcnt").as("n"))
  }

  /** Salted skew join: fact side gets a random salt in [0, S); the
    * (small-ish but not broadcastable) build side is replicated S
    * ways; the join runs on (key, salt), fanning each hot key across
    * S reducers instead of one. Produces bit-identical rows to the
    * plain join — oracle-checked against the unsalted SQL.
    *
    * When to reach for it at 100 TB: AQE's skew-join split handles
    * skew between two SHUFFLED sides, but when the build side is an
    * aggregate Spark won't split (or key skew is known a priori and
    * you want a deterministic plan), explicit salting is the pattern.
    * Cost model: replicates the build side S× (keep it small),
    * removes the single-reducer ceiling on the probe side.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val dimExp = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit((saltBuckets - 1).toLong))))
    // content-hash salt (see saltedSum): deterministic under stage
    // retries, unlike monotonically_increasing_id
    fact
      .withColumn("__salt",
        pmod(xxhash64(fact.columns.map(col): _*), lit(saltBuckets)))
      .join(dimExp, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** B35: pure range (interval) join with NO equi key, made
    * scale-safe by bucketizing the range dimension.
    *
    * Shape: probe rows carry a point (l_shipdate); the build side is
    * a set of [lo, hi] intervals (per-priority quarterly activity
    * spans derived from orders — overlapping across priorities, so no
    * equi column exists). A naive plan is a BroadcastNestedLoopJoin:
    * every probe row compares against every interval — O(|probe|·|iv|)
    * compares, and a non-broadcastable build side degenerates to a
    * cartesian product. The bucket trick re-expresses the range
    * predicate as an equi-join: each interval explodes into the month
    * buckets it covers, each probe point maps to exactly ONE bucket
    * (its own month), and the join runs hash-on-bucket with the
    * BETWEEN as a residual filter. Each (probe, interval) pair meets
    * at most once — at the probe's month — so no post-join dedup is
    * needed. Per-row work drops from O(|iv|) comparisons to a hash
    * probe of the intervals sharing the month.
    *
    * At 100 TB: the interval side stays dimension-sized (it's an
    * aggregate of the calendar), so its month-exploded form is
    * broadcast and the FACT SIDE NEVER SHUFFLES before the final
    * partial-agg'd groupBy. Bucket granularity (month here) tunes the
    * residual false-positive rate; a fact-sized interval side would
    * shuffle both sides on the bucket instead — same plan, still no
    * cross product.
    *
    * Reference analog: the dashboard's time-range slicing
    * (/root/reference/dashboards/app.py:118-142 filters marts to a
    * user-picked [start, end]) done for ALL windows at once.
    */
  def rangeJoin(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val iv = orders.groupBy(
        col("o_orderpriority").as("priority"),
        date_trunc("quarter", col("o_orderdate")).as("q_start"))
      .agg(min(col("o_orderdate")).as("lo"), max(col("o_orderdate")).as("hi"))
    val ivMonths = iv.withColumn("bucket",
      explode(sequence(
        date_trunc("month", col("lo")),
        date_trunc("month", col("hi")),
        expr("interval 1 month"))))
    val probe = lineitem
      .select(col("l_shipdate"), col("l_quantity"))
      .withColumn("bucket", date_trunc("month", col("l_shipdate")))
    probe.join(broadcast(ivMonths),
        probe("bucket") === ivMonths("bucket") &&
          col("l_shipdate") >= col("lo") && col("l_shipdate") <= col("hi"))
      .groupBy("priority", "q_start")
      .agg(count(lit(1)).as("n_items"),
        Exact.sumD(col("l_quantity"), 2).as("sum_qty"))
  }

  /** B38: key-skew audit — the measurement that decides when the
    * salting patterns above are worth their replication cost. Per
    * key: row count, share of total, and skew factor n/(total/|keys|)
    * (1.0 = perfectly uniform; AQE's skew-join threshold thinks in
    * the same ratio). Run it on a join/groupBy key BEFORE burning a
    * day on an OOM'd 100-TB shuffle.
    *
    * Exactness: counts are integers; share and skew are one double
    * division each on identical integer inputs — IEEE bit-identical.
    *
    * Scale shape: one partial-agg'd groupBy down to |keys| rows, a
    * single-row total/|keys| aggregate cross-joined back (broadcast
    * of 1 row). Output is |keys| rows — audit-sized, never
    * fact-sized.
    */
  def skewAudit(df: DataFrame, key: String): DataFrame = {
    // persist the |keys|-row aggregate: totals re-derives from it, and
    // without the barrier Spark would scan + aggregate the full input
    // TWICE (no common-subplan dedup) — on the very table this audit
    // is supposed to measure before paying for
    val perKey = graft.CacheRegistry.persist(
      df.groupBy(col(key)).agg(count(lit(1)).as("n")))
    val totals = perKey.agg(
      sum("n").as("total"), count(lit(1)).as("n_keys"))
    perKey.crossJoin(broadcast(totals))
      .select(col(key), col("n"),
        (col("n").cast("double") / col("total")).as("share"),
        (col("n").cast("double") * col("n_keys") / col("total"))
          .as("skew_factor"))
  }

  /** Write both sides of a recurring join bucketed on the join key so
    * the join plans with zero Exchange (co-located, shuffle-free).
    * Bucketed layout is the static twin of what AQE does dynamically —
    * and the only option when the same fact table is joined every hour
    * at 100 TB (pay the shuffle once at write time).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a table registered in a PREVIOUS metastore leaves its warehouse
    // directory behind after the metastore is recreated; creation then
    // throws LOCATION_ALREADY_EXISTS even under overwrite mode.
    // Ordering: the orphan check runs AFTER the DROP — dropping a
    // managed table removes its directory, so anything still on disk
    // here is unregistered leftovers, never a live table's data (a
    // failed write can no longer destroy a version the catalog still
    // serves). The identifier is lowercased the way saveAsTable
    // normalizes unquoted names, so a mixed-case `table` computes the
    // SAME path the write will use (ADVICE r3).
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(
          table.toLowerCase(java.util.Locale.ROOT))))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — with matching
    * bucket counts Catalyst plans a SortMergeJoin with no Exchange on
    * either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
