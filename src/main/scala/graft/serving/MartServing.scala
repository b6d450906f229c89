package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The reference's SERVING layer re-expressed at library level: its
  * Streamlit dashboard (/root/reference/dashboards/app.py) answers
  * every widget from `@st.cache_data`-cached mart queries against
  * Postgres — load_regions (:24-29), load_daily/load_hourly range
  * loads (:32-62), wide_series pivot (:65-73), kpi_row (:76-81).
  *
  * The Spark-native analog of "a serving process with a query cache"
  * is a SESSION-SCOPED registry of materialized marts: `register` a
  * mart once (persist MEMORY_AND_DISK + temp view), then every
  * dashboard-shaped query is a filter/pivot/agg over the in-memory
  * columnar cache — an InMemoryTableScan, not a recomputation of the
  * mart's lineage (the spec asserts exactly that on the physical
  * plan). `refresh` re-materializes after a pipeline cycle rewrites
  * the mart — the TTL analog, but explicit: serving reflects a mart
  * VERSION, not a wall clock.
  *
  * Scale: marts are serving-sized (per reference: regions × days),
  * so the cache is small even when the inputs were 100 TB; queries
  * against it are partition-pruned in-memory scans. The engine side
  * of a real deployment (Spark Connect / JDBC Thrift serving the
  * same session) changes nothing below this object.
  */
object MartServing {

  /** Materialize `mart` for serving under `name`. Returns the cached
    * frame. Re-registering a name drops the previous version first
    * (refresh semantics).
    */
  def register(spark: SparkSession, mart: DataFrame, name: String): DataFrame = {
    unregister(spark, name)
    val cached = mart.persist(StorageLevel.MEMORY_AND_DISK)
    cached.createOrReplaceTempView(name)
    // materialize eagerly: serving latency should be paid at register
    // time, not by the first dashboard query
    cached.count()
    cached
  }

  /** Drop the cached mart and its view (no-op if absent). */
  def unregister(spark: SparkSession, name: String): Unit =
    if (spark.catalog.tableExists(name)) {
      spark.catalog.uncacheTable(name)
      spark.catalog.dropTempView(name)
    }

  /** Re-materialize after the pipeline rewrote the mart — the
    * explicit-version form of the dashboard's ttl=60 cache.
    */
  def refresh(spark: SparkSession, mart: DataFrame, name: String): DataFrame =
    register(spark, mart, name)

  /** load_regions: SELECT DISTINCT key ORDER BY 1 from the cache. */
  def keys(spark: SparkSession, name: String, keyCol: String): DataFrame =
    spark.table(name).select(keyCol).distinct().orderBy(keyCol)

  /** load_daily / load_hourly: key IN-list + inclusive time range,
    * ordered — the dashboard's only filter shape.
    */
  def rangeLoad(spark: SparkSession, name: String, keyCol: String,
      keys: Seq[String], timeCol: String, start: String,
      end: String): DataFrame =
    spark.table(name)
      .filter(col(keyCol).isin(keys: _*)
        && col(timeCol) >= to_timestamp(lit(start))
        && col(timeCol) <= to_timestamp(lit(end)))
      .orderBy(keyCol, timeCol)

  /** wide_series: time × key pivot of one metric (mean on
    * collisions, as pandas pivot_table defaults).
    */
  def wideSeries(spark: SparkSession, name: String, keyCol: String,
      keys: Seq[String], timeCol: String, metric: String): DataFrame =
    spark.table(name)
      .groupBy(col(timeCol))
      .pivot(keyCol, keys)
      .agg(graft.operators.Exact.avgD(col(metric)))
      .orderBy(timeCol)

  /** kpi_row: rows / distinct keys / time extent in one row. */
  def kpiRow(spark: SparkSession, name: String, keyCol: String,
      timeCol: String): DataFrame =
    spark.table(name).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(keyCol)).as("n_keys"),
      min(col(timeCol)).as("t_start"),
      max(col(timeCol)).as("t_end"))
}
