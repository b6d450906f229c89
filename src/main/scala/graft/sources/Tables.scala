package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed rows for the test tables (TPC-H-ish star schema + events /
  * documents / embeddings). One place that knows the on-disk schema.
  *
  * Mirrors the reference's data model: the reference reads
  * hive-partitioned parquet marts (region=/year=/month=, see
  * /root/reference/dask_jobs/aggregate_hourly.py:105-117); here every
  * table is a single parquet file per scale factor.
  */
object Schemas {
  case class Region(r_regionkey: Int, r_name: String)
  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
      s_acctbal: Double)
  case class Part(p_partkey: Long, p_name: String, p_brand: String,
      p_type: String, p_size: Int, p_retailprice: Double)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp,
      o_orderpriority: String)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.sql.Timestamp)
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
}

/** Loaders. All reads are plain `spark.read.parquet` so Catalyst owns
  * pushdown/pruning; callers `.select` only what they need.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark's vector
    * reader rejects. Read nanos as long (legacy conf) and convert to a
    * microsecond timestamp — values are µs-aligned in the test data,
    * and Spark timestamps are µs precision anyway.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // nanosAsLong is a session-wide SQLConf (not a per-read option).
    // Guarded set: idempotent, and the only possible race writes the
    // same value. Deployments sharing one session across jobs should
    // set it once at session build instead.
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      // pandas-written timestamp[us] with isAdjustedToUTC=false reads
      // as TIMESTAMP_NTZ; the session TZ is pinned to UTC
      // (GraftSession), so casting to TIMESTAMP_LTZ is value-preserving
      // and keeps the DuckDB oracle (which reads the same naive
      // values) bit-identical.
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  def eventsDs(s: SparkSession, d: String): Dataset[Schemas.Event] = {
    import s.implicits._
    events(s, d).as[Schemas.Event]
  }
}
