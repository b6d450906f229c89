package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps
import graft.sources.Tables

class ScaleOpsSpec extends SparkSpec {

  test("saltedSum equals direct aggregation") {
    val events = Tables.events(spark, sf)
    val salted = ScaleOps.saltedSum(events, "event_type", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // direct side in the same exact-decimal domain: a plain double sum
    // can differ in the last ulp and flip round(.,4)
    val direct = events.groupBy("event_type")
      .agg(round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(20, 6))), 4)
        .cast("double").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("bucketed join plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    // session warehouse is fixed at startup; use unique table names
    val events = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val users = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    ScaleOps.writeBucketed(events, "graft_ev_b", "user_id")
    ScaleOps.writeBucketed(users, "graft_us_b", "user_id")
    val joined = ScaleOps.bucketedJoin(spark, "graft_ev_b", "graft_us_b", "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() === events.count())
    spark.sql("DROP TABLE IF EXISTS graft_ev_b")
    spark.sql("DROP TABLE IF EXISTS graft_us_b")
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // the engine-side complement to the explicit salting patterns:
    // B21/B29 are the build-sides-AQE-can't-split story, this pins
    // that Spark's adaptive skew-join DOES fire where it can — so at
    // 100 TB a hot key in a fact-fact join is split without manual
    // salting, and a regression in our session conf (AQE off, skew
    // thresholds broken) fails here instead of in production
    val hot = spark.range(200000).select(lit(1L).as("k"),
      col("id").as("v"))
    val rest = spark.range(64).select((col("id") + 2).as("k"),
      col("id").as("v"))
    val left = hot.union(rest)
    // one row per key on the right: the join output is |left|, and
    // the skewed 200k-row LEFT partition is what AQE must split
    val right = spark.range(66).select(col("id").as("k"),
      (col("id") * 2).as("w"))
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      // thresholds low enough that the 200k-row hot partition counts
      // as skewed at test scale; broadcasts off so the join stays SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val j = left.join(right, "k")
      // execute THIS dataset's query execution — count() builds a
      // separate one whose adaptive plan would never finalize here
      assert(j.collect().length === 200064)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join split did not fire:\n${plan.take(2000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("saltedJoin is row-identical to the plain join") {
    val events = Tables.events(spark, sf)
    val dim = events.groupBy("event_type").agg(count(lit(1)).as("type_total"))
    val salted = ScaleOps.saltedJoin(events, dim, "event_type")
      .select("event_id", "event_type", "type_total")
    val plain = events.join(dim, "event_type")
      .select("event_id", "event_type", "type_total")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedJoin spreads a hot key across salt buckets") {
    val events = Tables.events(spark, sf)
    val dim = events.groupBy("event_type").agg(count(lit(1)).as("type_total"))
    // re-derive the fact-side salt distribution the join used: every
    // bucket of a hot key should get some rows (16 buckets, ~hundreds
    // of rows per key at sf0.001)
    val salted = events.withColumn("__salt",
      pmod(xxhash64(events.columns.map(col): _*), lit(16)))
    val buckets = salted.groupBy("event_type").agg(
      countDistinct(col("__salt")).as("n_buckets"),
      count(lit(1)).as("n"))
    assert(buckets.filter(col("n") > 100 && col("n_buckets") < 8).count() === 0)
    assert(dim.count() > 0)
  }

  test("skewAudit: counts partition the table, shares and skew normalize to 1") {
    val events = Tables.events(spark, sf)
    val audit = ScaleOps.skewAudit(events, "event_type").collect()
    assert(audit.map(_.getLong(1)).sum === events.count())
    assert(math.abs(audit.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    assert(math.abs(audit.map(_.getDouble(3)).sum / audit.length - 1.0) < 1e-9)
  }

  test("rangeJoin matches the naive BETWEEN join and plans no nested loop") {
    import org.apache.spark.sql.types.DecimalType
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    val bucketed = ScaleOps.rangeJoin(orders, lineitem).cache()
    // the declarative pure-range formulation Spark plans as a
    // BroadcastNestedLoopJoin — the semantics rangeJoin must preserve
    val iv = orders.groupBy(col("o_orderpriority").as("priority"),
        date_trunc("quarter", col("o_orderdate")).as("q_start"))
      .agg(min(col("o_orderdate")).as("lo"), max(col("o_orderdate")).as("hi"))
    val naive = lineitem
      .join(iv, col("l_shipdate") >= col("lo") && col("l_shipdate") <= col("hi"))
      .groupBy("priority", "q_start")
      .agg(count(lit(1)).as("n_items"),
        graft.operators.Exact.sumD(col("l_quantity"), 2).as("sum_qty"))
    assert(bucketed.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(bucketed).count() === 0)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bucketized range join must hash-join on the month bucket:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    bucketed.unpersist()
  }
}
