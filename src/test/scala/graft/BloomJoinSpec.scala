package graft

import org.apache.spark.sql.functions._
import graft.operators.AnalyticsOps
import graft.sources.Tables

/** Asserts Spark's runtime bloom-filter injection fires on the
  * selective fact-to-fact join (B27): when neither side broadcasts,
  * the optimizer should build a bloom filter over the filtered orders
  * keys and probe it below the lineitem shuffle — the runtime
  * semi-join reduction that cuts shuffled fact rows at scale.
  */
class BloomJoinSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) =>
      // getOption-style: unset keys (or defined-without-default, which
      // get() surfaces as null) restore via unset
      k -> (try Option(spark.conf.get(k)) catch { case _: Throwable => None })
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter is injected under shuffle-join conditions") {
    withConf(
      // force a shuffle join (broadcast pruning would subsume the
      // bloom filter at this tiny SF) and drop the application-side
      // size floor so the optimization triggers on test data
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val df = AnalyticsOps.urgentOrderRevenue(
        Tables.orders(spark, sf), Tables.lineitem(spark, sf))
      val plan = df.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloomfilter") || plan.contains("might_contain"),
        s"no bloom filter in optimized plan:\n${plan.take(2000)}")
      // and the filtered join still computes the right aggregate
      val viaShuffle = df.collect()
      assert(viaShuffle.nonEmpty)
      viaShuffle.foreach { r =>
        assert(r.getAs[String]("o_orderpriority") === "1-URGENT")
        assert(r.getAs[Long]("n_items") > 0)
      }
    }
  }

  test("bloom-filtered plan result equals the unfiltered-plan result") {
    val plain = AnalyticsOps.urgentOrderRevenue(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf)).collect()
    val bloomed = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      AnalyticsOps.urgentOrderRevenue(
        Tables.orders(spark, sf), Tables.lineitem(spark, sf)).collect()
    }
    assert(plain.map(_.toString).sorted.toSeq
      === bloomed.map(_.toString).sorted.toSeq)
  }
}
