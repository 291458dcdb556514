package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join story at 100 TB: both fact tables
  * written `bucketBy(N, key)` hash-partition their files identically, so
  * an equi-join on the key plans with NO Exchange on either side — the
  * shuffle happened once at write time and is amortized over every
  * subsequent join. (Salting covers skew — `jx_skew_safe_join`; bucketing
  * covers repeat-join amortization.) */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed equi-join plans without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    // force the shuffle-based join path: broadcast would sidestep the
    // bucketing property this spec is about
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b").join(spark.table("orders_b"),
        $"l_orderkey" === $"o_orderkey")
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // the JOIN itself must not shuffle either side: the only allowed
      // exchange is the one for the groupBy on a different key
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin") ||
        joinSection.contains("ShuffledHashJoin"), s"plan:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not re-shuffle:\n$plan")
      // and the answer matches the unbucketed computation
      val expected = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
        .orderBy("o_custkey").collect().toSeq
      assert(joined.orderBy("o_custkey").collect().toSeq == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
