package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed-layout contract: a fact⋈fact equi-join over two tables
  * bucketed on the join key plans with ZERO Exchange — the write-time
  * shuffle is the only one that ever happens.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed join elides both exchanges and matches the plain join") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the shuffle-join path: broadcast would trivially hide the
    // exchange the layout is supposed to eliminate
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 8)
      Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 8)

      val joined = Bucketing.bucketedJoin(spark,
        "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
      val expect = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey")).count()
      assert(joined.count() === expect)

      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)

      // and an aggregation on the bucket key reuses the layout too
      val agg = spark.table("lineitem_b")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation still shuffles:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
