package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bucketing, Skew}

class BucketingSkewSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with no exchange on the join key") {
    val orders = Tables(spark, sf, "orders")
    val customer = Tables(spark, sf, "customer")
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "b_customer", "c_custkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the test exercises bucket
      // co-location rather than a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark,
        "b_orders", "b_customer", "o_custkey", "c_custkey")
        .select(col("o_orderkey"), col("c_name"))
      val expected = orders.join(customer,
        col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("saltedJoin equals the plain join on a skewed key") {
    val hot = (1 to 5000).map(i => (42L, s"evt_$i")) ++
      (1 to 50).map(i => (i.toLong % 7, s"cold_$i"))
    val fact = hot.toDF("user_id", "payload")
    val dim = (0L to 50L).map(i => (i, s"user_$i")).toDF("uid", "name")
    val plain = fact.join(dim, col("user_id") === col("uid"))
      .groupBy(col("name")).count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(fact, dim, "user_id", "uid",
      saltFactor = 8)
      .groupBy(col("name")).count()
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(plain("user_42") == 5000L)
  }

  test("saltedJoin preserves left-join semantics for unmatched keys") {
    val fact = Seq((1L, "a"), (99L, "b")).toDF("user_id", "payload")
    val dim = Seq((1L, "user_1")).toDF("uid", "name")
    val rows = Skew.saltedJoin(fact, dim, "user_id", "uid",
      saltFactor = 4, joinType = "left")
      .select(col("payload"), col("name"))
      .as[(String, Option[String])].collect().toSet
    assert(rows == Set(("a", Some("user_1")), ("b", None)))
  }

  test("saltedCountSum equals plain groupBy and shuffles twice, " +
      "partial stage keyed on (key, salt)") {
    // one hot key dominating, plus a cold tail
    val rows = (1 to 4000).map(i => ("hot", i * 0.01)) ++
      (1 to 60).map(i => (s"cold_${i % 7}", i * 1.0))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedCountSum(df, Seq(col("k")), col("v"), 8)
    val plain = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
    val a = salted.as[(String, Long, Double)].collect().toSet
    val b = plain.as[(String, Long, Double)].collect().toSet
    assert(a == b, "salted rewrite must be bit-equal to plain groupBy")
    // plan law: two exchanges; the first partitions on (k, __salt)
    val plan = salted.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$plan")
    assert(plan.contains("__salt"),
      s"first exchange must carry the salt, plan:\n$plan")
  }
}
