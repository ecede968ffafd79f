package graft

import org.apache.spark.sql.functions._

import graft.ops.{Relational, TopKAgg}

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("bounded top-k aggregator equals the window top-k exactly") {
    val orders = Tables(spark, sf, "orders")
    val viaWindow = Relational.topKPerGroup(orders, 3,
      Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn").cast("long").as("rn"))
      .as[(Long, Long, Double, Long)].collect().toSet
    val viaAgg = orders
      .groupBy(col("o_custkey"))
      .agg(TopKAgg.top_k(3)(col("o_totalprice"), col("o_orderkey"))
        .as("topk"))
      .select(col("o_custkey"), posexplode(col("topk")))
      .select(col("o_custkey"), col("col.id").as("o_orderkey"),
        col("col.score").as("o_totalprice"),
        (col("pos") + 1).cast("long").as("rn"))
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("partial buffers stay bounded at k under merge") {
    val agg = new TopKAgg.TopKAggregator(2)
    val big = (1 to 100).map(i => TopKAgg.Entry(i.toDouble, i.toLong))
    val buf = big.foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 2)
    val merged = agg.merge(buf,
      Seq(TopKAgg.Entry(1000.0, 7L), TopKAgg.Entry(0.5, 8L)))
    assert(merged.length == 2)
    assert(agg.finish(merged).map(_.id) == Seq(7L, 100L))
  }
}
