package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ns.Similarity

class NsSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("cosine: identity, orthogonality, opposition") {
    val df = vecs(
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(0f, 1f, 0f),
      3L -> Seq(-2f, 0f, 0f), 4L -> Seq(3f, 0f, 0f))
    val c = df.as("a").crossJoin(df.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(math.abs(c((1L, 4L)) - 1.0) < 1e-12)
    assert(math.abs(c((1L, 2L))) < 1e-12)
    assert(math.abs(c((1L, 3L)) + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val corpus = vecs(
      10L -> Seq(1f, 0f), 11L -> Seq(0.9f, 0.1f),
      12L -> Seq(0f, 1f), 13L -> Seq(1f, 0f))
    val queries = vecs(1L -> Seq(1f, 0f))
    val out = Similarity.bruteForceTopK(
      corpus, "vec_id", "embedding", queries, "vec_id", "embedding", 3)
      .select(col("rank"), col("vec_id"))
      .as[(Long, Long)].collect().sortBy(_._1)
    // cos: 10→1.0, 13→1.0, 11→~0.994, 12→0.0; tie 10 vs 13 → id asc.
    assert(out.toSeq == Seq((1L, 10L), (2L, 13L), (3L, 11L)))
  }

  test("annTopK approximates brute-force top-k with high recall, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, minCosine = 0.15)
    val plan = ann.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    val got = ann.select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall over ${exact.size} exact pairs")
  }

  test("cosineNearDupPairs finds high-cosine pairs via bucketed join") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // exact truth by brute force (test-only; the operator is bucketed)
    val exact = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .filter(col("c") >= 0.4)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val got = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall over ${exact.size} exact pairs")
    // verified candidates: no false positives w.r.t. the threshold
    assert(got.subsetOf(
      emb.as("a").crossJoin(emb.as("b"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
        .filter(col("c") >= 0.39) // tiny fp slack from distance round-trip
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet))
  }
}
