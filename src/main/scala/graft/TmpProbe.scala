package graft

// Scratch decomposition probe for the r18 optimization session —
// NOT part of the engine; deleted before commit.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ns.Dedup

object TmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("tmp-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val mins = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[tmp] $label%-32s min=${mins.min}%.2f all=${mins.map(m => f"$m%.2f").mkString(",")}")
      mins.min
    }

    // full ns02b
    time("ns02b full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      3, 0.5, maxDocFreq = Some(1000)))
    // shingles + distinct only
    time("shingles distinct") {
      Dedup.shingles(docs, "doc_id", "text", 3)
    }
    // shingles + df-cap join
    time("shingles + dfcap") {
      val g0 = Dedup.shingles(docs, "doc_id", "text", 3)
      val rare = g0.groupBy(col("gram"))
        .agg(count(lit(1)).as("df_count"))
        .filter(col("df_count") <= 1000).select(col("gram"))
      g0.join(rare, "gram")
    }
    // hashed-gram variant: no gram string ever built; distinct over
    // (id, long) instead of (id, string)
    def hashShingles(n: Int) = {
      val words = col("__words")
      val ghash = (i: org.apache.spark.sql.Column) =>
        xxhash64((1 to n).map(j => element_at(words, i + j)): _*)
      val grams = when(size(words) >= n,
        transform(sequence(lit(0), size(words) - n), i => ghash(i)))
        .otherwise(array().cast("array<long>"))
      docs.filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          split(graft.ns.Dedup.normText(col("text")), " ").as("__words"))
        .select(col("doc_id"), explode(grams).as("gh"))
        .filter(col("gh").isNotNull)
        .distinct()
    }
    time("hash shingles distinct")(hashShingles(3))
    // full ns02b shape on hashed grams (cap 5, threshold 0.5)
    time("ns02b-shape hashed") {
      val g0 = hashShingles(3)
      val rare = g0.groupBy(col("gh"))
        .agg(count(lit(1)).as("df_count"))
        .filter(col("df_count") <= 5).select(col("gh"))
      val g = g0.join(rare, "gh")
      val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val a = g.select(col("doc_id").as("id_a"), col("gh")).as("ga")
      val b = g.select(col("doc_id").as("id_b"), col("gh")).as("gb")
      val common = a.join(b, col("ga.gh") === col("gb.gh") &&
        col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("common"))
      common
        .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          (col("common").cast("double") /
            (col("sz_a") + col("sz_b") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }
    // reference: full ns02b (cap 5) string form
    time("ns02b full cap5")(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      3, 0.5, maxDocFreq = Some(5)))
    spark.stop()
  }
}
