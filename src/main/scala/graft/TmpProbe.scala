package graft

// Scratch decomposition probe for the r19 optimization session —
// NOT part of the engine; deleted/neutralized before round end.
import org.apache.spark.sql.SparkSession

object TmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("tmp-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // config variants, A/B'd in one JVM via isolated child sessions
    val variants: Seq[(String, Map[String, String])] = Seq(
      "base" -> Map.empty,
      "pf_false" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false"),
      "shj" -> Map(
        "spark.sql.join.preferSortMergeJoin" -> "false"),
      "both" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.join.preferSortMergeJoin" -> "false"))
    val sessions = variants.map { case (tag, confs) =>
      val ss = spark.newSession()
      confs.foreach { case (k, v) => ss.conf.set(k, v) }
      tag -> ss
    }

    def once(ss: SparkSession, name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(ss, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warm everything once (codegen/JIT/file listing)
    names.foreach(n => once(sessions.head._2, n))
    val rounds = 3
    val acc = scala.collection.mutable.Map.empty[(String, String),
      List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to rounds; n <- names; (tag, ss) <- sessions)
      acc((tag, n)) = once(ss, n) :: acc((tag, n))
    for (n <- names) {
      val cells = variants.map { case (tag, _) =>
        f"$tag=${acc((tag, n)).min}%.2f" }.mkString("  ")
      println(f"[tmp] $n%-36s $cells")
    }
    for ((tag, _) <- variants) {
      val tot = names.map(n => acc((tag, n)).min).sum
      println(f"[tmp] TOTAL $tag%-10s $tot%.2f")
    }
    spark.stop()
  }
}
