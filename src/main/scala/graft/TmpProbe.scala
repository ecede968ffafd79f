package graft

// Scratch decomposition probe for the r19 optimization session —
// NOT part of the engine; deleted/neutralized before round end.
import org.apache.spark.sql.SparkSession

object TmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("tmp-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val listener = new org.apache.spark.scheduler.SparkListener {
      val acc = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        acc.computeIfAbsent(s"start:${js.jobId}", _ => new java.util.concurrent.atomic.AtomicLong(System.nanoTime()))
        acc.computeIfAbsent(s"desc:${js.jobId}", _ => new java.util.concurrent.atomic.AtomicLong(0))
        descs.put(js.jobId, desc)
      }
      val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(acc.get(s"start:${je.jobId}")).map(_.get()).getOrElse(0L)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[tmp] job ${je.jobId}%4d ${sec}%7.2f s  ${descs.getOrDefault(je.jobId, "?").take(110)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm once, then one instrumented run
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println("[tmp] ======== instrumented run ========")
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[tmp] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
