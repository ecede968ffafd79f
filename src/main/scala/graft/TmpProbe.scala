package graft

// Scratch decomposition probe for the r19 optimization session —
// NOT part of the engine; deleted/neutralized before round end.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

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
    val s = spark
    val d = sfDir

    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        def onQueryStarted(e: QueryStartedEvent): Unit = ()
        def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          println(s"[tmp]   batch=${p.batchId} rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs}")
          p.stateOperators.foreach(so =>
            println(s"[tmp]     state op=${so.operatorName} " +
              s"rows=${so.numRowsTotal} commitMs=${so.commitTimeMs}"))
        }
        def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      })

    def tsec[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tmp]   $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    def newScratchDir(prefix: String): java.io.File = {
      val f = java.nio.file.Files.createTempDirectory(prefix).toFile
      f.deleteOnExit(); f
    }

    // ---- s01 decomposition ----
    def s01(): Unit = {
      println("[tmp] ==== s01_streaming_rollup ====")
      val base = tsec("scratch+copy") {
        val b = newScratchDir("graft_s01x")
        val srcDir = new java.io.File(b, "src")
        srcDir.mkdirs()
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          java.nio.file.Paths.get(srcDir.getPath, "events.parquet"))
        b
      }
      val srcDir = new java.io.File(base, "src")
      val raw = tsec("schema read")(s.read.parquet(srcDir.getPath).schema)
      val stream = Tables.normalizeTs(
        EventStream.fileSource(s, srcDir.getPath, raw))
        .filter(col("ts") >= lit("2024-01-30 00:00:00"))
      val q = tsec("start") {
        EventStream.startGoldStream(
          EventStream.hourlyRollup(stream),
          s"${base.getPath}/gold", s"${base.getPath}/ckpt")
      }
      val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val sampler = new Thread(() => {
        while (!stop.get()) {
          val traces = Thread.getAllStackTraces()
          traces.forEach { (t, st) =>
            if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
              // record the deepest non-jdk frame chain tail (5 frames)
              val frames = st.take(12).map(f =>
                s"${f.getClassName.split('.').last}.${f.getMethodName}")
                .mkString("<-")
              hist.merge(frames, 1, (a, b) => a + b)
            }
          }
          Thread.sleep(20)
        }
      })
      sampler.setDaemon(true); sampler.start()
      tsec("awaitTermination")(q.awaitTermination())
      stop.set(true)
      import scala.jdk.CollectionConverters._
      hist.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (f, c) =>
        println(s"[tmp]   SAMPLE x$c  $f")
      }
      tsec("readback noop") {
        graft.ops.Manifest.read(s, s"${base.getPath}/gold", "run_hr")
          .select(col("run_hr").cast("long").as("run_hr"),
            col("event_type"), col("n"), col("total"))
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ---- s05 decomposition ----
    def s05(): Unit = {
      println("[tmp] ==== s05_stream_stream_join ====")
      val base = tsec("scratch+copy") {
        val b = newScratchDir("graft_s05x")
        val srcDir = new java.io.File(b, "src")
        srcDir.mkdirs()
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          java.nio.file.Paths.get(srcDir.getPath, "events.parquet"))
        b
      }
      val srcDir = new java.io.File(base, "src")
      val raw = tsec("schema read")(s.read.parquet(srcDir.getPath).schema)
      val stream = Tables.normalizeTs(
        EventStream.fileSource(s, srcDir.getPath, raw))
        .filter(col("ts") >= lit("2024-01-20 00:00:00"))
      val out = s"${base.getPath}/joined"
      val q = tsec("start") {
        EventStream.startManifestSink(
          EventStream.clickAttribution(stream)
            .select(col("purchase_id"), col("user_id"),
              unix_micros(col("p_ts")).as("p_ts_us"),
              col("click_id"), unix_micros(col("c_ts")).as("click_ts_us")),
          out, s"${base.getPath}/ckpt")
      }
      tsec("awaitTermination")(q.awaitTermination())
      tsec("readback noop") {
        graft.ops.Manifest.read(s, out, "batch_id")
          .drop("batch_id")
          .write.format("noop").mode("overwrite").save()
      }
    }

    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    println("[tmp] ======== B32: checksums off, 32 parts ========")
    (1 to 3).foreach(_ => s01())
    (1 to 2).foreach(_ => s05())
    println("[tmp] ======== B4: checksums off, 4 parts ========")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    (1 to 3).foreach(_ => s01())
    (1 to 2).foreach(_ => s05())
    spark.stop()
  }
}
