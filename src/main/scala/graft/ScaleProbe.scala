package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ns.Similarity

/** Scaling probe for the two ANN operators whose sf0.1→sf1 bench
  * ratios need decomposition (SCALE.md):
  *
  *  - IVF (ns16): the bench number mixes the OFFLINE index build
  *    (k-means fit — linear in min(corpus, fitSampleCap)) with the
  *    ONLINE probe (per-query ~ nprobe·corpus/nlist). This probe
  *    times them separately: first call = build + probe, second call
  *    = cached probe only.
  *  - LSH near-dup pairs (ns07): with a FIXED bucketLength, bucket
  *    occupancy grows linearly with corpus density, so self-join
  *    candidates grow ~quadratically — the classic LSH density trap.
  *    The scale knob is narrowing bucketLength (or adding tables) as
  *    density grows; this probe times tuned settings and reports the
  *    verified pair count (candidates are exact-verified, so pair
  *    counts are comparable across settings: more pairs = more
  *    recall, never false positives).
  *
  * Usage: runMain graft.ScaleProbe SF_DIR BUCKET_LENGTHS(comma)
  *   [MINCOS] [CAPS(comma; 0 = uncapped)]
  * MINCOS (default 0.4) sets the near-dup threshold: sweeping it up
  * separates output-volume cost from candidate-generation cost (at a
  * threshold with zero true pairs, the probe times pure bucketing +
  * verify overhead). CAPS sweeps `maxBucketSize` (the density-adaptive
  * subdivision knob); verified-pair counts double as recall (exact
  * ground truth from numpy in SCALE.md: 920 @ sf0.1, 95 967 @ sf1 at
  * minCosine 0.4). Output: one JSON line. Results in SCALE.md. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val bls = (if (args.length > 1) args(1) else "0.1")
      .split(",").map(_.toDouble).toSeq
    val minCos = if (args.length > 2) args(2).toDouble else 0.4
    val caps = (if (args.length > 3) args(3) else "0")
      .split(",").map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val emb = Tables(spark, sfDir, "embeddings")

    // IVF: cold (fit + assign + probe) vs warm (cached probe)
    def ivfOnce(): Long = Similarity.ivfTopK(
      emb, "vec_id", "embedding", emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6,
      indexKey = Some(s"$sfDir/embeddings")).count()
    val (_, coldSec) = timed(ivfOnce())
    val (_, warmSec) = timed(ivfOnce())

    // LSH near-dup: per-(bucketLength, cap) wall + verified pair count
    val lsh = (for (bl <- bls; cap <- caps) yield {
      val (n, sec) = timed(Similarity.cosineNearDupPairs(
        emb, "vec_id", "embedding", minCosine = minCos,
        numHashTables = 8, bucketLength = bl,
        maxBucketSize = if (cap > 0) Some(cap) else None).count())
      f""""bl_${bl}_cap_$cap":{"sec":$sec%.1f,"pairs":$n}"""
    }).mkString(",")
    val line = f"""{"metric":"scale_probe","sf":"$sfDir","min_cosine":$minCos,"ivf_cold_sec":$coldSec%.1f,"ivf_warm_probe_sec":$warmSec%.1f,$lsh}"""
    spark.stop()
    println(line)
  }
}
