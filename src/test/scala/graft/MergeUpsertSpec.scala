package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.ops.MergeUpsert

/** O15 keyed MERGE laws: update/insert/keep semantics, idempotent
  * replay, and — the copy-on-write scale contract — untouched
  * partitions' data files byte-identical across the merge. */
class MergeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def freshTarget(): String = {
    val dir = Files.createTempDirectory("graft_merge_spec").toString
    val base = Seq(
      (1L, "alpha", 10L), (2L, "beta", 10L), (3L, "gamma", 20L),
      (4L, "delta", 20L), (5L, "epsilon", 30L))
      .toDF("id", "name", "part")
    MergeUpsert.init(base, s"$dir/t", "part")
    s"$dir/t"
  }

  private def dataFiles(path: String, partDir: String): Map[String, Array[Byte]] =
    Files.list(Paths.get(path, partDir)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> Files.readAllBytes(p))
      .toMap

  private val delta = Seq(
    (1L, "alpha_v2", 10L),   // update in part=10
    (6L, "zeta", 10L))       // insert into part=10
    .toDF("id", "name", "part")

  test("merge = update matched, insert new, keep the rest") {
    val path = freshTarget()
    val touched = MergeUpsert.merge(delta, path, Seq("id"), "part")
    assert(touched == Seq(10L))
    val got = spark.read.parquet(path)
      .select($"id", $"name", $"part".cast("long").as("part"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "alpha_v2", 10L), (2L, "beta", 10L), (3L, "gamma", 20L),
      (4L, "delta", 20L), (5L, "epsilon", 30L), (6L, "zeta", 10L)))
  }

  test("untouched partitions are never rewritten (byte-identical files)") {
    val path = freshTarget()
    val before20 = dataFiles(path, "part=20")
    val before30 = dataFiles(path, "part=30")
    assert(before20.nonEmpty && before30.nonEmpty)
    MergeUpsert.merge(delta, path, Seq("id"), "part")
    val after20 = dataFiles(path, "part=20")
    val after30 = dataFiles(path, "part=30")
    assert(after20.keySet == before20.keySet && after30.keySet == before30.keySet)
    assert(before20.forall { case (f, b) => after20(f).sameElements(b) })
    assert(before30.forall { case (f, b) => after30(f).sameElements(b) })
  }

  test("merge is idempotent: replaying the same delta is a no-op") {
    val path = freshTarget()
    MergeUpsert.merge(delta, path, Seq("id"), "part")
    val once = spark.read.parquet(path)
      .select($"id", $"name", $"part".cast("long").as("part"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    MergeUpsert.merge(delta, path, Seq("id"), "part")
    val twice = spark.read.parquet(path)
      .select($"id", $"name", $"part".cast("long").as("part"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(once == twice)
  }

  private val deleteReq = Seq(
    (1L, 10L),               // partial delete in part=10
    (3L, 20L), (4L, 20L))    // ALL of part=20 — directory must go
    .toDF("id", "part")

  test("delete removes listed keys; a fully-emptied partition's " +
      "directory disappears") {
    val path = freshTarget()
    val touched = MergeUpsert.delete(deleteReq, path, Seq("id"), "part")
    assert(touched.toSet == Set(10L, 20L))
    val got = spark.read.parquet(path)
      .select($"id", $"name", $"part".cast("long").as("part"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, "beta", 10L), (5L, "epsilon", 30L)))
    assert(!Files.exists(Paths.get(path, "part=20")),
      "fully-deleted partition directory must be removed")
  }

  test("delete leaves untouched partitions byte-identical") {
    val path = freshTarget()
    val before30 = dataFiles(path, "part=30")
    assert(before30.nonEmpty)
    MergeUpsert.delete(deleteReq, path, Seq("id"), "part")
    val after30 = dataFiles(path, "part=30")
    assert(after30.keySet == before30.keySet &&
      before30.forall { case (f, b) => after30(f).sameElements(b) })
  }

  test("delete is idempotent: replaying the same requests is a no-op") {
    val path = freshTarget()
    MergeUpsert.delete(deleteReq, path, Seq("id"), "part")
    def snap() = spark.read.parquet(path)
      .select($"id", $"name", $"part".cast("long").as("part"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val once = snap()
    MergeUpsert.delete(deleteReq, path, Seq("id"), "part")
    assert(snap() == once)
  }

  test("merge fails fast on column drift between delta and target") {
    val path = freshTarget()
    val bad = Seq((1L, 10L)).toDF("id", "part") // missing `name`
    val e = intercept[IllegalArgumentException] {
      MergeUpsert.merge(bad, path, Seq("id"), "part")
    }
    assert(e.getMessage.contains("must equal target columns"))
  }

  test("target scan is partition-pruned to the delta's partitions") {
    val path = freshTarget()
    // Reconstruct the pruned read merge() performs and assert the
    // filter lands as a partition filter, not a data filter.
    val pruned = spark.read.parquet(path).filter($"part".isin(10L))
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(part"),
      s"expected partition filter in scan:\n$scan")
  }
}
