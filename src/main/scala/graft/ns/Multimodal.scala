package graft.ns

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for LLM-data
  * pipelines (SURVEY.md §2.8 [NS]). Media payloads are opaque `binary`
  * columns with typed metadata alongside — pointer-not-payload beyond
  * ~1 MB per object is the 100 TB rule (store a path, not the bytes).
  *
  * The DECODE step is STUBBED: this container has no image/audio
  * codecs, so [[defaultDecode]] is a clearly-marked deterministic fake
  * keyed on payload size. Everything AROUND the decode is real and
  * tested — the binaryFile source schema, the metadata projection, the
  * batched `mapPartitions` execution shape (the Scala analogue of a
  * vectorized/batched decode UDF: payload bytes reach the decoder in
  * per-partition batches, never row-at-a-time through the driver), and
  * the frame-sampling fan-out.
  */
object Multimodal {

  /** One decoded media row: real payload facts (name, bytes, sha256)
    * plus decoder output (dims — stubbed here). */
  final case class MediaFeatures(file_name: String, byte_len: Long,
      sha256: String, width: Int, height: Int)

  /** Batched decode hook signature: a partition's payloads arrive in
    * batches of `batchSize`; returns (width, height) per payload. A
    * real deployment plugs a codec (JNI/javacv) here — the engine-side
    * contract does not change. */
  type DecodeBatch = Seq[Array[Byte]] => Seq[(Int, Int)]

  /** STUB decoder: deterministic fake dimensions from the payload
    * size. Replace with a real codec to productionize; keeping it a
    * pure function of the bytes preserves idempotent re-runs. */
  val defaultDecode: DecodeBatch =
    batch => batch.map { bytes =>
      ((bytes.length % 640 + 1), ((bytes.length * 7) % 480 + 1))
    }

  /** Binary-file source: one row per file under `dir` matching `glob`,
    * with Spark's binaryFile schema (path, modificationTime, length,
    * content) plus a projected file_name. Filters on `length`/path
    * push down to the file listing, so "skip payloads > 1 MB" costs
    * no reads. */
  def readBinaryDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .withColumn("file_name",
        element_at(split(col("path"), "/"), -1))

  /** Decode features over binary payloads in per-partition batches.
    * The sha256/byte_len columns are computed by (codegen'd) native
    * expressions before the typed mapPartitions, so the decoder hook
    * receives exactly (name, bytes) pairs — the minimal surface a
    * codec needs. */
  def decodeFeatures(df: DataFrame, decode: DecodeBatch = defaultDecode,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"),
      sha2(col("content"), 256).as("sha256"),
      length(col("content")).cast("long").as("byte_len"))
      .as[(String, Array[Byte], String, Long)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val dims = decode(batch.map(_._2))
          batch.lazyZip(dims).map { case ((name, _, sha, len), (w, h)) =>
            MediaFeatures(name, len, sha, w, h)
          }
        }
      }
  }

  /** Frame sampling fan-out for "video" payloads: emit `nFrames`
    * evenly-spaced byte-range slices per file as (file_name, frame_idx,
    * frame_sha256). The slicing is real (substring over binary); a
    * codec would replace byte ranges with decoded frames, keeping the
    * same explode shape — one narrow generator, no shuffle. */
  def frameSample(df: DataFrame, nFrames: Int): DataFrame =
    df.select(col("file_name"), col("content"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("__step",
        greatest(floor(length(col("content")) / nFrames), lit(1))
          .cast("int"))
      .select(col("file_name"), col("frame_idx").cast("long").as("frame_idx"),
        sha2(expr("substring(content, frame_idx * __step + 1, __step)"),
          256).as("frame_sha256"))
}
