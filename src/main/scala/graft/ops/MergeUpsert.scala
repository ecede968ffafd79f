package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Keyed MERGE (upsert) into a partitioned parquet table with
  * partition-pruned copy-on-write.
  *
  * The reference's warehouses expose this as `MERGE INTO ... WHEN
  * MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT` (the pattern
  * behind its DELETE+INSERT rerun, /root/reference/dags/sql/
  * write_weather_to_bigquery.sql:51-98 — O10 is the whole-partition
  * special case). Plain parquet has no row-level update, so the
  * Spark-native form is copy-on-write at partition granularity:
  *
  *   1. the delta's distinct partition values are collected
  *      (bounded: one row per TOUCHED partition, never data rows);
  *   2. only those partitions of the target are read — the IN filter
  *      lands on the partition column, so Catalyst prunes the scan to
  *      the touched directories (PartitionFilters in the plan; at
  *      100 TB this is the difference between reading the delta's
  *      neighborhood and reading the table);
  *   3. target rows whose key collides with a delta key are dropped
  *      (left_anti on the key — a shuffle of TOUCHED partitions only),
  *      the delta is unioned in (update ≡ replace, insert ≡ new key);
  *   4. the merged slice is written back with dynamic partition
  *      overwrite (O10's machinery) — untouched partitions' files are
  *      never opened, read, or rewritten (byte-identical law in
  *      MergeUpsertSpec).
  *
  * Contract: the partition value of a key is STABLE — a delta row
  * carries the same partition value as the target row it replaces
  * (enforced cheaply by matching on key AND partition column, which
  * also keeps the anti-join co-partitioned with the overwrite). A key
  * that genuinely moves partitions needs a DELETE in its old
  * partition, which row-level-delete formats (Delta/Iceberg) solve
  * with tombstones; out of scope for plain parquet.
  */
object MergeUpsert {

  /** Merge `delta` into the partitioned parquet table at `path`.
    * `keyCols` identifies a row within its partition; `partitionCol`
    * is the directory-partition column (part of the match key, see
    * contract above). Returns the touched partition values.
    */
  def merge(delta: DataFrame, path: String, keyCols: Seq[String],
      partitionCol: String): Seq[Any] = {
    val spark = delta.sparkSession
    // Bounded collect: one value per touched partition.
    val touched = delta.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    val raw = spark.read.parquet(path)
    // Fail fast on column drift: projecting the target down to
    // delta.columns would silently drop target-only columns from the
    // rewritten partitions while untouched partitions keep them,
    // leaving the table schema-inconsistent across partitions.
    require(raw.columns.toSet == delta.columns.toSet,
      s"merge: delta columns ${delta.columns.sorted.mkString(",")} " +
        s"must equal target columns ${raw.columns.sorted.mkString(",")}")
    val target = raw
      .filter(col(partitionCol).isin(touched: _*))
      // partition dirs come back as the narrowest parsed type; align
      // to the delta's schema so the anti-join and union line up.
      .select(delta.columns.map(c => col(c).cast(
        delta.schema(c).dataType).as(c)): _*)
    val matchKeys = keyCols :+ partitionCol
    val kept = target.join(delta.select(matchKeys.map(col): _*),
      matchKeys, "left_anti")
    val merged = delta.unionByName(kept)
    IdempotentWriter.replacePartitions(
      merged.repartition(col(partitionCol)), path, Seq(partitionCol))
    touched
  }

  /** Targeted row deletion (takedown / right-to-be-forgotten): remove
    * every target row whose (keyCols, partitionCol) matches a row of
    * `deleteKeys`, rewriting ONLY the partitions that contain a
    * listed key — the delete-mode twin of [[merge]], and the same
    * copy-on-write scale story: at 100 TB a takedown batch touches
    * the listed keys' directories, never the table.
    *
    *   1. the distinct partition values of `deleteKeys` are collected
    *      (bounded: one row per touched partition);
    *   2. only those partitions are read (partition-pruned scan);
    *   3. surviving rows = left_anti join on (keyCols, partitionCol)
    *      — anti-join semantics, gated in SQL by o16;
    *   4. survivors replace their partitions via dynamic overwrite
    *      (untouched partitions byte-identical, law in spec); a
    *      partition whose rows were ALL deleted is removed
    *      explicitly, because dynamic overwrite only replaces
    *      partitions present in the written data and would otherwise
    *      leave the stale directory behind.
    *
    * Replay-idempotent: re-deleting the same keys anti-joins to the
    * same survivors (law in spec). Same stable-partition contract as
    * [[merge]]: a delete request carries the partition value its key
    * lives in. Returns the touched partition values. */
  def delete(deleteKeys: DataFrame, path: String, keyCols: Seq[String],
      partitionCol: String): Seq[Any] = {
    val spark = deleteKeys.sparkSession
    // Bounded collect: one value per touched partition.
    val touched = deleteKeys.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return Seq.empty
    val target = spark.read.parquet(path)
      .filter(col(partitionCol).isin(touched: _*))
    val matchKeys = keyCols :+ partitionCol
    // align request types to the target's (partition dirs come back
    // as the narrowest parsed type)
    val dk = deleteKeys.select(matchKeys.map(c =>
      col(c).cast(target.schema(c).dataType).as(c)): _*)
    val kept = target.join(dk, matchKeys, "left_anti")
    // fully-emptied partitions, decided BEFORE the rewrite (one agg
    // over the touched slice — bounded by touched-partition count)
    val nonEmpty = kept.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSet
    IdempotentWriter.replacePartitions(
      kept.repartition(col(partitionCol)), path, Seq(partitionCol))
    val emptied = touched.filterNot(nonEmpty)
    if (emptied.nonEmpty) {
      val base = new org.apache.hadoop.fs.Path(path)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // simple scalar partition values only (the fixture contract);
      // values needing Hive escaping would need escapePathName here
      emptied.foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(base,
          s"$partitionCol=$v"), true): Unit
      }
    }
    touched
  }

  /** Initial load: write `df` as the partitioned target. */
  def init(df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(col(partitionCol)).write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(path)
}
