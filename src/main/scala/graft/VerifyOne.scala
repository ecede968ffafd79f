package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump ONE named registry query's result to parquet —
  * the single-query slice of [[Verify]], for iterating on an oracle
  * gate without paying the full 100+-query dump.
  *
  * Usage: runMain graft.VerifyOne SF_DIR OUT_DIR name1[,name2,...]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: VerifyOne SF_DIR OUT_DIR names")
    val Array(sfDir, outDir, nameCsv) = args
    val names = nameCsv.split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    // Subset oracle dump so tools/check_oracle.py can gate a
    // single-query run exactly like the driver's full pass.
    val sub = SparkEntry.oracleSql.filter(e => names.contains(e._1))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "oracle_sql.json"),
      sub.map { case (k, v) =>
        val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n")
        s""""$k": "$esc""""
      }.mkString("{", ",\n", "}")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
