package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chat-conversation JSONL ingest — the post-training data front
  * door (SFT/DPO corpora ship as JSON lines of
  * `{"conversation_id": …, "messages": [{"role", "content"}, …]}`,
  * the OpenAI-messages shape). The bronze→silver contract matches
  * [[CsvIngest]]: declared schema, malformed lines land as DATA
  * (raw line kept, `quarantined` flag) rather than failing the load
  * — at 100 TB a crawl of chat exports always contains truncated or
  * hand-mangled lines, and a quarantine row is auditable where a
  * dropped one is not.
  *
  * Plan shape: `from_json` + `posexplode` — one codegen'd map-side
  * projection per line, no shuffle; turn order is the array order
  * (0-based `turn_idx`), which downstream offset math
  * ([[graft.ops.Sessionize.chatTurnOffsets]]) consumes directly. */
object ChatIngest {

  val chatSchema: StructType = StructType(Seq(
    StructField("conversation_id", LongType),
    StructField("messages", ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType)))))))

  /** Parse a frame of JSONL chat lines (`lineCol`): good lines fan
    * out to one row per turn; unparseable lines (or lines missing
    * the conversation id) emit exactly one quarantine row carrying
    * the raw line. Output: (conversation_id, turn_idx, role,
    * content, raw_line, quarantined). */
  def parseChatLines(df: DataFrame, lineCol: String): DataFrame = {
    val parsed = df.withColumn("__p",
      from_json(col(lineCol), chatSchema))
    val ok = col("__p").isNotNull &&
      col("__p.conversation_id").isNotNull &&
      col("__p.messages").isNotNull
    val good = parsed.filter(ok)
      .select(col("__p.conversation_id").as("conversation_id"),
        posexplode(col("__p.messages")).as(Seq("turn_idx", "__m")))
      .select(col("conversation_id"),
        col("turn_idx").cast("long").as("turn_idx"),
        col("__m.role").as("role"),
        col("__m.content").as("content"),
        lit(null).cast("string").as("raw_line"),
        lit(false).as("quarantined"))
    val bad = parsed.filter(!ok)
      .select(lit(null).cast("long").as("conversation_id"),
        lit(null).cast("long").as("turn_idx"),
        lit(null).cast("string").as("role"),
        lit(null).cast("string").as("content"),
        col(lineCol).as("raw_line"),
        lit(true).as("quarantined"))
    good.unionByName(bad)
  }
}
