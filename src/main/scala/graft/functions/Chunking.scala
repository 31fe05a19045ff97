package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window shaping operators for LLM training data: fixed-size
  * token chunking (split long documents into window-sized pieces) and
  * deterministic greedy sequence packing (assign short documents to
  * capacity-bounded bins).
  *
  * Both are pure column/window expressions — chunking is row-local
  * (explodes executor-side, no shuffle), packing is one exchange on the
  * shard key. Both are deterministic under any partitioning: chunk
  * boundaries are arithmetic on token positions, bin ids are running
  * sums over a total order.
  */
object Chunking {

  /** Split each doc into consecutive `chunkTokens`-token chunks
    * (whitespace tokens, space-rejoined; the last chunk is short).
    * Output: (doc_id, chunk_idx, chunk_text, n_tokens).
    */
  def chunkDocs(docs: DataFrame, textCol: String, idCol: String, chunkTokens: Int): DataFrame = {
    require(chunkTokens >= 1)
    val ts = TextFunctions.tokens(col(textCol))
    val chunks = transform(
      sequence(lit(0), greatest(floor((size(ts) - 1) / chunkTokens), lit(0)).cast("int")),
      i =>
        struct(
          concat_ws(" ", slice(ts, i * chunkTokens + 1, lit(chunkTokens))).as("chunk_text"),
          least(size(ts) - i * chunkTokens, lit(chunkTokens)).cast("long").as("n_tokens")))
    docs
      .select(col(idCol).as("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.chunk_text").as("chunk_text"),
        col("c.n_tokens").as("n_tokens"))
  }

  /** Greedy streaming bin packing: within each shard, walk rows in
    * `idCol` order and assign `bin_idx = floor(cum_weight_before /
    * capacity)` — the standard one-pass packing approximation (bins may
    * overflow by at most one row's weight; no bin is left less than
    * full before the next opens). Sharding bounds the window sort and
    * is the scale lever: each shard packs independently, so the global
    * sort a naive packer needs never materializes.
    * Output: input columns + bin_idx.
    */
  def packGreedy(
      df: DataFrame,
      shardCol: String,
      idCol: String,
      weightCol: Column,
      capacity: Long): DataFrame = {
    require(capacity >= 1)
    val w = Window
      .partitionBy(col(shardCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(
      "bin_idx",
      floor(coalesce(sum(weightCol).over(w), lit(0L)).cast("double") / capacity).cast("long"))
  }
}
