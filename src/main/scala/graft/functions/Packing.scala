package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** Sequence packing for pretraining-data preparation: documents are
  * concatenated in a stable order into one token stream, then the stream
  * is cut into fixed-capacity windows (the standard concat-and-chunk
  * packing). Each document is assigned the window containing its first
  * token plus its offset within that window — exactly the bookkeeping a
  * downstream tokenizer/sharder needs to materialize packed examples.
  *
  * The global running token count is a [[PrefixSum]] — bucketed two-phase,
  * not a single-partition window — so packing a 100 TB corpus stays as
  * parallel as its scan.
  */
object Packing {

  /** Assign each document a `pack_id` / `pack_offset` under capacity-
    * `capacity` windows over the token stream ordered by `idCol` (must be
    * a total order). `tokenCount` is any NON-NULL, NON-NEGATIVE integer
    * expression (e.g. whitespace or BPE-proxy token counts from
    * [[TextAnalysis]]); a NULL count fails LOUDLY in the prefix pass
    * (PrefixSum counts nulls inside its bounded bucket aggregate —
    * before that check the failure depended on bucketing: an
    * exception when a bucket held only nulls, a silent zero-width
    * pack otherwise), while a negative count walks offsets backwards
    * silently and stays caller-checked (count expressions derived
    * from size()/length() are non-negative by construction).
    */
  def packSequences(docs: DataFrame, idCol: Column, tokenCount: Column,
      capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val withN = docs.select(idCol.as("doc_id"), tokenCount.cast("bigint").as("n_tokens"))
    PrefixSum.exclusiveRunningTotal(withN, Seq(col("doc_id")), col("n_tokens"),
        "start_offset")
      .withColumn("pack_id", expr(s"CAST(start_offset div $capacity AS BIGINT)"))
      .withColumn("pack_offset", col("start_offset") % capacity)
  }
}
