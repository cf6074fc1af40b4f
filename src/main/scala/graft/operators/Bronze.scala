package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bronze-layer operator set: lineage-stamping ingest + ingest validation
  * (SURVEY.md §2.11 D1/D2).
  *
  * Reference semantics: /root/reference/bronze/bronze_rx_claims_load.py
  * (lineage stamps :45-49, validation :85-119). The reference stamps
  * `current_timestamp()` and `input_file_name()`; verified queries need
  * deterministic output, so both are injectable — callers pass literals for
  * oracle-checked paths and the wall-clock/file-name defaults for real
  * ingest. Reference bug B3 (partition by raw timestamp) is fixed by
  * deriving `ingestion_date` as the partition column.
  */
object Bronze {

  /** D1: append-only raw load decoration. All stamps are per-row constant
    * expressions — zero shuffle, fully codegen'd, survives any scale.
    */
  def stampLineage(df: DataFrame, sourceSystem: String, loadId: String,
      ingestionTs: Column = current_timestamp(),
      sourceFile: Column = input_file_name()): DataFrame =
    df.withColumn("ingestion_timestamp", ingestionTs)
      .withColumn("ingestion_date", to_date(col("ingestion_timestamp")))
      .withColumn("source_file", sourceFile)
      .withColumn("source_system", lit(sourceSystem))
      .withColumn("bronze_load_id", lit(loadId))

  /** D2: ingest validation stats (bronze:85-119) — all-key-null rows,
    * corrupt-record rows, total rows, distinct source files — computed in
    * ONE aggregation job via conditional counts instead of the reference's
    * four separate actions (4 scans → 1 scan).
    */
  def validationStats(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val allKeysNull = keyCols.map(col(_).isNull).reduce(_ && _)
    val corrupt: Column =
      if (df.columns.contains("_corrupt_record")) col("_corrupt_record").isNotNull
      else lit(false)
    df.agg(
      count(lit(1)).as("total_rows"),
      count(when(allKeysNull, 1)).as("null_key_rows"),
      count(when(corrupt, 1)).as("corrupt_rows"),
      countDistinct(col("source_file")).as("distinct_source_files"))
  }
}
