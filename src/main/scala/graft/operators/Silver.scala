package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Silver-layer operator set: cleanse / DQ rule engine / quarantine split /
  * business-key dedup / watermark incremental reads (SURVEY.md §2.11
  * D3–D8), re-expressed as pure `DataFrame => DataFrame` functions so every
  * operator is testable without I/O and oracle-verifiable.
  *
  * Reference semantics: /root/reference/silver/silver_rx_claims_load.py
  * (cleanse :137-157, DQ rules :65-135, quarantine :213-227, dedup
  * :159-179, watermark :29-63). Reference bug B1 (invalid `Column + list`
  * array append, silver:87,96,105,116,125) is implemented with the intended
  * semantics: accumulate reason strings, NULL array when no failures.
  *
  * Scale notes: every rule is a codegen'd built-in expression chain (no
  * UDFs) so the whole DQ gate stays inside one WholeStageCodegen span over
  * the scan; the quarantine split is two complementary pushed-down filters;
  * dedup is the only shuffle (hash by business key).
  */
object Silver {

  /** One declarative data-quality rule: `fails` is true when the row
    * violates the rule. Rules as data, per SURVEY.md §7.
    */
  final case class DqRule(name: String, fails: Column)

  /** The fixture-schema analog of the reference's 5 Silver DQ rules
    * (silver/silver_rx_claims_load.py:81-128) over claim lines = lineitem:
    * required keys non-null, service date not in the future (fixture
    * ship dates end 2001; the cutoff literal keeps the rule deterministic), service ≤ received analog (shipdate sanity), code-format
    * regex, positive amounts.
    */
  def lineitemRules: Seq[DqRule] = Seq(
    DqRule(
      "MISSING_REQUIRED_FIELDS",
      col("l_orderkey").isNull || col("l_linenumber").isNull ||
        col("l_partkey").isNull || col("l_suppkey").isNull),
    DqRule("FUTURE_SERVICE_DATE", col("l_shipdate") > lit("2005-01-01").cast("timestamp")),
    // dual code-format validation, negated-or — the reference accepts a
    // code matching the CPT pattern OR the HCPCS pattern and flags only
    // rows matching neither (silver:26-27,113-115): here the short flag
    // form OR the prefixed long form
    DqRule("INVALID_RETURN_FLAG",
      !(col("l_returnflag").rlike("^[ANR]$") ||
        col("l_returnflag").rlike("^RF-[ANR]$"))),
    // NULL values PASS the value rules by design, matching the
    // reference exactly: its Rule 5 is isNotNull-guarded with the
    // comment "Billed amount > 0 (or null for capitated rx_claims)"
    // (silver:119-125), i.e. a null amount is a legitimate business
    // state, not a quality failure — only the four REQUIRED keys in
    // MISSING_REQUIRED_FIELDS treat null as a defect. (In Spark a null
    // predicate makes when(fails, …) emit no reason, which is the same
    // isNotNull-guarded behavior without the explicit guard.)
    DqRule("NON_POSITIVE_AMOUNT", col("l_extendedprice") <= 0 || col("l_quantity") <= 0),
    DqRule("INVALID_DISCOUNT", col("l_discount") < 0 || col("l_discount") > 1),
  )

  /** DQ rule engine (D6): evaluates every rule, accumulates failure reasons
    * into `dq_failure_reasons` (NULL when clean, per the reference's
    * isNotNull-keyed PASS/FAIL flip at silver:130-134) and tags
    * `dq_status` PASS/FAIL. Also emits `dq_reasons_csv` (stable ';' join)
    * for oracle comparison, since the reason order is the declared rule
    * order — deterministic.
    */
  def applyDqRules(df: DataFrame, rules: Seq[DqRule] = lineitemRules): DataFrame = {
    val reasonSlots = rules.map(r => when(r.fails, lit(r.name)))
    val reasons = array_compact(array(reasonSlots: _*))
    df.withColumn("dq_failure_reasons", when(size(reasons) > 0, reasons))
      .withColumn("dq_reasons_csv", concat_ws(";", reasonSlots: _*))
      .withColumn(
        "dq_status",
        when(col("dq_failure_reasons").isNotNull, lit("FAIL")).otherwise(lit("PASS")))
  }

  /** Quarantine split (D7): complementary PASS/FAIL partition of one input
    * (silver:213-214). Both sides are pushed-down filters over the same
    * plan; callers persist upstream if they consume both.
    */
  def quarantineSplit(dqTagged: DataFrame): (DataFrame, DataFrame) =
    (dqTagged.filter(col("dq_status") === "PASS"),
      dqTagged.filter(col("dq_status") === "FAIL"))

  /** Cleanse/standardize (D5, silver:137-157): trim+upper string codes,
    * date-typed dates, DecimalType(18,2) money. Decimal money is also what
    * makes aggregate sums exactly reproducible across engines (order-
    * independent decimal addition), which the oracle gate relies on.
    */
  def cleanseLineitem(df: DataFrame): DataFrame =
    df.withColumn("l_returnflag", upper(trim(col("l_returnflag"))))
      .withColumn("l_linestatus", upper(trim(col("l_linestatus"))))
      .withColumn("ship_date", to_date(col("l_shipdate")))
      .withColumn("price_dec", col("l_extendedprice").cast(DecimalType(18, 2)))

  /** Business-key dedup (D8/W1, silver:159-179): keep exactly one row per
    * key, latest by the `latest` ordering columns. One hash shuffle on the
    * key; at 100 TB this is the same partitioning the downstream merge
    * keys on, so the exchange is reusable.
    *
    * REQUIREMENT: `latest` must totally order each key's rows (the
    * PrefixSum discipline) — on a tie, row_number keeps whichever row
    * the shuffle delivered first, so the survivor would vary across
    * runs/parallelism and an oracle compare would flake. Callers
    * either end the order in a per-key-unique column (line number) or
    * stack enough value columns that duplicate rows tie only when they
    * are identical — in which case any survivor is the same row.
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], latest: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(latest: _*)
    df.withColumn("row_num", row_number().over(w))
      .filter(col("row_num") === 1)
      .drop("row_num")
  }

  /** Watermark incremental read (D3, silver:29-43,189-204): keep rows whose
    * event column is above the stored high-water mark. The watermark is a
    * one-row aggregate broadcast against the fact scan — no driver-side
    * collect, and the comparison predicate still pushes down to the scan
    * when the mark is a literal.
    */
  def incrementalAfter(df: DataFrame, watermarks: DataFrame, tableName: String,
      eventCol: String): DataFrame = {
    val mark = watermarks
      .filter(col("table_name") === tableName)
      .agg(max(col("last_processed_timestamp")).as("wm"))
    df.crossJoin(broadcast(mark))
      .filter(col("wm").isNull || col(eventCol) > col("wm"))
      .drop("wm")
  }

  /** Literal-mark variant of [[incrementalAfter]] — the default for batch
    * incremental reads. Collects the single high-water mark to the driver
    * (ONE row, scale-free by construction) and filters with a literal, so
    * the predicate lands in the parquet scan's `PushedFilters` and prunes
    * row groups / partitions. The broadcast-join variant above never
    * pushes down: a 100 TB Bronze scan would read everything just to
    * discard it post-join. Keep the join variant only where an action is
    * unacceptable (e.g. composing one fully-lazy plan).
    */
  def incrementalAfterLiteral(df: DataFrame, watermarks: DataFrame,
      tableName: String, eventCol: String): DataFrame = {
    val mark = watermarks
      .filter(col("table_name") === tableName)
      .agg(max(col("last_processed_timestamp")))
      .collect()(0)
    if (mark.isNullAt(0)) df
    else df.filter(col(eventCol) > lit(mark.get(0)))
  }

  /** Watermark commit row (D4, silver:45-63): new high-water mark derived
    * from the processed batch itself (max event time), append-ready.
    */
  def watermarkCommit(processed: DataFrame, tableName: String, eventCol: String): DataFrame =
    processed.agg(max(col(eventCol)).as("last_processed_timestamp"))
      .select(lit(tableName).as("table_name"), col("last_processed_timestamp"))
}
