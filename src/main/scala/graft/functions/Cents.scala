package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round

/** The engine's ONE exact-cents contract: a 2-decimal money amount
  * stored as DOUBLE becomes BIGINT cents via `round(x·100)` — exact
  * for any 2-dp value below 2⁵²/100, and identical to the DuckDB
  * oracles' `CAST(x AS DECIMAL(18,2)) * 100` (both engines round
  * half-away-from-zero on the SAME double, so even a true binary
  * midpoint lands on the same integer). The round form stays inside
  * whole-stage codegen as primitive double arithmetic where the
  * decimal cast + decimal multiply fell to per-row allocation —
  * probed ~5× the scan CPU for identical values (BASELINE.md r13).
  *
  * Overflow: a BIGINT sum of cents wraps above ~9.2e16 dollars; group
  * sums (per day / brand / priority) are orders of magnitude below
  * that at any realistic scale, but a WHOLE-CORPUS revenue total at
  * 10¹²-row scale is not — cast to DECIMAL(38,0) before corpus-wide
  * sums (the q180 pattern), never after.
  */
object Cents {
  /** BIGINT cents of a 2-dp double money column. */
  def cents(c: Column): Column = round(c * 100).cast("long")
}
