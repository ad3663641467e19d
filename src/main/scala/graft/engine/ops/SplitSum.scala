package graft.engine.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact wide-integer SUM for BIGINT measures, computed as three
  * overflow-free BIGINT sums and recombined into the same
  * DECIMAL(38,0) value `sum(v.cast(decimal(38,0)))` produces — while
  * keeping the per-row accumulate in pure long arithmetic inside
  * whole-stage codegen (guide §4: no Decimal128 in the hot loop).
  *
  * Identity (ALL longs — two's complement: arithmetic `>>` is floor
  * division, and the masked parts are the exact low bit-fields):
  *   Σv = 2⁴²·Σ(v >> 42) + 2²¹·Σ((v >> 21) & (2²¹−1)) + Σ(v & (2²¹−1))
  * Each partial sum stays within BIGINT as long as
  *   n · 2²¹ < 2⁶³             (low/mid parts)  → n ≤ 4.4·10¹²  rows
  *   n · (|v|max / 2⁴²) < 2⁶³  (high part)      → inert for the cents
  *                                               domain (|v| ≤ ~10¹⁴
  *                                               ⇒ |high digit| ≤ 28)
  * so the spelling is exact beyond 10¹² rows — a 100 TB lineitem is
  * ~10¹¹–10¹² — with the mechanical 4-way extension (shift 63/42/21)
  * available if a corpus ever outgrows it. The recombination runs
  * ONCE PER GROUP in DECIMAL(38,0), so the result column is
  * value-identical (same type, same exact integer) to the direct
  * decimal sum: everything downstream — exact decimal divisions,
  * double conversions, oracle hashes — is unchanged by construction.
  * SplitSumSpec fuzzes the identity against `sum(cast(decimal))`
  * across the full signed domain.
  *
  * Measured (r19, sf0.1, agg_corr's five sums): decimal-sum
  * accumulators 1.0–1.2 s/pass vs 0.44–0.48 s/pass for the same query
  * with plain long sums — the Decimal128 add + overflow check per row
  * IS the cost, and this helper removes it without giving up
  * exactness. */
object SplitSum {
  private val d38 = DecimalType(38, 0)
  private val Mask = (1L << 21) - 1

  /** `sum(v.cast(decimal(38,0)))` for a BIGINT column, spelled as
    * three codegen-friendly long sums. Null rows contribute nothing
    * (sum skips nulls in all three parts identically); an all-null or
    * empty group yields NULL, matching the decimal sum. */
  def splitSum(v: Column): Column =
    sum(shiftright(v, 42)).cast(d38) * lit(1L << 42) +
      sum(shiftright(v, 21).bitwiseAND(lit(Mask))).cast(d38) * lit(1L << 21) +
      sum(v.bitwiseAND(lit(Mask))).cast(d38)
}
