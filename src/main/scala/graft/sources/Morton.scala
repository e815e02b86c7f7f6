package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values — the multi-dimensional clustering
  * key behind 2-dim+ zone-map skipping (the layout trick MergeTree's
  * `ORDER BY (a, b)` only approximates for the leading column, and
  * Delta/Iceberg expose as `ZORDER BY` / sort-order transforms).
  *
  * A table laid out by `ORDER BY ts` answers time-range queries with
  * few files but user-range queries with ALL files; interleaving the
  * bits of both dimensions places rows so that a range predicate on
  * EITHER column touches O(sqrt(files)) — the standard space-filling-
  * curve argument. Composes directly with [[ZoneMap]]: write
  * range-partitioned by the z-value, build per-file min/max manifests
  * on the ORIGINAL columns, intersect the surviving file lists.
  *
  * The bit-interleave is the classical magic-mask spread — five
  * shift/mask ops per dimension, all codegen'd built-in column
  * functions (no UDF, no custom expression needed), and the identical
  * integer expressions run in any SQL engine, which is how the oracle
  * re-derives every z-value exactly.
  *
  * Inputs are quantized to 16 bits by the caller (for real tables:
  * rank/range quantiles per column, or a hash for high-cardinality
  * ids — only RELATIVE locality matters for skipping, not the exact
  * codes).
  */
object Morton {

  /** Spread the low 16 bits of `x` to even bit positions (0,2,..,30). */
  def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions (x in even bits, y in
    * odd). Callers mask/quantize the inputs to 16 bits first.
    */
  def interleave16(x: Column, y: Column): Column =
    spread16(x.cast("long").bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread16(y.cast("long").bitwiseAND(lit(0xFFFFL))), 1))
      .as("z")

  /** The identical spread as SQL text — the oracle-side recompute
    * (DuckDB and Spark agree bit-for-bit on BIGINT shift/and/or).
    */
  def spread16Sql(x: String): String = {
    val a = s"(($x | ($x << 8)) & 16711935)"
    val b = s"(($a | ($a << 4)) & 252645135)"
    val c = s"(($b | ($b << 2)) & 858993459)"
    s"(($c | ($c << 1)) & 1431655765)"
  }

  def interleave16Sql(x: String, y: String): String =
    s"(${spread16Sql(s"($x & 65535)")} | (${spread16Sql(s"($y & 65535)")} << 1))"
}
