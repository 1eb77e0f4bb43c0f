package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data-layout clustering: interleave the bits of
  * two quantized dimensions so that sorting by the resulting z-value
  * co-locates rows that are close in BOTH dimensions. Files written in
  * z-order carry narrow per-file min/max ranges on BOTH columns, so
  * engine-side data skipping (parquet row-group stats, the same stats
  * DuckDB/Trino/Delta OPTIMIZE ZORDER exploit) prunes multi-dimensional
  * predicates — the 100 TB story: a (customer, date-range) query touches
  * a tiny file subset instead of every file that a single-column sort
  * layout would leave unpruned on the second dimension.
  *
  * Everything here is built-in codegen'd expressions (shifts, masks,
  * bit-or) — the z-value computation runs inside whole-stage codegen in
  * the scan projection; no UDF, no custom expression needed.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of `x` (even positions) and
    * `y` (odd positions). Inputs must be non-negative and < 2^bits. */
  def interleaveBits(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i).bitwiseOR(
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Quantize `c` into [0, buckets) by linear min/max scaling.
    * `floor((c - lo) * buckets / (hi - lo + 1))` in exact double
    * arithmetic (values far below 2^53), identical in any engine; the
    * +1 keeps the max value inside the top bucket without a clamp. */
  def quantize(c: Column, lo: Column, hi: Column, buckets: Int): Column =
    floor((c - lo) * lit(buckets) / (hi - lo + lit(1))).cast("long")

  /** Rewrite `df` into `nFiles` z-ordered parquet files: range-partition
    * on the z-value (so files tile the curve in disjoint z-ranges), sort
    * within each partition, drop the helper column. One shuffle — the
    * same cost as any global sort layout, but clustering two dimensions
    * at once. */
  def clusteredWrite(df: DataFrame, zval: Column, nFiles: Int, path: String): Unit =
    df.withColumn("_z", zval)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
