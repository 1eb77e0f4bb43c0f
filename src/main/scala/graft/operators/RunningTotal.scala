package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Globally-ordered running sum WITHOUT a single-partition window.
  *
  * `SUM(v) OVER (ORDER BY k)` with no PARTITION BY moves the whole
  * dataset to one task (Spark warns exactly this) — a non-starter at
  * 100 TB. The classic fix is the two-pass distributed prefix sum:
  *
  *  1. range-partition on the order keys (partition i's keys all sort
  *     before partition i+1's), local running sums per partition in
  *     parallel via a window PARTITIONED BY the physical partition id;
  *  2. per-partition totals (one row per partition, ≤ a few hundred
  *     rows at any scale) get their exclusive prefix offsets in a
  *     bounded single-partition window, and broadcast-join back.
  *
  * The input is persisted before the totals pass: range partitioning
  * samples its boundaries, so the offsets computed in pass 2 must see
  * the SAME physical partitioning pass 1 produced — persistence pins
  * it (recomputation could re-sample different boundaries and pair
  * offsets with the wrong partitions).
  */
object RunningTotal {

  /** Adds `outCol` = running sum of `value` over the global `order`
    * (inclusive of the current row). `order` must be a total order
    * (include a tiebreak key) for the result to be well-defined.
    * `numPartitions` ≤ 0 (the default) derives the range-partition
    * count from `spark.sql.shuffle.partitions` — a cluster that sized
    * its shuffles sized this prefix sum too; a hard-coded literal
    * would silently rank 100 TB through a dev-scale partition count. */
  def withRunningSum(df: DataFrame, order: Seq[Column], value: Column,
                     outCol: String, numPartitions: Int = 0): DataFrame = {
    val reserved = Seq("_rt_v", "_rt_pid", "_rt_off", "_rt_t")
    require(!df.columns.exists(reserved.contains),
      s"input must not contain the helper columns ${reserved.mkString(", ")}")
    // (r15 review) an outCol named like a helper would be silently
    // dropped by the final drop(...) — no result column, no error
    require(!reserved.contains(outCol),
      s"outCol must not be one of the helper columns ${reserved.mkString(", ")}")
    // the accumulator is exact LONG arithmetic (order-independent across
    // partitions); a fractional value would be silently truncated by the
    // cast below — reject it and let the caller quantize explicitly
    // (the repo convention: round(x * 1e6).cast("long") micro-units)
    val vType = df.select(value.as("_rt_v")).schema.head.dataType
    // match on the DataType, not simpleString: Spark renders ByteType as
    // "tinyint" and ShortType as "smallint", so a name list with "byte"/
    // "short" falsely rejected valid narrow integrals (ADVICE r13)
    val integral = vType match {
      case org.apache.spark.sql.types.ByteType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(integral,
      s"withRunningSum needs an integral value column, got ${vType.simpleString}: " +
        "quantize first (e.g. round(x * 1e6).cast(\"long\"))")
    val nParts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // no sortWithinPartitions here (r15 review): _rt_pid assignment and
    // the offsets groupBy are order-independent, and the local window
    // below re-sorts by `order` within each pid after its own
    // hash(_rt_pid) exchange anyway — a pre-sort at cache-build time was
    // a full corpus sort whose ordering the exchange then destroyed
    val parted = df
      .withColumn("_rt_v", value.cast("long"))
      .repartitionByRange(nParts, order: _*)
      .withColumn("_rt_pid", spark_partition_id())
      .persist()
    // the pin is consumed by the RETURNED lazy plan (offsets pass +
    // final join), so it cannot unpersist here; PinRegistry keys on the
    // canonicalized plan, so repeated identical invocations share ONE
    // cache entry (held until evict/application end) instead of each
    // leaking a corpus-scale cache for the session lifetime
    PinRegistry.replace("operators.runningTotal", Seq(parted))
    val local = Window.partitionBy(col("_rt_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ≤ numPartitions rows: the single-partition offset window is
    // bounded by the partition count, not the data.
    val offsets = parted.groupBy(col("_rt_pid")).agg(sum(col("_rt_v")).as("_rt_t"))
      .withColumn("_rt_off",
        coalesce(sum(col("_rt_t")).over(Window.orderBy(col("_rt_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_rt_pid"), col("_rt_off"))
    parted
      .join(broadcast(offsets), "_rt_pid")
      .withColumn(outCol, col("_rt_off") + sum(col("_rt_v")).over(local))
      .drop("_rt_v", "_rt_pid", "_rt_off")
  }
}
