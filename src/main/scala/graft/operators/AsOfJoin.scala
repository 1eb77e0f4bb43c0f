package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 gap row: range/as-of extensions): for each
  * left row, attach the right row with the greatest timestamp <= the left
  * timestamp within the same key (left-outer semantics).
  *
  * Implementation is the union+carry-forward composition — preference
  * order (a) from the build brief: compose existing ops before custom
  * plans. Both sides are tagged and unioned, then one window pass per key
  * carries the latest right payload forward in (ts, tag) order. Cost is a
  * single shuffle + sort on the key — linear, no row multiplication —
  * unlike the naive non-equi join + row_number rewrite whose fan-out is
  * unbounded. This is the plan that survives 100 TB: the shuffle is the
  * same one a plain keyed join would pay.
  *
  * Right-side ties on (key, ts) are resolved before the union with an
  * explicit tiebreak column so results are deterministic (and match the
  * DuckDB ASOF oracle, which is otherwise free to pick any tied row).
  */
object AsOfJoin {

  /** @param tiebreak right-side column; among right rows sharing
    *                 (key, ts) the one with the greatest tiebreak wins. */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      tiebreak: String): DataFrame = {

    // deterministic dedup even when the tiebreak itself ties: the
    // remaining right columns (sorted by name) extend the order, so the
    // surviving payload is a pure function of the data, never of the
    // input partitioning or a task retry
    // (non-orderable columns — MapType — are skipped: they cannot
    // appear in an ORDER BY; ties then break on the orderable remainder)
    val extraTb = Orderable.columns(right, right.columns.toSeq
        .filter(c => c != rightKey && c != rightTs && c != tiebreak))
      .sorted.map(col(_).desc)
    val dedupW = Window.partitionBy(col(rightKey), col(rightTs))
      .orderBy(col(tiebreak).desc +: extraTb.toIndexedSeq: _*)
    val r = right
      // a NULL right timestamp can never satisfy "at or before" — but
      // nulls sort FIRST ascending, so an unfiltered null-ts row would
      // lead its key's partition and be carried forward as a phantom
      // match for every left row before the first real right row.
      // A NULL right KEY matches nothing under SQL/DuckDB ASOF
      // semantics, but Window.partitionBy groups null keys TOGETHER —
      // unfiltered, a null-key left row would phantom-match null-key
      // right rows (the left side needs no filter: with null-key right
      // rows gone, its null partition holds only left rows and the
      // carry-forward correctly yields unmatched left-outer nulls)
      .filter(col(rightTs).isNotNull && col(rightKey).isNotNull)
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1)
      .drop("__rn")

    val rightPayload = struct(r.columns.toIndexedSeq.map(col): _*)
    val rTagged = r.select(
      col(rightKey).as("__key"), col(rightTs).as("__ts"),
      lit(0).as("__tag"), rightPayload.as("__r"))

    val leftPayload = struct(left.columns.toIndexedSeq.map(col): _*)
    val lTagged = left.select(
      col(leftKey).as("__key"), col(leftTs).as("__ts"),
      lit(1).as("__tag"), lit(null).cast(rTagged.schema("__r").dataType).as("__r"),
      leftPayload.as("__l"))

    val unioned = rTagged.withColumn("__l",
      lit(null).cast(lTagged.schema("__l").dataType))
      .unionByName(lTagged)

    // Right rows (tag 0) sort before left rows (tag 1) at equal ts, so an
    // exactly-equal timestamp matches ("at or before").
    val carryW = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__match",
      last(col("__r"), ignoreNulls = true).over(carryW))

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = r.columns.map(c => col(s"__match.$c").as(s"r_$c"))
    carried.filter(col("__tag") === 1).select((leftCols ++ rightCols).toIndexedSeq: _*)
  }
}
