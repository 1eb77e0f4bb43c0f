package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.RowOrdering

/** Deterministic-tiebreak helpers (r14) put every remaining payload
  * column into an ordering expression (CdcMerge's max_by struct,
  * Reconcile.lastWriterWins and AsOfJoin's dedup-window extensions). A
  * non-orderable payload column — MapType, or any type containing one —
  * would fail analysis with "cannot be used in ordering expression" for
  * inputs that worked pre-r14. The tiebreak is best-effort by contract
  * ("as deterministic as the data allows"): silently excluding the
  * columns Spark cannot order preserves the old inputs while keeping the
  * determinism win on every orderable column.
  */
object Orderable {

  /** The subset of `cols` whose types Spark can use in ordering/grouping
    * expressions (everything except MapType and containers thereof). */
  def columns(df: DataFrame, cols: Seq[String]): Seq[String] = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.filter(c => types.get(c).forall(RowOrdering.isOrderable))
  }
}
