package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) operator: the rows not dominated by any
  * other row, all objectives minimized (negate a column to maximize).
  * Classic multi-criteria OLAP operator (Börzsönyi et al., ICDE 2001 —
  * "The Skyline Operator") that Spark has no built-in for; the reference
  * pipeline has no counterpart either, so this extends the curation
  * surface (pick the "best tradeoff" documents/configs at corpus scale).
  *
  * Scale design: skyline is DISTRIBUTIVE — `skyline(A ∪ B) =
  * skyline(skyline(A) ∪ skyline(B))` — so it computes like an algebraic
  * aggregate: a per-partition local prune runs scan-side over the 100 TB
  * input (no shuffle), and only the tiny local frontiers (typically
  * O(log^{d-1} n) points for d objectives under independence) move to the
  * single merge task. The merge input is bounded by
  * (#partitions × local-frontier size), not by the data.
  *
  * Per-group skyline instead hash-partitions on the group key (one
  * shuffle of the slim projected columns) and prunes each group wholly
  * inside its partition — exact in one pass, parallel across groups.
  *
  * mapPartitions (not a Catalyst expression) is the honest tool here:
  * dominance pruning keeps a mutable candidate buffer across rows, which
  * no per-row expression or built-in aggregate expresses; the buffer is
  * the frontier itself, so memory stays bounded by the output.
  */
object Skyline {

  /** True iff `q` dominates `p`: q ≤ p on every objective, < on at least
    * one. Equal points never dominate each other (both survive — the
    * same tie rule as the NOT EXISTS SQL formulation). */
  private[graft] def dominates(q: Array[Double], p: Array[Double]): Boolean = {
    var strict = false
    var i = 0
    while (i < q.length) {
      if (q(i) > p(i)) return false
      if (q(i) < p(i)) strict = true
      i += 1
    }
    strict
  }

  /** One-pass dominance prune of an iterator, maintaining per-group
    * frontier buffers. `objAt` extracts the objective vector, `keyAt`
    * the group key ("" for the global skyline). Memory = the frontiers. */
  private def prune(it: Iterator[Row], objIdx: Int, keyIdx: Int): Iterator[Row] = {
    val groups = mutable.LinkedHashMap.empty[Any, mutable.ArrayBuffer[(Row, Array[Double])]]
    it.foreach { r =>
      val obj = r.getSeq[Double](objIdx).toArray
      val key = if (keyIdx < 0) "" else r.get(keyIdx)
      val buf = groups.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
      if (!buf.exists { case (_, q) => dominates(q, obj) }) {
        val kept = buf.filterNot { case (_, p) => dominates(obj, p) }
        kept += ((r, obj))
        groups(key) = kept
      }
    }
    groups.valuesIterator.flatMap(_.iterator.map(_._1))
  }

  /** Global skyline: two-phase distributive plan (local prune → merge of
    * the tiny frontiers on one task). Output column set = input's. */
  def frontier(df: DataFrame, objectives: Seq[Column]): DataFrame = {
    val tagged = df.withColumn("_obj", array(objectives.map(_.cast("double")): _*))
    val enc = Encoders.row(tagged.schema)
    val objIdx = tagged.schema.fieldIndex("_obj")
    val local = tagged.mapPartitions(it => prune(it, objIdx, -1))(enc)
    local.coalesce(1).mapPartitions(it => prune(it, objIdx, -1))(enc)
      .drop("_obj")
  }

  /** Per-group skyline: one hash shuffle on the group key, then an exact
    * single-pass prune (each group lives wholly in one partition). */
  def frontierPerGroup(df: DataFrame, groupCol: String, objectives: Seq[Column]): DataFrame = {
    val tagged = df.withColumn("_obj", array(objectives.map(_.cast("double")): _*))
    val enc = Encoders.row(tagged.schema)
    val objIdx = tagged.schema.fieldIndex("_obj")
    val keyIdx = tagged.schema.fieldIndex(groupCol)
    tagged.repartition(col(groupCol))
      .mapPartitions(it => prune(it, objIdx, keyIdx))(enc)
      .drop("_obj")
  }
}
