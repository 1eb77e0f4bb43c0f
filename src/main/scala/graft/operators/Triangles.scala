package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with degree-ordered orientation
  * (the node-iterator++ / Suri & Vassilvitskii MapReduce shape) and
  * per-node local clustering coefficients.
  *
  * Triangles in the near-dup graph measure how CLIQUE-LIKE a
  * document's duplication neighborhood is: a high local clustering
  * coefficient says its near-dups are also near-dups of each other
  * (one template family), while low clustering flags chain-shaped
  * similarity (drifting revisions) — different curation actions.
  *
  * The scale problem is wedge explosion: enumerating both wedges at a
  * degree-d hub costs d². The standard fix, implemented here: orient
  * every edge from the (degree, id)-SMALLER endpoint to the larger,
  * and generate wedges only at each edge's smaller endpoint — every
  * oriented out-degree is O(√m), so wedge volume drops from Σd² to
  * O(m^1.5) worst-case, the proven bound. Three hash joins total
  * (degree attach ×2, wedge close ×1), all keyed on node ids; no
  * payload ever moves.
  */
object Triangles {

  /** Per-node triangle participation over an undirected simple graph
    * given as distinct (a < b) pairs. Output: (node, deg, n_triangles,
    * lcc_micro) where lcc_micro = floor(2T/(deg·(deg−1)) · 10^6) —
    * integer arithmetic, engine-reproducible. Isolated-in-pairs nodes
    * don't exist by construction (every node has deg ≥ 1). */
  def perNode(pairs: DataFrame, aCol: String = "id_a",
              bCol: String = "id_b"): DataFrame = {
    val (result, pins) = perNodePlan(pairs, aCol, bCol)
    // Returning the lazy plan would pin deg/oriented for the session
    // lifetime (no point before execution at which to unpersist them,
    // and repeated Bench/Verify invocations would accumulate leaked
    // cache entries). Materialize eagerly instead — the result is
    // node-count-sized, orders smaller than the edge-derived
    // intermediates it lets go of — then drop both pins before
    // returning. blocking = false: the next query need not wait on
    // block removal. Plan-shape audits pin [[perNodePlan]], the lazy
    // builder plan this materializes.
    val (out, handles) = LocalCheckpoints.tracked(result)
    pins.foreach(_.unpersist(false))
    // Replace-on-reinvoke (ADVICE r11, hardened r13): the result
    // checkpoint itself would otherwise accumulate one node-sized pin
    // per invocation across a long session (Bench runs each query
    // runs+1 times, Verify re-invokes per engine). Keyed by (session,
    // canonicalized input plan), the map keeps the TWO most recent
    // results per key and frees only the grand-predecessor — so a
    // returned frame stays valid until two successors land. That makes
    // a pair of racing same-key invocations safe (the r12 ADVICE race
    // on the bare put-and-free); it is BOUNDED protection, not a full
    // concurrency contract: with three or more concurrent same-key
    // callers the oldest frame can still be freed before its caller
    // consumes it. Every current caller re-invokes sequentially per
    // key (the registry consumes each frame before re-invoking). The
    // freeing itself happens AFTER compute returns — unpersist must
    // not run under the map's bin lock, and a throwing free must not
    // abort the remapping (which would leak the new handles for the
    // session). Still executes fresh every time (bench numbers stay
    // honest; this is hygiene, not memoization). Entries evict with
    // the session via the application-end listener.
    val spark = pairs.sparkSession
    // key fidelity (r18 review, same fix as PinRegistry r15):
    // canonicalized.toString truncates at spark.sql.debug.maxToStringFields,
    // so two DIFFERENT wide input plans could render identically and
    // collide — under a collision the two-generation keep-window frees a
    // frame a DIFFERENT caller's plan still reads. semanticHash covers
    // the full tree; the pair is collision-safe.
    val canon = pairs.queryExecution.analyzed.canonicalized
    val key = (spark, canon.semanticHash().toString + ":" +
      canon.toString + s"|$aCol|$bCol")
    var dropped: List[Seq[org.apache.spark.rdd.RDD[_]]] = Nil
    lastResult.compute(key, (_, old) => {
      val prior = if (old == null) Nil else old
      dropped = prior.drop(1)
      handles :: prior.take(1)
    })
    dropped.foreach(LocalCheckpoints.free)
    if (evictionRegistered.add(spark)) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          lastResult.keySet.removeIf(_._1 eq spark)
          evictionRegistered.remove(spark): Unit
        }
      })
    }
    out
  }

  private val lastResult = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String),
    List[Seq[org.apache.spark.rdd.RDD[_]]]]()
  private val evictionRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.sql.SparkSession]()

  /** The LAZY builder plan plus the two cache pins it references —
    * exposed so plan-shape audits can assert the wedge/close join
    * shape that [[perNode]]'s eager materialization hides behind a
    * LogicalRDD scan. Callers must unpersist the returned pins (or go
    * through [[perNode]], which does). */
  private[graft] def perNodePlan(pairs: DataFrame, aCol: String,
      bCol: String): (DataFrame, Seq[DataFrame]) = {
    // self-loops would count phantom wedges; a simple graph has none,
    // but dropping them is one codegen'd filter
    val p = pairs.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val sym = p.union(p.select(col("b").as("a"), col("a").as("b")))
    // persisted: deg is referenced three times (both degree attaches +
    // the final left join), and each unpinned reference would recompute
    // the symmetrized-edge scan and its groupBy shuffle from source
    // (measured 1.7× on the round-9 bench before pinning)
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
      .persist()
    // (deg, id) total order; orient low → high so out-degrees are O(√m)
    val withDeg = sym
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    // persisted: the oriented list is referenced three times (both
    // wedge legs + the closing probe); without pinning it the whole
    // degree-attach subtree would re-evaluate per reference
    val oriented = withDeg
      .filter(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select(col("a").as("u"), col("b").as("v"),
        col("db").as("dv"))
      .persist()
    // wedges at the common smaller endpoint, leg pair in rank order,
    // closed by an oriented edge between the legs
    val e1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = e1.join(e2, "u")
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val tri = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
    val corners = tri.select(explode(array(col("u"), col("x"), col("y")))
      .as("node"))
    val counts = corners.groupBy(col("node")).agg(count(lit(1)).as("t"))
    val result = deg.join(counts, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("t"), lit(0L)).as("n_triangles"))
      .withColumn("lcc_micro",
        when(col("deg") >= 2,
          expr("(2 * n_triangles * 1000000) div (deg * (deg - 1))"))
          .otherwise(lit(0L)))
    (result, Seq(deg, oriented))
  }
}
