package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Handle-exact bookkeeping for eager `localCheckpoint` loops.
  *
  * Iterative operators (BFS frontiers, label propagation) must truncate
  * lineage each round or round k re-executes rounds 1..k−1; eager
  * `localCheckpoint` does that but pins UNREPLICATED executor blocks
  * that the loop must release as rounds supersede each other. The
  * Dataset API exposes no handle to the RDD it just persisted, and
  * diffing the SparkContext-GLOBAL `getPersistentRDDs` registry around
  * the call is a RACE in any multi-threaded harness (Verify runs the
  * registry on a thread pool): a sibling query's persist landing in the
  * diff window would be attributed to this loop and later unpersisted —
  * and unpersisting someone else's localCheckpointed RDD destroys its
  * ONLY copy (lineage is truncated), an intermittent cross-query
  * failure. So take the handle DIRECTLY: `Dataset.localCheckpoint`
  * returns a Dataset whose analyzed plan is exactly one [[LogicalRDD]]
  * wrapping the RDD it persisted; collecting that node yields the
  * precise blocks this call created, with no global state consulted.
  */
object LocalCheckpoints {

  /** Eagerly localCheckpoints `ds`; returns the checkpointed frame plus
    * the exact RDD handles backing it (for a later [[free]]). Typed:
    * works for `DataFrame` and any `Dataset[T]`. */
  def tracked[T](ds: Dataset[T]): (Dataset[T], Seq[RDD[_]]) = {
    val out = ds.localCheckpoint(true)
    val handles = out.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }
    (out, handles)
  }

  /** Releases the blocks of a superseded checkpoint. Non-blocking: the
    * caller's next round does not wait on block removal. */
  def free(handles: Seq[RDD[_]]): Unit =
    handles.foreach(_.unpersist(false))
}

/** Replace-on-reinvoke hygiene for `persist()` pins that must stay
  * cached until the LAZY returned plan executes (a frame consumed twice
  * within one returned plan — substringSpans' gram pass,
  * minhashNearDups' shingle frame — cannot unpersist before execution,
  * and without a registry every invocation leaks one corpus-scale cache
  * for the session lifetime). The key embeds the canonicalized plan, so
  * every handle ever stored under one key is PLAN-IDENTICAL and shares
  * ONE CacheManager entry (persist of an already-cached plan is a
  * no-op) — a session holds exactly one corpus-scale entry per distinct
  * (call site, input), released by [[PinRegistry.evict]] at application
  * end. */
object PinRegistry {

  private val pins = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String),
    List[Seq[Dataset[_]]]]()

  // one end-of-application listener per session (ADVICE r13): without
  // it every distinct (call site, input) pins ONE corpus-scale cache
  // entry for the session LIFETIME, and the static map strongly
  // retains dead SparkSessions across sessions in a long-lived JVM
  // (test suites, notebooks) — same hygiene as Triangles' registry
  private val evictionRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[
      org.apache.spark.sql.SparkSession]()

  /** Register `newPins` (already persisted) under `tag` + their
    * canonicalized plans. Superseded handles are dropped WITHOUT
    * unpersist (r15 review): plan-identical handles share one cache
    * entry and `uncacheQuery` matches by plan, so the old two-generation
    * "free the grand-predecessor" unpersist killed the entry the NEWEST
    * invocation's just-returned lazy plan still needed — on a third
    * identical call the range-partition shuffle re-executed unpinned,
    * re-sampling boundaries (the exact wrong-offsets hazard
    * RunningTotal's persistence exists to prevent). */
  def replace(tag: String, newPins: Seq[Dataset[_]]): Unit = {
    if (newPins.isEmpty) return
    val spark = newPins.head.sparkSession
    // key fidelity (r15 review): canonicalized.toString truncates at
    // spark.sql.debug.maxToStringFields — two DIFFERENT wide plans could
    // render identically and collide. semanticHash covers the FULL tree,
    // so the pair is collision-safe; and putIfAbsent (first-wins) means
    // a colliding put can never silently drop a handle un-freed — the
    // stored handle backs the one shared CacheManager entry that any
    // later plan-identical invocation re-uses.
    val key = (spark, tag + "|" + newPins.map { d =>
      val c = d.queryExecution.analyzed.canonicalized
      c.semanticHash().toString + ":" + c.toString
    }.mkString("\u0000"))
    pins.putIfAbsent(key, List(newPins)): Unit
    if (evictionRegistered.add(spark)) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          evict(spark)
          // only the end-of-life path deregisters: a MANUAL evict must
          // leave the session marked, or the next replace() would
          // install a second identical listener per evict/replace
          // cycle — an unbounded listener-bus leak on long sessions
          evictionRegistered.remove(spark): Unit
        }
      })
    }
  }

  /** Drops every entry of `spark` and unpersists its pins (non-blocking).
    * Called by the application-end listener; exposed for tests and for
    * callers that want to release a session's pins early. Idempotent;
    * the session's listener registration stays (see above). */
  def evict(spark: org.apache.spark.sql.SparkSession): Unit = {
    val it = pins.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        // the listener fires while the context is tearing down: a
        // too-late unpersist may throw on a stopped context — dropping
        // the registry entry is the part that must still happen
        e.getValue.foreach(_.foreach(d =>
          scala.util.Try(d.unpersist(false)): Unit))
        it.remove()
      }
    }
  }
}
