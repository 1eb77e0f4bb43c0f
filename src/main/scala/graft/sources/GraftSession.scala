package graft.sources

import org.apache.spark.sql.SparkSession

/** One place for the session configuration every graft entry point
  * shares, so a library user gets the same recommended settings the
  * mains and tests run with:
  *
  *  - AQE on (runtime re-plan: broadcast conversion, skew-join split,
  *    partition coalescing — the 100 TB safety net).
  *  - `spark.sql.shuffle.partitions` sized to the executor thread count
  *    (cores on local mode) rather than the 200 default.
  *  - UTC session timezone (oracle determinism — timestamps compare as
  *    instants, not local renderings).
  *  - parquet nanos-as-long (the `events` table's TIMESTAMP(NANOS)
  *    column; see [[Tables.nanosAsLongKey]]).
  */
object GraftSession {

  /** Apply graft defaults to a builder; caller still picks master/app. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")

  /** Local session for the driver-contract mains. */
  def local(cpus: Int): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
