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
  *  - parquet nanos-as-long (legacy testdata generations stored
  *    `events.ts` as TIMESTAMP(NANOS); the flag is a no-op on the
  *    current TIMESTAMP(MICROS) files — see [[Tables.nanosAsLongKey]]
  *    and the dtype-adaptive [[Tables.normalizeEventTs]]).
  */
object GraftSession {

  /** Apply graft defaults to a builder; caller still picks master/app. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Parallelism floors (r19 optimization round, guide §2/§6). Both
      // of Spark's task-sizing decisions are BYTE-based, which
      // under-provisions this engine's CPU-dense operators (md5
      // shingling, Levenshtein DP, set-intersection verification):
      // stage profiles showed 1-5 running tasks on a 32-thread
      // executor because (a) a scan of a compact parquet table floors
      // its split size at openCostInBytes = 4 MB — a 10 MB file is 3
      // tasks, a 2 MB file is ONE — and (b) AQE's partition coalescing
      // floors post-shuffle partitions at minPartitionSize = 1 MB, so
      // a 5 MB shuffle of candidate pairs (each carrying minutes of
      // per-row CPU at estate scale) collapses to 5 partitions. Both
      // knobs only BIND when splits/partitions are small — at 100 TB
      // every healthy scan split is maxPartitionBytes-sized and every
      // shuffle partition is advisory-sized, so lowering the floors is
      // a no-op there; what they buy is full-parallelism execution of
      // the CPU-dense tail whose bytes are small relative to its
      // compute. The values stay derived, not tuned: the scan floor
      // targets one split per executor thread (the same cores-derived
      // sizing shuffle.partitions uses), and the coalesce floor is
      // dropped to 64 KB so parallelism-first coalescing (the default)
      // can actually reach the target parallelism on compact shuffles.
      // Object-store deployments where a file open costs real latency
      // should raise openCostInBytes back via --conf; nothing here
      // reads an absolute core count.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", (64 * 1024).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      // Checkpoint file checksums (4.1 default-on) route every state
      // file through RawLocalFileSystem.getFileLinkStatus, which forks
      // a `readlink` SHELL per file on local filesystems — a RocksDB
      // transformWithState spec went from minutes-stuck to seconds with
      // this off. The feature targets object-store corruption detection;
      // on a real deployment's DFS checkpoint dir, re-enable it.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")

  /** Local session for the driver-contract mains. */
  def local(cpus: Int): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** DURABLE-catalog local session: the Hive catalog backed by an
    * embedded Derby metastore at a caller-fixed path, so table
    * metadata — including BUCKET specs, which live only in the
    * catalog, never in the data files — survives process restarts.
    * A second JVM pointed at the same (warehouseDir, metastoreDir)
    * sees `tableExists` = true and probes the first JVM's bucketed
    * files with no rebuild and no Exchange above the bucketed scan
    * (receipt: PostingIndexCrossJvmSpec drives two real JVMs through
    * [[graft.tools.PostingIndexCli]]). Embedded Derby is
    * single-process — sequential JVMs share it; concurrent writers
    * need a server-grade metastore (Hive service/Glue), where the
    * SAME calling code applies unchanged. */
  def localDurable(cpus: Int, warehouseDir: String, metastoreDir: String): SparkSession = {
    // warehouse dir, metastore URL, and catalog implementation are
    // STATIC confs: getOrCreate silently ignores them when a session
    // already lives in this JVM, which would hand back the in-memory
    // catalog and quietly void the durability contract — fail loudly
    // instead of returning a session that can't keep the promise
    // stopped sessions stay in the thread-local/default holders, so
    // filter them out — only a LIVE session makes getOrCreate ignore
    // the static confs
    require(
      SparkSession.getActiveSession.filterNot(_.sparkContext.isStopped).isEmpty &&
        SparkSession.getDefaultSession.filterNot(_.sparkContext.isStopped).isEmpty,
      "localDurable requires a fresh JVM: a live SparkSession already exists " +
        "and its catalog/warehouse static confs cannot be changed after the fact")
    val s = configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastoreDir;create=true")
      // embedded-metastore first-run bootstrap: let datanucleus create
      // the schema instead of requiring a pre-provisioned database
      .config("spark.hadoop.datanucleus.schema.autoCreateAll", "true")
      .config("spark.hadoop.hive.metastore.schema.verification", "false")
      .enableHiveSupport()
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
