package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crossover receipt for [[graft.operators.Dedup.connectedComponents]]'s
  * driver union-find gate (VERDICT r14 ask #5): the 4M-edge limit was
  * documented but ASSERTED — this probe times the driver path against
  * the distributed min-label loop on the same edge sets at 1×/5×/10×
  * (0.8M → 8M edges) and writes the measured crossover as an artifact,
  * so the gate is a number with a receipt instead of a guess.
  *
  * Edge topology mirrors what the gate actually sees — an LSH near-dup
  * candidate graph: overwhelmingly small components (duplicate clusters
  * of 2–6 docs) plus a few long chains that force the distributed loop
  * through its O(log diameter) rounds. Deterministic (id arithmetic, no
  * RNG) so runs are comparable.
  *
  * `runMain graft.tools.ComponentsCrossover [edges1x] [outPath]`
  */
object ComponentsCrossover {

  /** ~n edges over ~n nodes: 95% short chains (component size ≤ 6),
    * 5% links into 1000-node chains (diameter stressor). */
  def edgeSet(spark: SparkSession, n: Long): DataFrame = {
    val e = spark.range(n).toDF("i")
    e.select(
      when(col("i") % 20 =!= 0, col("i") - (col("i") % 6).cast("long"))
        .otherwise((col("i") / 1000).cast("long") * 1000 + ((col("i") + 1) % 1000))
        .as("id_a"),
      col("i").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  final case class Arm(edges: Long, driverS: Double, distS: Double,
      components: Long)

  def probe(spark: SparkSession, sizes: Seq[Long]): Seq[Arm] = sizes.map { n =>
    val pairs = edgeSet(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // materialize outside both timing windows
    val (drv, driverS) = time {
      graft.operators.Dedup.connectedComponents(pairs,
        driverEdgeLimit = Long.MaxValue)
        .agg(countDistinct(col("component"))).first().getLong(0)
    }
    val (dist, distS) = time {
      graft.operators.Dedup.connectedComponents(pairs, driverEdgeLimit = 0L)
        .agg(countDistinct(col("component"))).first().getLong(0)
    }
    require(drv == dist,
      s"paths disagree at $n edges: driver=$drv distributed=$dist")
    pairs.unpersist()
    Arm(n, driverS, distS, drv)
  }

  def main(args: Array[String]): Unit = {
    // arg 1: either a comma-separated explicit size list or a 1x size
    // (expanded to 1x/5x/10x); arg 2: artifact path
    val sizes = args.headOption.map { a =>
      val ns = a.split(",").map(_.trim.toLong).toSeq
      if (ns.size > 1) ns else Seq(ns.head, ns.head * 5, ns.head * 10)
    }.getOrElse(Seq(800000L, 4000000L, 8000000L))
    val outPath = args.lift(1).getOrElse("SCALE_r15_components.json")
    val spark = graft.sources.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val arms = probe(spark, sizes)
    val rows = arms.map { a =>
      f"""{"edges":${a.edges},"components":${a.components},""" +
        f""""driver_unionfind_s":${a.driverS}%.3f,"distributed_minlabel_s":${a.distS}%.3f,""" +
        f""""driver_advantage":${a.distS / a.driverS}%.2f}"""
    }.mkString("[", ",", "]")
    val out =
      s"""{"probe":"components_crossover","edge_topology":"95pct chains<=6 + 5pct 1000-node chains",""" +
        s""""note":"driver union-find vs distributed min-label on identical edges; driver_advantage > 1 means the driver path wins; the driverEdgeLimit gate should sit where advantage approaches 1 or driver heap risk dominates (measured ~250B/edge: 4M edges ~ 1GB)","arms":$rows}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (out + "\n").getBytes("UTF-8"))
    arms.foreach(a => println(
      f"[components] edges ${a.edges}%9d  driver ${a.driverS}%6.2f s  " +
        f"distributed ${a.distS}%6.2f s  advantage x${a.distS / a.driverS}%.2f"))
    println(s"[components] artifact written to $outPath")
    spark.stop()
  }
}
