package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.TopKByScore

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("top-k aggregate equals the window row_number formulation, including ties") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { i =>
      (i % 13L, math.floor(rnd.nextDouble() * 20) / 20.0, i.toLong) // coarse scores → ties
    }
    // many partitions → partial buffers must merge correctly
    val df = rows.toDF("g", "score", "id").repartition(16)

    val viaAgg = df.groupBy($"g")
      .agg(TopKByScore.topk($"score", $"id", 5).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", ($"pos" + 1).as("rank"), $"t.id".as("id"), $"t.score".as("score"))
      .as[(Long, Long, Long, Double)].collect().toSet

    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"g", $"rank".cast("long"), $"id", $"score")
      .as[(Long, Long, Long, Double)].collect().toSet

    assert(viaAgg === viaWindow)
  }

  test("groups smaller than k return all rows, best-first") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (2L, 0.1, 20L)).toDF("g", "score", "id")
    val out = df.groupBy($"g").agg(TopKByScore.topk($"score", $"id", 5).as("top"))
      .select($"g", $"top").as[(Long, Seq[(Double, Long)])].collect().toMap
    assert(out(1L) === Seq((0.9, 11L), (0.5, 10L)))
    assert(out(2L) === Seq((0.1, 20L)))
  }
}
