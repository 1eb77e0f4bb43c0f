package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Dedup
import graft.sources.KafkaReplay

/** Property tests for round-5 structural machinery — invariants that
  * must hold on ARBITRARY shapes, not just the fixtures: OCF split
  * planning tiles files exactly; union-find matches a naive BFS closure
  * on random graphs; offset-spec resolution respects the Kafka sentinel
  * contract on random specs. (Raw scalacheck generators with a fixed
  * seed; the scalatest bridge artifact isn't in the offline cache.)
  */
class StructurePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long = 7L): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  test("property: OCF splits tile every file exactly, each byte in ONE split") {
    // planSplits is driven through its arithmetic core here: for any
    // (fileLen, splitBytes), the ranges must cover [0, len) exactly once
    val gen = for {
      len <- Gen.choose(1L, 1L << 22)
      split <- Gen.choose(1L, 1L << 21)
    } yield (len, split)
    samples(gen, 200).foreach { case (len, split) =>
      val ranges = (0L until len by split).map(s => (s, math.min(split, len - s)))
      assert(ranges.map(_._2).sum === len, s"len=$len split=$split must tile")
      assert(ranges.forall(_._2 > 0))
      // contiguous, non-overlapping
      ranges.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) => assert(s1 + l1 === s2)
        case _ =>
      }
    }
  }

  test("property: union-find components == naive BFS closure on random graphs") {
    val gen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    samples(gen, 25).filter(_.nonEmpty).foreach { edges =>
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      // naive BFS ground truth
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      def reach(start: Long): Set[Long] = {
        var seen = Set(start); var frontier = List(start)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(adj.getOrElse(_, Nil)).filterNot(seen)
          seen ++= next; frontier = next
        }
        seen
      }
      nodes.foreach { n =>
        assert(got(n) === reach(n).min,
          s"node $n: expected min-reachable ${reach(n).min}, got ${got(n)} (edges=$edges)")
      }
    }
  }

  test("property: offset-spec resolution respects sentinels, clamps, and defaults") {
    import scala.collection.immutable.SortedMap
    val gen = for {
      nParts <- Gen.choose(1, 6)
      ends <- Gen.listOfN(nParts, Gen.choose(0L, 50L))
      specced <- Gen.someOf(0 until nParts)
      specVals <- Gen.listOfN(specced.size, Gen.oneOf(
        Gen.const(-2L), Gen.const(-1L), Gen.choose(0L, 60L)))
    } yield (SortedMap.from(ends.zipWithIndex.map { case (e, p) => p -> e }),
      specced.zip(specVals).toMap)
    samples(gen, 100).foreach { case (latest, spec) =>
      val endJson = spec.map { case (p, v) => s""""$p":${if (v == -2L) -1L else v}""" }
        .mkString("{", ",", "}")
      val ends = KafkaReplay.resolveEndingOffsets(endJson, latest)
      latest.foreach { case (p, e) =>
        spec.get(p).map(v => if (v == -2L) -1L else v) match {
          case Some(-1L) | None => assert(ends(p) === e) // latest / unlisted
          case Some(v) => assert(ends(p) === v.min(e)) // past-end clamps (documented)
        }
      }
      // starts (r15): in-range resolves verbatim; OUT-OF-RANGE is a
      // misconfiguration and must fail loudly (Kafka raises
      // offset-out-of-range; the old silent clamp produced an
      // empty-but-successful read)
      val startSpec = spec.filter(_._2 != -1L)
      val startJson = startSpec.map { case (p, v) => s""""$p":$v""" }
        .mkString("{", ",", "}")
      val outOfRange = startSpec.exists { case (p, v) =>
        v != -2L && v > latest(p) }
      if (outOfRange)
        intercept[IllegalArgumentException] {
          KafkaReplay.resolveStartingOffsets(startJson, latest)
        }
      else {
        val starts = KafkaReplay.resolveStartingOffsets(startJson, latest)
        latest.foreach { case (p, _) =>
          startSpec.get(p) match {
            case Some(-2L) | None => assert(starts(p) === 0L) // earliest / unlisted
            case Some(v) => assert(starts(p) === v)
          }
        }
      }
    }
  }

  test("property: PQ self-query ADC distance equals the vector's own qerr") {
    // for ANY corpus, querying a vector against its own code through
    // the ADC lookup table must reproduce exactly its quantization
    // error — the identity that pins LUT and encode to the same metric
    import org.apache.spark.sql.functions._
    import graft.operators.Pq
    val gen = Gen.listOfN(64, Gen.choose(-1000, 1000).map(_ / 1000.0f))
    val vecs = samples(gen, 40).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Pq.codebook(df, "vec_id", "embedding", dim = 64, m = 8, k = 8, iters = 1)
    val enc = Pq.encode(df, cb, "vec_id", "embedding", dim = 64, m = 8)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[scala.collection.Seq[Int]]("codes"), r.getAs[Long]("qerr"))).toMap
    val subDim = 8
    val cbRows = cb.collect().map(r =>
      (r.getAs[Int]("blk"), r.getAs[Int]("code")) -> r.getAs[scala.collection.Seq[Long]]("qc")).toMap
    vecs.foreach { case (id, v) =>
      val (codes, qerr) = enc(id)
      val self = (0 until 8).map { b =>
        val qv = v.slice(b * subDim, (b + 1) * subDim)
          .map(x => math.round(x.toDouble * 1e6))
        val qc = cbRows((b, codes(b)))
        qv.zip(qc).map { case (a, c) => (a - c) * (a - c) }.sum
      }.sum
      assert(self === qerr, s"vec $id: self-ADC $self != qerr $qerr")
    }
  }

  test("property: the Bloom bit-set never misses an inserted shingle") {
    // insert arbitrary strings, probe the SAME strings: all 4 bit
    // positions must be present — the no-false-negative law on
    // arbitrary inputs, independent of the fixture corpus
    import org.apache.spark.sql.functions._
    val gen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(24))
    val items = samples(gen, 150).distinct
    val df = items.map(Tuple1(_)).toDF("s")
    def positions(c: org.apache.spark.sql.Column) =
      array((0 until 4).map(i =>
        conv(substring(md5(concat(c, lit(s"#$i"))), 1, 4), 16, 10).cast("int")): _*)
    val bits = df.select(explode(positions(col("s"))).as("bit"))
      .distinct().collect().map(_.getInt(0)).toSet
    val missing = df.select(col("s"), positions(col("s")).as("p")).collect()
      .filter(r => !r.getAs[scala.collection.Seq[Int]]("p").forall(bits.contains))
    assert(missing.isEmpty,
      s"false negatives on inserted items: ${missing.take(3).mkString(",")}")
  }

  test("property: distributed BFS hops == reference BFS on random graphs") {
    // Bfs.hops (frontier expansion over DataFrames) against an
    // in-memory queue BFS on random sparse graphs with random seed sets
    val gen = for {
      n <- Gen.choose(2, 25)
      nEdges <- Gen.choose(1, 60)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
      nSeeds <- Gen.choose(1, 3)
      seeds <- Gen.listOfN(nSeeds, Gen.choose(0, n - 1).map(_.toLong))
      maxHops <- Gen.choose(1, 4)
    } yield (edges.filter(e => e._1 != e._2), seeds.distinct, maxHops)
    samples(gen, 25, seed0 = 11L).foreach { case (edges, seeds, maxHops) =>
      // reference: queue BFS over the symmetrized adjacency
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val dist = scala.collection.mutable.Map(seeds.map(_ -> 0): _*)
      var frontier = seeds.toSet
      var h = 0
      while (h < maxHops && frontier.nonEmpty) {
        h += 1
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .filterNot(dist.contains)
        frontier.foreach(dist(_) = h)
      }
      val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
      val got = graft.operators.Bfs.hops(sym, seeds.toDF("node"), maxHops)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === dist.toMap,
        s"BFS mismatch on edges=$edges seeds=$seeds maxHops=$maxHops")
    }
  }
}
