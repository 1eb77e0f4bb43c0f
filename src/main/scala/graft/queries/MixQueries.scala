package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Training-mix diagnostics: what each source/cluster of the corpus
  * LOOKS like, lexically and in embedding space — the dashboards a
  * mix designer reads before setting `source_mix_plan`'s targets.
  *
  * The reference pipeline (dotsering/kafka-connect-minio-pipeline)
  * has no corpus analytics at all (its verifier reconciles counts,
  * `producer/verifier_ui.py:101-138`); these extend the curation
  * surface alongside the other beyond-parity rows.
  */
object MixQueries {

  /** Per-source lexical profile: token mass, vocabulary size,
    * type-token ratio, and Shannon entropy of the word distribution
    * in micro-nats. Entropy terms are quantized PER TERM
    * (round(−p·ln p · 10^6)) and then integer-summed, so the result
    * is independent of aggregation order and engine — the same
    * determinism recipe as the CCNet perplexity LM. Plan shape: one
    * map-combined (source, token) count, a broadcast join of the
    * source totals (sources ≪ corpus), one final per-source agg —
    * the occurrence stream never re-shuffles. */
  def sourceTokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val occ = Tables.documents(spark, dir)
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tok"))
    val counts = occ.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("vocab"))
    counts.join(broadcast(totals), "source")
      .withColumn("p", col("c").cast("double") / col("n").cast("double"))
      .withColumn("e_term", round(-col("p") * log(col("p")) * 1e6).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_tokens"), max(col("vocab")).as("vocab"),
        sum(col("e_term")).as("entropy_micro"))
      .withColumn("ttr_micro", expr("(vocab * 1000000) div n_tokens"))
      .orderBy(col("source"))
  }

  /** Pairwise cosine similarity between per-label embedding centroids:
    * which clusters of the corpus say the same thing in embedding
    * space (merge candidates for mix design). Components are
    * micro-quantized to longs scan-side, per-dimension sums are exact
    * integers (aggregation-order independent), centroid means use
    * floor(sum/n) in double (exact here: quotients are ~10^6 with
    * denominators ≪ the ulp gap), and the final cosine is one
    * correctly-rounded double expression over identical integer
    * inputs in both engines. Scale: the per-(label, dim) partial agg
    * is map-combined over the exploded stream; everything after is
    * labels × dims sized (tiny), and the pairwise join is labels². */
  def sourceCentroidSim(spark: SparkSession, dir: String): DataFrame = {
    val cent = Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "e")))
      .withColumn("q", round(col("e").cast("double") * 1e6).cast("long"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .withColumn("m",
        floor(col("s").cast("double") / col("n").cast("double")).cast("long"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("cm"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    val a = cent.select(col("label").as("label_a"), col("cm").as("ca"))
    val b = cent.select(col("label").as("label_b"), col("cm").as("cb"))
    a.join(b, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        dot(col("ca"), col("cb")).as("dot"),
        round(dot(col("ca"), col("cb")).cast("double") /
          (sqrt(dot(col("ca"), col("ca")).cast("double")) *
            sqrt(dot(col("cb"), col("cb")).cast("double"))), 6).as("cos"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_token_entropy" -> (sourceTokenEntropy _),
    "source_centroid_sim" -> (sourceCentroidSim _)
  )

  val oracles: Map[String, String] = Map(
    "source_token_entropy" ->
      """WITH occ AS (
        |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, COUNT(*) AS c FROM occ GROUP BY source, tok),
        |t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS vocab
        |      FROM c GROUP BY source),
        |e AS (
        |  SELECT c.source,
        |         CAST(round(-(CAST(c.c AS DOUBLE) / t.n)
        |           * ln(CAST(c.c AS DOUBLE) / t.n) * 1e6) AS BIGINT) AS e_term
        |  FROM c JOIN t USING (source))
        |SELECT t.source, t.n AS n_tokens, CAST(t.vocab AS BIGINT) AS vocab,
        |       CAST(SUM(e.e_term) AS BIGINT) AS entropy_micro,
        |       (CAST(t.vocab AS BIGINT) * 1000000) // t.n AS ttr_micro
        |FROM t JOIN e USING (source)
        |GROUP BY t.source, t.n, t.vocab
        |ORDER BY t.source""".stripMargin,
    "source_centroid_sim" ->
      """WITH q AS (
        |  SELECT label, CAST(u.i AS INT) AS pos,
        |         CAST(round(CAST(embedding[CAST(u.i + 1 AS INT)] AS DOUBLE)
        |           * 1e6) AS BIGINT) AS q
        |  FROM embeddings, UNNEST(range(len(embedding))) AS u(i)),
        |m AS (
        |  SELECT label, pos,
        |         CAST(floor(CAST(SUM(q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |  FROM q GROUP BY label, pos),
        |d AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |         CAST(SUM(a.m * b.m) AS BIGINT) AS dot
        |  FROM m a JOIN m b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY a.label, b.label),
        |nrm AS (
        |  SELECT label, CAST(SUM(m * m) AS BIGINT) AS n2
        |  FROM m GROUP BY label)
        |SELECT d.label_a, d.label_b, d.dot,
        |       round(CAST(d.dot AS DOUBLE)
        |             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
        |             6) AS cos
        |FROM d JOIN nrm na ON na.label = d.label_a
        |       JOIN nrm nb ON nb.label = d.label_b
        |ORDER BY d.label_a, d.label_b""".stripMargin
  )
}
