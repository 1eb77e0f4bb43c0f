package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Synthetic k-fold corpus inflation for the scale probe
  * ([[ScaleProbe]]): writes a `k`-copy union of every testdata table to
  * `destDir`, with keys and content remapped so the copies behave like
  * GENUINELY NEW data rather than duplicates.
  *
  * Naive inflation (union of verbatim copies) would be a trap for
  * exactly the operators the probe exists to check: identical documents
  * across copies are true near-duplicates, so every dedup/LSH/ANN
  * family would correctly report k² cross-copy pairs — a quadratic
  * OUTPUT growth that says nothing about the algorithm's cost shape.
  * Each copy is therefore remapped to be disjoint at the semantic
  * level the operators measure, while preserving WITHIN-copy structure
  * so each copy behaves statistically like the base corpus:
  *
  *  - join/grouping keys shift by `copy · keyOffset` (dimension keys to
  *    the fixed nation/region tables stay put, preserving referential
  *    integrity);
  *  - document text gets a per-copy token INTERLEAVED between words:
  *    every word-k-gram then contains the copy token, so shingle sets
  *    of different copies are disjoint (cross-copy Jaccard 0) while the
  *    map original-shingle → salted-shingle is 1:1 within a copy, so
  *    within-copy similarity structure is preserved;
  *  - embeddings get a per-copy RANDOM SIGN FLIP per dimension — an
  *    orthogonal transform, so within-copy cosines are preserved
  *    EXACTLY while cross-copy cosines of corresponding vectors drop
  *    to noise (expected 0 under independent signs);
  *  - part names get a per-copy suffix so entity-resolution families
  *    see k distinct (if adjacent-sorting) name populations.
  *
  * Copy 0 receives the SAME transforms as every other copy, so a 1×
  * "inflation" is the apples-to-apples baseline for a k× run.
  */
object Inflate {

  /** Key shift per copy; far above any base key at probed scales. */
  val keyOffset: Long = 1000000000L

  private def shift(c: String, i: Int): Column =
    (col(c) + lit(i * keyOffset)).as(c)

  /** Per-copy interleaved word salt (see scaladoc): shingle sets of
    * different copies share no element. The interleave alone only
    * rewrites INTERNAL whitespace, so a 0/1-word document would stay
    * byte-identical across copies — reintroducing exactly the
    * cross-copy k² duplicate mass the inflation exists to prevent; the
    * unconditional per-copy PREFIX token makes every copy's text
    * differ regardless of word count. */
  private[graft] def saltText(c: Column, i: Int): Column =
    concat(lit(s"q${i}z "), regexp_replace(c, "\\s+", s" q${i}z "))

  /** Per-copy ± sign per dimension — orthogonal, cosine-preserving
    * within the copy; decorrelating across copies. */
  private def signFlip(c: Column, i: Int): Column =
    transform(c, (x, j) =>
      (x * (lit(1) - lit(2) * pmod(hash(lit(i), j), lit(2)))).cast("float"))

  private def copies(df: DataFrame, k: Int)(f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until k).map(i => f(df, i)).reduce(_ unionByName _)

  /** The k-fold inflated frame for one table (raw, as loaded). */
  def table(spark: SparkSession, srcDir: String, name: String, k: Int): DataFrame = {
    val df = Tables.load(spark, srcDir, name)
    name match {
      // fixed-cardinality dimensions: facts keep pointing at them
      case "region" | "nation" => df
      case "documents" => copies(df, k) { (d, i) =>
        val t = saltText(col("text"), i)
        d.select(shift("doc_id", i), t.as("text"), col("lang"), col("source"),
          length(t).cast("long").as("n_chars"))
      }
      case "embeddings" => copies(df, k) { (d, i) =>
        d.select(shift("vec_id", i), signFlip(col("embedding"), i).as("embedding"),
          col("label"))
      }
      case "events" => copies(df, k) { (d, i) =>
        d.withColumn("event_id", shift("event_id", i))
          .withColumn("user_id", shift("user_id", i))
      }
      case "part" => copies(df, k) { (d, i) =>
        d.withColumn("p_partkey", shift("p_partkey", i))
          .withColumn("p_name", concat(col("p_name"), lit(s" x$i")))
      }
      case "orders" => copies(df, k) { (d, i) =>
        d.withColumn("o_orderkey", shift("o_orderkey", i))
          .withColumn("o_custkey", shift("o_custkey", i))
      }
      case "lineitem" => copies(df, k) { (d, i) =>
        d.withColumn("l_orderkey", shift("l_orderkey", i))
          .withColumn("l_partkey", shift("l_partkey", i))
          .withColumn("l_suppkey", shift("l_suppkey", i))
      }
      case "customer" => copies(df, k)((d, i) => d.withColumn("c_custkey", shift("c_custkey", i)))
      case "supplier" => copies(df, k)((d, i) => d.withColumn("s_suppkey", shift("s_suppkey", i)))
      case other => throw new IllegalArgumentException(s"unknown table $other")
    }
  }

  /** Writes the full inflated corpus under `destDir` in the testdata
    * layout — `<destDir>/<table>.parquet` as a single plain FILE, not
    * a directory: the streamed loaders select their table with a
    * `pathGlobFilter` on leaf FILE names (`Tables.eventsStream`), so a
    * directory of part-files would silently stream zero rows. Probe
    * corpora are small enough that the single-file coalesce is free. */
  def corpus(spark: SparkSession, srcDir: String, destDir: String, k: Int): Unit =
    Tables.names.foreach(name =>
      writeSingleParquet(table(spark, srcDir, name, k), destDir, name))

  /** Writes `df` as `<destDir>/<name>.parquet` — ONE plain file in the
    * testdata layout (see [[corpus]]); shared with [[SkewProbe]]'s
    * streamed-corpus writer so the layout contract has one home. */
  def writeSingleParquet(df: org.apache.spark.sql.DataFrame,
      destDir: String, name: String): Unit = {
    val scratch = s"$destDir/_build_$name"
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file under $scratch"))
    val target = new java.io.File(destDir, s"$name.parquet")
    java.nio.file.Files.move(part.toPath, target.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(scratch).listFiles().foreach(_.delete())
    new java.io.File(scratch).delete(): Unit
  }
}
