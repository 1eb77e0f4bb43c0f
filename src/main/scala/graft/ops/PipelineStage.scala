package graft.ops

import org.apache.spark.sql.DataFrame

/** A composable `DataFrame => DataFrame` transform stage.
  *
  * Mirrors the reference's extension surface — a Kafka Connect SMT is a
  * configured `Transformation<R>` with an `apply` that maps one record to
  * zero-or-one records (`/root/reference/smt/src/main/java/org/dorjee/smt/
  * UserProfileTransform.java:14-91`, wired by config at
  * `/root/reference/connectors/s3-sink.json:22-23`). Here a stage is
  * set-at-a-time instead of record-at-a-time: one declarative DataFrame
  * expression that Catalyst analyzes once (the reference's per-instance
  * schema memoization, `UserProfileTransform.java:16,41`, is subsumed by
  * plan-time analysis) and whole-stage codegen executes vectorized.
  */
trait PipelineStage extends Serializable { self =>
  def name: String

  def apply(df: DataFrame): DataFrame

  /** Sequential composition, analogous to the SMT chain declared as
    * `transforms=a,b,c` in connector config. */
  def andThen(next: PipelineStage): PipelineStage = new PipelineStage {
    val name = s"${self.name}>>${next.name}"
    def apply(df: DataFrame): DataFrame = next(self(df))
  }
}

object PipelineStage {

  /** A stage from a plain function. */
  def apply(stageName: String)(f: DataFrame => DataFrame): PipelineStage =
    new PipelineStage {
      val name = stageName
      def apply(df: DataFrame): DataFrame = f(df)
    }

  val identity: PipelineStage = apply("identity")(df => df)

  /** Chain stages left-to-right; empty chain is identity. */
  def chain(stages: Seq[PipelineStage]): PipelineStage =
    stages.foldLeft(identity)(_ andThen _)
}
