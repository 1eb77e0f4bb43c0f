package graft.ops

import org.apache.spark.sql.functions._

/** Config-string-driven pipeline assembly — the analog of Kafka Connect's
  * `transforms=profileEnhancer` + `transforms.<name>.<prop>` wiring
  * (`/root/reference/connectors/s3-sink.json:22-23`,
  * `docker-compose.yml:66`): a pipeline declared as flat key/value config
  * rather than code, so deployments can re-shape the stream without a
  * rebuild.
  *
  * Config shape (mirroring Connect's property naming):
  * {{{
  * transforms                      = clean,audit
  * transforms.clean.type           = profile        // the SMT parity stage
  * transforms.clean.filter.cols    = first_name,last_name
  * transforms.clean.drop.cols      = raw_password_hash,internal_tracking_code
  * transforms.clean.mask.col       = email
  * transforms.clean.mask.value     = redacted@email.com
  * transforms.audit.type           = filter
  * transforms.audit.predicate      = age >= 18
  * }}}
  */
object PipelineConfig {

  def fromConfig(config: Map[String, String]): PipelineStage = {
    val names = config.getOrElse("transforms", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    PipelineStage.chain(names.map(n => stage(n, config)))
  }

  private def stage(name: String, config: Map[String, String]): PipelineStage = {
    def prop(k: String): Option[String] = config.get(s"transforms.$name.$k")
    def listProp(k: String): Seq[String] =
      prop(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

    prop("type").getOrElse(
      throw new IllegalArgumentException(s"transforms.$name.type missing")) match {
      case "profile" =>
        ProfileTransform(
          filterCols = listProp("filter.cols"),
          dropCols = listProp("drop.cols"),
          maskCol = prop("mask.col"),
          maskValue = prop("mask.value").getOrElse("redacted@email.com"),
          fullNameFrom = (listProp("fullname.cols") match {
            case Seq(f, l) => Some((f, l))
            case _ => None
          }),
          adultCol = prop("adult.col"),
          adultThreshold = prop("adult.threshold").map(_.toInt).getOrElse(18),
          clock = prop("clock").map(java.time.Instant.parse))
      case "filter" =>
        val pred = prop("predicate").getOrElse("true")
        PipelineStage(s"filter:$name")(_.filter(expr(pred)))
      case "drop" =>
        val cols = listProp("cols")
        PipelineStage(s"drop:$name")(_.drop(cols: _*))
      case "mask" =>
        val c = prop("col").getOrElse(throw new IllegalArgumentException(
          s"transforms.$name.col missing"))
        val v = prop("value").getOrElse("redacted")
        PipelineStage(s"mask:$name")(_.withColumn(c, lit(v)))
      case "derive" =>
        val c = prop("col").getOrElse(throw new IllegalArgumentException(
          s"transforms.$name.col missing"))
        val e = prop("expr").getOrElse(throw new IllegalArgumentException(
          s"transforms.$name.expr missing"))
        PipelineStage(s"derive:$name")(_.withColumn(c, expr(e)))

      // ---- training-data stages: the same config surface drives the
      // ---- corpus operators, so a whole prep pipeline is deployable as
      // ---- flat properties (the generalization of `transforms=`).
      case "quality_filter" =>
        val textCol = prop("text.col").getOrElse("text")
        val t = prop("threshold").map(_.toDouble).getOrElse(0.5)
        PipelineStage(s"quality_filter:$name")(
          _.filter(graft.functions.TextFunctions.qualityScore(col(textCol)) >= t))
      case "lang_filter" =>
        val textCol = prop("text.col").getOrElse("text")
        val lang = prop("lang").getOrElse("en")
        PipelineStage(s"lang_filter:$name")(
          _.filter(graft.functions.TextFunctions.langId(col(textCol)) === lang))
      case "dedup_exact" =>
        val idCol = prop("id.col").getOrElse("doc_id")
        val textCol = prop("text.col").getOrElse("text")
        PipelineStage(s"dedup_exact:$name") { df =>
          graft.operators.Dedup.exact(df, idCol, textCol)
            .select(col("survivor_id").as(idCol))
            .join(df, idCol)
        }
      case "dedup_minhash" =>
        val idCol = prop("id.col").getOrElse("doc_id")
        val textCol = prop("text.col").getOrElse("text")
        val t = prop("threshold").map(_.toDouble).getOrElse(0.8)
        PipelineStage(s"dedup_minhash:$name") { df =>
          val losers = graft.operators.Dedup
            .minhashNearDups(df, idCol, textCol, threshold = t, useMd5 = true)
            .select(col("id_b").as(idCol)).distinct()
          df.join(losers, Seq(idCol), "left_anti")
        }
      case "chunk" =>
        val idCol = prop("id.col").getOrElse("doc_id")
        val textCol = prop("text.col").getOrElse("text")
        val size = prop("size").map(_.toInt).getOrElse(50)
        val stride = prop("stride").map(_.toInt).getOrElse(40)
        PipelineStage(s"chunk:$name") { df =>
          df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("__w"))
            .select(col(idCol), col("__w"), posexplode(
              sequence(lit(0), greatest(org.apache.spark.sql.functions.size(col("__w")) - 1,
                lit(0)), lit(stride))))
            .select(col(idCol), col("pos").as("chunk_idx"),
              concat_ws(" ", slice(col("__w"), col("col") + 1, lit(size))).as("chunk"))
        }
      case other =>
        throw new IllegalArgumentException(s"unknown transform type: $other")
    }
  }
}
