package graft.pipeline

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.quality.DataQuality.QualityConfig

/** Config model mirroring the reference's JSON layout
  * (`/root/reference/config/config.json`): app block, `pipelines_to_run`,
  * and a per-pipeline spec with source/target, key columns, quality gate and
  * `data_quality` checks. Parsed with Jackson (already on the Spark
  * classpath) — no extra dependencies.
  */
final case class PipelineSpec(
    sourceType: String,
    sourcePath: Option[String],
    sourceTable: Option[String],
    targetType: String,
    targetTable: Option[String],
    targetPath: Option[String],
    writeMode: String,
    partitionCols: Seq[String],
    keyColumns: Seq[String],
    failOnQualityCheck: Boolean,
    dataQuality: QualityConfig)

final case class AppConfig(
    appName: String,
    environment: String,
    pipelinesToRun: Seq[String],
    pipelines: Map[String, PipelineSpec])

object Config {

  def fromJsonFile(path: String): AppConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  def fromJson(json: String): AppConfig = {
    val root = new ObjectMapper().readTree(json)
    val pipelines = Option(root.get("pipelines")).map { ps =>
      ps.properties().asScala.map { e =>
        e.getKey -> parseSpec(e.getValue)
      }.toMap
    }.getOrElse(Map.empty[String, PipelineSpec])
    AppConfig(
      appName = str(root, "app_name").getOrElse("graft"),
      environment = str(root, "environment").getOrElse("local"),
      pipelinesToRun = arr(root, "pipelines_to_run"),
      pipelines = pipelines)
  }

  private def parseSpec(n: JsonNode): PipelineSpec = {
    val dq = Option(n.get("data_quality"))
    PipelineSpec(
      sourceType = str(n, "source_type").getOrElse("s3"),
      sourcePath = str(n, "source_path"),
      sourceTable = str(n, "source_table"),
      targetType = str(n, "target_type").getOrElse("s3"),
      targetTable = str(n, "target_table"),
      targetPath = str(n, "target_path"),
      writeMode = str(n, "write_mode").getOrElse("overwrite"),
      partitionCols = arr(n, "partition_cols"),
      keyColumns = arr(n, "key_columns"),
      failOnQualityCheck =
        Option(n.get("fail_on_quality_check")).forall(_.asBoolean(true)),
      dataQuality = dq.map(parseQuality).getOrElse(QualityConfig()))
  }

  private def parseQuality(n: JsonNode): QualityConfig = {
    val ranges = Option(n.get("range_checks")).map { rc =>
      rc.properties().asScala.map { e =>
        val bounds = e.getValue.elements().asScala.toSeq
        e.getKey -> ((bounds.head.asDouble(), bounds(1).asDouble()))
      }.toMap
    }.getOrElse(Map.empty[String, (Double, Double)])
    QualityConfig(
      tableName = str(n, "table_name").getOrElse("unknown"),
      requiredColumns = arr(n, "required_columns"),
      keyColumns = arr(n, "key_columns"),
      rangeChecks = ranges)
  }

  private def str(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filter(!_.isNull).map(_.asText())

  private def arr(n: JsonNode, f: String): Seq[String] =
    Option(n.get(f)).map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Nil)
}
