package graft.config

import graft.pipeline.{FieldMapping, H3Config}
import YamlLite._

/** datasets.yml semantics (`src/g_etl/config_loader.py:16-91`,
  * `src/g_etl/sql_generator.py:45-113`): pipelines-grouped new format
  * and legacy flat format, flattened to dataset configs with the
  * pipeline id injected; `field_mapping` carries the `$col`/literal
  * convention, per-dataset H3 resolution overrides, and arbitrary
  * extra keys collected into data_mappings.
  */
final case class DatasetConfig(
    datasetId: String,
    pipeline: String,
    name: String = "",
    typ: String = "",
    plugin: String = "",
    url: String = "",
    enabled: Boolean = true,
    sourceIdColumn: String = "",
    geometryColumn: String = "geom",
    h3: H3Config = H3Config(),
    klass: String = "",
    grupp: String = "",
    typField: String = "",
    leverantor: String = "",
    dataMappings: Map[String, String] = Map.empty) {

  /** The normalized-stage FieldMapping for this dataset. */
  def fieldMapping: FieldMapping = {
    val dataKeys = dataMappings.keys.toSeq.sorted.zipWithIndex.map {
      case (k, i) => s"data_${i + 1}" -> dataMappings(k)
    }.toMap
    FieldMapping(Map(
      "source_id" -> sourceIdColumn,
      "klass" -> klass,
      "grupp" -> grupp,
      "typ" -> typField,
      "leverantor" -> leverantor) ++ dataKeys)
  }
}

object ConfigLoader {

  private val knownFieldKeys = Set(
    "source_id_column", "geometry_column",
    "h3_center_resolution", "h3_polyfill_resolution", "h3_line_resolution",
    "h3_point_resolution", "h3_line_buffer_meters",
    "klass", "grupp", "typ", "leverantor", "data_mappings")

  def loadDatasets(yamlText: String): Seq[DatasetConfig] = {
    val root = YamlLite.parse(yamlText) match {
      case m: YMap => m
      case _ => return Seq.empty
    }
    root.get("pipelines") match {
      case Some(YList(pipelines)) =>
        // new format: pipelines: [{id, name, datasets: [...]}]
        pipelines.flatMap {
          case p: YMap =>
            val pid = strOf(p, "id")
            listOf(p, "datasets").map(ds => parseDataset(ds, pid))
          case _ => Vector.empty
        }
      case _ =>
        // legacy flat format: datasets: [{id, pipeline, ...}]
        root.get("datasets") match {
          case Some(YList(ds)) =>
            ds.collect { case m: YMap => parseDataset(m, strOf(m, "pipeline")) }
          case _ => Seq.empty
        }
    }
  }

  /** enabled/typ/id filtering (src/g_etl/pipeline.py:124-150). */
  def filtered(all: Seq[DatasetConfig], onlyEnabled: Boolean = true,
      typ: Option[String] = None, ids: Seq[String] = Nil): Seq[DatasetConfig] =
    all
      .filter(d => !onlyEnabled || d.enabled)
      .filter(d => typ.forall(_ == d.typ))
      .filter(d => ids.isEmpty || ids.contains(d.datasetId))

  private def parseDataset(node: Node, pipeline: String): DatasetConfig = {
    val m = node.asInstanceOf[YMap]
    val fm = m.get("field_mapping") match {
      case Some(f: YMap) => f
      case _ => YMap(Vector.empty)
    }
    val defaults = H3Config()
    val extra = (fm.get("data_mappings") match {
      case Some(dm: YMap) => dm.entries.map { case (k, v) => k -> scalarStr(v) }.toMap
      case _ => Map.empty[String, String]
    }) ++ fm.entries.collect {
      case (k, v) if !knownFieldKeys.contains(k) && scalarDefined(v) =>
        k -> scalarStr(v)
    }
    DatasetConfig(
      datasetId = strOf(m, "id"),
      pipeline = pipeline,
      name = strOf(m, "name"),
      typ = strOf(m, "typ"),
      plugin = strOf(m, "plugin"),
      url = strOf(m, "url"),
      enabled = m.get("enabled") match {
        case Some(YScalar(Some(b: Boolean))) => b
        case _ => true
      },
      sourceIdColumn = strOf(fm, "source_id_column"),
      geometryColumn = strOf(fm, "geometry_column", "geom"),
      h3 = H3Config(
        centerRes = intOf(fm, "h3_center_resolution", defaults.centerRes),
        polygonRes = intOf(fm, "h3_polyfill_resolution", defaults.polygonRes),
        lineRes = intOf(fm, "h3_line_resolution", defaults.lineRes),
        lineBufferM = intOf(fm, "h3_line_buffer_meters",
          defaults.lineBufferM.toInt).toDouble,
        pointRes = intOf(fm, "h3_point_resolution", defaults.pointRes)),
      klass = strOf(fm, "klass"),
      grupp = strOf(fm, "grupp"),
      typField = strOf(fm, "typ"),
      leverantor = strOf(fm, "leverantor"),
      dataMappings = extra)
  }

  private def scalarDefined(n: Node): Boolean = n match {
    case YScalar(Some(_)) => true
    case _ => false
  }

  private def scalarStr(n: Node): String = n match {
    case s: YScalar => s.asString
    case _ => ""
  }

  private def strOf(m: YMap, k: String, default: String = ""): String =
    m.get(k) match {
      case Some(s: YScalar) if s.value.isDefined => s.asString
      case _ => default
    }

  private def intOf(m: YMap, k: String, default: Int): Int =
    m.get(k) match {
      case Some(YScalar(Some(i: Int))) => i
      case Some(YScalar(Some(l: Long))) => l.toInt
      case Some(YScalar(Some(d: Double))) => d.toInt
      case _ => default
    }

  private def listOf(m: YMap, k: String): Vector[Node] =
    m.get(k) match {
      case Some(YList(xs)) => xs
      case _ => Vector.empty
    }
}
