package graft.spatial

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import scala.jdk.CollectionConverters._

/** GeoJSON geometry codec (RFC 7946) over the engine's Geom model —
  * used by the WFS/GeoJSON sources (`src/g_etl/plugins/wfs.py:17-201`)
  * and the GeoJSON exporter (`src/g_etl/export.py:129-158`). Built on
  * Jackson, which ships with Spark.
  */
object GeoJson {

  private val mapper = new ObjectMapper()

  def parseGeometry(json: String): Geom =
    fromNode(mapper.readTree(json))

  def fromNode(n: JsonNode): Geom = {
    val t = n.path("type").asText()
    val coords = n.path("coordinates")
    t match {
      case "Point" => pt(coords)
      case "LineString" => Line(line(coords))
      case "Polygon" => Poly(rings(coords))
      case "MultiPoint" => MultiPt(line(coords))
      case "MultiLineString" =>
        MultiLine(coords.elements().asScala.map(c => Line(line(c))).toArray)
      case "MultiPolygon" =>
        MultiPoly(coords.elements().asScala.map(c => Poly(rings(c))).toArray)
      case "GeometryCollection" =>
        GeomColl(n.path("geometries").elements().asScala.map(fromNode).toArray)
      case other =>
        throw new IllegalArgumentException(s"unsupported GeoJSON type: $other")
    }
  }

  private def pt(c: JsonNode): Pt =
    Pt(c.get(0).asDouble(), c.get(1).asDouble())

  private def line(c: JsonNode): Array[Pt] =
    c.elements().asScala.map(pt).toArray

  private def rings(c: JsonNode): Array[Array[Pt]] =
    c.elements().asScala.map(line).toArray

  def toGeometryJson(g: Geom): String =
    mapper.writeValueAsString(toNode(g))

  def toNode(g: Geom): ObjectNode = {
    val node = mapper.createObjectNode()
    def coordsOf(pts: Array[Pt]): ArrayNode = {
      val arr = mapper.createArrayNode()
      pts.foreach { p =>
        val pc = mapper.createArrayNode()
        pc.add(p.x).add(p.y)
        arr.add(pc)
      }
      arr
    }
    g match {
      case Pt(x, y) =>
        node.put("type", "Point")
        val pc = mapper.createArrayNode(); pc.add(x).add(y)
        node.set[ObjectNode]("coordinates", pc)
      case Line(pts) =>
        node.put("type", "LineString")
        node.set[ObjectNode]("coordinates", coordsOf(pts))
      case Poly(rs) =>
        node.put("type", "Polygon")
        val arr = mapper.createArrayNode()
        rs.foreach(r => arr.add(coordsOf(r)))
        node.set[ObjectNode]("coordinates", arr)
      case MultiPt(pts) =>
        node.put("type", "MultiPoint")
        node.set[ObjectNode]("coordinates", coordsOf(pts))
      case MultiLine(ls) =>
        node.put("type", "MultiLineString")
        val arr = mapper.createArrayNode()
        ls.foreach(l => arr.add(coordsOf(l.pts)))
        node.set[ObjectNode]("coordinates", arr)
      case MultiPoly(ps) =>
        node.put("type", "MultiPolygon")
        val arr = mapper.createArrayNode()
        ps.foreach { p =>
          val pr = mapper.createArrayNode()
          p.rings.foreach(r => pr.add(coordsOf(r)))
          arr.add(pr)
        }
        node.set[ObjectNode]("coordinates", arr)
      case GeomColl(gs) =>
        node.put("type", "GeometryCollection")
        val arr = mapper.createArrayNode()
        gs.foreach(x => arr.add(toNode(x)))
        node.set[ObjectNode]("geometries", arr)
    }
    node
  }

  /** Parse a FeatureCollection into (properties-as-strings, geometry)
    * rows — the WFS page shape. */
  def parseFeatureCollection(json: String): Seq[(Map[String, String], Option[Geom])] = {
    val root = mapper.readTree(json)
    root.path("features").elements().asScala.map { f =>
      val props = Option(f.get("properties")).map { p =>
        p.properties().asScala.map { e =>
          val v = e.getValue
          e.getKey -> (if (v.isNull) null else v.asText())
        }.toMap
      }.getOrElse(Map.empty[String, String])
      val geom = Option(f.get("geometry")).filterNot(_.isNull).map(fromNode)
      (props, geom)
    }.toSeq
  }

  /** Emit a FeatureCollection string from rows. */
  def featureCollection(features: Seq[(Map[String, Any], Geom)]): String = {
    val root = mapper.createObjectNode()
    root.put("type", "FeatureCollection")
    val arr = mapper.createArrayNode()
    features.foreach { case (props, geom) =>
      val f = mapper.createObjectNode()
      f.put("type", "Feature")
      val p = mapper.createObjectNode()
      props.foreach {
        case (k, null) => p.putNull(k)
        case (k, v: Int) => p.put(k, v)
        case (k, v: Long) => p.put(k, v)
        case (k, v: Double) => p.put(k, v)
        case (k, v: Boolean) => p.put(k, v)
        case (k, v) => p.put(k, v.toString)
      }
      f.set[ObjectNode]("properties", p)
      f.set[ObjectNode]("geometry", toNode(geom))
      arr.add(f)
    }
    root.set[ObjectNode]("features", arr)
    mapper.writeValueAsString(root)
  }
}
