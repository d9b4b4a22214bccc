package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

import graft.sinks.FlatBuffers._
import graft.spatial.{Geom, Geometry, GeomColl, Line, MultiLine, MultiPoly,
  MultiPt, Poly, Pt}

/** FlatGeobuf writer + reader implementing the published format
  * (flatgeobuf.org: magic bytes, size-prefixed Header flatbuffer,
  * size-prefixed Feature records; `ends` in coordinate-pair units;
  * properties as [u16 column index][LE value] bytes). No spatial index
  * (index_node_size = 0) — FGB readers treat the index as optional.
  *
  * The reference exports FlatGeobuf through GDAL (`src/g_etl/
  * export.py:344-521`); this is a native implementation like the
  * GeoPackage pair, validated by write->read round-trip specs.
  */
object FlatGeobuf {

  val Magic: Array[Byte] =
    Array(0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x01).map(_.toByte)

  // GeometryType enum (geometry.fbs)
  private val GtUnknown = 0
  private val GtPoint = 1
  private val GtLine = 2
  private val GtPolygon = 3
  private val GtMultiPoint = 4
  private val GtMultiLine = 5
  private val GtMultiPolygon = 6

  // ColumnType enum (header.fbs)
  private val CtBool = 2
  private val CtLong = 7
  private val CtDouble = 10
  private val CtString = 11
  private val CtBinary = 14

  // ------------------------------------------------------------ write

  def write(df: DataFrame, path: String, layerName: String,
      geomCol: String = "geom", srsCode: Int = GeopackageWriter.DefaultSrsId,
      limit: Int = 1000000): Unit = {
    val schema = df.schema
    val gIdx = schema.fieldNames.indexOf(geomCol)
    require(gIdx >= 0, s"geometry column $geomCol not in schema")
    val attrs = schema.fields.zipWithIndex.filter(_._2 != gIdx)
    def colType(dt: DataType): Int = dt match {
      case BooleanType => CtBool
      case LongType | IntegerType | ShortType | ByteType => CtLong
      case DoubleType | FloatType => CtDouble
      case BinaryType => CtBinary
      case _ => CtString
    }
    val rows = df.limit(limit).collect()

    val geoms = rows.map { r =>
      r.get(gIdx) match {
        case wkb: Array[Byte] => Geometry.fromWkb(wkb)
        case _ => null
      }
    }
    val gtypes = geoms.filter(_ != null).map(g => fgbType(g)).distinct
    val headerGt = if (gtypes.length == 1) gtypes(0) else GtUnknown
    var (minX, minY, maxX, maxY) =
      (Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)
    geoms.filter(_ != null)
      .flatMap(g => GeopackageWriter.envelope(g)).foreach {
        case (x0, y0, x1, y1) =>
          minX = math.min(minX, x0); minY = math.min(minY, y0)
          maxX = math.max(maxX, x1); maxY = math.max(maxY, y1)
      }

    val columns = VecRef(attrs.toSeq.map { case (f, _) =>
      Table(Seq(
        Ref(0, Str(f.name)),
        U8(1, colType(f.dataType))))
    })
    val header = Table(Seq(
      Ref(0, Str(layerName)),
      Ref(1, VecD(
        if (minX == Double.MaxValue) Array.empty
        else Array(minX, minY, maxX, maxY))),
      U8(2, headerGt),
      Ref(7, columns),
      U64(8, rows.length.toLong),
      U16(9, 0, default = 16), // no spatial index
      Ref(10, Table(Seq(
        Ref(0, Str("EPSG")),
        I32(1, srsCode))))))

    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    out.write(sizePrefixed(header))
    rows.zip(geoms).foreach { case (r, g) =>
      val props = new ArrayBuffer[Byte]()
      def le16(v: Int): Unit = { props += (v & 0xFF).toByte; props += ((v >> 8) & 0xFF).toByte }
      def le32(v: Int): Unit = { le16(v); le16(v >> 16) }
      def le64(v: Long): Unit = { le32(v.toInt); le32((v >> 32).toInt) }
      attrs.zipWithIndex.foreach { case ((f, srcIdx), colIdx) =>
        val v = r.get(srcIdx)
        if (v != null) {
          f.dataType match {
            case BooleanType =>
              le16(colIdx); props += (if (v.asInstanceOf[Boolean]) 1 else 0).toByte
            case LongType | IntegerType | ShortType | ByteType =>
              le16(colIdx); le64(v match {
                case l: Long => l
                case i: Int => i.toLong
                case s: Short => s.toLong
                case b: Byte => b.toLong
              })
            case DoubleType | FloatType =>
              le16(colIdx)
              le64(java.lang.Double.doubleToLongBits(v match {
                case d: Double => d
                case f2: Float => f2.toDouble
              }))
            case BinaryType =>
              val b = v.asInstanceOf[Array[Byte]]
              le16(colIdx); le32(b.length); props ++= b
            case _ =>
              val b = String.valueOf(v).getBytes("UTF-8")
              le16(colIdx); le32(b.length); props ++= b
          }
        }
      }
      val fields = ArrayBuffer[Field]()
      if (g != null) fields += Ref(0, geomNode(g))
      if (props.nonEmpty) fields += Ref(1, VecB(props.toArray))
      out.write(sizePrefixed(Table(fields.toSeq)))
    }
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, out.toByteArray)
  }

  private def fgbType(g: Geom): Int = g match {
    case _: Pt => GtPoint
    case _: Line => GtLine
    case _: Poly => GtPolygon
    case _: MultiPt => GtMultiPoint
    case _: MultiLine => GtMultiLine
    case _: MultiPoly => GtMultiPolygon
    case _ => GtUnknown
  }

  private def flatXY(chains: Array[Array[Pt]]): (Array[Double], Array[Int]) = {
    val xy = new ArrayBuffer[Double]()
    val ends = new ArrayBuffer[Int]()
    var total = 0
    chains.foreach { c =>
      c.foreach { p => xy += p.x; xy += p.y }
      total += c.length
      ends += total // coordinate-pair units
    }
    (xy.toArray, ends.toArray)
  }

  /** Geometry node; multi-part geometries use `parts` sub-geometries,
    * ring'd/part'd single geometries use ends. */
  private def geomNode(g: Geom): Table = g match {
    case p: Pt =>
      Table(Seq(Ref(1, VecD(Array(p.x, p.y))), U8(6, GtPoint)))
    case Line(pts) =>
      val (xy, _) = flatXY(Array(pts))
      Table(Seq(Ref(1, VecD(xy)), U8(6, GtLine)))
    case Poly(rings) =>
      val (xy, ends) = flatXY(rings)
      Table(Seq(
        Ref(0, VecU32(if (rings.length > 1) ends else Array.empty)),
        Ref(1, VecD(xy)), U8(6, GtPolygon)))
    case MultiPt(pts) =>
      val (xy, _) = flatXY(Array(pts))
      Table(Seq(Ref(1, VecD(xy)), U8(6, GtMultiPoint)))
    case MultiLine(lines) =>
      val (xy, ends) = flatXY(lines.map(_.pts))
      Table(Seq(
        Ref(0, VecU32(if (lines.length > 1) ends else Array.empty)),
        Ref(1, VecD(xy)), U8(6, GtMultiLine)))
    case MultiPoly(polys) =>
      Table(Seq(
        U8(6, GtMultiPolygon),
        Ref(7, VecRef(polys.toSeq.map(p => geomNode(p))))))
    case GeomColl(gs) =>
      Table(Seq(
        U8(6, 7),
        Ref(7, VecRef(gs.toSeq.map(geomNode)))))
  }

  // ------------------------------------------------------------- read

  final case class FgbColumn(name: String, colType: Int)
  final case class FgbLayer(name: String, envelope: Array[Double],
      geometryType: Int, columns: Seq[FgbColumn], featuresCount: Long,
      crsOrg: String, crsCode: Int)

  def read(path: String): (FgbLayer, Seq[(Geom, Map[String, Any])]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    // full magic check: both 'fgb' triplets AND the spec major version
    // byte (offset 3) == 3 — incompatible future-version or corrupted
    // files must not be parsed as if valid (byte 7, the patch version,
    // is allowed to differ per spec)
    require(bytes.length > 8 &&
      Seq(0, 1, 2, 4, 5, 6).forall(i => bytes(i) == Magic(i)),
      "not a FlatGeobuf file")
    require(bytes(3) == Magic(3),
      s"unsupported FlatGeobuf spec version ${bytes(3)} (expected 3)")
    val (header, afterHeader) = readSizePrefixed(bytes, 8)
    val nCols = header.vecLen(7)
    val cols = (0 until nCols).map { i =>
      val c = header.vecTable(7, i)
      FgbColumn(c.str(0), c.u8(1))
    }
    val crs = header.table(10)
    val layer = FgbLayer(header.str(0), header.vecD(1), header.u8(2), cols,
      header.u64(8), if (crs == null) null else crs.str(0),
      if (crs == null) 0 else crs.i32(1))
    val feats = new ArrayBuffer[(Geom, Map[String, Any])]()
    var at = afterHeader
    while (at < bytes.length) {
      val (ft, next) = readSizePrefixed(bytes, at)
      val geomTab = ft.table(0)
      val geom = if (geomTab == null) null else readGeom(geomTab)
      val props = parseProps(ft.vecBytes(1), cols)
      feats += ((geom, props))
      at = next
    }
    (layer, feats.toSeq)
  }

  private def readGeom(t: Tab): Geom = {
    val gt = t.u8(6)
    gt match {
      case GtMultiPolygon =>
        MultiPoly((0 until t.vecLen(7))
          .map(i => readGeom(t.vecTable(7, i)).asInstanceOf[Poly]).toArray)
      case 7 =>
        GeomColl((0 until t.vecLen(7)).map(i => readGeom(t.vecTable(7, i))).toArray)
      case _ =>
        val xy = t.vecD(1)
        val pts = Array.tabulate(xy.length / 2)(i => Pt(xy(2 * i), xy(2 * i + 1)))
        val ends0 = t.vecU32(0)
        val ends = if (ends0.isEmpty) Array(pts.length) else ends0
        def chains: Array[Array[Pt]] = {
          var from = 0
          ends.map { e => val c = pts.slice(from, e); from = e; c }
        }
        gt match {
          case GtPoint => pts(0)
          case GtLine => Line(pts)
          case GtPolygon => Poly(chains)
          case GtMultiPoint => MultiPt(pts)
          case GtMultiLine => MultiLine(chains.map(Line))
          case other => throw new IllegalArgumentException(s"geometry type $other")
        }
    }
  }

  private def parseProps(bytes: Array[Byte],
      cols: Seq[FgbColumn]): Map[String, Any] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.Map[String, Any]()
    while (bb.remaining() >= 2) {
      val idx = bb.getShort & 0xFFFF
      val c = cols(idx)
      c.colType match {
        case CtBool => out(c.name) = bb.get() != 0
        case CtLong => out(c.name) = bb.getLong
        case CtDouble => out(c.name) = bb.getDouble
        case CtBinary =>
          val n = bb.getInt
          val b = new Array[Byte](n); bb.get(b); out(c.name) = b
        case _ =>
          val n = bb.getInt
          val b = new Array[Byte](n); bb.get(b)
          out(c.name) = new String(b, "UTF-8")
      }
    }
    out.toMap
  }
}
