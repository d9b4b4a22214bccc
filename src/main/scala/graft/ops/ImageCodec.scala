package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GeoExpr

/** Pure-JVM image HEADER codec: width/height/channels from the
  * published container formats (PNG IHDR — RFC 2083 §4.1.1; JPEG
  * SOFn segments — ITU-T T.81 §B.2.2; GIF logical screen descriptor —
  * GIF89a spec §18). No pixel decoding — this container ships no image
  * libraries — but the METADATA extraction is real: it parses actual
  * byte layouts, not digests, so corrupt or foreign payloads yield SQL
  * NULL instead of fabricated dimensions.
  *
  * The matching minimal encoders exist so fixtures can generate valid
  * headers with known dimensions (CRC-correct PNG chunks, well-formed
  * JPEG segment chains) and oracles can predict the decoded values by
  * arithmetic.
  */
object ImageCodec {

  final case class Meta(format: String, width: Int, height: Int, channels: Int)

  private val PngSig = Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  // ------------------------------------------------------------ decode

  def decode(b: Array[Byte]): Option[Meta] =
    decodePng(b).orElse(decodeJpeg(b)).orElse(decodeGif(b))

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  /** PNG: 8-byte signature, then the IHDR chunk MUST come first
    * (RFC 2083 §4.1.1): length(4) "IHDR" width(4) height(4)
    * bitdepth(1) colortype(1) ... */
  private def decodePng(b: Array[Byte]): Option[Meta] = {
    if (b.length < 33 || !b.take(8).sameElements(PngSig)) return None
    val chunkType = new String(b, 12, 4, "US-ASCII")
    if (chunkType != "IHDR" || be32(b, 8) != 13) return None
    val colorType = b(25) & 0xFF
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    Some(Meta("png", be32(b, 16), be32(b, 20), channels))
  }

  /** JPEG: SOI marker then a segment chain; dimensions live in the
    * first SOFn (start-of-frame) segment: FF C0..CF (minus C4/C8/CC)
    * [len 2][precision 1][height 2][width 2][components 1]. */
  private def decodeJpeg(b: Array[Byte]): Option[Meta] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return None
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xFF) != 0xFF) return None // desynced segment chain
      if ((b(i + 1) & 0xFF) == 0xFF) {
        // fill bytes: any number of 0xFF may pad before a marker
        // (ITU-T T.81 §B.1.1.2) — skip, don't parse one as a marker
        i += 1
      } else {
        val marker = b(i + 1) & 0xFF
        if (marker == 0xD9 || marker == 0xDA) return None // EOI / scan data
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (len < 8) return None
          return Some(Meta("jpeg", be16(b, i + 7), be16(b, i + 5), b(i + 9) & 0xFF))
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF87a/89a: 6-byte signature then width/height little-endian.
    * Pixels are palette-indexed; report the 3 RGB channels the palette
    * resolves to. */
  private def decodeGif(b: Array[Byte]): Option[Meta] = {
    if (b.length < 10) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    Some(Meta("gif",
      (b(6) & 0xFF) | ((b(7) & 0xFF) << 8),
      (b(8) & 0xFF) | ((b(9) & 0xFF) << 8), 3))
  }

  // ------------------------------------------------------------ encode

  /** Minimal VALID PNG: signature + CRC-correct IHDR + IEND (no image
    * data chunks — a header-only fixture, fine for metadata paths). */
  def pngBytes(width: Int, height: Int, colorType: Int = 2): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    def writeChunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array[Byte](((len >> 24) & 0xFF).toByte, ((len >> 16) & 0xFF).toByte,
        ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte), 0, 4)
      val typeBytes = ctype.getBytes("US-ASCII")
      out.write(typeBytes, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(typeBytes)
      crc.update(data)
      val c = crc.getValue
      out.write(Array[Byte](((c >> 24) & 0xFF).toByte, ((c >> 16) & 0xFF).toByte,
        ((c >> 8) & 0xFF).toByte, (c & 0xFF).toByte), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((width >> 24) & 0xFF).toByte
    ihdr(1) = ((width >> 16) & 0xFF).toByte
    ihdr(2) = ((width >> 8) & 0xFF).toByte
    ihdr(3) = (width & 0xFF).toByte
    ihdr(4) = ((height >> 24) & 0xFF).toByte
    ihdr(5) = ((height >> 16) & 0xFF).toByte
    ihdr(6) = ((height >> 8) & 0xFF).toByte
    ihdr(7) = (height & 0xFF).toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // compression 0, filter 0, interlace 0 already zeroed
    writeChunk("IHDR", ihdr)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Minimal well-formed JPEG: SOI + SOF0 (baseline) + EOI. */
  def jpegBytes(width: Int, height: Int, channels: Int = 3): Array[Byte] = {
    val segLen = 8 + 3 * channels
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8) // SOI
    out.write(0xFF); out.write(0xC0) // SOF0
    out.write((segLen >> 8) & 0xFF); out.write(segLen & 0xFF)
    out.write(8) // precision
    out.write((height >> 8) & 0xFF); out.write(height & 0xFF)
    out.write((width >> 8) & 0xFF); out.write(width & 0xFF)
    out.write(channels)
    var c = 0
    while (c < channels) {
      out.write(c + 1) // component id
      out.write(0x11)  // 1x1 sampling
      out.write(0)     // quant table
      c += 1
    }
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------- expressions

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  /** image_meta(payload) -> struct(format, width, height, channels);
    * NULL for payloads that are not a recognized image container. */
  case class ImageMetaExpr(payload: Expression) extends GeoExpr {
    override def children: Seq[Expression] = Seq(payload)
    override def dataType: DataType = metaSchema
    override protected def evalNotNull(a: Array[Any]): Any =
      decode(a(0).asInstanceOf[Array[Byte]]) match {
        case Some(m) => new GenericInternalRow(Array[Any](
          UTF8String.fromString(m.format), m.width, m.height, m.channels))
        case None => null
      }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(payload = c(0))
  }

  /** image_fixture(format, width, height) -> minimal valid header bytes
    * (fixture generator for tests/oracles; format 'png' | 'jpeg' |
    * 'jpeg_gray'). */
  case class ImageFixtureExpr(format: Expression, wpx: Expression,
      hpx: Expression) extends GeoExpr {
    override def children: Seq[Expression] = Seq(format, wpx, hpx)
    override def dataType: DataType = BinaryType
    override protected def evalNotNull(a: Array[Any]): Any =
      str(a(0)) match {
        case "png" => pngBytes(int(a(1)), int(a(2)))
        case "jpeg" => jpegBytes(int(a(1)), int(a(2)))
        case "jpeg_gray" => jpegBytes(int(a(1)), int(a(2)), channels = 1)
        case _ => null
      }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(format = c(0), wpx = c(1), hpx = c(2))
  }

  def image_meta(payload: Column): Column = toCol(ImageMetaExpr(toExpr(payload)))

  def image_fixture(format: Column, width: Column, height: Column): Column =
    toCol(ImageFixtureExpr(toExpr(format), toExpr(width), toExpr(height)))
}
