package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GeoExpr

/** Pure-JVM audio HEADER codec, the audio sibling of [[ImageCodec]]:
  * sample rate / channels / bit depth / duration from the published
  * container formats (WAV — RIFF/WAVE `fmt ` + `data` chunks, original
  * Microsoft/IBM spec; FLAC — STREAMINFO metadata block, flac format
  * spec §9). No sample decoding — this container ships no audio
  * libraries — but the METADATA extraction is real byte-layout parsing:
  * corrupt or foreign payloads yield SQL NULL, never fabricated rates.
  *
  * Matching minimal encoders generate valid fixtures with known
  * parameters so oracles can predict every decoded field by arithmetic.
  */
object AudioCodec {

  final case class Meta(format: String, sampleRate: Int, channels: Int,
      bitsPerSample: Int, durationMs: Long)

  // ------------------------------------------------------------ decode

  def decode(b: Array[Byte]): Option[Meta] =
    decodeWav(b).orElse(decodeFlac(b))

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, "US-ASCII")

  /** WAV: "RIFF" size "WAVE", then a chunk walk; `fmt ` carries
    * format(2) channels(2) sampleRate(4) byteRate(4) blockAlign(2)
    * bitsPerSample(2); `data`'s size + byteRate give the duration. */
  private def decodeWav(b: Array[Byte]): Option[Meta] = {
    if (b.length < 44 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
      return None
    var pos = 12
    var rate = -1; var ch = -1; var bps = -1; var byteRate = -1
    var dataLen = -1L
    while (pos + 8 <= b.length) {
      val id = ascii(b, pos, 4)
      val size = le32(b, pos + 4).toLong & 0xFFFFFFFFL
      if (id == "fmt " && pos + 8 + 16 <= b.length) {
        val audioFormat = le16(b, pos + 8)
        // PCM or IEEE float or the extensible wrapper
        if (audioFormat != 1 && audioFormat != 3 && audioFormat != 0xFFFE)
          return None
        ch = le16(b, pos + 10)
        rate = le32(b, pos + 12)
        byteRate = le32(b, pos + 16)
        bps = le16(b, pos + 22)
      } else if (id == "data") {
        dataLen = size
      }
      // advance in Long: `pos + 8 + size` can exceed Int.MaxValue for
      // crafted sizes near 2^31, and an Int wrap would turn a corrupt
      // header into an IndexOutOfBounds task kill instead of SQL NULL
      val next = pos.toLong + 8L + size + (size & 1L) // chunks are word-aligned
      pos = if (next > b.length) b.length else next.toInt
    }
    if (rate <= 0 || ch <= 0 || bps <= 0) None
    else {
      val dur =
        if (dataLen < 0 || byteRate <= 0) 0L else dataLen * 1000L / byteRate
      Some(Meta("wav", rate, ch, bps, dur))
    }
  }

  /** FLAC: "fLaC" magic then metadata blocks; STREAMINFO (type 0, MUST
    * be first) packs sampleRate(20) channels-1(3) bps-1(5)
    * totalSamples(36) big-endian starting at byte 10 of the block. */
  private def decodeFlac(b: Array[Byte]): Option[Meta] = {
    if (b.length < 42 || ascii(b, 0, 4) != "fLaC") return None
    if ((b(4) & 0x7F) != 0) return None // first block must be STREAMINFO
    val len = ((b(5) & 0xFF) << 16) | ((b(6) & 0xFF) << 8) | (b(7) & 0xFF)
    if (len < 34 || 8 + len > b.length) return None
    val o = 8 + 10 // skip block sizes (4) + frame sizes (6)
    val rate = ((b(o) & 0xFF) << 12) | ((b(o + 1) & 0xFF) << 4) |
      ((b(o + 2) & 0xF0) >> 4)
    val ch = ((b(o + 2) & 0x0E) >> 1) + 1
    val bps = (((b(o + 2) & 0x01) << 4) | ((b(o + 3) & 0xF0) >> 4)) + 1
    val totalSamples = ((b(o + 3) & 0x0FL) << 32) | ((b(o + 4) & 0xFFL) << 24) |
      ((b(o + 5) & 0xFFL) << 16) | ((b(o + 6) & 0xFFL) << 8) | (b(o + 7) & 0xFFL)
    if (rate <= 0) None
    else Some(Meta("flac", rate, ch, bps, totalSamples * 1000L / rate))
  }

  // ------------------------------------------------------------ encode

  /** Minimal valid PCM WAV: RIFF/WAVE + fmt + data header with
    * `nSamples` zeroed samples (so duration is predictable). */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    val dataLen = nSamples * blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1) // PCM
    w16(channels); w32(sampleRate); w32(byteRate)
    w16(blockAlign); w16(bitsPerSample)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    out.write(new Array[Byte](dataLen), 0, dataLen)
    out.toByteArray
  }

  /** Minimal valid FLAC header: magic + last-block STREAMINFO (34
    * bytes) with the given stream parameters; no audio frames. */
  def flacBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80) // last-metadata-block flag + type 0 (STREAMINFO)
    out.write(0); out.write(0); out.write(34)
    val si = new Array[Byte](34)
    // min/max block size (16+16) and frame sizes (24+24): leave zero
    si(10) = ((sampleRate >> 12) & 0xFF).toByte
    si(11) = ((sampleRate >> 4) & 0xFF).toByte
    si(12) = (((sampleRate & 0x0F) << 4) | (((channels - 1) & 0x07) << 1) |
      (((bitsPerSample - 1) >> 4) & 0x01)).toByte
    si(13) = ((((bitsPerSample - 1) & 0x0F) << 4) |
      ((totalSamples >> 32) & 0x0F)).toByte
    si(14) = ((totalSamples >> 24) & 0xFF).toByte
    si(15) = ((totalSamples >> 16) & 0xFF).toByte
    si(16) = ((totalSamples >> 8) & 0xFF).toByte
    si(17) = (totalSamples & 0xFF).toByte
    out.write(si, 0, 34)
    out.toByteArray
  }

  // ------------------------------------------------------- expressions

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("duration_ms", LongType)))

  /** audio_meta(payload) -> struct(format, sample_rate, channels,
    * bits_per_sample, duration_ms); NULL for unrecognized payloads. */
  case class AudioMetaExpr(payload: Expression) extends GeoExpr {
    override def children: Seq[Expression] = Seq(payload)
    override def dataType: DataType = metaSchema
    override protected def evalNotNull(a: Array[Any]): Any =
      decode(a(0).asInstanceOf[Array[Byte]]) match {
        case Some(m) => new GenericInternalRow(Array[Any](
          UTF8String.fromString(m.format), m.sampleRate, m.channels,
          m.bitsPerSample, m.durationMs))
        case None => null
      }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(payload = c(0))
  }

  /** audio_fixture(format, sample_rate, n_samples) -> minimal valid
    * header bytes; format 'wav' | 'wav_stereo' | 'flac'. */
  case class AudioFixtureExpr(format: Expression, rate: Expression,
      nSamples: Expression) extends GeoExpr {
    override def children: Seq[Expression] = Seq(format, rate, nSamples)
    override def dataType: DataType = BinaryType
    override protected def evalNotNull(a: Array[Any]): Any =
      str(a(0)) match {
        case "wav" => wavBytes(int(a(1)), 1, 16, int(a(2)))
        case "wav_stereo" => wavBytes(int(a(1)), 2, 16, int(a(2)))
        case "flac" => flacBytes(int(a(1)), 2, 16, int(a(2)).toLong)
        case _ => null
      }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(format = c(0), rate = c(1), nSamples = c(2))
  }

  def audio_meta(payload: Column): Column = toCol(AudioMetaExpr(toExpr(payload)))

  def audio_fixture(format: Column, rate: Column, nSamples: Column): Column =
    toCol(AudioFixtureExpr(toExpr(format), toExpr(rate), toExpr(nSamples)))
}
