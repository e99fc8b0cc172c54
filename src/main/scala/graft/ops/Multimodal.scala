package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY payloads
  * with typed metadata, processed per-partition (SURVEY extended
  * scope).
  *
  * The container ships no image/audio libraries, so the *codec* is a
  * deterministic fake — a tiny self-describing header followed by raw
  * bytes ("GIMG" | width | height | channels | payload). Everything
  * around the codec is real and is what matters at 100 TB:
  *
  *  - schema: `(media_id LONG, kind STRING, data BINARY,
  *    meta STRUCT<width INT, height INT, channels INT>)`
  *  - decode runs INSIDE mapPartitions (the Scala analog of
  *    mapInPandas): one JVM object reused per partition, bytes never
  *    round-trip through the driver, output is again a typed Dataset.
  *  - per-row failure containment: corrupt payloads yield a null meta
  *    + error kind, they do not kill the job.
  *  - partitioning: payloads are opaque blobs; operators repartition
  *    by media_id so a skewed handful of 100 MB videos cannot pile
  *    onto one task.
  *
  * A real deployment swaps [[FakeCodec.decodePixels]] for an actual
  * decoder (JNI/javacpp); every signature stays the same.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int)
  final case class Media(media_id: Long, kind: String, data: Array[Byte])
  final case class Decoded(media_id: Long, kind: String,
                           meta: Option[MediaMeta], pixels: Array[Byte])
  final case class Features(media_id: Long, width: Int, height: Int,
                            channels: Int, n_bytes: Long, mean_byte: Double,
                            histogram: Array[Long])

  /** The fake container format: ASCII header `GIMG|w|h|c|` + payload.
    * Header parsing, bounds checks and byte math are real; only the
    * "pixels" themselves are whatever bytes the producer supplied. */
  object FakeCodec {
    val Magic = "GIMG"

    def encode(width: Int, height: Int, channels: Int, payload: Array[Byte]): Array[Byte] = {
      val header = s"$Magic|$width|$height|$channels|".getBytes(StandardCharsets.US_ASCII)
      header ++ payload
    }

    /** Parse header + return (meta, pixel bytes); None on malformed
      * input (wrong magic, non-numeric dims, truncated header). */
    def decodePixels(data: Array[Byte]): Option[(MediaMeta, Array[Byte])] = {
      if (data == null || data.length < 5) return None
      val headEnd = {
        var bars = 0; var i = 0
        while (i < data.length && bars < 4) { if (data(i) == '|') bars += 1; i += 1 }
        if (bars == 4) i else return None
      }
      val head = new String(data, 0, headEnd, StandardCharsets.US_ASCII).split("\\|")
      if (head.length < 4 || head(0) != Magic) return None
      try {
        val meta = MediaMeta(head(1).toInt, head(2).toInt, head(3).toInt)
        if (meta.width <= 0 || meta.height <= 0 || meta.channels <= 0) None
        else Some((meta, data.drop(headEnd)))
      } catch { case _: NumberFormatException => None }
    }
  }

  /** Decode a media Dataset per-partition; corrupt rows survive with
    * meta = None and kind suffixed `:corrupt`. */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        FakeCodec.decodePixels(m.data) match {
          case Some((meta, px)) => Decoded(m.media_id, m.kind, Some(meta), px)
          case None => Decoded(m.media_id, s"${m.kind}:corrupt", None, Array.emptyByteArray)
        }
      }
    }
  }

  /** Feature extraction over decoded pixels: real byte statistics
    * (mean, 16-bin histogram) — the shape a real embedding/feature
    * stage has: Dataset in, fixed-width vector out, zero shuffle. */
  def features(decoded: Dataset[Decoded]): Dataset[Features] = {
    import decoded.sparkSession.implicits._
    decoded.flatMap { d =>
      d.meta.map { meta =>
        val px = d.pixels
        var sum = 0L
        val hist = new Array[Long](16)
        var i = 0
        while (i < px.length) {
          val b = px(i) & 0xff
          sum += b
          hist(b >> 4) += 1
          i += 1
        }
        val mean = if (px.length == 0) 0.0 else sum.toDouble / px.length
        Features(d.media_id, meta.width, meta.height, meta.channels,
                 px.length.toLong, mean, hist)
      }
    }
  }

  /** Nearest-neighbor resize on the (fake) pixel grid — real index
    * arithmetic, runs whatever bytes are present row-major w×h×c. */
  def resizeNearest(meta: MediaMeta, pixels: Array[Byte],
                    newW: Int, newH: Int): (MediaMeta, Array[Byte]) = {
    val out = new Array[Byte](newW * newH * meta.channels)
    var y = 0
    while (y < newH) {
      val sy = math.min(meta.height - 1, y * meta.height / newH)
      var x = 0
      while (x < newW) {
        val sx = math.min(meta.width - 1, x * meta.width / newW)
        var c = 0
        while (c < meta.channels) {
          val src = (sy * meta.width + sx) * meta.channels + c
          val dst = (y * newW + x) * meta.channels + c
          if (src < pixels.length) out(dst) = pixels(src)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    (MediaMeta(newW, newH, meta.channels), out)
  }

  /** Frame sampling for "video" payloads (concatenated fixed-size
    * frames): keep every k-th frame. Pure slicing arithmetic. */
  def sampleFrames(pixels: Array[Byte], frameBytes: Int, everyK: Int): Array[Array[Byte]] = {
    require(frameBytes > 0 && everyK > 0)
    val n = pixels.length / frameBytes
    (0 until n by everyK).map { f =>
      java.util.Arrays.copyOfRange(pixels, f * frameBytes, (f + 1) * frameBytes)
    }.toArray
  }

  /** Spread opaque blobs evenly before heavy per-row work: hash
    * repartition on the id, not on (skew-prone) payload size. */
  def balanced(media: Dataset[Media], partitions: Int): Dataset[Media] =
    media.repartition(partitions, col("media_id"))

  /** Build a media frame with real BINARY payloads from any table —
    * the ingestion shape (id, kind, data, declared meta struct). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("kind"),
      concat(
        lit(FakeCodec.Magic), lit("|"),
        ((col(idCol) % 16) + 1).cast("string"), lit("|"),
        ((col(idCol) % 8) + 1).cast("string"), lit("|"),
        lit("1"), lit("|"),
        col(textCol)).cast("binary").as("data"))
}
