package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, per the training-data-pipeline north star.
  *
  * The Spark-side plumbing is real — schema, partitioning, batch-shaped
  * decode iteration, frame-sampling explode. The codec boundary is
  * split honestly: JDK-decodable containers get REAL parsing (pixel
  * decode + feature extraction for PNG/BMP/GIF via `decodeImage`;
  * PNG/WAV header sniffing via `sniffMeta`) while everything else falls
  * back to a deterministic STUB (`decodeStub` — this container has no
  * external image/audio libraries). Swapping in a full codec changes
  * only the `decodeImage`/`decodeStub` bodies; every schema and
  * operator stays as-is.
  *
  * Scale notes: payloads never pass through a shuffle — features are
  * extracted scan-side (`extractFeatures` is a mapPartitions directly over
  * the source partitions) and only the small feature rows move. Frame
  * sampling explodes indices, not frames: each output row is a (media_id,
  * frame_ts) extraction task for downstream workers.
  *
  * `extractFeatures` is the Scala analog of PySpark's
  * `mapInPandas(decode_fn, schema)`: same contract — a per-partition
  * iterator of batches in, typed feature rows out, explicit output
  * schema ([[MediaFeatures]]'s encoder), decode state reusable across
  * the partition. A Python decoder plugs into the identical pipeline
  * position without touching any other operator.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sample_rate: Int,
      duration_ms: Int, format: String)
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      payload_md5: String, embedding: Array[Float])

  /** Fixture builder: a deterministic media table derived from
    * `documents` (testdata has no binary column). Payload = UTF-8 bytes of
    * the text; kind/meta derived from doc_id. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate"),
        ((col("doc_id") % 10) * 1000 + 500).cast("int").as("duration_ms"),
        lit("stub").as("format")).as("meta"))

  /** Codec seam: a real deployment swaps this body for the external
    * decoder (JPEG-XL, video, …) — signature and batch shape stay.
    * Deterministic fake: 8-dim embedding from chunked byte sums. The
    * accumulator is an exact integer sum with ONE trailing float
    * division — order-independent and engine-neutral, so a SQL oracle
    * reproduces each component bit-for-bit (a float running sum would
    * be partition-order-sensitive and unreproducible outside the JVM). */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val dims = 8
    val acc = new Array[Long](dims)
    var i = 0
    while (i < payload.length) {
      acc(i % dims) += (payload(i) & 0xFF)
      i += 1
    }
    acc.map(s => (s / 255.0).toFloat)
  }

  /** REAL pixel decode for JDK-supported containers (PNG/BMP/GIF via
    * javax.imageio — no external libraries): 8-dim feature vector
    * [mean R, mean G, mean B, mean luma, luma variance, edge energy
    * (mean |horizontal gradient|), width/1k, height/1k], all in [0,~1].
    * Returns None when the payload is not a decodable image, so callers
    * fall back to [[decodeStub]] — the honest boundary between real and
    * stubbed decode. */
  /** Magic-byte gate in front of [[decodeImage]]'s ImageIO call. Every
    * container the stock JDK can decode announces itself in the first
    * bytes — PNG \x89PNG, GIF87a/GIF89a, BMP "BM", JPEG FF D8 FF, TIFF
    * "II*"/"MM" headers, WBMP type 0 — and `ImageIO.read` returns null for
    * everything else anyway, AFTER paying a per-call trip through the
    * synchronized SPI registry (stream SPI lookup + every reader's
    * `canDecodeInput`). r20 measurement: a 32-task decode stage over
    * non-image payloads spent ~25 s of aggregate executor time blocked
    * in that registry while one task alone needed 0.9 s — the gate
    * removes the ImageIO call for payloads no stock reader could claim,
    * with identical outcomes (a deployment adding third-party codecs
    * swaps the `decodeImage` body per the codec-seam contract above,
    * and extends this gate with its containers' magics). */
  private def maybeJdkImage(p: Array[Byte]): Boolean = {
    if (p.length < 4) return false
    val (b0, b1, b2, b3) = (p(0) & 0xFF, p(1) & 0xFF, p(2) & 0xFF, p(3) & 0xFF)
    (b0 == 0x89 && b1 == 'P' && b2 == 'N' && b3 == 'G') || // PNG
    (b0 == 'G' && b1 == 'I' && b2 == 'F' && b3 == '8') ||  // GIF87a/89a
    (b0 == 'B' && b1 == 'M') ||                            // BMP
    (b0 == 0xFF && b1 == 0xD8 && b2 == 0xFF) ||            // JPEG
    (b0 == 'I' && b1 == 'I' && b2 == 0x2A && b3 == 0x00) ||// TIFF LE
    (b0 == 'M' && b1 == 'M' && b2 == 0x00 && b3 == 0x2A) ||// TIFF BE
    (b0 == 0x00 && b1 <= 1)                                // WBMP type 0 (permissive)
  }

  def decodeImage(payload: Array[Byte]): Option[Array[Float]] =
    if (!maybeJdkImage(payload)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb, sl, sl2, se) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
        var y = 0
        while (y < h) {
          var x = 0
          var prevLuma = 0.0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = ((rgb >> 16) & 0xFF) / 255.0
            val g = ((rgb >> 8) & 0xFF) / 255.0
            val b = (rgb & 0xFF) / 255.0
            val luma = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sl += luma; sl2 += luma * luma
            if (x > 0) se += math.abs(luma - prevLuma)
            prevLuma = luma
            x += 1
          }
          y += 1
        }
        val n = (w * h).toDouble
        val mean = sl / n
        Some(Array(
          (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat, mean.toFloat,
          (sl2 / n - mean * mean).toFloat,
          (if (w > 1) se / ((w - 1).toDouble * h) else 0.0).toFloat,
          (w / 1000.0).toFloat, (h / 1000.0).toFloat))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batch-shaped feature extraction: one pass per partition, payloads
    * consumed in-place (never shuffled), emitting small feature rows. The
    * iterator is the batch boundary — a real decoder would reuse its
    * native context across the partition exactly here. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"), col("meta"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder state (the "native context" slot): one
        // digest instance reused across the whole partition
        // r20 (measured): ImageIO's default useCache=true backs EVERY
        // ImageIO.read(InputStream) with a DISK temp file — per-row
        // temp-file create/delete syscalls that (a) do not scale across
        // concurrent tasks (the 32-wide decode burned ~40 s aggregate
        // CPU where one task burned 0.9 s) and (b) make even the serial
        // decode filesystem-state-sensitive (same code measured
        // 0.5-6 s across windows). Byte-array payloads never need the
        // disk cache; the in-memory stream decodes identically. The
        // flag is a JVM-global static — setting it per partition is
        // idempotent and keeps the decoder contract self-contained.
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexDigits = "0123456789abcdef".toCharArray
        rows.map { r =>
          md.reset()
          val digest = md.digest(r.payload)
          val hex = new Array[Char](digest.length * 2)
          var i = 0
          while (i < digest.length) {
            hex(2 * i) = hexDigits((digest(i) >> 4) & 0xF)
            hex(2 * i + 1) = hexDigits(digest(i) & 0xF)
            i += 1
          }
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
            new String(hex),
            decodeImage(r.payload).getOrElse(decodeStub(r.payload)))
        }
      }
  }

  /** Honest container sniffing — pure-JDK byte parsing of real PNG IHDR
    * and WAV RIFF/fmt headers (no external codec libs needed for
    * these): recognized payloads get their TRUE dimensions / sample
    * rate / duration; anything else keeps `fallback`. This is the
    * non-stub half of the codec boundary. */
  def sniffMeta(payload: Array[Byte], fallback: MediaMeta): MediaMeta = {
    def be32(o: Int): Int =
      ((payload(o) & 0xFF) << 24) | ((payload(o + 1) & 0xFF) << 16) |
        ((payload(o + 2) & 0xFF) << 8) | (payload(o + 3) & 0xFF)
    def le32(o: Int): Int =
      (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8) |
        ((payload(o + 2) & 0xFF) << 16) | ((payload(o + 3) & 0xFF) << 24)
    def ascii(o: Int, s: String): Boolean =
      s.indices.forall(i => payload(o + i) == s.charAt(i).toByte)
    if (payload.length >= 24 && payload(0) == 0x89.toByte && ascii(1, "PNG")) {
      // PNG signature + IHDR (always first chunk): width/height at 16/20
      fallback.copy(width = be32(16), height = be32(20), format = "png")
    } else if (payload.length >= 44 && ascii(0, "RIFF") && ascii(8, "WAVE")) {
      // walk RIFF chunks for fmt (sample/byte rate) and data (length)
      var o = 12
      var rate = 0
      var byteRate = 0
      var dataLen = -1L
      while (o >= 0 && o + 8 <= payload.length && (rate == 0 || dataLen < 0)) {
        val len = le32(o + 4).toLong & 0xFFFFFFFFL
        if (ascii(o, "fmt ") && o + 32 <= payload.length) {
          rate = le32(o + 12)
          byteRate = le32(o + 16)
        } else if (ascii(o, "data")) dataLen = len
        // word-aligned chunk walk; a corrupt length that would not
        // advance (or overflow int) ends the scan instead of looping
        if (len > payload.length.toLong) o = payload.length
        else o += 8 + len.toInt + (len.toInt & 1)
      }
      if (rate <= 0) fallback
      else fallback.copy(
        sample_rate = rate,
        duration_ms =
          if (byteRate > 0 && dataLen >= 0) (dataLen * 1000L / byteRate).toInt
          else fallback.duration_ms,
        format = "wav")
    } else fallback
  }

  /** Scan-side meta correction: replace fixture/declared meta with the
    * sniffed truth wherever the payload is a recognizable container —
    * same pipeline position (and shuffle-free contract) as
    * `extractFeatures`. */
  def withSniffedMeta(media: DataFrame): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"), col("meta"))
      .as[MediaRow]
      .mapPartitions(rows => rows.map(r => r.copy(meta = sniffMeta(r.payload, r.meta))))
  }

  /** Declarative feature projection (the codegen path for everything that
    * doesn't need the codec): byte length + md5, no UDF. */
  def payloadStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      col("meta.width").as("width"),
      col("meta.duration_ms").as("duration_ms"))

  /** Metadata-level resize: scales dimensions, stamps the op; payload
    * untouched (a real resize rewrites payload inside decode/encode). */
  def resizeMeta(media: DataFrame, maxWidth: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxWidth.toDouble) / col("meta.width"))
    media.withColumn("meta",
      struct(
        (col("meta.width") * scale).cast("int").as("width"),
        (col("meta.height") * scale).cast("int").as("height"),
        col("meta.sample_rate"), col("meta.duration_ms"),
        concat(col("meta.format"), lit("+resized")).as("format")))
  }

  /** Frame sampling for video rows: explode frame timestamps every
    * `everyMs` over [0, duration_ms] — emits extraction tasks, not
    * frames, so the explode output is tiny rows. */
  def frameSample(media: DataFrame, everyMs: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        posexplode(sequence(lit(0), col("meta.duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("pos").as("frame_idx"), col("col").as("frame_ts_ms"))
}
