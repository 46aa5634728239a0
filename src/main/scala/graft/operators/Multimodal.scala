package graft.operators

import graft.Tables.T
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Serve._

/** Multimodal column plumbing — the training-data-pipeline mandate: treat
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * run decode / feature-extract as per-partition batch functions.
  *
  * In PySpark this is `mapInPandas`; the Scala-native equivalent is
  * `mapPartitions` over an explicit Row encoder — same contract: the
  * function sees an ITERATOR of rows (one partition = one batch), never a
  * per-row UDF call, so a real decoder would amortize model/codec init
  * per partition exactly like a pandas batch would.
  *
  * Two decode tiers coexist:
  *  - the FEATURE-extract stages (q57/q71/resize) keep deterministic stub
  *    bodies — an ML featurizer (ONNX/JNI) genuinely isn't in this
  *    container, and the stubs keep the batch contract, schemas, and
  *    metadata arithmetic fully testable; swapping in a real model
  *    changes one function body;
  *  - the CODEC round-trip (q94, round 11) is REAL: PNG via
  *    javax.imageio and PCM WAV via javax.sound.sampled — both in-JDK —
  *    encode closed-form pixels/samples and decode them back, with the
  *    oracle recomputing the expected facts from the same closed form.
  *    Video (q127, round 12): the JDK still ships no video CODEC, but
  *    the container side is fully real — RIFF/AVI with uncompressed
  *    BGR24 DIB frames, synthesized and then demuxed by a genuine
  *    chunk-walking parser (see the q127 section); only a compressed
  *    per-frame byte decode remains out of reach in this JDK, and q94's
  *    generic decodeMedia path still flags non-AVI video rows ok=false.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("payload", BinaryType, nullable = true),   // opaque bytes
    StructField("meta", StructType(Seq(                    // typed metadata
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Synthesize a media table from the documents corpus: text bytes stand
    * in for the opaque payload (deterministic; same rows every run). */
  def mediaTable(t: T): DataFrame =
    t.documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 10L).as("duration_ms")).as("meta"))

  /** STUB decoder — deterministic fake 8-dim feature from payload bytes.
    * A real implementation decodes the payload (JPEG/PCM/container) here;
    * the per-partition iterator contract and output schema do not change. */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    var h = 1125899906842597L
    payload.foreach(b => h = h * 31 + b)
    Array.tabulate(8)(i => (((h >>> (i * 8)) & 0xff).toInt - 128) / 128.0f)
  }

  /** Decode/feature-extract over partition batches (mapInPandas shape). */
  def extractFeatures(media: DataFrame): DataFrame = {
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    media
      .select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        // batch scope: a real decoder initializes its codec/model ONCE here
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          Row(r.getLong(0), r.getString(1), payload.length,
            stubDecode(payload).toSeq)
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_ts", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** STUB frame grab — deterministic fake bytes for the frame at `ts`.
    * A real implementation seeks the container and decodes one frame. */
  private def stubFrame(payload: Array[Byte], ts: Long): Array[Byte] = {
    var h = 1125899906842597L ^ ts
    payload.foreach(b => h = h * 31 + b)
    Array.tabulate(4)(i => ((h >>> (i * 8)) & 0xff).toByte)
  }

  /** Frame sampling over partition batches — one output row per sampled
    * timestamp (0, everyMs, … ≤ duration), the generator-shaped batch
    * contract (`flatMap` over the partition iterator; a real decoder
    * opens the container once per ROW and seeks per frame, amortizing
    * codec init per partition). Frame COUNT and timestamps are pure
    * metadata arithmetic, so the sampling plumbing is oracle-checkable
    * even with the frame grab stubbed. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(frameSchema))
    media
      .filter(col("kind") === "video")
      .select(col("media_id"), col("payload"),
        col("meta.duration_ms").as("duration_ms"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          // duration_ms is nullable in mediaSchema; mediaTable never emits
          // null but external callers may — treat unknown duration as 0
          // (one frame at ts 0) instead of NPE'ing inside the partition
          val dur = if (r.isNullAt(2)) 0L else math.max(r.getLong(2), 0L)
          (0L to dur by everyMs).iterator.map(ts =>
            Row(id, ts, stubFrame(payload, ts)))
        }
      }(enc)
  }

  /** STUB resize — deterministic fake bytes at the target dimensions. A
    * real implementation decodes, scales, re-encodes. */
  private def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    var acc = (w.toLong << 32) | (h & 0xffffffffL)
    payload.foreach(b => acc = acc * 31 + b)
    Array.tabulate(8)(i => ((acc >>> (i * 8)) & 0xff).toByte)
  }

  /** Image resize over partition batches: image rows get the target
    * dimensions in `meta` and a re-encoded payload; non-image rows pass
    * through untouched (same schema in and out, so resize composes with
    * the other media stages). */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    media.select("media_id", "kind", "payload", "meta").mapPartitions { rows =>
      rows.map { r =>
        if (r.getString(1) != "image") r
        else {
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val meta = r.getStruct(3)
          // null-safe duration passthrough (same external-caller guard as
          // sampleFrames; the whole meta struct may also be absent)
          val dur: Any =
            if (meta == null || meta.isNullAt(2)) null else meta.getLong(2)
          Row(r.getLong(0), r.getString(1), stubResize(payload, w, h),
            Row(w, h, dur))
        }
      }
    }(enc)
  }

  /** q71 — frame-sampling plumbing, oracle-checked: frames every 5 s of
    * media duration; count and last timestamp are metadata arithmetic the
    * oracle replays exactly (the stubbed frame bytes stay internal). */
  def q71FrameSample(t: T): DataFrame =
    sampleFrames(mediaTable(t), 5000L)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"), max("frame_ts").as("last_ts"))
      .orderBy("media_id")

  /** q57 — the end-to-end multimodal path: media table → partition-batched
    * feature extraction → metadata join → per-kind rollup. Oracle-checked
    * since r11: the stub hash is deterministic, so DuckDB replays it with
    * HUGEINT mod-2^64 arithmetic (JVM long wrapping; ASCII payloads make
    * unsigned ord equal the signed byte). */
  def q57MultimodalFeatures(t: T): DataFrame = {
    val media = mediaTable(t)
    extractFeatures(media)
      .join(media.select(col("media_id"), col("meta")), Seq("media_id"))
      .withColumn("f0", element_at(col("feature"), 1))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        round(avg("f0"), 4).as("avg_f0"),
        max(col("meta.duration_ms")).as("max_duration_ms"))
      .smallSort("kind")
  }

  // --------------------------------------------------------------------
  // REAL in-JDK codecs (round 11). The stub stages above kept the batch
  // contract honest while no external codec existed; the JDK itself
  // ships lossless ones — PNG through javax.imageio and PCM WAV through
  // javax.sound.sampled — so the encode→decode loop can be genuinely
  // exercised: q94 synthesizes a real PNG per image row and a real
  // 16-bit WAV per audio row from closed-form pixel/sample arithmetic,
  // decodes them with the REAL codec in a partition-batched stage, and
  // the oracle recomputes the expected dimensions/sample counts/
  // checksums from the same closed form — any codec or byte-layout
  // regression breaks the hash. Video rows flag ok = false on THIS
  // generic path (their q94 payload is opaque text); the real
  // container-level video round-trip is q127 below.
  // --------------------------------------------------------------------

  val ImgW = 16
  val ImgH = 16
  val WavSamples = 512
  val WavSampleRate = 8000

  /** ImageIO defaults to a DISK-backed stream cache — every encode/decode
    * creates and deletes a temp file, serializing the 32 codec tasks on
    * filesystem calls. In-memory cache is correct for these small
    * payloads; runs once per executor JVM on class load. */
  private val imageIoMemCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Closed-form pixel channels — also the oracle's arithmetic. */
  private def pxR(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  private def pxG(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 5 + y * 3) % 256).toInt
  private def pxB(id: Long, x: Int, y: Int): Int = ((id * 13 + x * 11 + y * 19) % 256).toInt

  /** Closed-form PCM16 sample — also the oracle's arithmetic. */
  private def sample(id: Long, i: Int): Int = ((id * 7 + i * 11) % 65536).toInt - 32768

  /** A real PNG: deterministic pixels → BufferedImage → ImageIO. */
  private[graft] def pngPayload(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      ImgW, ImgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        img.setRGB(x, y, (pxR(id, x, y) << 16) | (pxG(id, x, y) << 8) | pxB(id, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A real RIFF/WAVE file: 44-byte header + little-endian PCM16 mono. */
  private[graft] def wavPayload(id: Long): Array[Byte] = {
    val dataLen = WavSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(WavSampleRate).putInt(WavSampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < WavSamples) { bb.putShort(sample(id, i).toShort); i += 1 }
    bb.array()
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_samples", IntegerType, nullable = true),
    StructField("checksum", LongType, nullable = true)))

  /** Media table with REAL payloads: PNG for image rows, WAV for audio
    * rows (video keeps opaque text bytes — no JDK codec). Same kind
    * assignment as [[mediaTable]]. */
  def realMediaTable(t: T): DataFrame = {
    val base = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(base))
    mediaTable(t).select("media_id", "kind", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        r.getString(1) match {
          case "image" => Row(id, "image", pngPayload(id))
          case "audio" => Row(id, "audio", wavPayload(id))
          case k => Row(id, k, r.get(2)) // positional: rows may pipeline schemaless
        }
      }
    }(enc)
  }

  /** The REAL decode stage (partition-batched like every media stage):
    * ImageIO for PNG (checksum = Σ(r+g+b) over decoded pixels — PNG is
    * lossless, so this must equal the synthesis form), AudioSystem for
    * WAV (checksum = Σ|sample|, exact integers). Any decode failure
    * yields ok = false with null facts rather than a task failure —
    * the per-page try/except posture of T14. */
  def decodeMedia(media: DataFrame): DataFrame = {
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(decodedSchema))
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val payload = Option(r.get(2).asInstanceOf[Array[Byte]])
          .getOrElse(Array.emptyByteArray)
        try kind match {
          case "image" =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            if (img == null) Row(id, kind, false, null, null, null, null)
            else {
              var cks = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  cks += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              Row(id, kind, true, img.getWidth, img.getHeight, null, cks)
            }
          case "audio" =>
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            val data = ais.readAllBytes()
            ais.close()
            var cks = 0L
            var i = 0
            while (i + 1 < data.length) {
              val s = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
              cks += math.abs(s.toInt)
              i += 2
            }
            Row(id, kind, true, null, null, data.length / 2, cks)
          case _ =>
            Row(id, kind, false, null, null, null, null)
        } catch {
          case _: Exception => Row(id, kind, false, null, null, null, null)
        }
      }
    }(enc)
  }

  /** q94 — the real-codec round-trip, oracle-checked per media row. */
  def q94MediaDecode(t: T): DataFrame =
    decodeMedia(realMediaTable(t)).orderBy("media_id")

  /** REAL resize: decode the PNG, scale by NEAREST-NEIGHBOR (output
    * pixel (x,y) ← source (⌊x·sw/dw⌋, ⌊y·sh/dh⌋) — explicit loops, not
    * Graphics2D interpolation, so the mapping is closed-form and the
    * oracle can recompute the resized checksum exactly), re-encode as
    * PNG. Non-image rows pass through; a decode failure passes the row
    * through unresized (per-row best effort, same posture as q94). */
  def resizeReal(media: DataFrame, dw: Int, dh: Int): DataFrame = {
    require(dw > 0 && dh > 0, s"target dims must be positive, got ${dw}x$dh")
    val base = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(base))
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      rows.map { r =>
        val kind = r.getString(1)
        if (kind != "image") Row(r.getLong(0), kind, r.get(2))
        else try {
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            r.get(2).asInstanceOf[Array[Byte]]))
          if (src == null) Row(r.getLong(0), kind, r.get(2))
          else {
            val dst = new java.awt.image.BufferedImage(
              dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < dh) {
              var x = 0
              while (x < dw) {
                dst.setRGB(x, y, src.getRGB(x * src.getWidth / dw, y * src.getHeight / dh))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            Row(r.getLong(0), kind, bos.toByteArray)
          }
        } catch {
          case _: Exception => Row(r.getLong(0), kind, r.get(2))
        }
      }
    }(enc)
  }

  /** q95 — decode → scale → re-encode → decode, all through the REAL
    * codec: image rows shrink 16×16 → 8×8 by nearest-neighbor, so the
    * resized checksum is the closed form evaluated at the even source
    * coordinates — the oracle's arithmetic. Audio/video rows pass
    * through resize untouched and report their q94 facts. */
  def q95ResizeDecode(t: T): DataFrame =
    decodeMedia(resizeReal(realMediaTable(t), 8, 8)).orderBy("media_id")

  // --------------------------------------------------------------------
  // VIDEO (q127): the JDK ships no video CODEC, but "video decode" in a
  // data pipeline is mostly CONTAINER work — and RIFF/AVI with
  // uncompressed DIB frames needs no codec at all. q127 synthesizes a
  // real AVI per video row (RIFF → LIST hdrl (avih, LIST strl
  // (strh 'vids'/'DIB ', strf BITMAPINFOHEADER)) → LIST movi with one
  // '00db' chunk per frame; bottom-up BGR24 rows, 4-byte stride) from
  // closed-form pixels, then DEMUXES it with a genuine chunk-walking
  // RIFF parser: header validation, stream-format checks (24 bpp,
  // BI_RGB), frame extraction honoring stride and bottom-up order, and
  // q71's every-Nth frame sampling on REAL frames. The oracle
  // recomputes frame counts/dimensions/checksums from the same closed
  // form — any container-layout or parser regression breaks the hash.
  // Compressed codecs would slot in at exactly one point (the per-frame
  // byte decode); the container plumbing IS the Spark-side work.
  // --------------------------------------------------------------------

  val VidW = 16
  val VidH = 16
  val VidFrames = 4
  /** q71's sampling stride, applied to real frames: keep frames 0, 2. */
  val VidSampleStep = 2

  /** Closed-form frame pixels: the q94 channel forms with a per-frame
    * shifted id — also the oracle's arithmetic. */
  private def vidFrameId(id: Long, f: Int): Long = id + 101L * f

  /** A real AVI: RIFF container, one 'vids'/'DIB ' stream, VidFrames
    * uncompressed bottom-up BGR24 '00db' frames. */
  private[graft] def aviPayload(id: Long): Array[Byte] = {
    val stride = ((VidW * 3 + 3) / 4) * 4
    val frameBytes = stride * VidH
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + VidFrames * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
    fourcc("RIFF"); bb.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(100000)                      // usPerFrame (10 fps)
      .putInt(frameBytes * 10).putInt(0).putInt(0)
      .putInt(VidFrames).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(VidW).putInt(VidH)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(strlSize); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(10)                // scale 1, rate 10 → 10 fps
      .putInt(0).putInt(VidFrames).putInt(frameBytes).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(VidW.toShort).putShort(VidH.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(VidW).putInt(VidH)
      .putShort(1).putShort(24)            // planes, BGR24
      .putInt(0)                           // BI_RGB: uncompressed
      .putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < VidFrames) {
      fourcc("00db"); bb.putInt(frameBytes)
      val fid = vidFrameId(id, f)
      var y = VidH - 1                     // DIB rows are bottom-up
      while (y >= 0) {
        var x = 0
        while (x < VidW) {
          bb.put(pxB(fid, x, y).toByte)    // BGR order
            .put(pxG(fid, x, y).toByte)
            .put(pxR(fid, x, y).toByte)
          x += 1
        }
        var pad = stride - VidW * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        y -= 1
      }
      f += 1
    }
    bb.array()
  }

  /** Media table with REAL AVI payloads for the video rows. */
  def realVideoTable(t: T): DataFrame = {
    val base = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(base))
    mediaTable(t).filter(col("kind") === "video").select("media_id")
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), aviPayload(r.getLong(0))))
      }(enc)
  }

  val videoSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("checksum", LongType, nullable = true),
    StructField("sampled_checksum", LongType, nullable = true)))

  /** Parsed stream facts + raw frame chunks from one AVI byte array. */
  private def demuxAvi(bytes: Array[Byte])
      : Option[(Int, Int, Int, Seq[Array[Byte]])] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    if (bytes.length < 12 || fourcc() != "RIFF") return None
    bb.getInt // riff size
    if (fourcc() != "AVI ") return None
    var frames = 0; var w = 0; var h = 0; var bits = 0; var comp = -1
    val frameChunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(end: Int): Unit =
      while (bb.position() + 8 <= end) {
        val id = fourcc()
        val size = bb.getInt
        val next = bb.position() + size + (size & 1) // chunks pad to even
        if (id == "LIST") { fourcc(); walk(next); bb.position(next) }
        else {
          id match {
            case "avih" =>
              val base = bb.position()
              frames = bb.getInt(base + 16)
              w = bb.getInt(base + 32); h = bb.getInt(base + 36)
            case "strf" =>
              val base = bb.position()
              bits = bb.getShort(base + 14).toInt
              comp = bb.getInt(base + 16)
            case "00db" | "00dc" =>
              val frame = new Array[Byte](size)
              bb.get(frame)
              frameChunks += frame
            case _ => ()
          }
          bb.position(next)
        }
      }
    walk(bytes.length)
    // stream-format contract: uncompressed 24-bit DIB, header counts
    // agreeing with the chunks actually present
    if (comp != 0 || bits != 24 || frames != frameChunks.size ||
        w <= 0 || h <= 0) None
    else Some((frames, w, h, frameChunks.toSeq))
  }

  /** The real video-decode stage (partition-batched): demux the RIFF
    * container, decode each bottom-up BGR24 frame honoring the 4-byte
    * stride, checksum Σ(r+g+b) over all frames and over q71's every-Nth
    * sampled frames. Malformed containers yield ok = false rather than
    * a task failure (the T14 posture). */
  def decodeVideo(media: DataFrame): DataFrame = {
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(videoSchema))
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        try {
          demuxAvi(r.get(1).asInstanceOf[Array[Byte]]) match {
            case None => Row(id, false, null, null, null, null, null)
            case Some((frames, w, h, chunks)) =>
              val stride = ((w * 3 + 3) / 4) * 4
              def frameSum(frame: Array[Byte]): Long = {
                var s = 0L
                var y = 0
                while (y < h) {
                  val rowOff = (h - 1 - y) * stride // bottom-up
                  var x = 0
                  while (x < w) {
                    val p = rowOff + x * 3
                    s += (frame(p) & 0xff) + (frame(p + 1) & 0xff) +
                      (frame(p + 2) & 0xff)
                    x += 1
                  }
                  y += 1
                }
                s
              }
              var all = 0L; var sampled = 0L
              var f = 0
              while (f < chunks.size) {
                val s = frameSum(chunks(f))
                all += s
                if (f % VidSampleStep == 0) sampled += s
                f += 1
              }
              Row(id, true, frames, w, h, all, sampled)
          }
        } catch {
          case _: Exception => Row(id, false, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** q127 — the real video-container round-trip, oracle-checked per
    * video row. */
  def q127VideoDecode(t: T): DataFrame =
    decodeVideo(realVideoTable(t)).orderBy("media_id")
}
