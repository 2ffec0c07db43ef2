package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` payloads + typed metadata; decode / feature-extract /
  * resize / frame-sample run as partition-batched transforms.
  *
  * IMAGES decode for real: `pngPayload` / `decodeImage` / `resizeImage`
  * run the JDK's javax.imageio (PNG/GIF/BMP/JPEG — no external codec) in
  * the partition-batched seam. AUDIO decodes for real via javax.sound
  * (WAV/AU), VIDEO via the hand-walked RIFF MJPEG-in-AVI container with
  * per-frame imageio JPEG decode, and animated-GIF frame sampling via
  * imageio's multi-frame reader — all pure JDK. Only codecs the JDK does
  * not ship (e.g. H.264/AAC) remain behind the documented `decodeStub`
  * seam, which derives deterministic fake (width, height, format)
  * metadata from the payload header bytes; `extractFeatures`
  * derives a fixed-length feature vector from payload content hashes. The
  * Spark-side contract — schema, batch shape, partition-local buffering,
  * no driver materialization — is real and what matters at 100 TB: payloads
  * never shuffle (all derivations are narrow), and the mapPartitions path
  * shows where a real decoder (JNI/codec lib) plugs in with one connection/
  * codec-context per partition, the same pattern as a Pandas-UDF batch.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("media_type", StringType, nullable = false)))

  /** Wrap a text corpus as fake media payloads (deterministic): the
    * payload is the UTF-8 text prefixed with an 8-byte header. */
  def syntheticPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      concat(
        encode(lit("GRFT"), "UTF-8"), // magic
        encode(substring(col(textCol), 1, 4), "UTF-8"), // fake header bytes
        encode(col(textCol), "UTF-8")).as("payload"),
      when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video").as("media_type"))

  /** Deterministic REAL-PNG fixture payloads — the encode side of the
    * real-decode proof: each id becomes a solid-color RGB PNG of
    * (16 + id%32) × (8 + id%16) pixels, generated with the JDK's
    * javax.imageio inside the same partition-batched seam the decoders
    * use (distributed, payloads born executor-side — never on the
    * driver). An oracle can predict the dimensions arithmetically; only
    * a real decoder can read them back out of the bytes. */
  def pngPayload(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("media_type", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val src = df.select(col(idCol).cast("long").as("media_id"))
    src.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per task
      rows.map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 32).toInt
        val h = 8 + (id % 16).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = ((id * 2654435761L) & 0xFFFFFF).toInt
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Row(id, baos.toByteArray, "image")
      }
    }(enc)
  }

  /** Deterministic REAL-WAV fixture payloads — the audio twin of
    * [[pngPayload]]: each id becomes a little-endian 16-bit PCM WAV
    * (javax.sound.sampled, pure JDK) with arithmetically-predictable
    * parameters — 8 kHz, 1 + id%2 channels, 100 + id%400 frames, sample
    * values a fixed function of (id, position). Ids where `id % 97 == 0`
    * emit a deliberately-undecodable payload (poison-row coverage). */
  def wavPayload(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("media_type", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 97 == 0)
          Row(id, s"not really audio $id".getBytes("UTF-8"), "audio")
        else {
          val channels = 1 + (id % 2).toInt
          val frames = 100 + (id % 400).toInt
          val fmt = new javax.sound.sampled.AudioFormat(
            8000f, 16, channels, true, false)
          val data = new Array[Byte](frames * channels * 2)
          var i = 0
          while (i < data.length / 2) {
            val s = (((id * 31 + i * 7) % 251) - 125).toShort
            data(2 * i) = (s & 0xFF).toByte
            data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          Row(id, baos.toByteArray, "audio")
        }
      }
    }(enc)
  }

  /** Deterministic REAL animated-GIF fixture payloads — the multi-frame
    * twin of [[pngPayload]] (the available JDK stand-in for video:
    * javax.imageio's gif writer does frame sequences; real video codecs
    * don't exist in the JDK). Each id becomes an animated GIF of
    * 1 + id%5 solid-color frames at (8 + id%16) × (4 + id%8) pixels,
    * written executor-side via prepareWriteSequence/writeToSequence.
    * Ids where `id % 89 == 0` emit an undecodable payload (poison-row
    * coverage). An oracle predicts frame count and dimensions
    * arithmetically; only a real per-frame header parse recovers them. */
  def gifPayload(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("media_type", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 89 == 0)
          Row(id, s"not really video $id".getBytes("UTF-8"), "video")
        else {
          val frames = 1 + (id % 5).toInt
          val w = 8 + (id % 16).toInt
          val h = 4 + (id % 8).toInt
          val baos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            for (f <- 0 until frames) {
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val rgb = (((id * 31 + f) * 2654435761L) & 0xFFFFFF).toInt
              for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
            }
            writer.endWriteSequence()
          } finally { writer.dispose(); ios.close() }
          Row(id, baos.toByteArray, "video")
        }
      }
    }(enc)
  }

  /** Deterministic REAL MJPEG-in-AVI fixture payloads — true VIDEO files
    * with zero non-public dependencies: a hand-assembled RIFF 'AVI '
    * container (avih main header + one 'vids'/'MJPG' stream header +
    * 'movi' list) whose frames are per-frame JPEGs written by
    * javax.imageio — the same all-JDK honesty WAV gave audio and animated
    * GIF gave frame sequences. Each id becomes 1 + id%4 solid-color
    * frames at (16 + id%16) × (8 + id%8), 12 fps; `id % 89 == 0` emits an
    * undecodable payload (poison-row coverage). An oracle predicts frame
    * count/dims/fps arithmetically; only a real container walk plus a
    * real JPEG decode recovers them (reference cares about file formats
    * only as opaque blobs — mydump_reader reads dumps, not media — so
    * this whole family is beyond-reference surface). */
  def aviPayload(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("media_type", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 89 == 0)
          Row(id, s"not really a riff $id".getBytes("UTF-8"), "video")
        else {
          val frames = 1 + (id % 4).toInt
          val w = 16 + (id % 16).toInt
          val h = 8 + (id % 8).toInt
          val jpegs = (0 until frames).map { f =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val rgb = (((id * 131 + f) * 2654435761L) & 0xFFFFFF).toInt
            for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpeg", baos)
            baos.toByteArray
          }
          Row(id, buildAvi(w, h, fps = 12, jpegs), "video")
        }
      }
    }(enc)
  }

  /** Assemble a minimal valid RIFF AVI: avih + strl('vids'/'MJPG') + movi
    * of '00dc' JPEG chunks (RIFF word alignment honored; no idx1 — the
    * header-driven walk [[decodeVideo]] does, and sequential MJPEG
    * players do, need none). Little-endian throughout per RIFF. */
  private[operators] def buildAvi(w: Int, h: Int, fps: Int,
      jpegs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(id) ++ le32(body.length) ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(typ) ++ body)
    val avih = le32(1000000 / fps) ++ le32(0) ++ le32(0) ++
      le32(0) /* flags: no AVIF_HASINDEX — this file carries no idx1 */ ++
      le32(jpegs.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) /* dwScale */ ++ le32(fps) /* dwRate */ ++ le32(0) ++
      le32(jpegs.size) ++ le32(0) ++ le32(-1) ++ le32(0) ++
      // rcFrame: four LE16 (left, top, right, bottom)
      Array((0 & 0xFF).toByte, 0.toByte, (0 & 0xFF).toByte, 0.toByte,
        (w & 0xFF).toByte, ((w >> 8) & 0xFF).toByte,
        (h & 0xFF).toByte, ((h >> 8) & 0xFF).toByte)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++
      Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) /* planes, bitcount */ ++
      fcc("MJPG") ++ le32(w * h * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val riffBody = fcc("AVI ") ++ hdrl ++ movi
    out.write(fcc("RIFF")); out.write(le32(riffBody.length))
    out.write(riffBody)
    out.toByteArray
  }

  /** REAL video decode — the MJPEG-in-AVI leg: a RIFF container walk
    * (chunk/list iteration, avih + 'vids' strh parsing, '00dc'/'00db'
    * frame enumeration inside 'movi') plus a REAL javax.imageio JPEG
    * decode of every `every`-th frame. Emits
    * (vid_frames, vid_width, vid_height, vid_fps, vid_sampled,
    * vid_dim_sum, vid_ok): frame count from the container walk, dims from
    * the FIRST SAMPLED FRAME'S DECODED PIXELS — not the avih header, so a
    * header lying about its dimensions is caught — fps from strh
    * dwRate/dwScale, and dim_sum = Σ (w+h) over decoded sampled frames.
    * Header-only container walk + bounded per-frame decode is the scan
    * shape that survives a 100 TB media column; poison/truncated/non-RIFF
    * payloads yield ok=false instead of failing the task. */
  def decodeVideo(df: DataFrame, payloadCol: String = "payload",
      every: Int = 2, prefix: String = "vid_"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(prefix + "frames", IntegerType, nullable = true),
      StructField(prefix + "width", IntegerType, nullable = true),
      StructField(prefix + "height", IntegerType, nullable = true),
      StructField(prefix + "fps", IntegerType, nullable = true),
      StructField(prefix + "sampled", IntegerType, nullable = true),
      StructField(prefix + "dim_sum", LongType, nullable = true),
      StructField(prefix + "ok", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val extra: Seq[Any] = decodeAviOnce(payload, every) match {
          case Some((frames, wd, ht, fps, sampled, dimSum)) =>
            Seq(frames, wd, ht, fps, sampled, dimSum, true)
          case None => Seq(null, null, null, null, null, null, false)
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(enc)
  }

  /** One payload's walk+decode; None = undecodable. */
  private def decodeAviOnce(payload: Array[Byte], every: Int)
      : Option[(Int, Int, Int, Int, Int, Long)] = {
    if (payload == null || payload.length < 12) return None
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      if (fourcc() != "RIFF") return None
      val riffLen = bb.getInt
      if (riffLen < 4 || fourcc() != "AVI ") return None
      var fpsScale = 0; var fpsRate = 0
      var inVids = false
      val frameChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      // flat walk: LIST headers are descended into (their body is chunks),
      // plain chunks are inspected or skipped by size
      val end = math.min(payload.length.toLong, 8L + riffLen)
      while (bb.position() + 8 <= end) {
        val id = fourcc()
        val size = bb.getInt
        if (size < 0 || bb.position() + size > payload.length) return None
        id match {
          case "LIST" =>
            val lt = fourcc() // descend: next iteration reads its chunks
            if (lt != "hdrl" && lt != "strl" && lt != "movi" && lt != "odml") {
              // unknown list: skip its remaining body
              bb.position(bb.position() + size - 4 + (size & 1))
            }
          case "strh" =>
            val start = bb.position()
            val typ = fourcc()
            inVids = typ == "vids"
            if (inVids) {
              bb.position(start + 20) // fccHandler(4)+flags+prio+initial
              fpsScale = bb.getInt
              fpsRate = bb.getInt
            }
            bb.position(start + size + (size & 1))
          case "00dc" | "00db" =>
            frameChunks += ((bb.position(), size))
            bb.position(bb.position() + size + (size & 1))
          case _ =>
            bb.position(bb.position() + size + (size & 1))
        }
      }
      if (frameChunks.isEmpty || fpsScale <= 0 || fpsRate <= 0) return None
      val sampledIdx = frameChunks.indices by every
      var dimSum = 0L
      var w0 = 0; var h0 = 0
      for ((i, k) <- sampledIdx.zipWithIndex) {
        val (off, len) = frameChunks(i)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload, off, len))
        if (img == null) return None
        if (k == 0) { w0 = img.getWidth; h0 = img.getHeight }
        dimSum += img.getWidth + img.getHeight
      }
      Some((frameChunks.size, w0, h0, fpsRate / fpsScale,
        sampledIdx.size, dimSum))
    } catch { case _: Exception => None }
  }

  /** REAL frame sampling — the de-stubbed video-ish leg: javax.imageio's
    * gif reader counts frames (`getNumImages(true)` walks every frame
    * header) and reads the header of every `every`-th frame
    * (`getWidth(i)`/`getHeight(i)` parse that frame's descriptor without
    * decoding pixels — the cheap scan shape for a 100 TB media column).
    * Runs in the partition-batched codec seam; undecodable payloads yield
    * (null, …, ok=false) instead of failing the task. */
  def sampleFrames(df: DataFrame, payloadCol: String = "payload",
      every: Int = 2, prefix: String = "frm_"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(prefix + "count", IntegerType, nullable = true),
      StructField(prefix + "sampled", ArrayType(IntegerType), nullable = true),
      StructField(prefix + "width", IntegerType, nullable = true),
      StructField(prefix + "height", IntegerType, nullable = true),
      StructField(prefix + "ok", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val extra: Seq[Any] =
          if (payload == null) Seq(null, null, null, null, false)
          else {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(payload))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) { iis.close(); Seq(null, null, null, null, false) }
            else {
              val rd = readers.next()
              try {
                rd.setInput(iis, false, true) // seekable: frame i re-readable
                val n = rd.getNumImages(true)
                val sampled = (0 until n by every).toSeq
                // per-frame header reads — every sampled frame's descriptor
                // is actually parsed, not just frame 0's
                val dims = sampled.map(i => (rd.getWidth(i), rd.getHeight(i)))
                Seq(n, sampled, dims.head._1, dims.head._2, true)
              } catch { case _: Exception => Seq(null, null, null, null, false) }
              finally { rd.dispose(); iis.close() }
            }
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(enc)
  }

  /** REAL audio decode — javax.sound.sampled reads WAV/AIFF/AU headers
    * with no external codec (compressed formats — mp3/flac/ogg — have no
    * JDK reader and land as ok=false like any undecodable payload). Reads
    * ONLY the header, same scan-shape argument as [[decodeImage]]; runs
    * in the partition-batched codec seam; poison/null payloads yield
    * ok=false instead of failing the task. */
  def decodeAudio(df: DataFrame, payloadCol: String = "payload",
      prefix: String = "aud_"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(prefix + "sample_rate", IntegerType, nullable = true),
      StructField(prefix + "channels", IntegerType, nullable = true),
      StructField(prefix + "frames", LongType, nullable = true),
      StructField(prefix + "duration_us", LongType, nullable = true),
      StructField(prefix + "ok", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val extra: Seq[Any] =
          if (payload == null) Seq(null, null, null, null, false)
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            try {
              val fmt = ais.getFormat
              val rate = fmt.getSampleRate.toInt
              val frames = ais.getFrameLength
              Seq(rate, fmt.getChannels, frames,
                frames * 1000000L / rate, true)
            } finally ais.close()
          } catch { case _: Exception => Seq(null, null, null, null, false) }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(enc)
  }

  /** REAL image decode — javax.imageio (PNG/GIF/BMP/JPEG readers ship
    * with the JDK; no external codec needed). Reads ONLY the header
    * (ImageReader.getWidth/getHeight never decode pixel data), so the
    * per-payload cost is a few hundred bytes of parsing regardless of
    * image size — the right scan shape for a 100 TB media column.
    * Runs in the mapPartitions codec seam with per-partition init;
    * undecodable payloads yield (null, null, null, ok=false) instead of
    * failing the task (a poison payload must not kill a 100 TB job).
    * Audio (WAV/AU via javax.sound) and video (MJPEG-in-AVI via the RIFF
    * walk + per-frame imageio) have their own real decoders below;
    * `decodeStub` remains only as the documented seam for codecs the JDK
    * does not ship (e.g. H.264). */
  def decodeImage(df: DataFrame, payloadCol: String = "payload",
      prefix: String = "img_"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(prefix + "width", IntegerType, nullable = true),
      StructField(prefix + "height", IntegerType, nullable = true),
      StructField(prefix + "format", StringType, nullable = true),
      StructField(prefix + "ok", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        if (payload == null) // nullable binary: metadata-only rows are
          Row.fromSeq(r.toSeq ++ Seq(null, null, null, false)) // not poison
        else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        val extra: Seq[Any] =
          if (!readers.hasNext) { iis.close(); Seq(null, null, null, false) }
          else {
            val rd = readers.next()
            try {
              rd.setInput(iis, true, true)
              Seq(rd.getWidth(0), rd.getHeight(0),
                rd.getFormatName.toLowerCase(java.util.Locale.ROOT), true)
            } catch { case _: Exception => Seq(null, null, null, false) }
            finally { rd.dispose(); iis.close() }
          }
        Row.fromSeq(r.toSeq ++ extra)
        }
      }
    }(enc)
  }

  /** REAL aspect-fit resize for decodable images (BufferedImage +
    * Graphics2D + PNG re-encode — all JDK): scale = min(1, maxW/w,
    * maxH/h); in-box images pass through byte-identical (no pointless
    * re-encode), others are bilinear-drawn into the scaled box and
    * re-encoded as PNG. Same mapPartitions seam; payloads stay
    * partition-local. Undecodable payloads yield null outputs. */
  def resizeImage(df: DataFrame, payloadCol: String = "payload",
      maxW: Int = 256, maxH: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("out_width", IntegerType, nullable = true),
      StructField("out_height", IntegerType, nullable = true),
      StructField("resized", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val img = if (payload == null) null // null payload ≡ undecodable
          else javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
        val extra: Seq[Any] =
          if (img == null) Seq(null, null, null)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val scale = math.min(1.0,
              math.min(maxW.toDouble / w, maxH.toDouble / h))
            if (scale >= 1.0) Seq(w, h, payload)
            else {
              val ow = math.max(1, math.floor(w * scale).toInt)
              val oh = math.max(1, math.floor(h * scale).toInt)
              val out = new java.awt.image.BufferedImage(ow, oh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, ow, oh, null)
              g.dispose()
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", baos)
              Seq(ow, oh, baos.toByteArray)
            }
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(enc)
  }

  /** STUB decode: metadata from header bytes — deterministic stand-in for
    * a real `decode(payload) -> (w, h, fmt)`. Narrow codegen'd projection. */
  def decodeStub(df: DataFrame): DataFrame =
    df.withColumn("byte_len", length(col("payload")))
      .withColumn("width", (pmod(crc32(col("payload")), lit(1280)) + 32).cast("int"))
      .withColumn("height", (pmod(crc32(reverse(col("payload"))), lit(720)) + 32).cast("int"))
      .withColumn("format",
        when(col("media_type") === "image", "png")
          .when(col("media_type") === "audio", "wav").otherwise("mp4"))

  /** Partition-batched STUB resize: aspect-preserving fit into a
    * (maxW, maxH) box — `out_width`/`out_height` carry the scaled
    * dimensions, and the payload is decimated by the same factor (every
    * k-th byte) as the stand-in for pixel resampling. This runs through
    * the mapPartitions batch seam because that is where a real resize
    * (libvips/ImageIO/JNI) plugs in with one context per partition;
    * payloads stay partition-local — no shuffle. */
  def resizeStub(df: DataFrame, maxW: Int = 256, maxH: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("out_width", IntegerType, nullable = false),
      StructField("out_height", IntegerType, nullable = false),
      StructField("resized", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val (pIdx, wIdx, hIdx) = (df.schema.fieldIndex("payload"),
      df.schema.fieldIndex("width"), df.schema.fieldIndex("height"))
    df.mapPartitions { rows =>
      // per-partition "image library" init happens here (stubbed)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val w = r.getInt(wIdx); val h = r.getInt(hIdx)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val ow = math.max(1, math.floor(w * scale).toInt)
        val oh = math.max(1, math.floor(h * scale).toInt)
        val step = math.max(1, math.floor(1.0 / scale).toInt)
        val resized = Array.range(0, payload.length, step).map(payload(_))
        Row.fromSeq(r.toSeq ++ Seq(ow, oh, resized))
      }
    }(enc)
  }

  /** STUB frame-sample: one "frame" (byte slice) every `stride` bytes —
    * the array shape a real video sampler would emit. */
  def frameSample(df: DataFrame, stride: Int = 64, frameBytes: Int = 16): DataFrame =
    df.withColumn("frames",
      transform(
        sequence(lit(0),
          greatest(floor((length(col("payload")) - lit(frameBytes)) / lit(stride))
            .cast("int"), lit(0))),
        i => col("payload").substr(i * stride + 1, lit(frameBytes))))

  /** Partition-batched feature extraction over a typed Dataset — the seam
    * where a real codec/model runs with per-partition init (one codec
    * context per task, rows streamed through it). */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      df.schema.fields :+ StructField("features", ArrayType(DoubleType), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition "codec" init happens here (stubbed)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val feat = Array.tabulate(dim) { d =>
          var h = 1125899906842597L + d
          var i = d
          while (i < payload.length) { h = 31 * h + payload(i); i += dim }
          (h & 0xFFFFFFL).toDouble / 0xFFFFFF.toDouble
        }
        Row.fromSeq(r.toSeq :+ feat.toSeq)
      }
    }(enc)
  }
}
