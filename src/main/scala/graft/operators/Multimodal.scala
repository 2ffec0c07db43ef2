package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` payloads + typed metadata; decode / feature-extract /
  * resize / frame-sample run as partition-batched transforms.
  *
  * The actual codec step is STUBBED (this environment has no image/audio
  * libraries): `decodeStub` derives deterministic fake (width, height,
  * format) metadata from the payload header bytes, and `featureStub`
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
