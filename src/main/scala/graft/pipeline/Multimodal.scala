package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as batched per-partition transforms (the JVM analogue of
  * `mapInPandas` — one buffer of rows at a time, vectorizable by the codec).
  *
  * The actual codecs are NOT available in this environment, so the decode
  * kernels below are STUBS: `fakeDecode*` derive deterministic pseudo
  * features from the bytes. The Spark-side contract — schemas, partitioning,
  * batch shape, null handling — is real and tested; swapping in a real codec
  * is a one-function change inside the mapPartitions body.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("format", StringType)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** STUB decode kernel: derives (width, height, channels, feature vector)
    * deterministically from the payload bytes. Replace the body with a real
    * image codec (e.g. javax.imageio / ffmpeg JNI) in production.
    */
  private[pipeline] def fakeDecodeImage(bytes: Array[Byte], featureDim: Int): Row = {
    if (bytes == null) return null
    var h = 1125899906842597L // deterministic FNV-ish fold of the payload
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    val width = 16 + math.floorMod(h, 1024).toInt
    val height = 16 + math.floorMod(h >> 10, 1024).toInt
    val features = new Array[Float](featureDim)
    var j = 0
    var s = h
    while (j < featureDim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      features(j) = (s >>> 40).toFloat / (1 << 24).toFloat
      j += 1
    }
    Row(width, height, 3, features.toSeq)
  }

  /** Decode a binary image column into a typed struct, batched per
    * partition. Repartitions by payload hash first so decode work is
    * balanced across executors regardless of upstream file layout (at
    * 100 TB, media payloads skew heavily by source).
    */
  def decodeImages(
      df: DataFrame, binCol: String, outCol: String = "decoded",
      featureDim: Int = 64, rebalance: Boolean = true): DataFrame = {
    val base = if (rebalance) df.repartition(xxhash64(col(binCol))) else df
    val inSchema = base.schema
    val outSchema = StructType(inSchema.fields :+ StructField(outCol, decodedSchema))
    base.mapPartitions { it =>
      // batch shape: the iterator itself is the batch; the stub is per-row,
      // a real codec would drain `it` in fixed-size buffers
      it.map { row =>
        Row.fromSeq(row.toSeq :+ fakeDecodeImage(
          row.getAs[Array[Byte]](inSchema.fieldIndex(binCol)), featureDim))
      }
    }(Encoders.row(outSchema))
  }

  /** STUB resize: recomputes metadata for a target box, keeping features.
    * Real implementation re-decodes at target resolution.
    */
  def resize(df: DataFrame, decodedCol: String, maxSide: Int): DataFrame = {
    val d = col(decodedCol)
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(d.getField("width"), d.getField("height"))
        .cast("double"))
    df.withColumn(decodedCol, struct(
      (d.getField("width") * scale).cast("int").as("width"),
      (d.getField("height") * scale).cast("int").as("height"),
      d.getField("channels").as("channels"),
      d.getField("features").as("features")))
  }

  /** STUB frame sampling for video payloads: emits `frames` copies of the
    * decoded struct with a frame index (a real implementation decodes the
    * container and seeks). Output is exploded — one row per sampled frame.
    */
  def sampleFrames(df: DataFrame, decodedCol: String, frames: Int): DataFrame =
    df.withColumn("frame_index", explode(sequence(lit(0), lit(frames - 1))))

  /** Audio STUB: fixed-rate windowed feature extraction from a binary
    * payload — emits (windowIndex, features) rows. Real implementation runs
    * an FFT per window.
    */
  def extractAudioFeatures(
      df: DataFrame, binCol: String, windows: Int = 4, featureDim: Int = 16): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("window_index", IntegerType),
      StructField("features", ArrayType(FloatType))))
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](inSchema.fieldIndex(binCol))
        (0 until windows).iterator.map { w =>
          val fake = fakeDecodeImage(
            if (bytes == null) null else bytes ++ Array(w.toByte), featureDim)
          Row.fromSeq(row.toSeq ++ Seq(w,
            if (fake == null) null else fake.getSeq[Float](3)))
        }
      }
    }(Encoders.row(outSchema))
  }
}
