package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs.
  *
  * The decode step itself (codec call) is the stubbed boundary — this
  * container has no image/audio libraries, so [[decodeStub]] derives a
  * deterministic fake from the bytes. Everything around it is real and
  * what actually matters at scale: schema, per-partition batch iteration
  * (the Scala analogue of `mapInPandas` — one decoder context per
  * partition, not per row), partitioning control, and a narrow metadata
  * projection so the binary payload is only materialized where needed.
  */
object Multimodal {

  /** Typed metadata produced by the (stub) decoder. */
  case class MediaMeta(width: Int, height: Int, channels: Int, format: String)

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decoder: deterministic fake header parse. A real deployment
    * replaces only this function with the codec call (e.g. via JNI or an
    * image library); signature and callers are unchanged. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = if (payload == null) 0 else payload.length
    MediaMeta(
      width = (n % 640) + 1,
      height = ((n.toLong * 7) % 480).toInt + 1, // Int mul overflows >~306MB payloads
      channels = (n % 3) + 1,
      format = if (n % 2 == 0) "png" else "jpeg")
  }

  /** Attach an opaque binary payload column (here synthesized from text;
    * in production this is the raw media bytes column of the lakehouse
    * table). */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Decode payloads to metadata via per-partition batch iteration —
    * the decoder context is created once per partition (the point of
    * `mapInPandas`-style batching: amortize decoder init, keep columnar
    * batches together). Output: (doc_id, n_bytes, width, height,
    * channels, format). */
  def decodeMeta(withPayload: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = withPayload.sparkSession
    val rows: Dataset[Row] = withPayload.select(col(idCol).as("id"), col("payload"))
    import spark.implicits._
    rows.as[(Long, Array[Byte])].mapPartitions { it =>
      // one decoder context per partition (stub: nothing to init)
      it.map { case (id, payload) =>
        val m = decodeStub(payload)
        val n = if (payload == null) 0L else payload.length.toLong
        (id, n, m.width, m.height, m.channels, m.format)
      }
    }.toDF("doc_id", "n_bytes", "width", "height", "channels", "format")
  }

  /** Deterministic frame sampling plan for a (fake) video payload: every
    * `stride`-th frame index under `maxFrames` — pure column math, no
    * decode. A zero-frame video samples nothing (the `greatest` clamp
    * alone would fabricate frame index 0). */
  def frameSamplePlan(nFrames: org.apache.spark.sql.Column, stride: Int, maxFrames: Int): org.apache.spark.sql.Column =
    when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(slice(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)), 1, maxFrames))
}
