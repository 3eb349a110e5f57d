package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Multimodal-column plumbing (builder mandate): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs per-partition in batches.
  *
  * The actual media decode is STUBBED (`fakeDecode` — deterministic bytes→
  * feature mapping; media libraries are intentionally absent from this
  * environment). Everything Spark-side is real and tested: the
  * (id, payload, meta) schema, binary Encoder round-trip, per-partition
  * batched processing via mapPartitions (the JVM analogue of a batched
  * pandas-UDF), and the feature schema that downstream kNN consumes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      features: Array[Double])

  /** STUB decode: a real implementation would JPEG/PNG/PCM-decode the
    * payload; here features = first 8 payload bytes scaled to [0,1) — a
    * deterministic fake with the same output shape a decoder would have. */
  def fakeDecode(payload: Array[Byte]): Array[Double] =
    payload.take(8).map(b => (b & 0xff) / 256.0)

  /** STUB resize: a real implementation would rescale pixels/resample PCM;
    * here truncate-or-zero-pad to `n` bytes — deterministic, with the real
    * property a resize has (fixed output size regardless of input size). */
  def fakeResize(payload: Array[Byte], n: Int): Array[Byte] =
    java.util.Arrays.copyOf(payload, n)

  /** Batched per-partition feature extraction: one iterator pass, no
    * per-row task dispatch, executor-local — the shape a GPU/codec batch
    * would need at scale. */
  def featurize(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        // decode path: resize to a fixed frame, then feature-extract
        MediaFeatures(r.doc_id, r.mime, r.n_bytes,
          fakeDecode(fakeResize(r.payload, 32)))
      }
    }.toDF()
  }

  case class FrameFeatures(doc_id: Long, frame: Int, feature_sum: Double)

  /** STUB frame sampler: a real implementation would decode video and grab
    * every k-th frame; here each "frame" is a fixed-stride byte window of
    * the payload, featurized like fakeDecode. One input row fans out to
    * n_frames output rows — the explode-shaped decode stage a video corpus
    * needs, with the same batched per-partition execution as featurize. */
  def frameSample(spark: SparkSession, media: DataFrame, stride: Int,
      frameLen: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = r.payload.grouped(stride).zipWithIndex
        frames.map { case (window, i) =>
          FrameFeatures(r.doc_id, i,
            fakeDecode(window.take(frameLen)).sum)
        }
      }
    }.toDF()
  }

  /** End-to-end: manufacture binary payloads from document text (stand-in
    * for real media bytes), attach typed metadata, featurize, and emit a
    * scalar summary per row (arrays stay internal). */
  def pipeline(s: SparkSession, d: String): DataFrame = {
    val media = documents(s, d).select(
      col("doc_id"),
      encode(substring(col("text"), 1, 64), "UTF-8").as("payload"),
      when(col("doc_id") % 2 === 0, "image/png").otherwise("audio/wav").as("mime"),
      length(substring(col("text"), 1, 64)).cast("long").as("n_bytes"))
    featurize(s, media)
      .select(col("doc_id"), col("mime"), col("n_bytes"),
        size(col("features")).as("n_features"),
        aggregate(col("features"), lit(0.0), (a, x) => a + x).as("feature_sum"))
      .orderBy("doc_id")
  }
}
