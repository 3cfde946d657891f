package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded per-item features. The decode itself is a STUB (this container
  * ships no image/audio codecs) — the Spark-side plumbing (schema,
  * partitioning, batched iteration, typed output) is real and tested. */
case class MediaFeature(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    n_bytes: Long,
    brightness: Double)

/** Multimodal columns: image/audio/video as opaque `binary` columns with a
  * typed metadata struct, plus a batched decode→feature-extract stage.
  *
  * Design for 100 TB: payloads stay columnar binary in parquet (never
  * stringified), metadata is a pruned-friendly struct, and decoding runs
  * `mapPartitions` so each task amortizes decoder setup over a whole
  * partition — the Scala analogue of `mapInPandas` batch shape. Repartition
  * count controls decode parallelism independently of file layout.
  */
object Multimodal {

  /** Attach a deterministic synthetic binary payload + metadata struct to
    * each row (stands in for real image bytes; derived from the id so
    * every engine/run agrees). */
  def withSyntheticMedia(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("media",
        unhex(concat(Seq.range(0, 8).map(i =>
          md5(concat(col(idCol).cast("string"), lit(s"_chunk$i")))): _*)))
      .withColumn("media_meta", struct(
        when(pmod(col(idCol), lit(3)) === 0, "png")
          .when(pmod(col(idCol), lit(3)) === 1, "jpeg")
          .otherwise("wav").as("format"),
        (pmod(col(idCol), lit(64)) * 16 + 64).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) * 16 + 64).cast("int").as("height"),
        length(col("media")).cast("long").as("n_bytes")))

  /** Batched decode + feature extraction over the binary column.
    *
    * The decoder body is a deterministic STUB (??? would be a codec call):
    * it "decodes" by folding payload bytes — byte-identical results
    * everywhere, so tests can assert on values. Partition count = decode
    * parallelism at scale.
    */
  def decodeFeatures(
      df: DataFrame, parallelism: Int = 0): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sized = if (parallelism > 0) df.repartition(parallelism) else df
    sized
      .select(col("doc_id"), col("media"), col("media_meta"))
      .as[(Long, Array[Byte], (String, Int, Int, Long))]
      .mapPartitions { rows =>
        // per-partition decoder setup happens once here (stub: nothing)
        rows.map { case (id, bytes, (fmt, w, h, n)) =>
          // STUB decode: real impl would decompress and measure pixels.
          // Modular fold (no wrapping overflow) so an external engine
          // can reproduce the value exactly — the pipe_multimodal
          // oracle recomputes this in DuckDB from the hex payload.
          var acc = 0L
          var i = 0
          while (i < bytes.length) {
            acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
            i += 1
          }
          val brightness = (acc % 1000000) / 1000000.0
          MediaFeature(id, fmt, w, h, n, brightness)
        }
      }
  }

  /** Resize plumbing: deterministic nearest-neighbor byte resample of the
    * payload to a fixed target (stub for a real scaler — the real impl
    * would decode, scale pixels, re-encode). Output keeps the exact
    * (doc_id, media, media_meta) shape of withSyntheticMedia, so it
    * chains straight into decodeFeatures and any other downstream
    * stage. newLen bytes, out[i] = in[i*len/newLen]. */
  def resizeStub(
      df: DataFrame, targetW: Int, targetH: Int,
      payloadBytes: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("media_meta"))
      .as[(Long, Array[Byte], (String, Int, Int, Long))]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, (fmt, _, _, _)) =>
          val out = new Array[Byte](payloadBytes)
          var i = 0
          while (i < payloadBytes) {
            out(i) = if (bytes.isEmpty) 0
              else bytes((i.toLong * bytes.length / payloadBytes).toInt)
            i += 1
          }
          (id, fmt, out)
        }
      }
      .toDF("doc_id", "format", "media")
      .select(col("doc_id"), col("media"), struct(
        col("format"),
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        length(col("media")).cast("long").as("n_bytes")).as("media_meta"))
  }

  /** Frame-sample plumbing for video-like payloads: split the payload
    * into `frameBytes` chunks, keep every `everyNth`-th chunk up to
    * `maxFrames` — the bounded 1→N explode shape real frame sampling
    * has at scale (fan-out is capped per row, so a shuffle after this
    * stage is ≤ maxFrames× the input rows, never payload-proportional). */
  def sampleFrames(
      df: DataFrame, frameBytes: Int = 16, everyNth: Int = 2,
      maxFrames: Int = 4): DataFrame = {
    require(frameBytes > 0 && everyNth > 0 && maxFrames > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          bytes.grouped(frameBytes).zipWithIndex
            .filter { case (_, idx) => idx % everyNth == 0 }
            .take(maxFrames)
            .map { case (frame, idx) => (id, idx, frame) }
        }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }

  /** End-to-end demo used by the rows-only query: synth media → decode →
    * per-format feature aggregate. */
  def featureSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    val media = withSyntheticMedia(docs.select(col("doc_id")), "doc_id")
    decodeFeatures(media, parallelism = 8).toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("brightness")) + 1e-9, 4).as("avg_brightness"),
        max(col("width")).cast("long").as("max_w"),
        max(col("height")).cast("long").as("max_h"))
      .orderBy(col("format"))
  }
}
