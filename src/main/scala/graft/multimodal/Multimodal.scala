package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads plus
  * typed metadata, with decode/feature steps as partition-wise batch
  * functions.
  *
  * The actual image/audio codecs are NOT available in this environment,
  * so [[decodeStub]] is a clearly-marked deterministic fake — but the
  * Spark-side shape is the real thing: BinaryType column, a typed
  * `Dataset[Media]`, `mapPartitions` batching (the Scala analogue of
  * `mapInPandas`: one iterator per partition, amortized per-batch setup,
  * no per-row interpreter crossings), and explodable frame samples. At
  * 100 TB the payloads dominate I/O: keep them in their own column so
  * metadata-only queries prune the binary from the parquet scan entirely.
  */
object Multimodal {

  case class Media(doc_id: Long, payload: Array[Byte], n_bytes: Int,
      width: Int, height: Int, n_frames: Int)

  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, n_frames: Int, brightness: Double)

  /** Synthesize a deterministic binary payload column for testdata
    * documents (md5 bytes of the text standing in for encoded media) and
    * derive metadata the way a real header-sniffing decoder would.
    */
  def synthesize(docs: DataFrame): DataFrame = {
    val h = md5(col("text"))
    def byteAt(i: Int) = conv(substring(h, 2 * i + 1, 2), 16, 10).cast("int")
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      unhex(h).as("payload"),
      length(unhex(h)).as("n_bytes"),
      (byteAt(0) % 64 * 16 + 32).as("width"),
      (byteAt(1) % 64 * 16 + 32).as("height"),
      (byteAt(2) % 8 + 1).as("n_frames"))
  }

  /** STUB decoder — the real implementation would decode `payload` with
    * an image/video library here; this environment has none, so features
    * are computed deterministically from the payload bytes. Runs
    * partition-wise so a real decoder would amortize codec init per
    * partition, not per row.
    */
  def decodeStub(media: Dataset[Media])(implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would go here (codec handles, model weights)
      rows.map { m =>
        val brightness = // ??? real decode; fake: mean byte / 255
          if (m.payload.isEmpty) 0.0
          else m.payload.map(b => (b & 0xff).toDouble).sum / m.payload.length / 255.0
        MediaFeatures(m.doc_id, m.n_bytes, m.width, m.height, m.n_frames,
          brightness)
      }
    }
  }

  /** REAL (non-stub) byte-level feature extraction over the binary
    * payload column: per-document byte statistics — mean/min/max byte,
    * distinct byte values, and the collision mass Σ c_v² (the exact
    * integer core of Rényi-2 entropy; low mass = high-entropy payload,
    * the cheap compressed-vs-structured signal). The payload bytes come
    * out of `hex()` + codegen substring/conv — no UDF — and the
    * heavy lifting is a relational explode + two aggregations keyed on
    * (doc, byte): the same scale shape as the text n-gram pipeline, so
    * 100 TB of payloads shard by document like everything else.
    */
  def byteFeatures(media: DataFrame, nBytes: Int = 16): DataFrame = {
    val hx = hex(col("payload"))
    val byteCols = (0 until nBytes).map(i =>
      conv(substring(hx, 2 * i + 1, 2), 16, 10).cast("int"))
    val bytes = media.select(col("doc_id"),
      explode(array(byteCols: _*)).as("b"))
    bytes.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        (sum(col("b") * col("c")).cast("double") / nBytes).as("mean_byte"),
        min(col("b")).as("b_min"),
        max(col("b")).as("b_max"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * col("c")).as("collision_mass"))
  }

  /** Deterministic frame sampling: one row per sampled frame index. */
  def sampleFrames(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))

  case class ResizedMedia(doc_id: Long, payload: Array[Byte], n_bytes: Int,
      width: Int, height: Int, n_frames: Int)

  /** STUB resize — aspect-preserving fit into `maxSide` with the real
    * pixel work faked: dimensions follow the true resize arithmetic
    * (already-small media pass through untouched), the payload is
    * deterministically re-sampled to the scaled byte budget. Same
    * partition-wise batching contract as [[decodeStub]].
    */
  def resizeStub(media: Dataset[Media], maxSide: Int)(
      implicit s: SparkSession): Dataset[ResizedMedia] = {
    import s.implicits._
    require(maxSide > 0, "maxSide > 0")
    media.mapPartitions { rows =>
      rows.map { m =>
        val side = math.max(m.width, m.height)
        if (side <= maxSide)
          ResizedMedia(m.doc_id, m.payload, m.n_bytes, m.width, m.height,
            m.n_frames)
        else {
          val scale = maxSide.toDouble / side
          val w = math.max(1, math.round(m.width * scale).toInt)
          val h = math.max(1, math.round(m.height * scale).toInt)
          // ??? real decode+rescale+re-encode; fake: byte budget scales
          // with area, content re-sampled by stride from the original
          val budget = math.max(1,
            math.round(m.payload.length * scale * scale).toInt)
          val out = Array.tabulate(budget)(i =>
            m.payload((i.toLong * m.payload.length / budget).toInt))
          ResizedMedia(m.doc_id, out, out.length, w, h, m.n_frames)
        }
      }
    }
  }
}
