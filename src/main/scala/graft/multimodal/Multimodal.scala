package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads plus
  * typed metadata, with decode/feature steps as partition-wise batch
  * functions.
  *
  * The decode path is REAL: [[synthesizeBmp]] writes genuine 24-bit BMP
  * files (public format, [[Bmp]]) into a binary column and [[decode]]
  * parses them back — headers, bottom-up padded BGR rows and all. The
  * Spark-side shape is what a production pipeline needs: BinaryType
  * column, typed Datasets, `mapPartitions` batching (the Scala analogue
  * of `mapInPandas`: one iterator per partition, amortized per-batch
  * codec setup, no per-row interpreter crossings), and explodable frame
  * samples. At 100 TB the payloads dominate I/O: keep them in their own
  * column so metadata-only queries prune the binary from the parquet
  * scan entirely.
  */
object Multimodal {

  case class Media(doc_id: Long, payload: Array[Byte], n_bytes: Int,
      width: Int, height: Int, n_frames: Int)

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

  /** A document's media as a real encoded image payload. */
  case class BmpMedia(doc_id: Long, payload: Array[Byte], n_bytes: Int)

  /** Features read out of a genuinely DECODED image. */
  case class DecodedFeatures(doc_id: Long, width: Int, height: Int,
      n_pixel_bytes: Int, brightness: Double)

  /** Synthesize a real 24-bit BMP payload per document: dimensions are
    * md5-derived (width/height in 1..16), pixel byte `i` of the
    * top-down RGB stream is `(doc_id + i) % 256` — a generative formula
    * the DuckDB oracle replays arithmetically while the ENGINE round-
    * trips it through a real encoder and parser (q28). Encoding runs
    * partition-wise over the typed Dataset.
    */
  def synthesizeBmp(docs: DataFrame)(implicit s: SparkSession): Dataset[BmpMedia] = {
    import s.implicits._
    val h = md5(col("text"))
    def byteAt(i: Int) = conv(substring(h, 2 * i + 1, 2), 16, 10).cast("int")
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      (byteAt(0) % 16 + 1).as("w"),
      (byteAt(1) % 16 + 1).as("h"))
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, w, hh) =>
        val rgb = Array.tabulate(w * hh * 3)(i => ((id + i) % 256).toByte)
        val payload = Bmp.encode(Bmp.Image(w, hh, rgb))
        BmpMedia(id, payload, payload.length)
      })
  }

  /** Sniff-and-decode an image payload by magic bytes: `BM` → the BMP
    * codec, the 8-byte PNG signature → the PNG codec, SOI (FFD8) → the
    * baseline-grayscale JPEG codec. Every image door
    * (feature decode, resize, dHash) dispatches here, so a corpus
    * mixing both formats — the realistic case — flows through one
    * relation with no per-format plumbing. Unknown magic throws (the
    * loud-codec-boundary contract).
    */
  def decodeImage(payload: Array[Byte]): Bmp.Image =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      Bmp.decode(payload)
    else if (payload.length >= 8 && (payload(0) & 0xff) == 0x89 &&
        payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G')
      Png.decode(payload)
    else if (payload.length >= 2 && (payload(0) & 0xff) == 0xff &&
        (payload(1) & 0xff) == 0xd8)
      Jpeg.decode(payload)
    else throw new IllegalArgumentException(
      "unknown image format (magic bytes match neither BMP, PNG nor JPEG)")

  /** REAL decoder: parse each payload ([[Bmp.decode]]/[[Png.decode]]
    * via [[decodeImage]] magic sniffing — header validation, real
    * de-filtering/inflate for PNG) and emit the decoded dimensions
    * plus mean pixel brightness (Σ channel bytes / n / 255).
    * Runs partition-wise so codec setup amortizes per partition, not
    * per row — the `mapInPandas` batching shape.
    */
  def decode(media: Dataset[BmpMedia])(implicit s: SparkSession): Dataset[DecodedFeatures] = {
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val img = decodeImage(m.payload)
        var sum = 0L
        var i = 0
        while (i < img.rgb.length) { sum += (img.rgb(i) & 0xff); i += 1 }
        val brightness = sum.toDouble / img.rgb.length / 255.0
        DecodedFeatures(m.doc_id, img.width, img.height, img.rgb.length,
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

  /** REAL resize — decode, aspect-preserving nearest-neighbor resample
    * into `maxSide`, re-encode. Already-small media pass through with
    * their original payload untouched. Same partition-wise batching
    * contract as [[decode]].
    */
  def resize(media: Dataset[BmpMedia], maxSide: Int)(
      implicit s: SparkSession): Dataset[BmpMedia] = {
    import s.implicits._
    require(maxSide > 0, "maxSide > 0")
    media.mapPartitions { rows =>
      rows.map { m =>
        val img = decodeImage(m.payload)
        val side = math.max(img.width, img.height)
        if (side <= maxSide) m
        else {
          val scale = maxSide.toDouble / side
          val w = math.max(1, math.round(img.width * scale).toInt)
          val h = math.max(1, math.round(img.height * scale).toInt)
          // re-encode in the payload's own format
          val resampled = Bmp.resample(img, w, h)
          val out =
            if (m.payload(0) == 'B') Bmp.encode(resampled)
            else Png.encode(resampled)
          BmpMedia(m.doc_id, out, out.length)
        }
      }
    }
  }
}
