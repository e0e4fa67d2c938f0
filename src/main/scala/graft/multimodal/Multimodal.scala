package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal asset processing over opaque binary columns.
  *
  * Design for 100 TB: assets stay as parquet BINARY columns co-located with
  * their metadata; decode/feature-extraction runs inside `mapPartitions`
  * (one codec instance per partition, streaming through rows — the Scala
  * analogue of batched pandas UDFs), so the expensive step is embarrassingly
  * parallel and never widens the shuffle: features (small, fixed-width)
  * are what flows downstream, not the raw bytes.
  *
  * The real image/audio codecs are NOT on this image, so `FakeDecoder`
  * produces deterministic per-byte "pixels"; production swaps in a JNI/
  * javax.imageio decoder behind the same trait without touching any of the
  * Spark plumbing (which is what's tested).
  */
object Multimodal {

  /** One media asset: payload + typed metadata. */
  case class Asset(doc_id: Long, asset: Array[Byte], mime: String)

  /** Decoded frame: dimensions + flat pixel buffer. */
  case class Frame(width: Int, height: Int, channels: Int,
      pixels: Array[Float])

  /** Fixed-width feature row the pipeline emits downstream. */
  case class AssetFeatures(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, mean_intensity: Float, features: Array[Float])

  /** Pluggable codec boundary. */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): Frame
  }

  /** Deterministic stand-in for a real codec (none available offline):
    * "pixels" are the bytes scaled to [0,1), dimensions derived from
    * length. Same contract, fake content. */
  object FakeDecoder extends Decoder {
    def decode(bytes: Array[Byte]): Frame = {
      val w = bytes.length % 64 + 16
      val h = bytes.length % 48 + 12
      val px = new Array[Float](math.min(bytes.length, w * h))
      var i = 0
      while (i < px.length) { px(i) = (bytes(i) & 0xff) / 256.0f; i += 1 }
      Frame(w, h, 1, px)
    }
  }

  val assetSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("asset", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true)))

  /** Wrap any table with a binary payload column into the asset schema. */
  def toAssets(df: DataFrame, idCol: String, binCol: String,
      mime: String): Dataset[Asset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
      col(binCol).cast("binary").as("asset"), lit(mime).as("mime"))
      .as[Asset]
  }

  /** Decode + featurize, one codec per partition (mapPartitions keeps
    * per-partition init O(1) and preserves partitioning — no shuffle). */
  def featurize(assets: Dataset[Asset], decoder: Decoder,
      dim: Int = 8): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val bytes = Option(a.asset).getOrElse(Array.emptyByteArray)
        val f = decoder.decode(bytes)
        val feats = new Array[Float](dim)
        var i = 0
        while (i < f.pixels.length) {
          feats(i % dim) += f.pixels(i)
          i += 1
        }
        val mean =
          if (f.pixels.length == 0) 0.0f
          else f.pixels.sum / f.pixels.length
        AssetFeatures(a.doc_id, bytes.length, f.width, f.height, mean, feats)
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size block of the payload
    * (video-frame stand-in). Pure column ops — stays in codegen. */
  def sampleFrames(df: DataFrame, binCol: String, frameBytes: Int,
      stride: Int): DataFrame =
    df.withColumn("n_frames",
        (length(col(binCol)) / frameBytes).cast("int"))
      // payloads shorter than one frame produce zero frames, not a
      // truncated one
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(expr(s"sequence(0, n_frames - 1, $stride)")))
      .withColumn("frame",
        expr(s"substring($binCol, frame_idx * $frameBytes + 1, $frameBytes)"))
}
