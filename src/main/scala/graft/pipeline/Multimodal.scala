package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json north star).
  *
  * Media (image/audio/video) are opaque `binary` columns with a typed
  * metadata struct. The decode / feature-extract stage runs as a
  * `mapPartitions` over the binary payloads — the Scala analog of a
  * Pandas-UDF `mapInPandas` stage: batch-oriented, executor-side, one codec
  * instance per partition. The actual codec is STUBBED (no image/audio libs
  * in this container) with a deterministic fake whose outputs are pure
  * functions of the bytes — the Spark-side plumbing (schema, partitioning,
  * batch shape, feature join-back) is real and oracle-checked.
  */
object Multimodal {

  /** Media record schema: id + binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("n_bytes", LongType))), nullable = true)))

  /** Wrap a text table as a media table (payload = UTF-8 bytes). Stands in
    * for `spark.read.format("binaryFile")` over a media lake.
    */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String,
                    sourceCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      lit("image/fake").as("media_type"),
      col(textCol).cast("binary").as("payload"),
      struct(col(sourceCol).as("source"),
        length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** Exact payload dedup census — the first media-dedup pass every lake
    * runs: hash the raw bytes, group, keep the smallest id. One hash-keyed
    * shuffle with map-side partial aggregation; at 100 TB this is the
    * cheap screen that runs BEFORE any decode.
    * Returns (fp = md5 of the payload bytes, n_copies, keeper_id).
    */
  def exactDupCensus(media: DataFrame): DataFrame =
    media.groupBy(md5(col("payload")).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("keeper_id"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("head_byte", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("fake_width", IntegerType, nullable = false),
    StructField("fake_height", IntegerType, nullable = false)))

  /** "Decode" each payload per partition. Deterministic fake codec:
    * checksum = foldl (acc*131 + byte) % 1e9+7; width/height derived from
    * byte length. A real deployment swaps `decodeOne` for an image decoder —
    * the partition loop, batch shape, and output schema stay identical.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "payload").rdd.mapPartitions { it =>
      // per-partition "codec" init happens here in a real implementation
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val (n, head, sum) = decodeOne(bytes)
        Row(id, n, head, sum, (n % 640L + 1L).toInt, (n % 480L + 1L).toInt)
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", LongType, nullable = false),
    StructField("frame_checksum", LongType, nullable = false)))

  /** Frame sampling: split each payload into `frameBytes`-sized frames and
    * keep every `every`-th one (the video-keyframe-sampling shape: one input
    * row explodes into a bounded number of frame rows, decoded
    * executor-side). The stub "decode" checksums the frame's bytes; a real
    * deployment swaps in a video demuxer — the flatMap-per-payload shape,
    * schema, and sampling policy stay identical.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256,
                   every: Int = 4): DataFrame = {
    require(frameBytes > 0 && every > 0)
    val spark = media.sparkSession
    val rows = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator.filter(_ % every == 0).map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, bytes.length)
          var acc = 0L
          var i = from
          while (i < until) {
            acc = (acc * 131 + (bytes(i) & 0xff)) % 1000000007L
            i += 1
          }
          Row(id, f, (until - from).toLong, acc)
        }
      }
    }
    spark.createDataFrame(rows, frameSchema)
  }

  private def decodeOne(bytes: Array[Byte]): (Long, Int, Long) = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 131 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    (bytes.length.toLong, if (bytes.isEmpty) -1 else bytes(0) & 0xff, acc)
  }
}
