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

  /** Scaled-integer 8-point DCT-II cosine table:
    * T(u)(x) = round(cos(π·(2x+1)·u / 16) · 10^4). The SCALED-INTEGER
    * table (not runtime doubles) is the load-bearing choice: every pHash
    * quantity downstream is exact Long arithmetic over these constants,
    * so the DuckDB oracle replays the hash bit-for-bit — a transcendental
    * evaluated independently by two engines can differ in the last ulp
    * and flip a bit that sits on the median threshold. Unnormalized
    * DCT-II matches the common pHash implementations (pHash.org,
    * python imagehash), which feed scipy's unnormalized dct.
    */
  private[graft] val DctScale = 10000L
  private[graft] val dctTable: Array[Long] = {
    val t = new Array[Long](64)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) =
        Math.round(Math.cos(Math.PI * (2 * x + 1) * u / 16.0) * DctScale)
    t
  }

  /** DCT perceptual hash of one payload under the stub codec: the bytes
    * "decode" to an 8×8 integer cell matrix (cell j = byte-sum of the
    * j-th of 64 equal chunks — the stand-in for grayscale block
    * averaging), a 2D unnormalized DCT-II runs in scaled-integer
    * arithmetic, the DC coefficient is dropped, and bit k−1 (k = 1..63)
    * is set iff coefficient k exceeds the median of the 63 AC
    * coefficients. Top bit always 0 → 63-bit Hamming space. A re-encoded
    * image (small per-byte perturbations) moves each cell sum slightly,
    * so only coefficients NEAR the median flip — the usual pHash
    * robustness argument, inherited by the stub.
    */
  private[pipeline] def phashOf(bytes: Array[Byte]): Long = {
    val len = bytes.length
    val cells = new Array[Long](64)
    var j = 0
    while (j < 64) {
      var i = j * len / 64
      val until = (j + 1) * len / 64
      var s = 0L
      while (i < until) { s += (bytes(i) & 0xff); i += 1 }
      cells(j) = s
      j += 1
    }
    val coefs = new Array[Long](64) // index u*8+v; [0] = DC, unused
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            acc += cells(x * 8 + y) * dctTable(u * 8 + x) * dctTable(v * 8 + y)
            y += 1
          }
          x += 1
        }
        coefs(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(coefs, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31) // 63 values, exact middle
    var h = 0L
    var k = 1
    while (k < 64) {
      if (coefs(k) > med) h |= 1L << (k - 1)
      k += 1
    }
    h
  }

  /** Deterministic stub "re-encoder": per payload, every `every`-th byte
    * shifts by ±1 (value-preserving-ish noise, SAME length — the shape of
    * lossy re-compression, which perturbs pixel values but keeps image
    * dimensions; pHash, real or stub, is robust to value noise and NOT to
    * length/crop changes). Emits one re-encoded twin per input row with
    * `idOffset` added to its id. Used by the mm_phash_pairs gate to plant
    * perceptual dups that the byte-hash screen provably misses.
    */
  def reencodeStub(media: DataFrame, idOffset: Long,
                   every: Int = 50): DataFrame = {
    require(every > 0)
    val spark = media.sparkSession
    val rows = media.select("media_id", "media_type", "payload", "meta")
      .rdd.mapPartitions { it =>
        it.map { r =>
          val bytes = Option(r.getAs[Array[Byte]](2))
            .getOrElse(Array.emptyByteArray)
          val out = bytes.clone()
          var i = 0
          while (i < out.length) {
            if (i % every == 0) {
              val b = out(i) & 0xff
              out(i) = (if (b <= 110) b + 1 else b - 1).toByte
            }
            i += 1
          }
          Row(r.getLong(0) + idOffset, r.getString(1), out, r.get(3))
        }
      }
    spark.createDataFrame(rows, media.select(
      "media_id", "media_type", "payload", "meta").schema)
  }

  /** Per-media pHash table (media_id, phash) — the decode-stage feature a
    * real deployment computes right after the exact-bytes screen
    * ([[exactDupCensus]]): a re-encoded image has different bytes (so the
    * md5 screen misses it) but a nearby pHash.
    */
  def phashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes =
          Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        Row(r.getLong(0), phashOf(bytes))
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false))))
  }

  /** Perceptual near-duplicate pairs: banded LSH over the 63 pHash bits —
    * the [[Dedup.simhashPairs]] pigeonhole machinery applied to media
    * (9 bands × 7 bits; Hamming distance ≤ maxDist = 8 forces at least
    * one identical band), candidates verified by exact XOR popcount
    * BEFORE the distinct so only surviving pairs shuffle. Never all-pairs:
    * the join is equi on (band, key).
    */
  def phashPairs(media: DataFrame, maxDist: Int = 8): DataFrame = {
    require(maxDist >= 0 && maxDist < 63, s"maxDist out of range: $maxDist")
    val nBands = maxDist + 1
    val bandBits = 63 / nBands
    val bandCols = (0 until nBands).map { b =>
      val lo = b * bandBits
      val width = if (b == nBands - 1) 63 - lo else bandBits
      struct(lit(b).as("band"),
        (shiftright(col("phash"), lo) % (1L << width)).as("key"))
    }
    val bands = phashes(media)
      .select(col("media_id"), col("phash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("media_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .cache() // self-join: probe and build sides share one decode pass
    bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        bit_count(expr("x.phash").bitwiseXOR(expr("y.phash"))).as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
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
