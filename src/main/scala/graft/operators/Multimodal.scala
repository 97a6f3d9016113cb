package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * plumbing.
  *
  * The actual codecs are NOT in this container, so the decode kernels are
  * STUBBED with deterministic fakes (clearly marked below) — but everything
  * Spark-side is real and tested: the schema shape, the batched
  * `mapPartitions` execution (the Scala analogue of `mapInPandas` — one
  * iterator per partition, amortizing per-batch codec setup), partitioning,
  * and the column plumbing. Swapping a real decoder in changes only the
  * kernel body.
  *
  * Scale notes: media blobs dominate bytes at 100 TB. The schema keeps
  * metadata in separate scalar columns so Catalyst can prune the blob column
  * entirely for metadata-only queries (a metadata query never reads the
  * bytes); decode stages are pure maps (no shuffle), so they pipeline with
  * the scan and scale with executors.
  */
object Multimodal {

  /** media row schema: blob + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("bytes", BinaryType, nullable = true),      // opaque blob
    StructField("n_bytes", LongType, nullable = true),
    StructField("mime", StringType, nullable = true)))

  /** wrap any table with a text-ish payload column into media rows (test
    * harness: the container has no real media, so blobs are utf-8 bytes). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      to_binary(col(payloadCol), lit("utf-8")).as("bytes"),
      octet_length(col(payloadCol)).cast(LongType).as("n_bytes"),
      lit("application/octet-stream").as("mime"))

  /** bridge rows from `Sources.readBinaryFiles` (binaryFile source:
    * path/modificationTime/length/content) into the media schema — the real
    * on-disk media on-ramp. media_id is the content-independent xxhash64 of
    * the path (stable across re-ingests of the same tree); the original
    * path rides along for provenance. Kind/mime come from the extension via
    * a literal map — a pure codegen'd projection, no UDF. */
  def asMediaFromBinary(binary: DataFrame, kind: String = "image",
                        mime: String = "application/octet-stream"): DataFrame =
    binary.select(
      xxhash64(col("path")).as("media_id"),
      lit(kind).as("kind"),
      col("content").as("bytes"),
      col("length").cast(LongType).as("n_bytes"),
      lit(mime).as("mime"),
      col("path"))

  /** decoded-image feature row. */
  case class MediaFeatures(media_id: Long, width: Int, height: Int,
                           mean_intensity: Double, feature_hash: Long)

  /** STUB KERNEL — deterministic fake "decode": derives width/height/hash
    * from the first 32 bits of md5(bytes) (unsigned) and mean intensity from
    * the byte values. md5-derived (like the portable minhash/simhash
    * pipelines) so a DuckDB oracle can replicate the fake exactly. A real
    * implementation would call an image codec here (and nothing else in this
    * file would change). */
  private def fakeDecode(md: java.security.MessageDigest, id: Long,
                         bytes: Array[Byte]): MediaFeatures = {
    md.reset()
    val d = md.digest(bytes)
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val w = (16 + h % 1024).toInt
    val ht = (16 + (h / 1024) % 1024).toInt
    val mean = if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    // HALF_UP like every other rounding path (math.rint's HALF_EVEN diverges
    // from the oracle's round() on exact .5 micro-units, e.g. mean 93.7265625)
    MediaFeatures(id, w, ht, math.floor(mean * 1e6 + 0.5) / 1e6, h)
  }

  /** batched decode via mapPartitions: one kernel instantiation per
    * partition, streaming rows through it — the shape a real (expensive to
    * initialize) decoder needs. Blob column read once, features out. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codec init would happen once here, per partition (the digest
        // instance stands in for it)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          fakeDecode(md, id, Option(bytes).getOrElse(Array.empty)) }
      }
  }

  /** STUB "resize": deterministic truncation of the blob to maxBytes —
    * stands in for a real resize kernel; plumbing (binary→binary map,
    * metadata update) is real. */
  def resize(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("bytes",
        expr(s"substring(bytes, 1, $maxBytes)").cast(BinaryType))
      .withColumn("n_bytes", least(col("n_bytes"), lit(maxBytes.toLong)))

  /** STUB "frame sample": for video-kind rows, emit every k-th byte-window as
    * a "frame" — stands in for real frame extraction; the explode shape
    * (one row in, n frames out) is the real plumbing. */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    val nFrames = greatest(lit(1),
      floor(col("n_bytes") / lit((frameBytes * everyK).toLong))).cast(IntegerType)
    media.select(col("media_id"), col("kind"), col("n_bytes"),
        posexplode(transform(sequence(lit(0), nFrames - 1),
          i => (i * everyK * frameBytes).cast(LongType)))
        .as(Seq("frame_no", "byte_offset")))
      .select("media_id", "kind", "frame_no", "byte_offset")
  }

  /** metadata-only scan — demonstrates blob-column pruning: this plan never
    * reads `bytes` (check ReadSchema in explain). */
  def metadataStats(media: DataFrame): DataFrame =
    media.groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum("n_bytes").as("total_bytes"),
      round(avg("n_bytes"), 4).as("avg_bytes"))
}
