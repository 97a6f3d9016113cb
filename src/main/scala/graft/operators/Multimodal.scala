package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * plumbing.
  *
  * The image DECODE, image RESIZE, audio DECODE, audio FRAME, and VIDEO
  * FRAME-SAMPLING kernels are all REAL — `javax.imageio` /
  * `javax.sound.sampled` plus spec-level RIFF container parsers (pure
  * JVM, in every container) consuming actual PNG/BMP, RIFF/WAVE, and
  * AVI/RIFF byte streams through the batched `mapPartitions` shape a
  * production (expensive-to-initialize) codec needs. The container ships
  * no media FILES, so the test fixtures synthesize real PNG/WAV/AVI bytes
  * deterministically from row ids ([[encodeSyntheticPng]] /
  * [[encodeSyntheticWav]] / [[encodeSyntheticAvi]]) — the bytes are
  * genuine codec/container streams, and because the pixel/PCM/frame
  * content is a closed-form function of the id, SQL oracles verify the
  * decoded features exactly. Video uses MPNG-in-AVI (lossless PNG frame
  * payloads in a real AVI container) rather than MJPEG because the JVM
  * ships no video codec and JPEG's lossy transform would break exact
  * oracles; the container parse, frame sampling, and per-frame decode are
  * the production shape either way. [[truncateBlob]] is a BYTE operator
  * by contract (budget cap), not a stand-in.
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
    * harness for the metadata/frame plumbing: blobs are utf-8 bytes). */
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

  /** the synthetic-image pixel law, shared by [[encodeSyntheticPng]], the
    * decode unit test, and (as SQL) the q_media_decode oracle:
    * width = 8 + id mod 9, height = 8 + (id div 9) mod 9, and pixel
    * (x, y) carries gray value (x + 31·y + id) mod 256. All non-negative
    * integer arithmetic — `div`/`mod` agree across Scala, Spark, and
    * DuckDB — so the decoded width/height/pixel-sum are exactly
    * predictable from the id alone. */
  private[graft] def synthDims(id: Long): (Int, Int) =
    ((8 + (id % 9)).toInt, (8 + ((id / 9) % 9)).toInt)
  private[graft] def synthGray(id: Long, x: Int, y: Int): Int =
    ((x + 31L * y + id) % 256).toInt

  /** deterministic REAL-PNG fixture generator: one grayscale PNG per row,
    * rendered via `java.awt.image.BufferedImage` (TYPE_BYTE_GRAY) and
    * encoded by `javax.imageio` inside the same batched mapPartitions
    * shape the decode side uses — so [[decodeFeatures]] exercises a real
    * codec on real byte streams even though the container ships no media
    * files. PNG encoding of an 8-bit gray raster is lossless and
    * byte-deterministic for the JVM's ImageIO writer; the DECODED content
    * (what the pipeline verifies) is deterministic across any compliant
    * codec by the PNG spec. */
  def encodeSyntheticPng(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = Fan.out(df.select(col(idCol).cast(LongType))).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache churn
        it.map { id =>
          require(id >= 0, s"encodeSyntheticPng: ids must be non-negative " +
            s"(got $id) — the pixel law's div/mod identities across " +
            "engines hold only there (the q_retention doctrine)")
          val (w, h) = synthDims(id)
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, synthGray(id, x, y)); x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream(256)
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
    encoded.select(
      col("_1").as("media_id"),
      lit("image").as("kind"),
      col("_2").as("bytes"),
      octet_length(col("_2")).cast(LongType).as("n_bytes"),
      lit("image/png").as("mime"))
  }

  /** decoded-image feature row: dimensions, mean intensity (mean over all
    * pixel samples across bands, rounded half-up to 6 dp — the house
    * rounding rule), and the exact integer sample sum (the oracle-checkable
    * raw statistic). Undecodable blobs yield (-1, -1, 0.0, 0) — a corrupt
    * blob in a 100 TB scan must mark, not kill, the job; count the -1s
    * downstream. */
  case class MediaFeatures(media_id: Long, width: Int, height: Int,
                           mean_intensity: Double, pixel_sum: Long)

  /** REAL image decode via batched mapPartitions: `javax.imageio` reads
    * each blob (PNG/BMP/GIF/JPEG — whatever the JVM's registered readers
    * handle), features come from raster SAMPLES (no colorspace conversion:
    * `getRGB` would gamma-map instead of returning stored values). One
    * `setUseCache` init per partition stands where a real codec pins its
    * native context; rows stream through the iterator — no shuffle, the
    * stage pipelines with the scan and scales with executors. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(
                Option(bytes).getOrElse(Array.empty)))
            catch { case _: Exception => null }
          if (img == null) MediaFeatures(id, -1, -1, 0.0, 0L)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            val bands = raster.getNumBands
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var b = 0
                while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
                x += 1
              }
              y += 1
            }
            val mean = sum.toDouble / (w.toLong * h * bands)
            // HALF_UP like every other rounding path (math.rint's HALF_EVEN
            // diverges from the oracle's round() on exact .5 micro-units)
            MediaFeatures(id, w, h, math.floor(mean * 1e6 + 0.5) / 1e6, sum)
          }
        }
      }
  }

  /** NEAR-DUP PNG fixture generator for the image perceptual-hash dedup
    * family: one genuine 18×16 grayscale PNG per row, pixel law
    * (i²·k + i·c + y²·k3 + bump) mod 256 with i = x + 18y + 1 and all
    * three coefficients derived from the row's GROUP (base = id − id mod
    * 4; k = 2·((base·2654435761) mod 127) + 1, c = (base·40503) mod 251,
    * k3 = (base·69069) mod 256). The QUADRATIC i² term makes the
    * per-pixel step k·(2i+1) vary along the raster — gradient bits come
    * out near-balanced for every k (a LINEAR law's bits are wrap-position
    * indicators: biased for small k, and constant offsets are mere
    * brightness shifts that dHash rightly ignores — measured as a 100x
    * bucket-collapse before this law); the c and k3 terms vary the step
    * pattern per class, so the ~125k-group GenScale corpus lands every
    * group a DISTINCT base hash (simulated: max class multiplicity 2,
    * banded candidate mass under the production cap at 100x). bump = 128
    * at the single pixel (2m, 2m), m = id mod 4 — a one-pixel member
    * perturbation that flips at most two dHash bits, planting hamming ≤ 4
    * within each group of four against ~32 expected across groups. All
    * integer arithmetic, replayed exactly by the q_image_* oracles. */
  def encodeSyntheticPngGroups(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          require(id >= 0, s"encodeSyntheticPngGroups: ids must be " +
            s"non-negative (got $id) — the pixel law's div/mod identities " +
            "across engines hold only there")
          val base = id - id % 4
          val k = (2L * ((base * 2654435761L) % 127L) + 1L).toInt
          val c = ((base * 40503L) % 251L).toInt
          val k3 = ((base * 69069L) % 256L).toInt
          val m = (id % 4).toInt
          val img = new java.awt.image.BufferedImage(18, 16,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 18) {
              val bump = if (x == 2 * m && y == 2 * m) 128 else 0
              val i = x + 18 * y + 1
              raster.setSample(x, y, 0,
                (i * i * k + i * c + y * y * k3 + bump) % 256)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream(512)
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
    encoded.select(
      col("_1").as("media_id"),
      lit("image").as("kind"),
      col("_2").as("bytes"),
      octet_length(col("_2")).cast(LongType).as("n_bytes"),
      lit("image/png").as("mime"))
  }

  /** 64-bit difference hash (dHash) of each image — the standard
    * perceptual fingerprint for image near-dup detection: decode with the
    * real `javax.imageio` codec, nearest-neighbor-sample a 9×8 grayscale
    * grid (the EXACT integer mapping [[resizeImages]] uses — source pixel
    * (⌊x·w/9⌋, ⌊y·h/8⌋), band 0), then bit y·8+x = 1 iff grid(x,y) <
    * grid(x+1,y). Gradient direction survives brightness/contrast shifts
    * and lossy re-encodes, which is why dHash (not a byte hash) is the
    * image dedup signature. Integer-exact end to end, so a SQL oracle
    * replays it through the synthetic pixel law bit for bit.
    *
    * Undecodable blobs hash NULL (mark, not kill — the [[decodeFeatures]]
    * convention); dedup consumers drop NULLs and count them upstream.
    * Same batched mapPartitions shape as decode: one codec init per
    * partition, no shuffle, pipelines with the scan. */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast(LongType), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(
                Option(bytes).getOrElse(Array.empty)))
            catch { case _: Exception => null }
          if (img == null || img.getWidth < 1 || img.getHeight < 1)
            (id, None: Option[Long])
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val r = img.getRaster
            val g = Array.ofDim[Int](8, 9)
            var y = 0
            while (y < 8) {
              val sy = (y.toLong * h / 8).toInt
              var x = 0
              while (x < 9) {
                val sx = (x.toLong * w / 9).toInt
                g(y)(x) = r.getSample(sx, sy, 0)
                x += 1
              }
              y += 1
            }
            var hash = 0L
            y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                if (g(y)(x) < g(y)(x + 1)) hash |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            (id, Some(hash))
          }
        }
      }
      .select(col("_1").as("media_id"), col("_2").as("dhash"))
  }

  /** WIDE (120-bit) difference hash — [[imageDHash]]'s corpus-scaled twin
    * (the SimHashWide doctrine made image-side: "a larger corpus wants a
    * WIDER signature, not a lower maxHamming"). The 64-bit dHash banded at
    * hamming ≤ 6 has only ⌊64/7⌋ ≈ 9-bit band buckets — 512 of them, a
    * measured quadratic blow-up at 100x data — while 120 bits give 7
    * ~17-bit bands (≈131k buckets), restoring linear candidates at the
    * same hamming budget. Grid is 16×8 (NN source (⌊x·w/16⌋, ⌊y·h/8⌋)),
    * bit y·15+x = 1 iff grid(x,y) < grid(x+1,y): 15 comparisons × 8 rows
    * = 120 bits, packed (dh_lo bits 0–59, dh_hi bits 60–119 — the
    * two-long layout [[graft.operators.Dedup.simhashHammingPairsWideFromSigs]]
    * bands over, every shift < 60 so both engines stay sign-safe).
    * Undecodable blobs emit NULL lo/hi. */
  def imageDHashWide(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast(LongType), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(
                Option(bytes).getOrElse(Array.empty)))
            catch { case _: Exception => null }
          if (img == null || img.getWidth < 1 || img.getHeight < 1)
            (id, None: Option[Long], None: Option[Long])
          else {
            val (lo, hi) = wideDHashOfImage(img)
            (id, Some(lo), Some(hi))
          }
        }
      }
      .select(col("_1").as("media_id"), col("_2").as("dh_lo"),
        col("_3").as("dh_hi"))
  }

  /** the 120-bit wide dHash of one decoded image (16×8 NN grid, band 0)
    * — shared by [[imageDHashWide]] and the per-frame video hash. */
  private def wideDHashOfImage(img: java.awt.image.BufferedImage): (Long, Long) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val r = img.getRaster
    val g = Array.ofDim[Int](8, 16)
    var y = 0
    while (y < 8) {
      val sy = (y.toLong * h / 8).toInt
      var x = 0
      while (x < 16) {
        val sx = (x.toLong * w / 16).toInt
        g(y)(x) = r.getSample(sx, sy, 0)
        x += 1
      }
      y += 1
    }
    var lo = 0L
    var hi = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 15) {
        if (g(y)(x) < g(y)(x + 1)) {
          val idx = y * 15 + x
          if (idx < 60) lo |= 1L << idx
          else hi |= 1L << (idx - 60)
        }
        x += 1
      }
      y += 1
    }
    (lo, hi)
  }

  /** per-sampled-frame WIDE dHashes of each video clip: parse the AVI
    * container, keep every `everyK`-th frame, decode ONLY those (the
    * [[videoFrames]] sampling economics), and emit
    * (media_id, frame_no, dh_lo, dh_hi) — the frame-level perceptual
    * signature table [[graft.operators.Dedup.videoDedupFromFrameHashes]]
    * matches clips on. Undecodable containers emit one marker row
    * (frame_no = −1, NULL hashes); an undecodable individual frame
    * marks NULL at its own frame_no. No shuffle — flatMap inside
    * mapPartitions, pipelines with the scan. */
  def videoDHashWide(media: DataFrame, everyK: Int = 1): DataFrame = {
    require(everyK >= 1, s"videoDHashWide: everyK must be >= 1, got $everyK")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast(LongType), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          parseAviFrames(bytes) match {
            case None =>
              Iterator.single((id, -1, None: Option[Long], None: Option[Long]))
            case Some((_, _, _, payloads)) =>
              payloads.iterator.zipWithIndex
                .filter(_._2 % everyK == 0)
                .map { case (payload, f) =>
                  val img =
                    try javax.imageio.ImageIO.read(
                      new java.io.ByteArrayInputStream(payload))
                    catch { case _: Exception => null }
                  if (img == null || img.getWidth < 1 || img.getHeight < 1)
                    (id, f, None: Option[Long], None: Option[Long])
                  else {
                    val (lo, hi) = wideDHashOfImage(img)
                    (id, f, Some(lo), Some(hi))
                  }
                }
          }
        }
      }
      .select(col("_1").as("media_id"), col("_2").as("frame_no"),
        col("_3").as("dh_lo"), col("_4").as("dh_hi"))
  }

  /** NEAR-DUP AVI fixture generator — the video sibling of
    * [[encodeSyntheticPngGroups]]: one genuine 4-frame MPNG-in-AVI clip
    * per row, frame f's 18×16 pixels following the grouped quadratic law
    * with a per-frame PHASE (i²·k_f + i·(c + 11f) + y²·k3 + bump) mod 256,
    * where (k, c, k3) derive from base = id − id mod 4 exactly as the
    * image fixture and bump = 128 at (2m, 2m), m = id mod 4. Frame 0 of
    * NON-BASE members uses k_0 = k + 2m (still odd — a structurally
    * different frame): members therefore match their group base on
    * EXACTLY frames 1–3, so a `minMatchedFrames = 3` clip-dedup catches
    * every intra-group pair while a 4-frame requirement would not — the
    * threshold is exercised, not vacuous. */
  /** [[encodeSyntheticAviGroups]] with GROUP-VARYING clip length — the
    * fixture for the fraction-vote dedup profile
    * ([[graft.operators.Dedup.videoDedupFromFrameHashesFrac]]): group g
    * (base = id − id%4, g = base/4) renders nf = 3 + g%3 frames (3, 4, or
    * 5), same pixel law (frame-0 scramble for members m > 0, per-frame
    * phase c + 11f, member bump). With matchFrac = 3/4 the non-base
    * members of 3-frame groups SURVIVE (2 matched < ceil(9/4) = 3) while
    * 4- and 5-frame members DROP (3 ≥ 3, 4 ≥ 4) — the clip-length-scaled
    * threshold is exercised in both directions by construction. */
  def encodeSyntheticAviGroupsVar(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = Fan.out(df.select(col(idCol).cast(LongType))).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          require(id >= 0, s"encodeSyntheticAviGroupsVar: ids must be " +
            "non-negative — the pixel law's div/mod identities across " +
            "engines hold only there")
          val base = id - id % 4
          val k = (2L * ((base * 2654435761L) % 127L) + 1L).toInt
          val c = ((base * 40503L) % 251L).toInt
          val k3 = ((base * 69069L) % 256L).toInt
          val m = (id % 4).toInt
          val nf = (3 + (base / 4) % 3).toInt
          val frames = (0 until nf).map { f =>
            val kf = if (f == 0 && m > 0) k + 2 * m else k
            val cf = c + 11 * f
            val img = new java.awt.image.BufferedImage(18, 16,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < 16) {
              var x = 0
              while (x < 18) {
                val bump = if (x == 2 * m && y == 2 * m) 128 else 0
                val i = x + 18 * y + 1
                raster.setSample(x, y, 0,
                  (i * i * kf + i * cf + y * y * k3 + bump) % 256)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream(512)
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          }
          (id, aviBytes(frames, 18, 16))
        }
      }
    encoded.select(
      col("_1").as("media_id"),
      lit("video").as("kind"),
      col("_2").as("bytes"),
      octet_length(col("_2")).cast(LongType).as("n_bytes"),
      lit("video/avi").as("mime"))
  }

  def encodeSyntheticAviGroups(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = Fan.out(df.select(col(idCol).cast(LongType))).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          require(id >= 0, s"encodeSyntheticAviGroups: ids must be " +
            "non-negative — the pixel law's div/mod identities across " +
            "engines hold only there")
          val base = id - id % 4
          val k = (2L * ((base * 2654435761L) % 127L) + 1L).toInt
          val c = ((base * 40503L) % 251L).toInt
          val k3 = ((base * 69069L) % 256L).toInt
          val m = (id % 4).toInt
          val frames = (0 until 4).map { f =>
            val kf = if (f == 0 && m > 0) k + 2 * m else k
            val cf = c + 11 * f
            val img = new java.awt.image.BufferedImage(18, 16,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < 16) {
              var x = 0
              while (x < 18) {
                val bump = if (x == 2 * m && y == 2 * m) 128 else 0
                val i = x + 18 * y + 1
                raster.setSample(x, y, 0,
                  (i * i * kf + i * cf + y * y * k3 + bump) % 256)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream(512)
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          }
          (id, aviBytes(frames, 18, 16))
        }
      }
    encoded.select(
      col("_1").as("media_id"),
      lit("video").as("kind"),
      col("_2").as("bytes"),
      octet_length(col("_2")).cast(LongType).as("n_bytes"),
      lit("video/avi").as("mime"))
  }

  /** byte-budget blob cap: deterministic truncation of the blob to
    * maxBytes, with the metadata kept consistent — the guard in front of a
    * downstream stage that must bound per-row bytes (e.g. feed at most 1 MB
    * into a fingerprint or preview kernel). This is a BYTE operator by
    * contract, not an image one — [[resizeImages]] is the real image
    * resize (the operator was named `resize` before round 18; renamed so
    * no API named "resize" is a stand-in). */
  def truncateBlob(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("bytes",
        expr(s"substring(bytes, 1, $maxBytes)").cast(BinaryType))
      .withColumn("n_bytes", least(col("n_bytes"), lit(maxBytes.toLong)))

  /** REAL image resize kernel: decode each blob with `javax.imageio`,
    * nearest-neighbor-sample it to `targetW`×`targetH` (source pixel for
    * target (x, y) is (⌊x·w/targetW⌋, ⌊y·h/targetH⌋) — the canonical NN
    * mapping, pure integer arithmetic, so the resized raster is an EXACT
    * closed-form function of the source raster that a SQL oracle can
    * replay), re-encode as PNG. Grayscale sources stay single-band
    * (TYPE_BYTE_GRAY); multi-band sources resize band-wise into 3-band
    * BGR. Undecodable blobs pass through as NULL bytes with n_bytes = -1
    * (mark, not kill — the [[decodeFeatures]] corrupt-blob convention).
    *
    * NN rather than an area/bilinear filter is a deliberate determinism
    * choice: filtered resampling rounds intermediate floats differently
    * across platforms/codecs, NN moves whole samples. The mapPartitions
    * shape (one codec init per partition, rows streamed) is the same as
    * decode — no shuffle, pipelines with the scan.
    *
    * Scale note: at 100 TB this is the bytes-dominant stage; resized
    * output (fixed target dims) is orders of magnitude smaller than the
    * input, so resize-early-then-shuffle is the production order — this
    * operator preserves partitioning precisely so callers can do that. */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW >= 1 && targetH >= 1,
      s"resizeImages: target dims must be >= 1, got ${targetW}x$targetH")
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id").cast(LongType),
        col("kind").cast(StringType), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, kind, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(
                Option(bytes).getOrElse(Array.empty)))
            catch { case _: Exception => null }
          if (img == null) (id, kind, null: Array[Byte])
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val src = img.getRaster
            val gray = src.getNumBands == 1
            val dst = new java.awt.image.BufferedImage(targetW, targetH,
              if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
              else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val dr = dst.getRaster
            val bands = dr.getNumBands
            var y = 0
            while (y < targetH) {
              val sy = (y.toLong * h / targetH).toInt
              var x = 0
              while (x < targetW) {
                val sx = (x.toLong * w / targetW).toInt
                var b = 0
                while (b < bands) {
                  dr.setSample(x, y, b,
                    src.getSample(sx, sy, math.min(b, src.getNumBands - 1)))
                  b += 1
                }
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream(512)
            javax.imageio.ImageIO.write(dst, "png", bos)
            (id, kind, bos.toByteArray)
          }
        }
      }
    out.select(
      col("_1").as("media_id"),
      col("_2").as("kind"),
      col("_3").as("bytes"),
      when(col("_3").isNull, lit(-1L))
        .otherwise(octet_length(col("_3")).cast(LongType)).as("n_bytes"),
      lit("image/png").as("mime"))
  }

  // ---------------------------------------------------------------- video

  /** the synthetic-video frame law, shared by [[encodeSyntheticAvi]], the
    * round-trip unit tests, and (as SQL) the q_frame_sample oracle: a clip
    * of `2 + id mod 4` frames, every frame at the clip's [[synthDims]]
    * (AVI requires fixed stream dimensions), frame `f` carrying pixel
    * (x, y) = [[synthGray]](id + 97·f, x, y) = (x + 31·y + id + 97·f)
    * mod 256. Non-negative integer arithmetic throughout, so every decoded
    * frame statistic is exactly predictable from (id, f) alone. */
  private[graft] def synthVideoFrameCount(id: Long): Int = (2 + id % 4).toInt

  /** minimal spec-conformant AVI/RIFF container (Microsoft AVI RIFF form:
    * RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh,strf}} →
    * LIST(movi){00dc…}) holding one video stream whose frames are complete
    * PNG byte streams — the "Motion PNG in AVI" shape (fourcc MPNG), the
    * LOSSLESS analogue of MJPEG-in-AVI: frame payloads are plain
    * single-image codec streams, so a pure-JVM reader decodes each frame
    * with `javax.imageio` and recovers pixels EXACTLY (JPEG frames would
    * be codec-approximate). Written directly (the [[wavBytes]] precedent —
    * the JVM ships no video muxer at all); `idx1` is omitted, which the
    * AVI spec permits when AVIF_HASINDEX is unset. Chunks pad to even
    * offsets per RIFF. */
  private[graft] def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
                              fps: Int = 10): Array[Byte] = {
    require(fps >= 1, s"aviBytes: fps must be >= 1, got $fps")
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlSize = 192 // 'hdrl' + (avih hdr+56) + (LIST hdr + 116 strl)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    tag("RIFF"); buf.putInt(riffSize); tag("AVI ")
    tag("LIST"); buf.putInt(hdrlSize); tag("hdrl")
    tag("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps) // dwMicroSecPerFrame
    buf.putInt(0)             // dwMaxBytesPerSec
    buf.putInt(0)             // dwPaddingGranularity
    buf.putInt(0)             // dwFlags (no AVIF_HASINDEX: idx1 omitted)
    buf.putInt(frames.length) // dwTotalFrames — the container-level count
    buf.putInt(0)             // dwInitialFrames
    buf.putInt(1)             // dwStreams
    buf.putInt(maxFrame)      // dwSuggestedBufferSize
    buf.putInt(w); buf.putInt(h)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0) // dwReserved
    tag("LIST"); buf.putInt(116); tag("strl")
    tag("strh"); buf.putInt(56)
    tag("vids"); tag("MPNG")
    buf.putInt(0)             // dwFlags
    buf.putInt(0)             // wPriority + wLanguage
    buf.putInt(0)             // dwInitialFrames
    buf.putInt(1)             // dwScale
    buf.putInt(fps)           // dwRate (rate/scale = fps)
    buf.putInt(0)             // dwStart
    buf.putInt(frames.length) // dwLength in frames
    buf.putInt(maxFrame)      // dwSuggestedBufferSize
    buf.putInt(-1)            // dwQuality (default)
    buf.putInt(0)             // dwSampleSize (0: one sample = one frame)
    buf.putShort(0); buf.putShort(0)
    buf.putShort(w.toShort); buf.putShort(h.toShort) // rcFrame
    tag("strf"); buf.putInt(40)
    buf.putInt(40)            // biSize (BITMAPINFOHEADER)
    buf.putInt(w); buf.putInt(h)
    buf.putShort(1)           // biPlanes
    buf.putShort(8)           // biBitCount (gray frames)
    tag("MPNG")               // biCompression fourcc
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    tag("LIST"); buf.putInt(moviSize); tag("movi")
    frames.foreach { f =>
      tag("00dc"); buf.putInt(f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  /** AVI/RIFF container parse: walks the chunk tree generically (every
    * LIST recursed, so `rec `-grouped frames are found too), reads the
    * declared dimensions and total-frame count from `avih`, and collects
    * the video-stream data chunk payloads (`##dc` compressed / `##db`
    * uncompressed, ## = stream digits) in container order. Returns
    * (width, height, declaredFrames, framePayloads); None for non-AVI or
    * structurally invalid bytes — the caller marks, not kills (the
    * [[parseWavPcm16]] convention, including the even-padding rule). */
  private[graft] def parseAviFrames(
      bytes: Array[Byte]): Option[(Int, Int, Int, Vector[Array[Byte]])] = {
    if (bytes == null || bytes.length < 24) return None
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var width = -1; var height = -1; var declared = -1
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Boolean = {
      var off = start
      while (off + 8 <= end) {
        val id = tag(off); val sz = le32(off + 4)
        if (sz < 0 || off + 8 + sz > end) return false
        if (id == "LIST" && sz >= 4) {
          if (!walk(off + 12, off + 8 + sz)) return false
        } else if (id == "avih" && sz >= 40) {
          declared = le32(off + 8 + 16)
          width = le32(off + 8 + 32); height = le32(off + 8 + 36)
        } else if (id(0).isDigit && id(1).isDigit && id(2) == 'd' &&
            (id(3) == 'c' || id(3) == 'b')) {
          frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + sz)
        }
        off += 8 + sz + (sz & 1) // RIFF chunks pad to even boundaries
      }
      true
    }
    // RIFF size at offset 4 counts from offset 8: content ends at 8 + size
    if (!walk(12, math.min(bytes.length, 8 + le32(4)))) return None
    if (width <= 0 || height <= 0 || declared < 0) None
    else Some((width, height, declared, frames.result()))
  }

  /** deterministic REAL-VIDEO fixture generator: one MPNG-in-AVI clip per
    * row ([[aviBytes]] — a genuine RIFF/AVI container whose frames are
    * real ImageIO-encoded PNGs following the [[synthVideoFrameCount]] /
    * [[synthGray]] frame law). The video analogue of
    * [[encodeSyntheticPng]]/[[encodeSyntheticWav]]: genuine container
    * bytes, losslessly-coded frames, closed-form content — so frame
    * counts, dims, and per-frame pixel sums verify EXACTLY in SQL. */
  def encodeSyntheticAvi(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = Fan.out(df.select(col(idCol).cast(LongType))).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          require(id >= 0, s"encodeSyntheticAvi: ids must be non-negative " +
            s"(got $id) — the frame law's div/mod identities across " +
            "engines hold only there (the q_retention doctrine)")
          val (w, h) = synthDims(id)
          val frames = (0 until synthVideoFrameCount(id)).map { f =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0, synthGray(id + 97L * f, x, y))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream(256)
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          }
          (id, aviBytes(frames, w, h))
        }
      }
    encoded.select(
      col("_1").as("media_id"),
      lit("video").as("kind"),
      col("_2").as("bytes"),
      octet_length(col("_2")).cast(LongType).as("n_bytes"),
      lit("video/x-msvideo").as("mime"))
  }

  /** one sampled-and-decoded video frame: container frame index, decoded
    * dimensions, and the exact integer pixel-sample sum (the
    * [[MediaFeatures]] raw statistic, per frame). */
  case class VideoFrame(media_id: Long, frame_no: Int, width: Int,
                        height: Int, pixel_sum: Long)

  /** REAL video frame sampling: parse each AVI/RIFF container
    * ([[parseAviFrames]]), keep every `everyK`-th frame (0, k, 2k, … —
    * the uniform temporal subsample a vision pipeline feeds to per-frame
    * models), and decode ONLY the kept frames with `javax.imageio` —
    * frame payloads skipped by the sampler are never decoded, which is
    * the point of sampling (at 100 TB the decode, not the scan, is the
    * cost). Emits exact integer pixel sums per kept frame. Undecodable
    * containers emit a single marker row (frame_no = −1, the
    * [[decodeFeatures]] mark-don't-kill convention); an undecodable
    * individual frame payload marks with width/height = −1 at its own
    * frame_no. Scale shape: flatMap inside mapPartitions — no shuffle,
    * output size = Σ kept frames, blob column read once, pipelines with
    * the scan. Until round 18 this operator was a byte-window stub; it
    * now consumes genuine container bytes end to end. */
  def videoFrames(media: DataFrame, everyK: Int = 1): Dataset[VideoFrame] = {
    require(everyK >= 1, s"videoFrames: everyK must be >= 1, got $everyK")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          parseAviFrames(bytes) match {
            case None => Iterator.single(VideoFrame(id, -1, -1, -1, 0L))
            case Some((_, _, _, payloads)) =>
              payloads.iterator.zipWithIndex
                .filter(_._2 % everyK == 0)
                .map { case (payload, f) =>
                  val img =
                    try javax.imageio.ImageIO.read(
                      new java.io.ByteArrayInputStream(payload))
                    catch { case _: Exception => null }
                  if (img == null) VideoFrame(id, f, -1, -1, 0L)
                  else {
                    val (w, h) = (img.getWidth, img.getHeight)
                    val raster = img.getRaster
                    val bands = raster.getNumBands
                    var sum = 0L
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        var b = 0
                        while (b < bands) {
                          sum += raster.getSample(x, y, b); b += 1
                        }
                        x += 1
                      }
                      y += 1
                    }
                    VideoFrame(id, f, w, h, sum)
                  }
                }
          }
        }
      }
  }

  /** metadata-only scan — demonstrates blob-column pruning: this plan never
    * reads `bytes` (check ReadSchema in explain). */
  def metadataStats(media: DataFrame): DataFrame =
    media.groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum("n_bytes").as("total_bytes"),
      round(avg("n_bytes"), 4).as("avg_bytes"))

  // ---------------------------------------------------------------- audio

  /** the synthetic-audio sample law, shared by [[encodeSyntheticWav]], the
    * decode unit test, and (as SQL) the q_audio_decode oracle: a clip of
    * `64 + id mod 193` mono PCM16 samples at 8 kHz, sample i carrying
    * value (17·i + 31·id) mod 4001 − 2000. Pure non-negative integer
    * arithmetic before the final shift, so `mod` agrees across Scala,
    * Spark, and DuckDB and every decoded statistic is exactly
    * predictable from the id. */
  private[graft] def synthAudioLen(id: Long): Int = (64 + id % 193).toInt
  private[graft] def synthPcm(id: Long, i: Int): Short =
    (((17L * i + 31L * id) % 4001L) - 2000L).toShort

  /** canonical 44-byte RIFF/WAVE PCM header + data chunk (the WAVE spec's
    * minimal conformant layout — the same bytes AudioSystem's WAVE writer
    * emits for PCM16). Written directly because `AudioSystem.write` holds
    * a global provider lock: a 32-thread encode of 500k clips measured
    * 8.2 s — NO faster than one thread (~7 s) — i.e. the service layer
    * serializes the whole executor. MediaCodecSpec/OperatorsSpec pin that
    * AudioSystem decodes these bytes identically. */
  private[graft] def wavBytes(pcm: Array[Byte], sampleRate: Int,
                              channels: Int): Array[Byte] = {
    val out = new Array[Byte](44 + pcm.length)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    tag(0, "RIFF"); le32(4, 36 + pcm.length); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1 /* PCM */); le16(22, channels)
    le32(24, sampleRate); le32(28, sampleRate * channels * 2)
    le16(32, channels * 2); le16(34, 16)
    tag(36, "data"); le32(40, pcm.length)
    pcm.copyToArray(out, 44)
    out
  }

  /** RIFF/WAVE PCM16 fast-path parser: walks the chunk list (fmt must
    * declare audioFormat=1/PCM at 16 bits; chunks pad to even offsets per
    * the RIFF spec) and returns (sampleRate, channels, pcmData) — WAV PCM
    * data is always little-endian. Returns None for non-RIFF or non-PCM16
    * bytes so callers can fall back to the `javax.sound.sampled` service
    * layer (AIFF/AU/odd depths) — which is correct but SERIALIZES under
    * concurrency (global provider lock, measured: 32-thread decode of
    * 500k clips 9.6 s ≈ single-thread speed), so the hot path must not
    * touch it. */
  private[graft] def parseWavPcm16(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 44) return None
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = -1; var channels = -1; var ok = false
    var data: Array[Byte] = null
    while (off + 8 <= bytes.length && (data == null || !ok)) {
      val id = tag(off); val sz = le32(off + 4)
      if (sz < 0 || off + 8 + sz > bytes.length) return None
      if (id == "fmt " && sz >= 16) {
        ok = le16(off + 8) == 1 && le16(off + 22) == 16
        channels = le16(off + 10); rate = le32(off + 12)
      } else if (id == "data")
        data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + sz)
      off += 8 + sz + (sz & 1) // RIFF chunks pad to even boundaries
    }
    if (ok && data != null) Some((rate, channels, data)) else None
  }

  /** decode any supported audio container to (sampleRate, channels,
    * little-endian PCM16 bytes): the RIFF fast path above, falling back to
    * `javax.sound.sampled` for other containers (normalizing big-endian
    * frames to LE). None = undecodable or unsupported depth. */
  private def decodePcm16(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    parseWavPcm16(bytes).orElse {
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(
            Option(bytes).getOrElse(Array.empty)))
        catch { case _: Exception => null }
      if (ais == null || ais.getFormat.getSampleSizeInBits != 16 ||
          ais.getFormat.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val fmt = ais.getFormat
        val data = ais.readAllBytes()
        if (fmt.isBigEndian) {
          var i = 0
          while (i + 1 < data.length) {
            val t = data(i); data(i) = data(i + 1); data(i + 1) = t; i += 2
          }
        }
        Some((fmt.getSampleRate.toInt, fmt.getChannels, data))
      }
    }

  /** deterministic REAL-WAV fixture generator: one mono PCM16 8 kHz clip
    * per row as a genuine spec-conformant RIFF/WAVE stream ([[wavBytes]] —
    * decodable by any WAV reader including `javax.sound.sampled`, pinned
    * in tests). WAV PCM is a lossless container, so the decode side
    * recovers the exact samples — the audio analogue of
    * [[encodeSyntheticPng]]. */
  def encodeSyntheticWav(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          require(id >= 0, s"encodeSyntheticWav: ids must be non-negative " +
            s"(got $id) — the sample law's mod identities across engines " +
            "hold only there (the q_retention doctrine)")
          val n = synthAudioLen(id)
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = synthPcm(id, i)
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          (id, wavBytes(pcm, 8000, 1))
        }
      }
    encoded.select(
      col("_1").as("media_id"),
      lit("audio").as("kind"),
      col("_2").as("bytes"),
      octet_length(col("_2")).cast(LongType).as("n_bytes"),
      lit("audio/wav").as("mime"))
  }

  /** NEAR-DUP WAV fixture generator for the audio perceptual-hash dedup
    * family — the audio sibling of [[encodeSyntheticPngGroups]]: one
    * genuine 1936-sample mono PCM16 8 kHz RIFF/WAVE clip per row, sample
    * i (0-based) carrying ((i+1)²·k + (i+1)·c) mod 4001 − 2000 with
    * (k, c) derived from the row's GROUP (base = id − id mod 4;
    * k = 2·((base·2654435761) mod 127) + 1, c = (base·40503) mod 251 —
    * the quadratic step makes window energies pseudo-random, and unlike
    * the image law's brightness-shift trap, c here PHASES the mod-4001
    * values so every (k, c) class gets a distinct energy hash — simulated:
    * all 31877 classes distinct, banded mass under the production cap at
    * 100x GenScale). Member m = id mod 4 REPLACES sample m·16 (the first
    * sample of window m) with the peak value 2000 — perturbing one
    * window's energy flips at most two energy-hash bits, planting hamming
    * ≤ 4 within each group of four. */
  def encodeSyntheticWavGroups(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          require(id >= 0, s"encodeSyntheticWavGroups: ids must be " +
            "non-negative — the sample law's mod identities across " +
            "engines hold only there")
          val base = id - id % 4
          val k = (2L * ((base * 2654435761L) % 127L) + 1L).toInt
          val c = ((base * 40503L) % 251L).toInt
          val m = (id % 4).toInt
          val n = 1936
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val raw = (((i + 1).toLong * (i + 1) * k + (i + 1).toLong * c)
              % 4001L - 2000L).toShort
            val v: Short = if (i == m * 16) 2000 else raw
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          (id, wavBytes(pcm, 8000, 1))
        }
      }
    encoded.select(
      col("_1").as("media_id"),
      lit("audio").as("kind"),
      col("_2").as("bytes"),
      octet_length(col("_2")).cast(LongType).as("n_bytes"),
      lit("audio/wav").as("mime"))
  }

  /** WIDE (120-bit) audio ENERGY HASH — the audio perceptual fingerprint
    * feeding [[graft.operators.Dedup.wideHashDedup]]: decode to PCM16
    * (RIFF fast path, service-layer fallback), sum |sample| over 121
    * consecutive 16-sample windows of the first 1936 samples, and set bit
    * w = 1 iff energy(w) < energy(w+1) — the energy-envelope gradient, the
    * same robustness idea as the image dHash (level shifts and
    * re-encodings preserve gradient direction). Exact integer energies →
    * a SQL oracle replays the whole chain. Clips shorter than 1936
    * samples, multi-channel clips, and undecodable blobs hash NULL (mark,
    * not kill). Packed (dh_lo bits 0–59, dh_hi 60–119), the two-long
    * wide-banding layout. */
  def audioEnergyHashWide(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast(LongType), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcm16(bytes) match {
            case Some((_, channels, data))
                if channels == 1 && data.length >= 1936 * 2 =>
              val e = new Array[Long](121)
              var i = 0
              while (i < 1936) {
                val v = ((data(2 * i) & 0xff) |
                  (data(2 * i + 1) << 8)).toShort.toLong
                e(i / 16) += math.abs(v)
                i += 1
              }
              var lo = 0L
              var hi = 0L
              var w = 0
              while (w < 120) {
                if (e(w) < e(w + 1)) {
                  if (w < 60) lo |= 1L << w else hi |= 1L << (w - 60)
                }
                w += 1
              }
              (id, Some(lo), Some(hi))
            case _ => (id, None: Option[Long], None: Option[Long])
          }
        }
      }
      .select(col("_1").as("media_id"), col("_2").as("dh_lo"),
        col("_3").as("dh_hi"))
  }

  /** decoded-audio feature row: container-declared format (rate, channels)
    * plus exact integer statistics over the decoded PCM16 samples —
    * `sample_sum` (the oracle-checkable raw statistic), `peak` (max |s|,
    * clipping detection), and the 6-dp half-up mean. Undecodable blobs
    * yield (-1, -1, -1, 0, 0, 0.0) — mark, not kill. */
  case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
                           n_samples: Long, sample_sum: Long, peak: Int,
                           mean_sample: Double)

  /** one windowed-analysis frame of a decoded clip: frame `frame_no`
    * covers samples [frame_no·hop, frame_no·hop + frameLen); `sample_sum`
    * and `peak` are exact integer statistics over the window (the
    * energy/VAD-feature shape a speech pipeline computes per frame). */
  case class AudioFrame(media_id: Long, frame_no: Int, start_sample: Long,
                        sample_sum: Long, peak: Int)

  /** REAL audio frame extraction: decode each clip (same codec stack and
    * 16-bit contract as [[decodeAudioFeatures]]) and emit one row per
    * hop-advanced analysis window — frame i covers samples
    * [i·hop, i·hop + frameLen), frames emitted while they fit entirely
    * (count = max(0, (n − frameLen) div hop + 1); a clip shorter than one
    * frame emits nothing, the gopherRepetitionReport short-doc rule).
    * This is the audio analogue of video frame sampling with the decode
    * REAL end to end; per-frame integer sums make the whole explode
    * oracle-replayable. Undecodable blobs emit a single marker row
    * (frame_no = -1). Scale shape: flatMap inside mapPartitions — no
    * shuffle, output size = Σ frames (the answer's own size), blob column
    * read once. */
  def audioFrames(media: DataFrame, frameLen: Int, hop: Int): Dataset[AudioFrame] = {
    require(frameLen >= 1 && hop >= 1,
      s"audioFrames: frameLen and hop must be >= 1, got $frameLen/$hop")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodePcm16(bytes) match {
            case None => Iterator.single(AudioFrame(id, -1, -1L, 0L, 0))
            case Some((_, _, data)) =>
              val n = data.length / 2
              def sample(i: Int): Int =
                (((data(2 * i + 1) & 0xff) << 8) | (data(2 * i) & 0xff))
                  .toShort.toInt
              val nFrames = if (n < frameLen) 0 else (n - frameLen) / hop + 1
              (0 until nFrames).iterator.map { f =>
                var sum = 0L
                var peak = 0
                var i = f * hop
                val end = f * hop + frameLen
                while (i < end) {
                  val s = sample(i)
                  sum += s
                  val a = math.abs(s)
                  if (a > peak) peak = a
                  i += 1
                }
                AudioFrame(id, f, f.toLong * hop, sum, peak)
              }
          }
        }
      }
  }

  /** REAL audio decode via batched mapPartitions: the RIFF/WAVE PCM16
    * fast path ([[parseWavPcm16]] — thread-scaling, no service-registry
    * lock), falling back to `javax.sound.sampled` for other containers
    * (AIFF/AU); emits per-clip statistics. 16-bit signed is the supported
    * depth (the LLM-pipeline interchange norm) — other depths mark as
    * undecodable rather than silently mis-scale. Same no-shuffle pipeline
    * shape as [[decodeFeatures]]. */
  def decodeAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcm16(bytes) match {
            case None => AudioFeatures(id, -1, -1, -1L, 0L, 0, 0.0)
            case Some((rate, channels, data)) =>
              val n = data.length / 2
              var sum = 0L
              var peak = 0
              var i = 0
              while (i < n) {
                val s = (((data(2 * i + 1) & 0xff) << 8) |
                  (data(2 * i) & 0xff)).toShort
                sum += s
                val a = math.abs(s.toInt)
                if (a > peak) peak = a
                i += 1
              }
              val mean = if (n == 0) 0.0 else sum.toDouble / n
              AudioFeatures(id, rate, channels, n.toLong, sum, peak,
                // 6-dp floor(x·1e6 + 0.5): means can be NEGATIVE here
                // (unlike pixel intensities), and SQL round() is
                // half-AWAY-FROM-ZERO on negatives while this rule is
                // half-toward-+∞ — so the oracle replays the identical
                // floor formula rather than using round() (bit-identical
                // double sequence both sides)
                math.floor(mean * 1e6 + 0.5) / 1e6)
          }
        }
      }
  }
}
