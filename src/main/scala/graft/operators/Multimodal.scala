package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column handling (SURVEY §7.4): semi-structured JSON props,
 * opaque binary payloads with typed metadata, and the decode/feature
 * pipeline plumbing for image/audio/video columns.
 *
 * The image decode path is REAL: [[ImageIoDecoder]] uses the JDK's own
 * `javax.imageio` (PNG/JPEG/GIF/BMP, zero external dependencies) and is
 * graded against the independent codec-free header parsers — two
 * implementations, one oracle. Payload kinds the JDK cannot decode
 * (video containers, exotic codecs) degrade to the clearly-marked
 * deterministic [[StubMediaDecoder]] fallback or to zero dims; swap in
 * a JNI/codec-backed [[MediaDecoder]] for those in production.
 *
 * 100 TB design:
 *  - binary payloads stay opaque end-to-end; metadata (length, hash,
 *    magic bytes) is computed columnar, no decode needed for filtering;
 *  - decode runs per-partition (`mapPartitions`) so codec init is
 *    amortized per task, not per row; repartition first so a task's
 *    batch of blobs fits executor memory;
 *  - JSON props parse once via `from_json` with an explicit schema —
 *    never schema-inference over the corpus at scale.
 */
object Multimodal {

  /** Parse a JSON string column with an explicit schema (never inference). */
  def parseJson(df: DataFrame, jsonCol: String, schema: StructType, as: String): DataFrame =
    df.withColumn(as, from_json(col(jsonCol), schema))

  /** Columnar binary metadata: byte length, md5, first byte — the
    * filter-without-decoding surface. `bin` must be BinaryType.
    * `first_byte` is the RAW unsigned byte value (0-255) via the hex
    * string — never a UTF-8 decode, which would fold every invalid
    * first byte (JPEG 0xFF, PNG 0x89) into U+FFFD and break
    * magic-byte filtering; null for empty payloads. */
  def binaryMeta(bin: Column): Seq[(String, Column)] = Seq(
    "n_bytes" -> length(bin).cast(LongType),
    "content_md5" -> md5(bin),
    "first_byte" -> when(length(bin) >= 1,
      conv(substring(hex(bin), 1, 2), 16, 10).cast(LongType))
  )

  /** `df` plus (format, width, height) parsed codec-free from the
    * binary column's header bytes ([[graft.functions.ImageHeaders]]) —
    * the filter-by-resolution / per-format-card surface that needs no
    * decode. One native codegen'd expression, expanded once via a
    * struct column; row-local, rides the scan. */
  def withImageMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("__meta",
        graft.functions.ImageHeaders.imageHeaderMeta(col(binCol)))
      .withColumn("format", col("__meta.format"))
      .withColumn("width", col("__meta.width"))
      .withColumn("height", col("__meta.height"))
      .drop("__meta")

  /** `df` plus (format, sample_rate, channels, bits_per_sample,
    * duration_ms) parsed codec-free from the binary column's header
    * bytes ([[graft.functions.AudioHeaders]]: WAV RIFF chunk walk,
    * FLAC STREAMINFO bit unpack) — the filter-by-rate/duration surface
    * for audio curation. Same shape as [[withImageMeta]]. */
  def withAudioMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("__meta",
        graft.functions.AudioHeaders.audioHeaderMeta(col(binCol)))
      .withColumn("format", col("__meta.format"))
      .withColumn("sample_rate", col("__meta.sample_rate"))
      .withColumn("channels", col("__meta.channels"))
      .withColumn("bits_per_sample", col("__meta.bits_per_sample"))
      .withColumn("duration_ms", col("__meta.duration_ms"))
      .drop("__meta")

  /** `df` plus (format, width, height, duration_ms, n_tracks) parsed
    * codec-free from video container headers
    * ([[graft.functions.VideoHeaders]]: MP4 box walk, AVI RIFF
    * header, Matroska/WebM EBML walk) — the filter-by-duration/
    * resolution surface for video curation. Same shape as
    * [[withImageMeta]]/[[withAudioMeta]]. */
  def withVideoMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("__meta",
        graft.functions.VideoHeaders.videoHeaderMeta(col(binCol)))
      .withColumn("format", col("__meta.format"))
      .withColumn("width", col("__meta.width"))
      .withColumn("height", col("__meta.height"))
      .withColumn("duration_ms", col("__meta.duration_ms"))
      .withColumn("n_tracks", col("__meta.n_tracks"))
      .drop("__meta")

  /**
   * One-projection MEDIA CLASSIFICATION card for mixed-modality
   * intake (image, audio and video blobs arriving on one binary
   * column — the shape a crawl or upload stream actually has):
   * modality (`image` / `audio` / `video` / NULL for unrecognized),
   * the detected format, the modality-appropriate header fields
   * (dims for images AND videos, rate/channels for audio,
   * duration for audio AND videos, track count for videos; the other
   * families' columns NULL), plus [[binaryMeta]]'s byte length and
   * content md5.
   *
   * 100 TB design: zero-shuffle row-local projection — all three
   * header parsers are native codegen'd byte expressions over the
   * SAME binary value, staged once each via struct columns;
   * classification rides the scan, no decode, no UDF.
   */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("__img",
        graft.functions.ImageHeaders.imageHeaderMeta(col(binCol)))
      .withColumn("__aud",
        graft.functions.AudioHeaders.audioHeaderMeta(col(binCol)))
      .withColumn("__vid",
        graft.functions.VideoHeaders.videoHeaderMeta(col(binCol)))
      .withColumn("modality",
        when(col("__img.format").isNotNull, "image")
          .when(col("__aud.format").isNotNull, "audio")
          .when(col("__vid.format").isNotNull, "video"))
      .withColumn("format", coalesce(
        col("__img.format"), col("__aud.format"), col("__vid.format")))
      .withColumn("width", coalesce(col("__img.width"), col("__vid.width")))
      .withColumn("height", coalesce(col("__img.height"), col("__vid.height")))
      .withColumn("sample_rate", col("__aud.sample_rate"))
      .withColumn("channels", col("__aud.channels"))
      .withColumn("duration_ms",
        coalesce(col("__aud.duration_ms"), col("__vid.duration_ms")))
      .withColumn("n_tracks", col("__vid.n_tracks"))
      .withColumn("n_bytes", length(col(binCol)).cast(LongType))
      .withColumn("content_md5", md5(col(binCol)))
      .drop("__img", "__aud", "__vid")

  // --- decode pipeline (typed) --------------------------------------------

  /** One media payload in flight. */
  final case class MediaRow(id: Long, kind: String, bytes: Array[Byte])

  /** Decoded features — the schema a real decoder would fill. */
  final case class DecodedMedia(id: Long, kind: String, nBytes: Long,
                                width: Int, height: Int, nFrames: Int,
                                feature: Array[Float])

  /** Decoder SPI: one instance per partition (codec init amortized). */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): DecodedMedia
  }

  /**
   * Real JDK-only image decoder: `javax.imageio` ships in the JDK and
   * decodes PNG/JPEG/GIF/BMP with zero external dependencies — no
   * codec libraries needed. One instance per partition (the
   * [[decodeBatch]] SPI contract), so reader lookup and the
   * disk-cache opt-out happen once per task, not per row.
   *
   * Output contract:
   *  - `width`/`height`: the decoded raster's dimensions — a second,
   *    independent implementation of what the codec-free header
   *    parsers ([[withImageMeta]]) compute, so the two cross-check;
   *  - `nFrames`: the container's image count (animated GIF frames;
   *    1 for single-image formats), so [[sampleFrames]] is meaningful
   *    for animated payloads;
   *  - `feature`: an 8-dim pixel summary in [0,1] —
   *    [meanR, meanG, meanB, meanGray, minGray, maxGray,
   *     width/4096, height/4096] — exact for lossless formats, the
   *    decode-then-embed slot's deterministic stand-in (a production
   *    pipeline swaps the summary for a model embedding; the decode
   *    itself is real);
   *  - undecodable payloads (truncated, not an image, or a kind the
   *    JDK has no reader for) go to `fallback` when provided, else
   *    degrade to zero dims / zero frames / empty feature — the same
   *    clean-degrade convention as the header parsers' NULLs.
   *
   * 100 TB design: decode is row-local inside mapPartitions — no
   * shuffle, no driver involvement; `ImageIO.setUseCache(false)`
   * keeps the JDK from spilling every blob to a temp file (the
   * default disk cache would turn a CPU-bound decode into task-local
   * disk I/O at scale).
   */
  final class ImageIoDecoder(fallback: Option[MediaDecoder] = None)
      extends MediaDecoder {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO

    ImageIO.setUseCache(false)

    private def degrade(row: MediaRow): DecodedMedia =
      fallback.map(_.decode(row)).getOrElse(
        DecodedMedia(row.id, row.kind, row.bytes.length.toLong,
          width = 0, height = 0, nFrames = 0, feature = Array.empty[Float]))

    override def decode(row: MediaRow): DecodedMedia = {
      val iis =
        try ImageIO.createImageInputStream(new ByteArrayInputStream(row.bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (iis == null) return degrade(row)
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return degrade(row)
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          val img = reader.read(0)
          if (img == null) return degrade(row)
          val nFrames =
            try math.max(1, reader.getNumImages(true))
            catch { case scala.util.control.NonFatal(_) => 1 }
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var minG = 255.0; var maxG = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
              sr += r; sg += g; sb += b
              val gray = (r + g + b) / 3.0 / 255.0
              if (gray < minG) minG = gray
              if (gray > maxG) maxG = gray
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          DecodedMedia(row.id, row.kind, row.bytes.length.toLong, w, h, nFrames,
            Array(
              (sr.toDouble / n / 255.0).toFloat, (sg.toDouble / n / 255.0).toFloat,
              (sb.toDouble / n / 255.0).toFloat,
              ((sr + sg + sb).toDouble / (3.0 * n) / 255.0).toFloat,
              minG.toFloat, maxG.toFloat, w / 4096f, h / 4096f))
        } finally reader.dispose()
      } catch {
        case scala.util.control.NonFatal(_) => degrade(row)
      } finally iis.close()
    }
  }

  /** STUB decoder — deterministic fake: dimensions/features derived from
    * the byte content so tests are stable. Kept as the no-codec FALLBACK
    * for payload kinds the JDK cannot decode (video containers, exotic
    * formats) — the real path is [[ImageIoDecoder]]. */
  final class StubMediaDecoder extends MediaDecoder {
    override def decode(row: MediaRow): DecodedMedia = {
      val b = row.bytes
      val h = b.foldLeft(17L)((acc, x) => acc * 31 + (x & 0xFF))
      DecodedMedia(
        id = row.id, kind = row.kind, nBytes = b.length.toLong,
        width = 1 + math.abs(h % 4096).toInt,
        height = 1 + math.abs((h / 4096) % 4096).toInt,
        nFrames = if (row.kind == "video") 1 + math.abs((h / 97) % 300).toInt else 1,
        feature = Array.tabulate(8)(i => ((h >> (i * 8)) & 0xFF).toFloat / 255f))
    }
  }

  implicit private val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit private val decodedEnc: Encoder[DecodedMedia] = Encoders.product[DecodedMedia]

  /** Decode a binary-payload frame (`id`, `kind`, `bytes` columns) into
    * typed features. `partitions` bounds task batch size so a task's
    * blobs fit in memory (tune: targetPartitionBytes / avg blob size). */
  def decodeBatch(df: DataFrame, mkDecoder: () => MediaDecoder,
                  partitions: Int = 0): Dataset[DecodedMedia] = {
    val base = if (partitions > 0) df.repartition(partitions) else df
    base.select(col("id").cast(LongType), col("kind").cast(StringType), col("bytes"))
      .as[MediaRow]
      .mapPartitions { it =>
        val decoder = mkDecoder() // once per partition: codec init amortized
        it.map(decoder.decode)
      }
  }

  /** (id, perceptual hash) — hash NULL when the payload didn't decode. */
  final case class HashedMedia(id: Long, phash: Option[Long])

  /**
   * 64-bit average-hash (aHash) over the DECODED raster — the
   * cross-format image fingerprint: the same picture saved as PNG,
   * BMP or GIF decodes to the same pixels and hashes identically,
   * which byte-level md5 can never see. Block-average the grayscale
   * image to an 8×8 grid (integer block sums — no resampling library,
   * no floats until the mean), then bit k = block k brighter than the
   * grid mean. Hamming distance between hashes approximates visual
   * distance; re-encodes are distance 0, small edits a few bits
   * (spec-pinned).
   *
   * Returns None for undecodable payloads — callers fall back to the
   * byte-level identity ([[binaryMeta]]'s md5) or to an id-keyed
   * singleton family, never a shared NULL bucket.
   */
  private[graft] def averageHash(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val bx = math.min(7, x * 8 / w)
        val p = img.getRGB(x, y)
        val gray = ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
        sums(by * 8 + bx) += gray
        counts(by * 8 + bx) += 1
        x += 1
      }
      y += 1
    }
    // images narrower than 8px leave some blocks empty: treat an
    // empty block as its row-average would — simplest consistent rule
    // is block mean 0 (pure black); the grid mean divides by filled
    // blocks only so tiny images still hash stably
    val means = Array.tabulate(64)(i =>
      if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
    val filled = counts.count(_ > 0)
    val gridMean = means.sum / math.max(1, filled)
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0 && means(i) > gridMean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** `df` plus a 64-bit perceptual hash column decoded per partition
    * ([[ImageIoDecoder]]'s JDK-only decode; NULL when undecodable).
    *
    * 100 TB design: mapPartitions keeps codec init per task; only
    * (id, hash) leaves the decode — the binary payload is read once
    * and never shuffled. Join the 8-byte hash back by id for the full
    * row. */
  def withPerceptualHash(df: DataFrame, idCol: String,
                         binCol: String): Dataset[HashedMedia] = {
    implicit val enc: Encoder[HashedMedia] = Encoders.product[HashedMedia]
    df.select(col(idCol).cast(LongType).as("id"), lit("image").as("kind"),
        col(binCol).as("bytes"))
      .as[MediaRow](mediaRowEnc)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { row =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          HashedMedia(row.id, Option(img).map(averageHash))
        }
      }
  }

  /**
   * Cross-format exact-pixel image dedup: keep the lowest-id exemplar
   * per perceptual-hash family, annotate with `n_copies` — the
   * [[graft.operators.Dedup.exactDedup]] fingerprint-window contract
   * on the 8-byte aHash. Undecodable payloads are singleton families
   * (id-keyed fallback, never one skewed NULL bucket). For NEAR-dup
   * (Hamming ≤ t) compose the hash with the SimHash banding machinery
   * instead; this operator is the distance-0 fast path.
   *
   * 100 TB design: decode once per payload (mapPartitions), then ONE
   * shuffle of (id, 8-byte hash) — the image bytes never shuffle; the
   * final id join is AQE-broadcast when the survivor set is small.
   */
  def dedupByPerceptualHash(df: DataFrame, idCol: String,
                            binCol: String): DataFrame = {
    require(!df.columns.contains("n_copies"),
      "dedupByPerceptualHash emits n_copies; rename the input column first")
    dedupByHashFrame(df, idCol,
      withPerceptualHash(df, idCol, binCol).toDF(), "__nodecode#")
  }

  /**
   * NEAR-duplicate image pairs: perceptual-hash Hamming distance ≤
   * `maxHamming` — re-encodes, recompressions and lightly edited
   * copies of the same picture, the visual sibling of text SimHash
   * near-dup. Output: (doc_a, doc_b, hamming), doc_a < doc_b.
   *
   * 100 TB design: decode once per payload ([[withPerceptualHash]] —
   * only (id, 8-byte hash) leaves the scan), then [[Dedup]]'s
   * radius-parametric banding kernel: identical hashes pair directly,
   * distinct hashes band into `maxHamming + 1` bit-chunks whose
   * equi-join loses no qualifying pair (pigeonhole), hot cells capped
   * via the shared [[Blocking]] guard — never all-pairs. Undecodable
   * payloads have no hash and never pair. Low-information images
   * (solid colors) share degenerate hashes and pair at distance 0 —
   * cap or pre-filter by [[binaryMeta]] size/entropy when the corpus
   * has many.
   */
  def phashNearDupPairs(df: DataFrame, idCol: String, binCol: String,
                        maxHamming: Int = 3, cellCap: Int = 4096): DataFrame =
    Dedup.hammingPairsOverFingerprints(
      withPerceptualHash(df, idCol, binCol).toDF()
        .select(col("id").as("doc_id"), col("phash").as("simhash")),
      bits = 64, maxHamming = maxHamming, cellCap = cellCap)

  /**
   * Decode the 16-bit PCM sample stream out of a WAV payload — a real
   * byte-level decode with zero dependencies (RIFF chunk walk with
   * pad-byte alignment, the [[graft.functions.AudioHeaders]] layout,
   * then little-endian sample extraction from the `data` chunk). None
   * for anything that is not uncompressed 16-bit PCM WAV (compressed
   * codecs need external libraries — they degrade like non-JDK image
   * formats do). Truncated data chunks yield the samples actually
   * present.
   */
  private[graft] def wavPcmSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null || bytes.length < 12) return None
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u16(off: Int): Int = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
    def u32(off: Int): Long = (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
      ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var pcm16 = false
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val sz = u32(off + 4)
      if (sz < 0 || sz > Int.MaxValue) return None
      if (id == "fmt " && off + 8 + 16 <= bytes.length)
        pcm16 = u16(off + 8) == 1 && u16(off + 8 + 14) == 16
      if (id == "data" && dataOff < 0) {
        dataOff = off + 8
        dataLen = math.min(sz.toInt, math.max(0, bytes.length - dataOff))
      }
      off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (!pcm16 || dataOff < 0 || dataLen < 2) None
    else Some(Array.tabulate(dataLen / 2) { i =>
      val lo = bytes(dataOff + 2 * i) & 0xFF
      val hi = bytes(dataOff + 2 * i + 1)
      (hi << 8) | lo // sign-extended 16-bit sample
    })
  }

  /**
   * 64-bit energy-envelope hash over a PCM sample stream — the AUDIO
   * sibling of [[averageHash]]: split the stream into 64 equal
   * windows, window energy = mean |sample|, bit k = window k louder
   * than the stream mean. The CONTENT identity byte md5 cannot see:
   * the same samples behind different container metadata (an added
   * LIST/INFO chunk, a sloppy RIFF size) hash identically; different
   * recordings differ. Streams shorter than 64 samples leave the
   * tail windows empty (bit 0, the [[averageHash]] convention).
   */
  private[graft] def envelopeHash(samples: Array[Int]): Long = {
    val n = samples.length
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var i = 0
    while (i < n) {
      val w = math.min(63, (i.toLong * 64 / n).toInt)
      sums(w) += math.abs(samples(i))
      counts(w) += 1
      i += 1
    }
    val means = Array.tabulate(64)(w =>
      if (counts(w) == 0) 0.0 else sums(w).toDouble / counts(w))
    val filled = counts.count(_ > 0)
    val streamMean = means.sum / math.max(1, filled)
    var bits = 0L
    var w = 0
    while (w < 64) {
      if (counts(w) > 0 && means(w) > streamMean) bits |= (1L << w)
      w += 1
    }
    bits
  }

  /** `(id, afp)` — the audio content fingerprint per payload; NULL
    * when the payload is not decodable 16-bit PCM WAV. Same shape and
    * scale contract as [[withPerceptualHash]]: row-local decode, only
    * (id, 8-byte hash) leaves the scan. */
  def withAudioFingerprint(df: DataFrame, idCol: String,
                           binCol: String): Dataset[HashedMedia] = {
    implicit val enc: Encoder[HashedMedia] = Encoders.product[HashedMedia]
    df.select(col(idCol).cast(LongType).as("id"), lit("audio").as("kind"),
        col(binCol).as("bytes"))
      .as[MediaRow](mediaRowEnc)
      .mapPartitions(_.map(row =>
        HashedMedia(row.id, wavPcmSamples(row.bytes).map(envelopeHash))))
  }

  /** Audio twin of [[dedupByPerceptualHash]]: keep the lowest-id
    * exemplar per envelope-fingerprint family with `n_copies`;
    * payloads without a decodable PCM stream are id-keyed singleton
    * families. Same ONE-shuffle fingerprint-window contract. */
  def dedupByAudioFingerprint(df: DataFrame, idCol: String,
                              binCol: String): DataFrame = {
    require(!df.columns.contains("n_copies"),
      "dedupByAudioFingerprint emits n_copies; rename the input column first")
    dedupByHashFrame(df, idCol,
      withAudioFingerprint(df, idCol, binCol).toDF(), "__noaudio#")
  }

  /** The shared fingerprint-window dedup tail behind the image and
    * audio hash dedups: `hashed` is `(id, phash nullable)`. */
  private def dedupByHashFrame(df: DataFrame, idCol: String,
                               hashed: DataFrame, fallbackTag: String): DataFrame = {
    val keyed = hashed.select(col("id").as(idCol),
      coalesce(col("phash").cast(StringType),
        concat(lit(fallbackTag), col("id").cast(StringType))).as("__fp"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
    val decided = keyed
      .withColumn("__keep", min(col(idCol)).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .filter(col(idCol) === col("__keep"))
      .select(col(idCol), col("n_copies"))
    df.join(decided, Seq(idCol), "inner")
      .select(df.columns.map(col) :+ col("n_copies"): _*)
  }

  /**
   * Persist the corpus's perceptual hashes as a parquet artifact —
   * the [[DedupIndex]] pattern for images: the historical corpus is
   * DECODED ONCE at build time; every later batch pays only its own
   * O(batch) decode plus an 8-byte-key join against the artifact,
   * never a re-decode of the history. Undecodable payloads carry no
   * identity and are not indexed.
   */
  def buildPhashIndex(media: DataFrame, idCol: String, binCol: String,
                      path: String): Unit =
    withPerceptualHash(media, idCol, binCol).toDF()
      .filter(col("phash").isNotNull)
      .select(col("id"), col("phash"))
      .write.mode("overwrite").parquet(path)

  /** O(batch) index refresh: decode and append ONLY the new batch's
    * hashes (parquet append — no rewrite of the history). Run after
    * the batch's own dedup decision, like [[DedupIndex.append]]. */
  def appendPhashIndex(newMedia: DataFrame, idCol: String, binCol: String,
                       path: String): Unit =
    withPerceptualHash(newMedia, idCol, binCol).toDF()
      .filter(col("phash").isNotNull)
      .select(col("id"), col("phash"))
      .write.mode("append").parquet(path)

  /**
   * Incremental image dedup: drop every new payload whose decoded
   * raster already exists in the index (exact phash membership — the
   * cross-format identity, so a re-encode of an indexed picture is a
   * duplicate however its bytes changed). Undecodable payloads carry
   * no dedup evidence and are KEPT — the id-fallback convention of
   * the dedup family.
   *
   * 100 TB design: the history side is the (id, 8-byte hash) artifact
   * — never re-decoded, never carrying pixels; the batch is decoded
   * once into hashes and the membership probe joins 8-byte keys
   * (AQE broadcasts whichever side is small). The final anti-join is
   * id-keyed and bounded by the duplicate count. The batch's binary
   * column is scanned twice (hash subtree + output subtree) — column
   * -pruned parquet reads; the decode itself runs once.
   */
  def phashDedupAgainstIndex(newMedia: DataFrame, idCol: String,
                             binCol: String, path: String): DataFrame = {
    val idx = newMedia.sparkSession.read.parquet(path)
      .select(col("phash")).distinct()
    val dupIds = withPerceptualHash(newMedia, idCol, binCol).toDF()
      .filter(col("phash").isNotNull)
      .join(idx, Seq("phash"), "left_semi")
      .select(col("id").as(idCol))
    newMedia.join(dupIds, Seq(idCol), "left_anti")
  }

  /** One sampled video frame. */
  final case class FrameSample(id: Long, frameIdx: Int, feature: Array[Float])

  implicit private val frameEnc: Encoder[FrameSample] = Encoders.product[FrameSample]

  /**
   * Resize decoded media to a target box, preserving aspect ratio
   * (standard image-pipeline pre-step before feature extraction). The
   * pixel resample itself is the decoder's job in production — here the
   * dimension math is real and the feature rescale is the stub.
   */
  def resize(ds: Dataset[DecodedMedia], maxW: Int, maxH: Int): Dataset[DecodedMedia] =
    ds.map { m =>
      val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      if (scale >= 1.0) m
      else m.copy(
        width = math.max(1, math.round(m.width * scale).toInt),
        height = math.max(1, math.round(m.height * scale).toInt))
    }

  /**
   * Frame sampling for video payloads: emit every `everyN`-th frame as
   * its own row (the unit a frame-level embedding model consumes).
   * flatMap keeps it partition-local — no shuffle; at scale the output
   * is repartitioned by the WRITER, not here.
   */
  def sampleFrames(ds: Dataset[DecodedMedia], everyN: Int): Dataset[FrameSample] =
    ds.flatMap { m =>
      if (m.kind != "video" || m.nFrames <= 0) Iterator.empty
      else (0 until m.nFrames by math.max(1, everyN)).iterator.map { f =>
        // stub frame feature: deterministic per (payload, frame index);
        // a real decoder would extract the frame and embed it
        FrameSample(m.id, f, m.feature.map(x => x + f * 1e-3f))
      }
    }
}
