package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (driver north star): media as opaque `binary`
  * columns with typed metadata, decode / feature-extract / frame-sample as
  * distributed per-partition transforms.
  *
  * No image/audio codecs exist in this environment, so the DECODE step is a
  * clearly-marked deterministic stub ([[decodeStub]]) — what is real and
  * tested is the Spark-side shape: the binary+metadata schema, the
  * `mapPartitions` batch transform (one decoder init per partition, the same
  * shape a JNI/FFmpeg/pillow-equivalent decoder needs), the offset-based
  * frame sampling, and the pure-SQL metadata path (q40) that never
  * materializes the blob in a shuffle.
  *
  * Scale notes (100 TB of media): metadata extraction (q40) is a narrow
  * projection — only byte length/hash flow into the agg, the blob column is
  * pruned from the shuffle. Real decode work is partition-local
  * (`mapPartitions`), so media bytes never cross the network; frame
  * sampling emits (offset, length) pointers, not frame bytes.
  */
object Multimodal {

  /** One decoded-media record: everything downstream needs, no raw bytes. */
  final case class MediaMeta(
      docId: Long,
      nBytes: Long,
      contentMd5: String,
      // stubbed "decoded" fields — a real build fills these from the codec:
      width: Int,
      height: Int,
      nFrames: Int)

  /** Synthesize a media table from `documents`: the text bytes stand in for
    * an opaque media blob (utf-8), with source-side metadata columns.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Queries.t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("media"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** DECODE STUB — deterministic fake decoder for non-image payloads. A
    * production build replaces the body with a codec call; the
    * `mapPartitions` contract (batch iterator in, metadata iterator out,
    * one decoder init per partition) is exactly what a native decoder needs
    * and is what the test pins.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "decoder init" happens here (stub: a digest)
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (docId, bytes) =>
          digest.reset()
          val md5Hex = digest.digest(bytes).map("%02x".format(_)).mkString
          // fake decode: dimensions derived deterministically from content
          val w = 160 + (bytes.headOption.getOrElse(0: Byte) & 0x3f)
          val h = 90 + (bytes.lastOption.getOrElse(0: Byte) & 0x3f)
          MediaMeta(docId, bytes.length.toLong, md5Hex, w, h,
            nFrames = math.max(1, bytes.length / 64))
        }
      }
  }

  /** One decoded image record (real decode — `ok=false` rows carry the
    * failure reason instead of dimensions; corrupt media must not kill the
    * job, SURVEY T5 applied to the data plane).
    */
  final case class ImageMeta(
      docId: Long, ok: Boolean, format: String,
      width: Int, height: Int, nBytes: Long, error: String)

  /** REAL image decode on the JVM — `javax.imageio` ships with the JDK
    * (PNG/JPEG/GIF/BMP readers), no external codec needed. Executed as
    * `mapPartitions`: reader lookup is per-partition, image bytes never
    * leave the partition, and per-row failures degrade to error records.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
        rows.map { case (docId, bytes) =>
          try {
            val in = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(in)
            if (!readers.hasNext)
              ImageMeta(docId, ok = false, "", 0, 0, bytes.length.toLong, "no reader")
            else {
              val r = readers.next()
              try {
                r.setInput(in)
                ImageMeta(docId, ok = true, r.getFormatName.toLowerCase,
                  r.getWidth(0), r.getHeight(0), bytes.length.toLong, "")
              } finally r.dispose()
            }
          } catch {
            case e: Exception =>
              ImageMeta(docId, ok = false, "", 0, 0, bytes.length.toLong,
                String.valueOf(e.getMessage))
          }
        }
      }
  }

  /** Real resize (feature-extract step): decode, scale to `maxDim` on the
    * long edge, re-encode PNG — all JDK (`java.awt` headless). Returns
    * (doc_id, resized bytes, new width, new height); failures are dropped.
    */
  def resizeImages(spark: SparkSession, media: DataFrame, maxDim: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) None
            else {
              val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
              val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
                math.max(1, (img.getHeight * scale).toInt))
              val out = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH),
                0, 0, null)
              finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Some((docId, bos.toByteArray, w, h))
            }
          } catch { case _: Exception => None }
        }
      }.toDF("doc_id", "resized", "width", "height")
  }

  /** 64-bit perceptual average-hash (aHash) over REAL decoded images: scale
    * to 8x8 grayscale, bit i = pixel_i >= mean. The image-side analog of
    * SimHash (q33): near-duplicate images land within a small hamming
    * radius and bucket-join exactly like the text fingerprints, so the
    * whole dedup machinery (banding, hamming verification, clustering)
    * reuses unchanged. Uniform brightness/contrast shifts preserve the
    * hash exactly (bits are mean-relative); undecodable media is dropped.
    * Runs as mapPartitions (decoder init per partition, bytes stay
    * partition-local) — same contract as [[decodeImages]].
    */
  def imageAHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) None
            else {
              val small = new java.awt.image.BufferedImage(8, 8,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = small.createGraphics()
              try g.drawImage(img.getScaledInstance(8, 8, java.awt.Image.SCALE_AREA_AVERAGING),
                0, 0, null)
              finally g.dispose()
              val gray = new Array[Long](64)
              var i = 0
              while (i < 64) {
                val rgb = small.getRGB(i % 8, i / 8)
                gray(i) = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
                  (rgb & 0xff) * 114L) / 1000L
                i += 1
              }
              val mean = gray.sum / 64L
              var hash = 0L
              i = 0
              while (i < 64) { if (gray(i) >= mean) hash |= (1L << i); i += 1 }
              Some((docId, hash))
            }
          } catch { case _: Exception => None }
        }
      }.toDF("doc_id", "ahash")
  }

  /** Hamming radius for q130 near-dup pairs. With [[AHashBands]] = 4
    * bands of 16 bits, banding is EXACT at this radius: a pair within
    * Hamming 3 differs in at most 3 bands, so at least one band collides
    * (pigeonhole) — no false negatives, spec-asserted against brute
    * force.
    */
  private val HamTau = 3
  private val AHashBands = 4

  /** Synthesize a deterministic 8x8 grayscale PNG per document: pixel i
    * (row-major) = the code point of text character (i mod len) — the
    * image-side analog of q70's text-derived WAV fixture, and the
    * property that makes q130 oracle-checkable: DuckDB recomputes the
    * same pixels from `documents.text` with ascii(substring(...)) while
    * the ENGINE path round-trips real PNG bytes through the real
    * [[imageAHash]] decoder. The 8x8 source size makes the decoder's
    * scale-to-8x8 step the identity and the luma transform exact
    * ((299v+587v+114v)/1000 = v), so both engines see identical
    * grayscale grids.
    */
  def imageTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Queries.t(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (docId, text) =>
          val img = new java.awt.image.BufferedImage(8, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < 64) {
            val v = text.charAt(i % text.length).toInt & 0xff
            img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (docId, bos.toByteArray)
        }
      }.toDF("doc_id", "media")
  }

  /** Image near-duplicate clusters (q130): the dedup step the multimodal
    * family was missing — [[imageAHash]] fingerprints (REAL PNG decode),
    * banded into [[AHashBands]] 16-bit keys (q33's SimHash banding, moved
    * to the image hash), Hamming-verified pairs at radius [[HamTau]], and
    * connected components via the q50 min-label kernel. One row per
    * non-singleton cluster: (cluster_id = min member doc_id, n_imgs).
    *
    * Scale shape (100 TB of images): hashing is partition-local decode
    * (bytes never shuffle); candidate generation is an equi-join on
    * (band, key) — never all-pairs; the Hamming check is one codegen
    * bit_count on the 8-byte hashes riding the candidate rows; clustering
    * joins touch only the EDGE list. Banding at radius <= bands-1 is
    * exact, so the scan never needs a recall-repair pass.
    */
  def q130ImageNeardup(spark: SparkSession, dir: String): DataFrame =
    hammingClusters(
      imageAHash(spark, imageTable(spark, dir)).localCheckpoint(true), "n_imgs")

  /** The shared 64-bit-fingerprint clustering pipeline behind q130
    * (images) and q144 (audio): band the hash into [[AHashBands]] 16-bit
    * keys, equi-join band collisions into candidates (never all-pairs),
    * verify with one codegen `bit_count` at radius [[HamTau]] (exact —
    * pigeonhole over the bands), and label connected components with the
    * q50 min-label kernel. One row per non-singleton cluster.
    */
  private def hammingClusters(hashes: DataFrame, sizeCol: String): DataFrame = {
    val banded = hashes
      .select(col("doc_id"), col("ahash"),
        explode(expr(s"sequence(0, ${AHashBands - 1})")).as("b"))
      .withColumn("bk", expr("(ahash >> (b * 16)) & 65535"))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.b") === col("b.b") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.ahash").as("hi"), col("b.ahash").as("hj"))
      .distinct()
      .withColumn("hamming", expr("bit_count(hi ^ hj)").cast("long"))
      .filter(col("hamming") <= HamTau)
      .select("i", "j")
    Curation.clusterLabelsWithRounds(pairs)._1
      .groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as(sizeCol))
      .orderBy(col("cluster_id"))
  }

  /** Brute-force twin of q130's candidate stage (spec-only): ALL pairs
    * within [[HamTau]], no banding — the recall oracle the banded path
    * must match exactly.
    */
  private[graft] def bruteForceNeardupPairs(
      spark: SparkSession, dir: String): DataFrame = {
    val hashes = imageAHash(spark, imageTable(spark, dir)).localCheckpoint(true)
    hashes.as("a").join(hashes.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", expr("bit_count(a.ahash ^ b.ahash)").cast("long"))
      .filter(col("hamming") <= HamTau)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
  }

  /** One decoded-audio record; `ok=false` rows carry the failure instead of
    * features (corrupt media degrades, never kills the job).
    */
  final case class AudioMeta(
      docId: Long, ok: Boolean, sampleRate: Int, nSamples: Long,
      durationMs: Long, peak: Long, rms: Double, error: String)

  /** Wrap raw 8-bit unsigned PCM in a RIFF/WAVE container (44-byte header,
    * mono). The synth side of the audio round-trip: tests and q70 build
    * real WAV files from deterministic payloads, then decode them with the
    * real parser below.
    */
  def wavContainer(pcm: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)             // PCM
      .putShort(1.toShort)             // mono
      .putInt(sampleRate)
      .putInt(sampleRate)              // byte rate (1 byte/sample)
      .putShort(1.toShort)             // block align
      .putShort(8.toShort)             // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    bb.array()
  }

  /** REAL audio decode on the JVM — `javax.sound.sampled.AudioSystem`
    * ships with the JDK (WAV/AIFF/AU parsers), no external codec needed.
    * The container header is genuinely parsed (sample rate, bit depth,
    * channel count come from the file, not from assumptions), the PCM
    * payload is streamed back out, and loudness features are integer
    * arithmetic over the samples. Same `mapPartitions` contract as
    * [[decodeImages]]: bytes never leave the partition, per-row failures
    * degrade to error records.
    */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, bytes) =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
            try {
              val fmt = in.getFormat
              require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
                s"unsupported layout: ${fmt.getSampleSizeInBits}-bit/${fmt.getChannels}ch")
              val pcm = in.readAllBytes()
              var sumSq = 0L
              var peak = 0L
              var i = 0
              while (i < pcm.length) {
                val centered = (pcm(i) & 0xff) - 128L // unsigned PCM midpoint
                sumSq += centered * centered
                if (math.abs(centered) > peak) peak = math.abs(centered)
                i += 1
              }
              val rate = fmt.getSampleRate.toInt
              val n = pcm.length.toLong
              AudioMeta(docId, ok = true, rate, n,
                durationMs = if (rate == 0) 0L else n * 1000L / rate,
                peak = peak,
                rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n),
                error = "")
            } finally in.close()
          } catch {
            case e: Exception =>
              AudioMeta(docId, ok = false, 0, 0L, 0L, 0L, 0.0,
                String.valueOf(e.getMessage))
          }
        }
      }
  }

  /** Audio feature extraction as a query: each doc's text bytes stand in
    * for an 8 kHz unsigned-PCM payload (the same blob-synthesis trick as
    * q40), wrapped in a real WAV container and decoded by the REAL
    * javax.sound parser — so header parsing, format negotiation, and the
    * PCM round-trip are all exercised, while the features stay exact
    * integer arithmetic the DuckDB oracle replays from character codes.
    */
  def q70AudioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Queries.t(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, wavContainer(text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
      }).toDF("doc_id", "media")
    decodeAudio(spark, media)
      .filter(col("ok"))
      .select(col("docId").as("doc_id"), col("sampleRate").as("sample_rate"),
        col("nSamples").as("n_samples"), col("durationMs").as("duration_ms"),
        col("peak"), col("rms"))
      .orderBy(col("doc_id"))
  }
  // ------------------------------------------------------------------
  // q144: audio near-duplicate clusters (energy-profile fingerprints)
  // ------------------------------------------------------------------

  /** Samples fingerprinted per clip — the fixed prefix window. */
  private val AudioFpSamples = 256
  /** Samples per energy window (=> [[AudioFpSamples]]/this = 64 bits). */
  private val AudioFpWin = 4

  /** 64-bit energy-profile fingerprint over REAL decoded audio: the first
    * [[AudioFpSamples]] PCM samples (cycled when the clip is shorter — the
    * q130 pixel-synthesis stability trick) split into 64 windows of
    * [[AudioFpWin]], bit w = window mean |amplitude| above the prefix
    * mean, compared by exact integer cross-multiplication. A FIXED prefix,
    * not n-proportional windows: proportional boundaries shift under any
    * insertion and near-identical clips land ~10+ bits apart (measured on
    * the fixture corpus — the alignment fragility every audio fingerprint
    * fights); a fixed sample grid keeps an edit localized to the windows
    * it touches. Volume scaling flips no bits (mean-relative), which is
    * the property that makes it a perceptual hash rather than a checksum.
    * Undecodable or sub-64-sample clips are dropped. Same `mapPartitions`
    * contract as [[decodeAudio]]: bytes never leave the partition.
    */
  def audioEnergyHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, bytes) =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
            try {
              val fmt = in.getFormat
              if (fmt.getSampleSizeInBits != 8 || fmt.getChannels != 1) None
              else {
                val pcm = in.readAllBytes()
                val n = pcm.length
                if (n < 64) None
                else {
                  val sums = new Array[Long](64)
                  var total = 0L
                  var i = 0
                  while (i < AudioFpSamples) {
                    val e = math.abs((pcm(i % n) & 0xff) - 128L)
                    sums(i / AudioFpWin) += e
                    total += e
                    i += 1
                  }
                  var hash = 0L
                  var w = 0
                  while (w < 64) {
                    // avg_w > avg_all <=> sw/AudioFpWin > total/AudioFpSamples
                    if (sums(w) * 64L > total) hash |= (1L << w)
                    w += 1
                  }
                  Some((docId, hash))
                }
              }
            } finally in.close()
          } catch { case _: Exception => None }
        }
      }.toDF("doc_id", "ahash")
  }

  /** Audio near-duplicate clusters (q144): the dedup step for the audio
    * modality, completing the near-dup trio (text q31/q50, image q130,
    * audio here). Each doc's WAV payload ([[q70AudioFeatures]]'s real
    * container + real javax.sound decode) is fingerprinted by
    * [[audioEnergyHash]], then the SAME banding/Hamming/clustering
    * pipeline as q130 runs unchanged — the payoff of fingerprint-shaped
    * dedup: one downstream machine serves every modality that can hash
    * itself into 64 bits. Scale shape identical to q130: partition-local
    * decode, banded equi-join candidates, edge-list-sized clustering.
    */
  def q144AudioNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Queries.t(spark, dir, "documents")
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, wavContainer(text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
      }).toDF("doc_id", "media")
    hammingClusters(
      audioEnergyHash(spark, media).localCheckpoint(true), "n_clips")
  }

  // ------------------------------------------------------------------
  // q132: video container parse + frame sampling (the missing modality)
  // ------------------------------------------------------------------

  /** q132 video geometry: 8x8 single-channel frames, 64 bytes each. */
  private val FrameBytes = 64
  /** Frames per second stamped in the container header. */
  private val VideoFps = 4
  /** Keep every [[VideoStride]]-th frame (frame 0, 2, 4, ...). */
  private val VideoStride = 2
  /** Container header: magic "GVID" + u16 width/height/fps/n_frames, LE. */
  private val VideoHeaderBytes = 12

  /** Synthesize a deterministic video container per document — the video
    * analog of [[imageTable]]/q70's WAV fixture: a 12-byte parsed header
    * (magic, dimensions, fps, frame count) followed by n_frames x 64
    * bytes of 8x8 grayscale frames, pixel (f, i) = text byte
    * ((f*64 + i) mod len). n_frames = ceil(len/64), so every text byte
    * appears and DuckDB can replay the exact pixel stream from
    * `documents.text` with modular substring arithmetic.
    */
  def videoTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Queries.t(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        val nFrames = (payload.length + FrameBytes - 1) / FrameBytes
        val bb = java.nio.ByteBuffer
          .allocate(VideoHeaderBytes + nFrames * FrameBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("GVID".getBytes("US-ASCII"))
          .putShort(8.toShort).putShort(8.toShort)
          .putShort(VideoFps.toShort).putShort(nFrames.toShort)
        var p = 0
        while (p < nFrames * FrameBytes) {
          bb.put(payload(p % payload.length)); p += 1
        }
        (docId, bb.array())
      }).toDF("doc_id", "media")
  }

  /** One decoded-video record; `ok=false` rows carry the failure (corrupt
    * containers degrade to error rows, never kill the job — T5 on the
    * data plane, same contract as [[decodeImages]]/[[decodeAudio]]).
    */
  final case class VideoMeta(
      docId: Long, ok: Boolean, width: Int, height: Int, fps: Int,
      nFrames: Long, nSampled: Long, durationMs: Long,
      meanLuma: Long, peak: Long, error: String)

  /** REAL container parse + strided frame sampling as `mapPartitions`:
    * the header is genuinely read (magic validated, dimensions/fps/count
    * from the bytes, not assumptions), frames are fixed-stride slices of
    * the payload, and only every [[VideoStride]]-th frame is touched —
    * the sampled-decode shape a real video pipeline runs (decode
    * keyframes, skip the rest). Features are exact integer arithmetic
    * over sampled pixels (mean luma as a truncating div, peak), so the
    * DuckDB oracle replays them bit-for-bit from the text fixture.
    * Bytes never leave the partition; only 10 small columns shuffle.
    */
  def decodeVideo(spark: SparkSession, media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (docId, bytes) =>
        try {
          require(bytes.length >= VideoHeaderBytes, "truncated header")
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val magic = new Array[Byte](4)
          bb.get(magic)
          require(new String(magic, "US-ASCII") == "GVID", "bad magic")
          val w = bb.getShort & 0xffff
          val h = bb.getShort & 0xffff
          val fps = bb.getShort & 0xffff
          val nFrames = bb.getShort & 0xffff
          require(fps > 0 && w * h > 0, "bad geometry")
          require(bytes.length >= VideoHeaderBytes + nFrames * w * h,
            "truncated payload")
          var f = 0
          var sampled = 0L
          var lumaSum = 0L
          var peak = 0L
          while (f < nFrames) {
            if (f % VideoStride == 0) {
              sampled += 1
              val base = VideoHeaderBytes + f * w * h
              var i = 0
              while (i < w * h) {
                val v = bytes(base + i) & 0xff
                lumaSum += v
                if (v > peak) peak = v
                i += 1
              }
            }
            f += 1
          }
          VideoMeta(docId, ok = true, w, h, fps, nFrames.toLong, sampled,
            durationMs = nFrames.toLong * 1000L / fps,
            meanLuma = if (sampled == 0) 0L else lumaSum / (sampled * w * h),
            peak = peak, error = "")
        } catch {
          case e: Exception =>
            VideoMeta(docId, ok = false, 0, 0, 0, 0L, 0L, 0L, 0L, 0L,
              String.valueOf(e.getMessage))
        }
      })
  }

  /** Video frame-sample features as a query (q132): synthesize the
    * container ([[videoTable]]), parse and sample it with the REAL binary
    * decoder ([[decodeVideo]]) — header parse, strided frame decode, and
    * integer luma features all exercised end-to-end, oracle-replayed by
    * DuckDB from character codes (the q70/q130 fixture recipe applied to
    * the last missing modality).
    */
  def q132VideoFrames(spark: SparkSession, dir: String): DataFrame =
    decodeVideo(spark, videoTable(spark, dir))
      .filter(col("ok"))
      .select(col("docId").as("doc_id"), col("nFrames").as("n_frames"),
        col("nSampled").as("n_sampled"), col("durationMs").as("duration_ms"),
        col("meanLuma").as("mean_luma"), col("peak"))
      .orderBy(col("doc_id"))

  /** Frame sampling as offset arithmetic: every `stride` bytes, an
    * (offset, length) window — pointers, not bytes.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("n_bytes") > 0) // empty media has no frames (and
      // sequence(0, -1, +stride) would throw on illegal boundaries)
      .select(col("doc_id"), col("n_bytes"),
        explode(expr(s"sequence(0L, n_bytes - 1, $stride)")).as("frame_offset"))
      .withColumn("frame_len", least(lit(stride.toLong), col("n_bytes") - col("frame_offset")))

  /** Metadata extraction + per-source aggregation, blob-column pruned before
    * the shuffle. The md5/first-byte path is the oracle-checkable slice of
    * the decode pipeline.
    */
  def q40MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("source"), col("n_bytes"),
        md5(col("media")).as("content_md5"),
        expr("CAST((n_bytes + 255) div 256 AS BIGINT)").as("n_chunks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_chunks")).as("total_chunks"),
        min(col("content_md5")).as("min_md5"))
      .orderBy(col("source"))

  val oracles: Map[String, String] = Map(
    "q40_multimodal_meta" ->
      """WITH m AS (
        |  SELECT source,
        |    octet_length(encode(text)) AS n_bytes,
        |    md5(text) AS content_md5,
        |    (octet_length(encode(text)) + 255) // 256 AS n_chunks
        |  FROM documents)
        |SELECT source, count(*) AS n_media,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(n_chunks) AS BIGINT) AS total_chunks,
        |  min(content_md5) AS min_md5
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    "q70_audio_features" ->
      """WITH s AS (
        |  SELECT doc_id, ascii(substring(text, i, 1)) AS v
        |  FROM documents, unnest(generate_series(1, length(text))) AS t(i)
        |  WHERE length(text) > 0)
        |SELECT doc_id,
        |  8000 AS sample_rate,
        |  count(*) AS n_samples,
        |  CAST(count(*) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(max(abs(v - 128)) AS BIGINT) AS peak,
        |  sqrt(CAST(sum((v - 128) * (v - 128)) AS DOUBLE) / count(*)) AS rms
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // pixels recomputed from text exactly as imageTable synthesizes them
    // (% 256 = the engine's byte mask); aHash/banding/Hamming re-derived
    // in pure SQL; components via the recursive-reach pattern (q50)
    "q130_image_neardup" ->
      s"""WITH RECURSIVE px AS (
        |  SELECT doc_id, g.i AS i,
        |    ascii(substring(text, (g.i % length(text)) + 1, 1)) % 256 AS v
        |  FROM documents, generate_series(0, 63) AS g(i)
        |  WHERE length(text) > 0),
        |m AS (SELECT doc_id, sum(v) // 64 AS mean FROM px GROUP BY doc_id),
        |bits AS (
        |  SELECT px.doc_id, px.i,
        |    CASE WHEN px.v >= m.mean THEN 1 ELSE 0 END AS bit
        |  FROM px JOIN m USING (doc_id)),
        |bands AS (
        |  SELECT doc_id, i // 16 AS b,
        |    CAST(sum(bit * (1 << (i % 16))) AS BIGINT) AS bk
        |  FROM bits GROUP BY doc_id, i // 16),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id),
        |ham AS (
        |  SELECT c.i, c.j, sum(bit_count(xor(ba.bk, bb.bk))) AS hamming
        |  FROM cand c JOIN bands ba ON ba.doc_id = c.i
        |       JOIN bands bb ON bb.doc_id = c.j AND ba.b = bb.b
        |  GROUP BY c.i, c.j),
        |pairs AS (SELECT i, j FROM ham WHERE hamming <= $HamTau),
        |edges AS (SELECT i AS u, j AS v FROM pairs
        |          UNION SELECT j, i FROM pairs),
        |reach AS (
        |  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v),
        |comp AS (SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u)
        |SELECT cluster_id, count(*) AS n_imgs
        |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    // pixel (f, i) = text byte ((f*64 + i) mod len) — the videoTable
    // the audio fingerprint replayed from character codes: sample i of the
    // cycled 256-sample prefix is text byte (i mod len), energy = distance
    // from the unsigned-PCM midpoint; banding/Hamming/clustering identical
    // to q130's oracle
    "q144_audio_neardup" ->
      s"""WITH RECURSIVE s AS (
        |  SELECT doc_id, g.i AS i,
        |    abs((ascii(substring(text, (g.i % length(text)) + 1, 1)) % 256) - 128) AS e
        |  FROM documents, generate_series(0, ${AudioFpSamples - 1}) AS g(i)
        |  WHERE length(text) >= 64),
        |win AS (SELECT doc_id, i // $AudioFpWin AS w, sum(e) AS sw
        |        FROM s GROUP BY doc_id, i // $AudioFpWin),
        |tot AS (SELECT doc_id, sum(e) AS te FROM s GROUP BY doc_id),
        |bits AS (SELECT w.doc_id, w.w AS i,
        |           CASE WHEN w.sw * 64 > t.te THEN 1 ELSE 0 END AS bit
        |         FROM win w JOIN tot t USING (doc_id)),
        |bands AS (
        |  SELECT doc_id, i // 16 AS b,
        |    CAST(sum(bit * (1 << (i % 16))) AS BIGINT) AS bk
        |  FROM bits GROUP BY doc_id, i // 16),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id),
        |ham AS (
        |  SELECT c.i, c.j, sum(bit_count(xor(ba.bk, bb.bk))) AS hamming
        |  FROM cand c JOIN bands ba ON ba.doc_id = c.i
        |       JOIN bands bb ON bb.doc_id = c.j AND ba.b = bb.b
        |  GROUP BY c.i, c.j),
        |pairs AS (SELECT i, j FROM ham WHERE hamming <= $HamTau),
        |edges AS (SELECT i AS u, j AS v FROM pairs
        |          UNION SELECT j, i FROM pairs),
        |reach AS (
        |  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v),
        |comp AS (SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u)
        |SELECT cluster_id, count(*) AS n_clips
        |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    // synthesis replayed with modular substring arithmetic; only every
    // VideoStride-th frame contributes, exactly as the decoder samples
    "q132_video_frames" ->
      s"""WITH s AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    (length(text) + ${FrameBytes - 1}) // $FrameBytes AS n_frames
        |  FROM documents WHERE length(text) > 0),
        |fr AS (
        |  SELECT doc_id, len, n_frames, f
        |  FROM s, unnest(generate_series(0, n_frames - 1)) AS t(f)
        |  WHERE f % $VideoStride = 0),
        |px AS (
        |  SELECT fr.doc_id, fr.n_frames, fr.f,
        |    ascii(substring(s.text,
        |      CAST((fr.f * $FrameBytes + p.i) % fr.len AS INTEGER) + 1, 1)) AS v
        |  FROM fr JOIN s USING (doc_id),
        |       unnest(generate_series(0, ${FrameBytes - 1})) AS p(i))
        |SELECT doc_id,
        |  CAST(max(n_frames) AS BIGINT) AS n_frames,
        |  CAST(count(DISTINCT f) AS BIGINT) AS n_sampled,
        |  CAST(max(n_frames) * 1000 // $VideoFps AS BIGINT) AS duration_ms,
        |  CAST(sum(v) // count(*) AS BIGINT) AS mean_luma,
        |  CAST(max(v) AS BIGINT) AS peak
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_multimodal_meta" -> (q40MultimodalMeta _),
    "q70_audio_features" -> (q70AudioFeatures _),
    "q130_image_neardup" -> (q130ImageNeardup _),
    "q132_video_frames" -> (q132VideoFrames _),
    "q144_audio_neardup" -> (q144AudioNeardup _),
  )
}
