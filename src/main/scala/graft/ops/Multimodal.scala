package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column plumbing.
 *
 * Design (mirrors the reference's `ImageFile`/`VideoFile`/`AudioFile`
 * models, reference: src/datachain/lib/file.py:812-1003): media payloads
 * travel as opaque `binary` columns with a typed metadata struct alongside;
 * decode/resize/frame-sample run as partition-local batch transforms
 * (`mapPartitions`), which is Spark's executor-parallel path for per-blob
 * CPU work — the Scala analogue of `mapInPandas` batches.
 *
 * Image decode is REAL: PNG/JPEG payloads go through `javax.imageio`
 * (ships with the JDK — no external dependency). Audio/video decode stays
 * STUBBED (`decodeImageStub` / byte-range fragment math) because those
 * codecs are not in the JDK; the Spark-side contract — schema, batch
 * iteration, partition parallelism, metadata propagation — is real and
 * tested for all modalities.
 */
object Multimodal {

  // ImageIO defaults to disk-backed stream caching (a temp file per call)
  // — pure overhead for in-memory byte[] payloads and a point of contention
  // with 32 decode threads. Executor JVMs pick this up on class load.
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata carried next to every media payload. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  case class ImageMeta(format: String, width: Int, height: Int, n_bytes: Long)
  case class MediaRow(id: Long, payload: Array[Byte], format: String)
  case class DecodedRow(id: Long, meta: ImageMeta, features: Array[Float])

  /**
   * Deterministic fake "decode": dimensions and features derived from the
   * payload bytes. STUB — stands in for an image codec; byte-identical
   * inputs give byte-identical outputs so tests can assert on it.
   */
  def decodeImageStub(payload: Array[Byte], format: String): (ImageMeta, Array[Float]) = {
    val h = graft.functions.Impl.sipHash64Bytes(payload)
    val w = (math.abs(h) % 1920 + 1).toInt
    val ht = (math.abs(h >> 16) % 1080 + 1).toInt
    val feats = Array.tabulate(8)(i =>
      ((h >>> (i * 8)) & 0xff).toFloat / 255f)
    (ImageMeta(format, w, ht, payload.length.toLong), feats)
  }

  /**
   * Real image decode for PNG/JPEG payloads via `javax.imageio` (JDK
   * built-in; magic-byte sniffed). Returns true pixel dimensions plus mean
   * R/G/B channel features (raw 0-255 scale). Non-image payloads (audio/
   * video containers, unknown blobs) fall back to the deterministic stub —
   * those codecs aren't in the JDK. Reference contract: `ImageFile` /
   * `Image` model, src/datachain/lib/file.py:812-878.
   */
  def decodeImage(payload: Array[Byte], format: String): (ImageMeta, Array[Float]) = {
    val isPng = payload.length > 8 && (payload(0) & 0xFF) == 0x89 &&
      payload(1) == 'P'.toByte && payload(2) == 'N'.toByte && payload(3) == 'G'.toByte
    val isJpeg = payload.length > 3 && (payload(0) & 0xFF) == 0xFF &&
      (payload(1) & 0xFF) == 0xD8
    val isGif = payload.length > 6 && payload(0) == 'G'.toByte &&
      payload(1) == 'I'.toByte && payload(2) == 'F'.toByte &&
      payload(3) == '8'.toByte
    val isBmp = payload.length > 2 && payload(0) == 'B'.toByte &&
      payload(1) == 'M'.toByte
    if (!isPng && !isJpeg && !isGif && !isBmp)
      return decodeImageStub(payload, format)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) return decodeImageStub(payload, format)
    val w = img.getWidth
    val h = img.getHeight
    var r = 0L; var g = 0L; var b = 0L
    // one bulk pixel fetch per row instead of w*h synchronized getRGB calls
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val p = rowBuf(x)
        r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val feats = Array((r / n).toFloat, (g / n).toFloat, (b / n).toFloat,
      w.toFloat, h.toFloat, payload.length.toFloat, 0f, 0f)
    val fmt = if (isPng) "png" else if (isJpeg) "jpeg"
      else if (isGif) "gif" else "bmp"
    (ImageMeta(fmt, w, h, payload.length.toLong), feats)
  }

  /**
   * Decode + feature-extract over a media DataFrame
   * (id: long, payload: binary, format: string). Partition-local, batched;
   * no shuffle — scales linearly with executors.
   */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"), col("format"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { m =>
          val (meta, feats) = decodeImage(m.payload, m.format)
          DecodedRow(m.id, meta, feats)
        }
      }
      .toDF()
  }

  /**
   * Resize plumbing: recomputes the metadata to the target box and
   * stub-transforms the payload (deterministic truncation/padding standing
   * in for a real resampler). 1:1, partition-local.
   */
  def resizeImages(decodedMedia: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = decodedMedia.sparkSession
    import spark.implicits._
    decodedMedia.as[DecodedRow].mapPartitions { it =>
      it.map { d =>
        val scale = math.min(1.0,
          math.min(maxW.toDouble / d.meta.width, maxH.toDouble / d.meta.height))
        val w = math.max(1, (d.meta.width * scale).toInt)
        val h = math.max(1, (d.meta.height * scale).toInt)
        d.copy(meta = d.meta.copy(width = w, height = h,
          n_bytes = (d.meta.n_bytes * scale * scale).toLong))
      }
    }.toDF()
  }

  /**
   * Frame-sampling plumbing for video payloads: yields `n` evenly spaced
   * frame records per video row (1:N generator shape, like the reference's
   * `VideoFile.get_frames`, file.py:901-1003). Frame bytes are stub-sliced.
   */
  case class FrameRow(id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"), col("format"))
      .as[MediaRow]
      .flatMap { m =>
        val len = math.max(1, m.payload.length / math.max(1, n))
        (0 until n).map { i =>
          val from = math.min(i * len, m.payload.length)
          val until = math.min(from + len, m.payload.length)
          FrameRow(m.id, i, m.payload.slice(from, until))
        }
      }
      .toDF()
  }

  /**
   * Audio fragment extraction plumbing (reference `AudioFile.get_fragments`,
   * file.py:1005+): 1:N — each audio row yields fragments of `fragmentSec`
   * seconds. Byte ranges are computed from a declared duration and uniform
   * bitrate (STUB standing in for a real audio demuxer; swap the range
   * math for a codec call in production — the row shape, generator
   * cardinality and partition-local execution are the real contract).
   */
  case class AudioRow(id: Long, payload: Array[Byte], duration_sec: Double)
  case class FragmentRow(id: Long, fragment_idx: Int, start_sec: Double,
                         end_sec: Double, fragment_bytes: Array[Byte])

  def sampleAudioFragments(media: DataFrame, fragmentSec: Double): DataFrame = {
    require(fragmentSec > 0, "fragmentSec must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"),
        col("duration_sec").cast("double"))
      .as[AudioRow]
      .flatMap { a =>
        val dur = math.max(a.duration_sec, 1e-9)
        val n = math.max(1, math.ceil(dur / fragmentSec).toInt)
        val bytesPerSec = a.payload.length / dur
        (0 until n).map { i =>
          val s = i * fragmentSec
          val e = math.min(s + fragmentSec, dur)
          val from = math.min((s * bytesPerSec).toInt, a.payload.length)
          val until = math.min((e * bytesPerSec).toInt, a.payload.length)
          FragmentRow(a.id, i, s, e, a.payload.slice(from, until))
        }
      }
      .toDF()
  }

  // ---- audio: REAL WAV decode via javax.sound.sampled (JDK built-in) ----

  /** Audio metadata, mirroring the reference `Audio` model field-for-field
    * (src/datachain/lib/file.py:1318-1345): -1 / "" on unknown. */
  case class AudioMeta(sample_rate: Int, channels: Int, duration: Double,
                       samples: Long, format: String, codec: String,
                       bit_rate: Int)
  case class DecodedAudioRow(id: Long, meta: AudioMeta)

  /**
   * Real audio metadata decode for WAV/AIFF/AU payloads through
   * `javax.sound.sampled.AudioSystem` (ships with the JDK — no external
   * codec). Compressed containers (mp3/ogg/mp4) have no JDK codec and fall
   * back to the deterministic stub so the pipeline shape still runs.
   * Reference contract: `AudioFile.get_info` → `Audio`
   * (src/datachain/lib/file.py:1005-1049).
   */
  def decodeAudio(payload: Array[Byte], format: String): AudioMeta = {
    val looksRiff = payload.length > 12 && payload(0) == 'R'.toByte &&
      payload(1) == 'I'.toByte && payload(2) == 'F'.toByte && payload(3) == 'F'.toByte
    val looksAiff = payload.length > 12 && payload(0) == 'F'.toByte &&
      payload(1) == 'O'.toByte && payload(2) == 'R'.toByte && payload(3) == 'M'.toByte
    val looksAu = payload.length > 4 && payload(0) == '.'.toByte &&
      payload(1) == 's'.toByte && payload(2) == 'n'.toByte && payload(3) == 'd'.toByte
    if (!looksRiff && !looksAiff && !looksAu) return decodeAudioStub(payload, format)
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val frames = in.getFrameLength
        val rate = f.getSampleRate.toInt
        val dur = if (frames >= 0 && rate > 0) frames.toDouble / rate else -1.0
        val bitRate =
          if (rate > 0 && f.getSampleSizeInBits > 0 && f.getChannels > 0)
            rate * f.getSampleSizeInBits * f.getChannels
          else -1
        AudioMeta(rate, f.getChannels, dur, frames,
          if (looksRiff) "wav" else if (looksAiff) "aiff" else "au",
          f.getEncoding.toString.toLowerCase + "_" + f.getSampleSizeInBits,
          bitRate)
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException => decodeAudioStub(payload, format)
    }
  }

  /** Deterministic stub for codecs the JDK lacks (mp3/ogg/…): metadata
    * derived from payload bytes; byte-identical input → identical output. */
  def decodeAudioStub(payload: Array[Byte], format: String): AudioMeta = {
    val h = graft.functions.Impl.sipHash64Bytes(payload)
    val rate = 8000 + (math.abs(h) % 5).toInt * 8000
    val ch = 1 + (math.abs(h >> 8) % 2).toInt
    val frames = payload.length.toLong.max(1L)
    AudioMeta(rate, ch, frames.toDouble / rate, frames, format, "stub", -1)
  }

  /** Decode audio metadata over a media DataFrame
    * (id: long, payload: binary, format: string). Partition-local 1:1 —
    * no shuffle, scales linearly with executors. */
  def decodeAudios(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"), col("format"))
      .as[MediaRow]
      .mapPartitions(_.map(m => DecodedAudioRow(m.id, decodeAudio(m.payload, m.format))))
      .toDF()
  }

  /**
   * Deterministic REAL-WAV media table: each id becomes a PCM_SIGNED 16-bit
   * WAV (encoded with `javax.sound.sampled.AudioSystem.write`) whose shape
   * derives from the id — sample_rate = 8000, channels = 1 + id % 2,
   * frames = 400 + (id % 32) * 25, samples are a deterministic sawtooth.
   * Lets decode gates assert real codec output against an arithmetic
   * oracle, same trick as [[syntheticPngMedia]].
   */
  def syntheticWavMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val channels = (1 + id % 2).toInt
        val frames = (400 + (id % 32) * 25).toInt
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels, true, false)
        val pcm = new Array[Byte](frames * channels * 2)
        var i = 0
        while (i < frames * channels) {
          val v = (((id * 131 + i * 17) % 4096) - 2048).toShort
          pcm(2 * i) = (v & 0xFF).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRow(id, bos.toByteArray, "wav")
      }
    }.toDF()
  }

  /** Build a synthetic media table from any table (payload = utf-8 of a
    * string col) — test/demo helper so the plumbing runs without real blobs. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("synthetic").as("format"))

  /**
   * Deterministic REAL-PNG media table: each id becomes a solid-color PNG
   * (encoded with `javax.imageio`) whose dimensions and color derive from
   * the id — width = 8 + id % 16, height = 8 + id % 8,
   * RGB = (id*37 % 256, id*59 % 256, id*83 % 256). Lets decode gates assert
   * real codec output against an arithmetic oracle. Partition-local 1:1.
   */
  /**
   * 64-bit difference hash (dHash) — the standard perceptual fingerprint
   * for image near-dup detection: decode, grayscale
   * (integer (299r+587g+114b)/1000 per pixel), box-average down to a 9×8
   * grid with floor mapping/division, then bit (row*8+col) = 1 iff
   * cell[row][col+1] > cell[row][col] (horizontal gradient signs).
   * Robust to uniform brightness shifts and resizing; every step is
   * exact integer arithmetic, so the hash is deterministic across JVMs
   * (and, for synthetic fixed-grid fixtures, reproducible in SQL).
   */
  def dHash64(payload: Array[Byte], format: String): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"undecodable $format payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val (gw, gh) = (9, 8)
    val sum = Array.ofDim[Long](gh, gw)
    val cnt = Array.ofDim[Long](gh, gw)
    var y = 0
    while (y < h) {
      val cy = y * gh / h
      var x = 0
      while (x < w) {
        val cx = x * gw / w
        val rgb = img.getRGB(x, y)
        val g = (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
          114L * (rgb & 0xFF)) / 1000L
        sum(cy)(cx) += g
        cnt(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < gw - 1) {
        val a = sum(r)(c) / math.max(cnt(r)(c), 1L)
        val b = sum(r)(c + 1) / math.max(cnt(r)(c + 1), 1L)
        if (b > a) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** (id, dhash) for every media row — partition-local, 1:1. */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"), col("format"))
      .as[MediaRow]
      .mapPartitions(it => it.map(m => (m.id, dHash64(m.payload, m.format))))
      .toDF("id", "dhash")
  }

  /**
   * Perceptual near-dup image pairs: dHash both sides, pigeonhole the 64
   * bits into four 16-bit bands (two hashes within hamming distance ≤ 3
   * MUST agree on at least one whole band), bucket-join on (band, key),
   * verify with the exact popcount. Returns (id_a, id_b, hamming) with
   * id_a < id_b. Same banded-candidates-then-exact-verify shape as the
   * text [[graft.ops.Dedup.simhashDedupEdges]] — candidates are
   * O(bucket pairs), never corpus², and only (id, 8-byte hash) rows ever
   * shuffle, never payloads.
   */
  def imageNearDups(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4 bands of 16 bits guarantee recall only up to hamming 3")
    val hashed = imageDHash(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = hashed.select(col("id"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("__b"),
          shiftrightunsigned(col("dhash"), 16 * b)
            .bitwiseAND(lit(0xFFFFL)).as("__key"))): _*)).as("__band"))
      .select(col("id"), col("dhash"),
        col("__band.__b").as("__b"), col("__band.__key").as("__key"))
    val l = banded.alias("a")
    val r = banded.alias("b")
    l.join(r, col("a.__b") === col("b.__b") &&
        col("a.__key") === col("b.__key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.GraftFunctions.bit_hamming_distance(
          col("a.dhash"), col("b.dhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Deterministic 9×8 pattern PNGs (gray g(id,x,y) = (7·id + 3x² + 5y +
   * xy) mod 256 on all three channels): the grid matches the dHash
   * downsample exactly and PNG is lossless, so the decoded hash is pure
   * integer arithmetic on (id, x, y) — reproducible by a SQL oracle with
   * no image codec.
   */
  def syntheticPatternPngMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val img = new java.awt.image.BufferedImage(9, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            val g = ((7L * id + 3L * x * x + 5L * y + x.toLong * y) % 256L).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, bos.toByteArray, "png")
      }
    }.toDF()
  }

  /**
   * Header-only metadata pass over a media frame (id, payload, …): one
   * codegen'd expression parses just the container header
   * ([[org.apache.spark.sql.graft.ImageHeaderDims]] — PNG IHDR / JPEG
   * SOF scan / GIF screen / BMP info, ~24 bytes touched per blob) — the
   * metadata-backfill shape at 100 TB, where [[decodeImages]]' full
   * pixel decode would decompress every byte just to learn width×height.
   * Unrecognized blobs surface with null dims; route them to the full
   * decode.
   */
  /**
   * Container-level video metadata with NO codec: brand, duration, and
   * the first video track's pixel dims straight from the MP4 box
   * structure (the reference shells out to ffprobe for the same fields,
   * src/datachain/lib/file.py:901-1003; this environment has no ffmpeg,
   * and the box walk is the honest codec-free subset). Pure codegen'd
   * projection — the 100 TB metadata-backfill shape.
   */
  def videoHeaderMeta(media: DataFrame): DataFrame =
    media.select(col("id"),
        // one struct per container family, same shape — coalesce
        // dispatches on the magic bytes (ftyp vs EBML) per row
        coalesce(
          graft.functions.GraftFunctions.mp4_header_meta(col("payload")),
          graft.functions.GraftFunctions.ebml_header_meta(col("payload")))
          .as("__m"))
      .select(col("id"), col("__m.brand").as("brand"),
        col("__m.duration_sec").as("duration_sec"),
        col("__m.width").as("width"), col("__m.height").as("height"))

  /** Deterministic minimal WebM fixtures (EBML header with DocType,
    * Segment[Info[TimestampScale, Duration] Tracks[TrackEntry[Video[
    * PixelWidth PixelHeight]]]]) — id-derived fields, built element by
    * element. */
  def syntheticWebmMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val durMs = (2000L + (id % 89) * 250L).toDouble
        val w = (128 + id % 64).toInt
        val h = (72 + id % 36).toInt
        (id, buildWebm("webm", durMs, w, h), "webm")
      }
    }.toDF("id", "payload", "format")
  }

  private[graft] def buildWebm(docType: String, durationUnits: Double,
                               w: Int, h: Int): Array[Byte] = {
    def be(v: Long, n: Int): Array[Byte] =
      (n - 1 to 0 by -1).map(k => ((v >> (8 * k)) & 0xFF).toByte).toArray
    def el(id: Long, idLen: Int, body: Array[Byte]): Array[Byte] = {
      require(body.length < 127, "1-byte size form only")
      be(id, idLen) ++ Array((0x80 | body.length).toByte) ++ body
    }
    def uintEl(id: Long, idLen: Int, v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >> (8 * n)) != 0) n += 1
      el(id, idLen, be(v, n))
    }
    val ebml = el(0x1A45DFA3L, 4,
      el(0x4282L, 2, docType.getBytes("ISO-8859-1")))
    val info = el(0x1549A966L, 4,
      uintEl(0x2AD7B1L, 3, 1000000L) ++
        el(0x4489L, 2, be(java.lang.Double.doubleToLongBits(durationUnits), 8)))
    val video = el(0xE0L, 1,
      uintEl(0xB0L, 1, w.toLong) ++ uintEl(0xBAL, 1, h.toLong))
    val tracks = el(0x1654AE6BL, 4, el(0xAEL, 1, video))
    ebml ++ el(0x18538067L, 4, info ++ tracks)
  }

  /** Spec-correct minimal MP4s (ftyp + moov[mvhd + trak[tkhd]]), one per
    * row with id-derived duration/dims — deterministic fixtures for
    * [[videoHeaderMeta]], built box-by-box (no encoder exists here). */
  def syntheticMp4Media(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val durMs = 1000L + (id % 97) * 500L
        val w = (64 + id % 32).toInt
        val h = (48 + id % 16).toInt
        (id, buildMp4("isom", 1000, durMs, w, h), "mp4")
      }
    }.toDF("id", "payload", "format")
  }

  /** Minimal ISO-BMFF: ftyp(brand) + moov[mvhd v0(timescale,duration) +
    * trak[tkhd v0(width,height)]]. Box sizes follow the v0 spec layouts
    * (mvhd 108, tkhd 92). */
  private[graft] def buildMp4(brand: String, timescale: Long, duration: Long,
                              w: Int, h: Int): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
    val ftyp = box("ftyp",
      brand.getBytes("ISO-8859-1") ++ be32(0) ++ "mp41".getBytes("ISO-8859-1"))
    // mvhd v0: ver/flags, creation, modification, timescale, duration,
    // rate, volume+reserved, reserved(8), matrix(36), predefined(24),
    // next_track_id — 100-byte body
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        be32(0x00010000L) ++ be32(0x01000000L) ++ Array.fill[Byte](8)(0) ++
        (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
          .flatMap(be32).toArray) ++ Array.fill[Byte](24)(0) ++ be32(2))
    // tkhd v0: ver/flags(enabled), creation, modification, track_id,
    // reserved, duration, reserved(8), layer/alt(4), volume+rsvd(4),
    // matrix(36), width, height — 84-byte body
    val tkhd = box("tkhd",
      be32(7) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(duration) ++
        Array.fill[Byte](8)(0) ++ be32(0) ++ be32(0) ++
        (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
          .flatMap(be32).toArray) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    bo.write(ftyp); bo.write(moov)
    bo.toByteArray
  }

  /** MP3 stream metadata without a decoder — first-frame header fields
    * plus the CBR duration estimate; see
    * [[org.apache.spark.sql.graft.Mp3FrameMeta]]. */
  def audioFrameMeta(media: DataFrame): DataFrame =
    media.select(col("id"),
        graft.functions.GraftFunctions.mp3_frame_meta(col("payload"))
          .as("__m"))
      .select(col("id"), col("__m.version").as("version"),
        col("__m.layer").as("layer"),
        col("__m.bitrate_kbps").as("bitrate_kbps"),
        col("__m.sample_rate").as("sample_rate"),
        col("__m.channels").as("channels"),
        col("__m.est_duration_sec").as("est_duration_sec"))

  /** Deterministic MPEG1-Layer-III fixtures: a synchsafe ID3v2 tag, one
    * valid frame header with id-derived bitrate/samplerate/channel-mode
    * indices, and filler to an id-derived length. */
  def syntheticMp3Media(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val tagSz = (30 + id % 10).toInt // < 128: synchsafe-trivial
        val brIdx = (1 + id % 14).toInt
        val srIdx = (id % 3).toInt
        val mode = (id % 4).toInt
        val total = (200 + (id % 50) * 10).toInt
        val b = new Array[Byte](total)
        b(0) = 'I'; b(1) = 'D'; b(2) = '3'; b(3) = 4; b(4) = 0; b(5) = 0
        b(6) = 0; b(7) = 0; b(8) = 0; b(9) = tagSz.toByte
        val f = 10 + tagSz
        b(f) = 0xFF.toByte
        b(f + 1) = 0xFB.toByte // MPEG1 (11), Layer III (01), no CRC (1)
        b(f + 2) = ((brIdx << 4) | (srIdx << 2)).toByte
        b(f + 3) = (mode << 6).toByte
        (id, b, "mp3")
      }
    }.toDF("id", "payload", "format")
  }

  def imageHeaderMeta(media: DataFrame): DataFrame =
    media.select(col("id"),
        graft.functions.GraftFunctions.image_header_dims(col("payload"))
          .as("__h"))
      .select(col("id"), col("__h.format").as("format"),
        col("__h.width").as("width"), col("__h.height").as("height"))

  def syntheticPngMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + id % 8).toInt
        val rgb = ((id * 37 % 256).toInt << 16) |
          ((id * 59 % 256).toInt << 8) | (id * 83 % 256).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, bos.toByteArray, "png")
      }
    }.toDF()
  }
}
