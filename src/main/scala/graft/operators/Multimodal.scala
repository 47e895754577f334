package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing for training-data pipelines: media as an
  * opaque `binary` column + typed metadata struct, with decode /
  * feature-extract / frame-sample stages.
  *
  * ALL THREE decode kinds are REAL, through JDK-shipped codecs only:
  * IMAGE via `javax.imageio` ([[mediaTableReal]] PNG-encodes genuine
  * rasters, [[decodeRealPartitioned]] parses them back), AUDIO via
  * `javax.sound.sampled` (genuine 8 kHz 16-bit mono RIFF/PCM WAV bytes;
  * the decoder recovers the duration from the parsed header, not from
  * any formula), and VIDEO via the `javax.imageio` GIF plugin's
  * multi-frame support (genuine animated GIFs; the decoder scans the
  * actual image sequence for the frame count and sums the parsed
  * per-frame delays for the duration — the JDK has no mp4/h264 codec,
  * so animated GIF is the one container whose bytes can be real here).
  * Everything Spark-side is real and tested: the schema shape, the
  * binary column flow, byte slicing, per-partition batch processing
  * (the Scala analog of `mapInPandas`: one decoder instance per
  * partition, rows streamed through it), and partitioning preservation.
  *
  * Scale notes: media blobs ride the same columnar files as their
  * metadata; the metadata struct lets filters prune (`kind = 'image' AND
  * meta.width > 512`) BEFORE any blob bytes are read (Parquet reads the
  * projected columns only). The mapPartitions decode path holds one
  * codec/model per partition — the standard shape for batched GPU/library
  * inference — and never collects to the driver.
  */
object Multimodal {
  // JDK ImageIO defaults to spooling EVERY coder stream through a temp
  // FILE (FileCacheImage{Input,Output}Stream — one /tmp file create +
  // write + delete per ImageIO.read/write call). For in-memory byte
  // payloads that is pure overhead and, worse, a per-JVM contention
  // point: the r13 parallelism curve measured decode saturating at
  // ~2.4× speedup by k=4 partitions and DEGRADING beyond, the disk-
  // cache signature (MEDIALAB_r13_sf1.json, pre-fix arms). Payloads
  // here are KB-scale, so the memory-cached streams are strictly
  // better. JVM-global static; runs once per executor at classload.
  javax.imageio.ImageIO.setUseCache(false)

  val FrameCount = 4

  /** Synthesize a media table from `documents` (deterministic: content =
    * UTF-8 bytes of the text, kind round-robins by id). In production this
    * is the ingest table of real blobs; the schema is the contract. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"))

  /** FAKE decode (no codecs in container): derives metadata
    * deterministically from the content hash — the real implementation
    * parses the container format here. Pure column expressions: runs in
    * whole-stage codegen, no UDF. */
  def decodeMeta(media: DataFrame): DataFrame =
    media
      .withColumn("__h", md5(col("content")))
      .withColumn("meta", struct(
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("int") % 3840 + 128).as("width"),
        (conv(substring(col("__h"), 5, 4), 16, 10).cast("int") % 2160 + 96).as("height"),
        (length(col("content")) * 8).cast("long").as("bit_size"),
        (conv(substring(col("__h"), 9, 4), 16, 10).cast("int") % 60000).as("duration_ms")))
      .drop("__h")

  /** Frame sampling: FrameCount evenly-spaced byte slices of the blob —
    * the real implementation seeks to keyframes; the slicing plumbing
    * (offset arithmetic on binary columns, array-of-binary output) is the
    * part that must survive at scale, and is real. */
  def frameSample(media: DataFrame, frames: Int = FrameCount): DataFrame = {
    val n = length(col("content"))
    // integral division — Column `/` is double division, whose fractional
    // frame length would truncate per-slice into NON-contiguous offsets
    // (skipped bytes) whenever length % frames != 0
    val frameLen = greatest(floor(n / frames).cast("int"), lit(1))
    val slices = sequence(lit(0), lit(frames - 1)).cast("array<int>")
    media.withColumn("frames",
      transform(slices, i => expr("content").substr(i * frameLen + 1, frameLen)))
  }

  /** Resize stage: target-dimension metadata + a proportionally
    * subsampled payload. The KERNEL IS A FAKE (real impl: scaler/codec on
    * the bytes); the plumbing — recomputed meta struct riding with a
    * transformed binary column, pure column exprs, no UDF — is the real
    * contract. Aspect ratio preserved: height scales by the same factor
    * as width; payload shrinks by the area ratio (bounded below by 1
    * byte). */
  def resize(decoded: DataFrame, targetWidth: Int): DataFrame = {
    val scale = lit(targetWidth.toDouble) / col("meta.width")
    val newH = greatest(floor(col("meta.height") * scale).cast("int"), lit(1))
    decoded
      // materialize the new length BEFORE touching content — the meta
      // struct below must not re-derive it from the truncated bytes.
      // Clamped to the REAL length: upscaling (width < target) cannot
      // grow the payload, and bit_size must describe the bytes actually
      // present (18/500 sf0.001 rows decode wider-than-content otherwise)
      .withColumn("__len", greatest(least(
        floor(length(col("content")) * scale * scale).cast("int"),
        length(col("content"))), lit(1)))
      .withColumn("content", expr("content").substr(lit(1), col("__len")))
      .withColumn("meta", struct(
        lit(targetWidth).as("width"),
        newH.as("height"),
        (col("__len") * 8).cast("long").as("bit_size"),
        col("meta.duration_ms").as("duration_ms")))
      .drop("__len")
  }

  /** Per-frame features: length + crc32 fingerprint per slice (stand-in
    * for an embedding/classifier output), as an array of structs. */
  def frameFeatures(withFrames: DataFrame): DataFrame =
    withFrames.withColumn("frame_features",
      transform(col("frames"), f => struct(
        length(f).as("n_bytes"), crc32(f).as("fingerprint"))))

  // ---------------------------------------------------------------
  // The mapPartitions batch path: Scala analog of mapInPandas. One
  // "decoder" per partition, rows streamed through in batches.
  // ---------------------------------------------------------------
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  case class DecodedRow(media_id: Long, kind: String, width: Int, height: Int,
                        bit_size: Long, duration_ms: Int, n_frames: Int)

  /** FAKE per-partition decoder: instantiated ONCE per partition (the
    * expensive-codec-init pattern), then streamed. Must agree with
    * [[decodeMeta]] on the shared fields — pinned by MultimodalSpec.
    * n_frames is 1 (a single still): the hash formula has no frame
    * notion; the REAL decoders below parse actual frame counts. */
  def decodePartitioned(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // expensive init happens here, once per partition, off the driver
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val h = digest.digest(r.content).map("%02x".format(_)).mkString
        DecodedRow(r.media_id, r.kind,
          (java.lang.Long.parseLong(h.substring(0, 4), 16) % 3840 + 128).toInt,
          (java.lang.Long.parseLong(h.substring(4, 8), 16) % 2160 + 96).toInt,
          r.content.length.toLong * 8,
          (java.lang.Long.parseLong(h.substring(8, 12), 16) % 60000).toInt, 1)
      }
    }
  }

  // ---------------------------------------------------------------
  // REAL decode, all three kinds (javax.imageio + javax.sound.sampled —
  // in the JDK, zero extra deps): PNG for stills, RIFF/PCM WAV for
  // audio, multi-frame animated GIF for video. The oracle can hash-gate
  // each round trip because the synthetic payload SHAPE (dims, duration,
  // frame count, per-frame delay) is a pure function of media_id — the
  // decoder must recover exactly those numbers from the actual bytes,
  // which DuckDB recomputes from the formulas.
  // ---------------------------------------------------------------

  /** Deterministic synthetic image dims: a pure function of media_id so
    * the DuckDB oracle can recompute what the real decoder must read
    * back out of the PNG. Small (16..63 px) — the payload is real but
    * cheap. */
  def imageWidth(id: Long): Int = (id % 48 + 16).toInt
  def imageHeight(id: Long): Int = (id * 7 % 48 + 16).toInt

  /** Deterministic synthetic audio duration (50..499 ms): a pure function
    * of media_id so the DuckDB oracle can recompute what the real WAV
    * parser must read back out of the RIFF header. At 8 kHz the frame
    * count is duration_ms × 8 exactly, so the decoded duration is
    * integer-exact. */
  def audioDurationMs(id: Long): Int = (id * 13 % 450 + 50).toInt
  val AudioRate = 8000

  /** Deterministic synthetic video shape — pure functions of media_id so
    * the DuckDB oracle can recompute what the GIF container parser must
    * read back out of real bytes: frame count 2..13, small dims, and a
    * per-frame delay in the GIF container's native 10 ms units (1..5),
    * so total duration = frames × delay × 10 ms is integer-exact. */
  def videoFrames(id: Long): Int = (id * 11 % 12 + 2).toInt
  def videoWidth(id: Long): Int = (id * 3 % 40 + 12).toInt
  def videoHeight(id: Long): Int = (id * 7 % 40 + 12).toInt
  def videoDelay10(id: Long): Int = (id % 5 + 1).toInt
  def videoDurationMs(id: Long): Int = videoFrames(id) * videoDelay10(id) * 10

  /** A genuine multi-frame ANIMATED GIF: the JDK ships no mp4/h264 codec,
    * but `javax.imageio`'s GIF plugin both writes and reads multi-frame
    * sequences — which makes frame-count / dimension / per-frame-delay
    * extraction testable against real container bytes, the same way
    * [[wavBytes]] made audio real. Frames are palette-indexed rasters
    * (GIF is a palette format) with deterministic id-keyed pixels; each
    * frame carries a GraphicControlExtension with the formula delay.
    * `writer` is partition-scoped (expensive-init pattern, like the
    * MessageDigest in [[decodePartitioned]]). */
  def gifBytes(id: Long, writer: javax.imageio.ImageWriter): Array[Byte] = {
    val w = videoWidth(id); val h = videoHeight(id); val nf = videoFrames(id)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nf) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            (((id * 2654435761L) ^ (x * 31L + y * 17L + f * 101L)) & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = {
        val kids = root.getElementsByTagName("GraphicControlExtension")
        if (kids.getLength > 0)
          kids.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        else {
          val n = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
          root.appendChild(n); n
        }
      }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", videoDelay10(id).toString)
      gce.setAttribute("transparentColorIndex", "0")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    buf.toByteArray
  }

  /** Parse real GIF bytes back: (n_frames, width, height, duration_ms).
    * Frame count comes from `getNumImages(allowSearch = true)` — an
    * actual scan of the image sequence — and the duration from summing
    * each frame's parsed GraphicControlExtension delay. Nothing here
    * consults the synthesis formulas. */
  def gifDecode(bytes: Array[Byte],
                reader: javax.imageio.ImageReader): (Int, Int, Int, Int) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    reader.setInput(iis, false, false)
    val n = reader.getNumImages(true)
    val w = reader.getWidth(0); val h = reader.getHeight(0)
    var durMs = 0
    var i = 0
    while (i < n) {
      val meta = reader.getImageMetadata(i)
      val root = meta.getAsTree(meta.getNativeMetadataFormatName)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val kids = root.getElementsByTagName("GraphicControlExtension")
      if (kids.getLength > 0)
        durMs += kids.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          .getAttribute("delayTime").toInt * 10
      i += 1
    }
    reader.setInput(null)
    iis.close()
    (n, w, h, durMs)
  }

  /** A genuine RIFF/PCM WAV file: 44-byte canonical header + 16-bit LE
    * mono samples (deterministic id-keyed values). `javax.sound.sampled`
    * parses this with zero external codecs — the audio analog of the PNG
    * path. */
  def wavBytes(id: Long): Array[Byte] = {
    val frames = audioDurationMs(id) * (AudioRate / 1000)
    val dataLen = frames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(AudioRate)
      .putInt(AudioRate * 2)             // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < frames) {
      bb.putShort((((id * 2654435761L) ^ (i * 31L)) & 0xFFFF).toShort)
      i += 1
    }
    bb.array()
  }

  /** Media table with REAL payloads for ALL THREE kinds: a PNG-encoded
    * RGB raster of the formula dims (deterministic pixels from the id,
    * written with `javax.imageio`), a genuine RIFF/PCM WAV of the
    * formula duration ([[wavBytes]]), and a genuine multi-frame animated
    * GIF of the formula frame count / dims / delays ([[gifBytes]]).
    * One encoder per partition, rows streamed — the same batch shape as
    * the decoder. */
  def mediaTableReal(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    // Rebalance to session parallelism BEFORE the codec work: the media
    // table inherits the documents scan's file-split count (4 part files
    // at the self-gate sfs), and per-row encode cost is ~10^3× the row's
    // scan cost, so a narrow input would serialize the expensive stage on
    // a handful of cores (measured at sf10: 4 active threads of 32, the
    // whole dump gated on GIF encode). Same pre-explosion discipline as
    // Dedup.shingles; at real scale the scan is already multi-split and
    // the rebalance is a cheap shuffle of ids+text.
    Tables.balanced(mediaTable(s, dir)).as[MediaRow].mapPartitions { rows =>
      val buf = new java.io.ByteArrayOutputStream()
      lazy val gifWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      rows.map { r =>
        if (r.kind == "image") {
          val w = imageWidth(r.media_id); val h = imageHeight(r.media_id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // deterministic pixel: id-keyed hash of the coordinate
              img.setRGB(x, y,
                (((r.media_id * 2654435761L) ^ (x * 31L + y * 17L)) & 0xFFFFFF).toInt)
              x += 1
            }
            y += 1
          }
          buf.reset()
          javax.imageio.ImageIO.write(img, "png", buf)
          MediaRow(r.media_id, r.kind, buf.toByteArray)
        } else if (r.kind == "audio") {
          MediaRow(r.media_id, r.kind, wavBytes(r.media_id))
        } else {
          MediaRow(r.media_id, r.kind, gifBytes(r.media_id, gifWriter))
        }
      }
    }
  }

  /** REAL decode for ALL THREE kinds — `ImageIO` parses the PNG bytes
    * (width/height come from the decoded raster, not from any formula);
    * `AudioSystem` parses the WAV bytes (duration_ms = frame count /
    * sample rate from the parsed RIFF header; width/height 0 for sound,
    * like duration 0 for a still image); the GIF plugin parses the
    * animated-GIF bytes ([[gifDecode]]: n_frames from an actual
    * sequence scan, duration from the summed per-frame delays). The GIF
    * reader is partition-scoped (expensive-init pattern); the ImageIO
    * readers for stills are instantiated per row by their codec
    * registry (measured uncontended); the AUDIO provider set is
    * resolved once per partition — see [[audioFileReaders]]. */
  /** The audio-decode provider set, resolved ONCE (per partition, like
    * the GIF reader). `AudioSystem.getAudioInputStream` re-runs its
    * provider lookup through `JDK13Services.getProviders` — a GLOBALLY
    * SYNCHRONIZED method — on EVERY call: at 32 decode threads that
    * monitor serialized the whole stage (ProbeCodecLock: 4,749/4,871
    * blocked samples on it; MEDIALAB pre-fix: 91.7 s task run vs 5.3 s
    * CPU at k=32 — 94% of task time spent blocked). ServiceLoader over
    * the public `AudioFileReader` SPI finds the same platform readers
    * (WAV/AIFF/AU) without the global lock. */
  def audioFileReaders(): Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[
      javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) buf += it.next()
    require(buf.nonEmpty, "no AudioFileReader providers on this JVM")
    buf.toSeq
  }

  /** First provider that accepts the payload — the same contract as
    * `AudioSystem.getAudioInputStream(stream)`, minus its per-call
    * globally-synchronized provider scan. Stateful on purpose: the
    * platform registers a MIDI-backed reader whose REJECTION path
    * itself consults `MidiSystem.getProviders` (the same global
    * monitor — ProbeCodecLock caught it as the residual 4,127-sample
    * block after the first fix), so a homogeneous payload stream must
    * not re-walk the provider list per row. The last-successful reader
    * is tried first; a mixed-format stream just falls back to the scan
    * for the rows that need it. One instance per partition. */
  final class AudioDecoder(
      readers: Seq[javax.sound.sampled.spi.AudioFileReader]) {
    def this() = this(audioFileReaders())
    private var hot: javax.sound.sampled.spi.AudioFileReader = null
    def decode(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      if (hot != null) {
        try return hot.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      }
      val it = readers.iterator
      while (it.hasNext) {
        val r = it.next()
        if (r ne hot) {
          try {
            val in = r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
            hot = r
            return in
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => ()
          }
        }
      }
      throw new IllegalArgumentException(
        s"undecodable audio payload (${bytes.length} bytes)")
    }
  }

  def decodeRealPartitioned(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      lazy val gifReader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      lazy val audio = new AudioDecoder()
      rows.map { r =>
        if (r.kind == "image") {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.content))
          require(img != null, s"undecodable image payload for media ${r.media_id}")
          DecodedRow(r.media_id, r.kind, img.getWidth, img.getHeight,
            r.content.length.toLong * 8, 0, 1)
        } else if (r.kind == "audio") {
          val in = audio.decode(r.content)
          try {
            val fmt = in.getFormat
            require(fmt.getSampleRate > 0 && in.getFrameLength >= 0,
              s"undecodable audio payload for media ${r.media_id}")
            val durMs = (in.getFrameLength * 1000L / fmt.getSampleRate.toLong).toInt
            DecodedRow(r.media_id, r.kind, 0, 0,
              r.content.length.toLong * 8, durMs, 0)
          } finally in.close()
        } else {
          val (nf, w, h, durMs) = gifDecode(r.content, gifReader)
          require(nf > 0, s"undecodable video payload for media ${r.media_id}")
          DecodedRow(r.media_id, r.kind, w, h,
            r.content.length.toLong * 8, durMs, nf)
        }
      }
    }
  }

  /** Oracle-checked REAL-decode query, all three kinds real: encode →
    * PNG bytes → ImageIO decode for images (the decoded raster dims
    * must reproduce the formula the oracle computes), encode → WAV
    * bytes → AudioSystem decode for audio (the parsed RIFF duration
    * must reproduce the duration formula), encode → animated-GIF bytes
    * → GIF-plugin decode for video (the scanned frame count, frame
    * dims, and summed per-frame delays must reproduce the video
    * formulas). */
  def qMediaDecode(s: SparkSession, dir: String): DataFrame =
    decodeRealPartitioned(mediaTableReal(s, dir))
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("duration_ms"), col("n_frames"))
      .orderBy("media_id")

  /** The production steady-state twin of [[qMediaDecode]]: the encoded
    * media table is persisted ONCE per source fingerprint
    * ([[graft.sources.Artifacts]] — the same train-once/read-thereafter
    * lifecycle as the k-means codebook and the bigram LM) and every
    * later query DECODES from the artifact. Splits the declared
    * query's cost exactly where a warehouse splits it: encode is paid
    * at ingest, decode at read — at sf10 that is ~71 s of by-contract
    * encode amortized away, leaving the 1.2 s/32-core decode the
    * MEDIALAB curve prices. Same oracle as the fused query: persistence
    * may change cost, never an answer. */
  def qMediaDecodePersisted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = graft.sources.Artifacts.cached(s, "media_encoded",
      s"$dir/documents.parquet") { mediaTableReal(s, dir).toDF() }
    decodeRealPartitioned(enc.as[MediaRow])
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("duration_ms"), col("n_frames"))
      .orderBy("media_id")
  }

  def qMediaDecodeSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind
      |  FROM documents)
      |SELECT media_id, kind,
      |       CASE WHEN kind = 'image'
      |            THEN CAST(media_id % 48 + 16 AS INT)
      |            WHEN kind = 'audio' THEN 0
      |            ELSE CAST(media_id * 3 % 40 + 12 AS INT)
      |       END AS width,
      |       CASE WHEN kind = 'image'
      |            THEN CAST(media_id * 7 % 48 + 16 AS INT)
      |            WHEN kind = 'audio' THEN 0
      |            ELSE CAST(media_id * 7 % 40 + 12 AS INT)
      |       END AS height,
      |       CASE WHEN kind = 'image'
      |            THEN 0
      |            WHEN kind = 'audio'
      |            THEN CAST(media_id * 13 % 450 + 50 AS INT)
      |            ELSE CAST((media_id * 11 % 12 + 2) * (media_id % 5 + 1) * 10 AS INT)
      |       END AS duration_ms,
      |       CASE WHEN kind = 'image' THEN 1
      |            WHEN kind = 'audio' THEN 0
      |            ELSE CAST(media_id * 11 % 12 + 2 AS INT)
      |       END AS n_frames
      |FROM m ORDER BY media_id""".stripMargin

  /** Oracle-checked query: media identity + size + content hash + decoded
    * dims (DuckDB md5 is VARCHAR-only, so the oracle hashes the text while
    * Spark hashes its UTF-8 bytes — the same bytes). */
  def qMediaMeta(s: SparkSession, dir: String): DataFrame =
    decodeMeta(mediaTable(s, dir)).select(
      col("media_id"), col("kind"),
      length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("content_md5"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.duration_ms").as("duration_ms"))
      .orderBy("media_id")

  /** Oracle-checked frame sampling: the byte-slicing stage of
    * [[frameSample]], one row per (media, frame) with size + content
    * hash. The corpus is pure ASCII (verified), so the DuckDB twin's
    * character slicing is byte-identical to Spark's binary slicing —
    * which is exactly what makes the plumbing testable end-to-end even
    * though the decode kernel itself is stubbed. */
  def qFrames(s: SparkSession, dir: String): DataFrame =
    frameSample(mediaTable(s, dir))
      .select(col("media_id"), col("kind"), posexplode(col("frames")))
      .toDF("media_id", "kind", "frame_no", "frame")
      .select(col("media_id"), col("kind"), col("frame_no"),
        length(col("frame")).cast("long").as("n_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("media_id", "frame_no")

  def qFramesSql: String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       |         text,
       |         GREATEST(length(text) // $FrameCount, 1) AS fl
       |  FROM documents),
       |f AS (
       |  SELECT media_id, kind, CAST(i AS INT) AS frame_no,
       |         substr(text, CAST(i * fl + 1 AS INT), CAST(fl AS INT)) AS fr
       |  FROM m, range($FrameCount) t(i))
       |SELECT media_id, kind, frame_no,
       |       CAST(length(fr) AS BIGINT) AS n_bytes, md5(fr) AS frame_md5
       |FROM f ORDER BY media_id, frame_no""".stripMargin

  def qMediaMetaSql: String =
    """SELECT doc_id AS media_id,
      |       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       md5(text) AS content_md5,
      |       CAST(CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 3840 + 128 AS INT) AS width,
      |       CAST(CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 2160 + 96 AS INT) AS height,
      |       CAST(CAST('0x' || substr(md5(text), 9, 4) AS BIGINT) % 60000 AS INT) AS duration_ms
      |FROM documents ORDER BY media_id""".stripMargin
}
