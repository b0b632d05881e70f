package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload + typed metadata.
  * At 100 TB this is the universal shape for image/audio/video corpora:
  * bytes stay opaque to the engine, metadata is columnar and prunable. */
final case class MmRecord(
    doc_id: Long,
    payload: Array[Byte],
    mime: String,
    width: Int,
    height: Int)

/** Extracted features for one record (the "decoded" output). */
final case class MmFeature(
    doc_id: Long,
    mime: String,
    n_bytes: Int,
    mean_byte: Double,
    byte_hist: Array[Long])

/** Multimodal-column operators: treat image/audio/video as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs
  * as a batched partition-local transform.
  *
  * The IMAGE and AUDIO verbs run REAL codecs (round 10): `javax.imageio`
  * and `javax.sound.sampled` both ship with the JDK, so
  * q_mm_decode_real / q_mm_resize_real encode deterministic PNGs and
  * q_mm_audio_decode_real / q_mm_audio_resample_real encode
  * deterministic PCM WAVs, decode them back through the actual codecs,
  * and hash-match the DECODED statistics against closed-form oracles
  * that never touch PNG/WAV — an unfaithful codec round-trip turns the
  * row red. Video codecs are still not in this container, so the
  * mime-agnostic byte verbs keep the clearly-marked deterministic STUB
  * ([[MultimodalQueries.stubDecode]]); everything Spark-side — schema,
  * encoders, partition batching, the binary column itself — is real
  * either way.
  */
object MultimodalQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  /** Deterministic pixel formula shared by the PNG generator and (in
    * closed form) the DuckDB oracle: channel c of pixel (x, y) of doc
    * id. Everything is non-negative, so `%` agrees across engines. */
  private[graft] def pix(docId: Long, x: Int, y: Int, c: Int): Int =
    ((docId * 31 + x * 7L + y * 13L + c * 101L) % 256).toInt

  /** Encode one deterministic RGB image as REAL PNG bytes (JDK ImageIO
    * — the actual codec, not a stub). Row-local; called per partition. */
  private[graft] def encodePng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pix(docId, x, y, 0) << 16) | (pix(docId, x, y, 1) << 8) | pix(docId, x, y, 2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode PNG bytes (real codec) → (width, height, per-channel pixel
    * sums). Integer sums are order-independent and exact. */
  private[graft] def decodeStats(payload: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < bi.getHeight) {
      var x = 0
      while (x < bi.getWidth) {
        val rgb = bi.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    (bi.getWidth, bi.getHeight, sr, sg, sb)
  }

  /** Deterministic gray value of pixel (x, y) in frame f of doc id —
    * shared by the GIF generator and (in closed form) the DuckDB
    * oracle. Non-negative everywhere, so `%` agrees across engines. */
  private[graft] def gifPix(docId: Long, f: Int, x: Int, y: Int): Int =
    ((docId * 31 + f * 17L + x * 7L + y * 13L) % 256).toInt

  /** Encode one deterministic multi-frame animated GIF (JDK ImageIO's
    * real GIF writer via the writeToSequence API — the actual
    * variable-length LZW encoder, not a stub). GIF is indexed color, so
    * frames are built on an explicit 256-gray IndexColorModel: the
    * writer stores that palette verbatim and the encode stays LOSSLESS
    * (a TYPE_INT_RGB source could trip a quantizer). Row-local. */
  private[graft] def encodeGif(docId: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val grays = Array.tabulate[Byte](256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    encodeGifFrom((0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, gifPix(docId, f, x, y)); x += 1 }
        y += 1
      }
      img
    })
  }

  /** Write a frame sequence as one animated GIF through the real writer
    * (writeToSequence). Indexed-color frames (as built above, or as the
    * GIF reader returns them) keep their palette verbatim — lossless. */
  private[graft] def encodeGifFrom(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(img =>
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null))
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode every stored frame of a multi-frame GIF as raw images (the
    * input form [[encodeGifFrom]] re-encodes for the sampling verb). */
  private[graft] def decodeGifImages(payload: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false, true)
      (0 until reader.getNumImages(true)).map(reader.read)
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Decode a multi-frame GIF through the real ImageReader: one
    * (frame_idx, width, height, sum, min, max) tuple of decoded gray
    * values per stored frame. `read(f)` returns the RAW stored frame
    * (no disposal compositing) — our frames are full-canvas with no
    * offsets, so raw == rendered. */
  private[graft] def decodeGifFrames(payload: Array[Byte]): Seq[(Int, Int, Int, Long, Int, Int)] = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true) // full-scan frame count
      (0 until n).map { f =>
        val bi = reader.read(f)
        var (sum, mn, mx) = (0L, 255, 0)
        var y = 0
        while (y < bi.getHeight) {
          var x = 0
          while (x < bi.getWidth) {
            val v = bi.getRGB(x, y) & 0xff // gray palette: B == gray
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        (f, bi.getWidth, bi.getHeight, sum, mn, mx)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Deterministic 16-bit PCM sample formula shared by the WAV generator
    * and (in closed form) the DuckDB oracle: sample i of doc id. The
    * modulus operand is always non-negative, so `%` agrees across
    * engines; the subtraction centers the wave on 0 and covers the full
    * signed-16 range. */
  private[graft] def samp(docId: Long, i: Int): Int =
    ((docId * 31 + i.toLong * 7919) % 65536).toInt - 32768

  /** Encode one deterministic mono 16-bit PCM clip as REAL WAV bytes
    * (`javax.sound.sampled` — the JDK's actual audio codec, not a
    * stub). Row-local; called per partition. */
  private[graft] def encodeWav(docId: Long, n: Int, rate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = samp(docId, i)
      pcm(2 * i) = (s & 0xff).toByte // little-endian 16-bit
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    encodePcmWav(pcm, rate)
  }

  /** Wrap raw little-endian mono 16-bit PCM bytes in a real WAV stream. */
  private[graft] def encodePcmWav(pcm: Array[Byte], rate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode WAV bytes (real codec) → (pcm bytes, sample rate). The
    * format assertions make a silently-transcoding decoder loud. */
  private[graft] def decodeWavPcm(wav: Array[Byte]): (Array[Byte], Float) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"decoder returned unexpected format: $fmt")
    (ais.readAllBytes(), fmt.getSampleRate)
  }

  /** Decode WAV bytes → (n_samples, sum, sum|s|, min, max) over the
    * decoded signed-16 samples. Integer stats are order-free and exact. */
  private[graft] def decodeWavStats(wav: Array[Byte]): (Long, Long, Long, Int, Int) = {
    val (pcm, _) = decodeWavPcm(wav)
    val n = pcm.length / 2
    var (sum, sabs) = (0L, 0L)
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var i = 0
    while (i < n) {
      val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      sum += s; sabs += math.abs(s)
      if (s < mn) mn = s
      if (s > mx) mx = s
      i += 1
    }
    (n.toLong, sum, sabs, mn, mx)
  }

  /** Documents re-shaped as multimodal records: payload = utf-8 bytes of
    * the text (a stand-in for image bytes), metadata derived
    * deterministically so the oracle can replicate it. */
  private def records(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("mime"),
      (lit(16) + col("doc_id") % 64).cast("int").as("width"),
      (lit(16) + col("doc_id") % 48).cast("int").as("height"))

  /** STUB decoder: a real implementation would call an image/audio codec
    * here (per partition, batched). The fake is deterministic: "decode"
    * = byte histogram (16 bins) + mean byte value. */
  def stubDecode(rec: MmRecord): MmFeature = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < rec.payload.length) {
      val b = rec.payload(i) & 0xff
      hist(b / 16) += 1
      sum += b
      i += 1
    }
    MmFeature(rec.doc_id, rec.mime, rec.payload.length,
      if (rec.payload.length == 0) 0.0 else sum.toDouble / rec.payload.length,
      hist)
  }

  val all: Seq[Q] = Seq(

    // --- metadata projection over the binary column (SQL-expressible:
    // proves the opaque-bytes + typed-metadata schema round-trips) ------
    Q("q_mm_metadata",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  sha256(text) AS payload_sha,
        |  ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
        |  CAST(16 + doc_id % 64 AS INT) AS width,
        |  CAST(16 + doc_id % 48 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      records(s, d).select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha"),
        col("mime"), col("width"), col("height"))
        .orderBy("doc_id")
    },

    // --- frame sampling: every 4th fixed-size frame of the payload -----
    Q("q_mm_frame_sample",
      """WITH x AS (SELECT doc_id, text,
        |             CAST(ceil(length(text) / 64.0) AS INT) AS n_frames
        |           FROM documents WHERE doc_id < 100),
        |f AS (SELECT doc_id, n_frames, text,
        |        unnest([i for i in range(0, n_frames) if i % 4 = 0]) AS frame_idx
        |      FROM x WHERE n_frames > 0)
        |SELECT doc_id, n_frames, frame_idx,
        |       md5(substring(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      // Frame-sample over the payload byte stream: chunk into 64-byte
      // frames, keep every 4th, fingerprint each kept frame. The sampled
      // frame set is computed row-locally (sequence+filter) and exploded
      // — a video pipeline's I-frame sampling has exactly this plan
      // shape, with the codec stub swapped for a real decoder. The
      // payload here is utf-8 text, so frames are string chunks (char ==
      // byte) and the oracle can replicate the hashes.
      t(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"),
          ceil(length(col("text")) / 64.0).cast("int").as("n_frames"))
        // guard: for an empty payload sequence(0, -1) yields the
        // DESCENDING array [0,-1] (a phantom frame), not an empty one
        .filter(col("n_frames") > 0)
        .select(col("doc_id"), col("n_frames"), col("text"),
          explode(expr("filter(sequence(0, n_frames - 1), i -> i % 4 = 0)")).as("fi"))
        .select(col("doc_id"), col("n_frames"),
          col("fi").cast("bigint").as("frame_idx"),
          md5(expr("substring(text, fi * 64 + 1, 64)")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    },

    // --- stub resize / downsample over the payload bytes ----------------
    Q("q_mm_resize",
      """WITH r AS (SELECT doc_id,
        |    CAST(16 + doc_id % 64 AS INT) AS width,
        |    CAST(16 + doc_id % 48 AS INT) AS height,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    array_to_string([text[i] for i in range(1, length(text) + 1, 4)], '') AS resized
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CAST(width // 2 AS INT) AS new_width, CAST(height // 2 AS INT) AS new_height,
        |  n_bytes, CAST(octet_length(encode(resized)) AS BIGINT) AS n_bytes_resized,
        |  md5(resized) AS resized_md5
        |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      // STUB resize — the brief's fourth multimodal verb (decode /
      // feature-extract / RESIZE / frame-sample): halve each dimension,
      // producing a payload with ~1/4 the bytes. A real implementation
      // is a codec call per record (the q_mm_features mapPartitions
      // slot); the stub keeps every 4th payload byte — deterministic,
      // byte-count-faithful to a 2×2 downsample, and oracle-replicable
      // (payloads are ascii text, char == byte). What's REAL and under
      // test is the Spark-side plumbing a resize stage needs: binary
      // in, binary out, metadata columns updated in the same row-local
      // pass, content integrity pinned by hash — at 100 TB this is a
      // map-only stage at scan speed with no shuffle at all.
      PipelineQueries.spreadT(s, d, "documents").select(
        col("doc_id"),
        (lit(16) + col("doc_id") % 64).cast("int").as("width"),
        (lit(16) + col("doc_id") % 48).cast("int").as("height"),
        length(encode(col("text"), "utf-8")).cast("bigint").as("n_bytes"),
        expr("""concat_ws('', transform(sequence(1, length(text), 4),
          |  i -> substring(text, i, 1)))""".stripMargin).as("resized"))
        .select(col("doc_id"), col("width"), col("height"),
          expr("width div 2").cast("int").as("new_width"),
          expr("height div 2").cast("int").as("new_height"),
          col("n_bytes"),
          length(encode(col("resized"), "utf-8")).cast("bigint").as("n_bytes_resized"),
          md5(col("resized")).as("resized_md5"))
        .orderBy("doc_id")
    },

    // --- REAL image decode: PNG bytes through the actual JDK codec ------
    Q("q_mm_decode_real",
      """WITH di AS (SELECT doc_id,
        |    CAST(16 + doc_id % 64 AS INT) AS width,
        |    CAST(16 + doc_id % 48 AS INT) AS height
        |  FROM documents WHERE doc_id < 200),
        |px AS (SELECT doc_id, width, height,
        |    (doc_id * 31 + x.i * 7 + y.i * 13) % 256 AS r,
        |    (doc_id * 31 + x.i * 7 + y.i * 13 + 101) % 256 AS g,
        |    (doc_id * 31 + x.i * 7 + y.i * 13 + 202) % 256 AS b
        |  FROM di, range(0, 80) x(i), range(0, 64) y(i)
        |  WHERE x.i < width AND y.i < height)
        |SELECT doc_id, width, height,
        |  CAST(width * height AS BIGINT) AS n_pixels,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(SUM(g) AS BIGINT) AS sum_g,
        |  CAST(SUM(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin) { (s, d) =>
      // The REAL decode path (round-9 verdict item: swap a real codec in
      // when available — javax.imageio ships with the JDK): per record,
      // deterministic pixels → ImageIO PNG ENCODE → real binary payload
      // → ImageIO DECODE → per-channel integer pixel sums. The oracle
      // computes the same sums in closed form from the pixel formula,
      // never touching PNG — so a hash match PROVES the codec
      // round-trip is bit-faithful (PNG is lossless; any encoder/decoder
      // defect or color-profile drift turns the row red). Both codec
      // calls are partition-local over the batched iterator
      // (mapPartitions — the JVM analog of mapInPandas); only doc_id +
      // dims + 3 sums ever shuffle, the payloads live and die inside
      // the task. At 100 TB this is the universal thumbnail/feature
      // scan: map-only, scan-speed, no shuffle.
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          (lit(16) + col("doc_id") % 64).cast("int").as("width"),
          (lit(16) + col("doc_id") % 48).cast("int").as("height"))
        .as[(Long, Int, Int)]
        .mapPartitions(_.map { case (id, w, h) =>
          val png = encodePng(id, w, h) // REAL PNG bytes
          val (dw, dh, sr, sg, sb) = decodeStats(png) // REAL decode
          (id, dw, dh, dw.toLong * dh, sr, sg, sb)
        })
        .toDF("doc_id", "width", "height", "n_pixels", "sum_r", "sum_g", "sum_b")
        .orderBy("doc_id")
    },

    // --- REAL image resize: decode → nearest-neighbor → re-encode -------
    Q("q_mm_resize_real",
      """WITH di AS (SELECT doc_id,
        |    CAST(16 + doc_id % 64 AS INT) AS width,
        |    CAST(16 + doc_id % 48 AS INT) AS height
        |  FROM documents WHERE doc_id < 200),
        |px AS (SELECT doc_id, width, height,
        |    (doc_id * 31 + 2 * x.i * 7 + 2 * y.i * 13) % 256 AS r,
        |    (doc_id * 31 + 2 * x.i * 7 + 2 * y.i * 13 + 101) % 256 AS g,
        |    (doc_id * 31 + 2 * x.i * 7 + 2 * y.i * 13 + 202) % 256 AS b
        |  FROM di, range(0, 40) x(i), range(0, 32) y(i)
        |  WHERE x.i < width // 2 AND y.i < height // 2)
        |SELECT doc_id, width, height,
        |  CAST(width // 2 AS INT) AS new_width,
        |  CAST(height // 2 AS INT) AS new_height,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(SUM(g) AS BIGINT) AS sum_g,
        |  CAST(SUM(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin) { (s, d) =>
      // REAL resize through the real codec: encode the full-size PNG,
      // DECODE it, nearest-neighbor downsample 2× (resized (x,y) :=
      // decoded (2x, 2y) — deterministic by construction, unlike
      // platform-varying smooth scalers), RE-ENCODE the result as PNG,
      // then decode THAT and report its pixel sums — so the emitted
      // stats have passed through two full encode→decode round-trips.
      // The oracle evaluates the pixel formula at even coordinates in
      // closed form; a hash match proves both round-trips faithful.
      // Same mapPartitions batching and shuffle profile as
      // q_mm_decode_real.
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          (lit(16) + col("doc_id") % 64).cast("int").as("width"),
          (lit(16) + col("doc_id") % 48).cast("int").as("height"))
        .as[(Long, Int, Int)]
        .mapPartitions(_.map { case (id, w, h) =>
          val bi = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(encodePng(id, w, h)))
          val (nw, nh) = (w / 2, h / 2)
          val out = new java.awt.image.BufferedImage(
            nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < nh) {
            var x = 0
            while (x < nw) { out.setRGB(x, y, bi.getRGB(2 * x, 2 * y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos) // RE-ENCODE
          val (dw, dh, sr, sg, sb) = decodeStats(bos.toByteArray)
          (id, w, h, dw, dh, sr, sg, sb)
        })
        .toDF("doc_id", "width", "height", "new_width", "new_height",
          "sum_r", "sum_g", "sum_b")
        .orderBy("doc_id")
    },

    // --- REAL image feature extraction: decoded-pixel histogram ---------
    Q("q_mm_features_real",
      """WITH di AS (SELECT doc_id,
        |    CAST(16 + doc_id % 64 AS INT) AS width,
        |    CAST(16 + doc_id % 48 AS INT) AS height
        |  FROM documents WHERE doc_id < 200),
        |px AS (SELECT doc_id, width, height,
        |    ((doc_id * 31 + x.i * 7 + y.i * 13 + 101) % 256) // 16 AS b
        |  FROM di, range(0, 80) x(i), range(0, 64) y(i)
        |  WHERE x.i < width AND y.i < height),
        |h AS (SELECT doc_id, width, height, b, COUNT(*) AS c
        |      FROM px GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, CAST(width * height AS BIGINT) AS n_pixels,
        |  '[' || array_to_string(list(CAST(c AS VARCHAR) ORDER BY b), ',') || ']'
        |    AS g_hist
        |FROM h GROUP BY doc_id, width, height ORDER BY doc_id""".stripMargin) { (s, d) =>
      // REAL feature extraction (the q_mm_features verb with the stub
      // REPLACED by the actual codec): PNG encode → real ImageIO decode
      // → 16-bin histogram of the decoded GREEN channel, computed
      // row-locally inside the same mapPartitions batch as the decode —
      // the canonical image-QA feature scan (dark/clipped/flat-image
      // detection keys off exactly this histogram at ingest). The
      // oracle bins the closed-form pixel formula without touching PNG;
      // the histogram serializes to JSON text (the q_mm_features
      // nested-output rule — the gate comparator can't sort raw array
      // columns). Every populated bin count survives the codec
      // round-trip exactly or the row goes red. Same 100 TB shape as
      // q_mm_decode_real: map-only, payloads never shuffle.
      // (Oracle note: dense 16-bin emission isn't needed — the pixel
      // formula covers every residue class per image, so all 16 bins
      // are populated on these dimensions; the Spark side still emits
      // zeros defensively.)
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          (lit(16) + col("doc_id") % 64).cast("int").as("width"),
          (lit(16) + col("doc_id") % 48).cast("int").as("height"))
        .as[(Long, Int, Int)]
        .mapPartitions(_.map { case (id, w, h) =>
          val bi = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(encodePng(id, w, h)))
          val hist = new Array[Long](16)
          var y = 0
          while (y < bi.getHeight) {
            var x = 0
            while (x < bi.getWidth) {
              hist(((bi.getRGB(x, y) >> 8) & 0xff) / 16) += 1
              x += 1
            }
            y += 1
          }
          (id, w.toLong * h, hist.mkString("[", ",", "]"))
        })
        .toDF("doc_id", "n_pixels", "g_hist")
        .orderBy("doc_id")
    },

    // --- REAL audio feature extraction: energy / crossings / peak -------
    Q("q_mm_audio_features_real",
      """WITH di AS (SELECT doc_id,
        |    CAST(256 + doc_id % 512 AS INT) AS n_samples
        |  FROM documents WHERE doc_id < 200),
        |s AS (SELECT doc_id, n_samples, i.i AS i,
        |    (doc_id * 31 + i.i * 7919) % 65536 - 32768 AS v
        |  FROM di, range(0, 768) i(i) WHERE i.i < n_samples),
        |p AS (SELECT doc_id, n_samples, v,
        |    LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM s)
        |SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
        |  CAST(SUM(v * v) AS BIGINT) AS sum_sq,
        |  CAST(SUM(CASE WHEN pv IS NOT NULL AND pv * v < 0 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS zero_crossings,
        |  CAST(MAX(ABS(v)) AS INT) AS peak
        |FROM p GROUP BY 1, 2 ORDER BY doc_id""".stripMargin) { (s, d) =>
      // REAL audio feature extraction over the decoded stream: WAV
      // encode → real AudioSystem decode → energy (exact integer sum of
      // squares — the loudness/silence gate), sign-change count (the
      // classic cheap voiced/unvoiced & frequency proxy), and peak
      // amplitude (clipping detection) — the features a speech-corpus
      // QA pass computes at ingest. All three are exact integers
      // computed in one pass over the decoded PCM inside the decode's
      // own mapPartitions batch; the oracle evaluates the closed-form
      // sample formula (windowed LAG for crossings) without touching
      // WAV. sum_sq ≤ n·2^30 stays far inside BIGINT. Map-only at
      // 100 TB; payloads never leave the task.
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          (lit(256) + col("doc_id") % 512).cast("int").as("n"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, n) =>
          val (pcm, _) = decodeWavPcm(encodeWav(id, n)) // REAL decode
          var (sq, zc) = (0L, 0L)
          var peak = 0
          var prev = 0
          var i = 0
          while (i < n) {
            val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
            sq += v.toLong * v
            if (i > 0 && prev.toLong * v < 0) zc += 1
            if (math.abs(v) > peak) peak = math.abs(v)
            prev = v
            i += 1
          }
          (id, n.toLong, sq, zc, peak)
        })
        .toDF("doc_id", "n_samples", "sum_sq", "zero_crossings", "peak")
        .orderBy("doc_id")
    },

    // --- REAL audio decode: WAV bytes through the actual JDK codec ------
    Q("q_mm_audio_decode_real",
      """WITH di AS (SELECT doc_id,
        |    CAST(256 + doc_id % 512 AS INT) AS n_samples
        |  FROM documents WHERE doc_id < 200),
        |s AS (SELECT doc_id, n_samples,
        |    (doc_id * 31 + i.i * 7919) % 65536 - 32768 AS v
        |  FROM di, range(0, 768) i(i) WHERE i.i < n_samples)
        |SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
        |  CAST(SUM(v) AS BIGINT) AS sum_s,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        |  CAST(MIN(v) AS INT) AS min_s, CAST(MAX(v) AS INT) AS max_s
        |FROM s GROUP BY 1, 2 ORDER BY doc_id""".stripMargin) { (s, d) =>
      // REAL audio decode (round 10, same design as q_mm_decode_real):
      // javax.sound.sampled is in the JDK, so the audio codec slot is
      // filled for WAV/PCM — per record, deterministic signed-16 samples
      // → real WAV ENCODE (RIFF headers and all) → real AudioSystem
      // DECODE → integer sample stats. The oracle computes the same
      // stats in closed form from the sample formula, never touching
      // WAV — a hash match proves the codec round-trip bit-faithful
      // (PCM is lossless; a header/endianness/transcode defect turns
      // the row red — decodeWavPcm also REQUIREs the decoded format).
      // Both codec calls are partition-local over the batched iterator;
      // only doc_id + 5 stats ever shuffle. At 100 TB this is the
      // speech-corpus QA scan: map-only, scan-speed, no shuffle.
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          (lit(256) + col("doc_id") % 512).cast("int").as("n"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, n) =>
          val wav = encodeWav(id, n) // REAL WAV bytes
          val (dn, sum, sabs, mn, mx) = decodeWavStats(wav) // REAL decode
          (id, dn, sum, sabs, mn, mx)
        })
        .toDF("doc_id", "n_samples", "sum_s", "sum_abs", "min_s", "max_s")
        .orderBy("doc_id")
    },

    // --- REAL audio resample: decode → decimate → re-encode -------------
    Q("q_mm_audio_resample_real",
      """WITH di AS (SELECT doc_id,
        |    CAST(256 + doc_id % 512 AS INT) AS n_samples
        |  FROM documents WHERE doc_id < 200),
        |s AS (SELECT doc_id, n_samples,
        |    (doc_id * 31 + (2 * j.j) * 7919) % 65536 - 32768 AS v
        |  FROM di, range(0, 384) j(j) WHERE 2 * j.j < n_samples)
        |SELECT doc_id, CAST(n_samples AS BIGINT) AS n_in,
        |  CAST((n_samples + 1) // 2 AS BIGINT) AS n_out,
        |  CAST(4000 AS INT) AS rate_out,
        |  CAST(SUM(v) AS BIGINT) AS sum_s,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs
        |FROM s GROUP BY doc_id, n_samples ORDER BY doc_id""".stripMargin) { (s, d) =>
      // REAL resample through the real codec (the audio twin of
      // q_mm_resize_real): encode the 8 kHz clip as WAV, DECODE it,
      // decimate 2× (keep even-index samples — deterministic, unlike
      // interpolating resamplers), RE-ENCODE the result as a real 4 kHz
      // WAV, then decode THAT and report its stats plus the decoded
      // header's sample rate — so both the sample bytes and the rate
      // metadata have survived two full encode→decode round-trips. The
      // oracle evaluates the sample formula at even indices in closed
      // form; rate_out comes from the second DECODE, not a constant, so
      // a header-mangling writer turns the row red.
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          (lit(256) + col("doc_id") % 512).cast("int").as("n"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, n) =>
          val (pcm, _) = decodeWavPcm(encodeWav(id, n)) // decode #1
          val nOut = (n + 1) / 2
          val dec = new Array[Byte](nOut * 2)
          var j = 0
          while (j < nOut) { // even-index samples, little-endian pairs
            dec(2 * j) = pcm(4 * j); dec(2 * j + 1) = pcm(4 * j + 1)
            j += 1
          }
          val wav2 = encodePcmWav(dec, 4000f) // RE-ENCODE at half rate
          val (dn, sum, sabs, _, _) = decodeWavStats(wav2) // decode #2
          val (_, rate) = decodeWavPcm(wav2)
          (id, n.toLong, dn, rate.toInt, sum, sabs)
        })
        .toDF("doc_id", "n_in", "n_out", "rate_out", "sum_s", "sum_abs")
        .orderBy("doc_id")
    },

    // --- REAL multi-frame video decode: animated GIF, per-frame stats ---
    Q("q_mm_video_frames_real",
      """WITH di AS (SELECT doc_id,
        |    CAST(8 + doc_id % 16 AS INT) AS width,
        |    CAST(8 + doc_id % 12 AS INT) AS height,
        |    CAST(2 + doc_id % 4 AS INT) AS n_frames
        |  FROM documents WHERE doc_id < 200),
        |px AS (SELECT doc_id, n_frames, width, height, f.f AS fi,
        |    (doc_id * 31 + f.f * 17 + x.i * 7 + y.i * 13) % 256 AS v
        |  FROM di, range(0, 6) f(f), range(0, 24) x(i), range(0, 20) y(i)
        |  WHERE f.f < n_frames AND x.i < width AND y.i < height)
        |SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
        |  CAST(fi AS INT) AS frame_idx,
        |  CAST(width * height AS BIGINT) AS n_pixels,
        |  CAST(SUM(v) AS BIGINT) AS sum_v,
        |  CAST(MIN(v) AS INT) AS min_v, CAST(MAX(v) AS INT) AS max_v
        |FROM px GROUP BY doc_id, n_frames, fi, width, height
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      // The VIDEO codec slot, filled with the real multi-frame format
      // the JDK ships (round-10 verdict item #3): per record,
      // deterministic gray frames → real ImageIO ANIMATED-GIF ENCODE
      // (writeToSequence — actual LZW, real GIF89a container) → real
      // per-frame ImageReader DECODE → per-frame integer pixel stats,
      // one output row per decoded frame. The oracle evaluates the
      // pixel formula in closed form, never touching GIF — a hash match
      // certifies the whole container round-trip: frame COUNT (a
      // dropped/merged frame changes the row set), frame dimensions,
      // and every frame's pixels (GIF's LZW is lossless over the
      // explicit 256-gray palette; any quantizer/disposal/palette
      // defect turns the row red). This makes decode / frame-sample /
      // extract real for all three modalities the sandbox can express
      // (PNG images, WAV audio, GIF video). Both codec calls are
      // partition-local over the batched iterator; payloads live and
      // die inside the task and only doc_id + 6 ints per frame ever
      // shuffle — at 100 TB this is the frame-extraction scan of a
      // video-corpus ingest: map-only, scan-speed, no shuffle, with
      // the per-record fan-out (rows = frames) happening inside the
      // same narrow stage.
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          (lit(8) + col("doc_id") % 16).cast("int").as("w"),
          (lit(8) + col("doc_id") % 12).cast("int").as("h"),
          (lit(2) + col("doc_id") % 4).cast("int").as("nf"))
        .as[(Long, Int, Int, Int)]
        .mapPartitions(_.flatMap { case (id, w, h, nf) =>
          val gif = encodeGif(id, w, h, nf) // REAL animated-GIF bytes
          decodeGifFrames(gif).map { case (f, dw, dh, sum, mn, mx) =>
            (id, nf, f, dw.toLong * dh, sum, mn, mx)
          }
        })
        .toDF("doc_id", "n_frames", "frame_idx", "n_pixels", "sum_v", "min_v", "max_v")
        .orderBy("doc_id", "frame_idx")
    },

    // --- REAL video frame sampling: decode → keep every 2nd → re-encode -
    Q("q_mm_video_sample_real",
      """WITH di AS (SELECT doc_id,
        |    CAST(8 + doc_id % 16 AS INT) AS width,
        |    CAST(8 + doc_id % 12 AS INT) AS height,
        |    CAST(2 + doc_id % 4 AS INT) AS n_frames
        |  FROM documents WHERE doc_id < 200),
        |px AS (SELECT doc_id, n_frames, width, height, f.f AS fi,
        |    (doc_id * 31 + (2 * f.f) * 17 + x.i * 7 + y.i * 13) % 256 AS v
        |  FROM di, range(0, 3) f(f), range(0, 24) x(i), range(0, 20) y(i)
        |  WHERE 2 * f.f < n_frames AND x.i < width AND y.i < height)
        |SELECT doc_id, CAST(n_frames AS INT) AS n_in,
        |  CAST((n_frames + 1) // 2 AS INT) AS n_out,
        |  CAST(fi AS INT) AS frame_idx,
        |  CAST(SUM(v) AS BIGINT) AS sum_v,
        |  CAST(MIN(v) AS INT) AS min_v, CAST(MAX(v) AS INT) AS max_v
        |FROM px GROUP BY doc_id, n_frames, fi
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      // The video twin of q_mm_audio_resample_real — temporal
      // downsampling through the real container: decode the animated
      // GIF, KEEP EVERY 2ND FRAME (I-frame-style sampling,
      // deterministic unlike motion-interpolating resamplers),
      // RE-ENCODE the kept frames as a new animated GIF, then decode
      // THAT and report per-kept-frame stats — so frame count, order,
      // and every pixel have survived two full container round-trips.
      // The oracle evaluates the pixel formula at even frame indices in
      // closed form; output frame_idx is the SAMPLED stream's index
      // (sampled frame f shows original frame 2f). Same map-only
      // 100 TB shape as q_mm_video_frames_real.
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          (lit(8) + col("doc_id") % 16).cast("int").as("w"),
          (lit(8) + col("doc_id") % 12).cast("int").as("h"),
          (lit(2) + col("doc_id") % 4).cast("int").as("nf"))
        .as[(Long, Int, Int, Int)]
        .mapPartitions(_.flatMap { case (id, w, h, nf) =>
          val gif = encodeGif(id, w, h, nf) // decode #1 input
          val frames = decodeGifImages(gif)
          val kept = frames.zipWithIndex.collect { case (img, f) if f % 2 == 0 => img }
          val gif2 = encodeGifFrom(kept) // RE-ENCODE the sampled stream
          decodeGifFrames(gif2).map { case (f, _, _, sum, mn, mx) =>
            (id, nf, (nf + 1) / 2, f, sum, mn, mx)
          }
        })
        .toDF("doc_id", "n_in", "n_out", "frame_idx", "sum_v", "min_v", "max_v")
        .orderBy("doc_id", "frame_idx")
    },

    // --- batched partition-local "decode" + feature extraction ---------
    Q("q_mm_features", {
      // The stub decode is deterministic byte math over ascii payloads
      // (char == byte on this data), so DuckDB can replicate it exactly:
      // histogram bin b = count of bytes in [16b, 16b+16). The 16 bins
      // are generated as explicit list entries (no nested-lambda capture)
      // and serialized to the same JSON text Spark's to_json emits.
      val bins = (0 until 16)
        .map(i => s"len(list_filter(bytes, b -> b // 16 = $i))")
        .mkString(", ")
      s"""WITH x AS (
         |  SELECT doc_id,
         |    ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
         |    [CAST(ascii(text[i]) AS BIGINT) for i in range(1, length(text) + 1)] AS bytes
         |  FROM documents)
         |SELECT doc_id, mime,
         |  CAST(len(bytes) AS INT) AS n_bytes,
         |  ROUND(list_sum(bytes)::DOUBLE / len(bytes), 9) AS mean_byte,
         |  '[' || array_to_string([$bins], ',') || ']' AS byte_hist
         |FROM x ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      // mapPartitions keeps the codec call batched per partition (the
      // JVM analog of mapInPandas): one iterator pass, no per-row UDF
      // dispatch, payload bytes never shuffled — only the small feature
      // vectors move. Deterministic stub → stable gate; ScalaTest
      // asserts the real histogram array against hand-computed values;
      // the gate sees it as to_json text (nested-output rule — the
      // driver's comparator can't sort on a raw array column).
      import s.implicits._
      records(s, d).as[MmRecord]
        .mapPartitions(_.map(stubDecode))
        .toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          round(col("mean_byte"), 9).as("mean_byte"),
          to_json(col("byte_hist")).as("byte_hist"))
        .orderBy("doc_id")
    },
  )
}
