package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed per partition.
  *
  * The image decode step is REAL: [[decodeImage]] runs the JDK's own
  * `javax.imageio` codec (PNG/JPEG/BMP/GIF, pure JVM — no container
  * deps) inside the per-partition pipeline and emits integer-exact
  * features (width, height, 16-bucket luminance histogram) read from
  * the RASTER samples — never `getRGB`, whose gray→sRGB color-space
  * conversion would silently remap every pixel value. The audio decode
  * step is REAL too: [[decodeAudio]] runs the JDK's own
  * `javax.sound.sampled` codec (WAV/AIFF/AU PCM) and emits
  * integer-exact features (rate, frame count, 16-bucket amplitude
  * histogram). Video codecs (and compressed audio) aren't in the JDK;
  * those payloads use the codec-agnostic byte-level features
  * ([[extractFeatures]]) until a decoder library is available — the
  * per-partition shape is identical either way.
  *
  * Scale posture: generation, decode and feature extraction are all
  * narrow per-partition passes (no shuffle); metadata extraction
  * ([[blobMeta]]) is pure codegen'd expressions. Payload bytes never
  * leave the executor — only fixed-width features and metadata flow
  * downstream.
  */
object Multimodal {

  /** An opaque payload row. On real data the bytes come from
    * `spark.read.format("binaryFile")` or a bytes column in parquet; here
    * the corpus's text bytes stand in as the payload.
    */
  case class Blob(doc_id: Long, bytes: Array[Byte])

  /** Codec-agnostic byte-level features per payload: byte count +
    * 16-bucket histogram of high nibbles — the magic-blind profile that
    * works on ANY payload (including formats the JVM can't decode).
    */
  case class BlobFeatures(doc_id: Long, n_bytes: Long, histogram: Seq[Long])

  /** Decoded-image features, all integer-exact: pixel dimensions plus a
    * 16-bucket luminance histogram (`lum >> 4` of the BT.601 integer
    * luma `(299·r + 587·g + 114·b) / 1000`; single-band images use the
    * band directly, which the same formula reduces to exactly).
    */
  case class ImageFeatures(doc_id: Long, width: Long, height: Long,
      lum_hist: Seq[Long])

  /** Integer-exact features of a REAL audio decode: sample rate and
    * frame count from the container header, and a 16-bucket amplitude
    * histogram over channel-0 samples (`(s + 32768) >> 12` of the
    * signed 16-bit sample — pure integer arithmetic an oracle can
    * replay).
    */
  case class AudioFeatures(doc_id: Long, sample_rate: Long,
      n_samples: Long, amp_hist: Seq[Long])

  implicit private val blobEnc: Encoder[Blob] = Encoders.product[Blob]
  implicit private val featEnc: Encoder[BlobFeatures] = Encoders.product[BlobFeatures]
  implicit private val imgEnc: Encoder[ImageFeatures] = Encoders.product[ImageFeatures]
  implicit private val audEnc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]

  /** Documents → payload rows (text bytes as the opaque blob). */
  def blobs(docs: DataFrame): Dataset[Blob] =
    docs.select(col("doc_id"), col("text").cast("binary").as("bytes")).as[Blob]

  /** Payload rows from a DIRECTORY of media files — the production
    * ingestion path the [[Blob]] doc names: Spark's `binaryFile`
    * source yields (path, modificationTime, length, content) with the
    * bytes read on the executor that owns the split, so payloads never
    * route through the driver. Doc ids derive from the trailing digits
    * of each file name (contract: files are named `<id>.<ext>`), so
    * re-listing the same directory yields the same ids — the stability
    * every downstream dedup/feature join depends on. A file that
    * doesn't match the contract fails LOUDLY (silently dropping or
    * renumbering payloads would corrupt the id space).
    */
  def blobsFromFiles(spark: org.apache.spark.sql.SparkSession,
      dir: String): Dataset[Blob] = {
    // anchor the WHOLE basename to <digits>.<ext> — an unanchored
    // trailing-digit match would silently renumber img_001.jpg to 1
    // and collide it with 1.png (review finding); try_cast keeps a
    // >Long.MaxValue id inside the fail-loud contract instead of a
    // raw ANSI overflow or a silent NULL id
    val raw = spark.read.format("binaryFile").load(dir)
      .select(regexp_extract(element_at(split(col("path"), "/"), -1),
        "^([0-9]+)\\.[^.]+$", 1).as("id_str"), col("content"))
      .withColumn("doc_id", expr("try_cast(id_str as bigint)"))
    // ONE validation job over the path-derived columns (content is
    // pruned from this scan): malformed names, ids beyond bigint, and
    // duplicate ids all surface here — the diagnostic re-scan below
    // runs only on the failure path
    val v = raw.agg(
      sum(when(col("id_str") === "" || col("doc_id").isNull, 1L)
        .otherwise(0L)).as("n_bad"),
      count(lit(1)).as("n"),
      countDistinct(col("doc_id")).as("n_ids")).head
    if (v.getLong(0) > 0)
      throw new IllegalArgumentException(
        "blobsFromFiles: file names must be exactly <id>.<ext> with a " +
          s"numeric id that fits a 64-bit integer — non-conforming " +
          s"files found under $dir")
    if (v.getLong(1) != v.getLong(2)) {
      val sample = raw.groupBy("doc_id").count().filter(col("count") > 1)
        .limit(3).collect().map(_.getLong(0)).mkString(", ")
      throw new IllegalArgumentException(
        s"blobsFromFiles: duplicate payload ids (e.g. $sample) under $dir " +
          "— e.g. 1.jpg beside 1.png; ids must be unique")
    }
    raw.select(col("doc_id"), col("content").as("bytes")).as[Blob]
  }

  /** Codec-agnostic byte-level profile: deterministic high-nibble
    * histogram. This is NOT a decode — it's the payload profile that
    * stays available when no decoder exists for the format (video and
    * compressed audio in this deployment); image payloads get the real
    * [[decodeImage]], PCM audio the real [[decodeAudio]].
    */
  private[graft] def byteProfile(b: Blob): BlobFeatures = {
    val hist = new Array[Long](16)
    b.bytes.foreach(x => hist((x & 0xFF) >> 4) += 1)
    BlobFeatures(b.doc_id, b.bytes.length.toLong, hist.toSeq)
  }

  /** Per-partition byte-level profiling over payload rows.
    * `mapPartitions` (not per-row map) is deliberate: the decode
    * pipelines amortize per-library init across the partition's rows,
    * and this profile keeps the identical shape.
    */
  def extractFeatures(payload: Dataset[Blob]): Dataset[BlobFeatures] =
    payload.mapPartitions(_.map(byteProfile))

  /** Per-band 8-bit normalization plan for raster samples: sample `s`
    * of a `d`-bit band maps to `((s >> shift) * num) / den` — the
    * high-byte shift for d ∈ (8, 16] (16-bit 0xFFFF → 0xFF), identity
    * at 8, and a full-range integer upscale `s·255/(2^d − 1)` below 8
    * (a non-palette 4-bit gray 0xF must read as white 255, not
    * near-black 15 — the r12 review finding; d = 1 maps {0, 1} to
    * {0, 255} by the same formula). Deeper than 16 bits fails loudly
    * — float/32-bit rasters have no lossless integer story here.
    * Palette indices never pass through this plan: they're names, not
    * values, and resolve through the `IndexColorModel` instead.
    */
  private[graft] final case class BandNorm(
      shift: Array[Int], num: Array[Int], den: Array[Int]) {
    @inline def apply(band: Int, s: Int): Int =
      ((s >> shift(band)) * num(band)) / den(band)
  }

  private[graft] def bandNorm(sm: java.awt.image.SampleModel,
      nBands: Int, ctx: String, docId: Long): BandNorm = {
    val shift = new Array[Int](nBands)
    val num = new Array[Int](nBands)
    val den = new Array[Int](nBands)
    var i = 0
    while (i < nBands) {
      val d = sm.getSampleSize(i)
      if (d > 16)
        throw new IllegalArgumentException(
          s"$ctx: payload $docId has a $d-bit band $i — " +
            "only <=16-bit integer samples are supported")
      if (d >= 8) { shift(i) = d - 8; num(i) = 1; den(i) = 1 }
      else { shift(i) = 0; num(i) = 255; den(i) = (1 << d) - 1 }
      i += 1
    }
    BandNorm(shift, num, den)
  }

  /** REAL image decode: `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF —
    * the JDK's in-process codecs) → integer-exact [[ImageFeatures]].
    * Reads RASTER band samples, not `getRGB`: `getRGB` converts a
    * gray raster through the linear-gray→sRGB color space (128 gray
    * becomes ~186), which would break sample-exactness; raw samples
    * round-trip losslessly through PNG. Palette formats (GIF, palette
    * BMP/PNG) carry palette INDICES in the raster — those map through
    * the `IndexColorModel` to their true RGB before the luma, so a
    * gray-palette GIF of the same pixels decodes to the same features
    * as the gray PNG (spec-pinned per format in SourcesSpec). Fails
    * LOUDLY on undecodable bytes — a silently skipped payload would
    * corrupt downstream dedup/join cardinalities.
    */
  private[graft] def decodeImage(b: Blob): ImageFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.bytes))
    if (img == null)
      throw new IllegalArgumentException(
        s"decodeImage: payload ${b.doc_id} (${b.bytes.length} bytes) is not " +
          "a JDK-decodable image (PNG/JPEG/BMP/GIF)")
    val raster = img.getRaster
    val bands = raster.getNumBands
    val (w, h) = (img.getWidth, img.getHeight)
    val palette = img.getColorModel match {
      case icm: java.awt.image.IndexColorModel => Some(icm)
      case _ => None
    }
    // the JDK codecs also hand back non-8-bit rasters (16-bit PNG,
    // sub-8-bit gray): normalize each read band to the 8-bit range via
    // the shared [[bandNorm]] plan — high-byte shift above 8 bits,
    // full-range upscale below — so deep and shallow images take the
    // same documented path instead of an ArrayIndexOutOfBounds (deep)
    // or an all-dark histogram (shallow).
    val nrm = bandNorm(raster.getSampleModel, math.min(bands, 3),
      "decodeImage", b.doc_id)
    val hist = new Array[Long](16)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // BT.601 integer luma over the first 3 bands; 1-band (gray)
        // and 2-band (gray+alpha) rasters use band 0, which the same
        // weights reduce to exactly (299+587+114 = 1000)
        val lum = palette match {
          case Some(icm) =>
            val idx = raster.getSample(x, y, 0)
            (299 * icm.getRed(idx) + 587 * icm.getGreen(idx)
              + 114 * icm.getBlue(idx)) / 1000
          case None =>
            if (bands >= 3)
              (299 * nrm(0, raster.getSample(x, y, 0))
                + 587 * nrm(1, raster.getSample(x, y, 1))
                + 114 * nrm(2, raster.getSample(x, y, 2))) / 1000
            else nrm(0, raster.getSample(x, y, 0))
        }
        hist(lum >> 4) += 1
        x += 1
      }
      y += 1
    }
    ImageFeatures(b.doc_id, w.toLong, h.toLong, hist.toSeq)
  }

  /** Per-partition image decode over payload rows — the real codec in
    * the [[extractFeatures]] shape: library setup once per partition,
    * then the rows stream through the decoder.
    */
  def extractImageFeatures(payload: Dataset[Blob]): Dataset[ImageFeatures] =
    payload.mapPartitions { it =>
      // per-partition codec init: ImageIO's disk cache buffers every
      // decode through a temp file by default — in-memory streams only,
      // set once here, then the partition's rows stream through
      javax.imageio.ImageIO.setUseCache(false)
      it.map(decodeImage)
    }

  /** Deterministic synthetic-image formula, shared VERBATIM by the PNG
    * generator and the q215 oracle's closed form: a doc's image is
    * `width × height` gray with pixel (x, y) = `(doc_id·31 + x·7 + y·3)
    * mod 256`, where `width = 16 + doc_id mod 17` and `height = 16 +
    * doc_id mod 13`. Because the content is known in closed form, a
    * SQL oracle with no image codec can compute the EXPECTED decoded
    * features analytically — which turns the engine's real
    * encode→decode round trip into a hash-gatable query (q215).
    */
  private[graft] def synthDims(docId: Long): (Int, Int) =
    (16 + (docId % 17).toInt, 16 + (docId % 13).toInt)

  private[graft] def synthPixel(docId: Long, x: Int, y: Int): Int =
    ((docId * 31 + x * 7 + y * 3) % 256).toInt

  /** Encode one synthetic grayscale PNG for `docId` — the JDK PNG
    * encoder over a TYPE_BYTE_GRAY raster; PNG is lossless at 8-bit
    * gray, so [[decodeImage]] recovers every sample exactly.
    */
  private[graft] def encodeSynthPng(docId: Long): Array[Byte] =
    encodeSynthImage(docId, "png")

  /** The synthetic gray image in any LOSSLESS JDK-writable format —
    * PNG, BMP, or GIF (8-bit gray fits a 256-entry GIF palette, so all
    * three round-trip the samples exactly and share the q215/q221
    * analytic oracle). JPEG is deliberately NOT offered here: lossy
    * output would silently break the hash gate; its decode coverage is
    * the tolerance smoke in TextSpec.
    */
  private[graft] def encodeSynthImage(docId: Long, fmt: String): Array[Byte] = {
    require(Set("png", "bmp", "gif")(fmt),
      s"encodeSynthImage: lossless formats only (png/bmp/gif), got '$fmt'")
    // the closed-form pixel/dims formula (and its SQL oracle) is
    // defined on non-negative ids; a negative id would yield negative
    // dims here and a different % sign in SQL — fail at the door
    require(docId >= 0, s"encodeSynthImage: doc_id must be >= 0, got $docId")
    val (w, h) = synthDims(docId)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, synthPixel(docId, x, y))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, fmt, out))
      throw new IllegalStateException(s"no JDK writer for $fmt")
    out.toByteArray
  }

  /** Documents → one deterministic PNG payload per doc (the synthetic
    * media corpus). Narrow per-partition generation — only doc_id is
    * read, payload bytes are born and consumed on the executor.
    */
  def pngCorpus(docs: DataFrame): Dataset[Blob] =
    Spread(docs.select(col("doc_id"))).as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map(id => Blob(id, encodeSynthPng(id)))
      }

  /** [[pngCorpus]] with the container format VARYING by doc —
    * doc_id mod 3 picks PNG / BMP / GIF (all lossless for 8-bit gray,
    * so the decoded features stay the q215 closed form regardless of
    * container). This is the q221 corpus: a real image pipeline never
    * sees one container, and the GIF third routes through the palette
    * (IndexColorModel) decode path on every gated run.
    */
  def mixedCorpus(docs: DataFrame): Dataset[Blob] =
    Spread(docs.select(col("doc_id"))).as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val fmts = Array("png", "bmp", "gif")
        // floorMod: a (contract-violating) negative id must hit the
        // encode require, not an ArrayIndexOutOfBounds at fmts(-1)
        it.map(id =>
          Blob(id, encodeSynthImage(id, fmts(java.lang.Math.floorMod(id, 3L).toInt))))
      }

  /** Deterministic synthetic-audio formula, shared VERBATIM by the WAV
    * generator and the q222 oracle's closed form: doc d is a mono
    * 16-bit PCM clip of `256 + d mod 241` frames at 8 kHz whose frame
    * i carries the signed sample `((d·31 + i·4099) mod 65536) − 32768`
    * (4099 is odd, so the samples sweep the full 16-bit range and every
    * amplitude bucket sees traffic).
    * Known content in closed form turns the engine's REAL
    * `javax.sound.sampled` encode→decode round trip into a
    * hash-gatable query, exactly the q215 trick for images.
    */
  private[graft] def synthAudioLen(docId: Long): Int =
    256 + (docId % 241).toInt

  private[graft] def synthAudioSample(docId: Long, i: Int): Int =
    ((docId * 31 + i * 4099) % 65536).toInt - 32768

  /** The synthetic clip in any LOSSLESS JDK-writable PCM container —
    * WAV, AIFF, or AU. All three carry the identical signed 16-bit
    * PCM samples, so they share the q222 analytic oracle; only the
    * container (and its mandated byte order — WAV is little-endian,
    * AIFF/AU big-endian, matched here so the JDK writer streams the
    * frames verbatim) differs. Encoded by the JDK's own
    * `javax.sound.sampled.AudioSystem` writers (REAL codec paths, not
    * hand-rolled headers). Compressed containers are deliberately NOT
    * offered: a lossy round trip would silently break the hash gate.
    */
  private[graft] def encodeSynthAudio(docId: Long, fmt: String): Array[Byte] = {
    require(Set("wav", "aiff", "au")(fmt),
      s"encodeSynthAudio: lossless PCM containers only (wav/aiff/au), got '$fmt'")
    require(docId >= 0, s"encodeSynthAudio: doc_id must be >= 0, got $docId")
    val big = fmt != "wav" // AIFF and AU are big-endian by spec
    val n = synthAudioLen(docId)
    val pcm = new Array[Byte](n * 2) // 16-bit mono
    var i = 0
    while (i < n) {
      val s = synthAudioSample(docId, i)
      val (lo, hi) = if (big) (2 * i + 1, 2 * i) else (2 * i, 2 * i + 1)
      pcm(lo) = (s & 0xFF).toByte
      pcm(hi) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val afmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, true /* signed */, big)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), afmt, n.toLong)
    val tpe = fmt match {
      case "wav" => javax.sound.sampled.AudioFileFormat.Type.WAVE
      case "aiff" => javax.sound.sampled.AudioFileFormat.Type.AIFF
      case _ => javax.sound.sampled.AudioFileFormat.Type.AU
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, tpe, bos)
    bos.toByteArray
  }

  /** One deterministic WAV payload — [[encodeSynthAudio]] in the WAVE
    * container (the q222 corpus).
    */
  private[graft] def encodeSynthWav(docId: Long): Array[Byte] =
    encodeSynthAudio(docId, "wav")

  /** Documents → one deterministic WAV payload per doc (the synthetic
    * audio corpus — the q222 input, same shape as [[pngCorpus]]).
    */
  def wavCorpus(docs: DataFrame): Dataset[Blob] =
    // NOT spread: javax.sound's AudioSystem provider registry
    // serializes concurrent encode/decode on a class lock — measured
    // 1.1 s one-task vs 5.5 s spread over 32 (Probe, r14)
    docs.select(col("doc_id")).as[Long](Encoders.scalaLong)
      .mapPartitions(_.map(id => Blob(id, encodeSynthWav(id))))

  /** [[wavCorpus]] with the container VARYING by doc — doc_id mod 3
    * picks WAV / AIFF / AU (all lossless 16-bit PCM, so the decoded
    * features stay the q222 closed form regardless of container).
    * This is the q224 corpus — the audio mirror of [[mixedCorpus]]
    * (q221): a real pipeline never sees one container, and the AIFF/AU
    * thirds route the big-endian frame path through every gated run.
    */
  def mixedAudioCorpus(docs: DataFrame): Dataset[Blob] =
    // NOT spread: see wavCorpus — AudioSystem contention inverts the win
    docs.select(col("doc_id")).as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        val fmts = Array("wav", "aiff", "au")
        // floorMod: a (contract-violating) negative id must hit the
        // encode require, not an ArrayIndexOutOfBounds at fmts(-1)
        it.map(id => Blob(id,
          encodeSynthAudio(id, fmts(java.lang.Math.floorMod(id, 3L).toInt))))
      }

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` (the JDK's
    * in-process WAV/AIFF/AU PCM codecs) → integer-exact
    * [[AudioFeatures]]. Supports signed 16-bit PCM, either endianness,
    * any channel count (channel 0 is profiled); anything else —
    * compressed containers, float PCM, other depths — fails LOUDLY,
    * the decodeImage contract (a silently skipped payload would
    * corrupt downstream cardinalities). Formats with no JVM codec at
    * all (video here) keep the codec-agnostic [[byteProfile]].
    */
  private[graft] def decodeAudio(b: Blob): AudioFeatures = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b.bytes))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"decodeAudio: payload ${b.doc_id} (${b.bytes.length} bytes) is not " +
              "a JDK-decodable audio container (WAV/AIFF/AU)", e)
      }
    val f = ais.getFormat
    if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        || f.getSampleSizeInBits != 16)
      throw new IllegalArgumentException(
        s"decodeAudio: payload ${b.doc_id} is ${f.getEncoding}/" +
          s"${f.getSampleSizeInBits}-bit — only signed 16-bit PCM is supported")
    val bytes = ais.readAllBytes()
    val frameSize = f.getFrameSize // channels * 2 bytes
    val n = bytes.length / frameSize
    val big = f.isBigEndian
    val hist = new Array[Long](16)
    var i = 0
    while (i < n) {
      val off = i * frameSize // channel 0 leads the frame
      val s =
        if (big) (bytes(off) << 8) | (bytes(off + 1) & 0xFF)
        else (bytes(off + 1) << 8) | (bytes(off) & 0xFF)
      hist((s + 32768) >> 12) += 1
      i += 1
    }
    AudioFeatures(b.doc_id, math.round(f.getSampleRate.toDouble), n.toLong, hist.toSeq)
  }

  /** Per-partition audio decode over payload rows — the
    * [[extractImageFeatures]] shape on the audio tier.
    */
  def extractAudioFeatures(payload: Dataset[Blob]): Dataset[AudioFeatures] =
    payload.mapPartitions(_.map(decodeAudio))

  /** REAL image resize: decode ([[decodeImage]]'s codec), resample to
    * at most `maxDim` on the longer side by NEAREST-NEIGHBOR in exact
    * integer arithmetic (target W = max(1, w·maxDim / max(w,h)) with
    * integer division, source pixel of (x, y) = (x·w / W, y·h / H) —
    * no float filter whose rounding could differ across platforms, and
    * therefore a formula a SQL oracle can replay, which is how q216
    * hash-gates this end to end), re-encode PNG. Images already within
    * `maxDim` pass through BYTE-IDENTICAL (no decode/re-encode churn).
    * Gray (and gray+alpha, alpha dropped) resample to 8-bit gray; RGB+
    * to RGB. Per-partition codec init as in [[extractImageFeatures]];
    * output payloads are bounded by maxDim², which is the property
    * downstream stages (shuffles, feature batches) depend on at 100 TB.
    */
  def resizeImages(payload: Dataset[Blob], maxDim: Int): Dataset[Blob] = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    payload.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { b =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.bytes))
        if (img == null)
          throw new IllegalArgumentException(
            s"resizeImages: payload ${b.doc_id} (${b.bytes.length} bytes) is not " +
              "a JDK-decodable image (PNG/JPEG/BMP/GIF)")
        val (w, h) = (img.getWidth, img.getHeight)
        val m = math.max(w, h)
        if (m <= maxDim) b
        else {
          val tw = math.max(1, w * maxDim / m)
          val th = math.max(1, h * maxDim / m)
          val src = img.getRaster
          // palette sources (GIF, palette BMP/PNG) carry palette
          // INDICES in their one raster band — resolve through the
          // IndexColorModel to true RGB; copying indices into a gray
          // raster would scramble the image (same trap as decodeImage)
          val palette = img.getColorModel match {
            case icm: java.awt.image.IndexColorModel => Some(icm)
            case _ => None
          }
          val outType =
            if (palette.isDefined || src.getNumBands >= 3)
              java.awt.image.BufferedImage.TYPE_3BYTE_BGR
            else java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          val out = new java.awt.image.BufferedImage(tw, th, outType)
          val dst = out.getRaster
          val nb = math.min(src.getNumBands, dst.getNumBands)
          // non-8-bit source bands must be normalized into the 8-bit
          // output raster via the shared [[bandNorm]] plan — setSample
          // with raw deep samples would keep the LOW bits, and raw
          // shallow samples would land near black
          val nrm = bandNorm(src.getSampleModel, nb, "resizeImages", b.doc_id)
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              palette match {
                case Some(icm) =>
                  val idx = src.getSample(x * w / tw, y * h / th, 0)
                  // TYPE_3BYTE_BGR raster band order is R, G, B
                  dst.setSample(x, y, 0, icm.getRed(idx))
                  dst.setSample(x, y, 1, icm.getGreen(idx))
                  dst.setSample(x, y, 2, icm.getBlue(idx))
                case None =>
                  var c = 0
                  while (c < nb) {
                    dst.setSample(x, y, c,
                      nrm(c, src.getSample(x * w / tw, y * h / th, c)))
                    c += 1
                  }
              }
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Blob(b.doc_id, bos.toByteArray)
        }
      }
    }
  }

  /** Codec-agnostic payload bounding (bytes → smaller bytes):
    * deterministic decimation to at most `targetBytes` by uniform
    * stride sampling — the fallback for payload FORMATS the JVM can't
    * decode (audio/video here); image payloads get the real
    * [[resizeImages]]. Runs inside the same per-partition pipeline as
    * [[extractFeatures]]. Output payloads are bounded, which is the
    * property downstream stages depend on at 100 TB.
    */
  def resize(payload: Dataset[Blob], targetBytes: Int): Dataset[Blob] =
    payload.mapPartitions { it =>
      // (real codec init would happen here, once per partition)
      it.map { b =>
        if (b.bytes.length <= targetBytes) b
        else {
          val stride = b.bytes.length.toDouble / targetBytes
          Blob(b.doc_id,
            Array.tabulate(targetBytes)(i => b.bytes((i * stride).toInt)))
        }
      }
    }

  /** Pure-expression payload metadata: byte length, content hash, magic
    * head bytes, and fixed-offset sample slices (the "frame sample"
    * shape for media payloads) — all codegen'd, oracle-checkable.
    */
  def blobMeta(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("blob"))
      .select(col("doc_id"),
        octet_length(col("blob")).cast("long").as("n_bytes"),
        md5(col("blob")).as("content_md5"),
        hex(substring(col("blob"), 1, 8)).as("head_hex"),
        concat(hex(substring(col("blob"), 17, 4)), lit(":"),
          hex(substring(col("blob"), 33, 4))).as("frame_sample"))
}
