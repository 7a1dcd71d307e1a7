package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed per partition.
  *
  * The decode step is STUBBED — this container has no image/audio codecs
  * — but everything Spark-side is real and tested: the binary column
  * schema, the typed `mapPartitions` batch shape (one iterator per
  * partition, so a real codec amortizes model/library init across the
  * partition's rows), and deterministic feature output. To productionize,
  * replace the body of [[fakeDecode]] with the actual codec call; nothing
  * else changes.
  *
  * Scale posture: features are computed in one narrow pass (no shuffle);
  * metadata extraction ([[blobMeta]]) is pure codegen'd expressions.
  * Payload bytes never leave the executor — only fixed-width features
  * and metadata flow downstream.
  */
object Multimodal {

  /** An opaque payload row. On real data the bytes come from
    * `spark.read.format("binaryFile")` or a bytes column in parquet; here
    * the corpus's text bytes stand in as the payload.
    */
  case class Blob(doc_id: Long, bytes: Array[Byte])

  /** Fixed-width features per payload: byte count + 16-bucket histogram
    * of high nibbles (the deterministic stand-in for decoded features).
    */
  case class BlobFeatures(doc_id: Long, n_bytes: Long, histogram: Seq[Long])

  implicit private val blobEnc: Encoder[Blob] = Encoders.product[Blob]
  implicit private val featEnc: Encoder[BlobFeatures] = Encoders.product[BlobFeatures]

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

  /** STUB of the real decoder: deterministic byte-histogram "features".
    * A production build swaps this body for the codec (JPEG decode +
    * resize, PCM frame extraction, ...) — the signature (bytes in,
    * fixed-width features out) is the contract the pipeline depends on.
    */
  private[graft] def fakeDecode(b: Blob): BlobFeatures = {
    val hist = new Array[Long](16)
    b.bytes.foreach(x => hist((x & 0xFF) >> 4) += 1)
    BlobFeatures(b.doc_id, b.bytes.length.toLong, hist.toSeq)
  }

  /** Per-partition feature extraction over payload rows. `mapPartitions`
    * (not per-row map) is deliberate: a real decoder initializes its
    * library once per partition here, then streams the rows through.
    */
  def extractFeatures(payload: Dataset[Blob]): Dataset[BlobFeatures] =
    payload.mapPartitions { it =>
      // (real codec init would happen here, once per partition)
      it.map(fakeDecode)
    }

  /** STUB of the media resize step (bytes → smaller bytes): deterministic
    * decimation to at most `targetBytes` by uniform stride sampling —
    * the stand-in for "decode, scale, re-encode". Runs inside the same
    * per-partition pipeline as [[extractFeatures]], so a real codec
    * shares its per-partition init. Output payloads are bounded, which
    * is the property downstream stages (shuffles, feature batches)
    * depend on at 100 TB.
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
