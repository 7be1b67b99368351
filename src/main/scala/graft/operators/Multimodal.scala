package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `BINARY` columns with typed metadata, processed in batched
  * per-partition passes.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic stub ([[stubDecode]]) — the Spark-side
  * contract (schema, batching, partition-local processing, metadata
  * extraction) is real and tested. In production the stub body is
  * replaced by a JNI/codec call with the same signature; nothing else
  * changes.
  *
  * Scale notes: payload bytes never shuffle — metadata is extracted in
  * a map stage, and any join/dedup downstream operates on the extracted
  * (hash, width, height, …) columns only. That is the 100 TB-safe
  * shape: move fingerprints, not media.
  */
object Multimodal {

  /** Media row schema: id + mime + opaque payload. mime is nullable
    * for the same reason payload is: a payloadless row (NULL source
    * text) has no bytes to sniff a type from. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  /** Schema of the decoded-feature struct. */
  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("content_md5", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Build a media table from the documents table by treating the text
    * bytes as an opaque payload — gives the harness a deterministic
    * binary column without external fixtures. */
  def mediaFromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      concat(lit("application/x-demo-"),
        substring(md5(col(textCol)), 1, 4)).as("mime"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decode: a real implementation calls the codec here. The stub
    * derives deterministic pseudo-dimensions from the payload's md5 —
    * the SAME derivation as the column-level [[extractFeatures]]
    * (first 4 hex nibbles → width, next 4 → height), so the two decode
    * paths agree on every row: a pipeline that plans resizes from
    * extracted metadata and executes them partition-locally sees one
    * set of dimensions, not two. */
  def stubDecode(payload: Array[Byte]): (Int, Int) = {
    // ??? <- real codec call goes here (e.g. ImageIO/ffmpeg via JNI)
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val w = ((d(0) & 0xff) << 8 | (d(1) & 0xff)) % 1024 + 64
    val h = ((d(2) & 0xff) << 8 | (d(3) & 0xff)) % 1024 + 64
    (w, h)
  }

  /** Extract features per media row. Metadata (length, md5) is computed
    * with codegen'd built-ins; the stubbed decode runs partition-local
    * via a deterministic expression pipeline mirroring what a
    * `mapPartitions` batch decode would produce. */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("mime"),
      length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("content_md5"),
      // stub pseudo-dimensions, portable arithmetic (md5-derived)
      (conv(substring(md5(col("payload")), 1, 4), 16, 10).cast("int") % 1024 + 64).as("width"),
      (conv(substring(md5(col("payload")), 5, 4), 16, 10).cast("int") % 1024 + 64).as("height"))

  /** STUB resize: a real implementation re-encodes via the codec. The
    * stub derives a deterministic payload of plausible size (scaled by
    * target/source pixel ratio) so byte-accounting and downstream
    * dedup-on-resized-hash are exercised. */
  def stubResize(payload: Array[Byte], srcW: Int, srcH: Int, dstW: Int, dstH: Int): Array[Byte] = {
    // ??? <- real codec re-encode goes here
    val ratio = (dstW.toLong * dstH).toDouble / (srcW.toLong * srcH)
    val n = Math.max(16, (payload.length * ratio).toInt)
    java.util.Arrays.copyOf(payload, n)
  }

  /** Batched partition-local resize — one codec context per partition,
    * payloads streamed through it; the output keeps BINARY payloads
    * partition-local (no shuffle touches media bytes).
    * @return (media_id, mime, width, height, payload) at target dims */
  def resizePartitioned(
      media: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("mime", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.mapPartitions { rows =>
      // per-partition codec context opens here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        // NULL payload (schema allows it) resizes to NULL, not an NPE —
        // one poisoned row must not kill the partition's task
        val resized = if (payload == null) null else {
          val (w, h) = stubDecode(payload)
          stubResize(payload, w, h, dstW, dstH)
        }
        Row(r.getAs[Long]("media_id"), r.getAs[String]("mime"),
          dstW, dstH, resized)
      }
    }(enc)
  }

  /** Frame sampling for video-shaped payloads: the stub derives a
    * deterministic frame count from the payload, then every `everyNth`
    * frame (up to `maxFrames`) is emitted as its own row — the
    * one-row→N-rows explode shape a real extractor uses, with frame
    * payloads cut partition-local from the source bytes.
    * @return (media_id, frame_idx, frame_md5, frame_bytes) */
  def frameSample(
      media: DataFrame, everyNth: Int = 10, maxFrames: Int = 8): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("frame_idx", IntegerType),
      StructField("frame_md5", StringType), StructField("frame_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.mapPartitions { rows =>
      rows.filter(_.getAs[Array[Byte]]("payload") != null).flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        // ??? <- real demuxer frame count; stub: one "frame" per 32 bytes
        // (NULL payloads yield zero frames — no content, no explode)
        val nFrames = Math.max(1, payload.length / 32)
        val md = java.security.MessageDigest.getInstance("MD5")
        (0 until nFrames by everyNth).take(maxFrames).map { i =>
          val from = Math.min(i * 32, payload.length)
          val until = Math.min(from + 32, payload.length)
          val frame = java.util.Arrays.copyOfRange(payload, from, until)
          Row(r.getAs[Long]("media_id"), i,
            md.digest(frame).map("%02x".format(_)).mkString, frame.length.toLong)
        }
      }
    }(enc)
  }

  /** Batched partition-local decode using the typed stub — the real
    * `mapPartitions` shape a codec integration uses (one codec context
    * per partition, rows streamed through it). NULL payloads decode to
    * NULL features, mirroring [[extractFeatures]] (whose md5/length
    * built-ins are NULL-propagating) instead of NPE-ing the task. */
  def decodePartitioned(media: DataFrame): DataFrame = {
    val out = StructType(mediaSchema.fields.filterNot(_.name == "payload") ++ featureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.mapPartitions { rows =>
      // per-partition "codec context" would be opened here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        if (payload == null)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("mime"),
            null, null, null, null)
        else {
          val (w, h) = stubDecode(payload)
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(payload).map("%02x".format(_)).mkString
          Row(r.getAs[Long]("media_id"), r.getAs[String]("mime"),
            payload.length.toLong, md, w, h)
        }
      }
    }(enc)
  }
}
