package graft.operators

import graft.Fp
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star BASELINE.json:6): media
  * payloads travel as opaque `binary` columns with typed metadata;
  * decode / feature-extract runs per-partition in batches — the same
  * shape as the reference's per-partition CNTK image scoring (R19,
  * ipynb:228-268) and of a `mapInPandas` decode on a Python stack.
  *
  * The actual image/audio codecs are NOT in this container, so the
  * decoder is a clearly-marked deterministic stub (`FakeDecoder`); the
  * Spark-side plumbing — binary column, schema, partition batching,
  * typed output — is real and oracle-checked via integer byte math.
  *
  * Scale: payload bytes never shuffle; metadata extraction happens in
  * the scan projection, and the decode stage is a narrow map over
  * pre-pruned columns.
  */
object MultimodalQueries {

  /** Documents-as-media: text re-encoded as a binary payload column
    * with typed metadata (mime, byte length, frame count). */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        lit("text/plain").as("mime"),
        octet_length(col("payload")).as("n_bytes"),
        (octet_length(col("payload")).cast("long") / 256 + 1).cast("int")
          .as("n_frames"))
      .orderBy("doc_id")

  /** STUB decoder — stands in for an image/audio codec that is not in
    * this container. Deterministic fake: "dimensions" and a feature
    * value derived from the leading payload bytes. The signature
    * (bytes in → typed struct out, called once per row inside a
    * per-partition batch loop) is the real contract. */
  object FakeDecoder {
    case class Decoded(height: Int, width: Int, channels: Int, feat: Long)
    def decode(payload: Array[Byte]): Decoded = {
      val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      var featSum = 0L
      var i = 0
      while (i < math.min(16, payload.length)) { featSum += payload(i) & 0xff; i += 1 }
      Decoded(1 + b0 % 4, 1 + b1 % 4, 3, featSum)
    }
  }

  /** Per-partition batch decode over the binary payload column
    * (mapPartitions ≙ mapInPandas batch shape): columns pruned BEFORE
    * the typed boundary, decoder invoked per row inside the partition
    * iterator. Oracle replays the byte math on ASCII code points.
    *
    * ASCII assumption (decode + frames oracles only): Spark slices
    * UTF-8 BYTES while the DuckDB oracle slices CHARACTERS — identical
    * iff the corpus is pure ASCII, which FixtureSpec asserts for the
    * driver's testdata (chars == octets for every document). A
    * non-ASCII corpus needs the oracle rewritten over
    * encode(text)/BLOB octets. */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val d = FakeDecoder.decode(payload)
          (id, d.height, d.width, d.channels, d.feat)
        }
      }
      .toDF("doc_id", "height", "width", "channels", "feat")
      .orderBy("doc_id")
  }

  /** Frame sampling: split each payload into 64-byte "frames", keep
    * every 4th frame, emit per-frame metadata + checksum — the video
    * frame-sample shape (explode payload → per-frame rows) with the
    * same per-partition batch plumbing. The "resize" stub maps frame
    * bytes to fixed 8×8 dims (a real codec call would go here). */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val nFrames = (payload.length + 63) / 64
          (0 until nFrames).filter(_ % 4 == 0).map { f =>
            val frame = payload.slice(f * 64, math.min((f + 1) * 64, payload.length))
            var sum = 0L
            var i = 0
            while (i < frame.length) { sum += frame(i) & 0xff; i += 1 }
            (id, f, frame.length, 8, 8, sum) // 8x8 = resize-stub dims
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "out_h", "out_w", "checksum")
      .orderBy("doc_id", "frame_idx")
  }

  /** RESIZE: the decoded "image" (first 64 payload bytes as an 8×8
    * single-channel pixel grid — the FakeDecoder stand-in for a real
    * codec) is downsampled 2× by average pooling in INTEGER
    * arithmetic: out(py,px) = mean of the 2×2 source block, div 4.
    * Emits one row per output pixel — the tensor-as-rows layout a
    * downstream feature store ingests. Same per-partition batch
    * plumbing as decode/frames; docs shorter than one full image are
    * filtered on BOTH engines (part of the spec). Payload bytes never
    * shuffle — 16 integer pixels per doc leave the partition. */
  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .filter(octet_length(col("payload")) >= 64)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          for { py <- 0 until 4; px <- 0 until 4 } yield {
            def pix(r: Int, c: Int): Long = payload(r * 8 + c) & 0xffL
            val v = (pix(2 * py, 2 * px) + pix(2 * py, 2 * px + 1) +
              pix(2 * py + 1, 2 * px) + pix(2 * py + 1, 2 * px + 1)) / 4
            (id, py, px, v)
          }
        }
      }
      .toDF("doc_id", "py", "px", "v")
      .orderBy("doc_id", "py", "px")
  }

  /** AUDIO-shaped feature extraction: the payload read as a PCM-u8
    * sample stream, cut into OVERLAPPING 256-sample frames at hop 128
    * (the STFT window/hop shape — multimodal_frames' windows are
    * disjoint) and reduced per frame to integer energy Σs² — the RMS
    * proxy a voice-activity / silence-trim pass computes before
    * transcription. Same per-partition batch plumbing as decode/
    * frames; only (doc_id, frame_idx, n_samples, energy) rows leave
    * the partition, never samples. */
  def multimodalAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val nFrames = (payload.length + 127) / 128
          (0 until nFrames).map { f =>
            val from = f * 128
            val until = math.min(from + 256, payload.length)
            var energy = 0L
            var i = from
            while (i < until) {
              val v = (payload(i) & 0xff).toLong; energy += v * v; i += 1
            }
            (id, f, until - from, energy)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_samples", "energy")
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_audio" -> multimodalAudio,
    "multimodal_resize" -> multimodalResize,
    "multimodal_meta" -> multimodalMeta,
    "multimodal_decode" -> multimodalDecode,
    "multimodal_frames" -> multimodalFrames)

  val oracleSql: Map[String, String] = Map(
    // same ASCII chars==octets assumption as decode/frames
    "multimodal_audio" ->
      """SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(length(substr(text, CAST(f * 128 + 1 AS INTEGER), 256))
        |    AS INTEGER) AS n_samples,
        |  CAST(list_sum(list_transform(
        |    regexp_extract_all(substr(text, CAST(f * 128 + 1 AS INTEGER), 256),
        |      '.'),
        |    c -> ascii(c) * ascii(c))) AS BIGINT) AS energy
        |FROM (SELECT doc_id, text,
        |        unnest(range(0, (length(text) + 127) // 128)) AS f
        |      FROM documents) t
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // (FixtureSpec); 1-based substr pos of pixel (r,c) is r*8 + c + 1
    "multimodal_resize" ->
      """SELECT doc_id, CAST(py AS INTEGER) AS py, CAST(px AS INTEGER) AS px,
        |  CAST((ascii(substr(text, CAST(2*py*8 + 2*px + 1 AS INTEGER), 1))
        |      + ascii(substr(text, CAST(2*py*8 + 2*px + 2 AS INTEGER), 1))
        |      + ascii(substr(text, CAST((2*py+1)*8 + 2*px + 1 AS INTEGER), 1))
        |      + ascii(substr(text, CAST((2*py+1)*8 + 2*px + 2 AS INTEGER), 1)))
        |    // 4 AS BIGINT) AS v
        |FROM documents, range(4) t1(py), range(4) t2(px)
        |WHERE octet_length(encode(text)) >= 64
        |ORDER BY doc_id, py, px""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(octet_length(encode(text)) // 256 + 1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(length(substr(text, CAST(f * 64 + 1 AS INTEGER), 64)) AS INTEGER)
        |    AS frame_bytes,
        |  8 AS out_h, 8 AS out_w,
        |  CAST(list_sum(list_transform(
        |    regexp_extract_all(substr(text, CAST(f * 64 + 1 AS INTEGER), 64), '.'),
        |    c -> ascii(c))) AS BIGINT) AS checksum
        |FROM (SELECT doc_id, text,
        |        unnest(range(0, (length(text) + 63) // 64)) AS f
        |      FROM documents) t
        |WHERE f % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin,
    "multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(1 + ascii(substr(text, 1, 1)) % 4 AS INTEGER) AS height,
        |  CAST(1 + CASE WHEN length(text) > 1
        |             THEN ascii(substr(text, 2, 1)) ELSE 0 END % 4 AS INTEGER)
        |    AS width,
        |  3 AS channels,
        |  CAST(list_sum(list_transform(regexp_extract_all(substr(text, 1, 16), '.'),
        |    c -> ascii(c))) AS BIGINT) AS feat
        |FROM documents ORDER BY doc_id""".stripMargin)
}
