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

  /** Internal: 64-bit average-hash (aHash) of the decoded 8×8 pixel
    * grid (first 64 payload bytes — the FakeDecoder image), split into
    * two 32-bit halves so the DuckDB replay never overflows a signed
    * BIGINT power: bit_i = pixel_i·64 > Σpixels (strictly above the
    * mean), lo = bits 0–31, hi = bits 32–63. Per-partition batch map,
    * same plumbing as decode — only (doc_id, 2×long) leaves the
    * partition, never pixels. */
  private def phashDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .filter(octet_length(col("payload")) >= 64)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          var sum = 0L
          var i = 0
          while (i < 64) { sum += payload(i) & 0xffL; i += 1 }
          var lo = 0L
          var hi = 0L
          i = 0
          while (i < 32) { if ((payload(i) & 0xffL) * 64L > sum) lo |= 1L << i; i += 1 }
          while (i < 64) { if ((payload(i) & 0xffL) * 64L > sum) hi |= 1L << (i - 32); i += 1 }
          (id, hi, lo)
        }
      }
      .toDF("doc_id", "phash_hi", "phash_lo")
  }

  /** Perceptual image fingerprint: the aHash every image-dedup pipeline
    * computes right after decode. One row per image; downstream joins
    * (dedup_image) group on the hash, so the 100 TB of pixels reduce to
    * 16 bytes per image before any shuffle. */
  def multimodalPhash(s: SparkSession, dir: String): DataFrame =
    phashDf(s, dir).orderBy("doc_id")

  /** Image NEAR-dedup at scale: LSH over the perceptual hash. The
    * 64-bit aHash splits into four 16-bit bands; images sharing any
    * band are candidates (an r-bit Hamming ball always shares one of
    * r+1 bands for r ≤ 3, and empirically far beyond); candidates are
    * verified with the exact Hamming distance (bit_count of xor) ≤ 8.
    * A band-bucket population cap (2..64) bounds the within-bucket
    * pair blowup from boilerplate images, the same guard as
    * dedup_substring's df cap — so the shuffle key is the BAND, never
    * an all-pairs join, and each bucket's work is O(cap²) — the
    * MinHash-band pattern applied to the image modality. Oracle
    * replays hash, banding, cap and verify exactly. */
  def dedupImage(s: SparkSession, dir: String): DataFrame = {
    val ph = phashDf(s, dir)
    val bands = ph.select(col("doc_id"), col("phash_hi"), col("phash_lo"),
        posexplode(array(
          col("phash_lo").bitwiseAND(lit(65535L)),
          shiftrightunsigned(col("phash_lo"), 16).bitwiseAND(lit(65535L)),
          col("phash_hi").bitwiseAND(lit(65535L)),
          shiftrightunsigned(col("phash_hi"), 16).bitwiseAND(lit(65535L)))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val buckets = bands.groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn").between(2, 64))
      .select("band_idx", "band_val")
    val capped = bands.join(buckets, Seq("band_idx", "band_val"))
    val a = capped.select(col("band_idx"), col("band_val"),
      col("doc_id").as("doc_a"), col("phash_hi").as("hi_a"), col("phash_lo").as("lo_a"))
    val b = capped.select(col("band_idx"), col("band_val"),
      col("doc_id").as("doc_b"), col("phash_hi").as("hi_b"), col("phash_lo").as("lo_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (expr("bit_count(lo_a ^ lo_b)") + expr("bit_count(hi_a ^ hi_b)"))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_phash" -> multimodalPhash,
    "dedup_image" -> dedupImage,
    "multimodal_audio" -> multimodalAudio,
    "multimodal_resize" -> multimodalResize,
    "multimodal_meta" -> multimodalMeta,
    "multimodal_decode" -> multimodalDecode,
    "multimodal_frames" -> multimodalFrames)

  /** Shared oracle CTE: replays the aHash byte math on ASCII code
    * points (chars==octets asserted by FixtureSpec), bit i via
    * 1::BIGINT << shift so no signed-power overflow. */
  private val phashCte: String =
    """WITH px AS (SELECT doc_id,
      |    list_transform(regexp_extract_all(substr(text, 1, 64), '.'),
      |      c -> ascii(c)) AS p
      |  FROM documents WHERE octet_length(encode(text)) >= 64),
      |s AS (SELECT doc_id, p, CAST(list_sum(p) AS BIGINT) AS total FROM px),
      |ph AS (SELECT doc_id,
      |    CAST(list_sum(list_transform(generate_series(1, 32),
      |      i -> CASE WHEN p[i] * 64 > total
      |           THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT)
      |      AS phash_lo,
      |    CAST(list_sum(list_transform(generate_series(33, 64),
      |      i -> CASE WHEN p[i] * 64 > total
      |           THEN (1::BIGINT << (i - 33)) ELSE 0 END)) AS BIGINT)
      |      AS phash_hi
      |  FROM s)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "multimodal_phash" ->
      s"""$phashCte
         |SELECT doc_id, phash_hi, phash_lo FROM ph ORDER BY doc_id""".stripMargin,
    "dedup_image" ->
      s"""$phashCte,
         |bands AS (SELECT doc_id, phash_hi, phash_lo, b.band_idx, b.band_val
         |  FROM ph, LATERAL (SELECT
         |    unnest(range(4)) AS band_idx,
         |    unnest([phash_lo & 65535, (phash_lo >> 16) & 65535,
         |            phash_hi & 65535, (phash_hi >> 16) & 65535]) AS band_val) b),
         |bk AS (SELECT band_idx, band_val FROM bands
         |  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 64),
         |cb AS (SELECT bands.* FROM bands JOIN bk USING (band_idx, band_val)),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(bit_count(xor(a.phash_lo, b.phash_lo))
         |       + bit_count(xor(a.phash_hi, b.phash_hi)) AS BIGINT) AS hamming
         |  FROM cb a JOIN cb b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |   AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs
         |WHERE hamming <= 8 ORDER BY doc_a, doc_b""".stripMargin,
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
