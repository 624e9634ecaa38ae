package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (B13): media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` derives
  * deterministic fake features from the bytes (md5-seeded), clearly marked
  * as the stub seam; the Spark-side plumbing — binary schema, batched
  * per-partition mapping, metadata struct shape — is real and tested.
  */
object Multimodal {

  /** Wrap a text corpus as a media table: (doc_id, media: binary, meta). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(lit("text/plain").as("mime"), col("source").as("origin")).as("meta"))

  /** Pure-expression metadata extraction: byte length, content hash, and
    * md5-seeded stand-ins for decoded dimensions (the decode itself is the
    * stub — a real deployment swaps the two fake_* expressions for a codec
    * call inside mapPartitions, see [[decodeStub]]). Fully codegen'd, and
    * reproducible by the DuckDB oracle. */
  def extract(docs: DataFrame): DataFrame = {
    val media = asMedia(docs)
    val h = md5(col("media"))
    media.select(
      col("doc_id"),
      octet_length(col("media")).cast("long").as("n_bytes"),
      h.as("content_hash"),
      (conv(substring(h, 1, 4), 16, 10).cast("long") % 1920).as("fake_width"),
      (conv(substring(h, 5, 4), 16, 10).cast("long") % 1080).as("fake_height"))
  }

  /** ViT-style patch grid over the media payload (B41): fixed-size byte
    * patches (the binary analogue of image patches), capped at
    * `maxPatches` per row — pure codegen'd expressions (substr on binary,
    * hex), no UDF, so a 100 TB patch table is a narrow projection of the
    * media scan. Row expansion is bounded by maxPatches, which is what
    * partition sizing plans around. Hex is lowercased: engines disagree
    * on hex case, not on bytes. */
  def patches(docs: DataFrame, patchBytes: Int = 16, maxPatches: Int = 8): DataFrame = {
    val media = asMedia(docs).filter(octet_length(col("media")) > 0)
    val nPatches = least(
      ceil(octet_length(col("media")) / lit(patchBytes.toDouble)).cast("long"),
      lit(maxPatches.toLong))
    media
      .select(col("doc_id"), col("media"),
        explode(sequence(lit(0L), nPatches - 1)).as("patch_idx"))
      .select(col("doc_id"), col("patch_idx"),
        lower(hex(col("media").substr(
          (col("patch_idx") * patchBytes + 1).cast("int"), lit(patchBytes))))
          .as("patch_hex"),
        octet_length(col("media").substr(
          (col("patch_idx") * patchBytes + 1).cast("int"), lit(patchBytes)))
          .cast("long").as("patch_bytes"))
  }

  /** Audio-style windowed feature extraction (B223): the PCM
    * frame-analysis shape — fixed-width windows at a fixed stride over
    * each media payload, per-window energy / peak / RMS — as pure
    * codegen'd expressions. The DECODE is the stub seam: cleaned-text
    * code points stand in for PCM samples (the container has no audio
    * codec; a real deployment swaps the sample expression for a
    * decoder call and keeps everything downstream). What is real and
    * load-bearing at scale: the bounded 1 → ≤maxWin row expansion that
    * partition sizing plans around, the per-window O(win) fold inside
    * whole-stage codegen, and the exact-integer feature math (energy
    * and Σsample² are longs; only the final RMS divides, rounded 6 dp).
    */
  def audioWindows(docs: DataFrame, win: Int = 32, maxWin: Int = 8): DataFrame = {
    val samples = graft.operators.TextOps.cleanText(col("text"))
    val nWin = least(
      ceil(length(col("txt")) / lit(win.toDouble)).cast("long"), lit(maxWin.toLong))
    docs
      .select(col("doc_id"), samples.as("txt"))
      .filter(length(col("txt")) > 0)
      .select(col("doc_id"), col("txt"),
        explode(sequence(lit(0L), nWin - 1)).as("win_idx"))
      .select(col("doc_id"), col("win_idx"),
        substring(col("txt"), (col("win_idx") * win + 1).cast("int"), lit(win)).as("w"))
      .select(col("doc_id"), col("win_idx"),
        length(col("w")).cast("long").as("n_samples"),
        expr("aggregate(sequence(1, length(w)), 0L, (a, i) -> a + ascii(substring(w, i, 1)))")
          .as("energy"),
        expr("aggregate(sequence(1, length(w)), 0L, (a, i) -> greatest(a, CAST(ascii(substring(w, i, 1)) AS BIGINT)))")
          .as("peak"),
        expr("aggregate(sequence(1, length(w)), 0L, (a, i) -> a + CAST(ascii(substring(w, i, 1)) AS BIGINT) * ascii(substring(w, i, 1)))")
          .as("sq"))
      .select(col("doc_id"), col("win_idx"), col("n_samples"), col("energy"),
        col("peak"),
        round(sqrt(col("sq").cast("double") / col("n_samples")), 6).as("rms"))
  }

  /** Video-style stride frame sampling as a QUERY surface (B281): every
    * `everyNth`-th fixed-size "frame" of the media payload, capped at
    * `maxFrames` sampled frames per row — the keyframe-extraction shape
    * ([[frameSampleStub]]'s mapPartitions seam re-expressed as pure
    * codegen'd expressions so it oracles and plans like [[patches]]).
    * The decode is the stub seam (byte slices stand in for container
    * frames; a real deployment swaps the substr for a demuxer call);
    * what is real at scale: the bounded 1 → ≤maxFrames expansion
    * partition sizing plans around, stride arithmetic on the frame
    * INDEX (so unsampled frames are never materialized), and the
    * content hash per frame for downstream frame-level dedup. */
  def videoFrames(docs: DataFrame, frameBytes: Int = 32, everyNth: Int = 2,
                  maxFrames: Int = 4): DataFrame = {
    val media = asMedia(docs).filter(octet_length(col("media")) > 0)
    val nFrames = ceil(octet_length(col("media")) / lit(frameBytes.toDouble))
      .cast("long")
    val nSampled = least(
      ceil(nFrames / lit(everyNth.toDouble)).cast("long"), lit(maxFrames.toLong))
    media
      .select(col("doc_id"), col("media"), nFrames.as("nf"), nSampled.as("ns"))
      .select(col("doc_id"), col("media"), col("nf"),
        explode(sequence(lit(0L), col("ns") - 1)).as("s"))
      .select(col("doc_id"), (col("s") * everyNth).as("frame_idx"), col("nf"),
        col("media").substr(
          (col("s") * everyNth * frameBytes + 1).cast("int"), lit(frameBytes))
          .as("frame"))
      .select(col("doc_id"), col("frame_idx"), col("nf").as("n_frames_total"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        // md5 of the LOWERCASE HEX, not of the raw bytes: DuckDB's md5
        // only takes VARCHAR and a byte slice of UTF-8 text need not be
        // valid UTF-8 — hex is the engine-neutral byte spelling
        md5(lower(hex(col("frame")))).as("frame_hash"))
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** Partition-batched decode seam: the shape a real codec integration
    * uses (one in-flight batch per partition, no driver collection). The
    * body is the STUB — deterministic fake 4-dim "features" from byte
    * stats instead of an actual image/audio decode. */
  def decodeStub(media: DataFrame): DataFrame =
    media.select("doc_id", "media").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // STUB: stands in for codec.decode(bytes) — deterministic fake.
        val s = bytes.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
        Row(id, bytes.length,
          Array((s % 255).toFloat, (s / 255 % 255).toFloat,
            bytes.length.toFloat, (if (bytes.isEmpty) 0f else bytes.head.toFloat)))
      }
    }(org.apache.spark.sql.Encoders.row(decodedSchema))

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixels", ArrayType(FloatType))))

  /** Resize seam: fixed (w × h) feature grid per media row — the batch
    * shape an image-model preprocessor needs (constant-size tensors per
    * row, schema known up front). The body is the STUB: a deterministic
    * byte-fold stands in for decode+bilinear-resample; the partitioning,
    * signature and output schema are the real contract. */
  def resizeStub(media: DataFrame, w: Int = 4, h: Int = 4): DataFrame =
    media.select("doc_id", "media").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // STUB: stands in for decode(bytes).resize(w, h)
        val px = Array.tabulate(w * h) { i =>
          if (bytes.isEmpty) 0f
          else (bytes(i % bytes.length) & 0xff).toFloat / 255f
        }
        Row(id, w, h, px)
      }
    }(org.apache.spark.sql.Encoders.row(resizedSchema))

  private val framesSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Frame-sample seam: one row per sampled "frame" — media rows EXPAND
    * (1 → n_frames), the shape that matters for partition sizing: at
    * 100 TB the sampled-frame table is planned around frames-per-byte,
    * not rows-in. The STUB slices the payload at a fixed stride instead
    * of decoding a container; flatMap-per-partition, no driver state. */
  def frameSampleStub(media: DataFrame, everyNth: Int = 2, maxFrames: Int = 4): DataFrame =
    media.select("doc_id", "media").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // STUB: stands in for container.frames.zipWithIndex.filter(_._2 % n == 0)
        val frameSize = math.max(1, bytes.length / math.max(1, maxFrames * everyNth))
        val frames = bytes.grouped(frameSize).toSeq
        frames.zipWithIndex.collect {
          case (f, i) if i % everyNth == 0 && i / everyNth < maxFrames =>
            Row(id, i, f)
        }
      }
    }(org.apache.spark.sql.Encoders.row(framesSchema))
}
