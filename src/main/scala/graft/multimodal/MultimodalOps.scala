package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) pipeline plumbing.
  *
  * Media are opaque `binary` payloads plus typed metadata columns —
  * the layout a 100 TB training-data lake uses (payload bytes next to
  * queryable width/height/frame-count columns, so filters prune on
  * metadata without touching bytes). Decode/feature-extraction runs
  * per partition over the payload iterator (`mapPartitions`): one
  * buffer allocation per partition, rows streamed through it — the
  * JVM analog of Arrow-batch UDF processing, and the designated
  * escape hatch for genuinely imperative per-row byte work
  * (SURVEY.md §7.3).
  *
  * ==STUB boundary==
  * This container ships no image/audio codec LIBRARIES, so
  * [[FakeCodec]] is a clearly-marked deterministic stand-in: it
  * "decodes" payload bytes by chunk-averaging them into a fixed-dim
  * float vector. A real deployment swaps FakeCodec for
  * javax.imageio / ffmpeg bindings without touching any Spark-side
  * code — schema, partitioning, and batch shape are identical.
  * [[PpmCodec]] proves that claim with a REAL dependency-free codec
  * (P6 pixmap: genuine header parse, pixel-plane decode,
  * nearest-neighbor resize on decoded pixels) running through the
  * same mapPartitions plumbing, driver-gated by q217.
  */
object MultimodalOps {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaFile(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  /** Deterministic stand-in for the real codec (STUB — see scaladoc). */
  object FakeCodec {
    /** "Decode" payload → dim-length feature vector: mean byte value
      * per contiguous chunk, scaled to [0, 1). Deterministic in the
      * payload alone.
      */
    def features(payload: Array[Byte], dim: Int, buf: Array[Float]): Array[Float] = {
      val n = payload.length
      var i = 0
      while (i < dim) {
        val lo = (n.toLong * i / dim).toInt
        val hi = math.max((n.toLong * (i + 1) / dim).toInt, lo + 1)
        var sum = 0L
        var j = lo
        while (j < math.min(hi, n)) { sum += payload(j) & 0xff; j += 1 }
        buf(i) = if (hi > lo && lo < n) sum.toFloat / ((math.min(hi, n) - lo) * 256f) else 0f
        i += 1
      }
      buf.clone()
    }

    /** "Resize": deterministic payload rewrite to the target pixel
      * count (real impl: decoded-pixel resampling).
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(w * h / 64, 1))
      var i = 0
      while (i < out.length) {
        out(i) = payload(((i.toLong * payload.length) / out.length).toInt % payload.length)
        i += 1
      }
      out
    }

    /** "Frame sample": slice the payload into n equal byte windows
      * (real impl: keyframe extraction).
      */
    def frame(payload: Array[Byte], idx: Int, of: Int): Array[Byte] = {
      val len = math.max(payload.length / of, 1)
      val lo = math.min(idx * len, math.max(payload.length - 1, 0))
      payload.slice(lo, math.min(lo + len, payload.length))
    }
  }

  /** Derive a deterministic fake media corpus from the documents table
    * (payload = text bytes; kind/shape metadata hashed from doc_id).
    * Real pipelines read `binaryFile` sources or parquet with a binary
    * column — the downstream ops only see the schema, not the origin.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaFile] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id") * 37, lit(512)) + 16).cast("int").as("width"),
        (pmod(col("doc_id") * 53, lit(512)) + 16).cast("int").as("height"),
        (pmod(col("doc_id"), lit(8)) + 1).cast("int").as("n_frames"))
      .as[MediaFile]
  }

  /** Per-partition feature extraction: one scratch buffer per
    * partition, rows streamed through the codec. Output keeps the
    * metadata columns so downstream joins never re-read payloads.
    */
  def extractFeatures(media: Dataset[MediaFile], dim: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val buf = new Array[Float](dim) // per-partition batch buffer
      it.map(m => (m.media_id, m.kind, m.payload.length.toLong,
        FakeCodec.features(m.payload, dim, buf)))
    }.toDF("media_id", "kind", "n_bytes", "features")
  }

  /** Metadata-pruned resize: only rows failing the size predicate pay
    * the codec; the filter prunes on metadata columns alone.
    */
  def resizeTo(media: Dataset[MediaFile], maxW: Int, maxH: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.width <= maxW && m.height <= maxH) m
      else {
        val w = math.min(m.width, maxW)
        val h = math.min(m.height, maxH)
        m.copy(payload = FakeCodec.resize(m.payload, w, h), width = w, height = h)
      }
    }
  }

  /** Explode videos into per-frame rows (media_id, frame_idx, frame
    * bytes): the fan-out op a frame-level training pipeline starts
    * from. Non-videos pass through as a single frame.
    */
  def sampleFrames(media: Dataset[MediaFile]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = if (m.kind == "video") m.n_frames else 1
      (0 until n).iterator.map(i =>
        (m.media_id, m.kind, i, FakeCodec.frame(m.payload, i, n)))
    }.toDF("media_id", "kind", "frame_idx", "frame")
  }
}
