package graft

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{FakeCodec, MediaFile}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private def media = MultimodalOps.mediaFromDocuments(
    Tables.t(spark, "/root/testdata/sf0.001", "documents"))

  test("media derivation yields opaque payload + typed metadata schema") {
    val df = media.toDF()
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("width").dataType.typeName == "integer")
    assert(media.count() == 500)
    val kinds = media.toDF().select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and fixed-dim") {
    import spark.implicits._
    val f1 = MultimodalOps.extractFeatures(media, dim = 16)
      .orderBy($"media_id").collect()
    val f2 = MultimodalOps.extractFeatures(media, dim = 16)
      .orderBy($"media_id").collect()
    def feats(r: org.apache.spark.sql.Row): Seq[Float] =
      r.getSeq[Float](r.fieldIndex("features"))
    assert(f1.length == 500)
    assert(f1.forall(feats(_).length == 16))
    assert(f1.map(feats).toSeq == f2.map(feats).toSeq)
    // features are chunk means of unsigned bytes scaled to [0,1)
    assert(f1.flatMap(feats).forall(v => v >= 0f && v < 1f))
    // n_bytes carries the payload length so downstream never re-reads bytes
    assert(f1.forall(_.getAs[Long]("n_bytes") > 0L))
  }

  test("resize clamps metadata and rewrites only oversized payloads") {
    import spark.implicits._
    val out = MultimodalOps.resizeTo(media, 128, 128)
    assert(out.filter($"width" > 128 || $"height" > 128).count() == 0)
    // rows already within bounds keep their payload byte-for-byte
    val before = media.filter($"width" <= 128 && $"height" <= 128)
      .collect().map(m => m.media_id -> m.payload.toSeq).toMap
    val after = out.collect().map(m => m.media_id -> m.payload.toSeq).toMap
    assert(before.forall { case (id, p) => after(id) == p })
  }

  test("frame sampling fans out videos by n_frames, others to one frame") {
    import spark.implicits._
    val frames = MultimodalOps.sampleFrames(media)
    val perMedia = frames.groupBy($"media_id", $"kind")
      .count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val meta = media.collect().map(m => m.media_id -> m).toMap
    perMedia.foreach { case (id, kind, n) =>
      if (kind == "video") assert(n == meta(id).n_frames)
      else assert(n == 1)
    }
  }

  test("codec stub handles degenerate payloads") {
    val empty = FakeCodec.features(Array.emptyByteArray, 4, new Array[Float](4))
    assert(empty.toSeq == Seq(0f, 0f, 0f, 0f))
    assert(FakeCodec.frame(Array.emptyByteArray, 0, 1).isEmpty)
    val one = FakeCodec.features(Array[Byte](127), 4, new Array[Float](4))
    assert(one(0) == 127f / 256f)
  }

  test("PpmCodec round-trips P6 bytes, honors comments, rejects corruption") {
    import graft.multimodal.PpmCodec
    val img0 = PpmCodec.decode(PpmCodec.encode(3, 2,
      (x, y) => (x * 10, y * 20, x + y)))
    assert(img0.width == 3 && img0.height == 2)
    assert(img0.r(2, 0) == 20 && img0.g(1, 1) == 20 && img0.b(2, 1) == 3)
    // a header comment (the format allows them) parses
    val withComment =
      "P6\n# generated\n2 1\n255\n".getBytes("US-ASCII") ++
        Array[Byte](1, 2, 3, 4, 5, 6)
    val img1 = PpmCodec.decode(withComment)
    assert(img1.width == 2 && img1.r(1, 0) == 4)
    // corruption fails loudly, never decodes to garbage
    intercept[IllegalArgumentException](
      PpmCodec.decode("P5\n1 1\n255\n ".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      PpmCodec.decode("P6\n4 4\n255\nxx".getBytes("US-ASCII")))
  }

  test("PpmCodec resize resamples decoded pixels nearest-neighbor") {
    import graft.multimodal.PpmCodec
    // 4x4 image whose red channel encodes the source x coordinate
    val img = PpmCodec.decode(PpmCodec.encode(4, 4, (x, y) => (x, y, 0)))
    val half = PpmCodec.decode(PpmCodec.resize(img, 2, 2))
    // target (x2, y2) samples source (x2*4/2, y2*4/2) = (2*x2, 2*y2)
    assert(half.width == 2 && half.height == 2)
    assert(half.r(0, 0) == 0 && half.r(1, 0) == 2)
    assert(half.g(0, 1) == 2 && half.g(1, 1) == 2)
    // upscale repeats source pixels (8/4 -> each source twice)
    val up = PpmCodec.decode(PpmCodec.resize(img, 8, 8))
    assert(up.r(0, 0) == 0 && up.r(1, 0) == 0 && up.r(2, 0) == 1)
  }

  test("WavCodec round-trips PCM, skips unknown chunks, rejects corruption") {
    import graft.multimodal.WavCodec
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val a = WavCodec.decode(WavCodec.encode(44100, samples))
    assert(a.sampleRate == 44100 && a.samples.toSeq == samples.toSeq)
    val (sum, peak) = WavCodec.absStats(a)
    assert(sum == 0L + 100 + 100 + 32767 + 32768 + 7 && peak == 32768)
    // an unknown chunk before fmt/data is skipped per the RIFF spec
    val enc = WavCodec.encode(8000, samples)
    val extra = java.nio.ByteBuffer.allocate(enc.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(enc, 0, 12) // RIFF header + WAVE
    extra.put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII"))
    extra.put(enc, 12, enc.length - 12)
    val b = WavCodec.decode(extra.array())
    assert(b.sampleRate == 8000 && b.samples.length == samples.length)
    // decimation keeps every k-th decoded sample at the reduced rate
    val d = WavCodec.decode(WavCodec.decimate(a, 2))
    assert(d.samples.toSeq == Seq[Short](0, -100, -32768) &&
      d.sampleRate == 22050)
    intercept[IllegalArgumentException](
      WavCodec.decode("RIFX1234WAVE".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      WavCodec.decode(WavCodec.encode(8000, samples).take(20)))
  }

  test("aHash is stable under re-encode and uniform brightness shift") {
    import graft.multimodal.PpmCodec
    def ahash(px: (Int, Int) => (Int, Int, Int)): String = {
      val img = PpmCodec.decode(PpmCodec.encode(16, 16, px))
      val bsum = Array.ofDim[Long](64)
      var total = 0L
      for (y <- 0 until 16; x <- 0 until 16) {
        val g = (img.r(x, y) + img.g(x, y) + img.b(x, y)).toLong
        bsum((y / 2) * 8 + x / 2) += g; total += g
      }
      new String(bsum.map(s => if (s * 64 > total) '1' else '0'))
    }
    val base = (x: Int, y: Int) =>
      ((x * 7 + y * 13) % 200, (x * 3 + y * 5) % 200, (x + y * 2) % 200)
    // byte-identical re-encode → identical hash
    assert(ahash(base) == ahash(base))
    // +10 uniform brightness (no clamping at <=209): every block sum
    // and the mean shift equally, so all threshold bits survive — the
    // robustness that makes aHash a near-dup key, not an exact hash
    val brighter = (x: Int, y: Int) => {
      val (r, g, b) = base(x, y); (r + 10, g + 10, b + 10)
    }
    assert(ahash(base) == ahash(brighter))
    // structural change flips bits: transposing the gradient must not
    // produce the same fingerprint
    val transposed = (x: Int, y: Int) => base(y, x)
    assert(ahash(base) != ahash(transposed))
  }
}
