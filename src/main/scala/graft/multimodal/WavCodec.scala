package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL audio codec for the binary-payload pipeline: RIFF/WAVE with
  * 16-bit mono PCM — like [[PpmCodec]], every byte is produced and
  * parsed for real (RIFF container walk, fmt chunk validation,
  * little-endian sample plane), driver-gated by q218 against an oracle
  * that recomputes the same exact-integer statistics independently.
  * Decimation resamples the DECODED samples with an integer stride —
  * the keep-every-kth convention an oracle can mirror.
  */
object WavCodec {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Encode mono 16-bit PCM into a canonical RIFF/WAVE payload. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE payload: container magic, chunk walk (unknown
    * chunks skipped, as the format requires), PCM format validation,
    * sample plane. Fails loudly on corruption.
    */
  def decode(payload: Array[Byte]): Audio = {
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(payload.length >= 12 && tag() == "RIFF", "not a RIFF payload")
    buf.getInt // container size
    require(tag() == "WAVE", "not a WAVE form")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = tag()
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(), s"bad chunk '$id' length $len")
      id match {
        case "fmt " =>
          val fmt = buf.getShort
          val channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          require(fmt == 1 && channels == 1 && bits == 16,
            s"unsupported wav format (fmt=$fmt ch=$channels bits=$bits)")
          buf.position(buf.position() + (len - 16))
        case "data" =>
          require(len % 2 == 0, s"odd PCM data length $len")
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ => // unknown chunk: skip (pad byte on odd length)
          buf.position(buf.position() + len + (len % 2))
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    Audio(sampleRate, samples)
  }

  /** (sum |sample|, peak |sample|) — exact-integer audit statistics. */
  def absStats(a: Audio): (Long, Long) = {
    var sum = 0L
    var peak = 0L
    var i = 0
    while (i < a.samples.length) {
      val v = math.abs(a.samples(i).toLong)
      sum += v
      if (v > peak) peak = v
      i += 1
    }
    (sum, peak)
  }

  /** Keep every k-th decoded sample (integer-stride decimation),
    * re-encoded at the correspondingly reduced rate.
    */
  def decimate(a: Audio, k: Int): Array[Byte] = {
    require(k > 0, s"stride must be positive, got $k")
    val out = new Array[Short]((a.samples.length + k - 1) / k)
    var i = 0
    while (i < out.length) { out(i) = a.samples(i * k); i += 1 }
    encode(math.max(a.sampleRate / k, 1), out)
  }
}
