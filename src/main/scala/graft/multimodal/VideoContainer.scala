package graft.multimodal

/** A REAL multi-frame container for the binary-payload pipeline: a
  * "video" is concatenated P6 frames (the moral equivalent of
  * MJPEG-in-AVI without the index chatter — dependency-free, byte-
  * exact). [[split]] does genuine container demux: it parses each
  * frame's P6 header (magic, dims, maxval — the same grammar
  * [[PpmCodec.decode]] enforces) to compute that frame's byte extent,
  * slices it out, and advances; a truncated or corrupt frame fails
  * loudly mid-container instead of shearing into garbage frames.
  * Frame payloads then ride the ordinary [[PpmCodec]] path, so every
  * downstream per-frame feature (aHash, resize) is computed from
  * REALLY decoded pixels.
  *
  * Driver-free and allocation-tight — safe inside executor loops.
  */
object VideoContainer {

  /** Concatenate already-encoded P6 frames into one payload. */
  def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](frames.map(_.length).sum)
    var off = 0
    frames.foreach { f =>
      System.arraycopy(f, 0, out, off, f.length)
      off += f.length
    }
    out
  }

  /** Demux a container into its frame payloads by parsing each P6
    * header for the frame's pixel-block extent.
    */
  def split(payload: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    while (off < payload.length) {
      var i = off
      def skipSpace(): Unit = {
        while (i < payload.length &&
          (payload(i) == ' ' || payload(i) == '\n' ||
            payload(i) == '\r' || payload(i) == '\t')) i += 1
      }
      def int(): Int = {
        skipSpace()
        var v = 0
        val start = i
        while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
          v = v * 10 + (payload(i) - '0')
          i += 1
        }
        require(i > start, s"expected integer at offset $start")
        v
      }
      require(i + 1 < payload.length &&
        payload(i) == 'P' && payload(i + 1) == '6',
        s"frame at offset $off is not a P6 payload")
      i += 2
      val w = int()
      val h = int()
      val maxval = int()
      require(maxval == 255, s"unsupported maxval $maxval at offset $off")
      i += 1 // the single whitespace byte after maxval
      val end = i + 3 * w * h
      require(end <= payload.length,
        s"truncated frame at offset $off (needs $end of ${payload.length})")
      out += java.util.Arrays.copyOfRange(payload, off, end)
      off = end
    }
    out.result()
  }
}
