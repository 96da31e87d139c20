package graft.multimodal

/** A REAL image codec for the binary-payload pipeline: PPM "P6"
  * (portable pixmap), the classic dependency-free raster format —
  * ASCII header `P6\n<w> <h>\n255\n` followed by `w*h` RGB byte
  * triples. Unlike [[MultimodalOps.FakeCodec]] (the declared stand-in
  * for codecs this container doesn't ship), every byte here is parsed
  * and produced for real: the decoder reads the actual header and
  * pixel planes, and resize resamples DECODED pixels
  * (nearest-neighbor) before re-encoding. It slots into the same
  * mapPartitions plumbing — payload in, payload/stats out — proving
  * the Spark-side schema/batch design carries a genuine codec, not
  * just the stub.
  *
  * All methods are driver-free, allocation-tight, and deterministic —
  * safe inside executor loops.
  */
object PpmCodec {

  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    def r(x: Int, y: Int): Int = pixels(3 * (y * width + x)) & 0xff
    def g(x: Int, y: Int): Int = pixels(3 * (y * width + x) + 1) & 0xff
    def b(x: Int, y: Int): Int = pixels(3 * (y * width + x) + 2) & 0xff
  }

  /** Encode RGB planes produced by `pixel(x, y) => (r, g, b)`. */
  def encode(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
        i += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a P6 payload: magic, whitespace-separated dims, maxval,
    * then the pixel plane. Fails loudly on anything malformed — a
    * corrupt payload in a 100 TB lake should surface, not silently
    * decode to garbage.
    */
  def decode(payload: Array[Byte]): Image = {
    var i = 0
    def skipSpace(): Unit = {
      while (i < payload.length &&
        (payload(i) == ' ' || payload(i) == '\n' ||
          payload(i) == '\r' || payload(i) == '\t')) i += 1
      // PPM comments run # to end-of-line
      if (i < payload.length && payload(i) == '#') {
        while (i < payload.length && payload(i) != '\n') i += 1
        skipSpace()
      }
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
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      "not a P6 ppm payload")
    i = 2
    val w = int()
    val h = int()
    val maxval = int()
    require(maxval == 255, s"unsupported maxval $maxval")
    i += 1 // the single whitespace byte after maxval
    require(payload.length - i >= 3 * w * h,
      s"truncated pixel plane: need ${3 * w * h}, have ${payload.length - i}")
    val px = java.util.Arrays.copyOfRange(payload, i, i + 3 * w * h)
    Image(w, h, px)
  }

  /** Per-channel pixel sums — the decode-audit statistic (exact
    * integers, so an oracle can recompute them independently).
    */
  def channelSums(img: Image): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var p = 0
    while (p < img.pixels.length) {
      sr += img.pixels(p) & 0xff
      sg += img.pixels(p + 1) & 0xff
      sb += img.pixels(p + 2) & 0xff
      p += 3
    }
    (sr, sg, sb)
  }

  /** Nearest-neighbor resample of the DECODED pixels to w2 x h2,
    * re-encoded as P6: source pixel of (x2, y2) is
    * (x2*w div w2, y2*h div h2) — the integer convention an oracle can
    * mirror exactly.
    */
  def resize(img: Image, w2: Int, h2: Int): Array[Byte] =
    encode(w2, h2, (x2, y2) => {
      val sx = x2 * img.width / w2
      val sy = y2 * img.height / h2
      (img.r(sx, sy), img.g(sx, sy), img.b(sx, sy))
    })
}
