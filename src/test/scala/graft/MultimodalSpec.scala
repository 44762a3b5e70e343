package graft

import graft.ops.Multimodal

/** Pins the real image codecs behind mm01/mm03: byte-level format checks
  * against hand-computed fixtures, round-trip identity, and the
  * tamper-sensitivity that gives the pixel-stat certificate its teeth. */
class MultimodalSpec extends SparkSuite {

  test("BMP encoder writes the canonical 24-bit header and padded rows") {
    val docId = 2L // even → BMP; w = 6, h = 5
    val w = Multimodal.widthOf(docId); val h = Multimodal.heightOf(docId)
    assert(w == 6 && h == 5)
    val bytes = Multimodal.encodeImage(docId)
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    val rowSize = ((3 * w + 3) / 4) * 4 // 6px → 18 B data + 2 B pad = 20
    assert(rowSize == 20)
    assert(b.getInt(2) == 54 + rowSize * h)   // file size
    assert(b.getInt(10) == 54)                // pixel data offset
    assert(b.getInt(18) == w && b.getInt(22) == h)
    assert(b.getShort(28) == 24 && b.getInt(30) == 0)
    // bottom-up: first stored row is image row h-1; BGR order
    assert((bytes(54) & 0xff) == Multimodal.pixelB(docId, 0, h - 1))
    assert((bytes(55) & 0xff) == Multimodal.pixelG(docId, 0, h - 1))
    assert((bytes(56) & 0xff) == Multimodal.pixelR(docId, 0, h - 1))
    assert(bytes.length == 54 + rowSize * h)
  }

  test("PPM encoder writes the canonical P6 header and top-down RGB") {
    val docId = 3L // odd → PPM; w = 7, h = 6
    val w = Multimodal.widthOf(docId); val h = Multimodal.heightOf(docId)
    val bytes = Multimodal.encodeImage(docId)
    val header = s"P6\n$w $h\n255\n"
    assert(new String(bytes.take(header.length), "US-ASCII") == header)
    assert(bytes.length == header.length + 3 * w * h)
    val o = header.length
    assert((bytes(o) & 0xff) == Multimodal.pixelR(docId, 0, 0))
    assert((bytes(o + 1) & 0xff) == Multimodal.pixelG(docId, 0, 0))
    assert((bytes(o + 2) & 0xff) == Multimodal.pixelB(docId, 0, 0))
  }

  test("decode round-trips the generator stats for both formats") {
    for (docId <- 0L to 25L) {
      val w = Multimodal.widthOf(docId); val h = Multimodal.heightOf(docId)
      var sr = 0L; var sg = 0L; var sb = 0L; var mr = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val r = Multimodal.pixelR(docId, x, y)
        sr += r; sg += Multimodal.pixelG(docId, x, y); sb += Multimodal.pixelB(docId, x, y)
        mr += (y.toLong * w + x) * r
      }
      val m = Multimodal.decodeImage(Multimodal.encodeImage(docId))
      assert(m.width == w && m.height == h && m.channels == 3)
      assert(m.format == (if (docId % 2 == 0) "bmp" else "ppm"))
      assert(m.nPixels == w.toLong * h)
      assert((m.sumR, m.sumG, m.sumB, m.momR) == ((sr, sg, sb, mr)),
        s"doc $docId stats mismatch")
    }
  }

  test("the moment stat catches an unflipped BMP (orientation teeth)") {
    // decode a BMP whose rows we deliberately DON'T flip: plain sums
    // survive (sum is orientation-invariant) but the moment must differ
    val docId = 4L
    val h = Multimodal.heightOf(docId); val w = Multimodal.widthOf(docId)
    val good = Multimodal.decodeImage(Multimodal.encodeImage(docId))
    // vertically flip the stored pixel rows in place → decoder sees a
    // top-down payload it believes is bottom-up
    val bytes = Multimodal.encodeImage(docId)
    val rowSize = ((3 * w + 3) / 4) * 4
    val flipped = bytes.clone()
    for (row <- 0 until h) {
      System.arraycopy(bytes, 54 + row * rowSize,
        flipped, 54 + (h - 1 - row) * rowSize, rowSize)
    }
    val bad = Multimodal.decodeImage(flipped)
    assert(bad.sumR == good.sumR && bad.sumG == good.sumG && bad.sumB == good.sumB)
    assert(bad.momR != good.momR)
  }

  test("decoder rejects unknown magic and unsupported depths") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(Array[Byte]('G', 'I', 'F', '8'))
    }
    intercept[IllegalArgumentException] {
      val b = Multimodal.encodeImage(2L)
      b(28) = 8 // claim 8 bpp
      Multimodal.decodeImage(b)
    }
  }

  test("WAV: canonical header, round-trip stats, chunk-walker skips unknown chunks") {
    val docId = 5L
    val n = Multimodal.nSamplesOf(docId)
    val bytes = Multimodal.encodeWav(docId)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    assert(bytes.length == 44 + 2 * n)
    var sum = 0L; var sabs = 0L; var mom = 0L
    for (i <- 0 until n) {
      val s = Multimodal.sampleAt(docId, i)
      sum += s; sabs += math.abs(s); mom += i.toLong * s
    }
    val m = Multimodal.decodeWav(bytes)
    assert(m.sampleRate == Multimodal.sampleRateOf(docId))
    assert(m.channels == 1 && m.bitsPerSample == 16)
    assert(m.nSamples == n && m.sumS == sum && m.sumAbs == sabs && m.momS == mom)
    // a LIST chunk inserted between fmt and data must be skipped by the
    // chunk walker (real WAVs carry metadata chunks; a 44-byte-offset
    // assumption would misparse every one of them)
    val extra = java.nio.ByteBuffer.allocate(8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(6)
      .put("INFOab".getBytes("US-ASCII"))
    val withChunk = bytes.take(36) ++ extra.array() ++ bytes.drop(36)
    val m2 = Multimodal.decodeWav(withChunk)
    assert(m2 == m, "unknown chunk broke the decode")
    // moment teeth: reversing the sample order keeps sum/sumAbs but
    // must change the moment
    val rev = bytes.clone()
    for (i <- 0 until n) {
      rev(44 + 2 * i) = bytes(44 + 2 * (n - 1 - i))
      rev(44 + 2 * i + 1) = bytes(44 + 2 * (n - 1 - i) + 1)
    }
    val mr = Multimodal.decodeWav(rev)
    assert(mr.sumS == m.sumS && mr.sumAbs == m.sumAbs)
    assert(mr.momS != m.momS)
  }

  test("PNG via ImageIO: signature, lossless round-trip vs the generator, " +
    "decodePixels parity, and the CRC tamper tooth") {
    for (docId <- Seq(0L, 7L, 41L, 123L)) {
      val bytes = Multimodal.encodePng(docId)
      // PNG signature: 89 50 4E 47 0D 0A 1A 0A
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
        bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
      val w = Multimodal.widthOf(docId); val h = Multimodal.heightOf(docId)
      // compressed size: a real PNG skeleton, bounded above by raw RGB +
      // fixed chunk overhead (the mm06 bytes_ok bounds)
      assert(bytes.length >= 57 && bytes.length <= 3 * w * h + 300,
        s"doc $docId: ${bytes.length} B outside [57, ${3 * w * h + 300}]")
      // lossless: decoded stats equal the generator exactly
      val m = Multimodal.decodeImage(bytes)
      var sr = 0L; var sg = 0L; var sb = 0L; var mr = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val r = Multimodal.pixelR(docId, x, y)
        sr += r; sg += Multimodal.pixelG(docId, x, y); sb += Multimodal.pixelB(docId, x, y)
        mr += (y.toLong * w + x) * r
      }
      assert(m.format == "png" && m.width == w && m.height == h && m.channels == 3)
      assert(m.sumR == sr && m.sumG == sg && m.sumB == sb && m.momR == mr,
        s"doc $docId: PNG round-trip diverged from the generator")
      // decodePixels parity: raster pixels equal the generator per-pixel
      val raster = Multimodal.decodePixels(bytes)
      assert(raster.format == "png" && raster.width == w && raster.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = (Multimodal.pixelR(docId, x, y) << 16) |
          (Multimodal.pixelG(docId, x, y) << 8) | Multimodal.pixelB(docId, x, y)
        assert(raster.rgb(y * w + x) == expect, s"doc $docId pixel ($x,$y)")
      }
      // tamper tooth: flip a byte inside the compressed stream — the CRC
      // must make the decode FAIL, never silently return wrong pixels
      val tampered = bytes.clone()
      val mid = bytes.length / 2
      tampered(mid) = (tampered(mid) ^ 0x5a).toByte
      val failed =
        try { Multimodal.decodeImage(tampered); false }
        catch { case _: Exception => true }
      assert(failed, s"doc $docId: tampered PNG decoded without error")
    }
  }

  test("JPEG via ImageIO: sniffed format, exact dimensions, lossy pixels " +
    "within a bounded tolerance of the generator") {
    for (docId <- Seq(4L, 33L)) {
      val bytes = Multimodal.encodeJpeg(docId)
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "JPEG SOI magic")
      val w = Multimodal.widthOf(docId); val h = Multimodal.heightOf(docId)
      val m = Multimodal.decodeImage(bytes)
      assert(m.format == "jpeg" && m.width == w && m.height == h && m.channels == 3)
      // lossy: per-channel MEAN must land near the generator's mean —
      // JPEG shifts individual pixels but preserves local averages
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += Multimodal.pixelR(docId, x, y)
        sg += Multimodal.pixelG(docId, x, y)
        sb += Multimodal.pixelB(docId, x, y)
      }
      val n = (w * h).toDouble
      assert(math.abs(m.sumR / n - sr / n) <= 32.0 &&
        math.abs(m.sumG / n - sg / n) <= 32.0 &&
        math.abs(m.sumB / n - sb / n) <= 32.0,
        s"doc $docId: JPEG channel means drifted beyond tolerance " +
          s"(${m.sumR / n} vs ${sr / n}, ${m.sumG / n} vs ${sg / n}, ${m.sumB / n} vs ${sb / n})")
    }
  }

  test("decodePixels inverts both encoders pixel-for-pixel") {
    for (docId <- 0L to 9L) {
      val r = Multimodal.decodePixels(Multimodal.encodeImage(docId))
      assert(r.width == Multimodal.widthOf(docId) && r.height == Multimodal.heightOf(docId))
      for (y <- 0 until r.height; x <- 0 until r.width) {
        val p = r.rgb(y * r.width + x)
        assert(((p >> 16) & 0xff) == Multimodal.pixelR(docId, x, y), s"R @($x,$y) doc $docId")
        assert(((p >> 8) & 0xff) == Multimodal.pixelG(docId, x, y), s"G @($x,$y) doc $docId")
        assert((p & 0xff) == Multimodal.pixelB(docId, x, y), s"B @($x,$y) doc $docId")
      }
    }
  }

  test("resizeNearest: identity at same size, floor mapping, up/downsample") {
    val src = Multimodal.decodePixels(Multimodal.encodeImage(4L)) // 8 x 7
    val same = Multimodal.resizeNearest(src, src.width, src.height)
    assert(same.rgb.sameElements(src.rgb)) // identity: sx=(x*w)/w = x
    // downsample 8x7 -> 2x2: elected coords sx in {0,4}, sy in {0,3}
    val down = Multimodal.resizeNearest(src, 2, 2)
    assert(down.rgb(0) == src.rgb(0))
    assert(down.rgb(1) == src.rgb(4))
    assert(down.rgb(2) == src.rgb(3 * 8))
    assert(down.rgb(3) == src.rgb(3 * 8 + 4))
    // upsample 8x7 -> 16x7 duplicates each column: ox=2k,2k+1 -> sx=k
    val up = Multimodal.resizeNearest(src, 16, 7)
    for (y <- 0 until 7; x <- 0 until 8) {
      assert(up.rgb(y * 16 + 2 * x) == src.rgb(y * 8 + x))
      assert(up.rgb(y * 16 + 2 * x + 1) == src.rgb(y * 8 + x))
    }
  }

  test("encodeBmpPixels round-trips a derived raster (the mm05 encode path)") {
    val src = Multimodal.decodePixels(Multimodal.encodeImage(7L)) // PPM source
    val thumb = Multimodal.resizeNearest(src, 6, 5)
    val bytes = Multimodal.encodeBmpPixels(6, 5, thumb.rgb)
    assert(bytes.length == 54 + ((3 * 6 + 3) / 4) * 4 * 5) // canonical 154 B
    val back = Multimodal.decodePixels(bytes)
    assert(back.width == 6 && back.height == 5)
    assert(back.rgb.sameElements(thumb.rgb))
    // tamper tooth: flipping one stored byte changes the decoded raster
    val bad = bytes.clone(); bad(60) = (bad(60) ^ 0x40).toByte
    assert(!Multimodal.decodePixels(bad).rgb.sameElements(thumb.rgb))
  }

  test("aHash64Bits matches a generator-only replay (no codec in the expectation)") {
    // mm07's hash column, recomputed here WITHOUT decode/resize code:
    // straight from the pixel formulas at the floor-elected coordinates —
    // the same independent path the DuckDB oracle takes.
    for (docId <- Seq(0L, 1L, 4L, 7L, 13L, 200L)) {
      val w = Multimodal.widthOf(docId); val h = Multimodal.heightOf(docId)
      val gray = for (oy <- 0 until 8; ox <- 0 until 8) yield {
        val sy = (oy * h) / 8; val sx = (ox * w) / 8
        (Multimodal.pixelR(docId, sx, sy) + Multimodal.pixelG(docId, sx, sy) +
          Multimodal.pixelB(docId, sx, sy)) / 3
      }
      val sum = gray.map(_.toLong).sum
      val expected = gray.map(g => if (g * 64L >= sum) '1' else '0').mkString
      val got = Multimodal.aHash64Bits(
        Multimodal.decodePixels(Multimodal.encodeImage(docId)))
      assert(got == expected, s"aHash mismatch for doc $docId")
      assert(got.length == 64 && got.forall(c => c == '0' || c == '1'))
    }
  }

  test("aHash64Bits is stable under the planted-twin perturbation regime") {
    // The mm07 twin (one source pixel's red +8 mod 256) moves the hash by
    // a small Hamming distance on a typical image — the property that
    // makes aHash a NEAR-dup key rather than an exact digest. Not a
    // universal bound (a mean straddle can flip many bits; mm07's
    // guarantee bit only claims completeness for distance <= 3), so pin
    // on one known-stable doc rather than quantifying over the corpus.
    val src = Multimodal.decodePixels(Multimodal.encodeImage(4L))
    val twinRgb = src.rgb.clone()
    val p0 = twinRgb(0)
    twinRgb(0) = (((((p0 >> 16) & 0xff) + 8) % 256) << 16) | (p0 & 0xffff)
    val twin = Multimodal.decodePixels(
      Multimodal.encodeBmpPixels(src.width, src.height, twinRgb))
    val d = Multimodal.aHash64Bits(src).zip(Multimodal.aHash64Bits(twin))
      .count { case (a, b) => a != b }
    assert(d <= 3, s"twin Hamming distance $d > 3 on the pinned doc")
  }

  test("resampleLinear: identity, hand-computed interpolation, truncation on negatives") {
    // identity at equal rates — the frac=0-everywhere path
    val s = Array(10, -20, 30, -32768, 32767)
    assert(Multimodal.resampleLinear(s, 8000, 8000).sameElements(s))
    // 2:1 downsample picks every other sample (frac always 0)
    assert(Multimodal.resampleLinear(s, 16000, 8000).sameElements(Array(10, 30, 32767)))
    // 1:2 upsample: n_out = 2·(n−1)+1; odd outputs are exact
    // midpoints, truncated toward zero: (10−20)/2 = −5,
    // (−20+30)/2 = 5, (30−32768)/2 = trunc(−16369.0) = −16369; even
    // outputs are the sources, including the final sample
    val up = Multimodal.resampleLinear(Array(10, -20, 30, -32768), 8000, 16000)
    assert(up.sameElements(Array(10, -5, -20, 5, 30, -16369, -32768)))
    // truncation (NOT floor) on a negative non-integer midpoint:
    //   (0 + -5)/2 = -2.5 → -2, matching DuckDB's `//` (which
    //   truncates: -5 // 2 = -2; a floorDiv here would hash-mismatch
    //   the oracle on every negative odd numerator)
    assert(Multimodal.resampleLinear(Array(0, -5), 8000, 16000)(1) == -2)
    // boundary: 101 samples at 12000→8000 — (n−1)·dst % src = 8000 ≠ 0,
    // so the LAST output sits at source index 99 exactly (j_max·src/dst
    // = 66·12000/8000 = 99, frac 0), one short of the final sample: the
    // n_out formula never extrapolates past the source span
    val r = Multimodal.resampleLinear(Array.tabulate(101)(i => i), 12000, 8000)
    assert(r.length == ((101 - 1) * 8000) / 12000 + 1)
    assert(r.last == 99)
  }

  test("encodeWavPcm: generator delegation is bit-exact; derived round-trip") {
    // encodeWav(doc) must equal encodeWavPcm over the generator samples
    for (doc <- Seq(0L, 5L, 11L)) {
      val direct = Multimodal.encodeWav(doc)
      val viaPcm = Multimodal.encodeWavPcm(Multimodal.sampleRateOf(doc),
        Array.tabulate(Multimodal.nSamplesOf(doc))(i => Multimodal.sampleAt(doc, i)))
      assert(direct.sameElements(viaPcm), s"WAV delegation drifted for doc $doc")
    }
    // a derived (resampled) array round-trips losslessly
    val (rate, smp) = Multimodal.decodeWavSamples(Multimodal.encodeWav(7L))
    val res = Multimodal.resampleLinear(smp, rate, 8000)
    val (r2, back) = Multimodal.decodeWavSamples(Multimodal.encodeWavPcm(8000, res))
    assert(r2 == 8000 && back.sameElements(res))
  }

  test("decodeMeta runs the codec at the mapPartitions boundary") {
    import org.apache.spark.sql.functions._
    val docs = graft.model.Tables.documents(spark, sf).limit(8)
    val out = Multimodal.decodeMeta(Multimodal.withPayload(docs))
      .orderBy(col("doc_id")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) == Multimodal.widthOf(id))
      assert(r.getInt(3) == Multimodal.heightOf(id))
      assert(r.getString(5) == (if (id % 2 == 0) "bmp" else "ppm"))
    }
  }
}
