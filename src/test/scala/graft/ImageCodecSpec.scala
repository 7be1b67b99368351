package graft

import java.io.ByteArrayOutputStream

import graft.operators.{ImageCodec, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The real-codec layer behind q61–q63: the deterministic BMP writer
  * must be a genuine image (the stock-JDK reader decodes it to exactly
  * the pixels the closed-form oracle predicts), the resampler must
  * follow the floor-division rule the SQL twin replicates, and the
  * frame demuxer must be a real length-prefixed parse. */
class ImageCodecSpec extends AnyFunSuite {

  /** Closed-form pixel sum of the generator ramp — the same expression
    * the DuckDB oracle evaluates. */
  private def rampSum(w: Int, h: Int, seed: Int): Long = {
    var s = 0L
    for (y <- 0 until h; x <- 0 until w) s += 3L * ((seed + x + y) % 256)
    s
  }

  test("bmp bytes are a real image: ImageIO decodes exact dims and the closed-form pixel sum") {
    for ((w, h, seed) <- Seq((8, 8, 0), (13, 57, 200), (71, 9, 255), (64, 64, 17))) {
      val bytes = ImageCodec.bmp(w, h, seed)
      assert(bytes.length === ImageCodec.bmpSize(w, h))
      val img = ImageCodec.decode(bytes).getOrElse(fail(s"ImageIO rejected ${w}x$h"))
      assert(img.getWidth === w && img.getHeight === h)
      assert(ImageCodec.pixelSum(img) === rampSum(w, h, seed))
    }
  }

  test("decode is format-agnostic: a JDK-written PNG decodes on the real path too") {
    val src = ImageCodec.decode(ImageCodec.bmp(20, 11, 42)).get
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", out)
    val png = ImageCodec.decode(out.toByteArray).getOrElse(fail("PNG not decoded"))
    assert(png.getWidth === 20 && png.getHeight === 11)
    assert(ImageCodec.pixelSum(png) === rampSum(20, 11, 42))
    assert(!ImageCodec.looksLikeBmp(out.toByteArray)) // sniff stays honest
  }

  test("decode returns None on garbage instead of throwing") {
    assert(ImageCodec.decode("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("resizeNearest follows the integer floor-division sampling rule") {
    val src = ImageCodec.decode(ImageCodec.bmp(30, 20, 5)).get
    val dst = ImageCodec.resizeNearest(src, 7, 13)
    assert(dst.getWidth === 7 && dst.getHeight === 13)
    var expected = 0L
    for (y <- 0 until 13; x <- 0 until 7)
      expected += 3L * ((5 + (x * 30 / 7) + (y * 20 / 13)) % 256)
    assert(ImageCodec.pixelSum(dst) === expected)
  }

  test("encodeBmp round-trips the generator image byte-for-byte") {
    val orig = ImageCodec.bmp(23, 17, 99)
    val re = ImageCodec.encodeBmp(ImageCodec.decode(orig).get)
    assert(java.util.Arrays.equals(orig, re))
  }

  test("aHashHex matches the closed-form bit derivation and is resize-invariant") {
    val w = 30; val h = 20; val seed = 5
    val img = ImageCodec.decode(ImageCodec.bmp(w, h, seed)).get
    val hash = ImageCodec.aHashHex(img)
    assert(hash.length === 16 && hash.matches("[0-9a-f]{16}"))
    // the oracle's arithmetic, in miniature
    val lums = for (y <- 0 until 8; x <- 0 until 8)
      yield 3 * ((seed + (x * w / 8) + (y * h / 8)) % 256)
    val total = lums.sum.toLong
    val expected = (0 until 8).map { y =>
      val b = (0 until 8).map { x =>
        if (lums(y * 8 + x) * 64L >= total) 1 << x else 0
      }.sum
      f"$b%02x"
    }.mkString
    assert(hash === expected)
    // perceptual property: a nearest-neighbor upscale keeps the hash
    // when the grid re-samples the same source pixels (2x exact case)
    val doubled = ImageCodec.resizeNearest(img, 2 * w, 2 * h)
    assert(ImageCodec.aHashHex(doubled) === hash)
    // a uniformly brighter image hashes the SAME — aHash thresholds
    // against the image's own mean, so a constant shift (no mod-256
    // wrap at seed+97 for these dims) is invisible. The perceptual
    // property, asserted positively:
    val brighter = ImageCodec.decode(ImageCodec.bmp(w, h, seed + 97)).get
    assert(ImageCodec.aHashHex(brighter) === hash)
    // ...while a WRAPPING seed folds the ramp into a dark band — a
    // structurally different pattern, different hash
    val wrapped = ImageCodec.decode(ImageCodec.bmp(w, h, 250)).get
    assert(ImageCodec.aHashHex(wrapped) !== hash)
  }

  test("splitFrames demuxes a length-prefixed container and rejects corrupt payloads") {
    val frames = Seq(ImageCodec.bmp(9, 8, 1), ImageCodec.bmp(9, 8, 2), ImageCodec.bmp(9, 8, 3))
    val container = frames.reduce(_ ++ _)
    val out = ImageCodec.splitFrames(container).getOrElse(fail("demux failed"))
    assert(out.length === 3)
    out.zip(frames).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    // trailing garbage breaks the walk -> None (stub chunker takes over)
    assert(ImageCodec.splitFrames(container ++ Array[Byte](1, 2, 3)).isEmpty)
    // a truncated final frame is detected by its declared size field
    assert(ImageCodec.splitFrames(container.dropRight(10)).isEmpty)
    assert(ImageCodec.splitFrames("plain text".getBytes("UTF-8")).isEmpty)
  }

  test("animatedGif round-trips losslessly: JDK demux recovers every ramp frame exactly") {
    val (w, h, seed, n) = (13, 9, 200, 4) // seed+f+x+y crosses the % 256 wrap
    val payload = ImageCodec.animatedGif(w, h, seed, n)
    assert(ImageCodec.looksLikeGif(payload))
    assert(!ImageCodec.looksLikeBmp(payload))
    val frames = ImageCodec.gifFrames(payload).getOrElse(fail("gif demux failed"))
    assert(frames.length === n)
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.getWidth === w && img.getHeight === h)
      // exact per-pixel equality with the generator ramp — the indexed
      // gray palette makes the GIF encode quantization-free, which is
      // what lets the q63 oracle keep ONE closed form for both formats
      for (y <- 0 until h; x <- 0 until w) {
        val v = (seed + f + x + y) % 256
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) === v, s"f=$f ($x,$y)")
        assert(((rgb >> 8) & 0xff) === v)
        assert((rgb & 0xff) === v)
      }
      assert(ImageCodec.pixelSum(img) ===
        (for (y <- 0 until h; x <- 0 until w) yield 3L * ((seed + f + x + y) % 256)).sum)
    }
    // non-gif payloads are rejected by the sniff, not decoded
    assert(ImageCodec.gifFrames(ImageCodec.bmp(4, 4, 0)).isEmpty)
    assert(ImageCodec.gifFrames("GIF8 not really".getBytes("UTF-8")).isEmpty)
    // a payload that PASSES the sniff but is truncated mid-stream must
    // degrade to None (the JDK decoder throws unchecked exceptions on
    // corrupt input), not propagate and kill the task
    assert(ImageCodec.gifFrames(payload.take(payload.length / 3)).isEmpty)
    assert(ImageCodec.gifFrames(payload.take(16)).isEmpty)
  }

  test("multiPageTiff round-trips losslessly: JDK IFD walk recovers every ramp page exactly") {
    val (w, h, seed, n) = (13, 9, 200, 4) // seed+f+x+y crosses the % 256 wrap
    val payload = ImageCodec.multiPageTiff(w, h, seed, n)
    assert(ImageCodec.looksLikeTiff(payload))
    assert(!ImageCodec.looksLikeGif(payload) && !ImageCodec.looksLikeBmp(payload))
    val frames = ImageCodec.tiffFrames(payload).getOrElse(fail("tiff demux failed"))
    assert(frames.length === n)
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.getWidth === w && img.getHeight === h)
      // exact per-pixel equality with the generator ramp — indexed
      // gray palette, same losslessness argument as the GIF path (and
      // the reason TYPE_BYTE_GRAY is NOT used: its gray→sRGB
      // conversion in getRGB would corrupt the closed form)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (seed + f + x + y) % 256
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) === v, s"f=$f ($x,$y)")
        assert(((rgb >> 8) & 0xff) === v)
        assert((rgb & 0xff) === v)
      }
      assert(ImageCodec.pixelSum(img) ===
        (for (y <- 0 until h; x <- 0 until w) yield 3L * ((seed + f + x + y) % 256)).sum)
    }
    // non-tiff payloads are rejected by the 4-byte sniff
    assert(ImageCodec.tiffFrames(ImageCodec.bmp(4, 4, 0)).isEmpty)
    assert(ImageCodec.tiffFrames("II not a tiff".getBytes("UTF-8")).isEmpty)
    // sniff-passing but truncated payloads degrade to None (fallback
    // chunker takes over), never a task-killing throw
    assert(ImageCodec.tiffFrames(payload.take(16)).isEmpty)
  }

  test("aviDib round-trips losslessly: RIFF walk recovers every DIB frame exactly") {
    val (w, h, seed, n) = (13, 9, 200, 4) // odd width exercises row padding
    val payload = ImageCodec.aviDib(w, h, seed, n)
    assert(ImageCodec.looksLikeAvi(payload))
    assert(!ImageCodec.looksLikeGif(payload) && !ImageCodec.looksLikeBmp(payload) &&
      !ImageCodec.looksLikeTiff(payload))
    val (pw, ph, chunks) =
      ImageCodec.aviDibFrames(payload).getOrElse(fail("avi demux failed"))
    assert(pw === w && ph === h && chunks.length === n)
    chunks.zipWithIndex.foreach { case (dib, f) =>
      // chunk length is the closed-form DIB size (padded rows, no header)
      assert(dib.length === ImageCodec.bmpSize(w, h) - 54)
      // the reconstructed-header decode is the REAL JDK BMP reader,
      // and every pixel matches the generator ramp exactly
      val img = ImageCodec.dibFrameToImage(w, h, dib)
        .getOrElse(fail(s"frame $f decode failed"))
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (seed + f + x + y) % 256
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) === v, s"f=$f ($x,$y)")
        assert(((rgb >> 8) & 0xff) === v)
        assert((rgb & 0xff) === v)
      }
      assert(ImageCodec.pixelSum(img) ===
        (for (y <- 0 until h; x <- 0 until w) yield 3L * ((seed + f + x + y) % 256)).sum)
    }
    // non-avi payloads are rejected by the 12-byte sniff
    assert(ImageCodec.aviDibFrames(ImageCodec.bmp(4, 4, 0)).isEmpty)
    assert(ImageCodec.aviDibFrames("RIFFxxxxWAVE".getBytes("UTF-8")).isEmpty)
    // sniff-passing but truncated payloads degrade to None: a cut
    // inside the movi LIST loses trailing frames but must not throw,
    // and a cut before strf yields no dims → None
    assert(ImageCodec.aviDibFrames(payload.take(20)).isEmpty)
    val cutMidMovi = payload.take(payload.length - 7)
    val recovered = ImageCodec.aviDibFrames(cutMidMovi)
    assert(recovered.forall(_._3.length < n)) // fewer frames or None, never a throw
  }

  test("mp4Dib round-trips losslessly: box walk + stbl reconstruction recover every sample") {
    val (w, h, seed, n) = (13, 9, 77, 4) // odd width exercises row padding
    val payload = ImageCodec.mp4Dib(w, h, seed, n)
    assert(ImageCodec.looksLikeMp4(payload))
    assert(!ImageCodec.looksLikeAvi(payload) && !ImageCodec.looksLikeGif(payload) &&
      !ImageCodec.looksLikeBmp(payload) && !ImageCodec.looksLikeTiff(payload))
    val (pw, ph, fcc, samples) =
      ImageCodec.mp4Frames(payload).getOrElse(fail("mp4 demux failed"))
    assert(pw === w && ph === h && fcc === "DIB " && samples.length === n)
    samples.zipWithIndex.foreach { case (dib, f) =>
      assert(dib.length === ImageCodec.bmpSize(w, h) - 54)
      val img = ImageCodec.dibFrameToImage(w, h, dib)
        .getOrElse(fail(s"sample $f decode failed"))
      assert(ImageCodec.pixelSum(img) ===
        (for (y <- 0 until h; x <- 0 until w)
          yield 3L * ((seed + f + x + y) % 256)).sum)
    }
    // non-BMFF payloads fail the ftyp sniff
    assert(ImageCodec.mp4Frames(ImageCodec.bmp(4, 4, 0)).isEmpty)
    assert(ImageCodec.mp4Frames(ImageCodec.aviDib(4, 4, 0, 2)).isEmpty)
    // sniff-passing but truncated payloads degrade to None, never throw
    assert(ImageCodec.mp4Frames(payload.take(20)).isEmpty)
    assert(ImageCodec.mp4Frames(payload.take(payload.length - 7)).isEmpty)
  }

  test("fixed-size stsz (no per-sample table) demuxes every sample — the tiny box is not 'damage'") {
    // 13 constant-size samples: the fixed-form stsz box is 20 bytes
    // regardless of n, smaller than a 13-entry table could fit — a
    // table-capacity sanity bound applied to the fixed form would
    // reject this valid file
    val (w, h, seed, n) = (4, 1, 7, 13)
    val fixed = ImageCodec.mp4Dib(w, h, seed, n, fixedStsz = true)
    val tabled = ImageCodec.mp4Dib(w, h, seed, n)
    val (fw, fh, ffcc, fSamples) =
      ImageCodec.mp4Frames(fixed).getOrElse(fail("fixed-stsz demux failed"))
    val (_, _, _, tSamples) =
      ImageCodec.mp4Frames(tabled).getOrElse(fail("tabled demux failed"))
    assert(fw === w && fh === h && ffcc === "DIB " && fSamples.length === n)
    // both stsz forms slice identical sample bytes
    fSamples.zip(tSamples).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    // a fixed size whose n*size overruns the file IS damage → None
    val p = fixed.clone()
    val stszAt = (0 until p.length - 4)
      .find(i => p(i) == 's' && p(i + 1) == 't' && p(i + 2) == 's' &&
        p(i + 3) == 'z').get
    p(stszAt + 8) = 0x7f // sample_size high byte → n*size >> file length
    assert(ImageCodec.mp4Frames(p).isEmpty)
  }

  test("mp4 demux is per-trak: a preceding non-video trak never pollutes the video tables") {
    // splice a fake 'soun' trak (own hdlr + stsd/stsz/stco/stsc with
    // DIFFERENT counts) in front of the real video trak inside moov;
    // a global-collection parser would take the audio sample tables
    // with the video dims — the per-trak walk must ignore it wholesale
    val base = ImageCodec.mp4Dib(11, 7, 30, 3)
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def bx(kind: String, body: Array[Byte]): Array[Byte] =
      be32(8 + body.length) ++ kind.getBytes("US-ASCII") ++ body
    val hdlr = bx("hdlr", new Array[Byte](8) ++ "soun".getBytes("US-ASCII") ++
      new Array[Byte](13))
    // one 5-byte "audio sample": wrong counts AND a wrong stco offset
    val stbl = bx("stbl",
      bx("stsd", be32(0) ++ be32(1) ++ (be32(86) ++ "mp4a".getBytes("US-ASCII") ++ new Array[Byte](78))) ++
        bx("stsz", be32(0) ++ be32(5) ++ be32(1)) ++
        bx("stco", be32(0) ++ be32(1) ++ be32(0)) ++
        bx("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(1) ++ be32(1)))
    val soundTrak = bx("trak", bx("mdia", hdlr ++ bx("minf", stbl)))
    // rebuild: new file = ftyp ++ moov[soundTrak ++ original children]
    // ++ mdat; inserting inside moov shifts mdat, so the VIDEO trak's
    // stco offset is patched by the growth
    val ftypLen = 20
    val moovLen = ImageCodec.be32At(base, ftypLen)
    val moovBody = java.util.Arrays.copyOfRange(base, ftypLen + 8, ftypLen + moovLen)
    val mdat = java.util.Arrays.copyOfRange(base, ftypLen + moovLen, base.length)
    val newMoov = bx("moov", soundTrak ++ moovBody)
    val grown = newMoov.length - moovLen
    val patched = java.util.Arrays.copyOfRange(base, 0, ftypLen) ++ newMoov ++ mdat
    // patch the LAST stco (the video trak's — the audio one precedes it)
    var stcoOff = -1
    var i = 0
    while (i + 4 <= patched.length) {
      if (patched(i) == 's' && patched(i + 1) == 't' && patched(i + 2) == 'c' &&
        patched(i + 3) == 'o') stcoOff = i
      i += 1
    }
    assert(stcoOff > 0)
    val old = ImageCodec.be32At(patched, stcoOff + 12)
    be32(old + grown).copyToArray(patched, stcoOff + 12)
    val (w, h, fcc, samples) =
      ImageCodec.mp4Frames(patched).getOrElse(fail("multi-trak demux failed"))
    assert(w === 11 && h === 7 && fcc === "DIB " && samples.length === 3)
    samples.zipWithIndex.foreach { case (dib, f) =>
      val img = ImageCodec.dibFrameToImage(w, h, dib).getOrElse(fail(s"frame $f"))
      assert(ImageCodec.pixelSum(img) ===
        (for (y <- 0 until 7; x <- 0 until 11)
          yield 3L * ((30 + f + x + y) % 256)).sum)
    }
  }

  test("mp4 with a compressed fourcc keeps real frame structure, loses only pixel decode") {
    // patch the sample-entry fourcc to avc1: the container demux (sizes,
    // boundaries, dims) must survive — that structure needs NO codec
    val payload = ImageCodec.mp4Dib(10, 6, 50, 3)
    val dibAt = payload.indexOfSlice("DIB ".getBytes("US-ASCII"))
    assert(dibAt > 0)
    val patched = payload.clone()
    "avc1".getBytes("US-ASCII").copyToArray(patched, dibAt)
    val (pw, ph, fcc, samples) =
      ImageCodec.mp4Frames(patched).getOrElse(fail("patched demux failed"))
    assert(pw === 10 && ph === 6 && fcc === "avc1" && samples.length === 3)
    assert(samples.forall(_.length === ImageCodec.bmpSize(10, 6) - 54))
  }
}
