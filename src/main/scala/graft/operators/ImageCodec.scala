package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

/** Pure-JVM image codec for the multimodal operators: a deterministic
  * 24-bit BMP writer (exact bytes — header layout and row padding are
  * fixed by the format, so payload length is arithmetically known to
  * the oracle), `javax.imageio` as the real decoder, a nearest-neighbor
  * resampler, and a length-prefixed frame-container demuxer.
  *
  * Why BMP: it is the one raster format that is (a) decodable by the
  * stock JDK with no native deps, (b) losslessly round-trippable (no
  * compressor whose output bytes are implementation-defined), and
  * (c) simple enough that the fixture generator can emit it directly —
  * which is what lets the DuckDB oracle hash-check REAL decoded pixel
  * sums: the generator derives every pixel from (seed, x, y)
  * arithmetic, ImageIO genuinely decodes the bytes, and the oracle
  * recomputes the same sums without ever touching an image.
  *
  * The reference carries media only as a URL string column
  * (/root/reference/dags/Extract.py:21-24); this file is part of the §8
  * LLM-pipeline extension surface.
  */
object ImageCodec {

  /** BMP row stride: 3 bytes/pixel padded up to a 4-byte boundary. */
  def rowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Total file size of a [[bmp]] payload — 54-byte header + rows.
    * The oracle twin computes this same expression in SQL. */
  def bmpSize(width: Int, height: Int): Int = 54 + height * rowSize(width)

  /** Deterministic 24-bit BMP: pixel (x, y) (top-down coordinates) has
    * all three channels equal to `(seed + x + y) % 256`. Gray ramps
    * compress nothing away (BI_RGB is uncompressed) and make the
    * decoded pixel sum a closed-form function of (w, h, seed). */
  def bmp(width: Int, height: Int, seed: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = rowSize(width)
    val size = bmpSize(width, height)
    val b = new Array[Byte](size)
    def le32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, size); le32(10, 54); le32(14, 40)
    le32(18, width); le32(22, height) // positive height = bottom-up rows
    b(26) = 1; b(28) = 24
    le32(34, height * stride)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < width) {
        val v = ((seed + x + y) % 256).toByte
        val o = rowOff + 3 * x
        b(o) = v; b(o + 1) = v; b(o + 2) = v // B, G, R
        x += 1
      }
      y += 1
    }
    b
  }

  // ImageIO defaults to a temp-FILE-backed ImageInputStream cache,
  // which puts a disk write+read inside every decode and serializes
  // codec-bound partitions on /tmp I/O; payloads here are already
  // in-memory byte arrays, so cache in memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** Real decode via the stock-JDK codec. None when the payload is not
    * a readable image (callers fall back to the stub path). */
  def decode(payload: Array[Byte]): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  /** Sum of (r + g + b) over every decoded pixel — the cheap
    * whole-image checksum the oracle reproduces arithmetically. */
  def pixelSum(img: BufferedImage): Long = {
    var s = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    s
  }

  /** Nearest-neighbor resample: dst (x, y) takes src
    * (x·srcW/dstW, y·srcH/dstH) with integer floor division — the one
    * resampling rule simple enough for the SQL oracle to replicate
    * exactly (bilinear weights would reintroduce float rounding). */
  def resizeNearest(src: BufferedImage, dstW: Int, dstH: Int): BufferedImage = {
    require(dstW > 0 && dstH > 0, s"bad target dims ${dstW}x$dstH")
    val dst = new BufferedImage(dstW, dstH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dstH) {
      val sy = y * src.getHeight / dstH
      var x = 0
      while (x < dstW) {
        dst.setRGB(x, y, src.getRGB(x * src.getWidth / dstW, sy))
        x += 1
      }
      y += 1
    }
    dst
  }

  /** Re-encode a decoded image with the deterministic writer. Uses the
    * blue channel as the gray value (generator images are gray, so the
    * channels agree; for arbitrary inputs this is a documented
    * grayscale projection, not a lossy surprise). */
  def encodeBmp(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val stride = rowSize(w)
    val b = new Array[Byte](bmpSize(w, h))
    // header via a 1x1 template then overwrite dims/sizes
    val header = bmp(1, 1, 0)
    System.arraycopy(header, 0, b, 0, 54)
    def le32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    le32(2, b.length); le32(18, w); le32(22, h); le32(34, h * stride)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val o = rowOff + 3 * x
        b(o) = (rgb & 0xff).toByte
        b(o + 1) = ((rgb >> 8) & 0xff).toByte
        b(o + 2) = ((rgb >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** True when the payload starts with the BMP magic and carries at
    * least a full header — the cheap sniff deciding real-vs-stub. */
  def looksLikeBmp(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 54 &&
      payload(0) == 'B' && payload(1) == 'M'

  /** Demux a back-to-back BMP frame container: each frame declares its
    * own byte length in the header's file-size field, so the walk is a
    * real length-prefixed parse (the shape an MP4/AVI demuxer has),
    * not a fixed-stride split. Returns None when the payload is not a
    * clean container (callers fall back to the stub chunker). */
  def splitFrames(payload: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (!looksLikeBmp(payload)) return None
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    while (off < payload.length) {
      if (off + 54 > payload.length ||
          payload(off) != 'B' || payload(off + 1) != 'M') return None
      val size = (payload(off + 2) & 0xff) | ((payload(off + 3) & 0xff) << 8) |
        ((payload(off + 4) & 0xff) << 16) | ((payload(off + 5) & 0xff) << 24)
      if (size < 54 || off + size > payload.length) return None
      out += java.util.Arrays.copyOfRange(payload, off, off + size)
      off += size
    }
    Some(out.result())
  }

  /** "GIF87a"/"GIF89a" magic sniff — the standard-container sibling
    * of [[looksLikeBmp]]. */
  def looksLikeGif(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 6 &&
      payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8' && (payload(4) == '7' || payload(4) == '9') &&
      payload(5) == 'a'

  /** One grayscale ramp frame as an INDEXED image over an exact
    * 256-level gray palette: pixel (x, y) = gray (seed + x + y) % 256,
    * the same ramp as [[bmp]]. Indexed-with-full-gray-palette matters:
    * GIF is palette-based, so handing the writer a pre-indexed image
    * whose palette already holds every level it needs makes the
    * encode LOSSLESS — no quantization — and the decoded pixel sum
    * stays the same closed-form function of (w, h, seed) the oracle
    * computes for the BMP path. */
  private def rampIndexed(width: Int, height: Int, seed: Int): BufferedImage = {
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, (seed + x + y) % 256)
        x += 1
      }
      y += 1
    }
    img
  }

  /** A real multi-frame ANIMATED GIF via the stock-JDK gif writer's
    * sequence API: `nFrames` full-size ramp frames, frame f's ramp
    * offset by f — the standard-format counterpart of the bespoke
    * length-prefixed BMP container. */
  def animatedGif(width: Int, height: Int, seed: Int, nFrames: Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames >= 1,
      s"bad gif spec ${width}x$height x$nFrames")
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        writer.writeToSequence(
          new javax.imageio.IIOImage(rampIndexed(width, height, seed + f), null, null),
          writer.getDefaultWriteParam)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** TIFF magic sniff: little-endian "II*\0" or big-endian "MM\0*". */
  def looksLikeTiff(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 4 &&
      ((payload(0) == 'I' && payload(1) == 'I' &&
        payload(2) == 42 && payload(3) == 0) ||
       (payload(0) == 'M' && payload(1) == 'M' &&
        payload(2) == 0 && payload(3) == 42))

  /** A real MULTI-PAGE TIFF via the stock-JDK tiff writer (bundled
    * since JDK 9): `nFrames` ramp pages, page f's ramp offset by f —
    * the third standard container next to [[animatedGif]] and the
    * length-prefixed BMP walk. Pages are the same indexed-over-exact-
    * gray-palette images as the GIF path: palette round-trips are
    * lossless (and dodge the TYPE_BYTE_GRAY gray→sRGB conversion that
    * would corrupt `getRGB`), so the decoded pixel sum keeps the one
    * closed form all three containers share. */
  def multiPageTiff(width: Int, height: Int, seed: Int, nFrames: Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames >= 1,
      s"bad tiff spec ${width}x$height x$nFrames")
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        writer.writeToSequence(
          new javax.imageio.IIOImage(rampIndexed(width, height, seed + f), null, null),
          writer.getDefaultWriteParam)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Demux+decode every page of a multi-page TIFF through the
    * stock-JDK reader — `getNumImages(true)` walks the IFD chain, the
    * TIFF sibling of [[gifFrames]]'s image-block walk. None on a
    * non-TIFF or corrupt payload (same NonFatal degradation: a
    * payload passing the 4-byte sniff but truncated must fall back,
    * not kill the task). */
  def tiffFrames(payload: Array[Byte]): Option[Seq[BufferedImage]] = {
    if (!looksLikeTiff(payload)) return None
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("tiff").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      Some((0 until n).map(reader.read(_)))
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  // ---- ISO-BMFF (MP4/MOV family): big-endian box walk --------------

  /** 'ftyp' at offset 4 — the ISO base-media sniff. */
  def looksLikeMp4(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(4) == 'f' && payload(5) == 't' &&
      payload(6) == 'y' && payload(7) == 'p'

  private[graft] def be32At(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >> 24).toByte; b(off + 1) = (v >> 16).toByte
    b(off + 2) = (v >> 8).toByte; b(off + 3) = v.toByte
  }

  private def be16At(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def box(kind: String, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + body.length)
    putBe32(out, 0, out.length)
    kind.getBytes("US-ASCII").copyToArray(out, 4)
    body.copyToArray(out, 8)
    out
  }

  /** A real ISO-BMFF video file carrying uncompressed 'DIB '
    * samples: ftyp('isom') + moov(trak/mdia/minf/stbl with a proper
    * VisualSampleEntry, stts/stsc/stsz/stco) + mdat of one sample per
    * frame — each sample the exact bottom-up BGR pixel array the
    * [[aviDib]] chunks carry, so MP4 decode goes through the SAME
    * reconstructed-header stock-JDK BMP path and stays lossless for
    * the closed-form pixel-sum oracle. The stco offset is absolute;
    * moov is built once with a placeholder to learn its length, then
    * rebuilt with the real mdat payload offset (moov length does not
    * depend on the offset value). */
  def mp4Dib(width: Int, height: Int, seed: Int, nFrames: Int,
      fixedStsz: Boolean = false): Array[Byte] = {
    // upper bound: VisualSampleEntry stores dims in 16-bit fields —
    // a larger value would silently truncate into a corrupt fixture
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff &&
      nFrames >= 1, s"bad mp4 spec ${width}x$height x$nFrames")
    val stride = rowSize(width)
    val frameBytes = height * stride
    val frames = (0 until nFrames).map { f =>
      java.util.Arrays.copyOfRange(bmp(width, height, seed + f), 54,
        54 + frameBytes)
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
        "isom".getBytes("US-ASCII"))
    def fullBody(n: Int): Array[Byte] = new Array[Byte](4 + n) // ver+flags
    def moovFor(mdatPayloadOff: Int): Array[Byte] = {
      // VisualSampleEntry('DIB '), ISO 14496-12 layout: 16B sample-
      // entry header, 16B pre_defined/reserved, w/h at +32/+34,
      // resolutions, frame_count=1, 32B compressorname, depth at +82
      val entry = new Array[Byte](86)
      putBe32(entry, 0, 86)
      "DIB ".getBytes("US-ASCII").copyToArray(entry, 4)
      entry(15) = 1 // data_reference_index
      entry(32) = (width >> 8).toByte; entry(33) = width.toByte
      entry(34) = (height >> 8).toByte; entry(35) = height.toByte
      putBe32(entry, 36, 0x00480000); putBe32(entry, 40, 0x00480000)
      entry(49) = 1 // frame_count
      entry(82) = 0; entry(83) = 24 // depth
      entry(84) = 0xff.toByte; entry(85) = 0xff.toByte // pre_defined -1
      val stsdB = fullBody(4 + 86)
      putBe32(stsdB, 4, 1); entry.copyToArray(stsdB, 8)
      val sttsB = fullBody(4 + 8)
      putBe32(sttsB, 4, 1); putBe32(sttsB, 8, nFrames); putBe32(sttsB, 12, 1)
      val stscB = fullBody(4 + 12)
      putBe32(stscB, 4, 1); putBe32(stscB, 8, 1)
      putBe32(stscB, 12, nFrames); putBe32(stscB, 16, 1)
      // constant-size samples: real muxers emit the 12-byte fixed
      // form (sample_size != 0, NO per-sample table) — fixedStsz
      // exercises that branch of the demuxer
      val stszB =
        if (fixedStsz) {
          val b = fullBody(8)
          putBe32(b, 4, frameBytes); putBe32(b, 8, nFrames); b
        } else {
          val b = fullBody(8 + 4 * nFrames)
          putBe32(b, 8, nFrames)
          frames.indices.foreach(i => putBe32(b, 12 + 4 * i, frames(i).length))
          b
        }
      val stcoB = fullBody(4 + 4)
      putBe32(stcoB, 4, 1); putBe32(stcoB, 8, mdatPayloadOff)
      val stbl = box("stbl",
        box("stsd", stsdB) ++ box("stts", sttsB) ++ box("stsc", stscB) ++
          box("stsz", stszB) ++ box("stco", stcoB))
      val hdlrB = fullBody(4 + 4 + 12 + 1)
      "vide".getBytes("US-ASCII").copyToArray(hdlrB, 8)
      val mdhdB = fullBody(4 + 4 + 4 + 4 + 2 + 2)
      putBe32(mdhdB, 12, 10)      // timescale
      putBe32(mdhdB, 16, nFrames) // duration
      val mdia = box("mdia",
        box("mdhd", mdhdB) ++ box("hdlr", hdlrB) ++ box("minf", stbl))
      box("moov", box("trak", mdia))
    }
    val moovLen = moovFor(0).length
    val moov = moovFor(ftyp.length + moovLen + 8)
    ftyp ++ moov ++ box("mdat", frames.reduce(_ ++ _))
  }

  /** Demux an ISO-BMFF video: box-walk moov→trak→mdia→minf→stbl,
    * read the first VisualSampleEntry (fourcc, dims) and the sample
    * tables, and slice every sample's bytes out of the file by
    * stsc/stsz/stco reconstruction — a REAL container demux needing
    * no codec. Returns (width, height, sample fourcc, samples):
    * 'DIB ' samples additionally decode via [[dibFrameToImage]];
    * compressed fourccs (avc1, hev1, …) still get real per-frame
    * boundaries, sizes and digests — only pixel decode needs the
    * out-of-JDK codec. None on a non-BMFF payload or any structural
    * damage (NonFatal walk). Stated generality limits: 64-bit
    * `largesize` boxes and 64-bit `co64` chunk offsets are not
    * handled (32-bit `stco` only) — files over 4 GiB demux as None,
    * the honest refusal for this in-memory single-payload path. */
  def mp4Frames(payload: Array[Byte]):
      Option[(Int, Int, String, Seq[Array[Byte]])] = {
    if (!looksLikeMp4(payload)) return None
    try {
      // sample tables are collected PER TRAK — a multi-track file
      // (audio trak before video, the common layout) must never mix
      // one trak's stsz/stco with another's stsd dims. The accepted
      // trak is the first whose mdia/hdlr declares 'vide' and whose
      // stbl is complete.
      final class Trak {
        var handler: String = null
        var w = 0; var h = 0; var fcc: String = null
        var stsz: Array[Int] = null
        var stco: Array[Int] = null
        var stsc: Array[(Int, Int)] = null // (first_chunk, samples_per_chunk)
        def complete: Boolean = handler == "vide" && fcc != null &&
          w > 0 && h > 0 && stsz != null && stco != null && stsc != null &&
          stsz.nonEmpty && stco.nonEmpty && stsc.nonEmpty
      }
      val traks = Seq.newBuilder[Trak]
      def walk(from: Int, until: Int, cur: Trak): Unit = {
        var off = from
        while (off + 8 <= until) {
          val size = be32At(payload, off)
          if (size < 8 || off + size > until) return // largesize/damage
          val kind = fourcc(payload, off + 4)
          kind match {
            case "moov" =>
              walk(off + 8, off + size, cur)
            case "trak" =>
              val t = new Trak
              traks += t
              walk(off + 8, off + size, t)
            case "mdia" | "minf" | "stbl" if cur != null =>
              walk(off + 8, off + size, cur)
            case "hdlr" if cur != null && cur.handler == null && size >= 20 =>
              cur.handler = fourcc(payload, off + 16)
            case "stsd" if cur != null && cur.fcc == null && size >= 16 + 86 =>
              val e = off + 16 // first sample entry
              cur.fcc = fourcc(payload, e + 4)
              cur.w = be16At(payload, e + 32)
              cur.h = be16At(payload, e + 34)
            case "stsz" if cur != null && cur.stsz == null && size >= 20 =>
              val fixed = be32At(payload, off + 12)
              val n = be32At(payload, off + 16)
              // table-capacity bound only applies when a per-sample
              // table EXISTS (fixed == 0); a constant-sample-size trak
              // has a tiny stsz box regardless of n — bound that case
              // against the file extent instead (n fixed-size samples
              // cannot outweigh the whole payload)
              if (n < 0) return
              if (fixed == 0 && n > (until - off) / 4 + 1) return
              if (fixed != 0 &&
                  (fixed < 0 || n.toLong * fixed > payload.length)) return
              cur.stsz =
                if (fixed != 0) Array.fill(n)(fixed)
                else Array.tabulate(n)(i => be32At(payload, off + 20 + 4 * i))
            case "stco" if cur != null && cur.stco == null && size >= 16 =>
              val n = be32At(payload, off + 12)
              if (n < 0 || n > (until - off) / 4 + 1) return
              cur.stco = Array.tabulate(n)(i => be32At(payload, off + 16 + 4 * i))
            case "stsc" if cur != null && cur.stsc == null && size >= 16 =>
              val n = be32At(payload, off + 12)
              if (n < 0 || n > (until - off) / 12 + 1) return
              cur.stsc = Array.tabulate(n)(i =>
                (be32At(payload, off + 16 + 12 * i),
                  be32At(payload, off + 20 + 12 * i)))
            case _ => // ftyp/mdat/free/tkhd/mdhd/…: skip
          }
          off += size
        }
      }
      walk(0, payload.length, null)
      val video = traks.result().find(_.complete).getOrElse(return None)
      val w = video.w; val h = video.h; val fcc = video.fcc
      val stsz = video.stsz; val stco = video.stco; val stsc = video.stsc
      // samples per chunk: the stsc run covering chunk index ci
      def perChunk(ci: Int): Int = {
        var r = stsc.head._2
        stsc.foreach { case (first, n) => if (first <= ci + 1) r = n }
        r
      }
      val out = Seq.newBuilder[Array[Byte]]
      var si = 0
      var ci = 0
      while (si < stsz.length && ci < stco.length) {
        var pos = stco(ci)
        var inChunk = 0
        val cap = perChunk(ci)
        while (si < stsz.length && inChunk < cap) {
          val sz = stsz(si)
          if (sz < 0 || pos < 0 || pos.toLong + sz > payload.length) return None
          out += java.util.Arrays.copyOfRange(payload, pos, pos + sz)
          pos += sz; si += 1; inChunk += 1
        }
        ci += 1
      }
      if (si != stsz.length) return None // chunks didn't cover all samples
      Some((w, h, fcc, out.result()))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** 'RIFF....AVI ' magic sniff — the fourth container family. */
  def looksLikeAvi(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'A' && payload(9) == 'V' &&
      payload(10) == 'I' && payload(11) == ' '

  private def le32At(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** A real uncompressed-DIB AVI ("Full Frames" video, fccHandler
    * 'DIB '): RIFF('AVI ') with the mandatory hdrl (avih + one strl of
    * strh/strf) and a movi LIST of one '00db' chunk per frame — each
    * chunk the exact bottom-up BGR pixel array [[bmp]] would store
    * after its 54-byte header, so frames stay byte-delimited (like
    * the BMP container, unlike GIF/TIFF) AND the decode is lossless
    * (a JPEG-compressed AVI would break the closed-form pixel-sum
    * oracle). Word-aligned chunks per the RIFF spec. */
  def aviDib(width: Int, height: Int, seed: Int, nFrames: Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames >= 1,
      s"bad avi spec ${width}x$height x$nFrames")
    val stride = rowSize(width)
    val frameBytes = height * stride // even: stride is 4-aligned
    val frames = (0 until nFrames).map { f =>
      java.util.Arrays.copyOfRange(bmp(width, height, seed + f), 54,
        54 + frameBytes)
    }
    val strh = new Array[Byte](56)
    "vids".getBytes("US-ASCII").copyToArray(strh, 0)
    "DIB ".getBytes("US-ASCII").copyToArray(strh, 4)
    putLe32(strh, 20, 1)          // dwScale
    putLe32(strh, 24, 10)         // dwRate: 10 fps
    putLe32(strh, 32, nFrames)    // dwLength
    putLe32(strh, 36, frameBytes) // dwSuggestedBufferSize
    val strf = new Array[Byte](40) // BITMAPINFOHEADER
    putLe32(strf, 0, 40); putLe32(strf, 4, width); putLe32(strf, 8, height)
    strf(12) = 1 // planes
    strf(14) = 24 // bit count
    putLe32(strf, 20, frameBytes) // biSizeImage (biCompression = 0 = BI_RGB)
    val avih = new Array[Byte](56)
    putLe32(avih, 0, 100000)     // usec/frame
    putLe32(avih, 16, nFrames)   // total frames
    putLe32(avih, 24, 1)         // streams
    putLe32(avih, 28, frameBytes)
    putLe32(avih, 32, width); putLe32(avih, 36, height)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + body.length + (body.length & 1))
      id.getBytes("US-ASCII").copyToArray(out, 0)
      putLe32(out, 4, body.length)
      body.copyToArray(out, 8)
      out
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.map(chunk("00db", _)).reduce(_ ++ _))
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  /** Demux a DIB AVI: RIFF walk to the first video stream's
    * BITMAPINFOHEADER (dims; must be the uncompressed 24-bit DIB this
    * path decodes losslessly) and the movi LIST's '00db'/'00dc'
    * frame chunks. Returns (width, height, raw DIB chunks) — the
    * chunks are byte-delimited frames (their length is the
    * closed-form h×stride), decoded via [[dibFrameToImage]]. None for
    * non-AVI, compressed-codec AVI (MJPEG etc. — the genuine non-JDK
    * fallback), or any structural damage (NonFatal walk). */
  def aviDibFrames(payload: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    if (!looksLikeAvi(payload)) return None
    try {
      var w = 0; var h = 0; var bpp = 0; var comp = -1
      val frames = Seq.newBuilder[Array[Byte]]
      def walk(from: Int, until: Int): Unit = {
        var off = from
        while (off + 8 <= until) {
          val id = fourcc(payload, off)
          val size = le32At(payload, off + 4)
          if (size < 0 || off + 8 + size > until) return // truncated: stop
          if (id == "LIST" && size >= 4) {
            val kind = fourcc(payload, off + 8)
            if (kind == "hdrl" || kind == "strl" || kind == "movi" || kind == "rec ")
              walk(off + 12, off + 8 + size)
          } else if (id == "strf" && comp == -1 && size >= 40) {
            w = le32At(payload, off + 8 + 4)
            h = le32At(payload, off + 8 + 8)
            bpp = (payload(off + 8 + 14) & 0xff) | ((payload(off + 8 + 15) & 0xff) << 8)
            comp = le32At(payload, off + 8 + 16)
          } else if ((id == "00db" || id == "00dc") && size > 0) {
            frames += java.util.Arrays.copyOfRange(payload, off + 8, off + 8 + size)
          }
          off += 8 + size + (size & 1) // RIFF word alignment
        }
      }
      walk(12, payload.length)
      val fs = frames.result()
      if (w <= 0 || h <= 0 || bpp != 24 || comp != 0 || fs.isEmpty) None
      else Some((w, h, fs))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Decode one raw DIB frame chunk by reconstructing the 54-byte BMP
    * header in front of it and handing the result to the REAL
    * stock-JDK BMP reader — the pixel array is byte-identical either
    * way, so this is a genuine decode, not arithmetic on trust. */
  def dibFrameToImage(width: Int, height: Int,
      dib: Array[Byte]): Option[BufferedImage] = {
    val out = new Array[Byte](54 + dib.length)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length)
    putLe32(out, 10, 54); putLe32(out, 14, 40)
    putLe32(out, 18, width); putLe32(out, 22, height)
    out(26) = 1; out(28) = 24
    putLe32(out, 34, dib.length)
    dib.copyToArray(out, 54)
    decode(out)
  }

  /** Demux+decode every frame of an animated GIF through the stock-JDK
    * reader (`getNumImages(true)` walks the container's image blocks —
    * a genuine standard-format demux). Frames here are written
    * full-size with no disposal deltas, so `read(i)` IS frame i;
    * None on a non-GIF or unreadable payload (callers fall back). */
  def gifFrames(payload: Array[Byte]): Option[Seq[BufferedImage]] = {
    if (!looksLikeGif(payload)) return None
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      Some((0 until n).map(reader.read(_)))
    } catch {
      // NonFatal, not just IOException: the JDK GIF decoder throws
      // unchecked exceptions (AIOOBE and friends) on payloads that
      // pass the 6-byte sniff but are truncated or corrupt — those
      // must degrade to the caller's fallback, not kill the task
      case scala.util.control.NonFatal(_) => None
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Perceptual average-hash (aHash) of a decoded image, as a
    * 2·dim-hex-char string (dim=8 → the classic 64-bit hash, 16 hex
    * chars). The image is sampled on a dim×dim grid with the same
    * nearest-neighbor rule as [[resizeNearest]]; each cell's
    * luminance is the integer r+g+b; a cell's bit is set when its
    * luminance is ≥ the grid mean — compared as
    * `lum · dim² >= Σ lums`, exact integer arithmetic with no
    * division, so the bit pattern is reproducible by a SQL oracle.
    * Byte y packs row y's bits LSB-first (x=0 → bit 0); the hex
    * string concatenates bytes y=0..dim-1 — a string avoids BIGINT
    * sign trouble at bit 63 and compares/groups just as cheaply. */
  def aHashHex(img: BufferedImage, dim: Int = 8): String = {
    // dim capped at 8: each row packs into ONE %02x byte — wider rows
    // would emit variable-width hex tokens whose concatenation is
    // ambiguous (0x123·0x04 vs 0x12·0x304 collide)
    require(dim > 0 && dim <= 8, s"hash grid must be 1..8, got $dim")
    val lums = new Array[Int](dim * dim)
    var total = 0L
    var y = 0
    while (y < dim) {
      val sy = y * img.getHeight / dim
      var x = 0
      while (x < dim) {
        val rgb = img.getRGB(x * img.getWidth / dim, sy)
        val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        lums(y * dim + x) = lum
        total += lum
        x += 1
      }
      y += 1
    }
    val sb = new StringBuilder(2 * dim)
    y = 0
    while (y < dim) {
      var b = 0
      var x = 0
      while (x < dim) {
        if (lums(y * dim + x).toLong * (dim * dim) >= total) b |= 1 << x
        x += 1
      }
      sb.append(f"$b%02x")
      y += 1
    }
    sb.toString
  }

  /** md5 hex of a UTF-8 string — the JVM twin of SQL `md5(text)`, used
    * by the fixture generators so their dimension/seed derivations
    * match the oracle's byte-for-byte. */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
