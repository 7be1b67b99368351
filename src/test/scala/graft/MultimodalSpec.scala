package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello world"), (2L, "binary payload test"))
    .toDF("doc_id", "text")

  test("mediaFromDocuments produces the opaque-binary media shape") {
    val media = Multimodal.mediaFromDocuments(docs, "doc_id", "text")
    assert(media.columns.toSeq === Seq("media_id", "mime", "payload"))
    val r = media.orderBy("media_id").collect()(0)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "hello world")
    assert(r.getString(1).startsWith("application/x-demo-"))
  }

  test("extractFeatures (expression path) and decodePartitioned (mapPartitions path) agree on metadata") {
    val media = Multimodal.mediaFromDocuments(docs, "doc_id", "text")
    // width/height included: both paths must share ONE dimension
    // derivation (md5-based), not diverge per API
    val a = Multimodal.extractFeatures(media)
      .select("media_id", "byte_len", "content_md5", "width", "height")
      .orderBy("media_id")
    val b = Multimodal.decodePartitioned(media)
      .select("media_id", "byte_len", "content_md5", "width", "height")
      .orderBy("media_id")
    assert(orderedRows(a) === orderedRows(b))
  }

  test("stub decode dimensions are deterministic and within the stub range") {
    val out = Multimodal.decodePartitioned(
      Multimodal.mediaFromDocuments(docs, "doc_id", "text")).collect()
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(w >= 64 && w < 64 + 1024)
      assert(h >= 64 && h < 64 + 1024)
    }
    val again = Multimodal.decodePartitioned(
      Multimodal.mediaFromDocuments(docs, "doc_id", "text")).collect()
    assert(out.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }

  test("resizePartitioned keeps ids and emits target dimensions with plausible bytes") {
    val media = Multimodal.mediaFromDocuments(
      Seq((1L, "some document text that is long enough to matter"),
          (2L, "x")).toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.resizePartitioned(media, 256, 256).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)), r.getAs[Array[Byte]]("payload").length)).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out.values.forall(_._1 == (256, 256)))
    assert(out.values.forall(_._2 >= 16)) // stub floor
  }

  test("real path: imagesFromDocuments emits genuine BMPs that decodePartitioned reads via ImageIO") {
    val media = Multimodal.imagesFromDocuments(docs, "doc_id", "text")
    val out = Multimodal.decodePartitioned(media).orderBy("media_id").collect()
    assert(out.length === 2)
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(w >= 8 && w < 72 && h >= 8 && h < 72) // generator range, REAL decoded dims
      assert(!r.isNullAt(r.fieldIndex("pixel_sum"))) // real decode happened
      assert(r.getAs[Long]("byte_len") ===
        graft.operators.ImageCodec.bmpSize(w, h).toLong)
    }
  }

  test("real path: resizePartitioned decodes, resamples and re-encodes a readable image") {
    val media = Multimodal.imagesFromDocuments(docs, "doc_id", "text")
    val out = Multimodal.resizePartitioned(media, 48, 48).orderBy("media_id").collect()
    out.foreach { r =>
      assert((r.getInt(2), r.getInt(3)) === ((48, 48)))
      // the re-encoded payload is itself a decodable 48x48 BMP whose
      // pixel sum matches the reported checksum — the resize is real
      val img = graft.operators.ImageCodec.decode(r.getAs[Array[Byte]]("payload")).get
      assert(img.getWidth === 48 && img.getHeight === 48)
      assert(graft.operators.ImageCodec.pixelSum(img) === r.getAs[Long]("pixel_sum"))
    }
  }

  test("real path: frameSample demuxes all FIVE containers (GIF + TIFF + AVI + MP4 + BMP)") {
    // ids spanning the formats: 5, 10 → GIF (id%5=0); 2, 7 → TIFF
    // (id%5=2); 3, 8 → uncompressed-DIB AVI (id%5=3); 4, 9 → ISO-BMFF
    // MP4 with 'DIB ' samples (id%5=4); 1, 6 → the length-prefixed
    // BMP container
    val vdocs = Seq((1L, "hello world"), (2L, "tiff doc"), (3L, "avi doc"),
      (4L, "mp4 doc"), (5L, "gif doc"), (6L, "bmp doc"),
      (7L, "another tiff doc"), (8L, "another avi doc"),
      (9L, "another mp4 doc"), (10L, "another gif doc"))
      .toDF("doc_id", "text")
    val media = Multimodal.videosFromDocuments(vdocs, "doc_id", "text")
    val out = Multimodal.frameSample(media, everyNth = 2, maxFrames = 3)
      .orderBy("media_id", "frame_idx").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(1) % 2 === 0) // sampled every 2nd frame
      assert(!r.isNullAt(r.fieldIndex("pixel_sum"))) // genuinely decoded
      if (r.getLong(0) % 5 == 0 || r.getLong(0) % 5 == 2)
        // GIF/TIFF frames are logical (one encoded stream) — no
        // per-frame bytes
        assert(r.isNullAt(r.fieldIndex("frame_bytes")))
      else if (r.getLong(0) % 5 == 3 || r.getLong(0) % 5 == 4)
        // AVI '00db' chunks and MP4 'DIB ' samples are the
        // header-less DIB pixel array
        assert(r.getAs[Long]("frame_bytes") ===
          graft.operators.ImageCodec.bmpSize(r.getInt(2), r.getInt(3)).toLong - 54L)
      else
        assert(r.getAs[Long]("frame_bytes") ===
          graft.operators.ImageCodec.bmpSize(r.getInt(2), r.getInt(3)).toLong)
    }
    assert(out.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    // all five container formats are present; each demux path decodes
    // to the SAME closed-form pixel sum family (ramp offset by frame)
    assert(out.exists(_.getLong(0) % 5 == 0)) // GIF
    assert(out.exists(_.getLong(0) % 5 == 2)) // TIFF
    assert(out.exists(_.getLong(0) % 5 == 3)) // AVI
    assert(out.exists(_.getLong(0) % 5 == 4)) // MP4
    assert(out.exists(_.getLong(0) % 5 == 1)) // BMP container
    // cross-check one TIFF doc's sums against the generator's closed
    // form, straight from the md5-nibble ground truth
    val hex = graft.operators.ImageCodec.md5Hex("tiff doc")
    val fw = (Integer.parseInt(hex.substring(0, 4), 16) % 24) + 8
    val fh = (Integer.parseInt(hex.substring(4, 8), 16) % 24) + 8
    val seed = Integer.parseInt(hex.substring(8, 12), 16) % 256
    out.filter(_.getLong(0) == 2L).foreach { r =>
      val f = r.getInt(1)
      assert(r.getInt(2) === fw && r.getInt(3) === fh)
      assert(r.getAs[Long]("pixel_sum") ===
        (for (y <- 0 until fh; x <- 0 until fw)
          yield 3L * ((seed + f + x + y) % 256)).sum)
    }
  }

  test("fallback path: non-image payloads keep stub metadata with NULL pixel_sum") {
    val media = Multimodal.mediaFromDocuments(docs, "doc_id", "text") // text bytes, not BMP
    val decoded = Multimodal.decodePartitioned(media).collect()
    decoded.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("pixel_sum")))
      assert(r.getAs[Int]("width") >= 64) // stub range, not the image range
    }
    val frames = Multimodal.frameSample(media, everyNth = 10, maxFrames = 8).collect()
    assert(frames.nonEmpty)
    frames.foreach(r => assert(r.isNullAt(r.fieldIndex("pixel_sum"))))
  }

  test("frameSample explodes each media row into capped, deterministic frames") {
    val media = Multimodal.mediaFromDocuments(
      Seq((1L, "word " * 200), (2L, "tiny")).toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.frameSample(media, everyNth = 10, maxFrames = 8).collect()
    val byId = out.groupBy(_.getLong(0))
    assert(byId(1L).length === 4) // 1000 bytes -> 31 frames -> idx 0,10,20,30
    assert(byId(2L).length === 1) // tiny payload -> single frame
    assert(byId(1L).map(_.getInt(1)).sorted.toSeq === Seq(0, 10, 20, 30))
    val again = Multimodal.frameSample(media, everyNth = 10, maxFrames = 8).collect()
    assert(out.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }
}
