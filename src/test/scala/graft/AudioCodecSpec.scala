package graft

import graft.operators.{AudioCodec, Multimodal}

/** The real-audio layer behind q94: the deterministic WAV writer must
  * be a genuine RIFF stream (the stock-JDK sound stack decodes it to
  * exactly the samples the closed-form oracle predicts), and the
  * partitioned decode must surface integer-exact features. */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  test("wav bytes are a real audio stream: javax.sound decodes exact rate and samples") {
    for ((n, rate, seed) <- Seq((64, 8000, 0), (777, 16000, 255), (2111, 20000, 129))) {
      val bytes = AudioCodec.wav(n, rate, seed)
      assert(bytes.length === AudioCodec.wavSize(n))
      val d = AudioCodec.decode(bytes).getOrElse(fail(s"JDK rejected $n@$rate"))
      assert(d.sampleRate === rate && d.samples.length === n)
      (0 until n).foreach(i => assert(d.samples(i) === AudioCodec.sample(seed, i)))
    }
  }

  test("sample values span negative and positive and stay in 16-bit range") {
    val vals = (0 until 2048).map(AudioCodec.sample(7, _))
    assert(vals.min < 0 && vals.max > 0)
    assert(vals.forall(v => v >= -32768 && v <= 32767))
  }

  test("peak/energy agree with direct recomputation") {
    val d = AudioCodec.decode(AudioCodec.wav(500, 12000, 42)).get
    val expectPeak = d.samples.map(v => Math.abs(v.toLong)).max
    val expectEnergy = d.samples.map(v => v.toLong * v).sum
    assert(AudioCodec.peakAbs(d.samples) === expectPeak)
    assert(AudioCodec.energy(d.samples) === expectEnergy)
  }

  test("decode returns None on non-audio payloads instead of throwing") {
    assert(AudioCodec.decode("definitely not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decode(Array.empty[Byte]).isEmpty)
    // a real image is not audio either
    assert(AudioCodec.decode(graft.operators.ImageCodec.bmp(8, 8, 1)).isEmpty)
  }

  test("audioFromDocuments -> decodeAudioPartitioned round-trips real decode on Spark") {
    val docs = Seq((1L, "hello world"), (2L, "audio fixture text")).toDF("doc_id", "text")
    val out = Multimodal.decodeAudioPartitioned(
      Multimodal.audioFromDocuments(docs, "doc_id", "text")).orderBy("media_id").collect()
    assert(out.length === 2)
    out.foreach { r =>
      val n = r.getAs[Long]("n_samples")
      assert(n >= 64 && n < 2112) // generator range, REAL decoded count
      assert(Set(8000, 12000, 16000, 20000).contains(r.getAs[Int]("sample_rate")))
      assert(r.getAs[Long]("byte_len") === 44L + 2L * n)
      assert(r.getAs[Long]("duration_ms") ===
        n * 1000L / r.getAs[Int]("sample_rate"))
      assert(r.getAs[Long]("energy") > 0L)
    }
  }

  test("bandFingerprint: hand-checked bits, slice rule, identical-signal collision") {
    // 4 samples into 4 slices: energies (1, 4, 9, 4) -> deltas (+, +, -)
    // -> bits 011 (LSB = slice-1 transition) = 3
    assert(AudioCodec.bandFingerprint(Array(1, 2, 3, 2), frames = 4) === 3L)
    // slice rule i*frames div n: 6 samples, 3 slices -> pairs (1,2|3,4|5,6)
    // energies (5, 25, 61): rising twice -> bits 11 = 3
    assert(AudioCodec.bandFingerprint(Array(1, 2, 3, 4, 5, 6), frames = 3) === 3L)
    // strict >: a flat signal has no rising transition
    assert(AudioCodec.bandFingerprint(Array.fill(64)(7), frames = 8) === 0L)
    // identical signals always collide; sign bit never set (frames <= 63)
    val d = AudioCodec.decode(AudioCodec.wav(777, 16000, 99)).get
    val fp = AudioCodec.bandFingerprint(d.samples, frames = 32)
    assert(fp === AudioCodec.bandFingerprint(d.samples.clone(), frames = 32))
    assert(fp >= 0L)
    assert(AudioCodec.bandFingerprint(Array.empty[Int], frames = 8) === 0L)
    intercept[IllegalArgumentException](AudioCodec.bandFingerprint(Array(1), frames = 1))
    intercept[IllegalArgumentException](AudioCodec.bandFingerprint(Array(1), frames = 64))
  }

  test("fingerprintAudioPartitioned: dup groups collide exactly on equal signals") {
    // same text -> same (n, rate, seed) triple -> identical WAV bytes
    val docs = Seq((1L, "dup text"), (2L, "dup text"), (3L, "other text"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val fps = Multimodal.fingerprintAudioPartitioned(
      Multimodal.audioFromDocuments(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(fps(1L).isDefined && fps(1L) === fps(2L)) // identical signal collides
    assert(fps(4L).isEmpty)                          // NULL payload -> no fingerprint
    // decode path is REAL: a corrupt payload yields NULL, not a crash
    val junk = Seq((9L, "image/bmp", Array[Byte](1, 2, 3)))
      .toDF("media_id", "mime", "payload")
    val j = Multimodal.fingerprintAudioPartitioned(junk).collect()
    assert(j.length === 1 && j.head.isNullAt(4))
  }
}
