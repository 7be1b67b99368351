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
}
