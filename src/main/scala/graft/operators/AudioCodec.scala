package graft.operators

import java.io.ByteArrayInputStream

/** Pure-JVM audio codec for the multimodal operators — the audio twin
  * of [[ImageCodec]]: a deterministic 16-bit PCM mono WAV writer
  * (RIFF layout is fixed, so byte length and every sample value are
  * arithmetically known to the oracle), the stock-JDK
  * `javax.sound.sampled` reader as the real decoder, and integer-exact
  * feature extraction (peak / energy) so the DuckDB twin can
  * recompute the decoded signal's stats without parsing a byte.
  *
  * Why WAV/PCM: the one audio format that is (a) readable by the JDK
  * with no native deps, (b) lossless — sample bytes are the signal,
  * no psychoacoustic compressor in the way — and (c) simple enough
  * for the fixture generator to emit directly. Sample i of a
  * generated file is `((seed + 1) * 40503 * (i + 1) mod 65536) -
  * 32768`: all arithmetic stays in positive BIGINT range, so Spark
  * and DuckDB compute identical values.
  *
  * The reference carries media only as a URL string column
  * (/root/reference/dags/Extract.py:21-24); this file is part of the
  * §8 LLM-pipeline extension surface.
  */
object AudioCodec {

  /** RIFF header (44 bytes) + 2 bytes per mono 16-bit sample. */
  def wavSize(nSamples: Int): Int = 44 + 2 * nSamples

  /** Deterministic sample value — the SQL twin evaluates this same
    * expression. Kept multiplicative (no i*const sum) so neighboring
    * docs do not produce correlated signals. */
  def sample(seed: Int, i: Int): Int =
    ((((seed + 1).toLong * 40503L * (i + 1).toLong) % 65536L) - 32768L).toInt

  /** Deterministic 16-bit PCM mono WAV. */
  def wav(nSamples: Int, sampleRate: Int, seed: Int): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0, s"bad wav params $nSamples@$sampleRate")
    val b = new Array[Byte](wavSize(nSamples))
    def ascii(off: Int, s: String): Unit = { var i = 0; while (i < s.length) { b(off + i) = s.charAt(i).toByte; i += 1 } }
    def le32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    ascii(0, "RIFF"); le32(4, 36 + 2 * nSamples); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, sampleRate); le32(28, sampleRate * 2) // byte rate
    le16(32, 2); le16(34, 16) // block align, bits/sample
    ascii(36, "data"); le32(40, 2 * nSamples)
    var i = 0
    while (i < nSamples) { le16(44 + 2 * i, sample(seed, i) & 0xffff); i += 1 }
    b
  }

  /** Decoded signal: the format header fields plus every sample. */
  final case class Decoded(sampleRate: Int, samples: Array[Int])

  /** Real decode via the stock-JDK sound stack. None when the payload
    * is not a readable 16-bit PCM stream (callers fall back to the
    * stub path). */
  def decode(payload: Array[Byte]): Option[Decoded] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
      else {
        val bytes = in.readAllBytes()
        val little = !fmt.isBigEndian
        val out = new Array[Int](bytes.length / 2)
        var i = 0
        while (i < out.length) {
          val lo = bytes(2 * i) & 0xff; val hi = bytes(2 * i + 1) & 0xff
          out(i) = (if (little) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
          i += 1
        }
        Some(Decoded(fmt.getSampleRate.toInt, out))
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** max |sample| — clipping/silence detector. */
  def peakAbs(samples: Array[Int]): Long = {
    var m = 0L; var i = 0
    while (i < samples.length) { val a = Math.abs(samples(i).toLong); if (a > m) m = a; i += 1 }
    m
  }

  /** Σ sample² — integer-exact signal energy (max 2^30 per sample ×
    * corpus-scale counts fits BIGINT; the float RMS is derivable but
    * not oracle-comparable, so the exact integer IS the feature). */
  def energy(samples: Array[Int]): Long = {
    var s = 0L; var i = 0
    while (i < samples.length) { val v = samples(i).toLong; s += v * v; i += 1 }
    s
  }

  /** Acoustic fingerprint: the energy-delta SIGN profile over `frames`
    * equal time slices — the shape every landmark fingerprinter
    * (Haitsma–Kalker, Shazam's band deltas) reduces to, collapsed to
    * one band so the bits are integer-exact and the SQL twin can
    * recompute them. Sample i lands in slice `i·frames div n`; bit
    * f−1 is set iff slice f's Σv² strictly exceeds slice f−1's. Two
    * captures of the same signal (same samples) always collide; the
    * sign quantization makes the value robust to uniform gain in a
    * real float pipeline. Integer-exact: e ≤ 2^30·n fits a Long. */
  def bandFingerprint(samples: Array[Int], frames: Int): Long = {
    require(frames >= 2 && frames <= 63, s"frames must be in [2, 63], got $frames")
    val n = samples.length
    if (n == 0) return 0L
    val e = new Array[Long](frames)
    var i = 0
    while (i < n) {
      val f = (i.toLong * frames / n).toInt
      val v = samples(i).toLong
      e(f) += v * v
      i += 1
    }
    var fp = 0L; var f = 1
    while (f < frames) { if (e(f) > e(f - 1)) fp |= 1L << (f - 1); f += 1 }
    fp
  }
}
