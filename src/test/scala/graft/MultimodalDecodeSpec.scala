package graft

import org.apache.spark.sql.functions._
import graft.ops.{MediaRecord, Multimodal}

/** The REAL JDK decode path ([[graft.ops.Multimodal.decodeReal]]):
  * genuine PNG/JPEG/WAV bytes in, genuine dimensions out, corruption as
  * NULL metadata — no stub anywhere in this suite. */
class MultimodalDecodeSpec extends SparkSuite {
  import spark.implicits._

  private def rec(id: Long, tpe: String, payload: Array[Byte], fmt: String) =
    MediaRecord(id, tpe, payload, payload.length, fmt)

  test("decodeReal reads a real generated PNG: exact dims, exact pixels") {
    val bytes = Multimodal.pngBytes(13, 7)
    // byte-for-byte deterministic generation (same JDK encoder, same input)
    assert(bytes.sameElements(Multimodal.pngBytes(13, 7)))
    val f = Multimodal.decodeReal(rec(1L, "image", bytes, "png"))
    assert(f.decode_ok && f.width.contains(13) && f.height.contains(7) &&
      f.duration_ms.contains(0L))
    // the decoded image carries the exact deterministic fill we wrote
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val expected = 0xff000000 | ((13 * 31 + 7) * 2654435761L & 0xffffffL).toInt
    assert(img.getRGB(0, 0) == expected && img.getRGB(12, 6) == expected)
  }

  test("decodeReal reads a real JPEG via its magic, not its claimed format") {
    val img = new java.awt.image.BufferedImage(
      21, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val f = Multimodal.decodeReal(rec(2L, "image", bos.toByteArray, "jpg"))
    assert(f.decode_ok && f.width.contains(21) && f.height.contains(9))
  }

  test("decodeReal reads a real WAV: floored duration from the RIFF walk") {
    // 1234 samples, mono 16-bit @8kHz: 2468 bytes / 16000 B/s = 154.25ms -> 154
    val f = Multimodal.decodeReal(rec(3L, "audio", Multimodal.wavBytes(1234), "wav"))
    assert(f.decode_ok && f.duration_ms.contains(154L) &&
      f.width.contains(0) && f.height.contains(0))
    assert(Multimodal.wavDurationMs(Multimodal.wavBytes(8000)).contains(1000L))
  }

  test("wavPcm16Stats: exact sample scan — model equality, truncation, hostile sizes") {
    // the generated tone matches a direct scala model of the formula
    val id = 7L
    val n = 160
    val bytes = Multimodal.toneWavBytes(id, n)
    val samples = (0 until n).map(i => (((id * 31 + i.toLong * 7) % 2003) - 1001))
    val expSum = samples.map(math.abs).sum
    val expPeak = samples.map(math.abs).max
    val expX = samples.sliding(2).count { case Seq(a, b) => (a < 0) != (b < 0) }
    assert(Multimodal.wavPcm16Stats(bytes)
      .contains((n.toLong, expSum, expPeak, expX.toLong)))
    // duration walk still reads the same payload (shared RIFF layout):
    // dataLen·1000/byteRate = (2n)·1000/16000 = n/8 ms
    assert(Multimodal.wavDurationMs(bytes).contains(n.toLong * 2 * 1000 / 16000))
    // silence: all-zero samples — zero sum, zero peak, zero crossings
    assert(Multimodal.wavPcm16Stats(Multimodal.wavBytes(80))
      .contains((80L, 0L, 0L, 0L)))
    // truncation and garbage return None, never throw
    assert(Multimodal.wavPcm16Stats(bytes.take(8)).isEmpty)
    assert(Multimodal.wavPcm16Stats(bytes.take(50)).isEmpty) // data chunk cut short
    assert(Multimodal.wavPcm16Stats(Array.fill[Byte](40)(0x41)).isEmpty)
    // hostile chunk size near Int.MAX must walk to None, not throw
    val hostile = bytes.clone()
    val bb = java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue - 2) // corrupt the data chunk size
    assert(Multimodal.wavPcm16Stats(hostile).isEmpty)
  }

  test("realAudioMedia -> audioSampleStats: formulas hold end-to-end, corruption flagged") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val rows = Multimodal.audioSampleStats(
      Multimodal.realAudioMedia(ids, "doc_id", corruptMod = 19)).collect()
    assert(rows.length == 40)
    rows.foreach { st =>
      val id = st.media_id
      if (id % 19 == 0) {
        assert(!st.decode_ok && st.n_samples.isEmpty && st.sum_abs.isEmpty &&
          st.peak_abs.isEmpty && st.n_crossings.isEmpty, s"id $id should be corrupt")
      } else {
        val n = 80 * (1 + (id % 25)).toInt
        val samples = (0 until n).map(i => (((id * 31 + i.toLong * 7) % 2003) - 1001))
        assert(st.decode_ok && st.n_samples.contains(n.toLong) &&
          st.sum_abs.contains(samples.map(math.abs).sum) &&
          st.peak_abs.contains(samples.map(math.abs).max) &&
          st.n_crossings.contains(
            samples.sliding(2).count { case Seq(a, b) => (a < 0) != (b < 0) }.toLong),
          s"bad sample stats at id $id: $st")
      }
    }
  }

  test("audioFingerprint64: model equality, gain invariance, classes far apart") {
    // direct scala model of the 64-block sign pattern
    val bytes = Multimodal.audioClassPayload(3)
    val n = (bytes.length - 44) / 2
    def sample(i: Int): Long = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.getShort(44 + 2 * i).toLong
    }
    val total = (0 until n).map(sample).sum
    var exp = 0L
    for (b <- 0 until 64) {
      val (s0, s1) = ((b.toLong * n / 64).toInt, ((b + 1).toLong * n / 64).toInt)
      val s = (s0 until s1).map(sample).sum
      if (s * n > total * (s1 - s0)) exp |= (1L << b)
    }
    assert(Multimodal.audioFingerprint64(bytes).contains(exp))
    // loudness-shape invariance: doubling every sample keeps the pattern
    val loud = bytes.clone()
    val bb = java.nio.ByteBuffer.wrap(loud).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until n) bb.putShort(44 + 2 * i, (sample(i) * 2).toShort)
    assert(Multimodal.audioFingerprint64(loud).contains(exp))
    // silence has no shape: all-zero samples -> fingerprint 0
    assert(Multimodal.audioFingerprint64(Multimodal.wavBytes(128)).contains(0L))
    // too short / corrupt -> None
    assert(Multimodal.audioFingerprint64(Multimodal.wavBytes(63)).isEmpty)
    assert(Multimodal.audioFingerprint64(bytes.take(8)).isEmpty)
    // the 40 class fingerprints are pairwise > 8 bit flips apart — the
    // separation the neardup oracle's class-equality join relies on
    val fps = (0 until 40).map(c =>
      Multimodal.audioFingerprint64(Multimodal.audioClassPayload(c)).get)
    for (i <- 0 until 40; j <- (i + 1) until 40) {
      val ham = java.lang.Long.bitCount(fps(i) ^ fps(j))
      assert(ham > 8, s"classes $i and $j only $ham bits apart")
    }
  }

  test("cmpProd128: exact a*b vs c*d sign at and past Long overflow (BigInteger model)") {
    import java.math.BigInteger
    def model(a: Long, b: Long, c: Long, d: Long): Int =
      BigInteger.valueOf(a).multiply(BigInteger.valueOf(b))
        .compareTo(BigInteger.valueOf(c).multiply(BigInteger.valueOf(d))).sign
    val interesting = Seq(0L, 1L, -1L, 2L, -2L, 1000L, -999L,
      Int.MaxValue.toLong, Long.MaxValue, Long.MinValue, Long.MaxValue / 3,
      3037000499L /* ~sqrt(Long.Max): products straddle the overflow line */,
      3037000500L, -3037000499L)
    for (a <- interesting; b <- interesting; c <- interesting; d <- interesting)
      assert(Multimodal.cmpProd128(a, b, c, d).sign == model(a, b, c, d),
        s"cmpProd128($a,$b,$c,$d)")
    // the exact ADVICE scenario: s·n past 2^63 with positive means — the
    // wrapped compare flipped the sign; the 128-bit one must not
    val n = 200000000L // 2e8 samples (~400 MB data chunk)
    val s = 32767L * n / 64 // a max-amplitude block sum: s·n ≈ 2e19 > Long.Max
    assert(Multimodal.cmpProd128(s, n, 1L, n / 64) == model(s, n, 1L, n / 64))
    assert(BigInteger.valueOf(s).multiply(BigInteger.valueOf(n)) !=
      BigInteger.valueOf(s * n), "sanity: the old compare genuinely wrapped here")
  }

  test("classedAudioMedia -> fingerprint neardups: same class pairs exactly, hamming 0") {
    import spark.implicits._
    val ids = (0L until 30L).toDF("doc_id")
    val pairs = Multimodal.phashNearDups(
      Multimodal.decodeAudioFingerprint(
        Multimodal.classedAudioMedia(ids, "doc_id", classes = 10)),
      maxHamming = 0)
      .select("media_id_a", "media_id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val expected = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L if a % 10 == b % 10
    } yield (a, b, 0L)).toSet
    assert(pairs == expected)
  }

  test("mp4Metadata: real moov/mvhd box walk — exact units, both versions, hostile bytes") {
    // v0 round-trip at timescale 600: 40·(1+k) ms are whole 600ths
    val v0 = Multimodal.mp4Bytes(durationMs = 2000L, timescale = 600)
    assert(v0.length == 132)
    assert(Multimodal.mp4Metadata(v0).contains((600L, 2000L)))
    val f = Multimodal.decodeReal(rec(7L, "video", v0, "mp4"))
    assert(f.decode_ok && f.duration_ms.contains(2000L) &&
      f.width.contains(0) && f.height.contains(0))
    // flooring: 100 units at timescale 3 = 33333.33ms -> 33333
    def patchTs(a: Array[Byte], ts: Int, dur: Int): Array[Byte] = {
      val c = a.clone()
      val bb = java.nio.ByteBuffer.wrap(c)
      bb.putInt(24 + 8 + 12, ts).putInt(24 + 8 + 16, dur) // mvhd body at 32
      c
    }
    assert(Multimodal.mp4Metadata(patchTs(v0, 3, 100)).contains((3L, 33333L)))
    // a VERSION-1 mvhd (64-bit creation/modification/duration): build by hand
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 44)
    bb.putInt(16).put("ftyp".getBytes("US-ASCII")).putInt(0x69736f6d).putInt(0)
      .putInt(8 + 44).put("moov".getBytes("US-ASCII"))
      .putInt(44).put("mvhd".getBytes("US-ASCII"))
      .putInt(0x01000000) // version 1
      .putLong(0L).putLong(0L) // creation, modification (64-bit)
      .putInt(1000).putLong(12345L) // timescale, duration (64-bit)
    assert(Multimodal.mp4Metadata(bb.array()).contains((1000L, 12345L)))
    // hostile inputs return None, never throw:
    assert(Multimodal.mp4Metadata(v0.take(8)).isEmpty) // truncated container
    assert(Multimodal.mp4Metadata(v0.take(40)).isEmpty) // moov cut mid-box
    val zeroTs = patchTs(v0, 0, 100) // zero timescale must not divide
    assert(Multimodal.mp4Metadata(zeroTs).isEmpty)
    val badSize = v0.clone() // moov claims a size past the payload end
    java.nio.ByteBuffer.wrap(badSize).putInt(16, 4096)
    assert(Multimodal.mp4Metadata(badSize).isEmpty)
    val tinySize = v0.clone() // box size smaller than its own header
    java.nio.ByteBuffer.wrap(tinySize).putInt(16, 3)
    assert(Multimodal.mp4Metadata(tinySize).isEmpty)
    assert(!Multimodal.decodeReal(rec(8L, "video", v0.take(8), "mp4")).decode_ok)
  }

  test("realVideoMedia -> decodeRealFeatures: container formulas hold, corruption flagged") {
    val ids = spark.range(0, 60).toDF("doc_id")
    val rows = Multimodal.decodeRealFeatures(
      Multimodal.realVideoMedia(ids, "doc_id", corruptMod = 19)).collect()
    assert(rows.length == 60)
    rows.foreach { f =>
      assert(f.media_type == "video")
      if (f.media_id % 19 == 0)
        assert(!f.decode_ok && f.duration_ms.isEmpty && f.n_bytes == 8,
          s"id ${f.media_id} should be a truncated container")
      else
        assert(f.decode_ok && f.n_bytes == 132 &&
          f.duration_ms.contains(40L * (1 + f.media_id % 50)),
          s"bad mp4 walk at id ${f.media_id}: $f")
    }
  }

  test("corruption is data: truncated/garbage payloads yield NULLs, not throws") {
    // magic intact but body gone -> ImageIO returns null -> fail
    val cutPng = Multimodal.decodeReal(
      rec(4L, "image", Multimodal.pngBytes(70, 70).take(8), "png"))
    assert(!cutPng.decode_ok && cutPng.width.isEmpty && cutPng.height.isEmpty &&
      cutPng.duration_ms.isEmpty)
    // RIFF magic gone entirely -> unknown format -> fail
    val cutWav = Multimodal.decodeReal(
      rec(5L, "audio", Multimodal.wavBytes(100).take(8), "wav"))
    assert(!cutWav.decode_ok && cutWav.duration_ms.isEmpty)
    val garbage = Multimodal.decodeReal(
      rec(6L, "image", Array.tabulate[Byte](64)(i => (i * 7).toByte), "png"))
    assert(!garbage.decode_ok)
    // ADVICE r12: a hostile chunk size near Int.MAX must return None from
    // wavDurationMs ITSELF (Long walk position) — an Int pos wrapped
    // negative and threw from the chunk-id read instead
    val hostile = Multimodal.wavBytes(100)
    java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, 0x7ffffff0) // fmt chunk claims ~2^31 bytes
    assert(Multimodal.wavDurationMs(hostile).isEmpty)
  }

  test("aHash64: real pixel hash — identical images equal, 50 classes far apart") {
    // determinism + identity: the same pattern hashes the same
    val a = Multimodal.aHash64(Multimodal.patternPngBytes(70, 75, 7))
    assert(a.isDefined && a == Multimodal.aHash64(Multimodal.patternPngBytes(70, 75, 7)))
    // a changed pattern changes pixels, hence the hash
    assert(a != Multimodal.aHash64(Multimodal.patternPngBytes(70, 75, 8)))
    // the near-dup oracle's completeness margin: the 50 class images of
    // classedMedia sit pairwise > 8 bit flips apart, so the hamming-0
    // query below them cannot emit a cross-class pair
    val hashes = (0 until 50).map { c =>
      Multimodal.aHash64(Multimodal.patternPngBytes(64 + c % 29, 64 + c % 31, c)).get
    }
    for (i <- 0 until 50; j <- i + 1 until 50) {
      val d = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
      assert(d > 8, s"classes $i and $j only $d bit flips apart")
    }
    // undecodable payloads hash to None, never a fake value
    assert(Multimodal.aHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.aHash64(Multimodal.pngBytes(70, 70).take(8)).isEmpty)
  }

  test("classedMedia -> decodeAHash: same class same hash, hamming-0 pairs exact") {
    val ids = spark.range(0, 40).toDF("doc_id") // classes 0..39, ids 0..39 distinct
    val hashed = Multimodal.decodeAHash(Multimodal.classedMedia(ids, "doc_id", classes = 10))
    val rows = hashed.as[(Long, Long)].collect().toMap
    assert(rows.size == 40)
    // ids 3, 13, 23, 33 share class 3 -> identical hash
    assert(Set(rows(3L), rows(13L), rows(23L), rows(33L)).size == 1)
    val pairs = Multimodal.phashNearDups(hashed, maxHamming = 0)
      .as[(Long, Long, Long)].collect().toSet
    val expected = (for {
      a <- 0L until 40L; b <- a + 1 until 40L if a % 10 == b % 10
    } yield (a, b, 0L)).toSet
    assert(pairs == expected)
  }

  test("realMedia -> decodeRealFeatures end-to-end: formulas hold, corruption flagged") {
    val ids = spark.range(0, 60).toDF("doc_id")
    val feats = Multimodal.decodeRealFeatures(
      Multimodal.realMedia(ids, "doc_id", corruptMod = 19))
    val rows = feats.collect()
    assert(rows.length == 60)
    rows.foreach { f =>
      val id = f.media_id
      if (id % 19 == 0) {
        assert(!f.decode_ok && f.width.isEmpty && f.height.isEmpty && f.duration_ms.isEmpty,
          s"id $id should be corrupt")
      } else if (id % 2 == 0) {
        assert(f.decode_ok && f.media_type == "image" &&
          f.width.contains(64 + (id % 29).toInt) &&
          f.height.contains(64 + (id % 31).toInt) && f.duration_ms.contains(0L),
          s"bad image decode at id $id: $f")
      } else {
        assert(f.decode_ok && f.media_type == "audio" &&
          f.duration_ms.contains(10L * (1 + id % 25)), s"bad wav decode at id $id: $f")
      }
    }
    // integrityAudit over the REAL frame: null_metadata counts exactly the
    // corrupted rows (0, 19, 38, 57), failed images also fail dims/duration
    val media = Multimodal.realMedia(ids, "doc_id", corruptMod = 19)
      .toDF().select(col("media_id"), col("format"))
    val audit = Multimodal.integrityAudit(feats.toDF().join(media, "media_id"),
      formatCol = Some("format"))
      .select("check_name", "n_violations").as[(String, Long)].collect().toMap
    assert(audit("null_metadata") == 4L)
    assert(audit("image_bad_dims") == 2L) // corrupt EVEN ids: 0, 38
    assert(audit("image_with_duration") == 2L)
    assert(audit("audio_with_dims") == 2L) // corrupt ODD ids: 19, 57
    assert(audit("empty_payload") == 0L && audit("type_format_mismatch") == 0L)
  }
}
