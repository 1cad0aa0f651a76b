package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private lazy val payloads = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array.tabulate(64)(_.toByte)),
      (2L, Array.fill(256)(0x41.toByte)),
      (3L, Array.empty[Byte])
    ).toDF("id", "bin")
  }

  test("binaryMeta: columnar length + header without decode") {
    val out = payloads.select(col("id"), Multimodal.binaryMeta(col("bin")).as("m"))
      .select("id", "m.n_bytes", "m.header_hex").orderBy("id").collect()
    assert(out(0).getInt(1) == 64)
    assert(out(0).getString(2) == "0001020304050607")
    assert(out(1).getString(2) == "4141414141414141")
    assert(out(2).getInt(1) == 0)
  }

  test("decodeFeatures: batched stub decode produces normalized histograms") {
    val out = Multimodal.decodeFeatures(payloads, "id", "bin")
      .orderBy("id").collect()
    assert(out.length == 3)
    val f1 = out(0).getSeq[Float](1)
    assert(f1.length == 8)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    // constant-byte payload: all mass in bucket 0x41/32 = 2
    val f2 = out(1).getSeq[Float](1)
    assert(f2(2) == 1.0f && f2.sum == 1.0f)
    // empty payload: zero vector (plumbing must not crash)
    assert(out(2).getSeq[Float](1).forall(_ == 0f))
  }

  test("sampleFrames slices fixed-size frames with stride") {
    val out = Multimodal.sampleFrames(payloads.where(col("id") === 1), "bin",
      frameBytes = 16, stride = 2)
      .select("frame_idx", "frame").orderBy("frame_idx").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 2))
    assert(out.forall(_.getAs[Array[Byte]](1).length == 16))
    assert(out(1).getAs[Array[Byte]](1)(0) == 32.toByte)
    // empty payload yields no frames
    val empty = Multimodal.sampleFrames(payloads.where(col("id") === 3), "bin", 16, 1)
    assert(empty.count() == 0)
  }

  test("cross-video frame dedup drops a shared frame from ALL carriers (m4)") {
    val s = spark
    import s.implicits._
    // three 'videos' of two 8-byte frames each; frame "INTROCRD" is the
    // planted boilerplate shared by videos 1 and 2; every other frame
    // is unique to its carrier
    val vids = Seq(
      (1L, "INTROCRDaaaaaaaa"), (2L, "INTROCRDbbbbbbbb"),
      (3L, "ccccccccdddddddd"))
      .toDF("doc_id", "s")
      .select(col("doc_id"), encode(col("s"), "UTF-8").as("bin"))
    val frames = Multimodal.sampleFrames(vids, "bin",
      frameBytes = 8, stride = 1)
      .select(col("doc_id"), col("frame_idx"),
        md5(col("frame")).as("frame_md5"))
    val kept = Dedup.dropRepeatedUnits(frames, "doc_id", "frame_md5",
      maxDocFreq = 1)
      .select("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    // the shared intro frame (idx 0 of videos 1 AND 2) is gone from
    // both; every unique frame survives
    assert(kept == Set((1L, 1), (2L, 1), (3L, 0), (3L, 1)), s"got $kept")
  }

  test("perceptual frame near-dup (m8): a one-byte-perturbed twin that " +
      "md5 dedup provably misses pairs and drops on the dHash key") {
    val s = spark
    import s.implicits._
    // two docs carry the same 64-byte frame except ONE byte — a
    // re-encoded frame stand-in — plus an unrelated third frame
    val base = ("the quick brown fox jumps over the lazy dog " +
      "0123456789abcdefghij").take(64)
    assert(base.length == 64)
    // doc 2: byte0 't'→'T' FLIPS the first gradient sign (hamming 1 —
    // the banding face catches it); doc 4: byte0 't'→'s' PRESERVES
    // every gradient sign (identical fingerprint — the
    // dropRepeatedUnits action face catches it); doc 3 is unrelated
    val docs = Seq(
      (1L, base.getBytes("UTF-8")),
      (2L, ("T" + base.drop(1)).getBytes("UTF-8")),
      (3L, ("z" * 64).getBytes("UTF-8")),
      (4L, ("s" + base.drop(1)).getBytes("UTF-8")))
      .toDF("doc_id", "bin")
    val frames = Multimodal.sampleFrames(docs, "bin", 64, 1)
      .select(col("doc_id"), col("frame_idx"), col("frame"))

    // m4's exact path misses every twin: all four md5s are unique,
    // so NOTHING is dropped
    val m4 = Dedup.dropRepeatedUnits(
      frames.withColumn("k", md5(col("frame"))), "doc_id", "k", 1)
    assert(m4.count() == 4, "md5 keys must miss the perturbed twins")

    // hamming banding pairs all three variants (1↔4 at distance 0,
    // the sign-flip pairs at distance 1)
    val sigs = frames.select(col("doc_id").as("doc"),
      Multimodal.dhashFingerprint(col("frame")).as("simhash"))
    val pairs = Dedup.hammingPairs(sigs, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"expected exactly the planted pairs, got $pairs")

    // the action face: the fingerprint is INVARIANT to sign-preserving
    // re-encoding noise, so dropRepeatedUnits on the perceptual key
    // drops both equal-fingerprint carriers (1 and 4) from ALL docs
    val m8 = Dedup.dropRepeatedUnits(
      frames.withColumn("k",
        Multimodal.dhashFingerprint(col("frame"))), "doc_id", "k", 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(m8 == Set(2L, 3L),
      "the perceptual key must drop the equal-fingerprint carriers")
  }

  test("dhashFingerprint: deterministic, order-sensitive, short-frame safe") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("abab" * 16).getBytes("UTF-8"), // alternating gradient
      ("baba" * 16).getBytes("UTF-8"), // inverted gradient
      "ab".getBytes("UTF-8"),          // short frame: missing bytes = 0
      Array.emptyByteArray)
      .toDF("frame")
    val got = df.select(Multimodal.dhashFingerprint(col("frame")))
      .collect().map(_.getLong(0))
    // a<b pattern: bits at even j (0,2,...62) -> sum of 4^k
    val alternating = (0 until 63 by 2).map(1L << _).sum
    assert(got(0) == alternating)
    val inverted = (1 until 63 by 2).map(1L << _).sum
    assert(got(1) == inverted)
    assert(got(2) == 1L) // only byte0 < byte1 comparison exists
    assert(got(3) == 0L)
  }

  test("DhashBits codegen kernel is bit-identical to the hex/conv " +
      "when-chain formulation on random, short, high-byte and null " +
      "frames (the r17 A/B regression fix)") {
    val s = spark
    import s.implicits._
    // the r15 reference formulation, spelled with built-ins
    def referenceDhash(frame: org.apache.spark.sql.Column) = {
      val hx = hex(frame)
      def byteAt(j: Int) =
        conv(substring(hx, j * 2 + 1, 2), 16, 10).cast("int")
      (0 until 63).map { j =>
        when(byteAt(j) < byteAt(j + 1), lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val rnd = new scala.util.Random(17)
    val frames: Seq[Array[Byte]] =
      (1 to 50).map(_ => Array.fill(64)(rnd.nextInt(256).toByte)) ++
      (1 to 20).map(_ =>
        Array.fill(rnd.nextInt(70))(rnd.nextInt(256).toByte)) ++
      Seq(Array.fill(64)(0xff.toByte), Array.fill(64)(0x00.toByte),
        Array.tabulate(64)(_.toByte), Array.emptyByteArray,
        null.asInstanceOf[Array[Byte]])
    val df = frames.toDF("frame")
    val rows = df.select(
        Multimodal.dhashFingerprint(col("frame")).as("kernel"),
        coalesce(referenceDhash(col("frame")), lit(0L)).as("ref"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == r.getLong(1),
        s"frame $i: kernel ${r.getLong(0)} != reference ${r.getLong(1)}")
    }
    // SQL registration surface (§2.10)
    df.createOrReplaceTempView("dhash_frames")
    val viaSql = s.sql(
      "SELECT coalesce(dhash_bits(frame), 0L) FROM dhash_frames")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == rows.map(_.getLong(0)).toSeq)
  }

  test("caption→frame as-of alignment: backward match, no-frame sentinel") {
    val s = spark
    import s.implicits._
    // doc 1: 200 bytes -> frames at offsets 0, 128 (idx 0, 2);
    //        captions at offsets 0, 96 (idx 0, 2)
    // doc 2: 50 bytes -> one caption (offset 0), NO frame (needs 64)
    val docs = Seq((1L, ("x" * 200).getBytes("UTF-8")),
        (2L, ("y" * 50).getBytes("UTF-8")))
      .toDF("doc_id", "bin")
    val frames = Multimodal.sampleFrames(docs, "bin", 64, 2)
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * 64).cast("long").as("frame_off"))
    val captions = Multimodal.sampleFrames(docs, "bin", 48, 2)
      .select(col("doc_id"), col("frame_idx").as("caption_idx"),
        (col("frame_idx") * 48).cast("long").as("caption_off"))
    val got = TemporalJoins.asofJoin(captions, frames, Seq("doc_id"),
        "caption_off", "frame_off", Seq("frame_idx"))
      .select(col("doc_id"), col("caption_idx"),
        coalesce(col("asof_frame_idx"), lit(-1)).as("f"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2))
      .toMap
    assert(got == Map(
      (1L, 0) -> 0,   // caption at 0 -> frame at 0
      (1L, 2) -> 0,   // caption at 96 -> still frame 0 (128 is after)
      (2L, 0) -> -1)) // no frame exists for a 50-byte doc
  }
}
