package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata alongside. The heavy decode step is STUBBED
  * (this container carries no media libraries) behind a deterministic fake
  * — but the Spark-side plumbing (schemas, batched mapPartitions transform,
  * partition sizing) is real and tested, so swapping in a true decoder is a
  * one-function change.
  */
object Multimodal {

  /** Cheap, columnar metadata over a binary payload — no decode needed:
    * byte length + magic-header hex. This is the real production shape for
    * filtering/routing before an expensive decode. */
  def binaryMeta(bin: Column): Column =
    struct(
      octet_length(bin).as("n_bytes"),
      hex(substring(bin, 1, 8)).as("header_hex"))

  /** The decode seam. A real deployment plugs libjpeg/ffmpeg here; the
    * deterministic fake derives a fixed-length "feature vector" from the
    * bytes so the distributed plumbing is exercised end to end. */
  type Decoder = Array[Byte] => Array[Float]

  /** Deterministic fake decoder: 8 "features" = normalized byte histogram
    * over 8 buckets. Stands in for image-decode + feature-extract. */
  val stubDecoder: Decoder = bytes => {
    val buckets = new Array[Float](8)
    if (bytes.nonEmpty) {
      bytes.foreach(b => buckets((b & 0xff) / 32) += 1f)
      var i = 0
      while (i < 8) { buckets(i) /= bytes.length; i += 1 }
    }
    buckets
  }

  /** Batched decode over partitions: one decoder instance per partition
    * (amortizes model/codec init — the mapInPandas batch shape in Scala
    * form). Output: id (original type preserved), feature array. */
  def decodeFeatures(df: DataFrame, idCol: String, binCol: String,
      decoder: Decoder = stubDecoder): DataFrame = {
    import org.apache.spark.sql.types._
    val idField = df.schema(idCol)
    val outSchema = StructType(Seq(idField,
      StructField("features", ArrayType(FloatType, containsNull = false))))
    df.select(col(idCol), col(binCol))
      .mapPartitions { it =>
        // per-partition init seam (codec handles, model weights, …)
        val d = decoder
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          Row(r.get(0), d(if (bytes == null) Array.empty[Byte] else bytes))
        }
      }(Encoders.row(outSchema))
  }

  /** Perceptual frame FINGERPRINT (dHash shape, r15): 63 bits over the
    * frame's first 64 bytes, bit j = [byte_j < byte_{j+1}] — the
    * adjacent-gradient comparison of the classic image dHash
    * (difference hash; public domain technique, e.g. Krawetz 2013)
    * applied to the stub byte grid: a REAL deployment computes the
    * same comparisons over an 8×9 downsampled luma grid after decode,
    * so swapping the decoder in changes only what the bytes are.
    * Exact-hash keys (md5 — the m4 dedup) miss a re-encoded/resized
    * frame entirely: ONE changed byte is a new md5, while here it
    * flips at most its TWO adjacent comparisons — hamming ≤ 2 — so
    * near-dup blocking ([[Dedup.hammingPairs]] pigeonhole banding)
    * still pairs the variants. Pure deterministic byte arithmetic
    * (hex-digit parse + compares), replayable in any engine.
    * Frames shorter than 64 bytes contribute 0 for the missing
    * comparisons (NULL-safe `when`); returns a non-negative LONG. */
  def dhashFingerprint(frame: Column): Column =
    // one codegen'd kernel call per row over the RAW bytes — r16's
    // transform/zip_with/aggregate formulation parsed each byte once
    // but paid for it by dropping out of whole-stage codegen into
    // interpreted HOFs (m8 isolated median 1.8 → 5.1 s at sf0.1,
    // found by the r17 old-jar A/B, tools/m8_ab_r17.txt); the
    // expression keeps both properties. coalesce preserves the
    // NULL-frame → 0 contract of both prior formulations.
    coalesce(
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.DhashBits(
          org.apache.spark.sql.graft.ColumnBridge.expression(frame))),
      lit(0L))

  /** Frame-sampling plumbing: pick every `stride`-th fixed-size frame from a
    * binary payload (video stand-in). Pure built-ins — `binary` slicing is
    * columnar. */
  def sampleFrames(df: DataFrame, binCol: String, frameBytes: Int,
      stride: Int): DataFrame = {
    val nFrames = floor(octet_length(col(binCol)) / frameBytes).cast("int")
    df.withColumn("frame_idx",
        explode(when(nFrames > 0,
          sequence(lit(0), nFrames - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame",
        substring(col(binCol), col("frame_idx") * frameBytes + 1, lit(frameBytes)))
  }
}
