package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType}
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/** Multimodal (image/audio/video) column plumbing (north-star surface,
  * BASELINE.json): media travel as opaque `binary` columns with a typed
  * metadata struct; decode / feature-extraction runs as a batched
  * per-partition stage behind a pluggable [[MediaDecoder]].
  *
  * The decode step is STUBBED by design — no image/audio codecs ship in
  * this environment — with [[ByteHistogramDecoder]], a deterministic fake
  * that exercises the real Spark-side contract: binary schema, struct
  * metadata, batched `mapPartitions` signature, fixed-width float feature
  * output. A production decoder (JNI/FFI codec) drops into the same seam
  * with zero plan changes. At 100 TB this stage is embarrassingly
  * parallel per-row map work; the only sizing concern is
  * `spark.sql.files.maxPartitionBytes` vs decoded-frame memory.
  */
object Multimodal {
  /** Typed metadata carried next to the bytes. */
  def mediaStruct(bytes: Column, kind: Column, width: Column,
                  height: Column): Column =
    struct(bytes.as("data"), kind.as("kind"),
      width.cast("int").as("width"), height.cast("int").as("height"))

  /** Pluggable decode/feature seam (the production codec goes here). */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def features(bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic stub decoder: L1-normalized byte histogram. */
  final class ByteHistogramDecoder(val buckets: Int = 16) extends MediaDecoder {
    override def dim: Int = buckets
    override def features(bytes: Array[Byte]): Array[Float] = {
      val v = new Array[Float](buckets)
      if (bytes != null) {
        bytes.foreach(b => v((b & 0xff) * buckets / 256) += 1.0f)
        val total = bytes.length.max(1)
        var i = 0
        while (i < buckets) { v(i) /= total; i += 1 }
      }
      v
    }
  }

  /** Resize/downsample decoder: nearest-neighbor resample of the byte
    * stream to a fixed target length (byte values scaled to [0,1]) — the
    * 1-D shape of an image resize, behind the same seam the codec-aware
    * resize plugs into. Deterministic: sample i reads byte
    * floor(i·len/target). */
  final class ResampleDecoder(val target: Int) extends MediaDecoder {
    override def dim: Int = target
    override def features(bytes: Array[Byte]): Array[Float] = {
      val v = new Array[Float](target)
      if (bytes != null && bytes.length > 0) {
        var i = 0
        while (i < target) {
          v(i) = (bytes((i.toLong * bytes.length / target).toInt) & 0xff) / 255.0f
          i += 1
        }
      }
      v
    }
  }

  /** Batched decode: append a float-feature column from a binary column.
    * Same mapPartitions/grouped shape as the embedding ingest (the model
    * seam contract). */
  def withMediaFeatures(df: DataFrame, binCol: String, outCol: String,
                        decoder: MediaDecoder, batchSize: Int = 32): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(binCol)
    require(df.schema(idx).dataType == BinaryType,
      s"$binCol must be BINARY, got ${df.schema(idx).dataType}")
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          Row.fromSeq(r.toSeq :+ decoder.features(r.getAs[Array[Byte]](idx)).toSeq)
        }
      }
    }(Encoders.row(schema))
  }

  /** Frame sampling: split a binary blob into up to `n` fixed-stride
    * "frames" (pure Catalyst — the real video case swaps in codec-aware
    * offsets through the same API). */
  def frameSample(bytes: Column, n: Int, frameSize: Int): Column =
    filter(
      transform(sequence(lit(0), lit(n - 1)),
        i => bytes.substr((i * lit(frameSize) + 1).cast("int"), lit(frameSize))),
      f => length(f) > 0)
}
