package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, batch-shaped decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels are deterministic STUBS (clearly marked below); the
  * Spark-side contract — schema, batching via mapPartitions, partition
  * sizing, null/corrupt handling — is real and tested. Swapping a stub
  * for a JNI/FFmpeg call changes one function body, not the pipeline.
  *
  * Scale notes: binary payloads dominate row size, so stages that carry
  * the payload set a low maxPartitionBytes / use repartition by byte
  * budget; metadata-only projections drop the payload column *before*
  * any shuffle.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("source", StringType, nullable = true)))

  val featureDim = 16

  /** STUB decode: pretends the first bytes are a header and derives
    * deterministic (width, height, format) pseudo-metadata. A real
    * implementation parses PNG/JPEG headers here.
    */
  def decodeMeta(payload: Array[Byte]): (Int, Int, String) = {
    if (payload == null || payload.length < 4) (0, 0, "corrupt")
    else {
      val w = 160 + (((payload(0) & 0xff) << 8 | (payload(1) & 0xff)) % 8) * 160
      val h = 120 + (((payload(2) & 0xff) << 8 | (payload(3) & 0xff)) % 8) * 120
      (w, h, if ((payload(0) & 1) == 0) "png" else "jpeg")
    }
  }

  /** STUB feature extraction: a deterministic 16-dim float vector folded
    * from payload bytes (stands in for a vision encoder forward pass;
    * the batch shape — one partition in, arrays out — is the real
    * contract).
    */
  def extractFeatures(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Decode metadata for every media row — batched per partition (the
    * shape a real codec needs: amortized init per partition, not per
    * row).
    */
  def withMeta(media: DataFrame): DataFrame = {
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("format", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // per-partition init of the (stub) codec happens here
      rows.map { r =>
        val (w, h, f) = decodeMeta(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq ++ Seq(w, h, f))
      }
    }(enc)
  }

  /** Feature-extract stage: payload -> fixed-dim float vector; payload
    * dropped on output so downstream shuffles move vectors, not media.
    */
  def withFeatures(media: DataFrame): Dataset[Row] = {
    val schema = StructType(
      media.schema.fields.filterNot(_.name == "payload") :+
        StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val payloadIdx = media.schema.fieldIndex("payload")
    val keepIdx = media.schema.fields.zipWithIndex
      .filterNot(_._1.name == "payload").map(_._2)
    media.mapPartitions { rows =>
      rows.map { r =>
        val feats = extractFeatures(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(keepIdx.map(r.get).toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** STUB frame sampling for video payloads: returns byte offsets of
    * every `stride`-th pseudo-frame (a real implementation seeks
    * keyframes). Pure column expression — no UDF needed for the stub.
    */
  def frameOffsets(payload: org.apache.spark.sql.Column, stride: Int): org.apache.spark.sql.Column =
    when(length(payload) >= stride,
      sequence(lit(0), length(payload) - 1, lit(stride)))
      .otherwise(array(lit(0)))

  /** Aspect-preserving resize target for a decoded (width, height):
    * the longer edge is capped at `maxDim`, the other edge scales by
    * the same integer ratio (floor). Integer arithmetic throughout so
    * any engine computes identical targets. Returns (tw, th).
    */
  def resizeTarget(
      width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
      maxDim: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val longEdge = greatest(width, height)
    // floor((e * maxDim) / longEdge) == integer division for positive
    // ints (exact in double well past any pixel dimension)
    def scaled(e: org.apache.spark.sql.Column) =
      greatest(floor(e.cast("long") * maxDim / longEdge).cast("int"), lit(1))
    val tw = when(longEdge <= maxDim, width).otherwise(scaled(width))
    val th = when(longEdge <= maxDim, height).otherwise(scaled(height))
    (tw, th)
  }
}
