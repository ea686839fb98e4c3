package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns: image/audio/video as opaque `binary` payloads with typed
 * metadata, plus the Spark-side plumbing for batched decode / feature-extract /
 * resize / frame-sample.
 *
 * The actual media codecs are NOT in this container, so the decode kernel is a
 * clearly-marked DETERMINISTIC STUB (see [[StubCodec]]); everything around it —
 * schema, size-balanced partitioning, batched per-partition execution shape
 * (the Scala analogue of mapInPandas: one buffer-reused kernel call per batch,
 * not per row), feature schema — is real and tested, so swapping in a JNI/
 * native decoder later only replaces the kernel body.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("codec", StringType))))))

  // meta fields are Option: mediaSchema declares them nullable, and a bare Int
  // would make the encoder throw on a schema-conformant row with null meta
  case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Option[Int], height: Option[Int], duration_ms: Option[Int],
      codec: String)

  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      content_hash: Long, histogram: Array[Long], frames_sampled: Int)

  /** Lehmer-style deterministic id hash — plain modular integer arithmetic so a
    * SQL oracle (DuckDB) can regenerate the exact same table; exact for
    * media_id < ~2^45 (no 64-bit overflow). */
  private val LEHMER_A = 48271L
  private val LEHMER_P = 2147483647L // 2^31 - 1
  private def idHash(salt: Long): Column =
    pmod(col("media_id") * LEHMER_A + lit(salt * 1299709L), lit(LEHMER_P))

  /** Deterministic synthetic media table (payload bytes derived from the id;
    * the constants are fixed so the DuckDB oracle regenerates the exact bytes).
    * Bytes = a 4-byte value word (zero-padded to 8) repeated 4..67 times. */
  def synthetic(spark: SparkSession, n: Long): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    spark.range(n).withColumnRenamed("id", "media_id").select(
      col("media_id"),
      element_at(kinds, (idHash(0) % 3 + 1).cast(IntegerType)).as("kind"),
      // opaque binary payload: unhex of a deterministic hex string, variable length
      unhex(repeat(lpad(hex(idHash(1)), 16, "0"),
        (idHash(2) % 64 + 4).cast(IntegerType))).as("bytes"),
      struct(
        (idHash(3) % 1920 + 1).cast(IntegerType).as("width"),
        (idHash(4) % 1080 + 1).cast(IntegerType).as("height"),
        (idHash(5) % 60000 + 1).cast(IntegerType).as("duration_ms"),
        lit("stub").as("codec")).as("meta"))
  }

  /**
   * The pluggable decode kernel — bytes in, features out. Implementations MUST
   * be deterministic pure functions of the row (replay/retry stability) and
   * Serializable (the instance ships to executors inside the mapPartitions
   * closure). A real libjpeg/ffmpeg decoder drops in here without touching
   * the pipeline (partitioning, batch shape, schema) or the oracle.
   */
  trait MediaCodec extends Serializable {
    def decodeAndExtract(row: MediaRow, frameCount: Int): MediaFeatures
  }

  /**
   * STUB codec — stands in for libjpeg/ffmpeg, which are not in this container.
   * Deterministic pure function of the bytes so tests and replay are stable.
   * Replace with a real [[MediaCodec]] to productionise; the signature is the
   * contract: one call per row, invoked batch-wise from mapPartitions.
   */
  object StubCodec extends MediaCodec {
    def decodeAndExtract(row: MediaRow, frameCount: Int): MediaFeatures = {
      val bytes = if (row.bytes == null) Array.empty[Byte] else row.bytes
      // "decode": byte histogram over 16 buckets + rolling content hash.
      // The hash is a mod-(2^31-1) polynomial — never overflows a long, so a
      // SQL oracle can recompute it with plain integer arithmetic.
      val hist = new Array[Long](16)
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) % 16) += 1
        h = (h * 31L + (bytes(i) & 0xff)) % 2147483647L
        i += 1
      }
      // "frame-sample": every (len / frameCount)th offset exists
      val frames = math.min(frameCount, math.max(bytes.length, 1))
      MediaFeatures(row.media_id, row.kind, bytes.length, h, hist, frames)
    }
  }

  /**
   * Batched decode / feature extraction — mapPartitions so any per-partition
   * init (native handles, scratch buffers) happens once per task, not per row.
   * Input is hash-repartitioned on media_id first: uniform row spread, which
   * balances decode work in EXPECTATION. That is count-balance, not
   * byte-balance — a corpus dominated by a few giant videos should raise
   * `partitions` toward one-row tasks (per-row weighted packing would need a
   * global size sort that costs more than it saves at this stage's scale).
   */
  def decodeFeatures(media: DataFrame, frameCount: Int = 8, partitions: Int = 0,
      codec: MediaCodec = StubCodec): DataFrame = {
    // reachable from JobMain config: frame_count <= 0 would persist a
    // nonsense frames_sampled (-1/0) on every row with no error anywhere
    require(frameCount > 0, s"decodeFeatures: frame_count must be > 0, got $frameCount")
    val spark = media.sparkSession
    import spark.implicits._
    val projected = media.select(
      col("media_id"), col("kind"), col("bytes"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.duration_ms").as("duration_ms"), col("meta.codec").as("codec"))
    val n = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    val balanced = projected.repartition(n, col("media_id"))
    balanced.as[MediaRow]
      .mapPartitions { it =>
        // per-task init would go here (decoder handle, reusable buffers)
        it.map(codec.decodeAndExtract(_, frameCount))
      }
      .toDF()
  }

  /** "Resize": metadata-level transform (real pixel work lives in the codec).
    * Rounded-then-clamped: a bare floor over the floating-point scale
    * undershoots the bound by a pixel (1920×(640/1920) floors to 639) and a
    * 1-pixel dimension can collapse to 0; round + least keeps the result in
    * [1, max]. A NULL meta stays NULL — struct() is never null, so the
    * unguarded rewrite would silently mint an all-null-fields struct and
    * flip every isNull audit downstream. */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW >= 1 && maxH >= 1, s"resizeMeta: bounds must be >= 1 ($maxW x $maxH)")
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(maxW).cast(DoubleType) / w, lit(maxH).cast(DoubleType) / h, lit(1.0))
    // null-preserving per FIELD, not just per struct: greatest/least SKIP
    // nulls, so an unguarded rewrite of a null width would mint width=1 —
    // a confident fake dimension that flips isNull audits downstream. And
    // when EITHER dimension is null the aspect-preserving scale is
    // unknowable (least skips the null ratio, silently scaling the other
    // dimension by 1.0 as if it had been checked), so both outputs null.
    def dim(d: Column, bound: Int) =
      when(w.isNull || h.isNull, lit(null).cast(IntegerType))
        .otherwise(least(lit(bound), greatest(lit(1), round(d * scale).cast(IntegerType))))
    val resized = struct(
      dim(w, maxW).as("width"),
      dim(h, maxH).as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.codec").as("codec"))
    media.withColumn("meta",
      when(col("meta").isNull, lit(null)).otherwise(resized))
  }
}
