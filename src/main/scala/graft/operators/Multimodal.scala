package graft.operators

import graft.functions.Rng
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads travel as opaque BINARY columns with typed metadata; decode /
  * feature-extract / frame-sample run as partition-batched typed transforms
  * (the Scala analog of `mapInPandas` — one iterator per partition, batch
  * shape preserved, no driver collect).
  *
  * The actual codec work is STUBBED (no image/audio libraries exist in this
  * container): payloads carry a deterministic 16-byte header
  * `[magic(4) | width(4) | height(4) | nframes(4)]` (big-endian) + opaque
  * md5-derived body, and "decoding" parses the header while "features" are a
  * deterministic fold of the body bytes. The Spark-side contracts — schema,
  * binary encoding, partition-local batching, explode of per-frame rows,
  * determinism under repartition — are real and tested.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                       nframes: Int, n_bytes: Int)
  case class FrameRow(media_id: Long, frame_idx: Int, frame_fp: String)

  val MAGIC: Int = 0x47524d4d // "GRMM"

  private val kinds = Array("image", "audio", "video")

  /** Deterministic synthetic media corpus — pure function of (seed, id). */
  def mediaRow(seed: Long, id: Long): MediaRow = {
    val kind = kinds(Rng.nextInt(seed, 11L, id, kinds.length))
    val w = 16 + Rng.nextInt(seed, 12L, id, 4080)
    val h = 16 + Rng.nextInt(seed, 13L, id, 2144)
    val nf = kind match {
      case "image" => 1
      case "audio" => 0
      case _       => 8 + Rng.nextInt(seed, 14L, id, 240)
    }
    val bodyLen = 64 + Rng.nextInt(seed, 15L, id, 448)
    val bb = java.nio.ByteBuffer.allocate(16 + bodyLen)
    bb.putInt(MAGIC).putInt(w).putInt(h).putInt(nf)
    var k = 0
    while (k < bodyLen) { bb.put((Rng.draw(seed, 16L + k, id) & 0xff).toByte); k += 1 }
    MediaRow(id, kind, bb.array())
  }

  def media(spark: SparkSession, n: Long, seed: Long = 7L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map(i => mediaRow(seed, i))
  }

  /** Header decode — partition-batched (mapPartitions, the mapInPandas
    * shape): one pass per partition, no per-row closure setup, no shuffle.
    */
  def decodeMeta(rows: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val bb = java.nio.ByteBuffer.wrap(r.payload)
        val magic = bb.getInt()
        require(magic == MAGIC, s"bad media magic for ${r.media_id}")
        MediaMeta(r.media_id, r.kind, bb.getInt(), bb.getInt(), bb.getInt(),
          r.payload.length - 16)
      }
    }
  }

  /** STUB feature extractor: 8 deterministic integer buckets folded from the
    * body bytes, scaled to float. A real pipeline would decode pixels/samples
    * here; the Spark contract (binary in, fixed-width vector out, partition
    * batching) is identical.
    */
  def features(rows: Dataset[MediaRow]): DataFrame = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val acc = new Array[Long](8)
        var i = 16
        while (i < r.payload.length) {
          acc(i % 8) += (r.payload(i) & 0xff).toLong
          i += 1
        }
        (r.media_id, acc.map(v => v.toFloat / 255f).toSeq)
      }
    }.toDF("media_id", "feature")
  }

  /** Frame sampling for video payloads: first / middle / last frame indices,
    * one output row per sampled frame (the explode shape). Frame "content"
    * is a deterministic fingerprint of (payload, frame_idx) — STUB for a real
    * frame decoder.
    */
  def sampleFrames(rows: Dataset[MediaRow]): Dataset[FrameRow] = {
    import rows.sparkSession.implicits._
    rows.filter(_.kind == "video").flatMap { r =>
      val nf = java.nio.ByteBuffer.wrap(r.payload, 12, 4).getInt()
      val idxs = Seq(0, nf / 2, nf - 1).distinct
      val base = java.security.MessageDigest.getInstance("MD5").digest(r.payload)
      idxs.map { fi =>
        val fp = (base(fi % 16) & 0xff) * 256 + (base((fi + 1) % 16) & 0xff)
        FrameRow(r.media_id, fi, f"$fp%04x")
      }
    }
  }

  // ---- oracle materialization (the ExtractOracle pattern) ----------------
  //
  // The binary header parse itself is procedural (not SQL-expressible), so
  // the decode output is materialized ONCE to parquet; the DuckDB oracle then
  // independently recomputes the aggregation/ordering tail over that shared
  // input while the Spark side re-runs the PRODUCTION decode path. This
  // checks (a) decode determinism under repartition and (b) the entire
  // distributed tail, bit-exactly — instead of a rows-only count.

  val ORACLE_DIR: String = graft.sources.OracleCorpus.DIR
  val META = s"$ORACLE_DIR/media-meta"
  val FRAMES = s"$ORACLE_DIR/media-frames"
  val META_PQ = s"read_parquet('$META/*.parquet')"
  val FRAMES_PQ = s"read_parquet('$FRAMES/*.parquet')"
  val N_MEDIA = 500L

  @volatile private var done = false

  private def ensure(spark: SparkSession): Unit = synchronized {
    if (done) return
    val marker = new java.io.File(s"$ORACLE_DIR/_MEDIA_READY")
    // same staleness guard as OracleCorpus: any recompile re-materializes
    val stamp = s"$N_MEDIA:${graft.sources.OracleCorpus.codeStamp()}"
    if (!graft.sources.OracleCorpus.markerFresh(marker, stamp)) {
      val m = media(spark, N_MEDIA)
      decodeMeta(m).write.mode("overwrite").parquet(META)
      sampleFrames(m).write.mode("overwrite").parquet(FRAMES)
      graft.sources.OracleCorpus.writeMarker(marker, stamp)
    }
    done = true
  }

  /** Decode all media metadata with the production partition-batched path
    * and roll up per kind; DuckDB aggregates the materialized decode output.
    */
  def mmMeta(spark: SparkSession, sfDir: String): DataFrame = {
    ensure(spark)
    decodeMeta(media(spark, N_MEDIA))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("bytes"),
        max(col("width")).as("max_w"),
        sum(col("nframes")).as("frames")
      )
      .orderBy("kind")
  }

  val mmMetaSql: String =
    s"""SELECT kind, count(*) n,
       |       CAST(sum(n_bytes) AS BIGINT) bytes,
       |       max(width) max_w,
       |       CAST(sum(nframes) AS BIGINT) frames
       |FROM $META_PQ GROUP BY kind ORDER BY kind""".stripMargin

  def mmFrames(spark: SparkSession, sfDir: String): DataFrame = {
    ensure(spark)
    sampleFrames(media(spark, N_MEDIA)).toDF().orderBy("media_id", "frame_idx")
  }

  val mmFramesSql: String =
    s"""SELECT media_id, frame_idx, frame_fp
       |FROM $FRAMES_PQ ORDER BY media_id, frame_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _),
    "mm_frames" -> (mmFrames _)
  )

  def oracles: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_frames" -> mmFramesSql
  )
}
