package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` payloads with typed metadata, processed in partition-local
  * BATCHES (the shape a real decoder wants — vectorized libraries amortize
  * per-call cost over a batch, exactly like `mapInPandas` batching on the
  * Python side).
  *
  * The decode step itself is a pluggable trait: this container has no
  * image/audio codecs, so the default is [[StubDecoder]] — a DETERMINISTIC
  * fake (every output is a pure function of the payload bytes). The
  * Spark-side plumbing — schema, batch assembly, partition mapping, feature
  * shapes — is real and tested; a codec-backed decoder drops in without
  * touching the pipeline.
  */
object Multimodal {

  /** One media row: payload is opaque bytes; kind ∈ {image, audio, video}. */
  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Decoded/featurized output. For images: width/height/channels and a
    * fixed-size embedding; for audio: sampleRate/frames; for video: the
    * sampled frame offsets. Unused fields are -1/empty per kind. */
  case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      sample_rate: Int,
      n_frames: Long,
      frame_offsets: Seq[Long],
      embedding: Seq[Float])

  /** The decode extension point. Implementations MUST be pure per batch
    * (no cross-batch state) — that is what makes the pipeline
    * partition-count independent and retry-safe. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** Deterministic stand-in for real codecs: all "decoded" values are pure
    * functions of the payload bytes (xxhash-style mix over the buffer), so
    * tests are byte-stable and the fake is obvious — dims are synthetic. */
  class StubDecoder(embeddingDim: Int = 8, frameSample: Int = 4) extends MediaDecoder {
    private def mix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    private def hashBytes(b: Array[Byte]): Long = {
      var h = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < b.length) { h = mix(h ^ (b(i) & 0xffL) ^ (i.toLong << 32)); i += 8 }
      h
    }
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val h = hashBytes(r.payload)
        val emb = (0 until embeddingDim)
          .map(k => (java.lang.Long.remainderUnsigned(mix(h ^ k), 2000L) - 1000L) / 1000.0f)
        r.kind match {
          case "image" => MediaFeatures(r.doc_id, r.kind, r.payload.length,
            width = (java.lang.Long.remainderUnsigned(h, 1920L) + 1L).toInt,
            height = (java.lang.Long.remainderUnsigned(mix(h), 1080L) + 1L).toInt,
            channels = 3, sample_rate = -1, n_frames = -1L,
            frame_offsets = Seq.empty, embedding = emb)
          case "audio" => MediaFeatures(r.doc_id, r.kind, r.payload.length,
            width = -1, height = -1, channels = 1,
            sample_rate = 16000,
            n_frames = r.payload.length / 2L, // 16-bit mono stand-in
            frame_offsets = Seq.empty, embedding = emb)
          case _ => // video: deterministic uniform frame sample
            val nFrames = (r.payload.length / 64L).max(1L)
            val offs = (0 until frameSample)
              .map(k => (nFrames * k) / frameSample).distinct.map(_.toLong)
            MediaFeatures(r.doc_id, r.kind, r.payload.length,
              width = (java.lang.Long.remainderUnsigned(h, 1280L) + 1L).toInt,
              height = (java.lang.Long.remainderUnsigned(mix(h), 720L) + 1L).toInt,
              channels = 3, sample_rate = -1, n_frames = nFrames,
              frame_offsets = offs, embedding = emb)
        }
      }
  }

  /** The pipeline: (doc_id, kind, payload:binary) → typed features, decoded
    * in `batchSize`-row batches inside each partition. No shuffle — decode
    * is embarrassingly parallel; partitioning is whatever the upstream scan
    * chose (repartition BEFORE this stage if payload sizes skew).
    *
    * Scale note (100 TB of media): payloads stay columnar-binary end to
    * end; only the fixed-size features survive this stage, so downstream
    * shuffles move KBs per row, not MBs. */
  def decode(media: Dataset[MediaRow], decoder: MediaDecoder,
             batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decoder.decodeBatch(b.toSeq))
    }
  }

  /** Documents → fake media rows (payload := utf8(text)); the harness has
    * no binary media table, and the pipeline is payload-agnostic. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").cast("long"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
