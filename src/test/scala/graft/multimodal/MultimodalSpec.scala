package graft.multimodal


import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.multimodal.Multimodal._

object BatchSizeCollector {
  val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}

class CountingDecoder extends Multimodal.MediaDecoder {
  private val stub = new Multimodal.StubDecoder()
  override def decodeBatch(batch: Seq[Multimodal.MediaRow]): Seq[Multimodal.MediaFeatures] = {
    BatchSizeCollector.sizes.add(batch.size)
    stub.decodeBatch(batch)
  }
}

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", "img-payload-one".getBytes("UTF-8")),
    MediaRow(2L, "audio", Array.fill[Byte](1000)(7)),
    MediaRow(3L, "video", Array.fill[Byte](6400)(3)),
    MediaRow(4L, "image", Array.emptyByteArray),
    MediaRow(5L, "image", "img-payload-one".getBytes("UTF-8"))
  ).toDS()

  test("decode emits one feature row per media row with kind-correct shape") {
    val out = Multimodal.decode(media, new StubDecoder()).collect().sortBy(_.doc_id)
    assert(out.length == 5)
    val img = out(0)
    assert(img.kind == "image" && img.width > 0 && img.height > 0 &&
      img.channels == 3 && img.sample_rate == -1 && img.embedding.size == 8)
    val aud = out(1)
    assert(aud.kind == "audio" && aud.sample_rate == 16000 &&
      aud.n_frames == 500 && aud.width == -1)
    val vid = out(2)
    assert(vid.kind == "video" && vid.n_frames == 100 &&
      vid.frame_offsets == Seq(0L, 25L, 50L, 75L))
  }

  test("decode is deterministic: identical payloads → identical features") {
    val out = Multimodal.decode(media, new StubDecoder()).collect()
    val a = out.find(_.doc_id == 1L).get
    val b = out.find(_.doc_id == 5L).get
    assert(a.embedding == b.embedding && a.width == b.width && a.height == b.height)
  }

  test("decode is partition-count independent and batch-size independent") {
    val one = Multimodal.decode(media.repartition(1), new StubDecoder(), batchSize = 2)
      .collect().sortBy(_.doc_id).toSeq
    val many = Multimodal.decode(media.repartition(7), new StubDecoder(), batchSize = 64)
      .collect().sortBy(_.doc_id).toSeq
    assert(one == many)
  }

  test("batching: decoder sees ≤ batchSize rows per call, all rows exactly once") {
    // Task closures are serialized even in local mode, so the collector
    // must be a static (per-JVM) object, not a captured instance field.
    BatchSizeCollector.sizes.clear()
    val out = Multimodal.decode(media.repartition(1),
      new CountingDecoder(), batchSize = 2).collect()
    assert(out.length == 5)
    import scala.jdk.CollectionConverters._
    val sizes = BatchSizeCollector.sizes.asScala.toSeq
    assert(sizes.forall(_ <= 2) && sizes.sum == 5)
  }

  test("mediaFromDocuments maps the documents table into the media schema") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = mediaFromDocuments(docs)
    assert(m.columns.toSeq == Seq("doc_id", "kind", "payload"))
    val kinds = m.select("kind").distinct().as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
    assert(m.count() == docs.count())
  }
}
