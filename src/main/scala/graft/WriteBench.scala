package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Parquet-WRITE bandwidth control for the crawl commit path.
  *
  * The durable crawl's `commitFetch` stage (CrawlRound.fetchSink — the
  * pages snapshot commit as the fused fetch pass's materializing action)
  * measures fetch synthesis + extraction + the parquet write together.
  * Its 4→16-core scaling is bounded by whichever of those saturates the
  * single box first. This control isolates the WRITE: it generates a
  * crawl-round-shaped DataFrame (~same row count and itemText byte volume
  * as a 300k-URL bench round), persists and materializes it FIRST (the
  * generation cost stays outside the timed span), then times
  * `df.write.parquet` alone, per codec.
  *
  * If the control's write scales like `commitFetch` does, the commit
  * stage's 4→16 shortfall is the box's parquet-write path (encoder +
  * page-cache bandwidth), not engine-side serialization — the same
  * argument the round-4 memory-bandwidth control made for the
  * localCheckpoint wave, now specific to the write-once path.
  *
  * The codec A/B (snappy vs zstd) sizes the 100-TB lever: web text
  * compresses ~2× better under zstd, and at cluster scale the write is
  * usually I/O-bound, so a slower-but-smaller codec can be net faster.
  * On this box the output lands in page cache, so the CPU cost of the
  * codec is what shows.
  *
  * Usage: graft.WriteBench <cpus> <nRows> [reps=3] [outJson]
  * Prints one JSON line per codec.
  */
object WriteBench {

  def session(cpus: Int): SparkSession =
    SparkSession.builder()
      .appName(s"graft-writebench-$cpus")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "48g"))
      .getOrCreate()

  /** Deterministic fetch-output-shaped rows: the wide column mix of the
    * pages commit (one ~9.6 KB itemText per row ≈ the bench corpus's
    * extracted text volume, plus narrow meta). sha2-chain expansion keeps
    * generation pure-codegen and seed-stable. */
  def roundShaped(spark: SparkSession, nRows: Long, cpus: Int): DataFrame =
    spark.range(0, nRows, 1, cpus)
      .select(
        col("id"),
        xxhash64(col("id")).as("urlHash"),
        concat(lit("host-"), (col("id") % 1000).cast("string")).as("host"),
        (col("id") % 100).cast("int").as("depth"),
        lit(200).as("status"),
        (col("id") % 7).cast("double").as("priority"),
        // ~9.6 KB per row: 150 DISTINCT 64-hex-char sha2 blocks (a repeated
        // block would hand the codec a 10× gift no real page gives it; a
        // varied hex chain compresses ~2×, in the ballpark of extracted
        // web text)
        concat_ws("", transform(sequence(lit(1), lit(150)),
          i => sha2(concat(col("id").cast("string"), lit(":"), i.cast("string")), 256)))
          .as("itemText"),
        map(lit("m1"), (col("id") % 997).cast("double"),
            lit("m2"), (col("id") % 31).cast("double")).as("metrics"))

  /** r6 (VERDICT #4): decompose the commitFetch shape. Three spans on the
    * SAME generated data:
    *   compute_noop  — the generation+extraction-shaped pipeline into the
    *                   noop sink (no encode, no write);
    *   write_only    — persisted input → parquet (encode + write; the
    *                   original control);
    *   fused_write   — UNPERSISTED pipeline → parquet (compute + encode +
    *                   write in one pass: the write-once commitFetch shape).
    * fused − compute − write ≈ overlap/residual; each span's own 4→16
    * scaling attributes the commit stage's shortfall. */
  def decompose(cpus: Int, nRows: Long, reps: Int, outJson: Option[String]): Unit = {
    val spark = session(cpus)
    val lines = Seq.newBuilder[String]
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    def span(label: String)(body: => Unit): Unit = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val line = s"""{"metric":"commitfetch_decompose","span":"$label","cpus":$cpus,""" +
        s""""value":${med(walls)},"unit":"sec","nRows":$nRows,""" +
        s""""reps":${walls.mkString("[", ",", "]")}}"""
      println(line); lines += line
    }
    span("compute_noop") {
      roundShaped(spark, nRows, cpus)
        .write.format("noop").mode("overwrite").save()
    }
    val cached = roundShaped(spark, nRows, cpus).persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    span("write_only") {
      val dir = Files.createTempDirectory("graft-wb-wo").toString
      cached.write.mode("overwrite").parquet(dir)
      rmTree(Paths.get(dir))
    }
    cached.unpersist(true)
    span("fused_write") {
      val dir = Files.createTempDirectory("graft-wb-fw").toString
      roundShaped(spark, nRows, cpus).write.mode("overwrite").parquet(dir)
      rmTree(Paths.get(dir))
    }
    outJson.foreach(p => Files.writeString(Paths.get(p), lines.result().mkString("", "\n", "\n")))
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nRows = args(1).toLong
    val reps = if (args.length > 2) args(2).toInt else 3
    val outJson = if (args.length > 3 && args(3) != "decompose") Some(args(3)) else None
    if (args.contains("decompose")) {
      decompose(cpus, nRows, reps,
        if (args.length > 4) Some(args(4)) else None)
      return
    }

    val spark = session(cpus)
    val df = roundShaped(spark, nRows, cpus).persist(StorageLevel.MEMORY_AND_DISK)
    val n = df.count() // materialize OUTSIDE the timed span
    require(n == nRows)

    val lines = Seq.newBuilder[String]
    for (codec <- Seq("snappy", "zstd")) {
      val walls = (1 to reps).map { _ =>
        val dir = Files.createTempDirectory(s"graft-writebench-$codec").toString
        val t0 = System.nanoTime()
        df.write.mode("overwrite").option("compression", codec).parquet(dir)
        val wall = (System.nanoTime() - t0) / 1e9
        val bytes = dirBytes(Paths.get(dir))
        rmTree(Paths.get(dir))
        (wall, bytes)
      }
      val med = walls.map(_._1).sorted.apply(reps / 2)
      val bytes = walls.head._2
      val line =
        s"""{"metric":"parquet_write_sec","cpus":$cpus,"codec":"$codec","value":$med,""" +
          s""""unit":"sec","nRows":$nRows,"bytesWritten":$bytes,""" +
          s""""reps":${walls.map(_._1).mkString("[", ",", "]")}}"""
      println(line)
      lines += line
    }
    outJson.foreach(p => Files.writeString(Paths.get(p), lines.result().mkString("", "\n", "\n")))
    spark.stop()
  }

  private def dirBytes(p: Path): Long = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
  }
  private def rmTree(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }
}
