package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-isolation profiler for the optimization round (guide
  * §1.1 empirical loop). Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label%-44s ${ts.map(t => f"$t%6.2f").mkString(" ")}")
    }

    spark.range(100000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()

    // ---- agg_percentile A/B ----
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val p = spark.sparkContext.defaultParallelism
    time("percentile no fanOut") {
      orders.groupBy("o_orderstatus").agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy("o_orderstatus")
    }
    time("percentile fanOut") {
      orders.select("o_orderstatus", "o_totalprice").repartition(p)
        .groupBy("o_orderstatus").agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy("o_orderstatus")
    }

    // ---- GIF encode vs decode split (driver-side, single-thread probe) ----
    {
      import graft.multimodal.Codecs
      val ids = (0L until 600L)
      var t0 = System.nanoTime()
      val gifs = ids.map(id => Codecs.makeGif((16 + id % 32).toInt,
        (8 + id % 16).toInt, (1 + id % 5).toInt, seed = id))
      val tEnc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      gifs.foreach(Codecs.decodeGif)
      val tDec = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] gif 600 rows: encode $tEnc%.2f s, decode $tDec%.2f s")
    }

    // ---- embed-audit: hashes memo effect ----
    val OFFSET = 1000000L
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val twins = base.select(
      (col("vec_id") + OFFSET).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") * (lit(1.0) +
          (pmod(xxhash64(col("vec_id"), i), lit(101)) - lit(50)).cast("double") / 1000.0))
          .cast("float")).as("embedding"))
    def norm(v: org.apache.spark.sql.Column) =
      sqrt(graft.expr.VectorExprs.vec_dot(v, v))
    val e2 = base.unionByName(twins).repartition(p)
      .withColumn("nrm", norm(col("embedding"))).filter(col("nrm") > 0).persist()
    e2.count()
    def planes: Array[Double] = {
      var st = 42L
      def next(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
      Array.fill(8 * 8 * 64)(if ((next() >>> 40 & 1L) == 1L) 1.0 else -1.0)
    }
    def freshHashes = e2.withColumn("buckets", graft.expr.VectorExprs.lsh_buckets(
      col("embedding"), planes, 64, 8, 8))
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val cachedHashes = freshHashes.persist(); cachedHashes.count()

    def pairsOf(h: DataFrame): DataFrame = {
      val small = h.select("tbl", "bucket")
        .groupBy("tbl", "bucket").agg(count(lit(1)).as("n"))
        .filter(col("n") <= 1000).drop("n")
      val capped = h.join(small, Seq("tbl", "bucket"), "left_semi")
      capped.select(col("vec_id").as("id_a"), col("tbl"), col("bucket"))
        .join(capped.select(col("vec_id").as("id_b"), col("tbl"), col("bucket")),
          Seq("tbl", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
    }
    time("pairs from fresh hashes")(pairsOf(freshHashes))
    time("pairs from cached hashes")(pairsOf(cachedHashes))
    spark.stop()
  }
}
