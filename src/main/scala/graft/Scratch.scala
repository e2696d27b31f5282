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

    // ---- dedup_embed_audit decomposition ----
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
    val p = spark.sparkContext.defaultParallelism
    val e2 = base.unionByName(twins).repartition(p)
      .withColumn("nrm", norm(col("embedding"))).filter(col("nrm") > 0)

    time("e2 (twins+norm)")(e2)

    // hash relation of e2
    def planes: Array[Double] = {
      var st = 42L
      def next(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
      Array.fill(8 * 8 * 64)(if ((next() >>> 40 & 1L) == 1L) 1.0 else -1.0)
    }
    def hashes = e2.withColumn("buckets", graft.expr.VectorExprs.lsh_buckets(
      col("embedding"), planes, 64, 8, 8))
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))

    time("hashes")(hashes)

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
    time("candidate pairs")(pairsOf(hashes))

    def reported: DataFrame = {
      val prs = pairsOf(hashes)
      val a = e2.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a"))
      val b = e2.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b"))
      prs.join(a, Seq("id_a")).join(b, Seq("id_b"))
        .withColumn("cos", graft.expr.VectorExprs.vec_dot(col("emb_a"), col("emb_b")) /
          (col("nrm_a") * col("nrm_b")))
        .filter(col("cos") >= 0.3)
        .select("id_a", "id_b", "cos")
    }
    time("reported (pairs+verify)")(reported)

    val rep = reported.persist(); rep.count()
    println(s"[scratch] reported rows: ${rep.count()}")

    val eBase = base.withColumn("nrm", norm(col("embedding"))).filter(col("nrm") > 0)
    val a2 = eBase.repartition(p).select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      col("nrm").as("nrm_a"))
    val b2 = eBase.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      col("nrm").as("nrm_b"))
    def bandTruth = a2.crossJoin(b2).filter(col("id_a") < col("id_b"))
      .withColumn("cos", graft.expr.VectorExprs.vec_dot(col("emb_a"), col("emb_b")) /
        (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= 0.3)
      .select("id_a", "id_b")
    time("bandTruth cross join")(bandTruth)
    spark.stop()
  }
}
