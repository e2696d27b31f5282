package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._

/** Embedding-space operators over the `embeddings` table (64-dim float
  * vectors): norms, brute-force cosine top-k (the correctness baseline),
  * random-hyperplane LSH bucketing (the scale path — bucket equi-join
  * instead of a cross join), and embedding-cosine near-dup pairs.
  *
  * Scale notes (100 TB): brute-force is O(Q·N) and only acceptable for a
  * small pinned query set; the LSH variant turns candidate generation into
  * a shuffle on bucket id, which is how this survives 10^9 vectors. All
  * arithmetic is done in DOUBLE with left-to-right `aggregate` folds so
  * results are deterministic across partitionings.
  */
object VectorOps {

  private val DIM = 64

  /** Σ aᵢ·bᵢ as a left-to-right double fold (deterministic). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(v: Column): Column = sqrt(dot(v, v))

  // ----------------------------------------------------------- norms
  private val vectorNorm = Q(
    "vector_norm",
    """SELECT vec_id,
      |       round(sqrt(list_sum(list_transform(embedding,
      |                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2,
      |       round(list_sum(list_transform(embedding,
      |                    x -> abs(CAST(x AS DOUBLE)))), 6) AS l1
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
    embeddings(s, d).select(
      col("vec_id"),
      round(norm(col("embedding")), 6).as("l2"),
      round(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + abs(x.cast("double"))), 6).as("l1"))
      .orderBy("vec_id")
  }

  private val vectorAvgByLabel = Q(
    "vector_avg_by_label",
    """SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
      |       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS avg_first
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
    embeddings(s, d).groupBy(col("label").cast("long").as("label")).agg(
      count(lit(1)).as("n"),
      round(avg(element_at(col("embedding"), 1).cast("double")), 6).as("avg_first"))
      .orderBy("label")
  }

  // ------------------------------------------------- brute-force top-k
  /** Pinned query set (vec_id < 8) × all candidates: the exact-answer
    * baseline the LSH variant is measured against. */
  private val annCosineTopk = Q.noOracle("ann_cosine_topk") { (s, d) =>
    val e = embeddings(s, d)
      .withColumn("nrm", norm(col("embedding")))
      .filter(col("nrm") > 0)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    q.join(c, col("q_id") =!= col("c_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos"), col("rnk"))
      .orderBy("q_id", "rnk")
  }

  // -------------------------------------------------- LSH bucketing
  /** Deterministic Rademacher (±1) hyperplanes from a fixed LCG seed —
    * pure data, identical across executors and partition counts. */
  private val N_PLANES = 12
  private def planes: Seq[Seq[Double]] = {
    var st = 42L
    def next(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
    Seq.fill(N_PLANES)(Seq.fill(DIM)(if ((next() >>> 40 & 1L) == 1L) 1.0 else -1.0))
  }

  /** Pack sign(v·plane_j) bits into a bucket id. Column-valued shift
    * amounts need the SQL higher-order form. */
  private def bucketCol: Column = expr(
    s"""aggregate(sequence(0, ${N_PLANES - 1}), 0L, (acc, j) -> acc |
       |  if(aggregate(sequence(1, $DIM), 0D,
       |       (a, i) -> a + element_at(element_at(planes_, j + 1), i)
       |                   * CAST(element_at(embedding, i) AS DOUBLE)) > 0D,
       |     shiftleft(1L, j), 0L))""".stripMargin)

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("planes_", typedLit(planes))
      .withColumn("bucket", bucketCol)
      .drop("planes_")

  /** ANN via LSH: candidates = same-bucket equi-join (shuffle on bucket),
    * then exact cosine re-rank. The scale path: no cross join anywhere. */
  private val annLshTopk = Q.noOracle("ann_lsh_topk") { (s, d) =>
    val e = withBucket(embeddings(s, d))
      .withColumn("nrm", norm(col("embedding")))
      .filter(col("nrm") > 0)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      col("nrm").as("c_nrm"), col("bucket").as("c_bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    q.join(c, col("bucket") === col("c_bucket") && col("q_id") =!= col("c_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos"), col("rnk"))
      .orderBy("q_id", "rnk")
  }

  /** Embedding-cosine near-dup pairs inside LSH buckets (bounded pair
    * generation), threshold re-checked exactly. */
  private val dedupEmbedCosine = Q.noOracle("dedup_embed_cosine") { (s, d) =>
    val e = withBucket(embeddings(s, d))
      .withColumn("nrm", norm(col("embedding")))
      .filter(col("nrm") > 0)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      col("nrm").as("nrm_a"), col("bucket"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      col("nrm").as("nrm_b"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= 0.3)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(1000)
  }

  val all: Seq[Q] = Seq(
    vectorNorm, vectorAvgByLabel, annCosineTopk, annLshTopk, dedupEmbedCosine)
}
