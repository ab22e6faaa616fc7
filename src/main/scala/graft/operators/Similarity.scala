package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.CosineSimilarity
import graft.sources.Tables

/** Approximate-nearest-neighbor / similarity search over the embedding
  * column (`embeddings.embedding: array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline (O(Q·N) — fine for
  * a bounded query set, never for all-pairs at scale). The scale path is
  * sign-LSH (random-hyperplane simplified to coordinate signs, so the
  * bucket function is deterministic and oracle-mirrorable): an 8-bit sign
  * signature partitions the space into 256 buckets and candidate generation
  * is a bucket equi-join — at 100 TB this is the standard
  * shuffle-on-bucket-key layout where each bucket's pairs fit one task, and
  * more signature bits (or IVF centroids learned offline) tighten buckets
  * as N grows.
  *
  * The cosine kernel is the native codegen'd
  * [[graft.plans.CosineSimilarity]] expression (one fused loop, zero
  * allocation — see `SimilaritySpec` for its equivalence test against the
  * composable higher-order-function formulation). All arithmetic is double
  * (floats widened first), matching DuckDB's
  * `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`. Outputs carry ids +
  * ranks only — no floating-point columns — so verification is immune to
  * last-bit summation differences.
  */
object Similarity {

  /** Embedding widened to double (cosine math must be f64 on both engines). */
  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    CosineSimilarity.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS double))").as("v"))
  }

  /** Composable (non-native) dot product — kept as the reference
    * formulation the custom expression is verified against.
    */
  def dotColsHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine via the composable path (spec/benchmark comparison only). */
  def cosineHof(a: Column, b: Column): Column =
    dotColsHof(a, b) / (sqrt(dotColsHof(a, a)) * sqrt(dotColsHof(b, b)))

  /** 8-bit coordinate-sign LSH bucket (deterministic hyperplane set). */
  private def signBucket(v: Column): Column =
    (0 until 8).map(j => when(element_at(v, j + 1) >= 0d, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Brute-force cosine top-10 for a bounded query set (vec_id < 10). */
  def knnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
    val q = all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val ranked = q.join(all, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr("cosine_sim(qv, v)").as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)).cast("long"))
    ranked.filter(col("rank") <= 10).select("query_id", "neighbor_id", "rank")
  }

  /** Sign-LSH bucketed KNN: top-3 neighbors within each vector's bucket —
    * the scale path (equi-join on bucket, no cross product).
    */
  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = vecs(spark, dir)
      .withColumn("bucket", signBucket(col("v")))
    val ranked = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        expr("cosine_sim(a.v, b.v)").as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)).cast("long"))
    ranked.filter(col("rank") <= 3).select("query_id", "neighbor_id", "rank")
  }

  /** IVF (inverted-file) ANN, nprobe=1: vectors are assigned to the cell of
    * their nearest centroid; queries probe only their own cell.
    *
    * Centroids here are a deterministic subsample (`vec_id % 97 == 0`) so
    * the oracle can mirror the assignment exactly; production IVF learns
    * centroids offline with k-means and broadcasts them identically. The
    * shape is the 100 TB layout: centroid table broadcast to every task
    * (assignment is map-side), then ONE shuffle on cell id — probe cost
    * scales with cell size, not corpus size, and nprobe trades recall for
    * cost without changing the plan.
    */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
    val cents = all.filter(pmod(col("vec_id"), lit(97)) === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val assigned = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cent_id"),
        expr("cosine_sim(v, cv)").as("cs"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cs").desc, col("cent_id").asc)))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"))
    q.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr("cosine_sim(qv, v)").as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)).cast("long"))
      .filter(col("rank") <= 10)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Embedding-cosine near-dup pairs: same sign bucket AND cosine ≥ 0.4
    * (threshold calibrated to the fixtures' cosine distribution).
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = vecs(spark, dir).withColumn("bucket", signBucket(col("v")))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        expr("cosine_sim(a.v, b.v)").as("cos"))
      .filter(col("cos") >= 0.4)
      .select("vec_a", "vec_b")
  }

  /** Int8 symmetric quantization audit: quantize each embedding to int8
    * (scale = 127 / max|x| per vector), dequantize, report the max absolute
    * reconstruction error. The 4×-storage-compression path for 100 TB
    * vector corpora; all arithmetic is exact-integer + one deterministic
    * double division per element, so the oracle mirrors it bit-for-bit.
    */
  def quantizeAudit(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .withColumn("mx", expr("aggregate(v, 0D, (acc, x) -> greatest(acc, abs(x)))"))
      .filter(col("mx") > 0)
      .withColumn("err", expr(
        "aggregate(transform(v, x -> abs(x - round(x * 127.0 / mx) * mx / 127.0)), 0D, (acc, e) -> greatest(acc, e))"))
      .select(col("vec_id"), round(col("err") / col("mx"), 6).as("rel_err"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_quantize" -> quantizeAudit _,
    "knn_bruteforce" -> knnBruteForce _,
    "knn_lsh" -> knnLsh _,
    "knn_ivf" -> knnIvf _,
    "embedding_neardup" -> embeddingNearDup _,
  )

  private val bucketSql: String =
    (0 until 8).map(j => s"(CASE WHEN embedding[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")

  def oracle: Map[String, String] = Map(
    "embedding_quantize" ->
      """WITH vv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |mm AS (SELECT vec_id, v,
        |  list_aggregate(list_transform(v, x -> abs(x)), 'max') AS mx FROM vv),
        |ee AS (SELECT vec_id, mx,
        |  list_aggregate(list_transform(v, x -> abs(x - round(x * 127.0 / mx) * mx / 127.0)), 'max') AS err
        |  FROM mm WHERE mx > 0)
        |SELECT vec_id, round(err / mx, 6) AS rel_err FROM ee""".stripMargin,
    "knn_bruteforce" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) DESC,
        |              n.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
        |  WHERE q.vec_id < 10)
        |WHERE rank <= 10""".stripMargin,
    "knn_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT a.vec_id AS query_id, b2.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY a.vec_id
        |     ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b2.embedding::DOUBLE[]) DESC,
        |              b2.vec_id ASC) AS rank
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id)
        |WHERE rank <= 3""".stripMargin,
    "knn_ivf" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0),
        |scored AS (
        |  SELECT e.vec_id, e.embedding, c.cent_id,
        |   row_number() OVER (PARTITION BY e.vec_id
        |     ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) DESC,
        |              c.cent_id ASC) AS crn
        |  FROM embeddings e CROSS JOIN cents c),
        |assigned AS (
        |  SELECT vec_id, embedding, cent_id AS cell FROM scored WHERE crn = 1),
        |q AS (SELECT vec_id AS query_id, embedding AS qv, cell FROM assigned WHERE vec_id < 10)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.query_id, a.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.query_id
        |     ORDER BY list_cosine_similarity(q.qv::DOUBLE[], a.embedding::DOUBLE[]) DESC,
        |              a.vec_id ASC) AS rank
        |  FROM q JOIN assigned a ON q.cell = a.cell AND q.query_id <> a.vec_id)
        |WHERE rank <= 10""".stripMargin,
    "embedding_neardup" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings)
        |SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b
        |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b2.embedding::DOUBLE[]) >= 0.4""".stripMargin,
  )
}
