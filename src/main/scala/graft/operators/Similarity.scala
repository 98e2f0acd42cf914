package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity search over `Array[Float]` columns.
  *
  *  - `cosine` / `dot`: pure higher-order-function expressions
  *    (`zip_with` + `aggregate`), fully codegen-compatible.
  *  - `bruteForceTopK`: exact baseline — join + per-query top-k window.
  *  - `lshTopK`: scale path — sign-random-projection (hyperplane LSH)
  *    buckets both sides, exact cosine within bucket only; hyperplanes
  *    are derived deterministically from a seed (no external state) so
  *    any executor computes identical buckets.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d),
      (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for every query vector.
    * `items` (id, embedding), `queries` (qid, embedding).
    * Output (qid, id, cosine, rank), rank 1..k by descending similarity,
    * ties broken by id for determinism.
    */
  def bruteForceTopK(items: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = queries.select(col("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(items.select(col("id"), col("embedding").as("ie"))))
      .select(col("qid"), col("id"),
        cosine(col("qe").cast("array<double>"),
          col("ie").cast("array<double>")).as("cosine"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim d): a zero-mean double derived from xxhash64 — computed as a
    * column expression so bucketing runs inside codegen.
    */
  private def planeComponent(p: Int, d: Column, seed: Long): Column =
    (xxhash64(concat_ws(":", lit(seed), lit(p), d)).cast("double") /
      lit(Long.MaxValue.toDouble))

  /** LSH bucket id: `planes` sign bits of hyperplane projections. */
  def lshBucket(embedding: Column, planes: Int, seed: Long = 42L): Column = {
    val dims = sequence(lit(0), size(embedding) - 1)
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(embedding.cast("array<double>"), dims,
          (x, d) => x * planeComponent(p, d, seed)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * (single equi-join, shuffle keyed by bucket), exact cosine + window
    * top-k inside the bucket. `planes` trades recall vs bucket size.
    */
  def lshTopK(items: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bi = items.select(col("id"), col("embedding").as("ie"),
      lshBucket(col("embedding"), planes, seed).as("bucket"))
    val bq = queries.select(col("qid"), col("embedding").as("qe"),
      lshBucket(col("embedding"), planes, seed).as("bucket"))
    val joined = bq.join(bi, Seq("bucket"))
      .select(col("qid"), col("id"),
        cosine(col("qe").cast("array<double>"),
          col("ie").cast("array<double>")).as("cosine"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` (bucketed:
    * only intra-bucket pairs are compared).
    */
  def cosineNearDupPairs(items: DataFrame, threshold: Double,
                         planes: Int = 8, seed: Long = 42L): DataFrame = {
    val b = items.select(col("id"), col("embedding"),
      lshBucket(col("embedding"), planes, seed).as("bucket"))
    val l = b.select(col("bucket"), col("id").as("id_a"),
      col("embedding").as("ea"))
    val r = b.select(col("bucket"), col("id").as("id_b"),
      col("embedding").as("eb"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("ea").cast("array<double>"),
          col("eb").cast("array<double>")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
