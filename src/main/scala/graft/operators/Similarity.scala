package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over `Array[Float]` columns.
  *
  *  - `cosine` / `dot`: pure higher-order-function expressions
  *    (`zip_with` + `aggregate`), fully codegen-compatible.
  *  - `bruteForceTopK`: exact baseline — broadcast join + per-query
  *    top-k window.
  *  - `lshTopK`: scale path — multi-table sign-random-projection
  *    (hyperplane LSH). The hyperplane matrix is a CONSTANT generated
  *    driver-side (splitmix64) and embedded as literal arrays, so
  *    bucketing is one codegen'd dot product per plane — not a hash call
  *    per (plane × dim × row). Multiple tables union their candidate
  *    sets, trading a small constant factor for recall.
  *  - `cosineNearDupPairs`: banded LSH (bands × planesPerBand sign
  *    bits); a pair is a candidate when ANY band bucket matches —
  *    the same recall shape as MinHash LSH, so near-identical vectors
  *    are found with probability → 1 while the per-bucket pair count
  *    stays sub-quadratic.
  */
object Similarity {
  import org.apache.spark.sql.graft.ColumnBridge

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d),
      (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  /** Fused codegen kernel — bit-identical to
    * `dot(a, b) / (norm(a) * norm(b))` (see VecKernels contract), one
    * loop instead of six interpreted higher-order passes per pair.
    */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

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
        cosine(col("qe"), col("ie")).as("cosine"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic constant hyperplane matrix: `planes` rows of `dims`
    * zero-mean components in [-1, 1]. Evaluated ONCE on the driver; the
    * per-row work is plain arithmetic inside whole-stage codegen.
    */
  private[graft] def planeMatrix(planes: Int, dims: Int,
      seed: Long): Array[Array[Double]] =
    Array.tabulate(planes, dims) { (p, d) =>
      splitmix64(seed * 1000003L + p.toLong * 65537L + d).toDouble /
        Long.MaxValue.toDouble
    }

  /** LSH bucket id from the sign bits of `planes` constant-hyperplane
    * projections.
    */
  def lshBucket(embedding: Column, planes: Int, dims: Int,
                seed: Long = 42L): Column = {
    // flattened constant matrix rides as a codegen reference object; the
    // per-row work is ONE fused loop (bit-identical to the per-plane
    // zip_with/aggregate left folds it replaces) instead of `planes`
    // interpreted HOF chains with a dims-element literal array each
    val m = planeMatrix(planes, dims, seed)
    val flat = new Array[Double](planes * dims)
    for (p <- 0 until planes; d <- 0 until dims) flat(p * dims + d) = m(p)(d)
    ColumnBridge.column(graft.functions.LshBucket(
      ColumnBridge.expression(embedding), planes, dims, flat))
  }

  private def dimsOf(df: DataFrame): Int =
    df.select(size(col("embedding"))).head.getInt(0)

  /** Approximate top-k with `tables` independent hyperplane tables:
    * candidates = union over tables of same-bucket items (distinct
    * (qid, id) BEFORE the exact-cosine join, so each candidate is scored
    * once), then exact cosine + per-query top-k. More tables → higher
    * recall at linearly more candidate-join traffic; 2^planes buckets
    * per table bounds bucket size.
    *
    * Broadcast-vs-shuffle is chosen by the QUERY side's optimizer size
    * estimate (no counting scan — same gate as `KnnJoin.useBroadcast`):
    * below `broadcastQueryBytes` the query side and the (queries×tables)-
    * bounded candidate set are broadcast (zero shuffle on the item side);
    * above it — the item↔item self-ANN shape, queries ≈ items — the plan
    * falls back to plain shuffle equi-joins on (tbl, bucket) / qid / id,
    * which scales to any query-set size. `broadcastQueryBytes = 0` forces
    * the shuffle plan outright.
    *
    * Skew: a degenerate corpus (many identical/near-identical vectors)
    * makes one (tbl, bucket) hot, and the candidate join for that bucket
    * is genuinely |items_B| × |queries_B| — that IS the LSH candidate
    * set, so unlike [[cosineNearDupPairs]] nothing can be dropped without
    * degrading top-k recall. Mitigation is therefore two-level:
    *  - the STRAGGLER (one task owning the hot bucket) is dissolved by
    *    AQE skew-join splitting — the shuffle-path candidates join is a
    *    plain equi-join, exactly the shape
    *    `spark.sql.adaptive.skewJoin.enabled` (on by default) splits and
    *    replicates at runtime; keep it on (the degenerate-corpus spec
    *    pins that the shuffle plan stays in AQE-splittable join shapes);
    *  - the VOLUME (quadratic candidate count itself) is a hard
    *    precondition: near-duplicate-dedup the corpus first
    *    ([[cosineNearDupPairs]] is the tool) or raise `planes` so buckets
    *    split. A corpus with q duplicated vectors emits O(q²) candidate
    *    rows by construction and no join strategy changes that.
    */
  def lshTopK(items: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
              tables: Int = 4, seed: Long = 42L,
              broadcastQueryBytes: Long = 64L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dims = dimsOf(items)
    def bucketed(df: DataFrame, idCol: String): DataFrame =
      df.select(col(idCol),
        posexplode(array((0 until tables).map(t =>
          lshBucket(col("embedding"), planes, dims, seed + t * 7919L)): _*))
          .as(Seq("tbl", "bucket")))
    val bi = bucketed(items, "id")
    val bq = bucketed(queries, "qid")
    val smallQueries = broadcastQueryBytes > 0L &&
      queries.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(broadcastQueryBytes)
    val joined =
      if (smallQueries) {
        val candidates = bi.join(broadcast(bq), Seq("tbl", "bucket"))
          .select("qid", "id").distinct()
        broadcast(candidates)
          .join(
            broadcast(queries.select(col("qid"), col("embedding").as("qe"))),
            "qid")
          .join(items.select(col("id"), col("embedding").as("ie")), "id")
          .select(col("qid"), col("id"),
            cosine(col("qe"), col("ie")).as("cosine"))
      } else {
        val candidates = bi.join(bq, Seq("tbl", "bucket"))
          .select("qid", "id").distinct()
        candidates
          .join(queries.select(col("qid"), col("embedding").as("qe")), "qid")
          .join(items.select(col("id"), col("embedding").as("ie")), "id")
          .select(col("qid"), col("id"),
            cosine(col("qe"), col("ie")).as("cosine"))
      }
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, banded LSH
    * candidates (any shared band bucket), exact cosine verify. Output
    * (id_a, id_b) with id_a < id_b.
    */
  def cosineNearDupPairs(items: DataFrame, threshold: Double,
                         planesPerBand: Int = 8, bands: Int = 4,
                         seed: Long = 42L,
                         maxBucketSize: Long = 100000L): DataFrame = {
    val dims = dimsOf(items)
    // hot-bucket guard (same rationale and partial-agg shape as
    // Dedup.minhashLsh): bound the quadratic self-join; near-identical
    // vectors share EVERY band, so they still meet unless all their
    // buckets are hot
    // pin only (id, band, bucket) through the guard's localCheckpoint:
    // the self-join and the exact-cosine verify both re-join `items` for
    // embeddings, so carrying the embedding column here would materialize
    // the whole corpus ×bands for nothing
    val banded = Dedup.dropHotBuckets(
      items.select(col("id"),
        posexplode(array((0 until bands).map(b =>
          lshBucket(col("embedding"), planesPerBand, dims,
            seed + b * 104729L)): _*)).as(Seq("band", "bucket"))),
      Seq("band", "bucket"), maxBucketSize)
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(items.select(col("id").as("id_a"), col("embedding").as("ea")),
        "id_a")
      .join(items.select(col("id").as("id_b"), col("embedding").as("eb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        cosine(col("ea"), col("eb")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b")
  }
}
