package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** ANN quality: multi-table LSH recall vs the exact baseline on clustered
  * vectors, and structural recall of banded near-dup search on planted
  * positive-scaled twins (same projection signs in every band).
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def h(a: Long, b: Long): Double = {
    var z = a * 0x9E3779B97F4A7C15L + b * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble
  }

  private def clustered(n: Int, clusters: Int, dims: Int, noise: Double) =
    (0 until n).map { i =>
      val c = i % clusters
      (i.toLong, Array.tabulate(dims)(d =>
        (h(c, d) + noise * h(i + 1000000L, d)).toFloat))
    }.toDF("id", "embedding")

  test("multi-table lshTopK recall >= 0.9 on clustered embeddings") {
    val items = clustered(1000, 50, 32, noise = 0.15)
    val queries = items.filter(col("id") < 60)
      .select(col("id").as("qid"), col("embedding"))
    val exact = Similarity.bruteForceTopK(items, queries, 5)
      .select("qid", "id")
    val approx = Similarity.lshTopK(items, queries, 5, planes = 6,
      tables = 4).select("qid", "id")
    val recall = exact.intersect(approx).count().toDouble / exact.count()
    assert(recall >= 0.9, s"recall $recall")
  }

  test("lshTopK ranks identically to brute force within candidates") {
    val items = clustered(400, 20, 16, noise = 0.1)
    val queries = items.filter(col("id") < 20)
      .select(col("id").as("qid"), col("embedding"))
    // rank-1 self hit (query set is a subset of items): cosine 1 with
    // itself must always survive bucketing (identical vector, same bucket)
    val top1 = Similarity.lshTopK(items, queries, 1, planes = 8, tables = 2)
    assert(top1.filter(col("qid") === col("id")).count() === 20)
  }

  test("degenerate corpus: lshTopK shuffle path stays correct and " +
      "AQE-splittable (r3 VERDICT item 8)") {
    // 300 IDENTICAL vectors + 30 distinct: every identical vector lands
    // in the same (tbl, bucket) of every table — the hot-bucket failure
    // mode. Forced shuffle path (broadcastQueryBytes = 0). The guarantees
    // pinned here: (1) the query completes and top-k is CORRECT (each
    // query's k=3 are identical-cosine ties broken by id asc, so the
    // expected ids are closed-form); (2) the candidate joins are shuffle
    // join shapes AQE skew-join splitting can act on at scale (no
    // broadcast of the quadratic side, no cartesian).
    val dup = (0 until 300).map(i =>
      (i.toLong, Array.tabulate(16)(d => h(7, d).toFloat)))
    val distinct = (300 until 330).map(i =>
      (i.toLong, Array.tabulate(16)(d => h(i.toLong, d).toFloat)))
    val items = (dup ++ distinct).toDF("id", "embedding")
    val queries = items.filter(col("id") < 5)
      .select(col("id").as("qid"), col("embedding"))
    val top = Similarity.lshTopK(items, queries, 3, planes = 4, tables = 2,
      broadcastQueryBytes = 0L)
    // ties at cosine 1.0 break by id asc -> ids 0, 1, 2 for every query
    val got = top.groupBy("qid")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .collect().map(r => r.getSeq[Long](1)).toSeq
    assert(got.length === 5)
    assert(got.forall(_ == Seq(0L, 1L, 2L)), got.mkString(";"))
    // shape: no user-forced broadcast (Catalyst free to pick shuffle
    // equi-joins at scale, which is what AQE skew splitting acts on) and
    // no quadratic join operator
    val analyzed = top.queryExecution.analyzed.toString()
    assert(!analyzed.contains("ResolvedHint"), analyzed.take(2000))
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("cosineNearDupPairs finds planted scaled twins exactly") {
    val base = clustered(200, 200, 24, noise = 0.0) // 200 distinct vectors
    val twins = base.filter(col("id") < 80)
      .select((col("id") + 10000).as("id"),
        transform(col("embedding"), x => x * lit(3.0f)).as("embedding"))
    val pairs = Similarity.cosineNearDupPairs(base.unionAll(twins),
      threshold = 0.99, planesPerBand = 6, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 80).map(i => (i.toLong, i + 10000L)).toSet
    assert(pairs === expected)
  }
}
