package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Design for 100 TB:
  *  - All arithmetic is built-in higher-order functions (`zip_with` +
  *    `aggregate`) in double precision — codegen'd, no UDFs, and bit-for-bit
  *    reproducible by the DuckDB oracle via `list_reduce` (both are strict
  *    left folds in element order).
  *  - Brute-force top-k broadcasts the query set (small side) and relies on
  *    Spark's InferWindowGroupLimit (3.5+) to push `rank <= k` into partial
  *    per-partition top-k before the shuffle — no full sort of the scored
  *    cross product.
  *  - The scale path is sign-LSH bucketing: candidate generation is an
  *    equi-join on an 8-bit bucket key, never an O(n²) cross join. Planes
  *    are deterministic md5-parity ±1 vectors so every engine derives the
  *    identical bucketing.
  */
object Similarity {

  /** Double-precision dot product: strict left fold in element order. */
  def dotDouble(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), _ + _)

  def cosine(a: Column, b: Column): Column =
    dotDouble(a, b) / (sqrt(dotDouble(a, a)) * sqrt(dotDouble(b, b)))

  /** Cosine via the codegen'd one-pass kernel (graft.ext.GraftExtensions)
    * when registered in the session, else the portable HOF fold. Both
    * accumulate left-to-right in double precision — bit-identical results. */
  def cosineFor(spark: org.apache.spark.sql.SparkSession)(a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_cosine")) call_function("graft_cosine", a, b)
    else cosine(a, b)

  /** Exact top-k cosine neighbors of each query vector.
    * `queries` must be small (it is broadcast); both frames need
    * (idCol, vecCol). Self-matches are excluded; ties break on neighbor id. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val cos = cosineFor(corpus.sparkSession) _
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cos(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplane components: sign_{j,i} = +1 iff the 60-bit
    * md5 hash of "j:i" is odd — the same family TextFunctions.hash60 /
    * the DuckDB oracle computes. */
  def hyperplaneSigns(planes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until planes).map { j =>
      (0 until dim).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$j:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
        if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
      }
    }

  /** Sign-LSH bucket id in [0, 2^planes): bit j set iff dot(v, plane_j) >= 0.
    * Plane components are plan literals — nothing is shipped at runtime. */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column = {
    val signs = hyperplaneSigns(planes, dim)
    // coalesce marks the bucket non-nullable so the bucket equi-join can't
    // infer an IsNotNull constraint that would clone all `planes` dot
    // products into a pre-exchange Filter (see Dedup.bandKeys).
    coalesce(
      (0 until planes).map { j =>
        when(dotDouble(vec, typedlit(signs(j))) >= 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _),
      lit(-1))
  }

  /** Approximate cosine near-dup pairs: bucket by sign-LSH, equi-join within
    * buckets, verify with the exact cosine. */
  def lshCosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      planes: Int = 8,
      threshold: Double = 0.3
  ): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes, dim))
    val cos = cosineFor(df.sparkSession) _
    b.as("a")
      .join(b.as("b"), col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        cos(col("a.v"), col("b.v")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
