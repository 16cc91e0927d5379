package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew defenses for shuffle joins.
  *
  * A shuffle equi-join partitions both sides by the join key: one hot key
  * (a dominant event type, a null-ish default, a celebrity user) lands an
  * entire side's rows for that key in ONE task — the classic straggler at
  * 100 TB. AQE's skew-join split handles sort-merge cases after the fact;
  * salting is the planned-ahead form that also works for shuffle-hash
  * joins and for deliberately co-partitioned pipelines.
  */
object Skew {

  /** Equi-join `fact` (large, skewed) with `dim` (small per key, but too
    * large or too dynamic to broadcast) spreading each hot key over
    * `salts` partitions:
    *
    *  - fact rows get a deterministic salt in [0, salts) hashed from
    *    `saltBasisCol` (any roughly-unique column — an id; NOT the join
    *    key, which would defeat the spread);
    *  - dim rows are replicated once per salt value (explode of a
    *    `sequence` literal — dim grows ×salts, which is the price of
    *    spreading; keep `salts` ≈ executor-count / hot-key-count);
    *  - the join runs on (keys..., salt), so a key's rows split across
    *    `salts` reducers instead of one.
    *
    * The result is row-identical to `fact.join(dim, keys)` for any salt
    * count — salting only changes the partitioning, which is what makes it
    * safe to apply mechanically when a key histogram says so. */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltBasisCol: String,
      salts: Int
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(saltBasisCol)), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, keys :+ "__salt").drop("__salt")
  }
}
