package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. AQE's skew-join handles most cases
  * at runtime; explicit salting remains the tool when one build-side key
  * dominates so heavily that even split shuffle blocks overwhelm a task
  * (classic at 100 TB: a null/default key holding 10% of the fact table).
  *
  * Salting an equi-join: the skewed (large) side gets a random salt in
  * [0, salts); the small side is exploded `salts`× so every
  * (key, salt) bucket finds its match. Correct for inner/left joins on
  * the salted side; the explode multiplies the small side's shuffle
  * volume by `salts`, so pick the smallest salts that flattens the skew.
  */
object Skew {

  /** Deterministic salt from row content (so retries/speculation stay
    * consistent; at scale prefer this to rand()).
    */
  def saltCol(keys: Seq[String], salts: Int) =
    pmod(hash(keys.map(col): _*), lit(salts))

  /** Inner equi-join of a skewed large side with a small side, salted
    * `salts` ways on `key`.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(salts)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
