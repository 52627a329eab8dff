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

  /** Per-row salt that splits even IDENTICAL rows (content hashing would
    * send every copy of a duplicated hot row to one bucket — exactly the
    * case salting exists for). monotonically_increasing_id is stable
    * within a task retry (partition id + in-partition offset), so
    * speculative re-execution salts consistently. If the INPUT's row
    * order is itself nondeterministic (output of a shuffle), Spark's
    * indeterminate-stage machinery (SPARK-23243) rolls back and re-runs
    * dependent stages on fetch failure, which keeps the join correct.
    */
  def saltCol(salts: Int) =
    pmod(hash(monotonically_increasing_id()), lit(salts))

  /** Inner equi-join of a skewed large side with a small side, salted
    * `salts` ways on `key`.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt", saltCol(salts))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
