package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling: every decision is a pure function of a
  * row's id and a seed, via the engine-portable hash
  * ([[TextOps.portableHash64]]) reduced mod 1000.
  *
  * Why hash gates and not `df.sample()`: at 100 TB a sample must be
  *  - reproducible across runs, partitionings, and engines (rng state
  *    is none of those; the DuckDB oracles mirror the md5 gate exactly),
  *  - stable under re-partition/retry (a task retry must not change
  *    membership),
  *  - joinable (two tables sampled on the same key agree row-for-row).
  * The gate is map-side only — no shuffle, no state, codegen-friendly.
  */
object Sampling {

  /** Uniform per-mille bucket (0..999) of a row id under a seed. */
  def hashPermille(id: Column, seed: Int): Column =
    pmod(TextOps.portableHash64(id.cast("string"), seed), lit(1000L))

  /** Keep-gate: true for ~`permille`/1000 of rows, deterministically. */
  def keep(id: Column, seed: Int, permille: Column): Column =
    hashPermille(id, seed) < permille

  /** Disjoint split assignment from cumulative per-mille cuts, e.g.
    * splits(id, 17, Seq("train" -> 900, "val" -> 950), "test"):
    * buckets [0,900) → train, [900,950) → val, rest → test. Changing a
    * later cut never reassigns rows between earlier splits (membership
    * is monotone in the cut), so growing the val share does not silently
    * move train docs into test.
    */
  def split(id: Column, seed: Int, cuts: Seq[(String, Int)], last: String): Column = {
    val h = hashPermille(id, seed)
    cuts.foldRight(lit(last): Column) { case ((name, cut), acc) =>
      when(h < cut, name).otherwise(acc)
    }
  }
}
