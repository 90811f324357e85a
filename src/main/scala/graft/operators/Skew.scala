package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys.
  *
  * A groupBy on a power-law key sends the hottest key's entire volume
  * to one reducer; at 100 TB that single task is the job's wall clock.
  * [[saltedAggregate]] splits every key into `salts` subkeys (round 1:
  * shuffle on (key, salt) — hot keys spread over `salts` reducers),
  * then combines the per-salt partials (round 2: shuffle on key, but
  * now at most `salts` rows per key). Works for any algebraic
  * aggregate expressed as (partial, merge) column pairs.
  *
  * For joins, AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) covers the
  * shuffle-join case; salting remains the tool for aggregations and
  * for pre-AQE co-partitioning.
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param partials  aggregate columns for round 1 (over raw rows),
    *                  each aliased
    * @param merges    aggregate columns for round 2 (over round-1
    *                  partials), referring to the round-1 aliases, each
    *                  aliased to the final output name
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // Deterministic pseudo-random salt (cheap, uniform, no RNG state):
    // hash of all key-independent row content would be ideal; a
    // monotonically-increasing id modulo salts is uniform per partition.
    val salted = df.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Convenience: salted count + sum of `valueCol` by `keys`. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame =
    saltedAggregate(df, keys, salts,
      partials = Seq(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s")),
      merges = Seq(sum(col("_n")).as("n"), sum(col("_s")).as("sum")))

  /** Broadcast-salted join for a skewed LEFT side against a small-ish
    * right side: the right side is replicated `salts` times (one copy
    * per salt value), the left side salts each row once — the join key
    * becomes (key, salt) so a hot key spreads over `salts` reducers.
    * Right-side volume × salts must still be shuffle-affordable. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val explodedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(explodedRight, Seq(key, "_salt")).drop("_salt")
  }
}
