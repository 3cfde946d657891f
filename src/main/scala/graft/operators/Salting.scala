package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — the manual fallback when AQE's runtime
  * skew handling isn't enough (e.g. one key holding >50% of a 100 TB
  * fact table). Both operators produce results IDENTICAL to their
  * unsalted equivalents (oracled in ExtrasQueries) — only the shuffle
  * layout changes.
  */
object Salting {

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt) —
    * spreading one hot key over `salts` reducers — then final-aggregate
    * on keys. The salt is derived deterministically from `saltSource`
    * (any roughly-unique column), so reruns shuffle identically.
    *
    * Note Spark's own partial aggregation already handles most skew for
    * algebraic aggregates; explicit salting matters for high-cardinality
    * COUNT DISTINCT / collect-style aggregates where the partial state
    * itself is the problem. */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], saltSource: Column, salts: Int)(
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols: _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Skew-safe equi-join of a skewed fact side against a small dimension:
    * the fact side gets a deterministic salt in [0, salts); the dimension
    * is replicated `salts` times; the join key becomes (key, salt) so one
    * hot key spreads over `salts` tasks. Semantically identical to the
    * plain inner join. */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
