package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives (SURVEY.md: "salting for skew, AQE for
  * runtime re-plan").
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime; the
  * manual salting here is for the cases AQE cannot split — e.g. a skewed
  * shuffle *aggregation* key, or a skewed join where one key dominates a
  * whole executor. Deterministic: the salt is a hash of stable columns,
  * never rand(), so results are reproducible and oracle-comparable.
  */
object Skew {

  /** Salted equi-join: fact side gets a deterministic salt in [0, salts)
    * from `saltFrom` (a stable high-cardinality fact column); the dim side
    * is replicated `salts`× . The shuffle key becomes (key, salt), so one
    * hot key spreads over `salts` reducers. Semantically identical to
    * `fact.join(dim, factKey === dimKey, "inner")`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
    dimKey: Column, saltFrom: Column, salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
    val replicated = dim
      .withColumn("__salt_arr", sequence(lit(0), lit(salts - 1)))
      .withColumn("__salt", explode(col("__salt_arr")))
      .drop("__salt_arr")
    salted.join(replicated,
      factKey === dimKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation for a skewed group key: partial
    * aggregate on (key, salt), then final aggregate on key. For algebraic
    * aggregates (sum/count/min/max) this is exactly what Catalyst's
    * partial+final HashAggregate already does map-side — this explicit
    * form exists for aggregates whose partial state must stay bounded per
    * reducer (e.g. collect-like or sketch merges) where one hot key would
    * otherwise overwhelm a single final task. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int,
    saltFrom: Column): DataFrame = {
    df.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value.cast("decimal(38,10)")).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).cast("double").as("total"))
  }
}
