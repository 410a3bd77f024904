package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY §4.3's "salting documented for
  * skewed site keys" made executable).
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime; this
  * explicit salting is for the cases AQE cannot fix — e.g. a hot key in
  * a shuffle *aggregation*, or a broadcast-infeasible dimension joined
  * on a pathologically hot key. Salting trades `factor`× replication of
  * the small side for `factor`× parallelism on the hot keys of the big
  * side.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side's rows spread
    * over `factor` salt buckets and the small side replicated into all
    * buckets. Result is row-identical to the plain join (asserted in
    * SkewSpec). `saltSource` must be a deterministic expression over the
    * big side's columns (NOT rand(): retries/speculative tasks must
    * re-derive the same salt). */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, factor: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(factor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted partial → final) aggregation for hot grouping
    * keys: count/sum-style aggregates compute per (key, salt) first —
    * spreading a hot key over `factor` reducers — then combine.
    * Equivalent to the direct groupBy for decomposable aggregates. */
  def saltedSum(
      df: DataFrame, key: String, valueCol: String, saltSource: Column,
      factor: Int = 8): DataFrame = {
    df.withColumn("_salt", pmod(xxhash64(saltSource), lit(factor)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valueCol"),
        sum("_pn").cast("long").as("cnt"))
  }
}
