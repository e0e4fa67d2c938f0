package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew remediation utilities (SURVEY.md §4 / the 100 TB design point).
  *
  * AQE's skew-join splitting handles most shuffle skew automatically in
  * Spark 4; these are the explicit techniques for the cases it can't see —
  * a hot grouping key in a two-phase aggregate, or a broadcast-infeasible
  * dimension with a hot join key.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial-aggregate on (key, salt) —
    * spreading one hot key over `buckets` reducers — then final-aggregate
    * on key. Correct for any commutative/associative aggregate passed as
    * (partial, final) column pairs keyed by output name.
    *
    * deterministic salt: hash of a row-distinguishing column modulo
    * buckets (never Random in a task — must be cluster-replayable). */
  def saltedAgg(df: DataFrame, key: Column, keyName: String, saltBy: Column,
      buckets: Int, partial: Seq[(String, Column)],
      fin: Seq[(String, Column)]): DataFrame = {
    require(!partial.exists(_._1 == keyName) && !fin.exists(_._1 == keyName),
      s"aggregate output name collides with key column '$keyName'")
    val salted = df.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    val stage1 = salted.groupBy(key.as(keyName), col("__salt"))
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    stage1.groupBy(col(keyName))
      .agg(fin.head._2.as(fin.head._1),
        fin.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Salted join for a hot-keyed fact against a non-broadcastable dim:
    * fact rows get a deterministic salt in [0, buckets) derived from
    * `saltBy` (a stable row-distinguishing column of the fact — an id, a
    * timestamp; NEVER monotonically_increasing_id or rand, which change
    * under task replay and silently duplicate/drop join rows); the dim is
    * replicated `buckets` times with each salt value; the join key becomes
    * (key, salt) — splitting each hot key's rows across `buckets` tasks.
    * Row-for-row identical to the unsalted join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltBy: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(factKey), saltBy), lit(buckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(expr(s"sequence(0, ${buckets - 1})")))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
        saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
