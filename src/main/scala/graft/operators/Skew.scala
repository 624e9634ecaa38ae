package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted join. AQE's skew-join handles most cases at
  * runtime; explicit salting remains the tool when one join key dominates
  * so heavily that a single post-split partition still stalls a stage
  * (the classic power-law key at 100 TB).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side salted into
    * `salts` sub-keys and the small side replicated per salt. The salt is
    * derived from the whole big-side row (deterministic across task
    * retries — never `rand()`, which breaks exactly-once semantics on
    * recompute). Result equals the unsalted join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
