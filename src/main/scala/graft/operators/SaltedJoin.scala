package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-resistant equi-join via key salting (SURVEY §2.7 / the 100 TB
  * checklist: "salting for skew").
  *
  * A hash-partitioned join sends every row of a hot key to one task; at
  * 100 TB a single hot key stalls the stage. Salting splits each left key
  * into `nSalts` sub-keys (deterministic hash of a discriminator column,
  * not rand(), so plans stay replayable) and replicates the right side
  * once per salt, so the hot key fans out over `nSalts` tasks. The result
  * is exactly the plain join (the oracle pins that). Use when AQE's
  * skew-join splitting isn't available/enough (e.g. the build side isn't
  * broadcastable and the skew is in a single key).
  */
object SaltedJoin {
  def inner(left: DataFrame, right: DataFrame, leftKey: String,
            rightKey: String, saltBy: String, nSalts: Int): DataFrame = {
    val salted = left.withColumn("__salt", pmod(hash(col(saltBy)), lit(nSalts)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
