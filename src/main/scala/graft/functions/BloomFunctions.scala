package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter build/probe over Catalyst's OWN runtime-filter
  * expressions ([[BloomFilterAggregate]] / [[BloomFilterMightContain]] —
  * the machinery `InjectRuntimeFilter` plants automatically inside one
  * query). Exposing it as a first-class pair lets a PIPELINE reuse one
  * built filter across many jobs — the decontamination shape: build the
  * bloom over the (bounded) eval-suite n-grams ONCE, then probe every
  * training ingest batch with a codegen'd scan predicate, shuffling only
  * probable hits to the exact verify join.
  *
  * Both sides key on `xxhash64(value)` (seed 42), the same discipline
  * Catalyst uses, so build and probe agree on hashing byte-for-byte;
  * `BloomFilterMightContain` deserializes the aggregate's binary once
  * per task and evaluates as a plain codegen predicate. Bloom filters
  * have NO false negatives — a probe can only over-admit, so any
  * downstream exact join keeps results exact. */
object BloomFunctions {
  /** Aggregate a column into a serialized bloom filter (binary).
    * `expectedItems` sizes the filter (Spark defaults the bit budget
    * from it); pass the build side's distinct-count estimate.
    *
    * LOUD at the Catalyst caps: [[BloomFilterAggregate]] silently
    * clamps the estimate to `spark.sql.optimizer.runtime.bloomFilter.
    * maxNumItems` (default 4M) and the bit budget to `...maxNumBits`
    * (default 2²⁶ bits) — a clamped filter saturates, fpp drifts
    * toward 1, and a prefilter quietly degrades to a full pass while
    * results stay exact. This wrapper refuses instead: raise the two
    * confs (or chunk the build side) when the suite genuinely exceeds
    * them. */
  def bloomAgg(value: Column, expectedItems: Long): Column = {
    val conf = org.apache.spark.sql.SparkSession.active.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
      "67108864").toLong
    require(expectedItems <= maxItems && expectedItems * 8 <= maxBits,
      s"expectedItems=$expectedItems would be silently clamped " +
        s"(maxNumItems=$maxItems, maxNumBits=$maxBits → filter " +
        "saturates and the prefilter degrades to a full pass); raise " +
        "spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits}" +
        " or chunk the build side")
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(value)), expectedItems)
      .toAggregateExpression())
  }

  /** Probe predicate: might `value` be in the serialized filter?
    * The filter bytes ride into the plan as ONE binary literal
    * (bounded by the filter's bit budget, not the corpus). */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    Bridge.column(new BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      Bridge.expression(xxhash64(value))))
}
