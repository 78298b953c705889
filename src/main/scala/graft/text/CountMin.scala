package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the heavy-hitter /
  * frequency-estimation primitive at 100 TB: a `depth × width` counter
  * matrix where every item increments one counter per row (bucket =
  * row-salted hash mod width) and an item's estimate is the MIN of its
  * counters — always an overestimate, with error ≤ 2N/width at
  * probability 1 − 0.5^depth. The matrix is additively mergeable
  * (map-side combine ships one bounded matrix per partition, never the
  * token stream), and — the property this repo prizes — md5-derived
  * bucket hashes make the whole sketch DETERMINISTIC and engine-portable,
  * so the DuckDB oracle replays counters and estimates bit-for-bit
  * (`approx_count_distinct`-style engine-internal sketches cannot be
  * cross-checked; this one is).
  */
object CountMin {
  /** Row-salted bucket for a token: first 32 md5 bits of "cms<row>:<tok>"
    * mod `width`. */
  def bucket(tok: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$row:"), tok)), 1, 8), 16, 10)
      .cast("long") % width

  /** The (row, bucket) → count counter matrix for a token column — ONE
    * hash-aggregate over the exploded (token × depth) pairs; at scale
    * this is the only pass over the data and it map-side combines into
    * ≤ depth·width counters per partition. */
  def counterMatrix(toks: DataFrame, tokCol: String, depth: Int,
                    width: Int): DataFrame = {
    require(depth > 0 && width > 0)
    toks.select(explode(array((0 until depth).map { r =>
        struct(lit(r).as("r"), bucket(col(tokCol), r, width).as("b"))
      }: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-query estimates for `items` (a small DataFrame with `tokCol`):
    * min over the `depth` counters each item hashes to. The item side is
    * tiny (heavy-hitter candidates), so the lookups broadcast.
    *
    * LEFT join + coalesce(0): the sparse matrix only stores touched
    * buckets, but an untouched bucket's counter is ZERO by the sketch's
    * definition — an inner join would take the min over only the nonzero
    * counters (overestimating an absent item) and would drop an item
    * hitting exclusively empty buckets instead of reporting 0, which
    * breaks `estimate` as a general point-query primitive (items drawn
    * from the stream always have all counters > 0, so registry queries
    * never saw the difference). */
  def estimate(items: DataFrame, tokCol: String, matrix: DataFrame,
               depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0)
    items.select(col("*"), explode(array((0 until depth).map { r =>
        struct(lit(r).as("r"), bucket(col(tokCol), r, width).as("b"))
      }: _*)).as("rb"))
      .select(col("*"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(matrix, Seq("r", "b"), "left")
      .groupBy(col(tokCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("n_cms"))
  }
}
