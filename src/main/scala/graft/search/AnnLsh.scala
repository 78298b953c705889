package graft.search

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Random-projection LSH ANN tier (MLlib) — the alternative scale path to
  * [[IvfIndex]] (BASELINE.json: "MLlib for batch indexing"). Buckets are
  * computed batch-side by `BucketedRandomProjectionLSH`; neighbor lookup
  * uses the model's multi-probe approxNearestNeighbors. Approximate by
  * construction (no cross-engine oracle); recall against the exact tier is
  * pinned in ScalaTest. */
object AnnLsh {
  def fit(df: DataFrame, vecCol: String, bucketLength: Double = 2.0,
          numTables: Int = 3, seed: Long = 42L)
  : (BucketedRandomProjectionLSHModel, DataFrame) = {
    val withVec = df.withColumn("__mlvec", array_to_vector(col(vecCol)))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("__mlvec").setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
    val model = lsh.fit(withVec)
    (model, model.transform(withVec))
  }

  /** Approximate top-k by euclidean distance; emits squared distance to
    * match the engine's L2² convention. */
  def neighbors(model: BucketedRandomProjectionLSHModel, indexed: DataFrame,
                query: Array[Float], k: Int, idCol: String): DataFrame = {
    val key = Vectors.dense(query.map(_.toDouble))
    model.approxNearestNeighbors(indexed, key, k).toDF()
      .select(col(idCol),
        round(col("distCol") * col("distCol"), 4).as("distance"))
      .orderBy(col("distance").asc, col(idCol).asc)
  }
}
