package graft.core

import graft.search.Knn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed API edges (SURVEY §1.5): case classes for the collection row and
  * search hits, with `Dataset[T]` wrappers over the DataFrame operators.
  * DataFrames stay the engine core (dynamic schema, Catalyst-first); the
  * typed layer is for user-facing call sites that want compile-time field
  * checks. */

/** The reference collection row (src/app.py:96-103): server-assigned id,
  * chapter ≤100 chars, content ≤2000 chars, fixed-dim float vector. */
final case class Knowledge(id: Long, chapter: String, content: String,
                           vector: Seq[Float])

/** A search hit (src/app.py:261-267): score = 1 - distance. */
final case class SearchHit(id: Long, chapter: String, content: String,
                           distance: Double, score: Double)

object TypedSearch {
  /** Typed form of the reference `similarity_search` pipeline over a
    * Knowledge collection. */
  def similaritySearch(collection: Dataset[Knowledge], query: Seq[Float],
                       k: Int, scoreThreshold: Double = 0.3): Dataset[SearchHit] = {
    val spark: SparkSession = collection.sparkSession
    import spark.implicits._
    val q: DataFrame = Seq(Tuple1(query.toArray)).toDF("qe")
    Knn.searchPipeline(collection.toDF(), "vector", "id", q, "qe", k,
        scoreThreshold)
      .select($"id", $"chapter", $"content", $"distance", $"score")
      .as[SearchHit]
  }
}
