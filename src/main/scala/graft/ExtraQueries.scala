package graft

import graft.QueryDsl._
import graft.core.Tables
import graft.functions.VectorMeanAggregator
import graft.ingest.{Loaders, Preprocess}
import graft.search.AnnLsh
import org.apache.spark.sql.functions._

/** Remaining checklist surface: CSV source round-trip, LSH ANN tier,
  * custom typed aggregation, range join, pivot. */
object ExtraQueries {
  /** S1-S4 + I1/I2 through the gate: write a reference-shaped CSV (章节 /
    * knowledge columns exercise the auto-detect heuristic), load it back
    * through the CSV source, preprocess, aggregate. */
  private val csvKnowledgeLoad = Q(
    "csv_knowledge_load",
    (s, dir) => {
      val csvPath = s"/tmp/graft_csv_${math.abs(dir.hashCode)}"
      Tables.documents(s, dir).where(col("doc_id") < 50)
        .select(col("source").as("章节"), col("text").as("knowledge_text"))
        .coalesce(1).write.mode("overwrite").option("header", "true").csv(csvPath)
      val loaded = Loaders.loadKnowledgeCsv(s, csvPath)
      Preprocess(loaded, "content")
        .groupBy(col("chapter"))
        .agg(count(lit(1)).as("n"),
          round(avg(length(col("content_clean"))), 4).as("avg_len"))
        .orderBy(col("chapter").asc)
    },
    Some("""
      WITH c AS (
        SELECT source AS chapter,
               trim(regexp_replace(regexp_replace(text,
                 '[^\w一-鿿\s.,!?;:，。！？；：]', '', 'g'), '\s+', ' ', 'g'))
                 AS content_clean
        FROM documents WHERE doc_id < 50)
      SELECT chapter, CAST(count(*) AS BIGINT) AS n,
             round(avg(length(content_clean)), 4) AS avg_len
      FROM c WHERE length(content_clean) >= 10
      GROUP BY chapter ORDER BY chapter ASC
    """))

  /** Approximate NN via MLlib random-projection LSH (rows-only: the hash
    * family is engine-internal; recall vs exact is pinned in ScalaTest). */
  private val annLsh = Q(
    "ann_lsh",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val (model, indexed) = AnnLsh.fit(e, "embedding")
      val query = e.where(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      AnnLsh.neighbors(model, indexed, query, k = 5, idCol = "vec_id")
    },
    None)

  /** Custom typed Aggregator: per-label mean embedding (centroid), rows
    * out as (label, dim, m) to stay hash-comparable. */
  private val labelCentroids = Q(
    "label_centroids",
    (s, dir) => {
      val vecMean = udaf(new VectorMeanAggregator(64))
      Tables.embeddings(s, dir)
        .groupBy(col("label"))
        .agg(vecMean(col("embedding")).as("centroid"))
        .select(col("label").cast("long").as("label"),
          posexplode(col("centroid")).as(Seq("pos", "m")))
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          round(col("m"), 4).as("m"))
        .orderBy(col("label").asc, col("dim").asc)
    },
    Some("""
      WITH u AS (SELECT label, unnest(range(1, len(embedding)+1)) AS dim,
                        unnest(embedding) AS v
                 FROM embeddings)
      SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
             round(avg(CAST(v AS DOUBLE)), 4) AS m
      FROM u GROUP BY label, dim
      ORDER BY label ASC, dim ASC
    """))

  /** Range (theta) join: events against a broadcast bucket-boundary dim. */
  private val rangeJoinBuckets = Q(
    "range_join_buckets",
    (s, dir) => {
      import s.implicits._
      val buckets = Seq((0L, 0.0, 5.0), (1L, 5.0, 10.0), (2L, 10.0, 15.0),
        (3L, 15.0, 20.0), (4L, 20.0, 1e18))
        .toDF("bucket_id", "lo", "hi")
      Tables.events(s, dir)
        .join(broadcast(buckets),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("bucket_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("bucket_id").asc)
    },
    Some("""
      WITH b(bucket_id, lo, hi) AS (VALUES
        (0, 0.0, 5.0), (1, 5.0, 10.0), (2, 10.0, 15.0),
        (3, 15.0, 20.0), (4, 20.0, 1e18))
      SELECT CAST(bucket_id AS BIGINT) AS bucket_id,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS total_value
      FROM events JOIN b ON value >= lo AND value < hi
      GROUP BY bucket_id ORDER BY bucket_id ASC
    """))

  /** Pivot: per-user event-type count matrix (fixed column set). */
  private val pivotUserEvents = Q(
    "pivot_user_events",
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .count()
      p.select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).cast("long").as(t)): _*)
        .orderBy(col("user_id").asc)
    },
    Some("""
      SELECT user_id,
             CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
             CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
             CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
             CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
             CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
      FROM events GROUP BY user_id ORDER BY user_id ASC
    """))

  /** The SQL surface end-to-end: temp views + the registered graft_l2_sq
    * function + a scalar subquery, pure spark.sql text. */
  private val sqlKnn = Q(
    "sql_knn",
    (s, dir) => {
      GraftExtensions.register(s)
      Tables.embeddings(s, dir).createOrReplaceTempView("graft_embeddings")
      s.sql("""
        SELECT vec_id,
               round(graft_l2_sq(embedding,
                 (SELECT embedding FROM graft_embeddings WHERE vec_id = 0)), 4)
                 AS distance
        FROM graft_embeddings
        ORDER BY distance ASC, vec_id ASC LIMIT 5
      """)
    },
    Some("""
      WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      SELECT e.vec_id, %L2% AS distance
      FROM embeddings e, q
      ORDER BY distance ASC, e.vec_id ASC LIMIT 5
    """.replace("%L2%", duckL2("e.embedding", "q.qe"))))

  val all: Seq[Q] = Seq(csvKnowledgeLoad, annLsh, labelCentroids,
    rangeJoinBuckets, pivotUserEvents, sqlKnn)
}
