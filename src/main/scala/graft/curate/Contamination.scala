package graft.curate

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test contamination detection: for every test/val document, find
  * the training document sharing the most token n-gram shingles and the
  * shared-shingle ratio — the decontamination gate a pretraining corpus
  * runs before evaluation sets are trusted.
  *
  * Shape: the same inverted-index join as Dedup.jaccardTopPairs, but
  * BIPARTITE (train postings × eval postings), so cost is
  * Σ_shingle train-df × eval-df — never |train|×|eval| — and the
  * df-cap guard applies to the train side, where corpus-frequent
  * shingles would otherwise create quadratic posting lists. Per-doc
  * winners come from a window over the per-pair counts, partitioned by
  * the eval doc — bounded by candidates per doc, no global state.
  */
object Contamination {
  /** Overlap report: (doc_id, split, best_train_id, n_shared, overlap)
    * for each non-train doc sharing >= 1 (sub-cap) shingle with any
    * train doc; overlap = shared / eval-doc shingle count, ties on
    * n_shared broken by lowest train id.
    *
    * The split+shingle table feeds THREE consumers (postings, the train
    * count, eval sizes) — so, per the shared-intermediate contract
    * (graft.dedup.Dedup class doc), it takes a `workDir`: when given,
    * the table is a build-once parquet artifact both sides scan; when
    * omitted (small inputs, tests) it is recomputed per consumer.
    * Nothing is `cache()`d — an un-evicted executor-memory copy of
    * every shingle array is exactly what a 100 TB corpus run cannot
    * afford, while a parquet artifact is bounded only by storage. */
  def report(df: DataFrame, idCol: String, textCol: String,
             shingleN: Int = 3, maxDfFrac: Double = 0.05,
             workDir: Option[String] = None): DataFrame = {
    val base = Sampling.withSplit(
      df.select(col(idCol).as("id"), col(textCol).as("text")), "id")
      .repartition(col("id"))
    val shPlan = base.select(col("id"), col("split"),
        Dedup.shingles(col("text"), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
    val sh = workDir.map(d =>
      graft.core.Artifacts.buildOnce(df.sparkSession,
        s"$d/contamination_sh_n$shingleN")(shPlan))
      .getOrElse(shPlan)
    val postings = sh.select(col("id"), col("split"),
      explode(col("sh")).as("shingle"))
    val train = postings.where(col("split") === "train")
      .select(col("shingle"), col("id").as("train_id"))
    // df-cap on the train side (the big side at scale)
    val nTrain = sh.where(col("split") === "train")
      .agg(count(lit(1)).as("n_train"))
    val trainDf = train.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df_"))
    val trainKept = train.join(trainDf, "shingle")
      .crossJoin(broadcast(nTrain))
      .where(col("df_") <= ceil(col("n_train") * lit(maxDfFrac)))
      .select(col("shingle"), col("train_id"))
    val eval_ = postings.where(col("split") =!= "train")
      .select(col("shingle"), col("id").as("eval_id"), col("split"))
    val shared = eval_.join(trainKept, "shingle")
      .groupBy(col("eval_id"), col("split"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))
    val evalSizes = sh.where(col("split") =!= "train")
      .select(col("id").as("eval_id"), size(col("sh")).as("eval_sz"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("eval_id"))
      .orderBy(col("n_shared").desc, col("train_id").asc)
    shared.join(evalSizes, "eval_id")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("eval_id").as("doc_id"), col("split"),
        col("train_id").as("best_train_id"), col("n_shared"),
        round(col("n_shared").cast("double") / col("eval_sz") + lit(1e-9), 4)
          .as("overlap"))
  }

  /** Bloom-prefiltered decontamination SCRUB — the production twin of
    * [[report]] for the 100 TB direction of the problem: [[report]]
    * scores each EVAL doc against the train corpus; the scrub flags
    * every TRAIN doc carrying at least `minShared` n-grams that appear
    * anywhere in the eval suites (the GPT-3-style long-n-gram
    * decontamination pass — long shingles so incidental phrase overlap
    * does not mass-flag the corpus).
    *
    * Scale shape: the eval side is BOUNDED (benchmark suites, not the
    * corpus), so its distinct shingles compress into one bloom filter
    * built by a single aggregate job ([[graft.functions.BloomFunctions]]
    * over Catalyst's own runtime-filter expressions) and shipped to the
    * train scan as a plan literal. The 100 TB train side is then probed
    * by a codegen `might_contain` predicate DURING its one scan — no
    * shuffle of the train corpus's shingles; only probable hits (true
    * overlaps + the filter's ~1% false positives) reach the exact
    * verify join, whose result is exact because blooms have no false
    * negatives. Iterating ingest batches reuses the same filter bytes —
    * build once, probe every batch.
    *
    * The split+shingle table feeds THREE consumers (the eval count, the
    * bloom build, the probed train side) — pass `workDir` (the
    * [[report]] shared-intermediate contract) so it is a build-once
    * artifact and the probe pass is the only corpus-wide tokenization;
    * omitted (small inputs, tests), the plan recomputes per consumer.
    *
    * Returns (doc_id, n_shared, action="drop") for flagged TRAIN docs;
    * `n_shared` counts distinct eval-overlapping shingles, exactly. */
  def bloomScrub(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 8, minShared: Int = 1,
                 workDir: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // repartition before the shingle kernel: the CPU-heavy per-row work
    // spreads across the cluster instead of the input's file count (the
    // report()/README discipline for signature stages)
    val base = Sampling.withSplit(
      df.select(col(idCol).as("id"), col(textCol).as("text")), "id")
      .repartition(col("id"))
    val shPlan = base.select(col("id"), col("split"),
        Dedup.shingles(col("text"), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
    val sh = workDir.map(d =>
      graft.core.Artifacts.buildOnce(spark,
        s"$d/bloomscrub_sh_n$shingleN")(shPlan))
      .getOrElse(shPlan)
    // the distinct eval shingle set feeds THREE consumers (count, bloom
    // build, verify join) — staged too, so each reads the artifact
    // instead of re-running the explode+distinct shuffle
    val evalPlan = sh.where(col("split") =!= "train")
      .select(explode(col("sh")).as("shingle")).distinct()
    val evalShingles = workDir.map(d =>
      graft.core.Artifacts.buildOnce(spark,
        s"$d/bloomscrub_eval_n$shingleN")(evalPlan))
      .getOrElse(evalPlan)
    // size the filter from the build side's own count (one bounded job
    // over the SMALL side), then build it in a second aggregate pass
    val nEval = math.max(1L, evalShingles.count())
    val bloomBytes = evalShingles
      .select(graft.functions.BloomFunctions
        .bloomAgg(col("shingle"), nEval).as("bf"))
      .as[Array[Byte]].head()
    val trainPost = sh.where(col("split") === "train")
      .select(col("id").as("train_id"), explode(col("sh")).as("shingle"))
    val candidates = trainPost.where(
      graft.functions.BloomFunctions.mightContain(bloomBytes, col("shingle")))
    // exact verify: survivors (a ~fpp-sized slice of the corpus) join
    // the true eval shingle set; per-doc shingles are already distinct
    // (TokenShingles), so count(*) counts distinct shared shingles
    candidates.join(evalShingles, "shingle")
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select(col("train_id").as("doc_id"), col("n_shared"),
        lit("drop").as("action"))
  }
}
