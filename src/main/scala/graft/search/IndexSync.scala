package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reconcile a serving index against its source collection — the
  * "reindex delta" maintenance verb. Milvus keeps segments aligned by
  * construction (every insert/delete flows through the engine,
  * src/app.py:87 drops and recreates wholesale); on a lakehouse the
  * collection and its derived artifacts DRIFT whenever a delete,
  * rewrite, or append bypasses index maintenance — exactly the state
  * [[IndexAudit.coverageChecks]]' `missing`/`orphans` counters detect.
  * This operator repairs what the audit reports, without a rebuild:
  *
  *  - ORPHANS (artifact ids absent from the corpus — a collection
  *    delete/rewrite that never propagated) become [[Tombstones]]: a
  *    key append, masked by every serve path, folded by compaction.
  *  - MISSING rows (corpus ids absent from the artifact — an append
  *    that never hit the index) enter by [[IvfIndex.append]]'s
  *    frozen-centroid assignment.
  *
  * Both diffs are anti-joins against the artifact's id projection;
  * existing artifact data is never rewritten. After reconcile, a
  * full-probe serve equals exact search over the live corpus. */
object IndexSync {
  /** Returns (orphans_tombstoned, rows_appended). Idempotent: the
    * orphan diff runs against the artifact MINUS already-recorded
    * tombstones, so a second reconcile over the same drift repairs
    * nothing. Caveat (documented, detected by the version/coverage
    * audits): a key that was deleted and then RE-ADDED to the
    * collection still has its physical artifact row, so it is not
    * "missing" here — yet the old tombstone masks it at serve time;
    * fold tombstones ([[Tombstones.compact]]) before reconciling when
    * the collection re-uses keys. */
  def reconcileIvf(spark: SparkSession, corpus: DataFrame, idCol: String,
                   vecCol: String, model: IvfIndex.Model): (Long, Long) = {
    // mergeSchema like every other versioned-layout read (rebalance /
    // compactVersions / versionChecks): today's projection is id-only,
    // but a plain read of an upserted (__ver partial-schema) layout
    // infers a schema without __ver and would silently truncate if the
    // projection ever widens
    val artIds = spark.read.option("mergeSchema", "true")
      .parquet(IvfIndex.dataDir(model.indexDir))
      .select(col(idCol)).distinct()
    val orphans = Tombstones.mask(artIds, spark, model.indexDir, idCol)
      .join(corpus.select(col(idCol)), Seq(idCol), "left_anti")
    val nOrphans = orphans.count()
    if (nOrphans > 0) Tombstones.record(orphans, model.indexDir, idCol)
    val missing = corpus.select(col(idCol), col(vecCol))
      .join(artIds, Seq(idCol), "left_anti")
    val nMissing = missing.count()
    if (nMissing > 0) IvfIndex.append(missing, vecCol, model)
    (nOrphans, nMissing)
  }

  /** TTL → derived-index bridge (round 15): record the collection's
    * EXPIRED keys ([[graft.core.Collection.expiredKeys]] at `asOf`) as
    * [[Tombstones]] against a derived index dir, so every masked serve
    * (IVF / graph / sparse / BM25 — they all anti-join the same
    * tombstone table) stops returning expired rows WITHOUT waiting for
    * [[graft.core.Collection.reclaimExpired]] + a reconcile pass.
    * `keyCol` names the collection's key, `idCol` the artifact's
    * (often the same). Idempotent: only keys not already tombstoned
    * are recorded (anti-join against the existing tombstone table), so
    * a scheduled re-sync at the same `asOf` records nothing — returns
    * the NEWLY tombstoned key count. Pass an explicit `asOf` literal
    * for replayable pipelines, the fixture discipline; a later `asOf`
    * records only the newly-expired delta (expiry is monotone).
    *
    * Division of labor: this verb makes expiry VISIBLE in index serves
    * (a bounded key append, O(expired batch)); physical repayment
    * stays with reclaim (collection) + tombstone compaction / a
    * reconcile (index) — the same mask-now-fold-later split as every
    * delete here. */
  def syncTtlTombstones(spark: SparkSession,
                        coll: graft.core.Collection, keyCol: String,
                        asOf: org.apache.spark.sql.Column,
                        indexDir0: String,
                        idCol: String): Long = {
    // resolve the alias root ONCE: the idempotence anti-join must read
    // the SAME deletes dir the record below writes (record resolves
    // internally; an unresolved table read would see the root's)
    val indexDir = AliasedIndex.resolveDir(spark, indexDir0)
    val fresh = unsyncedExpired(spark, coll, keyCol, asOf, indexDir,
      idCol)
    val n = fresh.count()
    if (n > 0) Tombstones.record(fresh, indexDir, idCol)
    n
  }

  /** The collection's expired-at-`asOf` keys NOT yet tombstoned in the
    * (alias-resolved) index — what [[syncTtlTombstones]] would record;
    * shared with [[Maintenance.planTtlSync]]'s drift meter. */
  private[graft] def unsyncedExpired(spark: SparkSession,
                                     coll: graft.core.Collection,
                                     keyCol: String,
                                     asOf: org.apache.spark.sql.Column,
                                     indexDir: String,
                                     idCol: String)
      : org.apache.spark.sql.DataFrame =
    coll.expiredKeys(keyCol, asOf)
      .select(col(keyCol).cast("long").as(idCol)).distinct()
      .join(Tombstones.table(spark, indexDir, idCol), Seq(idCol),
        "left_anti")
}
