package graft

import graft.search.GraphAnn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Build + serving contracts of the graph-ANN family (see
  * [[graft.search.GraphAnn]]): degree bound, rebuild determinism,
  * exact-equivalence in the fully-connected degenerate case, and the
  * visited-budget guard. */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  // 24 deterministic dim-4 vectors in two well-separated blobs, so the
  // coarse quantizer has real structure to shard on
  private lazy val corpus: DataFrame = (0 until 24).map { i =>
    val blob = if (i % 2 == 0) 0.0f else 10.0f
    (i.toLong, Seq(blob + (i % 5) * 0.1f, blob + (i % 3) * 0.2f,
      blob - (i % 7) * 0.1f, blob))
  }.toDF("vec_id", "embedding")

  private val params = GraphAnn.Params(degree = 4, nlist = 2, overlap = 2)

  test("adjacency respects the declared degree bound") {
    val deg = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", params)
      .groupBy("src").count().agg(max("count")).collect()(0).getLong(0)
    assert(deg <= params.degree, s"max out-degree $deg > ${params.degree}")
  }

  test("rebuild on the same corpus is byte-identical") {
    // two EXPLICITLY separate builds (a single `def` evaluated twice
    // would degrade to x == x under a routine def→val cleanup)
    def build() = GraphAnn
      .buildAdjacency(corpus, "vec_id", "embedding", params)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(e => (e._1, e._2)).toSeq
    val first = build()
    val second = build()
    assert(first.nonEmpty && first == second)
  }

  test("entryPoints: <= nEntries distinct corpus points, deterministic") {
    def build() = GraphAnn
      .entryPoints(corpus, "vec_id", "embedding", nEntries = 4)
      .collect().map(_.getLong(0)).sorted.toSeq
    val first = build()
    val second = build()
    assert(first == second)
    assert(first.nonEmpty && first.size <= 4 && first.distinct == first)
    val ids = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(first.forall(ids.contains), "entries must be corpus points")
  }

  test("beamSearchMulti with the medoid as sole entry equals beamSearch") {
    import spark.implicits._
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", params)
    val entryId = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val q = corpus.where(col("vec_id") === 3).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val single = GraphAnn.beamSearch(adj, corpus, "vec_id", "embedding",
        q, entryId, k = 5, beamWidth = 3, rounds = 2, degree = 4)
      .as[(Long, Double)].collect().toSeq
    val entries = corpus.where(col("vec_id") === entryId)
      .select(col("vec_id").as("entry_id"),
        col("embedding").as("entry_vec"))
    val multi = GraphAnn.beamSearchMulti(adj, corpus, "vec_id",
        "embedding", q, entries, k = 5, beamWidth = 3, rounds = 2,
        degree = 4, nSeeds = 1)
      .as[(Long, Double)].collect().toSeq
    assert(single.nonEmpty && multi == single)
  }

  test("nlistForCorpus keeps shard size ~constant (linear candidate work)") {
    assert(GraphAnn.nlistForCorpus(24) == 2)        // floored
    assert(GraphAnn.nlistForCorpus(256000) == 1000) // 256k / 256
    // shard size n/nlist stays within the target across three decades
    Seq(4000L, 16000L, 64000L, 256000L, 1024000L).foreach { n =>
      val shard = n.toDouble / GraphAnn.nlistForCorpus(n)
      assert(shard <= 256.0 && shard > 64.0,
        s"n=$n: shard size $shard drifted off the 256 target")
    }
  }

  test("default Params auto-sizes nlist from the corpus") {
    // nlist=0 (default) must resolve via nlistForCorpus instead of a
    // fixed constant — the fixed-16 quadratic-onset defect
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding",
      GraphAnn.Params(degree = 4))
    val deg = adj.groupBy("src").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(deg <= 4)
    assert(adj.select("src").distinct().count() == 24)
  }

  test("medoid is a single deterministic entry point") {
    val m1 = GraphAnn.medoid(corpus, "vec_id", "embedding").collect()
    val m2 = GraphAnn.medoid(corpus, "vec_id", "embedding").collect()
    assert(m1.length == 1 && m1(0).getLong(0) == m2(0).getLong(0))
  }

  test("fully-connected degenerate case: beam search equals exact search") {
    // overlap = nlist ⇒ every node co-shards with every other; with
    // degree ≥ n the graph is complete, round 1 visits the whole corpus,
    // and the beam result must be EXACTLY the brute-force top-k
    val full = GraphAnn.Params(degree = 23, nlist = 2, overlap = 2)
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", full)
    val entry = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val query = Array(10.0f, 10.0f, 10.0f, 10.0f)
    val got = GraphAnn.beamSearch(adj, corpus, "vec_id", "embedding",
        query, entry, k = 5, beamWidth = 4, rounds = 3, degree = 23)
      .collect().map(_.getLong(0)).toSeq
    val exact = corpus
      .select(col("vec_id"), round(graft.functions.VectorFunctions.l2Sq(
        col("embedding"), typedlit(query.toSeq)), 4).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact, s"beam $got != exact $exact")
  }

  test("sequential appends equal a full rebuild (complete-graph case)") {
    // degree ≥ n and overlap = nlist ⇒ both the rebuild and the appends
    // produce the complete graph with identical rounded distances — the
    // deterministic case where append ≡ rebuild holds exactly
    val full = GraphAnn.Params(degree = 12, nlist = 2, overlap = 2)
    val base = corpus.where(col("vec_id") < 10)
    val adj0 = GraphAnn.buildAdjacency(base, "vec_id", "embedding", full)
    val entry = GraphAnn.medoid(base, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val r1 = GraphAnn.append(adj0, base, "vec_id", "embedding",
      corpus.where(col("vec_id") === 10), entry,
      degree = 12, beamWidth = 12, rounds = 3)
    val c11 = corpus.where(col("vec_id") < 11)
    val r2 = GraphAnn.append(r1.adjacency, c11, "vec_id", "embedding",
      corpus.where(col("vec_id") === 11), entry,
      degree = 12, beamWidth = 12, rounds = 3)
    def edges(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(e => (e._1, e._2)).toSeq
    val rebuilt = GraphAnn.buildAdjacency(
      corpus.where(col("vec_id") < 12), "vec_id", "embedding", full)
    assert(edges(r2.adjacency) == edges(rebuilt))
  }

  test("append keeps the degree bound and touches only affected srcs") {
    val adj0 = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", params)
    val entry = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val batch = Seq(
      (100L, Seq(0.05f, 0.1f, -0.05f, 0.0f)),
      (101L, Seq(10.05f, 10.1f, 9.95f, 10.0f)))
      .toDF("vec_id", "embedding")
    val r = GraphAnn.append(adj0, corpus, "vec_id", "embedding", batch,
      entry, degree = params.degree, beamWidth = 4, rounds = 3)
    assert(r.links.count() > 0)
    val maxDeg = r.adjacency.groupBy("src").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxDeg <= params.degree, s"post-append degree $maxDeg")
    // untouched srcs' rows pass through byte-identically
    val affected = r.links.select(col("src")).unionByName(
      r.links.select(col("dst").as("src"))).distinct()
      .collect().map(_.getLong(0)).toSet
    val before = adj0.collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2)))
      .filterNot(e => affected.contains(e._1)).sortBy(e => (e._1, e._2))
    val after = r.adjacency.collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2)))
      .filterNot(e => affected.contains(e._1)).sortBy(e => (e._1, e._2))
    assert(before.toSeq == after.toSeq)
  }

  test("bulk beam search equals the per-query walk") {
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", params)
    val entry = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val queries = corpus.where(col("vec_id").isin(1L, 6L, 17L))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val bulk = GraphAnn.bulkBeamSearch(adj, corpus, "vec_id", "embedding",
        queries, "qid", "qv", entry, k = 5, beamWidth = 4, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(identity))
      .toMap
    Seq(1L, 6L, 17L).foreach { qid =>
      val qv = corpus.where(col("vec_id") === qid)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val single = GraphAnn.beamSearch(adj, corpus, "vec_id", "embedding",
          qv, entry, k = 5, beamWidth = 4, rounds = 3,
          degree = params.degree)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(identity)
      assert(bulk(qid).toSeq == single.toSeq, s"qid=$qid bulk != single")
    }
  }

  test("MIPS walk: complete graph serves exact IP top-k, ip is exact") {
    import graft.functions.VectorFunctions
    // degree ≥ n ⇒ complete graph: one round from any entry visits the
    // whole corpus, so the MIPS walk's result must equal EXACT inner-
    // product top-k with the (ip desc, id asc) ordering it advertises
    val full = GraphAnn.Params(degree = 24, nlist = 2, overlap = 2)
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", full)
    val entryId = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val q = corpus.where(col("vec_id") === 3).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val got = GraphAnn.beamSearchMips(adj, corpus, "vec_id", "embedding",
        q, entryId, k = 5, beamWidth = 1, rounds = 1, degree = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = corpus.select(col("vec_id"),
        round(VectorFunctions.dot(col("embedding"),
          typedlit(q.toSeq)), 4).as("ip"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, ip) => (-ip, id) }.take(5).toSeq
    assert(got == exact)
  }

  test("lsh build: degree bound, rebuild determinism, servable adjacency") {
    // the training-free huge-corpus tier must honor the same contracts
    // as the trained-quantizer build: degree cap, byte-identical
    // rebuilds (md5-derived planes), and an adjacency the beam walk can
    // serve unchanged
    def build() = GraphAnn.buildAdjacencyLsh(corpus, "vec_id", "embedding",
      dim = 4, degree = 4)
    val adj = build()
    val deg = adj.groupBy("src").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(deg <= 4, s"lsh-build max out-degree $deg > 4")
    def edges(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(e => (e._1, e._2)).toSeq
    val first = edges(adj)
    assert(first.nonEmpty && first == edges(build()))
    val entry = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val got = GraphAnn.beamSearch(adj, corpus, "vec_id", "embedding",
      Array(10.0f, 10.0f, 10.0f, 10.0f), entry, k = 3, beamWidth = 4,
      rounds = 3, degree = 4)
    assert(got.count() >= 1)
  }

  test("filtered beam: result honors the predicate, walk stays label-blind") {
    // complete graph ⇒ visited = whole corpus after round 1, so the
    // filtered result must be EXACTLY the brute-force filtered top-k
    val full = GraphAnn.Params(degree = 23, nlist = 2, overlap = 2)
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", full)
    val entry = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val labeled = corpus.withColumn("label",
      (col("vec_id") % 3).cast("int"))
    val query = Array(10.0f, 10.0f, 10.0f, 10.0f)
    val got = GraphAnn.filteredBeamSearch(adj, labeled, "vec_id",
        "embedding", query, entry, predicate = col("label") === 1,
        k = 5, beamWidth = 4, rounds = 3, degree = 23)
      .collect().map(_.getLong(0)).toSeq
    val exact = labeled.where(col("label") === 1)
      .select(col("vec_id"), round(graft.functions.VectorFunctions.l2Sq(
        col("embedding"), typedlit(query.toSeq)), 4).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact, s"filtered beam $got != filtered exact $exact")
    assert(got.forall(_ % 3 == 1))
  }

  test("filteredBeamSearchIds: id-set path row-identical to the " +
      "predicate path on the same budget") {
    val full = GraphAnn.Params(degree = 23, nlist = 2, overlap = 2)
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", full)
    val entry = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val labeled = corpus.withColumn("label",
      (col("vec_id") % 3).cast("int"))
    val query = Array(10.0f, 10.0f, 10.0f, 10.0f)
    // the id set a scalar-index lookup would return for label = 1
    val allowed = labeled.where(col("label") === 1).select("vec_id")
    val byIds = GraphAnn.filteredBeamSearchIds(adj, labeled, "vec_id",
        "embedding", query, entry, allowed, k = 5, beamWidth = 4,
        rounds = 3, degree = 23)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val byPred = GraphAnn.filteredBeamSearch(adj, labeled, "vec_id",
        "embedding", query, entry, predicate = col("label") === 1,
        k = 5, beamWidth = 4, rounds = 3, degree = 23)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(byIds == byPred && byIds.nonEmpty,
      s"id-set $byIds != predicate $byPred")
    assert(byIds.forall(_._1 % 3 == 1))
  }

  test("filtered beam with an always-true predicate equals beamSearch") {
    val full = GraphAnn.Params(degree = 23, nlist = 2, overlap = 2)
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", full)
    val entry = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val query = Array(0.5f, 0.5f, 0.5f, 0.5f)
    val a = GraphAnn.filteredBeamSearch(adj, corpus, "vec_id", "embedding",
        query, entry, predicate = lit(true), k = 5,
        beamWidth = 4, rounds = 3, degree = 23)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = GraphAnn.beamSearch(adj, corpus, "vec_id", "embedding",
        query, entry, k = 5, beamWidth = 4, rounds = 3, degree = 23)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("alpha-RNG prune: diversity edges bridge what capped-kNN cliques " +
      "cannot, recall strictly improves at equal degree") {
    // ladder of 10 micro-clusters x 9 near-duplicate points along a
    // line: every point's 8 nearest are its siblings, so the capped-kNN
    // build at degree 8 spends ALL slots inside the clique and the
    // graph never bridges clusters; the alpha-prune dominates siblings
    // (a near-dupe covers a near-dupe) and keeps the adjacent-cluster
    // survivors instead, so the same degree budget buys connectivity.
    val pts = for (c <- 0 until 10; j <- 0 until 9) yield {
      val base = 3.0f * c
      ((c * 9 + j).toLong,
        Array(base + j * 0.001f, j * 0.001f, 0.0f, 0.0f))
    }
    val rows = pts.toDF("vec_id", "embedding")
    val p = GraphAnn.Params(degree = 8, nlist = 2, overlap = 2)
    val plain = GraphAnn.buildAdjacency(rows, "vec_id", "embedding", p)
    val pruned = GraphAnn.buildAdjacencyPruned(rows, "vec_id",
      "embedding", p, alpha = 1.2, candCap = 16)
    // both honor the degree cap
    for (adj <- Seq(plain, pruned)) {
      val deg = adj.groupBy("src").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(deg <= 8)
    }
    val entry = GraphAnn.medoid(rows, "vec_id", "embedding")
      .collect()(0).getLong(0)
    // query at the far end of the ladder
    val q = Array(27.0f, 0.0f, 0.0f, 0.0f)
    val exact = rows.select(col("vec_id"),
        round(graft.functions.VectorFunctions.l2Sq(col("embedding"),
          typedlit(q.toSeq)), 4).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSet
    def recallOf(adj: org.apache.spark.sql.DataFrame): Double = {
      val got = GraphAnn.beamSearch(adj, rows, "vec_id", "embedding", q,
          entry, k = 5, beamWidth = 4, rounds = 10, degree = 8)
        .collect().map(_.getLong(0)).toSet
      got.intersect(exact).size / 5.0
    }
    val (rPlain, rPruned) = (recallOf(plain), recallOf(pruned))
    assert(rPruned > rPlain,
      s"prune must bridge the ladder: pruned=$rPruned plain=$rPlain")
    assert(rPruned == 1.0, s"pruned walk should reach the far end: $rPruned")
  }

  test("beamSearchPq: exact-rerank contract, determinism, walk coverage") {
    import graft.search.Pq
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", params)
    val entry = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft_pqwalk_spec").toString
    val model = Pq.build(corpus, "embedding", "vec_id", pqDir,
      m = 2, kCodes = 8, dim = 4)
    val codes = spark.read.parquet(Pq.codesDir(pqDir))
    val q = corpus.where(col("vec_id") === 3).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    def run() = GraphAnn.beamSearchPq(adj, codes, corpus, "vec_id",
        "embedding", q, model, entry, k = 5, beamWidth = 4, rounds = 3,
        degree = params.degree)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
    val first = run()
    val second = run()
    assert(first == second, "PQ-scored walk must be deterministic")
    assert(first.size == 5)
    // the reported `distance` is EXACT (rerank contract): recompute it
    // independently of the walk for every returned id
    val exact = corpus.collect().map { r =>
      val v = r.getSeq[Float](1)
      val d = v.zip(q).map { case (a, b) =>
        (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
      r.getLong(0) -> math.rint(d * 1e4) / 1e4
    }.toMap
    first.foreach { case (id, _, d) =>
      assert(d == exact(id), s"rerank distance of $id drifted: $d")
    }
    // ranked by exact distance, id tie-break — not by the ADC score
    assert(first.map { case (id, _, d) => (d, id) } ==
      first.map { case (id, _, d) => (d, id) }.sorted)
  }

  test("sampled selectivity estimate: exact under the cap, bounded " +
      "error and deterministic over it") {
    import spark.implicits._
    val n = 4000L
    val df = (0L until n).map(i =>
        (i, Seq((i % 977).toFloat, (i % 31).toFloat), i % 10))
      .toDF("vec_id", "embedding", "label")
    val pred = col("label") < 3 // true selectivity 0.3
    val exactSel = GraphAnn.estimateSelectivity(df, pred)
    assert(math.abs(exactSel - 0.3) < 1e-9)
    // under the cap: sampled ≡ exact (the TrainSample contract —
    // small-fixture oracles stay byte-identical)
    assert(GraphAnn.estimateSelectivitySampled(df, pred,
      col("embedding"), n, cap = 8192) == exactSel)
    // over the cap: order-of-magnitude accuracy is the contract (the
    // derived beam width is a clamp); this fixture's hash sample lands
    // well inside ±0.1 absolute, and the estimate is a pure function
    // of the values — two calls agree exactly
    val s1 = GraphAnn.estimateSelectivitySampled(df, pred,
      col("embedding"), n, cap = 512)
    val s2 = GraphAnn.estimateSelectivitySampled(df, pred,
      col("embedding"), n, cap = 512)
    assert(s1 == s2, "hash sample must be deterministic")
    assert(math.abs(s1 - exactSel) <= 0.1,
      s"sampled estimate drifted past the bound: $s1 vs $exactSel")
  }

  test("visited-budget guard rejects an over-degree adjacency") {
    // an adjacency with true degree 23 walked under a declared degree of
    // 1 must trip the budget require instead of silently ballooning
    val full = GraphAnn.Params(degree = 23, nlist = 2, overlap = 2)
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", full)
    val ex = intercept[IllegalArgumentException] {
      GraphAnn.beamSearch(adj, corpus, "vec_id", "embedding",
        Array(0.0f, 0.0f, 0.0f, 0.0f), entryId = 0L,
        k = 5, beamWidth = 1, rounds = 2, degree = 1)
    }
    assert(ex.getMessage.contains("budget"))
  }

  test("layered walk: the sampled upper layer crosses the corpus in " +
      "fewer rounds than the flat walk, sample is deterministic") {
    import graft.search.GraphAnn
    // a CHAIN corpus — 16 rungs of 6 nodes along x, 3.0 apart: every
    // node's 8 base-graph neighbors span at most the adjacent rung, so
    // a flat medoid-seeded walk advances ~1 rung per round and cannot
    // reach the far end within the budget. The ~30% upper sample has
    // ~2 nodes per rung, so ITS 8-degree adjacency spans several rungs
    // per hop — the HNSW upper-layer point: a sparser layer's edges
    // are longer relative to scale, so the zoom crosses the corpus in
    // fewer rounds, and the base walk only refines locally.
    val r = new scala.util.Random(7)
    val corpus = (0 until 96).map { i =>
      val rung = i / 6
      (i.toLong, Array(
        (rung * 3.0 + r.nextGaussian() * 0.2).toFloat,
        (r.nextGaussian() * 0.2).toFloat,
        (r.nextGaussian() * 0.2).toFloat,
        (r.nextGaussian() * 0.2).toFloat))
    }.toDF("vec_id", "embedding")
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding")
    val sample = GraphAnn.upperSample(corpus, "vec_id", ppm = 300000)
    // deterministic membership: same cut twice
    assert(sample.select("vec_id").as[Long].collect().sorted.toSeq ==
      GraphAnn.upperSample(corpus, "vec_id", ppm = 300000)
        .select("vec_id").as[Long].collect().sorted.toSeq)
    val uadj = GraphAnn.buildAdjacency(sample, "vec_id", "embedding")
    // flat serving seeds at the CORPUS medoid; the upper walk at the
    // SAMPLE's own medoid (a sample member — it must source upper
    // edges). Both sit mid-chain.
    val fent = GraphAnn.medoid(corpus, "vec_id", "embedding")
    val uent = GraphAnn.medoid(sample, "vec_id", "embedding")
    val query = Array(45.0f, 0f, 0f, 0f) // the LAST rung's center
    val exact = corpus.withColumn("d",
        graft.functions.VectorFunctions.l2Sq(col("embedding"),
          typedlit(query.toSeq)))
      .orderBy(col("d").asc, col("vec_id").asc)
      .select("vec_id").as[Long].head(5).toSet
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").as[Long].collect().toSet
    val flat = ids(GraphAnn.beamSearchMulti(adj, corpus, "vec_id",
      "embedding", query, fent, k = 5, beamWidth = 4, rounds = 4,
      degree = 8, nSeeds = 1))
    val layered = ids(GraphAnn.layeredSearch(uadj, uent, adj, corpus,
      "vec_id", "embedding", query, k = 5, beamWidth = 4,
      upperRounds = 4, rounds = 4, degree = 8, nSeeds = 2))
    assert(flat.intersect(exact).isEmpty,
      s"fixture broken: the flat walk crossed the chain in 4 rounds " +
        s"($flat)")
    assert(layered == exact,
      s"layered walk must reach the far rung: $layered vs $exact")
  }
}
