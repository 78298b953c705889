package graft

import graft.ingest.{Loaders, Preprocess}
import graft.text.Keywords
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("preprocess: strips disallowed chars, keeps CJK + listed punct") {
    // reference src/app.py:196-197
    val df = Seq((1L, "数据库@#$系统  概论! <b>ok</b>")).toDF("id", "text")
    val got = Preprocess(df, "text").select("text_clean").as[String].head()
    assert(got == "数据库系统 概论! bokb")
  }

  test("preprocess: min-length 10 boundary (src/app.py:199-201)") {
    val df = Seq((1L, "123456789"), (2L, "1234567890")).toDF("id", "text")
    val ids = Preprocess(df, "text").select("id").as[Long].collect().toSeq
    assert(ids == Seq(2L))
  }

  test("preprocess is idempotent") {
    val df = Seq((1L, "  a   b@@@c  数据 ,. xyz  ")).toDF("id", "text")
    val once = Preprocess.clean(col("text"))
    val r = df.select(once.as("c1"))
      .select(Preprocess.clean(col("c1")).as("c2"), col("c1")).head()
    assert(r.getString(0) == r.getString(1))
  }

  test("keywords: stopwords removed, duplicates kept, stable length-desc") {
    // reference src/app.py:332-340: findall order, stable sort by len desc
    val df = Seq((1L, "abc 的 xy abcdef abc 数据库系统 wxyz")).toDF("id", "text")
    val kws = Keywords.extract(df, "id", "text", k = 10)
      .orderBy(col("kw_rank")).select("keyword").as[String].collect().toSeq
    // tokens: abc, abcdef, abc, 数据库系统, wxyz ("的" stopped, "xy" too
    // short for [a-zA-Z]{3,}); sorted: 数据库系统(5 CJK? len 5)... lengths:
    // abc=3, abcdef=6, abc=3, 数据库系统=5, wxyz=4 → 6,5,4,3,3 stable
    assert(kws == Seq("abcdef", "数据库系统", "wxyz", "abc", "abc"))
  }

  test("chunks: strictly-greater-5 filter and first-2 cap (src/app.py:322-326)") {
    val df = Seq((1L, "short, exactly, longer chunk one. second long chunk; third long chunk"))
      .toDF("id", "text")
    val cs = Keywords.chunks(df, "id", "text")
      .orderBy(col("chunk_rank")).select("chunk").as[String].collect().toSeq
    // "short"(5) dropped (strictly > 5), "exactly"(7) kept,
    // "longer chunk one" kept, cap 2
    assert(cs == Seq("exactly", "longer chunk one"))
  }

  test("detectColumns: name heuristic then first-two fallback (src/app.py:163-175)") {
    assert(Loaders.detectColumns(Seq("my_chapter", "the_content")) ==
      ("my_chapter", "the_content"))
    assert(Loaders.detectColumns(Seq("章节名", "内容列")) == ("章节名", "内容列"))
    assert(Loaders.detectColumns(Seq("a", "b", "c")) == ("a", "b"))
    assert(Loaders.detectColumns(Seq("x", "knowledge_text")) ==
      ("x", "knowledge_text"))
  }

  test("parseChapterBlocks: markers open blocks, content joined by space") {
    val lines = Seq(
      (0L, "preamble dropped"),
      (1L, "第一章 概论"),
      (2L, "first line"),
      (3L, "  "),
      (4L, "second line"),
      (5L, "第二章 关系"),
      (6L, "third"),
      (7L, "包含章节的行"),   // contains 章节 → marker too
      (8L, "tail")
    ).toDF("line_no", "line")
    val blocks = Loaders.parseChapterBlocks(lines)
      .orderBy("block_id")
      .select("chapter", "content").as[(String, String)].collect().toSeq
    assert(blocks == Seq(
      ("第一章 概论", "first line second line"),
      ("第二章 关系", "third"),
      ("包含章节的行", "tail")))
  }

  test("parseChapterBlocks per-doc partitioning matches the global form per doc") {
    val lines = Seq(
      (7L, 0L, "第一章 甲"), (7L, 1L, "a1"), (7L, 2L, "a2"),
      (9L, 0L, "第一章 乙"), (9L, 1L, "b1")
    ).toDF("doc", "line_no", "line")
    val blocks = Loaders.parseChapterBlocks(lines, Some("doc"))
      .orderBy("doc", "block_id")
      .select("doc", "chapter", "content")
      .as[(Long, String, String)].collect().toSeq
    assert(blocks == Seq((7L, "第一章 甲", "a1 a2"), (9L, "第一章 乙", "b1")))
  }

  test("loadKnowledgeCsv falls back to example rows on missing path") {
    val df = Loaders.loadKnowledgeCsv(spark, "/tmp/definitely_missing_xyz.csv")
    assert(df.count() == Loaders.ExampleRows.size)
    assert(df.columns.toSeq == Seq("chapter", "content"))
  }

  test("vocabulary: occurrences vs doc frequency; empty tokens dropped") {
    import graft.text.TextAnalysis
    val df = Seq((1L, "a b a"), (2L, "a c")).toDF("id", "text")
    val v = TextAnalysis.vocabulary(df, "id", "text")
      .as[(String, Long, Long)].collect()
      .map { case (t, occ, docf) => t -> ((occ, docf)) }.toMap
    assert(v == Map("a" -> ((3L, 2L)), "b" -> ((1L, 1L)), "c" -> ((1L, 1L))))
  }

  test("tfIdfTopTerms: corpus-wide terms score 0; rarest term wins") {
    import graft.text.TextAnalysis
    // "x" in every doc -> idf = ln(1) = 0; "q" only in doc 1 wins there
    val df = Seq((1L, "x x q"), (2L, "x y"), (3L, "x z")).toDF("id", "text")
    val top = TextAnalysis.tfIdfTopTerms(df, "id", "text")
      .as[(Long, String, Double)].collect()
      .map { case (id, t, s) => id -> ((t, s)) }.toMap
    assert(top(1L)._1 == "q" && top(1L)._2 > 0)
    assert(top(2L)._1 == "y" && top(3L)._1 == "z")
  }

  test("hash split: deterministic, partitions the corpus, roughly 80/10/10") {
    import graft.curate.Sampling
    val df = (0L until 1000L).toDF("id")
    val counts = Sampling.withSplit(df, "id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 1000L)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 40 && counts("val") < 180)
    assert(counts("test") > 40 && counts("test") < 180)
    // deterministic: same assignment on recompute
    val a = Sampling.withSplit(df, "id").as[(Long, String)].collect().toMap
    val b = Sampling.withSplit(df, "id").as[(Long, String)].collect().toMap
    assert(a == b)
    // subsample is a subset of the full corpus with the same hash
    val s = Sampling.sampleByHash(df, "id", 10).as[Long].collect().toSet
    assert(s.forall(a.contains) && s.size > 30 && s.size < 200)
  }

  test("packByTokenBudget: batches respect the budget per lane, in id order") {
    import graft.curate.Sampling
    // 40-char docs -> 10 est tokens each; budget 25 -> 3 docs per batch
    // (batch opens when the PRECEDING cumulative crosses the budget)
    val df = (0L until 60L).map(i => (i, "x" * 40)).toDF("id", "text")
    val packed = Sampling.packByTokenBudget(df, "id", "text",
        budgetTokens = 25L, nShards = 2)
      .select("id", "split", "shard", "batch_id")
      .as[(Long, String, Long, Long)].collect()
    // within every (split, shard) lane, batch ids start at 0, never skip,
    // and hold at most 3 docs (ceil over: first doc at cum_before 0, 10, 20)
    packed.groupBy(p => (p._2, p._3)).foreach { case (_, lane) =>
      val batches = lane.sortBy(_._1).map(_._4)
      assert(batches.head == 0L)
      assert(batches.toSet == (0L to batches.max).toSet)
      batches.groupBy(identity).values.foreach(g => assert(g.length <= 3))
    }
  }

  test("temperatureMixSample: √-quota flattens skew, small sources intact") {
    import graft.curate.Sampling
    // skewed corpus: source A 400 docs, B 16, C 3
    val df = ((0L until 400L).map(i => (i, "A")) ++
      (400L until 416L).map(i => (i, "B")) ++
      (416L until 419L).map(i => (i, "C"))).toDF("id", "src")
    val kept = Sampling.temperatureMixSample(df, "id", "src", multiplier = 4)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept("A") == 80L, s"A: ceil(4*sqrt(400)) = 80, got ${kept("A")}")
    assert(kept("B") == 16L, "B under quota (4*sqrt(16)=16): intact")
    assert(kept("C") == 3L, "C far under quota: intact")
    // deterministic: the draw is a pure function of ids
    val again = Sampling.temperatureMixSample(df, "id", "src", multiplier = 4)
      .select("id").as[Long].collect().toSet
    val first = Sampling.temperatureMixSample(df, "id", "src", multiplier = 4)
      .select("id").as[Long].collect().toSet
    assert(again == first)
  }

  test("shuffleIntoShards: coordinates permute rows; salt changes order") {
    import graft.curate.Sampling
    val df = (0L until 500L).toDF("id")
    val r = Sampling.shuffleIntoShards(df, "id", nShards = 8)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(r.length == 500)
    assert(r.map(_._2).toSet.subsetOf((0L until 8L).toSet))
    // (shard, pos) is a proper coordinate: unique, dense per shard from 1
    assert(r.map(x => (x._2, x._3)).distinct.length == 500)
    r.groupBy(_._2).values.foreach { sh =>
      assert(sh.map(_._3).sorted.toSeq == (1L to sh.length).toSeq)
    }
    // a different salt yields a different permutation of the same rows
    val e1 = Sampling.shuffleIntoShards(df, "id", 8, salt = "epoch1")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(e1.map(_._1).toSet == r.map(_._1).toSet)
    assert(e1.sortBy(_._1).toSeq != r.sortBy(_._1).toSeq)
  }

  test("count-min: never underestimates, exact when width ≫ vocab") {
    import graft.text.CountMin
    val toks = (Seq.fill(50)("hot") ++ Seq.fill(7)("warm") ++
      (0 until 40).map(i => s"cold$i")).toDF("tok")
    val exact = toks.groupBy("tok").count()
    // wide sketch: 42 distinct tokens over 4×4096 counters → collisions
    // essentially impossible → estimate ≡ exact
    val wide = CountMin.counterMatrix(toks, "tok", depth = 4, width = 4096)
    val estWide = CountMin.estimate(exact, "tok", wide, 4, 4096)
      .join(exact, Seq("tok"))
      .select("tok", "n_cms", "count").as[(String, Long, Long)].collect()
    assert(estWide.forall { case (_, cms, ex) => cms == ex },
      s"wide sketch must be exact: ${estWide.filter(p => p._2 != p._3).toSeq}")
    // narrow sketch: width 4 forces collisions → still NEVER under
    val narrow = CountMin.counterMatrix(toks, "tok", depth = 2, width = 4)
    val estNarrow = CountMin.estimate(exact, "tok", narrow, 2, 4)
      .join(exact, Seq("tok"))
      .select("tok", "n_cms", "count").as[(String, Long, Long)].collect()
    assert(estNarrow.forall { case (_, cms, ex) => cms >= ex },
      "count-min must never underestimate")
    assert(estNarrow.exists { case (_, cms, ex) => cms > ex },
      "width 4 over 42 tokens must collide somewhere")
    // absent-item point query: an item hitting any untouched bucket must
    // min() that counter AS ZERO (left-join semantics), not min() over
    // only the nonzero counters — and an item whose buckets are all
    // untouched reports 0 rather than vanishing. Wide sketch ⇒ a never-
    // seen token almost surely hits at least one empty bucket per row.
    val absent = Seq("never_seen_token_xyz").toDF("tok")
    val estAbsent = CountMin.estimate(absent, "tok", wide, 4, 4096)
      .as[(String, Long)].collect()
    assert(estAbsent.toSeq == Seq(("never_seen_token_xyz", 0L)),
      s"absent item must report 0, got ${estAbsent.toSeq}")
  }

  test("repetition: dup fractions and modal-token dominance, pinned") {
    import graft.text.Repetition
    val df = Seq(
      (1L, "a a a a"),     // 2-grams: 3 total, 1 distinct; 3-grams: 2/1
      (2L, "a b c d"),     // no repetition at all
      (3L, "x"),           // too short for any n-gram -> fracs 0
      (4L, "a b a b a")    // 2-grams: 4 total {a b, b a} -> dup 0.5
    ).toDF("doc_id", "text")
    val r = Repetition.stats(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_tokens", "dup_2gram_frac", "dup_3gram_frac",
        "top_token_frac", "keep")
      .collect()
    assert(r(0).getDouble(1) === 0.6667)          // round(1 - 1/3, 4)
    assert(r(0).getDouble(2) === 0.5)
    assert(r(0).getDouble(3) === 1.0)
    assert(!r(0).getBoolean(4))
    assert(r(1).getDouble(1) === 0.0 && r(1).getBoolean(4) === false)
    // doc 2 fails only on top_token_frac (each token 1/4 = 0.25 > 0.10)
    assert(r(1).getDouble(3) === 0.25)
    assert(r(2).getLong(0) === 1L)
    assert(r(2).getDouble(1) === 0.0 && r(2).getDouble(2) === 0.0)
    assert(r(2).getDouble(3) === 1.0)             // modal token is all of it
    assert(r(3).getDouble(1) === 0.5)
    assert(r(3).getDouble(3) === 0.6)             // 'a' 3 of 5
  }

  test("bpe learn: multiset argmax, two-pass merge, prior-merge exclusion") {
    import graft.text.BpeLearn
    // words: aaab aab -> pairs {a a:3, a b:2}; after merging 'a a':
    // ' aa a b ' / ' aa b ' -> remaining pairs all count 1, and the
    // lexicographically smallest ('a b' < 'aa a' < 'aa b') wins round 2
    val df = Seq((1L, "aaab aab")).toDF("doc_id", "text")
    val r = BpeLearn.learn(df, "text", nMerges = 2).collect()
    assert(r(0).getString(1) === "a a" && r(0).getString(2) === "aa")
    assert(r(0).getLong(3) === 3L) // multiset count, not distinct-per-word
    assert(r(1).getString(1) === "a b" && r(1).getLong(3) === 1L)
  }

  test("bpe batched: equals sequential when the top pairs are disjoint") {
    import graft.text.BpeLearn
    // frequent pairs 'a b' (x3), 'c d' (x2), 'e f' (x1) share no
    // symbols, so one batched scan must learn exactly the sequential
    // 3-merge table (rank order included)
    val df = Seq((1L, "ab ab ab cd cd ef")).toDF("doc_id", "text")
    def table(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq
    assert(table(BpeLearn.learnBatched(df, "text", nMerges = 3, batch = 3))
      === table(BpeLearn.learn(df, "text", nMerges = 3)))
  }

  test("bpe batched: a conflicting pair defers to the next scan") {
    import graft.text.BpeLearn
    // 'abc': pairs 'a b' and 'b c' tie at 2 and share 'b' — scan 1 may
    // only keep 'a b' (rank-1 by pair asc); scan 2 then counts the
    // POST-merge corpus, where 'ab c' is the top pair — which is
    // exactly what the sequential learner does one merge at a time
    val df = Seq((1L, "abc abc")).toDF("doc_id", "text")
    def table(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq
    val batched = table(BpeLearn.learnBatched(df, "text", nMerges = 2, batch = 2))
    assert(batched.map(_._2) === Seq("a b", "ab c"),
      s"conflicting pair was not deferred: $batched")
    assert(batched === table(BpeLearn.learn(df, "text", nMerges = 2)))
  }

  test("cdc chunks: boundaries survive a prefix edit (shift tolerance)") {
    import graft.text.CdcChunks
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight while stars shine"
    val df = Seq((1L, base), (2L, "EDITED PREFIX " + base))
      .toDF("doc_id", "text")
    val out = CdcChunks.chunks(df, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(3)).toSet).toMap
    // content-defined boundaries realign after the edit: all but the
    // first chunk(s) of the edited doc reappear verbatim
    val shared = out(1L).intersect(out(2L))
    assert(out(1L).size >= 4, s"corpus string too short: ${out(1L).size} chunks")
    assert(shared.size >= out(1L).size - 2,
      s"expected near-total chunk reuse, got ${shared.size}/${out(1L).size}")
    // and a FIXED-size chunker would not: verify the edit actually
    // shifted the text (first chunk differs)
    assert(out(1L) != out(2L))
  }

  test("cdc chunks: kernel counts code points, not UTF-16 units") {
    import graft.text.CdcChunks
    // 𝄞 (U+1D11E) and 🎵 are supplementary-plane (2 UTF-16 units, 1 code
    // point); the oracle dialect counts code points, so the kernel must
    // too. Reference = the HOF formulation over Spark substr (code-point
    // based like DuckDB substr), computed inline.
    val text = "a𝄞b🎵c the quick brown fox jumps over the lazy dog again " +
      "and again until chunks form 𝄞𝄞🎵 end of the test string here"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val kernel = CdcChunks.chunks(df, "doc_id", "text")
      .orderBy("chunk_no")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val w = CdcChunks.Window
    val hof = df.select(col("doc_id"),
        filter(sequence(lit(w), length(col("text"))), i =>
          md5(col("text").substr(i - (w - 1), lit(w))).substr(1, 1) === "0")
          .as("bounds"), length(col("text")).as("L"))
      .select(col("doc_id"),
        when(try_element_at(col("bounds"), lit(-1)) === col("L"), col("bounds"))
          .otherwise(concat(col("bounds"), array(col("L")))).as("bs"))
      .select(col("doc_id"), col("bs"))
      .collect().head.getSeq[Int](1)
    // same boundaries -> same chunk count and lengths
    assert(kernel.map(_._2).sum === hof.last.toLong,
      "total code points disagree")
    assert(kernel.length === hof.length, s"kernel=$kernel bounds=$hof")
    // and the total length is the code-point count, not String.length
    assert(hof.last === text.codePointCount(0, text.length))
    assert(text.codePointCount(0, text.length) < text.length)
  }

  test("unigram logprob: corpus distribution, pinned tiny-corpus values") {
    import graft.text.LangModel
    // counts: a=2 b=2 c=1, N=5
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = LangModel.unigramLogProb(df, "doc_id", "text").orderBy("doc_id")
      .collect()
    assert(r(0).getDouble(1) === -0.9163) // ln(2/5), every token p=0.4
    assert(r(0).getLong(2) === 3L)
    assert(r(1).getDouble(1) === -1.2629) // (ln .4 + ln .2)/2
    assert(r(1).getLong(2) === 2L)
  }

  test("pii scrub: sequential URL->email->phone, no double counting") {
    import graft.curate.Pii
    val df = Seq(
      // email inside a URL is consumed by the URL pass, not counted twice
      (1L, "see https://x.com/a?mail=bob@x.com and write bob@x.co or 555-1234"),
      (2L, "digits 555-12345 do not phone-match; 555-0042 does"),
      (3L, "nothing sensitive here")
    ).toDF("id", "text")
    val r = Pii.scrub(df, "text").orderBy("id")
      .select("n_urls", "n_emails", "n_phones", "text_redacted").collect()
    assert(r(0).getLong(0) === 1L && r(0).getLong(1) === 1L
      && r(0).getLong(2) === 1L)
    assert(r(0).getString(3) === "see <URL> and write <EMAIL> or <PHONE>")
    assert(r(1).getLong(2) === 1L)                // \b rejects 5-digit tail
    assert(r(1).getString(3) === "digits 555-12345 do not phone-match; <PHONE> does")
    assert(r(2).getLong(0) === 0L && r(2).getLong(1) === 0L
      && r(2).getLong(2) === 0L)
    assert(r(2).getString(3) === "nothing sensitive here")
  }

  test("char entropy: 0 bits for one repeated char, 1 bit for a fair pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "aaaaaaaa"), (2L, "abababab"), (3L, "abcd"))
      .toDF("doc_id", "text")
    val fn = Queries.all("char_entropy")
    // replicate the registry expression over a local frame via the same
    // code path: write a scratch parquet dir shaped like the fixture
    val dir = "/tmp/graft_test_entropy"
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = fn(spark, dir).select("doc_id", "entropy_bits")
      .as[(Long, Double)].collect().toMap
    assert(r(1L) == 0.0)   // single symbol: no information
    assert(r(2L) == 1.0)   // two symbols, equal counts: exactly 1 bit
    assert(r(3L) == 2.0)   // four equally likely symbols: 2 bits
  }

  test("overlap chunker: stride-15 windows of 20, short doc = one chunk") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val doc35 = (1 to 35).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc35), (2L, "just three tokens"))
      .toDF("doc_id", "text")
    val dir = "/tmp/graft_test_overlap"
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.all("chunk_overlap_split")(spark, dir)
      .select("doc_id", "chunk_idx", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    // 35 tokens: windows at 0 (20 toks), 15 (20 toks), 30 (5 toks) —
    // neighbours share 5 tokens; 3-token doc: one window of 3
    assert(r.filter(_._1 == 1L) == Seq((1L, 0L, 20L), (1L, 1L, 20L),
      (1L, 2L, 5L)))
    assert(r.filter(_._1 == 2L) == Seq((2L, 0L, 3L)))
  }

  test("nfc normalize: composes decomposed forms, fixes idempotently") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.nfcNormalize
    val decomposed = "cafe\u0301 A\u030a" // e+acute, A+ring
    val composed = "caf\u00e9 \u00c5"     // \u00e9, \u00c5
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "s")
      .select(col("id"), nfcNormalize(col("s")).as("n"),
        nfcNormalize(nfcNormalize(col("s"))).as("nn"),
        length(col("s")).as("lb"), length(nfcNormalize(col("s"))).as("la"))
    val r = df.as[(Long, String, String, Int, Int)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L)._2 == composed)               // composition happened
    assert(r(1L)._4 == 8 && r(1L)._5 == 6)     // two marks absorbed
    assert(r(2L)._2 == composed && r(2L)._4 == r(2L)._5) // NFC-stable
    assert(r(3L)._2 == "plain ascii")
    assert(r(1L)._2 == r(1L)._3)               // idempotent
  }

  test("analyzer: Column chain and String chain agree token-for-token") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.Analyzer
    val texts = Seq(
      "The SCAN and FILTER merge!",
      "a an and are",                       // all stopwords → empty
      "Data-Processing: quality; scan",     // punctuation boundaries
      "x yy Zz q",                          // 1-char tokens dropped
      "",                                   // empty text
      "  MiXeD   CaSe   ToKeNs  ")
    val cfg = Analyzer.Config()
    val fromCol = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), Analyzer.tokens(col("t"), cfg).as("tk"))
      .as[(Long, Seq[String])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(fromCol(i.toLong) == Analyzer.analyze(t, cfg),
        s"analyzer mismatch on: '$t'")
    }
    // duplicates kept in order (tf depends on it)
    assert(Analyzer.analyze("scan scan merge scan") ==
      Seq("scan", "scan", "merge", "scan"))
  }

  test("analyzer cjk: bigram stage agrees Column vs String; " +
      "default config mismatches on Chinese (the silent-miss pin)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.Analyzer
    val cjk = Analyzer.Config(minTokenLen = 1, stopwords = Nil,
      cjkBigrams = true)
    val texts = Seq(
      "向量检索",                       // one Han run → 3 bigrams
      "向量数据库支持中文全文检索。",    // punctuation boundary
      "mixed 向量 search 检索系统",     // Latin tokens pass through
      "中",                             // single Han char: unexpanded
      "abc中文def",                     // mixed-script token: unexpanded
      "")
    val fromCol = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), Analyzer.tokens(col("t"), cjk).as("tk"))
      .as[(Long, Seq[String])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(fromCol(i.toLong) == Analyzer.analyze(t, cjk),
        s"cjk analyzer mismatch on: '$t'")
    }
    // the bigram arithmetic itself
    assert(Analyzer.analyze("向量检索", cjk) == Seq("向量", "量检", "检索"))
    assert(Analyzer.analyze("中", cjk) == Seq("中"))
    assert(Analyzer.analyze("abc中文def", cjk) == Seq("abc中文def"))
    // ANALYZER-MISMATCH pin: the default (no-bigram) chain keeps the
    // whole Han run as ONE token, so an index built with the cjk chain
    // and a query analyzed with the default one share NO terms — the
    // classic silent-miss bug the one-Config contract exists to stop
    val dflt = Analyzer.Config(minTokenLen = 1, stopwords = Nil)
    val q = "向量检索"
    assert(Analyzer.analyze(q, dflt) == Seq(q))
    assert(Analyzer.analyze(q, cjk).toSet
      .intersect(Analyzer.analyze(q, dflt).toSet).isEmpty)
  }

  test("analyzer stemmer + asciifolding: Porter-1a anchors, fold " +
      "anchors, Column/String agreement, fingerprint versioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.Analyzer
    val cfg = Analyzer.Config(asciiFolding = true,
      stemmer = Some(Analyzer.StemmerEnglishS))
    // Porter step 1a anchors (sses→ss, ies→i, s-drop unless ss)
    assert(Analyzer.analyze("databases ponies caress cats classes boss",
      cfg) == Seq("database", "poni", "caress", "cat", "class", "boss"))
    // folding anchors: accents fold to ASCII, then stem applies;
    // stopword check runs on the FOLDED+stemmed surface
    assert(Analyzer.analyze("café naïve Über señor", cfg)
      == Seq("cafe", "naive", "uber", "senor"))
    // both faces agree on mixed input
    val texts = Seq(
      "Databases and QUERIES: optimizées!",
      "caress passes gas làs",
      "ss s es ies sses",
      "")
    val fromCol = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), Analyzer.tokens(col("t"), cfg).as("tk"))
      .as[(Long, Seq[String])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(fromCol(i.toLong) == Analyzer.analyze(t, cfg),
        s"stem/fold analyzer mismatch on: '$t'")
    }
    // unknown stemmer refused loudly
    intercept[IllegalArgumentException] {
      Analyzer.Config(stemmer = Some("porter-full"))
    }
    // fingerprint: every chain knob changes it; equal configs agree
    val base = Analyzer.Config()
    assert(Analyzer.fingerprint(base)
      == Analyzer.fingerprint(Analyzer.Config()))
    val variants = Seq(
      Analyzer.Config(lowercase = false),
      Analyzer.Config(minTokenLen = 1),
      Analyzer.Config(maxTokenLen = 39),
      Analyzer.Config(stopwords = Nil),
      Analyzer.Config(cjkBigrams = true),
      Analyzer.Config(asciiFolding = true),
      Analyzer.Config(stemmer = Some(Analyzer.StemmerEnglishS)))
    val fps = (base +: variants).map(Analyzer.fingerprint)
    assert(fps.distinct.size == fps.size, s"fingerprint collision: $fps")
  }

  test("fulltext analyzer marker: append/serve under a different " +
      "chain fails loudly; unmarked artifacts pass; long-id required") {
    import spark.implicits._
    import graft.search.FullText
    import graft.text.Analyzer
    val dir = "/tmp/graft_ft_marker_test"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    val docs = Seq((1L, "databases store data"),
      (2L, "queries scan tables")).toDF("doc_id", "text")
    val stemmed = Analyzer.Config(stemmer =
      Some(Analyzer.StemmerEnglishS))
    FullText.buildAnalyzed(docs, "doc_id", "text", dir, stemmed)
    assert(FullText.analyzerFingerprint(spark, dir)
      .contains(Analyzer.fingerprint(stemmed)))
    // same chain: append + guard pass
    FullText.requireAnalyzer(spark, dir, stemmed)
    FullText.appendAnalyzed(Seq((3L, "tables of databases"))
      .toDF("doc_id", "text"), "doc_id", "text", dir, stemmed)
    // DIFFERENT chain: loud failure, not a silent miss
    intercept[IllegalStateException] {
      FullText.requireAnalyzer(spark, dir, Analyzer.Config())
    }
    intercept[IllegalStateException] {
      FullText.appendAnalyzed(Seq((4L, "more rows")).toDF("doc_id",
        "text"), "doc_id", "text", dir, Analyzer.Config())
    }
    // raw build writes no marker: any chain passes the guard
    // (pre-round-16 artifacts behave the same — documented)
    val rawDir = s"$dir/raw"
    FullText.build(docs, "doc_id", "text", rawDir)
    assert(FullText.analyzerFingerprint(spark, rawDir).isEmpty)
    FullText.requireAnalyzer(spark, rawDir, stemmed)
    // BIGINT id contract enforced at lexical build time (round-16
    // advisory: SparseVec.build asserts it, FullText bypassed that)
    intercept[IllegalArgumentException] {
      FullText.build(Seq((1, "int ids")).toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/intids")
    }
    intercept[IllegalArgumentException] {
      FullText.appendAnalyzed(Seq((5, "int ids")).toDF("doc_id",
        "text"), "doc_id", "text", dir, stemmed)
    }
  }
}
