package graft

import graft.operators.{FreqSketch, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 extension tier: Count-Min frequency sketch (q128), PQ-ADC
  * top-k (q129), and BPE merge training (q130).
  */
class SketchVocabPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def events = Tables.load(spark, sf, "events")
  private def embs = Tables.load(spark, sf, "embeddings")

  // ---- Count-Min sketch ----

  test("cmsHeavyHitters: estimates are one-sided (est >= exact) and top-1 is the true mode") {
    val rows = FreqSketch.cmsHeavyHitters(events, "user_id", depth = 4, width = 512, topN = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 10)
    rows.foreach { case (_, exact, est, over) =>
      assert(est >= exact, s"CMS must never undercount (exact=$exact est=$est)")
      assert(over == est - exact)
    }
    // ordering contract: exact desc, key asc
    assert(rows.map(r => (-r._2, r._1)).toSeq == rows.map(r => (-r._2, r._1)).sorted.toSeq)
  }

  test("cmsMerge of daily partials equals the sketch built in one shot") {
    val daily = FreqSketch.cmsDailyCells(events, "user_id", depth = 4, width = 512)
    val merged = FreqSketch.cmsMerge(daily)
      .as[(Int, Long, Long)].collect().toMap2
    // one-shot = same pipeline with a single constant day
    val oneShot = FreqSketch.cmsMerge(
      FreqSketch.cmsDailyCells(events.withColumn("ts", lit("2024-01-01").cast("timestamp")),
        "user_id", depth = 4, width = 512))
      .as[(Int, Long, Long)].collect().toMap2
    assert(merged == oneShot, "element-wise sum of daily cells must equal the one-shot sketch")
  }

  test("cmsHeavyHitters overcount is bounded by 2N/width on the fixture") {
    val n = events.count()
    val rows = FreqSketch.cmsHeavyHitters(events, "user_id", depth = 4, width = 512, topN = 20)
      .as[(String, Long, Long, Long)].collect()
    rows.foreach { case (k, _, _, over) =>
      assert(over <= 2 * n / 512, s"key $k overcount $over exceeds 2N/width=${2 * n / 512}")
    }
  }

  private implicit class CellsOps(rows: Array[(Int, Long, Long)]) {
    def toMap2: Map[(Int, Long), Long] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  // ---- PQ-ADC top-k ----

  test("pqTopK returns k ranked neighbours per query, self excluded, ranks contiguous") {
    val out = Similarity.pqTopK(embs, m = 8, ks = 16, nQueries = 3, k = 5, rerank = 20)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._1).distinct.toSeq == Seq(0L, 1L, 2L))
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).toSeq == (1L to 5L), s"qid=$qid ranks not contiguous")
      assert(!rows.map(_._3).contains(qid), s"qid=$qid matched itself")
      // adc scores non-increasing in rank
      val scores = rows.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("pqTopK with a full-corpus shortlist equals the exact int8 scan (rerank is lossless)") {
    // shortlist = everything -> the rerank stage IS cosineTopKInt8;
    // the PQ/ADC stages may only reorder the shortlist, never the answer
    val full = Similarity.pqTopK(embs, m = 8, ks = 16, nQueries = 5, k = 10, rerank = 1000)
      .collect().toSeq
    val exact = Similarity.cosineTopKInt8(embs, nQueries = 5, k = 10).collect().toSeq
    assert(full == exact)
  }

  test("pqTopK recall@10 vs the exact int8 scan rises with rerank depth") {
    val exact = Similarity.cosineTopKInt8(embs, nQueries = 5, k = 10)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def meanRecall(rerank: Int): Double = {
      val pq = Similarity.pqTopK(embs, m = 8, ks = 16, nQueries = 5, k = 10, rerank = rerank)
        .select("qid", "nid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.keys.toSeq.sorted.map(q =>
        pq(q).intersect(exact(q)).size.toDouble / exact(q).size)
      rs.sum / rs.size
    }
    val (shallow, deep) = (meanRecall(10), meanRecall(40))
    assert(deep >= shallow, s"recall must not fall as the shortlist deepens ($shallow -> $deep)")
    assert(deep >= 0.75, s"mean PQ recall@10 with rerank=4k too low: $deep")
  }

  test("pqTopK is invariant to input partitioning") {
    val a = Similarity.pqTopK(embs, m = 8, ks = 16, nQueries = 2, k = 5, rerank = 20).collect().toSeq
    val b = Similarity.pqTopK(embs.repartition(13), m = 8, ks = 16, nQueries = 2, k = 5, rerank = 20)
      .collect().toSeq
    assert(a == b)
  }

  // ---- BPE merge training ----

  test("bpeTrainMerges learns the expected merges on a hand-checked corpus") {
    // "low low low lowest" — chars: l,o,w dominate; freq-weighted pair
    // counts: (l,o)=4, (o,w)=4, (w,e)=1, (e,s)=1, (s,t)=1.
    // Tie (l,o) vs (o,w) breaks lexicographically -> (l,o) first.
    // After merge 1: lo w (x3), lo w e s t -> best (lo,w)=4.
    // After merge 2: low (x3), low e s t -> best (low,e)=1? No:
    // remaining pairs (low,e)=1,(e,s)=1,(s,t)=1 -> lex smallest (e,s).
    val docs = Seq((1L, "low low low lowest")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainMerges(docs, merges = 3)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "l", "o", "lo", 4L),
      (2L, "lo", "w", "low", 4L),
      (3L, "e", "s", "es", 1L)))
  }

  test("bpeTrainMerges merge application is greedy left-to-right (aaa -> [aa, a])") {
    // 'aaaa' and 'aaa': pair (a,a) counts 3+2=5; after merging,
    // 'aaaa' -> [aa, aa], 'aaa' -> [aa, a]. Round 2's top pair is then
    // (aa, aa)=1 from 'aaaa' vs (aa, a)=1 from 'aaa' -> lex: (aa, a).
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainMerges(docs, merges = 2)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a", "a", "aa", 5L),
      (2L, "aa", "a", "aaa", 1L)))
  }

  test("bpeTrainMerges round counts are freq-weighted over the dedup'd vocab") {
    val docs = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainMerges(docs, merges = 1)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", "b", "ab", 3L)))
  }

  test("bpeTrainMerges stops early (no crash) when the corpus runs out of pairs") {
    // single-char words: nothing to merge at all
    val bare = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrainMerges(bare, merges = 3).collect().isEmpty)
    // one learnable merge, then exhausted; encode still works
    val one = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val learned = TextAnalysis.bpeTrainMerges(one, merges = 5)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(learned == Seq((1L, "a", "b", "ab", 2L)))
    val enc = TextAnalysis.bpeEncodeCounts(one, merges = 5)
      .as[(String, Long)].collect().toSeq
    assert(enc == Seq(("ab", 2L)))
  }

  test("bpeEncodeCounts applies ALL merges (incl. the last) on the hand-checked corpus") {
    // merges: (l,o)->lo, (lo,w)->low, (e,s)->es; encoded:
    // "low"x3 -> [low], "lowest" -> [low, es, t]
    val docs = Seq((1L, "low low low lowest")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncodeCounts(docs, merges = 3)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("low", 4L), ("es", 1L), ("t", 1L)))
  }

  test("bpeEncodeCounts conserves characters and token totals shrink as merges grow") {
    val docs = Tables.load(spark, sf, "documents")
    val chars = docs.select(
      sum(length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))))
      .as[Long].head()
    def stats(m: Int): (Long, Long) = {
      val enc = TextAnalysis.bpeEncodeCounts(docs, merges = m)
      val r = enc.select(
        sum(col("n_tokens") * length(col("token"))),
        sum(col("n_tokens"))).as[(Long, Long)].head()
      r
    }
    val (chars1, toks1) = stats(1)
    val (chars4, toks4) = stats(4)
    assert(chars1 == chars && chars4 == chars,
      s"encoding must conserve characters ($chars vs $chars1/$chars4)")
    assert(toks4 < toks1, "each merge strictly reduces total tokens on this corpus")
  }

  test("bpeEncodeIds: vocab follows the reference id layout on the hand-checked corpus") {
    // chars sorted: e,l,o,s,t,w -> ids 0..5; merges lo=6, low=7, es=8
    val docs = Seq((1L, "low low low lowest")).toDF("doc_id", "text")
    val (ids, vocab) = TextAnalysis.bpeEncodeIdsWithVocab(docs, merges = 3)
    assert(vocab.as[(String, Int)].collect().toSeq == Seq(
      ("e", 0), ("l", 1), ("o", 2), ("s", 3), ("t", 4), ("w", 5),
      ("lo", 6), ("low", 7), ("es", 8)))
    // "low low low lowest" -> [low, low, low, low, es, t]
    val enc = ids.as[(Long, Seq[Int], Long)].collect().toSeq
    assert(enc == Seq((1L, Seq(7, 7, 7, 7, 8, 4), 6L)))
  }

  test("bpeEncodeIds id-decode round-trips to bpeEncodeCounts' histogram") {
    val docs = Tables.load(spark, sf, "documents")
    val (ids, vocab) = TextAnalysis.bpeEncodeIdsWithVocab(docs, merges = 4)
    // decode every id back through the vocab and histogram the tokens:
    // must equal the corpus-wide q131 histogram exactly
    val decoded = ids.select(explode(col("ids")).as("id"))
      .join(vocab, Seq("id"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_tokens"))
      .as[(String, Long)].collect().toMap
    val direct = TextAnalysis.bpeEncodeCounts(docs, merges = 4)
      .as[(String, Long)].collect().toMap
    assert(decoded == direct,
      "decoding the materialized ids must reproduce q131's token histogram")
    // and no id decodes ambiguously: vocab ids are unique
    val vs = vocab.as[(String, Int)].collect()
    assert(vs.map(_._2).distinct.length == vs.length)
  }

  test("persisted vocab: encode-from-state equals inline; novel chars fall back to unk") {
    val train = Seq((1L, "low low low lowest")).toDF("doc_id", "text")
    val st = java.nio.file.Files.createTempDirectory("graft_bpe_vocab").toString + "/bpe"
    TextAnalysis.persistBpeVocab(train, merges = 3, st)
    // same corpus -> identical ids to the inline train+encode
    val fromState = TextAnalysis.bpeEncodeIdsFromVocab(train, spark, st)
      .as[(Long, Seq[Int], Long)].collect().toSeq
    val inline = TextAnalysis.bpeEncodeIds(train, merges = 3)
      .as[(Long, Seq[Int], Long)].collect().toSeq
    assert(fromState === inline)
    // vocab: e,l,o,s,t,w -> 0..5; lo=6, low=7, es=8; unk = 9
    // a NEW word of SEEN chars encodes through chars+merges ("slow"
    // -> s,low -> [3, 7]); a novel char ('z') maps to unk = 9
    val day2 = Seq((2L, "slow zlot")).toDF("doc_id", "text")
    val enc2 = TextAnalysis.bpeEncodeIdsFromVocab(day2, spark, st)
      .as[(Long, Seq[Int], Long)].collect().toSeq
    // "slow": s l o w -> (l,o)->lo -> (lo,w)->low => [s, low] = [3, 7]
    // "zlot": z l o t -> lo merge applies => [z=unk, lo, t] = [9, 6, 4]
    assert(enc2 === Seq((2L, Seq(3, 7, 9, 6, 4), 5L)))
  }

  test("bpeTrainMergesBatched: batch=1 reproduces classic; a round commits only disjoint pairs") {
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 40)
    // batch=1 degenerates to classic BPE: the rank-1 pair is always
    // selected, the fold is the same single-rule scan
    val classic = TextAnalysis.bpeTrainMerges(docs, merges = 6)
      .collect().map(_.toSeq).toSeq
    val b1 = TextAnalysis.bpeTrainMergesBatched(docs, rounds = 6, batch = 1)
      .collect().map(_.toSeq).toSeq
    assert(b1 === classic,
      "rounds=N, batch=1 must emit exactly classic BPE's merge table")
    // constructed corpus: (x,y)=5 and (p,q)=4 are token-disjoint and
    // both commit in round 1; (y,z)=3 shares y with the better (x,y)
    // and must wait for round 2's recount
    val tiny = Seq((1L, ("xy " * 5 + "pq " * 4 + "yz " * 3).trim))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainMergesBatched(tiny, rounds = 2, batch = 3)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "x", "y", "xy", 5L),
      (2L, "p", "q", "pq", 4L),
      (3L, "y", "z", "yz", 3L)))
    // the by-round variant exposes the wave boundary iter cannot
    // recover (iter is a global ordinal): (x,y) and (p,q) commit in
    // wave 1, (y,z) waits for wave 2's recount. filter(round <= 1)
    // IS the 1-round training.
    val byRound = TextAnalysis.bpeTrainMergesBatchedByRound(tiny, rounds = 2, batch = 3)
      .select(col("round"), col("iter"), col("merged"))
      .as[(Long, Long, String)].collect().toSeq
    assert(byRound === Seq((1L, 1L, "xy"), (1L, 2L, "pq"), (2L, 3L, "yz")))
    val oneRound = TextAnalysis.bpeTrainMergesBatchedByRound(tiny, rounds = 1, batch = 3)
      .select(col("round"), col("iter"), col("merged"))
      .as[(Long, Long, String)].collect().toSeq
    assert(oneRound === byRound.filter(_._1 <= 1L),
      "training for r waves must equal the first r waves of a longer run")
  }

  test("greedy cascade: batch=1 is classic; re-admits pairs whose beaters were dropped; artifact consistent") {
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 40)
    // batch=1: the cascade's first pick is the rank-1 pair — classic,
    // exactly like the default rule
    val classic = TextAnalysis.bpeTrainMerges(docs, merges = 6)
      .collect().map(_.toSeq).toSeq
    val g1 = TextAnalysis.bpeTrainMergesBatched(docs, rounds = 6, batch = 1,
      greedyPool = 8).collect().map(_.toSeq).toSeq
    assert(g1 === classic)
    // the cascade's whole point: (x,y)=5 beats (y,z)=4 in group y, and
    // (y,z) beats (z,w)=3 in group z — the default rule drops BOTH
    // losers (only (x,y) commits in round 1), while the cascade
    // re-admits (z,w) because its beater (y,z) was itself dropped.
    // Both stay token-disjoint; (z,w)'s count is exact (invariant
    // under the disjoint (x,y) merge).
    val tiny = Seq((1L, ("xy " * 5 + "yz " * 4 + "zw " * 3).trim))
      .toDF("doc_id", "text")
    val viaDefault = TextAnalysis.bpeTrainMergesBatched(tiny, rounds = 1, batch = 3)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(viaDefault === Seq((1L, "x", "y", "xy", 5L)),
      "the default rule commits only the all-groups winner in round 1")
    val viaGreedy = TextAnalysis.bpeTrainMergesBatched(tiny, rounds = 1, batch = 3,
      greedyPool = 8).as[(Long, String, String, String, Long)].collect().toSeq
    assert(viaGreedy === Seq(
      (1L, "x", "y", "xy", 5L),
      (2L, "z", "w", "zw", 3L)),
      "the cascade must pack the re-admitted disjoint pair into round 1")
    // at matched (rounds, batch) the cascade never packs FEWER merges
    val nDefault = TextAnalysis.bpeTrainMergesBatched(docs, rounds = 3, batch = 8).count()
    val nGreedy = TextAnalysis.bpeTrainMergesBatched(docs, rounds = 3, batch = 8,
      greedyPool = 8).count()
    assert(nGreedy >= nDefault,
      s"greedy packed $nGreedy merges vs the default's $nDefault at matched rounds")
    // the greedy artifact goes through the same assembler and encodes
    // through the unchanged downstream (character conservation proves
    // the fold/apply agreement, same shape as the classic pin)
    val gv = Scratch.dir("graft_bv_greedy") + "/bpe"
    TextAnalysis.persistBpeVocabBatched(docs, rounds = 3, batch = 8, gv, greedyPool = 8)
    val merges = spark.read.parquet(gv + "/merges").orderBy(col("iter"))
      .collect().map(_.toSeq).toSeq
    val direct = TextAnalysis.bpeTrainMergesBatched(docs, rounds = 3, batch = 8,
      greedyPool = 8).collect().map(_.toSeq).toSeq
    assert(merges === direct)
    // the trainer tokenizes by whitespace-splitting lower(trim(text)),
    // so conserved characters = everything but the whitespace
    val nChars = docs.select(sum(length(regexp_replace(
      lower(trim(col("text"))), "\\s+", "")))).head().getLong(0)
    val vocab = spark.read.parquet(gv + "/vocab")
      .as[(String, Int)].collect().toMap
    val idToTok = vocab.map(_.swap)
    val encChars = TextAnalysis.bpeEncodeIdsFromVocab(docs, spark, gv)
      .select(col("doc_id"), col("ids")).as[(Long, Seq[Int])].collect()
      .map(_._2.map(id => idToTok.getOrElse(id, "").length.toLong).sum).sum
    assert(encChars === nChars,
      "greedy-vocab encoding must conserve every character of the tokenized text")
  }

  test("size-gated cascade default: vocab-scale batches auto-cascade, small batches and -1 stay grouped") {
    // same corpus as the cascade test: the grouped rule commits only
    // (x,y) in round 1; the cascade also re-admits the disjoint (z,w)
    val tiny = Seq((1L, ("xy " * 5 + "yz " * 4 + "zw " * 3).trim))
      .toDF("doc_id", "text")
    val gate = TextAnalysis.GreedyBatchGate
    // auto at a vocab-scale batch IS the cascade (equal to an explicit pool)
    val auto = TextAnalysis.bpeTrainMergesBatched(tiny, rounds = 1, batch = gate)
      .collect().map(_.toSeq).toSeq
    val explicitPool = TextAnalysis.bpeTrainMergesBatched(tiny, rounds = 1,
      batch = gate, greedyPool = TextAnalysis.GreedyDefaultPool)
      .collect().map(_.toSeq).toSeq
    assert(auto === explicitPool,
      "auto at batch >= GreedyBatchGate must equal the explicit cascade")
    assert(auto.map(_(3)) === Seq("xy", "zw"),
      "the auto cascade must pack the re-admitted disjoint pair")
    // -1 forces the grouped rule at the same batch
    val forced = TextAnalysis.bpeTrainMergesBatched(tiny, rounds = 1,
      batch = gate, greedyPool = -1).collect().map(_.toSeq).toSeq
    assert(forced.map(_(3)) === Seq("xy"),
      "greedyPool = -1 must force the grouped rule regardless of batch")
    // small batches keep the grouped rule (what the catalog oracles replay)
    val small = TextAnalysis.bpeTrainMergesBatched(tiny, rounds = 1, batch = 3)
      .collect().map(_.toSeq).toSeq
    assert(small.map(_(3)) === Seq("xy"),
      "auto below the gate must stay on the grouped rule")
  }

  test("persistBpeVocabBatched: batch=1 artifact encodes like classic; artifact matches trainer") {
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 40)
    val c = Scratch.dir("graft_bv_classic") + "/bpe"
    val b = Scratch.dir("graft_bv_b1") + "/bpe"
    TextAnalysis.persistBpeVocab(docs, merges = 5, c)
    TextAnalysis.persistBpeVocabBatched(docs, rounds = 5, batch = 1, b)
    def enc(p: String) = TextAnalysis.bpeEncodeIdsFromVocab(docs, spark, p)
      .collect().map(_.toSeq).toSeq
    assert(enc(b) === enc(c),
      "a batch=1 batched artifact must encode exactly like the classic artifact")
    // a genuinely batched artifact: merges table equals the trainer's
    // output verbatim, meta counts line up with the learned set
    val b3 = Scratch.dir("graft_bv_b3") + "/bpe"
    TextAnalysis.persistBpeVocabBatched(docs, rounds = 2, batch = 3, b3)
    val merges = spark.read.parquet(b3 + "/merges").orderBy(col("iter"))
      .collect().map(_.toSeq).toSeq
    val direct = TextAnalysis.bpeTrainMergesBatched(docs, rounds = 2, batch = 3)
      .collect().map(_.toSeq).toSeq
    assert(merges === direct)
    val meta = spark.read.parquet(b3 + "/meta").head()
    assert(meta.getAs[Int]("merges") === merges.length)
  }

  test("wave-grouped encode equals singleton sequential application on a multi-merge-wave vocab") {
    // the round-17 encode-scale change: the loaded artifact groups the
    // ordered merge list into maximal token-disjoint runs and
    // bpeEncodeIdsWith folds once per RUN instead of once per merge.
    // Pin the equivalence directly: the same artifact with its waves
    // exploded to singletons must encode identically.
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 60)
    def enc(a: TextAnalysis.BpeVocabArtifact) =
      TextAnalysis.bpeEncodeIdsWith(docs, a).collect().map(_.toSeq).toSeq
    def singleton(a: TextAnalysis.BpeVocabArtifact) =
      a.copy(mergeWaves = a.mergeWaves.flatten.map(Seq(_)))
    // a corpus BUILT for full waves: four token-disjoint pairs with
    // distinct frequencies, so wave 1 commits all four under any rule
    // — the arm that actually exercises the multi-rule one-pass fold
    val wide = Seq(
      (1L, "ab ab ab ab cd cd cd ef ef gh"),
      (2L, "ab cd ef gh ab cd ef"),
      (3L, "gh ef cd ab")).toDF("doc_id", "text")
    val g = Scratch.dir("graft_bv_waves_g") + "/bpe"
    TextAnalysis.persistBpeVocabBatched(wide, rounds = 2, batch = 4, g)
    val gart = TextAnalysis.loadBpeVocabArtifact(spark, g)
    assert(gart.mergeWaves.exists(_.size > 1),
      "fixture must produce at least one multi-merge wave or this test pins nothing")
    def encW(a: TextAnalysis.BpeVocabArtifact) =
      TextAnalysis.bpeEncodeIdsWith(wide, a).collect().map(_.toSeq).toSeq
    assert(encW(gart) === encW(singleton(gart)),
      "per-wave one-pass fold must equal the per-merge sequential fold")
    // the default rule's early waves are alphabet-bound (often
    // singletons here) — the equivalence must hold regardless
    val p = Scratch.dir("graft_bv_waves") + "/bpe"
    TextAnalysis.persistBpeVocabBatched(docs, rounds = 3, batch = 4, p)
    val art = TextAnalysis.loadBpeVocabArtifact(spark, p)
    assert(enc(art) === enc(singleton(art)))
  }

  test("packConcatCut: exactly-full sequences, total coverage, fragment contiguity") {
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 40)
    val enc = TextAnalysis.bpeEncodeIds(docs, merges = 2)
    val total = enc.agg(sum(org.apache.spark.sql.functions.size(col("ids"))))
      .as[Long].head()
    val out = graft.operators.TextPrep.packConcatCut(enc, budget = 64).collect()
    // coverage: fragments partition the whole token stream
    assert(out.map(_.getAs[Long]("frag_len")).sum === total)
    // every sequence except the last is exactly full
    val bySeq = out.groupBy(_.getAs[Long]("seq_idx")).view
      .mapValues(_.map(_.getAs[Long]("frag_len")).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, n) =>
      if (s != lastSeq) assert(n === 64L, s"seq $s holds $n tokens, want 64")
      else assert(n >= 1L && n <= 64L)
    }
    // within a sequence, fragments tile [0, budget): offsets chain
    out.groupBy(_.getAs[Long]("seq_idx")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("seq_off"))
      sorted.foldLeft(0L) { (expect, r) =>
        assert(r.getAs[Long]("seq_off") === expect); expect + r.getAs[Long]("frag_len")
      }
    }
    // a document's fragments cover its ids contiguously from 0
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_off"))
      sorted.foldLeft(0L) { (expect, r) =>
        assert(r.getAs[Long]("doc_off") === expect); expect + r.getAs[Long]("frag_len")
      }
    }
    // and the result is invariant to input partitioning (the frozen
    // range-partition prefix sum owns placement, not arrival order)
    val b = graft.operators.TextPrep.packConcatCut(enc.repartition(13), budget = 64)
      .collect().toSeq
    assert(b === out.toSeq)
  }

  test("packTokenIds: offsets restart per sequence and wsum pins chunk content") {
    // one doc, 7 tokens, chunk size 3, budget 6 -> chunks of 3,3,1;
    // greedy: seq0=[c0,c1] (offsets 0,3), seq1=[c2] (offset 0)
    val enc = Seq((1L, Seq(10, 11, 12, 20, 21, 22, 30)))
      .toDF("doc_id", "ids")
    val out = graft.operators.TextPrep.packTokenIds(enc, size = 3, budget = 6)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L, 3L, 10L, 12L, 10L * 1 + 11 * 2 + 12 * 3),
      (1L, 1L, 0L, 3L, 3L, 20L, 22L, 20L * 1 + 21 * 2 + 22 * 3),
      (1L, 2L, 1L, 0L, 1L, 30L, 30L, 30L)))
  }

  test("packConcatCutSep: every document's closing fragment ends in the separator") {
    val enc = Seq(
      (1L, Seq(10, 11, 12)), (2L, Seq(20)), (3L, Seq.empty[Int]),
      (4L, Seq(40, 41, 42, 43, 44))).toDF("doc_id", "ids")
    val sep = 99
    val out = graft.operators.TextPrep.packConcatCutSep(enc, budget = 4, sepId = sep)
      .collect()
    // equivalence with manual append + plain pack
    val ref = graft.operators.TextPrep.packConcatCut(
      enc.withColumn("ids", concat(col("ids"), array(lit(sep)))), budget = 4)
      .collect()
    assert(out.map(_.toSeq).toSeq === ref.map(_.toSeq).toSeq)
    // the fragment that closes each document carries the separator
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      val closing = rows.maxBy(_.getAs[Long]("doc_off"))
      assert(closing.getAs[Long]("last_id") === sep.toLong)
    }
    // the empty document still contributes exactly its separator
    val d3 = out.filter(_.getAs[Long]("doc_id") == 3L)
    assert(d3.length === 1 && d3.head.getAs[Long]("frag_len") === 1L
      && d3.head.getAs[Long]("first_id") === sep.toLong)
    // total stream length = tokens + one separator per doc
    assert(out.map(_.getAs[Long]("frag_len")).sum === (3 + 1 + 0 + 5) + 4L)
  }

  test("packShards: concatenated shard arrays equal the encoded stream; sep round-trips") {
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 40)
    val enc = TextAnalysis.bpeEncodeIds(docs, merges = 2)
    // the encoded stream: every doc's ids in doc_id order, flattened
    val stream = enc.filter(org.apache.spark.sql.functions.size(col("ids")) >= 1)
      .orderBy(col("doc_id"))
      .select(explode(col("ids")).as("x")).select(col("x").cast("long"))
      .as[Long].collect().toSeq
    val shards = graft.operators.TextPrep.packShards(enc, budget = 64)
      .as[(Long, Long, Seq[Long])].collect().toSeq
    // shard concatenation in seq_idx order IS the stream
    assert(shards.sortBy(_._1).flatMap(_._3) === stream)
    // every shard except the last is exactly full; n_tokens = len(ids)
    shards.foreach { case (s, n, ids) =>
      assert(n === ids.length.toLong)
      if (s != shards.map(_._1).max) assert(n === 64L, s"seq $s holds $n")
    }
    // write/readback path: sharded parquet round-trips the same rows,
    // and the boundary table written beside it observes the same cut
    val base = Scratch.dir("graft_shards_spec")
    graft.operators.TextPrep.writeTrainingShards(enc, budget = 64, basePath = base)
    val back = graft.operators.TextPrep.readTrainingShards(spark, base)
      .as[(Long, Long, Seq[Long])].collect().toSeq
    assert(back === shards)
    val bounds = spark.read.parquet(base + "/boundaries")
    assert(bounds.agg(sum(col("frag_len"))).as[Long].head() === stream.length.toLong)
    // self-contained spans (q187): per-sequence spans tile [0, n_tokens)
    // with no gaps, so the attention mask derives from the row alone
    graft.operators.TextPrep.packShardsWithSpans(enc, budget = 64)
      .collect().foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        val spans = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("doc_spans")
        val end = spans.foldLeft(0L) { (expect, sp) =>
          assert(sp.getAs[Long]("off") === expect); expect + sp.getAs[Long]("len")
        }
        assert(end === n, "spans must cover the sequence exactly")
      }
    // separator round-trip (q182's stream shape): each document's ids
    // reappear between separators, in doc_id order
    val sep = 1000000L
    val sepBase = Scratch.dir("graft_shards_sep_spec")
    graft.operators.TextPrep.writeTrainingShards(enc, budget = 64,
      basePath = sepBase, sepId = Some(sep.toInt))
    val sepStream = graft.operators.TextPrep.readTrainingShards(spark, sepBase)
      .as[(Long, Long, Seq[Long])].collect().toSeq.sortBy(_._1).flatMap(_._3)
    val docsBack = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[Long]
      sepStream.foreach { x =>
        if (x == sep) { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty }
        else cur += x
      }
      assert(cur.isEmpty, "stream must END on a separator")
      out.toSeq
    }
    val encDocs = enc.orderBy(col("doc_id"))
      .select(expr("transform(ids, x -> cast(x as bigint))")).as[Seq[Long]]
      .collect().toSeq.filter(_.nonEmpty)
    // packConcatCutSep keeps empty docs (their sep is one token), so
    // splitting on sep yields one entry per INPUT doc; drop the empties
    // on both sides to compare content docs positionally
    assert(docsBack.filter(_.nonEmpty) === encDocs)
  }

  test("packTokenIds: a document with an empty ids array emits no chunk row") {
    // same guard as packConcatCut — without it an empty array yields a
    // degenerate (n_tokens = 0, null first/last) row
    val enc = Seq((1L, Seq(10, 11)), (2L, Seq.empty[Int])).toDF("doc_id", "ids")
    val out = graft.operators.TextPrep.packTokenIds(enc, size = 3, budget = 6)
    assert(out.filter(col("doc_id") === 2L).count() === 0L)
    assert(out.count() === 1L)
  }
}
