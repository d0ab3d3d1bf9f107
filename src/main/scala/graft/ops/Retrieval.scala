package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import Util._
import TextOps.{tokens, tokensSql}

/** Retrieval and model-based quality operators for the training-data
  * pipeline: BM25 full-text search (the retrieval primitive behind
  * RAG corpus construction and dedup-by-retrieval), an n-gram
  * language-model perplexity gate (the CCNet-style quality filter —
  * score every document under a model trained on a trusted slice,
  * keep the low-perplexity tail), and PII detection/redaction (the
  * compliance pass every production corpus runs before training).
  *
  * Cross-engine determinism disciplines (inherited from TextOps):
  * the shared whitespace tokenizer, `roundTo` (floor(x·s+0.5)/s —
  * identical IEEE ops in both engines), and order-independent DECIMAL
  * sums for any aggregate of rounded doubles, so float results
  * hash-match the DuckDB oracle bit for bit.
  */
object Retrieval {

  // ---------------------------------------------------------------
  // BM25
  // ---------------------------------------------------------------

  /** Okapi BM25 parameters (the standard defaults). */
  val BmK1 = 1.2
  val BmB = 0.75

  /** Fixed query-term set for the declared query — chosen from the
    * synthetic corpus vocabulary so tf/df vary across documents. */
  val BmTerms: Seq[String] = Seq("spark", "merge", "window", "filter")

  /** One (doc, term) BM25 contribution, rounded to 6 — the SINGLE
    * spelling both declared queries share (the MinhashK/LshBands
    * can't-desynchronize discipline, applied to the whole scoring
    * expression rather than just its constants). */
  private[ops] def bmContrib(tf: Column, df: Column, dl: Column,
      nDocs: Column, avgdl: Column): Column =
    roundTo(log(lit(1.0) + (nDocs - df + 0.5) / (df + 0.5)) *
      (tf * (BmK1 + 1.0)) /
      (tf + lit(BmK1) * (lit(1.0 - BmB) + lit(BmB) * dl / avgdl)), 6)

  /** SQL twin of [[bmContrib]]. EVERY integer operand is cast to
    * DOUBLE before it meets a decimal literal: DuckDB evaluates
    * BIGINT × DECIMAL in exact decimal arithmetic while Spark
    * multiplies doubles, and the two differ by 1 ulp on values like
    * 3 × 2.2 — enough to flip a roundTo-6 floor boundary and break
    * the hash contract. */
  private[ops] def bmContribSql(tf: String, df: String, dl: String,
      n: String, avgdl: String): String =
    roundToSql(
      s"ln(1.0 + (CAST($n AS DOUBLE) - $df + 0.5) / (CAST($df AS DOUBLE) + 0.5))" +
        s" * (CAST($tf AS DOUBLE) * ${BmK1 + 1.0})" +
        s" / (CAST($tf AS DOUBLE) + $BmK1 * (${1.0 - BmB} + $BmB * $dl / $avgdl))",
      6)

  /** BM25 top-k retrieval over a (doc_id, text) frame.
    *
    * SCALE SHAPE: the per-doc token explode filters to the query's
    * terms INSIDE the array before exploding, so the exchange after
    * tokenization carries only (doc_id, query-term, dl) rows — a
    * q-term posting list, not the corpus. df and the (n_docs, avgdl)
    * scalars are tiny aggregates joined back as broadcasts. The
    * final top-k is a TakeOrdered (orderBy.limit) — no global
    * window over the scored set; the row_number ranking runs on the
    * k collected survivors only. avgdl is an integer-sum / count
    * division (exact in both engines); per-term contributions round
    * to 6 then sum as DECIMAL so the score is summation-order-free.
    *
    * At 100 TB the posting-list shuffle is the only corpus-sized
    * exchange, and it is pre-filtered by the term list — the classic
    * inverted-index access path expressed as a declarative plan. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val d = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    // corpus stats: n_docs + average doc length (exact arithmetic:
    // SUM of integer lengths cast to double / count)
    val stats = d.select(size(col("toks")).as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // posting rows: filter the token array to query terms BEFORE the
    // explode — only matching tokens ever leave the map side
    val ex = d.select(col("doc_id"), size(col("toks")).as("dl"),
        explode(filter(col("toks"), t => t.isInCollection(terms))).as("token"))
    val tf = ex.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("c", bmContrib(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl")))
    val scored = contrib.groupBy(col("doc_id"))
      .agg(sum(col("c").cast("decimal(18,6)")).cast("double").as("s0"))
      .select(col("doc_id"), roundTo(col("s0"), 4).as("score"))
    // TakeOrdered top-k, then rank the k survivors (the window runs
    // over k rows, not the corpus)
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("score"), col("rnk"))
      .orderBy(col("rnk"))
  }

  /** Batch BM25: top-k retrieval for a FRAME of queries — the
    * retrieval-serving shape behind decontamination-by-retrieval, RAG
    * corpus pairing, and hard-negative mining. Every doc_id ≡ 0
    * (mod 100) with ≥9 tokens contributes a query (its tokens at
    * positions 1/5/9 — repeated terms weight double, the standard
    * query-term-frequency behavior, replayed identically by the
    * oracle); the query doc itself is excluded from its results.
    *
    * SCALE SHAPE: the query-term union broadcasts onto the exploded
    * token stream, so non-matching tokens die map-side BEFORE the tf
    * shuffle; df / query-terms / corpus stats all join as broadcasts;
    * and the per-query ranking runs through the BOUNDED-STATE
    * `topk_by_score` aggregate — k rows of state per query, no
    * score-space sort, the same serving discipline as q_batch_topk. */
  def bm25Batch(docs: DataFrame, k: Int, queryMod: Int = 100): DataFrame = {
    val d = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val q = d.filter(col("doc_id") % queryMod === 0 && size(col("toks")) >= 9)
      .select(col("doc_id").as("q_id"),
        explode(array(element_at(col("toks"), 1),
          element_at(col("toks"), 5),
          element_at(col("toks"), 9))).as("token"))
    val qTerms = q.select(col("token")).distinct()
    val stats = d.select(size(col("toks")).as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val ex = d.select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("token"))
      .join(broadcast(qTerms), Seq("token"))
    val tf = ex.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(dfreq), Seq("token"))
      .join(broadcast(q), Seq("token"))
      .filter(col("doc_id") =!= col("q_id"))
      .crossJoin(broadcast(stats))
      .withColumn("c", bmContrib(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl")))
    val scored = contrib.groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("c").cast("decimal(18,6)")).cast("double").as("s0"))
      .select(col("q_id"), col("doc_id"), roundTo(col("s0"), 4).as("score"))
    scored
      .select(col("q_id"), col("score"),
        // the shared guarded 19-digit pad (ADVICE r9 + review r10:
        // one spelling for every topk_by_score key site)
        Util.lpadKey(col("doc_id")).as("key"))
      .groupBy(col("q_id"))
      .agg(graft.functions.topk_by_score(col("score"), col("key"), k).as("topk"))
      .select(col("q_id"), posexplode(col("topk")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key").cast("long").as("doc_id"), col("col.score").as("score"))
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------
  // Bigram-LM perplexity gate (CCNet-style quality scoring)
  // ---------------------------------------------------------------

  /** Add-one-smoothed bigram language model: train on the even-doc_id
    * half of the corpus, score EVERY document (≥2 tokens) by its
    * average negative log-likelihood per bigram (log-perplexity; the
    * exp is left to the consumer — e^x is the one op whose libm
    * spelling differs across engines).
    *
    * P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), V = training vocab.
    *
    * SCALE SHAPE: bigrams are generated map-side (an index explode
    * over the token array — no joins, no pair space); the count
    * tables are vocab-bounded aggregates of skinny rows; scoring is
    * a broadcast join of those counts onto the bigram stream (drop
    * the hint and AQE picks a shuffle join when the model outgrows
    * broadcast range), and the per-doc reduction is a map-side
    * partial DECIMAL sum. The corpus text itself never shuffles. */
  def lmPerplexity(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    // map-side bigrams: explode positions 1..len-1, pair (w_i, w_i+1);
    // <2-token docs produce no bigrams and are absent from the output
    val bg = d.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
      .select(col("doc_id"),
        element_at(col("toks"), col("i")).as("w1"),
        element_at(col("toks"), col("i") + 1).as("w2"))
    val train = bg.filter(col("doc_id") % 2 === 0)
    val c2 = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = d.filter(col("doc_id") % 2 === 0)
      .select(explode(col("toks")).as("token"))
      .agg(countDistinct(col("token")).as("v"))
    val nll = bg
      .join(broadcast(c2), Seq("w1", "w2"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("nll", roundTo(-log(
        (coalesce(col("c2"), lit(0L)) + 1.0) /
          (coalesce(col("c1"), lit(0L)) + col("v"))), 6))
    nll.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("nll").cast("decimal(28,6)")).cast("double") /
          count(lit(1))).as("a0"))
      .select(col("doc_id"), col("n_bigrams"), roundTo(col("a0"), 4).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // Curriculum phasing — frozen-threshold deployment form
  // ---------------------------------------------------------------

  /** THE FROZEN CURRICULUM ARTIFACT (VERDICT r13 #7): one row
    * (vmin, t1, t2) — the min-shift anchor and the two HDR-sketch
    * tercile thresholds over basis-point difficulty, exactly the
    * values q_curriculum derives inline (StreamingSpec pins the two
    * spellings doc-for-doc). A deployment fits this once per corpus
    * snapshot and ships it to [[curriculumWith]]; like
    * [[Dsir.ratioTable]], REFITTING per micro-batch would let new
    * data shift every document's phase. Input: any frame carrying
    * `avg_nll` (the [[lmPerplexity]] difficulty proxy). */
  def curriculumThresholds(scored: DataFrame): DataFrame = {
    val v = scored.select(floor(col("avg_nll") * 10000).cast("long").as("v"))
    val mn = v.agg(min(col("v")).as("vmin"))
    v.crossJoin(broadcast(mn))
      .groupBy(col("vmin"))
      .agg(graft.functions.hdr_sketch(
        graft.functions.hdr_bucket_lo(col("v") - col("vmin"))).as("sk"))
      .select(col("vmin"),
        graft.functions.hdr_quantile(col("sk"), 0.33).as("t1"),
        graft.functions.hdr_quantile(col("sk"), 0.66).as("t2"))
  }

  /** FROZEN-THRESHOLD phase assignment — the streaming deployment
    * path (the [[Dsir.scoreWith]] precedent): the 1-row threshold
    * table collects once (bounded control plane) and phases apply as
    * a PURE PROJECTION — no join, no aggregation, no state, composes
    * with any streaming pipeline. Internal column __cur_-prefixed so
    * caller columns pass through. */
  def curriculumWith(scored: DataFrame, thresholds: DataFrame): DataFrame = {
    val r = thresholds.select(col("vmin").cast("long"),
      col("t1").cast("long"), col("t2").cast("long")).collect()
    require(r.length == 1,
      s"curriculumWith: expected ONE threshold row, got ${r.length} — " +
        "the table must come from curriculumThresholds")
    val (vmin, t1, t2) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    scored
      .withColumn("__cur_sv",
        floor(col("avg_nll") * 10000).cast("long") - lit(vmin))
      .withColumn("phase",
        when(col("__cur_sv") <= t1, 0)
          .when(col("__cur_sv") <= t2, 1).otherwise(2))
      .drop("__cur_sv")
  }

  // ---------------------------------------------------------------
  // Hybrid retrieval: BM25 ⊕ hashed-embedding cosine via RRF
  // ---------------------------------------------------------------

  /** Per-leg candidate depth and final fusion size for
    * q_hybrid_search, plus the standard reciprocal-rank-fusion
    * constant (60.0 — exactly representable, same literal in both
    * engines). */
  val HybridK = 20
  val HybridFinal = 10
  val RrfC = 60.0

  /** (doc_id, token, tf) term frequencies — the shared first stage of
    * the hashed-embedding pipeline (one tokenize + one keyed
    * aggregate; empty tokens die before the shuffle). */
  private def docTermFreq(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))

  /** Skinny (doc_id, dim, val) feature-hashed tf-idf embeddings — the
    * single definition behind q_hash_embed AND the semantic leg of
    * q_hybrid_search (one spelling, the can't-desynchronize
    * discipline). */
  def hashEmbedSkinny(docs: DataFrame): DataFrame = {
    val tf = docTermFreq(docs)
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    tf.join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        (TextOps.hash60(col("token")) % 64).as("dim"),
        roundTo(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6)
          .as("w"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(roundTo(sum(col("w").cast("decimal(28,6)")).cast("double"), 4)
        .as("val"))
  }

  /** [[hashEmbedSkinny]] restricted to an id frame BEFORE the per-doc
    * work (OPTIMIZATION r19, guide §2.3 — project/filter before the
    * exchange): `hashEmbedSkinny(docs).join(ids)` aggregates the WHOLE
    * corpus into (doc_id, dim) vectors and then throws away all but
    * the candidate rows — Catalyst cannot push a join below an
    * aggregate. Here the id restriction lands on the tf stream
    * instead, so only candidate docs' term rows reach the tf-idf
    * projection and the dim aggregate. df / n_docs still come from
    * the FULL corpus (identical values — the restriction moves work,
    * not semantics; the shared tf exchange is computed once and
    * reused by the df branch at runtime). `ids` carries the caller's
    * broadcast-vs-shuffle decision. */
  private[ops] def hashEmbedSkinnyFor(docs: DataFrame, ids: DataFrame): DataFrame = {
    val tf = docTermFreq(docs)
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    tf.join(ids.select(col("doc_id")), Seq("doc_id"))
      .join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        (TextOps.hash60(col("token")) % 64).as("dim"),
        roundTo(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6)
          .as("w"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(roundTo(sum(col("w").cast("decimal(28,6)")).cast("double"), 4)
        .as("val"))
  }

  /** HYBRID SEARCH — the modern retrieval-serving shape: a lexical
    * BM25 leg and a semantic embedding leg retrieve top-[[HybridK]]
    * candidates independently, and reciprocal-rank fusion
    * (Σ 1/(60+rank), the TREC-standard combiner — robust to the two
    * legs' incomparable score scales) merges them into one top-
    * [[HybridFinal]] list. The semantic leg is the corpus's own
    * hashed tf-idf embedding space ([[hashEmbedSkinny]]) scored by
    * cosine against the query's tf-idf vector under corpus df — a
    * model-free dense leg that still surfaces documents sharing no
    * exact query term (hash collisions aside, any token co-hashing
    * with a query term's dimension contributes).
    *
    * SCALE SHAPE: each leg is the already-audited retrieval plan
    * (BM25: term-filtered posting shuffle + broadcast stats; cosine:
    * skinny dim-join against a ≤64-row broadcast query vector +
    * per-doc decimal sums). Both legs end in TakeOrdered top-K; the
    * fusion joins two K-row lists and ranks ≤2K rows — the window
    * runs over candidates, never the corpus. sqrt is IEEE-exact in
    * both engines (unlike exp/ln it is correctly rounded by spec),
    * so cosine parity needs only the usual round-then-decimal-sum
    * treatment of the dot product and norms.
    *
    * The full fused candidate frame (pre-limit) is [[rrfFused]] —
    * shared by [[hybridSearch]] (top-[[HybridFinal]]) and
    * [[mmrRerank]] (top-[[HybridK]] diversity re-rank), one spelling. */
  private def rrfFused(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val lex = bm25TopK(docs, terms, HybridK)
      .select(col("doc_id"), col("rnk").as("r_lex"))

    // the embedding subtree is recomputed by its consumers rather
    // than persisted: materializing the exploded (doc_id, token, tf)
    // frame measured SLOWER (4.6 s vs 3.0 s at sf0.1) than re-running
    // the codegen'd tokenize — the cache write breaks whole-stage
    // pipelines and serializes the widest frame in the plan
    val vecs = hashEmbedSkinny(docs)
    val n = docs.select(count(lit(1)).as("n_docs"))
    // query tf-idf vector: qtf = 1 per distinct term, corpus idf.
    // df of the (few) query terms comes from a term-filtered explode
    // — same value as the full-vocab df (docs containing the term),
    // a fraction of the cost; terms absent from the corpus
    // contribute nothing (no df row). (r19: a df-from-the-tf-frame
    // respelling was tried to share the tf exchange with `vecs`; the
    // executed plan showed the exchange is NOT reused — the pushed
    // token filter changes it — and the wall moved within noise, so
    // the filter-before-explode original stands.)
    val qdf = docs.select(explode(array_distinct(
        filter(tokens(col("text")), t => t.isInCollection(terms)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val qVec = qdf
      .crossJoin(broadcast(n))
      .select((TextOps.hash60(col("token")) % 64).as("dim"),
        roundTo(log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6).as("w"))
      .groupBy(col("dim"))
      .agg(roundTo(sum(col("w").cast("decimal(28,6)")).cast("double"), 4)
        .as("qval"))
    def sq(c: Column): Column = roundTo(c, 8).cast("decimal(38,8)")
    val qNorm = qVec
      .agg(sqrt(sum(sq(col("qval") * col("qval"))).cast("double")).as("qnorm"))
    // ONE pass over the doc vectors computes norm AND dot: the ≤64-row
    // query vector broadcast-left-joins on dim, non-query dims
    // contribute 0 to the dot (exactly — round8(0) is 0 in decimal),
    // and `hit` preserves the original candidate set (docs sharing ≥1
    // dim with the query), so the fused aggregate is plan-for-plan
    // cheaper with identical semantics
    val agg = vecs.join(broadcast(qVec), Seq("dim"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sqrt(sum(sq(col("val") * col("val"))).cast("double")).as("dnorm"),
        sum(sq(coalesce(col("val") * col("qval"), lit(0.0)))).cast("double").as("dot"),
        max(when(col("qval").isNotNull, lit(1)).otherwise(lit(0))).as("hit"))
    val cos = agg.filter(col("hit") === 1).crossJoin(broadcast(qNorm))
      .filter(col("dnorm") * col("qnorm") > 0)
      .select(col("doc_id"), roundTo(col("dot") / (col("dnorm") * col("qnorm")), 6).as("cos"))
    val sem = cos.orderBy(col("cos").desc, col("doc_id").asc).limit(HybridK)
      .withColumn("r_sem", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("r_sem"))

    def leg(r: Column): Column =
      roundTo(when(r.isNotNull, lit(1.0) / (lit(RrfC) + r.cast("double")))
        .otherwise(lit(0.0)), 9)
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_lex"), col("r_sem"),
        roundTo(leg(col("r_lex")) + leg(col("r_sem")), 9).as("rrf"))
  }

  def hybridSearch(docs: DataFrame, terms: Seq[String]): DataFrame =
    rrfFused(docs, terms)
      .orderBy(col("rrf").desc, col("doc_id").asc).limit(HybridFinal)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("rank"), col("rrf"), col("r_lex"), col("r_sem"))
      .orderBy("rank")

  /** MMR trade-off weight (λ): relevance vs diversity. 0.5 is exactly
    * representable in binary, so λ·rel and (1−λ)·sim are the same
    * IEEE ops in both engines. */
  val MmrLambda = 0.5

  /** Final list size of [[mmrRerank]]. */
  val MmrFinal = 10

  /** MAXIMAL-MARGINAL-RELEVANCE diversity re-rank (VERDICT r12 #6) —
    * production retrieval dedups near-identical hits: of two
    * near-copies both scoring top, only one should reach the user.
    * Over the top-[[HybridK]] fused candidates of [[rrfFused]], pick
    * greedily by mmr(c) = λ·rrf(c) − (1−λ)·max cosine of c to the
    * already-picked set (Carbonell & Goldstein, SIGIR 1998), ties by
    * doc_id — the first pick (empty set, max term 0) is the pure
    * relevance leader.
    *
    * SCALE SHAPE: candidate similarity is computed in the SAME hashed
    * tf-idf space as the semantic leg, with the vectors
    * candidate-restricted BEFORE the pair join — the pair space is
    * ≤ K(K−1)/2 = 190 rows, never a corpus shuffle; the greedy fold
    * runs on the driver over ≤ K rel rows + those sims (bounded
    * control plane, the q_corpus_drift pattern) and returns a
    * LocalRelation. The DuckDB twin replays the fold as a linear
    * recursive CTE over per-candidate similarity lists. Rounding
    * ladder: rrf at 9 (fusion), pairwise cosine at 6 (the hybrid cos
    * rule), mmr scores at 9. */
  /** Pairwise hashed-tf-idf cosine among a SMALL id set (a, b, cos
    * with a < b; pairs sharing no dimension are absent = similarity
    * 0): the vectors are id-restricted BEFORE the pair join, so the
    * pair space is |ids|²-bounded, never a corpus shuffle. Shared by
    * [[mmrRerank]] and the q_mmr_diversity gauge. NOT persisted: the
    * self-join's identical embed subtrees land as ReusedExchange in
    * one action, and a cache write measured SLOWER (6.1 s vs 5.2 s at
    * sf0.1) — the hybridSearch lesson. */
  private def pairwiseCos(docs: DataFrame, ids: DataFrame): DataFrame = {
    // OPTIMIZATION r19: restriction moved below the tf stage
    // ([[hashEmbedSkinnyFor]]) — the old spelling dim-aggregated the
    // whole corpus and then kept ≤K docs (plans/r19/q_mmr_*_before).
    val cvecs = hashEmbedSkinnyFor(docs,
      broadcast(ids.select(col("doc_id"))))
    def sq(c: Column): Column = roundTo(c, 8).cast("decimal(38,8)")
    val norms = cvecs.groupBy(col("doc_id"))
      .agg(sqrt(sum(sq(col("val") * col("val"))).cast("double")).as("nrm"))
    cvecs.select(col("doc_id").as("a"), col("dim"), col("val").as("va"))
      .join(cvecs.select(col("doc_id").as("b"), col("dim"), col("val").as("vb")),
        Seq("dim"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(sum(sq(col("va") * col("vb"))).cast("double").as("dot"))
      .join(norms.select(col("doc_id").as("a"), col("nrm").as("na")), Seq("a"))
      .join(norms.select(col("doc_id").as("b"), col("nrm").as("nb")), Seq("b"))
      .filter(col("na") * col("nb") > 0)
      .select(col("a"), col("b"),
        roundTo(col("dot") / (col("na") * col("nb")), 6).as("cos"))
  }

  /** The collected MMR working set: candidate relevance, symmetric
    * pairwise sims (absent = 0), and the greedy pick order — ONE
    * pipeline run serves [[mmrRerank]] AND the q_mmr_diversity gauge
    * (both top-5 sets are subsets of the top-[[HybridK]] candidates,
    * so their pairwise sims are a sub-map of this one). */
  private def mmrCore(docs: DataFrame, terms: Seq[String])
      : (Seq[(Long, Double, Double)], Map[Long, Double],
         Map[(Long, Long), Double]) = {
    val cands = rrfFused(docs, terms)
      .orderBy(col("rrf").desc, col("doc_id").asc).limit(HybridK)
      .select(col("doc_id"), col("rrf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = pairwiseCos(docs, cands)

    // bounded driver fold: ≤ K rel rows, ≤ K(K−1)/2 sims
    val rel = cands.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sim = scala.collection.mutable.HashMap.empty[(Long, Long), Double]
    pairs.collect().foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      sim((a, b)) = c
      sim((b, a)) = c
    }
    cands.unpersist(false)
    (mmrGreedy(rel, sim.toMap, MmrFinal), rel, sim.toMap)
  }

  /** THE greedy MMR fold — one definition behind the driver-side
    * single-query path ([[mmrCore]]) and the executor-side per-group
    * fold of [[mmrBatch]] (can't-desynchronize). Pure function of a
    * ≤K-entry rel map + symmetric sim map; round-9 ladder matches
    * the oracle's recursion; ties by doc_id asc. */
  private[ops] def mmrGreedy(rel: Map[Long, Double],
      sim: Map[(Long, Long), Double], k: Int): Seq[(Long, Double, Double)] = {
    val s9 = math.pow(10, 9) // roundTo's exact ladder
    def r9(x: Double): Double = math.floor(x * s9 + 0.5) / s9
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val pickedIds = scala.collection.mutable.HashSet.empty[Long]
    while (picked.size < k && pickedIds.size < rel.size) {
      val best = rel.iterator
        .filter { case (id, _) => !pickedIds(id) }
        .map { case (id, rl) =>
          val maxSim = picked.iterator
            .map(p => sim.getOrElse((id, p._1), 0.0))
            .foldLeft(0.0)(math.max)
          (id, r9(MmrLambda * rl - (1 - MmrLambda) * maxSim), rl)
        }
        .minBy { case (id, m, _) => (-m, id) }
      picked += best
      pickedIds += best._1
    }
    picked.toSeq
  }

  def mmrRerank(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    val (picked, _, _) = mmrCore(docs, terms)
    val rows = picked.zipWithIndex.map { case ((id, m, rl), i) =>
      org.apache.spark.sql.Row(id, (i + 1).toLong, m, rl)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("rank", LongType, nullable = false),
        StructField("mmr_score", DoubleType, nullable = false),
        StructField("rrf", DoubleType, nullable = false))))
  }

  /** q_mmr_diversity off ONE [[mmrCore]] run: redundancy (mean
    * pairwise cosine, absent pairs = 0, k(k−1)/2 denominator) of the
    * relevance top-5 vs the MMR top-5. Driver arithmetic over the
    * already-collected candidate sims; decimal-summed like the
    * engine-side spelling so the oracle matches bit-for-bit. */
  def mmrDiversity(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    val (picked, rel, sim) = mmrCore(docs, terms)
    val hy5 = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(5).map(_._1)
    val mm5 = picked.take(5).map(_._1)
    val s6 = math.pow(10, 6)
    def r6(x: Double): Double = math.floor(x * s6 + 0.5) / s6
    def gauge(tag: String, ids: Seq[Long]): org.apache.spark.sql.Row = {
      val k = ids.length.toLong
      val nPairs = k * (k - 1) / 2
      // exact decimal sum of the round6 sims (BigDecimal — the same
      // multiset the SQL DECIMAL(18,6) sum adds)
      val sc = ids.combinations(2).map { case Seq(a, b) =>
        // HALF_UP to 6 = the engines' double→DECIMAL(18,6) cast
        BigDecimal(sim.getOrElse((a, b), 0.0)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)
      }.foldLeft(BigDecimal(0))(_ + _)
      val avg = if (nPairs > 0) r6(sc.toDouble / nPairs.toDouble) else 0.0
      org.apache.spark.sql.Row(tag, k, nPairs, avg)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(gauge("hybrid", hy5), gauge("mmr", mm5)),
      StructType(Seq(
        StructField("variant", StringType, nullable = false),
        StructField("k", LongType, nullable = false),
        StructField("n_pairs", LongType, nullable = false),
        StructField("avg_pairwise_cos", DoubleType, nullable = false))))
  }

  /** BATCH MMR SERVING (VERDICT r13 #3) — [[mmrRerank]] re-ranks ONE
    * query with two corpus-scale scans; a retrieval product re-ranks
    * EVERY query. This is the per-query-frame form: the bm25Batch
    * query frame (doc_id ≡ 0 mod 100, terms at positions 1/5/9)
    * retrieves per-query top-[[HybridK]] candidates through the
    * bounded-state topk aggregate, relevance is the single-leg RRF
    * transform round9(1/(60+rank)) (the same score scale λ was tuned
    * against), and the greedy fold runs PER QUERY in a flatMapGroups
    * over ≤[[HybridK]]-row groups (the FFD precedent — random-access
    * picked-set state, executor-side, no driver traffic).
    *
    * SCALE SHAPE: one corpus scan feeds the candidate retrieval and
    * one feeds the shared embedding space — independent of query
    * count (vs ~2 scans PER query in the single-query form). The
    * candidate-pair space is |queries| × K(K−1)/2 (never
    * corpus-scale): vectors are candidate-restricted BEFORE the pair
    * join and the self-join is keyed on (q_id, dim). Sim lists ride
    * a sort_array(collect_list) per (q_id, candidate) — ≤K−1 entries
    * each, deterministic order. */
  /** Distinct-candidate-id ceiling for [[mmrBatch]]'s broadcast
    * restriction: 4M long ids ≈ 64 MB of hash-relation — past this
    * the id set rides a shuffle instead (still candidate-restricted;
    * only the join STRATEGY degrades). */
  val MmrBatchBroadcastIdCap = 4_000_000L

  def mmrBatch(docs: DataFrame, queryMod: Int = 100): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // EAGER CHECKPOINT of the candidate frame: ≤ queries×K rows
    // feeding THREE consumers (distinct ids, the vector join, the
    // grouped fold) — without it each consumer re-expands the whole
    // BM25-batch subtree (~8 subtree copies in the physical plan;
    // measured 8.0 s → see NOTES_r14). Bounded: a serving batch's
    // candidate list, not corpus-scale.
    val cands = bm25Batch(docs, HybridK, queryMod)
      .select(col("q_id"), col("doc_id"),
        roundTo(lit(1.0) / (lit(RrfC) + col("rank").cast("double")), 9)
          .as("rel"))
      .localCheckpoint(true)
    val ids = cands.select(col("doc_id")).distinct()
    // candidate-restricted shared embedding space (one hashEmbed
    // subtree). The broadcast bound is |queries|·K distinct ids —
    // bounded ONLY while the external query batch is (ADVICE r14:
    // the declared fixture derives queries from the corpus at 1%,
    // so the id set grows linearly with corpus size there). Guard
    // with an exact count off the checkpointed candidate frame
    // (cheap: flat plan, skinny column) and fall back to a shuffle
    // restriction once the set leaves the broadcast band — the join
    // then ships candidate-doc vectors only, never the corpus.
    val idsSmall = ids.count() <= MmrBatchBroadcastIdCap
    // OPTIMIZATION r19: id restriction below the tf stage (see
    // [[hashEmbedSkinnyFor]]) — only candidate docs reach the dim
    // aggregate; the broadcast-vs-shuffle guard is unchanged.
    val vecs = hashEmbedSkinnyFor(docs,
      if (idsSmall) broadcast(ids) else ids)
    def sq(c: Column): Column = roundTo(c, 8).cast("decimal(38,8)")
    val norms = vecs.groupBy(col("doc_id"))
      .agg(sqrt(sum(sq(col("val") * col("val"))).cast("double")).as("nrm"))
    val qv = cands.select(col("q_id"), col("doc_id")).join(vecs, Seq("doc_id"))
    val pairs = qv.select(col("q_id"), col("doc_id").as("a"), col("dim"),
        col("val").as("va"))
      .join(qv.select(col("q_id"), col("doc_id").as("b"), col("dim"),
        col("val").as("vb")), Seq("q_id", "dim"))
      .filter(col("a") < col("b"))
      .groupBy(col("q_id"), col("a"), col("b"))
      .agg(sum(sq(col("va") * col("vb"))).cast("double").as("dot"))
      .join(norms.select(col("doc_id").as("a"), col("nrm").as("na")), Seq("a"))
      .join(norms.select(col("doc_id").as("b"), col("nrm").as("nb")), Seq("b"))
      .filter(col("na") * col("nb") > 0)
      .select(col("q_id"), col("a"), col("b"),
        roundTo(col("dot") / (col("na") * col("nb")), 6).as("cos"))
    val sym = pairs
      .union(pairs.select(col("q_id"), col("b").as("a"), col("a").as("b"),
        col("cos")))
    val simLists = sym.groupBy(col("q_id"), col("a"))
      .agg(sort_array(collect_list(struct(col("b").as("_1"),
        col("cos").as("_2")))).as("sims"))
      .withColumnRenamed("a", "doc_id")
    val grouped = cands.join(simLists, Seq("q_id", "doc_id"), "left")
      .select(col("q_id"), col("doc_id"), col("rel"),
        coalesce(col("sims"),
          array().cast("array<struct<_1:bigint,_2:double>>")).as("sims"))
      .as[(Long, Long, Double, Seq[(Long, Double)])]
    grouped.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val rows = it.toArray // ≤ HybridK rows per group
        val rel = rows.map(r => r._2 -> r._3).toMap
        val sim = rows.iterator.flatMap(r =>
          r._4.iterator.map { case (b, c) => (r._2, b) -> c }).toMap
        mmrGreedy(rel, sim, MmrFinal).iterator.zipWithIndex.map {
          case ((id, m, rl), i) => (qid, (i + 1).toLong, id, m, rl)
        }
      }
      .toDF("q_id", "rank", "doc_id", "mmr_score", "rel")
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------
  // Multi-round BPE merge learning
  // ---------------------------------------------------------------

  /** Greedy left-to-right application of ONE merge (a, b) → "ab" to a
    * symbol array — the standard BPE merge fold ("aaa" under (a,a)
    * becomes ["aa","a"], not ["a","aa"]). */
  private[ops] def mergePairFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn a BPE merge table: `rounds` iterations of (count
    * frequency-weighted adjacent symbol pairs over the VOCABULARY →
    * take the most frequent pair, ties broken (a asc, b asc) → merge
    * it everywhere). q_bpe_merges declares round one; this is the
    * full training loop.
    *
    * SCALE SHAPE: after the single corpus pass that aggregates the
    * (token, freq) vocabulary, every round runs over vocab-sized data
    * only — pair counting is a map-side explode + skinny aggregate,
    * the winner is a 1-row TakeOrdered, and the merge application is
    * a map-side fold. Each round's vocabulary materializes behind a
    * FLAT plan (`shims.materializedWithHandle` — the Graph-loop
    * discipline) and the previous round's blocks unpersist as soon as
    * the next lands, so the loop holds at most two vocabulary copies;
    * a localCheckpoint-per-round loop would leave O(rounds) copies to
    * driver-GC timing, exactly the failure mode Graph.scala
    * documents. Stops early when no adjacent pairs remain. */
  def learnBpeMerges(docs: DataFrame, rounds: Int): Seq[(String, String)] = {
    require(rounds >= 1, s"rounds=$rounds")
    val shims = org.apache.spark.sql.graft.shims
    var (vocab, handle) = shims.materializedWithHandle(docs
      .select(explode(tokens(col("text"))).as("token"))
      .filter(length(col("token")) >= 2)
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), split(col("token"), "").as("syms")))
    handle.count()
    val merges = scala.collection.mutable.Buffer.empty[(String, String)]
    var done = false
    var r = 0
    while (r < rounds && !done) {
      val best = vocab
        // fully-merged tokens (one symbol) have no pairs — and
        // sequence(1, 0) would count DOWN, not empty (the lmPerplexity
        // guard)
        .filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val (nv, nh) = shims.materializedWithHandle(vocab
          .select(col("freq"), mergePairFold(col("syms"), a, b).as("syms")))
        nh.count()
        handle.unpersist(blocking = false)
        vocab = nv
        handle = nh
      }
      r += 1
    }
    handle.unpersist(blocking = false)
    merges.toSeq
  }

  /** Merge-table size for q_bpe_encode / q_bpe_pack — interpolated
    * into the oracle's chained-CTE learning replay (the MinhashK
    * can't-desynchronize pattern). Small on purpose: each round is a
    * full vocab re-fold in BOTH engines, and four rounds already
    * exercise multi-symbol merges (a round-2+ winner can contain a
    * round-1 merge). */
  val BpeEncodeRounds = 4

  /** Greedy application of a learned merge table IN LEARNED ORDER to
    * a symbol-array column — the standard BPE encode step (each merge
    * is one [[mergePairFold]] pass; a later merge sees the earlier
    * merges' output symbols). */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (acc, (a, b)) => mergePairFold(acc, a, b) }

  /** The learned merge table, memoized per (session, dir, rounds):
    * learning is rounds+1 vocab-frame jobs and both q_bpe_encode and
    * q_bpe_pack consume the identical table — the corpus-stage memo
    * discipline ([[graft.ops.Memo]]). */
  private def bpeMergesMemo(s: SparkSession, dir: String,
      rounds: Int): Seq[(String, String)] =
    graft.ops.Memo.stage(s, dir, s"bpe_merges_$rounds") {
      learnBpeMerges(Tables.documents(s, dir), rounds)
    }

  /** CLOSE THE TOKENIZER LOOP (r9 verdict #3): the corpus encoded
    * under its own learned BPE vocabulary, at VOCABULARY granularity
    * — (token, freq, n_pieces, encoded). The merge table collects
    * driver-side (rounds rows — operator metadata, not data), and the
    * encode is a map-side fold over the DISTINCT vocabulary: at
    * 100 TB the fold runs once per unique token, not once per token
    * occurrence, and the result is the vocab-sized lookup table a
    * pipeline broadcasts wherever occurrence-level encoding is
    * needed ([[bpePackCounts]] does exactly that). */
  def bpeEncodeVocab(s: SparkSession, dir: String, rounds: Int): DataFrame = {
    val merges = bpeMergesMemo(s, dir, rounds)
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .filter(length(col("token")) >= 2)
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", applyMerges(split(col("token"), ""), merges))
      .select(col("token"), col("freq"),
        size(col("syms")).cast("long").as("n_pieces"),
        array_join(col("syms"), " ").as("encoded"))
  }

  /** The PIECE LEXICON under a learned merge table: every distinct
    * final piece the corpus vocabulary encodes to (multi-char pieces
    * are exactly merge products; 1-char tokens are their own piece),
    * sorted lexicographically — id = position. Bounded by |alphabet|
    * + rounds, so collecting it is operator metadata, not data; the
    * derivation runs the fold once per DISTINCT token (the
    * [[bpeEncodeVocab]] vocab-granularity discipline). */
  def bpePieceLexicon(docs: DataFrame,
      merges: Seq[(String, String)]): Array[String] = {
    import docs.sparkSession.implicits._
    docs.select(explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "").distinct()
      .select(explode(when(length(col("token")) >= 2,
        applyMerges(split(col("token"), ""), merges))
        .otherwise(array(col("token")))).as("piece"))
      .distinct().orderBy("piece").as[String].collect()
  }

  /** MATERIALIZE THE TOKENIZED CORPUS (VERDICT r13 #4) — the per-doc
    * token-id arrays a trainer actually consumes: (doc_id,
    * ids array<int>, n_ids), ids in document order under the learned
    * vocabulary ([[bpePieceLexicon]] positions). Docs with zero
    * non-empty tokens are absent (the lmPerplexity absent-rows
    * rule). */
  def bpeTokens(s: SparkSession, dir: String, rounds: Int): DataFrame = {
    val docs = Tables.documents(s, dir)
    val merges = bpeMergesMemo(s, dir, rounds)
    bpeTokensFrom(docs, merges, bpePieceLexicon(docs, merges))
  }

  /** Frame-level core of [[bpeTokens]] — a PURE PROJECTION through
    * the native [[graft.functions.BpeEncodeIds]] expression (one call
    * per document, per-task distinct-token memo), so the corpus text
    * NEVER shuffles and the stage composes with any streaming
    * pipeline (the scoreWith discipline — no join, no aggregation,
    * no state). Two rejected spellings, both measured (NOTES_r14): a
    * broadcast (token → ids) table + per-doc regroup exchanged ~16 B
    * per corpus TOKEN (90 s / 222M ids at probe scale); the
    * interpreted-HOF in-row fold exchanged nothing but paid
    * ~2 µs/token in lambda evaluation (20.5 s at sf0.1). Ids live in
    * the byte-reserved space ([[graft.functions.BpeEncodeIds.ByteIdOffset]]
    * + lexicon position); pieces outside `lexicon` (a stream token
    * unseen at freeze time) decompose to their UTF-8 bytes as ids
    * 0–255 — TOTAL coverage, the property real tokenizers guarantee
    * (VERDICT r14 #3; the previous null-id contract silently
    * inflated n_ids on unseen tokens). */
  def bpeTokensFrom(docs: DataFrame, merges: Seq[(String, String)],
      lexicon: Array[String]): DataFrame =
    docs
      .select(col("doc_id"), graft.functions.bpe_encode_ids(
        tokens(col("text")), merges, lexicon.toSeq).as("ids"))
      .filter(size(col("ids")) >= 1)
      .select(col("doc_id"), col("ids"),
        size(col("ids")).cast("long").as("n_ids"))

  /** Per-document token counts under the LEARNED BPE vocabulary —
    * the "real token counts" feeding sequence packing, defined AS
    * [[bpeTokens]]'s n_ids (VERDICT r13 #4: packing runs on real
    * tokenizer output, one spelling — the count IS the id array's
    * length, map-side like everything else in the encode lane). */
  def bpePackCounts(s: SparkSession, dir: String, rounds: Int): DataFrame =
    bpeTokens(s, dir, rounds).select(col("doc_id"), col("n_ids").as("n"))

  // ---------------------------------------------------------------
  // PII detection / redaction
  // ---------------------------------------------------------------

  /** Patterns restricted to syntax with IDENTICAL semantics in Java
    * regex and DuckDB's RE2: character classes, +, {m,n} — no \b, no
    * lookaround, no engine-specific escapes. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** Deterministic PII fixture: the synthetic corpus carries no PII,
    * so plant id-derived addresses/hosts/numbers (the image-fixture
    * discipline — the oracle restates the same concatenation, so a
    * detector that miscounts or a redactor that leaves a residue
    * hash-mismatches). */
  def piiText(text: Column, docId: Column): Column = concat(text,
    when(docId % 5 === 0, concat(lit(" contact user"),
      docId.cast("string"), lit("@example.com now")))
      .when(docId % 5 === 1, concat(lit(" from host 10."),
        (docId % 256).cast("string"), lit(".0."),
        (docId % 100).cast("string"), lit(" logged")))
      .when(docId % 5 === 2, concat(lit(" call +1-555-"),
        lpad((docId % 10000).cast("string"), 4, "0"),
        lit(" or mail ops"), docId.cast("string"), lit("@example.org")))
      .otherwise(lit("")))

  /** SQL twin of [[piiText]] for the oracle. */
  def piiTextSql: String =
    """concat(text,
      | CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
      |      WHEN doc_id % 5 = 1 THEN ' from host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) || ' logged'
      |      WHEN doc_id % 5 = 2 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' or mail ops' || CAST(doc_id AS VARCHAR) || '@example.org'
      |      ELSE '' END)""".stripMargin

  /** Per-document PII counts + the md5 of the redacted text
    * (redaction order: email → ip → phone, stated identically in the
    * oracle). Entirely map-side — the only exchange is the
    * presentation sort; at 100 TB this is a single pass over the
    * text with codegen'd regex ops, no shuffle at all. */
  def piiRedact(docs: DataFrame): DataFrame = {
    val t = piiText(col("text"), col("doc_id"))
    docs.select(
        col("doc_id"),
        regexp_count(t, lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(t, lit(IpRe)).cast("long").as("n_ip"),
        regexp_count(t, lit(PhoneRe)).cast("long").as("n_phone"),
        md5(regexp_replace(regexp_replace(regexp_replace(t,
          lit(EmailRe), lit("<EMAIL>")),
          lit(IpRe), lit("<IP>")),
          lit(PhoneRe), lit("<PHONE>"))).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // Declared queries + oracles
  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full-text BM25 retrieval, top-10 for a fixed 4-term query.
    "q_bm25_search" -> ((s, dir) =>
      bm25TopK(Tables.documents(s, dir), BmTerms, 10)),

    // Batch BM25 serving over a query frame, top-5 per query.
    "q_bm25_batch" -> ((s, dir) =>
      bm25Batch(Tables.documents(s, dir), 5)),

    // LM-perplexity quality gate: train-on-half, score-all.
    "q_lm_perplexity" -> ((s, dir) =>
      lmPerplexity(Tables.documents(s, dir))),

    // CURRICULUM PHASING — easy-to-hard training-order assignment by
    // the LM-perplexity difficulty proxy: phase 0 = easiest tercile,
    // 2 = hardest. The tercile THRESHOLDS come from the engine's own
    // HDR quantile sketch over basis-point nll (guaranteed 1/64
    // relative error, bounded state, mergeable) — at 100 TB the
    // per-doc difficulty frame is billions of rows and an exact
    // percentile would sort it; the sketch never does. One scoring
    // pass, one bounded-state aggregation, a 1-row threshold
    // broadcast, map-side phase assignment.
    "q_curriculum" -> ((s, dir) => {
      // NOT persisted despite three consumers (min, sketch, final):
      // measured 2.6 s persisted vs 1.9 s lazy at sf0.1 — the
      // broadcast subqueries reuse the scoring exchange, and the
      // cache write + extra materialization job cost more than the
      // re-read (the hybridSearch/mmrRerank lesson, third sighting)
      val ppl = lmPerplexity(Tables.documents(s, dir))
        .withColumn("v", floor(col("avg_nll") * 10000).cast("long"))
      // MIN-SHIFT before sketching: log buckets are RELATIVELY sized,
      // and a corpus's nll distribution is narrow (≈3.2–3.6 here) —
      // unshifted, the whole corpus lands in a handful of wide
      // buckets and the terciles go coarse. Shifted to the origin the
      // low buckets are width-1 (exact) and resolution follows the
      // distribution's spread, not its offset. One extra 1-row
      // broadcast.
      val mn = ppl.agg(min(col("v")).as("vmin"))
      val shifted = ppl.crossJoin(broadcast(mn))
        .withColumn("sv", col("v") - col("vmin"))
      val thr = shifted.agg(graft.functions.hdr_sketch(
          graft.functions.hdr_bucket_lo(col("sv"))).as("sk"))
        .select(graft.functions.hdr_quantile(col("sk"), 0.33).as("t1"),
          graft.functions.hdr_quantile(col("sk"), 0.66).as("t2"))
      shifted.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("avg_nll"),
          when(col("sv") <= col("t1"), 0)
            .when(col("sv") <= col("t2"), 1).otherwise(2).as("phase"))
        .orderBy("doc_id")
    }),

    // PII detect + redact with an end-to-end content hash.
    "q_pii_redact" -> ((s, dir) =>
      piiRedact(Tables.documents(s, dir))),

    // FEATURE-HASHED DOCUMENT EMBEDDINGS (the hashing trick) — the
    // model-free text→vector bridge: each token's TF-IDF mass lands
    // in dimension hash60(token) mod 64, giving every document a
    // deterministic sparse 64-dim embedding with no trained model and
    // no vocabulary table. Output is the SKINNY (doc_id, dim, val)
    // form — the exchange-friendly spelling (densify with a 64-slot
    // fill only at the consumer; the vector lane's cosine/ANN
    // operators take it from there). Shapes: one token explode keyed
    // (doc_id, token) for tf, vocab-sized df re-derived from tf, the
    // corpus size as a broadcast scalar, and a final (doc_id, dim)
    // aggregate of skinny rows — text never shuffles. Per-token
    // scores round to 6 then sum as DECIMAL (order-free), the dim
    // sum rounds to 4.
    "q_hash_embed" -> ((s, dir) =>
      hashEmbedSkinny(Tables.documents(s, dir)).orderBy("doc_id", "dim")),

    // HYBRID RETRIEVAL — BM25 and embedding-cosine legs fused by
    // reciprocal rank (see [[hybridSearch]]).
    "q_hybrid_search" -> ((s, dir) =>
      hybridSearch(Tables.documents(s, dir), BmTerms)),

    // MMR DIVERSITY RE-RANK — greedy λ·rel − (1−λ)·max-sim over the
    // fused top-20 (see [[mmrRerank]]); pair space candidate-bounded,
    // greedy fold on the driver over ≤20 rows.
    "q_mmr_rerank" -> ((s, dir) =>
      mmrRerank(Tables.documents(s, dir), BmTerms)),

    // MMR EFFECTIVENESS GAUGE — the q_ann_recall discipline applied
    // to diversity: the REDUNDANCY of the plain-relevance top-5 vs
    // the MMR top-5 as oracle-checked numbers (mean pairwise cosine,
    // absent pairs = 0, k(k−1)/2 denominator). ONE mmrCore run serves
    // both variants: each top-5 is a subset of the top-20 candidate
    // set whose sims the core already collected.
    "q_mmr_diversity" -> ((s, dir) =>
      mmrDiversity(Tables.documents(s, dir), BmTerms)),

    // BATCH MMR SERVING — every query of the bm25Batch frame
    // re-ranked for diversity in ~two corpus scans total (vs two PER
    // query in the single-query form).
    "q_mmr_batch" -> ((s, dir) =>
      mmrBatch(Tables.documents(s, dir))),

    // BPE TRAINING STEP — the tokenizer-learning primitive: the
    // corpus-frequency-weighted count of adjacent character pairs
    // inside tokens (one merge round of byte-pair encoding; iterate
    // with the winning pair merged to learn a full merge table). The
    // token VOCABULARY aggregates first — map-side partial counts,
    // the shuffle carries (token, freq) — and pairs explode off the
    // DISTINCT vocabulary weighted by freq, so the pair stage is
    // vocab-bounded, not corpus-bounded: at 100 TB the second stage's
    // input is the vocabulary, a set that grows sublinearly in corpus
    // size. Top-20 via TakeOrdered. Both engines index substrings by
    // codepoint (the zh tokens exercise the multibyte path).
    "q_bpe_merges" -> ((s, dir) => {
      val vocab = Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .filter(length(col("token")) >= 2)
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      vocab
        .select(col("freq"),
          explode(transform(sequence(lit(1), length(col("token")) - 1),
            i => col("token").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("weight"))
        .orderBy(col("weight").desc, col("pair").asc)
        .limit(20)
    }),

    // BPE ENCODE — the learned merge table APPLIED (the tokenizer
    // loop closed: q_bpe_merges learns, this encodes). Oracle replays
    // the full [[BpeEncodeRounds]]-round learning AND the greedy
    // merge application as chained CTEs — a wrong tie-break, a wrong
    // fold direction ("aaa" must encode ["aa","a"]), or a
    // codepoint/byte indexing slip all hash-mismatch.
    "q_bpe_encode" -> ((s, dir) =>
      bpeEncodeVocab(s, dir, BpeEncodeRounds).orderBy("token")),

    // SEQUENCE PACKING ON REAL TOKENIZER COUNTS — q_pack_sequences'
    // placement arithmetic driven by the learned-BPE piece counts
    // instead of whitespace-token counts (what an LLM data pipeline
    // actually packs by). Same two-phase distributed prefix sum, same
    // oracle-side window-cumsum replay.
    "q_bpe_pack" -> ((s, dir) =>
      TextOps.packCounts(bpePackCounts(s, dir, BpeEncodeRounds),
        TextOps.PackContext)),

    // THE TOKENIZED CORPUS — per-doc token-id arrays under the
    // learned vocabulary (the artifact a trainer consumes). The
    // declared projection joins ids to a string because the oracle
    // gate compares scalar columns; the operator's array form is
    // spec-pinned equal.
    "q_bpe_tokens" -> ((s, dir) =>
      bpeTokens(s, dir, BpeEncodeRounds)
        .select(col("doc_id"), col("n_ids"),
          array_join(transform(col("ids"), _.cast("string")), " ")
            .as("token_ids"))
        .orderBy("doc_id"))
  )

  private def toksSql = tokensSql("text")

  /** DuckDB replay of [[learnBpeMerges]] + [[applyMerges]] as chained
    * CTEs: s0 = the char-split (token, freq, syms) vocabulary; each
    * round r appends p{r} (frequency-weighted adjacent pairs), m{r}
    * (the winner — max weight, ties (a, b) ascending), s{r} (the
    * vocabulary with the winner merged everywhere by the SAME greedy
    * left-to-right fold as [[mergePairFold]], lifted through
    * list_reduce over singleton-list symbols). Terminal relation:
    * s{rounds}. Requires a relation `tok0(token)` in scope.
    *
    * The winner joins back with LEFT JOIN ON TRUE, not CROSS JOIN: on
    * a degenerate corpus whose vocabulary fully merges before the
    * last round, m{r} is EMPTY and a cross join would annihilate the
    * vocabulary (oracle returns zero rows while Spark's early-stopped
    * learnBpeMerges still encodes everything — review r10); with the
    * left join the null winner makes the fold an identity append and
    * the round is the same no-op as Spark's shorter merge table. */
  private def bpeChainSql(rounds: Int): String = {
    val sb = new StringBuilder(
      s"""v0 AS (SELECT token, count(*) AS freq FROM tok0
         |      WHERE length(token) >= 2 GROUP BY token),
         |s0 AS (SELECT token, freq,
         |         list_transform(range(1, length(token) + 1),
         |           i -> substr(token, CAST(i AS INT), 1)) AS syms
         |       FROM v0)""".stripMargin)
    for (r <- 1 to rounds) {
      val (p, m, prev, cur) = (s"p$r", s"m$r", s"s${r - 1}", s"s$r")
      sb.append(s""",
        |$p AS (SELECT syms[CAST(i AS INT)] AS a,
        |         syms[CAST(i AS INT) + 1] AS b, sum(freq) AS w
        |       FROM $prev, unnest(range(1, len(syms))) AS u(i)
        |       GROUP BY 1, 2),
        |$m AS (SELECT a, b FROM $p ORDER BY w DESC, a ASC, b ASC LIMIT 1),
        |$cur AS (SELECT token, freq,
        |         list_reduce(
        |           list_prepend(CAST([] AS VARCHAR[]),
        |             list_transform(syms, s -> [s])),
        |           (acc, x) -> CASE WHEN len(acc) > 0
        |                         AND acc[-1] = $m.a AND x[1] = $m.b
        |                       THEN list_append(acc[:-2], $m.a || $m.b)
        |                       ELSE list_append(acc, x[1]) END) AS syms
        |       FROM $prev LEFT JOIN $m ON TRUE)""".stripMargin)
    }
    sb.toString
  }

  /** The BM25 scoring chain (CTEs d, stats, ex, fx, tf, df, contrib,
    * scored, ranked) for the fixed [[BmTerms]] — one spelling shared
    * by the q_bm25_search oracle and the lexical leg of the
    * q_hybrid_search oracle. */
  private def bm25ChainSql: String = {
    val termsList = BmTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""d AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |stats AS (SELECT count(*) AS n_docs,
       |    CAST(SUM(len(toks)) AS DOUBLE) / count(*) AS avgdl FROM d),
       |ex AS (
       |  SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM d),
       |fx AS (SELECT * FROM ex WHERE token IN (SELECT unnest($termsList))),
       |tf AS (SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
       |       FROM fx GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |contrib AS (
       |  SELECT tf.doc_id,
       |    ${bmContribSql("tf.tf", "df.df", "tf.dl", "s.n_docs", "s.avgdl")} AS c
       |  FROM tf JOIN df USING (token) CROSS JOIN stats s),
       |scored AS (
       |  SELECT doc_id, ${roundToSql(
             "CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE)", 4)} AS score
       |  FROM contrib GROUP BY 1),
       |ranked AS (
       |  SELECT doc_id, score,
       |    row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM scored)""".stripMargin
  }

  /** The hashed-embedding table CTEs (htf/hdf/hw → `hvec`), assuming
    * `ex(doc_id, dl, token)` and `stats` precede — shared verbatim by
    * [[hybridChainSql]] (single query) and the q_mmr_batch oracle
    * (whose `ex`/`stats` come from the batch chain instead). */
  private def hvecCtesSql: String =
    s"""htf AS (SELECT doc_id, token, count(*) AS tf FROM ex
       |        WHERE token != '' GROUP BY 1, 2),
       |hdf AS (SELECT token, count(*) AS df FROM htf GROUP BY 1),
       |hw AS (
       |  SELECT htf.doc_id, ${TextOps.hash60Sql("htf.token")} % 64 AS dim,
       |    ${roundToSql("htf.tf * ln((s.n_docs + 1.0) / (hdf.df + 1.0))", 6)} AS w
       |  FROM htf JOIN hdf USING (token) CROSS JOIN stats s),
       |hvec AS (
       |  SELECT doc_id, dim,
       |    ${roundToSql("CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE)", 4)} AS val
       |  FROM hw GROUP BY 1, 2)""".stripMargin

  /** DuckDB replay of [[hybridSearch]]: the shared [[bm25ChainSql]]
    * lexical leg, the hashed-embedding cosine leg (htf/hdf mirror the
    * q_hash_embed chain off the SAME `ex` explode; query vector under
    * corpus df), and the RRF fusion with rank windows over candidate
    * lists only. */
  /** The CTE chain through `fscored` (fused candidates with rrf) —
    * one spelling behind the q_hybrid_search AND q_mmr_rerank
    * oracles. */
  private def hybridChainSql: String = {
    val termsList = BmTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    def rrfLeg(r: String) = roundToSql(
      s"CASE WHEN $r IS NULL THEN 0.0 ELSE 1.0 / ($RrfC + CAST($r AS DOUBLE)) END", 9)
    s"""$bm25ChainSql,
       |$hvecCtesSql,
       |hqdf AS (
       |  SELECT token, count(DISTINCT doc_id) AS df FROM ex
       |  WHERE token IN (SELECT unnest($termsList)) GROUP BY 1),
       |hq AS (
       |  SELECT ${TextOps.hash60Sql("token")} % 64 AS dim,
       |    ${roundToSql("ln((s.n_docs + 1.0) / (hqdf.df + 1.0))", 6)} AS w
       |  FROM hqdf CROSS JOIN stats s),
       |hqvec AS (
       |  SELECT dim,
       |    ${roundToSql("CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE)", 4)} AS qval
       |  FROM hq GROUP BY 1),
       |hqn AS (
       |  SELECT sqrt(CAST(SUM(CAST(${roundToSql("qval * qval", 8)} AS DECIMAL(38,8))) AS DOUBLE)) AS qnorm
       |  FROM hqvec),
       |hagg AS (
       |  SELECT v.doc_id,
       |    sqrt(CAST(SUM(CAST(${roundToSql("v.val * v.val", 8)} AS DECIMAL(38,8))) AS DOUBLE)) AS dnorm,
       |    CAST(SUM(CAST(${roundToSql("COALESCE(v.val * q.qval, 0.0)", 8)} AS DECIMAL(38,8))) AS DOUBLE) AS dot,
       |    MAX(CASE WHEN q.qval IS NOT NULL THEN 1 ELSE 0 END) AS hit
       |  FROM hvec v LEFT JOIN hqvec q USING (dim) GROUP BY 1),
       |hcos AS (
       |  SELECT a.doc_id, ${roundToSql("a.dot / (a.dnorm * q2.qnorm)", 6)} AS cos
       |  FROM hagg a CROSS JOIN hqn q2
       |  WHERE a.hit = 1 AND a.dnorm * q2.qnorm > 0),
       |sranked AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS rnk
       |  FROM hcos),
       |fused AS (
       |  SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id,
       |    l.rnk AS r_lex, r.rnk AS r_sem
       |  FROM (SELECT doc_id, rnk FROM ranked WHERE rnk <= $HybridK) l
       |  FULL JOIN (SELECT doc_id, rnk FROM sranked WHERE rnk <= $HybridK) r
       |    ON l.doc_id = r.doc_id),
       |fscored AS (
       |  SELECT doc_id, CAST(r_lex AS BIGINT) AS r_lex,
       |    CAST(r_sem AS BIGINT) AS r_sem,
       |    ${roundToSql(rrfLeg("r_lex") + " + " + rrfLeg("r_sem"), 9)} AS rrf
       |  FROM fused)""".stripMargin
  }

  private def hybridOracleSql: String =
    s"""WITH $hybridChainSql,
       |franked AS (
       |  SELECT doc_id, r_lex, r_sem, rrf,
       |    row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank
       |  FROM fscored)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, rrf, r_lex, r_sem
       |FROM franked WHERE rank <= $HybridFinal ORDER BY rank""".stripMargin

  /** DuckDB replay of [[mmrRerank]]: fused top-[[HybridK]] candidates
    * off the shared chain, pairwise cosine over the candidate-
    * restricted hvec (same round8-decimal dot / round6 ladder), the
    * greedy fold as a LINEAR RECURSIVE CTE carrying the picked list —
    * each step scores every unpicked candidate against the picked
    * set via per-candidate (sids, scos) similarity lists and QUALIFYs
    * the (mmr DESC, doc_id) winner. */
  /** Pairwise-cosine CTEs over hvec restricted to an id CTE `$ids` —
    * emits `ms_$tag(a, b, cos)`; the SQL twin of [[pairwiseCos]]. */
  private def pairCosSql(ids: String, tag: String): String =
    s"""mv_$tag AS (SELECT v.doc_id, v.dim, v.val FROM hvec v
       |  JOIN $ids USING (doc_id)),
       |mn_$tag AS (SELECT doc_id,
       |    sqrt(CAST(SUM(CAST(${roundToSql("val * val", 8)}
       |      AS DECIMAL(38,8))) AS DOUBLE)) AS nrm
       |  FROM mv_$tag GROUP BY 1),
       |mp_$tag AS (SELECT va.doc_id AS a, vb.doc_id AS b,
       |    CAST(SUM(CAST(${roundToSql("va.val * vb.val", 8)}
       |      AS DECIMAL(38,8))) AS DOUBLE) AS dot
       |  FROM mv_$tag va JOIN mv_$tag vb
       |    ON va.dim = vb.dim AND va.doc_id < vb.doc_id
       |  GROUP BY 1, 2),
       |ms_$tag AS (SELECT mp_$tag.a, mp_$tag.b,
       |    ${roundToSql(s"mp_$tag.dot / (na.nrm * nb.nrm)", 6)} AS cos
       |  FROM mp_$tag JOIN mn_$tag na ON na.doc_id = mp_$tag.a
       |          JOIN mn_$tag nb ON nb.doc_id = mp_$tag.b
       |  WHERE na.nrm * nb.nrm > 0)""".stripMargin

  /** The MMR chain (candidates, pairwise sims, greedy recursion) —
    * assumes [[hybridChainSql]] precedes it; ends in
    * `rec(rank, doc_id, mmr, rrf, picked)`. Shared by the
    * q_mmr_rerank and q_mmr_diversity oracles.
    *
    * The diversity penalty floors the max picked-sim at 0
    * (`GREATEST(…, 0.0)`) because [[mmrGreedy]]'s
    * `foldLeft(0.0)(math.max)` does — the spellings would otherwise
    * diverge on negative cosines. Hashed tf-idf weights are
    * non-negative today (ln((n+1)/(df+1)) ≥ 0, so cos ≥ 0 and the
    * arm is latent), but the floor is the CONTRACT, not an accident
    * of the weight scheme (ADVICE r14; same floor in the q_mmr_batch
    * oracle). */
  private def mmrChainSql: String = {
    val lam = MmrLambda
    val oneMinus = 1 - MmrLambda
    s"""mcand AS (
       |  SELECT doc_id, rrf FROM fscored
       |  QUALIFY row_number() OVER (ORDER BY rrf DESC, doc_id) <= $HybridK),
       |${pairCosSql("mcand", "c")},
       |sym AS (SELECT a, b, cos FROM ms_c
       |        UNION ALL SELECT b, a, cos FROM ms_c),
       |cl AS (SELECT c.doc_id, c.rrf,
       |    COALESCE(list(s.b ORDER BY s.b)
       |      FILTER (WHERE s.b IS NOT NULL), []) AS sids,
       |    COALESCE(list(s.cos ORDER BY s.b)
       |      FILTER (WHERE s.b IS NOT NULL), []) AS scos
       |  FROM mcand c LEFT JOIN sym s ON s.a = c.doc_id GROUP BY 1, 2),
       |rec(rank, doc_id, mmr, rrf, picked) AS (
       |  (SELECT * FROM (SELECT CAST(1 AS BIGINT) AS rank, doc_id,
       |      ${roundToSql(s"$lam * rrf", 9)} AS mmr, rrf,
       |      [doc_id] AS picked FROM cl) b0
       |   QUALIFY row_number() OVER (ORDER BY b0.mmr DESC, b0.doc_id) = 1)
       |  UNION ALL
       |  (SELECT * FROM (SELECT p.rank + 1 AS rank, c.doc_id,
       |      ${roundToSql(
            s"$lam * c.rrf - $oneMinus * GREATEST(COALESCE(list_max(" +
              "list_transform(p.picked, " +
              "pk -> c.scos[list_position(c.sids, pk)])), 0.0), 0.0)", 9)} AS mmr,
       |      c.rrf, list_append(p.picked, c.doc_id) AS picked
       |    FROM rec p JOIN cl c ON NOT list_contains(p.picked, c.doc_id)
       |    WHERE p.rank < $MmrFinal) st
       |   QUALIFY row_number() OVER (ORDER BY st.mmr DESC, st.doc_id) = 1)
       |)""".stripMargin
  }

  private def mmrOracleSql: String =
    s"""WITH RECURSIVE $hybridChainSql,
       |$mmrChainSql
       |SELECT doc_id, rank, mmr AS mmr_score, rrf FROM rec ORDER BY rank""".stripMargin

  /** DuckDB replay of q_mmr_diversity: top-5 id sets of both rankings
    * off the shared chains, the [[pairCosSql]] machinery per set, the
    * k(k−1)/2-denominator mean with absent pairs counting 0. */
  private def mmrDiversityOracleSql: String = {
    def gaugeSql(ids: String, tag: String): String =
      s"""${pairCosSql(ids, tag)},
         |g_$tag AS (SELECT '$tag' AS variant,
         |    (SELECT count(*) FROM $ids) AS k,
         |    (SELECT count(*) FROM $ids) *
         |      ((SELECT count(*) FROM $ids) - 1) // 2 AS n_pairs,
         |    CAST(COALESCE(SUM(CAST(cos AS DECIMAL(18,6))), 0)
         |      AS DOUBLE) AS sc
         |  FROM ms_$tag)""".stripMargin
    s"""WITH RECURSIVE $hybridChainSql,
       |$mmrChainSql,
       |hy5 AS (SELECT doc_id FROM fscored
       |  QUALIFY row_number() OVER (ORDER BY rrf DESC, doc_id) <= 5),
       |mm5 AS (SELECT doc_id FROM rec WHERE rank <= 5),
       |${gaugeSql("hy5", "h5")},
       |${gaugeSql("mm5", "m5")},
       |u AS (SELECT * FROM g_h5 UNION ALL SELECT * FROM g_m5)
       |SELECT CASE WHEN variant = 'h5' THEN 'hybrid' ELSE 'mmr' END AS variant,
       |  CAST(k AS BIGINT) AS k, CAST(n_pairs AS BIGINT) AS n_pairs,
       |  CASE WHEN n_pairs > 0
       |       THEN ${roundToSql("sc / CAST(n_pairs AS DOUBLE)", 6)}
       |       ELSE 0.0 END AS avg_pairwise_cos
       |FROM u ORDER BY variant""".stripMargin
  }

  /** The [[bm25Batch]] replay chain ending in `branked(q_id, doc_id,
    * score, rank)` — shared by the q_bm25_batch and q_mmr_batch
    * oracles (one spelling). Also leaves `ex` and `stats` in scope
    * for [[hvecCtesSql]]. */
  private def bm25BatchChainSql: String =
    s"""d AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |q AS (
       |  SELECT doc_id AS q_id,
       |    unnest([toks[1], toks[5], toks[9]]) AS token
       |  FROM d WHERE doc_id % 100 = 0 AND len(toks) >= 9),
       |stats AS (SELECT count(*) AS n_docs,
       |    CAST(SUM(len(toks)) AS DOUBLE) / count(*) AS avgdl FROM d),
       |ex AS (
       |  SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM d),
       |fx AS (SELECT * FROM ex WHERE token IN (SELECT token FROM q)),
       |tf AS (SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
       |       FROM fx GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |contrib AS (
       |  SELECT q.q_id, tf.doc_id,
       |    ${bmContribSql("tf.tf", "df.df", "tf.dl", "s.n_docs", "s.avgdl")} AS c
       |  FROM tf JOIN df USING (token) JOIN q USING (token)
       |  CROSS JOIN stats s
       |  WHERE tf.doc_id <> q.q_id),
       |scored AS (
       |  SELECT q_id, doc_id, ${roundToSql(
             "CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE)", 4)} AS score
       |  FROM contrib GROUP BY 1, 2),
       |branked AS (
       |  SELECT q_id, doc_id, score,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY score DESC, doc_id ASC) AS rank
       |  FROM scored)""".stripMargin

  /** DuckDB replay of [[mmrBatch]]: per-query top-[[HybridK]]
    * candidates off [[bm25BatchChainSql]], single-leg RRF relevance,
    * pairwise cosine in the shared [[hvecCtesSql]] space keyed by
    * (q_id, dim), and the greedy fold as ONE recursive CTE advancing
    * EVERY query one pick per iteration (state = latest pick per
    * q_id, PARTITION BY q_id in the QUALIFY; queries that exhaust
    * their candidates simply stop producing rows). */
  private def mmrBatchOracleSql: String = {
    val lam = MmrLambda
    val oneMinus = 1 - MmrLambda
    s"""WITH RECURSIVE $bm25BatchChainSql,
       |$hvecCtesSql,
       |bcand AS (
       |  SELECT q_id, doc_id,
       |    ${roundToSql(s"1.0 / ($RrfC + CAST(rank AS DOUBLE))", 9)} AS rel
       |  FROM branked WHERE rank <= $HybridK),
       |bv AS (SELECT c.q_id, v.doc_id, v.dim, v.val
       |  FROM hvec v JOIN bcand c USING (doc_id)),
       |bn AS (SELECT v.doc_id,
       |    sqrt(CAST(SUM(CAST(${roundToSql("v.val * v.val", 8)}
       |      AS DECIMAL(38,8))) AS DOUBLE)) AS nrm
       |  FROM hvec v JOIN (SELECT DISTINCT doc_id FROM bcand) c USING (doc_id)
       |  GROUP BY 1),
       |bp AS (SELECT va.q_id, va.doc_id AS a, vb.doc_id AS b,
       |    CAST(SUM(CAST(${roundToSql("va.val * vb.val", 8)}
       |      AS DECIMAL(38,8))) AS DOUBLE) AS dot
       |  FROM bv va JOIN bv vb
       |    ON va.q_id = vb.q_id AND va.dim = vb.dim AND va.doc_id < vb.doc_id
       |  GROUP BY 1, 2, 3),
       |bs AS (SELECT bp.q_id, bp.a, bp.b,
       |    ${roundToSql("bp.dot / (na.nrm * nb.nrm)", 6)} AS cos
       |  FROM bp JOIN bn na ON na.doc_id = bp.a
       |          JOIN bn nb ON nb.doc_id = bp.b
       |  WHERE na.nrm * nb.nrm > 0),
       |bsym AS (SELECT q_id, a, b, cos FROM bs
       |         UNION ALL SELECT q_id, b, a, cos FROM bs),
       |bcl AS (SELECT c.q_id, c.doc_id, c.rel,
       |    COALESCE(list(s.b ORDER BY s.b)
       |      FILTER (WHERE s.b IS NOT NULL), []) AS sids,
       |    COALESCE(list(s.cos ORDER BY s.b)
       |      FILTER (WHERE s.b IS NOT NULL), []) AS scos
       |  FROM bcand c LEFT JOIN bsym s
       |    ON s.q_id = c.q_id AND s.a = c.doc_id
       |  GROUP BY 1, 2, 3),
       |brec(q_id, rank, doc_id, mmr, rel, picked) AS (
       |  (SELECT * FROM (SELECT q_id, CAST(1 AS BIGINT) AS rank, doc_id,
       |      ${roundToSql(s"$lam * rel", 9)} AS mmr, rel,
       |      [doc_id] AS picked FROM bcl) b0
       |   QUALIFY row_number() OVER (PARTITION BY b0.q_id
       |     ORDER BY b0.mmr DESC, b0.doc_id) = 1)
       |  UNION ALL
       |  (SELECT * FROM (SELECT p.q_id, p.rank + 1 AS rank, c.doc_id,
       |      ${roundToSql(
            s"$lam * c.rel - $oneMinus * GREATEST(COALESCE(list_max(" +
              "list_transform(p.picked, " +
              "pk -> c.scos[list_position(c.sids, pk)])), 0.0), 0.0)", 9)} AS mmr,
       |      c.rel, list_append(p.picked, c.doc_id) AS picked
       |    FROM brec p JOIN bcl c
       |      ON c.q_id = p.q_id AND NOT list_contains(p.picked, c.doc_id)
       |    WHERE p.rank < $MmrFinal) st
       |   QUALIFY row_number() OVER (PARTITION BY st.q_id
       |     ORDER BY st.mmr DESC, st.doc_id) = 1)
       |)
       |SELECT q_id, rank, doc_id, mmr AS mmr_score, rel FROM brec
       |ORDER BY q_id, rank""".stripMargin
  }

  /** The q_lm_perplexity CTE chain ending in `pd(doc_id, n_bigrams,
    * avg_nll)` — shared with the q_curriculum oracle. */
  private def lmCtesSql: String =
    s"""d AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |big AS (
       |  SELECT d.doc_id, toks[i] AS w1, toks[i + 1] AS w2
       |  FROM d, unnest(CASE WHEN len(toks) < 2 THEN []
       |                      ELSE range(1, len(toks)) END) AS t(i)),
       |train AS (SELECT * FROM big WHERE doc_id % 2 = 0),
       |c2 AS (SELECT w1, w2, count(*) AS c2 FROM train GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM train GROUP BY 1),
       |v AS (SELECT count(DISTINCT token) AS v FROM
       |  (SELECT unnest(toks) AS token FROM d WHERE doc_id % 2 = 0)),
       |nll AS (
       |  SELECT b.doc_id, ${roundToSql(
             "-ln((COALESCE(c2.c2, 0) + 1.0) / (COALESCE(c1.c1, 0) + v.v))", 6)} AS nll
       |  FROM big b
       |  LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
       |  LEFT JOIN c1 ON b.w1 = c1.w1 CROSS JOIN v),
       |pd AS (SELECT doc_id, count(*) AS n_bigrams,
       |  ${roundToSql(
           "CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / count(*)", 4)} AS avg_nll
       |FROM nll GROUP BY 1)""".stripMargin

  val oracle: Map[String, String] = {
    val termsList = BmTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    Map(
      "q_bm25_search" ->
        s"""WITH $bm25ChainSql
           |SELECT doc_id, score, rnk FROM ranked WHERE rnk <= 10
           |ORDER BY rnk""".stripMargin,

      "q_hybrid_search" -> hybridOracleSql,

      "q_mmr_rerank" -> mmrOracleSql,

      "q_mmr_diversity" -> mmrDiversityOracleSql,

      "q_bm25_batch" ->
        s"""WITH $bm25BatchChainSql
           |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, score
           |FROM branked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

      "q_mmr_batch" -> mmrBatchOracleSql,

      "q_lm_perplexity" ->
        s"""WITH $lmCtesSql
           |SELECT doc_id, n_bigrams, avg_nll FROM pd ORDER BY doc_id""".stripMargin,

      // per-doc difficulty off the SAME lm chain; thresholds replay
      // the hdr sketch's rank rule over ascending bucket floors
      "q_curriculum" ->
        s"""WITH $lmCtesSql,
           |bp AS (SELECT doc_id, avg_nll,
           |    CAST(FLOOR(avg_nll * 10000) AS BIGINT) AS v FROM pd),
           |mnv AS (SELECT min(v) AS vmin FROM bp),
           |sh AS (SELECT doc_id, avg_nll, v - vmin AS sv
           |  FROM bp CROSS JOIN mnv),
           |bl AS (SELECT doc_id, avg_nll, sv,
           |    ${graft.functions.hdrBucketLoSql("sv")} AS lo FROM sh),
           |c AS (SELECT lo, count(*) AS cnt FROM bl GROUP BY 1),
           |bc AS (SELECT lo, sum(cnt) OVER (ORDER BY lo) AS cum,
           |    sum(cnt) OVER () AS n FROM c),
           |thr AS (SELECT
           |    min(CASE WHEN cum >= ceil(0.33 * n) THEN lo END) AS t1,
           |    min(CASE WHEN cum >= ceil(0.66 * n) THEN lo END) AS t2
           |  FROM bc)
           |SELECT bl.doc_id, bl.avg_nll,
           |  CASE WHEN bl.sv <= thr.t1 THEN 0
           |       WHEN bl.sv <= thr.t2 THEN 1 ELSE 2 END AS phase
           |FROM bl CROSS JOIN thr ORDER BY bl.doc_id""".stripMargin,

      "q_pii_redact" ->
        s"""WITH p AS (SELECT doc_id, $piiTextSql AS t FROM documents)
           |SELECT doc_id,
           |  len(regexp_extract_all(t, '$EmailRe')) AS n_email,
           |  len(regexp_extract_all(t, '$IpRe')) AS n_ip,
           |  len(regexp_extract_all(t, '$PhoneRe')) AS n_phone,
           |  md5(regexp_replace(regexp_replace(regexp_replace(t,
           |    '$EmailRe', '<EMAIL>', 'g'),
           |    '$IpRe', '<IP>', 'g'),
           |    '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
           |FROM p ORDER BY doc_id""".stripMargin,

      "q_hash_embed" ->
        s"""WITH ex AS (
           |  SELECT doc_id, unnest($toksSql) AS token FROM documents),
           |fx AS (SELECT doc_id, token FROM ex WHERE token != ''),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM fx GROUP BY 1, 2),
           |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT count(*) AS n_docs FROM documents),
           |w AS (
           |  SELECT tf.doc_id,
           |    ${TextOps.hash60Sql("tf.token")} % 64 AS dim,
           |    ${roundToSql("tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0))", 6)} AS w
           |  FROM tf JOIN df USING (token) CROSS JOIN n)
           |SELECT doc_id, dim,
           |  ${roundToSql("CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE)", 4)} AS val
           |FROM w GROUP BY 1, 2 ORDER BY doc_id, dim""".stripMargin,

      "q_bpe_merges" ->
        s"""WITH t AS (SELECT unnest($toksSql) AS token FROM documents),
           |v AS (SELECT token, count(*) AS freq FROM t
           |      WHERE length(token) >= 2 GROUP BY 1),
           |p AS (SELECT substr(token, CAST(i AS INT), 2) AS pair, freq
           |      FROM v, unnest(range(1, length(token))) AS u(i))
           |SELECT pair, CAST(SUM(freq) AS BIGINT) AS weight
           |FROM p GROUP BY 1
           |ORDER BY weight DESC, pair ASC LIMIT 20""".stripMargin,

      "q_bpe_encode" ->
        s"""WITH tok0 AS (SELECT unnest($toksSql) AS token FROM documents),
           |${bpeChainSql(BpeEncodeRounds)}
           |SELECT token, freq, CAST(len(syms) AS BIGINT) AS n_pieces,
           |  array_to_string(syms, ' ') AS encoded
           |FROM s$BpeEncodeRounds ORDER BY token""".stripMargin,

      "q_bpe_pack" ->
        s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |tok0 AS (SELECT unnest(toks) AS token FROM d),
           |${bpeChainSql(BpeEncodeRounds)},
           |pc AS (SELECT token, len(syms) AS np FROM s$BpeEncodeRounds),
           |fx AS (SELECT doc_id, unnest(toks) AS token FROM d),
           |nf AS (SELECT doc_id, token FROM fx WHERE token != ''),
           |dc AS (SELECT f.doc_id,
           |         CAST(SUM(CASE WHEN length(f.token) >= 2 THEN pc.np
           |                       ELSE 1 END) AS BIGINT) AS n
           |       FROM nf f LEFT JOIN pc ON f.token = pc.token
           |       GROUP BY 1),
           |nz AS (SELECT doc_id, n FROM dc WHERE n >= 1),
           |c AS (SELECT doc_id, n,
           |    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS st
           |  FROM nz)
           |SELECT doc_id, n AS n_tokens, st AS start_tok,
           |  st + n AS end_tok,
           |  st // ${TextOps.PackContext} AS first_example,
           |  (st + n - 1) // ${TextOps.PackContext} AS last_example,
           |  ((st + n - 1) // ${TextOps.PackContext}) - (st // ${TextOps.PackContext}) + 1
           |    AS n_examples
           |FROM c ORDER BY doc_id""".stripMargin,

      // replay: learn merges (chained CTEs), piece the DISTINCT
      // vocabulary (1-char tokens are their own piece), id the piece
      // lexicon lexicographically, then flatten ids in (pos, ppos)
      // document order
      "q_bpe_tokens" ->
        s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |tok0 AS (SELECT unnest(toks) AS token FROM d),
           |${bpeChainSql(BpeEncodeRounds)},
           |vt AS (SELECT DISTINCT token FROM tok0 WHERE token != ''),
           |vp AS (SELECT vt.token,
           |    CASE WHEN length(vt.token) >= 2 THEN sv.syms
           |         ELSE [vt.token] END AS pieces
           |  FROM vt LEFT JOIN s$BpeEncodeRounds sv ON vt.token = sv.token),
           |pid AS (SELECT piece,
           |    CAST(row_number() OVER (ORDER BY piece) - 1
           |      + ${graft.functions.BpeEncodeIds.ByteIdOffset} AS INT) AS piece_id
           |  FROM (SELECT DISTINCT unnest(pieces) AS piece FROM vp)),
           |tp AS (SELECT token, i AS ppos, pieces[CAST(i AS INT)] AS piece
           |  FROM vp, unnest(range(1, len(pieces) + 1)) AS u(i)),
           |tj AS (SELECT tp.token, tp.ppos, pid.piece_id
           |  FROM tp JOIN pid USING (piece)),
           |tids AS (SELECT token, list(piece_id ORDER BY ppos) AS tok_ids
           |  FROM tj GROUP BY 1),
           |occ AS (SELECT doc_id, i AS pos, toks[CAST(i AS INT)] AS token
           |  FROM d, unnest(range(1, len(toks) + 1)) AS u(i)
           |  WHERE toks[CAST(i AS INT)] != ''),
           |oj AS (SELECT o.doc_id, o.pos, t.tok_ids
           |  FROM occ o JOIN tids t USING (token)),
           |ag AS (SELECT doc_id, flatten(list(tok_ids ORDER BY pos)) AS ids
           |  FROM oj GROUP BY 1)
           |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_ids,
           |  array_to_string(list_transform(ids, x -> CAST(x AS VARCHAR)), ' ')
           |    AS token_ids
           |FROM ag ORDER BY doc_id""".stripMargin
    )
  }
}
