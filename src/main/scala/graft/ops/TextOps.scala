package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import Util._

/** Text-analysis & deduplication operators for a training-data pipeline
  * (builder-prompt north star; SURVEY.md §7.2-6): exact dedup,
  * MinHash+LSH near-dup, n-gram Jaccard ground truth, fingerprinting,
  * token counting, quality scoring, language ID.
  *
  * Scale notes (the 100 TB story):
  *  - exact dedup is a hash groupBy on a 128-bit digest — one shuffle of
  *    (digest, doc_id), never of the text body;
  *  - MinHash+LSH turns the O(n²) pair space into per-band hash joins:
  *    shuffle keys are (band_id, band_signature), candidates verified
  *    exactly afterwards — the standard web-scale dedup shape;
  *  - the exact Jaccard query is the *oracle ground truth* for LSH and
  *    is lang-blocked; at scale you run the LSH path, not this one.
  *
  * All hashes are md5-prefix based (`conv(substr(md5(x),1,15),16,10)`)
  * — 60-bit values with an exact DuckDB spelling
  * (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), so even the MinHash
  * pipeline is oracle-checked end to end.
  */
object TextOps {

  /** Whitespace tokenization of lowercased text (empty → empty
    * array). EXPLICIT whitespace class, not \s: Java regex \s
    * includes vertical tab (\x0B) while DuckDB's RE2 \s does not —
    * the same cross-engine trap the BPE pattern already documents. */
  val wsClass: String = "[ \\t\\n\\r\\f\\x0B]+"

  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(text)), wsClass))

  def tokensSql(text: String): String =
    s"CASE WHEN length(trim($text)) = 0 THEN [] " +
      s"ELSE string_split_regex(trim(lower($text)), '$wsClass') END"

  /** Canonical whitespace-normalized form used for exact dedup and
    * fingerprinting. */
  def normText(text: Column): Column =
    regexp_replace(trim(lower(text)), wsClass, " ")

  def normTextSql(text: String): String =
    s"regexp_replace(trim(lower($text)), '$wsClass', ' ', 'g')"

  /** 60-bit deterministic string hash with an exact DuckDB equivalent. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash60Sql(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** Word 3-gram shingle set (distinct), the unit of near-dup detection.
    * Documents with <3 tokens get their whole text as one shingle. */
  def shingles(toks: Column): Column =
    when(size(toks) < 3, array_distinct(array(concat_ws(" ", toks))))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))

  def shinglesSql(w: String): String =
    s"CASE WHEN len($w) < 3 THEN [array_to_string($w, ' ')] " +
      s"ELSE list_distinct(list_transform(range(1, len($w) - 1), " +
      s"i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2])) END"

  /** Exact Jaccard similarity of two (distinct-element) arrays.
    * Two empty sets → 0.0 (the denominator guard also keeps ANSI mode
    * from throwing DIVIDE_BY_ZERO); the intersect is bound once. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / greatest(size(a) + size(b) - inter, lit(1.0))
  }

  /** MinHash via affine permutations: ONE md5 per shingle, then k
    * cheap `(a_i·h + b_i) mod p` permutations (p = 2³¹−1). 16× less
    * hashing than per-seed md5 — at 100 TB the md5 is the hot loop.
    * `h % p < 2³¹` and `a < 2³¹` keep `a·h+b` inside a 63-bit long. */
  val MinhashP: Long = 2147483647L
  def minhashCoefA(i: Int): Long = (1000003L * (i + 1) + 12345L) % MinhashP
  def minhashCoefB(i: Int): Long = (998244353L * (i + 1) + 777L) % MinhashP

  /** Per-shingle base hashes, reduced mod p. */
  def shingleHashes(sh: Column): Column =
    transform(sh, s => hash60(s) % MinhashP)

  def shingleHashesSql(sh: String): String =
    s"list_transform($sh, s -> ${hash60Sql("s")} % $MinhashP)"

  /** k-permutation signature over the pre-computed base hashes —
    * native one-pass expression (all k minima maintained in one
    * traversal; the composed form below re-walked the array k times
    * through interpreted HOFs). Bit-identical values by the
    * expression's contract; [[minhashSigComposed]] stays as the
    * reference spelling for the equivalence spec. */
  def minhashSig(hs: Column, k: Int): Column =
    graft.functions.minhash_sigs(hs,
      Array.tabulate(k)(minhashCoefA), Array.tabulate(k)(minhashCoefB),
      MinhashP)

  /** The composed-HOF spelling of [[minhashSig]] — the definition the
    * native expression is tested against (and the exact shape
    * [[minhashSigSql]] mirrors in DuckDB). */
  def minhashSigComposed(hs: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(hs,
        h => (h * minhashCoefA(i) + minhashCoefB(i)) % MinhashP))): _*)

  def minhashSigSql(hs: String, k: Int): String =
    (0 until k).map(i =>
      s"list_min(list_transform($hs, h -> (h * ${minhashCoefA(i)} + ${minhashCoefB(i)}) % $MinhashP))")
      .mkString("[", ", ", "]")

  /** Language-ID marker lexicons (tiny stopword heuristic — SURVEY.md
    * §7.2-6 "n-gram heuristic"). Deterministic and SQL-expressible. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Chunk width (tokens) for language-span segmentation — small
    * enough that a code-switch inside a paragraph lands on a chunk
    * boundary within ±5 tokens, large enough that the 5-word marker
    * lexicons see a hit in genuine text. */
  val LangChunk = 10

  /** Language-SPAN segmentation (VERDICT r10 #8): q_lang_id is
    * doc-granular, but real crawled corpora are code-switched — this
    * runs the same marker-argmax call per fixed [[LangChunk]]-token
    * chunk and merges consecutive same-language chunks into maximal
    * spans by gaps-and-islands (the [[mergeDupSpans]] discipline, with
    * the island break on language change instead of start gaps).
    *
    * Scale shape: the tokenize + chunk explode + per-chunk argmax is
    * all MAP-SIDE (the token array is materialized once before the
    * Generate; chunk slices are array reads, not re-tokenizes); the
    * only shuffle is the per-doc window + span aggregation over skinny
    * (doc_id, ci, lang) rows — O(chunks), not O(tokens). Feeds
    * per-language routing at span granularity downstream. */
  def langSpans(docs: DataFrame, chunk: Int = LangChunk): DataFrame = {
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .filter(col("n") >= 1)
    val chunks = base
      .select(col("doc_id"), col("n"), col("toks"),
        explode(sequence(lit(0), ((col("n") - 1) / lit(chunk)).cast("int")))
          .as("ci"))
      .withColumn("ctoks", slice(col("toks"), col("ci") * chunk + 1, lit(chunk)))
    val scored = langMarkers.foldLeft(chunks) { case (df, (lang, words)) =>
      df.withColumn(s"hits_$lang", markerHits(col("ctoks"), words))
    }
    val best = langMarkers.map { case (lang, _) =>
      struct(col(s"hits_$lang").as("hits"), lit(lang).as("lang"))
    }
    // same argmax + ASC-lang tie-break + und-on-zero rule as q_lang_id
    val picked = scored.withColumn("bst",
        aggregate(
          array(best: _*),
          struct(lit(-1).as("hits"), lit("zzz").as("lang")),
          (acc, x) => when(x.getField("hits") > acc.getField("hits") ||
            (x.getField("hits") === acc.getField("hits") &&
              x.getField("lang") < acc.getField("lang")), x).otherwise(acc)))
      .select(col("doc_id"), col("n"), col("ci"),
        when(col("bst.hits") > 0, col("bst.lang")).otherwise(lit("und"))
          .as("lang"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("ci"))
    picked
      .withColumn("brk",
        when(lag(col("lang"), 1).over(byDoc).isNull ||
          lag(col("lang"), 1).over(byDoc) === col("lang"), 0).otherwise(1))
      .withColumn("span", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span"), col("lang"))
      .agg((min(col("ci")) * chunk + 1).cast("long").as("tok_start"),
        least(max(col("ci")) * chunk + chunk, max(col("n"))).cast("long")
          .as("tok_end"),
        count(lit(1)).as("n_chunks"))
      .orderBy("doc_id", "span")
  }

  /** Code-marker surface for code/prose segmentation: a token is
    * "codey" iff it carries a code symbol or IS a keyword. The symbol
    * class and keyword list live exactly here (and in the oracle via
    * [[codeSymClass]]/[[codeKeywords]] interpolation) — shared
    * Java∩RE2 syntax only (a bare character class). */
  val codeSymClass = "[{}();=<>]"
  val codeKeywords: Seq[String] = Seq("def", "return", "let", "if")

  /** Deterministic planted code snippet (space-separated so every
    * symbol is its own token; id-derived constants so a miscounted
    * chunk or drifted threshold hash-mismatches — the piiText /
    * Html.fixture discipline: the synthetic corpus has no code, so
    * both engines synthesize the identical mixed document). */
  private def codeSnippet(id: Column): Column = concat(
    lit("def fn ( x ) { return x + "), (id % 7).cast("string"),
    lit(" ; } ; let y = fn ( "), (id % 13).cast("string"),
    lit(" ) ; if ( y > "), (id % 5).cast("string"),
    lit(" ) { y = y - 1 ; }"))

  private def codeSnippetSql(id: String): String =
    s"'def fn ( x ) { return x + ' || CAST($id % 7 AS VARCHAR) || " +
      s"' ; } ; let y = fn ( ' || CAST($id % 13 AS VARCHAR) || " +
      s"' ) ; if ( y > ' || CAST($id % 5 AS VARCHAR) || ' ) { y = y - 1 ; }'"

  /** Mixed-document fixture: every 6th doc is prose–code–prose (the
    * island case), every 6th-offset-3 doc is pure code, the rest stay
    * prose. */
  def codeFixture(text: Column, id: Column): Column =
    when(id % 6 === 0, concat(text, lit(" "), codeSnippet(id), lit(" "), text))
      .when(id % 6 === 3, codeSnippet(id))
      .otherwise(text)

  def codeFixtureSql(text: String, id: String): String =
    s"CASE WHEN $id % 6 = 0 THEN $text || ' ' || ${codeSnippetSql(id)} || ' ' || $text " +
      s"WHEN $id % 6 = 3 THEN ${codeSnippetSql(id)} ELSE $text END"

  /** Per-chunk code/prose classification — the shared first stage of
    * [[codeSpans]], exposed so the prose-only quality respec (and its
    * spec) reuse the exact same chunk verdicts. A chunk is `code` iff
    * at least a third of its tokens are codey. Map-side: one staged
    * token materialization, chunk slices are array reads. Operates on
    * `text` AS-IS — the synthetic [[codeFixture]] is applied only at
    * the q_code_spans query site, mirroring [[Html.fixture]]'s
    * discipline (ADVICE r12: baking the fixture in corrupted every
    * real-corpus caller). */
  def codeChunks(docs: DataFrame, chunk: Int = LangChunk): DataFrame = {
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .filter(col("n") >= 1)
    base
      .select(col("doc_id"), col("n"), col("toks"),
        explode(sequence(lit(0), ((col("n") - 1) / lit(chunk)).cast("int")))
          .as("ci"))
      .withColumn("ctoks", slice(col("toks"), col("ci") * chunk + 1, lit(chunk)))
      .withColumn("n_code", size(filter(col("ctoks"),
        t => t.rlike(codeSymClass) || t.isInCollection(codeKeywords))))
      .select(col("doc_id"), col("n"), col("ci"), col("ctoks"),
        when(col("n_code") * 3 >= size(col("ctoks")), lit("code"))
          .otherwise(lit("prose")).as("kind"))
  }

  /** Code/prose SPAN segmentation (VERDICT r11 #3): real crawl text is
    * code-switched between natural language and code, and the quality
    * gate's stopword/punctuation signals mis-score code blocks — this
    * emits maximal same-kind spans (the [[langSpans]] gaps-and-islands
    * discipline with the island break on kind change) so the quality
    * gate can run prose-only and routing can ship code spans to a code
    * pipeline. Scale shape identical to langSpans: map-side chunk
    * classify, one per-doc window over skinny (doc_id, ci, kind) rows
    * — O(chunks), not O(tokens). */
  def codeSpans(docs: DataFrame, chunk: Int = LangChunk): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("ci"))
    codeChunks(docs, chunk)
      .withColumn("brk",
        when(lag(col("kind"), 1).over(byDoc).isNull ||
          lag(col("kind"), 1).over(byDoc) === col("kind"), 0).otherwise(1))
      .withColumn("span", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span"), col("kind"))
      .agg((min(col("ci")) * chunk + 1).cast("long").as("tok_start"),
        least(max(col("ci")) * chunk + chunk, max(col("n"))).cast("long")
          .as("tok_end"),
        count(lit(1)).as("n_chunks"))
      .orderBy("doc_id", "span")
  }

  private def markerHitsSql(toks: String, words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toks, t -> list_contains($lst, t)))"
  }

  /** English stopwords for the quality-score ratio. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "is", "are", "to", "in")

  /** The RAW quality signals over a documents frame — the three
    * capped [0,1] sub-terms (length, stopword-density, punctuation)
    * plus marker hits and the integer token count. ONE definition
    * behind [[scoredDocs]]' composite score AND
    * [[QualityModel.fitFeatures]]' feature vector (review r10, second
    * pass: the classifier had re-spelled these trees — a weight tweak
    * would have forked its Spark side from its qualityCtesSql-based
    * oracle). */
  private[ops] def qualitySignals(): (Column, Column, Column, Column, Column) = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[.!?,;:]", ""))
    val stopHits = size(filter(toks, t => t.isInCollection(stopwords))).cast("double")
    val allMarkers = langMarkers.flatMap(_._2)
    val anyHits = size(filter(toks, t => t.isInCollection(allMarkers)))
    (least(col("n_chars").cast("double") / 500.0, lit(1.0)),
      least(stopHits / greatest(nTok, lit(1.0)) * 5.0, lit(1.0)),
      least(punct.cast("double") * 10.0 / greatest(length(col("text")), lit(1)), lit(1.0)),
      anyHits,
      size(toks))
  }

  /** The composite raw quality from the three signal terms — the
    * 0.4/0.3/0.3 weighting exists exactly here (and in
    * [[qualityCtesSql]]). */
  private[ops] def qualityOf(t1: Column, t2: Column, t3: Column): Column =
    t1 * 0.4 + t2 * 0.3 + t3 * 0.3

  /** The corpus keep gate over RAW signal expressions — the
    * `quality_score >= 0.3 && marker_hits > 0` rule of
    * q_corpus_select, for callers that gate before naming columns. */
  private[ops] def keepGateRaw(quality: Column, markerHits: Column): Column =
    roundTo(quality, 4) >= 0.3 && markerHits > 0

  /** THE corpus-selection scoring projection —
    * (doc_id, lang[, h], n_tokens, quality_score, marker_hits) — the
    * single definition shared by q_corpus_select and
    * q_corpus_select_dedup; [[qualityCtesSql]] is its DuckDB twin. A
    * weight/threshold tweak happens here (and there) exactly once. */
  def scoredDocs(docs: DataFrame, withDigest: Boolean): DataFrame = {
    val (t1, t2, t3, anyHits, nToks) = qualitySignals()
    val quality = qualityOf(t1, t2, t3)
    val cols = Seq(col("doc_id"), col("lang")) ++
      (if (withDigest) Seq(md5(normText(col("text"))).as("h")) else Nil) ++
      Seq(nToks.as("n_tokens"),
        roundTo(quality, 4).as("quality_score"),
        anyHits.as("marker_hits"))
    docs.select(cols: _*)
  }

  /** The four repetition fields from a [[graft.functions.TokenStats]]
    * struct `st` — the shared tail of [[repMetrics]] and
    * [[corpusFeatures]]; one definition so the standalone query and
    * the fused feature scan cannot drift. The INTEGER counts come out
    * of the native one-pass expression (the composed
    * `array_max(transform(array_distinct…))` spelling was the measured
    * hot loop — O(distinct·n) per doc through interpreted HOF eval);
    * the DOUBLE ratio/rounding math here is unchanged, so the DuckDB
    * oracle parity ([[repCtesSql]]) is untouched. */
  private def repFieldsOfStats(st: Column): Seq[Column] = {
    val nTokD = st("n_tokens").cast("double")
    val nBg = st("n_bigrams").cast("double")
    Seq(
      st("n_tokens").as("n_tokens"),
      roundTo(st("n_distinct").cast("double") / greatest(nTokD, lit(1.0)), 4)
        .as("distinct_ratio"),
      roundTo(st("top_freq").cast("double") / greatest(nTokD, lit(1.0)), 4)
        .as("top_token_frac"),
      roundTo((nBg - st("n_distinct_bigrams").cast("double")) /
        greatest(nBg, lit(1.0)), 4).as("dup_bigram_frac"))
  }

  /** Repetition metrics of q_rep_quality as a 1-element struct array
    * — the token array is traversed ONCE by the native
    * [[graft.functions.TokenStats]] pass, whose result struct is
    * bound as the lambda variable (the bind-once discipline of the
    * PERF.md HOF note: a lambda body must only reference bound
    * variables, and multi-metric results leave the row through
    * `inline`). One definition shared by q_rep_quality and
    * q_corpus_pipeline. */
  def repMetrics(text: Column): Column =
    transform(array(graft.functions.token_stats(tokens(text), Nil, Nil)),
      st => struct(repFieldsOfStats(st): _*))

  /** The bound-once text-derived core of the fused feature scan: ONE
    * tokenization, ONE [[graft.functions.TokenStats]] counting pass,
    * ONE shingle-hash pass — emitted as a 1-element struct array for
    * `inline` expansion (generator outputs are concrete attributes, so
    * downstream field references are free). */
  private def tokenFeatureStruct(text: Column): Column =
    transform(array(tokens(text)), t => struct(
      graft.functions.token_stats(t, stopwords, langMarkers.flatMap(_._2))
        .as("st"),
      // native single-pass twin of shingleHashes(shingles(t)) — same
      // values/order by NGramHashExplode.distinctHashes' contract
      graft.functions.ngram_hashes(t).as("hsh")))

  /** One-scan per-document feature table:
    * (doc_id, lang, dig, n_tokens[, distinct_ratio, top_token_frac,
    * dup_bigram_frac], quality_score, marker_hits, hsh). The caller
    * persists it; every corpus-pipeline stage reads from here instead
    * of re-scanning text.
    *
    * Everything the corpus pipeline needs from the text body is
    * computed in ONE pass so `documents` is scanned exactly once end
    * to end: repetition counts and quality/lang hits from the native
    * [[graft.functions.TokenStats]] expression (same integers as the
    * composed [[scoredDocs]]/repetition spellings — the double math
    * below is their exact expression trees, so the values stay
    * bit-identical), and the hashed shingle set `hsh` that feeds BOTH
    * near-dup pair generation (minhash signatures derive from it) and
    * decontamination (its explode equals `ngram_hash_explode` by the
    * generator's own contract). At 100 TB this is the restructure
    * that matters: text bytes are read once, and every downstream
    * stage — CC, contamination, gates — runs off the skinny persisted
    * feature table. */
  def corpusFeatures(s: SparkSession, dir: String, withRep: Boolean = true): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"),
        md5(normText(col("text"))).as("dig"),
        inline(tokenFeatureStruct(col("text"))))
    val st = col("st")
    val nTokD = st("n_tokens").cast("double")
    val punct = length(col("text")) -
      length(regexp_replace(col("text"), "[.!?,;:]", ""))
    val quality =
      least(col("n_chars").cast("double") / 500.0, lit(1.0)) * 0.4 +
        least(st("stop_hits").cast("double") / greatest(nTokD, lit(1.0)) * 5.0,
          lit(1.0)) * 0.3 +
        least(punct.cast("double") * 10.0 / greatest(length(col("text")), lit(1)),
          lit(1.0)) * 0.3
    // withRep=false keeps the skinny quality-only shape for consumers
    // that never gate on repetition (q_corpus_select_dedup)
    val repCols =
      if (withRep) repFieldsOfStats(st)
      else Seq(st("n_tokens").as("n_tokens"))
    base.select(Seq(col("doc_id"), col("lang"), col("dig")) ++ repCols ++ Seq(
      roundTo(quality, 4).as("quality_score"),
      st("marker_hits").as("marker_hits"),
      col("hsh")): _*)
  }

  /** The keep decision over [[repMetrics]]' ROUNDED columns (exact
    * cross-engine boundary). */
  val repKeepPredicate: Column =
    col("distinct_ratio") >= 0.5 && col("top_token_frac") <= 0.2 &&
      col("dup_bigram_frac") <= 0.1

  /** DuckDB CTEs (`rt`, `rq`) of [[repMetrics]] + keep — names chosen
    * not to collide with [[qualityCtesSql]]'s `t`/`u` or the minhash
    * CTEs, so composite oracles can stack them. */
  def repCtesSql: String = {
    val toksSqlV = tokensSql("text")
    s"""rt AS (SELECT doc_id, $toksSqlV AS toks FROM documents),
       |rq AS (
       |  SELECT doc_id,
       |    ${roundToSql("CAST(len(list_distinct(toks)) AS DOUBLE) / GREATEST(CAST(len(toks) AS DOUBLE), 1.0)", 4)} AS distinct_ratio,
       |    ${roundToSql(
          "CAST(COALESCE(list_max(list_transform(list_distinct(toks), " +
          "t -> len(list_filter(toks, x -> x = t)))), 0) AS DOUBLE)" +
          " / GREATEST(CAST(len(toks) AS DOUBLE), 1.0)", 4)} AS top_token_frac,
       |    ${roundToSql(
          "(CAST(len(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS DOUBLE)" +
          " - CAST(len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE))" +
          " / GREATEST(CAST(len(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS DOUBLE), 1.0)", 4)} AS dup_bigram_frac
       |  FROM rt)""".stripMargin
  }

  /** DuckDB spelling of [[scoredDocs]] as CTEs `t`, `u` — `u` carries
    * (doc_id, lang[, h], n_tokens, quality_score, marker_hits). */
  def qualityCtesSql(withDigest: Boolean): String = {
    val toksSqlV = tokensSql("text")
    val stopLst = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    val allLst = langMarkers.flatMap(_._2).map(w => s"'$w'").mkString("[", ", ", "]")
    val hT = if (withDigest) s",\n    md5(${normTextSql("text")}) AS h" else ""
    val hU = if (withDigest) ", h" else ""
    s"""t AS (
       |  SELECT doc_id, lang, n_chars, text, $toksSqlV AS toks$hT,
       |    length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct
       |  FROM documents),
       |u AS (
       |  SELECT doc_id, lang$hU,
       |    CAST(len(toks) AS INTEGER) AS n_tokens,
       |    ${roundToSql(
          "LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4" +
          " + LEAST(CAST(len(list_filter(toks, x -> list_contains(" + stopLst + ", x))) AS DOUBLE)" +
          " / GREATEST(CAST(len(toks) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.3" +
          " + LEAST(CAST(n_punct AS DOUBLE) * 10.0 / GREATEST(length(text), 1), 1.0) * 0.3", 4)} AS quality_score,
       |    len(list_filter(toks, x -> list_contains($allLst, x))) AS marker_hits
       |  FROM t)""".stripMargin
  }

  /** BPE-ish pre-tokenizer regex (GPT-2-style shape: contractions,
    * space-prefixed letter runs, digit runs, punctuation runs,
    * whitespace runs). Written with explicit whitespace classes and
    * non-capturing groups so Java regex (Spark) and RE2 (DuckDB) match
    * identically — both are leftmost-first on alternation. */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9'\\t\\n\\r\\f ]+|'+|[\\t\\n\\r\\f ]+"

  def bpePieces(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpePattern), lit(0))

  def bpePiecesSql(text: String): String =
    s"regexp_extract_all(lower($text), '${bpePattern.replace("'", "''")}', 0)"

  /** DuckDB spelling of the 60-bit md5-prefix SimHash (the exact
    * per-bit majority vote [[graft.functions.SimHashUtil.simhash60]]
    * computes): nested lambdas — outer over the 60 bit positions, inner
    * the ±1 vote per token hash. `hs` is a BIGINT list column. */
  def simhash60Sql(hs: String): String =
    s"CAST(COALESCE(list_sum(list_transform(range(0,60), b -> " +
      s"CASE WHEN COALESCE(list_sum(list_transform($hs, h -> " +
      s"CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0 " +
      s"THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)), 0) AS BIGINT)"

  /** MinHash(16) + LSH(4×4) verified near-dup pairs — shared by
    * q_minhash_dedup and the cluster-resolution operator. toks/sh/hsh
    * are materialized as columns (not captured in lambdas — see the
    * q_ngram_jaccard perf notes); candidates come from band-bucket hash
    * joins on (band_id, band_key); exact verification joins the hashed
    * shingle sets back in and intersects longs, not strings. The
    * (doc_id, hsh, sig) subtree is persisted: `banded` consumes it once
    * and the verification joins twice more — without the cache the
    * shingle+md5 signature work (the dominant cost) runs 3×. */
  def minhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashPairsOf(Tables.documents(s, dir))

  /** MinHash/LSH tuning shared by the batch pair generator and the
    * streaming dedup filter — identical constants keep the two paths
    * provably equivalent. */
  val MinhashK = 16
  val LshBands = 4
  val LshRows = 4

  /** (doc_id, hsh) hashed-shingle projection — the text-derived half
    * of signature computation, split out so [[minhashPairsOf]] can
    * hand the hashes straight to [[minhashPairsOfHashes]] without a
    * signature column that would only be dropped and recomputed. */
  def minhashHashes(docs: DataFrame): DataFrame = docs
    .withColumn("toks", tokens(col("text")))
    .select(col("doc_id"), shingles(col("toks")).as("sh"))
    .select(col("doc_id"), shingleHashes(col("sh")).as("hsh"))

  /** (doc_id, hsh, sig) signature projection — works on batch AND
    * streaming inputs (pure column ops, no aggregation). */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashHashes(docs).withColumn("sig", minhashSig(col("hsh"), MinhashK))

  /** Explode a signature row into its (band_id, band_key) LSH buckets;
    * extra columns pass through. */
  def bandedBuckets(sigs: DataFrame): DataFrame = sigs
    .select(col("doc_id"), col("hsh"),
      posexplode(transform(sequence(lit(0), lit(LshBands - 1)),
        b => array_join(transform(slice(col("sig"), b * LshRows + 1, lit(LshRows)),
          v => v.cast("string")), ","))))
    .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_key")

  /** [[minhashPairs]] over an arbitrary (doc_id, text, …) DataFrame —
    * lets cluster resolution run pair generation over exact-dup group
    * representatives instead of the full corpus.
    *
    * `maxBucket`: optional hot-bucket cap — the batch twin of the
    * streaming path's `maxPerBucket` and the n-gram df-cap. A band
    * bucket's candidate volume is C(|bucket|,2): DedupScaleProbe
    * measured hot-bucket sizes growing linearly with the corpus
    * (509 members at 500k docs vs a p99.9 of 3), i.e. a quadratic
    * term that at 1000× the corpus would dominate the stage. The cap
    * bounds the LEFT (smaller-id) side of the candidate join at the
    * `maxBucket` lowest doc_ids per bucket while the right side stays
    * complete — every document is still verified against the bucket's
    * retained members (the streaming cap's semantics: membership is
    * capped, verification never skipped), so per-bucket candidates are
    * K·n instead of C(n,2). Retention differs from the streaming twin
    * deliberately: batch keeps the LOWEST ids (deterministic, and the
    * keeper rule prefers low ids), streaming keeps the newest its
    * arrival order admitted. A doc beyond the cap can only miss a
    * pair with ANOTHER beyond-cap doc in the same degenerate bucket —
    * and only if no other band pairs them. Default None = exact LSH
    * semantics — the declared oracle-checked queries use None; capped
    * form is the documented production setting for boilerplate-heavy
    * corpora. */
  def minhashPairsOf(docs: DataFrame, maxBucket: Option[Int] = None): DataFrame =
    minhashPairsOfHashes(minhashHashes(docs), maxBucket)

  /** [[minhashPairsOf]] starting from a (doc_id, hsh) frame of
    * pre-hashed shingle sets — the entry point for callers that
    * already own the hashes (the fused corpus feature table), so pair
    * generation never touches text a second time. Signature
    * computation from `hsh` is k cheap affine folds, no re-hashing.
    *
    * CACHE LIFECYCLE: the (doc_id, hsh, sig) subtree is persisted
    * because banding consumes it once and verification joins it twice
    * more — without the cache the signature work runs 3×. The
    * VERIFIED pair set (orders of magnitude smaller than the corpus:
    * only colliding-AND-jaccard-confirmed pairs survive) is
    * materialized eagerly and the wide signature cache is released
    * before returning, so a long-lived session never accumulates
    * per-invocation signature frames. The returned frame is persisted
    * and owned by the caller; session teardown or
    * `cacheManager.clearCache()` reclaims it. */
  def minhashPairsOfHashes(hashed: DataFrame, maxBucket: Option[Int] = None): DataFrame = {
    val d = hashed.withColumn("sig", minhashSig(col("hsh"), MinhashK))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandedAll = bandedBuckets(d).drop("hsh")
    val bandedA = maxBucket match {
      case None => bandedAll
      case Some(k) =>
        // rank within bucket by doc_id; the window shuffles on the
        // same (band_id, band_key) key the candidate join needs
        bandedAll
          .withColumn("__r", row_number().over(
            Window.partitionBy(col("band_id"), col("band_key"))
              .orderBy(col("doc_id"))))
          .filter(col("__r") <= k).drop("__r")
    }
    val cand = bandedA.as("a").join(bandedAll.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // CANDIDATE-ID RESTRICTION of the verify side (VERDICT r14 #1):
    // the verify joins below co-locate each pair with its two shingle
    // sets. Joined against the FULL (doc_id, hsh) frame, the moment
    // `cand` outgrows broadcast range the whole corpus's hsh arrays
    // shuffle — including every document that collided in NO band
    // (PIPELINE_SCALE r14: cc_dedup 59.9 → 1,916 MB at 1×→10×, a
    // 32× step at the 1×→3× plan transition). Only docs that appear
    // in ≥1 candidate pair can contribute to verification, so the
    // hsh side is semi-restricted to the candidate-id set first —
    // broadcast when the exact count (cheap: skinny column off the
    // persisted pair frame) fits the band, shuffle-semi past it (the
    // restriction still holds; only the SEMI's strategy degrades).
    // What still moves is information-theoretically owed: each
    // candidate doc's hsh once per verify side, plus h_a re-keyed
    // per PAIR in the second join (bounded: exact-dup contraction
    // kills clique fan-out and maxBucket caps per-bucket pairs).
    val candIds = cand.select(col("id_a").as("doc_id"))
      .union(cand.select(col("id_b").as("doc_id"))).distinct()
    val idsSmall = candIds.count() <= PairVerifyBroadcastIdCap
    val sets = d.select(col("doc_id"), col("hsh"))
      .join(if (idsSmall) broadcast(candIds) else candIds,
        Seq("doc_id"), "left_semi")
    val pairs = cand
      .join(sets.select(col("doc_id").as("id_a"), col("hsh").as("h_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("hsh").as("h_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("h_a"), col("h_b"))).cast("double"))
      .withColumn("jaccard", col("inter") / (size(col("h_a")) + size(col("h_b")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // materialize the small verified set, then drop the wide cache
    cand.unpersist(false)
    d.unpersist(false)
    pairs
  }

  /** Candidate-id ceiling for the verify restriction's BROADCAST arm
    * (one long column; 4M ids ≈ 64 MB of hash relation). Past it the
    * semi-join rides a shuffle — the restriction itself never turns
    * off. */
  val PairVerifyBroadcastIdCap = 4_000_000L

  /** The recall computation shared by q_dedup_recall (uncapped) and
    * q_dedup_recall_capped: verified MinHash pairs (optionally
    * bucket-capped) joined against the exact same-lang n-gram Jaccard
    * truth — (n_truth, n_candidates, n_hits, recall), one row. */
  private def dedupRecallOf(s: SparkSession, dir: String,
      maxBucket: Option[Int]): DataFrame = {
    val truth = ngramJaccardPairs(s, dir).select(col("id_a"), col("id_b"))
    val cand = minhashPairsOf(Tables.documents(s, dir), maxBucket)
      .select(col("id_a"), col("id_b"))
    val hits = truth
      .join(cand.withColumn("m", lit(1)), Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum(col("m")), lit(0L)).cast("long").as("n_hits"))
    val nc = cand.agg(count(lit(1)).as("n_candidates"))
    hits.crossJoin(nc)
      .select(col("n_truth"), col("n_candidates"), col("n_hits"),
        when(col("n_truth") === 0, lit(1.0))
          .otherwise(roundTo(
            col("n_hits").cast("double") / col("n_truth"), 6)).as("recall"))
  }

  /** Oracle twin of [[dedupRecallOf]] — the t-prefixed truth chain
    * composed with the (optionally capped) minhash CTEs. */
  private def dedupRecallSql(maxBucket: Option[Int]): String =
    s"""WITH ${minhashPairsSqlCtes(maxBucket)},
       |td AS (SELECT doc_id, lang,
       |    ${shingleHashesSql(shinglesSql(s"(${tokensSql("text")})"))} AS hsh FROM documents),
       |tex AS (SELECT doc_id, lang, unnest(hsh) AS h FROM td),
       |tjx AS (SELECT * FROM tex WHERE h NOT IN (
       |    SELECT h FROM tex GROUP BY h HAVING count(*) > $NgramDfCap)),
       |tsz AS (SELECT doc_id, len(hsh) AS sz FROM td),
       |tc AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
       |  FROM tjx a JOIN tjx b
       |    ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |tr AS (
       |  SELECT tc.id_a, tc.id_b
       |  FROM tc JOIN tsz sa ON tc.id_a = sa.doc_id
       |          JOIN tsz sb ON tc.id_b = sb.doc_id
       |  WHERE CAST(tc.common AS DOUBLE) / (sa.sz + sb.sz - tc.common) >= 0.5),
       |mp AS (SELECT id_a, id_b FROM np),
       |agg AS (
       |  SELECT (SELECT count(*) FROM tr) AS n_truth,
       |    (SELECT count(*) FROM mp) AS n_candidates,
       |    (SELECT count(*) FROM tr JOIN mp
       |       ON tr.id_a = mp.id_a AND tr.id_b = mp.id_b) AS n_hits)
       |SELECT n_truth, n_candidates, n_hits,
       |  CASE WHEN n_truth = 0 THEN 1.0
       |       ELSE ${roundToSql("CAST(n_hits AS DOUBLE) / n_truth", 6)}
       |  END AS recall
       |FROM agg""".stripMargin

  /** Hot-shingle document-frequency cap of [[ngramJaccardPairs]] —
    * the declared-query default, interpolated into the q_ngram_jaccard
    * and q_dedup_recall oracles so both engines drop the same hashes. */
  val NgramDfCap = 10000

  /** Hot-bucket cap used by the declared capped query — interpolated
    * into BOTH the Spark call and the oracle SQL (the MinhashK
    * pattern) so the two spellings cannot desynchronize. */
  val CapBucket = 64

  /** Token-window width for verbatim substring dedup — interpolated
    * into both q_substring_dedup spellings (the MinhashK pattern). */
  val SubstrWindow = 8

  // ---------------------------------------------------------------
  // Shared substring-dedup core (r9 deferred self-review item): ONE
  // derivation of the window-hash + duplicated-start machinery for
  // q_substring_dedup / q_substring_spans / q_substring_clean — three
  // hash-green queries previously carried inline copies that a future
  // edit to one could silently diverge.
  // ---------------------------------------------------------------

  /** GENERATION-LOOP metrics appended to the input frame (columns
    * n_windows, max_window_mult, rep_window_share, loop_flag): the
    * stride-1 [[SubstrWindow]]-token window hashes are sorted IN-ROW
    * and ONE fold counts the maximum multiplicity and the
    * repeated-window mass — pure projection, zero shuffle, zero
    * state, so it composes with batch scans AND any streaming
    * pipeline ([[graft.stream.StreamingDedup.loopGate]]). A window
    * recurring ≥ 3× flags (two repeats happen in natural prose;
    * three is model-loop degeneracy). Input needs (text); all input
    * columns pass through. */
  def loopStats(docs: DataFrame): DataFrame = {
    val w = SubstrWindow
    // STAGED token materialization (the Dsir.featureBuckets trap:
    // referencing tokens(text) inside the window lambda re-runs the
    // regex split per window — O(n²) splits per doc; measured 3.8×
    // wall on q_loop_detect before this column)
    val toks = col("__loop_toks")
    val hs = when(size(toks) >= w,
      sort_array(transform(sequence(lit(1), size(toks) - (w - 1)),
        st => hash60(concat_ws(" ", slice(toks, st, lit(w)))))))
      .otherwise(array().cast("array<long>"))
    // fold over the sorted hashes: track the current run, fold
    // closed runs into (max multiplicity, repeated-window mass)
    val stats = aggregate(col("__loop_hs"),
      struct(lit(-1L).as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit(0L).as("reps")),
      (acc, x) => when(x === acc.getField("prev"),
        struct(x.as("prev"), (acc.getField("run") + 1L).as("run"),
          acc.getField("best").as("best"), acc.getField("reps").as("reps")))
        .otherwise(struct(x.as("prev"), lit(1L).as("run"),
          greatest(acc.getField("best"), acc.getField("run")).as("best"),
          (acc.getField("reps") + when(acc.getField("run") > 1,
            acc.getField("run")).otherwise(0L)).as("reps"))),
      acc => struct(
        greatest(acc.getField("best"), acc.getField("run")).as("best"),
        (acc.getField("reps") + when(acc.getField("run") > 1,
          acc.getField("run")).otherwise(0L)).as("reps")))
    docs
      .withColumn("__loop_toks", tokens(col("text")))
      .withColumn("__loop_hs", hs)
      .withColumn("n_windows", size(col("__loop_hs")).cast("long"))
      .withColumn("__loop_st", stats)
      .withColumn("max_window_mult", col("__loop_st.best"))
      .withColumn("rep_window_share",
        when(col("n_windows") > 0, roundTo(
          col("__loop_st.reps").cast("double") / col("n_windows"), 6))
          .otherwise(lit(0.0)))
      .withColumn("loop_flag", col("max_window_mult") >= 3)
      .drop("__loop_toks", "__loop_hs", "__loop_st")
  }

  /** The tokenized documents base every substring query starts from:
    * (doc_id, toks, n). */
  private def substrTokenized(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))

  /** Run `finish` over the DUPLICATED-WINDOW STARTS frame
    * (doc_id, st): windows of [[SubstrWindow]] consecutive tokens at
    * stride 1 hash map-side INSIDE the explode (the
    * Generate-placement rule — text never shuffles, only skinny
    * (doc_id, st, h) rows); a window is duplicated iff its hash
    * occurs more than once corpus-wide — ONE hash-keyed count
    * (map-side partials) applied back as a semi-join on the same key.
    *
    * Lifecycle owned here: the O(total tokens) window-hash frame
    * persists across its two consumers (the sf-local trade, r8
    * verdict — at 100 TB drop the persist and recompute the map-side
    * explode instead of spilling the corpus token count to disk), the
    * finished result materializes persisted, and the window cache
    * releases before returning (the minhashPairsOfHashes lifecycle —
    * no leaked cache entry per invocation). */
  private def withDupWindowStarts(base: DataFrame, w: Int)(
      finish: DataFrame => DataFrame): DataFrame = {
    val wins = base.select(col("doc_id"),
      explode(transform(sequence(lit(1), col("n") - (w - 1)),
        st => struct(st.as("st"),
          hash60(concat_ws(" ", slice(col("toks"), st, lit(w)))).as("h"))))
        .as("sw"))
      .select(col("doc_id"), col("sw.st").as("st"), col("sw.h").as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupHashes = wins.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select(col("h"))
    val dupStarts = wins.join(dupHashes, Seq("h"), "left_semi")
      .select(col("doc_id"), col("st"))
    val out = finish(dupStarts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    wins.unpersist(false)
    out
  }

  /** Deterministic leakage-safe split of a cluster REPRESENTATIVE —
    * 90/5/5 train/val/test by salted-hash bucket (the q_sample_det
    * discipline: no per-row RNG, reruns and late-arriving cluster
    * members land in the same split). ONE definition shared by
    * q_leakage_split and the streaming cluster store
    * ([[graft.stream.StreamingDedup.updateClusterStore]]), so batch
    * and stream agree by construction, not by parallel maintenance. */
  def splitOfRep(rep: Column): Column = {
    val bucket = hash60(concat(lit("split:"), rep.cast("string"))) % 100
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise(lit("test"))
  }

  /** Merge stride-1 duplicated window starts into MAXIMAL spans by
    * gaps-and-islands: windows all have width `w` and starts arrive
    * sorted per doc, so the running span end is lag(st)+w-1 and a new
    * island starts exactly when st > lag(st)+w (overlapping OR
    * abutting windows merge — one verbatim region, one span).
    * Returns (doc_id, island, s0, s1) with s1 = last start + w - 1;
    * the island sum and the span aggregation shuffle on doc_id over
    * skinny (doc_id, st) rows only. */
  private def mergeDupSpans(dupStarts: DataFrame, w: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("st"))
    dupStarts
      .withColumn("brk",
        when(lag(col("st"), 1).over(byDoc).isNull ||
          col("st") <= lag(col("st"), 1).over(byDoc) + w, 0).otherwise(1))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("st")).as("s0"), (max(col("st")) + (w - 1)).as("s1"))
  }

  /** DuckDB restatement of the shared substring chain, as CTEs:
    * t (tokenized) → b (≥ w tokens) → w (window hashes, starts) →
    * dh (duplicated hashes) → dw (duplicated starts — exactly
    * [[withDupWindowStarts]]'s frame) → g/i/sp (gaps-and-islands
    * maximal spans — exactly [[mergeDupSpans]]). One derivation for
    * the three substring oracles, mirroring the one Scala core. */
  private def substrCtesSql(w: Int): String =
    s"""t AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
       |b AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= $w),
       |w AS (
       |  SELECT doc_id, s AS st,
       |    ${hash60Sql(s"array_to_string(toks[s:s+${w - 1}], ' ')")} AS h
       |  FROM b, unnest(range(1, n - ${w - 2})) AS u(s)),
       |dh AS (SELECT h FROM w GROUP BY h HAVING count(*) > 1),
       |dw AS (SELECT doc_id, st FROM w WHERE h IN (SELECT h FROM dh)),
       |g AS (
       |  SELECT doc_id, st,
       |    CASE WHEN lag(st) OVER (PARTITION BY doc_id ORDER BY st) IS NULL
       |           OR st <= lag(st) OVER (PARTITION BY doc_id ORDER BY st) + $w
       |         THEN 0 ELSE 1 END AS brk
       |  FROM dw),
       |i AS (
       |  SELECT doc_id, st,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY st
       |                   ROWS UNBOUNDED PRECEDING) AS island
       |  FROM g),
       |sp AS (SELECT doc_id, island, min(st) AS s0, max(st) + ${w - 1} AS s1
       |       FROM i GROUP BY doc_id, island)""".stripMargin

  /** DuckDB spelling of [[minhashPairs]] as a CTE block ending in a
    * relation named `np(id_a, id_b)`. `maxBucket` mirrors
    * [[minhashPairsOf]]'s one-sided hot-bucket cap: the candidate
    * join's LEFT side keeps only the `k` lowest doc_ids per band
    * bucket, the right side stays complete. */
  /** The d/sig/banded CTE prefix shared by [[minhashPairsSqlCtes]]
    * and the q_doc_similar oracle — constants interpolated from
    * MinhashK/LshBands/LshRows so a tuning change updates every
    * oracle spelling and the Spark path together. */
  def minhashBaseSqlCtes: String = {
    val toksSql = tokensSql("text")
    s"""d AS (SELECT doc_id,
       |    ${shingleHashesSql(shinglesSql(s"($toksSql)"))} AS hsh FROM documents),
       |sig AS (SELECT doc_id, hsh, ${minhashSigSql("hsh", MinhashK)} AS sig FROM d),
       |banded AS (
       |  SELECT doc_id, b.band_id,
       |    array_to_string(sig[b.band_id * $LshRows + 1 : b.band_id * $LshRows + $LshRows], ',') AS band_key
       |  FROM sig, (SELECT unnest(range(0, $LshBands)) AS band_id) b)""".stripMargin
  }

  def minhashPairsSqlCtes(maxBucket: Option[Int] = None): String = {
    val candLeft = maxBucket match {
      case None => "banded"
      case Some(k) =>
        s"""(SELECT doc_id, band_id, band_key FROM (
           |    SELECT doc_id, band_id, band_key,
           |      row_number() OVER (PARTITION BY band_id, band_key
           |                         ORDER BY doc_id) AS rn
           |    FROM banded) WHERE rn <= $k)""".stripMargin
    }
    s"""$minhashBaseSqlCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM $candLeft a JOIN banded b
       |    ON a.band_id = b.band_id AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id),
       |np AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_intersect(da.hsh, db.hsh)) AS DOUBLE) AS inter,
       |    len(da.hsh) AS sz_a, len(db.hsh) AS sz_b
       |  FROM cand c JOIN d da ON c.id_a = da.doc_id
       |              JOIN d db ON c.id_b = db.doc_id
       |  WHERE CAST(len(list_intersect(da.hsh, db.hsh)) AS DOUBLE)
       |        / (len(da.hsh) + len(db.hsh) - CAST(len(list_intersect(da.hsh, db.hsh)) AS DOUBLE)) >= 0.5)""".stripMargin
  }

  /** Near-dup cluster resolution over the verified MinHash+LSH pair
    * graph: connected components, representative = min doc_id per
    * component, keep-one-per-cluster flags, cluster sizes.
    *
    * EXACT-DUP PRE-CONTRACTION (the standard web-dedup move): identical
    * normalized texts produce identical minhash signatures by
    * construction, so pair generation runs over ONE representative per
    * digest group and labels expand back through the group map at the
    * end. In a raw web corpus exact copies dominate pair volume (a
    * k-copy group alone is k(k−1)/2 LSH pairs); contracting first makes
    * pair generation scale with unique content. Component structure is
    * provably unchanged: copies pair with their representative at
    * jaccard 1.0, so expanding a rep's label to its group reproduces
    * exactly the components of the uncontracted graph — the DuckDB
    * WITH-RECURSIVE oracle runs uncontracted and the results hash-match.
    *
    * The component loop is [[Graph.connectedComponents]]: min-label
    * propagation + pointer jumping (O(log diameter) rounds),
    * localCheckpoint-flat plans, measured-size parallelism, and a HARD
    * FAILURE on non-convergence instead of silently-wrong labels.
    * Singletons (docs whose group never entered the pair graph) get
    * rep = group rep in the final expansion — they never enter the loop.
    */
  /** (doc_id, cluster_rep) for EVERY document — the contraction + CC +
    * expansion core shared by [[dedupClusters]] (which adds sizes and
    * keeper flags) and the near-dup corpus selection (which only needs
    * `doc_id === cluster_rep`). Recomputing this frame is cheap: the
    * CC labels come back as a flat materialized DataFrame, so a second
    * consumer re-runs only the skinny expansion join, never the loop. */
  /** Default CC round bound shared by every clustering entry point —
    * ONE constant so [[dedupClusters]]' memo-route check can never
    * silently diverge from the parameter defaults. */
  val DefaultCcRounds = 64

  def clusterAssignments(s: SparkSession, dir: String,
      maxRounds: Int = DefaultCcRounds): DataFrame = {
    val docs = Tables.documents(s, dir)
    // doc → exact-dup group rep (min doc_id per normalized-text digest):
    // one text scan, then one skinny (doc_id, digest) shuffle — the text
    // body never enters the window. Degree skew: a d-copy group puts d
    // skinny rows in one window partition; WindowExec spills past 4096
    // rows (ExternalAppendOnlyUnsafeRowArray), so a boilerplate page
    // duplicated millions of times degrades to a disk-streaming task,
    // not an OOM. (A groupBy+join formulation has the same d-row hot
    // path on the join back — assigning every copy its rep inherently
    // routes d rows through the digest key.)
    val win = Window.partitionBy(col("h"))
    val d2g = docs.select(col("doc_id"), md5(normText(col("text"))).as("h"))
      .withColumn("grp", min(col("doc_id")).over(win))
      .select(col("doc_id"), col("grp"))
    // one representative text per digest group via struct-min
    // aggregation: map-side partial agg drops same-partition copies, so
    // each group's text crosses the shuffle AT MOST once and no join
    // ever carries a text body (a rep-id semi-join would re-shuffle the
    // full text side)
    val reps = docs
      .select(md5(normText(col("text"))).as("h"),
        struct(col("doc_id"), col("text")).as("r"))
      .groupBy(col("h")).agg(min(col("r")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
    val pairs = minhashPairsOf(reps).select(col("id_a"), col("id_b"))
    ccExpand(d2g, pairs, maxRounds)
  }

  /** The shared CC + expansion tail of cluster assignment: run
    * connected components over the rep-level pair graph and expand
    * labels back through the (doc_id, grp) exact-dup map. */
  private def ccExpand(d2g: DataFrame, pairs: DataFrame, maxRounds: Int): DataFrame = {
    val labels = Graph.connectedComponents(pairs, maxRounds)
    d2g
      .join(labels.withColumnRenamed("node", "grp"), Seq("grp"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("grp")).as("cluster_rep"))
  }

  /** [[clusterAssignments]] from the fused feature table
    * (doc_id, dig, hsh, …) — NO text scan: the exact-dup group map is
    * a window over the digest, the per-group representative carries
    * its pre-hashed shingle set through one skinny struct-min shuffle,
    * and pair generation runs [[minhashPairsOfHashes]] over the reps.
    * (Identical labels to the text form: docs sharing a normalized-
    * text digest share the token sequence, hence the hash set, so any
    * group member's `hsh` is THE group's `hsh`.) */
  def clusterAssignmentsOfFeatures(feats: DataFrame,
      maxRounds: Int = DefaultCcRounds): DataFrame = {
    val win = Window.partitionBy(col("dig"))
    val d2g = feats.select(col("doc_id"), col("dig"))
      .withColumn("grp", min(col("doc_id")).over(win))
      .select(col("doc_id"), col("grp"))
    val reps = feats
      .select(col("dig"), struct(col("doc_id"), col("hsh")).as("r"))
      .groupBy(col("dig")).agg(min(col("r")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.hsh").as("hsh"))
    val pairs = minhashPairsOfHashes(reps).select(col("id_a"), col("id_b"))
    ccExpand(d2g, pairs, maxRounds)
  }

  def dedupClusters(s: SparkSession, dir: String,
      maxRounds: Int = DefaultCcRounds): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // default geometry serves from the session's memoized assignment
    // (one CC run per session, shared with keepers + leakage split);
    // a custom maxRounds is a convergence experiment — compute direct
    val expanded = (if (maxRounds == DefaultCcRounds) clusterAssignmentsMemo(s, dir)
      else clusterAssignments(s, dir, maxRounds))
      .persist(MEMORY_AND_DISK) // consumed by the size agg + final join
    val sizes = expanded.groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("cluster_size"))
    val out = expanded.join(sizes, Seq("cluster_rep"))
      .select(col("doc_id"), col("cluster_rep"), col("cluster_size"),
        (col("doc_id") === col("cluster_rep")).as("is_keeper"))
      .orderBy("doc_id")
      .persist(MEMORY_AND_DISK)
    out.count() // materialize, then release the assignment cache
    expanded.unpersist(false)
    out
  }

  // ---- source-priority keeper selection (round-19) -------------------

  /** Source-priority tiers for near-dup keeper selection — the
    * production rule ([[dedupClusters]]' min-id keeper is an arbitrary
    * but deterministic stand-in): when a curated copy and a web scrape
    * collide in one cluster, KEEP THE CURATED COPY. Tier lists are
    * interpolated into the q_dedup_keeper oracle so the two spellings
    * cannot desynchronize (the MinhashK/LshBands pattern). On the
    * synthetic corpus: src0–4 curated (tier 0), src5–9 licensed
    * (tier 1), everything else web (tier 2). */
  val CuratedSources: Seq[String] = (0 to 4).map(i => s"src$i")
  val LicensedSources: Seq[String] = (5 to 9).map(i => s"src$i")

  /** Tier of a source value — lower keeps first. Unknown sources fall
    * to the web tier, so a new crawl never silently outranks curated
    * data. */
  def sourcePriority(src: Column): Column =
    when(src.isin(CuratedSources: _*), 0)
      .when(src.isin(LicensedSources: _*), 1)
      .otherwise(2)

  /** Keeper selection by (priority asc, quality desc, doc_id asc) over
    * an existing cluster assignment: `assign` is (doc_id,
    * cluster_rep), `meta` is (doc_id, source, quality_score). Pure
    * composition — no text ever moves: the join and the one window
    * shuffle carry only the skinny per-doc scalars, so the step is
    * O(docs) rows of a few columns regardless of corpus byte size.
    * The total order is deterministic by construction (quality_score
    * is the 4-digit-rounded exact boundary, doc_id breaks residual
    * ties), so a re-run — or the DuckDB replay — elects the same
    * keepers. */
  def keeperByPriority(assign: DataFrame, meta: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cluster_rep"))
      .orderBy(col("priority").asc, col("quality_score").desc,
        col("doc_id").asc)
    assign.join(meta, Seq("doc_id"))
      .withColumn("priority", sourcePriority(col("source")))
      .withColumn("keeper_id", first(col("doc_id")).over(w))
      .select(col("doc_id"), col("cluster_rep"), col("source"),
        col("priority"), col("quality_score"), col("keeper_id"),
        (col("doc_id") === col("keeper_id")).as("is_keeper"))
  }

  /** [[keeperByPriority]] over the SESSION-MEMOIZED cluster assignment
    * (no second CC run — the r9 memo discipline) with per-doc source
    * from the documents scan (column-pruned: doc_id + source only)
    * and quality from the fused feature projection. */
  def dedupKeeperAssignments(s: SparkSession, dir: String): DataFrame = {
    val meta = corpusFeatures(s, dir, withRep = false)
      .select(col("doc_id"), col("quality_score"))
      .join(graft.io.Tables.documents(s, dir)
        .select(col("doc_id"), col("source")), Seq("doc_id"))
    keeperByPriority(clusterAssignmentsMemo(s, dir), meta)
  }

  /** Sliding-window document chunking over a (doc_id, text, …) frame:
    * `chunk`-token chunks at `stride` (overlap = chunk − stride); the
    * tail chunk may be short; an empty doc yields one empty chunk
    * (chunk_tokens 0, first_token null — `try_element_at`, because
    * plain `element_at` on an empty array THROWS under Spark 4's
    * default ANSI mode). Chunk starts are generated inside the
    * explode from the token count, so only the chunk rows ever exist —
    * fully map-side, no joins. */
  /** Default chunk geometry — interpolated into the q_chunk_docs
    * oracle SQL so the two spellings cannot desynchronize (the
    * MinhashK/LshBands pattern). */
  val ChunkSize = 64
  val ChunkStride = 48

  /** The q_corpus_pipeline selection (see that query's scaladoc):
    * near-dup-cluster keepers ∧ quality/lang ∧ repetition gates ∧
    * eval-set exclusion ∧ decontamination — exposed as a function so
    * the write side ([[writeTrainingShards]]) and the declared query
    * share one definition.
    *
    * PLAN SHAPE (the round-6 restructure, PlanSpec-pinned): documents
    * is scanned exactly ONCE — [[corpusFeatures]] computes digest,
    * shingle hashes, quality, and repetition metrics in a single
    * fused projection and the skinny result is persisted; cluster
    * assignment ([[clusterAssignmentsOfFeatures]]), decontamination
    * (explode of the stored `hsh`, identical values to
    * `ngram_hash_explode` by the generator's contract), and every
    * gate run off the cache. The previous form re-scanned the full
    * text body ~5× — at 100 TB that is ~500 TB of text I/O where one
    * scan + a feature table a fraction of the corpus size suffices. */
  /** MEMO for the expensive skinny pipeline stages — see
    * [[graft.ops.Memo]] (round-9: shared, race-free, and swept when
    * the owning session stops, closing the r8 advice on unbounded
    * accumulation). Values are EAGER `localCheckpoint`s: a handful of
    * rows of materialized RDD blocks that (a) survive the harness's
    * per-query `cacheManager.clearCache()` (checkpoint blocks are not
    * InMemoryRelations) and (b) carry a flat plan (no lineage back to
    * the text scan). Ownership is the MEMO's, not the caller's — this
    * closes the round-7 advice gap where the returned `selected`
    * frame was persisted but no caller ever unpersisted it. One
    * Verify+Bench session computes the keeper selection once, and
    * q_corpus_pipeline / q_corpus_select_dedup / q_training_shards
    * all serve from it. */
  private def memoizedStage(s: SparkSession, dir: String, stage: String)(
      compute: => DataFrame): DataFrame =
    Memo.stage(s, dir, stage)(compute)

  /** The FULL (doc_id, cluster_rep) assignment, memoized per
    * (session, dir) — ONE connected-components run per session now
    * serves the corpus-pipeline keepers, q_dedup_clusters, AND
    * q_leakage_split (r9 verdict #6: the leakage split previously
    * re-ran the whole text scan + pair generation + CC for labels the
    * session had already computed). `feats0` lets the corpus pipeline
    * donate its already-persisted feature frame; the standalone path
    * computes a PRUNED (doc_id, dig, hsh) projection — none of the
    * quality/repetition arithmetic — and releases it once the labels
    * checkpoint. Labels are identical under either path (docs sharing
    * a normalized-text digest share the token sequence, hence the
    * hash set — the [[clusterAssignmentsOfFeatures]] contract). */
  private[graft] def clusterAssignmentsMemo(s: SparkSession, dir: String,
      feats0: Option[DataFrame] = None): DataFrame =
    memoizedStage(s, dir, "cluster_assignments") {
      feats0 match {
        case Some(f) => clusterAssignmentsOfFeatures(f).localCheckpoint(true)
        case None =>
          val f = corpusFeatures(s, dir, withRep = false)
            .select(col("doc_id"), col("dig"), col("hsh"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val out = clusterAssignmentsOfFeatures(f).localCheckpoint(true)
          f.unpersist(false)
          out
      }
    }

  /** The near-dup cluster-keeper id set (doc_id == cluster_rep),
    * derived from the memoized full assignment on first use and
    * itself memoized per (session, dir) — clustering consumes only
    * the `dig` and `hsh` columns, which are identical under either
    * `withRep` spelling of [[corpusFeatures]], so every consumer
    * shares one computation. */
  private def clusterKeeperIds(s: SparkSession, dir: String,
      feats: => DataFrame): DataFrame =
    memoizedStage(s, dir, "cluster_keepers") {
      clusterAssignmentsMemo(s, dir, Some(feats))
        .filter(col("doc_id") === col("cluster_rep")).select(col("doc_id"))
        .localCheckpoint(true)
    }

  /** The LAZY selection plan behind [[corpusPipelineKeepers]], plus
    * the persisted feature frame backing it (returned so the caller
    * can release the cache once the selection materializes).
    * Package-visible: PlanSpec audits the one-text-scan guarantee on
    * THIS plan — the memoized public entry returns a checkpointed
    * frame whose plan no longer shows the scan it already paid. */
  /** Decontamination shingle DOC-FREQUENCY cap: shingles present in
    * more than n_docs/[[DeconDfDenom]] documents (floor
    * [[DeconDfFloor]] for tiny corpora) are template/boilerplate mass,
    * not contamination evidence — true eval contamination lives in
    * RARE n-grams. Without the cap, extraction boilerplate shared by
    * every page (a) flags the whole corpus contaminated and (b) makes
    * the (doc, eval) shingle join |docs|·|evals| — the superlinear
    * stage the round-13 PIPELINE_SCALE probe caught (NOTES_r13). The
    * same df-cap idea as the MinHash path's hot-bucket CapBucket.
    *
    * [[DeconDfAbs]] is the r14 tightening (DiagDecon, NOTES_r14): a
    * RELATIVE cap alone keeps every shingle whose df grows with the
    * corpus but sits under n/20 — template families at df ≈ n/50
    * made the eval pair join QUADRATIC again one decade up
    * (1.26M → 127M pair rows at 10× in DIAG_DECON.json). Capping the
    * threshold at an absolute df bounds pairs-per-shingle by a
    * CONSTANT, so the join is O(n) at every scale: a shingle in >256
    * documents is boilerplate no matter how big the corpus. Below
    * n_docs = 20·256 the absolute arm is inactive — sf0.01/sf0.1
    * results and pins are bit-identical. */
  val DeconDfDenom = 20
  val DeconDfFloor = 5
  val DeconDfAbs = 256

  /** The df-capped decontamination pair aggregate over a (doc_id, h)
    * DISTINCT-shingles-per-doc stream — ONE spelling behind
    * q_decontaminate and the pipeline's contamination substage:
    * (doc_id, eval_id, shared_shingles) for corpus docs sharing ≥ 3
    * kept shingles with an eval doc (eval = doc_id % 97 ≡ 0).
    * count(*) over the stream IS document frequency because both
    * feeders emit DISTINCT hashes per doc (ngram_hash_explode /
    * ngram_hashes contract).
    *
    * R15 RESTRUCTURE (the 30× second-decade probe arm + DIAG_DECON
    * attribution): the r14 shape anti-joined the CORPUS stream
    * against a broadcast hot-shingle set, then joined the eval side —
    * two map-side probes per corpus shingle row, with the hot set
    * shipping to every executor even though only its intersection
    * with EVAL hashes can ever matter (and under the absolute
    * [[DeconDfAbs]] arm the hot set's size bound is
    * total_shingles/cap — linear in the corpus, so the broadcast's
    * old "bounded at any corpus size" claim no longer held; measured
    * flat at 1,120 hashes from 1M→3M probe docs only because the
    * generator's template family saturates). Capping the EVAL side
    * instead is PAIR-IDENTICAL — a pair exists iff its hash survives
    * on both sides of the equi-join, so filtering the eval side alone
    * removes exactly the same pairs — and leaves the corpus stream a
    * single probe against the (production-bounded: eval suites are
    * MBs) eval broadcast. The full-corpus df aggregate stays: the cap
    * must see corpus df BEFORE any eval restriction — restricting
    * first would materialize Θ(df) rows per boilerplate hash present
    * in eval, the exact blowup the cap exists to prevent. */
  private[graft] def deconPairCounts(ex: DataFrame, docs: DataFrame,
      broadcastRowCap: Long = DeconEvalBroadcastRowCap): DataFrame = {
    val n = docs.select(count(lit(1)).as("n_docs"))
    val dfAll = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // The eval side is production-bounded (eval suites are MBs) but
    // the REPO'S OWN doc_id % 97 fixture grows it linearly with the
    // corpus (~1/97 of all shingles — ~7.8M rows at the 30×/9M-doc
    // probe point), so an unconditional broadcast is the same
    // unbounded-build-side trap the verify/MMR joins already guard
    // against (ADVICE r15). Same exact-count discipline, but through
    // an EAGER LOCAL CHECKPOINT, not a persist: the skinny frame is
    // consumed lazily by callers with no release hook, and a leaked
    // cacheManager entry outlives the caller's shingle cache — after
    // the caller unpersists, Spark recompiles the leaked entry to
    // scan documents directly AND canonically matches it into LATER
    // builds of the same plan (measured: PlanSpec's one-text-scan
    // audit read 2 scans when a prior suite had run the pipeline).
    // The checkpoint materializes once, makes the guard count a
    // block-scan, and registers nothing in the cache manager.
    val evalKept = ex.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("h"))
      .join(dfAll, Seq("h"))
      .crossJoin(broadcast(n))
      .filter(col("df") <= least(
        greatest(expr(s"n_docs div $DeconDfDenom"), lit(DeconDfFloor.toLong)),
        lit(DeconDfAbs.toLong)))
      .select(col("eval_id"), col("h"))
      .localCheckpoint(true)
    val evalRows = evalKept.count()
    val corpus = ex.filter(col("doc_id") % 97 =!= 0)
    val joined =
      if (evalRows <= broadcastRowCap)
        corpus.join(broadcast(evalKept), Seq("h"))
      else {
        // PAST-CAP ARM, BLOOM-SEMI-REDUCED (r16, from the 100×/10M-doc
        // probe arm): a bare shuffle join here ships the ENTIRE corpus
        // shingle stream keyed by h — measured 13.4 GB at 10M docs,
        // a 2.92 shuffle-per-unit step at the cap boundary. Only
        // corpus rows whose h exists on the eval side can ever pair,
        // so the corpus stream is pre-filtered map-side through a
        // bloom of the eval hashes (~1.2 MB per 1M hashes at 1% fp —
        // shippable at ANY eval size that can exist; false
        // positives only add stray rows the exact equi-join below
        // discards, so semantics are bit-identical to the broadcast
        // arm). What still shuffles is pair-owed rows + ~1% fp — the
        // join returns to O(pairs), not O(corpus). The probe is the
        // codegen'd [[graft.functions.BloomMightContain]] with the
        // sketch riding as a REFERENCE OBJECT (shipped once per
        // executor in the task binary, reclaimed with the stage —
        // nothing to destroy): the filter stays inside
        // WholeStageCodegen instead of splitting the corpus-scan
        // pipeline at a ScalaUDF boundary (VERDICT r16 audit: the
        // UDF here was the engine's only per-row Scala function,
        // sitting exactly where 100×-scale corpora live), and the
        // plan tree never carries the multi-MB serialized bits a
        // foldable-literal spelling would copy with every transform.
        // coalesce(32) before the sketch build (VERDICT r17 #1,
        // transient-footprint cut at the eval checkpoint): bloomFilter
        // allocates one FULL-WIDTH sketch per task (~10 MB at the
        // 100×-probe's 8.6M rows / 1% fp), so 320 post-checkpoint
        // partitions allocate ~3.3 GB of long[] churn and ship it all
        // through the tree merge — exactly the heap-pressure spike at
        // the stage whose 100× wall jittered 3×. evalKept is an eager
        // localCheckpoint, so the coalesce is narrow (no shuffle) and
        // 32 tasks still saturate the box.
        val bf = evalKept.coalesce(32)
          .stat.bloomFilter("h", math.max(evalRows, 1000L), 0.01)
        corpus.filter(graft.functions.bloom_might_contain(col("h"), bf))
          .join(evalKept, Seq("h"))
      }
    joined
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= 3)
  }

  /** Eval-shingle row ceiling for [[deconPairCounts]]'s BROADCAST arm
    * (two long columns; 4M rows ≈ 64 MB of hashed relation — same
    * band as [[PairVerifyBroadcastIdCap]]). Past it the pair join
    * shuffles; the df cap and the pair semantics are unchanged. */
  val DeconEvalBroadcastRowCap = 4_000_000L

  /** The selection's SUBSTAGE frames, exposed so
    * [[graft.tools.PipelineScaleProbe]] can attribute the
    * quality_decon stage's wall/shuffle to its components (VERDICT
    * r13 #1: an end-of-stage number alone let a superlinear term hide
    * inside the composed wall). `contaminated` and `selected` are
    * LAZY (memoized on first touch): [[deconPairCounts]]'s broadcast
    * guard does EAGER work (the eval-side checkpoint + exact count),
    * and building it at construction time would book the decon cost
    * into whatever stage happens to CALL this method — the r16 96 GB
    * probe lane's first cut mis-attributed 26 s of decon into
    * qd_keeper_ids exactly that way. Production consumers
    * ([[corpusPipelineSelection]]) touch everything immediately;
    * semantics are identical. */
  private[graft] final class PipelineSubstages(
      val feats: DataFrame, val shingles: DataFrame,
      mkContaminated: () => DataFrame, mkSelected: DataFrame => DataFrame) {
    lazy val contaminated: DataFrame = mkContaminated()
    lazy val selected: DataFrame = mkSelected(contaminated)
  }

  private[graft] def corpusPipelineSubstages(s: SparkSession,
      dir: String): PipelineSubstages = {
    val feats = corpusFeatures(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keepers = clusterKeeperIds(s, dir, feats)
    // the skinny (doc_id, h) explode is PERSISTED: deconPairCounts
    // makes three passes over it (df aggregate, eval filter, pair
    // join), and re-deriving each from the wide feature cache pays
    // the array-column deserialization of 84M hashes per 1M docs
    // per pass — measured 59 s vs 21 s for the identical decon at 3M
    // docs (DiagDeconSource, NOTES_r15). Released by the same
    // consumers that release `feats`.
    val shingled0 = feats.select(col("doc_id"), explode(col("hsh")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    new PipelineSubstages(feats, shingled0,
      // df-capped eval pairing ([[deconPairCounts]]): boilerplate
      // shingles would otherwise pair every doc with every eval doc
      () => deconPairCounts(shingled0, feats)
        .select(col("doc_id")).distinct(),
      contaminated => feats
        .join(keepers, Seq("doc_id"), "left_semi")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .filter(col("doc_id") % 97 =!= 0 && repKeepPredicate &&
          col("quality_score") >= 0.3 && col("marker_hits") > 0)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality_score")))
  }

  private[graft] def corpusPipelineSelection(s: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val sub = corpusPipelineSubstages(s, dir)
    (sub.selected, sub.feats, sub.shingles)
  }

  /** [[corpusPipelineSelection]]'s twin for the q_corpus_select_dedup
    * selection (no repetition/decontamination gates): the lazy plan +
    * the persisted feature frame behind it. */
  private[graft] def corpusSelectDedupSelection(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val feats = corpusFeatures(s, dir, withRep = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keepers = clusterKeeperIds(s, dir, feats)
    val selected = feats
      .join(keepers, Seq("doc_id"), "left_semi")
      .filter(col("quality_score") >= 0.3 && col("marker_hits") > 0)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality_score"))
      .orderBy("doc_id")
    (selected, feats)
  }

  /** Cluster-granular leakage split (the q_leakage_split definition,
    * exposed for [[graft.CorpusPipeline]]): every member of a near-dup
    * cluster lands in the SAME 90/5/5 split by salted hash of the
    * cluster rep, off the session-memoized assignment. */
  def leakageSplit(s: SparkSession, dir: String): DataFrame =
    clusterAssignmentsMemo(s, dir)
      .withColumn("split", splitOfRep(col("cluster_rep")))
      .select(col("doc_id"), col("cluster_rep"), col("split"))

  def corpusPipelineKeepers(s: SparkSession, dir: String): DataFrame =
    memoizedStage(s, dir, "pipeline_selected") {
      // CACHE LIFECYCLE: materialize the (skinny, gate-surviving)
      // result as an eager localCheckpoint, then release the wide
      // feature cache — the hsh arrays are the bulk of it, and a
      // long-lived session (Verify + Bench in one JVM) must not
      // accumulate one per invocation.
      val (selected, feats, shingles) = corpusPipelineSelection(s, dir)
      val out = selected.localCheckpoint(true)
      feats.unpersist(false)
      shingles.unpersist(false)
      out
    }

  /** THE WRITE SIDE of the training-data pipeline: materialize the
    * selected corpus as chunked training shards. The keeper set
    * (skinny ids) semi-joins back to the documents, each doc is cut
    * into chunk/stride token windows WITH text, and rows land
    * shard-partitioned by a DETERMINISTIC hash of (doc_id, chunk_idx)
    * — a re-run writes byte-identical shard membership (the idempotent
    * discipline of the streaming sinks, applied to the batch export).
    * Chunk text is produced map-side inside the same projection that
    * computes the window (`slice` + `concat_ws` — codegen'd, not a
    * lambda; the HOF re-evaluation trap does not apply), so document
    * text is scanned once and only chunk rows ever shuffle — and the
    * only shuffle is the shard-key repartition that controls output
    * file count. */
  /** Deterministic scratch location for the declared read-back query:
    * one shard set per (JVM tmpdir, source dir) — re-runs overwrite
    * idempotently by [[writeTrainingShards]]'s contract. */
  def trainingShardsDir(sourceDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_training_shards_" +
      Integer.toHexString(sourceDir.hashCode)

  def writeTrainingShards(docs: DataFrame, keepers: DataFrame, outDir: String,
      nShards: Int = 64, chunk: Int = ChunkSize, stride: Int = ChunkStride): Unit =
    docs.join(keepers.select("doc_id"), Seq("doc_id"), "left_semi")
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("lang"), col("toks"),
        size(col("toks")).as("n"))
      .select(col("doc_id"), col("lang"), col("toks"),
        explode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride)))
          .as("start"))
      .select(col("doc_id"), col("lang"),
        (col("start") / stride).cast("int").as("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunk)))
          .as("chunk_text"))
      .withColumn("shard",
        pmod(hash(col("doc_id"), col("chunk_idx")), lit(nShards)))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)

  def chunkDocs(docs: DataFrame, chunk: Int = ChunkSize,
      stride: Int = ChunkStride): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride)))
          .as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("int").as("chunk_idx"),
        least(col("n") - col("start"), lit(chunk)).cast("int").as("chunk_tokens"),
        try_element_at(col("toks"), col("start") + 1).as("first_token"))

  /** Exact n-gram Jaccard near-dup pairs (ground truth for LSH) via an
    * INVERTED-INDEX join, not a cross join: explode shingles, hash-join
    * docs sharing a shingle, count commons per pair. Shuffle volume is
    * O(total shingle occurrences), so the pair space never materializes
    * — the formulation that survives 100 TB.
    *
    * Perf notes (measured at sf0.1): (1) tokens/shingles MUST be
    * materialized as real columns — captured inside a transform()
    * lambda they re-evaluate per element (26× slowdown); (2) join on
    * the 60-bit shingle hash, not the shingle string (7× faster, same
    * result — both engines hash identically); (3) the hash array must
    * be INLINE in the explode — exploding a Project-materialized array
    * column is 20× slower (11 s vs 0.6 s) than computing it inside the
    * Generate; single-pass hashing via the native Generator
    * (graft.functions.NGramHashExplode); (4) sizes are DERIVED FROM the
    * exploded index (count per doc), never a second text scan — the
    * jaccard filter's inferred isnotnull(sz) constraint would otherwise
    * push the whole tokenize+shingle expression into the scan filter
    * (measured 10×); (5) the subtree is persisted (3 consumers).
    *
    * `dfCap` is the hot-shingle document-frequency cap (standard
    * web-dedup trick): a shingle in >dfCap docs contributes O(df²) rows
    * to the self-join — at 100 TB one stopword-heavy shingle makes the
    * common-count groupBy quadratic. Such hashes are dropped from the
    * JOIN INPUT only (sizes stay exact, so jaccard denominators are
    * unchanged). The ORACLES of q_ngram_jaccard and q_dedup_recall
    * replay the cap at [[NgramDfCap]] (review r10, second pass: the
    * cap used to be Spark-side only — latent divergence on a corpus
    * with a genuinely hot shingle). TextVectorSpec drives a low cap
    * to prove the mechanism. */
  def ngramJaccardPairs(s: SparkSession, dir: String,
      dfCap: Int = NgramDfCap): DataFrame = {
    val ex = Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("lang"),
        graft.functions.ngram_hash_explode(col("toks")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val hot = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select(col("h"))
    val joinable = ex.join(hot, Seq("h"), "left_anti")
    val common = joinable.as("a").join(joinable.as("b"),
        col("a.h") === col("b.h") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), roundTo(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** GPT-style SEQUENCE PACKING placement: concatenate every
    * document's token stream in doc_id order and cut fixed-length
    * training examples of `contextLen` tokens (documents spill across
    * example boundaries — the standard causal-LM packing, not
    * pad-per-doc). The output is the per-document placement map
    * (global start/end token offsets, first/last example id, examples
    * spanned) — linear in the corpus and exactly what a shard writer
    * joins against to emit examples.
    *
    * The whole operator is one GLOBAL PREFIX SUM over token counts —
    * and the naive Spark spelling, `sum(n) over (order by doc_id)`,
    * is a single-partition bottleneck: an un-partitioned window drags
    * every row through ONE task (Spark even warns
    * "No Partition Defined for Window operation"). This is the
    * textbook two-phase distributed scan instead:
    *
    *   1. range-partition the skinny (doc_id, n) frame by doc_id and
    *      sort within partitions — each partition owns a contiguous
    *      id range, all 32 (or 1000) tasks active;
    *   2. per-partition token TOTALS — one number per partition —
    *      collected to the driver (an operator action on P aggregate
    *      values, the [[Ivf]] routing-collect discipline, NOT a data
    *      collect) and scanned into exclusive partition offsets;
    *   3. a second per-partition pass adds the broadcast offset to a
    *      running local sum — map-side, zero additional shuffle.
    *
    * `mapPartitionsWithIndex` is genuine per-partition imperative
    * logic (the running sum needs partition identity to pick its
    * offset), the documented narrow use for dropping below the
    * DataFrame API. Both passes run against the same persisted
    * partitioning, so the offsets align with the data by
    * construction; the persist is released after the result
    * materializes. */
  /** Context length for q_pack_sequences — interpolated into both the
    * Spark path and the DuckDB oracle so a tuning change moves them
    * together (the MinhashK pattern). */
  val PackContext = 2048

  /** Temperature-flattened mixture sampling (α = 1/2): keep each
    * language at floor(10000·sqrt(c_min / c_lang)) basis points, so
    * kept counts scale as sqrt(c) — the multilingual rebalancing step
    * of corpus mixing. The rate table is data-derived (languages-sized
    * agg × 1-row min anchor, broadcast), and the keep decision is a
    * map-side deterministic salted-hash threshold: RERUNS AND RETRIES
    * over the same snapshot keep the SAME documents. Incremental
    * appends do NOT — the rates are a function of the current counts,
    * so new data shifts every language's threshold and can flip
    * previously-kept documents. A pipeline emitting shards
    * incrementally must FREEZE the rate table (compute `rates` once,
    * persist it, and filter each increment against the frozen copy)
    * rather than re-deriving it per batch. */
  def mixtureSample(docs: DataFrame, extraCols: Seq[String] = Nil): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
    val minC = counts.agg(min(col("c")).as("cmin"))
    val rates = counts.crossJoin(broadcast(minC))
      .select(col("lang"),
        floor(lit(10000) * sqrt(col("cmin").cast("double") / col("c")))
          .cast("int").as("rate_bp"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(pmod(hash60(concat(lit("mix:"), col("doc_id").cast("string"))),
        lit(10000)) < col("rate_bp"))
      .select(Seq(col("doc_id"), col("lang"), col("rate_bp")) ++
        extraCols.map(col): _*)
  }

  /** Deterministic mixture-interleaved shard ordering (r18 verdict
    * #5): assign every selected doc a (shard, pos) such that reading
    * any shard sequentially consumes the sources INTERLEAVED at their
    * mixture rates — never a contiguous single-source run (the
    * training pathology q_mixture_sample + q_training_shards left
    * unpinned: membership was deterministic, within-shard ORDER was
    * whatever the write tasks emitted).
    *
    * Mechanism: a seeded 60-bit hash of the doc id defines a global
    * pseudo-random total order (h, doc_id); position p in that order
    * stripes round-robin → shard = p mod nShards, pos = p div
    * nShards. Any window of any shard is then a hash-random sample of
    * the selection, so per-source rates hold within every window, and
    * the whole assignment is a pure function of (ids, seed) — reruns
    * and the DuckDB replay produce the identical layout.
    *
    * Plan shape (the 100 TB story): NO global sort and NO
    * single-partition window. The hash space is pre-bucketed by its
    * top bits (`buckets` monotone ranges, so bucket order ⊇ hash
    * order); per-bucket counts are ONE map-side-partial aggregate
    * whose ≤`buckets` rows come to the driver (bounded collect) and
    * re-enter as a broadcast offset map; the rank is a PARTITIONED
    * window over the buckets. One skinny data shuffle total — the
    * window's bucket clustering; text never moves. Skew-proof by
    * construction: buckets are equal slices of a uniform hash. */
  def shardInterleave(docs: DataFrame, nShards: Int, seed: String = "il0",
      buckets: Int = 1024): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards")
    require(buckets >= 1 && (buckets & (buckets - 1)) == 0 && buckets <= (1 << 20),
      s"buckets=$buckets must be a power of two (bounded driver collect)")
    val shift = 60 - Integer.numberOfTrailingZeros(buckets)
    val outCols = docs.columns.toSeq
    val withH = docs
      .withColumn("__h",
        hash60(concat(lit(s"il:$seed:"), col("doc_id").cast("string"))))
      .withColumn("__b", shiftrightunsigned(col("__h"), shift).cast("int"))
    val counts = withH.groupBy(col("__b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("__h").asc, col("doc_id").asc)
    withH
      .withColumn("__p", element_at(typedlit(offsets), col("__b")) +
        row_number().over(w) - 1)
      .select(outCols.map(col) ++ Seq(
        pmod(col("__p"), lit(nShards)).cast("int").as("shard"),
        floor(col("__p") / nShards).cast("long").as("pos")): _*)
  }

  def packSequences(docs: DataFrame, contextLen: Int): DataFrame =
    packCounts(
      docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n")),
      contextLen)

  /** Phases 2+3 of the two-phase distributed prefix sum over an
    * already partition-ordered RDD: per-partition totals (one Long
    * per partition) to the driver, then a map-side running sum seeded
    * by the broadcast partition offsets. Emits (row, exclusive-prefix
    * start). Shared by [[packCounts]] (doc_id order) and
    * [[budgetSelect]] (quality order) — ONE derivation of the
    * window-free cumsum (the PACK_SCALE.json restructure). */
  private[ops] def rddPrefixSum[T](rdd: org.apache.spark.rdd.RDD[T])(
      n: T => Long): org.apache.spark.rdd.RDD[(T, Long)] = {
    val totals = rdd
      .mapPartitionsWithIndex { (p, it) =>
        var s = 0L; it.foreach(x => s += n(x)); Iterator((p, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val bc = rdd.sparkContext.broadcast(offsets)
    rdd.mapPartitionsWithIndex { (p, it) =>
      var off = bc.value(p)
      it.map { x => val st = off; off += n(x); (x, st) }
    }
  }

  /** The counts-level core of [[packSequences]]: placement over an
    * already-tokenized (doc_id, n) frame — the entry point for
    * callers that carry token counts as metadata (at 100 TB, a
    * curation pipeline usually does) and for the scan-strategy probe
    * ([[graft.tools.PackScaleProbe]]). */
  def packCounts(counted0: DataFrame, contextLen: Int): DataFrame = {
    require(contextLen > 0, s"contextLen=$contextLen must be positive")
    val spark = counted0.sparkSession
    import spark.implicits._
    val counted = counted0
      .select(col("doc_id"), col("n").cast("long").as("n"))
      .filter(col("n") >= 1) // empty docs contribute no tokens to pack
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val placed = rddPrefixSum(counted.rdd)(_._2)
      .map { case ((id, n), st) => (id, n, st, st + n) }
    val out = placed.toDF("doc_id", "n_tokens", "start_tok", "end_tok")
      // integral `div`, not `/` (which widens to double): offsets are
      // exact Longs and stay exact past 2^53 tokens
      .withColumn("first_example", expr(s"start_tok div $contextLen"))
      .withColumn("last_example", expr(s"(end_tok - 1) div $contextLen"))
      .withColumn("n_examples", col("last_example") - col("first_example") + 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize, then release the packing input
    counted.unpersist(false)
    out
  }

  /** EXACT distributed NEXT-FIT bin count in doc_id order — the
    * naive-shard-writer baseline [[packFfd]] prices its placement
    * against. Documents are taken in id order into fixed-`contextLen`
    * bins; a doc that does not fit in the open bin CLOSES it (the
    * remainder is padding) and opens the next — no doc crosses an
    * example boundary.
    *
    * Greedy next-fit is a sequential recurrence, but its running
    * state is just the open bin's remaining space — an integer in
    * [0, C]. That bounds the state space, so the recurrence admits
    * the TRANSFER-VECTOR form of the [[rddPrefixSum]] two-phase scan:
    *
    *   1. each range partition simulates its doc run once for EVERY
    *      possible incoming remainder r0 ∈ 0..C (one pass, O(C·local)
    *      integer ops, 2·(C+1) longs of task state), emitting the
    *      vectors binsOpened[r0] and remainderOut[r0];
    *   2. the driver composes the P transfer vectors in partition
    *      order from the empty state (r=0: the first doc never fits,
    *      opening bin one) — P·(C+1) longs of control plane, the
    *      prefix-offsets discipline with vector instead of scalar
    *      state.
    *
    * ONE distributed pass, exact for any input. (A pointer-doubling
    * derivation over the bin-successor function — the
    * [[dedupClusters]] discipline — is also exact but pays
    * 2·⌈log₂ bins⌉ shuffle rounds; measured 40+ rounds ≈ 50 s at
    * 200k docs vs ~1 s for this form. Doubling only wins when the
    * state space is unbounded.) DuckDB replays the plain recurrence
    * as a linear recursive CTE. Input must satisfy 1 ≤ n ≤
    * contextLen. */
  private def nextFitBinCount(counted: DataFrame, contextLen: Int): Long = {
    val spark = counted.sparkSession
    import spark.implicits._
    val C = contextLen
    val ordered = counted.select(col("doc_id"), col("n"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
    val transfers = ordered.rdd.mapPartitionsWithIndex { (p, it) =>
      val docs = it.map(_._2.toInt).toArray
      val bins = new Array[Long](C + 1)
      val rem = new Array[Int](C + 1)
      var r0 = 0
      while (r0 <= C) {
        var b = 0L
        var r = r0
        var i = 0
        while (i < docs.length) {
          val n = docs(i)
          if (n <= r) r -= n else { b += 1; r = C - n }
          i += 1
        }
        bins(r0) = b; rem(r0) = r
        r0 += 1
      }
      Iterator((p, bins, rem))
    }.collect().sortBy(_._1)
    var r = 0
    var totalBins = 0L
    transfers.foreach { case (_, bins, rem) =>
      totalBins += bins(r); r = rem(r)
    }
    totalBins
  }

  /** Docs per FFD packing chunk — the constant group size behind
    * [[chunkedFfd]]'s bounded per-task state; interpolated into the
    * oracle (the PackContext pattern). */
  val PackFfdChunk = 4096

  /** Deterministic CHUNKED FIRST-FIT-DECREASING placement — the
    * packing lane of [[packFfd]]. True FFD keeps random-access state
    * over EVERY open bin (a doc goes to the first bin it fits), which
    * no prefix/pointer trick distributes; the standard engineering
    * resolution is exact FFD within bounded, size-diverse chunks:
    *
    *   1. global rank r over (n DESC, doc_id) (zipWithIndex on the
    *      range-partitioned sort — packCounts' discipline);
    *   2. chunk = r mod ⌈N/[[PackFfdChunk]]⌉ — STRIDED assignment, so
    *      every chunk sees the same size mixture (banded chunks would
    *      hand one chunk all the large docs and forfeit the pairing
    *      that packing exists for) and membership is a pure function
    *      of the data, independent of partitioning;
    *   3. exact FFD inside each chunk via `flatMapGroups` — genuine
    *      per-group imperative logic over ≤ PackFfdChunk docs (the
    *      documented narrow case for dropping below the Column API);
    *      bins scanned first-fit in creation order, ties by index;
    *   4. global example ids: per-chunk bin counts → exclusive prefix
    *      offsets ([[rddPrefixSum]]) → chunk-local ids shifted.
    *
    * Bins never span chunks, so the price vs global FFD is at most
    * one partial bin per chunk — amortized to nothing at 4096 docs a
    * chunk — while chunks pack in parallel across the cluster. The
    * DuckDB twin replays the per-chunk FFD fold as a recursive CTE
    * whose state row per chunk carries the open-bin residual LIST.
    * Input must satisfy 1 ≤ n ≤ contextLen. Returns the placement and
    * the total bin count. */
  private def chunkedFfd(
      counted: DataFrame, contextLen: Int): (DataFrame, Long) = {
    val spark = counted.sparkSession
    import spark.implicits._
    val C = contextLen.toLong
    val ordered = counted.select(col("doc_id"), col("n"))
      .repartitionByRange(col("n").desc, col("doc_id").asc)
      .sortWithinPartitions(col("n").desc, col("doc_id").asc)
      .as[(Long, Long)]
    val rankedRdd = ordered.rdd.zipWithIndex()
    val nDocs = rankedRdd.count()
    if (nDocs == 0)
      return (Seq.empty[(Long, Long, Long, Long)]
        .toDF("doc_id", "n", "example_id", "slot_start"), 0L)
    val numChunks = ((nDocs + PackFfdChunk - 1) / PackFfdChunk)
    val placedLocal = rankedRdd
      .map { case ((id, n), r) => (r % numChunks, r, id, n) }
      .toDF("chunk", "r", "doc_id", "n")
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (chunkId, it) =>
        // exact first-fit decreasing over the chunk's docs; linear
        // bin scan keeps the first-index tie-break the oracle replays
        val docs = it.toArray.sortBy { case (_, r, _, _) => r }
        val residuals = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.iterator.map { case (_, _, id, n) =>
          var b = 0
          while (b < residuals.length && residuals(b) < n) b += 1
          val slot =
            if (b < residuals.length) {
              val s = C - residuals(b); residuals(b) -= n; s
            } else { residuals += (C - n); 0L }
          (chunkId, id, n, b.toLong, slot)
        }
      }
      .toDF("chunk", "doc_id", "n", "bin", "slot")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunkBins = placedLocal.groupBy(col("chunk"))
      .agg((max(col("bin")) + 1).as("bins"))
      .repartitionByRange(col("chunk")).sortWithinPartitions("chunk")
      .as[(Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totalBins = chunkBins.toDF("chunk", "bins")
      .agg(sum(col("bins"))).head().getLong(0)
    val offsets = rddPrefixSum(chunkBins.rdd)(_._2)
      .map { case ((c, _), off) => (c, off) }.toDF("chunk", "off")
    val out = placedLocal.join(offsets, Seq("chunk"))
      .select(col("doc_id"), col("n"),
        (col("off") + col("bin")).as("example_id"),
        col("slot").as("slot_start"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    placedLocal.unpersist(false)
    chunkBins.unpersist(false)
    (out, totalBins)
  }

  /** NO-SPLIT sequence packing by FIRST-FIT DECREASING plus the
    * padding price of the naive order (VERDICT r12 #5) —
    * [[packCounts]] spills documents across example boundaries and so
    * wastes nothing, but SFT-style training wants whole documents per
    * example, where padding is the metric. This operator places
    * documents by [[chunkedFfd]] (exact first-fit decreasing inside
    * deterministic size-diverse chunks) and reports, as constant
    * columns, its padding ratio NEXT TO the doc_id-order NEXT-FIT
    * ratio (what a naive shard writer pays, [[nextFitBinCount]] —
    * the same prefix machinery pointer-doubled over the id order).
    * A size-UNAWARE greedy is not a strawman baseline, and a
    * size-aware one-open-bin greedy is not enough: measured on
    * uniform(100,1599) sizes at C=2048, next-fit-DECREASING pads
    * MORE than id-order next-fit (0.285 vs 0.271 — decreasing order
    * strands each large doc alone exactly when random arrival would
    * have paired it with small ones); only the adaptive
    * first-fit family beats the naive order on smooth
    * distributions (~0.06, PACK_SCALE.json), which is why the
    * placement lane pays for per-chunk bin state.
    *
    * Documents longer than the context are routed to a JUMBO lane:
    * each occupies its own ⌈n/C⌉ dedicated examples appended after
    * the packed ones (ordered by doc_id, the same prefix machinery),
    * with the tail of the last one as padding — deterministic and
    * both-engine replayed, though empty on corpora whose documents
    * fit (n ≤ 2048 here). */
  def packFfd(docs: DataFrame, contextLen: Int = PackContext): DataFrame =
    packFfdCounts(
      docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n")),
      contextLen)

  /** Counts-level core of [[packFfd]] — the entry point for callers
    * carrying token counts as metadata and for
    * [[graft.tools.PackScaleProbe]] (the [[packCounts]] split). */
  def packFfdCounts(counted0: DataFrame, contextLen: Int): DataFrame = {
    require(contextLen > 0, s"contextLen=$contextLen must be positive")
    val spark = counted0.sparkSession
    import spark.implicits._
    val C = contextLen.toLong
    val counted = counted0
      .select(col("doc_id"), col("n").cast("long").as("n"))
      .filter(col("n") >= 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val small = counted.filter(col("n") <= C)
    val (ffdPlaced, bFfd) = chunkedFfd(small, contextLen)
    val bNaive = nextFitBinCount(small, contextLen)

    // jumbo lane: dedicated examples after the packed ones
    val jumboOrdered = counted.filter(col("n") > C)
      .withColumn("bb", expr(s"(n + $C - 1) div $C"))
      .repartitionByRange(col("doc_id")).sortWithinPartitions("doc_id")
      .as[(Long, Long, Long)]
    val jumboPlaced = rddPrefixSum(jumboOrdered.rdd)(_._3)
      .map { case ((id, n, bb), off) => (id, n, bFfd + off, 0L, bb) }
      .toDF("doc_id", "n", "example_id", "slot_start", "bb")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // padding metrics — scalar aggregates only (bounded driver traffic)
    val m = counted.agg(
      sum(when(col("n") <= C, col("n"))).as("t_small"),
      sum(when(col("n") > C, expr(s"(n + $C - 1) div $C"))).as("j_bins"),
      sum(when(col("n") > C, expr(s"(n + $C - 1) div $C") * C - col("n")))
        .as("j_pad")).head()
    val tSmall = if (m.isNullAt(0)) 0L else m.getLong(0)
    val jBins = if (m.isNullAt(1)) 0L else m.getLong(1)
    val jPad = if (m.isNullAt(2)) 0L else m.getLong(2)
    def ratio(bins: Long): Column = {
      val slots = (bins + jBins) * C
      if (slots == 0L) lit(0.0)
      else roundTo(lit((bins * C - tSmall) + jPad).cast("double") /
        lit(slots).cast("double"), 6)
    }
    val out = ffdPlaced
      .unionByName(jumboPlaced.drop("bb"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("example_id"), col("slot_start"),
        ratio(bFfd).as("pad_ratio_ffd"), ratio(bNaive).as("pad_ratio_id"))
      .orderBy("doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    Seq(counted, jumboPlaced, ffdPlaced).foreach(_.unpersist(false))
    out
  }

  /** TOKEN-BUDGET CORPUS SELECTION — keep the highest-quality
    * documents until a token budget is exhausted (the fixed-compute
    * curation rule: a training run affords B tokens, take the best B
    * tokens' worth of documents). The keep set is the maximal prefix
    * of the (quality_score DESC, doc_id ASC) order whose cumulative
    * token count stays ≤ budget; budget here is data-derived (half
    * the corpus's tokens) so the query is scale-free.
    *
    * SCALE SHAPE: a VALUE-ordered distributed prefix sum — range
    * partition by (quality DESC, doc_id), local sort, then the shared
    * [[rddPrefixSum]] phases (one Long per partition to the driver,
    * map-side running sums). No global Window, no single-partition
    * sort: the same restructure PACK_SCALE.json measured 10× on the
    * doc_id-ordered twin, applied to a quality-ordered key. The
    * cumulative sum is monotone, so `cum ≤ B` IS the maximal-prefix
    * rule — no iteration, one pass. */
  def budgetSelect(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = scoredDocs(docs, withDigest = false)
      .select(col("doc_id"), col("quality_score"),
        col("n_tokens").cast("long").as("n"))
      .filter(col("n") >= 1)
    val parted = base
      .repartitionByRange(col("quality_score").desc, col("doc_id").asc)
      .sortWithinPartitions(col("quality_score").desc, col("doc_id").asc)
      .as[(Long, Double, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the budget scalar comes off the PERSISTED frame (one Long to the
    // driver; fold handles the empty corpus as budget 0 → empty
    // selection) — summing `base` directly would re-run the whole
    // scoredDocs text scan a second time (review r10, second pass)
    val total = parted.rdd.map(_._3).fold(0L)(_ + _)
    val budget = total / 2
    val placed = rddPrefixSum(parted.rdd)(_._3)
      .map { case ((id, q, n), st) => (id, q, n, st + n) }
    val out = placed.toDF("doc_id", "quality_score", "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .orderBy(col("quality_score").desc, col("doc_id").asc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize, then release the selection input
    parted.unpersist(false)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on the normalized-text digest; keeper =
    // min doc_id (deterministic). Scales as a single digest shuffle.
    "q_dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(md5(normText(col("text"))).as("text_hash"), col("doc_id"))
        .groupBy(col("text_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("text_hash")),

    // Document fingerprinting: 128-bit digest + 60-bit int fingerprint.
    "q_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(normText(col("text"))).as("fp_md5"),
          hash60(normText(col("text"))).as("fp60"))
        .orderBy("doc_id")),

    // Token counting (whitespace tokenizer).
    "q_token_count" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
        .orderBy("doc_id")),

    // BPE-ish token counting (builder-prompt §7.2-6 "whitespace + a
    // BPE-ish regex"): LLM-budget-style piece counts from the GPT-2-ish
    // pre-tokenizer pattern. n_pieces counts every regex piece,
    // n_tokens_bpe drops pure-whitespace runs (they merge into
    // neighbors in a real BPE). Pure map-side — one regex pass/doc.
    "q_token_bpe" -> ((s, dir) => {
      val pieces = bpePieces(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(pieces).as("n_pieces"),
          size(filter(pieces, p => trim(p) =!= "")).as("n_tokens_bpe"),
          size(tokens(col("text"))).as("n_tokens_ws"))
        .orderBy("doc_id")
    }),

    // Corpus stats rollup per (lang, source).
    "q_text_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), col("source"), col("n_chars"),
          size(tokens(col("text"))).as("n_tokens"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("n_tokens").cast("long")).as("sum_tokens"),
          roundTo(sum(col("n_chars")).cast("double") / count(lit(1)), 2).as("avg_chars"))
        .orderBy("lang", "source")),

    // Per-document quality scoring: length, punctuation density,
    // stopword ratio, mean token length → weighted score.
    "q_text_quality" -> ((s, dir) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("double")
      val punct = length(col("text")) - length(regexp_replace(col("text"), "[.!?,;:]", ""))
      val stopHits = size(filter(toks, t => t.isInCollection(stopwords))).cast("double")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          size(toks).as("n_tokens"),
          punct.cast("long").as("n_punct"),
          roundTo(stopHits / greatest(nTok, lit(1.0)), 4).as("stopword_ratio"),
          roundTo((length(col("text")) - (nTok - 1)) / greatest(nTok, lit(1.0)), 4)
            .as("mean_token_len"),
          roundTo(
            least(col("n_chars").cast("double") / 500.0, lit(1.0)) * 0.4
              + least(stopHits / greatest(nTok, lit(1.0)) * 5.0, lit(1.0)) * 0.3
              + least(punct.cast("double") * 10.0 / greatest(length(col("text")), lit(1)), lit(1.0)) * 0.3,
            4).as("quality_score"))
        .orderBy("doc_id")
    }),

    // Heuristic language ID: argmax of marker-lexicon hit counts,
    // 'und' when nothing matches; deterministic tie-break by lang code.
    "q_lang_id" -> ((s, dir) => {
      val toks = tokens(col("text"))
      val scored = langMarkers.foldLeft(Tables.documents(s, dir).select(col("doc_id"), toks.as("toks"))) {
        case (df, (lang, words)) => df.withColumn(s"hits_$lang", markerHits(col("toks"), words))
      }
      val best = langMarkers.map { case (lang, _) =>
        struct(col(s"hits_$lang").as("hits"), lit(lang).as("lang"))
      }
      // array_max on (hits, lang) structs: max hits, tie → max lang code;
      // to tie-break ASC on lang we compare against reversed-code order.
      val pick = scored.withColumn("best",
        aggregate(
          array(best: _*),
          struct(lit(-1).as("hits"), lit("zzz").as("lang")),
          (acc, x) => when(x.getField("hits") > acc.getField("hits") ||
            (x.getField("hits") === acc.getField("hits") &&
              x.getField("lang") < acc.getField("lang")), x).otherwise(acc)))
      pick.select(col("doc_id"),
          when(col("best.hits") > 0, col("best.lang")).otherwise(lit("und")).as("lang_pred"),
          col("best.hits").as("marker_hits"))
        .orderBy("doc_id")
    }),

    // Per-SPAN language segmentation — [[langSpans]] over the corpus.
    "q_lang_spans" -> ((s, dir) => langSpans(Tables.documents(s, dir))),

    // Code/prose span segmentation over the planted mixed fixture —
    // chunk-granular code detection + gaps-and-islands merge, so the
    // quality gate can run prose-only downstream. The fixture is
    // applied HERE (query site), not inside the operator — codeSpans
    // itself segments real text untouched (Html.fixture discipline).
    "q_code_spans" -> ((s, dir) => codeSpans(Tables.documents(s, dir)
      .withColumn("text", codeFixture(col("text"), col("doc_id"))))),

    // Exact n-gram Jaccard near-dup pairs (ground truth for LSH) via an
    // INVERTED-INDEX join, not a cross join: explode shingles, hash-join
    // docs sharing a shingle, count commons per pair. Shuffle volume is
    // O(total shingle occurrences), so the pair space never materializes
    // — this is the formulation that survives 100 TB.
    "q_ngram_jaccard" -> ((s, dir) => ngramJaccardPairs(s, dir)),

    // CROSS-SOURCE CONTENT OVERLAP via the KMV sketch — the corpus-
    // composition measurement (how much content do two ingest sources
    // share?) that is only computable BY SKETCH at 100 TB: per
    // source, the bounded-state kmv_min_hashes aggregate retains the
    // 256 smallest distinct shingle hashes (duplicates collapse
    // INSIDE the aggregate — the raw shingle stream feeds it with no
    // pre-distinct shuffle; ONE corpus pass total), and pairwise
    // Jaccard is estimated from the k-min of the sketch union:
    // |{x ∈ kmin(A∪B)} ∩ A ∩ B| / |kmin(A∪B)| ("Bottom-k sketches",
    // Cohen & Kaplan 2007). This is deliberately the PRODUCTION
    // shape: the exact-Jaccard audit (distinct + h-self-join — 4× this
    // query's cost at sf0.1, corpus-quadratic pressure at scale)
    // lives in TextVectorSpec at sf0.01 instead of the declared
    // query; the ESTIMATE is what the oracle hash-gates, replaying
    // the k-min sets and the estimator arithmetic exactly. The pair
    // frame is #sources² — bounded — so everything after the one
    // aggregation pass is trivial.
    "q_kmv_overlap" -> ((s, dir) => {
      val k = 256
      // the NATIVE shingle-hash generator, not the interpreted
      // explode(shingleHashes(shingles(…))) HOF chain — same hash
      // multiset (FunctionsSpec pins it), 4× faster at sf0.1 (the
      // chain re-evaluates interpreted lambdas per shingle; KmvProbe
      // measured the chain at 8.6 s vs ~2 s for the whole query here)
      val sh = Tables.documents(s, dir).select(col("source"),
        graft.functions.ngram_hash_explode(tokens(col("text"))).as("h"))
      val sk = sh.groupBy(col("source"))
        .agg(graft.functions.kmv_min_hashes(col("h"), k).as("mins"))
      val pairs = sk.select(col("source").as("source_a"), col("mins").as("ma"))
        .join(sk.select(col("source").as("source_b"), col("mins").as("mb")),
          col("source_a") < col("source_b"))
      val u = slice(array_sort(array_union(col("ma"), col("mb"))), 1, k)
      val ni = size(filter(u, x =>
        array_contains(col("ma"), x) && array_contains(col("mb"), x)))
      pairs.select(col("source_a"), col("source_b"),
          Util.roundTo(ni.cast("double") / size(u).cast("double"), 6)
            .as("jaccard_est"))
        .orderBy("source_a", "source_b")
    }),

    // Repetition-based quality (Gopher-style rules adapted to this
    // corpus's whitespace-token shape): distinct-token ratio,
    // top-token dominance, duplicate-bigram fraction. Fully MAP-SIDE
    // (no explode-groupBy, no shuffle except the output sort).
    //
    // Evaluation shape matters here: higher-order functions are
    // CodegenFallback, so a lambda body that references the outer
    // `split(text)` expression re-tokenizes the text on EVERY lambda
    // invocation (measured 31 s at sf0.1). Binding the token array
    // ONCE as a lambda variable (`transform(array(tokens), t => …)`)
    // and expanding the metric struct through a generator (`inline`)
    // makes every inner reference a bound-array access — 30× faster,
    // byte-identical output.
    "q_rep_quality" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), inline(repMetrics(col("text"))))
        .withColumn("keep", repKeepPredicate)
        .orderBy("doc_id")),

    // Benchmark decontamination: flag corpus docs sharing >= 3 distinct
    // 3-gram shingle hashes with a held-out eval set (doc_id % 97 == 0
    // plays the benchmark). INVERTED-INDEX shape like q_ngram_jaccard,
    // but asymmetric: the eval side is tiny and BROADCAST, so corpus
    // shingles never shuffle — candidate counting is a map-side hash
    // join + partial-agg'd (doc, eval) count. The production
    // decontamination shape: eval suites are MBs, corpora are TBs.
    "q_decontaminate" -> ((s, dir) => {
      // df-capped eval pairing ([[deconPairCounts]]): corpus-common
      // shingles are template/boilerplate, not contamination
      // evidence — without the cap, extraction boilerplate shared by
      // every page makes the (doc, eval) join quadratic AND flags the
      // whole corpus (PIPELINE_SCALE round-13 finding, NOTES_r13)
      val ex = Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), graft.functions.ngram_hash_explode(col("toks")).as("h"))
      deconPairCounts(ex, Tables.documents(s, dir))
        .orderBy("doc_id", "eval_id")
    }),

    // MinHash(16) + LSH(4 bands × 4 rows) near-dup candidates, verified
    // with exact Jaccard — the scale path: pair space comes from band
    // hash joins, not a cross join.
    "q_minhash_dedup" -> ((s, dir) =>
      minhashPairs(s, dir)
        .select(col("id_a"), col("id_b"), roundTo(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")),

    // The PRODUCTION form of the same pair generator: hot-bucket cap
    // engaged (one-sided, CapBucket lowest ids retained per band
    // bucket) — the setting that keeps boilerplate-heavy corpora
    // linear at 1000× (PERF.md "Dedup scaling curve"). Oracle-checked
    // with the identical cap spelled as a DuckDB window, so the cap
    // semantics are pinned cross-engine, not just asserted.
    "q_minhash_capped" -> ((s, dir) =>
      minhashPairsOf(Tables.documents(s, dir), maxBucket = Some(CapBucket))
        .select(col("id_a"), col("id_b"), roundTo(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")),

    // Near-dup CLUSTER RESOLUTION — the step a real dedup pipeline runs
    // after pair generation: connected components over the verified
    // near-dup pair graph, representative = min doc_id per component,
    // keep-one-per-cluster. See [[dedupClusters]].
    // Oracle: DuckDB WITH RECURSIVE reachability → min reachable id.
    "q_dedup_clusters" -> ((s, dir) => dedupClusters(s, dir)),

    // SOURCE-PRIORITY KEEPER SELECTION (r18 verdict #4) — production
    // pipelines do not keep an arbitrary cluster member: when a
    // curated copy and its web scrape collide in one near-dup
    // cluster, the curated copy survives. Keeper = first by
    // (source-tier asc, quality_score desc, doc_id asc) per cluster;
    // rides the SAME session-memoized CC assignment as
    // q_dedup_clusters / q_leakage_split (no second CC run), and the
    // election itself shuffles only skinny per-doc scalars. Oracle:
    // the WITH-RECURSIVE reachability CC + the quality CTE + the
    // identical tier CASE and window election.
    "q_dedup_keeper" -> ((s, dir) =>
      dedupKeeperAssignments(s, dir).orderBy("doc_id")),

    // CROSS-SOURCE NEAR-DUP OVERLAP — the sourcing dashboard: which
    // sources re-host each other's content, and how close the copies
    // are. Verified LSH pairs labeled with their documents' sources
    // (canonical least/greatest order), aggregated per source pair.
    // The pair frame is the verified near-dup output (skinny, far
    // below corpus scale) hash-joining the (doc_id, source)
    // projection twice; no new pair space, no text shuffle.
    "q_source_overlap" -> ((s, dir) => {
      val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      minhashPairs(s, dir)
        .select(col("id_a"), col("id_b"), roundTo(col("jaccard"), 4).as("j"))
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
          Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
          Seq("id_b"))
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"), col("j"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"),
          roundTo(sum(col("j").cast("decimal(18,4)")).cast("double") /
            count(lit(1)), 4).as("avg_jaccard"))
        .orderBy("source_a", "source_b")
    }),

    // CORPUS DEDUP DASHBOARD — the one-row health report a curation
    // run logs: exact-dup group counts, near-dup cluster counts, the
    // document share sitting in a non-trivial cluster, the largest
    // cluster. Composes the session-memoized CC assignment (zero new
    // heavy work in a session that ran any dedup query) + one digest
    // aggregation; 1-row sub-aggregates crossJoin broadcast.
    "q_dedup_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val exact = docs.select(md5(normText(col("text"))).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_exact_groups"),
          coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
            .as("docs_in_exact_dups"))
      val cs = dedupClusters(s, dir)
        .groupBy(col("cluster_rep")).agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_clusters"),
          coalesce(sum(when(col("sz") > 1, col("sz"))), lit(0L))
            .as("docs_in_neardup_clusters"),
          max(col("sz")).as("max_cluster_size"))
      nDocs.crossJoin(broadcast(exact)).crossJoin(broadcast(cs))
        .select(col("n_docs"), col("n_exact_groups"),
          col("docs_in_exact_dups"), col("n_clusters"),
          col("docs_in_neardup_clusters"), col("max_cluster_size"),
          roundTo(col("docs_in_neardup_clusters").cast("double") /
            greatest(col("n_docs").cast("double"), lit(1.0)), 6)
            .as("neardup_share"))
    }),

    // TOP-K SIMILAR-DOCUMENT SELF-JOIN — retrieval-by-near-dup: for
    // EVERY document, the top-5 most similar OTHER docs by exact
    // shingle Jaccard, candidates restricted to docs sharing ≥1 LSH
    // band bucket (the decontamination / hard-negative-mining access
    // path: the corpus is probed through the SAME banded index the
    // dedup pipeline maintains — a doc without collisions simply has
    // no similars and emits nothing, never a scan). SCALE SHAPE: the
    // candidate space is the banded collision set (the dedup pair
    // space, both directions), never all-pairs; verification touches
    // only colliding candidates; ranking runs through the
    // bounded-state topk_by_score aggregate (5 rows of state per
    // query — no Window over the scored space, no score-space sort).
    // Jaccard rounds to 6 BEFORE ranking so both engines order
    // identical values (ties: doc_id ascending, the key discipline).
    "q_doc_similar" -> ((s, dir) => {
      val d = minhashHashes(Tables.documents(s, dir))
        .withColumn("sig", minhashSig(col("hsh"), MinhashK))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val banded = bandedBuckets(d).drop("hsh")
      val qb = banded
        .select(col("doc_id").as("q_id"), col("band_id"), col("band_key"))
      val cand = qb.join(banded, Seq("band_id", "band_key"))
        .filter(col("doc_id") =!= col("q_id"))
        .select(col("q_id"), col("doc_id")).distinct()
      val sets = d.select(col("doc_id"), col("hsh"))
      val scored = cand
        .join(sets.select(col("doc_id").as("q_id"), col("hsh").as("h_q")), Seq("q_id"))
        .join(sets, Seq("doc_id"))
        .withColumn("inter",
          size(array_intersect(col("h_q"), col("hsh"))).cast("double"))
        .withColumn("jaccard", roundTo(col("inter") /
          (size(col("h_q")) + size(col("hsh")) - col("inter")), 6))
        .filter(col("jaccard") > 0)
      val out = scored
        .select(col("q_id"), col("jaccard"), Util.lpadKey(col("doc_id")).as("key"))
        .groupBy(col("q_id"))
        .agg(graft.functions.topk_by_score(col("jaccard"), col("key"), 5).as("topk"))
        .select(col("q_id"), posexplode(col("topk")))
        .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
          col("col.key").cast("long").as("doc_id"), col("col.score").as("jaccard"))
        .orderBy("q_id", "rank")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count() // materialize, then release the signature cache
      d.unpersist(false)
      out
    }),

    // LEAKAGE-SAFE SPLIT ASSIGNMENT — train/val/test at NEAR-DUP
    // CLUSTER granularity: every member inherits its cluster
    // representative's split, so a document and its near-duplicates
    // can never straddle a split boundary (the eval-leakage failure
    // mode of document-level splitting — a test doc whose near-copy
    // sits in train). The split decision is the deterministic
    // salted-hash discipline of q_sample_det / q_mixture_sample (no
    // per-row RNG: reruns and late-arriving cluster members land in
    // the SAME split), 90/5/5 by hash bucket of the cluster rep.
    // Cost on top of the cluster map: one map-side projection off the
    // session-memoized assignment (r9 verdict #6 — previously this
    // re-ran the whole pair generation + CC; now one CC run per
    // session serves keepers, q_dedup_clusters, and this split).
    "q_leakage_split" -> ((s, dir) =>
      leakageSplit(s, dir).orderBy("doc_id")),

    // Corpus vocabulary: exact top-50 tokens by frequency — the
    // tokenizer-building / df-statistics primitive. Map-side partial
    // counts + a k-row TakeOrdered; the shuffle carries (token, count),
    // never documents.
    "q_vocab_topk" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(50)),

    // CORPUS DRIFT MONITOR — unigram KL divergence between the
    // reference slice (even doc_ids: "yesterday's corpus") and the
    // current slice (odd: "today's"), add-one smoothed over the UNION
    // vocabulary, reported as the top-20 tokens by contribution
    // P(t)·ln(P(t)/Q(t)) — the statistic a pipeline alerts on when a
    // crawler change or an upstream filter shifts the corpus, with
    // the responsible tokens named. SCALE SHAPE: ONE token
    // aggregation with conditional counts (map-side partials carry
    // (token, cnt_ref, cnt_cur) — text never shuffles), the
    // (N_ref, N_cur, V) scalars broadcast, contributions map-side,
    // top-20 via TakeOrdered. Float discipline: every integer casts
    // to DOUBLE before meeting a constant (the bmContrib rule), both
    // engines run the identical IEEE ops, contributions round to 8.
    "q_corpus_drift" -> ((s, dir) => {
      val toksAll = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      // counts feeds BOTH the totals scalar and the contribution
      // projection — persisted so the tokenize+explode+shuffle runs
      // once, not twice (advisor r10).
      val counts = toksAll
        .groupBy(col("token"))
        .agg(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("doc_id") % 2 =!= 0, 1L).otherwise(0L)).as("c_cur"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // ONE-ROW scalar collect of the totals (bounded control plane,
      // the QualityModel-gradient pattern) instead of a broadcast
      // crossJoin: same IEEE doubles (exact longs summed below 2^53,
      // Scala + and Spark + are the same op), two fewer jobs per run
      // (broadcast build + result-cache count — r12 isolation readings
      // showed this query's wall is fixed-overhead-dominated, NOTES_r13)
      val t = counts.agg(sum(col("c_ref")).as("n_ref"),
        sum(col("c_cur")).as("n_cur"), count(lit(1)).as("v")).head()
      val denRef = (if (t.isNullAt(0)) 0L else t.getLong(0)).toDouble +
        t.getLong(2).toDouble
      val denCur = (if (t.isNullAt(1)) 0L else t.getLong(1)).toDouble +
        t.getLong(2).toDouble
      val out = counts
        .withColumn("p_ref", (col("c_ref").cast("double") + 1.0) / lit(denRef))
        .withColumn("p_cur", (col("c_cur").cast("double") + 1.0) / lit(denCur))
        // kl_contrib bound to the UNROUNDED p's in its own projection
        // step — the old shape referenced `p_ref` in the same select
        // that re-aliased `roundTo(p_ref)` to the same name, i.e. the
        // exact lateral-column-alias knife edge of NOTES_r15 §4 (it
        // happened to bind child-first, matching the oracle's
        // unrounded-p CTE, but nothing pinned that). VERDICT r15 #1.
        .withColumn("kl_contrib",
          roundTo(col("p_ref") * log(col("p_ref") / col("p_cur")), 8))
        .select(col("token"),
          roundTo(col("p_ref"), 8).as("p_ref"),
          roundTo(col("p_cur"), 8).as("p_cur"),
          col("kl_contrib"))
        .orderBy(col("kl_contrib").desc, col("token").asc)
        .limit(20)
      // ≤20 rows: land them locally so the cache can be released with
      // no recompute exposure and no persist bookkeeping on the result
      val rows = out.collect()
      counts.unpersist(false)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    }),

    // END-TO-END training-set selection — the query a data pipeline
    // actually ships: keep a document iff it is (a) the keeper of its
    // exact-dup group (min doc_id per normalized-text digest), (b) above
    // the quality threshold, (c) confidently language-identified
    // (≥1 marker hit). ONE scored scan and ONE skinny digest-keyed
    // shuffle: the keeper is a min-over-digest-partition window, so no
    // keeper aggregate, no self-join, no persist (the round-2 persisted
    // groupBy+join form measured ~2× slower — the same
    // caching-is-not-free effect as q_rate_lag). At 100 TB the window's
    // digest shuffle carries only the scored projection, never text.
    "q_corpus_select" -> ((s, dir) =>
      scoredDocs(Tables.documents(s, dir), withDigest = true)
        .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("h"))))
        .filter(col("doc_id") === col("keep_id") &&
          col("quality_score") >= 0.3 && col("marker_hits") > 0)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality_score"))
        .orderBy("doc_id")),

    // NEAR-DUP-AWARE corpus selection — the fuzzy-dedup form of
    // q_corpus_select and the query shape of production web-corpus
    // pipelines (quality filter ∧ keep-one-per-near-dup-cluster): a doc
    // survives iff it is the keeper (min doc_id) of its CONNECTED
    // near-dup cluster — not merely of its exact-dup group — AND clears
    // the quality/lang gates. Composition of [[dedupClusters]] (keeper
    // flags) with the scored scan; the keeper set joins back as a
    // skinny id semi-join. Oracle: the WITH-RECURSIVE reachability CC
    // composed with the quality CTE.
    "q_corpus_select_dedup" -> ((s, dir) => {
      // ONE text scan (round-6 restructure): the fused feature scan
      // (digest + shingle hashes + quality, repetition fields skipped)
      // is persisted, cluster keepers derive from it, and the gate
      // reads the cached quality columns — no scored re-scan. The
      // keeper id set is MEMOIZED per (session, dir) and shared with
      // q_corpus_pipeline / q_training_shards — clustering reads only
      // the dig/hsh columns, identical under either withRep spelling.
      val (plan, feats) = corpusSelectDedupSelection(s, dir)
      val selected = plan
        .localCheckpoint(true) // materialize, then release the feature cache
      feats.unpersist(false)
      selected
    }),

    // THE END-TO-END TRAINING-DATA SELECTION — every pipeline stage
    // composed in one declared query: a doc survives iff it
    //   (1) is the keeper of its CONNECTED near-dup cluster,
    //   (2) clears the quality/lang gates (scoredDocs),
    //   (3) clears the repetition gates (repMetrics),
    //   (4) is not part of the held-out eval set (doc_id % 97), and
    //   (5) shares < 3 shingle hashes with every eval doc
    //       (decontamination).
    // Composition shapes: keeper and rep-keep are SKINNY id semi-
    // joins, contamination a skinny id anti-join — text is scanned in
    // map-side projections and never shuffles; the only heavy lifting
    // is the dedup clustering the corpus already pays for. The oracle
    // stacks the same CTEs (recursive CC + quality + repetition +
    // shingle overlap) — the split across engines must be invisible.
    "q_corpus_pipeline" -> ((s, dir) =>
      corpusPipelineKeepers(s, dir).orderBy("doc_id")),

    // THE WRITE SIDE, read back (round-6 verdict item 3 — the last
    // un-oracled pipeline stage): materialize the selected corpus as
    // chunked training shards ([[writeTrainingShards]] — idempotent
    // shard-partitioned rewrite), then re-read WHAT ACTUALLY LANDED
    // ON DISK and hash-match it against a DuckDB replay of the full
    // selection + chunking (keeper membership, chunk boundaries,
    // chunk TEXT). The `shard` column stays out of the compared
    // schema: it is Spark-Murmur3-derived (not DuckDB-expressible);
    // its determinism and partition layout are spec-pinned instead.
    "q_training_shards" -> ((s, dir) => {
      val out = trainingShardsDir(dir)
      writeTrainingShards(Tables.documents(s, dir),
        corpusPipelineKeepers(s, dir), out)
      s.read.parquet(out)
        .select(col("doc_id"), col("lang"), col("chunk_idx"), col("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // SEQUENCE PACKING placement (packSequences): the causal-LM
    // packing map — global token offsets and example spans per
    // document at context 2048 — computed as a two-phase distributed
    // prefix sum (range partition → per-partition totals → broadcast
    // offsets), NOT a global-order window, which would drag the
    // corpus through one task. The oracle replays the same
    // concatenation with DuckDB's window cumsum — a packing that
    // loses a document, misorders ids, or drifts an offset by one
    // hash-mismatches on every downstream column.
    // NO-SPLIT packing, size-decreasing next-fit (packFfd): whole-doc
    // examples with the padding price of this order vs doc_id order
    // as constant columns — exact distributed greedy via prefix sums
    // + pointer-doubled bin successors, recursive-CTE-replayed.
    "q_pack_ffd" -> ((s, dir) =>
      packFfd(Tables.documents(s, dir), PackContext)),

    "q_pack_sequences" -> ((s, dir) =>
      packSequences(Tables.documents(s, dir), PackContext)
        .orderBy("doc_id")),

    // TOKEN-BUDGET SELECTION — best documents first until half the
    // corpus's tokens are spent (see [[budgetSelect]]); the oracle
    // replays the maximal-prefix rule with a window cumsum.
    "q_budget_select" -> ((s, dir) =>
      budgetSelect(Tables.documents(s, dir))),

    // LSH CANDIDATE-GENERATION RECALL — the dedup lane's quality
    // gauge (the q_ann_recall analog): the banded MinHash pipeline's
    // verified pairs measured against the exact same-lang n-gram
    // Jaccard truth (q_ngram_jaccard's inverted-index pair set). Both
    // legs are deterministic, so the recall number itself is
    // oracle-gated — a banding change that silently starts missing
    // true near-dup pairs moves a hash-checked value, not a vibe.
    // One row: truth volume, candidate volume, hits, recall.
    "q_dedup_recall" -> ((s, dir) =>
      dedupRecallOf(s, dir, maxBucket = None)),

    // The same gauge under the PRODUCTION hot-bucket cap
    // (q_minhash_capped's one-sided CapBucket) — the number a
    // pipeline actually trades when it caps: how much recall the
    // bucket cap costs against the identical truth set.
    "q_dedup_recall_capped" -> ((s, dir) =>
      dedupRecallOf(s, dir, maxBucket = Some(CapBucket))),

    // PER-SOURCE CORPUS HEALTH — the data-vendor scorecard: document
    // and token volume, mean heuristic quality (decimal-exact sum of
    // the already-rounded scores), and the WITHIN-source exact-dup
    // share (docs minus distinct normalized digests — redundancy a
    // vendor ships inside its own feed; cross-source dups are the
    // dedup pipeline's business, not this report's). One scan +
    // one (source, digest)-keyed aggregate; sources are few, so the
    // final frame is dashboard-sized at any corpus scale.
    "q_source_quality" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val u = scoredDocs(docs, withDigest = true)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      u.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).cast("long").as("n_tokens"),
          roundTo(sum(col("quality_score").cast("decimal(18,4)"))
            .cast("double") / count(lit(1)), 4).as("avg_quality"),
          countDistinct(col("h")).as("n_distinct"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("avg_quality"),
          (col("n_docs") - col("n_distinct")).as("dup_docs"))
        .orderBy("source")
    }),

    // Sliding-window DOCUMENT CHUNKING — the sequence-prep primitive
    // (context-window chunks of 64 tokens, stride 48 → 16-token
    // overlap; the tail chunk may be short; an empty doc yields one
    // empty chunk). Pure map-side: the chunk starts are generated
    // INSIDE the explode from the token count, so nothing but the
    // (doc_id, chunk) rows ever exists — no joins, no shuffle beyond
    // the final presentation sort. Chunks are summarized (token count
    // + first token), not materialized as text: at 100 TB the chunk
    // TEXT never needs to leave the map side either — a writer would
    // emit it straight to the sink from the same explode.
    "q_chunk_docs" -> ((s, dir) =>
      chunkDocs(Tables.documents(s, dir)).orderBy("doc_id", "chunk_idx")),

    // Deterministic per-language STRATIFIED sampling — corpus
    // balancing (downsample the dominant language, keep the tail):
    // keep a doc iff doc_id % 100 < rate(lang). Pure map-side filter —
    // no shuffle, no rand(): reproducible across runs and retries at
    // any scale, the same id-keyed discipline as T5/q_sample_det.
    "q_stratified_sample" -> ((s, dir) => {
      val rate = when(col("lang") === "en", lit(10))
        .when(col("lang") === "zh", lit(40)).otherwise(lit(20))
      Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(100)) < rate)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // TEMPERATURE-FLATTENED MIXTURE SAMPLING — the data-mixing step
    // of multilingual corpus prep (rebalance so kept counts scale as
    // c^α, α = 1/2): per-language keep rates are DERIVED FROM THE
    // DATA, rate_bp = floor(10000·sqrt(c_min / c_lang)) basis points
    // — the tail language keeps 100%, a language k× larger keeps
    // sqrt(1/k) of its docs. Shapes for 100 TB: the rate table is a
    // languages-sized aggregate crossed with a 1-row min anchor
    // (broadcast both ways), joined back broadcast, and the keep
    // decision is a map-side salted-hash threshold — no shuffle of
    // the corpus, no per-row RNG (reruns and late retries keep the
    // SAME docs, the deterministic-sampling discipline of
    // q_sample_det). α stays on sqrt/division arithmetic only (IEEE
    // correctly-rounded in both engines) — pow/ln would need the
    // roundTo dodge.
    "q_mixture_sample" -> ((s, dir) =>
      mixtureSample(Tables.documents(s, dir)).orderBy("doc_id")),

    // MIXTURE-INTERLEAVED SHARD ORDERING — see [[shardInterleave]]:
    // the mixture-kept selection (q_mixture_sample's exact keep set,
    // source carried through) laid out as (shard, pos) with the
    // sources hash-interleaved inside every shard window. Oracle:
    // the mixture CTEs + one global row_number over the identical
    // seeded hash order + the same stripe arithmetic (DuckDB sorts
    // globally; the engine's bucket decomposition is plan-internal
    // and provably order-identical — buckets are monotone hash
    // ranges).
    "q_shard_interleave" -> ((s, dir) =>
      shardInterleave(
        mixtureSample(Tables.documents(s, dir), extraCols = Seq("source"))
          .select(col("doc_id"), col("lang"), col("source")),
        nShards = 8)
        .orderBy("shard", "pos")),

    // Corpus TF-IDF, top-3 terms per document — the relevance/keyword
    // primitive of a text pipeline. Shapes: one explode shuffle keyed
    // (doc_id, token) for tf; a token-keyed df aggregation re-derived
    // from tf (map-side partial agg on already-skinny rows — cheaper
    // than caching, same lesson as q_rate_lag); a token-keyed join
    // (vocab-sized, shuffles skinny rows only); a per-doc ranking
    // window. The corpus size joins in as a broadcast scalar. Ranking
    // orders by the ROUNDED score with a token tiebreak, so the top-3
    // is deterministic and engine-independent.
    "q_tfidf_topterms" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ex = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      val tf = ex.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val n = docs.select(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, Seq("token"))
        .crossJoin(broadcast(n))
        .withColumn("tfidf",
          roundTo(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 4))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("token").asc)
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("token"), col("tfidf"), col("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Multimodal metadata projection over the binary payload column
    // (graft.multimodal): byte length, content digest, kind routing,
    // declared-duration passthrough. The stubbed decoder's featurization
    // is covered by MultimodalSpec; this query checks the Spark-side
    // schema/plumbing against the oracle.
    "q_multimodal_meta" -> ((s, dir) =>
      graft.multimodal.Multimodal.mediaFromDocuments(s, dir).toDF()
        .select(col("media_id"), col("kind"),
          octet_length(col("payload")).as("byte_len"),
          md5(col("payload")).as("payload_md5"),
          col("declared_ms"))
        .orderBy("media_id")),

    // REAL image-container decode (round-6 verdict item 4): one tiny
    // image per document row, encoded by the JDK's OWN ImageIO
    // writers (png/jpeg/gif round-robin), then the pure-JVM header
    // parser (graft.multimodal.ImageHeader — PNG IHDR / GIF LSD /
    // JPEG SOFn marker walk) extracts format + dimensions map-side.
    // The oracle states the expected parse arithmetically from the
    // id-derived fixture functions, so a parser that misreads an
    // endianness, skips a JFIF APP0 wrong, or trips on a palette GIF
    // hash-mismatches here. Payload bytes never shuffle; the only
    // exchange is the presentation sort.
    "q_image_meta" -> ((s, dir) =>
      graft.multimodal.Multimodal.imageMeta(
        graft.multimodal.Multimodal.imagesFromDocumentsMemo(s, dir))
        .orderBy("media_id")),

    // REAL pixel resize, verified end-to-end through the container:
    // ImageIO decodes the fixture image, a bilinear Graphics2D pass
    // rescales it to the integer fit-in-box target (32×24 here), the
    // result re-encodes in its source format, and the HEADERS OF THE
    // RESIZED BYTES are what the oracle checks — so a wrong scale
    // ratio, a swapped axis, or a broken re-encode all hash-mismatch.
    // The fit arithmetic is integer-only (cross-multiplied aspect
    // test, floored short edge, ≥1) so DuckDB restates it exactly.
    // Map-side end to end; payload bytes never shuffle.
    "q_image_resize" -> ((s, dir) =>
      graft.multimodal.Multimodal.imageMeta(
        graft.multimodal.Multimodal.resizeImages(
          graft.multimodal.Multimodal.imagesFromDocumentsMemo(s, dir),
          maxW = 32, maxH = 24))
        .orderBy("media_id")),

    // VERBATIM SUBSTRING-LEVEL DEDUP — the span-granular twin of the
    // document-level dedup family (the "exact substring
    // deduplication" operator of LLM data pipelines: a document is
    // polluted in proportion to how much of it appears verbatim
    // elsewhere, even when no WHOLE document duplicates). Windows of
    // SubstrWindow consecutive tokens at stride 1 hash map-side
    // (computed INSIDE the explode — the Generate-placement rule);
    // a window occurrence is duplicated iff its hash occurs more
    // than once in the corpus (across docs or within one). The
    // output is the per-document duplication profile + keep verdict.
    //
    // Scale shape: the explode is O(total tokens) skinny (doc_id,
    // hash) rows — text never shuffles; the duplicate-hash set comes
    // from ONE hash-keyed count (map-side partials), applied back as
    // a semi-join on the same key. This window-hash formulation is
    // what production pipelines run when a true suffix array does
    // not fit; it finds every duplicated span ≥ the window width at
    // window granularity.
    // GENERATION-LOOP DETECTOR — the synthetic-data-era filter:
    // model-generated text degenerates into REPEATED runs ("loops"),
    // i.e. the SAME token window recurring many times WITHIN one
    // document. Unlike q_substring_dedup (cross-doc verbatim overlap,
    // corpus-keyed shuffle), this is per-doc state: the stride-1
    // window hashes are sorted IN-ROW and a single fold counts the
    // maximum multiplicity and the repeated-window mass — pure
    // map-side (zero shuffle, the langID shape), so it runs at crawl
    // ingestion cost. A doc with any window repeating ≥ 3× is flagged
    // (two repeats happen in natural prose; three is a loop).
    // The oracle replays the same integers by per-doc explode +
    // count — same multiset, shuffle-free only on the engine side.
    "q_loop_detect" -> ((s, dir) =>
      loopStats(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_windows"), col("max_window_mult"),
          col("rep_window_share"), col("loop_flag"))
        .orderBy("doc_id")),

    "q_substring_dedup" -> ((s, dir) => {
      val w = SubstrWindow
      val base = substrTokenized(s, dir).filter(col("n") >= w)
      withDupWindowStarts(base, w) { dupStarts =>
        val dupPerDoc = dupStarts
          .groupBy(col("doc_id")).agg(count(lit(1)).as("dup_windows"))
        base
          .select(col("doc_id"), (col("n") - (w - 1)).cast("long").as("total_windows"))
          .join(dupPerDoc, Seq("doc_id"), "left")
          .withColumn("dup_windows", coalesce(col("dup_windows"), lit(0L)))
          .withColumn("dup_frac",
            roundTo(col("dup_windows").cast("double") / col("total_windows"), 4))
          .withColumn("keep", col("dup_frac") <= 0.2)
          .orderBy("doc_id")
      }
    }),

    // SPAN-LEVEL substring dedup output (r8 verdict item 2):
    // q_substring_dedup profiles duplication; THIS is what the
    // operator is for when documents are partially duplicated — the
    // maximal duplicated token SPANS per document, ready to cut or
    // attribute. Stride-1 duplicated windows [st, st+w-1] merge into
    // maximal spans by gaps-and-islands: windows all have width w and
    // starts arrive sorted, so the running span end is lag(st)+w-1
    // and a new island starts exactly when st > lag(st)+w
    // (overlapping OR abutting windows merge — one verbatim region,
    // one span). The island sum and the span aggregation shuffle on
    // doc_id over skinny (doc_id, st) rows — text never moves, and
    // the duplicate-hash set is the same ONE hash-keyed count +
    // semi-join as q_substring_dedup.
    "q_substring_spans" -> ((s, dir) => {
      val w = SubstrWindow
      val base = substrTokenized(s, dir).filter(col("n") >= w)
      withDupWindowStarts(base, w) { dupStarts =>
        mergeDupSpans(dupStarts, w)
          .select(col("doc_id"),
            col("s0").cast("long").as("span_start"),
            col("s1").cast("long").as("span_end"))
          .withColumn("span_len", col("span_end") - col("span_start") + 1)
          .orderBy("doc_id", "span_start")
      }
    }),

    // CLEANED-TEXT substring dedup — the cut applied: tokens covered
    // by any duplicated maximal span drop, survivors rejoin in order.
    // The span set per document is SMALL (merged maximal spans, not
    // windows), so coverage is a map-side array filter against a
    // per-doc span list — the only shuffles are the span derivation
    // (same shape as q_substring_spans) and the doc_id join of the
    // skinny span lists back to the text. Every document appears,
    // including those shorter than the window (nothing to dedup —
    // text passes through).
    "q_substring_clean" -> ((s, dir) => {
      val w = SubstrWindow
      val docs = substrTokenized(s, dir)
      val base = docs.filter(col("n") >= w)
      withDupWindowStarts(base, w) { dupStarts =>
        val spans = mergeDupSpans(dupStarts, w)
          .groupBy(col("doc_id"))
          .agg(collect_list(struct(col("s0"), col("s1"))).as("spans"))
        docs.join(spans, Seq("doc_id"), "left")
          .withColumn("spans", coalesce(col("spans"),
            array().cast("array<struct<s0:int,s1:int>>")))
          .withColumn("kept", filter(col("toks"), (t, i) =>
            !exists(col("spans"),
              sp => i + 1 >= sp("s0") && i + 1 <= sp("s1"))))
          .select(col("doc_id"),
            col("n").cast("long").as("n_tokens"),
            size(col("kept")).cast("long").as("kept_tokens"),
            array_join(col("kept"), " ").as("clean_text"))
          .orderBy("doc_id")
      }
    }),

    // PERCEPTUAL image near-dup — the media analog of q_minhash_dedup,
    // closing the re-encoded-duplicate gap exact-byte dedup cannot
    // touch: each fixture group is ONE 64×64 pixel pattern encoded in
    // THREE containers (png/jpeg/gif), so the pairs exist only at the
    // pixel level. aHash (8×8 box-average luminance vs global mean —
    // see graft.multimodal.ImagePhash for why not dHash) is computed
    // MAP-SIDE from the decoded bitmap; candidates come from a
    // 4-band×16-bit Hamming band join (the SimHash banding
    // discipline: any pair within Hamming 3 shares at least one band
    // BY CONSTRUCTION — exact for the threshold — and the pair space
    // never materializes: shuffle keys are (band, short), never
    // payloads); survivors verify popcount(xor) ≤ 3.
    //
    // BAND WIDTH IS THE SCALE KNOB (ImageDedupScaleProbe measured
    // it): 8-bit bands guarantee Hamming ≤ 7 but give only 256
    // buckets per band, so the cross-group COINCIDENCE candidates
    // grow as n²/512 — 1.4e9 emitted pairs at 300k images (11.8 s of
    // pure popcount), 1.4e13 at 30M: a quadratic wall. 16-bit bands
    // cut the coincidence term 512× and still guarantee the Hamming
    // that actually occurs: a re-encode of the same bitmap measures
    // distance 0 (the aHash margins are ±half the dynamic range —
    // MultimodalSpec pins ≤ 3 across png/jpeg/gif), while distinct
    // patterns sit near 32. The oracle restates the planted group
    // arithmetic (doc_id/3): a false positive across groups or a
    // miss within a group both hash-mismatch.
    // Round-9 hardening (r8 verdict item 1): candidate generation is
    // [[HammingDedup.pairs64]] — the band join runs over DISTINCT
    // hashes (representative collapse: a mass-duplicated logo is ONE
    // band row no matter its copy count) with the minhash-style
    // one-sided `maxBucket` cap on degenerate (band, key) buckets;
    // identical-hash members rejoin after verification. Output is
    // unchanged (oracle stays the planted-group arithmetic); the
    // adversarial mass-duplicate probe lives in ImageDedupScaleProbe
    // and the linear-output production form is
    // [[HammingDedup.clusters64]].
    "q_image_neardup" -> ((s, dir) => {
      val hashed = graft.multimodal.Multimodal.nearDupImagePHashesMemo(s, dir)
      HammingDedup.pairs64(hashed, "media_id", "ahash",
          nBands = 4, maxHamming = 3, maxBucket = Some(HammingDedup.CapBucket))
        .orderBy("id_a", "id_b")
    }),

    // CONTENT-LEVEL video near-dup (r8 verdict item 3) — the video
    // twin of q_image_neardup: consecutive id PAIRS share identical
    // per-frame pixels muxed in different containers with different
    // frame codecs (MP4+JPEG vs AVI+PNG —
    // VideoFixture.encodeNearDup), so the pairs exist only after
    // demux (VideoHeader.frameRanges: stsz/stco sample spans, movi
    // 00dc chunks) → evenly-spaced frame sampling → per-frame aHash.
    // Candidates come from a (slot, band, key16) join over DISTINCT
    // signatures (rep collapse + maxBucket — the HammingDedup
    // discipline); verification demands every sampled slot agree
    // within Hamming 3. The oracle restates the planted-group
    // arithmetic: a cross-group false positive (independent per-frame
    // patterns) or a within-group miss (JPEG vs PNG re-encode) both
    // hash-mismatch.
    "q_video_neardup" -> ((s, dir) => {
      val fh = graft.multimodal.VideoDedup.nearDupFrameHashesMemo(s, dir)
        .toDF()
      graft.multimodal.VideoDedup.nearDupPairs(fh, maxHamming = 3,
          nBands = 4, maxBucket = Some(HammingDedup.CapBucket))
        .orderBy("id_a", "id_b")
    }),

    // NEAR-DUP CLUSTER LABELS — the linear-output production form of
    // the Hamming near-dup lane (HammingDedup.clusters64), declared
    // under the gate: pair output is inherently C(n,2)-sized under
    // mass duplication, so at 100 TB the serve shape is (member →
    // min-id representative of its connected near-dup component),
    // with component resolution at DISTINCT-hash granularity (a
    // pattern duplicated 10M times costs ONE CC node) and members
    // joining their label back by hash. Over the planted image
    // fixture the component structure is exactly the doc_id/3
    // triples, so the oracle states every label arithmetically: a
    // lost member, a cross-group merge, or a label that is not the
    // component minimum all hash-mismatch.
    "q_media_clusters" -> ((s, dir) => {
      val hashed = graft.multimodal.Multimodal.nearDupImagePHashesMemo(s, dir)
      HammingDedup.clusters64(hashed, "media_id", "ahash",
          nBands = 4, maxHamming = 3)
        .orderBy("media_id")
    }),

    // CONTAINER-INVARIANT audio near-dup — the audio twin of
    // q_image_neardup/q_video_neardup, completing the multimodal
    // dedup triple: consecutive id TRIPLES share one recording muxed
    // as WAV vs AIFF vs AU (little- vs big-endian PCM — byte-level
    // dedup can never pair them), with the third member REMASTERED
    // (volume halved + one window altered). The 64-bit
    // energy-delta-sign fingerprint (graft.multimodal.AudioDedup) is
    // gain-invariant, so the remaster lands within Hamming ≤ 2 and
    // the rep-collapsed capped Hamming band join emits exactly the
    // planted group pairs, which the oracle restates arithmetically.
    // A fingerprint that reads samples in container byte order, mixes
    // channels non-uniformly, or compares energies with float
    // rounding hash-mismatches here.
    "q_audio_neardup" -> ((s, dir) => {
      val fp = graft.multimodal.AudioDedup.nearDupFingerprintsMemo(s, dir)
      graft.multimodal.AudioDedup.nearDupPairs(fp)
        .orderBy("id_a", "id_b")
    }),

    // REAL audio-container decode — the audio leg of the multimodal
    // pipeline, same design as q_image_meta: one tiny PCM clip per
    // document row encoded by the JDK's own javax.sound.sampled
    // writers (wav/aiff/au round-robin), then the pure-JVM header
    // parser (graft.multimodal.AudioHeader — RIFF fmt-chunk walk,
    // AIFF COMM with its 80-bit extended-float rate, AU big-endian
    // header) extracts channels/rate/depth/frames/duration map-side.
    // The oracle states every field arithmetically from the id-derived
    // fixture functions, so a parser that misreads the RIFF chunk
    // padding, the extended-float exponent bias, or the AU encoding
    // table hash-mismatches here. Payload bytes never shuffle.
    "q_audio_meta" -> ((s, dir) =>
      graft.multimodal.Multimodal.audioMeta(
        graft.multimodal.Multimodal.audiosFromDocuments(s, dir))
        .orderBy("media_id")),

    // REAL video-container decode — the last multimodal leg, same
    // design as q_image_meta/q_audio_meta: one tiny container per
    // document row (MP4 box trees / AVI RIFF structures alternating
    // by id, spec-constructed since the JDK has no video muxer — with
    // version-1 64-bit movie headers and sound-first track orders
    // mixed in), then the pure-JVM header parser
    // (graft.multimodal.VideoHeader — ISO-BMFF box walk to
    // mvhd/tkhd/stsz, AVI hdrl/avih chunk walk) extracts dimensions,
    // frame count, and duration map-side. The oracle states every
    // field arithmetically from the id-derived fixture functions, so
    // a parser that takes the first (audio) trak, misreads the
    // version-dependent tkhd offsets, or mishandles RIFF even-padding
    // hash-mismatches here. Payload bytes never shuffle.
    "q_video_meta" -> ((s, dir) =>
      graft.multimodal.Multimodal.videoMeta(
        graft.multimodal.Multimodal.videosFromDocuments(s, dir))
        .orderBy("media_id")),

    // Frame sampling over the video leg, oracle-gated: the stub
    // decoder's featurization is deterministic arithmetic (n_frames =
    // byte_len/1000 + 1), so the evenly-spaced explode — indices
    // 0, step, 2·step with step = ceil(n_frames/maxFrames), offsets
    // frame_idx · floor(byte_len/n_frames) — is SQL-expressible and
    // the whole sampling plumbing (kind routing, sequence bounds,
    // offset arithmetic) hash-checks. Pure column ops after the
    // map-side featurization; no payload bytes move.
    "q_frame_sample" -> ((s, dir) => {
      val feats = graft.multimodal.Multimodal.extractFeatures(
        graft.multimodal.Multimodal.mediaFromDocuments(s, dir))
      graft.multimodal.Multimodal.sampleFrames(feats, maxFrames = 4).toDF()
        .select(col("media_id"), col("frame_idx"), col("byte_offset"))
        .orderBy("media_id", "frame_idx")
    }),

    // Decode → sample composition over REAL containers: the frame
    // counts driving the evenly-spaced explode come from the MP4
    // stsz / AVI avih headers (AvHeaderDecoder), not the stub
    // arithmetic — so this query gates the full path a curation
    // pipeline runs: parse the container map-side, then bound the
    // per-clip work by sampling ≤ maxFrames real frames. The oracle
    // restates the fixture's frame counts ((doc_id % 89) + 24) and
    // the sampler's stride arithmetic; byte offsets are omitted (a
    // real container's frame offsets live in its chunk tables, not
    // in uniform-stride arithmetic).
    "q_video_frames" -> ((s, dir) => {
      val feats = graft.multimodal.Multimodal.extractFeatures(
        graft.multimodal.Multimodal.videosFromDocuments(s, dir),
        () => new graft.multimodal.Multimodal.AvHeaderDecoder)
      graft.multimodal.Multimodal.sampleFrames(feats, maxFrames = 4).toDF()
        .select(col("media_id"), col("frame_idx"))
        .orderBy("media_id", "frame_idx")
    }),

    // SimHash fingerprints via the native codegen'd expression
    // (graft.functions.SimHash60Md5): 60-bit per-bit majority vote over
    // the md5-prefix token hash — bit-reproducible in DuckDB SQL, so
    // this query is oracle-checked (the murmur3 SimHash64 fast path
    // stays available and is covered by FunctionsSpec).
    "q_simhash" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), graft.functions.simhash60_md5(col("toks")).as("simhash"))
        .orderBy("doc_id")),

    // SimHash near-dup pairs: 4×15-bit band join over the 60-bit
    // fingerprints (near-dups agree on ≥1 band w.h.p.), verified by
    // Hamming distance ≤ 8. Candidate generation is a hash join on
    // (band_id, band_bits) — no pair-space scan, same scale shape as
    // MinHash-LSH. The fingerprint subtree (one md5 per token) is
    // persisted: both sides of the self-join consume it, and
    // recomputing it doubles the dominant cost.
    "q_simhash_pairs" -> ((s, dir) => {
      val fp = Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), graft.functions.simhash60_md5(col("toks")).as("simhash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val banded = fp.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 15).bitwiseAND(lit(0x7fffL))): _*)))
        .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_bits")
      banded.as("a").join(banded.as("b"),
          col("a.band_id") === col("b.band_id") &&
            col("a.band_bits") === col("b.band_bits") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 8)
        .orderBy("id_a", "id_b")
    })
  )

  val oracle: Map[String, String] = {
    val toksSql = tokensSql("text")
    // The full training-data selection as a CTE stack ending in
    // `keep` — ONE definition shared by q_corpus_pipeline and
    // q_training_shards so the two oracles can never drift from each
    // other (the Spark side already shares corpusPipelineKeepers).
    val corpusKeepCtes =
      s"""${minhashPairsSqlCtes()},
         |edges AS (SELECT id_a AS src, id_b AS dst FROM np
         |          UNION ALL SELECT id_b, id_a FROM np),
         |reach(n, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.n, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         |lbl AS (SELECT n AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY 1),
         |${qualityCtesSql(withDigest = false)},
         |$repCtesSql,
         |sd AS (SELECT doc_id,
         |    ${shingleHashesSql(shinglesSql(s"($toksSql)"))} AS hsh FROM documents),
         |sex0 AS (SELECT doc_id, unnest(hsh) AS h FROM sd),
         |snd AS (SELECT count(*) AS n_docs FROM documents),
         |shot AS (SELECT h FROM
         |    (SELECT h, count(*) AS df FROM sex0 GROUP BY 1) t CROSS JOIN snd
         |  WHERE t.df > LEAST(GREATEST(n_docs // $DeconDfDenom, $DeconDfFloor), $DeconDfAbs)),
         |sex AS (SELECT * FROM sex0 WHERE h NOT IN (SELECT h FROM shot)),
         |cont AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT c.doc_id, e.doc_id AS eval_id, count(*) AS n
         |    FROM sex c JOIN sex e ON c.h = e.h
         |    WHERE e.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
         |    GROUP BY 1, 2 HAVING count(*) >= 3)),
         |keep AS (
         |  SELECT u.doc_id, u.lang, u.n_tokens, u.quality_score
         |  FROM u
         |  JOIN lbl ON u.doc_id = lbl.doc_id AND lbl.cluster_rep = u.doc_id
         |  JOIN rq ON rq.doc_id = u.doc_id
         |  WHERE rq.distinct_ratio >= 0.5 AND rq.top_token_frac <= 0.2
         |    AND rq.dup_bigram_frac <= 0.1
         |    AND u.doc_id % 97 <> 0
         |    AND u.doc_id NOT IN (SELECT doc_id FROM cont)
         |    AND u.quality_score >= 0.3 AND u.marker_hits > 0)""".stripMargin
    Map(
      "q_dedup_exact" ->
        s"""SELECT md5(${normTextSql("text")}) AS text_hash,
           |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_fingerprint" ->
        s"""SELECT doc_id, md5(${normTextSql("text")}) AS fp_md5,
           |  ${hash60Sql(normTextSql("text"))} AS fp60
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q_token_count" ->
        s"""SELECT doc_id, CAST(len($toksSql) AS INTEGER) AS n_tokens
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q_token_bpe" ->
        s"""WITH p AS (SELECT doc_id, ${bpePiecesSql("text")} AS pieces,
           |    $toksSql AS toks FROM documents)
           |SELECT doc_id,
           |  CAST(len(pieces) AS INTEGER) AS n_pieces,
           |  CAST(len(list_filter(pieces, x -> trim(x) != '')) AS INTEGER) AS n_tokens_bpe,
           |  CAST(len(toks) AS INTEGER) AS n_tokens_ws
           |FROM p ORDER BY doc_id""".stripMargin,

      "q_text_stats" ->
        s"""WITH t AS (SELECT lang, source, n_chars,
           |  CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents)
           |SELECT lang, source, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           |  ${roundToSql("CAST(sum(n_chars) AS DOUBLE) / count(*)", 2)} AS avg_chars
           |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_text_quality" -> {
        val stopLst = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
        s"""WITH t AS (
           |  SELECT doc_id, n_chars, text, $toksSql AS toks,
           |    length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct
           |  FROM documents),
           |u AS (
           |  SELECT doc_id, n_chars, text, n_punct,
           |    CAST(len(toks) AS INTEGER) AS n_tokens,
           |    CAST(len(list_filter(toks, t -> list_contains($stopLst, t))) AS DOUBLE) AS stop_hits,
           |    CAST(len(toks) AS DOUBLE) AS n_tok_d
           |  FROM t)
           |SELECT doc_id, n_chars, n_tokens, n_punct,
           |  ${roundToSql("stop_hits / GREATEST(n_tok_d, 1.0)", 4)} AS stopword_ratio,
           |  ${roundToSql("(length(text) - (n_tok_d - 1)) / GREATEST(n_tok_d, 1.0)", 4)} AS mean_token_len,
           |  ${roundToSql(
              "LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4" +
              " + LEAST(stop_hits / GREATEST(n_tok_d, 1.0) * 5.0, 1.0) * 0.3" +
              " + LEAST(CAST(n_punct AS DOUBLE) * 10.0 / GREATEST(length(text), 1), 1.0) * 0.3", 4)} AS quality_score
           |FROM u ORDER BY doc_id""".stripMargin
      },

      "q_lang_id" -> {
        val hitCols = langMarkers.map { case (lang, words) =>
          s"${markerHitsSql("toks", words)} AS hits_$lang" }.mkString(",\n    ")
        val structs = langMarkers.map { case (lang, _) =>
          s"{'hits': hits_$lang, 'lang': '$lang'}" }.mkString("[", ", ", "]")
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |h AS (SELECT doc_id,
           |    $hitCols
           |  FROM t),
           |p AS (SELECT doc_id,
           |    reduce($structs,
           |      (acc, x) -> CASE WHEN x.hits > acc.hits OR
           |        (x.hits = acc.hits AND x.lang < acc.lang) THEN x ELSE acc END) AS best
           |  FROM h)
           |SELECT doc_id,
           |  CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang_pred,
           |  CAST(best.hits AS INTEGER) AS marker_hits
           |FROM p ORDER BY doc_id""".stripMargin
      },

      // chunked replay of the same argmax + gaps-and-islands merge on
      // language change — mirrors [[langSpans]] stage for stage
      "q_lang_spans" -> {
        val c = LangChunk
        val hitCols = langMarkers.map { case (lang, words) =>
          s"${markerHitsSql("ctoks", words)} AS hits_$lang" }.mkString(",\n    ")
        val structs = langMarkers.map { case (lang, _) =>
          s"{'hits': hits_$lang, 'lang': '$lang'}" }.mkString("[", ", ", "]")
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |b AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
           |ck AS (SELECT doc_id, n, ci,
           |    toks[ci * $c + 1 : ci * $c + $c] AS ctoks
           |  FROM b, unnest(range(0, (n - 1) // $c + 1)) AS u(ci)),
           |h AS (SELECT doc_id, n, ci,
           |    $hitCols
           |  FROM ck),
           |p AS (SELECT doc_id, n, ci,
           |    reduce($structs,
           |      (acc, x) -> CASE WHEN x.hits > acc.hits OR
           |        (x.hits = acc.hits AND x.lang < acc.lang) THEN x ELSE acc END) AS best
           |  FROM h),
           |l AS (SELECT doc_id, n, ci,
           |    CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang
           |  FROM p),
           |g AS (SELECT doc_id, n, ci, lang,
           |    CASE WHEN lag(lang) OVER (PARTITION BY doc_id ORDER BY ci) IS NULL
           |           OR lag(lang) OVER (PARTITION BY doc_id ORDER BY ci) = lang
           |         THEN 0 ELSE 1 END AS brk
           |  FROM l),
           |i AS (SELECT doc_id, n, ci, lang,
           |    sum(brk) OVER (PARTITION BY doc_id ORDER BY ci
           |                   ROWS UNBOUNDED PRECEDING) AS span
           |  FROM g)
           |SELECT doc_id, CAST(span AS BIGINT) AS span, lang,
           |  CAST(min(ci) * $c + 1 AS BIGINT) AS tok_start,
           |  CAST(least(max(ci) * $c + $c, max(n)) AS BIGINT) AS tok_end,
           |  count(*) AS n_chunks
           |FROM i GROUP BY doc_id, span, lang
           |ORDER BY doc_id, span""".stripMargin
      },

      // chunked replay of the code/prose classification + islands
      // merge on kind change — mirrors [[codeSpans]] stage for stage
      // over the same planted fixture
      "q_code_spans" -> {
        val c = LangChunk
        val kwLst = codeKeywords.map(w => s"'$w'").mkString("[", ", ", "]")
        s"""WITH f AS (SELECT doc_id,
           |    ${codeFixtureSql("text", "doc_id")} AS ctext FROM documents),
           |t AS (SELECT doc_id, ${tokensSql("ctext")} AS toks FROM f),
           |b AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
           |ck AS (SELECT doc_id, n, ci,
           |    toks[ci * $c + 1 : ci * $c + $c] AS ctoks
           |  FROM b, unnest(range(0, (n - 1) // $c + 1)) AS u(ci)),
           |h AS (SELECT doc_id, n, ci,
           |    len(list_filter(ctoks, t -> regexp_matches(t, '$codeSymClass')
           |      OR list_contains($kwLst, t))) AS n_code,
           |    len(ctoks) AS nc
           |  FROM ck),
           |l AS (SELECT doc_id, n, ci,
           |    CASE WHEN n_code * 3 >= nc THEN 'code' ELSE 'prose' END AS kind
           |  FROM h),
           |g AS (SELECT doc_id, n, ci, kind,
           |    CASE WHEN lag(kind) OVER (PARTITION BY doc_id ORDER BY ci) IS NULL
           |           OR lag(kind) OVER (PARTITION BY doc_id ORDER BY ci) = kind
           |         THEN 0 ELSE 1 END AS brk
           |  FROM l),
           |i AS (SELECT doc_id, n, ci, kind,
           |    sum(brk) OVER (PARTITION BY doc_id ORDER BY ci
           |                   ROWS UNBOUNDED PRECEDING) AS span
           |  FROM g)
           |SELECT doc_id, CAST(span AS BIGINT) AS span, kind,
           |  CAST(min(ci) * $c + 1 AS BIGINT) AS tok_start,
           |  CAST(least(max(ci) * $c + $c, max(n)) AS BIGINT) AS tok_end,
           |  count(*) AS n_chunks
           |FROM i GROUP BY doc_id, span, kind
           |ORDER BY doc_id, span""".stripMargin
      },

      // no-split packing replayed faithfully in both lanes: the FFD
      // placement as a per-chunk RECURSIVE CTE whose state row
      // carries the open-bin residual LIST (first-fit = min lambda
      // index with residual >= n — chunkedFfd's linear scan); the
      // id-order next-fit baseline as the bin-successor walk (each
      // step finds the unique doc whose token interval contains
      // start + C — exactly nextFitBinCount's interval join). Jumbo
      // lane and both padding ratios from the same scalars the Spark
      // side collects.
      "q_pack_ffd" -> {
        val C = PackContext
        val Ch = PackFfdChunk
        val idx = "list_min(list_transform(p.bins, " +
          "(b, ii) -> CASE WHEN b >= d.n THEN ii END))"
        def ratioSql(bins: String): String =
          s"CASE WHEN ($bins + m.j_bins) = 0 THEN 0.0 ELSE " +
            roundToSql(s"CAST(($bins * $C - m.t_small) + m.j_pad AS DOUBLE)" +
              s" / CAST(($bins + m.j_bins) * $C AS DOUBLE)", 6) + " END"
        s"""WITH RECURSIVE t AS (SELECT doc_id,
           |    CAST(len($toksSql) AS BIGINT) AS n FROM documents),
           |nz AS (SELECT doc_id, n FROM t WHERE n >= 1),
           |small AS (SELECT doc_id, n FROM nz WHERE n <= $C),
           |jo AS (SELECT doc_id, n, (n + $C - 1) // $C AS bb
           |  FROM nz WHERE n > $C),
           |o1 AS (SELECT doc_id, n,
           |    row_number() OVER (ORDER BY n DESC, doc_id) - 1 AS r
           |  FROM small),
           |k1 AS (SELECT CAST((count(*) + $Ch - 1) // $Ch AS BIGINT) AS k
           |  FROM small),
           |d1 AS (SELECT doc_id, n, r % k AS chunk, r // k AS i
           |  FROM o1 CROSS JOIN k1),
           |rec1(chunk, i, doc_id, n, bin, slot, bins) AS (
           |  SELECT chunk, i, doc_id, n, CAST(0 AS BIGINT),
           |    CAST(0 AS BIGINT), [CAST($C - n AS BIGINT)]
           |  FROM d1 WHERE i = 0
           |  UNION ALL
           |  SELECT d.chunk, d.i, d.doc_id, d.n,
           |    CASE WHEN $idx IS NULL THEN CAST(len(p.bins) AS BIGINT)
           |         ELSE CAST($idx - 1 AS BIGINT) END,
           |    CASE WHEN $idx IS NULL THEN CAST(0 AS BIGINT)
           |         ELSE CAST($C AS BIGINT) - p.bins[$idx] END,
           |    CASE WHEN $idx IS NULL
           |         THEN list_append(p.bins, CAST($C AS BIGINT) - d.n)
           |         ELSE list_transform(p.bins, (b, ii) ->
           |                CASE WHEN ii = $idx THEN b - d.n ELSE b END) END
           |  FROM rec1 p JOIN d1 d ON d.chunk = p.chunk AND d.i = p.i + 1),
           |cb1 AS (SELECT chunk, CAST(max(bin) + 1 AS BIGINT) AS bins
           |  FROM rec1 GROUP BY 1),
           |co1 AS (SELECT chunk,
           |    CAST(COALESCE(SUM(bins) OVER (ORDER BY chunk
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS off
           |  FROM cb1),
           |a1 AS (SELECT r1.doc_id, r1.n, co1.off + r1.bin AS example_id,
           |    r1.slot AS slot_start
           |  FROM rec1 r1 JOIN co1 USING (chunk)),
           |o2 AS (SELECT doc_id, n,
           |    row_number() OVER (ORDER BY doc_id) - 1 AS r,
           |    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS s
           |  FROM small),
           |s2(r, s) AS (
           |  SELECT r, s FROM o2 WHERE r = 0
           |  UNION ALL
           |  SELECT j.r, j.s FROM s2 st JOIN o2 j
           |    ON j.s <= st.s + $C AND st.s + $C < j.s + j.n),
           |m AS (SELECT
           |    (SELECT CAST(COALESCE(SUM(bins), 0) AS BIGINT) FROM cb1)
           |      AS b_ffd,
           |    (SELECT count(*) FROM s2) AS b_id,
           |    (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM small)
           |      AS t_small,
           |    (SELECT CAST(COALESCE(SUM(bb), 0) AS BIGINT) FROM jo)
           |      AS j_bins,
           |    (SELECT CAST(COALESCE(SUM(bb * $C - n), 0) AS BIGINT) FROM jo)
           |      AS j_pad),
           |ja AS (SELECT doc_id, n,
           |    (SELECT CAST(COALESCE(SUM(bins), 0) AS BIGINT) FROM cb1) +
           |      CAST(COALESCE(SUM(bb) OVER (ORDER BY doc_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |        AS BIGINT) AS example_id,
           |    CAST(0 AS BIGINT) AS slot_start FROM jo),
           |u AS (SELECT doc_id, n, example_id, slot_start FROM a1
           |      UNION ALL
           |      SELECT doc_id, n, example_id, slot_start FROM ja)
           |SELECT u.doc_id, u.n AS n_tokens,
           |  CAST(u.example_id AS BIGINT) AS example_id,
           |  CAST(u.slot_start AS BIGINT) AS slot_start,
           |  ${ratioSql("m.b_ffd")} AS pad_ratio_ffd,
           |  ${ratioSql("m.b_id")} AS pad_ratio_id
           |FROM u CROSS JOIN m ORDER BY u.doc_id""".stripMargin
      },

      // the same packing replayed as DuckDB's window cumsum (fine at
      // oracle scale; the Spark side refuses the single-task window
      // and runs the two-phase scan). SUM(BIGINT) is HUGEINT in
      // DuckDB — cast back or the dtype gate fails.
      "q_pack_sequences" ->
        s"""WITH t AS (SELECT doc_id,
           |    CAST(len($toksSql) AS BIGINT) AS n FROM documents),
           |nz AS (SELECT doc_id, n FROM t WHERE n >= 1),
           |c AS (SELECT doc_id, n,
           |    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS st
           |  FROM nz)
           |SELECT doc_id, n AS n_tokens, st AS start_tok,
           |  st + n AS end_tok,
           |  st // $PackContext AS first_example,
           |  (st + n - 1) // $PackContext AS last_example,
           |  ((st + n - 1) // $PackContext) - (st // $PackContext) + 1
           |    AS n_examples
           |FROM c ORDER BY doc_id""".stripMargin,

      "q_budget_select" ->
        s"""WITH ${qualityCtesSql(withDigest = false)},
           |b AS (SELECT doc_id, quality_score,
           |    CAST(n_tokens AS BIGINT) AS n FROM u WHERE n_tokens >= 1),
           |tot AS (SELECT CAST(SUM(n) AS BIGINT) // 2 AS budget FROM b),
           |c AS (SELECT doc_id, quality_score, n,
           |    CAST(SUM(n) OVER (ORDER BY quality_score DESC, doc_id ASC
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM b)
           |SELECT doc_id, quality_score, n AS n_tokens, cum AS cum_tokens
           |FROM c CROSS JOIN tot WHERE cum <= budget
           |ORDER BY quality_score DESC, doc_id""".stripMargin,

      // truth = the q_ngram_jaccard chain (t-prefixed names — the
      // minhash CTEs own d/sig/banded); hits by pair-key join
      "q_dedup_recall" -> dedupRecallSql(maxBucket = None),

      "q_dedup_recall_capped" -> dedupRecallSql(maxBucket = Some(CapBucket)),

      "q_source_quality" ->
        s"""WITH ${qualityCtesSql(withDigest = true)},
           |s AS (SELECT u.doc_id, u.h, u.n_tokens, u.quality_score,
           |    d.source
           |  FROM u JOIN documents d ON u.doc_id = d.doc_id)
           |SELECT source, count(*) AS n_docs,
           |  CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS n_tokens,
           |  ${roundToSql(
               "CAST(SUM(CAST(quality_score AS DECIMAL(18,4))) AS DOUBLE)" +
                 " / count(*)", 4)} AS avg_quality,
           |  count(*) - count(DISTINCT h) AS dup_docs
           |FROM s GROUP BY source ORDER BY source""".stripMargin,

      "q_chunk_docs" ->
        s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |e AS (SELECT doc_id, toks, len(toks) AS n FROM d),
           |c AS (SELECT doc_id, toks, n,
           |    unnest(range(0, GREATEST(n, 1), $ChunkStride)) AS start FROM e)
           |SELECT doc_id,
           |  CAST(start // $ChunkStride AS INTEGER) AS chunk_idx,
           |  CAST(LEAST(n - start, $ChunkSize) AS INTEGER) AS chunk_tokens,
           |  toks[start + 1] AS first_token
           |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

      "q_stratified_sample" ->
        """SELECT doc_id, lang FROM documents
          |WHERE doc_id % 100 < CASE WHEN lang = 'en' THEN 10
          |  WHEN lang = 'zh' THEN 40 ELSE 20 END
          |ORDER BY doc_id""".stripMargin,

      // same α = 1/2 flattening: integer counts → double division →
      // sqrt → floor, all IEEE-correctly-rounded, so the basis-point
      // thresholds agree bit-exactly across engines
      "q_mixture_sample" ->
        s"""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
           |m AS (SELECT min(c) AS cmin FROM c),
           |r AS (SELECT lang,
           |    CAST(floor(10000 * sqrt(CAST(cmin AS DOUBLE) / c)) AS INTEGER)
           |      AS rate_bp
           |  FROM c CROSS JOIN m)
           |SELECT d.doc_id, d.lang, r.rate_bp
           |FROM documents d JOIN r USING (lang)
           |WHERE ${hash60Sql("'mix:' || CAST(d.doc_id AS VARCHAR)")} % 10000
           |  < r.rate_bp
           |ORDER BY d.doc_id""".stripMargin,

      "q_shard_interleave" ->
        s"""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
           |m AS (SELECT min(c) AS cmin FROM c),
           |r AS (SELECT lang,
           |    CAST(floor(10000 * sqrt(CAST(cmin AS DOUBLE) / c)) AS INTEGER)
           |      AS rate_bp
           |  FROM c CROSS JOIN m),
           |kept AS (
           |  SELECT d.doc_id, d.lang, d.source,
           |    ${hash60Sql("'il:il0:' || CAST(d.doc_id AS VARCHAR)")} AS h
           |  FROM documents d JOIN r USING (lang)
           |  WHERE ${hash60Sql("'mix:' || CAST(d.doc_id AS VARCHAR)")} % 10000
           |    < r.rate_bp),
           |p AS (
           |  SELECT doc_id, lang, source,
           |    row_number() OVER (ORDER BY h ASC, doc_id ASC) - 1 AS pg
           |  FROM kept)
           |SELECT doc_id, lang, source,
           |  CAST(pg % 8 AS INTEGER) AS shard, CAST(pg // 8 AS BIGINT) AS pos
           |FROM p ORDER BY shard, pos""".stripMargin,

      "q_tfidf_topterms" ->
        s"""WITH ex AS (
           |  SELECT doc_id, unnest($toksSql) AS token FROM documents),
           |fx AS (SELECT doc_id, token FROM ex WHERE token != ''),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM fx GROUP BY 1, 2),
           |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT count(*) AS n_docs FROM documents),
           |scored AS (
           |  SELECT tf.doc_id, tf.token,
           |    ${roundToSql("tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0))", 4)} AS tfidf
           |  FROM tf JOIN df USING (token) CROSS JOIN n),
           |ranked AS (
           |  SELECT doc_id, token, tfidf,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY tfidf DESC, token ASC) AS rnk
           |  FROM scored)
           |SELECT doc_id, token, tfidf, CAST(rnk AS INTEGER) AS rnk
           |FROM ranked WHERE rnk <= 3
           |ORDER BY doc_id, rnk""".stripMargin,

      "q_multimodal_meta" ->
        """SELECT doc_id AS media_id,
          |  (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
          |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
          |  md5(text) AS payload_md5,
          |  CASE WHEN doc_id % 5 = 0 THEN CAST(n_chars * 10 AS INTEGER) END AS declared_ms
          |FROM documents ORDER BY media_id""".stripMargin,

      "q_image_meta" ->
        """SELECT doc_id AS media_id,
          |  (['png', 'jpeg', 'gif'])[(doc_id % 3) + 1] AS format,
          |  CAST((doc_id % 61) + 4 AS INTEGER) AS width,
          |  CAST((doc_id % 43) + 4 AS INTEGER) AS height
          |FROM documents ORDER BY media_id""".stripMargin,

      "q_image_resize" ->
        """WITH d AS (
          |  SELECT doc_id AS media_id,
          |    (['png', 'jpeg', 'gif'])[(doc_id % 3) + 1] AS format,
          |    (doc_id % 61) + 4 AS w, (doc_id % 43) + 4 AS h
          |  FROM documents)
          |SELECT media_id, format,
          |  CAST(CASE WHEN w <= 32 AND h <= 24 THEN w
          |    WHEN w * 24 >= h * 32 THEN 32
          |    ELSE greatest(1, (w * 24) // h) END AS INTEGER) AS width,
          |  CAST(CASE WHEN w <= 32 AND h <= 24 THEN h
          |    WHEN w * 24 >= h * 32 THEN greatest(1, (h * 32) // w)
          |    ELSE 24 END AS INTEGER) AS height
          |FROM d ORDER BY media_id""".stripMargin,

      // per-doc window multiplicity, replayed by explode + count —
      // the same integer multiset the engine's in-row sorted fold
      // walks (the oracle may shuffle; the engine side must not)
      "q_loop_detect" -> {
        val w = SubstrWindow
        s"""WITH t AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
           |b AS (SELECT doc_id, toks, len(toks) AS n FROM t),
           |wi AS (
           |  SELECT doc_id,
           |    ${hash60Sql(s"array_to_string(toks[s:s+${w - 1}], ' ')")} AS h
           |  FROM b, unnest(range(1, n - ${w - 2})) AS u(s)
           |  WHERE n >= $w),
           |m AS (SELECT doc_id, h, count(*) AS c FROM wi GROUP BY 1, 2),
           |agg AS (SELECT doc_id,
           |    CAST(SUM(c) AS BIGINT) AS n_windows,
           |    CAST(MAX(c) AS BIGINT) AS max_window_mult,
           |    CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
           |      AS reps
           |  FROM m GROUP BY 1)
           |SELECT b.doc_id,
           |  CAST(COALESCE(a.n_windows, 0) AS BIGINT) AS n_windows,
           |  CAST(COALESCE(a.max_window_mult, 0) AS BIGINT) AS max_window_mult,
           |  CASE WHEN COALESCE(a.n_windows, 0) > 0
           |       THEN ${roundToSql("CAST(a.reps AS DOUBLE) / a.n_windows", 6)}
           |       ELSE 0.0 END AS rep_window_share,
           |  COALESCE(a.max_window_mult, 0) >= 3 AS loop_flag
           |FROM b LEFT JOIN agg a USING (doc_id) ORDER BY b.doc_id""".stripMargin
      },

      "q_substring_dedup" -> {
        val w = SubstrWindow
        s"""WITH ${substrCtesSql(w)},
           |d AS (SELECT doc_id, count(*) AS dup_windows FROM dw GROUP BY doc_id)
           |SELECT b.doc_id, CAST(b.n - ${w - 1} AS BIGINT) AS total_windows,
           |  COALESCE(d.dup_windows, 0) AS dup_windows,
           |  ${roundToSql(s"COALESCE(d.dup_windows, 0) / (b.n - ${w - 1})", 4)} AS dup_frac,
           |  ${roundToSql(s"COALESCE(d.dup_windows, 0) / (b.n - ${w - 1})", 4)} <= 0.2 AS keep
           |FROM b LEFT JOIN d USING (doc_id) ORDER BY doc_id""".stripMargin
      },

      // the shared chain's maximal spans, presented
      "q_substring_spans" -> {
        val w = SubstrWindow
        s"""WITH ${substrCtesSql(w)}
           |SELECT doc_id, CAST(s0 AS BIGINT) AS span_start,
           |  CAST(s1 AS BIGINT) AS span_end,
           |  CAST(s1 - s0 + 1 AS BIGINT) AS span_len
           |FROM sp ORDER BY doc_id, span_start""".stripMargin
      },

      // spans applied as the cut: token i survives iff no duplicated
      // span covers it; survivors rejoin in order
      "q_substring_clean" -> {
        val w = SubstrWindow
        s"""WITH ${substrCtesSql(w)},
           |a AS (SELECT doc_id, toks, len(toks) AS n FROM t),
           |tok AS (SELECT doc_id, n, i, toks[i] AS tok
           |        FROM a, unnest(range(1, n + 1)) AS u(i)),
           |kept AS (
           |  SELECT k.doc_id, k.i, k.tok FROM tok k
           |  WHERE NOT EXISTS (SELECT 1 FROM sp
           |    WHERE sp.doc_id = k.doc_id AND k.i BETWEEN sp.s0 AND sp.s1)),
           |kc AS (SELECT doc_id, count(*) AS kept_n,
           |         string_agg(tok, ' ' ORDER BY i) AS txt
           |       FROM kept GROUP BY doc_id)
           |SELECT a.doc_id, CAST(a.n AS BIGINT) AS n_tokens,
           |  CAST(COALESCE(kc.kept_n, 0) AS BIGINT) AS kept_tokens,
           |  COALESCE(kc.txt, '') AS clean_text
           |FROM a LEFT JOIN kc USING (doc_id) ORDER BY doc_id""".stripMargin
      },

      // the planted near-dup structure, restated arithmetically: the
      // pipeline must find EXACTLY the re-encoding pairs (same
      // doc_id/3 group), nothing across groups
      "q_image_neardup" ->
        """SELECT a.doc_id AS id_a, b.doc_id AS id_b
          |FROM documents a JOIN documents b
          |  ON a.doc_id // 3 = b.doc_id // 3 AND a.doc_id < b.doc_id
          |ORDER BY 1, 2""".stripMargin,

      // planted video pair structure: exactly the re-muxing pairs
      // (same doc_id/2 group), nothing across groups
      "q_video_neardup" ->
        """SELECT a.doc_id AS id_a, b.doc_id AS id_b
          |FROM documents a JOIN documents b
          |  ON a.doc_id // 2 = b.doc_id // 2 AND a.doc_id < b.doc_id
          |ORDER BY 1, 2""".stripMargin,

      // planted image component structure: each doc_id/3 triple is
      // one near-dup component labeled by its minimum id
      "q_media_clusters" ->
        """SELECT doc_id AS media_id, (doc_id // 3) * 3 AS cluster
          |FROM documents ORDER BY 1""".stripMargin,

      // planted audio group structure: all pairs within a doc_id/3
      // triple (cross-container Hamming 0; remastered member ≤ 2),
      // nothing across groups
      "q_audio_neardup" ->
        """SELECT a.doc_id AS id_a, b.doc_id AS id_b
          |FROM documents a JOIN documents b
          |  ON a.doc_id // 3 = b.doc_id // 3 AND a.doc_id < b.doc_id
          |ORDER BY 1, 2""".stripMargin,

      "q_audio_meta" ->
        """SELECT doc_id AS media_id,
          |  (['wav', 'aiff', 'au'])[(doc_id % 3) + 1] AS format,
          |  CAST((doc_id % 2) + 1 AS INTEGER) AS channels,
          |  CAST(([8000, 11025, 16000, 22050, 44100])[(doc_id % 5) + 1]
          |    AS INTEGER) AS sample_rate,
          |  CAST(16 AS INTEGER) AS bits_per_sample,
          |  CAST((doc_id % 97) + 50 AS BIGINT) AS n_frames,
          |  (((doc_id % 97) + 50) * 1000)
          |    // ([8000, 11025, 16000, 22050, 44100])[(doc_id % 5) + 1]
          |    AS duration_ms
          |FROM documents ORDER BY media_id""".stripMargin,

      "q_video_meta" ->
        """SELECT doc_id AS media_id,
          |  (['mp4', 'avi'])[(doc_id % 2) + 1] AS format,
          |  CAST((doc_id % 113) + 16 AS INTEGER) AS width,
          |  CAST((doc_id % 67) + 16 AS INTEGER) AS height,
          |  CAST((doc_id % 89) + 24 AS BIGINT) AS n_frames,
          |  CAST(CASE WHEN doc_id % 2 = 0
          |    THEN (((doc_id % 89) + 24) * 1000)
          |      // ([10, 12, 20, 24, 25])[(doc_id % 5) + 1]
          |    ELSE (((doc_id % 89) + 24)
          |      * (1000000 // ([10, 12, 20, 24, 25])[(doc_id % 5) + 1])) // 1000
          |  END AS BIGINT) AS duration_ms
          |FROM documents ORDER BY media_id""".stripMargin,

      "q_frame_sample" ->
        """WITH v AS (
          |  SELECT doc_id AS media_id,
          |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
          |    CAST(octet_length(encode(text)) // 1000 + 1 AS BIGINT) AS n_frames
          |  FROM documents WHERE doc_id % 3 = 2),
          |f AS (
          |  SELECT media_id, byte_len, n_frames,
          |    unnest(range(0, n_frames, (n_frames + 3) // 4)) AS frame_idx
          |  FROM v)
          |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
          |  CAST(frame_idx * (byte_len // n_frames) AS BIGINT) AS byte_offset
          |FROM f ORDER BY media_id, frame_idx""".stripMargin,

      "q_video_frames" ->
        """WITH v AS (
          |  SELECT doc_id AS media_id,
          |    (doc_id % 89) + 24 AS n_frames
          |  FROM documents),
          |f AS (
          |  SELECT media_id,
          |    unnest(range(0, n_frames, (n_frames + 3) // 4)) AS frame_idx
          |  FROM v)
          |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx
          |FROM f ORDER BY media_id, frame_idx""".stripMargin,

      // per-source k-min sets replayed over the distinct (source, h)
      // pairs; same union-kmin estimator arithmetic
      "q_kmv_overlap" ->
        s"""WITH sh AS (
           |  SELECT source,
           |    unnest(${shingleHashesSql(shinglesSql(s"(${tokensSql("text")})"))}) AS h
           |  FROM documents),
           |du AS (SELECT DISTINCT source, h FROM sh),
           |r AS (
           |  SELECT source, h,
           |    row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rn
           |  FROM du),
           |sk AS (
           |  SELECT source, list(h ORDER BY h ASC) AS mins
           |  FROM r WHERE rn <= 256 GROUP BY 1),
           |p AS (
           |  SELECT a.source AS sa, b.source AS sb, a.mins AS ma, b.mins AS mb
           |  FROM sk a JOIN sk b ON a.source < b.source),
           |uu AS (
           |  SELECT sa, sb, ma, mb,
           |    list_sort(list_distinct(ma || mb))[1:256] AS u
           |  FROM p),
           |e1 AS (
           |  SELECT sa, sb,
           |    len(list_filter(u, x -> list_contains(ma, x)
           |      AND list_contains(mb, x))) AS ni,
           |    len(u) AS nu
           |  FROM uu)
           |SELECT sa AS source_a, sb AS source_b,
           |  ${roundToSql("CAST(ni AS DOUBLE) / CAST(nu AS DOUBLE)", 6)}
           |    AS jaccard_est
           |FROM e1
           |ORDER BY source_a, source_b""".stripMargin,

      "q_ngram_jaccard" ->
        s"""WITH d AS (SELECT doc_id, lang,
           |    ${shingleHashesSql(shinglesSql(s"($toksSql)"))} AS hsh FROM documents),
           |ex AS (SELECT doc_id, lang, unnest(hsh) AS h FROM d),
           |jx AS (SELECT * FROM ex WHERE h NOT IN (
           |    SELECT h FROM ex GROUP BY h HAVING count(*) > $NgramDfCap)),
           |sz AS (SELECT doc_id, len(hsh) AS sz FROM d),
           |c AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
           |  FROM jx a JOIN jx b
           |    ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT c.id_a, c.id_b,
           |  ${roundToSql("CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common)", 4)} AS jaccard
           |FROM c JOIN sz sa ON c.id_a = sa.doc_id
           |       JOIN sz sb ON c.id_b = sb.doc_id
           |WHERE CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) >= 0.5
           |ORDER BY 1, 2""".stripMargin,

      "q_rep_quality" ->
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |u AS (
           |  SELECT doc_id, toks,
           |    CAST(len(toks) AS INTEGER) AS n_tokens,
           |    CAST(len(toks) AS DOUBLE) AS n_tok_d,
           |    CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
           |    CAST(COALESCE(list_max(list_transform(list_distinct(toks),
           |      t -> len(list_filter(toks, x -> x = t)))), 0) AS DOUBLE) AS top_freq,
           |    list_transform(range(1, len(toks)),
           |      i -> toks[i] || ' ' || toks[i+1]) AS bigrams
           |  FROM t),
           |v AS (
           |  SELECT doc_id, n_tokens,
           |    ${roundToSql("n_dist / GREATEST(n_tok_d, 1.0)", 4)} AS distinct_ratio,
           |    ${roundToSql("top_freq / GREATEST(n_tok_d, 1.0)", 4)} AS top_token_frac,
           |    ${roundToSql(
              "(CAST(len(bigrams) AS DOUBLE) - CAST(len(list_distinct(bigrams)) AS DOUBLE))" +
              " / GREATEST(CAST(len(bigrams) AS DOUBLE), 1.0)", 4)} AS dup_bigram_frac
           |  FROM u)
           |SELECT doc_id, n_tokens, distinct_ratio, top_token_frac, dup_bigram_frac,
           |  (distinct_ratio >= 0.5 AND top_token_frac <= 0.2
           |    AND dup_bigram_frac <= 0.1) AS keep
           |FROM v ORDER BY doc_id""".stripMargin,

      "q_decontaminate" ->
        s"""WITH d AS (SELECT doc_id,
           |    ${shingleHashesSql(shinglesSql(s"($toksSql)"))} AS hsh FROM documents),
           |ex AS (SELECT doc_id, unnest(hsh) AS h FROM d),
           |nd AS (SELECT count(*) AS n_docs FROM documents),
           |hot AS (SELECT h FROM
           |    (SELECT h, count(*) AS df FROM ex GROUP BY 1) t CROSS JOIN nd
           |  WHERE t.df > LEAST(GREATEST(n_docs // $DeconDfDenom, $DeconDfFloor), $DeconDfAbs)),
           |kx AS (SELECT * FROM ex WHERE h NOT IN (SELECT h FROM hot))
           |SELECT c.doc_id, e.doc_id AS eval_id, count(*) AS shared_shingles
           |FROM kx c JOIN kx e ON c.h = e.h
           |WHERE e.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
           |GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY 1, 2""".stripMargin,

      "q_minhash_dedup" ->
        s"""WITH ${minhashPairsSqlCtes()}
           |SELECT id_a, id_b,
           |  ${roundToSql("inter / (sz_a + sz_b - inter)", 4)} AS jaccard
           |FROM np ORDER BY 1, 2""".stripMargin,

      "q_minhash_capped" ->
        s"""WITH ${minhashPairsSqlCtes(Some(CapBucket))}
           |SELECT id_a, id_b,
           |  ${roundToSql("inter / (sz_a + sz_b - inter)", 4)} AS jaccard
           |FROM np ORDER BY 1, 2""".stripMargin,

      // the same banded index probed as a similarity search: LSH
      // bucket collisions propose, exact Jaccard verifies, top-5 by
      // (jaccard desc, doc_id asc) — the topk_by_score tie discipline
      "q_doc_similar" ->
        s"""WITH $minhashBaseSqlCtes,
           |qb AS (SELECT doc_id AS q_id, band_id, band_key FROM banded),
           |cand AS (
           |  SELECT DISTINCT q.q_id, b.doc_id
           |  FROM qb q JOIN banded b USING (band_id, band_key)
           |  WHERE b.doc_id <> q.q_id),
           |sc AS (
           |  SELECT c.q_id, c.doc_id,
           |    ${roundToSql(
               "CAST(len(list_intersect(dq.hsh, dd.hsh)) AS DOUBLE)" +
                 " / (len(dq.hsh) + len(dd.hsh)" +
                 " - CAST(len(list_intersect(dq.hsh, dd.hsh)) AS DOUBLE))", 6)} AS jaccard
           |  FROM cand c JOIN d dq ON c.q_id = dq.doc_id
           |              JOIN d dd ON c.doc_id = dd.doc_id),
           |r AS (
           |  SELECT q_id, doc_id, jaccard,
           |    row_number() OVER (PARTITION BY q_id
           |      ORDER BY jaccard DESC, doc_id ASC) AS rank
           |  FROM sc WHERE jaccard > 0)
           |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, jaccard
           |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

      "q_dedup_clusters" ->
        s"""WITH RECURSIVE ${minhashPairsSqlCtes()},
           |edges AS (SELECT id_a AS src, id_b AS dst FROM np
           |          UNION ALL SELECT id_b, id_a FROM np),
           |reach(n, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT reach.n, e.dst FROM reach JOIN edges e ON e.src = reach.r),
           |lbl AS (SELECT n AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY 1),
           |sz AS (SELECT cluster_rep, count(*) AS cluster_size FROM lbl GROUP BY 1)
           |SELECT l.doc_id, l.cluster_rep, sz.cluster_size,
           |  l.doc_id = l.cluster_rep AS is_keeper
           |FROM lbl l JOIN sz USING (cluster_rep)
           |ORDER BY l.doc_id""".stripMargin,

      "q_dedup_keeper" -> {
        val curated = CuratedSources.map(s => s"'$s'").mkString(", ")
        val licensed = LicensedSources.map(s => s"'$s'").mkString(", ")
        s"""WITH RECURSIVE ${minhashPairsSqlCtes()},
           |edges AS (SELECT id_a AS src, id_b AS dst FROM np
           |          UNION ALL SELECT id_b, id_a FROM np),
           |reach(n, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT reach.n, e.dst FROM reach JOIN edges e ON e.src = reach.r),
           |lbl AS (SELECT n AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY 1),
           |${qualityCtesSql(withDigest = false)},
           |pri AS (SELECT doc_id, source,
           |    CASE WHEN source IN ($curated) THEN 0
           |         WHEN source IN ($licensed) THEN 1
           |         ELSE 2 END AS priority
           |  FROM documents),
           |scored AS (
           |  SELECT l.doc_id, l.cluster_rep, p.source, p.priority,
           |    u.quality_score
           |  FROM lbl l JOIN pri p USING (doc_id) JOIN u USING (doc_id)),
           |k AS (
           |  SELECT *, first_value(doc_id) OVER (PARTITION BY cluster_rep
           |      ORDER BY priority ASC, quality_score DESC, doc_id ASC)
           |    AS keeper_id
           |  FROM scored)
           |SELECT doc_id, cluster_rep, source, priority, quality_score,
           |  keeper_id, doc_id = keeper_id AS is_keeper
           |FROM k ORDER BY doc_id""".stripMargin
      },

      "q_source_overlap" ->
        s"""WITH ${minhashPairsSqlCtes()},
           |pj AS (SELECT id_a, id_b,
           |    ${roundToSql("inter / (sz_a + sz_b - inter)", 4)} AS j FROM np),
           |x AS (SELECT LEAST(a.source, b.source) AS source_a,
           |    GREATEST(a.source, b.source) AS source_b, pj.j
           |  FROM pj JOIN documents a ON a.doc_id = pj.id_a
           |          JOIN documents b ON b.doc_id = pj.id_b)
           |SELECT source_a, source_b, count(*) AS n_pairs,
           |  ${roundToSql(
             "CAST(SUM(CAST(j AS DECIMAL(18,4))) AS DOUBLE) / count(*)", 4)}
           |    AS avg_jaccard
           |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_dedup_stats" ->
        s"""WITH RECURSIVE ${minhashPairsSqlCtes()},
           |edges AS (SELECT id_a AS src, id_b AS dst FROM np
           |          UNION ALL SELECT id_b, id_a FROM np),
           |reach(n, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT reach.n, e.dst FROM reach JOIN edges e ON e.src = reach.r),
           |lbl AS (SELECT n AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY 1),
           |cs0 AS (SELECT cluster_rep, count(*) AS sz FROM lbl GROUP BY 1),
           |cs AS (SELECT count(*) AS n_clusters,
           |    CAST(COALESCE(SUM(CASE WHEN sz > 1 THEN sz END), 0) AS BIGINT)
           |      AS docs_in_neardup_clusters,
           |    CAST(max(sz) AS BIGINT) AS max_cluster_size FROM cs0),
           |eg0 AS (SELECT md5(${normTextSql("text")}) AS h, count(*) AS c
           |  FROM documents GROUP BY 1),
           |eg AS (SELECT count(*) AS n_exact_groups,
           |    CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
           |      AS docs_in_exact_dups FROM eg0),
           |nd AS (SELECT count(*) AS n_docs FROM documents)
           |SELECT nd.n_docs, eg.n_exact_groups, eg.docs_in_exact_dups,
           |  cs.n_clusters, cs.docs_in_neardup_clusters, cs.max_cluster_size,
           |  ${roundToSql("CAST(docs_in_neardup_clusters AS DOUBLE) / " +
             "GREATEST(CAST(n_docs AS DOUBLE), 1.0)", 6)} AS neardup_share
           |FROM nd CROSS JOIN eg CROSS JOIN cs""".stripMargin,

      "q_leakage_split" ->
        s"""WITH RECURSIVE ${minhashPairsSqlCtes()},
           |edges AS (SELECT id_a AS src, id_b AS dst FROM np
           |          UNION ALL SELECT id_b, id_a FROM np),
           |reach(n, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT reach.n, e.dst FROM reach JOIN edges e ON e.src = reach.r),
           |lbl AS (SELECT n AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY 1)
           |SELECT doc_id, cluster_rep,
           |  CASE WHEN ${hash60Sql("'split:' || CAST(cluster_rep AS VARCHAR)")} % 100 < 90
           |         THEN 'train'
           |       WHEN ${hash60Sql("'split:' || CAST(cluster_rep AS VARCHAR)")} % 100 < 95
           |         THEN 'val'
           |       ELSE 'test' END AS split
           |FROM lbl ORDER BY doc_id""".stripMargin,

      "q_vocab_topk" ->
        s"""WITH t AS (SELECT unnest($toksSql) AS token FROM documents)
           |SELECT token, count(*) AS n FROM t WHERE token != ''
           |GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 50""".stripMargin,

      // the same conditional-count aggregation + smoothed KL
      // contributions, restated; ln is natural log in both engines
      "q_corpus_drift" ->
        s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
           |f AS (SELECT doc_id, token FROM t WHERE token != ''),
           |c AS (SELECT token,
           |        CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
           |        CAST(SUM(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
           |      FROM f GROUP BY 1),
           |n AS (SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
           |        CAST(SUM(c_cur) AS BIGINT) AS n_cur,
           |        count(*) AS v FROM c),
           |p AS (SELECT token,
           |        (CAST(c_ref AS DOUBLE) + 1.0) /
           |          (CAST(n_ref AS DOUBLE) + CAST(v AS DOUBLE)) AS p_ref,
           |        (CAST(c_cur AS DOUBLE) + 1.0) /
           |          (CAST(n_cur AS DOUBLE) + CAST(v AS DOUBLE)) AS p_cur
           |      FROM c CROSS JOIN n)
           |SELECT token, ${roundToSql("p_ref", 8)} AS p_ref,
           |  ${roundToSql("p_cur", 8)} AS p_cur,
           |  ${roundToSql("p_ref * ln(p_ref / p_cur)", 8)} AS kl_contrib
           |FROM p
           |ORDER BY kl_contrib DESC, token ASC LIMIT 20""".stripMargin,

      "q_corpus_select" ->
        s"""WITH ${qualityCtesSql(withDigest = true)},
           |k AS (SELECT h, min(doc_id) AS keep_id FROM t GROUP BY 1)
           |SELECT u.doc_id, u.lang, u.n_tokens, u.quality_score
           |FROM u JOIN k ON u.h = k.h AND u.doc_id = k.keep_id
           |WHERE u.quality_score >= 0.3 AND u.marker_hits > 0
           |ORDER BY u.doc_id""".stripMargin,

      "q_corpus_select_dedup" ->
        s"""WITH RECURSIVE ${minhashPairsSqlCtes()},
           |edges AS (SELECT id_a AS src, id_b AS dst FROM np
           |          UNION ALL SELECT id_b, id_a FROM np),
           |reach(n, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT reach.n, e.dst FROM reach JOIN edges e ON e.src = reach.r),
           |lbl AS (SELECT n AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY 1),
           |${qualityCtesSql(withDigest = false)}
           |SELECT u.doc_id, u.lang, u.n_tokens, u.quality_score
           |FROM u JOIN lbl ON u.doc_id = lbl.doc_id AND lbl.cluster_rep = u.doc_id
           |WHERE u.quality_score >= 0.3 AND u.marker_hits > 0
           |ORDER BY u.doc_id""".stripMargin,

      "q_corpus_pipeline" ->
        s"""WITH RECURSIVE $corpusKeepCtes
           |SELECT doc_id, lang, n_tokens, quality_score
           |FROM keep ORDER BY doc_id""".stripMargin,

      "q_training_shards" ->
        s"""WITH RECURSIVE $corpusKeepCtes,
           |ct AS (SELECT d.doc_id, d.lang, $toksSql AS toks
           |  FROM documents d
           |  WHERE d.doc_id IN (SELECT doc_id FROM keep)),
           |ce AS (SELECT doc_id, lang, toks, len(toks) AS n FROM ct),
           |cw AS (SELECT doc_id, lang, toks, n,
           |    unnest(range(0, GREATEST(n, 1), $ChunkStride)) AS start FROM ce)
           |SELECT doc_id, lang,
           |  CAST(start // $ChunkStride AS INTEGER) AS chunk_idx,
           |  array_to_string(toks[start + 1:start + $ChunkSize], ' ') AS chunk_text
           |FROM cw ORDER BY doc_id, chunk_idx""".stripMargin,

      "q_simhash" ->
        s"""WITH h AS (SELECT doc_id,
           |    list_transform($toksSql, s -> ${hash60Sql("s")}) AS hs
           |  FROM documents)
           |SELECT doc_id, ${simhash60Sql("hs")} AS simhash
           |FROM h ORDER BY doc_id""".stripMargin,

      "q_simhash_pairs" ->
        s"""WITH h AS (SELECT doc_id,
           |    list_transform($toksSql, s -> ${hash60Sql("s")}) AS hs
           |  FROM documents),
           |fp AS (SELECT doc_id, ${simhash60Sql("hs")} AS simhash FROM h),
           |banded AS (
           |  SELECT doc_id, simhash, b.band_id,
           |    (simhash >> (b.band_id * 15)) & 32767 AS band_bits
           |  FROM fp, (SELECT unnest(range(0, 4)) AS band_id) b),
           |p AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
           |  FROM banded a JOIN banded b
           |    ON a.band_id = b.band_id AND a.band_bits = b.band_bits
           |   AND a.doc_id < b.doc_id)
           |SELECT id_a, id_b, hamming FROM p
           |WHERE hamming <= 8 ORDER BY 1, 2""".stripMargin
    )
  }
}
