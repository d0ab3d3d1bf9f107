package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{aggregate, bin, ceil, element_at, least, lit, pmod, struct, when}
import org.apache.spark.sql.graft.shims

/** Column-API surface for the engine's native Catalyst expressions,
  * plus SQL registration so `spark.sql` users get them too. */
package object functions {

  /** 64-bit SimHash fingerprint of a token array. */
  def simhash64(tokens: Column): Column =
    shims.column(SimHash64(shims.expression(tokens)))

  /** 60-bit SimHash over the md5-prefix token hash (oracle-checkable). */
  def simhash60_md5(tokens: Column): Column =
    shims.column(SimHash60Md5(shims.expression(tokens)))

  /** Codegen'd cosine similarity of two float vectors. */
  def cosine_sim(a: Column, b: Column): Column =
    shims.column(CosineSim(shims.expression(a), shims.expression(b)))

  /** Codegen'd dot product of two float vectors. */
  def dot_product(a: Column, b: Column): Column =
    shims.column(DotProduct(shims.expression(a), shims.expression(b)))

  /** Single-pass tag-depth scanner: drop balanced chrome-container
    * regions (nav/header/footer/aside) from markup ([[DropChrome]]).
    * The HTML-extraction entry stage's nesting-correct replacement
    * for a non-greedy regex drop. */
  def drop_chrome(html: Column): Column =
    shims.column(DropChrome(shims.expression(html)))

  /** Generator: explode the distinct 60-bit word-n-gram shingle hashes
    * of a token array in one pass (use with `Dataset.select`, like
    * `explode`). */
  def ngram_hash_explode(tokens: Column, n: Int = 3): Column =
    shims.column(NGramHashExplode(shims.expression(tokens), n))

  /** Array form of the same pass: distinct 60-bit shingle hashes as
    * `array<long>` — for projections that keep the hash set in-row. */
  def ngram_hashes(tokens: Column, n: Int = 3): Column =
    shims.column(NGramHashes(shims.expression(tokens), n))

  /** One-pass token statistics (integer counts) for the corpus
    * feature scan: struct(n_tokens, n_distinct, top_freq, n_bigrams,
    * n_distinct_bigrams, stop_hits, marker_hits). */
  def token_stats(tokens: Column, stopwords: Seq[String],
      markers: Seq[String]): Column =
    shims.column(TokenStats(shims.expression(tokens), stopwords, markers))

  /** One-pass BPE encode of a token array to piece ids under a
    * learned merge table + sorted piece lexicon (per-task
    * distinct-token memo — the q_bpe_tokens hot loop). */
  def bpe_encode_ids(tokens: Column, merges: Seq[(String, String)],
      lexicon: Seq[String]): Column =
    shims.column(BpeEncodeIds(shims.expression(tokens), merges, lexicon))

  /** One-pass k-permutation MinHash signature over pre-reduced
    * shingle hashes. */
  def minhash_sigs(hashes: Column, coefA: Array[Long], coefB: Array[Long],
      p: Long): Column =
    shims.column(MinhashSigs(shims.expression(hashes), coefA, coefB, p))

  /** Codegen'd IVF cell assignment: index of the squared-L2-nearest
    * centroid (ties → lowest index). */
  def nearest_centroid(emb: Column, centroids: Array[Array[Double]]): Column =
    shims.column(NearestCentroid(shims.expression(emb), centroids))

  /** Distributed IVF probe routing: the nProbe nearest cells per row
    * (squared-L2 asc, ties → lowest cell) as `array<int>`. */
  def nearest_cells(emb: Column, centroids: Array[Array[Double]],
      nProbe: Int): Column =
    shims.column(NearestCells(shims.expression(emb), centroids, nProbe))

  /** All m PQ codes in one pass (codebooks ride as a reference
    * object — compile cost independent of m). */
  def pq_encode(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    shims.column(PqEncode(shims.expression(emb), codebooks))

  /** ADC distance of a PQ code array behind a per-query lookup table
    * (reference object — no per-query codegen recompile). */
  def pq_adc_dist(code: Column, lut: Array[Array[Double]]): Column =
    shims.column(PqAdcDist(shims.expression(code), lut))

  /** Distributed per-query ADC lookup table (array<array<double>>,
    * m×k) from a query (residual) in double precision — bit-equal to
    * the driver-side Pq.lutL2; lets batch serving carry LUTs as data. */
  def pq_lut_l2(q: Column, codebooks: Array[Array[Array[Double]]]): Column =
    shims.column(PqLutL2(shims.expression(q), codebooks))

  /** Generator feeding one fused-PQ-fit Lloyd iteration: rows of
    * (s, cell, pos, v) per vector — assignment evaluated once per
    * input row by construction (use with `Dataset.select`, like
    * `explode`). */
  def pq_fit_explode(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    shims.column(PqFitExplode(shims.expression(emb), codebooks))

  /** Codegen'd sign-LSH bucket id over a fixed hyperplane table. */
  def sign_lsh_bucket(emb: Column, planes: Array[Array[Double]]): Column =
    shims.column(SignLshBucket(shims.expression(emb), planes))

  /** Codegen'd bloom-membership probe of a long key — the filter
    * rides as a reference object (never a plan-tree literal). */
  def bloom_might_contain(key: Column,
      bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    shims.column(BloomMightContain(shims.expression(key), bloom))

  /** Bounded-state top-K aggregate: `array<struct<score,key>>` ranked
    * best-first (score desc, key asc). Streaming-safe (O(k) state,
    * partial-merge capable). */
  def topk_by_score(score: Column, key: Column, k: Int): Column = {
    ConfGuard.checkBoundedAgg("topk_by_score")
    shims.column(TopKByScore(shims.expression(score), shims.expression(key), k)
      .toAggregateExpression())
  }

  /** KMV distinct-count sketch aggregate: the ≤ k smallest DISTINCT
    * values of a long hash column, ascending ([[KmvMinHashes]]). */
  def kmv_min_hashes(hash: Column, k: Int): Column = {
    ConfGuard.checkBoundedAgg("kmv_min_hashes")
    shims.column(KmvMinHashes(shims.expression(hash), k).toAggregateExpression())
  }

  /** Count-min sketch aggregate: d×w counter matrix (row-major
    * `array<bigint>`) over a long base-hash column ([[CmsSketch]]). */
  def cms_sketch(hash: Column, d: Int, w: Int): Column = {
    ConfGuard.checkBoundedAgg("cms_sketch")
    shims.column(CmsSketch(shims.expression(hash), d, w).toAggregateExpression())
  }

  /** HDR-histogram quantile-sketch aggregate: bucket-floor → count as
    * `array<struct<lo,cnt>>` ascending ([[HdrSketch]]). Feed it
    * [[hdr_bucket_lo]] output. */
  def hdr_sketch(bucketLo: Column): Column = {
    ConfGuard.checkBoundedAgg("hdr_sketch")
    shims.column(HdrSketch(shims.expression(bucketLo)).toAggregateExpression())
  }

  /** Log-bucket floor for [[hdr_sketch]] over a POSITIVE integer
    * value: values < 2⁶ keep exact buckets (width 1); larger values
    * bucket at 6 mantissa bits — floor = ⌊v / 2^(e−6)⌋·2^(e−6) with
    * e = ⌊log₂ v⌋, so bucket width ≤ v/64 (guaranteed relative value
    * error 1/64 at every quantile). ALL arithmetic is exact in both
    * engines over the ENTIRE positive long domain: e via the
    * binary-string length (`bin`, no float log), the floor via
    * integer shifts — `(v >> (e−6)) << (e−6)` — never touching
    * doubles (ADVICE r12: the earlier `pow`/`floor` spelling rounded
    * v to nearest double, so a long just below a bucket boundary at
    * ≥ 2⁵³ could be assigned a floor ABOVE v, violating lo ≤ v). The
    * DuckDB twin is [[hdrBucketLoSql]]. */
  def hdr_bucket_lo(v: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
    val vl = v.cast("long")
    val s = (org.apache.spark.sql.functions.length(bin(vl)) - 7).cast("int")
    val shifted = shims.column(ShiftLeft(
      shims.expression(shims.column(
        ShiftRight(shims.expression(vl), shims.expression(s)))),
      shims.expression(s)))
    when(vl < 64, vl).otherwise(shifted)
  }

  /** DuckDB spelling of [[hdr_bucket_lo]] — same integer shifts, same
    * full-domain exactness. */
  def hdrBucketLoSql(v: String): String =
    s"CAST(CASE WHEN $v < 64 THEN $v " +
      s"ELSE ($v >> (length(bin($v)) - 7)) << (length(bin($v)) - 7) " +
      s"END AS BIGINT)"

  /** Quantile estimate from a [[hdr_sketch]] array: the floor of the
    * bucket holding rank ⌈q·n⌉ (ascending floors; the true rank-q
    * value v satisfies lo ≤ v < lo·(1+1/64)+1). Composed HOF
    * expressions — the estimator is visible to the oracle, like
    * [[cms_point]]. */
  def hdr_quantile(sketch: Column, q: Double): Column = {
    val n = aggregate(sketch, lit(0L), (acc, x) => acc + x.getField("cnt"))
    val target = ceil(lit(q) * n).cast("long")
    aggregate(sketch,
      struct(lit(0L).as("cum"), lit(null).cast("long").as("lo")),
      (acc, x) => when(acc.getField("lo").isNotNull, acc)
        .when(acc.getField("cum") + x.getField("cnt") >= target,
          struct((acc.getField("cum") + x.getField("cnt")).as("cum"),
            x.getField("lo").as("lo")))
        .otherwise(struct((acc.getField("cum") + x.getField("cnt")).as("cum"),
          lit(null).cast("long").as("lo"))))
      .getField("lo")
  }

  /** Point estimate against a [[cms_sketch]] counter array: the d-way
    * min of the item's row counters — composed integer/array
    * expressions (stays codegen'd), the same bucket arithmetic as
    * [[CmsUtil.bucket]] and the DuckDB replay. */
  def cms_point(counters: Column, hash: Column, d: Int, w: Int): Column = {
    val hp = pmod(hash, lit(CmsUtil.P))
    (0 until d).map { i =>
      val b = pmod(pmod(lit(CmsUtil.coefA(i)) * hp + lit(CmsUtil.coefB(i)),
        lit(CmsUtil.P)), lit(w.toLong))
      element_at(counters, (b + lit(i.toLong * w) + lit(1L)).cast("int"))
    }.reduce(least(_, _))
  }

  /** Content equality/hash for the reference-object array fields of
    * the native expressions. The case-class defaults compare Arrays
    * by REFERENCE, so two separately-constructed but identical
    * expressions (same centroid table, same planes) never compare
    * equal — defeating Catalyst's common-subexpression elimination
    * and exchange reuse for exactly the K×dims scans worth reusing
    * (review r10, functions pass). Wrapping in a 1-element array lets
    * `deepEquals`/`deepHashCode` handle any nesting, including
    * primitive leaf arrays. */
  private[functions] object RefArrays {
    def same(a: AnyRef, b: AnyRef): Boolean =
      java.util.Arrays.deepEquals(Array(a), Array(b))
    def hash(a: AnyRef): Int =
      java.util.Arrays.deepHashCode(Array(a))
  }

  /** Evaluate a foldable `array<array<double>>` argument (the SQL
    * spelling of a centroid/hyperplane table) into the reference-
    * object matrix the native expressions take. */
  private def toMatrix(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Array[Array[Double]] = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    require(e.foldable,
      s"${e.sql}: the centroid/plane table must be a literal (foldable)")
    // widen int/float element literals to double before evaluating
    val widened = org.apache.spark.sql.catalyst.expressions.Cast(
      e, ArrayType(ArrayType(DoubleType)))
    val ad = widened.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(ad != null, s"${e.sql}: the centroid/plane table is NULL")
    Array.tabulate(ad.numElements()) { i =>
      val inner = ad.getArray(i)
      // name the malformed row instead of a bare NPE / silent-0.0 read
      // (review r10, functions pass)
      require(inner != null, s"${e.sql}: row $i of the table is NULL")
      Array.tabulate(inner.numElements()) { j =>
        require(!inner.isNullAt(j),
          s"${e.sql}: element ($i, $j) of the table is NULL")
        inner.getDouble(j)
      }
    }
  }

  /** Evaluate a FOLDABLE scalar argument (k, n, …) at registration —
    * a non-literal would `eval()` against no input row and die with a
    * raw NPE/ClassCastException; say what is wrong instead. */
  private def foldableInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = {
    require(e.foldable, s"${e.sql}: $what must be a literal (foldable)")
    val v = e.eval()
    require(v != null, s"${e.sql}: $what is NULL")
    v.asInstanceOf[Number].intValue()
  }

  /** Register the native functions for SQL use. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("simhash60_md5",
      exprs => SimHash60Md5(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("drop_chrome",
      exprs => DropChrome(exprs.head), "built-in")
    // the SQL spellings get the same fallback-threshold guard as the
    // Column builders (the closure runs at resolution, on the driver)
    reg.createOrReplaceTempFunction("topk_by_score",
      exprs => { ConfGuard.checkBoundedAgg("topk_by_score")
        TopKByScore(exprs.head, exprs(1),
          foldableInt(exprs(2), "k")) }, "built-in")
    reg.createOrReplaceTempFunction("kmv_min_hashes",
      exprs => { ConfGuard.checkBoundedAgg("kmv_min_hashes")
        KmvMinHashes(exprs.head, foldableInt(exprs(1), "k")) }, "built-in")
    reg.createOrReplaceTempFunction("cms_sketch",
      exprs => { ConfGuard.checkBoundedAgg("cms_sketch")
        CmsSketch(exprs.head, foldableInt(exprs(1), "d"),
          foldableInt(exprs(2), "w")) }, "built-in")
    reg.createOrReplaceTempFunction("hdr_sketch",
      exprs => { ConfGuard.checkBoundedAgg("hdr_sketch")
        HdrSketch(exprs.head) }, "built-in")
    reg.createOrReplaceTempFunction("ngram_hash_explode",
      exprs => NGramHashExplode(exprs.head,
        exprs.lift(1).map(foldableInt(_, "n")).getOrElse(3)), "built-in")
    reg.createOrReplaceTempFunction("ngram_hashes",
      exprs => NGramHashes(exprs.head,
        exprs.lift(1).map(foldableInt(_, "n")).getOrElse(3)), "built-in")
    reg.createOrReplaceTempFunction("nearest_centroid",
      exprs => NearestCentroid(exprs.head, toMatrix(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("sign_lsh_bucket",
      exprs => SignLshBucket(exprs.head, toMatrix(exprs(1))), "built-in")
    // COLUMN-CHAIN lanes (VERDICT r16 #7): pure built-in compositions
    // wrapped at resolution time, so SQL-only users reach the r14–r16
    // surfaces — URL canonicalize / registered domain (the dedup +
    // domain-cap keys) and the DSIR feature-bucket hash (explode +
    // join a frozen (b, lr) table to score).
    reg.createOrReplaceTempFunction("url_canonicalize",
      exprs => shims.resolvableExpression(
        graft.ops.Urls.urlCanonicalize(shims.column(exprs.head))), "built-in")
    reg.createOrReplaceTempFunction("registered_domain",
      exprs => shims.resolvableExpression(
        graft.ops.Urls.registeredDomain(shims.column(exprs.head))), "built-in")
    reg.createOrReplaceTempFunction("dsir_buckets",
      exprs => shims.resolvableExpression(
        graft.ops.Dsir.featureBucketsOf(shims.column(exprs.head))), "built-in")
  }
}
