package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.io.Tables
import Util.{roundTo, roundToSql}

/** Model-based quality scoring with a TRAINED model — the fastText-style
  * distillation loop every production corpus pipeline runs: label cheaply
  * with the heuristic gate (the [[TextOps.scoredDocs]] keep decision),
  * train a linear classifier on those labels by full-batch gradient
  * descent, then score the whole corpus with the model. The reference has
  * no model training at all (its quality notion is the engagement-rate
  * arithmetic of EngagementProcessor.scala:104-118); this closes the gap
  * between the heuristic gates (q_text_quality, q_rep_quality) and a
  * *learned* scorer, which is the piece an LLM-data pipeline actually
  * deploys at scale.
  *
  * SCALE SHAPE: the feature projection is one map-side pass over text
  * (six doubles per document — at 100 TB the feature frame is ~50 bytes a
  * row and the text is read exactly once); each GD iteration is ONE
  * map-side-combinable aggregation over the persisted feature frame (six
  * decimal sums + a count merge 32 partials — nothing else shuffles), and
  * the weight vector lives driver-side as operator metadata (6 doubles,
  * the BPE-winner discipline, not data). T iterations = T cheap passes
  * over cached skinny rows; no Window, no join, no per-row state.
  *
  * CROSS-ENGINE EXACTNESS (the reason this is oracle-checkable at all):
  * the squashing function is the RATIONAL fast sigmoid
  * `0.5 * (1 + z / (1 + |z|))` — e^x is the one libm op whose spelling
  * differs across engines (the [[Retrieval.lmPerplexity]] note), so the
  * logistic link is replaced by an algebraically-identical-in-IEEE
  * alternative; every per-row contribution is rounded to 9 decimals and
  * summed as DECIMAL(28,9) (order-free, exact — the [[Util.dsum]]
  * discipline), and the weight update rounds to 8 decimals via the shared
  * floor spelling, so the DuckDB oracle replays the ENTIRE training
  * trajectory bit-for-bit as chained CTEs.
  */
object QualityModel {

  /** GD iterations — each is one aggregation pass in BOTH engines (the
    * oracle's replay cost grows quadratically in the chain length, so
    * this stays small the way [[Retrieval.BpeEncodeRounds]] does). */
  val Iters = 16

  /** Learning rate — exactly representable in binary so the literal is
    * the same value in Scala, Spark SQL, and DuckDB. Chosen by a sweep
    * on the sf0.01 corpus: (4.0, 16 iters) reaches ~0.91 training
    * accuracy against the heuristic label with a monotone trajectory;
    * smaller rates converge too slowly for a bounded oracle replay. */
  val Lr = 4.0

  /** Driver-side twin of [[Util.roundTo]] (same IEEE op sequence). */
  private def round8(x: Double): Double =
    math.floor(x * 1e8 + 0.5) / 1e8

  /** Per-document training frame (doc_id, x1..x5, y): the five rational
    * quality signals (each capped to [0,1] and rounded to 6 decimals)
    * plus the heuristic keep-label. Signals, composite, and gate come
    * from the SHARED [[TextOps.qualitySignals]]/[[TextOps.qualityOf]]/
    * [[TextOps.keepGateRaw]] definitions, so the label here IS the
    * q_corpus_select gate — a weight or threshold tweak there moves
    * this classifier and its oracle together. */
  def fitFeatures(docs: DataFrame): DataFrame = {
    val (t1, t2, t3, markerHits, nToks) = TextOps.qualitySignals()
    val quality = TextOps.qualityOf(t1, t2, t3)
    docs.select(
      col("doc_id"),
      roundTo(t1, 6).as("x1"),
      roundTo(t2, 6).as("x2"),
      roundTo(t3, 6).as("x3"),
      roundTo(least(markerHits.cast("double") / 5.0, lit(1.0)), 6).as("x4"),
      roundTo(least(nToks.cast("double") / 100.0, lit(1.0)), 6).as("x5"),
      when(TextOps.keepGateRaw(quality, markerHits), lit(1.0))
        .otherwise(lit(0.0)).as("y"))
  }

  /** The model z = w0 + w1·x1 + … + w5·x5 over a feature row — spelled
    * as the same left-associated IEEE chain in the oracle. */
  private def zOf(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3") + lit(w(4)) * col("x4") + lit(w(5)) * col("x5")

  /** [[zOf]] with the weights read from COLUMNS w0..w5 (a 1-row frame
    * cross-joined in) instead of literals — the identical
    * left-associated IEEE chain (column-vs-literal changes where the
    * doubles come from, not one arithmetic op), spelled so every GD
    * iteration compiles to the SAME generated code (OPTIMIZATION r19:
    * with per-iteration literals each of the [[Iters]] aggregation
    * passes embedded fresh constants in its expression tree, so
    * whole-stage codegen recompiled per iteration — the compile, not
    * the 5k-row scan, dominated the query's wall). */
  private def zOfCols: Column =
    col("w0") + col("w1") * col("x1") + col("w2") * col("x2") +
      col("w3") * col("x3") + col("w4") * col("x4") + col("w5") * col("x5")

  /** Rational fast sigmoid, rounded to 9 decimals (the per-row
    * contribution precision). */
  private def sigma9(z: Column): Column =
    roundTo(lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z))), 9)

  /** Order-free exact gradient sum: round each per-row term to 9
    * decimals, sum as DECIMAL(28,9), cast back once. */
  private def gsum(c: Column): Column =
    sum(roundTo(c, 9).cast(DecimalType(28, 9))).cast("double")

  /** Full-batch GD from w = 0: returns the weight vector AFTER each
    * iteration (Iters entries of 6 weights, each rounded to 8
    * decimals). Memoized per (session, dir) — q_quality_fit and
    * q_quality_infer consume the identical trajectory, and training
    * runs once per session ([[Memo]] discipline). */
  def fitWeights(s: SparkSession, dir: String): Vector[Array[Double]] =
    Memo.stage(s, dir, s"quality_fit_${Iters}") {
      val f = fitFeatures(Tables.documents(s, dir)).persist()
      try {
        val w = Array.fill(6)(0.0)
        val out = Vector.newBuilder[Array[Double]]
        var t = 0
        while (t < Iters) {
          // weights ride a 1-row LocalRelation (broadcast NLJ against
          // the cached feature frame) so iteration plans differ only
          // in DATA, never in generated code — see [[zOfCols]]
          val wRow = {
            import org.apache.spark.sql.types._
            s.createDataFrame(
              java.util.Arrays.asList(org.apache.spark.sql.Row(
                w(0), w(1), w(2), w(3), w(4), w(5))),
              StructType((0 to 5).map(j =>
                StructField(s"w$j", DoubleType, nullable = false))))
          }
          val e = sigma9(zOfCols) - col("y")
          val r = f.crossJoin(broadcast(wRow)).agg(
            count(lit(1)).as("n"),
            gsum(e).as("g0"),
            gsum(e * col("x1")).as("g1"),
            gsum(e * col("x2")).as("g2"),
            gsum(e * col("x3")).as("g3"),
            gsum(e * col("x4")).as("g4"),
            gsum(e * col("x5")).as("g5")).collect()(0)
          // n first: on an empty corpus the gradient sums are NULL and
          // a bare getDouble would die with an opaque NPE — fail loudly
          require(r.getLong(0) > 0,
            "QualityModel.fitWeights: empty corpus — nothing to train on")
          val n = r.getLong(0).toDouble
          var j = 0
          while (j < 6) {
            w(j) = round8(w(j) - Lr * (r.getDouble(1 + j) / n))
            j += 1
          }
          out += w.clone()
          t += 1
        }
        out.result()
      } finally f.unpersist(blocking = false)
    }

  /** q_quality_fit: the training trajectory — one row per iteration,
    * (iter, w0..w5). Operator metadata by design (6 doubles a row);
    * the work is the Iters aggregation passes behind it. */
  def fitFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    fitWeights(s, dir).zipWithIndex.map { case (w, i) =>
      (i + 1, w(0), w(1), w(2), w(3), w(4), w(5))
    }.toDF("iter", "w0", "w1", "w2", "w3", "w4", "w5").orderBy("iter")
  }

  /** The trained model applied to a (doc_id, text, n_chars) frame
    * with FROZEN weights — one map-side projection (features → fast
    * sigmoid → threshold), no shuffle, no state. Works unchanged on a
    * STREAMING frame: this is the online-scoring deployment mode (a
    * pipeline trains in batch, freezes the weight vector, and scores
    * every incoming micro-batch with it — QualityModelSpec asserts
    * stream-final scores equal the batch answer). */
  def scoreWith(docs: DataFrame, w: Array[Double]): DataFrame = {
    require(w.length == 6, s"weight vector has ${w.length} entries, want 6")
    fitFeatures(docs)
      .select(col("doc_id"), roundTo(sigma9(zOf(w)), 6).as("score"), col("y"))
      .select(col("doc_id"), col("score"),
        when(col("score") >= 0.5, lit(1)).otherwise(lit(0)).as("pred"),
        col("y").cast("int").as("label"))
  }

  /** q_quality_infer: the trained model applied to every document —
    * (doc_id, score, pred, label). Pure map-side once the (memoized)
    * weights exist; at 100 TB this is the single-pass scoring job the
    * pipeline runs over each incoming shard. */
  def infer(s: SparkSession, dir: String): DataFrame =
    scoreWith(Tables.documents(s, dir), fitWeights(s, dir).last)
      .orderBy("doc_id")

  // ---------------------------------------------------------------
  // Oracle: the training replay as chained CTEs
  // ---------------------------------------------------------------

  private def sigmaSql(z: String): String =
    roundToSql(s"0.5 * (1.0 + $z / (1.0 + ABS($z)))", 9)

  private def gsumSql(x: String, as: String): String =
    s"CAST(SUM(CAST(${roundToSql(x, 9)} AS DECIMAL(28,9))) AS DOUBLE) AS $as"

  /** CTEs t, u ([[TextOps.qualityCtesSql]]), f (features+label), and
    * w0..w`iters` (the GD chain — each wK references w(K-1) exactly
    * once so a CTE-inlining engine pays a linear, not exponential,
    * replay). */
  private def gdCtesSql(iters: Int): String = {
    val stopLst = TextOps.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    val f =
      s"""f AS (
         |  SELECT t.doc_id,
         |    ${roundToSql("LEAST(CAST(t.n_chars AS DOUBLE) / 500.0, 1.0)", 6)} AS x1,
         |    ${roundToSql("LEAST(CAST(len(list_filter(t.toks, x -> list_contains(" + stopLst + ", x))) AS DOUBLE) / GREATEST(CAST(len(t.toks) AS DOUBLE), 1.0) * 5.0, 1.0)", 6)} AS x2,
         |    ${roundToSql("LEAST(CAST(t.n_punct AS DOUBLE) * 10.0 / GREATEST(length(t.text), 1), 1.0)", 6)} AS x3,
         |    ${roundToSql("LEAST(CAST(u.marker_hits AS DOUBLE) / 5.0, 1.0)", 6)} AS x4,
         |    ${roundToSql("LEAST(CAST(u.n_tokens AS DOUBLE) / 100.0, 1.0)", 6)} AS x5,
         |    CASE WHEN u.quality_score >= 0.3 AND u.marker_hits > 0 THEN 1.0 ELSE 0.0 END AS y
         |  FROM t JOIN u ON t.doc_id = u.doc_id)""".stripMargin
    val w0 = "w0 AS (SELECT " +
      (0 to 5).map(j => s"CAST(0.0 AS DOUBLE) AS w$j").mkString(", ") + ")"
    val chain = (1 to iters).map { k =>
      val upd = (0 to 5).map(j =>
        s"FLOOR((w$j - $Lr * (g$j / n)) * 100000000 + 0.5) / 100000000 AS w$j")
        .mkString(",\n    ")
      val gs = Seq(gsumSql("e", "g0"), gsumSql("e * x1", "g1"),
        gsumSql("e * x2", "g2"), gsumSql("e * x3", "g3"),
        gsumSql("e * x4", "g4"), gsumSql("e * x5", "g5")).mkString(",\n      ")
      val zExpr = "p.w0 + p.w1 * f.x1 + p.w2 * f.x2 + p.w3 * f.x3 + p.w4 * f.x4 + p.w5 * f.x5"
      s"""w$k AS (
         |  SELECT $k AS iter,
         |    $upd
         |  FROM (
         |    SELECT any_value(w0) AS w0, any_value(w1) AS w1, any_value(w2) AS w2,
         |      any_value(w3) AS w3, any_value(w4) AS w4, any_value(w5) AS w5,
         |      COUNT(*) AS n,
         |      $gs
         |    FROM (
         |      SELECT w0, w1, w2, w3, w4, w5, x1, x2, x3, x4, x5,
         |        ${sigmaSql("z")} - y AS e
         |      FROM (
         |        SELECT f.x1, f.x2, f.x3, f.x4, f.x5, f.y,
         |          p.w0, p.w1, p.w2, p.w3, p.w4, p.w5,
         |          $zExpr AS z
         |        FROM f CROSS JOIN w${k - 1} p))))""".stripMargin
    }
    (Seq(TextOps.qualityCtesSql(withDigest = false), f, w0) ++ chain)
      .mkString(",\n")
  }

  private def fitOracleSql: String = {
    val union = (1 to Iters)
      .map(k => s"SELECT iter, w0, w1, w2, w3, w4, w5 FROM w$k")
      .mkString("\nUNION ALL\n")
    s"""WITH ${gdCtesSql(Iters)}
       |$union
       |ORDER BY iter""".stripMargin
  }

  private def inferOracleSql: String = {
    val zExpr = "p.w0 + p.w1 * f.x1 + p.w2 * f.x2 + p.w3 * f.x3 + p.w4 * f.x4 + p.w5 * f.x5"
    s"""WITH ${gdCtesSql(Iters)}
       |SELECT doc_id, score,
       |  CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS pred,
       |  CAST(y AS INTEGER) AS label
       |FROM (
       |  SELECT doc_id, ${roundToSql(sigmaSql("z"), 6)} AS score, y
       |  FROM (
       |    SELECT f.doc_id, f.y, $zExpr AS z
       |    FROM f CROSS JOIN w$Iters p))
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // Declared queries + oracles
  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TRAINED quality model, part 1: the GD trajectory (weights after
    // each of the Iters full-batch iterations). The oracle replays
    // training end-to-end, so a drift anywhere — features, label,
    // sigmoid, gradient, update, iteration count — hash-mismatches.
    "q_quality_fit" -> ((s, dir) => fitFrame(s, dir)),

    // TRAINED quality model, part 2: the learned scorer applied to the
    // full corpus (score, threshold decision, heuristic label).
    "q_quality_infer" -> ((s, dir) => infer(s, dir)))

  val oracle: Map[String, String] = Map(
    "q_quality_fit" -> fitOracleSql,
    "q_quality_infer" -> inferOracleSql)
}
