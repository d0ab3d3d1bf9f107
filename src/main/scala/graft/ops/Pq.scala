package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the IVF-PQ companion of [[Ivf]] and
  * the 32× memory lever for vector serving: each vector is split into
  * `m` subspaces, each subspace k-means-quantized to a `k`-entry
  * codebook, and stored as `m` small codes (m=8, k=16 → 8 codes ≈
  * 8 B/vector vs 256 B of raw float32).
  *
  * Query-time scoring is ASYMMETRIC distance computation (ADC): the
  * query stays full-precision; per subspace a k-entry lookup table of
  * exact sub-distances is built once (driver-side, m×k doubles), and
  * each candidate's approximate squared L2 distance is the SUM of m
  * table lookups — a pure map-side, codegen-friendly expression over
  * the code column. No vector data is touched at scoring time.
  *
  * Scale shape: fit = m × [[Ivf.fit]] over SLICES of the embedding
  * (assignment map-side, only K×sub decimal partials shuffle);
  * encoding is m codegen'd [[graft.functions.NearestCentroid]] calls
  * in one pass; search shuffles only top-k partials. The codebook
  * table is m×k×(dims/m) doubles — driver-scale by construction.
  */
object Pq {

  /** Per-subspace codebooks: `codebooks(s)(j)` = centroid j of
    * subspace s (dims/m components each).
    *
    * FUSED fit: all m subspaces advance together, ONE corpus pass per
    * Lloyd iteration — each row explodes into m (subspace, cell,
    * slice) entries, and a single (subspace, cell, pos) aggregation
    * computes every codebook's decimal-exact means at once. The
    * per-subspace spelling ([[fitPerSubspace]]) is m independent
    * [[Ivf.fit]]s = 3m jobs over the corpus — at production width
    * (d=768 → m=96) that is ~290 sequential scans and a 119 s wall at
    * 500k vectors where the fused pass takes the cost of ~3
    * (VEC_DIM768.json). Identical seeds (the same first-k rows,
    * sliced), identical per-subspace assignment expression, and
    * order-free decimal means make the two spellings bit-identical —
    * pinned by PqSpec and the q_pq_adc / q_ivfpq DuckDB oracles,
    * which replay the sequential formulation. */
  def fit(df: DataFrame, embCol: Column, seedOrder: Seq[Column], m: Int = 8,
      dims: Int = 64, k: Int = 16, iters: Int = 2): Array[Array[Array[Double]]] = {
    val sub = dims / m
    require(m * sub == dims, s"m=$m must divide dims=$dims")
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 9)
    // seeds: the first k rows in seed order, one slice per subspace —
    // exactly what each sequential Ivf.fit would have collected
    val seedVecs = df.orderBy(seedOrder: _*).limit(k).select(embCol.as("e"))
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(seedVecs.nonEmpty, "PQ k-means needs a non-empty corpus")
    // SQL slice() semantics on the seed rows (what each sequential
    // Ivf.fit would have collected): a vector longer than dims still
    // slices full-width, a short one yields a short slice — rejected
    // below exactly like Ivf.fit's seed-width guard
    def sliceOf(v: Array[Double], s: Int): Array[Double] = java.util.Arrays
      .copyOfRange(v, math.min(s * sub, v.length), math.min((s + 1) * sub, v.length))
    var codebooks: Array[Array[Array[Double]]] = Array.tabulate(m)(s =>
      seedVecs.map(sliceOf(_, s)))
    codebooks.foreach(_.find(_.length != sub).foreach(c =>
      throw new IllegalArgumentException(
        s"dims=$sub but a seed vector has width ${c.length} — pass the " +
          "corpus's actual embedding width")))
    var it = 0
    while (it < iters) {
      // ONE native generator emits each vector's (s, cell, pos, v)
      // rows with the per-subspace assignment computed exactly once
      // per input row. NOT spelled as pq_encode + posexplode: the
      // optimizer collapses projections THROUGH a Generate, inlining
      // the encode into the consuming projection and re-evaluating it
      // per EXPLODED row — dims × (m·k·sub) flops per vector, a
      // non-terminating fit at d=768 (see PqFitExplode's scaladoc).
      val rows = df
        .select(graft.functions.pq_fit_explode(embCol, codebooks)
          .as(Seq("s", "cell", "pos", "v")))
        .groupBy("s", "cell", "pos")
        .agg((sum(col("v").cast("double").cast(Dec)).cast("double")
          / count(lit(1))).as("m"))
        .collect()
      val updated: Map[(Int, Int), Array[Double]] = rows
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
        .groupBy(t => (t._1, t._2))
        .map { case (key, vs) =>
          val a = new Array[Double](sub)
          vs.foreach { case (_, _, p, mn) => a(p) = mn }
          key -> a
        }
      codebooks = Array.tabulate(m)(s => Array.tabulate(k)(j =>
        updated.getOrElse((s, j), codebooks(s)(j))))
      it += 1
    }
    codebooks
  }

  /** The m-independent-fits spelling of [[fit]] — kept as the
    * equivalence reference (PqSpec pins `fit == fitPerSubspace`
    * exactly, ragged rows included). */
  private[graft] def fitPerSubspace(df: DataFrame, embCol: Column,
      seedOrder: Seq[Column], m: Int = 8, dims: Int = 64, k: Int = 16,
      iters: Int = 2): Array[Array[Array[Double]]] = {
    val sub = dims / m
    require(m * sub == dims, s"m=$m must divide dims=$dims")
    Array.tabulate(m)(s =>
      Ivf.fit(df, slice(embCol, s * sub + 1, sub), seedOrder, k, iters, sub))
  }

  /** Add the `pq_code` column (array<int>, m entries) — ONE native
    * pass over all m subspaces ([[graft.functions.PqEncode]]; the
    * m-expression composed spelling paid an m-proportional
    * whole-stage-codegen compile, ~20 s of first-task wall at m=96).
    * Bit-parity with the composed form is pinned in PqSpec. */
  def encode(df: DataFrame, embCol: Column,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    df.withColumn("pq_code", graft.functions.pq_encode(embCol, codebooks))

  /** The m-expression composed spelling of [[encode]] — kept as the
    * equivalence reference for PqSpec. */
  private[graft] def encodeComposed(df: DataFrame, embCol: Column,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val sub = codebooks(0)(0).length
    df.withColumn("pq_code", array(codebooks.indices.map(s =>
      graft.functions.nearest_centroid(
        slice(embCol, s * sub + 1, sub), codebooks(s))): _*))
  }

  /** Residual of an embedding against its assigned IVF centroid —
    * `r[i] = float((double) e[i] − centers(cell)(i))` — the IVFADC
    * formulation (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", §IV): PQ codebooks trained on residuals only
    * have to cover the within-cell displacement, not the coarse
    * position, so the same m×k budget buys a finer quantization.
    * Float-rounded per element (IEEE round-to-nearest in both
    * engines) so the DuckDB replay is bit-exact.
    *
    * Composed zip_with on purpose: evaluated once per row wherever it
    * feeds [[encode]] or [[fit]]'s generator, and the d ops/row are
    * noise next to the m·k·sub encode loop. NULL cell (ragged vector
    * that could not be assigned) → NULL residual → m NULL codes →
    * NULL ADC, the established drop path; an element past the
    * centroid width zips against NULL and stays NULL. */
  def residual(embCol: Column, cellCol: Column,
      centers: Array[Array[Double]]): Column =
    zip_with(embCol,
      element_at(typedlit(centers.map(_.toSeq).toSeq), cellCol + lit(1)),
      (x, c) => (x.cast("double") - c).cast("float"))

  /** Per-cell query residuals → per-cell ADC LUTs for the routed
    * cells: `lut_c` is [[lutL2]] of the query's residual against cell
    * c's centroid. Driver-side, nProbe × m × k doubles. */
  def residualLuts(codebooks: Array[Array[Array[Double]]],
      centers: Array[Array[Double]], q: Array[Double],
      cells: Seq[Int]): Seq[(Int, Array[Array[Double]])] =
    cells.map { c =>
      val ctr = centers(c)
      c -> lutL2(codebooks, Array.tabulate(q.length)(i =>
        q(i) - (if (i < ctr.length) ctr(i) else 0.0)))
    }

  /** ADC distance where each candidate is scored through ITS cell's
    * residual LUT — a when-chain over the routed cells (nProbe-bounded
    * by construction; every LUT is a reference object, no per-query
    * codegen). A row from an unrouted cell scores NULL. */
  def adcDistSqPerCell(codeCol: Column, cellCol: Column,
      cellLuts: Seq[(Int, Array[Array[Double]])]): Column =
    cellLuts.foldLeft(lit(null).cast("double")) { case (acc, (c, lut)) =>
      when(cellCol === lit(c), adcDistSq(codeCol, lut)).otherwise(acc)
    }

  /** ADC distance where the lookup table is a COLUMN
    * (array<array<double>>, e.g. [[graft.functions.pq_lut_l2]]'s
    * output carried through a broadcast join) instead of a reference
    * object — what batch serving needs: Q queries' LUTs ride as data,
    * one expression shape for all of them. Composed zip_with +
    * sequential aggregate fold, bit-equal to [[adcDistSq]] on
    * well-formed codes (same subspace order, same 0.0-seeded
    * left-to-right double fold — PqSpec pins it) and NULL on the same
    * degenerate inputs (NULL/short/negative/out-of-range codes, NULL
    * table). Codes past the table's m are NULL here vs ignored by the
    * native form — unreachable from [[encode]], which always emits
    * exactly m codes. */
  def adcDistSqCol(codeCol: Column, lutCol: Column): Column =
    aggregate(
      zip_with(codeCol, lutCol,
        (c, t) => when(c >= 0, try_element_at(t, c + lit(1)))),
      lit(0.0),
      (acc, x) => acc + x)

  /** Persist codebooks as a (subspace, cell, centroid) parquet table. */
  def save(spark: SparkSession, codebooks: Array[Array[Array[Double]]],
      dir: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
    }.toSeq.toDF("subspace", "cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(dir)
  }

  def load(spark: SparkSession, dir: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(dir).orderBy("subspace", "cell")
      .select("subspace", "centroid").collect()
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Double](1).toArray).toArray).toArray
  }

  /** ADC lookup table for one query: `lut(s)(j)` = exact squared L2
    * distance between the query's subspace-s slice and codebook entry
    * (s, j). m×k doubles, built driver-side per query. */
  def lutL2(codebooks: Array[Array[Array[Double]]], q: Array[Double])
      : Array[Array[Double]] = {
    val sub = codebooks(0)(0).length
    codebooks.zipWithIndex.map { case (cb, s) =>
      val qs = java.util.Arrays.copyOfRange(q, s * sub, (s + 1) * sub)
      cb.map(c => Ivf.distSq(qs, c))
    }
  }

  /** Approximate squared L2 distance of a coded vector to the query
    * behind `lut` — fully map-side. Native ([[graft.functions
    * .PqAdcDist]]): the composed element_at chain embedded the LUT as
    * m×k literals, so every query generated fresh source and paid a
    * janino recompile before its scan; as a reference object the
    * expression's codegen shape is query-independent. Same
    * left-to-right double fold in subspace order — bit-identical
    * distances on well-formed codes (PqSpec pins it against the
    * composed chain), and CORRECT NULL on ragged codes where the
    * composed chain silently evaluated 0.0 (element_at over a
    * non-nullable literal array with a NULL index skips the null
    * branch — an ADC distance of 0.0 would rank the ragged row
    * FIRST; PqSpec pins both behaviors). */
  def adcDistSq(codeCol: Column, lut: Array[Array[Double]]): Column =
    graft.functions.pq_adc_dist(codeCol, lut)

  /** The literal element_at chain — equivalence reference for
    * PropertiesSpec. */
  private[graft] def adcDistSqComposed(codeCol: Column,
      lut: Array[Array[Double]]): Column =
    lut.indices.map(s =>
      element_at(typedlit(lut(s).toSeq), element_at(codeCol, s + 1) + 1))
      .reduce(_ + _)

  /** Top-k nearest (smallest approximate L2) over an encoded corpus
    * for one query — scores from code lookups only. */
  def search(encoded: DataFrame, idCol: Column,
      codebooks: Array[Array[Array[Double]]], q: Array[Float],
      topK: Int): DataFrame = {
    val lut = lutL2(codebooks, q.map(_.toDouble))
    encoded.select(idCol.as("vec_id"),
        adcDistSq(col("pq_code"), lut).as("adc_dist_sq"))
      // a ragged vector encodes to NULL codes → NULL distance; Spark
      // sorts NULLS FIRST ascending, which would rank garbage at the
      // top (and diverge from DuckDB's NULLS LAST) — drop them
      .filter(col("adc_dist_sq").isNotNull)
      .orderBy(col("adc_dist_sq").asc, col("vec_id").asc)
      .limit(topK)
  }
}
