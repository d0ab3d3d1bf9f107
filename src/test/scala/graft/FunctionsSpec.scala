package graft

import org.apache.spark.sql.functions._
import graft.functions.{cosine_sim, registerAll, simhash64}
import graft.ops.TextOps

/** Native Catalyst expression behavior: SimHash64 + CosineSim. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64: identical token arrays give identical fingerprints") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a", "b", "c")),
      (3L, Seq("x", "y", "z"))).toDF("id", "toks")
      .select($"id", simhash64($"toks").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(df(1L) === df(2L))
    assert(df(1L) !== df(3L))
  }

  test("simhash64: near-dup token streams land within a small Hamming ball") {
    val base = (1 to 60).map(i => s"tok$i")
    val mutated = base.updated(30, "CHANGED")
    val r = Seq((1L, base), (2L, mutated)).toDF("id", "toks")
      .select($"id", simhash64($"toks").as("h")).as[(Long, Long)].collect().toMap
    val hamming = java.lang.Long.bitCount(r(1L) ^ r(2L))
    assert(hamming <= 16, s"hamming=$hamming too large for a 1-token edit")
  }

  test("simhash64: codegen and interpreted paths agree") {
    val toks = Seq("alpha", "beta", "gamma", "delta")
    val viaDf = Seq(Tuple1(toks)).toDF("toks")
      .select(simhash64($"toks")).as[Long].head()
    // interpreted path: direct eval on a GenericArrayData
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString))
    val direct = graft.functions.SimHashUtil.simhash64(arr)
    assert(viaDf === direct)
  }

  test("simhash64 null semantics: null array -> null, null elements skipped") {
    val df = Seq((1L, Option(Seq(Option("a"), None, Option("b")))), (2L, None))
      .toDF("id", "toks")
      .select($"id", simhash64($"toks").as("h"))
    val rows = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(2L).isEmpty)
    val clean = Seq(Tuple1(Seq("a", "b"))).toDF("toks")
      .select(simhash64($"toks")).as[Long].head()
    assert(rows(1L).contains(clean))
  }

  test("cosine_sim matches the higher-order-function fold bit-exactly") {
    val e = graft.io.Tables.embeddings(spark, sf("sf0.01")).limit(200)
    val a = e.select($"vec_id".as("ia"), $"embedding".as("ea"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("eb"))
    val pairs = a.join(b, $"ia" < $"ib").limit(500)
    val diff = pairs.select(
        cosine_sim($"ea", $"eb").as("native"),
        graft.ops.VectorOps.cosine($"ea", $"eb").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff === 0)
  }

  test("native functions registered for SQL use") {
    registerAll(spark)
    Seq((Seq("a", "b"), Seq(1f, 2f), Seq(2f, 4f))).toDF("t", "x", "y")
      .createOrReplaceTempView("fn_fixture")
    val r = spark.sql(
      "SELECT simhash64(t) AS h, cosine_sim(x, y) AS c FROM fn_fixture").head()
    assert(r.getAs[Long]("h") !== 0L)
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
  }

  test("topk_by_score matches orderBy().limit(k) incl. tie-breaks, across partitions") {
    val df = (1 to 500).map(i => ((i % 37).toDouble, s"key$i")).toDF("score", "key")
      .repartition(7)  // force partial-buffer merges
    val agg = df.agg(graft.functions.topk_by_score($"score", $"key", 10).as("t"))
      .select(explode($"t")).select($"col.score", $"col.key")
      .as[(Double, String)].collect().toSeq
    val expect = (1 to 500).map(i => ((i % 37).toDouble, s"key$i"))
      .sortBy { case (s, k) => (-s, k) }.take(10)
    assert(agg === expect)
  }

  test("topk_by_score ranks NaN scores first, deterministically across partitions") {
    // NaN must occupy the DESC-first slot (where Spark's orderBy and
    // DuckDB's row_number both put it) regardless of partial-merge
    // arrival order — a primitive-comparison buffer buried it wherever
    // insertion order happened to drop it
    val rows = Seq((Double.NaN, "n2"), (5.0, "a"), (Double.NaN, "n1"),
      (7.0, "b"), (1.0, "c"))
    val agg = rows.toDF("score", "key").repartition(4)
      .agg(graft.functions.topk_by_score($"score", $"key", 4).as("t"))
      .select(explode($"t")).select($"col.key").as[String].collect().toSeq
    assert(agg === Seq("n1", "n2", "b", "a"), s"got $agg")
  }

  test("cosine_sim nulls out ragged-length pairs like the zip_with fold") {
    val df = Seq(
      (Seq(1f, 2f), Seq(2f, 4f)),     // equal length → finite
      (Seq(1f, 2f, 3f), Seq(1f, 2f))  // ragged → null (zip_with pads null)
    ).toDF("x", "y")
      .select(graft.functions.cosine_sim($"x", $"y").as("c"))
      .as[Option[Double]].collect().toSeq
    assert(df.head.exists(c => math.abs(c - 1.0) < 1e-12))
    assert(df(1).isEmpty, s"ragged pair must be null, got ${df(1)}")
  }

  test("ngram_hash_explode is SQL-registered") {
    registerAll(spark)
    Seq(Seq("a", "b", "c", "d")).toDF("toks")
      .createOrReplaceTempView("ngram_fixture")
    val n = spark.sql(
      "SELECT ngram_hash_explode(toks) AS h FROM ngram_fixture").count()
    assert(n === 2L)  // 4 tokens → 2 trigram shingles
  }

  test("topk_by_score survives serialize/deserialize round trip") {
    val a = graft.functions.TopKByScore(null, null, 3)
    val buf = a.createAggregationBuffer()
    Seq((5.0, "b"), (7.0, "a"), (5.0, "a"), (1.0, "z")).foreach { case (s, k) =>
      buf.insert(s, org.apache.spark.unsafe.types.UTF8String.fromString(k))
    }
    val back = a.deserialize(a.serialize(buf))
    assert(back.size === 3)
    assert(back.scores.take(back.size).toSeq === Seq(7.0, 5.0, 5.0))
    assert(back.keys.take(back.size).map(_.toString).toSeq === Seq("a", "a", "b"))
  }

  test("ngram_hash_explode emits the same hash multiset as the expression chain") {
    val docs = graft.io.Tables.documents(spark, sf("sf0.01")).limit(200)
      .withColumn("toks", TextOps.tokens($"text"))
    val viaExpr = docs
      .select($"doc_id", explode(TextOps.shingleHashes(TextOps.shingles($"toks"))).as("h"))
      .as[(Long, Long)].collect().toSet
    val viaGen = docs
      .select($"doc_id", graft.functions.ngram_hash_explode($"toks").as("h"))
      .as[(Long, Long)].collect().toSet
    assert(viaGen === viaExpr)
  }

  test("ngram_hash_explode edge cases: empty, short, null-element inputs") {
    val df = Seq(
      (1L, Seq("a", "b")),          // <3 tokens -> 1 whole-text shingle
      (2L, Seq("a", "b", "c")),     // exactly 3 -> 1 shingle
      (3L, Seq.empty[String])       // empty -> 1 hash of ""
    ).toDF("id", "toks")
      .select($"id", graft.functions.ngram_hash_explode($"toks").as("h"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.length).toMap
    assert(df === Map(1L -> 1, 2L -> 1, 3L -> 1))
  }

  test("simhash pairs query finds the jaccard near-dups") {
    val truth = SparkEntry.queries("q_ngram_jaccard")(spark, sf("sf0.01"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sh = SparkEntry.queries("q_simhash_pairs")(spark, sf("sf0.01"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // simhash(hamming<=8) should recover the strong near-dups
    assert(truth.intersect(sh).size >= truth.size / 2,
      s"simhash recovered ${truth.intersect(sh).size} of ${truth.size}")
  }

  test("simhash60_md5 matches the declarative per-bit majority vote (oracle form)") {
    // the same op sequence the DuckDB oracle spells: hash60 per token,
    // ±1 vote per bit, set bit where the vote is positive
    val docs = graft.io.Tables.documents(spark, sf("sf0.01")).limit(300)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
    val hs = transform($"toks", t => TextOps.hash60(t))
    val declarative = (0 until 60).map { b =>
      when(
        aggregate(hs, lit(0L), (v, h) =>
          v + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)) > 0,
        lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    val rows = docs.select($"doc_id",
        graft.functions.simhash60_md5($"toks").as("native"),
        declarative.as("decl"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, d) => assert(n === d, s"doc $id") }
  }

  test("simhash60_md5: empty -> 0, fingerprints stay within 60 bits") {
    val r = Seq((1L, Seq.empty[String]), (2L, Seq("the", "quick", "fox")))
      .toDF("id", "toks")
      .select($"id", graft.functions.simhash60_md5($"toks").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(r(1L) === 0L)
    assert(r(2L) > 0L && (r(2L) >> 60) === 0L)
  }

  test("token_stats matches the composed HOF spellings count-for-count") {
    val stop = TextOps.stopwords
    val markers = TextOps.langMarkers.flatMap(_._2)
    val docs = graft.io.Tables.documents(spark, sf("sf0.01")).limit(200)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .union(Seq(
        (-1L, Seq.empty[String]),                   // empty doc
        (-2L, Seq("the")),                          // 1 token, stopword
        (-3L, Seq("a", "a", "a")),                  // all-repeat
        (-4L, Seq("el", "que", "der", "und", "x"))  // marker mix
      ).toDF("doc_id", "toks"))
    // the pre-native expression trees, verbatim
    val t = col("toks")
    val nTok = size(t)
    val dist = array_distinct(t)
    val topFreq = coalesce(
      array_max(transform(dist, u => size(filter(t, x => x === u)))), lit(0))
    val bigrams = when(nTok >= 2,
      transform(sequence(lit(1), nTok - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
    val composed = docs.select($"doc_id",
      nTok.as("c1"), size(dist).as("c2"), topFreq.as("c3"),
      size(bigrams).as("c4"), size(array_distinct(bigrams)).as("c5"),
      size(filter(t, x => x.isInCollection(stop))).as("c6"),
      size(filter(t, x => x.isInCollection(markers))).as("c7"))
    val native = docs.select($"doc_id",
      graft.functions.token_stats($"toks", stop, markers).as("st"))
      .select($"doc_id", $"st.n_tokens", $"st.n_distinct", $"st.top_freq",
        $"st.n_bigrams", $"st.n_distinct_bigrams", $"st.stop_hits",
        $"st.marker_hits")
    val a = composed.as[(Long, Int, Int, Int, Int, Int, Int, Int)]
      .collect().sortBy(_._1)
    val b = native.as[(Long, Int, Int, Int, Int, Int, Int, Int)]
      .collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("minhash_sigs matches the composed k-pass spelling, incl. empty input") {
    val docs = graft.io.Tables.documents(spark, sf("sf0.01")).limit(200)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id",
        TextOps.shingleHashes(TextOps.shingles($"toks")).as("hsh"))
      .union(Seq((-1L, Seq.empty[Long])).toDF("doc_id", "hsh"))
    val rows = docs.select($"doc_id",
      TextOps.minhashSig($"hsh", TextOps.MinhashK).as("native"),
      TextOps.minhashSigComposed($"hsh", TextOps.MinhashK).as("composed"))
      .as[(Long, Seq[Option[Long]], Seq[Option[Long]])].collect()
    rows.foreach { case (id, n, c) => assert(n === c, s"doc $id") }
    // the empty row must be k nulls on both paths
    val empty = rows.find(_._1 == -1L).get
    assert(empty._2 === Seq.fill(TextOps.MinhashK)(None))
  }

  test("fold expressions null out element-null vectors like the composed forms") {
    // a null slot reads 0.0f through getFloat; the composed
    // zip_with/aggregate folds return NULL instead — the natives must
    // agree or a null-poisoned vector silently scores by its
    // zero-filled form
    val planes = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(
      (1L, Seq(Option(1f), None), Seq(Option(2f), Option(4f))),
      (2L, Seq(Option(1f), Option(2f)), Seq(Option(2f), Option(4f)))
    ).toDF("id", "x", "y")
      .select($"id",
        graft.functions.cosine_sim($"x", $"y").as("c"),
        graft.functions.dot_product($"x", $"y").as("d"),
        graft.functions.sign_lsh_bucket($"x", planes).as("b"))
    val rows = df.collect().map(r => r.getLong(0) ->
      ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(rows(1L) === ((None, None, None)), s"poisoned row: ${rows(1L)}")
    val (c2, d2, b2) = rows(2L)
    assert(c2.exists(c => math.abs(c.asInstanceOf[Double] - 1.0) < 1e-12))
    assert(d2.contains(10.0))
    assert(b2.contains(3L)) // both plane dots positive
  }

  test("nearest_centroid: NaN-poisoned vector yields null, not cell 0") {
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val r = Seq(
      (1L, Seq(Float.NaN, 1f)),
      (2L, Seq(9f, 9f))
    ).toDF("id", "e")
      .select($"id", graft.functions.nearest_centroid($"e", cents).as("cell"))
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(r(1L).isEmpty, s"NaN vector must not route, got ${r(1L)}")
    assert(r(2L).contains(1))
    // interpreted twin: the util itself signals -1
    assert(graft.functions.NearestCentroidUtil.nearestOf(
      Array(Float.NaN, 1f), cents) === -1)
  }

  test("nearest_cells drops unroutable cells and nulls a fully-unroutable vector") {
    // one NaN centroid row: distance to it is NaN (never inserts), so
    // a 3-probe request over 3 centroids fills only 2 slots — the
    // result must be the 2 routable cells, not a -1-padded array
    val cents = Array(Array(0.0, 0.0), Array(Double.NaN, 0.0), Array(10.0, 10.0))
    val partial = Seq(Tuple1(Seq(1f, 1f))).toDF("e")
      .select(graft.functions.nearest_cells($"e", cents, 3).as("cells"))
      .as[Seq[Int]].head()
    assert(partial === Seq(0, 2), s"got $partial")
    // NaN vector: every distance NaN -> no routable cell -> NULL
    val none = Seq(Tuple1(Seq(Float.NaN, 1f))).toDF("e")
      .select(graft.functions.nearest_cells($"e", cents, 2).as("cells"))
      .collect().head
    assert(none.isNullAt(0), s"NaN vector must yield null, got $none")
  }

  test("pq_encode/pq_fit_explode: a NaN subspace codes null and is excluded from the fit") {
    // m=2 subspaces of width 2; NaN only in the second -> code(0)
    // real, code(1) null (matching the -1 routing sentinel), and the
    // fit generator emits rows only for the clean subspace
    val books = Array(
      Array(Array(0.0, 0.0), Array(10.0, 10.0)),
      Array(Array(0.0, 0.0), Array(10.0, 10.0)))
    val df = Seq(Tuple1(Seq(9f, 9f, Float.NaN, 1f))).toDF("e")
    val code = df.select(graft.functions.pq_encode($"e", books).as("c"))
      .collect().head.getSeq[Any](0)
    assert(code === Seq(1, null), s"got $code")
    val fitRows = df.select(graft.functions.pq_fit_explode($"e", books))
      .select($"s").as[Int].collect().toSeq
    assert(fitRows === Seq(0, 0), s"NaN subspace must not feed the fit: $fitRows")
  }

  test("minhash_sigs rejects malformed permutation tables at construction") {
    val h = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq(1L, 2L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))
    val mismatch = intercept[IllegalArgumentException] {
      graft.functions.MinhashSigs(h, Array(3L, 5L), Array(7L), (1L << 31) - 1)
    }
    assert(mismatch.getMessage.contains("must align"))
    val badP = intercept[IllegalArgumentException] {
      graft.functions.MinhashSigs(h, Array(3L), Array(7L), 1L << 33)
    }
    assert(badP.getMessage.contains("no-overflow"))
  }

  test("native expressions with equal reference tables compare equal (CSE)") {
    // the tables are constructed twice so reference equality cannot
    // save the test: content equality is what lets Catalyst CSE and
    // exchange-reuse recognize the repeated K×dims scan
    def cents() = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val child = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq(1f, 2f), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    val a = graft.functions.NearestCentroid(child, cents())
    val b = graft.functions.NearestCentroid(child, cents())
    assert(a === b)
    assert(a.hashCode === b.hashCode)
    val other = graft.functions.NearestCentroid(
      child, Array(Array(1.0, 2.0), Array(3.0, 5.0)))
    assert(a !== other)
    val p1 = graft.functions.SignLshBucket(child, cents())
    val p2 = graft.functions.SignLshBucket(child, cents())
    assert(p1 === p2 && p1.hashCode === p2.hashCode)
  }

  test("guarded doGenCode templates compile under codegen (no silent fallback)") {
    // UnsafeProjection.create swallows a Janino compile error and
    // falls back to interpreted mode — results stay right while the
    // hot path quietly loses codegen (it happened: a line-LEADING
    // `||` in the template is margin-stripped out of the generated
    // Java). Generate directly, which throws on a compile error.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
    val arr = BoundReference(0, ArrayType(FloatType), nullable = true)
    val str = BoundReference(1, StringType, nullable = true)
    val lit = Literal.create(Seq(1f, 2f), ArrayType(FloatType))
    val planes = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateMutableProjection.generate(Seq(
        graft.functions.CosineSim(arr, lit),
        graft.functions.DotProduct(arr, lit),
        graft.functions.SignLshBucket(arr, planes),
        graft.functions.NearestCentroid(arr, planes),
        graft.functions.DropChrome(str)))
    val out = proj(InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(1f, 2f)),
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "a<nav>x<nav>y</nav>z</nav>b")))
    assert(math.abs(out.getDouble(0) - 1.0) < 1e-12)
    assert(out.getDouble(1) === 5.0)
    assert(out.getLong(2) === 3L)
    assert(out.getInt(3) === 1)
    assert(out.getUTF8String(4).toString === "a b")
  }

  test("drop_chrome: codegen and interpreted paths agree; non-string rejected") {
    val html = "pre<header>h<nav>m</nav>t</header>post"
    val viaDf = Seq(Tuple1(html)).toDF("h")
      .select(graft.functions.drop_chrome($"h")).as[String].head()
    val direct = graft.functions.HtmlScanUtil.dropChrome(
      org.apache.spark.unsafe.types.UTF8String.fromString(html)).toString
    assert(viaDf === direct && viaDf === "pre post")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(1L)).toDF("h")
        .select(graft.functions.drop_chrome($"h")).collect()
    }
    assert(err.getMessage.contains("drop_chrome expects string"))
  }

  test("kmv_min_hashes keeps the k smallest distinct hashes, partition-independent") {
    // duplicates must not occupy slots (a heavy hitter would shrink
    // the effective k and bias the estimate), and the retained set
    // must be a pure function of the input SET across partitionings
    val vals = (1 to 1000).map(i => (i * 37 % 501).toLong)
    val expected = vals.distinct.sorted.take(16)
    for (parts <- Seq(1, 7)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(graft.functions.kmv_min_hashes($"h", 16).as("m"))
        .as[Seq[Long]].head()
      assert(got === expected, s"parts=$parts")
    }
    // under-full buffer returns every distinct value, ascending
    val small = Seq(5L, 3L, 5L, 9L).toDF("h")
      .agg(graft.functions.kmv_min_hashes($"h", 16).as("m"))
      .as[Seq[Long]].head()
    assert(small === Seq(3L, 5L, 9L))
  }

  test("KMV estimate lands near the exact cardinality") {
    val n = 5000
    val mins = (1 to n).map(_.toLong).toDF("user_id").repartition(8)
      .agg(graft.functions.kmv_min_hashes(
        graft.ops.TextOps.hash60($"user_id".cast("string")), 256).as("m"))
      .as[Seq[Long]].head()
    assert(mins.length === 256)
    val est = 255.0 * math.pow(2, 60) / mins(255).toDouble
    // k=256 → ~6% relative std error; 20% is a ≳3σ bound
    assert(math.abs(est - n) / n < 0.2, s"est=$est vs exact $n")
  }

  test("cms_sketch: counters are partition-independent, estimates upper-bound exact counts") {
    val vals = (1 to 2000).map(i => if (i % 3 == 0) 7L else (i % 97).toLong)
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (d, w) = (4, 64)
    val reference = vals.toDF("h")
      .agg(graft.functions.cms_sketch($"h", d, w).as("c"))
      .as[Seq[Long]].head()
    for (parts <- Seq(1, 5)) {
      val counters = vals.toDF("h").repartition(parts)
        .agg(graft.functions.cms_sketch($"h", d, w).as("c"))
        .as[Seq[Long]].head()
      // counter sums commute: identical matrix under any partitioning
      assert(counters === reference, s"parts=$parts")
      // each row conserves the total
      (0 until d).foreach(i =>
        assert(counters.slice(i * w, (i + 1) * w).sum === vals.size.toLong))
      // CMS point estimates only ever OVER-count
      exact.foreach { case (v, n) =>
        val est = (0 until d)
          .map(i => counters(i * w + graft.functions.CmsUtil.bucket(v, i, w))).min
        assert(est >= n, s"item $v: est $est < exact $n")
      }
    }
    // the composed cms_point column equals the driver-side d-way min
    val viaCol = Seq(7L, 42L).toDF("h")
      .crossJoin(vals.toDF("h2").agg(
        graft.functions.cms_sketch($"h2", d, w).as("c")))
      .select(graft.functions.cms_point($"c", $"h", d, w)).as[Long]
      .collect().toSeq
    val expect = Seq(7L, 42L).map(v => (0 until d)
      .map(i => reference(i * w + graft.functions.CmsUtil.bucket(v, i, w))).min)
    assert(viaCol === expect)
  }

  test("cms_sketch: negative hash inputs bucket like pmod (no negative index, agrees with cms_point)") {
    // the SQL registration accepts arbitrary longs; Scala % is
    // sign-preserving, so pre-fix a negative hash indexed the counter
    // matrix at a negative offset (AIOOBE mid-task) and disagreed
    // with the pmod-based query-side spelling (advisor r10)
    val (d, w) = (4, 64)
    val vals = Seq(-1L, -97L, Long.MinValue, Long.MinValue + 1, -7L, -7L, 5L)
    vals.foreach { h =>
      (0 until d).foreach { i =>
        val b = graft.functions.CmsUtil.bucket(h, i, w)
        assert(b >= 0 && b < w, s"h=$h row=$i bucket=$b out of [0,$w)")
      }
    }
    val sk = vals.toDF("h").agg(graft.functions.cms_sketch($"h", d, w).as("c"))
    val viaCol = Seq(-7L, Long.MinValue).toDF("h")
      .crossJoin(sk)
      .select(graft.functions.cms_point($"c", $"h", d, w)).as[Long]
      .collect().toSeq
    val counters = sk.as[Seq[Long]].head()
    val expect = Seq(-7L, Long.MinValue).map(v => (0 until d)
      .map(i => counters(i * w + graft.functions.CmsUtil.bucket(v, i, w))).min)
    assert(viaCol === expect)
    assert(viaCol.head >= 2L) // -7 inserted twice; CMS never under-counts
  }

  test("bounded-agg guard: fires at the default fallback threshold, silent in a harness session") {
    import graft.functions.ConfGuard
    val prevThresh = spark.conf.getOption(ConfGuard.ThresholdKey)
    val prevMode = spark.conf.getOption(ConfGuard.ModeKey)
    try {
      // default-conf session (threshold 128): the guard fires —
      // observable via the return value in warn mode, and as a
      // refusal in error mode, from BOTH the Column builder and the
      // SQL spelling
      spark.conf.unset(ConfGuard.ThresholdKey)
      assert(ConfGuard.checkBoundedAgg("spec"), "guard must fire at the 128 default")
      spark.conf.set(ConfGuard.ModeKey, "error")
      val e1 = intercept[IllegalStateException] {
        graft.functions.topk_by_score(lit(1.0), lit("k"), 3)
      }
      assert(e1.getMessage.contains(ConfGuard.ThresholdKey))
      intercept[IllegalStateException] {
        graft.functions.kmv_min_hashes(lit(1L), 4)
      }
      intercept[IllegalStateException] {
        graft.functions.cms_sketch(lit(1L), 2, 8)
      }
      graft.functions.registerAll(spark)
      val e2 = intercept[Exception] {
        spark.sql("SELECT cms_sketch(h, 2, 8) FROM (SELECT 1::LONG AS h)").collect()
      }
      assert(e2.getMessage.contains(ConfGuard.ThresholdKey) ||
        Option(e2.getCause).exists(_.getMessage.contains(ConfGuard.ThresholdKey)))
      // harness session (threshold raised): silent in every mode
      spark.conf.set(ConfGuard.ThresholdKey, ConfGuard.Recommended.toString)
      assert(!ConfGuard.checkBoundedAgg("spec"))
      graft.functions.topk_by_score(lit(1.0), lit("k"), 3) // no throw
      assert(spark.sql("SELECT size(kmv_min_hashes(h, 4)) FROM (SELECT 1::LONG AS h)")
        .collect().head.getInt(0) === 1)
      // guard=off silences even the hazardous default
      spark.conf.unset(ConfGuard.ThresholdKey)
      spark.conf.set(ConfGuard.ModeKey, "off")
      graft.functions.cms_sketch(lit(1L), 2, 8) // no throw
    } finally {
      prevThresh.fold(spark.conf.unset(ConfGuard.ThresholdKey))(
        spark.conf.set(ConfGuard.ThresholdKey, _))
      prevMode.fold(spark.conf.unset(ConfGuard.ModeKey))(
        spark.conf.set(ConfGuard.ModeKey, _))
    }
  }

  test("TopKBuffer inserts in place under ascending pressure") {
    // ascending input is the worst case for the in-place shift: every
    // accepted row lands at slot 0 and pushes the whole buffer right
    val a = graft.functions.TopKByScore(null, null, 5)
    val buf = a.createAggregationBuffer()
    (1 to 100).foreach { i =>
      buf.insert(i.toDouble,
        org.apache.spark.unsafe.types.UTF8String.fromString(f"k$i%03d"))
    }
    assert(buf.size === 5)
    assert(buf.scores.take(5).toSeq === Seq(100.0, 99.0, 98.0, 97.0, 96.0))
    assert(buf.keys.take(5).map(_.toString).toSeq ===
      Seq("k100", "k099", "k098", "k097", "k096"))
  }
}
