package graft

/** Pure-SQL API surface: a user of the engine can register the tables
  * as views and drive everything through `spark.sql`, including the
  * native functions and the custom aggregate. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("declared-query semantics reachable through spark.sql") {
    graft.functions.registerAll(spark)
    graft.io.Tables.events(spark, sf("sf0.001")).createOrReplaceTempView("events")
    graft.io.Tables.documents(spark, sf("sf0.001")).createOrReplaceTempView("documents")

    // windowed agg + ratio-avg + top-k, all in SQL
    val top = spark.sql(
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY 1 ORDER BY n DESC, event_type LIMIT 3""".stripMargin)
    assert(top.count() === 3)

    // native scalar functions from SQL
    val fn = spark.sql(
      """SELECT doc_id, simhash64(split(lower(text), '\\s+')) AS h
        |FROM documents LIMIT 5""".stripMargin)
    assert(fn.collect().forall(r => r.getLong(1) != 0L))

    // custom TypedImperativeAggregate from SQL
    val agg = spark.sql(
      """SELECT event_type,
        |  topk_by_score(CAST(value AS DOUBLE), CAST(event_id AS STRING), 2) AS top2
        |FROM events GROUP BY 1""".stripMargin)
    val rows = agg.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val arr = r.getSeq[org.apache.spark.sql.Row](1)
      assert(arr.length === 2)
      assert(arr(0).getDouble(0) >= arr(1).getDouble(0))
    }
  }

  test("IVF/LSH native functions reachable from SQL with literal tables") {
    graft.functions.registerAll(spark)
    graft.io.Tables.embeddings(spark, sf("sf0.01"))
      .createOrReplaceTempView("embeddings")
    // the table argument must be a FOLDABLE literal (HOF-built arrays
    // are not foldable at function-resolution time)
    def arr(vals: Seq[Double]) = vals.map(v => s"${v}D").mkString("array(", ",", ")")
    // nearest_centroid over a 2-cell literal quantizer: total split
    val c1 = arr(Seq.fill(64)(0.5)); val c2 = arr(Seq.fill(64)(-0.5))
    val cells = spark.sql(
      s"SELECT nearest_centroid(embedding, array($c1, $c2)) AS cell FROM embeddings")
    val seen = cells.distinct().collect().map(_.getInt(0)).toSet
    assert(seen.subsetOf(Set(0, 1)) && seen.nonEmpty, s"cells: $seen")
    // sign_lsh_bucket over 2 literal planes: buckets in [0, 4)
    val p1 = arr((1 to 64).map(_ / 64.0))
    val p2 = arr((1 to 64).map(i => 1.0 - i / 32.0))
    val buckets = spark.sql(
      s"SELECT sign_lsh_bucket(embedding, array($p1, $p2)) AS b FROM embeddings")
    assert(buckets.collect().forall { r => val b = r.getLong(0); b >= 0 && b < 4 })
  }

  test("r14–r16 lanes from SQL: url_canonicalize/registered_domain, dsir_buckets, MMR candidate topk") {
    graft.functions.registerAll(spark)
    // URL canonicalize + PSL registered domain: SQL == Column API
    Seq("https://WWW.Example.co.uk:443/a/B?utm_source=x&q=1#frag",
      "http://site.com:80", "https://sub.shop.example.com/p?gclid=1&a=2")
      .toDF("url").createOrReplaceTempView("urls")
    val viaSql = spark.sql(
      """SELECT url_canonicalize(url) AS cu,
        |  registered_domain(url_canonicalize(url)) AS dom FROM urls"""
        .stripMargin).as[(String, String)].collect().toSeq
    val viaApi = spark.table("urls")
      .select(ops.Urls.urlCanonicalize($"url").as("cu"))
      .select($"cu", ops.Urls.registeredDomain($"cu").as("dom"))
      .as[(String, String)].collect().toSeq
    assert(viaSql == viaApi)
    // the semantics, not just agreement: default port + tracking
    // params stripped, multi-label public suffix resolved
    assert(viaSql.head._1 == "https://www.example.co.uk/a/B?q=1")
    assert(viaSql.head._2 == "example.co.uk")
    assert(viaSql(2)._2 == "example.com")
    // DSIR feature buckets: SQL == Column API over real documents
    graft.io.Tables.documents(spark, sf("sf0.001"))
      .createOrReplaceTempView("documents")
    val bSql = spark.sql(
      """SELECT doc_id, dsir_buckets(CASE WHEN length(trim(text)) = 0
        |  THEN array() ELSE split(trim(lower(text)),
        |  '[ \\t\\n\\r\\f\\x0B]+') END) AS bs
        |FROM documents ORDER BY doc_id LIMIT 20""".stripMargin)
      .as[(Long, Seq[Long])].collect().toSeq
    val bApi = graft.io.Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id",
        ops.Dsir.featureBucketsOf(ops.TextOps.tokens($"text")).as("bs"))
      .orderBy("doc_id").limit(20).as[(Long, Seq[Long])].collect().toSeq
    assert(bSql == bApi)
    assert(bSql.exists(_._2.nonEmpty))
    assert(bSql.forall(_._2.forall(b => b >= 0 && b < ops.Dsir.DsirBuckets)))
    // MMR's serving primitive from SQL: the bounded-state per-query
    // candidate cut (topk_by_score over a grouped candidate frame)
    Seq((1L, 0.9, "a"), (1L, 0.7, "b"), (1L, 0.8, "c"),
      (2L, 0.1, "d"), (2L, 0.3, "e"))
      .toDF("q_id", "score", "key").createOrReplaceTempView("cands")
    val cut = spark.sql(
      """SELECT q_id, transform(topk_by_score(score, key, 2), x -> x.key)
        |  AS picks FROM cands GROUP BY q_id ORDER BY q_id""".stripMargin)
      .as[(Long, Seq[String])].collect().toSeq
    assert(cut == Seq((1L, Seq("a", "c")), (2L, Seq("e", "d"))))
  }

  test("every registerAll function resolves and executes via spark.sql") {
    // VERDICT r17 #6: enumerate the REGISTRY, not a hand-picked lane
    // list — the registered-name set is diffed against this smoke
    // table both ways, so a future function registered without a
    // smoke here (or a smoke for a function that was dropped) fails
    // the suite instead of silently shipping Column-API-only.
    // diff the SESSION registry against Spark's static builtin one:
    // registerAll may already have run in this session (other tests
    // share it), so a before/after snapshot would read empty
    graft.functions.registerAll(spark)
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry
      .builtin.listFunction().map(_.funcName).toSet
    val registered = spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName).toSet.diff(builtin)
    // one smoke per registered function: runs through spark.sql,
    // returns ≥1 row with a non-null function output
    val fvec = "CAST(array(1.0, 0.0, 2.0) AS array<float>)"
    val smoke: Map[String, String] = Map(
      "simhash64" -> "SELECT simhash64(array('a','b','c')) AS v",
      "simhash60_md5" -> "SELECT simhash60_md5(array('a','b','c')) AS v",
      "cosine_sim" -> s"SELECT cosine_sim($fvec, $fvec) AS v",
      "dot_product" -> s"SELECT dot_product($fvec, $fvec) AS v",
      "drop_chrome" ->
        "SELECT drop_chrome('<html><nav>x</nav><p>body text</p></html>') AS v",
      "topk_by_score" ->
        ("SELECT topk_by_score(s, k, 2) AS v FROM " +
          "VALUES (1.0D, 'a'), (2.0D, 'b'), (3.0D, 'c') AS t(s, k)"),
      "kmv_min_hashes" ->
        ("SELECT kmv_min_hashes(h, 2) AS v FROM " +
          "VALUES (1L), (2L), (3L) AS t(h)"),
      "cms_sketch" ->
        "SELECT cms_sketch(h, 2, 16) AS v FROM VALUES (1L), (2L) AS t(h)",
      "hdr_sketch" ->
        "SELECT hdr_sketch(h) AS v FROM VALUES (8L), (16L) AS t(h)",
      "ngram_hash_explode" ->
        "SELECT ngram_hash_explode(array('a','b','c','d')) AS v",
      "ngram_hashes" ->
        "SELECT ngram_hashes(array('a','b','c','d'), 3) AS v",
      "nearest_centroid" ->
        (s"SELECT nearest_centroid($fvec, " +
          "array(array(1.0D, 0.0D, 2.0D), array(-1.0D, 0.0D, -2.0D))) AS v"),
      "sign_lsh_bucket" ->
        (s"SELECT sign_lsh_bucket($fvec, " +
          "array(array(1.0D, 0.0D, 2.0D), array(-1.0D, 0.5D, -2.0D))) AS v"),
      "url_canonicalize" ->
        "SELECT url_canonicalize('https://WWW.Example.com:443/a?utm_source=x&q=1') AS v",
      "registered_domain" ->
        "SELECT registered_domain('https://sub.example.co.uk/p') AS v",
      "dsir_buckets" ->
        "SELECT dsir_buckets(array('alpha','beta','gamma')) AS v")
    assert(registered === smoke.keySet,
      s"registry/smoke drift — missing smokes: ${registered.diff(smoke.keySet)}, " +
        s"stale smokes: ${smoke.keySet.diff(registered)}")
    smoke.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      val rows = spark.sql(sql).collect()
      assert(rows.nonEmpty, s"$name: smoke returned no rows")
      assert(rows.forall(r => !r.isNullAt(0)), s"$name: smoke output is NULL")
    }
  }

  test("approx_count_distinct tracks the exact global distinct within HLL++ error") {
    // the approximate sketch can't be oracle-hashed (Spark's HLL++ !=
    // DuckDB's); bound it against q_distinct_approx's exact twin here
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct}
    val row = graft.io.Tables.events(spark, sf("sf0.01"))
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", 0.02).as("approx"))
      .head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx $approx drifted beyond 5% of exact $exact")
  }
}
