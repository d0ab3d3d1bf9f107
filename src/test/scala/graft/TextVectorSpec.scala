package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextOps, VectorOps}

/** Text-dedup and vector-similarity operator properties. */
class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.01")

  test("exact dedup groups identical normalized text") {
    val docs = Seq(
      (1L, "Hello   World", "en", "s", 11L),
      (2L, "hello world", "en", "s", 11L),
      (3L, "different doc", "en", "s", 13L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("dedup_fixture")
    val r = docs
      .select(md5(TextOps.normText($"text")).as("h"), $"doc_id")
      .groupBy($"h").agg(min($"doc_id").as("keep"), count(lit(1)).as("n"))
      .collect().map(x => x.getAs[Long]("keep") -> x.getAs[Long]("n")).toMap
    assert(r === Map(1L -> 2L, 3L -> 1L))
  }

  test("shingles: <3 tokens yields whole text, >=3 yields n-2 distinct grams") {
    val r = Seq((1L, "a b"), (2L, "a b c d")).toDF("id", "text")
      .select($"id", TextOps.shingles(TextOps.tokens($"text")).as("sh"))
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1)).toMap
    assert(r(1L) === Seq("a b"))
    assert(r(2L) === Seq("a b c", "b c d"))
  }

  test("jaccard is 1 for identical sets, 0 for disjoint") {
    val df = Seq(
      (Seq("x", "y"), Seq("x", "y")),
      (Seq("x"), Seq("z"))).toDF("a", "b")
      .select(TextOps.jaccard($"a", $"b").as("j")).as[Double].collect()
    assert(df.toSeq === Seq(1.0, 0.0))
  }

  test("minhash LSH candidates contain every high-jaccard pair (recall)") {
    // LSH with 4 bands x 4 rows catches j>=0.5 pairs w.h.p.; on this
    // dataset the exact ground-truth pairs must all be found.
    val truth = SparkEntry.queries("q_ngram_jaccard")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = SparkEntry.queries("q_minhash_dedup")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(lsh), s"missed: ${truth.diff(lsh)}")
  }

  test("maxBucket cap bounds candidates one-sided: every doc still verifies against retained members") {
    // three identical docs land in the same band buckets; with cap=1
    // only doc 1 is RETAINED per bucket, but docs 2 and 3 must still
    // be verified against it (streaming-cap semantics: membership is
    // capped, verification never skipped). Pairs: (1,2),(1,3) survive;
    // only the beyond-cap×beyond-cap pair (2,3) is sacrificed.
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, txt), (2L, txt), (3L, txt)).toDF("doc_id", "text")
    def pairs(cap: Option[Int]) = TextOps.minhashPairsOf(docs, cap)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs(None) === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs(Some(1)) === Set((1L, 2L), (1L, 3L)),
      "capped form must keep every retained-member pair (one-sided cap)")
  }

  test("cosine: orthogonal=0, identical=1, halved magnitude still 1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 2f), Seq(1f, 2f)),
      (Seq(2f, 4f), Seq(1f, 2f))).toDF("a", "b")
      .select(graft.ops.Util.roundTo(VectorOps.cosine($"a", $"b"), 9).as("c"))
      .as[Double].collect()
    assert(df.toSeq === Seq(0.0, 1.0, 1.0))
  }

  test("similarity topk returns k descending unique ids") {
    val r = SparkEntry.queries("q_similarity_topk")(spark, dir).collect()
    assert(r.length === 10)
    val sims = r.map(_.getAs[Double]("cos_sim"))
    assert(sims.sorted.reverse.toSeq === sims.toSeq)
    assert(r.map(_.getAs[Long]("vec_id")).distinct.length === 10)
  }

  test("lang id picks marker-majority language deterministically") {
    val docs = Seq(
      (1L, "the cat and the dog is a pet", "x", "s", 1L),
      (2L, "el perro la casa que es", "x", "s", 1L),
      (3L, "zzz qqq www", "x", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("documents_fixture")
    // run the same expression chain as q_lang_id over the fixture
    val toks = TextOps.tokens($"text")
    val scored = TextOps.langMarkers.foldLeft(docs.select($"doc_id", toks.as("toks"))) {
      case (df, (lang, words)) =>
        df.withColumn(s"hits_$lang", size(filter($"toks", t => t.isInCollection(words))))
    }
    val best = TextOps.langMarkers.map { case (lang, _) =>
      struct(col(s"hits_$lang").as("hits"), lit(lang).as("lang")) }
    val r = scored.withColumn("best",
        aggregate(array(best: _*), struct(lit(-1).as("hits"), lit("zzz").as("lang")),
          (acc, x) => when(x.getField("hits") > acc.getField("hits") ||
            (x.getField("hits") === acc.getField("hits") &&
              x.getField("lang") < acc.getField("lang")), x).otherwise(acc)))
      .select($"doc_id",
        when($"best.hits" > 0, $"best.lang").otherwise(lit("und")).as("pred"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) === "en")
    assert(r(2L) === "es")
    assert(r(3L) === "und")
  }

  test("hot-shingle df-cap: high cap is a no-op, low cap prunes the hot join keys") {
    val dir = sf("sf0.01")
    val default = TextOps.ngramJaccardPairs(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    // cap far above testdata max df (7 at sf0.01): identical result
    val high = TextOps.ngramJaccardPairs(spark, dir, dfCap = 1000)
      .as[(Long, Long, Double)].collect().toSet
    assert(high === default)
    // cap of 1: every shared shingle is "hot", so the join input is
    // empty and no pairs survive — proves the cap reaches the join
    val one = TextOps.ngramJaccardPairs(spark, dir, dfCap = 1)
      .as[(Long, Long, Double)].collect()
    assert(one.isEmpty)
    // intermediate cap: result is a subset of the uncapped pairs
    // (dropping join keys can only reduce common counts)
    val mid = TextOps.ngramJaccardPairs(spark, dir, dfCap = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(mid.map(p => (p._1, p._2)).subsetOf(default.map(p => (p._1, p._2))))
  }

  test("dedup clusters: connected-component invariants hold on testdata") {
    val dir = sf("sf0.01")
    val pairs = TextOps.minhashPairs(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val rep = SparkEntry.queries("q_dedup_clusters")(spark, dir)
      .select($"doc_id", $"cluster_rep", $"cluster_size")
      .as[(Long, Long, Long)].collect()
    val repOf = rep.map(r => r._1 -> r._2).toMap
    // every near-dup pair landed in the same cluster (transitive closure)
    pairs.foreach { case (a, b) =>
      assert(repOf(a) === repOf(b), s"pair ($a,$b) split across clusters") }
    // representative is the min member of its cluster
    rep.groupBy(_._2).foreach { case (r, members) =>
      assert(members.map(_._1).min === r, s"rep $r not the min member") }
    // sizes are consistent and singletons are their own keeper
    rep.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.toSeq === Seq(members.length.toLong)) }
    // there is at least one non-trivial (size >= 3) chain in the data
    // or, if not, every pair at least formed a 2-cluster
    assert(rep.exists(_._3 >= 2), "no clusters formed though pairs exist")
  }

  test("connectedComponents labels a 33-node chain in O(log d) rounds") {
    // path graph 0-1-…-32: diameter 32. Plain min-propagation needs 32
    // rounds; pointer jumping must land well under 10 (≈ log2(32) + a
    // confirmation round). maxRounds = 10 doubles as the bound check —
    // the operator throws if it needs more.
    val chain = (0 until 32).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val labels = ops.Graph.connectedComponents(chain, maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(labels.size === 33)
    assert(labels.values.forall(_ === 0L), "all chain nodes must label to node 0")
    // two disjoint components resolve independently
    val two = ((0 until 5).map(i => (i.toLong, i.toLong + 1)) ++
      (10 until 15).map(i => (i.toLong, i.toLong + 1))).toDF("id_a", "id_b")
    val l2 = ops.Graph.connectedComponents(two).as[(Long, Long)].collect().toMap
    assert((0 to 5).forall(i => l2(i.toLong) === 0L))
    assert((10 to 15).forall(i => l2(i.toLong) === 10L))
  }

  test("connectedComponents throws on non-convergence instead of emitting wrong labels") {
    val chain = (0 until 16).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      ops.Graph.connectedComponents(chain, maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("chunkDocs: overlap arithmetic, short tails, and empty docs (ANSI-safe)") {
    // 100 tokens → starts 0,48,96 → lengths 64,52,4; empty / whitespace
    // docs must yield ONE empty chunk, not an ANSI element_at crash
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")),
      (2L, ""),
      (3L, "   ")).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs)
      .as[(Long, Int, Int, Option[String])].collect()
      .sortBy(r => (r._1, r._2))
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)) ===
      Seq((0, 64, Some("t1")), (1, 52, Some("t49")), (2, 4, Some("t97"))))
    Seq(2L, 3L).foreach { d =>
      assert(out.filter(_._1 == d) === Seq((d, 0, 0, None)),
        s"doc $d must yield one empty chunk")
    }
  }

  test("connectedComponents on an empty pair set returns no labels") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(ops.Graph.connectedComponents(empty).count() === 0L)
  }

  test("connectedComponents tolerates self-loops, duplicate edges, and null ids") {
    val messy = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L), (3L, 3L))
      .toDF("id_a", "id_b")
    val labels = ops.Graph.connectedComponents(messy)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    val withNulls = Seq((Some(1L), Some(2L)), (None, Some(9L)), (Some(9L), None))
      .toDF("id_a", "id_b")
    val l2 = ops.Graph.connectedComponents(withNulls)
      .as[(Long, Long)].collect().toMap
    assert(l2 === Map(1L -> 1L, 2L -> 1L), s"null endpoints must be dropped: $l2")
  }

  test("rep-quality flags repetitive docs and keeps diverse ones") {
    val rows = graft.SparkEntry.queries("q_rep_quality")(spark, dir).collect()
    assert(rows.length === 500)
    // metrics are well-formed fractions
    rows.foreach { r =>
      val dr = r.getDouble(2); val tf = r.getDouble(3); val db = r.getDouble(4)
      assert(dr >= 0 && dr <= 1 && tf >= 0 && tf <= 1 && db >= 0 && db <= 1,
        s"metric out of range: $r")
    }
    // the 30-word-vocab corpus must produce BOTH outcomes, or the
    // thresholds are vacuous
    val kept = rows.count(_.getBoolean(5))
    assert(kept > 0 && kept < rows.length,
      s"keep split degenerate: $kept of ${rows.length}")
  }

  test("decontaminate splits sides correctly and catches a planted copy") {
    val rows = graft.SparkEntry.queries("q_decontaminate")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (docId, evalId, shared) =>
      assert(docId % 97 != 0, s"eval doc $docId flagged as corpus")
      assert(evalId % 97 == 0, s"non-eval doc $evalId on the eval side")
      assert(shared >= 3)
    }
    // planted-copy recall on a CorpusGenerator corpus (the driver
    // testdata has no exact dups): id 8 copies block base 0, and
    // 0 % 97 == 0 puts the base in the eval set — the copy must be hit
    val tmp = java.nio.file.Files.createTempDirectory("graft_decon").toString
    tools.CorpusGenerator.write(spark, tmp, 500L)
    val planted = graft.SparkEntry.queries("q_decontaminate")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(planted.contains((8L, 0L)),
      s"planted exact copy (8 of eval 0) missed: ${planted.take(8).toSeq}")
  }

  test("training-shard export: keepers only, deterministic shards, chunk math matches") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val keepers = TextOps.corpusPipelineKeepers(spark, dir)
    TextOps.writeTrainingShards(
      graft.io.Tables.documents(spark, dir), keepers, s"$out/shards", nShards = 8)
    val shards = spark.read.parquet(s"$out/shards")
    // only selected docs appear, and every selected doc appears
    val shardDocs = shards.select($"doc_id").distinct().as[Long].collect().toSet
    val keeperIds = keepers.select($"doc_id").as[Long].collect().toSet
    assert(shardDocs === keeperIds)
    // chunk counts match the declared chunking math for the same docs
    val wantChunks = TextOps.chunkDocs(
        graft.io.Tables.documents(spark, dir)
          .join(keepers.select("doc_id"), Seq("doc_id"), "left_semi"))
      .count()
    assert(shards.count() === wantChunks)
    // shard assignment is within range and a rewrite is idempotent
    assert(shards.select($"shard").distinct().as[Int].collect()
      .forall(s => s >= 0 && s < 8))
    TextOps.writeTrainingShards(
      graft.io.Tables.documents(spark, dir), keepers, s"$out/shards", nShards = 8)
    // re-read: the overwrite replaced the files the old plan listed
    val rewritten = spark.read.parquet(s"$out/shards")
    assert(rewritten.count() === wantChunks, "rewrite changed the shard store")
    // chunk text is real tokens: non-empty for every row
    assert(rewritten.filter(length($"chunk_text") === 0).count() === 0L)
  }

  test("int8 quantized cosine tracks the exact cosine closely") {
    val rows = graft.SparkEntry.queries("q_embed_quant")(spark, dir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val exact = r.getDouble(1); val q8 = r.getDouble(2)
      assert(math.abs(exact - q8) < 0.01,
        s"quantization error too large: exact=$exact q8=$q8")
    }
  }

  test("mixtureSample: sqrt-temperature rates, tail keeps all, exact hash replay") {
    import graft.ops.TextOps
    // skewed language mix: 400 / 100 / 25 docs
    val docs = spark.createDataFrame(
      (0L until 525L).map { id =>
        val lang = if (id < 400) "aa" else if (id < 500) "bb" else "cc"
        (id, lang, s"text $id")
      }).toDF("doc_id", "lang", "text")
    val got = TextOps.mixtureSample(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // rate table: floor(10000*sqrt(25/c))
    val rates = got.map(r => r._2 -> r._3).toMap
    assert(rates === Map("aa" -> 2500, "bb" -> 5000, "cc" -> 10000))
    // the tail language keeps every document (rate 10000 > any pmod)
    assert(got.count(_._2 == "cc") === 25)
    // exact driver-side replay of the salted-hash decision
    val md = java.security.MessageDigest.getInstance("MD5")
    def keep(id: Long, rateBp: Int): Boolean = {
      val hex = md.digest(s"mix:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 10000 < rateBp
    }
    val expected = (0L until 525L).flatMap { id =>
      val (lang, rate) =
        if (id < 400) ("aa", 2500) else if (id < 500) ("bb", 5000)
        else ("cc", 10000)
      if (keep(id, rate)) Some((id, lang, rate)) else None
    }
    assert(got.toSeq === expected,
      "mixture sample diverged from the exact hash replay")
    // deterministic: a second evaluation keeps the same docs
    val again = TextOps.mixtureSample(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(again.toSeq === got.toSeq)
  }

  test("shardInterleave: driver-replayed order, balanced stripes, interleaved windows") {
    import graft.ops.TextOps
    // two sources, heavily imbalanced input ORDER (all of src-a
    // first): the interleave must still mix them inside every window
    val docs = spark.createDataFrame(
      (0L until 600L).map { id =>
        (id, "aa", if (id < 400) "srcA" else "srcB")
      }).toDF("doc_id", "lang", "source")
    val got = TextOps.shardInterleave(docs, nShards = 4, buckets = 64)
      .orderBy($"shard", $"pos")
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(4)))
    assert(got.length === 600)
    // exact driver-side replay: hash order → round-robin stripes —
    // the bucket decomposition must be invisible in the result
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = {
      val hex = md.digest(s"il:il0:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = (0L until 600L).sortBy(id => (h(id), id)).zipWithIndex
      .map { case (id, p) => (id, p % 4, (p / 4).toLong) }
      .sortBy(t => (t._2, t._3))
    assert(got.toSeq === expected, "interleave diverged from the hash replay")
    // stripes are balanced to ±1 by construction
    val sizes = got.groupBy(_._2).map(_._2.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced stripes: $sizes")
    // every 50-doc window of every shard carries BOTH sources near
    // their global 2:1 rate (the contiguous-run pathology is dead):
    // deterministic data + hash → this is a fixed, not a flaky, bound
    val bySrc = (0L until 600L).map(id =>
      id -> (if (id < 400) "srcA" else "srcB")).toMap
    got.groupBy(_._2).foreach { case (shard, rows) =>
      rows.sortBy(_._3).map(r => bySrc(r._1)).grouped(50).foreach { w =>
        val a = w.count(_ == "srcA").toDouble / w.length
        assert(a > 0.4 && a < 0.9,
          s"shard $shard window composition $a strayed from the 2/3 rate")
      }
    }
    // partitioning-invariant: a repartitioned input elects the same layout
    val again = TextOps.shardInterleave(docs.repartition(13), nShards = 4,
      buckets = 64).collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(4)))
      .sortBy(t => (t._2, t._3))
    assert(again.toSeq === got.toSeq)
  }

  test("packSequences: two-phase prefix sum matches the sequential packing") {
    import graft.ops.TextOps
    // uneven doc lengths incl. one spanning several examples and one
    // empty doc (contributes nothing), over enough rows to span many
    // range partitions
    val docs = spark.createDataFrame(
      (0L until 500L).map { id =>
        val words =
          if (id == 7L) "" // empty doc drops out
          else ("w " * (1 + (id * 37 % 23)).toInt).trim +
            (if (id == 100L) " x" * 90 else "")
        (id, words)
      }).toDF("doc_id", "text")
    val got = TextOps.packSequences(docs, contextLen = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // sequential reference packing
    val seqRef = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long)]
    var off = 0L
    (0L until 500L).foreach { id =>
      val n =
        if (id == 7L) 0L
        else (1 + (id * 37 % 23)) + (if (id == 100L) 90L else 0L)
      if (n >= 1) {
        val fe = off / 16
        val le = (off + n - 1) / 16
        seqRef += ((id, n, off, off + n, fe, le, le - fe + 1))
        off += n
      }
    }
    assert(got.toSeq === seqRef.toSeq,
      "distributed prefix-sum packing diverged from sequential packing")
    // offsets are gapless and the example stream is contiguous
    assert(got.head._3 === 0L)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 === a._4, s"gap between docs ${a._1} and ${b._1}")
    }
    // the multi-example doc really spans > 1 example
    val big = got.find(_._1 == 100L).get
    assert(big._7 > 1, "planted long doc did not span multiple examples")
  }
  test("budgetSelect: maximal quality-ordered prefix within the token budget") {
    import graft.ops.TextOps
    val dir = sf("sf0.001")
    val docs = graft.io.Tables.documents(spark, dir)
    val got = TextOps.budgetSelect(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // reference: sequential selection over the scored frame
    val scored = TextOps.scoredDocs(docs, withDigest = false)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("quality_score"),
        org.apache.spark.sql.functions.col("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2).toLong))
      .filter(_._3 >= 1)
    val budget = scored.map(_._3).sum / 2
    val ordered = scored.sortBy { case (id, q, _) => (-q, id) }
    // STRICT prefix rule: cum runs over ALL docs in order; the first
    // overflow ends the selection (monotone cum — nothing after fits)
    val ref = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long, Long)]
    var cum = 0L
    ordered.foreach { case (id, q, n) =>
      cum += n
      if (cum <= budget) ref += ((id, q, n, cum))
    }
    assert(got.toSeq === ref.toSeq,
      "distributed budget selection diverged from the sequential rule")
    // the budget binds: kept total <= budget < kept total + first drop
    assert(got.map(_._3).sum <= budget)
    val kept = got.map(_._1).toSet
    val firstDropped = ordered.find(d => !kept.contains(d._1))
    firstDropped.foreach { d =>
      assert(got.map(_._3).sum + d._3 > budget,
        "the first dropped doc would still have fit — prefix rule violated")
    }
  }

  test("q_dedup_recall contract: hits bounded by both legs, recall = hits/truth") {
    val dir = sf("sf0.001")
    val r = SparkEntry.queries("q_dedup_recall")(spark, dir).collect()
    assert(r.length === 1)
    val (truth, cand, hits, recall) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getDouble(3))
    assert(hits <= truth && hits <= cand)
    if (truth > 0)
      assert(recall ===
        math.floor(hits.toDouble / truth * 1e6 + 0.5) / 1e6)
    else assert(recall === 1.0)
    // the fixture has real near-dups: an empty truth set would make
    // this gauge vacuous
    assert(truth > 0, "no exact near-dup pairs at sf0.001 — vacuous recall")
    // the capped gauge can only lose candidates (one-sided cap):
    // hits and candidates are bounded by the uncapped run
    val c = SparkEntry.queries("q_dedup_recall_capped")(spark, dir).collect()(0)
    assert(c.getLong(0) === truth) // same truth set
    assert(c.getLong(1) <= cand && c.getLong(2) <= hits)
  }

  test("capped recall gauge DETECTS cap-induced loss under mass duplication") {
    import spark.implicits._
    // 200 byte-identical docs: one LSH bucket of 200 in every band;
    // CapBucket=64 keeps only the first 64 as left candidates, so the
    // capped pipeline structurally cannot reach the C(200,2) truth —
    // exactly the loss this gauge exists to surface
    val tmp = java.nio.file.Files.createTempDirectory("recall_gauge").toString
    (0L until 200L).map { id =>
      val text = "the quick spark stream merges every window batch cleanly"
      (id, text, "en", "srcA", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val un = SparkEntry.queries("q_dedup_recall")(spark, tmp).collect()(0)
    val cp = SparkEntry.queries("q_dedup_recall_capped")(spark, tmp).collect()(0)
    assert(un.getLong(0) === 199L * 200 / 2) // C(200,2) truth pairs
    assert(un.getDouble(3) === 1.0, "uncapped banding must find every pair")
    assert(cp.getLong(0) === un.getLong(0)) // identical truth set
    assert(cp.getDouble(3) < 1.0,
      "the cap bound this corpus — recall must read below 1, not mask the loss")
    assert(cp.getLong(2) < un.getLong(2))
  }

  test("leakage split: near-dup cluster members never straddle a split") {
    val r = SparkEntry.queries("q_leakage_split")(spark, dir)
    val perCluster = r.groupBy($"cluster_rep")
      .agg(countDistinct($"split").as("n"), count(lit(1)).as("m"))
      .persist()
    // the leakage property: every cluster resolves to exactly ONE split
    assert(perCluster.filter($"n" =!= 1).count() === 0L,
      "a near-dup cluster straddles a split boundary")
    // non-vacuous: the corpus really has multi-member clusters
    assert(perCluster.filter($"m" > 1).count() > 0L)
    perCluster.unpersist(false)
    val splits = r.groupBy($"split").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits("train") > splits.getOrElse("val", 0L) &&
      splits("train") > splits.getOrElse("test", 0L))
  }

  test("q_kmv_overlap estimates track the exact cross-source Jaccard") {
    // the audit leg deliberately NOT in the declared query (distinct +
    // h-self-join is 4× the sketch's cost and corpus-quadratic
    // pressure at scale) — the estimator's accuracy is pinned here
    val est = SparkEntry.queries("q_kmv_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(est.size > 10, s"expected many source pairs, got ${est.size}")
    val du = graft.io.Tables.documents(spark, dir)
      .select($"source", explode(TextOps.shingleHashes(
        TextOps.shingles(TextOps.tokens($"text")))).as("h"))
      .distinct()
    val cnt = du.groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val inter = du.select($"source".as("sa"), $"h")
      .join(du.select($"source".as("sb"), $"h"), Seq("h"))
      .filter($"sa" < $"sb")
      .groupBy($"sa", $"sb").count()
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    // k=256 k-min over the union → std error ≈ 1/√k ≈ 6% of the
    // union size; at these Jaccard levels (~0.02-0.05) that is an
    // absolute tolerance of a few percentage points
    est.foreach { case ((a, b), e) =>
      val ni = inter.getOrElse((a, b), 0L).toDouble
      val exact = ni / (cnt(a) + cnt(b) - ni)
      assert(math.abs(e - exact) < 0.04,
        s"pair ($a,$b): est $e vs exact $exact")
    }
  }
}
