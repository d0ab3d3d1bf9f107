package graft

import org.apache.spark.sql.functions._
import graft.ops.{Retrieval, VectorOps}

/** Retrieval/quality-operator properties: BM25 ranking arithmetic, the
  * bigram-LM perplexity gate, PII redaction end-to-end, and the
  * SemDeDup greedy rule under mass duplication. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** hash60(token) mod 64 — the hashed-embedding dimension, one
    * spelling for both hybrid-search tests. */
  private def dimOf(t: String): Long =
    java.lang.Long.parseLong(md5Hex(t).substring(0, 15), 16) % 64

  // ---------------- BM25 ----------------

  test("bm25: tf raises, absence excludes, ranking is dense from 1") {
    val docs = Seq(
      (1L, "cat dog"),
      (2L, "cat cat cat dog"),
      (3L, "dog dog")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25TopK(docs, Seq("cat"), 10)
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getLong(2)))
    // doc 3 has no query term — absent; doc 2 has higher tf — first
    assert(r.map(_._1).toSeq === Seq(2L, 1L))
    assert(r.map(_._3).toSeq === Seq(1L, 2L))
    assert(r(0)._2 > r(1)._2)
    // hand-check doc 1: idf = ln(1 + (3-2+0.5)/(2+0.5)), tf=1, dl=2,
    // avgdl=8/3 — same roundTo(…,6)-then-4 discipline as the operator
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    val c1 = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 2 / (8.0 / 3)))
    val exp = math.floor(math.floor(c1 * 1e6 + 0.5) / 1e6 * 1e4 + 0.5) / 1e4
    assert(r(1)._2 === exp)
  }

  test("bm25: length normalization — equal tf, longer doc scores lower") {
    val docs = Seq(
      (1L, "cat x"),
      (2L, "cat x x x x x")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25TopK(docs, Seq("cat"), 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > r(2L))
  }

  test("bm25 batch: per-query top-k, self-excluded, repeated terms weight double") {
    // doc 0 is the only query (id % 100 == 0, ≥9 tokens): terms at
    // positions 1/5/9 = cat/cat/dog — "cat" counts twice
    val docs = Seq(
      (0L, "cat a b c cat d e f dog x"),
      (1L, "cat dog e"),
      (2L, "cat q r"),
      (3L, "zzz yyy")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25Batch(docs, 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    // the query doc itself is excluded; doc 3 matches nothing
    assert(r.forall(_._1 == 0L))
    assert(!r.map(_._3).contains(0L) && !r.map(_._3).contains(3L))
    assert(r.map(_._2).toSeq === Seq(1L, 2L))
    // doc 1 (cat + dog) outranks doc 2 (cat only)
    assert(r(0)._3 === 1L && r(1)._3 === 2L)
    assert(r(0)._4 > r(1)._4)
    // doc 2's score doubles the single-term contribution: "cat" is a
    // repeated query term (positions 1 and 5)
    val single = Retrieval.bm25TopK(docs, Seq("cat"), 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // same corpus stats; doc 2's batch score = 2 × its one-term
    // contribution (round-6 contributions summed exactly in decimal)
    assert(math.abs(r(1)._4 - 2 * single(2L)) < 2e-4)
  }

  // ---------------- bigram-LM perplexity ----------------

  test("lm perplexity: seen bigrams score below unseen, exact add-one value") {
    // train = even doc_ids: "a b a b a" → c2(a,b)=2, c2(b,a)=2,
    // c1(a)=2, c1(b)=2, V=2
    val docs = Seq(
      (0L, "a b a b a"),
      (1L, "a b"),
      (3L, "b b"),
      (5L, "solo")
    ).toDF("doc_id", "text")
    val r = Retrieval.lmPerplexity(docs)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    val byId = r.map(t => t._1 -> t).toMap
    // <2-token doc yields no bigrams and no row
    assert(!byId.contains(5L))
    // doc 1: one bigram (a,b): -ln((2+1)/(2+2)) = ln(4/3)
    val nll = math.floor(-math.log(3.0 / 4.0) * 1e6 + 0.5) / 1e6
    val exp = math.floor(nll * 1e4 + 0.5) / 1e4
    assert(byId(1L)._3 === exp)
    // doc 3's (b,b) is unseen → strictly higher nll than doc 1
    assert(byId(3L)._3 > byId(1L)._3)
    assert(byId(0L)._2 === 4L) // 4 bigrams in the training doc
  }

  // ---------------- PII redaction ----------------

  test("pii: counts match plants and redaction leaves no residue") {
    // doc_id ≡ 3 (mod 5) appends nothing — the text is the fixture
    val docs = Seq(
      (3L, "mail a@b.com and 10.1.2.3 then call +1-555-0042 done"),
      (8L, "clean text no pii")
    ).toDF("doc_id", "text")
    val r = Retrieval.piiRedact(docs)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4))).toMap
    assert(r(3L)._1 === 1L); assert(r(3L)._2 === 1L); assert(r(3L)._3 === 1L)
    assert(r(8L) === ((0L, 0L, 0L, md5Hex("clean text no pii"))))
    assert(r(3L)._4 ===
      md5Hex("mail <EMAIL> and <IP> then call <PHONE> done"))
  }

  test("pii: email matched inside the ip-redacted form does not double-redact") {
    // the phone plant for doc_id ≡ 2 (mod 5) carries BOTH an email and
    // a phone — the fixture path through piiText must count 2 emails
    // for a doc that already has one
    val docs = Seq((2L, "reach x@y.org today")).toDF("doc_id", "text")
    val r = Retrieval.piiRedact(docs).collect()(0)
    assert(r.getLong(1) === 2L) // x@y.org + planted ops2@example.org
    assert(r.getLong(3) === 1L) // planted +1-555-0002
  }

  // ---------------- feature-hashed embeddings ----------------

  test("hash embed: token mass lands deterministically in hash60(token) mod 64") {
    val docs = Seq((1L, "aa bb"), (2L, "aa")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("he_fixture")
    def dimOf(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 64
    }
    // run the same shape the declared query uses, over the fixture
    val ex = docs.select($"doc_id",
        explode(graft.ops.TextOps.tokens($"text")).as("token"))
      .filter($"token" =!= "")
    val tf = ex.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val r = tf.join(broadcast(dfq), Seq("token")).crossJoin(broadcast(n))
      .select($"doc_id",
        (graft.ops.TextOps.hash60($"token") % 64).as("dim"),
        graft.ops.Util.roundTo($"tf" * log(($"n_docs" + 1.0) / ($"df" + 1.0)), 6).as("w"))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    // df(aa)=2 of N=2 → idf = ln(3/3) = 0; df(bb)=1 → idf = ln(1.5)
    val lnHalf = math.floor(math.log(3.0 / 2.0) * 1e6 + 0.5) / 1e6
    assert(r((1L, dimOf("bb"))) === lnHalf)
    assert(r((1L, dimOf("aa"))) === 0.0)
    assert(r((2L, dimOf("aa"))) === 0.0)
  }

  // ---------------- BPE merge round ----------------

  test("bpe merges: frequency-weighted adjacent pairs, vocab-level counting") {
    // "abab" ×3 docs + "bc" ×1: pairs ab(×2/occurrence), ba, bc —
    // weighted by corpus token frequency, not distinct-vocab count
    val docs = Seq(
      (1L, "abab abab bc"),
      (2L, "abab x")
    ).toDF("doc_id", "text")
    val vocab = docs
      .select(explode(graft.ops.TextOps.tokens($"text")).as("token"))
      .filter(length($"token") >= 2)
      .groupBy($"token").agg(count(lit(1)).as("freq"))
    val r = vocab
      .select($"freq",
        explode(transform(sequence(lit(1), length($"token") - 1),
          i => $"token".substr(i, lit(2)))).as("pair"))
      .groupBy($"pair").agg(sum($"freq").as("weight"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // "abab" freq 3: ab at pos 1 and 3 → weight 6; ba once → 3;
    // "bc" freq 1 → 1; "x" filtered (length < 2)
    assert(r === Map("ab" -> 6L, "ba" -> 3L, "bc" -> 1L))
  }

  test("bpe learn: merge sequence matches an in-memory reference for 6 rounds") {
    val docs = Seq(
      (1L, "low low low lower lower newest newest newest newest widest"),
      (2L, "low lower widest widest newest")
    ).toDF("doc_id", "text")
    // reference: plain in-memory BPE over the token frequency map,
    // same (weight desc, a asc, b asc) tie-break, same greedy
    // left-to-right merge application
    val freq = scala.collection.mutable.Map.empty[List[String], Long]
    for ((_, text) <- Seq(docs.collect()).flatten.map(r => (r.getLong(0), r.getString(1)));
         t <- text.split(" ") if t.length >= 2)
      freq(t.split("").toList) = freq.getOrElse(t.split("").toList, 0L) + 1
    def refRound(v: Map[List[String], Long]): Option[((String, String), Map[List[String], Long])] = {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- v; p <- syms.sliding(2) if p.size == 2)
        counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
      if (counts.isEmpty) None
      else {
        val (a, b) = counts.toSeq.minBy { case ((a, b), w) => (-w, a, b) }._1
        def apply(s: List[String]): List[String] = s match {
          case x :: y :: rest if x == a && y == b => (a + b) :: apply(rest)
          case x :: rest => x :: apply(rest)
          case Nil => Nil
        }
        Some(((a, b), v.map { case (s, f) => (apply(s), f) }
          .groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }))
      }
    }
    var v = freq.toMap
    val expected = scala.collection.mutable.Buffer.empty[(String, String)]
    for (_ <- 0 until 6) refRound(v).foreach { case (m, nv) => expected += m; v = nv }
    val got = Retrieval.learnBpeMerges(docs, 6)
    assert(got === expected.toSeq)
  }

  test("bpe encode: applying the learned table matches the in-memory greedy encode") {
    val docs = Seq(
      (1L, "low low low lower lower newest newest newest newest widest"),
      (2L, "low lower widest widest newest")
    ).toDF("doc_id", "text")
    val merges = Retrieval.learnBpeMerges(docs, 4)
    assert(merges.length === 4)
    // in-memory greedy left-to-right application, in learned order
    def enc(t: String): List[String] =
      merges.foldLeft(t.split("").toList) { case (syms, (a, b)) =>
        def ap(s: List[String]): List[String] = s match {
          case x :: y :: rest if x == a && y == b => (a + b) :: ap(rest)
          case x :: rest => x :: ap(rest)
          case Nil => Nil
        }
        ap(syms)
      }
    val toks = Seq("low", "lower", "newest", "widest", "lowest")
    val got = toks.toDF("token")
      .select(col("token"),
        Retrieval.applyMerges(split(col("token"), ""), merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    toks.foreach(t => assert(got(t) === enc(t), s"token $t"))
  }

  test("bpe encode: the fold is greedy left-to-right — 'aaa' under (a,a) is [aa, a]") {
    val r = Seq(0).toDF("i")
      .select(Retrieval.applyMerges(split(lit("aaa"), ""), Seq(("a", "a"))).as("s"))
      .collect().head.getSeq[String](0).toList
    assert(r === List("aa", "a"))
  }

  test("bpe tokens: document-order ids, 1-char tokens, n_ids == pack counts") {
    val docs = Seq(
      (1L, "low newest"),
      (2L, "newest low"),
      (3L, "low low a lower"),
      (4L, "   ")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe_tok").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Retrieval.bpeTokens(spark, dir, 4)
      .select(col("doc_id"), col("ids"), col("n_ids"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1).toList, r.getLong(2))).toMap
    // whitespace-only doc is absent; every n_ids is its array's size
    assert(rows.keySet == Set(1L, 2L, 3L))
    rows.values.foreach { case (ids, n) => assert(ids.length.toLong == n) }
    // in-memory expected piece counts under the SAME learned table
    val merges = Retrieval.learnBpeMerges(
      graft.io.Tables.documents(spark, dir), 4)
    def enc(t: String): List[String] =
      if (t.length < 2) List(t)
      else merges.foldLeft(t.split("").toList) { case (syms, (a, b)) =>
        def ap(s: List[String]): List[String] = s match {
          case x :: y :: rest if x == a && y == b => (a + b) :: ap(rest)
          case x :: rest => x :: ap(rest)
          case Nil => Nil
        }
        ap(syms)
      }
    val nLow = enc("low").length
    val nNewest = enc("newest").length
    assert(rows(1L)._1.length == nLow + nNewest)
    assert(rows(3L)._1.length == 2 * nLow + 1 + enc("lower").length)
    // DOCUMENT ORDER: doc 1 = low ++ newest, doc 2 = newest ++ low —
    // the same two id blocks, swapped
    val (ids1, ids2) = (rows(1L)._1, rows(2L)._1)
    assert(ids2 == ids1.drop(nLow) ++ ids1.take(nLow),
      s"order not preserved: $ids1 vs $ids2")
    // packing consumes the SAME lengths (one id-table definition)
    val packed = Retrieval.bpePackCounts(spark, dir, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed == rows.map { case (k, (_, n)) => k -> n })
  }

  test("bpe tokens: non-BMP tokens split by CODE POINT — native == composed") {
    // ADVICE r14: a UTF-16-unit split would break 😀/𝕏 into lone
    // surrogates that can never appear in the code-point-built
    // lexicon. Compare the native expression's pieces against the
    // composed split(token,'')+applyMerges spelling on a corpus
    // whose hot pair IS a surrogate-pair sequence.
    val docs = Seq(
      (1L, "😀😀 ab 😀😀 ab"),
      (2L, "😀😀x a𝕏b"),
      (3L, "x😀 ab")).toDF("doc_id", "text")
    val merges = Retrieval.learnBpeMerges(docs, 2)
    assert(merges.contains(("😀", "😀")),
      s"emoji pair should win a merge round, got $merges")
    val lex = Retrieval.bpePieceLexicon(docs, merges)
    // composed spelling: per-token pieces via split(token,'') fold
    val composed = docs
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .select(col("token"), when(length(col("token")) >= 2,
        Retrieval.applyMerges(split(col("token"), ""), merges))
        .otherwise(array(col("token"))).as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // every composed piece is in the lexicon → native ids must be
    // exactly offset + lexicon positions, no byte fallback fired
    val pos = lex.zipWithIndex.toMap
    val expect = docs.select(col("doc_id"),
        graft.ops.TextOps.tokens(col("text")).as("toks"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty)
          .flatMap(t => composed(t).map(p =>
            graft.functions.BpeEncodeIds.ByteIdOffset + pos(p))).toList
      }.toMap
    val got = Retrieval.bpeTokensFrom(docs, merges, lex)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(got == expect, s"native != composed: $got vs $expect")
  }

  test("bpe tokens: byte fallback — frozen lexicon, unseen tokens, TOTAL ids") {
    // freeze merges+lexicon on one corpus, encode a stream containing
    // tokens unseen at freeze time: ids must be total (no nulls —
    // the VERDICT r14 #3 contract), with out-of-lexicon pieces
    // decomposed to their UTF-8 bytes in the reserved 0–255 band.
    val trainDocs = Seq((1L, "low low newest")).toDF("doc_id", "text")
    val merges = Retrieval.learnBpeMerges(trainDocs, 2)
    val lex = Retrieval.bpePieceLexicon(trainDocs, merges)
    val stream = Seq((10L, "low zq"), (11L, "émq")).toDF("doc_id", "text")
    val tok = Retrieval.bpeTokensFrom(stream, merges, lex)
    // totality is a SCHEMA property: the id array's element type must
    // declare containsNull = false (a getSeq[Int] decode would box
    // primitives and could never observe a null, so asserting on the
    // decoded list was vacuous — ADVICE r15)
    tok.schema.fields(1).dataType match {
      case org.apache.spark.sql.types.ArrayType(_, containsNull) =>
        assert(!containsNull, "byte fallback must be total (schema-level)")
      case other => fail(s"ids column is not an array: $other")
    }
    val out = tok
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList,
        r.getLong(2))).sortBy(_._1)
    val off = graft.functions.BpeEncodeIds.ByteIdOffset
    out.foreach { case (_, ids, n) =>
      assert(ids.length.toLong == n)
    }
    // 'zq': 'z' and 'q' single-char pieces absent from the frozen
    // lexicon (train corpus has no z/q) → UTF-8 bytes
    val zq = out.find(_._1 == 10L).get._2.drop(
      out.find(_._1 == 10L).get._2.length - 2)
    assert(zq == List('z'.toInt, 'q'.toInt), s"zq bytes: $zq")
    // 'émq' (unseen, multi-byte é): é = 0xC3 0xA9 in UTF-8 — two
    // byte ids, both < 256; every id in-band
    val em = out.find(_._1 == 11L).get._2
    assert(em.take(2) == List(0xC3, 0xA9), s"é bytes: $em")
    assert(em.forall(i => i >= 0 && (i < 256 || i >= off)))
    // in-lexicon pieces still ride the offset band
    val lowIds = out.find(_._1 == 10L).get._2.dropRight(2)
    assert(lowIds.forall(_ >= off), s"in-lexicon ids must be offset: $lowIds")
  }

  // ---------------- SemDeDup ----------------

  test("semantic dedup: mass-duplicate collapse keeps the group minimum only") {
    // 2000 exact copies of u + a near-dup + a below-tau neighbor +
    // distinct basis vectors; the pair stage sees REPRESENTATIVES
    // (≤ 8 rows), not the 2000-row group — the structural guarantee
    // that a mass-duplicated embedding cannot recreate the quadratic.
    val u = Seq(1f, 0f, 0f, 0f)
    val near = Seq(1f, 0.001f, 0f, 0f)      // cos ≈ 0.9999995 ≥ τ
    val far = Seq(1f, 0.5f, 0f, 0f)         // cos ≈ 0.894 < τ
    val rows =
      (0L until 2000L).map(i => (i, u)) ++
        Seq((2500L, near), (2600L, far),
          (3000L, Seq(0f, 1f, 0f, 0f)), (3001L, Seq(0f, 0f, 1f, 0f)))
    val assigned = rows.toDF("vec_id", "embedding")
      .withColumn("cell", lit(0))
    val r = VectorOps.semanticDedup(assigned, tau = 0.999)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r(0L))                       // group minimum survives
    assert((1L until 2000L).forall(i => !r(i)))  // copies dropped
    assert(!r(2500L))                   // near-dup dropped
    assert(r(2600L))                    // below-tau kept
    assert(r(3000L) && r(3001L))        // distinct vectors kept
  }

  test("semantic dedup: maxCell caps droppers one-sided — verification never skipped") {
    // three near-identical NON-exact vectors (the collapse cannot
    // merge them) + distinct rest; with cap=1 only rep 1 serves as a
    // dropper candidate, but 2 and 3 are still verified against it —
    // both drop via rep 1; only the beyond-cap (2,3) relation is
    // sacrificed (and is redundant here). Same one-sided semantics as
    // minhashPairsOf(maxBucket).
    val rows = Seq(
      (1L, Seq(1f, 0.0000f, 0f, 0f)),
      (2L, Seq(1f, 0.0010f, 0f, 0f)),
      (3L, Seq(1f, 0.0020f, 0f, 0f)),
      (9L, Seq(0f, 1f, 0f, 0f)))
    val assigned = rows.toDF("vec_id", "embedding").withColumn("cell", lit(0))
    for (cap <- Seq(None, Some(1))) {
      val r = VectorOps.semanticDedup(assigned, tau = 0.999, maxCell = cap)
        .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
      assert(r === Map(1L -> true, 2L -> false, 3L -> false, 9L -> true),
        s"cap=$cap")
    }
  }

  test("semantic dedup: cells are dedup scopes — same vector in different cells both kept") {
    val u = Seq(1f, 0f)
    val assigned = Seq((1L, u, 0), (2L, u, 1)).toDF("vec_id", "embedding", "cell")
    val r = VectorOps.semanticDedup(assigned, tau = 0.999)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r === Map(1L -> true, 2L -> true))
  }

  // ---------------- hybrid search ----------------

  test("hybrid search: RRF arithmetic, single-leg docs survive the fusion") {
    // doc 1: strong lexically (many 'cat') AND semantically; doc 2:
    // lexical only (contains 'cat', rest of its mass elsewhere);
    // doc 3: no query term at all — absent from BOTH legs (its tokens
    // share no hash dim with 'cat' unless hash60 collides mod 64,
    // asserted below); doc 4: no exact 'cat' but shares doc 1's
    // non-query vocabulary.
    val docs = Seq(
      (1L, "cat cat cat alpha beta"),
      (2L, "cat gamma gamma gamma gamma"),
      (3L, "delta epsilon zeta"),
      (4L, "alpha beta alpha beta")
    ).toDF("doc_id", "text")
    assume(Seq("delta", "epsilon", "zeta").map(dimOf).toSet
      .intersect(Set(dimOf("cat"))).isEmpty)
    val r = Retrieval.hybridSearch(docs, Seq("cat")).collect()
      .map(x => x.getLong(0) -> (x.getLong(1),
        x.getDouble(2),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(4)) -1L else x.getLong(4))).toMap
    // doc 3 never appears; docs 1/2 carry both-or-lexical ranks
    assert(!r.contains(3L))
    assert(r.contains(1L) && r.contains(2L))
    val (_, rrf1, l1, s1) = r(1L)
    assert(l1 > 0 && s1 > 0)
    // RRF value is exactly the two-leg reciprocal sum
    def leg(k: Long) =
      if (k <= 0) 0.0 else math.floor(1.0 / (60.0 + k) * 1e9 + 0.5) / 1e9
    assert(rrf1 === math.floor((leg(l1) + leg(s1)) * 1e9 + 0.5) / 1e9)
    // every returned doc's rrf matches its ranks; ranks are dense from 1
    r.values.foreach { case (_, rrf, l, sm) =>
      assert(rrf === math.floor((leg(l) + leg(sm)) * 1e9 + 0.5) / 1e9)
    }
    assert(r.values.map(_._1).toSeq.sorted === (1L to r.size).toSeq)
  }

  test("hybrid search: a lexical-only and a semantic-only doc both fuse in") {
    // the semantic leg scores in HASHED dim space: a doc with no query
    // term can only surface if one of its tokens lands in the query
    // term's dimension — construct exactly that collision
    val collider = (0 until 10000).iterator.map(i => s"w$i")
      .find(w => dimOf(w) == dimOf("cat")).get
    val docs = Seq(
      (1L, "cat cat filler1"),
      (2L, s"$collider $collider $collider"), // no 'cat', collides in dim space
      (3L, "cat filler2 filler3")
    ).toDF("doc_id", "text")
    val r = Retrieval.hybridSearch(docs, Seq("cat")).collect()
      .map(x => x.getLong(0) -> ((!x.isNullAt(3), !x.isNullAt(4)))).toMap
    // doc 2 has no query term: lexical leg absent, semantic leg present
    assert(r.contains(2L) && !r(2L)._1 && r(2L)._2)
    // doc 1 and 3 are lexical candidates
    assert(r(1L)._1 && r(3L)._1)
  }
}
