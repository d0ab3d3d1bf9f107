package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{TextOps, Util}

/** Property-style invariants over generated inputs (ScalaCheck Gen for
  * data, one batched Spark pass per property — SURVEY.md §5). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] =
    Iterator.from(0).map(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i))
    ).flatten.take(n).toSeq

  test("roundTo(x, 2) stays within half-ulp-of-cent of x and is idempotent") {
    val xs = samples(Gen.chooseNum(-1e6, 1e6), 300)
    val rows = xs.toDF("x")
      .select($"x", Util.roundTo($"x", 2).as("r"),
        Util.roundTo(Util.roundTo($"x", 2), 2).as("rr"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (x, r, rr) =>
      assert(math.abs(r - x) <= 0.005 + 1e-9, s"x=$x r=$r")
      assert(r === rr, s"not idempotent at $x")
    }
  }

  test("minhash signature of a union is the element-wise min of signatures") {
    val tokGen = Gen.listOfN(30, Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty))
    val pairs = samples(Gen.zip(tokGen, tokGen), 25)
    val df = pairs.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a, b, (a ++ b).distinct)
    }.toDF("id", "a", "b", "u")
    val sig = (c: String) => TextOps.minhashSig(
      TextOps.shingleHashes(array_distinct(col(c))), 8)
    val rows = df.select(sig("a").as("sa"), sig("b").as("sb"), sig("u").as("su"))
      .as[(Seq[Long], Seq[Long], Seq[Long])].collect()
    rows.foreach { case (sa, sb, su) =>
      val expect = sa.zip(sb).map { case (x, y) => math.min(x, y) }
      assert(su === expect)
    }
  }

  test("simhash is permutation-invariant (bag semantics)") {
    val tokGen = Gen.listOfN(20, Gen.identifier.map(_.take(8)))
    val lists = samples(tokGen, 25).filter(_.nonEmpty)
    val df = lists.zipWithIndex.flatMap { case (l, i) =>
      Seq((i.toLong, 0, l), (i.toLong, 1, scala.util.Random.shuffle(l)))
    }.toDF("id", "variant", "toks")
      .select($"id", $"variant", graft.functions.simhash64($"toks").as("h"))
    val byId = df.as[(Long, Int, Long)].collect()
      .groupBy(_._1).values
    byId.foreach { vs =>
      assert(vs.map(_._3).distinct.length === 1,
        s"permutation changed simhash for id ${vs.head._1}")
    }
  }

  test("deterministic sample partitions ids exactly by modulus") {
    val rates = Seq(0, 1, 17, 50, 100)
    val ids = samples(Gen.chooseNum(0L, 1000000L), 500).distinct
    val df = ids.toDF("event_id")
    rates.foreach { r =>
      val got = graft.ops.Transforms.sampleDet(df, "event_id", r).count()
      val expect = ids.count(_ % 100 < r)
      assert(got === expect, s"rate=$r")
    }
  }

  test("jaccard is bounded, reflexive, and symmetric on generated sets") {
    val setGen = Gen.listOfN(15, Gen.chooseNum(1, 40).map(i => s"t$i")).map(_.distinct)
    val pairs = samples(Gen.zip(setGen, setGen), 30)
      .filter { case (a, b) => a.nonEmpty && b.nonEmpty }
    val rows = pairs.toDF("a", "b")
      .select(
        TextOps.jaccard($"a", $"b").as("jab"),
        TextOps.jaccard($"b", $"a").as("jba"),
        TextOps.jaccard($"a", $"a").as("jaa"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (jab, jba, jaa) =>
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jab === jba)
      assert(jaa === 1.0)
    }
  }

  test("sliding-10 rollup telescopes: window sum differences equal dropped minute") {
    // build a dense synthetic minute series and check
    // count_10m(t) - count_10m(t-1) == n(t) - n(t-10)
    val ns = samples(Gen.chooseNum(1, 50), 120)
    val minutes = ns.zipWithIndex.map { case (n, i) =>
      (f"2024-01-01 ${i / 60}%02d:${i % 60}%02d", "t", n.toLong, 0.0)
    }
    val df = minutes.toDF("minute", "event_type", "access_count", "sum_value")
    val slid = graft.ops.Aggregates.sliding10m(df)
      .select($"minute", $"count_10m").as[(String, Long)].collect().sortBy(_._1)
    val arr = ns.map(_.toLong)
    slid.zipWithIndex.drop(10).take(50).foreach { case ((_, c10), i) =>
      val prev = slid(i - 1)._2
      assert(c10 - prev === arr(i) - arr(i - 10))
    }
  }

  test("CDC resolveLatest equals a driver-side ordered replay on random logs") {
    // random mutation logs: ~8 keys, ops weighted toward upserts,
    // ts with deliberate collisions (the seq column breaks ties the
    // same way for both spellings)
    val mutGen = Gen.zip(
      Gen.chooseNum(1L, 8L),                      // key
      Gen.chooseNum(0L, 20L),                     // coarse ts (collisions likely)
      Gen.frequency(3 -> Gen.const("c"), 3 -> Gen.const("u"),
        2 -> Gen.const("d"), 1 -> Gen.const("r")),
      Gen.chooseNum(-1000, 1000))                 // payload value
    val logs = samples(Gen.listOfN(40, mutGen), 20)
    val rows = logs.zipWithIndex.flatMap { case (log, i) =>
      log.zipWithIndex.map { case ((k, ts, op, v), j) =>
        (i.toLong, k, ts, j.toLong, op, v) }
    }
    val got = graft.ops.Cdc.resolveLatest(
        rows.toDF("log_id", "id", "ts", "seq", "__op", "v"),
        Seq("log_id", "id"), Seq("ts", "seq"))
      .select($"log_id", $"id", $"v").as[(Long, Long, Int)].collect()
      .map { case (l, k, v) => (l, k) -> v }.toMap
    // driver truth: replay each log in (ts, seq) order, last writer
    // wins, delete removes the key
    val want = logs.zipWithIndex.flatMap { case (log, i) =>
      val last = scala.collection.mutable.Map.empty[Long, (String, Int)]
      log.zipWithIndex
        .sortBy { case ((_, ts, _, _), j) => (ts, j.toLong) }
        .foreach { case ((k, _, op, v), _) => last(k) = (op, v) }
      last.collect { case (k, (op, v)) if op != "d" => (i.toLong, k) -> v }
    }.toMap
    assert(got === want,
      s"diverged on ${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
  }

  test("connectedComponents equals driver-side union-find on random graphs") {
    // adversarial mix per trial: random edges + a long chain (stresses
    // the pointer-jump depth) over a sparse id space (not contiguous)
    val trials = samples(Gen.zip(
      Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 39L), Gen.chooseNum(0L, 39L))),
      Gen.chooseNum(5, 15)), 5)
    trials.zipWithIndex.foreach { case ((rand, chainLen), t) =>
      val chain = (0 until chainLen).map(i => (100L + i * 7, 107L + i * 7))
      val edges = (rand.map { case (a, b) => (a * 3, b * 3) } ++ chain)
        .filter { case (a, b) => a != b }
      // ground truth: plain union-find on the driver
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // min-id representative per component (what the operator labels with)
      val truth = {
        val byRoot = nodes.groupBy(find)
        nodes.map(n => n -> byRoot(find(n)).min).toMap
      }
      val got = ops.Graph.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got === truth, s"trial $t: ${edges.size} edges diverged")
    }
  }

  test("nearest_centroid equals a driver-side argmin with lowest-index ties (generated)") {
    val dims = 6
    val vecGen = Gen.listOfN(dims, Gen.chooseNum(-8, 8).map(_.toFloat / 4f))
    val vecs = samples(vecGen, 120).map(_.toArray).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    // small value lattice (quarters in [-2,2]) makes distance TIES
    // common — the lowest-index rule is actually exercised
    val centers = samples(vecGen, 7, seed = 99L).map(_.map(_.toDouble).toArray).toArray
    val got = vecs.toDF("id", "emb")
      .select($"id", graft.functions.nearest_centroid(
        $"emb".cast("array<float>"), centers).as("cell"))
      .as[(Long, Int)].collect().toMap
    vecs.foreach { case (id, v) =>
      val want = centers.zipWithIndex.map { case (c, j) =>
        (ops.Ivf.distSq(v.map(_.toDouble), c), j) }.min._2
      assert(got(id) === want, s"vec $id")
    }
  }

  test("PQ ADC distance equals the sum of per-subspace exact distances (generated)") {
    // ADC is EXACT per subspace against the chosen codebook entry —
    // for any codebook (not just fitted ones) and any code assignment
    val dims = 8; val m = 2; val k = 3
    val vecGen = Gen.listOfN(dims, Gen.chooseNum(-10.0, 10.0).map(_.toFloat))
    val q = samples(vecGen, 1, seed = 7L).head.toArray
    val cbGen = Gen.listOfN(dims / m, Gen.chooseNum(-10.0, 10.0))
    val codebooks = Array.tabulate(m)(s =>
      samples(cbGen, k, seed = 100L + s).map(_.toArray).toArray)
    val vecs = samples(vecGen, 60).map(_.toArray).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val lut = ops.Pq.lutL2(codebooks, q.map(_.toDouble))
    val rows = ops.Pq.encode(vecs.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding")),
        $"embedding", codebooks)
      .select($"vec_id", $"pq_code",
        ops.Pq.adcDistSq($"pq_code", lut).as("d"))
      .as[(Long, Seq[Int], Double)].collect()
    rows.foreach { case (id, code, d) =>
      val sub = dims / m
      val expect = (0 until m).map { s =>
        val qs = q.map(_.toDouble).slice(s * sub, (s + 1) * sub)
        ops.Ivf.distSq(qs, codebooks(s)(code(s)))
      }.reduce(_ + _)
      assert(math.abs(d - expect) < 1e-12, s"vec $id: adc=$d expect=$expect")
    }
  }

  // ----------------------------------------------------------------
  // DropChrome vs an INDEPENDENT model of the oracle's sentinel-split
  // prefix-sum spelling, over generated tag soups — property evidence
  // for the engine-parity claim beyond the fixture corpus. Domain:
  // balanced-or-truncated chrome (the documented agreement domain;
  // stray closes at depth 0 deliberately diverge). Equivalence is up
  // to tag-strip + whitespace-normalize, exactly what blockText
  // applies downstream in both engines.
  // ----------------------------------------------------------------

  private val chromeWs = "[ \\t\\n\\r\\f\\x0B]"
  private val chromeAlt = graft.functions.HtmlScanUtil.chromeTags.mkString("|")
  private val sentRe =
    s"(?is)</?(?:$chromeAlt)(?:$chromeWs[^>]*)?/?>".r
  private def fullMatch(p: String, x: String) =
    java.util.regex.Pattern.compile(p).matcher(x).matches()
  private def deltaOf(piece: String): Int =
    if (fullMatch(s"(?is)</(?:$chromeAlt)$chromeWs*>", piece)) -1
    else if (fullMatch(s"(?is)<(?:$chromeAlt)(?:$chromeWs[^>]*)?/>", piece)) 0
    else if (fullMatch(s"(?is)<(?:$chromeAlt)(?:$chromeWs[^>]*)?>", piece)) 1
    else 0

  /** The SQL spelling, re-implemented: sentinel-split, classify,
    * prefix-sum depth, keep depth-0 text pieces, dropped → space.
    * `clampStray = true` is instead the SCANNER's documented stray-
    * close rule (HtmlScan.scala:36-42): a close at depth 0 is a
    * no-op (the tag text is copied verbatim, which stripNorm folds
    * to the same space), so depth never goes negative. */
  private def chromeModel(s: String, clampStray: Boolean = false): String = {
    val out = new StringBuilder
    var depth = 0
    var last = 0
    val m = sentRe.pattern.matcher(s)
    def textPiece(t: String): Unit =
      if (depth == 0) out.append(t) else out.append(' ')
    while (m.find()) {
      textPiece(s.substring(last, m.start()))
      out.append(' ') // tag pieces are never kept
      depth += deltaOf(m.group())
      if (clampStray && depth < 0) depth = 0
      last = m.end()
    }
    textPiece(s.substring(last))
    out.toString
  }

  private def stripNorm(s: String): String =
    s.replaceAll("<[^>]*>", " ").replaceAll(chromeWs + "+", " ").trim

  test("drop_chrome equals the sentinel-split prefix-sum model on generated soups") {
    val word = Gen.oneOf("alpha", "beta", "<navigation>", "x>y", "a<b",
      "<p>para</p>", "plain", "&amp;", "<header-ish>")
    val chromeTag = Gen.oneOf("nav", "header", "footer", "aside")
    def node(depth: Int): Gen[String] =
      if (depth <= 0) word
      else Gen.frequency(
        4 -> word,
        2 -> (for {
          t <- chromeTag
          attr <- Gen.oneOf("", " class=\"x\"", " id=a b=2")
          inner <- Gen.listOfN(3, node(depth - 1)).map(_.mkString(" "))
        } yield s"<$t$attr>$inner</$t>"),
        1 -> chromeTag.map(t => s"<$t/>"),
        1 -> (for {
          inner <- Gen.listOfN(2, node(depth - 1)).map(_.mkString(" "))
        } yield s"<div>$inner</div>"))
    val soup = Gen.listOfN(6, node(3)).map(_.mkString(" "))
    val cases = samples(soup, 120) ++
      // truncation stays in the agreement domain (unclosed containers)
      samples(soup, 60, seed = 7L).zipWithIndex.map { case (x, i) =>
        x.take(math.max(1, (x.length * (i % 10)) / 10))
      }
    cases.foreach { x =>
      val viaScanner = graft.functions.HtmlScanUtil.dropChrome(
        org.apache.spark.unsafe.types.UTF8String.fromString(x)).toString
      val viaModel = chromeModel(x)
      assert(stripNorm(viaScanner) == stripNorm(viaModel),
        s"diverged on: $x\n scanner=${stripNorm(viaScanner)}\n model=${stripNorm(viaModel)}")
    }
  }

  // The documented DIVERGENCE domain (HtmlScan.scala:36-42), pinned
  // explicitly instead of relying on the fixture never producing it
  // (VERDICT r13 #2): stray closes at depth 0 — scanner ignores and
  // keeps the tail, the SQL prefix-sum goes negative and drops it.
  private def scanOf(x: String): String =
    graft.functions.HtmlScanUtil.dropChrome(
      org.apache.spark.unsafe.types.UTF8String.fromString(x)).toString

  test("stray-close divergence is pinned in BOTH spellings") {
    val x = "<p>a</p></nav><p>tail survives here</p>"
    // scanner (Spark engine): stray close ignored, tail kept
    assert(stripNorm(scanOf(x)) == "a tail survives here")
    // SQL spelling (the model): depth -1 after the stray close, every
    // later depth-0-in-scanner piece is non-zero here — tail DROPPED
    assert(stripNorm(chromeModel(x)) == "a")
    // the clamped model IS the scanner's rule — agreement restored
    assert(stripNorm(chromeModel(x, clampStray = true)) == stripNorm(scanOf(x)))
  }

  test("literal \\x01 passes the scanner verbatim (SQL sentinel divergence)") {
    // the SQL spelling consumes \x01 as its split sentinel; the
    // scanner treats it as ordinary text — pinned so a fixture change
    // that starts emitting control bytes fails HERE, not in the oracle
    val x = "keep" + "\u0001" + "this <nav>drop</nav> end"
    val out = scanOf(x)
    assert(out.contains("keep" + "\u0001" + "this"), out)
    assert(!out.contains("drop"), out)
  }

  test("scanner equals the CLAMPED model on soups WITH stray closes") {
    // generator arm with stray closes mixed in — Spark-side only (the
    // un-clamped SQL model legitimately diverges on this domain)
    val word = Gen.oneOf("alpha", "beta", "</nav>", "</header >", "</aside>",
      "<p>para</p>", "plain", "<navigation>", "x>y")
    val chromeTag = Gen.oneOf("nav", "header", "footer", "aside")
    def node(depth: Int): Gen[String] =
      if (depth <= 0) word
      else Gen.frequency(
        4 -> word,
        2 -> (for {
          t <- chromeTag
          inner <- Gen.listOfN(3, node(depth - 1)).map(_.mkString(" "))
        } yield s"<$t>$inner</$t>"),
        1 -> chromeTag.map(t => s"</$t>"))
    val soup = Gen.listOfN(6, node(3)).map(_.mkString(" "))
    samples(soup, 120, seed = 99L).foreach { x =>
      assert(stripNorm(scanOf(x)) == stripNorm(chromeModel(x, clampStray = true)),
        s"diverged on: $x\n scanner=${stripNorm(scanOf(x))}\n " +
          s"clamped=${stripNorm(chromeModel(x, clampStray = true))}")
    }
  }
}
