package graft

import graft.ops.FixtureCache

/** Disk-cache lifecycle guarantees: publish-once, corrupt-publish
  * self-heal, crashed-writer tmp sweep, and source-fingerprint
  * invalidation. Each test points the cache root at its own temp dir
  * via the `graft.fixture.cache` system property. */
class FixtureCacheSpec extends SparkSpec {
  import spark.implicits._

  private def withRoot[A](f: java.io.File => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_fixcache").toFile
    val prev = sys.props.get("graft.fixture.cache")
    sys.props("graft.fixture.cache") = root.toString
    try f(root)
    finally prev match {
      case Some(v) => sys.props("graft.fixture.cache") = v
      case None => sys.props.remove("graft.fixture.cache")
    }
  }

  private def srcDir(): String = {
    // a source dir carrying a documents.parquet for the fingerprint
    val d = java.nio.file.Files.createTempDirectory("graft_fixsrc").toString
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("computes once, serves from disk afterwards") {
    withRoot { root =>
      val dir = srcDir()
      var computes = 0
      def get() = FixtureCache.dataset(spark, dir, "probe_v1") {
        computes += 1
        Seq((1L, "x"), (2L, "y")).toDS()
      }.collect().sorted.toSeq
      val first = get()
      val second = get()
      assert(first === second)
      assert(computes === 1, "second call must serve from disk")
      assert(root.listFiles().exists(_.getName.startsWith("probe_v1-")))
    }
  }

  test("a published path without _SUCCESS is torn down and rebuilt, tmp corpses swept") {
    withRoot { root =>
      val dir = srcDir()
      def get(tag: String) = FixtureCache.dataset(spark, dir, "heal_v1") {
        Seq(tag).toDS()
      }.collect().toSeq
      assert(get("good") === Seq("good"))
      val published = root.listFiles().find(_.getName.startsWith("heal_v1-")).get
      // simulate a crashed publish: kill the success marker, plant a
      // stale writer tmp dir
      assert(new java.io.File(published, "_SUCCESS").delete())
      // a STALE tmp (past the sweep grace period → crashed writer) and
      // a FRESH one (inside it → possibly a live concurrent writer)
      val corpse = new java.io.File(root, s".${published.getName}.tmp-dead")
      assert(corpse.mkdirs())
      assert(corpse.setLastModified(System.currentTimeMillis() - 11 * 60 * 1000))
      val live = new java.io.File(root, s".${published.getName}.tmp-live")
      assert(live.mkdirs())
      assert(get("rebuilt") === Seq("rebuilt"),
        "corrupt publish must rebuild, not serve the corpse")
      assert(!corpse.exists(), "stale writer tmp must be swept")
      assert(live.exists(),
        "a fresh tmp may be a live concurrent writer — must survive the sweep")
      assert(new java.io.File(published, "_SUCCESS").exists())
    }
  }

  test("regenerated source data gets a fresh cache entry") {
    withRoot { root =>
      val dir = srcDir()
      def get(v: String) = FixtureCache.dataset(spark, dir, "src_v1") {
        Seq(v).toDS()
      }.collect().toSeq
      assert(get("old") === Seq("old"))
      // regenerate documents.parquet in place (new length/mtime)
      val p = new java.io.File(s"$dir/documents.parquet")
      p.listFiles().foreach(_.delete()); p.delete()
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      assert(get("new") === Seq("new"),
        "a regenerated source table must invalidate the cached store")
      // the re-key published a NEW store for the SAME (stage, dir) —
      // the old-key store must be swept, not orphaned (ADVICE r17)
      assert(root.listFiles().count(_.getName.startsWith("src_v1-")) === 1,
        "stale old-key store for the same (stage, dir) must be swept")
    }
  }

  test("re-key sweeps only same-source stores; another dir's store survives") {
    withRoot { root =>
      val dirA = srcDir()
      val dirB = srcDir()
      def get(dir: String, v: String) =
        FixtureCache.dataset(spark, dir, "multi_v1") { Seq(v).toDS() }
          .collect().toSeq
      assert(get(dirA, "a") === Seq("a"))
      assert(get(dirB, "b") === Seq("b"))
      assert(root.listFiles().count(_.getName.startsWith("multi_v1-")) === 2)
      // regenerate dirA's source → dirA re-keys and sweeps ITS old
      // store; dirB's store (same stage, different dir) must survive
      val p = new java.io.File(s"$dirA/documents.parquet")
      p.listFiles().foreach(_.delete()); p.delete()
      Seq((9L, "z")).toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$dirA/documents.parquet")
      assert(get(dirA, "a2") === Seq("a2"))
      assert(root.listFiles().count(_.getName.startsWith("multi_v1-")) === 2,
        "dirA's stale store swept, dirB's live store untouched")
      assert(get(dirB, "IGNORED — must serve from disk") === Seq("b"),
        "dirB's store must still serve after dirA's sweep")
    }
  }

  test("classStamp is stable, 12-hex, and covers directory-layout siblings") {
    val s1 = FixtureCache.classStamp(classOf[graft.ops.TextOps.type])
    val s2 = FixtureCache.classStamp(classOf[graft.ops.TextOps.type])
    assert(s1 === s2)
    assert(s1.matches("[0-9a-f]{12}"), s"stamp: $s1")
    // two different classes stamp differently (bytecode actually read)
    val other = FixtureCache.classStamp(classOf[graft.ops.Urls.type])
    assert(other !== s1)
  }
}
