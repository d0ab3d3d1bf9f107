package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.hadoop.fs.Path

/** DISK-backed cache for deterministic fixture stores (r9 verdict
  * #4): the media fixture synthesis (ImageIO/AudioSystem encodes of
  * id-derived payloads) is pure arithmetic on (dir, doc_id) — the
  * same bytes every run — yet each fresh JVM re-paid it once per
  * session because [[Memo]] is session-scoped. Benches and driver
  * rounds run in fresh JVMs from the same working directory, so the
  * synthesis cost landed in the FIRST media query of every round
  * (q_video_neardup carried ~2/3 of its driver-bench wall in fixture
  * synthesis). This cache persists the synthesized store as parquet
  * under `target/fixture-cache` (override: `GRAFT_FIXTURE_CACHE`);
  * later JVMs read the store instead of re-encoding it.
  *
  * Publish protocol: compute → write to a tmp sibling → rename into
  * place; a concurrent winner's store is kept and ours dropped
  * (fixtures are deterministic, both copies are identical). Within a
  * JVM, callers additionally serialize through [[Memo]], so the race
  * arm is cross-process only.
  *
  * VERSIONING IS THE CALLER'S CONTRACT: the `stage` string must
  * carry a version suffix (e.g. `image_fixture_v1`) bumped whenever
  * the synthesis code changes — the cache cannot see code, only
  * names. Test/gate scope: fixture stores only (synthetic, derived,
  * reproducible) — never operator outputs.
  */
object FixtureCache {

  /** Cache root: system property first (tests point it at a temp
    * dir), then env, then the repo-local default. */
  private def rootDir: String =
    sys.props.get("graft.fixture.cache")
      .orElse(sys.env.get("GRAFT_FIXTURE_CACHE"))
      .getOrElse("target/fixture-cache")

  /** 12-hex fingerprint of a class's BYTECODE, for folding into a
    * cache key (ADVICE r16): the manual `_v1` suffix contract only
    * invalidates when someone remembers to bump it; a decode/hash
    * implementation change without a bump serves stale stores across
    * JVMs until the source table changes. Hashing the implementing
    * classfiles makes invalidation automatic — a code change re-keys
    * the store, which over-invalidates slightly but serves stale data
    * only in the narrow gap below.
    *
    * Coverage (ADVICE r17): when the class loads from a DIRECTORY
    * classpath entry (the sbt/test layout), ALL sibling classfiles of
    * the outer name (`Outer.class` + `Outer$*.class` — companion,
    * nested classes, lambdas) are hashed in sorted order, so code in
    * a companion or closure re-keys too. From a non-listable source
    * (jar), only the named classfile hashes — helper code compiled
    * into OTHER top-level classes still needs its class listed in
    * `codeOf` explicitly.
    * Memoized per class: the resource read is classloader I/O. */
  private val classStamps =
    new java.util.concurrent.ConcurrentHashMap[Class[_], String]()
  def classStamp(cls: Class[_]): String =
    classStamps.computeIfAbsent(cls, { c =>
      val simple = c.getName.substring(c.getName.lastIndexOf('.') + 1)
      val url = c.getResource(simple + ".class")
      if (url == null) "noclass"
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val buf = new Array[Byte](8192)
        def feed(in: java.io.InputStream): Unit =
          try {
            var n = in.read(buf)
            while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
          } finally in.close()
        val siblings: Seq[java.io.File] =
          if (url.getProtocol == "file")
            try {
              val self = new java.io.File(url.toURI)
              Option(self.getParentFile.listFiles()).toSeq.flatten
                .filter { f =>
                  val n = f.getName
                  n == s"$simple.class" ||
                    (n.startsWith(simple + "$") && n.endsWith(".class"))
                }
                .sortBy(_.getName)
            } catch { case scala.util.control.NonFatal(_) => Nil }
          else Nil
        if (siblings.nonEmpty)
          siblings.foreach { f =>
            md.update(f.getName.getBytes("UTF-8")) // name delimits content
            feed(new java.io.FileInputStream(f))
          }
        else feed(c.getResourceAsStream(simple + ".class"))
        md.digest().map(b => f"$b%02x").mkString.take(12)
      }
    })

  /** Serve `stage` for `dir` from the disk cache, synthesizing and
    * publishing it at most once per cache lifetime. Returns the
    * parquet-backed frame (lazy scan, no cache dependency — callers
    * that want clearCache-surviving in-memory serving checkpoint the
    * result themselves, as the fixture memos do).
    *
    * The key fingerprints the SOURCE TABLE (documents.parquet length
    * + mtime) in addition to (stage, dir): regenerated test data in
    * the same directory gets a fresh cache entry instead of a stale
    * store derived from the old doc_id set (review r10). A `path`
    * that exists WITHOUT its `_SUCCESS` (crashed publish, partial
    * delete) is torn down and rebuilt rather than read forever;
    * orphaned `.tmp` dirs of crashed writers for the same key are
    * swept before writing.
    *
    * `codeOf` (optional): classes whose BYTECODE participates in the
    * key via [[classStamp]] — pass the class(es) implementing the
    * synthesis/decode/hash so code changes auto-invalidate without a
    * manual `_vN` bump (the suffix stays as the human-readable schema
    * version). */
  def dataset[T](spark: SparkSession, dir: String, stage: String,
      codeOf: Seq[Class[_]] = Nil)(
      compute: => Dataset[T])(implicit enc: Encoder[T]): Dataset[T] = {
    val fsForDir = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcStamp =
      try {
        val st = fsForDir.getFileStatus(new Path(dir, "documents.parquet"))
        s"${st.getLen}|${st.getModificationTime}"
      } catch { case _: java.io.IOException => "nosrc" }
    // the codeKey segment joins the hash ONLY when codeOf is non-empty
    // (ADVICE r17): stages that never opted into bytecode stamping
    // keep their pre-r17 key, so their existing stores stay valid
    // instead of being invalidated once by a trailing separator
    val codeKey = codeOf.map(classStamp).mkString("|")
    val keyMaterial =
      if (codeOf.isEmpty) s"$dir|$srcStamp" else s"$dir|$srcStamp|$codeKey"
    val dirKey = java.security.MessageDigest.getInstance("MD5")
      .digest(keyMaterial.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(12)
    val key = s"$stage-$dirKey"
    val path = new Path(new Path(rootDir), key)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path, "_SUCCESS"))) {
      // partial publish (no _SUCCESS) would otherwise wedge the key:
      // recompute writes tmp, rename fails against the corpse, and
      // the corpse gets read every run — tear it down first. The
      // corpse check is re-done IMMEDIATELY before the delete: a
      // concurrent winner's rename can land between the outer check
      // and here, and deleting its fresh valid store would fail a
      // third reader transiently (it self-heals, but needlessly).
      if (fs.exists(path) && !fs.exists(new Path(path, "_SUCCESS")))
        fs.delete(path, true)
      // Sweep only STALE tmp dirs (older than the grace period) — a
      // recent .tmp-* is likely a live concurrent writer mid-write;
      // deleting it from under the rename loses its (identical) copy
      // for no gain. Crashed writers age past the grace and get swept
      // on a later miss. "Now" is read from the FILESYSTEM's clock
      // (mtime of our own just-created tmp dir), not the driver's
      // (ADVICE r11: on object stores / skewed hosts a wall-clock
      // `now` can shorten the grace and sweep a live writer).
      val graceMs = 10L * 60 * 1000
      val tmp = new Path(path.getParent,
        s".$key.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      fs.mkdirs(tmp)
      val fsNow =
        try fs.getFileStatus(tmp).getModificationTime
        catch { case _: java.io.IOException => System.currentTimeMillis() }
      Option(fs.globStatus(new Path(path.getParent, s".$key.tmp-*")))
        .foreach(_.foreach { s =>
          if (s.getPath != tmp && fsNow - s.getModificationTime > graceMs)
            fs.delete(s.getPath, true)
        })
      compute.write.mode("overwrite").parquet(tmp.toString)
      // source marker published WITH the store (underscore-prefixed:
      // parquet readers ignore it like _SUCCESS) — it lets a later
      // re-key for the SAME (stage, dir) sweep this store instead of
      // orphaning it on disk forever (ADVICE r17)
      try {
        val out = fs.create(new Path(tmp, "_graft_src"), true)
        try out.write(dir.getBytes("UTF-8")) finally out.close()
      } catch { case scala.util.control.NonFatal(_) => () }
      if (fs.exists(new Path(path, "_SUCCESS"))) fs.delete(tmp, true)
      else if (!fs.rename(tmp, path)) fs.delete(tmp, true)
      // STALE-KEY SWEEP (ADVICE r17): a code change re-keys the store
      // for this (stage, dir); the old-key directory would otherwise
      // sit orphaned with no reader. Sweep published siblings of the
      // same stage whose _graft_src marker names OUR dir but whose key
      // differs. Markerless stores (pre-r18, or another sf's) are
      // left alone — deleting an unattributable store risks another
      // workspace's live data for disk hygiene. A concurrent OLD-code
      // JVM reading a swept store recomputes on its next miss.
      try {
        Option(fs.globStatus(new Path(path.getParent, s"$stage-*")))
          .foreach(_.foreach { s =>
            val p = s.getPath
            // exact key shape only: the glob also matches LONGER stage
            // names sharing this prefix ("img-*" catches "img-phash-…"),
            // and those belong to a different stage
            val keyShaped =
              p.getName.matches(java.util.regex.Pattern.quote(stage) +
                "-[0-9a-f]{12}")
            if (keyShaped && p.getName != key &&
                fs.exists(new Path(p, "_SUCCESS"))) {
              val m = new Path(p, "_graft_src")
              val sameDir = fs.exists(m) && {
                val in = fs.open(m)
                try new String(
                  org.apache.commons.io.IOUtils.toByteArray(in),
                  "UTF-8") == dir
                finally in.close()
              }
              if (sameDir) fs.delete(p, true)
            }
          })
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.read.parquet(path.toString).as[T]
  }
}
