package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Banded Hamming near-dup over 64-bit perceptual/fingerprint hashes —
  * the shared candidate engine behind image (aHash) and video
  * (per-frame pHash) near-dup, hardened for adversarial mass
  * duplication (round-8 verdict: the inline q_image_neardup band join
  * had no degenerate-bucket discipline, so one logo × 10M copies —
  * identical aHash in every band — recreated the C(n,2) hot-bucket
  * quadratic the MinHash lane capped in round 4).
  *
  * Two defenses, both wired here:
  *
  *  1. REPRESENTATIVE COLLAPSE. The band join runs over DISTINCT
  *     hashes (one representative = min id per hash), never over
  *     members — so a mass-duplicated payload contributes exactly ONE
  *     row per band regardless of its copy count, and candidate
  *     volume scales with the number of distinct hashes (bounded by
  *     content diversity), not corpus size. Identical-hash members
  *     rejoin AFTER the Hamming verification, by an equi-join on the
  *     full 64-bit hash.
  *  2. `maxBucket` cap, threaded with [[TextOps.minhashPairsOf]]'s
  *     exact semantics: the LEFT (smaller-rep) side of the candidate
  *     join keeps the `maxBucket` lowest representatives per
  *     (band, key) bucket while the right side stays complete —
  *     every representative is still verified against the bucket's
  *     retained members, so per-bucket candidates are K·n instead of
  *     C(n,2) even when DISTINCT hashes degenerate into one bucket
  *     (e.g. near-black photos whose high bands are all zero).
  *
  * Banding guarantee: `nBands` bands of 64/nBands bits are EXACT for
  * Hamming ≤ nBands − 1 (pigeonhole: fewer flipped bits than bands →
  * some band untouched), so maxHamming ≤ nBands − 1 is enforced.
  * Band width is the scale knob measured by ImageDedupScaleProbe:
  * 4×16-bit cuts cross-content coincidence candidates 512× vs 8×8-bit
  * while still guaranteeing the Hamming ≤ 3 that codec re-encodes
  * actually produce.
  *
  * [[pairs64]] emits the exact pair set — output is inherently
  * C(n,2)-sized under mass duplication (that is the answer's size,
  * not a join blowup), so it is the gate/small-scale form.
  * [[clusters64]] is the 100 TB production form: near-dup CLUSTER
  * labels (member → min-id representative of its connected component)
  * in output linear in the corpus, with the component resolution run
  * at hash level (O(distinct hashes), pointer-jumping CC).
  */
object HammingDedup {

  /** Hot-bucket cap for the declared capped queries — the MinHash
    * `CapBucket` discipline: far above any bucket size a diverse
    * corpus produces at gate scale (65536 buckets/band), so the
    * declared queries stay exact while degenerate buckets stay
    * bounded. */
  val CapBucket = 64

  /** (band, key) exploded view of a (id, hash) frame. */
  private def banded(df: DataFrame, idC: String, hashC: String,
      nBands: Int): DataFrame = {
    val bits = 64 / nBands
    val mask = (1L << bits) - 1
    df.select(col(idC), col(hashC),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col(hashC), b * bits).bitwiseAND(lit(mask)).as("key"))): _*))
        .as("bk"))
      .select(col(idC), col(hashC),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Verified near-dup pairs at HASH level: unordered (ha, hb),
    * ha's representative < hb's representative, 1 ≤ hamming ≤
    * maxHamming, via the rep-collapsed capped band join. Also returns
    * the persisted reps frame (caller unpersists). */
  private def nearHashPairs(members: DataFrame, nBands: Int,
      maxHamming: Int, maxBucket: Option[Int]): (DataFrame, DataFrame) = {
    val reps = members.groupBy(col("__h"))
      .agg(min(col("__id")).as("__rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandedAll = banded(reps, "__rep", "__h", nBands)
    val bandedA = maxBucket match {
      case None => bandedAll
      case Some(k) =>
        // rank within bucket by rep; the window shuffles on the same
        // (band, key) key the candidate join needs
        bandedAll
          .withColumn("__r", row_number().over(
            Window.partitionBy(col("band"), col("key")).orderBy(col("__rep"))))
          .filter(col("__r") <= k).drop("__r")
    }
    val pairs = bandedA.as("a").join(bandedAll.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.__rep") < col("b.__rep"))
      .select(col("a.__h").as("ha"), col("b.__h").as("hb"))
      .distinct() // a hash pair may collide in several bands — once
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxHamming)
    (pairs, reps)
  }

  /** All unordered id pairs (id_a < id_b) whose hashes are within
    * `maxHamming`. Exact when `maxBucket` is None or no (band, key)
    * bucket exceeds the cap at DISTINCT-hash granularity. The result
    * is materialized (persisted, owned by the caller / reclaimed by
    * `clearCache`) and the wide intermediates are released before
    * returning — the [[TextOps.minhashPairsOfHashes]] lifecycle. */
  def pairs64(hashed: DataFrame, idCol: String, hashCol: String,
      nBands: Int = 4, maxHamming: Int = 3,
      maxBucket: Option[Int] = None): DataFrame = {
    require(64 % nBands == 0, s"nBands=$nBands must divide 64")
    require(maxHamming < nBands,
      s"banding is exact only for maxHamming < nBands ($maxHamming vs $nBands)")
    val members = hashed.select(col(idCol).as("__id"), col(hashCol).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (hp, reps) = nearHashPairs(members, nBands, maxHamming, maxBucket)
    // cross-hash expansion: members of ha × members of hb (ids are
    // distinct across different hashes' member sets? no — an id has
    // ONE hash, so the two member sets are disjoint and least/greatest
    // canonicalizes the unordered pair exactly once)
    val cross = hp
      .join(members.select(col("__id").as("__ia"), col("__h").as("ha")), Seq("ha"))
      .join(members.select(col("__id").as("__ib"), col("__h").as("hb")), Seq("hb"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"))
    // within-hash expansion (hamming 0): equi-join on the full hash
    val within = members.as("a").join(members.as("b"),
        col("a.__h") === col("b.__h") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
    val out = cross.union(within)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize, then release the wide intermediates
    reps.unpersist(false)
    members.unpersist(false)
    out
  }

  /** Near-dup CLUSTER labels — the linear-output production form:
    * (id, cluster) where cluster is the minimum id over the connected
    * near-dup component (edges = hash pairs within `maxHamming`).
    * Component resolution runs at HASH level (nodes are the distinct
    * hashes' representatives), so a pattern duplicated 10M times costs
    * one CC node; members join their label back by hash. */
  def clusters64(hashed: DataFrame, idCol: String, hashCol: String,
      nBands: Int = 4, maxHamming: Int = 3,
      maxBucket: Option[Int] = Some(CapBucket)): DataFrame = {
    require(64 % nBands == 0, s"nBands=$nBands must divide 64")
    require(maxHamming < nBands,
      s"banding is exact only for maxHamming < nBands ($maxHamming vs $nBands)")
    val members = hashed.select(col(idCol).as("__id"), col(hashCol).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (hp, reps) = nearHashPairs(members, nBands, maxHamming, maxBucket)
    // rep-level edges; CC labels are min-rep per component, and since
    // each rep is the min id of its hash group, the label is the min
    // id over the whole component
    val repPairs = hp
      .join(reps.select(col("__h").as("ha"), col("__rep").as("ra")), Seq("ha"))
      .join(reps.select(col("__h").as("hb"), col("__rep").as("rb")), Seq("hb"))
      .select(col("ra"), col("rb"))
    val cc = Graph.connectedComponents(repPairs)
    val labels = reps.join(cc, reps("__rep") === cc("node"), "left")
      .select(col("__h"),
        coalesce(col("label"), col("__rep")).as("cluster"))
    val out = members.join(labels, Seq("__h"))
      .select(col("__id").as(idCol), col("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    reps.unpersist(false)
    members.unpersist(false)
    out
  }
}
