package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search coverage over the `embeddings` table
  * (`array<float>` column): brute-force cosine top-k (baseline) and
  * label-bucketed stats. Outputs are integer-only (ids + ranks) so they
  * are robust to last-bit floating-point differences between engines —
  * rank flips would need two cosines within ~1e-12, which the continuous
  * random embeddings never produce.
  */
object SimilarityQueries extends QueryPack {

  /** Brute-force cosine top-10 for the first 10 query vectors:
    * broadcast(queries) × corpus scan — the corpus is never shuffled.
    */
  val q30 = Q("q30_ann_bruteforce",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", k = 10)
        .select(col("vec_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))
    },
    Some("""
      WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      scored AS (SELECT q.vec_id, c.vec_id AS neighbor_id,
          list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                 CAST(c.embedding AS DOUBLE[])) AS cos
        FROM q CROSS JOIN embeddings c
        WHERE c.vec_id <> q.vec_id)
      SELECT vec_id, CAST(rn AS BIGINT) AS rank, neighbor_id
      FROM (SELECT vec_id, neighbor_id, row_number() OVER
              (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id ASC) AS rn
            FROM scored)
      WHERE rn <= 10"""))

  /** Per-label embedding stats: counts plus min/max L2 norm (min/max are
    * order-independent so exact across engines; the norm itself is a
    * deterministic left-to-right fold in index order on both sides).
    */
  val q31 = Q("q31_embedding_stats",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      val norm = sqrt(aggregate(zip_with(dbl, dbl, _ * _), lit(0.0), _ + _))
      emb.select(col("label"), norm.as("norm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          min("norm").as("min_norm"), max("norm").as("max_norm"))
    },
    Some("""
      WITH n AS (SELECT label,
          sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[]))) AS norm
        FROM embeddings)
      SELECT label, COUNT(*) AS n, MIN(norm) AS min_norm,
             MAX(norm) AS max_norm
      FROM n GROUP BY label"""))

  override def all: Seq[Q] = Seq(q30, q31)
}
