package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** SemDeDup (Similarity.semDedup): output shape, brute-force keep/drop
  * consistency, and salt invariance.
  */
class SemDedupSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sfDir, "embeddings")

  private lazy val result = Similarity.semDedup(
    emb, "vec_id", "embedding", k = 8, iters = 2, threshold = 0.35,
    dim = 64, maxBlock = 256).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))

  test("semDedup emits every input id exactly once") {
    val ids = result.map(_._1)
    assert(ids.length == emb.count())
    assert(ids.distinct.length == ids.length)
  }

  test("drop decisions match a brute-force within-cell recompute") {
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val cellOf = result.map(r => r._1 -> r._2).toMap
    for ((id, cell, keep) <- result) {
      val hasLowerNeighbor = cellOf.exists { case (o, c) =>
        c == cell && o < id && cos(vecs(o), vecs(id)) >= 0.35 }
      assert(keep == !hasLowerNeighbor,
        s"vec $id cell $cell: keep=$keep but lower-id neighbor " +
          s"present=$hasLowerNeighbor")
    }
    // the corpus must exercise both branches
    assert(result.exists(_._3) && result.exists(!_._3))
  }

  test("salting is invisible: maxBlock=32 equals maxBlock=4096") {
    val small = Similarity.semDedup(emb, "vec_id", "embedding",
      k = 8, iters = 2, threshold = 0.35, dim = 64, maxBlock = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(small.sortBy(_._1).toSeq == result.sortBy(_._1).toSeq)
  }
}
