package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedupe

/** r17 optimization guard: connectedComponents' bounded driver-side
  * union-find (the default path for edge sets under the cap) must
  * produce EXACTLY the labels of the distributed min-label propagation
  * it short-circuits (`localEdgeCap = 0` forces the old path).
  */
class ConnectedComponentsLocalSpec extends SparkSpec {

  private def labelsOf(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("local union-find equals distributed propagation on real pairs") {
    val docs = Tables(spark, sfDir, "documents")
    val sig = Dedupe.minhashWide(docs, "doc_id", "text", 3, 16,
      withCount = true)
    val cand = graft.core.CacheHandle.eager(graft.core.CacheHandle
      .session.track(
        Dedupe.minhashCandidatePairs(sig, 16, 4, minSizeRatio = 0.5)
          .persist()))
    val pairs = Dedupe.verifyJaccardOneJoin(cand, docs, "doc_id",
      "text", 3, 0.5).persist()
    try {
      val local = labelsOf(Dedupe.connectedComponents(
        pairs, "doc_a", "doc_b", distinctEdges = true))
      val dist = labelsOf(Dedupe.connectedComponents(
        pairs, "doc_a", "doc_b", distinctEdges = true, localEdgeCap = 0))
      assert(local.nonEmpty, "expected a non-trivial duplicate graph")
      assert(local == dist)
    } finally pairs.unpersist()
  }

  test("chain graph: transitive closure, min-id labels, both paths") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.LongType)))
    // chain 9-7-5-3 plus pair (2,8) plus self-contained (10,10)
    val edges = spark.createDataFrame(Seq(
      (9L, 7L), (7L, 5L), (5L, 3L), (2L, 8L), (10L, 10L))
      .map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava,
      schema)
    val expect = Map(9L -> 3L, 7L -> 3L, 5L -> 3L, 3L -> 3L,
      2L -> 2L, 8L -> 2L, 10L -> 10L)
    assert(labelsOf(Dedupe.connectedComponents(edges, "a", "b")) == expect)
    assert(labelsOf(Dedupe.connectedComponents(edges, "a", "b",
      localEdgeCap = 0)) == expect)
  }
}
