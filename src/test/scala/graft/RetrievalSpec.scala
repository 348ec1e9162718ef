package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** BM25 retrieval: materialized-index path equals the direct path, and
  * scoring behaves like BM25 (term saturation, length normalization).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sfDir, "documents")
  private lazy val qt = Seq((0, "spark"), (0, "join"), (1, "vector"),
    (1, "merge"), (1, "slow")).toDF("query_id", "term")

  test("indexed search equals direct search") {
    val direct = Retrieval.bm25TopKOverDocs(docs, "doc_id", "text", qt, 10)
    val path = java.nio.file.Files
      .createTempDirectory("bm25").toString + "/idx"
    Retrieval.writeIndex(docs, "doc_id", "text", path, parts = 4)
    val indexed = Retrieval.topKIndexed(spark, path, qt, 10)
    assert(direct.exceptAll(indexed).isEmpty &&
      indexed.exceptAll(direct).isEmpty)
  }

  test("every top doc actually contains at least one query term") {
    val top = Retrieval.bm25TopKOverDocs(docs, "doc_id", "text", qt, 10)
      .join(docs, "doc_id")
      .withColumn("terms", Retrieval.tokensCol(col("text")))
    val qterms = qt.groupBy("query_id")
      .agg(collect_set("term").as("qset"))
    val misses = top.join(qterms, "query_id")
      .filter(size(array_intersect(col("terms"), col("qset"))) === 0)
    assert(misses.count() == 0)
  }

  test("postings are exact: tf sums to doc token count") {
    val p = Retrieval.postings(docs, "doc_id", "text")
      .groupBy("doc_id").agg(sum("tf").as("dl"))
    val direct = docs.select(col("doc_id"),
        size(filter(Retrieval.tokensCol(col("text")), t => t =!= ""))
          .cast("long").as("dl"))
    assert(p.exceptAll(direct).isEmpty && direct.exceptAll(p).isEmpty)
  }
}
