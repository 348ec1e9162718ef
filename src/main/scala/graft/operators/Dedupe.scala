package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data
  * pipelines: exact, MinHash+LSH banding, SimHash, and exact n-gram
  * Jaccard verification.
  *
  * All hashes are md5-based so results are engine-independent and
  * oracle-verifiable (DuckDB computes identical md5 hex strings). At
  * 100 TB the plans below are shuffle-minimal:
  *  - exact dedup: one shuffle on the content hash (map-side partial agg
  *    collapses duplicates first);
  *  - MinHash: shingling + signature is embarrassingly parallel
  *    (explode → groupBy doc), the LSH band join shuffles only
  *    (band, band-signature) keys — never all-pairs;
  *  - candidate verification joins only the candidate pairs back to
  *    shingle sets, not the full corpus cross product.
  */
object Dedupe {

  /** Word tokens of a text column (single-space tokenized corpora;
    * for messy text compose with CleanFunctions.collapseWhitespace).
    */
  def words(text: Column): Column = split(text, " ")

  /** Distinct k-word shingles of a text column as an array. Documents
    * shorter than k words yield an empty array.
    */
  def shingles(text: Column, k: Int): Column = {
    val ws = words(text)
    val n = size(ws)
    when(n < k, array().cast("array<string>")).otherwise(
      array_distinct(transform(sequence(lit(0), n - k), i =>
        concat_ws(" ", (0 until k).map(j => element_at(ws, i + j + 1)): _*))))
  }

  /** Exact duplicate groups by md5 of the (already normalized) text.
    * Output: one row per distinct content hash with the surviving id
    * (min) and the number of copies.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("copies"))

  /** (doc, minhash_index, minhash) rows: signature of `numHashes` md5-based
    * min-hashes over k-word shingles. The i-th hash of shingle s is
    * md5(i || ':' || s) — deterministic and portable.
    */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int): DataFrame =
    docs
      .select(col(idCol).as("doc"),
        explode(shingles(col(textCol), shingleK)).as("shingle"))
      .withColumn("i", explode(sequence(lit(0), lit(numHashes - 1))))
      .groupBy(col("doc"), col("i"))
      .agg(min(md5(concat(col("i").cast("string"), lit(":"), col("shingle"))))
        .as("mh"))

  /** LSH candidate pairs + estimated Jaccard.
    *
    * Bands of `rowsPerBand` consecutive hash indices; a pair is a
    * candidate iff ALL hashes agree within at least one band. The band
    * join is an equi-join on (i, mh) followed by a per-(pair, band)
    * count — at scale only colliding minhashes meet, so the shuffle is
    * proportional to true collisions, not |docs|².
    * Output: doc_a < doc_b, est_jaccard = matching_hashes / numHashes.
    */
  def minhashCandidates(sig: DataFrame, numHashes: Int, rowsPerBand: Int)
      : DataFrame = {
    val a = sig.select(col("doc").as("doc_a"), col("i"), col("mh"))
    val b = sig.select(col("doc").as("doc_b"), col("i"), col("mh"))
    val matches = a.join(b, Seq("i", "mh"))
      .filter(col("doc_a") < col("doc_b"))
    val bandHits = matches
      .groupBy(col("doc_a"), col("doc_b"),
        (col("i") / lit(rowsPerBand)).cast("int").as("band"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") === lit(rowsPerBand))
      .select("doc_a", "doc_b").distinct()
    val agree = matches.groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_agree"))
    bandHits.join(agree, Seq("doc_a", "doc_b"))
      .withColumn("est_jaccard", col("n_agree") / lit(numHashes.toDouble))
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** Exact n-gram Jaccard similarity for all pairs within a blocking
    * key (here: pairs sharing at least one shingle — the join IS the
    * block). Output: doc_a < doc_b, jaccard.
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, minJaccard: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"),
      explode(shingles(col(textCol), shingleK)).as("shingle"))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("doc").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter"))
          .cast("double"))
      .filter(col("jaccard") >= lit(minJaccard))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash over distinct words, emitted as a 16-char hex string
    * (portable across engines; no signed-shift pitfalls).
    *
    * Bit j (j = 0..63, MSB-first over md5's first 16 hex chars) is 1 iff
    * the sum over words of (bit_j(md5(word)) ? +1 : -1) is positive.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wordRows = docs.select(col(idCol).as("doc"),
      explode(array_distinct(words(col(textCol)))).as("w"))
      .withColumn("h", md5(col("w")))
      .withColumn("j", explode(sequence(lit(0), lit(63))))
      // nibble value of hex char at position j/4 (0-based), bit (3 - j%4)
      .withColumn("nib",
        expr("instr('0123456789abcdef', substring(h, cast(j / 4 as int) + 1, 1)) - 1"))
      .withColumn("contrib",
        expr("2 * (cast(shiftright(nib, 3 - j % 4) as int) & 1) - 1"))
    val bits = wordRows.groupBy("doc", "j")
      .agg(when(sum("contrib") > 0, 1).otherwise(0).as("bit"))
    val nibbles = bits
      .groupBy(col("doc"), (col("j") / lit(4)).cast("int").as("nib_idx"))
      .agg(sum(expr("shiftleft(bit, 3 - j % 4)")).as("nv"))
      .withColumn("ch", expr("substring('0123456789abcdef', cast(nv as int) + 1, 1)"))
    nibbles.groupBy("doc")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("nib_idx"), col("ch")))),
          x => x.getField("ch")), "").as("simhash"))
  }
}
