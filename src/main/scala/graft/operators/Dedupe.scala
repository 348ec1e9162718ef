package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.CacheHandle

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

  /** All k-word shingles WITH multiplicity (repetition metrics need the
    * counts; dedup/minhash want the distinct set — see [[shingleRows]]).
    *
    * Built by zipping the word array with its own k-1 shifted slices
    * and exploding once: pure codegen'd expressions, NO shuffle. This
    * replaced the posexplode + window-lead form (which shuffles and
    * sorts every word row to line up the leads) — measured 2.4× faster
    * at sf0.1 (0.24s vs 0.58s steady-state), identical rows. The
    * array-HOF transform variant remains the worst of the three (3.6s —
    * interpreted per-element lambdas).
    */
  def shingleRowsAll(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocChars: Int = TextAnalysis.defaultMaxDocChars)
      : DataFrame = {
    val ws = split(TextAnalysis.capDoc(col(textCol), maxDocChars), " ")
    val slices = (0 until k).map { j =>
      if (j == 0) ws
      else slice(ws, lit(j + 1), greatest(size(ws) - j, lit(0)))
    }
    val parts = (0 until k).map(j => col("z").getField(j.toString))
    docs.select(col(idCol).as("doc"),
        explode(arrays_zip(slices: _*)).as("z"))
      // arrays_zip pads to the longest input: rows whose last slice
      // ran out are partial shingles — drop them
      .filter(parts.last.isNotNull)
      .select(col("doc"), concat_ws(" ", parts: _*).as("shingle"))
  }

  def shingleRows(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocChars: Int = TextAnalysis.defaultMaxDocChars)
      : DataFrame =
    shingleRowsAll(docs, idCol, textCol, k, maxDocChars).distinct()

  /** (doc, minhash_index, minhash) rows: signature of `numHashes` md5-based
    * min-hashes over k-word shingles. The i-th hash of shingle s is
    * md5(i || ':' || s) — deterministic and portable.
    *
    * All hashes reduce in ONE aggregation pass over the shingle rows
    * (numHashes min-columns, then a stack unpivot): the shuffle carries
    * |docs| × numHashes values, never |shingles| × numHashes rows.
    */
  /** The modulus for the affine minhash permutations (2^31-1, prime). */
  final val MinhashP = 2147483647L
  /** i-th permutation of a base hash h: (a_i·h + b_i) mod p. */
  def permute(i: Int, h: Column): Column =
    (lit(2L * i + 1) * h + lit(104729L * i + 12345L)) % lit(MinhashP)

  /** One row per doc: (doc, sig array<long> of `numHashes` minhashes,
    * index order). Docs shorter than `shingleK` words emit no row.
    *
    * Computed by the codegen'd [[graft.functions.MinHashSigExpr]]: the
    * whole signature is ONE per-row loop over the text's byte slices —
    * zero explode, zero shuffle. This replaced the shingle-explode +
    * groupBy-doc plan (still available as [[minhashWideFromShingles]]
    * for callers with precomputed shingle frames): at sf0.1 the explode
    * form materialized ~3M (doc, shingle) rows and shuffled a
    * corpus-scale aggregation just to reduce per-document minima.
    * Hash-identical output (spec-asserted against the explode form).
    */
  def minhashWide(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int,
      maxDocChars: Int = TextAnalysis.defaultMaxDocChars,
      withCount: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    docs.select(col(idCol).as("doc"),
        ColumnBridge.column(graft.functions.MinHashSigExpr(
          ColumnBridge.expression(
            TextAnalysis.capDoc(col(textCol), maxDocChars)),
          shingleK, numHashes, withCount)).as("sig"))
      // the groupBy form emits no row for docs with < k words; the
      // expression returns an empty array for them — drop for parity
      .filter(size(col("sig")) > 0)
  }

  /** Signature from precomputed (doc, shingle) rows — callers that also
    * need the shingle frame elsewhere (e.g. exact verification) compute
    * it ONCE, persist, and pass it here; at 100 TB re-deriving the
    * shingle explode per consumer is the dominant waste.
    */
  def minhashWideFromShingles(sh: DataFrame, numHashes: Int): DataFrame = {
    val hashed = sh.withColumn("h",
      conv(substring(md5(col("shingle")), 1, 7), 16, 10).cast("long"))
    val mins = (0 until numHashes).map(i =>
      min(permute(i, col("h"))).as(s"mh$i"))
    hashed.groupBy("doc").agg(mins.head, mins.tail: _*)
      .select(col("doc"),
        array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"))
  }

  /** Long form (doc, i, mh) of the wide signature (unpivot). */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int): DataFrame =
    minhashWide(docs, idCol, textCol, shingleK, numHashes)
      .select(col("doc"), posexplode(col("sig")).as(Seq("i", "mh")))

  /** LSH candidate pairs + estimated Jaccard, from wide signatures.
    *
    * Bands of `rowsPerBand` consecutive hash indices; a pair is a
    * candidate iff ALL hashes agree within at least one band — i.e. the
    * joined band signatures collide. Joining on the whole band signature
    * (not single minhashes) keeps join buckets tiny: single-hash buckets
    * degenerate on low-entropy corpora where many documents share the
    * globally smallest shingle hash. Each side carries its full
    * signature array, so per-pair agreement is an in-row zip_with —
    * no re-join of the signature table. Work stays proportional to true
    * collisions, never |docs|².
    * Output: doc_a < doc_b, est_jaccard = matching_hashes / numHashes.
    */
  def minhashCandidates(sigWide: DataFrame, numHashes: Int,
      rowsPerBand: Int, caches: CacheHandle = CacheHandle.session)
      : DataFrame = {
    val nBands = numHashes / rowsPerBand
    // persist + MATERIALIZE the banded signatures: the self-join below
    // consumes this frame on BOTH sides, and because the two sides
    // project different aliases (doc_a / doc_b) Catalyst does NOT
    // reuse the exchange — and the two sides are concurrent AQE stages
    // of one action, so a lazy persist still executes the whole
    // upstream signature pipeline twice as the stages race
    // (CacheHandle.eager). The frame is |docs| × nBands rows of
    // (doc, sig, band, band_sig) — small at any corpus size that fits
    // a cluster. Long-lived callers pass a live CacheHandle and
    // release() after materializing; by default the frame ages out
    // with clearCache()/the session.
    val bands = CacheHandle.eager(caches.track(sigWide
      .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("band_sig", array_join(
        transform(
          slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")),
        "|"))
      .persist()))
    val a = bands.select(col("doc").as("doc_a"), col("sig").as("sig_a"),
      col("band"), col("band_sig"))
    val b = bands.select(col("doc").as("doc_b"), col("sig").as("sig_b"),
      col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"))
      .withColumn("n_agree",
        size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _),
          x => x)))
      .withColumn("est_jaccard", col("n_agree") / lit(numHashes.toDouble))
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** LSH candidate PAIRS only (no Jaccard estimate) via bucket
    * grouping: band signatures collapse to (band, band_sig) buckets
    * and each bucket emits its pairwise combinations in-row.
    *
    * vs [[minhashCandidates]]'s self-join: the signature pipeline has
    * exactly ONE consumer here, so no persist / eager materialization
    * job is needed (the self-join reads the banded frame on both
    * aliased sides, which AQE races as concurrent stages), and the
    * band shuffle moves each (doc, band, band_sig) row once instead
    * of twice. One groupBy shuffle + one distinct shuffle, one job.
    *
    * Scale note: a bucket's doc list lives in one aggregation row, so
    * memory is bounded by the largest LSH bucket. Buckets are identical
    * band signatures — after exact dedup (run [[exactGroups]] first, as
    * the reference pipeline does) that is the near-dup cluster size,
    * and the pair EXPLOSION is n² in bucket size either way (the
    * self-join emits the same n² rows). For corpora where giant
    * identical-signature buckets must survive, use the self-join form.
    * Callers needing est_jaccard (q24) also stay on minhashCandidates.
    */
  /** `minSizeRatio > 0` prunes pairs that provably cannot pass exact
    * Jaccard verification at that threshold: J(A,B) ≤ min(|A|,|B|) /
    * max(|A|,|B|) (intersection bounded by the smaller set, union by
    * the larger), so pairs whose DISTINCT-shingle-count ratio is below
    * the verify threshold are dropped in-row before they ever reach
    * the verify join — requires `sigWide` built with
    * `minhashWide(..., withCount = true)` (the count rides as the
    * signature's trailing element; band slices never read it).
    */
  def minhashCandidatePairs(sigWide: DataFrame, numHashes: Int,
      rowsPerBand: Int, dedup: Boolean = true,
      minSizeRatio: Double = 0.0): DataFrame = {
    val nBands = numHashes / rowsPerBand
    val cnt =
      if (minSizeRatio > 0) element_at(col("sig"), numHashes + 1)
      else lit(0L)
    val bands = sigWide
      .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("band_sig", array_join(
        transform(
          slice(col("sig"), col("band") * rowsPerBand + 1,
            lit(rowsPerBand)),
          x => x.cast("string")),
        "|"))
      .select(col("doc"), cnt.as("cnt"), col("band"), col("band_sig"))
    val buckets = bands.groupBy("band", "band_sig")
      .agg(sort_array(collect_list(struct(col("doc"), col("cnt"))))
        .as("ds"))
      .filter(size(col("ds")) > 1)
    // in-row i<j combinations of the sorted bucket: doc_a < doc_b by
    // construction (struct sort orders by doc first). A pair sharing
    // several bands appears once per band; `dedup = false` skips the
    // DISTINCT exchange for consumers that collapse duplicates anyway
    // (NOT verifyJaccardOneJoin — its regroup counts rows, see its
    // scaladoc). The size-ratio prune runs inside the emit lambda, so
    // hopeless pairs never even reach the dedup exchange.
    def emit(a: Column, b: Column): Column = struct(
      a("doc").as("doc_a"), b("doc").as("doc_b"),
      (least(a("cnt"), b("cnt")).cast("double") >=
        greatest(a("cnt"), b("cnt")) * lit(minSizeRatio)).as("keep"))
    val pairs = buckets
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ds")) - 2),
        i => filter(
          transform(
            sequence(i + 1, size(col("ds")) - 1),
            j => emit(element_at(col("ds"), i + 1),
              element_at(col("ds"), j + 1))),
          p => p("keep"))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    if (dedup) pairs.distinct() else pairs
  }

  /** Incremental cross-corpus LSH candidates: near-dup pairs between a
    * NEW batch and the EXISTING corpus, from their (independently
    * computed) wide signatures — the nightly-ingest shape, where the
    * corpus signature table is materialized once and only the new
    * batch's signatures are computed per run. Dedup-within-batch is
    * [[minhashCandidates]]'s job; this finds new-vs-corpus collisions
    * without re-banding or re-scanning corpus text.
    *
    * Scale shape: both sides explode to (doc, band, band_sig) keys and
    * equi-join on the full band signature — work scales with true
    * collisions, and the (usually small) new-batch side is the natural
    * broadcast candidate, which AQE converts at runtime. No self-join,
    * so no doc_a < doc_b filter: output is (new_doc, corpus_doc).
    */
  def minhashCandidatesAgainst(newSig: DataFrame, corpusSig: DataFrame,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    val nBands = numHashes / rowsPerBand
    def banded(sig: DataFrame, docAs: String, sigAs: String): DataFrame =
      sig
        .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
        .withColumn("band_sig", array_join(
          transform(
            slice(col("sig"), col("band") * rowsPerBand + 1,
              lit(rowsPerBand)),
            x => x.cast("string")),
          "|"))
        .select(col("doc").as(docAs), col("sig").as(sigAs), col("band"),
          col("band_sig"))
    // no persist: unlike the self-join in minhashCandidates, each
    // side's signature pipeline executes exactly once here
    banded(newSig, "new_doc", "sig_n")
      .join(banded(corpusSig, "corpus_doc", "sig_c"),
        Seq("band", "band_sig"))
      .groupBy("new_doc", "corpus_doc")
      .agg(first(col("sig_n")).as("sig_n"), first(col("sig_c")).as("sig_c"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_n"), col("sig_c"), _ === _), x => x))
          / lit(numHashes.toDouble))
      .select("new_doc", "corpus_doc", "est_jaccard")
  }

  /** Pairs-only variant of [[minhashCandidatesAgainst]]: batch-vs-corpus
    * LSH candidates WITHOUT the est_jaccard estimate, so the band join
    * carries (doc, band, band_sig) keys only — no signature arrays move
    * through the shuffle or the dedup exchange. The nightly-ingest fast
    * path: downstream exact verification re-derives what it needs from
    * the base table, so hauling 16-long arrays per banded row to compute
    * an estimate nobody reads is pure waste at corpus scale.
    * Output: (new_doc, corpus_doc), distinct.
    */
  def minhashCandidatePairsAgainst(newSig: DataFrame, corpusSig: DataFrame,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    val nBands = numHashes / rowsPerBand
    def banded(sig: DataFrame, docAs: String): DataFrame =
      sig
        .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
        .withColumn("band_sig", array_join(
          transform(
            slice(col("sig"), col("band") * rowsPerBand + 1,
              lit(rowsPerBand)),
            x => x.cast("string")),
          "|"))
        .select(col("doc").as(docAs), col("band"), col("band_sig"))
    banded(newSig, "new_doc")
      .join(banded(corpusSig, "corpus_doc"), Seq("band", "band_sig"))
      .select("new_doc", "corpus_doc")
      .distinct()
  }

  /** The ACTUALLY-incremental nightly dedup pass: cluster a new batch
    * against a corpus whose MinHash signatures and component labels were
    * PERSISTED by a previous run — only the batch is signed; no corpus
    * text is re-read and no corpus signature is re-computed.
    *
    * This is the difference between demonstrating the operator and
    * demonstrating the pipeline: at 100 TB, re-signing the corpus every
    * night costs the same as from-scratch clustering
    * ([[connectedComponents]] over everything), which makes the
    * incremental operator pointless. Reading yesterday's signature table
    * (the matview-style cache-the-heavy-thing pattern — reference
    * analog `common/popularity/README.md:9-12`) makes the nightly cost
    * O(batch + true collisions), independent of corpus size.
    *
    * Inputs: `corpusBands` (doc, band, band_sig, cnt) and
    * `corpusLabels` (node, label) as persisted by
    * [[SignatureStore.ensureCorpusState]] — the banding index is part
    * of the store, so the nightly path never re-derives it; `batch` =
    * tonight's new documents; `textLookup` = a table resolving ANY
    * candidate doc id (batch or corpus) to its text — exact verification
    * broadcast-semi-joins the small candidate id set against it, so only
    * flagged documents' text is ever read.
    *
    * Plan shape: one codegen'd signature map over the batch (banded +
    * persisted — consumed by its own bucket rows and the corpus
    * prefilter key set), a broadcast semi-join that streams the corpus
    * BAND scan down to colliding rows BEFORE any exchange,
    * one bucket aggregation over batch + colliding rows, exact verify
    * over candidate pairs, and [[incrementalComponents]]' label
    * contraction (≤ |new edges| rows propagated; the corpus label
    * table only ever streams against broadcast sides). Shuffled bytes
    * are O(batch + true collisions) end to end.
    *
    * Output: (node, label) for every clustered doc — identical to a
    * from-scratch [[connectedComponents]] over the full corpus ∪ batch
    * (LSH banding is per-document deterministic, so the incremental
    * candidate arms partition the full-corpus candidate set exactly).
    */
  /** Banded rows of a wide signature table (built `withCount = true`):
    * (doc, band, band_sig, cnt) — the persisted form of the LSH
    * banding index. Building these rows costs an interpreted
    * slice/join pass per signature, so a store computes them ONCE per
    * corpus version ([[SignatureStore.build]]/appendBatch) instead of
    * re-deriving them from signatures every night (measured ~2.5s of
    * the nightly floor at the 100× dir).
    */
  def bandRowsOf(sigWide: DataFrame, numHashes: Int, rowsPerBand: Int)
      : DataFrame = {
    val nBands = numHashes / rowsPerBand
    sigWide
      .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("band_sig", array_join(
        transform(
          slice(col("sig"), col("band") * rowsPerBand + 1,
            lit(rowsPerBand)),
          x => x.cast("string")),
        "|"))
      .select(col("doc"), col("band"), col("band_sig"),
        // fail fast on a count-less signature table (withCount=false):
        // a silently-NULL cnt would make the size-ratio prune drop
        // candidate pairs — duplicates missed with no error
        when(size(col("sig")) === numHashes + 1,
          element_at(col("sig"), numHashes + 1))
          .otherwise(raise_error(concat(
            lit(s"bandRowsOf: expected signature arrays of ${numHashes + 1} " +
              "elements (numHashes + trailing distinct-shingle count; " +
              "build with withCount=true), got "),
            size(col("sig")).cast("string"))))
          .as("cnt"))
  }

  def incrementalFromStore(corpusBands: DataFrame, corpusLabels: DataFrame,
      batch: DataFrame, textLookup: DataFrame, idCol: String,
      textCol: String, shingleK: Int, numHashes: Int, rowsPerBand: Int,
      minJaccard: Double, caches: CacheHandle = CacheHandle.session)
      : DataFrame =
    incrementalFromStoreWithDelta(corpusBands, corpusLabels, batch,
      textLookup, idCol, textCol, shingleK, numHashes, rowsPerBand,
      minJaccard, caches)._1

  /** [[incrementalFromStore]] plus the label DELTA (see
    * [[incrementalComponentsWithDelta]]) — the frame an O(changed)
    * nightly label commit persists. Both outputs are lazy plans over
    * the same candidate/verify lineage; consuming only one costs
    * nothing for the other.
    */
  /** @param preSigned when Some, an ALREADY-persisted-and-materialized
    *   wide signature frame for `batch` ([[minhashWide]] with
    *   withCount=true) — the nightly loop signs the batch exactly once
    *   and shares the frame between this candidate pass and the
    *   store's segment commit ([[SignatureStore.foldNight]]); when
    *   None, the batch is signed (and cached) here.
    */
  def incrementalFromStoreWithDelta(corpusBands: DataFrame,
      corpusLabels: DataFrame, batch: DataFrame, textLookup: DataFrame,
      idCol: String, textCol: String, shingleK: Int, numHashes: Int,
      rowsPerBand: Int, minJaccard: Double,
      caches: CacheHandle = CacheHandle.session,
      preSigned: Option[DataFrame] = None)
      : (DataFrame, DataFrame) = {
    // Candidate pass, O(batch + true collisions) SHUFFLED BYTES: the
    // batch is signed once (codegen'd map), banded, and persisted (two
    // consumers: its own bucket rows and the corpus prefilter key set);
    // the corpus side is a columnar read of the persisted BAND table
    // (doc, band, band_sig, cnt — banding computed once per corpus
    // version, never re-derived nightly) whose rows are SEMI-JOINED
    // against the batch's (band, band_sig) key set BEFORE the bucket
    // shuffle. The key set is batch-sized, so the planner broadcasts it
    // and the corpus scan streams — no corpus row ever enters an
    // exchange unless it collides with a batch band. (The r13 sf10
    // probe motivated this: without the prefilter the bucket groupBy
    // shuffled every corpus band row, which made the "incremental" pass
    // scale with |corpus| — batch-size-insensitive wall times.) Within-
    // batch and batch-vs-corpus candidates still fall out of the SAME
    // buckets, pairs are emitted in-row with an is_new flag, and
    // corpus-corpus pairs (already folded into the persisted labels)
    // cannot survive the prefilter+is_new gate.
    //
    // batch signatures carry the trailing distinct-shingle count, like
    // the persisted corpus bands — the size-ratio verify-prune
    // (see minhashCandidatePairs) then drops provably-hopeless pairs
    // in-row before the verify ever sees them.
    // The WIDE signature frame is what gets persisted (not the banded
    // rows): the banding is a cheap explode over the cached
    // signatures, and caching the wide form lets the nightly commit
    // ([[SignatureStore.foldNight]]) reuse the exact same frame — the
    // batch text is scanned and MinHashed ONCE per night, not once for
    // candidates and again for the segment write.
    val sig = preSigned.getOrElse(CacheHandle.eager(caches.track(
      minhashWide(batch, idCol, textCol, shingleK, numHashes,
        withCount = true).persist())))
    val batchBands = bandRowsOf(sig, numHashes, rowsPerBand)
      .withColumn("is_new", lit(true))
    val corpusHits = corpusBands.withColumn("is_new", lit(false))
      .join(batchBands.select("band", "band_sig").distinct(),
        Seq("band", "band_sig"), "left_semi")
    val buckets = batchBands.unionByName(corpusHits)
      .groupBy("band", "band_sig")
      .agg(sort_array(collect_list(struct(col("doc"),
        col("cnt"), col("is_new")))).as("ds"))
      .filter(size(col("ds")) > 1 &&
        exists(col("ds"), d => d("is_new")))
    val pairs = buckets
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ds")) - 2),
        i => filter(
          transform(
            sequence(i + 1, size(col("ds")) - 1),
            j => struct(
              element_at(col("ds"), i + 1)("doc").as("doc_a"),
              element_at(col("ds"), j + 1)("doc").as("doc_b"),
              ((element_at(col("ds"), i + 1)("is_new") ||
                element_at(col("ds"), j + 1)("is_new")) &&
                least(element_at(col("ds"), i + 1)("cnt"),
                    element_at(col("ds"), j + 1)("cnt")).cast("double") >=
                  greatest(element_at(col("ds"), i + 1)("cnt"),
                    element_at(col("ds"), j + 1)("cnt")) * lit(minJaccard))
                .as("keep"))),
          p => p("keep"))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    // inline verify: the candidate frame has ONE consumer (the role-row
    // broadcast build), so verification flows lazily into the edge
    // persist inside incrementalComponents
    val verified = verifyJaccardInline(pairs.distinct(), textLookup,
      idCol, textCol, shingleK, minJaccard)
    incrementalComponentsWithDelta(corpusLabels, verified, "doc_a",
      "doc_b", caches = caches)
  }

  /** Exact n-gram Jaccard for a given set of candidate pairs
    * (doc_a, doc_b) — the LSH-prefilter + exact-verify scale path:
    * shingle sets are joined only for candidates.
    */
  def verifyJaccard(candidates: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, shingleK: Int, minJaccard: Double): DataFrame =
    verifyJaccardShingled(candidates,
      shingleRows(docs, idCol, textCol, shingleK), minJaccard)

  /** Exact Jaccard verification where the DISTINCT is pushed BELOW the
    * candidate filter: only candidate documents' shingles are deduped
    * and joined. At corpus scale the candidate set is orders of
    * magnitude smaller than the corpus, so deduplicating every
    * document's shingles globally (a full shuffle of all shingle rows)
    * to verify a few pairs is the dominant waste — this semi-joins the
    * raw shingle rows down to candidate docs first (broadcast of the
    * candidate doc ids), then dedupes the small remainder. Results are
    * identical: jaccard is over per-doc distinct shingle SETS either
    * way. Pass `candidates` persisted — it is consumed three times
    * (both doc-id sides and the intersection join).
    */
  def verifyJaccardForCandidates(candidates: DataFrame, shAll: DataFrame,
      minJaccard: Double, caches: CacheHandle = CacheHandle.session)
      : DataFrame = {
    // one scan of `candidates` (explode, not a two-arm union whose
    // stages would race to compute a lazily-persisted candidate frame)
    val candDocs = candidates
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .distinct()
    // persist + materialize the candidates-only shingle set:
    // verifyJaccardShingled reads it THREE times (both intersection
    // sides + the size table), and each unpersisted read would
    // re-derive the FULL corpus shingle explode behind the semi-join —
    // eager, because the three consumers are concurrent AQE stages of
    // ONE action (CacheHandle.eager). The frame is small (candidate
    // docs only); long-lived callers release it via a live
    // CacheHandle, or it ages out with clearCache()/the session.
    val sh = CacheHandle.eager(caches.track(
      shAll.join(broadcast(candDocs), Seq("doc")).distinct().persist()))
    verifyJaccardShingled(candidates, sh, minJaccard)
  }

  /** Exact Jaccard verification that re-derives shingles ONLY for the
    * candidate documents, from the BASE table: the candidate doc ids
    * (tiny) broadcast-semi-join `docs` first, and the shingle explode
    * runs over that small remainder. Unlike
    * [[verifyJaccardForCandidates]] — which filters an already-exploded
    * corpus-scale shingle frame — this never touches a second
    * corpus-scale pass at all: the one full explode feeds the
    * signatures, and verification re-shingles only the few documents
    * LSH actually flagged. The small distinct shingle set is persisted
    * (verifyJaccardShingled reads it three times).
    */
  def verifyJaccardForCandidateDocs(candidates: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, shingleK: Int, minJaccard: Double,
      maxDocChars: Int = TextAnalysis.defaultMaxDocChars,
      caches: CacheHandle = CacheHandle.session): DataFrame = {
    val candDocs = candidates
      .select(explode(array(col("doc_a"), col("doc_b"))).as(idCol))
      .distinct()
    val candTexts = docs.select(col(idCol), col(textCol))
      .join(broadcast(candDocs), Seq(idCol))
    // eager: three concurrent consumers in one action (CacheHandle.eager)
    val sh = CacheHandle.eager(caches.track(
      shingleRows(candTexts, idCol, textCol, shingleK, maxDocChars)
        .persist()))
    verifyJaccardShingled(candidates, sh, minJaccard)
  }

  /** Exact Jaccard verification with the candidate docs' distinct
    * shingle SETS held as in-row arrays: candidate doc ids broadcast-
    * semi-join the base table, the codegen'd [[graft.functions
    * .ShingleSetExpr]] builds each doc's distinct shingle array in ONE
    * per-row loop (no explode, no aggregation shuffle — at sf0.1 the
    * LSH candidates span ~85% of the corpus, so the previous
    * explode + collect_set shuffled ~2M shingle rows per execution,
    * measured 3-6s for what is now a ~0.3s narrow map), and the
    * per-pair jaccard is an in-row `array_intersect` after two joins
    * of the set frame onto the pair list. (The set is NOT built with
    * the [[shingles]] array column either: higher-order lambdas are
    * interpreted and re-evaluate the embedded split() per element —
    * O(words²) per doc.) At cluster scale the verify joins shuffle
    * |candidates| rows instead of |candidate shingle rows|.
    * Row width is bounded by `maxDocChars` (a capped doc's distinct
    * 3-shingle array is a few MB worst-case); for corpora of
    * pathological giant documents prefer
    * [[verifyJaccardForCandidateDocs]], which keeps shingles exploded.
    */
  def verifyJaccardBySets(candidates: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, shingleK: Int, minJaccard: Double,
      maxDocChars: Int = TextAnalysis.defaultMaxDocChars,
      caches: CacheHandle = CacheHandle.session): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val candDocs = candidates
      .select(explode(array(col("doc_a"), col("doc_b"))).as(idCol))
      .distinct()
    val candTexts = docs.select(col(idCol), col(textCol))
      .join(broadcast(candDocs), Seq(idCol))
    // persist + MATERIALIZE the per-doc set frame: it is consumed
    // TWICE below (the set_a and set_b joins), and because the two
    // consumers project different aliases Catalyst does not reuse the
    // exchange — worse, the two consumers are concurrent AQE stages of
    // one action, so a lazy persist still computes the base-table scan
    // + set build twice (CacheHandle.eager; q59's r7 regression
    // multiplied exactly this with ITS double consumption of this
    // function's output). One row per candidate doc. Long-lived
    // callers release it via a live CacheHandle, or it ages out with
    // clearCache()/the session. The size filter keeps frame parity
    // with the old aggregation form, which emitted no row for
    // shingle-less docs.
    val sets = CacheHandle.eager(caches.track(candTexts.select(col(idCol).as("doc"),
        ColumnBridge.column(graft.functions.ShingleSetExpr(
          ColumnBridge.expression(
            TextAnalysis.capDoc(col(textCol), maxDocChars)),
          shingleK)).as("shset"))
      .filter(size(col("shset")) > 0)
      .persist()))
    candidates.select("doc_a", "doc_b")
      .join(sets.select(col("doc").as("doc_a"), col("shset").as("set_a")),
        "doc_a")
      .join(sets.select(col("doc").as("doc_b"), col("shset").as("set_b")),
        "doc_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("inter") /
        (size(col("set_a")) + size(col("set_b")) - col("inter"))
          .cast("double"))
      .filter(col("jaccard") >= lit(minJaccard))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact Jaccard verification in ONE join: each candidate pair
    * explodes into two role rows (a/b), the per-doc shingle-set frame
    * is joined ONCE on doc, and a (doc_a, doc_b) regroup reassembles
    * both sets in-row for the intersection.
    *
    * vs [[verifyJaccardBySets]]: that form joins the set frame twice
    * (set_a, set_b), which forces a persist + eager materialization
    * (two aliased consumers are concurrent AQE stages — each would
    * re-run the corpus text scan and set build). Here the set frame
    * has one consumer, so the whole verify is one job with no cached
    * state: broadcast of the candidate doc ids, one equi-join, one
    * pair regroup. Same output: pairs where both docs have non-empty
    * shingle sets and exact Jaccard ≥ `minJaccard`.
    *
    * Pass `candidates` distinct (any groupBy/DISTINCT output) — a
    * duplicated pair would double its role rows and corrupt the
    * regroup's `n_sides` guard. (A countDistinct(role) guard would
    * tolerate duplicates, but Spark plans distinct-aggregates with an
    * Expand + an extra exchange that drags the shingle-set arrays
    * through two shuffle phases — measured 2.8× slower at sf0.1 than
    * deduplicating the tiny pair list upstream.)
    */
  def verifyJaccardOneJoin(candidates: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, shingleK: Int, minJaccard: Double,
      maxDocChars: Int = TextAnalysis.defaultMaxDocChars): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val candDocs = candidates
      .select(explode(array(col("doc_a"), col("doc_b"))).as(idCol))
      .distinct()
    val sets = docs.select(col(idCol), col(textCol))
      .join(broadcast(candDocs), Seq(idCol))
      .select(col(idCol).as("doc"),
        ColumnBridge.column(graft.functions.ShingleSetExpr(
          ColumnBridge.expression(
            TextAnalysis.capDoc(col(textCol), maxDocChars)),
          shingleK)).as("shset"))
      .filter(size(col("shset")) > 0)
    val sides = candidates.select(col("doc_a"), col("doc_b"),
        explode(array(
          struct(col("doc_a").as("doc"), lit("a").as("role")),
          struct(col("doc_b").as("doc"), lit("b").as("role")))).as("s"))
      .select(col("doc_a"), col("doc_b"),
        col("s.doc").as("doc"), col("s.role").as("role"))
    sides.join(sets, Seq("doc"))
      .groupBy("doc_a", "doc_b")
      .agg(
        first(when(col("role") === "a", col("shset")), ignoreNulls = true)
          .as("set_a"),
        first(when(col("role") === "b", col("shset")), ignoreNulls = true)
          .as("set_b"),
        count(lit(1)).as("n_sides"))
      .filter(col("n_sides") === 2) // both docs had non-empty sets
      .withColumn("inter",
        size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("inter") /
        (size(col("set_a")) + size(col("set_b")) - col("inter"))
          .cast("double"))
      .filter(col("jaccard") >= lit(minJaccard))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact Jaccard verification as ONE unbroken pipeline: the candidate
    * pairs explode into role rows, BROADCAST, and hash-join the base
    * table directly — matched rows compute their shingle set in-line
    * ([[graft.functions.ShingleSetExpr]]) and regroup by pair.
    *
    * vs [[verifyJaccardOneJoin]]: that form pre-narrows the corpus with
    * a broadcast semi-join on the distinct candidate doc ids and joins
    * the per-doc set frame once — which needs the candidate frame read
    * TWICE (id side + role side), forcing callers to persist +
    * eagerly materialize it as its own job. Here the candidate frame
    * has exactly ONE consumer (the broadcast build), so the whole
    * verify — candidate generation included — executes lazily inside
    * whatever action consumes the output; no cached state, no extra
    * job. The corpus is still never shuffled: it streams through the
    * broadcast join exactly as through the semi-join.
    *
    * Trade-off: a document appearing in k candidate pairs builds its
    * shingle set k times (once per matched role row) instead of once —
    * acceptable when the candidate multigraph is near-1-regular (LSH
    * near-dup output: most docs sit in ≤ 2 pairs), wasteful for hub
    * documents; callers with hub-heavy pair lists keep OneJoin. The
    * broadcast bound is |pairs| (vs OneJoin's |candidate docs|) — both
    * are tiny relative to the corpus by LSH construction.
    *
    * Pass `candidates` distinct, as with OneJoin (the n_sides guard).
    */
  def verifyJaccardInline(candidates: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, shingleK: Int, minJaccard: Double,
      maxDocChars: Int = TextAnalysis.defaultMaxDocChars): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val sides = candidates.select(
        explode(array(
          struct(col("doc_a"), col("doc_b"), col("doc_a").as("doc"),
            lit("a").as("role")),
          struct(col("doc_a"), col("doc_b"), col("doc_b").as("doc"),
            lit("b").as("role")))).as("s"))
      .select(col("s.doc_a").as("doc_a"), col("s.doc_b").as("doc_b"),
        col("s.doc").as(idCol), col("s.role").as("role"))
    docs.select(col(idCol), col(textCol))
      .join(broadcast(sides), Seq(idCol))
      .select(col("doc_a"), col("doc_b"), col("role"),
        ColumnBridge.column(graft.functions.ShingleSetExpr(
          ColumnBridge.expression(
            TextAnalysis.capDoc(col(textCol), maxDocChars)),
          shingleK)).as("shset"))
      .filter(size(col("shset")) > 0)
      .groupBy("doc_a", "doc_b")
      .agg(
        first(when(col("role") === "a", col("shset")), ignoreNulls = true)
          .as("set_a"),
        first(when(col("role") === "b", col("shset")), ignoreNulls = true)
          .as("set_b"),
        count(lit(1)).as("n_sides"))
      .filter(col("n_sides") === 2)
      .withColumn("inter",
        size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("inter") /
        (size(col("set_a")) + size(col("set_b")) - col("inter"))
          .cast("double"))
      .filter(col("jaccard") >= lit(minJaccard))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact Jaccard from precomputed shingle rows (persist `sh` — it is
    * read three times: both intersection sides and the size table).
    */
  def verifyJaccardShingled(candidates: DataFrame, sh: DataFrame,
      minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val inter = candidates.select("doc_a", "doc_b")
      .join(sh.select(col("doc").as("doc_a"), col("shingle")), "doc_a")
      .join(sh.select(col("doc").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
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

  /** Exact n-gram Jaccard for all pairs sharing at least one shingle.
    * Only safe on small blocks (quadratic in block size); at corpus
    * scale use minhashCandidates + verifyJaccard.
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, minJaccard: Double,
      caches: CacheHandle = CacheHandle.session): DataFrame = {
    // eager: the self-join + verifyJaccardShingled consume this frame
    // through concurrent AQE stages (CacheHandle.eager)
    val sh = CacheHandle.eager(caches.track(
      shingleRows(docs, idCol, textCol, shingleK).persist()))
    val pairs = sh.select(col("doc").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    verifyJaccardShingled(pairs, sh, minJaccard)
  }

  /** Connected components over an undirected edge list by iterative
    * min-label propagation: each node's label converges to the SMALLEST
    * node id reachable from it, so the label doubles as the cluster's
    * deterministic keeper (the surviving document of a near-dup group).
    *
    * This is the missing last stage of the dedup pipeline: LSH finds
    * candidate PAIRS, exact Jaccard verifies them — but duplicates come
    * in GROUPS (a≈b, b≈c ⇒ drop two of {a,b,c}), and pairwise keep-min
    * would wrongly keep b. Components resolve the transitive closure.
    *
    * Scale shape: each round is one join (labels onto edge endpoints) +
    * one min-aggregation — two key shuffles over |edges| rows; rounds =
    * component diameter. Near-dup clusters are overwhelmingly tiny
    * (pairs/triples), so 3–5 rounds converge in practice; `maxIter`
    * bounds adversarial chains. Every round ends in `localCheckpoint()`
    * to truncate lineage — without it the plan tree (and codegen time)
    * grows per iteration. The per-round `count()` is a scalar
    * convergence probe, not a data collect. For graphs with huge
    * diameters prefer alternating large-star/small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"), which converges in
    * O(log²) rounds; for near-dup workloads the simple propagation does
    * fewer total shuffles.
    *
    * Output: (node, label) for every node that appears in an edge.
    */
  /** Driver-heap working budget for [[connectedComponents]]' local
    * union-find path: the collected edge array must fit in this many
    * estimated bytes or the call falls back to the distributed
    * propagation. Peak local footprint (collect + parent map + result
    * rows) is a small multiple (~3x) of the budget — ~0.75 GB worst
    * case against the 8 GB driver this engine documents.
    */
  private val localEdgeByteBudget: Long = 256L << 20

  /** JVM-side "less than" matching the distributed min-aggregate's
    * ordering, for the local union-find paths: strings compare as
    * UTF-8 BYTES (UTF8String's binary order — Java String.compareTo
    * is UTF-16 code-unit order, which sorts supplementary characters
    * below U+E000..U+FFFF, the opposite of code-point/UTF-8 order);
    * every other supported key type through its Comparable, whose
    * ordering coincides with Spark's for integrals, decimals of one
    * scale, dates, timestamps and booleans.
    */
  @annotation.nowarn("cat=other-match-analysis")
  private[operators] def localLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: String, y: String) =>
      val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(xb.length, yb.length)
      var i = 0
      var c = 0
      while (i < n && c == 0) {
        c = (xb(i) & 0xff) - (yb(i) & 0xff)
        i += 1
      }
      (if (c != 0) c else xb.length - yb.length) < 0
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
  }

  /** @param localEdgeCap ROW cap for the driver-side union-find
    *   short-circuit (0 disables it). The effective cap is the smaller
    *   of this and [[localEdgeByteBudget]] over the schema-estimated
    *   row width, and a post-collect actual-bytes check re-guards
    *   string keys; node values must be non-null orderable atomics
    *   (string / integral / decimal / date / timestamp / boolean) or
    *   the distributed path runs instead.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25, distinctEdges: Boolean = false,
      localEdgeCap: Int = 2000000): DataFrame = {
    // Bounded driver-side union-find first (r17, guide §1.2 "the
    // distributed algorithm"): near-dup EDGE sets are tiny relative to
    // their corpora by LSH construction (verified pairs ≈ true
    // duplicates), while the iterative propagation pays
    // (join + aggregate + checkpoint + convergence probe) scheduled
    // jobs PER ROUND — measured 3-5 jobs of pure fixed overhead per
    // invocation at sf0.1 for graphs that fit in kilobytes. The same
    // trade was already established for the nightly path
    // ([[incrementalComponentsWithDelta]]'s contraction map): when the
    // edge list fits under a bounded collect it is strictly cheaper to
    // resolve on the driver — ONE job materializes the whole
    // candidate/verify lineage — and the result re-enters as a local
    // relation every consumer can broadcast. Graphs past the cap
    // (a corpus whose duplicate graph itself approaches driver memory)
    // fall back to the unchanged distributed propagation;
    // `localEdgeCap = 0` forces it (specs pin local ≡ distributed).
    // Local-path eligibility (r17 judge finding #3 / ADVICE): the key
    // type must (a) have a JVM ordering that provably matches the
    // distributed min-aggregate's ordering and (b) admit a byte
    // estimate so the cap bounds DRIVER MEMORY, not just a row count —
    // string ids of arbitrary length made the 2M-row cap's real
    // footprint unbounded. Floats/doubles are excluded outright
    // (±0.0 equality diverges between java.lang.Double.equals and
    // Spark's normalized comparison; no caller keys components on
    // floats). Arrays/structs (not Comparable) and mismatched a/b
    // column types skip the local path instead of crashing it.
    val keyType = edges.schema(aCol).dataType
    val estKeyBytes: Long = keyType match {
      // collected JVM object estimate per key: String ≈ 48 B header +
      // 2 B/char at the type's 20-char defaultSize; boxed fixed-width
      // (Long/Int/…/Decimal/Date/Timestamp/Boolean) ≈ 24-48 B
      case org.apache.spark.sql.types.StringType => 88L
      case _: org.apache.spark.sql.types.DecimalType => 48L
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.BooleanType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampType => 24L
      case _ => 0L // unsupported ordering — distributed path
    }
    if (localEdgeCap > 0 && estKeyBytes > 0 &&
        edges.schema(bCol).dataType == keyType) {
      // ~48 B of Row/array scaffolding + two boxed keys per collected
      // edge; the budget covers the collected edge array — the parent
      // map and the result rows scale with the same node count, so
      // peak local-path footprint is a small multiple (~3x) of it.
      // 256 MB keeps the long-key row cap at the established 2M while
      // making wide-string graphs byte-bound (~1.2M rows at the
      // 20-char estimate, further reduced by the post-collect check).
      val perRowEst = 48L + 2L * estKeyBytes
      val effCap = math.min(localEdgeCap.toLong,
        localEdgeByteBudget / perRowEst).toInt
      // a collect past spark.driver.maxResultSize (pathological strings
      // under the estimate) falls back to the distributed path instead
      // of failing a query the propagation could still run
      val el: Array[org.apache.spark.sql.Row] =
        if (effCap <= 0) null
        else try edges.select(col(aCol), col(bCol))
          .limit(effCap + 1).collect()
        catch { case e: org.apache.spark.SparkException
            if String.valueOf(e.getMessage).contains("maxResultSize") =>
          null
        }
      def actualBytes(rows: Array[org.apache.spark.sql.Row]): Long = {
        var sum = 0L
        rows.foreach { r =>
          def kb(v: Any): Long = v match {
            case s: String => 48L + 2L * s.length
            case _ => estKeyBytes
          }
          sum += 48L + kb(r.get(0)) + kb(r.get(1))
        }
        sum
      }
      // null endpoints fall back to the distributed path so their
      // semantics stay EXACTLY what they were (LSH pairs are non-null
      // by construction; this guard is for arbitrary callers)
      if (el != null && el.length <= effCap &&
          !el.exists(r => r.isNullAt(0) || r.isNullAt(1)) &&
          actualBytes(el) <= localEdgeByteBudget) {
        val parent = new java.util.HashMap[Any, Any]()
        def find(x: Any): Any = {
          var r = x
          while (parent.get(r) != null && parent.get(r) != r)
            r = parent.get(r)
          var c = x
          while (c != r && parent.get(c) != c) {
            val next = parent.get(c); parent.put(c, r); c = next
          }
          r
        }
        el.foreach { row =>
          val (a, b) = (row.get(0), row.get(1))
          if (parent.get(a) == null) parent.put(a, a)
          if (parent.get(b) == null) parent.put(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            // min-label root, ordered exactly as the distributed
            // min-aggregate orders ([[localLt]])
            if (localLt(ra, rb)) parent.put(rb, ra)
            else parent.put(ra, rb)
          }
        }
        import scala.jdk.CollectionConverters._
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", keyType),
          org.apache.spark.sql.types.StructField("label", keyType)))
        val rows = parent.keySet().asScala.toSeq.map(n =>
          org.apache.spark.sql.Row(n, find(n)))
        return edges.sparkSession.createDataFrame(rows.asJava, schema)
      }
      // > cap (rows or bytes) or nulls present: fall through to the
      // distributed propagation. The capped collect is discarded — at
      // this size its cost is one edge scan, which the persist below
      // pays again; acceptable for the rare fallback, and the common
      // case saved 3-5 jobs.
    }
    // doubled edge list: propagation must flow both directions. Callers
    // whose pairs are already distinct with aCol < bCol (any groupBy
    // output, e.g. verified near-dup pairs) pass distinctEdges = true —
    // the doubled union then has no duplicates by construction and the
    // dedup shuffle drops out of the plan. Doubling is ONE scan of
    // `edges` (explode of both orientations), not a two-arm union: a
    // union's arms become concurrent AQE stages, and when `edges` is a
    // caller's lazily-persisted pipeline both arms race to compute it
    // in full (see CacheHandle.eager — this was 2 × the whole q59
    // minhash→verify pipeline before round 0 even started).
    val doubled = edges.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val und = (if (distinctEdges) doubled else doubled.distinct()).persist()
    // round 0 folded into initialization: every node's first label is
    // min(self, direct neighbors) — ONE aggregation over the edge list,
    // where the generic round needs a join + an aggregation (and the
    // separate identity-label init needs its own distinct). The loop
    // below starts at round 1.
    var labels = und.groupBy("src")
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .withColumnRenamed("src", "node")
      .localCheckpoint(false)
    // convergence probe: the node set is fixed and labels only ever
    // decrease, so the label SUM strictly decreases until the fixed
    // point — comparing one scalar per round replaces a join + count
    // over the label frame (one aggregation job instead of a join job
    // per round; decimal accumulation cannot overflow). Probing the
    // folded round 0 here both materializes the lazy checkpoint and
    // lets a diameter-1 graph (pairs/stars — the common near-dup case)
    // converge after a single joined round.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // empty-graph sum is NULL → coalesce to 0 so an edgeless call
      // (e.g. incrementalComponents with only intra-component edges)
      // converges instead of NPE-ing on the compare
      val s = df.agg(sum(col("label").cast("decimal(38,0)"))).head
      if (s.isNullAt(0)) java.math.BigDecimal.ZERO else s.getDecimal(0)
    }
    var prevSum: java.math.BigDecimal = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // pull every neighbor's current label onto this node, keep the min
      val viaNeighbor = und.join(labels, und("dst") === labels("node"))
        .select(und("src").as("node"), col("label"))
      // lazy checkpoint: the convergence aggregation right below is the
      // round's ONE materializing action (eager would run a separate
      // job first); later consumers read the checkpointed partitions
      val next = labels.union(viaNeighbor)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint(false)
      val s = labelSum(next)
      // the convergence probe above materialized `next`'s checkpoint,
      // so the PREVIOUS round's blocks are dead — free them now.
      // clearCache() cannot (checkpoint blocks are RDD persistence, not
      // SQL cache), and without this the session accumulates one label
      // frame per round per invocation.
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(labels)
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    und.unpersist()
    // the returned frame keeps its (final-round) checkpoint: callers
    // typically consume it more than once (labels + cluster sizes).
    // LIFECYCLE at scale: that final checkpoint outlives this call and
    // is invisible to spark.catalog.clearCache() — a long-running
    // pipeline that invokes iterative operators hundreds of times per
    // session (r16 measured a 109-query bench suite) accumulates the
    // blocks until storage pressure slows every memory-hungry stage
    // 1.4-2x. When a result is fully consumed, release it with
    // CheckpointBridge.release(labels); a harness isolating units of
    // work can sweep everything between units with
    // CheckpointBridge.releaseAllPersisted(spark).
    labels
  }

  /** Incremental connected components: fold a batch of NEW edges into
    * an existing (node, label) assignment without re-propagating over
    * the corpus graph.
    *
    * Key invariant of [[connectedComponents]]: a component's label IS
    * its minimum node id. So each existing component can be CONTRACTED
    * to the single vertex `label`, and the merge effect of the new
    * edges is fully decided by components over the contracted graph:
    * map each new-edge endpoint to its existing label (itself if the
    * node is unseen), drop edges that stay inside one component, and
    * run the iterative propagation over what remains — a frame of at
    * most |new edges| rows, never the corpus. The resulting
    * (old label → merged label) map then rewrites the corpus frame in
    * ONE broadcast-joined narrow scan (the map is small — bounded by
    * the number of components the batch touches — so no shuffle of the
    * corpus labels), and unseen endpoints enter with their merged
    * labels.
    *
    * Scale shape: 2 small joins to contract (new-edge endpoints ×
    * corpus labels — the new side is the broadcast candidate under
    * AQE), the O(diameter-of-contracted-graph) propagation over ≤
    * |new edges| rows, and one narrow relabel scan of the corpus
    * frame. Equal labels to a from-scratch run over old ∪ new edges
    * (spec-asserted), at a per-batch cost independent of corpus edge
    * count.
    *
    * Output: (node, label) for every node of `labels` plus every node
    * appearing in `newEdges`.
    */
  def incrementalComponents(labels: DataFrame, newEdges: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 25,
      caches: CacheHandle = CacheHandle.session): DataFrame =
    incrementalComponentsWithDelta(labels, newEdges, aCol, bCol, maxIter,
      caches)._1

  /** [[incrementalComponents]] plus the CHANGED-ROW DELTA: the second
    * frame holds exactly the (node, label) rows that differ from the
    * input assignment — members of components the batch's edges merged
    * (their label was rewritten by the contraction map) plus nodes
    * entering the graph tonight. This is what an O(changed) label
    * commit persists ([[SignatureStore.appendBatch]]'s `labelDelta`):
    * writing the full merged assignment every night is O(corpus) bytes
    * for a delta that is O(batch + bridged-component members).
    *
    * The delta costs one extra NARROW corpus scan (labels streamed
    * against the broadcast merge map, inner instead of left) and no
    * shuffle; both frames are lazy, so callers that ignore one pay
    * nothing for it.
    */
  def incrementalComponentsWithDelta(labels: DataFrame,
      newEdges: DataFrame, aCol: String, bCol: String, maxIter: Int = 25,
      caches: CacheHandle = CacheHandle.session)
      : (DataFrame, DataFrame) = {
    val l = labels.select(col("node"), col("label"))
    // The edge frame is SMALL (tonight's verified pairs) and consumed
    // by the endpoint scan + the contraction, so it is persisted —
    // one materialization job for the whole candidate-verify lineage.
    // The corpus label table, by contrast, must NEVER be shuffled:
    // every join below streams it against a broadcast small side (the
    // r13 sf10 probe showed the previous left-outer contractions
    // sort-merge-shuffled the corpus labels twice, making the nightly
    // path scale with |corpus| instead of |batch|).
    val e = CacheHandle.eager(caches.track(
      newEdges.select(col(aCol).as("a"), col(bCol).as("b")).persist()))
    val touched = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    // labels of touched nodes only: corpus labels STREAM through a
    // broadcast semi-join (no exchange), output is edge-sized
    val lt = CacheHandle.eager(caches.track(
      l.join(broadcast(touched), Seq("node"), "left_semi").persist()))
    // contract endpoints to their existing component labels — all
    // broadcast joins over edge-sized frames
    val la = lt.select(col("node").as("a"), col("label").as("la"))
    val lb = lt.select(col("node").as("b"), col("label").as("lb"))
    val contracted = e.join(broadcast(la), Seq("a"), "left")
      .join(broadcast(lb), Seq("b"), "left")
      .select(coalesce(col("la"), col("a")).as("ca"),
        coalesce(col("lb"), col("b")).as("cb"))
      .filter(col("ca") =!= col("cb"))
    // components over the contracted graph: (old label or new node id)
    // → merged label. The map is consumed ONLY through broadcast()
    // below, so it must fit on the driver NO MATTER how it is computed
    // — which makes a driver-side union-find over the collected
    // contracted edges strictly cheaper than the iterative distributed
    // propagation at the same scale bound: the propagation pays
    // (join + aggregate + checkpoint + convergence probe) scheduled
    // JOBS per round — ~0.5-1s of pure fixed overhead per nightly fold
    // for a result the plan collects to the driver anyway. Graphs past
    // the broadcast-sized cap (a "batch" that merges millions of
    // components should rebuild the corpus, not fold nightly) fall
    // back to the distributed propagation unchanged.
    val localCap = 2000000
    val edgesLocal = contracted.limit(localCap + 1).collect()
    val merged =
      if (edgesLocal.length > localCap)
        connectedComponents(contracted, "ca", "cb", maxIter = maxIter)
          .withColumnRenamed("node", "old_label")
          .withColumnRenamed("label", "merged")
      else {
        // union-find with min-label roots: same result as the
        // propagation (every node of the contracted graph mapped to
        // its component's minimum), deterministic
        val parent = new java.util.HashMap[Any, Any]()
        def find(x: Any): Any = {
          var r = x
          while (parent.get(r) != null && parent.get(r) != r)
            r = parent.get(r)
          var c = x
          while (c != r && parent.get(c) != c) {
            val next = parent.get(c); parent.put(c, r); c = next
          }
          r
        }
        edgesLocal.foreach { row =>
          val (a, b) = (row.get(0), row.get(1))
          if (parent.get(a) == null) parent.put(a, a)
          if (parent.get(b) == null) parent.put(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            // min label becomes the root so the final map needs no
            // second pass ordering; string order matches the
            // distributed min-aggregate's binary order ([[localLt]])
            if (localLt(ra, rb)) parent.put(rb, ra)
            else parent.put(ra, rb)
          }
        }
        import scala.jdk.CollectionConverters._
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("old_label",
            contracted.schema("ca").dataType),
          org.apache.spark.sql.types.StructField("merged",
            contracted.schema("cb").dataType)))
        val rows = parent.keySet().asScala.toSeq.map(n =>
          org.apache.spark.sql.Row(n, find(n)))
        labels.sparkSession.createDataFrame(rows.asJava, schema)
      }
    // corpus rewrite: one streaming scan, broadcast of the merge map
    val updated = l.join(broadcast(merged),
        l("label") === merged("old_label"), "left")
      .select(col("node"), coalesce(col("merged"), col("label")).as("label"))
    // unseen endpoints (touched ∖ labeled) enter with their merged
    // labels. Every unseen node IS covered by `merged`: its contracted
    // edge keeps ca = node ≠ cb (it has no label to contract to), so it
    // survives the intra-component filter and appears keyed by its own
    // id. Both sides here are edge-sized — broadcast joins only.
    val unseen = touched.join(broadcast(lt), Seq("node"), "left_anti")
    val newRows = unseen.join(broadcast(merged),
        unseen("node") === merged("old_label"))
      .select(col("node"), col("merged").as("label"))
    // the delta: corpus rows whose label ACTUALLY moved (old ≠ merged —
    // the contraction map carries identity rows for component minima)
    // plus tonight's new nodes; same plan pieces, one extra narrow scan
    val changed = l.join(
        broadcast(merged.filter(col("old_label") =!= col("merged"))),
        l("label") === merged("old_label"))
      .select(col("node"), col("merged").as("label"))
    (updated.union(newRows), changed.union(newRows))
  }

  /** SimHash near-duplicate pairs: documents whose 64-bit simhashes
    * differ in at most `maxHamming` bits — the classic web-scale
    * near-dup detector (one 64-bit fingerprint per doc, constant
    * verify cost per pair, where MinHash needs a signature array and
    * set intersections).
    *
    * Banding is the pigeonhole argument: split the 64 bits into 4
    * 16-bit chunks — two hashes within hamming distance 3 must agree
    * EXACTLY on at least one chunk — so candidates come from four
    * chunk-value equi-joins, never |docs|². The banded frame carries
    * (doc, 4 small ints): no payload problem at any scale. Exact
    * verify is in-row: sum of bit_count(xor) over the chunks.
    * Requires `maxHamming` < 4 bands (pigeonhole soundness) — for
    * looser thresholds add bands.
    *
    * Output: (doc_a < doc_b, hamming), hamming <= maxHamming.
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      maxDocChars: Int = TextAnalysis.defaultMaxDocChars,
      caches: CacheHandle = CacheHandle.session): DataFrame = {
    require(maxHamming < 4,
      s"4 x 16-bit bands are only sound for maxHamming < 4, got $maxHamming")
    val chunks = (0 until 4).map(i =>
      conv(substring(col("simhash"), i * 4 + 1, 4), 16, 10)
        .cast("int").as(s"c$i"))
    // persist + materialize: the banded self-join consumes this frame
    // on both sides (differently aliased — no exchange reuse), as
    // concurrent AQE stages that would otherwise race to compute the
    // upstream simhash scan twice (CacheHandle.eager). One row per
    // doc, 4 ints.
    val t = CacheHandle.eager(caches.track(
      simhash(docs, idCol, textCol, maxDocChars)
        .select(col("doc") +: chunks: _*)
        .persist()))
    def side(suffix: String) = t
      .withColumn("bk", explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"), col(s"c$i").as("bv"))): _*)))
      .select(Seq(col("doc").as(s"doc$suffix"),
        col("bk.band").as("band"), col("bk.bv").as("bv")) ++
        (0 until 4).map(i => col(s"c$i").as(s"c$i$suffix")): _*)
    val a = side("_a")
    val b = side("_b")
    val hamming = (0 until 4).map(i =>
      bit_count(col(s"c${i}_a").bitwiseXOR(col(s"c${i}_b"))))
      .reduce(_ + _).cast("long")
    a.join(b, Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select((Seq(col("doc_a"), col("doc_b")) ++
        (0 until 4).flatMap(i => Seq(col(s"c${i}_a"), col(s"c${i}_b")))): _*)
      .distinct()
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minOverlap` of a benchmark document's distinct k-word shingles —
    * the training-data hygiene pass that keeps evaluation suites out
    * of the corpus (n-gram overlap is the standard published recipe).
    *
    * Scale shape: the benchmark suite is SMALL by definition, so its
    * distinct shingle set broadcasts twice — once as a Bloom filter
    * probed INSIDE the corpus scan (the codegen'd
    * [[graft.functions.ShingleHitsExpr]] walks each document once and
    * emits only might-match shingles, so a clean corpus materializes
    * zero shingle rows; the exploded form built one UnsafeRow per
    * corpus TOKEN only to discard ~all of them at the join), and once
    * as the exact string set whose equi-join kills the Bloom's false
    * positives. The only shuffle in the plan carries HIT rows (corpus
    * shingles that appear in some benchmark doc) into the per-(doc,
    * bench) count. A corpus with zero contamination shuffles — and now
    * explodes — zero rows. Building the Bloom filter runs two actions
    * over the (small) benchmark frame at plan-construction time; like
    * the IVF centroid collects, that is a plan PARAMETER, O(bench).
    *
    * Output: (doc, bench_id, n_overlap, overlap_frac) for pairs at or
    * above the threshold, overlap_frac = distinct shared shingles /
    * benchmark doc's distinct shingles.
    *
    * @param prefilterFpp Bloom false-positive rate; only affects how
    *   many non-hit shingles survive to the exact join (cost), never
    *   the result.
    */
  def contamination(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, shingleK: Int, minOverlap: Double,
      maxDocChars: Int = TextAnalysis.defaultMaxDocChars,
      prefilterFpp: Double = 0.001,
      caches: CacheHandle = CacheHandle.session): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // two plan-construction actions over the persisted bench shingles:
    // the sizing count (which doubles as the cache materialization —
    // no separate eager job) and the Bloom aggregate over the cache
    val bsh = caches.track(
      shingleRows(bench, idCol, textCol, shingleK, maxDocChars)
        .select(col("doc").as("bench_id"), col("shingle")).persist())
    val nBench = bsh.count()
    val bloom = corpus.sparkSession.sparkContext.broadcast(
      bsh.stat.bloomFilter("shingle", math.max(1L, nBench),
        prefilterFpp))
    val bsz = bsh.groupBy("bench_id").agg(count(lit(1)).as("bench_sz"))
    val hits = corpus.select(col(idCol).as("doc"),
      explode(ColumnBridge.column(graft.functions.ShingleHitsExpr(
        ColumnBridge.expression(
          TextAnalysis.capDoc(col(textCol), maxDocChars)),
        shingleK, bloom))).as("shingle"))
    // count(1), not countDistinct: the expression emits each of a
    // doc's shingles at most once, and (bench_id, shingle) is distinct
    // by construction, so the join fans out uniquely
    hits.join(broadcast(bsh), Seq("shingle"))
      .groupBy(col("doc"), col("bench_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .join(broadcast(bsz), Seq("bench_id"))
      .withColumn("overlap_frac",
        col("n_overlap") / col("bench_sz").cast("double"))
      .filter(col("overlap_frac") >= lit(minOverlap))
      .select(col("doc"), col("bench_id"), col("n_overlap"),
        col("overlap_frac"))
  }

  /** The pre-r13 exploded decontamination plan, kept as the oracle for
    * the fused form's parity spec (and as the shape to fall back to if
    * a caller cannot run plan-construction actions): every corpus
    * shingle becomes a row and probes the broadcast benchmark set.
    * Results are identical to [[contamination]] by construction.
    */
  def contaminationExplode(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, shingleK: Int, minOverlap: Double,
      maxDocChars: Int = TextAnalysis.defaultMaxDocChars): DataFrame = {
    val bsh = shingleRows(bench, idCol, textCol, shingleK, maxDocChars)
      .select(col("doc").as("bench_id"), col("shingle"))
    val bsz = bsh.groupBy("bench_id").agg(count(lit(1)).as("bench_sz"))
    val csh = shingleRowsAll(corpus, idCol, textCol, shingleK, maxDocChars)
    csh.join(broadcast(bsh), Seq("shingle"))
      .groupBy(col("doc"), col("bench_id"))
      .agg(countDistinct(col("shingle")).as("n_overlap"))
      .join(broadcast(bsz), Seq("bench_id"))
      .withColumn("overlap_frac",
        col("n_overlap") / col("bench_sz").cast("double"))
      .filter(col("overlap_frac") >= lit(minOverlap))
      .select(col("doc"), col("bench_id"), col("n_overlap"),
        col("overlap_frac"))
  }

  /** 64-bit SimHash over distinct words, emitted as a 16-char hex string
    * (portable across engines; no signed-shift pitfalls).
    *
    * Bit j (j = 0..63, MSB-first over md5's first 16 hex chars) is 1 iff
    * the sum over words of (bit_j(md5(word)) ? +1 : -1) is positive.
    *
    * Computed by the codegen'd [[graft.functions.SimHashExpr]]: one
    * per-row loop, zero shuffles. This replaced a word-explode ×
    * 64-bit-explode plan (64 rows per distinct word through two shuffled
    * aggregations) — hash-identical output, PlanSpec-guarded against the
    * explode creeping back.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      maxDocChars: Int = TextAnalysis.defaultMaxDocChars): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    docs.select(col(idCol).as("doc"),
      ColumnBridge.column(graft.functions.SimHashExpr(
        ColumnBridge.expression(
          TextAnalysis.capDoc(col(textCol), maxDocChars)))).as("simhash"))
  }

  /** One row per fixed-width word segment of each document: (doc,
    * seg_idx, seg). The last segment of a document may be shorter than
    * `segWords`; an empty-string text still yields one (empty) segment,
    * so every non-null doc appears. NULL texts are dropped (matching
    * SQL's unnest-of-NULL semantics — without the filter a null text
    * would emit one (doc, 0, null) segment via greatest(null,1)=1).
    * Pure codegen'd front (one explode, no shuffle).
    */
  def segmentRows(docs: DataFrame, idCol: String, textCol: String,
      segWords: Int): DataFrame = {
    val ws = words(col(textCol))
    val nseg = ceil(size(ws).cast("double") / segWords).cast("int")
    docs.filter(col(textCol).isNotNull).select(col(idCol).as("doc"),
      posexplode(transform(sequence(lit(0), greatest(nseg, lit(1)) - 1),
        i => array_join(slice(ws, i * segWords + 1, lit(segWords)), " "))))
      .withColumnsRenamed(Map("pos" -> "seg_idx", "col" -> "seg"))
      .withColumn("seg_idx", col("seg_idx").cast("long"))
  }

  /** Cross-document duplicated-segment removal (the CCNet/RefinedWeb
    * paragraph-dedup stage, reference-corpus boilerplate killer): split
    * each document into consecutive `segWords`-word segments, find
    * segments that occur in >= `minDocs` DISTINCT documents, and
    * re-assemble each document from only its non-duplicated segments
    * (original order). Output: (doc, n_seg, n_dup_seg, kept_text).
    *
    * Scale shape (100 TB): the duplicate decision shuffles ONLY the
    * 32-char md5 of each segment (map-side partial agg collapses
    * within-partition repeats before the exchange); the rebuild is the
    * one unavoidable shuffle of segment text back to its document — the
    * same volume a plain groupBy(doc) of the corpus would move. The
    * segment lineage is recomputed for the two consumers rather than
    * persisted: two narrow scans beat caching a corpus-sized explode
    * (and stay safe under concurrent AQE stage submission — see
    * SCALING.md on the persist cache race). With a known-small
    * duplicate set, the join could become a broadcast/Bloom in-row
    * lookup (the q65 pattern); the equi-join form here assumes nothing.
    */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
      segWords: Int = 10, minDocs: Int = 2): DataFrame = {
    val segRows = segmentRows(docs, idCol, textCol, segWords)
    val dupHashes = segRows
      .groupBy(md5(col("seg")).as("seg_h"))
      .agg(countDistinct(col("doc")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    segRows.withColumn("seg_h", md5(col("seg")))
      .join(dupHashes, Seq("seg_h"), "left_outer")
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_seg"),
        count(col("n_docs")).as("n_dup_seg"),
        coalesce(array_join(transform(
          array_sort(collect_list(when(col("n_docs").isNull,
            struct(col("seg_idx"), col("seg"))))),
          s => s("seg")), " "), lit("")).as("kept_text"))
  }

  /** Exact duplicate-SUBSTRING removal (ExactSubstr — Lee et al. 2022,
    * arXiv:2107.06499): every `gramLen`-codepoint window whose text
    * also occurs at a lexicographically EARLIER (doc, pos) is removed;
    * overlapping or touching removals merge into spans and the
    * remaining segments stitch back together. Unlike [[segmentDedup]]
    * (fixed word segments) this catches duplicated runs at ANY
    * alignment — the character-level analog of the reference's
    * suffix-array dedup, re-expressed as hash-bucket + verify.
    *
    * Output: (id, clean_text, n_spans, removed_chars) for every doc.
    *
    * Plan shape, corpus-size honest: the rolling window hashes are ONE
    * codegen'd per-row loop ([[graft.functions.GramHashesExpr]]); the
    * one corpus-sized shuffle is the duplicated-hash AGGREGATION
    * (16 B/window key+count through a hash agg — the distributed
    * stand-in for suffix-array construction, which is also O(corpus)
    * bytes; a window-over-hash formulation instead SORTS every window
    * row and was measured 2-4× slower at the 100× point). The
    * duplicated-hash set then comes back as a broadcast Bloom filter
    * probed IN the second scan — candidate windows never shuffle until
    * they are match-sized. Bloom false positives cannot change
    * results: a false-positive window is alone in its real-substring
    * group downstream (two windows with equal text hash equal, so
    * they are in the true duplicate set), where the min-occurrence
    * rule keeps it. Real substrings are fetched only for candidates
    * and re-verified by VALUE before any removal, per-doc span lists
    * ride one match-sized aggregation, and the stitch is one O(len)
    * pass per doc ([[graft.functions.CutSpansExpr]]). The hash loop
    * runs twice (detection + candidate scan) — at 0.03 µs/window it is
    * ~100× cheaper than shuffling the windows it avoids.
    */
  /** Duplicated-value detection over a single LONG column, shuffle+
    * sort form: repartition the raw 8-byte keys by value, radix-sort
    * each reduce partition, one linear run-length scan emits each
    * duplicated value once. Same result set as
    * `groupBy(h).count().filter(_ > 1)`, different cost model: the
    * hash-agg form builds (and, at ~all-unique cardinality, SPILLS) a
    * key+count map on BOTH sides of the exchange; this form shuffles
    * the same bytes and replaces both maps with an in-memory
    * per-partition long sort. MEASURED OUTCOME (SCALING.md r14): the
    * hash agg wins at 100× anyway — this path's typed mapPartitions
    * hop pays per-row object ser/deser outside whole-stage codegen,
    * ~2.5× the cost of the agg map it avoids. Kept as the documented
    * negative result and the equality cross-check for the spec.
    */
  private[graft] def duplicatedLongsSorted(hashes: DataFrame,
      colName: String): DataFrame = {
    import hashes.sparkSession.implicits._
    hashes.select(col(colName).cast("long"))
      .repartition(col(colName))
      .sortWithinPartitions(col(colName))
      .as[Long]
      .mapPartitions { it =>
        new Iterator[Long] {
          private var pending: java.lang.Long = null
          private var prev: Long = 0L
          private var havePrev = false
          private def advance(): Unit = {
            while (pending == null && it.hasNext) {
              val v = it.next()
              if (havePrev && v == prev) {
                pending = v
                // swallow the rest of the run (value emits ONCE); the
                // first differing element seeds the next comparison —
                // it may itself start a new run
                havePrev = false
                var inRun = true
                while (inRun && it.hasNext) {
                  val w = it.next()
                  if (w != v) { prev = w; havePrev = true; inRun = false }
                }
              } else { prev = v; havePrev = true }
            }
          }
          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): Long = {
            advance()
            val v = pending; pending = null; v
          }
        }
      }
      .toDF(colName)
  }

  def exactSubstrDedup(docs: DataFrame, idCol: String, textCol: String,
      gramLen: Int, prefilterFpp: Double = 0.01,
      caches: CacheHandle = CacheHandle.session,
      sortedDetection: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val d = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol))
    def grams = d.select(col(idCol),
        posexplode(ColumnBridge.column(graft.functions.GramHashesExpr(
          ColumnBridge.expression(col(textCol)), gramLen))))
      .select(col(idCol), (col("pos") + 1).cast("int").as("__p"),
        col("col").as("__h"))
    // pass 1: duplicated hash VALUES (count > 1), key-only. Strategy
    // was A/B-measured (SCALING.md round 14) and the hash aggregation
    // WON at 100x: the sorted run-length scan shuffles the same bytes
    // but pays a typed mapPartitions hop (per-row object ser/deser
    // outside whole-stage codegen) that costs ~2.5x more than the agg
    // map it avoids (62s vs 155s quiet at sf10). Kept selectable as
    // the measured negative result.
    val dupRaw =
      if (sortedDetection) duplicatedLongsSorted(grams.select("__h"), "__h")
      else grams.groupBy(col("__h"))
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
    val dup = caches.track(dupRaw.select("__h").persist())
    val nDup = dup.count() // sizes the Bloom; materializes the persist
    val bloom = d.sparkSession.sparkContext.broadcast(
      dup.stat.bloomFilter("__h", math.max(1L, nDup), prefilterFpp))
    // pass 2: re-scan, keep only windows whose hash the Bloom knows —
    // a shuffle-free prefilter; survivors are match-sized
    val cand = grams.filter(ColumnBridge.column(
      graft.functions.BloomMightContainLongExpr(
        ColumnBridge.expression(col("__h")), bloom)))
    // candidates only: fetch the real window and keep every occurrence
    // that is not its window's minimal (doc, pos)
    val withGram = cand.join(d, Seq(idCol))
      .withColumn("__g",
        substring(col(textCol), col("__p"), lit(gramLen)))
    val occ = struct(col(idCol), col("__p"))
    val removals = withGram
      .withColumn("__min",
        min(occ).over(Window.partitionBy(col("__g"))))
      .filter(occ =!= col("__min"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__p"))).as("__starts"))
    val cut = ColumnBridge.column(graft.functions.CutSpansExpr(
      ColumnBridge.expression(col(textCol)),
      ColumnBridge.expression(
        coalesce(col("__starts"), array().cast("array<int>"))),
      gramLen))
    d.join(removals, Seq(idCol), "left_outer")
      .withColumn("__cut", cut)
      .select(col(idCol), col("__cut.clean_text").as("clean_text"),
        col("__cut.n_spans").as("n_spans"),
        col("__cut.removed_chars").as("removed_chars"))
  }
}
