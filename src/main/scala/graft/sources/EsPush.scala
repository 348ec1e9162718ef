package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.ingest.Fetcher

/** S12 — the runnable Elasticsearch push loop: POST each `_bulk`
  * payload file (one well-formed request body per file, produced by
  * [[EsBulk.writeBulkFiles]]) through a rate gate with retries, parse
  * per-item failures out of the bulk response, then poll the index
  * document count until ingestion is visible — the engine-side mirror
  * of the reference's trigger-and-poll task
  * (`data_refresh/data_refresh_task_factory.py:183-240`: POST the
  * ingestion trigger, then wait_for_completion on a status endpoint).
  *
  * Only the real cluster stays external; everything up to the socket —
  * batch shaping, pacing, retry, partial-failure accounting, readiness
  * polling — is owned and e2e-tested here (same posture as
  * [[graft.ingest.FetchMain]] on the pull side).
  */
object EsPush {

  /** (url, ndjson body) => response; status -1 models transport error. */
  type PostTransport = (String, String) => Fetcher.Response

  def httpPostTransport(headers: Map[String, String] = Map.empty,
      timeoutMillis: Long = 30000): PostTransport = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMillis))
      .build()
    (url, body) => {
      try {
        val b = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(timeoutMillis))
          .header("Content-Type", "application/x-ndjson")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        headers.foreach { case (k, v) => b.header(k, v) }
        val resp = client.send(b.build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        Fetcher.Response(resp.statusCode(), resp.body())
      } catch {
        case scala.util.control.NonFatal(_) => Fetcher.Response(-1, "")
      }
    }
  }

  private val mapper = new ObjectMapper()

  /** Ids of items the bulk response reports failed (status >= 300). */
  def failedItemIds(bulkResponse: String): Seq[String] = {
    val root = mapper.readTree(bulkResponse)
    if (root == null || !root.has("items")) Seq.empty
    else {
      val items = root.get("items")
      (0 until items.size()).flatMap { i =>
        // each item is {"index": {...}} / {"create": {...}}; an empty
        // item object (malformed response) has no fields — skip it
        // rather than throw mid-push
        val fields = items.get(i).fields()
        if (!fields.hasNext) None
        else {
          val op = fields.next().getValue
          val status =
            if (op.has("status")) op.get("status").asInt(500) else 500
          if (status >= 300 && op.has("_id")) Some(op.get("_id").asText)
          else None
        }
      }
    }
  }

  final case class PushResult(batches: Int, failedBatches: Seq[String],
      failedIds: Seq[String])

  /** POST every payload file under `dir` as one `_bulk` request.
    * Transport-level failures retry through the gate (`retries`
    * remaining, like get_response_json); a batch that exhausts retries
    * is recorded and the push CONTINUES (skip-error accumulation) —
    * the caller decides whether the aggregate is fatal. Item-level
    * failures (per-doc status >= 300 in a 200 response) accumulate as
    * failedIds — the bulk API's partial-failure contract.
    */
  def pushBulkDir(post: PostTransport, gate: Fetcher.DelayGate,
      esUrl: String, dir: Path, retries: Int = 2): PushResult = {
    val listing = Files.list(dir)
    val files = try {
      listing.toArray.map(_.asInstanceOf[Path])
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .sortBy(_.getFileName.toString)
    } finally listing.close()
    var batches = 0
    val failedBatches = Seq.newBuilder[String]
    val failedIds = Seq.newBuilder[String]
    files.foreach { f =>
      val raw = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      if (raw.nonEmpty) {
        // the _bulk wire format requires a trailing newline
        val body = if (raw.endsWith("\n")) raw else raw + "\n"
        var remaining = retries
        var done = false
        while (!done) {
          gate.pass()
          val r = post(s"$esUrl/_bulk", body)
          if (r.status == 200) {
            failedIds ++= failedItemIds(r.body)
            batches += 1
            done = true
          } else if (remaining <= 0) {
            failedBatches += f.getFileName.toString
            done = true
          } else remaining -= 1
        }
      }
    }
    PushResult(batches, failedBatches.result(), failedIds.result())
  }

  /** Poll `GET <esUrl>/<index>/_count` through the gate until the
    * index reports at least `expected` documents (the ingestion-
    * visible readiness condition) or `maxPolls` attempts pass.
    */
  def awaitCount(get: Fetcher.Transport, gate: Fetcher.DelayGate,
      esUrl: String, index: String, expected: Long, maxPolls: Int)
      : Boolean = {
    var polls = 0
    while (polls < maxPolls) {
      gate.pass()
      val r = get(s"$esUrl/$index/_count", Map.empty)
      if (r.status == 200) {
        try {
          val n = mapper.readTree(r.body).get("count").asLong(-1)
          if (n >= expected) return true
        } catch { case _: Exception => () }
      }
      polls += 1
    }
    false
  }

  /** (method, url, body) => response — the verb-generic REST transport
    * the index lifecycle needs (PUT index, POST _aliases, DELETE index).
    * Status -1 models transport error, like [[PostTransport]].
    */
  type RestTransport = (String, String, String) => Fetcher.Response

  def httpRestTransport(timeoutMillis: Long = 30000): RestTransport = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMillis))
      .build()
    (method, url, body) => {
      try {
        val resp = client.send(java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(timeoutMillis))
          .header("Content-Type", "application/json")
          .method(method,
            java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        Fetcher.Response(resp.statusCode(), resp.body())
      } catch {
        case scala.util.control.NonFatal(_) => Fetcher.Response(-1, "")
      }
    }
  }

  /** The index currently behind `alias` (None when unbound) —
    * `GET /_alias/{alias}`; the reference reads the same fact through
    * its ingestion server's stat endpoint
    * (`data_refresh_task_factory.py:167-174`).
    */
  def currentIndex(rest: RestTransport, gate: Fetcher.DelayGate,
      esUrl: String, alias: String): Option[String] = {
    gate.pass()
    val r = rest("GET", s"$esUrl/_alias/$alias", "")
    if (r.status != 200) None
    else try {
      val names = mapper.readTree(r.body).fieldNames()
      if (names.hasNext) Some(names.next()) else None
    } catch { case _: Exception => None }
  }

  /** Atomically point `alias` at `newIndex`: ONE `_aliases` POST whose
    * actions remove the old binding and add the new one — there is no
    * moment where the alias resolves to nothing or to both (the
    * zero-downtime property the reference's promote step relies on).
    */
  def promoteAlias(rest: RestTransport, gate: Fetcher.DelayGate,
      esUrl: String, alias: String, newIndex: String,
      oldIndex: Option[String]): Boolean = {
    val remove = oldIndex.filter(_ != newIndex).map(o =>
      s"""{"remove": {"index": "$o", "alias": "$alias"}}, """).getOrElse("")
    val body =
      s"""{"actions": [$remove{"add": {"index": "$newIndex", "alias": "$alias"}}]}"""
    gate.pass()
    rest("POST", s"$esUrl/_aliases", body).status == 200
  }

  final case class RefreshResult(newIndex: String, created: Boolean,
      push: Option[PushResult], ready: Boolean, promoted: Boolean,
      oldIndex: Option[String], oldDeleted: Boolean)

  /** The reference's zero-downtime data-refresh lifecycle
    * (`data_refresh_task_factory.py:183-240`): resolve the index
    * currently behind `alias` → create `<alias>-<indexSuffix>` → bulk-
    * ingest into it → await the expected doc count → atomically promote
    * the alias → delete the now-unused old index.
    *
    * Bulk payload files must target the CONCRETE new index name
    * (`EsBulk.writeBulkFiles(df, s"$alias-$indexSuffix", ...)`) — ES
    * gives an action line's `_index` precedence over the request URL,
    * so alias-targeted payloads would land in the OLD index mid-swap.
    *
    * Promotion only happens for a COMPLETE ingest (no failed batches,
    * count visible); on any earlier failure the alias keeps serving the
    * old index and nothing is deleted — every step's outcome is in the
    * returned [[RefreshResult]], the same skip-error posture as
    * [[pushBulkDir]].
    */
  def refreshIndex(rest: RestTransport, postBulk: PostTransport,
      gate: Fetcher.DelayGate, esUrl: String, alias: String,
      indexSuffix: String, bulkDir: Path, expected: Long,
      retries: Int = 2, maxPolls: Int = 60): RefreshResult = {
    val old = currentIndex(rest, gate, esUrl, alias)
    val newIndex = s"$alias-$indexSuffix"
    gate.pass()
    val created = rest("PUT", s"$esUrl/$newIndex", "{}").status == 200
    if (!created)
      return RefreshResult(newIndex, created = false, None, ready = false,
        promoted = false, old, oldDeleted = false)
    val push = pushBulkDir(postBulk, gate, esUrl, bulkDir, retries)
    val ready = awaitCount((url, _) => rest("GET", url, ""), gate, esUrl,
      newIndex, expected, maxPolls)
    val promoted = ready && push.failedBatches.isEmpty &&
      promoteAlias(rest, gate, esUrl, alias, newIndex, old)
    val oldDeleted = promoted && old.exists(_ != newIndex) && {
      gate.pass()
      rest("DELETE", s"$esUrl/${old.get}", "").status == 200
    }
    RefreshResult(newIndex, created, Some(push), ready, promoted, old,
      oldDeleted)
  }

  /** Runnable push: payload dir → _bulk POSTs → readiness poll.
    * Usage: EsPushMain <esUrl> <bulkDir> <index> <expectedCount>
    *        [delayMs] [retries]
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: EsPush <esUrl> <bulkDir> <index> <expectedCount> " +
        "[delayMs] [retries]")
    val Array(esUrl, bulkDir, index, expected) = args.take(4)
    val delayMs = if (args.length > 4) args(4).toLong else 500L
    val retries = if (args.length > 5) args(5).toInt else 2
    val gate = new Fetcher.DelayGate(delayMs)
    val res = pushBulkDir(httpPostTransport(), gate, esUrl,
      java.nio.file.Paths.get(bulkDir), retries)
    println(s"PUSH batches=${res.batches} " +
      s"failed_batches=${res.failedBatches.size} " +
      s"failed_ids=${res.failedIds.size}")
    val ready = awaitCount(Fetcher.httpTransport(), gate, esUrl, index,
      expected.toLong, maxPolls = 60)
    println(s"READY $ready")
    if (res.failedBatches.nonEmpty || res.failedIds.nonEmpty || !ready)
      sys.exit(1)
  }
}
