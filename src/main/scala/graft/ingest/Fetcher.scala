package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import com.fasterxml.jackson.databind.ObjectMapper

/** S2 — the driver-side HTTP fetch loop: rate-limited GET with retries,
  * paginated batch pulls, and a JSONL landing zone for the Spark-side
  * extractors ([[ProviderExtract]]). Runnable end-to-end via
  * [[graft.ingest.FetchMain]].
  *
  * Semantics mirror the reference's operational core:
  *  - `requester.py:31-131` (DelayedRequester): at least `delay`
  *    seconds between consecutive request STARTS; a failed transport
  *    returns None rather than raising;
  *  - `requester.py:132-161` (get_response_json): retry while the body
  *    is missing, unparseable, or carries a non-null "error" key;
  *    exhausting retries raises RetriesExceeded;
  *  - `provider_data_ingester.py:203-280` (ingest_records): loop
  *    next-params → get batch → process, stopping on an empty batch,
  *    an exhausted paginator, or the ingestion limit; batch failures
  *    matching the skip predicate accumulate instead of aborting
  *    (the errors re-raise in aggregate after the commit).
  *
  * The transport is injected (`(url, params) => Response`) so the loop
  * logic is testable without sockets; [[Fetcher.httpTransport]] is the
  * real JDK HttpClient one used by FetchMain and the e2e socket spec.
  */
object Fetcher {

  /** Exhausted retries in [[getResponseJson]] (requester.py:25-29). */
  final class RetriesExceeded(msg: String) extends RuntimeException(msg)

  /** One HTTP response; `status = -1` models a transport error (the
    * reference's `return None` path, requester.py:94-100).
    */
  final case class Response(status: Int, body: String)

  type Transport = (String, Map[String, String]) => Response

  /** Minimum-interval rate gate (requester.py:127-131): `pass()`
    * blocks until at least `delayMillis` has elapsed since the
    * previous `pass()` returned. Clock and sleeper are injectable for
    * deterministic tests.
    */
  final class DelayGate(delayMillis: Long,
      now: () => Long = System.nanoTime,
      sleep: Long => Unit = Thread.sleep) {
    private var lastNanos = Long.MinValue
    def pass(): Unit = synchronized {
      if (lastNanos != Long.MinValue) {
        val waitMs = delayMillis - (now() - lastNanos) / 1000000L
        if (waitMs > 0) sleep(waitMs)
      }
      lastNanos = now()
    }
  }

  /** URL-encode params onto a base endpoint. */
  def withParams(endpoint: String, params: Map[String, String]): String =
    if (params.isEmpty) endpoint
    else {
      val q = params.toSeq.sortBy(_._1).map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" +
          java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      endpoint + (if (endpoint.contains("?")) "&" else "?") + q
    }

  /** Real transport: JDK HttpClient GET with the given headers; any
    * exception maps to the status = -1 transport-error Response.
    */
  def httpTransport(headers: Map[String, String] = Map.empty,
      timeoutMillis: Long = 30000): Transport = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMillis))
      .build()
    (endpoint, params) => {
      try {
        val b = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(withParams(endpoint, params)))
          .timeout(java.time.Duration.ofMillis(timeoutMillis))
          .GET()
        headers.foreach { case (k, v) => b.header(k, v) }
        val resp = client.send(b.build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        Response(resp.statusCode(), resp.body())
      } catch {
        case scala.util.control.NonFatal(_) => Response(-1, "")
      }
    }
  }

  private val mapper = new ObjectMapper()

  /** A 200 body parsed to JSON, or None if the status is not 200, the
    * body is unparseable, or the JSON carries a non-null "error" key —
    * exactly the conditions get_response_json retries on
    * (requester.py:132-152).
    */
  private def goodJson(r: Response): Option[String] =
    if (r.status != 200) None
    else try {
      val node = mapper.readTree(r.body)
      if (node == null) None
      else if (node.isObject && node.has("error") &&
        !node.get("error").isNull) None
      // re-serialize compact: landing files are JSONL, one batch per
      // line, so embedded newlines in the raw body must not survive
      else Some(mapper.writeValueAsString(node))
    } catch { case _: Exception => None }

  /** get_response_json (requester.py:132-161): GET through the rate
    * gate, retrying bad responses; `retries` is the number of RETRIES
    * remaining (so `retries = 2` allows 3 attempts total), and
    * exhausting them raises [[RetriesExceeded]].
    */
  def getResponseJson(transport: Transport, gate: DelayGate,
      endpoint: String, params: Map[String, String], retries: Int)
      : String = {
    var remaining = retries
    while (true) {
      gate.pass()
      goodJson(transport(endpoint, params)) match {
        case Some(json) => return json
        case None =>
          if (remaining <= 0)
            throw new RetriesExceeded(s"Retries exceeded for $endpoint " +
              s"params=$params")
          remaining -= 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One batch failure recorded and skipped
    * (provider_data_ingester.py:255-269).
    */
  final case class SkippedBatch(params: Map[String, String], error: String)

  /** Result of one [[ingestRecords]] run: request/record counts, the
    * landing file (one good batch per line), and the skipped-batch
    * errors (the caller decides whether their aggregate is fatal —
    * the reference re-raises them after committing).
    */
  final case class IngestResult(requests: Int, records: Long,
      landingFile: Path, skipped: Seq[SkippedBatch])

  /** The ingest_records loop (provider_data_ingester.py:203-280):
    *
    *   - `nextParams(prevBatch)` is the provider's pagination state
    *     machine — None for the first call's input, None as output
    *     stops the loop (the get_next_query_params contract);
    *   - each batch fetches via [[getResponseJson]] (rate-limited,
    *     retried) and lands as one JSONL line;
    *   - `countRecords(batch)` drives the empty-batch stop and the
    *     ingestion `limit` (record_count >= limit stops);
    *   - a batch whose retries exhaust is recorded in `skipped` and the
    *     loop CONTINUES with the next params (skip-error accumulation,
    *     ST9) — any other exception propagates after the landing file
    *     is flushed (the reference commits before re-raising);
    *   - `maxConsecutiveSkips` bounds a DEAD endpoint: page-counter
    *     paginators never exhaust on their own, so without this bound
    *     an unreachable server turns the skip path into an infinite
    *     loop. A successful batch resets the window.
    */
  def ingestRecords(transport: Transport, gate: DelayGate,
      endpoint: String, nextParams: Option[String] => Option[Map[String, String]],
      countRecords: String => Long, landingFile: Path,
      retries: Int = 2, limit: Long = Long.MaxValue,
      maxConsecutiveSkips: Int = 3): IngestResult = {
    Files.createDirectories(landingFile.getParent)
    val out = Files.newBufferedWriter(landingFile, StandardCharsets.UTF_8)
    var requests = 0
    var records = 0L
    val skipped = Seq.newBuilder[SkippedBatch]
    try {
      var prev: Option[String] = None
      var continue = true
      var consecutiveSkips = 0
      while (continue) {
        nextParams(prev) match {
          case None => continue = false
          case Some(params) =>
            try {
              val batch = getResponseJson(transport, gate, endpoint,
                params, retries)
              requests += 1
              consecutiveSkips = 0
              val n = countRecords(batch)
              if (n <= 0) continue = false
              else {
                out.write(batch); out.newLine()
                records += n
                prev = Some(batch)
                if (records >= limit) continue = false
              }
            } catch {
              case e: RetriesExceeded =>
                // skip-error accumulation: record and CONTINUE — the
                // paginator sees the previous good batch again, so
                // page-counter providers keep walking past the hole —
                // until the consecutive-skip bound says the endpoint
                // is dead, not flaky
                requests += 1
                skipped += SkippedBatch(params, e.getMessage)
                consecutiveSkips += 1
                if (consecutiveSkips >= maxConsecutiveSkips)
                  continue = false
            }
        }
      }
    } finally out.close()
    IngestResult(requests, records, landingFile, skipped.result())
  }

  /** Page-number pagination (flickr.py-style, the most common
    * archetype): emits page=1.., reading `pages` (total page count)
    * from each response to stop; `extra` params ride along (API key,
    * date-slice bounds, per-page).
    */
  def pageNumberParams(extra: Map[String, String], startPage: Long = 1)
      : Option[String] => Option[Map[String, String]] = {
    var page = startPage - 1
    var totalPages = Long.MaxValue
    prev => {
      prev.foreach { body =>
        try {
          val node = mapper.readTree(body)
          if (node.isObject && node.has("pages"))
            totalPages = node.get("pages").asLong(Long.MaxValue)
        } catch { case _: Exception => () }
      }
      page += 1
      if (page > totalPages) None
      else Some(extra + ("page" -> page.toString))
    }
  }

  /** Record count of a flickr-style batch: size of the photo array. */
  def flickrBatchCount(body: String): Long =
    try {
      val node = mapper.readTree(body)
      if (node.isObject && node.has("photo") && node.get("photo").isArray)
        node.get("photo").size().toLong
      else 0L
    } catch { case _: Exception => 0L }
}
