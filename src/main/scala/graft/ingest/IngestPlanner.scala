package graft.ingest

import java.time.{Instant, LocalDate}

/** Driver-side ingestion planning (SURVEY.md §2.8 ST1–ST5, ST9).
  *
  * These are the reference's incremental-pull semantics as pure,
  * testable logic — they never touch Spark. The data-plane counterpart
  * (idempotent per-column merge) is operators.MergeUpsert; this module
  * decides WHAT (provider, time-slice) pulls happen.
  *
  * Reference:
  *  - adaptive time slicing:
  *    `catalog/dags/providers/provider_api_scripts/
  *    time_delineated_provider_data_ingester.py:68-196` — a day splits
  *    into hour / 5-minute slices when the expected record count would
  *    exceed what pagination can reach;
  *  - tiered reingestion schedules:
  *    `catalog/dags/providers/provider_dag_factory.py:393-474` — old
  *    dates re-pulled at day-shifts like [[1,2,3],[8,13,18],…], relying
  *    on the idempotent merge for correctness;
  *  - error-skip accumulation: `provider_data_ingester.py:255-269` —
  *    failing slices are recorded and re-raised in aggregate, never
  *    aborting the run mid-way.
  */
object IngestPlanner {

  /** A half-open pull window [startSec, endSec). */
  final case class Slice(startSec: Long, endSec: Long)

  final val DaySec = 86400L

  /** Split one ingestion day into slices small enough that no slice is
    * expected to exceed `maxPerSlice` reachable records (the API's
    * pagination ceiling). Mirrors the reference's day → 24×1h → 288×5min
    * escalation.
    */
  def planDay(dayStartSec: Long, estRecords: Long, maxPerSlice: Long)
      : Seq[Slice] = {
    require(maxPerSlice > 0, "maxPerSlice must be positive")
    val divisions =
      if (estRecords <= maxPerSlice) 1
      else if (estRecords <= maxPerSlice * 24) 24
      else 288
    val width = DaySec / divisions
    (0 until divisions).map(i =>
      Slice(dayStartSec + i * width, dayStartSec + (i + 1) * width))
  }

  /** Dates to (re)ingest for a run on `base`: today plus each tier's
    * day-shifts. Tiers run in sequence (the reference places barriers
    * between them, provider_dag_factory.py:520-532); within a tier order
    * is preserved.
    */
  def reingestionDates(base: LocalDate, tiers: Seq[Seq[Int]])
      : Seq[Seq[LocalDate]] =
    Seq(Seq(base)) ++ tiers.map(_.map(shift => base.minusDays(shift.toLong)))

  /** ST9 — run a pull function over slices, accumulating failures
    * instead of aborting; failed slices are returned for quarantine /
    * retry and the aggregate error is the caller's decision.
    */
  def runSlices[A](slices: Seq[Slice])(pull: Slice => A)
      : (Seq[A], Seq[(Slice, Throwable)]) = {
    val results = Seq.newBuilder[A]
    val failures = Seq.newBuilder[(Slice, Throwable)]
    slices.foreach { s =>
      try results += pull(s)
      catch { case e: Exception => failures += ((s, e)) }
    }
    (results.result(), failures.result())
  }

  /** ST5 — skip-if-unchanged source sensing: pull only if the source's
    * last-modified instant is after the last successful run.
    */
  def shouldPull(sourceLastModified: Instant, lastSuccess: Option[Instant])
      : Boolean =
    lastSuccess.forall(sourceLastModified.isAfter)
}
