package graft.ingest

import java.time.Instant

/** S3 — OAuth2 session lifecycle (reference `dags/oauth2/oauth2.py`):
  * the HTTP token exchange itself is the driver-side fetcher's job (no
  * network in the engine), but the TOKEN STATE MACHINE the reference
  * runs through its Variable store + refresh DAG is pure logic and
  * lives here: per-provider (access, refresh) pairs, one-time
  * authorization, rotate-on-refresh, refresh-before-expiry planning,
  * and the skip-unauthorized rule (`oauth2.py:121-143`).
  */
object OAuth {

  /** One provider's stored tokens (`OAUTH2_TOKEN_KEY` entry shape). */
  case class TokenPair(accessToken: String, refreshToken: String,
      expiresAt: Instant)

  type TokenStore = Map[String, TokenPair]

  /** One-time authorization (`authorize_providers:95-118`): exchanges
    * happen outside; recording the resulting pair is idempotent and
    * never downgrades an existing pair (the reference pops the one-time
    * auth code only when no tokens exist yet).
    */
  def authorize(store: TokenStore, provider: String, pair: TokenPair)
      : TokenStore =
    if (store.contains(provider)) store else store + (provider -> pair)

  /** Refresh is due when the access token is inside `margin` of expiry
    * (the reference refreshes on a schedule strictly shorter than the
    * provider's token lifetime — same contract).
    */
  def needsRefresh(now: Instant, pair: TokenPair,
      margin: java.time.Duration): Boolean =
    !now.plus(margin).isBefore(pair.expiresAt)

  /** Providers whose tokens must rotate now, in store order. */
  def refreshPlan(store: TokenStore, now: Instant,
      margin: java.time.Duration): Seq[String] =
    store.toSeq.collect {
      case (p, pair) if needsRefresh(now, pair, margin) => p
    }.sorted

  /** Apply a completed refresh (`refresh:121-143` + `_update_tokens`):
    * BOTH tokens rotate — the old refresh token is spent. Refreshing a
    * provider that was never authorized is an error (the
    * AirflowSkipException path).
    */
  def applyRefresh(store: TokenStore, provider: String,
      newPair: TokenPair): Either[String, TokenStore] =
    if (!store.contains(provider))
      Left(s"Provider $provider had no stored tokens, it may need to be " +
        "authorized first.")
    else Right(store + (provider -> newPair))
}
