package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** REST/API extraction — the reference's `APIConnector`
  * (`/root/reference/src/extract/api_connector.py`) re-thought for a Spark
  * pipeline.
  *
  * Transport is PLUGGABLE: `Fetch` is a plain function so the
  * retry/backoff/rate-limit/pagination machinery is hermetically testable
  * (this container has no egress) and deploys against any HTTP client
  * unchanged. Fetching runs on the DRIVER, deliberately: an external API is
  * one rate-limited endpoint — fan-out from a thousand executors would
  * violate the limit the connector exists to respect (the reference is
  * driver-side for the same reason, api_connector.py:68). Scale resumes the
  * moment pages land: [[land]] parses the page bodies into a distributed
  * DataFrame and everything downstream is ordinary Spark.
  */
object RestSource {

  /** Failed HTTP exchange (status + message), the retryable unit. */
  final case class HttpError(status: Int, message: String)

  /** Transport: (endpoint, query params) → body or error. */
  type Fetch = (String, Map[String, String]) => Either[HttpError, String]

  /** Exponential-backoff retry policy (api_connector.py:76 Retry:
    * `total=retry_attempts, backoff_factor=retry_delay,
    * status_forcelist=[429,500,502,503,504]`). `sleeper` is injectable so
    * specs assert the schedule without wall-clock waits.
    */
  final case class RetryPolicy(attempts: Int = 3, initialDelayMs: Long = 1000,
                               backoffFactor: Double = 2.0,
                               retryOn: Set[Int] = Set(429, 500, 502, 503, 504),
                               sleeper: Long => Unit = Thread.sleep)

  /** GET with retry: transient statuses back off exponentially
    * (`initialDelayMs * factor^attempt`), anything else — and exhausted
    * budgets — surface to the caller.
    */
  @annotation.tailrec
  def fetchWithRetry(fetch: Fetch, endpoint: String,
                     params: Map[String, String] = Map.empty,
                     policy: RetryPolicy = RetryPolicy(),
                     attempt: Int = 0): Either[HttpError, String] =
    fetch(endpoint, params) match {
      case Left(err) if attempt < policy.attempts && policy.retryOn(err.status) =>
        policy.sleeper(
          (policy.initialDelayMs * math.pow(policy.backoffFactor, attempt)).toLong)
        fetchWithRetry(fetch, endpoint, params, policy, attempt + 1)
      case other => other
    }

  /** Minimum-interval rate limiter (api_connector's "configurable rate
    * limiting"): `acquire()` before each call sleeps whatever remains of
    * the interval. Clock and sleeper injectable for testing.
    */
  final class RateLimiter(minIntervalMs: Long,
                          clock: () => Long = () => System.currentTimeMillis(),
                          sleeper: Long => Unit = Thread.sleep) {
    private var last = Long.MinValue
    def acquire(): Unit = synchronized {
      val now = clock()
      if (last != Long.MinValue && now - last < minIntervalMs) {
        val wait = minIntervalMs - (now - last)
        sleeper(wait)
        last = now + wait
      } else last = now
    }
  }

  /** True for a page body that signals "no more data": empty string or an
    * empty JSON array.
    */
  def isEmptyPage(body: String): Boolean = {
    val t = body.trim
    t.isEmpty || t.replaceAll("\\s", "") == "[]"
  }

  /** Paged fetch: request `pageParam`=1,2,… until an empty page, a
    * non-retryable error after retries, or `maxPages` (the hard stop the
    * reference lacks — an API bug returning the same page forever must not
    * spin the extractor). Returns the raw page bodies, ready for [[land]].
    *
    * Hitting `maxPages` with data still flowing THROWS by default: a
    * silently truncated extract is indistinguishable from a complete one
    * downstream, which is how partial loads go unnoticed. Pass
    * `allowTruncated = true` for deliberate sampling/backfill caps.
    *
    * `saveRawTo` persists each page body (one `page_NNNNN.json` per page,
    * written BEFORE the extractor moves on — api_connector.py:246
    * `save_raw`): the raw landing zone that makes parse bugs replayable
    * without re-hitting the rate-limited API.
    */
  def fetchPaged(fetch: Fetch, endpoint: String,
                 params: Map[String, String] = Map.empty,
                 pageParam: String = "page", maxPages: Int = 1000,
                 policy: RetryPolicy = RetryPolicy(),
                 limiter: Option[RateLimiter] = None,
                 saveRawTo: Option[String] = None,
                 allowTruncated: Boolean = false): Seq[String] = {
    saveRawTo.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    val pages = Seq.newBuilder[String]
    var page = 1
    var done = false
    while (!done && page <= maxPages) {
      limiter.foreach(_.acquire())
      fetchWithRetry(fetch, endpoint, params + (pageParam -> page.toString), policy) match {
        case Right(body) if isEmptyPage(body) => done = true
        case Right(body) =>
          saveRawTo.foreach { d =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(d, f"page_$page%05d.json"),
              body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          pages += body; page += 1
        case Left(err) => throw new java.io.IOException(
          s"REST fetch $endpoint page $page failed after retries: " +
            s"HTTP ${err.status} ${err.message}")
      }
    }
    if (!done && !allowTruncated) {
      // an API with EXACTLY maxPages pages is a complete extract, not a
      // truncated one — probe one page past the cap to tell them apart
      // (one extra request, only on the boundary/truncation path); a
      // probe error counts as "maybe more data", i.e. truncated. When the
      // caller already accepted truncation, the probe's answer would be
      // discarded — skip the wasted (rate-limited) request entirely
      limiter.foreach(_.acquire())
      val more =
        fetchWithRetry(fetch, endpoint, params + (pageParam -> page.toString), policy) match {
          case Right(body) => !isEmptyPage(body)
          case Left(_)     => true
        }
      if (more && !allowTruncated) throw new java.io.IOException(
        s"REST fetch $endpoint truncated at maxPages=$maxPages with data still " +
          "flowing — pass allowTruncated=true if a partial extract is intended")
    }
    pages.result()
  }

  /** Re-land previously saved raw pages ([[fetchPaged]]'s `saveRawTo`
    * directory) without touching the API — the replay path.
    */
  def landSaved(spark: SparkSession, rawDir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(rawDir))
    // strict name match, not a prefix test: a stray `page_001.json.bak` or
    // digitless `page_tmp` would otherwise crash the numeric sort and kill
    // the whole replay
    val pageName = "^page_(\\d+)\\.json$".r
    val paths = // numeric sort (zero-padding alone breaks past its width)
      try listing.iterator().asScala
        .flatMap { p =>
          p.getFileName.toString match {
            case pageName(n) => Some((n.toLong, p))
            case _           => None
          }
        }.toVector.sortBy(_._1).map(_._2)
      finally listing.close() // Files.list leaks an fd unless closed
    land(spark, paths.map(p => new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Land raw JSON page bodies as a DataFrame: each body may be a single
    * object or a top-level array (the reference's list normalization,
    * api_connector.py:117) — Spark's JSON reader explodes array roots into
    * rows. Follow with [[JsonSource]] flatten/explode for nested payloads.
    */
  def land(spark: SparkSession, pages: Seq[String]): DataFrame = {
    val ds: Dataset[String] = spark.createDataset(pages)(Encoders.STRING)
    spark.read.json(ds)
  }

  /** One-call extraction of a paged endpoint into a DataFrame — the
    * `fetch_products`/`fetch_carts` shape (api_connector.py:137), with the
    * optional raw landing zone (`save_raw=True` parity).
    */
  def extract(spark: SparkSession, fetch: Fetch, endpoint: String,
              params: Map[String, String] = Map.empty,
              pageParam: String = "page", maxPages: Int = 1000,
              policy: RetryPolicy = RetryPolicy(),
              limiter: Option[RateLimiter] = None,
              saveRawTo: Option[String] = None,
              allowTruncated: Boolean = false): DataFrame =
    land(spark, fetchPaged(fetch, endpoint, params, pageParam, maxPages, policy,
      limiter, saveRawTo, allowTruncated))
}
