package graft.sources

import scala.collection.mutable.ArrayBuffer

import graft.SparkSpec

class RestSourceSpec extends SparkSpec {

  private def policy(sleeps: ArrayBuffer[Long], attempts: Int = 3) =
    RestSource.RetryPolicy(attempts = attempts, initialDelayMs = 100,
      backoffFactor = 2.0, sleeper = sleeps += _)

  test("fetchWithRetry backs off exponentially on transient statuses, then succeeds") {
    val sleeps = ArrayBuffer.empty[Long]
    var calls = 0
    val flaky: RestSource.Fetch = (_, _) => {
      calls += 1
      if (calls <= 3) Left(RestSource.HttpError(503, "unavailable"))
      else Right("""[{"id": 1}]""")
    }
    val out = RestSource.fetchWithRetry(flaky, "/products", policy = policy(sleeps))
    assert(out == Right("""[{"id": 1}]"""))
    assert(calls == 4)
    assert(sleeps.toSeq == Seq(100L, 200L, 400L), "exponential schedule")
  }

  test("fetchWithRetry gives up after the retry budget and on non-retryable statuses") {
    val sleeps = ArrayBuffer.empty[Long]
    var calls = 0
    val dead: RestSource.Fetch = (_, _) => { calls += 1; Left(RestSource.HttpError(500, "boom")) }
    assert(RestSource.fetchWithRetry(dead, "/x", policy = policy(sleeps)).isLeft)
    assert(calls == 4) // 1 initial + 3 retries

    calls = 0
    val notFound: RestSource.Fetch = (_, _) => { calls += 1; Left(RestSource.HttpError(404, "no")) }
    assert(RestSource.fetchWithRetry(notFound, "/x", policy = policy(sleeps)).isLeft)
    assert(calls == 1, "404 must not retry")
  }

  test("RateLimiter enforces the minimum interval with injected clock") {
    val sleeps = ArrayBuffer.empty[Long]
    var now = 1000L
    val rl = new RestSource.RateLimiter(50, clock = () => now, sleeper = sleeps += _)
    rl.acquire()            // first call free
    now += 10
    rl.acquire()            // 10ms elapsed → wait 40
    now += 100
    rl.acquire()            // long gap → no wait
    assert(sleeps.toSeq == Seq(40L))
  }

  test("fetchPaged walks pages until the empty page and lands them as rows") {
    val served = ArrayBuffer.empty[String]
    val fetch: RestSource.Fetch = (_, params) => {
      served += params("page")
      params("page").toInt match {
        case 1 => Right("""[{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]""")
        case 2 => Right("""{"id": 3, "v": "c"}""") // bare object page
        case _ => Right("[]")
      }
    }
    val pages = RestSource.fetchPaged(fetch, "/carts")
    assert(served.toSeq == Seq("1", "2", "3"))
    assert(pages.size == 2)
    val df = RestSource.land(spark, pages)
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("fetchPaged surfaces exhausted retries as an error and honors maxPages") {
    val sleeps = ArrayBuffer.empty[Long]
    val dead: RestSource.Fetch = (_, _) => Left(RestSource.HttpError(429, "limited"))
    intercept[java.io.IOException] {
      RestSource.fetchPaged(dead, "/x", policy = policy(sleeps))
    }
    // hitting the cap with data still flowing is a TRUNCATED extract —
    // loud by default, explicit opt-in for deliberate sampling caps
    val infinite: RestSource.Fetch = (_, _) => Right("""[{"id": 1}]""")
    val e = intercept[java.io.IOException] {
      RestSource.fetchPaged(infinite, "/x", maxPages = 7)
    }
    assert(e.getMessage.contains("truncated"))
    // opted-in truncation skips the boundary probe: exactly maxPages
    // requests, no wasted rate-limited call whose answer is discarded
    var truncCalls = 0
    val counted: RestSource.Fetch = (_, _) => { truncCalls += 1; Right("""[{"id": 1}]""") }
    assert(RestSource.fetchPaged(counted, "/x", maxPages = 7,
      allowTruncated = true).size == 7)
    assert(truncCalls == 7, s"probe must be skipped, got $truncCalls requests")
    // an API with EXACTLY maxPages pages is complete, not truncated: the
    // boundary probe (one request past the cap) sees the empty page
    val exactly7: RestSource.Fetch = (_, params) =>
      if (params("page").toInt <= 7) Right(s"""[{"id": ${params("page")}}]""")
      else Right("[]")
    assert(RestSource.fetchPaged(exactly7, "/x", maxPages = 7).size == 7)
  }

  test("saveRawTo lands raw page bodies before parsing; landSaved replays them") {
    val dir = java.nio.file.Files.createTempDirectory("rest-raw").toString
    val fetch: RestSource.Fetch = (_, params) =>
      params("page").toInt match {
        case 1 => Right("""[{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]""")
        case 2 => Right("""{"id": 3, "v": "c"}""")
        case _ => Right("[]")
      }
    val df = RestSource.extract(spark, fetch, "/carts", saveRawTo = Some(dir))
    assert(df.count() == 3)
    // raw bodies on disk, byte-identical, one file per page in order
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.toSeq == Seq("page_00001.json", "page_00002.json"))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "page_00002.json"))) == """{"id": 3, "v": "c"}""")
    // replay from the landing zone without the API: same rows
    val replayed = RestSource.landSaved(spark, dir)
    assert(replayed.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      df.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // stray non-page files (editor backup, partial temp) must not crash
    // the numeric sort or join the replay
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "page_tmp"),
      "junk".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "page_00001.json.bak"),
      """[{"id": 99, "v": "stale"}]""".getBytes)
    val again = RestSource.landSaved(spark, dir)
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("extract composes paging + landing into one DataFrame") {
    val fetch: RestSource.Fetch = (_, params) =>
      if (params("page").toInt <= 2) Right(s"""[{"id": ${params("page")}}]""")
      else Right("[]")
    val df = RestSource.extract(spark, fetch, "/users")
    assert(df.count() == 2)
  }
}
