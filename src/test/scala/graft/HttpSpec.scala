package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.Http

/** S1 fetch leg against a local in-process HTTP stub: success path,
  * transient-5xx-then-success retry, fail-fast on 4xx, exhausted retries,
  * and the end-to-end fetch→parse→Silver ingest edge — no network. */
class HttpSpec extends SparkSpecBase {

  private val payload =
    """{"name": "Paris",
      | "sys": {"country": "FR", "sunrise": 1234560000, "sunset": 1234599000},
      | "dt": 1234567890,
      | "main": {"temp": 20.5, "feels_like": 19.0, "temp_min": 18.0, "temp_max": 22.0,
      |          "pressure": 1013, "humidity": 65},
      | "visibility": 10000,
      | "wind": {"speed": 5.5, "deg": 180},
      | "clouds": {"all": 20},
      | "weather": [{"main": "Clear", "description": "clear sky"}]}""".stripMargin

  /** Serve `handler` on an ephemeral port for the duration of `f`. */
  private def withServer[T](handler: HttpExchange => (Int, String))(f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", { ex =>
      val (status, body) = handler(ex)
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/data")
    finally server.stop(0)
  }

  private def client(base: String, sleeps: StringBuilder = new StringBuilder) =
    new Http.Client(base, "test-key", maxAttempts = 3, backoffMs = 100,
      sleeper = ms => { sleeps.append(ms).append(','); () })

  test("success: GET carries query params and returns the body first attempt") {
    var seenQuery: String = null
    withServer { ex => seenQuery = ex.getRequestURI.getQuery; (200, payload) } { base =>
      val r = client(base).fetchCity("Paris")
      assert(r.status == 200 && r.attempts == 1 && r.body.contains(payload))
      assert(seenQuery == "q=Paris&appid=test-key&units=metric")
    }
  }

  test("transient 500s retry with exponential backoff then succeed") {
    val n = new AtomicInteger(0)
    val sleeps = new StringBuilder
    withServer { _ =>
      if (n.incrementAndGet() < 3) (500, "boom") else (200, payload)
    } { base =>
      val r = client(base, sleeps).fetchCity("Paris")
      assert(r.body.contains(payload) && r.attempts == 3)
      assert(sleeps.toString == "100,200,", s"backoff: $sleeps")
    }
  }

  test("4xx fails fast without retry (raise_for_status → None parity)") {
    val n = new AtomicInteger(0)
    withServer { _ => n.incrementAndGet(); (404, "no such city") } { base =>
      val r = client(base).fetchCity("Nowhere")
      assert(r.status == 404 && r.body.isEmpty && r.attempts == 1)
      assert(n.get() == 1)
    }
  }

  test("exhausted retries return None after maxAttempts") {
    val n = new AtomicInteger(0)
    withServer { _ => n.incrementAndGet(); (503, "down") } { base =>
      val r = client(base).fetchCity("Paris")
      assert(r.body.isEmpty && r.attempts == 3 && n.get() == 3)
    }
  }

  test("connection failure is retried like a 5xx") {
    val sleeps = new StringBuilder
    // nothing listens on this port (bound then released)
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = s.getAddress.getPort
    s.stop(0)
    val r = client(s"http://127.0.0.1:$port/data", sleeps).fetchCity("Paris")
    assert(r.status == -1 && r.body.isEmpty && r.attempts == 3)
  }

  test("end-to-end ingest: fetch → parse → bronze-shaped frame, mixed outcomes") {
    val n = new AtomicInteger(0)
    withServer { ex =>
      // Paris succeeds; London 500s once then succeeds; Gotham 404s
      val q = ex.getRequestURI.getQuery
      if (q.contains("q=Gotham")) (404, "")
      else if (q.contains("q=London") && n.incrementAndGet() == 1) (500, "")
      else (200, payload)
    } { base =>
      val df = Http.ingest(spark, client(base), Seq("Paris", "London", "Gotham"))
      assert(df.count() == 2, "two successful cities")
      val row = df.head()
      assert(row.getAs[String]("city") == "Paris") // payload body's name field
      assert(row.getAs[Double]("temperature") == 20.5)
      assert(row.getAs[java.sql.Timestamp]("timestamp").getTime == 1234567890000L)
      // the ingest edge output feeds clean() directly
      val silverReady = df.columns.toSet
      Seq("city", "country", "timestamp", "temperature", "sunrise", "sunset",
        "ingestion_timestamp").foreach(c => assert(silverReady.contains(c), c))
    }
  }
}
