package graft.sources

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.WeatherSilver

/** S1 fetch leg: the driver-side HTTP client the reference runs before
  * Kafka (weather_producer.py:66-91 — GET q/appid/units=metric, 10 s
  * timeout, errors → None). The reference holds its retries one level up
  * (producer retries=3 at weather_producer.py:152; DAG retries=3 at
  * weather_pipeline_dag.py:22-24); here the client retries transient
  * failures itself — 3 attempts, exponential backoff — because there is
  * no Airflow around a library call.
  *
  * This is deliberately NOT a Spark data source: a few hundred city
  * fetches per cycle is driver work (SURVEY §2.1 S1). The executor-scale
  * part — parse, clean, aggregate — starts at [[WeatherSilver
  * .parseApiPayload]] over the DataFrame this module produces.
  */
object Http {

  /** One fetch outcome; `body` is None after exhausted retries or a
    * non-retryable status (mirrors fetch_weather's Optional[Dict]). */
  final case class FetchResult(
      city: String, status: Int, body: Option[String], attempts: Int)

  /** Retry transient failures only: connection errors, 5xx, 429. A plain
    * 4xx (bad city, bad key) fails fast like the reference's
    * raise_for_status → None. */
  def retryable(status: Int): Boolean = status >= 500 || status == 429

  final class Client(
      baseUrl: String,
      apiKey: String,
      timeout: Duration = Duration.ofSeconds(10),
      maxAttempts: Int = 3,
      backoffMs: Long = 200,
      sleeper: Long => Unit = Thread.sleep) {

    private val http = HttpClient.newBuilder().connectTimeout(timeout).build()

    private def url(city: String): String = {
      val q = URLEncoder.encode(city, StandardCharsets.UTF_8)
      s"$baseUrl?q=$q&appid=$apiKey&units=metric"
    }

    /** GET one city with bounded retry; never throws. */
    def fetchCity(city: String): FetchResult = {
      var attempt = 0
      var last: FetchResult = FetchResult(city, -1, None, 0)
      while (attempt < maxAttempts) {
        attempt += 1
        val outcome =
          try {
            val req = HttpRequest.newBuilder(URI.create(url(city)))
              .timeout(timeout).GET().build()
            val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
            if (resp.statusCode() == 200)
              FetchResult(city, 200, Some(resp.body()), attempt)
            else FetchResult(city, resp.statusCode(), None, attempt)
          } catch {
            case e: java.io.IOException => FetchResult(city, -1, None, attempt)
          }
        last = outcome
        if (outcome.body.isDefined) return outcome
        if (outcome.status >= 200 && !retryable(outcome.status)) return outcome
        if (attempt < maxAttempts) sleeper(backoffMs << (attempt - 1))
      }
      last
    }
  }

  /** Fetch all cities (driver-side loop like run_once,
    * weather_producer.py:236-265) → one payload row per success. */
  def fetchPayloads(spark: SparkSession, client: Client,
      cities: Seq[String]): DataFrame = {
    import spark.implicits._
    cities.map(client.fetchCity)
      .collect { case FetchResult(city, _, Some(body), _) => (city, body) }
      .toDF("fetch_city", "payload")
  }

  /** End-to-end ingest edge: fetch → parse → flat bronze-shaped frame.
    * From here the regular Silver stage takes over. */
  def ingest(spark: SparkSession, client: Client,
      cities: Seq[String]): DataFrame =
    fetchPayloads(spark, client, cities)
      .select(WeatherSilver.parseApiPayload(col("payload")).as("r"))
      .select(col("r.*"))
      .withColumn("ingestion_timestamp", current_timestamp())
}
