package graft

import java.io.InputStream
import java.util.Properties

/** Pipeline configuration mirroring the reference's config.yaml surface
  * (cities → entities, quality bounds config/config.yaml:62-64,
  * consumer batch :12, JDBC batch :84, retention :112-115) as plain
  * properties — no external config dependency is available offline.
  * Defaults are the reference's published values.
  */
final case class GraftConfig(
    valueMin: Double,
    valueMax: Double,
    maxNullPct: Double,
    consumerBatchSize: Int,
    jdbcBatchSize: Int,
    retentionBronzeDays: Int,
    retentionSilverDays: Int,
    retentionGoldDays: Int,
    dedupKeys: Seq[String])

object GraftConfig {

  val default: GraftConfig = GraftConfig(
    valueMin = -100.0, valueMax = 60.0,       // temp bounds, config.yaml:63-64
    maxNullPct = 10.0,                        // config.yaml:107
    consumerBatchSize = 100,                  // config.yaml:12
    jdbcBatchSize = 1000,                     // config.yaml:84
    retentionBronzeDays = 30, retentionSilverDays = 90,
    retentionGoldDays = 365,                  // config.yaml:112-115
    dedupKeys = Seq("city", "timestamp"))     // config.yaml:85

  def fromProperties(p: Properties): GraftConfig = {
    def d(k: String, dv: Double) = Option(p.getProperty(k)).map(_.toDouble).getOrElse(dv)
    def i(k: String, dv: Int) = Option(p.getProperty(k)).map(_.toInt).getOrElse(dv)
    GraftConfig(
      valueMin = d("quality.value.min", default.valueMin),
      valueMax = d("quality.value.max", default.valueMax),
      maxNullPct = d("quality.null.maxpct", default.maxNullPct),
      consumerBatchSize = i("consumer.batch.size", default.consumerBatchSize),
      jdbcBatchSize = i("jdbc.batch.size", default.jdbcBatchSize),
      retentionBronzeDays = i("retention.bronze.days", default.retentionBronzeDays),
      retentionSilverDays = i("retention.silver.days", default.retentionSilverDays),
      retentionGoldDays = i("retention.gold.days", default.retentionGoldDays),
      dedupKeys = Option(p.getProperty("dedup.keys"))
        .map(_.split(",").toSeq.map(_.trim)).getOrElse(default.dedupKeys))
  }

  def load(in: InputStream): GraftConfig = {
    val p = new Properties()
    try p.load(in) finally in.close()
    fromProperties(p)
  }
}
