package graft

/** Engine settings mirroring the reference's pydantic config
  * (config.py:8-21, config.yaml.example, FIXTURES.md §4).
  * Precedence: environment > defaults (the YAML layer of the reference
  * collapses into the defaults here; env keys match the reference's).
  */
final case class GraftConfig(
    streamUrl: String = "https://stream.wikimedia.org/v2/stream/recentchange",
    dbTableName: String = "wiki_events",
    userAgent: String = "WikiETL-Bot",
    dbMaxEvents: Long = 100000L,
    commitIntervalSeconds: Int = 2,
    cleanupHysteresis: Double = 1.1,
    reconnectBackoffSeconds: Int = 5,
    sinceOverride: Option[String] = None)

object GraftConfig {
  /** env > default, same keys the reference reads (ETL_USER_AGENT,
    * main.py:140; SINCE_OVERRIDE, pipeline.py:223). */
  def load(env: Map[String, String] = sys.env): GraftConfig = {
    val d = GraftConfig()
    GraftConfig(
      streamUrl = env.getOrElse("ETL_STREAM_URL", d.streamUrl),
      dbTableName = env.getOrElse("ETL_DB_TABLE_NAME", d.dbTableName),
      userAgent = env.getOrElse("ETL_USER_AGENT", d.userAgent),
      dbMaxEvents = env.get("ETL_DB_MAX_EVENTS").map(_.toLong)
        .getOrElse(d.dbMaxEvents),
      commitIntervalSeconds = env.get("ETL_COMMIT_INTERVAL_SECONDS")
        .map(_.toInt).getOrElse(d.commitIntervalSeconds),
      cleanupHysteresis = env.get("ETL_CLEANUP_HYSTERESIS")
        .map(_.toDouble).getOrElse(d.cleanupHysteresis),
      reconnectBackoffSeconds = env.get("ETL_RECONNECT_BACKOFF_SECONDS")
        .map(_.toInt).getOrElse(d.reconnectBackoffSeconds),
      sinceOverride = env.get("SINCE_OVERRIDE"))
  }
}
