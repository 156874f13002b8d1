package graft

/** The reference's validated config record with defaults
  * (`Input`, reference `task.ts:48-64`; SURVEY.md §1.1 config note):
  * `TokenId` (optional), `CacheRefresh` (default 300 000 ms),
  * `RetentionDuration` (default 3 600 000 ms — the inline comment in
  * the reference says "30 minutes" but the value and behavior are 60,
  * SURVEY.md §5.2.1), `DEBUG` (default false).
  *
  * The Spark analogue of `ETL.env(schema)`: typed fields, defaults as
  * constants, values from job parameters / environment.
  */
final case class GraftConfig(
    tokenId: Option[String] = None,
    cacheRefreshMs: Long = GraftConfig.DefaultCacheRefreshMs,
    retentionMs: Long = GraftConfig.DefaultRetentionMs,
    debug: Boolean = false) {
  require(cacheRefreshMs > 0, "CacheRefresh must be positive")
  require(retentionMs > 0, "RetentionDuration must be positive")
}

object GraftConfig {
  val DefaultCacheRefreshMs: Long = 300000L  // task.ts:53
  val DefaultRetentionMs: Long = 3600000L    // task.ts:57 (60 min)

  /** Parse from a string map (env vars / job args), applying the
    * reference's defaults; malformed numerics fail fast like the
    * reference's TypeBox validation would.
    */
  def fromMap(env: Map[String, String]): GraftConfig =
    GraftConfig(
      tokenId = env.get("TokenId").filter(_.nonEmpty),
      cacheRefreshMs = env.get("CacheRefresh").map(_.trim.toLong)
        .getOrElse(DefaultCacheRefreshMs),
      retentionMs = env.get("RetentionDuration").map(_.trim.toLong)
        .getOrElse(DefaultRetentionMs),
      debug = env.get("DEBUG").exists(_.trim.equalsIgnoreCase("true")))
}
