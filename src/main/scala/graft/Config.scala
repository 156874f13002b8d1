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

  /** Secrets hygiene: the token never reaches logs/plans via
    * toString (the reference's secret values live in a secrets
    * manager for the same reason).
    */
  override def toString: String =
    s"GraftConfig(${tokenId.map(_ => "tokenId=***").getOrElse("tokenId=None")}, " +
      s"cacheRefreshMs=$cacheRefreshMs, retentionMs=$retentionMs, debug=$debug)"
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

  private val Keys =
    Seq("TokenId", "CacheRefresh", "RetentionDuration", "DEBUG")

  /** Layered resolution, mirroring the reference's config chain
    * (env() + a secrets-capable backend) without a network
    * dependency: explicit overrides > JVM system properties
    * (`graft.<Key>`) > process environment > a mounted
    * secrets/properties file > reference defaults. The file layer is
    * the standard container stand-in for a secrets manager (secret
    * material arrives as a mounted file, never in code or env
    * listings); malformed numerics still fail fast at the end of the
    * chain.
    */
  def resolve(overrides: Map[String, String] = Map.empty,
      secretsFile: Option[java.nio.file.Path] = None): GraftConfig = {
    val fileLayer: Map[String, String] = secretsFile
      .filter(java.nio.file.Files.isReadable(_))
      .map { p =>
        val props = new java.util.Properties()
        val in = java.nio.file.Files.newInputStream(p)
        try props.load(in) finally in.close()
        import scala.jdk.CollectionConverters._
        props.stringPropertyNames().asScala
          .map(k => k -> props.getProperty(k)).toMap
      }.getOrElse(Map.empty)
    val resolved = Keys.flatMap { k =>
      overrides.get(k)
        .orElse(sys.props.get(s"graft.$k"))
        .orElse(sys.env.get(k))
        .orElse(fileLayer.get(k))
        .map(k -> _)
    }.toMap
    fromMap(resolved)
  }
}
