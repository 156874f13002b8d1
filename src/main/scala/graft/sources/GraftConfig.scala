package graft.sources

/** Layered pipeline configuration with secret indirection — the S3
  * config source completed to the reference's full shape: the
  * reference reads its layer settings from the task environment
  * (`task.ts:101,167`) and pulls secret values out-of-band via a
  * secrets manager (`@aws-sdk/client-secrets-manager`,
  * `package-lock.json:1538`). The engine's translation keeps the
  * layering and the secret INDIRECTION — config values never embed
  * the secret, they name it — while staying offline-first:
  *
  *  - precedence: code defaults < JSON file < environment (later
  *    wins), each layer a plain string map;
  *  - a value of the form `secret://<name>` is resolved at READ time
  *    through a pluggable [[GraftConfig.Resolver]]; the built-ins
  *    resolve from prefixed environment variables or from a local
  *    secrets directory (one file per secret, the k8s/docker mount
  *    convention). A cloud secrets-manager resolver is a deployment
  *    concern: plug one in as a `String => Option[String]`;
  *  - unresolved secrets and missing keys fail LOUDLY at first read,
  *    naming the key — never a silent empty string into a URL the
  *    way stringly-typed env plumbing fails.
  *
  * Config stays driver-side (it parameterizes plan construction —
  * cutoffs, URLs, retention windows); nothing here ships to
  * executors, so there is no serialization of secret material into
  * task binaries or logs beyond what the plan itself embeds.
  */
object GraftConfig {

  /** Resolves a secret NAME to its value; `None` = unknown. */
  type Resolver = String => Option[String]

  private val SecretScheme = "secret://"

  final case class Config(values: Map[String, String],
      secrets: Resolver) {

    def get(key: String): Option[String] =
      values.get(key).map(resolve(key, _))

    def apply(key: String): String = get(key).getOrElse(
      throw new IllegalArgumentException(
        s"config: missing required key '$key' " +
          s"(have: ${values.keys.toSeq.sorted.mkString(", ")})"))

    def getLong(key: String): Long =
      try apply(key).trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"config: '$key' is not a long: '${apply(key)}'") }

    def getBoolean(key: String): Boolean =
      apply(key).trim.toLowerCase match {
        case "true" | "1" | "yes" => true
        case "false" | "0" | "no" => false
        case other => throw new IllegalArgumentException(
          s"config: '$key' is not a boolean: '$other'")
      }

    private def resolve(key: String, v: String): String =
      if (!v.startsWith(SecretScheme)) v
      else {
        val name = v.stripPrefix(SecretScheme)
        secrets(name).getOrElse(throw new IllegalArgumentException(
          s"config: key '$key' names secret '$name' but the resolver " +
            "cannot supply it — check the secret store / environment"))
      }
  }

  /** Built-in resolver: secret `name` ←
    * `GRAFT_SECRET_<NAME-uppercased, non-alnum → _>`.
    */
  def envSecrets(env: Map[String, String] = sys.env): Resolver =
    name => env.get("GRAFT_SECRET_" +
      name.toUpperCase.replaceAll("[^A-Z0-9]", "_"))

  /** Built-in resolver: one file per secret under `dir` (the
    * k8s/docker secret-mount convention); missing file = unknown.
    */
  def fileSecrets(dir: String): Resolver = name => {
    val p = java.nio.file.Paths.get(dir, name)
    if (java.nio.file.Files.isRegularFile(p))
      Some(new String(java.nio.file.Files.readAllBytes(p),
        "UTF-8").trim)
    else None
  }

  /** Load with the documented precedence. `envPrefix`-ed variables
    * map to lower-cased dotted keys: `GRAFT_POLL_MINUTES` →
    * `poll.minutes`. The default resolver reads secrets from the
    * SAME `env` map passed here (not ambient `sys.env`), so tests
    * and embedders control both layers together.
    */
  def load(defaults: Map[String, String] = Map.empty,
      jsonPath: Option[String] = None,
      env: Map[String, String] = sys.env,
      envPrefix: String = "GRAFT_",
      secrets: Option[Resolver] = None): Config = {
    val fromFile = jsonPath.fold(Map.empty[String, String])(parseJson)
    val fromEnv = env.collect {
      case (k, v) if k.startsWith(envPrefix) &&
          !k.startsWith("GRAFT_SECRET_") =>
        k.stripPrefix(envPrefix).toLowerCase.replace('_', '.') -> v
    }
    Config(defaults ++ fromFile ++ fromEnv,
      secrets.getOrElse(envSecrets(env)))
  }

  /** Flat string-valued JSON object → map (json4s ships with Spark;
    * scalars are stringified, nested objects flatten with dots).
    */
  private[sources] def parseJson(path: String): Map[String, String] = {
    import org.json4s._
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    def flatten(prefix: String, v: JValue): Seq[(String, String)] =
      v match {
        case JObject(fields) => fields.flatMap { case (k, fv) =>
          flatten(if (prefix.isEmpty) k else s"$prefix.$k", fv)
        }
        case JString(s) => Seq(prefix -> s)
        case JInt(i) => Seq(prefix -> i.toString)
        case JLong(l) => Seq(prefix -> l.toString)
        case JDouble(d) => Seq(prefix -> d.toString)
        case JDecimal(d) => Seq(prefix -> d.toString)
        case JBool(b) => Seq(prefix -> b.toString)
        case JNull | JNothing => Seq.empty
        case other => throw new IllegalArgumentException(
          s"config: unsupported JSON value at '$prefix': $other")
      }
    flatten("", org.json4s.jackson.JsonMethods.parse(txt)).toMap
  }
}
