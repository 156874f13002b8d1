package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftConfig

/** The S3 config source's layering and secret indirection
  * (reference: env/layer settings `task.ts:101,167`, secrets-manager
  * values `package-lock.json:1538`): precedence, typed reads, loud
  * failures, and the two built-in resolvers. Pure driver-side — no
  * SparkSession needed.
  */
class ConfigSpec extends AnyFunSuite {

  private def tmpJson(content: String): String = {
    val p = java.nio.file.Files.createTempFile("graft-cfg", ".json")
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("precedence: defaults < json file < env") {
    val json = tmpJson(
      """{"poll": {"minutes": 10, "url": "https://file.example"},
         |"retention": {"minutes": 30}}""".stripMargin)
    val cfg = GraftConfig.load(
      defaults = Map("poll.minutes" -> "5", "stale.gate" -> "true"),
      jsonPath = Some(json),
      env = Map("GRAFT_POLL_MINUTES" -> "20", "HOME" -> "/nope"))
    assert(cfg.getLong("poll.minutes") == 20L) // env wins
    assert(cfg("poll.url") == "https://file.example") // file over default
    assert(cfg.getLong("retention.minutes") == 30L) // file only
    assert(cfg.getBoolean("stale.gate")) // default survives
    assert(cfg.get("home").isEmpty, "unprefixed env must not leak in")
  }

  test("secret:// resolves through the pluggable resolver at read time") {
    val cfg = GraftConfig.load(
      defaults = Map("api.token" -> "secret://layer-token"),
      env = Map("GRAFT_SECRET_LAYER_TOKEN" -> "s3cr3t"))
    assert(cfg("api.token") == "s3cr3t")
    // the raw map never holds the secret value — only the name
    assert(cfg.values("api.token") == "secret://layer-token")
  }

  test("file-mount resolver reads one file per secret") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-secrets").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "db-pass"),
      "hunter2\n".getBytes("UTF-8"))
    val cfg = GraftConfig.Config(
      Map("db.pass" -> "secret://db-pass"),
      GraftConfig.fileSecrets(dir))
    assert(cfg("db.pass") == "hunter2") // trimmed
  }

  test("failures are loud and name the key") {
    val cfg = GraftConfig.load(
      defaults = Map("api.token" -> "secret://missing-one",
        "poll.minutes" -> "soon"),
      env = Map.empty)
    val noKey = intercept[IllegalArgumentException](cfg("nope"))
    assert(noKey.getMessage.contains("'nope'"))
    val noSecret = intercept[IllegalArgumentException](cfg("api.token"))
    assert(noSecret.getMessage.contains("missing-one"),
      s"got: ${noSecret.getMessage}")
    val badLong =
      intercept[IllegalArgumentException](cfg.getLong("poll.minutes"))
    assert(badLong.getMessage.contains("poll.minutes"))
  }

  test("config drives pipeline parameters end-to-end") {
    // the reference reads its staleness/retention knobs from layer
    // config; the engine's analogue parameterizes plan construction
    val cfg = GraftConfig.load(
      defaults = Map("retention.minutes" -> "30"),
      env = Map("GRAFT_RETENTION_MINUTES" -> "60"))
    val retentionMs = cfg.getLong("retention.minutes") * 60000L
    assert(retentionMs == 3600000L)
  }
}
