package graft

import org.scalatest.funsuite.AnyFunSuite

/** S3 config source semantics (reference `task.ts:48-64`). */
class ConfigSpec extends AnyFunSuite {

  test("defaults match the reference (incl. the 60-min retention quirk)") {
    val c = GraftConfig.fromMap(Map.empty)
    assert(c == GraftConfig(None, 300000L, 3600000L, debug = false))
  }

  test("explicit values override defaults; empty TokenId is absent") {
    val c = GraftConfig.fromMap(Map(
      "TokenId" -> "tok-1", "CacheRefresh" -> "60000",
      "RetentionDuration" -> "120000", "DEBUG" -> "true"))
    assert(c == GraftConfig(Some("tok-1"), 60000L, 120000L, debug = true))
    assert(GraftConfig.fromMap(Map("TokenId" -> "")).tokenId.isEmpty)
  }

  test("malformed numerics fail fast (TypeBox-style validation)") {
    intercept[NumberFormatException] {
      GraftConfig.fromMap(Map("CacheRefresh" -> "five minutes"))
    }
    intercept[IllegalArgumentException] {
      GraftConfig(retentionMs = 0)
    }
  }

  test("layered resolve: overrides > system props > secrets file > defaults") {
    val f = java.nio.file.Files.createTempFile("graft-secrets", ".properties")
    try {
      java.nio.file.Files.write(f,
        "TokenId=file-token\nCacheRefresh=11000\n".getBytes("UTF-8"))
      // file layer supplies both; no higher layer set
      val fromFile = GraftConfig.resolve(secretsFile = Some(f))
      assert(fromFile.tokenId.contains("file-token"))
      assert(fromFile.cacheRefreshMs == 11000L)
      // a system property outranks the file
      System.setProperty("graft.CacheRefresh", "22000")
      try {
        val sysWins = GraftConfig.resolve(secretsFile = Some(f))
        assert(sysWins.cacheRefreshMs == 22000L)
        assert(sysWins.tokenId.contains("file-token"))
        // an explicit override outranks everything
        val ovr = GraftConfig.resolve(
          overrides = Map("CacheRefresh" -> "33000"), secretsFile = Some(f))
        assert(ovr.cacheRefreshMs == 33000L)
      } finally System.clearProperty("graft.CacheRefresh")
      // absent layers fall through to the reference defaults
      assert(GraftConfig.resolve().retentionMs == 3600000L)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("toString never leaks the token (secrets hygiene)") {
    val c = GraftConfig(tokenId = Some("super-secret-token"))
    assert(!c.toString.contains("super-secret"))
    assert(c.toString.contains("tokenId=***"))
  }
}
