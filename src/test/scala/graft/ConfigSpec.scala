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
}
