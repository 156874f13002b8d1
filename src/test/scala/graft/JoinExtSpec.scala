package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics + HLL error gate. */
class JoinExtSpec extends SparkSpec {
  import spark.implicits._

  private def mkTs(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf attaches the newest right row at or before each left ts") {
    val left = Seq(
      (1L, mkTs("2024-01-01 10:00:00"), "L1"),
      (1L, mkTs("2024-01-01 12:00:00"), "L2"),
      (2L, mkTs("2024-01-01 09:00:00"), "L3") // before any right row
    ).toDF("k", "ts", "ltag")
    val right = Seq(
      (1L, mkTs("2024-01-01 09:30:00"), 100L),
      (1L, mkTs("2024-01-01 11:00:00"), 200L),
      (1L, mkTs("2024-01-01 12:00:00"), 300L), // exactly at L2 → visible
      (2L, mkTs("2024-01-01 10:00:00"), 400L)
    ).toDF("k", "ts", "rid")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("rid"))
      .select($"ltag", $"rid").as[(String, Option[Long])]
      .collect().toMap
    assert(got == Map("L1" -> Some(100L), "L2" -> Some(300L),
      "L3" -> None))
  }

  test("asOf preserves genuinely-null payload fields via struct wrap") {
    val left = Seq((1L, mkTs("2024-01-01 10:00:00"))).toDF("k", "ts")
    val right = Seq((1L, mkTs("2024-01-01 09:00:00"),
      Option.empty[String], 7L)).toDF("k", "ts", "note", "rid")
    val row = AsOfJoin.asOf(left, right, "k", "ts", Seq("note", "rid"))
      .select($"note", $"rid").as[(Option[String], Option[Long])].head()
    assert(row == ((None, Some(7L)))) // matched, with its null field
  }

  test("approx_count_distinct stays within 5% of exact") {
    val ord = Tables(spark, sf("0.01"), "orders")
    val cmp = ord.groupBy($"o_orderstatus")
      .agg(approx_count_distinct($"o_custkey", 0.02).as("a"),
        countDistinct($"o_custkey").as("e"))
      .as[(String, Long, Long)].collect()
    cmp.foreach { case (st, a, e) =>
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"status $st: approx $a vs exact $e")
    }
  }
}
