package graft

import org.apache.spark.sql.functions._
import graft.ops.JoinOps

/** Temporal joins (as-of, range aggregate) against brute-force oracles. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private val leftRows = Seq(
    // (id, key, t)
    (1L, "a", 10L), (2L, "a", 25L), (3L, "a", 5L),
    (4L, "b", 100L), (5L, "b", 7L),
    (6L, "c", 50L) // key with no right rows at all
  )
  private val rightRows = Seq(
    // (key, t, v)
    ("a", 10L, 101L), ("a", 20L, 102L), ("a", 30L, 103L),
    ("b", 8L, 201L), ("b", 90L, 202L)
  )

  test("asofJoin matches the brute-force latest-at-or-before lookup") {
    val left = leftRows.toDF("id", "key", "t")
    val right = rightRows.toDF("key", "t", "v")
    val got = JoinOps
      .asofJoin(left, right, Seq("key"), "t", Seq("v"))
      .select("id", "asof_v")
      .as[(Long, Option[Long])]
      .collect()
      .toMap
    val expect = leftRows.map { case (id, k, t) =>
      id -> rightRows
        .filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2)
        .lastOption
        .map(_._3)
    }.toMap
    assert(got == expect, s"got $got vs $expect")
    // spot checks: inclusive tie (t=10 picks the t=10 view), no-match null
    assert(got(1L).contains(101L))
    assert(got(3L).isEmpty)
    assert(got(6L).isEmpty)
  }

  test("rangeJoinAgg matches the brute-force windowed count/sum") {
    val left = leftRows.toDF("id", "key", "t")
      .withColumn("t", col("t").cast("timestamp"))
    val right = rightRows.toDF("key", "t", "v")
      .withColumn("t", col("t").cast("timestamp"))
    val lookback = 15L
    val got = JoinOps
      .rangeJoinAgg(left, right, Seq("key"), "t", "v", lookback)
      .select("id", "range_count", "range_sum")
      .as[(Long, Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val expect = leftRows.map { case (id, k, t) =>
      val in = rightRows.filter(r => r._1 == k && r._2 >= t - lookback && r._2 <= t)
      id -> ((in.size.toLong, in.map(_._3).sum))
    }.toMap
    assert(got == expect, s"got $got vs $expect")
    assert(got(2L) == ((2L, 203L))) // t=25, [10,25]: right rows at 10 and 20
    assert(got(6L) == ((0L, 0L))) // keyless-on-the-right row: zeros, not nulls
  }
}
