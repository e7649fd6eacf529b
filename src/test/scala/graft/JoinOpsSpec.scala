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

  // ---- skew valve: salted variants on a hot-key corpus -------------------

  /** One hot key carrying ~half of all rows (the distribution that
    * serializes a key-partitioned window into a single task), several
    * cold keys, deterministic pseudo-random times, right-side (key, time)
    * kept unique for a deterministic as-of pick.
    */
  private def skewed(n: Int): (Seq[(Long, String, Long)], Seq[(String, Long, Long)]) = {
    def mix(i: Long): Long = {
      var z = i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      math.abs(z ^ (z >>> 31))
    }
    val keyOf = (i: Int) => if (i % 2 == 0) "hot" else s"cold${i % 11}"
    val left = (0 until n).map { i =>
      (i.toLong, keyOf(i), mix(i) % 100000L)
    }
    val right = (0 until n).map { i =>
      (keyOf(i), mix(i * 7 + 3) % 100000L, mix(i) % 1000L)
    }
    (left, right)
  }

  test("asofJoinSalted equals the unsalted plan on a hot-key corpus and splits the hot key") {
    val (lRows, rRowsRaw) = skewed(4000)
    // ensure right (key,time) uniqueness for deterministic tie-free compare
    val rRows = rRowsRaw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val left = lRows.toDF("id", "key", "t")
    val right = rRows.toDF("key", "t", "v")
    val plain = JoinOps
      .asofJoin(left, right, Seq("key"), "t", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Long])].collect().toMap
    val bucketSecs = 10000L
    val salted = JoinOps
      .asofJoinSalted(left, right, Seq("key"), "t", Seq("v"), bucketSecs)
      .select("id", "asof_v").as[(Long, Option[Long])].collect().toMap
    assert(salted == plain)

    // the valve's point: the window's partition key must split the hot key.
    // Per-group row counts ARE the per-task work of the window stage (one
    // sorted group per (key, bucket) vs one per key).
    val hotTotal = lRows.count(_._2 == "hot") + rRows.count(_._1 == "hot")
    val maxGroup = left
      .select(col("key"), floor(col("t") / bucketSecs).as("tb"))
      .unionAll(right.select(col("key"), floor(col("t") / bucketSecs).as("tb")))
      .groupBy("key", "tb").count()
      .agg(max("count")).as[Long].collect().head
    assert(
      maxGroup * 4 <= hotTotal,
      s"hot key not split: biggest (key,bucket) group $maxGroup of $hotTotal hot rows"
    )
    // and the physical plan's window exchange clusters on (key, bucket)
    val planStr = JoinOps
      .asofJoinSalted(left, right, Seq("key"), "t", Seq("v"), bucketSecs)
      .queryExecution.executedPlan.toString
    assert(planStr.contains("__tb"), "salted window must partition by the time bucket")
  }

  test("rangeJoinAggSalted equals the unsalted plan on a hot-key corpus") {
    val (lRows, rRows) = skewed(3000)
    val left = lRows.toDF("id", "key", "t")
    val right = rRows.toDF("key", "t", "v")
    val lookback = 7000L
    val plain = JoinOps
      .rangeJoinAgg(left, right, Seq("key"), "t", "v", lookback)
      .select("id", "range_count", "range_sum")
      .as[(Long, Long, Long)].collect().toSet
    // bucket == lookback (tightest legal valve) and a wider one
    Seq(lookback, 3 * lookback).foreach { bucket =>
      val salted = JoinOps
        .rangeJoinAggSalted(left, right, Seq("key"), "t", "v", lookback, bucket)
        .select("id", "range_count", "range_sum")
        .as[(Long, Long, Long)].collect().toSet
      assert(salted == plain, s"bucketSecs=$bucket diverged")
    }
  }
}
