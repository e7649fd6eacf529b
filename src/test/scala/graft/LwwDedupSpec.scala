package graft

import org.apache.spark.sql.functions._
import graft.dedup.LastWriterWins

/** Invariants mirror the reference's msort.UniqueByKey test matrix
  * (reference: internal/util/msort/msort_test.go:40-123): one survivor per
  * key, the survivor carries the max timestamp, ties keep *a* row.
  */
class LwwDedupSpec extends SparkSpec {
  import spark.implicits._

  private def mkRows(seed: Long, n: Int, keys: Int) = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      (s"k${r.nextInt(keys)}", r.nextLong(1000L), r.nextInt(4), s"v$i")
    }
  }

  test("plain window dedup keeps exactly the max-ts row per key") {
    val rows = mkRows(1, 2000, 37)
    val df = rows.toDF("key", "nanos", "logical", "payload")
    val got = LastWriterWins
      .dedup(df, Seq("key"), Seq("nanos", "logical"))
      .select("key", "nanos", "logical")
      .as[(String, Long, Int)]
      .collect()
      .toSet
    val expected = rows
      .groupBy(_._1)
      .map { case (k, g) =>
        val m = g.map(r => (r._2, r._3)).max
        (k, m._1, m._2)
      }
      .toSet
    assert(got == expected)
    assert(got.size == rows.map(_._1).distinct.size)
  }

  test("salted two-phase dedup agrees with the plain window") {
    // heavy skew: 80% of rows hit one key
    val r = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      val k = if (r.nextDouble() < 0.8) "hot" else s"k${r.nextInt(20)}"
      (k, r.nextLong(100000L), r.nextInt(4), s"v$i")
    }
    val df = rows.toDF("key", "nanos", "logical", "payload")
    val plain = LastWriterWins
      .dedup(df, Seq("key"), Seq("nanos", "logical"))
      .select("key", "nanos", "logical")
      .as[(String, Long, Int)]
      .collect()
      .toSet
    val salted = LastWriterWins
      .dedupSalted(df, Seq("key"), Seq("nanos", "logical"), saltBuckets = 16)
      .select("key", "nanos", "logical")
      .as[(String, Long, Int)]
      .collect()
      .toSet
    assert(salted == plain)
  }

  test("exact-ts duplicate rows keep one survivor") {
    val df = Seq(
      ("a", 10L, 0, "x"),
      ("a", 10L, 0, "x"),
      ("a", 9L, 3, "y")
    ).toDF("key", "nanos", "logical", "payload")
    val got =
      LastWriterWins.dedupSalted(df, Seq("key"), Seq("nanos", "logical"), 8)
    assert(got.count() == 1)
    assert(got.select("nanos").as[Long].head() == 10L)
  }

  test("the salted plan is a partial-aggregating reduce, not a window") {
    val df = mkRows(3, 100, 5).toDF("key", "nanos", "logical", "payload")
    val plan = LastWriterWins
      .dedupSalted(df, Seq("key"), Seq("nanos", "logical"), 8)
      .queryExecution
      .executedPlan
      .toString
    // a window would funnel every row of a hot key through one sort
    // partition; the salted path must aggregate (with map-side partials)
    assert(!plan.contains("Window"), "salted path must not use a sort window")
    assert(plan.contains("Aggregate"), plan)
    assert(plan.contains("partial_max_by") || plan.contains("partial"), plan)
  }
}
