package graft

import graft.applyops.Routing
import graft.model.Mutation

/** Mirrors the reference's userscript e2e expectations
  * (reference: internal/script/testdata/main.ts:24-81): dispatch fan-out
  * with re-derived keys, static routing, and map-or-drop per table.
  */
class RoutingSpec extends SparkSpec {
  import spark.implicits._

  private val feed = Seq(
    ("""["k1"]""", Some("""{"pk":"k1","v":1}"""), 10L, 0, "f"),
    ("""["k2"]""", Some("""{"pk":"k2","v":2}"""), 11L, 0, "f"),
    ("""["gone"]""", None, 12L, 0, "f")
  ).toDF("key", "data", "nanos", "logical", "src_file")

  test("dispatch fans one mutation out to several tables (UDTF shape)") {
    val routed = Routing.dispatch(
      spark,
      feed,
      m =>
        if (m.isDelete) Seq("tombstone_log" -> m)
        else Seq("main" -> m, "audit" -> m.copy(data = m.data.map(_.toUpperCase)))
    )
    val byTable = routed
      .groupBy("table")
      .count()
      .as[(String, Long)]
      .collect()
      .toMap
    assert(byTable == Map("main" -> 2L, "audit" -> 2L, "tombstone_log" -> 1L))
    val audit = routed
      .filter($"table" === "audit")
      .select("data")
      .as[String]
      .collect()
    assert(audit.forall(_.contains("PK")))
  }

  test("routeTo sends everything to one table") {
    val routed = Routing.routeTo(spark, feed, "only")
    assert(routed.select("table").distinct().as[String].collect().toSeq == Seq("only"))
    assert(routed.count() == 3)
  }

  test("mapTable transforms or drops mutations (return None => drop)") {
    val mapped = Routing.mapTable(
      spark,
      feed,
      m =>
        if (m.key.contains("k2")) None // drop
        else Some(m.copy(nanos = m.nanos + 1000))
    )
    val rows = mapped
      .select("key", "nanos")
      .as[(String, Long)]
      .collect()
      .toSet
    assert(rows == Set(("""["k1"]""", 1010L), ("""["gone"]""", 1012L)))
  }
}
