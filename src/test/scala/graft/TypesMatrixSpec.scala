package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.applyops.{ApplyPlanner, TableSpec}
import graft.model.Hlc
import graft.table.SnapshotTable

/** All-data-types apply matrix (FIXTURES.md F5), mirroring the reference's
  * per-type round-trip oracle (reference: internal/target/apply/
  * apply_test.go:206-410): each type column applied through the planner +
  * snapshot merge, with a NULL twin, then checked typed-exactly.
  */
class TypesMatrixSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(
    Seq(
      StructField("pk", IntegerType),
      StructField("c_str_array", ArrayType(StringType)),
      StructField("c_int_array", ArrayType(LongType)),
      StructField("c_bool_array", ArrayType(BooleanType)),
      StructField("c_bool", BooleanType),
      StructField("c_date", DateType),
      StructField("c_decimal", DecimalType(10, 2)),
      StructField("c_float", DoubleType),
      StructField("c_int", LongType),
      StructField("c_json", StringType), // nested JSON preserved as text
      StructField("c_str", StringType),
      StructField("c_ts", TimestampType),
      StructField("c_uuid", StringType)
    )
  )

  // the reference's escape-stress string: a1\b/2?c"3
  private val stress = "a1\\b/2?c\"3"

  private def payloadFull: String = {
    val m = new ObjectMapper()
    val o = m.createObjectNode()
    o.put("pk", 1)
    o.putArray("c_str_array").add("x").add("y")
    o.putArray("c_int_array").add(1L).add(2L).add(3L)
    o.putArray("c_bool_array").add(true).add(false)
    o.put("c_bool", true)
    o.put("c_date", "2024-02-29")
    o.putRawValue(
      "c_decimal",
      new com.fasterxml.jackson.databind.util.RawValue("4E+2")
    )
    o.put("c_float", 1.5d)
    o.put("c_int", 9007199254740993L) // > 2^53: float routing would corrupt
    val nested = m.createObjectNode()
    nested.putObject("a").putArray("b").add(1).add(2)
    o.set[com.fasterxml.jackson.databind.node.ObjectNode]("c_json", nested)
    o.put("c_str", stress)
    o.put("c_ts", "2024-01-01T12:34:56.789Z")
    o.put("c_uuid", "76ceb652-b475-4c64-b45c-391c79983b0e")
    m.writeValueAsString(o)
  }

  test("every representable type survives apply + merge round-trip, with NULL twin") {
    val window = Seq(
      ("[1]", payloadFull, 10L, 0, "f"),
      ("[2]", """{"pk":2}""", 11L, 0, "f")
    ).toDF("key", "data", "nanos", "logical", "src_file")

    val spec = TableSpec(schema, Seq("pk"), allowEvolution = false)
    val planned = ApplyPlanner.plan(spark, spec, window, 4)
    val t = new SnapshotTable(spark, tmpDir("types"), numBuckets = 2)
    t.merge(planned.batch, Seq("pk"), "k1", Hlc(11, 0))
    val out = t.read().orderBy("pk")
    val rows = out.collect()
    assert(rows.length == 2)

    val r1 = rows(0)
    assert(r1.getSeq[String](r1.fieldIndex("c_str_array")).toList == List("x", "y"))
    assert(r1.getSeq[Long](r1.fieldIndex("c_int_array")).toList == List(1L, 2L, 3L))
    assert(r1.getSeq[Boolean](r1.fieldIndex("c_bool_array")).toList == List(true, false))
    assert(r1.getAs[Boolean]("c_bool"))
    assert(r1.getAs[java.sql.Date]("c_date").toString == "2024-02-29")
    // decimal exponent normalization: 4E+2 -> 400.00 (exponent_fix analog)
    assert(
      r1.getAs[java.math.BigDecimal]("c_decimal")
        .compareTo(new java.math.BigDecimal("400.00")) == 0
    )
    assert(r1.getAs[Double]("c_float") == 1.5d)
    assert(r1.getAs[Long]("c_int") == 9007199254740993L)
    // nested JSON kept as its raw text
    val cj = r1.getAs[String]("c_json")
    assert(cj.contains(""""a"""") && cj.contains("[1,2]"))
    assert(r1.getAs[String]("c_str") == stress)
    assert(
      r1.getAs[java.sql.Timestamp]("c_ts").toInstant.toString
        == "2024-01-01T12:34:56.789Z"
    )
    assert(r1.getAs[String]("c_uuid") == "76ceb652-b475-4c64-b45c-391c79983b0e")

    // NULL twin: every non-PK column null, none dropped, none defaulted
    val r2 = rows(1)
    assert(r2.getAs[Int]("pk") == 2)
    schema.fieldNames.filterNot(_ == "pk").foreach { f =>
      assert(r2.isNullAt(r2.fieldIndex(f)), s"expected null $f")
    }
  }

  test("BYTES/TIME/INTERVAL/INET/VARBIT/collated columns round-trip (apply_test.go:206-337)") {
    // the reference's remaining matrix rows: BYTES natively binary (base64
    // on the JSON wire, Spark BinaryType), TIME/INTERVAL as lexical strings
    // (Spark has no such column types), INET/VARBIT as pattern-validated
    // strings, collated strings as plain strings (collation is a target-DB
    // ordering concern, not a storage one)
    val schema2 = StructType(
      Seq(
        StructField("pk", IntegerType),
        StructField("c_bytes", BinaryType),
        StructField("c_time", StringType),
        StructField("c_interval", StringType),
        StructField("c_inet", StringType),
        StructField("c_varbit", StringType),
        StructField("c_collate", StringType)
      )
    )
    val cfg = graft.model.TableConfig(
      patterns = Map(
        "c_inet" -> "^\\d{1,3}(\\.\\d{1,3}){3}(/\\d{1,2})?$",
        "c_varbit" -> "^[01]+$"
      )
    )
    val b64 = java.util.Base64.getEncoder.encodeToString("a1b2c3".getBytes("UTF-8"))
    val window = Seq(
      (
        "[1]",
        s"""{"pk":1,"c_bytes":"$b64","c_time":"01:23:45.123456","c_interval":"2h30m30s","c_inet":"192.168.0.1","c_varbit":"10010101","c_collate":"a1b2c3"}""",
        10L, 0, "f"
      ),
      ("[2]", """{"pk":2}""", 11L, 0, "f") // NULL twin
    ).toDF("key", "data", "nanos", "logical", "src_file")
    val spec = TableSpec(schema2, Seq("pk"), cfg, allowEvolution = false)
    val planned = ApplyPlanner.plan(spark, spec, window, 4)
    val t = new SnapshotTable(spark, tmpDir("types2"), numBuckets = 2)
    t.merge(planned.batch, Seq("pk"), "k1", Hlc(11, 0))
    val rows = t.read().orderBy("pk").collect()
    val r1 = rows(0)
    assert(new String(r1.getAs[Array[Byte]]("c_bytes"), "UTF-8") == "a1b2c3")
    assert(r1.getAs[String]("c_time") == "01:23:45.123456")
    assert(r1.getAs[String]("c_interval") == "2h30m30s")
    assert(r1.getAs[String]("c_inet") == "192.168.0.1")
    assert(r1.getAs[String]("c_varbit") == "10010101")
    assert(r1.getAs[String]("c_collate") == "a1b2c3")
    val r2 = rows(1)
    schema2.fieldNames.filterNot(_ == "pk").foreach { f =>
      assert(r2.isNullAt(r2.fieldIndex(f)), s"expected null $f")
    }

    // invalid INET / VARBIT fail the batch like a DB cast error: the
    // assert_true guard rides the consuming action, so the job itself
    // aborts (message surfaces through Spark's task-failure cause chain)
    val badInet = Seq(("[3]", """{"pk":3,"c_inet":"not-an-ip"}""", 12L, 0, "f"))
      .toDF("key", "data", "nanos", "logical", "src_file")
    val e1 = intercept[Exception] {
      ApplyPlanner.plan(spark, spec, badInet, 4).batch.count()
    }
    assert(
      causeChain(e1).exists(_.contains("c_inet=not-an-ip")),
      s"unexpected failure: $e1"
    )
    val badBit = Seq(("[4]", """{"pk":4,"c_varbit":"10201"}""", 13L, 0, "f"))
      .toDF("key", "data", "nanos", "logical", "src_file")
    val e2 = intercept[Exception] {
      ApplyPlanner.plan(spark, spec, badBit, 4).batch.count()
    }
    assert(causeChain(e2).exists(_.contains("c_varbit=10201")), s"got $e2")
  }

  private def causeChain(t: Throwable): List[String] =
    if (t == null) Nil
    else Option(t.getMessage).toList ::: causeChain(t.getCause)

  test("enum allowed-values validation (TestUTDEnum analog): valid lands, invalid fails batch") {
    val schema2 = StructType(
      Seq(StructField("pk", IntegerType), StructField("val", StringType))
    )
    val cfg = graft.model.TableConfig(allowedValues = Map("val" -> Seq("foo", "bar")))
    val spec = TableSpec(schema2, Seq("pk"), cfg, allowEvolution = false)

    val ok = Seq(
      ("[42]", """{"pk":42,"val":"bar"}""", 1L, 0, "f"),
      ("[43]", """{"pk":43}""", 2L, 0, "f"), // null enum value is allowed
      ("[44]", null.asInstanceOf[String], 3L, 0, "f") // delete exempt
    ).toDF("key", "data", "nanos", "logical", "src_file")
    val planned = ApplyPlanner.plan(spark, spec, ok, 4)
    // validation is an in-plan guard, not a separate probe: consuming the
    // batch costs exactly as many Spark jobs as an unvalidated plan
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart
      ): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(planned.batch.count() == 3)
      val plain = ApplyPlanner
        .plan(spark, TableSpec(schema2, Seq("pk"), allowEvolution = false), ok, 4)
      val validated = ApplyPlanner.plan(spark, spec, ok, 4)
      val before = jobs.get()
      assert(plain.batch.count() == 3)
      // deterministic drain — no fixed sleeps (they flake on loaded hosts)
      org.apache.spark.GraftListenerBusAccess.waitUntilEmpty(spark.sparkContext)
      val plainJobs = jobs.get() - before
      jobs.set(0)
      assert(validated.batch.count() == 3)
      org.apache.spark.GraftListenerBusAccess.waitUntilEmpty(spark.sparkContext)
      assert(
        jobs.get() == plainJobs,
        s"validated count ran ${jobs.get()} jobs vs $plainJobs unvalidated"
      )
    } finally spark.sparkContext.removeSparkListener(listener)

    val bad = Seq(("[45]", """{"pk":45,"val":"Repeated"}""", 4L, 0, "f"))
      .toDF("key", "data", "nanos", "logical", "src_file")
    val e = intercept[Exception] {
      ApplyPlanner.plan(spark, spec, bad, 4).batch.count()
    }
    assert(causeChain(e).exists(_.contains("val=Repeated")), s"got $e")
  }

  test("EVOLVED columns infer decimal-safe types: 4E+2 and 2^53+1 survive exactly") {
    // the spec declares only the PK; price/big arrive as drift and must
    // evolve with exact types — decimal, never a lossy double (the engine's
    // "never infer doubles" rule applies to inference too)
    val spec = TableSpec(
      StructType(Seq(StructField("pk", IntegerType))),
      Seq("pk")
    )
    val window = Seq(
      ("[1]", """{"pk":1,"price":4E+2,"big":9007199254740993}""", 10L, 0, "f"),
      ("[2]", """{"pk":2,"price":0.01,"big":1}""", 11L, 0, "f")
    ).toDF("key", "data", "nanos", "logical", "src_file")
    val planned = ApplyPlanner.plan(spark, spec, window, 4)
    assert(
      planned.evolvedSchema("price").dataType.isInstanceOf[DecimalType],
      s"price must evolve as decimal, got ${planned.evolvedSchema("price").dataType}"
    )
    assert(planned.evolvedSchema("big").dataType == LongType)
    val rows = planned.batch
      .select(col("pk"), col("price").cast(StringType), col("big"))
      .as[(Int, String, Long)]
      .collect()
      .map(r => r._1 -> ((BigDecimal(r._2), r._3)))
      .toMap
    assert(rows(1)._1 == BigDecimal(400) && rows(1)._2 == 9007199254740993L)
    assert(rows(2)._1 == BigDecimal("0.01") && rows(2)._2 == 1L)
  }

  test("type conflicts BEYOND the inference sample cap still widen (full-window guard)") {
    // the bounded sample sees only ints for both drifting columns; the
    // widening representations (a string, an exponent decimal) hide past
    // the cap at the highest timestamps. Without the conflict guard they
    // would null out at parse time; with it the schema widens exactly as
    // unbounded inference would.
    val spec = TableSpec(
      StructType(Seq(StructField("pk", IntegerType))),
      Seq("pk")
    )
    val n = ApplyPlanner.InferenceSampleRows + 200
    val ints = spark
      .range(n)
      .selectExpr(
        "concat('[', id, ']') as key",
        """concat('{"pk":', id, ',"extra":', id % 7, ',"exp":1}') as data""",
        "id + 10 as nanos",
        "cast(0 as int) as logical",
        "'f' as src_file"
      )
    val tail = Seq(
      (
        s"[${n + 1}]",
        s"""{"pk":${n + 1},"extra":"surprise","exp":4E+2}""",
        (n + 100).toLong,
        0,
        "f"
      )
    ).toDF("key", "data", "nanos", "logical", "src_file")
    val planned = ApplyPlanner.plan(spark, spec, ints.unionByName(tail), 4)
    assert(
      planned.evolvedSchema("extra").dataType == StringType,
      s"extra must widen to string, got ${planned.evolvedSchema("extra").dataType}"
    )
    assert(
      planned.evolvedSchema("exp").dataType.isInstanceOf[DecimalType],
      s"exp must widen to decimal, got ${planned.evolvedSchema("exp").dataType}"
    )
    val row = planned.batch.filter(col("pk") === n + 1).collect()(0)
    assert(row.getAs[String]("extra") == "surprise")
    assert(row.getAs[java.math.BigDecimal]("exp").longValue == 400L)
    // the pre-cap rows parse under the widened types too
    val first = planned.batch.filter(col("pk") === 3).collect()(0)
    assert(first.getAs[String]("extra") == "3")
    assert(first.getAs[java.math.BigDecimal]("exp").longValue == 1L)
  }

  test("evolved NESTED exponent decimals are sanitized: table stays readable after commit") {
    // 4E+2 inside a struct/array infers decimal(1,-2) during evolution;
    // an unsanitized negative scale in the committed schema DDL would make
    // every later StructType.fromDDL (readRaw/payloadSchema) throw
    val spec = TableSpec(
      StructType(Seq(StructField("pk", IntegerType))),
      Seq("pk")
    )
    val window = Seq(
      ("[1]", """{"pk":1,"meta":{"x":4E+2},"vals":[4E+2]}""", 10L, 0, "f")
    ).toDF("key", "data", "nanos", "logical", "src_file")
    val planned = ApplyPlanner.plan(spark, spec, window, 4)
    val t = new SnapshotTable(spark, tmpDir("nestneg"), numBuckets = 2)
    t.merge(planned.batch, Seq("pk"), "k1", Hlc(10, 0))
    // round-trips through DDL: would throw NEGATIVE_SCALE_DISALLOWED if a
    // decimal(p,-s) survived anywhere in the schema tree
    val out = t.read()
    assert(out.count() == 1)
    assert(out.select(col("meta.x").cast(StringType)).as[String].collect()(0) == "400")
  }

  test("decimal exponent forms normalize exactly (4e+2 -> 400, 4e-2 -> 0.04)") {
    val schema2 = StructType(
      Seq(StructField("pk", IntegerType), StructField("d", DecimalType(10, 4)))
    )
    val window = Seq(
      ("[1]", """{"pk":1,"d":4e+2}""", 1L, 0, "f"),
      ("[2]", """{"pk":2,"d":4e-2}""", 2L, 0, "f"),
      ("[3]", """{"pk":3,"d":4.00E+2}""", 3L, 0, "f")
    ).toDF("key", "data", "nanos", "logical", "src_file")
    val planned = ApplyPlanner
      .plan(spark, TableSpec(schema2, Seq("pk"), allowEvolution = false), window, 2)
    val got = planned.batch
      .select($"pk".cast("int"), $"d".cast("string"))
      .as[(Int, String)]
      .collect()
      .toMap
    assert(got(1) == "400.0000")
    assert(got(2) == "0.0400")
    assert(got(3) == "400.0000")
  }
}
