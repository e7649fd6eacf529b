package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The custom Catalyst expressions must COMPILE under whole-stage codegen,
  * not silently fall back to interpreted eval (a Janino error degrades
  * performance without failing any correctness test — this spec makes it
  * a failure). Two checks per expression: the generated source contains
  * the static kernel call (so the expression is INSIDE the fused span,
  * not wrapped as an interpreted reference), and execution succeeds with
  * codegen fallback disabled.
  */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  test("all five custom expressions stay inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val merges = graft.functions.Bpe.encodeMerges(
      graft.functions.Bpe.learn(
        Seq("hello" -> 3L, "world" -> 2L, "words" -> 2L, "of" -> 1L),
        16
      )
    )
    // the text must DERIVE from a non-foldable column: literal children
    // would constant-fold the expressions away at optimization time
    // (interpreted eval) and leave nothing for codegen to prove
    val df = spark
      .range(1, 3)
      .select(
        concat(lit("hello world of words "), col("id").cast("string")).as("t"),
        concat(
          lit("""{"a":"""),
          col("id").cast("string"),
          lit(""","__crdb__":{"x":2},"b":"y"}""")
        ).as("j")
      )
    val out = df.select(
      GraftFunctions.minhash(col("t"), 5, 8).as("mh"),
      GraftFunctions.simhash64(col("t")).as("sh"),
      GraftFunctions.winnow(col("t"), 4, 3).as("wn"),
      GraftFunctions.bpeCount(col("t"), merges).as("bc"),
      GraftFunctions.jsonDropKeys(col("j"), "__crdb__").as("jd")
    )

    val cg = org.apache.spark.sql.execution.debug.codegenString(
      out.queryExecution.executedPlan
    )
    Seq(
      "MinHashSig.signature",
      "SimHash64.simhash",
      "Winnow.fingerprints",
      "Bpe.tokenCount",
      "JsonDropKeys.strip"
    ).foreach { kernel =>
      assert(cg.contains(kernel), s"$kernel not in generated code:\n${cg.take(2000)}")
    }

    // execution with fallback disabled: a Janino compile error now throws
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = out.collect().head
      assert(r.getSeq[Long](r.fieldIndex("mh")).size == 8)
      assert(r.getSeq[Long](r.fieldIndex("wn")).nonEmpty)
      assert(r.getAs[Int]("bc") > 0)
      assert(r.getAs[String]("jd").contains("\"b\""))
      assert(!r.getAs[String]("jd").contains("__crdb__"))
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
