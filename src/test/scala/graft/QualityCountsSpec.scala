package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.TextOps

/** The fused [[graft.functions.QualityCounts]] kernel must be
  * value-identical to the composed-builtin formulations it replaced — every
  * field, over the real test corpora AND adversarial edge strings.
  */
class QualityCountsSpec extends SparkSpec {
  GraftFunctions.register(spark)
  import spark.implicits._

  private def composed(text: org.apache.spark.sql.Column) = struct(
    size(filter(split(text, "\\s+"), t => length(t) > 0)).as("n_toks"),
    size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0))).as("punct"),
    size(regexp_extract_all(text, lit("[0-9]"), lit(0))).as("digits"),
    size(regexp_extract_all(text, lit("[A-Z]"), lit(0))).as("uppers"),
    size(
      array_intersect(
        filter(split(lower(text), "\\s+"), t => length(t) > 0),
        lit(TextOps.enStop.toArray)
      )
    ).as("stop"),
    size(
      regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    ).as("bpeish")
  )

  private def assertKernelMatches(df: org.apache.spark.sql.DataFrame, col0: String): Unit = {
    val bad = df
      .select(
        GraftFunctions.qualityCounts(col(col0)).as("k"),
        composed(col(col0)).as("c"),
        col(col0).as("t")
      )
      .filter($"k" =!= $"c")
    val rows = bad.select("t", "k", "c").collect()
    assert(
      rows.isEmpty,
      s"kernel/composed mismatch on ${rows.length} rows, first: ${rows.headOption}"
    )
  }

  test("kernel == composed builtins over both small corpora") {
    for (sf <- Seq("0.001", "0.01")) {
      val docs = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      assertKernelMatches(docs, "text")
    }
  }

  test("kernel == composed builtins on edge strings") {
    val edge = Seq(
      "",
      " ",
      "\t\n\f\r",
      "the",
      "THE The tHe thE",
      "a",
      "ab12cd!@# the of AND",
      "für der die das und ist",
      "中文测试 the 中文 of",
      "x" * 5000,
      "the " * 100,
      "1a2b3c ... ### --- a1",
      "what were they with this have from",
      "theX Xthe the. .the \"the\" (the)",
      "thee thew ther theyy",
      "K Kelvin K test", // U+212A KELVIN SIGN lowers to 'k'
      "😀 emoji 😀😀 the", // surrogate pairs
      "aİb İ straße", // dotted I, sharp s
      "tab\tsep\nlines\rcr  double  space",
      "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~",
      "mixed123runs456end",
      "12 34 56 ab cd ef !? .,"
    ).toDF("t")
    assertKernelMatches(edge, "t")
  }

  test("kernel stop list is TextOps.enStop") {
    // the kernel packs its own copy of the list; drift would silently skew
    // the quality score
    val viaKernel = TextOps.enStop
      .map(w => Seq(w).toDF("t"))
      .reduce(_.union(_))
      .select(GraftFunctions.qualityCounts($"t").getField("stop").as("s"))
      .as[Int]
      .collect()
    assert(viaKernel.forall(_ == 1), "every enStop word must hit the kernel list")
  }
}
