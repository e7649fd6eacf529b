package graft.feed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ndjson changefeed codec.
  *
  * Wire format (reference: internal/source/cdc/ndjson.go:78-106,
  * resolved.go:36-115):
  * {{{
  * {"after":{...row image...}|null, "key":["pk1","pk2"], "updated":"<nanos>.<logical10>"}
  * {"resolved":"<nanos>.<logical10>"}
  * }}}
  *
  * Parsing is fully declarative: one `from_json` per line whose string-typed
  * fields keep raw JSON subtrees (so `after` stays an unparsed JSON string —
  * payload decoding against the target schema happens later, with explicit
  * types), and the HLC stamp is split with native string functions.
  * Everything stays inside whole-stage codegen; no UDFs.
  */
object Changefeed {

  /** Columns of a parsed feed DataFrame. */
  val KEY = "key"
  val DATA = "data"
  val NANOS = "nanos"
  val LOGICAL = "logical"
  val RESOLVED = "is_resolved"
  val SRC_FILE = "src_file"

  private def hlcNanos(c: Column): Column =
    substring_index(c, ".", 1).cast(LongType)
  private def hlcLogical(c: Column): Column =
    when(c.contains("."), substring_index(c, ".", -1).cast(IntegerType))
      .otherwise(lit(0))

  /** Parse a DataFrame of raw ndjson lines (column `value`) into the unified
    * mutation/resolved schema:
    * `(key STRING, data STRING, nanos LONG, logical INT, is_resolved BOOLEAN, src_file STRING)`.
    *
    * Mutations: `data` is the raw row-image JSON (null => delete).
    * Resolved markers: `is_resolved = true`, key/data null.
    * Blank lines and unrecognized lines are dropped.
    */
  def parseLines(lines: DataFrame, withFile: Boolean = true): DataFrame = {
    // ONE from_json per line (string-typed fields keep raw JSON subtrees:
    // `after` stays the unparsed row image, `key` the raw array text) —
    // the previous per-field get_json_object re-parsed every line 3-4x.
    // The two-step projection keeps the parse from being duplicated by
    // projection collapse (from_json is non-cheap, so Catalyst preserves it).
    val envelope = StructType(
      Seq(
        StructField("after", StringType),
        StructField("key", StringType),
        StructField("updated", StringType),
        StructField("resolved", StringType)
      )
    )
    // a pre-captured file column survives caching; input_file_name() does
    // not (it evaluates to "" once the scan is behind a cache node)
    val srcCol =
      if (lines.columns.contains(SRC_FILE)) col(SRC_FILE)
      else if (withFile) input_file_name()
      else lit("")
    val stamp = coalesce(col("__j.resolved"), col("__j.updated"))
    lines
      .select(from_json(col("value"), envelope).as("__j"), srcCol.as(SRC_FILE))
      .select(
        col("__j.key").as(KEY),
        col("__j.after").as(DATA),
        hlcNanos(stamp).as(NANOS),
        hlcLogical(stamp).as(LOGICAL),
        col("__j.resolved").isNotNull.as(RESOLVED),
        col(SRC_FILE)
      )
      .filter(col(NANOS).isNotNull)
  }

  /** Column expression encoding one parsed-feed row back to its ndjson line.
    * Inverse of [[parseLines]]; used by the generator and by tests.
    */
  def lineCol: Column = {
    val stamp = format_string("%d.%010d", col(NANOS), col(LOGICAL))
    when(
      col(RESOLVED),
      concat(lit("{\"resolved\":\""), stamp, lit("\"}"))
    ).otherwise(
      concat(
        lit("{\"after\":"),
        coalesce(col(DATA), lit("null")),
        lit(",\"key\":"),
        col(KEY),
        lit(",\"updated\":\""),
        stamp,
        lit("\"}")
      )
    )
  }

  def formatLines(feed: DataFrame): DataFrame = feed.select(lineCol.as("value"))
}
