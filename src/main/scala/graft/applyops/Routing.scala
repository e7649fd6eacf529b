package graft.applyops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.Mutation

/** The engine's analog of the reference's userscript hooks
  * (reference: internal/script/script.go:38-48, 172-308;
  * example internal/script/testdata/main.ts): user-supplied routing and
  * per-mutation transforms, as plain Scala functions over typed Datasets
  * instead of an embedded JS VM.
  *
  *  - [[dispatch]] = `configureSource({dispatch})`: one incoming mutation
  *    fans out to zero or more (table, mutation) pairs (UDTF shape);
  *  - [[routeTo]] = `configureSource({target})`: static routing;
  *  - [[mapTable]] = `configureTable({map})`: mutate or drop (return None)
  *    each mutation bound for one table.
  *
  * Functions must be pure/deterministic (same contract as the reference's
  * script, which re-runs on replay) so micro-batch retries stay idempotent.
  * Declarative per-table config (cas/deadlines/exprs/extras/ignore) lives in
  * [[graft.model.TableConfig]], mirroring `configureTable`'s options.
  */
object Routing {

  /** Columns: (table, key, data, nanos, logical, src_file). */
  def dispatch(
      spark: SparkSession,
      feed: DataFrame,
      fn: Mutation => Seq[(String, Mutation)]
  ): DataFrame = {
    import spark.implicits._
    feed
      .selectExpr("key", "data", "nanos", "logical", "src_file")
      .as[(String, Option[String], Long, Int, String)]
      .flatMap { case (key, data, nanos, logical, src) =>
        fn(Mutation(key, data, nanos, logical)).map { case (table, m) =>
          (table, m.key, m.data, m.nanos, m.logical, src)
        }
      }
      .toDF("table", "key", "data", "nanos", "logical", "src_file")
  }

  /** Static routing: every mutation to one table. */
  def routeTo(spark: SparkSession, feed: DataFrame, table: String): DataFrame =
    dispatch(spark, feed, m => Seq(table -> m))

  /** Per-table map/filter: transform each mutation or drop it with None. */
  def mapTable(
      spark: SparkSession,
      tableFeed: DataFrame,
      fn: Mutation => Option[Mutation]
  ): DataFrame = {
    import spark.implicits._
    tableFeed
      .selectExpr("key", "data", "nanos", "logical", "src_file")
      .as[(String, Option[String], Long, Int, String)]
      .flatMap { case (key, data, nanos, logical, src) =>
        fn(Mutation(key, data, nanos, logical)).map(m =>
          (m.key, m.data, m.nanos, m.logical, src)
        )
      }
      .toDF("key", "data", "nanos", "logical", "src_file")
  }
}
