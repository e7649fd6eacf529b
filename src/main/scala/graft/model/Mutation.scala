package graft.model

/** A single keyed change event from a logical-replication feed.
  *
  * Mirrors the reference's mutation abstraction
  * (reference: internal/types/types.go:119-131): `key` is a JSON array of
  * primary-key values, `data` is the full row image as a JSON object — or
  * absent for a delete — and the HLC timestamp stamps the source MVCC commit.
  *
  * Kept deliberately string-typed: payload parsing against the target schema
  * happens late (in the apply planner) with explicit Spark schemas, never by
  * inference, so numerics are not lossily routed through doubles
  * (reference uses json.UseNumber for the same reason,
  * internal/source/cdc/ndjson.go:86-88).
  */
final case class Mutation(
    key: String,
    data: Option[String],
    nanos: Long,
    logical: Int
) {
  def isDelete: Boolean = data.isEmpty
  def ts: Hlc = Hlc(nanos, logical)
}

/** A resolved-timestamp marker: the source guarantees every mutation with
  * ts <= resolved has been delivered (reference:
  * internal/source/cdc/resolved.go:36-115). The fence that gates apply.
  */
final case class Resolved(nanos: Long, logical: Int) {
  def ts: Hlc = Hlc(nanos, logical)
}

/** Per-table apply configuration, mirroring the reference's
  * apply config surface (reference: internal/target/apply/conf.go:47-54):
  *
  * @param casColumns  compare-and-set columns: an incoming row is applied only
  *                    if its CAS tuple is strictly greater than the current
  *                    row's (queries/conditional.tmpl:61-75)
  * @param deadlines   column -> max staleness; rows whose column value is
  *                    older than now()-interval are silently dropped
  *                    (conditional.tmpl:26-36)
  * @param exprs       column -> SQL expression with `$0` substitution applied
  *                    before merge (templates.go:149-190)
  * @param extras      name of a map column that absorbs unmapped payload
  *                    fields; when unset, unknown columns are a drift error
  *                    (apply.go:341-371)
  * @param ignore      payload columns to silently drop (conf.go:52)
  * @param sourceNames target column -> alternate payload field name
  *                    (conf.go:53)
  * @param allowedValues column -> allowed value set: the engine-side analog
  *                    of the reference's user-defined ENUM columns, where
  *                    the `$1::"MyEnum"` cast makes the database reject any
  *                    value outside the set and the whole batch fails
  *                    (queries/common.tmpl:23-24, apply_test.go TestUTDEnum).
  *                    A non-null value outside the set fails the batch.
  * @param patterns    column -> regex the (string) value must match: the
  *                    analog of DB-validated lexical types (INET, VARBIT —
  *                    apply_test.go:206-337) that have no Spark type; rows
  *                    that don't match fail the batch like a DB cast error
  */
final case class TableConfig(
    casColumns: Seq[String] = Nil,
    deadlines: Map[String, String] = Map.empty,
    exprs: Map[String, String] = Map.empty,
    extras: Option[String] = None,
    ignore: Set[String] = Set.empty,
    sourceNames: Map[String, String] = Map.empty,
    allowedValues: Map[String, Seq[String]] = Map.empty,
    patterns: Map[String, String] = Map.empty
)

/** Schema-drift failure, matching the reference's error surface
  * (apply.go:318-355): unexpected payload columns without an extras column,
  * or a missing / wrong-arity primary key.
  */
final class SchemaDriftException(msg: String) extends RuntimeException(msg)
