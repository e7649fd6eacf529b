package graft.model

/** Hybrid-logical-clock timestamp: `(nanos, logical)`, totally ordered
  * lexicographically; wire format `"%d.%010d"`.
  *
  * Mirrors the reference's HLC semantics
  * (reference: internal/util/hlc/hlc.go:35-46, 60-77, 96-99) re-expressed as
  * a plain Scala value class pair. In DataFrames the same value travels as two
  * columns `(nanos LONG, logical INT)` — or `struct(nanos, logical)` where a
  * single orderable column is needed, since Spark struct ordering is
  * lexicographic and therefore identical to HLC order.
  */
final case class Hlc(nanos: Long, logical: Int) extends Ordered[Hlc] {
  override def compare(that: Hlc): Int = {
    val c = java.lang.Long.compare(nanos, that.nanos)
    if (c != 0) c else Integer.compare(logical, that.logical)
  }

  /** Wire format used by changefeed `updated` / `resolved` fields. */
  def format: String = f"$nanos%d.$logical%010d"

  def isZero: Boolean = nanos == 0L && logical == 0
}

object Hlc {
  val Zero: Hlc = Hlc(0L, 0)

  /** Parse `"<nanos>.<logical-10-digits>"`; the logical part is optional in
    * lenient inputs (treated as 0). Throws on malformed input, mirroring the
    * reference's strict parse (hlc.go:60-77).
    */
  def parse(s: String): Hlc = {
    val dot = s.indexOf('.')
    if (dot < 0) Hlc(s.trim.toLong, 0)
    else Hlc(s.substring(0, dot).toLong, s.substring(dot + 1).toInt)
  }

  def tryParse(s: String): Option[Hlc] =
    try Some(parse(s))
    catch { case _: NumberFormatException | _: NullPointerException => None }
}
