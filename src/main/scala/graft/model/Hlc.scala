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

  /** Strict parse of `"<nanos>.<logical>"`, mirroring the reference's rules
    * exactly (hlc.go:60-77): exactly one dot, nanos >= 0, and the logical
    * part either 10 digits wide or zero-valued. Malformed feeds surface
    * here instead of being silently absorbed.
    */
  def parse(s: String): Hlc = {
    val parts = s.split("\\.", -1)
    if (parts.length != 2)
      throw new NumberFormatException(s"can't parse timestamp $s")
    val nanos = parts(0).toLong
    if (nanos < 0)
      throw new NumberFormatException(s"nanos must be greater than 0: $nanos")
    // parse as 64-bit first (the reference's strconv.Atoi is 64-bit, so a
    // 10-digit logical up to 9999999999 parses there); our HLC stores the
    // logical as int32 — CRDB logical counters fit int32 in practice — so
    // values beyond Int.MaxValue are rejected with an explicit message
    // rather than a bare toInt overflow
    val logicalL = parts(1).toLong
    if (parts(1).length != 10 && logicalL != 0)
      throw new NumberFormatException(
        s"logical part '${parts(1)}' must be 10 digits or zero-valued"
      )
    if (logicalL < 0 || logicalL > Int.MaxValue)
      throw new NumberFormatException(
        s"logical part '${parts(1)}' exceeds the int32 range this engine stores"
      )
    Hlc(nanos, logicalL.toInt)
  }

  /** Lenient entry point: the strict rules plus a bare-nanos form
    * (`"123"` == `Hlc(123, 0)`); None on anything malformed.
    */
  def tryParse(s: String): Option[Hlc] =
    try {
      if (s != null && !s.contains('.')) Some(Hlc(s.trim.toLong, 0))
      else Some(parse(s))
    } catch { case _: NumberFormatException | _: NullPointerException => None }
}
