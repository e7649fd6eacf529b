package graft.table

import org.apache.spark.sql.types._
import graft.model.SchemaDriftException

/** Schema-evolution rules for the snapshot table: added columns and type
  * widening are evolution (north star); anything else is drift and fails the
  * batch, mirroring the reference's strict drift check
  * (reference: internal/target/apply/apply.go:341-355).
  */
object SchemaEvolution {

  private val integralRank: Map[DataType, Int] =
    Map(ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)

  /** Widest common type of two types, if the pair is evolvable. */
  def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (x, y) if integralRank.contains(x) && integralRank.contains(y) =>
      Some(if (integralRank(x) >= integralRank(y)) x else y)
    case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
    case (x, DoubleType) if integralRank.contains(x) => Some(DoubleType)
    case (DoubleType, y) if integralRank.contains(y) => Some(DoubleType)
    case (x, FloatType) if integralRank.contains(x) => Some(DoubleType)
    case (FloatType, y) if integralRank.contains(y) => Some(DoubleType)
    case (d1: DecimalType, d2: DecimalType) =>
      val s = math.max(d1.scale, d2.scale)
      val ip = math.max(d1.precision - d1.scale, d2.precision - d2.scale)
      Some(DecimalType(math.min(DecimalType.MAX_PRECISION, ip + s), s))
    case (x, d: DecimalType) if integralRank.contains(x) =>
      widen(DecimalType(20, 0), d)
    case (d: DecimalType, y) if integralRank.contains(y) =>
      widen(d, DecimalType(20, 0))
    case (DateType, TimestampType) | (TimestampType, DateType) =>
      Some(TimestampType)
    case (ArrayType(e1, n1), ArrayType(e2, n2)) =>
      widen(e1, e2).map(ArrayType(_, n1 || n2))
    case _ => None
  }

  /** Evolve `current` with `incoming`: keep current column order, widen types
    * where both define a column, append new incoming columns at the end.
    * Throws [[SchemaDriftException]] on incompatible type changes.
    */
  def merge(current: StructType, incoming: StructType): StructType = {
    val byName = incoming.fields.map(f => f.name -> f).toMap
    val evolvedExisting = current.fields.map { f =>
      byName.get(f.name) match {
        case None => f
        case Some(in) =>
          widen(f.dataType, in.dataType) match {
            case Some(t) => StructField(f.name, t, nullable = true)
            case None =>
              throw new SchemaDriftException(
                s"incompatible type change for column ${f.name}: " +
                  s"${f.dataType.simpleString} -> ${in.dataType.simpleString}"
              )
          }
      }
    }
    val currentNames = current.fieldNames.toSet
    val added = incoming.fields
      .filterNot(f => currentNames.contains(f.name))
      .map(f => StructField(f.name, f.dataType, nullable = true))
    StructType(evolvedExisting ++ added)
  }
}
