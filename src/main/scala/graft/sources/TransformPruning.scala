package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.IcebergTransforms

/** TRANSFORM-AWARE partition pruning for metadata-planned scans
  * (r15): evaluates pushed data filters against each file's Iceberg
  * partition TUPLE — `bucket[N]`, `truncate[W]`, `day`/`hour`/
  * `month`/`year`, and identity — so a point lookup on a
  * bucket-partitioned 100 TB table plans only the one matching
  * bucket's files. Min/max bounds ([[FileSkipping]]) cannot do this:
  * a hash-distributed column's bounds span everything, but
  * `bucket(k) = bucket(34)` prunes 1/N of the files exactly.
  *
  * The reasoning is Iceberg's inclusive projection, kept deliberately
  * conservative: a file is dropped ONLY when a pushed conjunct
  * provably matches no row of it —
  *
  *   - equality / IN: `transform(literal)` must equal the file's
  *     partition value (sound for every transform, bucket included);
  *   - ranges: only for MONOTONIC transforms (time units, truncate,
  *     identity) — `unit(row) < unit(lit)` implies `row < lit`, so a
  *     file whose value is below the transformed bound cannot hold a
  *     match;
  *   - anything else (unknown shapes, unresolvable literals, type
  *     surprises, null semantics) keeps the file. Filters re-apply
  *     row-side, so pruning is an optimization, never a gate.
  */
private[sources] object TransformPruning {

  /** One partition-field value of one file: the SOURCE column it
    * derives from, the spec transform string, and the tuple value as
    * the manifest carried it (Int/Long/Utf8/String). */
  final case class PartValue(srcName: String, transform: String, value: Any)

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  def mayMatch(filters: Seq[Expression], parts: Seq[PartValue]): Boolean =
    filters.forall(f => parts.forall(p => mayMatchOne(f, p)))

  private def mayMatchOne(f: Expression, p: PartValue): Boolean = f match {
    case EqualTo(a: AttributeReference, Literal(v, dt)) if a.name == p.srcName =>
      couldEqual(p, v, dt)
    case EqualTo(Literal(v, dt), a: AttributeReference) if a.name == p.srcName =>
      couldEqual(p, v, dt)
    case EqualNullSafe(a: AttributeReference, Literal(v, dt))
        if a.name == p.srcName && v != null =>
      couldEqual(p, v, dt)
    case In(a: AttributeReference, list) if a.name == p.srcName &&
        list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, dt) => couldEqual(p, v, dt) }
    case InSet(a: AttributeReference, set) if a.name == p.srcName =>
      set.exists(v => couldEqual(p, v, a.dataType))
    case GreaterThan(a: AttributeReference, Literal(v, dt)) if a.name == p.srcName =>
      couldBeAtLeast(p, v, dt)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) if a.name == p.srcName =>
      couldBeAtLeast(p, v, dt)
    case LessThan(a: AttributeReference, Literal(v, dt)) if a.name == p.srcName =>
      couldBeAtMost(p, v, dt)
    case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) if a.name == p.srcName =>
      couldBeAtMost(p, v, dt)
    // literal-on-the-left ranges flip
    case GreaterThan(Literal(v, dt), a: AttributeReference) if a.name == p.srcName =>
      couldBeAtMost(p, v, dt)
    case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) if a.name == p.srcName =>
      couldBeAtMost(p, v, dt)
    case LessThan(Literal(v, dt), a: AttributeReference) if a.name == p.srcName =>
      couldBeAtLeast(p, v, dt)
    case LessThanOrEqual(Literal(v, dt), a: AttributeReference) if a.name == p.srcName =>
      couldBeAtLeast(p, v, dt)
    case And(l, r) => mayMatchOne(l, p) && mayMatchOne(r, p)
    case Or(l, r) => mayMatchOne(l, p) || mayMatchOne(r, p)
    case _ => true
  }

  /** The literal's transformed value, in a form comparable to the
    * tuple value: Long for every numeric-valued transform, UTF8String
    * for string identity/truncate. None = cannot reason, keep. */
  private def transformed(p: PartValue, v: Any, dt: DataType): Option[Any] = {
    if (v == null) return None
    try p.transform match {
      case "identity" => dt match {
        case IntegerType | LongType | ShortType | ByteType | DateType |
            TimestampType | TimestampNTZType =>
          Some(v.asInstanceOf[Number].longValue())
        case StringType => Some(v.asInstanceOf[UTF8String])
        case _ => None
      }
      case BucketRe(n) => dt match {
        case IntegerType | LongType | DateType | TimestampType |
            TimestampNTZType =>
          Some(IcebergTransforms.bucketLong(
            v.asInstanceOf[Number].longValue(), n.toInt).toLong)
        case StringType =>
          Some(IcebergTransforms.bucketUtf8(
            v.asInstanceOf[UTF8String], n.toInt).toLong)
        case _ => None
      }
      case "day" => epochDays(v, dt).map(_.toLong)
      case "hour" => dt match {
        case TimestampType | TimestampNTZType =>
          Some(IcebergTransforms.epochHoursOfMicros(
            v.asInstanceOf[Number].longValue()).toLong)
        case _ => None
      }
      case "month" =>
        epochDays(v, dt).map(IcebergTransforms.monthsOfEpochDays(_).toLong)
      case "year" =>
        epochDays(v, dt).map(IcebergTransforms.yearsOfEpochDays(_).toLong)
      case TruncRe(w) => dt match {
        case IntegerType | LongType =>
          Some(IcebergTransforms.truncateLong(
            v.asInstanceOf[Number].longValue(), w.toLong))
        case StringType =>
          Some(IcebergTransforms.truncateUtf8(
            v.asInstanceOf[UTF8String], w.toInt))
        case _ => None
      }
      case _ => None
    } catch { case _: Exception => None }
  }

  private def epochDays(v: Any, dt: DataType): Option[Int] = dt match {
    case DateType => Some(v.asInstanceOf[Number].intValue())
    case TimestampType | TimestampNTZType =>
      Some(IcebergTransforms.epochDaysOfMicros(
        v.asInstanceOf[Number].longValue()))
    case _ => None
  }

  /** The file's tuple value in the same comparable form. */
  private def tupleValue(p: PartValue): Option[Any] = p.value match {
    case null => None
    case n: Number => Some(n.longValue())
    case s: UTF8String => Some(s)
    case s: CharSequence => Some(UTF8String.fromString(s.toString))
    case _ => None
  }

  private def couldEqual(p: PartValue, v: Any, dt: DataType): Boolean =
    (transformed(p, v, dt), tupleValue(p)) match {
      case (Some(t), Some(fv)) => t == fv
      case _ => true
    }

  /** Monotonic transforms only: can the file hold a row ≥/> the
    * literal? Bucket is NOT monotonic — always true there. */
  private def monotonic(p: PartValue): Boolean = p.transform match {
    case "identity" | "day" | "hour" | "month" | "year" => true
    case TruncRe(_) => true
    case _ => false
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: UTF8String, y: UTF8String) => Some(x.compareTo(y))
    case _ => None
  }

  private def couldBeAtLeast(p: PartValue, v: Any, dt: DataType): Boolean =
    if (!monotonic(p)) true
    else (transformed(p, v, dt), tupleValue(p)) match {
      case (Some(t), Some(fv)) => cmp(fv, t).forall(_ >= 0)
      case _ => true
    }

  private def couldBeAtMost(p: PartValue, v: Any, dt: DataType): Boolean =
    if (!monotonic(p)) true
    else (transformed(p, v, dt), tupleValue(p)) match {
      case (Some(t), Some(fv)) => cmp(fv, t).forall(_ <= 0)
      case _ => true
    }
}
