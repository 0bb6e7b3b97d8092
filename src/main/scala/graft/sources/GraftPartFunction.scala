package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.EncodePipeline.PartSpec

/** The table's placement law as a Spark V2 catalog function — what makes
  * storage-partitioned joins possible over graft tables (the Iceberg
  * `bucket(N, col)` pattern): the scan reports
  * `KeyGroupedPartitioning(graft_part_…(key))`, Catalyst resolves the named
  * transform through [[GraftCatalog]]'s FunctionCatalog to THIS function,
  * and two scans whose bound functions share `canonicalName()` (same kind,
  * partitions, salts) join shuffle-free when their partition values line up.
  *
  * The transform name ENCODES the parameters (`graft_part_host_8_4`,
  * `graft_part_hash_8`) so the key column is the transform's only child —
  * Catalyst's clustering-satisfaction check walks transform leaves, and a
  * literal child would break `ClusteredDistribution(key)` matching.
  *
  * `produceResult` MUST agree with [[graft.plans.EncodePipeline.PartSpec
  * .expr]]'s Column form (pmod/xxhash64/regexp_extract SQL semantics, seed
  * 42) — GraftPartFunctionSpec pins the parity. Spark only calls it when
  * `spark.sql.sources.v2.bucketing.shuffle.enabled` re-partitions a
  * non-graft join side with the function; pure two-graft-table joins
  * compare partition values and never evaluate it.
  */
final case class GraftPartFunction(kind: String, partitions: Int, salts: Int,
                                   boundType: DataType = StringType)
    extends UnboundFunction with ScalarFunction[Integer] {

  override def name(): String = GraftPartFunction.nameOf(kind, partitions, salts)
  override def description(): String =
    s"graft placement: $kind(key) -> [0, $partitions)" +
      (if (kind == "host") s" with $salts salts" else "")

  /** `hash` accepts string/long/int keys (xxhash64's per-type semantics);
    * `host` parses URLs, so string only. UnsupportedOperationException is
    * the failure type Catalyst CATCHES during transform resolution — any
    * other exception here would fail whole reads of oddly-keyed tables
    * instead of just skipping the partitioning report. */
  override def bind(inputType: StructType): BoundFunction = {
    val ok = inputType.fields.length == 1 && (inputType.fields(0).dataType match {
      case StringType => true
      case LongType | IntegerType => kind == "hash"
      case _ => false
    })
    if (!ok) throw new UnsupportedOperationException(
      s"${name()} binds to one ${if (kind == "host") "string" else "string/long/int"} " +
        s"key column, got $inputType")
    copy(boundType = inputType.fields(0).dataType)
  }

  override def inputTypes(): Array[DataType] = Array(boundType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true
  override def canonicalName(): String =
    s"graft.part_$kind($partitions,$salts,${boundType.simpleString})"

  private val Seed = 42L // Spark SQL xxhash64's default seed
  // same pattern as EncodePipeline.saltedHostPart's regexp_extract
  private val hostRe = java.util.regex.Pattern.compile("^[a-z]+://([^/]+)")

  private def xx(s: UTF8String): Long = XXH64.hashUTF8String(s, Seed)
  private def pmod(a: Long, b: Long): Long = { val m = a % b; if (m < 0) m + b else m }

  /** xxhash64(key) with Spark SQL's per-type hashing; NULL = the seed
    * (hash expressions skip null children) */
  private def xxKey(input: InternalRow): Long =
    if (input.isNullAt(0)) Seed
    else boundType match {
      case StringType => xx(input.getUTF8String(0))
      case LongType => XXH64.hashLong(input.getLong(0), Seed)
      case IntegerType => XXH64.hashInt(input.getInt(0), Seed)
      case other => throw new IllegalStateException(s"unbindable $other")
    }

  override def produceResult(input: InternalRow): Integer = {
    val part: Long = kind match {
      case "hash" => pmod(xxKey(input), partitions)
      case "host" =>
        // pmod(xxhash64(concat(host, '#', salt)), P) with
        // host = regexp_extract(key, "^[a-z]+://([^/]+)", 1)  ("" on no match)
        // salt = cast(pmod(xxhash64(key), S) as string)
        if (input.isNullAt(0)) pmod(Seed, partitions) // concat(NULL,…) is NULL
        else {
          val url = input.getUTF8String(0)
          val m = hostRe.matcher(url.toString)
          val host = if (m.find()) m.group(1) else ""
          val salt = pmod(xx(url), salts)
          pmod(xx(UTF8String.fromString(host + "#" + salt)), partitions)
        }
    }
    Integer.valueOf(part.toInt)
  }
}

object GraftPartFunction {
  def nameOf(kind: String, partitions: Int, salts: Int): String =
    if (kind == "host") s"graft_part_host_${partitions}_$salts"
    else s"graft_part_hash_$partitions"

  private val HostName = """graft_part_host_(\d+)_(\d+)""".r
  private val HashName = """graft_part_hash_(\d+)""".r

  /** parse a name-encoded placement function; None = not ours */
  def fromName(name: String): Option[GraftPartFunction] = name match {
    case HostName(p, s) => Some(GraftPartFunction("host", p.toInt, s.toInt))
    case HashName(p) => Some(GraftPartFunction("hash", p.toInt, salts = 1))
    case _ => None
  }

  /** the spec as a connector Transform: `graft_part_<kind>_<P>[_<S>](key)` */
  def transformOf(spec: PartSpec): Transform =
    Expressions.apply(nameOf(spec.kind, spec.partitions, spec.salts),
      Expressions.column(spec.key))
}
