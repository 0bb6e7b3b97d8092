package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

import graft.functions.{BlobContains, BlobContainsBetween, BlobCountBetween, DecodeBinary, DecodeLongs, DecodeStrings}

/** Encoded-domain predicate pushdown (SURVEY.md §4 extension point): a
  * membership or range test against a *decoded* block —
  * `array_contains(decode_strings(blob), 'en')`,
  * `exists(decode_longs(blob), x -> x BETWEEN lo AND hi)`,
  * `size(filter(decode_longs(blob), x -> x >= lo)) > 0` — is rewritten to
  * `blob_contains` / `blob_contains_between` / `blob_count_between`, which
  * answer from the blob header / dictionary / compressed spans without
  * materializing the block (graft.core.Codecs.countEqStr/countEqLong/
  * countBetweenLong). Semantics are identical, including the three-valued
  * null behavior of array_contains/exists (filter drops null-predicate
  * elements, so the size(filter(...)) form is two-valued).
  *
  * At 100 TB this is the difference between "scan the dictionary/header of
  * every block" (bytes ∝ dictionaries) and "decode every block to filter it"
  * (bytes ∝ the whole table). The reference has no analog — its lanes are
  * compile-time — but this is the same idea as its compile-time mask-strategy
  * dispatch: answer in the packed domain whenever the header proves it safe.
  */
object EncodedFilterRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayContains(DecodeStrings(blob), v @ Literal(_, StringType)) => BlobContains(blob, v)
    case ArrayContains(DecodeBinary(blob), v @ Literal(_, BinaryType))  => BlobContains(blob, v)
    case ArrayContains(DecodeLongs(blob), v @ Literal(_, LongType))     => BlobContains(blob, v)

    // exists(decode_longs(b), x -> <literal range / equality on x>).
    // Guarded on followThreeValuedLogic=true: the rewrites reproduce the
    // modern 3VL semantics (null when no match but the block holds nulls);
    // under spark.sql.legacy.followThreeValuedLogicInArrayExists=false the
    // built-in returns false there, so we leave it alone.
    case ae @ ArrayExists(DecodeLongs(blob),
        LambdaFunction(body, Seq(v: NamedLambdaVariable), _), true) =>
      body match {
        case EqualTo(x, l @ Literal(_, LongType)) if x.semanticEquals(v) => BlobContains(blob, l)
        case EqualTo(l @ Literal(_, LongType), x) if x.semanticEquals(v) => BlobContains(blob, l)
        case _ => rangeOf(body, v) match {
          case Some((lo, hi)) =>
            BlobContainsBetween(blob, Literal(lo, LongType), Literal(hi, LongType))
          case None => ae
        }
      }

    // size(filter(decode_longs(b), x -> <range>)) — the match count itself;
    // comparisons over it then fold naturally (`> 0`, `>= 1`, aggregation).
    // Guarded on legacySizeOfNull=false: under the legacy flag size(null)
    // is -1, but Cast(BlobCountBetween) of a null blob is null.
    case sz @ Size(ArrayFilter(DecodeLongs(blob),
        LambdaFunction(body, Seq(v: NamedLambdaVariable), _)), false) =>
      rangeOf(body, v) match {
        case Some((lo, hi)) =>
          Cast(BlobCountBetween(blob, Literal(lo, LongType), Literal(hi, LongType)), IntegerType)
        case None => sz
      }
  }

  /** the closed interval a conjunction of literal comparisons on `v` selects;
    * None when the body is not a pure range predicate on v. Strict bounds
    * at Long.{Min,Max}Value are left unrewritten (the ±1 would wrap). */
  private def rangeOf(e: Expression, v: NamedLambdaVariable): Option[(Long, Long)] = e match {
    case GreaterThanOrEqual(x, Literal(lo: Long, LongType)) if x.semanticEquals(v) =>
      Some((lo, Long.MaxValue))
    case LessThanOrEqual(x, Literal(hi: Long, LongType)) if x.semanticEquals(v) =>
      Some((Long.MinValue, hi))
    case GreaterThan(x, Literal(lo: Long, LongType)) if x.semanticEquals(v) && lo != Long.MaxValue =>
      Some((lo + 1, Long.MaxValue))
    case LessThan(x, Literal(hi: Long, LongType)) if x.semanticEquals(v) && hi != Long.MinValue =>
      Some((Long.MinValue, hi - 1))
    // literal-on-left mirrors
    case GreaterThanOrEqual(Literal(hi: Long, LongType), x) if x.semanticEquals(v) =>
      Some((Long.MinValue, hi))
    case LessThanOrEqual(Literal(lo: Long, LongType), x) if x.semanticEquals(v) =>
      Some((lo, Long.MaxValue))
    case GreaterThan(Literal(hi: Long, LongType), x) if x.semanticEquals(v) && hi != Long.MinValue =>
      Some((Long.MinValue, hi - 1))
    case LessThan(Literal(lo: Long, LongType), x) if x.semanticEquals(v) && lo != Long.MaxValue =>
      Some((lo + 1, Long.MaxValue))
    case And(a, b) =>
      for (ra <- rangeOf(a, v); rb <- rangeOf(b, v))
        yield (math.max(ra._1, rb._1), math.min(ra._2, rb._2))
    case _ => None
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` installs the engine's
  * optimizer rules and SQL function surface into a session — every codec /
  * blob expression becomes callable from `spark.sql(...)` and `expr(...)`,
  * so the pushdown rules fire on SQL-authored predicates too. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import graft.functions._

  private def info(name: String) = new ExpressionInfo("graft", name)

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "encode_longs" -> { case Seq(c) => EncodeLongs(c) },
    "decode_longs" -> { case Seq(c) => DecodeLongs(c) },
    "encode_strings" -> { case Seq(c) => EncodeStrings(c) },
    "decode_strings" -> { case Seq(c) => DecodeStrings(c) },
    "encode_binary" -> { case Seq(c) => EncodeBinary(c) },
    "decode_binary" -> { case Seq(c) => DecodeBinary(c) },
    "blob_codec" -> { case Seq(c) => BlobCodec(c) },
    "blob_count_eq" -> { case Seq(b, v) => BlobCountEq(b, v) },
    "blob_contains" -> { case Seq(b, v) => BlobContains(b, v) },
    "blob_count_between" -> { case Seq(b, lo, hi) => BlobCountBetween(b, lo, hi) },
    "blob_contains_between" -> { case Seq(b, lo, hi) => BlobContainsBetween(b, lo, hi) },
    "blob_range" -> { case Seq(c) => BlobRange(c) },
    "blob_range_str" -> { case Seq(c) => BlobRangeStr(c) },
    "bits_needed" -> { case Seq(c) => BitsNeeded(c) },
    "double_bits" -> { case Seq(c) => DoubleBits(c) },
    "bits_double" -> { case Seq(c) => BitsDouble(c) })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => EncodedFilterRule)
    fns.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
  }
}
