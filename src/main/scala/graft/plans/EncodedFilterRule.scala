package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

import graft.functions.{BlobContains, DecodeBinary, DecodeLongs, DecodeStrings}

/** Encoded-domain predicate pushdown (SURVEY.md §4 extension point): a
  * membership test against a *decoded* block —
  * `array_contains(decode_strings(blob), 'en')` — is rewritten to
  * `blob_contains(blob, 'en')`, which answers from the blob header /
  * dictionary / compressed spans without materializing the block
  * (graft.core.Codecs.countEqStr/countEqLong). Semantics are identical,
  * including array_contains' three-valued null behavior.
  *
  * At 100 TB this is the difference between "scan the dictionary of every
  * block" (bytes ∝ dictionaries) and "decode every block to filter it"
  * (bytes ∝ the whole table). The reference has no analog — its lanes are
  * compile-time — but this is the same idea as its compile-time mask-strategy
  * dispatch: answer in the packed domain whenever the header proves it safe.
  */
object EncodedFilterRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayContains(DecodeStrings(blob), v @ Literal(_, StringType)) => BlobContains(blob, v)
    case ArrayContains(DecodeBinary(blob), v @ Literal(_, BinaryType))  => BlobContains(blob, v)
    case ArrayContains(DecodeLongs(blob), v @ Literal(_, LongType))     => BlobContains(blob, v)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` installs the engine's
  * optimizer rules into a session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => EncodedFilterRule)
}
