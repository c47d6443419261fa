package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NfcNormalize

/** Optimizer rule: NFC normalization is idempotent (UAX#15 — normalizing
  * already-NFC text is the identity), so nested applications collapse to
  * one. Composed pipelines hit this naturally: a cleaning stage
  * normalizes defensively, then a fingerprint/dedup stage normalizes its
  * own input again; without the rule the inner pass runs twice per row at
  * corpus scale. Injected via
  * [[graft.GraftExtensions]]`.injectOptimizerRule` — the same public
  * extension point as the expression registrations, demonstrating the
  * full ladder (custom Expression → custom Rule) without touching any
  * Spark internals.
  */
object CollapseNfc extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_)) => inner
    }
}
