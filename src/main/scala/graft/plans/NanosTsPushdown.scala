package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet filter pushdown for the legacy nanos-long `events`
  * generation (reference data model: `pipeline/extract.py` time
  * columns; fixture history in TESTDATA.md / TablesSpec).
  *
  * [[graft.core.Tables.events]] normalizes that generation with
  * `timestamp_micros(ts div 1000)` — an arithmetic expression over the
  * raw long column, which the datasource pushdown machinery cannot see
  * through: every downstream ts-range predicate compares against the
  * EXPRESSION, so `PushedFilters` stays empty and the events scan reads
  * all row groups. Invisible at 2 MB; a full unpruned scan at 100 TB.
  * (The micros-NTZ generation doesn't have this problem — its
  * normalization is a schema re-declaration, so predicates stay
  * bare-attribute; see the Tables.events scaladoc.)
  *
  * This rule rewrites, inside Filter conditions only,
  *
  *   `timestamp_micros(n div 1000)  <cmp>  <timestamp literal m>`
  *
  * into an EXACT equivalent comparison on the raw long `n` (nanos),
  * which then reaches `PushedFilters` like any other attribute
  * predicate. Exactness under `div`'s truncate-toward-zero semantics
  * (`-5 div 2 = -2`, verified against the engine): with
  * q(n) = n div 1000,
  *
  *   q(n) >= m  ⟺  n >= lower(m)   lower(m) = 1000m       (m > 0)
  *                                            1000m − 999  (m ≤ 0)
  *   q(n) <= m  ⟺  n <= upper(m)   upper(m) = 1000m + 999  (m ≥ 0)
  *                                            1000m        (m < 0)
  *   q(n) >  m  ⟺  n >= lower(m+1),  q(n) < m ⟺ n <= upper(m−1),
  *   q(n) == m  ⟺  lower(m) <= n <= upper(m).
  *
  * Null semantics are preserved: a null `n` makes both forms null.
  * Error semantics too: neither `div 1000` nor `timestamp_micros` can
  * raise, so dropping them removes no ANSI failure path. Literals
  * within 999 ns of the Long range are left alone (the ×1000 would
  * overflow; such bounds exceed what a nanos column can hold anyway,
  * and the unrewritten predicate stays correct — just unpushed).
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.core.GraftSession]]), so it participates in the operator-
  * optimization fixed point: it fires after PushDownPredicates has
  * substituted the normalization alias into the filter condition and
  * after ConstantFolding has collapsed the divisor/bound casts, and the
  * bare-attribute comparison it leaves behind is then collected by the
  * file-source strategy into `PushedFilters` (pinned in
  * NanosPushdownSpec alongside an exhaustive boundary truth table).
  */
object NanosTsPushdown extends Rule[LogicalPlan] {

  /** Largest |micros| whose nanos image (±999) still fits in a Long. */
  private val MaxSafeMicros = (Long.MaxValue - 999L) / 1000L

  /** `timestamp_micros(n div 1000)` over a long-typed `n`. Deterministic
    * only: the EqualTo rewrite duplicates `n` into two comparisons, which
    * would double-evaluate a non-deterministic expression. (In practice
    * only bare attributes reach `PushedFilters`, but the rule fires on the
    * whole Filter condition, so guard here.) */
  private object NanosAsTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(n, Literal(1000L, LongType), _))
          if n.dataType == LongType && n.deterministic => Some(n)
      case _ => None
    }
  }

  /** A foldable timestamp bound, in micros, far enough from the Long
    * edges that m±1 and the ×1000 rescale below cannot overflow. The
    * explicit two-sided range (not `math.abs`) also excludes
    * Long.MinValue, whose abs is itself — negative — and would slip an
    * overflow past an abs-based guard. */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(m: Long, TimestampType) if m > -MaxSafeMicros && m < MaxSafeMicros => Some(m)
      case _ => None
    }
  }

  private def lower(m: Long): Expression =
    Literal(if (m > 0) m * 1000 else m * 1000 - 999, LongType)
  private def upper(m: Long): Expression =
    Literal(if (m >= 0) m * 1000 + 999 else m * 1000, LongType)

  private def between(n: Expression, m: Long): Expression =
    And(GreaterThanOrEqual(n, lower(m)), LessThanOrEqual(n, upper(m)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = cond.transform {
        case GreaterThanOrEqual(NanosAsTs(n), TsLit(m)) => GreaterThanOrEqual(n, lower(m))
        case GreaterThan(NanosAsTs(n), TsLit(m))        => GreaterThanOrEqual(n, lower(m + 1))
        case LessThanOrEqual(NanosAsTs(n), TsLit(m))    => LessThanOrEqual(n, upper(m))
        case LessThan(NanosAsTs(n), TsLit(m))           => LessThanOrEqual(n, upper(m - 1))
        case EqualTo(NanosAsTs(n), TsLit(m))            => between(n, m)
        // mirrored literal-on-left forms
        case GreaterThanOrEqual(TsLit(m), NanosAsTs(n)) => LessThanOrEqual(n, upper(m))
        case GreaterThan(TsLit(m), NanosAsTs(n))        => LessThanOrEqual(n, upper(m - 1))
        case LessThanOrEqual(TsLit(m), NanosAsTs(n))    => GreaterThanOrEqual(n, lower(m))
        case LessThan(TsLit(m), NanosAsTs(n))           => GreaterThanOrEqual(n, lower(m + 1))
        case EqualTo(TsLit(m), NanosAsTs(n))            => between(n, m)
      }
      if (rewritten.fastEquals(cond)) f else f.copy(condition = rewritten)
  }
}
