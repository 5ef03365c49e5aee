package graft.rules

import graft.config.ValidationRule
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Compiles declarative validation rules into columnar predicates and
 * actions (reference: plugins/default_validation.py).
 *
 * Reference semantics preserved:
 *  - NULL values bypass every check (default_validation.py:17-19).
 *  - regex is a PREFIX match — Python `re.match` anchors at the start
 *    only (default_validation.py:24) — so we wrap the pattern as
 *    `^(?:pattern)` for `rlike`.
 *  - range coerces with float(); a value that can't be coerced passes
 *    (the reference logs the parse error and moves on,
 *    default_validation.py:58-60). Besides "min-max" we accept the
 *    ">=X" / "<=X" / ">X" / "<X" forms the example config uses
 *    (config/tables/table_example.yaml:60) which the reference can't
 *    actually parse.
 *  - actions (default_validation.py:28-38): None -> null-out,
 *    "skip" -> drop row, "default:X" -> replace with X coerced to the
 *    column type (the reference injects the raw string and lets
 *    Postgres coerce at insert), anything else -> abort the job.
 *  - rules run IN ORDER and later rules see earlier rules' mutations.
 *
 * lookup-type validation is compiled by the caller (it needs the dim
 * DataFrame) into the same `Outcome` shape via [[lookupOkPredicate]].
 */
object ValidationCompiler {

  /** One compiled validation step. `ok` is the pass-predicate evaluated on
    * the CURRENT value expression; actions thread a new value expression. */
  sealed trait Action
  case object NullOut extends Action
  case object Skip extends Action
  final case class Default(value: String) extends Action
  case object Abort extends Action

  def action(rule: ValidationRule): Action = rule.onFail match {
    case None => NullOut
    case Some("skip") => Skip
    case Some(s) if s.startsWith("default:") => Default(s.split(":", 2)(1))
    case Some(_) => Abort // incl. explicit "error"
  }

  /** Pass-predicate for a regex/range rule on value expression `v` of type `dt`.
    * NULL bypass is built in: a null value always passes. */
  def okPredicate(rule: ValidationRule, v: Column, dt: DataType): Column = rule.vtype match {
    case "regex" =>
      val p = rule.pattern.getOrElse("")
      v.isNull || v.cast(StringType).rlike("^(?:" + p + ")")
    case "range" =>
      parseRange(rule.pattern.getOrElse("")) match {
        case None => lit(true) // unparseable range: reference logs + passes
        case Some((lo, hi)) =>
          val num = v.cast(DoubleType)
          // float(val) failure in the reference is caught and the row passes
          // -> uncastable (num null while v not null) passes too.
          v.isNull || num.isNull ||
            (lo.map(l => num >= l).getOrElse(lit(true)) &&
             hi.map(h => num <= h).getOrElse(lit(true)))
      }
    case other =>
      throw new IllegalArgumentException(s"okPredicate can't compile validation type '$other'")
  }

  /** Pass-predicate for lookup-existence validation given the distinct set of
    * valid keys as a single-column DataFrame joined in by the caller as
    * `existsCol` (non-null == key exists). Keys compare as text on both
    * sides (reference: default_validation.py:66-71 binds str(val)). */
  def lookupOkPredicate(v: Column, existsCol: Column): Column =
    v.isNull || existsCol.isNotNull

  /** Apply a rule's action given `ok`: returns (newValueExpr, skipCond, abortCond). */
  def applyAction(rule: ValidationRule, ok: Column, v: Column, dt: DataType)
      : (Column, Option[Column], Option[Column]) =
    action(rule) match {
      case NullOut => (when(ok, v).otherwise(lit(null).cast(dt)), None, None)
      case Skip => (v, Some(!ok), None)
      case Default(x) => (when(ok, v).otherwise(lit(x).cast(dt)), None, None)
      case Abort => (v, None, Some(!ok))
    }

  /** "min-max" | ">=X" | "<=X" | ">X" | "<X" -> (lowInclusive?, highInclusive?).
    * Returns None when unparseable (reference behavior: log + pass). */
  private[rules] def parseRange(pattern: String): Option[(Option[Double], Option[Double])] = {
    val p = pattern.trim
    def num(s: String): Option[Double] = scala.util.Try(s.trim.toDouble).toOption
    if (p.startsWith(">=")) num(p.drop(2)).map(l => (Some(l), None))
    else if (p.startsWith("<=")) num(p.drop(2)).map(h => (None, Some(h)))
    else if (p.startsWith(">")) num(p.drop(1)).map(l => (Some(math.nextUp(l)), None))
    else if (p.startsWith("<")) num(p.drop(1)).map(h => (None, Some(math.nextDown(h))))
    else p.split("-", 2) match {
      // the reference's split("-", 1) form: "0-100000"
      case Array(lo, hi) =>
        (num(lo), num(hi)) match {
          case (Some(l), Some(h)) => Some((Some(l), Some(h)))
          case _ => None
        }
      case _ => None
    }
  }

  /** Job-level abort check for `error`-action rules: the reference stops
    * mid-stream at the first violation (default_validation.py:35-38); the
    * set-at-a-time equivalent is a pre-check that no violation exists
    * BEFORE any write begins (SURVEY §4.3.4). Cheap: limit(1) short-circuits. */
  def assertNoViolations(df: DataFrame, abortCond: Column, context: String): Unit = {
    val bad = df.filter(abortCond).limit(1)
    if (!bad.isEmpty) {
      val row = bad.collect().head
      throw new IllegalStateException(s"validation failed (on_fail=error) in $context: $row")
    }
  }

  /** Combined abort check: ONE aggregation job summing every error-rule's
    * violation flag, so N error rules cost one extra pass over the source
    * instead of N (the per-rule probes each re-execute the upstream plan —
    * a 2x source-read per rule at 100 TB). Throws naming every violated
    * rule with its violation count. */
  def assertNoViolationsCombined(df: DataFrame, flags: Seq[(Column, String)]): Unit = {
    if (flags.isEmpty) return
    val counts = df.agg(
      sum(when(flags.head._1, 1L).otherwise(0L)),
      flags.tail.map { case (c, _) => sum(when(c, 1L).otherwise(0L)) }: _*
    ).collect().head
    val violated = flags.zipWithIndex.collect {
      case ((_, ctx), i) if !counts.isNullAt(i) && counts.getLong(i) > 0 =>
        s"$ctx (${counts.getLong(i)} rows)"
    }
    if (violated.nonEmpty)
      throw new IllegalStateException(
        s"validation failed (on_fail=error) in ${violated.mkString("; ")}")
  }
}
