package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper marked nondeterministic: an optimizer barrier.
  *
  * Catalyst's predicate pushdown substitutes a filter's column references
  * with the defining expressions when it moves the filter below a
  * Project — for a condition spanning k derived columns that all read one
  * expensive parse (e.g. `drop_empty_fields` after `unpack_logfmt`: every
  * "field non-empty" disjunct re-derives the logfmt map), the pushed
  * filter evaluates that parse k times per row, in an interpreted
  * predicate (the map lambdas are CodegenFallback), where the unpushed
  * filter reads each materialized column once. Wrapping the filter
  * CONDITION in this no-op keeps such a filter ABOVE its defining
  * projection (predicate pushdown never moves a nondeterministic
  * condition) while the projection itself stays deterministic, so every
  * other rule — CollapseProject, column pruning, pushdown of predicates
  * born below the filter — behaves exactly as without it. Codegen is a
  * pure pass-through to the child (not CodegenFallback), so a wrapped
  * condition still whole-stage-compiles; evaluation is exactly the
  * child's.
  *
  * Use ONLY where pushing the predicate toward the scan cannot pay:
  * a non-selective filter over expensive derived columns. Anything that
  * should reach PushedFilters must never be wrapped. */
case class OpaqueExpr(child: Expression) extends UnaryExpression
    with Nondeterministic {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): OpaqueExpr =
    copy(child = newChild)
}
