package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Runtime identity, optimizer-opaque: marked [[Nondeterministic]] so
  * predicate pushdown can never substitute a downstream filter through
  * the projection that carries it (PushPredicateThroughNonJoin only
  * pushes conjuncts whose substituted form is deterministic).
  *
  * Exists for MERGED-window aggregate outputs: Catalyst treats
  * `session_window` like any grouping expression and pushes a filter
  * on `session_window.end` through the aggregate as a per-row
  * event-time prune — sound for fixed windows, UNSOUND for merged
  * sessions (a session straddling the cut truncates to a phantom
  * partial that then passes the filter; observed live by the r15
  * concurrent soak, 5 phantoms at sf0.1). Wrapping the emitted
  * session bounds in this barrier makes the aggregate's output the
  * only thing a downstream filter can see.
  *
  * Codegen'd (delegates to the child's generated code) — the barrier
  * costs nothing at runtime; its entire effect is on the optimizer.
  */
case class PushdownBarrierExpr(child: Expression)
    extends UnaryExpression with Nondeterministic {

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType

  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PushdownBarrierExpr =
    copy(child = newChild)
}

object PushdownBarrier {
  /** Column facade: identity value, blocks predicate pushdown through
    * the projection it sits in. */
  def barrier(c: Column): Column =
    ColumnBridge.column(PushdownBarrierExpr(ColumnBridge.expression(c)))
}
