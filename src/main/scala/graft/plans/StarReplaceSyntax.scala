package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** `SELECT * REPLACE (expr AS col, ...)` — DuckDB's star-REPLACE:
  * expand the star but substitute `expr` for column `col` IN PLACE
  * (same position, same output name). Spark has star-EXCEPT but no
  * REPLACE; a naive text rewrite to `* EXCEPT (col), expr AS col`
  * would move the column to the end, so this is done in two stages
  * that preserve position:
  *
  *  1. parse sugar ([[StarReplaceSyntax.rewrite]]): the REPLACE list
  *     moves out of the star into marker items —
  *     `SELECT *, graft_replace(expr) AS __graft_r_col ...` — names
  *     that cannot collide, so analysis resolves the whole select
  *     normally (the replacement expr resolves against the child
  *     scope, exactly DuckDB's REPLACE scoping);
  *  2. a resolution rule ([[RewriteStarReplace]]): once the Project
  *     is resolved, the star-expanded attribute `col` is swapped for
  *     `Alias(expr, col)` REUSING the attribute's exprId — parents
  *     (ORDER BY, outer selects) that already bound to `col` now see
  *     the replaced value, which is DuckDB's evaluation order — and
  *     the trailing marker item is dropped.
  *
  * Loud failures: qualified-star REPLACE (`t.* REPLACE`), a REPLACE
  * item without `AS`, and a target column that does not exist in the
  * star expansion.
  */
object StarReplaceSyntax {

  private[plans] val Prefix = "__graft_r_"

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"star-REPLACE syntax: $msg")

  def rewrite(sql: String): String = {
    if (!sql.toUpperCase(java.util.Locale.ROOT).contains("REPLACE"))
      return sql
    val toks = AsOfSyntax.lex(sql)
    def prevNonWs(p0: Int): Int = {
      var p = p0
      while (p >= 0 && Character.isWhitespace(sql.charAt(p))) p -= 1
      p
    }
    def nextNonWs(p0: Int): Int = {
      var p = p0
      while (p < sql.length && Character.isWhitespace(sql.charAt(p))) p += 1
      p
    }
    import SqlEdits.Edit
    val edits = List.newBuilder[Edit]
    toks.zipWithIndex.foreach { case (t, ti) =>
      if (t.up == "REPLACE") {
        val starPos = prevNonWs(t.start - 1)
        val openPos = nextNonWs(t.end)
        // a star-REPLACE site: `* REPLACE (`, where the `*` is a real
        // star (follows SELECT or a comma), not multiplication and
        // not a replace(...) function call
        val isStar = starPos >= 0 && sql.charAt(starPos) == '*' && {
          val beforeStar = prevNonWs(starPos - 1)
          if (beforeStar >= 0 && sql.charAt(beforeStar) == '.')
            fail("qualified-star REPLACE (t.* REPLACE) is not supported")
          (beforeStar >= 0 && sql.charAt(beforeStar) == ',') ||
            toks.exists(x => x.end == beforeStar + 1 && x.up == "SELECT")
        }
        if (isStar) {
          if (openPos >= sql.length || sql.charAt(openPos) != '(')
            fail("REPLACE must be followed by a parenthesized list")
          // matching close: first `)` token after REPLACE back at its
          // depth (the lexer emits `)` with the depth AFTER closing)
          val closeTok = toks.drop(ti + 1)
            .find(x => x.up == ")" && x.depth == t.depth)
            .getOrElse(fail("unclosed REPLACE list"))
          val innerDepth = t.depth + 1
          val inner = toks.filter(x =>
            x.start > openPos && x.end <= closeTok.start)
          // item bounds: split on commas at the list's own depth
          val bounds = List.newBuilder[(Int, Int)]
          var itemStart = openPos + 1
          inner.foreach { x =>
            if (x.up == "," && x.depth == innerDepth) {
              bounds += ((itemStart, x.start)); itemStart = x.end
            }
          }
          bounds += ((itemStart, closeTok.start))
          val items = bounds.result().map { case (s0, e0) =>
            val asTok = inner.filter(x => x.up == "AS" &&
              x.depth == innerDepth && x.start >= s0 && x.end <= e0)
            if (asTok.isEmpty) fail(
              s"REPLACE item needs 'expr AS col': " +
                sql.substring(s0, e0).trim)
            val as = asTok.last
            val expr = sql.substring(s0, as.start).trim
            val col = sql.substring(as.end, e0).trim
            if (expr.isEmpty || col.isEmpty ||
                !col.matches("[A-Za-z_][A-Za-z0-9_]*"))
              fail(s"REPLACE target must be a plain identifier, got '$col'")
            s", graft_replace($expr) AS $Prefix$col"
          }
          // drop `REPLACE ( ... )`, append markers right after the star
          edits += Edit(t.start, closeTok.end - t.start, "")
          edits += Edit(starPos + 1, 0, items.mkString)
        }
      }
    }
    SqlEdits(sql, edits.result())
  }
}

/** Pass-through marker carrying a REPLACE item through analysis
  * (never survives to execution — [[RewriteStarReplace]] consumes
  * it; codegen passthrough exists for safety).
  */
case class StarReplaceMarker(child: Expression) extends UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def withNewChildInternal(c: Expression)
      : StarReplaceMarker = copy(child = c)
  override def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = defineCodeGen(ctx, ev, c => c)
}

/** Stage 2 of star-REPLACE (see [[StarReplaceSyntax]]).
  *
  * The replacement alias gets a FRESH exprId (reusing the replaced
  * attribute's id would make the projection item self-referential —
  * `a#1 * 2 AS a#1` — which the optimizer rightly collapses as a
  * no-op), so every reference to the old attribute ABOVE the Project
  * (ORDER BY, outer selects) is remapped to the new attribute during
  * the same bottom-up walk. That remap also propagates the replaced
  * column's possibly-NEW data type to its consumers.
  */
object RewriteStarReplace extends Rule[LogicalPlan] {
  import StarReplaceSyntax.Prefix
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, ExprId}

  private def hasMarker(p: Project): Boolean = p.projectList.exists {
    case Alias(StarReplaceMarker(_), n) => n.startsWith(Prefix)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val any = plan.exists {
      case p: Project => hasMarker(p) && p.resolved
      case _ => false
    }
    if (!any) plan else rewriteUp(plan)._1
  }

  /** Bottom-up: rewrite marker Projects, carry oldId→newAttr maps to
    * every ancestor so their references re-bind.
    */
  private def rewriteUp(p: LogicalPlan)
      : (LogicalPlan, Map[ExprId, Attribute]) = {
    val done = p.children.map(rewriteUp)
    val remap = done.flatMap(_._2).toMap
    var node =
      if (p.children.isEmpty) p else p.withNewChildren(done.map(_._1))
    if (remap.nonEmpty)
      node = node.transformExpressions {
        case a: AttributeReference if remap.contains(a.exprId) =>
          remap(a.exprId)
      }
    node match {
      case proj: Project if proj.resolved && hasMarker(proj) =>
        val markers = proj.projectList.collect {
          case Alias(StarReplaceMarker(e), n) if n.startsWith(Prefix) =>
            n.stripPrefix(Prefix) -> e
        }
        val used = scala.collection.mutable.Set.empty[String]
        val added = scala.collection.mutable.Map.empty[ExprId, Attribute]
        val newList = proj.projectList.flatMap {
          case Alias(StarReplaceMarker(_), n) if n.startsWith(Prefix) =>
            None
          case attr: Attribute
              if markers.exists(m => conf.resolver(m._1, attr.name)) =>
            val (name, e) =
              markers.find(m => conf.resolver(m._1, attr.name)).get
            if (used.contains(name))
              throw new IllegalArgumentException(
                s"star-REPLACE: ambiguous target column '$name' " +
                  "(matches more than one star-expanded column)")
            used += name
            val fresh = Alias(e, attr.name)()
            added += attr.exprId -> fresh.toAttribute
            Some(fresh)
          case other => Some(other)
        }
        markers.collect { case (n, _) if !used.contains(n) => n } match {
          case Seq() => ()
          case missing => throw new IllegalArgumentException(
            s"star-REPLACE: no such column(s) in the star expansion: " +
              missing.mkString(", "))
        }
        (proj.copy(projectList = newList), remap ++ added)
      case other => (other, remap)
    }
  }
}
