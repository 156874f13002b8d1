package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, ExprId, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** `SELECT * RENAME (col AS newname, ...)` — the third DuckDB/
  * Snowflake star modifier (EXCLUDE and REPLACE are implemented
  * alongside): expand the star but give column `col` the name
  * `newname` AT ITS POSITION, keeping the value. A text rewrite to
  * `* EXCLUDE (col), col AS newname` would move the column to the
  * end; the same two-stage shape as star-REPLACE keeps the position:
  *
  *  1. parse sugar: the RENAME list leaves the star as trailing
  *     marker items — `SELECT *, graft_rename(col) AS newname ...`.
  *     The marker is aliased to the REAL new name (unlike REPLACE's
  *     collision-proof prefix) so that `ORDER BY newname` and outer
  *     selects resolve during analysis, before the rule runs.
  *  2. resolution rule ([[RewriteStarRename]]): the star-expanded
  *     attribute matching the marker's child (by exprId — the child
  *     resolved to exactly that attribute) is re-aliased in place
  *     with a fresh exprId; the trailing marker is dropped; both the
  *     marker's id (new-name references) and the old attribute's id
  *     are remapped to the renamed attribute in every ancestor.
  *
  * Divergence, documented: engines with native RENAME reject
  * references to the OLD name above the select; here they still
  * resolve (they bound during analysis, before the rename) and are
  * remapped to the renamed column — a lenient superset, so any
  * query valid on the native grammar behaves identically.
  */
object StarRenameSyntax {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"star-RENAME syntax: $msg")

  def rewrite(sql: String): String = {
    if (!sql.toUpperCase(java.util.Locale.ROOT).contains("RENAME"))
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
      if (t.up == "RENAME") {
        val starPos = prevNonWs(t.start - 1)
        val openPos = nextNonWs(t.end)
        val isStar = starPos >= 0 && sql.charAt(starPos) == '*' && {
          val beforeStar = prevNonWs(starPos - 1)
          if (beforeStar >= 0 && sql.charAt(beforeStar) == '.')
            fail("qualified-star RENAME (t.* RENAME) is not supported")
          (beforeStar >= 0 && sql.charAt(beforeStar) == ',') ||
            toks.exists(x => x.end == beforeStar + 1 && x.up == "SELECT")
        }
        if (isStar) {
          if (openPos >= sql.length || sql.charAt(openPos) != '(')
            fail("RENAME must be followed by a parenthesized list")
          val closeTok = toks.drop(ti + 1)
            .find(x => x.up == ")" && x.depth == t.depth)
            .getOrElse(fail("unclosed RENAME list"))
          val innerDepth = t.depth + 1
          val inner = toks.filter(x =>
            x.start > openPos && x.end <= closeTok.start)
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
              s"RENAME item needs 'col AS newname': " +
                sql.substring(s0, e0).trim)
            val as = asTok.last
            val colName = sql.substring(s0, as.start).trim
            val newName = sql.substring(as.end, e0).trim
            val ident = "[A-Za-z_][A-Za-z0-9_]*"
            if (!colName.matches(ident) || !newName.matches(ident))
              fail("RENAME sides must be plain identifiers, got " +
                s"'$colName AS $newName'")
            s", graft_rename($colName) AS $newName"
          }
          edits += Edit(t.start, closeTok.end - t.start, "")
          edits += Edit(starPos + 1, 0, items.mkString)
        }
      }
    }
    SqlEdits(sql, edits.result())
  }
}

/** Pass-through marker carrying a RENAME item through analysis. */
case class StarRenameMarker(child: Expression) extends UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def withNewChildInternal(c: Expression)
      : StarRenameMarker = copy(child = c)
  override def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = defineCodeGen(ctx, ev, c => c)
}

/** Stage 2 of star-RENAME (see [[StarRenameSyntax]]). */
object RewriteStarRename extends Rule[LogicalPlan] {

  private def hasMarker(p: Project): Boolean = p.projectList.exists {
    case Alias(StarRenameMarker(_), _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val any = plan.exists {
      case p: Project => hasMarker(p) && p.resolved
      case _ => false
    }
    if (!any) plan else rewriteUp(plan)._1
  }

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
        // markers: new name + the resolved source attribute + the
        // marker item's own output id (bound by new-name references)
        val markers = proj.projectList.collect {
          case al @ Alias(StarRenameMarker(src: AttributeReference), n) =>
            (n, src.exprId, al.exprId)
          case Alias(StarRenameMarker(other), n) =>
            throw new IllegalArgumentException(
              s"star-RENAME: '$n' must rename a plain column, got: $other")
        }
        // "renamed twice" is a property of the RENAME list (two
        // items targeting one source column), not of the projectList:
        // `SELECT * RENAME (a AS x), a` re-references the renamed
        // column — the explicit `a` shares the star-expanded
        // attribute's exprId — and per the lenient-superset contract
        // it passes through untouched (still named `a`, same value),
        // only the FIRST (star-expanded) occurrence is re-aliased.
        markers.groupBy(_._2).collect {
          case (_, ms) if ms.size > 1 => ms.map(_._1)
        }.headOption.foreach { names =>
          throw new IllegalArgumentException(
            "star-RENAME: column renamed twice: " +
              names.map(n => s"'$n'").mkString(", "))
        }
        val used = scala.collection.mutable.Set.empty[ExprId]
        val added = scala.collection.mutable.Map.empty[ExprId, Attribute]
        val srcRemap = scala.collection.mutable.Map.empty[ExprId, Attribute]
        val newList = proj.projectList.flatMap {
          case Alias(StarRenameMarker(_), _) => None
          case attr: Attribute
              if markers.exists(_._2 == attr.exprId)
                && !used.contains(attr.exprId) =>
            val (newName, srcId, markerId) =
              markers.find(_._2 == attr.exprId).get
            used += srcId
            val fresh = Alias(attr, newName)()
            srcRemap += srcId -> fresh.toAttribute
            added += markerId -> fresh.toAttribute
            Some(fresh)
          case other => Some(other)
        }
        // old-id → renamed-attribute redirection exists for OUTER
        // references whose column was consumed by the rename — but
        // when the explicit-re-reference contract keeps the source
        // attribute in the output (`SELECT * RENAME (a AS x), a`),
        // that id is still a live, reachable column and redirecting
        // it would silently rename the outer query's `a` to `x`.
        // Only ids that vanished from the output get remapped.
        val outIds = newList.collect {
          case attr: Attribute => attr.exprId
        }.toSet
        srcRemap.foreach { case (srcId, at) =>
          if (!outIds.contains(srcId)) added += srcId -> at
        }
        markers.collect { case (n, id, _) if !used.contains(id) => n }
          match {
          case Seq() => ()
          case missing => throw new IllegalArgumentException(
            "star-RENAME: no such column(s) in the star expansion: " +
              missing.mkString(", "))
        }
        (proj.copy(projectList = newList), remap ++ added)
      case other => (other, remap)
    }
  }
}
