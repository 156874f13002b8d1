package graft.plans

/** `QUALIFY` clause support (DuckDB/Snowflake/BigQuery's post-window
  * filter, absent from Spark SQL), as pure parser sugar on top of the
  * [[AsOfSyntax]] lexer — no analyzer involvement at all:
  *
  * {{{
  *   SELECT s FROM t QUALIFY <cond> [ORDER ...]
  * }}}
  * becomes
  * {{{
  *   SELECT * EXCEPT (__graft_q) FROM (
  *     SELECT s, (<cond>) AS __graft_q FROM t
  *   ) WHERE __graft_q [ORDER ...]
  * }}}
  *
  * The condition (window functions included) moves INTO the select
  * list of its own scope — where Spark happily evaluates windows —
  * and the outer query filters on the materialized boolean, then
  * drops it with star-EXCEPT. ORDER BY / LIMIT / set operators stay
  * OUTSIDE the wrap, so they run after the filter, exactly the
  * standard QUALIFY evaluation order (... → WINDOW → QUALIFY →
  * ORDER BY → LIMIT).
  *
  * Not supported (loud failures, not silent misreads):
  * `SELECT DISTINCT ... QUALIFY` (the added flag column would change
  * the distinct), and QUALIFY outside a SELECT with a FROM.
  */
object QualifySyntax {

  private val WrapTerm = Set("ORDER", "LIMIT", "OFFSET", "UNION",
    "EXCEPT", "INTERSECT", "MINUS", "FETCH", ";")

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"QUALIFY syntax: $msg")

  def rewrite(sql: String): String = {
    if (!sql.toUpperCase(java.util.Locale.ROOT).contains("QUALIFY"))
      return sql
    val toks = AsOfSyntax.lex(sql)
    final case class Edit(pos: Int, del: Int, ins: String)
    val edits = List.newBuilder[Edit]
    var k = 0
    while (k < toks.length) {
      val q = toks(k)
      if (q.up == "QUALIFY") {
        val d = q.depth
        // the enclosing SELECT: scan back at the same depth without
        // leaving the scope
        var i = k - 1
        var selIdx = -1
        while (selIdx < 0 && i >= 0) {
          val t = toks(i)
          if (t.depth < d) i = -1
          else {
            if (t.depth == d && t.up == "SELECT") selIdx = i else i -= 1
          }
        }
        if (selIdx < 0) fail("QUALIFY outside a SELECT")
        if (toks(selIdx + 1).up == "DISTINCT")
          fail("SELECT DISTINCT with QUALIFY is not supported " +
            "(the rewrite adds a column); QUALIFY first, DISTINCT above")
        var f = selIdx + 1
        var fromIdx = -1
        while (fromIdx < 0 && f < k) {
          if (toks(f).depth == d && toks(f).up == "FROM") fromIdx = f
          else f += 1
        }
        if (fromIdx < 0) fail("QUALIFY requires a FROM clause")
        // condition extent = wrap end: the next clause of this select
        var e = k + 1
        var end = sql.length
        var stop = false
        while (!stop && e < toks.length) {
          val t = toks(e)
          if (t.up == ")" && t.depth < d) { end = t.start; stop = true }
          else if (t.depth == d && WrapTerm(t.up)) { end = t.start; stop = true }
          else e += 1
        }
        val cond = sql.substring(q.end, end).trim
        if (cond.isEmpty) fail("empty QUALIFY condition")
        edits += Edit(toks(selIdx).start, 0,
          "SELECT * EXCEPT (__graft_q) FROM (")
        edits += Edit(toks(fromIdx).start, 0, s", ($cond) AS __graft_q ")
        edits += Edit(q.start, end - q.start, "")
        edits += Edit(end, 0, ") WHERE __graft_q ")
      }
      k += 1
    }
    val es = edits.result()
    if (es.isEmpty) sql
    else {
      val sb = new StringBuilder(sql)
      es.sortBy(-_.pos).foreach(ed =>
        sb.replace(ed.pos, ed.pos + ed.del, ed.ins))
      sb.toString
    }
  }
}
