package graft.sqlcompat

import scala.collection.mutable.ListBuffer

/** DataFusion-dialect → Spark-dialect SQL pre-rewrites.
  *
  * The reference accepts DataFusion 45 SQL verbatim
  * (`lib/src/context/session.rs:664`); a few syntactic forms are not
  * part of Spark's dialect and are rewritten here *before*
  * `spark.sql(...)`:
  *
  *  - `expr::type` postfix casts            → `CAST(expr AS type)`
  *  - `DISTINCT ON (k, …) cols`             → row_number() window pick
  *  - `table@namespace` federation factors  → mangled identifier
  *    `table__at__namespace` (Spark validates temp-view names, so a
  *    quoted `t@ns` is not registrable; the federation layer
  *    registers the remote table under the mangled name — reference:
  *    `lib/src/data_source/database/table_register.rs:49-54`)
  *
  * The tokenizer is quote/comment-aware so rewrites never fire inside
  * string literals, quoted identifiers, or comments (SURVEY §7.4#3).
  */
object SqlRewrite {

  /** Full rewrite pipeline. */
  def rewrite(sql: String): String =
    rewriteDistinctOn(rewritePostfixCast(rewriteUnnest(rewriteFederatedNames(sql))))

  // ----------------------------------------------------------------
  // Tokenizer: splits SQL into (text, isCode) runs where isCode=false
  // for string literals ('…'), quoted identifiers ("…" / `…`) and
  // comments (-- … \n, /* … */). Rewrites only touch isCode runs.
  // ----------------------------------------------------------------
  private[graft] def runs(sql: String): List[(String, Boolean)] = {
    val out = ListBuffer.empty[(String, Boolean)]
    val n = sql.length
    var i = 0
    var codeStart = 0
    def flushCode(until: Int): Unit =
      if (until > codeStart) out += ((sql.substring(codeStart, until), true))
    while (i < n) {
      val c = sql.charAt(i)
      val closer: Option[(Int, String)] = c match {
        case '\'' | '"' | '`' =>
          // advance over the literal, honoring '' style escapes
          var j = i + 1
          var done = -1
          while (done < 0 && j < n) {
            if (sql.charAt(j) == c) {
              if (j + 1 < n && sql.charAt(j + 1) == c) j += 2 // escaped quote
              else done = j + 1
            } else j += 1
          }
          Some((if (done < 0) n else done, ""))
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          val e = sql.indexOf('\n', i)
          Some((if (e < 0) n else e + 1, ""))
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          val e = sql.indexOf("*/", i + 2)
          Some((if (e < 0) n else e + 2, ""))
        case _ => None
      }
      closer match {
        case Some((end, _)) =>
          flushCode(i)
          out += ((sql.substring(i, end), false))
          i = end
          codeStart = end
        case None => i += 1
      }
    }
    flushCode(n)
    out.toList
  }

  private def mapCode(sql: String)(f: String => String): String =
    runs(sql).map { case (t, isCode) => if (isCode) f(t) else t }.mkString

  // `expr::type` → CAST(expr AS type). Handles identifiers, quoted
  // idents, numbers, and parenthesized expressions on the left;
  // multi-word/parameterized types (DECIMAL(10,2)) on the right.
  // Type name: one word, optionally 'DOUBLE PRECISION', optional (p[,s]).
  // (A space-permissive class here would swallow a following `AS alias`.)
  private val PostfixCast =
    ("""((?:[A-Za-z_][A-Za-z0-9_\.]*|(?<![\[\w.])\d+(?:\.\d+)?|\)|\])\s*)::\s*""" +
      """([A-Za-z_][A-Za-z0-9_]*(?:\s+[Pp][Rr][Ee][Cc][Ii][Ss][Ii][Oo][Nn])?(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)""").r

  private[sqlcompat] def rewritePostfixCast(sql: String): String = {
    // run-aware: the '::' operator and the type live in code runs, but
    // the left operand may be a preceding non-code run (e.g. '1'::INT),
    // or a parenthesized expr — handled by re-joining then regexing
    // only when '::' itself is in code. Simpler robust approach:
    // tokenize, and in code runs, rewrite `x::t` where x is in-run;
    // for literal-adjacent casts ('…'::t) stitch with the previous run.
    val rs = runs(sql)
    val sb = new StringBuilder
    var idx = 0
    val arr = rs.toArray
    while (idx < arr.length) {
      val (text, isCode) = arr(idx)
      if (!isCode) { sb.append(text); idx += 1 }
      else {
        var t = PostfixCast.replaceAllIn(text, m =>
          scala.util.matching.Regex.quoteReplacement(
            if (m.group(1).trim.endsWith(")") || m.group(1).trim.endsWith("]"))
              // (expr)::t / fn(args)::t / arr[i]::t — needs the whole
              // balanced group; handled in the paren pass below
              m.group(1) + "::" + m.group(2)
            else s"CAST(${m.group(1).trim} AS ${m.group(2).trim})"))
        t = rewriteParenCast(t)
        // literal::type — previous run was a string literal
        if (t.startsWith("::") && sb.nonEmpty) {
          val m = """^::\s*([A-Za-z_][A-Za-z0-9_]*(?:\s+[Pp][Rr][Ee][Cc][Ii][Ss][Ii][Oo][Nn])?(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)""".r
            .findFirstMatchIn(t)
          m.foreach { mm =>
            // wrap the entire previous literal run
            val lit = arr(idx - 1)._1
            sb.setLength(sb.length - lit.length)
            sb.append(s"CAST($lit AS ${mm.group(1).trim})")
            t = t.substring(mm.matched.length)
          }
        }
        sb.append(t)
        idx += 1
      }
    }
    sb.toString
  }

  // `)::type` — wrap back to the matching '(' (and a preceding
  // function/identifier name, so `fn(x)::t` → CAST(fn(x) AS t)).
  // Operates within one code run; parens spanning string literals are
  // out of scope (not produced by the reference's documented flows).
  private val ParenCastTail =
    """^\s*([A-Za-z_][A-Za-z0-9_]*(?:\s+[Pp][Rr][Ee][Cc][Ii][Ss][Ii][Oo][Nn])?(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)""".r

  private[sqlcompat] def rewriteParenCast(text: String): String = {
    var t = rewriteClosedGroupCast(text, ')', '(')
    t = rewriteClosedGroupCast(t, ']', '[')
    t
  }

  /** `<group-close>::type` → CAST(<owner><group> AS type), scanning
    * back to the balanced opener and an owning identifier (covers
    * `(a+b)::t`, `fn(x)::t`, and `arr[i]::t`).
    */
  private def rewriteClosedGroupCast(text: String, close: Char, open0: Char): String = {
    var t = text
    val needle = s"$close::"
    var idx = t.indexOf(needle)
    var guard = 0
    while (idx >= 0 && guard < 100) {
      guard += 1
      ParenCastTail.findFirstMatchIn(t.substring(idx + 3)) match {
        case Some(tm) =>
          var depth = 0
          var j = idx
          var open = -1
          while (j >= 0 && open < 0) {
            val c = t.charAt(j)
            if (c == close) depth += 1
            else if (c == open0) { depth -= 1; if (depth == 0) open = j }
            j -= 1
          }
          if (open < 0) idx = -1 // unbalanced: leave untouched
          else {
            // include an owning identifier directly before the opener
            var s = open
            var k = open - 1
            while (k >= 0 && (t.charAt(k).isLetterOrDigit || t.charAt(k) == '_' || t.charAt(k) == '.')) k -= 1
            if (k < open - 1) s = k + 1
            val inner = t.substring(s, idx + 1)
            val tpe = tm.group(1).trim
            t = t.substring(0, s) + s"CAST($inner AS $tpe)" +
              t.substring(idx + 3 + tm.end)
            idx = t.indexOf(needle)
          }
        case None => idx = t.indexOf(needle, idx + 3)
      }
    }
    t
  }

  // table@namespace → table__at__namespace (valid Spark identifier).
  private val FederatedName = """(?<![\w`"'])([A-Za-z_][A-Za-z0-9_]*)@([A-Za-z_][A-Za-z0-9_]*)""".r
  def mangledName(table: String, ns: String): String = s"${table}__at__$ns"
  private[sqlcompat] def rewriteFederatedNames(sql: String): String =
    mapCode(sql)(t => FederatedName.replaceAllIn(t, m => mangledName(m.group(1), m.group(2))))

  // unnest(e) in a select list → explode(e) (DataFusion's UNNEST as a
  // projection; Spark spells the generator `explode`). FROM-clause
  // UNNEST lateral tables are not rewritten (LATERAL VIEW exists for
  // that; document as dialect divergence).
  private val Unnest = """(?i)\bunnest\s*\(""".r
  private[sqlcompat] def rewriteUnnest(sql: String): String =
    mapCode(sql)(t => Unnest.replaceAllIn(t, "explode("))

  // SELECT DISTINCT ON (k1, k2) cols FROM ... [ORDER BY o1, o2] [LIMIT n]
  //   → SELECT cols FROM (SELECT cols, <order exprs AS __graft_oN>,
  //        ROW_NUMBER() OVER (PARTITION BY keys ORDER BY o1, o2) __rn
  //      FROM ...) WHERE __rn=1 ORDER BY __graft_oN ... [LIMIT n]
  // Order expressions are projected under hidden aliases so the outer
  // sort resolves even when the select list doesn't include them
  // (SELECT DISTINCT ON (user_id) url ... ORDER BY user_id, ts DESC).
  private val DistinctOnStart =
    """(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(""".r

  private[sqlcompat] def rewriteDistinctOn(sql: String): String = {
    DistinctOnStart.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val openAt = m.end - 1
        val closeAt = findBalancedClose(sql, openAt)
        if (closeAt < 0) return sql
        val keys = sql.substring(openAt + 1, closeAt).trim
        val tail = sql.substring(closeAt + 1)
        val fromAt = findTopLevelKeyword(tail, "FROM")
        if (fromAt < 0) return sql
        val cols = tail.substring(0, fromAt).trim
        val (rest, order, limit) =
          splitTopLevelOrderLimit(tail.substring(fromAt + 4).stripSuffix(";").trim)
        val ordText = order.map(_.trim).filter(_.nonEmpty).getOrElse(keys)
        val lim = limit.map(" " + _.trim).getOrElse("")
        // each order item: expression [ASC|DESC] [NULLS FIRST|LAST]
        val Item = """(?is)^(.*?)\s*(ASC|DESC)?\s*(NULLS\s+(?:FIRST|LAST))?\s*$""".r
        val items = splitTopLevelCommas(ordText).map(_.trim).filter(_.nonEmpty)
          .zipWithIndex.map { case (it, i) =>
            it match {
              case Item(e, dir, nulls) =>
                (e.trim, Option(dir).map(" " + _).getOrElse("") +
                  Option(nulls).map(" " + _).getOrElse(""), s"__graft_o$i")
              case _ => (it, "", s"__graft_o$i")
            }
          }
        val hidden = items.map { case (e, _, a) => s"$e AS $a" }.mkString(", ")
        val windowOrd = ordText
        val outerOrd = items.map { case (_, d, a) => s"$a$d" }.mkString(", ")
        val helperNames = items.map(_._3) :+ "__graft_rn"
        // The subquery exposes only OUTPUT names, so the outer SELECT must
        // reference aliases / auto-names, never re-evaluate source
        // expressions (an aliased `expr AS name` would fail analysis), and
        // a `*` must not leak the hidden helper columns.
        val Aliased = """(?is)^(.*\S)\s+AS\s+(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\s*$""".r
        val IdentPath = """(?is)^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$""".r
        val BareAlias = """(?is)^([A-Za-z_][A-Za-z0-9_.]*)\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
        val Star = """(?is)^(?:[A-Za-z_][A-Za-z0-9_]*\.)*\*$""".r
        val (innerItems, outerItems) =
          splitTopLevelCommas(cols).map(_.trim).filter(_.nonEmpty).map { it =>
            it match {
              case Star() =>
                // qualifiers are gone after the subquery: any star becomes a
                // bare star minus the helper columns
                (it, s"* EXCEPT (${helperNames.mkString(", ")})")
              case Aliased(_, alias) => (it, alias)
              case IdentPath(_) => (it, it.substring(it.lastIndexOf('.') + 1))
              case BareAlias(_, alias) => (it, alias)
              case _ =>
                // complex expression without alias: pin its output name so
                // the outer reference resolves (mirrors Spark's auto-name
                // for simple calls like upper(x))
                val name = it.replace("`", "")
                (s"$it AS `$name`", s"`$name`")
            }
          }.unzip
        val innerCols = innerItems.mkString(", ")
        val outerCols = outerItems.mkString(", ")
        s"""SELECT $outerCols FROM (SELECT $innerCols, $hidden, ROW_NUMBER() OVER (PARTITION BY $keys ORDER BY $windowOrd) AS __graft_rn FROM ${rest.trim}) WHERE __graft_rn = 1 ORDER BY $outerOrd$lim"""
    }
  }

  /** Index of the ')' matching the '(' at `openAt` (quote-aware via
    * the tokenizer); -1 when unbalanced.
    */
  private[sqlcompat] def findBalancedClose(sql: String, openAt: Int): Int = {
    var depth = 0
    var offset = 0
    var found = -1
    runs(sql).foreach { case (text, isCode) =>
      if (found < 0 && isCode) {
        var i = 0
        while (i < text.length && found < 0) {
          val at = offset + i
          if (at >= openAt) text.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) found = at
            case _ =>
          }
          i += 1
        }
      }
      offset += text.length
    }
    found
  }

  /** First occurrence of `word` at paren depth 0 in code runs, with
    * word boundaries on both sides; -1 when absent.
    */
  private[sqlcompat] def findTopLevelKeyword(text0: String, word: String): Int = {
    var depth = 0
    var offset = 0
    var found = -1
    val w = word.toUpperCase
    runs(text0).foreach { case (text, isCode) =>
      if (found < 0 && isCode) {
        var i = 0
        while (i < text.length && found < 0) {
          text.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case c if depth == 0 && c.toUpper == w.charAt(0) &&
                i + w.length <= text.length &&
                text.substring(i, i + w.length).toUpperCase == w &&
                (i == 0 && offset == 0 || i > 0 && !isWordChar(text.charAt(i - 1))) &&
                (i + w.length == text.length || !isWordChar(text.charAt(i + w.length))) =>
              found = offset + i
            case _ =>
          }
          i += 1
        }
      }
      offset += text.length
    }
    found
  }

  private def isWordChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** Split on commas at paren depth 0 (quote-aware). */
  private def splitTopLevelCommas(text0: String): Seq[String] = {
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    runs(text0).foreach { case (text, isCode) =>
      if (!isCode) sb.append(text)
      else text.foreach {
        case '(' => depth += 1; sb.append('(')
        case ')' => depth -= 1; sb.append(')')
        case ',' if depth == 0 => parts += sb.toString; sb.clear()
        case c => sb.append(c)
      }
    }
    parts += sb.toString
    parts.toSeq
  }

  /** (rest, orderBy?, limit?) where ORDER BY / LIMIT are recognized
    * only at paren depth 0 in code runs (quote/comment aware), with
    * word boundaries (an identifier like rate_limit never matches).
    */
  private def splitTopLevelOrderLimit(tail: String)
      : (String, Option[String], Option[String]) = {
    val OrderBy = """(?is)^ORDER\s+BY\b""".r
    val Limit = """(?is)^LIMIT\b""".r
    var depth = 0
    var orderAt = -1
    var orderBodyAt = -1
    var limitAt = -1
    var offset = 0
    runs(tail).foreach { case (text, isCode) =>
      if (isCode) {
        var i = 0
        while (i < text.length) {
          def boundedBefore: Boolean = {
            val at = offset + i
            at == 0 || { val prev = tail.charAt(at - 1); !isWordChar(prev) }
          }
          text.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case c if depth == 0 && (c == 'o' || c == 'O') && orderAt < 0 && boundedBefore =>
              OrderBy.findFirstMatchIn(text.substring(i)).foreach { mm =>
                orderAt = offset + i
                orderBodyAt = offset + i + mm.end
              }
            case c if depth == 0 && (c == 'l' || c == 'L') && limitAt < 0 && boundedBefore &&
                Limit.findFirstIn(text.substring(i)).isDefined =>
              limitAt = offset + i
            case _ =>
          }
          i += 1
        }
      }
      offset += text.length
    }
    (orderAt, limitAt) match {
      case (-1, -1) => (tail, None, None)
      case (-1, l)  => (tail.substring(0, l), None, Some(tail.substring(l)))
      case (o, -1)  => (tail.substring(0, o), Some(tail.substring(orderBodyAt)), None)
      case (o, l)   => (tail.substring(0, o),
        Some(tail.substring(orderBodyAt, l)), Some(tail.substring(l)))
    }
  }
}
