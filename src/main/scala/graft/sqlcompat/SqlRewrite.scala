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
    rewriteGroupsFrames(rewriteQualify(rewriteDistinctOn(
      rewritePostfixCast(rewriteExcludeWildcard(rewriteUnnest(rewriteFederatedNames(sql)))))))

  // `* EXCLUDE (a, b)` / `* EXCLUDE a` wildcard option (DataFusion
  // plans ExcludeSelectItem alongside the EXCEPT spelling —
  // `datafusion/sql/src/expr/mod.rs`; Spark only parses `* EXCEPT
  // (…)`). Only the wildcard POSITION rewrites: the `*` must follow
  // SELECT/DISTINCT/','/'('/'.'. so a multiplication by a column
  // named `exclude` (`a * exclude`) is untouched.
  private val ExcludeWildcard =
    """(?is)([,(.]|\bSELECT\b|\bDISTINCT\b)(\s*\*\s*)EXCLUDE\s*(?:\(\s*([^()]*?)\s*\)|([A-Za-z_][A-Za-z0-9_]*))""".r
  private[sqlcompat] def rewriteExcludeWildcard(sql: String): String =
    mapCode(sql)(code => ExcludeWildcard.replaceAllIn(code, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"${m.group(1)}${m.group(2)}EXCEPT (${Option(m.group(3)).getOrElse(m.group(4))})")))

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

  // ----------------------------------------------------------------
  // QUALIFY (DataFusion ≥ 31 plans it as a post-window filter —
  // `datafusion/sql/src/select.rs`, reference dialect via
  // `lib/src/context/session.rs:664`; Spark ≤ 4.1 has no QUALIFY).
  //
  //   SELECT [DISTINCT] sl FROM src … QUALIFY pred [ORDER BY o] [LIMIT n]
  //   → SELECT [DISTINCT] names(sl)
  //     FROM (SELECT sl, o AS __graft_qoK …, (pred') AS __graft_q
  //           FROM src …) __graft_qf
  //     WHERE __graft_q [ORDER BY __graft_qoK …] [LIMIT n]
  //
  // where pred'/o' substitute select-list aliases with their source
  // expressions (QUALIFY may reference window-expression aliases; a
  // subquery level cannot). `src …` keeps WHERE/GROUP BY/HAVING/WINDOW
  // verbatim, so windows-over-aggregates and named windows still
  // resolve. Caveat (documented, pathological): an alias that shadows
  // a DIFFERENT base column resolves to the alias here, to the base
  // column in DataFusion. Qualified stars (a.*) fall back to original
  // text (Spark's parse error), same policy as the GROUPS rewrite.
  // DISTINCT+ORDER BY rewrites only when every ORDER BY item is an
  // output column or position (the only forms valid under DISTINCT);
  // anything else falls back to the original text too.
  // ----------------------------------------------------------------
  private[sqlcompat] def rewriteQualify(sql: String): String = {
    var cur = sql
    var guard = 0
    var changed = true
    while (changed && guard < 8) {
      guard += 1
      rewriteOneQualifyBlock(cur) match {
        case Some(next) => cur = next
        case None => changed = false
      }
    }
    cur
  }

  /** Position of the first top-of-its-SELECT `QUALIFY` clause keyword
    * in a code run; -1 when none. Occurrences where the preceding
    * significant token expects an operand (WHERE/AND/','/'('/operator)
    * are identifier uses, not the clause.
    */
  private def findQualifyKeyword(sql: String): Int = {
    val mask = codeMask(sql)
    val QualifyWord = """(?is)\bQUALIFY\b""".r
    val operandCtx = Set("WHERE", "AND", "OR", "NOT", "BY", "SELECT",
      "ON", "WHEN", "THEN", "ELSE", "CASE", "AS", "IN", "LIKE",
      "BETWEEN", "DISTINCT", "ALL", "FROM", "JOIN", "OVER", "HAVING")
    QualifyWord.findAllMatchIn(sql).map(_.start).find { at =>
      mask(at) && {
        var i = at - 1
        while (i >= 0 && sql.charAt(i).isWhitespace) i -= 1
        if (i < 0) false
        else {
          val c = sql.charAt(i)
          if (",(=<>+-*/%|&!.".indexOf(c) >= 0) false
          else if (isWordChar(c)) {
            var j = i
            while (j >= 0 && isWordChar(sql.charAt(j))) j -= 1
            !operandCtx.contains(sql.substring(j + 1, i + 1).toUpperCase)
          } else true // ')', quote-run boundary, … — a clause can end here
        }
      }
    }.getOrElse(-1)
  }

  /** Rewrite the SELECT block enclosing the first QUALIFY clause; None
    * when there is nothing (safe) to rewrite.
    */
  private def rewriteOneQualifyBlock(sql: String): Option[String] = {
    val qAt = findQualifyKeyword(sql)
    if (qAt < 0) return None
    val mask = codeMask(sql)
    // enclosing SELECT: nearest preceding SELECT at depth 0 (a
    // subquery's SELECT is met before its opening paren — see the
    // identical GROUPS-block search above)
    var depth = 0
    var i = qAt - 1
    var selAt = -1
    while (i >= 0 && selAt < 0) {
      if (mask(i)) sql.charAt(i) match {
        case ')' => depth += 1
        case '(' => if (depth > 0) depth -= 1
        case c if depth == 0 && (c == 't' || c == 'T') && i >= 5 &&
            sql.substring(i - 5, i + 1).toUpperCase == "SELECT" &&
            mask(i - 5) &&
            (i - 5 == 0 || !isWordChar(sql.charAt(i - 6))) &&
            (i + 1 == sql.length || !isWordChar(sql.charAt(i + 1))) =>
          selAt = i - 5
        case _ =>
      }
      i -= 1
    }
    if (selAt < 0) return None
    // block end: unmatched ')', ';', or a set-op keyword after FROM
    depth = 0
    i = selAt
    var blockEnd = sql.length
    var seenFrom = false
    def wordAt(at: Int, w: String): Boolean =
      at + w.length <= sql.length &&
        sql.substring(at, at + w.length).toUpperCase == w &&
        (at == 0 || !isWordChar(sql.charAt(at - 1))) &&
        (at + w.length == sql.length || !isWordChar(sql.charAt(at + w.length)))
    while (i < sql.length && blockEnd == sql.length) {
      if (mask(i)) sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => if (depth > 0) depth -= 1 else blockEnd = i
        case ';' if depth == 0 => blockEnd = i
        case c if depth == 0 && c.isLetter =>
          if (!seenFrom && wordAt(i, "FROM")) seenFrom = true
          else if (seenFrom &&
              Seq("UNION", "INTERSECT", "EXCEPT", "MINUS").exists(wordAt(i, _)))
            blockEnd = i
        case _ =>
      }
      i += 1
    }
    val block = sql.substring(selAt, blockEnd)
    val sep = if (blockEnd < sql.length &&
      isWordChar(sql.charAt(blockEnd))) " " else ""
    rewriteQualifySelect(block).map(nb =>
      sql.substring(0, selAt) + nb + sep + sql.substring(blockEnd))
  }

  /** Restructure one SELECT block carrying a top-level QUALIFY. */
  private def rewriteQualifySelect(block: String): Option[String] = {
    val fromAt = findTopLevelKeyword(block, "FROM")
    if (fromAt < 0) return None
    var cols = block.substring("SELECT".length, fromAt).trim
    val distinct = """(?is)^DISTINCT\b""".r.findFirstIn(cols).isDefined
    if (distinct) cols = cols.substring("DISTINCT".length).trim
    val tail = block.substring(fromAt + 4)
    val qInTail = findQualifyKeyword(tail)
    if (qInTail < 0) return None
    // the found QUALIFY must be top-level within THIS block's tail
    if (findTopLevelKeyword(tail, "QUALIFY") != qInTail) return None
    val source = tail.substring(0, qInTail)
    val afterQ = tail.substring(qInTail + "QUALIFY".length)
    val (predText, order, limit) =
      splitTopLevelOrderLimit(afterQ.stripSuffix(";").trim)
    val pred = predText.trim
    if (pred.isEmpty) return None

    // select-list items → (inner item, outer reference, alias→expr)
    val Aliased = """(?is)^(.*\S)\s+AS\s+(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\s*$""".r
    val IdentPath = """(?is)^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$""".r
    val BareAlias = """(?is)^([A-Za-z_][A-Za-z0-9_.]*)\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
    val Star = """(?is)^(?:[A-Za-z_][A-Za-z0-9_]*\.)*\*$""".r
    val items = splitTopLevelCommas(cols).map(_.trim).filter(_.nonEmpty)
    if (items.exists(s => s != "*" && Star.findFirstIn(s).isDefined))
      return None // qualified star cannot survive the subquery
    val StarExcept = """(?is)^\*\s*EXCEPT\s*\(.*\)$""".r
    val aliasExpr = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val (innerItems, outerItems) = items.map {
      case "*" => ("*", "*") // EXCEPT list appended below
      case it @ StarExcept() => (it, "*") // inner already narrows; outer
                                          // only hides the helpers
      case it @ Aliased(expr, alias) if !alias.startsWith("`") =>
        if (expr.trim.toLowerCase != alias.toLowerCase)
          aliasExpr(alias) = expr.trim
        (it, alias)
      case it @ Aliased(_, alias) => (it, alias)
      case it @ IdentPath(_) => (it, it.substring(it.lastIndexOf('.') + 1))
      case it @ BareAlias(expr, alias) =>
        if (expr.trim.toLowerCase != alias.toLowerCase)
          aliasExpr(alias) = expr.trim
        (it, alias)
      case it =>
        val name = it.replace("`", "")
        (s"$it AS `$name`", s"`$name`")
    }.unzip

    // substitute select-list aliases (QUALIFY / its ORDER BY may
    // reference them; a subquery level cannot) — code runs only,
    // whole-word, never a function call or dotted path member
    def substAliases(text: String): String =
      aliasExpr.foldLeft(text) { case (t, (alias, expr)) =>
        val re = ("""(?i)(?<![\w.`])""" + java.util.regex.Pattern.quote(alias) +
          """(?![\w.`]|\s*\()""").r
        mapCode(t)(code => re.replaceAllIn(code,
          scala.util.matching.Regex.quoteReplacement(s"($expr)")))
      }

    val predInner = substAliases(pred)
    val lim = limit.map(" " + _.trim).getOrElse("")

    // ORDER BY through hidden helper columns (its expressions may not
    // be projected); under DISTINCT no helper can ride (it would widen
    // the distinct key), so items must be output columns/positions —
    // kept verbatim when they are, whole-block fallback when not
    val Item = """(?is)^(.*?)\s*(ASC|DESC)?\s*(NULLS\s+(?:FIRST|LAST))?\s*$""".r
    val (helperDefs, outerOrder) = order.map(_.trim).filter(_.nonEmpty) match {
      case Some(ordText) if !distinct =>
        // positional items (ORDER BY 1) must NOT become helper columns
        // (a literal 1 orders nothing) — the outer select preserves
        // the output column order, so positions pass through verbatim
        val its = splitTopLevelCommas(ordText).map(_.trim).filter(_.nonEmpty)
          .zipWithIndex.map { case (it, k) =>
            it match {
              case Item(e, dir, nulls) =>
                val suffix = Option(dir).map(" " + _).getOrElse("") +
                  Option(nulls).map(" " + _).getOrElse("")
                if (e.trim.forall(_.isDigit))
                  (None, s"${e.trim}$suffix")
                else
                  (Some((s"__graft_qo$k", s"${substAliases(e.trim)} AS __graft_qo$k")),
                    s"__graft_qo$k$suffix")
              case _ =>
                (Some((s"__graft_qo$k", s"${substAliases(it)} AS __graft_qo$k")),
                  s"__graft_qo$k")
            }
          }
        (its.flatMap(_._1), s" ORDER BY ${its.map(_._2).mkString(", ")}")
      case Some(ordText) =>
        // DISTINCT restricts ORDER BY to output columns, so the
        // original text rides verbatim on the outer select — but only
        // when every item demonstrably IS an output column (a name
        // from the select list, a position, or anything under a bare
        // `*`). Otherwise honor the documented fallback policy: leave
        // the whole block untouched so the user sees Spark's original
        // QUALIFY parse error, not an analysis error on rewritten text.
        val outNames = outerItems.map(_.replace("`", "").toLowerCase).toSet
        val allOutput = outNames.contains("*") ||
          splitTopLevelCommas(ordText).map(_.trim).filter(_.nonEmpty).forall {
            case Item(e, _, _) =>
              val b = e.trim.replace("`", "").toLowerCase
              b.forall(_.isDigit) || outNames.contains(b)
            case _ => false
          }
        if (!allOutput) return None
        (Nil, s" ORDER BY $ordText")
      case None => (Nil, "")
    }
    val helperNames = helperDefs.map(_._1) :+ "__graft_q"
    val outerCols = outerItems.map {
      case "*" => s"* EXCEPT (${helperNames.mkString(", ")})"
      case s => s
    }.mkString(", ")
    val innerCols = (innerItems ++ helperDefs.map(_._2) :+
      s"($predInner) AS __graft_q").mkString(", ")
    val distinctKw = if (distinct) "DISTINCT " else ""
    Some(s"SELECT $distinctKw$outerCols FROM (SELECT $innerCols FROM " +
      s"${source.trim}) __graft_qf WHERE __graft_q$outerOrder$lim")
  }

  // ----------------------------------------------------------------
  // GROUPS window frames (SQL:2011; DataFusion accepts them, Spark
  // ≤ 4.1 does not). `GROUPS BETWEEN a PRECEDING AND b FOLLOWING`
  // reduces exactly to a RANGE frame over dense_rank() — see
  // graft.ops.WindowOps. SQL cannot nest a window inside an OVER's
  // ORDER BY, so the enclosing SELECT is restructured:
  //
  //   SELECT cols FROM src [WHERE …] [WINDOW …] [ORDER BY …] [LIMIT n]
  //   → SELECT cols' FROM (SELECT *, DENSE_RANK() OVER (P, O) AS
  //        __graft_drK … FROM src [WHERE …]) __graft_gw
  //     [WINDOW …'] [ORDER BY …] [LIMIT n]
  //
  // where every GROUPS spec `(P O GROUPS f)` becomes
  // `(P ORDER BY __graft_drK RANGE f)` and one helper column is added
  // per distinct (P, O). WHERE stays inside (windows evaluate after
  // filtering, so semantics are unchanged). Scope: SELECT blocks
  // without top-level DISTINCT/GROUP BY/HAVING — a GROUPS window over
  // an aggregated SELECT would need the grouped projection inside the
  // subquery; those (rare) forms keep failing with Spark's original
  // parse error, exactly as before this rewrite.
  // ----------------------------------------------------------------
  private val GroupsBound =
    """(?:UNBOUNDED\s+PRECEDING|UNBOUNDED\s+FOLLOWING|CURRENT\s+ROW|\d+\s+PRECEDING|\d+\s+FOLLOWING)"""
  private val GroupsFrame =
    s"""(?is)\\bGROUPS\\s+(BETWEEN\\s+($GroupsBound)\\s+AND\\s+($GroupsBound)|($GroupsBound))\\s*$$""".r
  private val SpecParts =
    """(?is)^\s*(PARTITION\s+BY\s+.*?)?\s*(ORDER\s+BY\s+.*?)\s*$""".r

  private[sqlcompat] def rewriteGroupsFrames(sql: String): String = {
    var cur = sql
    var guard = 0
    var changed = true
    while (changed && guard < 8) {
      guard += 1
      rewriteOneGroupsBlock(cur) match {
        case Some(next) => cur = next
        case None => changed = false
      }
    }
    cur
  }

  /** Positions (start, end-exclusive) of `GROUPS` keywords in code
    * runs that begin a window frame clause.
    */
  private def findGroupsKeyword(sql: String): Option[Int] = {
    val mask = codeMask(sql)
    val G = """(?is)\bGROUPS\s+(BETWEEN\b|UNBOUNDED\b|CURRENT\b|\d)""".r
    G.findAllMatchIn(sql).map(_.start).find(mask(_))
  }

  /** isCode flag per character (string literals/quoted idents/comments
    * are false).
    */
  private def codeMask(sql: String): Array[Boolean] = {
    val mask = new Array[Boolean](sql.length)
    var offset = 0
    runs(sql).foreach { case (text, isCode) =>
      if (isCode) java.util.Arrays.fill(mask, offset, offset + text.length, true)
      offset += text.length
    }
    mask
  }

  /** Rewrite the SELECT block enclosing the first GROUPS frame; None
    * when there is nothing (safe) to rewrite.
    */
  private def rewriteOneGroupsBlock(sql: String): Option[String] = {
    val groupsAt = findGroupsKeyword(sql).getOrElse(return None)
    val mask = codeMask(sql)
    // the window spec is a paren group: scan back to its unmatched '('
    var depth = 0
    var i = groupsAt - 1
    var specOpen = -1
    while (i >= 0 && specOpen < 0) {
      if (mask(i)) sql.charAt(i) match {
        case ')' => depth += 1
        case '(' => if (depth > 0) depth -= 1 else specOpen = i
        case _ =>
      }
      i -= 1
    }
    if (specOpen < 0) return None
    // enclosing SELECT: nearest preceding SELECT, skipping balanced
    // groups. An unmatched '(' passed on the way is an expression
    // nesting the OVER (CAST(... OVER(...)), arithmetic parens) —
    // transparent for this search: a subquery's own SELECT would have
    // been met before its opening paren.
    depth = 0
    i = specOpen - 1
    var selAt = -1
    while (i >= 0 && selAt < 0) {
      if (mask(i)) sql.charAt(i) match {
        case ')' => depth += 1
        case '(' => if (depth > 0) depth -= 1
        case c if depth == 0 && (c == 't' || c == 'T') && i >= 5 &&
            sql.substring(i - 5, i + 1).toUpperCase == "SELECT" &&
            mask(i - 5) &&
            (i - 5 == 0 || !isWordChar(sql.charAt(i - 6))) &&
            (i + 1 == sql.length || !isWordChar(sql.charAt(i + 1))) =>
          selAt = i - 5
        case _ =>
      }
      i -= 1
    }
    if (selAt < 0) return None
    // block end: forward from SELECT at depth 0 until an unmatched
    // ')', a statement terminator, or a set-operation keyword — a
    // UNION/INTERSECT/EXCEPT branch or a ';' ends THIS select and
    // must stay outside the generated subquery
    depth = 0
    i = selAt
    var blockEnd = sql.length
    var seenFrom = false // set-op keywords only end the block after the
                         // FROM clause ("* EXCEPT (…)" in a select list
                         // must not be mistaken for the set operation)
    def wordAt(at: Int, w: String): Boolean =
      at + w.length <= sql.length &&
        sql.substring(at, at + w.length).toUpperCase == w &&
        (at == 0 || !isWordChar(sql.charAt(at - 1))) &&
        (at + w.length == sql.length || !isWordChar(sql.charAt(at + w.length)))
    while (i < sql.length && blockEnd == sql.length) {
      if (mask(i)) sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => if (depth > 0) depth -= 1 else blockEnd = i
        case ';' if depth == 0 => blockEnd = i
        case c if depth == 0 && c.isLetter =>
          if (!seenFrom && wordAt(i, "FROM")) seenFrom = true
          else if (seenFrom &&
              Seq("UNION", "INTERSECT", "EXCEPT", "MINUS").exists(wordAt(i, _)))
            blockEnd = i
        case _ =>
      }
      i += 1
    }
    val block = sql.substring(selAt, blockEnd)
    // the rewritten block is trimmed: re-separate it from a following
    // set-op keyword (")__graft_gw" + "UNION" must not fuse into one
    // identifier)
    val sep = if (blockEnd < sql.length &&
      isWordChar(sql.charAt(blockEnd))) " " else ""
    rewriteGroupsSelect(block).map(nb =>
      sql.substring(0, selAt) + nb + sep + sql.substring(blockEnd))
  }

  /** Restructure one SELECT block whose window specs use GROUPS. */
  private def rewriteGroupsSelect(block: String): Option[String] = {
    val fromAt = findTopLevelKeyword(block, "FROM")
    if (fromAt < 0) return None
    val cols = block.substring("SELECT".length, fromAt)
    if ("""(?is)^\s*DISTINCT\b""".r.findFirstIn(cols).isDefined) return None
    val tail = block.substring(fromAt + 4)
    if (findTopLevelKeyword(tail, "GROUP") >= 0 ||
        findTopLevelKeyword(tail, "HAVING") >= 0) return None
    val windowAt = findTopLevelKeyword(tail, "WINDOW")
    val orderAt = findTopLevelKeyword(tail, "ORDER")
    val limitAt = findTopLevelKeyword(tail, "LIMIT")
    val innerEnd = Seq(windowAt, orderAt, limitAt).filter(_ >= 0)
      .reduceOption(_ min _).getOrElse(tail.length)
    val innerSource = tail.substring(0, innerEnd)
    val outerTail = tail.substring(innerEnd)

    // one dense_rank helper per distinct (partition, order) pair;
    // definitions keep the ORIGINAL spec text (the key is only
    // whitespace/case-normalized for dedup)
    val helpers = scala.collection.mutable.LinkedHashMap.empty[(String, String), String]
    val helperSrc = ListBuffer.empty[String]
    def helperFor(partition: String, order: String): String = {
      val key = (partition.trim.toLowerCase.replaceAll("\\s+", " "),
        order.trim.toLowerCase.replaceAll("\\s+", " "))
      helpers.getOrElse(key, {
        val a = s"__graft_dr${helpers.size}"
        helpers(key) = a
        val sep = if (partition.trim.nonEmpty) partition.trim + " " else ""
        helperSrc += s"DENSE_RANK() OVER ($sep${order.trim}) AS $a"
        a
      })
    }
    var sawGroups = false
    // rewrite every `( … GROUPS frame )` window spec in a text chunk
    def rewriteSpecsIn(text: String): Option[String] = {
      val sb = new StringBuilder(text)
      var changed = true
      while (changed) {
        changed = false
        val t = sb.toString
        val mask = codeMask(t)
        val gAt = """(?is)\bGROUPS\s+(BETWEEN\b|UNBOUNDED\b|CURRENT\b|\d)""".r
          .findAllMatchIn(t).map(_.start).find(mask(_))
        gAt.foreach { g =>
          // back to the spec's '('
          var depth = 0
          var i = g - 1
          var open = -1
          while (i >= 0 && open < 0) {
            if (mask(i)) t.charAt(i) match {
              case ')' => depth += 1
              case '(' => if (depth > 0) depth -= 1 else open = i
              case _ =>
            }
            i -= 1
          }
          if (open < 0) return None
          val close = findBalancedClose(t, open)
          if (close < 0) return None
          val spec = t.substring(open + 1, close)
          val gInSpec = g - open - 1
          val frameText = spec.substring(gInSpec)
          val fm = GroupsFrame.findFirstMatchIn(frameText).getOrElse(return None)
          val frame = Option(fm.group(4)) match {
            case Some(single) => s"BETWEEN $single AND CURRENT ROW"
            case None => s"BETWEEN ${fm.group(2)} AND ${fm.group(3)}"
          }
          val pre = spec.substring(0, gInSpec)
          val pm = SpecParts.findFirstMatchIn(pre).getOrElse(return None)
          val partition = Option(pm.group(1)).getOrElse("")
          val order = Option(pm.group(2)).getOrElse(return None)
          val alias = helperFor(partition, order)
          val sep = if (partition.trim.nonEmpty) partition.trim + " " else ""
          sb.replace(open + 1, close,
            s"${sep}ORDER BY $alias RANGE $frame")
          sawGroups = true
          changed = true
        }
      }
      Some(sb.toString)
    }

    val newCols = rewriteSpecsIn(cols).getOrElse(return None)
    val newOuterTail = rewriteSpecsIn(outerTail).getOrElse(return None)
    if (!sawGroups || helpers.isEmpty) return None
    val helperDefs = helperSrc.mkString(", ")
    // a bare star in the outer list must not leak the helper columns;
    // a QUALIFIED star (a.*) cannot survive the subquery (its
    // qualifier is gone and widening it to * would silently change
    // the projection) — leave those queries to Spark's original error
    val exceptList = helpers.values.mkString(", ")
    val rawItems = splitTopLevelCommas(newCols).map(_.trim)
    if (rawItems.exists(s => s != "*" && s.endsWith(".*"))) return None
    val outItems = rawItems.map {
      case "*" => s"* EXCEPT ($exceptList)"
      case s => s
    }
    Some(s"SELECT ${outItems.mkString(", ")} FROM (SELECT *, $helperDefs FROM " +
      s"${innerSource.trim}) __graft_gw ${newOuterTail.trim}".trim)
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
