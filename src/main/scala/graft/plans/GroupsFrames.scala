package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL:2011 GROUPS window frames as a pre-parse text rewrite.
  *
  * Spark 4.1.2's parser has no GROUPS frame mode (the reference carries
  * the enum — datafusion.proto:651-676 — though its own tests never
  * exercise it), but GROUPS semantics compose exactly: `dense_rank()`
  * over the same (partition, order) assigns each peer group one integer,
  * and a RANGE frame over that integer counts GROUPS. q_window_groups_emul
  * proved the composition against the DuckDB oracle; this rewrite makes
  * the SQL TEXT spelling run verbatim —
  *
  * {{{
  *   SELECT k, sum(v) OVER (PARTITION BY p ORDER BY k
  *                          GROUPS BETWEEN 2 PRECEDING AND CURRENT ROW)
  *   FROM t  ORDER BY k
  * }}}
  *
  * becomes
  *
  * {{{
  *   SELECT k, sum(v) OVER (PARTITION BY p ORDER BY __gdr0
  *                          RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
  *   FROM (SELECT *, DENSE_RANK() OVER (PARTITION BY p ORDER BY k)
  *           AS __gdr0 FROM t) __groups_rw
  *   ORDER BY k
  * }}}
  *
  * Scope (unsupported shapes fail LOUDLY with the reason — never parse
  * to wrong semantics): each `SELECT ... FROM ...` block is rewritten
  * independently — the outermost statement AND, since round 14, every
  * subquery / CTE body (the rewriter recurses into parenthesized
  * SELECT/WITH spans before handling the outer block, so a GROUPS frame
  * inside a CTE runs instead of refusing). Within the block that carries
  * the frame: no DISTINCT, GROUP BY, HAVING, set operations, or star
  * projection (`*` / `alias.*`) at top level, because `SELECT *` hoisting
  * through those changes meaning (a star would silently absorb the
  * synthetic `__gdr` rank columns). Bounds:
  * UNBOUNDED/`n` PRECEDING, CURRENT ROW, `n` FOLLOWING/UNBOUNDED
  * FOLLOWING — the full BETWEEN grid. The scanner is quote-aware
  * (`'…'`, `"…"`, backticks) and paren-depth-aware, so identifiers or
  * literals containing the keywords cannot confuse it.
  *
  * Wired into every Engine/wire-server session by
  * [[graft.GraftExtensions]] via `injectParser` ([[GroupsFrameParser]]);
  * plain sessions can call [[GroupsFrames.rewrite]] directly.
  */
object GroupsFrames {

  /** Cheap guard: "GROUPS" only counts as a frame when followed by a
    * frame token (BETWEEN / UNBOUNDED / CURRENT / a number) — `AS groups`
    * stays an ordinary identifier. */
  def hasGroupsFrame(sql: String): Boolean =
    java.util.regex.Pattern
      .compile("(?is)\\bGROUPS\\s+(BETWEEN|UNBOUNDED|CURRENT|\\d)")
      .matcher(sql).find()

  private def fail(why: String, sql: String): Nothing =
    throw new IllegalArgumentException(
      s"GROUPS-frame rewrite: unsupported statement shape ($why). " +
        s"Supported: GROUPS frames in the outermost select list of a " +
        s"SELECT ... FROM ... block (optional WITH prefix / trailing " +
        s"ORDER BY / LIMIT), no top-level DISTINCT / GROUP BY / HAVING / " +
        s"set ops. Statement: $sql")

  /** Character classes the scanner treats as quote delimiters. Backslash
    * escapes inside single quotes are honored; doubled quotes ('' "" )
    * read as close-then-reopen, which is equivalent for depth purposes. */
  private val Quotes = Set('\'', '"', '`')

  /** Index of the char closing the quote opened at `i` (or end). */
  private def skipQuote(s: String, i: Int): Int = {
    val q = s.charAt(i)
    var j = i + 1
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == '\\' && q == '\'') j += 1
      else if (c == q) return j
      j += 1
    }
    s.length - 1
  }

  /** Index of the last char of the comment starting at `i`, or -1 when
    * no comment starts there. `--` runs to end of line, bracketed
    * comments to the closing `*`/`/` — an apostrophe inside either
    * ("-- user's total") must not open a phantom quote. */
  private def skipComment(s: String, i: Int): Int = {
    if (s.startsWith("--", i)) {
      val nl = s.indexOf('\n', i)
      if (nl < 0) s.length - 1 else nl
    } else if (s.startsWith("/*", i)) {
      val end = s.indexOf("*/", i + 2)
      if (end < 0) s.length - 1 else end + 1
    } else -1
  }

  /** True when the paren opened at `open` starts a subquery (first token
    * inside is SELECT, or WITH — a parenthesized CTE'd derived table) —
    * those spans are OPAQUE to the scanner: a GROUPS frame inside one
    * belongs to a different select block and must not be rewritten
    * against this block's dense_rank column. */
  private def startsSubquery(s: String, open: Int): Boolean = {
    var j = open + 1
    // skip whitespace AND comments — "( /* hint */ SELECT ..." is still
    // a subquery; the scanner is comment-aware everywhere else, so this
    // probe must be too (round-13 review)
    var moved = true
    while (moved) {
      moved = false
      while (j < s.length && s.charAt(j).isWhitespace) { j += 1; moved = true }
      val cm = if (j < s.length) skipComment(s, j) else -1
      if (cm >= 0) { j = cm + 1; moved = true }
    }
    def tok(w: String): Boolean =
      s.regionMatches(true, j, w, 0, w.length) &&
        (j + w.length >= s.length ||
          (!s.charAt(j + w.length).isLetterOrDigit && s.charAt(j + w.length) != '_'))
    tok("SELECT") || tok("WITH")
  }

  /** Index of the ')' matching the '(' at `open`, quote- and
    * comment-aware. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      val cm = skipComment(s, i)
      if (cm >= 0) i = cm
      else if (Quotes(c)) i = skipQuote(s, i)
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    s.length - 1 // unbalanced; the real parser will say so
  }

  /** Visit every character of THIS select block with its paren depth:
    * quoted spans, comments, and subquery parens are skipped wholesale,
    * so a visited position is guaranteed to belong to the outer
    * statement, whatever its expression-paren depth
    * (CAST(... OVER (...) ...)). */
  private def scan(s: String)(f: (Int, Int) => Unit): Unit = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val cm = skipComment(s, i)
      if (cm >= 0) i = cm
      else if (Quotes(c)) i = skipQuote(s, i)
      else if (c == '(' && startsSubquery(s, i)) i = matchParen(s, i)
      else if (c == '(') { f(i, depth); depth += 1 }
      else if (c == ')') { depth -= 1; f(i, depth) }
      else f(i, depth)
      i += 1
    }
  }

  /** Start indexes of word-boundary, case-insensitive `word` occurrences
    * at paren depth 0, outside quotes and subqueries. `word` may be a
    * regex fragment (multi-word keywords). */
  private def topLevel(s: String, word: String): Seq[Int] =
    keyword(s, word, topOnly = true)

  /** Like [[topLevel]] but at ANY expression depth (still outside quotes
    * and subqueries) — where OVER clauses live. */
  private def visible(s: String, word: String): Seq[Int] =
    keyword(s, word, topOnly = false)

  private def keyword(s: String, word: String, topOnly: Boolean): Seq[Int] = {
    val p = java.util.regex.Pattern.compile("(?is)\\b" + word + "\\b")
    val m = p.matcher(s)
    val starts = Seq.newBuilder[Int]
    while (m.find()) starts += m.start()
    val all = starts.result()
    if (all.isEmpty) return Nil
    val ok = scala.collection.mutable.Set[Int]()
    val want = all.toSet
    scan(s)((i, d) => if ((d == 0 || !topOnly) && want(i)) ok += i)
    all.filter(ok)
  }

  private val BoundLo =
    "(UNBOUNDED\\s+PRECEDING|\\d+\\s+PRECEDING|CURRENT\\s+ROW|\\d+\\s+FOLLOWING)"
  private val BoundHi =
    "(UNBOUNDED\\s+FOLLOWING|\\d+\\s+PRECEDING|CURRENT\\s+ROW|\\d+\\s+FOLLOWING)"
  private val WindowBody = java.util.regex.Pattern.compile(
    "(?is)^\\s*(?:PARTITION\\s+BY\\s+(.+?)\\s+)?ORDER\\s+BY\\s+(.+?)\\s*" +
      "GROUPS\\s+BETWEEN\\s+" + BoundLo + "\\s+AND\\s+" + BoundHi + "\\s*$")
  private val BareWindow = java.util.regex.Pattern.compile(
    "(?is)^\\s*(?:PARTITION\\s+BY\\s+(.+?)\\s+)?ORDER\\s+BY\\s+(.+?)\\s*$")

  private case class Spec(partition: Option[String], order: String, alias: String)

  /** Normalized (partition, order) window identity — two OVER clauses
    * with the same key share one synthetic rank / one cells subquery. */
  private def normKey(partition: Option[String], order: String): String =
    partition.map(_.toLowerCase.replaceAll("\\s+", " ")).getOrElse("") +
      "|" + order.toLowerCase.replaceAll("\\s+", " ")

  /** (start of OVER, open-paren index, close-paren index) for every OVER
    * clause visible in this select block. */
  private def overSpans(body: String): Seq[(Int, Int, Int)] = {
    val overPat = java.util.regex.Pattern.compile("(?is)OVER\\s*\\(")
    visible(body, "OVER")
      .filter { i =>
        val m = overPat.matcher(body); m.region(i, body.length); m.lookingAt()
      }
      .map { i =>
        val open = body.indexOf('(', i)
        (i, open, matchParen(body, open))
      }
  }

  /** True when the select list carries a top-level projection star
    * (`*` / `alias.*`) — a shape both rewrite paths must refuse, since
    * their synthetic columns would silently join the star's expansion.
    * A projection star is a depth-0 `*` whose next visible depth-0
    * character is `,` or end-of-list; a multiplication star is always
    * followed by an operand (`a * b`, `2 * (x+y)`). */
  private def hasStarProjection(selectPart: String): Boolean = {
    var starProj = false
    var prevWasStar = false
    scan(selectPart) { (i, d) =>
      val ch = selectPart.charAt(i)
      if (!ch.isWhitespace) {
        if (prevWasStar && ch == ',') starProj = true
        prevWasStar = d == 0 && ch == '*'
      }
    }
    starProj || prevWasStar // trailing `*` = last select item
  }

  /** close-paren index -> matching open-paren index for every
    * EXPRESSION paren visible to [[scan]] (quoted spans, comments, and
    * subquery parens are opaque, same as everywhere else). */
  private def parenPairs(s: String): Map[Int, Int] = {
    val stack = scala.collection.mutable.Stack[Int]()
    val m = Map.newBuilder[Int, Int]
    scan(s) { (i, _) =>
      s.charAt(i) match {
        case '(' => stack.push(i)
        case ')' => if (stack.nonEmpty) m += (i -> stack.pop())
        case _   => ()
      }
    }
    m.result()
  }

  /** Split a balanced expression-list fragment at its top-level commas
    * (outside quotes/comments/parens/subqueries). */
  private def splitTop(frag: String): Seq[String] = {
    val cuts = Seq.newBuilder[Int]
    scan(frag)((i, d) => if (d == 0 && frag.charAt(i) == ',') cuts += i)
    val bounds = (-1 +: cuts.result()) :+ frag.length
    bounds.sliding(2).collect { case Seq(a, b) => frag.substring(a + 1, b) }.toSeq
  }

  /** Split one ORDER BY item into (expression, direction suffix) where
    * the suffix keeps any `ASC|DESC [NULLS FIRST|LAST]` text verbatim. */
  private def parseOrderItem(item: String): (String, String) = {
    var e = item.trim
    var suffix = ""
    for (m <- "(?is)\\s+NULLS\\s+(FIRST|LAST)\\s*$".r.findFirstMatchIn(e)) {
      suffix = e.substring(m.start).trim; e = e.substring(0, m.start)
    }
    for (m <- "(?is)\\s+(ASC|DESC)\\s*$".r.findFirstMatchIn(e)) {
      suffix = (e.substring(m.start).trim + " " + suffix).trim
      e = e.substring(0, m.start)
    }
    (e.trim, suffix)
  }

  /** Pre-pass: recursively rewrite GROUPS frames inside every
    * subquery/CTE-body paren (the spans [[scan]] treats as opaque), so a
    * frame in a CTE body or derived table runs instead of refusing. Each
    * parenthesized SELECT/WITH block is an independent statement with its
    * own FROM, so [[rewrite]] applies to it verbatim; unsupported shapes
    * inside still fail loudly through the recursive call. */
  private def rewriteSubqueries(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      val cm = skipComment(sql, i)
      if (cm >= 0) { sb.append(sql.substring(i, cm + 1)); i = cm + 1 }
      else if (Quotes(c)) {
        val e = skipQuote(sql, i); sb.append(sql.substring(i, e + 1)); i = e + 1
      } else if (c == '(' && startsSubquery(sql, i)) {
        val close = matchParen(sql, i)
        if (close < sql.length && sql.charAt(close) == ')') {
          sb.append('(').append(rewrite(sql.substring(i + 1, close))).append(')')
          i = close + 1
        } else { // unbalanced — the real parser owns the error
          sb.append(sql.substring(i)); i = sql.length
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val DecompFns = Set("SUM", "COUNT", "MIN", "MAX")

  /** Peer-group COLLAPSE rewrite (round-16 verdict item #2) — the scale
    * path for DECOMPOSABLE GROUPS-frame aggregates. A GROUPS-frame
    * aggregate's value depends only on the peer-group KEY (every row of
    * a peer group sees the same frame), so instead of the general
    * two-window form — which window-sorts the full corpus with
    * parallelism bounded by the PARTITION BY key's cardinality (3 sort
    * tasks forever on a 3-value key; 7.5× at 10× data) — the statement
    * collapses to: per-(partition, order)-cell partial aggregates
    * (map-side combine to a model-sized frame), dense_rank + the RANGE
    * window over the CELLS, and an equi-join back on the peer keys
    * (null-safe, so NULL order/partition keys still pair with their
    * cell; AQE broadcasts the cells side when small). Same-keyed bare
    * `DENSE_RANK()` calls route to the cells' rank column too
    * (dense_rank of distinct cells ≡ dense_rank over their member
    * rows), so no corpus-scale window remains. This is exactly the plan
    * q_window_groups_emul hand-builds; GroupsFramesSpec pins the
    * composition ≡ collapse across the bounds grid.
    *
    * Decomposition per function: SUM → SUM of cell SUMs; COUNT → SUM of
    * cell COUNTs (COALESCE 0 on an empty frame, matching COUNT's
    * never-NULL contract); MIN/MAX → MIN/MAX of cell MIN/MAX. AVG and
    * every other aggregate fall back to the general two-window form:
    * AVG's type-exact decomposition (SUM/COUNT) depends on the engine's
    * decimal-typing rules, which a pre-parse text rewrite cannot see.
    * Values are identical to the row-level window; intermediate DECIMAL
    * precision may widen (SUM-of-SUMs), never the values.
    *
    * Returns None — falling back to the general rewrite, which also
    * owns every loud-failure shape — when any GROUPS span is not a
    * plain decomposable call (DISTINCT/FILTER modifiers, multi-arg,
    * non-decomposable fn), or the statement shape is outside the
    * supported SELECT...FROM grid. The collapse evaluates the FROM core
    * twice (outer scan + cells scan, both column-pruned) — two cheap
    * scans for zero corpus sorts; a nondeterministic FROM core (rand())
    * would see independent draws, same as re-running the statement. */
  private def tryCollapse(
      prefix: String, body: String, spans: Seq[(Int, Int, Int)]): Option[String] = {
    val pairs = parenPairs(body)

    /** The plain `FN(args)` call whose result the OVER at `overStart`
      * windows: (fn name start, NAME, arg text). None when anything but
      * whitespace sits between the call and OVER (FILTER clauses,
      * comments — not collapsible). */
    def fnBefore(overStart: Int): Option[(Int, String, String)] = {
      var j = overStart - 1
      while (j >= 0 && body.charAt(j).isWhitespace) j -= 1
      if (j < 0 || body.charAt(j) != ')') return None
      val open = pairs.getOrElse(j, return None)
      var k = open - 1
      while (k >= 0 && body.charAt(k).isWhitespace) k -= 1
      val end = k
      while (k >= 0 && (body.charAt(k).isLetterOrDigit || body.charAt(k) == '_')) k -= 1
      if (end == k || (k >= 0 && body.charAt(k) == '.')) return None
      Some((k + 1, body.substring(k + 1, end + 1).toUpperCase,
        body.substring(open + 1, j)))
    }

    case class CSpec(part: Seq[String], ord: Seq[(String, String)])
    case class GAgg(fnStart: Int, close: Int, fn: String, arg: String,
        lo: String, hi: String, key: String)
    val specs = scala.collection.mutable.LinkedHashMap[String, CSpec]()
    val gaggs = scala.collection.mutable.ArrayBuffer[GAgg]()
    val plain = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    spans.foreach { case (i, open, close) =>
      val win = body.substring(open + 1, close)
      if (hasGroupsFrame(win)) {
        val m = WindowBody.matcher(win)
        if (!m.matches()) return None
        val partTxt = Option(m.group(1)).map(_.trim)
        val ordTxt = m.group(2).trim
        val (fnStart, name, arg) = fnBefore(i).getOrElse(return None)
        if (!DecompFns(name)) return None
        if (arg.matches("(?is)\\s*DISTINCT\\b[\\s\\S]*")) return None
        val key = normKey(partTxt, ordTxt)
        specs.getOrElseUpdate(key, CSpec(
          partTxt.map(p => splitTop(p).map(_.trim)).getOrElse(Nil),
          splitTop(ordTxt).map(parseOrderItem)))
        gaggs += GAgg(fnStart, close,
          name, arg,
          m.group(3).replaceAll("\\s+", " ").toUpperCase,
          m.group(4).replaceAll("\\s+", " ").toUpperCase, key)
      } else plain += ((i, open, close))
    }
    if (gaggs.isEmpty) return None
    // Bare same-keyed DENSE_RANK calls ride the cells' rank column; any
    // other plain window simply stays on the (unwrapped) outer block.
    case class DRoute(fnStart: Int, close: Int, key: String)
    val droutes = scala.collection.mutable.ArrayBuffer[DRoute]()
    plain.foreach { case (i, open, close) =>
      val win = body.substring(open + 1, close)
      val framed = java.util.regex.Pattern
        .compile("(?is)\\b(ROWS|RANGE|GROUPS)\\b").matcher(win).find()
      fnBefore(i) match {
        case Some((fnStart, "DENSE_RANK", arg)) if arg.trim.isEmpty && !framed =>
          val m = BareWindow.matcher(win)
          if (m.matches()) {
            val key = normKey(Option(m.group(1)).map(_.trim), m.group(2).trim)
            if (specs.contains(key)) droutes += DRoute(fnStart, close, key)
          }
        case _ => ()
      }
    }

    // Statement surgery: same supported grid as the general path (which
    // owns the loud failures — None here lands there).
    val fromIdx = topLevel(body, "FROM").headOption.getOrElse(return None)
    val selectPart = body.substring(0, fromIdx)
    if (topLevel(selectPart, "DISTINCT").nonEmpty) return None
    if (hasStarProjection(selectPart)) return None
    val fromTail = body.substring(fromIdx + 4)
    Seq("GROUP\\s+BY", "HAVING", "UNION", "INTERSECT", "EXCEPT", "WINDOW")
      .foreach(k => if (topLevel(fromTail, k).nonEmpty) return None)
    val tailIdx = (topLevel(fromTail, "ORDER\\s+BY") ++
      topLevel(fromTail, "LIMIT") ++ topLevel(fromTail, "OFFSET")).sorted.headOption
    val (fromCore, outerTail) = tailIdx match {
      case Some(ix) => (fromTail.substring(0, ix), fromTail.substring(ix))
      case None     => (fromTail, "")
    }
    val whereIdx = topLevel(fromCore, "WHERE").headOption
    val (relPart, whereTail) = whereIdx match {
      case Some(ix) => (fromCore.substring(0, ix), fromCore.substring(ix))
      case None     => (fromCore, "")
    }

    val specIdx = specs.keys.zipWithIndex.toMap
    def cellsAlias(key: String) = s"__gcells${specIdx(key)}"
    // per-spec ordinal of each collapsed aggregate
    val gaggIdx: Map[GAgg, Int] = gaggs.groupBy(_.key).values
      .flatMap(_.zipWithIndex).toMap

    // Splices: replace [fnStart, close] with the cells-column reference.
    // Valid SQL puts window calls only in the select list or the outer
    // ORDER BY tail — anything else (or a span straddling FROM) bails.
    case class Spl(s: Int, e: Int, t: String)
    val tailAbs = fromIdx + 4 + tailIdx.getOrElse(fromTail.length)
    val spl = (gaggs.map(g =>
        Spl(g.fnStart, g.close, s"${cellsAlias(g.key)}.__gw${specIdx(g.key)}_${gaggIdx(g)}")) ++
      droutes.map(d =>
        Spl(d.fnStart, d.close, s"${cellsAlias(d.key)}.__gdrc${specIdx(d.key)}")))
      .sortBy(_.s)
    if (!spl.forall(p => p.e < fromIdx || p.s >= tailAbs)) return None
    def splice(frag: String, off: Int): String = {
      val sb = new StringBuilder
      var cur = 0
      spl.filter(p => p.s >= off && p.e < off + frag.length).foreach { p =>
        sb.append(frag.substring(cur, p.s - off)).append(p.t)
        cur = p.e - off + 1
      }
      sb.append(frag.substring(cur)).toString
    }

    val joins = specs.map { case (key, sp) =>
      val k = specIdx(key)
      val gs = gaggs.filter(_.key == key)
      val gps = sp.part.zipWithIndex.map { case (p, j) => s"($p) AS __gp${k}_$j" }
      val gos = sp.ord.zipWithIndex.map { case ((o, _), j) => s"($o) AS __go${k}_$j" }
      val cas = gs.map(g => s"${g.fn}(${g.arg}) AS __ca${k}_${gaggIdx(g)}")
      val nKeys = sp.part.size + sp.ord.size
      // GROUP BY ordinals: the key exprs are select items 1..nKeys, so
      // no expression text is re-parsed twice (groupByOrdinal is on by
      // default and every graft session keeps it)
      val inner = s"SELECT ${(gps ++ gos ++ cas).mkString(", ")} FROM " +
        s"$relPart $whereTail GROUP BY ${(1 to nKeys).mkString(", ")}"
      val partSql =
        if (sp.part.isEmpty) ""
        else "PARTITION BY " + sp.part.indices.map(j => s"__gp${k}_$j").mkString(", ") + " "
      val ordSql = sp.ord.zipWithIndex.map { case ((_, sfx), j) =>
        s"__go${k}_$j" + (if (sfx.nonEmpty) s" $sfx" else "")
      }.mkString(", ")
      val mid = s"SELECT *, DENSE_RANK() OVER (${partSql}ORDER BY $ordSql) " +
        s"AS __gdrc$k FROM ($inner) __gci$k"
      val gws = gs.map { g =>
        val w = s"${partSql}ORDER BY __gdrc$k RANGE BETWEEN ${g.lo} AND ${g.hi}"
        val cell = s"__ca${k}_${gaggIdx(g)}"
        val aggd = g.fn match {
          case "SUM"   => s"SUM($cell) OVER ($w)"
          case "COUNT" => s"COALESCE(SUM($cell) OVER ($w), 0)"
          case "MIN"   => s"MIN($cell) OVER ($w)"
          case "MAX"   => s"MAX($cell) OVER ($w)"
        }
        s"$aggd AS __gw${k}_${gaggIdx(g)}"
      }
      val top = s"SELECT *, ${gws.mkString(", ")} FROM ($mid) __gcm$k"
      val on = (sp.part.zipWithIndex.map { case (p, j) =>
          s"($p) <=> ${cellsAlias(key)}.__gp${k}_$j"
        } ++ sp.ord.zipWithIndex.map { case ((o, _), j) =>
          s"($o) <=> ${cellsAlias(key)}.__go${k}_$j"
        }).mkString(" AND ")
      s"JOIN ($top) ${cellsAlias(key)} ON $on"
    }.mkString(" ")

    val selectPart2 = splice(selectPart, 0)
    val outerTail2 = splice(outerTail, tailAbs)
    Some(s"$prefix$selectPart2 FROM $relPart $joins $whereTail $outerTail2")
  }

  /** Rewrite GROUPS frames into the dense_rank composition; identity for
    * statements without a GROUPS frame. Throws on unsupported shapes.
    * Recurses into subquery and CTE-body select blocks first — each block
    * is rewritten against its own dense_rank column — then handles the
    * outermost block. Decomposable aggregates take [[tryCollapse]]'s
    * peer-group cells form instead of the general two-window form. */
  def rewrite(sql: String): String = {
    if (!hasGroupsFrame(sql)) return sql
    val pre = rewriteSubqueries(sql)
    // WITH prefix: CTE bodies are parenthesized, so the statement's own
    // SELECT is the first depth-0 one. No top-level SELECT at all (DDL,
    // a comment that tripped the guard): nothing to rewrite — pass
    // through, the real parser owns the statement.
    val selStarts = topLevel(pre, "SELECT")
    if (selStarts.isEmpty) return pre
    val prefix = pre.substring(0, selStarts.head)
    val body = pre.substring(selStarts.head)

    // Locate every `OVER (` span belonging to THIS select block (any
    // expression depth — CAST(sum(x) OVER (...) AS ...) is typical —
    // but never inside a subquery) and match its parens.
    val spans = overSpans(body)

    // Scale path first: decomposable aggregates collapse to the
    // peer-group cells form; anything it can't take falls through to
    // the general two-window rewrite below (which owns loud failures).
    tryCollapse(prefix, body, spans).foreach { out =>
      val leftover = overSpans(out.substring(prefix.length))
        .exists { case (_, o, c) => hasGroupsFrame(out.substring(o + 1, c)) }
      if (leftover) fail("GROUPS frame left unrewritten after collapse", sql)
      return out
    }

    val specs = scala.collection.mutable.LinkedHashMap[String, Spec]()
    var rewrittenAny = false
    val sb = new StringBuilder
    var cursor = 0
    spans.foreach { case (i, open, close) =>
      val win = body.substring(open + 1, close)
      if (hasGroupsFrame(win)) {
        val m = WindowBody.matcher(win)
        if (!m.matches())
          fail("GROUPS frame window must be PARTITION BY ... ORDER BY ... " +
            "GROUPS BETWEEN <bound> AND <bound>", sql)
        val part = Option(m.group(1)).map(_.trim)
        val order = m.group(2).trim
        val (lo, hi) = (m.group(3).replaceAll("\\s+", " ").toUpperCase,
          m.group(4).replaceAll("\\s+", " ").toUpperCase)
        val key = normKey(part, order)
        val spec = specs.getOrElseUpdate(key,
          Spec(part, order, s"__gdr${specs.size}"))
        sb.append(body.substring(cursor, i))
        val partSql = spec.partition.map(p => s"PARTITION BY $p ").getOrElse("")
        sb.append(s"OVER (${partSql}ORDER BY ${spec.alias} RANGE BETWEEN $lo AND $hi)")
        cursor = close + 1
        rewrittenAny = true
      }
    }
    sb.append(body.substring(cursor))
    // No OVER clause of THIS select block carries a GROUPS frame: the
    // token was an identifier ("WHERE groups BETWEEN 1 AND 5"), or the
    // frames all lived in subqueries/CTE bodies and the pre-pass already
    // rewrote them — return the pre-pass text and let the real parser
    // own whatever remains. Only statements we PARTIALLY rewrote may
    // never fall through (checked after surgery below).
    if (!rewrittenAny) return pre
    val newBody = sb.toString

    // Statement surgery: SELECT <list> FROM <core> [ORDER BY/LIMIT tail].
    val fromIdx = topLevel(newBody, "FROM").headOption
      .getOrElse(fail("no top-level FROM", sql))
    val selectPart = newBody.substring(0, fromIdx)
    if (topLevel(selectPart, "DISTINCT").nonEmpty)
      fail("SELECT DISTINCT with a GROUPS frame", sql)
    // Star projections: the wrapper subquery appends synthetic __gdr
    // columns, so a top-level `*` (or `alias.*`) would silently expand
    // to include them — a schema change, violating the never-misparse
    // contract.
    if (hasStarProjection(selectPart))
      fail("star projection (`*` / `alias.*`) with a GROUPS frame — the " +
        "rewrite wrapper adds synthetic __gdr columns that the star would " +
        "silently absorb; list the columns explicitly", sql)
    val fromTail = newBody.substring(fromIdx + 4)
    Seq("GROUP\\s+BY", "HAVING", "UNION", "INTERSECT", "EXCEPT", "WINDOW")
      .foreach(k => if (topLevel(fromTail, k).nonEmpty)
        fail(s"top-level ${k.replace("\\s+", " ")} with a GROUPS frame", sql))
    val tailIdx = (topLevel(fromTail, "ORDER\\s+BY") ++
      topLevel(fromTail, "LIMIT") ++ topLevel(fromTail, "OFFSET")).sorted.headOption
    val (fromCore, outerTail) = tailIdx match {
      case Some(ix) => (fromTail.substring(0, ix), fromTail.substring(ix))
      case None     => (fromTail, "")
    }
    val ranks = specs.values.map { sp =>
      val partSql = sp.partition.map(p => s"PARTITION BY $p ").getOrElse("")
      s"DENSE_RANK() OVER (${partSql}ORDER BY ${sp.order}) AS ${sp.alias}"
    }.mkString(", ")
    // Wrapper alias: hoisting FROM into a subquery hides the original
    // relation's name, so `t.k` in the select list would stop resolving.
    // For the common single-relation FROM, reuse its visible name
    // (explicit alias if given, else the table name's last segment) as
    // the wrapper alias — qualified references keep working. Joins /
    // derived tables fall back to a synthetic alias; table-qualified
    // references through THOSE are out of scope (Spark raises
    // UNRESOLVED_COLUMN loudly).
    val SingleRel = "(?is)^\\s*([\\w.]+)(?:\\s+(?:AS\\s+)?(\\w+))?\\s*$".r
    val relPart = topLevel(fromCore, "WHERE").headOption
      .map(fromCore.substring(0, _)).getOrElse(fromCore)
    val wrapAlias = relPart match {
      case SingleRel(tbl, alias) =>
        Option(alias).getOrElse(tbl.split('.').last)
      case _ => "__groups_rw"
    }
    val out = s"$prefix$selectPart FROM (SELECT *, $ranks FROM $fromCore) $wrapAlias $outerTail"
    // A GROUPS frame surviving in a VISIBLE OVER clause of the output
    // means the surgery left work behind — fail loudly. (Plain
    // `hasGroupsFrame(out)` would false-positive on an identifier named
    // `groups` next to BETWEEN elsewhere in the statement; buried
    // subquery frames pass through for the real parser to reject.)
    val leftover = overSpans(out.substring(selStarts.head))
      .exists { case (_, o, c) => hasGroupsFrame(out.substring(o + 1, c)) }
    if (leftover)
      fail("GROUPS frame left unrewritten after surgery", sql)
    out
  }
}

/** Delegating [[ParserInterface]] that applies [[GroupsFrames.rewrite]]
  * to statement text before the real parser sees it. Injected by
  * [[graft.GraftExtensions]]; the `hasGroupsFrame` guard keeps the
  * per-statement overhead to one regex probe. */
class GroupsFrameParser(delegate: ParserInterface) extends ParserInterface {
  private def rw(sqlText: String): String = GroupsFrames.rewrite(sqlText)

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(rw(sqlText))
  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(rw(sqlText), ctx)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rw(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
