package graft.emf

/** Parser for the reference engine's multi-query spec format
  * (reference `src/AdhocQueryProcessor.java:41-135`, corpus
  * `src/Ad_hoc_Input.txt`). One query = 5 or 6 lines, queries separated
  * by a line containing `~`:
  *
  * {{{
  * 1  select list            cust,avg_quant_NY,avg_quant_CT
  * 2  n (# grouping vars)    2
  * 3  grouping attributes    cust
  * 4  aggregate list         avg_quant_NY,avg_quant_CT
  * 5  predicate groups       {MF.cust.avg_quant_NY}[=]{cust}:{state}[=]{NY},…
  * 6  optional HAVING        {avg_quant_NY,>,avg_quant_CT} [&&] {…}
  * }}}
  *
  * Line-5 groups are comma-separated and positionally matched to the
  * variables of line 4; a trailing EXTRA group is the global WHERE
  * (reference `src/AdhocQueryProcessor.java:662-669`). Conditions inside a
  * group are `:`-separated. Condition syntax `{left}[op]{right}`:
  *
  *  - tuple condition: `{state}[=]{NY}` — fact column vs literal.
  *  - MF condition: `{MF.<field>.<target_agg>}[op]{<rhs>}`. The MIDDLE
  *    token is the MF field compared against; the LAST names the
  *    aggregate the condition belongs to. ⚠ Operand order inverts at
  *    evaluation — the reference computes `rhs op MF.field`
  *    (`src/QueryProcessor1.java:246-263`) — so this parser emits the
  *    normalized `Cond(rhs, op, MF.field)` with standard semantics.
  *    `rhs` may itself be `MF.<field>` (MF-vs-MF).
  *  - pure-MF auto-rewrite: a variable whose group has NO MF condition
  *    ranges over its own group — we synthesize `tuple.g = MF.g` for every
  *    grouping attribute g (reference `src/QueryProcessor1.java:216-226`).
  *
  * Divergences from the reference, by design (SURVEY.md §2.3): corrected
  * avg denominators, real min, double averages, arbitrary boolean WHERE,
  * standard HAVING chaining.
  */
object EmfParser {

  private val CondRe = """\{([^}]*)\}\s*\[([^\]]*)\]\s*\{([^}]*)\}""".r
  private val HavingLeafRe = """\{([^},]*),\s*([^,}]*),\s*([^}]*)\}""".r

  /** Parse a whole spec file (possibly many queries separated by `~`). */
  def parseAll(text: String, factCols: Set[String]): Seq[EmfQuery] =
    text.split("(?m)^\\s*~\\s*$").map(_.trim).filter(_.nonEmpty)
      .map(q => parseOne(q, factCols)).toSeq

  /** Parse one 5/6-line query block. */
  def parseOne(block: String, factCols: Set[String]): EmfQuery = {
    val lines = block.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    require(lines.length == 5 || lines.length == 6,
      s"query must be 5 or 6 lines, got ${lines.length}")
    val select = lines(0).split(",").map(_.trim).toSeq
    val n = lines(1).toInt
    val groupAttrs = lines(2).split(",").map(_.trim).toSeq
    val aggNames = lines(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(aggNames.length == n,
      s"line 4 lists ${aggNames.length} aggregates but n=$n")

    // split line 5 into predicate groups at top-level commas (commas can
    // only appear between conditions here — braces never contain commas on
    // this line)
    val groups = splitTop(lines(4), ',').map(_.trim).filter(_.nonEmpty)
    require(groups.length == n || groups.length == n + 1,
      s"line 5 has ${groups.length} predicate groups for n=$n variables")
    val (varGroups, whereGroups) = groups.splitAt(n)
    val where = whereGroups.flatMap(g => splitTop(g, ':').map(parseCond))
    require(where.forall(!_.referencesMf), "WHERE may not reference MF fields")

    val vars = aggNames.zip(varGroups).zipWithIndex.map {
      case ((aggName, grp), i) =>
        val agg = AggSpec.parse(aggName, factCols)
        val conds0 = splitTop(grp, ':').map(parseCond)
        // pure-MF auto-rewrite: no MF condition → variable ranges over its
        // own group
        val conds =
          if (conds0.exists(_.referencesMf)) conds0
          else groupAttrs.map(g => Cond(TupleCol(g), "=", MfField(g))) ++ conds0
        GroupingVar(i + 1, agg, conds)
    }

    // select-list names that are neither grouping attrs nor variable
    // aggregates are variable-0 aggregates (computed over the group itself)
    val varZero = select
      .filterNot(groupAttrs.contains).filterNot(aggNames.contains)
      .map(a => AggSpec.parse(a, factCols))

    val having = if (lines.length == 6) Some(parseHaving(lines(5))) else None
    val q = EmfQuery(select, groupAttrs, varZero, vars, where, having)
    validate(q, factCols)
    q
  }

  /** Fail fast with a readable message instead of a late Catalyst
    * analysis error: every referenced fact column must exist. */
  private[emf] def validate(q: EmfQuery, factCols: Set[String]): Unit = {
    def checkCol(c: String, where: String): Unit =
      require(factCols.contains(c),
        s"$where references unknown column '$c' (fact columns: ${factCols.toSeq.sorted.mkString(", ")})")
    q.groupAttrs.foreach(checkCol(_, "grouping attribute"))
    (q.varZero ++ q.vars.map(_.agg)).foreach(a => checkCol(a.column, s"aggregate ${a.name}"))
    val mfNames = q.aggNames ++ q.groupAttrs
    def checkMf(n: String, where: String): Unit = require(mfNames.contains(n),
      s"$where references unknown MF field '$n' (have: ${mfNames.toSeq.sorted.mkString(", ")})")
    (q.where ++ q.vars.flatMap(_.conds)).foreach { c =>
      Seq(c.lhs, c.rhs).foreach {
        case TupleCol(n) => checkCol(n, "condition")
        case MfField(n)  => checkMf(n, "condition")
        case _ =>
      }
    }
    q.select.foreach(s => require(
      q.groupAttrs.contains(s) || q.aggNames.contains(s),
      s"select item '$s' is neither a grouping attribute nor a declared aggregate"))
    def walkHaving(h: HavingExpr): Unit = h match {
      case HavingAnd(l, r) => walkHaving(l); walkHaving(r)
      case HavingOr(l, r)  => walkHaving(l); walkHaving(r)
      case HavingLeaf(HavingCond(a, _, b)) => Seq(a, b).foreach {
        case MfField(n) => checkMf(n, "HAVING")
        case _ =>
      }
    }
    q.having.foreach(walkHaving)
  }

  /** Split at `sep` occurring outside `{...}` / `[...]`. */
  private[emf] def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case c @ ('{' | '[') => depth += 1; cur += c
      case c @ ('}' | ']') => depth -= 1; cur += c
      case c if c == sep && depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def parseCond(s: String): Cond = s match {
    case CondRe(left, op, right) =>
      if (left.startsWith("MF.")) {
        // {MF.<field>.<target_agg>}[op]{rhs} — field is the token between
        // the first and last dot; evaluation order is rhs op MF.field
        val body = left.stripPrefix("MF.")
        val field =
          if (body.contains('.')) body.substring(0, body.lastIndexOf('.'))
          else body
        // an MF-valued rhs strips the trailing `.<tag>` segment, exactly
        // like the lhs above (reference `src/QueryProcessor1.java:259-261`
        // requires the `MF.<field>.<tag>` form; we also accept the bare
        // `MF.<field>` two-token spelling). A numeric rhs is a LITERAL
        // (`{MF.count_x.count_x}[>]{0}` — group-side threshold), same
        // digit/minus-head rule as HAVING operands; column identifiers
        // can't start with a digit, and before this rule a numeric rhs
        // was a guaranteed unknown-column error, so nothing legal changes
        // meaning. Bare strings stay TupleCol — a quoting convention
        // would be a new grammar, and the corpus never needs one here.
        val rhs: Operand =
          if (right.startsWith("MF.")) {
            val rbody = right.stripPrefix("MF.")
            val rfield =
              if (rbody.contains('.')) rbody.substring(0, rbody.lastIndexOf('.'))
              else rbody
            MfField(rfield)
          } else if (right.nonEmpty && (right.head.isDigit || right.head == '-'))
            Lit(right)
          else TupleCol(right)
        Cond(rhs, op.trim, MfField(field))
      } else {
        Cond(TupleCol(left.trim), op.trim, Lit(right.trim))
      }
    case other => throw new IllegalArgumentException(s"bad condition '$other'")
  }

  /** HAVING line: leaves `{a,op,b}` joined by `[&&]` / `[||]`; the
    * reference also accepts `:`-chained conditions (last-wins bug,
    * SURVEY.md §2.3.5) — we treat `:` as AND. */
  private def parseHaving(s: String): HavingExpr = {
    val andParts = splitTop(s, ':')
    andParts.map(parseHavingBool).reduceLeft(HavingAnd(_, _))
  }

  private def parseHavingBool(s: String): HavingExpr = {
    // split on [&&] / [||] with standard AND-over-OR precedence: combine
    // runs of && first, then join the groups with ||
    val tokens = """\[(\&\&|\|\|)\]""".r
    val ops = tokens.findAllMatchIn(s).map(_.group(1)).toSeq
    val parts = tokens.split(s).map(_.trim).filter(_.nonEmpty).toSeq
    val leaves = parts.map(parseHavingLeaf)
    if (leaves.isEmpty) throw new IllegalArgumentException(s"bad HAVING '$s'")
    require(ops.length == leaves.length - 1, s"malformed HAVING '$s'")
    val orGroups = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer(leaves.head))
    ops.zip(leaves.drop(1)).foreach {
      case ("&&", l) => orGroups.last += l
      case (_, l)    => orGroups += scala.collection.mutable.ArrayBuffer(l)
    }
    orGroups.map(_.reduceLeft(HavingAnd(_, _): HavingExpr))
      .reduceLeft(HavingOr(_, _))
  }

  private def parseHavingLeaf(s: String): HavingExpr = s match {
    case HavingLeafRe(a, op, b) =>
      HavingLeaf(HavingCond(havingOperand(a.trim), op.trim, havingOperand(b.trim)))
    case other => throw new IllegalArgumentException(s"bad HAVING leaf '$other'")
  }

  private def havingOperand(s: String): Operand =
    if (s.startsWith("MF.")) MfField(s.stripPrefix("MF."))
    else if (s.nonEmpty && (s.head.isDigit || s.head == '-')) Lit(s)
    else MfField(s)
}
