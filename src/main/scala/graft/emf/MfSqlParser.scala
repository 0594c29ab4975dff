package graft.emf

/** Second frontend: the extended-SQL syntax of the MF/EMF papers
  * (Chatziantoniou & Ross, VLDB '96 — `GROUP BY … ; X, Y … SUCH THAT …`),
  * parsed into the same [[EmfQuery]] AST as the reference's positional
  * format, so both frontends share the planner.
  *
  * {{{
  * SELECT cust, avg(quant) AS avg_quant,
  *        avg(X.quant) AS avg_quant_NY, avg(Y.quant) AS avg_quant_CT
  * FROM sales
  * WHERE year = 1997
  * GROUP BY cust ; X, Y
  * SUCH THAT X.cust = cust AND X.state = 'NY',
  *           Y.cust = cust AND Y.state = 'CT'
  * HAVING avg_quant_NY > avg_quant_CT
  * }}}
  *
  * Semantics, mirroring the papers:
  *  - `X.col op literal`  → tuple predicate of variable X
  *  - `X.col op g`        → membership: tuple.col op group's g (g ∈ GROUP BY)
  *  - `X.col op aggName`  → EMF: tuple.col op another variable's aggregate
  *  - a variable with no SUCH THAT group ranges over its own group
  *    (the same auto-rewrite as the positional format)
  *  - aggregates without a variable prefix (`avg(quant)`) are variable-0;
  *    several aggregates may share one variable (they become sibling
  *    grouping variables with the same defining predicates).
  *
  * Keyword detection, comma- and AND-splitting are all quote-aware: a
  * masked shadow of the text (quoted spans blanked) locates structure,
  * substrings come from the original, so literals like 'BLACK AND WHITE'
  * or 'A  B' survive intact.
  */
object MfSqlParser {

  private val AggRe = """(?is)\s*(sum|avg|min|max|count)\s*\(\s*(?:(\w+)\s*\.\s*)?(\w+)\s*\)\s+AS\s+(\w+)\s*""".r
  private val CondRe = """(?s)\s*(\w+)\s*\.\s*(\w+)\s*(<=|>=|!=|<>|=|<|>)\s*(.+?)\s*""".r
  private val WhereCondRe = """(?s)\s*(\w+)\s*(<=|>=|!=|<>|=|<|>)\s*(.+?)\s*""".r
  private val HavingCondRe = """(?s)\s*(-?\d+(?:\.\d+)?|[\w.]+|'[^']*')\s*(<=|>=|!=|<>|=|<|>)\s*(-?\d+(?:\.\d+)?|[\w.]+|'[^']*')\s*""".r

  def looksLikeSql(text: String): Boolean =
    text.linesIterator.map(_.trim).find(_.nonEmpty)
      .exists(_.toUpperCase.startsWith("SELECT"))

  /** Multi-query spec: blocks separated by `~` lines (same convention as
    * the positional format). */
  def parseAll(text: String, factCols: Set[String]): Seq[EmfQuery] =
    text.split("(?m)^\\s*~\\s*$").map(_.trim).filter(_.nonEmpty)
      .map(parse(_, factCols)).toSeq

  /** Same-length shadow with quoted spans (quotes included) blanked, so
    * structural regexes never match inside string literals. */
  private def mask(s: String): String = {
    val out = s.toCharArray
    var i = 0; var inQ = false
    while (i < s.length) {
      if (s.charAt(i) == '\'') { inQ = !inQ; out(i) = '\u0001' }
      else if (inQ) out(i) = '\u0001'
      i += 1
    }
    new String(out)
  }

  /** Split `orig` at matches of `re` found in its masked shadow. */
  private def splitOn(orig: String, masked: String, re: String): Seq[String] = {
    val points = re.r.findAllMatchIn(masked).map(m => (m.start, m.end)).toSeq
    val bounds = ((0, 0) +: points :+ ((orig.length, orig.length)))
    bounds.sliding(2).map { case Seq((_, s), (e, _)) => orig.substring(s, e) }
      .map(_.trim).filter(_.nonEmpty).toSeq
  }

  def parse(text: String, factCols: Set[String]): EmfQuery = {
    val t = text.trim
    val m = mask(t)
    // locate clause keywords outside quotes, in textual order
    val kw = Seq(
      "SELECT" -> "(?i)\\bSELECT\\b", "FROM" -> "(?i)\\bFROM\\b",
      "WHERE" -> "(?i)\\bWHERE\\b", "GROUP BY" -> "(?i)\\bGROUP\\s+BY\\b",
      "SUCH THAT" -> "(?i)\\bSUCH\\s+THAT\\b", "HAVING" -> "(?i)\\bHAVING\\b")
    val hits = kw.flatMap { case (n, re) =>
      re.r.findAllMatchIn(m).map(mm => (n, mm.start, mm.end))
    }.sortBy(_._2)
    hits.groupBy(_._1).foreach { case (n, hs) =>
      require(hs.size == 1, s"clause $n appears ${hs.size} times")
    }
    // trim orig and mask with the SAME offsets — trimming the mask
    // independently would strip the  placeholder chars (< U+0020)
    // and misalign split offsets when a clause starts with a quoted
    // literal
    def trimmedPair(o: String, mm: String): (String, String) = {
      var s = 0; var e = o.length
      while (s < e && o.charAt(s).isWhitespace) s += 1
      while (e > s && o.charAt(e - 1).isWhitespace) e -= 1
      (o.substring(s, e), mm.substring(s, e))
    }
    val clauses: Map[String, (String, String)] = hits.zipWithIndex.map {
      case ((n, _, e), i) =>
        val end = if (i + 1 < hits.length) hits(i + 1)._2 else t.length
        n -> trimmedPair(t.substring(e, end), m.substring(e, end))
    }.toMap
    def need(n: String): (String, String) = clauses.getOrElse(n,
      throw new IllegalArgumentException(s"missing $n clause"))
    val (selectS, selectM) = need("SELECT")
    need("FROM")
    val (groupS, _) = need("GROUP BY")
    val whereOpt = clauses.get("WHERE")
    val suchOpt = clauses.get("SUCH THAT")
    val havingOpt = clauses.get("HAVING")

    // GROUP BY g1, g2 [; V1, V2]
    val (gPart, vPart) = groupS.split(";") match {
      case Array(g) => (g, "")
      case Array(g, v) => (g, v)
      case _ => throw new IllegalArgumentException(s"bad GROUP BY '$groupS'")
    }
    val groupAttrs = gPart.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val varNames = vPart.split(",").map(_.trim).filter(_.nonEmpty).toSeq

    // SELECT items
    val select = scala.collection.mutable.ArrayBuffer[String]()
    val varZero = scala.collection.mutable.ArrayBuffer[AggSpec]()
    val aggsByVar = scala.collection.mutable.LinkedHashMap[String, Vector[AggSpec]]()
    splitOn(selectS, selectM, ",").foreach {
      case AggRe(f, vn, c, alias) =>
        select += alias
        val spec = AggSpec(f.toLowerCase, c, alias)
        Option(vn) match {
          case None => varZero += spec
          case Some(v) =>
            require(varNames.contains(v),
              s"SELECT aggregate '$alias' references undeclared variable '$v' (GROUP BY declares: ${varNames.mkString(", ")})")
            aggsByVar(v) = aggsByVar.getOrElse(v, Vector()) :+ spec
        }
      case plain if groupAttrs.contains(plain.trim) => select += plain.trim
      case other => throw new IllegalArgumentException(
        s"select item '$other' is neither a grouping attribute nor 'func(col) AS name'")
    }
    varNames.foreach(v => require(aggsByVar.contains(v),
      s"variable '$v' declared in GROUP BY but no SELECT aggregate uses it"))

    // SUCH THAT: one AND-group per variable, comma-separated
    val aggNames = (varZero ++ aggsByVar.values.flatten).map(_.name).toSet
    val suchGroups = suchOpt.map { case (s, sm) => splitOn(s, sm, ",").map { g =>
      val gm = mask(g)
      splitOn(g, gm, "(?i)\\bAND\\b")
    }}.getOrElse(Nil)
    require(suchGroups.size <= varNames.size,
      s"${suchGroups.size} SUCH THAT groups for ${varNames.size} variables")
    val grouped = suchGroups.map { conds =>
      val parsed = conds.map(parseSuchCond(_, groupAttrs, aggNames))
      val vn = parsed.head._1
      require(parsed.forall(_._1 == vn),
        s"SUCH THAT group mixes variables: ${conds.mkString(" AND ")}")
      require(varNames.contains(vn),
        s"SUCH THAT references undeclared variable '$vn' (GROUP BY declares: ${varNames.mkString(", ")})")
      vn -> parsed.map(_._2)
    }
    grouped.groupBy(_._1).foreach { case (vn, gs) =>
      require(gs.size == 1,
        s"variable '$vn' has ${gs.size} SUCH THAT groups — join the conditions with AND instead of a comma")
    }
    val condsByVar: Map[String, Seq[Cond]] = grouped.toMap

    // several aggregates on one variable → sibling GroupingVars sharing
    // that variable's defining predicates
    var idx = 0
    val vars = varNames.flatMap { vn =>
      val conds0 = condsByVar.getOrElse(vn, Nil)
      val conds =
        if (conds0.exists(_.referencesMf)) conds0
        else groupAttrs.map(g => Cond(TupleCol(g), "=", MfField(g))) ++ conds0
      aggsByVar(vn).map { spec => idx += 1; GroupingVar(idx, spec, conds) }
    }

    val where = whereOpt.toSeq.flatMap { case (s, sm) =>
      splitOn(s, sm, "(?i)\\bAND\\b").map {
        case WhereCondRe(c, op, lit0) =>
          val lit = lit0.trim
          require(lit.matches("(?s)'.*'") || lit.matches("-?\\d+(\\.\\d+)?"),
            s"WHERE right side '$lit' must be a quoted string or numeric literal")
          Cond(TupleCol(c), op, Lit(stripQuotes(lit)))
        case other => throw new IllegalArgumentException(s"bad WHERE condition '$other'")
      }
    }

    val having = havingOpt.map { case (s, sm) => parseHaving(s, sm) }
    val q = EmfQuery(select.toSeq, groupAttrs, varZero.toSeq, vars, where, having)
    EmfParser.validate(q, factCols)
    q
  }

  /** One SUCH THAT condition → (varName, normalized Cond). */
  private def parseSuchCond(s: String, groupAttrs: Seq[String],
      aggNames: Set[String]): (String, Cond) = s match {
    case CondRe(vn, col, op, rhsRaw) =>
      val rhs = rhsRaw.trim
      val cond =
        if (rhs.matches("(?s)'.*'") || rhs.matches("-?\\d+(\\.\\d+)?"))
          Cond(TupleCol(col), op, Lit(stripQuotes(rhs)))
        else if (aggNames.contains(rhs) || groupAttrs.contains(rhs))
          Cond(TupleCol(col), op, MfField(rhs))
        else throw new IllegalArgumentException(
          s"SUCH THAT right side '$rhs' is not a literal, grouping attribute, or aggregate")
      (vn, cond)
    case other => throw new IllegalArgumentException(s"bad SUCH THAT condition '$other'")
  }

  /** AND binds tighter than OR, standard SQL precedence. */
  private def parseHaving(s: String, sm: String): HavingExpr = {
    splitOn(s, sm, "(?i)\\bOR\\b").map { orPart =>
      val om = mask(orPart)
      splitOn(orPart, om, "(?i)\\bAND\\b").map {
        case HavingCondRe(a, op, b) =>
          HavingLeaf(HavingCond(havingOperand(a), op, havingOperand(b))): HavingExpr
        case other => throw new IllegalArgumentException(s"bad HAVING '$other'")
      }.reduceLeft(HavingAnd(_, _))
    }.reduceLeft(HavingOr(_, _))
  }

  private def havingOperand(s: String): Operand =
    if (s.matches("-?\\d+(\\.\\d+)?") || s.startsWith("'")) Lit(stripQuotes(s))
    else MfField(s.stripPrefix("MF."))

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'') s.substring(1, s.length - 1)
    else s
}
