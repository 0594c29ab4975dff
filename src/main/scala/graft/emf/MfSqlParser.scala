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
  *  - aggregates without a variable prefix (`avg(quant)`) are variable-0
  *    (computed over the group's own tuples).
  * Keywords are case-insensitive; clause order is fixed (WHERE before
  * GROUP BY, as in the papers' examples; also accepted after HAVING).
  */
object MfSqlParser {

  private val AggRe = """(?i)(sum|avg|min|max|count)\s*\(\s*(?:(\w+)\s*\.\s*)?(\w+)\s*\)\s+(?i:AS)\s+(\w+)""".r
  private val CondRe = """(?s)\s*(\w+)\s*\.\s*(\w+)\s*(<=|>=|!=|<>|=|<|>)\s*(.+)\s*""".r
  private val WhereCondRe = """(?s)\s*(\w+)\s*(<=|>=|!=|<>|=|<|>)\s*(.+)\s*""".r
  private val HavingCondRe = """(?s)\s*([\w.']+)\s*(<=|>=|!=|<>|=|<|>)\s*([\w.']+)\s*""".r

  def looksLikeSql(text: String): Boolean =
    text.linesIterator.map(_.trim).find(_.nonEmpty)
      .exists(_.toUpperCase.startsWith("SELECT"))

  def parse(text: String, factCols: Set[String]): EmfQuery = {
    val t = text.replaceAll("\\s+", " ").trim
    def clause(name: String, stoppers: Seq[String]): Option[String] = {
      val up = t.toUpperCase
      val i = up.indexOf(name.toUpperCase)
      if (i < 0) return None
      val start = i + name.length
      val end = stoppers.map(s => up.indexOf(s.toUpperCase, start))
        .filter(_ >= 0).minOption.getOrElse(t.length)
      Some(t.substring(start, end).trim)
    }
    val selectS = clause("SELECT ", Seq(" FROM ")).getOrElse(
      throw new IllegalArgumentException("missing SELECT"))
    val whereS = clause(" WHERE ", Seq(" GROUP BY ", " SUCH THAT ", " HAVING "))
    val groupS = clause(" GROUP BY ", Seq(" SUCH THAT ", " HAVING ", " WHERE "))
      .getOrElse(throw new IllegalArgumentException("missing GROUP BY"))
    val suchS = clause(" SUCH THAT ", Seq(" HAVING ", " WHERE "))
    val havingS = clause(" HAVING ", Seq(" WHERE "))

    // GROUP BY g1, g2 [; V1, V2]
    val (gPart, vPart) = groupS.split(";") match {
      case Array(g) => (g, "")
      case Array(g, v) => (g, v)
      case _ => throw new IllegalArgumentException(s"bad GROUP BY '$groupS'")
    }
    val groupAttrs = gPart.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val varNames = vPart.split(",").map(_.trim).filter(_.nonEmpty).toSeq

    // SELECT items: grouping attrs pass through; aggregates parsed
    case class SelAgg(varName: Option[String], spec: AggSpec)
    val selItems = EmfParser.splitTop(selectS, ',')
    val select = scala.collection.mutable.ArrayBuffer[String]()
    val aggs = scala.collection.mutable.ArrayBuffer[SelAgg]()
    selItems.foreach {
      case AggRe(f, vn, c, alias) =>
        select += alias
        aggs += SelAgg(Option(vn), AggSpec(f.toLowerCase, c, alias))
      case plain if groupAttrs.contains(plain.trim) => select += plain.trim
      case other => throw new IllegalArgumentException(
        s"select item '$other' is neither a grouping attribute nor 'func(col) AS name'")
    }
    val varZero = aggs.filter(_.varName.isEmpty).map(_.spec).toSeq
    val byVar = aggs.flatMap(a => a.varName.map(_ -> a.spec)).toMap
    require(byVar.keySet == varNames.toSet,
      s"SELECT aggregates reference variables ${byVar.keySet.toSeq.sorted}, GROUP BY declares ${varNames.sorted}")

    // SUCH THAT: one AND-group per variable, comma-separated, in order
    val aggNames = (varZero ++ varNames.flatMap(byVar.get)).map(_.name).toSet
    val suchGroups = suchS.map(s => EmfParser.splitTop(s, ',')).getOrElse(Nil)
    require(suchGroups.size <= varNames.size,
      s"${suchGroups.size} SUCH THAT groups for ${varNames.size} variables")
    val condsByVar: Map[String, Seq[Cond]] =
      suchGroups.map { grp =>
        val conds = grp.split("(?i) AND ").map(_.trim).filter(_.nonEmpty)
          .map(parseSuchCond(_, groupAttrs, aggNames, factCols))
        val vn = conds.headOption.map(_._1).getOrElse(
          throw new IllegalArgumentException(s"empty SUCH THAT group '$grp'"))
        require(conds.forall(_._1 == vn),
          s"SUCH THAT group mixes variables: '$grp'")
        vn -> conds.map(_._2).toSeq
      }.toMap

    val vars = varNames.zipWithIndex.map { case (vn, i) =>
      val conds0 = condsByVar.getOrElse(vn, Nil)
      val conds =
        if (conds0.exists(_.referencesMf)) conds0
        else groupAttrs.map(g => Cond(TupleCol(g), "=", MfField(g))) ++ conds0
      GroupingVar(i + 1, byVar(vn), conds)
    }

    val where = whereS.toSeq.flatMap(_.split("(?i) AND ").map(_.trim).filter(_.nonEmpty))
      .map {
        case WhereCondRe(c, op, lit) => Cond(TupleCol(c), op, Lit(stripQuotes(lit)))
        case other => throw new IllegalArgumentException(s"bad WHERE condition '$other'")
      }

    val having = havingS.map(parseHaving(_, aggNames))
    val q = EmfQuery(select.toSeq, groupAttrs, varZero, vars, where, having)
    EmfParser.validate(q, factCols)
    q
  }

  /** One SUCH THAT condition → (varName, normalized Cond). */
  private def parseSuchCond(s: String, groupAttrs: Seq[String],
      aggNames: Set[String], factCols: Set[String]): (String, Cond) = s match {
    case CondRe(vn, col, op, rhsRaw) =>
      val rhs = rhsRaw.trim
      val cond =
        if (rhs.matches("'.*'") || rhs.matches("-?\\d+(\\.\\d+)?"))
          Cond(TupleCol(col), op, Lit(stripQuotes(rhs)))
        else if (aggNames.contains(rhs) || groupAttrs.contains(rhs))
          Cond(TupleCol(col), op, MfField(rhs))
        else throw new IllegalArgumentException(
          s"SUCH THAT right side '$rhs' is not a literal, grouping attribute, or aggregate")
      (vn, cond)
    case other => throw new IllegalArgumentException(s"bad SUCH THAT condition '$other'")
  }

  private def parseHaving(s: String, aggNames: Set[String]): HavingExpr = {
    val orParts = s.split("(?i) OR ")
    orParts.map { part =>
      part.split("(?i) AND ").map(_.trim).filter(_.nonEmpty).map {
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
