package graft.emf

/** Brute-force nested-loop MF/EMF evaluator implementing the paper
  * semantics (Chatziantoniou & Ross, VLDB '96) — the reference engine's
  * own n+1-scan algorithm (reference `src/QueryProcessor1.java:200-302`)
  * minus its SURVEY.md §2.3 bugs (wrong avg denominators, fake min,
  * integer averages, last-wins HAVING).
  *
  * This is an executable ORACLE for [[EmfPlanner]] on small in-memory
  * tables: deliberately O(|groups|·|R|·|conds|) with zero shared
  * machinery with the planner — no Spark, no Column, no
  * SIMPLE/WINDOWED/DEPENDENT classification — so agreement between the
  * two is evidence, not tautology.
  *
  * Scope (matches the fuzz generator's domain): aggregate columns are
  * integral; comparisons follow SQL three-valued logic collapsed to
  * "null compares false" (filter-equivalent); empty aggregation sets
  * yield NULL for sum/avg/min/max and 0 for count, exactly like the
  * planner's left-join-back / coalesce contract.
  *
  * Null contract (mirrors [[EmfPlanner]]'s object scaladoc): a null
  * grouping value is a group; same-attribute comparisons on grouping
  * attributes are PARTITION selectors — `=` is null-safe equality,
  * `!=`/`<>` its negation. Every other comparison treats a null
  * operand as false. Null aggregate inputs are skipped (SQL agg
  * semantics; count(col) counts non-null).
  */
object BruteEmf {
  type TRow = Map[String, Any]

  /** Evaluate `q` over `table`, returning the select-list projection of
    * every surviving MF row (unordered). Variables are evaluated in
    * declaration order, so EMF dependencies must point backwards — the
    * same restriction the reference's sequential scans impose. */
  def run(q: EmfQuery, table: Seq[TRow]): Seq[Seq[Any]] = {
    val gAttrs = q.groupAttrs.toSet
    val rows = table.filter(r => q.where.forall(c => cond(c, r, Map.empty, gAttrs)))
    val groups = rows.map(r => q.groupAttrs.map(r(_))).distinct
    val mfRows = groups.map { gv =>
      var mf: TRow = q.groupAttrs.zip(gv).toMap
      val own = rows.filter(r => q.groupAttrs.forall(a => r(a) == mf(a)))
      for (a <- q.varZero)
        mf += a.name -> agg(a.func, own.map(_(a.column)))
      for (v <- q.vars) { // scan i: one full pass of R per variable
        val members = rows.filter(r => v.conds.forall(c => cond(c, r, mf, gAttrs)))
        mf += v.agg.name -> agg(v.agg.func, members.map(_(v.agg.column)))
      }
      mf
    }
    val kept = q.having.fold(mfRows)(h => mfRows.filter(m => having(h, m)))
    kept.map(m => q.select.map(m(_)))
  }

  private def toL(a: Any): Long = a match {
    case i: Int  => i.toLong
    case l: Long => l
    case other   => throw new IllegalArgumentException(s"non-integral agg input $other")
  }

  private def agg(func: String, vs0: Seq[Any]): Any = {
    val vs = vs0.filter(_ != null) // SQL aggregates skip nulls
    func match {
      case "count" => vs.size.toLong
      case _ if vs.isEmpty => null
      case "sum"   => java.lang.Long.valueOf(vs.map(toL).sum)
      case "avg"   => java.lang.Double.valueOf(vs.map(toL).sum.toDouble / vs.size)
      case "min"   => vs.minBy(toL)
      case "max"   => vs.maxBy(toL)
      case other   => throw new IllegalArgumentException(s"unknown aggregate '$other'")
    }
  }

  /** One membership/WHERE condition against tuple `row` and MF row `mf`.
    * Literals are typed by the non-literal side's runtime value (mirrors
    * the planner's typedLit-against-the-fact-schema). Same-attr
    * comparisons on grouping attrs follow the partition-selector rule. */
  private def cond(c: Cond, row: TRow, mf: TRow, gAttrs: Set[String]): Boolean = {
    def resolve(o: Operand): Any = o match {
      case TupleCol(n) => row(n)
      case MfField(n)  => mf.getOrElse(n, null)
      case Lit(_)      => throw new IllegalStateException("lit resolved via other side")
    }
    val partitionSelector = (c.lhs, c.rhs) match {
      case (TupleCol(a), MfField(b)) => a == b && gAttrs(a)
      case (MfField(b), TupleCol(a)) => a == b && gAttrs(a)
      case _                         => false
    }
    if (partitionSelector && Set("=", "==", "!=", "<>").contains(c.op)) {
      val (l, r) = (resolve(c.lhs), resolve(c.rhs))
      val same =
        if (l == null || r == null) l == null && r == null
        else compare(l, "=", r)
      if (c.op == "=" || c.op == "==") same else !same
    } else (c.lhs, c.rhs) match {
      case (Lit(raw), other) => compare(litFor(raw, resolve(other)), c.op, resolve(other))
      case (other, Lit(raw)) => compare(resolve(other), c.op, litFor(raw, resolve(other)))
      case (l, r)            => compare(resolve(l), c.op, resolve(r))
    }
  }

  private def litFor(raw: String, other: Any): Any = other match {
    case _: Int | _: Long => raw.toLong
    case _: Double        => raw.toDouble
    case _                => raw
  }

  private def having(h: HavingExpr, mf: TRow): Boolean = h match {
    case HavingAnd(l, r) => having(l, mf) && having(r, mf)
    case HavingOr(l, r)  => having(l, mf) || having(r, mf)
    case HavingLeaf(HavingCond(a, op, b)) =>
      def resolve(o: Operand): Any = o match {
        case MfField(n)  => mf.getOrElse(n, null)
        case TupleCol(n) => mf.getOrElse(n, null) // planner: col(n) over MF frame
        case Lit(raw) =>
          if (raw.matches("-?\\d+")) raw.toLong
          else if (raw.matches("-?\\d*\\.\\d+")) raw.toDouble
          else raw
      }
      compare(resolve(a), op, resolve(b))
  }

  /** SQL comparison with null→false (filter-equivalent to three-valued
    * logic: a dropped row is dropped whether the predicate is NULL or
    * false, under any and/or combination). */
  private def compare(l: Any, op: String, r: Any): Boolean = {
    if (l == null || r == null) return false
    (l, r) match {
      case (a: String, b: String) => strCmp(a, op, b)
      case (a: Number, b: Number) => numCmp(a.doubleValue, op, b.doubleValue)
      case _ => throw new IllegalArgumentException(s"incomparable $l $op $r")
    }
  }

  private def strCmp(a: String, op: String, b: String): Boolean = op match {
    case "=" | "=="  => a == b
    case "!=" | "<>" => a != b
    case "<"         => a < b
    case "<="        => a <= b
    case ">"         => a > b
    case ">="        => a >= b
  }

  // exact in the fuzz domain: every value is an integer-valued double or
  // an exact small-denominator average, well inside double precision
  private def numCmp(a: Double, op: String, b: Double): Boolean = op match {
    case "=" | "=="  => a == b
    case "!=" | "<>" => a != b
    case "<"         => a < b
    case "<="        => a <= b
    case ">"         => a > b
    case ">="        => a >= b
  }
}
