package graft.emf

/** AST for MF/EMF (Multi-Feature / Extended Multi-Feature) queries — the
  * `GROUP BY … ; SUCH THAT …` SQL extension of Chatziantoniou & Ross
  * (VLDB 1996). The reference engine consumes these as a 5/6-line
  * positional text format (reference `src/AdhocQueryProcessor.java:89-135`)
  * and never builds an AST; we parse into this structure once and lower it
  * onto DataFrame plans in [[EmfPlanner]].
  */

/** A comparison operand. */
sealed trait Operand
/** A column of the fact table ("tuple side"). */
final case class TupleCol(name: String) extends Operand
/** A field of the MF structure (a grouping attribute or an aggregate of
  * some grouping variable) — the "group side". */
final case class MfField(name: String) extends Operand
/** A literal. Kept as string; typed lazily against the fact schema. */
final case class Lit(raw: String) extends Operand

/** A normalized comparison `lhs op rhs` with STANDARD left-to-right
  * semantics. The reference spec format writes MF conditions operand-
  * inverted (`{MF.month.avg_before}[<]{month}` means tuple.month <
  * group.month — reference `src/QueryProcessor1.java:246-263`); the parser
  * performs that inversion exactly once so everything downstream is sane.
  */
final case class Cond(lhs: Operand, op: String, rhs: Operand) {
  def referencesMf: Boolean =
    lhs.isInstanceOf[MfField] || rhs.isInstanceOf[MfField]
}

/** One aggregate spec `func_column[_suffix]` (reference line-4 format). */
final case class AggSpec(func: String, column: String, name: String)

object AggSpec {
  private val Funcs = Set("sum", "avg", "min", "max", "count")
  /** Parse `avg_quant_NY` → AggSpec("avg", "quant", "avg_quant_NY"). */
  def parse(name: String, factCols: Set[String]): AggSpec = {
    val parts = name.split("_")
    require(parts.length >= 2 && Funcs(parts(0)),
      s"bad aggregate name '$name' (want func_column[_suffix])")
    // column may itself contain underscores: take the longest prefix of
    // parts(1..) that is a fact column
    val candidates = (parts.length to 2 by -1)
      .map(i => parts.slice(1, i).mkString("_"))
    val col = candidates.find(factCols.contains).getOrElse(parts(1))
    AggSpec(parts(0), col, name)
  }
}

/** One grouping variable: its aggregate plus its defining predicates.
  * `conds` mixes group-membership conditions (those referencing MfField)
  * and tuple-vs-literal conditions; the planner splits them.
  */
final case class GroupingVar(index: Int, agg: AggSpec, conds: Seq[Cond]) {
  def mfConds: Seq[Cond]    = conds.filter(_.referencesMf)
  def tupleConds: Seq[Cond] = conds.filterNot(_.referencesMf)
  /** Aggregate names of OTHER variables this variable's predicates read —
    * the EMF dependency edges (e.g. corpus query 6's
    * `{MF.avg_quant_1.count_quant_2}[>]{quant}`). */
  def dependsOn(aggNames: Set[String]): Set[String] =
    conds.flatMap {
      case Cond(MfField(n), _, _) if aggNames(n) && n != agg.name => Some(n)
      case Cond(_, _, MfField(n)) if aggNames(n) && n != agg.name => Some(n)
      case _ => None
    }.toSet
}

/** A HAVING leaf `lhs op rhs` over MF fields / literals. */
final case class HavingCond(lhs: Operand, op: String, rhs: Operand)
/** HAVING tree: conjunction/disjunction of leaves (the corpus only uses
  * `&&` of two leaves or a single leaf; we support arbitrary and/or). */
sealed trait HavingExpr
final case class HavingLeaf(c: HavingCond) extends HavingExpr
final case class HavingAnd(l: HavingExpr, r: HavingExpr) extends HavingExpr
final case class HavingOr(l: HavingExpr, r: HavingExpr) extends HavingExpr

/** A full MF/EMF query.
  *
  * @param select     output columns, in order (grouping attrs + agg names)
  * @param groupAttrs the grouping attributes G
  * @param varZero    aggregates computed over the group's own tuples in
  *                   scan 0 (select-list names not in the variable list)
  * @param vars       the grouping variables, in declaration order
  * @param where      global WHERE conditions (tuple-vs-literal)
  * @param having     optional HAVING over the MF structure
  */
final case class EmfQuery(
    select: Seq[String],
    groupAttrs: Seq[String],
    varZero: Seq[AggSpec],
    vars: Seq[GroupingVar],
    where: Seq[Cond],
    having: Option[HavingExpr]) {
  def aggNames: Set[String] = (varZero.map(_.name) ++ vars.map(_.agg.name)).toSet
}
