package graft.emf

import org.scalatest.funsuite.AnyFunSuite

class EmfParserSpec extends AnyFunSuite {
  val cols = GoldenQueries.factCols

  test("corpus parses into six queries (+ q7, q8)") {
    val qs = GoldenQueries.parsed
    assert(qs.length == 8)
    assert(qs(0).vars.length == 3)
    assert(qs(0).where.isEmpty && qs(0).having.isEmpty)
    assert(qs(4).where.nonEmpty && qs(4).having.nonEmpty)
  }

  test("q7: cross-attribute tuple operand and MF-vs-MF rhs field extraction") {
    val q7 = GoldenQueries.parsed(6)
    val v = q7.vars.head
    // {MF.month.sum_quant_dm}[<]{day} ⇒ tuple.day < MF.month — the tuple
    // column compares against a DIFFERENT grouping attribute
    assert(v.conds.contains(Cond(TupleCol("day"), "<", MfField("month"))))
    // {MF.month.sum_quant_dm}[<]{MF.day.sum_quant_dm} ⇒ MF.day < MF.month:
    // the rhs `MF.<field>.<tag>` strips the trailing tag exactly like the
    // lhs (reference src/QueryProcessor1.java:259-261)
    assert(v.conds.contains(Cond(MfField("day"), "<", MfField("month"))))
    // the bare two-token rhs spelling parses to the same condition
    val alt = EmfParser.parseOne(
      GoldenQueries.corpus7.replace("{MF.day.sum_quant_dm}", "{MF.day}"), cols)
    assert(alt.vars.head.conds == v.conds)
    // and a pure MF-vs-MF condition carries no dependency edge
    assert(v.dependsOn(q7.aggNames).isEmpty)
  }

  test("trailing predicate group becomes WHERE") {
    val q = GoldenQueries.parsed(1) // emf_q2: n=2, 3 groups
    assert(q.where == Seq(Cond(TupleCol("year"), "==", Lit("1997"))))
  }

  test("MF condition operand order is inverted to standard semantics") {
    // {MF.month.avg_quant_before}[<]{month}  ⇒  tuple.month < MF.month
    val q3 = GoldenQueries.parsed(2)
    val before = q3.vars.head
    assert(before.conds.contains(Cond(TupleCol("month"), "<", MfField("month"))))
    // {MF.avg_quant_1.count_quant_2}[>]{quant} ⇒ tuple.quant > MF.avg_quant_1
    val q6 = GoldenQueries.parsed(5)
    assert(q6.vars(1).conds.contains(
      Cond(TupleCol("quant"), ">", MfField("avg_quant_1"))))
  }

  test("pure-MF variable is auto-rewritten to range over its own group") {
    val q5 = GoldenQueries.parsed(4)
    q5.vars.foreach { v =>
      assert(v.conds.contains(Cond(TupleCol("cust"), "=", MfField("cust"))))
    }
  }

  test("variable-0 aggregates are select-list names not in the var list") {
    val q3 = GoldenQueries.parsed(2)
    assert(q3.varZero == Seq(AggSpec("avg", "quant", "avg_quant")))
  }

  test("EMF dependency edges are detected") {
    val q6 = GoldenQueries.parsed(5)
    assert(q6.vars(1).dependsOn(q6.aggNames) == Set("avg_quant_1"))
    assert(q6.vars(0).dependsOn(q6.aggNames).isEmpty)
  }

  test("aggregate name parsing handles suffixes and underscored columns") {
    assert(AggSpec.parse("avg_quant_NY", cols) == AggSpec("avg", "quant", "avg_quant_NY"))
    assert(AggSpec.parse("sum_quant", cols) == AggSpec("sum", "quant", "sum_quant"))
    assert(AggSpec.parse("count_my_col_x", Set("my_col")) ==
      AggSpec("count", "my_col", "count_my_col_x"))
  }

  test("malformed input is rejected with a clear message") {
    val e = intercept[IllegalArgumentException] {
      EmfParser.parseOne("a,b\n1\na\nsum_quant", cols)
    }
    assert(e.getMessage.contains("5 or 6 lines"))
    intercept[IllegalArgumentException] {
      EmfParser.parseOne("a,sum_b\n1\na\nsum_b\nnot-a-condition", cols)
    }
  }

  test("HAVING forms: && tree and single MF-vs-literal leaf") {
    val q5 = GoldenQueries.parsed(4)
    assert(q5.having.get.isInstanceOf[HavingAnd])
    val q6 = GoldenQueries.parsed(5)
    assert(q6.having.get ==
      HavingLeaf(HavingCond(MfField("count_quant_2"), ">", Lit("0"))))
  }
}
