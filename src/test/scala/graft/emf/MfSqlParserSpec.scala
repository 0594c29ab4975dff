package graft.emf

import graft.{SparkSpec, Tables}

/** The SQL frontend must produce plans equivalent to the positional
  * frontend for the same query. */
class MfSqlParserSpec extends SparkSpec {

  val cols = GoldenQueries.factCols

  test("corpus q5 in SUCH-THAT SQL equals the positional form") {
    val sql =
      """SELECT cust, avg(X.quant) AS avg_quant_NY, avg(Y.quant) AS avg_quant_CT,
        |       avg(Z.quant) AS avg_quant_NJ
        |FROM sales
        |WHERE year = 1997
        |GROUP BY cust ; X, Y, Z
        |SUCH THAT X.cust = cust AND X.state = 'NATION_1',
        |          Y.cust = cust AND Y.state = 'NATION_2',
        |          Z.cust = cust AND Z.state = 'NATION_3'
        |HAVING avg_quant_NY > avg_quant_CT AND avg_quant_NY > avg_quant_NJ""".stripMargin
    val q = MfSqlParser.parse(sql, cols)
    val fact = Tables.salesView(spark, sf0001)
    val got = EmfPlanner.plan(q, fact).orderBy("cust").collect().toSeq
    val want = EmfPlanner.plan(GoldenQueries.parsed(4), fact)
      .orderBy("cust").collect().toSeq
    assert(got == want)
  }

  test("corpus q6 (EMF) in SUCH-THAT SQL equals the positional form") {
    val sql =
      """SELECT prod, month, avg(X.quant) AS avg_quant_1, count(Y.quant) AS count_quant_2
        |FROM sales
        |WHERE year = 1997
        |GROUP BY prod, month ; X, Y
        |SUCH THAT X.prod = prod AND X.month = month,
        |          Y.prod = prod AND Y.month = month AND Y.quant > avg_quant_1
        |HAVING count_quant_2 > 0""".stripMargin
    val q = MfSqlParser.parse(sql, cols)
    val fact = Tables.salesView(spark, sf0001)
    val got = EmfPlanner.plan(q, fact).orderBy("prod", "month").collect().toSeq
    val want = EmfPlanner.plan(GoldenQueries.parsed(5), fact)
      .orderBy("prod", "month").collect().toSeq
    assert(got == want)
  }

  test("variable without SUCH THAT group auto-ranges over its own group") {
    val sql =
      """SELECT cust, sum(X.quant) AS sum_quant_all
        |FROM sales
        |GROUP BY cust ; X""".stripMargin
    val q = MfSqlParser.parse(sql, cols)
    assert(q.vars.head.conds == Seq(Cond(TupleCol("cust"), "=", MfField("cust"))))
  }

  test("quoted literals survive AND-splitting and whitespace") {
    import spark.implicits._
    val df = Seq(("a", "BLACK AND WHITE", 3), ("a", "RED", 4), ("b", "A  B", 5))
      .toDF("g", "state", "quant")
    val q = MfSqlParser.parse(
      """SELECT g, sum(X.quant) AS sum_q
        |FROM t GROUP BY g ; X
        |SUCH THAT X.g = g AND X.state = 'BLACK AND WHITE'""".stripMargin,
      Set("g", "state", "quant"))
    val out = EmfPlanner.plan(q, df).orderBy("g").collect()
    assert(out(0).getLong(1) == 3L && out(1).isNullAt(1))
    val q2 = MfSqlParser.parse(
      "SELECT g, count(X.quant) AS n FROM t GROUP BY g ; X SUCH THAT X.state = 'A  B'",
      Set("g", "state", "quant"))
    // double space preserved inside the literal
    assert(q2.vars.head.tupleConds.head.rhs == Lit("A  B"))
  }

  test("undeclared variable in SUCH THAT is rejected, not silently dropped") {
    val e = intercept[IllegalArgumentException](MfSqlParser.parse(
      """SELECT cust, avg(X.quant) AS a
        |FROM sales GROUP BY cust ; X
        |SUCH THAT Y.cust = cust AND Y.state = 'NATION_1'""".stripMargin, cols))
    assert(e.getMessage.contains("undeclared variable 'Y'"))
  }

  test("multiple aggregates per variable become sibling grouping variables") {
    import spark.implicits._
    val df = Seq(("a", "NY", 1), ("a", "NY", 5), ("a", "CT", 9)).toDF("g", "state", "quant")
    val q = MfSqlParser.parse(
      """SELECT g, sum(X.quant) AS s_ny, max(X.quant) AS m_ny
        |FROM t GROUP BY g ; X
        |SUCH THAT X.g = g AND X.state = 'NY'""".stripMargin,
      Set("g", "state", "quant"))
    assert(q.vars.length == 2 && q.vars.map(_.conds).distinct.size == 1)
    val out = EmfPlanner.plan(q, df).collect().head
    assert(out.getLong(1) == 6L && out.getInt(2) == 5)
  }

  test("clear errors for malformed SQL") {
    val e1 = intercept[IllegalArgumentException](
      MfSqlParser.parse("SELECT cust FROM sales", cols))
    assert(e1.getMessage.contains("GROUP BY"))
    val e2 = intercept[IllegalArgumentException](MfSqlParser.parse(
      "SELECT cust, avg(X.quant) AS a FROM sales GROUP BY cust ; X SUCH THAT X.bogus = cust",
      cols))
    assert(e2.getMessage.contains("bogus"))
  }

  test("q8 (dependent-on-windowed) in SUCH-THAT SQL equals the positional form") {
    val sql =
      """SELECT cust, month, avg(B.quant) AS avg_quant_1, count(C.quant) AS count_quant_2
        |FROM sales
        |WHERE year = 1997
        |GROUP BY cust, month ; B, C
        |SUCH THAT B.cust = cust AND B.month < month,
        |          C.cust = cust AND C.month = month AND C.quant > avg_quant_1""".stripMargin
    val q = MfSqlParser.parse(sql, cols)
    val fact = Tables.salesView(spark, sf0001)
    val got = EmfPlanner.plan(q, fact).orderBy("cust", "month").collect().toSeq
    val want = EmfPlanner.plan(GoldenQueries.parsed(7), fact)
      .orderBy("cust", "month").collect().toSeq
    assert(got == want)
  }
}
