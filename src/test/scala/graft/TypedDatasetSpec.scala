package graft

import org.apache.spark.sql.functions._

case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

/** Typed Dataset surface (SURVEY.md §1.1 "typed view Dataset[T]"):
  * case-class encoders, typed transforms, groupByKey aggregation — with
  * results cross-checked against the untyped DataFrame formulation. */
class TypedDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def ds = Tables.lineitem(spark, sf0001)
    .select($"l_orderkey", $"l_quantity", $"l_returnflag").as[Line]

  test("typed filter/map agree with Column filter/select") {
    val typed = ds.filter(_.l_returnflag == "R").map(_.l_quantity).reduce(_ + _)
    val untyped = Tables.lineitem(spark, sf0001)
      .filter($"l_returnflag" === "R")
      .agg(sum($"l_quantity")).head.getDouble(0)
    assert(math.abs(typed - untyped) < 1e-6)
  }

  test("groupByKey + mapGroups equals groupBy agg") {
    val typed = ds.groupByKey(_.l_returnflag)
      .mapGroups { (k, it) => (k, it.map(_.l_quantity).sum) }
      .collect().toMap
    val untyped = Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag").agg(sum($"l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) => assert(math.abs(v - untyped(k)) < 1e-6) }
  }

  test("joinWith produces typed pairs") {
    val lines = ds
    val orders = Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice").as[(Long, Double)]
    val pairs = lines.joinWith(orders, lines("l_orderkey") === orders("o_orderkey"))
      .limit(5).collect()
    pairs.foreach { case (line, (ok, _)) => assert(line.l_orderkey == ok) }
  }
}
