package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  test("csv round-trip preserves data") {
    val nation = Tables.nation(spark, sf0001)
    val dir = tmp("csv")
    Sources.writeCsv(nation, dir)
    val back = Sources.readCsv(spark, dir)
    assert(back.count() == nation.count())
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("orc round-trip preserves data and pushes filters to the scan") {
    val nation = Tables.nation(spark, sf0001)
    val dir = tmp("orc")
    Sources.writeOrc(nation, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    // ORC is the second columnar format with real pushdown: the filter
    // must reach the scan, not evaluate post-scan only
    val plan = back.filter(col("n_regionkey") === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"), plan)
  }

  test("text source reads raw lines as one value column") {
    val dir = tmp("text")
    Sources.writeText(
      Tables.documents(spark, sf0001).select(col("text")), dir)
    val back = Sources.readText(spark, dir)
    assert(back.columns.toSeq == Seq("value"))
    assert(back.count() == Tables.documents(spark, sf0001).count())
  }

  test("json round-trip preserves data") {
    val region = Tables.region(spark, sf0001)
    val dir = tmp("json")
    Sources.writeJson(region, dir)
    val back = Sources.readJson(spark, dir)
      .select("r_regionkey", "r_name") // json reorders columns alphabetically
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("jdbc round-trip through embedded Derby, predicate pushed to the DB") {
    val base = tmp("derby")
    System.setProperty("derby.stream.error.file", s"$base/derby.log")
    val url = s"jdbc:derby:$base/db;create=true"
    val nation = Tables.nation(spark, sf0001)
    Sources.writeJdbc(nation, url, "nation")
    val back = Sources.readJdbc(spark, url, "nation")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    // the filter must reach the database, not run in Spark post-fetch
    val filtered = back.filter(col("n_regionkey") === 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"), plan)
    assert(filtered.count() == nation.filter(col("n_regionkey") === 1).count())
  }

  test("partitioned parquet sink enables partition pruning") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    val dir = tmp("part")
    Sources.writePartitioned(li, dir, "l_returnflag")
    val back = Sources.readParquet(spark, dir).filter(col("l_returnflag") === "R")
    assert(back.count() == li.filter(col("l_returnflag") === "R").count())
    // pruning proof: only the R partition directory is read
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
  }
}
