package graft.emf

import graft.SparkSpec
import org.scalacheck.{Gen, rng}

case class PropRow(g: String, h: String, ord: Int, state: String, x: Int)

/** Property tests (SURVEY.md §5.4): the planner's specialized lowerings
  * must agree with the general join formulation — and with plain SQL — on
  * random small tables. Generators driven directly (deterministic seeds);
  * scalatest+scalacheck only, no scalatestplus bridge in this build. */
class EmfPropertySpec extends SparkSpec {
  import spark.implicits._

  private val cols = Set("g", "h", "ord", "state", "x")

  private val rowGen: Gen[PropRow] = for {
    g <- Gen.oneOf("a", "b", "c")
    h <- Gen.oneOf("p", "q")
    ord <- Gen.choose(1, 5)
    state <- Gen.oneOf("NY", "CT", "NJ")
    x <- Gen.choose(0, 50)
  } yield PropRow(g, h, ord, state, x)

  private def sampleTables(n: Int): Seq[List[PropRow]] =
    (1 to n).map { i =>
      Gen.listOfN(40, rowGen)
        .apply(Gen.Parameters.default, rng.Seed(42L + i)).get
    }

  test("SIMPLE lowering == conditional-agg SQL on random tables") {
    sampleTables(8).foreach { rows =>
      val df = rows.toDF()
      df.createOrReplaceTempView("prop_t")
      val q = EmfParser.parseOne(
        """g,sum_x_NY,count_x_CT
          |2
          |g
          |sum_x_NY,count_x_CT
          |{MF.g.sum_x_NY}[=]{g}:{state}[=]{NY},{MF.g.count_x_CT}[=]{g}:{state}[=]{CT}""".stripMargin, cols)
      val got = EmfPlanner.plan(q, df).orderBy("g").collect().toSeq
      val want = spark.sql(
        """SELECT g, sum(CASE WHEN state='NY' THEN x END) AS sum_x_NY,
          |       count(CASE WHEN state='CT' THEN x END) AS count_x_CT
          |FROM prop_t GROUP BY g ORDER BY g""".stripMargin).collect().toSeq
      assert(got == want, s"rows=$rows")
    }
  }

  test("WINDOWED lowering == join formulation on random tables") {
    sampleTables(8).foreach { rows =>
      val df = rows.toDF()
      df.createOrReplaceTempView("prop_w")
      val qWin = EmfParser.parseOne(
        """g,ord,avg_x_before
          |1
          |g,ord
          |avg_x_before
          |{MF.g.avg_x_before}[=]{g}:{MF.ord.avg_x_before}[<]{ord}""".stripMargin, cols)
      val got = EmfPlanner.plan(qWin, df).orderBy("g", "ord").collect().toSeq
      val want = spark.sql(
        """SELECT m.g, m.ord, b.avg_x_before
          |FROM (SELECT DISTINCT g, ord FROM prop_w) m
          |LEFT JOIN (SELECT m2.g, m2.ord, avg(t.x) AS avg_x_before
          |           FROM (SELECT DISTINCT g, ord FROM prop_w) m2
          |           JOIN prop_w t ON t.g = m2.g AND t.ord < m2.ord
          |           GROUP BY 1, 2) b
          |ON m.g = b.g AND m.ord = b.ord
          |ORDER BY g, ord""".stripMargin).collect().toSeq
      assert(got == want, s"rows=$rows")
    }
  }

  test("DEPENDENT lowering (!= membership) == join SQL on random tables") {
    sampleTables(8).foreach { rows =>
      val df = rows.toDF()
      df.createOrReplaceTempView("prop_d")
      val q = EmfParser.parseOne(
        """g,sum_x_oth
          |1
          |g
          |sum_x_oth
          |{MF.g.sum_x_oth}[!=]{g}""".stripMargin, cols)
      val got = EmfPlanner.plan(q, df).orderBy("g").collect().toSeq
      val want = spark.sql(
        """SELECT m.g, o.sum_x_oth
          |FROM (SELECT DISTINCT g FROM prop_d) m
          |LEFT JOIN (SELECT m2.g, sum(t.x) AS sum_x_oth
          |           FROM (SELECT DISTINCT g FROM prop_d) m2
          |           JOIN prop_d t ON t.g <> m2.g GROUP BY 1) o
          |ON m.g = o.g ORDER BY m.g""".stripMargin).collect().toSeq
      assert(got == want, s"rows=$rows")
    }
  }

  test("dedup idempotent; sum/count/avg consistent on random tables") {
    sampleTables(4).foreach { rows =>
      val df = rows.toDF()
      val once = df.dropDuplicates()
      assert(once.dropDuplicates().count() == once.count())
      val agg = df.groupBy("g")
        .agg(org.apache.spark.sql.functions.sum($"x").as("s"),
          org.apache.spark.sql.functions.count($"x").as("c"),
          org.apache.spark.sql.functions.avg($"x").as("a"))
        .collect()
      agg.foreach { r =>
        assert(math.abs(r.getLong(1).toDouble / r.getLong(2) - r.getDouble(3)) < 1e-9)
      }
    }
  }
}
