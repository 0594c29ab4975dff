package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangIdNbSpec extends SparkSpec {

  test("langid_nb matches a plain-Scala NB train + classify walk") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def lnMicro(x: Double): Long = math.round(math.log(x) * 1e6)
    // train
    val langWord = docs
      .flatMap { case (_, l, t) => t.split(" ", -1).map(w => (l, w)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = langWord.keys.map(_._2).toSet.size.toLong
    val langTot = langWord.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val prior = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val langs = prior.keys.toSeq.sorted
    // classify every doc with the same integer micro-nat formula
    val confusion = docs.map { case (_, trueLang, t) =>
      val cs = t.split(" ", -1).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      val nTok = t.split(" ", -1).length.toLong
      // deterministic tie-break: max score, then MIN lang — exactly the
      // query's row_number ORDER BY (score DESC, lang ASC)
      val pred = langs.map { lang =>
        val t1 = cs.map { case (w, c) =>
          c * lnMicro(langWord.getOrElse((lang, w), 0L) + 1.0)
        }.sum
        val score = lnMicro(prior(lang).toDouble) + t1 -
          nTok * lnMicro((langTot(lang) + vocab).toDouble)
        (-score, lang)
      }.min._2
      (trueLang, pred)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = LangIdNb.queries("langid_nb")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == confusion,
      s"confusion mismatch:\n got $got\n want $confusion")
  }

  test("langid_nb row mass equals the corpus and diagonal dominates chance") {
    val rows = LangIdNb.queries("langid_nb")(spark, sf0001).collect()
    val total = rows.map(_.getLong(2)).sum
    val n = graft.Tables.documents(spark, sf0001).count()
    assert(total == n, s"matrix mass $total != corpus $n")
    // with 5 langs, chance diagonal ≈ 20%; the trained model must at
    // least beat chance on its own training corpus (it sees the labels)
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    assert(diag * 5 > n, s"diagonal $diag of $n is no better than chance")
  }
}
