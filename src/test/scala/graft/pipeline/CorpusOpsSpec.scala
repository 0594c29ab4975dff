package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  private def run(name: String) = CorpusOps.queries(name)(spark, sf0001)

  test("corpus_diff: census is conservation-consistent with the snapshot rules") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
    val nDocs = docs.count()
    val nDel = docs.filter(pmod(col("doc_id"), lit(17)) === 0).count()
    val nIns = docs.filter(pmod(col("doc_id"), lit(13)) === 0).count()
    // changed = edited (%7) minus those that were deleted (%17 too)
    val nChg = docs.filter(pmod(col("doc_id"), lit(7)) === 0 &&
      pmod(col("doc_id"), lit(17)) =!= 0).count()
    val rows = CorpusOps.queries("corpus_diff")(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    def tot(st: String) = rows.filter(_._1 == st).map(_._2).sum
    assert(tot("removed") == nDel)
    assert(tot("added") == nIns)
    assert(tot("changed") == nChg)
    assert(tot("unchanged") == nDocs - nDel - nChg)
    // edits prepend "v2 " (+4 chars incl space? "v2 " = 3), inserts
    // prepend "new " (4): char deltas are exactly determined
    assert(rows.filter(_._1 == "changed").map(_._3).sum == 3 * nChg)
    val insChars = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
      .agg(sum(length(col("text")) + 4)).collect()(0).getLong(0)
    assert(rows.filter(_._1 == "added").map(_._3).sum == insChars)
  }

  test("corpus_upsert: delta wins, base survives untouched, inserts land") {
    val base = graft.Tables.documents(spark, sf0001)
    val nBase = base.count()
    val df = run("corpus_upsert")
    val rows = df.collect()
    val byId = rows.map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val nUpd = base.filter(col("doc_id") % 7 === 0).count()
    val nIns = base.filter(col("doc_id") % 13 === 0).count()
    assert(rows.length == nBase + nIns, "merged size = base + net-new")
    // every updated id carries the delta version ('v2 ' prefix = +3 chars)
    val origLen = base.select(col("doc_id"), length(col("text")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    var updSeen = 0
    origLen.foreach { case (id, n) =>
      if (id % 7 == 0) { assert(byId(id) == ("delta", n + 3)); updSeen += 1 }
      else assert(byId(id) == ("base", n))
    }
    assert(updSeen == nUpd && updSeen > 0)
    // no wide shuffle of the base side: with a small delta the anti join
    // must resolve (statically or via AQE) to a broadcast hash join
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical.take(500))
  }

  test("decontaminate broadcasts the eval shingle set and excludes eval docs") {
    val df = run("decontaminate")
    val physical = df.queryExecution.executedPlan.toString
    // the eval side must arrive as a broadcast, not a shuffle join: at
    // corpus scale the train side is 100 TB and the benchmark side is MBs
    assert(physical.contains("BroadcastHashJoin"), physical.take(800))
    val rows = df.collect()
    assert(rows.forall(_.getLong(0) % 97 != 0), "eval docs leaked into output")
    rows.foreach { r =>
      val (nSh, nShared) = (r.getLong(1), r.getLong(2))
      assert(nShared >= 1 && nShared <= nSh)
      assert(math.abs(r.getDouble(3) - nShared.toDouble / nSh) == 0.0)
    }
  }

  test("line_dedup passage accounting is self-consistent") {
    val out = run("line_dedup").cache()
    // every doc appears exactly once, n_dup bounded by n_passages
    val docs = graft.Tables.documents(spark, sf0001).count()
    assert(out.count() == docs)
    assert(out.filter(col("n_dup") > col("n_passages")).count() == 0)
    // total passages = sum over docs of ceil(words/10)
    val expected = graft.Tables.documents(spark, sf0001)
      .select(ceil(size(split(col("text"), " ")) / lit(10.0)).cast("long").as("c"))
      .agg(sum(col("c"))).head.getLong(0)
    assert(out.agg(sum(col("n_passages"))).head.getLong(0) == expected)
    out.unpersist()
  }

  test("mix_resample downsamples toward the smallest lang, deterministically") {
    val a = run("mix_resample").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = run("mix_resample").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b), "resample must be deterministic")
    val minBefore = a.map(_._2).min
    a.foreach { case (lang, before, after) =>
      assert(after <= before, s"$lang grew")
      // hash-uniformity tolerance: within the binomial 4-sigma band of
      // the target rate min/before at these counts
      val target = minBefore.toDouble
      val sigma = math.sqrt(target)
      assert(math.abs(after - target) <= 4 * sigma + 1,
        s"$lang: after=$after target=$target")
    }
    // the smallest lang keeps (nearly) everything: rate = 1 means the
    // keep rule bucket*n < min*1e6 admits every bucket
    val smallest = a.minBy(_._2)
    assert(smallest._3 == smallest._2, "rate-1 lang must keep all docs")
  }

  test("text_redact leaves no addresses or long digit runs behind") {
    val rows = run("text_redact").collect()
    rows.foreach { r =>
      val (id, nEmail, nNum, red) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))
      assert(nEmail == (if (id % 3 == 0) 2 else 1))
      assert(nNum >= 1) // the injected ref number
      assert(!red.contains("@"), s"doc $id: unredacted email")
      assert(!"[0-9]{4,}".r.findFirstIn(red).isDefined,
        s"doc $id: unredacted digit run")
      assert(red.contains("[EMAIL]") && red.contains("[NUM]"))
    }
  }

  test("text_surprisal ppm mass bounds: every token contributes >= 1e6") {
    // t/c >= 1 for every word, so floor(t*1e6/c) >= 1e6 per token
    val bad = run("text_surprisal")
      .filter(col("rarity_ppm") < col("n_tok") * lit(1000000L)).count()
    assert(bad == 0)
  }

  test("text_bigram_lm: scalar replay of the conditional ratio, c1 = sum of c2") {
    val texts = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val bigrams = texts.toSeq.flatMap { case (id, ws) =>
      ws.zip(ws.tail).map(b => (id, b))
    }
    val c2 = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap // conditioning mass = Σ_w2 c2(w1, ·)
    val got = run("text_bigram_lm").collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val bs = bigrams.filter(_._1 == id).map(_._2)
      assert(r.getLong(1) == bs.length.toLong, s"doc $id n_bigrams")
      val expect = bs.map(b => c1(b._1) * 1000000L / c2(b)).sum
      assert(r.getLong(2) == expect, s"doc $id lm_ppm")
      // a true conditional: every bigram contributes >= 1e6 ppm
      assert(r.getLong(2) >= r.getLong(1) * 1000000L)
    }
  }

  test("text_ppl_filter: scalar replay of held-out scoring incl. the backoff path") {
    val rows = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).toSeq))
    def bgs(ws: Seq[String]) = ws.zip(ws.drop(1))
    val c2 = rows.filter(_._1 % 2 == 0).flatMap(r => bgs(r._3))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = c1.size.toLong
    val perDoc = rows.filter(_._1 % 2 != 0).flatMap { case (id, lang, ws) =>
      val bs = bgs(ws)
      if (bs.isEmpty) None else {
        val inv = bs.groupBy(identity).map { case (b, occ) =>
          occ.length.toLong *
            ((c1.getOrElse(b._1, 0L) + v) * 1000000L / (c2.getOrElse(b, 0L) + 1L))
        }.sum
        Some((lang, inv / bs.length))
      }
    }
    // the held-out split must actually exercise the backoff (unseen
    // bigrams in the scored half) or the LEFT joins are dead code
    val scored = rows.filter(_._1 % 2 != 0).flatMap(r => bgs(r._3))
    assert(scored.exists(b => !c2.contains(b)), "no unseen bigram scored")
    val want = perDoc.groupBy(_._1).map { case (lang, xs) =>
      lang -> (xs.length.toLong,
        xs.count(_._2 > 50000000L).toLong,
        xs.map(_._2).sum / xs.length) }
    val got = run("text_ppl_filter").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"got=$got want=$want")
  }

  test("emb_centroid fixed-point result is within 2^-20 of the exact mean") {
    val exact = graft.Tables.embeddings(spark, sf0001)
      .select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("p", "v")))
      .groupBy(col("label"), (col("p") + 1).as("pos"))
      .agg(avg(col("v")).as("exact"))
    val got = run("emb_centroid")
    val worst = got.join(exact, Seq("label", "pos"))
      .select(max(abs(col("centroid") - col("exact")))).head.getDouble(0)
    assert(worst <= math.pow(2, -20), s"quantization error $worst")
    // partial aggregation must be active: the exploded frame shuffles
    // only (label, pos) cells, not raw rows
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(500))
  }

  test("temperature_resample: scalar replay; sqrt softening sits between equalize and keep-all") {
    val got = run("temperature_resample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy(_._2)
    val nMin = byLang.values.map(_.length).min.toLong
    got.foreach { case (lang, nBefore, keepPpm, nKept) =>
      val d = byLang(lang)
      assert(nBefore == d.length.toLong)
      // replay the exact IEEE sequence: ratio, sqrt, scale, floor
      assert(keepPpm ==
        math.floor(math.sqrt(nMin.toDouble / nBefore.toDouble) * 1000000d).toLong)
      val kept = d.count { case (id, _) =>
        val m = (id % 1000003L) * 2654435761L
        ((m ^ (m >> 13)) % 1000000L) < keepPpm
      }
      assert(nKept == kept.toLong, lang)
      // the smallest language is kept whole (keep_ppm = 1e6 > any bucket)
      if (nBefore == nMin) assert(nKept == nBefore, s"$lang min-lang thinned")
      // α=0.5 sits strictly between α=0 (equalize: expected mass ~n_min)
      // and α=1 (keep all): expected kept mass is √(n_min·n_before)
      assert(nKept <= nBefore)
    }
    // keep rate is monotone non-increasing in language size
    val sorted = got.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((_, _, p1, _), (_, _, p2, _)) => assert(p2 <= p1)
      case _ =>
    }
  }

  test("sample_weighted: scalar keep-rule replay; quality shifts upward") {
    val got = run("sample_weighted").collect()
    // scalar replay: quality-clamped keep probability on the same hash
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map { r =>
        val (id, lang, text) = (r.getLong(0), r.getString(1), r.getString(2))
        val words = text.split(" ", -1)
        val stop = Set("the", "a", "an", "and", "of", "to", "in", "is")
        val nStop = words.count(stop).toLong
        val nPunct = text.count(c => !((c >= 'A' && c <= 'Z') ||
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ')).toLong
        val q = nStop * 2000000L / words.length - nPunct * 5000000L / text.length
        val m = (id % 1000003L) * 2654435761L
        val bucket = (m ^ (m >> 13)) % 1000000L
        (lang, q, bucket < math.max(0L, math.min(q, 1000000L)))
      }
    val byLang = docs.groupBy(_._1)
    got.foreach { r =>
      val lang = r.getString(0)
      val d = byLang(lang)
      val kept = d.filter(_._3)
      assert(r.getLong(1) == d.length.toLong, s"$lang n_before")
      assert(r.getLong(2) == kept.length.toLong, s"$lang n_kept")
      assert(r.getLong(3) == kept.length.toLong * 1000000L / d.length)
      assert(r.getLong(4) == d.map(_._2).sum / d.length)
      if (kept.nonEmpty)
        assert(r.getLong(5) == kept.map(_._2).sum / kept.length)
      // importance sampling SHIFTS quality upward (deterministic
      // fixture fact — the keep probability is monotone in quality)
      if (kept.nonEmpty)
        assert(r.getLong(5) >= r.getLong(4), s"$lang quality did not rise")
    }
    assert(run("sample_weighted").collect().toSeq == got.toSeq, "deterministic")
  }

  test("source_drift: scalar replay of the TV arithmetic agrees") {
    val raw = graft.Tables.documents(spark, sf0001)
      .select(col("source"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0),
        r.getString(1) + "|" + math.min(r.getLong(2) / 500, 3L)))
    val nTot = raw.length.toLong
    val nB = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bySrc = raw.groupBy(_._1)
    val got = run("source_drift").collect()
    assert(got.map(_.getString(0)).toSeq == bySrc.keys.toSeq.sorted)
    got.foreach { r =>
      val (src, nDocs, tvPpm, topB, topDev) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getString(3), r.getLong(4))
      val docs = bySrc(src)
      assert(nDocs == docs.length.toLong)
      val nSb = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      // full grid: buckets the source never hit still contribute n_b·n_s
      val devs = nB.map { case (b, nb) =>
        b -> math.abs(nSb.getOrElse(b, 0L) * nTot - nb * nDocs)
      }
      assert(tvPpm == devs.values.sum * 1000000L / (2 * nTot * nDocs), src)
      val best = devs.toSeq.sortBy { case (b, dv) => (-dv, b) }.head
      assert((topB, topDev) == best, s"$src worst bucket")
      assert(tvPpm >= 0 && tvPpm <= 1000000L)
    }
  }

  test("dataset_card: datasheet replays from collected documents") {
    val r = CorpusOps.queries("dataset_card")(spark, sf0001).head()
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("text"), col("lang"), col("source"), col("n_chars")).collect()
    assert(r.getAs[Long]("n_docs") == docs.length)
    assert(r.getAs[Long]("n_langs") == docs.map(_.getAs[String]("lang")).distinct.length)
    assert(r.getAs[Long]("n_sources") == docs.map(_.getAs[String]("source")).distinct.length)
    assert(r.getAs[Long]("total_chars") == docs.map(_.getAs[Long]("n_chars")).sum)
    assert(r.getAs[Long]("total_tokens") ==
      docs.map(_.getAs[String]("text").split(" ", -1).length.toLong).sum)
    val uniq = docs.map(_.getAs[String]("text")).distinct.length
    assert(r.getAs[Long]("dup_text_ppm") ==
      (docs.length - uniq) * 1000000L / docs.length)
    val sorted = docs.map(_.getAs[Long]("n_chars")).sorted
    val med2 = if (sorted.length % 2 == 1) 2 * sorted(sorted.length / 2)
               else sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)
    assert(r.getAs[Long]("len_med2") == med2)
  }

  test("corpus_forget: census conserves the corpus and the delete rule is exact") {
    val got = CorpusOps.queries("corpus_forget")(spark, sf0001).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("n_deleted"),
          r.getAs[Long]("chars_kept"), r.getAs[Long]("chars_deleted"))).toMap
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect()
    val replay = docs.groupBy(_.getAs[String]("lang")).map { case (lang, rs) =>
      val (del, kept) = rs.partition(r =>
        r.getAs[Long]("doc_id") % 11 == 0 || r.getAs[String]("source") == "src7")
      lang -> (kept.length.toLong, del.length.toLong,
        kept.map(_.getAs[Long]("n_chars")).sum, del.map(_.getAs[Long]("n_chars")).sum)
    }
    assert(got == replay, s"got=$got replay=$replay")
    // something was actually deleted AND kept in every lang bucket
    assert(got.values.forall { case (k, d, _, _) => k > 0 && d > 0 })
    // conservation: kept + deleted recovers the whole corpus
    assert(got.values.map(v => v._1 + v._2).sum == docs.length.toLong)
  }
}
