package graft

import org.apache.spark.sql.functions._

/** Curation-operator semantics, verified against independent Scala
  * reimplementations (the DuckDB oracle already pins engine parity; these
  * pin the INTENDED semantics — greedy maximality, stratum quotas,
  * hash-rank selection, GROUPS-frame equivalence — so an oracle-matching
  * but wrong-by-design change still fails). */
class CurationSpec extends GraftSuite {

  private def knuth(id: Long): Long = (id * 2654435761L) % 4294967296L

  private def round9(x: Double): Double =
    BigDecimal.valueOf(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The q_text_quality formula, reimplemented from scratch. */
  private def quality(nChars: Long, text: String): Double = {
    val w = text.split(" ", -1)
    val stop = Set("the", "a", "of", "and", "is")
    val ratio = w.count(stop).toDouble / w.length
    round9(0.5 * math.min(nChars / 400.0, 1.0) + 0.5 * math.min(ratio * 10, 1.0))
  }

  private def docs() =
    Tables.df(spark, sf, "documents")
      .select("doc_id", "lang", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("q_cur_sample_hash selects exactly the ids whose Knuth hash clears the rate") {
    val sampled = SparkEntry.queries("q_cur_sample_hash")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = docs().map(_._1).filter(id => knuth(id) < 858993459L).toSet
    assert(sampled == expected)
    assert(sampled.nonEmpty && sampled.size < docs().length)
  }

  test("q_cur_sample_stratified takes ceil(25%) of every stratum by hash rank") {
    val got = SparkEntry.queries("q_cur_sample_stratified")(spark, sf)
      .select("lang", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byLang = docs().groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val quota = math.ceil(rows.length * 0.25).toLong
      val expect = rows.map(_._1).sortBy(id => (knuth(id), id)).take(quota.toInt).toSet
      assert(got(lang) == expect, s"stratum $lang")
    }
    assert(got.keySet == byLang.keySet)
  }

  test("q_cur_mix_langs balances every stratum to the smallest one") {
    val got = SparkEntry.queries("q_cur_mix_langs")(spark, sf)
      .select("lang", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byLang = docs().groupBy(_._2)
    val target = byLang.values.map(_.length).min
    byLang.foreach { case (lang, rows) =>
      val expect = rows.map(_._1).sortBy(id => (knuth(id), id)).take(target).toSet
      assert(got(lang) == expect, s"stratum $lang")
      assert(got(lang).size == target)
    }
  }

  test("q_cur_split partitions the whole corpus; buckets respect the 80/10/10 fences") {
    val rows = SparkEntry.queries("q_cur_split")(spark, sf)
      .select("doc_id", "bucket", "split").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.length == docs().length)
    assert(rows.map(_._1).toSet == docs().map(_._1).toSet)
    rows.foreach { case (id, b, split) =>
      assert(b >= 0 && b < 100, s"doc $id bucket $b")
      val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(split == expect, s"doc $id")
    }
  }

  test("q_cur_leakage_audit = verified near-dup pairs whose endpoints straddle splits") {
    val splits = SparkEntry.queries("q_cur_split")(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.filter { case (i, j) => splits(i) != splits(j) }.toSet
    val got = SparkEntry.queries("q_cur_leakage_audit")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("q_cur_split_leakfree: zero near-dup pairs straddle splits; clusters are split-uniform") {
    val sp = SparkEntry.queries("q_cur_split_leakfree")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val splitOf = sp.map { case (id, _, s) => id -> s }.toMap
    // every verified near-dup pair lands on one side of the wall
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (i, j) =>
      assert(splitOf(i) == splitOf(j), s"pair ($i, $j) straddles splits")
    }
    // the whole corpus is assigned, and every cluster is split-uniform
    assert(sp.length == SparkEntry.queries("q_cur_split")(spark, sf).count())
    sp.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._3).distinct.length == 1, s"cluster $cid mixed")
    }
  }

  test("q_cur_token_budget is the maximal greedy quality-ordered prefix under budget") {
    val scored = docs().map { case (id, _, text, nChars) =>
      (id, quality(nChars, text), text.split(" ", -1).length)
    }
    val budget = 0.25 * scored.map(_._3.toLong).sum
    val ordered = scored.sortBy { case (id, q, _) => (-q, id) }
    var cum = 0L
    val expect = ordered.takeWhile { case (_, _, n) => { cum += n; cum <= budget } }
    val got = SparkEntry.queries("q_cur_token_budget")(spark, sf)
      .select("doc_id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).toSeq == expect.map(_._1).toSeq)
    // distributed two-pass prefix sums equal the sequential ones
    val cums = expect.scanLeft(0L)(_ + _._3).drop(1)
    assert(got.map(_._2).toSeq == cums.toSeq)
    // maximality: the next doc in quality order would overflow the budget
    if (expect.length < ordered.length)
      assert(cums.lastOption.getOrElse(0L) + ordered(expect.length)._3 > budget)
  }

  test("q_cur_keep_best keeps the max-quality member of every near-dup cluster") {
    val q = docs().map { case (id, _, text, nChars) => id -> quality(nChars, text) }.toMap
    val clusters = SparkEntry.queries("q_dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.nonEmpty, "expected planted near-dup clusters at this SF")
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val got = SparkEntry.queries("q_cur_keep_best")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.map(_._1).toSet == byCluster.keySet)
    got.foreach { case (cid, keep, kq, nm) =>
      val members = byCluster(cid)
      assert(nm == members.length, s"cluster $cid size")
      val best = members.minBy(id => (-q(id), id))
      assert(keep == best && kq == q(best), s"cluster $cid keep")
    }
  }

  test("q_cur_ann_int8 top-10 overlaps exact-cosine top-10 (observed 8/10 here)") {
    val exact = SparkEntry.queries("q_ann_bruteforce")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = SparkEntry.queries("q_cur_ann_int8")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((exact & quant).size >= 7, s"overlap ${(exact & quant).size}/10")
  }

  test("q_window_groups_emul matches brute-force GROUPS-frame semantics") {
    val rows = Tables.df(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate").cast("date").as("day"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate, r.getDouble(3)))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, grp) =>
      val drOf = grp.map(_._3).distinct
        .sortWith((a, b) => a.compareTo(b) < 0)
        .zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
      grp.toSeq.map { case (ok, _, day, _) =>
        val dr = drOf(day)
        val sum = grp.filter(r => { val d = drOf(r._3); d >= dr - 2 && d <= dr })
          .map(r => BigDecimal.valueOf(r._4).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum
        ok -> ((dr, sum.toDouble))
      }
    }
    val got = SparkEntry.queries("q_window_groups_emul")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getDouble(3))).toMap
    assert(got.size == rows.length)
    expected.foreach { case (ok, e) => assert(got(ok) == e, s"orderkey $ok") }
  }

  test("q_window_exclude_emul matches brute-force SQL:2011 EXCLUDE semantics with ties") {
    // Recompute all three EXCLUDE variants from first principles over the
    // corpus + the query's same-ts fixture rows (peers = rows equal on the
    // single ORDER BY key ts; RANGE frame spans all peers).
    val base = Tables.df(spark, sf, "events")
      .selectExpr("event_id", "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS tsu", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def us(h: String, m: String) =
      java.time.LocalDateTime.parse(s"2023-11-15T$h:$m:00")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val fix = Seq(
      (9000000200000000L, 1000000000000003L, us("00", "00"), 10.0),
      (9000000200000001L, 1000000000000003L, us("00", "00"), 20.0),
      (9000000200000002L, 1000000000000003L, us("00", "00"), 30.0),
      (9000000200000003L, 1000000000000003L, us("00", "10"), 5.5),
      (9000000200000004L, 1000000000000004L, us("00", "00"), 7.25),
      (9000000200000005L, 1000000000000004L, us("00", "00"), 8.75))
    val all = base ++ fix
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val expected = all.groupBy(_._2).toSeq.flatMap { case (_, grp) =>
      grp.map { case (eid, _, ts, v) =>
        val le = grp.filter(_._3 <= ts)
        val peers = grp.filter(_._3 == ts)
        val leS = le.map(r => d2(r._4)).sum
        val pS = peers.map(r => d2(r._4)).sum
        val exclRow = if (le.size > 1) Some((leS - d2(v)).toDouble) else None
        val exclGroup = if (le.size - peers.size > 0) Some((leS - pS).toDouble) else None
        val exclTies = (leS - pS + d2(v)).toDouble
        eid -> ((exclRow, exclGroup, exclTies))
      }
    }.toMap
    val got = SparkEntry.queries("q_window_exclude_emul")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getDouble(4)))).toMap
    assert(got.size == all.length)
    expected.foreach { case (eid, e) => assert(got(eid) == e, s"event $eid") }
    // The tie branch must actually be exercised: on a fixture tie row with
    // earlier history, GROUP and CURRENT ROW exclusion genuinely diverge.
    val tieRow = got(9000000200000001L) // 20.0 at ts0: peers sum 60, no history
    assert(tieRow._1 == Some(40.0) && tieRow._2 == None && tieRow._3 == 20.0)
    val afterTies = got(9000000200000003L) // 5.5 after the 3-way tie
    assert(afterTies._1 == Some(60.0) && afterTies._2 == Some(60.0) && afterTies._3 == 65.5)
  }

  test("q_cur_decontaminate equals brute-force shingle-set intersection") {
    val all = Tables.df(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(text: String): Set[String] = {
      val w = text.split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val eval = all.filter(_._2 == "src0").map(r => r._1 -> shingles(r._3))
      .filter(_._2.nonEmpty)
    val corpus = all.filter(_._2 != "src0").map(r => r._1 -> shingles(r._3))
      .filter(_._2.nonEmpty)
    val expect = (for {
      (cid, csh) <- corpus
      (eid, esh) <- eval
      n = (csh & esh).size if n >= 5
    } yield (cid, eid) -> n).toMap
    val got = SparkEntry.queries("q_cur_decontaminate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == expect)
  }

  test("q_cur_pack bins equal the hash-order cumulative chunk assignment") {
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).length))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (lang, grp) =>
      var cum = 0L
      grp.sortBy(d => (knuth(d._1), d._1)).map { case (_, _, n) =>
        val bin = cum / 512 // chunk of the doc's first token
        cum += n
        (lang, bin, n)
      }
    }.groupBy(t => (t._1, t._2)).view
      .mapValues(g => (g.size.toLong, g.map(_._3.toLong).sum)).toMap
    val got = SparkEntry.queries("q_cur_pack")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    // packing invariant: every bin holds >= 512 cumulative tokens except
    // possibly each lang's last one (docs attributed to starting chunk)
    assert(got.nonEmpty)
  }

  test("q_cur_quality_gate keeps exactly the docs at/above the exact P90; approx sketch within 1%") {
    val rows = SparkEntry.queries("q_cur_quality_gate")(spark, sf).collect()
    assert(rows.nonEmpty)
    val thr = rows.head.getDouble(3)
    val kept = rows.map(_.getLong(0)).toSet
    val qual = SparkEntry.queries("q_text_quality")(spark, sf)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(kept == qual.filter(_._2 >= thr).map(_._1).toSet)
    // the 100 TB path: approx_percentile's bounded sketch lands within 1%
    val approx = Tables.df(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("w"))
      .select(expr("round(0.5 * least(n_chars / 400.0, 1.0) + 0.5 * least(" +
        "size(filter(w, t -> t IN ('the', 'a', 'of', 'and', 'is'))) / cast(size(w) as double)" +
        " * 10, 1.0), 9)").as("q"))
      .agg(expr("approx_percentile(q, 0.9D, 10000)")).head().getDouble(0)
    assert(math.abs(approx - thr) / thr < 0.01, s"approx $approx vs exact $thr")
  }

  test("q_cur_end2end equals the composition of its independently-verified stages") {
    val srcOf = Tables.df(spark, sf, "documents")
      .select("doc_id", "source", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val quality = SparkEntry.queries("q_text_quality")(spark, sf)
      .select("doc_id", "quality").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nTokens = SparkEntry.queries("q_text_stats")(spark, sf)
      .select("doc_id", "n_tokens").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val repetitive = SparkEntry.queries("q_text_repetition")(spark, sf)
      .select("doc_id", "repetitive").collect()
      .filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    val contaminated = SparkEntry.queries("q_cur_decontaminate")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val split = SparkEntry.queries("q_cur_split")(spark, sf)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = srcOf.toSeq
      .filter { case (id, (src, _)) =>
        src != "src0" && quality(id) >= 0.5 &&
          !repetitive(id) && !contaminated(id)
      }
      .groupBy { case (id, (_, lang)) => (lang, split(id)) }
      .map { case (k, grp) =>
        k -> ((grp.size.toLong, grp.map { case (id, _) => nTokens(id).toLong }.sum))
      }
    val got = SparkEntry.queries("q_cur_end2end")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q_cur_datasheet: every reported number re-derives from the stage operators") {
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val quality = SparkEntry.queries("q_text_quality")(spark, sf)
      .select("doc_id", "quality").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nTokens = SparkEntry.queries("q_text_stats")(spark, sf)
      .select("doc_id", "n_tokens").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val repetitive = SparkEntry.queries("q_text_repetition")(spark, sf)
      .select("doc_id", "repetitive").collect()
      .filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    val contaminated = SparkEntry.queries("q_cur_decontaminate")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val textCount = docs.groupBy(_._4).view.mapValues(_.length).toMap
    val expect = docs.groupBy(d => (d._2, d._3)).map { case (k, grp) =>
      k -> ((grp.length.toLong,
        grp.map(d => nTokens(d._1).toLong).sum,
        round9(grp.map(d => math.round(quality(d._1) * 1e9)).sum.toDouble / 1e9 / grp.length),
        grp.count(d => repetitive(d._1)).toLong,
        grp.count(d => textCount(d._4) > 1).toLong,
        grp.count(d => contaminated(d._1)).toLong))
    }
    val got = SparkEntry.queries("q_cur_datasheet")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q_cur_sample_weighted: Efraimidis-Spirakis keys, quality-biased, reproducible") {
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // from-scratch key computation (same formula, independent code path)
    val keys = docs.map { case (id, nc, text) =>
      val u = (knuth(id) + 1).toDouble / 4294967296.0
      (id, quality(nc, text), round9(math.pow(u, 1.0 / quality(nc, text))))
    }
    val expect = keys.sortBy { case (id, _, k) => (-k, id) }.take(100).toSeq
    val got = SparkEntry.queries("q_cur_sample_weighted")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == expect)
    // weighting sanity: the sample's mean quality must beat the corpus mean
    val corpusMean = keys.map(_._2).sum / keys.length
    val sampleMean = got.map(_._2).sum / got.length
    assert(sampleMean > corpusMean,
      s"weighted sample ($sampleMean) should be quality-biased vs corpus ($corpusMean)")
  }

  test("q_cur_domain_cap: heap aggregate equals the window spelling, <=5 per source") {
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("q_cur_domain_cap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val perSource = got.groupBy(_._1)
    assert(perSource.nonEmpty && perSource.values.forall(_.size <= 5))
    // from-scratch window recomputation over the same quality frame
    val w = Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    val expect = Tables.df(spark, sf, "documents").select("doc_id", "source")
      .join(SparkEntry.queries("q_text_quality")(spark, sf).select("doc_id", "quality"), "doc_id")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select("source", "doc_id", "quality", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(got.toSeq == expect.toSeq)
  }

  test("q_cur_pii: redacted text carries no PII shapes and counts are accounted") {
    val rows = SparkEntry.queries("q_cur_pii")(spark, sf).collect()
    assert(rows.nonEmpty)
    val email = "[a-z0-9]+@[a-z.]+[a-z]".r
    val phone = "555-[0-9]{4}".r
    rows.foreach { r =>
      val red = r.getString(3)
      assert(email.findFirstIn(red).isEmpty, s"doc ${r.getLong(0)}: email survived redaction")
      assert(phone.findFirstIn(red).isEmpty, s"doc ${r.getLong(0)}: phone survived redaction")
      // the synthesized suffix guarantees at least one of each; counts
      // must equal the number of placeholders actually substituted
      assert(r.getInt(1) >= 1 && r.getInt(2) >= 1)
      assert("<EMAIL>".r.findAllIn(red).size == r.getInt(1))
      assert("<PHONE>".r.findAllIn(red).size == r.getInt(2))
    }
  }

  test("q_cur_upsert: version lineage and row accounting are exact") {
    val base = Tables.df(spark, sf, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("q_cur_upsert")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(4)))
    val updated = base.keySet.filter(_ % 7 == 0)
    val inserted = base.keySet.filter(_ % 11 == 0).map(_ + 1000000L)
    assert(got.length == base.size + inserted.size, "merge must keep every key exactly once")
    assert(got.map(_._1).toSet == base.keySet ++ inserted)
    got.foreach { case (id, version, nChars) =>
      if (updated(id)) assert(version == 2 && nChars == base(id).length + 5) // ' rev2'
      else if (id >= 1000000L) assert(version == 2)
      else assert(version == 1 && nChars == base(id).length)
    }
  }

  test("q_cur_mix_unimax: budget exhausted exactly, caps respected, max-uniform") {
    val n = Tables.df(spark, sf, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = 72L * n.values.sum / 100L
    val got = SparkEntry.queries("q_cur_mix_unimax")(spark, sf).collect()
    // selected rows == sum of quotas == the budget, to the document
    assert(got.length.toLong == budget, s"${got.length} rows vs budget $budget")
    val quotas = got.map(r => r.getString(1) -> r.getLong(3)).distinct.toMap
    assert(quotas.keySet == n.keySet, "every language participates")
    quotas.foreach { case (l, q) =>
      assert(q <= n(l), s"$l: quota $q exceeds 1-epoch cap ${n(l)}")
    }
    // water-filling uniformity: unsaturated quotas differ by at most 1,
    // and every saturated stratum is smaller than the unsaturated level
    val (satd, unsat) = quotas.partition { case (l, q) => q == n(l) }
    if (unsat.nonEmpty) {
      assert(unsat.values.max - unsat.values.min <= 1)
      satd.values.foreach(c => assert(c <= unsat.values.min))
    }
    // the skewed corpus must actually exercise the mixed branch
    assert(satd.nonEmpty && unsat.nonEmpty,
      s"gate corpus should saturate some strata: $quotas vs caps $n")
  }

  test("q_cur_soft_dedup: probability mass conserved, weights uniform per cluster") {
    val got = SparkEntry.queries("q_cur_soft_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nDocs = Tables.df(spark, sf, "documents").count()
    // every document appears exactly once — soft dedup DROPS nothing
    assert(got.length.toLong == nDocs)
    assert(got.map(_._1).distinct.length == got.length)
    // each cluster contributes exactly 1.0 of sampling mass, so the
    // weight sum equals the cluster count (the deduplicated corpus size)
    val nClusters = got.map(_._2).distinct.length
    val wSum = got.map(_._4).sum
    assert(math.abs(wSum - nClusters) < 1e-5, s"mass $wSum vs $nClusters clusters")
    // csize is the true member count and members share one weight
    got.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.map(_._3).distinct.length == 1 && rows.map(_._4).distinct.length == 1)
      assert(rows.head._3 == rows.length.toLong,
        s"cluster $cid: csize ${rows.head._3} vs ${rows.length} members")
    }
    // the gate corpus exercises both singleton and near-dup-group branches
    assert(got.exists(_._3 == 1L) && got.exists(_._3 > 1L))
  }

  test("q_cur_quality_calibrate equals a from-scratch per-language percentile rank") {
    val got = SparkEntry.queries("q_cur_quality_calibrate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.length
      // replicate percent_rank over (quality, doc_id): (rank-1)/(n-1),
      // rounded exactly as Spark's round(_, 9) rounds (HALF_UP)
      rows.sortBy(r => (r._3, r._1)).zipWithIndex.foreach {
        case ((id, _, _, pct, keep), i) =>
          val exp =
            if (n == 1) 0.0
            else BigDecimal(i.toDouble / (n - 1))
              .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(pct == exp, s"$lang/$id: pct $pct vs $exp")
          assert(keep == (pct >= 0.7))
      }
      // calibration promise: every language keeps ~its top 30%,
      // regardless of how its raw score distribution sits globally
      val kept = rows.count(_._5)
      assert(math.abs(kept.toDouble / n - 0.3) < 0.05, s"$lang kept $kept/$n")
    }
  }

  test("q_cur_curriculum: balanced stages, difficulty-monotone per language") {
    val got = SparkEntry.queries("q_cur_curriculum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3), r.getInt(4)))
    assert(got.nonEmpty)
    got.groupBy(_._2).foreach { case (lang, rows) =>
      // ntile balance: stage sizes differ by at most one, stages 1..4
      val sizes = rows.groupBy(_._5).view.mapValues(_.length).toMap
      assert(sizes.keySet == (1 to 4).toSet, s"$lang stages ${sizes.keySet}")
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang sizes $sizes")
      // monotone: every doc in stage k is no harder than any in stage k+1
      // under the (quality DESC, n_tokens ASC, doc_id) difficulty order
      val ordered = rows.sortBy(r => (-r._3, r._4, r._1)).map(_._5).toSeq
      assert(ordered == ordered.sorted, s"$lang stage order not monotone")
    }
  }

  test("q_cur_scd2: intervals tile [1, 9999) per key, one current row each") {
    val rows = SparkEntry.queries("q_cur_scd2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.head._2 == 1L, s"doc $id history does not start at 1")
      assert(sorted.last._3 == 9999L, s"doc $id has no open interval")
      sorted.sliding(2).foreach {
        case Array((_, _, to, _), (_, from, _, _)) =>
          assert(to == from, s"doc $id gap/overlap: $to vs $from")
        case _ =>
      }
      assert(vs.count(_._4) == 1, s"doc $id current-row count ${vs.count(_._4)}")
      // version counts follow the delta keys: %35 -> 3 rows, %5 or %7 -> 2
      val expected = if (id % 35 == 0) 3 else if (id % 5 == 0 || id % 7 == 0) 2 else 1
      assert(vs.length == expected, s"doc $id has ${vs.length} versions")
    }
  }

  test("epochSchedule: cap, redistribution, and post-redistribution clamp") {
    val s = spark
    import s.implicits._
    // total=7600, budget=15200, base=5066, surplus=4866, utok=7500:
    //  a (100):  round-1 cap at 2 epochs -> 200
    //  c (3500): uncapped at round 1 (5066 < 7000); redistribution adds
    //            (4866*3500) div 7500 = 2270 -> 7336 CLAMPS to 7000
    //  d (4000): redistribution adds (4866*4000) div 7500 = 2595 -> 7661
    val tok = Seq(("a", 100L), ("c", 3500L), ("d", 4000L)).toDF("source", "tok")
    val got = graft.queries.CurationQueries.epochSchedule(tok, 2L, 2L)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("a", 100L, 200L, 2000L, true),
      ("c", 3500L, 7000L, 2000L, true),
      ("d", 4000L, 7661L, 1915L, false)), got.toSeq.toString)
  }

  test("q_cur_epochs: budget is respected and the gate corpus caps someone") {
    val rows = SparkEntry.queries("q_cur_epochs")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4)))
    val totalTok = rows.map(_._1).sum
    val alloc = rows.map(_._2).sum
    // integer floors only ever UNDER-spend the 2x budget
    assert(alloc <= 2L * totalTok, s"over budget: $alloc vs ${2L * totalTok}")
    // the corpus must exercise both branches at gate SF
    assert(rows.exists(_._3) && rows.exists(!_._3),
      s"capped split degenerate: ${rows.count(_._3)} of ${rows.length}")
  }

  test("q_cur_quantile_norm: reference fixed-point, monotone, and ref-valued") {
    val rows = SparkEntry.queries("q_cur_quantile_norm")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val refVals = rows.filter(_._2 == "src0").map(_._3).toSet
    assert(refVals.nonEmpty, "gate corpus must contain the reference source")
    // 1. the reference source is a fixed point: normalizing src0 onto
    //    itself must be the identity (idx = c_lt lands in its own bin)
    rows.filter(_._2 == "src0").foreach { case (id, _, qm, nq) =>
      assert(nq == qm, s"src0 doc $id moved: $qm -> $nq")
    }
    // 2. every normalized value is an actual reference order statistic
    rows.foreach { case (id, s0, _, nq) =>
      assert(refVals.contains(nq), s"$s0 doc $id mapped off the reference grid")
    }
    // 3. within a source, normalization is monotone in the raw score
    rows.groupBy(_._2).foreach { case (src, rs) =>
      rs.sortBy(r => (r._3, r._1)).sliding(2).foreach {
        case Array((_, _, q1, n1), (id2, _, q2, n2)) =>
          assert(q1 > q2 || n1 <= n2, s"$src doc $id2 breaks monotonicity")
        case _ =>
      }
    }
  }

  test("sequence packing equals a from-scratch sequential chunker; manifest is gap-free") {
    // independent ground truth: a driver-side sequential walk over the
    // doc_id-ordered token stream (the thing the distributed two-pass
    // prefix sum must equal exactly)
    val toks = Tables.df(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong)
      .sortBy(_._1)
    var off = 0L
    val want = toks.map { case (id, n) =>
      val row = (id, n, off, off / 256, (off + n - 1) / 256,
        (off + n - 1) / 256 - off / 256 + 1)
      off += n
      row
    }
    val got = SparkEntry.queries("q_cur_pack_sequences")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == want.toSeq)
    // stream invariants: offsets are exactly contiguous (zero padding
    // waste), and window spans cover [0, total) with no holes
    assert(want.zip(want.drop(1)).forall { case (a, b) => a._3 + a._2 == b._3 })
    // manifest: doc counts per window match the map; every window
    // gap-free; segment resets sum to |docs| (every doc starts once)
    val stats = SparkEntry.queries("q_cur_pack_stats")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val spans = want.flatMap(w => (w._4 to w._5).map(_ -> w._1))
    val byWin = spans.groupBy(_._1)
    val total = toks.map(_._2).sum
    stats.foreach { case (seq, nDocs, nStart, firstDoc, filled) =>
      assert(nDocs == byWin(seq).length, s"win $seq n_docs")
      assert(firstDoc == byWin(seq).map(_._2).min, s"win $seq first_doc")
      assert(nStart == want.count(w => w._4 == seq && w._3 >= seq * 256), s"win $seq resets")
      // gap-free: every window fills to exactly 256 tokens (the final
      // window to the stream remainder)
      assert(filled == math.min(256L, total - seq * 256), s"win $seq fill $filled")
    }
    assert(stats.map(_._3).sum == toks.length.toLong || stats.length == 500,
      "segment resets must sum to |docs| on an un-truncated manifest")
  }

  test("q_cur_kanonymity equals a from-scratch equivalence-class recount at every k") {
    val got = SparkEntry.queries("q_cur_kanonymity")(spark, sf).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set(2, 5, 10))
    val classes = Tables.df(spark, sf, "documents")
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val total = classes.sum
    for (k <- Seq(2, 5, 10)) {
      val atRisk = classes.filter(_ < k)
      assert(got(k) == ((classes.length.toLong, classes.min,
        atRisk.length.toLong, atRisk.sum, 1000000L * atRisk.sum / total)), s"k=$k")
    }
    // monotonicity: raising k can only widen the at-risk set
    assert(got(2)._4 <= got(5)._4 && got(5)._4 <= got(10)._4)
  }

  test("q_cur_ldiversity equals a from-scratch sensitive-distinct recount at every l") {
    val got = SparkEntry.queries("q_cur_ldiversity")(spark, sf).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set(2, 3))
    // QI class = (source, length bucket); sensitive attribute = lang
    val classes = Tables.df(spark, sf, "documents")
      .select("source", "n_chars", "lang").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 100), r.getString(2)))
      .groupBy(_._1)
      .toSeq // BEFORE map: a pair-valued map over a Map would collapse dup (csize, ndist)
      .map { case (_, rows) => (rows.length.toLong, rows.map(_._2).distinct.length.toLong) }
    val total = classes.map(_._1).sum
    for (l <- Seq(2, 3)) {
      val bad = classes.filter(_._2 < l)
      assert(got(l) == ((classes.length.toLong, classes.map(_._2).min,
        bad.length.toLong, bad.map(_._1).sum, 1000000L * bad.map(_._1).sum / total)), s"l=$l")
    }
    // monotonicity: raising l can only widen the violating set
    assert(got(2)._3 <= got(3)._3 && got(2)._4 <= got(3)._4)
  }

  test("shard manifest equals a sequential from-scratch export; ranges tile the corpus") {
    val got = SparkEntry.queries("q_cur_shard_manifest")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // sequential reimplementation: walk docs in doc_id order, assign each
    // to the shard holding its first token, fingerprint = Σ h mod p
    def roll(t: String): Long =
      t.getBytes("UTF-8").foldLeft(0L)((h, c) => (h * 31 + (c & 0xffL)) % 1000000007L)
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    var off = 0L
    val assigned = docs.map { case (id, t) =>
      val nTok = t.split(" ", -1).length.toLong
      val shard = off / 4096
      off += nTok
      (shard, id, nTok, BigInt(roll(t)))
    }
    val want = assigned.groupBy(_._1).toSeq.map { case (sh, v) =>
      (sh, v.length.toLong, v.map(_._3).sum, v.map(_._2).min, v.map(_._2).max,
        (v.map(_._4).sum % 1000000007).toLong)
    }.sortBy(_._1)
    assert(got.toSeq == want)
    // shards tile doc_id space with no overlap: ranges are contiguous
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4, s"$a overlaps $b")
      case _ =>
    }
    assert(got.map(_._2).sum == docs.length && got.map(_._3).sum == off)
  }

  test("generalization ladder: recount per width, min size monotone, chosen is minimal safe") {
    val got = SparkEntry.queries("q_cur_generalize")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(got.map(_._1).toSeq == Seq(100, 200, 400, 800))
    val rows = Tables.df(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    got.foreach { case (w, nClasses, minC, atRisk, k5, _) =>
      val classes = rows.groupBy { case (src, nc) => (src, nc / w) }
        .map(_._2.length.toLong).toSeq
      assert((nClasses, minC, atRisk, k5) ==
        ((classes.length.toLong, classes.min,
          classes.filter(_ < 5).sum, classes.min >= 5)), s"w=$w")
    }
    // coarser buckets only merge classes: min class size is monotone in w
    val mins = got.map(_._3)
    assert(mins.zip(mins.tail).forall { case (a, b) => a <= b }, mins.mkString(","))
    // chosen = the minimal safe rung, and nothing else
    val safe = got.filter(_._5)
    if (safe.nonEmpty)
      assert(got.filter(_._6).map(_._1).toSeq == Seq(safe.map(_._1).min))
    else assert(got.forall(!_._6))
  }

  test("q_cur_tcloseness equals a from-scratch BigInt TVD recount at every t") {
    val got = SparkEntry.queries("q_cur_tcloseness")(spark, sf).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set(200, 500))
    val rows = Tables.df(spark, sf, "documents")
      .select("source", "n_chars", "lang").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 100), r.getString(2)))
    val nt = BigInt(rows.length)
    val ng = rows.groupBy(_._2).map { case (l, v) => l -> BigInt(v.length) }
    val classes = rows.groupBy(_._1).toSeq.map { case (_, v) =>
      val ncl = BigInt(v.length)
      val byLang = v.groupBy(_._2).map { case (l, w) => l -> BigInt(w.length) }
      val dev = ng.keys.map(l => (byLang.getOrElse(l, BigInt(0)) * nt - ng(l) * ncl).abs).sum
      (ncl, (BigInt(1000) * dev) / (BigInt(2) * ncl * nt))
    }
    val total = classes.map(_._1).sum
    for (t <- Seq(200, 500)) {
      val bad = classes.filter(_._2 > t)
      assert(got(t) == ((classes.length.toLong, classes.map(_._2).max.toLong,
        bad.length.toLong, bad.map(_._1).sum.toLong,
        (BigInt(1000000) * bad.map(_._1).sum / total).toLong)), s"t=$t")
    }
    // monotonicity: raising t can only shrink the violating set
    assert(got(500)._3 <= got(200)._3 && got(500)._4 <= got(200)._4)
  }

  test("bloom decontam: two-stage totals equal the exact audit; fp certified at a third SF") {
    val got = SparkEntry.queries("q_cur_bloom_decontam")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(got.nonEmpty)
    // the in-plan fp certification holds at sf0.001 too (the gate runs
    // it at sf0.01/0.1) — bloom bits are deterministic, so this pins the
    // third corpus rather than sampling a random one
    got.foreach(t => assert(t._7, t.toString))
    got.foreach(t => assert(t._3 <= t._2 && t._4 <= t._5, t.toString))
    // the bloom prestage must not change ANY answer: per-source pair /
    // flagged-doc / overlap totals re-derived from the bloom-free exact
    // audit (q_cur_decontaminate) + the doc->source map
    val src = Tables.df(spark, sf, "documents").select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exact = SparkEntry.queries("q_cur_decontaminate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .groupBy(t => src(t._1))
    got.foreach { case (s, _, _, nDocs, nPairs, nOv, _) =>
      val e = exact.getOrElse(s, Array.empty[(Long, Long, Long)])
      assert((e.map(_._1).distinct.length.toLong, e.length.toLong, e.map(_._3).sum) ==
        ((nDocs, nPairs, nOv)), s"source=$s")
    }
  }

  test("semanticDecontamMod bounds the eval slice at ~400 vectors at every decade") {
    // round-16 decade fix: the eval slice must be SIZE-bounded, never a
    // fixed fraction — a fixed `% 50` made |eval| ∝ N and the audit's
    // pair work quadratic (26.6× at 10× data). Gate/sf1 corpora must
    // keep the historical modulus 50 so their oracle rows stay
    // bit-identical to the pre-fix recording.
    import graft.queries.CurationQueries.semanticDecontamMod
    assert(semanticDecontamMod(200L) == 50)     // sf0.01
    assert(semanticDecontamMod(2000L) == 50)    // sf0.1
    assert(semanticDecontamMod(20000L) == 50)   // sf1: boundary, still 50
    assert(semanticDecontamMod(200000L) == 500)     // sf10
    assert(semanticDecontamMod(2000000L) == 5000)   // sf100
    (3 to 12).foreach { dec =>
      val n = math.pow(10, dec).toLong
      val m = semanticDecontamMod(n)
      // |eval| ≈ n/m ≤ ~400 at every decade; and the modulus never
      // exceeds what leaves at least one eval vector on real corpora
      assert(n / m <= 400, s"n=$n m=$m eval=${n / m}")
      assert(m % 50 == 0)
    }
  }
}
