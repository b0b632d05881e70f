package graft

import graft.queries.{MmRecord, MultimodalQueries}
import org.apache.spark.sql.functions._

/** Pipeline-operator semantics the oracle can't see: approx-aggregate
  * accuracy, native-vs-exact stats tolerance, simhash locality, LSH
  * recall, multimodal stub decode. */
class PipelineSpec extends GraftSuite {

  test("native var/stddev agree with exact moment formulas to 1e-6 relative") {
    val native = SparkEntry.queries("q_agg_stats_native")(spark, sf)
      .select("var_s").collect().map(_.getDouble(0))
    val exact = SparkEntry.queries("q_agg_stats_exact")(spark, sf)
      .select("var_acctbal").collect().map(_.getDouble(0))
    assert(native.length == exact.length)
    native.zip(exact).foreach { case (n, e) =>
      assert(math.abs(n - e) / math.max(1.0, math.abs(e)) < 1e-6, s"$n vs $e")
    }
  }

  test("approx sketches certify within tolerance of exact") {
    // q_agg_approx now emits the certification itself (acd_ok / amed_ok
    // booleans over in-engine approx-vs-exact); pin that every group
    // certifies TRUE on the Spark side, independent of the DuckDB gate.
    val rows = SparkEntry.queries("q_agg_approx")(spark, sf)
      .select("l_returnflag", "acd_ok", "amed_ok").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1), s"${r.getString(0)}: approx_count_distinct off >10%")
      assert(r.getBoolean(2), s"${r.getString(0)}: approx median off >1%")
    }
  }

  test("incremental triangle maintenance is consistent with the full recount") {
    // The standard delta batch re-ingests EXACT copies: a copy δ of
    // original c has identical shingles, so its probe neighborhood is
    // {c} ∪ N(c) (jac(δ,c)=1 and jac(δ,x)=jac(c,x), discovered through
    // the same band family the corpus pairs used). The triangles δ
    // creates are therefore the edges within {c} ∪ N(c): the deg(c)
    // edges c—x plus the n_tri(c) closed wedges among N(c). Pinning
    // new_tri(δ) == deg(c) + n_tri(c) ties BOTH round-9 operators to
    // the oracle-verified full recount with no new oracle.
    val tri = SparkEntry.queries("q_graph_triangles")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val inc = SparkEntry.queries("q_graph_tri_incremental")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc.nonEmpty)
    inc.foreach { case (delta, nt) =>
      val (deg, t) = tri.getOrElse(delta - 1000000, (0L, 0L))
      assert(nt == deg + t, s"delta $delta: new_tri=$nt, expected ${deg + t}")
    }
  }

  test("q_text_boilerplate equals a from-scratch per-source segment recount") {
    // independent of the DuckDB oracle: rebuild the whole operator in
    // plain Scala — non-overlapping 8-word segments, per-(source,
    // segment) distinct-doc frequency, df >= 2 ⇒ boilerplate — and
    // require identical per-doc accounting. Also pins that the corpus
    // actually EXERCISES the removal path (>= 1 doc with n_boiler > 0),
    // so a threshold typo can't green-wash as all-zeros.
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
    val segs = docs.flatMap { case (id, src, w) =>
      w.grouped(8).map(g => (id, src, g.mkString(" "), g.length.toLong)).toSeq
    }
    val boiler = segs.map { case (id, src, s2, _) => (src, s2) -> id }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 2).keySet
    val expected = segs.groupBy(_._1).map { case (id, ss) =>
      val rm = ss.filter { case (_, src, s2, _) => boiler((src, s2)) }
      id -> (ss.length.toLong, rm.length.toLong,
        ss.map(_._4).sum, rm.map(_._4).sum)
    }
    val got = SparkEntry.queries("q_text_boilerplate")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, v) => assert(v == expected(id), s"doc $id: $v vs ${expected(id)}") }
    assert(got.values.exists(_._2 > 0), "fixture must exercise boilerplate removal")
  }

  test("containment dedup finds an embedded short doc that jaccard misses") {
    // the semantics this corpus can't exercise (its near-dups are all
    // similar-sized): a 10-word doc copied verbatim out of a 60-word doc
    // has containment 1.0 but jaccard |A∩B|/|A∪B| = 8/58 ≈ 0.14 — far
    // below any dedup threshold. The containment operator must emit the
    // pair at 1.0 and stay silent on the unrelated doc.
    val s = spark
    import s.implicits._
    val long = (0 until 60).map(i => s"w$i").mkString(" ")
    val short = (10 until 20).map(i => s"w$i").mkString(" ")
    val other = (100 until 130).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, other)).toDF("doc_id", "text")
    val got = graft.queries.PipelineQueries.containmentPairs(docs, 4, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)), got.mkString(","))
    val jac = 8.0 / 58.0 // shared shingles / union — the measure that misses it
    assert(jac < 0.8)
  }

  test("editdist dedup: blocking finds every ed<=1 form and rejects ed=2") {
    // the corpus's only ed<=1 title pairs are exact duplicates (ed=0),
    // so drive each single-edit form the theorem covers through a
    // fixture: substitution, deletion, insertion must all surface at
    // ed=1; a two-substitution title (ed=2, which CAN share a deletion
    // key) must be verified away; an unrelated title must not pair.
    val s = spark
    import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      1L -> base,
      2L -> "alpha beta gamma delta epsilon zetb", // substitution → ed 1
      3L -> "alpha beta gamma delta epsilon zet",  // deletion → ed 1
      4L -> "alpha beta gamma delta epsilon zetaq", // insertion → ed 1
      5L -> "alpha beta gamma delta epsilon qqta", // two subs → ed 2
      6L -> "totally different words here now ok"
    ).toDF("doc_id", "text")
    val got = graft.queries.PipelineQueries.editDistPairs(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1), (2L, 3L, 1)),
      got.mkString(","))
  }

  test("editdist dedup equals brute-force all-pairs at gate sf") {
    val docs = Tables.df(spark, sf, "documents").select("doc_id", "text")
    val titles = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).take(6).mkString(" "))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val expected = (for {
      (i, ta) <- titles; (j, tb) <- titles if i < j
      d = lev(ta, tb) if d <= 1
    } yield (i, j, d)).toSet
    val got = graft.queries.PipelineQueries.editDistPairs(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
    assert(expected.nonEmpty, "fixture corpus must contain ed<=1 pairs")
  }

  test("q_text_fertility totals reconcile with q_text_bpe_encode's per-doc counts") {
    // same learned vocabulary, two aggregations — the per-language token
    // mass must equal the per-doc token mass re-bucketed by lang
    val perDoc = SparkEntry.queries("q_text_bpe_encode")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val langOf = Tables.df(spark, sf, "documents").select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = perDoc.groupBy { case (id, _) => langOf(id) }
      .view.mapValues(v => (v.values.map(_._1).sum, v.values.map(_._2).sum)).toMap
    val got = SparkEntry.queries("q_text_fertility")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, s"$got vs $expected")
  }

  test("q_graph_kcore: 3 peel rounds reach the fixpoint (round 4 changes nothing)") {
    def run(r: Int) = graft.queries.PipelineQueries.kcoreSurvivors(spark, sf, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val r3 = run(3); val r4 = run(4)
    assert(r3 == r4, s"fixpoint not reached: ${r3.size} vs ${r4.size}")
    // the gate corpus must exercise BOTH branches: some vertices peel
    // away (pair-only components) and some survive (dense cores)
    val deg0 = SparkEntry.queries("q_graph_triangles")(spark, sf).collect()
      .map(r => r.getLong(0)).toSet
    assert(r3.nonEmpty && r3.size < deg0.size, s"${r3.size} of ${deg0.size}")
  }

  test("q_graph_lpa: 3 rounds reach the fixpoint; communities refine components") {
    val pairs = graft.queries.PipelineQueries
      .minhashPairs(spark, sf, 64).select("i", "j")
    val edges = pairs.selectExpr("i as src", "j as dst")
      .union(pairs.selectExpr("j as src", "i as dst")).cache()
    def run(r: Int) = graft.queries.PipelineQueries.lpaCommunities(edges, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val r3 = run(3); val r4 = run(4)
    edges.unpersist()
    assert(r3 == r4, s"fixpoint not reached: 3 vs 4 rounds differ")
    // refinement: every LPA community must live inside ONE connected
    // component (LPA can split a component at a sparse cut, never merge
    // across components — labels only travel along edges)
    val cc = SparkEntry.queries("q_dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val violations = r3.groupBy(_._2).filter { case (_, members) =>
      members.keys.map(cc).toSet.size > 1
    }
    assert(violations.isEmpty, s"communities spanning components: $violations")
  }

  test("lpaCommunities splits a barbell at the sparse cut (cc cannot)") {
    // two triangles {0,1,2} and {10,11,12} joined by one bridge 2-10:
    // ONE connected component, but LPA's frequency rule keeps each
    // triangle on its own min label — the density granularity cc lacks
    val s = spark
    import s.implicits._
    val und = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L)).toDF("src", "dst")
    val edges = und.union(und.selectExpr("dst as src", "src as dst"))
    val got = graft.queries.PipelineQueries.lpaCommunities(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-simulated with the self-vote rule: left stabilizes on label
    // 0, the right triangle's internal majority beats the bridge and
    // settles on 10 — two communities where cc reports one component
    assert(Set(0L, 1L, 2L).map(got) == Set(0L),
      s"left triangle not labeled 0: $got")
    assert(Set(10L, 11L, 12L).map(got) == Set(10L),
      s"right triangle not labeled 10: $got")
  }

  test("q_ret_rm3: base scores agree with bm25Top; expansion reorders") {
    val bm = SparkEntry.queries("q_text_bm25")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val rm3 = SparkEntry.queries("q_ret_rm3")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rm3.length == 10)
    // base_n is exactly the BM25 score in nano units for shared docs
    rm3.foreach { case (_, id, baseN, _, _) =>
      bm.get(id).foreach { s0 =>
        assert(math.round(s0 * 1e9) == baseN, s"doc $id: $s0 vs $baseN")
      }
    }
    // every fused doc carries expansion mass, and the fused ORDER is not
    // the base order (the operator must actually change the ranking)
    assert(rm3.forall(_._4 > 0), "a top-10 doc with zero expansion mass")
    val baseOrder = rm3.sortBy { case (_, id, baseN, _, _) => (-baseN, id) }.map(_._2)
    assert(rm3.map(_._2).toSeq != baseOrder.toSeq,
      "expansion left the base ranking untouched — vacuous on this corpus")
    // final_n is exactly base + exp/2 and rows are ordered by it
    rm3.foreach { case (_, _, b, e, f) => assert(f == b + e / 2) }
    assert(rm3.map(_._5).toSeq == rm3.map(_._5).sortBy(-_).toSeq)
  }

  test("q_embed_mutual_nn equals a from-scratch Scala recompute") {
    val vecs = Tables.df(spark, sf, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).map(x => math.floor(x * 1024.0).toLong).toArray))
    val side0 = vecs.filter(_._2 == 0)
    val side1 = vecs.filter(_._2 == 1)
    def d64(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (u, v) => (u - v) * (u - v) }.sum
    val dist = (for ((x, _, qa) <- side0; (y, _, qb) <- side1)
      yield (x, y, d64(qa, qb))).toSeq
    def top4(grouped: Map[Long, Seq[(Long, Long, Long)]], by: ((Long, Long, Long)) => Long) =
      grouped.view.mapValues(_.sortBy(t => (t._3, by(t))).take(4)).toMap
    val kx = top4(dist.groupBy(_._1), _._2)
    val ky = top4(dist.groupBy(_._2), _._1)
    val akx = kx.view.mapValues(_.map(_._3).sum / 4).toMap
    val aky = ky.view.mapValues(_.map(_._3).sum / 4).toMap
    val expected = (for {
      (x, perX) <- kx.toSeq; (_, y, dd) <- perX
      if ky(y).exists(t => t._1 == x && t._2 == y) && dd > 0
    } yield (x, y, dd, (1000L * (akx(x) + aky(y))) / (2 * dd)))
      .sortBy(t => (t._1, t._2))
    val frame = SparkEntry.queries("q_embed_mutual_nn")(spark, sf)
    assert(frame.columns.toSeq == Seq("x", "y", "d64", "margin_milli"))
    val got = frame.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"${got.length} vs ${expected.length}; first diff: ${
        got.zip(expected).find(p => p._1 != p._2)}")
    assert(expected.nonEmpty)
  }

  test("round(x,9) >= 0.4 is exactly x >= 0.3999999995 on the adjacent-double grid") {
    // q_embed_neardup's verify loop replaces the per-pair BigDecimal
    // Round with a raw primitive compare; this pins the equivalence
    // against the ENGINE's own Round over every double within 50 ulps
    // of the boundary plus the coarse neighborhood — if Spark's Round
    // semantics or the shortest-representation law ever shifted, this
    // fails before the oracle gate does.
    val s = spark
    import s.implicits._
    val boundary = 0.3999999995
    val grid = (
      (-50 to 50).scanLeft(boundary) { (x, _) => Math.nextUp(x) }.toSeq ++
      (-50 to 50).scanLeft(boundary) { (x, _) => Math.nextDown(x) }.toSeq ++
      Seq(0.39999999949, 0.39999999951, 0.3999999994, 0.3999999996,
        0.399999999, 0.4, 0.4000000001, 0.39, 0.41)).distinct
    val got = grid.toDF("x")
      .select(col("x"), (org.apache.spark.sql.functions.round(col("x"), 9) >= 0.4).as("rounded"),
        (col("x") >= boundary).as("raw"))
      .collect()
    val bad = got.filter(r => r.getBoolean(1) != r.getBoolean(2))
    assert(bad.isEmpty, bad.map(r => f"${r.getDouble(0)}%.17g: round=${r.getBoolean(1)} raw=${r.getBoolean(2)}").mkString(";"))
  }

  test("mutualNnCells follows the √n law at decade points (floor 16, cap 2^16)") {
    // round-15 verdict item #1: the cell law must not regress to either
    // failure mode — fixed k (quadratic candidates) or k ∝ n (quadratic
    // assignment + unbounded driver model). √n is the unique power law
    // balancing the two; pin it across ten decades.
    import graft.queries.PipelineQueries.mutualNnCells
    assert(mutualNnCells(0L) == 16 && mutualNnCells(100L) == 16) // floor
    assert(mutualNnCells(1000L) == 32)
    assert(mutualNnCells(1000000L) == 1000)
    assert(mutualNnCells(100000000L) == 10000)
    assert(mutualNnCells(10000000000L) == 65536) // cap: bounded driver model
    assert(mutualNnCells(1000000000000L) == 65536)
    // sub-quadratic both ways at every decade: k·n and (n/k)·n ≪ n²
    (3 to 12).foreach { dec =>
      val n = math.pow(10, dec).toLong
      val k = mutualNnCells(n).toLong
      assert(k * n <= 70000L * n && n / k <= n / 16)
    }
    // round-15 verdict #1 (cap regime guard): the √n guarantee ends
    // exactly where ⌈√n⌉ crosses the 2¹⁶ cap — n = 2³². Pin the
    // boundary predicate that drives the loud stderr warn so the
    // regime change can never again go silent.
    import graft.queries.PipelineQueries.mutualNnCellsCapBinds
    assert(!mutualNnCellsCapBinds(1L << 32))       // ⌈√n⌉ = 65536: in regime
    assert(mutualNnCellsCapBinds((1L << 32) + 1))  // first super-linear n
    assert(mutualNnCellsCapBinds(1000000000000L))
    assert(!mutualNnCellsCapBinds(200000L))        // tested corpora: quiet
    assert(!mutualNnCellsCapBinds(0L))
  }

  test("nndescentStride bounds the sample at ~2000 vectors at every decade") {
    // round-15 decade fix: the recall harness's all-pairs must run on a
    // SIZE-bounded sample, never a fixed fraction — and gate/sf1
    // corpora must keep the historical stride 10 so their oracle rows
    // are bit-identical to the pre-fix recording.
    import graft.queries.PipelineQueries.nndescentStride
    assert(nndescentStride(200L) == 10)    // sf0.01
    assert(nndescentStride(2000L) == 10)   // sf0.1
    assert(nndescentStride(20000L) == 10)  // sf1: boundary, still 10
    assert(nndescentStride(200000L) == 100)    // sf10
    assert(nndescentStride(2000000L) == 1000)  // sf100
    (3 to 12).foreach { dec =>
      val n = math.pow(10, dec).toLong
      assert(n / nndescentStride(n) <= 2000L, s"sample unbounded at 10^$dec")
    }
  }

  test("kcenterGreedy: hand-computed line fixture and the Gonzalez invariant") {
    val s = spark
    import s.implicits._
    // three points on one axis at 0, 1024, 10240 (already quantized):
    // from seed 0 greedy picks the far point (radius 10240^2), then the
    // near one (its min-dist is to the seed: 1024^2)
    val fx = Seq(
      (0L, Array(0L) ++ Array.fill(63)(0L)),
      (1L, Array(1024L) ++ Array.fill(63)(0L)),
      (2L, Array(10240L) ++ Array.fill(63)(0L))).toDF("vec_id", "q")
    val got = graft.queries.PipelineQueries.kcenterGreedy(fx, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 2L, 104857600L), (3L, 1L, 1048576L)),
      got.toString)
    // corpus: selection radii are non-increasing from round 2 on — each
    // round covers the previous worst gap (the 2-approximation's core)
    val radii = SparkEntry.queries("q_cur_kcenter")(spark, sf).collect()
      .sortBy(_.getLong(0)).map(_.getLong(2)).drop(1)
    assert(radii.nonEmpty && radii.sliding(2).forall {
      case Array(a, b) => b <= a
      case _ => true
    }, radii.mkString(","))
  }

  test("q_events_seasonality: profile self-consistent with its own rows") {
    val rows = SparkEntry.queries("q_events_seasonality")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // every day row carries dow = d % 7 and a dow_mean recomputable from
    // the emitted rows themselves — the profile can hide nothing
    rows.groupBy(r => (r._1, r._4)).foreach { case ((typ, dow), grp) =>
      grp.foreach { r => assert(r._2 % 7 == dow, s"$typ day ${r._2} dow") }
      val s = grp.map(_._3).sum
      val n = grp.length
      val mean = (1000L * s) / n
      assert(grp.forall(_._5 == mean),
        s"$typ dow $dow profile mean ${grp.head._5} vs recomputed $mean")
      // ratios are floor((1000*c*n)/s) of the same integers
      grp.foreach { r =>
        assert(r._6 == (1000L * r._3 * n) / s, s"$typ day ${r._2} ratio") }
    }
  }

  test("cusumDaily: step shifts fire with the hand-computed 6-day delay") {
    val s = spark
    import s.implicits._
    // type up: 100/day for d=1..20, 150 after; base=100, slack=10,
    // h=200 -> s_up = 40*(d-20), first alarm (>200) at d=26.
    // type dn: mirror downward, s_dn = 40*(d-20), alarm at d=26.
    val rows =
      (1 to 30).map(dd => ("up", dd.toLong, if (dd <= 20) 100L else 150L)) ++
      (1 to 30).map(dd => ("dn", dd.toLong, if (dd <= 20) 100L else 50L))
    val got = graft.queries.PipelineQueries
      .cusumDaily(rows.toDF("event_type", "d", "cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6))).toMap
    // stationary prefix: both statistics flat at zero on day 20
    assert(got(("up", 20L)) == ((0L, 0L, false, false)), got(("up", 20L)).toString)
    assert(got(("dn", 20L)) == ((0L, 0L, false, false)), got(("dn", 20L)).toString)
    // first alarm exactly at day 26, right direction only
    (21 to 30).foreach { dd =>
      val (sUp, _, aUp, aDn) = got(("up", dd.toLong))
      assert(sUp == 40L * (dd - 20), s"up d$dd s_up $sUp")
      assert(aUp == (dd >= 26), s"up d$dd alarm $aUp")
      assert(!aDn, s"up d$dd spurious down alarm")
      val (_, sDn, bUp, bDn) = got(("dn", dd.toLong))
      assert(sDn == 40L * (dd - 20), s"dn d$dd s_dn $sDn")
      assert(bDn == (dd >= 26), s"dn d$dd alarm $bDn")
      assert(!bUp, s"dn d$dd spurious up alarm")
    }
    // the stationary GATE corpus must produce zero alarms; pinned at
    // sf0.01 (daily base ~65, slack 6, h=130) — at sf0.001 daily counts
    // are ~6 so the integer slack floors to 0 and the monitor is
    // legitimately noise-sensitive, the documented small-count caveat
    val corpus = SparkEntry.queries("q_events_cusum")(
      spark, "/root/testdata/sf0.01").collect()
    assert(corpus.nonEmpty)
    assert(!corpus.exists(r => r.getBoolean(5) || r.getBoolean(6)),
      "false positive on stationary corpus")
  }

  test("q_ann_nndescent: refinement never loses recall and the corpus gains") {
    val rows = SparkEntry.queries("q_ann_nndescent")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // per-vertex monotonicity is a theorem (superset of candidates,
    // true-distance re-rank): a single violation is an engine bug
    rows.foreach { case (v, h0, h1, imp) =>
      assert(h1 >= h0, s"vertex $v lost recall: $h0 -> $h1")
      assert(imp == (h1 > h0), s"vertex $v improved flag inconsistent")
      assert(h0 >= 0 && h1 <= 3)
    }
    // the round must do real work on the gate corpus, not pass vacuously
    assert(rows.map(_._3).sum > rows.map(_._2).sum,
      s"no aggregate recall gain: ${rows.map(_._2).sum} -> ${rows.map(_._3).sum}")
  }

  test("q_embed_rp: sign matrix is balanced and distortion centers on 1") {
    // matrix sanity: each sketch dim mixes both signs, no two sketch
    // dims share (or exactly oppose) their sign pattern — the failure
    // modes of the linear-hash traps documented in the query
    val sm = graft.queries.PipelineQueries.RpSigns
    assert(sm.length == 16 && sm.forall(_.length == 64))
    sm.foreach { row =>
      val pos = row.count(_ == 1)
      assert(pos >= 20 && pos <= 44, s"degenerate sign row: $pos of 64 positive")
    }
    for (a <- sm.indices; b <- sm.indices if a < b) {
      val agree = sm(a).zip(sm(b)).count { case (x, y) => x == y }
      assert(agree != 0 && agree != 64, s"rows $a,$b identical/opposed")
    }
    // JL expectation: E[d16] = 16 * d64, so the ratio histogram must
    // center near 1000 milli and every vector must be accounted for
    val rows = SparkEntry.queries("q_embed_rp")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.map(_._2).sum
    val nVecs = Tables.df(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(n == nVecs, s"histogram covers $n of $nVecs vectors")
    val meanMilli = rows.map { case (_, cnt, lo, hi) => cnt * (lo + hi) / 2 }.sum / n
    assert(meanMilli > 700 && meanMilli < 1300, s"distortion mean $meanMilli")
    assert(rows.forall { case (b, _, lo, hi) => lo / 100 == b && hi / 100 == b },
      "bucket bounds inconsistent with min/max")
  }

  test("readabilityMicro matches hand-computed Flesch/FK micro units") {
    val s = spark
    import s.implicits._
    // "the cat sat. it ran!": nw=5 (sat./ran! keep their punctuation in
    // whitespace tokens), one vowel group per word -> syl=5, ns=2.
    // fl = 206835000 - (1015000*5) div 2 - (84600000*5) div 5 = 119697500
    // fk = (390000*5) div 2 + (11800000*5) div 5 - 15590000 = -2815000
    val docs = Seq(("en", "s1", "the cat sat. it ran!"))
      .toDF("lang", "source", "text")
    val r = graft.queries.PipelineQueries.readabilityMicro(docs).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(2) == 1L, "n_docs")
    assert(row.getLong(3) == 119697500L, s"flesch: ${row.getLong(3)}")
    assert(row.getLong(4) == -2815000L, s"fk: ${row.getLong(4)}")
    assert(row.getLong(5) == 100L, s"syl/100w: ${row.getLong(5)}")
  }

  test("q_dedup_semantic survivors equal a from-scratch within-cell prune") {
    // independent of the DuckDB oracle: recompute the whole operator in
    // plain Scala (cells from the same Knuth-hash planes, brute-force
    // within-cell cosines, min-id-keeps drop rule) and require the same
    // survivor set
    val vecs = Tables.df(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val bits = graft.queries.PipelineQueries.semanticBits(vecs.length)
    def cell(v: Array[Double]): Int = (0 until bits).map { b =>
      val dot = (1 to 64).map { k =>
        val w = (((b.toLong * 64 + k) * 2654435761L) % 4294967296L / 65536L).toDouble / 65536.0 - 0.5
        v(k - 1) * w
      }.sum
      if (BigDecimal(dot).setScale(9, BigDecimal.RoundingMode.HALF_UP) >= 0) 1 << b else 0
    }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byCell = vecs.groupBy { case (_, v) => cell(v) }
    val dropped = byCell.values.flatMap { members =>
      for {
        (j, vj) <- members
        if members.exists { case (i, vi) =>
          i < j && BigDecimal(cos(vi, vj)).setScale(9, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.3")
        }
      } yield j
    }.toSet
    val expected = vecs.map(_._1).filterNot(dropped).sorted.toSeq
    val got = SparkEntry.queries("q_dedup_semantic")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == expected, s"got ${got.size} survivors, expected ${expected.size}")
  }

  test("semantic dedup self-sizes its cell count: x10 corpus chooses more cells, occupancy stays bounded") {
    import graft.queries.PipelineQueries.semanticBits
    // the integer sizing rule — the DuckDB oracle computes the same
    // formula from its own COUNT(*), so these pins ARE the contract
    assert(Seq(1L, 500L, 512L).forall(semanticBits(_) == 4))
    assert(semanticBits(513) == 5)
    assert(semanticBits(2000) == 6)   // sf0.1 gate corpus
    assert(semanticBits(5000) == 8)
    assert(semanticBits(20000) == 10) // the sf1 scale-up smoke corpus
    assert(semanticBits(200000) == 13) // the sf10 decade corpus: 8192 cells
    assert(semanticBits(Long.MaxValue) == 30) // capped, never unbounded
    // a base corpus and its ×10 twin (deterministic murmur3 vectors —
    // well-spread geometry, so occupancy tracks the expected N/2^bits;
    // a Knuth-LCG generator here would correlate with the Knuth-hash
    // PLANES and collapse everything into a handful of cells)
    val s = spark
    def mk(n: Int, dir: String): Unit =
      s.range(n).selectExpr(
        "id AS vec_id",
        "concat('l', CAST(id % 4 AS STRING)) AS label",
        """transform(sequence(1, 64), k ->
          |  CAST(hash(id, k) AS FLOAT) / 2147483648.0) AS embedding""".stripMargin)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val dBase = "/tmp/graft_test_semsize_base"
    val d10 = "/tmp/graft_test_semsize_x10"
    mk(500, dBase)
    mk(5000, d10)
    val base = SparkEntry.queries("q_dedup_semantic")(s, dBase)
      .groupBy("cell").count().collect()
    val x10 = SparkEntry.queries("q_dedup_semantic")(s, d10)
      .groupBy("cell").count().collect()
    // 500 vecs → 4 bits = ≤16 cells; 5000 → 8 bits = up to 256 cells:
    // the ×10 corpus must actually SPREAD over many more cells...
    assert(base.length <= 16, s"base used ${base.length} cells")
    assert(x10.length > 64, s"x10 corpus used only ${x10.length} of 256 cells")
    // ...and no cell may hold work quadratic in N: occupancy stays
    // within a small factor of the expected N/2^bits = ~20 vectors
    val maxCell = x10.map(_.getLong(1)).max
    assert(maxCell <= 128, s"hottest cell holds $maxCell of 5000 vectors — " +
      "per-cell pair work is no longer bounded")
  }

  test("CDC chunking is boundary-local: a front insertion changes only the first chunk") {
    // the property that distinguishes content-defined chunking from
    // fixed-size blocking: word hashes (hence boundaries) depend only on
    // local content, so prepending a word leaves every chunk after the
    // first boundary identical — a near-dup pair still shares almost all
    // chunk hashes
    val words = (1 to 200).map(k => s"w${(k * 2654435761L) % 97}")
    val docA = words.mkString(" ")
    // "zq" must not itself end a chunk or the first boundary would move;
    // rolling_hash("zq") = (122*31 + 113) % 1e9+7 = 3895, 3895 % 8 != 0
    val docB = ("zq" +: words).mkString(" ")
    val chunks = graft.queries.PipelineQueries
      .cdcChunks(spark.createDataFrame(Seq((0L, docA), (1L, docB)))
        .toDF("doc_id", "text"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getInt(3)))
      }
    val (a, b) = (chunks(0L), chunks(1L))
    assert(a.map(_._2).sum == 200 && b.map(_._2).sum == 201,
      "chunk words must partition each document")
    assert(a.length == b.length, s"${a.length} vs ${b.length} chunks")
    assert(a.length >= 5, "fixture must produce several chunks")
    assert(b.head._2 == a.head._2 + 1 && b.head._1 != a.head._1,
      "first chunk absorbs the insertion")
    assert(a.drop(1).sameElements(b.drop(1)),
      "all chunks after the first boundary must be identical")
  }

  test("documents corpus is ASCII (q_dedup_simhash oracle precondition)") {
    // RollingHash folds UTF-8 bytes; the DuckDB simhash oracle folds
    // ascii() code points. They agree only on single-byte ASCII text, so
    // a corpus change that introduces multibyte characters must fail HERE
    // loudly rather than silently diverge engine vs oracle.
    val nonAscii = Tables.df(spark, sf, "documents")
      .filter(not(col("text").rlike("^[\\x00-\\x7F]*$")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii documents contain non-ASCII text; the q_dedup_simhash " +
        "oracle (ascii() code points) no longer matches RollingHash (UTF-8 bytes)")
  }

  test("simhash: near-dup pairs are close in hamming distance, random pairs far") {
    val sims = SparkEntry.queries("q_dedup_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // near-dup pairs at this SF from the exact-jaccard gate:
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "expected planted near-dup pairs at sf0.001")
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val nearDist = pairs.map { case (i, j) => hamming(sims(i), sims(j)) }
    val randomDist = sims.keys.toSeq.sorted.sliding(2).collect {
      case Seq(a, b) if !pairs.contains((a, b)) => hamming(sims(a), sims(b))
    }.toSeq
    val nearAvg = nearDist.sum.toDouble / nearDist.size
    val randAvg = randomDist.sum.toDouble / randomDist.size
    assert(nearAvg < randAvg / 2, s"near=$nearAvg rand=$randAvg")
  }

  test("IVF ANN finds the brute-force top-10 (recall >= 0.9)") {
    val exact = SparkEntry.queries("q_ann_bruteforce")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = queries.PipelineQueries.annIvfTop10(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=$exact approx=$approx")
  }

  test("persisted IVF index probe finds the brute-force top-10 (recall >= 0.9)") {
    val exact = SparkEntry.queries("q_ann_bruteforce")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = queries.PipelineQueries.annIvfIndexTop10(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=$exact approx=$approx")
  }

  test("IVF upsert: delta vectors are searchable; recall >= 0.9 vs full corpus") {
    // at sf0.001 the 90%-base corpus is ~450 vectors — too few for a
    // 16-cell quantizer to be stable; sf0.01 (5k vectors) is the
    // smallest fixture where recall measures the UPSERT, not k-means
    // seeding noise (same reason LayoutSpec runs there)
    val sf01 = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q_ann_bruteforce")(spark, sf01)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val rows = queries.PipelineQueries.annIvfUpsertTop10(spark, sf01)
      .select("vec_id").collect().map(_.getLong(0))
    // the query vector IS a delta vector (vec_id 0): only an index the
    // upsert extended can return it, at cosine 1 = rank 1
    assert(rows.head == 0L, s"upserted query vector not found first: ${rows.toSeq}")
    val recall = exact.intersect(rows.toSet).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=$exact approx=${rows.toSeq}")
  }

  test("IVF+PQ upsert: delta codes are searchable; recall >= 0.9 vs full corpus") {
    // same sf0.01 floor as the IVF upsert test: 16 cells x 16x32
    // codebooks need ~5k vectors before recall measures the UPSERT
    // rather than quantizer seeding noise
    val sf01 = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q_ann_bruteforce")(spark, sf01)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val rows = queries.PipelineQueries.annIvfPqUpsertTop10(spark, sf01)
      .select("vec_id").collect().map(_.getLong(0))
    // the query vector IS a delta vector (vec_id 0): only a code layout
    // the upsert extended can return it, and the exact re-rank must put
    // it first at cosine 1
    assert(rows.head == 0L, s"upserted query vector not found first: ${rows.toSeq}")
    val recall = exact.intersect(rows.toSet).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=$exact approx=${rows.toSeq}")
  }

  test("LSH ANN finds the brute-force top-10 (recall >= 0.9)") {
    val exact = SparkEntry.queries("q_ann_bruteforce")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = queries.PipelineQueries.annLshTop10(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=$exact approx=$approx")
  }

  test("PQ ANN (ADC shortlist + exact re-rank) finds the brute-force top-10 (recall >= 0.9)") {
    val exact = SparkEntry.queries("q_ann_bruteforce")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = queries.PipelineQueries.annPqTop10(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=$exact approx=$approx")
  }

  test("IVF+PQ ANN (pruned ADC scan + exact re-rank) finds the brute-force top-10 (recall >= 0.9)") {
    val exact = SparkEntry.queries("q_ann_bruteforce")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = queries.PipelineQueries.annIvfPqTop10(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=$exact approx=$approx")
  }

  test("certified ANN rows = exact brute-force top-10 + an honest recall_ok bar") {
    // The catalog's ANN queries emit the certification frame: rows are
    // the exact top-10 (so the DuckDB oracle can recompute them) and
    // recall_ok is the in-plan |ann ∩ exact| >= 9 bar. Pin (a) row
    // equality with q_ann_bruteforce, (b) recall_ok consistency with an
    // independently measured overlap of the raw index frame.
    val exact = SparkEntry.queries("q_ann_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    for (name <- Seq("q_ann_lsh", "q_ann_ivf", "q_ann_pq")) {
      val cert = SparkEntry.queries(name)(spark, sf).collect()
      assert(cert.map(r => (r.getLong(0), r.getDouble(2))).toSeq == exact.toSeq,
        s"$name cert rows are not the exact top-10")
      val raw = name match {
        case "q_ann_lsh" => queries.PipelineQueries.annLshTop10(spark, sf)
        case "q_ann_ivf" => queries.PipelineQueries.annIvfTop10(spark, sf)
        case _           => queries.PipelineQueries.annPqTop10(spark, sf)
      }
      val ov = raw.select("vec_id").collect().map(_.getLong(0)).toSet
        .intersect(exact.map(_._1).toSet).size
      assert(cert.forall(_.getBoolean(3) == (ov >= 9)),
        s"$name recall_ok disagrees with measured overlap $ov")
    }
  }

  test("PQ index stores codes only — no raw vectors — at 16 codes per 64-dim vector") {
    // force the build, then inspect the encoded layout
    SparkEntry.queries("q_ann_pq")(spark, sf).collect()
    val dir = s"${graft.queries.SourceQueries.cacheDir(sf)}/pq16x32"
    val enc = spark.read.parquet(s"$dir/encoded")
    assert(enc.columns.sorted.toSeq == Seq("codes", "label", "vec_id"), enc.columns.mkString(","))
    val sizes = enc.select(org.apache.spark.sql.functions.size(col("codes"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(sizes == Seq(16), s"code widths: $sizes")
    val cb = spark.read.parquet(s"$dir/codebook")
    assert(cb.count() == 16 * 32)
  }

  test("TopKAggregator keeps best-first order, ties to smaller id, bounded at k") {
    val agg = new graft.functions.TopKAggregator(3)
    var buf = agg.zero
    Seq((0.5, 10L), (0.9, 7L), (0.5, 3L), (0.1, 99L), (0.9, 2L)).foreach { case (s, i) =>
      buf = agg.reduce(buf, (s, i))
    }
    assert(agg.finish(buf) == Seq((0.9, 2L), (0.9, 7L), (0.5, 3L)))
    // merge of two partial heaps == top-k of the union
    val merged = agg.merge(buf, agg.reduce(agg.zero, (0.7, 50L)))
    assert(agg.finish(merged) == Seq((0.9, 2L), (0.9, 7L), (0.7, 50L)))
    // ids beyond 2^53 survive exactly (raw-bits buffer, not doubles)
    val big = 9007199254740993L // 2^53 + 1: not representable as a double
    val withBig = agg.reduce(agg.zero, (1.0, big))
    assert(agg.finish(withBig) == Seq((1.0, big)))
  }

  test("multimodal stub decode: histogram + mean match a hand computation") {
    val payload = "abcABC".getBytes("UTF-8")
    val f = MultimodalQueries.stubDecode(MmRecord(7L, payload, "image/png", 16, 16))
    assert(f.n_bytes == 6)
    // 'a'=97,'b'=98,'c'=99 -> bin 6; 'A'=65,'B'=66,'C'=67 -> bin 4
    assert(f.byte_hist(6) == 3 && f.byte_hist(4) == 3 && f.byte_hist.sum == 6)
    assert(math.abs(f.mean_byte - (97 + 98 + 99 + 65 + 66 + 67) / 6.0) < 1e-12)
  }

  test("real PNG codec round-trip: every pixel of a 3x2 image survives encode+decode") {
    // the unit face of q_mm_decode_real's oracle claim: ImageIO PNG
    // encode → decode is bit-faithful per pixel, not just in aggregate
    val png = MultimodalQueries.encodePng(7L, 3, 2)
    assert(png.length > 8 &&
      (png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)),
      "payload must be a real PNG stream")
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(bi.getWidth == 3 && bi.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 3) {
      val rgb = bi.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == MultimodalQueries.pix(7L, x, y, 0), s"r($x,$y)")
      assert(((rgb >> 8) & 0xff) == MultimodalQueries.pix(7L, x, y, 1), s"g($x,$y)")
      assert((rgb & 0xff) == MultimodalQueries.pix(7L, x, y, 2), s"b($x,$y)")
    }
    // and the aggregate stats helper agrees with the direct pixel walk
    val (w, h, sr, sg, sb) = MultimodalQueries.decodeStats(png)
    val exp = for (c <- 0 until 3) yield
      (for (y <- 0 until 2; x <- 0 until 3) yield MultimodalQueries.pix(7L, x, y, c).toLong).sum
    assert((w, h) == ((3, 2)) && (sr, sg, sb) == ((exp(0), exp(1), exp(2))))
  }

  test("real WAV codec round-trip: every sample of a 5-sample clip survives encode+decode") {
    // the unit face of q_mm_audio_decode_real's oracle claim: the JDK
    // WAV encode → decode is bit-faithful per sample, not just in
    // aggregate, and the header carries the rate
    val wav = MultimodalQueries.encodeWav(7L, 5)
    assert(new String(wav.take(4), "ascii") == "RIFF" &&
      new String(wav.slice(8, 12), "ascii") == "WAVE",
      "payload must be a real RIFF/WAVE stream")
    val (pcm, rate) = MultimodalQueries.decodeWavPcm(wav)
    assert(rate == 8000f && pcm.length == 10)
    for (i <- 0 until 5) {
      val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      assert(s == MultimodalQueries.samp(7L, i), s"sample $i")
    }
    // and the aggregate stats helper agrees with the direct sample walk
    val exp = (0 until 5).map(MultimodalQueries.samp(7L, _))
    val (n, sum, sabs, mn, mx) = MultimodalQueries.decodeWavStats(wav)
    assert(n == 5L && sum == exp.map(_.toLong).sum &&
      sabs == exp.map(v => math.abs(v).toLong).sum &&
      mn == exp.min && mx == exp.max)
  }

  test("weighted percentile sketch within 1% of the exact oracle query") {
    // the query certifies the sketch in-engine (wp_ok); pin the
    // certification AND that its exact side equals the oracle-verified
    // q_agg_weighted_exact
    val rows = SparkEntry.queries("q_agg_weighted_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    val exact = SparkEntry.queries("q_agg_weighted_exact")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == exact.keySet)
    exact.foreach { case (flag, e) =>
      val (ex, ok) = rows(flag)
      assert(ex == e, s"$flag: exact sides disagree: $ex vs $e")
      assert(ok, s"$flag: sketch off >1% of exact $e")
    }
  }

  test("weighted percentile buffer stays bounded and merge-stable") {
    val agg = new graft.functions.WeightedPercentile(0.5, maxPairs = 64)
    var buf = agg.zero
    (1 to 10000).foreach(i => buf = agg.reduce(buf, (i.toDouble, 1.0)))
    assert(buf(0).toInt <= 64, s"buffer grew to ${buf(0).toInt} centroids")
    val merged = agg.merge(buf, buf)
    val med = agg.finish(merged)
    assert(math.abs(med - 5000) / 5000 < 0.05, s"median=$med")
  }

  test("exact dedup groups only identical texts (all singletons at sf0.001)") {
    val df = SparkEntry.queries("q_dedup_exact")(spark, sf)
    val total = Tables.df(spark, sf, "documents").count()
    assert(df.agg(sum("n_copies")).head().getLong(0) == total)
  }

  test("BoundedMinSet rejects a non-Long child at analysis time") {
    // update() reads the child with getLong semantics; ExpectsInputTypes
    // must turn a mistyped child into an AnalysisException, not a
    // runtime ClassCastException on the executors.
    val s = spark
    import s.implicits._
    val ints = Seq(1, 2, 3).toDF("x") // IntegerType child
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ints.agg(graft.functions.BoundedMinSet.bounded_min_set(col("x"), 4)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("BoundedMinSet buffer: dedupe, smallest-kept, bounded, merge- and serde-stable") {
    import graft.functions.{BoundedMinSet, BoundedSetBuf}
    val agg = BoundedMinSet(org.apache.spark.sql.catalyst.expressions.Literal(0L), cap = 4)
    def idsOf(b: BoundedSetBuf): Seq[Long] = b.ids.take(b.used).toSeq
    val buf = agg.createAggregationBuffer()
    def ins(v: Long): Unit = { // mirror update() without an InternalRow
      buf.total += 1
      agg.insert(buf, v)
    }
    Seq(9L, 3L, 7L, 3L, 12L, 1L, 8L).foreach(ins)
    assert(idsOf(buf) == Seq(1L, 3L, 7L, 8L), idsOf(buf)) // 4 smallest, deduped
    assert(buf.total == 7) // true row count survives the cap
    // merge keeps the global smallest and sums counts
    val other = agg.createAggregationBuffer()
    other.ids(0) = 2L; other.used = 1; other.total = 5
    val merged = agg.merge(agg.deserialize(agg.serialize(buf)), other)
    assert(idsOf(merged) == Seq(1L, 2L, 3L, 7L))
    assert(merged.total == 12)
  }

  test("LSH bucket cap: capped and uncapped pairs identical on the gate corpus") {
    // proves the oracle compare is untouched by the cap: no gate bucket
    // comes near LshBucketCap, so capped == exhaustive
    def pairs(cap: Int): Set[(Long, Long)] =
      graft.queries.PipelineQueries.minhashPairs(spark, sf, cap)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(graft.queries.PipelineQueries.LshBucketCap)
    val uncapped = pairs(1 << 20)
    assert(capped == uncapped, s"cap changed the gate result: " +
      s"only-capped=${capped.diff(uncapped).take(5)} only-uncapped=${uncapped.diff(capped).take(5)}")
  }

  test("ngram-jaccard df cap: capped and uncapped pairs identical on the gate corpus") {
    def pairs(cap: Int): Set[(Long, Long)] =
      graft.queries.PipelineQueries.ngramJaccardPairs(spark, sf, cap)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(graft.queries.PipelineQueries.NgramDfCap)
    val uncapped = pairs(1 << 20)
    assert(capped == uncapped, s"cap changed the gate result: " +
      s"only-capped=${capped.diff(uncapped).take(5)} only-uncapped=${uncapped.diff(capped).take(5)}")
  }

  test("ngram-jaccard df cap bounds an adversarial boilerplate corpus and reports drops") {
    // 300 near-identical docs: every boilerplate shingle's posting list
    // is 300 docs. Uncapped, each of ~60 grams expands ~45k pairs; the
    // cap must bound each posting at its `cap` smallest ids (cluster
    // still found among those) and publish the truncation.
    val dir = "/tmp/graft_test_megaposting"
    val boiler = (1 to 60).map(i => s"tok$i").mkString(" ")
    spark.range(300).selectExpr(
      "id + 1 AS doc_id",
      s"concat('$boiler', ' unique', CAST(id AS STRING)) AS text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cap = 8
    val df = graft.queries.PipelineQueries.ngramJaccardPairs(spark, dir, cap)
    val rows = df.collect()
    assert(rows.nonEmpty, "cap must not kill the cluster entirely")
    assert(rows.length <= cap * (cap - 1) / 2,
      s"pair expansion not bounded: ${rows.length} pairs")
    val metrics = df.queryExecution.observedMetrics("graft_ngram_df_cap")
    assert(metrics.getLong(0) > 0, s"no truncated gram observed: $metrics")
    assert(metrics.getLong(1) > 0, s"no dropped ids observed: $metrics")
  }

  test("ngram-jaccard prefix filter finds the exact-boundary subset pair (n % 5 == 0)") {
    // Adversarial shape from the sf0.1 gate: A's 8 shingles are a subset
    // of B's 10, jaccard = 8/(8+10-8) = exactly 0.8, and B's two
    // exclusive shingles are globally rarest (df=1 vs df=2), so they
    // occupy B's prefix slots first. The theorem prefix for n=10 is
    // n - ceil(0.8*n) + 1 = 3 (reaching B's rarest SHARED gram); the
    // former float spelling floor(0.2*n)+1 evaluated 0.2*10 as 1.99..96
    // and indexed only 2 — silently dropping the true pair.
    val dir = "/tmp/graft_test_prefix_boundary"
    val words = (1 to 12).map(i => s"pw$i")
    val docB = words.mkString(" ")                 // 12 words -> 10 shingles
    val docA = words.drop(2).mkString(" ")         // 10 words -> 8 shingles, all in B
    spark.createDataFrame(Seq((1L, docA), (2L, docB))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.PipelineQueries
      .ngramJaccardPairs(spark, dir, graft.queries.PipelineQueries.NgramDfCap)
      .collect()
    assert(got.length == 1, s"boundary pair must be found: ${got.mkString(";")}")
    assert(got.head.getLong(0) == 1L && got.head.getLong(1) == 2L)
    assert(got.head.getDouble(3) == 0.8)
  }

  test("LSH bucket cap bounds an adversarial mega-bucket and reports drops") {
    // 300 boilerplate variants that SURVIVE exact dedup (each text ends
    // with a unique token) but share ~96% of shingles — uncapped, they
    // all land in the same band buckets and expand ~45k pairs/bucket;
    // the cap must bound expansion to cap²/2 and account for the drops.
    val dir = "/tmp/graft_test_megabucket"
    val boiler = (1 to 60).map(i => s"tok$i").mkString(" ")
    spark.range(300).selectExpr(
      "id + 1 AS doc_id",
      s"concat('$boiler', ' unique', CAST(id AS STRING)) AS text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cap = 8
    val df = graft.queries.PipelineQueries.minhashPairs(spark, dir, cap)
    val rows = df.collect()
    // every pair's members come from some bucket's smallest-`cap` ids —
    // with one dominant cluster that is ids 1..cap (modulo band variety),
    // so the pair count is O(cap²), not O(300²)
    assert(rows.nonEmpty, "cap must not kill the cluster entirely")
    assert(rows.length <= 16 * cap * (cap - 1) / 2,
      s"pair expansion not bounded: ${rows.length} pairs")
    // drop accounting is published (no silent caps)
    val metrics = df.queryExecution.observedMetrics("graft_lsh_bucket_cap")
    assert(metrics.getLong(0) > 0, s"no oversized bucket observed: $metrics")
    assert(metrics.getLong(1) > 0, s"no dropped ids observed: $metrics")
  }

  test("skewed corpus: caps fire on the mega-bucket, recall on non-capped pairs stays 1.0") {
    // The round-10 verdict's adversarial skew shape: a corpus that mixes
    // one mega-cluster (200 boilerplate variants = 25× the cap, all in
    // the same band buckets / posting lists) with 30 ORDINARY near-dup
    // pairs on disjoint vocabularies. The cap must fire loudly on the
    // mega-bucket — AND must not cost a single ordinary pair: capping
    // drops ids only from oversized buckets, and no ordinary pair's
    // bucket is anywhere near the cap. Both candidate generators
    // (banded MinHash, df-capped inverted index) under the same test.
    val dir = "/tmp/graft_test_skewmix"
    val boiler = (1 to 60).map(i => s"tok$i").mkString(" ")
    val mega = spark.range(200).selectExpr(
      "id + 1 AS doc_id",
      s"concat('$boiler', ' unique', CAST(id AS STRING)) AS text")
    // pair k: 12 shared words pwK_1..pwK_12 + one extra word on the B
    // side -> 10 vs 11 shingles, 10 shared, jaccard 10/11 ≈ 0.909
    val normal = spark.range(30).selectExpr("id AS k").selectExpr(
      "10001 + k * 2 AS a_id", "10002 + k * 2 AS b_id",
      "concat_ws(' ', transform(sequence(1, 12), i -> concat('pw', k, '_', i))) AS a_text")
      .selectExpr("a_id", "b_id", "a_text",
        "concat(a_text, ' pextra') AS b_text")
    val docs = mega.unionByName(
        normal.selectExpr("a_id AS doc_id", "a_text AS text"))
      .unionByName(normal.selectExpr("b_id AS doc_id", "b_text AS text"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cap = 8
    val truth = (0 until 30).map(k => (10001L + k * 2, 10002L + k * 2)).toSet
    for ((name, frame) <- Seq(
        "minhash" -> graft.queries.PipelineQueries.minhashPairs(spark, dir, cap),
        "ngram" -> graft.queries.PipelineQueries.ngramJaccardPairs(spark, dir, cap))) {
      val rows = frame.collect().map(r => (r.getLong(0), r.getLong(1)))
      // recall 1.0 on the pairs no cap ever touched
      val found = rows.filter(p => p._1 > 10000L).toSet
      assert(truth.subsetOf(found),
        s"$name lost ordinary pairs under skew: missing ${(truth -- found).take(5)}")
      // mega-cluster expansion bounded by the cap, not by 200²
      val megaPairs = rows.count(_._1 <= 10000L)
      assert(megaPairs <= 16 * cap * (cap - 1) / 2,
        s"$name mega expansion unbounded: $megaPairs pairs")
      // and the drops are published, never silent
      val key = if (name == "minhash") "graft_lsh_bucket_cap" else "graft_ngram_df_cap"
      val m = frame.queryExecution.observedMetrics(key)
      assert(m.getLong(0) > 0 && m.getLong(1) > 0, s"$name drop counters silent: $m")
    }
  }

  test("heavy hitters fails loudly when the sketch cannot certify exact top-k") {
    // 400 distinct tokens at ~equal frequency: every top-20 recount is
    // ~N/400 < N/101, so the MG candidate set may have silently dropped
    // a true top-20 token — the in-plan assert_true must throw rather
    // than return a plausible-but-uncertified top-k.
    val dir = "/tmp/graft_test_flatvocab"
    spark.range(400).selectExpr(
      "id + 1 AS doc_id",
      // each doc repeats its own token 5 times: flat 400-token vocabulary
      "concat_ws(' ', array_repeat(concat('tok', CAST(id AS STRING)), 5)) AS text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] {
      SparkEntry.queries("q_text_heavy_hitters")(spark, dir).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("cannot certify")),
      s"expected the certification guard to fire, got: $e")
  }

  test("adaptive heavy hitters escalates m until the MG bound certifies, then matches brute force") {
    // The scale path for the loud failure above (and the round-13 sf1
    // smoke's one failure): 30 hot tokens ×200 over a 10k-singleton
    // tail. At m=2 the sketch can't even hold 20 candidates; at m=32
    // the kth count (200) doesn't clear N/(m+1); only at m=128 does the
    // MG bound certify (200·129 = 25 800 > N = 16 000) — so the helper
    // must escalate exactly to 128 and the certified top-20 must equal
    // a from-scratch brute-force count.
    val s = spark
    import s.implicits._
    val hot = (0 until 30).flatMap(i => Seq.fill(200)(f"hot$i%02d"))
    val cold = (0 until 10000).map(i => s"cold$i")
    val toks = scala.util.Random.shuffle(hot ++ cold).toDF("token").repartition(4)
    val (topk, m) = graft.queries.PipelineQueries.heavyHittersAdaptive(
      toks, k = 20, m0 = 2, mMax = 1 << 20)
    assert(m == 128, s"expected escalation 2 -> 8 -> 32 -> 128, certified at m=$m")
    val got = topk.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val brute = (hot ++ cold).groupBy(identity).view
      .map { case (t, vs) => (t, vs.size.toLong) }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(20)
    assert(got == brute, s"got=$got")
    // and past the cap it throws rather than serving uncertified results
    val e = intercept[IllegalStateException](
      graft.queries.PipelineQueries.heavyHittersAdaptive(toks, 20, 2, 8))
    assert(e.getMessage.contains("uncertifiable"), e.getMessage)
  }

  test("fixed-m heavy hitters certifies a whole-vocabulary corpus even with a saturated sketch") {
    // round-13 ADVICE regression: vocabulary EXACTLY m, all retained —
    // the sketch comes back saturated (recCount == m) but the candidate
    // set IS the whole vocabulary, so the anti-join certifies. The certB
    // gate must lift on the final attempt (m0 == mMax here) instead of
    // throwing. certA cannot fire: the 20th count is 1 and 1·101 <= N.
    val s = spark
    import s.implicits._
    val toks = ((0 until 19).flatMap(i => Seq.fill(100)(f"hot$i%02d")) ++
      (0 until 81).map(i => f"cold$i%02d")).toDF("token").repartition(4)
    val (topk, m) = graft.queries.PipelineQueries.heavyHittersAdaptive(
      toks, k = 20, m0 = 100, mMax = 100)
    assert(m == 100)
    val got = topk.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.take(19).forall(_._2 == 100L) && got(19) == ("cold00", 1L),
      got.mkString(","))
  }

  test("q_text_repetition signals equal per-doc Scala recounts") {
    def round9(x: Double): Double =
      BigDecimal.valueOf(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = SparkEntry.queries("q_text_repetition")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getInt(4), r.getDouble(5), r.getBoolean(6)))
      .toMap
    val docs = Tables.df(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val w = text.split(" ", -1)
      val topWord = w.groupBy(identity).values.map(_.length).max
      val bigrams = w.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val topBigram = if (bigrams.isEmpty) 0 else bigrams.groupBy(identity).values.map(_.length).max
      val wordFrac = topWord.toDouble / w.length
      val bigramFrac = if (bigrams.isEmpty) 0.0 else topBigram.toDouble / bigrams.length
      val expect = (w.length, topWord, round9(wordFrac), topBigram, round9(bigramFrac),
        wordFrac > 0.2 || bigramFrac > 0.18)
      assert(got(id) == expect, s"doc $id")
    }
  }

  test("q_text_langid equals a from-scratch trigram-profile classifier") {
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.length >= 3)
    def tris(t: String): Seq[String] = (0 to t.length - 3).map(i => t.substring(i, i + 3))
    // profiles train on the same deterministic 20% Knuth hash sample
    val sample = docs.filter(d => (d._1 * 2654435761L) % 4294967296L < 858993459L)
    val profiles = sample.groupBy(_._2).view.mapValues { grp =>
      grp.flatMap(d => tris(d._3)).groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (tg, c) => (-c, tg) }.take(20).map(_._1).toSet
    }.toMap
    val expect = docs.flatMap { case (id, lang, text) =>
      val dt = tris(text).toSet
      val scores = profiles.toSeq
        .map { case (cand, prof) => (cand, (dt & prof).size) }
        .filter(_._2 > 0)
      if (scores.isEmpty) None
      else {
        val (pred, score) = scores.minBy { case (cand, sc) => (-sc, cand) }
        Some(id -> ((lang, pred, score, pred == lang)))
      }
    }.toMap
    val got = SparkEntry.queries("q_text_langid")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q_events_resample equals per-user grid + forward fill from scratch") {
    val ev = Tables.df(spark, sf, "events")
      .select(col("user_id"), unix_millis(col("ts").cast("timestamp")).as("ms"),
        col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val step = 21600000L
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      // equal-ts collapse by max event_id, then sorted series
      val series = rows.groupBy(_._2).toSeq
        .map { case (ms, g) => ms -> g.maxBy(_._3)._4 }
        .sortBy(_._1)
      val (mn, mx) = (series.head._1, series.last._1)
      (mn to mx by step).map { gms =>
        val v = series.takeWhile(_._1 <= gms).last._2
        (u, gms) -> v
      }
    }.toMap
    val got = SparkEntry.queries("q_events_resample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q_join_interval equals the naive user-equi + range-filter join") {
    val got = SparkEntry.queries("q_join_interval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.df(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val win = 30L * 60 * 1000
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._1)
    val expect = ev.filter(_._3 == "purchase").flatMap { case (u, pid, _, pms) =>
      val cs = clicksByUser.getOrElse(u, Array.empty)
        .map(_._4).filter(c => c > pms - win && c <= pms)
      if (cs.isEmpty) None else Some((u, pid) -> ((cs.length.toLong, pms - cs.max)))
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q_text_entropy equals a from-scratch Shannon entropy") {
    val got = SparkEntry.queries("q_text_entropy")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    Tables.df(spark, sf, "documents").select("doc_id", "text").collect()
      .foreach { r =>
        val counts = r.getString(1).groupBy(identity).map(_._2.length.toDouble)
        val tn = counts.sum
        val h = -counts.map(c => (c / tn) * math.log(c / tn)).sum
        val (ge, gn) = got(r.getLong(0))
        assert(math.abs(ge - h) < 1e-8 && gn == counts.size, s"doc ${r.getLong(0)}")
      }
    // sanity: word-soup entropy sits between single-char (0) and the
    // uniform bound ln(alphabet)
    assert(got.values.forall { case (h, k) => h > 0 && h <= math.log(k.toDouble) + 1e-9 })
  }

  test("q_embed_qa detectors fire on a corrupted copy") {
    import org.apache.spark.sql.functions._
    // corrupt a copy of the corpus: off-norm scaling, NaN injection,
    // wrong dimension — the exact failure modes the QA counts
    val e = Tables.df(spark, sf, "embeddings")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .withColumn("v", expr(
        """CASE WHEN vec_id % 10 = 0 THEN transform(v, x -> x * 2.0D)
          |     WHEN vec_id % 7 = 0 THEN concat(array(CAST('NaN' AS DOUBLE)), slice(v, 2, 63))
          |     WHEN vec_id % 13 = 0 THEN slice(v, 1, 32)
          |     ELSE v END""".stripMargin))
    val n = e.select(col("label"),
      sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))).as("nrm"),
      size(col("v")).as("dim"),
      expr("size(filter(v, x -> isnan(x) OR x IS NULL))").as("n_bad"))
    val qa = n.agg(
      sum(when(col("dim") =!= 64, 1).otherwise(0)).as("bad_dim"),
      sum(when(col("n_bad") > 0, 1).otherwise(0)).as("bad_vals"),
      sum(when(col("nrm") < 0.99 || col("nrm") > 1.01, 1).otherwise(0)).as("off_norm"))
      .collect()(0)
    assert(qa.getLong(0) > 0 && qa.getLong(1) > 0 && qa.getLong(2) > 0, qa.toString)
    // and the clean corpus reports zeros on every detector
    val clean = SparkEntry.queries("q_embed_qa")(spark, sf).collect()
    assert(clean.forall(r => r.getLong(2) == 0 && r.getLong(3) == 0 && r.getLong(4) == 0))
  }

  test("q_text_bpe equals a from-scratch BPE learner") {
    val got = SparkEntry.queries("q_text_bpe")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // independent reimplementation: word-freq map, 3 rounds of
    // (count adjacent pairs, take argmax, left-to-right merge)
    var seqs: Map[Vector[String], Long] = Tables.df(spark, sf, "documents")
      .select(col("text")).collect().flatMap(_.getString(0).split(" "))
      .groupBy(identity).map { case (w, ws) => w.map(_.toString).toVector -> ws.length.toLong }
    val expect = (1 to 3).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      seqs.foreach { case (tk, f) =>
        tk.sliding(2).filter(_.size == 2).foreach(p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f)
      }
      val (a, b) = counts.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }.head._1
      val cnt = counts((a, b))
      seqs = seqs.groupBy { case (tk, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < tk.length) {
          if (i + 1 < tk.length && tk(i) == a && tk(i + 1) == b) { out += a + b; i += 2 }
          else { out += tk(i); i += 1 }
        }
        out.result()
      }.map { case (tk, grp) => tk -> grp.values.sum }
      (r, a, b, cnt)
    }
    assert(got.toSeq == expect)
  }

  test("q_dedup_incremental: every delta doc finds its original at jaccard 1.0; probe is deterministic") {
    val got = SparkEntry.queries("q_dedup_incremental")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact re-ingest ⇒ the (delta, original) self-pair is never missed
    // (P[band miss] = 0 at jaccard 1.0) — this is the guarantee the
    // persisted-index path must keep
    val deltaIds = Tables.df(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 0)
      .filter(org.apache.spark.sql.functions.size(split(col("text"), " ")) >= 3)
      .select("doc_id").collect().map(_.getLong(0))
    val pairs = got.map(p => (p._1, p._2)).toSet
    deltaIds.foreach { id =>
      assert(pairs((id + 1000000, id)), s"delta of doc $id lost its original")
      assert(got.find(p => p._1 == id + 1000000 && p._2 == id).get._3 == 1.0)
    }
    // warm probe against the already-persisted index returns the same rows
    val again = SparkEntry.queries("q_dedup_incremental")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("q_events_funnel equals a from-scratch per-user-day walk") {
    val Array(nU, nV, nVC, nF) =
      SparkEntry.queries("q_events_funnel")(spark, sf).collect()(0)
        .toSeq.map(_.asInstanceOf[Long]).toArray
    // independent reimplementation: bucket events into (user, utc-day)
    // units, then walk each unit for view < click < purchase
    val ev = Tables.df(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val units = ev.groupBy(e => (e._1, e._3 / 86400000L)).values
      .map(_.map(e => (e._2, e._3)).toSeq).toSeq
    def stage(unit: Seq[(String, Long)], tpe: String, after: Long): Option[Long] =
      unit.filter(e => e._1 == tpe && e._2 > after).map(_._2).minOption
    val v = units.flatMap(u => stage(u, "view", Long.MinValue).map(u -> _))
    val vc = v.flatMap { case (u, t1) => stage(u, "click", t1).map(u -> _) }
    val full = vc.flatMap { case (u, t2) => stage(u, "purchase", t2) }
    assert((nU, nV, nVC, nF) ==
      ((units.size.toLong, v.size.toLong, vc.size.toLong, full.size.toLong)))
    assert(nF > 0 && nF <= nVC && nVC <= nV && nV <= nU,
      s"funnel must attrit monotonically: $nU/$nV/$nVC/$nF")
  }

  test("q_agg_histogram: exact bucket accounting from first principles") {
    val got = SparkEntry.queries("q_agg_histogram")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cents = Tables.df(spark, sf, "lineitem")
      .select(expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("c"))
      .collect().map(_.getLong(0))
    val (mn, mx) = (cents.min, cents.max)
    val expect = cents.groupBy(c => (c - mn) * 20 / (mx - mn + 1)).toSeq
      .map { case (b, vs) => (b, mn + b * (mx - mn + 1) / 20, vs.length.toLong, vs.sum) }
      .sortBy(_._1)
    assert(got.toSeq == expect)
    assert(got.map(_._3).sum == cents.length.toLong, "every row lands in exactly one bucket")
  }

  test("q_embed_drift matches centroid-cosine recomputation; identical snapshots give 1.0") {
    val got = SparkEntry.queries("q_embed_drift")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val vecs = Tables.df(spark, sf, "embeddings")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
    val expect = vecs.groupBy(_._2).map { case (label, rows) =>
      def fixSum(f: (Long, Seq[Double]) => Seq[Double]): Array[Double] = {
        val acc = new Array[Double](64)
        rows.foreach { case (id, _, v) =>
          f(id, v).zipWithIndex.foreach { case (x, i) =>
            acc(i) += math.floor(x * 16777216L)
          }
        }
        acc
      }
      val s1 = fixSum((_, v) => v)
      val s2 = fixSum((id, v) => v.zipWithIndex.map { case (x, i) =>
        x + ((id * 31 + i) % 7 - 3).toDouble / 128.0
      })
      def dot(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      label -> (rows.size.toLong,
        dot(s1, s2) / (math.sqrt(dot(s1, s1)) * math.sqrt(dot(s2, s2))))
    }
    expect.foreach { case (label, (n, cos)) =>
      val (gn, gcos) = got(label)
      assert(gn == n && math.abs(gcos - cos) < 1e-6, s"label $label: $gcos vs $cos")
      assert(gcos > 0.8 && gcos < 1.0, s"jittered drift should be high-but-not-1, got $gcos")
    }
    assert(got.keySet == expect.keySet)
  }

  test("winnowing guarantee: a shared >= w+k-1 word passage yields a shared fingerprint") {
    // Two docs with disjoint vocabulary except one exact 6-word passage
    // (= w+k-1 for w=4, k=3): winnowing MUST select at least one
    // identical fingerprint in both (the shared window picks the same
    // minimum), while keeping far fewer fingerprints than gram count.
    val shared = "alpha beta gamma delta epsilon zeta"
    val docA = s"one two three four five $shared six seven eight nine ten"
    val docB = s"red blue green yellow purple $shared orange pink brown maroon teal"
    val fps = graft.queries.PipelineQueries
      .winnowFps(spark.createDataFrame(Seq((0L, docA), (1L, docB))).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    assert(fps(0L).intersect(fps(1L)).nonEmpty,
      "shared 6-word passage must produce a common fingerprint")
    // density: selections are a strict subset of the gram hashes
    val nGramsA = docA.split(" ").length - 2
    assert(fps(0L).nonEmpty && fps(0L).size < nGramsA,
      s"${fps(0L).size} fingerprints should be < $nGramsA grams")
    // control: two docs with NO shared 6-word run share nothing
    val docC = s"one two three four five six seven eight nine ten eleven"
    val fps2 = graft.queries.PipelineQueries
      .winnowFps(spark.createDataFrame(Seq((0L, docC), (1L, docB))).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    assert(fps2(0L).intersect(fps2(1L)).isEmpty)
  }

  test("q_text_rake equals a from-scratch RAKE scorer") {
    val stops = Set("a", "the", "value", "table")
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // candidate phrases: maximal stopword-free runs per doc
    val occurrences = docs.flatMap { case (_, text) =>
      val runs = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.newBuilder[String]
      text.split(" ").foreach { w =>
        if (stops(w)) { val r = cur.result(); if (r.nonEmpty) runs += r; cur = List.newBuilder[String] }
        else cur += w
      }
      val last = cur.result(); if (last.nonEmpty) runs += last
      runs.toSeq
    }
    val deg = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val freq = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    occurrences.foreach { ph =>
      ph.foreach { w => deg(w) += ph.length.toLong; freq(w) += 1L }
    }
    val sn = deg.keys.map(w => w -> (deg(w) * 1000000000L) / freq(w)).toMap
    val byPhrase = occurrences.groupBy(_.mkString(" ")).map { case (p, occ) =>
      (p, occ.head.length.toLong, occ.length.toLong, occ.head.map(sn).sum)
    }.toSeq
    val expect = byPhrase.sortBy { case (p, _, _, pn) => (-pn, p) }.take(15)
    val got = SparkEntry.queries("q_text_rake")(spark, sf).collect()
    assert(got.length == expect.length)
    got.zip(expect).zipWithIndex.foreach { case ((g, (p, nw, nocc, pn)), i) =>
      assert(g.getString(0) == p, s"rank ${i + 1}: ${g.getString(0)} vs $p")
      assert(g.getLong(1) == nw && g.getLong(2) == nocc)
      assert(math.abs(g.getDouble(3) - pn.toDouble / 1e9) < 1e-9)
      assert(g.getLong(4) == i + 1L)
    }
  }

  test("fixed-point PageRank matches the exact recurrence on a path; clique is uniform") {
    import graft.queries.PipelineQueries.pageRankScaled
    val Scale = 1000000000000000L
    // path 1-2-3 (symmetric): replicate the integer recurrence exactly
    val pathEdges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val got = pageRankScaled(
      spark.createDataFrame(pathEdges).toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val od = Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
    val base = 15L * Scale / (100L * 3)
    var r = Map(1L -> Scale / 3, 2L -> Scale / 3, 3L -> Scale / 3)
    for (_ <- 1 to 3) {
      def c(u: Long) = (r(u) * 85L) / (100L * od(u))
      r = Map(1L -> (base + c(2L)), 2L -> (base + c(1L) + c(3L)), 3L -> (base + c(2L)))
    }
    r.foreach { case (v, expR) =>
      assert(got(v) == ((od(v), expR)), s"vertex $v: ${got(v)} vs (${od(v)}, $expR)")
    }
    // total mass stays within (teleport-truncation, 1]: conserved up to div truncation
    assert(r.values.sum <= Scale && r.values.sum > Scale * 9 / 10)
    // clique K4: symmetry forces identical ranks
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i != j) yield (i, j)
    val gotK4 = pageRankScaled(
      spark.createDataFrame(k4).toDF("src", "dst"), 3)
      .collect().map(_.getLong(2)).toSet
    assert(gotK4.size == 1, s"clique ranks must be uniform, got $gotK4")
  }

  test("q_events_anomaly equals a from-scratch integer z-score monitor") {
    val daily = Tables.df(spark, sf, "events")
      .selectExpr("event_type", "unix_millis(CAST(ts AS TIMESTAMP)) div 86400000 AS d")
      .groupBy("event_type", "d").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).flatMap { case (et, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.drop(7).map { i =>
        val win = sorted.slice(i - 7, i).map(_._3)
        val s = win.sum
        val q = win.map(x => x * x).sum
        val c = sorted(i)._3
        (et, sorted(i)._2) -> ((c, (7 * c - s) * (7 * c - s) > 4 * (7 * q - s * s)))
      }
    }
    val got = SparkEntry.queries("q_events_anomaly")(spark, sf).collect()
    assert(got.length == expect.size, s"${got.length} rows vs ${expect.size}")
    got.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val (c, flag) = expect(k)
      assert(r.getLong(2) == c && r.getBoolean(4) == flag, s"cell $k")
    }
    // the fixture must exercise both branches or the test proves nothing
    assert(got.exists(_.getBoolean(4)) && got.exists(!_.getBoolean(4)))
  }

  test("q_graph_triangles equals a from-scratch per-vertex recount") {
    import graft.queries.PipelineQueries
    val p = PipelineQueries.minhashPairs(spark, sf, PipelineQueries.LshBucketCap)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    val edgeSet = p.toSet
    val adj = p.flatMap { case (i, j) => Seq(i -> j, j -> i) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val got = SparkEntry.queries("q_graph_triangles")(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == adj.keySet, "one row per pair-graph vertex")
    got.foreach { r =>
      val (v, deg, tri, cc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(adj(v).size.toLong == deg, s"degree of $v")
      val expTri = adj(v).toSeq.combinations(2).count { case Seq(a, b) =>
        edgeSet.contains((math.min(a, b), math.max(a, b)))
      }
      assert(expTri.toLong == tri, s"triangles at $v")
      if (deg >= 2) assert(math.abs(cc - 2.0 * tri / (deg * (deg - 1))) < 1e-9)
      else assert(cc == 0.0)
    }
    // the gate corpus must contain a closed triangle or this proves little
    assert(got.exists(_.getLong(2) > 0))
  }

  test("q_ann_mmr equals a from-scratch greedy over raw embeddings") {
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // independent cosine: sequential double sums, like the codegen expr
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      r9(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val vs = Tables.df(spark, sf, "embeddings")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val qv = vs(0L)
    val shortlist = (vs - 0L).toSeq
      .map { case (id, v) => (id, cos(v, qv)) }
      .sortBy { case (id, cs) => (-cs, id) }.take(20)
    var chosen = List.empty[(Long, Double)]
    val expect = (1 to 5).map { rnk =>
      val (id, cs, mmr) = shortlist
        .filterNot(c => chosen.exists(_._1 == c._1))
        .map { case (id, cs) =>
          val div = if (chosen.isEmpty) 0.0
                    else chosen.map(s => cos(vs(id), vs(s._1))).max
          (id, cs, r9(0.7 * cs - 0.3 * div))
        }
        .minBy { case (id, _, m) => (-m, id) }
      chosen ::= (id, cs)
      (rnk, id, cs, mmr)
    }
    val got = SparkEntry.queries("q_ann_mmr")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == expect.toSeq, s"\ngot    $got\nexpect $expect")
    // the diversification must actually bite on this corpus: the MMR set
    // differs from the plain top-5 (which near-dup hits would dominate)
    assert(got.map(_._2).toSet != shortlist.take(5).map(_._1).toSet)
  }

  test("animated-GIF round-trip: frame count, dims, and every pixel survive") {
    // Direct codec pin under the catalog query: the real GIF writer
    // must store exactly nFrames frames (getNumImages re-counts them
    // from the container) and the indexed-gray encode must be lossless
    // pixel-for-pixel — stronger than the gate's stats match.
    import graft.queries.MultimodalQueries.{encodeGif, decodeGifFrames, gifPix}
    val (id, w, h, nf) = (42L, 11, 9, 4)
    val frames = decodeGifFrames(encodeGif(id, w, h, nf))
    assert(frames.length == nf)
    frames.foreach { case (f, dw, dh, sum, mn, mx) =>
      assert((dw, dh) == (w, h), s"frame $f dims")
      val pix = for { y <- 0 until h; x <- 0 until w } yield gifPix(id, f, x, y)
      assert(sum == pix.map(_.toLong).sum, s"frame $f sum")
      assert(mn == pix.min && mx == pix.max, s"frame $f min/max")
    }
    // and the catalog query emits one row per (doc, frame) with the
    // formula's frame count
    val got = SparkEntry.queries("q_mm_video_frames_real")(spark, sf)
      .groupBy("doc_id").agg(count(lit(1)).as("rows"), max("n_frames").as("nf"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) == r.getInt(2).toLong, s"doc ${r.get(0)}"))
  }

  test("LSH pair artifact ships its drop accounting and a corpus-fingerprinted path") {
    // serving pairs from disk must not lose the no-silent-caps
    // invariant: the build writes a one-row `caps` rollup any consumer
    // can audit; and the artifact path embeds a content fingerprint of
    // the source files, so a corpus rewritten in place rebuilds instead
    // of serving stale pairs
    val base = graft.queries.PipelineQueries.ensureLshIndex(spark, sf)
    assert(base.matches(".*lsh_idx3_[0-9a-f]{12}$"), base)
    val caps = spark.read.parquet(s"$base/caps").collect()
    assert(caps.length == 1)
    assert(caps(0).schema.fieldNames.toSeq == Seq("oversized_buckets", "dropped_ids"))
    // gate corpus: capped == uncapped is pinned elsewhere, so the build
    // must record exactly zero drops here
    assert(caps(0).getLong(0) == 0L && caps(0).getLong(1) == 0L, caps(0).toString)
  }

  test("probeCellsCol matches driver-side probeCells per row, probe #1 == cellCol") {
    // The in-plan multi-probe column is the row-as-query face of the
    // driver-side probeCells (every corpus row probing the IVF index
    // for itself, e.g. batch candidate generation). Pin the two faces
    // identical row-by-row over real embeddings, and pin that the
    // nearest-probe choice equals cellCol's single-cell assignment —
    // ties can't occur on 64-d double dot products of distinct vectors.
    import graft.functions.IvfIndex
    val e = Tables.df(spark, sf, "embeddings")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
    val centers = IvfIndex.trainCentroids(e.select("vec_id", "v"), k = 8, iters = 1)
    val nProbe = 3
    val rows = e
      .withColumn("pc", IvfIndex.probeCellsCol(centers, col("v"), nProbe))
      .withColumn("c1", IvfIndex.cellCol(centers, col("v")))
      .select("vec_id", "v", "pc", "c1").collect()
    assert(rows.length > 50)
    rows.foreach { r =>
      val want = IvfIndex.probeCells(centers, r.getSeq[Double](1).toArray, nProbe)
      assert(r.getSeq[Int](2) == want, s"vec ${r.getLong(0)}")
      assert(r.getInt(3) == want.head, s"vec ${r.getLong(0)}: cellCol != probe #1")
    }
  }

  test("minhash signature estimate certifies against exact jaccard at a third SF") {
    val got = SparkEntry.queries("q_dedup_sig_estimate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.nonEmpty)
    got.foreach { t =>
      assert(t._5, t.toString) // the corpus-wide weighted-mean bound holds
      // buckets are 0.05-wide milli slices of [0.8, 1.0]
      assert(t._1 >= 16 && t._1 <= 20 && t._4 / 50 == t._1, t.toString)
    }
  }
}
