package graft

import org.apache.spark.sql.DataFrame

/** Engine-level invariance: a catalog query's RESULT must not depend on
  * how the engine happened to execute it — AQE on or off, 4 shuffle
  * partitions or 7. This is the distributed-correctness property that
  * separates a deterministic pipeline from one that only "usually"
  * returns the same rows (the reason every selection/packing operator
  * keys on data hashes, never on partition layout). The subset below
  * exercises the riskiest shapes: two-phase aggs, multi-join + AQE
  * broadcast flips, the range-repartition prefix sum, LSH banding,
  * windowed packing, and the union-merge forward fill.
  */
class InvarianceSpec extends GraftSuite {

  private val queries = Seq(
    "q1_pricing_summary",   // two-phase agg
    "q_tpch_q5",            // 6-table join, AQE strategy flips
    "q_cur_token_budget",   // range repartition + spark_partition_id offsets
    "q_dedup_minhash",      // banded LSH candidate generation
    "q_window_rank",        // window over hash partitioning
    "q_cur_pack",           // per-stratum cumulative packing
    "q_events_resample",    // union-merge forward fill
    "q_text_heavy_hitters", // MG sketch partials merge in layout-dependent
                            //   order; the exact recount must erase that
    "q_zorder_scan",        // layout + row-group pruning must not leak into results
    "q_tpch_q2",            // derived partsupp + agg-then-join decorrelation
    "q_cur_datasheet",      // integer-exact mean quality across merge orders
    "q_embed_kmeans",       // fixed-point Lloyd's: integer distances/updates
                            //   must be bit-stable across merge orders
    "q_dedup_substring",    // islands windows over hash-joined positions
    "q_graph_pagerank",     // fixed-point iteration sums must be
                            //   merge-order-independent at any parallelism
    "q_events_anomaly",     // integer z-score over map-side-collapsed cells
    "q_ann_mmr",            // driver greedy over round9 sims: shortlist +
                            //   pairwise passes must not depend on layout
    "q_graph_incremental",  // index-probe edges + fixed-point PR on the
                            //   merged graph, across layouts
    "q_graph_triangles",    // degree-ordered wedge orientation must not
                            //   change the triangle set
    "q_cur_dsir",           // fixed-point model + integer score sums must
                            //   pick the same top-100 at any parallelism
    "q_cur_split_leakfree", // label propagation + canonical-bucket join
                            //   across AQE/partition layouts
    "q_embed_pca_power",    // round 9: decimal matvec accumulations +
                            //   BigInt rescale must be bit-stable across
                            //   merge orders and partition counts
    "q_events_rfm",         // round 9: global tiebroken NTILEs over the
                            //   one-partition window at any input layout
    "q_text_dup_ngram",     // round 9: gram-df join + integer milli
                            //   fractions across gram partitionings
    "q_events_active_users",// round 9: explode + re-distinct trailing
                            //   counts across layouts
    "q_agg_chi2",           // round 9: nano-fixed-point term sum must be
                            //   merge-order-independent
    "q_agg_ttest",          // round 9: decimal per-arm moments at any
                            //   partition count
    "q_agg_ks",             // round 10: integer sup over the value-
                            //   distinct cumulative frame at any layout
    "q_cur_bradley_terry",  // round 10: duel recount + driver-model MM
                            //   fit must not see partitioning
    "q_audit_profile",      // round 10: exploded two-phase distinct +
                            //   min/max renderings across layouts
    "q_agg_mannwhitney",    // round 10: doubled-rank integer sums over
                            //   the value-distinct frame at any layout
    "q_cur_pack_sequences", // round 11: the doc_id-ordered global prefix
                            //   sum (range repartition + pid offsets)
                            //   must yield identical offsets at any
                            //   partition count — layout can never move
                            //   a doc between context windows
    "q_cur_pack_stats",     // round 11: per-window manifest over the
                            //   same prefix sum, across layouts
    "q_cur_mad_outliers",   // round 11: exact order statistics over the
                            //   value-distinct cumulative frame at any
                            //   parallelism
    "q_text_psi_bysource",  // round 11: nano-fixed-point PSI terms on
                            //   the model grid must be merge-order-free
    "q_graph_neighborhood", // round 11: exact ball expansion + HLL
                            //   sketch unions (order-insensitive
                            //   registers) across layouts
    "q_graph_harmonic",     // round 11: per-vertex ball deltas + top-20
                            //   total order at any parallelism
    "q_cur_bloom_decontam", // round 11: bloom bits are an OR — insertion
                            //   order free; post-bloom exact counts
                            //   across layouts
    "q_cur_tcloseness",     // round 11: HUGEINT grid TVD sums must be
                            //   merge-order-independent
    "q_events_active_sketch", // round 11: per-day HLL union estimates +
                            //   exact trailing counts across layouts
    "q_text_cms_counts",    // round 11: CMS partials merge elementwise —
                            //   estimates identical at any layout; probe
                            //   set is a total order
    "q_cur_shard_manifest", // round 11: prefix-sum shard assignment +
                            //   modular fingerprints must be identical
                            //   at any partition count
    "q_dedup_sig_estimate", // round 11: per-seed min-hash signatures and
                            //   integer moments across merge orders
    "q_text_zipf",          // round 11: nano-integerized regression
                            //   moments must be merge-order-free
    "q_text_heaps",         // round 11: order-statistic cutoffs +
                            //   first-occurrence MIN aggregate across
                            //   layouts
    "q_agg_jackknife",      // round 11: LOO integer means + exact
                            //   squared-deviation sums at any
                            //   parallelism
    "q_events_active_incremental", // round 11: stored sketch readback +
                            //   delta union across layouts
    "q_agg_weighted_exact", // round 16: groupedPrefix's bucket count now
                            //   DERIVES from shuffle.partitions (value-
                            //   derived pid slices) — a different count
                            //   means different slicing, and the median
                            //   must not move
    "q_agg_trimmed")        // round 16: trimmed/winsor interval math over
                            //   the same value-distinct cums across
                            //   slicings

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq // every catalog query ends in ORDER BY

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("results are identical with AQE disabled") {
    val baseline = queries.map(q => q -> canon(SparkEntry.queries(q)(spark, sf))).toMap
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      queries.foreach { q =>
        assert(canon(SparkEntry.queries(q)(spark, sf)) == baseline(q), s"$q changed without AQE")
      }
    }
  }

  test("results are identical with a different shuffle partition count") {
    val baseline = queries.map(q => q -> canon(SparkEntry.queries(q)(spark, sf))).toMap
    withConfs("spark.sql.shuffle.partitions" -> "7") {
      queries.foreach { q =>
        assert(canon(SparkEntry.queries(q)(spark, sf)) == baseline(q), s"$q changed at 7 partitions")
      }
    }
  }

  test("groupedPrefix equals the naive RANGE window on adversarial value shapes") {
    // Round-16 machinery pin: the value-derived slicing must yield the
    // exact RANGE cumulative weight per (group, value) — the contract
    // every consumer (median selector, trim bands, winsor boundaries)
    // relies on — on shapes the lineitem oracle rows never exercise:
    // one value repeated massively (a single bucket swallows the
    // group), a group smaller than the slice count, 90/10 group skew,
    // and negative/duplicated weights. Comparison is at the VALUE
    // level (max cum per (g, v)): ROWS ties inside a run differ by
    // design; the run's last row carrying the full RANGE cum is the
    // invariant.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rows = Seq.tabulate(5000) { i =>
      val g = if (i % 10 < 9) "big" else "small"
      val v =
        if (g == "big") { if (i % 3 == 0) 7.0 else (i % 50).toDouble - 25.0 }
        else i.toDouble
      (g, v, (i % 7 + 1).toLong)
    } ++ Seq.tabulate(3)(_ => ("tiny", 42.0, 5L)) // all-equal, < |slices| values
    val df = rows.toDF("g", "v", "w")
    val got = graft.queries.AggregateQueries.groupedPrefix(df, "g", "v", col("w"))
      .groupBy("g", "v").agg(max("cum").as("cum"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted
    val rangeW = Window.partitionBy("g").orderBy("v")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum("w").over(rangeW))
      .groupBy("g", "v").agg(max("cum").as("cum"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted
    assert(got.length == want.length && got.sameElements(want),
      s"groupedPrefix diverged from the RANGE window: " +
        got.zip(want).filter(p => p._1 != p._2).take(5).mkString(";"))
  }
}
