package graft

import org.apache.spark.sql.SaveMode

/** Scale smoke for the graph family + the round-9 additions, runnable
  * without re-driving the whole [[Smoke]] sequence: ×M documents (exact
  * duplicate copies — every original becomes an M-clique in the
  * near-dup graph, the adversarial regime for wedge joins) and ×M
  * jittered embeddings, through the SAME catalog entries the gate runs.
  * Evidence cited by BASELINE.md's round-9 scale-smoke section.
  *
  * Usage: GraphSmoke <sfDir> [mult]   (default 10)
  */
object GraphSmoke {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(master = s"local[$cpus]", appName = "graft-graph-smoke")
    val dir = s"/tmp/graft_smoke/${new java.io.File(sfDir).getName}_d${mult}_v$mult"
    Smoke.ensureCorpus(spark, sfDir, dir, mult, mult)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    println(s"GRAPH-SMOKE corpus: $nDocs docs, $nVecs vectors at $dir")

    // time construction + the noop-sink execution as one region (the
    // Bench convention: construction is where eager-checkpoint queries
    // do their materializing work, and count() alone would let Catalyst
    // prune the query body); the row count for the report is a second,
    // UNtimed execution of the returned frame
    def run(q: String): (Long, Double) = {
      val (df, t) = time {
        val frame = SparkEntry.queries(q)(spark, dir)
        frame.write.format("noop").mode(SaveMode.Overwrite).save()
        frame
      }
      (df.count(), t)
    }

    // triangles: the ×M clique corpus maximizes closed wedges per
    // component — the stress the degree-ordered orientation must absorb
    val (nTri, tTri) = run("q_graph_triangles")
    println(f"GRAPH-SMOKE q_graph_triangles: ${tTri}%.1fs ($nTri vertices scored)")

    // incremental maintenance: first call pays the one-time LSH index
    // build for this corpus; the second measures the steady-state
    // O(delta) probe + graph-scale re-iteration alone
    val (nGi1, tGi1) = run("q_graph_incremental")
    val (nGi, tGi) = run("q_graph_incremental")
    require(nGi1 == nGi, "incremental PR must be deterministic")
    println(f"GRAPH-SMOKE q_graph_incremental: build+maintain=${tGi1}%.1fs " +
      f"warm maintain=${tGi}%.1fs ($nGi ranked vertices)")
    val (nTd, tTd) = run("q_graph_tri_incremental")
    println(f"GRAPH-SMOKE q_graph_tri_incremental: ${tTd}%.1fs ($nTd delta vertices)")

    // semantic dedup at the catalog's own knob setting (4 bits), ×M
    // near-duplicate vectors — within-cell prune fan-out is the measure
    val (nSem, tSem) = run("q_dedup_semantic")
    println(f"GRAPH-SMOKE q_dedup_semantic: ${tSem}%.1fs ($nSem survivors of $nVecs)")

    // LPA communities: ×M cliques are LPA's easy case (interior majority
    // locks instantly) — the measure is the per-round edge-shuffle cost
    // on the M-clique-dense pair graph, same regime as triangles
    val (nLpa, tLpa) = run("q_graph_lpa")
    println(f"GRAPH-SMOKE q_graph_lpa: ${tLpa}%.1fs ($nLpa labeled vertices)")

    // NN-descent: the sampled base graph grows with the corpus (vec_id
    // % 10 = 0 of ×M jittered vectors) — all-pairs on the sample is the
    // documented bound, quadratic in sample size by design
    val (nNnd, tNnd) = run("q_ann_nndescent")
    println(f"GRAPH-SMOKE q_ann_nndescent: ${tNnd}%.1fs ($nNnd sampled vertices)")
    spark.stop()
  }
}
