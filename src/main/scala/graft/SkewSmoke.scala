package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Adversarial SKEW smoke (round-11 verdict item #5): where [[Smoke]]'s
  * clone cliques scale the whole corpus uniformly, this builds the
  * nastier shape a real crawl produces — ONE mega-source of boilerplate
  * variants that all land in the same LSH band buckets / posting lists
  * at 100×+ the caps — mixed into the ordinary sf0.1 corpus plus
  * planted ordinary near-dup pairs, and asserts the two properties the
  * caps must deliver at 100 TB:
  *
  *  1. BOUNDED WORK, LOUD DROPS: the mega-bucket expands O(cap²) pairs,
  *     not O(clones²) (uncapped, 6,400 clones × 16 bands ≈ 327M
  *     candidate pairs from single aggregation rows), and the
  *     BoundedMinSet / df-cap observe() counters report every drop.
  *  2. RECALL OUTSIDE THE SKEW: every planted ordinary pair — whose
  *     buckets are nowhere near any cap — is still found. Capping is
  *     local to the oversized keys; it cannot silently cost recall
  *     elsewhere.
  *
  * Usage: SkewSmoke <sfDir> [cloneMult]   (clones = cloneMult × LshBucketCap)
  * Prints one summary line per generator for BASELINE.md.
  */
object SkewSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cloneMult = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(master = s"local[$cpus]", appName = "graft-skew-smoke")
    import graft.queries.PipelineQueries.{LshBucketCap, NgramDfCap}

    val clones = cloneMult * LshBucketCap
    val nPairs = 500
    val dir = s"/tmp/graft_smoke/skew_${new java.io.File(sfDir).getName}_c$clones"
    // the synthetic ids live at 2M/3M offsets; the id-range-keyed
    // accounting below is only sound if the base corpus sits below them
    val baseMax = Tables.df(spark, sfDir, "documents")
      .agg(max("doc_id")).head().getLong(0)
    require(baseMax < 2000000L,
      s"base corpus doc_ids reach $baseMax >= 2000000 - raise the synthetic offsets")
    if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists()) {
      val base = Tables.df(spark, sfDir, "documents").select("doc_id", "text")
      // mega-source: 60-token boilerplate + a unique tail token, so the
      // clones survive exact dedup but share ~93% of shingles — every
      // band bucket and every boilerplate gram's posting list holds all
      // of them
      val boiler = (1 to 60).map(i => s"megatok$i").mkString(" ")
      val mega = spark.range(clones).selectExpr(
        s"2000000 + id AS doc_id",
        s"concat('$boiler', ' uniq', CAST(id AS STRING)) AS text")
      // planted ordinary pairs on per-pair vocabularies (jac 10/11)
      val normal = spark.range(nPairs).selectExpr("id AS k")
        .selectExpr("3000000 + k * 2 AS a_id", "3000001 + k * 2 AS b_id",
          "concat_ws(' ', transform(sequence(1, 12), i -> concat('pl', k, '_', i))) AS a_text")
        .selectExpr("a_id", "b_id", "a_text", "concat(a_text, ' plextra') AS b_text")
      base
        .unionByName(mega)
        .unionByName(normal.selectExpr("a_id AS doc_id", "a_text AS text"))
        .unionByName(normal.selectExpr("b_id AS doc_id", "b_text AS text"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    }
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    println(s"SKEW corpus: $nDocs docs ($clones mega-source clones = " +
      s"$cloneMult x the $LshBucketCap bucket cap, $nPairs planted pairs) at $dir")

    def run(name: String, frame: org.apache.spark.sql.DataFrame, metricKey: String): Unit = {
      val t0 = System.nanoTime()
      // collect the observed frame ITSELF (a select() would wrap it in a
      // fresh QueryExecution and the observe metrics would never fire)
      val rows = frame.collect()
        .map(r => (r.getLong(r.fieldIndex("i")), r.getLong(r.fieldIndex("j"))))
      val wall = (System.nanoTime() - t0) / 1e9
      val m = frame.queryExecution.observedMetrics(metricKey)
      val planted = rows.count { case (i, j) =>
        i >= 3000000L && j == i + 1 && i % 2 == 0
      }
      val megaPairs = rows.count(_._1 >= 2000000L) - planted -
        rows.count(p => p._1 >= 2000000L && p._1 < 3000000L && p._2 >= 3000000L)
      assert(m.getLong(0) > 0 && m.getLong(1) > 0, s"$name: drop counters silent: $m")
      assert(planted == nPairs, s"$name: recall loss outside the skew: $planted/$nPairs")
      println(f"SKEW $name: $wall%.1fs, ${rows.length} pairs " +
        f"(mega $megaPairs, planted $planted/$nPairs recall=1.0), " +
        s"capped=${m.getLong(0)} dropped_ids=${m.getLong(1)}")
    }

    run(s"minhash(cap=$LshBucketCap)",
      graft.queries.PipelineQueries.minhashPairs(spark, dir, LshBucketCap),
      "graft_lsh_bucket_cap")
    run(s"ngram(df_cap=$NgramDfCap)",
      graft.queries.PipelineQueries.ngramJaccardPairs(spark, dir, NgramDfCap),
      "graft_ngram_df_cap")
    spark.stop()
  }
}
