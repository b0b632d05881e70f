package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an N× corpus from a driver-provided scale factor — the 10×
  * scale-up smoke the per-round bench can't give (round-12 verdict item
  * #3): run the full catalog against the derived dir and check every
  * family grows ~linearly; anything super-linear is a plan that won't
  * survive 100 TB.
  *
  * Derivation, not synthesis: every row is a key-shifted copy of a
  * driver row (replica r gets key + r·10⁷ on every PK/FK consistently,
  * so join selectivities and per-key densities are preserved and the
  * replicas are disjoint). Two semantic adjustments keep the WORKLOAD
  * shape linear rather than degenerate:
  *
  *  - `documents.text`: every token gets a per-replica suffix, so
  *    shingle/minhash/ngram spaces are disjoint across replicas —
  *    near-dup clusters stay within a replica and the pair set scales
  *    ×N. Verbatim copies would instead make every dup cluster ×N wide
  *    and the pair set ×N², a data artifact, not a plan property
  *    (n_chars is recomputed to stay consistent). doc_id shifts by
  *    10⁷ per replica, far above the +10⁶ delta-batch convention, and
  *    10⁷ % 10 = 0 keeps the `doc_id % 10` delta fraction at 1/10.
  *  - `embeddings.embedding`: replica r CYCLICALLY ROTATES coordinates
  *    by r positions. A coordinate rotation is orthogonal, so every
  *    within-replica dot product, norm, L2 distance, AND cosine is
  *    preserved exactly — the honest scale-up is 10× density in the
  *    SAME space, not 10 far-apart copies. Two rejected alternatives
  *    (round-13 review): a tiny jitter leaves each vector's neighbors
  *    = its own near-coincident copies (degenerate L2 top-k), and a
  *    large axis shift preserves L2 but drives within-replica COSINES
  *    toward 1 and freezes hyperplane sign bits (degenerate
  *    cosine/LSH workload). Rotation has neither failure: a vector and
  *    its rotated twin correlate only at the embedding's lag-r
  *    autocorrelation (small for real embeddings). Rotation by dim
  *    would be the identity (an exact duplicate replica), so beyond
  *    dim replicas the transform COMPOSES rotation with global
  *    negation: replica r uses rotate(r % dim) then negates every
  *    coordinate when (r / dim) is odd. Negation is orthogonal (−I),
  *    so within-replica dots/norms/L2/cosines are still preserved
  *    exactly, and (rotation, sign) pairs are distinct for
  *    reps ≤ 2·dim — enough for the 100× decade derivation at
  *    dim = 64. Cross-replica, a vector and its negated twin meet at
  *    cosine −autocorr(r): no near-coincidence, no frozen sign bits
  *    (the negated replica's hyperplane bits are complements — the
  *    cells stay spread).
  *
  * Usage: `sbt "runMain graft.ScaleUp [srcDir dstDir reps]"`, defaults
  * `/root/testdata/sf0.1 /tmp/graft_sf1 10`; then
  * `SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 ... runMain graft.Bench`.
  */
object ScaleUp {
  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String)(build: Int => DataFrame): Unit = {
      val out = (0 until reps).map(build).reduce(_ unionAll _)
      out.write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name x$reps -> $dst")
    }
    def t(name: String): DataFrame = Tables.df(spark, src, name)
    def shifted(df: DataFrame, r: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * Off)))

    // dimensions stay unscaled (TPC-H keeps region/nation fixed too)
    Seq("region", "nation").foreach { n =>
      t(n).write.mode(SaveMode.Overwrite).parquet(s"$dst/$n.parquet")
      println(s"[scaleup] $n copied")
    }
    write("customer")(r => shifted(t("customer"), r, "c_custkey"))
    write("supplier")(r => shifted(t("supplier"), r, "s_suppkey"))
    write("part")(r => shifted(t("part"), r, "p_partkey"))
    write("orders")(r => shifted(t("orders"), r, "o_orderkey", "o_custkey"))
    write("lineitem")(r =>
      shifted(t("lineitem"), r, "l_orderkey", "l_partkey", "l_suppkey"))
    write("events")(r => shifted(t("events"), r, "event_id", "user_id"))
    write("documents") { r =>
      val base = shifted(t("documents"), r, "doc_id")
      if (r == 0) base
      else base
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1z$r"))
        .withColumn("n_chars", length(col("text")))
    }
    val dim = t("embeddings").selectExpr("size(embedding)").head().getInt(0)
    require(reps <= 2 * dim,
      s"reps=$reps > 2*dim=${2 * dim}: the (rotation, sign) transform family is exhausted")
    write("embeddings") { r =>
      val base = shifted(t("embeddings"), r, "vec_id")
      val rot = r % dim
      val sign = if ((r / dim) % 2 == 1) "-" else ""
      if (rot == 0 && sign.isEmpty) base
      else base.withColumn("embedding",
        expr(s"transform(embedding, (x, i) -> ${sign}element_at(embedding, ((i + $rot) % $dim) + 1))"))
    }
    spark.stop()
  }
}
