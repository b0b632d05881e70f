package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Gap-fill scalar functions: the reference's `ScalarFunction` surface
  * (reference datafusion.proto:448-522) that Spark lacks a 1:1 built-in
  * for (SURVEY.md §2.8 gap list). All are compositions of codegen'd
  * Catalyst built-ins — no UDFs, so they stay inside WholeStageCodegen
  * and keep predicate pushdown intact. Scale note: every helper is a pure
  * per-row expression → embarrassingly parallel, no shuffle introduced.
  */
object GraftFunctions {

  /** `date_bin(stride, ts, origin)` (reference datafusion.proto:516
    * DateBin): floor (ts - origin) to a multiple of `stride` seconds from
    * `origin`. Pure micros arithmetic → codegen'd. */
  def date_bin(strideSeconds: Long, ts: Column, origin: Column): Column = {
    val strideUs = lit(strideSeconds * 1000000L)
    val o = unix_micros(origin)
    timestamp_micros(
      o + floor((unix_micros(ts) - o).cast("double") / strideUs).cast("long") * strideUs)
  }

  /** Numeric `trunc(x, scale)` — truncate toward zero (reference
    * datafusion.proto:467 Trunc is numeric; Spark's 2-arg `trunc` is
    * date-oriented). Matches DuckDB/PostgreSQL trunc semantics. */
  def trunc_num(x: Column, scale: Int): Column = {
    val p = lit(math.pow(10.0, scale.toDouble))
    val scaled = x * p
    (when(x >= 0, floor(scaled)).otherwise(ceil(scaled)) / p).cast("double")
  }

  /** `digest(x, algo)` dispatch (reference datafusion.proto:455 Digest):
    * md5 / sha224 / sha256 / sha384 / sha512 by name. Algo is almost
    * always a literal, so the `when` chain constant-folds. An unknown
    * algorithm raises (like DataFusion's digest) instead of silently
    * yielding NULL for every row. */
  def digest(x: Column, algo: Column): Column =
    when(algo.isNull, lit(null).cast("string")) // NULL algo propagates NULL like the other scalars
      .when(lower(algo) === "md5", md5(x))
      .when(lower(algo) === "sha224", sha2(x, 224))
      .when(lower(algo) === "sha256", sha2(x, 256))
      .when(lower(algo) === "sha384", sha2(x, 384))
      .when(lower(algo) === "sha512", sha2(x, 512))
      .otherwise(raise_error(concat(lit("unsupported digest algorithm: "), algo)))

  /** `strpos(s, sub)` (reference datafusion.proto:500): 1-based position
    * of first occurrence, 0 if absent — Spark's `instr` builtin, resolved
    * by name so both operands can be Columns. */
  def strpos(s: Column, sub: Column): Column = call_function("instr", s, sub)

  /** `current_time` (reference datafusion.proto:519): Spark has no TIME
    * type; render HH:mm:ss like the reference's Arrow Time64 text form. */
  def current_time(): Column = date_format(now(), "HH:mm:ss")

  /** `regexp_match` array-of-match semantics (reference
    * datafusion.proto:469): whole-match as a 1-element array, null when no
    * match — the common boolean/scalar uses of DataFusion's regexp_match. */
  def regexp_match(s: Column, pattern: String): Column =
    when(s.rlike(pattern), array(regexp_extract(s, pattern, 0)))

  /** `to_timestamp_seconds/_millis/_micros` numeric forms (reference
    * datafusion.proto:503-506) — direct aliases of Spark builtins, named
    * here so the parity inventory has an addressable symbol. */
  def to_timestamp_seconds(c: Column): Column = timestamp_seconds(c)
  def to_timestamp_millis(c: Column): Column = timestamp_millis(c)
  def to_timestamp_micros(c: Column): Column = timestamp_micros(c)

  /** SQL-text access to these helpers is provided by
    * [[graft.GraftExtensions]] (SparkSessionExtensions.injectFunction →
    * `graft_rolling_hash`, `graft_date_bin`, `graft_trunc_num`,
    * `graft_digest`, `graft_strpos`), all as codegen'd Catalyst
    * expression compositions — never Scala UDFs, which would block
    * codegen and pushdown. Kept for API compatibility; a no-op because
    * registration happens at session build. */
  def register(spark: SparkSession): Unit = ()
}
