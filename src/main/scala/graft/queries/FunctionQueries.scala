package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function parity sweep (SURVEY.md §2.8): one query per function
  * family, each exercising several functions of the reference's closed
  * 73-function enumeration (reference datafusion.proto:448-522) against a
  * DuckDB oracle computing the same expressions.
  *
  * All are pure row-local projections — codegen'd, no shuffle, trivially
  * parallel at any scale. Transcendentals are rounded to 9 decimals on
  * BOTH sides: libm implementations (JVM vs C) are only 1-ulp-accurate,
  * so bit-exact comparison of e.g. ln() across engines is not defined;
  * 9 decimals is far above 1-ulp noise and far below anything a user
  * observes.
  */
object FunctionQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)
  private def r9(c: Column): Column = round(c, 9)

  val all: Seq[Q] = Seq(

    // --- math: Abs/Ceil/Floor/Round/Sqrt/Power/Ln/Log10/Log2/Exp/Signum/
    // Trunc/mod (reference datafusion.proto:449-467, 512) -----------------
    Q("q_fn_math",
      """SELECT p_partkey,
        |  abs(p_size - 25) AS abs_v,
        |  CAST(ceil(p_retailprice) AS DOUBLE) AS ceil_v,
        |  CAST(floor(p_retailprice) AS DOUBLE) AS floor_v,
        |  ROUND(sqrt(p_retailprice), 9) AS sqrt_v,
        |  ROUND(ln(p_retailprice), 9) AS ln_v,
        |  ROUND(log10(p_retailprice), 9) AS log10_v,
        |  ROUND(log2(p_retailprice), 9) AS log2_v,
        |  ROUND(exp(p_size / 10.0), 9) AS exp_v,
        |  ROUND(power(p_size, 2), 9) AS pow_v,
        |  ROUND(atan2(p_size, 10.0), 9) AS atan2_v,
        |  ROUND(sin(p_size), 9) AS sin_v,
        |  ROUND(cos(p_size), 9) AS cos_v,
        |  ROUND(tan(p_size / 100.0), 9) AS tan_v,
        |  ROUND(acos(p_size / 100.0), 9) AS acos_v,
        |  ROUND(asin(p_size / 100.0), 9) AS asin_v,
        |  ROUND(atan(p_size / 10.0), 9) AS atan_v,
        |  ROUND(log(3, p_retailprice), 9) AS logb_v,
        |  CAST(sign(p_size - 25) AS INT) AS sign_v,
        |  CAST(trunc(p_retailprice) AS DOUBLE) AS trunc0_v,
        |  CAST(trunc(p_retailprice * 10) / 10 AS DOUBLE) AS trunc1_v,
        |  p_size % 7 AS mod_v
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        abs(col("p_size") - 25).as("abs_v"),
        ceil(col("p_retailprice")).cast("double").as("ceil_v"),
        floor(col("p_retailprice")).cast("double").as("floor_v"),
        r9(sqrt(col("p_retailprice"))).as("sqrt_v"),
        r9(log(col("p_retailprice"))).as("ln_v"),
        r9(log10(col("p_retailprice"))).as("log10_v"),
        r9(log2(col("p_retailprice"))).as("log2_v"),
        r9(exp(col("p_size") / 10.0)).as("exp_v"),
        r9(pow(col("p_size"), 2)).as("pow_v"),
        r9(atan2(col("p_size").cast("double"), lit(10.0))).as("atan2_v"),
        r9(sin(col("p_size"))).as("sin_v"),
        r9(cos(col("p_size"))).as("cos_v"),
        r9(tan(col("p_size") / 100.0)).as("tan_v"),
        r9(acos(col("p_size") / 100.0)).as("acos_v"),
        r9(asin(col("p_size") / 100.0)).as("asin_v"),
        r9(atan(col("p_size") / 10.0)).as("atan_v"),
        r9(log(3.0, col("p_retailprice"))).as("logb_v"),
        signum(col("p_size") - 25).cast("int").as("sign_v"),
        GraftFunctions.trunc_num(col("p_retailprice"), 0).as("trunc0_v"),
        GraftFunctions.trunc_num(col("p_retailprice"), 1).as("trunc1_v"),
        (col("p_size") % 7).as("mod_v"))
        .orderBy("p_partkey")
    },

    // --- string: Ascii…Upper (reference datafusion.proto:452-522) --------
    Q("q_fn_string",
      """SELECT p_partkey,
        |  upper(p_name) AS up_v, lower(p_brand) AS low_v,
        |  ascii(p_name) AS ascii_v,
        |  chr(p_size % 26 + 65) AS chr_v,
        |  CAST(length(p_name) AS INT) AS len_v,
        |  CAST(bit_length(p_brand) AS INT) AS bitlen_v,
        |  CAST(octet_length(CAST(p_brand AS BLOB)) AS INT) AS octlen_v,
        |  lpad(p_brand, 12, '*') AS lpad_v,
        |  rpad(p_brand, 12, '#') AS rpad_v,
        |  left(p_name, 4) AS left_v,
        |  right(p_name, 4) AS right_v,
        |  repeat(p_brand, 2) AS repeat_v,
        |  reverse(p_brand) AS rev_v,
        |  replace(p_name, ' ', '_') AS repl_v,
        |  substring(p_name, 3, 8) AS substr_v,
        |  split_part(p_name, ' ', 2) AS split_v,
        |  starts_with(p_name, 't') AS starts_v,
        |  CAST(instr(p_name, 'an') AS INT) AS strpos_v,
        |  translate(p_name, 'aeiou', 'AEIOU') AS transl_v,
        |  trim(lpad(p_brand, 12, ' ')) AS trim_v,
        |  ltrim(lpad(p_brand, 12, ' ')) AS ltrim_v,
        |  rtrim(rpad(p_brand, 12, ' ')) AS rtrim_v,
        |  concat(p_brand, '/', p_type) AS concat_v,
        |  concat_ws('-', p_brand, p_type) AS cws_v
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up_v"), lower(col("p_brand")).as("low_v"),
        ascii(col("p_name")).as("ascii_v"),
        chr(col("p_size") % 26 + 65).as("chr_v"),
        length(col("p_name")).as("len_v"),
        bit_length(col("p_brand")).as("bitlen_v"),
        octet_length(col("p_brand")).as("octlen_v"),
        lpad(col("p_brand"), 12, "*").as("lpad_v"),
        rpad(col("p_brand"), 12, "#").as("rpad_v"),
        substring(col("p_name"), 1, 4).as("left_v"),
        expr("right(p_name, 4)").as("right_v"),
        repeat(col("p_brand"), 2).as("repeat_v"),
        reverse(col("p_brand")).as("rev_v"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("repl_v"),
        substring(col("p_name"), 3, 8).as("substr_v"),
        split_part(col("p_name"), lit(" "), lit(2)).as("split_v"),
        col("p_name").startsWith("t").as("starts_v"),
        instr(col("p_name"), "an").as("strpos_v"),
        translate(col("p_name"), "aeiou", "AEIOU").as("transl_v"),
        trim(lpad(col("p_brand"), 12, " ")).as("trim_v"),
        ltrim(lpad(col("p_brand"), 12, " ")).as("ltrim_v"),
        rtrim(rpad(col("p_brand"), 12, " ")).as("rtrim_v"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("concat_v"),
        concat_ws("-", col("p_brand"), col("p_type")).as("cws_v"))
        .orderBy("p_partkey")
    },

    // --- regex: RegexpMatch/RegexpReplace + LIKE/ILIKE (reference
    // datafusion.proto:469, 490, 603-622) ---------------------------------
    Q("q_fn_regex",
      """SELECT p_partkey,
        |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS vowels_masked,
        |  regexp_matches(p_name, 'g.*e') AS has_ge,
        |  regexp_extract(p_name, '[a-z]{5,}') AS long_word,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INT) AS n_vowel_runs,
        |  (p_name LIKE '%old%') AS like_v,
        |  (p_name ILIKE '%OLD%') AS ilike_v,
        |  (p_name LIKE '%X_%' ESCAPE 'X') AS like_esc_v,
        |  (p_name SIMILAR TO '[a-z ]*gre[a-z ]*') AS similar_v
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        regexp_replace(col("p_name"), lit("[aeiou]"), lit("*")).as("vowels_masked"),
        col("p_name").rlike("g.*e").as("has_ge"),
        regexp_extract(col("p_name"), "([a-z]{5,})", 0).as("long_word"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0))).as("n_vowel_runs"),
        col("p_name").like("%old%").as("like_v"),
        col("p_name").ilike("%OLD%").as("ilike_v"),
        // LIKE with explicit escape char (reference LikeNode escape_char,
        // datafusion.proto:603-622): literal '_' via escape
        expr("p_name LIKE '%X_%' ESCAPE 'X'").as("like_esc_v"),
        // SIMILAR TO has no Spark form → anchored-rlike rewrite
        // (SURVEY §7.3 dialect note); semantics = full-string match
        col("p_name").rlike("^(?:[a-z ]*gre[a-z ]*)$").as("similar_v"))
        .orderBy("p_partkey")
    },

    // --- hash/encode: MD5/SHA256/ToHex/Digest dispatch (reference
    // datafusion.proto:455, 479-483, 487) ---------------------------------
    Q("q_fn_hash",
      """SELECT n_nationkey,
        |  md5(n_name) AS md5_v,
        |  sha256(n_name) AS sha256_v,
        |  md5(n_name) AS digest_md5_v,
        |  sha256(n_name) AS digest_sha256_v,
        |  lower(hex(n_name)) AS hex_v
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      t(s, d, "nation").select(
        col("n_nationkey"),
        md5(col("n_name")).as("md5_v"),
        sha2(col("n_name"), 256).as("sha256_v"),
        GraftFunctions.digest(col("n_name"), lit("md5")).as("digest_md5_v"),
        GraftFunctions.digest(col("n_name"), lit("sha256")).as("digest_sha256_v"),
        lower(hex(col("n_name"))).as("hex_v"))
        .orderBy("n_nationkey")
    },

    // --- date/time: DateTrunc/DatePart/DateBin/to_timestamp_* (reference
    // datafusion.proto:456-457, 503-506, 516) -----------------------------
    Q("q_fn_datetime",
      """SELECT l_orderkey, l_linenumber,
        |  strftime(date_trunc('month', l_shipdate), '%Y-%m-%d %H:%M:%S') AS month_v,
        |  strftime(date_trunc('day', l_shipdate), '%Y-%m-%d %H:%M:%S') AS day_v,
        |  CAST(date_part('year', l_shipdate) AS BIGINT) AS year_v,
        |  CAST(date_part('month', l_shipdate) AS BIGINT) AS month_n,
        |  CAST(date_part('dow', l_shipdate) AS BIGINT) AS dow_v,
        |  strftime(time_bucket(INTERVAL 7 DAY, l_shipdate, TIMESTAMP '2000-01-03'), '%Y-%m-%d %H:%M:%S') AS bin7d_v,
        |  CAST(epoch(l_shipdate) AS BIGINT) AS unix_s,
        |  strftime(CAST(to_timestamp(CAST(epoch(l_shipdate) AS BIGINT)) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_rt,
        |  epoch_ms(l_shipdate) AS unix_ms,
        |  strftime(make_timestamp(epoch_ms(l_shipdate) * 1000), '%Y-%m-%d %H:%M:%S') AS ts_ms_rt,
        |  strftime(l_shipdate + INTERVAL 3 DAY, '%Y-%m-%d %H:%M:%S') AS plus3d,
        |  strftime(l_shipdate - INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS minus2h
        |FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      // The parquet column is TIMESTAMP_NTZ; unix_* need TIMESTAMP. In a
      // UTC session the casts are value-preserving; results are cast back
      // to NTZ so the output schema matches the oracle's naive timestamps.
      val ship = col("l_shipdate").cast("timestamp")
      t(s, d, "lineitem").filter(col("l_orderkey") < 100).select(
        col("l_orderkey"), col("l_linenumber"),
        date_format(date_trunc("month", ship), "yyyy-MM-dd HH:mm:ss").as("month_v"),
        date_format(date_trunc("day", ship), "yyyy-MM-dd HH:mm:ss").as("day_v"),
        date_part(lit("year"), col("l_shipdate")).cast("bigint").as("year_v"),
        date_part(lit("month"), col("l_shipdate")).cast("bigint").as("month_n"),
        (dayofweek(col("l_shipdate")) - 1).cast("bigint").as("dow_v"),
        date_format(GraftFunctions.date_bin(7L * 24 * 3600, ship,
          lit("2000-01-03").cast("timestamp")), "yyyy-MM-dd HH:mm:ss").as("bin7d_v"),
        unix_seconds(ship).as("unix_s"),
        date_format(GraftFunctions.to_timestamp_seconds(unix_seconds(ship)), "yyyy-MM-dd HH:mm:ss")
          .as("ts_rt"),
        unix_millis(ship).as("unix_ms"),
        date_format(GraftFunctions.to_timestamp_millis(unix_millis(ship)), "yyyy-MM-dd HH:mm:ss")
          .as("ts_ms_rt"),
        // date ± interval arithmetic (reference
        // PhysicalDateTimeIntervalExprNode, datafusion.proto:1073-1077)
        date_format(col("l_shipdate") + expr("INTERVAL 3 DAY"), "yyyy-MM-dd HH:mm:ss").as("plus3d"),
        date_format(col("l_shipdate") - expr("INTERVAL 2 HOUR"), "yyyy-MM-dd HH:mm:ss").as("minus2h"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // --- misc: Coalesce/NullIf/Array/Struct/GetIndexedField (reference
    // datafusion.proto:451, 484, 497, 509; GetIndexedField 384-387) -------
    Q("q_fn_misc",
      """SELECT p_partkey,
        |  coalesce(NULLIF(p_brand, 'brand0'), 'fallback') AS coal_v,
        |  to_json([CAST(p_size AS BIGINT), CAST(p_size AS BIGINT) * 2])::VARCHAR AS arr_v,
        |  [CAST(p_size AS BIGINT), CAST(p_size AS BIGINT) * 2][1] AS arr_el,
        |  to_json({'sz': CAST(p_size AS BIGINT), 'brand': p_brand})::VARCHAR AS struct_v,
        |  CAST(p_size AS BIGINT) AS struct_field,
        |  CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS case_v,
        |  TRY_CAST(p_brand AS INT) AS try_cast_v,
        |  TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS try_cast_ok,
        |  ((p_size > 25) IS TRUE) AS is_true_v,
        |  ((NULLIF(p_size, p_size) > 0) IS NULL) AS is_unknown_v
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      // Nested values are computed natively (array/struct expressions,
      // GetIndexedField) but OUTPUT as canonical JSON strings: the gate
      // hashes column values, and list/struct in-memory representations
      // differ across engines/readers while the JSON text is identical.
      val arr = array(col("p_size").cast("bigint"), col("p_size").cast("bigint") * 2)
      t(s, d, "part").select(
        col("p_partkey"),
        coalesce(nullif(col("p_brand"), lit("brand0")), lit("fallback")).as("coal_v"),
        to_json(arr).as("arr_v"),
        arr.getItem(0).as("arr_el"),
        to_json(struct(col("p_size").cast("bigint").as("sz"), col("p_brand").as("brand")))
          .as("struct_v"),
        struct(col("p_size").cast("bigint").as("sz"), col("p_brand").as("brand"))
          .getField("sz").as("struct_field"),
        when(col("p_size") > 25, "big").otherwise("small").as("case_v"),
        // TRY_CAST (reference datafusion.proto:635-643): null, not error
        col("p_brand").try_cast("int").as("try_cast_v"),
        col("p_size").cast("string").try_cast("int").as("try_cast_ok"),
        // IS TRUE / IS NULL-as-UNKNOWN (reference datafusion.proto:389-419)
        expr("(p_size > 25) IS TRUE").as("is_true_v"),
        (nullif(col("p_size"), col("p_size")) > 0).isNull.as("is_unknown_v"))
        .orderBy("p_partkey")
    },

    // --- remaining reference scalars: Btrim w/ char set, ToTimestamp
    // (string parse), FromUnixtime (reference datafusion.proto:452, 503,
    // 511) ---------------------------------------------------------------
    Q("q_fn_extra",
      """SELECT p_partkey,
        |  trim(lpad(p_brand, 12, '#'), '#') AS btrim_v,
        |  strftime(CAST('1994-05-15 12:30:00' AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_parse,
        |  strftime(to_timestamp(p_size * 86400), '%Y-%m-%d %H:%M:%S') AS from_unix_v
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        expr("trim(BOTH '#' FROM lpad(p_brand, 12, '#'))").as("btrim_v"),
        date_format(to_timestamp(lit("1994-05-15 12:30:00")), "yyyy-MM-dd HH:mm:ss").as("ts_parse"),
        from_unixtime(col("p_size").cast("bigint") * 86400).as("from_unix_v"))
        .orderBy("p_partkey")
    },

    // --- bitwise ops + string concat operator + IS DISTINCT FROM
    // (reference binary-expr op strings, datafusion.proto:430-436) -------
    Q("q_fn_bitwise",
      """SELECT p_partkey,
        |  p_size & 12 AS and_v,
        |  p_size | 5 AS or_v,
        |  xor(p_size, 9) AS xor_v,
        |  p_size << 1 AS shl_v,
        |  p_size >> 1 AS shr_v,
        |  p_brand || '/' || p_type AS concat_op,
        |  (p_size IS DISTINCT FROM 7) AS isdf_v
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        col("p_size").bitwiseAND(12).as("and_v"),
        col("p_size").bitwiseOR(5).as("or_v"),
        col("p_size").bitwiseXOR(9).as("xor_v"),
        shiftleft(col("p_size"), 1).as("shl_v"),
        shiftright(col("p_size"), 1).as("shr_v"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("concat_op"),
        (!(col("p_size") <=> 7)).as("isdf_v"))
        .orderBy("p_partkey")
    },

    // --- JSON field extraction over the events table (props is a JSON
    // string) — get_json_object ≈ DuckDB json_extract_string -------------
    Q("q_fn_json",
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_v
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events").filter(col("event_id") < 200).select(
        col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k_v"))
        .orderBy("event_id")
    },
  )
}
