package graft

import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Function-parity table tests for every GraftFunctions gap-fill against
  * literal expected values (reference scalar enumeration,
  * datafusion.proto:448-522). */
class FunctionsSpec extends GraftSuite {
  import org.apache.spark.sql.Column

  private def eval1(c: Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("trunc_num truncates toward zero at any scale") {
    assert(eval1(trunc_num(lit(3.567), 0)) == 3.0)
    assert(eval1(trunc_num(lit(3.567), 1)) == 3.5)
    assert(eval1(trunc_num(lit(3.567), 2)) == 3.56)
    assert(eval1(trunc_num(lit(-3.567), 1)) == -3.5) // toward zero, not floor
    assert(eval1(trunc_num(lit(-3.567), 0)) == -3.0)
  }

  test("date_bin floors to stride multiples from the origin") {
    val origin = lit("2000-01-03 00:00:00").cast("timestamp")
    val ts = lit("2024-01-01 00:20:00").cast("timestamp")
    // 15-minute stride: 00:20 floors to 00:15
    assert(eval1(date_bin(900, ts, origin)).toString == "2024-01-01 00:15:00.0")
    // before-origin timestamps floor downward (negative bins)
    val before = lit("1999-12-31 23:50:00").cast("timestamp")
    assert(eval1(date_bin(3600, before, origin)).toString == "1999-12-31 23:00:00.0")
  }

  test("digest dispatches by algorithm name") {
    assert(eval1(digest(lit("abc"), lit("md5"))) ==
      "900150983cd24fb0d6963f7d28e17f72")
    assert(eval1(digest(lit("abc"), lit("sha256"))) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(eval1(digest(lit("abc"), lit("SHA256"))) == // case-insensitive
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    // the remaining SHA-2 widths (reference ids 46, 48, 49) — known vectors
    assert(eval1(digest(lit("abc"), lit("sha224"))) ==
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(eval1(digest(lit("abc"), lit("sha384"))) ==
      "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed8086072ba1e7cc2358baeca134c825a7")
    assert(eval1(digest(lit("abc"), lit("sha512"))) ==
      "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f")
  }

  test("initcap capitalizes each word (reference InitCap id 30)") {
    assert(eval1(initcap(lit("hello world"))) == "Hello World")
  }

  test("digest raises on unknown algorithm instead of silent NULL") {
    val e = intercept[Exception](eval1(digest(lit("abc"), lit("crc99"))))
    assert(e.getMessage.contains("unsupported digest algorithm"))
  }

  test("strpos is 1-based, 0 when absent") {
    assert(eval1(strpos(lit("hello"), lit("ll"))) == 3)
    assert(eval1(strpos(lit("hello"), lit("xyz"))) == 0)
  }

  test("regexp_match returns whole match as 1-element array, null when none") {
    assert(eval1(regexp_match(lit("foo123"), "[0-9]+")) ==
      scala.collection.mutable.ArraySeq.make(Array("123")))
    assert(eval1(regexp_match(lit("foo"), "[0-9]+")) == null)
  }

  test("to_timestamp_* alias the numeric epoch builders") {
    assert(eval1(to_timestamp_seconds(lit(1700000000L))).toString ==
      "2023-11-14 22:13:20.0")
    assert(eval1(to_timestamp_millis(lit(1700000000123L))).toString ==
      "2023-11-14 22:13:20.123")
    assert(eval1(to_timestamp_micros(lit(1700000000123456L))).toString ==
      "2023-11-14 22:13:20.123456")
  }

  test("gap-fill functions are SQL-callable via GraftExtensions") {
    assert(spark.sql("SELECT graft_rolling_hash('abc') AS h").head().getLong(0) ==
      ((('a' * 31L + 'b') % 1000000007L) * 31 + 'c') % 1000000007L)
    assert(spark.sql(
      "SELECT graft_date_bin(900, TIMESTAMP '2024-01-01 00:20:00', TIMESTAMP '2000-01-03') AS b")
      .head().getTimestamp(0).toString == "2024-01-01 00:15:00.0")
    assert(spark.sql("SELECT graft_trunc_num(3.567, 1) AS t").head().getDouble(0) == 3.5)
    assert(spark.sql("SELECT graft_digest('abc', 'md5') AS d").head().getString(0) ==
      "900150983cd24fb0d6963f7d28e17f72")
    assert(spark.sql("SELECT graft_strpos('hello', 'll') AS p").head().getInt(0) == 3)
    assert(spark.sql("SELECT graft_nfc_normalize('Cafe\u0301') AS n")
      .head().getString(0) == "Caf\u00e9") // decomposed in, composed out
  }

  test("nondeterministic scalars: rand/uuid/now/current_date/typeof are sane") {
    val r = spark.sql(
      "SELECT rand() AS r, uuid() AS u, now() AS n, current_date() AS d, typeof(1) AS t")
      .head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(0) < 1.0)
    assert(r.getString(1).matches("[0-9a-f-]{36}"))
    assert(r.getTimestamp(2).getTime > 0)
    assert(r.getDate(3).toString.matches("\\d{4}-\\d{2}-\\d{2}"))
    assert(r.getString(4) == "int")
  }

  test("current_time renders HH:mm:ss") {
    assert(eval1(graft.functions.GraftFunctions.current_time())
      .toString.matches("\\d{2}:\\d{2}:\\d{2}"))
  }

  test("intersect_count: overlap, disjoint, identical, empty, null, symmetric") {
    import graft.functions.IntersectCount.intersect_count
    def arr(xs: Long*): Column = typedLit(xs)
    assert(eval1(intersect_count(arr(1L, 2L, 3L), arr(2L, 3L, 4L))) == 2)
    assert(eval1(intersect_count(arr(1L, 2L), arr(3L, 4L))) == 0)
    assert(eval1(intersect_count(arr(5L, 6L, 7L), arr(5L, 6L, 7L))) == 3)
    assert(eval1(intersect_count(arr(), arr(1L))) == 0)
    assert(eval1(intersect_count(lit(null).cast("array<bigint>"), arr(1L))) == null)
    // probes the smaller side's set — result must not depend on order
    assert(eval1(intersect_count(arr(1L, 2L, 3L, 4L, 5L), arr(3L, 5L))) == 2)
    assert(eval1(intersect_count(arr(3L, 5L), arr(1L, 2L, 3L, 4L, 5L))) == 2)
    // equals the built-in spelling on the same inputs
    assert(eval1(size(array_intersect(arr(1L, 2L, 3L), arr(2L, 3L, 4L)))) ==
      eval1(intersect_count(arr(1L, 2L, 3L), arr(2L, 3L, 4L))))
  }

  test("intersect_count rejects non-long-array children at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(graft.functions.IntersectCount.intersect_count(
        typedLit(Seq("a", "b")), typedLit(Seq("b")))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("custom codegen expressions match Scala models on 300 seeded-random rows") {
    // drives RollingHash / IntersectCount / DotProduct through the real
    // whole-stage-codegen path (a DataFrame scan, not interpreted eval)
    // on randomized inputs incl. empty strings/arrays
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      val text = Iterator.fill(rnd.nextInt(40))((rnd.nextInt(95) + 32).toChar).mkString
      val a = Seq.fill(rnd.nextInt(6))(rnd.nextInt(10).toLong).distinct
      val b = Seq.fill(rnd.nextInt(6))(rnd.nextInt(10).toLong).distinct
      val va = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
      val vb = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
      (i.toLong, text, a, b, va, vb)
    }
    val got = rows.toDF("id", "text", "a", "b", "va", "vb")
      .select(col("id"),
        graft.functions.RollingHash.rolling_hash(col("text")).as("rh"),
        graft.functions.IntersectCount.intersect_count(col("a"), col("b")).as("ic"),
        graft.functions.DotProduct.dot_product(col("va"), col("vb")).as("dp"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    rows.foreach { case (id, text, a, b, va, vb) =>
      val rh = text.getBytes("UTF-8").foldLeft(0L)((h, c) => (h * 31 + (c & 0xff)) % 1000000007L)
      val ic = (a.toSet & b.toSet).size
      val dp = va.zip(vb).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      assert(got(id) == ((rh, ic, dp)), s"row $id text='$text' a=$a b=$b")
    }
  }

  test("word_ngrams equals the HOF shingle spelling and a Scala model on random token arrays") {
    // drives WordNgrams through the real codegen path (DataFrame scan)
    // and pins the exact-equality contract with the
    // array_distinct(transform(sequence(...), concat_ws(...))) spelling
    // it replaced — values AND first-occurrence order — on arrays with
    // repeats (clone runs force dedup) at the guarded sizes (>= n)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "cc", "d", "ee")
    val rows = (1 to 200).map { i =>
      val n = 3 + rnd.nextInt(20)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "w")
    val hof = expr(
      "array_distinct(transform(sequence(0, size(w) - 3), i -> " +
        "concat_ws(' ', element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))")
    val got = df.select(col("id"),
        graft.functions.WordNgrams.word_ngrams(col("w"), lit(3)).as("g"),
        hof.as("h"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getSeq[String](2)))).toMap
    rows.foreach { case (id, w) =>
      val model = w.sliding(3).map(_.mkString(" ")).toSeq.distinct
      val (g, h) = got(id)
      assert(g == h && g == model, s"row $id w=$w got=$g hof=$h model=$model")
    }
    // below the guard size: empty array, never null
    val small = Seq((1L, Seq("x", "y"))).toDF("id", "w")
      .select(graft.functions.WordNgrams.word_ngrams(col("w"), lit(3)).as("g"))
      .collect()(0).getSeq[String](0)
    assert(small.isEmpty)
  }

  test("ordered_pairs equals the nested-HOF pair enumeration on random id arrays") {
    // codegen-path equality with the flatten(transform(transform))
    // spelling it replaced — values AND (a, b) lexicographic order —
    // including the degenerate sizes (0, 1, 2)
    // sizes >= 2 only: every call site guards size(ids) > 1, and BELOW
    // that the HOF spelling is undefined-ish (sequence(0, -1) walks
    // backwards and element_at probes out of range) while ordered_pairs
    // returns the empty array — checked against the model at the end
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (1 to 100).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(7))(rnd.nextInt(1000).toLong))
    }
    val hof = expr(
      """flatten(transform(sequence(0, size(ids) - 2),
        |  a -> transform(sequence(a + 1, size(ids) - 1),
        |    b -> struct(element_at(ids, a + 1) AS i, element_at(ids, b + 1) AS j))))"""
        .stripMargin)
    val got = rows.toDF("id", "ids")
      .select(col("id"),
        graft.functions.OrderedPairs.ordered_pairs(col("ids")).as("g"), hof.as("h"))
      .collect()
      .map { r =>
        def pairs(idx: Int) = r.getSeq[org.apache.spark.sql.Row](idx)
          .map(p => (p.getLong(0), p.getLong(1)))
        r.getLong(0) -> ((pairs(1), pairs(2)))
      }.toMap
    rows.foreach { case (id, ids) =>
      val model = for { a <- ids.indices; b <- a + 1 until ids.size } yield (ids(a), ids(b))
      val (g, h) = got(id)
      assert(g == h && g == model, s"row $id ids=$ids got=$g hof=$h model=$model")
    }
    // degenerate sizes (below every call site's guard): empty, not null
    val degen = Seq((0L, Seq.empty[Long]), (1L, Seq(7L))).toDF("id", "ids")
      .select(graft.functions.OrderedPairs.ordered_pairs(col("ids")).as("g"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0))
    assert(degen.forall(_.isEmpty))
  }

  test("xxhash64_array equals the transform+xxhash64 spelling on random string arrays") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (1 to 100).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(6))(
        Iterator.fill(rnd.nextInt(12))((rnd.nextInt(95) + 32).toChar).mkString))
    }
    val got = rows.toDF("id", "sh")
      .select(col("id"),
        graft.functions.XxHash64Array.xxhash64_array(col("sh")).as("g"),
        expr("transform(sh, x -> xxhash64(x))").as("h"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    rows.foreach { case (id, sh) =>
      val (g, h) = got(id)
      assert(g == h, s"row $id sh=$sh got=$g hof=$h")
    }
  }

  test("winnow_fps equals the two-transform HOF winnowing spelling on random token arrays") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "b", "ccc", "dd", "e", "ff")
    val rows = (1 to 150).map { i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))))
    }
    val gs = transform(sequence(lit(0), size(col("w")) - 3),
      i => graft.functions.RollingHash.rolling_hash(concat_ws(" ",
        element_at(col("w"), i + 1), element_at(col("w"), i + 2),
        element_at(col("w"), i + 3))))
    val got = rows.toDF("id", "w")
      .withColumn("gs", gs)
      .select(col("id"),
        graft.functions.WinnowFps.winnow_fps(col("w")).as("g"),
        array_sort(array_distinct(transform(sequence(lit(1), size(col("gs")) - 3),
          j => array_min(slice(col("gs"), j, lit(4)))))).as("h"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    rows.foreach { case (id, w) =>
      val (g, h) = got(id)
      assert(g == h, s"row $id w=$w got=$g hof=$h")
    }
  }

  test("NfcNormalize composes decomposed sequences, is idempotent, and agrees with the JDK") {
    val s = spark
    import s.implicits._
    // codegen path (DataFrame scan) on the canonical trio + controls
    val cases = Seq( // decomposed inputs via explicit escapes (tooling
      // could silently NFC raw source literals)
      "Cafe\u0301",  // e + combining acute -> e-acute
      "A\u030A",     // A + combining ring  -> A-ring
      "o\u0308",     // o + diaeresis       -> o-umlaut
      "caf\u00e9",   // already composed    -> unchanged
      "plain ascii", "")
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), graft.functions.NfcNormalize.nfc_normalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      val exp = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      assert(got(i.toLong) == exp, s"case $i")
      // idempotence: normalizing the normal form is the identity
      assert(java.text.Normalizer.normalize(exp, java.text.Normalizer.Form.NFC) == exp)
    }
    assert(got(0L) == "Caf\u00e9" && got(1L) == "\u00c5" && got(2L) == "\u00f6")
    // fast path: NFC-clean input returns the SAME UTF8String instance
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("ascii only")
    assert(graft.functions.NfcNormalize.nfc(u) eq u)
  }

  test("FreqSketch: Misra-Gries bounds hold on an adversarial stream, any merge order") {
    // vocabulary (10k) >> capacity (m=50): decrement and merge-trim paths
    // fire constantly. Stream: 20 heavy items at ~2.5% each, the rest a
    // long uniform tail. Checks all three MG guarantees against exact
    // counts, for partials merged in shuffled order AND as a skewed
    // left-deep chain — candidate-set guarantees must be merge-shape-free.
    val m = 50
    val sk = new graft.functions.FreqSketch(m)
    val rnd = new scala.util.Random(11)
    val heavy = (0 until 20).map(i => s"hot$i")
    val stream = rnd.shuffle(
      heavy.flatMap(h => Seq.fill(500)(h)) ++
        Seq.fill(10000)(s"tail${rnd.nextInt(10000)}"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong

    val chunks = stream.grouped(997).map(_.foldLeft(sk.zero)(sk.reduce)).toSeq
    for (partials <- Seq(rnd.shuffle(chunks), chunks.reverse)) {
      val merged = partials.reduceLeft(sk.merge)
      val est = sk.finish(merged)
      assert(est.size <= m, s"summary exceeds capacity: ${est.size}")
      est.foreach { case (t, c) =>
        assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
        assert(exact(t) - c <= n / (m + 1), s"$t undercount beyond N/(m+1)")
      }
      val mustHave = exact.filter(_._2 > n / (m + 1)).keySet
      assert(mustHave.subsetOf(est.keySet),
        s"missing heavy items: ${(mustHave -- est.keySet).mkString(",")}")
      assert(heavy.forall(est.contains), "every 2.5% item must be tracked")
    }
  }

  test("FreqSketch: exact when vocabulary fits capacity (the catalog regime)") {
    val sk = new graft.functions.FreqSketch(100)
    val rnd = new scala.util.Random(3)
    val stream = Seq.fill(5000)(s"w${rnd.nextInt(60)}")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val partials = stream.grouped(321).map(_.foldLeft(sk.zero)(sk.reduce)).toSeq
    val est = sk.finish(partials.reduceLeft(sk.merge))
    assert(est == exact, "with vocab < m the sketch is the exact count map")
  }
}
