package graft

import graft.functions.{BoundedMinPairs, BoundedMinSet, FreqSketch, TopKAggregator}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based merge laws for the custom mergeable aggregates.
  *
  * Distributed correctness of an Aggregator IS its algebra: partials
  * reduced on arbitrary partition boundaries and merged in arbitrary
  * tree shapes must yield the declared result. The example-based specs
  * pin behavior on the driver corpora; these properties pin it on
  * hundreds of adversarial random (stream, chunking, merge-order)
  * triples per law — the regime a 1000-executor shuffle actually
  * produces.
  */
class PropertySpec extends GraftSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  /** Chunk a stream and merge the per-chunk partials in a seeded
    * arbitrary order (left-fold of a shuffled chunk list — covers both
    * skewed and balanced trees across trials). */
  private def chunkedMerge[B](xs: Seq[Long], chunk: Int, seed: Long,
      zero: => B, red: (B, Long) => B, mrg: (B, B) => B): B = {
    val parts = xs.grouped(math.max(1, chunk)).map(_.foldLeft(zero)(red)).toSeq
    val shuffled = new scala.util.Random(seed).shuffle(parts)
    shuffled.reduceLeft(mrg)
  }

  test("TopKAggregator: any chunking/merge order equals the exact top-k") {
    val gen = for {
      n <- Gen.choose(1, 400)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(-5, 5).map(_ * 0.5), Gen.choose(0L, 30L)))
      k <- Gen.choose(1, 8)
      chunk <- Gen.choose(1, 50)
      seed <- Gen.long
    } yield (xs, k, chunk, seed)
    check(Prop.forAll(gen) { case (xs, k, chunk, seed) =>
      val agg = new TopKAggregator(k)
      val buf = chunkedMerge[Array[Long]](xs.indices.map(_.toLong), chunk, seed,
        agg.zero, (b, i) => agg.reduce(b, xs(i.toInt)), agg.merge)
      val got = agg.finish(buf)
      // exact law: scores desc, id asc tiebreak, distinct (score, id) pairs kept as-is
      val expect = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      got == expect
    })
  }

  test("FreqSketch: MG bounds hold for any stream, chunking, and merge order") {
    val gen = for {
      n <- Gen.choose(1, 600)
      // skewed domain: small vocab of hot items + long tail
      xs <- Gen.listOfN(n, Gen.frequency(
        3 -> Gen.choose(0, 5).map(i => s"hot$i"),
        7 -> Gen.choose(0, 500).map(i => s"t$i")))
      m <- Gen.choose(2, 20)
      chunk <- Gen.choose(1, 60)
      seed <- Gen.long
    } yield (xs, m, chunk, seed)
    check(Prop.forAll(gen) { case (xs, m, chunk, seed) =>
      val sk = new FreqSketch(m)
      val est = sk.finish(chunkedMerge(xs.indices.map(_.toLong), chunk, seed,
        sk.zero, (b: scala.collection.immutable.HashMap[String, Long], i: Long) =>
          sk.reduce(b, xs(i.toInt)), sk.merge))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toLong
      est.size <= m &&
        est.forall { case (t, c) => c <= exact(t) && exact(t) - c <= n / (m + 1) } &&
        exact.filter(_._2 > n / (m + 1)).keySet.subsetOf(est.keySet)
    })
  }

  test("BoundedMinSet: chunked update + serde round-trip + merge equals cap-smallest distinct") {
    val expr = BoundedMinSet(BoundReference(0, LongType, nullable = true), cap = 6)
    val gen = for {
      n <- Gen.choose(0, 300)
      xs <- Gen.listOfN(n, Gen.choose(0L, 40L)) // dense domain → many duplicates
      chunk <- Gen.choose(1, 40)
      seed <- Gen.long
    } yield (xs, chunk, seed)
    check(Prop.forAll(gen) { case (xs, chunk, seed) =>
      val parts = xs.grouped(math.max(1, chunk)).map { part =>
        val buf = part.foldLeft(expr.createAggregationBuffer()) { (b, v) =>
          expr.update(b, InternalRow(v))
        }
        // every partial crosses the wire in a real shuffle
        expr.deserialize(expr.serialize(buf))
      }.toSeq
      val merged =
        if (parts.isEmpty) expr.createAggregationBuffer()
        else new scala.util.Random(seed).shuffle(parts)
          .reduceLeft((a, b) => expr.merge(a, b))
      val ids = java.util.Arrays.copyOf(merged.ids, merged.used).toSeq
      val expect = xs.distinct.sorted.take(6)
      ids == expect && merged.total == xs.size.toLong
    })
  }

  test("BoundedMinPairs: chunked update + serde round-trip + merge equals k-smallest distinct pairs") {
    // round-14 verdict item: the gate only ever runs k=4 ≤ the initial
    // buffer, so the `used < k` growth branch of insert() never
    // executes end-to-end. k=7 forces growth (initial capacity is
    // min(k, 4) pairs); the dense (d, id) domain forces exact-duplicate
    // dedupe (the both-probe-directions case), (same-d, different-id)
    // ties, full-buffer merges, and serde of every partial.
    val expr = BoundedMinPairs(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, LongType, nullable = true), k = 7)
    val gen = for {
      n <- Gen.choose(0, 300)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
      chunk <- Gen.choose(1, 40)
      seed <- Gen.long
    } yield (xs, chunk, seed)
    check(Prop.forAll(gen) { case (xs, chunk, seed) =>
      val parts = xs.grouped(math.max(1, chunk)).map { part =>
        val buf = part.foldLeft(expr.createAggregationBuffer()) { case (b, (d, i)) =>
          expr.update(b, InternalRow(d, i))
        }
        // every partial crosses the wire in a real shuffle
        expr.deserialize(expr.serialize(buf))
      }.toSeq
      val merged =
        if (parts.isEmpty) expr.createAggregationBuffer()
        else new scala.util.Random(seed).shuffle(parts)
          .reduceLeft((a, b) => expr.merge(a, b))
      val got = (0 until merged.used)
        .map(i => (merged.arr(2 * i), merged.arr(2 * i + 1)))
      val expect = xs.distinct.sorted.take(7)
      got == expect
    })
  }

  test("deletion-neighborhood blocking is complete for every ed<=1 edit") {
    // the q_dedup_editdist theorem, property-tested: for ANY base string
    // and ANY single edit (insert/delete/substitute at any position),
    // D1(a) ∩ D1(b) ≠ ∅ where D1(s) = {s} ∪ {s minus one char} — i.e.
    // the blocking key join finds the pair before verification.
    def d1(s: String): Set[String] =
      Set(s) ++ s.indices.map(i => s.substring(0, i) + s.substring(i + 1))
    val alpha = Gen.alphaLowerChar
    val gen = for {
      n <- Gen.choose(1, 24)
      base <- Gen.listOfN(n, alpha).map(_.mkString)
      kind <- Gen.choose(0, 2)
      pos <- Gen.choose(0, n - 1)
      c <- alpha
    } yield {
      val edited = kind match {
        case 0 => base.substring(0, pos) + c + base.substring(pos)       // insert
        case 1 => base.substring(0, pos) + base.substring(pos + 1)       // delete
        case _ => base.substring(0, pos) + c + base.substring(pos + 1)   // substitute
      }
      (base, edited)
    }
    check(Prop.forAll(gen) { case (a, b) =>
      (d1(a) intersect d1(b)).nonEmpty
    })
  }

  test("NfcNormalize: idempotent, JDK-law-abiding, concat-stable on random combining streams") {
    import org.apache.spark.unsafe.types.UTF8String
    // strings mixing ascii, precomposed latin-1, and combining marks —
    // the regime where NFC actually rewrites bytes
    val unit = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("é", "å", "ö", "ñ", "é", "Å", "ö"),
      1 -> Gen.oneOf("́", "̈", "̊")) // bare marks (after anything)
    val gen = for {
      n <- Gen.choose(0, 24)
      parts <- Gen.listOfN(n, unit)
    } yield parts.mkString
    def nfc(s: String): String =
      graft.functions.NfcNormalize.nfc(UTF8String.fromString(s)).toString
    check(Prop.forAll(gen) { s =>
      val once = nfc(s)
      // agreement with the JDK reference + idempotence + normal-form law
      once == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC) &&
        nfc(once) == once &&
        java.text.Normalizer.isNormalized(once, java.text.Normalizer.Form.NFC) &&
        // canonical equivalence preserved: NFD of both sides agrees
        java.text.Normalizer.normalize(once, java.text.Normalizer.Form.NFD) ==
          java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    })
  }
}
