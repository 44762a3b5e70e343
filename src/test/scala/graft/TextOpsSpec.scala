package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

class TextOpsSpec extends SparkSuite {

  test("fingerprint: order-sensitive, deterministic, overflow-free") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup
      (3L, "kappa iota theta eta zeta epsilon delta gamma beta alpha"), // reordered
      (4L, "")
    ).toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextOps.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L), "identical docs must share a fingerprint")
    assert(fp(1L) != fp(3L), "reordered tokens must change the fingerprint")
    // long docs overflow a non-wrapping fold — must not throw under ANSI
    val long = Seq((1L, Seq.fill(500)("token").mkString(" "))).toDF("doc_id", "text")
    long.select(TextOps.fingerprint($"text")).collect()
  }

  test("wordShingles: k=2 matches wordBigrams; short docs yield empty; count law") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "one two"),
      (3L, "solo"),
      (4L, "")
    ).toDF("doc_id", "text")
    val rows = df.select($"doc_id",
        TextOps.wordShingles($"text", 2).as("s2"),
        TextOps.wordBigrams($"text").as("bg"),
        TextOps.wordShingles($"text", 3).as("s3"),
        TextOps.tokenCount($"text").as("n"))
      .collect()
    for (r <- rows) {
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}: wordShingles(2) must equal wordBigrams")
      val n = r.getLong(4)
      assert(r.getSeq[String](3).size == math.max(n - 2, 0L),
        s"doc ${r.getLong(0)}: shingle count must be max(n-k+1, 0)")
    }
    assert(rows.find(_.getLong(0) == 1L).get.getSeq[String](3) ==
      Seq("a b c", "b c d", "c d e"))
  }

  test("polyhash64 matches a driver-side wrapping fold") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq(3L, 5L, 7L), Seq.empty[Long]).toDF("hs")
    val got = df.select(graft.functions.PolyHash64($"hs")).collect().map(_.getLong(0))
    assert(got(0) == ((3L * 31L + 5L) * 31L + 7L))
    assert(got(1) == 0L)
  }

  test("tx15 chunk plans tile every document: start 0, stride 48, ends at n_tokens") {
    val s = spark
    import s.implicits._
    val chunks = graft.SparkEntry.queries("tx15_doc_chunks")(s, SparkSuite.Sf)
    val toks = graft.model.Tables.documents(s, SparkSuite.Sf)
      .select($"doc_id", TextOps.tokenCount($"text").as("n_tokens"))
    val bad = chunks.join(toks, "doc_id")
      .groupBy($"doc_id", $"n_tokens")
      .agg(min($"tok_start").as("first_start"), max($"tok_end").as("last_end"),
        max($"chunk_idx").as("last_idx"),
        max($"tok_end" - $"tok_start").as("max_len"),
        min($"tok_end" - $"tok_start").as("min_len"),
        countDistinct($"chunk_idx").as("n_chunks"))
      .filter($"first_start" =!= 0L || $"last_end" =!= $"n_tokens" ||
        $"max_len" > 64L || $"min_len" <= 0L ||
        // contiguous indices 0..last: count == last+1; starts are idx*48,
        // so a 64-wide chunk at idx i always overlaps chunk i+1's start
        $"n_chunks" =!= $"last_idx" + 1L ||
        ($"last_idx" > 0L && $"n_tokens" <= $"last_idx" * 48L))
    assert(bad.count() == 0L, s"chunk-plan law violated: ${bad.collect().mkString(";")}")
  }

  test("stratifiedKeep: rate 1 keeps all, rate 0 keeps none, dups co-sampled") {
    val s = spark
    import s.implicits._
    val docs = (0 until 300).map(i => (i.toLong, s"doc ${i % 75}",
      if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c")).toDF("id", "text", "g")
    val kept = docs.filter(TextOps.stratifiedKeep($"text", $"g",
      Map("a" -> 1.0, "b" -> 0.0), defaultFrac = 0.5))
    val byG = kept.groupBy($"g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG.getOrElse("a", 0L) == 100L, s"rate 1.0 must keep all: $byG")
    assert(!byG.contains("b"), s"rate 0.0 must keep none: $byG")
    assert(byG.getOrElse("c", 0L) > 20L && byG("c") < 80L, s"default 0.5 way off: $byG")
    // duplicates of one text in one group are sampled identically
    assert(kept.filter($"g" === "c").groupBy($"text").count()
      .filter($"count" =!= 4).count() == 0L)
    intercept[IllegalArgumentException] {
      docs.filter(TextOps.stratifiedKeep($"text", $"g", Map("a" -> 1.5))).count()
    }
  }

  test("tx18: striped three-level prefix sum equals the naive global cumsum") {
    // mirrors the tx18 query exactly: bucket totals → ≤256 ordered
    // stripes (width from a 1-row max) → theta-join stripe offsets →
    // stripe-partitioned bucket bases → bucket-partitioned doc cumsum.
    // No unpartitioned window at any level.
    val s = spark
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    // sparse non-contiguous ids so buckets have ragged occupancy
    val docs = (0 until 500).map(i => (i.toLong * 7 % 1000, (i % 37) + 1L))
      .distinct.toDF("doc_id", "n_tok")
    val bucketed = docs.withColumn("bucket", expr("doc_id div 64"))
    val bucketTok = bucketed.groupBy($"bucket").agg(sum($"n_tok").as("btok"))
    // width forced to 3 so the test actually exercises multiple stripes
    // with multiple buckets each (doc_id<1000 → buckets 0..15)
    val striped = bucketTok.withColumn("stripe", expr("bucket div 3"))
    val stripeTot = striped.groupBy($"stripe").agg(sum($"btok").as("stok"))
    val stripeOff = stripeTot
      .join(broadcast(stripeTot.select($"stripe".as("p_stripe"), $"stok".as("p_stok"))),
        $"p_stripe" < $"stripe", "left")
      .groupBy($"stripe").agg(coalesce(sum($"p_stok"), lit(0L)).as("soff"))
    val base = striped.join(broadcast(stripeOff), "stripe")
      .withColumn("base", $"soff" + coalesce(sum($"btok").over(
        Window.partitionBy($"stripe").orderBy($"bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bucket", $"base")
    val threeLevel = bucketed.join(base, "bucket")
      .withColumn("start_tok", $"base" + coalesce(sum($"n_tok").over(
        Window.partitionBy($"bucket").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"start_tok")
      .orderBy($"doc_id").collect().toSeq
    val naive = docs.withColumn("start_tok", coalesce(sum($"n_tok").over(
        Window.orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"start_tok")
      .orderBy($"doc_id").collect().toSeq
    assert(threeLevel.nonEmpty && threeLevel == naive,
      "striped offsets diverge from the single-pass cumsum")
  }

  test("tx31 deflate ratios: repetitive text compresses hard, distinct text doesn't") {
    def ratio(text: String): Double = {
      val raw = text.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      n.toDouble / raw.length
    }
    val rep = ratio(Seq.fill(60)("spark").mkString(" "))
    val ent = ratio((0 until 60).map(i => f"w$i%02dq${(i * 37) % 100}%02d").mkString(" "))
    assert(rep < 0.15, s"repetitive ratio $rep")          // 60x one token ~ tiny
    // the all-distinct doc still shares the wNNqNN shape, so deflate finds
    // SOME structure (~0.48 measured) — the certificate's claim is the
    // ORDERING, with a ≥3x separation as the margin
    assert(ent > 0.3 && ent <= 1.2, s"entropic ratio $ent")
    assert(rep * 3 < ent, s"rep=$rep ent=$ent")
    // determinism: same bytes, same params -> same compressed size
    assert(ratio("the quick brown fox") == ratio("the quick brown fox"))
  }

  test("canonicalizeUrl: rule-by-rule pins incl. the path-case and real-param teeth") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // scheme dropped, host lowercased, www stripped, fragment dropped
      "HTTP://WWW.Ex.COM/p1#sec" -> "ex.com/p1",
      "https://ex.com/p1" -> "ex.com/p1",
      // trailing slash stripped (one), tracking param dropped, real kept in order
      "https://ex.com/p1/" -> "ex.com/p1",
      "https://ex.com/p1?utm_source=a&id=7&utm_campaign=b" -> "ex.com/p1?id=7",
      "https://ex.com/p1?id=7" -> "ex.com/p1?id=7",
      "https://ex.com/p1?fbclid=x&gclid=y" -> "ex.com/p1",
      // tracking params matched by NAME: bare valueless forms drop too,
      // and a real param whose name merely STARTS like one is kept
      "https://ex.com/p1?fbclid&gclid" -> "ex.com/p1",
      "https://ex.com/p1?fbclid2=x&id=9" -> "ex.com/p1?fbclid2=x&id=9",
      // path case preserved (the merge tooth), query on bare host
      "https://ex.com/P1" -> "ex.com/P1",
      "https://ex.com?id=3" -> "ex.com?id=3",
      "https://ex.com/" -> "ex.com")
    val got = cases.map(_._1).toDF("u")
      .select(TextOps.canonicalizeUrl(col("u"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2),
      cases.map(_._1).zip(got).mkString("; "))
  }

  test("intervalUnionLength: 200 random interval sets match brute-force " +
    "bitset coverage (incl. nesting, duplicates, adjacency)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    val cases = (0 until 200).flatMap { k =>
      val n = 1 + rnd.nextInt(12)
      (0 until n).map { _ =>
        val st = 1 + rnd.nextInt(40)
        val e = st + rnd.nextInt(10)
        (k.toLong, st.toLong, e.toLong)
      }
    }
    val expected = cases.groupBy(_._1).map { case (k, ivs) =>
      k -> ivs.flatMap { case (_, st, e) => st to e }.distinct.size.toLong
    }
    val got = graft.ops.TextOps.intervalUnionLength(
        cases.toDF("k", "s", "e").repartition(7), "k", "s", "e")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"first divergence: ${expected.find(kv => got.get(kv._1) != Some(kv._2))}")
  }

  test("tx26 BPE merge encoding: wrapped-replace has exact greedy " +
    "left-to-right non-overlap semantics (and shared separators would not)") {
    val sep = "\u001F"
    def wrap(sym: String) = sep + sym + sep
    def merge(ws: String, a: String, b: String): String =
      ws.replace(wrap(a) + wrap(b), wrap(a + b))
    def wrapWord(w: String) = w.map(c => wrap(c.toString)).mkString
    // "aaaa" + merge(a,a): greedy left-to-right gives [aa][aa] — the
    // java.lang.String/Spark/DuckDB replace all share this semantics
    assert(merge(wrapWord("aaaa"), "a", "a") == wrap("aa") + wrap("aa"))
    // odd run: [aa][a]
    assert(merge(wrapWord("aaa"), "a", "a") == wrap("aa") + wrap("a"))
    // merged symbols participate in later rounds: [aa][aa] + (aa,aa)
    assert(merge(wrap("aa") + wrap("aa"), "aa", "aa") == wrap("aaaa"))
    // a pair straddling an unrelated symbol does not fire
    assert(merge(wrapWord("aba"), "a", "a") == wrapWord("aba"))
    // the SHARED-separator encoding this design rejects: consecutive
    // merges eat each other's boundary (documents why symbols are
    // wrapped with exclusive delimiters on both engines)
    val shared = sep + "a" + sep + "a" + sep + "a" + sep + "a" + sep
    val sharedMerged = shared.replace(sep + "a" + sep + "a" + sep, sep + "aa" + sep)
    assert(sharedMerged != sep + "aa" + sep + "aa" + sep,
      "shared separators would have been fine after all?")
  }

  test("tx33 greedy segmentation: longest-wins, lossless, single-char fallback, " +
    "and DOCUMENTED greedy-vs-minimal divergence") {
    import graft.functions.GreedySegment.segmentSeq
    // longest match wins over a shorter prefix piece
    assert(segmentSeq("abc", Seq("ab", "abc")) == Seq("abc"))
    // out-of-vocab chars fall back to singles; concat is always the word
    assert(segmentSeq("abcdxy", Seq("ab", "abc")) == Seq("abc", "d", "x", "y"))
    for (w <- Seq("", "a", "zzzz", "abcabcab"))
      assert(segmentSeq(w, Seq("ab", "bc", "cab")).mkString("") == w,
        s"segmentation of '$w' is not lossless")
    // THE semantics pin: greedy longest-match is NOT minimal-piece DP —
    // 'ab' greedily consumed first blocks the 2-piece a|bcd split. This
    // is WordPiece's production behavior and what the oracle replays;
    // a future "optimization" to minimal DP must show up here.
    assert(segmentSeq("abcd", Seq("ab", "bcd")) == Seq("ab", "c", "d"))
    // CODE-POINT semantics: 𝕏 is a supplementary-plane char (2 UTF-16
    // units); Spark substring and DuckDB substr both count code points,
    // so 'a𝕏' is a length-2 piece and the surrogate pair never splits
    assert(segmentSeq("a𝕏b", Seq("a𝕏")) ==
      Seq("a𝕏", "b"))
    assert(segmentSeq("𝕏𝕏", Seq.empty)
      == Seq("𝕏", "𝕏"),
      "fallback must consume whole code points, not surrogate halves")
  }

  test("tx34 decoded length: Σ piece code-points == word code-points, " +
    "incl. non-BMP and the null path") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = new GenericArrayData(
      Seq("ab", "bcd", "a𝕏").map(UTF8String.fromString).toArray[Any])
    for (w <- Seq("", "a", "abcd", "abcabcab", "a𝕏b", "𝕏𝕏"))
      assert(graft.functions.GreedySegment.decodedLen(
        UTF8String.fromString(w), vocab) == w.codePointCount(0, w.length),
        s"decoded length of '$w' diverged from its code-point count — " +
          "the walk skipped or double-consumed characters")
  }
}
