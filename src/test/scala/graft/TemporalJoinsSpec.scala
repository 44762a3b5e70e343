package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{TemporalJoins, TextOps}

class TemporalJoinsSpec extends SparkSuite {

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("asOfJoin: inclusive latest-prior match, left-outer, per-key") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "u", ts("10:00")), // exact tie with a right row -> inclusive
      (2L, "u", ts("10:30")), // between rights -> earlier one
      (3L, "u", ts("09:00")), // before any right -> null payload
      (4L, "v", ts("23:00"))  // other key: must not see u's rows
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u", ts("10:00"), "a"),
      ("u", ts("11:00"), "b"),
      ("v", ts("08:00"), "c")
    ).toDF("rk", "rt", "payload")

    val out = TemporalJoins.asOfJoin(left, right, "k", "rk", "t", "rt")
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(1L -> Some("a"), 2L -> Some("a"), 3L -> None, 4L -> Some("c")))
  }

  test("asOfJoin: null keys/times follow join semantics (match nothing)") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, Option("u"), Option(ts("10:00"))),
      (2L, Option.empty[String], Option(ts("10:00"))), // null key: no match
      (3L, Option("u"), Option.empty[java.sql.Timestamp]) // null time: no match
    ).toDF("id", "k", "t")
    val right = Seq(
      (Option("u"), Option(ts("09:00")), 1L),
      (Option.empty[String], Option(ts("08:00")), 2L), // null key: donates nothing
      (Option("u"), Option.empty[java.sql.Timestamp], 3L) // null time: donates nothing
    ).toDF("rk", "rt", "payload")
    val out = TemporalJoins.asOfJoin(left, right, "k", "rk", "t", "rt")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(1L -> Some(1L), 2L -> None, 3L -> None))
  }

  test("asOfJoin: one shuffle, no nested-loop join in the plan") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "u", ts("10:00"))).toDF("id", "k", "t")
    val right = Seq(("u", ts("09:00"), 5.0)).toDF("rk", "rt", "x")
    val plan = TemporalJoins.asOfJoin(left, right, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"as-of must not nested-loop:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly one shuffle, got $shuffles:\n$plan")
  }

  test("asOfJoinForward: inclusive earliest-following match, left-outer, per-key") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "u", ts("10:00")), // exact tie with a right row -> inclusive
      (2L, "u", ts("10:30")), // between rights -> LATER one (forward)
      (3L, "u", ts("12:00")), // after all rights -> null payload
      (4L, "v", ts("07:00"))  // other key: must not see u's rows
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u", ts("10:00"), "a"),
      ("u", ts("11:00"), "b"),
      ("v", ts("08:00"), "c")
    ).toDF("rk", "rt", "payload")
    val out = TemporalJoins.asOfJoinForward(left, right, "k", "rk", "t", "rt")
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None, 4L -> Some("c")))
  }

  test("asOfJoinForward matches a naive per-row reference on seeded random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(43)
    val left = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ts(f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d")))
      .toDF("id", "k", "t")
    val right = (1 to 120).map(i =>
      (s"k${rnd.nextInt(5)}", ts(f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
      .distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, time)
      .toDF("rk", "rt", "payload")
    val rightRows = right.collect().map(r =>
      (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val expect = left.collect().map { r =>
      val (id, k, t) = (r.getLong(0), r.getString(1), r.getTimestamp(2))
      val cand = rightRows.filter(x => x._1 == k && !x._2.before(t))
      id -> (if (cand.isEmpty) None else Some(cand.minBy(_._2.getTime)._3))
    }.toMap
    val got = TemporalJoins.asOfJoinForward(left, right, "k", "rk", "t", "rt")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == expect)
  }

  test("rangeJoin: half-open [start,end), per-key, spans bins, no duplicates") {
    val s = spark
    import s.implicits._
    val points = Seq(
      (10L, "u", ts("10:00")), // == start -> in
      (11L, "u", ts("10:59")), // inside   -> in
      (12L, "u", ts("11:00")), // == end   -> out
      (13L, "v", ts("10:30")), // other key -> out
      (14L, "u", ts("12:30"))  // inside the long interval only
    ).toDF("pid", "k", "t")
    val intervals = Seq(
      ("u", 100L, ts("10:00"), ts("11:00")),
      ("u", 200L, ts("09:30"), ts("13:30")) // spans 5 one-hour bins
    ).toDF("ik", "iid", "s", "e")

    val rows = TemporalJoins.rangeJoin(points, intervals,
        "k", "ik", "t", "s", "e", binSeconds = 3600)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((10L, 100L), (11L, 100L), (10L, 200L), (11L, 200L),
      (12L, 200L), (14L, 200L)))
    // exactly one row per matching (point, interval): binning must not dup
    val n = TemporalJoins.rangeJoin(points, intervals,
      "k", "ik", "t", "s", "e", binSeconds = 3600).count()
    assert(n == 6L)
  }

  test("rangeJoin: plans an equi-join, not a nested loop") {
    val s = spark
    import s.implicits._
    val points = Seq((1L, "u", ts("10:00"))).toDF("pid", "k", "t")
    val intervals = Seq(("u", 1L, ts("09:00"), ts("11:00"))).toDF("ik", "iid", "s", "e")
    val plan = TemporalJoins.rangeJoin(points, intervals,
        "k", "ik", "t", "s", "e", binSeconds = 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"range join must plan as equi-join on (key, bin):\n$plan")
  }

  test("asOfJoin matches a naive per-row reference on seeded random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val leftRows = (0 until 400).map(i =>
      (i.toLong, s"k${rnd.nextInt(12)}", Timestamp.valueOf(
        f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
    // unique (key, time) on the right, as the contract requires
    val rights = (0 until 150).map(i =>
      (s"k${rnd.nextInt(12)}", Timestamp.valueOf(
        f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val left = leftRows.toDF("id", "k", "t")
    val right = rights.toDF("rk", "rt", "payload")
    val got = TemporalJoins.asOfJoin(left, right, "k", "rk", "t", "rt")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val want = leftRows.map { case (id, k, t) =>
      id -> rights.filter(r => r._1 == k && !r._2.after(t))
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
    }.toMap
    assert(got == want)
  }

  test("rangeJoin matches a naive inequality join on seeded random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    def t(mins: Int) = Timestamp.valueOf(f"2024-01-01 ${mins / 60}%02d:${mins % 60}%02d:00")
    val pointRows = (0 until 400).map(i => (i.toLong, s"k${rnd.nextInt(8)}", t(rnd.nextInt(1200))))
    val intRows = (0 until 120).map { i =>
      val start = rnd.nextInt(1100)
      (s"k${rnd.nextInt(8)}", i.toLong, t(start), t(start + 1 + rnd.nextInt(200)))
    }
    val got = TemporalJoins.rangeJoin(pointRows.toDF("pid", "k", "t"),
        intRows.toDF("ik", "iid", "s", "e"), "k", "ik", "t", "s", "e", binSeconds = 3600)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (pid, pk, pt) <- pointRows
      (ik, iid, is, ie) <- intRows
      if pk == ik && !pt.before(is) && pt.before(ie)
    } yield (pid, iid)).toSet
    assert(got == want)
  }

  test("resampleFfill: one ancient stray event cannot inflate a user's grid") {
    val s = spark
    import s.implicits._
    def ts(str: String) = java.sql.Timestamp.valueOf(str)
    val ev = Seq(
      // u1: one event a DECADE before the rest — unclamped, its grid would
      // be ~87k hourly rows
      (1L, "u1", ts("2014-01-01 00:30:00"), 5.0),
      (2L, "u1", ts("2024-01-02 10:15:00"), 7.0),
      (3L, "u1", ts("2024-01-02 12:45:00"), 9.0),
      // u2: a well-behaved 2-hour span
      (4L, "u2", ts("2024-01-02 10:00:00"), 1.0),
      (5L, "u2", ts("2024-01-02 12:00:00"), 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = graft.queries.EventQueries.resampleFfill(ev, maxSpanHours = 48)
      .orderBy($"user_id", $"grid_ts").collect()
    val u1 = out.filter(_.getString(0) == "u1")
    // u1's grid covers the 48h ending at its newest hour, not the decade
    assert(u1.length == 49, s"expected 49 clamped grid rows, got ${u1.length}")
    assert(u1.head.getString(1) == "2023-12-31 12:00:00")
    assert(u1.last.getString(1) == "2024-01-02 12:00:00")
    // pre-clamp history still forward-fills: the first grid points carry
    // the ancient event's value, later ones pick up the in-span updates
    // (the 12:45 event lands after the last grid point 12:00 — hour-
    // truncated max — so 9.0 never appears on the grid)
    assert(u1.head.getDouble(2) == 5.0)
    assert(u1.count(_.getDouble(2) == 7.0) == 2) // 11:00 and 12:00 >= 10:15
    assert(u1.last.getDouble(2) == 7.0)
    assert(!u1.exists(_.getDouble(2) == 9.0))
    // u2 is untouched by the clamp
    assert(out.filter(_.getString(0) == "u2").length == 3)
  }

  test("contentSplit: deterministic, duplicates co-assigned, both splits hit") {
    val s = spark
    import s.implicits._
    val docs = (0 until 200).map(i => (i.toLong, s"document number ${i % 50}"))
      .toDF("id", "text") // 4 exact copies of each distinct text
    val out = docs.select($"id", $"text", TextOps.contentSplit($"text").as("split"))
    // every duplicate group lands in exactly one split
    assert(out.groupBy($"text").agg(countDistinct($"split").as("n"))
      .filter($"n" > 1).count() == 0L)
    val bySplit = out.groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val"))
    assert(bySplit("train") > bySplit("val"), s"0.9 split skews train: $bySplit")
    intercept[IllegalArgumentException](TextOps.contentSplit(lit("x"), 1.0))
  }
}
