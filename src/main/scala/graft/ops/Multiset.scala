package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass multiset difference — the replacement for the
  * `a.exceptAll(b)` + `b.exceptAll(a)` pattern.
  *
  * Catalyst rewrites each `ExceptAll` to: signed union (+1/−1) →
  * aggregate(sum) → filter(sum > 0) → replicate rows. Running it in both
  * directions therefore builds that whole pipeline TWICE: both inputs
  * scanned twice, two full-row shuffles, two jobs when each side is
  * counted separately. One signed aggregate produces both directions at
  * once — each input scanned once, ONE full-row shuffle — and the
  * emitted multiset is identical by construction (net > 0 ⇒ that many
  * a-side surplus copies, net < 0 ⇒ that many b-side surplus copies;
  * NULL handling matches: both exceptAll and groupBy use null-safe row
  * equality).
  *
  * Contract (exceptAll's own): `a` and `b` share one schema.
  */
object Multiset {

  private val NetCol = "_ms_net"

  /** Per-row net multiplicity count(a) − count(b), rows with net 0
    * dropped. One shuffle, each input scanned once. */
  def signedCounts(a: DataFrame, b: DataFrame): DataFrame = {
    require(!a.columns.contains(NetCol),
      s"input already carries a $NetCol column")
    val cols = a.columns.toSeq.map(col)
    a.select(cols :+ lit(1L).as(NetCol): _*)
      .unionByName(b.select(cols :+ lit(-1L).as(NetCol): _*))
      .groupBy(cols: _*).agg(sum(col(NetCol)).as(NetCol))
      .filter(col(NetCol) =!= 0L)
  }

  /** Multiset equality in ONE job (vs two exceptAll counts = two jobs,
    * four input scans). */
  def equal(a: DataFrame, b: DataFrame): Boolean =
    signedCounts(a, b).isEmpty

  /** Both exceptAll directions as one frame: multiset-identical to
    * `a.exceptAll(b).withColumn(tagCol, lit(aTag))
    *   .unionByName(b.exceptAll(a).withColumn(tagCol, lit(bTag)))`
    * — surplus rows replicated to their net count, tagged by side. */
  def diffTagged(a: DataFrame, b: DataFrame, tagCol: String,
                 aTag: String, bTag: String): DataFrame = {
    val cols = a.columns.toSeq.map(col)
    signedCounts(a, b)
      .select(cols ++ Seq(col(NetCol),
        explode(sequence(lit(1L), abs(col(NetCol)))).as("_ms_i")): _*)
      .select(cols :+ when(col(NetCol) > 0, aTag).otherwise(bTag)
        .as(tagCol): _*)
  }
}
