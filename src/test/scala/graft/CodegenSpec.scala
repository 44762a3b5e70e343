package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.functions._

/** Proof that every native scalar expression actually compiles and runs
  * through whole-stage codegen — not just that `doGenCode` exists.
  *
  * A codegen bug has two silent failure modes this spec closes:
  * (1) the generated Java fails to COMPILE and Spark quietly falls back
  * to the interpreted path (`spark.sql.codegen.fallback=true` by
  * default) — here fallback is disabled, so a compile failure is a test
  * failure; (2) the generated code compiles but DISAGREES with
  * `nullSafeEval` — here every expression is evaluated through both
  * paths (wholeStage+CODEGEN_ONLY vs no-wholeStage+NO_CODEGEN) on the
  * same input, including null / empty-array edge rows, and the results
  * must match exactly. A plan assertion additionally pins that the
  * expression sits INSIDE a `WholeStageCodegenExec` project, so a future
  * regression to `CodegenFallback` (which would wrap the expression and
  * break the fused pipeline) is caught.
  *
  * Inputs derive from `spark.range` (a codegen-able physical source) so
  * the optimizer cannot constant-fold the projection away, which a
  * local-relation input would allow (`ConvertToLocalRelation`).
  */
class CodegenSpec extends SparkSuite {

  /** Collect `mk`'s rows with expression evaluation forced down one path.
    * codegen=true: whole-stage on, generated-object factories only, and
    * compile failures FATAL. codegen=false: fully interpreted. */
  private def collectWith(codegen: Boolean)(mk: => DataFrame): Seq[Seq[Any]] = {
    val s = spark
    if (codegen) {
      s.conf.set("spark.sql.codegen.wholeStage", "true")
      s.conf.set("spark.sql.codegen.fallback", "false")
      s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    } else {
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    }
    try mk.collect().toSeq.map(_.toSeq)
    finally {
      s.conf.unset("spark.sql.codegen.wholeStage")
      s.conf.unset("spark.sql.codegen.fallback")
      s.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  private def unwrap(df: DataFrame) = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  /** The expression must appear in a ProjectExec UNDER a
    * WholeStageCodegenExec — i.e. its generated code is part of the fused
    * stage, not a fallback island. */
  private def assertFused(df: DataFrame, isMine: Expression => Boolean,
                          name: String): Unit = {
    val covered = unwrap(df).collect {
      case w: WholeStageCodegenExec => w.collect {
        case p: ProjectExec => p.projectList.exists(_.find(isMine).isDefined)
      }.exists(identity)
    }.exists(identity)
    assert(covered,
      s"$name is not inside a WholeStageCodegen project:\n${unwrap(df)}")
  }

  /** Both-path equivalence + fusion pin in one call. */
  private def check(name: String, isMine: Expression => Boolean)
                   (mk: => DataFrame): Unit = test(
    s"$name: codegen compiles, fuses into WholeStageCodegen, and matches " +
      "the interpreted path") {
    val gen = collectWith(codegen = true)(mk)
    val interp = collectWith(codegen = false)(mk)
    assert(gen.nonEmpty, s"$name produced no rows — vacuous check")
    assert(gen == interp,
      s"$name: codegen and interpreted paths disagree\ncodegen:     " +
        s"${gen.take(5)}\ninterpreted: ${interp.take(5)}")
    val s = spark
    s.conf.set("spark.sql.codegen.wholeStage", "true")
    try { val d = mk; d.count(); assertFused(d, isMine, name) }
    finally s.conf.unset("spark.sql.codegen.wholeStage")
  }

  /** 64 rows; id 0 gives empty arrays, ids ≡ 0 (mod 9) give NULL arrays —
    * both paths must agree on the null-handling edges too.
    *
    * Materialized to parquet once: the HOFs (`transform` lambdas) that
    * BUILD the arrays are not codegen-able and would drag the whole
    * project out of the fused stage — reading the arrays back from a
    * columnar scan leaves the expression-under-test as the only
    * non-built-in in its project, so the fusion pin tests the
    * expression, not its fixture. */
  private lazy val base: DataFrame = {
    val dir = new java.io.File("target/codegen-spec-base").getAbsolutePath
    baseRaw.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def baseRaw = spark.range(64).select(
    col("id"),
    when(col("id") % 9 =!= 0 || col("id") === 0,
      transform(sequence(lit(1L), pmod(col("id"), lit(7L))),
        x => concat(lit("tok"), pmod(x * col("id"), lit(5L)).cast("string"))))
      .as("toks"),
    when(col("id") % 9 =!= 0 || col("id") === 0,
      transform(sequence(lit(1L), pmod(col("id"), lit(6L))),
        x => xxhash64(x * (col("id") + 1L))))
      .as("hashed"),
    transform(sequence(lit(0L), lit(7L)),
      x => (x * 3L + pmod(col("id"), lit(11L))).cast("double") / lit(7.0))
      .as("emb"))

  check("ShingleHashes", _.isInstanceOf[ShingleHashes]) {
    base.select(col("id"), ShingleHashes(col("toks"), 3).as("v"))
  }

  check("MinHashSig", _.isInstanceOf[MinHashSig]) {
    base.select(col("id"), MinHashSig(col("hashed"), 16).as("v"))
  }

  check("XxHash64Array", _.isInstanceOf[XxHash64Array]) {
    base.select(col("id"), XxHash64Array(col("toks")).as("v"))
  }

  check("PolyHash64", _.isInstanceOf[PolyHash64]) {
    base.select(col("id"), PolyHash64(col("hashed")).as("v"))
  }

  check("SimHash64", _.isInstanceOf[SimHash64]) {
    base.select(col("id"), SimHash64(col("hashed")).as("v"))
  }

  check("DotProduct", _.isInstanceOf[DotProduct]) {
    base.select(col("id"), DotProduct(col("emb"), reverse(col("emb"))).as("v"))
  }

  check("SqDistToNearest", _.isInstanceOf[SqDistToNearest]) {
    base.select(col("id"), SqDistToNearest(col("emb"),
      Seq(Seq.fill(8)(0.5), Seq.fill(8)(2.0))).as("v"))
  }

  check("ZOrder64", _.isInstanceOf[ZOrder64]) {
    base.select(col("id"), ZOrder64(col("id"), pmod(col("id") * 37L, lit(1000L))).as("v"))
  }

  check("GreedyPieceCount", _.isInstanceOf[GreedyPieceCount]) {
    // a genuinely NULLABLE word column (concat_ws never returns null, so
    // it alone would leave the expression's null branch untested)
    base.select(col("id"), GreedySegment.pieceCountCol(
      when(col("id") % 9 =!= 0 || col("id") === 0,
        concat_ws("", col("toks"))),
      Seq("tok", "ok1", "to", "k2")).as("v"))
  }

  check("GreedyDecodedLen", _.isInstanceOf[GreedyDecodedLen]) {
    // same nullable-word fixture as GreedyPieceCount; the decode side of
    // the tx34 round-trip certificate must fuse and null-propagate too
    base.select(col("id"), GreedySegment.decodedLenCol(
      when(col("id") % 9 =!= 0 || col("id") === 0,
        concat_ws("", col("toks"))),
      Seq("tok", "ok1", "to", "k2")).as("v"))
  }

  check("CmsEstimate", _.isInstanceOf[CmsEstimate]) {
    val cms = CountMinSketch.create(0.01, 0.99, 42)
    (0L until 200L).foreach(v => cms.addLong(v % 13))
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    base.select(col("id"), CmsEstimate(lit(out.toByteArray), pmod(col("id"), lit(17L))).as("v"))
  }
}
