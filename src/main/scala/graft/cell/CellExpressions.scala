package graft.cell

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.call_function

/**
 * `zcell(lon, lat, res) -> bigint` as a native Catalyst expression with
 * whole-stage codegen (`doGenCode` emits a static call into [[CellIndex]]),
 * the north-star's "batched codegen UDF" for H3/S2-style encoding. This is
 * the engine's hottest scalar (every feature and every probe point is
 * encoded), so it must not break the WholeStageCodegen span the way a Scala
 * UDF would.
 *
 * Reference semantics: the 64-bit interleaved geohash encode used as every
 * query's join key (reference: util/.../GeoCalculator.scala:28-61,
 * OsmObjectMapper.scala:1046-1059).
 */
case class ZCellEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  // inputs must already be (double, double, int) — callers in CellFunctions
  // guarantee it; no implicit-cast contract needed for internal use.
  override def dataType: DataType = LongType
  override def prettyName: String = "zcell"

  override def nullSafeEval(lon: Any, lat: Any, res: Any): Any =
    CellIndex.encode(lon.asInstanceOf[Double], lat.asInstanceOf[Double], res.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, res) =>
      s"${ev.value} = graft.cell.CellIndex.encode($lon, $lat, $res);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `zcell_parent(cell, res, parentRes) -> bigint` — bit-truncation parent. */
case class ZCellParent(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zcell_parent"

  override def nullSafeEval(cell: Any, r: Any, r2: Any): Any =
    CellIndex.parent(cell.asInstanceOf[Long], r.asInstanceOf[Int], r2.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cell, r, r2) =>
      s"${ev.value} = $cell >>> (2 * ($r - $r2));")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/**
 * Algebraic cell rewrite, injected as an optimizer rule:
 * `zcell_parent(zcell(lon, lat, r), r, r2)  →  zcell(lon, lat, r2)`.
 *
 * Exact because bit-truncating the interleave commutes with encoding:
 * `floor(x·2^r) >> (r−r2) = floor(x·2^r2)` per axis (nested floor
 * division), clamps included, and dropping 2·(r−r2) interleaved bits is
 * exactly the interleave of the per-axis truncations. After Catalyst's
 * projection collapse, a pipeline that derives a coarse routing cell from
 * a fine cell it doesn't keep (mapping/projection stages, T7/T8) encodes
 * ONCE at the coarse resolution instead of encode-then-truncate.
 * CellIndexSpec pins both the algebra (property over the domain) and the
 * plan rewrite.
 */
object CellAlgebraRule extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, GreaterThanOrEqual, LessThanOrEqual}

  /** `parent(c, r, r2) = p  ⟺  p·2^(2Δ) ≤ c ≤ (p+1)·2^(2Δ) − 1` for the
    * non-negative interleaved cell domain (Δ = r − r2; ids use ≤ 60 bits so
    * the shifts cannot overflow). */
  private def parentEqToRange(c: Expression, r: Int, r2: Int, p: Long): Expression = {
    val d = 2 * (r - r2)
    And(GreaterThanOrEqual(c, Literal(p << d)),
      LessThanOrEqual(c, Literal(((p + 1) << d) - 1)))
  }

  /** Both rewrites only fire on the valid resolution ladder. */
  private def validRes(r: Int, r2: Int): Boolean = r2 >= 1 && r2 <= r && r <= 30

  /** …and the sargable form additionally needs the parent literal inside
    * the r2-domain: p outside [0, 4^r2) can never equal a parent (the
    * original predicate is constant-false on non-null input), and the
    * shifted bounds would overflow Long — leave such predicates alone. */
  private def validParent(p: Long, r2: Int): Boolean = p >= 0 && p < (1L << (2 * r2))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ZCellParent(ZCellEncode(lon, lat, Literal(r: Int, IntegerType)),
        Literal(r1: Int, IntegerType), rl2 @ Literal(r2: Int, IntegerType))
        if r == r1 && validRes(r, r2) =>
      ZCellEncode(lon, lat, rl2)
    // SARGABLE rewrite: an equality on a cell's PARENT becomes a range on
    // the stored fine cell — parquet min/max stats (and the snapshot
    // table's manifest bounds) cannot see through the shift expression,
    // but a plain range on the column reaches PushedFilters at the scan.
    case EqualTo(ZCellParent(c, Literal(r: Int, IntegerType), Literal(r2: Int, IntegerType)),
        Literal(p: Long, LongType)) if validRes(r, r2) && validParent(p, r2) =>
      parentEqToRange(c, r, r2, p)
    case EqualTo(Literal(p: Long, LongType),
        ZCellParent(c, Literal(r: Int, IntegerType), Literal(r2: Int, IntegerType)))
        if validRes(r, r2) && validParent(p, r2) =>
      parentEqToRange(c, r, r2, p)
  }
}

/** Session registration + Column-facing API for the cell expressions. */
object CellFunctions {

  /** Register zcell/zcell_parent in the session's FunctionRegistry so both
    * SQL text and `call_function` can reach them, and inject
    * [[CellAlgebraRule]] into the optimizer. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("zcell", es => ZCellEncode(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("zcell_parent", es => ZCellParent(es(0), es(1), es(2)), "built-in")
    if (!spark.experimental.extraOptimizations.contains(CellAlgebraRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CellAlgebraRule
  }

  def zcell(lon: Column, lat: Column, res: Column): Column =
    call_function("zcell", lon, lat, res)

  def zcellParent(cell: Column, res: Column, parentRes: Column): Column =
    call_function("zcell_parent", cell, res, parentRes)
}

/**
 * Native (codegen'd) slippy-tile coordinates — identical to the scalar
 * [[CellIndex.tileX]]/[[CellIndex.tileY]] on the geographic domain
 * (lat ∈ [−90, 90], any finite lon; identical `java.lang.Math`
 * log/tan/cos/toRadians calls in the same IEEE evaluation order), but as
 * pure Column expressions: the former Scala-UDF versions broke the
 * whole-stage-codegen span right inside the headline job's hottest loop
 * (serialize row → box doubles → invoke → unbox, per point). `z` may be a
 * literal or a genuine column (the tile-pyramid zoom explode).
 *
 * Edge handling (review finding): Spark's `log` returns NULL where
 * `Math.log` returns ±Infinity (the Mercator singularity at the exact
 * poles), so tileY coalesces the log term to Double.MinValue (the most
 * negative finite double), which drives v positive-huge and clamps to the
 * bottom tile row — the row the scalar's +Infinity path clamps to. Both
 * clamps run in DOUBLE space BEFORE the long cast so ANSI mode can never
 * overflow-error. OUTSIDE the geographic domain (|lat| > 90, where
 * tan+sec goes negative) the scalar's Math.log returns NaN → row 0 while
 * Spark's log returns NULL → bottom row: feed this only validated
 * latitudes, as every caller in the engine does. A NULL input coordinate
 * propagates to a NULL tile index (round-4 ADVICE: the coalesce used to
 * swallow a NULL lat into a clamped row; the isNotNull gates restore the
 * former UDF path's null semantics without breaking codegen).
 */
object TileCols {

  private def nOf(z: Column): Column =
    call_function("shiftleft", lit(1L), z.cast("int"))

  private def clampIdx(idx: Column, n: Column): Column =
    least(greatest(idx, lit(0.0)), (n - 1).cast("double")).cast("long")

  def tileX(lon: Column, z: Column): Column = {
    val n = nOf(z)
    when(lon.isNotNull, clampIdx(floor((lon + 180.0) / 360.0 * n), n))
  }

  def tileY(lat: Column, z: Column): Column = {
    val n = nOf(z)
    val rad = radians(lat)
    // log(x<=0) -> NULL in Spark, -Inf in Math.log: the scalar path's
    // v=+Inf clamps to the bottom row, so coalesce to Double.MinValue here
    val v = (lit(1.0) -
      coalesce(log(tan(rad) + lit(1.0) / cos(rad)), lit(Double.MinValue)) / lit(math.Pi)) / lit(2.0)
    when(lat.isNotNull, clampIdx(floor(v * n), n))
  }
}
