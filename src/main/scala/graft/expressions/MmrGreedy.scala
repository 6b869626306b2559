package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types._

/** Native kernel for the FULL Maximal-Marginal-Relevance greedy trace
  * of one query: given that query's candidate list and candidate-pair
  * similarities (both rank-bounded by the MMR contract — top-C
  * retrieval output, never the corpus), unroll all `k` greedy rounds
  * in one pass and return the picks in pick order.
  *
  * Why an expression and not a driver loop (the r14 optimization):
  * MMR is sequential in k but INDEPENDENT ACROSS QUERIES — the right
  * distribution axis is the query, not the round. The k-round driver
  * loop paid, per round, a penalty join + windowed argmax + two eager
  * localCheckpoint jobs — 98 Spark jobs and ~3.3 s at gate scale for
  * k = 5, nearly all scheduler latency on rank-bounded relations.
  * This kernel runs the identical arithmetic (exact integer
  * mmr_pts = lamNum·rel − lamDen·maxSim, ties to the smallest did;
  * penalty 0 when no selected pair row exists — the left-join
  * coalesce convention) per GROUP in a single map stage: one
  * collect_list aggregation per input relation, one explode, no
  * per-round jobs. At a million queries that is one shuffle of
  * rank-bounded rows instead of k driver-sequenced rounds.
  *
  * Inputs: `cand` array<struct<did, rel_micro>>, `sims`
  * array<struct<did_a, did_b, sim_micro>> (both directions, as the
  * gate's self-join emits them; an empty array = no penalty
  * evidence). Output: array<struct<did, rel_micro, mmr_pts, pick>>
  * ordered by pick (1-based); fewer than k entries when candidates
  * run out. Collection order of either array is irrelevant: the
  * kernel sorts candidates by did before the greedy loop, so the
  * result is deterministic under any collect_list order.
  */
case class MmrGreedy(left: Expression, right: Expression,
    k: Int, lamNum: Long, lamDen: Long) extends BinaryExpression {

  override def prettyName: String = "mmr_greedy"

  override def dataType: DataType = MmrGreedy.outType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(StructType(Array(
            StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _),
          ArrayType(StructType(Array(
            StructField(_, LongType, _, _), StructField(_, LongType, _, _),
            StructField(_, LongType, _, _))), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<long,long>>, " +
        s"array<struct<long,long,long>>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(c: Any, s: Any): Any =
    MmrGreedy.compute(c.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], k, lamNum, lamDen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, s) =>
      s"graft.expressions.MmrGreedy.compute($c, $s, $k, ${lamNum}L, " +
        s"${lamDen}L)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MmrGreedy {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("did", LongType, nullable = false),
    StructField("rel_micro", LongType, nullable = false),
    StructField("mmr_pts", LongType, nullable = false),
    StructField("pick", IntegerType, nullable = false))),
    containsNull = false)

  /** Java-callable kernel (referenced from generated code). */
  def compute(cand: ArrayData, sims: ArrayData, k: Int,
      lamNum: Long, lamDen: Long): ArrayData = {
    val n = cand.numElements()
    val dids = new Array[Long](n)
    val rels = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = cand.getStruct(i, 2)
      dids(i) = row.getLong(0)
      rels(i) = row.getLong(1)
      i += 1
    }
    // deterministic candidate order regardless of collection order
    val order = (0 until n).toArray.sortBy(dids)
    val simMap = new java.util.HashMap[Long,
      java.util.HashMap[Long, java.lang.Long]]()
    val m = sims.numElements()
    var j = 0
    while (j < m) {
      val row = sims.getStruct(j, 3)
      val a = row.getLong(0)
      var inner = simMap.get(a)
      if (inner == null) {
        inner = new java.util.HashMap[Long, java.lang.Long]()
        simMap.put(a, inner)
      }
      inner.put(row.getLong(1), row.getLong(2))
      j += 1
    }
    val picked = new Array[Boolean](n)
    val nPick = math.min(k, n)
    val selected = new Array[Long](nPick)
    var nSel = 0
    val out = new Array[Any](nPick)
    var round = 1
    while (round <= k && nSel < n) {
      var bestIdx = -1
      var bestPts = 0L
      var oi = 0
      while (oi < n) {
        val ci = order(oi)
        if (!picked(ci)) {
          // penalty = max sim to the selected set over EXISTING pair
          // rows; none at all = 0 (the left-join coalesce convention)
          var pen = 0L
          var any = false
          val inner = simMap.get(dids(ci))
          if (inner != null) {
            var si = 0
            while (si < nSel) {
              val v = inner.get(selected(si))
              if (v != null) {
                val sv = v.longValue()
                if (!any || sv > pen) { pen = sv; any = true }
              }
              si += 1
            }
          }
          val pts = lamNum * rels(ci) - lamDen * pen
          // strict > keeps the smallest did on ties (ascending scan)
          if (bestIdx < 0 || pts > bestPts) { bestIdx = ci; bestPts = pts }
        }
        oi += 1
      }
      picked(bestIdx) = true
      selected(nSel) = dids(bestIdx)
      out(nSel) = InternalRow(dids(bestIdx), rels(bestIdx), bestPts, round)
      nSel += 1
      round += 1
    }
    new GenericArrayData(out)
  }

  /** Column-facing constructor; `sims` must be non-null (coalesce an
    * absent pair list to an empty array at the call site).
    */
  def of(cand: Column, sims: Column, k: Int, lamNum: Long,
      lamDen: Long): Column =
    ExpressionBridge.column(MmrGreedy(ExpressionBridge.expression(cand),
      ExpressionBridge.expression(sims), k, lamNum, lamDen))
}
