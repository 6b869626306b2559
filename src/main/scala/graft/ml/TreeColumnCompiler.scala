package graft.ml

import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles a TRAINED Spark ML tree ensemble into Catalyst Column
  * algebra: each decision tree becomes a nested `when`/`otherwise`
  * chain, the ensemble a weighted sum.
  *
  * Why not `model.transform`? Scoring with the ML pipeline means a
  * VectorAssembler + a non-codegen predict UDF per row — exactly the
  * per-row interpreter overhead a 100 TB map stage cannot afford.
  * Compiled columns stay inside whole-stage codegen, broadcast nothing
  * (the model is baked into the plan as literals), and compose with
  * any downstream predicate. Training remains a distributed one-off
  * Spark ML fit; only the frozen model crosses into the plan.
  *
  * Split semantics mirror `Split.shouldGoLeft` exactly: continuous →
  * left iff value <= threshold; categorical → left iff the value is in
  * `leftCategories`. Null inputs must be imputed by the caller's
  * feature accessor (the ML pipeline would have thrown on them).
  */
object TreeColumnCompiler {

  /** One tree as a nested CASE WHEN over `features(i)` accessors. */
  def compileNode(node: Node, features: Int => Column): Column = node match {
    case leaf: LeafNode => lit(leaf.prediction)
    case in: InternalNode =>
      val goLeft = in.split match {
        case cs: ContinuousSplit =>
          features(cs.featureIndex) <= lit(cs.threshold)
        case cat: CategoricalSplit =>
          features(cat.featureIndex).isin(cat.leftCategories.toSeq: _*)
      }
      when(goLeft, compileNode(in.leftChild, features))
        .otherwise(compileNode(in.rightChild, features))
  }

  /** GBT margin: Σ_m weight_m · tree_m(x). */
  def gbtRawScore(model: GBTClassificationModel,
      features: Int => Column): Column =
    model.trees.zip(model.treeWeights).map { case (t, w) =>
      compileNode(t.rootNode, features) * lit(w)
    }.reduce(_ + _)

  /** Positive-class probability for a logistic-loss GBT:
    * 1 / (1 + e^(−2·raw)) — the same map `GBTClassificationModel`
    * applies in `raw2probabilityInPlace`.
    */
  def gbtProbability(model: GBTClassificationModel,
      features: Int => Column): Column =
    lit(1.0) / (lit(1.0) + exp(lit(-2.0) * gbtRawScore(model, features)))
}
