package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: register graft's native expressions with a
  * session, either declaratively
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or imperatively via
  * [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarityDescriptor)
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
    ext.injectFunction(GraftExtensions.dmlKeyDescriptor)
    ext.injectFunction(GraftExtensions.polyFingerprintDescriptor)
    ext.injectFunction(GraftExtensions.cdcChunksDescriptor)
    ext.injectFunction(GraftExtensions.pqEncodeDescriptor)
    ext.injectFunction(GraftExtensions.adcScoreDescriptor)
    ext.injectFunction(GraftExtensions.adcTableDescriptor)
    ext.injectFunction(GraftExtensions.bpeApplyDescriptor)
    ext.injectFunction(GraftExtensions.topKPairsDescriptor)
  }
}

object GraftExtensions {
  private[graft] val cosineSimilarityDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_similarity takes exactly 2 arguments")
      CosineSimilarity(children.head, children.last)
    })

  private[graft] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "dot_product takes exactly 2 arguments")
      DotProduct(children.head, children.last)
    })

  private[graft] val dmlKeyDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dml_key"),
    new ExpressionInfo(classOf[DmlKey].getName, "dml_key"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "dml_key takes exactly 1 argument")
      DmlKey(children.head)
    })

  private[graft] val polyFingerprintDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poly_fingerprint"),
    new ExpressionInfo(classOf[PolyFingerprint].getName, "poly_fingerprint"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "poly_fingerprint takes exactly 1 argument")
      PolyFingerprint(children.head)
    })

  private[graft] val cdcChunksDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cdc_chunks"),
    new ExpressionInfo(classOf[CdcBoundaries].getName, "cdc_chunks"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "cdc_chunks takes exactly 1 argument")
      CdcBoundaries(children.head)
    })

  private[graft] val pqEncodeDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_encode"),
    new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "pq_encode takes exactly 2 arguments")
      PqEncode(children.head, children.last)
    })

  private[graft] val adcScoreDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("adc_score"),
    new ExpressionInfo(classOf[AdcScore].getName, "adc_score"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "adc_score takes exactly 2 arguments")
      AdcScore(children.head, children.last)
    })

  private[graft] val adcTableDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("adc_table"),
    new ExpressionInfo(classOf[AdcTable].getName, "adc_table"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "adc_table takes exactly 2 arguments")
      AdcTable(children.head, children.last)
    })

  private[graft] val bpeApplyDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bpe_apply"),
    new ExpressionInfo(classOf[BpeApply].getName, "bpe_apply"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "bpe_apply takes exactly 2 arguments")
      BpeApply(children.head, children.last)
    })

  private[graft] val topKPairsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("top_k_pairs"),
    new ExpressionInfo(classOf[TopKPairs].getName, "top_k_pairs"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "top_k_pairs takes exactly 3 arguments")
      TopKPairs(children(0), children(1), children(2))
    })

  /** Imperative registration on an existing session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(cosineSimilarityDescriptor, dotProductDescriptor, dmlKeyDescriptor,
        polyFingerprintDescriptor, cdcChunksDescriptor, pqEncodeDescriptor,
        adcScoreDescriptor, adcTableDescriptor, bpeApplyDescriptor,
        topKPairsDescriptor).foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
