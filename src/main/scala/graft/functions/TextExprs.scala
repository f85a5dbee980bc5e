package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.ext.TextHashing

/** Native Catalyst expressions for the dedup / similarity / fingerprint
  * operators (SURVEY.md §2.8, §7.3): each is a single static call into
  * graft.ext.TextHashing from generated code, so the operators stay inside
  * whole-stage codegen (no UDF boxing, no closure serialization).
  */
object TextExprs {

  case class MinHashSig(child: Expression, k: Int, shingleN: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashing.minhashArrayData(input.asInstanceOf[UTF8String], k, shingleN)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.ext.TextHashing.minhashArrayData($c, $k, $shingleN)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  case class BandHashes(child: Expression, bands: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashing.bandHashes(input.asInstanceOf[ArrayData], bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.TextHashing.bandHashes($c, $bands)")
    override protected def withNewChildInternal(newChild: Expression): BandHashes =
      copy(child = newChild)
  }

  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      TextHashing.simhash64(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.TextHashing.simhash64($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  case class WinnowSig(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashing.winnowFingerprints(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.ext.TextHashing.winnowFingerprints($c, $k, $w)")
    override protected def withNewChildInternal(newChild: Expression): WinnowSig =
      copy(child = newChild)
  }

  /** Multiset of word-n-gram hashes in document order (zero for docs with
    * fewer than n tokens) — the dup-span unit; see
    * [[graft.ext.TextHashing.gramHashArray]]. */
  case class GramHashes(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashing.gramHashArray(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.ext.TextHashing.gramHashArray($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): GramHashes =
      copy(child = newChild)
  }

  case class SortedShingles(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashing.sortedShingleHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.ext.TextHashing.sortedShingleHashes($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): SortedShingles =
      copy(child = newChild)
  }

  /** Morton/Z-order interleave of two non-negative long columns — the
    * clustering key behind writeZOrdered (see ext.ZOrder). */
  case class ZOrderKey(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      graft.ext.ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.ext.ZOrder.interleave($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ZOrderKey = copy(left = l, right = r)
  }

  /** Membership probe against a pre-built Bloom filter of 64-bit gram
    * hashes. The filter is a trained (bounded, mergeable) sketch shipped
    * into generated code as a reference object — the decontamination
    * filter touches no join, no shuffle: a map-only mightContain per gram
    * (false positives at the sketch's fpp; false negatives impossible). */
  case class BloomContains(child: Expression,
                           bloom: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      bloom.mightContainLong(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bloom,
        "org.apache.spark.util.sketch.BloomFilter")
      defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomContains =
      copy(child = newChild)
  }

  /** Point estimate against a trained count-min sketch (the frequency
    * analogue of [[BloomContains]]): the 64 KB counter array ships into
    * generated code as a reference object, so estimation is map-only —
    * no join against a frequency table. */
  case class CountMinEstimate(child: Expression, sketch: Array[Long],
                              depth: Int, width: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      CountMinAgg.estimate(sketch, input.asInstanceOf[Long], depth, width)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cmSketch", sketch, "long[]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.CountMinAgg.estimate($ref, $c, $depth, $width)")
    }
    override protected def withNewChildInternal(newChild: Expression): CountMinEstimate =
      copy(child = newChild)
  }

  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashing.repetitionStats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.TextHashing.repetitionStats($c)")
    override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
      copy(child = newChild)
  }

  case class ArrayJaccard(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextHashing.sortedArrayJaccard(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.ext.TextHashing.sortedArrayJaccard($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ArrayJaccard = copy(left = l, right = r)
  }

  case class NgramJaccard(left: Expression, right: Expression, n: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextHashing.ngramJaccard(
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.ext.TextHashing.ngramJaccard($a, $b, $n)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): NgramJaccard = copy(left = l, right = r)
  }

  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextHashing.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.ext.TextHashing.cosineFloat($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
  }

  /** IVF cell assignment: nearest `nProbe` coarse-quantizer cells by
    * cosine. Centroids are a (small) trained model, shipped into codegen
    * as a reference object — no join against a centroid table per row. */
  case class NearestCells(child: Expression, centroids: Array[Array[Float]],
                          nProbe: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashing.nearestCells(input.asInstanceOf[ArrayData], centroids, nProbe)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
      defineCodeGen(ctx, ev,
        c => s"graft.ext.TextHashing.nearestCells($c, $ref, $nProbe)")
    }
    override protected def withNewChildInternal(newChild: Expression): NearestCells =
      copy(child = newChild)
  }

  case class CosineSimInt8(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextHashing.cosineInt8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.ext.TextHashing.cosineInt8($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CosineSimInt8 = copy(left = l, right = r)
  }

  case class L2Normalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashing.l2NormalizeFloat(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.TextHashing.l2NormalizeFloat($c)")
    override protected def withNewChildInternal(newChild: Expression): L2Normalize =
      copy(child = newChild)
  }

  case class QuantizeInt8(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashing.quantizeInt8(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.TextHashing.quantizeInt8($c)")
    override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
      copy(child = newChild)
  }

  case class QuantizeScale(child: Expression) extends UnaryExpression {
    override def dataType: DataType = FloatType
    override def nullSafeEval(input: Any): Any =
      TextHashing.quantizeScale(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ext.TextHashing.quantizeScale($c)")
    override protected def withNewChildInternal(newChild: Expression): QuantizeScale =
      copy(child = newChild)
  }

  case class HyperplaneBucket(child: Expression, nPlanes: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any =
      TextHashing.hyperplaneBucket(input.asInstanceOf[ArrayData], nPlanes, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.ext.TextHashing.hyperplaneBucket($c, $nPlanes, ${seed}L)")
    override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
      copy(child = newChild)
  }

  // ------------------------------------------------------ Column surface --

  private def e(c: Column): Expression = GraftExprBridge.expression(c)
  private def col(x: Expression): Column = GraftExprBridge.column(x)

  def minhash_sig(c: Column, k: Int = 128, shingleN: Int = 3): Column =
    col(MinHashSig(e(c), k, shingleN))
  def band_hashes(c: Column, bands: Int = 32): Column =
    col(BandHashes(e(c), bands))
  def simhash(c: Column): Column = col(SimHash64(e(c)))
  def winnow_sig(c: Column, k: Int = 9, w: Int = 12): Column =
    col(WinnowSig(e(c), k, w))
  def ngram_jaccard(a: Column, b: Column, n: Int = 3): Column =
    col(NgramJaccard(e(a), e(b), n))
  def sorted_shingles(c: Column, n: Int = 3): Column =
    col(SortedShingles(e(c), n))
  def gram_hashes(c: Column, n: Int = 5): Column =
    col(GramHashes(e(c), n))
  def repetition_stats(c: Column): Column = col(RepetitionStats(e(c)))
  def countmin_estimate(c: Column, sketch: Array[Long],
                        depth: Int, width: Int): Column =
    col(CountMinEstimate(e(c), sketch, depth, width))
  def bloom_contains(c: Column,
                     bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    col(BloomContains(e(c), bloom))
  def zorder_key(a: Column, b: Column): Column = col(ZOrderKey(e(a), e(b)))
  def array_jaccard(a: Column, b: Column): Column =
    col(ArrayJaccard(e(a), e(b)))
  def cosine_sim(a: Column, b: Column): Column = col(CosineSim(e(a), e(b)))
  def l2_normalize(c: Column): Column = col(L2Normalize(e(c)))
  def cosine_sim_int8(a: Column, b: Column): Column =
    col(CosineSimInt8(e(a), e(b)))
  def quantize_int8(c: Column): Column = col(QuantizeInt8(e(c)))
  def quantize_scale(c: Column): Column = col(QuantizeScale(e(c)))
  def hyperplane_bucket(c: Column, nPlanes: Int = 16, seed: Long = 42L): Column =
    col(HyperplaneBucket(e(c), nPlanes, seed))
  def nearest_cells(c: Column, centroids: Array[Array[Float]], nProbe: Int): Column =
    col(NearestCells(e(c), centroids, nProbe))

  /** Expose the expression family to SQL (`SELECT simhash64(text) …`). */
  def registerSql(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_sig",
      xs => MinHashSig(xs.head, 128, 3), "internal")
    reg.createOrReplaceTempFunction("simhash64",
      xs => SimHash64(xs.head), "internal")
    reg.createOrReplaceTempFunction("ngram_jaccard",
      xs => NgramJaccard(xs(0), xs(1), 3), "internal")
    reg.createOrReplaceTempFunction("cosine_sim",
      xs => CosineSim(xs(0), xs(1)), "internal")
    reg.createOrReplaceTempFunction("winnow_sig",
      xs => WinnowSig(xs.head, 9, 12), "internal")
    reg.createOrReplaceTempFunction("sorted_shingles",
      xs => SortedShingles(xs.head, 3), "internal")
    reg.createOrReplaceTempFunction("gram_hashes",
      xs => GramHashes(xs.head, 5), "internal")
    reg.createOrReplaceTempFunction("array_jaccard",
      xs => ArrayJaccard(xs(0), xs(1)), "internal")
    reg.createOrReplaceTempFunction("repetition_stats",
      xs => RepetitionStats(xs.head), "internal")
    reg.createOrReplaceTempFunction("l2_normalize",
      xs => L2Normalize(xs.head), "internal")
    reg.createOrReplaceTempFunction("quantize_int8",
      xs => QuantizeInt8(xs.head), "internal")
    reg.createOrReplaceTempFunction("quantize_scale",
      xs => QuantizeScale(xs.head), "internal")
  }
}
