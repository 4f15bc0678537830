package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup / similarity hot paths.
  *
  * Each `doGenCode` emits a single static call into [[HashOps]], so the
  * expression participates in whole-stage codegen (one JVM call per row)
  * instead of falling back to the interpreted per-element lambda evaluation
  * that `transform`/`aggregate` chains pay. Preference order per the design
  * brief: built-ins < native Expression < UDF — these are the (b) tier,
  * used only where built-ins genuinely interpret per element.
  *
  * Reference coverage: MinHash/SimHash/Jaccard implement the near-dedup
  * north-star ops (SURVEY.md §2 H); cosine implements embedding similarity.
  */
object GraftExpressions {

  private val LongArray = ArrayType(LongType, containsNull = false)

  case class ShingleHashesExpr(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongArray
    override def prettyName: String = "shingle_hashes"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.shingleHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.shingleHashes($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
      copy(child = newChild)
  }

  /** Positional word k-gram hashes (document order, duplicates kept). */
  case class KgramHashesExpr(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongArray
    override def prettyName: String = "kgram_hashes"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.kgramHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.kgramHashes($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): KgramHashesExpr =
      copy(child = newChild)
  }

  case class MinHashSigExpr(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongArray
    override def prettyName: String = "minhash_sig"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.minhash(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.minhash($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
      copy(child = newChild)
  }

  case class BandHashesExpr(child: Expression, bands: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongArray
    override def prettyName: String = "band_hashes"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.bandHashes(input.asInstanceOf[ArrayData], bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.bandHashes($c, $bands)")
    override protected def withNewChildInternal(newChild: Expression): BandHashesExpr =
      copy(child = newChild)
  }

  case class JaccardSortedExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_sorted"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      HashOps.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.HashOps.jaccardSorted($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedExpr =
      copy(left = l, right = r)
  }

  case class SimHash64Expr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.simhash(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.simhash($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
      copy(child = newChild)
  }

  case class RollingHashExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.rollingHash(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.rollingHash($c)")
    override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
      copy(child = newChild)
  }

  case class LongDotExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    // ArrayData.getLong on an int/double array silently reads garbage, so
    // anything but array<bigint> must fail at ANALYSIS, not produce values
    override def inputTypes: Seq[DataType] = Seq(LongArray, LongArray)
    override def dataType: DataType = LongType
    override def prettyName: String = "long_dot"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      HashOps.longDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.HashOps.longDot($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDotExpr =
      copy(left = l, right = r)
  }

  case class CosineSimFExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_f"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      HashOps.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.HashOps.cosineF($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimFExpr =
      copy(left = l, right = r)
  }

  /** Random-hyperplane LSH bucket id; `planes` is row-major (nBits × dim),
    * shipped to executors as a codegen reference object (not inlined source).
    */
  case class HyperplaneBucketExpr(child: Expression, planes: Array[Double], nBits: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_bucket"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.hyperplaneBucket(input.asInstanceOf[ArrayData], planes, nBits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", planes, "double[]")
      defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.hyperplaneBucket($c, $ref, $nBits)")
    }
    override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
      copy(child = newChild)
  }

  /** Feature-hashed shingle embedding of text (L2-normalized binary
    * presence vector, `dim` floats).
    */
  case class EmbedShinglesExpr(child: Expression, n: Int, dim: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def prettyName: String = "embed_shingles"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.embedShingles(input.asInstanceOf[UTF8String], n, dim)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.embedShingles($c, $n, $dim)")
    override protected def withNewChildInternal(newChild: Expression): EmbedShinglesExpr =
      copy(child = newChild)
  }

  /** All banded hyperplane-LSH buckets in one pass (array of `bands` ids). */
  case class HyperplaneBucketsExpr(child: Expression, planes: Array[Double],
      nBits: Int, bands: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "hyperplane_buckets"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.hyperplaneBuckets(input.asInstanceOf[ArrayData], planes, nBits, bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", planes, "double[]")
      defineCodeGen(ctx, ev,
        c => s"graft.expressions.HashOps.hyperplaneBuckets($c, $ref, $nBits, $bands)")
    }
    override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
      copy(child = newChild)
  }

  /** IVF cell assignment against a constant centroid matrix (row-major,
    * k × dim, L2-normalized for cosine ranking).
    */
  case class NearestCellExpr(child: Expression, cents: Array[Double], k: Int)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "ivf_nearest_cell"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.nearestCell(input.asInstanceOf[ArrayData], cents, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cents", cents, "double[]")
      defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.nearestCell($c, $ref, $k)")
    }
    override protected def withNewChildInternal(newChild: Expression): NearestCellExpr =
      copy(child = newChild)
  }

  /** Top-nprobe IVF probe cells for a query vector. */
  case class NearCellsExpr(child: Expression, cents: Array[Double], k: Int, nprobe: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "ivf_near_cells"
    override protected def nullSafeEval(input: Any): Any =
      HashOps.nearCells(input.asInstanceOf[ArrayData], cents, k, nprobe)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cents", cents, "double[]")
      defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.nearCells($c, $ref, $k, $nprobe)")
    }
    override protected def withNewChildInternal(newChild: Expression): NearCellsExpr =
      copy(child = newChild)
  }

  /** Custom Catalyst GENERATOR (the UDTF extension class, SURVEY §2 H):
    * one row per adjacent non-empty word pair of `text`, straight off the
    * string — no intermediate word array or struct array materializes per
    * row, unlike the equivalent `split` + `zip_with(slice, slice)` +
    * `explode` chain. The analyzer's ExtractGenerator rule plans it as a
    * Generate node wherever it appears in a projection, exactly like the
    * built-in `explode`.
    */
  case class WordBigramsExpr(child: Expression)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.Generator
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def elementSchema: StructType = StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false)))
    override def prettyName: String = "word_bigrams"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
        : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
      val v = child.eval(input)
      if (v == null) Iterator.empty
      else {
        val words = v.asInstanceOf[UTF8String].toString.split(' ')
        (0 until words.length - 1).iterator
          .filter(i => words(i).nonEmpty && words(i + 1).nonEmpty)
          .map(i => org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromString(words(i)), UTF8String.fromString(words(i + 1))))
      }
    }
    override protected def withNewChildInternal(newChild: Expression): WordBigramsExpr =
      copy(child = newChild)
  }

  /** Multi-width positional k-gram generator: rows `(n, pos, h)` for every
    * width in `ns`, per-width hash-identical to [[KgramHashesExpr]] but off
    * ONE tokenization and — because it is a Generator — ONE table scan where
    * a width sweep would otherwise union |ns| scans of the corpus (t31).
    */
  case class KgramHashesMultiExpr(child: Expression, ns: Seq[Int])
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.Generator
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def elementSchema: StructType = StructType(Seq(
      StructField("n", IntegerType, nullable = false),
      StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false)))
    override def prettyName: String = "kgram_hashes_multi"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
        : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
      val v = child.eval(input)
      if (v == null) Iterator.empty
      else HashOps.kgramHashesMulti(v.asInstanceOf[UTF8String], ns.toArray)
    }
    override protected def withNewChildInternal(newChild: Expression): KgramHashesMultiExpr =
      copy(child = newChild)
  }

  // ---- Column-API surface ----

  /** Z-order curve key of two 31-bit-normalized coordinates (see
    * [[HashOps.interleave31]]); the sort key behind two-dimensional file
    * clustering.
    */
  case class ZOrderExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "zorder"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      HashOps.interleave31(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.HashOps.interleave31($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderExpr =
      copy(left = l, right = r)
  }

  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** Sorted distinct xxhash64 word n-gram shingles of `text`. */
  def shingleHashes(text: Column, n: Int): Column = col(ShingleHashesExpr(expr(text), n))

  /** Positional word k-gram hashes (order-preserving, duplicates kept). */
  def kgramHashes(text: Column, n: Int): Column = col(KgramHashesExpr(expr(text), n))

  /** k-minhash signature of a shingle-hash array. */
  def minhashSig(shingles: Column, k: Int): Column = col(MinHashSigExpr(expr(shingles), k))

  /** LSH band bucket keys of a minhash signature. */
  def bandHashes(sig: Column, bands: Int): Column = col(BandHashesExpr(expr(sig), bands))

  /** Exact Jaccard of two sorted distinct long arrays. */
  def jaccardSorted(a: Column, b: Column): Column = col(JaccardSortedExpr(expr(a), expr(b)))

  /** 64-bit SimHash of whitespace-tokenized text. */
  def simhash64(text: Column): Column = col(SimHash64Expr(expr(text)))

  /** Order-sensitive rolling-hash fingerprint of whitespace-tokenized text. */
  def rollingHash(text: Column): Column = col(RollingHashExpr(expr(text)))

  /** Exact cosine similarity of two float vectors (double accumulation). */
  def cosineF(a: Column, b: Column): Column = col(CosineSimFExpr(expr(a), expr(b)))

  /** Exact dot product of two long arrays (codegen'd; replaces the
    * interpreted aggregate(zip_with(...)) fold on quantized vectors). */
  def longDot(a: Column, b: Column): Column = col(LongDotExpr(expr(a), expr(b)))

  /** Random-hyperplane LSH bucket of a float vector. */
  def hyperplaneBucket(v: Column, planes: Array[Double], nBits: Int): Column =
    col(HyperplaneBucketExpr(expr(v), planes, nBits))

  /** All banded hyperplane-LSH buckets of a float vector in one pass. */
  def hyperplaneBuckets(v: Column, planes: Array[Double], nBits: Int, bands: Int): Column =
    col(HyperplaneBucketsExpr(expr(v), planes, nBits, bands))

  /** Feature-hashed n-gram shingle embedding of text (dim floats, L2=1). */
  def embedShingles(text: Column, n: Int, dim: Int): Column =
    col(EmbedShinglesExpr(expr(text), n, dim))

  /** IVF cell id of a float vector (argmax centroid dot). */
  def ivfCell(v: Column, cents: Array[Double], k: Int): Column =
    col(NearestCellExpr(expr(v), cents, k))

  /** Top-nprobe IVF probe cells of a query vector. */
  def ivfProbeCells(v: Column, cents: Array[Double], k: Int, nprobe: Int): Column =
    col(NearCellsExpr(expr(v), cents, k, nprobe))

  /** Generator: one (w1, w2) row per adjacent non-empty word pair. */
  def wordBigrams(text: Column): Column = col(WordBigramsExpr(expr(text)))

  /** Generator: (n, pos, h) k-gram hash rows for every width in `ns`. */
  def kgramHashesMulti(text: Column, ns: Seq[Int]): Column =
    col(KgramHashesMultiExpr(expr(text), ns))

  /** Morton (Z-order) interleave of two 31-bit-normalized long columns. */
  def zorder(x: Column, y: Column): Column = col(ZOrderExpr(expr(x), expr(y)))
}
