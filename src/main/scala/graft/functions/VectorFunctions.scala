package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the hot vector kernel: exact integer dot
  * product over two ArrayType(LongType) columns.
  *
  * Why a custom Expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions evaluate their lambda per element through the
  * expression interpreter — fine for a handful of rows, but a pairwise
  * similarity join evaluates millions of 64-element dots, where the
  * interpreter overhead dominates. This expression participates in
  * whole-stage codegen ([[LongDotProduct.doGenCode]]) as a tight primitive
  * loop — the preference order from SURVEY §2.10: native codegen Expression
  * over UDF over interpreted lambdas.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_dot requires two ARRAY<BIGINT> arguments, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var k = 0
    while (k < n) { acc += x.getLong(k) * y.getLong(k); k += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $k = 0; $k < $n; $k++) {
         |  $acc += $a.getLong($k) * $b.getLong($k);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration of graft's SQL functions into a session's function
  * registry (idempotent), so `expr("long_dot(a, b)")` parses anywhere.
  */
object GraftFunctions {

  /** Builder for `word_ngrams(tokens, n)` — n must be an integer literal
    * (it is baked into the generated code).
    */
  private[graft] def wordNgramsBuilder(children: Seq[Expression]): Expression =
    children match {
      case Seq(toks, org.apache.spark.sql.catalyst.expressions.Literal(n: Int,
          org.apache.spark.sql.types.IntegerType)) => WordNgrams(toks, n)
      case Seq(toks,
          org.apache.spark.sql.catalyst.expressions.Literal(n: Int,
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.catalyst.expressions.Literal(
            s: org.apache.spark.unsafe.types.UTF8String,
            org.apache.spark.sql.types.StringType)) =>
        WordNgrams(toks, n, s.toString)
      case _ => throw new IllegalArgumentException(
        "word_ngrams(tokens, n[, sep]) requires an integer literal n (and a string literal sep)")
    }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_dot",
      (children: Seq[Expression]) => LongDotProduct(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "latest_row",
      (children: Seq[Expression]) => LatestRow(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      WordNgramsName, wordNgramsBuilder _, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Md5Prefix64Name,
      (children: Seq[Expression]) => Md5Prefix64(children(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      KmvSketchName, kmvSketchBuilder _, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKByName, topKByBuilder _, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BloomBuildName, bloomBuildBuilder _, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BloomMightContainName, bloomMightContainBuilder _, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HeavyHittersName, heavyHittersBuilder _, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_substr_count", multiSubstrCountBuilder _, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash_stats",
      (children: Seq[Expression]) => RollingHashStats(children(0)),
      "built-in")
    // the plan-quality rule travels WITH the functions: without it a
    // session the engine did not build (the driver's Verify/Bench
    // harnesses) plans struct-payload max_by as SortAggregate — measured
    // as two extra per-partition sorts on q17's corpus-sized aggregation
    if (!spark.experimental.extraOptimizations.contains(RewriteMaxByToLatestRow))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteMaxByToLatestRow
    // correctness-neutral here (the user batch runs after scan pushdown,
    // so it cannot prune); the PRUNING wiring is the extensions path
    if (!spark.experimental.extraOptimizations
        .contains(graft.sources.DeriveHiddenDayFilters))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.sources.DeriveHiddenDayFilters
    // delta-MERGE runtime target narrowing (the WriteDelta analog of
    // Spark's ReplaceData-only group filtering) — needs the LAST batch:
    // it matches the post-pushdown DataSourceV2ScanRelation shape
    if (!spark.experimental.extraOptimizations
        .contains(graft.sources.DeltaRuntimeGroupFiltering))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.sources.DeltaRuntimeGroupFiltering
  }

  /** Builder for `multi_substr_count(text, array('p', ...))` — the
    * pattern list must be foldable (it compiles into the Aho-Corasick
    * automaton at construction).
    */
  private[graft] def multiSubstrCountBuilder(children: Seq[Expression]): Expression =
    children match {
      case Seq(text, arr) if arr.foldable &&
          arr.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
        val data = arr.eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val pats = (0 until data.numElements())
          .map(i => data.getUTF8String(i).toString)
        MultiSubstrCount(text, pats)
      case _ => throw new IllegalArgumentException(
        "multi_substr_count(text, array('p', ...)) requires a foldable " +
          "string-array pattern list")
    }

  /** Builder for `top_k_by(value, key, k)` — k must be an integer literal
    * (it bounds the aggregation buffer).
    */
  private[graft] def topKByBuilder(children: Seq[Expression]): Expression =
    children match {
      case Seq(v, c, org.apache.spark.sql.catalyst.expressions.Literal(k: Int,
          org.apache.spark.sql.types.IntegerType)) => TopKBy(v, c, k)
      case _ => throw new IllegalArgumentException(
        "top_k_by(value, key, k) requires an integer literal k")
    }

  /** Builder for `bloom_build(hash, numBits, numHashes)` — the shape
    * literals size the aggregation buffer, so they are part of the
    * function, not per-row inputs.
    */
  private[graft] def bloomBuildBuilder(children: Seq[Expression]): Expression =
    children match {
      case Seq(h,
          org.apache.spark.sql.catalyst.expressions.Literal(m: Int,
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.catalyst.expressions.Literal(k: Int,
            org.apache.spark.sql.types.IntegerType)) => BloomBuild(h, m, k)
      case _ => throw new IllegalArgumentException(
        "bloom_build(hash, numBits, numHashes) requires integer literals for the shape")
    }

  /** Builder for `bloom_might_contain(filter, hash, numHashes)`. */
  private[graft] def bloomMightContainBuilder(children: Seq[Expression]): Expression =
    children match {
      case Seq(bits, h,
          org.apache.spark.sql.catalyst.expressions.Literal(k: Int,
            org.apache.spark.sql.types.IntegerType)) => BloomMightContain(bits, h, k)
      case _ => throw new IllegalArgumentException(
        "bloom_might_contain(filter, hash, numHashes) requires an integer literal numHashes")
    }

  /** Builder for `kmv_sketch(hash, k)` — k must be an integer literal (it
    * bounds the aggregation buffer, so it is part of the function, not a
    * per-row input).
    */
  private[graft] def kmvSketchBuilder(children: Seq[Expression]): Expression =
    children match {
      case Seq(h, org.apache.spark.sql.catalyst.expressions.Literal(k: Int,
          org.apache.spark.sql.types.IntegerType)) => KmvSketch(h, k)
      case _ => throw new IllegalArgumentException(
        "kmv_sketch(hash, k) requires an integer literal k")
    }

  /** Builder for `heavy_hitters(item, m)` — m must be an integer literal
    * (it bounds the aggregation buffer).
    */
  private[graft] def heavyHittersBuilder(children: Seq[Expression]): Expression =
    children match {
      case Seq(item, org.apache.spark.sql.catalyst.expressions.Literal(m: Int,
          org.apache.spark.sql.types.IntegerType)) => HeavyHitters(item, m)
      case _ => throw new IllegalArgumentException(
        "heavy_hitters(item, m) requires an integer literal m")
    }

  /** Spark-side name for the registered dot kernel. */
  val LongDotName = "long_dot"
  /** Spark-side name for the registered argmax aggregate. */
  val LatestRowName = "latest_row"
  /** Spark-side name for the registered n-gram generator. */
  val WordNgramsName = "word_ngrams"
  /** Spark-side name for the registered 60-bit md5-prefix id. */
  val Md5Prefix64Name = "md5_prefix64"
  /** Spark-side name for the registered KMV distinct sketch aggregate. */
  val KmvSketchName = "kmv_sketch"
  /** Spark-side name for the registered bounded top-k aggregate. */
  val TopKByName = "top_k_by"
  /** Spark-side name for the registered Bloom-filter build aggregate. */
  val BloomBuildName = "bloom_build"
  /** Spark-side name for the registered Bloom membership probe. */
  val BloomMightContainName = "bloom_might_contain"
  /** Spark-side name for the registered Misra-Gries frequent-items aggregate. */
  val HeavyHittersName = "heavy_hitters"
}
