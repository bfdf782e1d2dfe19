package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for positional word n-grams over a token
  * array: `word_ngrams(tokens, n[, sep])` returns the `size - n + 1`
  * sep-joined n-grams (default separator: space; empty array when the
  * document is shorter than `n`). The separator argument exists for the
  * BPE family, whose MERGED tokens contain spaces — a space-joined pair
  * key would be ambiguous there, so the pair census joins with a
  * character tokens cannot contain (chr(1)).
  *
  * Why not `transform(sequence(...), i -> concat_ws(' ', toks[i], ...))`:
  * higher-order functions run their lambda through the expression
  * interpreter PER ELEMENT — and shingling is the first pass of the whole
  * dedup family (q31/q32/q49/q50), executed for every token of every
  * document. This expression stays inside whole-stage codegen
  * ([[WordNgrams.doGenCode]]): one tight loop, no closure dispatch, no
  * per-element Catalyst eval. Same preference order as [[LongDotProduct]]
  * (SURVEY §2.10): codegen Expression > UDF > interpreted lambdas.
  *
  * Null semantics match the `concat_ws` formulation it replaces: null
  * elements are skipped inside a gram; a null array yields null.
  */
case class WordNgrams(child: Expression, n: Int, sep: String = " ")
    extends UnaryExpression {

  require(n >= 1, s"word_ngrams needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  @transient private lazy val space = UTF8String.fromString(sep)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("sep", space, classOf[UTF8String].getName)
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val u = classOf[UTF8String].getName
      s"""
         |int $m = $a.numElements() - $n + 1;
         |if ($m < 0) $m = 0;
         |$u[] $out = new $u[$m];
         |$u[] $parts = new $u[$n];
         |for (int $i = 0; $i < $m; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.isNullAt($i + $j) ? null : $a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = $u.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Native 60-bit md5-prefix id: `md5_prefix64(s)` computes exactly
  * `CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)` — the shuffle-key
  * idiom of the whole dedup/shingle family — without materializing the
  * 32-char hex string, substringing it, and re-parsing it per row: the top
  * 60 bits are read straight off the digest bytes (first 7 bytes + the
  * high nibble of byte 7 = the first 15 hex nibbles, big-endian — the
  * same value `conv(..., 16, 10)` parses). Equivalence to the composed
  * form is fuzz-pinned in OperatorsSpec, which is what licenses the DuckDB
  * oracles to keep their `('0x' || substr(md5(..), 1, 15))::BIGINT`
  * formulation unchanged.
  *
  * The digest itself is a per-thread reused MessageDigest — the composed
  * form allocates a fresh one per row inside commons-codec, plus the hex
  * string and the parsed substring.
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 requires STRING, got ${other.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5_prefix64"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix64.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix64.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

object Md5Prefix64 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(utf8 bytes), big-endian — static forwarder is
    * called from generated code.
    */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }
}
