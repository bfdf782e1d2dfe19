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

/** Native Catalyst expression for q28's polynomial rolling-hash kernel:
  * `rolling_hash_stats(text)` returns
  * `struct<full_hash BIGINT, min_gram_hash BIGINT, n_chars BIGINT>` in one
  * tight pass over the string's code points — the whole-document hash
  * h = fold((acc*31 + code) mod p), the MINIMUM 8-codepoint-gram rolling
  * hash (winnowing min-fingerprint; NULL below 8 code points), and the
  * code-point count.
  *
  * Why it exists: the SQL formulation (kept verbatim in the oracle)
  * materializes a BIGINT code array per document — once per consuming
  * column after projection collapse — and re-folds every 8-gram from
  * scratch through the interpreted higher-order-function evaluator:
  * O(9n) interpreted lambda dispatches plus ~24 bytes/char of transient
  * arrays per row, measured as the q28 32-core anti-scaling cliff
  * (allocation pressure scales with concurrent tasks). Here: one loop,
  * four longs and an 8-slot ring buffer, zero per-char allocation.
  *
  * SEMANTICS GUARD — must equal the SQL exactly:
  *  - iteration is per CODE POINT (Spark's `length`/`substring`/`ascii`
  *    all operate on code points, surrogate pairs included);
  *  - the gram hash slides: H(c[i-7..i]) = (H(c[i-8..i-1])*31 + c[i]
  *    - c[i-8]*31^8) mod p with 31^8 mod 1000000007 = 891031477 and
  *    floor-mod for the subtraction — every window value is the same
  *    residue in [0, p) the slice-refold produces;
  *  - NULL/empty text yields (0, NULL, 0), the fold-over-empty-array
  *    seeds of the SQL shape (never a NULL row).
  * CodegenFallback like [[MultiSubstrCount]]: the eval is one primitive
  * loop; fusing it into generated Java buys nothing measurable.
  */
case class RollingHashStats(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash_stats requires STRING, got ${other.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("full_hash",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("min_gram_hash",
      org.apache.spark.sql.types.LongType, nullable = true),
    org.apache.spark.sql.types.StructField("n_chars",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "rolling_hash_stats"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) RollingHashStats.empty
    else RollingHashStats.compute(v.asInstanceOf[UTF8String])
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashStats =
    copy(child = newChild)
}

object RollingHashStats {
  private val P = 1000000007L
  private val Pow8 = 891031477L // 31^8 mod P

  private[functions] def empty =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, null, 0L))

  private[functions] def compute(u: UTF8String): Any = {
    val s = u.toString
    val len = s.length
    if (len == 0) return empty
    var full = 0L
    var win = 0L
    var mg = Long.MaxValue
    var n = 0L // code points processed
    val ring = new Array[Long](8) // ring(j % 8) holds code point j-8
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      full = (full * 31L + cp) % P
      if (n < 8L) win = (win * 31L + cp) % P
      else {
        val x = (win * 31L + cp - ring((n % 8L).toInt) * Pow8) % P
        win = if (x < 0L) x + P else x
      }
      ring((n % 8L).toInt) = cp
      n += 1L
      if (n >= 8L && win < mg) mg = win
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](full, if (n >= 8L) java.lang.Long.valueOf(mg) else null, n))
  }
}
