package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * The builtin route (`aggregate(zip_with(a,b,*), 0.0, +)`) evaluates
  * higher-order lambdas interpreted — ~40x slower on the all-pairs cosine
  * join. This expression stays inside whole-stage codegen: a tight JIT'd
  * loop over the two ArrayData buffers. Accumulation is left-to-right in
  * index order, bit-identical to the interpreted fold (and to the DuckDB
  * oracle's list_reduce), so swapping it in changes nothing numerically.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs are cast to array<double> at every call site, so no
  // ExpectsInputTypes (AbstractDataType is private[sql])
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd polynomial char fold:
  * foldl (acc * mult + codePoint) % 1e9+7 over the string — the hash behind
  * shingle/token/fingerprint hashing. Replaces an interpreted
  * aggregate(transform(split(...))) chain (higher-order lambdas don't
  * codegen); identical result by construction, including the DuckDB oracle's
  * unicode()-per-char replay.
  */
case class CharFold(child: Expression, multExpr: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = multExpr
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_charfold"

  private lazy val mult: Long =
    multExpr.eval(null).asInstanceOf[Number].longValue()

  override def nullSafeEval(a: Any, m: Any): Any = {
    val str = a.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * mult + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m) => {
      val str = ctx.freshName("str")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = java.lang.String.valueOf($a);
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $acc = ($acc * $m + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, multExpr = newRight)
}

/** Native shingle-set builder: normalize (lower, non-alnum → space) →
  * whitespace tokens → word n-grams (space-joined) → order-preserving
  * distinct, in one JVM pass per document.
  *
  * Byte-identical to the declarative chain
  * `array_distinct(shingles(tokens(text), n))` — whose interpreted
  * transform+slice evaluation is O(tokens²) per document and dominated the
  * dedup pipelines — and to the DuckDB oracle's
  * regexp_replace/string_split_regex construction.
  */
case class ShingleSet(child: Expression, nExpr: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def left: Expression = child
  override def right: Expression = nExpr
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any, nv: Any): Any = {
    val n = nv.asInstanceOf[Number].intValue()
    val raw = a.toString
    // normalize: keep [a-zA-Z0-9 ] lowercased, everything else → space
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else sb.append(' ')
      i += 1
    }
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var start = -1
    val t = sb.toString
    i = 0
    while (i <= t.length) {
      if (i < t.length && t.charAt(i) != ' ') { if (start < 0) start = i }
      else if (start >= 0) { toks += t.substring(start, i); start = -1 }
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j + n <= toks.length) {
      val g = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) g.append(' ')
        g.append(toks(j + k))
        k += 1
      }
      seen.add(g.toString)
      j += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) {
      out(m) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, nExpr = newRight)
}

/** Every word n-gram of a document IN ORDER, duplicates kept — the
  * corpus-statistics counterpart of [[ShingleSet]] (which dedups per doc).
  * Same normalization/tokenization as ShingleSet and the DuckDB oracle.
  * One JVM pass; the declarative transform+slice construction is an
  * interpreted per-row lambda and measured 30x slower on the top-n-grams
  * gate.
  */
case class ShingleList(child: Expression, nExpr: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def left: Expression = child
  override def right: Expression = nExpr
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)
  override def prettyName: String = "graft_shingle_list"

  override def nullSafeEval(a: Any, nv: Any): Any = {
    val n = nv.asInstanceOf[Number].intValue()
    val raw = a.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else sb.append(' ')
      i += 1
    }
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var start = -1
    val t = sb.toString
    i = 0
    while (i <= t.length) {
      if (i < t.length && t.charAt(i) != ' ') { if (start < 0) start = i }
      else if (start >= 0) { toks += t.substring(start, i); start = -1 }
      i += 1
    }
    val m = math.max(toks.length - n + 1, 0)
    val out = new Array[AnyRef](m)
    var j = 0
    while (j < m) {
      val g = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) g.append(' ')
        g.append(toks(j + k))
        k += 1
      }
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(g.toString)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, nExpr = newRight)
}

/** Per-document word-n-gram occurrence statistics in one JVM pass:
  * struct(total, distinct, max_freq) over the document's word n-grams,
  * with [[ShingleSet]]'s exact normalization/tokenization (and the DuckDB
  * oracle's). Powers the Gopher-style repetition signals
  * ([[graft.pipeline.TextAnalysis.withRepetition]]): the declarative
  * construction — shingles via interpreted transform+slice, max frequency
  * via an interpreted array-aggregate run-length scan — is O(tokens²) per
  * document with per-element struct boxing, and measured 30 ms/doc; this
  * is one hash-map pass.
  */
case class NgramStats(child: Expression, nExpr: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def left: Expression = child
  override def right: Expression = nExpr
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("total",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("distinct",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("max_freq",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_ngram_stats"

  override def nullSafeEval(a: Any, nv: Any): Any = {
    val n = nv.asInstanceOf[Number].intValue()
    val raw = a.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else sb.append(' ')
      i += 1
    }
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var start = -1
    val t = sb.toString
    i = 0
    while (i <= t.length) {
      if (i < t.length && t.charAt(i) != ' ') { if (start < 0) start = i }
      else if (start >= 0) { toks += t.substring(start, i); start = -1 }
      i += 1
    }
    val counts = new java.util.HashMap[String, Long]()
    var total = 0L
    var maxFreq = 0L
    var j = 0
    while (j + n <= toks.length) {
      val g = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) g.append(' ')
        g.append(toks(j + k))
        k += 1
      }
      val key = g.toString
      val c = counts.getOrDefault(key, 0L) + 1L
      counts.put(key, c)
      if (c > maxFreq) maxFreq = c
      total += 1
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, counts.size().toLong, maxFreq))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, nExpr = newRight)
}

/** Whole MinHash signature in one map-side pass: for each shingle,
  * x = charfold31(shingle); slot i of the result is
  * min over shingles of (a_i * x + b_i) % 1e9+7 — the family in
  * [[graft.functions.TextFunctions.coeffA]]/coeffB (single source: the
  * coefficient formulas are replayed by the DuckDB oracle of the
  * `dd_minhash_sig` gate). Replaces the explode + numHashes-way
  * min-aggregate plan: the signature never shuffles doc×shingle rows, only
  * (doc_id, array<long>) — at corpus scale that removes the largest
  * shuffle of the MinHash pipeline. Generated code is a LOOP over slots,
  * so unlike a numHashes-slot expression tree it cannot trip the 64KB
  * generated-method limit.
  */
case class MinHashSig(child: Expression, nExpr: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = nExpr
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)
  override def prettyName: String = "graft_minhash_sig"

  private lazy val numHashes: Int =
    nExpr.eval(null).asInstanceOf[Number].intValue()
  private lazy val coeffA: Array[Long] =
    Array.tabulate(numHashes)(TextFunctions.coeffA)
  private lazy val coeffB: Array[Long] =
    Array.tabulate(numHashes)(TextFunctions.coeffB)

  override def nullSafeEval(a: Any, nv: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      val s = arr.getUTF8String(j).toString
      var x = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        x = (x * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      var k = 0
      while (k < numHashes) {
        val h = (coeffA(k) * x + coeffB(k)) % 1000000007L
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashCoeffA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("minhashCoeffB", coeffB, "long[]")
    nullSafeCodeGen(ctx, ev, (arr, _) => {
      val mins = ctx.freshName("mins")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  java.lang.String $s = $arr.getUTF8String($j).toString();
         |  long $x = 0L;
         |  int $i = 0;
         |  while ($i < $s.length()) {
         |    int $cp = $s.codePointAt($i);
         |    $x = ($x * 31L + $cp) % 1000000007L;
         |    $i += java.lang.Character.charCount($cp);
         |  }
         |  for (int $k = 0; $k < $numHashes; $k++) {
         |    long $h = ($aRef[$k] * $x + $bRef[$k]) % 1000000007L;
         |    if ($h < $mins[$k]) $mins[$k] = $h;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, nExpr = newRight)
}

/** All `tables` random-hyperplane LSH bucket ids of a vector in ONE
  * generated loop — the signature stage of
  * [[graft.pipeline.Similarity.annLsh]] and
  * [[graft.pipeline.Dedup.embeddingCosinePairs]].
  *
  * The expression-tree formulation (per-(table, bit) literal plane arrays
  * dotted via [[DotProduct]]) is bit-identical but materializes
  * tables×bits×dim literals in the plan: at the auto-planned sf10 setting
  * (~100 tables × 10 bits × 64 dims) the fused projection blew the 64 KB
  * JVM method limit and whole-stage codegen FELL BACK TO INTERPRETED for
  * the hottest stage. Here the plane components are derived in-loop from
  * the same splitmix64 finalizer over (table·1000 + bit, dim) — zero
  * literals, plan size constant in (bits, tables), and the dot
  * accumulates left-to-right in index order over min(dim, |vec|) exactly
  * like the DotProduct path, so bucket ids are unchanged bit for bit.
  */
case class LshBuckets(vec: Expression, dimExpr: Expression,
                      bitsExpr: Expression, tablesExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def first: Expression = vec
  override def second: Expression = dimExpr
  override def third: Expression = bitsExpr
  override def fourth: Expression = tablesExpr
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)
  override def prettyName: String = "graft_lsh_buckets"

  private lazy val dim: Int = dimExpr.eval(null).asInstanceOf[Number].intValue()
  private lazy val bits: Int = bitsExpr.eval(null).asInstanceOf[Number].intValue()
  private lazy val tables: Int =
    tablesExpr.eval(null).asInstanceOf[Number].intValue()

  override def nullSafeEval(v: Any, d: Any, b: Any, t: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(dim, arr.numElements())
    val out = new Array[Long](tables)
    var tt = 0
    while (tt < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += arr.getDouble(i) * LshBuckets.plane(tt * 1000 + j, i)
          i += 1
        }
        if (acc >= 0) bucket |= (1L << j)
        j += 1
      }
      out(tt) = bucket
      tt += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _, _) => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val tt = ctx.freshName("tt")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val cls = classOf[LshBuckets].getName
      s"""
         |long[] $out = new long[$tables];
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |for (int $tt = 0; $tt < $tables; $tt++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $v.getDouble($i) * $cls.plane($tt * 1000 + $j, $i);
         |    }
         |    if ($acc >= 0) $bucket |= (1L << $j);
         |  }
         |  $out[$tt] = $bucket;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(vec = f, dimExpr = s, bitsExpr = t, tablesExpr = q)
}

object LshBuckets {
  /** splitmix64-derived plane component — the single source shared with
    * [[graft.pipeline.Similarity.planeComponent]] (called from generated
    * code, hence public + JVM-static-friendly).
    */
  def plane(j: Int, i: Int): Double = {
    var z = ((j.toLong & 0xffffffffL) << 32 | (i.toLong & 0xffffffffL)) +
      0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }
}

/** Unicode NFC normalization (canonical composition) — the standard
  * corpus-cleaning canonicalization: decomposed sequences (e + combining
  * acute) compose to their canonical form (é), so hashing/dedup/shingling
  * see ONE representation of visually-identical text. Stays inside
  * whole-stage codegen around java.text.Normalizer, with an isNormalized
  * fast path that returns the input buffer untouched for the
  * overwhelmingly-common already-NFC case (no allocation, no copy).
  * DuckDB twin: `nfc_normalize` — the oracle replays it exactly.
  */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(a: Any): Any = {
    val s = a.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) a
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $a.toString();
         |if (java.text.Normalizer.isNormalized($s,
         |    java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $a;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s,
         |      java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VectorExpressions {
  val DotName = "graft_dot"
  val CharFoldName = "graft_charfold"
  val ShinglesName = "graft_shingles"
  val ShingleListName = "graft_shingle_list"
  val MinHashSigName = "graft_minhash_sig"
  val NgramStatsName = "graft_ngram_stats"
  val NfcName = "graft_nfc"
  val LshBucketsName = "graft_lsh_buckets"

  /** Register the expressions in the session's function registry (idempotent);
    * needed because Column construction from a raw Expression is not part of
    * the public API — call sites use `call_function`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName, exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CharFoldName, exprs => CharFold(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShinglesName, exprs => ShingleSet(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShingleListName, exprs => ShingleList(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MinHashSigName, exprs => MinHashSig(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NgramStatsName, exprs => NgramStats(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NfcName, exprs => NfcNormalize(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      LshBucketsName,
      exprs => LshBuckets(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
  }

  /** Codegen'd Unicode NFC normalization; requires [[register]]. */
  def nfc(c: Column): Column = call_function(NfcName, c)

  /** Codegen'd dot(a, b); requires [[register]] on the active session. */
  def dot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Codegen'd polynomial char fold; requires [[register]]. */
  def charFold(c: Column, mult: Long): Column =
    call_function(CharFoldName, c, org.apache.spark.sql.functions.lit(mult))

  /** Native shingle set; requires [[register]]. */
  def shingleSet(c: Column, n: Int): Column =
    call_function(ShinglesName, c, org.apache.spark.sql.functions.lit(n))

  /** Native ordered non-distinct shingle list; requires [[register]]. */
  def shingleList(c: Column, n: Int): Column =
    call_function(ShingleListName, c, org.apache.spark.sql.functions.lit(n))

  /** Whole MinHash signature, map-side; requires [[register]]. */
  def minHashSig(c: Column, numHashes: Int): Column =
    call_function(MinHashSigName, c, org.apache.spark.sql.functions.lit(numHashes))

  /** Per-doc n-gram struct(total, distinct, max_freq); requires [[register]]. */
  def ngramStats(c: Column, n: Int): Column =
    call_function(NgramStatsName, c, org.apache.spark.sql.functions.lit(n))

  /** All hyperplane-LSH bucket ids in one generated loop; requires
    * [[register]].
    */
  def lshBuckets(vec: Column, dim: Int, bits: Int, tables: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(LshBucketsName, vec, lit(dim), lit(bits), lit(tables))
  }
}
