package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot per-row loops of the dedup /
  * similarity operators.
  *
  * Why: Spark's higher-order array functions (transform/aggregate/
  * zip_with) are evaluated interpreted, one Catalyst expression tree
  * walk per element. A 128-permutation MinHash over ~400 shingles costs
  * 51k interpreted evaluations per row that way. These expressions do
  * the same math in a tight JVM loop over the unsafe array data —
  * 10-40× faster — while staying real Catalyst `Expression`s: null
  * semantics, column pruning, and filter pushdown around them are
  * unaffected. (Preference order per the Spark-first contract: builtin
  * functions > custom Expression > UDF; these are the middle tier,
  * used only where the builtin form is quadratic-in-practice.)
  */
object NativeExprs {

  /** splitmix64 finalizer — the per-permutation mixer. */
  @inline private[functions] def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  /** FNV-1a 64 over UTF-8 bytes — the base shingle/token hash. */
  @inline private[functions] def fnv64(bytes: Array[Byte]): Long =
    fnv64(bytes, 0, bytes.length)

  @inline private[functions] def fnv64(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var b = off
    val end = off + len
    while (b < end) { h ^= bytes(b) & 0xffL; h *= 0x100000001b3L; b += 1 }
    h
  }

  /** MinHash signature: element j = min over the input string array of
    * mix64(fnv64(s) + j*GOLDEN). One pass, H mins updated per element. */
  case class MinHashSigExpr(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val base = fnv64(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < numHashes) {
          val x = mix64(base + j * 0x9e3779b97f4a7c15L)
          if (x < mins(j)) mins(j) = x
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
      copy(child = newChild)
  }

  /** Shared min-signature kernel of [[MinHashSigTextExpr]] and
    * [[MinHashBandBucketsExpr]] — the signature computed STRAIGHT from
    * the text: the k-char windows are hashed in place (byte windows on
    * ASCII text — one `getBytes` per row, zero per-window allocation;
    * code-point windows otherwise), so no shingle array is ever
    * materialized and no interpreted substr-per-window transform runs.
    * Identical output to `MinHashSigExpr(charShingles(text, k))`:
    * duplicate windows cannot change a minimum, so skipping the
    * distinct is value-neutral. Texts shorter than k hash one (short)
    * window — charShingles parity. */
  private[functions] def minhashMins(s: org.apache.spark.unsafe.types.UTF8String,
                                     k: Int, numHashes: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    @inline def update(base: Long): Unit = {
      var j = 0
      while (j < numHashes) {
        val x = mix64(base + j * 0x9e3779b97f4a7c15L)
        if (x < mins(j)) mins(j) = x
        j += 1
      }
    }
    val nChars = s.numChars()
    val bytes = s.getBytes
    if (bytes.length == nChars) { // pure ASCII: byte windows == char windows
      val windows = math.max(1, nChars - k + 1)
      var i = 0
      while (i < windows) {
        update(fnv64(bytes, i, math.min(k, nChars - i)))
        i += 1
      }
    } else {
      val windows = math.max(1, nChars - k + 1)
      var i = 0
      while (i < windows) {
        update(fnv64(s.substring(i, math.min(i + k, nChars)).getBytes))
        i += 1
      }
    }
    mins
  }

  case class MinHashSigTextExpr(child: Expression, k: Int, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData =
      new GenericArrayData(minhashMins(s, k, numHashes))
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashSigTextExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSigTextExpr =
      copy(child = newChild)
  }

  /** Fused text → LSH band buckets: the minhash signature and the
    * banding collapse into ONE native pass — no 128-long signature
    * array is materialized, cached, or re-read, and the interpreted
    * per-band `transform` of the Column-form banding disappears.
    * Element b is the bucket key of band b (band id = array position,
    * ready for posexplode). Bucket derivation is BIT-IDENTICAL to
    * `TextFunctions.lshBands` over `minhashSigTextNative`:
    * xxhash64(seed 42) of the comma-joined decimal minhashes of the
    * band — so candidate sets (and every downstream gate) are
    * unchanged. */
  case class MinHashBandBucketsExpr(child: Expression, k: Int, numHashes: Int,
                                    bands: Int, rowsPerBand: Int)
      extends UnaryExpression {
    require(bands * rowsPerBand <= numHashes,
      s"bands($bands) x rowsPerBand($rowsPerBand) exceeds numHashes($numHashes)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val mins = minhashMins(s, k, numHashes)
      val out = new Array[Long](bands)
      val sb = new java.lang.StringBuilder(rowsPerBand * 21)
      var b = 0
      while (b < bands) {
        sb.setLength(0)
        var r = 0
        while (r < rowsPerBand) {
          if (r > 0) sb.append(',')
          sb.append(mins(b * rowsPerBand + r))
          r += 1
        }
        val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out(b) = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
        b += 1
      }
      new GenericArrayData(out)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashBandBucketsExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashBandBucketsExpr =
      copy(child = newChild)
  }

  /** 64-bit SimHash over a string array: bit i set iff the ±1 votes of
    * bit i across element hashes sum positive. */
  case class SimHash64Expr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val h = mix64(fnv64(arr.getUTF8String(i).getBytes))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
      copy(child = newChild)
  }

  /** Sequential-order dot product of two array<double> columns (same
    * left-to-right summation as `aggregate(zip_with(...))` and DuckDB's
    * list_sum, so cross-engine doubles stay bit-identical).
    *
    * Real `doGenCode` (no CodegenFallback): the loop is inlined into
    * the whole-stage-generated Java — no per-row InternalRow
    * materialization, no interpreted dispatch — per the Spark-first
    * contract ("a native Catalyst Expression WITH doGenCode beats a
    * Scala UDF"). */
  case class DotProductExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
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
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Fused hashed-linear classifier scoring — the
    * TextFunctions.hashedLinearScore DEFAULT path in one native pass:
    * tokenize on \s+ runs, md5 each token, bucket = first-60-bits %
    * dim, milli-weight = bucket % 2001 - 1000, integer sum, score =
    * round(sum / (1000·n), 6); empty text scores 0. Bit-identical to
    * the Column formulation (filter(split(trim(text))) →
    * transform(md5 → substr → conv → %) → aggregate): the whitespace
    * predicate is regex \s exactly (space + \t\n\x0B\f\r), the 60-bit
    * value is the first 15 hex chars parsed straight from the digest
    * bytes (no hex string, no conv string-parse), one per-thread
    * digest reused across tokens, the divide-then-round matches
    * Spark's Round(HALF_UP on BigDecimal.valueOf). The Column chain
    * paid per-token hex-string + conv + per-element expression
    * overhead — ~100 µs/doc at the sf10 rehearsal, md5-string-bound,
    * the same reason the round-5 minhash rewrite fused its text path. */
  case class HashedLinearScoreExpr(child: Expression, dim: Int)
      extends UnaryExpression {
    require(dim > 0, s"dim=$dim")
    override def dataType: DataType = DoubleType
    @inline private def isWs(c: Char): Boolean =
      c == ' ' || (c >= '\t' && c <= '\r') // regex \s: [ \t\n\x0B\f\r]
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): Double = {
      val s = text.toString
      val md = md5Digest()
      val len = s.length
      var n = 0
      var ms = 0L
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > start) {
          val dig = md.digest(s.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
          v >>>= 4 // first 15 hex chars = high 60 bits of bytes 0-7
          ms += (v % dim) % 2001 - 1000
          n += 1
        }
      }
      if (n == 0) 0.0
      else java.math.BigDecimal.valueOf(ms.toDouble / (n * 1000.0))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hashedLinearScoreExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): HashedLinearScoreExpr =
      copy(child = newChild)
  }

  /** [[HashedLinearScoreExpr]] with TRAINED weights: the same
    * tokenize → md5-bucket → integer milli-weight sum → length
    * normalization, but the per-bucket weight comes from a model
    * array carried as ONE reference object (broadcast with the task
    * closure — `weights.length` buckets × 4 B; a fastText-sized 256k
    * table is 1 MiB). Setting `weights(i) = i % 2001 - 1000`
    * reproduces the hash-derived stand-in bit-for-bit (spec-pinned),
    * which is the documented swap-in contract: training changes the
    * array contents, never the plan shape. */
  case class WeightedLinearScoreExpr(child: Expression, weights: Array[Int])
      extends UnaryExpression {
    require(weights.nonEmpty, "weights must be non-empty")
    override def dataType: DataType = DoubleType
    @inline private def isWs(c: Char): Boolean =
      c == ' ' || (c >= '\t' && c <= '\r')
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): Double = {
      val s = text.toString
      val dim = weights.length
      val md = md5Digest()
      val len = s.length
      var n = 0
      var ms = 0L
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > start) {
          val dig = md.digest(s.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
          v >>>= 4
          ms += weights((v % dim).toInt)
          n += 1
        }
      }
      if (n == 0) 0.0
      else java.math.BigDecimal.valueOf(ms.toDouble / (n * 1000.0))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("weightedLinearScoreExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): WeightedLinearScoreExpr =
      copy(child = newChild)
  }

  /** Hashed bag-of-tokens feature vector: ONE tokenize pass builds
    * the `dim`-bucket token-count array (the hashing trick) — the
    * FEATURE side of the [[HashedLinearScoreExpr]] family, used by
    * [[graft.operators.Training]]'s distributed logistic regression.
    * Bucket law is the family's md5 law (`conv(substr(md5(t),1,15),
    * 16,10) % dim` — the high 60 bits of digest bytes 0–7), identical
    * to the DuckDB-oracle form `CAST(concat('0x', substr(md5(t),1,15))
    * AS BIGINT) % dim`; whitespace runs delimit tokens and empty
    * tokens are never counted (the Column law
    * `filter(split(trim(text)), t -> length(t) > 0)`).
    * Output: array<long> of length `dim` (raw counts, no
    * normalization — training owns the scaling). */
  case class HashedCountsExpr(child: Expression, dim: Int)
      extends UnaryExpression {
    require(dim > 0, s"dim=$dim")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    @inline private def isWs(c: Char): Boolean =
      c == ' ' || (c >= '\t' && c <= '\r')
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val s = text.toString
      val md = md5Digest()
      val len = s.length
      val counts = new Array[Long](dim)
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > start) {
          val dig = md.digest(s.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
          v >>>= 4 // first 15 hex chars = high 60 bits of bytes 0-7
          counts((v % dim).toInt) += 1L
        }
      }
      new GenericArrayData(counts)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hashedCountsExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): HashedCountsExpr =
      copy(child = newChild)
  }

  /** Fused duplicate-span hashing: ONE tokenize pass emits the
    * DISTINCT md5-15 hashes of every sliding `n`-token window — the
    * per-row half of [[graft.operators.Dedup.duplicateSpanPairs]].
    * Bit-identical to the Column chain `array_distinct(transform(
    * wordNgrams(tokens, n), g -> conv(substr(md5(g),1,15),16,10)
    * .cast(long)))`: same `split(trim(text), "\s+")` tokenization
    * (including the empty-string token of whitespace-only docs —
    * which can never fill an n≥2 window alone), windows joined with
    * single spaces, digest of the UTF-8 bytes, high 60 bits of
    * digest bytes 0–7. The Column form pays per-window string
    * concat + hex-string conv parsing on top of the digest; this
    * pass builds each window's bytes once and hashes straight off
    * the digest — the same fusion arc as MinHash/BM25/classifier. */
  case class SpanHashesExpr(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"n=$n")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      // the exact Column law: space-only trim, Java regex \s+ split
      val s = text.toString
      var lo = 0
      var hi = s.length
      while (lo < hi && s.charAt(lo) == ' ') lo += 1
      while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
      val toks = s.substring(lo, hi).split("\\s+", -1)
      if (toks.length < n) return new GenericArrayData(Array.empty[Any])
      val md = md5Digest()
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val dig = md.digest(sb.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
        seen.add(v >>> 4) // first 15 hex chars = high 60 bits
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
      new GenericArrayData(out)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("spanHashesExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): SpanHashesExpr =
      copy(child = newChild)
  }

  /** All positional q-gram TOKENS of a string as 64-bit hashes, for
    * the edit-distance join's count/prefix filter
    * ([[graft.operators.Dedup.editDistancePairs]]). The c-th
    * occurrence (0-based) of gram g maps to `mix64(fnv64(g) + c)` —
    * occurrence numbering turns the q-gram MULTISET into a set, so
    * the ED-Join count-filter bound (one edit destroys at most q
    * grams, hence at most q tokens) transfers to plain set
    * intersection, and hash collisions can only MERGE tokens
    * consistently across strings (candidates grow, never shrink —
    * completeness is preserved; see the operator's scaladoc for the
    * bound). Grams are code-point windows (`UTF8String.substring`),
    * matching the code-point edit model of `levenshtein`. Strings
    * shorter than q yield an empty array. */
  case class PosQGramTokensExpr(child: Expression, q: Int)
      extends UnaryExpression {
    require(q >= 1, s"q=$q")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val nChars = text.numChars()
      if (nChars < q) return new GenericArrayData(Array.empty[Any])
      val nTok = nChars - q + 1
      val occ = new java.util.HashMap[java.lang.Long, Integer](nTok * 2)
      val out = new Array[Any](nTok)
      var i = 0
      while (i < nTok) {
        val g = java.lang.Long.valueOf(fnv64(text.substring(i, i + q).getBytes))
        val c = occ.merge(g, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        out(i) = mix64(g.longValue + (c.intValue - 1))
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("posQGramTokensExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): PosQGramTokensExpr =
      copy(child = newChild)
  }

  /** Exact long margin of the hashed-feature model in ONE tokenize
    * pass: `w(dim) + Σ_tokens w(bucket(tok))` over micro-unit long
    * weights (`weights.length = dim + 1`, last slot = intercept,
    * counted once). The weight array rides as ONE reference object —
    * a fastText-sized 262k-bucket model is 2 MiB shipped once per
    * task, NOT a 262k-element plan literal — which is what lets
    * [[graft.operators.Training]] hold any `dim`. Value-identical to
    * `Σ_j w_j·x_j` over [[HashedCountsExpr]] counts by distributivity
    * (integer adds commute); same md5-15 bucket law, same
    * empty-token-free tokenization. */
  case class HashedMarginExpr(child: Expression, weights: Array[Long])
      extends UnaryExpression {
    require(weights.length >= 2, s"weights=${weights.length}")
    override def dataType: DataType = LongType
    @inline private def isWs(c: Char): Boolean =
      c == ' ' || (c >= '\t' && c <= '\r')
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): Long = {
      val s = text.toString
      val dim = weights.length - 1
      val md = md5Digest()
      val len = s.length
      var m = weights(dim) // intercept
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > start) {
          val dig = md.digest(s.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
          v >>>= 4
          m += weights((v % dim).toInt)
        }
        i += 1
      }
      m
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hashedMarginExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): HashedMarginExpr =
      copy(child = newChild)
  }

  /** K class margins in ONE tokenize pass: row k of `weights` is a
    * [[HashedMarginExpr]] weight vector (dim+1 micro-longs, last =
    * intercept); every token's bucket is hashed once and added into
    * all K accumulators — the multiclass face of the family, used by
    * the softmax trainer. Output: array<long> length K. */
  case class HashedMarginsExpr(child: Expression, weights: Array[Array[Long]])
      extends UnaryExpression {
    require(weights.nonEmpty && weights.forall(_.length == weights(0).length)
      && weights(0).length >= 2, "ragged or empty weights")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    @inline private def isWs(c: Char): Boolean =
      c == ' ' || (c >= '\t' && c <= '\r')
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val s = text.toString
      val k = weights.length
      val dim = weights(0).length - 1
      val md = md5Digest()
      val len = s.length
      val m = Array.tabulate(k)(c => weights(c)(dim)) // intercepts
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > start) {
          val dig = md.digest(s.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
          v >>>= 4
          val j = (v % dim).toInt
          var c = 0
          while (c < k) { m(c) += weights(c)(j); c += 1 }
        }
        i += 1
      }
      new GenericArrayData(m.map(x => x: Any))
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hashedMarginsExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): HashedMarginsExpr =
      copy(child = newChild)
  }

  /** Per-token bucket ids (NOT distinct, NOT counted — one entry per
    * token occurrence) in one tokenize pass: the SPARSE feature face
    * of the hashed family, exploded by the trainer so gradient rows
    * scale with tokens-per-doc, never with `dim`. Same md5-15 law. */
  case class HashedBucketsExpr(child: Expression, dim: Int)
      extends UnaryExpression {
    require(dim > 0, s"dim=$dim")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    @inline private def isWs(c: Char): Boolean =
      c == ' ' || (c >= '\t' && c <= '\r')
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val s = text.toString
      val md = md5Digest()
      val len = s.length
      val out = new java.util.ArrayList[Any]()
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > start) {
          val dig = md.digest(s.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
          v >>>= 4
          out.add(java.lang.Long.valueOf(v % dim))
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hashedBucketsExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): HashedBucketsExpr =
      copy(child = newChild)
  }

  /** Hashed word n-gram buckets: ONE tokenize pass emits the md5
    * bucket of every n consecutive tokens joined by a single space —
    * the n-gram generalization of [[HashedBucketsExpr]] (n = 1 is
    * bucket-identical to it). Bucket law is the family's md5 law on
    * the JOINED gram string (`conv(substr(md5(gram),1,15),16,10) %
    * dim` — the high 60 bits of digest bytes 0–7), so the DuckDB
    * oracle form is `CAST(concat('0x', substr(md5(concat(t1, ' ',
    * t2)), 1, 15)) AS BIGINT) % dim`. Docs with fewer than n tokens
    * emit an empty array. Feature side of the DSIR importance-weight
    * family ([[graft.operators.Curation.dsirLogWeights]]).
    *
    * `fastHash = true` swaps the md5 law for
    * `pmod(xxhash64(gram), dim)` (seed 42, the builtin's law —
    * spec-pinned against the Column chain): ~an order of magnitude
    * less per-gram hash work, for production sweeps that don't need
    * an ANSI-SQL-reproducible bucket. Same family convention as
    * simhash's `md5Hash` flag — md5 stays the oracle face. */
  case class NgramBucketsExpr(child: Expression, n: Int, dim: Int,
                              fastHash: Boolean = false)
      extends UnaryExpression {
    require(n > 0, s"n=$n")
    require(dim > 0, s"dim=$dim")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val out = new java.util.ArrayList[Any]()
      foreachNgramBucket(text.toString, n, dim, fastHash)(b =>
        out.add(java.lang.Long.valueOf(b)))
      new GenericArrayData(out.toArray)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ngramBucketsExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): NgramBucketsExpr =
      copy(child = newChild)
  }

  /** Shared tokenize→gram→bucket walk for the n-gram family
    * ([[NgramBucketsExpr]], [[NgramWeightSumExpr]]): whitespace-run
    * tokens, n consecutive tokens joined by ONE space, bucket under
    * the md5 family law or (fastHash) `pmod(xxhash64(gram), dim)`. */
  private def foreachNgramBucket(s: String, n: Int, dim: Int,
                                 fastHash: Boolean)(emit: Long => Unit): Unit = {
    @inline def isWs(c: Char): Boolean =
      c == ' ' || (c >= '\t' && c <= '\r')
    val md = if (fastHash) null else md5Digest()
    val len = s.length
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val nt = toks.size
    var g = 0
    while (g + n <= nt) {
      val sb = new java.lang.StringBuilder(toks.get(g))
      var j = 1
      while (j < n) { sb.append(' ').append(toks.get(g + j)); j += 1 }
      val bucket =
        if (fastHash) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
            org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString), 42L)
          ((h % dim) + dim) % dim
        } else {
          val dig = md.digest(sb.toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
          (v >>> 4) % dim
        }
      emit(bucket)
      g += 1
    }
  }

  /** Per-document n-gram weight sum: the SCORING side of the DSIR
    * family — [[NgramBucketsExpr]]'s tokenize → gram → md5-bucket
    * pass fused with an integer weight fold, the bucket weights
    * carried as ONE reference object (`lamMicro.length` = dim longs,
    * broadcast with the task closure — 512 KiB at dim 65536). Output
    * is the raw integer micro-unit sum (order-independent,
    * cross-engine stable; no length normalization — a log-likelihood
    * ratio is a sum, not a mean). Docs with fewer than n tokens score
    * 0. `fastHash` selects the xxhash64 bucket law (must match the
    * law the weights were counted under — see [[NgramBucketsExpr]]). */
  case class NgramWeightSumExpr(child: Expression, n: Int,
                                lamMicro: Array[Long],
                                fastHash: Boolean = false)
      extends UnaryExpression {
    require(n > 0, s"n=$n")
    require(lamMicro.nonEmpty, "lamMicro must be non-empty")
    override def dataType: DataType = LongType
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): Long = {
      var sum = 0L
      foreachNgramBucket(text.toString, n, lamMicro.length, fastHash)(b =>
        sum += lamMicro(b.toInt))
      sum
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ngramWeightSumExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): NgramWeightSumExpr =
      copy(child = newChild)
  }

  /** Fused BM25 scoring: ONE tokenize pass per document scores EVERY
    * query — tf counting for all query terms rides a single hash-map
    * lookup per token, then per query the quantized contribution sum
    * `Σ_t round(idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))·1e6)` folds
    * in integer micro-units (order-independent, cross-engine stable).
    * Tokenization is EXACTLY the Column law `split(trim(text), "\s+")`
    * (space-only trim, Java regex split, so the empty-string token of
    * whitespace-only docs counts in dl just as the oracle's does).
    * Arithmetic parity with the DuckDB oracle is per-operation:
    * `(1−b)+((b·dl)/avgdl)` then `·k1`; `((idf·tf)·(k1+1))/(tf+dln)`
    * then `·1e6`, rounded HALF_UP via BigDecimal — the same law Spark
    * `round` applies. The unrolled Column form (15 `array_remove`
    * scans per row) cost 12.6 s at sf1; this pass costs ~1 s.
    * Output: array<struct<query_id: long, s: long>> (micro-units),
    * one entry per query in the given order. */
  case class Bm25ScoresExpr(child: Expression,
      terms: Seq[(Long, String, Double)],
      k1: Double, b: Double, avgdl: Double) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("s", LongType, nullable = false))), containsNull = false)
    @transient private lazy val qids: Array[Long] =
      terms.map(_._1).distinct.toArray
    // per-query dense term slots: qTermIdx(q) = indices into tfs
    @transient private lazy val termIdx: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      terms.zipWithIndex.foreach { case (_, i) =>
        m.put(terms(i)._2, i) // last wins; duplicate terms share tf anyway
      }
      m
    }
    @transient private lazy val byQuery: Array[Array[Int]] =
      qids.map(q => terms.zipWithIndex.collect {
        case ((tq, _, _), i) if tq == q => i
      }.toArray)
    def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val s = text.toString
      // space-only trim + Java regex split: the exact Column law
      var lo = 0
      var hi = s.length
      while (lo < hi && s.charAt(lo) == ' ') lo += 1
      while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
      val toks = s.substring(lo, hi).split("\\s+", -1)
      val dl = toks.length
      val tfs = new Array[Int](terms.length)
      var i = 0
      while (i < dl) {
        val idx = termIdx.get(toks(i))
        if (idx != null) tfs(idx.intValue()) += 1
        i += 1
      }
      val dln = k1 * (1.0 - b + (b * dl) / avgdl)
      val out = new Array[Any](qids.length)
      var q = 0
      while (q < qids.length) {
        var sum = 0L
        val idxs = byQuery(q)
        var j = 0
        while (j < idxs.length) {
          val ti = idxs(j)
          val tf = tfs(ti).toDouble
          sum += graft.functions.Quantize.quantizeDouble(
            terms(ti)._3 * tf * (k1 + 1.0) / (tf + dln), 6)
          j += 1
        }
        out(q) = org.apache.spark.sql.catalyst.InternalRow(qids(q), sum)
        q += 1
      }
      new GenericArrayData(out)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bm25ScoresExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): Bm25ScoresExpr =
      copy(child = newChild)
  }

  /** Fused HLL (reg, rho) for the md5-based 32-bit hash — the
    * Sketches per-row path in ONE native pass. Bit-identical to the
    * Column chain `md5Hash32(key)` (= conv of the first 8 md5 hex
    * chars: the first 4 digest bytes, big-endian unsigned) followed
    * by `instr(lpad(bin(low), w, '0'), '1')` rho: the hex parse
    * comes straight off the digest bytes and the first-one index is
    * w - floor(log2(low)) via numberOfLeadingZeros (low = 0 → w+1) —
    * integer ops replacing 6 string allocations per row (md5 hex,
    * substring, conv parse, bin, lpad, instr). Output
    * struct(reg: long, rho: int); the register aggregation above it
    * is unchanged, so the sketch (and its DuckDB oracle, which keeps
    * the lpad/bin/instr form) is unaffected. */
  case class HllRegRhoExpr(child: Expression, p: Int)
      extends UnaryExpression {
    require(p >= 4 && p <= 16, s"p=$p out of range")
    private val w = 32 - p
    override def dataType: DataType = StructType(Seq(
      StructField("reg", LongType, nullable = false),
      StructField("rho", IntegerType, nullable = false)))
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(key: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
      val dig = md5Digest().digest(key.getBytes)
      val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      val reg = h >>> w
      val low = h & ((1L << w) - 1)
      val rho =
        if (low == 0L) w + 1
        else w - (63 - java.lang.Long.numberOfLeadingZeros(low))
      org.apache.spark.sql.catalyst.InternalRow(reg, rho)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hllRegRhoExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): HllRegRhoExpr =
      copy(child = newChild)
  }

  /** Nearest-centroid id under the k-means argmin law: score(j) =
    * dot(c_j, c_j) - 2·dot(v, c_j) (the squared-L2 argmin, dot(v,v)
    * constant per row), both dots accumulated in ascending-dim order,
    * ties to the LOWER cluster id — bit-identical to the
    * struct-array/array_min formulation Clustering.assign previously
    * built from k separate literal expressions. One compact loop
    * regardless of k: the per-centroid-literal expansion was fine at
    * k=8 but a codegen/analysis explosion at the derived
    * k ~ n/targetClusterSize of semantic dedup (k=240 at the sf3
    * rehearsal; thousands web-scale). The centroid matrix rides the
    * expression as one reference object, not k typedLits. */
  case class ArgminCentroidExpr(child: Expression, centroids: Seq[Seq[Double]],
                                offset: Int = 0)
      extends UnaryExpression {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(offset >= 0, s"offset=$offset")
    override def dataType: DataType = IntegerType
    private lazy val cs: Array[Array[Double]] = centroids.map(_.toArray).toArray
    // dot(c,c) folded once, same sequential order as the executors'
    // per-row dots (and as the previous driver-side foldLeft).
    private lazy val dcc: Array[Double] = cs.map { c =>
      var a = 0.0; var i = 0
      while (i < c.length) { a += c(i) * c(i); i += 1 }
      a
    }
    /** Public for generated code (reference-object call from doGenCode).
      * `offset` reads the dot against v[offset ..) — the PQ subspace
      * form: argmin over codebook entries of a vector SLICE without
      * materializing the slice (bit-identical to
      * `ArgminCentroidExpr(slice(v, offset+1, subDim), cb)`: the dot
      * accumulates over min(len-offset, |c|) elements in the same
      * ascending order, exactly as the slice's copy would). */
    def compute(v: ArrayData): Int = {
      var best = 0
      var bestS = Double.PositiveInfinity
      var j = 0
      while (j < cs.length) {
        val c = cs(j)
        val n = math.min(v.numElements() - offset, c.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getDouble(offset + i) * c(i); i += 1 }
        val s = dcc(j) - 2.0 * acc
        if (s < bestS) { bestS = s; best = j }
        j += 1
      }
      best
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("argminCentroidExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): ArgminCentroidExpr =
      copy(child = newChild)
  }

  /** Random-hyperplane LSH bucket of an array<double> vector: bit j of
    * the result is the sign of <v, h_j>, hyperplane components derived
    * deterministically from (seed, j, dim index) via splitmix — no RNG
    * state, identical on every executor. */
  case class HyperplaneBucketExpr(child: Expression, bits: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var bucket = 0L
      var j = 0
      while (j < bits) {
        var dot = 0.0
        var d = 0
        while (d < n) {
          val h = mix64(seed + j * 1000003L + d * 0x9e3779b97f4a7c15L)
          // component in [-0.5, 0.5), 3 decimal grid
          val comp = math.floorMod(h, 1000L).toDouble / 1000.0 - 0.5
          dot += v.getDouble(d) * comp
          d += 1
        }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      bucket
    }
    override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
      copy(child = newChild)
  }

  /** Per-thread MessageDigest — expressions run in task threads; this
    * avoids a getInstance allocation per row. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private[functions] def md5Digest(): java.security.MessageDigest = {
    val md = md5Local.get()
    md.reset()
    md
  }

  /** Lowercase hex of an MD5 digest (matches DuckDB's md5()). */
  private[functions] def md5Hex(dig: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var b = 0
    while (b < dig.length) {
      val v = dig(b) & 0xff
      sb.append(Character.forDigit(v >>> 4, 16)).append(Character.forDigit(v & 0xf, 16))
      b += 1
    }
    sb.toString
  }

  /** 64-bit SimHash over a string array using the first 8 bytes of each
    * element's MD5 as the per-token hash — bit b (0 = MSB of digest
    * byte 0) is voted on across tokens. Unlike [[SimHash64Expr]]'s
    * splitmix/FNV hashing, MD5 is computable in ANSI SQL engines, so a
    * DuckDB oracle can reproduce the hash bit-for-bit (bit b of the hex
    * form = bit 3-(b mod 4) of hex digit b/4). The result packs bit b
    * at position 63-b (big-endian byte order). */
  case class SimHashMd5Expr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(arr: ArrayData): Long = {
      val counts = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val d = md5Digest().digest(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((d(b >> 3) >> (7 - (b & 7))) & 1) == 1) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << (63 - b)); b += 1 }
      out
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simhashMd5Expr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): SimHashMd5Expr =
      copy(child = newChild)
  }

  /** Random-hyperplane LSH bucket like [[HyperplaneBucketExpr]], but the
    * hyperplane components come from a Lehmer LCG (modulus 2^31-1,
    * multiplier 48271) on the (seed, plane, dim) triple — pure integer
    * arithmetic that an ANSI SQL oracle can evaluate exactly, unlike
    * the splitmix mixer. Component grid: (h % 1000)/1000 - 0.5. The dot
    * product accumulates sequentially over dims (same order as DuckDB's
    * list_sum), so the sign — and hence the bucket — is bit-identical
    * cross-engine. */
  case class HyperplaneBucketLcgExpr(child: Expression, bits: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    private val M = 2147483647L // 2^31 - 1
    @inline private def comp(j: Int, d: Int): Double = {
      val x = Math.floorMod(seed * 1000003L + j * 8191L + d * 127L + 1L, M)
      val h1 = (48271L * x) % M
      val h2 = (48271L * h1) % M
      (h2 % 1000L).toDouble / 1000.0 - 0.5
    }
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(v: ArrayData): Long = {
      val n = v.numElements()
      var bucket = 0L
      var j = 0
      while (j < bits) {
        var dot = 0.0
        var d = 0
        while (d < n) { dot += v.getDouble(d) * comp(j, d); d += 1 }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      bucket
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hyperplaneBucketLcgExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketLcgExpr =
      copy(child = newChild)
  }

  /** Banded Levenshtein distance with a threshold — value-identical to
    * the builtin `levenshtein(l, r, k)` (exact code-point edit
    * distance if <= k, else -1; null in, null out), restructured for
    * the ED-join's verify loop where per-candidate cost is the whole
    * stage (§1.2 step 2):
    *
    *  - common prefix AND suffix are stripped before the DP —
    *    edit distance is invariant under shared affixes, and near-dup
    *    titles share most of both, so the DP usually runs on a
    *    fragment (often empty: equal strings never touch the matrix);
    *  - the length band is re-checked on the STRIPPED remainders
    *    (|n - m| > k bails before any allocation);
    *  - the DP itself is Ukkonen-banded (only the 2k+1 diagonal
    *    band is computed) with a per-row minimum early exit: the row
    *    minimum is non-decreasing in i, so a row whose reachable
    *    cells all exceed k proves the pair fails — candidates the
    *    filter stack lets through but the DP would reject at k+1 cost
    *    O(k·(rows so far)), never O(n·m).
    *
    * Early exits only reject pairs whose distance provably exceeds k
    * (exact-DP facts, not heuristics), so the verified pair set — and
    * the exact distances on survivors — are unchanged. ASCII inputs
    * compare raw UTF-8 bytes; any non-ASCII input falls back to a
    * code-point array (the same edit model the builtin uses). */
  case class LevenshteinBandedExpr(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    require(k >= 0, s"k=$k")
    override def dataType: DataType = IntegerType
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(a: org.apache.spark.unsafe.types.UTF8String,
                b: org.apache.spark.unsafe.types.UTF8String): Int = {
      val ab = a.getBytes
      val bb = b.getBytes
      // code-point arrays; ASCII (bytes == chars) skips the decode
      val s: Array[Int] =
        if (ab.length == a.numChars()) { val r = new Array[Int](ab.length); var i = 0; while (i < ab.length) { r(i) = ab(i); i += 1 }; r }
        else a.toString.codePoints().toArray
      val t: Array[Int] =
        if (bb.length == b.numChars()) { val r = new Array[Int](bb.length); var i = 0; while (i < bb.length) { r(i) = bb(i); i += 1 }; r }
        else b.toString.codePoints().toArray
      // strip shared prefix/suffix: d(s, t) == d(core_s, core_t)
      var lo = 0
      var sHi = s.length
      var tHi = t.length
      while (lo < sHi && lo < tHi && s(lo) == t(lo)) lo += 1
      while (sHi > lo && tHi > lo && s(sHi - 1) == t(tHi - 1)) { sHi -= 1; tHi -= 1 }
      var n = sHi - lo
      var m = tHi - lo
      if (n > m) { // symmetric: iterate rows over the shorter core
        val tmp = n; n = m; m = tmp
        bandedCore(t, s, lo, n, m)
      } else bandedCore(s, t, lo, n, m)
    }
    /** DP over the stripped cores s[lo, lo+n), t[lo, lo+m), n <= m. */
    private def bandedCore(s: Array[Int], t: Array[Int], lo: Int,
                           n: Int, m: Int): Int = {
      if (m - n > k) return -1
      if (n == 0) return m // m - n <= k, so within threshold
      val inf = k + 1
      var prev = new Array[Int](m + 1)
      var cur = new Array[Int](m + 1)
      var j = 0
      while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
      var i = 1
      while (i <= n) {
        java.util.Arrays.fill(cur, inf)
        cur(0) = if (i <= k) i else inf
        var rowMin = cur(0)
        val jLo = math.max(1, i - k)
        val jHi = math.min(m, i + k)
        val sc = s(lo + i - 1)
        j = jLo
        while (j <= jHi) {
          val sub = prev(j - 1) + (if (sc == t(lo + j - 1)) 0 else 1)
          val del = prev(j) + 1
          val ins = cur(j - 1) + 1
          var v = if (sub < del) sub else del
          if (ins < v) v = ins
          cur(j) = v
          if (v < rowMin) rowMin = v
          j += 1
        }
        // row minima are non-decreasing in i (every d(i,j) >= some
        // d(i-1,·) or a same-row cell chaining to one), so a row with
        // no cell <= k proves the final distance exceeds k
        if (rowMin > k) return -1
        val sw = prev; prev = cur; cur = sw
        i += 1
      }
      if (prev(m) <= k) prev(m) else -1
    }
    override protected def nullSafeEval(l: Any, r: Any): Any =
      compute(l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("levenshteinBandedExpr", this)
      nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.compute($l, $r);")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): LevenshteinBandedExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Per-document shared-shingle counts against a bounded probe set,
    * in ONE pass: the contamination sweep's corpus side
    * ([[graft.operators.Dedup.contaminationPairs]]) without
    * materializing the shingle array, without the per-doc explode, and
    * without the (c_id, p_id) count shuffle. The probe documents'
    * DISTINCT k-gram shingle sets ride the expression as one reference
    * object (bounded by contract — an eval set, not a corpus); each
    * corpus document's distinct code-point k-windows are looked up in
    * the inverted shingle→probes map, and the output is one
    * (p_id, n_shared) struct per probe with n_shared >= 1.
    *
    * Law parity with `charShingles(text, k)` (what both the previous
    * Column form and the DuckDB oracle compute): windows are CODE
    * POINT based (`UTF8String.substring`), texts shorter than k emit
    * exactly one (short) shingle — including the empty shingle of an
    * empty text — and counts are DISTINCT-set intersection sizes (the
    * first occurrence of a window counts, duplicates don't). */
  case class SharedShingleCountsExpr(child: Expression, k: Int,
                                     probes: Seq[(Long, String)])
      extends UnaryExpression {
    require(k >= 1, s"k=$k")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("p_id", LongType, nullable = false),
      StructField("n_shared", LongType, nullable = false))), containsNull = false)
    @transient private lazy val pids: Array[Long] = probes.map(_._1).toArray
    // shingle -> indices of probes containing it (a shingle can sit in
    // several probes; each gets its own count)
    @transient private lazy val inverted
        : java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Int]] = {
      val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
        java.util.ArrayList[Integer]]()
      probes.zipWithIndex.foreach { case ((_, text), pi) =>
        val s = org.apache.spark.unsafe.types.UTF8String.fromString(text)
        val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
        foreachWindow(s) { sh =>
          if (seen.add(sh))
            m.computeIfAbsent(sh, _ => new java.util.ArrayList[Integer]())
              .add(Integer.valueOf(pi))
        }
      }
      val out = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Int]](
        m.size() * 2)
      m.forEach((sh, list) => out.put(sh,
        Array.tabulate(list.size())(i => list.get(i).intValue())))
      out
    }
    @inline private def foreachWindow(
        s: org.apache.spark.unsafe.types.UTF8String)(
        f: org.apache.spark.unsafe.types.UTF8String => Unit): Unit = {
      val n = s.numChars()
      val windows = math.max(1, n - k + 1)
      var i = 0
      while (i < windows) { f(s.substring(i, math.min(i + k, n))); i += 1 }
    }
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val counts = new Array[Long](pids.length)
      val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      val inv = inverted
      foreachWindow(text) { sh =>
        if (seen.add(sh)) {
          val hits = inv.get(sh)
          if (hits != null) {
            var j = 0
            while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
          }
        }
      }
      val out = new java.util.ArrayList[Any]()
      var p = 0
      while (p < counts.length) {
        if (counts(p) > 0L)
          out.add(org.apache.spark.sql.catalyst.InternalRow(pids(p), counts(p)))
        p += 1
      }
      new GenericArrayData(out.toArray)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("sharedShingleCountsExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): SharedShingleCountsExpr =
      copy(child = newChild)
  }

  /** Shared 96-bit key law of the segment/window dedup family —
    * (xxhash64 seed 42, crc32), both over the UTF-8 bytes, exactly
    * Spark's `struct(xxhash64(s), crc32(s))`. */
  @inline private[functions] def key96(bytes: Array[Byte]): (Long, Long) = {
    val xx = XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 0, bytes.length)
    (xx, crc.getValue)
  }

  /** Consecutive `segWords`-word segment keys of a text in ONE pass —
    * the per-row half of the segment-dedup family
    * ([[graft.operators.Dedup.dropDuplicateSegments]] /
    * `dropFrequentSegments`): element i is the 96-bit [[key96]] of
    * words [i·w, i·w+w) joined by one space. Bit-identical to the
    * Column chain `transform(sequence(0, nseg-1), i ->
    * struct(xxhash64(seg_i), crc32(seg_i)))` over
    * `split(trim(text), "\s+")` — space-only trim, Java regex split
    * (a leading tab/newline yields the leading empty token exactly as
    * the builtin split does), nseg = max(1, ceil(nwords/w)), last
    * segment short. The Column form paid an interpreted
    * transform + slice + array_join per segment plus the seg STRING
    * materialization through the explode; this emits only the keys. */
  case class SegmentKeysExpr(child: Expression, segWords: Int)
      extends UnaryExpression {
    require(segWords >= 1, s"segWords=$segWords")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("xx", LongType, nullable = false),
      StructField("crc", LongType, nullable = false))), containsNull = false)
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val s = text.toString
      var lo = 0
      var hi = s.length
      while (lo < hi && s.charAt(lo) == ' ') lo += 1
      while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
      val words = s.substring(lo, hi).split("\\s+", -1)
      val nseg = math.max(1, (words.length + segWords - 1) / segWords)
      val out = new Array[Any](nseg)
      var i = 0
      while (i < nseg) {
        val sb = new java.lang.StringBuilder
        var j = i * segWords
        val end = math.min(words.length, j + segWords)
        while (j < end) {
          if (j > i * segWords) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        val (xx, crc) = key96(sb.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out(i) = org.apache.spark.sql.catalyst.InternalRow(xx, crc)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("segmentKeysExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): SegmentKeysExpr =
      copy(child = newChild)
  }

  /** Sliding character-window keys — the window sibling of
    * [[SegmentKeysExpr]] for the duplicated-substring sweep
    * ([[graft.operators.Dedup.duplicatedWindowStats]]): the [[key96]]
    * of each `width`-code-point window at stride `stride` (windows
    * only while fully inside the text; texts shorter than `width`
    * emit an empty array). Bit-identical to the Column chain
    * `transform(sequence(0, nWin-1), j -> struct(xxhash64(w_j),
    * crc32(w_j)))` over `substr(j·stride+1, width)`. */
  case class WindowKeysExpr(child: Expression, width: Int, stride: Int)
      extends UnaryExpression {
    require(width >= 1, s"width=$width")
    require(stride >= 1, s"stride=$stride")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("xx", LongType, nullable = false),
      StructField("crc", LongType, nullable = false))), containsNull = false)
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val n = text.numChars()
      if (n < width) return new GenericArrayData(Array.empty[Any])
      val nWin = (n - width) / stride + 1
      val out = new Array[Any](nWin)
      var j = 0
      while (j < nWin) {
        val w = text.substring(j * stride, j * stride + width)
        val (xx, crc) = key96(w.getBytes)
        out(j) = org.apache.spark.sql.catalyst.InternalRow(xx, crc)
        j += 1
      }
      new GenericArrayData(out)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("windowKeysExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): WindowKeysExpr =
      copy(child = newChild)
  }

  /** Johnson–Lindenstrauss-style random projection onto `dims`
    * Lehmer-LCG pseudo-random directions — the SAME direction
    * construction as [[HyperplaneBucketLcgExpr]] (seed, j, d ↦
    * component in [-0.5, 0.5)), returning the raw dot values instead of
    * sign bits. Deterministic and oracle-reproducible: the directions
    * are pure arithmetic on (seed, j, d), so an engine with integer
    * modular math can regenerate them exactly; the dot accumulates in
    * ascending-d order to match list-fold evaluation. The
    * dimensionality-reduction step ahead of ANN/clustering at scale:
    * 64-dim float payloads shrink 4× at dims=16 while JL preserves
    * pairwise distances within ~1±ε. */
  case class RandomProjectionLcgExpr(child: Expression, dims: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    private val M = 2147483647L // 2^31 - 1
    @inline private def comp(j: Int, d: Int): Double = {
      val x = Math.floorMod(seed * 1000003L + j * 8191L + d * 127L + 1L, M)
      val h1 = (48271L * x) % M
      val h2 = (48271L * h1) % M
      (h2 % 1000L).toDouble / 1000.0 - 0.5
    }
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(v: ArrayData): ArrayData = {
      val n = v.numElements()
      val out = new Array[Double](dims)
      var j = 0
      while (j < dims) {
        var dot = 0.0
        var d = 0
        while (d < n) { dot += v.getDouble(d) * comp(j, d); d += 1 }
        out(j) = dot
        j += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("randomProjectionLcgExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): RandomProjectionLcgExpr =
      copy(child = newChild)
  }

  /** Winnowing fingerprint over MD5 window hashes: the k-char windows
    * of the text are MD5-hashed (lowercase hex), and the rightmost
    * minimum of each w-window of hashes is selected (per-position
    * dedup — selected positions are non-decreasing, so consecutive
    * dedup ≡ distinct). Returns array<struct<pos:int, gh:string>>
    * ordered by position. Same winnowing law as
    * [[WinnowFingerprintExpr]] but with an oracle-computable hash
    * (md5 + substr are ANSI SQL); the rolling-hash form stays the
    * performance path. */
  case class WinnowMd5Expr(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("pos", IntegerType, nullable = false),
        StructField("gh", StringType, nullable = false))), containsNull = false)
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val n = s.numChars()
      val m = math.max(1, n - k + 1)
      // Selection compares raw digests (unsigned byte order == hex
      // lexicographic order); only the selected ~m/w positions are
      // hex-encoded.
      val hs = new Array[Array[Byte]](m)
      val bytes = s.getBytes
      val ascii = bytes.length == n // byte windows == char windows
      var i = 0
      while (i < m) {
        val md = md5Digest()
        hs(i) =
          if (ascii) { md.update(bytes, i, math.min(k, n - i)); md.digest() }
          else md.digest(s.substring(i, math.min(i + k, n)).getBytes)
        i += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var lastPos = -1
      var st = 0
      val windows = math.max(1, m - w + 1)
      while (st < windows) {
        var minPos = st
        var j = st
        val end = math.min(st + w, m)
        while (j < end) {
          if (java.util.Arrays.compareUnsigned(hs(j), hs(minPos)) <= 0) minPos = j
          j += 1
        }
        if (minPos != lastPos) {
          out += org.apache.spark.sql.catalyst.InternalRow(
            minPos, org.apache.spark.unsafe.types.UTF8String.fromString(md5Hex(hs(minPos))))
          lastPos = minPos
        }
        st += 1
      }
      new GenericArrayData(out.toArray)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("winnowMd5Expr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): WinnowMd5Expr =
      copy(child = newChild)
  }

  /** Minimum MD5 hex over the k-gram shingles of a string — the 1-perm
    * MinHash fingerprint. Identical output to
    * array_min(transform(shingles, md5)) and the DuckDB oracle
    * (min over lowercase hex strings == lexicographic min), without one
    * interpreted expression-tree walk per shingle. Shingling is done
    * inside the expression too (substring windows over the UTF8 bytes,
    * matching substr semantics for ASCII and multi-byte text alike via
    * code-point windows). */
  case class MinMd5ShingleExpr(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
      val n = s.numChars()
      // Unsigned byte-order of digests == lexicographic order of their
      // lowercase hex (fixed-width order-preserving encoding), so the
      // min is found on raw digests and hex-encoded exactly once.
      var best: Array[Byte] = null
      val windows = math.max(1, n - k + 1)
      val bytes = s.getBytes
      val ascii = bytes.length == n // byte windows == char windows
      var i = 0
      while (i < windows) {
        val md = md5Digest()
        val dig =
          if (ascii) { md.update(bytes, i, math.min(k, n - i)); md.digest() }
          else md.digest(s.substring(i, math.min(i + k, n)).getBytes)
        if (best == null || java.util.Arrays.compareUnsigned(dig, best) < 0) best = dig
        i += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(md5Hex(best))
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minMd5ShingleExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): MinMd5ShingleExpr =
      copy(child = newChild)
  }

  /** Winnowing document fingerprint (rolling hash): polynomial rolling
    * hash over a k-char window slid across the text, then the minimum
    * hash of each w-hash window kept (rightmost min), deduplicated —
    * the standard winnowing scheme: two documents sharing a long-enough
    * substring share a fingerprint hash, robust to position shifts. */
  case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      val n = bytes.length
      if (n == 0) return new GenericArrayData(Array.empty[Long])
      val m = math.max(1, n - k + 1)
      // rolling polynomial hash base 257 mod 2^64, then mixed
      val hs = new Array[Long](m)
      val B = 257L
      var pow = 1L
      var i = 1
      while (i < math.min(k, n)) { pow *= B; i += 1 }
      var h = 0L
      i = 0
      while (i < math.min(k, n)) { h = h * B + (bytes(i) & 0xffL); i += 1 }
      hs(0) = mix64(h)
      i = 1
      while (i < m) {
        h = (h - (bytes(i - 1) & 0xffL) * pow) * B + (bytes(i + k - 1) & 0xffL)
        hs(i) = mix64(h)
        i += 1
      }
      // winnow: rightmost minimum of each w-window, deduped consecutive
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var lastPos = -1
      var s = 0
      val windows = math.max(1, m - w + 1)
      while (s < windows) {
        var minPos = s
        var j = s
        val end = math.min(s + w, m)
        while (j < end) { if (hs(j) <= hs(minPos)) minPos = j; j += 1 }
        if (minPos != lastPos) { out += hs(minPos); lastPos = minPos }
        s += 1
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintExpr =
      copy(child = newChild)
  }

  /** Set-Jaccard of two string arrays: |A∩B| / |A∪B| over DISTINCT
    * elements — the same integer counts as array_intersect/array_union,
    * so results are bit-identical to the builtin form (and the DuckDB
    * oracle), computed with hash sets instead of one interpreted tree
    * walk per element per pair. */
  case class JaccardExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    /** Public for generated code (doGenCode embeds `this` as a
      * reference object and calls it directly — no per-row InternalRow,
      * no interpreted dispatch). */
    def compute(a: ArrayData, b: ArrayData): Double = {
      val sa = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      var i = 0
      while (i < a.numElements()) { sa.add(a.getUTF8String(i)); i += 1 }
      val sb = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      var inter = 0
      var j = 0
      while (j < b.numElements()) {
        val s = b.getUTF8String(j)
        if (sb.add(s) && sa.contains(s)) inter += 1
        j += 1
      }
      val union = sa.size + sb.size - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
    override protected def nullSafeEval(l: Any, r: Any): Any =
      compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("jaccardExpr", this)
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
    }
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Open-addressing primitive long set (linear probe, power-of-two
    * table) for the packed-window jaccard fast path — no boxing, no
    * rehash churn at the ~hundreds-of-windows sizes involved. */
  private final class PackedWindowSet(capacityHint: Int) {
    private val cap = Integer.highestOneBit(math.max(8, capacityHint * 2) - 1) << 1
    private val mask = cap - 1
    private val table = Array.fill(cap)(EmptySlot)
    var size = 0
    def add(v: Long): Boolean = {
      var i = java.lang.Long.hashCode(v * 0x9e3779b97f4a7c15L) & mask
      while (true) {
        val cur = table(i)
        if (cur == EmptySlot) { table(i) = v; size += 1; return true }
        if (cur == v) return false
        i = (i + 1) & mask
      }
      false
    }
    def contains(v: Long): Boolean = {
      var i = java.lang.Long.hashCode(v * 0x9e3779b97f4a7c15L) & mask
      while (true) {
        val cur = table(i)
        if (cur == EmptySlot) return false
        if (cur == v) return true
        i = (i + 1) & mask
      }
      false
    }
  }
  // ASCII window packs never produce all-ones (bytes < 0x80, sentinel
  // 0x80|len, zero fill), so -1 is a safe empty slot.
  private val EmptySlot = -1L

  /** Exact char-k-gram Jaccard computed STRAIGHT from two texts — the
    * verification kernel for near-dup candidates. Byte-identical to
    * `JaccardExpr(charShingles(a, k), charShingles(b, k))` (distinct
    * window sets, inter/(|A|+|B|-inter) in the same double division)
    * but no shingle ARRAY is ever materialized or shuffled: candidate
    * joins ship the ~L-byte text instead of the ~8L-byte shingle set,
    * and the set arithmetic happens inside the join projection.
    * Fast path: ASCII text with k <= 8 packs each window BIJECTIVELY
    * into one long (bytes left-aligned, 0x80|len sentinel when the
    * window is shorter than 8 — ASCII bytes are < 0x80, so lengths
    * can't collide), so set ops run on primitive longs with zero
    * collision risk; non-ASCII or k > 8 falls back to UTF8String
    * window sets — same values, charShingles parity either way. */
  case class JaccardTextsExpr(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    require(k >= 1, "k must be positive")
    override def dataType: DataType = DoubleType
    private def packable(s: org.apache.spark.unsafe.types.UTF8String,
                         bytes: Array[Byte]): Boolean =
      k <= 8 && bytes.length == s.numChars()
    // Per-THREAD 2-slot cache text → distinct-window set (+ a values
    // array so the pair projection can scan the smaller side). The
    // verify join streams sum-of-bucket-size² pairs per task with the
    // STREAMED side's text repeating consecutively (one run per
    // buffered-block replay) — a 2-slot cache captures that run
    // exactly, halving the per-pair build work, while being immune to
    // the LRU cycle-thrash a bounded map suffers when the BUFFERED
    // side's block outgrows the capacity (every buffered text then
    // misses every cycle and pays clone + map overhead on top of the
    // build — measured +26% on a big-bucket corpus with a 512-LRU).
    // Window sets are ~10 KB each, so a cycle-proof capacity
    // (≥ block cap × threads) is not affordable the way the token
    // memo's 2 KB entries are. ThreadLocal (the reference object is
    // shared across task threads); keys cloned (join rows reuse
    // buffers).
    private final class WinSlot {
      var key: org.apache.spark.unsafe.types.UTF8String = null
      var packed: (PackedWindowSet, Array[Long]) = null
      var strs: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = null
    }
    @transient private lazy val slots = new ThreadLocal[(WinSlot, WinSlot)] {
      override def initialValue() = (new WinSlot, new WinSlot)
    }
    // Returns the slot holding `u` (filling it if absent), evicting
    // the slot that is NOT `other` — so a pair's two texts never evict
    // each other within one compute().
    private def slotFor(u: org.apache.spark.unsafe.types.UTF8String,
                        other: WinSlot): WinSlot = {
      val (s1, s2) = slots.get()
      if (s1.key != null && s1.key.equals(u)) s1
      else if (s2.key != null && s2.key.equals(u)) s2
      else {
        val victim = if (s1 eq other) s2 else s1
        victim.key = u.clone()
        victim.packed = null
        victim.strs = null
        victim
      }
    }
    private def packedSet(slot: WinSlot): (PackedWindowSet, Array[Long]) = {
      if (slot.packed == null) {
        val bytes = slot.key.getBytes
        val w = math.max(1, bytes.length - k + 1)
        val set = new PackedWindowSet(w)
        val vals = new Array[Long](w)
        var n = 0
        var i = 0
        while (i < w) {
          val v = pack(bytes, i)
          if (set.add(v)) { vals(n) = v; n += 1 }
          i += 1
        }
        slot.packed = (set, java.util.Arrays.copyOf(vals, n))
      }
      slot.packed
    }
    private def strSet(slot: WinSlot)
        : java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
      if (slot.strs == null) {
        val owned = slot.key // already a clone — windows may alias it
        val n = owned.numChars()
        val w = math.max(1, n - k + 1)
        val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](w * 2)
        var i = 0
        while (i < w) { set.add(owned.substring(i, math.min(i + k, n))); i += 1 }
        slot.strs = set
      }
      slot.strs
    }
    def compute(a: Any, b: Any): Double = {
      val ua = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val ub = b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val ba = ua.getBytes
      val bb = ub.getBytes
      val slotA = slotFor(ua, null)
      val slotB = slotFor(ub, slotA)
      if (packable(ua, ba) && packable(ub, bb)) {
        val (seta, valsa) = packedSet(slotA)
        val (setb, valsb) = packedSet(slotB)
        val (smallVals, big) =
          if (seta.size <= setb.size) (valsa, setb) else (valsb, seta)
        var inter = 0
        var i = 0
        while (i < smallVals.length) {
          if (big.contains(smallVals(i))) inter += 1
          i += 1
        }
        val union = seta.size + setb.size - inter
        if (union == 0) 0.0 else inter.toDouble / union
      } else {
        val sa = strSet(slotA)
        val sb = strSet(slotB)
        val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
        var inter = 0
        val it = small.iterator()
        while (it.hasNext) { if (big.contains(it.next())) inter += 1 }
        val union = sa.size + sb.size - inter
        if (union == 0) 0.0 else inter.toDouble / union
      }
    }
    private def pack(bytes: Array[Byte], off: Int): Long = {
      val len = math.min(k, bytes.length - off)
      var v = 0L
      var i = 0
      while (i < len) { v |= (bytes(off + i) & 0xffL) << (56 - 8 * i); i += 1 }
      if (len < 8) v |= (0x80L | len.toLong) << (56 - 8 * len)
      v
    }
    override protected def nullSafeEval(l: Any, r: Any): Any = compute(l, r)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("jaccardTextsExpr", this)
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
    }
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardTextsExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Exact whitespace-token-set Jaccard computed STRAIGHT from two
    * texts — the token-level sibling of [[JaccardTextsExpr]], for the
    * fingerprint-blocked dedup family: byte-identical to
    * `JaccardExpr(tokenSet(a), tokenSet(b))` (same trim+split
    * tokenization as the Column form, distinct sets, same double
    * division) without materializing or shuffling token arrays through
    * the block join. */
  case class JaccardTokenSetsExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // Per-THREAD memo text → distinct-token set. The expression sits
    // in the projection of pair-verify joins, where one task streams
    // sum-of-block-size² pairs: the streamed side's text repeats
    // consecutively and every buffered-side text replays once per
    // streamed row — tokenizing per PAIR made the verify quadratic in
    // tokenization work, not just in pair count (the per-pair cost
    // was ~µs of regex split + HashSet build on ~300-byte texts).
    // With the memo each block text tokenizes ~once per task and the
    // pair projection collapses to a set intersection. ThreadLocal,
    // NOT instance state: the same reference object is invoked from
    // every task thread of a local[n] executor. Keys are CLONED
    // UTF8Strings (join rows hand out views over reused buffers);
    // Capacity 2048 > the dedup family's 1000-row block caps: an
    // access-order LRU smaller than the BUFFERED side's replay cycle
    // degrades to 100% misses plus map overhead (cycle thrash — see
    // JaccardTextsExpr, whose ~10 KB window sets get a 2-slot cache
    // instead for exactly this reason). Token sets are ~2 KB each,
    // so covering a full capped block costs ~4 MB/thread.
    @transient private lazy val tokenMemo =
      new ThreadLocal[java.util.LinkedHashMap[
          org.apache.spark.unsafe.types.UTF8String, java.util.HashSet[String]]] {
        override def initialValue() =
          new java.util.LinkedHashMap[
              org.apache.spark.unsafe.types.UTF8String, java.util.HashSet[String]](
              64, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[org.apache.spark.unsafe.types.UTF8String,
                                       java.util.HashSet[String]]): Boolean =
              size() > 2048
          }
      }
    private def tokenSet(u: org.apache.spark.unsafe.types.UTF8String)
        : java.util.HashSet[String] = {
      val m = tokenMemo.get()
      val hit = m.get(u)
      if (hit != null) hit
      else {
        val toks = u.trim().toString.split("\\s+", -1)
        val s = new java.util.HashSet[String](toks.length * 2)
        var i = 0
        while (i < toks.length) { s.add(toks(i)); i += 1 }
        m.put(u.clone(), s)
        s
      }
    }
    def compute(a: Any, b: Any): Double = {
      val sa = tokenSet(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      val sb = tokenSet(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      // sets are shared via the memo — read-only from here. Intersect
      // by scanning the smaller side (identical count to the old
      // build-sb-while-probing-sa loop).
      val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
      var inter = 0
      val it = small.iterator()
      while (it.hasNext) { if (big.contains(it.next())) inter += 1 }
      val union = sa.size + sb.size - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
    override protected def nullSafeEval(l: Any, r: Any): Any = compute(l, r)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("jaccardTokenSetsExpr", this)
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
    }
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardTokenSetsExpr =
      copy(left = newLeft, right = newRight)
  }

  /** All three repetition-quality stats in ONE tokenize+count pass:
    * struct(dup2, top2, dup3) where dup_n = 1 - distinct_n/total_n over
    * word n-grams and top2 = share of the most frequent bigram. Exact
    * parity with the Column form in `TextFunctions.ngramRepStats`
    * (spec-asserted on random corpora): tokens are
    * `split(trim(text), "\s+")` — UTF8String.trim (0x20 only) then a
    * Java regex split with limit -1, so a doc starting with a tab keeps
    * its leading empty token, and "" tokenizes to [""] — and the final
    * division + 6-dp HALF_UP round reproduces Spark's `Round` on
    * doubles bit-for-bit (BigDecimal.valueOf path). The higher-order
    * Column form walks an interpreted expression tree per array
    * element; this is the same math in one HashMap pass per row. */
  case class RepStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("dup2", DoubleType, nullable = false),
      StructField("top2", DoubleType, nullable = false),
      StructField("dup3", DoubleType, nullable = false)))
    @inline private def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    /** Public for generated code (reference-object call from doGenCode). */
    def compute(s: org.apache.spark.unsafe.types.UTF8String): Any = {
      val toks = s.trim().toString.split("\\s+", -1)
      val n = toks.length
      val total2 = n - 1
      val total3 = n - 2
      var dup2 = 0.0; var top2 = 0.0; var dup3 = 0.0
      if (total2 > 0) {
        val m2 = new java.util.HashMap[String, Integer](total2 * 2)
        var best2 = 0
        val m3 = if (total3 > 0) new java.util.HashMap[String, Integer](total3 * 2) else null
        var i = 0
        while (i < total2) {
          val c = m2.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
          if (c > best2) best2 = c
          if (i < total3)
            m3.merge(toks(i) + " " + toks(i + 1) + " " + toks(i + 2), 1, (a, b) => a + b)
          i += 1
        }
        dup2 = round6(1.0 - m2.size.toDouble / total2)
        top2 = round6(best2.toDouble / total2)
        if (total3 > 0) dup3 = round6(1.0 - m3.size.toDouble / total3)
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](dup2, top2, dup3))
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("repStatsExpr", this)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (InternalRow) $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
      copy(child = newChild)
  }

  // ---- Column wrappers -------------------------------------------------

  def minhashSigNative(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), numHashes))

  def minhashSigTextNative(text: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigTextExpr(ColumnBridge.expression(text), k, numHashes))

  def minhashBandBucketsNative(text: Column, k: Int, numHashes: Int,
                               bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(MinHashBandBucketsExpr(ColumnBridge.expression(text),
      k, numHashes, bands, rowsPerBand))

  def jaccardTextsNative(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(JaccardTextsExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b), k))

  def jaccardTokenSetsNative(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardTokenSetsExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash64Native(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))

  def simhashMd5Native(tokens: Column): Column =
    ColumnBridge.column(SimHashMd5Expr(ColumnBridge.expression(tokens)))

  def hyperplaneBucketLcgNative(vec: Column, bits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(HyperplaneBucketLcgExpr(ColumnBridge.expression(vec), bits, seed))

  def randomProjectionLcgNative(vec: Column, dims: Int, seed: Long = 42L): Column =
    ColumnBridge.column(RandomProjectionLcgExpr(ColumnBridge.expression(vec), dims, seed))

  def winnowMd5Native(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(WinnowMd5Expr(ColumnBridge.expression(text), k, w))

  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def argminCentroidNative(vec: Column, centroids: Seq[Seq[Double]],
                           offset: Int = 0): Column =
    ColumnBridge.column(ArgminCentroidExpr(ColumnBridge.expression(vec),
      centroids, offset))

  def hashedLinearScoreNative(text: Column, dim: Int): Column =
    ColumnBridge.column(HashedLinearScoreExpr(ColumnBridge.expression(text), dim))

  def bm25ScoresNative(text: Column, terms: Seq[(Long, String, Double)],
                       k1: Double, b: Double, avgdl: Double): Column =
    ColumnBridge.column(Bm25ScoresExpr(ColumnBridge.expression(text),
      terms, k1, b, avgdl))

  def spanHashesNative(text: Column, n: Int): Column =
    ColumnBridge.column(SpanHashesExpr(ColumnBridge.expression(text), n))

  def posQGramTokensNative(text: Column, q: Int): Column =
    ColumnBridge.column(PosQGramTokensExpr(ColumnBridge.expression(text), q))

  def levenshteinBandedNative(left: Column, right: Column, k: Int): Column =
    ColumnBridge.column(LevenshteinBandedExpr(
      ColumnBridge.expression(left), ColumnBridge.expression(right), k))

  def sharedShingleCountsNative(text: Column, k: Int,
                                probes: Seq[(Long, String)]): Column =
    ColumnBridge.column(SharedShingleCountsExpr(
      ColumnBridge.expression(text), k, probes))

  def segmentKeysNative(text: Column, segWords: Int): Column =
    ColumnBridge.column(SegmentKeysExpr(ColumnBridge.expression(text), segWords))

  def windowKeysNative(text: Column, width: Int, stride: Int): Column =
    ColumnBridge.column(WindowKeysExpr(ColumnBridge.expression(text), width, stride))

  def hashedMarginsNative(text: Column, weights: Array[Array[Long]]): Column =
    ColumnBridge.column(HashedMarginsExpr(ColumnBridge.expression(text), weights))

  def hashedMarginNative(text: Column, weights: Array[Long]): Column =
    ColumnBridge.column(HashedMarginExpr(ColumnBridge.expression(text), weights))

  def hashedBucketsNative(text: Column, dim: Int): Column =
    ColumnBridge.column(HashedBucketsExpr(ColumnBridge.expression(text), dim))

  def hashedCountsNative(text: Column, dim: Int): Column =
    ColumnBridge.column(HashedCountsExpr(ColumnBridge.expression(text), dim))

  def ngramBucketsNative(text: Column, n: Int, dim: Int,
                         fastHash: Boolean = false): Column =
    ColumnBridge.column(NgramBucketsExpr(ColumnBridge.expression(text), n, dim, fastHash))

  def ngramWeightSumNative(text: Column, n: Int, lamMicro: Array[Long],
                           fastHash: Boolean = false): Column =
    ColumnBridge.column(NgramWeightSumExpr(ColumnBridge.expression(text), n, lamMicro, fastHash))

  def weightedLinearScoreNative(text: Column, weights: Array[Int]): Column =
    ColumnBridge.column(WeightedLinearScoreExpr(ColumnBridge.expression(text), weights))

  def hllRegRhoNative(key: Column, p: Int): Column =
    ColumnBridge.column(HllRegRhoExpr(ColumnBridge.expression(key), p))

  def jaccardNative(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hyperplaneBucketNative(vec: Column, bits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(HyperplaneBucketExpr(ColumnBridge.expression(vec), bits, seed))

  def winnowFingerprintNative(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprintExpr(ColumnBridge.expression(text), k, w))

  def minMd5ShingleNative(text: Column, k: Int = 8): Column =
    ColumnBridge.column(MinMd5ShingleExpr(ColumnBridge.expression(text), k))

  def repStatsNative(text: Column): Column =
    ColumnBridge.column(RepStatsExpr(ColumnBridge.expression(text)))

  /** Order-0 character entropy of a string, in bits — the classic
    * gibberish/boilerplate quality signal (uniform noise scores high,
    * repeated filler low). One pass: code-point histogram, then
    * H = log2(N) − (Σ c·log2 c)/N with the Σ taken in ASCENDING code
    * point order — the same sequence DuckDB's `list(... ORDER BY c)` +
    * `list_sum` folds, so the 6-dp-rounded value is cross-engine
    * stable. Empty/null-less strings score 0. */
  case class CharEntropyExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    def compute(s: org.apache.spark.unsafe.types.UTF8String): Double = {
      val str = s.toString
      if (str.isEmpty) return 0.0
      val counts = new java.util.TreeMap[Integer, Long]()
      var i = 0
      var total = 0L
      while (i < str.length) {
        val cp = str.codePointAt(i)
        counts.merge(cp, 1L, (a, b) => a + b)
        total += 1
        i += Character.charCount(cp)
      }
      // exact for powers of two (DuckDB's log2(8) is exactly 3.0 where
      // Math.log(8)/ln2 is one ulp off); generic log otherwise — the
      // residual 1-ulp libm drift is absorbed by the 6-dp gate rounding
      def log2(x: Long): Double =
        if ((x & (x - 1)) == 0L) java.lang.Long.numberOfTrailingZeros(x).toDouble
        else math.log(x.toDouble) / 0.6931471805599453
      var acc = 0.0
      val it = counts.values.iterator() // ascending code point order
      while (it.hasNext) {
        val c = it.next()
        acc += c.toDouble * log2(c)
      }
      log2(total) - acc / total
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("charEntropyExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
      copy(child = newChild)
  }

  def charEntropyNative(text: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(text)))

  // ---- Bloom filter (build + probe share one hash) ---------------------

  /** Bloom bit positions of a long key under Kirsch–Mitzenmacher double
    * hashing: pos_i = (h1 + i·h2) mod m for i < k, with h1/h2 two
    * seeded XXH64 draws (h2 forced odd so the probe walk cycles every
    * slot of a power-of-two filter). The build side of
    * [[BloomMightContainExpr]] — one hash implementation shared by
    * both expressions, so filter and probe can never drift apart. */
  case class BloomPositionsExpr(child: Expression, m: Long, k: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    // declared input type: int keys then cast to long at analysis time,
    // so interpreted eval (constant folding, non-codegen paths) sees the
    // same Long the codegen path casts to — without this an int key
    // works under codegen but ClassCastExceptions under eval().
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    def positions(v: Long): GenericArrayData = {
      val h1 = XXH64.hashLong(v, 42L)
      val h2 = XXH64.hashLong(v, 0x9e3779b97f4a7c15L) | 1L
      val out = new Array[Long](k)
      var i = 0
      while (i < k) {
        out(i) = java.lang.Math.floorMod(h1 + i.toLong * h2, m)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def nullSafeEval(input: Any): Any =
      positions(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomPositionsExpr", this)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.positions($v);")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomPositionsExpr =
      copy(child = newChild)
  }

  /** Bloom membership probe over a long key: true iff all k probe bits
    * are set in `words` (the filter is m = 64·words.length bits). The
    * bit array rides the expression as one reference object inside the
    * generated code — a single per-executor copy, no UDF boxing, and
    * the probe stays inside whole-stage codegen so it lands directly
    * on the parquet scan it is pruning. False positives possible
    * (rate ≈ (1−e^{−kn/m})^k), false negatives impossible. */
  case class BloomMightContainExpr(child: Expression, words: Array[Long], k: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def dataType: DataType = BooleanType
    private val m: Long = words.length.toLong * 64L
    def test(v: Long): Boolean = {
      val h1 = XXH64.hashLong(v, 42L)
      val h2 = XXH64.hashLong(v, 0x9e3779b97f4a7c15L) | 1L
      var i = 0
      while (i < k) {
        val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, m)
        if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
          return false
        i += 1
      }
      true
    }
    override protected def nullSafeEval(input: Any): Any =
      test(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomMightContainExpr", this)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.test($v);")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
      copy(child = newChild)
  }

  def bloomPositionsNative(key: Column, m: Long, k: Int): Column =
    ColumnBridge.column(BloomPositionsExpr(ColumnBridge.expression(key), m, k))

  def bloomMightContainNative(key: Column, words: Array[Long], k: Int): Column =
    ColumnBridge.column(BloomMightContainExpr(ColumnBridge.expression(key), words, k))

  // ---- BPE encode (trained merges) -------------------------------------

  /** BPE tokenization of whitespace-split text under a trained, ranked
    * merge table ([[TextFunctions.bpeTrainMerges]]): per word, the
    * LOWEST-rank merge present in the symbol sequence is applied (all
    * its adjacent occurrences, left to right) until no table pair
    * remains — the standard BPE encode, matching the training
    * trajectory by construction. The merge table rides the expression
    * as one reference object (driver-bounded by maxVocab); the hot
    * loop is plain JVM string work inside codegen, no UDF boxing.
    * Tokens keep the `</w>` end-of-word sentinel, so the encoding is
    * invertible: concat(tokens).replace(sentinel, " ") == the
    * whitespace-normalized input (the txt_bpe_roundtrip gate law). */
  case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
      m
    }
    private def encodeWord(w: String, out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
      var syms = TextFunctions.codePointSymbols(w) :+ TextFunctions.BpeEndOfWord
      var continue = true
      while (continue && syms.length > 1) {
        var bestRank = Int.MaxValue
        var bestPair: (String, String) = null
        var j = 0
        while (j < syms.length - 1) {
          val r = rank.get(syms(j) + " " + syms(j + 1))
          if (r != null && r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
          j += 1
        }
        if (bestPair == null) continue = false
        else syms = TextFunctions.mergePair(syms, bestPair)
      }
      syms.foreach(s => out += org.apache.spark.unsafe.types.UTF8String.fromString(s))
    }
    def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val words = s.toString.trim.split("\\s+")
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      words.foreach(encodeWord(_, out))
      new GenericArrayData(out.toArray)
    }
    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeEncodeExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
      copy(child = newChild)
  }

  def bpeEncodeNative(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(text), merges))
}
