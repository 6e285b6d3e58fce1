package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup hash pipeline
  * (MinHash / SimHash / shingling — SURVEY.md §2.2 [ext] rows).
  *
  * The DataFrame-only formulation ran these as interpreted higher-order
  * lambdas (`transform(toks, t => xxhash64(t))` etc. — HOFs have no
  * codegen) followed by an explode + groupBy with 32 `min` aggregate
  * buffers (MinHash) or 16 packed-lane sums (SimHash). That shape pays
  * three times: per-element interpretation, a full (doc_id, hash) shuffle
  * just to compute per-doc signatures, and enormous generated aggregate
  * code (slow Janino compiles). Each expression here instead computes the
  * whole per-document signature in ONE tight primitive loop inside
  * whole-stage codegen — signatures become map-side projections with zero
  * shuffle, which at 100 TB keeps the entire signature stage
  * embarrassingly parallel; only the tiny (doc_id, band) keys ever move.
  *
  * All hashing calls the same `XXH64` kernel as Spark's `xxhash64` (seed
  * 42, identical chaining), so values are bit-identical to the lambda
  * pipeline they replace — deterministic across runs, partitionings and
  * engines.
  */
object HashExpressions {
  private def col(e: Expression): Column = GraftColumnBridge.column(e)
  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)

  /** xxhash64(seed 42) of every element of a string array. */
  def tokenHashes(tokens: Column): Column = col(TokenHashes(expr(tokens)))

  /** Rolling xxhash64 of every length-`n` window of a long array —
    * hash n-gram shingles from per-token hashes.
    */
  def shingleHashes(tokenHashes: Column, n: Int = 3): Column =
    col(ShingleHashes(expr(tokenHashes), n))

  /** MinHash-LSH band hashes: `numPerm` permutation minima compressed to
    * `numPerm / rows` band keys, all in one pass over the shingle hashes.
    */
  def minhashBandHashes(shingles: Column, numPerm: Int, rows: Int): Column =
    col(MinHashBandHashes(expr(shingles), numPerm, rows))

  /** 64-bit set-based SimHash signature of a long array (majority vote per
    * bit over the element hashes).
    */
  def simhashSig(tokenHashes: Column): Column = col(SimHashSig(expr(tokenHashes)))
}

/** Shared shape: ArrayType(LongType) result computed from one input array
  * via a primitive loop; `eval`/codegen both build the long[] and wrap it
  * as UnsafeArrayData (no boxing).
  */
trait LongArrayHashExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
}

/** Per-element xxhash64 (seed 42) of array<string>, null elements hashing
  * to the seed — value-identical to `transform(a, s => xxhash64(s))`.
  */
case class TokenHashes(child: Expression) extends LongArrayHashExpression {
  override def prettyName: String = "graft_token_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (n, i, out) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("out"))
      val xxh = classOf[XXH64].getName
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.isNullAt($i) ? 42L
         |    : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TokenHashes = copy(child = c)
}

/** Sliding-window n-gram hash over array<long>: element i of the result is
  * the xxhash64 chain (seed 42) over input[i..i+n-1] — value-identical to
  * `transform(sequence(0, size-n), i -> xxhash64(a[i+1], ..., a[i+n]))`.
  * Null if the input has fewer than n elements (callers branch to a
  * whole-text fallback there, mirroring the lambda pipeline's `when`).
  */
case class ShingleHashes(child: Expression, n: Int) extends LongArrayHashExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def prettyName: String = "graft_shingle_hashes"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    if (sz < n) return null
    val out = new Array[Long](sz - n + 1)
    var i = 0
    while (i <= sz - n) {
      var h = 42L
      var j = 0
      while (j < n) {
        // xxhash64 semantics: a null argument leaves the running hash as-is
        if (!arr.isNullAt(i + j)) h = XXH64.hashLong(arr.getLong(i + j), h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (sz, i, j, h, out) = (ctx.freshName("sz"), ctx.freshName("i"),
        ctx.freshName("j"), ctx.freshName("h"), ctx.freshName("out"))
      val xxh = classOf[XXH64].getName
      s"""
         |final int $sz = $a.numElements();
         |if ($sz < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $out = new long[$sz - ${n - 1}];
         |  for (int $i = 0; $i <= $sz - $n; $i++) {
         |    long $h = 42L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      if (!$a.isNullAt($i + $j)) $h = $xxh.hashLong($a.getLong($i + $j), $h);
         |    }
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** MinHash band keys in one pass: permutation i maps element h to
  * xxhash64-chain(i then h), the minimum per permutation is the signature,
  * and consecutive groups of `rows` signature values hash (with the band
  * index) into one band key — value-identical to the 32-`min`-aggregate +
  * band-hash projection pipeline it replaces (min is duplicate-invariant,
  * so pre-deduplication of shingles is unnecessary). Null for empty input.
  */
case class MinHashBandHashes(child: Expression, numPerm: Int, rows: Int)
    extends LongArrayHashExpression {
  require(numPerm % rows == 0, "numPerm must be a multiple of rows")
  override def prettyName: String = "graft_minhash_bands"
  override def nullable: Boolean = true

  private val bands = numPerm / rows
  // hashInt(i, 42) per permutation — the constant prefix of
  // xxhash64(lit(i), h), hoisted out of the element loop. hashInt, not
  // hashLong: `lit(i)` is an IntegerType literal and Spark's xxhash64
  // hashes 4-byte ints with XXH64.hashInt.
  private lazy val seeds: Array[Long] =
    Array.tabulate(numPerm)(i => XXH64.hashInt(i, 42L))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // null element: xxhash64(lit(p), null) = seeds(p), matching the lambda
      val isNull = arr.isNullAt(i)
      val h = if (isNull) 0L else arr.getLong(i)
      var p = 0
      while (p < numPerm) {
        val v = if (isNull) seeds(p) else XXH64.hashLong(h, seeds(p))
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var s = 42L
      var r = 0
      while (r < rows) {
        s = XXH64.hashLong(mins(b * rows + r), s)
        r += 1
      }
      // band index folds in as an int literal did in the replaced
      // projection: xxhash64(m0.., lit(b)) ends with hashInt(b, h)
      out(b) = XXH64.hashInt(b, s)
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val (n, i, p, b, r, h, v, s, mins, out) = (ctx.freshName("n"),
        ctx.freshName("i"), ctx.freshName("p"), ctx.freshName("b"),
        ctx.freshName("r"), ctx.freshName("h"), ctx.freshName("v"),
        ctx.freshName("s"), ctx.freshName("mins"), ctx.freshName("out"))
      val xxh = classOf[XXH64].getName
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $mins = new long[$numPerm];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final boolean ${h}Null = $a.isNullAt($i);
         |    final long $h = ${h}Null ? 0L : $a.getLong($i);
         |    for (int $p = 0; $p < $numPerm; $p++) {
         |      final long $v = ${h}Null ? $seedsRef[$p] : $xxh.hashLong($h, $seedsRef[$p]);
         |      if ($v < $mins[$p]) $mins[$p] = $v;
         |    }
         |  }
         |  final long[] $out = new long[$bands];
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $s = 42L;
         |    for (int $r = 0; $r < $rows; $r++) {
         |      $s = $xxh.hashLong($mins[$b * $rows + $r], $s);
         |    }
         |    $out[$b] = $xxh.hashInt($b, $s);
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashBandHashes =
    copy(child = c)
}

/** 64-bit set-based SimHash of array<long>: bit b of the result is set iff
  * more than half of the (non-null) elements have bit b set — the same
  * majority vote as the packed-lane aggregate formulation, computed per row
  * with plain int counters. Null for empty input.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_simhash"
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new Array[Int](64)
    var m = 0 // non-null element count (the vote denominator)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        m += 1
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    if (m == 0) return null
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2 * counts(b) > m) sig |= 1L << b
      b += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (n, m, i, b, h, counts, sig) = (ctx.freshName("n"), ctx.freshName("m"),
        ctx.freshName("i"), ctx.freshName("b"), ctx.freshName("h"),
        ctx.freshName("counts"), ctx.freshName("sig"))
      s"""
         |final int $n = $a.numElements();
         |final int[] $counts = new int[64];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final long $h = $a.getLong($i);
         |    $m++;
         |    for (int $b = 0; $b < 64; $b++) {
         |      $counts[$b] += (int) (($h >>> $b) & 1L);
         |    }
         |  }
         |}
         |if ($m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if (2 * $counts[$b] > $m) $sig |= 1L << $b;
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHashSig = copy(child = c)
}
