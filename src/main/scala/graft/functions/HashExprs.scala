package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd hash-sketch expressions for the dedup / similarity
  * operators. The declarative HOF formulations (transform/aggregate) are
  * interpreted row-at-a-time with per-element array allocation; these fused
  * loops run inside whole-stage codegen via Spark's XXH64 primitives —
  * 5-20x faster on the LSH hot paths, same operator semantics (sketch
  * values are internal: candidate pairs are always exact-verified
  * downstream, so the hash family is free to change).
  */

/** md5-derived 60-bit string hash: the first 15 hex chars of md5 as a
  * (always non-negative) long — i.e. the top 60 bits of the digest. md5 is
  * the one hash family external engines reproduce bit-for-bit (DuckDB:
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`), so every sketch derived
  * through here is exactly oracle-checkable. Digests are thread-local —
  * MessageDigest is stateful and codegen calls this from many tasks.
  */
object Md5Hash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    // first 8 bytes big-endian = first 16 hex chars; >>> 4 drops the 16th
    // hex char, leaving the first 15 (60 bits, sign-safe everywhere)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    h >>> 4
  }
}

/** xxhash64-derived 60-bit string hash (top 60 bits, always non-negative):
  * the PRODUCTION hash family — one pass of shift/multiply arithmetic per
  * token vs md5's full digest machinery. Not reproducible by external SQL
  * engines; use the md5 family when the output must be oracle-checked.
  */
object XxHash60 {
  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L) >>> 4
}

/** The two 60-bit hash families behind SimHash / fingerprints: "md5" is
  * bit-reproducible by external engines (the oracle-check mode); "xx64" is
  * the fast production default. Both emit non-negative 60-bit longs, so
  * banding/chunking logic is family-agnostic.
  */
object HashFamily {
  val Md5 = "md5"
  val Xx64 = "xx64"
  def validate(family: String): String = family match {
    case Md5 | Xx64 => family
    case other => throw new IllegalArgumentException(
      s"unknown hash family '$other' (expected '$Md5' or '$Xx64')")
  }
}

/** 60-bit SimHash of a token array: the token hash (md5- or xxhash64-derived
  * 60-bit, per `family`) bit i votes +1/-1, output bit i set where the vote
  * sum is positive. Null tokens are skipped. 60 bits (not 64) so signatures
  * stay non-negative in engines without unsigned 64-bit integers.
  */
case class SimHash60Expr(child: Expression, family: String = HashFamily.Md5)
    extends UnaryExpression {
  HashFamily.validate(family)
  private def useMd5 = family == HashFamily.Md5

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = if (useMd5) Md5Hash.hash60(s) else XxHash60.hash60(s)
        var b = 0
        while (b < 60) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val hashCall =
        if (useMd5) "graft.functions.Md5Hash.hash60"
        else "graft.functions.XxHash60.hash60"
      s"""
         |final int $n = $a.numElements();
         |final int[] $votes = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final long $h = $hashCall($a.getUTF8String($i));
         |    for (int $b = 0; $b < 60; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($votes[$b] > 0) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)
}

/** Precomputed pigeonhole banding geometry for Hamming-distance search
  * (Manku, Jain & Das Sarma, WWW'07 §3 is the published shape): `bits`
  * split into `chunks` near-equal chunks (boundaries at i·bits/chunks),
  * one combination key per (chunks − maxDist)-subset of chunk indices in
  * lexicographic order, each key the concatenation of its chunks' values
  * (low selected chunk in the low bits). A pair within Hamming distance
  * maxDist flips bits in ≤ maxDist chunks, so it AGREES on ≥
  * chunks − maxDist whole chunks — hence shares ≥ 1 combination key:
  * recall is exactly 100% at every geometry. The flattened
  * (comboChunk, comboShift) tables make the per-row key loop a handful of
  * shift/mask/or ops per slot — built once per geometry, cached, shared by
  * interpreted eval and codegen.
  */
final class PigeonholeGeometry(val bits: Int, val chunks: Int, val maxDist: Int) {
  require(bits >= 1 && bits <= 64)
  require(maxDist >= 0 && maxDist < bits,
    s"pigeonhole banding needs maxDist in [0, $bits), got $maxDist")
  require(chunks > maxDist && chunks <= bits,
    s"chunk count must be in (maxDist, bits] = ($maxDist, $bits], got $chunks")

  private val lo = Array.tabulate(chunks + 1)(c => c * bits / chunks)
  private def width(i: Int) = lo(i + 1) - lo(i)
  private val combos = (0 until chunks).combinations(chunks - maxDist).toArray
  require(combos.length <= 4096,
    s"C($chunks, $maxDist) = ${combos.length} key expansions per row — cap " +
      "is 4096; lower the chunk count or split the distance budget across " +
      "AND-ed indexes")

  val comboLen: Int = chunks - maxDist
  val nCombos: Int = combos.length
  // slot tables, flattened combo-major: source shift, mask, dest shift
  private val srcShift = new Array[Int](nCombos * comboLen)
  private val mask = new Array[Long](nCombos * comboLen)
  private val dstShift = new Array[Int](nCombos * comboLen)
  for (c <- 0 until nCombos) {
    var off = 0
    for (s <- 0 until comboLen) {
      val ch = combos(c)(s)
      val k = c * comboLen + s
      srcShift(k) = lo(ch)
      mask(k) = if (width(ch) == 64) -1L else (1L << width(ch)) - 1L
      dstShift(k) = off
      off += width(ch)
    }
  }

  def keys(h: Long): Array[Long] = {
    val out = new Array[Long](nCombos)
    var k = 0
    var c = 0
    while (c < nCombos) {
      var key = 0L
      var s = 0
      while (s < comboLen) {
        key |= ((h >>> srcShift(k)) & mask(k)) << dstShift(k)
        s += 1; k += 1
      }
      out(c) = key
      c += 1
    }
    out
  }
}

object PigeonholeGeometry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), PigeonholeGeometry]()
  def get(bits: Int, chunks: Int, maxDist: Int): PigeonholeGeometry =
    cache.computeIfAbsent((bits, chunks, maxDist),
      k => new PigeonholeGeometry(k._1, k._2, k._3))
}

/** `pigeonhole_keys(h, bits, chunks, maxDist)`: the combination-key array of
  * [[PigeonholeGeometry]] over a LONG signature column — ONE small codegen'd
  * loop regardless of C(chunks, maxDist). The equivalent SQL array literal
  * of shift/or expressions blows the 64 KB Janino method limit at ~200
  * combos and drops the whole stage to interpreted eval (measured 6x on
  * q_m16's geometry); this expression IS the declarative plan's scale dial.
  */
case class PigeonholeKeysExpr(child: Expression, bits: Int, chunks: Int, maxDist: Int)
    extends UnaryExpression {
  // constructing the geometry eagerly validates the (bits, chunks, maxDist)
  // triple at plan time, not first-row time
  @transient private lazy val geom = PigeonholeGeometry.get(bits, chunks, maxDist)
  PigeonholeGeometry.get(bits, chunks, maxDist)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pigeonhole_keys expects a bigint signature, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pigeonhole_keys"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(geom.keys(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val g = ctx.addMutableState("graft.functions.PigeonholeGeometry", "pigeonGeom",
        v => s"$v = graft.functions.PigeonholeGeometry.get($bits, $chunks, $maxDist);")
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($g.keys($a));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PigeonholeKeysExpr =
    copy(child = newChild)
}

/** MinHash signature: each shingle is hashed once (XXH64), then the j-th
  * signature entry is the minimum of hashLong(h, j) over all shingles.
  * Empty input yields a signature of Long.MaxValue entries.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < numHashes) {
          val hj = XXH64.hashLong(h, j)
          if (hj < sig(j)) sig(j) = hj
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val hj = ctx.freshName("hj")
      s"""
         |final int $n = $a.numElements();
         |final long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    final long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      final long $hj = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, $j);
         |      if ($hj < $sig[$j]) $sig[$j] = $hj;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** Sign-random-projection bucket keys: for each of `tables` hash tables, a
  * `bits`-bit key whose j-th bit is the sign of the dot product with a
  * deterministic Rademacher hyperplane (component signs from
  * XXH64.hashLong over (table, bit, dim-index)). Null elements count as 0.
  */
/** Memoized SRP hyperplane signs: sign(t, j, i) depends only on (tables,
  * bits, seed, dim), never on the row, so deriving it per row paid
  * tables*bits*dim xxhash64 calls per VECTOR (~15k at 30 tables x 8 bits x
  * 64 dims — the dominant cost of bucketing a large corpus). One flat
  * byte matrix per distinct shape, computed once per JVM; the hash family
  * is unchanged, so bucket keys are bit-identical to the uncached form.
  */
object SrpSigns {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long, Int), Array[Byte]]()

  def get(tables: Int, bits: Int, seed: Long, dim: Int): Array[Byte] =
    cache.computeIfAbsent((tables, bits, seed, dim), _ => {
      val out = new Array[Byte](tables * bits * dim)
      var t = 0
      while (t < tables) {
        var j = 0
        while (j < bits) {
          var i = 0
          while (i < dim) {
            out((t * bits + j) * dim + i) =
              if ((XXH64.hashLong((t.toLong * bits + j) * 1000003L + i, seed) & 1L) == 1L) 1
              else -1
            i += 1
          }
          j += 1
        }
        t += 1
      }
      out
    })
}

case class SrpBucketKeysExpr(child: Expression, tables: Int, bits: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_buckets expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val signs = SrpSigns.get(tables, bits, seed, dim)
    // copy once into a primitive array: the sign loops touch each element
    // tables*bits times, and per-touch accessor calls (columnar vectors,
    // unsafe rows) dominate the arithmetic otherwise. Null elements
    // contribute 0, exactly like the skip in the accessor formulation.
    val vec = new Array[Float](dim)
    var i0 = 0
    while (i0 < dim) {
      if (!arr.isNullAt(i0)) vec(i0) = arr.getFloat(i0)
      i0 += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var acc = 0.0
        var i = 0
        while (i < dim) {
          acc += vec(i) * signs(base + i)
          i += 1
        }
        if (acc > 0) key |= (1L << j)
        j += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val key = ctx.freshName("key")
      val acc = ctx.freshName("acc")
      val signs = ctx.freshName("signs")
      val base = ctx.freshName("base")
      val vec = ctx.freshName("vec")
      s"""
         |final int $dim = $a.numElements();
         |final byte[] $signs = graft.functions.SrpSigns.get($tables, $bits, ${seed}L, $dim);
         |final float[] $vec = new float[$dim];
         |for (int $i = 0; $i < $dim; $i++) {
         |  if (!$a.isNullAt($i)) $vec[$i] = $a.getFloat($i);
         |}
         |final long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    final int $base = ($t * $bits + $j) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += $vec[$i] * $signs[$base + $i];
         |    }
         |    if ($acc > 0) $key |= (1L << $j);
         |  }
         |  $out[$t] = $key;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBucketKeysExpr =
    copy(child = newChild)
}
