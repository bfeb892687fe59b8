package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Per-ROW MinHash state over a token array: EIGHT 4-hex md5 slice
  * minima (the q26 signature contract, reference `mongo2pq`'s dedup
  * has no equivalent — this is the [EXT] LSH family) plus the doc's
  * DISTINCT 3-gram xxhash64 set, in ONE tight pass.
  *
  * Why 8 x 16-bit minima and not 4 x 32-bit: candidate generation
  * AND-combines them into 2 bands of r = 4 (Dedup.nearDupPairsFrom).
  * With r = 1 a band bucket holds every doc whose minimum shingle is
  * the globally-smallest-hashed POPULAR shingle — measured 94k docs
  * in one bucket at 100x sf0.1, 5.3e9 candidate pairs from one band
  * (a quadratic cliff: background Jaccard between unrelated docs is
  * what collides, and that is corpus-size-invariant). r = 4 raises
  * the per-band collision to J^4 — the same 100x corpus measures 19M
  * candidates total (biggest bucket 1356) with 1-(1-J^4)^2 >= 96.6%
  * per-pair recall at the J ~ 0.95 replicas dedup actually hunts.
  * All 8 minima still come from ONE md5 (16-bit slices of the same
  * digest), so the map-side cost is unchanged.
  *
  * Why an Expression and not SQL: the construction IS expressible as
  * nested higher-order functions (`transform`/`array_min` over
  * md5/xxhash64 — the r4 interim form), but Spark evaluates HOF
  * lambdas interpreted, one Expression-tree walk per element; measured
  * ~7 us per gram (md5 through commons-codec allocating a MessageDigest
  * per call, plus per-element boxing), which put a 1.8 s serial floor
  * under every near-dup query at sf0.1. This kernel does the identical
  * arithmetic in one JVM loop: ONE MessageDigest instance per row, no
  * per-element Expression dispatch, band minima tracked as unsigned
  * 32-bit ints (the lexicographic min of an 8-hex slice IS the numeric
  * min of its 4 digest bytes — hex digits ascend in ASCII), formatted
  * once at the end.
  *
  * Parity contracts (pinned by FunctionsSpec against the SQL forms):
  *  - gram text: tokens joined with ' ' — `concat_ws` semantics
  *    (nulls skipped); <3 tokens => zero grams => empty set + NULL
  *    minima (callers filter those rows out first).
  *  - mh_k == min(substring(md5(gram), 4k+1, 4)) — byte-identical to
  *    the DuckDB oracle's `substr(md5(s), ...)`.
  *  - shs == array_distinct(transform(grams, g -> xxhash64(g))) as a
  *    SET, emitted SORTED ASCENDING — the precondition of the
  *    two-pointer `intersect_count` verify kernel (one O(n log n)
  *    sort per doc here buys O(na+nb) allocation-free intersection
  *    per candidate pair there; a doc in k pairs amortizes the sort
  *    k times). Consumers that only size() the set are unaffected.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = MinHashSig.schema
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    MinHashSig.compute(a.asInstanceOf[ArrayData])

  /** Codegen matters here beyond raw speed: a projection that selects
    * all five struct fields holds five `GetStructField(minhash_sig(
    * toks), k)` trees, and only whole-stage codegen's subexpression
    * elimination collapses the five identical kernel calls into ONE —
    * a CodegenFallback version re-ran the kernel per field (5x per
    * row, measured as q26 1.8s -> 11s). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$cls.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  val nBands = 8

  val schema: StructType = StructType(
    StructField("shs", ArrayType(LongType, containsNull = false)) +:
      (0 until nBands).map(k => StructField(s"mh$k", StringType)))

  private val HEX = "0123456789abcdef".toCharArray

  /** Shared by interpreted eval (and any future codegen): one pass,
    * one digest instance, unsigned-int band minima. */
  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val md = MessageDigest.getInstance("MD5")
    // unsigned 32-bit minima as longs; MaxValue sentinel = "no gram yet"
    val mins = Array.fill(nBands)(Long.MaxValue)
    val set = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i + 2 < n) {
      // gram bytes: concat_ws(' ', t[i], t[i+1], t[i+2]) — null tokens
      // are skipped, separators only between present elements
      var len = 0
      var present = 0
      var j = 0
      while (j < 3) {
        if (!toks.isNullAt(i + j)) { len += toks.getUTF8String(i + j).numBytes(); present += 1 }
        j += 1
      }
      if (present > 1) len += present - 1
      val bytes = new Array[Byte](len)
      var off = 0
      var wrote = 0
      j = 0
      while (j < 3) {
        if (!toks.isNullAt(i + j)) {
          if (wrote > 0) { bytes(off) = ' '; off += 1 }
          val u = toks.getUTF8String(i + j)
          u.writeToMemory(bytes, Platform.BYTE_ARRAY_OFFSET + off)
          off += u.numBytes()
          wrote += 1
        }
        j += 1
      }
      md.reset()
      val digest = md.digest(bytes)
      var k = 0
      while (k < nBands) {
        val v = ((digest(2 * k) & 0xffL) << 8) | (digest(2 * k + 1) & 0xffL)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      set.add(XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, len, 42L))
      i += 1
    }
    val shs = new Array[Long](set.size())
    val it = set.iterator()
    var p = 0
    while (it.hasNext) { shs(p) = it.next(); p += 1 }
    java.util.Arrays.sort(shs) // the intersect_count precondition
    val out = new Array[Any](1 + nBands)
    out(0) = new GenericArrayData(shs)
    var k = 0
    while (k < nBands) {
      out(1 + k) = if (mins(k) == Long.MaxValue) null else {
        val v = mins(k)
        val cs = new Array[Char](4)
        var b = 0
        while (b < 4) { cs(b) = HEX(((v >>> (12 - 4 * b)) & 0xfL).toInt); b += 1 }
        UTF8String.fromString(new String(cs))
      }
      k += 1
    }
    new GenericInternalRow(out)
  }
}
