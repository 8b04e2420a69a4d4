package graft.plans

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression,
  Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** Codegen CANARY for every native graft expression.
  *
  * Why this exists: Spark's `UnsafeProjection.create` wraps codegen in
  * `CodeGeneratorWithInterpretedFallback` — a Janino compile error is
  * logged as a WARN ("Expr codegen error and falling back to interpreter
  * mode") and the projection silently runs interpreted. Results stay
  * correct, so NO correctness oracle can catch the regression; the only
  * witnesses are log lines nobody asserts on. That is exactly how
  * `interleave_bits` shipped with generated code Janino cannot parse
  * (`<< (2 * i)` — Janino tries to parse the parenthesized RHS as a cast
  * type) and ran interpreted on every z-order path for a full round.
  *
  * `GenerateUnsafeProjection.generate` has NO fallback — a
  * CompileException propagates and fails the test. Each native
  * expression gets one direct-compile case here, so a codegen break in
  * ANY of them is a red test, not a log line. (Per-expression
  * WholeStageCodegen fusion assertions live in their own specs; this
  * suite pins the lower layer: the generated Java actually compiles.)
  */
class NativeCodegenCanarySpec extends AnyFunSuite {

  private val vecA = BoundReference(0, ArrayType(DoubleType), nullable = true)
  private val vecB = BoundReference(1, ArrayType(DoubleType), nullable = true)
  private val str = BoundReference(0, StringType, nullable = true)
  private val lngA = BoundReference(0, LongType, nullable = true)
  private val lngB = BoundReference(1, LongType, nullable = true)
  private val arrL =
    BoundReference(0, ArrayType(LongType), nullable = true)
  private val arrL2 =
    BoundReference(1, ArrayType(LongType), nullable = true)

  private def assertCompiles(e: Expression): Unit = {
    // Throws (wrapped CompileException) if the generated Java is invalid;
    // evaluating one row additionally catches verify-time errors.
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    assert(proj != null)
  }

  test("interleave_bits generated code compiles") {
    assertCompiles(InterleaveBits(lngA, lngB))
  }

  test("vec_dot generated code compiles") {
    assertCompiles(VecDot(vecA, vecB))
  }

  test("poly_hash generated code compiles") {
    assertCompiles(PolyHash(str))
  }

  test("intersect_count generated code compiles (long and string keys)") {
    assertCompiles(IntersectCount(arrL, arrL2))
    assertCompiles(IntersectCount(
      BoundReference(0, ArrayType(StringType), nullable = true),
      BoundReference(1, ArrayType(StringType), nullable = true)))
  }

  test("lsh_buckets generated code compiles") {
    assertCompiles(LshBuckets(vecA, nPlanes = 16, nTables = 8,
      dim = 64, planeOffset = 0))
  }

  test("nearest_cell generated code compiles") {
    val mat = Literal.create(Seq(1.0, 0.0, 0.0, 1.0),
      ArrayType(DoubleType, containsNull = false))
    val nrm = Literal.create(Seq(1.0, 1.0),
      ArrayType(DoubleType, containsNull = false))
    val ids = Literal.create(Seq(0L, 1L),
      ArrayType(LongType, containsNull = false))
    assertCompiles(NearestCell(vecA, mat, nrm, ids))
  }

  test("nfc_normalize generated code compiles") {
    assertCompiles(NfcNormalize(str))
  }

  test("bloom_might_contain generated code compiles") {
    val bf = BloomFilter.create(100L)
    bf.putLong(42L)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    assertCompiles(BloomMightContain(Literal(bos.toByteArray), lngA))
  }
}
