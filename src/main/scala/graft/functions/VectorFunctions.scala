package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Dense-vector primitives over `ARRAY<FLOAT>`/`ARRAY<DOUBLE>` embedding
 * columns, expressed with `zip_with`/`aggregate` so they stay inside
 * codegen — no UDFs, no Breeze, works on any Spark cluster untouched.
 */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. A native single-loop codegen'd
    * expression (graft.plans.DotProduct) — the composed
    * aggregate(zip_with(...)) fold is interpreted; same left-to-right
    * accumulation, so results are bitwise-identical (spec-pinned).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0.0, d / nn).otherwise(lit(0.0))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(
      aggregate(
        zip_with(a, b, (x, y) => {
          val diff = x.cast(DoubleType) - y.cast(DoubleType)
          diff * diff
        }),
        lit(0.0),
        (acc, x) => acc + x
      )
    )

  /** Exact dot product in DECIMAL — order-independent and bit-reproducible
    * across engines (used by correctness oracles; double-precision `dot`
    * is the fast path).
    */
  def dotDecimal(a: Column, b: Column, scale: Int = 12): Column = {
    val dec = DecimalType(38, scale)
    aggregate(
      zip_with(a, b, (x, y) => (x.cast(DoubleType) * y.cast(DoubleType)).cast(dec)),
      lit(java.math.BigDecimal.ZERO).cast(dec),
      // decimal + widens precision/scale; re-cast each step so the merge
      // lambda's type matches the accumulator type exactly
      (acc, x) => (acc + x).cast(dec),
      acc => acc.cast(dec)
    )
  }

  /** Per-vector affine 8-bit quantization: `q_i = round((v_i − min) ·
    * 255 / (max − min))` in [0, 255], plus the `(offset = min, scale =
    * (max − min)/255)` pair that dequantizes it. The storage-scale lever
    * for embedding corpora — a 100 TB float32 embedding store drops to
    * ~25 TB plus two doubles per vector, and IVF/LSH candidate scans read
    * a quarter of the bytes; re-rank the short candidate list against the
    * float vectors when exactness matters. All elementwise double
    * arithmetic (min/max over the same floats, identical expression
    * order), so any engine reproduces the exact codes — oracle-gated, not
    * approximately checked. A constant vector (max == min) quantizes to
    * all-zero codes with scale 0 and dequantizes exactly.
    */
  def quantize8(vec: Column): Column = {
    // native one-pass codegen'd expression (graft.plans.Quantize8): the
    // composed transform/array_min/array_max chain is four interpreted
    // HOF walks per row — bit-parity with it is spec-pinned
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.Quantize8(ColumnBridge.expression(vec)))
  }

  /** Inverse of [[quantize8]]: `v̂_i = offset + q_i · scale`. Per-element
    * reconstruction error is at most scale/2 (spec-pinned).
    */
  def dequantize8(qv: Column): Column =
    transform(qv.getField("q"),
      q => qv.getField("offset") + q.cast(DoubleType) * qv.getField("scale"))

  /** Dot product of two [[quantize8]] structs WITHOUT dequantizing —
    * the quantized ANN scan kernel (graft.plans.QDot): the per-pair loop
    * is integer multiply-adds over the 8-bit codes (a quarter of
    * float32's memory traffic, the bandwidth-bound resource of a
    * 100 TB candidate scan) plus four exact affine correction terms in a
    * fixed order, so the score is deterministic and oracle-reproducible.
    * Equals `dot(dequantize8(a), dequantize8(b))` up to the affine
    * expansion's floating-point regrouping (spec-bounded); use the float
    * vectors to re-rank the short top-k list when exactness matters.
    */
  def quantizedDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.QDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Sign-random-projection bucket id: the vector's sign pattern against
    * `bits` pseudo-random hyperplanes derived from `seed`. Used for
    * LSH-bucketed ANN (cosine). A native expression
    * (graft.plans.SrpBucket) — the composed per-plane aggregate/zip_with
    * fold is interpreted and re-hashes (dim, plane, seed) per row, while
    * the ±1 sign matrix is data-independent; the native form computes it
    * once per task and the per-row cost is bits × dim double adds.
    * Equivalence (including null-element and empty-vector parity) is
    * spec-pinned.
    */
  def srpBucket(vec: Column, bits: Int, seed: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.SrpBucket(ColumnBridge.expression(vec), bits, seed))
  }
}
