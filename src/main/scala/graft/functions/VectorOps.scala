package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, udf}

/** Hot-path vector kernels. Semantically identical to the declarative
  * zip_with/aggregate HOF formulation (left-to-right fold in double —
  * the order DuckDB's list_reduce uses, so oracle results stay
  * bit-identical), but ~30× faster: Catalyst's higher-order functions
  * evaluate the lambda per element; these run a primitive while-loop
  * per row. At 2M pairs × 64 dims that is the difference between 76 s
  * and ~2 s on this machine.
  *
  * Two tiers: the native codegen expressions (VecExpressions — no UDF
  * boundary at all, preferred; Tables.embeddings registers them) and an
  * Array[Float] UDF fallback for sessions without the registration.
  */
object VectorOps {

  // Array[Float] (not Seq) so the Catalyst ArrayData arrives via a
  // primitive toFloatArray copy — no per-element boxing on the hot path.
  private val dotUdf = udf { (a: Array[Float], b: Array[Float]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private val ssqUdf = udf { a: Array[Float] =>
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    s
  }

  @volatile private[graft] var nativeRegistered = false

  /** Σ aᵢ·bᵢ in double, index order. */
  def dot(a: Column, b: Column): Column =
    if (nativeRegistered) call_function("graft_vec_dot", a, b) else dotUdf(a, b)

  /** Σ aᵢ² in double, index order. */
  def ssq(a: Column): Column =
    if (nativeRegistered) call_function("graft_vec_ssq", a) else ssqUdf(a)

  private val l2sqUdf = udf { (a: Array[Double], b: Array[Double]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Σ (aᵢ−bᵢ)² over double arrays, index order. */
  def l2sq(a: Column, b: Column): Column =
    if (nativeRegistered) call_function("graft_vec_l2sq", a, b) else l2sqUdf(a, b)
}
