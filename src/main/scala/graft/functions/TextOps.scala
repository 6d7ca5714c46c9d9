package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization helpers that survive Catalyst's projection collapse.
  *
  * The r14 find (jstack on the sf100 probe, then microbenched): writing
  * `select(split(text).as("t")).select(transform(..., i -> f(t, i)))`
  * lets CollapseProject INLINE the split into the lambda body — aliases
  * referenced from inside a LambdaFunction scope evade the rule's
  * multi-reference cost check — so the document is re-split PER SHINGLE
  * ELEMENT: O(tokens²) per row. Measured at sf1 on the 3-gram shingle
  * count: 49.0 s collapsed vs 21.7 s let-bound (≈3× on compute time),
  * identical results; the gap grows with document length, and the
  * collapsed form is what burned the r13/r14 sf100 probes.
  *
  * [[let1]] is the general let-binding: evaluate `bound` ONCE per row
  * and pass it into the body as a lambda VARIABLE — lambda variables
  * are never inlined, so the binding is collapse-proof by construction.
  * PlanQualitySpec gates the whole declared surface on the structural
  * signature (a loop-invariant split inside any HOF lambda).
  */
object TextOps {

  /** `let t = bound in body(t)` — `bound` evaluates exactly once per
    * row regardless of how many times `body` references it.
    */
  def let1(bound: Column, body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** Whitespace tokens of lower-cased text. */
  def tokens(textCol: Column): Column = split(lower(textCol), " ")

  /** Distinct n-token shingles of lower-cased text, split evaluated
    * once per row (the Lsh/dedup generator shape; guards docs shorter
    * than the shingle — Spark sequence(1, 0) is descending [1, 0]).
    */
  def tokenShingles(textCol: Column, n: Int): Column =
    let1(tokens(textCol), t => shinglesOfTokens(t, n))

  /** Distinct n-token shingles of a pre-split token array column.
    * Only safe when `t` is a lambda variable or single-use alias —
    * prefer [[tokenShingles]] from raw text.
    */
  def shinglesOfTokens(t: Column, n: Int): Column =
    array_distinct(transform(
      slice(sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
        lit(1), greatest(size(t) - (n - 1), lit(0))),
      i => concat_ws(" ", slice(t, i, lit(n)))))
}
