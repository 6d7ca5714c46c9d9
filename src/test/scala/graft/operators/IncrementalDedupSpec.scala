package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Cross-batch property tests for IncrementalDedup (VERDICT r5 item
  * 5): a growing corpus must evolve as corpus ∪ accepted-batch, with
  * rejected docs never re-entering, and the whole algebra must agree
  * with a driver-side brute-force reimplementation on generated
  * near-dup corpora.
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private val threshold = 0.5

  private def shingleSet(text: String): Set[String] =
    text.toLowerCase.split(" ").toSeq.sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toSet

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver-side reimplementation: best corpus match per rejected
    * batch doc — same rounded-jaccard-then-lowest-cid tiebreak.
    */
  private def bruteMatches(corpus: Seq[(Long, String)],
                           batch: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val cs = corpus.map { case (id, t) => id -> shingleSet(t) }
    batch.flatMap { case (bid, bt) =>
      val bs = shingleSet(bt)
      val cands = cs.flatMap { case (cid, cset) =>
        val i = (bs & cset).size
        if (i == 0) None
        else {
          val j = i.toDouble / (bs.size + cset.size - i)
          if (j >= threshold) Some((cid, round6(j))) else None
        }
      }
      if (cands.isEmpty) None
      else Some(bid -> cands.minBy { case (cid, j) => (-j, cid) })
    }.toMap
  }

  private def toDf(docs: Seq[(Long, String)]): DataFrame =
    docs.toDF("doc_id", "text")

  private def sparkMatches(corpus: Seq[(Long, String)],
                           batch: Seq[(Long, String)]): Map[Long, (Long, Double)] =
    IncrementalDedup.matches(toDf(corpus), toDf(batch), threshold)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  /** Seeded corpus generator: fresh docs from a small vocab plus
    * explicit 1-token mutations of earlier docs (organic near-dups).
    */
  private def genDocs(seed: Long, n: Int): Vector[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
    (0 until n).foreach { _ =>
      if (docs.nonEmpty && rnd.nextDouble() < 0.4) {
        // near-dup: mutate one token of an earlier doc
        val base = docs(rnd.nextInt(docs.size))
        val pos = rnd.nextInt(base.size)
        docs += base.updated(pos, vocab(rnd.nextInt(vocab.size)))
      } else {
        docs += Vector.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
      }
    }
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }.toVector
  }

  private def assertParity(got: Map[Long, (Long, Double)],
                           want: Map[Long, (Long, Double)], tag: String): Unit = {
    assert(got.keySet === want.keySet, s"$tag rejected sets differ")
    got.foreach { case (bid, (cid, j)) =>
      val (wc, wj) = want(bid)
      assert(cid === wc, s"$tag best match for $bid")
      assert(math.abs(j - wj) < 1e-6, s"$tag jaccard for $bid: $j vs $wj")
    }
  }

  test("two-batch evolution matches brute force; rejected docs never re-enter") {
    var rejectedWouldHaveMattered = 0
    (1L to 5L).foreach { seed =>
      val docs = genDocs(seed, 45)
      val corpus = docs.slice(0, 15)
      val b1 = docs.slice(15, 30)
      val b2 = docs.slice(30, 45)

      // batch 1: Spark decisions == brute force
      val d1 = sparkMatches(corpus, b1)
      val w1 = bruteMatches(corpus, b1)
      assertParity(d1, w1, s"seed=$seed b1")

      // corpus evolves by the ACCEPTED docs only
      val a1 = b1.filterNot(d => d1.contains(d._1))
      val r1 = b1.filter(d => d1.contains(d._1))
      val corpus2 = corpus ++ a1

      // batch 2 against the evolved corpus: Spark == brute — i.e.
      // (corpus ∪ accepted(B1)) then B2 ≡ sequential processing
      val d2 = sparkMatches(corpus2, b2)
      val w2 = bruteMatches(corpus2, b2)
      assertParity(d2, w2, s"seed=$seed b2")

      // rejected docs never re-enter: no decision may name a rejected
      // batch-1 doc, and the wrong corpus (with rejects re-added) must
      // eventually give DIFFERENT decisions somewhere across seeds —
      // proving the property is non-vacuous
      val rejectedIds = r1.map(_._1).toSet
      assert(d2.values.forall { case (cid, _) => !rejectedIds.contains(cid) },
        s"seed=$seed: decision names a rejected batch-1 doc")
      val wWrong = bruteMatches(corpus2 ++ r1, b2)
      if (wWrong != w2) rejectedWouldHaveMattered += 1
    }
    assert(rejectedWouldHaveMattered > 0,
      "generator never produced a case where a rejected doc would have " +
        "changed batch-2 decisions — property is vacuous, strengthen the generator")
  }

  test("idempotence: re-submitting accepted docs against the evolved corpus rejects all of them") {
    val docs = genDocs(99L, 30)
    val corpus = docs.slice(0, 15)
    val b1 = docs.slice(15, 30)
    val d1 = sparkMatches(corpus, b1)
    val a1 = b1.filterNot(d => d1.contains(d._1))
    val corpus2 = corpus ++ a1
    // every accepted doc is now IN the corpus: J=1.0 with itself
    val again = sparkMatches(corpus2, a1)
    val longEnough = a1.filter(d => shingleSet(d._2).nonEmpty)
    assert(longEnough.forall(d => again.contains(d._1)),
      "an accepted-and-ingested doc was accepted twice")
    longEnough.foreach { d =>
      val (_, j) = again(d._1)
      assert(j === 1.0, s"self-match jaccard for ${d._1} is $j")
    }
  }
}
