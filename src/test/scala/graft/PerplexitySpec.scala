package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** CCNet-style bigram-LM perplexity scoring (TextOps.perplexityScore):
  * capped vocab, stupid backoff, codegen-only scoring. */
class PerplexitySpec extends AnyFunSuite {
  import TestSpark._

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand-checked model: in-model text scores exactly, unseen backs off") {
    // model corpus: "a b a b" -> N=4, c(a)=2, c(b)=2,
    // bigrams: c(a b)=2, c(b a)=1
    val model = df(0L -> "a b a b")
    val out = TextOps.perplexityScore(df(1L -> "a b", 2L -> "a z"), model)
      .orderBy("doc_id").collect()
    // doc 1: logP_uni(a) = log(2/5); logP(b|a) = log(2/2) = 0
    val lp1 = math.log(2.0 / 5.0)
    val exp1 = math.exp(-lp1 / 2)
    // doc 2: logP_uni(a) = log(2/5); z unseen -> unk mass = 4-4+1 = 1:
    // logP(z|a) = log(0.4 * 1/5)
    val lp2 = math.log(2.0 / 5.0) + math.log(0.4 * 1.0 / 5.0)
    val exp2 = math.exp(-lp2 / 2)
    assert(math.abs(out(0).getDouble(2) - exp1) < 1e-12)
    assert(math.abs(out(1).getDouble(2) - exp2) < 1e-12)
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 2L))
  }

  test("model-like text scores lower perplexity than scrambled text") {
    val model = df((0L until 50L).map(i =>
      i -> "the quick brown fox jumps over the lazy dog"): _*)
    val out = TextOps.perplexityScore(
      df(1L -> "the quick brown fox", 2L -> "dog the over fox quick"),
      model).orderBy("doc_id").collect()
    assert(out(0).getDouble(2) < out(1).getDouble(2),
      s"in-domain ${out(0).getDouble(2)} should beat scrambled ${out(1).getDouble(2)}")
  }

  test("vocab cap pools dropped tokens into unk, never zero probability") {
    // vocabSize=1 keeps only the most frequent token
    val model = df(0L -> "a a a b c")
    val out = TextOps.perplexityScore(df(1L -> "b c b"), model,
      vocabSize = 1)
    val ppl = out.head().getDouble(2)
    assert(!ppl.isInfinite && !ppl.isNaN && ppl > 0)
  }

  test("partitioning-invariant (golden-pin eligibility) on real documents") {
    val c = Tables.load(spark, sf, "documents")
    val a = TextOps.perplexityScore(c, c).orderBy("doc_id").collect().toSeq
    val b = TextOps.perplexityScore(c.repartition(3), c.repartition(5))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty && a.forall(r => r.getDouble(2) > 0))
  }
}
