package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-training statistics — the counting step of BPE (Sennrich
  * et al., "Neural Machine Translation of Rare Words with Subword
  * Units", ACL 2016): adjacent-symbol pair frequencies over the
  * corpus, weighted by word frequency. Each merge iteration of BPE
  * training picks the most frequent pair; this operator computes that
  * ranking at corpus scale.
  *
  * Scale shape: the corpus collapses to a word-frequency table FIRST
  * (one token-keyed aggregate — vocabulary-sized output), and the
  * character-pair explosion runs over the vocabulary, not the corpus:
  * at 100 TB the expensive stage is the one aggregate, and everything
  * after costs what a dictionary costs. Pure built-ins
  * (split/slice/zip_with) — no UDF, stays inside codegen.
  */
object Tokenizer {

  /** Word-frequency table: (w, freq) over whitespace tokens. Words of
    * length ≤ 1 carry no pairs and are dropped here, where it prunes
    * the vocabulary rather than the pair frame. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Adjacent character-pair frequencies weighted by word frequency:
    * (s1, s2, n) where `n` sums the owning words' corpus counts —
    * exactly the statistic BPE maximizes per merge. */
  def bpePairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val cs: Column = split(col("w"), "")
    // slice off length(w), not size(cs): Java split keeps a trailing
    // empty element under Spark's limit=-1, so size(cs) = length+1
    val n: Column = length(col("w"))
    val pairs = zip_with(
      slice(cs, lit(1), n - 1), slice(cs, lit(2), n - 1),
      (a, b) => struct(a.as("s1"), b.as("s2")))
    wordFreq(docs, textCol)
      .select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum("freq").as("n"))
  }
}
