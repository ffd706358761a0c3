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

  /** Characters of `w` as a symbol array (dropping Java split's
    * trailing empty element). */
  private def charSyms(w: Column): Column =
    slice(split(w, ""), lit(1), length(w))

  /** Frequency-weighted adjacent pair counts over a (syms, freq)
    * vocabulary frame — [[bpePairCounts]] generalized to mid-training
    * vocabularies whose symbols are already multi-character. */
  private def pairCountsOf(vocab: DataFrame): DataFrame = {
    val s = col("syms")
    val pairs = zip_with(
      slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
      (a, b) => struct(a.as("s1"), b.as("s2")))
    vocab.where(size(s) >= 2)
      .select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum("freq").as("n"))
  }

  /** One greedy-leftmost merge pass of `(a, b) → ab` over a symbol
    * array, as a single HOF fold: append each symbol, except that a
    * symbol `b` arriving while the accumulator ends in `a` replaces
    * that `a` with the merged `ab`. Left-to-right with the merged
    * symbol ineligible for immediate re-merging — exactly BPE's
    * non-overlapping leftmost application ("aaa" under (a,a) becomes
    * [aa, a], never [a, aa]). `try_element_at` keeps the empty-
    * accumulator probe null (→ no merge) instead of an ANSI
    * out-of-bounds error. HOF lambdas run interpreted, but every
    * caller applies this to VOCABULARY-sized frames, never the
    * corpus. */
  private def mergePass(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** BPE training (Sennrich et al. ACL 2016): `nMerges` rounds of
    * count-pairs → take the most frequent (ties: n desc, s1 asc, s2
    * asc — a pinned total order, so training is deterministic) →
    * merge it everywhere. Returns (merge list in learned order with
    * its winning count, final (w, freq, syms) vocabulary).
    *
    * Scale shape: the corpus collapses to the word-frequency table
    * once ([[wordFreq]] — the only corpus-scale stage); every round
    * then runs one vocabulary-sized aggregate plus a 1-row argmax
    * collect — the same driver-round pattern as the k-means and CC
    * loops, with the per-round frame localCheckpointed so lineage
    * doesn't nest `nMerges` HOF folds deep. */
  def learnBpe(docs: DataFrame, textCol: String, nMerges: Int)
      : (Seq[(String, String, Long)], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var vocab = wordFreq(docs, textCol)
      .select(col("w"), col("freq"), charSyms(col("w")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    for (_ <- 1 to nMerges if !exhausted) {
      val top = pairCountsOf(vocab)
        .orderBy(col("n").desc, col("s1"), col("s2")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges += ((a, b, n))
        val next = vocab.withColumn("syms", mergePass(col("syms"), a, b))
          .localCheckpoint()
        vocab.unpersist(blocking = false)
        vocab = next
      }
    }
    (merges.toSeq, vocab)
  }

  /** Apply a learned merge list to arbitrary words (the tokenizer's
    * ENCODE step): fold the merges in learned order, each as one
    * [[mergePass]]. Appends `syms` — the word's subword tokens.
    * Callers encode a vocabulary frame (distinct words), never raw
    * token instances: the fold is per distinct word, and corpus
    * statistics ride the frequency column.
    *
    * The input is materialized (localCheckpoint) before the folds:
    * left lazy, CollapseProject merges the HOF fold chain into the
    * caller's vocabulary AGGREGATE as result expressions, and the
    * CodegenFallback lambdas then knock the whole corpus-scale
    * aggregation stage out of whole-stage codegen — measured 14×
    * slower end-to-end at sf0.1. The barrier costs one vocabulary-
    * sized action (the input's contracted scale). */
  def encodeBpe(words: DataFrame, wCol: String,
      merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
      words.localCheckpoint().withColumn("syms", charSyms(col(wCol)))) {
      case (df, (a, b)) => df.withColumn("syms", mergePass(col("syms"), a, b))
    }

  /** Vocabulary-coverage diagnostic: with the word vocabulary capped
    * at the top `vocabSize` words by corpus frequency (ties: word
    * ascending — pinned so the cut is deterministic), what fraction
    * of each group's token INSTANCES is covered, and how many
    * distinct OOV types does the group carry? The go/no-go check
    * before freezing a tokenizer's vocab size — instance coverage is
    * what the model sees; a 99% type-coverage vocab can still leave
    * 10% of instances OOV on a skewed corpus.
    *
    * Scale shape: the vocabulary is elected once from the corpus-wide
    * [[wordFreq]] aggregate (the only corpus-keyed shuffle; the top-V
    * rank is a WindowGroupLimit-prunable row_number over the
    * vocabulary-sized frame), then broadcast-joined onto the per-group
    * token aggregate. Returns one row per `groupCol` value:
    * (group, n_tokens, n_oov_tokens, n_oov_types, oov_pct). */
  def vocabCoverage(docs: DataFrame, textCol: String, groupCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    import org.apache.spark.sql.expressions.Window
    // ONE corpus tokenize: the per-group counts are the operator's
    // working frame AND the source the corpus-wide vocabulary election
    // reduces from (the dsirWeights reuse-the-count-frame discipline —
    // re-running wordFreq over docs would double the dominant pass)
    val perGroup = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 1) // wordFreq's vocabulary domain
      .groupBy(col(groupCol), col("w")).agg(count(lit(1)).as("__n"))
      .persist()
    val vocab = perGroup.groupBy("w").agg(sum("__n").as("freq"))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("freq").desc, col("w").asc)))
      .where(col("__rk") <= vocabSize)
      .select(col("w"), lit(1).as("__in_vocab"))
    Checkpoints.materialize(
      perGroup.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col(groupCol))
        .agg(sum("__n").as("n_tokens"),
          coalesce(sum(when(col("__in_vocab").isNull, col("__n"))), lit(0L))
            .as("n_oov_tokens"),
          count(when(col("__in_vocab").isNull, lit(1))).as("n_oov_types"))
        .withColumn("oov_pct",
          round(col("n_oov_tokens") * lit(100.0) / col("n_tokens"), 4)),
      perGroup)
  }
}
