package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Byte-pair-encoding subword tokenizer — the REAL production budget
  * unit behind the [[Sampling]] token-budget family's tokenizer-as-a-
  * parameter hook ([[TextAnalysis.subwordCount]] was the stand-in until
  * round 18). Implements the public algorithm pair (Sennrich et al. 2016
  * learning; the GPT-2 encoder's merge loop) over a deterministic
  * pre-tokenization, with the merges table as a PLAIN VALUE — small enough
  * to ride in a closure/plan literal, exactly how production systems ship
  * their merges file to executors.
  *
  * Design decisions, all for cross-engine determinism:
  *  - pre-tokenization is [[TextAnalysis.subwordCount]]'s own RE2-safe
  *    pattern (`[a-z0-9]+|[^a-z0-9\s]` over the lowercased text), so BPE
  *    strictly REFINES the subword stand-in: same word boundaries, real
  *    merges inside them. No byte-level alphabet (the corpus is text;
  *    character symbols keep fixtures and oracles readable) and no
  *    end-of-word marker — counts, not detokenization, are the product.
  *  - learning picks the (count DESC, pair ASC) argmax each round — fully
  *    deterministic, no hash-order dependence; ties cannot flip the table
  *    between runs or engines.
  *  - encoding merges ALL occurrences of the lowest-rank adjacent pair per
  *    round, leftmost-first (the GPT-2 loop), so any faithful
  *    re-implementation lands on identical token counts — pinned by the
  *    Spark-independent recompute in
  *    [[graft.verify.IndependentOracles.bpeCounts]].
  *
  * Scale shape: FIT is one word-frequency aggregate collected to a CAPPED
  * driver table (top `maxVocab` by count — the Zipf head carries all merge
  * mass; the ivfFit offline-index pattern) followed by a driver-local merge
  * loop over that vocab — numMerges × vocab work, independent of corpus
  * size. ENCODE is a pure mapPartitions projection — no shuffle, pipelines
  * with the scan — with a per-partition word→count memo (Zipf again: the
  * memo hit rate makes the amortized cost per token ~a hash probe, and the
  * memo is per-partition so executors share nothing). */
object Bpe {

  /** the shared pre-tokenization pattern (lowercased input): alphanumeric
    * runs and single non-space punctuation — [[TextAnalysis.subwordCount]]'s
    * units, which BPE refines. */
  val PreTokenPattern = "[a-z0-9]+|[^a-z0-9\\s]"

  /** an ordered merges table; rank = position. Equality/hash are by the
    * merge list, so models memoize cleanly. */
  final case class BpeModel(merges: Vector[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap
    require(merges.distinct.length == merges.length,
      "BpeModel: duplicate merge pair — a rank table must be injective")
  }

  private[graft] def preTokens(text: String): Iterator[String] = {
    // Locale.ROOT, matching the dictionary path's Spark lower() (locale-
    // independent): under e.g. a Turkish default locale 'I' would lower to
    // dotless i here only, silently breaking the documented result-identity
    // between tokenCounts and tokenCountsDict
    val m = java.util.regex.Pattern.compile(PreTokenPattern)
      .matcher(Option(text).getOrElse("").toLowerCase(java.util.Locale.ROOT))
    new Iterator[String] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): String = { val s = m.group(); has = m.find(); s }
    }
  }

  /** one encode round: merge ALL adjacent occurrences of `pair`,
    * leftmost-first (consumed symbols can't re-pair within the round). */
  private def mergeAll(syms: Vector[String],
                       pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** GPT-2 encoder loop on one pre-token: start from character symbols,
    * repeatedly merge the LOWEST-RANK adjacent pair present in the table
    * until none qualifies. Returns the final symbols. */
  private[graft] def encodeWord(word: String, model: BpeModel): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = model.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else {
        syms = mergeAll(syms, best)
        done = syms.length < 2
      }
    }
    syms
  }

  /** BPE token count of a full text: Σ over pre-tokens of the encoded
    * symbol count, with a caller-supplied memo (per partition in the
    * distributed kernel; fresh in tests). */
  private[graft] def countText(text: String, model: BpeModel,
                               memo: scala.collection.mutable.HashMap[String, Int]): Int = {
    var n = 0
    preTokens(text).foreach { w =>
      n += memo.getOrElseUpdate(w, encodeWord(w, model).length)
    }
    n
  }

  /** Sennrich et al. learning over a (word, frequency) table: each round
    * merges the globally most frequent adjacent symbol pair
    * (count DESC, pair ASC ties). Stops early when no pair occurs twice —
    * merges learned from singleton pairs are noise. */
  def learn(wordFreqs: Seq[(String, Long)], numMerges: Int): BpeModel = {
    require(numMerges >= 1, s"learn: numMerges must be >= 1, got $numMerges")
    var vocab: Vector[(Vector[String], Long)] =
      wordFreqs.iterator.filter(_._1.nonEmpty)
        .map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      val candidates = counts.iterator.filter(_._2 >= 2).toVector
      if (candidates.isEmpty) done = true
      else {
        val (best, _) = candidates.reduceLeft { (a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 &&
            (b._1._1 < a._1._1 ||
              (b._1._1 == a._1._1 && b._1._2 < a._1._2)))) b else a
        }
        merges += best
        vocab = vocab.map { case (syms, f) => (mergeAll(syms, best), f) }
        round += 1
      }
    }
    BpeModel(merges.result())
  }

  /** distributed FIT: word frequencies from one explode+count aggregate,
    * capped to the top `maxVocab` (count DESC, word ASC — the Zipf head,
    * where all merge mass lives) before the bounded driver collect, then
    * [[learn]]. The TakeOrdered cap is what keeps this an offline-index
    * step at 100 TB: the collected table is maxVocab-sized no matter the
    * corpus. */
  def fit(df: DataFrame, textCol: String, numMerges: Int,
          maxVocab: Int = 65536): BpeModel = {
    require(maxVocab >= 1, s"fit: maxVocab must be >= 1, got $maxVocab")
    val freqs = df
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit(PreTokenPattern), lit(0))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).cast(LongType).as("__f"))
      .orderBy(desc("__f"), asc("__w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    learn(freqs, numMerges)
  }

  /** distributed ENCODE-and-count: (id, n_bpe) per row. The model rides the
    * closure (merges-table-sized, the broadcast-literal shape); symbols
    * memoize per partition. No shuffle — pure projection.
    *
    * This is the STREAMING / per-row twin: stateless per partition, so it
    * composes onto a stream unchanged. For batch corpora prefer
    * [[tokenCountsDict]] — the per-partition memo's hit rate collapses as
    * the vocabulary widens (measured 14.6x at 100x data, round-18 Appendix
    * B), where the dictionary join stays vocab-bounded. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(textCol).cast(StringType))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, text) =>
          (id, countText(text, model, memo).toLong)
        }
      }
      .select(col("_1").as(idCol), col("_2").as("n_bpe"))
  }

  /** dictionary-join ENCODE-and-count — the BATCH production path, result
    * identical to [[tokenCounts]] by construction (n_bpe = Σ_w c(doc,w) ·
    * |encode(w)|; equivalence asserted in BpeSpec): tokenize → one
    * map-side-combined (doc, word) count aggregate → encode each DISTINCT
    * word exactly ONCE (a vocabulary-sized mapPartitions — the merge loop,
    * the expensive part, runs |vocab| times total instead of once per
    * memo-miss) → join the per-word symbol lengths back and sum per doc.
    *
    * Scale shape: every stage after tokenization is bounded by distinct
    * (doc, word) pairs or the vocabulary, never by token instances — the
    * q_pmi cost law (~7x at 100x) instead of the memo kernel's measured
    * 14.6x; the tokenize pass is checkpointed so the distinct-word side
    * doesn't re-scan the corpus (the topPmiBigrams precedent). The word
    * join is left to AQE: vocabulary-sized sides broadcast themselves when
    * small, shuffle when genuinely wide. */
  def tokenCountsDict(df: DataFrame, idCol: String, textCol: String,
                      model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val perDocWord = df
      .select(col(idCol).cast(LongType).as("__id"),
        explode(regexp_extract_all(lower(col(textCol)),
          lit(PreTokenPattern), lit(0))).as("__w"))
      .groupBy("__id", "__w").agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val dict = perDocWord.select("__w").distinct()
      .as[String]
      .mapPartitions(it => it.map(w => (w, encodeWord(w, model).length.toLong)))
      .toDF("__w", "__len")
    val sums = perDocWord.join(dict, Seq("__w"))
      .groupBy("__id")
      .agg(sum(col("__c") * col("__len")).cast(LongType).as("__nb"))
    df.select(col(idCol).cast(LongType).as("__id"))
      .join(sums, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__nb"), lit(0L)).as("n_bpe"))
  }
}
