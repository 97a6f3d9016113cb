package graft.verify

import java.nio.charset.StandardCharsets
import java.util.Locale

/** Pure-JVM xxHash64 — implemented from Yann Collet's public XXH64
  * specification (github.com/Cyan4973/xxHash, BSD), NOT by calling Spark's
  * `XxHash64Function`. This is the whole point: [[IndependentOracles]] must
  * recompute the production (xxhash64-based) dedup pipelines WITHOUT touching
  * the code under test, so a bug in Spark usage (seed, byte order, array
  * fold) or in our kernels cannot cancel itself out in the oracle.
  *
  * Agreement with Spark's `xxhash64(...)` SQL function is asserted — not
  * assumed — in IndependentOracleSpec over randomized strings (all tail-path
  * lengths 0..100), longs, ints, and long-array+int folds.
  */
object XxH64Portable {
  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  @inline private def rotl(v: Long, n: Int): Long = java.lang.Long.rotateLeft(v, n)

  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  /** one 8-byte stripe into an accumulator (the "round" primitive). */
  @inline private def round(acc: Long, k: Long): Long =
    rotl(acc + k * P2, 31) * P1

  @inline private def mergeRound(h: Long, v: Long): Long =
    (h ^ (rotl(v * P2, 31) * P1)) * P1 + P4

  /** little-endian long at `off` (xxHash is specified little-endian). */
  @inline private def getLong(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24) |
      ((b(off + 4) & 0xffL) << 32) | ((b(off + 5) & 0xffL) << 40) |
      ((b(off + 6) & 0xffL) << 48) | ((b(off + 7) & 0xffL) << 56)

  @inline private def getInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** XXH64 of an 8-byte (long) input — the shape Spark uses for LongType. */
  def hashLong(input: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    h ^= rotl(input * P2, 31) * P1
    h = rotl(h, 27) * P1 + P4
    fmix(h)
  }

  /** XXH64 of a 4-byte (int) input — the shape Spark uses for IntegerType. */
  def hashInt(input: Int, seed: Long): Long = {
    var h = seed + P5 + 4L
    h ^= (input & 0xFFFFFFFFL) * P1
    h = rotl(h, 23) * P2 + P3
    fmix(h)
  }

  /** XXH64 of a byte array — the shape Spark uses for StringType (over the
    * UTF-8 bytes). */
  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var off = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (off + 32 <= len) {
          v1 = round(v1, getLong(bytes, off))
          v2 = round(v2, getLong(bytes, off + 8))
          v3 = round(v3, getLong(bytes, off + 16))
          v4 = round(v4, getLong(bytes, off + 24))
          off += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = mergeRound(acc, v1); acc = mergeRound(acc, v2)
        acc = mergeRound(acc, v3); acc = mergeRound(acc, v4)
        acc
      } else seed + P5
    h += len
    while (off + 8 <= len) {
      h ^= rotl(getLong(bytes, off) * P2, 31) * P1
      h = rotl(h, 27) * P1 + P4
      off += 8
    }
    if (off + 4 <= len) {
      h ^= (getInt(bytes, off) & 0xFFFFFFFFL) * P1
      h = rotl(h, 23) * P2 + P3
      off += 4
    }
    while (off < len) {
      h ^= (bytes(off) & 0xffL) * P5
      h = rotl(h, 11) * P1
      off += 1
    }
    fmix(h)
  }

  def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(StandardCharsets.UTF_8), seed)
}

/** Spark-INDEPENDENT recomputation of the three sketch pipelines whose
  * results DuckDB cannot derive from the raw tables (seeded xxhash64 minhash
  * banding, xxhash64 simhash voting, HLL++): plain-Scala reimplementations
  * built from the public algorithm specs, run by the verify tooling over the
  * collected corpus, whose outputs are embedded as literals in the generated
  * DuckDB oracle SQL (the fitted-centroid technique of the q_ivf and
  * q_semdedup oracles).
  * This upgrades q_minhash_dedup / q_simhash_dedup / q_approx_distinct from
  * rows-only checks to exact CORRECTNESS rows (round-9 verdict item #1).
  *
  * Independence boundary: everything from raw text/value to final survivor
  * set is recomputed here — tokenization (Java regex, mirroring the SQL
  * tokenizer the md5-portable twins' DuckDB oracles already prove
  * end-to-end), shingling, xxhash64 (XxH64Portable, from the public spec),
  * the affine min-hash family, banding, bucket-local candidate pairing, the
  * est-Jaccard threshold, and the min-id dedup policy. Nothing here calls
  * into graft.operators or Spark.
  */
object IndependentOracles {

  private val NonAlnum = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** mirror of `TextAnalysis.tokens(TextAnalysis.normalized(text))`:
    * lower → strip non-alnum runs to single spaces → trim → split on
    * whitespace. Empty text yields [""] (one empty token), exactly like
    * Spark's `split` — the kernels are defined on that shape. Equality with
    * the SQL tokenizer is asserted corpus-wide in IndependentOracleSpec. */
  def tokenize(text: String): Array[String] =
    NonAlnum.matcher(text.toLowerCase(Locale.ROOT)).replaceAll(" ")
      .trim.split("\\s+", -1)

  // ---------------------------------------------------------------- MinHash

  private val MinhashP: Long = (1L << 31) - 1
  private val TwoPow31: Long = 1L << 31

  /** the same fixed-seed affine family as `Dedup.hashParams` (seed-42
    * scala.util.Random — parameters, not hash logic; regenerated here rather
    * than imported so this object stays import-free of graft.operators). */
  private def affineParams(numHashes: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numHashes)(
      (Math.floorMod(rnd.nextLong(), MinhashP - 1) + 1,
        Math.floorMod(rnd.nextLong(), MinhashP)))
  }

  /** pmod(xxhash64(s, seed 42), 2^31) — the 31-bit shingle hash base. */
  private def hash31(s: String): Long = {
    val h = XxH64Portable.hashString(s, 42L) % TwoPow31
    if (h < 0) h + TwoPow31 else h
  }

  /** MinHash signature over word `ngram`-shingles of a token array: windows
    * start at 0..max(len-n, 0) (a short doc yields ONE shorter shingle),
    * tokens join with a single space. */
  def minhashSig(toks: Array[String], ngram: Int, numHashes: Int,
                 params: Array[(Long, Long)]): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = math.max(toks.length - ngram, 0) + 1
    var s = 0
    while (s < nShingles) {
      val end = math.min(s + ngram, toks.length)
      val x = hash31(toks.slice(s, end).mkString(" "))
      var i = 0
      while (i < numHashes) {
        val v = (x * params(i)._1 + params(i)._2) % MinhashP
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    mins
  }

  /** LSH band key: Spark's `xxhash64(slice(sig, b*rows+1, rows), b)` — a
    * seed-42 left fold of hashLong over the band's signature slice, then
    * hashInt of the band index. */
  def bandKey(sig: Array[Long], band: Int, rows: Int): Long = {
    var h = 42L
    var i = band * rows
    val end = i + rows
    while (i < end) { h = XxH64Portable.hashLong(sig(i), h); i += 1 }
    XxH64Portable.hashInt(band, h)
  }

  /** ids dropped by `Dedup.minhashDedup(df, id, text, threshold, numHashes,
    * bands)`: every id LSH-similar (signature agreement ≥ threshold) to a
    * lower id. Bucket-local pairing exactly like the banded self-join. */
  def minhashDroppedIds(docs: Seq[(Long, Array[String])], threshold: Double,
                        numHashes: Int, bands: Int,
                        ngram: Int = 3): Set[Long] = {
    require(numHashes % bands == 0, s"numHashes % bands != 0")
    val rows = numHashes / bands
    val params = affineParams(numHashes)
    val sigs = docs.map { case (id, toks) =>
      id -> minhashSig(toks, ngram, numHashes, params)
    }.toMap
    val buckets = collection.mutable.HashMap
      .empty[(Int, Long), collection.mutable.ArrayBuffer[Long]]
    sigs.foreach { case (id, sig) =>
      var b = 0
      while (b < bands) {
        buckets.getOrElseUpdate((b, bandKey(sig, b, rows)),
          collection.mutable.ArrayBuffer.empty[Long]) += id
        b += 1
      }
    }
    val minAgree = math.ceil(threshold * numHashes).toInt
    val dropped = collection.mutable.HashSet.empty[Long]
    val checked = collection.mutable.HashSet.empty[(Long, Long)]
    buckets.valuesIterator.foreach { ids =>
      if (ids.length > 1) {
        val sorted = ids.sorted
        var i = 0
        while (i < sorted.length) {
          var j = i + 1
          while (j < sorted.length) {
            val pair = (sorted(i), sorted(j))
            if (checked.add(pair)) {
              val (sa, sb) = (sigs(pair._1), sigs(pair._2))
              var agree = 0
              var k = 0
              while (k < numHashes) {
                if (sa(k) == sb(k)) agree += 1
                k += 1
              }
              // est_jaccard = round(agree/numHashes, 6) >= threshold; with
              // numHashes a power of two ≤ 64 the quotient has ≤ 6 decimal
              // digits, so round is the identity and an integer compare is
              // exact
              if (agree >= minAgree) dropped += pair._2
            }
            j += 1
          }
          i += 1
        }
      }
    }
    dropped.toSet
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash of a token array: per-DISTINCT-token seed-42 xxhash64,
    * per-bit majority vote (> 0 sets the bit). */
  def simhashSig(toks: Array[String]): Long = {
    val votes = new Array[Int](64)
    val seen = collection.mutable.HashSet.empty[String]
    toks.foreach { tok =>
      if (seen.add(tok)) {
        val h = XxH64Portable.hashString(tok, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** ids dropped by `Dedup.simhashDedup`: everything but the min id of each
    * identical-signature group. */
  def simhashDroppedIds(docs: Seq[(Long, Array[String])]): Set[Long] = {
    val keep = docs.groupBy { case (_, toks) => simhashSig(toks) }
      .map { case (_, ds) => ds.map(_._1).min }.toSet
    docs.map(_._1).filterNot(keep).toSet
  }

  // ------------------------------------------------------------------ HLL++

  /** expected value of Spark's `approx_count_distinct` over a LONG column in
    * the RAW-ESTIMATE regime of HLL++ (Heule et al. 2013): seed-42 xxhash64,
    * register index = top p bits, rho = leading zeros of the remaining bits
    * + 1, harmonic mean over registers in index order (so the double
    * summation associates identically), alpha·m²/Z rounded.
    *
    * Returns None outside the raw regime — any empty register (the linear-
    * counting branch) or a raw estimate below 5m (the bias-interpolation
    * branch, whose 200-point per-p correction tables this deliberately does
    * NOT replicate). The caller then simply omits the oracle (the pre-round-10
    * rows-only behavior) instead of risking an off-by-bias literal. The
    * q_approx_distinct column is chosen so both verify SFs (14.7k and 147k
    * distinct keys vs 5m = 2560) sit comfortably raw. Duplicates in `values`
    * are harmless (registers take a max) — callers pass the distinct set.
    */
  def hllRawEstimate(values: Iterable[Long], rsd: Double = 0.05): Option[Long] = {
    val p = math.ceil(2.0d * math.log(1.106d / rsd) / math.log(2.0d)).toInt
    val m = 1 << p
    val idxShift = 64 - p
    val wPadding = 1L << (p - 1)
    val registers = new Array[Int](m)
    values.foreach { v =>
      val x = XxH64Portable.hashLong(v, 42L)
      val idx = (x >>> idxShift).toInt
      val rho = java.lang.Long.numberOfLeadingZeros((x << p) | wPadding) + 1
      if (rho > registers(idx)) registers(idx) = rho
    }
    var zInverse = 0.0d
    var zeroes = 0
    var i = 0
    while (i < m) {
      zInverse += 1.0d / (1L << registers(i))
      if (registers(i) == 0) zeroes += 1
      i += 1
    }
    val alpha =
      if (p == 4) 0.673d
      else if (p == 5) 0.697d
      else if (p == 6) 0.709d
      else 0.7213d / (1.0d + 1.079d / m)
    val alphaM2 = alpha * m * m
    val e = alphaM2 / zInverse
    if (zeroes == 0 && e >= 5.0d * m) Some(Math.round(e)) else None
  }

  /** plain-Scala relevance shortlist — the Spark-independent mirror of
    * [[graft.operators.Similarity.bruteForceTopK]]'s contract (6-dp
    * HALF_UP cosine DESC, id ASC ties): the pool stage of the pooled-MMR
    * oracle. */
  def cosineTopK(vecs: Seq[(Long, Array[Double])], query: Array[Double],
                 n: Int): Seq[Long] = {
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val nn = math.min(x.length, y.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < nn) {
        val xv = x(i); val yv = y(i)
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    vecs.map { case (id, v) => (id, r6(cos(v, query))) }
      .sortBy { case (id, c) => (-c, id) }
      .take(n).map(_._1)
  }

  /** plain-Scala greedy MMR — the Spark-independent mirror of
    * [[graft.operators.Similarity.mmrSelect]], sharing NOTHING with it but
    * the spec: cosine as the same left-to-right fused loop the native
    * kernel runs (float→double widening is exact, so scoring collected
    * floats here equals scoring the cast column there), every similarity
    * and MMR score rounded to 6 dp via scala BigDecimal HALF_UP (Spark's
    * `round(col, 6)` double semantics), ids breaking ties. Returns the
    * selection order. */
  def mmrOrder(vecs: Seq[(Long, Array[Double])], query: Array[Double],
               k: Int, lambda: Double): Seq[Long] = {
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val n = math.min(x.length, y.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = x(i); val yv = y(i)
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rel = vecs.map { case (id, v) => (id, r6(cos(v, query)), v) }
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    while (sel.size < k && sel.size < vecs.size) {
      val selIds = sel.map(_._1).toSet
      val best = rel.iterator.filterNot(t => selIds(t._1)).map {
        case (id, rl, v) =>
          val score =
            if (sel.isEmpty) rl
            else {
              val maxSim = sel.iterator.map(s => r6(cos(v, s._2))).max
              r6(lambda * rl - (1 - lambda) * maxSim)
            }
          (id, score)
      }.reduceOption((a, b) =>
        if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a)
      best match {
        case Some((id, _)) =>
          sel += ((id, rel.find(_._1 == id).get._3))
        case None => return sel.toSeq.map(_._1)
      }
    }
    sel.toSeq.map(_._1)
  }

  /** plain-Scala BATCHED greedy MMR — the Spark-independent mirror of
    * [[graft.operators.Similarity.mmrSelectBatched]]: scores frozen per
    * round, top `m` picks per round (ids break ties), running max-
    * similarity folded forward after each round. Same 6-dp HALF_UP
    * rounding discipline as [[mmrOrder]]; at m = 1 the two orders are
    * identical by construction. */
  def mmrOrderBatched(vecs: Seq[(Long, Array[Double])], query: Array[Double],
                      k: Int, lambda: Double, m: Int): Seq[Long] = {
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val n = math.min(x.length, y.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = x(i); val yv = y(i)
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rel = vecs.map { case (id, v) => (id, r6(cos(v, query)), v) }
    var remaining = rel
    val msim = scala.collection.mutable.Map.empty[Long, Double]
    val order = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (order.size < k && remaining.nonEmpty) {
      val take = math.min(m, k - order.size)
      val picks = remaining.map { case (id, rl, v) =>
        val score = msim.get(id) match {
          case None => rl
          case Some(ms) => r6(lambda * rl - (1 - lambda) * ms)
        }
        (id, score, v)
      }.sortBy(t => (-t._2, t._1)).take(take)
      order ++= picks.map(_._1)
      val picked = picks.map(_._1).toSet
      remaining = remaining.filterNot(t => picked(t._1))
      remaining.foreach { case (id, _, v) =>
        picks.foreach { case (_, _, pv) =>
          val s = r6(cos(v, pv))
          if (!msim.contains(id) || s > msim(id)) msim(id) = s
        }
      }
    }
    order.toSeq
  }

  /** plain-JVM CDC re-chunk for the q_cdc_* oracles: single-threaded
    * re-derivation of the gear-hash recurrence from its written spec
    * (h ← (h<<1) + gear[b]; cut at (h & mask)==0 past minLen, force at
    * maxLen, reset h at cuts; gear[b] = xxh64(b, fixed seed) via
    * [[XxH64Portable]]). Returns per-doc summary rows
    * (doc_id, n_chunks, total_len, n_distinct, chunk_sig) with
    * chunk_sig = Σ (chunk_no+1)·(hash mod 2³¹) — an order-sensitive
    * checksum — plus corpus totals (total_chunks, distinct_chunks,
    * total_bytes, distinct_bytes). */
  def cdcSummaries(docs: Seq[(Long, String)], minLen: Int, maxLen: Int,
                   maskBits: Int)
      : (Seq[(Long, Long, Long, Long, Long)], (Long, Long, Long, Long)) = {
    val gear = Array.tabulate(256)(b =>
      XxH64Portable.hashLong(b.toLong, 0x67E6C7D5CDC17L))
    val mask = (1L << maskBits) - 1
    val seen = scala.collection.mutable.Map.empty[Long, Long]
    var totalChunks = 0L
    var totalBytes = 0L
    val rows = docs.sortBy(_._1).map { case (id, text) =>
      val bytes = Option(text).getOrElse("").getBytes("UTF-8")
      val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
      var start = 0; var h = 0L; var i = 0
      while (i < bytes.length) {
        h = (h << 1) + gear(bytes(i) & 0xff)
        val len = i - start + 1
        if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
          cuts += i + 1; start = i + 1; h = 0L
        }
        i += 1
      }
      if (start < bytes.length) cuts += bytes.length
      var s2 = 0
      var sig = 0L
      val hs = cuts.toSeq.zipWithIndex.map { case (end, no) =>
        val hh = XxH64Portable.hashBytes(
          java.util.Arrays.copyOfRange(bytes, s2, end), 0L)
        seen.getOrElseUpdate(hh, (end - s2).toLong)
        val m = ((hh % (1L << 31)) + (1L << 31)) % (1L << 31)
        sig += (no + 1) * m
        s2 = end
        hh
      }
      totalChunks += hs.length
      totalBytes += bytes.length
      (id, hs.length.toLong, bytes.length.toLong,
        hs.distinct.length.toLong, sig)
    }
    (rows, (totalChunks, seen.size.toLong, totalBytes, seen.values.sum))
  }

  /** plain-JVM replay of the incremental CDC admission report
    * (q_cdc_incr): chunk the stored corpus into a hash set, then walk the
    * new batch in (doc_id, chunk_no) order keeping first occurrences —
    * per doc (n_chunks, total_bytes, new_bytes, dup_bytes). Same
    * single-threaded re-derived chunk loop as [[cdcSummaries]]. */
  def cdcIncrReport(stored: Seq[(Long, String)], batch: Seq[(Long, String)],
                    minLen: Int, maxLen: Int, maskBits: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val gear = Array.tabulate(256)(b =>
      XxH64Portable.hashLong(b.toLong, 0x67E6C7D5CDC17L))
    val mask = (1L << maskBits) - 1
    def chunksOf(text: String): Seq[(Long, Long)] = {
      val bytes = Option(text).getOrElse("").getBytes("UTF-8")
      val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
      var start = 0; var h = 0L; var i = 0
      while (i < bytes.length) {
        h = (h << 1) + gear(bytes(i) & 0xff)
        val len = i - start + 1
        if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
          cuts += i + 1; start = i + 1; h = 0L
        }
        i += 1
      }
      if (start < bytes.length) cuts += bytes.length
      var s2 = 0
      cuts.toSeq.map { end =>
        val hh = XxH64Portable.hashBytes(
          java.util.Arrays.copyOfRange(bytes, s2, end), 0L)
        val r = (hh, (end - s2).toLong); s2 = end; r
      }
    }
    val seen = scala.collection.mutable.Set.empty[Long]
    stored.foreach { case (_, t) => chunksOf(t).foreach(c => seen += c._1) }
    batch.sortBy(_._1).map { case (id, t) =>
      val cs = chunksOf(t)
      var newB = 0L; var dupB = 0L
      cs.foreach { case (h, len) =>
        if (seen.add(h)) newB += len else dupB += len
      }
      (id, cs.length.toLong, cs.map(_._2).sum, newB, dupB)
    }
  }

  /** plain-Scala BPE token counts for the q_bpe_count oracle: a separate
    * single-threaded re-derivation of the public algorithm pair from its
    * written spec (Sennrich learning isn't needed here — the MERGES TABLE
    * arrives as data, exactly as a production merges file would; this
    * recomputes only the GPT-2 encode loop: lowest-rank adjacent pair,
    * merge all occurrences leftmost-first, repeat). Deliberately memo-free
    * and sequential — if the distributed kernel's per-partition memo ever
    * leaked a stale count across rows or partitions mixed rows, these
    * counts would diverge (the deflatedSizes doctrine). */
  def bpeCounts(docs: Seq[(Long, String)],
                merges: Seq[(String, String)]): Seq[(Long, Long)] = {
    val rank = merges.zipWithIndex.toMap
    val pre = java.util.regex.Pattern.compile("[a-z0-9]+|[^a-z0-9\\s]")
    def encodeLen(word: String): Int = {
      var syms = word.map(_.toString).toList
      var going = true
      while (going && syms.lengthCompare(2) >= 0) {
        val pairs = syms.zip(syms.tail)
        val ranked = pairs.flatMap(p => rank.get(p).map(r => (r, p)))
        if (ranked.isEmpty) going = false
        else {
          val (_, best) = ranked.minBy(_._1)
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: tl if (a, b) == best => out += a + b; rest = tl
            case a :: tl => out += a; rest = tl
            case Nil => ()
          }
          syms = out.toList
        }
      }
      syms.length
    }
    docs.sortBy(_._1).map { case (id, text) =>
      val m = pre.matcher(Option(text).getOrElse("").toLowerCase)
      var n = 0L
      while (m.find()) n += encodeLen(m.group())
      (id, n)
    }
  }

  /** plain-JVM deflate sizes for the q_compress_ratio oracle: a FRESH
    * single-threaded Deflater pass per document (deliberately NOT the
    * operator's per-partition reuse shape — if the distributed reset/reuse
    * loop ever leaked state between rows, these sizes would diverge).
    * Same zlib level and raw-stream flag as the operator. */
  def deflatedSizes(docs: Seq[(Long, String)], level: Int): Seq[(Long, Long)] =
    docs.map { case (id, text) =>
      val d = new java.util.zip.Deflater(level, true)
      val raw = Option(text).getOrElse("").getBytes("UTF-8")
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      d.end()
      (id, out)
    }
}
