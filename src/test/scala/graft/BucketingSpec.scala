package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Sources

/** Bucketed writes co-locate join keys: a join of two tables bucketed the
  * same way on the join key plans WITHOUT a shuffle exchange — the
  * pre-partitioned buckets satisfy the join's distribution requirement.
  * This is the offline-prep path for repeated fact-fact joins at 100 TB. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("same-bucketed join has no shuffle; unbucketed join does") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Sources.writeBucketed(a, "graft_bkt_a", "k", 4)
    Sources.writeBucketed(b, "graft_bkt_b", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      joined.collect() // finalize the adaptive plan
      val bucketedPlan = joined.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$bucketedPlan")

      val plain = a.join(b, "k")
      plain.collect()
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"),
        s"control join unexpectedly shuffle-free:\n$plainPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  private def mkText(i: Int, p: String): String =
    (1 to 30).map(j => s"$p${i}t$j").mkString(" ")

  private def dropStore(store: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${store}_sigs")
    spark.sql(s"DROP TABLE IF EXISTS ${store}_bands")
  }

  test("minhashDedupAgainst drops store dups, keeps fresh docs, grows the store") {
    import spark.implicits._
    val existing = (1L to 40L).map(i => (i, mkText(i.toInt, "e")))
      .toDF("doc_id", "text")
    // new batch: 41..50 fresh, 51..55 exact copies of stored docs 1..5
    val newBatch = ((41L to 50L).map(i => (i, mkText(i.toInt, "n"))) ++
      (51L to 55L).map(i => (i, mkText((i - 50).toInt, "e"))))
      .toDF("doc_id", "text")
    try {
      Dedup.writeMinhashStore(
        Dedup.minhashSigs(existing, "doc_id", "text", numHashes = 32),
        "doc_id", "graft_incr_test", bands = 8, numHashes = 32, nBuckets = 4)
      val survivors = Dedup.minhashDedupAgainst(newBatch, "doc_id", "text",
          "graft_incr_test", threshold = 0.8, numHashes = 32, bands = 8,
          updateStore = true, nBuckets = 4)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(survivors == (41L to 50L))
      // the survivors' signatures were APPENDED: a third batch duplicating a
      // batch-2 survivor (not a seed doc) is now dropped against the store
      val third = Seq((60L, mkText(41, "n")), (61L, mkText(61, "x")))
        .toDF("doc_id", "text")
      val kept3 = Dedup.minhashDedupAgainst(third, "doc_id", "text",
          "graft_incr_test", threshold = 0.8, numHashes = 32, bands = 8,
          updateStore = false, nBuckets = 4)
        .select("doc_id").as[Long].collect().toSeq
      assert(kept3 == Seq(61L))
      // store tables grew by exactly the 10 batch-2 survivors
      assert(spark.table("graft_incr_test_sigs").count() == 50L)
    } finally dropStore("graft_incr_test")
  }

  test("exactDedupAgainst drops stored content, appends survivors' fingerprints") {
    import spark.implicits._
    val existing = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    // 4 is a normalized copy of stored doc 1 (case/punct differences only)
    val newBatch = Seq((3L, "eta theta iota"), (4L, "Alpha,  BETA gamma!"),
      (5L, "kappa lambda mu")).toDF("doc_id", "text")
    try {
      Dedup.writeFingerprintStore(existing, "text", "graft_fp_test",
        nBuckets = 2)
      val kept = Dedup.exactDedupAgainst(newBatch, "text", "graft_fp_test",
          updateStore = true, nBuckets = 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(3L, 5L))
      // a third batch duplicating batch-2 survivor 3 drops against the
      // APPENDED fingerprints; its fresh doc passes
      val third = Seq((6L, "ETA theta iota?"), (7L, "nu xi omicron"))
        .toDF("doc_id", "text")
      val kept3 = Dedup.exactDedupAgainst(third, "text", "graft_fp_test",
          updateStore = false, nBuckets = 2)
        .select("doc_id").as[Long].collect().toSeq
      assert(kept3 == Seq(7L))
      // 2 seed + 2 appended survivor fingerprints
      assert(spark.table("graft_fp_test_fps").count() == 4L)
      // bloom-prefiltered probe ≡ plain anti-join (no false negatives),
      // including against the grown store
      val plainIds = Dedup.exactDedupAgainst(third, "text", "graft_fp_test",
          updateStore = false).select("doc_id").as[Long].collect().sorted.toSeq
      val bloomIds = Dedup.exactDedupAgainstBloom(third, "text",
          "graft_fp_test", expectedItems = 64L, numBits = 1L << 12)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(bloomIds == plainIds)
      // the anti-join keys on the store's bucket column: under forced SMJ
      // only the new batch shuffles, the store reads its buckets directly
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val surv = Dedup.exactDedupAgainst(newBatch, "text", "graft_fp_test",
          updateStore = false, nBuckets = 2)
        surv.collect()
        val plan = surv.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
        assert(nEx == 1, s"expected 1 exchange (new side), got $nEx:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevThreshold)
    } finally spark.sql("DROP TABLE IF EXISTS graft_fp_test_fps")
  }

  test("simhashDedupAgainst drops token-set near-copies the fingerprint store keeps") {
    import spark.implicits._
    val existing = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta"))
      .toDF("doc_id", "text")
    // 3: REVERSED tokens of stored doc 1 — same distinct token set (same
    // simhash), different byte sequence (different fingerprint); 4: fresh
    val newBatch = Seq((3L, "delta gamma beta alpha"), (4L, "theta iota"))
      .toDF("doc_id", "text")
    try {
      Dedup.writeSimhashStore(existing, "doc_id", "text", "graft_sh_test",
        nBuckets = 2)
      val kept = Dedup.simhashDedupAgainst(newBatch, "doc_id", "text",
          "graft_sh_test", updateStore = true, nBuckets = 2)
        .select("doc_id").as[Long].collect().toSeq
      assert(kept == Seq(4L)) // the reordering is caught
      // the EXACT fingerprint store would have kept the reordered doc —
      // that is the gap this store member exists to close
      Dedup.writeFingerprintStore(existing, "text", "graft_sh_fp", nBuckets = 2)
      val fpKept = Dedup.exactDedupAgainst(newBatch, "text", "graft_sh_fp",
          updateStore = false, nBuckets = 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(fpKept == Seq(3L, 4L))
      // survivor signature appended: a copy of doc 4 now drops
      val third = Seq((5L, "iota theta"), (6L, "kappa lambda"))
        .toDF("doc_id", "text")
      val kept3 = Dedup.simhashDedupAgainst(third, "doc_id", "text",
          "graft_sh_test", updateStore = false, nBuckets = 2)
        .select("doc_id").as[Long].collect().toSeq
      assert(kept3 == Seq(6L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_sh_test_sigs")
      spark.sql("DROP TABLE IF EXISTS graft_sh_fp_fps")
    }
  }

  test("embeddingNearDupAgainst drops near-vectors, store grows with survivors") {
    import spark.implicits._
    def unit(i: Int): Seq[Float] =
      Seq.tabulate(8)(j => if (j == i) 1.0f else 0.0f)
    val existing = Seq((2L, unit(0)), (4L, unit(1))).toDF("vec_id", "embedding")
    // 5 duplicates stored vec 2 exactly (cosine 1.0); 7 is orthogonal
    val newBatch = Seq((5L, unit(0)), (7L, unit(2))).toDF("vec_id", "embedding")
    try {
      Dedup.writeEmbeddingStore(existing, "vec_id", "embedding",
        "graft_emb_test", dim = 8, bandBits = 4, bands = 2, nBuckets = 2)
      val kept = Dedup.embeddingNearDupAgainst(newBatch, "vec_id", "embedding",
          "graft_emb_test", threshold = 0.9, dim = 8, bandBits = 4, bands = 2,
          updateStore = true, nBuckets = 2)
        .select("vec_id").as[Long].collect().toSeq
      assert(kept == Seq(7L))
      // survivor 7's vector+bands were appended: its copy now drops
      val third = Seq((9L, unit(2)), (11L, unit(3))).toDF("vec_id", "embedding")
      val kept3 = Dedup.embeddingNearDupAgainst(third, "vec_id", "embedding",
          "graft_emb_test", threshold = 0.9, dim = 8, bandBits = 4, bands = 2,
          updateStore = false, nBuckets = 2)
        .select("vec_id").as[Long].collect().toSeq
      assert(kept3 == Seq(11L))
      assert(spark.table("graft_emb_test_vecs").count() == 3L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_emb_test_bands")
      spark.sql("DROP TABLE IF EXISTS graft_emb_test_vecs")
    }
  }

  test("embeddingNearDupAgainst append honors a pre-fullsig 2-column store") {
    import spark.implicits._
    def unit(i: Int): Seq[Float] =
      Seq.tabulate(8)(j => if (j == i) 1.0f else 0.0f)
    val existing = Seq((2L, unit(0)), (4L, unit(1))).toDF("vec_id", "embedding")
    try {
      Dedup.writeEmbeddingStore(existing, "vec_id", "embedding",
        "graft_emb_old", dim = 8, bandBits = 4, bands = 2, nBuckets = 2)
      // simulate a store written before the fullsig column existed: rewrite
      // the vecs table with only (id, vec) — checkStoreParams documents such
      // stores as accepted, so the append path must match their schema
      val old2col = spark.table("graft_emb_old_vecs")
        .select("vec_id", "vec").collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      spark.sql("DROP TABLE graft_emb_old_vecs")
      Sources.writeBucketed(old2col.toDF("vec_id", "vec"),
        "graft_emb_old_vecs", "vec_id", 2)
      val newBatch = Seq((5L, unit(0)), (7L, unit(2))).toDF("vec_id", "embedding")
      val kept = Dedup.embeddingNearDupAgainst(newBatch, "vec_id", "embedding",
          "graft_emb_old", threshold = 0.9, dim = 8, bandBits = 4, bands = 2,
          updateStore = true, nBuckets = 2) // append must NOT throw
        .select("vec_id").as[Long].collect().toSeq
      assert(kept == Seq(7L))
      // store grew by the survivor, still 2 columns (existing schema wins)
      assert(spark.table("graft_emb_old_vecs").count() == 3L)
      assert(spark.table("graft_emb_old_vecs").columns.sorted.toSeq ==
        Seq("vec", "vec_id"))
      // and the probe side still works against the upgraded-append store
      val third = Seq((9L, unit(2))).toDF("vec_id", "embedding")
      val kept3 = Dedup.embeddingNearDupAgainst(third, "vec_id", "embedding",
          "graft_emb_old", threshold = 0.9, dim = 8, bandBits = 4, bands = 2,
          updateStore = false, nBuckets = 2)
        .select("vec_id").as[Long].collect().toSeq
      assert(kept3 == Seq())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_emb_old_bands")
      spark.sql("DROP TABLE IF EXISTS graft_emb_old_vecs")
    }
  }

  test("store family property: survivors match direct membership on a random corpus") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(20260813L)
    // small vocab forces organic token-set collisions alongside the plants
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc() = Seq.fill(5 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")
    val existing = (1L to 40L).map(i => (i, doc()))
    val newRows = (41L to 80L).map { i =>
      if (rnd.nextInt(4) == 0) (i, existing(rnd.nextInt(existing.size))._2)
      else (i, doc())
    }
    val exDf = existing.toDF("doc_id", "text")
    val nwDf = newRows.toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet
    try {
      // EXACT + BLOOM: reference = fingerprint set membership
      Dedup.writeFingerprintStore(exDf, "text", "graft_prop_fp", nBuckets = 2)
      val fpEx = exDf.select(TextAnalysis.fingerprint(col("text")))
        .as[String].collect().toSet
      val wantExact = nwDf
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")))
        .as[(Long, String)].collect()
        .collect { case (i, f) if !fpEx.contains(f) => i }.toSet
      assert(ids(Dedup.exactDedupAgainst(nwDf, "text", "graft_prop_fp",
        updateStore = false, nBuckets = 2)) == wantExact)
      assert(ids(Dedup.exactDedupAgainstBloom(nwDf, "text", "graft_prop_fp",
        expectedItems = 64L, numBits = 1L << 12)) == wantExact)
      assert(wantExact.size < newRows.size) // the plants actually dropped
      // SIMHASH: reference = signature set membership
      Dedup.writeSimhashStore(exDf, "doc_id", "text", "graft_prop_sh",
        nBuckets = 2)
      val shEx = Dedup.simhashSigs(exDf, "doc_id", "text")
        .select("simhash").as[Long].collect().toSet
      val wantSh = Dedup.simhashSigs(nwDf, "doc_id", "text")
        .as[(Long, Long)].collect()
        .collect { case (i, s) if !shEx.contains(s) => i }.toSet
      assert(ids(Dedup.simhashDedupAgainst(nwDf, "doc_id", "text",
        "graft_prop_sh", updateStore = false, nBuckets = 2)) == wantSh)
      assert(wantSh.subsetOf(wantExact)) // simhash reach ⊇ exact reach
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_prop_fp_fps")
      spark.sql("DROP TABLE IF EXISTS graft_prop_sh_sigs")
    }
  }

  test("incremental store candidate join never reshuffles the store side") {
    import spark.implicits._
    val existing = (1L to 200L).map(i => (i, mkText(i.toInt, "e")))
      .toDF("doc_id", "text")
    val probe = (201L to 260L).map(i => (i, mkText(i.toInt, "p")))
      .toDF("doc_id", "text")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Dedup.writeMinhashStore(
        Dedup.minhashSigs(existing, "doc_id", "text", numHashes = 32),
        "doc_id", "graft_incr_shuf", bands = 8, numHashes = 32, nBuckets = 4)
      val newBands = Dedup.lshBands(
        Dedup.minhashSigs(probe, "doc_id", "text", numHashes = 32),
        "doc_id", "sig", bands = 8, numHashes = 32)
        .select($"doc_id".as("new_id"), $"band_hash")
      // the candidate join of minhashDedupAgainst: new bands × STORE bands
      // on the store's bucket key. At 100 TB the store is the big side —
      // only the new batch may shuffle.
      val joined = newBands
        .join(spark.table("graft_incr_shuf_bands"), "band_hash")
      joined.collect() // finalize the adaptive plan
      // AdaptiveSparkPlan.toString appends the pre-adaptive "Initial Plan"
      // section — count exchanges in the FINAL plan only
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nExchanges == 1, // the probe side only; the store reads buckets
        s"expected exactly 1 exchange (new side), got $nExchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      dropStore("graft_incr_shuf")
    }
  }

  test("media wide-hash store probe never reshuffles the store side") {
    import graft.operators.Multimodal
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val hashes = Multimodal.audioEnergyHashWide(
        Multimodal.encodeSyntheticWavGroups((0L to 199L).toDF("doc_id"),
          "doc_id"))
      Dedup.writeAudioHashStore(hashes, "media_id", "graft_shuf_au",
        maxHamming = 6, nBuckets = 4)
      val probeSigs = Multimodal.audioEnergyHashWide(
          Multimodal.encodeSyntheticWavGroups((300L to 359L).toDF("doc_id"),
            "doc_id"))
        .select(col("media_id"), col("dh_lo").as("sim_lo"),
          col("dh_hi").as("sim_hi"))
      // the candidate join of wideHashDedupAgainst: new bands x STORE
      // bands on the store's OWN packed bucket key. At 100 TB the store
      // is the big side - only the new batch may shuffle. (A two-column
      // (band, band_bits) join on a band_bits-only bucket spec measured
      // TWO exchanges - both sides re-keyed - which is why the key is
      // packed.)
      val joined = Dedup.wideBandedFrame(probeSigs, "media_id", 120, 6)
        .select(col("media_id").as("new_id"),
          (col("band").cast("long") * (1L << 30) + col("band_bits"))
            .as("__bk"))
        .join(spark.table("graft_shuf_au_bands"), Seq("__bk"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nExchanges == 1,
        s"expected exactly 1 exchange (new side), got $nExchanges:\n$plan")
      // the video store's frame-aligned probe rides the same single
      // packed key (frame in the key) - same 1-exchange contract
      val vh = Multimodal.videoDHashWide(
        Multimodal.encodeSyntheticAviGroups((0L to 99L).toDF("doc_id"),
          "doc_id"))
      Dedup.writeVideoHashStore(vh, "media_id", "graft_shuf_vi",
        maxHamming = 6, nBuckets = 4)
      val vprobe = Multimodal.videoDHashWide(
          Multimodal.encodeSyntheticAviGroups(
            (300L to 319L).toDF("doc_id"), "doc_id"))
        .select(col("media_id"), col("frame_no"),
          col("dh_lo").as("sim_lo"), col("dh_hi").as("sim_hi"))
      val vjoined = Dedup.wideBandedFrame(vprobe, "media_id", 120, 6,
          carryCols = Seq("frame_no"))
        .select(col("media_id").as("new_id"),
          ((col("frame_no").cast("long") * 8L + col("band")) * (1L << 30)
            + col("band_bits")).as("__bk"))
        .join(spark.table("graft_shuf_vi_bands"), Seq("__bk"))
      vjoined.collect()
      val vplan = vjoined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val vEx = "Exchange hashpartitioning".r.findAllIn(vplan).length
      assert(vEx == 1,
        s"video probe: expected exactly 1 exchange, got $vEx:\n$vplan")
      // the embedding store's packed (band, sig) key: same contract
      import graft.operators.Similarity
      def unit(i: Int): Seq[Float] =
        Seq.tabulate(8)(j => if (j == i % 8) (1.0f + i) else 0.1f * i)
      val vecs = (0 to 199).map(i => (i.toLong, unit(i)))
        .toDF("vec_id", "embedding")
      Dedup.writeEmbeddingStore(vecs, "vec_id", "embedding",
        "graft_shuf_em", dim = 8, bandBits = 4, bands = 2, nBuckets = 4)
      val eprobe = (300 to 359).map(i => (i.toLong, unit(i)))
        .toDF("vec_id", "embedding")
      val ejoined = Similarity.lshBandSignatures(eprobe, "vec_id",
          "embedding", dim = 8, bandBits = 4, bands = 2)
        .select(col("vec_id").as("new_id"),
          (col("band").cast("long") * 16L + col("sig")).as("__bs"))
        .join(spark.table("graft_shuf_em_bands"), Seq("__bs"))
      ejoined.collect()
      val eplan = ejoined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val eEx = "Exchange hashpartitioning".r.findAllIn(eplan).length
      assert(eEx == 1,
        s"embedding probe: expected exactly 1 exchange, got $eEx:\n$eplan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_shuf_au_bands")
      spark.sql("DROP TABLE IF EXISTS graft_shuf_vi_bands")
      spark.sql("DROP TABLE IF EXISTS graft_shuf_em_bands")
      spark.sql("DROP TABLE IF EXISTS graft_shuf_em_vecs")
    }
  }

  test("compactBucketed: many appended bucket files collapse to one per bucket, results and props intact") {
    import spark.implicits._
    def fps(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, mkText(i.toInt, "c"))).toDF("doc_id", "text")
    try {
      // seed + 6 appended batches: the incremental-store accretion pattern
      Dedup.writeFingerprintStore(fps(1, 40), "text", "graft_compact", nBuckets = 2)
      spark.sql("ALTER TABLE graft_compact_fps SET TBLPROPERTIES " +
        "('graft.testProp' = 'keepme')")
      (1 to 6).foreach { b =>
        Sources.writeBucketed(
          spark.range(40L * b + 1, 40L * b + 41)
            .select(graft.operators.TextAnalysis.fingerprint(
              org.apache.spark.sql.functions.concat_ws(" ",
                col("id").cast("string"), org.apache.spark.sql.functions.lit("batch"))).as("fp")),
          "graft_compact_fps", "fp", 2, org.apache.spark.sql.SaveMode.Append)
      }
      val before = spark.table("graft_compact_fps").collect().map(_.getString(0)).sorted
      def fileCount = {
        val loc = spark.sql("DESCRIBE EXTENDED graft_compact_fps").collect()
          .find(_.getString(0) == "Location").get.getString(1)
        val dir = new java.io.File(new java.net.URI(loc))
        dir.listFiles().count(f => f.getName.endsWith(".parquet"))
      }
      val filesBefore = fileCount
      assert(filesBefore > 2, s"append pattern should accrete files, got $filesBefore")
      Sources.compactBucketed(spark, "graft_compact_fps", "fp", 2)
      // identical contents, one file per bucket, properties preserved
      val after = spark.table("graft_compact_fps").collect().map(_.getString(0)).sorted
      assert(after.toSeq == before.toSeq)
      assert(fileCount == 2, s"expected 2 files (one per bucket), got $fileCount")
      val props = spark.sql("SHOW TBLPROPERTIES graft_compact_fps").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.testProp").contains("keepme"))
      // the compacted table still satisfies joins bucket-locally: the probe
      // path (exactDedupAgainst) runs unchanged against it
      val kept = Dedup.exactDedupAgainst(fps(1, 10).unionAll(fps(1000, 1009)),
        "text", "graft_compact", updateStore = false)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == (1000L to 1009L).toSet) // stored 1-10 drop, fresh keep
    } finally dropStore("graft_compact")
  }

  // ---- compaction parity across the store family (round-10 verdict #6):
  // the fingerprint store's contents-identical + file-count + probe-path
  // assertions, repeated verbatim for each remaining modality ----

  private def tableFileCount(table: String): Int = {
    val loc = spark.sql(s"DESCRIBE EXTENDED $table").collect()
      .find(_.getString(0) == "Location").get.getString(1)
    new java.io.File(new java.net.URI(loc)).listFiles()
      .count(_.getName.endsWith(".parquet"))
  }
  private def tableSnapshot(table: String): Seq[String] =
    spark.table(table).collect().map(_.toString).sorted.toSeq

  /** append batches, assert accretion, compact every store table, assert
    * identical contents + one file per bucket + graft.* props intact. */
  private def compactionParity(tables: Seq[(String, String)], nBuckets: Int)
                              (append: Int => Unit)(probe: => Unit): Unit = {
    (1 to 4).foreach(append)
    val before = tables.map { case (t, _) => tableSnapshot(t) }
    tables.foreach { case (t, _) =>
      assert(tableFileCount(t) > nBuckets,
        s"$t: append pattern should accrete files") }
    val propsBefore = tables.map { case (t, _) =>
      spark.sql(s"SHOW TBLPROPERTIES $t").collect()
        .map(r => r.getString(0) -> r.getString(1))
        .filter(_._1.startsWith("graft.")).toMap }
    tables.foreach { case (t, c) => Sources.compactBucketed(spark, t, c, nBuckets) }
    tables.zipWithIndex.foreach { case ((t, _), i) =>
      assert(tableSnapshot(t) == before(i), s"$t: contents changed")
      assert(tableFileCount(t) == nBuckets,
        s"$t: expected $nBuckets files, got ${tableFileCount(t)}")
      val props = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
        .map(r => r.getString(0) -> r.getString(1))
        .filter(_._1.startsWith("graft.")).toMap
      assert(props == propsBefore(i), s"$t: graft.* properties changed") }
    probe
  }

  test("compactBucketed parity: minhash store (sigs + bands)") {
    def docs(lo: Long, hi: Long, p: String) =
      (lo to hi).map(i => (i, mkText(i.toInt, p))).toDF("doc_id", "text")
    try {
      Dedup.writeMinhashStore(
        Dedup.minhashSigs(docs(1, 40, "e"), "doc_id", "text", numHashes = 32),
        "doc_id", "graft_cmp_mh", bands = 8, numHashes = 32, nBuckets = 2)
      compactionParity(
        Seq(("graft_cmp_mh_sigs", "doc_id"), ("graft_cmp_mh_bands", "band_hash")), 2) {
        b => Dedup.minhashDedupAgainst(docs(100L * b, 100L * b + 9, s"b$b"),
          "doc_id", "text", "graft_cmp_mh", threshold = 0.8,
          numHashes = 32, bands = 8, updateStore = true, nBuckets = 2).count()
      } {
        // probe path unchanged: copies of a seed doc AND of an appended
        // batch doc drop; a fresh doc passes
        val probe = Seq((9001L, mkText(3, "e")), (9002L, mkText(105, "b1")),
          (9003L, mkText(77, "z"))).toDF("doc_id", "text")
        val kept = Dedup.minhashDedupAgainst(probe, "doc_id", "text",
            "graft_cmp_mh", threshold = 0.8, numHashes = 32, bands = 8,
            updateStore = false, nBuckets = 2)
          .select("doc_id").as[Long].collect().toSeq
        assert(kept == Seq(9003L), s"probe after compaction kept $kept")
      }
    } finally dropStore("graft_cmp_mh")
  }

  test("compactBucketed parity: simhash store") {
    def docs(lo: Long, hi: Long, p: String) =
      (lo to hi).map(i => (i, mkText(i.toInt, p))).toDF("doc_id", "text")
    try {
      Dedup.writeSimhashStore(docs(1, 40, "e"), "doc_id", "text",
        "graft_cmp_sh", nBuckets = 2)
      compactionParity(Seq(("graft_cmp_sh_sigs", "sig")), 2) {
        b => Dedup.simhashDedupAgainst(docs(100L * b, 100L * b + 9, s"b$b"),
          "doc_id", "text", "graft_cmp_sh", updateStore = true,
          nBuckets = 2).count()
      } {
        val probe = Seq((9001L, mkText(3, "e")), (9002L, mkText(105, "b1")),
          (9003L, mkText(77, "z"))).toDF("doc_id", "text")
        val kept = Dedup.simhashDedupAgainst(probe, "doc_id", "text",
            "graft_cmp_sh", updateStore = false, nBuckets = 2)
          .select("doc_id").as[Long].collect().toSeq
        assert(kept == Seq(9003L), s"probe after compaction kept $kept")
      }
    } finally dropStore("graft_cmp_sh")
  }

  test("compactBucketed parity: CDC chunk store") {
    // the fifth store modality in the shared maintenance harness
    // (round 18): gear-hash chunk hashes bucketed on chunk_hash, accreted
    // by tagged cdcDedupAgainst appends, compacted to one file per bucket
    // with contents (incl. the __batch idempotence tags) and probe path
    // unchanged
    def mkBytes(n: Int, seed: Long): Array[Byte] = {
      var x = seed
      Array.fill(n) { x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte }
    }
    def blobs(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, mkBytes(2000, i))).toDF("doc_id", "blob")
    try {
      Dedup.writeChunkStore(
        Dedup.cdcChunks(blobs(1, 10), "doc_id", "blob"),
        "graft_cmp_cdc", nBuckets = 2)
      compactionParity(Seq(("graft_cmp_cdc_chunks", "chunk_hash")), 2) {
        b => Dedup.cdcDedupAgainst(blobs(100L * b, 100L * b + 4), "doc_id",
          "blob", "graft_cmp_cdc", updateStore = true, nBuckets = 2,
          batchId = b.toLong).count()
      } {
        // probe path unchanged after compaction: a stored seed blob and an
        // appended-batch blob are all-dup; a fresh blob is all-new
        val probe = Seq((9001L, mkBytes(2000, 3L)),
          (9002L, mkBytes(2000, 102L)), (9003L, mkBytes(2000, 777L)))
          .toDF("doc_id", "blob")
        val r = Dedup.cdcDedupAgainst(probe, "doc_id", "blob",
            "graft_cmp_cdc", updateStore = false, nBuckets = 2)
          .collect().map(x => x.getLong(0) -> ((x.getLong(3), x.getLong(4))))
          .toMap
        assert(r(9001L)._1 == 0L && r(9002L)._1 == 0L,
          s"stored/appended blobs must probe all-dup after compaction: $r")
        assert(r(9003L)._2 == 0L && r(9003L)._1 == 2000L,
          s"fresh blob must probe all-new after compaction: $r")
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_cmp_cdc_chunks")
  }

  test("compactBucketed parity: embedding store (bands + vecs)") {
    // seed outside the per-id seed space below (Random(5) IS vec(5))
    val rnd = new scala.util.Random(987654321L)
    def vec(i: Long): Seq[Float] = {
      val r = new scala.util.Random(i) // deterministic per id
      Seq.fill(8)(r.nextGaussian().toFloat)
    }
    def emb(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    try {
      Dedup.writeEmbeddingStore(emb(1, 40), "vec_id", "embedding",
        "graft_cmp_em", dim = 8, bandBits = 4, bands = 4, nBuckets = 2)
      compactionParity(
        Seq(("graft_cmp_em_bands", "__bs"), ("graft_cmp_em_vecs", "vec_id")), 2) {
        b => Dedup.embeddingNearDupAgainst(emb(100L * b, 100L * b + 9),
          "vec_id", "embedding", "graft_cmp_em", threshold = 0.999,
          dim = 8, bandBits = 4, bands = 4, updateStore = true,
          nBuckets = 2).count()
      } {
        // cosine-1.0 re-keys of a seed vector and an appended vector drop;
        // a fresh vector passes
        val probe = Seq((9001L, vec(3)), (9002L, vec(105)),
          (9003L, Seq.fill(8)(rnd.nextGaussian().toFloat)))
          .toDF("vec_id", "embedding")
        val kept = Dedup.embeddingNearDupAgainst(probe, "vec_id", "embedding",
            "graft_cmp_em", threshold = 0.999, dim = 8, bandBits = 4,
            bands = 4, updateStore = false, nBuckets = 2)
          .select("vec_id").as[Long].collect().toSeq
        assert(kept == Seq(9003L), s"probe after compaction kept $kept")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cmp_em_bands")
      spark.sql("DROP TABLE IF EXISTS graft_cmp_em_vecs")
    }
  }

  test("compactBucketed parity: audio wide-hash store") {
    import graft.operators.Multimodal
    def hashes(ids: Seq[Long]) = Multimodal.audioEnergyHashWide(
      Multimodal.encodeSyntheticWavGroups(ids.toDF("doc_id"), "doc_id"))
    try {
      Dedup.writeAudioHashStore(hashes(0L to 39L), "media_id",
        "graft_cmp_au", maxHamming = 6, nBuckets = 2)
      compactionParity(Seq(("graft_cmp_au_bands", "__bk")), 2) {
        b => Dedup.audioDedupAgainst(hashes(100L * b to 100L * b + 9),
          "media_id", "graft_cmp_au", maxHamming = 6,
          updateStore = true).count()
      } {
        // group-mates of a seed clip and of an appended clip drop
        // (identical group law => hamming 0-ish); a far-group clip passes
        // iff brute force says so -- expectation computed, not hardcoded
        val probeIds = Seq(2L, 402L, 777779L)
        val probe = hashes(probeIds).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val storedIds = (0L to 39L) ++
          (1 to 4).flatMap(b => 100L * b to 100L * b + 9)
        val stored = hashes(storedIds).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        def ham(a: (Long, Long, Long), b: (Long, Long, Long)) =
          java.lang.Long.bitCount(a._2 ^ b._2) +
            java.lang.Long.bitCount(a._3 ^ b._3)
        val expected = probe
          .filter(p => !stored.exists(s => ham(p, s) <= 6)).map(_._1).toSet
        val kept = Dedup.audioDedupAgainst(hashes(probeIds), "media_id",
            "graft_cmp_au", maxHamming = 6, updateStore = false)
          .select("media_id").as[Long].collect().toSet
        assert(kept == expected, s"probe after compaction kept $kept != $expected")
        assert(expected == Set(777779L), s"fixture drift: $expected")
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_cmp_au_bands")
  }

  test("compactBucketed parity: video frame-hash store") {
    import graft.operators.Multimodal
    def hashes(ids: Seq[Long]) = Multimodal.videoDHashWide(
      Multimodal.encodeSyntheticAviGroups(ids.toDF("doc_id"), "doc_id"),
      everyK = 1)
    try {
      Dedup.writeVideoHashStore(hashes(0L to 39L), "media_id",
        "graft_cmp_vi", maxHamming = 6, nBuckets = 2)
      compactionParity(Seq(("graft_cmp_vi_bands", "__bk")), 2) {
        b => Dedup.videoDedupAgainst(hashes(100L * b to 100L * b + 9),
          "media_id", "graft_cmp_vi", maxHamming = 6, minMatchedFrames = 3,
          updateStore = true).count()
      } {
        // a group-mate of a seed clip (>= 3 of 4 frames match its stored
        // group base) and of an appended clip drop; a far-group clip passes
        val kept = Dedup.videoDedupAgainst(
            hashes(Seq(2L, 402L, 777779L)), "media_id", "graft_cmp_vi",
            maxHamming = 6, minMatchedFrames = 3, updateStore = false)
          .select("media_id").as[Long].collect().toSet
        assert(kept == Set(777779L), s"probe after compaction kept $kept")
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_cmp_vi_bands")
  }

  test("videoDedupFromFrameHashesFrac: threshold scales with the SHORTER clip of each pair") {
    // clip 1: 4 frames. clip 2: 2 frames, both matching clip 1 ->
    // min(4,2)=2, ceil(0.75*2)=2 <= 2 matched -> drops. clip 3: 4 frames,
    // only frames 2-3 matching clip 1 (nothing shared with clip 2) ->
    // ceil(0.75*4)=3 > 2 -> survives (a fixed minMatchedFrames=2 knob
    // would have dropped it).
    val hashes = Seq(
        (1L, 0L, 0x111111L, 0x1L), (1L, 1L, 0x222222L, 0x2L),
        (1L, 2L, 0x333333L, 0x3L), (1L, 3L, 0x444444L, 0x4L),
        (2L, 0L, 0x111111L, 0x1L), (2L, 1L, 0x222222L, 0x2L),
        (3L, 0L, 0xccccccL, 0xcL), (3L, 1L, 0xddddddL, 0xdL),
        (3L, 2L, 0x333333L, 0x3L), (3L, 3L, 0x444444L, 0x4L))
      .toDF("media_id", "frame_no", "dh_lo", "dh_hi")
    val kept = Dedup.videoDedupFromFrameHashesFrac(hashes, "media_id",
        maxHamming = 6, matchFrac = 0.75)
      .select("media_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"frac vote kept $kept")
  }

  test("videoDedupAgainst short-clip vote clamp: a clip with fewer frames than minMatchedFrames can still self-match") {
    try {
      // stored clip 1 has TWO frames; probe clip 2 duplicates both frame
      // hashes exactly. min(minMatchedFrames=3, n_frames=2) = 2 => dropped.
      // Without the clamp mf=2 < 3 would let the duplicate through -- and a
      // replayed streaming micro-batch would emit a different survivor set
      // than its first delivery (the content-keyed idempotence contract).
      val stored = Seq((1L, 0L, 0x3c3c3cL, 0x5a5aL),
          (1L, 1L, 0x111111L, 0x2222L))
        .toDF("media_id", "frame_no", "dh_lo", "dh_hi")
      Dedup.writeVideoHashStore(stored, "media_id", "graft_clamp_vi",
        maxHamming = 6, nBuckets = 2)
      val probe = Seq(
          (2L, 0L, 0x3c3c3cL, 0x5a5aL), (2L, 1L, 0x111111L, 0x2222L),
          // clip 3: four frames, only frame 0 matches stored clip 1 ->
          // mf=1 < min(3, 4) -> survives
          (3L, 0L, 0x3c3c3cL, 0x5a5aL), (3L, 1L, 0x777777L, 0x1111L),
          (3L, 2L, 0x0f0f0fL, 0x3333L), (3L, 3L, 0x123456L, 0x4444L))
        .toDF("media_id", "frame_no", "dh_lo", "dh_hi")
      val kept = Dedup.videoDedupAgainst(probe, "media_id",
          "graft_clamp_vi", maxHamming = 6, minMatchedFrames = 3,
          updateStore = false)
        .select("media_id").as[Long].collect().toSet
      assert(kept == Set(3L), s"clamp probe kept $kept")
    } finally spark.sql("DROP TABLE IF EXISTS graft_clamp_vi_bands")
  }

  test("video store everyK is persisted and a mismatched probe refuses loudly") {
    try {
      val stored = Seq((1L, 0L, 0x3c3c3cL, 0x5a5aL))
        .toDF("media_id", "frame_no", "dh_lo", "dh_hi")
      Dedup.writeVideoHashStore(stored, "media_id", "graft_ek_vi",
        maxHamming = 6, nBuckets = 2, everyK = 2)
      val probe = Seq((2L, 0L, 0x3c3c3cL, 0x5a5aL))
        .toDF("media_id", "frame_no", "dh_lo", "dh_hi")
      // matching everyK probes fine
      Dedup.videoDedupAgainst(probe, "media_id", "graft_ek_vi",
        maxHamming = 6, minMatchedFrames = 3, updateStore = false,
        everyK = 2).count()
      // a probe sampled at a different rate would misalign frame_no keys
      // and silently dilute the vote — must refuse at checkStoreParams
      val e = intercept[IllegalArgumentException] {
        Dedup.videoDedupAgainst(probe, "media_id", "graft_ek_vi",
          maxHamming = 6, minMatchedFrames = 3, updateStore = false,
          everyK = 1).count()
      }
      assert(e.getMessage.contains("everyK"), s"wrong refusal: ${e.getMessage}")
    } finally spark.sql("DROP TABLE IF EXISTS graft_ek_vi_bands")
  }

  test("videoDedupAgainst probe refuses frame_no >= 2^20 (packed-key aliasing)") {
    try {
      val stored = Seq((1L, 0L, 0x3c3c3cL, 0x5a5aL))
        .toDF("media_id", "frame_no", "dh_lo", "dh_hi")
      Dedup.writeVideoHashStore(stored, "media_id", "graft_fg_vi",
        maxHamming = 6, nBuckets = 2)
      val probe = Seq((2L, 1L << 20, 0x3c3c3cL, 0x5a5aL))
        .toDF("media_id", "frame_no", "dh_lo", "dh_hi")
      val e = intercept[Exception] {
        Dedup.videoDedupAgainst(probe, "media_id", "graft_fg_vi",
          maxHamming = 6, minMatchedFrames = 3, updateStore = false).count()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("2^20"), s"wrong refusal: $msgs")
    } finally spark.sql("DROP TABLE IF EXISTS graft_fg_vi_bands")
  }
}
