package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Inverted-index keyword search over the corpus — the text-retrieval
  * sibling of the embedding ANN stores. At 100 TB a keyword lookup must not
  * scan the corpus: the index persists postings (term, doc_id, tf) BUCKETED
  * BY TERM, so a query's scan touches only the query terms' buckets (the
  * writeMinhashStore/writeInt8Store store-family pattern applied to text),
  * and ranking stays in integer term-frequency space so results are
  * deterministic and oracle-replicable.
  *
  * Build: one explode + one (term, doc) hash aggregate — the postings shape
  * every dedup operator here already uses — plus a per-term doc-freq table
  * (for stop-term pruning / IDF-style reweighting downstream). Appends for
  * new batches ride the same bucketed-append + compactBucketed maintenance
  * story as the dedup stores.
  */
object Search {

  /** persist the inverted index for `df`: `store`_postings (term, doc_id,
    * tf) bucketed by term, and `store`_terms (term, df) — both managed
    * bucketed tables with build metadata. */
  def writeInvertedIndex(df: DataFrame, idCol: String, textCol: String,
                         store: String, nBuckets: Int = 64): Unit = {
    val posts = df
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol))))
          .as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
    graft.sources.Sources.writeBucketed(posts, s"${store}_postings", "term",
      nBuckets)
    graft.sources.Sources.writeBucketed(
      posts.groupBy("term").agg(count(lit(1)).as("df")),
      s"${store}_terms", "term", nBuckets)
    Dedup.setStoreParams(df.sparkSession, s"${store}_postings",
      Map("kind" -> "inverted_index"))
  }

  /** conjunctive (every term must match) keyword search against a
    * [[writeInvertedIndex]] store: read ONLY the query terms' postings (a
    * literal IN filter on the bucket column — bucket-prunable, row-group-
    * prunable), one hash aggregate per doc, keep docs matching all terms,
    * rank by total term frequency with id ties. Query cost scales with the
    * query terms' posting lists, never the corpus. */
  def searchAll(spark: SparkSession, store: String, terms: Seq[String],
                k: Int): DataFrame = {
    require(terms.nonEmpty, "searchAll: empty term list")
    Dedup.checkStoreParams(spark, s"${store}_postings",
      Map("kind" -> "inverted_index"))
    val norm = terms.map(_.toLowerCase).distinct
    spark.table(s"${store}_postings")
      .filter(col("term").isin(norm: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__matched"), sum("tf").as("total_tf"))
      .filter(col("__matched") === norm.length)
      .orderBy(desc("total_tf"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("total_tf"))
  }
}
