package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Similarity}

/** Skew-salted join equivalence and IVF ANN recall. */
class SkewAndIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin ≡ plain join (same rows, spread over salted reducers)") {
    // skewed fact: 90% of rows share key 1
    val fact = ((1 to 90).map(i => (1L, i.toLong)) ++ Seq((2L, 91L), (3L, 92L)))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cold")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "label")
      .as[(Long, Long, String)].collect().toSet
    val salted = Relational.saltedJoin(fact, dim, "k", buckets = 8,
        saltSource = col("payload"))
      .select("k", "payload", "label")
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._3 == "hot") == 90)
  }

  test("IVF ANN: probing nprobe clusters finds the true nearest neighbors") {
    // two tight clusters around e1 and e2
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f, 0.0f)
                 else Array(0.0f, 1.0f, 0.0f, 0.0f)
      (i.toLong, base.zipWithIndex.map { case (v, j) => v + (i * (j + 1)) * 1e-4f }.toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val (model, assigned) = Similarity.ivfBuild(emb, "embedding", k = 4)
    val res = Similarity.ivfTopK(assigned, model, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0, 0.0), topK = 5, nprobe = 2)
      .select("vec_id").as[Long].collect()
    assert(res.length == 5)
    assert(res.forall(_ % 2 == 0), s"wrong cluster members: ${res.mkString(",")}")
    // brute force agrees on the result set
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0, 0.0), 5).select("vec_id").as[Long].collect()
    assert(res.toSet == brute.toSet)
  }
}
