package graft

import org.apache.spark.sql.functions._
import graft.queries.{Dedup, Sim, Text}

/** Semantics of the training-data-pipeline extension ops (dedup,
  * similarity, text analysis).
  */
class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  test("q20 exact dedup: copies partition the corpus") {
    val docs = Tables.load(spark, sf001, "documents").count()
    val out = Text.q20.run(spark, sf001)
    assert(out.agg(sum("n_copies")).as[Long].head() == docs)
    // keeper is the min doc_id of its hash group → keepers are distinct
    val keepers = out.select("keeper_doc_id").distinct().count()
    assert(keepers == out.count())
  }

  test("q24 minhash pairs are symmetric-free and above threshold") {
    val rows = Dedup.q24.run(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"pair not ordered: $r")
      assert(r.getDouble(2) >= 0.5)
    }
  }

  test("q25 jaccard: identical token sets score 1.0") {
    // documents fixture contains exact duplicate texts (same lang/source
    // blocks); any such pair must surface with jaccard == 1.0
    val docs = Tables.load(spark, sf001, "documents")
    val dupPairs = docs.as("a").join(docs.as("b"),
        $"a.text" === $"b.text" && $"a.lang" === $"b.lang" &&
          $"a.source" === $"b.source" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").count()
    if (dupPairs > 0) {
      val perfect = Dedup.q25.run(spark, sf001)
        .filter(col("jaccard") === 1.0).count()
      assert(perfect >= dupPairs)
    }
  }

  test("q68 clusters: partition the corpus, canonical = min id, " +
    "q25 pairs co-clustered") {
    val clusters = Dedup.q68.run(spark, sf001).collect()
    val nDocs = Tables.load(spark, sf001, "documents").count()
    assert(clusters.length == nDocs, "every document gets a cluster row")
    val byCluster = clusters.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid,
        s"cluster id $cid is not the min member id")
      members.foreach { m =>
        assert(m.getLong(2) == members.length,
          s"cluster_size mismatch in cluster $cid")
        assert(m.getBoolean(3) == (m.getLong(0) == cid))
      }
    }
    // every near-dup pair (same threshold) must land in one cluster
    val clusterOf =
      clusters.map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.q25.run(spark, sf001).collect().foreach { p =>
      assert(clusterOf(p.getLong(0)) == clusterOf(p.getLong(1)),
        s"pair ${p.getLong(0)},${p.getLong(1)} split across clusters")
    }
  }

  test("q70 incremental dedup: covers exactly the batch, valid statuses") {
    val rows = Dedup.q70.run(spark, sf001).collect()
    val batchIds = Tables.load(spark, sf001, "documents")
      .filter(expr(graft.queries.Det.hashSampleExpr("doc_id")))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == batchIds,
      "one status row per batch doc, none for corpus docs")
    assert(rows.forall(r =>
      Set("dup_exact", "dup_near", "new").contains(r.getString(1))))
    // a doc flagged dup_exact has an identical-text corpus twin, which is
    // also a jaccard-1.0 near-dup when it shares the block — so statuses
    // must be stable under re-run (deterministic hash sample, no RNG)
    val again = Dedup.q70.run(spark, sf001).collect()
    assert(rows.map(r => r.getLong(0) -> r.getString(1)).toMap ==
      again.map(r => r.getLong(0) -> r.getString(1)).toMap)
  }

  test("jaccardPairsAcross equals the symmetric join restricted to " +
    "cross pairs") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(
        col("doc_id"), col("lang"), col("source"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .withColumn("sz", size(col("toks")))
    val probe = docs.filter(col("doc_id") % 3 === 0)
    val build = docs.filter(col("doc_id") % 3 =!= 0)
    val across = Dedup.jaccardPairsAcross(probe, build, 0.6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val probeIds = probe.select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    // symmetric pairs are (min, max)-ordered; reorient to (probe, build)
    val viaSymmetric = Dedup.jaccardPairs(docs, 0.6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .collect {
        case (a, b, j) if probeIds.contains(a) && !probeIds.contains(b) =>
          (a, b, j)
        case (a, b, j) if probeIds.contains(b) && !probeIds.contains(a) =>
          (b, a, j)
      }.toSet
    assert(across == viaSymmetric,
      s"asymmetric join diverged: only-across=${across -- viaSymmetric}, " +
        s"only-symmetric=${viaSymmetric -- across}")
  }

  test("q26 cosine top-k: 5 ranked neighbors per query, descending") {
    val rows = Sim.q26.run(spark, sf001).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.values.foreach { part =>
      assert(part.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      val sims = part.sortBy(_.getInt(1)).map(_.getDouble(3))
      sims.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ => ()
      }
      part.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    }
  }

  test("q28 LSH candidates are a subset of brute-force scoring domain") {
    // every ANN neighbor must appear in the exact top-k list OR score at
    // most the exact kth similarity (ANN recall can be < 1; correctness
    // means it never *invents* similarity values).
    val exact = Sim.q26.run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ann = Sim.q28.run(spark, sf001).collect()
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exact.get(key).foreach { s =>
        assert(math.abs(s - r.getDouble(3)) < 1e-12,
          s"ANN similarity disagrees with exact for $key")
      }
    }
  }

  test("q47 ANN recall in [0,1] for both methods, every query covered") {
    val rows = Sim.q47.run(spark, sf001).collect()
    val byMethod = rows.groupBy(_.getString(0))
    assert(byMethod.keySet == Set("lsh", "ivf"))
    rows.foreach { r =>
      val rec = r.getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0 + 1e-9, s"recall OOB: $r")
    }
  }

  test("q21 quality score bounded to [0,1] for non-degenerate docs") {
    val rows = Text.q21.run(spark, sf001).collect()
    rows.foreach { r =>
      val score = r.getDouble(6)
      assert(score >= -1e-9 && score <= 1.0 + 1e-9, s"score OOB: $r")
    }
  }

  test("q22 language-id covers every document exactly once") {
    val docs = Tables.load(spark, sf001, "documents").count()
    val confusion = Text.q22.run(spark, sf001)
    assert(confusion.agg(sum("n")).as[Long].head() == docs)
  }
}
