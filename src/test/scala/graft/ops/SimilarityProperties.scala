package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Randomized losslessness evidence for the cell-blocked cosine join: the
  * triangle-inequality admissibility proof says blocked ≡ brute for ANY
  * corpus, codebook size, and threshold — so sample adversarially: mixed
  * cluster/uniform corpora, negative components (sims spanning [-1, 1]),
  * degenerate codebooks (nCells = 1 ⇒ one cell with radius up to π),
  * shifted id spaces, thresholds from permissive to near-exact. Seeded,
  * so failures reproduce. */
class SimilarityProperties extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("cosinePairsBlocked ≡ brute force on random corpora (clusters, negatives, any codebook)") {
    val rnd = new Random(0xB10C5EEDL)
    val thresholds = Seq(-0.5, 0.0, 0.4, 0.8, 0.95)
    val cellCounts = Seq(1, 3, 8)
    val idBases = Seq(0L, 1000L, 5000000000L)
    for (trial <- 1 to 25) {
      val n = 5 + rnd.nextInt(56)
      val dim = 2 + rnd.nextInt(5)
      val nClusters = 1 + rnd.nextInt(4)
      val centers = Seq.fill(nClusters)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
      val idBase = idBases(rnd.nextInt(idBases.length))
      val corpus = (0 until n).map { i =>
        val c = centers(rnd.nextInt(nClusters))
        (idBase + i, c.map(x => x + (rnd.nextFloat() * 0.6f - 0.3f)))
      }
      val threshold = thresholds(rnd.nextInt(thresholds.length))
      val nCells = cellCounts(rnd.nextInt(cellCounts.length))

      val emb = corpus.toDF("vec_id", "embedding")
      val brute = Similarity.cosinePairs(emb, threshold)
        .collect().map(_.toSeq).toSeq
      val blocked = Similarity.cosinePairsBlocked(emb, threshold, nCells)
        .collect().map(_.toSeq).toSeq
      assert(blocked == brute,
        s"trial $trial: n=$n dim=$dim t=$threshold cells=$nCells idBase=$idBase " +
          s"brute=${brute.size} blocked=${blocked.size}")
    }
  }

  test("durable index ≡ brute force on random corpora, incl. random build/append splits") {
    val rnd = new Random(0xD0CB10C5L)
    for (trial <- 1 to 8) {
      val n = 10 + rnd.nextInt(40)
      val dim = 2 + rnd.nextInt(4)
      val nClusters = 1 + rnd.nextInt(3)
      val centers = Seq.fill(nClusters)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
      val corpus = (0 until n).map { i =>
        val c = centers(rnd.nextInt(nClusters))
        (i.toLong, c.map(x => x + (rnd.nextFloat() * 0.6f - 0.3f)))
      }
      val threshold = Seq(0.0, 0.4, 0.8)(rnd.nextInt(3))
      val nCells = 1 + rnd.nextInt(6)
      // random build/append split: the appended slice is assigned with a
      // codebook that never saw it — exactness must hold regardless
      val splitMod = 2 + rnd.nextInt(4)
      val emb = corpus.toDF("vec_id", "embedding")
      val dir = s"/tmp/graft-test-sim/prop-$trial-${System.nanoTime()}"
      val base = emb.filter(org.apache.spark.sql.functions.col("vec_id") % splitMod =!= 0)
      val extra = emb.filter(org.apache.spark.sql.functions.col("vec_id") % splitMod === 0)
      Similarity.writeIndex(base, dir, nCells)
      if (!extra.isEmpty) Similarity.appendToIndex(extra, dir)
      val served = Similarity.cosinePairsBlockedFromIndex(spark, dir, threshold)
        .collect().map(_.toSeq).toSeq
      val brute = Similarity.cosinePairs(emb, threshold)
        .collect().map(_.toSeq).toSeq
      assert(served == brute,
        s"trial $trial: n=$n dim=$dim t=$threshold cells=$nCells mod=$splitMod " +
          s"brute=${brute.size} served=${served.size}")
    }
  }
}
