package graft.io

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Model-based evidence for the versioned lake: random interleavings of
  * append / overwrite / deleteWhere / deleteKeys / compact are replayed
  * against a trivial in-memory model (a Vector of row-sets, one per
  * version), and after EVERY op the lake must agree with the model on
  * (a) the latest content, (b) the version count, and (c) the content
  * of a randomly chosen HISTORICAL version — i.e. no op may ever
  * corrupt time travel. Seeded, so failures reproduce. Ops are chosen
  * so the no-op paths (delete matching nothing) and the carry-by-
  * reference paths (delete touching a strict subset of files) both get
  * exercised by chance. */
class VersionedProperties extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("vprops").toString + "/tbl"

  private def lakeRows(p: String, v: Option[Long]): Set[Long] =
    Versioned.readAsOf(spark, p, v).select($"k").as[Long].collect().toSet

  test("random op interleavings agree with the in-memory model, including time travel") {
    val rnd = new Random(0x5EED12L)
    for (trial <- 1 to 6) {
      val p = freshPath()
      var model = Vector.empty[Set[Long]] // model(i) = content of version i+1
      var nextKey = 100L * trial
      def freshKeys(n: Int): Set[Long] = {
        val ks = (nextKey until nextKey + n).toSet
        nextKey += n
        ks
      }
      // seed version
      val k0 = freshKeys(3 + rnd.nextInt(4))
      Versioned.commit(k0.toSeq.toDF("k"), p, "append")
      model :+= k0
      for (step <- 1 to 8) {
        rnd.nextInt(5) match {
          case 0 => // append fresh keys
            val ks = freshKeys(1 + rnd.nextInt(4))
            Versioned.commit(ks.toSeq.toDF("k"), p, "append")
            model :+= (model.last ++ ks)
          case 1 => // overwrite with fresh keys
            val ks = freshKeys(1 + rnd.nextInt(4))
            Versioned.commit(ks.toSeq.toDF("k"), p, "overwrite")
            model :+= ks
          case 2 => // deleteWhere a random predicate over current keys
            val mod = 2 + rnd.nextInt(3)
            val res = rnd.nextInt(mod)
            val doomed = model.last.filter(k => k % mod == res)
            // delete-EVERYTHING is out of contract (spec'd separately);
            // partial and matching-nothing deletes are the surface here
            if (doomed != model.last) {
              val v = Versioned.deleteWhere(spark, p, $"k" % mod === res.toLong)
              if (doomed.isEmpty) assert(v == model.size.toLong) // no-op
              else model :+= (model.last -- doomed)
            }
          case 3 => // deleteKeys: mix of present and absent keys
            val present = rnd.shuffle(model.last.toList).take(rnd.nextInt(3))
            if (present.toSet != model.last) {
              val absent = Seq(999999L + rnd.nextInt(100))
              val gone = (present ++ absent).toDF("k")
              val v = Versioned.deleteKeys(spark, p, gone, "k")
              if (present.isEmpty) assert(v == model.size.toLong) // no-op
              else model :+= (model.last -- present)
            }
          case 4 => // compact: content-preserving new version
            Versioned.compact(spark, p, targetFiles = 1 + rnd.nextInt(2))
            model :+= model.last
        }
        // reconcile: the lake's version count and latest content match
        val versions = Versioned.versions(spark, p)
        assert(versions == (1L to model.size.toLong),
          s"trial $trial step $step: versions $versions vs model ${model.size}")
        assert(lakeRows(p, None) == model.last,
          s"trial $trial step $step: latest content diverged")
        // and a random historical version still reads exactly
        val hv = 1 + rnd.nextInt(model.size)
        assert(lakeRows(p, Some(hv.toLong)) == model(hv - 1),
          s"trial $trial step $step: time travel to v$hv diverged")
      }
    }
  }
}
