package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class MergeSpec extends AnyFunSuite with SparkTest {

  private def listFiles(root: String): Map[String, Long] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Map.empty
    else {
      val it = Files.walk(p).iterator()
      var m = Map.empty[String, Long]
      while (it.hasNext) {
        val f = it.next()
        if (Files.isRegularFile(f) && !f.getFileName.toString.startsWith("_")
          && !f.getFileName.toString.startsWith("."))
          m += (f.toString -> Files.getLastModifiedTime(f).toMillis)
      }
      m
    }
  }

  test("mergeInto: updates replace, inserts land, untouched partitions keep their files") {
    import spark.implicits._
    val path = "/tmp/graft-test-merge-lake"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val base = Seq(
      (1L, "a", 10.0, 1995), (2L, "b", 20.0, 1995),
      (3L, "c", 30.0, 1996), (4L, "d", 40.0, 1996),
      (5L, "e", 50.0, 1997))
      .toDF("k", "v", "price", "y")
    Lake.overwrite(base, path, Seq("y"))
    val before = listFiles(path)

    // update k=3 (1996), insert k=9 into 1996 and k=10 into a NEW partition
    val batch = Seq(
      (3L, "C2", 33.0, 1996),
      (9L, "new", 90.0, 1996),
      (10L, "new", 100.0, 1998))
      .toDF("k", "v", "price", "y")
    Lake.mergeInto(spark, path, batch, Seq("k"), "y")

    val got = Lake.read(spark, path)
      .select($"k", $"v", $"price", $"y".cast("int").as("y"))
      .as[(Long, String, Double, Int)].collect().sortBy(_._1)
    assert(got === Array(
      (1L, "a", 10.0, 1995), (2L, "b", 20.0, 1995),
      (3L, "C2", 33.0, 1996), (4L, "d", 40.0, 1996),
      (5L, "e", 50.0, 1997),
      (9L, "new", 90.0, 1996), (10L, "new", 100.0, 1998)))

    // partition-pruned copy-on-write: 1995/1997 files must be the exact
    // same files (path + mtime), 1996 rewritten, 1998 created
    val after = listFiles(path)
    val untouchedBefore = before.filter(f =>
      f._1.contains("y=1995") || f._1.contains("y=1997"))
    val untouchedAfter = after.filter(f =>
      f._1.contains("y=1995") || f._1.contains("y=1997"))
    assert(untouchedBefore === untouchedAfter,
      "files in partitions without batch keys must not be rewritten")
    assert(after.keys.exists(_.contains("y=1998")), "new partition missing")
    assert(!Files.exists(Paths.get(path + "__merge_tmp")), "staging dir leaked")
  }

  test("mergeInto: rejects duplicate-key batches and NULL partition values loudly") {
    import spark.implicits._
    val path = "/tmp/graft-test-merge-lake3"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    Lake.overwrite(Seq((1L, "a", 1995)).toDF("k", "v", "y"), path, Seq("y"))
    // two update rows for k=1: both would survive the anti-join and land
    // as duplicates — must be rejected before anything is staged
    val dup = Seq((1L, "x", 1995), (1L, "y", 1995)).toDF("k", "v", "y")
    val e1 = intercept[IllegalArgumentException] {
      Lake.mergeInto(spark, path, dup, Seq("k"), "y")
    }
    assert(e1.getMessage.contains("distinct keys"))
    // a NULL partition value stages as __HIVE_DEFAULT_PARTITION__, which
    // the old value-reconstructed publish silently dropped
    val nullPart = Seq((2L, "b", Some(1996)), (3L, "c", None))
      .toDF("k", "v", "y")
    val e2 = intercept[IllegalArgumentException] {
      Lake.mergeInto(spark, path, nullPart, Seq("k"), "y")
    }
    assert(e2.getMessage.contains("NULL"))
    // nothing was published or leaked by either rejected batch
    assert(Lake.read(spark, path).count() === 1)
    assert(!Files.exists(Paths.get(path + "__merge_tmp")), "staging dir leaked")
  }

  test("mergeInto: publishes escaped partition-dir names (values Spark escapes)") {
    import spark.implicits._
    val path = "/tmp/graft-test-merge-lake4"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    // partition values with spaces and colons: Spark percent-escapes the
    // directory names, so a publish that reconstructs s"$col=$v" from the
    // raw value misses them and silently discards the rows
    val base = Seq((1L, "a", "US EAST"), (2L, "b", "EU:WEST"))
      .toDF("k", "v", "region")
    Lake.overwrite(base, path, Seq("region"))
    Lake.mergeInto(spark, path,
      Seq((1L, "A2", "US EAST"), (9L, "n", "AP SOUTH")).toDF("k", "v", "region"),
      Seq("k"), "region")
    val got = Lake.read(spark, path).select($"k", $"v", $"region")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got === Array((1L, "A2", "US EAST"), (2L, "b", "EU:WEST"),
      (9L, "n", "AP SOUTH")))
    assert(!Files.exists(Paths.get(path + "__merge_tmp")), "staging dir leaked")
  }

  test("mergeInto: a batch with only inserts leaves every existing partition alone") {
    import spark.implicits._
    val path = "/tmp/graft-test-merge-lake2"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val base = Seq((1L, "a", 1995), (2L, "b", 1996)).toDF("k", "v", "y")
    Lake.overwrite(base, path, Seq("y"))
    val before = listFiles(path)
    Lake.mergeInto(spark, path,
      Seq((7L, "z", 1999)).toDF("k", "v", "y"), Seq("k"), "y")
    val after = listFiles(path)
    assert(before.forall { case (f, t) => after.get(f).contains(t) },
      "insert-only merge must not rewrite existing partitions")
    assert(Lake.read(spark, path).count() === 3)
  }
}
