package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Z-order layout + manifest-planned box scan (q86's machinery):
  * losslessness of the pruned read and the actual file-skipping. */
class LayoutSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val zdir: String = {
    val dir = Files.createTempDirectory("graft-layout").toString + "/li"
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey", $"l_returnflag", $"l_extendedprice")
    Lake.writeZOrdered(li, dir, Seq("l_partkey", "l_suppkey"), nFiles = 16)
    dir
  }

  private def raw = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select($"l_partkey", $"l_suppkey", $"l_returnflag", $"l_extendedprice")

  test("manifest has one row per data file and exact per-file ranges") {
    val files = spark.read.parquet(zdir)
      .select(input_file_name()).distinct().count()
    val manifest = spark.read.parquet(zdir + "/_manifest")
    assert(manifest.count() == files)
    assert(manifest.columns.toSet == Set("file", "rows",
      "min_l_partkey", "max_l_partkey", "min_l_suppkey", "max_l_suppkey"))
    // ranges are exact, not estimates: global min/max agree with the data
    val Seq((lo, hi)) = manifest
      .agg(min($"min_l_partkey"), max($"max_l_partkey"))
      .as[(Long, Long)].collect().toSeq
    val Seq((rlo, rhi)) = raw.agg(min($"l_partkey"), max($"l_partkey"))
      .as[(Long, Long)].collect().toSeq
    assert((lo, hi) == (rlo, rhi))
  }

  test("pruned box scan is lossless vs a raw filter") {
    val bounds = Seq(("l_partkey", 50.0, 120.0), ("l_suppkey", 2.0, 7.0))
    val pruned = Lake.readPruned(spark, zdir, bounds)
      .select($"l_partkey", $"l_suppkey", $"l_returnflag", $"l_extendedprice")
      .as[(Long, Long, String, Double)].collect().sorted.toSeq
    val expect = raw
      .filter($"l_partkey".between(50, 120) && $"l_suppkey".between(2, 7))
      .as[(Long, Long, String, Double)].collect().sorted.toSeq
    assert(pruned == expect && expect.nonEmpty)
  }

  test("a tight box reads strictly fewer files than the table has") {
    val total = spark.read.parquet(zdir)
      .select(input_file_name()).distinct().count()
    val bounds = Seq(("l_partkey", 50.0, 120.0), ("l_suppkey", 2.0, 7.0))
    val read = Lake.readPruned(spark, zdir, bounds)
      .select(input_file_name()).distinct().count()
    assert(read < total, s"no pruning: $read of $total files")
  }

  test("z-order prunes on the SECOND dimension too (what a sort can't)") {
    // a box unconstrained in l_partkey but tight in l_suppkey: a layout
    // sorted only by l_partkey would intersect every file
    val total = spark.read.parquet(zdir)
      .select(input_file_name()).distinct().count()
    val read = Lake.readPruned(spark, zdir,
        Seq(("l_suppkey", 1.0, 2.0)))
      .select(input_file_name()).distinct().count()
    assert(read < total, s"no dim-2 pruning: $read of $total files")
  }

  test("a disjoint box returns empty with the table schema, zero files") {
    val out = Lake.readPruned(spark, zdir, Seq(("l_partkey", -100.0, -50.0)))
    assert(out.isEmpty)
    assert(out.columns.toSeq ==
      Seq("l_partkey", "l_suppkey", "l_returnflag", "l_extendedprice"))
  }
}
