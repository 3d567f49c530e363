package graft

import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite with SparkTest {

  test("attach registers views + functions; pure SQL runs end to end") {
    val views = Catalog.attach(spark, sf0001)
    assert(views.toSet == Catalog.Tables.toSet) // full test dataset
    // graft function + view in one plain-SQL statement
    val n = spark.sql(
      "SELECT count(DISTINCT graft_simhash60(split(text, ' '))) FROM documents " +
        "WHERE text IS NOT NULL").head().getLong(0)
    assert(n > 0)
    // ts arrives normalized (session-zoned timestamp, usable by unix_micros)
    val t = spark.sql("SELECT max(unix_micros(ts)) FROM events").head().getLong(0)
    assert(t > 0)
  }

  test("attach skips missing tables instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("catalog").toString
    Catalog.table(spark, sf0001, "region").write.parquet(s"$dir/region.parquet")
    assert(Catalog.attach(spark, dir) == Seq("region"))
    // re-attach the full dataset for any later suite using the views
    Catalog.attach(spark, sf0001)
  }
}
