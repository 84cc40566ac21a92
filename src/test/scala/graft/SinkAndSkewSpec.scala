package graft

import org.apache.spark.sql.functions._
import graft.operators.Embedding
import graft.sinks.JsonSink
import graft.sources.Tables

class SinkAndSkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted embedding produces identical output to the plain nesting shuffle") {
    val region = Tables.load(spark, sf, "region")
    val nation = Tables.load(spark, sf, "nation")
    val plain = Embedding.oneWayEmbed(
      region, "r_regionkey", nation, "n_regionkey", "nations", Seq("n_nationkey"))
    val salted = Embedding.oneWayEmbedSalted(
      region, "r_regionkey", nation, "n_regionkey", "nations", Seq("n_nationkey"), salts = 4)
    val a = plain.orderBy("r_regionkey").toJSON.collect()
    val b = salted.orderBy("r_regionkey").toJSON.collect()
    assert(a.toSeq === b.toSeq)
  }

  test("salted embedding handles a hot key (all children under one parent)") {
    val parent = Seq((1, "hot"), (2, "cold")).toDF("pid", "pname")
    val child = (1 to 5000).map(i => (i, 1, s"c$i")).toDF("cid", "fk", "cname")
    val out = Embedding.oneWayEmbedSalted(
      parent, "pid", child, "fk", "kids", Seq("cid"), salts = 8)
      .orderBy("pid").collect()
    val kids = out(0).getSeq[org.apache.spark.sql.Row](out(0).fieldIndex("kids"))
    assert(kids.length === 5000)
    assert(kids.map(_.getAs[Int]("cid")).toSeq === (1 to 5000), "merge preserves sort order")
    assert(out(1).isNullAt(out(1).fieldIndex("kids")))
  }

  test("zipped array framing: one numbered JSON array per non-empty collection") {
    val zip = java.io.File.createTempFile("graft", ".zip").getAbsolutePath
    val a = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val empty = a.filter(col("id") > 99)
    val written = JsonSink.writeZippedArrays(Seq("a" -> a, "none" -> empty, "b" -> a), zip)
    assert(written === Seq("a", "b"), "empty collection skipped (WriteToFile.js:9-11 parity)")
    val zf = new java.util.zip.ZipFile(zip)
    val entries = {
      val e = zf.entries(); val b = Seq.newBuilder[String]
      while (e.hasMoreElements) b += e.nextElement().getName
      b.result()
    }
    assert(entries === Seq("collection1.json", "collection2.json"))
    val content = scala.io.Source.fromInputStream(
      zf.getInputStream(zf.getEntry("collection1.json"))).mkString
    zf.close()
    assert(content.startsWith("[") && content.endsWith("]"))
    assert(content.contains("\"id\":1") && content.contains("\"id\":2"))
    new java.io.File(zip).delete()
  }
}
