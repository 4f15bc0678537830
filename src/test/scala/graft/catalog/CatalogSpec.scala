package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Catalog module tests (FIXTURES F5): checksum correctness against known
  * vectors, DataCite document assembly, and idempotent publish.
  */
class CatalogSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  private lazy val files = Seq(
    ("exp/a.emd", "abc", """{"Sample":{"elements":["Cu"]}}"""),
    ("exp/b.png", "xyz", "{}")
  ).toDF("path", "content", "metadata_json")

  test("fileMetadata: sha256/sha512 known vectors, length, mime, basename") {
    val r = files.select(Catalog.fileMetadata(col("path"), col("content")).as("f"))
      .select("f.*").orderBy("filename").collect()
    val a = r(0)
    assert(a.getAs[String]("sha256") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(a.getAs[String]("sha512").startsWith("ddaf35a193617aba"))
    assert(a.getAs[Long]("length") == 3L)
    assert(a.getAs[String]("filename") == "a.emd")
    assert(a.getAs[String]("mime_type") == "application/x-hdf5")
    assert(a.getAs[String]("url") == "globus://exp/a.emd")
    assert(r(1).getAs[String]("mime_type") == "image/png")
  }

  test("dataciteDoc: nested document shape") {
    val d = Catalog.dataciteDoc(files).orderBy("subject").collect()(0)
    assert(d.getAs[String]("subject") == "globus://exp/a.emd")
    assert(d.getAs[String]("exp_type") == "picoprobe")
    assert(d.getAs[scala.collection.Seq[String]]("visible_to").toSeq == Seq("public"))
    val dc = d.getStruct(d.fieldIndex("dc"))
    assert(dc.getAs[scala.collection.Seq[String]]("formats").toSeq == Seq("application/x-hdf5"))
  }

  test("publish: idempotent on subject") {
    val dir = Files.createTempDirectory("graft-catalog").toString + "/cat"
    val docs = Catalog.dataciteDoc(files)
    Catalog.publish(spark, docs, dir)
    Catalog.publish(spark, docs, dir) // republish: no new rows
    assert(spark.read.parquet(dir).count() == 2)
    val more = Catalog.dataciteDoc(
      Seq(("exp/c.txt", "new", "{}")).toDF("path", "content", "metadata_json"))
    Catalog.publish(spark, docs.unionByName(more), dir)
    assert(spark.read.parquet(dir).count() == 3)
  }
}
