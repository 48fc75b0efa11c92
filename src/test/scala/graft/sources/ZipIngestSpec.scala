package graft.sources

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpecBase

class ZipIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private def makeZip(dir: String, name: String, entries: Map[String, String]): Unit = {
    val zout = new ZipOutputStream(new FileOutputStream(s"$dir/$name"))
    entries.foreach { case (entry, content) =>
      zout.putNextEntry(new ZipEntry(entry))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    zout.close()
  }

  test("unzipEntries fans zip members out as rows") {
    val dir = tmpDir("zips")
    makeZip(dir, "a.zip", Map("x.json" -> """{"v":1}""", "y.json" -> """{"v":2}"""))
    makeZip(dir, "b.zip", Map("z.json" -> """{"v":3}"""))
    val got = ZipIngest.unzipEntries(spark, dir)
    assert(got.count() == 3)
    val names = got.select($"entry_name").as[String].collect().sorted
    assert(names.toSeq == Seq("x.json", "y.json", "z.json"))
    val z = got.filter($"entry_name" === "z.json")
      .select($"content").as[Array[Byte]].head()
    assert(new String(z, "UTF-8") == """{"v":3}""")
  }

  test("non-zip files are ignored by the glob") {
    val dir = tmpDir("zips2")
    makeZip(dir, "a.zip", Map("x.json" -> "{}"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "noise.txt"), "nope")
    assert(ZipIngest.unzipEntries(spark, dir).count() == 1)
  }

  test("listFiles returns names and sizes without reading content") {
    val dir = "/root/testdata/sf0.001"
    val got = ZipIngest.listFiles(spark, dir, "*.parquet")
    assert(got.count() == 10)
    assert(got.filter($"file_name" === "lineitem.parquet").head.getLong(1) > 0)
  }
}
