package graft.operators

import graft.SparkSpecBase

class StateMergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def state() = Seq(
    FileState("f1", ingested = true, crawled = false, transformed = false, loaded = false),
    FileState("f2", ingested = true, crawled = true, transformed = false, loaded = false),
    FileState("f3", ingested = true, crawled = true, transformed = true, loaded = true)
  ).toDF()

  test("selectNew picks ingested-only and absent files") {
    val files = Seq("f1", "f2", "f3", "f9").toDF("file_key")
    val got = StateMerge.selectNew(files, state()).as[String].collect().sorted
    assert(got.toSeq == Seq("f1", "f9")) // f1: fresh flags; f9: absent from state
  }

  test("merge upserts flags and inserts unseen keys with false defaults") {
    val updates = Seq(("f1", true), ("f9", true)).toDF("file_key", "crawled")
    val got = StateMerge.merge(state(), updates).as[FileState]
      .collect().map(s => s.file_key -> s).toMap
    assert(got("f1").crawled)           // flag flipped
    assert(got("f1").ingested)          // untouched flags preserved
    assert(got("f9").crawled)           // inserted
    assert(!got("f9").ingested)         // missing flags default false
    assert(got("f3").loaded)            // untouched row intact
    assert(got.size == 4)
  }

  test("merge is idempotent") {
    val updates = Seq(("f2", true)).toDF("file_key", "transformed")
    val once = StateMerge.merge(state(), updates)
    val twice = StateMerge.merge(once, updates)
    assert(once.as[FileState].collect().sortBy(_.file_key).toSeq ==
      twice.as[FileState].collect().sortBy(_.file_key).toSeq)
  }

  test("notYetPresent is an anti-join on file_key") {
    val incoming = Seq("f1", "f7").toDF("file_key")
    val existing = Seq("f1").toDF("file_key")
    assert(StateMerge.notYetPresent(incoming, existing)
      .as[String].collect().toSeq == Seq("f7"))
  }
}
