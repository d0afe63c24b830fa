package graft.streaming

import graft.SparkSpec

/** Regression for the r13 silent-zero-files bug: the streaming sources
  * pointed `pathGlobFilter=<table>.parquet` at the corpus DIR, which
  * matches only a leaf FILE of that name — a directory-shaped table
  * (`events.parquet/` of part files, the shape every rewritten/stress
  * corpus has) matched nothing, and a bounded stream over zero files
  * completes "successfully" with an empty result. [[StreamQueries
  * .tableStreamSource]] now resolves both shapes; this spec pins that a
  * dir-shaped corpus produces the SAME converged result as the
  * file-shaped original, not a silent empty.
  */
class DirShapedTableSpec extends SparkSpec {

  test("s_stream_windows converges identically on a directory-shaped events table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dirshape").toString
    // rewrite the sf0.001 events table as a 3-part DIRECTORY under the
    // same <table>.parquet name the sources resolve
    graft.tables.Tables.events(spark, sf0001)
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val fileShaped = graft.SparkEntry.queries("s_stream_windows")(spark, sf0001)
      .collect().map(_.toString).sorted
    val dirShaped = graft.SparkEntry.queries("s_stream_windows")(spark, dir)
      .collect().map(_.toString).sorted
    assert(dirShaped.nonEmpty, "dir-shaped table streamed zero rows (the r13 bug)")
    assert(dirShaped.sameElements(fileShaped))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
