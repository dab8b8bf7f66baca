package graft

import graft.api.Pipe

/** `graft.api.Pipe` — the external-process (spawned worker) contract:
  * identity round trip, a real transform, multi-partition behavior,
  * environment passing, and failure propagation.
  */
class PipeSpec extends SparkSpec {
  import spark.implicits._

  test("cat is the identity (all rows survive the process boundary)") {
    val in = (1 to 1000).map(_.toString).toDS().repartition(4)
    val out = Pipe.through(in, Seq("cat")).collect().sorted
    assert(out === (1 to 1000).map(_.toString).sorted.toArray)
  }

  test("tr transforms every line") {
    val in = Seq("alpha", "Beta", "GAMMA").toDS()
    val out = Pipe.through(in, Seq("tr", "a-z", "A-Z")).collect().toSet
    assert(out === Set("ALPHA", "BETA", "GAMMA"))
  }

  test("one process per partition, empty partitions tolerated") {
    // 2 rows over 8 partitions → at least 6 empty children; awk END
    // emits exactly one line per process, counting its input rows.
    val in = Seq("x", "y").toDS().repartition(8)
    val perProc = Pipe.through(in, Seq("awk", "END { print NR }"))
      .collect().map(_.toLong)
    assert(perProc.length === 8)
    assert(perProc.sum === 2L)
  }

  test("child sees the provided environment") {
    val in = Seq("ignored").toDS()
    val out = Pipe.through(
      in, Seq("sh", "-c", "echo $GRAFT_TAG"),
      env = Map("GRAFT_TAG" -> "tag42")).collect()
    assert(out.contains("tag42"))
  }

  test("non-zero exit fails the job (no silent data loss)") {
    val in = Seq("a", "b").toDS().coalesce(1)
    val ex = intercept[Exception] {
      Pipe.through(in, Seq("sh", "-c", "exit 3")).collect()
    }
    assert(ex.getMessage != null)
  }
}
