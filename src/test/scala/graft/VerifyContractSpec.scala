package graft

import java.nio.file.{Files, Paths}

/** End-to-end guard for the driver contract: `Verify.main` must write
  * one parquet dir per registered query plus a parseable
  * oracle_sql.json whose keys are exactly the oracled queries —
  * breaking any of this silently zeroes a round's correctness gate.
  */
class VerifyContractSpec extends SparkSpec {

  test("Verify.main dumps every query and well-formed oracle json") {
    val out = Files.createTempDirectory(
      Paths.get("target"), "verify-contract").toString
    Verify.run(spark, sfDir, out)
    // every query dumped
    SparkEntry.queries.keys.foreach { name =>
      assert(Files.exists(Paths.get(out, name)), s"missing dump for $name")
      val files = Files.list(Paths.get(out, name)).toArray.map(_.toString)
      assert(files.exists(_.endsWith(".parquet")), s"no parquet for $name")
    }
    // oracle json parses and matches the registry exactly
    val json = Files.readString(Paths.get(out, "oracle_sql.json"))
    val keyPattern = "\"(q[0-9a-z_]+|wordcount|quartile)\":".r
    val keys = keyPattern.findAllMatchIn(json).map(_.group(1)).toSet
    assert(keys == SparkEntry.oracleSql.keySet,
      s"oracle json keys drift: ${keys.diff(SparkEntry.oracleSql.keySet)} / " +
        s"${SparkEntry.oracleSql.keySet.diff(keys)}")
    // every oracle string survived JSON escaping (no raw control chars)
    assert(!json.exists(c => c < ' ' && c != '\n'), "unescaped control char")
  }
}
