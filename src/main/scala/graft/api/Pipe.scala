package graft.api

import org.apache.spark.sql.{Dataset, Encoders}

/** External-process transform — the Spark analogue of the reference's
  * worker model, where the engine hands each data slice to a spawned
  * OS process over pipes (`worker_manager.c:96-105` fork/exec per
  * worker, stdin/stdout framing at `:187-196`). Here the contract is
  * per-PARTITION, not per-worker-slot: each partition's rows stream
  * as newline-framed text into one child process, and the child's
  * stdout lines become the output partition.
  *
  * Built on `RDD.pipe` (Spark's battle-tested Hadoop-Streaming-style
  * operator: writer thread feeding stdin, stderr drained, non-zero
  * exit → task failure) rather than a hand-rolled
  * `mapPartitions`+ProcessBuilder — composing the existing operator
  * is the Spark-first choice, and it inherits speculative-execution
  * and task-retry semantics for free.
  *
  * Scale notes: one child process per partition (NOT per row); at
  * 1000 executors this is exactly the reference's fleet-of-workers
  * shape. The command must be present on every executor image. Rows
  * must not contain raw newlines — pre-escape or base64 upstream if
  * they can (the framing is line-based, as in the reference).
  */
object Pipe {

  /** Pipe each partition of `lines` through `command`, one process per
    * partition. Returns the child processes' stdout lines. `env` is
    * added to each child's environment.
    */
  def through(
      lines: Dataset[String],
      command: Seq[String],
      env: Map[String, String] = Map.empty): Dataset[String] = {
    val spark = lines.sparkSession
    spark.createDataset(lines.rdd.pipe(command, env))(Encoders.STRING)
  }
}
