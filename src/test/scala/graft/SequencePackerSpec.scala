package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.SequencePacker

/** Pins `api.SequencePacker.pack` (the q80 kernel): the two-pass
  * range-partitioned cumsum must equal the naive single-reducer
  * `sum OVER (ORDER BY ...)` plan row for row, and the derived
  * placement columns must satisfy the packing invariants at sequence
  * boundaries (docs spanning sequences included).
  */
class SequencePackerSpec extends SparkSpec {

  private val budget = 64L

  private def fixture = {
    import spark.implicits._
    // token counts 1..40 cycled over 500 rows: many docs straddle a
    // 64-token boundary, several single docs span 2+ sequences via the
    // +37 spikes; ids shuffled into the frame in non-range order
    (1 to 500).map(i => (i.toLong, (i % 40 + 1 + (if (i % 97 == 0) 37 else 0)).toLong))
      .toDF("id", "n")
  }

  test("two-pass cumsum equals the single-window plan row for row") {
    val packed = SequencePacker.pack(fixture, "id", "n", budget)
      .select(col("id"), col("cum"), col("seq_id"), col("end_seq"), col("seq_offset"))
    val w = Window.orderBy(col("id"))
    val naive = fixture
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("seq_id", expr(s"(cum - n) div $budget"))
      .withColumn("end_seq", expr(s"(cum - 1) div $budget"))
      .withColumn("seq_offset", expr(s"(cum - n) % $budget"))
      .select(col("id"), col("cum"), col("seq_id"), col("end_seq"), col("seq_offset"))
    assert(packed.exceptAll(naive).isEmpty && naive.exceptAll(packed).isEmpty)
    spark.sharedState.cacheManager.clearCache()
  }

  test("packing invariants hold at sequence boundaries") {
    val rows = SequencePacker.pack(fixture, "id", "n", budget)
      .orderBy(col("id"))
      .select(col("n"), col("cum"), col("seq_id"), col("end_seq"), col("seq_offset"))
      .collect()
    var prevCum = 0L
    rows.foreach { r =>
      val (n, cum, seqId, endSeq, off) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cum == prevCum + n, "cum must be the inclusive running total")
      assert(off >= 0 && off < budget, s"seq_offset $off out of [0,$budget)")
      assert(seqId == prevCum / budget, "doc starts in the sequence holding its first token")
      assert(endSeq == (cum - 1) / budget, "doc ends in the sequence holding its last token")
      assert(endSeq - seqId == (off + n - 1) / budget,
        "span count must follow from offset + length")
      prevCum = cum
    }
    // the +37 spikes make some docs span more than one sequence
    assert(rows.exists(r => r.getLong(3) > r.getLong(2)), "fixture must exercise spanning docs")
    spark.sharedState.cacheManager.clearCache()
  }

  test("non-positive budget is rejected") {
    intercept[IllegalArgumentException](SequencePacker.pack(fixture, "id", "n", 0L))
  }

  test("slices tile every doc and fill every sequence exactly") {
    val packed = SequencePacker.pack(fixture, "id", "n", budget)
    val sl = SequencePacker.slices(packed, "n", budget)
      .select(col("id"), col("n"), col("seq"), col("tok_start"),
        col("seq_off"), col("slice_len"))
      .collect()
    // per-doc: slices cover [0, n) contiguously in seq order
    sl.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getLong(2))
      var next = 0L
      ordered.foreach { r =>
        assert(r.getLong(3) == next, "doc slices must tile contiguously")
        next += r.getLong(5)
      }
      assert(next == ordered.head.getLong(1), "doc slices must sum to n")
    }
    // per-sequence: slices cover [0, budget) exactly (last seq partial)
    val bySeq = sl.groupBy(_.getLong(2))
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, rows) =>
      val ordered = rows.sortBy(_.getLong(4))
      var next = 0L
      ordered.foreach { r =>
        assert(r.getLong(4) == next, s"seq $seq has a gap at offset ${r.getLong(4)}")
        next += r.getLong(5)
      }
      if (seq != lastSeq)
        assert(next == budget, s"seq $seq holds $next tokens, not the full budget")
      else assert(next <= budget)
    }
    spark.sharedState.cacheManager.clearCache()
  }
}
