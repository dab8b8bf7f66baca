package graft.queries

import graft.QueryDef
import graft.multimodal.MediaOps

/** Multimodal-column pipeline surface (see graft.multimodal.MediaOps).
  * Both decode branches run under the driver: every ~4th document
  * carries a genuine PNG decoded by `javax.imageio`, the rest take the
  * loudly-marked stub. The blobs are deterministic, so a DuckDB oracle
  * recomputes the decoded stats SYMBOLICALLY (pixel sums from the
  * gradient formula, byte sums from the text) — the query output is
  * integer-pure (counts + exact sums) to keep the hash compare safe
  * from float summation order.
  */
object MultimodalQueries {

  val q48MultimodalFeatures = QueryDef(
    "q48_multimodal_features",
    "binary media columns → batched decode (real PNG via imageio + stub) → per-source integer feature stats",
    """WITH m AS (
      |  SELECT doc_id, source, (doc_id // 7) % 4 = 0 AS is_png,
      |    CASE WHEN (doc_id // 7) % 4 = 0
      |         THEN (doc_id % 13 + 3) * (doc_id % 7 + 3)
      |         ELSE strlen(text) END AS n_bytes,
      |    CASE WHEN (doc_id // 7) % 4 = 0
      |         THEN (doc_id % 13 + 3) *
      |              list_sum(list_transform(range(0, doc_id % 7 + 3),
      |                                      y -> (doc_id * 7 + y) % 256))
      |         ELSE list_sum(list_transform(string_split(text, ''), c -> ascii(c)))
      |         END AS sum_raw
      |  FROM documents)
      |SELECT source,
      |  count(*) AS n_media,
      |  CAST(sum(CASE WHEN is_png THEN 1 ELSE 0 END) AS BIGINT) AS n_png,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(sum(CASE WHEN is_png THEN sum_raw ELSE 0 END) AS BIGINT) AS png_lum_sum,
      |  CAST(sum(CASE WHEN NOT is_png THEN sum_raw ELSE 0 END) AS BIGINT) AS stub_byte_sum
      |FROM m GROUP BY source ORDER BY source""".stripMargin) {
    (s, d) => MediaOps.featureStats(s, d)
  }

  val all: Seq[QueryDef] = Seq(q48MultimodalFeatures)
}
