package graft.queries

import graft.QueryDef
import graft.multimodal.MediaOps

/** Multimodal-column pipeline surface (see graft.multimodal.MediaOps;
  * decode kernel stubbed, dataflow real). No SQL oracle — the decode
  * is engine-side logic; MultimodalSpec asserts the deterministic
  * expectations instead.
  */
object MultimodalQueries {

  val q48MultimodalFeatures = QueryDef.noOracle(
    "q48_multimodal_features",
    "binary media columns → batched decode (stub) → per-source feature stats") {
    (s, d) => MediaOps.featureStats(s, d)
  }

  val all: Seq[QueryDef] = Seq(q48MultimodalFeatures)
}
