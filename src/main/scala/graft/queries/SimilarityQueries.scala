package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.plans.GraftFunctions

/** Similarity search over `embeddings.embedding` (north-star
  * "similarity search"): brute-force cosine top-k as the correctness
  * baseline, and an IVF (inverted-file) probed variant as the scale
  * path — candidate generation becomes an equi join on centroid id,
  * so the 100 TB plan is scan + broadcast centroid assign + hash
  * join, never an all-pairs cross join. Cosine is the native
  * codegen'd `cosine_sim` expression (graft.plans.CosineSimilarity)
  * reading the float vectors directly.
  */
object SimilarityQueries {

  /** Brute-force cosine top-10 for a small query set (vec_id < 20).
    * The query side is broadcast — at cluster scale this is one pass
    * over the corpus with per-query top-k (window + filter), the
    * classic "score and take" baseline every ANN variant is measured
    * against.
    */
  val q38CosineTopk = QueryDef(
    "q38_cosine_topk",
    "brute-force cosine top-10 neighbors for query vectors (vec_id < 20)",
    """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM t WHERE vec_id < 20)
      |SELECT q_id, vec_id AS n_id, round(cs, 6) AS cos_sim, rn
      |FROM (
      |  SELECT q.q_id, t.vec_id,
      |    list_dot_product(q.qv, t.v)
      |      / sqrt(list_dot_product(q.qv, q.qv) * list_dot_product(t.v, t.v)) AS cs,
      |    row_number() OVER (PARTITION BY q.q_id ORDER BY
      |      list_dot_product(q.qv, t.v)
      |        / sqrt(list_dot_product(q.qv, q.qv) * list_dot_product(t.v, t.v)) DESC,
      |      t.vec_id) AS rn
      |  FROM q, t
      |  WHERE t.vec_id <> q.q_id)
      |WHERE rn <= 10
      |ORDER BY q_id, rn""".stripMargin) { (s, d) =>
    GraftFunctions.register(s)
    val t = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = t.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cs").desc, col("vec_id"))
    t.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cs", GraftFunctions.cosineSim(col("qe"), col("embedding")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(col("cs"), 6).as("cos_sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** IVF-style approximate NN: 16 deterministic seed centroids
    * (vec_id < 16), every vector assigned to its nearest centroid
    * (one broadcast pass), queries probe their 4 nearest centroids
    * and rank candidates exactly. Recall < 1 by construction (probed
    * subset), so no SQL oracle — the spec measures recall against
    * brute force. At scale the assignment is a broadcast join and
    * search is an equi join on centroid id: both shuffle-light.
    */
  val q39AnnIvf = QueryDef.noOracle(
    "q39_ann_ivf",
    "IVF approximate NN: 16 centroids, nprobe=4, exact rerank of candidates") { (s, d) =>
    GraftFunctions.register(s)
    val t = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val cents = t.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"))
    // assign: nearest centroid by cosine (rank-1 over broadcast join)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("c_id"))
    val assigned = t.crossJoin(broadcast(cents))
      .withColumn("csim", GraftFunctions.cosineSim(col("embedding"), col("ce")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id"))
    // queries probe their 4 nearest centroids
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("c_id"))
    val probes = t.filter(col("vec_id") >= 20 && col("vec_id") < 30)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", GraftFunctions.cosineSim(col("qe"), col("ce")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= 4)
      .select(col("q_id"), col("qe"), col("c_id"))
    // candidates = vectors in probed cells; exact rerank
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cs").desc, col("vec_id"))
    probes.join(assigned, "c_id")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cs", GraftFunctions.cosineSim(col("qe"), col("embedding")))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(col("cs"), 6).as("cos_sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  val all: Seq[QueryDef] = Seq(q38CosineTopk, q39AnnIvf)
}
