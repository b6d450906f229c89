package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane-LSH bucketed variant as the scale path.
  *
  * Vector math uses `zip_with` + `aggregate` over array columns —
  * codegen'd builtins, computed in double, no UDFs.
  *
  * Scale design: brute-force is queries(broadcast) × corpus(scan) —
  * embarrassingly parallel, zero shuffle except the final per-query
  * top-k (tiny). The LSH variant assigns every vector an 8-bit
  * hyperplane-sign bucket, so candidate generation is a bucket-key
  * equi-join instead of a full cross product.
  */
object SimilarityOps {

  /** dot(a, b) in double precision — native codegen'd kernel (see
    * graft.functions.FloatVectorDot); bit-identical to the
    * zip_with+aggregate composition but with no per-pair intermediate
    * array allocation.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFns.vec_dot(a, b)

  /** Builtin-composition dot (kept for non-float arrays / reference). */
  def dotGeneric(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** C5: exact brute-force cosine top-k. `queries` rows are the ones
    * with vec_id < nQueries (a deterministic, SQL-expressible subset);
    * the query side is broadcast so the corpus is scanned exactly once
    * with no shuffle before the top-k window.
    */
  def knnBrute(embeddings: DataFrame, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    // Norms are computed once per side BEFORE the pair join (they sit
    // below the join in the plan), so each of the |queries|×|corpus|
    // pairs evaluates a single dot product instead of three.
    val queries = embeddings
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_norm"))
    val corpus = embeddings
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        norm(col("embedding")).as("c_norm"))

    val scored = corpus
      .join(broadcast(queries), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(dot(col("q_emb"), col("c_emb"))
          / (col("q_norm") * col("c_norm")), 3).as("sim"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "sim")
  }

  /** Fixed random hyperplanes: plane j, dim i → ±1 from a hash bit.
    * Deterministic everywhere (no RNG at runtime).
    */
  private def hyperplaneSign(j: Int, i: Column): Column =
    when(xxhash64(lit(j), i).bitwiseAND(lit(1L)) === lit(1L), lit(1.0))
      .otherwise(lit(-1.0))

  /** 8-bit random-hyperplane bucket for a vector column. */
  def lshBucket(emb: Column, numPlanes: Int = 8): Column =
    (0 until numPlanes).map { j =>
      val d = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, i) => x.cast("double") * hyperplaneSign(j, i)),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** C6: ANN via hyperplane LSH — candidates share the query's bucket,
    * then exact cosine + top-k within the bucket. Trades recall for a
    * ~2^planes reduction in comparisons; the standard sign-LSH design
    * (Charikar, STOC'02).
    */
  def knnLsh(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5,
      numPlanes: Int = 8): DataFrame = {
    val bucketed = embeddings.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), numPlanes).as("bucket"),
      norm(col("embedding")).as("nrm"))
    val queries = bucketed
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("bucket"), col("nrm").as("q_norm"))
    val corpus = bucketed
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("bucket"), col("nrm").as("c_norm"))

    val scored = corpus
      .join(broadcast(queries), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(dot(col("q_emb"), col("c_emb"))
          / (col("q_norm") * col("c_norm")), 3).as("sim"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "sim")
  }

  /** Embedding-cosine near-duplicate pairs (exact): all (id1 < id2)
    * pairs with cosine ≥ minCosine. The exact variant is inherently
    * all-pairs — right for modest corpora and for auditing the
    * LSH variant's recall; at billion-vector scale use [[knnLsh]]
    * buckets instead (same scoring, candidate generation via buckets).
    */
  def embeddingNearDups(embeddings: DataFrame,
      minCosine: Double = 0.4): DataFrame = {
    val side = embeddings.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val a = side.select(col("vec_id").as("id1"), col("embedding").as("e1"),
      col("nrm").as("n1"))
    val b = side.select(col("vec_id").as("id2"), col("embedding").as("e2"),
      col("nrm").as("n2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 3)
          .as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }

  /** Centroid-style coarse quantization (IVF flavor): assign each
    * vector to the nearest of `nLists` deterministic seed vectors
    * (the corpus rows with the lowest vec_ids serve as seeds — a
    * degenerate but deterministic "training"), then search only the
    * probe list. Returns (vec_id, list_id) assignments.
    */
  def ivfAssign(embeddings: DataFrame, nLists: Int = 16): DataFrame = {
    val seeds = embeddings.filter(col("vec_id") < nLists)
      .select(col("vec_id").as("list_id"), col("embedding").as("seed_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("d").desc, col("list_id"))
    embeddings.join(broadcast(seeds))
      .select(col("vec_id"), col("list_id"),
        cosine(col("embedding"), col("seed_emb")).as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("list_id"))
  }
}
