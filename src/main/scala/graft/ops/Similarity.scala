package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * All arithmetic is double precision with strict left-to-right folds so
  * the DuckDB oracle (list_reduce, also a left fold) reproduces results
  * bit-for-bit.
  *
  * Scale path: `bruteForceTopK` broadcasts the (small) query set and scans
  * the corpus once — linear, shuffle-free except the final per-query top-k.
  * `ivfTopK` adds an inverted-file coarse quantizer: vectors are bucketed
  * by nearest centroid at index time; queries probe only `nProbe` buckets,
  * cutting the scan by ~|buckets|/nProbe at 100 TB.
  */
object Similarity {

  /** vec_id + v (double array) + nrm (L2 norm, left-fold). */
  def withNorm(embeddings: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    graft.functions.CatalystExpressions.register(embeddings.sparkSession)
    embeddings
      .select(col(idCol), transform(col(embCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** Codegen'd left-fold dot product (CatalystExpressions.DotProduct); the
    * fold order matches both the HOF formulation and DuckDB's list_reduce,
    * so results are bit-identical to the oracles. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def cosine(a: Column, an: Column, b: Column, bn: Column): Column =
    dot(a, b) / (an * bn)

  /** Exact top-k neighbors for each query vector (brute force, the
    * correctness baseline). Queries are broadcast; ties broken by id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("neighbor"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("neighbor") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("qnrm"), col("nv"), col("nnrm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** All pairs (ida < idb) with cosine >= threshold — embedding near-dup.
    * Quadratic by definition; at scale, gate behind LSH/IVF blocking. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = withNorm(emb).select(col("vec_id").as("ida"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm(emb).select(col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("ida") < col("idb"))
      .withColumn("sim", cosine(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("ida"), col("idb"), round(col("sim"), 6).as("sim"))
      .orderBy("ida", "idb")
  }

  /** IVF-style approximate top-k: assign every vector to its nearest
    * centroid (coarse quantizer), probe the `nProbe` closest centroids per
    * query, brute-force only inside the probed cells.
    *
    * The coarse quantizer here takes the first `nCells` corpus vectors as
    * centroids — a deterministic stand-in for a k-means codebook (declared
    * queries need oracle-replayable centroids). [[ivfTopKKMeans]] is the
    * trained-codebook variant; both share [[ivfTopKWith]]. */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int, nCells: Int,
      nProbe: Int): DataFrame = {
    val e = withNorm(emb)
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    ivfTopKWith(e, cents, queryPred, k, nProbe)
  }

  /** IVF with an MLlib KMeans codebook (seeded, so runs are reproducible):
    * the production quantizer — centroids adapt to the data distribution,
    * so cells are balanced and recall at a given nProbe is higher than any
    * fixed-sample codebook. Centroids are tiny (nCells × dim doubles) and
    * broadcast; training is one MLlib job over the corpus. */
  def ivfTopKKMeans(emb: DataFrame, queryPred: Column, k: Int, nCells: Int,
      nProbe: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    val e = withNorm(emb)
    val feat = e.select(col("vec_id"), array_to_vector(col("v")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).fit(feat)
    import spark.implicits._
    val cents = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toArray.toSeq) }
      .toDF("cid", "cv")
      .withColumn("cnrm", sqrt(dot(col("cv"), col("cv"))))
    ivfTopKWith(e, cents, queryPred, k, nProbe)
  }

  /** Shared IVF pipeline over a given (cid, cv, cnrm) codebook. */
  private def ivfTopKWith(e: DataFrame, cents: DataFrame, queryPred: Column,
      k: Int, nProbe: Int): DataFrame = {
    // index-time assignment: nearest centroid per corpus vector
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("v"), col("nrm"), col("cv"), col("cnrm")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid").as("cell"))
    // query-time: probe top-nProbe cells
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))
    val probes = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("qv"), col("qnrm"), col("cv"), col("cnrm")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("qid"), col("qv"), col("qnrm"), col("cid").as("cell"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    probes.join(assigned, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("qnrm"), col("v"), col("nrm")))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"),
        round(col("sim"), 6).as("sim"))
      .orderBy("qid", "rnk")
  }
}
