package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search: a k-means
  * coarse quantizer partitions the corpus into `nLists` cells; a query
  * scores only the vectors in its `nProbe` closest cells.
  *
  * This is the codebook-based counterpart of the sign-LSH path in
  * [[Similarity]]: LSH needs no training and its buckets are pure
  * functions of the vector (hence DuckDB-oracle-checkable); IVF learns
  * a codebook that adapts to the data distribution, giving better
  * recall per probe on clustered corpora — at the cost of a training
  * pass and of centroids that depend on float summation order, i.e.
  * results are deterministic for a fixed fitted model but NOT
  * reproducible bit-for-bit across partitionings. That is why IVF has
  * no `SparkEntry` oracle query: its contract is pinned by
  * [[graft.llm.IvfSpec]]-style recall/behavior tests instead.
  *
  * Scale shape: training samples the corpus (MLlib k-means);
  * assignment is one broadcast of `nLists`·dim floats + a map; search
  * shuffles only (cell, query) candidates — the corpus is never
  * cross-joined.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Float]]) {
    def nLists: Int = centroids.length

    /** ids of the `nProbe` centroids closest to `v` (exact, tiny). */
    def probeCells(v: Array[Float], nProbe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) => (i, sqDist(c, v)) }
        .sortBy { case (i, d) => (d, i) }
        .take(nProbe).map(_._1).toSeq
  }

  private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  /** Train the coarse quantizer (seeded k-means over the embeddings). */
  def fit(vectors: DataFrame, nLists: Int, seed: Long = 42L): Model = {
    val features = vectors.select(col("vec_id"), col("embedding"))
      .withColumn("features", udfToVec(col("embedding")))
    val km = new KMeans().setK(nLists).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features")
    val model = km.fit(features)
    Model(model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  private val udfToVec =
    udf((emb: Seq[Float]) => Vectors.dense(emb.map(_.toDouble).toArray))

  /** Assign every vector to its inverted list (cell id). */
  def assign(vectors: DataFrame, model: Model): DataFrame = {
    val centroids = model.centroids
    val cellOf = udf { (emb: Seq[Float]) =>
      val v = emb.toArray
      var best = 0; var bestD = Double.MaxValue
      var i = 0
      while (i < centroids.length) {
        val d = sqDist(centroids(i), v)
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }
    vectors.withColumn("cell", cellOf(col("embedding")))
  }

  /** Fixed-point dot product identical to the native `dot_fp`
    * expression ([[expressions.DotFpExpr]]): per-element
    * floor(a·b·10⁶) with float→double widening, integer sum. The cell
    * assignment below must score with EXACTLY this arithmetic or the
    * q41 oracle (which replays dot_fp in DuckDB) diverges. */
  private def dotFpLocal(a: Array[Float], b: Array[Float]): Long = {
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += math.floor(a(i).toDouble * b(i).toDouble * 1000000.0).toLong
      i += 1
    }
    acc
  }

  /** Deterministic-codebook IVF: the codebook is the first `nLists`
    * vectors by id (no refinement), assignment is argmax fixed-point
    * inner product (ties → smallest seed id), queries probe their
    * `nProbe` best cells, and candidates re-rank exactly. Worse
    * recall than the trained quantizer on clustered data, but every
    * step is a pure integer function of the input — reproducible
    * across engines and partitionings, hence the DuckDB-oracle-checked
    * IVF path (`q41_ivf_ann`); [[fit]]/[[search]] remain the quality
    * path.
    *
    * Scale shape: the codebook is a TakeOrdered of `nLists` skinny
    * rows collected once and broadcast; cell assignment is then
    * SCAN-LOCAL (a closure over the broadcast codebook — no per-seed
    * row ever reaches an exchange, unlike a crossJoin+window
    * formulation which would shuffle corpus×nLists embedding
    * payloads). Search shuffles only the bucket equi-join of skinny
    * probe rows; the small side's broadcast is left to AQE so a large
    * query set degrades to a shuffle join instead of OOMing the
    * driver. */
  def seededSearch(vectors: DataFrame, queries: DataFrame, nLists: Int,
      k: Int, nProbe: Int): DataFrame = {
    LlmFunctions.registerDotFp(vectors.sparkSession)
    // first nLists vectors BY RANK of vec_id (TakeOrdered — no global
    // sort), not `vec_id < nLists`: sparse or offset id spaces would
    // silently produce an empty codebook and empty results.
    // Seed reading is defensive where the scan-side UDFs are not: a
    // null embedding among the first nLists rows would NPE the DRIVER
    // (fail loudly with the seed id instead — the caller must supply a
    // non-null codebook prefix), and an array<double> column — which
    // dot_fp accepts — would ClassCastException under getSeq[Float],
    // so elements widen through Number.
    val seeds: Array[(Long, Array[Float])] =
      vectors.orderBy(col("vec_id")).limit(nLists)
        .select(col("vec_id"), col("embedding")).collect()
        .map { r =>
          val id = r.getLong(0)
          require(!r.isNullAt(1),
            s"seededSearch: seed vector $id has a null embedding — the first " +
              s"$nLists vectors by vec_id form the codebook and must be non-null")
          val arr = r.getSeq[Any](1).map {
            case null => throw new IllegalArgumentException(
              s"seededSearch: seed vector $id has a null embedding element")
            case n: Number => n.floatValue()
            case other => throw new IllegalArgumentException(
              s"seededSearch: embedding element of unsupported type ${other.getClass}")
          }.toArray
          (id, arr)
        }
    val bSeeds = vectors.sparkSession.sparkContext.broadcast(seeds)
    // top-n cells by (dot desc, seed_id asc) — the (-dot, id) tuple
    // sort reproduces q41's row_number tie-breaking exactly. Null or
    // dimension-mismatched embeddings (dot undefined) get no cell and
    // drop out of the index/probe streams instead of crashing the scan.
    val probeCells = udf { (emb: Seq[Float]) =>
      if (emb == null) Seq.empty[Long]
      else {
        val v = emb.toArray
        bSeeds.value.collect {
          case (sid, se) if se.length == v.length => (-dotFpLocal(se, v), sid)
        }.sorted.take(nProbe).map(_._2).toSeq
      }
    }
    val bestCell = udf { (emb: Seq[Float]) =>
      if (emb == null) null.asInstanceOf[java.lang.Long]
      else {
        val v = emb.toArray
        val s = bSeeds.value
        var best = null.asInstanceOf[java.lang.Long]
        var bestD = Long.MinValue
        var i = 0
        while (i < s.length) {
          if (s(i)._2.length == v.length) {
            val d = dotFpLocal(s(i)._2, v)
            if (d > bestD || best == null) { bestD = d; best = s(i)._1 }
          }
          i += 1
        }
        best
      }
    }
    val cells = vectors.select(col("vec_id"), col("embedding").as("ce"),
      bestCell(col("embedding")).as("cell"))
    val probes = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), explode(probeCells(col("embedding"))).as("cell"))
    val scored = probes.join(cells, "cell")
      .select(col("query_id"), col("vec_id"), Similarity.dotFpNative("qe", "ce").as("dot_fp"))
    Similarity.topKPerQuery(scored, k)
  }

  /** Top-k per query, scored only against the query's nProbe cells.
    * Scores use the same fixed-point `dot_fp` as the exact path. */
  def search(queries: DataFrame, indexed: DataFrame, model: Model,
      k: Int, nProbe: Int): DataFrame = {
    LlmFunctions.registerDotFp(queries.sparkSession)
    val centroids = model.centroids
    val probes = udf { (emb: Seq[Float]) =>
      Model(centroids).probeCells(emb.toArray, nProbe)
    }
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(probes(col("embedding"))).as("cell")))
    val scored = q.join(indexed.select(col("vec_id"), col("embedding").as("ce"),
        col("cell")), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        Similarity.dotFpNative("qe", "ce").as("dot_fp"))
    Similarity.topKPerQuery(scored, k)
  }
}
