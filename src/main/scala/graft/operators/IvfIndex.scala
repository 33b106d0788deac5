package graft.operators

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.VectorOps

/** Persisted IVF index: the build-once / probe-many half of ANN serving.
  *
  * [[Similarity.ivfNeighborPairs]] quantizes and searches in one job;
  * a serving system builds the index ONCE and answers many queries
  * against it. `build` writes the corpus re-laid-out as parquet
  * PARTITIONED BY CELL (plus a tiny centroid sidecar); `search` ranks
  * cells against the query driver-side and scans only the `nProbe` best
  * cell directories — Spark partition pruning turns the probe into
  * `nProbe / numCells` of the data read, which is the property that
  * makes IVF work at 100 TB (a 1024-cell index probed at 8 reads <1% of
  * the corpus per query). Probing ALL cells degrades gracefully to the
  * exact brute-force scan, which is how the parity spec gates
  * correctness of the whole path.
  *
  * Centroid choice matches ivfNeighborPairs: the numCells vectors with
  * the smallest xxhash64(id) — deterministic, no RNG. Norms are
  * precomputed at build time and stored (the "norm is a stored column at
  * 100 TB" note on cosinePairs, made real).
  */
object IvfIndex {

  private case class Centroid(cell: Long, vec: Array[Double], norm: Double)

  /** Deterministic centroids + map-side cell assignment (shared with
    * ivfNeighborPairs' logic; ordered so ties resolve identically). */
  private def centroids(emb: DataFrame, idCol: String, vecCol: String,
      numCells: Int): Array[Centroid] =
    emb.orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(numCells)
      .select(col(idCol), col(vecCol))
      .collect()
      .map { r =>
        val cv = r.getSeq[Float](1).toArray.map(_.toDouble)
        var nsq = 0.0
        cv.foreach(x => nsq += x * x)
        Centroid(r.getLong(0), cv, math.sqrt(nsq))
      }
      .sortBy(_.cell)

  /** Build the index directory: `cell=<id>/` parquet partitions holding
    * (id, vec, vnorm), plus `_centroids.json`. One scan, zero shuffle —
    * assignment is a codegen'd array-argmax over literal centroid
    * vectors; the partitioned write distributes rows by cell value.
    *
    * `quantize = true` stores int8 codes + a per-vector scale INSTEAD of
    * the float vector: probes then read ~1/4 the bytes — at 100 TB, ANN
    * serving is scan-I/O-bound, so storage width is the lever that
    * matters after partition pruning. Cell assignment still uses full
    * precision; only storage (and therefore probe-time cosines, within
    * ~1e-2) is approximate — SimilaritySpec bounds the recall and the
    * cosine error. */
  def build(emb: DataFrame, idCol: String, vecCol: String,
      numCells: Int, path: String, quantize: Boolean = false): Unit = {
    val cents = centroids(emb, idCol, vecCol, numCells)
    val cellIds = typedlit(cents.map(_.cell))
    val simCols = cents.map { c =>
      VectorOps.dot(col("vec"), typedlit(c.vec)) / (col("vnorm") * lit(c.norm))
    }
    val assigned = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
        sqrt(VectorOps.normSq(col(vecCol))).as("vnorm"))
      .withColumn("sims", array(simCols.toIndexedSeq: _*))
      .withColumn("cell",
        element_at(cellIds, array_position(col("sims"), array_max(col("sims"))).cast("int")))
      .drop("sims")
    val stored =
      if (!quantize) assigned
      else assigned
        // one-time build cost: HOFs are fine here, the hot path is probe
        .withColumn("scale",
          greatest(aggregate(col("vec"),
            lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0,
            lit(java.lang.Double.MIN_NORMAL)))
        .withColumn("codes", transform(col("vec"),
          x => round(x.cast("double") / col("scale")).cast("byte")))
        // norm of the DEQUANTIZED vector keeps probe cosines in [-1, 1]
        .withColumn("vnorm", col("scale") * sqrt(VectorOps.normSq(col("codes"))))
        .drop("vec")
    stored.write.mode("overwrite").partitionBy("cell").parquet(path)
    val json = cents.map(c =>
        s"""{"cell":${c.cell},"norm":${c.norm},"vec":[${c.vec.mkString(",")}]}""")
      .mkString("[", ",", "]")
    Files.writeString(Paths.get(path, "_centroids.json"), json,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  private def loadCentroids(path: String): Array[Centroid] = {
    val json = Files.readString(Paths.get(path, "_centroids.json"))
    """\{"cell":(-?\d+),"norm":([-0-9.Ee]+),"vec":\[([^\]]*)\]\}""".r
      .findAllMatchIn(json)
      .map(m => Centroid(m.group(1).toLong, m.group(3).split(',').map(_.toDouble),
        m.group(2).toDouble))
      .toArray
  }

  /** Top-k by cosine against `queryVec`, probing the `nProbe` cells whose
    * centroids are most query-similar. The cell ranking is k tiny dot
    * products on the driver; the scan reads ONLY those cell directories
    * (partition pruning — probeSpec asserts `PartitionFilters` carries
    * the cell list); within them one codegen'd dot per row feeds
    * TakeOrdered. nProbe = numCells ⇒ exact. */
  def search(spark: SparkSession, path: String, queryVec: Array[Double],
      k: Int, nProbe: Int, excludeId: Option[Long] = None): DataFrame = {
    var qn = 0.0
    queryVec.foreach(x => qn += x * x)
    val qnorm = math.sqrt(qn)
    val probed = loadCentroids(path)
      .map { c =>
        var d = 0.0
        var i = 0
        while (i < c.vec.length) { d += c.vec(i) * queryVec(i); i += 1 }
        (c.cell, d / (c.norm * qnorm))
      }
      .sortBy { case (cell, sim) => (-sim, cell) }
      .take(nProbe)
      .map(_._1)
    val probedScan = spark.read.parquet(path)
      .where(col("cell").isin(probed.toIndexedSeq: _*))
    val filtered = excludeId.fold(probedScan)(x => probedScan.where(col("id") =!= x))
    // quantized index: dot(q, codes)·scale == dot(q, dequantized), one
    // codegen'd int8 loop per row reading 1/4 the bytes
    val dot =
      if (filtered.columns.contains("codes"))
        VectorOps.dot(typedlit(queryVec), col("codes")) * col("scale")
      else VectorOps.dot(col("vec"), typedlit(queryVec))
    filtered
      .select(col("id"), (dot / (col("vnorm") * lit(qnorm))).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
