package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimSearchSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64
  private def clusterVec(center: Int, off: Int): Seq[Float] =
    (0 until dim).map(i => (math.sin(center * 17 + i) + 0.05 * math.cos(off * 7 + i)).toFloat)

  private def corpus = (
    (0 until 20).map(o => (o.toLong, clusterVec(1, o))) ++
    (20 until 40).map(o => (o.toLong, clusterVec(2, o)))
  ).toDF("vec_id", "embedding")

  test("dot and norm on known vectors") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(SimSearch.dot(col("a"), col("b")).as("d"),
      SimSearch.norm(col("a")).as("n")).head()
    assert(approx(r.getDouble(0), 32.0) && approx(r.getDouble(1), math.sqrt(14)))
  }

  test("brute-force top-k returns same-cluster neighbors first, descending") {
    val top = SimSearch.topKForId(corpus, "vec_id", "embedding", queryId = 0L, k = 5)
      .collect()
    val sims = top.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(top.map(_.getLong(0)).forall(_ < 20), "neighbors should come from cluster 1")
    assert(sims.head > 0.9)
  }

  test("quantized re-rank recovers the exact top-k on clustered data") {
    val exact = SimSearch.topKForId(corpus, "vec_id", "embedding", 0L, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val quant = SimSearch.quantizedRerankTopKForId(corpus, "vec_id", "embedding",
        queryId = 0L, k = 10, rerank = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // re-ranked cosines are the EXACT fp32 values, so any id in both lists
    // carries the identical score; with rerank = 2k the shortlist recovers
    // the full exact top-k on this corpus
    val recall = (exact.map(_._1).toSet & quant.map(_._1).toSet).size / 10.0
    assert(recall >= 0.9, s"recall $recall exact=${exact.toSeq} quant=${quant.toSeq}")
    val exactMap = exact.toMap
    quant.filter(q => exactMap.contains(q._1))
      .foreach(q => assert(approx(q._2, exactMap(q._1)), s"score drift at $q"))
  }

  test("quantized re-rank: zero vectors never produce NaN") {
    val withZero = corpus.union(
      Seq((99L, Seq.fill(dim)(0f))).toDF("vec_id", "embedding"))
    val out = SimSearch.quantizedRerankTopKForId(withZero, "vec_id", "embedding",
        queryId = 0L, k = 40, rerank = 40).collect()
    assert(out.forall(r => !r.getDouble(1).isNaN))
    assert(out.find(_.getLong(0) == 99L).forall(_.getDouble(1) == 0.0))
  }

  test("lshTopK achieves high recall vs brute force on clustered data") {
    val exact = SimSearch.topKForId(corpus, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approxTop = SimSearch.lshTopK(corpus, "vec_id", "embedding", 0L, 10,
      numPlanes = 8, maxHammingProbe = 3).collect().map(_.getLong(0)).toSet
    val recall = (exact & approxTop).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall exact=$exact approx=$approxTop")
  }

  test("lshRecallByProbe: >=0.9 recall within hamming radius 1 on clustered " +
    "data, and the curve is monotone with correct ring sizes") {
    // 10 tight clusters (intra-cosine ~0.99): every true top-5 neighbor is a
    // clustermate, so its bucket is 0-1 planes away from the query's
    val tight = (0 until 100).map { j =>
      (j.toLong, (0 until dim).map(i =>
        (math.sin(j / 10 * 31 + i) + 0.01 * math.cos(j * 13 + i)).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = tight.filter(col("vec_id") % 10 === 0)
    val curve = SimSearch.lshRecallByProbe(tight, queries, "vec_id",
        "embedding", k = 5, numPlanes = 8, maxRadius = 2)
      .orderBy(col("max_hamming"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(4)))
    assert(curve.map(_._2).toSeq == Seq(1L, 9L, 37L)) // Σ C(8,i) ring sizes
    val recalls = curve.map(_._3)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    assert(recalls(1) >= 0.9,
      s"multi-probe radius 1 should recover clustered neighbors: ${recalls.toSeq}")
  }

  test("IVF index + probe recovers brute-force neighbors on clustered data") {
    val exact = SimSearch.topKForId(corpus, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val (assigned, centroids) = SimSearch.ivfIndex(corpus, "embedding", nCells = 4)
    assert(assigned.columns.contains("ivf_cell"))
    val probed = SimSearch.ivfTopK(assigned, centroids, "vec_id", "embedding",
      queryId = 0L, k = 10, nProbe = 2).collect().map(_.getLong(0)).toSet
    val recall = (exact & probed).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall exact=$exact probed=$probed")
    // probing ALL cells must equal brute force exactly
    val full = SimSearch.ivfTopK(assigned, centroids, "vec_id", "embedding",
      0L, 10, nProbe = 4).collect().map(_.getLong(0)).toSet
    assert(full == exact)
  }

  test("ivfTopKForQueries: all-cell probe equals exact batch; partial probe keeps recall") {
    val queries = corpus.filter(col("vec_id").isin(0L, 25L))
    val (assigned, centroids) = SimSearch.ivfIndex(corpus, "embedding", nCells = 4)
    val exact = SimSearch.topKForQueries(corpus, queries, "vec_id", "embedding", k = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    // probing every cell must reproduce the exact batch result, rank for rank
    val full = SimSearch.ivfTopKForQueries(assigned, centroids, queries,
        "vec_id", "embedding", k = 8, nProbe = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    assert(full == exact, s"full-probe drifted: $full vs $exact")
    // nProbe=2 is approximate but must keep high recall on clustered data
    val partial = SimSearch.ivfTopKForQueries(assigned, centroids, queries,
        "vec_id", "embedding", k = 8, nProbe = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (q, ids) =>
      (partial.getOrElse(q, Set.empty) & ids.toSet).size.toDouble / ids.size
    }
    assert(recalls.sum / recalls.size >= 0.8, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("IVFPQ lifecycle: codes partition-pruned to nProbe cells, exact " +
      "rerank recall >= ADC-only recall") {
    val dir = graft.Scratch.register(
      java.nio.file.Files.createTempDirectory("graft_ivfpq").toString)
    try {
      val seeds = corpus.filter(col("vec_id").isin(0L, 20L))
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val codebook = corpus.filter(col("vec_id").isin(0L, 10L, 20L, 30L))
        .select(col("vec_id").as("code"), col("embedding").as("cvec"))
      SimSearch.ivfPqWriteIndex(corpus, "vec_id", "embedding", seeds,
        "cid", "cvec", iters = 2, codebook, "code", "cvec", dir,
        m = 8, subDim = 8)
      val qVec = corpus.filter(col("vec_id") === 0L)
        .select("embedding").head().getSeq[Float](0)
      val probed = SimSearch.ivfPqProbeTopK(spark, dir, "vec_id", "embedding",
        qVec, k = 10, nProbe = 1, shortlist = 15, excludeId = 0L)
      val rows = probed.collect()
      assert(rows.length == 10)
      // BOTH index scans (codes for ADC, data for the rerank fetch) carry the
      // partition filter and read at most nProbe cells' files. The probe plan
      // is adaptive, so descend through AQE wrappers and query stages.
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def collectScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
        case q: QueryStageExec => collectScans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case other =>
          (other.children ++ other.subqueries).flatMap(collectScans)
      }
      val scans = collectScans(probed.queryExecution.executedPlan)
      assert(scans.size >= 2, s"expected codes+data scans, got ${scans.size}")
      scans.foreach { s =>
        assert(s.selectedPartitions.partitionCount <= 1,
          s"scan read ${s.selectedPartitions.partitionCount} partitions, " +
            "expected <= 1 (nProbe)")
      }
      // exact rerank must not lose recall vs ranking by quantized distance
      // alone over the same candidates
      val exact = SimSearch.topKForId(corpus, "vec_id", "embedding", 0L, 10)
        .collect().map(_.getLong(0)).toSet
      val reranked = rows.map(_.getLong(0)).toSet
      val adcOnly = ProductQuant.adcTopK(
          corpus.filter(col("vec_id") < 20), // the probed cell's cluster
          "vec_id", "embedding", codebook, "code", "cvec", qVec,
          k = 10, excludeId = 0L)
        .collect().map(_.getLong(0)).toSet
      val recallRerank = (exact & reranked).size.toDouble / exact.size
      val recallAdc = (exact & adcOnly).size.toDouble / exact.size
      assert(recallRerank >= recallAdc,
        s"rerank recall $recallRerank < ADC-only $recallAdc")
      assert(recallRerank >= 0.8, s"rerank recall $recallRerank")
      // adc_dist ascending should broadly anti-correlate with cosine: the
      // result's exact-cosine order is descending by construction
      val cosines = rows.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("batched IVFPQ probe matches the single-query probe per query and " +
      "prunes to the probed-cell union") {
    val dir = graft.Scratch.register(
      java.nio.file.Files.createTempDirectory("graft_ivfpqb").toString)
    try {
      val seeds = corpus.filter(col("vec_id").isin(0L, 20L))
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val codebook = corpus.filter(col("vec_id").isin(0L, 10L, 20L, 30L))
        .select(col("vec_id").as("code"), col("embedding").as("cvec"))
      SimSearch.ivfPqWriteIndex(corpus, "vec_id", "embedding", seeds,
        "cid", "cvec", iters = 2, codebook, "code", "cvec", dir,
        m = 8, subDim = 8)
      val queries = corpus.filter(col("vec_id").isin(0L, 25L))
      val batch = SimSearch.ivfPqProbeTopKForQueries(spark, dir, queries,
          "vec_id", "embedding", k = 8, nProbe = 1, shortlist = 15)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) =>
          q -> rows.map(r => (r.getLong(1), r.getDouble(4))).toSeq.sorted
        }
      assert(batch.keySet == Set(0L, 25L))
      queries.select("vec_id", "embedding").collect().foreach { qr =>
        val qid = qr.getLong(0)
        val single = SimSearch.ivfPqProbeTopK(spark, dir, "vec_id",
            "embedding", qr.getSeq[Float](1), k = 8, nProbe = 1,
            shortlist = 15, excludeId = qid)
          .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq.sorted
        assert(batch(qid) == single, s"query $qid batch != single")
      }
      // the two queries sit in different clusters -> 2 probed cells total;
      // scans must read at most that union, never all cells
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def collectScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
        case qs: QueryStageExec => collectScans(qs.plan)
        case f: FileSourceScanExec => Seq(f)
        case other =>
          (other.children ++ other.subqueries).flatMap(collectScans)
      }
      val probed = SimSearch.ivfPqProbeTopKForQueries(spark, dir, queries,
        "vec_id", "embedding", k = 8, nProbe = 1, shortlist = 15)
      probed.collect()
      val scans = collectScans(probed.queryExecution.executedPlan)
        .filter(_.selectedPartitions.partitionCount > 0)
      assert(scans.nonEmpty)
      scans.foreach(s => assert(s.selectedPartitions.partitionCount <= 2,
        s"scan read ${s.selectedPartitions.partitionCount} partitions"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("allPairsCosine threshold keeps within-cluster pairs only") {
    val small = ((0 until 5).map(o => (o.toLong, clusterVec(1, o))) ++
      (5 until 10).map(o => (o.toLong, clusterVec(9, o)))).toDF("vec_id", "embedding")
    val pairs = SimSearch.allPairsCosine(small, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => (a < 5) == (b < 5) })
  }

  test("persisted IVF index: probe prunes to nProbe cells' files and keeps recall") {
    val dir = graft.Scratch.register(
      java.nio.file.Files.createTempDirectory("graft_ivf").toString)
    try {
      SimSearch.ivfWriteIndex(corpus, "embedding", dir, nCells = 4)
      val qVec = corpus.filter(col("vec_id") === 0L)
        .select("embedding").head().getSeq[Float](0)
      val probed = SimSearch.ivfProbePersistedTopK(spark, dir, "vec_id", "embedding",
        qVec, k = 11, nProbe = 2)
      val rows = probed.collect()
      // file pruning: the scan carries a partition filter on ivf_cell, and the
      // executed scan read at most the probed cells' partitions
      val planStr = probed.queryExecution.executedPlan.toString
      assert(planStr.contains("PartitionFilters") && planStr.contains("ivf_cell"),
        s"no partition filter in plan:\n$planStr")
      val scans = probed.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      assert(scans.nonEmpty)
      assert(scans.head.selectedPartitions.partitionCount <= 2,
        s"probe read ${scans.head.selectedPartitions.partitionCount} partitions, expected <= 2")
      // recall vs brute force (self-match included in probe since query IS id 0;
      // drop it before comparing)
      val exact = SimSearch.topKForId(corpus, "vec_id", "embedding", 0L, 10)
        .collect().map(_.getLong(0)).toSet
      val got = rows.map(_.getLong(0)).filter(_ != 0L).take(10).toSet
      val recall = (exact & got).size.toDouble / exact.size
      assert(recall >= 0.8, s"recall $recall exact=$exact got=$got")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("trained IVF lifecycle: Lloyd-learned cells, probe prunes partitions, recall holds") {
    val dir = graft.Scratch.register(
      java.nio.file.Files.createTempDirectory("graft_ivf_trained").toString)
    try {
      val seeds = corpus.filter(col("vec_id").isin(0L, 20L))
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      SimSearch.ivfTrainedWriteIndex(corpus, "vec_id", "embedding", seeds,
        "cid", "cvec", iters = 2, path = dir)
      // learned quantizer: the two seed cells must have split the corpus along
      // its two construction clusters (cluster 1 = ids < 20 seeds cell 0)
      val cells = spark.read.parquet(s"$dir/data")
        .select(col("vec_id"), col("ivf_cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(cells.size == 40)
      assert((0L until 20L).forall(id => cells(id) == cells(0L)), "cluster 1 intact")
      assert((20L until 40L).forall(id => cells(id) == cells(20L)), "cluster 2 intact")
      assert(cells(0L) != cells(20L), "clusters in distinct learned cells")
      // probe with nProbe=1 must read ONLY the query's cell partition
      val qVec = corpus.filter(col("vec_id") === 0L)
        .select("embedding").head().getSeq[Float](0)
      val probed = SimSearch.ivfProbeTrainedTopK(spark, dir, "vec_id", "embedding",
        qVec, k = 10, nProbe = 1, excludeId = 0L)
      val rows = probed.collect()
      val scans = probed.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      assert(scans.nonEmpty)
      assert(scans.head.selectedPartitions.partitionCount <= 1,
        s"probe read ${scans.head.selectedPartitions.partitionCount} partitions, expected <= 1")
      // the probed cell is the query's own cluster → perfect recall here
      val exact = SimSearch.topKForId(corpus, "vec_id", "embedding", 0L, 10)
        .collect().map(_.getLong(0)).toSet
      assert(rows.map(_.getLong(0)).toSet == exact,
        s"one-cell probe should recover the exact top-10 on separated clusters")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("topKForQueries matches per-id brute force for every query") {
    val queries = corpus.filter(col("vec_id").isin(0L, 7L, 25L))
    val batch = SimSearch.topKForQueries(corpus, queries, "vec_id", "embedding", k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
    assert(batch.keySet == Set(0L, 7L, 25L))
    for (q <- Seq(0L, 7L, 25L)) {
      val single = SimSearch.topKForId(corpus, "vec_id", "embedding", q, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q).map(_._1) == single.map(_._1), s"ids differ for query $q")
      batch(q).zip(single).foreach { case ((_, a), (_, b)) => assert(approx(a, b)) }
    }
  }

  test("lshTopKForQueries: high recall vs exact batch, candidates bucket-pruned") {
    val queries = corpus.filter(col("vec_id").isin(0L, 7L, 25L))
    val exact = SimSearch.topKForQueries(corpus, queries, "vec_id", "embedding", k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val approxDf = SimSearch.lshTopKForQueries(corpus, queries, "vec_id", "embedding",
      k = 5, numPlanes = 8, maxHammingProbe = 3)
    val got = approxDf.collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (q, ids) =>
      (got.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size
    }
    assert(recalls.sum / recalls.size >= 0.7,
      s"mean recall ${recalls.sum / recalls.size}: exact=$exact got=$got")
    // rank order within a query is (cosine desc, id asc), dense from 1
    val ranks = approxDf.collect().groupBy(_.getLong(0)).values
      .map(_.sortBy(_.getLong(1)).map(_.getLong(1)).toSeq)
    assert(ranks.forall(r => r == (1L to r.length)))
  }

  test("lshTopKForQueries plans a bucket equi-join, not BroadcastNestedLoopJoin") {
    val queries = corpus.filter(col("vec_id") < 3)
    val plan = SimSearch.lshTopKForQueries(corpus, queries, "vec_id", "embedding",
        k = 5).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$plan")
  }

  test("topKForQueries partial aggregation bounds rows per query at k") {
    val queries = corpus.filter(col("vec_id") < 2)
    val out = SimSearch.topKForQueries(corpus, queries, "vec_id", "embedding", k = 3)
    val counts = out.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 3))
    // rank is 1..k, dense, per query
    val ranks = out.collect().groupBy(_.getLong(0)).values.map(_.map(_.getLong(1)).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1L, 2L, 3L)))
  }

  test("seededIvfTopK: probing every cell reproduces the exact scan") {
    // seeds 0 and 20 sit in the two cluster centers — one cell per cluster
    val seeds = corpus.filter(col("vec_id").isin(0L, 20L))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val exact = SimSearch.topKForId(corpus, "vec_id", "embedding", 0L, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val ivf = SimSearch.seededIvfTopK(corpus, "vec_id", "embedding", seeds,
        "cid", "cvec", queryId = 0L, k = 10, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    assert(ivf.toSeq == exact.toSeq)
  }

  test("seededIvfTopK: one probe restricts candidates to the query's cell " +
    "with exact cosines") {
    val seeds = corpus.filter(col("vec_id").isin(0L, 20L))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val out = SimSearch.seededIvfTopK(corpus, "vec_id", "embedding", seeds,
        "cid", "cvec", queryId = 0L, k = 25, nProbe = 1).collect()
    // cluster-1 cell holds 20 vectors; minus the query itself = 19 candidates
    assert(out.length == 19)
    assert(out.forall(_.getLong(1) == 0L)) // all from the probed cell
    assert(out.forall(_.getLong(0) < 20L))
    val exact = SimSearch.topKForId(corpus, "vec_id", "embedding", 0L, 39)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach(r => assert(approx(r.getDouble(2), exact(r.getLong(0)))))
  }
}
