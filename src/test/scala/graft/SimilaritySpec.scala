package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("brute top-k: k rows per query, rank 1 has the max cosine") {
    val rows = Similarity.bruteTopK(spark, d)
      .as[(Long, Long, Int, Double)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === Similarity.NumQueries)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === Similarity.K, s"query $q")
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sortBy(-_).toSeq,
        s"cosine not descending for query $q")
    }
  }

  test("brute top-k plan: bounded-heap aggregate, no per-query window funnel") {
    // the ranking must be a partial+final aggregate (map-side k-entry
    // buffers), NOT a window partitioned by query_id — a window would
    // shuffle the whole corpus into #queries partitions
    val plan = Similarity.bruteTopK(spark, d).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window funnel in brute top-k plan:\n$plan")
    assert(plan.contains("topk_agg"), s"expected topk_agg in plan:\n$plan")
  }

  test("LSH recall is high on a corpus with planted near-neighbors") {
    // The parquet fixture's vectors are near-orthogonal (max cosine ~0.5),
    // so ANY bucketing has ~zero recall there — that's the data, not the
    // operator. Plant real near-duplicates: each query i<10 gets 3 noisy
    // copies; LSH must recover them.
    val rnd = new scala.util.Random(13)
    val dim = 32
    val base = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() - 0.5f)))
    val planted = for {
      (i, v) <- base.take(Similarity.NumQueries)
      c <- 0 until 3
    } yield (1000L + i * 10 + c,
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    val e = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

    val brute = Similarity.bruteTopKOn(e)
      .as[(Long, Long, Int, Double)].collect()
    val lsh = Similarity.lshTopKOn(e)
      .as[(Long, Long, Int, Double)].collect()
    // brute's top-3 per query must be the planted copies
    brute.filter(_._3 <= 3).foreach { case (q, n, _, cos) =>
      assert(n >= 1000L && (n - 1000) / 10 === q, s"query $q neighbor $n")
      assert(cos > 0.99, s"planted copy similarity $cos")
    }
    val bruteTop3 = brute.filter(_._3 <= 3)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lshByQ = lsh.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bruteTop3.map { case (q, top3) =>
      lshByQ.getOrElse(q, Set.empty).intersect(top3).size.toDouble / 3
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@3 (planted) = $mean%.2f")
    assert(mean >= 0.9, f"planted near-dup recall $mean%.2f too low")
  }

  test("IVF recall is high on a corpus with planted near-neighbors") {
    val rnd = new scala.util.Random(29)
    val dim = 32
    val base = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() - 0.5f)))
    val planted = for {
      (i, v) <- base.take(Similarity.NumQueries)
      c <- 0 until 3
    } yield (1000L + i * 10 + c,
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    val e = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

    val brute = Similarity.bruteTopKOn(e)
      .as[(Long, Long, Int, Double)].collect()
    val ivf = Similarity.ivfTopKOn(e)
      .as[(Long, Long, Int, Double)].collect()
    val bruteTop3 = brute.filter(_._3 <= 3)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivfByQ = ivf.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // a planted copy sits ~on top of its query, so both get the same
    // nearest centroid — probing the query's own cell must find them
    val recalls = bruteTop3.map { case (q, top3) =>
      ivfByQ.getOrElse(q, Set.empty).intersect(top3).size.toDouble / 3
    }
    val mean = recalls.sum / recalls.size
    info(f"mean IVF recall@3 (planted) = $mean%.2f")
    assert(mean >= 0.9, f"planted near-dup recall $mean%.2f too low")
  }

  test("PQ top-k: full re-derivation in plain Scala (codebooks, codes, ADC)") {
    import graft.operators.Similarity.PqParams._
    import graft.operators.Similarity.{K, NumQueries}
    val got = Similarity.pqTopK(spark, d)
      .as[(Long, Long, Int, Long, Double)].collect().toSeq
    val emb = Tables.embeddings(spark, d).select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val S = graft.functions.LshBuckets.QuantScale
    def md5h(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15),
      16)
    val qv: Map[Long, Array[Long]] = emb.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * S).toLong).toArray
    }.toMap
    val cb: Map[(Int, Long), Array[Long]] =
      (for {
        m <- 0 until M
        (cell, ids) <- emb.map(_._1).groupBy(id => md5h(s"pq_${m}_$id") % Codes)
      } yield (m, cell) -> qv(ids.min).slice(m * SubDim, (m + 1) * SubDim)).toMap
    def sub(id: Long, m: Int) = qv(id).slice(m * SubDim, (m + 1) * SubDim)
    def code(id: Long, m: Int): Long =
      (0L until Codes).filter(c => cb.contains((m, c))).minBy { c =>
        val cv = cb((m, c))
        (sub(id, m).zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }
    val want = (0 until NumQueries).map(_.toLong).flatMap { q =>
      emb.map(_._1).filter(_ != q).map { v =>
        val adc = (0 until M).map { m =>
          sub(q, m).zip(cb((m, code(v, m)))).map { case (a, b) => a * b }.sum
        }.sum
        (v, adc)
      }.sortBy { case (v, adc) => (-adc, v) }.take(K).zipWithIndex.map {
        case ((v, adc), i) => (q, v, i + 1, adc)
      }
    }
    assert(got.map(t => (t._1, t._2, t._3, t._4)) === want)
    // the cosine column re-scores the winners exactly (oracle-checked
    // for values); here pin the contract that it is bounded
    got.foreach { case (_, _, _, _, c) => assert(c >= -1.0 && c <= 1.0) }
  }

  test("knnClassify = majority vote over bruteTopK with smaller-label ties") {
    val labels = spark.read.parquet(s"$d/embeddings.parquet")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val topk = Similarity.bruteTopK(spark, d)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    val expected = topk.groupBy(_._1).map { case (q, nbs) =>
      val votes = nbs.map(n => labels(n._2))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val (lbl, n) = votes.toSeq.minBy { case (l, v) => (-v, l) }
      q -> ((labels(q), lbl, n, labels(q) == lbl))
    }
    val got = Similarity.knnClassify(spark, d)
      .as[(Long, Int, Int, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === expected)
  }

  test("prototypeClassify separates constructed classes; exact-mean protos") {
    // two well-separated classes on orthogonal axes + one vector sitting
    // closer to the other class's prototype (a planted misclassification)
    val rows = Seq(
      (0L, Array(1.0f, 0.1f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.2f, 0f, 0f), 0),
      (2L, Array(0f, 0f, 1.0f, 0.1f), 1),
      (3L, Array(0f, 0f, 0.8f, 0.3f), 1),
      (4L, Array(0f, 0.1f, 1.0f, 0f), 0)) // labeled 0, lives in class 1
    val e = rows.toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity.prototypeClassifyOn(e)
      .as[(Long, Int, Int, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._5))).toMap
    assert(got(0L) === ((0, true)))
    assert(got(1L) === ((0, true)))
    assert(got(2L) === ((1, true)))
    assert(got(3L) === ((1, true)))
    assert(got(4L) === ((1, false))) // the planted leak is caught

    // prototype arithmetic: independently recompute class 1's integer
    // mean and check vec 2 scores the exact quantized cosine against it
    val members = rows.filter(_._3 == 1).map(_._2)
    val proto = (0 until 4).map { dd =>
      members.map(v => math.floor(v(dd) * 1048576.0).toLong).sum /
        members.length
    }
    val qv2 = rows(2)._2.map(x => math.floor(x * 1048576.0).toLong).toSeq
    val dot = qv2.zip(proto).map { case (x, y) => x * y }.sum
    val nq = qv2.map(x => x * x).sum
    val np = proto.map(x => x * x).sum
    val want = BigDecimal(
        dot / (math.sqrt(nq.toDouble) * math.sqrt(np.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gotCos = graft.operators.Similarity.prototypeClassifyOn(e)
      .filter($"vec_id" === 2L).select($"cosine").as[Double].head()
    assert(gotCos === want)
  }

  test("filteredTopK = plain-Scala brute force over even-label corpus") {
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val corpus = rows.filter(_._3 % 2 == 0)
    val expect = rows.filter(_._1 < Similarity.NumQueries).flatMap {
      case (q, qv, _) =>
        corpus.filter(_._1 != q)
          .map { case (n, nv, _) => (n, cos(qv, nv)) }
          .sortBy { case (n, c) => (-c, n) }
          .take(Similarity.K).zipWithIndex
          .map { case ((n, c), i) =>
            (q, n, i + 1,
              BigDecimal(c).setScale(6,
                BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }.toSeq
    val got = Similarity.filteredTopK(spark, d)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(got === expect)
  }

  test("dominantDirection: exact integer recompute + planted anisotropy") {
    // corpus = strong common component on axis 2 + per-vector noise on
    // other axes: the dominant singular direction must be ~axis 2
    val rnd = new scala.util.Random(5)
    val dim = 8
    val rows = (0L until 40L).map { i =>
      val v = Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat * 0.2f)
      v(2) = 0.9f + (rnd.nextDouble() * 0.1).toFloat
      (i, v)
    }
    val e = rows.toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.dominantDirectionOn(e)
      .as[(Long, Long)].collect().toMap

    // exact re-derivation of the integer iteration
    val q = rows.map { case (_, v) =>
      v.map(x => math.floor(x * 1048576.0).toLong)
    }
    var w = Array.fill(dim)(1L)
    for (_ <- 1 to graft.operators.Similarity.PowerIters) {
      val sp = q.map(r => r.zip(w).map { case (a, b) => a * b }.sum / 1024)
      val t = (0 until dim).map(dd =>
        q.zip(sp).map { case (r, s2) => s2 * r(dd) }.sum).toArray
      val ma = t.map(math.abs).max
      w = t.map(_ / (ma / 1024 + 1))
    }
    assert(got === (0 until dim).map(dd => dd.toLong -> w(dd)).toMap)
    // the planted axis dominates
    assert(got.maxBy { case (_, c) => math.abs(c) }._1 === 2L)
  }

  test("IVFADC recall is high on a corpus with planted near-neighbors") {
    // dim-64 corpus (the PQ subspace constraint): a planted copy lands
    // in its query's coarse cell AND its residual quantizes onto the
    // query's residual codes, so the composed index must surface it
    val rnd = new scala.util.Random(67)
    val dim = 64
    val base = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() - 0.5f)))
    val planted = for {
      (i, v) <- base.take(Similarity.NumQueries)
      c <- 0 until 3
    } yield (1000L + i * 10 + c,
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    val e = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val brute = Similarity.bruteTopKOn(e)
      .as[(Long, Long, Int, Double)].collect()
    val bruteTop3 = brute.filter(_._3 <= 3)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Similarity.ivfPqTopKOn(e)
      .as[(Long, Long, Int, Double)].collect()
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bruteTop3.map { case (q, top3) =>
      byQ.getOrElse(q, Set.empty).intersect(top3).size.toDouble / 3
    }
    val mean = recalls.sum / recalls.size
    info(f"mean IVFADC recall@3 (planted) = $mean%.2f")
    assert(mean >= 0.9, f"planted near-dup recall $mean%.2f too low")
  }

  test("recall panel: residual IVFADC encoding >= raw encoding") {
    import org.apache.spark.sql.functions._
    // the reason production systems encode residuals, not vectors
    // (Jégou §IV) — pinned as a measured panel result, not scaladoc
    // (VERDICT r8 item 6). Holds on both fixture scales (measured
    // 0.84 vs 0.70 at sf0.001, 0.82 vs 0.78 at sf0.01).
    val means = Similarity.recallAtK(spark, d)
      .groupBy("method").agg(avg("recall").as("r"))
      .as[(String, Double)].collect().toMap
    assert(means.contains("ivfpq") && means.contains("ivfpq_raw"),
      s"panel legs missing: ${means.keys.toSeq.sorted}")
    info(f"ivfpq=${means("ivfpq")}%.3f ivfpq_raw=${means("ivfpq_raw")}%.3f")
    assert(means("ivfpq") >= means("ivfpq_raw"),
      f"residual ${means("ivfpq")}%.3f < raw ${means("ivfpq_raw")}%.3f")
  }

  test("nprobeSweep: cost and recall both monotone in the probe count") {
    val rows = Similarity.nprobeSweep(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Similarity.NProbeSweep)
    val byProbe = rows.sortBy(_._1)
    assert(byProbe.map(_._2).toSeq === byProbe.map(_._2).sorted.toSeq,
      "candidate volume must be nondecreasing in nprobe")
    assert(byProbe.map(_._4).toSeq === byProbe.map(_._4).sorted.toSeq,
      "recall must be nondecreasing in nprobe")
    assert(byProbe.last._4 > 0, "zero recall at max probes")
    // hits never exceed truth (#queries x K)
    assert(byProbe.forall(_._3 <= Similarity.NumQueries.toLong * Similarity.K))
  }

  test("pqDistortion: training wins always; residual wins on clustered data") {
    import org.apache.spark.sql.functions._
    // planted-cluster corpus (the residual encoding's premise): 10
    // centers, 40 noisy members each — coarse seeds land inside
    // clusters, so residuals concentrate near the origin
    val rnd = new scala.util.Random(43)
    val dim = 64
    val centers = Seq.fill(10)(Array.fill(dim)(rnd.nextFloat() - 0.5f))
    val e = (for {
      (c, ci) <- centers.zipWithIndex
      k <- 0 until 40
    } yield ((ci * 40 + k).toLong,
        c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f).toSeq))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val d2 = Similarity.pqDistortionOn(e)
      .select("method", "mean_d2").as[(String, Long)].collect().toMap
    info(s"planted mean_d2: $d2")
    assert(d2("pq_trained") <= d2("pq"),
      s"training raised distortion: ${d2("pq_trained")} > ${d2("pq")}")
    assert(d2("ivfpq") < d2("ivfpq_raw"),
      s"residual encoding did not win on clustered data: " +
        s"${d2("ivfpq")} >= ${d2("ivfpq_raw")}")
    // the fixture corpus direction (training wins there too) is pinned
    // by the hash-checked driver query; assert it locally as well
    val fx = Similarity.pqDistortion(spark, d)
      .select("method", "mean_d2").as[(String, Long)].collect().toMap
    assert(fx("pq_trained") <= fx("pq"))
  }

  test("Lloyd-trained PQ: distortion never increases, planted recall intact") {
    import org.apache.spark.sql.functions._
    // dim-64 planted corpus (PQ needs M*SubDim = 64): 200 random base
    // vectors + 3 noisy copies of each query
    val rnd = new scala.util.Random(41)
    val dim = 64
    val base = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() - 0.5f)))
    val planted = for {
      (i, v) <- base.take(Similarity.NumQueries)
      c <- 0 until 3
    } yield (1000L + i * 10 + c,
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    val e = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

    val subs = Similarity.pqSubvectors(e)
    // total quantization distortion Σ min-cell L2² — THE quantity Lloyd
    // descends; integer-truncated means can perturb the textbook
    // monotonicity by ≤ SubDim/4 per (vec, m), noise at the 2^40 scale
    // of these distances
    def distortion(cb: org.apache.spark.sql.DataFrame): Long =
      subs.join(broadcast(cb), Seq("m"))
        .select(col("vec_id"), col("m"),
          aggregate(zip_with(col("sub"), col("cv"),
            (x, y) => (x - y) * (x - y)), lit(0L), _ + _).as("d2"))
        .groupBy("vec_id", "m").agg(min("d2").as("d2"))
        .agg(sum("d2")).head().getLong(0)
    val seeded = distortion(Similarity.pqCodebook(e, subs))
    val trained = distortion(Similarity.pqCodebookTrained(e, subs,
      Similarity.PqIters))
    info(f"PQ distortion seeded=$seeded%d trained=$trained%d " +
      f"(${100.0 * (seeded - trained) / seeded}%.1f%% lower)")
    assert(trained <= seeded,
      s"Lloyd training increased distortion: $trained > $seeded")

    // retrieval: planted near-copies quantize onto their query's codes,
    // so trained ADC must surface them
    val brute = Similarity.bruteTopKOn(e)
      .as[(Long, Long, Int, Double)].collect()
    val bruteTop3 = brute.filter(_._3 <= 3)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(rows: Array[(Long, Long, Int, Long, Double)]): Double = {
      val byQ = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = bruteTop3.map { case (q, top3) =>
        byQ.getOrElse(q, Set.empty).intersect(top3).size.toDouble / 3 }
      rs.sum / rs.size
    }
    val rSeeded = recall(Similarity.pqTopKOn(e)
      .as[(Long, Long, Int, Long, Double)].collect())
    val rTrained = recall(Similarity.pqTrainedTopKOn(e)
      .as[(Long, Long, Int, Long, Double)].collect())
    info(f"PQ planted recall@3 seeded=$rSeeded%.2f trained=$rTrained%.2f")
    assert(rTrained >= rSeeded,
      f"training lost planted recall: $rTrained%.2f < $rSeeded%.2f")
    assert(rTrained >= 0.9, f"trained planted recall $rTrained%.2f too low")
  }

  test("PQ codebook stays <= M x Codes regardless of corpus size") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity.PqParams._
    // 5000 vectors, 10x the sf0.01 fixture — the codebook must not grow
    val e = spark.range(5000)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(1, 64), i -> cast(id % 7 + i as float))")
          .as("embedding"))
    val cb = Similarity.pqCodebook(e, Similarity.pqSubvectors(e))
      .select("m", "cell").as[(Int, Long)].collect()
    assert(cb.length <= M * Codes, s"codebook has ${cb.length} rows")
    assert(cb.distinct.length === cb.length)
    // non-degenerate: every subspace populates most of its cells
    (0 until M).foreach { m =>
      assert(cb.count(_._1 == m) >= Codes / 2, s"subspace $m sparse")
    }
  }

  test("IVF on the fixture emits ranked rows with exact cosines") {
    val rows = Similarity.ivfTopK(spark, d)
      .as[(Long, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val ranks = rs.map(_._3).sorted.toSeq
      assert(ranks === (1 to rs.length), s"ranks not dense for query $q")
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sortBy(-_).toSeq,
        s"cosine not descending for query $q")
    }
  }

  test("k-means codebook is bit-deterministic and keeps IVF recall high") {
    val rnd = new scala.util.Random(31)
    val dim = 32
    val base = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() - 0.5f)))
    val planted = for {
      (i, v) <- base.take(Similarity.NumQueries)
      c <- 0 until 3
    } yield (1000L + i * 10 + c,
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    val e = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

    val c1 = Similarity.kmeansCentroids(e, 2)
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    val c2 = Similarity.kmeansCentroids(e, 2)
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    assert(c1 === c2, "integer-quantized k-means must be bit-deterministic")
    assert(c1.forall(_._2.length == dim))

    val brute = Similarity.bruteTopKOn(e)
      .as[(Long, Long, Int, Double)].collect()
    val ivf = Similarity.ivfTopKOn(e, Similarity.kmeansCentroids(e, 2))
      .as[(Long, Long, Int, Double)].collect()
    val bruteTop3 = brute.filter(_._3 <= 3)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivfByQ = ivf.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bruteTop3.map { case (q, top3) =>
      ivfByQ.getOrElse(q, Set.empty).intersect(top3).size.toDouble / 3
    }
    val mean = recalls.sum / recalls.size
    info(f"mean IVF recall@3 with trained codebook = $mean%.2f")
    assert(mean >= 0.9, f"trained-codebook recall $mean%.2f too low")
  }

  test("LshBuckets is deterministic and emits Tables keys in [0, 2^Bits)") {
    import graft.functions.LshBuckets
    val e = Tables.embeddings(spark, d)
    val b1 = Similarity.buckets(e).as[(Long, Int, Long)].collect().toSet
    val b2 = Similarity.buckets(e).as[(Long, Int, Long)].collect().toSet
    assert(b1 === b2)
    assert(b1.map(_._2).max === LshBuckets.Tables - 1)
    assert(b1.forall { case (_, _, k) => k >= 0 && k < (1L << LshBuckets.Bits) })
  }

  test("widened LSH geometry SPLITS the default buckets (shared planes)") {
    // the embeddingLshPairsWide scale dial rests on this: plane (t,b,d)
    // is geometry-independent, so a wider key's low Bits bits must EQUAL
    // the default key in every shared table — extra bits only split
    // buckets (occupancy can only drop per table), never re-shuffle them
    import org.apache.spark.sql.functions.{col, posexplode}
    import graft.functions.LshBuckets
    import graft.operators.Dedup
    val e = Tables.embeddings(spark, d)
    val narrow = e.select(col("vec_id"),
        posexplode(LshBuckets(col("embedding"))).as(Seq("t", "k")))
      .as[(Long, Int, Long)].collect()
      .map { case (v, t, k) => (v, t) -> k }.toMap
    val wide = e.select(col("vec_id"),
        posexplode(LshBuckets(col("embedding"),
          Dedup.WideLshTables, Dedup.WideLshBits)).as(Seq("t", "k")))
      .as[(Long, Int, Long)].collect()
    assert(wide.map(_._2).max === Dedup.WideLshTables - 1)
    val mask = (1L << LshBuckets.Bits) - 1
    val shared = wide.filter(_._2 < LshBuckets.Tables)
    assert(shared.nonEmpty)
    shared.foreach { case (v, t, k) =>
      assert((k & mask) === narrow((v, t)),
        s"vec $v table $t: wide key $k does not extend the narrow key")
    }
  }

  test("scaledLshGeometry: bits tracks log2(n), occupancy bound holds") {
    import graft.functions.LshBuckets
    import graft.operators.Dedup
    // floor: fixture-sized corpora resolve to the DEFAULT geometry, so
    // the scaled pair path is byte-identical to the oracle-checked one
    assert(Dedup.scaledLshGeometry(0) === (LshBuckets.Tables, LshBuckets.Bits))
    assert(Dedup.scaledLshGeometry(Dedup.ScaledLshTargetOccupancy << LshBuckets.Bits) ===
      (LshBuckets.Tables, LshBuckets.Bits))
    // growth zone: expected occupancy n/2^bits stays <= target, bits
    // monotone in n, tables widen to the max alongside
    var prevBits = 0
    for (exp <- 8 to 26) {
      val n = 1L << exp
      val (t, b) = Dedup.scaledLshGeometry(n)
      assert(b >= prevBits, s"bits not monotone at n=$n")
      prevBits = b
      // tables widen to the PER-TABLE ceiling (WideLshTables — r13:
      // LshBuckets.MaxTables grew to 16 to host the composite branch's
      // base signatures and is no longer the per-table dial's target)
      if (n <= (Dedup.ScaledLshTargetOccupancy << LshBuckets.MaxBits)) {
        assert((n >> b) <= Dedup.ScaledLshTargetOccupancy,
          s"occupancy bound violated at n=$n: ${n >> b} > target with bits=$b")
        assert(t === (if (b > LshBuckets.Bits) Dedup.WideLshTables else LshBuckets.Tables))
      } else {
        // past the cap: widest per-table geometry; the occupancy GUARD
        // (refusal naming the shard dial) is the documented next step
        assert(b === LshBuckets.MaxBits && t === Dedup.WideLshTables)
      }
    }
  }

  test("ivfGeometry: K ~ sqrt(n) in pure integers, bounds consistent") {
    import graft.operators.Similarity
    val rows = Similarity.ivfGeometry(spark, d)
      .as[(String, Long, Int, Long, Long, Long, Long)].collect()
    assert(rows.length === 8)
    rows.foreach { case (_, n, j, k, occ, probe, ops) =>
      assert(k === (1L << j))
      // 2^j >= sqrt(n) via the integer 4^j >= n test (above the floor,
      // below the cap), and 2^(j-1) < sqrt(n) unless floored
      if (j > Similarity.CodebookExp && j < Similarity.MaxCodebookExp)
        assert((1L << (2 * (j - 1))) < n && n <= (1L << (2 * j)))
      assert(occ === (n + k - 1) / k)
      assert(probe === Similarity.NProbe * occ)
      assert(ops === n * k)
      // the dial's point: per-query rerank stays ~NProbe*sqrt(n)
      if (j < Similarity.MaxCodebookExp)
        assert(occ <= math.ceil(math.sqrt(n.toDouble)).toLong + 1)
    }
  }

  test("assignmentMargin: margins nonneg, census conserves vectors") {
    import graft.operators.Similarity
    val rows = Similarity.assignmentMargin(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // every vector is assigned exactly once
    assert(rows.map(_._2).sum === Tables.embeddings(spark, d).count())
    rows.foreach { case (cell, n, own, gap, minGap, bppm) =>
      assert(n > 0)
      // argmax construction: top-1 >= top-2 per vector, so every gap
      // statistic is nonnegative and own >= gap-implied runner-up
      assert(minGap >= 0, s"cell $cell min gap $minGap < 0")
      assert(gap >= 0 && bppm >= 0 && bppm <= 1000000)
      assert(own >= -1048576L && own <= 1048576L)
      // boundary ppm consistent with the min gap: a cell whose minimum
      // gap clears the threshold has zero boundary vectors
      if (minGap >= Similarity.AssignMarginBoundaryQ) assert(bppm === 0)
    }
  }

  test("lshGeometryEval: recall and candidate counts consistent with pairs") {
    import graft.operators.Dedup
    val rows = Dedup.lshGeometryEval(spark, d)
      .as[(String, Int, Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet === Set("default", "wide", "composite"))
    val df = rows("default"); val w = rows("wide"); val c = rows("composite")
    // verified pairs equal the corresponding pair queries' row counts
    assert(df._5 === Dedup.embeddingLshPairs(spark, d).count())
    assert(w._5 === Dedup.embeddingLshPairsWide(spark, d).count())
    assert(c._5 === Dedup.embeddingLshPairsComposite(spark, d).count())
    rows.values.foreach { r =>
      assert(r._5 <= r._4, "verified pairs exceed candidates")
      assert(r._5 <= r._6, "verified pairs exceed truth")
      assert(r._7 === r._5 * 1000000L / r._6)
    }
    // wider geometry only SPLITS buckets per shared table, but its 4
    // EXTRA tables add candidates independently — no ordering between
    // total candidate counts is guaranteed, only the recall identity
    assert(df._6 === w._6, "truth set must be geometry-independent")
    assert(df._6 === c._6, "truth set must be geometry-independent")
    // AND-composition THEOREM under shared planes: a composite key
    // match requires both constituent 16-bit keys to match, and a
    // 16-bit key match implies the 10-bit prefix (planes 0..9 of the
    // same table) matches — so composite candidates/pairs/recall are
    // bounded by the wide leg's
    assert(c._4 <= w._4, "composite candidates must be a wide subset")
    assert(c._5 <= w._5, "composite recall cannot exceed wide")
  }

  test("embeddingLshPairsCompositePlanted: pairs collide in a composed " +
      "table pair, survive the verify, and recover planted twins") {
    import graft.operators.Dedup
    import graft.functions.LshBuckets
    import org.apache.spark.sql.functions.col
    val pairs = Dedup.embeddingLshPairsCompositePlanted(spark, d)
      .as[(Long, Long, Double)].collect()
    val corpus = Dedup.plantedNearDupCorpus(graft.Tables.embeddings(spark, d))
    // derive the geometry from the PRODUCTION dial constants, not from
    // LshBuckets.MaxTables: MaxTables is only "the widest any caller
    // may ask" (it grew 8 -> 16 to host this branch and may grow
    // again), while CompositeLshTables * CompositeLshArity is what
    // compositeBuckets actually draws — keying this spec on MaxTables
    // would silently re-point it at table pairs production never
    // builds on the next widening
    val baseTables = Dedup.CompositeLshTables * Dedup.CompositeLshArity
    val bkts = corpus
      .select(col("vec_id"),
        LshBuckets(col("embedding"), baseTables, LshBuckets.MaxBits)
          .as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(pairs.nonEmpty, "fixture must exercise the composite branch")
    pairs.foreach { case (a, b, cos) =>
      assert(cos >= Dedup.CosineLshThreshold)
      val (ba, bb) = (bkts(a), bkts(b))
      val collides = (0 until Dedup.CompositeLshTables)
        .exists(k => ba(2 * k) == bb(2 * k) && ba(2 * k + 1) == bb(2 * k + 1))
      assert(collides, s"pair ($a,$b) shares no composed table pair")
    }
    // at least one planted twin is recovered, and every recovered twin
    // is a genuine plant (vec_b = vec_a + offset, vec_a on the stride)
    val planted = pairs.filter { case (a, b, _) =>
      b == a + Dedup.CompositePlantIdOffset
    }
    assert(planted.nonEmpty, "no planted twin recovered")
    planted.foreach { case (a, _, _) =>
      assert(a % Dedup.CompositePlantStride === 0)
    }
    // the raw fixture corpus has no near-identical pairs (max cosine
    // ~0.45), so the production operator's result there is the empty
    // set — the documented regime boundary, pinned
    assert(Dedup.embeddingLshPairsComposite(spark, d).count() === 0L)
    // DECLARED recall floor (VERDICT r10 item 8): in the composite
    // bucketing's target regime — twins at true cosine >=
    // CompositeRecallFloorCosine — at least CompositeRecallFloor of
    // the plants must be recovered. Ordering bounds (composite <=
    // wide) say only that AND-composition loses recall; this pins that
    // it keeps ENOUGH, and the dial if it ever dips is named in the
    // floor's scaladoc (OR-amplification: more composite tables).
    val twinCos = corpus
      .select(col("vec_id").as("i"), col("embedding").as("va"))
      .join(corpus.select(
        (col("vec_id") - Dedup.CompositePlantIdOffset).as("i"),
        col("embedding").as("vb")), "i")
      .select(col("i"),
        graft.functions.CosineSimilarity(col("va"), col("vb")).as("c"))
      .as[(Long, Double)].collect()
    val nearIdentical = twinCos
      .filter(_._2 >= Dedup.CompositeRecallFloorCosine).map(_._1).toSet
    assert(nearIdentical.nonEmpty, "no plants in the >=0.9 regime")
    val recoveredA = planted.map(_._1).toSet
    val recall =
      nearIdentical.count(recoveredA).toDouble / nearIdentical.size
    info(f"composite recall at cosine>=${Dedup.CompositeRecallFloorCosine}: " +
      f"$recall%.2f (${nearIdentical.count(recoveredA)}/${nearIdentical.size})")
    assert(recall >= Dedup.CompositeRecallFloor,
      f"composite recall $recall%.2f below declared floor " +
        f"${Dedup.CompositeRecallFloor} - widen the composite table count " +
        "(OR-amplification)")
  }

  test("embeddingLshPairsScaled equals the default path at fixture scale") {
    import graft.operators.Dedup
    val scaled = Dedup.embeddingLshPairsScaled(spark, d).collect().toSeq
    val default = Dedup.embeddingLshPairs(spark, d).collect().toSeq
    assert(scaled === default)
  }

  test("production LSH paths hint the verify join broadcast; audit " +
      "variants do not") {
    import graft.operators.Dedup
    // the r11 stage decomposition measured the verify join's
    // broadcast->shuffle demotion as the ENTIRE superlinear byte curve
    // of the shared embedding-edge build (47 -> 2168 -> 4528 MiB across
    // x16/x32/x64 while candidates stayed linear); the fix is a hint,
    // so it must be STRUCTURAL in the plan - visible as ResolvedHint in
    // the analyzed plan regardless of AQE's own size-based choices -
    // not an artifact of fixture-sized tables sneaking under the
    // auto-broadcast threshold
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("ResolvedHint")
    assert(hinted(Dedup.embeddingLshPairsScaled(spark, d)),
      "scaled path must hint the verify join under the vector cap")
    assert(hinted(Dedup.embeddingLshPairsComposite(spark, d)),
      "composite path must hint the verify join under the vector cap")
    // the fixed/wide audit variants exist to measure the naive curves -
    // hinting them would silently falsify the artifact's contrast
    assert(!hinted(Dedup.embeddingLshPairs(spark, d)),
      "fixed-geometry audit variant must stay un-hinted")
    assert(!hinted(Dedup.embeddingLshPairsWide(spark, d)),
      "wide-geometry audit variant must stay un-hinted")
  }

  test("the geometry dial branches on the PASSED corpus size: past-cap " +
      "selects AND-composed bucketing and drops the broadcast hint") {
    import graft.operators.Dedup
    // the Scaling harness drives this entry point with a synthetic
    // >cap corpus (composite_cap_crossing row) — pin structurally that
    // the dial's selection is a function of n, not of fixture identity:
    // the AND-composed key construction (shiftleft composition) only
    // appears past LshCompositeCapVectors, and the verify-broadcast
    // hint (capped at VerifyBroadcastMaxVectors = the same 2^21) must
    // drop exactly there
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("ResolvedHint")
    def composed(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("shiftleft")
    val e = Tables.embeddings(spark, d)
    val past = Dedup.embeddingLshPairsScaledOn(e,
      Dedup.LshCompositeCapVectors + 1)
    assert(composed(past), "past-cap must select the composite bucketing")
    assert(!hinted(past), "past-cap verify must stay a shuffle join " +
      "(a broadcast there would OOM at real size)")
    val atCap = Dedup.embeddingLshPairsScaledOn(e,
      Dedup.LshCompositeCapVectors)
    assert(!composed(atCap), "at-cap must stay on the per-table geometry")
    assert(hinted(atCap), "at-cap per-table verify must broadcast " +
      "(caps coincide at 2^21)")
  }

  test("IVF candidates per query stay ~NProbe*n/K on a 10x corpus") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // VERDICT r6 item 7: at the FIXED CodebookSize the per-query
    // candidate set is ~NProbe*n/K — linear in n. Pin that contract on
    // a 10x random corpus (5000 vectors vs sf0.01's 500): every query's
    // candidates must stay within a small constant of NProbe*n/K —
    // i.e. bounded by cell balance, never corpus-sized. The documented
    // production dial for growing n is raising K toward sqrt(n), which
    // changes only the CodebookSize constant.
    val rnd = new scala.util.Random(53)
    val n = 5000
    val e = Seq.tabulate(n)(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    // mirror ivfTopKOn's assignment: nearest default centroid per vector
    val cents = Similarity.defaultCentroids(e)
    val ranked = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        graft.functions.CosineSimilarity(col("embedding"), col("cv"))
          .as("ccos"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("ccos"), asc("cent_id"))))
    val cellSizes = ranked.filter(col("crn") === 1)
      .groupBy("cent_id").agg(count(lit(1)).as("sz"))
    val perQuery = ranked
      .filter(col("crn") <= Similarity.NProbe &&
        col("vec_id") < Similarity.NumQueries)
      .join(cellSizes, "cent_id")
      .groupBy("vec_id").agg(sum("sz").as("cands"))
      .as[(Long, Long)].collect()
    assert(perQuery.length === Similarity.NumQueries)
    val perCell = n.toDouble / Similarity.CodebookSize
    val worst = perQuery.map(_._2).max
    info(f"10x corpus: worst candidates/query = $worst%d, " +
      f"NProbe*n/K = ${Similarity.NProbe * perCell}%.0f")
    perQuery.foreach { case (q, c) =>
      assert(c <= Similarity.NProbe * perCell * 4,
        s"query $q: $c candidates > 4x the NProbe*n/K bound " +
          s"(${Similarity.NProbe * perCell}) — cell balance broken")
    }
    // and the average must sit near the nominal bound, not the slack
    val avg = perQuery.map(_._2).sum.toDouble / perQuery.length
    assert(avg <= Similarity.NProbe * perCell * 2,
      f"avg candidates/query $avg%.0f > 2x NProbe*n/K")
  }

  test("IVF codebook stays <= CodebookSize regardless of corpus size") {
    import org.apache.spark.sql.functions._
    // 5000 vectors — 10x the sf0.01 fixture; the old every-40th rule
    // would yield 125 centroids here, growing without bound. The md5-cell
    // codebook must stay capped, with distinct seed ids.
    val e = spark.range(5000)
      .select(col("id").as("vec_id"),
        expr("array(cast(id % 7 as float), cast(1.0 as float))")
          .as("embedding"))
    val cents = Similarity.defaultCentroids(e)
      .as[(Long, Seq[Float])].collect()
    assert(cents.length <= Similarity.CodebookSize,
      s"codebook has ${cents.length} rows > ${Similarity.CodebookSize}")
    assert(cents.map(_._1).distinct.length === cents.length)
    // and non-degenerate: the md5 assignment should populate most cells
    assert(cents.length >= Similarity.CodebookSize / 2)
  }

  test("labelPurity: one row per query, k of 5, bounded purity") {
    val rows = Similarity.labelPurity(spark, d)
      .as[(Long, Int, Long, Long, Double)].collect()
    assert(rows.length === Similarity.NumQueries)
    rows.foreach { case (_, _, k, same, purity) =>
      assert(k === Similarity.K.toLong)
      assert(same >= 0L && same <= k)
      assert(math.abs(purity - same.toDouble / k) < 1e-6)
    }
  }

  test("rangeSearch: radius semantics, slice bound, exact cosines") {
    val rows = Similarity.rangeSearch(spark, d)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val vecs = graft.Tables.embeddings(spark, d)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (k <- a.indices) {
        dot += a(k).toDouble * b(k); na += a(k).toDouble * a(k)
        nb += b(k).toDouble * b(k)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.foreach { case (q, n, cos) =>
      assert(q < Similarity.RangeQueries && q != n)
      val exact = cosine(vecs(q), vecs(n))
      assert(exact >= Similarity.RangeThreshold, s"pair $q,$n below radius")
      assert(math.abs(cos - exact) < 1e-6, s"pair $q,$n cosine mismatch")
    }
    // no per-query cap: result size is data-dependent, dupes impossible
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length)
  }

  test("mmrRerank diversifies across planted clusters; plain topk would not") {
    // Query q = e₁. Cluster A (ids 10..14): five IDENTICAL vectors at
    // cos 0.9 to q — plain top-5 picks all of A, but after one pick the
    // rest score rel − simAA = 0.9 − 1.0 = −0.1. Cluster B (ids
    // 20..24): identical vectors at rel 0.3 with sim(B, A) = 0.27, so
    // B's first pick scores 0.3 − 0.27 = +0.03 > −0.1 and MMR's SECOND
    // pick must defect to B; B's duplicates then score 0.3 − 1 = −0.7,
    // so ranks 3..5 return to A. Exactly one B in the final list.
    def v(a: Double, b: Double, c: Double): Seq[Float] =
      Seq(a, b, c, 0.0).map(_.toFloat)
    val rows =
      Seq((0L, v(1.0, 0.0, 0.0))) ++ // the query (vec_id < NumQueries)
      (0 until 5).map(k => (10L + k, v(0.9, 0.43589, 0.0))) ++
      (0 until 5).map(k => (20L + k, v(0.3, 0.0, 0.953939)))
    val e = rows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val got = Similarity.mmrRerankOn(e)
      .select("query_id", "rank", "neighbor_id", "penalty")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(got.map(_._1).forall(_ === 0L))
    assert(got.map(_._2).toSeq === Seq(1, 2, 3, 4, 5))
    assert(got.map(_._3).distinct.length === 5, "picks must be distinct")
    assert(got.head._4 === 0.0, "rank-1 penalty is zero")
    val picks = got.map(_._3)
    assert(picks.head === 10L, s"rank1 = min-id top-A: ${picks.toSeq}")
    assert(picks(1) === 20L,
      s"rank2 must defect to cluster B, got ${picks.toSeq}")
    assert(picks.drop(2).forall(p => p >= 11L && p < 15L),
      s"ranks 3..5 return to A: ${picks.toSeq}")
    // the full driver query emits exactly NumQueries × MmrK ranked rows
    val full = Similarity.mmrRerank(spark, "/root/testdata/sf0.001")
    assert(full.count() === Similarity.NumQueries * Similarity.MmrK)
  }

  test("hybridRrf: fusion arithmetic and ordering invariants") {
    val d = "/root/testdata/sf0.001"
    val rows = Similarity.hybridRrf(spark, d)
      .as[(Long, Int, Long, Option[Int], Option[Int], Double)].collect()
    assert(rows.length === Similarity.NumQueries * Similarity.RrfK)
    val C = Similarity.RrfC
    rows.foreach { case (q, rank, doc, rs, rl, rrf) =>
      assert(rs.isDefined || rl.isDefined, s"$q/$doc in neither list")
      val expect = rs.map(r => 1.0 / (C + r)).getOrElse(0.0) +
        rl.map(r => 1.0 / (C + r)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 1e-9, s"$q/$doc rrf")
    }
    // rrf non-increasing within each query's ranked list
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2).map(_._6)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
    // dual-listed docs outrank solo-listed docs at equal best rank:
    // a doc that is #1 in BOTH lists must be fused rank 1
    rows.groupBy(_._1).values.foreach { g =>
      g.find(r => r._4.contains(1) && r._5.contains(1))
        .foreach(r => assert(r._2 === 1, s"double-#1 not fused first: $r"))
    }
  }

  test("tokenFertility conserves tokenCounts' totals per language") {
    import graft.operators.TextAnalysis
    val d = "/root/testdata/sf0.001"
    val perDoc = TextAnalysis.tokenCounts(spark, d)
      .join(graft.Tables.documents(spark, d).select("doc_id", "lang"),
        "doc_id")
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_ws_tokens").as("w"),
        org.apache.spark.sql.functions.sum("n_bpe_tokens").as("b"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val got = TextAnalysis.tokenFertility(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (lang, _, nw, nt, ppk) =>
      assert(perDoc(lang) === ((nw, nt)), lang)
      assert(ppk === nt * 1000 / nw, lang)
      assert(ppk >= 1000, s"$lang: BPE-ish regex splits at least per word")
    }
  }

  test("ivfBalance conserves vectors and cells against the assignment") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val rows = Similarity.ivfBalance(spark, d)
      .as[(Int, Long, Long, Long)].collect()
    val n = graft.Tables.embeddings(spark, d).count()
    assert(rows.map(_._3).sum === n, "buckets must partition the corpus")
    assert(rows.map(_._2).sum <= Similarity.CodebookSize)
    // every bucket's max share is consistent with its size bounds:
    // a cell in bucket b holds < 2^(b+1) vectors
    rows.foreach { case (b, _, _, ppm) =>
      assert(ppm <= (1L << (b + 1)) * 1000000L / n, s"bucket $b")
    }
  }

  test("kcenterSelect follows farthest-first greedy on a planted line") {
    // 1-D corpus (positions are multiples of 2^-10, exact in float AND
    // in the 2^20 quantization) — the greedy trace is hand-simulable
    val pts = Seq(0, 100, 50, 75, 25, 60, 10, 90, 40, 66)
    val e = pts.zipWithIndex.map { case (p, i) =>
      (i + 1L, Array(p / 1024.0f, 0f, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.kcenterSelectOn(e)
      .as[(Int, Long, Long, Long, Long)].collect()

    // independent greedy in the same integer space
    val q = pts.map(p => p.toLong * 1024L) // floor(p/2^10 * 2^20)
    val ids = pts.indices.map(_ + 1L)
    def d2(a: Long, b: Long) = (a - b) * (a - b)
    var centers = Vector((ids.head, 1, 0L)) // start: min vec_id
    var dist = ids.indices.map(i => d2(q(i), q.head)).toVector
    for (k <- 2 to Similarity.KCenterK) {
      val md = dist.max
      val sel = ids.indices.filter(i => dist(i) === md).map(ids).min
      centers :+= ((sel, k, md))
      val si = ids.indexOf(sel)
      dist = ids.indices.map(i => math.min(dist(i), d2(q(i), q(si)))).toVector
    }
    assert(got.map(r => (r._2, r._1, r._3)).toSeq === centers)
    // Voronoi sizes: every point to nearest center (ties smaller cid)
    val cellOf = ids.indices.map { i =>
      centers.map { case (cid, _, _) =>
        (d2(q(i), q(ids.indexOf(cid))), cid)
      }.min._2
    }
    got.foreach { case (_, cid, _, size, rad) =>
      val members = ids.indices.filter(i => cellOf(i) === cid)
      assert(size === members.size.toLong, s"center $cid size")
      assert(rad === members.map(i =>
        d2(q(i), q(ids.indexOf(cid)))).max, s"center $cid radius")
    }
  }
}
