package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, SimHash64, Winnow}
import graft.ops.{DedupOps, MultiModalOps, SampleOps, SimilarityOps, TextOps}

class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2L, "the quick brown fox jumps over the lazy dog and runs away fast"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog and walks away fast"), // near dup of 1
    (4L, "der schnelle braune fuchs springt und die hunde sind nicht da und das ist ein test"),
    (5L, "completely different content about spark catalyst optimizer internals and shuffles"),
    (6L, "int main() { return 0; } // {}();= dense symbols [a](b) <c> = {d};")
  ).toDF("doc_id", "text")

  test("exact dedup keeps one representative per content hash") {
    val dd = DedupOps.exactDedup(docs, "text", "doc_id")
    assert(dd.count() == 5)
    assert(dd.filter($"doc_id" === 2L).count() == 0) // min-id representative kept
    val groups = DedupOps.exactDupGroups(docs, "text", "doc_id")
    assert(groups.filter($"copies" === 2).count() == 1)
  }

  test("minhash LSH finds the near-dup pair and not unrelated docs") {
    val pairs = DedupOps
      .minhashCandidatePairs(docs, "text", "doc_id", k = 5, numHashes = 32, bands = 8)
    val verified = DedupOps
      .jaccardVerify(pairs, docs, "text", "doc_id", k = 5, threshold = 0.6)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(verified.contains((1L, 2L))) // exact dup
    assert(verified.contains((1L, 3L)) || verified.contains((2L, 3L))) // near dup
    assert(!verified.exists(p => p._1 == 5L || p._2 == 5L)) // unrelated
  }

  test("grouped in-bucket pair generation equals the band self-join shape") {
    // the r7 restructure replaced the candidate self-join on (band, bucket)
    // with a groupBy + in-bucket pair generation; this pins the two shapes
    // equal on a real corpus (both SFs), est-prefiltered and not
    import org.apache.spark.sql.functions._
    for (sf <- Seq("0.001", "0.01")) {
      val d = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      val numHashes = 32; val bands = 8; val rows = numHashes / bands
      val banded = d
        .select(
          $"doc_id".as("id"),
          DedupOps.minhashSignature($"text", 5, numHashes).as("sig")
        )
        .select(
          $"id",
          $"sig",
          explode(
            array((0 until bands).map { b =>
              struct(
                lit(b).as("band"),
                xxhash64(slice($"sig", b * rows + 1, rows)).as("bucket")
              )
            }: _*)
          ).as("bb")
        )
        .select($"id", $"sig", $"bb.band".as("band"), $"bb.bucket".as("bucket"))
      // reference: the pre-r7 self-join shape, written out here
      val l = banded.select($"band", $"bucket", $"id".as("id_a"), $"sig".as("sig_a"))
      val r = banded.select($"band", $"bucket", $"id".as("id_b"), $"sig".as("sig_b"))
      val joinRef = l
        .join(r, Seq("band", "bucket"))
        .filter($"id_a" < $"id_b")
        .withColumn(
          "est_jaccard",
          graft.functions.GraftFunctions
            .sigAgree($"sig_a", $"sig_b")
            .cast("double") / numHashes
        )
        .filter($"est_jaccard" >= 0.35)
        .select("id_a", "id_b", "est_jaccard")
        .distinct()
        .as[(Long, Long, Double)]
        .collect()
        .toSet
      val grouped = DedupOps
        .minhashCandidatePairs(
          d, "text", "doc_id", k = 5, numHashes = numHashes, bands = bands,
          minEst = Some(0.35))
        .as[(Long, Long, Double)]
        .collect()
        .toSet
      assert(grouped == joinRef, s"candidate-pair shapes diverge at sf$sf")
    }
  }

  test("GraftExtensions injects the function set without error") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(e) // must not throw
    // and the SQL registry path resolves the same kernels
    val viaSql = spark
      .sql("SELECT graft_simhash64('hello world') AS h, graft_minhash('hello world', 3, 4) AS m")
      .collect()(0)
    assert(viaSql.getLong(0) == graft.functions.SimHash64.simhash("hello world"))
    assert(viaSql.getSeq[Long](1).length == 4)
  }

  test("native minhash estimates shingle Jaccard") {
    import graft.functions.MinHashSig
    val a = "the quick brown fox jumps over the lazy dog and runs away fast"
    val b = "the quick brown fox jumps over the lazy dog and walks away fast"
    def sh(s: String) = s.sliding(5).toSet
    val exact = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
    val sa = MinHashSig.signature(a, 5, 128)
    val sb = MinHashSig.signature(b, 5, 128)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 128
    assert(math.abs(est - exact) < 0.2, s"est=$est exact=$exact")
    // identical input -> identical signature
    assert(MinHashSig.signature(a, 5, 32).toSeq == MinHashSig.signature(a, 5, 32).toSeq)
    // disjoint texts share (almost) no minhashes
    val sc = MinHashSig.signature("zzz qqq www 0123456789 !!!", 5, 128)
    assert(sa.zip(sc).count { case (x, y) => x == y } <= 3)
  }

  test("simhash: identical ham dist 0; near-dup small; unrelated large") {
    val h1 = SimHash64.simhash("the quick brown fox jumps over the lazy dog and runs away fast")
    val h2 = SimHash64.simhash("the quick brown fox jumps over the lazy dog and walks away fast")
    val h3 = SimHash64.simhash("completely different content about spark catalyst optimizer internals")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h1) == 0)
    assert(ham(h1, h2) < ham(h1, h3))

    val pairs = DedupOps
      .simhashPairs(docs, "text", "doc_id", maxHamming = 8)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash banding recall is 1 at the advertised radius (chunks = maxHamming+1)") {
    // 80 synthetic docs incl. clusters of near-identical texts; ground truth
    // by brute force over all pairs, compared at maxHamming = 10 — the
    // pigeonhole guarantee must make the banded join recall every pair
    val synth = (0 until 80).map { i =>
      val base = s"document number ${i / 4} talks about topic ${i / 8} in detail"
      val noise = if (i % 4 == 0) "" else s" variant ${i % 4}"
      (i.toLong, base + noise)
    }
    val df = synth.toDF("doc_id", "text")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hashes = synth.map { case (id, t) => (id, SimHash64.simhash(t)) }
    val exact = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && ham(ha, hb) <= 10
    } yield (ia, ib)).toSet
    val got = DedupOps
      .simhashPairs(df, "text", "doc_id", maxHamming = 10)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(exact.nonEmpty, "ground truth should contain near-dup pairs")
    assert(got == exact, s"missing=${(exact -- got).take(5)} spurious=${(got -- exact).take(5)}")
  }

  test("crowded-bucket caps bound candidate generation without losing distinct pairs") {
    // 300 identical docs (one degenerate bucket) + one near-dup pair; with
    // maxBucketSize below the crowd the identical block is skipped but the
    // distinct pair still collides in its own buckets
    val crowd = (0 until 300).map(i => (i.toLong, "boilerplate legal disclaimer text repeated verbatim"))
    val tA = "a unique story about catalyst expression codegen and shuffles"
    val tB = "a unique story about catalyst expression codegen and shuffle"
    val pairDocs = Seq((1000L, tA), (1001L, tB))
    // radius that provably includes the planted pair
    val radius =
      java.lang.Long.bitCount(SimHash64.simhash(tA) ^ SimHash64.simhash(tB))
    val df = (crowd ++ pairDocs).toDF("doc_id", "text")
    val got = DedupOps
      .simhashPairs(df, "text", "doc_id", maxHamming = radius, maxBucketSize = 100)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(got.contains((1000L, 1001L)))
    // the 300-identical crowd (44850 pairs) must have been capped away
    assert(!got.exists(p => p._1 < 300L && p._2 < 300L))
  }

  test("winnowing fingerprints: shared substrings => shared fingerprints") {
    val a = "x" * 3 + "the quick brown fox jumps over the lazy dog" + "y" * 3
    val b = "z" * 9 + "the quick brown fox jumps over the lazy dog" + "w" * 5
    val fa = Winnow.fingerprints(a, 7, 8).toSet
    val fb = Winnow.fingerprints(b, 7, 8).toSet
    assert((fa & fb).nonEmpty) // guarantee: shared run >= w+k-1 shares a print
    val fc = Winnow.fingerprints("totally unrelated material 123456", 7, 8).toSet
    assert((fa & fc).isEmpty)
    // registered SQL surface
    val viaSql = docs
      .select(expr("graft_winnow(text, 7, 8)").as("fp"))
      .filter(size($"fp") > 0)
    assert(viaSql.count() == docs.count())
  }

  test("brute-force knn: top-1 is the vector itself, cosine descending") {
    val base = (0 until 50)
      .map(i => (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat)))
      .toDF("id", "vec")
    val queries = base
      .filter($"id" < 3)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val knn = SimilarityOps.knnBruteForce(queries, base, k = 5)
    val top1 = knn
      .filter($"rank" === 1)
      .select("qid", "id")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(top1 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    // scores non-increasing per query
    val rows = knn
      .orderBy($"qid", $"rank")
      .select("qid", "cos")
      .as[(Long, Double)]
      .collect()
    rows.groupBy(_._1).values.foreach { g =>
      val scores = g.map(_._2).toSeq
      assert(scores.zip(scores.drop(1)).forall { case (x, y) => x >= y - 1e-12 })
    }
  }

  test("LSH-bucketed knn achieves decent recall of brute force top-3") {
    val base = (0 until 300)
      .map { i =>
        val r = new scala.util.Random(i)
        (i.toLong, Array.fill(16)((r.nextDouble() * 2 - 1).toFloat))
      }
      .toDF("id", "vec")
    val queries = base
      .filter($"id" < 10)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val exact = SimilarityOps
      .knnBruteForce(queries, base, 3)
      .select("qid", "id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val approx = SimilarityOps
      .lshBucketKnn(queries, base, 3, bits = 6)
      .select("qid", "id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("IVF full-probe equals brute force; partial probe keeps good recall") {
    // clustered base so the coarse quantizer has real structure to learn
    val base = (0 until 400)
      .map { i =>
        val r = new scala.util.Random(i)
        val c = i % 8 // 8 planted clusters
        val center = Array.tabulate(16)(d => math.sin(c * 1.3 + d * 0.5))
        (i.toLong, center.map(x => (x + 0.15 * (r.nextDouble() * 2 - 1)).toFloat))
      }
      .toDF("id", "vec")
    val queries = base
      .filter($"id" < 12)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val cents =
      SimilarityOps.ivfTrainCentroids(base, nlist = 8, iters = 4, sampleSize = 256)
    assert(cents.length == 8 && cents.forall(_.length == 16))
    // training is deterministic: same inputs -> identical centroids
    val cents2 =
      SimilarityOps.ivfTrainCentroids(base, nlist = 8, iters = 4, sampleSize = 256)
    assert(
      cents.zip(cents2).forall { case (a, b) =>
        a.zip(b).forall { case (x, y) => x == y }
      }
    )
    val exact = SimilarityOps
      .knnBruteForce(queries, base, 5)
      .select("qid", "id", "rank")
      .as[(Long, Long, Int)]
      .collect()
      .toSet
    // nprobe == nlist probes every inverted list => EXACTLY brute force
    val full = SimilarityOps
      .ivfSearch(queries, base, cents, k = 5, nprobe = 8)
      .select("qid", "id", "rank")
      .as[(Long, Long, Int)]
      .collect()
      .toSet
    assert(full == exact, "full-probe IVF must reproduce brute force exactly")
    // nprobe = 2 of 8 scans ~1/4 of the base per query, recall stays high
    // on clustered data (the query's own cluster is always probed first)
    val partial = SimilarityOps
      .ivfSearch(queries, base, cents, k = 5, nprobe = 2)
      .select("qid", "id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall =
      (exact.map(t => (t._1, t._2)) & partial).size.toDouble / exact.size
    assert(recall >= 0.8, s"partial-probe recall $recall too low")
  }

  test("IVF persisted index: probe prunes partitions statically and matches in-plan search") {
    val base = (0 until 400)
      .map { i =>
        val r = new scala.util.Random(i)
        val c = i % 8
        val center = Array.tabulate(16)(d => math.sin(c * 1.3 + d * 0.5))
        (i.toLong, center.map(x => (x + 0.15 * (r.nextDouble() * 2 - 1)).toFloat))
      }
      .toDF("id", "vec")
    val queries = base
      .filter($"id" < 12)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val cents =
      SimilarityOps.ivfTrainCentroids(base, nlist = 8, iters = 4, sampleSize = 256)

    val idx = tmpDir("ivfidx")
    SimilarityOps.ivfBuildIndex(base, cents, idx)
    // base landed as one directory per inverted list
    import scala.jdk.CollectionConverters._
    val listDirs = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(idx))
    )(_.iterator().asScala.count(_.getFileName.toString.startsWith("list_id=")))
    assert(listDirs >= 2, s"expected partitioned layout, got $listDirs list dirs")

    // the probe is a LITERAL partition filter: unprobed list_id directories
    // are pruned at planning time (the 100 TB path — scan cost is
    // nprobe/nlist of the base no matter its size)
    val indexed =
      SimilarityOps.ivfSearchIndexed(queries, idx, cents, k = 5, nprobe = 2)
    val plan = indexed.queryExecution.executedPlan.toString
    assert(
      plan.contains("PartitionFilters: [") && plan.contains("list_id"),
      s"expected a static list_id PartitionFilter in:\n$plan"
    )

    def rset(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    // indexed search ≡ the in-plan operator at the same nprobe
    assert(
      rset(indexed) ==
        rset(SimilarityOps.ivfSearch(queries, base, cents, k = 5, nprobe = 2))
    )
    // full probe through the index is exactly brute force
    val exact = rset(SimilarityOps.knnBruteForce(queries, base, 5))
    assert(
      rset(SimilarityOps.ivfSearchIndexed(queries, idx, cents, k = 5, nprobe = 8))
        == exact
    )
    // the broadcast-UDF quantizer path (forced via literalMaxElems = 0, the
    // large-nlist regime where a centroid literal would blow up the plan)
    // is bit-identical to the literal path
    assert(
      rset(
        SimilarityOps
          .ivfSearch(queries, base, cents, k = 5, nprobe = 8, literalMaxElems = 0)
      ) == exact
    )
    val idxUdf = tmpDir("ivfidx-udf")
    SimilarityOps.ivfBuildIndex(base, cents, idxUdf, literalMaxElems = 0)
    assert(
      rset(
        SimilarityOps
          .ivfSearchIndexed(queries, idxUdf, cents, k = 5, nprobe = 2, literalMaxElems = 0)
      ) == rset(indexed)
    )
  }

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(a.toInt); val rb = find(b.toInt)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root-chasing after all unions; canonical label = min id of the set
    val byRoot = (0 until n).groupBy(find)
    byRoot.flatMap { case (_, ids) =>
      val m = ids.min.toLong
      ids.map(i => i.toLong -> m)
    }
  }

  test("connected components match union-find on a random pair graph") {
    val r = new scala.util.Random(11)
    val n = 300
    val es = (0 until 260)
      .map(_ => (r.nextInt(n).toLong, r.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val pairs = es.toDF("id_a", "id_b")
    val got = DedupOps
      .connectedComponents(pairs)
      .as[(Long, Long)]
      .collect()
      .toMap
    val expected = unionFind(n, es)
    val touched = es.flatMap(e => Seq(e._1, e._2)).toSet
    assert(got.keySet == touched)
    touched.foreach { id =>
      assert(got(id) == expected(id), s"node $id: got ${got(id)}, want ${expected(id)}")
    }
  }

  test("connected components converge on a long chain in O(log n) rounds") {
    // a 400-node chain has diameter 399: label propagation would need ~400
    // rounds; large-star/small-star must finish inside the default 25
    val es = (0L until 399L).map(i => (i, i + 1))
    val got = DedupOps
      .connectedComponents(es.toDF("id_a", "id_b"))
      .as[(Long, Long)]
      .collect()
    assert(got.length == 400)
    assert(got.forall(_._2 == 0L), "every chain node must label to the min id 0")
  }

  test("dedupByComponents keeps exactly one representative per cluster") {
    val docs = (0L until 20L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comps = DedupOps.connectedComponents(pairs)
    val kept = DedupOps
      .dedupByComponents(docs, comps, "doc_id")
      .select("doc_id")
      .as[Long]
      .collect()
      .toSet
    // clusters {1,2,3} -> keep 1, {7,9} -> keep 7; all singletons kept
    assert(kept == (0L until 20L).toSet -- Set(2L, 3L, 9L))
    // the id-column convention used elsewhere ("id") must not be ambiguous
    // against the components frame's own "id" column
    val docsId = docs.withColumnRenamed("doc_id", "id")
    val keptId = DedupOps
      .dedupByComponents(docsId, comps, "id")
      .select("id")
      .as[Long]
      .collect()
      .toSet
    assert(keptId == kept)
  }

  test("winnow pairs: shared passages collide, unrelated docs don't") {
    val passage = "the winnowing algorithm guarantees detection of shared runs"
    val docs = Seq(
      (1L, s"intro text then $passage and a closing remark"),
      (2L, s"different framing; $passage; unrelated tail 987"),
      (3L, "completely different material with no common passage at all")
    ).toDF("doc_id", "text")
    val pairs = DedupOps
      .winnowPairs(docs, "text", "doc_id", minShared = 2)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("PII redaction scrubs emails and phones, counts spans, leaves clean text intact") {
    val rows = Seq(
      (1L, "reach me at jane.doe+test@sub.example.org thanks"),
      (2L, "call +44-555-1234567 or +1-555-0100 now"),
      (3L, "email a@b.io and phone +1-555-9999 both"),
      (4L, "nothing sensitive here, just code: x = a @ b"),
      (5L, "almost: user@localhost is NOT an email, 12-34 not a phone"),
      (6L, "intl +44 20 7946 0958, paren (555) 123-4567, bare 555.123.4567"),
      (7L, "versions 1.2.3 and 10.20.30 stay; so does 'answer 42'")
    ).toDF("id", "text")
    val out = rows
      .select(
        $"id",
        TextOps.redactPii($"text").as("red"),
        TextOps.piiCount($"text").as("n")
      )
      .as[(Long, String, Long)]
      .collect()
      .map(t => t._1 -> ((t._2, t._3)))
      .toMap
    assert(out(1L) == (("reach me at <EMAIL> thanks", 1L)))
    assert(out(2L) == (("call <PHONE> or <PHONE> now", 2L)))
    assert(out(3L) == (("email <EMAIL> and phone <PHONE> both", 2L)))
    assert(out(4L) == (("nothing sensitive here, just code: x = a @ b", 0L)))
    // user@localhost has no dotted TLD; short digit runs are not phones
    assert(out(5L) == (("almost: user@localhost is NOT an email, 12-34 not a phone", 0L)))
    // broadened formats: general international, parenthesized area code,
    // bare dash/dot-separated triplets — each its own pattern, one count
    assert(out(6L) == (("intl <PHONE>, paren <PHONE>, bare <PHONE>", 3L)))
    // ordinary numeric prose survives the broadened patterns
    assert(out(7L) == (("versions 1.2.3 and 10.20.30 stay; so does 'answer 42'", 0L)))
  }

  test("repetition ratios: duplicate lines and 3-grams, short-doc floors") {
    val rows = Seq(
      // 4 lines, 2 distinct -> dup_line = 1 - 2/4 = 0.5
      (1L, "alpha beta\nalpha beta\ngamma delta\ngamma delta"),
      // no repetition at all
      (2L, "one two three four five six"),
      // looped phrase: "spam ham eggs" x4 -> 10 grams, 3 distinct
      (3L, (1 to 4).map(_ => "spam ham eggs").mkString(" ")),
      (4L, "tiny doc"), // < 3 words, < 2 lines -> both 0
      (5L, "")
    ).toDF("id", "text")
    val out = rows
      .select(
        $"id",
        TextOps.dupLineFracMicro($"text").as("dl"),
        TextOps.dupGram3FracMicro($"text").as("dg")
      )
      .as[(Long, Long, Long)]
      .collect()
      .map(t => t._1 -> ((t._2, t._3)))
      .toMap
    assert(out(1L)._1 == 500000L)
    assert(out(2L) == ((0L, 0L)))
    // 12 words -> 10 grams; distinct = {s h e, h e s, e s h} = 3
    assert(out(3L)._2 == 700000L, s"got ${out(3L)}")
    assert(out(4L) == ((0L, 0L)))
    assert(out(5L) == ((0L, 0L)))
  }

  test("Gopher quality gates: each signal and the combined pass bit") {
    val longOk = (1 to 60).map(i => s"word$i").mkString(" ")
    val rows = Seq(
      (1L, longOk), // passes everything
      (2L, "short doc only"), // < 50 words
      (3L, longOk + " " + (1 to 12).map(_ => "#").mkString(" ")), // symbol-heavy
      (4L, (1 to 60).map(i => s"- bullet$i").mkString("\n")) // all bullets
    ).toDF("id", "text")
    val out = rows
      .select(
        $"id",
        TextOps.meanWordLenMicro($"text").as("mw"),
        TextOps.symbolRatioMicro($"text").as("sy"),
        TextOps.bulletFracMicro($"text").as("bu"),
        TextOps.gopherPass($"text").as("p")
      )
      .as[(Long, Long, Long, Long, Boolean)]
      .collect()
      .map(t => t._1 -> t)
      .toMap
    assert(out(1L)._5, s"clean long doc must pass: ${out(1L)}")
    assert(!out(2L)._5, "under 50 words must fail")
    // 12 '#' over 72 words = 0.1667 > 0.1
    assert(out(3L)._2 > 100000L && !out(3L)._5)
    assert(out(4L)._4 == 1000000L && !out(4L)._5, s"got ${out(4L)}")
    // mean word length of 'word1'..'word60' ≈ 5.57 chars
    assert(out(1L)._2 > 5000000L && out(1L)._2 < 6000000L)
  }

  test("duplicated-span fraction: shared k-grams across docs, short-doc floor") {
    val shared = "0123456789" * 3 // 30 chars, planted in docs 1 and 2
    val rows = Seq(
      (1L, shared + "A" * 30), // 60 chars: positions 1..51, some covering `shared`
      (2L, "B" * 30 + shared), // same 30-char span at the other end
      (3L, "C" * 60), // 60 chars, nothing shared
      (4L, "tiny") // < k -> 0
    ).toDF("doc_id", "text")
    val out = DedupOps
      .dupSpanFracMicro(rows, "text", "doc_id", k = 10)
      .as[(Long, Long)]
      .collect()
      .toMap
    // doc 1: grams at positions 1..21 lie fully inside `shared`+prefix —
    // every gram fully within the shared 30 chars (positions 1..21) also
    // occurs in doc 2, so the fraction is strictly between 0 and 1
    assert(out(1L) > 0L && out(1L) < 1000000L, s"got ${out(1L)}")
    assert(out(2L) > 0L && out(2L) < 1000000L)
    assert(out(3L) == 0L, "unshared doc must score 0")
    assert(out(4L) == 0L, "doc shorter than k must score 0")
    // symmetric construction: both holders of the span see the same count
    // of shared positions (21 of 51) -> identical fractions
    assert(out(1L) == out(2L))
  }

  test("duplicated-span fraction: MOD-sampled valve still detects shared spans (alignment-free)") {
    // content-defined sampling: the duplicated span sits at DIFFERENT
    // offsets in its two holders, so positional striding would miss it,
    // but hash-mod selection picks identical grams in both copies. A long
    // span (hundreds of grams) is selected w.p. ~1 even at mod 4.
    val shared = (0 until 40).map(i => s"chunk$i-payload ").mkString // ~600 chars
    val rows = Seq(
      (1L, shared + ("A" * 120)),
      (2L, ("B" * 77) + shared), // different alignment
      (3L, "the quick brown fox jumps over the lazy dog " * 16) // unique-ish
    ).toDF("doc_id", "text")
    val sampled = DedupOps
      .dupSpanFracMicro(rows, "text", "doc_id", k = 50, sampleMod = 4)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(sampled(1L) > 500000L, s"got ${sampled(1L)}") // span dominates doc 1
    assert(sampled(2L) > 500000L, s"got ${sampled(2L)}")
    // doc 3 repeats its own sentence internally but shares nothing with
    // OTHER docs; the metric counts cross-document holders only
    assert(sampled(3L) == 0L, s"got ${sampled(3L)}")
    // the exact (mod=1) run agrees on the qualitative signal
    val exact = DedupOps
      .dupSpanFracMicro(rows, "text", "doc_id", k = 50)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(exact(1L) > 500000L && exact(2L) > 500000L && exact(3L) == 0L)
  }

  test("duplicated-span valve: sampleMod=8 shuffles <25% of exact-mode volume, detection intact") {
    // the valve's CLAIMED mechanism is the pre-shuffle filter at the gram
    // explode (DedupOps.dupSpanFracMicro) — measure it, don't trust the
    // plan shape: total shuffle records/bytes across the whole pipeline
    // must drop ~8x when only hash%8==0 grams survive the map side.
    val shared = (0 until 60).map(i => s"seg$i-body ").mkString
    val rows = (0L until 40L)
      .map(i =>
        if (i % 2 == 0) (i, shared + ("x" + i.toString) * 40)
        else (i, ("y" + i.toString) * 37 + shared)
      )
      .toDF("doc_id", "text")
      .localCheckpoint(true) // freeze the input: both runs shuffle-measure only the operator

    val recs = new java.util.concurrent.atomic.AtomicLong(0)
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd
      ): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      def measure(mod: Int): (Map[Long, Long], Long, Long) = {
        recs.set(0); bytes.set(0)
        val out = DedupOps
          .dupSpanFracMicro(rows, "text", "doc_id", k = 50, sampleMod = mod)
          .as[(Long, Long)]
          .collect()
          .toMap
        org.apache.spark.GraftListenerBusAccess.waitUntilEmpty(spark.sparkContext)
        (out, recs.get(), bytes.get())
      }
      val (exact, exactRecs, exactBytes) = measure(1)
      val (sampled, sampledRecs, sampledBytes) = measure(8)
      assert(exactRecs > 0 && sampledRecs > 0)
      assert(
        sampledRecs * 4 <= exactRecs,
        s"valve did not cut shuffle records: $sampledRecs vs $exactRecs"
      )
      assert(
        sampledBytes * 4 <= exactBytes,
        s"valve did not cut shuffle bytes: $sampledBytes vs $exactBytes"
      )
      // detection survives the sampling: every shared-span holder still
      // scores high, the exact run agrees
      (0L until 40L).foreach { i =>
        assert(sampled(i) > 300000L, s"doc $i lost its span: ${sampled(i)}")
        assert(exact(i) > 300000L)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("chunk plan: full coverage with overlap, short and empty edges") {
    val rows = Seq(
      (1L, (1 to 250).map(i => s"w$i").mkString(" ")), // 3 chunks
      (2L, (1 to 120).map(i => s"w$i").mkString(" ")), // exactly one window
      (3L, "a b c"), // shorter than a window -> one chunk
      (4L, "") // empty -> no chunks
    ).toDF("doc_id", "text")
    val got = TextOps
      .chunkPlan(rows, "text", "doc_id", chunkTokens = 120, stride = 90)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet
    assert(
      got == Set(
        (1L, 0, 0, 120, 3),
        (1L, 1, 90, 210, 3),
        (1L, 2, 180, 250, 3), // final chunk clipped at n, still reaches n
        (2L, 0, 0, 120, 1),
        (3L, 0, 0, 3, 1)
      ),
      s"got $got"
    )
    // coverage property on a sweep of lengths: every token of every doc
    // falls in at least one chunk, and the last chunk ends exactly at n
    val sweep = (1 to 40)
      .map(n => (n.toLong, (1 to n * 7).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextOps
      .chunkPlan(sweep, "text", "doc_id", chunkTokens = 50, stride = 35)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
      .groupBy(_._1)
    (1 to 40).foreach { d =>
      val n = d * 7
      val spans = chunks(d.toLong).map(c => (c._2, c._3)).sortBy(_._1)
      assert(spans.head._1 == 0 && spans.last._2 == n, s"doc $d: $spans")
      spans.sliding(2).foreach {
        case Array((_, e1), (b2, _)) =>
          assert(b2 <= e1, s"doc $d: gap between chunks")
        case _ => ()
      }
    }
  }

  test("sequence packing: distributed two-pass prefix sum equals the global cumsum") {
    val n = 500
    val docs = (0 until n)
      .map(i => (i.toLong, 1L + (i * 37 % 90)))
      .toDF("doc_id", "toks")
    // 7 range partitions: the per-partition cumsum + broadcast prefix path
    // must reproduce the single sequential scan exactly
    val packed = SampleOps
      .packSequences(docs, "doc_id", "toks", seqLen = 128L, numPartitions = 7)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(packed.size == n)
    var cum = 0L
    (0 until n).foreach { i =>
      val toks = 1L + (i * 37 % 90)
      val (t, seq, off) = packed(i.toLong)
      assert(t == toks)
      assert(seq == cum / 128, s"doc $i: seq $seq vs ${cum / 128}")
      assert(off == cum % 128, s"doc $i: off $off vs ${cum % 128}")
      cum += toks
    }
    // single-partition run agrees (partitioning cannot change the answer)
    val single = SampleOps
      .packSequences(docs, "doc_id", "toks", seqLen = 128L, numPartitions = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(single == packed)
  }

  test("mixture planner: budget-hitting fractions, caps, omissions, subset property") {
    val d = Seq(
      (1L, "en", 100L), (2L, "en", 300L), (3L, "en", 600L), // en total 1000
      (4L, "de", 50L), (5L, "de", 50L), // de total 100
      (6L, "fr", 10L) // no budget -> dropped
    ).toDF("doc_id", "lang", "toks")
    val fr = SampleOps.mixtureFractions(
      d, "lang", "toks",
      Map("en" -> 250L, "de" -> 1000000L, "zh" -> 5L)
    )
    assert(fr("en") == 0.25) // 250 / 1000
    assert(fr("de") == 1.0) // budget above total caps at 1
    assert(!fr.contains("zh"), "budgeted stratum with no rows is omitted")
    assert(!fr.contains("fr"), "stratum without a budget is omitted")

    // subset property survives the planner: growing a budget only ADDS docs
    val small = SampleOps
      .stratifiedHashSample(d, "doc_id", "lang", fr)
      .select("doc_id").as[Long].collect().toSet
    val grown = SampleOps.mixtureFractions(
      d, "lang", "toks", Map("en" -> 600L, "de" -> 1000000L))
    val big = SampleOps
      .stratifiedHashSample(d, "doc_id", "lang", grown)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big), s"$small not within $big")
  }

  test("decontamination flags exactly the docs sharing a 13-gram with the eval set") {
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, "totally unrelated material with no overlap at all 12345"),
      (2L, "he said the quick brown fox appeared"), // shares >=13 chars
      (3L, "quick brown"), // shares only sub-13-gram runs
      (4L, "xx the lazy dog barked xx") // shares ' the lazy dog' (13 chars)
    ).toDF("doc_id", "text")
    val flagged = DedupOps
      .contaminatedIds(train, evalDocs, "text", "doc_id", k = 13)
      .as[Long]
      .collect()
      .toSet
    assert(flagged == Set(2L, 4L), s"got $flagged")
  }

  test("hash sampling: deterministic, fraction-accurate, nested across fractions, salt-independent") {
    val ids = (0L until 20000L).toDF("id").withColumn("lang", lit("en"))
    val s30 = SampleOps.hashSample(ids, "id", 0.30).select("id").as[Long].collect().toSet
    val s30b = SampleOps.hashSample(ids, "id", 0.30).select("id").as[Long].collect().toSet
    assert(s30 == s30b, "same (fraction, salt) must give the identical sample")
    assert(math.abs(s30.size / 20000.0 - 0.30) < 0.02, s"fraction off: ${s30.size}")
    // growing the fraction keeps the smaller sample as a subset (split safety)
    val s50 = SampleOps.hashSample(ids, "id", 0.50).select("id").as[Long].collect().toSet
    assert(s30.subsetOf(s50))
    // different salts draw near-independent samples
    val other = SampleOps.hashSample(ids, "id", 0.30, salt = "eval").select("id").as[Long].collect().toSet
    val overlap = (s30 & other).size / 20000.0
    assert(math.abs(overlap - 0.09) < 0.02, s"salted overlap $overlap should be ~0.3*0.3")
    // stratified: unlisted strata drop, listed strata honor their fraction
    val mixed = (0L until 10000L)
      .map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val strat = SampleOps
      .stratifiedHashSample(mixed, "id", "lang", Map("en" -> 0.4))
      .select("id", "lang")
      .as[(Long, String)]
      .collect()
    assert(strat.forall(_._2 == "en"))
    assert(math.abs(strat.length / 5000.0 - 0.4) < 0.03)
    // empty weights = everything dropped (not an analysis error)
    assert(
      SampleOps.stratifiedHashSample(mixed, "id", "lang", Map.empty).count() == 0
    )
  }

  test("assignSplit: exhaustive labeling, fraction-accurate, rebalance-stable boundaries") {
    val ids = (0L until 20000L).toDF("id")
    def splitSets(fr: Seq[(String, Double)]): Map[String, Set[Long]] =
      SampleOps
        .assignSplit(ids, "id", fr)
        .select("id", "split")
        .as[(Long, String)]
        .collect()
        .groupBy(_._2)
        .map { case (k, v) => k -> v.map(_._1).toSet }
    val a = splitSets(Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
    assert(a.values.map(_.size).sum == 20000) // every row labeled exactly once
    assert(math.abs(a("train").size / 20000.0 - 0.5) < 0.02)
    assert(math.abs(a("test").size / 20000.0 - 0.25) < 0.02)

    // rebalance stability: growing train only moves the ADJACENT boundary —
    // old train rows stay train, and nothing ever crosses train<->test
    val b = splitSets(Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    assert(a("train").subsetOf(b("train")))
    assert(b("test").subsetOf(a("test")))
    assert((a("test") & b("train")).isEmpty, "a test row leaked into train")
  }

  test("embedding cosine near-dup pairs finds planted duplicates") {
    val r = new scala.util.Random(7)
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.fill(12)((r.nextDouble() * 2 - 1).toFloat))
    }
    // plant: 100 is a tiny perturbation of 0
    val planted = vecs :+ (100L, vecs.head._2.map(x => x + 0.001f))
    val df = planted.toDF("id", "vec")
    val pairs = SimilarityOps
      .cosineNearDupPairs(df, threshold = 0.999, bits = 6)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((0L, 100L)))
  }

  test("banded cosine near-dup recall is 1 vs brute force on planted clusters") {
    val r = new scala.util.Random(11)
    val baseVecs = (0 until 30).map { i =>
      (i.toLong, Array.fill(16)((r.nextDouble() * 2 - 1).toFloat))
    }
    // plant several perturbation clusters (cosine ~0.999)
    val planted = baseVecs ++ (0 until 10).map { i =>
      (1000L + i, baseVecs(i)._2.map(x => x + (r.nextDouble() * 0.002 - 0.001).toFloat))
    }
    val df = planted.toDF("id", "vec")
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val exact = (for {
      (ia, va) <- planted; (ib, vb) <- planted
      if ia < ib && cosine(va, vb) >= 0.99
    } yield (ia, ib)).toSet
    val got = SimilarityOps
      .cosineNearDupPairs(df, threshold = 0.99, bits = 6, bands = 12)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(exact.size >= 10)
    assert(got == exact, s"missing=${(exact -- got).take(5)} spurious=${(got -- exact).take(5)}")
  }

  test("text ops: token counts, language id, quality score") {
    val en = "the cat is on the mat and it is a good day for all of us"
    val de = "der hund ist nicht da und das ist ein gutes zeichen für sie"
    val row = Seq((en, de)).toDF("en", "de")
    val got = row
      .select(
        TextOps.tokenCount($"en").as("tc"),
        TextOps.langId($"en").as("len"),
        TextOps.langId($"de").as("lde"),
        TextOps.qualityScore($"en").as("q")
      )
      .as[(Int, String, String, Double)]
      .head()
    assert(got._1 == en.split("\\s+").length)
    assert(got._2 == "en")
    assert(got._3 == "de")
    assert(got._4 > 0.5 && got._4 <= 1.0)

    val code = Seq("int main() { return x[i] = {1}; } // {}();=").toDF("t")
    assert(code.select(TextOps.langId($"t")).as[String].head() == "code")
  }

  test("multimodal: batched feature extraction over synthetic blobs") {
    val ids = spark.range(0, 100).toDF("media_id")
    val blobs = MultiModalOps.syntheticBlobs(ids, "media_id", bytesPerBlob = 128)
    val feats = MultiModalOps.extractFeatures(spark, blobs, batchSize = 16)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.byte_len == 128))
    assert(rows.forall(f => f.width >= 64 && f.height >= 64))
    // deterministic: same input -> same features
    val again = MultiModalOps.extractFeatures(spark, blobs, batchSize = 7).collect()
    assert(rows.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
    // frame sampling plan fans out deterministically
    val plan = MultiModalOps.frameSamplePlan(blobs, framesPerDoc = 4)
    assert(plan.count() == 400)
  }

  test("multimodal: REAL PNG/WAV decode (pure-JDK codec) recovers planted parameters") {
    // realMediaBlobs encodes actual PNG (javax.imageio) and WAV
    // (javax.sound.sampled) bytes whose decoded features are pure id
    // arithmetic; JdkCodec must recover them exactly — including the
    // stereo WAV (id/2 odd) and the double-exact mean levels
    val ids = spark.range(0, 40).toDF("media_id")
    val blobs = MultiModalOps.realMediaBlobs(spark, ids, "media_id")
    val feats = MultiModalOps
      .extractFeatures(spark, blobs, MultiModalOps.JdkCodec)
      .collect()
      .map(f => f.media_id -> f)
      .toMap
    assert(feats.size == 40)
    (0L until 40L).foreach { id =>
      val f = feats(id)
      if (id % 2 == 0) {
        assert(f.mime == "image/png")
        assert(f.width == 8 + (id % 16).toInt, s"id=$id width=${f.width}")
        assert(f.height == 8 + ((id / 16) % 16).toInt)
        assert(f.channels == 3)
        assert(f.mean_luma == (id % 256).toDouble, s"id=$id luma=${f.mean_luma}")
      } else {
        assert(f.mime == "audio/wav")
        assert(f.width == 800 + (id % 5).toInt * 160, s"id=$id frames=${f.width}")
        assert(f.height == 8000)
        assert(f.channels == 1 + ((id / 2) % 2).toInt, s"id=$id ch=${f.channels}")
        assert(f.mean_luma == (id % 16384).toDouble / 32768.0)
      }
      // real encodings vary in size with content; they are not echoes
      assert(f.byte_len > 0)
    }
  }
}
