package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float|double>`):
  * exact brute-force cosine top-k as the baseline, and a multi-table
  * sign-LSH variant as the scale path for HIGH-similarity retrieval.
  *
  * Scale shape: both are single scans with a broadcast one-row probe and
  * a TakeOrderedAndProject top-k — no shuffle of the embedding table.
  * The LSH variant drops ~3/4 of the corpus before any cosine math; at
  * cluster scale (batch probes) the bucket ids become join keys so each
  * probe only meets its bucket-mates.
  */
object SimilaritySearch {

  /** Exact cosine top-k against the row whose `idCol` equals probeId. */
  def topKCosine(emb: DataFrame, idCol: String, vecCol: String,
                 probeId: Long, k: Int): DataFrame = {
    val probe = emb.filter(col(idCol) === probeId).select(col(vecCol).as("_probe"))
    emb.crossJoin(broadcast(probe))
      .filter(col(idCol) =!= probeId)
      .select(col(idCol), round(cosine(col(vecCol), col("_probe")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Approximate cosine top-k: `tables` independent sign-LSH tables of
    * `bits` hyperplanes each; a row is a candidate iff its bucket is
    * within Hamming `radius` of the probe's bucket in >= 1 table, then
    * survivors are reranked with the exact cosine. Multiple tables are
    * what controls recall variance: P(miss) ~ p_miss_one_table^tables.
    * Designed for high-similarity neighbors (cos >= ~0.9); for
    * weak-similarity top-k use `topKCosine` — no bucketing scheme can
    * prune and recall simultaneously at wide angles. */
  def topKCosineLsh(emb: DataFrame, idCol: String, vecCol: String,
                    probeId: Long, k: Int,
                    bits: Int = 8, radius: Int = 2, tables: Int = 2): DataFrame = {
    val bucketCols: Seq[(String, Column)] = (0 until tables).map { t =>
      s"_bk$t" -> signLshBucket(col(vecCol), signLshPlanes(bits, dimOf(emb, vecCol), seed = 42L + t))
    }
    val withB = bucketCols.foldLeft(emb) { case (d, (name, c)) => d.withColumn(name, c) }
    val probe = withB.filter(col(idCol) === probeId)
      .select((col(vecCol).as("_probe") +: bucketCols.map { case (n, _) => col(n).as(s"_p$n") }): _*)
    val anyClose = bucketCols.map { case (n, _) =>
      bit_count(col(n).bitwiseXOR(col(s"_p$n"))) <= radius
    }.reduce(_ || _)
    withB.crossJoin(broadcast(probe))
      .filter(col(idCol) =!= probeId)
      .filter(anyClose)
      .select(col(idCol), round(cosine(col(vecCol), col("_probe")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate PAIRS (the all-to-all version of
    * topKCosineLsh): bucket every vector in `tables` sign-LSH tables,
    * self-join on (table, bucket) — the 100 TB shape: vectors only meet
    * their bucket-mates, never the corpus — then exact-cosine rerank at
    * `threshold`. Emits (i, j, cos), i < j. Near-identical vectors
    * (cos ~ 1) agree on every hyperplane sign, so recall is ~1 in the
    * intended near-dup regime; precision is exactly 1 via the rerank.
    * 16 bits (not topKCosineLsh's 8): for PAIR generation the bucket
    * count must outrun |corpus|^2 — at 2^-16 random-collision odds per
    * table the candidate set stays ~linear in the planted dups instead
    * of quadratic in the corpus. */
  def nearDupPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
                      threshold: Double = 0.99,
                      bits: Int = 16, tables: Int = 2): DataFrame = {
    val dim = dimOf(emb, vecCol)
    val bucketed = (0 until tables).map { t =>
      emb.select(col(idCol).as("doc"),
        lit(t).as("tbl"),
        signLshBucket(col(vecCol), signLshPlanes(bits, dim, seed = 42L + t)).as("bk"))
    }.reduce(_ unionByName _)
    val cand = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bk") === col("b.bk") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("i"), col("b.doc").as("j"))
      .distinct()
    cand
      .join(emb.select(col(idCol).as("i"), col(vecCol).as("va")), "i")
      .join(emb.select(col(idCol).as("j"), col(vecCol).as("vb")), "j")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), round(col("cos"), 6).as("cos"))
  }

  /** [[nearDupPairsLsh]]'s contract at the HIERARCHICAL tier: candidate
    * pairs from the two-level quantizer's LEAVES (each vector meets
    * only its leaf-mates — the semanticDedupTwoLevel pair shape), exact
    * cosine filter at `threshold`, emitted as (i, j, cos), i < j.
    *
    * Same recall argument as the dedup face: near-identical vectors
    * (the cos >= ~0.99 regime this family targets) share their argmax
    * at BOTH quantizer levels (identical direction ⇒ identical nearest
    * cell and leaf), so every true near-dup pair is leaf-co-located at
    * any codebook; precision is exactly 1 via the in-join cosine
    * filter. Unlike the sign-LSH path, the candidate mass is bounded
    * by LEAF populations — which the TargetClusterSize invariant holds
    * constant as the corpus grows — and the pair rows stream through
    * the leaf-keyed join's iterator instead of being materialized and
    * re-joined to their vectors (see [[pairsWithAssignment]]). */
  def nearDupPairsTwoLevel(emb: DataFrame, idCol: String, vecCol: String,
                           threshold: Double = 0.99,
                           coarseK: Int = 16, subK: Int = 16): DataFrame = {
    // materialized once for the same reason as dedupWithAssignment's
    // checkpoint: `av` references the assignment on BOTH sides of the
    // pair self-join, and the leaf assignment is the expensive subtree.
    // withTwoLevelCells: the checkpoint derives from the TRAINING'S OWN
    // cached cell assignment instead of re-running the coarse scan.
    withTwoLevelCells(emb, idCol, vecCol, coarseK, subK) { (cb, cells) =>
      pairsWithAssignment(emb, idCol, vecCol,
        bestLeaf(cells, cb.leaves)
          .select(col("_vid").as(idCol), col("_leaf").as("cluster_id"))
          .localCheckpoint(true),
        threshold)
    }
  }

  /** EXACT sign-LSH candidate mass: Σ over (table, bucket) of
    * cnt·(cnt−1)/2 — precisely the pair rows the bucket self-join in
    * [[nearDupPairsLsh]] would materialize (before the i<j distinct,
    * which halves nothing across tables). One corpus scan + one tiny
    * aggregate (≤ tables·2^bits groups), so measuring the plan costs a
    * scan, not the plan. Returns (mass, n): the corpus count rides the
    * SAME histogram (Σ cnt over table 0), so routing — which needs n
    * only on the two-level branch, for [[twoLevelShape]] — costs
    * exactly one scan, never a second `count()` pass. */
  private[graft] def lshCandidateMass(emb: DataFrame, idCol: String,
      vecCol: String, bits: Int = 16, tables: Int = 2): (Long, Long) = {
    val dim = dimOf(emb, vecCol)
    val r = (0 until tables).map { t =>
      emb.select(lit(t).as("tbl"),
        signLshBucket(col(vecCol), signLshPlanes(bits, dim, seed = 42L + t)).as("bk"))
    }.reduce(_ unionByName _)
      .groupBy(col("tbl"), col("bk")).count()
      // integral end to end (Column `/` would go double); the doubled
      // sum cnt·(cnt−1) is even, so the driver-side halving is exact
      .agg(coalesce(sum(col("count") * (col("count") - 1)), lit(0L)),
        coalesce(sum(when(col("tbl") === 0, col("count"))), lit(0L)))
      .first()
    (r.getLong(0) / 2, r.getLong(1))
  }

  /** Candidate-row budget for the sign-LSH pair route: 2e7 keeps the
    * materialized candidate set (distinct + two vector re-joins) under
    * ~a minute of join work. Calibrated from PairScale: 4.5e7
    * candidates at 200k CLUSTERED vectors took 182 s — already 2× the
    * two-level arm's cost on 5× the data — while the random-bucket
    * regime at sf scales sits orders of magnitude below this line
    * (~2k vectors → ~130 random collisions). */
  val LshCandidateRowBudget: Long = 20000000L

  /** The route [[nearDupPairsAuto]] picks for a measured candidate
    * mass — a pure function so the dispatch rule is spec-pinnable. */
  private[graft] def pairSourceRoute(mass: Long,
      budget: Long = LshCandidateRowBudget): String =
    if (mass <= budget) "lsh" else "two-level"

  /** MEASURED-dispatch front door for embedding near-dup PAIR
    * generation: compute the EXACT candidate mass the sign-LSH route
    * would materialize ([[lshCandidateMass]]) and dispatch on it —
    * below [[LshCandidateRowBudget]] the banded sign-LSH path
    * ([[nearDupPairsLsh]]); above it the leaf-bounded two-level join
    * ([[nearDupPairsTwoLevel]]) at the [[deriveTwoLevel]] shape.
    *
    * Measured, not guessed, because a corpus COUNT cannot see
    * clustering: the fixed 16-bit buckets hold ~tables·N²/2^16 RANDOM
    * collisions (quadratic in the corpus — the count rule would catch
    * that), but on real (clustered) embedding corpora whole clusters
    * share sign patterns and buckets collapse far sooner — PairScale
    * measured the LSH route at 182 s on 200k clustered vectors, a
    * corpus the count rule waves through. The histogram dispatch
    * subsumes the count rule (random mass alone crosses the budget
    * near ~800k vectors) and catches the skew the count cannot.
    *
    * Why the LSH path cannot carry a large candidate mass: its
    * (i, j) rows are MATERIALIZED (distinct + two joins back to the
    * vectors), so the shuffle carries the pair mass itself; the leaf
    * join's shuffle carries only the corpus (N fat rows, linear),
    * with leaf populations pinned by TargetClusterSize — measured at
    * 1M clustered vectors in PairScale (SCALING.md r14 §1). Both
    * sources feed the same exact-cosine filter, so the emitted pair
    * set is identical in the near-dup regime (AnnSpec pins set
    * equality on the planted fixture at both tiers). */
  def nearDupPairsAuto(emb: DataFrame, idCol: String, vecCol: String,
                       threshold: Double = 0.99,
                       candidateBudget: Long = LshCandidateRowBudget,
                       bits: Int = 16, tables: Int = 2): DataFrame = {
    // bits/tables thread to BOTH the measurement and the lsh route, so
    // the measured plan is the executed plan by construction
    val (mass, n) = lshCandidateMass(emb, idCol, vecCol, bits, tables)
    pairSourceRoute(mass, candidateBudget) match {
      case "two-level" =>
        val (c, s) = twoLevelShape(n)
        System.err.println(s"[graft-ann] nearDupPairsAuto: TWO-LEVEL pair " +
          s"source coarseK=$c subK=$s (${c * s} leaves) — measured LSH " +
          s"candidate mass $mass > $candidateBudget for $n vectors")
        nearDupPairsTwoLevel(emb, idCol, vecCol, threshold, c, s)
      case _ =>
        System.err.println(s"[graft-ann] nearDupPairsAuto: sign-LSH pair " +
          s"source (measured candidate mass $mass within budget $candidateBudget)")
        nearDupPairsLsh(emb, idCol, vecCol, threshold, bits, tables)
    }
  }

  /** Batch ANN: a TABLE of probes against a corpus, joined on sign-LSH
    * bucket keys — the cluster-scale retrieval shape (each probe meets
    * only its bucket-mates; nothing is ever all-pairs). Recall comes
    * from two knobs: `tables` independent hash tables, and MULTIPROBE —
    * each probe also visits every bucket at Hamming distance 1 (its
    * `bits` one-bit flips), the standard trade of probe-side fan-out
    * (cheap, x(bits+1) on the small side) for corpus-side re-hashing.
    * At cos >= 0.95, bits=8, tables=2: per-table hit ~ 0.81, miss-all
    * ~ 0.04. Exact-cosine rerank + WindowGroupLimit top-k per probe.
    *
    * probes: (probeIdCol, vecCol); corpus: (idCol, vecCol). */
  def topKCosineLshBatch(probes: DataFrame, probeIdCol: String,
                         corpus: DataFrame, idCol: String, vecCol: String,
                         k: Int, bits: Int = 8, tables: Int = 2): DataFrame = {
    require(bits > 0 && bits <= 62, "topKCosineLshBatch: bits in [1, 62]")
    val dim = dimOf(corpus, vecCol)
    def planes(t: Int) = signLshPlanes(bits, dim, seed = 42L + t)
    val corpusB = (0 until tables).map { t =>
      corpus.select(col(idCol).as("_cid"), lit(t).as("_tbl"),
        signLshBucket(col(vecCol), planes(t)).as("_bk"))
    }.reduce(_ unionByName _)
    // probe side: own bucket + all `bits` one-bit flips (multiprobe)
    val flips = (c: Column) => array((lit(0L) +: (0 until bits).map(b => lit(1L << b))).map(m => c.bitwiseXOR(m)): _*)
    val probesB = (0 until tables).map { t =>
      probes.select(col(probeIdCol).as("_pid"), lit(t).as("_tbl"),
        explode(flips(signLshBucket(col(vecCol), planes(t)))).as("_bk"))
    }.reduce(_ unionByName _)
    val cand = probesB.join(corpusB, Seq("_tbl", "_bk"))
      .filter(col("_pid") =!= col("_cid"))
      .select(col("_pid"), col("_cid")).distinct()
    cand
      .join(probes.select(col(probeIdCol).as("_pid"), col(vecCol).as("_pv")), "_pid")
      .join(corpus.select(col(idCol).as("_cid"), col(vecCol).as("_cv")), "_cid")
      .select(col("_pid").as("probe_id"), col("_cid").as("id"),
        round(cosine(col("_cv"), col("_pv")), 6).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("id"))))
      .filter(col("rk") <= k)
  }

  /** IVF (inverted-file) batch ANN — the other classic scale path next
    * to LSH (ref: the brief's "IVF or LSH-bucketed variant"; public
    * design: Faiss IVFFlat). The coarse quantizer is a k-means
    * codebook: `nlist` hash-ordered seed vectors (smallest md5(id))
    * refined by [[LloydIters]] deterministic Lloyd rounds
    * ([[lloydCentroids]]) — every step 6-dp rounded with id tiebreaks,
    * so the whole index is reproducible across engines and the DuckDB
    * oracle rebuilds the identical iterations bit-for-bit.
    * Spherical assignment: every vector joins its argmax-
    * cosine centroid's inverted list (exactly one list per vector).
    * A probe searches only its `nprobe` best lists, then exact-cosine
    * rerank + per-probe top-k.
    *
    * Scale shape: centroids are tiny (nlist ~ sqrt(N)) -> broadcast to
    * the corpus scan for assignment (one pass, no corpus shuffle); the
    * probe side is small -> broadcast to the assigned corpus, so the
    * search is again one corpus-side scan filtered to ~nprobe/nlist of
    * the data. Nothing is ever all-pairs, and the corpus is never
    * range/hash-shuffled on the low-cardinality list key.
    *
    * Ranking uses ROUNDED cosines (6 dp) with id tiebreaks everywhere
    * so list assignment and top-k are deterministic and engine-portable.
    */
  def topKCosineIvf(probes: DataFrame, probeIdCol: String,
                    corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, nlist: Int = 16, nprobe: Int = 4,
                    centroids: Option[DataFrame] = None): DataFrame = {
    require(nprobe <= nlist, "topKCosineIvf: nprobe must be <= nlist")
    val d = dimOf(corpus, vecCol)
    guardFlatExplicit(corpus, nlist, "topKCosineIvf",
      fatAssignBytesPerRow(d))
    // training is deterministic, so a caller that also TUNES (the
    // ann_eval_tuned shape: autoNprobe + the tuned search) trains once
    // and passes the codebook to both — the round-15 ann_eval_twolevel
    // discipline at the flat tier
    val cents = centroids.getOrElse(
      lloydCentroids(corpus, idCol, vecCol, nlist, LloydIters, d))
    val assigned = bestLists(corpus, cents, idCol, vecCol, 1)
      .select(col("_mid").as("_cid"), col("_mv").as("_cv"), col("_list"))
    val probeLists = bestLists(probes, cents, probeIdCol, vecCol, nprobe)
      .select(col("_mid").as("_pid"), col("_mv").as("_pv"), col("_list"))
    assigned.join(broadcast(probeLists), "_list")
      .filter(col("_pid") =!= col("_cid"))
      .select(col("_pid").as("probe_id"), col("_cid").as("vec_id"),
        round(cosine(col("_cv"), col("_pv")), 6).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= k)
  }

  /** The flat IVF codebook on its own — the train-once face of
    * [[topKCosineIvf]] / [[autoNprobe]] (the public [[trainTwoLevel]]
    * contract at the flat tier): deterministic hash-seeded k-means,
    * [[LloydIters]] rounds, so a caller that tunes AND searches trains
    * once and passes the same codebook to both. */
  def trainIvf(corpus: DataFrame, idCol: String, vecCol: String,
               nlist: Int = 16): DataFrame =
    lloydCentroids(corpus, idCol, vecCol, nlist, LloydIters)

  /** Recall-targeted nprobe autotuning — the accept/reject knob a
    * pipeline turns before trusting an IVF index: the smallest nprobe
    * on the doubling ladder 1, 2, 4, ..., nlist whose MEAN recall@k
    * against the exact brute-force top-k reaches `targetRecall` on the
    * probe set. Returns (nprobe, the mean recall it achieved).
    *
    * Binary search is sound because recall@k is monotone
    * non-decreasing in nprobe: a larger nprobe searches a superset of
    * lists, and in the candidate-superset top-k a true top-k member
    * can only be displaced by something ranking ABOVE it in the
    * (rounded cos, id) order — which would itself be a true top-k
    * member. The ladder search therefore returns exactly the value a
    * linear scan would, in ~log2(nlist) evaluations; at nprobe=nlist
    * every list is searched and recall is 1.0, so the search always
    * terminates with the target met or the full scan reached.
    *
    * Cost shape: centroids train once, the corpus assigns once (the
    * assigned frame and the exact arm are persisted and reused by
    * every ladder evaluation); each evaluation re-ranks only the
    * candidate lists of a SAMPLE-sized probe set — production tunes on
    * a held-out probe sample, never the query stream. */
  def autoNprobe(probes: DataFrame, probeIdCol: String,
                 corpus: DataFrame, idCol: String, vecCol: String,
                 k: Int, nlist: Int = 16,
                 targetRecall: Double = 0.9,
                 centroids: Option[DataFrame] = None): (Int, Double) = {
    val (np, rec, _) = autoNprobeStats(probes, probeIdCol, corpus, idCol,
      vecCol, k, nlist, targetRecall, centroids, collectStats = false)
    (np, rec)
  }

  /** [[autoNprobe]] plus per-probe hit counts AT the tuned nprobe —
    * the flat-tier twin of [[autoNprobeTwoLevelStats]]: one extra
    * sample-sized job over the tuner's persisted assigned/exact frames
    * replaces the eval query's full re-derivation of both arms (a
    * second corpus-sized exact scan + a second IVF search per eval
    * run). Zero-filled, one row per probe; empty when `collectStats`
    * is false. */
  private[graft] def autoNprobeStats(
      probes: DataFrame, probeIdCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16,
      targetRecall: Double = 0.9,
      centroids: Option[DataFrame] = None,
      collectStats: Boolean = true): (Int, Double, Seq[(Long, Long)]) = {
    import org.apache.spark.storage.StorageLevel
    val d = dimOf(corpus, vecCol)
    guardFlatExplicit(corpus, nlist, "autoNprobe",
      fatAssignBytesPerRow(d))
    val cents = centroids.getOrElse(
      lloydCentroids(corpus, idCol, vecCol, nlist, LloydIters, d))
    val assigned = bestLists(corpus, cents, idCol, vecCol, 1)
      .select(col("_mid").as("_cid"), col("_mv").as("_cv"), col("_list"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pb = probes.select(col(probeIdCol).as("_pid0"), col(vecCol).as("_pv0"))
    // exact arm: brute-force top-k per probe (the ann_eval exact arm —
    // one corpus scan against broadcast probes, never shuffled)
    val we = Window.partitionBy(col("_pid")).orderBy(col("_ecos").desc, col("_cid"))
    val exact = corpus.select(col(idCol).as("_cid"), col(vecCol).as("_ev"))
      .crossJoin(broadcast(pb))
      .filter(col("_cid") =!= col("_pid0"))
      .select(col("_pid0").as("_pid"), col("_cid"),
        round(cosine(col("_ev"), col("_pv0")), 6).as("_ecos"))
      .withColumn("_erk", row_number().over(we))
      .filter(col("_erk") <= k)
      .select(col("_pid"), col("_cid"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nProbes = pb.count()
    require(nProbes > 0, "autoNprobe: empty probe set")
    def ivfAt(p: Int): DataFrame = {
      val probeLists = bestLists(pb, cents, "_pid0", "_pv0", p)
        .select(col("_mid").as("_pid"), col("_mv").as("_pv"), col("_list"))
      val wi = Window.partitionBy(col("_pid")).orderBy(col("_icos").desc, col("_cid"))
      assigned.join(broadcast(probeLists), "_list")
        .filter(col("_pid") =!= col("_cid"))
        .select(col("_pid"), col("_cid"),
          round(cosine(col("_cv"), col("_pv")), 6).as("_icos"))
        .withColumn("_irk", row_number().over(wi))
        .filter(col("_irk") <= k)
        .select(col("_pid"), col("_cid"))
    }
    def recallAt(p: Int): Double =
      exact.join(ivfAt(p), Seq("_pid", "_cid"), "left_semi").count()
        .toDouble / (k * nProbes)
    val ladder = (Iterator.iterate(1)(_ * 2).takeWhile(_ < nlist).toVector :+ nlist)
    // leftmost ladder value whose recall reaches the target
    val memo = scala.collection.mutable.Map.empty[Int, Double]
    def rec(i: Int): Double = memo.getOrElseUpdate(ladder(i), recallAt(ladder(i)))
    var (lo, hi) = (0, ladder.size - 1)
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (rec(mid) >= targetRecall) hi = mid else lo = mid + 1
    }
    val res = (ladder(lo), rec(lo))
    val stats = if (!collectStats) Seq.empty[(Long, Long)] else {
      val hits = exact.join(ivfAt(res._1), Seq("_pid", "_cid"), "left_semi")
        .groupBy(col("_pid")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      pb.select(col("_pid0")).collect().map(_.getLong(0)).toSeq.sorted
        .map(pid => (pid, hits.getOrElse(pid, 0L)))
    }
    assigned.unpersist(); exact.unpersist()
    (res._1, res._2, stats)
  }

  /** The (nprobeCells, nprobeLeaves) doubling ladder the two-level
    * autotuner walks: leaves double 1, 2, ..., coarseK·subK; the cell
    * fan-out tracks them at cells = min(coarseK, ceilPow2(2·leaves /
    * subK)) — enough cells that the leaf pick always has ~2× slack,
    * snapped to powers of two like every knob in the family. The
    * terminal step is (coarseK, coarseK·subK): every leaf searched,
    * recall 1.0, so a ladder walk always terminates with the target
    * met or the full scan reached. Deterministic and closed-form, so
    * the DuckDB oracle splices the same ladder as a VALUES table. */
  def twoLevelLadder(coarseK: Int, subK: Int): Seq[(Int, Int)] = {
    require(coarseK >= 1 && subK >= 1, "twoLevelLadder: coarseK, subK >= 1")
    def ceilPow2(x: Int): Int = { var p = 1; while (p < x) p *= 2; p }
    Iterator.iterate(1)(_ * 2).takeWhile(_ <= coarseK * subK).toVector
      .map(lv => (math.min(coarseK, math.max(1, ceilPow2(2 * lv / subK))), lv))
  }

  /** Recall-targeted autotune for the TWO-LEVEL tier — [[autoNprobe]]'s
    * contract above the flat codebook: the leftmost step of
    * [[twoLevelLadder]] whose MEAN recall@k against the exact
    * brute-force top-k reaches `targetRecall` on the probe set.
    * Returns ((nprobeCells, nprobeLeaves), the mean recall achieved).
    *
    * LINEAR ladder pick, not binary search: recall is NOT guaranteed
    * monotone across the joint ladder — widening the cell set can
    * re-rank WHICH leaves the probe visits (the top-nprobeLeaves among
    * more cells' leaves is not a superset of the pick among fewer), so
    * the flat tier's monotonicity argument does not carry over.
    *
    * ONE corpus pass for the WHOLE ladder (the round-14 walk re-ranked
    * leaves and re-joined the corpus per step — up to
    * log2(coarseK·subK)+1 corpus-keyed joins): every ladder step's leaf
    * pick is derived from the probe×leaf frame (sample-sized — ranked
    * once per step on the driver-safe small side), and the (probe,
    * corpus) cosine frame is scored ONCE and PERSISTED (it is exactly
    * the exact arm's frame, tagged with each corpus row's leaf). The
    * walk still early-stops step by step — each step's recall is a
    * broadcast leaf-pick join + top-k window over the PERSISTED frame
    * (an in-memory scan, no corpus re-join, no cosine recompute), so a
    * corpus that tunes at step 1 never pays the deep steps' ranking,
    * and a corpus that walks deep pays cosines exactly once. Same
    * answer as the round-14 walk by construction: each step's recall
    * is computed from the same rounded cosines, ranks and tie-breaks.
    *
    * For probe choice at scale, [[sampleProbes]] is the documented
    * default: a deterministic md5-ordered sample, so a 100 TB user
    * never hand-picks probe ids. */
  def autoNprobeTwoLevel(probes: DataFrame, probeIdCol: String,
                         corpus: DataFrame, idCol: String, vecCol: String,
                         k: Int, coarseK: Int, subK: Int,
                         targetRecall: Double = 0.9,
                         codebook: Option[TwoLevelCodebook] = None)
      : ((Int, Int), Double) = {
    val (knobs, rec, _) = autoNprobeTwoLevelStats(probes, probeIdCol,
      corpus, idCol, vecCol, k, coarseK, subK, targetRecall, codebook,
      collectStats = false)
    (knobs, rec)
  }

  /** [[autoNprobeTwoLevel]] plus the per-probe hit counts AT the tuned
    * step, computed from the SAME persisted frames the walk ranked (one
    * sample-sized job) and collected before the unpersists. The
    * recall-eval queries build their probe-level report from this
    * instead of re-deriving BOTH arms — the pre-r16 ann_eval_twolevel
    * plan recomputed the probes × corpus exact arm and the tuned search
    * from scratch after the tuner had just materialized the identical
    * frames (rounded cosines, ranks, tie-breaks all pinned equal by the
    * one-pass-ladder contract), which at production scale pays the
    * corpus-sized exact scan twice per eval run. Third element: one
    * (probe id, hits) row per probe, zero-filled — empty when
    * `collectStats` is false (the plain tuning path skips the job). */
  private[graft] def autoNprobeTwoLevelStats(
      probes: DataFrame, probeIdCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, coarseK: Int, subK: Int,
      targetRecall: Double = 0.9,
      codebook: Option[TwoLevelCodebook] = None,
      collectStats: Boolean = true)
      : ((Int, Int), Double, Seq[(Long, Long)]) = {
    import org.apache.spark.storage.StorageLevel
    val spark = corpus.sparkSession
    import spark.implicits._
    val corpusD = corpus.select(col(idCol).as("_cid"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("_cv"))
    val probeD = probes.select(col(probeIdCol).as("_pid"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("_pv"))
    val nProbes = probeD.count()
    require(nProbes > 0, "autoNprobeTwoLevel: empty probe set")
    // The one-pass ladder's ground truth is a probes × corpus cosine
    // frame persisted to MEMORY_AND_DISK — inherent to exact-recall
    // tuning, and the ONE corpus-sized materialization in the ANN
    // family, so it gets the same loud scratch refusal every other
    // corpus-sized spill surface has. Rows are known BEFORE anything
    // expensive runs (nProbes × n), so the refusal also precedes the
    // training a fresh-codebook caller would otherwise pay for nothing.
    refuseForScoredScratch(spark, nProbes, corpus.count())
    // training is deterministic, so a caller that also SEARCHES with
    // the tuned knobs trains once and passes the codebook to both
    // (the ann_eval_twolevel shape: tune + search share one training)
    val cb = codebook.getOrElse(
      trainTwoLevel(corpus, idCol, vecCol, coarseK, subK))
    require(cb.coarse.size <= coarseK && cb.leaves.size <= coarseK * subK,
      "autoNprobeTwoLevel: codebook shape exceeds (coarseK, subK)")
    val ladder = twoLevelLadder(coarseK, subK)
    // probe×leaf frame: EVERY leaf scored per probe, tagged with its
    // parent cell's rank — sample-sized (nProbes × coarseK·subK), so
    // ranking it once per ladder step costs nothing corpus-shaped
    val wc = Window.partitionBy(col("_pid")).orderBy(col("_ccos").desc, col("_ccell"))
    val probeLeafAll = probeD.crossJoin(broadcast(cb.coarse.toDF("_ccell", "_ccv")))
      .select(col("_pid"), col("_pv"), col("_ccell"),
        round(cosine(col("_pv"), col("_ccv")), 6).as("_ccos"))
      .withColumn("_crk", row_number().over(wc))
      .select(col("_pid"), col("_pv"), col("_ccell").as("_cell"), col("_crk"))
      .join(broadcast(cb.leaves.toDF("_cell", "_leaf", "_lv")), Seq("_cell"))
      .select(col("_pid"), col("_crk"), col("_leaf"),
        round(cosine(col("_pv"), col("_lv")), 6).as("_lcos"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the ONE corpus-side pass: every (probe, corpus row) cosine —
    // exactly the exact arm's frame — tagged with the row's leaf
    val scored = corpusD
      .join(assignLeaves(corpus, idCol, vecCol, cb)
        .select(col("_vid").as("_cid"), col("_leaf")), Seq("_cid"))
      .crossJoin(broadcast(probeD))
      .filter(col("_cid") =!= col("_pid"))
      .select(col("_pid"), col("_cid"), col("_leaf"),
        round(cosine(col("_cv"), col("_pv")), 6).as("_icos"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val we = Window.partitionBy(col("_pid")).orderBy(col("_icos").desc, col("_cid"))
    val exact = scored
      .withColumn("_erk", row_number().over(we)).filter(col("_erk") <= k)
      .select(col("_pid"), col("_cid"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wl = Window.partitionBy(col("_pid")).orderBy(col("_lcos").desc, col("_leaf"))
    val wi = Window.partitionBy(col("_pid")).orderBy(col("_icos").desc, col("_cid"))
    // the step's approximate top-k, from the persisted frames: leaf
    // pick ranked by leaf cosine WITHIN the step's cell prefix (the
    // walk's exact rule) — sample-sized, broadcast
    def ivfAt(cells: Int, leaves: Int): DataFrame = {
      val stepLeaves = probeLeafAll.filter(col("_crk") <= cells)
        .withColumn("_lrk", row_number().over(wl)).filter(col("_lrk") <= leaves)
        .select(col("_pid"), col("_leaf"))
      scored.join(broadcast(stepLeaves), Seq("_pid", "_leaf"))
        .withColumn("_irk", row_number().over(wi)).filter(col("_irk") <= k)
        .select(col("_pid"), col("_cid"))
    }
    def recallAt(cells: Int, leaves: Int): Double =
      exact.join(ivfAt(cells, leaves), Seq("_pid", "_cid"), "left_semi")
        .count().toDouble / (k * nProbes)
    var res: Option[((Int, Int), Double)] = None
    for ((cells, leaves) <- ladder if res.isEmpty) {
      val ts = System.nanoTime()
      val r = recallAt(cells, leaves)
      System.err.println(f"[graft-ann] autoNprobeTwoLevel: step " +
        f"($cells,$leaves) recall@$k=$r%.3f in ${(System.nanoTime() - ts) / 1e9}%.1f s")
      if (r >= targetRecall) res = Some(((cells, leaves), r))
    }
    val out = res.getOrElse {
      val (c, l) = ladder.last
      ((c, l), recallAt(c, l))
    }
    val stats = if (!collectStats) Seq.empty[(Long, Long)] else {
      val ((bc, bl), _) = out
      val hits = exact.join(ivfAt(bc, bl), Seq("_pid", "_cid"), "left_semi")
        .groupBy(col("_pid")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      probeD.select(col("_pid")).collect().map(_.getLong(0)).toSeq.sorted
        .map(pid => (pid, hits.getOrElse(pid, 0L)))
    }
    probeLeafAll.unpersist(); scored.unpersist(); exact.unpersist()
    (out._1, out._2, stats)
  }

  /** Deterministic probe sample for the recall autotuners: the `n`
    * corpus rows with the smallest md5(id) — the
    * [[Sampling.hashSample]] discipline as a fixed-size pick, executed
    * as a distributed top-n (TakeOrdered — no global sort, no shuffle
    * of the corpus), so a production caller never hand-selects probe
    * ids and two runs over the same corpus tune on the same probes.
    * Returns (idCol, vecCol). */
  def sampleProbes(corpus: DataFrame, idCol: String, vecCol: String,
                   n: Int = 64): DataFrame = {
    require(n >= 1, "sampleProbes: n >= 1")
    corpus.select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(n)
  }

  /** The deterministic IVF coarse quantizer on its own: every vector
    * labeled with its nearest k-means centroid (hash-seeded codebook
    * refined by [[LloydIters]] Lloyd rounds) — flat clustering for
    * corpus structure analysis (per-cluster profiles, mixture
    * balancing, shard assignment). Centroids broadcast; the corpus is
    * scanned once per round and never shuffled.
    * Returns (idCol, cluster_id, cent_cos). */
  def assignClusters(corpus: DataFrame, idCol: String, vecCol: String,
                     nlist: Int = 16): DataFrame = {
    guardFlatExplicit(corpus, nlist, "assignClusters")
    val cents = lloydCentroids(corpus, idCol, vecCol, nlist, LloydIters)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    withBestCent(corpus.select(col(idCol).as("_mid"), col(vecCol).as("_mv")),
        "_mid", "_mv", cents)
      .select(col("_mid").as(idCol), (-col("_best")("negid")).as("cluster_id"),
        col("_best")("c").as("cent_cos"))
  }

  /** Sentinel `nlist`: derive the knob from a corpus count
    * ([[deriveNlist]]) instead of taking it on faith — the semantic
    * family's front-door dispatch, mirroring the text-dedup family's
    * count-only cutoff analysis (Dedup.nearDupPairs). */
  val AutoNlist: Int = 0

  /** Target per-cluster population [[deriveNlist]] aims for. The pair
    * stage costs ~N·(N/nlist) cosines, so a fixed cluster size makes
    * per-VECTOR pair work constant as the corpus grows. 1024 puts the
    * 100× fixture (200k vectors) at nlist=256 — the measured flat
    * region of the SCALING.md nlist table (15.7 s where nlist=16
    * ground 184 s pair-bound and nlist=1024 paid 47.9 s of
    * assignment). */
  val TargetClusterSize: Long = 1024L

  /** Bound on the derived codebook: 4096 centroids × d doubles is the
    * largest broadcast table the one-level quantizer should carry
    * (past it, assignment cost N·nlist dominates — the next tier is a
    * hierarchical coarse quantizer, not a bigger flat one). */
  val MaxAutoNlist: Int = 4096

  /** The data-driven nlist: ≈ max(16, N / [[TargetClusterSize]]),
    * snapped UP to a power of two. Powers of two keep the knob coarse
    * and predictable across nearby corpus sizes, and every snapped
    * value lands on a measured [[withBestCent]] regime: ≤ 32 runs the
    * JIT-hot literal fold, > 32 the exploded broadcast-join
    * formulation (the dispatch that closed the nlist=64 JIT dead
    * zone — see [[ArgmaxFoldMaxCentroids]]). */
  def deriveNlist(n: Long,
                  targetClusterSize: Long = TargetClusterSize): Int = {
    require(targetClusterSize > 0, "deriveNlist: targetClusterSize must be > 0")
    val raw = math.max(16L, (n + targetClusterSize - 1) / targetClusterSize)
    var p = 16L
    while (p < raw && p < MaxAutoNlist) p *= 2
    p.toInt
  }

  /** Row-mass ceiling for the FLAT exploded assignment: the wide-
    * codebook formulation materializes N·nlist candidate rows through
    * a (sort-based — struct buffer) aggregate, and that row mass, not
    * the cosine flops, is what kills it: MEASURED at 1M×4096 the agg
    * wanted multi-hundred-GB of sort scratch and ENOSPC-killed the
    * JVM, while 2e8 rows (the 100× fixture at nlist=256) ran clean at
    * 19.8 s (SCALING.md rounds 12–13). 1e9 sits an order of magnitude
    * under the measured death with the measured-good regime well
    * inside it. */
  val FlatAssignRowBudget: Long = 1000000000L

  /** Bytes one SLIM exploded-assignment candidate row costs through
    * [[withBestCent]]'s sort aggregate: an (id, {cos, negid}) tuple —
    * ~24 B of sort payload. Calibrated against the round-13
    * measurements: the slim 2e8-row assignment (100× fixture, nlist
    * 256) ran clean at ~5 GB predicted, while 1M×4096 = 4.1e9 rows
    * predict ~92 GiB — correctly over any realistic local scratch
    * budget (the pre-slim FAT form of that arm measured ~2 TB and
    * ENOSPC-died, SCALING.md round 13). */
  val FlatAssignBytesPerSlimRow: Long = 24L

  /** Bytes one FAT candidate row costs through [[bestLists]]'s window
    * sort, where the d-dim double vector rides the rank: ~8·d payload
    * + ~48 B row overhead (d=64 → ~560 B, the regime the measured
    * ~2 TB / 4.1e9-row death calibrates). */
  def fatAssignBytesPerRow(d: Int): Long = 48L + 8L * d

  /** Loud fail-fast for the EXPLICIT-nlist flat assignment paths — the
    * Dedup.refuseForScratch pattern applied to the ANN family: the
    * exploded nearest-centroid formulation materializes N·nlist
    * candidate rows through a sort aggregate (or bestLists' window
    * sort), and when that mass cannot fit the scratch volume the JVM
    * dies at ENOSPC mid-sort. The AUTO front door is already guarded
    * by [[deriveTwoLevel]]/[[FlatAssignRowBudget]]; this guard covers
    * a caller who PINS nlist past the fold regime on a corpus the
    * flat plan cannot carry — measured: assignClusters(4096) at 1M
    * vectors (TwoLevelScale's dead arm). Budget = half of free
    * spark.local.dir, shared with the dedup family's guard (and its
    * test override). */
  private[graft] def refuseForAssignScratch(
      spark: org.apache.spark.sql.SparkSession,
      n: Long, nCents: Int, bytesPerRow: Long, tag: String): Unit = {
    val mass = n.toDouble * nCents
    val budget = Dedup.usableScratchBytes(spark) * Dedup.MaxScratchFraction
    if (mass > 0 && mass * bytesPerRow > budget) {
      val predicted = (mass * bytesPerRow / (1L << 30)).toLong
      throw new IllegalStateException(
        f"[graft-ann] $tag REFUSED: explicit nlist=$nCents on $n vectors " +
          f"materializes ~$mass%.3g candidate rows (~$predicted GiB at " +
          s"$bytesPerRow B/row) against a ~${(budget / (1L << 30)).toLong} GiB " +
          "scratch budget (half of free spark.local.dir). Running anyway " +
          "would ENOSPC-die mid-sort and can take the executor JVM with " +
          "it. Use the hierarchical tier — assignClustersTwoLevel / " +
          "semanticDedupTwoLevel with coarseK·subK >= nlist leaves " +
          "(assignment mass N·(coarseK+subK), flat at every measured " +
          "decade) — or the AutoNlist front door, which dispatches " +
          "itself past this cliff.")
    }
  }

  /** Bytes one row of [[autoNprobeTwoLevel]]'s persisted scored frame
    * costs on scratch: the frame is SLIM by construction — (pid, cid,
    * leaf, 6-dp cosine) projected before the persist — so the cost is
    * ~32 B of payload + row overhead through the disk store and the
    * exact arm's window sort over the same frame. 64 B carries the
    * same ~2× overestimate margin the dedup constants do. */
  val TwoLevelScoredBytesPerRow: Long = 64L

  /** Loud fail-fast for [[autoNprobeTwoLevel]]'s probes × corpus
    * ground-truth persist — the [[refuseForAssignScratch]] contract
    * with the remedy this surface actually has: fewer probes. At the
    * registered queries' 5 probes the frame is probe-bounded and
    * trivial; at [[sampleProbes]]' documented n=64 on a 10⁹-row corpus
    * it is a 6.4e10-row spill that every other path's guard would have
    * refused. */
  private[graft] def refuseForScoredScratch(
      spark: org.apache.spark.sql.SparkSession,
      nProbes: Long, nCorpus: Long): Unit = {
    val mass = nProbes.toDouble * nCorpus
    val budget = Dedup.usableScratchBytes(spark) * Dedup.MaxScratchFraction
    if (mass > 0 && mass * TwoLevelScoredBytesPerRow > budget) {
      val predicted = (mass * TwoLevelScoredBytesPerRow / (1L << 30)).toLong
      throw new IllegalStateException(
        f"[graft-ann] autoNprobeTwoLevel REFUSED: $nProbes probes × " +
          f"$nCorpus corpus rows materialize a ~$mass%.3g-row exact-recall " +
          f"frame (~$predicted GiB at $TwoLevelScoredBytesPerRow B/row) " +
          s"against a ~${(budget / (1L << 30)).toLong} GiB scratch budget " +
          "(half of free spark.local.dir). Running anyway would ENOSPC-die " +
          "mid-persist. Tune on FEWER probes — sampleProbes(n) with a " +
          "smaller n (recall estimates converge fast in the probe count) — " +
          "or free scratch space.")
    }
  }

  /** Count-and-guard front for the explicit-nlist entry points. Only
    * counts when the codebook is past [[ArgmaxFoldMaxCentroids]] — the
    * fold regime materializes no candidate rows at all, so the
    * registered small-nlist queries never pay the extra count scan. */
  private def guardFlatExplicit(corpus: DataFrame, nlist: Int, tag: String,
      bytesPerRow: Long = FlatAssignBytesPerSlimRow): Unit =
    if (nlist > ArgmaxFoldMaxCentroids)
      refuseForAssignScratch(corpus.sparkSession, corpus.count(), nlist,
        bytesPerRow, tag)

  /** The tier ABOVE the flat quantizer: dispatch to two-level and
    * return Some((coarseK, subK)) when EITHER (a) the corpus wants
    * more leaves than the flat codebook should carry (raw = N /
    * [[TargetClusterSize]] > [[MaxAutoNlist]], i.e. past ~4M vectors),
    * or (b) the flat assignment's candidate row mass N·deriveNlist(N)
    * exceeds [[FlatAssignRowBudget]] (past ~1M vectors at the default
    * target — the flat plan would sort-spill toward ENOSPC long before
    * the leaf count caps). coarseK·subK >= raw leaves at
    * N·(coarseK + subK) assignment row mass instead of the flat N·raw
    * (a flat 16384-leaf codebook costs 85x more per vector than
    * 128x128). coarseK is the largest power of two with coarseK² <=
    * raw, floored at 16 — best-effort for tiny raw: below raw = 256
    * the 16 floor exceeds √raw, which is unreachable from the current
    * dispatch thresholds (a Some() here implies raw ≳ 1000) but would
    * merely over-split the top level, not break correctness, if the
    * budget constants were ever lowered. subK is the smallest power of
    * two with coarseK·subK >= raw. Both land on measured
    * [[withBestCent]] JIT regimes like [[deriveNlist]]'s snapping.
    * Below both bounds: None (the flat path is the right plan — one
    * codebook, no second pass). */
  def deriveTwoLevel(n: Long,
                     targetClusterSize: Long = TargetClusterSize): Option[(Int, Int)] = {
    require(targetClusterSize > 0, "deriveTwoLevel: targetClusterSize must be > 0")
    val raw = math.max(16L, (n + targetClusterSize - 1) / targetClusterSize)
    val flatNlist = deriveNlist(n, targetClusterSize)
    val flatRows = n * flatNlist
    // the flat fold regime (nlist <= 32) never materializes candidate
    // rows at all — the budget only governs the exploded formulation
    if (raw <= MaxAutoNlist &&
        (flatNlist <= ArgmaxFoldMaxCentroids || flatRows <= FlatAssignRowBudget)) None
    else Some(twoLevelShape(n, targetClusterSize))
  }

  /** The (coarseK, subK) factorization [[deriveTwoLevel]]'s Some branch
    * uses, exposed on its own for callers whose DISPATCH rule is not
    * the count (the pair source dispatches on measured LSH candidate
    * mass — a skewed 200k corpus can need the tier long before the
    * count rule would fire). Same contract: both powers of two,
    * coarseK² <= raw (16 floor), coarseK·subK >= raw. */
  private[graft] def twoLevelShape(n: Long,
      targetClusterSize: Long = TargetClusterSize): (Int, Int) = {
    val raw = math.max(16L, (n + targetClusterSize - 1) / targetClusterSize)
    var c = 16L
    while (c * 2 * c * 2 <= raw) c *= 2
    var s = c
    while (c * s < raw) s *= 2
    (c.toInt, s.toInt)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster with the IVF coarse quantizer
    * ([[assignClusters]]), compare pairs ONLY within each cluster, and
    * mark the higher id of every pair at cosine >= `threshold` as
    * dropped. Returns one row per input vector:
    * (idCol, cluster_id, is_dropped).
    *
    * `nlist` is THE scale knob: the pair stage costs ~N²/nlist cosine
    * evaluations (each cluster is (N/nlist)-sized), so growing nlist
    * with the corpus keeps per-cluster populations — and per-vector
    * pair work — constant. The default is the [[AutoNlist]] front
    * door: one count pass derives nlist ≈ N/[[TargetClusterSize]]
    * ([[deriveNlist]]) so the knob turns itself — measured at the
    * 100× fixture (200k vectors, SemDedupScale tool): the derived
    * nlist=256 runs in the flat region where a fixed nlist=16 ground
    * 184 s pair-bound (SCALING.md table). Callers that must pin the
    * codebook (the oracle-replayed queries) pass nlist explicitly.
    * Exact twins land in the same cluster at ANY nlist (identical
    * direction ⇒ identical nearest centroid), so recall on true
    * duplicates does not depend on the knob. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int = AutoNlist, threshold: Double = 0.99): DataFrame = {
    if (nlist == AutoNlist) {
      // one count pass drives BOTH tiers: flat below MaxAutoNlist,
      // two-level above it (deriveTwoLevel) — the knob ladder turns
      // itself all the way up.
      val n = corpus.count()
      deriveTwoLevel(n) match {
        case Some((c, s)) =>
          System.err.println(s"[graft-ann] semanticDedup: auto TWO-LEVEL " +
            s"coarseK=$c subK=$s (${c * s} leaves) for $n vectors " +
            s"(~${n / math.max(c.toLong * s, 1L)} per leaf)")
          return semanticDedupTwoLevel(corpus, idCol, vecCol, c, s, threshold)
        case None =>
          val derived = deriveNlist(n)
          System.err.println(s"[graft-ann] semanticDedup: auto nlist=$derived " +
            s"for $n vectors (~${n / math.max(derived, 1)} per cluster)")
          val cents = lloydCentroids(corpus, idCol, vecCol, derived, LloydIters)
            .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
          return semanticDedupWithCents(corpus, idCol, vecCol, cents, threshold)
      }
    }
    guardFlatExplicit(corpus, nlist, "semanticDedup")
    val cents = lloydCentroids(corpus, idCol, vecCol, nlist, LloydIters)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    semanticDedupWithCents(corpus, idCol, vecCol, cents, threshold)
  }

  /** [[semanticDedup]]'s core against a GIVEN (frozen or just-trained)
    * codebook: assignment via [[withBestCent]], pairwise cosine within
    * each cluster, drop the higher id at cos >= threshold. */
  private def semanticDedupWithCents(corpus: DataFrame, idCol: String,
      vecCol: String, cents: Seq[(Long, Seq[Double])],
      threshold: Double): DataFrame =
    dedupWithAssignment(corpus, idCol, vecCol,
      withBestCent(
          corpus.select(col(idCol).as("_mid"), col(vecCol).as("_mv")),
          "_mid", "_mv", cents)
        .select(col("_mid").as(idCol), (-col("_best")("negid")).as("cluster_id")),
      threshold)

  /** The cluster-bounded PAIR stage both tiers share: pairwise cosine
    * WITHIN each assigned cluster, pairs at cos >= threshold emitted as
    * (i, j, cos), i < j. `assigned` = (idCol, cluster_id). The pair
    * rows are produced INSIDE the cluster-keyed join's output iterator
    * and filtered immediately — the shuffle mass is N fat rows (linear
    * in the corpus), never the pair mass, which is what lets this
    * shape carry a pair stage the candidate-materializing LSH path
    * cannot (see [[nearDupPairsAuto]]). */
  private def pairsWithAssignment(corpus: DataFrame, idCol: String,
      vecCol: String, assigned: DataFrame, threshold: Double): DataFrame = {
    val av = corpus.select(col(idCol), col(vecCol)).join(assigned, Seq(idCol))
    av.as("a")
      .join(av.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("_pcos", cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .filter(col("_pcos") >= threshold)
      .select(col(s"a.$idCol").as("i"), col(s"b.$idCol").as("j"),
        round(col("_pcos"), 6).as("cos"))
  }

  /** The dedup pair stage both tiers share: pairwise cosine WITHIN each
    * assigned cluster, drop the higher id at cos >= threshold.
    * `assigned` = (idCol, cluster_id). */
  private def dedupWithAssignment(corpus: DataFrame, idCol: String,
      vecCol: String, assigned: DataFrame, threshold: Double): DataFrame = {
    // The assignment is referenced THREE times below (both sides of the
    // pair self-join via `av`, plus the verdict join) — and for the
    // two-level tier each reference re-ran the whole leaf assignment
    // (broadcast leaf join + max-struct aggregate + payload re-join:
    // the r16 plan audit counted it three times in one
    // semantic_dedup_twolevel plan). Materialize the slim (id,
    // cluster_id) frame ONCE — N 16-byte rows, linear and far smaller
    // than the pair-stage shuffle that follows. localCheckpoint, not
    // persist: CacheManager matches canonicalized plans, so a persist
    // leaking into the RETURNED plan would let a second invocation
    // silently read the first's cache (the banned cross-run caching);
    // the eager checkpoint is invocation-scoped.
    val a = assigned.localCheckpoint(true)
    val dropped = pairsWithAssignment(corpus, idCol, vecCol, a, threshold)
      .select(col("j").as(idCol)).distinct()
      .withColumn("is_dropped", lit(true))
    a.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"),
        coalesce(col("is_dropped"), lit(false)).as("is_dropped"))
  }

  /** Two-level (hierarchical) coarse quantizer codebook: `coarse`
    * top-level cells plus per-cell sub-centroid `leaves` — (cell_id,
    * leaf_id, vec), leaf ids globally unique (they stay the seed
    * vector ids, like the flat codebook's). The tier above
    * [[MaxAutoNlist]] (public design: Faiss IVF's two-level / IMI
    * family): assignment costs N·(coarseK + subK) cosines instead of
    * the flat N·(coarseK·subK). */
  case class TwoLevelCodebook(coarse: Seq[(Long, Seq[Double])],
                              leaves: Seq[(Long, Long, Seq[Double])]) {
    def leafCount: Int = leaves.size
  }

  /** Train the two-level codebook: coarse k-means via
    * [[lloydCentroids]] (the identical discipline — hash seeds, 6-dp
    * re-anchoring, id tiebreaks), assign every vector to its coarse
    * cell ONCE (persisted), then train subK sub-centroids INSIDE each
    * cell — seeds are the subK smallest-md5 ids per cell
    * (WindowGroupLimit prunes the seed scan in-shuffle, so only
    * ~partitions·coarseK·subK rows ever cross the exchange), and each
    * sub-Lloyd round is ONE broadcast-join scan keyed on the cell (a
    * vector meets only its own cell's subK leaves) + one mergeable
    * moment aggregate per leaf. Only the coarseK·subK × d model
    * crosses the driver boundary between rounds.
    *
    * With coarseK = 1 this is EXACTLY the flat quantizer at nlist =
    * subK — one cell holds everything, the per-cell seed order is the
    * global md5 order, and the sub-Lloyd rounds are the flat Lloyd
    * rounds (AnnSpec pins the equivalence). Exact/scaled twins land in
    * the same cell AND the same leaf at any codebook (identical
    * direction ⇒ identical argmax at both levels), so dedup recall on
    * true duplicates does not depend on the tier. */
  def trainTwoLevel(corpus: DataFrame, idCol: String, vecCol: String,
                    coarseK: Int, subK: Int,
                    iters: Int = LloydIters): TwoLevelCodebook =
    withTwoLevelCells(corpus, idCol, vecCol, coarseK, subK, iters)((cb, _) => cb)

  /** Loan-pattern face of [[trainTwoLevel]] (round 17): training
    * materializes the coarse cell assignment (`cells`, persisted for
    * the sub-Lloyd rounds) and every dedup/pair caller immediately
    * needed that SAME assignment again — assignLeaves(corpus, cb)
    * re-ran the full coarse argmax scan the training had just
    * unpersisted. `f` runs while `cells` is still cached, so a caller
    * that derives (and checkpoints) its leaf assignment inside `f`
    * reads the cache instead of recomputing; the unpersist stays
    * in-call (invocation-scoped — no cross-run cache leak). Plans that
    * escape `f` lazily referencing `cells` stay CORRECT after the
    * unpersist (the logical subtree just recomputes), so the contract
    * change is purely a performance one. */
  private[graft] def withTwoLevelCells[T](corpus: DataFrame, idCol: String,
      vecCol: String, coarseK: Int, subK: Int, iters: Int = LloydIters)(
      f: (TwoLevelCodebook, DataFrame) => T): T = {
    import org.apache.spark.storage.StorageLevel
    require(coarseK >= 1 && subK >= 1, "trainTwoLevel: coarseK and subK must be >= 1")
    val d = dimOf(corpus, vecCol)
    val coarse: Seq[(Long, Seq[Double])] =
      lloydCentroids(corpus, idCol, vecCol, coarseK, iters, d)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val cells = cellAssign(corpus, idCol, vecCol, coarse)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // per-cell seeds: subK smallest md5(id) in each cell — the
      // hashCentroids sample, partitioned. rk <= subK is pruned by
      // WindowGroupLimit before the exchange.
      val wSeed = Window.partitionBy(col("_cell"))
        .orderBy(md5(col("_vid").cast("string")), col("_vid"))
      var leaves: Seq[(Long, Long, Seq[Double])] = cells
        .withColumn("_rk", row_number().over(wSeed))
        .filter(col("_rk") <= subK)
        .select(col("_cell"), col("_vid"), col("_vv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toVector)).toSeq
        .sortBy(l => (l._1, l._2))
      for (_ <- 1 to iters) {
        // moments need the vectors back: join the slim assignment to
        // the PERSISTED cell frame by id (a cache read, not a rescan)
        val sums = bestLeaf(cells, leaves)
          .select(col("_vid"), col("_leaf"))
          .join(cells.select(col("_vid"), col("_vv")), Seq("_vid"))
          .select(col("_leaf"), col("_vv"))
          .groupBy(col("_leaf"))
          .agg(org.apache.spark.sql.graft.GramianFunctions
            .vecSumAgg(col("_vv"), d).as("_s"))
          .select(col("_leaf"),
            expr(s"transform(slice(_s, 2, $d), x -> round(x / _s[0], 6))").as("_nv"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
        leaves = leaves.map { case (cell, lid, prev) =>
          (cell, lid, sums.getOrElse(lid, prev))
        }
      }
      f(TwoLevelCodebook(coarse, leaves), cells)
    } finally { cells.unpersist(); () }
  }

  /** (idCol -> _vid, double vec -> _vv, coarse cell -> _cell): the
    * one-pass coarse assignment both training and search share. */
  private def cellAssign(corpus: DataFrame, idCol: String, vecCol: String,
                         coarse: Seq[(Long, Seq[Double])]): DataFrame =
    withBestCent(
        corpus.select(col(idCol).as("_vid"),
          expr(s"transform($vecCol, x -> cast(x as double))").as("_vv")),
        "_vid", "_vv", coarse)
      .select(col("_vid"), col("_vv"), (-col("_best")("negid")).as("_cell"))

  /** Per-vector best leaf WITHIN its coarse cell: broadcast the leaf
    * table keyed by cell, join on the cell (each vector meets only its
    * own cell's <= subK leaves — never the full codebook), then
    * max(struct) per vector over SLIM (c, negid) rows — the vector
    * payload never rides the aggregate (the withBestCent lesson: a
    * d-dim payload in the max struct plans a sort aggregate over fat
    * rows and spills terabytes at scale; callers that need the vector
    * re-join it by id). Same contract as [[withBestCent]]: 6-dp
    * rounded cosine, smallest leaf id wins ties. Returns
    * (_vid, _leaf, _lcos). */
  private def bestLeaf(cells: DataFrame,
                       leaves: Seq[(Long, Long, Seq[Double])]): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val leafDf = broadcast(leaves.toDF("_cell", "_lcid", "_lcv"))
    cells.join(leafDf, "_cell")
      .select(col("_vid"),
        struct(round(cosine(col("_vv"), col("_lcv")), 6).as("c"),
          (-col("_lcid")).as("negid")).as("_sb"))
      .groupBy(col("_vid"))
      .agg(max(col("_sb")).as("_sbb"))
      .select(col("_vid"), (-col("_sbb")("negid")).as("_leaf"),
        col("_sbb")("c").as("_lcos"))
  }

  /** Flat-clustering face of the two-level quantizer (the
    * [[assignClusters]] contract at the hierarchical tier): every
    * vector labeled with its leaf cluster. Two broadcast-join scans —
    * coarse cell then within-cell leaf — and the corpus is never
    * shuffled on the cluster key. Returns (idCol, cluster_id,
    * cent_cos). */
  def assignClustersTwoLevel(corpus: DataFrame, idCol: String, vecCol: String,
                             coarseK: Int, subK: Int): DataFrame = {
    val cb = trainTwoLevel(corpus, idCol, vecCol, coarseK, subK)
    assignLeaves(corpus, idCol, vecCol, cb)
      .select(col("_vid").as(idCol), col("_leaf").as("cluster_id"),
        col("_lcos").as("cent_cos"))
  }

  /** Assignment against a FROZEN two-level codebook (no retraining). */
  def assignLeaves(corpus: DataFrame, idCol: String, vecCol: String,
                   cb: TwoLevelCodebook): DataFrame =
    bestLeaf(cellAssign(corpus, idCol, vecCol, cb.coarse), cb.leaves)

  /** IVF batch ANN at the hierarchical tier — the retrieval face of
    * the two-level quantizer ([[topKCosineIvf]]'s contract above the
    * flat codebook ceiling): corpus vectors live in LEAF inverted
    * lists; a probe ranks the coarse cells (cost coarseK), visits its
    * `nprobeCells` best, ranks THOSE cells' leaves (cost ≤
    * nprobeCells·subK), and searches its `nprobeLeaves` best lists —
    * so probe-side routing costs coarseK + nprobeCells·subK cosines
    * instead of the flat quantizer's full-codebook scan, mirroring
    * the corpus-side assignment win. Exact-cosine rerank + per-probe
    * top-k, every rank on (6-dp rounded cos, id) as in the flat IVF,
    * so the whole search is engine-portable and the DuckDB oracle
    * replays it end to end. */
  def topKCosineIvfTwoLevel(probes: DataFrame, probeIdCol: String,
                            corpus: DataFrame, idCol: String, vecCol: String,
                            k: Int, coarseK: Int = 4, subK: Int = 4,
                            nprobeCells: Int = 2,
                            nprobeLeaves: Int = 4,
                            codebook: Option[TwoLevelCodebook] = None): DataFrame = {
    require(nprobeCells <= coarseK, "topKCosineIvfTwoLevel: nprobeCells <= coarseK")
    val spark = corpus.sparkSession
    import spark.implicits._
    // deterministic training: a caller that already trained (the
    // autotune + search pair) passes the codebook and skips the rerun
    val cb = codebook.getOrElse(
      trainTwoLevel(corpus, idCol, vecCol, coarseK, subK))
    val assigned = assignLeaves(corpus, idCol, vecCol, cb)
      .select(col("_vid").as("_cid"), col("_leaf"))
    val probeD = probes.select(col(probeIdCol).as("_pid"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("_pv"))
    // probe -> top nprobeCells coarse cells
    val wc = Window.partitionBy(col("_pid")).orderBy(col("_ccos").desc, col("_ccell"))
    val probeCells = probeD.crossJoin(broadcast(cb.coarse.toDF("_ccell", "_ccv")))
      .select(col("_pid"), col("_pv"), col("_ccell"),
        round(cosine(col("_pv"), col("_ccv")), 6).as("_ccos"))
      .withColumn("_crk", row_number().over(wc)).filter(col("_crk") <= nprobeCells)
      .select(col("_pid"), col("_pv"), col("_ccell").as("_cell"))
    // -> top nprobeLeaves leaves among those cells' leaves
    val wl = Window.partitionBy(col("_pid")).orderBy(col("_lcos").desc, col("_leaf"))
    val probeLeaves = probeCells
      .join(broadcast(cb.leaves.toDF("_cell", "_leaf", "_lv")), Seq("_cell"))
      .select(col("_pid"), col("_pv"), col("_leaf"),
        round(cosine(col("_pv"), col("_lv")), 6).as("_lcos"))
      .withColumn("_lrk", row_number().over(wl)).filter(col("_lrk") <= nprobeLeaves)
      .select(col("_pid"), col("_pv"), col("_leaf"))
    // candidates = those leaves' inverted lists; exact rerank
    assigned.join(broadcast(probeLeaves), Seq("_leaf"))
      .filter(col("_pid") =!= col("_cid"))
      .join(corpus.select(col(idCol).as("_cid"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("_cv")), Seq("_cid"))
      .select(col("_pid").as("probe_id"), col("_cid").as("vec_id"),
        round(cosine(col("_cv"), col("_pv")), 6).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= k)
  }

  /** [[semanticDedup]] at the hierarchical tier: cluster with the
    * two-level quantizer, compare pairs ONLY within each LEAF, drop
    * the higher id at cos >= threshold. Pair work is leaf-bounded
    * (~N²/(coarseK·subK) cosines) while assignment stays
    * N·(coarseK + subK) — the shape that keeps BOTH stages flat as
    * the corpus grows past the flat quantizer's 4M-vector ceiling.
    * Same output contract as [[semanticDedup]]: (idCol, cluster_id,
    * is_dropped); with coarseK = 1 the result is row-identical to the
    * flat path at nlist = subK. */
  def semanticDedupTwoLevel(corpus: DataFrame, idCol: String, vecCol: String,
                            coarseK: Int, subK: Int,
                            threshold: Double = 0.99): DataFrame = {
    // dedupWithAssignment checkpoints the assignment eagerly, so inside
    // the loan it reads the training's cached cells instead of re-running
    // the coarse assignment scan (round 17)
    withTwoLevelCells(corpus, idCol, vecCol, coarseK, subK) { (cb, cells) =>
      dedupWithAssignment(corpus, idCol, vecCol,
        bestLeaf(cells, cb.leaves)
          .select(col("_vid").as(idCol), col("_leaf").as("cluster_id")),
        threshold)
    }
  }

  /** Frozen semantic-dedup index: the trained centroid codebook plus
    * the KEPT (deduplicated) corpus vectors labeled with their
    * clusters — the signature-store contract for embeddings. Build
    * once per corpus; increments then dedup against the store
    * ([[semanticDedupAgainstIndex]]) without retraining centroids or
    * rescanning anything but the matching clusters. */
  case class SemanticIndex(cents: Seq[(Long, Seq[Double])], kept: DataFrame,
                           builtN: Long = -1L,
                           twoLevel: Option[TwoLevelCodebook] = None,
                           // the kept layout's OWN bucket count: read
                           // from the store meta, defaulted for
                           // in-memory indexes; every group filter on
                           // this index must use it, never the constant
                           groups: Int = SemanticStoreGroups)

  /** Train centroids on the corpus, drop its internal near-dups, and
    * freeze (codebook, kept vectors) as the [[SemanticIndex]]. The
    * default nlist is the [[AutoNlist]] front door, so a store frozen
    * from a 100× corpus gets a 100×-appropriate codebook without
    * anyone remembering to turn the knob — and past the flat
    * quantizer's ceiling ([[deriveTwoLevel]]) the frozen codebook is
    * the TWO-LEVEL one, so a billion-vector store never grinds its
    * build on a flat 4096-leaf assignment; `builtN` records the corpus
    * size the codebook was trained at, the staleness denominator
    * downstream consumers (semanticDedupSink) check against. */
  def buildSemanticIndex(corpus: DataFrame, idCol: String, vecCol: String,
                         nlist: Int = AutoNlist, threshold: Double = 0.99): SemanticIndex = {
    val n = corpus.count()
    if (nlist == AutoNlist) {
      deriveTwoLevel(n) match {
        case Some((c, s)) =>
          System.err.println(s"[graft-ann] buildSemanticIndex: auto TWO-LEVEL " +
            s"coarseK=$c subK=$s (${c * s} leaves) for $n vectors")
          return buildSemanticIndexTwoLevel(corpus, idCol, vecCol, c, s, threshold, n)
        case None => ()
      }
    }
    val eff = if (nlist != AutoNlist) nlist else {
      val derived = deriveNlist(n)
      System.err.println(s"[graft-ann] buildSemanticIndex: auto nlist=$derived " +
        s"for $n vectors (~${n / math.max(derived, 1)} per cluster)")
      derived
    }
    // guard the EXPLICIT pin only: the auto path is already bounded by
    // deriveTwoLevel's FlatAssignRowBudget dispatch (and must keep
    // dispatching itself, never throwing)
    if (nlist != AutoNlist && nlist > ArgmaxFoldMaxCentroids)
      refuseForAssignScratch(corpus.sparkSession, n, nlist,
        FlatAssignBytesPerSlimRow, "buildSemanticIndex")
    val cents = lloydCentroids(corpus, idCol, vecCol, eff, LloydIters)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val kept = semanticDedupWithCents(corpus, idCol, vecCol, cents, threshold)
      .filter(!col("is_dropped"))
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), col("cluster_id"), col(vecCol))
    SemanticIndex(cents, kept, builtN = n)
  }

  /** The frozen store at the hierarchical tier (forced shape —
    * [[buildSemanticIndex]]'s AutoNlist dispatches here past the flat
    * ceiling): `cents` holds the LEAVES (leaf_id, vec) so consumers
    * reading the codebook see the same contract, and `twoLevel`
    * carries the full structure increments are assigned with. At
    * coarseK = 1 the frozen store is row-identical to the flat one at
    * nlist = subK (AnnSpec pins it). */
  def buildSemanticIndexTwoLevel(corpus: DataFrame, idCol: String, vecCol: String,
                                 coarseK: Int, subK: Int,
                                 threshold: Double = 0.99,
                                 knownN: Long = -1L): SemanticIndex = {
    val n = if (knownN >= 0) knownN else corpus.count()
    val (cb, kept) = withTwoLevelCells(corpus, idCol, vecCol, coarseK, subK) {
      (cb, cells) =>
        (cb, dedupWithAssignment(corpus, idCol, vecCol,
            bestLeaf(cells, cb.leaves)
              .select(col("_vid").as(idCol), col("_leaf").as("cluster_id")),
            threshold)
          .filter(!col("is_dropped"))
          .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
          .select(col(idCol), col("cluster_id"), col(vecCol)))
    }
    SemanticIndex(cb.leaves.map(l => (l._2, l._3)), kept, builtN = n,
      twoLevel = Some(cb))
  }

  /** Persist a [[SemanticIndex]] (the writePqIndex discipline): kept
    * vectors PARTITIONED BY cluster group ([[clusterGroup]] — the
    * layout that lets an increment-driven comparison read
    * partition-prune the store to the clusters it can possibly match),
    * the codebook as (cent_id, cv) rows, the two-level structure —
    * when present — as its own (cell, leaf_id, cv) table, and a
    * one-row meta table carrying builtN. This is what makes the
    * streaming [[graft.streaming.StreamOps.semanticDedupSink]]
    * RESTARTABLE without retraining: a restarted driver reads the
    * frozen store instead of re-running Lloyd on the corpus (whose
    * verdicts a retrain could silently change). */
  def writeSemanticIndex(index: SemanticIndex, dir: String): Unit = {
    val spark = index.kept.sparkSession
    import spark.implicits._
    // group count derived from the STORE SIZE at write time (builtN
    // bounds the kept count from above and is already known — no
    // re-execution of the kept computation to count it); recorded in
    // the meta table so readers prune with the layout's own count
    val d = index.cents.headOption.map(_._2.size).getOrElse(0)
    val grps = deriveStoreGroups(index.builtN, d)
    index.kept
      .withColumn("cluster_grp", clusterGroup(col("cluster_id"), grps))
      // co-locate each group before the partitioned write: ONE file
      // per group directory instead of (write tasks × groups) shards;
      // then ORDER each group file by cluster_id, so parquet row-group
      // min/max stats sub-prune a narrow increment's cluster_id IN
      // filter below group granularity (the round-15 46-of-64-groups
      // finding: group pruning alone is coarse for weakly-clustered
      // traffic).
      .repartition(grps, col("cluster_grp"))
      .sortWithinPartitions(col("cluster_grp"), col("cluster_id"))
      .write.partitionBy("cluster_grp")
      .mode("overwrite").parquet(s"$dir/kept")
    index.cents.toDF("cent_id", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/cents")
    index.twoLevel.foreach { cb =>
      cb.coarse.toDF("cent_id", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/coarse")
      cb.leaves.toDF("cell", "leaf_id", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/leaves")
    }
    Seq((index.builtN, index.twoLevel.nonEmpty, grps))
      .toDF("built_n", "two_level", "groups")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a persisted [[SemanticIndex]]. Codebooks come back sorted by
    * id (argmax ties break on the id itself, so Seq order never
    * affects verdicts); `kept` stays a lazy parquet read — at
    * production scale the kept store is corpus-sized and must never
    * transit the driver. The `cluster_grp` partition column rides
    * along so downstream group filters ([[pruneKeptToGroups]])
    * partition-prune the scan; consumers that join the store select
    * their columns explicitly, so the extra column is inert. Stores
    * written before the partitioned layout read fine — the pruner
    * falls back to computing the group. */
  def readSemanticIndex(spark: org.apache.spark.sql.SparkSession,
                        dir: String): SemanticIndex = {
    val metaDf = spark.read.parquet(s"$dir/meta")
    val meta = metaDf.collect().head
    val (builtN, isTwoLevel) = (meta.getLong(0), meta.getBoolean(1))
    // stores written before the size-derived layout carry no `groups`
    // column; they were all bucketed at the 64 constant, so that IS
    // their layout's count
    val grps =
      if (metaDf.columns.contains("groups"))
        meta.getInt(meta.fieldIndex("groups"))
      else SemanticStoreGroups
    def codebook(path: String): Seq[(Long, Seq[Double])] =
      spark.read.parquet(path).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toVector: Seq[Double]))
        .sortBy(_._1).toSeq
    val two = if (!isTwoLevel) None else Some(TwoLevelCodebook(
      codebook(s"$dir/coarse"),
      spark.read.parquet(s"$dir/leaves").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Double](2).toVector: Seq[Double]))
        .sortBy(l => (l._1, l._2)).toSeq))
    SemanticIndex(codebook(s"$dir/cents"),
      spark.read.parquet(s"$dir/kept"), builtN, two, groups = grps)
  }

  /** Cluster GROUPS the persisted kept store is bucketed into
    * ([[writeSemanticIndex]] partitions `kept` by
    * `cluster_grp = pmod(hash(cluster_id), SemanticStoreGroups)`).
    * A group, not raw cluster_id, because a scale-sized codebook has
    * thousands of leaves — one directory per leaf shatters the store
    * into tiny files, while 64 groups keep shards size-targeted AND
    * give an increment-driven read everything it needs: the comparison
    * join only ever matches an increment's own clusters, so filtering
    * the scan to the increment's GROUPS (a superset of its clusters)
    * changes nothing and partition-prunes the store read. */
  val SemanticStoreGroups: Int = 64

  /** Group-count ceiling for [[deriveStoreGroups]]: one directory per
    * group, so the knob is also a file-count knob — 4096 keeps a
    * pathological store from shattering into tens of thousands of
    * directories while still giving a ~280 GB kept store (10⁹ rows at
    * d=64) ~68 MiB files. */
  val MaxSemanticStoreGroups: Int = 4096

  /** Per-file size target the group count derives toward: groups
    * double until the estimated store bytes per group fall under this.
    * 128 MiB matches the session's scan split size, so one group file
    * is one scan task. */
  val TargetStoreFileBytes: Long = 128L << 20

  /** Derive the kept-store group count from the store's size instead
    * of pinning the 64 constant (round-15 finding: 64 is right at 1M
    * vectors and silently wrong past it — group pruning coarsens and
    * per-file size grows unbounded). Estimated bytes/row = 4·d (float
    * vector) + 24 (id, cluster_id, overhead); groups = the smallest
    * power of two ≥ [[SemanticStoreGroups]] that lands files under
    * [[TargetStoreFileBytes]], capped at [[MaxSemanticStoreGroups]].
    * Small stores (every fixture) derive exactly the old 64, so
    * existing layouts and oracle contracts are untouched. The WRITER
    * derives; READERS take the count from the store's meta table —
    * never this function — so bumping the constants can never
    * mis-prune a store written before the bump. */
  def deriveStoreGroups(nRows: Long, d: Int): Int = {
    if (nRows <= 0 || d <= 0) SemanticStoreGroups
    else {
      val bytes = nRows * (4L * d + 24L)
      var g = SemanticStoreGroups.toLong
      while (g < MaxSemanticStoreGroups && bytes / g > TargetStoreFileBytes)
        g *= 2
      g.toInt
    }
  }

  /** The store's bucketing rule — one definition, used by the writer,
    * the pruner, and the streaming sink's shard layout. `groups` MUST
    * be the layout's own count (an index's `groups` field / the meta
    * table), not the constant, or the filter prunes wrong buckets. */
  def clusterGroup(clusterId: Column, groups: Int): Column =
    pmod(hash(clusterId), lit(groups))

  /** [[clusterGroup]] at the default layout (in-memory indexes, tools). */
  def clusterGroup(clusterId: Column): Column =
    clusterGroup(clusterId, SemanticStoreGroups)

  /** Byte budget for broadcasting the INCREMENT side of the store
    * comparison join: under it, the kept store — the big side — is
    * never shuffled (broadcast-hash, store streams through in place);
    * over it, the join falls back to the shuffle plan. 128 MiB keeps
    * the broadcast well under executor/driver headroom at any
    * realistic dimensionality (~240k rows at d=64 via
    * [[fatAssignBytesPerRow]]). */
  val BroadcastIncByteBudget: Long = 128L << 20

  /** Prune a kept store to the cluster groups an increment touches.
    * Persisted stores carry the `cluster_grp` partition column — the
    * filter partition-prunes the parquet scan (and pushes through the
    * streaming sink's store∪shards union into every scan). In-memory
    * stores fall back to computing the group per row: no pruned I/O,
    * but the comparison join's input still shrinks to the touched
    * groups. */
  private[graft] def pruneKeptToGroups(kept: DataFrame,
                                       groups: Seq[Int],
                                       layoutGroups: Int = SemanticStoreGroups): DataFrame =
    if (kept.columns.contains("cluster_grp"))
      kept.filter(col("cluster_grp").isin(groups: _*))
    else kept.filter(clusterGroup(col("cluster_id"), layoutGroups).isin(groups: _*))

  /** The frozen-codebook assignment [[semanticDedupAgainstIndex]] keys
    * its joins with, exposed so callers (the streaming sink, store
    * tools) can reuse the exact rule: two-level stores route the
    * increment through coarse cell + leaf, flat stores through the
    * flat argmax — never retrained. Returns (idCol, cluster_id). */
  def assignWithIndex(inc: DataFrame, idCol: String, vecCol: String,
                      index: SemanticIndex): DataFrame = index.twoLevel match {
    case Some(cb) =>
      assignLeaves(inc, idCol, vecCol, cb)
        .select(col("_vid").as(idCol), col("_leaf").as("cluster_id"))
    case None =>
      withBestCent(
          inc.select(col(idCol).as("_mid"), col(vecCol).as("_mv")),
          "_mid", "_mv", index.cents)
        .select(col("_mid").as(idCol), (-col("_best")("negid")).as("cluster_id"))
  }

  /** Incremental semantic dedup against a FROZEN index: assign each
    * increment vector with the stored centroids (never retrained — the
    * encodePq discipline, so verdicts are stable as the store grows),
    * then drop it if it matches a stored kept vector in its cluster at
    * cos >= threshold, or a LOWER-id increment member (the batch drop
    * rule applied intra-increment). Work is increment-sized — enforced
    * by plan shape, not hope: one increment-sized aggregate measures
    * the increment's cluster-group footprint and row count, the store
    * read is pruned to those groups ([[pruneKeptToGroups]] —
    * partition-pruned on persisted stores), and when the increment
    * fits [[BroadcastIncByteBudget]] it is BROADCAST into both
    * comparison joins, so the store is never shuffled (it streams
    * through a broadcast-hash join in place). Verdicts are identical
    * on every route: pruned-away groups cannot match (the join keys on
    * cluster_id), and broadcast changes the plan, not the pairs.
    * Returns (idCol, cluster_id, is_dropped). */
  def semanticDedupAgainstIndex(inc: DataFrame, idCol: String, vecCol: String,
                                index: SemanticIndex,
                                threshold: Double = 0.99): DataFrame = {
    // Materialize the increment assignment ONCE (slim id → cluster
    // rows, increment-sized): the r16 plan audit counted the pre-change
    // plan re-deriving it per reference — the footprint collect, both
    // sides of the intra-increment self-join, the vs-store join and the
    // verdict join each re-ran the assignment over the increment union
    // (34 parquet scans in one semantic_dedup_store plan). Checkpoint
    // before the footprint collect so even that first job reads the
    // materialized frame. localCheckpoint, not persist — see
    // dedupWithAssignment's note on the CacheManager cross-invocation
    // leak.
    val assigned = assignWithIndex(inc, idCol, vecCol, index).localCheckpoint(true)
    // one increment-sized pass: CLUSTER footprint (and the group
    // footprint it implies) and row count — the broadcast dispatch
    // measures, never guesses. Collect is driver-safe by construction:
    // distinct clusters ≤ the codebook size, and the codebook
    // (index.cents) is already a driver-resident Seq.
    val gc = assigned.groupBy(col("cluster_id"),
        clusterGroup(col("cluster_id"), index.groups).as("_g"))
      .count().collect()
    val clusters = gc.map(_.getLong(0)).toSeq
    val groups = gc.map(_.getInt(1)).distinct.toSeq
    val nInc = gc.map(_.getLong(2)).sum
    // nInc == 0 short-circuits dimOf (a .first() that would throw on an
    // empty increment — a streaming replay/no-data micro-batch is a
    // legitimate caller); an empty broadcast side is free either way
    val bcast = nInc == 0L ||
      nInc * fatAssignBytesPerRow(dimOf(inc, vecCol)) <= BroadcastIncByteBudget
    // two-stage store prune: the group filter partition-prunes the
    // directory scan; the cluster_id IN filter then sub-prunes parquet
    // ROW GROUPS inside each touched group file (the writer orders
    // group files by cluster_id, so min/max stats are tight). Both are
    // superset filters over the comparison join's own cluster_id key —
    // verdicts are unchanged on every route.
    val pruned = pruneKeptToGroups(index.kept, groups, index.groups)
      .filter(col("cluster_id").isin(clusters: _*))
    semanticVerdicts(inc, idCol, vecCol, assigned, pruned, threshold, bcast)
  }

  /** [[semanticDedupAgainstIndex]]'s core on a precomputed assignment
    * and an (already pruned) kept store. `broadcastInc` puts the
    * increment on the build side of both comparison joins. */
  private[graft] def semanticVerdicts(inc: DataFrame, idCol: String,
      vecCol: String, assigned: DataFrame, kept: DataFrame,
      threshold: Double, broadcastInc: Boolean): DataFrame = {
    val av0 = inc.select(col(idCol), col(vecCol)).join(assigned, Seq(idCol))
    val av = if (broadcastInc) broadcast(av0) else av0
    val vsStore = av.as("a")
      .join(kept.select(col("cluster_id"),
          col(idCol).as("_sid"), col(vecCol).as("_sv")),
        Seq("cluster_id"))
      .filter(cosine(col(vecCol), col("_sv")) >= threshold)
      .select(col(idCol))
    val intra = av0.as("a")
      .join(av.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .filter(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")) >= threshold)
      .select(col(s"b.$idCol").as(idCol))
    val dropped = vsStore.unionByName(intra).distinct()
      .withColumn("is_dropped", lit(true))
    assigned.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"),
        coalesce(col("is_dropped"), lit(false)).as("is_dropped"))
  }

  /** Lloyd rounds the IVF codebook trains with by default. Two rounds
    * capture most of the inertia drop (empirically the elbow on the
    * fixture corpus) while keeping the oracle SQL unrolled and cheap. */
  val LloydIters: Int = 2

  /** k-means refinement of the hash-seeded codebook: `iters` Lloyd
    * rounds, each ONE broadcast-centroid corpus scan (assignment by
    * 6-dp rounded cosine, cent_id tiebreak) + ONE mergeable
    * (1+d)-double-per-cluster moment aggregate (vecSumAgg — the sum()
    * shuffle shape; the corpus itself is never shuffled). Only the
    * nlist x d model crosses the driver boundary between rounds.
    *
    * Engine-portable by construction: new centroid components are
    * rounded to 6 dp each round THROUGH SPARK'S OWN round (so the
    * DuckDB oracle's `round(sum(v[i])/count(*), 6)` lands on the same
    * grid), which re-anchors both engines every round — iteration
    * divergence cannot accumulate. Empty clusters keep their previous
    * centroid; centroid ids stay the seed vector ids throughout. */
  private[graft] def lloydCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int, dKnown: Int = -1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // dKnown: callers that already ran dimOf (usually for a scratch
    // guard) pass it through — the duplicate first() was one more
    // sequential driver round trip per training (round 17, §2)
    val d = if (dKnown > 0) dKnown else dimOf(corpus, vecCol)
    var cents: Seq[(Long, Seq[Double])] =
      hashCentroids(corpus, idCol, vecCol, nlist)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val vecs = corpus.select(col(idCol).as("_vid"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("_vv"))
    for (_ <- 1 to iters) {
      // assignment + moments in ONE corpus scan: the argmax centroid is
      // a per-row fold over the nlist literal centroids (argmaxCent) —
      // no nlist x corpus crossJoin, no per-vector window shuffle; the
      // only exchange is the partial-agg merge of nlist (1+d)-double
      // moment buffers. slice is 1-based, [] is 0-based:
      // _s = [n, s_0..s_{d-1}]
      val sums = withBestCent(vecs, "_vid", "_vv", cents)
        .select((-col("_best")("negid")).as("_cent_id"), col("_vv"))
        .groupBy(col("_cent_id"))
        .agg(org.apache.spark.sql.graft.GramianFunctions
          .vecSumAgg(col("_vv"), d).as("_s"))
        .select(col("_cent_id"),
          expr(s"transform(slice(_s, 2, $d), x -> round(x / _s[0], 6))").as("_nv"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      cents = cents.map { case (cid, prev) => (cid, sums.getOrElse(cid, prev)) }
    }
    cents.toDF("_cent_id", "_cent_vec")
  }

  /** Per-row nearest centroid as a FOLD over literal centroids: the
    * max of an array of (6-dp rounded cosine, -cent_id) structs —
    * Spark's struct ordering is lexicographic, so the max is the
    * highest cosine with ties going to the SMALLEST cent_id, exactly
    * the `orderBy(_c desc, _cent_id)` + rk=1 contract of the window
    * formulation it replaces. No crossJoin row blow-up, no per-row
    * window shuffle — a pure codegen scan; callers extract `("c")`
    * (the winning cosine) and `-("negid")` (the winning id). */
  private def argmaxCent(vec: Column, cents: Seq[(Long, Seq[Double])]): Column =
    array_max(array(cents.map { case (cid, v) =>
      struct(round(cosine(vec, typedLit(v)), 6).as("c"), lit(-cid).as("negid"))
    }: _*))

  /** Codebook size above which [[argmaxCent]]'s literal fold is the
    * WRONG plan: its generated bytecode grows with nlist, and past the
    * JVM's JIT method limit the stage executes as interpreted bytecode
    * — measured at the 100x fixture (200k vectors, SemDedupScale):
    * nlist=64 assignment took 238 s via the fold, while nlist=256 ran
    * in seconds only because Spark's codegen gave up entirely (64 KB
    * method cap) and fell back to interpreted EXPRESSIONS. The dead
    * zone between "too big to JIT" and "big enough that codegen
    * refuses" is exactly the fold at medium nlist. */
  private[graft] val ArgmaxFoldMaxCentroids: Int = 32

  /** Nearest-centroid assignment dispatched on codebook size: the
    * literal fold below [[ArgmaxFoldMaxCentroids]], and above it the
    * exploded formulation — one cosine per (vector, centroid) ROW
    * against a broadcast centroid table (every expression stays small
    * and JIT-hot), `max(struct)` per vector, then the vector payload
    * re-joined BY ID. Same contract either way: 6-dp rounded cosine,
    * smallest cent_id wins ties. Returns (vidCol, vvCol, _best{c,
    * negid}).
    *
    * The payload re-join is load-bearing at scale: max over a struct
    * CARRYING the d-dim vector plans a sort-based aggregate over
    * N·nlist ~550-byte rows — measured DEAD at 1M×4096 (the sort
    * wanted ~2 TB of scratch and ENOSPC-killed the JVM;
    * SCALING.md round 13). Slim (c, negid) rows keep the same sort
    * ~20× smaller, and the second corpus scan it buys is the cheap,
    * pushed-down kind.
    *
    * PRECONDITION: `vidCol` must be UNIQUE and NON-NULL. The exploded
    * arm re-joins the payload by id (an inner join), so a NULL id
    * would be silently dropped and a duplicate id would emit one row
    * per input row instead of one per id — a row-count change, not a
    * loud failure. Every caller feeds a primary-key id (vec_id /
    * seed-centroid id); a new caller with synthetic ids must
    * guarantee the same. */
  private def withBestCent(vecs: DataFrame, vidCol: String, vvCol: String,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    if (cents.size <= ArgmaxFoldMaxCentroids)
      vecs.select(col(vidCol), col(vvCol),
        argmaxCent(col(vvCol), cents).as("_best"))
    else {
      val spark = vecs.sparkSession
      import spark.implicits._
      val centDf = broadcast(cents.toDF("_ccid", "_ccv"))
      val best = vecs.crossJoin(centDf)
        .select(col(vidCol),
          struct(round(cosine(col(vvCol), col("_ccv")), 6).as("c"),
            (-col("_ccid")).as("negid")).as("_sb"))
        .groupBy(col(vidCol))
        .agg(max(col("_sb")).as("_best"))
      vecs.join(best, Seq(vidCol))
        .select(col(vidCol), col(vvCol), col("_best"))
    }

  /** Deterministic coarse-quantizer codebook: the nlist vectors with
    * the smallest md5(id) — an unbiased sample, stable across runs and
    * engines (the DuckDB oracle rebuilds it verbatim). */
  private[graft] def hashCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                            nlist: Int): DataFrame =
    corpus
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nlist)
      // array<double> so every downstream cosine runs in the same
      // precision the DuckDB oracles use — a float-vs-double cosine
      // landing exactly on a 6-dp rounding boundary would diverge
      .select(col(idCol).as("_cent_id"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("_cent_vec"))

  /** The production memory-bounded ANN shape: IVF candidate generation
    * scored against INT8-QUANTIZED vectors (what a 100 TB deployment
    * keeps in RAM — 4x smaller than float32), then an exact float
    * re-rank of only the top `coarseK` candidates per probe (the only
    * rows that ever touch full-precision storage). Same deterministic
    * codebook and tie-breaks as [[topKCosineIvf]]; quantization is the
    * symmetric per-vector absmax/127 scheme the `embed_quantize` oracle
    * pins cross-engine, and every cosine is rounded before ranking so
    * the candidate ordering is engine-portable.
    *
    * Returns (probe_id, vec_id, cos, rk) with EXACT cosines, k rows per
    * probe — coarse scores order candidates but never leave the plan. */
  def topKCosineIvfRerank(probes: DataFrame, probeIdCol: String,
                          corpus: DataFrame, idCol: String, vecCol: String,
                          k: Int, nlist: Int = 16, nprobe: Int = 4,
                          coarseK: Int = 12): DataFrame = {
    require(nprobe <= nlist, "topKCosineIvfRerank: nprobe must be <= nlist")
    require(coarseK >= k, "topKCosineIvfRerank: coarseK must be >= k")
    val d = dimOf(corpus, vecCol)
    guardFlatExplicit(corpus, nlist, "topKCosineIvfRerank",
      fatAssignBytesPerRow(d))
    val cents = lloydCentroids(corpus, idCol, vecCol, nlist, LloydIters, d)
    // int8 reconstruction qv*qscale as a double array: the coarse store
    val recon = corpus.select(col(idCol).as("_mid"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("_fv"))
      .withColumn("_qscale",
        expr("""case when round(array_max(transform(_fv, x -> abs(x))) / 127.0, 9) = 0
                then 1.0 else round(array_max(transform(_fv, x -> abs(x))) / 127.0, 9) end"""))
      .withColumn("_mv",
        expr("transform(_fv, x -> cast(round(x / _qscale, 0) as double) * _qscale)"))
    val assigned = bestLists(recon.select(col("_mid"), col("_mv")),
        cents, "_mid", "_mv", 1)
      .select(col("_mid").as("_cid"), col("_mv").as("_cqv"), col("_list"))
    val probeLists = bestLists(probes.select(col(probeIdCol).as("_pid0"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("_pv0")),
        cents, "_pid0", "_pv0", nprobe)
      .select(col("_mid").as("_pid"), col("_mv").as("_pv"), col("_list"))
    val coarse = assigned.join(broadcast(probeLists), "_list")
      .filter(col("_pid") =!= col("_cid"))
      .select(col("_pid"), col("_cid"),
        round(cosine(col("_cqv"), col("_pv")), 6).as("_ccos"))
      .withColumn("_crk", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(col("_ccos").desc, col("_cid"))))
      .filter(col("_crk") <= coarseK)
    // exact re-rank: only coarseK x probes rows read full precision
    coarse
      .join(corpus.select(col(idCol).as("_cid"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("_cfv")), "_cid")
      .join(broadcast(probes.select(col(probeIdCol).as("_pid"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("_pfv"))), "_pid")
      .select(col("_pid").as("probe_id"), col("_cid").as("vec_id"),
        round(cosine(col("_cfv"), col("_pfv")), 6).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= k)
  }

  /** IVF-PQ batch ANN — the memory-COMPRESSED production path next to
    * [[topKCosineIvfRerank]]'s int8 store (public design: Faiss IVFPQ;
    * Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    * Search"). Vectors are unit-normalized (6-dp re-anchored, so
    * cos(q, x) becomes a plain dot product) and split into `m`
    * subspaces; each subspace trains a `ks`-entry codebook —
    * hash-ordered seeds + `pqIters` L2 Lloyd rounds through the same
    * mergeable moment aggregate as the coarse quantizer
    * ([[lloydL2]]). A vector's PQ code is its m argmin sub-centroid
    * positions: m·log2(ks) bits ≈ 1.5 B/vector at the defaults vs
    * 256 B float32. Candidates come from the coarse IVF lists exactly
    * as in [[topKCosineIvf]]; they are scored by ASYMMETRIC DISTANCE
    * COMPUTATION — approx cos(q, x) = Σ_s round(dot(q̂_s,
    * cb_s[code_s]), 6), a literal-codebook lookup per subspace, no
    * decompression — and only the ADC top-`coarseK` rows are
    * exact-cosine reranked against full precision.
    *
    * Scale shape: one corpus scan computes assignment AND codes (pure
    * projection over broadcast centroids/codebooks — the corpus is
    * never shuffled); probes broadcast; the ADC stage reads only the
    * code columns, which is the point — at 100 TB the m code bytes are
    * what stays hot while float vectors live cold until the rerank. At
    * production scale the coded frame is materialized once and reused
    * across probe batches (here it is recomputed per call, like the
    * ann_ivf index).
    *
    * Deterministic end to end (rounded distances/dots, position
    * tiebreaks), so the DuckDB oracle rebuilds codebooks, codes, ADC
    * and rerank and the result is hash-checked like ann_ivf. */
  def topKCosineIvfPq(probes: DataFrame, probeIdCol: String,
                      corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, nlist: Int = 16, nprobe: Int = 4,
                      m: Int = 4, ks: Int = 8, pqIters: Int = 1,
                      coarseK: Int = 12): DataFrame =
    searchPqIndex(probes, probeIdCol, corpus, idCol, vecCol,
      buildPqIndex(corpus, idCol, vecCol, nlist, m, ks, pqIters),
      k, nprobe, coarseK)

  /** The frozen IVF-PQ index — everything the search path needs except
    * the full-precision vectors (those stay with the corpus table and
    * are read only by the rerank): coarse centroids, per-subspace
    * codebooks (sorted by cent_id — POSITION order == cent_id order,
    * so stored codes tiebreak like the oracle's ORDER BY dist,
    * cent_id), and the coded corpus (one row per vector: coarse list +
    * m small code ints, NO floats — the hot store). */
  case class PqIndex(cents: DataFrame,
                     codebooks: Seq[Seq[(Long, Seq[Double])]],
                     coded: DataFrame, m: Int, sub: Int)

  /** Train the coarse quantizer + per-subspace PQ codebooks and encode
    * the corpus in ONE scan (assignment and all m codes are projections
    * over broadcast centroids/codebooks — the corpus is never
    * shuffled). Persist with [[writePqIndex]]; at 100 TB this runs once
    * per corpus snapshot and every probe batch reuses the store. */
  def buildPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                   nlist: Int = 16, m: Int = 4, ks: Int = 8,
                   pqIters: Int = 1): PqIndex = {
    val d = dimOf(corpus, vecCol)
    require(d % m == 0, s"buildPqIndex: dim $d must split into $m subspaces")
    guardFlatExplicit(corpus, nlist, "buildPqIndex", fatAssignBytesPerRow(d))
    val sub = d / m
    val cents = lloydCentroids(corpus, idCol, vecCol, nlist, LloydIters, d)
    val corpusD = corpus.select(col(idCol).as("_id0"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("_v0"))
    // unit-normalized, 6-dp re-anchored working vectors
    val ncorp = corpusD
      .withColumn("_nrm", sqrt(dotd(col("_v0"), col("_v0"))))
      .select(col("_id0"), expr("transform(_v0, x -> round(x / _nrm, 6))").as("_nv"))
    val cbs = lloydL2Multi(ncorp, "_id0", "_nv", m, sub, ks, pqIters)
    PqIndex(cents, cbs, encode(corpus, idCol, vecCol, cents, cbs, sub), m, sub)
  }

  /** Encode vectors against FROZEN coarse centroids + codebooks (no
    * retraining): coarse list + m codes in one projection scan — the
    * incremental form. New corpus shards append their coded rows to
    * the store while the codebooks stay fixed, exactly like the
    * minhash signature store; identical vectors get identical codes by
    * construction, so increments are searchable the moment they land. */
  def encodePq(df: DataFrame, idCol: String, vecCol: String,
               index: PqIndex): DataFrame =
    encode(df, idCol, vecCol, index.cents, index.codebooks, index.sub)

  private def encode(df: DataFrame, idCol: String, vecCol: String,
                     cents: DataFrame, cbs: Seq[Seq[(Long, Seq[Double])]],
                     sub: Int): DataFrame = {
    val dD = df.select(col(idCol).as("_id0"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("_v0"))
    val assigned = bestLists(dD, cents, "_id0", "_v0", 1)
      .select(col("_mid").as("_cid"), col("_mv").as("_cfv"), col("_list"))
      .withColumn("_nrm", sqrt(dotd(col("_cfv"), col("_cfv"))))
      .withColumn("_xnv", expr("transform(_cfv, x -> round(x / _nrm, 6))"))
    assigned.select(
      Seq(col("_cid"), col("_list")) ++ cbs.indices.map(s =>
        argminCodeL2(slice(col("_xnv"), s * sub + 1, sub), cbs(s)).as(s"_k$s")): _*)
  }

  /** Persist a [[PqIndex]]: three parquet tables (cents, codebooks as
    * (space, pos, cent_id, cv) rows, coded corpus). */
  def writePqIndex(index: PqIndex, dir: String): Unit = {
    val spark = index.cents.sparkSession
    import spark.implicits._
    index.cents.write.mode("overwrite").parquet(s"$dir/cents")
    index.codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case ((cid, v), i) => (s, i + 1, cid, v) }
    }.toDF("space", "pos", "cent_id", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    index.coded.write.mode("overwrite").parquet(s"$dir/coded")
  }

  /** Load a persisted [[PqIndex]] (codebooks re-sorted to position
    * order — byte-stable with what writePqIndex stored). */
  def readPqIndex(spark: org.apache.spark.sql.SparkSession, dir: String): PqIndex = {
    val cbRows = spark.read.parquet(s"$dir/codebooks")
      .collect().map(r => (r.getAs[Int]("space"), r.getAs[Int]("pos"),
        // toVector: parquet hands back a mutable ArraySeq, which
        // typedLit's nested-array encoder refuses downstream
        r.getAs[Long]("cent_id"), r.getAs[Seq[Double]]("cv").toVector))
    val m = cbRows.map(_._1).max + 1
    val cbs = (0 until m).map { s =>
      cbRows.filter(_._1 == s).sortBy(_._2).map(r => (r._3, r._4)).toSeq
    }
    val sub = cbs.head.head._2.size
    PqIndex(spark.read.parquet(s"$dir/cents"),
      cbs, spark.read.parquet(s"$dir/coded"), m, sub)
  }

  /** ADC search against a (possibly loaded) [[PqIndex]]: candidates
    * from the stored coarse lists, scored by per-subspace
    * literal-codebook lookups, exact rerank of the ADC top-`coarseK`
    * only — the rerank joins the corpus BY ID, so only those rows ever
    * read full-precision storage. */
  def searchPqIndex(probes: DataFrame, probeIdCol: String,
                    corpus: DataFrame, idCol: String, vecCol: String,
                    index: PqIndex, k: Int, nprobe: Int = 4,
                    coarseK: Int = 12): DataFrame = {
    require(coarseK >= k, "searchPqIndex: coarseK must be >= k")
    val (m, sub) = (index.m, index.sub)
    val probeD = probes.select(col(probeIdCol).as("_pid0"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("_pv0"))
    val probeLists = bestLists(probeD, index.cents, "_pid0", "_pv0", nprobe)
      .select(col("_mid").as("_pid"), col("_mv").as("_pfv"), col("_list"))
      .withColumn("_pnrm", sqrt(dotd(col("_pfv"), col("_pfv"))))
      .withColumn("_qnv", expr("transform(_pfv, x -> round(x / _pnrm, 6))"))
      .select(col("_pid"), col("_list"), col("_qnv"))
    // ADC: fixed s = 0..m-1 summation order; the codebook lookup index
    // (_k<s>) is never NULL, so element_at's NULL-index codegen hazard
    // (see ann_eval) cannot fire here
    val adc = (0 until m).map { s =>
      round(dotd(slice(col("_qnv"), s * sub + 1, sub),
        element_at(typedLit(index.codebooks(s).map(_._2)), col(s"_k$s"))), 6)
    }.reduce(_ + _)
    val coarse = index.coded.join(broadcast(probeLists), "_list")
      .filter(col("_pid") =!= col("_cid"))
      .select(col("_pid"), col("_cid"), round(adc, 6).as("_adc"))
      .withColumn("_crk", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(col("_adc").desc, col("_cid"))))
      .filter(col("_crk") <= coarseK)
    // exact re-rank: only coarseK x probes rows touch full precision
    coarse
      .join(corpus.select(col(idCol).as("_cid"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("_cfv")), "_cid")
      .join(broadcast(probeD), col("_pid") === col("_pid0"))
      .select(col("_pid").as("probe_id"), col("_cid").as("vec_id"),
        round(cosine(col("_cfv"), col("_pv0")), 6).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= k)
  }

  /** L2 k-means codebook for one PQ subspace: hash-ordered seeds +
    * `iters` Lloyd rounds — mean updates through the same mergeable
    * vecSumAgg moment pass as [[lloydCentroids]], assignment by ARGMIN
    * squared L2 distance (6-dp rounded, cent-id tiebreak; dist² is
    * evaluated as x·x − 2·x·c + c·c so both engines run the identical
    * IEEE expression). Returns the driver-side codebook SORTED by
    * cent_id. */
  private[graft] def lloydL2(corpus: DataFrame, idCol: String, vecCol: String,
                             ks: Int, iters: Int): Seq[(Long, Seq[Double])] = {
    val d = dimOf(corpus, vecCol)
    var cents: Seq[(Long, Seq[Double])] =
      hashCentroids(corpus, idCol, vecCol, ks)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val vecs = corpus.select(col(idCol).as("_vid"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("_vv"))
    for (_ <- 1 to iters) {
      val sums = vecs
        .select(argminCentL2(col("_vv"), cents)("cid").as("_cent_id"), col("_vv"))
        .groupBy(col("_cent_id"))
        .agg(org.apache.spark.sql.graft.GramianFunctions
          .vecSumAgg(col("_vv"), d).as("_s"))
        .select(col("_cent_id"),
          expr(s"transform(slice(_s, 2, $d), x -> round(x / _s[0], 6))").as("_nv"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      cents = cents.map { case (cid, prev) => (cid, sums.getOrElse(cid, prev)) }
    }
    cents.sortBy(_._1)
  }

  /** All m PQ subspace codebooks in ONE training ladder (round 17;
    * r16 VERDICT item 4 — ann_ivf_pq ran 34 sequential driver round
    * trips, the §2 driver-bound anti-pattern: m separate [[lloydL2]]
    * calls each paid its own dimOf first(), seed collect and per-round
    * moment collect, serializing the cluster on tiny jobs).
    *
    * Fusion is numerically EXACT, not approximate, because the m
    * trainings share everything but the slice bounds:
    *  - seeds: [[hashCentroids]] orders by md5(id) — vector-independent
    *    — so all m subspaces seed from the SAME ks rows; one collect of
    *    the full normalized vectors, sliced driver-side, reproduces
    *    each per-subspace seed list element for element.
    *  - rounds: each per-subspace round grouped the SAME corpus rows by
    *    that subspace's argmin centroid and vecSumAgg-summed the slice.
    *    Exploding m (space, cid, slice) structs per row and grouping by
    *    (space, cid) feeds every (space, cid) group the identical value
    *    multiset in the identical per-partition row order, so the
    *    rounded means land on the same 6-dp grid (AnnSpec pins the
    *    codebook equality against the unfused ladder; the oracle replay
    *    pins it cross-engine).
    * Driver round trips per Lloyd round: 1 instead of m; seed collects:
    * 1 instead of m; dimOf scans: 0 (sub is passed). */
  private[graft] def lloydL2Multi(corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, sub: Int, ks: Int,
      iters: Int): Seq[Seq[(Long, Seq[Double])]] = {
    val seedRows = hashCentroids(corpus, idCol, vecCol, ks)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
    var cbs: Seq[Seq[(Long, Seq[Double])]] = (0 until m).map { s =>
      seedRows.map { case (cid, v) =>
        (cid, v.slice(s * sub, (s + 1) * sub)) }.toSeq
    }
    val vecs = corpus.select(col(idCol).as("_vid"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("_vv"))
    for (_ <- 1 to iters) {
      val subStructs = array((0 until m).map { s =>
        struct(lit(s).as("sp"),
          argminCentL2(slice(col("_vv"), s * sub + 1, sub), cbs(s))("cid").as("cid"),
          slice(col("_vv"), s * sub + 1, sub).as("sv"))
      }: _*)
      val sums = vecs
        .select(explode(subStructs).as("_e"))
        .select(col("_e.sp").as("_sp"), col("_e.cid").as("_cent_id"),
          col("_e.sv").as("_sv"))
        .groupBy(col("_sp"), col("_cent_id"))
        .agg(org.apache.spark.sql.graft.GramianFunctions
          .vecSumAgg(col("_sv"), sub).as("_s"))
        .select(col("_sp"), col("_cent_id"),
          expr(s"transform(slice(_s, 2, $sub), x -> round(x / _s[0], 6))").as("_nv"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
      cbs = cbs.zipWithIndex.map { case (cb, s) =>
        cb.map { case (cid, prev) => (cid, sums.getOrElse((s, cid), prev)) }
      }
    }
    cbs.map(_.sortBy(_._1))
  }

  /** Squared L2 distance to a literal centroid, 6-dp rounded — the
    * x·x − 2·x·c + c·c form both engines evaluate identically (c·c is
    * a driver-side left-to-right fold, the same order DuckDB's
    * list_dot_product runs). */
  private def distL2(vec: Column, v: Seq[Double]): Column = {
    val cv = typedLit(v)
    round(dotd(vec, vec) - lit(2.0) * dotd(vec, cv) +
      lit(v.foldLeft(0.0)((a, x) => a + x * x)), 6)
  }

  /** Nearest sub-centroid ID (Lloyd's internal keying). */
  private def argminCentL2(vec: Column, cents: Seq[(Long, Seq[Double])]): Column =
    array_min(array(cents.map { case (cid, v) =>
      struct(distL2(vec, v).as("d"), lit(cid).as("cid"))
    }: _*))

  /** Nearest sub-centroid POSITION (1-based, over a cent_id-sorted
    * codebook): the stored PQ code. Position tiebreak == cent_id
    * tiebreak because the codebook is sorted. */
  private def argminCodeL2(vec: Column, sorted: Seq[(Long, Seq[Double])]): Column =
    array_min(array(sorted.zipWithIndex.map { case ((_, v), i) =>
      struct(distL2(vec, v).as("d"), lit(i + 1).as("pos"))
    }: _*))("pos")

  /** Each row of `df` with its `n` highest-cosine centroids (rounded
    * cosines, id tiebreaks — deterministic). */
  /** Kept as the crossJoin + WindowGroupLimit formulation on BOTH
    * sides, by measurement: folding the corpus-side argmax into the
    * scan (argmaxCent, as lloydCentroids/assignClusters do) fuses the
    * assignment with the probe join and per-pair rerank cosines into
    * one scan-bound stage and measured 2.3x SLOWER at sf0.1 and 30x
    * (ann_ivf_rerank 1.9s -> 4.5s) — the window's exchange is what
    * re-spreads the pair-cosine work across cores, and WindowGroupLimit
    * already prunes the 16x candidate rows before the final sort. The
    * fold wins only when nothing heavy follows the assignment
    * (embed_clusters: 3x faster at 30x). */
  private def bestLists(df: DataFrame, cents: DataFrame,
                        id: String, vec: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col("_mid")).orderBy(col("_mcos").desc, col("_cent_id"))
    df.select(col(id).as("_mid"), col(vec).as("_mv"))
      .crossJoin(broadcast(cents))
      .select(col("_mid"), col("_mv"), col("_cent_id"),
        round(cosine(col("_mv"), col("_cent_vec")), 6).as("_mcos"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n)
      .select(col("_mid"), col("_mv"), col("_cent_id").as("_list"))
  }

  /** Embedding dimensionality, from the first row (driver-side, one
    * value). The plane constants need it at plan-build time. */
  private def dimOf(emb: DataFrame, vecCol: String): Int =
    emb.select(size(col(vecCol))).first().getInt(0)
}
