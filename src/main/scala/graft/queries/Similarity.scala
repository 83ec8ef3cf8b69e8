package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{TextHash, TopPairsAggregator}
import graft.syntax._

/** Similarity search over the `embeddings` table (`vec_id, embedding:
  * array<float>[64], label`): brute-force cosine top-k as the exactness
  * baseline, plus a random-hyperplane LSH bucketing as the scale path.
  *
  * Determinism: dot products are evaluated in array-index order with double
  * arithmetic in both engines (verified bit-identical), and every exported
  * similarity is floored to integer basis points, so the oracle hash-matches.
  *
  * Scale: brute-force top-k broadcasts the (small) query set against the
  * corpus — a map-side nested loop with a per-partition top-k, no shuffle of
  * the corpus; k results per query move. The LSH variant replaces the
  * all-pairs comparison with an equi-join on bucket ids: candidates scale
  * with bucket collisions, not n². An IVF variant (k-means centroids +
  * probe-nearest-lists) has the same plan shape — bucket id becomes
  * centroid id — and drops in without changing the query surface. */
object Similarity {

  val Dim = 64
  val NumPlanes = 8
  val TopK = 5
  val NearDupE4 = 3000L
  private val NearDupMaxId = 300

  /** Seeded random hyperplanes (gaussian) — literal constants shared by the
    * Spark plan and the generated oracle SQL, so both engines evaluate the
    * exact same doubles. */
  val Hyperplanes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(13)
    Seq.fill(NumPlanes)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  /** Second independent hyperplane table (different seed) for the
    * multi-table variant — more tables trade candidate count for recall. */
  val Hyperplanes2: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(29)
    Seq.fill(NumPlanes)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  /** Spark-side sign-bit bucket id of `v` against a hyperplane table. */
  private def bucketCol(planes: Seq[Seq[Double]], v: Column): Column =
    planes.zipWithIndex
      .map { case (p, j) => when(dot(v, planeLit(p)) > 0, 1L << j).otherwise(0L) }
      .reduce(_ + _)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Native codegen'd dot product ([[graft.plans.DotProduct]]): the same
    * index-order left fold as `aggregate(zip_with(a,b,_*_), 0.0, _+_)` —
    * bit-identical doubles, so the DuckDB oracles still hash-match — but
    * one primitive loop inside whole-stage codegen instead of an
    * interpreted lambda per element per scored pair. */
  private[graft] def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.DotProduct(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  private[graft] def norm(c: Column): Column = sqrt(dot(c, c))

  private def planeLit(p: Seq[Double]): Column = array(p.map(lit): _*)

  /** Brute-force cosine top-k: each query vector (vec_id < 10) against the
    * whole corpus. The plan is broadcast(queries) ⋈ corpus → per-partition
    * top-k via [[TopPairsAggregator]]: each map task keeps ≤k neighbors per
    * query, so the shuffle moves k×partitions rows per query instead of the
    * whole scored set (the `row_number` window formulation funnels all N×Q
    * scored rows into Q tasks — a straggler at 100× corpus). */
  /** Frame-parametric brute-force cosine top-k core: `corpus` and
    * `queries` are `(vec_id: long, v: array<double>)` frames (queries
    * typically a small filter of the corpus). Shared by the registry path
    * and [[graft.ops.VectorSearch]]. */
  private[graft] def topKFrom(corpus: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val topk = udaf(new TopPairsAggregator(k))
    val q = broadcast(
      queries.withColumn("nrm", norm($"v")).toDF("qid", "qv", "qn"))
    val n = corpus.withColumn("nrm", norm($"v")).toDF("nb", "nv", "nn")
    val cosE4 = floor(dot($"qv", $"nv") / ($"qn" * $"nn") * 10000L).cast("long")
    q.join(n, $"qid" =!= $"nb")
      .withColumn("cos_e4", cosE4)
      .groupBy($"qid")
      .agg(topk($"cos_e4", $"nb").as("top"))
      .select($"qid", posexplode($"top"))
      .select($"qid", ($"pos" + 1).cast("long").as("rank"),
              $"col.nb".as("nb"), $"col.cosE4".as("cos_e4"))
  }

  def qSimTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddingsV(spark, dir)
    topKFrom(e, e.filter($"vec_id" < 10), TopK).orderBy($"qid", $"rank")
  }

  /** SPEC BASELINE (not a production path): embedding-cosine near-dup pairs
    * over a constant-bounded slice (vec_id < 300) — the exactness oracle the
    * LSH-verify specs compare against. The input bound is pushed into the
    * scan and cannot grow with the corpus, which is the only reason the
    * nested-loop plan is tolerated here; the scalable route to the same
    * pairs is [[qSimLshVerify]] / [[qSimLshMulti]]. */
  def qSimNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .filter($"vec_id" < NearDupMaxId)
      .select($"vec_id", asDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val a = e.toDF("va", "av", "an")
    val b = e.toDF("vb", "bv", "bn")
    a.join(b, $"va" < $"vb")
      .withColumn("cos_e4", floor(dot($"av", $"bv") / ($"an" * $"bn") * 10000L).cast("long"))
      .filter($"cos_e4" >= NearDupE4)
      .select($"va", $"vb", $"cos_e4")
      .orderBy($"va", $"vb")
  }

  /** Random-hyperplane LSH: 8 sign bits → bucket id per vector, plus the
    * per-bucket population (the candidate-set size an ANN probe would
    * scan). Bucketing is a per-row projection; the downstream candidate
    * join is an equi-join on `bucket`. */
  def qSimLshBucket(spark: SparkSession, dir: String): DataFrame = {
    val v = asDouble($"embedding")
    val bucket = Hyperplanes.zipWithIndex
      .map { case (p, j) => when(dot(v, planeLit(p)) > 0, 1L << j).otherwise(0L) }
      .reduce(_ + _)
    val perVec = Tables.embeddings(spark, dir)
      .select($"vec_id", bucket.as("bucket"))
    val sizes = perVec.groupBy($"bucket").agg(count(lit(1)).as("bucket_n"))
    perVec.join(sizes, Seq("bucket"))
      .select($"vec_id", $"bucket", $"bucket_n")
  }

  /** Scalable near-dup pairs: LSH-bucket candidate generation + exact
    * cosine verification within buckets — the composition that retires
    * [[qSimNearDup]]'s bounded cartesian as the only route to pairs.
    * Candidates come from an equi-join on `bucket` (pairs scale with bucket
    * collisions, not n²) and the exact dot product runs only on candidates.
    * Recall is bounded by P(same bucket) for a similar pair; production
    * raises it by repeating with independent hyperplane tables (same plan
    * shape, union of candidates). The bucketed index feeds both join sides,
    * so it is persisted once — a production job writes it to storage. */
  def qSimLshVerify(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", asDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
      .withColumn("bucket", bucketCol(Hyperplanes, $"v"))
      .persist()
    e.count() // materialize before the self-join so both sides read the cache
    val a = e.toDF("va", "av", "an", "bucket")
    val b = e.toDF("vb", "bv", "bn", "bucket")
    a.join(b, Seq("bucket")).filter($"va" < $"vb")
      .withColumn("cos_e4",
        floor(dot($"av", $"bv") / ($"an" * $"bn") * 10000L).cast("long"))
      .filter($"cos_e4" >= NearDupE4)
      .select($"va", $"vb", $"cos_e4")
      .orderBy($"va", $"vb")
  }

  /** Multi-table LSH near-dup pairs: candidates are the UNION of bucket
    * collisions from two independent hyperplane tables, then exact-cosine
    * verified. Recall for a similar pair rises from p to 1−(1−p)² at the
    * cost of ~2× candidates — the standard LSH table/recall dial; every
    * added table is one more equi-join + union, never a cross product. The
    * result is a superset of [[qSimLshVerify]]'s (spec-asserted). */
  def qSimLshMulti(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", asDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
      .withColumn("b0", bucketCol(Hyperplanes, $"v"))
      .withColumn("b1", bucketCol(Hyperplanes2, $"v"))
      .persist()
    e.count() // one bucketed index feeds all four join sides
    def pairsOn(c: String): DataFrame = {
      val a = e.select($"vec_id".as("va"), col(c).as("bk"))
      val b = e.select($"vec_id".as("vb"), col(c).as("bk"))
      a.join(b, Seq("bk")).filter($"va" < $"vb").select($"va", $"vb")
    }
    val cand = pairsOn("b0").union(pairsOn("b1")).distinct()
    cand
      .join(e.select($"vec_id".as("va"), $"v".as("av"), $"nrm".as("an")), Seq("va"))
      .join(e.select($"vec_id".as("vb"), $"v".as("bv"), $"nrm".as("bn")), Seq("vb"))
      .withColumn("cos_e4",
        floor(dot($"av", $"bv") / ($"an" * $"bn") * 10000L).cast("long"))
      .filter($"cos_e4" >= NearDupE4)
      .select($"va", $"vb", $"cos_e4")
      .orderBy($"va", $"vb")
  }

  /** Top-k over int8-quantized embeddings: per-vector scalar quantization
    * (min/max → 256 levels), cosine computed on the dequantized codes.
    * This is the memory-footprint scale dial: the stored index shrinks 8×
    * (64 doubles → 64 bytes + 2 doubles), the scan stays the same shape,
    * and ranking quality degrades gracefully (spec checks recall vs the
    * exact top-k). All arithmetic is fixed-order double math, so the
    * oracle hash-matches the approximation exactly. */
  /** int8 scalar quantize → dequantize a `(vec_id, v: array<double>)` frame
    * to `(vec_id, w)` — the round-trip the quantized index ranks with.
    * min/max are bound as columns first: referencing array_min(v) inside
    * the transform lambda would re-evaluate it per element (the lambda
    * re-evaluation trap). */
  private[queries] def dequantized(vs: DataFrame): DataFrame =
    vs
      .withColumn("mn", array_min($"v"))
      .withColumn("mx", array_max($"v"))
      // Degenerate range guard: a constant vector has mx == mn, which would
      // make every code NaN (and Spark's non-ANSI NaN→BIGINT cast silently
      // yields 0 while DuckDB errors — a latent engine/oracle divergence).
      // Pin the code to 0 so constant vectors dequantize to exactly mn.
      .withColumn("codes",
        transform($"v", x => when($"mx" === $"mn", 0.0)
          .otherwise(round((x - $"mn") * 255.0 / ($"mx" - $"mn")))))
      .withColumn("w",
        transform($"codes", c => $"mn" + c * ($"mx" - $"mn") / 255.0))
      .select($"vec_id", $"w")

  def qSimQuantized(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new TopPairsAggregator(TopK))
    val e = dequantized(
        Tables.embeddings(spark, dir)
          .select($"vec_id", asDouble($"embedding").as("v")))
      .withColumn("nrm", norm($"w"))
    val q = broadcast(e.filter($"vec_id" < 10).toDF("qid", "qw", "qn"))
    val n = e.toDF("nb", "nw", "nn")
    q.join(n, $"qid" =!= $"nb")
      .withColumn("cos_e4",
        floor(dot($"qw", $"nw") / ($"qn" * $"nn") * 10000L).cast("long"))
      .groupBy($"qid")
      .agg(topk($"cos_e4", $"nb").as("top"))
      .select($"qid", posexplode($"top"))
      .select($"qid", ($"pos" + 1).cast("long").as("rank"),
              $"col.nb".as("nb"), $"col.cosE4".as("cos_e4"))
      .orderBy($"qid", $"rank")
  }

  /** One packed sign-bit signature word (32 bits, word index 0-based) of a
    * double-array column: bit j set iff v[32·word + j] > 0. Words stay
    * ≤ 2³²−1 — positive in a signed 64-bit long on both engines, so there
    * is no sign-bit packing headache at any dimension. */
  private def signWord(v: Column, word: Int): Column =
    (0 until 32).map { j =>
      when(try_element_at(v, lit(word * 32 + j + 1)) > 0d, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Binary (sign-bit / Hamming) embedding search — the memory-FLOOR scale
    * dial past [[qSimQuantized]]'s int8: each vector binarizes to
    * ⌈64/32⌉ = 2 packed words (8 bytes — 32× smaller than the float32
    * index), and ranking is Hamming distance = popcount(xor) per word, a
    * few integer ops per candidate with no FP at all. Sign-bit Hamming is
    * a monotone proxy for angular distance on centered embeddings
    * (Charikar 2002's hyperplane-LSH bound with the coordinate axes as the
    * hyperplanes; see PAPERS.md) — the production pattern is
    * Hamming-shortlist → exact re-rank, exactly like the PQ path's ADC
    * shortlist. Same plan shape as the exact top-k: broadcast queries ⋈
    * corpus signatures with per-partition top-k, shuffling k×partitions
    * rows; integer everywhere, so the oracle hash-matches bit-for-bit
    * (ties broken (distance, nb) — a total order). */
  def qSimHamming(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new TopPairsAggregator(TopK))
    val sigs = Tables.embeddings(spark, dir)
      .select($"vec_id", asDouble($"embedding").as("v"))
      .select($"vec_id", signWord($"v", 0).as("lo"), signWord($"v", 1).as("hi"))
    val q = broadcast(sigs.filter($"vec_id" < 10).toDF("qid", "qlo", "qhi"))
    q.join(sigs, $"qid" =!= $"vec_id")
      .withColumn("ham",
        (bit_count($"qlo".bitwiseXOR($"lo")) +
          bit_count($"qhi".bitwiseXOR($"hi"))).cast("long"))
      .groupBy($"qid")
      .agg(topk(-$"ham", $"vec_id").as("top"))
      .select($"qid", posexplode($"top"))
      .select($"qid", ($"pos" + 1).cast("long").as("rank"),
              $"col.nb".as("nb"), (-$"col.cosE4").as("ham"))
      .orderBy($"qid", $"rank")
  }

  // ---- IVF (inverted-file) ANN --------------------------------------------

  val IvfClusters = 16
  val IvfProbes = 4
  private val IvfIters = 5

  /** Quantizer train-set cap: ~64 sampled vectors per centroid. Only this
    * many rows ever reach the driver, regardless of corpus size. */
  private val IvfTrainCap = 64 * IvfClusters

  /** Deterministic Lloyd k-means over a bounded train sample, driver-side —
    * the offline "train the quantizer" step of a production IVF/PQ index.
    * Init = first k vectors of the (hash-ordered) sample, fixed iteration
    * count, so the quantizer is reproducible run-to-run. Shared by the IVF
    * coarse quantizer (k=[[IvfClusters]], dim=[[Dim]]) and the per-subvector
    * PQ codebooks (k=[[PqCodebook]], dim=[[PqSubDim]]). */
  private def trainKmeans(vecs: Array[Array[Double]], k: Int, dim: Int)
      : Array[Array[Double]] = {
    var centroids = vecs.take(k).map(_.clone())
    for (_ <- 1 to IvfIters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      vecs.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        for (c <- centroids.indices) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(centroids.length) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  private[graft] def trainCentroids(vecs: Array[Array[Double]]): Array[Array[Double]] =
    trainKmeans(vecs, IvfClusters, Dim)

  /** Scaled-quantizer trainer (round 14): deterministic PARALLEL Lloyd
    * k-means at a caller-chosen k, with dim taken from the sample itself
    * (the historical [[trainCentroids]] pins dim=[[Dim]] and the
    * sequential fold — the k=16 family's reproducibility contract rides
    * on both, so that path is untouched). The parallel assign/sum step
    * uses FIXED chunk boundaries with per-chunk partial sums combined in
    * chunk order, so the result is run-to-run reproducible (it is not
    * bit-equal to the sequential fold's — nothing pins the scaled
    * quantizer's exact floats; the recall gate measures its quality).
    * Measured: the k=439 × 512-dim × 28k-sample train that cost 487 s
    * single-threaded drops to ~tens of seconds on 32 cores. */
  private[graft] def trainCentroidsK(
      vecs: Array[Array[Double]], k0: Int): Array[Array[Double]] = {
    val dim = vecs.headOption.map(_.length).getOrElse(Dim)
    // Clamp k to the sample size: init takes the first k vectors, so a
    // k above vecs.length would leave phantom centroid slots the final
    // tabulate reads out of bounds. Unreachable via scaledK/trainSampleK
    // (sample ≥ k by construction) but this API accepts any (vecs, k).
    val k = math.min(k0, vecs.length)
    if (vecs.length < 2048 || k <= IvfClusters) trainKmeans(vecs, k, dim)
    else {
      var centroids = vecs.take(k).map(_.clone())
      val slices = Runtime.getRuntime.availableProcessors().max(1)
      val bounds = (0 to slices).map(i => vecs.length.toLong * i / slices)
        .map(_.toInt)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(slices)
      try {
        for (_ <- 1 to IvfIters) {
          val cents = centroids // stable reference for the tasks
          val parts = (0 until slices).map { s =>
            pool.submit(new java.util.concurrent.Callable[
                (Array[Array[Double]], Array[Long])] {
              def call(): (Array[Array[Double]], Array[Long]) = {
                val sums = Array.fill(k)(new Array[Double](dim))
                val counts = new Array[Long](k)
                var r = bounds(s)
                while (r < bounds(s + 1)) {
                  val v = vecs(r)
                  var best = 0; var bestD = Double.MaxValue
                  var c = 0
                  while (c < cents.length) {
                    var d = 0.0; var i = 0
                    val ctr = cents(c)
                    while (i < dim) {
                      val t = v(i) - ctr(i); d += t * t; i += 1
                    }
                    if (d < bestD) { bestD = d; best = c }
                    c += 1
                  }
                  counts(best) += 1
                  var i = 0
                  while (i < dim) { sums(best)(i) += v(i); i += 1 }
                  r += 1
                }
                (sums, counts)
              }
            })
          }
          val sums = Array.fill(k)(new Array[Double](dim))
          val counts = new Array[Long](k)
          parts.foreach { f => // combine IN CHUNK ORDER — determinism
            val (ps, pc) = f.get()
            var c = 0
            while (c < k) {
              counts(c) += pc(c)
              var i = 0
              while (i < dim) { sums(c)(i) += ps(c)(i); i += 1 }
              c += 1
            }
          }
          centroids = Array.tabulate(k) { c =>
            if (counts(c) == 0) centroids(c)
            else sums(c).map(_ / counts(c))
          }
        }
      } finally pool.shutdown()
      centroids
    }
  }

  /** Train sample for a scaled quantizer: the same hash-ordered bounded
    * take as [[trainSample]], ~64 rows per centroid, capped at 64k rows
    * total so the driver take stays bounded at any k. */
  private[graft] def trainSampleK(base: DataFrame, k: Int): Array[Array[Double]] =
    base
      .orderBy(TextHash.h60($"vec_id".cast("string")), $"vec_id")
      .limit(math.min(64 * k, 1 << 16))
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** IVF top-k: assign every vector to its nearest centroid (narrow
    * projection against broadcast centroid literals), then each query probes
    * only its [[IvfProbes]] nearest centroid lists — the candidate join is
    * an equi-join on centroid id, scanning ~nprobe/k of the corpus instead
    * of all of it. Registered WITHOUT an oracle (the trained quantizer is a
    * function of the data, so there is no static SQL equivalent); the spec
    * checks recall against the exact brute force and that the candidate
    * set really is a fraction of the corpus. */
  /** The `(vec_id, v: array<double>)` view every ANN index derives from. */
  private def embeddingsV(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select($"vec_id", asDouble($"embedding").as("v"))

  /** Quantizer train sample: order by a salted hash of the key and keep the
    * first [[IvfTrainCap]] rows. orderBy+limit plans as
    * TakeOrderedAndProject — each partition retains its local top-N by hash
    * and the driver merges N rows, so the driver never holds the corpus (a
    * full-table collect here is the canonical 100 TB driver-OOM). Shared by
    * the IVF and IVF+PQ trainers — the ONLY collect either query performs. */
  private[graft] def trainSample(base: DataFrame): Array[Array[Double]] =
    base
      .orderBy(TextHash.h60($"vec_id".cast("string")), $"vec_id")
      .limit(IvfTrainCap)
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** (dist, cid) structs over `$"v"` sorted by distance to each coarse
    * centroid → element 1 is the nearest list, a prefix is the probe set. */
  private[graft] def coarseSortedCol(centroids: Array[Array[Double]]): Column =
    array_sort(array(centroids.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(sqdist($"v", planeLit(c.toSeq)).as("d"), lit(i).as("cid"))
    }: _*))

  /** Recall floor (percent of the exact top-k set recovered, across all
    * queries) the IVF-family gate verdicts assert. With unclustered random
    * embeddings the expected recall is ~nprobe/k = 25%; the measured
    * fixtures sit well above this floor at every SF, and the whole
    * train→assign→probe path is deterministic, so the verdict cannot
    * flake — it only flips if the quantizer genuinely degrades. */
  private val RecallGatePct = 10L

  /** [[qSimGate]]'s ANN-vs-exact decision-agreement bound (percent of
    * batch vectors whose novel/dup call matches the exact side). */
  private val GateAgreePct = 90L

  /** Oracle-gating wrapper for the ANN queries (same exact-vs-estimate
    * pattern as `q_dedup_calibration`): the EXACT brute-force top-k rides
    * the same plan as the approximate index probe, the output rows are the
    * exact side (SQL-expressible, so DuckDB hash-matches them), and one
    * aggregate recall verdict — `approx recovered ≥ [[RecallGatePct]]% of
    * the exact pairs` — is stamped onto every row as a boolean the oracle
    * expects to be TRUE.
    *
    * The verdict is a whole-frame window aggregate (not a separate
    * aggregate + crossJoin) so the flagged subtree — including the exact
    * brute force and the full ANN probe with its quantizer training —
    * executes exactly ONCE per query run. The single-partition window is
    * safe by construction: the frame is |probe set| × k rows (≤ a few
    * hundred), never corpus-sized. */
  /** Session memo of the shared similarity frames, each an EAGER
    * `localCheckpoint` — same lineage-cut discipline (and rationale) as
    * [[Dedup]]'s shared index frames: eleven ANN queries stamp the
    * recall verdict against the SAME exact brute-force top-k side, and a
    * persisted view would re-embed (and re-analyze) the full exact-side
    * plan in every one of them. Values identical by construction. */
  private val simFrameMemo = new graft.SessionMemo[DataFrame]()

  /** The deterministic quantizer train sample / trained centroids,
    * memoized per (session, dir, k): the sample is an orderBy+limit
    * collect (one Spark job) and the k-means runs driver-side — both
    * deterministic, so every consumer training "the" quantizer for a
    * fixture re-derives byte-identical centroids. The memo pays the
    * sample job and the k-means once per session instead of once per
    * consuming query (build once / read many — the same contract as the
    * stored-index memos; a production pipeline persists the trained
    * quantizer next to the index). */
  private val centroidMemo = new graft.SessionMemo[Array[Array[Double]]]()
  private def centroidsFor(spark: SparkSession, dir: String): Array[Array[Double]] =
    centroidMemo.getOrElseUpdate(spark, dir + s":cents$IvfClusters")(
      trainCentroids(sampleFor(spark, dir)))
  private val sampleMemo = new graft.SessionMemo[Array[Array[Double]]]()
  private def sampleFor(spark: SparkSession, dir: String): Array[Array[Double]] =
    sampleMemo.getOrElseUpdate(spark, dir + ":sample")(
      trainSample(embeddingsV(spark, dir)))

  private def recallGated(base: DataFrame, approx: DataFrame,
                          exactKey: String = null): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // exactKey: memoize + lineage-cut the exact side under that key (all
    // registry callers); null keeps the inline plan (frame-parametric
    // spec callers).
    val exact =
      if (exactKey == null) topKFrom(base, base.filter($"vec_id" < 10), TopK)
      else simFrameMemo.getOrElseUpdate(base.sparkSession, exactKey)(
        topKFrom(base, base.filter($"vec_id" < 10), TopK)
          .localCheckpoint(true))
    val flagged = exact
      .join(approx.select($"qid", $"nb").withColumn("hit", lit(1L)),
            Seq("qid", "nb"), "left")
    val w = Window.partitionBy()
    flagged.select($"qid", $"rank", $"nb", $"cos_e4",
      (sum(coalesce($"hit", lit(0L))).over(w) * 100L >=
        count(lit(1)).over(w) * RecallGatePct).as("recall_ok"))
  }

  def qSimIvf(spark: SparkSession, dir: String): DataFrame = {
    val base = embeddingsV(spark, dir)
    recallGated(base, ivfRaw(spark, dir), dir + ":exact10")
  }

  /** Coverage-compensating probe width for a quantizer grown k → k′:
    * nprobe′ = ⌈nprobe·√(k′/k)⌉. Probed corpus fraction shrinks only by
    * √(k′/k) (instead of k′/k at a fixed nprobe) while per-query probed
    * rows still fall by the same √(k′/k) factor — the honest middle
    * ground that lets the STRICT top-k retrain gate accept a √n-scaled
    * quantizer on clustered corpora. Never shrinks nprobe (k′ ≤ k keeps
    * the caller's width). */
  private[graft] def coScaledNprobe(nprobe: Int, kFrom: Int, kTo: Int): Int =
    if (kTo <= kFrom || kFrom <= 0) nprobe
    else math.ceil(nprobe * math.sqrt(kTo.toDouble / kFrom)).toInt

  /** Plan-literal centroid ceiling. Up to this many centroids the
    * assignment/probe expressions inline the quantizer as codegen'd
    * literals — the fastest shape and the historical one for every
    * k=[[IvfClusters]] family query, whose plans (and hashes) must not
    * move. ABOVE it the same math runs as a broadcast join against a
    * (cid, c) centroid frame: a √n-scaled quantizer over a grown corpus
    * (k ≈ 424 at the 100× mouth fixture) would otherwise inline k×dim
    * literal doubles into ONE expression tree (≈217k literals at 512
    * dims), far past what Catalyst/codegen tolerates. Both paths break
    * distance ties by cid, so they agree value-for-value
    * (spec-pinned: `ScaledQuantizerSpec`). */
  private[graft] val LiteralCentroidMax = 64

  /** The (cid, c) broadcast frame of a quantizer — the join-path twin of
    * the [[coarseSortedCol]] literal array. */
  private def centroidsFrameOf(
      spark: SparkSession, centroids: Array[Array[Double]]): DataFrame = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    centroids.toIndexedSeq.zipWithIndex
      .map { case (c, i) => (i, c.toIndexedSeq) }
      .toDF("cid", "c")
  }

  /** Nearest-centroid id per vector as a (vec_id, cid) FRAME — the
    * dispatch point shared by membership checks and stats reassignment.
    * `vecs` must carry exactly (vec_id, v). */
  private[graft] def nearestCidFrame(
      vecs: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    if (centroids.length <= LiteralCentroidMax)
      vecs.select($"vec_id",
        element_at(coarseSortedCol(centroids), 1).getField("cid").as("cid"))
    else {
      val spark = vecs.sparkSession
      vecs.crossJoin(broadcast(centroidsFrameOf(spark, centroids)))
        .select($"vec_id",
          struct(sqdist($"v", $"c").as("d"), $"cid".as("cid")).as("s"))
        .groupBy($"vec_id").agg(min($"s").as("m"))
        .select($"vec_id", $"m.cid".as("cid"))
    }

  /** The raw IVF probe result (qid, rank, nb, cos_e4) — the index path the
    * specs measure recall/rank-order on directly; the registry entry
    * [[qSimIvf]] wraps it in [[recallGated]]. */
  /** Centroid-assigned corpus view `(cid, vec_id, v, nrm)` — what a stored
    * IVF index persists per vector (bucketed on `cid`, the probe-join
    * key). Shared by the live path and [[graft.ops.VectorSearch]].
    * Dispatches on quantizer size ([[LiteralCentroidMax]]); the join path
    * requires `base` = exactly (vec_id, v), which is what every caller
    * passes (the canon shape). */
  private[graft] def assignedOf(
      base: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    if (centroids.length <= LiteralCentroidMax)
      base
        .withColumn("cid", element_at(coarseSortedCol(centroids), 1).getField("cid"))
        .withColumn("nrm", norm($"v"))
    else
      // argmin over (d, cid) ONLY, then join v back by key: carrying the
      // vector payload through the aggregation buffer put each task's
      // hash table at keys × vector-size (measured: a 192k × 512-dim
      // promotion OOM'd an 8 GB heap at the edge); the 16 B/key argmin +
      // one equi-join is the shape that survives any corpus
      base.join(nearestCidFrame(base, centroids), Seq("vec_id"))
        .select($"vec_id", $"cid", $"v", norm($"v").as("nrm"))

  /** IVF probe over an assigned corpus frame (live or stored): each query
    * explodes its `nprobe` nearest centroid ids and equi-joins the
    * per-centroid lists — the candidate join scans ~nprobe/k of the corpus
    * and, against a `cid`-bucketed STORED frame, plans without an exchange
    * on the index side. Output: (qid, rank, nb, cos_e4). Probe-cid
    * derivation dispatches on quantizer size like [[assignedOf]]. */
  private[graft] def probeAssigned(
      assigned: DataFrame, queries: DataFrame,
      centroids: Array[Array[Double]], nprobe: Int, k: Int): DataFrame = {
    val probes =
      if (centroids.length <= LiteralCentroidMax) {
        val sorted = coarseSortedCol(centroids)
        queries
          .withColumn("probe", explode(slice(sorted, 1, nprobe)))
          .select($"vec_id".as("qid"), $"v".as("qv"), norm($"v").as("qn"),
                  $"probe.cid".as("cid"))
      } else {
        val spark = queries.sparkSession
        // per query: k (d, cid) pairs collected and sorted, first nprobe
        // kept — the query side is a bounded batch, so collect_list is
        // k×16 B per query, never corpus-scale
        queries.select($"vec_id", $"v")
          .crossJoin(broadcast(centroidsFrameOf(spark, centroids)))
          .select($"vec_id", $"v",
            struct(sqdist($"v", $"c").as("d"), $"cid".as("cid")).as("s"))
          .groupBy($"vec_id")
          .agg(first($"v").as("v"),
            slice(array_sort(collect_list($"s")), 1, nprobe).as("ps"))
          .select($"vec_id", $"v", explode($"ps").as("probe"))
          .select($"vec_id".as("qid"), $"v".as("qv"), norm($"v").as("qn"),
            $"probe.cid".as("cid"))
      }
    val cand = probes.join(
      assigned.select($"cid", $"vec_id".as("nb"), $"v".as("nv"), $"nrm".as("nn")),
      Seq("cid"))
      .filter($"qid" =!= $"nb")
    val topk = udaf(new TopPairsAggregator(k))
    cand
      .withColumn("cos_e4", floor(dot($"qv", $"nv") / ($"qn" * $"nn") * 10000L).cast("long"))
      .groupBy($"qid")
      .agg(topk($"cos_e4", $"nb").as("top"))
      .select($"qid", posexplode($"top"))
      .select($"qid", ($"pos" + 1).cast("long").as("rank"),
              $"col.nb".as("nb"), $"col.cosE4".as("cos_e4"))
  }

  private[graft] def ivfRaw(spark: SparkSession, dir: String): DataFrame = {
    val base = embeddingsV(spark, dir)
    val centroids = centroidsFor(spark, dir)
    probeAssigned(assignedOf(base, centroids), base.filter($"vec_id" < 10),
      centroids, IvfProbes, TopK)
  }

  /** Quantizer size of the oracle-gated SCALED-path query: above
    * [[LiteralCentroidMax]] so assignment AND probe-cid selection run the
    * broadcast (cid, c) join dispatch — the plan shape a grown production
    * index runs after its first √n retrain. Fixed (not √n of the fixture)
    * so the query is the same shape at every SF. */
  private[graft] val ScaledDemoK = 128

  /** IVF probe at a SCALED quantizer, oracle-gated (round 15 — closes the
    * round-14 tier gap: all prior oracle rows run k=[[IvfClusters]]
    * literal-quantizer plans; the post-retrain production path was
    * spec-pinned only). Same exact-side + recall-verdict contract as
    * [[qSimIvf]]; the probe width is co-scaled ([[coScaledNprobe]]), the
    * width a production index adopts with a co-scaled retrain. The k=16
    * family's plans are untouched — this query trains its own quantizer
    * at [[ScaledDemoK]] and dispatches through the same
    * [[assignedOf]]/[[probeAssigned]] entry points, which a spec pins to
    * the broadcast-join plan shape (`ScaledQuantizerSpec`). */
  def qSimIvfScaled(spark: SparkSession, dir: String): DataFrame = {
    val base = embeddingsV(spark, dir)
    recallGated(base, ivfScaledRaw(spark, dir), dir + ":exact10")
  }

  private[graft] def ivfScaledRaw(spark: SparkSession, dir: String): DataFrame = {
    val base = embeddingsV(spark, dir)
    val cents = trainCentroidsK(trainSampleK(base, ScaledDemoK), ScaledDemoK)
    require(cents.length > LiteralCentroidMax,
      s"ivfScaledRaw: fixture too small to exercise the join path " +
        s"(k=${cents.length} <= $LiteralCentroidMax)")
    probeAssigned(assignedOf(base, cents), base.filter($"vec_id" < 10),
      cents, coScaledNprobe(IvfProbes, IvfClusters, cents.length), TopK)
  }

  // ---- IVF + PQ (product quantization) ------------------------------------

  val PqM = 8                       // subvectors per vector
  val PqSubDim: Int = Dim / PqM     // dims per subvector
  val PqCodebook = 32               // centroids per subvector codebook
  val PqShortlist = 64              // PQ-ranked candidates kept for re-rank

  /** IVF + product quantization — the memory layout a 100 TB ANN index
    * actually ships: the IVF coarse quantizer prunes the corpus to nprobe
    * candidate lists, and within them vectors are represented by [[PqM]]
    * codebook codes (5 bits each here) + one reconstructed norm instead of
    * [[Dim]] doubles — the stored index shrinks from 512 bytes/vector to
    * ~13, another ÷5 past the int8 scalar quantization of
    * [[qSimQuantized]]. Scoring is asymmetric-distance (ADC): each query
    * precomputes one [[PqCodebook]]-entry dot-product LUT per subvector
    * BEFORE the candidate join (8×32 dots per query, not per candidate), so scoring a
    * candidate is 8 array lookups + a divide — it never touches raw
    * vectors. The PQ ranking keeps a [[PqShortlist]]-deep shortlist per
    * query (partial top-k aggregation, no window), and only those
    * shortlist×queries rows are re-ranked against exact vectors — the
    * standard coarse→code→exact funnel.
    *
    * Both quantizers train on the SAME bounded hash-ordered sample
    * ([[trainSample]]) — no new collect anywhere. Oracle-gated like
    * [[qSimIvf]] via [[recallGated]] (the trained quantizers are
    * data-dependent, so the probe result itself has no static SQL
    * equivalent, but the in-plan exact side + recall verdict does); the
    * spec additionally asserts recall at least matches IVF-only. */
  private val ivfIndexDirCache = scala.collection.mutable.Map.empty[String, String]

  /** Scale-lane measurement hook — see [[Dedup.resetStoredIndexMemos]]. */
  private[graft] def resetStoredIndexMemos(): Unit = {
    ivfIndexDirCache.synchronized(ivfIndexDirCache.clear())
    ivfAppendDirCache.synchronized(ivfAppendDirCache.clear())
    ivfBaseDirCache.synchronized(ivfBaseDirCache.clear())
    ivfMergeDirCache.synchronized(ivfMergeDirCache.clear())
    ivfForgetDirCache.synchronized(ivfForgetDirCache.clear())
    ivfCompactDirCache.synchronized(ivfCompactDirCache.clear())
    ivfMaintainDirCache.synchronized(ivfMaintainDirCache.clear())
    ivfRetrainDirCache.synchronized(ivfRetrainDirCache.clear())
    ivfRetrainAbDirCache.synchronized(ivfRetrainAbDirCache.clear())
  }

  /** Build (once per FIXTURE per JVM) and open the persisted IVF index for
    * the fixture corpus — same memo convention as the dedup index
    * ([[Dedup.qDedupIndexed]]'s `storedIndexFor`): keyed by the fixture
    * dir alone (the index derives only from the immutable files under it),
    * so cold-bench session churn reuses the stored copy instead of
    * rebuilding and leaking one per run, and the temp dirs are registered
    * with [[graft.TempIndexDirs]] for deletion at JVM exit. */
  private def storedIvfFor(
      spark: SparkSession, dir: String): graft.ops.VectorSearch.IvfIndex = {
    val out = ivfIndexDirCache.synchronized {
      ivfIndexDirCache.getOrElseUpdate(dir, {
        val tmp = graft.TempIndexDirs.create("graft-ivf-index")
        graft.ops.Walls.timed("q.ivf_build")(graft.ops.VectorSearch.buildIvfIndex(
          Tables.embeddings(spark, dir), "vec_id", "embedding", tmp))
        tmp
      })
    }
    graft.ops.VectorSearch.fromIvfIndex(spark, out)
  }

  /** Stored-ANN-index lifecycle proof (the vector twin of
    * [[Dedup.qDedupIndexed]]): probe the PERSISTED IVF index
    * ([[graft.ops.VectorSearch.buildIvfIndex]] → `fromIvfIndex` →
    * `probeStored`) instead of re-training/re-assigning, then stamp TWO
    * in-plan verdicts onto the exact brute-force side the oracle can
    * recompute: `recall_ok` (the [[recallGated]] contract) and
    * `stored_ok` — a full-outer compare of the stored-index probe against
    * the live recomputed probe (1-row bounded aggregate, broadcast back).
    * A stale or corrupted index — or a stored quantizer drifting from the
    * deterministic trainer — flips `stored_ok` and fails the hash gate. */
  def qSimIvfIndexed(spark: SparkSession, dir: String): DataFrame = {
    val base = embeddingsV(spark, dir)
    val idx = storedIvfFor(spark, dir)
    val stored = probeAssigned(idx.vectors, base.filter($"vec_id" < 10),
      idx.centroidArray, IvfProbes, TopK)
    val live = ivfRaw(spark, dir)
    val mism = stored.withColumn("st", lit(1))
      .join(live.withColumn("lv", lit(1)),
        Seq("qid", "rank", "nb", "cos_e4"), "full")
      .agg(sum(when($"st".isNull || $"lv".isNull, 1L).otherwise(0L))
        .as("n_mismatch"))
    recallGated(base, stored, dir + ":exact10")
      .crossJoin(broadcast(mism))
      .select($"qid", $"rank", $"nb", $"cos_e4", $"recall_ok",
        ($"n_mismatch" === 0L).as("stored_ok"))
  }

  /** Memoized appended-IVF dir for [[qSimIvfAppend]]: the index is built
    * over ~6/7 of the corpus and the remaining vectors are appended
    * through [[graft.ops.VectorSearch.appendToIvfIndex]] (assignment
    * against the STORED quantizer — no retrain). Same per-fixture
    * per-JVM memo convention as [[ivfIndexDirCache]]. */
  /** Memoized BASE-slice IVF index (vectors outside the `% 7 === 3`
    * batch): built once per JVM per fixture and shared by the gate
    * ([[qSimGate]] probes it in place) and the append family
    * ([[appendedIvfFor]] mutates a file COPY) — one base build, not one
    * per consumer (the dedup-index memos follow the same shape). */
  private val ivfBaseDirCache = scala.collection.mutable.Map.empty[String, String]
  private def ivfBaseDirFor(spark: SparkSession, dir: String): String =
    ivfBaseDirCache.synchronized {
      ivfBaseDirCache.getOrElseUpdate(dir, {
        val tmp = graft.TempIndexDirs.create("graft-ivf-base")
        graft.ops.Walls.timed("q.ivf_base_build")(
          graft.ops.VectorSearch.buildIvfIndex(
            Tables.embeddings(spark, dir).filter($"vec_id" % 7 =!= 3),
            "vec_id", "embedding", tmp))
        tmp
      })
    }

  private val ivfAppendDirCache = scala.collection.mutable.Map.empty[String, String]
  private def appendedIvfDirFor(spark: SparkSession, dir: String): String =
    ivfAppendDirCache.synchronized {
      ivfAppendDirCache.getOrElseUpdate(dir, {
        val tmp = graft.TempIndexDirs.copyOf(
          ivfBaseDirFor(spark, dir), "graft-ivf-append")
        graft.ops.Walls.timed("q.ivf_append")(
          graft.ops.VectorSearch.appendToIvfIndex(
            Tables.embeddings(spark, dir).filter($"vec_id" % 7 === 3),
            "vec_id", "embedding", tmp))
        tmp
      })
    }
  private def appendedIvfFor(
      spark: SparkSession, dir: String): graft.ops.VectorSearch.IvfIndex =
    graft.ops.VectorSearch.fromIvfIndex(spark, appendedIvfDirFor(spark, dir))

  /** ANN NOVELTY GATE, oracle-gated — the vector twin of
    * [[Dedup.qDedupGate]]: decide, for each incoming embedding, whether
    * anything in the stored corpus is already this similar (cosine ≥
    * [[NearDupE4]]) — the "embed-then-dedup" admission decision of a
    * training-data pipeline, where paying for a duplicate's downstream
    * pipeline is the cost being avoided. The PRODUCTION decision is the
    * stored-IVF probe (cid equi-joins against the bucketed lists, top-1
    * per query — O(batch × probed lists) at any corpus size); the emitted
    * rows are the EXACT brute-force side (best stored neighbor + verdict
    * per batch vector), which the DuckDB oracle recomputes, with
    * `gate_ok` riding along: TRUE iff the ANN decision agrees with the
    * exact decision on EVERY batch vector — a degraded quantizer that
    * starts missing near-dups flips it and fails the hash gate. */
  def qSimGate(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.ops.VectorSearch.fromIvfIndex(spark, ivfBaseDirFor(spark, dir))
    val e = embeddingsV(spark, dir)
    // The batch is a FIXED-SIZE micro-batch (vec_id < 700 caps it at ≤100
    // vectors at any corpus scale), because that is the operator's
    // semantics — a gate verdicts one bounded incoming batch against a
    // GROWING corpus. Without the bound the exact-oracle side is
    // batch×corpus with batch ∝ corpus, i.e. quadratic in N: the
    // dual-scale lane measured 3.96× time / 22.7× shuffle for 10× data;
    // with the fixed batch the exact side is O(batch·N), data-linear.
    // (sf0.001/sf0.01 have max vec_id 500, so the correctness-gate
    // results are unchanged by the bound.)
    val batch = e.filter($"vec_id" % 7 === 3 && $"vec_id" < 700)
    val baseN = e.filter($"vec_id" % 7 =!= 3)
      .select($"vec_id".as("nb"), $"v".as("nv"), norm($"v").as("nn"))
    // exact side: best stored neighbor per batch vector (max cos, min nb
    // on ties — struct ordering makes the argmax deterministic)
    val q = broadcast(batch.select($"vec_id".as("qid"), $"v".as("qv"),
      norm($"v").as("qn")))
    val exactBest = q.join(baseN)
      .withColumn("cos_e4",
        floor(dot($"qv", $"nv") / ($"qn" * $"nn") * 10000L).cast("long"))
      .groupBy($"qid")
      .agg(max(struct($"cos_e4", (-$"nb").as("neg_nb"))).as("best"))
      .select($"qid", (-$"best.neg_nb").as("best_nb"),
        $"best.cos_e4".as("best_cos_e4"))
    // production side: stored-IVF probe, top-1
    val ann = probeAssigned(idx.vectors, batch, idx.centroidArray, IvfProbes, 1)
      .select($"qid", $"cos_e4".as("ann_cos_e4"))
    // ANN is approximate by contract: an nprobe-bounded probe can miss a
    // neighbor sitting in an unprobed cell, so the verdict bounds the
    // DECISION-AGREEMENT RATE (≥ GateAgreePct% of batch vectors get the
    // same novel/dup call) instead of demanding exactness — same shape as
    // recallGated's bounded recall contract. A missing ANN row (no
    // candidates in the probed cells) counts as a "novel" call.
    val agree = exactBest
      .select($"qid", ($"best_cos_e4" >= NearDupE4).as("exact_dup"))
      .join(ann.select($"qid", ($"ann_cos_e4" >= NearDupE4).as("ann_dup")),
        Seq("qid"), "full")
      .agg(sum(when(coalesce($"exact_dup", lit(false)) =!=
          coalesce($"ann_dup", lit(false)), 1L).otherwise(0L))
        .as("n_disagree"),
        count(lit(1)).as("n_total"))
    exactBest.crossJoin(broadcast(agree))
      .select($"qid", $"best_nb", $"best_cos_e4",
        ($"best_cos_e4" < NearDupE4).as("is_novel"),
        ($"n_disagree" * 100L <= $"n_total" * (100L - GateAgreePct))
          .as("gate_ok"))
      .orderBy($"qid")
  }

  /** INCREMENTAL ANN ingestion, oracle-gated: the stored IVF index is
    * built over a base slice of the corpus, the remaining vectors are
    * APPENDED by assignment against the stored quantizer
    * ([[graft.ops.VectorSearch.appendToIvfIndex]] — O(batch), no
    * retrain), and the appended index is probed. Two in-plan verdicts
    * ride the exact brute-force side the oracle recomputes: `recall_ok`
    * (the [[recallGated]] contract — the grown index must still find the
    * true neighbors, batch vectors included) and `stored_ok` — the
    * appended index's probe must be bit-identical to assigning the WHOLE
    * corpus against the same stored quantizer in one pass (the
    * incremental path may not drift from the batch path; note the
    * reference uses the STORED quantizer, not a retrained one — append
    * semantics are "same quantizer, grown lists" by design). */
  def qSimIvfAppend(spark: SparkSession, dir: String): DataFrame = {
    val base = embeddingsV(spark, dir)
    val idx = appendedIvfFor(spark, dir)
    val queries = base.filter($"vec_id" < 10)
    val stored = probeAssigned(idx.vectors, queries,
      idx.centroidArray, IvfProbes, TopK)
    val ref = probeAssigned(assignedOf(base, idx.centroidArray), queries,
      idx.centroidArray, IvfProbes, TopK)
    val mism = stored.withColumn("st", lit(1))
      .join(ref.withColumn("lv", lit(1)),
        Seq("qid", "rank", "nb", "cos_e4"), "full")
      .agg(sum(when($"st".isNull || $"lv".isNull, 1L).otherwise(0L))
        .as("n_mismatch"))
    recallGated(base, stored, dir + ":exact10")
      .crossJoin(broadcast(mism))
      .select($"qid", $"rank", $"nb", $"cos_e4", $"recall_ok",
        ($"n_mismatch" === 0L).as("stored_ok"))
  }

  /** Memoized MERGED-IVF dir for [[qSimIvfMerge]]: the base slice and the
    * `% 7 === 3` shard are indexed INDEPENDENTLY (the base build is the
    * shared [[ivfBaseDirCache]] memo, read in place — merge mutates
    * neither input; the right side is its own small
    * [[graft.ops.VectorSearch.buildIvfIndex]]) and combined with
    * [[graft.ops.VectorSearch.mergeIvfIndexes]] into a fresh dir. */
  private val ivfMergeDirCache = scala.collection.mutable.Map.empty[String, String]
  private def mergedIvfFor(
      spark: SparkSession, dir: String): graft.ops.VectorSearch.IvfIndex = {
    val out = ivfMergeDirCache.synchronized {
      ivfMergeDirCache.getOrElseUpdate(dir, {
        val leftDir = ivfBaseDirFor(spark, dir)
        val rightDir = graft.TempIndexDirs.create("graft-ivf-right")
        graft.ops.VectorSearch.buildIvfIndex(
          Tables.embeddings(spark, dir).filter($"vec_id" % 7 === 3),
          "vec_id", "embedding", rightDir)
        val tmp = graft.TempIndexDirs.create("graft-ivf-merged")
        graft.ops.VectorSearch.mergeIvfIndexes(spark, leftDir, rightDir, tmp)
        tmp
      })
    }
    graft.ops.VectorSearch.fromIvfIndex(spark, out)
  }

  /** PARTITION-WISE ANN index merge, oracle-gated — the vector twin of
    * [[Dedup.qDedupIndexMerge]]: two IVF indexes built independently over
    * disjoint shards (embarrassingly parallel at 100 TB) are combined by
    * [[graft.ops.VectorSearch.mergeIvfIndexes]] — the senior quantizer is
    * adopted and the junior shard's STORED vectors re-assign against it,
    * no raw embeddings touched — and the merged index is probed. Two
    * in-plan verdicts ride the exact brute-force side the oracle
    * recomputes: `recall_ok` (the merged index must still find the true
    * neighbors across BOTH shards) and `merge_ok` — the merged probe must
    * be bit-identical to assigning the whole corpus against the same
    * quantizer in one pass (a dropped shard, a mis-assigned list, or a
    * double-served vector flips it and fails the hash gate). */
  def qSimIvfMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = embeddingsV(spark, dir)
    val idx = mergedIvfFor(spark, dir)
    val queries = base.filter($"vec_id" < 10)
    val stored = probeAssigned(idx.vectors, queries,
      idx.centroidArray, IvfProbes, TopK)
    val ref = probeAssigned(assignedOf(base, idx.centroidArray), queries,
      idx.centroidArray, IvfProbes, TopK)
    val mism = stored.withColumn("st", lit(1))
      .join(ref.withColumn("lv", lit(1)),
        Seq("qid", "rank", "nb", "cos_e4"), "full")
      .agg(sum(when($"st".isNull || $"lv".isNull, 1L).otherwise(0L))
        .as("n_mismatch"))
    recallGated(base, stored, dir + ":exact10")
      .crossJoin(broadcast(mism))
      .select($"qid", $"rank", $"nb", $"cos_e4", $"recall_ok",
        ($"n_mismatch" === 0L).as("merge_ok"))
  }

  /** Memoized FORGOTTEN-IVF dir for [[qSimIvfForget]]: the appended
    * index ([[appendedIvfFor]]) is COPIED on disk (the shared memo stays
    * unmutated) and the `% 7 === 3` batch's vec_ids are then ERASED in
    * place with [[graft.ops.VectorSearch.removeFromIvfIndex]] — the
    * append→forget round trip. */
  private val ivfForgetDirCache = scala.collection.mutable.Map.empty[String, String]
  private def forgottenIvfFor(
      spark: SparkSession, dir: String): graft.ops.VectorSearch.IvfIndex = {
    appendedIvfFor(spark, dir) // ensure the appended source index exists
    val out = ivfForgetDirCache.synchronized {
      ivfForgetDirCache.getOrElseUpdate(dir, {
        val src = ivfAppendDirCache.synchronized(ivfAppendDirCache(dir))
        val copy = graft.TempIndexDirs.copyOf(src, "graft-ivf-forget")
        graft.ops.VectorSearch.removeFromIvfIndex(
          spark, copy,
          Tables.embeddings(spark, dir)
            .filter($"vec_id" % 7 === 3).select($"vec_id"))
        copy
      })
    }
    graft.ops.VectorSearch.fromIvfIndex(spark, out)
  }

  /** FORGET, vector twin ([[Dedup.qDedupIndexForget]]), oracle-gated: the
    * `% 7 === 3` batch — previously appended — is erased in place from a
    * copy of the appended IVF index (anti-join rewrite of the
    * cid-bucketed lists, rename promotion deleting the old generation's
    * bytes; quantizer untouched — centroids are a trained model, not
    * per-vector state). The post-forget index is probed over the
    * REMAINING corpus; `recall_ok` rides the exact side the oracle
    * recomputes and `forget_ok` pins the probe bit-identical to the BASE
    * index's probe (append→forget must round-trip) — a leaked erased
    * vector or a dropped survivor flips it and fails the hash gate. */
  def qSimIvfForget(spark: SparkSession, dir: String): DataFrame = {
    val remaining = embeddingsV(spark, dir).filter($"vec_id" % 7 =!= 3)
    val idx = forgottenIvfFor(spark, dir)
    val queries = remaining.filter($"vec_id" < 10)
    val stored = probeAssigned(idx.vectors, queries,
      idx.centroidArray, IvfProbes, TopK)
    val base = graft.ops.VectorSearch
      .fromIvfIndex(spark, ivfBaseDirFor(spark, dir))
    val ref = probeAssigned(base.vectors, queries,
      base.centroidArray, IvfProbes, TopK)
    val mism = stored.withColumn("st", lit(1))
      .join(ref.withColumn("lv", lit(1)),
        Seq("qid", "rank", "nb", "cos_e4"), "full")
      .agg(sum(when($"st".isNull || $"lv".isNull, 1L).otherwise(0L))
        .as("n_mismatch"))
    recallGated(remaining, stored, dir + ":exact10rem")
      .crossJoin(broadcast(mism))
      .select($"qid", $"rank", $"nb", $"cos_e4", $"recall_ok",
        ($"n_mismatch" === 0L).as("forget_ok"))
  }

  /** CERTIFICATE OF ERASURE over the post-forget IVF index, oracle-gated
    * (twin of [[Dedup.qDedupForgetCert]]): the residual row count for the
    * erased `% 7 === 3` batch probed from the RAW `vectors/` files (the
    * quantizer holds no per-vector state). The oracle is the contract —
    * one row ('vectors', 0, TRUE); the engine counts from bytes on disk,
    * so a single leaked vector flips the hashed count. */
  def qSimIvfForgetCert(spark: SparkSession, dir: String): DataFrame = {
    forgottenIvfFor(spark, dir)
    val idxDir = ivfForgetDirCache.synchronized(ivfForgetDirCache(dir))
    graft.ops.VectorSearch.erasureCertificate(
      spark, idxDir,
      Tables.embeddings(spark, dir)
        .filter($"vec_id" % 7 === 3).select($"vec_id"))
  }

  /** Memoized compacted-IVF dir for [[qSimIvfCompact]]: the appended
    * index ([[appendedIvfFor]]) is COPIED on disk (the shared memo stays
    * unmutated) and compacted; pre/post `vectors/` data-file counts ride
    * along for the layout verdict. */
  private val ivfCompactDirCache =
    scala.collection.mutable.Map.empty[String, (String, Long, Long)]

  /** IVF index COMPACTION, oracle-gated — the vector twin of
    * `q_dedup_index_compact`: each [[graft.ops.VectorSearch
    * .appendToIvfIndex]] batch lands one more file per touched cid
    * bucket; [[graft.ops.VectorSearch.compactIvfIndex]] rewrites the
    * bucketed lists to one file per non-empty bucket and promotes by
    * rename. The compacted index is probed; `recall_ok` rides the exact
    * side the oracle recomputes, and `compact_ok` pins the compacted
    * probe bit-identical to the pre-compaction probe (full-outer compare)
    * plus the driver-measured file-count contract. */
  def qSimIvfCompact(spark: SparkSession, dir: String): DataFrame = {
    appendedIvfFor(spark, dir) // ensure the appended source index exists
    val (out, before, after) = ivfCompactDirCache.synchronized {
      ivfCompactDirCache.getOrElseUpdate(dir, {
        val src = ivfAppendDirCache.synchronized(ivfAppendDirCache(dir))
        val copy = graft.TempIndexDirs.copyOf(src, "graft-ivf-compact")
        val b = graft.ops.CorpusDedup.dataFileCount(spark, s"$copy/vectors")
        graft.ops.VectorSearch.compactIvfIndex(spark, copy)
        val a = graft.ops.CorpusDedup.dataFileCount(spark, s"$copy/vectors")
        (copy, b, a)
      })
    }
    val idx = graft.ops.VectorSearch.fromIvfIndex(spark, out)
    val pre = appendedIvfFor(spark, dir)
    val base = embeddingsV(spark, dir)
    val queries = base.filter($"vec_id" < 10)
    val stored = probeAssigned(idx.vectors, queries,
      idx.centroidArray, IvfProbes, TopK)
    val ref = probeAssigned(pre.vectors, queries,
      pre.centroidArray, IvfProbes, TopK)
    val mism = stored.withColumn("st", lit(1))
      .join(ref.withColumn("lv", lit(1)),
        Seq("qid", "rank", "nb", "cos_e4"), "full")
      .agg(sum(when($"st".isNull || $"lv".isNull, 1L).otherwise(0L))
        .as("n_mismatch"))
    recallGated(base, stored, dir + ":exact10")
      .crossJoin(broadcast(mism))
      .select($"qid", $"rank", $"nb", $"cos_e4", $"recall_ok",
        ($"n_mismatch" === 0L && lit(after < before) &&
          lit(after <= graft.ops.CorpusDedup.bucketsOf(spark, out).toLong))
          .as("compact_ok"))
  }

  /** Memoized MAINTAINED-IVF dir for [[qSimIvfMaintain]]: the appended
    * index is COPIED and ONE [[graft.ops.VectorSearch.maintainIvfIndex]]
    * call plays the maintenance schedule (compact-if-fragmented +
    * measured retrain recommendation); an immediate second call must
    * report every trigger clear. Verdicts recorded: post-maintenance
    * fragmentation within the policy bound, retrain NOT recommended on
    * the healthy fixture quantizer, and second-call no-op. */
  private val ivfMaintainDirCache =
    scala.collection.mutable.Map
      .empty[String, (String, Boolean, Boolean, Boolean)]

  /** SCHEDULED IVF MAINTENANCE, oracle-gated — the vector twin of
    * `q_dedup_index_maintain` and the executable form of the documented
    * "retrain only on measured drift" trigger: one
    * [[graft.ops.VectorSearch.maintainIvfIndex]] call compacts the
    * appended index's fragmented lists (gated on the measured data-file
    * count) and measures the [[graft.ops.VectorSearch.ivfStats]] drift
    * signals, recommending — never performing — a retrain. The
    * maintained index is then probed; `recall_ok` rides the exact side
    * the oracle recomputes, and `maintain_ok` pins the three policy
    * verdicts (fragmentation within bound after, retrain correctly NOT
    * recommended on the healthy quantizer, immediate second call all
    * no-op). A maintenance pass that loses a vector flips the probe
    * rows; one that re-compacts a compact index or misfires the retrain
    * trigger flips `maintain_ok`. */
  def qSimIvfMaintain(spark: SparkSession, dir: String): DataFrame = {
    appendedIvfFor(spark, dir) // ensure the appended source index exists
    val (out, fragBounded, retrainClear, secondNoop) =
      ivfMaintainDirCache.synchronized {
        ivfMaintainDirCache.getOrElseUpdate(dir, {
          val src = ivfAppendDirCache.synchronized(ivfAppendDirCache(dir))
          val copy = graft.TempIndexDirs.copyOf(src, "graft-ivf-maintain")
          val r1 = graft.ops.VectorSearch.maintainIvfIndex(spark, copy)
            .collect()
          val bounded = r1.find(_.getString(0) == "compact")
            .exists(_.getLong(3) <=
              2L * graft.ops.CorpusDedup.bucketsOf(spark, copy))
          val retrain = r1.find(_.getString(0) == "retrain")
            .exists(_.getBoolean(1))
          val noop = graft.ops.VectorSearch.maintainIvfIndex(spark, copy)
            .collect().forall(!_.getBoolean(1))
          (copy, bounded, !retrain, noop)
        })
      }
    val idx = graft.ops.VectorSearch.fromIvfIndex(spark, out)
    val base = embeddingsV(spark, dir)
    val queries = base.filter($"vec_id" < 10)
    val stored = probeAssigned(idx.vectors, queries,
      idx.centroidArray, IvfProbes, TopK)
    recallGated(base, stored, dir + ":exact10")
      .select($"qid", $"rank", $"nb", $"cos_e4", $"recall_ok",
        lit(fragBounded && retrainClear && secondNoop).as("maintain_ok"))
  }

  private val ivfRetrainDirCache =
    scala.collection.mutable.Map.empty[String, (String, Boolean, Boolean, Boolean)]

  /** IVF RETRAIN, oracle-gated — the ACT step of the measured-drift loop
    * (measure: [[qSimIvfStats]]; recommend: [[qSimIvfMaintain]]; act:
    * [[graft.ops.VectorSearch.retrainIvfIndex]]): retrain a copy of the
    * appended (quantizer-drifted) index, then verdict
    *  - `ids_conserved` — the stored vec_id set is untouched;
    *  - `rebuild_identical` — the retrained index equals a from-scratch
    *    [[graft.ops.VectorSearch.buildIvfIndex]] over the same stored
    *    vectors row-for-row, centroids AND assigned lists (the
    *    deterministic train sample makes this exact);
    *  - `drift_reset` — post-retrain stats are healthy (misassigned 0,
    *    within-SSE strictly under the 1-mean quantizer's);
    * and emit the RETRAINED index's probe face, recall-gated against the
    * exact side the oracle recomputes. */
  def qSimIvfRetrain(spark: SparkSession, dir: String): DataFrame = {
    appendedIvfFor(spark, dir) // ensure the appended source index exists
    val (out, conserved, identical, healthy) =
      ivfRetrainDirCache.synchronized {
        ivfRetrainDirCache.getOrElseUpdate(dir, {
          val src = ivfAppendDirCache.synchronized(ivfAppendDirCache(dir))
          val copy = graft.TempIndexDirs.copyOf(src, "graft-ivf-retrain")
          val V = graft.ops.VectorSearch
          // ids BEFORE, lineage-cut: the lazy plan must not read through
          // the rewrite's promotion
          val before = V.fromIvfIndex(spark, copy).vectors
            .select($"vec_id").localCheckpoint(true)
          graft.ops.Walls.timed("q.retrain")(V.retrainIvfIndex(spark, copy))
          val retrained = V.fromIvfIndex(spark, copy)
          // ONE action per equality check (round 17): the union evaluates
          // both exceptAll branches inside a single take(1) job — the old
          // `isEmpty && isEmpty` paid two driver-synchronized jobs per
          // call, and the retrain verifier calls this three times.
          def same(a: DataFrame, b: DataFrame) =
            a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty
          val cons = graft.ops.Walls.timed("q.retrain_cons")(
            same(before, retrained.vectors.select($"vec_id")))
          val freshDir = graft.TempIndexDirs.create("graft-ivf-rebuild")
          graft.ops.Walls.timed("q.retrain_rebuild")(V.buildIvfIndex(
            retrained.vectors.select($"vec_id", $"v".as("embedding")),
            "vec_id", "embedding", freshDir))
          val fresh = V.fromIvfIndex(spark, freshDir)
          val ident = graft.ops.Walls.timed("q.retrain_ident")(
            same(retrained.vectors.select($"cid", $"vec_id", $"v", $"nrm"),
              fresh.vectors.select($"cid", $"vec_id", $"v", $"nrm")) &&
              same(retrained.centroids, fresh.centroids))
          val st = graft.ops.Walls.timed("q.retrain_stats")(V.ivfStats(spark, copy)
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
          val ok = st.getOrElse("n_misassigned", 1L) == 0L &&
            st.getOrElse("within_sse_e6", Long.MaxValue) <
              st.getOrElse("global_sse_e6", 0L)
          (copy, cons, ident, ok)
        })
      }
    val idx = graft.ops.VectorSearch.fromIvfIndex(spark, out)
    val base = embeddingsV(spark, dir)
    val queries = base.filter($"vec_id" < 10)
    val stored = probeAssigned(idx.vectors, queries,
      idx.centroidArray, IvfProbes, TopK)
    recallGated(base, stored, dir + ":exact10")
      .select($"qid", $"rank", $"nb", $"cos_e4", $"recall_ok",
        lit(conserved && identical && healthy).as("retrain_ok"))
  }

  private val ivfRetrainAbDirCache =
    scala.collection.mutable.Map.empty[String, (String, Boolean)]

  /** RETRAIN ACT-POLICY AUDIT, oracle-gated — the `_history` face of the
    * recall-gated opt-in act ([[graft.ops.VectorSearch.retrainIfNotWorse]]):
    * force the drift trigger on a COPY of the appended index (impossible
    * skew ceiling) with `actOnRetrain = true`, then verdict the audit
    * ledger the way an operator would:
    *  - `ab_logged` — exactly ONE `retrain_ab` event, carrying the same
    *    (acted, recall_before, recall_after) triple the maintenance
    *    report returned;
    *  - `act_consistent` — acted=1 implies a `retrain` ledger event AND
    *    measured recall_after ≥ recall_before (the gate's contract);
    *    acted=0 implies NO retrain event and bit-identical centroids
    *    (refusals leave the index untouched);
    *  - `stale_clear` — `stale_abort` = 0 (single-writer run; the
    *    concurrent-ingest abort path is `IvfRetrainPolicySpec`'s).
    * The probe face rides the post-maintenance index, recall-gated
    * against the exact side the oracle recomputes — so the act's
    * decision trail is hash-gated like the rest of the `_history`
    * deliverables, not just spec-read. */
  def qSimIvfRetrainAb(spark: SparkSession, dir: String): DataFrame = {
    appendedIvfFor(spark, dir) // ensure the appended source index exists
    val (out, ok) = ivfRetrainAbDirCache.synchronized {
      ivfRetrainAbDirCache.getOrElseUpdate(dir, {
        val src = ivfAppendDirCache.synchronized(ivfAppendDirCache(dir))
        val copy = graft.TempIndexDirs.copyOf(src, "graft-ivf-retrain-ab")
        val V = graft.ops.VectorSearch
        val centsBefore = spark.read.parquet(s"$copy/centroids")
          .collect().map(_.toSeq).toSet
        val rep = graft.ops.Walls.timed("q.retrain_ab_maintain")(
          V.maintainIvfIndex(spark, copy, skewCeil = 0L,
            actOnRetrain = true).collect())
          .map(r => r.getString(0) ->
            ((r.getBoolean(1), r.getLong(2), r.getLong(3)))).toMap
        val (acted, rb, ra) = rep("retrain_act")
        val ab = graft.ops.CorpusDedup.history(spark, copy)
          .filter($"event" === "retrain_ab")
          .select($"acted", $"recall_before_pct", $"recall_after_pct",
            $"stale_abort")
          .collect()
        val abLogged = ab.length == 1 &&
          (ab.head.getLong(0) == 1L) == acted &&
          ab.head.getLong(1) == rb && ab.head.getLong(2) == ra
        val events = graft.ops.CorpusDedup.history(spark, copy)
          .filter($"event" === "retrain").count()
        spark.catalog.refreshByPath(copy)
        val centsAfter = spark.read.parquet(s"$copy/centroids")
          .collect().map(_.toSeq).toSet
        val actConsistent =
          if (acted) events == 1L && ra >= rb
          else events == 0L && centsAfter == centsBefore
        val staleClear = ab.length == 1 && ab.head.getLong(3) == 0L
        (copy, abLogged && actConsistent && staleClear)
      })
    }
    val idx = graft.ops.VectorSearch.fromIvfIndex(spark, out)
    val base = embeddingsV(spark, dir)
    val queries = base.filter($"vec_id" < 10)
    val stored = probeAssigned(idx.vectors, queries,
      idx.centroidArray, IvfProbes, TopK)
    recallGated(base, stored, dir + ":exact10")
      .select($"qid", $"rank", $"nb", $"cos_e4", $"recall_ok",
        lit(ok).as("ab_ok"))
  }

  /** The skew ceiling [[qSimIvfStats]]'s `list_skew` verdict asserts:
    * largest list at most 4x the average. Measured maxima across the
    * fixtures sit at 1.25-1.38x, so the verdict only flips when the
    * quantizer genuinely stops partitioning (the deterministic
    * train->assign path cannot flake it). */
  private val IvfSkewCeil = 4L

  /** IVF INDEX HEALTH DASHBOARD, oracle-gated — the vector twin of
    * [[Dedup.qDedupIndexStats]] and the measurement behind the IVF
    * family's documented "retrain only on measured drift" rebuild
    * trigger. Reads [[graft.ops.VectorSearch.ivfStats]] over the
    * build+append lineage (the same stored index the append family
    * probes) and emits the oracle-comparable face:
    *
    *  - `vectors_total` — stored-list cardinality, which must equal the
    *    corpus row count (conservation; the oracle recomputes it);
    *  - `misassigned` — stored cid vs re-assignment against the stored
    *    quantizer, expected 0 (a corrupted append flips it);
    *  - `list_skew` — largest list vs [[IvfSkewCeil]]x average, verdict
    *    only (the trained quantizer has no static SQL equivalent, so the
    *    VALUE cannot be oracle-recomputed — same contract-oracle shape
    *    as `q_dedup_index_forget_cert`);
    *  - `quant_gain` — within-centroid SSE strictly below the trivial
    *    1-mean quantizer's SSE, verdict only: drift toward parity is the
    *    retrain trigger.
    *
    * The full numeric dashboard (per-list extrema, skew_e4, qerr_e6,
    * SSE pair) is the public operator's output, spec-pinned in
    * `IvfIndexSpec`. */
  def qSimIvfStats(spark: SparkSession, dir: String): DataFrame = {
    val st = graft.ops.VectorSearch
      .ivfStats(spark, appendedIvfDirFor(spark, dir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = Tables.embeddings(spark, dir).count()
    val rows = Seq(
      ("list_skew", None,
        st("max_list") * st("n_lists") <= IvfSkewCeil * st("n_vectors")),
      ("misassigned", Some(st("n_misassigned")), st("n_misassigned") == 0L),
      ("quant_gain", None, st("within_sse_e6") < st("global_sse_e6")),
      ("vectors_total", Some(st("n_vectors")), st("n_vectors") == corpus))
    import spark.implicits.newProductEncoder
    spark.createDataset[(String, Option[Long], Boolean)](rows)
      .toDF("metric", "value", "health_ok")
      .orderBy($"metric")
  }

  def qSimIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val base = embeddingsV(spark, dir)
    recallGated(base, ivfPqRaw(spark, dir), dir + ":exact10")
  }

  /** The raw IVF+PQ shortlist-re-rank result (qid, rank, nb, cos_e4) —
    * measured directly by the specs; [[qSimIvfPq]] wraps it in
    * [[recallGated]]. */
  private[queries] def ivfPqRaw(spark: SparkSession, dir: String): DataFrame = {
    val base = embeddingsV(spark, dir)
    val sample = sampleFor(spark, dir)
    val coarse = centroidsFor(spark, dir)
    val books: Array[Array[Array[Double]]] = Array.tabulate(PqM) { m =>
      trainKmeans(
        sample.map(_.slice(m * PqSubDim, (m + 1) * PqSubDim)),
        PqCodebook, PqSubDim)
    }
    def sub(m: Int): Column = slice($"v", m * PqSubDim + 1, PqSubDim)

    // Encode: coarse list id + per-subvector nearest-codebook-entry code
    // (lexicographic array_min argmin — deterministic tie-break) + the
    // reconstructed norm (subvectors are an orthogonal decomposition, so
    // ‖reconstruction‖² = Σ_m ‖codebook_m[code_m]‖²).
    val sortedCoarse = coarseSortedCol(coarse)
    val codeCols = (0 until PqM).map { m =>
      val cands = array(books(m).toIndexedSeq.zipWithIndex.map { case (c, j) =>
        struct(sqdist(sub(m), planeLit(c.toSeq)).as("d"), lit(j).as("code"))
      }: _*)
      array_min(cands).getField("code").as(s"c$m")
    }
    val norm2Of = (0 until PqM).map { m =>
      element_at(array(books(m).toIndexedSeq.map(c => lit(c.map(x => x * x).sum)): _*),
        col(s"c$m") + 1)
    }.reduce(_ + _)
    val pqIndex = base
      .withColumn("cid", element_at(sortedCoarse, 1).getField("cid"))
      .select(Seq($"cid", $"vec_id".as("nb")) ++ codeCols: _*)
      .withColumn("nn_pq", sqrt(norm2Of))

    // Queries: exact norm + one ADC LUT per subvector, then the nprobe
    // coarse lists — all computed on 10 rows before the candidate join.
    val q0 = base.filter($"vec_id" < 10).withColumn("qn", norm($"v"))
    val withLuts = (0 until PqM).foldLeft(q0) { (df, m) =>
      df.withColumn(s"lut$m",
        array(books(m).toIndexedSeq.map(c => dot(sub(m), planeLit(c.toSeq))): _*))
    }
    val probes = withLuts
      .withColumn("probe", explode(slice(sortedCoarse, 1, IvfProbes)))
      .select(Seq($"vec_id".as("qid"), $"qn", $"probe.cid".as("cid")) ++
        (0 until PqM).map(m => col(s"lut$m")): _*)

    val approxDot = (0 until PqM)
      .map(m => element_at(col(s"lut$m"), col(s"c$m") + 1))
      .reduce(_ + _)
    val shortK = udaf(new TopPairsAggregator(PqShortlist))
    val shortlist = probes.join(pqIndex, Seq("cid"))
      .filter($"qid" =!= $"nb")
      .withColumn("pq_e4",
        floor(approxDot / ($"qn" * $"nn_pq") * 10000L).cast("long"))
      .groupBy($"qid")
      .agg(shortK($"pq_e4", $"nb").as("top"))
      .select($"qid", explode($"top").as("s"))
      .select($"qid", $"s.nb".as("nb"))

    // Exact re-rank of the shortlist only.
    val nbVec = base.withColumn("nrm", norm($"v"))
      .select($"vec_id".as("nb"), $"v".as("nv"), $"nrm".as("nn"))
    val qVec = broadcast(q0.select($"vec_id".as("qid"), $"v".as("qv"), $"qn"))
    val topk = udaf(new TopPairsAggregator(TopK))
    shortlist.join(nbVec, Seq("nb")).join(qVec, Seq("qid"))
      .withColumn("cos_e4",
        floor(dot($"qv", $"nv") / ($"qn" * $"nn") * 10000L).cast("long"))
      .groupBy($"qid")
      .agg(topk($"cos_e4", $"nb").as("top"))
      .select($"qid", posexplode($"top"))
      .select($"qid", ($"pos" + 1).cast("long").as("rank"),
              $"col.nb".as("nb"), $"col.cosE4".as("cos_e4"))
  }

  /** Retrieval composition — the RAG-shaped "find my neighbors, then fetch
    * their records" round trip across tables: top-3 cosine neighbors per
    * query vector joined to the neighbor document's metadata (the
    * embeddings and documents tables share the id space; a production
    * pipeline embeds exactly one vector per document). Plan: the hit list
    * is queries×3 rows, so it BROADCASTS against the documents table —
    * fetching metadata is a map-side join of the corpus, no corpus
    * shuffle, no matter how large `documents` is. */
  def qSimRetrieve(spark: SparkSession, dir: String): DataFrame = {
    val hits = qSimTopk(spark, dir).filter($"rank" <= 3)
    Tables.documents(spark, dir)
      .select($"doc_id".as("nb"), $"source", $"n_chars")
      .join(broadcast(hits), Seq("nb"))
      .select($"qid", $"rank", $"nb", $"cos_e4", $"source", $"n_chars")
  }

  /** Per-label centroid sums over the embedding corpus — the "summarize a
    * cluster by its mean vector" step (class prototypes, IVF re-training,
    * diversity audits). Vector aggregation as posexplode → (label, dim)
    * hash-aggregate: narrow 64× fan-out, partial aggregation collapses it
    * map-side, shuffle carries |labels|×dims rows regardless of corpus
    * size. Components sum as integer micros, so the result is
    * summation-order-independent and hash-matches the oracle exactly
    * (emit sum + count, not the FP mean). */
  def qSimCentroid(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select($"label".cast("long").as("label"),
              posexplode(asDouble($"embedding")))
      .select($"label", ($"pos" + 1).cast("long").as("pos"),
              round($"col" * 1000000).cast("long").as("c"))
      .groupBy($"label", $"pos")
      .agg(sum($"c").as("sum_c"), count(lit(1)).as("n"))
      .orderBy($"label", $"pos")

  /** Per-label mean vectors from [[qSimCentroid]]'s exact integer sums —
    * the bounded-aggregate pattern: only |labels|×dims AGGREGATED rows
    * reach the driver, never corpus rows. */
  private def centroidMeans(spark: SparkSession, dir: String): Seq[(Long, Array[Double])] =
    qSimCentroid(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (label, rows) =>
        label -> rows.sortBy(_.getLong(1))
          .map(r => r.getLong(2).toDouble / r.getLong(3) / 1e6)
      }
      .toSeq.sortBy(_._1)

  private def sqdist(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.SquaredDistance(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Nearest-centroid assignment + per-class purity — the k-means E-step /
    * cluster-quality audit over the embedding corpus. The 10 per-label
    * centroids come from ONE aggregation ([[qSimCentroid]]'s exact integer
    * sums); only those 640 AGGREGATED rows reach the driver (the bounded-
    * aggregate pattern, not a corpus collect) and come back as constant
    * arrays, so the scoring pass is a pure map: 10 codegen'd `graft_sqdist`
    * calls per row, argmin via lexicographic `array_min` over
    * (distance, label) structs — deterministic tie-break, NO shuffle until
    * the final 10-row purity rollup. */
  def qSimAssign(spark: SparkSession, dir: String): DataFrame = {
    val cent = centroidMeans(spark, dir)
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("long").as("label"),
              asDouble($"embedding").as("v"))
    val candidates = array(cent.map { case (label, cv) =>
      struct(sqdist($"v", array(cv.toIndexedSeq.map(lit): _*)).as("d"),
             lit(label).as("clabel"))
    }: _*)
    e.withColumn("best", array_min(candidates))
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
           sum(when($"best.clabel" === $"label", 1L).otherwise(0L)).as("n_correct"))
      .withColumn("purity_e4", floor($"n_correct" * 10000L / $"n").cast("long"))
      .orderBy($"label")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication" — public paper): semantic
    * near-duplicate removal over the embedding corpus. Cluster with the
    * k-means assignment ([[qSimAssign]]'s E-step), compare pairs ONLY
    * within a cluster, and drop the higher-id member of every pair with
    * cosine ≥ [[NearDupE4]]. Emits the full per-vector verdict
    * (vec_id, cid, is_kept) — the survivor mask a curation pipeline
    * applies to the corpus.
    *
    * Scale: this is the textbook SemDeDup layout — the pair comparison is
    * an equi-join on centroid id, so candidate count is Σ_c |c|², bounded
    * by choosing k so clusters stay ~constant-sized (the paper uses
    * k = 110k on LAION; cluster size, not corpus size, is the knob). The
    * centroids come from one bounded aggregate (|labels|×dims rows via the
    * driver, never corpus rows), assignment is a shuffle-free codegen'd
    * argmin map, and the dup set re-joins the corpus on vec_id — three
    * narrow shuffles total, nothing all-pairs. */
  def qDedupSemantic(spark: SparkSession, dir: String): DataFrame =
    semanticVerdictFrom(assignedFrame(spark, dir), NearDupE4)

  /** `(vec_id, v, cid)` — every corpus vector with its nearest-centroid
    * cluster id (constant-array argmin over [[centroidMeans]], shuffle-free
    * codegen'd map): the shared E-step frame the SemDeDup verdict and the
    * cohesion audit both start from. */
  private def assignedFrame(spark: SparkSession, dir: String): DataFrame = {
    val cent = centroidMeans(spark, dir)
    val candidates = array(cent.map { case (label, cv) =>
      struct(sqdist($"v", array(cv.toIndexedSeq.map(lit): _*)).as("d"),
             lit(label).as("clabel"))
    }: _*)
    embeddingsV(spark, dir)
      .withColumn("cid", array_min(candidates).getField("clabel"))
  }

  /** Within-cluster scored pairs over an assigned frame: one row per
    * (a, b) same-cluster pair with a < b and the floored integer cosine —
    * the equi-join-on-cid skeleton shared by the verdict and the audit. */
  private def withinClusterPairs(assigned: DataFrame): DataFrame = {
    val a = assigned.withColumn("nrm", norm($"v"))
      .select($"vec_id", $"cid", $"v", $"nrm")
    a.as("x").join(a.as("y"),
        col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.cid").as("cid"),
        col("x.vec_id").as("va"), col("y.vec_id").as("vb"),
        floor(dot(col("x.v"), col("y.v"))
          / (col("x.nrm") * col("y.nrm")) * 10000L).cast("long").as("cos_e4"))
  }

  /** Frame-parametric SemDeDup core over a pre-assigned
    * `(vec_id: long, v: array<double>, cid: long)` frame: within-cluster
    * pair equi-join on `cid`, greedy keep-lowest-id verdict. Shared by
    * the registry path and [[graft.ops.VectorSearch.semanticVerdict]]. */
  private[graft] def semanticVerdictFrom(assigned: DataFrame, thresholdE4: Long)
      : DataFrame = {
    val dup = withinClusterPairs(assigned)
      .filter($"cos_e4" >= thresholdE4)
      .select($"vb".as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    assigned.join(dup, Seq("vec_id"), "left")
      .select($"vec_id", $"cid", $"is_dup".isNull.as("is_kept"))
  }

  /** Candidate pool size per query for [[qSimMmr]]. */
  private val MmrPool = 10

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998,
    * public paper) — the diversity-aware selection step of a retrieval
    * pipeline: from each query's top-[[MmrPool]] cosine candidates, pick 3
    * greedily by `score = 7·rel − 3·max_sim_to_selected` (λ = 0.7 kept as
    * integer numerators — no division anywhere, so Spark and DuckDB agree
    * bit-for-bit; a float λ·rel formulation would drift in the last ulps).
    * The greedy loop is unrolled (k = 3) into three deterministic
    * argmax-per-query rounds with (score desc, nb) tie-breaks.
    *
    * Scale: after the brute-force/ANN top-k (whose plan is the scalable
    * part), every frame here is queries×pool rows — the rounds are joins
    * on qid over that tiny frame, and the candidate-vector fetch is a
    * broadcast of the hit list against the corpus (no corpus shuffle),
    * exactly the retrieval-composition shape. */
  def qSimMmr(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddingsV(spark, dir)
    val nbv = e.withColumn("nrm", norm($"v"))
      .select($"vec_id".as("nb"), $"v".as("nv"), $"nrm".as("nn"))
    val cand = nbv.join(
        broadcast(topKFrom(e, e.filter($"vec_id" < 10), MmrPool)
          .select($"qid", $"nb", $"cos_e4".as("rel_e4"))),
        Seq("nb"))
      .select($"qid", $"nb", $"rel_e4", $"nv", $"nn")
    def pick(df: DataFrame, score: Column): DataFrame = df
      .withColumn("score", score)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"score".desc, $"nb")))
      .filter($"rn" === 1)
      .select($"qid", $"nb", $"score", $"nv", $"nn")
    // selected-round frames renamed wholesale: the rounds self-join frames
    // of shared lineage, so unique names sidestep ambiguous resolution
    def sel(s: DataFrame, p: String): DataFrame =
      s.select($"qid".as(s"${p}_qid"), $"nb".as(s"${p}_nb"),
               $"nv".as(s"${p}_nv"), $"nn".as(s"${p}_nn"))
    def simTo(p: String): Column =
      floor(dot($"nv", col(s"${p}_nv")) / ($"nn" * col(s"${p}_nn")) * 10000L)
        .cast("long")
    val s1 = pick(cand, $"rel_e4" * 7L)
    val r2 = cand.join(sel(s1, "s1"), $"qid" === $"s1_qid")
      .filter($"nb" =!= $"s1_nb")
      .select($"qid", $"nb", $"rel_e4", $"nv", $"nn", simTo("s1").as("sim1"))
    val s2 = pick(r2, $"rel_e4" * 7L - $"sim1" * 3L)
    // round 3 extends r2: sim-to-s1 is already materialized as sim1, so
    // only the s2 similarity is computed — one join and one dot product
    // fewer than rebuilding from cand
    val r3 = r2.join(sel(s2, "s2"), $"qid" === $"s2_qid")
      .filter($"nb" =!= $"s2_nb")
      .select($"qid", $"nb", $"rel_e4", $"nv", $"nn",
              greatest($"sim1", simTo("s2")).as("maxsim"))
    val s3 = pick(r3, $"rel_e4" * 7L - $"maxsim" * 3L)
    def out(s: DataFrame, rank: Int): DataFrame =
      s.select($"qid", lit(rank.toLong).as("rank"), $"nb",
               $"score".as("mmr_score"))
    out(s1, 1).union(out(s2, 2)).union(out(s3, 3))
      .orderBy($"qid", $"rank")
  }

  /** Candidate pool per ranking for [[qSimHybrid]] and the RRF smoothing
    * constant (k = 60, the value from Cormack et al. 2009, "Reciprocal
    * rank fusion outperforms Condorcet and individual rank learning
    * methods" — public paper). */
  private val HybridPool = 10
  private val RrfK = 60L

  /** Hybrid retrieval — Reciprocal Rank Fusion of the DENSE ranking
    * (brute-force/ANN cosine top-k over embeddings) with the SPARSE
    * ranking (shingle-Jaccard overlap against the DF-capped lexical
    * index) for the same 10 queries: the standard two-tower fusion of a
    * modern retrieval stack, entirely in integers —
    * rrf = Σ ⌊10⁶/(60+rank)⌋ over the rankings that contain the
    * candidate, so the fusion is bit-exact across engines and needs no
    * score normalization (RRF's whole point: ranks, not incomparable
    * scores).
    *
    * Plan: the dense pool is the bounded-broadcast top-k ([[topKFrom]]);
    * the sparse pool equi-joins the 10 query docs' capped shingles against
    * the session-shared capped index ([[Dedup]]'s artifact — candidates
    * per query are bounded by shingles/doc × the DF cap, never corpus
    * size), ranks within each query by exact integer Jaccard, keeps
    * [[HybridPool]]. The fusion is a FULL outer join of two ≤10-row-per-
    * query lists + one window over ≤20 rows per query — everything after
    * the candidate generators operates on pool-sized frames. */
  def qSimHybrid(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddingsV(spark, dir)
    val vec = topKFrom(e, e.filter($"vec_id" < 10), HybridPool)
      .select($"qid", $"nb", $"rank".as("rank_vec"))
    val idx = Dedup.cappedIndexFor(spark, dir)
    val q = idx.filter($"doc_id" < 10)
      .select($"doc_id".as("qid"), $"n".as("nq"), $"s")
    val c = idx.select($"doc_id".as("nb"), $"n".as("nc"), $"s")
    val txt = q.join(c, Seq("s")).filter($"qid" =!= $"nb")
      .groupBy($"qid", $"nb")
      .agg(count(lit(1)).as("common"), max($"nq").as("nq"), max($"nc").as("nc"))
      .withColumn("jacc_e4",
        floor($"common" * 10000L / ($"nq" + $"nc" - $"common")).cast("long"))
      .withColumn("rank_txt", row_number().over(
        Window.partitionBy($"qid").orderBy($"jacc_e4".desc, $"nb")).cast("long"))
      .filter($"rank_txt" <= HybridPool)
      .select($"qid", $"nb", $"rank_txt")
    vec.join(txt, Seq("qid", "nb"), "full")
      .withColumn("rrf_e6",
        coalesce(expr(s"1000000 div ($RrfK + rank_vec)"), lit(0L)) +
        coalesce(expr(s"1000000 div ($RrfK + rank_txt)"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"rrf_e6".desc, $"nb")).cast("long"))
      .filter($"rank" <= TopK)
      .select($"qid", $"rank", $"nb", $"rank_vec", $"rank_txt", $"rrf_e6")
  }

  /** Per-cluster cohesion audit over the k-means assignment — the
    * "how tight are my embedding clusters" diagnostic (SemDeDup threshold
    * tuning, IVF list-quality check): member count, pair count, and the
    * min/max and exact SUM of pairwise cosines within each cluster, all
    * integer-e4 (the sum stays divisionless — a `div`-derived mean would
    * truncate toward zero in Spark but floor in DuckDB when a cold
    * cluster's sum goes negative; consumers derive mean = sum/pairs).
    * Member counts come from the assignment frame and the pair stats
    * LEFT-join onto them, so a degenerate 1-member cluster — the loudest
    * assignment-quality signal — still appears (n_pairs = 0, null cosine
    * stats) instead of vanishing from its own audit. Pairs via the same
    * within-cluster equi-join as [[qDedupSemantic]]; nothing all-pairs,
    * cost is Σ_c |c|² with cluster size as the knob. */
  def qSimDiversity(spark: SparkSession, dir: String): DataFrame = {
    val assigned = assignedFrame(spark, dir)
    val members = assigned.groupBy($"cid").agg(count(lit(1)).as("n_members"))
    val pairStats = withinClusterPairs(assigned)
      .groupBy($"cid")
      .agg(count(lit(1)).as("n_pairs"),
           min($"cos_e4").as("min_cos_e4"),
           sum($"cos_e4").as("sum_cos_e4"),
           max($"cos_e4").as("max_cos_e4"))
    members.join(pairStats, Seq("cid"), "left")
      .select($"cid", $"n_members",
        coalesce($"n_pairs", lit(0L)).as("n_pairs"),
        $"min_cos_e4", $"sum_cos_e4", $"max_cos_e4")
      .orderBy($"cid")
  }

  /** The composed RAG serving path — the retrieval stack end-to-end in
    * ONE plan: hybrid dense⊕sparse RRF fusion ([[qSimHybrid]]) produces
    * the ranked hits, and the tiny hit list broadcasts against
    * `documents` for serving metadata — the per-request round trip a RAG
    * runtime executes, never shuffling the corpus (the fixture's
    * embedding vec_ids and doc_ids share an id space, the same bridge
    * [[qSimRetrieve]] uses for the dense-only path). */
  def qPipelineRag(spark: SparkSession, dir: String): DataFrame = {
    val hits = qSimHybrid(spark, dir)
    Tables.documents(spark, dir)
      .select($"doc_id".as("nb"), $"source", $"lang", $"n_chars")
      .join(broadcast(hits), Seq("nb"))
      .select($"qid", $"rank", $"nb", $"rrf_e6", $"rank_vec", $"rank_txt",
        $"source", $"lang", $"n_chars")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_rag"   -> qPipelineRag _,
    "q_dedup_semantic" -> qDedupSemantic _,
    "q_sim_diversity"  -> qSimDiversity _,
    "q_sim_mmr"        -> qSimMmr _,
    "q_sim_hybrid"     -> qSimHybrid _,
    "q_sim_topk"       -> qSimTopk _,
    "q_sim_centroid"   -> qSimCentroid _,
    "q_sim_assign"     -> qSimAssign _,
    "q_sim_neardup"    -> qSimNearDup _,
    "q_sim_lsh_bucket" -> qSimLshBucket _,
    "q_sim_lsh_verify" -> qSimLshVerify _,
    "q_sim_lsh_multi"  -> qSimLshMulti _,
    "q_sim_quantized"  -> qSimQuantized _,
    "q_sim_hamming"    -> qSimHamming _,
    "q_sim_ivf"        -> qSimIvf _,   // oracle-gated: exact side + recall verdict
    "q_sim_ivf_scaled" -> qSimIvfScaled _, // the >64-centroid broadcast-join path
    "q_sim_ivf_stats"  -> qSimIvfStats _,
    "q_sim_ivfpq"      -> qSimIvfPq _, // oracle-gated: exact side + recall verdict
    "q_sim_ivf_indexed" -> qSimIvfIndexed _, // stored-index probe + stored_ok verdict
    "q_sim_ivf_append" -> qSimIvfAppend _, // incremental append + stored_ok verdict
    "q_sim_ivf_merge" -> qSimIvfMerge _, // partition-wise merge + merge_ok verdict
    "q_sim_ivf_forget" -> qSimIvfForget _, // in-place erasure + forget_ok verdict
    "q_sim_ivf_forget_cert" -> qSimIvfForgetCert _, // raw-byte residue certificate
    "q_sim_gate"       -> qSimGate _,      // ANN novelty gate + agreement verdict
    "q_sim_ivf_compact" -> qSimIvfCompact _, // layout compaction + compact_ok verdict
    "q_sim_ivf_maintain" -> qSimIvfMaintain _, // scheduled maintenance + drift-retrain trigger
    "q_sim_ivf_retrain" -> qSimIvfRetrain _, // the deliberate rebuild the trigger recommends
    "q_sim_ivf_retrain_ab" -> qSimIvfRetrainAb _, // the act policy's audited recall A/B
    "q_sim_retrieve"   -> qSimRetrieve _,
  )

  // ---- DuckDB oracles ------------------------------------------------------

  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), z -> z[1] * z[2]))"

  private def sqlNorm(v: String): String =
    s"sqrt(list_sum(list_transform($v, x -> x * x)))"

  private def sqlPlane(p: Seq[Double]): String =
    p.map(d => java.lang.Double.toString(d)).mkString("[", ", ", "]")

  /** SQL twin of the Spark-side hyperplane bucket expression (over `v`). */
  private def sqlBucketExprFor(planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex
      .map { case (p, j) =>
        s"CASE WHEN ${sqlDot("v", sqlPlane(p))} > 0 THEN ${1L << j} ELSE 0 END"
      }
      .mkString(" + ")

  private def sqlBucketExpr: String = sqlBucketExprFor(Hyperplanes)

  /** Shared CTE prefix ending in `ranked(qid, nb, cos_e4, rank)` — the
    * brute-force top-k ranking both the topk listing and the retrieval
    * composition derive from. */
  // Parameterized over the corpus relation so the forget oracle can
  // recompute the exact side over `embeddings` minus the erased batch
  // with the SAME ranking SQL (one definition; a drift is impossible).
  private def sqlTopkCteFrom(rel: String): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM $rel),
        en AS (SELECT vec_id, v, ${sqlNorm("v")} AS nrm FROM e),
        scored AS (
          SELECT q.vec_id AS qid, n.vec_id AS nb,
            CAST(floor(${sqlDot("q.v", "n.v")} / (q.nrm * n.nrm) * 10000) AS BIGINT) AS cos_e4
          FROM en q JOIN en n ON q.vec_id < 10 AND q.vec_id <> n.vec_id),
        ranked AS (
          SELECT qid, nb, cos_e4,
            CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_e4 DESC, nb) AS BIGINT) AS rank
          FROM scored)"""
  private def sqlTopkCte: String = sqlTopkCteFrom("embeddings")

  /** Shared CTE prefix ending in `a(vec_id, v, cid, nrm)` — the
    * nearest-centroid assignment (twin of [[assignedFrame]] + norm) the
    * SemDeDup verdict and cohesion-audit oracles both build on; one copy
    * so a tie-break or quantization change cannot diverge them. */
  private def sqlAssignedCte: String =
    s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                   CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        comp AS (SELECT label, i AS pos,
                   CAST(sum(CAST(round(v[i] * 1000000) AS BIGINT)) AS DOUBLE)
                     / count(*) / 1000000.0 AS m
                 FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g
                 GROUP BY 1, 2),
        cent AS (SELECT label AS clabel, list(m ORDER BY pos) AS cv
                 FROM comp GROUP BY 1),
        scored AS (SELECT vec_id, v, clabel,
            list_sum(list_transform(list_zip(v, cv),
                                    z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d
          FROM e CROSS JOIN cent),
        best AS (SELECT vec_id, v, clabel AS cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS rn
          FROM scored),
        a AS (SELECT vec_id, v, cid, ${sqlNorm("v")} AS nrm
              FROM best WHERE rn = 1)"""

  /** The hybrid RRF fusion as a CTE chain ending in `fin` — shared by
    * the q_sim_hybrid oracle and the composed q_pipeline_rag oracle. */
  private def sqlHybridCte: String = {
    val w = TextHash.sqlTokens("text")
    val sh = TextHash.sqlShingles("w", graft.queries.Dedup.Shingle)
    s"""$sqlTopkCte,
          vecc AS (SELECT qid, nb, rank AS rank_vec FROM ranked
                   WHERE rank <= $HybridPool),
          tdoc AS (SELECT doc_id, $w AS w FROM documents),
          dsh AS (SELECT doc_id, $sh AS sh FROM tdoc),
          ex0 AS (SELECT doc_id, unnest(sh) AS s0 FROM dsh),
          exh AS (SELECT doc_id, ${TextHash.sqlH32("s0")} AS s FROM ex0),
          capped AS (
            SELECT doc_id, s FROM (
              SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM exh)
            WHERE df <= ${graft.queries.Dedup.MaxShingleDf}),
          exn AS (
            SELECT doc_id, s, count(*) OVER (PARTITION BY doc_id) AS n
            FROM capped),
          tp AS (
            SELECT a.doc_id AS qid, b.doc_id AS nb, count(*) AS common,
                   max(a.n) AS nq, max(b.n) AS nc
            FROM exn a JOIN exn b ON a.s = b.s
            WHERE a.doc_id < 10 AND a.doc_id <> b.doc_id
            GROUP BY 1, 2),
          txt AS (
            SELECT qid, nb, CAST(row_number() OVER (
                PARTITION BY qid
                ORDER BY common * 10000 // (nq + nc - common) DESC, nb)
              AS BIGINT) AS rank_txt
            FROM tp),
          txtk AS (SELECT * FROM txt WHERE rank_txt <= $HybridPool),
          fused AS (
            SELECT coalesce(v.qid, t.qid) AS qid, coalesce(v.nb, t.nb) AS nb,
              v.rank_vec, t.rank_txt,
              CAST(coalesce(1000000 // ($RrfK + v.rank_vec), 0)
                 + coalesce(1000000 // ($RrfK + t.rank_txt), 0) AS BIGINT)
                AS rrf_e6
            FROM vecc v FULL JOIN txtk t ON v.qid = t.qid AND v.nb = t.nb),
          fin AS (
            SELECT qid, nb, rank_vec, rank_txt, rrf_e6,
              CAST(row_number() OVER (
                PARTITION BY qid ORDER BY rrf_e6 DESC, nb) AS BIGINT) AS rank
            FROM fused)"""
  }

  val oracles: Map[String, String] = Map(
    "q_dedup_semantic" ->
      s"""$sqlAssignedCte,
          dup AS (SELECT DISTINCT y.vec_id
            FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
            WHERE floor(${sqlDot("x.v", "y.v")} / (x.nrm * y.nrm) * 10000)
              >= $NearDupE4)
          SELECT a.vec_id, cid, (dup.vec_id IS NULL) AS is_kept
          FROM a LEFT JOIN dup ON a.vec_id = dup.vec_id
          ORDER BY a.vec_id""",
    "q_sim_mmr" ->
      s"""$sqlTopkCte,
          cand AS (SELECT qid, nb, cos_e4 AS rel_e4 FROM ranked WHERE rank <= $MmrPool),
          cv AS (SELECT c.qid, c.nb, c.rel_e4, n.v AS nv, n.nrm AS nn
                 FROM cand c JOIN en n ON c.nb = n.vec_id),
          s1 AS (SELECT * FROM (
                   SELECT qid, nb, rel_e4 * 7 AS score, nv, nn,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY rel_e4 * 7 DESC, nb) AS rn FROM cv)
                 WHERE rn = 1),
          r2 AS (SELECT c.qid, c.nb, c.rel_e4, c.nv, c.nn,
                   CAST(floor(${sqlDot("c.nv", "s.nv")} / (c.nn * s.nn) * 10000)
                     AS BIGINT) AS sim1
                 FROM cv c JOIN s1 s ON c.qid = s.qid AND c.nb <> s.nb),
          s2 AS (SELECT * FROM (
                   SELECT qid, nb, rel_e4 * 7 - sim1 * 3 AS score, nv, nn,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY rel_e4 * 7 - sim1 * 3 DESC, nb) AS rn FROM r2)
                 WHERE rn = 1),
          r3 AS (SELECT c.qid, c.nb, c.rel_e4,
                   greatest(c.sim1,
                     CAST(floor(${sqlDot("c.nv", "b.nv")} / (c.nn * b.nn) * 10000) AS BIGINT))
                     AS maxsim
                 FROM r2 c
                 JOIN s2 b ON c.qid = b.qid AND c.nb <> b.nb),
          s3 AS (SELECT * FROM (
                   SELECT qid, nb, rel_e4 * 7 - maxsim * 3 AS score,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY rel_e4 * 7 - maxsim * 3 DESC, nb) AS rn FROM r3)
                 WHERE rn = 1)
          SELECT qid, CAST(1 AS BIGINT) AS rank, nb,
                 CAST(score AS BIGINT) AS mmr_score FROM s1
          UNION ALL
          SELECT qid, 2, nb, CAST(score AS BIGINT) FROM s2
          UNION ALL
          SELECT qid, 3, nb, CAST(score AS BIGINT) FROM s3
          ORDER BY qid, rank""",
    "q_pipeline_rag" ->
      // The hybrid fusion CTE chain verbatim (see q_sim_hybrid) + the
      // serving-metadata join — the composed oracle mirrors the composed
      // plan.
      s"""$sqlHybridCte,
          hits AS (SELECT qid, nb, rank, rank_vec, rank_txt, rrf_e6
                   FROM fin WHERE rank <= $TopK)
          SELECT h.qid, h.rank, h.nb, h.rrf_e6, h.rank_vec, h.rank_txt,
            d.source, d.lang, d.n_chars
          FROM hits h JOIN documents d ON h.nb = d.doc_id
          ORDER BY h.qid, h.rank""",
    "q_sim_hybrid" ->
      s"""$sqlHybridCte
          SELECT qid, rank, nb, rank_vec, rank_txt, rrf_e6
          FROM fin WHERE rank <= $TopK ORDER BY qid, rank""",
    "q_sim_diversity" ->
      s"""$sqlAssignedCte,
          members AS (SELECT cid, count(*) AS n_members FROM a GROUP BY 1),
          pairs AS (SELECT x.cid,
              CAST(floor(${sqlDot("x.v", "y.v")} / (x.nrm * y.nrm) * 10000)
                AS BIGINT) AS cos_e4
            FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id),
          ps AS (SELECT cid, count(*) AS n_pairs,
              min(cos_e4) AS min_cos_e4,
              CAST(sum(cos_e4) AS BIGINT) AS sum_cos_e4,
              max(cos_e4) AS max_cos_e4
            FROM pairs GROUP BY cid)
          SELECT m.cid, m.n_members,
            coalesce(ps.n_pairs, 0) AS n_pairs,
            ps.min_cos_e4, ps.sum_cos_e4, ps.max_cos_e4
          FROM members m LEFT JOIN ps ON m.cid = ps.cid
          ORDER BY m.cid""",
    "q_sim_centroid" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         SELECT CAST(label AS BIGINT) AS label, i AS pos,
           CAST(sum(CAST(round(v[i] * 1000000) AS BIGINT)) AS BIGINT) AS sum_c,
           count(*) AS n
         FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_sim_assign" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         comp AS (SELECT label, i AS pos,
                    CAST(sum(CAST(round(v[i] * 1000000) AS BIGINT)) AS DOUBLE)
                      / count(*) / 1000000.0 AS m
                  FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g
                  GROUP BY 1, 2),
         cent AS (SELECT label AS clabel, list(m ORDER BY pos) AS cv
                  FROM comp GROUP BY 1),
         scored AS (SELECT vec_id, label, clabel,
             list_sum(list_transform(list_zip(v, cv),
                                     z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d
           FROM e CROSS JOIN cent),
         best AS (SELECT vec_id, label, clabel,
             row_number() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS rn
           FROM scored)
         SELECT label, count(*) AS n,
           CAST(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS purity_e4
         FROM best WHERE rn = 1 GROUP BY label ORDER BY label""",
    "q_sim_topk" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4 FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    // The ANN queries emit the exact brute-force side + an aggregate recall
    // verdict (recallGated): DuckDB recomputes the exact rows and expects
    // recall_ok TRUE, so a degraded quantizer fails the hash gate even
    // though the probe result itself is not SQL-reproducible.
    "q_sim_ivf" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    // The scaled-quantizer probe shares q_sim_ivf's oracle contract: the
    // hashed rows are the exact brute-force side (SQL-recomputable), and
    // the broadcast-join plan's quality is the recall verdict — a
    // degraded or value-divergent join path fails the hash gate.
    "q_sim_ivf_scaled" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    // The health dashboard's oracle-comparable face: conservation of the
    // stored-list cardinality (recomputed from the corpus) plus the three
    // contract verdicts, expected healthy — the trained quantizer has no
    // static SQL equivalent, so the skew/SSE VALUES live in the public
    // operator (spec-pinned), not the hashed face.
    "q_sim_ivf_stats" ->
      s"""WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
          SELECT * FROM (
            SELECT 'list_skew' AS metric, CAST(NULL AS BIGINT) AS value,
              TRUE AS health_ok
            UNION ALL SELECT 'misassigned', CAST(0 AS BIGINT), TRUE
            UNION ALL SELECT 'quant_gain', CAST(NULL AS BIGINT), TRUE
            UNION ALL SELECT 'vectors_total', (SELECT n FROM c), TRUE)
          ORDER BY metric""",
    // The ANN novelty gate's exact side from first principles: best
    // stored (non-batch) neighbor per batch vector, min nb on cos ties;
    // the ANN-agreement verdict is TRUE on a healthy quantizer.
    "q_sim_gate" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          en AS (SELECT vec_id, v, ${sqlNorm("v")} AS nrm FROM e),
          s AS (
            SELECT q.vec_id AS qid, n.vec_id AS nb,
              CAST(floor(${sqlDot("q.v", "n.v")} / (q.nrm * n.nrm) * 10000)
                AS BIGINT) AS cos_e4
            FROM en q JOIN en n
            ON q.vec_id % 7 = 3 AND q.vec_id < 700 AND n.vec_id % 7 <> 3),
          best AS (SELECT qid, max(cos_e4) AS best_cos_e4 FROM s GROUP BY qid),
          pick AS (
            SELECT s.qid, min(s.nb) AS best_nb, b.best_cos_e4
            FROM s JOIN best b ON s.qid = b.qid AND s.cos_e4 = b.best_cos_e4
            GROUP BY s.qid, b.best_cos_e4)
          SELECT qid, best_nb, best_cos_e4,
            (best_cos_e4 < $NearDupE4) AS is_novel, TRUE AS gate_ok
          FROM pick ORDER BY qid""",
    "q_sim_ivfpq" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    "q_sim_ivf_indexed" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok, TRUE AS stored_ok
          FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    // Incremental append: same exact side; stored_ok pins the appended
    // index's probe to the one-pass assignment with the same quantizer.
    "q_sim_ivf_append" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok, TRUE AS stored_ok
          FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    // Partition-wise merge: same exact side; merge_ok pins the merged
    // index's probe to the one-pass whole-corpus assignment with the
    // adopted (senior) quantizer.
    "q_sim_ivf_merge" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok, TRUE AS merge_ok
          FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    // Forget: the exact side recomputes over the corpus MINUS the erased
    // batch; forget_ok pins the post-erasure probe to the base index's
    // (append->forget round trip).
    "q_sim_ivf_forget" ->
      s"""${sqlTopkCteFrom("(SELECT * FROM embeddings WHERE vec_id % 7 <> 3)")}
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok, TRUE AS forget_ok
          FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    // The certificate's oracle is the CONTRACT (zero residue), not a
    // recompute — the engine counts from the raw stored list files.
    "q_sim_ivf_forget_cert" ->
      """SELECT 'vectors' AS artifact, CAST(0 AS BIGINT) AS residual_rows,
            TRUE AS erased_ok""",
    // Compaction is a layout rewrite: same exact side; compact_ok pins
    // the compacted probe bit-identical to the pre-compaction probe plus
    // the file-count contract, expected TRUE.
    "q_sim_ivf_compact" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok, TRUE AS compact_ok
          FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    "q_sim_ivf_maintain" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok, TRUE AS maintain_ok
          FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    // Retrain re-partitions the same corpus: same exact side; retrain_ok
    // pins id conservation + bit-identity to a from-scratch rebuild +
    // healthy post-retrain stats, expected TRUE.
    "q_sim_ivf_retrain" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok, TRUE AS retrain_ok
          FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    // The act policy re-partitions (acted) or leaves (refused) the same
    // corpus — either way the exact side is unchanged; ab_ok pins the
    // ledger contract (one retrain_ab row matching the report, act/refuse
    // consequences on disk, no stale abort), expected TRUE.
    "q_sim_ivf_retrain_ab" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, TRUE AS recall_ok, TRUE AS ab_ok
          FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    "q_sim_retrieve" ->
      s"""$sqlTopkCte
          SELECT qid, rank, nb, cos_e4, source, n_chars
          FROM ranked JOIN documents ON nb = doc_id
          WHERE rank <= 3 ORDER BY qid, rank""",
    "q_sim_neardup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings WHERE vec_id < $NearDupMaxId),
          en AS (SELECT vec_id, v, ${sqlNorm("v")} AS nrm FROM e)
          SELECT a.vec_id AS va, b.vec_id AS vb,
            CAST(floor(${sqlDot("a.v", "b.v")} / (a.nrm * b.nrm) * 10000) AS BIGINT) AS cos_e4
          FROM en a JOIN en b ON a.vec_id < b.vec_id
          WHERE floor(${sqlDot("a.v", "b.v")} / (a.nrm * b.nrm) * 10000) >= $NearDupE4
          ORDER BY va, vb""",
    "q_sim_lsh_bucket" -> {
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          pb AS (SELECT vec_id, CAST($sqlBucketExpr AS BIGINT) AS bucket FROM e),
          sz AS (SELECT bucket, count(*) AS bucket_n FROM pb GROUP BY bucket)
          SELECT vec_id, pb.bucket, bucket_n
          FROM pb JOIN sz ON pb.bucket = sz.bucket
          ORDER BY vec_id"""
    },
    "q_sim_lsh_verify" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          en AS (SELECT vec_id, v, ${sqlNorm("v")} AS nrm,
                 CAST($sqlBucketExpr AS BIGINT) AS bucket FROM e)
          SELECT a.vec_id AS va, b.vec_id AS vb,
            CAST(floor(${sqlDot("a.v", "b.v")} / (a.nrm * b.nrm) * 10000) AS BIGINT) AS cos_e4
          FROM en a JOIN en b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          WHERE floor(${sqlDot("a.v", "b.v")} / (a.nrm * b.nrm) * 10000) >= $NearDupE4
          ORDER BY va, vb""",
    "q_sim_hamming" -> {
      def word(w: Int) = (0 until 32).map { j =>
        s"CASE WHEN embedding[${w * 32 + j + 1}] > 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH s AS (SELECT vec_id,
                       CAST(${word(0)} AS BIGINT) AS lo,
                       CAST(${word(1)} AS BIGINT) AS hi
                     FROM embeddings),
          q AS (SELECT vec_id AS qid, lo AS qlo, hi AS qhi FROM s
                WHERE vec_id < 10),
          sc AS (SELECT qid, s.vec_id AS nb,
                   CAST(bit_count(xor(qlo, lo)) + bit_count(xor(qhi, hi))
                     AS BIGINT) AS ham
                 FROM q JOIN s ON s.vec_id <> qid),
          r AS (SELECT qid, nb, ham,
                  CAST(row_number() OVER (
                    PARTITION BY qid ORDER BY ham, nb) AS BIGINT) AS rank
                FROM sc)
          SELECT qid, rank, nb, ham FROM r WHERE rank <= $TopK
          ORDER BY qid, rank""" },
    "q_sim_quantized" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          b AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
          qz AS (SELECT vec_id,
                   list_transform(
                     list_transform(v, x -> CASE WHEN mx = mn THEN 0.0
                       ELSE round((x - mn) * 255.0 / (mx - mn)) END),
                     c -> mn + c * (mx - mn) / 255.0) AS w
                 FROM b),
          en AS (SELECT vec_id, w, ${sqlNorm("w")} AS nrm FROM qz),
          scored AS (
            SELECT q.vec_id AS qid, n.vec_id AS nb,
              CAST(floor(${sqlDot("q.w", "n.w")} / (q.nrm * n.nrm) * 10000) AS BIGINT) AS cos_e4
            FROM en q JOIN en n ON q.vec_id < 10 AND q.vec_id <> n.vec_id),
          ranked AS (
            SELECT qid, nb, cos_e4,
              CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_e4 DESC, nb) AS BIGINT) AS rank
            FROM scored)
          SELECT qid, rank, nb, cos_e4 FROM ranked
          WHERE rank <= $TopK ORDER BY qid, rank""",
    "q_sim_lsh_multi" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          en AS (SELECT vec_id, v, ${sqlNorm("v")} AS nrm,
                 CAST(${sqlBucketExprFor(Hyperplanes)} AS BIGINT) AS b0,
                 CAST(${sqlBucketExprFor(Hyperplanes2)} AS BIGINT) AS b1 FROM e),
          cand AS (
            SELECT a.vec_id AS va, b.vec_id AS vb
            FROM en a JOIN en b ON a.b0 = b.b0 AND a.vec_id < b.vec_id
            UNION
            SELECT a.vec_id AS va, b.vec_id AS vb
            FROM en a JOIN en b ON a.b1 = b.b1 AND a.vec_id < b.vec_id)
          SELECT va, vb,
            CAST(floor(${sqlDot("a.v", "b.v")} / (a.nrm * b.nrm) * 10000) AS BIGINT) AS cos_e4
          FROM cand
          JOIN en a ON a.vec_id = va
          JOIN en b ON b.vec_id = vb
          WHERE floor(${sqlDot("a.v", "b.v")} / (a.nrm * b.nrm) * 10000) >= $NearDupE4
          ORDER BY va, vb""",
  )
}
