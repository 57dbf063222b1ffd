package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorSql._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers (as the build target demands):
  *  - [[bruteTopK]]: exact cosine top-k — probe set broadcast against the
  *    full corpus, per-probe partial top-k via window argmin. The baseline.
  *  - [[ivfTopK]]: IVF-style: corpus pre-partitioned into cells by nearest
  *    centroid (the SOM prototype table doubles as the coarse quantizer);
  *    probes scan only the `nprobe` nearest cells. At 100 TB the cell
  *    assignment is the only full pass; each query touches ~nprobe/K of the
  *    data, and the cell-assigned corpus can be bucketed/partitioned by cell
  *    on disk so a probe reads only its cells' files (partition pruning).
  *
  * Cosines are bit-identical with the DuckDB oracle (same left-to-right
  * folds) so top-k ordering with id tie-break needs no tolerance.
  */
object Similarity {

  /** Canonical near-dup cosine threshold — the ONE definition the batch
    * LSH pipeline, the streaming confirm ([[graft.streaming.EmbStream]]),
    * and the DuckDB oracles all read; a fork here is a silent batch/stream
    * hash divergence. */
  val MinCos = 0.3

  /** Norms are precomputed per side — one O(d) fold per VECTOR instead of
    * two per PAIR; the value is bit-identical to computing sqrt(dot(v,v))
    * inside the pair (same expression, same input), so the oracle needs no
    * change. */
  private def cosFromNorms(v: Column, p: Column, nv: Column, np: Column): Column =
    dotFast(v, p) / (nv * np)

  /** (vec_id, v) against (probe_id, p): exact top-k by cosine, per probe.
    * Self-pairs excluded.
    *
    * With `useHeapOperator` (requires [[graft.plans.TopKPerKeyStrategy]] on
    * the session) the per-probe top-k runs through the custom heap operator:
    * the data-scale candidate stream is pruned to k rows per (probe,
    * partition) BEFORE any exchange, and only the ≤k·|probes| survivors pay
    * the rank window — instead of shuffling and fully sorting every
    * candidate row per probe. Identical output either way. */
  def bruteTopK(points: DataFrame, probes: DataFrame, k: Int,
                useHeapOperator: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    val cands = points.withColumn("nv", norm2Fast(col("v")))
      .crossJoin(broadcast(probes.withColumn("np", norm2Fast(col("p")))))
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosFromNorms(col("v"), col("p"), col("nv"), col("np")).as("cos"))
    val top =
      if (useHeapOperator)
        graft.plans.TopKPerKey.topKPerKey(cands, Seq(col("probe_id")),
          Seq(col("cos").desc, col("vec_id").asc), k)
      else cands
    top.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Metadata-filtered exact ANN: top-k restricted to vectors that pass a
    * metadata predicate, PRE-filtered — no distance is ever computed for a
    * vector that fails the filter. Two filter shapes composed:
    *  - `allowed` (an id allow-list, e.g. docs passing a lang/quality
    *    predicate in another table): a left-semi join on the vector key.
    *    At 100 TB this is the co-keyed semi-join shape (or the predicate
    *    lives in-row and pushes to the scan); post-filtering top-k instead
    *    would silently return < k rows whenever survivors are sparse.
    *  - the probe's own `label` (same-category search): an equi-JOIN key
    *    against the broadcast probe table, so Catalyst hash-matches label
    *    inside the broadcast join — only same-label pairs reach the cosine.
    * Survivors then take the same heap-operator top-k path as [[bruteTopK]].
    *
    * `points`: (vec_id, v, label); `probes`: (probe_id, p, plabel);
    * `allowed`: single-column id allow-list. */
  def filteredTopK(points: DataFrame, probes: DataFrame, allowed: DataFrame,
                   k: Int, useHeapOperator: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    val aid = allowed.columns.head
    val flt = points.join(allowed,
      points("vec_id") === allowed(aid), "left_semi")
    val cands = flt.withColumn("nv", norm2Fast(col("v")))
      .join(broadcast(probes.withColumn("np", norm2Fast(col("p")))),
        col("label") === col("plabel"))
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosFromNorms(col("v"), col("p"), col("nv"), col("np")).as("cos"))
    val top =
      if (useHeapOperator)
        graft.plans.TopKPerKey.topKPerKey(cands, Seq(col("probe_id")),
          Seq(col("cos").desc, col("vec_id").asc), k)
      else cands
    top.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** IVF top-k: points pre-assigned to `cell` (nearest centroid), probes scan
    * the nprobe nearest cells only.
    * @param assigned (vec_id, v, cell)
    * @param centroids (cell, c) — small, broadcast
    * @param probes (probe_id, p) */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    // probe → nprobe nearest cells (tiny cross join, all broadcast-side)
    val cellRank = Window.partitionBy(col("probe_id")).orderBy(col("cd2"), col("cell"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .select(col("probe_id"), col("p"), col("cell"), sqDistFast(col("p"), col("c")).as("cd2"))
      .withColumn("crn", row_number().over(cellRank))
      .where(col("crn") <= nprobe)
      .select(col("probe_id"), col("p"), col("cell"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    assigned.withColumn("nv", norm2Fast(col("v")))
      .join(broadcast(probeCells.withColumn("np", norm2Fast(col("p")))), "cell")
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosFromNorms(col("v"), col("p"), col("nv"), col("np")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** MULTI-PROBE IVF for cosine search, via WRITE-SIDE SPILLING (the
    * ScaNN/SOAR multi-assignment shape): every vector is assigned to its
    * `spill` nearest cells BY DIRECTION, the query probes its `nprobe`
    * nearest cells, and a neighbor is found when the probe's view OR the
    * vector's view of a cell boundary agree — the union covers exactly the
    * boundary cases a single-assigned fixed-nprobe index loses.
    *
    * Two measured design decisions (sf0.01 corpus, 9-cell quantizer,
    * budget = the fixed nprobe=2 config's ~555 scanned rows):
    *  - QUERY-side adaptive probing carries no signal here: allocating the
    *    same cell budget globally by centroid-gap order (probe more cells
    *    where the 2nd/3rd centroids are near-tied — classic multi-probe
    *    LSH) measured recall@10 0.92, exactly the fixed config, because
    *    the direction-random embeddings put stragglers at centroid ranks
    *    4–8 where no query-side ordering reaches them at budget.
    *  - The quantizer must be SPHERICAL for a cosine metric: euclidean
    *    assignment sends small-norm vectors to direction-irrelevant cells
    *    (the measured stragglers had top-decile-SMALL residuals — well
    *    quantized in L2, uselessly for cosine). Spherical single-assignment
    *    alone lifts nearest-cell recall 0.82 → 0.90; adding spill = 2
    *    reaches 1.0 at nprobe = 1 — 539 scanned rows vs the fixed config's
    *    555 (budget parity: nprobe·spill cell-equivalents = the fixed
    *    config's nprobe).
    *
    * Scale: the index is `spill`× larger (the documented storage trade);
    * scanned rows per probe ≈ nprobe·spill·N/K — set (nprobe, spill)
    * against the same budget as a single-assigned config. Assignment and
    * probing are the same broadcast cross-join + partitioned-window shapes
    * as [[ivfTopK]]; DISTINCT dedups the (probe, vec) pairs a vector
    * reachable through two probed cells would double-score. */
  def ivfTopKSpill(points: DataFrame, centroids: DataFrame,
                   probes: DataFrame, k: Int, nprobe: Int, spill: Int): DataFrame = {
    def cosCols(v: Column, c: Column) =
      dotFast(v, c) / (norm2Fast(v) * norm2Fast(c))
    val vrnW = Window.partitionBy(col("vec_id")).orderBy(col("vcos").desc, col("cell"))
    val spilled = points.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("cell"),
        cosCols(col("v"), col("c")).as("vcos"))
      .withColumn("vrn", row_number().over(vrnW))
      .where(col("vrn") <= spill)
      .select(col("vec_id"), col("v"), col("cell"))
    val crnW = Window.partitionBy(col("probe_id")).orderBy(col("pcos").desc, col("cell"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .select(col("probe_id"), col("p"), col("cell"),
        cosCols(col("p"), col("c")).as("pcos"))
      .withColumn("crn", row_number().over(crnW))
      .where(col("crn") <= nprobe)
      .select(col("probe_id"), col("p"), col("cell"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    spilled.withColumn("nv", norm2Fast(col("v")))
      .join(broadcast(probeCells.withColumn("np", norm2Fast(col("p")))), "cell")
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosFromNorms(col("v"), col("p"), col("nv"), col("np")).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Deterministic sign-random-projection hyperplane `j` (64-dim): integer
    * components `(md5_60("j:i") mod 19) - 9` — the text family's md5-prefix
    * trick, evaluable bit-identically by a SQL oracle
    * (`('0x'||substr(md5(...),1,15))::BIGINT`). Crypto mixing matters here:
    * a linear-congruential formula makes the planes residue-shifts of each
    * other, correlated sign bits collide band keys ~100× above the random
    * baseline, and the near-linear candidate growth is lost. */
  def hyperplane(j: Int, dim: Int = 64): Array[Double] =
    Array.tabulate(dim) { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      ((java.lang.Long.parseLong(hex, 16) % 19) - 9).toDouble
    }

  /** Corpus-sized band width: the band-key space must grow with N or every
    * bucket's population — and with it the candidate join — goes quadratic
    * (an 8-bit key space saturates at a few thousand vectors: measured 6M+
    * candidate pairs on a 20k-vector corpus). `ceil(log2 n) + 2` keeps the
    * EXPECTED random-collision count per band ~n/4: linear in n, like
    * [[graft.queries.SimilarityQueries.centroidCount]]'s √N cells. Integer
    * bit-length arithmetic (no libm log — a 1-ulp flip at a power of two
    * would desync the two engines); the oracle twin is
    * `GREATEST(8, LENGTH(BIN(n - 1)) + 2)`. */
  def bitsPerBand(n: Long): Int = {
    val blen = if (n <= 1L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    math.max(8, blen + 2)
  }

  /** Hyperplane-LSH band keys for (vec_id, v): `nBits` sign bits (one codegen
    * dot per hyperplane, single scan, no shuffle), pigeonhole-packed into
    * `bands` integer keys → one (vec_id, band, key) row per band.
    *
    * Scale: this is the near-LINEAR path for embedding near-dup — candidates
    * come from equi-joining band keys, so work is Σ bucket², bounded by the
    * duplicate structure instead of the ~N^1.5 blocked all-pairs of
    * [[nearestInCell]]. Wider bands (bits/band) push random collisions
    * toward zero at the cost of recall on low-cosine pairs — size them to
    * the corpus with [[bitsPerBand]]. */
  def lshSignBands(points: DataFrame, nBits: Int = 64, bands: Int = 8,
                   carry: Seq[String] = Nil): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    val bpb = nBits / bands
    require(bpb <= 62, "band keys are packed into a long")
    val bitCols = (0 until nBits).map { j =>
      val w = array(hyperplane(j).map(lit): _*)
      (dotFast(col("v"), w) > 0.0).cast("int").as(s"bit_$j")
    }
    // `carry` columns (e.g. the vector itself, for a streaming confirm)
    // ride along unchanged — ONE definition of the bit/key construction
    // for the batch and streaming pipelines, so they can't drift
    val withBits = points.select((col("vec_id") +: carry.map(col)) ++ bitCols: _*)
    val keyCols = (0 until bands).map { b =>
      (0 until bpb).map(t => col(s"bit_${b * bpb + t}").cast("long") * lit(1L << t))
        .reduce(_ + _).as(s"key_$b")
    }
    withBits.select((col("vec_id") +: carry.map(col)) :+
      posexplode(array(keyCols: _*)).as(Seq("band", "key")): _*)
  }

  /** Hyperplane-LSH embedding near-dup: pairs sharing ≥1 band key, confirmed
    * by EXACT cosine ≥ minCos. The banding join touches only colliding
    * buckets; the confirm join touches only candidate pairs — never an
    * all-pairs product at any stage. */
  def lshNearDupPairs(points: DataFrame, minCos: Double,
                      nBits: Int = 64, bands: Int = 8): DataFrame = {
    // localCheckpoint: sigs self-join + the two confirm joins would
    // recompute the 64 dot products per side otherwise
    val sigs = lshSignBands(points, nBits, bands).localCheckpoint(eager = true)
    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val pn = points.withColumn("nrm", norm2Fast(col("v")))
    cand
      .join(pn.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na")), "vec_a")
      .join(pn.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        cosFromNorms(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .where(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Product-quantization encode (ann_pq): `v` split into `d/subDims`
    * subspaces; per subspace the index of the nearest codebook subvector
    * (same sqdist fold as the IVF assignment; ties keep the lower code id).
    * The codebook is a driver-side constant — `cb.length` × d doubles,
    * bounded by construction, never data-scale — embedded in the codegen
    * [[graft.functions.PqEncode]] kernel as a reference object, so encoding
    * is ONE in-scan expression: no shuffle, no explode, O(1) generated code
    * even at the classic 256-code config, and a 100 TB corpus encodes in
    * the same scan that reads it. Returns array<int> of `d/subDims` codes
    * (8-bit range at 256 codes → 8 bytes/vec persisted, 32× smaller than
    * the float32 corpus). */
  def pqCodes(v: Column, cb: Array[Array[Double]], subDims: Int): Column =
    graft.functions.PqExpressions.pqEncode(v, cb, subDims)

  /** PQ reconstruction ẑ: per subspace the chosen code's subvector,
    * concatenated back to d dims ([[graft.functions.PqReconstruct]]). The
    * ADC score dot(ẑ, probe) is then the same d-wide left-to-right fold
    * every other similarity entry shares — bit-identical in DuckDB, which
    * is what keeps the approximate tier under the hash gate (classically
    * ADC sums per-subspace LUT hits; the reconstruction form is the same
    * value with ONE portable fold order). */
  def pqRecon(codes: Column, cb: Array[Array[Double]], subDims: Int): Column =
    graft.functions.PqExpressions.pqReconstruct(codes, cb, subDims)

  /** Within-cell confirmed pair graph above `minCos` — the SemDeDup
    * candidate step: the quantizer blocks the all-pairs (a "semantic
    * duplicate" of v lands in v's cell for any τ worth deduping at), so
    * total pair work is Σ cell² ≈ N^1.5 with the √N-scaled cell count,
    * never the global N². Emits each unordered pair once (a < b).
    * @param assigned (vec_id, v, cell, …) */
  def semanticPairs(assigned: DataFrame, minCos: Double): DataFrame = {
    val an = assigned.select(col("vec_id"), col("v"), col("cell"))
      .withColumn("nrm", norm2Fast(col("v"))).localCheckpoint(eager = true)
    an.as("a").join(an.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"),
        cosFromNorms(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos"))
      .where(col("cos") >= minCos)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Directed top-`m` kNN edges from candidate pair KEYS: one cosine per
    * distinct pair (keys deduped BEFORE vectors join — never carry 64-dim
    * payloads through a data-scale DISTINCT, the lesson the sf1 oracle
    * spill taught), then the per-src rank cut. */
  private def directedTopM(candKeys: DataFrame, points: DataFrame, m: Int): DataFrame =
    directedTopMCos(candKeys, points, m).select(col("src"), col("dst"))

  /** [[directedTopM]] keeping the winning cosine — the NND reverse-degree
    * cap ranks reverse edges by it. */
  private def directedTopMCos(candKeys: DataFrame, points: DataFrame, m: Int): DataFrame = {
    val pn = points.withColumn("nrm", norm2Fast(col("v")))
      .select(col("vec_id"), col("v"), col("nrm"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    candKeys
      .join(pn.select(col("vec_id").as("src"), col("v").as("va"), col("nrm").as("na")), "src")
      .join(pn.select(col("vec_id").as("dst"), col("v").as("vb"), col("nrm").as("nb")), "dst")
      .select(col("src"), col("dst"),
        cosFromNorms(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= m)
      .select(col("src"), col("dst"), col("cos"))
  }

  /** Distinct directed same-cell pair keys of a spilled assignment. */
  private def cellPairKeys(spilled: DataFrame): DataFrame =
    cellPairKeysFrom(spilled, spilled)

  /** [[cellPairKeys]] with the SRC side restricted to `srcSide`'s rows —
    * the manual semi-join pushdown [[knnGraphDeleteIncremental]] needs:
    * filtering the a-side BEFORE the pair join is set-identical to
    * semi-joining the enumerated pairs on src afterwards (the filter is on
    * the join's own src key; distinct commutes with it), but enumerates
    * |srcSide|·cellsize pairs instead of the full Σcell² (r17 — the
    * optimizer does not push a semi join below the self-join + distinct,
    * so "delete-sized work" was only true of the scoring, not the pair
    * enumeration). */
  private def cellPairKeysFrom(srcSide: DataFrame, spilled: DataFrame): DataFrame = {
    val slim = spilled.select(col("vec_id"), col("cell"))
    val a = srcSide.select(col("vec_id"), col("cell"))
    a.as("a").join(slim.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
      .distinct() // a pair reachable through two shared cells counts once
  }

  /** Directed top-M edges of a spilled assignment — the carried artifact
    * of [[knnGraphEdgesIncremental]] (symmetrization happens at serve
    * time; the carry must stay directed or mergeability breaks). */
  def knnGraphDirected(spilled: DataFrame, m: Int): DataFrame = {
    // one vector row per id (the spill multi-assigns): dedupe BEFORE the
    // pair join so a pair isn't scored twice and rank positions stay true
    val pts = spilled.select(col("vec_id"), col("v")).dropDuplicates("vec_id")
    directedTopM(cellPairKeys(spilled), pts, m)
  }

  /** GRAPH-ANN build (r8 verdict #7): the kNN-graph base layer of the
    * NSW/DiskANN family, built DISTRIBUTED — each node's top-`m` cosine
    * neighbors among candidates sharing a spilled spherical cell (the
    * multiprobe index's boundary-loss mitigation applied to graph
    * construction: a true neighbor across a cell seam is still a candidate
    * through the second assignment), then symmetrized (undirected edges,
    * the NSW convention). This is the production shape: a sequential
    * insert-order HNSW build is inherently serial, but the kNN-graph +
    * beam-walk family serves the same role and every stage here is a
    * Spark join/agg — candidate work is Σ cell² with √N-scaled cells
    * (~N^1.5, the [[semanticPairs]] bound), never global N².
    * @param spilled (vec_id, v, cell) — multi-assigned corpus
    * @return (src, dst) undirected edge list, both directions present */
  def knnGraphEdges(spilled: DataFrame, m: Int): DataFrame = {
    val top = knnGraphDirected(spilled, m)
    top.union(top.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** NN-DESCENT kNN-graph construction (r9 verdict #1) — the LINEAR-TIME
    * 100 TB alternative to [[knnGraphEdges]]'s cell-blocked Σcell² ≈ N^1.5
    * build, which was the catalog's one super-linear sf10 row (421 s at
    * ×100). Classic NN-descent ("Efficient k-nearest neighbor graph
    * construction for generic similarity measures", Dong et al., WWW'11)
    * relies on sampled randomness; this is its DETERMINISTIC, fully
    * oracle-replayable Spark form:
    *
    *  1. INIT — a ring over each spilled cell's membership: members
    *     ordered by vec_id, node at position j proposes positions
    *     j+1 … j+`initDeg` (mod cellsize) as candidates. O(N·spill·initDeg)
    *     candidate keys from pure window arithmetic — no pair blow-up, no
    *     RNG — already direction-LOCAL because the cell is (the id-ring
    *     inside a cell is as good as the random sample the paper starts
    *     from), then top-`m` per src by exact cosine.
    *  2. ROUNDS — `rounds` × (neighbor-of-neighbor ∪ fresh ring window):
    *     with U = current edges ∪ reversed, candidates(a) =
    *     { c : a→b, b→c ∈ U } ∪ ring offsets t·initDeg+1 … (t+1)·initDeg,
    *     re-ranked together with the carried edges to a new top-`m`. The
    *     ROTATING ring window is the deterministic stand-in for the
    *     paper's per-round random sampling ρ — measured necessary here:
    *     on a direction-random corpus the NoN transitivity signal alone
    *     plateaus (serve recall 0.90 after any number of pure-NoN
    *     rounds), because "neighbor of my neighbor" carries little
    *     information when cosines have no cluster structure; each round's
    *     fresh cell slice restores the exploration the random sample
    *     provides. `initDeg` is the caller's knob for how much: the
    *     serving entry passes m × (bitlen(N)/2) — a LOG-GROWING window
    *     (the [[bitsPerBand]] integer-arithmetic discipline), because a
    *     FIXED window's sampled cell fraction shrinks as cells grow √N
    *     and measured serve recall decays with it (sf0.1: 0.74 fixed vs
    *     1.0 blocked). Total work O(N·rounds·(spill·initDeg + (2m)²)) =
    *     O(N·log N) — still far under the blocked build's N^1.5.
    *
    * Every stage is a Spark join/window over (src, dst) keys; vectors join
    * in only at scoring ([[directedTopM]]'s dedupe-keys-first discipline).
    * Per-round localCheckpoint keeps the plan flat (the walk convention).
    * AnnRecallSpec pins serve-walk recall@10 ≥ 0.95 over the NND graph.
    * MEASURED (BASELINE.md "Round-11: NND build growth law", same
    * box/session): crossover vs the blocked build is below sf1 (20k
    * vectors: 40.2 s vs 63.6 s); sf1→sf10 growth 15.7× on ×10 data
    * (≈ the 12.9× N·log N prediction from the ring window's bitlen
    * 15→18) vs the blocked build's 34.9× — which at sf10 did not
    * finish at all this round (ENOSPC in the Σcell² pair-shuffle
    * spill) while this build completed in 631.7 s.
    * @param spilled (vec_id, v, cell) multi-assigned corpus
    * @param points (vec_id, v)
    * @return (src, dst) undirected edge list, both directions present */
  def knnGraphEdgesNnd(spilled: DataFrame, points: DataFrame, m: Int,
                       initDeg: Int, rounds: Int): DataFrame =
    symEdges(knnGraphDirectedNnd(spilled, points, m, initDeg, rounds))

  /** [[knnGraphEdgesNnd]] BEFORE symmetrization — the directed top-M
    * artifact a day-zero NND build hands to
    * [[knnGraphEdgesIncremental]]: the delta-merge rule is
    * build-agnostic (it re-ranks whatever directed edges are carried
    * against the delta-touching pair keys), so the measured-linear NND
    * cold start composes with increment-sized dailies —
    * `ann_nsw_nnd_delta` is that composition under its own hash gate,
    * and NndGraphSpec pins that compounding two delta batches equals
    * applying them at once over this artifact. */
  def knnGraphDirectedNnd(spilled: DataFrame, points: DataFrame, m: Int,
                          initDeg: Int, rounds: Int): DataFrame =
    nndDescent(spilled, points, m, initDeg, rounds, epsPpm = None)._1

  private def symEdges(e: DataFrame): DataFrame =
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()

  /** Symmetrized serve view of a DIRECTED top-M artifact (r17): callers
    * that share one directed build across entries (serve + GDPR carry the
    * same artifact) symmetrize it here instead of re-running the build —
    * `knnGraphEdges(spilled, m) == knnGraphEdgesOf(knnGraphDirected(spilled, m))`
    * by definition. */
  def knnGraphEdgesOf(directed: DataFrame): DataFrame = symEdges(directed)

  /** CONVERGENCE-DRIVEN [[knnGraphEdgesNnd]] (r10 verdict #8) — the
    * parameter-free form: instead of a fixed round count, rounds run
    * until the previous round's NEW directed edge count (the `nw` frame
    * the flagged-NoN optimization already materializes) falls below
    * `epsPpm` parts-per-million of the N·m directed-edge capacity, or
    * `maxRounds` is hit. Integer ppm knob — the [[bitsPerBand]]
    * no-floating-knob discipline. Returns (edges, realized round count):
    * a caller that must stay oracle-replayable replays the REALIZED
    * count as a literal — NndGraphSpec asserts converged(eps) equals the
    * fixed-round build at its own realized count bit-for-bit, which is
    * exactly the replay seam. MEASURED (NndGraphSpec prints the
    * trajectories): the converged count is CORPUS-DEPENDENT — 2 rounds
    * on a clustered corpus (NoN transitivity closes the graph fast;
    * round 3 changes nothing there), 5 on the direction-random floor at
    * n=500 (structureless residual churn decays slowly, and the extra
    * rounds buy no serve recall — AnnRecallSpec's bar holds at 3). The
    * catalog therefore keeps `NndRounds` = 3 pinned by the RECALL bar,
    * and this variant is the parameter-free option for corpora where
    * measuring beats pinning. The convergence check costs one count per
    * round on an already-checkpointed frame. */
  def knnGraphEdgesNndConverged(spilled: DataFrame, points: DataFrame, m: Int,
                                initDeg: Int, maxRounds: Int,
                                epsPpm: Long = NndEpsPpm): (DataFrame, Int) = {
    val (e, realized, _) = nndDescent(spilled, points, m, initDeg, maxRounds, Some(epsPpm))
    (symEdges(e), realized)
  }

  /** [[knnGraphEdgesNndConverged]] also returning the per-round
    * new-directed-edge ppm trajectory (element i = the nw share examined
    * at the top of round i+1; the first element is the whole init) —
    * NndGraphSpec prints it, and it is what [[NndEpsPpm]] was read off. */
  private[graft] def knnGraphEdgesNndTrace(spilled: DataFrame, points: DataFrame,
                                           m: Int, initDeg: Int, maxRounds: Int,
                                           epsPpm: Long): (DataFrame, Int, Seq[Long]) = {
    val (e, realized, trace) =
      nndDescent(spilled, points, m, initDeg, maxRounds, Some(epsPpm))
    (symEdges(e), realized, trace)
  }

  /** Default convergence threshold for [[knnGraphEdgesNndConverged]]:
    * stop when a round changes fewer than 2% of the N·m directed edges.
    * Measured trajectories (new-edge ppm at the top of rounds 1, 2, …;
    * NndGraphSpec reproduces them): clustered n=3200 —
    * 1e6, 548750, 0 (converged after round 2); direction-random n=500 —
    * 1e6, 445500, 147000, 67000, 36000, 14000 (converged after round 5,
    * but rounds 4–5 are structureless churn that does not move serve
    * recall). 2% separates "the graph is still moving" from that
    * residual-churn tail without chasing it. */
  val NndEpsPpm = 20000L

  private def nndDescent(spilled: DataFrame, points: DataFrame, m: Int,
                         initDeg: Int, rounds: Int,
                         epsPpm: Option[Long]): (DataFrame, Int, Seq[Long]) = {
    val pts = points.select(col("vec_id"), col("v")).dropDuplicates("vec_id")
    val posW = Window.partitionBy(col("cell")).orderBy(col("vec_id"))
    val mem = spilled.select(col("vec_id"), col("cell"))
      .withColumn("pos", row_number().over(posW) - 1)
      .localCheckpoint(eager = true)
    val sz = mem.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    // round t's fresh cell slice: ring offsets t·initDeg+1 … (t+1)·initDeg.
    // `o < n` pins offset == modular ring distance, so the oracle can
    // replay the window as a modular-distance BAND JOIN (its Σcell² scan
    // is oracle-only; this side stays O(N·initDeg) explode + equi-join) —
    // and a window past the cell size proposes nothing on both sides.
    def ringKeys(t: Int): DataFrame = mem.join(sz, "cell")
      .select(col("cell"), col("vec_id").as("src"), col("pos"), col("n"),
        explode(array((t * initDeg + 1 to (t + 1) * initDeg).map(lit): _*))
          .as("o"))
      .where(col("o") < col("n"))
      .select(col("cell"), col("src"),
        ((col("pos") + col("o")) % col("n")).as("tpos"))
      .join(mem.select(col("cell"), col("vec_id").as("dst"),
        col("pos").as("tpos")), Seq("cell", "tpos"))
      .where(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    def rev(df: DataFrame): DataFrame =
      df.select(col("dst").as("src"), col("src").as("dst"))
    // edge capacity for the convergence ratio (only paid in eps mode)
    lazy val capacity = pts.count() * m
    var prev: DataFrame = null // e(t-2), for the new-edge flag
    var e = directedTopM(ringKeys(0), pts, m).localCheckpoint(eager = true)
    var realized = 0
    var t = 1
    var stop = false
    val ppmTrace = scala.collection.mutable.ListBuffer.empty[Long]
    while (t <= rounds && !stop) {
      // FLAGGED NoN (the paper's incremental rule): only pairs with at
      // least one hop through an edge NEW this round are examined. This
      // is RESULT-IDENTICAL to the full NoN — an old-old pair (a→b, b→c
      // both carried from round t-1) was already a candidate in round
      // t-1 and lost to e(t-1)'s top-m; since e(t-1) is still in the
      // candidate set, re-examining it cannot enter the top-m. The
      // ORACLE computes the UNFLAGGED form, so the hash gate itself
      // proves the equivalence at every SF. Late rounds then pay
      // new-edge-sized NoN work instead of the full (2m)² per node.
      // left_anti, not except: e's rows are distinct by construction (each
      // (src,dst) is scored once and ranked once), so the anti join is the
      // same set — and it skips except's extra dedup exchange (guide §2.4)
      val nw = (if (prev == null) e
                else e.join(prev, Seq("src", "dst"), "left_anti"))
        .localCheckpoint(eager = true)
      // eps mode: round t-1 changed < epsPpm ppm of the N·m capacity →
      // converged; skip this round (checked on the nw the flagged NoN
      // needs anyway — prev==null means nw is the whole init, never small)
      val nwPpm = epsPpm.map(_ => nw.count() * 1000000L / capacity)
      nwPpm.foreach(ppmTrace += _)
      if (epsPpm.exists(eps => prev != null && nwPpm.get < eps)) {
        stop = true
      } else {
        val u = e.union(rev(e)).distinct().localCheckpoint(eager = true)
        val nwu = nw.union(rev(nw)).distinct()
        val non = nwu.as("a").join(u.as("b"), col("a.dst") === col("b.src"))
          .select(col("a.src").as("src"), col("b.dst").as("dst"))
          .unionByName(
            u.as("a").join(nwu.as("b"), col("a.dst") === col("b.src"))
              .select(col("a.src").as("src"), col("b.dst").as("dst")))
          .where(col("src") =!= col("dst"))
        val cand = e.unionByName(non).unionByName(ringKeys(t)).distinct()
        prev = e
        e = directedTopM(cand, pts, m).localCheckpoint(eager = true)
        realized = t
        t += 1
      }
    }
    (e, realized, ppmTrace.toList)
  }

  /** INCREMENTAL kNN-graph maintenance (the `ann_ivf_delta` discipline on
    * the graph tier): yesterday's DIRECTED top-M edges are carried; the
    * delta contributes only the pair keys that involve a NEW vector
    * (new→member and member→new through the FROZEN spilled cells). Because
    * top-M is mergeable — topM(old_all ∪ new) = topM(topM(old_all) ∪ new)
    * — re-ranking the carried edges against the new candidates yields
    * EXACTLY the full-rebuild graph (KnnGraphDeltaSpec asserts edge-set
    * equality), at delta-sized cost: |Δ|·cellsize pair work + one re-rank
    * over (N·m + Δ·cellsize) rows, never the N^1.5 rebuild. This is what
    * amortizes the build at 100 TB: the corpus-scale construction runs
    * once; each day pays its increment.
    * @param spilledOld / spilledNew frozen-quantizer assignments
    * @param oldDirected yesterday's directed top-M (src, dst) */
  def knnGraphEdgesIncremental(spilledOld: DataFrame, spilledNew: DataFrame,
                               oldDirected: DataFrame, points: DataFrame,
                               m: Int): DataFrame =
    symEdges(knnGraphDirectedIncremental(spilledOld, spilledNew, oldDirected,
      points, m))

  /** [[knnGraphEdgesIncremental]] BEFORE symmetrization — the directed
    * top-M artifact a deployment CARRIES between days (symmetrization is
    * a serve-time view). Exposed so increments can COMPOUND: applying
    * tomorrow's delta to today's directed result equals applying both
    * deltas at once (top-M mergeability — NndGraphSpec pins it over an
    * NND day-zero artifact), so dailies never drift from the one-shot
    * merge. */
  def knnGraphDirectedIncremental(spilledOld: DataFrame, spilledNew: DataFrame,
                                  oldDirected: DataFrame, points: DataFrame,
                                  m: Int): DataFrame = {
    val slimOld = spilledOld.select(col("vec_id"), col("cell"))
    val slimNew = spilledNew.select(col("vec_id"), col("cell"))
    val all = slimOld.unionByName(slimNew)
    val newIn = slimNew.as("a").join(all.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
    val candKeys = oldDirected.select(col("src"), col("dst"))
      .unionByName(newIn)
      .unionByName(newIn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val pts = points.select(col("vec_id"), col("v")).dropDuplicates("vec_id")
    directedTopM(candKeys, pts, m)
  }

  /** GRAPH-ANN serve: fixed-step BEAM WALK over [[knnGraphEdges]] — from
    * the `entryIds` entry nodes, each of `steps` rounds expands the
    * current top-`beam` visited nodes' edges, scores the newly reached
    * nodes exactly, and keeps the union; final answer is the exact top-k
    * of everything visited. Deterministic (deterministic entries, fixed
    * unroll, total-ordered ranks) and oracle-replayable as `steps`
    * unrolled CTEs — no recursion, the som_fit5 discipline. THE SCALE
    * PROPERTY the graph tier buys: walk cost is O(steps·beam·m) per probe
    * — independent of corpus size — vs the IVF family's nprobe·N/K scan;
    * the graph (N·m edges) lives partitioned by src and each expansion is
    * an equi-join on it. Visited frames are probe-bounded
    * (≤ probes·steps·beam·m rows); each round localCheckpoints to keep
    * the plan flat.
    *
    * Entry QUALITY is the caller's contract: `entryIds` must be spread
    * across the corpus's direction space or a clustered corpus strands
    * the walk in the entries' region (NswEntrySpec plants exactly that
    * corpus) — the serving entries derive them by spherical maximin
    * ([[Kmeans.maximinSeeds]]), never by row order.
    * @param points (vec_id, v); probes (probe_id, p);
    * @param entryIds single-column (vec_id) entry nodes, ≤ a few rows */
  def nswTopK(edges: DataFrame, points: DataFrame, probes: DataFrame,
              entryIds: DataFrame, k: Int, beam: Int, steps: Int): DataFrame = {
    val entryPairs = probes.select(col("probe_id"))
      .crossJoin(entryIds.select(col("vec_id")))
    rankVisited(nswWalkVisited(edges, points, probes, entryPairs, beam, steps), k)
  }

  /** [[nswTopK]] with PER-PROBE entry nodes — the serve shape of the
    * two-layer walk ([[graft.queries.SimilarityQueries.annNswHier]]):
    * the caller derives each probe's own entries (e.g. from a coarse
    * centroid layer), so the walk starts inside the probe's region and
    * needs fewer steps as the corpus grows.
    * @param entryPairs (probe_id, vec_id) entry nodes, a few per probe */
  def nswTopKPerProbe(edges: DataFrame, points: DataFrame, probes: DataFrame,
                      entryPairs: DataFrame, k: Int, beam: Int,
                      steps: Int): DataFrame =
    rankVisited(nswWalkVisited(edges, points, probes, entryPairs, beam, steps), k)

  /** The walk core: every (probe, node, cos) SCORED over `steps` beam
    * rounds — package-visible so specs can count scored rows (the serve
    * cost) as well as rank them. */
  private[graft] def nswWalkVisited(edges: DataFrame, points: DataFrame,
                                    probes: DataFrame, entryPairs: DataFrame,
                                    beam: Int, steps: Int): DataFrame = {
    val pn = points.withColumn("nrm", norm2Fast(col("v")))
      .select(col("vec_id"), col("v"), col("nrm"))
    val pr = probes.withColumn("np", norm2Fast(col("p")))
      .localCheckpoint(eager = true)
    def score(reached: DataFrame): DataFrame = // (probe_id, vec_id) → + cos
      reached.join(pn, "vec_id").join(broadcast(pr), "probe_id")
        .select(col("probe_id"), col("vec_id"),
          cosFromNorms(col("v"), col("p"), col("nrm"), col("np")).as("cos"))
    var visited = score(
        broadcast(entryPairs.select(col("probe_id"), col("vec_id")).distinct()))
      .localCheckpoint(eager = true)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    for (_ <- 1 to steps) {
      val beamDf = visited.withColumn("rn", row_number().over(w))
        .where(col("rn") <= beam).select(col("probe_id"), col("vec_id"))
      val reached = beamDf.join(edges, beamDf("vec_id") === edges("src"))
        .select(col("probe_id"), col("dst").as("vec_id"))
      visited = visited.unionByName(score(reached)).distinct()
        .localCheckpoint(eager = true)
    }
    visited
  }

  private def rankVisited(visited: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    visited
      .where(col("vec_id") =!= col("probe_id"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** INCREMENTAL DELETE on the kNN graph — GDPR reaching the serving
    * index (the `scrubArtifacts` discipline on the graph tier): doomed
    * vectors leave both endpoints, and ONLY the srcs that LOSE a top-M
    * edge re-rank against their full survivor cell candidates (losing an
    * edge frees a slot the next-best candidate must fill — naive edge
    * dropping under-fills the graph). Everyone else carries verbatim: a
    * src with no edge to a doomed vector had it outside its top-M, and
    * removing non-top candidates can't change a top-M. Result is EXACTLY
    * the rebuild on survivors under the frozen quantizer
    * (KnnGraphDeltaSpec pins the equality), at cost |affected|·cellsize —
    * delete-sized, not corpus-sized.
    * @param spilled FULL-corpus frozen-quantizer assignment
    * @param directed current directed top-M edges
    * @param doomed single-column id list */
  def knnGraphDeleteIncremental(spilled: DataFrame, directed: DataFrame,
                                doomed: DataFrame, m: Int): DataFrame = {
    val did = doomed.select(doomed.columns.head).toDF("id")
    val splS = spilled.join(did, spilled("vec_id") === did("id"), "left_anti")
    val affected = directed.join(did, directed("dst") === did("id"), "left_semi")
      .select(col("src")).distinct()
      .join(did, col("src") === did("id"), "left_anti")
    val carried = directed
      .join(did, directed("src") === did("id"), "left_anti")
      .join(did, directed("dst") === did("id"), "left_anti")
      .join(affected, Seq("src"), "left_anti")
      .select(col("src"), col("dst"))
    val freshKeys = cellPairKeysFrom(
      splS.join(affected, splS("vec_id") === affected("src"), "left_semi"), splS)
    val pts = splS.select(col("vec_id"), col("v")).dropDuplicates("vec_id")
    val top = carried.unionByName(directedTopM(freshKeys, pts, m))
    top.union(top.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Embedding near-dup: each vector's nearest neighbor within its IVF cell
    * (blocked all-pairs — never the global N² join), kept if cosine ≥
    * minCos. @param assigned (vec_id, v, cell) */
  def nearestInCell(assigned: DataFrame, minCos: Double): DataFrame = {
    val w = Window.partitionBy(col("a_id")).orderBy(col("cos").desc, col("b_id"))
    // localCheckpoint: the cell self-join would recompute the centroid
    // assignment once per side otherwise.
    val an = assigned.withColumn("nrm", norm2Fast(col("v")))
      .localCheckpoint(eager = true)
    an.as("a").join(an.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        cosFromNorms(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("cos") >= minCos)
      .select(col("a_id").as("vec_id"), col("b_id").as("nn_id"),
        round(col("cos"), 6).as("cos_sim"))
  }
}
