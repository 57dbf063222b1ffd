package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorSql.md5Hash60

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and inverted-index n-gram Jaccard. Everything is expressed as
  * declarative DataFrame transforms over exact integer hashing (portable
  * md5-prefix hash, see [[graft.functions.VectorSql.md5Hash60]]) so the
  * DuckDB oracle reproduces results bit-for-bit.
  *
  * Scale notes (100 TB):
  *  - exact dedup is one hash-shuffle on the digest — the canonical pattern.
  *  - MinHash: per-doc signatures are a single groupBy over exploded
  *    shingles; LSH banding turns the quadratic pair search into an
  *    equi-join on (band, key); exact Jaccard runs only on candidates.
  *  - the shingle-join (inverted index) and band-join are both skew-prone on
  *    pathological corpora (a shingle present in every doc): production runs
  *    add a document-frequency cap on shingles before the join; the capped
  *    variant is `jaccardPairs(maxShingleDf = ...)`.
  *  - SimHash pair search uses the pigeonhole banding (4 chunks of 15 bits —
  *    hamming ≤ 3 guarantees one exact chunk match), again an equi-join.
  */
object Dedup {

  val NumMinhash = 16
  val MinhashP = 1000000007L // 30-bit prime: a*h+b stays < 2^63 exactly

  /** Exact dedup survivors: min id per md5(text) group. */
  def exactSurvivors(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text)).as("digest"))
      .agg(min(col(id)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** (id, shingle) occurrences, duplicates included — the cheap base
    * relation. MinHash is duplicate-insensitive (min over a multiset equals
    * min over its set), so signatures consume this directly with NO distinct
    * shuffle; only exact-Jaccard set sizes need dedup, and [[jaccardPairs]]
    * distincts after restricting to candidate docs. */
  def docShinglesRaw(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).as("doc"), explode(TextOps.shingles3Fast(col(text))).as("sh"))

  /** Width-N raw shingle occurrences — production decontamination runs 13-gram
    * overlap, the dedup signals 3-gram; same stream shape at any width. */
  def docShinglesRawN(docs: DataFrame, id: String, text: String, width: Int): DataFrame =
    docs.select(col(id).as("doc"),
      explode(TextOps.shinglesNFast(col(text), width)).as("sh"))

  /** Distinct (id, shingle) pairs — the inverted-index base relation. */
  def docShingles(docs: DataFrame, id: String, text: String): DataFrame =
    docShinglesRaw(docs, id, text).distinct()

  /** MinHash signatures: (doc, h ∈ [0,16), minhash). Affine permutations
    * h_i(x) = (a_i·(x mod p) + b_i) mod p over the 60-bit shingle hash.
    *
    * Plan shape: 16 `min` aggregates in ONE hash aggregation over the
    * shingle stream (map-side partial min per doc), then a zero-shuffle
    * `stack` unpivot — instead of exploding every shingle 16× before the
    * shuffle (16× less aggregation input at scale). */
  def minhashSignatures(docShingles: DataFrame): DataFrame = {
    val hashed = docShingles.select(col("doc"), (md5Hash60(col("sh")) % MinhashP).as("x"))
    val mins = (0 until NumMinhash).map { h =>
      min((lit(h.toLong * 2 + 3) * col("x") + lit(h.toLong * 97 + 1)) % MinhashP).as(s"m$h")
    }
    val stackArgs = (0 until NumMinhash).map(h => s"$h, m$h").mkString(", ")
    hashed.groupBy(col("doc"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc"), expr(s"stack($NumMinhash, $stackArgs) AS (h, minhash)"))
  }

  /** (doc, band, key) LSH band table. collect_list is unordered — sort by
    * (h, minhash) struct before keying. localCheckpoint (eager): truncates
    * lineage so self-joins over the table can't recompute the signature
    * pipeline (full-corpus shingle scan) once per side. 4 rows/doc of
    * (int, string) — the cheap materialization point. */
  def bandedTable(signatures: DataFrame): DataFrame =
    signatures
      .groupBy(col("doc"), (col("h") / 4).cast("int").as("band"))
      .agg(concat_ws(",",
        transform(sort_array(collect_list(struct(col("h"), col("minhash")))),
          s => s.getField("minhash").cast("string"))).as("key"))
      .localCheckpoint(eager = true)

  /** LSH candidate pairs: docs sharing any band (4 bands × 4 rows).
    *
    * `maxBandDf` is the hot-bucket skew guard: a (band, key) bucket holding
    * df docs contributes df² join rows — one giant exact-dup cluster (or an
    * adversarial constant band) makes a single bucket quadratic while every
    * other key stays tiny. Buckets with df > maxBandDf switch from all-pairs
    * to a STAR around the bucket's min doc (hub): df−1 pairs instead of
    * df²/2, same connected component downstream — the keep-list merges the
    * cluster through the hub and the exact-Jaccard confirm step still vets
    * every emitted pair, so capping costs pair-level recall inside the hot
    * bucket, never cluster-level recall. */
  def lshCandidates(signatures: DataFrame, maxBandDf: Option[Int] = None): DataFrame = {
    val banded = bandedTable(signatures)
    val pairs = maxBandDf match {
      case None =>
        banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      case Some(cap) =>
        // bucket stats ride the banded table's (band, key) partitioning —
        // the join back is co-partitioned, no extra shuffle of the big side
        val stats = banded.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("df"), min(col("doc")).as("hub"))
        val tagged = banded.join(stats, Seq("band", "key"))
        val cold = tagged.where(col("df") <= cap)
        val coldPairs = cold.as("a").join(cold.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        val hotPairs = tagged
          .where(col("df") > cap && col("doc") =!= col("hub"))
          .select(col("hub").as("doc_a"), col("doc").as("doc_b"))
        coldPairs.union(hotPairs)
    }
    pairs.distinct()
  }

  /** Exact Jaccard via the inverted-index join, optionally restricted to
    * candidate pairs, with a document-frequency cap for skew resistance.
    * Accepts raw (non-distinct) shingles: when candidates are given, the
    * distinct runs only on the candidate docs' shingles (tiny), never the
    * full corpus. */
  def jaccardPairs(docShinglesIn: DataFrame, minJaccard: Double,
                   candidates: Option[DataFrame] = None,
                   maxShingleDf: Option[Int] = None): DataFrame = {
    // Hash shingles to 60-bit longs BEFORE the distinct: the distinct
    // shuffle and the inverted-index join then move 8-byte keys instead of
    // ~30-byte strings (4-8× less shuffle volume at corpus scale). Jaccard
    // is computed over the hashed shingle space — the oracle hashes
    // identically, so a (cosmically rare, ~2^-60) collision changes both
    // engines the same way, never their agreement.
    val docShingles = (candidates match {
      case Some(c) =>
        val candDocs = c.select(col("doc_a").as("doc"))
          .union(c.select(col("doc_b").as("doc"))).distinct()
        docShinglesIn.join(broadcast(candDocs), "doc")
      case None => docShinglesIn
    }).select(col("doc"), md5Hash60(col("sh")).as("sh")).distinct()
    val ds = maxShingleDf match {
      case Some(cap) =>
        val rare = docShingles.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .where(col("df") <= cap).select(col("sh"))
        docShingles.join(rare, "sh")
      case None => docShingles
    }
    val sizes = ds.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    // With a candidate list the intersection is computed ONLY for candidate
    // pairs (broadcast the small pair list, join each side's shingles) —
    // never the full inverted-index self-join. Without candidates, fall back
    // to the classic shingle self-join (pairs sharing ≥1 shingle).
    val withCand = candidates match {
      case Some(c) =>
        broadcast(c)
          .join(ds.as("a"), col("doc_a") === col("a.doc"))
          .join(ds.as("b"),
            col("doc_b") === col("b.doc") && col("a.sh") === col("b.sh"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("inter"))
      case None =>
        ds.as("a").join(ds.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
          .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
          .agg(count(lit(1)).as("inter"))
    }
    withCand
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Asymmetric shingle CONTAINMENT — Broder's second resemblance measure,
    * the one Jaccard misses: C(a→b) = |A∩B| / |A| finds documents SUBSUMED
    * by others (quotes, excerpts, boilerplate-wrapped copies) whose Jaccard
    * is low because the container is much larger. The LLM-corpus use is
    * exact-subset pruning: drop a doc whose shingles are ≥ threshold
    * contained in another doc.
    *
    * Same inverted-index shape and df-cap skew guard as [[jaccardPairs]]
    * (hashed 60-bit shingles, intersection computed ONCE per unordered
    * pair, then both orientations scored from the one intersection row).
    * The score is kept EXACT as ppm integers ((1e6·inter) div |A|) — no
    * float division reaches the hash gate.
    *
    * @param docShinglesIn    (doc, sh) raw shingle stream
    * @param minContainPpm    directed threshold in ppm (e.g. 800000 = 80%)
    * @param maxShingleDf     df cap — shingles in more docs are dropped
    * @return (doc_a, doc_b, inter, na, cont_ppm): doc_a's shingles are
    *         cont_ppm-contained in doc_b's; both directions can emit */
  def containmentPairs(docShinglesIn: DataFrame, minContainPpm: Long,
                       maxShingleDf: Option[Int] = None): DataFrame = {
    val docShingles = docShinglesIn
      .select(col("doc"), md5Hash60(col("sh")).as("sh")).distinct()
    val ds = maxShingleDf match {
      case Some(cap) =>
        val rare = docShingles.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .where(col("df") <= cap).select(col("sh"))
        docShingles.join(rare, "sh")
      case None => docShingles
    }
    val sizes = ds.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val inter = ds.as("a").join(ds.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("u"), col("b.doc").as("v"))
      .agg(count(lit(1)).as("inter"))
    val sized = inter
      .join(sizes.withColumnRenamed("doc", "u").withColumnRenamed("n", "nu"), "u")
      .join(sizes.withColumnRenamed("doc", "v").withColumnRenamed("n", "nv"), "v")
    val directed = sized.select(col("u").as("doc_a"), col("v").as("doc_b"),
        col("inter"), col("nu").as("na"))
      .unionAll(sized.select(col("v").as("doc_a"), col("u").as("doc_b"),
        col("inter"), col("nv").as("na")))
    directed.withColumn("cont_ppm", expr("(1000000 * inter) div na"))
      .where(col("cont_ppm") >= minContainPpm)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("cont_ppm"))
  }

  /** Duplicate-cluster keep-list: given undirected near-dup pairs, assign
    * every doc the minimum doc id reachable within `rounds` hops (min-label
    * propagation — the bounded-iteration core of connected components) and
    * emit (doc, canonical). Docs absent from any pair are their own
    * canonical. With near-dup clusters of diameter ≤ rounds (the practical
    * case: dedup clusters are small and dense) this IS the connected
    * component. Each round is one groupBy over the edge list — scales as
    * `rounds` shuffles of |E|, never materializing components in memory. */
  def keepList(docs: DataFrame, id: String, pairs: DataFrame, rounds: Int = 3): DataFrame = {
    val edges = symmetricEdges(docs, id, pairs)
    var labels = edges.groupBy(col("src").as("doc")).agg(min(col("dst")).as("lbl"))
    for (_ <- 1 until rounds) labels = propagateMinLabel(edges, labels)
    labels.select(col("doc"), col("lbl").as("canonical"))
  }

  /** Symmetric edge list + self-loops so isolated docs survive;
    * localCheckpoint: the per-round joins scan edges repeatedly. */
  private def symmetricEdges(docs: DataFrame, id: String, pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .union(docs.select(col(id).as("src"), col(id).as("dst")))
      .localCheckpoint(eager = true)

  /** One min-label flood round: every doc takes the min label over its
    * neighborhood. Shared by the bounded and converged keep-lists so their
    * per-round semantics cannot diverge. */
  private def propagateMinLabel(edges: DataFrame, labels: DataFrame): DataFrame =
    edges.join(labels, edges("dst") === labels("doc"))
      .groupBy(col("src").as("doc2"))
      .agg(min(col("lbl")).as("lbl"))
      .withColumnRenamed("doc2", "doc")

  /** Convergence-checked keep-list: min-label propagation to a FIXPOINT
    * (bounded by `maxRounds`), for corpora whose dup-cluster diameter
    * exceeds a fixed hop budget — chained near-dups (A~B~C~…) at crawl
    * scale form paths, not cliques, and a bounded [[keepList]] silently
    * splits any cluster wider than its round count. Same per-round cost
    * (one |E| shuffle); each round's labels localCheckpoint so lineage
    * stays O(1) and the convergence count reuses the materialized frontier
    * instead of recomputing the chain. Rounds needed = cluster diameter
    * (min-label floods one hop per round); the large-star/small-star
    * halving matters only for adversarial diameters — real dedup graphs
    * converge in a handful of rounds, and the fixpoint check makes "enough
    * rounds" a measured fact instead of a guess. */
  def keepListConverged(docs: DataFrame, id: String, pairs: DataFrame,
                        maxRounds: Int = 20): DataFrame = {
    val edges = symmetricEdges(docs, id, pairs)
    var labels = edges.groupBy(col("src").as("doc")).agg(min(col("dst")).as("lbl"))
      .localCheckpoint(eager = true)
    var changed = 1L
    var round = 1
    // `maxRounds` counts PROPAGATION HOPS (rounds needed = cluster
    // diameter): round 1..maxRounds each run one flood, so at least one
    // propagation always executes and maxRounds=1 means exactly one hop.
    while (changed > 0 && round <= maxRounds) {
      val next = propagateMinLabel(edges, labels).localCheckpoint(eager = true)
      changed = next.as("n").join(labels.as("o"), col("n.doc") === col("o.doc"))
        .where(col("n.lbl") =!= col("o.lbl")).count()
      // the previous frontier is dead once `changed` is counted — release
      // its executor blocks now instead of holding ~maxRounds live copies
      labels.unpersist(blocking = false)
      labels = next
      round += 1
    }
    // Returning a silently split cluster would be indistinguishable from a
    // converged one — the whole point of measuring the fixpoint. Fail loud;
    // the caller raises maxRounds (rounds needed = cluster diameter).
    require(changed == 0,
      s"label propagation did not converge within $maxRounds rounds " +
        s"($changed labels still changing) — raise maxRounds")
    edges.unpersist(blocking = false)
    labels.select(col("doc"), col("lbl").as("canonical"))
  }

  val SimhashBits = 60

  /** 60-bit SimHash over distinct whitespace tokens: bit b is the sign of the
    * vote Σ_tokens (2·bit_b(hash)−1); ties (vote 0) resolve to 0.
    *
    * Plan shape: 60 `sum` vote aggregates in ONE hash aggregation over the
    * token stream (the [[minhashSignatures]] trick) — exploding each token
    * into 60 bit-rows before the aggregate would push 60× the rows through
    * the shuffle machinery for the same integer votes. */
  def simhash(docs: DataFrame, id: String, text: String): DataFrame = {
    // hash-then-distinct: the distinct shuffle moves (doc, long) pairs, not
    // token strings — same result as distinct-then-hash in both engines
    // (the oracle flips the order identically)
    val toks = docs
      .select(col(id).as("doc"), explode(TextOps.tokensFast(col(text))).as("tok"))
      .select(col("doc"), md5Hash60(col("tok")).as("x"))
      .distinct()
    val votes = (0 until SimhashBits).map { b =>
      sum(expr(s"shiftright(x, $b) % 2 * 2 - 1")).as(s"v$b")
    }
    val bits = (0 until SimhashBits).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    toks.groupBy(col("doc"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc"), bits.as("simhash"))
  }

  /** Candidate block counts for the adaptive pigeonhole banding, smallest
    * first. 12 is the practical ceiling: C(12,3) = 220 band rows per doc —
    * past that, widening stops paying for the row blow-up. */
  private val BlockCands = Seq(4, 5, 6, 8, 10, 12)

  /** Corpus-adaptive block count for Hamming-pigeonhole banding (the
    * Manku/Google scheme generalized from the fixed 4×15-bit split): split
    * the `hashBits`-bit fingerprint into `b` near-equal blocks and band on
    * every way of KEEPING `b − maxHamming` of them (key = fingerprint with
    * `maxHamming` blocks masked out; ≤ maxHamming flips touch ≤ maxHamming
    * blocks, so some exclude-set covers them — full recall, C(b, maxHamming)
    * band rows/doc). Key width is hashBits·(b−h)/b, so b must GROW with the
    * corpus or the key space saturates and every bucket goes quadratic —
    * the same failure the r5 audit caught for 8-bit embedding-LSH keys, and
    * what the sf10 audit measured for the 4-chunk split (dHash chunk 3: 11
    * effective bits, 5,889 buckets over the df cap leaning on the star
    * fallback alone). Smallest b whose worst-case key width
    * (hashBits − h·ceil(hashBits/b)) meets [[Similarity.bitsPerBand]];
    * integer arithmetic only, so the DuckDB twin ([[simhashBandSql]])
    * chooses bit-identically. */
  def simhashBlockCount(hashBits: Int, n: Long, maxHamming: Int = 3): Int = {
    val kb = Similarity.bitsPerBand(n)
    val cands = BlockCands.filter(_ > maxHamming)
    cands.find(b => hashBits - maxHamming * ((hashBits + b - 1) / b) >= kb)
      .getOrElse(cands.last)
  }

  /** Band table for [[simhashPairs]]: one row per (doc, exclude-combination)
    * with `ckey` = the fingerprint masked to the kept blocks. `chunk` ids
    * only need to be distinct per combination — grouping equality is all
    * the join uses. */
  private[graft] def simhashChunks(hashes: DataFrame, hashBits: Int,
                                   b: Int, maxHamming: Int): DataFrame = {
    val wbase = hashBits / b
    val rem = hashBits % b
    def mask(m: Int): Long =
      ((1L << (wbase + (if (m < rem) 1 else 0))) - 1) << (m * wbase + math.min(m, rem))
    val full = (1L << hashBits) - 1
    val keeps = (0 until b).combinations(maxHamming).toSeq.zipWithIndex.map {
      case (ex, i) =>
        struct(lit(i).as("chunk"),
          lit(full & ~ex.map(mask).reduce(_ | _)).as("keep"))
    }
    hashes.select(col("doc"), col("simhash"), explode(array(keeps: _*)).as("k"))
      .select(col("doc"), col("simhash"), col("k.chunk").as("chunk"),
        col("simhash").bitwiseAND(col("k.keep")).as("ckey"))
  }

  /** Near-dup pairs by fingerprint Hamming distance ≤ maxHamming:
    * corpus-adaptive pigeonhole banding ([[simhashBlockCount]]) → equi-join,
    * then exact hamming via bit_count(xor). Works for any fingerprint width
    * ≤ 62 (`hashBits`): text SimHash is 60-bit, the perceptual
    * image/audio/video fingerprints are 56-bit.
    *
    * `maxChunkDf` mirrors [[lshCandidates]]'s hot-bucket guard: a (chunk,
    * ckey) bucket with df over the cap (e.g. a giant exact-dup cluster —
    * every copy shares all 4 chunks) emits a STAR around its min doc instead
    * of df²/2 join rows. The exact hamming filter still applies to every
    * emitted pair, so capping never admits a false pair; it only limits
    * pair-level recall inside the hot bucket to hub-adjacent pairs, which
    * the other chunks and the downstream cluster merge recover. The
    * adaptive width keeps RANDOM collisions out of the buckets, so the cap
    * is left guarding genuine duplicate clusters — not absorbing key-space
    * saturation. */
  def simhashPairs(simhashes: DataFrame, maxHamming: Int = 3,
                   maxChunkDf: Option[Int] = None, hashBits: Int = SimhashBits): DataFrame = {
    // localCheckpoint BEFORE the (cheap, per-side recomputed) band explode:
    // the self-join would otherwise recompute the fingerprint pipeline
    // (token explode + votes / media decode) once per side — and the
    // block-count choice needs the corpus count anyway, which forces it.
    val hashes = simhashes.localCheckpoint(eager = true)
    val b = simhashBlockCount(hashBits, hashes.count(), maxHamming)
    val chunks = simhashChunks(hashes, hashBits, b, maxHamming)
    val pairs = maxChunkDf match {
      case None =>
        chunks.as("a").join(chunks.as("b"),
            col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
            col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
            bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      case Some(cap) =>
        val stats = chunks.groupBy(col("chunk"), col("ckey"))
          .agg(count(lit(1)).as("df"),
            min(struct(col("doc"), col("simhash"))).as("hub"))
        val tagged = chunks.join(stats, Seq("chunk", "ckey"))
        val cold = tagged.where(col("df") <= cap)
        val coldPairs = cold.as("a").join(cold.as("b"),
            col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
            col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
            bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
        val hotPairs = tagged
          .where(col("df") > cap && col("doc") =!= col("hub.doc"))
          .select(col("hub.doc").as("doc_a"), col("doc").as("doc_b"),
            bit_count(col("hub.simhash").bitwiseXOR(col("simhash"))).as("hamming"))
        coldPairs.union(hotPairs)
    }
    pairs.where(col("hamming") <= maxHamming).distinct()
  }

  /** INCREMENTAL fingerprint near-dup maintenance — the daily-delta path
    * for the SimHash/perceptual families (the [[incrementalPairs]]
    * discipline applied to Hamming banding): the carried artifact is the
    * (doc, simhash) HASH TABLE — the expensive thing is the fingerprint
    * computation (token votes, media decode), not the banding, which is a
    * cheap projection of the hashes. Folding in a delta therefore bands
    * the COMBINED hash table fresh and joins only the delta's band rows
    * against it: any pair involving a new doc shares a chunk between the
    * delta's rows and the combined table (band keys are per-doc), so the
    * result equals the full recompute's pairs restricted to new docs —
    * union with the carried pairs IS the full recompute (spec + oracle).
    *
    * The adaptive block count makes re-banding MANDATORY, not an
    * optimization choice: b is a function of the COMBINED corpus size, so
    * a delta that crosses a [[simhashBlockCount]] threshold changes every
    * band key — a carried band TABLE would silently join yesterday's
    * b-block keys against today's b′-block keys and find nothing. Carrying
    * hashes and re-deriving bands costs one projection of an
    * artifact-sized table and is always correct.
    *
    * Uncapped (the incremental family's convention — a df cap binds
    * against different populations on the two paths). `newIds` must be
    * disjoint from the carried table's ids — enforced, like
    * [[incrementalPairs]]. */
  def simhashIncrementalPairs(oldHashes: DataFrame, newHashes: DataFrame,
                              oldPairs: DataFrame, maxHamming: Int = 3,
                              hashBits: Int = SimhashBits): DataFrame = {
    val clashes = oldHashes.join(broadcast(newHashes.select(col("doc"))),
      Seq("doc"), "left_semi").count()
    require(clashes == 0,
      s"$clashes delta ids already exist in the carried hash table — " +
        "remove re-fingerprinted docs from the artifacts before re-adding them")
    val all = oldHashes.union(newHashes).localCheckpoint(eager = true)
    val b = simhashBlockCount(hashBits, all.count(), maxHamming)
    val allChunks = simhashChunks(all, hashBits, b, maxHamming)
    val newChunks = simhashChunks(newHashes, hashBits, b, maxHamming)
    val fresh = allChunks.as("a").join(newChunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.doc") =!= col("b.doc"))
      .select(least(col("a.doc"), col("b.doc")).as("doc_a"),
        greatest(col("a.doc"), col("b.doc")).as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
    fresh.union(oldPairs).distinct()
  }

  /** DuckDB twin of [[simhashPairs]] (capped variant) — the ONE banding
    * oracle tail shared by `dedup_simhash_pairs` and the three perceptual
    * families. Emits the CTE chain + final SELECT to append after a CTE
    * named `src` holding (doc, simhash). Replays the adaptive block count
    * ([[simhashBlockCount]]): kb from GREATEST(8, LENGTH(BIN(n−1))+2) —
    * DuckDB's BIN length IS the integer bit length, no libm log — then the
    * same smallest-b-that-fits CASE, the same block masks, the same
    * cold/hot star semantics. */
  def simhashBandSql(src: String, hashBits: Int, cap: Int): String = {
    val h = 3 // exclude-sets are enumerated as i<j<k triples below
    val cands = BlockCands
    val cases = cands.init.map { b =>
      s"WHEN kb <= ${hashBits - h * ((hashBits + b - 1) / b)} THEN $b"
    }.mkString(" ")
    val full = (1L << hashBits) - 1
    s"""bnd_cfg AS (SELECT CASE $cases ELSE ${cands.last} END AS b
       |  FROM (SELECT GREATEST(8, LENGTH(BIN(count(*) - 1)) + 2) AS kb FROM $src)),
       |bnd_blocks AS (SELECT m,
       |   ((CAST(1 AS BIGINT) << ($hashBits // b + CASE WHEN m < $hashBits % b THEN 1 ELSE 0 END)) - 1)
       |     << (m * ($hashBits // b) + LEAST(m, $hashBits % b)) AS mask
       |  FROM bnd_cfg CROSS JOIN (SELECT unnest(range(0, ${cands.last})) AS m) mm
       |  WHERE m < b),
       |bnd_combos AS (SELECT i.m * 144 + j.m * 12 + k.m AS chunk,
       |   i.mask + j.mask + k.mask AS exmask
       |  FROM bnd_blocks i JOIN bnd_blocks j ON j.m > i.m
       |  JOIN bnd_blocks k ON k.m > j.m),
       |bnd_chunks AS (SELECT doc, simhash, c.chunk,
       |   simhash & ($full - c.exmask) AS ckey
       |  FROM $src CROSS JOIN bnd_combos c),
       |bnd_stats AS (SELECT chunk, ckey, count(*) AS df, min(doc) AS hub
       |  FROM bnd_chunks GROUP BY 1, 2),
       |bnd_tg AS (SELECT c.doc, c.simhash, c.chunk, c.ckey, s.df, s.hub
       |  FROM bnd_chunks c JOIN bnd_stats s USING (chunk, ckey)),
       |bnd_cold AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
       |   bit_count(xor(a.simhash, b.simhash)) AS hamming
       |  FROM bnd_tg a JOIN bnd_tg b
       |    ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc < b.doc
       |  WHERE a.df <= $cap AND b.df <= $cap),
       |bnd_hot AS (SELECT t.hub AS doc_a, t.doc AS doc_b,
       |   bit_count(xor(hh.simhash, t.simhash)) AS hamming
       |  FROM bnd_tg t JOIN bnd_chunks hh
       |    ON hh.doc = t.hub AND hh.chunk = t.chunk AND hh.ckey = t.ckey
       |  WHERE t.df > $cap AND t.doc <> t.hub)
       |SELECT DISTINCT doc_a, doc_b, CAST(hamming AS INT) AS hamming
       |FROM (SELECT * FROM bnd_cold UNION ALL SELECT * FROM bnd_hot)
       |WHERE hamming <= $h""".stripMargin
  }

  /** Right-to-be-forgotten CASCADE through the persisted dedup artifacts
    * (VERDICT r7 ask #5): deleting a document from the base corpus is not
    * enough — it survives inside the carried band table and the confirmed
    * pairs, and through them inside every keep-list derived later. Scrub =
    * anti-join the deletion set out of both artifacts: band keys are
    * PER-DOC (a doc's band rows are a function of its own text only), so
    * dropping the doomed docs' rows leaves exactly the band table a full
    * recompute over the surviving corpus would build; a confirmed pair is
    * per-pair exact, so dropping pairs with a doomed endpoint leaves
    * exactly the surviving corpus' pairs. This equivalence REQUIRES the
    * uncapped artifacts (the incremental family's convention): a df-cap
    * star fallback binds against pre-delete bucket populations and hubs,
    * which a post-delete recompute would choose differently. Downstream
    * keep-lists must be re-derived from the scrubbed pairs — connected
    * components can SPLIT when the deleted doc was the bridge, so labels
    * are recomputed (pair-graph-scale, never corpus-scale), not scrubbed.
    * The deletion set is human-scale at any corpus size: both anti-joins
    * broadcast. */
  def scrubArtifacts(banded: DataFrame, pairs: DataFrame,
                     doomed: DataFrame): (DataFrame, DataFrame) = {
    val ids = doomed.select(col("doc"))
    val bandedS = banded.join(broadcast(ids), Seq("doc"), "left_anti")
      .select(banded.columns.map(col).toIndexedSeq: _*)
    val pairsS = pairs
      .join(broadcast(ids.select(col("doc").as("doc_a"))), Seq("doc_a"), "left_anti")
      .join(broadcast(ids.select(col("doc").as("doc_b"))), Seq("doc_b"), "left_anti")
      .select(pairs.columns.map(col).toIndexedSeq: _*) // USING joins reorder
    (bandedS, pairsS)
  }

  /** Incremental near-dup maintenance — the daily-increment path: given
    * yesterday's BAND table and confirmed pairs, fold in today's new
    * documents without re-shingling, re-signing, or re-banding the old
    * corpus, and without re-confirming old-old pairs. Any pair involving a
    * new doc shares a band between the new doc's band rows and the combined
    * band table, so banding ONLY the increment and unioning it with the
    * carried band table finds exactly the new candidate pairs (band keys
    * are per-doc, so union-of-banded == banded-of-union for disjoint doc
    * sets — guarded below). The exact-Jaccard confirm then touches only
    * CANDIDATE docs' texts — the one place an old doc is re-read, and only
    * if a new doc collided with it. The result equals a full recompute over
    * the combined corpus (spec + oracle-checked); every per-day cost is
    * sized by the delta and its collisions, never the corpus.
    *
    * @param allDocs   combined corpus (old + new) — candidate old docs'
    *                  texts are read for the confirm step
    * @param newIds    one-column (doc) table of the increment's ids; MUST
    *                  be disjoint from yesterday's ids (a re-crawled doc
    *                  must be removed from the artifacts first) — enforced
    * @param oldBanded yesterday's band table ([[bandedTable]] output, the
    *                  natural carried artifact alongside the pairs)
    * @param oldPairs  yesterday's confirmed pairs (doc_a, doc_b, jaccard) */
  def incrementalPairs(allDocs: DataFrame, newIds: DataFrame,
                       id: String, text: String,
                       oldBanded: DataFrame, oldPairs: DataFrame,
                       minJaccard: Double = 0.8): DataFrame = {
    // a "new" id already present in the artifact would merge two docs'
    // minhashes into one garbage band key and silently miss its near-dups
    val clashes = oldBanded.join(broadcast(newIds), Seq("doc"), "left_semi")
      .select(col("doc")).distinct().count()
    require(clashes == 0,
      s"$clashes increment ids already exist in the carried band table — " +
        "remove re-crawled docs from the artifacts before re-adding them")
    val newDocs = allDocs.join(broadcast(newIds),
      allDocs(id) === newIds("doc"), "left_semi")
    val newBanded = bandedTable(minhashSignatures(docShinglesRaw(newDocs, id, text)))
    val banded = oldBanded.union(newBanded)
    val cand = banded.as("a").join(newBanded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc") =!= col("b.doc"))
      .select(least(col("a.doc"), col("b.doc")).as("doc_a"),
        greatest(col("a.doc"), col("b.doc")).as("doc_b"))
      .distinct()
      .localCheckpoint(eager = true) // reused: candidate-doc filter + confirm
    // re-shingle ONLY candidate docs (the sharedPairs discipline) — the
    // corpus-wide explode would otherwise run despite the broadcast join,
    // since Catalyst cannot push a join below Generate
    val candDocs = cand.select(col("doc_a").as("doc"))
      .union(cand.select(col("doc_b").as("doc"))).distinct()
    val candShingles = docShinglesRaw(
      allDocs.join(broadcast(candDocs), allDocs(id) === candDocs("doc"), "left_semi"),
      id, text)
    val confirmed = jaccardPairs(candShingles, minJaccard, candidates = Some(cand))
    confirmed.union(oldPairs).distinct()
  }

  /** Benchmark decontamination — flag corpus documents sharing any shingle
    * with an evaluation set (the step every training pipeline runs so eval
    * answers don't leak into training data). Production uses 13-gram
    * shingles; the shingle construction is whatever the inputs carry
    * (3-token here, matching the rest of the dedup family).
    *
    * Takes the two shingle streams SEPARATELY so each side is scanned once:
    * the eval stream comes from the (tiny, filter-pushed) eval doc subset
    * and the corpus stream from its complement — deriving both from one
    * whole-corpus stream would explode + hash the full corpus twice.
    *
    * Plan shape for 100 TB: the eval side is always tiny (benchmarks are
    * ~10⁵ n-grams) — its distinct shingle set broadcasts, so the corpus
    * stream is consumed in a SINGLE pass with no shuffle before the per-doc
    * aggregate, whose input is only the matching (rare) occurrences. The
    * corpus stream is the RAW (non-distinct) explode: duplicates survive the
    * broadcast join and are collapsed by the `count(DISTINCT)` — never a
    * corpus-wide distinct shuffle.
    *
    * @param corpusShingles raw (doc, sh) occurrences for the docs being
    *                       screened (eval docs excluded), [[docShinglesRaw]]
    * @param evalShingles   raw (doc, sh) occurrences for the eval set only
    * @return (doc, n_shared, first_eval) per contaminated doc: how many
    *         distinct shingles overlap, and the smallest eval doc id hit
    *         (the audit pointer). */
  def contamination(corpusShingles: DataFrame, evalShingles: DataFrame): DataFrame = {
    val evalSh = evalShingles
      .select(col("doc").as("eval_doc"), md5Hash60(col("sh")).as("sh"))
      .groupBy(col("sh")).agg(min(col("eval_doc")).as("first_eval"))
    corpusShingles.select(col("doc"), md5Hash60(col("sh")).as("sh"))
      .join(broadcast(evalSh), "sh")
      .groupBy(col("doc"))
      .agg(countDistinct(col("sh")).as("n_shared"),
        min(col("first_eval")).as("first_eval"))
  }

  /** Non-overlapping fixed-width word segments — the deterministic stand-in
    * for "paragraphs"/"lines" in a corpus without newlines. Segment k covers
    * tokens [k·width, k·width+width); the last segment may be shorter.
    * One-pass codegen kernel ([[graft.functions.SegmentsN]]): the
    * higher-order `transform(sequence, i -> slice(tokens, ...))` spelling
    * re-inlines the whole tokenize chain into every lambda element
    * (quadratic per doc — 16 s vs 0.9 s at sf0.1). */
  def paragraphSegments(text: Column, width: Int): Column =
    graft.functions.TextKernels.segmentsN(text, width)

  /** Quality-weighted cluster representative selection: one survivor per
    * near-dup cluster, chosen by QUALITY rather than the arbitrary min-id
    * canonical — keep-the-longest (token count, integer-exact), ties broken
    * by min doc_id. The keep-the-longest convention is what C4/RefinedWeb
    * style pipelines use so boilerplate-trimmed copies lose to the fullest
    * version of the page.
    *
    * Scale shape (100 TB): cluster labels are the existing keep-list passes
    * (one |E| shuffle each); quality is an in-scan projection joined on the
    * doc key; the per-cluster argmax is a groupBy with `min(struct(-q, id))`
    * — partial aggregation, so a million-member boilerplate cluster reduces
    * map-side instead of hot-keying a window sort. */
  def qualityRepresentatives(docs: DataFrame, id: String, text: String,
                             pairs: DataFrame): DataFrame = {
    val labels = keepList(docs, id, pairs) // (doc, canonical)
    val quality = docs.select(col(id).as("doc"),
      size(TextOps.tokens(col(text))).as("n_tokens"))
    labels.join(quality, "doc")
      .groupBy(col("canonical"))
      .agg(min(struct((-col("n_tokens")).as("nq"), col("doc").as("d"))).as("w"),
        count(lit(1)).as("n_members"))
      .select(col("canonical"), col("w.d").as("rep_id"),
        (-col("w.nq")).as("rep_tokens"), col("n_members"))
  }

  /** C4-style corpus-wide paragraph dedup: every segment keeps only its
    * FIRST occurrence (min (doc_id, pos) over the whole corpus); docs are
    * reassembled from their surviving segments in original order. Docs whose
    * every segment was seen earlier elsewhere vanish from the output — the
    * boilerplate-only-page case.
    *
    * Scale shape (100 TB): keep-first is a groupBy on the segment digest
    * with `min(struct(doc, pos, seg))` — partial aggregation makes it
    * skew-immune (a boilerplate segment on a billion pages partially
    * reduces map-side), unlike the row_number window the oracle uses. The
    * winning struct CARRIES the segment text, so no join back to the
    * occurrence stream is needed: reassembly is a second groupBy on doc_id.
    * Two shuffles total, both over reduced data. */
  def dedupParagraphs(docs: DataFrame, id: String, text: String,
                      width: Int = 3): DataFrame = {
    val segArr = paragraphSegments(col(text), width)
    val occ = docs
      .select(col(id).as("doc_id"), size(segArr).as("n_segs"),
        posexplode(segArr).as(Seq("pos", "seg")))
    val kept = occ
      .groupBy(md5(col("seg")).as("digest"))
      .agg(min(struct(col("doc_id"), col("pos"), col("seg"), col("n_segs")))
        .as("w"))
      .select(col("w.doc_id"), col("w.pos"), col("w.seg"), col("w.n_segs"))
    kept.groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
            x => x.getField("seg")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"),
        (max(col("n_segs")) - count(lit(1))).as("n_dropped"))
  }

  // ---- exact repeated-span (substring) dedup ----
  // The Spark-first re-expression of suffix-array exact-substring dedup
  // (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  // Better"): instead of a global suffix array (which needs the whole
  // corpus ordered in one address space), emit every stride-1 W-token
  // window as a hashed occurrence and groupBy the hash — any substring
  // duplication of length ≥ W is a run of ≥ 1 duplicated windows, so the
  // window inventory finds exactly the Lee-et-al spans with one linear
  // shuffle over ~n_tokens rows of (hash, doc, pos).

  /** Stride-1 W-token span occurrences: (doc, pos, sh). Docs shorter than
    * W tokens emit their whole text as a single span at pos 0 (the
    * [[graft.functions.TextKernels.shinglesN]] convention), so two short
    * exact-dup docs still register as a duplicated span. */
  def spanOccurrences(docs: DataFrame, id: String, text: String,
                      width: Int): DataFrame =
    docs.select(col(id).as("doc"),
        posexplode(TextOps.shinglesNFast(col(text), width)).as(Seq("pos", "span")))
      .select(col("doc"), col("pos"), md5Hash60(col("span")).as("sh"))

  /** Cross-document duplicated-span inventory: every W-token span seen in
    * ≥ 2 distinct docs, with occurrence counts and the corpus-first
    * occurrence (lexicographic min (doc, pos)).
    *
    * Scale shape (100 TB): ONE shuffle on the 60-bit span hash; the
    * countDistinct / count / min(struct) aggregates all partially reduce
    * map-side, so a boilerplate span on a billion pages is skew-immune.
    * Shuffle rows are (8-byte hash, doc, pos) — no span text ever moves.
    * At 10^12+ spans the 60-bit space starts to birthday-collide; the
    * production variant widens to two independent 60-bit hashes (the
    * SimHash-chunk discipline), which doubles the key to 16 bytes and
    * nothing else. */
  def spanInventory(docs: DataFrame, id: String, text: String,
                    width: Int): DataFrame =
    spanOccurrences(docs, id, text, width)
      .groupBy(col("sh").as("span_hash"))
      .agg(countDistinct(col("doc")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(struct(col("doc"), col("pos"))).as("w"))
      .filter(col("n_docs") >= 2)
      .select(col("span_hash"), col("n_docs"), col("n_occ"),
        col("w.doc").as("first_doc"), col("w.pos").as("first_pos"))

  /** Exact repeated-span SCRUB: every span occurrence except the
    * corpus-first one is removed from its document (Lee et al.'s "keep one
    * copy of each duplicated substring"), overlapping removal windows are
    * merged per doc (gaps-and-islands), and documents are rebuilt from
    * their surviving tokens. Emits ALL docs: (doc_id, clean_text,
    * n_removed) with clean_text = '' when everything was a repeat (the
    * exact-duplicate case).
    *
    * Scale shape (100 TB): occurrences shuffle once on the span hash (the
    * repeated-span argmin), once back on (doc) for the island window +
    * interval merge, and the token rebuild is a groupBy(doc) over the
    * token stream — every stage linear in tokens, no window wider than a
    * doc, removal positions expanded from merged intervals (≤ n_tokens
    * rows) so the token anti-join is an equi-join, never a range join.
    * The declarative plan scans the text column once per consumer branch
    * (occurrences ×2, token rebuild, token counts); a 100 TB deployment
    * materializes [[spanOccurrences]] once (the Artifacts discipline) and
    * folds the count into the rebuild, bringing it to two scans. */
  def spanScrub(docs: DataFrame, id: String, text: String,
                width: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val occ = spanOccurrences(docs, id, text, width)
    // repeated spans with their corpus-first occurrence: intra-doc repeats
    // count too, hence n_occ >= 2 (not n_docs >= 2)
    val first = occ.groupBy(col("sh"))
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("doc"), col("pos"))).as("w"))
      .filter(col("n_occ") >= 2)
      .select(col("sh"), col("w.doc").as("fdoc"), col("w.pos").as("fpos"))
    val rem = occ.join(first, "sh")
      .filter(!(col("doc") === col("fdoc") && col("pos") === col("fpos")))
      .select(col("doc"), col("pos"))
    // merge overlapping [pos, pos+W) intervals per doc: island starts when
    // pos clears every earlier window's end
    val byDoc = Window.partitionBy("doc").orderBy("pos")
    val prevEnd = max(col("pos") + width)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = rem
      .withColumn("ni", when(col("pos") > coalesce(prevEnd, lit(-1)), 1).otherwise(0))
      .withColumn("island", sum(col("ni")).over(byDoc))
      .groupBy(col("doc"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + width - 1).as("e"))
    val remPos = islands.select(col("doc"),
      explode(sequence(col("s"), col("e"))).as("pos"))
    val tokPos = docs.select(col(id).as("doc"),
      posexplode(TextOps.tokensFast(col(text))).as(Seq("pos", "tok")))
    val keptAgg = tokPos.join(remPos, Seq("doc", "pos"), "left_anti")
      .groupBy(col("doc"))
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(id).as("doc"),
        size(TextOps.tokensFast(col(text))).cast("long").as("n_toks"))
      .join(keptAgg, Seq("doc"), "left_outer")
      .select(col("doc").as("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }
}
